"""Driver-side direct parquet reads for LOCAL index roots.

The interactive Searcher's per-query work is a handful of point reads:
the pruned posting fetch of a few terms, the (term, n_docs) df probe,
and the forward-row resolve of <= a few thousand doc_ords. Routing
those through a Spark job pays scheduler latency plus a py4j collect
of the block blobs on every cold query — measured at 960k turns the
job+collect is 0.25-1.1 s per cold query while the same pruned read
through pyarrow.dataset is 7-120 ms (guide §1.2: fix the shape before
the constants; a point lookup does not need a cluster job, the same
way the reference's ES client GETs a document without running a
distributed search).

When the index root lives on the local filesystem (file: or bare
paths), the same pruned reads run directly through pyarrow.dataset:
identical partition pruning (term_bucket= / doc_block= hive dirs),
identical rowgroup-statistics pushdown, identical rows out — just no
job. Non-local roots (hdfs://, s3a://...) keep the Spark path; every
caller falls back whenever `local_path` returns None. On a real
cluster the analog is the driver reading the hot metadata tier through
the filesystem client instead of scheduling a job per query — the
bytes moved are identical.

Dataset objects cache per directory (a dataset holds the file listing
+ parquet footers — the exact analog of the Searcher's cached
_seg_dfs); they carry no row data, so this is metadata caching, not
result caching: every query still reads its postings from parquet.
"""

from __future__ import annotations

import os
import re

_SCHEME = re.compile(r"^[a-zA-Z][a-zA-Z0-9+.-]*://")


def local_path(path: str) -> str | None:
    """Plain filesystem path when `path` is local (bare or file: URI),
    else None."""
    if path.startswith("file://"):
        rest = path[len("file://"):]
        # file://host/p is remote unless host is empty/localhost
        if rest.startswith("/"):
            return rest
        host, _, p = rest.partition("/")
        if host in ("", "localhost"):
            return "/" + p
        return None
    if path.startswith("file:"):
        return path[len("file:"):]
    if _SCHEME.match(path):
        return None
    return path


def _parquet_files(directory: str) -> list[str]:
    try:
        names = os.listdir(directory)
    except (FileNotFoundError, NotADirectoryError):
        return []
    return sorted(
        os.path.join(directory, f) for f in names
        if f.endswith(".parquet") and not f.startswith(("_", "."))
    )


def partition_dirs(root: str, key: str) -> dict[int, list[str]]:
    """Map partition value -> directories named `key=<value>` under
    `root`, looking one level deep and below single-level intermediate
    hive dirs (the segment tree is segments/chunk=N/term_bucket=B/,
    the docs tree docs/doc_block=B/)."""
    out: dict[int, list[str]] = {}
    prefix = key + "="
    try:
        level1 = sorted(os.listdir(root))
    except (FileNotFoundError, NotADirectoryError):
        return out
    for name in level1:
        p = os.path.join(root, name)
        if name.startswith(prefix):
            out.setdefault(int(name[len(prefix):]), []).append(p)
        elif "=" in name and os.path.isdir(p):
            for sub in sorted(os.listdir(p)):
                if sub.startswith(prefix):
                    out.setdefault(int(sub[len(prefix):]), []).append(
                        os.path.join(p, sub))
    return out


class LocalParquetIndex:
    """Pruned pyarrow reads over ONE hive-partitioned parquet tree.

    Caches the partition-dir map and per-directory datasets (file
    listing + footers); rows are read per call."""

    def __init__(self, root: str, key: str):
        self.root = root
        self.key = key
        self._dirs: dict[int, list[str]] | None = None
        self._datasets: dict[str, object] = {}

    def dirs(self) -> dict[int, list[str]]:
        if self._dirs is None:
            self._dirs = partition_dirs(self.root, self.key)
        return self._dirs

    def _dataset(self, directory: str):
        ds = self._datasets.get(directory)
        if ds is None:
            import pyarrow.dataset as pads

            files = _parquet_files(directory)
            if not files:
                return None
            ds = pads.dataset(files, format="parquet")
            self._datasets[directory] = ds
        return ds

    def read(self, partitions: list[int] | None, columns: list[str],
             filter=None):
        """Concatenated pyarrow Table over the given partition values
        (None = all), column-pruned and filtered (rowgroup statistics
        prune exactly like Spark's parquet pushdown)."""
        import pyarrow as pa

        dmap = self.dirs()
        keys = sorted(dmap) if partitions is None else [
            b for b in partitions if b in dmap]
        tables = []
        for b in keys:
            for d in dmap[b]:
                ds = self._dataset(d)
                if ds is None:
                    continue
                cols = [c for c in columns if c in ds.schema.names]
                tables.append(ds.to_table(columns=cols, filter=filter))
        if not tables:
            return None
        return pa.concat_tables(tables, promote_options="default")

    def count_rows(self) -> int:
        """Total rows from parquet footers (no data read)."""
        total = 0
        for dirs in self.dirs().values():
            for d in dirs:
                ds = self._dataset(d)
                if ds is not None:
                    total += ds.count_rows()
        return total

    def schema_names(self) -> list[str]:
        for dirs in self.dirs().values():
            for d in dirs:
                ds = self._dataset(d)
                if ds is not None:
                    return list(ds.schema.names) + [self.key]
        return []


def strip_tz(table):
    """Match Spark's collect() rendering of TimestampType (naive
    datetimes in the UTC session timezone this engine pins): drop the
    UTC tz annotation pyarrow surfaces for Spark-written timestamp
    columns. Values are unchanged (the same UTC micros)."""
    import pyarrow as pa

    for i, f in enumerate(table.schema):
        if pa.types.is_timestamp(f.type) and f.type.tz is not None:
            table = table.set_column(
                i, pa.field(f.name, pa.timestamp(f.type.unit)),
                table.column(i).cast(pa.timestamp(f.type.unit)))
    return table
