"""SPIMI-style inverted-index build pipeline (SURVEY §3.1 Spark rebuild).

Reference dataflow being re-expressed (es_translator/es_translator.py):
scroll scan (S1) → projection (S4) → idempotency filter (F2) →
per-row transform (P1) → sink (S5), with plan/resume (X3) and
throughput metrics (X5/monitor). Here the "transform" is tokenization
and the "sink" is the index itself.

Stages (each is a committed, resumable checkpoint):
  1. 'tf'       assign stable doc_ords, tokenize (Arrow UDF), write the
                forward table + global stats + the (term, doc_ord, tf,
                dl, salt) run table partitioned by term_bucket — these
                are the SPIMI runs; Spark's sort-merge shuffle is the
                SPIMI merge.
  2. 'segments' per chunk of term_buckets: group runs by (term, salt)
                and encode delta+varint blocks with block-max metadata
                (applyInPandas, numpy codec). Salt buckets are
                doc_ord-RANGE-disjoint, so a hot term's postings are
                built by n_salt_buckets independent tasks and merge by
                concatenation — no single reducer ever sees the whole
                Zipf head (SURVEY §4.2 skew strategy; AQE is backstop).
  3. 'terms'    term dictionary (term → df) aggregated from segments.

Scale notes (100 TB / 1e12 turns):
  - per-occurrence rows carry only (term, doc_ord, tf, dl) — nothing
    wider (SURVEY §7.3).
  - groupBy(term, doc_ord) gets map-side partial aggregation from
    Catalyst automatically; the only wide rows (posting blocks) are
    bounded by block_size and salt-split.
  - doc_ord assignment is a rangepartition + per-partition offsets
    join (broadcast) — no global window, no driver collect of data.
"""

from __future__ import annotations

import os
import shutil
import time
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from sparkbm25 import catalog
from sparkbm25.config import IndexConfig

def segment_schema(with_pos: bool = False, term_ids: bool = False) -> str:
    pos = ",pos:binary" if with_pos else ""
    head = ("term_id bigint, salt int" if term_ids
            else "term_bucket int, term string, salt int")
    return (
        f"{head}, n_docs bigint, "
        "blocks array<struct<first_doc:bigint,n:int,gaps:binary,tfs:binary,"
        f"dls:binary,max_impact:double{pos}>>"
    )


SEGMENT_SCHEMA = segment_schema()


@dataclass
class BuildResult:
    index_dir: str
    n_docs: int
    avgdl: float
    seconds: float
    turns_per_sec: float


def assign_doc_ords(df: DataFrame, config: IndexConfig, doc_ord_base: int = 0,
                    cache_tokens: bool = True) -> DataFrame:
    """Stable dense docID by (conv_id, turn_idx) order (SURVEY §7.0 O4)
    fused with tokenization — ONE Python/Arrow crossing for both.

    cache_tokens=False (verify-order packed builds) keeps token LISTS
    out of this stage entirely: the kernel computes dl with the cheap
    boundary-count pass, the persisted bookkeeping cache shrinks to the
    id/dl/err proxy rows (guide §8: decide with small rows), and the
    caller re-derives (doc_ord, tokens) in its own fused scan via the
    attached `_sparkbm25_dfp` (the pre-kernel scan) and
    `_sparkbm25_offsets` ({(pid, seq): doc_ord offset}) handles.

    Scale-safe: range-repartition + partition-local index via
    mapInPandas + broadcast join of per-partition offsets. No global
    window (which would single-partition 1e12 rows), no zipWithIndex
    RDD detour. Returns (conv_id, turn_idx, tokens, dl, pid, doc_ord),
    persisted — text and the other input columns are dropped as early
    as possible (carry nothing wider than needed, SURVEY §7.3).
    """
    spark = df.sparkSession
    n_part = config.n_doc_partitions or spark.sparkContext.defaultParallelism
    cols = ["conv_id", "turn_idx", "text"]
    attrs = [c for c in ("role", "tool", "ts") if c in df.columns]
    if config.input_order not in ("shuffle", "verify"):
        raise ValueError(
            f"input_order must be 'shuffle' or 'verify', got "
            f"{config.input_order!r}")
    verify_order = config.input_order == "verify"
    if verify_order:
        # sorted-input fast path (round 5): NO range shuffle — the full
        # text corpus never crosses an exchange. The input's own
        # partitioning is kept; the tokenize kernel proves each input
        # FILE is internally (conv_id, turn_idx)-sorted as it streams,
        # and the bookkeeping job below returns per-file key bounds so
        # the driver proves files are globally non-overlapping before
        # assigning offsets in key order. Any violation raises — this
        # is trust-but-verify, not an unchecked assumption.
        #
        # The unit is the FILE, not the Spark partition: at scale (and
        # at low local parallelism) the scan bin-packs MANY sorted
        # files into one FilePartition in size order, so a partition
        # is almost never key-sorted across its file boundaries even
        # when every file is. Rows of one file stay contiguous and
        # in file order inside the partition stream, so the kernel
        # segments on input_file_name() runs. (Iceberg tables
        # write-ordered by the key hit this path for free at 100 TB —
        # thousands of sorted, range-disjoint data files per task.)
        # crc32(file) instead of the URI string keeps the per-row
        # overhead at 8 bytes through the Arrow crossing; a collision
        # between ADJACENT files in one partition can only merge two
        # runs, and a merged run either still proves sorted (doc ords
        # stay correct — it behaves as one larger sorted file) or
        # RAISES — never a silent misnumber. Non-file sources yield
        # one empty-name run per partition, i.e. the per-partition
        # semantics.
        dfp = (
            df.select(*cols, *attrs)
            .withColumn("pid", F.spark_partition_id())
            .withColumn("_fid", F.crc32(F.input_file_name().cast("binary")))
        )
    else:
        dfp = (
            df.select(*cols, *attrs)
            .repartitionByRange(n_part, "conv_id", "turn_idx")
            .sortWithinPartitions("conv_id", "turn_idx")
            .withColumn("pid", F.spark_partition_id())
        )

    from sparkbm25.analysis import (DEFAULT_TOKEN_PATTERN,
                                    count_tokens_arrow_ascii,
                                    tokenize_arrow_ascii, tokenize_series)

    pattern, maxlen = config.token_pattern, config.max_content_length
    if not cache_tokens and not verify_order:
        raise ValueError("cache_tokens=False requires input_order='verify' "
                         "(the re-scan must be deterministic)")

    def local_idx_and_tokenize(batches):
        # ONE Arrow pass: tokenization runs the vectorized byte-level
        # kernel (tokenize_arrow_ascii) and the token lists never
        # materialize as Python objects — round 5's mapInPandas built
        # ~40 Python str objects per document and re-serialized them to
        # Arrow, which was the single largest CPU cost of build stage 1
        # (guide §4.2: hand whole batches to vectorized kernels).
        # Non-ASCII batches and non-default token patterns keep the
        # exact pandas path per batch (equal results, old speed).
        import pyarrow as pa
        import pyarrow.compute as pc

        off = 0
        fseq: dict = {}      # verify: crc32(file) -> dense seq within this task
        offs: dict = {}      # verify: seq -> next local_idx in that file
        tails: dict = {}     # verify: seq -> (conv_id, turn_idx) tail key
        for rb in batches:
            nr = rb.num_rows
            if nr == 0:
                continue
            name_idx = {n: i for i, n in enumerate(rb.schema.names)}
            text = rb.column(name_idx["text"])
            toks = None
            if not cache_tokens:
                # dl-only pass: token lists are derived later in the
                # caller's fused scan, never materialized here
                dl = (count_tokens_arrow_ascii(text, maxlen)
                      if pattern == DEFAULT_TOKEN_PATTERN else None)
                if dl is None:
                    dl = tokenize_series(
                        text.to_pandas(), pattern,
                        maxlen).str.len().to_numpy(dtype=np.int64)
            else:
                fast = (tokenize_arrow_ascii(text, maxlen)
                        if pattern == DEFAULT_TOKEN_PATTERN else None)
                if fast is not None:
                    toks, dl = fast
                else:
                    toks_pd = tokenize_series(text.to_pandas(), pattern,
                                              maxlen)
                    toks = pa.array(toks_pd.tolist(),
                                    type=pa.list_(pa.string()))
                    dl = toks_pd.str.len().to_numpy(dtype=np.int64)
            # per-row error side-output (F5, es_translator.py:264-271
            # logs-and-continues per doc and keeps the error record):
            # poison rows are kept (they index as empty docs) and
            # tagged, never dropped silently and never fatal.
            err = pa.nulls(nr, pa.string())
            if maxlen:
                lens = pc.utf8_length(pc.fill_null(text, ""))
                err = pc.if_else(pc.greater(lens, maxlen),
                                 pa.scalar("truncated", pa.string()), err)
            err = pc.if_else(pc.is_null(text),
                             pa.scalar("null_text", pa.string()), err)
            cols = {
                "pid": rb.column(name_idx["pid"]),
                "conv_id": rb.column(name_idx["conv_id"]),
                "turn_idx": rb.column(name_idx["turn_idx"]),
                "local_idx": pa.array(
                    np.arange(off, off + nr, dtype=np.int64),
                    type=pa.int64()),
                **({"tokens": toks} if cache_tokens else {}),
                "dl": pa.array(dl, type=pa.int64()),
                "err": err,
                **{a: rb.column(name_idx[a]) for a in attrs},
            }
            # mapInArrow does NOT coerce to the declared schema the way
            # mapInPandas did: cast the passthrough columns whose input
            # type may be wider (int64 turn_idx from a pandas-created
            # DataFrame) than the declared one
            for k, want in (("pid", pa.int32()), ("turn_idx", pa.int32()),
                            ("conv_id", pa.string())):
                if cols[k].type != want:
                    cols[k] = cols[k].cast(want)
            if verify_order:
                # per-FILE order proof, streamed: the batch segments
                # into contiguous input_file_name runs (a batch almost
                # always holds one); within each run a row whose key is
                # <= its predecessor's (strict — duplicate keys violate
                # the input contract) is flagged, with the carried tail
                # key covering batch boundaries. local_idx restarts per
                # file so the driver can lay files out in key order.
                # (conv_id neighbor comparisons run vectorized in Arrow
                # C++; UTF-8 byte order == codepoint order, so they
                # agree with the pandas str comparisons they replace.)
                fid = rb.column(name_idx["_fid"]).to_numpy(
                    zero_copy_only=False)
                conv = rb.column(name_idx["conv_id"])
                tix = rb.column(name_idx["turn_idx"]).to_numpy(
                    zero_copy_only=False)
                seqs = np.empty(nr, dtype=np.int32)
                local = np.empty(nr, dtype=np.int64)
                bad = np.zeros(nr, dtype=bool)
                if nr > 1:
                    c_prev, c_cur = conv.slice(0, nr - 1), conv.slice(1)
                    less = pc.less(c_cur, c_prev).to_numpy(
                        zero_copy_only=False)
                    eq = pc.equal(c_cur, c_prev).to_numpy(
                        zero_copy_only=False)
                    badn = less | (eq & (tix[1:] <= tix[:-1]))
                starts = np.flatnonzero(np.r_[True, fid[1:] != fid[:-1]])
                bounds = np.r_[starts, nr]
                for s, e in zip(bounds[:-1], bounds[1:]):
                    sq = fseq.setdefault(int(fid[s]), len(fseq))
                    o = offs.get(sq, 0)
                    local[s:e] = np.arange(o, o + (e - s), dtype=np.int64)
                    offs[sq] = o + (e - s)
                    seqs[s:e] = sq
                    if e > s + 1:
                        bad[s + 1:e] = badn[s:e - 1]
                    tail = tails.get(sq)
                    if tail is not None:
                        bad[s] |= (str(conv[s].as_py()),
                                   int(tix[s])) <= tail
                    tails[sq] = (str(conv[e - 1].as_py()), int(tix[e - 1]))
                cols["local_idx"] = pa.array(local, type=pa.int64())
                cols["seq"] = pa.array(seqs, type=pa.int32())
                cols["ooo"] = pa.array(bad.astype(np.int32),
                                       type=pa.int32())
            off += nr
            yield pa.RecordBatch.from_arrays(
                list(cols.values()), names=list(cols.keys()))

    # attr columns keep their INPUT types (role/tool are strings, ts is
    # a timestamp — round 5: ts rides into the forward table so ES-style
    # date-range filters have a column to hit)
    in_types = dict(dfp.dtypes)
    attr_ddl = "".join(f", {a} {in_types[a]}" for a in attrs)
    dfl = dfp.mapInArrow(
        local_idx_and_tokenize,
        schema="pid int, conv_id string, turn_idx int, local_idx bigint, "
               + ("tokens array<string>, " if cache_tokens else "")
               + "dl bigint, err string" + attr_ddl
               + (", seq int, ooo int" if verify_order else ""),
    )
    # persist: the range partitioner samples; pin the partitioning so
    # the count job and downstream see identical placement.
    dfl = dfl.persist(StorageLevel.MEMORY_AND_DISK)

    # ONE bookkeeping job: per-unit counts for the offsets AND the
    # global stats (N, sum_dl) — no separate agg action later. The
    # unit is the partition ('shuffle') or the input FILE within a
    # partition ('verify' — (pid, seq)); in 'verify' mode the same job
    # also returns each file's key bounds + order flag, so the
    # global-order proof costs no extra job.
    unit = ["pid", "seq"] if verify_order else ["pid"]
    aggs = [F.count(F.lit(1)).alias("count"), F.sum("dl").alias("sum_dl")]
    if verify_order:
        key = F.struct("conv_id", "turn_idx")
        aggs += [F.max("ooo").alias("ooo"),
                 F.min(key).alias("min_key"), F.max(key).alias("max_key")]
    counts = (
        dfl.groupBy(*unit).agg(*aggs)
        .toPandas().sort_values(unit)
    )
    if verify_order and len(counts):
        if int(counts["ooo"].fillna(0).max()) > 0:
            dfl.unpersist()
            raise ValueError(
                "input_order='verify': rows are NOT "
                "(conv_id, turn_idx)-sorted within at least one input "
                "file (or contain duplicate keys); rebuild with "
                "input_order='shuffle'")
        # offsets assigned in GLOBAL KEY order (not scan order): the
        # docID invariant holds for any sorted-but-unordered file list.
        # groupBy emits no empty units, so every row's (pid, seq) joins.
        counts["_k"] = counts["min_key"].map(
            lambda r: (r["conv_id"], r["turn_idx"]))
        counts["_K"] = counts["max_key"].map(
            lambda r: (r["conv_id"], r["turn_idx"]))
        counts = counts.sort_values("_k").reset_index(drop=True)
        for i in range(1, len(counts)):
            if counts["_K"].iloc[i - 1] >= counts["_k"].iloc[i]:
                dfl.unpersist()
                raise ValueError(
                    "input_order='verify': input files have "
                    "OVERLAPPING (conv_id, turn_idx) ranges "
                    f"(one file ends at {counts['_K'].iloc[i - 1]!r}, "
                    f"another starts at {counts['_k'].iloc[i]!r}); "
                    "rebuild with input_order='shuffle'")
    offsets = (counts["count"].cumsum().shift(fill_value=0) + doc_ord_base).astype("int64")
    # columns MUST lay out in schema order: createDataFrame(pandas,
    # ddl-string) binds by POSITION, not name
    if verify_order:
        odata = pd.DataFrame({"pid": counts["pid"].astype("int32"),
                              "seq": counts["seq"].astype("int32"),
                              "offset": offsets})
        oschema = "pid int, seq int, offset bigint"
    else:
        odata = pd.DataFrame({"pid": counts["pid"].astype("int32"),
                              "offset": offsets})
        oschema = "pid int, offset bigint"
    offsets_df = spark.createDataFrame(odata, schema=oschema)
    out = (
        dfl.join(F.broadcast(offsets_df), unit)
        .withColumn("doc_ord", (F.col("offset") + F.col("local_idx")).cast("bigint"))
        .drop("offset", "local_idx", *(["seq"] if verify_order else []))
    )
    out._sparkbm25_cached = dfl  # so build_index can unpersist
    out._sparkbm25_counts = counts  # (pid, count, sum_dl) for stats
    if not cache_tokens:
        # handles for the caller's fused (tokenize + doc_ord) re-scan:
        # the scan plan is deterministic (same files, same pinned split
        # sizing, verify-proven per-file order), so the kernel re-derives
        # identical (pid, seq, local_idx) and maps them through offsets
        out._sparkbm25_dfp = dfp
        out._sparkbm25_offsets = {
            (int(p), int(s)): int(o)
            for p, s, o in zip(counts["pid"], counts["seq"], offsets)}
    return out


def term_bucket_col(term_col, n_buckets: int):
    """crc32-derived term bucket — MUST match IndexConfig.term_bucket_of
    so the query driver can route to segment partitions client-side
    (ES `_routing` analog, es_translator/es.py:73-80). crc32 because it
    is cheap in the JVM AND byte-identical in Python's zlib."""
    return F.pmod(
        F.crc32(term_col.cast("binary")), F.lit(n_buckets)
    ).cast("int")


_BLOCK_PA_TYPES: dict[bool, object] = {}


def _block_pa_type(with_pos: bool = False):
    import pyarrow as pa

    if with_pos not in _BLOCK_PA_TYPES:
        fields = [
            ("first_doc", pa.int64()),
            ("n", pa.int32()),
            ("gaps", pa.binary()),
            ("tfs", pa.binary()),
            ("dls", pa.binary()),
            ("max_impact", pa.float64()),
        ]
        if with_pos:
            fields.append(("pos", pa.binary()))
        _BLOCK_PA_TYPES[with_pos] = pa.list_(pa.struct(fields))
    return _BLOCK_PA_TYPES[with_pos]


def _make_segment_encoder(k1: float, b: float, avgdl: float, block_size: int):
    """mapInArrow stage: rows (term_bucket, term, salt, postings) with
    postings = sorted array<struct<doc_ord,tf,dl>> → segment rows.

    One vectorized encode per Arrow batch (thousands of groups), not
    one Python call per group — the groupBy/collect_list upstream is
    pure JVM (Tungsten hash agg with map-side partials)."""

    def encode(batches):
        import pyarrow as pa

        from sparkbm25.codec import encode_blocks_batch

        for rb in batches:
            if rb.num_rows == 0:
                continue
            tb = pa.Table.from_batches([rb])
            lv = tb.column("postings").combine_chunks()
            offs = lv.offsets.to_numpy().astype(np.int64)
            group_offsets = offs - offs[0]
            flat = lv.flatten()
            docs = flat.field("doc_ord").to_numpy(zero_copy_only=False)
            tfs = flat.field("tf").to_numpy(zero_copy_only=False)
            dls = flat.field("dl").to_numpy(zero_copy_only=False)
            blocks = encode_blocks_batch(
                docs, tfs, dls, group_offsets,
                k1=k1, b=b, avgdl=avgdl, block_size=block_size,
            )
            yield pa.RecordBatch.from_arrays(
                [
                    tb.column("term_bucket").combine_chunks(),
                    tb.column("term").combine_chunks(),
                    tb.column("salt").combine_chunks(),
                    pa.array(np.diff(group_offsets), type=pa.int64()),
                    pa.array(blocks, type=_block_pa_type()),
                ],
                names=["term_bucket", "term", "salt", "n_docs", "blocks"],
            )

    return encode


def _make_stream_encoder(k1: float, b: float, avgdl: float, block_size: int,
                         postings_acc=None, rows_acc=None,
                         aggregated: bool = True, with_pos: bool = False,
                         lean: dict | None = None, term_ids: bool = False):
    """Streaming SPIMI-merge encoder: consumes Arrow batches of posting
    rows sorted by (term[, salt], doc_ord) within the partition, emits
    one segment row per (term, salt) group. A group may span batches —
    the tail group is carried; nothing else is buffered, so executor
    memory is O(one group), not O(collect_list of the hot term).

    aggregated=False: input rows are raw token OCCURRENCES (no tf
    column, duplicate doc_ords adjacent after the sort). tf is then a
    run-length count computed inline — this removes the
    groupBy(term, doc_ord) hash-agg shuffle from the build entirely
    (salt is a function of doc_ord, so (term, doc) duplicates are
    guaranteed co-located and adjacent).

    lean (only with aggregated=False): the shuffled rows carry ONLY
    (term, doc_ord, dl[, pos]) — term_bucket and salt are NOT
    materialized through the shuffle (the dominant memory-bandwidth
    cost of the build is shuffle row bytes; dropping 8-12 bytes/
    occurrence cuts it ~25%). The encoder recomputes salt from doc_ord
    (vectorized; salt is doc_ord-range monotone, so sorting by
    (term, doc_ord) still yields contiguous (term, salt) runs) and
    crc32 term buckets per GROUP (not per occurrence).
    lean = {'nb': n_term_buckets, 'ns': n_salt_buckets,
            'base': doc_ord_base, 'n': n_docs}."""

    def encode(batches):
        import zlib

        import pyarrow as pa
        import pyarrow.compute as pc

        from sparkbm25.codec import encode_blocks_batch

        carry = None  # dict: term_pa (pa array) + numpy int arrays

        def lean_salt(docs):
            return np.minimum(
                lean["ns"] - 1,
                (docs - lean["base"]) * lean["ns"] // max(lean["n"], 1)
            ).astype(np.int32)

        def emit(tb_arr, terms_pa, salts, docs, tfs, dls, group_offsets,
                 positions=None, occ_offsets=None):
            blocks = encode_blocks_batch(
                docs, tfs, dls, group_offsets,
                k1=k1, b=b, avgdl=avgdl, block_size=block_size,
                positions=positions, occ_offsets=occ_offsets)
            if postings_acc is not None:
                postings_acc.add(int(docs.size))
                rows_acc.add(int(group_offsets.size - 1))
            if term_ids:
                # dictionary mode: emit the int id; the term string and
                # its crc32 bucket are joined back in the JVM after
                # encode (segment rows are tiny relative to postings)
                return pa.RecordBatch.from_arrays(
                    [
                        terms_pa.cast(pa.int64()),
                        pa.array(salts, type=pa.int32()),
                        pa.array(np.diff(group_offsets), type=pa.int64()),
                        pa.array(blocks, type=_block_pa_type(with_pos)),
                    ],
                    names=["term_id", "salt", "n_docs", "blocks"],
                )
            if tb_arr is None:
                # lean mode: crc32 bucket per GROUP start (identical to
                # term_bucket_col's JVM crc32 — verified byte-equal)
                nb = lean["nb"]
                tb_arr = np.fromiter(
                    (zlib.crc32(t.encode()) % nb for t in terms_pa.to_pylist()),
                    dtype=np.int32, count=len(terms_pa))
            return pa.RecordBatch.from_arrays(
                [
                    pa.array(tb_arr, type=pa.int32()),
                    terms_pa.cast(pa.string()),
                    pa.array(salts, type=pa.int32()),
                    pa.array(np.diff(group_offsets), type=pa.int64()),
                    pa.array(blocks, type=_block_pa_type(with_pos)),
                ],
                names=["term_bucket", "term", "salt", "n_docs", "blocks"],
            )

        for rb in batches:
            if rb.num_rows == 0:
                continue
            # term strings/ids stay in Arrow (C++) end to end — no
            # Python materialization per posting (memory-traffic hot spot)
            term_pa = rb.column(rb.schema.get_field_index(
                "term_id" if term_ids else "term"))
            docs = rb.column(rb.schema.get_field_index("doc_ord")).to_numpy(
                zero_copy_only=False)
            if lean is not None:
                tb = None
                salt = lean_salt(docs)
            else:
                tb = rb.column(rb.schema.get_field_index("term_bucket")).to_numpy(
                    zero_copy_only=False)
                salt = rb.column(rb.schema.get_field_index("salt")).to_numpy(
                    zero_copy_only=False)
            if aggregated:
                tfs = rb.column(rb.schema.get_field_index("tf")).to_numpy(
                    zero_copy_only=False)
            else:
                tfs = np.ones(rb.num_rows, dtype=np.int64)  # placeholder
            dls = rb.column(rb.schema.get_field_index("dl")).to_numpy(
                zero_copy_only=False)
            pos = (rb.column(rb.schema.get_field_index("pos")).to_numpy(
                zero_copy_only=False) if with_pos else None)

            if carry is not None:
                term_pa = pa.concat_arrays(
                    [carry["term_pa"].cast(term_pa.type), term_pa])
                if tb is not None:
                    tb = np.concatenate([carry["tb"], tb])
                salt = np.concatenate([carry["salt"], salt])
                docs = np.concatenate([carry["docs"], docs])
                tfs = np.concatenate([carry["tfs"], tfs])
                dls = np.concatenate([carry["dls"], dls])
                if with_pos:
                    pos = np.concatenate([carry["pos"], pos])
                carry = None

            n = docs.size
            # group starts: term or salt changes; adjacent-inequality
            # computed in Arrow C++
            change = np.empty(n, dtype=bool)
            change[0] = True
            if n > 1:
                neq = pc.not_equal(term_pa.slice(1), term_pa.slice(0, n - 1))
                change[1:] = neq.to_numpy(zero_copy_only=False) | (salt[1:] != salt[:-1])
            starts = np.flatnonzero(change)

            if starts.size == 1:
                # the whole batch is one (possibly continuing) group
                carry = {"term_pa": term_pa, "tb": tb, "salt": salt,
                         "docs": docs, "tfs": tfs, "dls": dls, "pos": pos}
                continue

            last_start = int(starts[-1])
            carry = {
                "term_pa": term_pa.slice(last_start),
                "tb": None if tb is None else tb[last_start:],
                "salt": salt[last_start:], "docs": docs[last_start:],
                "tfs": tfs[last_start:], "dls": dls[last_start:],
                "pos": pos[last_start:] if with_pos else None,
            }
            # complete groups: boundaries = starts (last element == the
            # carried group's start == end of the complete region)
            go = starts.astype(np.int64)
            if aggregated:
                region = (docs[:last_start], tfs[:last_start], dls[:last_start], go)
                kw = {}
            else:
                region, kw = _occurrences_to_runs(
                    change, docs, dls, last_start, go,
                    pos if with_pos else None)
            yield emit(
                None if tb is None else tb[starts[:-1]],
                term_pa.take(pa.array(starts[:-1], type=pa.int64())),
                salt[starts[:-1]],
                *region, **kw,
            )

        if carry is not None and carry["docs"].size:
            docs = carry["docs"]
            L = docs.size
            go = np.array([0, L], dtype=np.int64)
            if aggregated:
                region = (docs, carry["tfs"], carry["dls"], go)
                kw = {}
            else:
                cmask = np.zeros(L, dtype=bool)
                cmask[0] = True
                region, kw = _occurrences_to_runs(
                    cmask, docs, carry["dls"], L, go, carry["pos"])
            yield emit(
                None if carry["tb"] is None else carry["tb"][:1],
                carry["term_pa"].slice(0, 1), carry["salt"][:1],
                *region, **kw,
            )

    return encode


def _make_tok_ingest(offsets_bc, pattern: str, maxlen: int):
    """Ingest factory for the FUSED tokenize+pack scan (verify-order
    packed builds): batches carry (pid, _fid, text); the per-task
    closure re-derives the bookkeeping pass's (seq, local_idx) from the
    same deterministic file runs and maps them through the broadcast
    {(pid, seq): offset} table to absolute doc_ords. Token lists exist
    only inside the Python worker that immediately packs them — they
    never cross to the JVM or into any cache (guide §8: the heavy
    token bytes move exactly once, straight into the packed runs)."""
    from sparkbm25.analysis import (DEFAULT_TOKEN_PATTERN,
                                    tokenize_arrow_ascii, tokenize_series)

    def make():
        import pyarrow as pa

        fseq: dict = {}
        offs: dict = {}
        omap = offsets_bc.value

        def ingest(rb):
            nr = rb.num_rows
            ni = {n: i for i, n in enumerate(rb.schema.names)}
            text = rb.column(ni["text"])
            fast = (tokenize_arrow_ascii(text, maxlen)
                    if pattern == DEFAULT_TOKEN_PATTERN else None)
            if fast is not None:
                toks = fast[0]
            else:
                toks_pd = tokenize_series(text.to_pandas(), pattern, maxlen)
                toks = pa.array(toks_pd.tolist(), type=pa.list_(pa.string()))
            pid = int(rb.column(ni["pid"])[0].as_py())
            fid = rb.column(ni["_fid"]).to_numpy(zero_copy_only=False)
            docs = np.empty(nr, dtype=np.int64)
            starts = np.flatnonzero(np.r_[True, fid[1:] != fid[:-1]])
            bounds = np.r_[starts, nr]
            for s, e in zip(bounds[:-1], bounds[1:]):
                sq = fseq.setdefault(int(fid[s]), len(fseq))
                o = offs.get(sq, 0)
                off0 = omap.get((pid, sq))
                if off0 is None:
                    # the bookkeeping pass never saw this unit — the
                    # scan is not reproducing the same split layout
                    raise RuntimeError(
                        "fused packed re-scan hit a (pid, seq) unit "
                        "absent from the bookkeeping pass; the input "
                        "scan is not deterministic — rebuild with "
                        "encoder='stream' or input_order='shuffle'")
                docs[s:e] = off0 + o + np.arange(e - s, dtype=np.int64)
                offs[sq] = o + (e - s)
            return docs, toks

        return ingest

    return make


def _make_pack_kernel(ns: int, base: int, n_docs: int, with_pos: bool,
                      make_ingest=None):
    """Map-side SPIMI combine (encoder='packed'): one Arrow pass per
    doc-contiguous input partition that turns (doc_ord, tokens) rows
    into ONE packed row per (term, salt):

        (term, salt, min_doc, n_runs, runs[, pos])

    runs is a varint stream of interleaved (doc delta, tf, dl) per
    posting — the first doc of each packed row is absolute, so rows
    merge by concatenation. pos (store_positions) is the group's raw
    within-doc positions as varints, occurrence order.

    Why map-side: the shuffled rows are the build's memory-bandwidth
    ceiling (BENCH/BASELINE.md). The lean occurrence row costs ~30-40 B
    of serialization + sort traffic per token (string term + int64 doc
    + int32 dl + Tungsten row overhead); the packed run costs ~3-4
    varint bytes, the term string ships once per (partition, term,
    salt), and the partition-wide Tungsten sort over raw occurrences is
    replaced by a numpy stable argsort over int32 dictionary codes
    inside the same Python worker that already holds the Arrow batch.
    Measured whole-build at 960k turns (BENCH/r5/shuffle_bytes.json):
    shuffle records 17.2M -> 1.34M (12.8x); on-wire zstd bytes only
    1.35x smaller (the sorted occurrence stream compressed well) — the
    win is the eliminated row materialization + sort, not the wire.

    Memory: the kernel buffers one input partition's occurrence arrays
    (~16 B/token + the Arrow token buffer). At the 128 MB input-split
    sizing a 100 TB cluster run uses, that is a few hundred MB/task —
    the same order the Tungsten sort buffers today.

    Correctness invariants: token order inside a list IS position
    order, and a (term, doc) pair lives in exactly one partition
    (shuffle mode ranges on the key; verify mode's files are proven
    range-disjoint) — so tf completes map-side. Shuffle-mode
    partitions are doc_ord-ascending, so a stable sort on term codes
    keeps (doc, pos) order inside groups; verify-mode partitions can
    jump down at bin-packed file boundaries (and their doc ranges
    interleave ACROSS partitions), which the kernel detects (one
    np.diff scan) and handles by splitting packed rows on the
    monotonic file segment — every emitted row stays a sorted,
    globally range-disjoint run, which is what the reduce-side
    min_doc concatenation merge requires."""

    def default_ingest():
        def ingest(rb):
            return (rb.column(rb.schema.get_field_index("doc_ord"))
                    .to_numpy(zero_copy_only=False),
                    rb.column(rb.schema.get_field_index("tokens")))
        return ingest

    make_ingest_ = make_ingest or default_ingest

    def pack(batches):
        import pyarrow as pa
        import pyarrow.compute as pc

        from sparkbm25.codec import varint_encode_with_offsets

        ingest = make_ingest_()
        doc_chunks: list[np.ndarray] = []
        tok_chunks: list = []
        for rb in batches:
            if rb.num_rows == 0:
                continue
            docs_b, toks_b = ingest(rb)
            doc_chunks.append(docs_b)
            tok_chunks.append(toks_b)
        if not doc_chunks:
            return
        docs_d = np.concatenate(doc_chunks)
        toks = pa.chunked_array(tok_chunks)
        counts = pc.list_value_length(toks).fill_null(0).to_numpy(
            zero_copy_only=False).astype(np.int64)
        flat = pc.list_flatten(toks).combine_chunks()
        n = len(flat)
        if n == 0:
            return
        occ_doc = np.repeat(docs_d, counts)
        occ_dl = np.repeat(counts, counts)  # dl == len(tokens) by construction
        occ_pos = None
        if with_pos:
            doc_starts = np.concatenate(
                ([0], np.cumsum(counts)[:-1])).astype(np.int64)
            occ_pos = np.arange(n, dtype=np.int64) - np.repeat(doc_starts, counts)

        # group by term WITHOUT a string sort: dictionary-encode in
        # Arrow C++, stable-argsort the int32 codes (keeps doc/pos order)
        dict_arr = pc.dictionary_encode(flat)
        codes = dict_arr.indices.to_numpy(zero_copy_only=False)
        vocab = dict_arr.dictionary
        s_seg = None
        if docs_d.size > 1 and np.any(np.diff(docs_d) < 0):
            # input_order='verify' partitions are doc-ascending within
            # each FILE run but the scan bin-packs files in SIZE order,
            # so doc_ord jumps DOWN at file boundaries AND one
            # partition's doc ranges INTERLEAVE with another's (the
            # exact case test_verify_multi_file_partitions builds). A
            # plain stable code-argsort then emits unsorted docs inside
            # groups (negative run deltas wrapping through uint64) —
            # and even sorted, one row per (term, salt) would break the
            # reduce side, which concatenates rows as DISJOINT
            # min_doc-ordered RANGES (final-round review finding).
            # Both restore at once by splitting on the monotonic
            # segment: each down-jump starts a new seg (== file run,
            # globally range-disjoint by the verify proof), the sort
            # adds doc as secondary key (stability keeps within-doc
            # position order), and seg joins the group-change criterion
            # so each packed row spans ONE segment. The common case
            # (shuffle mode, or verify with one file run per partition)
            # pays only the np.diff scan.
            seg = np.zeros(docs_d.size, dtype=np.int64)
            seg[1:] = np.cumsum(np.diff(docs_d) < 0)
            occ_seg = np.repeat(seg, counts)
            order = np.lexsort((occ_doc, codes))
            s_seg = occ_seg[order]
        else:
            order = np.argsort(codes, kind="stable")
        s_codes = codes[order]
        s_doc = occ_doc[order]
        s_dl = occ_dl[order]
        s_pos = occ_pos[order] if with_pos else None
        salt = np.minimum(
            ns - 1, (s_doc - base) * ns // max(n_docs, 1)).astype(np.int32)

        change = np.empty(n, dtype=bool)
        change[0] = True
        if n > 1:
            change[1:] = (s_codes[1:] != s_codes[:-1]) | (salt[1:] != salt[:-1])
            if s_seg is not None:
                change[1:] |= s_seg[1:] != s_seg[:-1]
        gstarts = np.flatnonzero(change)
        go_occ = np.append(gstarts, n).astype(np.int64)
        G = gstarts.size

        region, kw = _occurrences_to_runs(
            change, s_doc, s_dl, n, go_occ, s_pos)
        run_docs, run_tfs, run_dls, go_runs = region
        m = run_docs.size

        deltas = run_docs.astype(np.uint64)
        if m > 1:
            d = deltas.copy()
            d[1:] = deltas[1:] - deltas[:-1]
            d[go_runs[:-1]] = deltas[go_runs[:-1]]  # group-first absolute
            deltas = d
        vals = np.empty(3 * m, dtype=np.uint64)
        vals[0::3] = deltas
        vals[1::3] = run_tfs.astype(np.uint64)
        vals[2::3] = run_dls.astype(np.uint64)
        buf, voff = varint_encode_with_offsets(vals)
        if voff[-1] > np.iinfo(np.int32).max:
            # int32 Arrow binary offsets: a single input partition whose
            # packed payload exceeds 2 GiB means the split sizing is off
            # by ~20x (a 128 MB input split packs to ~100 MB) — fail
            # loudly instead of overflowing the offsets silently
            raise ValueError(
                "packed partition payload exceeds 2 GiB; raise "
                "n_doc_partitions (or shrink input splits) so each "
                "partition packs to well under int32 offsets")
        byte_off = voff[3 * go_runs].astype(np.int32)
        runs_col = pa.Array.from_buffers(
            pa.binary(), G, [None, pa.py_buffer(byte_off), pa.py_buffer(buf)])

        arrays = [
            vocab.take(pa.array(s_codes[gstarts], type=pa.int64())).cast(
                pa.string()),
            pa.array(salt[gstarts], type=pa.int32()),
            pa.array(run_docs[go_runs[:-1]], type=pa.int64()),
            pa.array(np.diff(go_runs), type=pa.int64()),
            runs_col,
        ]
        names = ["term", "salt", "min_doc", "n_runs", "runs"]
        if with_pos:
            pbuf, pvoff = varint_encode_with_offsets(
                kw["positions"].astype(np.uint64))
            if pvoff[-1] > np.iinfo(np.int32).max:
                raise ValueError(
                    "packed partition positions payload exceeds 2 GiB; "
                    "raise n_doc_partitions (see runs-payload guard)")
            p_off = pvoff[go_occ].astype(np.int32)
            arrays.append(pa.Array.from_buffers(
                pa.binary(), G,
                [None, pa.py_buffer(p_off), pa.py_buffer(pbuf)]))
            names.append("pos")
        yield pa.RecordBatch.from_arrays(arrays, names=names)

    return pack


def _binary_col_stream(col) -> tuple[bytes, np.ndarray]:
    """Arrow binary column -> (concatenated payload bytes, per-row byte
    lengths). Fast path reads the offsets + data buffers directly (rows
    are adjacent in Arrow's layout); any sliced/offset layout falls back
    to a per-row join."""
    if hasattr(col, "combine_chunks"):  # ChunkedArray -> Array
        col = col.combine_chunks()
    if col.null_count == 0 and col.offset == 0:
        offs = np.frombuffer(col.buffers()[1], dtype=np.int32,
                             count=len(col) + 1)
        data = np.frombuffer(col.buffers()[2], dtype=np.uint8,
                             count=int(offs[-1]))
        return data[offs[0]:].tobytes(), np.diff(offs).astype(np.int64)
    rows = col.to_pylist()
    return b"".join(r or b"" for r in rows), np.array(
        [len(r or b"") for r in rows], dtype=np.int64)


def _make_merge_encoder(k1: float, b: float, avgdl: float, block_size: int,
                        nb: int, postings_acc=None, rows_acc=None,
                        with_pos: bool = False):
    """Reduce-side merge for encoder='packed': input rows are packed
    (term, salt, min_doc, n_runs, runs[, pos]) sorted by
    (term, salt, min_doc) within the partition. Rows of one (term,
    salt) group concatenate into the group's posting run (partition
    doc ranges are disjoint and min_doc-ordered), which block-encodes
    through the same codec as the stream path — segments come out
    byte-identical. Groups spanning Arrow batches are carried; decode
    of every blob in a batch happens in ONE varint pass."""

    def merge(batches):
        import zlib

        import pyarrow as pa
        import pyarrow.compute as pc

        from sparkbm25.codec import encode_blocks_batch, varint_decode

        carry = None  # {"term_pa", "salt", "docs", "tfs", "dls", "pos"}

        def emit(terms_pa, salts, docs, tfs, dls, go, positions=None):
            # Rows of a group concatenated by min_doc are doc-DISJOINT
            # but not always span-disjoint: a verify-mode partition
            # whose bin-packed files happen to concatenate ascending
            # (files 0,2,4) triggers no map-side segment split, yet its
            # one packed row SPANS another partition's file (1) — so
            # the concatenation is out of order even though every row
            # is sorted (final-round review finding; also covers the
            # adjacent-crc-collision merged-run corner). Detect the
            # interior down-jump and re-sort runs within each group —
            # one np.diff scan when clean, which is the common case.
            L = docs.size
            if L > 1:
                interior = np.ones(L - 1, dtype=bool)
                interior[go[1:-1] - 1] = False
                if ((np.diff(docs) < 0) & interior).any():
                    gid = np.repeat(np.arange(go.size - 1), np.diff(go))
                    perm = np.lexsort((docs, gid))
                    if with_pos:
                        # permute the occurrence stream at run
                        # granularity (run i owns its tf positions)
                        old_off = np.concatenate(
                            ([0], np.cumsum(tfs)))[:-1]
                        lens = tfs[perm]
                        starts = old_off[perm]
                        out_off = np.concatenate(
                            ([0], np.cumsum(lens)))[:-1]
                        idx = (np.arange(positions.size)
                               - np.repeat(out_off, lens)
                               + np.repeat(starts, lens))
                        positions = positions[idx]
                    docs, tfs, dls = docs[perm], tfs[perm], dls[perm]
            kw = {}
            if with_pos:
                occ_off = np.concatenate(
                    ([0], np.cumsum(tfs))).astype(np.int64)
                kw = {"positions": positions, "occ_offsets": occ_off}
            blocks = encode_blocks_batch(
                docs, tfs, dls, go, k1=k1, b=b, avgdl=avgdl,
                block_size=block_size, **kw)
            if postings_acc is not None:
                postings_acc.add(int(docs.size))
                rows_acc.add(int(go.size - 1))
            tb = np.fromiter(
                (zlib.crc32(t.encode()) % nb for t in terms_pa.to_pylist()),
                dtype=np.int32, count=len(terms_pa))
            return pa.RecordBatch.from_arrays(
                [
                    pa.array(tb, type=pa.int32()),
                    terms_pa.cast(pa.string()),
                    pa.array(salts, type=pa.int32()),
                    pa.array(np.diff(go), type=pa.int64()),
                    pa.array(blocks, type=_block_pa_type(with_pos)),
                ],
                names=["term_bucket", "term", "salt", "n_docs", "blocks"],
            )

        for rb in batches:
            if rb.num_rows == 0:
                continue
            term_pa = rb.column(rb.schema.get_field_index("term"))
            salt = rb.column(rb.schema.get_field_index("salt")).to_numpy(
                zero_copy_only=False)
            nr = rb.column(rb.schema.get_field_index("n_runs")).to_numpy(
                zero_copy_only=False).astype(np.int64)
            stream, _lens = _binary_col_stream(
                rb.column(rb.schema.get_field_index("runs")))
            vals = varint_decode(stream)
            deltas = vals[0::3]
            tfs = vals[1::3].astype(np.int64)
            dls = vals[2::3].astype(np.int64)
            # within-row cumsum (row firsts are absolute): rows chain
            # into groups by concatenation because doc ranges are
            # disjoint and the sort ordered them by min_doc
            rs = np.concatenate(([0], np.cumsum(nr)))[:-1]
            cs = np.cumsum(deltas.astype(np.int64))
            anchor = cs[rs] - deltas[rs].astype(np.int64)
            docs = cs - np.repeat(anchor, nr)
            pos = None
            if with_pos:
                pstream, _pl = _binary_col_stream(
                    rb.column(rb.schema.get_field_index("pos")))
                pos = varint_decode(pstream).astype(np.int64)

            if carry is not None:
                term_pa = pa.concat_arrays(
                    [carry["term_pa"].cast(term_pa.type), term_pa])
                salt = np.concatenate(([carry["salt"]], salt))
                nr = np.concatenate(([carry["docs"].size], nr))
                docs = np.concatenate([carry["docs"], docs])
                tfs = np.concatenate([carry["tfs"], tfs])
                dls = np.concatenate([carry["dls"], dls])
                if with_pos:
                    pos = np.concatenate([carry["pos"], pos])
                carry = None

            R = len(term_pa)
            change = np.empty(R, dtype=bool)
            change[0] = True
            if R > 1:
                neq = pc.not_equal(term_pa.slice(1), term_pa.slice(0, R - 1))
                change[1:] = (neq.to_numpy(zero_copy_only=False)
                              | (salt[1:] != salt[:-1]))
            g_rows = np.flatnonzero(change)
            row_run_off = np.concatenate(([0], np.cumsum(nr)))

            last_row = int(g_rows[-1])
            cut = int(row_run_off[last_row])  # run-space end of complete region
            occ_cut = None
            if with_pos:
                occ_all = np.concatenate(([0], np.cumsum(tfs)))
                occ_cut = int(occ_all[cut])
            carry = {
                "term_pa": term_pa.slice(last_row, 1),
                "salt": salt[last_row],
                "docs": docs[cut:], "tfs": tfs[cut:], "dls": dls[cut:],
                "pos": pos[occ_cut:] if with_pos else None,
            }
            if g_rows.size == 1:
                continue  # whole batch is one (possibly continuing) group
            go = row_run_off[g_rows].astype(np.int64)  # last == cut
            yield emit(
                term_pa.take(pa.array(g_rows[:-1], type=pa.int64())),
                salt[g_rows[:-1]],
                docs[:cut], tfs[:cut], dls[:cut], go,
                positions=pos[:occ_cut] if with_pos else None,
            )

        if carry is not None and carry["docs"].size:
            go = np.array([0, carry["docs"].size], dtype=np.int64)
            yield emit(carry["term_pa"], np.array([carry["salt"]]),
                       carry["docs"], carry["tfs"], carry["dls"], go,
                       positions=carry["pos"])

    return merge


def _occurrences_to_runs(group_change, docs, dls, L, group_offsets, pos=None):
    """Raw occurrence region -> ((unique docs, tf run-lengths, dls,
    group offsets remapped to run space), positions kwargs). The
    occurrence stream is sorted by (term, salt, doc_ord[, pos]), so a
    run == one posting and its occurrence slice == the posting's
    within-doc positions. group_change is the group boundary mask over
    the full concat array; only [:L] is complete."""
    doc_change = np.empty(L, dtype=bool)
    doc_change[0] = True
    if L > 1:
        doc_change[1:] = docs[1:L] != docs[:L - 1]
    rmask = group_change[:L] | doc_change
    rstarts = np.flatnonzero(rmask)
    run_ends = np.append(rstarts[1:], L)
    region = (
        docs[rstarts],
        (run_ends - rstarts).astype(np.int64),
        dls[rstarts],
        np.searchsorted(rstarts, group_offsets).astype(np.int64),
    )
    kw = {}
    if pos is not None:
        kw = {"positions": pos[:L].astype(np.int64),
              "occ_offsets": np.append(rstarts, L).astype(np.int64)}
    return region, kw


def build_index(
    spark: SparkSession,
    transcripts: DataFrame,
    index_dir: str,
    config: IndexConfig = IndexConfig(),
    *,
    resume: bool = False,
    input_desc: str = "",
    doc_ord_base: int = 0,
) -> BuildResult:
    """Build (or resume building) the inverted index at index_dir.

    resume=False wipes index_dir (the reference's --force, cli.py:147);
    resume=True anti-joins the manifest and only builds what is missing
    (idempotency predicate analog, es_translator/es.py:131-150).
    """
    t0 = time.time()
    lineage = f"{config.config_hash()}:{input_desc}"

    if not resume and os.path.isdir(index_dir):
        shutil.rmtree(index_dir)
    os.makedirs(index_dir, exist_ok=True)
    catalog.clear_staging(index_dir)

    done = catalog.done_set(catalog.read_manifest(index_dir), lineage) if resume else set()

    n_chunks = (
        1 if not config.checkpoint_runs
        else max(1, min(config.n_build_chunks, config.n_term_buckets))
    )
    pending_chunks = [c for c in range(n_chunks) if ("segments", c) not in done]

    # ---------------- stage 1: docs + stats + tf runs -----------------
    # Without the on-disk runs checkpoint, stage 1 must be recomputed
    # whenever any segment chunk is still pending (the runs only live
    # in the cluster cache).
    tf_df = None
    stage1_done = ("tf", -1) in done and (config.checkpoint_runs or not pending_chunks)
    if stage1_done:
        stats = catalog.read_stats(index_dir)
        n_docs, avgdl = stats["n_docs"], stats["avgdl"]
    else:
        s0 = time.time()
        # verify-order packed builds keep token lists OUT of the
        # bookkeeping cache entirely: stage 1 caches only the small
        # id/dl/err proxy rows, and stage 2 re-derives (doc_ord,
        # tokens) inside the fused tokenize+pack scan (see
        # _make_tok_ingest) — the heavy token bytes go straight from
        # the input scan into packed runs, crossing the Python
        # boundary exactly once and never entering the block cache
        light_packed = (config.encoder == "packed"
                        and not config.checkpoint_runs
                        and config.input_order == "verify")
        df_tok = assign_doc_ords(transcripts, config, doc_ord_base,
                                 cache_tokens=not light_packed)

        # forward table (doc_ord ↔ (conv_id, turn_idx), dl) — needed for
        # top-k id resolution and the text-equality invariant check.
        catalog_docs = catalog.staging_dir(index_dir, "docs")
        attr_cols = [c for c in ("role", "tool", "ts") if c in df_tok.columns]
        from sparkbm25.annotate import ANNOTATION_TYPE

        (
            df_tok.select("doc_ord", "conv_id", "turn_idx", "dl", "err",
                          *attr_cols)
            # uniform annotations schema from day one, so a partial
            # annotate (rewriting only affected doc_blocks) never mixes
            # schemas across partition dirs
            .withColumn("annotations", F.lit(None).cast(ANNOTATION_TYPE))
            # doc_ord-range directory partitioning: point resolves prune
            # to the requested blocks; annotate rewrites only affected
            # blocks. Input partitions are doc_ord-contiguous (range
            # shuffle), so each task touches ~1 block — no file blowup.
            .withColumn("doc_block",
                        F.floor(F.col("doc_ord") / config.doc_block_size)
                        .cast("bigint"))
            .write.mode("overwrite").partitionBy("doc_block")
            .parquet(catalog_docs)
        )
        catalog.commit_staging(index_dir, "docs", catalog.docs_dir(index_dir))

        counts = df_tok._sparkbm25_counts
        n_docs = int(counts["count"].sum())
        sum_dl = int(counts["sum_dl"].fillna(0).sum())
        avgdl = (sum_dl / n_docs) if n_docs else 0.0

        nb, ns = config.n_term_buckets, config.n_salt_buckets
        salt_col = F.least(
            F.lit(ns - 1),
            F.floor((F.col("doc_ord") - F.lit(doc_ord_base)) * ns
                    / F.lit(max(n_docs, 1))),
        ).cast("int")
        if config.encoder == "packed" and config.checkpoint_runs:
            raise ValueError(
                "encoder='packed' streams map-side combined runs straight "
                "into the merge: use checkpoint_runs=False (the resumable "
                "pre-aggregated SPIMI runs are the 'stream' path's)")
        if config.store_positions:
            if config.checkpoint_runs or config.encoder not in ("stream", "packed"):
                raise ValueError(
                    "store_positions rides the raw occurrence stream: "
                    "use IndexConfig(encoder='stream'|'packed', "
                    "checkpoint_runs=False)")
        if config.encoder == "packed":
            # map-side SPIMI combine: NO explode — the pack kernel
            # flattens the tokens ListArray zero-copy and aggregates
            # (term, doc) runs inside the partition (positions ride the
            # token order, so store_positions needs no posexplode either)
            if light_packed:
                # fused scan input: narrow (pid, _fid, text) columns
                # straight off the input scan; the pack ingest
                # tokenizes and assigns doc_ords itself
                occurrences = df_tok._sparkbm25_dfp.select(
                    "pid", "_fid", "text")
                pack_offsets = df_tok._sparkbm25_offsets
            else:
                occurrences = df_tok.select("doc_ord", "tokens")
                pack_offsets = None
        elif config.store_positions:
            occurrences = df_tok.select(
                "doc_ord", F.col("dl").cast("int").alias("dl"),
                F.posexplode("tokens").alias("pos", "term"))
            occurrences = occurrences.withColumn("pos", F.col("pos").cast("int"))
        else:
            occurrences = df_tok.select(
                "doc_ord", F.col("dl").cast("int").alias("dl"),
                F.explode("tokens").alias("term"))
        if config.checkpoint_runs:
            # the on-disk SPIMI runs are pre-aggregated (compact) —
            # this is the resumable configuration
            tf = (
                occurrences
                .withColumn("term_bucket", term_bucket_col(F.col("term"), nb))
                .withColumn("salt", salt_col)
                .groupBy("term_bucket", "term", "salt", "doc_ord")
                .agg(F.count(F.lit(1)).alias("tf"), F.max("dl").alias("dl"))
            )
            tf_staging = catalog.staging_dir(index_dir, "tf")
            # co-locate each bucket in one task before the partitioned
            # write: file count = n_buckets, not tasks × buckets
            tf = tf.repartition(nb, "term_bucket")
            tf.write.mode("overwrite").partitionBy("term_bucket").parquet(tf_staging)
            catalog.commit_staging(index_dir, "tf", catalog.tf_dir(index_dir))
            df_tok._sparkbm25_cached.unpersist()
        elif config.encoder == "stream":
            # direct LEAN path: raw (term, doc_ord, dl[, pos]) rows flow
            # into the shuffle-sort encoder, which counts tf as
            # run-lengths AND recomputes salt/term_bucket post-shuffle —
            # the groupBy(term, doc) hash-agg shuffle disappears
            # entirely and the shuffled rows carry no derivable columns
            # (shuffle bytes are the build's memory-bandwidth ceiling)
            tf_df = occurrences
        elif config.encoder == "packed":
            tf_df = occurrences
        else:
            tf_df = (
                occurrences
                .withColumn("term_bucket", term_bucket_col(F.col("term"), nb))
                .withColumn("salt", salt_col)
                .groupBy("term_bucket", "term", "salt", "doc_ord")
                .agg(F.count(F.lit(1)).alias("tf"), F.max("dl").alias("dl"))
            )

        catalog.write_stats(
            index_dir,
            {
                "n_docs": n_docs,
                "avgdl": avgdl,
                "sum_dl": sum_dl,
                "doc_ord_base": doc_ord_base,
                "config": config.to_json(),
                "lineage": lineage,
            },
        )
        s1 = time.time()
        catalog.append_manifest(index_dir, _mrow(
            "tf", -1, n_docs, 0, s0, s1, lineage))

    if n_docs == 0:
        # empty input: a valid index is just the stats (queries
        # short-circuit on n_docs == 0; nothing to encode or resolve)
        if tf_df is not None:
            df_tok._sparkbm25_cached.unpersist()
        catalog.clear_staging(index_dir)
        catalog.write_complete_marker(index_dir)
        return BuildResult(index_dir=index_dir, n_docs=0, avgdl=0.0,
                           seconds=time.time() - t0, turns_per_sec=0.0)

    # ---------------- stage 2: segments, chunked ----------------------
    k1, b, bs = config.k1, config.b, config.block_size
    encoder = _make_segment_encoder(k1, b, float(avgdl), bs)
    for chunk in pending_chunks:
        c0 = time.time()
        if tf_df is not None:
            tf_chunk = tf_df  # single-chunk streaming path
        else:
            buckets = [bk for bk in range(config.n_term_buckets) if bk % n_chunks == chunk]
            tf_chunk = (
                spark.read.parquet(catalog.tf_dir(index_dir))
                .where(F.col("term_bucket").isin(buckets))  # partition pruning
            )
        n_out = max(len(buckets) if tf_df is None else config.n_term_buckets, 1)
        postings_acc = spark.sparkContext.accumulator(0)
        rows_acc = spark.sparkContext.accumulator(0)
        if config.encoder == "stream":
            # shuffle-sort SPIMI merge: hash-shuffle by (term, salt) so a
            # group lives in exactly one partition, cluster it with a
            # partition-local sort, stream-encode with group carry.
            aggregated = "tf" in tf_chunk.columns
            with_pos = config.store_positions and not aggregated
            n_shuffle = int(spark.conf.get("spark.sql.shuffle.partitions"))
            vdf = None
            if aggregated:
                cols = ["term_bucket", "term", "salt", "doc_ord", "dl", "tf"]
                sorted_tf = (
                    tf_chunk.repartition(n_shuffle, "term", "salt")
                    .sortWithinPartitions("term", "salt", "doc_ord")
                    .select(*cols)
                )
                lean = None
            else:
                # LEAN shuffle: rows carry only (term, doc_ord, dl[,pos]).
                # The (term, salt) partition key is hashed from an
                # EXPRESSION (salt recomputed from doc_ord) so salt never
                # materializes into the shuffled bytes; within a
                # partition, salt is monotone in doc_ord for a fixed
                # term, so sorting by (term, doc_ord[, pos]) already
                # clusters (term, salt) groups.
                ns2 = config.n_salt_buckets
                salt_expr = F.least(
                    F.lit(ns2 - 1),
                    F.floor((F.col("doc_ord") - F.lit(doc_ord_base)) * ns2
                            / F.lit(max(n_docs, 1))),
                ).cast("int")
                lean = {"nb": config.n_term_buckets, "ns": ns2,
                        "base": doc_ord_base, "n": n_docs}
                # dictionary encoding: replace the term string with an
                # int64 id via a broadcast vocab join, when the vocab
                # fits the bound — the dominant shuffle-sort then
                # compares 8-byte ints, not strings
                vdf = None
                if config.dict_terms == "auto":
                    cap = config.dict_max_vocab
                    vocab_pdf = (
                        tf_chunk.select("term").distinct().limit(cap + 1)
                        .toPandas())
                    if len(vocab_pdf) <= cap:
                        vocab_pdf = vocab_pdf.sort_values("term").reset_index(
                            drop=True)
                        vocab_pdf["term_id"] = np.arange(
                            len(vocab_pdf), dtype=np.int64)
                        vdf = spark.createDataFrame(
                            vocab_pdf, schema="term string, term_id bigint")
                term_col = "term_id" if vdf is not None else "term"
                cols = [term_col, "doc_ord", "dl"] + (["pos"] if with_pos else [])
                src = (tf_chunk.join(F.broadcast(vdf), "term")
                       if vdf is not None else tf_chunk)
                sorted_tf = (
                    src.select(*cols)
                    .repartition(n_shuffle, F.col(term_col), salt_expr)
                    .sortWithinPartitions(term_col, "doc_ord",
                                          *(["pos"] if with_pos else []))
                )
            stream_enc = _make_stream_encoder(k1, b, float(avgdl), bs,
                                              postings_acc, rows_acc,
                                              aggregated=aggregated,
                                              with_pos=with_pos,
                                              lean=lean,
                                              term_ids=(not aggregated
                                                        and vdf is not None))
            seg = sorted_tf.mapInArrow(
                stream_enc,
                schema=segment_schema(with_pos,
                                      term_ids=(not aggregated
                                                and vdf is not None)))
            if not aggregated and vdf is not None:
                # join the strings back onto the (tiny) segment rows and
                # restore the bucket column in the JVM
                seg = (
                    seg.join(F.broadcast(vdf), "term_id").drop("term_id")
                    .withColumn("term_bucket",
                                term_bucket_col(F.col("term"),
                                                config.n_term_buckets))
                )
        elif config.encoder == "packed":
            # map-side SPIMI combine: the pack kernel emits one varint
            # row per (term, salt, input partition); the exchange moves
            # compressed runs (~3-4 B/posting) instead of occurrence
            # rows (~30-40 B/token), and the reduce side is a
            # concatenation merge (disjoint, min_doc-ordered ranges)
            # into the same block codec — segments byte-identical to
            # the 'stream' path
            with_pos = config.store_positions
            make_ingest = None
            if pack_offsets is not None:
                make_ingest = _make_tok_ingest(
                    spark.sparkContext.broadcast(pack_offsets),
                    config.token_pattern, config.max_content_length)
            pack = _make_pack_kernel(
                config.n_salt_buckets, doc_ord_base, n_docs, with_pos,
                make_ingest=make_ingest)
            packed_schema = (
                "term string, salt int, min_doc bigint, n_runs bigint, "
                "runs binary" + (", pos binary" if with_pos else ""))
            packed = tf_chunk.mapInArrow(pack, schema=packed_schema)
            n_shuffle = int(spark.conf.get("spark.sql.shuffle.partitions"))
            sorted_packed = (
                packed.repartition(n_shuffle, "term", "salt")
                .sortWithinPartitions("term", "salt", "min_doc")
            )
            merge = _make_merge_encoder(
                k1, b, float(avgdl), bs, config.n_term_buckets,
                postings_acc, rows_acc, with_pos=with_pos)
            seg = sorted_packed.mapInArrow(
                merge, schema=segment_schema(with_pos))
        else:
            grouped = tf_chunk.groupBy("term_bucket", "term", "salt").agg(
                F.sort_array(
                    F.collect_list(F.struct("doc_ord", "tf", "dl"))
                ).alias("postings")
            )
            seg = grouped.mapInArrow(encoder, schema=SEGMENT_SCHEMA)
        # encoded segments are compact; one shuffle aligns files with
        # the term_bucket directory layout
        seg = seg.repartition(n_out, "term_bucket")
        stage_name = f"segchunk{chunk}"
        seg.write.mode("overwrite").partitionBy("term_bucket").parquet(
            catalog.staging_dir(index_dir, stage_name)
        )
        catalog.commit_staging(
            index_dir, stage_name, catalog.segments_chunk_dir(index_dir, chunk)
        )
        # chunk metrics: accumulators filled by the encode tasks (no
        # extra job, no driver-side column read); footer fallback for
        # the collect-encoder path
        if config.encoder in ("stream", "packed"):
            n_rows, n_postings = rows_acc.value, postings_acc.value
        else:
            n_rows, n_postings = _segment_chunk_metrics(
                catalog.segments_chunk_dir(index_dir, chunk))
        c1 = time.time()
        catalog.append_manifest(index_dir, _mrow(
            "segments", chunk, n_postings, n_rows, c0, c1, lineage))

    if tf_df is not None:
        df_tok._sparkbm25_cached.unpersist()

    # ---------------- stage 3: term dictionary ------------------------
    if config.build_terms_dict and ("terms", -1) not in done:
        d0 = time.time()
        segs = spark.read.parquet(catalog.segments_dir(index_dir))
        # term-SORTED write with a length column (VERDICT r4 item 3):
        # range-partitioned + sorted-within-partition means parquet
        # row-group min/max statistics on `term` are TIGHT, so a
        # prefix leaf's range predicate (term >= p AND term < p+1)
        # prunes to the matching row groups instead of scanning the
        # whole vocabulary; `length` gives fuzzy leaves a cheap
        # |len(term)-len(q)| <= d band before any edit-distance work
        terms = (
            segs.groupBy("term")
            .agg(F.sum("n_docs").alias("df"), F.first("term_bucket").alias("term_bucket"))
            .withColumn("length", F.length("term").cast("int"))
            .repartitionByRange("term")
            .sortWithinPartitions("term")
        )
        terms.write.mode("overwrite").parquet(catalog.staging_dir(index_dir, "terms"))
        catalog.commit_staging(index_dir, "terms", catalog.terms_dir(index_dir))
        n_terms = _parquet_num_rows(catalog.terms_dir(index_dir))
        d1 = time.time()
        catalog.append_manifest(index_dir, _mrow(
            "terms", -1, 0, n_terms, d0, d1, lineage))

    catalog.clear_staging(index_dir)
    catalog.write_complete_marker(index_dir)
    seconds = time.time() - t0
    return BuildResult(
        index_dir=index_dir,
        n_docs=n_docs,
        avgdl=float(avgdl),
        seconds=seconds,
        turns_per_sec=(n_docs / seconds) if seconds > 0 else 0.0,
    )


def _parquet_files(root: str) -> list[str]:
    out = []
    for dirpath, _dirs, files in os.walk(root):
        out.extend(os.path.join(dirpath, f) for f in files if f.endswith(".parquet"))
    return out


def _parquet_num_rows(root: str) -> int:
    import pyarrow.parquet as pq

    return sum(pq.read_metadata(f).num_rows for f in _parquet_files(root))


def _segment_chunk_metrics(chunk_dir: str) -> tuple[int, int]:
    """(segment rows, total postings) from footers + the n_docs column."""
    import pyarrow.parquet as pq

    rows = 0
    postings = 0
    for f in _parquet_files(chunk_dir):
        rows += pq.read_metadata(f).num_rows
        tbl = pq.read_table(f, columns=["n_docs"])
        postings += int(pd.Series(tbl["n_docs"].to_numpy()).sum()) if tbl.num_rows else 0
    return rows, postings


def _mrow(stage: str, pid: int, n_turns: int, n_terms: int,
          t_start: float, t_end: float, lineage: str) -> dict:
    secs = max(t_end - t_start, 1e-9)
    return {
        "stage": stage,
        "partition_id": pid,
        "status": "done",
        "n_turns": n_turns,
        "n_terms": n_terms,
        "seconds": secs,
        "turns_per_sec": n_turns / secs,
        "started_at": pd.Timestamp(t_start, unit="s"),
        "finished_at": pd.Timestamp(t_end, unit="s"),
        "lineage": lineage,
    }
