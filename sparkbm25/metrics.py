"""Manifest metrics queries — the reference's monitor re-expressed.

es-translator's monitor polls Celery/Redis for per-worker counters and
derives throughput/ETA in a TUI loop (es_translator/monitor.py:133-263).
Here the build job *writes* per-partition metrics rows into the
manifest (FIXTURES.md §4) and "monitoring" is a DataFrame/pandas query
over them — same aggregations, queryable after the fact.
"""

from __future__ import annotations

import pandas as pd

from sparkbm25.catalog import read_manifest


def _current_build(m: pd.DataFrame) -> pd.DataFrame:
    """Rows of the MOST RECENT build only. The manifest is append-only
    across rebuilds and config changes (resume dedups within ONE
    lineage via catalog.done_set, but a resume=False rebuild appends a
    fresh lineage), so summing every row double-counted turns/seconds
    and reported the OLDEST build's lineage (final-round review)."""
    cur = m.loc[m["started_at"].idxmax(), "lineage"]
    return m[m["lineage"] == cur]


def build_summary(index_dir: str) -> dict:
    """A2 sums + A5/A6-style derived rates for the CURRENT (latest
    lineage) build of this index."""
    m = read_manifest(index_dir)
    if m.empty:
        return {"stages": 0}
    m = _current_build(m)
    seg = m[m["stage"] == "segments"]
    tfs = m[m["stage"] == "tf"]
    total_secs = float(m["seconds"].sum())
    n_turns = int(tfs["n_turns"].sum()) if not tfs.empty else 0
    return {
        "stages": len(m),
        "n_turns": n_turns,
        "n_postings": int(seg["n_turns"].sum()),
        "n_segment_rows": int(seg["n_terms"].sum()),
        "wall_seconds_sum": round(total_secs, 3),
        # A3-style overall rate (turns ÷ summed stage seconds)
        "turns_per_sec": round(n_turns / total_secs, 2) if total_secs else 0.0,
        # A6: per-partition (chunk) rates
        "per_chunk_postings_per_sec": {
            int(r.partition_id): round(float(r.n_turns) / float(r.seconds), 1)
            for r in seg.itertuples(index=False)
        },
        # A4-style peak across chunks
        "peak_chunk_postings_per_sec": round(
            float((seg["n_turns"] / seg["seconds"]).max()), 1) if not seg.empty else 0.0,
        "lineage": m["lineage"].iloc[0],
    }


def throughput_series(index_dir: str) -> pd.DataFrame:
    """A3/A4 source series: one row per stage/partition with rate,
    ordered by finish time (the monitor's history deque analog)."""
    m = read_manifest(index_dir)
    if m.empty:
        return m
    out = _current_build(m).sort_values("finished_at").copy()
    out["rate"] = out["n_turns"] / out["seconds"]
    # sliding mean over the last 3 samples (monitor history window)
    out["rate_avg3"] = out["rate"].rolling(3, min_periods=1).mean()
    out["rate_peak"] = out["rate"].cummax()  # session peak (A4)
    return out[["stage", "partition_id", "n_turns", "n_terms", "seconds",
                "rate", "rate_avg3", "rate_peak", "started_at", "finished_at"]]


def eta_seconds(total_turns: int, done_turns: int, avg_rate: float) -> float:
    """A5: remaining ÷ avg throughput (monitor.py:242-249)."""
    if avg_rate <= 0:
        return float("inf")
    return max(total_turns - done_turns, 0) / avg_rate


def build_errors(spark, index_dir: str):
    """Per-row error side-output of the build (F5): rows the tokenizer
    tagged instead of dropping (null text, truncation). The analog of
    the reference's log-and-continue error record per doc
    (es_translator/es_translator.py:264-271). Returns a DataFrame
    (conv_id, turn_idx, err) of the poison rows only."""
    from pyspark.sql import functions as F

    from sparkbm25 import catalog

    docs = catalog.read_docs(spark, index_dir)
    if "err" not in docs.columns:
        return spark.createDataFrame(
            [], "conv_id string, turn_idx int, err string")
    return (
        docs.where(F.col("err").isNotNull())
        .select("conv_id", F.col("turn_idx").cast("int").alias("turn_idx"),
                "err")
    )
