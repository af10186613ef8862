#!/usr/bin/env python
"""dict_terms A/B on a LONG-TOKEN corpus (VERDICT r3 item 8).

The bench corpus's short Zipf vocabulary measured dict_terms neutral
(lz4/zstd already dedups the repeated short strings through the
shuffle). This probe builds a corpus whose tokens are 25-40 chars and
unique-heavy — the shape where sorting int64 ids instead of strings in
the dominant (term, salt) shuffle-sort should finally pay — and runs
the same build with dict_terms='off' vs 'auto' at local[$CPUS].

Prints one JSON line with best-of-N build seconds per mode.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_long_token_transcripts(n_turns: int, seed: int = 7):
    """Transcripts whose vocabulary is 200k distinct 25-40 char tokens
    (flat-ish distribution): long strings, weak repetition — the
    worst case for string shuffle-sort comparisons."""
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(seed)
    vocab_n = 200_000
    stems = np.array([
        f"verylongtokenstem{i:07d}partone{i % 97:02d}suffix"[: 25 + (i % 16)]
        for i in range(vocab_n)
    ])
    n_words = rng.integers(8, 20, size=n_turns)
    flat = stems[rng.integers(0, vocab_n, size=int(n_words.sum()))]
    bounds = np.concatenate(([0], np.cumsum(n_words)))
    texts = [" ".join(flat[bounds[i]:bounds[i + 1]]) for i in range(n_turns)]
    n_conv = max(n_turns // 8, 1)
    conv = np.repeat([f"conv_{i:08d}" for i in range(n_conv)],
                     -(-n_turns // n_conv))[:n_turns]
    tidx = np.zeros(n_turns, dtype=np.int32)
    _, starts = np.unique(conv, return_index=True)
    for s in starts:
        e = min(s + -(-n_turns // n_conv), n_turns)
        tidx[s:e] = np.arange(e - s)
    return pd.DataFrame({
        "conv_id": conv, "turn_idx": tidx,
        "role": np.where(np.arange(n_turns) % 2 == 0, "user", "assistant"),
        "text": texts, "tool": None,
        "ts": np.datetime64("2026-01-01", "us")
        + np.arange(n_turns).astype("timedelta64[us]"),
    })


def main():
    from pyspark.sql import SparkSession

    from sparkbm25 import IndexConfig, build_index

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "8"))
    n_turns = int(os.environ.get("SPARK_GRAFT_AB_TURNS", "600000"))
    reps = int(os.environ.get("SPARK_GRAFT_AB_REPS", "2"))
    shm = "/dev/shm/sparkbm25_dictab"
    os.makedirs(shm, exist_ok=True)

    import pyarrow as pa
    import pyarrow.parquet as pq

    input_path = os.path.join(shm, f"input_{n_turns}")
    if not os.path.exists(os.path.join(input_path, "_DONE")):
        pdf = make_long_token_transcripts(n_turns)
        os.makedirs(input_path, exist_ok=True)
        step = -(-len(pdf) // 16)
        for i in range(16):
            part = pdf.iloc[i * step:(i + 1) * step]
            if len(part):
                pq.write_table(pa.Table.from_pandas(part, preserve_index=False),
                               os.path.join(input_path, f"part-{i:04d}.parquet"))
        open(os.path.join(input_path, "_DONE"), "w").write("ok")

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(f"dict-ab-{cpus}")
        .config("spark.sql.shuffle.partitions", str(max(cpus * 4, 16)))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.io.compression.codec", "zstd")
        .config("spark.ui.enabled", "false")
        .config("spark.local.dir", os.path.join(shm, "local"))
        .config("spark.driver.memory", "48g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    transcripts = spark.read.parquet(input_path)

    out = {"cpus": cpus, "n_turns": n_turns, "vocab": "200k x 25-40 chars"}
    for mode in ("off", "auto"):
        cfg = IndexConfig(n_term_buckets=32, n_salt_buckets=8,
                          n_build_chunks=1, n_doc_partitions=max(cpus, 8),
                          checkpoint_runs=False, build_terms_dict=False,
                          dict_terms=mode)
        times = []
        for rep in range(reps):
            idx = os.path.join(shm, f"idx_{mode}")
            shutil.rmtree(idx, ignore_errors=True)
            t0 = time.time()
            build_index(spark, transcripts, idx, cfg,
                        input_desc=f"dictab_{mode}_{rep}")
            times.append(round(time.time() - t0, 2))
        out[f"build_seconds_{mode}"] = times
        out[f"best_{mode}"] = min(times)
    out["speedup_auto_vs_off"] = round(out["best_off"] / out["best_auto"], 3)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
