#!/usr/bin/env python
"""Round-5 evidence for the exhaustive-dense OR path: on hot
multi-cursor unions (prefix expansion over the Zipf head, stopword
ORs) whose summed dfs reach the corpus size, MaxScore's essential set
is near-total and its per-chunk candidate alignment prunes nothing —
one bincount scatter should win. A/B the SAME warm queries with the
dense floor disabled (forcing MaxScore) vs default routing, asserting
bit-identical results. Prints one JSON line + BENCH/r5/dense_ab.json.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..", "..")))

N_TURNS = 960_000


def _best_warm(searcher, qt, reps=3):
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        searcher.search(qt, k=10)
        best = min(best, time.time() - t0)
    return best


def main():
    from pyspark.sql import SparkSession

    from bench import ensure_input
    from sparkbm25 import IndexConfig, Searcher, build_index

    shm = "/dev/shm/sparkbm25_denseab"
    shutil.rmtree(shm, ignore_errors=True)
    os.makedirs(shm, exist_ok=True)
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(max(cpus * 4, 16)))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.io.compression.codec", "zstd")
        .config("spark.ui.enabled", "false")
        .config("spark.local.dir", os.path.join(shm, "local"))
        .config("spark.driver.memory", "48g")
        .config("spark.python.unix.domain.socket.enabled", "true")
        .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    input_path = ensure_input(N_TURNS)
    idx = os.path.join(shm, "idx")
    cfg = IndexConfig(n_term_buckets=32, n_salt_buckets=8,
                      n_build_chunks=1, n_doc_partitions=max(cpus, 8),
                      checkpoint_runs=False)
    build_index(spark, spark.read.parquet(input_path), idx, cfg,
                input_desc=f"denseab_{N_TURNS}")

    shapes = {
        "prefix_hot": "w000*",        # 10 Zipf-head terms OR'd
        "stopword_or": "w0000 w0001",
        "stopword_or3": "w0000 w0001 w0002",
    }
    s_ms = Searcher(spark, idx)
    s_ms.dense_min_postings = 1 << 62   # force MaxScore
    s_d = Searcher(spark, idx)          # default floor -> dense eligible
    for s in (s_ms, s_d):
        s.search("warmup w0005", k=10)
    out = {"n_turns": N_TURNS, "cpus": cpus, "queries": {}}
    for name, qt in shapes.items():
        ms = _best_warm(s_ms, qt)
        path_ms = s_ms.last_path
        de = _best_warm(s_d, qt)
        path_d = s_d.last_path
        a = s_ms.search(qt, k=10)
        b = s_d.search(qt, k=10)
        assert a["conv_id"].tolist() == b["conv_id"].tolist(), name
        assert a["score"].tolist() == b["score"].tolist(), name
        out["queries"][name] = {
            "maxscore_warm_s": round(ms, 4), "dense_warm_s": round(de, 4),
            "path_a": path_ms, "path_b": path_d,
            "speedup": round(ms / de, 2) if de > 0 else None,
        }
    spark.stop()
    shutil.rmtree(shm, ignore_errors=True)
    print(json.dumps(out))
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "dense_ab.json"), "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
