#!/usr/bin/env python
"""Round-5 evidence: interactive latency of the query shapes that
left the batch detour this round — filtered flat queries, expanded
prefix/fuzzy/wildcard leaves, exact/sloppy phrases, one-level CNF
with negated conjuncts. One 960k-turn positions-bearing index; each
query measured cold (first driver hit: expansion job + postings fetch
+ forward probes) and warm (caches hot), against the same query
through search_batch (the pre-round-5 route). Prints one JSON line +
BENCH/r5/interactive_paths.json.
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


def main():
    import pandas as pd
    from pyspark.sql import SparkSession

    from bench import ensure_input
    from sparkbm25 import IndexConfig, Searcher, build_index, search_batch

    shm = "/dev/shm/sparkbm25_ipaths"
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
                      store_positions=True, checkpoint_runs=False)
    b0 = time.time()
    build_index(spark, spark.read.parquet(input_path), idx, cfg,
                input_desc=f"ipaths_{N_TURNS}")
    build_s = time.time() - b0

    s = Searcher(spark, idx)
    s.search("warmup w0000", k=10)
    shapes = {
        "filtered_terms": "role:user w0001 w0005",
        "prefix": "w000*",
        "fuzzy": "w0001~1",
        "wildcard": "w00?1",
        "phrase": '"w0001 w0002"',
        "phrase_slop": '"w0002 w0001"~2',
        "phrase3_slop": '"w0000 w0001 w0002"~4',
        "phrase_or_term": '"w0001 w0002" OR w0005',
        "filtered_phrase": 'role:user "w0001 w0002"~2',
        "cnf": "(w0001 OR w0002) AND (w0005 OR w000*)",
        "cnf_not": "w0001 AND NOT w0002",
        "filtered_cnf": "role:user (w0001 OR w0002) AND w0005",
    }
    out = {"n_turns": N_TURNS, "cpus": cpus,
           "build_seconds": round(build_s, 2), "queries": {}}
    for name, qt in shapes.items():
        t0 = time.time()
        r1 = s.search(qt, k=10)
        cold = time.time() - t0
        path = s.last_path
        t0 = time.time()
        s.search(qt, k=10)
        warm1 = time.time() - t0
        t0 = time.time()
        s.search(qt, k=10)
        warm = min(warm1, time.time() - t0)
        qdf = pd.DataFrame({"query_id": [0], "query_text": [qt], "k": [10]})
        t0 = time.time()
        search_batch(spark, idx, qdf, k=10).collect()
        batch = time.time() - t0
        out["queries"][name] = {
            "cold_s": round(cold, 4), "warm_s": round(warm, 4),
            "batch_s": round(batch, 4), "path": path, "rows": len(r1),
        }
    spark.stop()
    shutil.rmtree(shm, ignore_errors=True)
    print(json.dumps(out))
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "interactive_paths.json"), "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
