#!/usr/bin/env python
"""Round-5 (late) evidence: interactive latency of the grammar added
after the interactive_paths recording — Lucene regexp queries (text +
keyword-field), general wildcard filter values, the field:* exists
alias, ISO-8601 ts ranges, and group boosts. One 960k-turn
positions-bearing index; each query measured cold (first driver hit:
banded dictionary expansion where applicable + postings fetch) and
warm, plus the same query through search_batch, plus rank parity
between the two routes. Prints one JSON line + writes
BENCH/r5/new_surface_paths.json.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..", "..")))

N_TURNS = int(os.environ.get("NSP_TURNS", "960000"))


def main():
    import pandas as pd
    from pyspark.sql import SparkSession

    from bench import ensure_input
    from sparkbm25 import IndexConfig, Searcher, build_index, search_batch

    shm = "/dev/shm/sparkbm25_nspaths"
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
                input_desc=f"nspaths_{N_TURNS}")
    build_s = time.time() - b0

    s = Searcher(spark, idx)
    s.search("warmup w0000", k=10)
    # the fixture spans ~27h from 2026-01-01; mid-day bracket is
    # selective but non-trivial
    shapes = {
        "regexp": "/w000[15]/",
        "regexp_or_term": "/w00[01]5/ OR w0001",
        "regexp_noprefix": "/.*0015/",          # documented full-scan case
        "wildcard_filter": "role:u?er w0001 w0005",
        "filter_exists": "role:* w0001",
        "keyword_regexp": "role:/us.r/ w0001 w0005",
        "ts_range": "ts:[2026-01-01T06:00:00 TO 2026-01-01T18:00:00] "
                    "w0001 w0005",
        "ts_one_sided": "ts:>=2026-01-01T12:00:00 w0001",
        "group_boost": "(w0001 w0005)^2 w0010",
        # final round-5 grammar: top-level alternation (the banding
        # fix — pre-fix this silently dropped the right branch),
        # Lucene-dialect constructs (quoted head + escaped letter +
        # any-string, banded by the extracted 'w000' head), and
        # backslash escapes (escaped letters no-op; the escaped star
        # analyzes away so this IS the term w0001 filtered)
        "regexp_alternation": "/w0001|w0015/",
        "regexp_dialect": '/"w0"0\\0[15]/',
        "escaped_query": "w000\\1\\* role:us\\er",
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
        r2 = s.search(qt, k=10)
        warm = min(warm1, time.time() - t0)
        qdf = pd.DataFrame({"query_id": [0], "query_text": [qt], "k": [10]})
        t0 = time.time()
        rb = (search_batch(spark, idx, qdf, k=10)
              .toPandas().sort_values("rank"))
        batch = time.time() - t0
        assert rb["conv_id"].tolist() == r2["conv_id"].tolist(), name
        out["queries"][name] = {
            "cold_s": round(cold, 4), "warm_s": round(warm, 4),
            "batch_s": round(batch, 4), "path": path, "rows": len(r1),
            "parity": "rank-identical vs batch",
        }
    spark.stop()
    shutil.rmtree(shm, ignore_errors=True)
    print(json.dumps(out))
    suffix = "" if N_TURNS == 960000 else f"_{N_TURNS}"
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           f"new_surface_paths{suffix}.json"), "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
