#!/usr/bin/env python
"""Round-5 sf1 companion: the same 9.6M-turn index queried with the
driver-postings budget SIZED TO THE CORPUS (6e7) instead of the 1e7
default. The default bound is a memory-safety bound; at sf1 the hot
bench terms exceed it and route to the distributed batch path
(correct, bounded, but 1-5 s per query). This run evidences that the
driver paths themselves stay interactive an order of magnitude up
when the operator budget is raised to match: warm queries return to
the tens-of-milliseconds regime (the heaviest all-hot-term filtered
query ~0.5 s, all inherent vectorized scoring of ~17M postings).

Requires the index left by BENCH/r5/sf1_run.py at
/dev/shm/sparkbm25_bench/index_9600000_32.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..", "..")))

BUDGET = 60_000_000
INDEX = "/dev/shm/sparkbm25_bench/index_9600000_32"


def main():
    from pyspark.sql import SparkSession

    from sparkbm25 import Searcher
    from sparkbm25.fixtures import make_queries

    spark = (SparkSession.builder.master("local[32]")
             .config("spark.sql.shuffle.partitions", "128")
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.ui.enabled", "false")
             .config("spark.driver.memory", "48g")
             .config("spark.python.unix.domain.socket.enabled", "true")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    s = Searcher(spark, INDEX, max_driver_postings=BUDGET)
    queries = make_queries()
    s.search("warmup w0000", k=10)
    qs = [(f"q{q.query_id}", q.query_text)
          for q in queries.itertuples(index=False)]
    qs.append(("q_filtered", "role:user w0001 w0005"))
    cold, warm, paths = {}, {}, {}
    for name, qt in qs:
        t0 = time.time()
        s.search(qt, k=10)
        cold[name] = round(time.time() - t0, 4)
        paths[name] = s.last_path
    # two warm passes; record the SECOND (steady state — the first
    # still pays page-cache warmup on the freshly decoded arrays)
    for _ in range(2):
        for name, qt in qs:
            t0 = time.time()
            s.search(qt, k=10)
            warm[name] = round(time.time() - t0, 4)
    out = {"budget": BUDGET, "n_turns": 9_600_000, "cold": cold,
           "warm": warm, "paths": paths,
           "cached_postings": s._post_cache_postings}
    print(json.dumps(out))
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "sf1_bigbudget.json"), "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
