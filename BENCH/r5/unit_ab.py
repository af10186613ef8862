#!/usr/bin/env python
"""Round-5 evidence for the cached unit-score vector: every driver
algorithm's per-posting contribution is weight × tf/(tf + k1*(1-b+
b*(dl/avgdl))); the second factor is query-independent, so caching it
per _TermPostings turns each warm query's vector math into one scalar
multiply (profiled: the BM25 vector compute was ~60% of warm filtered
latency on a hot term).

A/B: the SAME /dev/shm index served by two interpreter states —
A = the repo at the pre-change commit (git worktree), B = the working
tree — interleaved A,B,A,B within one host window, warm best-of-5 per
query. Results must be rank-identical with scores equal to 1e-12 rel
(the change only reassociates weight*(tf/denom) vs (weight*tf)/denom,
and aligns the driver with codec.py's max_impact association, making
the WAND block bound exact instead of exceedable-by-an-ulp).

Usage: python BENCH/r5/unit_ab.py <old_tree_path>
Prints one JSON line + writes BENCH/r5/unit_ab.json.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))
sys.path.insert(0, REPO)

N_TURNS = 960_000

QUERIES = [
    ("filtered", "role:user w0001 w0005"),
    ("hot_or", "w0001 OR w0005"),
    ("hot3", "w0000 w0001 w0005"),
    ("and2", "w0001 AND w0005"),
    ("maxscore4", "w0003 w0071 w0573 w0010"),
]

_CHILD = r"""
import json, sys, time
from pyspark.sql import SparkSession
from sparkbm25 import Searcher

idx, tag = sys.argv[1], sys.argv[2]
spark = (SparkSession.builder.master("local[32]")
         .config("spark.sql.shuffle.partitions", "32")
         .config("spark.sql.session.timeZone", "UTC")
         .config("spark.driver.memory", "48g")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
s = Searcher(spark, idx)
s.search("warmup w0000", k=10)
out = {}
for name, qt in json.loads(sys.argv[3]):
    s.search(qt, k=10)                     # populate caches
    best = float("inf")
    for _ in range(5):
        t0 = time.time()
        r = s.search(qt, k=10)
        best = min(best, time.time() - t0)
    out[name] = {"warm_ms": round(best * 1000, 2),
                 "docs": r.conv_id.tolist(),
                 "scores": [float(x) for x in r.score]}
print("ABRESULT " + json.dumps(out))
"""


def run_state(tree: str, idx: str) -> dict:
    env = dict(os.environ, PYTHONPATH=tree)
    p = subprocess.run(
        [sys.executable, "-c", _CHILD, idx, tree,
         json.dumps(QUERIES)],
        capture_output=True, text=True, env=env, cwd="/tmp")
    for line in p.stdout.splitlines():
        if line.startswith("ABRESULT "):
            return json.loads(line[len("ABRESULT "):])
    raise RuntimeError(p.stdout[-2000:] + p.stderr[-2000:])


def main():
    old_tree = os.path.abspath(sys.argv[1])
    from pyspark.sql import SparkSession

    from bench import ensure_input
    from sparkbm25 import IndexConfig, build_index

    shm = "/dev/shm/sparkbm25_unitab"
    idx = os.path.join(shm, "idx")
    if not os.path.exists(os.path.join(idx, "manifest")):
        shutil.rmtree(shm, ignore_errors=True)
        os.makedirs(shm, exist_ok=True)
        spark = (SparkSession.builder.master("local[32]")
                 .config("spark.sql.shuffle.partitions", "32")
                 .config("spark.sql.session.timeZone", "UTC")
                 .config("spark.local.dir", os.path.join(shm, "local"))
                 .config("spark.driver.memory", "48g")
                 .config("spark.ui.enabled", "false").getOrCreate())
        spark.sparkContext.setLogLevel("ERROR")
        cfg = IndexConfig(n_term_buckets=32, n_salt_buckets=8,
                          n_build_chunks=1, checkpoint_runs=False)
        build_index(spark, spark.read.parquet(ensure_input(N_TURNS)),
                    idx, cfg, input_desc="unit_ab")
        spark.stop()

    sessions = []
    for rep in range(2):                       # interleaved A,B,A,B
        sessions.append(("old", run_state(old_tree, idx)))
        sessions.append(("new", run_state(REPO, idx)))

    # parity: every session rank-identical; scores equal to 1e-12 rel
    base = sessions[0][1]
    for tag, res in sessions[1:]:
        for name in base:
            assert res[name]["docs"] == base[name]["docs"], (tag, name)
            for a, b in zip(res[name]["scores"], base[name]["scores"]):
                assert abs(a - b) <= 1e-12 * max(abs(a), abs(b)), (
                    tag, name, a, b)

    summary = {"n_turns": N_TURNS, "queries": {}}
    for name, _ in QUERIES:
        olds = [r[name]["warm_ms"] for t, r in sessions if t == "old"]
        news = [r[name]["warm_ms"] for t, r in sessions if t == "new"]
        summary["queries"][name] = {
            "old_warm_ms": min(olds), "new_warm_ms": min(news),
            "speedup": round(min(olds) / max(min(news), 1e-9), 2)}
    summary["parity"] = "rank-identical, scores <=1e-12 rel across all sessions"
    out = os.path.join(os.path.dirname(__file__), "unit_ab.json")
    with open(out, "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
