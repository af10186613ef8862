#!/usr/bin/env python
"""Measured shuffle volume: stream vs packed encoder on the SAME bench
input. Runs one build per encoder with the Spark UI enabled and sums
per-stage shuffle write bytes + records from the REST status API —
the primary claim behind encoder='packed' ("the exchange moves ~3-4 B
per posting instead of ~30-40 B per token") as numbers, not estimates.

Usage: python BENCH/r5/shuffle_bytes_probe.py [cpus] [n_turns]
Writes BENCH/r5/shuffle_bytes.json.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))

_CHILD = r"""
import json, os, shutil, sys, time, urllib.request
sys.path.insert(0, %(repo)r)
import bench
from pyspark.sql import SparkSession
from sparkbm25 import IndexConfig, build_index

encoder, cpus, n_turns = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
input_path = bench.ensure_input(n_turns)
shm = "/dev/shm/shufprobe"
os.makedirs(shm, exist_ok=True)
spark = (SparkSession.builder.master(f"local[{cpus}]")
         .appName(f"shufprobe-{encoder}")
         .config("spark.sql.shuffle.partitions", str(max(cpus * 4, 16)))
         .config("spark.sql.session.timeZone", "UTC")
         .config("spark.sql.adaptive.enabled", "true")
         .config("spark.io.compression.codec", "zstd")
         .config("spark.ui.enabled", "true")
         .config("spark.ui.port", "4049")
         .config("spark.local.dir", os.path.join(shm, "local"))
         .config("spark.driver.memory", "48g")
         .config("spark.python.unix.domain.socket.enabled", "true")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
cfg = IndexConfig(n_term_buckets=32, n_salt_buckets=8, n_build_chunks=1,
                  n_doc_partitions=max(cpus, 8), checkpoint_runs=False,
                  build_terms_dict=False, encoder=encoder)
src = spark.read.parquet(input_path)
idx = os.path.join(shm, "idx")
shutil.rmtree(idx, ignore_errors=True)
t0 = time.time()
build_index(spark, src, idx, cfg)
wall = time.time() - t0
app = spark.sparkContext.applicationId
stages = json.load(urllib.request.urlopen(
    f"http://localhost:4049/api/v1/applications/{app}/stages?status=complete"))
tot_w = sum(s.get("shuffleWriteBytes", 0) for s in stages)
tot_r = sum(s.get("shuffleReadBytes", 0) for s in stages)
tot_wr = sum(s.get("shuffleWriteRecords", 0) for s in stages)
print(json.dumps({"encoder": encoder, "wall_s": round(wall, 2),
                  "shuffle_write_bytes": tot_w, "shuffle_read_bytes": tot_r,
                  "shuffle_write_records": tot_wr,
                  "n_stages": len(stages)}))
shutil.rmtree(shm, ignore_errors=True)
spark.stop()
"""


def main():
    cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    n_turns = int(sys.argv[2]) if len(sys.argv) > 2 else 960_000
    results = {}
    for enc in ("stream", "packed"):
        out = subprocess.run(
            [sys.executable, "-c", _CHILD % {"repo": REPO}, enc,
             str(cpus), str(n_turns)],
            capture_output=True, text=True, timeout=1200,
            env=dict(os.environ, SPARK_GRAFT_BENCH_TURNS=str(n_turns)))
        line = [ln for ln in out.stdout.strip().splitlines()
                if ln.startswith("{")][-1]
        results[enc] = json.loads(line)
    s, p = results["stream"], results["packed"]
    results["ratio_write_bytes"] = round(
        s["shuffle_write_bytes"] / max(p["shuffle_write_bytes"], 1), 2)
    results["ratio_write_records"] = round(
        s["shuffle_write_records"] / max(p["shuffle_write_records"], 1), 2)
    with open(os.path.join(REPO, "BENCH", "r5", "shuffle_bytes.json"), "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
