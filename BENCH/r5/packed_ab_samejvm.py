#!/usr/bin/env python
"""Same-JVM A/B: stream vs packed encoder, alternating builds inside
ONE warmed SparkSession on the SAME cached input. This removes JVM
startup, codegen warmup, and most host-window drift from the
comparison (the subprocess A/B in packed_ab.py flipped sign across two
noisy windows); pairwise per-iteration ratios plus best-of-N are the
readout.

Usage: python BENCH/r5/packed_ab_samejvm.py [reps] [cpus] [n_turns]
Writes BENCH/r5/packed_ab_samejvm.json.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))
sys.path.insert(0, REPO)


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    n_turns = int(sys.argv[3]) if len(sys.argv) > 3 else 960_000

    probe = json.loads(subprocess.run(
        [sys.executable, os.path.join(REPO, "BENCH", "host_probe.py")],
        capture_output=True, text=True).stdout)

    import bench
    from pyspark.sql import SparkSession

    from sparkbm25 import IndexConfig, build_index

    input_path = bench.ensure_input(n_turns)
    shm = "/dev/shm/packed_ab_samejvm"
    os.makedirs(shm, exist_ok=True)
    spark = (SparkSession.builder.master(f"local[{cpus}]")
             .appName("packed-ab-samejvm")
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
    src = spark.read.parquet(input_path)

    def build_once(encoder: str) -> float:
        cfg = IndexConfig(n_term_buckets=32, n_salt_buckets=8,
                          n_build_chunks=1, n_doc_partitions=max(cpus, 8),
                          checkpoint_runs=False, build_terms_dict=False,
                          encoder=encoder)
        idx = os.path.join(shm, "idx")
        shutil.rmtree(idx, ignore_errors=True)
        t0 = time.time()
        build_index(spark, src, idx, cfg)
        return round(time.time() - t0, 2)

    # one unmeasured warmup pair (codegen + Arrow worker spin-up)
    build_once("stream")
    build_once("packed")
    times = {"stream": [], "packed": []}
    loads = []
    for _ in range(reps):
        for enc in ("stream", "packed"):
            loads.append(round(os.getloadavg()[0], 1))
            times[enc].append(build_once(enc))
    s_min, p_min = min(times["stream"]), min(times["packed"])
    pair_ratios = [round(s / p, 3)
                   for s, p in zip(times["stream"], times["packed"])]
    result = {
        "cpus": cpus, "n_turns": n_turns, "host_probe": probe,
        "build_seconds": times, "load_avg_per_pair": loads,
        "best": {"stream": s_min, "packed": p_min},
        "best_turns_per_sec": {"stream": round(n_turns / s_min, 1),
                               "packed": round(n_turns / p_min, 1)},
        "speedup_packed_best": round(s_min / p_min, 3),
        "pairwise_stream_over_packed": pair_ratios,
    }
    with open(os.path.join(REPO, "BENCH", "r5",
                           "packed_ab_samejvm.json"), "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))
    shutil.rmtree(shm, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
