#!/usr/bin/env python
"""Stage breakdown of the bench-config index build: how much wall
clock is stage 1 (tokenize + forward-table write + stats) vs stage 2
(occurrence shuffle + sort + stream encode + segment write)?  This
decides where a scaling-efficiency optimization can possibly help:
only the stage that dominates at high parallelism matters.

Uses bench.py's own deterministic cached input and Spark config so the
numbers line up with the headline records."""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n_turns = int(os.environ.get("SPARK_GRAFT_BENCH_TURNS", "960000"))

    import bench
    from pyspark.sql import SparkSession

    from sparkbm25 import IndexConfig, build_index

    input_path = bench.ensure_input(n_turns)
    shm = "/dev/shm/sparkbm25_profile"
    os.makedirs(shm, exist_ok=True)
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(f"stage-profile-{cpus}")
        .config("spark.sql.shuffle.partitions", str(max(cpus * 4, 16)))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.io.compression.codec", "zstd")
        .config("spark.ui.enabled", "false")
        .config("spark.local.dir", os.path.join(shm, "local"))
        .config("spark.driver.memory", "48g")
        .config("spark.python.unix.domain.socket.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    cfg = IndexConfig(
        n_term_buckets=32, n_salt_buckets=8, n_build_chunks=1,
        n_doc_partitions=max(cpus, 8), checkpoint_runs=False,
        build_terms_dict=False,
    )
    src = spark.read.parquet(input_path)
    idx = os.path.join(shm, "idx")
    reps = int(os.environ.get("REPS", "2"))
    out = []
    for rep in range(reps):
        shutil.rmtree(idx, ignore_errors=True)
        t0 = time.time()
        res = build_index(spark, src, idx, cfg)
        wall = time.time() - t0
        from sparkbm25 import catalog

        mdf = catalog.read_manifest(idx)
        out.append({
            "rep": rep, "cpus": cpus, "wall_s": round(wall, 2),
            "turns_per_sec": round(res.turns_per_sec, 1),
            "stages": [{"stage": r.stage, "pid": int(r.partition_id),
                        "seconds": round(float(r.seconds), 2)}
                       for r in mdf.itertuples()],
        })
    print(json.dumps(out, indent=2))
    shutil.rmtree(shm, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
