#!/usr/bin/env python
"""Round-5 evidence (VERDICT r4 item 7): large mixed-batch plan
scaling. One search_batch call carrying N queries mixed across every
stream the engine compiles — scored terms, boolean trees, phrases
(exact + sloppy), prefix expansion, filtered scored, filter-only —
at N = 100 / 300 / 1000. The claim under test: wall-clock grows
SUBLINEARLY in N (the scored side is ONE broadcast join + decode pass
for the whole batch; filters ride the chunked _FILTER_LEG predicate
legs; plan-compile cost must not blow up at 1000 queries the way the
round-3 monolithic CASE array did at 100).

Usage: python BENCH/r5/mixed_batch.py  → one JSON line + file in
BENCH/r5/mixed_batch_1000.json
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..", "..")))

N_TURNS = 240_000
SIZES = (100, 300, 1000)


def gen_queries(n: int, vocab: list[str]):
    """Deterministic mixed query set: ~40% plain scored, 15% boolean
    trees, 15% filtered scored, 15% filter-only, 10% phrases (half
    sloppy), 5% prefix."""
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(1234)
    roles = ["user", "assistant", "system", "tool"]

    def w():
        return vocab[int(rng.integers(0, len(vocab)))]

    texts = []
    for i in range(n):
        r = i % 20
        if r < 8:
            texts.append(f"{w()} {w()} {w()}")
        elif r < 11:
            texts.append(f"({w()} OR {w()}) AND NOT {w()}")
        elif r < 14:
            texts.append(f"role:{roles[i % 4]} {w()} {w()}")
        elif r < 17:
            texts.append(f"role:{roles[i % 4]} AND turn_idx:[0 TO {2 + i % 6}]")
        elif r < 19:
            slop = "~2" if r == 18 else ""
            texts.append(f'"{w()} {w()}"{slop}')
        else:
            texts.append(f"{w()[:4]}*")
    return pd.DataFrame({"query_id": range(n), "query_text": texts,
                         "k": [10] * n})


def main():
    from pyspark.sql import SparkSession

    from sparkbm25 import IndexConfig, build_index, search_batch
    from sparkbm25.fixtures import make_transcripts

    shm = "/dev/shm/sparkbm25_mixed"
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

    t = make_transcripts(N_TURNS)
    vocab = sorted({tok for txt in t["text"].iloc[:2000]
                    for tok in txt.lower().split()})
    index_dir = os.path.join(shm, "idx")
    cfg = IndexConfig(n_term_buckets=32, n_salt_buckets=8,
                      n_build_chunks=1, n_doc_partitions=max(cpus, 8),
                      store_positions=True, checkpoint_runs=False)
    b0 = time.time()
    build_index(spark, spark.createDataFrame(t), index_dir, cfg,
                input_desc=f"mixed_{N_TURNS}")
    build_s = time.time() - b0

    out = {"n_turns": N_TURNS, "cpus": cpus, "build_seconds": round(build_s, 2),
           "sizes": {}}
    # warm the scan/footers once so the N=100 point isn't charged JVM
    # warmup that the larger points amortize
    warm = gen_queries(20, vocab)
    search_batch(spark, index_dir, warm, k=10).collect()
    for n in SIZES:
        q = gen_queries(n, vocab)
        t0 = time.time()
        rows = search_batch(spark, index_dir, q, k=10).collect()
        dt = time.time() - t0
        out["sizes"][str(n)] = {
            "wall_seconds": round(dt, 2),
            "per_query_ms": round(dt / n * 1000, 1),
            "result_rows": len(rows),
        }
    s100 = out["sizes"]["100"]["wall_seconds"]
    s1000 = out["sizes"]["1000"]["wall_seconds"]
    out["scaleup_10x_queries"] = round(s1000 / s100, 2)
    out["sublinear"] = bool(s1000 < 10 * s100)
    spark.stop()
    shutil.rmtree(shm, ignore_errors=True)
    print(json.dumps(out))
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "mixed_batch_1000.json"), "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
