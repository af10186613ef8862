#!/usr/bin/env python
"""Headline benchmark: index-build turns/sec + BM25 query latencies.

Prints ONE JSON line:
  {"metric": "index_build_turns_per_sec", "value": <turns/sec>,
   "unit": "turns/sec", "queries": {"<qid>": seconds, ...},
   "sf": <sf>, ...extras}

Input: a deterministic synthetic transcripts table (BASELINE.json
input_hint shape; seed=42), sized from the sf of $SPARK_GRAFT_SF_DIR
(n_turns = sf * 2.4M) and cached as parquet under /tmp so repeated
runs (and the local[8]/local[32] scaling proof) read the identical
input. Runs on local[$SPARK_GRAFT_CPUS].
"""

from __future__ import annotations

import json
import os
import re
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

TURNS_PER_SF = 9_600_000  # sf0.1 -> 960k turns (amortizes fixed job costs)


def sf_of(sf_dir: str) -> float:
    m = re.search(r"sf([0-9.]+)", sf_dir)
    return float(m.group(1)) if m else 0.1


def ensure_input(n_turns: int, n_files: int = 32) -> str:
    """Deterministic cached transcripts parquet dir (seed=42), split
    into n_files so the initial scan parallelizes (a single file with
    one row group would serialize every input read)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    path = os.path.join(tempfile.gettempdir(), f"sparkbm25_bench_transcripts_{n_turns}")
    done = os.path.join(path, "_DONE")
    if not os.path.exists(done):
        from sparkbm25.fixtures import make_transcripts

        pdf = make_transcripts(n_turns)
        os.makedirs(path, exist_ok=True)
        step = (len(pdf) + n_files - 1) // n_files
        for i in range(n_files):
            part = pdf.iloc[i * step:(i + 1) * step]
            if len(part) == 0:
                break
            pq.write_table(pa.Table.from_pandas(part, preserve_index=False),
                           os.path.join(path, f"part-{i:04d}.parquet"))
        with open(done, "w") as f:
            f.write("ok")
    return path


def effective_parallelism(cpus: int) -> float:
    """Measured effective core count: the same pure-python busy loop
    timed at 1 process and at `cpus` processes — perfect scaling gives
    `cpus`, a hypervisor delivering fewer physical cores than the
    advertised vCPUs gives less. Late round 5 this VM dropped from
    near-linear 32-proc scaling (documented in BENCH/BASELINE.md r4
    scaling analysis) to ~16 effective cores, which collapsed the
    local[32] build 108-178k -> ~33k turns/s while local[16] still
    hit ~100k (BENCH/r5/overcommit_ab.json). ~1s, runs before Spark
    starts (fork-safe)."""
    import multiprocessing as mp

    n = 20_000_000
    _busy(n // 4)             # spin the governor up before timing
    t0 = time.time()
    _busy(n)
    t1 = max(time.time() - t0, 1e-3)
    with mp.Pool(cpus) as p:
        p.map(_busy, [n // 10] * cpus)   # absorb fork + import cost
        t0 = time.time()
        p.map(_busy, [n] * cpus)
        tn = max(time.time() - t0, 1e-3)
    return cpus * t1 / tn


def _busy(n: int) -> int:
    x = 0
    for i in range(n):
        x += i * i
    return x


def run_bench(sf_dir: str, cpus: int, out_index: str | None = None) -> dict:
    from pyspark.sql import SparkSession

    from sparkbm25 import IndexConfig, Searcher, build_index
    from sparkbm25.fixtures import make_queries

    sf = sf_of(sf_dir)
    n_turns = int(os.environ.get("SPARK_GRAFT_BENCH_TURNS", 0)) or max(
        int(sf * TURNS_PER_SF), 5000)
    input_path = ensure_input(n_turns)

    # shuffle + index on tmpfs: the VM's single virtual disk is shared
    # across all cores, so disk-bound shuffle IO would masquerade as a
    # serial fraction in the N-vs-4N scaling proof. On a real cluster
    # shuffle goes to per-executor local NVMe — RAM here is the honest
    # stand-in for that.
    shm = "/dev/shm/sparkbm25_bench"
    os.makedirs(shm, exist_ok=True)
    # task-slot sizing against MEASURED host capacity: a production
    # cluster sizes executor slots to physical cores; this VM's
    # hypervisor sometimes delivers far fewer cores than the 32 it
    # advertises (late-r5 window: ~16 effective), and running 32 task
    # threads + 32 python workers on ~16 cores collapsed the build
    # 2.7x (BENCH/r5/overcommit_ab.json: 33k plain vs 89k with
    # task.cpus=2 vs 115k local[16], interleaved). The master stays
    # the contracted local[$SPARK_GRAFT_CPUS]; task.cpus widens per-
    # task reservations so CONCURRENT tasks match measured capacity.
    # Full-capacity hosts probe ~cpus -> task_cpus=1 (no change).
    eff = effective_parallelism(cpus)
    task_cpus = 1 if eff >= 0.75 * cpus else max(
        2, min(4, round(cpus / eff)))
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.task.cpus", str(task_cpus))
        .appName(f"sparkbm25-bench-{cpus}")
        .config("spark.sql.shuffle.partitions", str(max(cpus * 4, 16)))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        # zstd shuffle blocks: ~8% faster than lz4 at high parallelism
        # here (the build is shuffle-bandwidth-bound; denser blocks move
        # fewer bytes), ~5% slower at 2 threads — the right trade at
        # cluster scale (measured A/B in BENCH/BASELINE.md)
        .config("spark.io.compression.codec", "zstd")
        .config("spark.ui.enabled", "false")
        .config("spark.local.dir", os.path.join(shm, "local"))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        # UDS for python-worker Arrow IPC: the 9.6M-turn robustness run
        # livelocked on this kernel's loopback TCP (retransmission
        # backoff to rto=120s with on-loopback drops under
        # bidirectional Arrow traffic); Unix sockets have no
        # congestion control/retransmission to break (round-5 finding,
        # BENCH/BASELINE.md)
        .config("spark.python.unix.domain.socket.enabled", "true")
        # one input FILE per scan partition at ANY core count: with
        # openCost == maxPartitionBytes the bin-packer closes a
        # partition after every file. At local[2] the default packing
        # folds the 32 sorted input files into 2 giant partitions
        # (the verify fast path then builds from 2 tasks — measured
        # ~40% slower than shuffle's 32 repartitioned tasks), which is
        # a local-mode artifact: a real cluster scanning 100 TB has
        # orders of magnitude more files than cores. Pinning the unit
        # also makes the N-vs-4N scaling legs process IDENTICAL task
        # layouts — only parallelism differs.
        .config("spark.sql.files.maxPartitionBytes", "128m")
        .config("spark.sql.files.openCostInBytes", "128m")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    index_dir = out_index or os.path.join(shm, f"index_{n_turns}_{cpus}")
    # tmpfs hygiene: a stale index from a previous round would both
    # skew resume semantics and leak RAM
    if out_index is None:
        import shutil

        shutil.rmtree(index_dir, ignore_errors=True)
    # streamlined config for the throughput headline: single chunk,
    # runs streamed straight into the segment build. The resumable
    # configuration (checkpoint_runs=True, chunked commits) is what
    # the tests exercise; BENCH/BASELINE.md reports both.
    cfg = IndexConfig(
        n_term_buckets=32,
        n_salt_buckets=8,
        n_build_chunks=1,
        n_doc_partitions=max(cpus, 8),
        checkpoint_runs=os.environ.get("SPARK_GRAFT_CHECKPOINT", "0") == "1",
        build_terms_dict=False,
        # 'packed' (map-side SPIMI combine) is the headline default:
        # same-JVM interleaved A/B in a quiet window put it ~9.5% ahead
        # of 'stream' at local[32] with byte-identical segments
        # (BENCH/r5/packed_ab_samejvm.json; subprocess A/Bs in noisy
        # windows were sign-unstable, BENCH/r5/packed_ab.json)
        encoder=os.environ.get("SPARK_GRAFT_ENCODER", "packed"),
        # the bench input is written sorted into non-overlapping files;
        # 'verify' PROVES that at runtime (per-partition order check +
        # driver bound check) and skips the stage-1 full-text range
        # shuffle — the Iceberg write-ordered-table path
        # (BENCH/r5/inorder_ab.json)
        input_order=os.environ.get("SPARK_GRAFT_INPUT_ORDER", "verify"),
    )

    transcripts = spark.read.parquet(input_path)
    # contamination-hardened repetitions (round-2 lesson: a recorded
    # 16.6k headline hid a real 114.5k because BOTH reps ran under
    # outside host load). Keep adding reps — bounded — until the two
    # fastest agree within 20%; report the agreement ratio and the
    # 1-min loadavg per rep so a contaminated record is visible as
    # such. The minimum of agreeing reps is the least contaminated
    # sample of the job's true cost.
    import shutil

    min_reps = max(int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "2")), 2)
    max_reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS_MAX", "5"))
    build_times: list[float] = []
    loads: list[float] = []
    for rep in range(max_reps):
        shutil.rmtree(index_dir, ignore_errors=True)
        loads.append(round(os.getloadavg()[0], 1))
        t0 = time.time()
        res = build_index(spark, transcripts, index_dir, cfg,
                          input_desc=f"bench_{n_turns}")
        build_times.append(time.time() - t0)
        if rep + 1 >= min_reps:
            best2 = sorted(build_times)[:2]
            if best2[1] <= best2[0] * 1.2:
                break
    best2 = sorted(build_times)[:2]
    build_secs = min(build_times)
    turns_per_sec = n_turns / build_secs

    # query latencies: interactive driver path (vectorized MaxScore),
    # cold pass per query, then a warm pass (bounded LRU posting +
    # resolve caches -> zero Spark jobs for repeated vocabulary)
    searcher = Searcher(spark, index_dir)
    queries = make_queries()
    qtimes: dict[str, float] = {}
    warm_times: dict[str, float] = {}
    # warm the JVM/parquet footers once
    searcher.search("warmup w0000", k=10)
    for q in queries.itertuples(index=False):
        tq = time.time()
        searcher.search(q.query_text, k=10)
        qtimes[f"q{q.query_id}"] = round(time.time() - tq, 4)
    for q in queries.itertuples(index=False):
        tq = time.time()
        searcher.search(q.query_text, k=10)
        warm_times[f"q{q.query_id}"] = round(time.time() - tq, 4)

    # interactive FILTERED query (round-5 driver fast path, VERDICT r4
    # item 6): `terms + role:user` previously paid the ~0.4-0.6s
    # distributed batch detour; now it's driver scoring + one pruned
    # forward-table probe. Additive keys — the 10 headline queries
    # above are unchanged for cross-round comparability.
    fq = "role:user w0001 w0005"
    tq = time.time()
    searcher.search(fq, k=10)
    qtimes["q_filtered"] = round(time.time() - tq, 4)
    tq = time.time()
    searcher.search(fq, k=10)
    warm_times["q_filtered"] = round(time.time() - tq, 4)

    # batch path: the whole query set as one DataFrame job
    from sparkbm25.search import search_batch

    tb = time.time()
    search_batch(spark, index_dir, queries, k=10).collect()
    qtimes["batch_all"] = round(time.time() - tb, 4)

    spark.stop()
    out = {
        "metric": "index_build_turns_per_sec",
        "value": round(turns_per_sec, 1),
        "unit": "turns/sec",
        "queries": qtimes,
        "sf": sf,
        "n_turns": n_turns,
        "build_seconds": round(build_secs, 2),
        "all_build_seconds": [round(t, 2) for t in build_times],
        # two-fastest-reps agreement ratio: >1.2 means the bound of 5
        # reps ran out before two agreed — treat the headline as
        # host-load contaminated
        "rep_agreement": round(best2[1] / best2[0], 3) if len(best2) == 2 else 1.0,
        "contaminated": bool(len(best2) == 2 and best2[1] > best2[0] * 1.2),
        "load_avg_per_rep": loads,
        "queries_warm": warm_times,
        "cpus": cpus,
        # measured host capacity + the task-slot width chosen from it
        # (see the spark.task.cpus comment above): a degraded record
        # is self-describing instead of silently misattributing the
        # hypervisor's missing cores to the plan
        "host_effective_cores": round(eff, 1),
        "task_cpus": task_cpus,
    }
    # surface the recorded N-vs-4N scaling evidence (BENCH/scaling_run.py,
    # the north_rule two-cluster-size substitute) in the one-line JSON
    scaling_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH", "scaling.json")
    if os.path.exists(scaling_path):
        with open(scaling_path) as f:
            s = json.load(f)
        out["scaling"] = {
            k: s[k] for k in s
            if k.startswith("turns_per_sec_local")
            or k in ("efficiency", "scaling_factor", "n_turns",
                     "target", "pass")
        }
    return out


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    result = run_bench(sf_dir, cpus)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
