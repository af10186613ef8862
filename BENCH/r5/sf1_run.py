#!/usr/bin/env python
"""Round-5 evidence (VERDICT r4 item 5): one order-of-magnitude-up
robustness run — the full bench harness at 9.6M turns (sf1.0-scale;
the per-round record runs at 960k) recording build throughput,
cold/warm query latencies, and the PEAK RSS of the python driver and
its JVM child. The point: the driver-side working-set assumptions
(posting-cache budget = max_driver_postings, df-map gate at 2M dict
rows, 200k-entry doc resolve cache) must hold 10× up, and any query
whose cold latency grows superlinearly vs the 960k record gets
flagged in the output.

Usage: python BENCH/r5/sf1_run.py → one JSON line + BENCH/r5/sf1.json
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..", "..")))

N_TURNS = 9_600_000


def _vm_hwm_kb(pid: int) -> int:
    try:
        with open(f"/proc/{pid}/status") as f:
            for line in f:
                if line.startswith("VmHWM:"):
                    return int(line.split()[1])
    except OSError:
        pass
    return 0


def _child_java_hwm_kb() -> int:
    """Peak RSS of this process's java child (the local-mode JVM)."""
    me = os.getpid()
    best = 0
    for d in os.listdir("/proc"):
        if not d.isdigit():
            continue
        try:
            with open(f"/proc/{d}/stat") as f:
                raw = f.read()
            # comm (field 2) may contain spaces — split AFTER the
            # closing paren; ppid is then the second field
            after = raw[raw.rfind(")") + 1:].split()
            if len(after) < 2 or int(after[1]) != me:
                continue
            with open(f"/proc/{d}/comm") as f:
                if "java" not in f.read():
                    continue
        except OSError:
            continue
        best = max(best, _vm_hwm_kb(int(d)))
    return best


def main():
    os.environ["SPARK_GRAFT_BENCH_TURNS"] = str(N_TURNS)
    # one rep pair is ~4-5 min of build at this scale; keep the
    # default agree-to-1.2 loop but cap at 3
    os.environ.setdefault("SPARK_GRAFT_BENCH_REPS_MAX", "3")
    from bench import run_bench

    res = run_bench(os.environ.get("SPARK_GRAFT_SF_DIR",
                                   "/root/testdata/sf0.1"),
                    int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    res["sf_label"] = "sf1.0-scale (9.6M turns)"
    res["driver_vm_hwm_mb"] = round(_vm_hwm_kb(os.getpid()) / 1024, 1)
    res["jvm_vm_hwm_mb"] = round(_child_java_hwm_kb() / 1024, 1)

    # flag superlinear cold-latency growth vs the recorded 960k round:
    # 10× the data should cost well under 10× per query (the driver
    # paths are bounded by max_driver_postings, the batch path by the
    # pruned buckets) — ratio > 10 means a per-query full-corpus cost
    ref_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "..", "..", "BENCH_r04.json")
    flags = {}
    if os.path.exists(ref_path):
        with open(ref_path) as f:
            ref = json.load(f).get("parsed", {}).get("queries", {})
        for q, sec in res["queries"].items():
            base = ref.get(q)
            if base and base > 0:
                ratio = sec / base
                if ratio > 10:
                    flags[q] = round(ratio, 1)
        res["cold_latency_vs_960k_flags"] = flags
        res["cold_latency_flagged"] = bool(flags)
    print(json.dumps(res))
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "sf1.json"), "w") as f:
        json.dump(res, f, indent=1)


if __name__ == "__main__":
    main()
