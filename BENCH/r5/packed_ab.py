#!/usr/bin/env python
"""A/B: encoder='stream' (occurrence-row shuffle-sort) vs
encoder='packed' (map-side SPIMI combine) on the bench build, SAME
cached input, interleaved S,P,S,P,... child JVMs within one host
window so drifting interference hits both arms equally. The minimum
build time per arm is the least-contaminated sample (the bench's own
contamination methodology).

Usage: python BENCH/r5/packed_ab.py [reps] [cpus]
Writes BENCH/r5/packed_ab.json.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))


def run_once(encoder: str, cpus: int) -> dict:
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus),
               SPARK_GRAFT_ENCODER=encoder, PYTHONPATH=REPO,
               SPARK_GRAFT_BENCH_REPS="2")
    out = subprocess.run([sys.executable, os.path.join(REPO, "bench.py")],
                         env=env, capture_output=True, text=True, timeout=1800)
    line = [ln for ln in out.stdout.strip().splitlines() if ln.startswith("{")][-1]
    return json.loads(line)


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    probe = json.loads(subprocess.run(
        [sys.executable, os.path.join(REPO, "BENCH", "host_probe.py")],
        capture_output=True, text=True).stdout)
    arms = {"stream": [], "packed": []}
    best = {"stream": None, "packed": None}
    for _ in range(reps):
        for enc in ("stream", "packed"):
            r = run_once(enc, cpus)
            arms[enc].append(r["build_seconds"])
            if best[enc] is None or r["build_seconds"] < best[enc]["build_seconds"]:
                best[enc] = r
    result = {
        "cpus": cpus,
        "host_probe": probe,
        "build_seconds": {k: v for k, v in arms.items()},
        "best_turns_per_sec": {k: best[k]["value"] for k in best},
        "speedup_packed": round(
            best["packed"]["value"] / best["stream"]["value"], 3),
        "n_turns": best["stream"]["n_turns"],
        "detail": best,
    }
    with open(os.path.join(REPO, "BENCH", "r5", "packed_ab.json"), "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps({k: result[k] for k in
                      ("cpus", "build_seconds", "best_turns_per_sec",
                       "speedup_packed", "host_probe")}))


if __name__ == "__main__":
    main()
