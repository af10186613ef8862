"""Quantify THIS host's instantaneous speed independently of the
engine, so bench numbers can be read against the window they ran in
(this VM's memory bandwidth drifts >10x between windows; the build is
memory-bandwidth-bound per BASELINE.md, so turns/sec tracks mem_stream
almost linearly).

Usage: python BENCH/host_probe.py   ->  one JSON line
Reference readings (quiet window, r5): cpu_loop_s ~1.2-1.9,
mem_stream_s ~1-3. Throttled window observed 2026-08-18: mem_stream_s
20.4 (the same commit benched 108k turns/s quiet and 10k throttled).
"""
import json
import time

import numpy as np


def main() -> dict:
    t0 = time.time()
    x = 0
    for i in range(10_000_000):
        x += i * i
    cpu_s = time.time() - t0
    a = np.random.rand(200_000_000 // 8)   # ~200 MB
    t0 = time.time()
    for _ in range(5):
        a * 1.0001
    mem_s = time.time() - t0
    with open("/proc/loadavg") as f:
        load1 = float(f.read().split()[0])
    return {"cpu_loop_s": round(cpu_s, 2), "mem_stream_s": round(mem_s, 2),
            "load1": load1}


if __name__ == "__main__":
    print(json.dumps(main()))
