"""Quantify THIS host's instantaneous speed independently of the
engine, so bench numbers can be read against the window they ran in
(this VM's memory bandwidth drifts >10x between windows; the build is
memory-bandwidth-bound per BASELINE.md, so turns/sec tracks mem_stream
almost linearly).

Usage: python BENCH/host_probe.py   ->  one JSON line
Reference readings (quiet window, r5): cpu_loop_s ~1.2-1.9,
mem_stream_s ~1-3. Throttled window observed 2026-08-18: mem_stream_s
20.4 (the same commit benched 108k turns/s quiet and 10k throttled).

effective_cores_32 covers the OTHER host failure mode (late r5): the
hypervisor delivering fewer physical cores than the 32 advertised
vCPUs. Near 32 = full capacity (r4 windows); ~16-20 = the degraded
window in which plain local[32] collapsed 108-178k -> ~33k turns/s
(BENCH/r5/overcommit_ab.json; bench.py now adapts spark.task.cpus to
this number).
"""
import json
import sys
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
    sys.path.insert(0, __file__.rsplit("/", 2)[0])
    from bench import effective_parallelism

    return {"cpu_loop_s": round(cpu_s, 2), "mem_stream_s": round(mem_s, 2),
            "effective_cores_32": round(effective_parallelism(32), 1),
            "load1": load1}


if __name__ == "__main__":
    print(json.dumps(main()))
