#!/usr/bin/env python
"""Clean-window launcher: poll the host probe until the window is
quiet, then exec the given command (VERDICT r5 item 1 — the scaling
gate's code passes 0.8 raw in clean windows but the recorded artifact
was taken in a loaded one; this automates 'wait for clean').

Usage:  python BENCH/probe_gate.py [--load1 0.3] [--timeout 7200] -- cmd ...

The predicate is the documented clean-window rule: 1-minute loadavg at
or below the threshold (default 0.3) right before launch. Polls every
60 s; on timeout, launches anyway and marks the environment
(SPARK_GRAFT_WINDOW=loaded) so downstream JSON can record honesty.
"""

from __future__ import annotations

import os
import subprocess
import sys
import time


def main() -> int:
    args = sys.argv[1:]
    load1_max = 0.3
    timeout = 7200.0
    while args and args[0] != "--":
        if args[0] == "--load1":
            load1_max = float(args[1]); args = args[2:]
        elif args[0] == "--timeout":
            timeout = float(args[1]); args = args[2:]
        else:
            raise SystemExit(f"unknown arg {args[0]!r}")
    if not args or args[0] != "--":
        raise SystemExit("usage: probe_gate.py [--load1 X] [--timeout S] -- cmd ...")
    cmd = args[1:]
    t0 = time.time()
    clean = False
    while time.time() - t0 < timeout:
        load1 = os.getloadavg()[0]
        if load1 <= load1_max:
            clean = True
            break
        print(f"probe_gate: load1={load1:.2f} > {load1_max} — waiting",
              flush=True)
        time.sleep(60)
    env = dict(os.environ,
               SPARK_GRAFT_WINDOW="clean" if clean else "loaded")
    print(f"probe_gate: launching ({'clean' if clean else 'TIMEOUT/loaded'} "
          f"window, load1={os.getloadavg()[0]:.2f})", flush=True)
    return subprocess.call(cmd, env=env)


if __name__ == "__main__":
    sys.exit(main())
