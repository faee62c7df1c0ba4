#!/usr/bin/env python
"""Continuous host-speed monitor (r16): one single-shot matmul + pyloop
calibration probe every --interval seconds, appended as JSON lines, so
a long benchmark's wall-clock can be adjudicated against the host's
SIMD duty cycle afterwards (BENCHNOTES_r15_host.json measured ~30x
matmul swings within seconds — point samples at run start/end can miss
a degraded majority window entirely).

Usage: python scripts/cal_monitor.py --out FILE.jsonl [--interval 15]
Stop with SIGTERM/SIGINT; each line: {"t": epoch, "matmul_ms", "pyloop_ms", "load1"}.
Overhead: ~2-60 ms per probe pair — invisible next to a 32-core bench.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def main() -> None:
    args = sys.argv[1:]
    out = args[args.index("--out") + 1]
    interval = 15.0
    if "--interval" in args:
        interval = float(args[args.index("--interval") + 1])
    A = np.arange(512 * 512, dtype="float64").reshape(512, 512) / 1e6
    with open(out, "a") as fh:
        while True:
            t0 = time.perf_counter()
            (A @ A).sum()
            m = (time.perf_counter() - t0) * 1000
            t0 = time.perf_counter()
            s = 0
            for i in range(100_000):
                s += i ^ (i >> 3)
            p = (time.perf_counter() - t0) * 1000
            fh.write(
                json.dumps(
                    {
                        "t": round(time.time(), 1),
                        "matmul_ms": round(m, 3),
                        "pyloop_ms": round(p, 3),
                        "load1": round(os.getloadavg()[0], 2),
                    },
                    separators=(",", ":"),
                )
                + "\n"
            )
            fh.flush()
            time.sleep(interval)


if __name__ == "__main__":
    main()
