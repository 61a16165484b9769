#!/usr/bin/env python
"""Hypervisor-steal monitor: samples /proc/stat around (or during) a
benchmark run so throughput numbers can be read against the host
conditions that produced them (see BENCH/BASELINE.md).

Usage:
  python tools/steal_monitor.py [seconds]            # sample for N s (default 60)
  python tools/steal_monitor.py -- cmd args...       # sample while cmd runs

Prints one JSON line: per-5s samples of (steal%, busy%, iowait%, idle%)
plus the run's mean/max steal.
"""

from __future__ import annotations

import json
import subprocess
import sys
import time


def read_stat() -> list[int]:
    with open("/proc/stat") as f:
        return [int(x) for x in f.readline().split()[1:]]


def main() -> None:
    args = sys.argv[1:]
    proc = None
    if args and args[0] == "--":
        proc = subprocess.Popen(args[1:])
        deadline = None
    else:
        deadline = time.time() + (float(args[0]) if args else 60.0)

    samples = []
    prev = read_stat()
    while True:
        time.sleep(5)
        cur = read_stat()
        d = [c - p for c, p in zip(cur, prev)]
        tot = sum(d) or 1
        # fields: user nice system idle iowait irq softirq steal
        samples.append(
            {
                "steal_pct": round(100 * d[7] / tot, 1),
                "busy_pct": round(100 * (d[0] + d[1] + d[2]) / tot, 1),
                "iowait_pct": round(100 * d[4] / tot, 1),
                "idle_pct": round(100 * d[3] / tot, 1),
            }
        )
        prev = cur
        if proc is not None:
            if proc.poll() is not None:
                break
        elif time.time() >= deadline:
            break
    steals = [s["steal_pct"] for s in samples]
    print(
        json.dumps(
            {
                "samples": samples,
                "mean_steal_pct": round(sum(steals) / max(len(steals), 1), 1),
                "max_steal_pct": max(steals, default=0.0),
                "exit_code": proc.returncode if proc is not None else None,
            }
        )
    )


if __name__ == "__main__":
    main()
