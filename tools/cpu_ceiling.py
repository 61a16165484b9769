#!/usr/bin/env python
"""Raw parallel-CPU ceiling probe: how much aggregate compute does this
box actually deliver as busy processes increase? Spark-free, Python
hashlib busy loops — pure hardware behavior (all-core turbo / host
steal), no framework in the way.

Interprets the N→4N scaling criterion honestly: if the HARDWARE yields
only 2.9x from 8→32 busy cores (observed here: all-core clock drop to
~0.66x per core), no software can show 0.8 efficiency on that pair;
pick an N where the hardware ceiling itself is ≥0.9 (2→8 on this box).

Run: python tools/cpu_ceiling.py   (prints one JSON line)
"""

from __future__ import annotations

import json
import subprocess
import sys

CODE = """
import hashlib, time
t_end = time.time() + 6
n = 0
h = b"x" * 64
while time.time() < t_end:
    for _ in range(1000):
        h = hashlib.sha256(h).digest()
    n += 1000
print(n)
"""


def measure(procs: int) -> int:
    ps = [
        subprocess.Popen([sys.executable, "-c", CODE], stdout=subprocess.PIPE)
        for _ in range(procs)
    ]
    return sum(int(p.communicate()[0]) for p in ps)


def main() -> None:
    totals = {p: measure(p) for p in (1, 2, 4, 8, 32)}
    print(
        json.dumps(
            {
                "hashes_per_6s": totals,
                "hw_efficiency_1_to_4": round(totals[4] / totals[1] / 4.0, 3),
                "hw_efficiency_2_to_8": round(totals[8] / totals[2] / 4.0, 3),
                "hw_efficiency_8_to_32": round(totals[32] / totals[8] / 4.0, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
