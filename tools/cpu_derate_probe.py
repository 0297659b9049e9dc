"""Hardware scaling-confound probe (see bench.py --scaling docstring).

Runs an identical pure-Python CPU-bound loop in N concurrent processes and
reports mean per-task time. On a box whose all-core frequency is lower
than its few-core frequency (or that shares a hypervisor host), per-task
time inflates as N grows — that inflation is a property of the machine,
not of any distributed engine measured on it, and it must be subtracted
from (or designed out of) a core-scaling protocol that stands in for
node-scaling.

Usage: python tools/cpu_derate_probe.py [N ...]
"""

from __future__ import annotations

import multiprocessing as mp
import sys
import time


def burn(n: int) -> float:
    t0 = time.perf_counter()
    x = 0
    for _ in range(n):
        x = (x * 1103515245 + 12345) & 0xFFFFFFFF
    return time.perf_counter() - t0


if __name__ == "__main__":
    levels = [int(a) for a in sys.argv[1:]] or [1, 4, 8, 16, 24, 32]
    n = 20_000_000
    base = None
    for procs in levels:
        with mp.Pool(procs) as p:
            times = p.map(burn, [n] * procs)
        mean = sum(times) / len(times)
        base = base or mean
        print(
            f"procs={procs:3d} mean_task={mean:.2f}s "
            f"derate={mean / base - 1:+.1%}"
        )
