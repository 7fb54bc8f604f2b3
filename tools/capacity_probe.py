#!/usr/bin/env python3
"""Host parallel-capacity probe — justifies the benchmark's scaling-leg
sizes (see BASELINE.md and bench.py `_scaling_runs`).

Runs K identical CPU-bound tasks on K processes for growing K and reports
the *effective core count* K * t1 / tK. On bare metal this tracks K up to
the physical core count; on an oversubscribed VM it plateaus at whatever
the hypervisor actually delivers, which is the number the scaling legs
must stay under for a meaningful N vs 4N comparison.

Usage: python tools/capacity_probe.py [max_procs]
Output: one JSON line {"procs": {...}, "effective_cores_max": N}
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

WORK = 20_000_000


def _burn(n: int) -> int:
    s = 0
    for i in range(n):
        s += i * i
    return s


def main() -> None:
    max_procs = int(sys.argv[1]) if len(sys.argv) > 1 else (os.cpu_count() or 8)
    levels = [p for p in (1, 2, 4, 8, 12, 16, 24, 32, 48, 64) if p <= max_procs]
    base = None
    out: dict[str, float] = {}
    for procs in levels:
        with mp.Pool(procs) as pool:
            t0 = time.perf_counter()
            pool.map(_burn, [WORK] * procs)
            dt = time.perf_counter() - t0
        if base is None:
            base = dt
        out[str(procs)] = round(procs * base / dt, 1)
        print(
            f"procs={procs}: wall={dt:.2f}s effective_cores={out[str(procs)]}",
            file=sys.stderr,
        )
    print(
        json.dumps(
            {"procs": out, "effective_cores_max": max(out.values())}
        )
    )


if __name__ == "__main__":
    main()
