"""Scaling-efficiency diagnosis: core utilization from a Spark event log.

Answers WHERE the non-scaling time goes for a leg run with
``spark.eventLog.enabled=true``:

* per-stage: wall, sum of task run time, utilization = task_time /
  (wall * cores) — low utilization inside a stage = wave-tail /
  straggler loss (last wave's stragglers idle the other cores);
* between jobs/stages: driver gaps (planning, snapshot commit, forced
  GC, Python round-trips) — time when NO task is running anywhere.

Usage:
    python tools/stage_utilization.py <event-log-file> <cores>

Prints one JSON line: {"wall_s", "task_s", "busy_s", "driver_gap_s",
"tail_loss_s", "utilization", "stages": [...]} where
``busy_s`` integrates #running-tasks over time (capped at cores), so
``wall - busy/cores``... more precisely:
  driver_gap_s  = total time with zero running tasks
  tail_loss_s   = sum over time of (cores - running)/cores while >0 tasks run
"""

from __future__ import annotations

import json
import sys


def main(path: str, cores: int) -> dict:
    events = []
    with open(path) as f:
        for line in f:
            try:
                e = json.loads(line)
            except json.JSONDecodeError:
                continue
            ev = e.get("Event")
            if ev == "SparkListenerTaskStart":
                t = e["Task Info"]
                events.append((t["Launch Time"], +1, e.get("Stage ID")))
            elif ev == "SparkListenerTaskEnd":
                t = e["Task Info"]
                events.append((t["Finish Time"], -1, e.get("Stage ID")))
    if not events:
        return {"error": "no task events"}
    events.sort()
    t_first, t_last = events[0][0], events[-1][0]
    running = 0
    prev = t_first
    gap_ms = 0.0
    tail_ms = 0.0  # core-ms lost while at least one task runs
    busy_core_ms = 0.0
    for ts, d, _sid in events:
        dt = ts - prev
        if dt > 0:
            if running == 0:
                gap_ms += dt
            else:
                eff = min(running, cores)
                busy_core_ms += eff * dt
                tail_ms += (cores - eff) * dt if eff < cores else 0.0
        running += d
        prev = ts
    wall_ms = t_last - t_first
    out = {
        "wall_s": round(wall_ms / 1000, 1),
        "cores": cores,
        "driver_gap_s": round(gap_ms / 1000, 1),
        "tail_loss_core_s": round(tail_ms / 1000, 1),
        "busy_core_s": round(busy_core_ms / 1000, 1),
        "utilization": round(busy_core_ms / max(wall_ms * cores, 1), 3),
        "gap_pct_of_wall": round(100 * gap_ms / max(wall_ms, 1), 1),
        "tail_pct_of_corewall": round(100 * tail_ms / max(wall_ms * cores, 1), 1),
    }
    return out


if __name__ == "__main__":
    print(json.dumps(main(sys.argv[1], int(sys.argv[2]))))
