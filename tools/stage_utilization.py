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

Prints one JSON line: {"wall_s", "busy_core_s", "driver_gap_s",
"tail_loss_core_s", "utilization", "stages": [...]} where
``busy_core_s`` integrates #running-tasks over time (capped at cores):
  driver_gap_s     = total time with zero running tasks
  tail_loss_core_s = core-time lost to (cores - running) while >0 tasks run
and ``stages`` is one entry per stage, sorted by wall descending —
{"stage_id", "name", "wall_s", "task_s", "n_tasks", "utilization"} —
so the diagnosis names WHICH pass/query stops scaling, not just that
something does.
"""

from __future__ import annotations

import io
import json
import os
import sys


def _event_lines(path: str):
    """Yield event-log JSON lines from a plain file, a ``.zstd`` rolled
    file, or an ``eventlog_v2_*`` directory (Spark 4 default: rolling
    zstd-compressed ``events_N_*`` files inside a per-app directory)."""
    if os.path.isdir(path):
        parts = sorted(
            os.path.join(path, f)
            for f in os.listdir(path)
            if f.startswith("events_")
        )
        for p in parts:
            yield from _event_lines(p)
        return
    if path.endswith(".zstd"):
        import pyarrow as pa  # ships with pyspark; stdlib has no zstd

        with pa.CompressedInputStream(pa.OSFile(path, "rb"), "zstd") as f:
            yield from io.TextIOWrapper(f, encoding="utf-8")
        return
    with open(path) as f:
        yield from f


def main(path: str, cores: int) -> dict:
    events = []
    # per-stage accumulation: task spans + stage names
    stage_task_ms: dict[int, float] = {}
    stage_n: dict[int, int] = {}
    stage_t0: dict[int, float] = {}
    stage_t1: dict[int, float] = {}
    stage_name: dict[int, str] = {}
    for line in _event_lines(path):
        try:
            e = json.loads(line)
        except json.JSONDecodeError:
            continue
        ev = e.get("Event")
        if ev == "SparkListenerTaskStart":
            t = e["Task Info"]
            events.append((t["Launch Time"], +1))
        elif ev == "SparkListenerTaskEnd":
            t = e["Task Info"]
            sid = e.get("Stage ID")
            events.append((t["Finish Time"], -1))
            if sid is not None:
                launch, finish = t["Launch Time"], t["Finish Time"]
                stage_task_ms[sid] = stage_task_ms.get(sid, 0.0) + max(
                    finish - launch, 0
                )
                stage_n[sid] = stage_n.get(sid, 0) + 1
                stage_t0[sid] = min(stage_t0.get(sid, launch), launch)
                stage_t1[sid] = max(stage_t1.get(sid, finish), finish)
        elif ev == "SparkListenerStageCompleted":
            info = e.get("Stage Info", {})
            sid = info.get("Stage ID")
            if sid is not None:
                stage_name[sid] = info.get("Stage Name", "")
    if not events:
        return {"error": "no task events"}
    events.sort()
    t_first, t_last = events[0][0], events[-1][0]
    running = 0
    prev = t_first
    gap_ms = 0.0
    tail_ms = 0.0  # core-ms lost while at least one task runs
    busy_core_ms = 0.0
    for ts, d in events:
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
    stages = [
        {
            "stage_id": sid,
            "name": stage_name.get(sid, "")[:80],
            "wall_s": round((stage_t1[sid] - stage_t0[sid]) / 1000, 1),
            "task_s": round(stage_task_ms[sid] / 1000, 1),
            "n_tasks": stage_n[sid],
            # stage utilization: task-time over the stage's own wall —
            # a low number on a wide stage = wave-tail/straggler loss
            "utilization": round(
                stage_task_ms[sid]
                / max((stage_t1[sid] - stage_t0[sid]) * cores, 1),
                3,
            ),
        }
        for sid in stage_task_ms
    ]
    stages.sort(key=lambda s: -s["wall_s"])
    out = {
        "wall_s": round(wall_ms / 1000, 1),
        "cores": cores,
        "driver_gap_s": round(gap_ms / 1000, 1),
        "tail_loss_core_s": round(tail_ms / 1000, 1),
        "busy_core_s": round(busy_core_ms / 1000, 1),
        "utilization": round(busy_core_ms / max(wall_ms * cores, 1), 3),
        "gap_pct_of_wall": round(100 * gap_ms / max(wall_ms, 1), 1),
        "tail_pct_of_corewall": round(100 * tail_ms / max(wall_ms * cores, 1), 1),
        "stages": stages,
    }
    return out


if __name__ == "__main__":
    print(json.dumps(main(sys.argv[1], int(sys.argv[2]))))
