"""Summarize a Spark event log: per-stage wall / task-seconds /
parallelism, plus dead-time (cores idle) between stages.

Usage: python scripts/profile_eventlog.py <eventlog-file> [cores]
"""

from __future__ import annotations

import json
import sys
from collections import defaultdict


def main() -> None:
    path = sys.argv[1]
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    stages = {}
    task_time = defaultdict(float)
    task_n = defaultdict(int)
    task_gc = defaultdict(float)
    task_deser_ser = defaultdict(float)
    shuffle_rw = defaultdict(lambda: [0, 0])
    intervals = []
    with open(path) as f:
        for line in f:
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            e = ev.get("Event")
            if e == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                sid = si["Stage ID"]
                stages[sid] = {
                    "name": si["Stage Name"].split(" ")[0],
                    "ntasks": si["Number of Tasks"],
                    "submit": si.get("Submission Time", 0),
                    "complete": si.get("Completion Time", 0),
                }
            elif e == "SparkListenerTaskEnd":
                sid = ev["Stage ID"]
                m = ev.get("Task Metrics") or {}
                ti = ev.get("Task Info") or {}
                task_time[sid] += m.get("Executor Run Time", 0) / 1000.0
                task_gc[sid] += m.get("JVM GC Time", 0) / 1000.0
                task_deser_ser[sid] += (
                    m.get("Executor Deserialize Time", 0)
                    + m.get("Result Serialization Time", 0)
                ) / 1000.0
                task_n[sid] += 1
                sr = (m.get("Shuffle Read Metrics") or {})
                sw = (m.get("Shuffle Write Metrics") or {})
                shuffle_rw[sid][0] += sr.get("Remote Bytes Read", 0) + sr.get(
                    "Local Bytes Read", 0
                )
                shuffle_rw[sid][1] += sw.get("Shuffle Bytes Written", 0)
                if ti:
                    intervals.append((ti["Launch Time"], ti["Finish Time"]))

    total_wall = 0.0
    rows = []
    for sid, s in sorted(stages.items()):
        wall = (s["complete"] - s["submit"]) / 1000.0
        total_wall += wall
        rows.append(
            (
                wall,
                sid,
                s["name"],
                s["ntasks"],
                task_time[sid],
                task_gc[sid],
                task_deser_ser[sid],
                shuffle_rw[sid][0] / 1e6,
                shuffle_rw[sid][1] / 1e6,
            )
        )
    rows.sort(reverse=True)
    print(
        f"{'wall_s':>7} {'sid':>4} {'name':<22} {'tasks':>5} {'task_s':>8} "
        f"{'gc_s':>6} {'ser_s':>6} {'shR_MB':>8} {'shW_MB':>8} {'par':>5}"
    )
    for wall, sid, name, nt, ts, gc, ds, shr, shw in rows[:30]:
        par = ts / wall if wall > 0 else 0
        print(
            f"{wall:7.2f} {sid:>4} {name:<22} {nt:>5} {ts:8.1f} {gc:6.1f} "
            f"{ds:6.1f} {shr:8.1f} {shw:8.1f} {par:5.2f}"
        )
    ttask = sum(task_time.values())
    # busy-core integral from task intervals
    events = []
    for a, b in intervals:
        events.append((a, 1))
        events.append((b, -1))
    events.sort()
    busy = 0.0
    span = 0.0
    if events:
        cur = 0
        last = events[0][0]
        t_min, t_max = events[0][0], max(b for _, b in intervals)
        for t, d in events:
            busy += cur * (t - last) / 1000.0
            last = t
            cur += d
        span = (t_max - t_min) / 1000.0
    print(
        f"\nstages={len(stages)} sum_stage_wall={total_wall:.1f}s "
        f"sum_task_seconds={ttask:.1f}s gc={sum(task_gc.values()):.1f}s"
    )
    if span:
        print(
            f"task-interval span={span:.1f}s busy-core-integral={busy:.1f}core·s "
            f"avg_concurrency={busy / span:.2f}/{cores} "
            f"idle_fraction={1 - busy / (span * cores):.3f}"
        )


if __name__ == "__main__":
    main()
