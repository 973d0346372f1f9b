"""Timeline decomposition of a Spark event log: per-JOB wall, task
busy-core integral inside the job's span, and the DEAD GAPS between
consecutive jobs (driver-only time: planning, broadcast collects,
py4j). Answers "where does non-task wall go" for a measured section.

Usage: python scripts/profile_timeline.py <eventlog.json> <cores> [t0_ms t1_ms]
"""

from __future__ import annotations

import json
import sys
from collections import defaultdict


def main() -> None:
    path = sys.argv[1]
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    jobs = {}
    tasks = []
    stage_to_job = {}
    with open(path) as f:
        for line in f:
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            e = ev.get("Event")
            if e == "SparkListenerJobStart":
                jid = ev["Job ID"]
                jobs[jid] = {
                    "start": ev["Submission Time"],
                    "end": None,
                    "stages": [s["Stage ID"] for s in ev.get("Stage Infos", [])],
                    "desc": (ev.get("Properties") or {}).get(
                        "spark.job.description", ""
                    )[:60],
                }
                for s in jobs[jid]["stages"]:
                    stage_to_job[s] = jid
            elif e == "SparkListenerJobEnd":
                if ev["Job ID"] in jobs:
                    jobs[ev["Job ID"]]["end"] = ev["Completion Time"]
            elif e == "SparkListenerTaskEnd":
                ti = ev.get("Task Info") or {}
                m = ev.get("Task Metrics") or {}
                if ti:
                    tasks.append(
                        (
                            ti["Launch Time"],
                            ti["Finish Time"],
                            ev["Stage ID"],
                            m.get("JVM GC Time", 0),
                        )
                    )

    def busy(a: float, b: float) -> float:
        events = []
        for s, e, _sid, _gc in tasks:
            s2, e2 = max(s, a), min(e, b)
            if s2 < e2:
                events.append((s2, 1))
                events.append((e2, -1))
        events.sort()
        tot, cur, last = 0.0, 0, a
        for t, d in events:
            tot += cur * (t - last)
            last = t
            cur += d
        return tot / 1000.0

    jlist = sorted(
        (j for j in jobs.values() if j["end"]), key=lambda j: j["start"]
    )
    print(f"{'job_wall':>8} {'busy':>8} {'par':>5} {'gap_before':>10}  desc")
    prev_end = None
    total_gap = 0.0
    for j in jlist:
        wall = (j["end"] - j["start"]) / 1000.0
        b = busy(j["start"], j["end"])
        gap = (j["start"] - prev_end) / 1000.0 if prev_end else 0.0
        # negative gap = overlapping (concurrent) jobs
        total_gap += max(gap, 0.0)
        prev_end = max(prev_end or 0, j["end"])
        print(
            f"{wall:8.2f} {b:8.1f} {b / wall / cores if wall else 0:5.2f} "
            f"{gap:10.2f}  {j['desc']}"
        )
    span = (jlist[-1]["end"] - jlist[0]["start"]) / 1000.0 if jlist else 0
    print(
        f"\njobs={len(jlist)} span={span:.1f}s inter-job dead gap total={total_gap:.1f}s "
        f"busy_integral={busy(jlist[0]['start'], jlist[-1]['end']):.1f} core·s"
    )


if __name__ == "__main__":
    main()
