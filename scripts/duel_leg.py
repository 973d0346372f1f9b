"""One leg of the DUEL scaling protocol: both cluster sizes run
CONCURRENTLY on disjoint cpusets so they sample the identical host
window (the sandbox's CPU availability swings ~2x on minute scales —
larger than any real effect — and sequential (lo, hi) pairs put the
two legs in different windows; see BENCH.md).

The leg warms up, loads the shared corpus, pre-builds ONE triples
plan (re-executing a DataFrame action re-runs every shuffle — no
map-output reuse across SQL executions — verified empirically), then
file-barrier-syncs with the other leg and runs the build in a loop:

  * the `lo` role builds until `window_sec` has elapsed, then drops
    `done_lo`,
  * the `hi` role builds until `done_lo` appears — so every lo build
    interval is fully covered by concurrent hi builds.

Per-build (start, end) stamps go to `result_{role}.json`; the
orchestrator (bench.py) pairs each lo build with the hi builds whose
midpoint falls inside it — an efficiency sample per lo build, all
sampled from the same moment on the same host.

Usage: duel_leg.py <cores> <role lo|hi> <corpus_dir> <sync_dir> <window_sec>
(cpuset pinning is the ORCHESTRATOR's job: taskset -c 0 vs 1-N.)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    cores = int(sys.argv[1])
    role = sys.argv[2]
    corpus = sys.argv[3]
    sync_dir = sys.argv[4]
    window_sec = float(sys.argv[5])

    from stakgraph_spark.plans.pipeline import build_graph
    from stakgraph_spark.session import get_spark
    from stakgraph_spark.sources.transcripts import derive_transcripts, synthetic_events

    # Same leg config as scaling_run.py: per-leg shuffle partitions
    # (submitter-configured), ParallelGC+PreTouch (pinned A/B in
    # BENCH.md), fixed at-rest bucketing shared by both legs.
    extra = {}
    gc = os.environ.get("SPARK_GRAFT_GC", "parallel")
    if gc == "parallel":
        extra["spark.driver.extraJavaOptions"] = "-XX:+UseParallelGC -XX:+AlwaysPreTouch"
    buckets = int(os.environ.get("SPARK_GRAFT_SCALE_BUCKETS", "32"))
    # Shuffle partitions default to the at-rest bucket count for BOTH
    # legs (a submitter config that does not vary with cluster size;
    # same-granularity tasks at lo and hi). At hi, 32 partitions on 4
    # cores = 8 waves of smooth packing; per-leg 2x-cores granularity
    # (8 tasks = 2 waves at hi) quantizes the last wave into idle
    # cores the 1-core leg never pays. Override per-leg via env.
    shuffle = int(os.environ.get("SPARK_GRAFT_SCALE_SHUFFLE", str(buckets)))
    spark = get_spark(
        app_name=f"duel[{role}:{cores}]",
        master=f"local[{cores}]",
        shuffle_partitions=shuffle,
        extra_conf=extra,
    )

    # JIT/codegen warmup on the identical plan shape (untimed, both
    # legs symmetrically). 150k turns, not a token 8k: C2 tier-up is
    # invocation-count driven, and an 8k warmup left the hi leg's
    # 2nd-3rd full-size builds ~60% over steady state (77.7s vs 48s,
    # BENCH.md window 1) — tier-up cost leaking into SCORED builds.
    warm = derive_transcripts(spark, synthetic_events(spark, 150_000, 400)).persist()
    warm.count()
    build_graph(spark, warm, repartition_by_conv=False)["triples"].count()
    warm.unpersist()

    tr = (
        spark.read.parquet(corpus)
        .select("conv_id", "turn_idx", "role", "text", "tool")
        .repartition(buckets, "conv_id")
        .persist()
    )
    n_turns = tr.count()
    plan = build_graph(spark, tr, repartition_by_conv=False)["triples"]

    ready = os.path.join(sync_dir, f"ready_{role}")
    go = os.path.join(sync_dir, "go")
    done_lo = os.path.join(sync_dir, "done_lo")
    open(ready, "w").close()
    while not os.path.exists(go):
        time.sleep(0.05)

    builds: list[list[float]] = []
    t_go = time.time()
    hard_cap = t_go + window_sec * 4 + 120
    while True:
        t0 = time.time()
        plan.write.format("noop").mode("overwrite").save()
        builds.append([t0, time.time()])
        if role == "lo":
            # min 2 builds: the first full-size build still pays
            # residual JIT tier-up on this plan's generated classes
            # and is DROPPED by the scorer (both legs symmetrically)
            if time.time() - t_go >= window_sec and len(builds) >= 2:
                open(done_lo, "w").close()
                break
        else:
            if os.path.exists(done_lo) or time.time() > hard_cap:
                break

    # post-window probe: the same-window dense-JVM parallel ceiling
    # (both legs probe concurrently right after done_lo, so the
    # package sees the same 5-busy-core state the duel ran under)
    def _probe(n_rows: int) -> None:
        spark.range(0, n_rows, 1, cores * 4).selectExpr(
            "size(regexp_extract_all(concat('call foo_', id, '(x) and bar_', "
            "id % 97, '(y)'), '([a-z]+_[0-9]+)\\\\(', 1)) AS n"
        ).write.format("noop").mode("overwrite").save()

    _probe(400_000)
    probes = []
    for _ in range(2):
        t0 = time.time()
        _probe(4_000_000)
        probes.append(time.time() - t0)

    with open(os.path.join(sync_dir, f"result_{role}.json"), "w") as f:
        json.dump(
            {"cores": cores, "turns": n_turns, "builds": builds,
             "probe_sec": round(min(probes), 3)},
            f,
        )
    spark.stop()


if __name__ == "__main__":
    main()
