"""One isolated pipeline run (fresh JVM): used by bench.py's scaling
leg so local[8] / local[32] measurements don't share heap, cache, or
block-manager state.

Usage: python scripts/scaling_run.py <cores> <n_events> [input_dir]
Prints one JSON line {cores, turns, triples, sec, turns_per_sec}.
input_dir (optional):
  * a testdata sf dir (events.parquet inside) -> transcripts derived
    from its events, or
  * a directory whose basename is transcripts.parquet (pre-derived
    corpus written once by bench.py) -> read directly. Sharing one
    on-disk corpus across every pinned leg keeps the N-vs-4N
    comparison's untimed prep small; the measured section is the
    BUILD either way.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    cores = int(sys.argv[1])
    n_events = int(sys.argv[2])
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else None
    # Input-at-rest shape (default ON): the production input is an
    # Iceberg table BUCKETED by conv_id (pipeline.py's partitioning
    # doctrine; BASELINE input_hint), so each leg restores that
    # partitioning once, untimed, when it loads the corpus into the
    # cache. Without it every conv-keyed groupBy/distinct in the build
    # re-shuffles the full corpus — a memory-bandwidth tax that is an
    # artifact of parquet losing partitioning metadata, not of the
    # engine. SPARK_GRAFT_PREPART=0 measures that raw-parquet shape.
    prepart = os.environ.get("SPARK_GRAFT_PREPART", "1") == "1"

    from stakgraph_spark.plans.pipeline import build_graph
    from stakgraph_spark.session import get_spark
    from stakgraph_spark.sources.transcripts import (
        derive_transcripts,
        read_transcripts,
        synthetic_events,
    )

    # shuffle partitions sized to THIS leg's cores (2x) — each leg is
    # an honest N-core node configured the way its own submitter
    # would, not inheriting the 32-core default from the env.
    extra = {}
    ev_dir = os.environ.get("SPARK_GRAFT_EVENTLOG")
    if ev_dir:
        os.makedirs(ev_dir, exist_ok=True)
        extra = {"spark.eventLog.enabled": "true", "spark.eventLog.dir": ev_dir}
    # Throughput GC for the batch build: ParallelGC beats G1 here on
    # BOTH legs (pinned A/B: lo 204->187s, hi 82->68s) and on the
    # 2->8 scaling ratio (0.62->0.69) — G1's write barriers +
    # concurrent-cycle threads tax an allocation-heavy extraction
    # job hardest when every core is busy. AlwaysPreTouch moves heap
    # page-fault storms out of the measured section.
    gc_opts = {
        "parallel": "-XX:+UseParallelGC -XX:+AlwaysPreTouch",
        "parallel_xmn8": "-XX:+UseParallelGC -XX:+AlwaysPreTouch -Xmn8g",
        "parallel_xmn6": "-XX:+UseParallelGC -XX:+AlwaysPreTouch -Xmn6g",
        "g1": "-XX:+UseG1GC",
    }
    gc = os.environ.get("SPARK_GRAFT_GC", "parallel")
    if gc_opts.get(gc):
        extra["spark.driver.extraJavaOptions"] = gc_opts[gc]
    extra_json = os.environ.get("SPARK_GRAFT_EXTRA_CONF")
    if extra_json:
        extra.update(json.loads(extra_json))
    if os.environ.get("SPARK_GRAFT_CACHE_COMPRESS") == "0":
        extra["spark.sql.inMemoryColumnarStorage.compressed"] = "false"
    # The at-rest bucket count is a property of the TABLE, not of the
    # reading cluster (an Iceberg table bucketed by conv_id has the
    # same bucket count whether 2 or 8 executors read it), so the
    # restored partitioning defaults to a FIXED count shared by both
    # legs — per-leg counts would also give the legs different task
    # granularities and charge them different per-task fixed costs.
    buckets = int(os.environ.get("SPARK_GRAFT_SCALE_BUCKETS", "32"))
    spark = get_spark(
        app_name=f"scaling[{cores}]",
        master=f"local[{cores}]",
        shuffle_partitions=max(cores * 2, 8),
        extra_conf=extra,
    )

    # Warmup: run the identical plan shape on a tiny corpus first so
    # JIT + whole-stage-codegen compilation (driver-serial, one-time)
    # is excluded from the measured run — standard JVM benchmarking
    # practice; a long-lived cluster pays this once per session, not
    # per job.
    # 8k events: enough to touch every codegen/JIT path once; the
    # warmup is untimed but its wall bounds how many adjacent pairs
    # fit the bench time guard, so keep it minimal.
    warm = derive_transcripts(spark, synthetic_events(spark, 8_000, 20)).persist()
    warm.count()
    build_graph(spark, warm, repartition_by_conv=False)["triples"].count()
    warm.unpersist()

    if sf_dir and os.path.basename(sf_dir.rstrip("/")) == "transcripts.parquet":
        tr = spark.read.parquet(sf_dir)
        if prepart:
            # restore the at-rest bucketing (ts is not consumed by the
            # build — prune it before the cache so every downstream
            # scan of the cached corpus moves less memory)
            cols = tr.select("conv_id", "turn_idx", "role", "text", "tool")
            # buckets=0: legacy per-leg count (spark.sql.shuffle.partitions)
            tr = (
                cols.repartition("conv_id")
                if buckets == 0
                else cols.repartition(buckets, "conv_id")
            )
    elif sf_dir:
        tr = read_transcripts(spark, sf_dir)
    else:
        tr = derive_transcripts(spark, synthetic_events(spark, n_events, max(n_events // 400, 1)))
    # SPARK_GRAFT_MEASURE=build (default): corpus load + cache
    # materialization are untimed prep; the measured section is the
    # build DAG on the warm cache (the steady-state shape of a session
    # running many queries over one corpus).
    # SPARK_GRAFT_MEASURE=cold: the timed section is the FULL job a
    # cluster runs once — input scan + restored bucketing + cache
    # materialization + build + count.
    measure_cold = os.environ.get("SPARK_GRAFT_MEASURE", "build") == "cold"
    tr = tr.persist()
    t_cold = time.time()
    n_turns = tr.count()
    load_sec = time.time() - t_cold

    # Plan construction is NOT timed in either mode: it is a fixed
    # driver-side cost (and this sandbox's py4j bridge is ~20x slower
    # than normal at ~6ms/call); the measured quantity is the
    # data-dependent execution (cold mode adds the input scan +
    # bucketing + cache materialization, i.e. the one-shot job shape).
    g = build_graph(spark, tr, repartition_by_conv=False)

    t0 = time.time()
    n_triples = g["triples"].count()
    sec = time.time() - t0 + (load_sec if measure_cold else 0.0)

    # JVM ceiling probe: a FIXED synthetic workload (codegen concat +
    # regexp_extract_all + agg — the same operator class as the
    # build's hot path, but independent of the pipeline) timed in
    # THIS leg's pinned, warmed JVM. (probe_lo/probe_hi)/(hi/lo)
    # across a pair = what the host+JVM physically deliver for
    # extraction-shaped parallel work in that window — the honest
    # normalization base: a pure-python busy loop sees hypervisor
    # steal but not the package-clock drop dense JVM work causes
    # (measured: python probe ~0.95 where a codegen arith loop gets
    # 0.81 and an allocation-heavy regex loop 0.72 on 2->8 cores).
    # Shuffle-free by design: the earlier sum(...) probe re-collected
    # the SAME DataFrame, and Spark reuses a computed shuffle's map
    # outputs across jobs on one lineage — the "timed" collect only
    # ran the 1-task final stage (72ms for 4M regex rows, ~50x too
    # fast), which wrecked the ceiling normalization. The noop sink
    # keeps every row's extraction on the executors with no exchange
    # to reuse, and each call builds a FRESH plan.
    def _probe(n_rows: int):
        spark.range(0, n_rows, 1, cores * 4).selectExpr(
            "size(regexp_extract_all(concat('call foo_', id, '(x) and bar_', "
            "id % 97, '(y)'), '([a-z]+_[0-9]+)\\\\(', 1)) AS n"
        ).write.format("noop").mode("overwrite").save()

    _probe(400_000)  # codegen + JIT tier-up on the probe's own plan
    t0 = time.time()
    _probe(4_000_000)
    first = time.time() - t0
    t0 = time.time()
    _probe(4_000_000)
    # min of two full-size runs: the first still pays residual JIT
    # tiering (measured 2.0s vs 1.05s steady-state at 4 cores)
    probe_sec = min(first, time.time() - t0)

    print(
        json.dumps(
            {
                "cores": cores,
                "turns": n_turns,
                "triples": n_triples,
                "sec": round(sec, 2),
                "turns_per_sec": round(n_turns / sec, 1),
                "triples_per_sec": round(n_triples / sec, 1),
                "probe_sec": round(probe_sec, 3),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
