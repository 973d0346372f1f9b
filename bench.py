"""Benchmark harness — prints ONE JSON line the driver records.

Measures:
  * per-query wall times at $SPARK_GRAFT_SF_DIR (default sf0.1) on
    local[$SPARK_GRAFT_CPUS] (default 32),
  * end-to-end KG-construction throughput (turns/sec, triples/sec),
  * the two-parallelism scaling protocol (BASELINE.md): the same
    pipeline on the same deterministic synthetic corpus at local[N]
    and local[4N]; efficiency = (thr_4N / thr_N) / 4. Stands in for
    the N-vs-4N-executor cluster criterion (driver rule). Each
    measurement runs in a FRESH process (scripts/scaling_run.py) —
    JVM heap/cache state does not leak between configs — with a
    small same-shape warmup run excluded from timing (JIT/codegen),
    best-of-K to damp the sandbox's noisy-neighbor variance, plus a
    pure-CPU calibration control documenting the host's own scaling
    ceiling at the same instant.

Env knobs:
  SPARK_GRAFT_SF_DIR     input dir          (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS       main-run cores     (default 32)
  SPARK_GRAFT_SCALING    1/0 scaling leg    (default 1)
  SPARK_GRAFT_SCALE_EVENTS  synthetic corpus size (default 8_000_000)
  SPARK_GRAFT_SCALE_CORES   "N,4N" pair     (default "2,8")
  SPARK_GRAFT_SCALE_TRIALS  best-of-K       (default 2)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
DO_SCALING = os.environ.get("SPARK_GRAFT_SCALING", "1") == "1"
# 8M turns: the largest corpus whose best-of-2 scaling leg reliably
# fits a per-round bench budget on this VM (16M raises measured
# efficiency ~0.69 -> ~0.75 but doubles the leg; see BENCH.md).
SCALE_EVENTS = int(os.environ.get("SPARK_GRAFT_SCALE_EVENTS", "8000000"))
SCALE_CORES = tuple(int(x) for x in os.environ.get("SPARK_GRAFT_SCALE_CORES", "2,8").split(","))
SCALE_TRIALS = int(os.environ.get("SPARK_GRAFT_SCALE_TRIALS", "2"))


def _cpu_calibration(cores_pair: tuple[int, int]) -> dict:
    """Pure-CPU control: the host's own parallel-scaling ceiling,
    measured with dependency-free busy loops at the same moment as
    the Spark runs. Reported so the job's efficiency can be read
    against what the (noisy-neighbor, throttled) sandbox physically
    delivers."""
    import multiprocessing as mp

    def burn(q):
        t0 = time.time()
        x = 0
        for i in range(20_000_000):
            x += i * i
        q.put(time.time() - t0)

    thr = {}
    for n in cores_pair:
        q = mp.Queue()
        ps = [mp.Process(target=burn, args=(q,)) for _ in range(n)]
        t0 = time.time()
        [p.start() for p in ps]
        [p.join() for p in ps]
        thr[n] = n / (time.time() - t0)
    lo, hi = cores_pair
    return {
        "cpu_thr_low": round(thr[lo], 2),
        "cpu_thr_high": round(thr[hi], 2),
        "cpu_ceiling_efficiency": round(thr[hi] / thr[lo] / (hi / lo), 3),
    }


def _scaling_trial(cores: int, n_events: int) -> dict | None:
    env = dict(os.environ)
    env.setdefault("SPARK_DRIVER_MEM", "12g")
    try:
        out = subprocess.run(
            [sys.executable, os.path.join(REPO, "scripts", "scaling_run.py"), str(cores), str(n_events)],
            capture_output=True, text=True, timeout=900, env=env, cwd=REPO,
        )
        for line in out.stdout.strip().splitlines():
            if line.startswith("{"):
                return json.loads(line)
    except (subprocess.TimeoutExpired, json.JSONDecodeError):
        pass
    return None


def main() -> None:
    sys.path.insert(0, REPO)
    import __spark_entry__ as ENTRY
    from stakgraph_spark.plans.pipeline import build_graph
    from stakgraph_spark.session import get_spark
    from stakgraph_spark.sources.transcripts import read_transcripts

    spark = get_spark(app_name=f"bench[{CPUS}]", master=f"local[{CPUS}]")

    # --- per-query timings (headline queries) ---
    q_times: dict[str, float] = {}
    qs = ENTRY.queries()
    headline = [
        "kg_transcripts", "kg_mentions", "kg_resolved", "kg_nodes",
        "kg_edges", "kg_triples", "kg_node_census", "kg_edge_census",
        "kg_uses_by_entity",
    ]
    for name in headline:
        if name not in qs:
            continue
        t0 = time.time()
        qs[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
        q_times[name] = round(time.time() - t0, 3)

    # --- end-to-end throughput on the sf input (plan pre-built;
    # measured: full DAG execution to the triple count) ---
    tr = read_transcripts(spark, SF_DIR).persist()
    n_turns = tr.count()
    g = build_graph(spark, tr, repartition_by_conv=False)
    t0 = time.time()
    n_triples = g["triples"].count()
    e2e_sec = time.time() - t0
    spark.stop()

    result = {
        "metric": "kg_construction_e2e",
        "value": round(e2e_sec, 3),
        "unit": "sec",
        "queries": q_times,
        "sf": SF_DIR,
        "turns": n_turns,
        "triples": n_triples,
        "turns_per_sec": round(n_turns / e2e_sec, 1),
        "triples_per_sec": round(n_triples / e2e_sec, 1),
        "cpus": CPUS,
    }

    # --- scaling protocol: fresh process per measurement, best-of-K ---
    if DO_SCALING:
        lo, hi = SCALE_CORES
        best: dict[int, dict] = {}
        # interleave configs so both sample similar neighbor-load
        # windows (this VM's CPU availability drifts on ~minutes)
        for _ in range(SCALE_TRIALS):
            for cores in (lo, hi):
                r = _scaling_trial(cores, SCALE_EVENTS)
                if r and (cores not in best or r["turns_per_sec"] > best[cores]["turns_per_sec"]):
                    best[cores] = r
        scaling = {
            "protocol": f"same job + same {SCALE_EVENTS}-turn corpus at local[{lo}] vs local[{hi}]; "
                        f"fresh JVM per run; warmup excluded; best of {SCALE_TRIALS}",
            "corpus_turns": SCALE_EVENTS,
        }
        if lo in best and hi in best:
            scaling[f"local{lo}"] = best[lo]
            scaling[f"local{hi}"] = best[hi]
            sp = best[hi]["turns_per_sec"] / best[lo]["turns_per_sec"]
            scaling["speedup"] = round(sp, 3)
            scaling["efficiency"] = round(sp / (hi / lo), 3)
        scaling.update(_cpu_calibration((lo, hi)))
        result["scaling"] = scaling

    print(json.dumps(result))


if __name__ == "__main__":
    sys.exit(main())
