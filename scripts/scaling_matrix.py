"""Config experiment matrix for the scaling gate: run one pinned
(lo, hi) pair per config, strictly sequentially (nothing else may run
on the host), with the same-moment in-process CPU ceiling probe
between legs. Prints one JSON line per config.

Usage: python scripts/scaling_matrix.py [config ...]
Configs: name=ENV1:v1,ENV2:v2[;lo,hi[;corpus]]
Default corpus: /dev/shm/sg_scale_corpus_4000000/transcripts.parquet
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

DEFAULT_CORPUS = "/dev/shm/sg_scale_corpus_4000000/transcripts.parquet"


def run_leg(cores: int, corpus: str, env_over: dict) -> dict | None:
    env = dict(os.environ)
    env.setdefault("SPARK_DRIVER_MEM", "12g")
    env.update(env_over)
    cmd = [
        "taskset", "-c", f"0-{cores - 1}",
        sys.executable, os.path.join(REPO, "scripts", "scaling_run.py"),
        str(cores), "0", corpus,
    ]
    out = subprocess.run(cmd, capture_output=True, text=True, timeout=1500, env=env, cwd=REPO)
    for line in out.stdout.strip().splitlines():
        if line.startswith("{"):
            return json.loads(line)
    sys.stderr.write(out.stderr[-2000:] + "\n")
    return None


def main() -> None:
    from bench import _cpu_calibration

    for spec in sys.argv[1:]:
        name, _, rest = spec.partition("=")
        parts = rest.split(";")
        env_over = {}
        if parts[0]:
            for kv in parts[0].split(","):
                k, _, v = kv.partition(":")
                env_over[k] = v
        lo, hi = (2, 8)
        if len(parts) > 1 and parts[1]:
            lo, hi = (int(x) for x in parts[1].split(","))
        corpus = parts[2] if len(parts) > 2 and parts[2] else DEFAULT_CORPUS
        t0 = time.time()
        r_lo = run_leg(lo, corpus, env_over)
        cal = _cpu_calibration((lo, hi))
        r_hi = run_leg(hi, corpus, env_over)
        rec = {"config": name, "env": env_over, "pair": [lo, hi],
               "wall_total": round(time.time() - t0, 1), "ceiling": cal}
        if r_lo and r_hi:
            sp = r_hi["turns_per_sec"] / r_lo["turns_per_sec"]
            rec.update(
                lo_sec=r_lo["sec"], hi_sec=r_hi["sec"],
                speedup=round(sp, 3), efficiency=round(sp / (hi / lo), 3),
            )
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
