"""Measure the extraction-shaped JVM probe alone (codegen concat +
regexp_extract_all + noop sink) on the current cpuset. Used to map
which HOST vCPUs share underlying resources (the guest shows no SMT,
but hypervisor-side siblings would show up as probe slowdown when
both lanes are busy).

Usage: taskset -c <set> python scripts/probe_only.py <cores>
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    cores = int(sys.argv[1])
    from stakgraph_spark.session import get_spark

    spark = get_spark(
        app_name=f"probe[{cores}]",
        master=f"local[{cores}]",
        shuffle_partitions=max(cores * 2, 8),
        extra_conf={"spark.driver.extraJavaOptions": "-XX:+UseParallelGC"},
    )

    def probe(n_rows: int) -> None:
        spark.range(0, n_rows, 1, cores * 4).selectExpr(
            "size(regexp_extract_all(concat('call foo_', id, '(x) and bar_', "
            "id % 97, '(y)'), '([a-z]+_[0-9]+)\\\\(', 1)) AS n"
        ).write.format("noop").mode("overwrite").save()

    probe(400_000)
    times = []
    for _ in range(3):
        t0 = time.time()
        probe(4_000_000)
        times.append(time.time() - t0)
    print(f"{min(times):.3f}")
    spark.stop()


if __name__ == "__main__":
    main()
