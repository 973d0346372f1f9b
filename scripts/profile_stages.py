"""Stage-level wall-time profile in a fresh JVM.

Usage: python scripts/profile_stages.py <cores> <n_events>
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    cores, n = int(sys.argv[1]), int(sys.argv[2])
    from stakgraph_spark.operators import extract as X
    from stakgraph_spark.operators import link as L
    from stakgraph_spark.operators import materialize as M
    from stakgraph_spark.session import get_spark
    from stakgraph_spark.sources.transcripts import derive_transcripts, synthetic_events

    spark = get_spark(master=f"local[{cores}]")

    def tm(label, f):
        t0 = time.time()
        r = f()
        print(f"[{cores}] {label}: {time.time() - t0:.1f}s", flush=True)
        return r

    tr = derive_transcripts(spark, synthetic_events(spark, n, n // 400)).persist()
    tm("derive+persist", lambda: tr.count())
    tm("entity_nodes", lambda: M.entity_nodes(spark).count())
    en = M.entity_nodes(spark)
    men = X.extract_mentions(tr).persist()
    tm("mentions", lambda: men.count())
    res = L.link_mentions(spark, men).persist()
    tm("link", lambda: res.count())
    tm("edges", lambda: M.build_edges(spark, tr, res, en).count())
    tm("nodes", lambda: M.build_nodes(spark, tr, en).count())
    spark.stop()


if __name__ == "__main__":
    main()
