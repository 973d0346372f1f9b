"""Parallelism-invariance: node/edge SET equality (not just counts)
at local[2] vs local[8] — the sandbox protocol for the reference's
backend-equivalence test (compare_graphs.rs:79-102) and the
north-rule two-cluster-size criterion's correctness half.

Named test_z_* so it runs last: it stops and recreates the shared
SparkSession at different masters.
"""

import pandas as pd

from stakgraph_spark.plans.pipeline import build_from_sf_dir
from stakgraph_spark.session import get_spark
from tests.conftest import SF_SMALL


def _triples_at(master: str) -> pd.DataFrame:
    spark = get_spark(master=master)
    try:
        df = build_from_sf_dir(spark, SF_SMALL)["triples"].toPandas()
        return df.sort_values(["subj", "pred", "obj"]).reset_index(drop=True)
    finally:
        spark.stop()
    # session is recreated by the next get_spark() call


def test_output_invariant_under_parallelism():
    a = _triples_at("local[2]")
    b = _triples_at("local[8]")
    pd.testing.assert_frame_equal(a, b)
