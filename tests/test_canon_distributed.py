"""Distributed label-propagation CC must agree with the driver
union-find on the same graph (both paths of canonical_map), including
a long chain (propagation depth > 1) and a random-ish component."""

import pandas as pd

from stakgraph_spark.operators.canon import canonical_map


def _cmap(spark, ids, edges, **kw):
    ids_df = spark.createDataFrame([(i,) for i in ids], "entity_id INT")
    e_df = spark.createDataFrame(edges or [(None, None)], "a INT, b INT").where("a IS NOT NULL")
    out = canonical_map(ids_df, e_df, **kw).toPandas()
    return out.sort_values("entity_id").reset_index(drop=True)


def test_distributed_equals_driver_union_find(spark):
    ids = list(range(30))
    # chain 0-1-2-3-4 (diameter 4), star 10<-{11,12,13}, pair (20,21)
    edges = [(0, 1), (1, 2), (2, 3), (3, 4), (11, 10), (12, 10), (13, 10), (21, 20)]
    a = _cmap(spark, ids, edges, driver_threshold=1_000_000)  # union-find
    b = _cmap(spark, ids, edges, driver_threshold=0)          # label propagation
    pd.testing.assert_frame_equal(a, b)
    m = dict(zip(a["entity_id"], a["canon_id"]))
    assert m[4] == 0 and m[13] == 10 and m[21] == 20 and m[25] == 25


def test_distributed_empty_edges(spark):
    a = _cmap(spark, [1, 2, 3], [], driver_threshold=0)
    assert list(a["canon_id"]) == [1, 2, 3]
