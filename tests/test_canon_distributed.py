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


def test_driver_path_never_collects_ids(spark):
    """ids >> edges: the driver path must scale with the EDGE set
    only — a large ids relation joins the parent map distributed
    (round-3 verdict: the old path collected the full ids set)."""
    ids_df = spark.range(0, 50_000).selectExpr("CAST(id AS INT) AS entity_id")
    e_df = spark.createDataFrame([(7, 9), (9, 11), (100, 3)], "a INT, b INT")

    cls = type(e_df)  # the concrete (classic) DataFrame class
    n_collects = {"n": 0}
    orig = cls.collect

    def counting_collect(self):
        n_collects["n"] += 1
        rows = orig(self)
        assert len(rows) <= 6, f"driver path collected {len(rows)} rows (ids leak)"
        return rows

    cls.collect = counting_collect
    try:
        out = canonical_map(ids_df, e_df, driver_threshold=1_000_000)
    finally:
        cls.collect = orig
    assert n_collects["n"] >= 1  # the edge collect happened under the counter
    got = {r["entity_id"]: r["canon_id"] for r in out.where("entity_id IN (3, 7, 9, 11, 100, 42)").collect()}
    assert got == {3: 3, 7: 7, 9: 7, 11: 7, 100: 3, 42: 42}
    assert out.count() == 50_000


def test_canon_ids_beyond_int32(spark):
    """Entity ids at 100x scale are BIGINT; both canonical_map paths
    must carry ids > 2^31 without overflow (round-4 verdict: the
    parent map and the label seed were INT-casted)."""
    base = 2**31  # first id past int32
    ids = [base + i for i in range(6)] + [5]
    edges = [(base, base + 1), (base + 1, base + 2), (base + 4, 5)]
    for thresh in (1_000_000, 0):  # union-find path, then label propagation
        ids_df = spark.createDataFrame([(i,) for i in ids], "entity_id BIGINT")
        e_df = spark.createDataFrame(edges, "a BIGINT, b BIGINT")
        out = canonical_map(ids_df, e_df, driver_threshold=thresh).toPandas()
        assert str(out["canon_id"].dtype) == "int64"
        m = dict(zip(out["entity_id"], out["canon_id"]))
        assert m[base + 2] == base and m[base + 1] == base
        assert m[base + 4] == 5 and m[5] == 5
        assert m[base + 3] == base + 3  # untouched id maps to itself, unclipped


def test_label_propagation_pointer_jumping_deep_chain(spark):
    """A chain of diameter 60 must converge well within 20 rounds:
    pointer jumping makes convergence O(log diameter) (plain
    propagation would need 60 rounds and raise)."""
    ids = list(range(61))
    edges = [(i, i + 1) for i in range(60)]
    a = _cmap(spark, ids, edges, driver_threshold=0, max_iter=10)
    assert set(a["canon_id"]) == {0}
