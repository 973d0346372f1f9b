"""Set ops, sinks round-trip, traversal, P/R harness primitives."""

import tempfile

import pandas as pd

from stakgraph_spark.operators import queryops as Q
from stakgraph_spark.operators import setops as S
from stakgraph_spark.operators.materialize import REPO_KEY
from stakgraph_spark.sources import sinks
from tests.conftest import SF_SMALL


def _g(spark):
    import __spark_entry__ as ENTRY

    return ENTRY._graph(spark, SF_SMALL)


def test_extend_graph_dedup(spark):
    g = _g(spark)
    n, e = S.extend_graph(g["nodes"], g["nodes"], g["edges"], g["edges"])
    assert n.count() == g["nodes"].count()
    assert e.count() == g["edges"].count()


def test_graph_diff_and_pr(spark):
    g = _g(spark)
    e = g["edges"]
    assert S.graph_diff(e, e).count() == 0
    sample = e.limit(100)
    d = S.graph_diff(e, sample)
    assert d.where("side = 'a'").count() == e.count() - 100
    assert d.where("side = 'b'").count() == 0

    t = g["triples"]
    p, r = S.precision_recall(t, t)
    assert p == 1.0 and r == 1.0
    p, r = S.precision_recall(
        t.limit(100), t
    )  # subset: perfect precision, partial recall
    assert p == 1.0 and 0 < r < 1


def test_jsonl_roundtrip(spark):
    g = _g(spark)
    out = tempfile.mkdtemp(prefix="sg_jsonl_")
    sinks.write_jsonl(g["nodes"], g["edges"], out)
    n2, e2 = sinks.read_jsonl(spark, out)
    assert n2.count() == g["nodes"].count()
    assert e2.count() == g["edges"].count()
    a = g["edges"].select("edge_type", "source_key", "target_key").toPandas()
    b = e2.select("edge_type", "source_key", "target_key").toPandas()
    cols = list(a.columns)
    pd.testing.assert_frame_equal(
        a.sort_values(cols).reset_index(drop=True),
        b[cols].sort_values(cols).reset_index(drop=True),
    )


def test_prepare_upload_nodes_stamping(spark):
    """Upload-time ref_id / token_count / date_added_to_graph
    stamping (neo4j_utils.rs:61-90): uuid-shaped deterministic
    ref_id, unique per node, stable across calls with the same
    timestamp; token_count matches the whitespace proxy."""
    import re

    g = _g(spark)
    nodes = g["nodes"].limit(200)
    up = sinks.prepare_upload_nodes(nodes, 1_700_000_000)
    rows = up.select("node_key", "ref_id", "token_count", "date_added_to_graph", "body").collect()
    assert len(rows) == len({r["ref_id"] for r in rows})  # unique per node
    uuid_re = re.compile(r"^[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}$")
    for r in rows:
        assert uuid_re.match(r["ref_id"])
        assert r["date_added_to_graph"] == 1_700_000_000
        assert r["token_count"] == len(r["body"].strip().split()) if r["body"].strip() else True
    # deterministic: same timestamp -> same ids (resume byte-identity)
    again = {r["node_key"]: r["ref_id"] for r in sinks.prepare_upload_nodes(nodes, 1_700_000_000).select("node_key", "ref_id").collect()}
    assert all(again[r["node_key"]] == r["ref_id"] for r in rows)
    # different upload time -> different ids (per-upload identity)
    other = {r["node_key"]: r["ref_id"] for r in sinks.prepare_upload_nodes(nodes, 1_800_000_000).select("node_key", "ref_id").collect()}
    assert all(other[r["node_key"]] != r["ref_id"] for r in rows)


def test_shortest_path_and_has_edge(spark):
    g = _g(spark)
    e = g["edges"]
    # scaffold is repo -> directory -> conversation -> turn
    dir_key = (
        e.where("edge_type = 'CONTAINS' AND source_key = '" + REPO_KEY + "'")
        .where("target_key LIKE 'directory-%'")
        .select("target_key").first()["target_key"]
    )
    conv_key = (
        e.where(f"edge_type = 'CONTAINS' AND source_key = '{dir_key}'")
        .select("target_key").first()["target_key"]
    )
    turn_key = (
        e.where(f"edge_type = 'CONTAINS' AND source_key = '{conv_key}'")
        .where("target_key LIKE 'function-%'")
        .select("target_key").first()["target_key"]
    )
    assert Q.has_edge(e, REPO_KEY, dir_key, "CONTAINS")
    assert not Q.has_edge(e, dir_key, REPO_KEY, "CONTAINS")
    path = Q.shortest_path(e, REPO_KEY, turn_key, max_depth=5)
    assert path is not None and path[0] == REPO_KEY and path[-1] == turn_key
    assert len(path) == 4  # repo -> dir -> conv -> turn


def test_paginate_deterministic(spark):
    g = _g(spark)
    p1 = Q.paginate(g["nodes"], ["node_key"], skip=0, limit=10).toPandas()
    p2 = Q.paginate(g["nodes"], ["node_key"], skip=10, limit=10).toPandas()
    assert len(p1) == 10 and len(p2) == 10
    assert set(p1["node_key"]).isdisjoint(set(p2["node_key"]))
    # stable: same call returns same page
    p1b = Q.paginate(g["nodes"], ["node_key"], skip=0, limit=10).toPandas()
    pd.testing.assert_frame_equal(p1, p1b)


def test_find_predicates(spark):
    g = _g(spark)
    nodes = g["nodes"]
    assert Q.find_nodes_by_name(nodes, "Class", "OrderService").count() == 1
    assert Q.find_nodes_by_file_ends_with(nodes, "Function", "conv_000000").count() > 0
    assert Q.find_node_at(nodes, "Function", "corpus/conv_000000", 0).count() == 1
    # span-contains semantics (start <= row <= end, graph.rs:142-146):
    # the conversation File (0..last) and turn_3 (3..3) both cover
    # row 3; point-span nodes at other rows do not
    in_range = Q.find_node_in_range(nodes, "corpus/conv_000000", 3)
    types = {r["node_type"] for r in in_range.collect()}
    assert {"File", "Function"} <= types
    assert in_range.where("node_type = 'Function'").count() == 1
