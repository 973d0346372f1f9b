"""Cross-corpus re-link — linkers over the MATERIALIZED graph.

Reference: after extend_graph merges corpora, the api/test linkers
are re-run over the DB-resident node set (graph_ops.rs:416-514
link_e2e_tests + link_api_nodes over Neo4j-resident nodes), so links
can cross corpus boundaries: a test defined in corpus A links to the
functions of corpus B that reference it.

These operators consume ONLY the nodes table (payload columns carry
everything the linkers need: Request.name = path, meta verb,
Test.name = test_<id>, Function.body = turn text), so they compose
with extend_graph's output without access to the original inputs.

Scale shape: both linkers are partitioned equi-joins — api on
(verb, n_segments) with the segment-wise paths_match residual
(linker.rs:241-266), tests on the extracted test id — never the
reference's O(n*m) nested loops (linker.rs:16-25, 82-92).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.paths import (
    n_segments_sql,
    normalize_frontend_path_sql,
    paths_match_sql,
)

TEST_TYPES = ("UnitTest", "IntegrationTest", "E2etest")


def relink_api_nodes(nodes: DataFrame) -> DataFrame:
    """link_api_nodes over graph-resident nodes (linker.rs:129-163):
    Request nodes matched to Endpoint nodes by normalized-frontend
    path vs the endpoint's raw path (the part after the verb in its
    name), equal segment count, verb match. Verb semantics follow the
    reference's verbs_match (linker.rs:232-239): false unless BOTH
    sides carry a verb, compared case-insensitively — so the join
    filters empty verbs on each side and keys on upper(verb); two
    verb-less nodes never link on ''=''. -> CALLS edges.
    """
    norm = normalize_frontend_path_sql("name", "spark")
    reqs = (
        nodes.where(F.col("node_type") == "Request")
        .selectExpr(
            "node_key AS req_key",
            f"{norm} AS rpath",
            "upper(regexp_extract(meta, '(^|;)verb=([^;]*)', 2)) AS verb",
        )
        .where("rpath IS NOT NULL AND verb != ''")
        .selectExpr("req_key", "rpath", "verb", f"{n_segments_sql('rpath', 'spark')} AS nseg")
    )
    eps = (
        nodes.where(F.col("node_type") == "Endpoint")
        .selectExpr(
            "node_key AS ep_key",
            "regexp_extract(name, '^[A-Z]+ (.*)$', 1) AS epath",
            "upper(regexp_extract(meta, '(^|;)verb=([^;]*)', 2)) AS verb",
        )
        .where("verb != ''")
        .selectExpr("ep_key", "epath", "verb", f"{n_segments_sql('epath', 'spark')} AS nseg")
    )
    match = paths_match_sql("rpath", "epath", "spark")
    return (
        reqs.join(F.broadcast(eps), ["verb", "nseg"])
        .where(F.expr(match))
        .selectExpr("'CALLS' AS edge_type", "req_key AS source_key", "ep_key AS target_key")
        .distinct()
    )


def relink_tests(nodes: DataFrame) -> DataFrame:
    """link_e2e_tests over graph-resident nodes (linker.rs:56-127 /
    graph_ops.rs re-run): Test nodes joined to Function nodes whose
    BODY references the shared test id. Crosses corpus boundaries by
    construction (the join key is the extracted id, wherever each
    side was built). -> CALLS edges Test -> Function."""
    tests = nodes.where(F.col("node_type").isin(*TEST_TYPES)).selectExpr(
        "node_key AS test_key",
        "regexp_extract(name, 'test_([0-9]+)', 1) AS tid",
    )
    refs = nodes.where(F.col("node_type") == "Function").selectExpr(
        "node_key AS fn_key",
        "explode(regexp_extract_all(body, 'ref test_([0-9]+)', 1)) AS tid",
    )
    return (
        refs.join(F.broadcast(tests), "tid")
        .selectExpr("'CALLS' AS edge_type", "test_key AS source_key", "fn_key AS target_key")
        .distinct()
    )


def relink_after_extend(nodes: DataFrame, edges: DataFrame) -> DataFrame:
    """The full post-merge pass: re-run both linkers over the merged
    node set and union the new edges in (dedup on edge identity,
    array_graph.rs:775-781)."""
    new_edges = relink_api_nodes(nodes).unionByName(relink_tests(nodes))
    return edges.unionByName(new_edges).dropDuplicates(
        ["edge_type", "source_key", "target_key"]
    )
