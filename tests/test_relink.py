"""Cross-corpus re-link (graph_ops.rs:416-514 analog): two corpora
built independently, merged with extend_graph, then the linkers
re-run over the MERGED node set — a Test defined in corpus A must
link to Functions of corpus B that reference it."""

import pyspark.sql.functions as F

from stakgraph_spark.operators.relink import (
    relink_after_extend,
    relink_api_nodes,
    relink_tests,
)
from stakgraph_spark.operators.setops import extend_graph
from stakgraph_spark.plans.pipeline import build_graph
from stakgraph_spark.sources.transcripts import read_transcripts
from tests.conftest import SF_SMALL


def _split_corpora(spark):
    tr = read_transcripts(spark, SF_SMALL).persist()
    a = tr.where("conv_id < 'conv_000007'")
    b = tr.where("conv_id >= 'conv_000007'")
    return build_graph(spark, a), build_graph(spark, b)


def test_relink_crosses_corpus_boundary(spark):
    ga, gb = _split_corpora(spark)
    nodes, edges = extend_graph(ga["nodes"], gb["nodes"], ga["edges"], gb["edges"])

    a_convs = [r["name"] for r in ga["nodes"].where("node_type = 'File'").select("name").collect()]
    test_links = relink_tests(nodes)
    # a test node materialized in corpus A, CALLS-linked to a turn
    # that lives in a corpus-B conversation
    crossing = (
        test_links.join(
            nodes.selectExpr("node_key AS source_key", "file AS test_file"), "source_key"
        )
        .join(nodes.selectExpr("node_key AS target_key", "file AS fn_file"), "target_key")
        .where(
            F.col("test_file").isin([f"corpus/{c}" for c in a_convs])
            & ~F.col("fn_file").isin([f"corpus/{c}" for c in a_convs])
        )
    )
    assert crossing.count() > 0


def test_relink_api_matches_build_links(spark):
    """Graph-resident api re-link must reproduce the build-time
    Request->Endpoint CALLS set (endpoints are a shared dim, so the
    merged set equals the union of per-corpus links)."""
    ga, gb = _split_corpora(spark)
    nodes, edges = extend_graph(ga["nodes"], gb["nodes"], ga["edges"], gb["edges"])
    relinked = relink_api_nodes(nodes)
    built = (
        edges.where("edge_type = 'CALLS' AND source_key LIKE 'request-%'")
        .select("edge_type", "source_key", "target_key")
    )
    assert relinked.exceptAll(built).count() == 0
    assert built.exceptAll(relinked).count() == 0


def test_relink_after_extend_is_idempotent(spark):
    ga, gb = _split_corpora(spark)
    nodes, edges = extend_graph(ga["nodes"], gb["nodes"], ga["edges"], gb["edges"])
    once = relink_after_extend(nodes, edges)
    twice = relink_after_extend(nodes, once)
    assert once.count() == twice.count()
