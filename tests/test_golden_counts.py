"""Golden-count fixtures — the analog of the reference's exact
per-language censuses (ast/src/testing/go/mod.rs:26-130) plus
planted-semantics assertions (mock exclusion, case-variant
rejection, ambiguity tiers, transitive canonicalization)."""

import pyspark.sql.functions as F

from stakgraph_spark.plans.pipeline import build_from_sf_dir
from tests.conftest import SF_SMALL


def test_census_sf0001(spark):
    g = build_from_sf_dir(spark, SF_SMALL)
    node_census = {r["node_type"]: r["n"] for r in g["nodes"].groupBy("node_type").agg(F.count("*").alias("n")).collect()}
    # 1000 turns + entity 13 (FnResolver, type Function)
    assert node_census["Function"] == 1001
    assert node_census["Repository"] == 1
    assert node_census["File"] == 15  # 15 users at sf0.001
    assert node_census["Endpoint"] == 5
    assert node_census["Library"] == 4  # CoreUtils + 3 tools
    edge_census = {r["edge_type"]: r["n"] for r in g["edges"].groupBy("edge_type").agg(F.count("*").alias("n")).collect()}
    assert edge_census["CONTAINS"] == 1015  # 15 repo->conv + 1000 conv->turn
    assert edge_census["OF"] == 3  # 6->5, 18->17, 19->17
    assert edge_census["HANDLER"] == 5
    assert g["triples"].count() == 2516


def test_case_variant_never_links(spark):
    """'@AuthCore' is planted (event_id % 17 == 0 user turns) but the
    dictionary only has 'authcore' — case-only variants must NOT link
    (call_finder.rs:175)."""
    g = build_from_sf_dir(spark, SF_SMALL)
    m = g["mentions"].where(F.col("surface") == "AuthCore").count()
    assert m > 0, "fixture must contain the planted case-variant"
    assert g["resolved"].where(F.col("surface") == "AuthCore").count() == 0


def test_mock_exclusion_tier(spark):
    """alias 'ordersvc' -> {OrderService, MockOrderService}; the
    non-mock candidate must win with top score (call_finder.rs:128-151)."""
    g = build_from_sf_dir(spark, SF_SMALL)
    rows = g["resolved"].where(F.col("surface") == "ordersvc").select("entity_id", "score").distinct().collect()
    assert rows, "fixture must contain 'ordersvc' mentions"
    assert all(r["entity_id"] == 0 and r["score"] == 3 for r in rows)


def test_ambiguous_alias_tiers(spark):
    """alias 'core' -> {AuthCore=3, BillingCore=4}: never resolves to
    anything else, and scores are 2 (same-conv evidence) or 1
    (fallback, which tie-breaks to min entity_id = 3)."""
    g = build_from_sf_dir(spark, SF_SMALL)
    rows = g["resolved"].where(F.col("surface") == "core").collect()
    assert rows
    for r in rows:
        assert r["entity_id"] in (3, 4)
        assert r["score"] in (1, 2)
        if r["score"] == 1:
            assert r["entity_id"] == 3


def test_transitive_canonicalization(spark):
    """same-as chain 17-19-18 must collapse to min label 17; USES
    edges must target only canonical entity nodes."""
    from stakgraph_spark.operators.canon import canonical_map
    from stakgraph_spark.operators.materialize import all_entities
    from stakgraph_spark.sources.entities import same_as_df

    cmap = {r["entity_id"]: r["canon_id"] for r in canonical_map(all_entities(spark).select("entity_id"), same_as_df(spark)).collect()}
    assert cmap[6] == 5 and cmap[18] == 17 and cmap[19] == 17
    assert cmap[0] == 0

    g = build_from_sf_dir(spark, SF_SMALL)
    # no USES edge may target a non-canonical entity node (start in {6,18,19})
    bad = (
        g["edges"].where(F.col("edge_type") == "USES")
        .join(g["ent_nodes"], F.col("target_key") == F.col("node_key"))
        .where(F.col("start").isin(6, 18, 19))
        .count()
    )
    assert bad == 0


def test_text_byte_exact_invariant(spark):
    """Derived columns are additions; text passes through byte-exact:
    re-joining mentions back to transcripts finds every surface as a
    literal '@surface' substring of the original text."""
    g = build_from_sf_dir(spark, SF_SMALL)
    joined = g["mentions"].join(g["transcripts"], ["conv_id", "turn_idx"])
    violations = joined.where(
        ~F.col("text").contains(F.concat(F.lit("@"), F.col("surface")))
    ).count()
    assert violations == 0


def test_edge_dedup_invariant(spark):
    g = build_from_sf_dir(spark, SF_SMALL)
    e = g["edges"]
    assert e.count() == e.dropDuplicates(["edge_type", "source_key", "target_key"]).count()
