"""Golden censuses for the SECOND fixture corpus family
(sources/fixtures.fixture_corpus2) — the analog of the reference
validating multiple fixture repos with exact per-repo censuses and
named nodes (ast/src/testing/mod.rs:29-61; go/mod.rs:26-130).

The corpus differs from the sf family in shape (6 deep 240-turn
conversations, 6 directory buckets, 50% of mentions on ONE surface,
20 shared tids defined from every conversation) and the build is
exercised under BOTH the default dialect and a non-default pack
(expressish: *_spec/e2e_ classify rules -> every 'test_N' id falls to
the UnitTest default; handler_pick='last' -> Express later-middleware
shadowing), asserting the pack changes EXACTLY the hooked families.
"""

import pyspark.sql.functions as F
import pytest

from stakgraph_spark.operators.dialects import DIALECT_PACKS
from stakgraph_spark.plans.pipeline import build_graph
from stakgraph_spark.sources.fixtures import fixture_corpus2


@pytest.fixture()
def corpus2(spark):
    # getOrCreate session semantics make the persisted corpus shared
    # across the module's tests in practice (same session, same plan)
    tr = fixture_corpus2(spark).persist()
    tr.count()
    yield tr
    tr.unpersist()


def _censuses(g):
    nc = {r["node_type"]: r["n"] for r in g["nodes"].groupBy("node_type").agg(F.count("*").alias("n")).collect()}
    ec = {r["edge_type"]: r["n"] for r in g["edges"].groupBy("edge_type").agg(F.count("*").alias("n")).collect()}
    return nc, ec


# Shared expectations (pack-independent families). CONTAINS = 4
# repo->lang + 6 repo->dir + 6 dir->conv + 1440 conv->turn + 6
# conv->import + 20 conv->test + 360 turn->request + 6
# conv->extracted-Var + 360 turn->Var (tier accept, one per tool
# turn). CALLS = 360 tool calls + 360 request calls + 360 test refs.
# USES = 180 mention turns x 6 convs.
EDGES_EXPECTED = {
    "ARG_OF": 360, "CALLS": 1080, "CONTAINS": 2208, "HANDLER": 5,
    "IMPLEMENTS": 2, "IMPORTS": 2, "OF": 42, "OPERAND": 2,
    "PARENT_OF": 2, "USES": 1080,
}
NODES_SHARED = {
    "Class": 13, "Datamodel": 1, "Directory": 6, "Endpoint": 5,
    "Feature": 1, "File": 6, "Function": 1441, "Import": 6,
    "Instance": 39, "Language": 4, "Library": 4, "Page": 1,
    "Repository": 1, "Request": 360, "Trait": 1, "Var": 7,
}


def test_census_corpus2_default(spark, corpus2):
    g = build_graph(spark, corpus2, repartition_by_conv=True)
    nc, ec = _censuses(g)
    # 20 shared tids, classified tid%3 by the default dialect
    assert nc == {**NODES_SHARED, "UnitTest": 7, "IntegrationTest": 7, "E2etest": 6}
    assert ec == EDGES_EXPECTED
    assert g["triples"].count() == 4783


def test_census_corpus2_expressish(spark, corpus2):
    """Same corpus under the expressish pack: ONLY the hooked
    families move — every 'test_N' id falls through the
    *_spec/e2e_ rules to the UnitTest default (3 Test types -> 1),
    edge counts unchanged."""
    g = build_graph(spark, corpus2, repartition_by_conv=True, pack=DIALECT_PACKS["expressish"])
    nc, ec = _censuses(g)
    assert nc == {**NODES_SHARED, "UnitTest": 20}
    assert ec == EDGES_EXPECTED
    assert g["triples"].count() == 4783


def test_named_handler_triples_per_pack(spark, corpus2):
    """handler_pick as pack data, proven on NAMED triples: the
    default ('first', mod.rs:208-223) binds every endpoint to its
    FIRST referencing turn (conv_000000, turns 3-19); expressish
    ('last' — Express later-middleware shadowing) binds the LAST
    (conv_000500, turns 223-239)."""
    first = {
        "endpoint-getapiordersparam-entities-100-get": "function-turn3-corpusconv000000-3",
        "endpoint-postapiordersparam-entities-101-post": "function-turn7-corpusconv000000-7",
        "endpoint-getapicustomersparam-entities-102-get": "function-turn11-corpusconv000000-11",
        "endpoint-deleteapipartsparam-entities-103-delete": "function-turn15-corpusconv000000-15",
        "endpoint-getapiinvoicesparam-entities-104-get": "function-turn19-corpusconv000000-19",
    }
    last = {
        "endpoint-getapiordersparam-entities-100-get": "function-turn223-corpusconv000500-223",
        "endpoint-postapiordersparam-entities-101-post": "function-turn227-corpusconv000500-227",
        "endpoint-getapicustomersparam-entities-102-get": "function-turn231-corpusconv000500-231",
        "endpoint-deleteapipartsparam-entities-103-delete": "function-turn235-corpusconv000500-235",
        "endpoint-getapiinvoicesparam-entities-104-get": "function-turn239-corpusconv000500-239",
    }
    for pack, want in ((None, first), (DIALECT_PACKS["expressish"], last)):
        g = build_graph(spark, corpus2, repartition_by_conv=True, pack=pack)
        got = {r["subj"]: r["obj"] for r in g["triples"].where("pred = 'HANDLER'").collect()}
        assert got == want


def test_hot_surface_and_canon_targets(spark, corpus2):
    """The planted 50%-on-one-surface skew survives the build intact,
    and USES edges for the same-as chain members ('store'=18,
    'linker'=19) re-target the canonical entity 17 (IndexBuilder) —
    exact per-target counts."""
    g = build_graph(spark, corpus2, repartition_by_conv=True)
    m = g["mentions"]
    n = m.count()
    hot = m.where("surface = 'orderservice'").count()
    assert n == 1080 and hot == 540  # 50% >= the 20% torture bar
    tgt = {
        (r["start"], r["name"]): r["n"]
        for r in g["edges"].where("edge_type = 'USES'")
        .join(g["ent_nodes"], F.col("target_key") == F.col("node_key"))
        .groupBy("start", "name").agg(F.count("*").alias("n")).collect()
    }
    assert tgt == {
        (0, "OrderService"): 540,
        (1, "CustomerRepo"): 108,
        (5, "SparkEngine"): 108,
        (16, "CacheLayer"): 108,
        (17, "IndexBuilder"): 216,  # store 108 + linker 108, canon-collapsed
    }
    # nothing targets the non-canonical chain members
    assert not {k for k in tgt if k[0] in (6, 18, 19)}
