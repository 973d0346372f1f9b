"""Plan-shape assertions — the perf claims as executable checks.

The engine's scale story rests on specific physical-plan properties;
these tests pin them so a regression shows up as a test failure, not
a silent 10x at the next scale factor.
"""

import __spark_entry__ as ENTRY
from tests.conftest import SF_SMALL


def _physical(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _optimized(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def _derivation_graph(spark):
    # The driver's _graph localCheckpoints nodes/edges (truncating
    # lineage to a materialized-table scan), so plan-shape pins must
    # build the raw derivation: persist_intermediates=False keeps the
    # full logical plan visible.
    from stakgraph_spark.plans.pipeline import build_from_sf_dir

    return build_from_sf_dir(spark, SF_SMALL, persist_intermediates=False)


def test_edges_plan_broadcasts_dims_no_cartesian(spark):
    g = _derivation_graph(spark)
    plan = _physical(g["edges"])
    # every dictionary join is a broadcast hash join; nothing falls
    # back to a cartesian product or a nested-loop join
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_triples_plan_prunes_node_payload(spark):
    """Catalyst column pruning keeps the triple path free of the
    node-payload rollups (file bodies, docs windows)."""
    g = _derivation_graph(spark)
    plan = _optimized(g["triples"])
    assert "collect_list" not in plan


def test_events_scan_prunes_columns(spark):
    """The derivation needs 4 of the events table's 6 columns; the
    parquet ReadSchema must not include the unused ones (value,
    props)."""
    from stakgraph_spark.sources.transcripts import read_transcripts

    plan = _physical(read_transcripts(spark, SF_SMALL))
    import re

    read_schemas = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    assert read_schemas, "no parquet scan found in the plan"
    for rs in read_schemas:
        assert "props" not in rs and "value" not in rs


def test_resolution_join_is_broadcast(spark):
    """The mention->dictionary join must broadcast the dictionary
    side (the fact stream is never shuffled for resolution)."""
    from stakgraph_spark.operators.extract import extract_mentions_raw
    from stakgraph_spark.operators.link import link_mentions
    from stakgraph_spark.sources.transcripts import read_transcripts

    t = read_transcripts(spark, SF_SMALL)
    plan = _physical(link_mentions(spark, extract_mentions_raw(t)))
    assert "BroadcastHashJoin" in plan
    # top-1 is an aggregate (map-side partial), not a window over the
    # mention key (the derivation's conv_id row_number window is the
    # one legitimate window in the plan)
    assert "windowspecdefinition(conv_id#" in plan or "Window" in plan  # derivation only
    assert "windowspecdefinition(surface" not in plan
    assert "partial_max" in plan


def test_handler_and_first_def_have_partial_aggregates(spark):
    """The global picks are struct-min AGGREGATES (map-side combine),
    not windows capped at the key cardinality (5 endpoints / 50 test
    ids)."""
    from stakgraph_spark.operators.extract import first_test_defs
    from stakgraph_spark.sources.transcripts import read_transcripts

    t = read_transcripts(spark, SF_SMALL)
    plan = _physical(first_test_defs(t))
    assert "partial_min" in plan
    # no window partitioned by the 50-key tid (the derivation's
    # conv_id window is expected and fine)
    assert "windowspecdefinition(tid" not in plan
