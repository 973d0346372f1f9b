"""Set operations & multi-corpus composition (SURVEY.md §2.8) and
ordered-aggregation / adjacency windows (§2.2, §2.6).

  extend_graph          multi-repo union with dedup-by-key
                        (array_graph.rs:84-99; repo.rs:83-94)
  graph_diff            node/edge key difference — the backend
                        comparison / P-R harness primitive
                        (testing/graphs/compare_graphs.rs:50-62)
  filter_by_changed     keep nodes whose container is in a changed
                        set; keep edges touching them
                        (builder/utils.rs:11-19; array_graph.rs:54-82)
  conv_rollup           ordered per-conversation text rollup — the
                        combine_import_sections analog
                        (builder/utils.rs:39-87: sort by start, join
                        bodies) as an ordered collect_list aggregate
  prev_system_turn      nearest preceding system turn per turn — the
                        attach_function_comments adjacency analog
                        (lang/mod.rs:53-97: nearest comment block
                        above a function) as a running-max window
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def extend_graph(nodes_a: DataFrame, nodes_b: DataFrame, edges_a: DataFrame, edges_b: DataFrame):
    """Union two graphs, deduping nodes by node_key and edges by
    (edge_type, source_key, target_key) — first-graph-wins for node
    payloads via dropDuplicates on the key (deterministic because
    payloads for an equal key are equal by construction)."""
    nodes = nodes_a.unionByName(nodes_b).dropDuplicates(["node_key"])
    edges = edges_a.unionByName(edges_b).dropDuplicates(
        ["edge_type", "source_key", "target_key"]
    )
    return nodes, edges


def graph_diff(edges_a: DataFrame, edges_b: DataFrame) -> DataFrame:
    """Symmetric difference of triple sets with a side marker —
    the compare_graphs / P-R primitive."""
    cols = ["edge_type", "source_key", "target_key"]
    only_a = edges_a.select(cols).exceptAll(edges_b.select(cols)).withColumn("side", F.lit("a"))
    only_b = edges_b.select(cols).exceptAll(edges_a.select(cols)).withColumn("side", F.lit("b"))
    return only_a.unionByName(only_b)


def precision_recall(got: DataFrame, golden: DataFrame) -> tuple[float, float]:
    """Triple P/R vs a golden set (both (subj, pred, obj))."""
    cols = ["subj", "pred", "obj"]
    g, o = got.select(cols).distinct(), golden.select(cols).distinct()
    tp = g.join(o, cols, "left_semi").count()
    n_got, n_gold = g.count(), o.count()
    return (tp / n_got if n_got else 0.0, tp / n_gold if n_gold else 0.0)


def filter_by_changed(nodes: DataFrame, edges: DataFrame, changed_files: DataFrame):
    """create_filtered_graph semantics: keep nodes whose `file` is in
    the changed set (semi-join); keep edges with either endpoint
    kept. changed_files: DataFrame[file STRING]."""
    kept_nodes = nodes.join(F.broadcast(changed_files), "file", "left_semi")
    keys = kept_nodes.select("node_key")
    kept_edges = edges.join(
        F.broadcast(keys.withColumnRenamed("node_key", "source_key")), "source_key", "left_semi"
    ).unionByName(
        edges.join(
            F.broadcast(keys.withColumnRenamed("node_key", "target_key")), "target_key", "left_semi"
        )
    ).dropDuplicates(["edge_type", "source_key", "target_key"])
    return kept_nodes, kept_edges


def clean_graph(
    nodes: DataFrame,
    edges: DataFrame,
    parent_type: str,
    child_type: str,
    child_meta_key: str = "parent",
):
    """filter_out_nodes_without_children (array_graph.rs:527-586,
    invoked at the end of every reference build, core.rs:876-881):
    remove parent_type nodes that no child_type node references by
    NAME via meta[child_meta_key], then cascade-delete every edge
    touching a removed node.

    Scale shape: the kept-parent-name set comes from a distinct over
    the children's extracted meta value (one shuffle on the name);
    the removed-key set is small (childless parents) and broadcast
    into both anti-joins, so the edge table is never shuffled.
    """
    from .queryops import meta_value

    referenced = (
        nodes.where(F.col("node_type") == child_type)
        .selectExpr(f"{meta_value(child_meta_key)} AS name")
        .where(F.col("name") != "")
        .distinct()
    )
    removed = (
        nodes.where(F.col("node_type") == parent_type)
        .join(referenced, "name", "left_anti")
        .select("node_key")
    )
    kept_nodes = nodes.join(F.broadcast(removed), "node_key", "left_anti")
    kept_edges = edges.join(
        F.broadcast(removed.withColumnRenamed("node_key", "source_key")),
        "source_key",
        "left_anti",
    ).join(
        F.broadcast(removed.withColumnRenamed("node_key", "target_key")),
        "target_key",
        "left_anti",
    ).select("edge_type", "source_key", "target_key")
    return kept_nodes, kept_edges


def process_endpoint_groups(nodes: DataFrame, edges: DataFrame):
    """Endpoint group rewrite (array_graph.rs:187-228): every
    Endpoint node carrying a `group` meta gets its name prefixed with
    the group, which CHANGES its node_key — so every edge referencing
    the old key is rewritten to the new one (the reference mutates
    names then renames edge sources in place; here both are
    recomputed as projections + a broadcast key-map join).

    Returns (nodes, edges) with rewritten endpoints. The key map is
    |endpoints-with-groups| rows — broadcast; the edge table is never
    shuffled.
    """
    from ..functions.keys import node_key
    from .queryops import meta_value

    grouped = nodes.where(
        (F.col("node_type") == "Endpoint") & F.expr(f"{meta_value('group')} != ''")
    )
    keymap = grouped.select(
        F.col("node_key").alias("old_key"),
        node_key(
            F.col("node_type"),
            F.expr(f"{meta_value('group')} || name"),
            F.col("file"),
            F.col("start"),
            F.expr(meta_value("verb")),
        ).alias("new_key"),
    )
    km = F.broadcast(keymap)

    rewritten = (
        nodes.join(km, nodes["node_key"] == km["old_key"], "left")
        .withColumn(
            "name",
            F.when(
                F.col("old_key").isNotNull(),
                F.expr(f"{meta_value('group')} || name"),
            ).otherwise(F.col("name")),
        )
        .withColumn("node_key", F.coalesce("new_key", "node_key"))
        .drop("old_key", "new_key")
    )
    src_map = km.selectExpr("old_key AS source_key", "new_key AS new_src")
    dst_map = km.selectExpr("old_key AS target_key", "new_key AS new_dst")
    new_edges = (
        edges.join(src_map, "source_key", "left")
        .join(dst_map, "target_key", "left")
        .select(
            "edge_type",
            F.coalesce("new_src", "source_key").alias("source_key"),
            F.coalesce("new_dst", "target_key").alias("target_key"),
        )
    )
    return rewritten, new_edges


def conv_rollup(transcripts: DataFrame, role: str = "user") -> DataFrame:
    """Ordered per-conversation rollup of one role's turn texts:
    sort_array(collect_list(struct(turn_idx, text))) then join with
    newline — deterministic under parallelism because ordering comes
    from keys, not arrival order (the reference sorts sections by
    start before concatenation, builder/utils.rs:44-56)."""
    return (
        transcripts.where(F.col("role") == role)
        .groupBy("conv_id")
        .agg(
            F.expr(
                "array_join(transform(sort_array(collect_list(struct(turn_idx, text))),"
                " s -> s.text), '\\n') AS rolled"
            ),
            F.expr("CAST(count(*) AS BIGINT) AS n_turns"),
        )
    )


def prev_system_turn(transcripts: DataFrame) -> DataFrame:
    """For every turn, the turn_idx of the nearest PRECEDING system
    turn in its conversation (null if none) — running conditional max
    over the conv window."""
    w = (
        Window.partitionBy("conv_id")
        .orderBy("turn_idx")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return transcripts.select(
        "conv_id",
        "turn_idx",
        "role",
        F.max(F.when(F.col("role") == "system", F.col("turn_idx"))).over(w).alias("prev_system_idx"),
    )
