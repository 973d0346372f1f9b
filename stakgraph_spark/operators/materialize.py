"""Typed node/edge materialization (the graph tables).

Produces the two output tables mirroring the reference schema
(SURVEY.md §1.3; NodeData ast/src/lang/asg.rs:66-82):

  nodes(node_key, node_type, name, file, start)   [+ body/meta at sink]
  edges(edge_type, source_key, target_key)

Identity follows the reference exactly: node_key recipe
(utils.rs:67-90), edge dedup on (src, dst, type)
(array_graph.rs:775-781) — the reference's bulk edge write is CREATE
not MERGE (neo4j_utils.rs:169-175), so dedup MUST happen here.

Edge families (reference predicate vocabulary, mod.rs:71-88):
  CONTAINS  corpus->conversation->turn scaffold
  USES      turn -> canonical entity (linked mention)
  CALLS     turn -> tool Library; turn -> Endpoint (path-normalized
            link_api_nodes analog, linker.rs:129-163); turn -> turn
            (shared-test-id link, linker.rs:56-127)
  HANDLER   endpoint -> first referencing turn (handler_finder
            analog, queries/mod.rs:208-223)
  OF        alias-member entity -> canonical entity (Instance->Class
            analog, array_graph.rs:268-283)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.keys import node_key, node_key_sql
from ..sources import entities as E
from . import canon as canon_op
from . import extract as X
from . import link as L

REPO_KEY = "repository-corpus-corpus-0"


# Key expressions are built as SQL strings (one F.expr bridge call)
# rather than nested Column ops: the sandbox py4j bridge costs ~6ms
# per Column call, and node_key expands to ~16 nested calls — across
# the 8 edge/node families that is seconds of pure driver latency.

def _conv_key_sql(conv: str) -> str:
    return node_key_sql("'File'", conv, f"'corpus/' || {conv}", "0", "spark")


def _turn_key_sql(conv: str, turn: str) -> str:
    return node_key_sql(
        "'Function'",
        f"'turn_' || CAST({turn} AS STRING)",
        f"'corpus/' || {conv}",
        turn,
        "spark",
    )


def all_entities(spark: SparkSession) -> DataFrame:
    """entities + tools + endpoints with their node types."""
    return (
        E.entities_df(spark)
        .unionByName(E.tools_df(spark))
        .unionByName(
            E.endpoints_df(spark).select(
                "entity_id", "canonical_name", F.lit("Endpoint").alias("entity_type")
            )
        )
    )


_ENTITY_NODES_CACHE: dict[int, DataFrame] = {}


def entity_nodes(spark: SparkSession) -> DataFrame:
    """(node_key, node_type, name, file, start, canon_id) for every
    dictionary entity, with its canonical component id.

    The dictionary is STATIC driver data (Python lists in
    sources/entities.py), so this is computed entirely on the driver
    — union-find over SAME_AS plus the node_key recipe — and handed
    to Spark as one LocalRelation: zero Spark jobs, broadcastable
    as-is. The distributed canonical_map operator exists for
    dictionaries that are themselves tables (and is exercised by
    tests/bench); routing 28 static rows through it costs seconds of
    task-scheduling per session for no data.
    """
    key = id(spark)
    if key in _ENTITY_NODES_CACHE:
        return _ENTITY_NODES_CACHE[key]

    from ..functions.keys import node_key_py

    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.get(x, x) != x:
            x = parent[x]
        return x

    for a, b in E.SAME_AS:
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = min(ra, rb), max(ra, rb)
            parent[hi] = lo

    ents = (
        list(E.ENTITIES)
        + list(E.TOOLS)
        + [(i, E.endpoint_name(v, s), "Endpoint") for i, v, s in E.ENDPOINTS]
    )
    rows = [
        (node_key_py(t, n, "entities", i), t, n, "entities", i, find(i))
        for i, n, t in ents
    ]
    lit = spark.createDataFrame(
        rows,
        "node_key STRING, node_type STRING, name STRING, file STRING, start INT, canon_id INT",
    )
    _ENTITY_NODES_CACHE[key] = lit
    return lit


def _entity_nodes_uncached(spark: SparkSession) -> DataFrame:
    ents = all_entities(spark)
    cmap = canon_op.canonical_map(ents.select("entity_id"), E.same_as_df(spark))
    return ents.join(cmap, "entity_id").select(
        node_key(F.col("entity_type"), F.col("canonical_name"), F.lit("entities"), F.col("entity_id")).alias("node_key"),
        F.col("entity_type").alias("node_type"),
        F.col("canonical_name").alias("name"),
        F.lit("entities").alias("file"),
        F.col("entity_id").cast("int").alias("start"),
        F.col("canon_id"),
    )


def build_nodes(spark: SparkSession, transcripts: DataFrame, ent_nodes: DataFrame) -> DataFrame:
    repo = spark.createDataFrame(
        [(REPO_KEY, "Repository", "corpus", "corpus", 0)],
        "node_key STRING, node_type STRING, name STRING, file STRING, start INT",
    )
    convs = (
        transcripts.select("conv_id")
        .distinct()
        .selectExpr(
            f"{_conv_key_sql('conv_id')} AS node_key",
            "'File' AS node_type",
            "conv_id AS name",
            "'corpus/' || conv_id AS file",
            "0 AS start",
        )
    )
    turns = transcripts.selectExpr(
        f"{_turn_key_sql('conv_id', 'turn_idx')} AS node_key",
        "'Function' AS node_type",
        "'turn_' || CAST(turn_idx AS STRING) AS name",
        "'corpus/' || conv_id AS file",
        "turn_idx AS start",
    )
    ents = ent_nodes.select("node_key", "node_type", "name", "file", "start")
    return repo.unionByName(convs).unionByName(turns).unionByName(ents)


def build_edges(
    spark: SparkSession, transcripts: DataFrame, resolved: DataFrame, ent_nodes: DataFrame
) -> DataFrame:
    """All edge families, deduped on (edge_type, source_key, target_key)."""
    en = ent_nodes.select(F.col("start").alias("eid"), "node_key", "canon_id")
    en_b = F.broadcast(en)

    contains_repo = (
        transcripts.select("conv_id")
        .distinct()
        .selectExpr(
            "'CONTAINS' AS edge_type",
            f"'{REPO_KEY}' AS source_key",
            f"{_conv_key_sql('conv_id')} AS target_key",
        )
    )
    contains_turn = transcripts.selectExpr(
        "'CONTAINS' AS edge_type",
        f"{_conv_key_sql('conv_id')} AS source_key",
        f"{_turn_key_sql('conv_id', 'turn_idx')} AS target_key",
    )

    # USES: resolved mention -> canonical entity node. Two broadcast
    # hops: entity -> canon_id -> canonical entity's node_key. Dedup
    # happens HERE on the narrow (conv_id, turn_idx, canon_key)
    # columns — a distinct whose ClusteredDistribution is satisfied
    # by the conv_id hash partitioning the transcripts already carry,
    # i.e. map-side only, no shuffle — and BEFORE the wide node_key
    # strings are materialized.
    canon_key = F.broadcast(
        en.select(F.col("eid").alias("canon_id"), F.col("node_key").alias("canon_key"))
    )
    uses = (
        resolved.join(en_b, resolved["entity_id"] == en["eid"])
        .join(canon_key, "canon_id")
        .select("conv_id", "turn_idx", "canon_key")
        .distinct()
        .selectExpr(
            "'USES' AS edge_type",
            f"{_turn_key_sql('conv_id', 'turn_idx')} AS source_key",
            "canon_key AS target_key",
        )
    )

    tools = F.broadcast(E.tools_df(spark))
    calls_tool = (
        X.extract_tool_calls(transcripts)
        .join(tools, F.col("toolname") == tools["canonical_name"])
        .join(en_b, F.col("entity_id") == en["eid"])
        .select("conv_id", "turn_idx", "node_key")
        .distinct()
        .selectExpr(
            "'CALLS' AS edge_type",
            f"{_turn_key_sql('conv_id', 'turn_idx')} AS source_key",
            "node_key AS target_key",
        )
    )

    eps = F.broadcast(E.endpoints_df(spark))
    requests = X.extract_requests(transcripts)
    req_matched = requests.join(
        eps,
        (requests["verb"] == eps["verb"])
        & (F.concat(F.lit("/api/"), eps["seg"], F.lit("/:param")) == requests["norm_path"]),
    ).join(en_b, F.col("entity_id") == en["eid"])
    # consumed by both calls_ep and handler: cache so the extraction
    # scan runs once per action (MEMORY_AND_DISK default).
    req_matched = req_matched.persist()
    calls_ep = req_matched.select("conv_id", "turn_idx", "node_key").distinct().selectExpr(
        "'CALLS' AS edge_type",
        f"{_turn_key_sql('conv_id', 'turn_idx')} AS source_key",
        "node_key AS target_key",
    )

    # shared-test-id link: referencing turn -> globally-first defining
    # turn (deterministic pick => parallelism-invariant).
    defs = X.extract_test_defs(transcripts)
    w_def = Window.partitionBy("tid").orderBy("conv_id", "turn_idx")
    first_def = (
        defs.withColumn("rk", F.row_number().over(w_def))
        .where(F.col("rk") == 1)
        .select("tid", F.col("conv_id").alias("d_conv"), F.col("turn_idx").alias("d_turn"))
    )
    calls_test = (
        X.extract_test_refs(transcripts)
        .join(F.broadcast(first_def), "tid")
        .select("conv_id", "turn_idx", "d_conv", "d_turn")
        .distinct()
        .selectExpr(
            "'CALLS' AS edge_type",
            f"{_turn_key_sql('conv_id', 'turn_idx')} AS source_key",
            f"{_turn_key_sql('d_conv', 'd_turn')} AS target_key",
        )
    )

    # HANDLER: endpoint -> globally-first referencing turn. Derived
    # from req_matched (match is 1:1 per request row) so the requests
    # subtree appears exactly once in the final plan.
    w_req = Window.partitionBy("entity_id").orderBy("conv_id", "turn_idx")
    handler = (
        req_matched.withColumn("rk", F.row_number().over(w_req))
        .where(F.col("rk") == 1)
        .selectExpr(
            "'HANDLER' AS edge_type",
            "node_key AS source_key",
            f"{_turn_key_sql('conv_id', 'turn_idx')} AS target_key",
        )
    )

    of_edges = (
        ent_nodes.where(F.col("canon_id") != F.col("start"))
        .join(canon_key, "canon_id")
        .selectExpr(
            "'OF' AS edge_type",
            "node_key AS source_key",
            "canon_key AS target_key",
        )
    )

    # Edge dedup (reference identity src-dst-type, array_graph.rs:
    # 775-781) is done PER FAMILY on narrow conv_id-prefixed columns
    # above — map-side only under the conv_id partitioning, before
    # wide key strings exist. Families cannot collide across the
    # union (CONTAINS/OF/HANDLER are unique by construction; the
    # three CALLS families target disjoint key spaces: Library,
    # Endpoint, and turn nodes), so no global dropDuplicates — at
    # 10^12 turns that global shuffle of every edge was the single
    # largest cost of the build.
    return (
        contains_repo.unionByName(contains_turn)
        .unionByName(uses)
        .unionByName(calls_tool)
        .unionByName(calls_ep)
        .unionByName(calls_test)
        .unionByName(handler)
        .unionByName(of_edges)
    )


def triples(edges: DataFrame) -> DataFrame:
    """The P/R-gated view: (subj, pred, obj)."""
    return edges.select(
        F.col("source_key").alias("subj"),
        F.col("edge_type").alias("pred"),
        F.col("target_key").alias("obj"),
    )


def uses_by_entity(resolved: DataFrame, ent_nodes: DataFrame) -> DataFrame:
    """USES count per canonical entity — the skew-facing aggregate.

    Two-phase: pre-aggregate per (conv_id, entity) — co-partitioned
    with the mention stream, so the hot entity contributes one row
    per conversation, not one per mention — then final rollup.
    """
    per_conv = resolved.groupBy("conv_id", "entity_id").agg(F.count("*").alias("n"))
    en = F.broadcast(ent_nodes.select(F.col("start").alias("entity_id"), "canon_id"))
    names = F.broadcast(
        ent_nodes.select(F.col("start").alias("canon_id"), F.col("name").alias("canonical_name"))
    )
    return (
        per_conv.join(en, "entity_id")
        .groupBy("canon_id")
        .agg(F.sum("n").cast("bigint").alias("n_uses"))
        .join(names, "canon_id")
        .select(F.col("canon_id"), F.col("canonical_name"), F.col("n_uses"))
    )
