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

from ..functions.keys import node_key
from ..sources import entities as E
from . import canon as canon_op
from . import extract as X
from . import link as L

REPO_KEY = "repository-corpus-corpus-0"


def _conv_key(conv):
    return node_key(F.lit("File"), conv, F.concat(F.lit("corpus/"), conv), F.lit(0))


def _turn_key(conv, turn):
    return node_key(
        F.lit("Function"),
        F.concat(F.lit("turn_"), turn.cast("string")),
        F.concat(F.lit("corpus/"), conv),
        turn,
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

    The dictionary is static within a session, so the CC result is
    computed once and collected back to a literal DataFrame (28
    rows) — the iterative canonical_map operator itself stays fully
    distributed and is exercised directly by tests/bench.
    """
    key = id(spark)
    if key in _ENTITY_NODES_CACHE:
        return _ENTITY_NODES_CACHE[key]
    df = _entity_nodes_uncached(spark)
    lit = spark.createDataFrame(
        df.collect(),
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
        .select(
            _conv_key(F.col("conv_id")).alias("node_key"),
            F.lit("File").alias("node_type"),
            F.col("conv_id").alias("name"),
            F.concat(F.lit("corpus/"), F.col("conv_id")).alias("file"),
            F.lit(0).alias("start"),
        )
    )
    turns = transcripts.select(
        _turn_key(F.col("conv_id"), F.col("turn_idx")).alias("node_key"),
        F.lit("Function").alias("node_type"),
        F.concat(F.lit("turn_"), F.col("turn_idx").cast("string")).alias("name"),
        F.concat(F.lit("corpus/"), F.col("conv_id")).alias("file"),
        F.col("turn_idx").alias("start"),
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
        .select(
            F.lit("CONTAINS").alias("edge_type"),
            F.lit(REPO_KEY).alias("source_key"),
            _conv_key(F.col("conv_id")).alias("target_key"),
        )
    )
    contains_turn = transcripts.select(
        F.lit("CONTAINS").alias("edge_type"),
        _conv_key(F.col("conv_id")).alias("source_key"),
        _turn_key(F.col("conv_id"), F.col("turn_idx")).alias("target_key"),
    )

    # USES: resolved mention -> canonical entity node. Two broadcast
    # hops: entity -> canon_id -> canonical entity's node_key.
    canon_key = F.broadcast(
        en.select(F.col("eid").alias("canon_id"), F.col("node_key").alias("canon_key"))
    )
    uses = (
        resolved.join(en_b, resolved["entity_id"] == en["eid"])
        .join(canon_key, "canon_id")
        .select(
            F.lit("USES").alias("edge_type"),
            _turn_key(F.col("conv_id"), F.col("turn_idx")).alias("source_key"),
            F.col("canon_key").alias("target_key"),
        )
    )

    tools = F.broadcast(E.tools_df(spark))
    calls_tool = (
        X.extract_tool_calls(transcripts)
        .join(tools, F.col("toolname") == tools["canonical_name"])
        .join(en_b, F.col("entity_id") == en["eid"])
        .select(
            F.lit("CALLS").alias("edge_type"),
            _turn_key(F.col("conv_id"), F.col("turn_idx")).alias("source_key"),
            F.col("node_key").alias("target_key"),
        )
    )

    eps = F.broadcast(E.endpoints_df(spark))
    requests = X.extract_requests(transcripts)
    req_matched = requests.join(
        eps,
        (requests["verb"] == eps["verb"])
        & (F.concat(F.lit("/api/"), eps["seg"], F.lit("/:param")) == requests["norm_path"]),
    )
    calls_ep = req_matched.join(en_b, F.col("entity_id") == en["eid"]).select(
        F.lit("CALLS").alias("edge_type"),
        _turn_key(F.col("conv_id"), F.col("turn_idx")).alias("source_key"),
        F.col("node_key").alias("target_key"),
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
        .select(
            F.lit("CALLS").alias("edge_type"),
            _turn_key(F.col("conv_id"), F.col("turn_idx")).alias("source_key"),
            _turn_key(F.col("d_conv"), F.col("d_turn")).alias("target_key"),
        )
    )

    # HANDLER: endpoint -> globally-first referencing turn.
    w_req = Window.partitionBy("verb", "norm_path").orderBy("conv_id", "turn_idx")
    first_req = (
        requests.withColumn("rk", F.row_number().over(w_req)).where(F.col("rk") == 1).drop("rk")
    )
    handler = (
        first_req.join(
            eps,
            (first_req["verb"] == eps["verb"])
            & (F.concat(F.lit("/api/"), eps["seg"], F.lit("/:param")) == first_req["norm_path"]),
        )
        .join(en_b, F.col("entity_id") == en["eid"])
        .select(
            F.lit("HANDLER").alias("edge_type"),
            F.col("node_key").alias("source_key"),
            _turn_key(F.col("conv_id"), F.col("turn_idx")).alias("target_key"),
        )
    )

    of_edges = (
        ent_nodes.where(F.col("canon_id") != F.col("start"))
        .join(canon_key, "canon_id")
        .select(
            F.lit("OF").alias("edge_type"),
            F.col("node_key").alias("source_key"),
            F.col("canon_key").alias("target_key"),
        )
    )

    all_edges = (
        contains_repo.unionByName(contains_turn)
        .unionByName(uses)
        .unionByName(calls_tool)
        .unionByName(calls_ep)
        .unionByName(calls_test)
        .unionByName(handler)
        .unionByName(of_edges)
    )
    return all_edges.dropDuplicates(["edge_type", "source_key", "target_key"])


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
