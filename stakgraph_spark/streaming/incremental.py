"""Resumable, incrementally-updatable graph build.

Reference semantics mirrored (SURVEY.md §2.10):
  * repository-hash checkpoint — skip unchanged units
    (standalone/src/handlers.rs:112-131; neo4j_graph.rs:183-190)
  * stage-wise streaming flush with per-stage delta buffers
    (ast/src/builder/streaming.rs:15-86)
  * incremental update: changed-file diff -> remove -> rebuild only
    changed -> re-link (graph_ops.rs:109-196)
  * async job status map (mcp/src/graph/uploads.ts:9-16)

Spark shape: the corpus is split into B conv_id hash buckets (the
unit of work, resume, and lineage). A MANIFEST parquet table records
one row per completed unit: (unit, input_fingerprint, n_nodes,
n_edges, wall_sec, completed_at). A killed run leaves whole
completed units behind; rerunning skips every unit whose fingerprint
matches — idempotent resume with byte-identical output (the
graph_accuracy.rs analog is tests/test_resume.py).

Global-vs-local decomposition: cross-conversation picks (the
globally-first test-definition turn, the globally-first endpoint
handler turn) and the static entity/repository nodes are computed in
a GLOBALS unit first — they are tiny dims — so every bucket build is
then embarrassingly parallel AND the union of units is byte-equal to
the single-shot pipeline regardless of bucket count or kill points.

At cluster scale: units = Iceberg partitions, the manifest is an
Iceberg table written transactionally with each unit (here:
directory-per-unit parquet + manifest append, same protocol).
"""

from __future__ import annotations

import os
import shutil
import time

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators import extract as X
from ..operators import link as L
from ..operators import materialize as M
from ..sources import entities as E

MANIFEST_SCHEMA = (
    "unit STRING, input_fingerprint STRING, n_nodes BIGINT, n_edges BIGINT, "
    "wall_sec DOUBLE, completed_at TIMESTAMP"
)


class KillSwitch(Exception):
    """Raised by tests to simulate a mid-run crash."""


def _unit_expr(n_buckets: int):
    return F.pmod(F.xxhash64("conv_id"), F.lit(n_buckets)).cast("int")


def global_dims(spark: SparkSession, transcripts: DataFrame) -> dict[str, DataFrame]:
    """The tiny cross-conversation dims every bucket build joins
    against: first test-definition per tid, and the HANDLER edges
    (globally-first request per endpoint)."""
    defs = X.extract_test_defs(transcripts)
    w_def = Window.partitionBy("tid").orderBy("conv_id", "turn_idx")
    first_def = (
        defs.withColumn("rk", F.row_number().over(w_def))
        .where(F.col("rk") == 1)
        .select("tid", F.col("conv_id").alias("d_conv"), F.col("turn_idx").alias("d_turn"))
    )

    en = M.entity_nodes(spark)
    eps = F.broadcast(E.endpoints_df(spark))
    requests = X.extract_requests(transcripts)
    req_matched = requests.join(
        eps,
        (requests["verb"] == eps["verb"])
        & (F.concat(F.lit("/api/"), eps["seg"], F.lit("/:param")) == requests["norm_path"]),
    ).join(
        F.broadcast(en.select(F.col("start").alias("eid"), "node_key")),
        F.col("entity_id") == F.col("eid"),
    )
    w_req = Window.partitionBy("entity_id").orderBy("conv_id", "turn_idx")
    handler_edges = (
        req_matched.withColumn("rk", F.row_number().over(w_req))
        .where(F.col("rk") == 1)
        .selectExpr(
            "'HANDLER' AS edge_type",
            "node_key AS source_key",
            f"{M._turn_key_sql('conv_id', 'turn_idx')} AS target_key",
        )
    )
    return {"first_def": first_def, "handler_edges": handler_edges}


def _build_bucket_edges(
    spark: SparkSession,
    bucket_transcripts: DataFrame,
    first_def: DataFrame,
    ent_nodes: DataFrame,
) -> DataFrame:
    """Conv-local edge families for one bucket (global families —
    HANDLER, OF — live in the globals unit)."""
    en = ent_nodes.select(F.col("start").alias("eid"), "node_key", "canon_id")
    en_b = F.broadcast(en)
    canon_key = F.broadcast(
        en.select(F.col("eid").alias("canon_id"), F.col("node_key").alias("canon_key"))
    )

    t = bucket_transcripts
    contains_repo = t.select("conv_id").distinct().selectExpr(
        "'CONTAINS' AS edge_type",
        f"'{M.REPO_KEY}' AS source_key",
        f"{M._conv_key_sql('conv_id')} AS target_key",
    )
    contains_turn = t.selectExpr(
        "'CONTAINS' AS edge_type",
        f"{M._conv_key_sql('conv_id')} AS source_key",
        f"{M._turn_key_sql('conv_id', 'turn_idx')} AS target_key",
    )
    resolved = L.link_mentions(spark, X.extract_mentions_raw(t))
    uses = (
        resolved.join(en_b, resolved["entity_id"] == en["eid"])
        .join(canon_key, "canon_id")
        .select("conv_id", "turn_idx", "canon_key")
        .distinct()
        .selectExpr(
            "'USES' AS edge_type",
            f"{M._turn_key_sql('conv_id', 'turn_idx')} AS source_key",
            "canon_key AS target_key",
        )
    )
    tools = F.broadcast(E.tools_df(spark))
    calls_tool = (
        X.extract_tool_calls(t)
        .join(tools, F.col("toolname") == tools["canonical_name"])
        .join(en_b, F.col("entity_id") == en["eid"])
        .select("conv_id", "turn_idx", "node_key")
        .distinct()
        .selectExpr(
            "'CALLS' AS edge_type",
            f"{M._turn_key_sql('conv_id', 'turn_idx')} AS source_key",
            "node_key AS target_key",
        )
    )
    eps = F.broadcast(E.endpoints_df(spark))
    requests = X.extract_requests(t)
    calls_ep = (
        requests.join(
            eps,
            (requests["verb"] == eps["verb"])
            & (F.concat(F.lit("/api/"), eps["seg"], F.lit("/:param")) == requests["norm_path"]),
        )
        .join(en_b, F.col("entity_id") == en["eid"])
        .select("conv_id", "turn_idx", "node_key")
        .distinct()
        .selectExpr(
            "'CALLS' AS edge_type",
            f"{M._turn_key_sql('conv_id', 'turn_idx')} AS source_key",
            "node_key AS target_key",
        )
    )
    calls_test = (
        X.extract_test_refs(t)
        .join(F.broadcast(first_def), "tid")
        .select("conv_id", "turn_idx", "d_conv", "d_turn")
        .distinct()
        .selectExpr(
            "'CALLS' AS edge_type",
            f"{M._turn_key_sql('conv_id', 'turn_idx')} AS source_key",
            f"{M._turn_key_sql('d_conv', 'd_turn')} AS target_key",
        )
    )
    return (
        contains_repo.unionByName(contains_turn)
        .unionByName(uses)
        .unionByName(calls_tool)
        .unionByName(calls_ep)
        .unionByName(calls_test)
    )


class ResumableBuilder:
    """Directory layout:
        out_dir/manifest/            parquet, one row per finished unit
        out_dir/nodes/unit=<u>/      parquet
        out_dir/edges/unit=<u>/      parquet
    """

    def __init__(self, out_dir: str, n_buckets: int = 8):
        self.out_dir = out_dir
        self.n_buckets = n_buckets
        self.manifest_dir = os.path.join(out_dir, "manifest")

    # -- manifest ---------------------------------------------------------
    def completed_units(self, spark: SparkSession) -> dict[str, str]:
        if not os.path.isdir(self.manifest_dir) or not os.listdir(self.manifest_dir):
            return {}
        rows = (
            spark.read.parquet(self.manifest_dir)
            .select("unit", "input_fingerprint", "completed_at")
            .collect()
        )
        # latest row wins (a unit rebuilt by an incremental update has
        # several manifest rows — full lineage is kept by design)
        out: dict[str, tuple] = {}
        for r in rows:
            if r["unit"] not in out or r["completed_at"] > out[r["unit"]][1]:
                out[r["unit"]] = (r["input_fingerprint"], r["completed_at"])
        return {u: v[0] for u, v in out.items()}

    def _record(self, spark, unit: str, fingerprint: str, n_nodes: int, n_edges: int, wall: float):
        import datetime

        row = [(unit, fingerprint, n_nodes, n_edges, round(wall, 3), datetime.datetime.now())]
        spark.createDataFrame(row, MANIFEST_SCHEMA).write.mode("append").parquet(self.manifest_dir)

    def _fingerprint(self, df: DataFrame) -> str:
        """Order-insensitive content hash of a unit's input rows —
        the repository-hash analog (handlers.rs:112-131)."""
        r = df.selectExpr(
            # bit_xor: order-insensitive, overflow-free under ANSI
            "CAST(bit_xor(xxhash64(conv_id, turn_idx, text)) AS STRING) AS h",
            "CAST(count(*) AS STRING) AS n",
        ).collect()[0]
        return f"{r['h']}:{r['n']}"

    def _write_unit(self, unit: str, nodes: DataFrame, edges: DataFrame) -> tuple[int, int]:
        ndir = os.path.join(self.out_dir, "nodes", f"unit={unit}")
        edir = os.path.join(self.out_dir, "edges", f"unit={unit}")
        # overwrite is what makes a re-run of a half-written unit safe
        nodes.write.mode("overwrite").parquet(ndir)
        edges.write.mode("overwrite").parquet(edir)
        spark = nodes.sparkSession
        return spark.read.parquet(ndir).count(), spark.read.parquet(edir).count()

    # -- build ------------------------------------------------------------
    def run(
        self,
        spark: SparkSession,
        transcripts: DataFrame,
        fail_after_units: int | None = None,
    ) -> None:
        """Build all units, skipping ones already completed with a
        matching input fingerprint. fail_after_units simulates a
        crash after that many units finish (tests)."""
        transcripts = transcripts.persist()
        done = self.completed_units(spark)
        ent_nodes = M.entity_nodes(spark)
        dims = global_dims(spark, transcripts)
        first_def = dims["first_def"].persist()
        units_done = 0

        # unit 0: globals (static nodes + global edge families)
        g_fp = self._fingerprint(transcripts)
        if done.get("globals") != g_fp:
            t0 = time.time()
            repo_and_entities = spark.createDataFrame(
                [(M.REPO_KEY, "Repository", "corpus", "corpus", 0)],
                "node_key STRING, node_type STRING, name STRING, file STRING, start INT",
            ).unionByName(ent_nodes.select("node_key", "node_type", "name", "file", "start"))
            of_edges = (
                ent_nodes.where(F.col("canon_id") != F.col("start"))
                .join(
                    ent_nodes.selectExpr("start AS canon_id", "node_key AS canon_key"),
                    "canon_id",
                )
                .selectExpr("'OF' AS edge_type", "node_key AS source_key", "canon_key AS target_key")
            )
            g_edges = of_edges.unionByName(dims["handler_edges"])
            n_n, n_e = self._write_unit("globals", repo_and_entities, g_edges)
            self._record(spark, "globals", g_fp, n_n, n_e, time.time() - t0)
            units_done += 1
            if fail_after_units is not None and units_done >= fail_after_units:
                raise KillSwitch(f"simulated crash after {units_done} units")

        # conv-hash bucket units
        for b in range(self.n_buckets):
            unit = f"b{b:04d}"
            sub = transcripts.where(_unit_expr(self.n_buckets) == b)
            fp = self._fingerprint(sub)
            if done.get(unit) == fp:
                continue
            t0 = time.time()
            nodes = M.build_nodes(spark, sub, ent_nodes).where(
                ~F.col("node_type").isin("Repository")
            ).join(
                ent_nodes.select("node_key"), "node_key", "left_anti"
            )  # conv/turn nodes only; statics live in globals
            edges = _build_bucket_edges(spark, sub, first_def, ent_nodes)
            n_n, n_e = self._write_unit(unit, nodes, edges)
            self._record(spark, unit, fp, n_n, n_e, time.time() - t0)
            units_done += 1
            if fail_after_units is not None and units_done >= fail_after_units:
                raise KillSwitch(f"simulated crash after {units_done} units")

        transcripts.unpersist()
        first_def.unpersist()

    # -- incremental update ----------------------------------------------
    def update_incremental(self, spark: SparkSession, transcripts: DataFrame) -> list[str]:
        """graph_ops.rs:109-196 analog: fingerprint each unit of the
        NEW input; rebuild only units whose fingerprint changed (the
        changed-file-diff -> remove -> rebuild flow, expressed as
        recompute of changed partitions). Returns rebuilt unit ids."""
        before = self.completed_units(spark)
        self.run(spark, transcripts)
        after = self.completed_units(spark)
        return sorted(u for u in after if before.get(u) != after[u])

    # -- read back --------------------------------------------------------
    def nodes(self, spark: SparkSession) -> DataFrame:
        return spark.read.parquet(os.path.join(self.out_dir, "nodes"))

    def edges(self, spark: SparkSession) -> DataFrame:
        return spark.read.parquet(os.path.join(self.out_dir, "edges"))

    def manifest(self, spark: SparkSession) -> DataFrame:
        return spark.read.parquet(self.manifest_dir)

    def destroy(self) -> None:
        shutil.rmtree(self.out_dir, ignore_errors=True)
