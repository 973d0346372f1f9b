"""Transcript source: (conv_id, turn_idx, role, text, tool, ts).

The engine's input is a table of multi-turn conversation/agent
transcripts. In production this is an Iceberg table bucketed by
conv_id; in this sandbox we derive it deterministically from the
driver-provided `events` parquet (no external data), with an exactly
equivalent SQL rendering for the DuckDB oracle
(stakgraph_spark/sql/templates.py). The derivation plants ground
truth — which entity/tool/endpoint/test-id each turn mentions — so
golden triples are known by construction (FIXTURES.md §1).

Derivation (pure function of events rows — parallelism-invariant):
  conv_id  = 'conv_' || lpad(user_id, 6, '0')
  turn_idx = row_number() over (partition by user_id
                                order by ts, event_id) - 1
  role     = click/view->user, signup->system, error->tool,
             purchase->assistant
  text     = role-templated synthesis embedding deterministic
             '@alias' mentions (Zipf-skewed: ~40% of picks hit
             entity 0), tool:name(...) calls, 'VERB /api/seg/<id>'
             requests, and test_<k> ids
  tool     = tool name for tool turns else ''

Scale note: row_number over (user_id) is the one shuffle here; at
10^12 turns the input would already be bucketed by conv_id with
turn_idx present, so this stage disappears — it exists only to
manufacture the input shape from the sandbox tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources import entities as E

TRANSCRIPT_SCHEMA = "conv_id STRING, turn_idx INT, role STRING, text STRING, tool STRING, ts TIMESTAMP"


def _ev0(events: DataFrame) -> DataFrame:
    """Deterministic per-event picks (shared with the oracle SQL)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return events.select(
        "event_id",
        "user_id",
        "event_type",
        "ts",
        (F.row_number().over(w) - F.lit(1)).cast("int").alias("turn_idx"),
        F.when(F.col("event_type").isin("click", "view"), "user")
        .when(F.col("event_type") == "signup", "system")
        .when(F.col("event_type") == "error", "tool")
        .otherwise("assistant")
        .alias("role"),
        F.when(F.col("event_id") % 5 < 2, F.lit(0))
        .otherwise((F.col("event_id") % 997) % E.N_MENTIONABLE)
        .cast("int")
        .alias("ent_idx"),
        ((F.col("event_id") % 9) % 3).cast("int").alias("alias_idx"),
        ((F.col("event_id") % 13) % E.N_MENTIONABLE).cast("int").alias("ent2_idx"),
        (F.col("event_id") % 50).cast("int").alias("tid"),
        (F.col("event_id") % 1000).cast("int").alias("resid"),
        (F.lit(100) + F.col("event_id") % 5).cast("int").alias("ep_id"),
        F.when(F.col("event_id") % 3 == 0, "search")
        .when(F.col("event_id") % 3 == 1, "fetch")
        .otherwise("calc")
        .alias("toolname"),
    )


def derive_transcripts(spark: SparkSession, events: DataFrame) -> DataFrame:
    """events -> transcripts. Dictionary joins are broadcast (tiny dims)."""
    ev0 = _ev0(events)
    a1 = F.broadcast(E.aliases_df(spark)).alias("a1")
    a2 = F.broadcast(E.aliases_df(spark).where(F.col("alias_idx") == 0)).alias("a2")
    ep = F.broadcast(E.endpoints_df(spark)).alias("ep")

    j = (
        ev0.alias("e")
        .join(a1, (F.col("a1.entity_id") == F.col("e.ent_idx")) & (F.col("a1.alias_idx") == F.col("e.alias_idx")))
        .join(a2, F.col("a2.entity_id") == F.col("e.ent2_idx"))
        .join(ep, F.col("ep.entity_id") == F.col("e.ep_id"))
    )

    eid = F.col("e.event_id").cast("string")
    tid = F.col("e.tid").cast("string")
    user_text = F.concat(
        F.lit("u"), eid, F.lit(" please check @"), F.col("a1.alias"),
        F.when(F.col("e.event_id") % 4 == 0, F.concat(F.lit(" and @"), F.col("a2.alias"))).otherwise(""),
        F.when(F.col("e.event_id") % 17 == 0, F.lit(" cf @AuthCore")).otherwise(""),
        F.lit(" thanks"),
    )
    system_text = F.concat(F.lit("sys "), eid, F.lit(" defines test_"), tid)
    tool_text = F.concat(
        F.lit("tool:"), F.col("e.toolname"), F.lit('(q="@'), F.col("a1.alias"), F.lit('") -> ok T'), tid
    )
    assistant_text = F.concat(
        F.lit("a"), eid, F.lit(" used @"), F.col("a1.alias"), F.lit(" via "),
        F.col("ep.verb"), F.lit(" /api/"), F.col("ep.seg"), F.lit("/"),
        F.col("e.resid").cast("string"), F.lit(" ref test_"), tid,
    )

    return j.select(
        F.concat(F.lit("conv_"), F.lpad(F.col("e.user_id").cast("string"), 6, "0")).alias("conv_id"),
        F.col("e.turn_idx").alias("turn_idx"),
        F.col("e.role").alias("role"),
        F.when(F.col("e.role") == "user", user_text)
        .when(F.col("e.role") == "system", system_text)
        .when(F.col("e.role") == "tool", tool_text)
        .otherwise(assistant_text)
        .alias("text"),
        F.when(F.col("e.role") == "tool", F.col("e.toolname")).otherwise(F.lit("")).alias("tool"),
        F.col("e.ts").alias("ts"),
    )


def read_transcripts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Standard entry: transcripts for a testdata scale-factor dir."""
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    return derive_transcripts(spark, events)


def synthetic_events(spark: SparkSession, n_events: int, n_users: int) -> DataFrame:
    """Deterministic synthetic events at arbitrary scale (seedless —
    a pure function of the row id), for bench/scaling/resume tests
    beyond the provided scale factors. Same schema as the testdata
    events table.
    """
    r = spark.range(0, n_events, 1)
    return r.select(
        F.col("id").alias("event_id"),
        (F.col("id") % n_users).cast("long").alias("user_id"),
        F.element_at(
            F.array(F.lit("click"), F.lit("view"), F.lit("signup"), F.lit("error"), F.lit("purchase")),
            (F.col("id") % 5 + 1).cast("int"),
        ).alias("event_type"),
        (F.round(F.col("id") * 0.37 % 1000, 2) + 1.0).alias("value"),
        F.concat(F.lit('{"k": '), (F.col("id") % 100).cast("string"), F.lit("}")).alias("props"),
        F.expr("timestamp'2024-01-01 00:00:00' + make_interval(0, 0, 0, 0, 0, 0, id * 7)").alias("ts"),
    ).select("event_id", "ts", "user_id", "event_type", "value", "props")
