"""Entity linking — the tiered resolution scorer.

Reproduces the reference's heuristic call-resolution semantics
(func_target_file_finder, ast/src/lang/call_finder.rs:20-63):

  tier 3  alias is globally unique in the dictionary
          (call_finder.rs:65-99), OR unique after excluding "mock"
          candidates (call_finder.rs:128-151) and this candidate is
          the non-mock one;
  tier 2  candidate entity has an unambiguous mention elsewhere in
          the SAME conversation (same-file tier analog,
          call_finder.rs:153-176);
  tier 1  deterministic fallback: lowest entity_id
          (same-directory-unique analog collapsed to a total order
          so output is parallelism-invariant).

Best candidate per mention = row_number over
(conv_id, turn_idx, surface) ordered by (score DESC, entity_id ASC).
Case-only variants never match: the dictionary join is exact and
case-sensitive (call_finder.rs:175 rejects case-variants).

Scale notes
-----------
* The dictionary is broadcast (it is the small dim). Mention->dict
  is therefore shuffle-free.
* The same-conv tier joins mentions to the unambiguous-mention set
  on (conv_id, entity_id): both sides are produced from data already
  partitioned by conv_id, so AQE plans a co-partitioned join.
* Hot aliases (the planted Zipf head: entity 0 appears in ~40% of
  mention turns) do NOT skew this stage because the heavy join is
  broadcast; the skew surfaces downstream in per-entity aggregations,
  which pre-aggregate per (conv_id, entity) before the global
  rollup (salted two-phase agg in materialize.uses_by_entity).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources import entities as E


def dictionary(spark: SparkSession) -> DataFrame:
    """(alias, entity_id, canonical_name, entity_type, is_mock) —
    distinct alias->entity candidate rows."""
    al = E.aliases_df(spark).select("alias", "entity_id").distinct()
    en = E.entities_df(spark)
    return al.join(en, "entity_id").select(
        "alias",
        "entity_id",
        "canonical_name",
        "entity_type",
        F.when(F.lower(F.col("canonical_name")).like("%mock%"), F.lit(1)).otherwise(0).alias("is_mock"),
    )


def alias_stats(dct: DataFrame) -> DataFrame:
    return dct.groupBy("alias").agg(
        F.count("*").cast("int").alias("n_all"),
        F.sum(F.lit(1) - F.col("is_mock")).cast("int").alias("n_nonmock"),
    )


def link_mentions(spark: SparkSession, mentions: DataFrame) -> DataFrame:
    """mentions(conv_id, turn_idx, surface) ->
    resolved(conv_id, turn_idx, surface, entity_id, score)."""
    dct = dictionary(spark)
    stats = alias_stats(dct)
    dim = F.broadcast(dct.join(stats, "alias"))

    cand = mentions.join(dim, mentions["surface"] == dim["alias"]).select(
        "conv_id", "turn_idx", "surface", "entity_id", "is_mock", "n_all", "n_nonmock"
    )

    # Unambiguous same-conv evidence, built from mentions x a
    # broadcast "unambiguous alias -> entity" dim (NOT from cand —
    # that would put the candidate subtree on both sides of the later
    # join and double-compute it within a single action).
    unamb_dim = F.broadcast(
        dct.join(stats, "alias")
        .where((F.col("n_all") == 1) | ((F.col("n_nonmock") == 1) & (F.col("is_mock") == 0)))
        .select(F.col("alias").alias("u_alias"), F.col("entity_id").alias("u_entity_id"))
    )
    unamb = (
        mentions.join(unamb_dim, mentions["surface"] == F.col("u_alias"))
        .select("conv_id", F.col("u_entity_id").alias("entity_id"))
        .distinct()
        .withColumn("in_conv", F.lit(1))
    )

    scored = cand.join(unamb, ["conv_id", "entity_id"], "left").selectExpr(
        "conv_id",
        "turn_idx",
        "surface",
        "entity_id",
        """CASE WHEN n_all = 1 THEN 3
                WHEN n_nonmock = 1 AND is_mock = 0 THEN 3
                WHEN in_conv IS NOT NULL THEN 2
                ELSE 1 END AS score""",
    )

    # Best candidate = max by (score DESC, entity_id ASC), expressed
    # as a lexicographic struct-max aggregate instead of a window
    # row_number: aggregates get map-side partial combine, so the
    # shuffle carries one row per (mention, partition) instead of
    # every scored candidate — the difference that matters when a hot
    # alias has many candidates.
    return (
        scored.groupBy("conv_id", "turn_idx", "surface")
        .agg(F.expr("max(struct(score, -entity_id AS neg_eid, entity_id AS eid)) AS best"))
        .selectExpr(
            "conv_id",
            "turn_idx",
            "surface",
            "best.eid AS entity_id",
            "best.score AS score",
        )
    )
