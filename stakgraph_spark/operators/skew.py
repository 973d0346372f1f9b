"""Skew handling — explicit salting primitives.

The north rule requires explicit skew handling beyond AQE's runtime
skew-join splitting. Two shapes are packaged here; the rest of the
engine's skew strategy is structural (two-phase pre-aggregation in
uses_by_entity, broadcast dims everywhere a dictionary is joined).

  salted_join        big-big equi-join robust to hot keys: the left
                     (large, skewed) side gets a deterministic salt;
                     the right side is replicated once per salt, so a
                     hot key's rows spread over n_salts reducers
                     instead of landing on one.
  salted_count       per-key counts of a skewed column: partial
                     count per (key, salt) then rollup — the manual
                     form of map-side combine for operators (e.g.
                     collect-based aggs) that lack one.

Salts are DETERMINISTIC (hash of caller-named columns), never
rand() — output must be parallelism-invariant and resumable
(SURVEY.md §7 hard parts).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

N_SALTS = 16


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    salt_cols: list[str],
    n_salts: int = N_SALTS,
    how: str = "inner",
) -> DataFrame:
    """Equi-join on `key` where `left` is large and skewed on it.

    left rows get salt = xxhash64(salt_cols) % n_salts (salt_cols
    must be left columns that spread a hot key's rows, e.g. the row's
    own id); right is exploded once per salt value. The join key
    becomes (key, salt): a key carried by 10^9 left rows now hashes
    to n_salts distinct reducer buckets. Right-side replication costs
    n_salts x |right| — use for big-big joins where `right` is too
    big to broadcast but replication is still cheap relative to the
    skewed shuffle.
    """
    salted_left = left.withColumn(
        "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in salt_cols]), F.lit(n_salts)).cast("int")
    )
    salted_right = right.withColumn(
        "_salt", F.explode(F.expr(f"sequence(0, {n_salts - 1})"))
    ).withColumn("_salt", F.col("_salt").cast("int"))
    return salted_left.join(salted_right, [key, "_salt"], how).drop("_salt")


def salted_count(
    df: DataFrame, key: str, salt_cols: list[str], n_salts: int = N_SALTS
) -> DataFrame:
    """count(*) per `key` via an explicit two-phase (key, salt)
    pre-aggregation — the structural fix for hot keys in aggregations
    whose combine step would otherwise see one monster partition."""
    return (
        df.withColumn(
            "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in salt_cols]), F.lit(n_salts)).cast("int")
        )
        .groupBy(key, "_salt")
        .agg(F.count("*").alias("_n"))
        .groupBy(key)
        .agg(F.sum("_n").cast("bigint").alias("n"))
    )
