"""Connected-component canonicalization (alias collapse).

The reference canonicalizes by exact node_key MERGE
(neo4j_utils.rs:79-86); we additionally collapse same-as alias pairs
into canonical components before materialization (north-star
requirement). Implemented as iterative hash-join min-label
propagation — the standard large-scale CC algorithm — rather than a
driver-side union-find, because at 10^9-edge alias graphs the label
table itself is distributed:

  labels(i) <- min(labels(i), min over neighbors j of labels(j))
  repeat until fixpoint (iterations ~ graph diameter).

Each round is one shuffle join on entity_id; `localCheckpoint` cuts
lineage every round so plans don't grow; convergence is detected
with a cheap changed-count aggregate. Hot components (a celebrity
entity with millions of aliases) are handled by the min-aggregate
itself being a two-phase (partial, then final) aggregation — Spark
does map-side combine for min() automatically, so a hot key
contributes one partial row per partition, not one row per edge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def canonical_map(ids: DataFrame, same_as: DataFrame, max_iter: int = 20) -> DataFrame:
    """ids(entity_id) x same_as(a, b) -> (entity_id, canon_id).

    canon_id = min entity_id reachable in the undirected same-as
    graph; identity for singletons.
    """
    sym = same_as.select("a", "b").unionByName(
        same_as.select(F.col("b").alias("a"), F.col("a").alias("b"))
    )
    labels = ids.select(
        F.col("entity_id"), F.col("entity_id").cast("int").alias("canon_id")
    )

    for _ in range(max_iter):
        neighbor_min = (
            sym.join(labels, sym["b"] == labels["entity_id"])
            .groupBy(F.col("a").alias("entity_id"))
            .agg(F.min("canon_id").alias("nmin"))
        )
        new_labels = (
            labels.join(neighbor_min, "entity_id", "left")
            .select(
                "entity_id",
                F.least(F.col("canon_id"), F.coalesce(F.col("nmin"), F.col("canon_id"))).alias(
                    "canon_id"
                ),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "entity_id")
            .where(F.col("n.canon_id") != F.col("o.canon_id"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels
