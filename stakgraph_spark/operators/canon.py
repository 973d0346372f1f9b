"""Connected-component canonicalization (alias collapse).

The reference canonicalizes by exact node_key MERGE
(neo4j_utils.rs:79-86); we additionally collapse same-as alias pairs
into canonical components before materialization (north-star
requirement): canon_id = min entity_id reachable in the undirected
same-as graph.

Size-adaptive execution — the same rule Spark applies to joins
(broadcast vs shuffle):

* same-as graph fits on the driver (< `driver_threshold` edges):
  collect + union-find, then return a literal mapping DataFrame.
  A 28-row dictionary must not pay 20 shuffle rounds of scheduling
  overhead; at local[32] the iterative path costs ~25s of pure
  task-launch latency for zero data.
* larger: distributed iterative hash-join min-label propagation —
  the standard large-scale CC algorithm (labels(i) <- min over
  neighbors until fixpoint, iterations ~ diameter). Each round is
  one shuffle join on entity_id; `localCheckpoint` cuts lineage per
  round; map-side combine on min() keeps hot components (a celebrity
  entity with millions of aliases) from skewing the shuffle — a hot
  key contributes one partial row per partition, not one per edge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def canonical_map(
    ids: DataFrame,
    same_as: DataFrame,
    max_iter: int = 20,
    driver_threshold: int = 1_000_000,
) -> DataFrame:
    """ids(entity_id) x same_as(a, b) -> (entity_id, canon_id)."""
    n_edges = same_as.limit(driver_threshold + 1).count()
    if n_edges <= driver_threshold:
        return _driver_union_find(ids, same_as)
    return _label_propagation(ids, same_as, max_iter)


def _driver_union_find(ids: DataFrame, same_as: DataFrame) -> DataFrame:
    spark = ids.sparkSession
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != r:
            parent[x], x = r, parent[x]
        return r

    for a, b in [(r[0], r[1]) for r in same_as.collect()]:
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            # union by min so the representative is already the min label
            lo, hi = min(ra, rb), max(ra, rb)
            parent[hi] = lo

    mapping = spark.createDataFrame(
        [(int(i[0]), find(int(i[0]))) for i in ids.collect()],
        "entity_id INT, canon_id INT",
    )
    return mapping


def _label_propagation(ids: DataFrame, same_as: DataFrame, max_iter: int) -> DataFrame:
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
            return labels
    # Exhausting max_iter with labels still moving means components
    # wider than max_iter hops exist — returning silently would be
    # silent canonicalization corruption. Raise: the caller should
    # rerun with a higher bound (or a pointer-jumping variant whose
    # round count is O(log n)).
    raise RuntimeError(
        f"label propagation did not converge within max_iter={max_iter} "
        "rounds; component diameter exceeds the bound"
    )
