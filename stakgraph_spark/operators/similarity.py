"""Similarity search over the `embeddings` table
(vec_id, embedding array<float>, label).

Mirrors the reference's vector search (cosine >= 0.7 threshold,
mcp/src/graph/queries.ts:308-326; embeddings 384-d in
ast/src/lang/embedding.rs — here the driver tables carry 64-d).

Paths:
  * brute-force: normalized dot product via JVM higher-order
    functions (zip_with + aggregate) — the exactness baseline.
  * LSH-bucketed (random-hyperplane signs): the scale path — only
    vectors sharing a signature bucket are compared. Hyperplanes are
    deterministic (seedless hash of (dim, plane)), so output is
    reproducible and oracle-checkable.

All arithmetic is cast to double FIRST and summed in index order so
DuckDB reproduces results bit-for-bit before rounding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DIM = 64
N_PLANES = 8  # LSH signature bits

DOT = "aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
NORM = "sqrt(aggregate({a}, CAST(0.0 AS DOUBLE), (acc, v) -> acc + CAST(v AS DOUBLE) * CAST(v AS DOUBLE)))"


def normalized(embeddings: DataFrame) -> DataFrame:
    """-> (vec_id, label, vec array<double> L2-normalized). At scale
    this is materialized once (write-back), making every query a
    plain dot product."""
    norm = NORM.format(a="embedding")
    return embeddings.selectExpr(
        "vec_id",
        "label",
        f"transform(embedding, v -> CAST(v AS DOUBLE) / ({norm})) AS vec",
    )


MAX_BRUTEFORCE = 100_000  # above this corpus size all-pairs is refused


def cosine_pairs(
    embeddings: DataFrame, threshold: float = 0.9, max_bruteforce: int = MAX_BRUTEFORCE
) -> DataFrame:
    """Brute-force all-pairs cosine >= threshold — the EXACTNESS
    baseline, O(n^2) by definition. Size-gated: above max_bruteforce
    vectors the call routes to lsh_cosine_pairs (the bucketed scale
    path) instead of silently scheduling a 10^10-pair cross join.
    Callers that require exact all-pairs semantics at larger sizes
    must opt in explicitly by raising the gate.
    Output: (vec_a, vec_b, cos), vec_a < vec_b, cos rounded to 4dp."""
    if embeddings.count() > max_bruteforce:
        return lsh_cosine_pairs(embeddings, threshold)
    n = normalized(embeddings)
    a = n.selectExpr("vec_id AS vec_a", "vec AS va")
    b = n.selectExpr("vec_id AS vec_b", "vec AS vb")
    dot = DOT.format(a="va", b="vb")
    return (
        a.crossJoin(b)
        .where(F.col("vec_a") < F.col("vec_b"))
        .selectExpr("vec_a", "vec_b", f"round({dot}, 4) AS cos")
        .where(F.col("cos") >= threshold)
    )


def ann_topk(embeddings: DataFrame, query_ids: list[int], k: int = 5) -> DataFrame:
    """Brute-force top-k neighbors for the given query vec_ids:
    (query_id, vec_id, cos, rk). Deterministic: ordered by
    (cos DESC, vec_id ASC). The query side is a broadcast dim —
    at scale this is the 'small query batch x huge corpus' shape."""
    n = normalized(embeddings)
    ids = ", ".join(str(i) for i in query_ids)
    q = n.where(F.expr(f"vec_id IN ({ids})")).selectExpr("vec_id AS query_id", "vec AS qv")
    dot = DOT.format(a="qv", b="vec")
    scored = (
        F.broadcast(q).crossJoin(n)
        .where(F.col("query_id") != F.col("vec_id"))
        .selectExpr("query_id", "vec_id", f"round({dot}, 4) AS cos")
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return scored.withColumn("rk", F.row_number().over(w)).where(F.col("rk") <= k)


def _plane_expr(p: int) -> str:
    """Deterministic hyperplane p: component d = h32('p_d') scaled to
    [-1, 1). Portable: the same md5-prefix hash DuckDB computes."""
    return (
        f"transform(sequence(0, {DIM - 1}), d -> "
        f"(CAST(conv(substring(md5(concat('plane_{p}_', CAST(d AS STRING))),1,8),16,10) AS BIGINT) % 2000001 - 1000000) / 1000000.0d)"
    )


def lsh_signatures(embeddings: DataFrame) -> DataFrame:
    """-> (vec_id, label, sig int): random-hyperplane sign bits
    packed into an int. Vectors with equal signatures are near in
    angle with high probability."""
    n = normalized(embeddings)
    bits = " + ".join(
        f"(CASE WHEN {DOT.format(a='vec', b=_plane_expr(p))} >= 0 THEN {1 << p} ELSE 0 END)"
        for p in range(N_PLANES)
    )
    return n.selectExpr("vec_id", "label", f"CAST({bits} AS INT) AS sig")


def lsh_cosine_pairs(embeddings: DataFrame, threshold: float = 0.9) -> DataFrame:
    """Scale path: bucket by LSH signature, compare only within
    buckets, verify with exact cosine. Recall < 1 by design (the
    LSH trade) — the oracle checks THIS operator's own semantics
    (bucketed pairs), not brute-force equivalence."""
    sig = lsh_signatures(embeddings)
    n = normalized(embeddings).select("vec_id", "vec")
    a = sig.selectExpr("vec_id AS vec_a", "sig")
    b = sig.selectExpr("vec_id AS vec_b", "sig")
    cand = a.join(b, "sig").where(F.col("vec_a") < F.col("vec_b")).select("vec_a", "vec_b")
    dot = DOT.format(a="va", b="vb")
    return (
        cand.join(n.selectExpr("vec_id AS vec_a", "vec AS va"), "vec_a")
        .join(n.selectExpr("vec_id AS vec_b", "vec AS vb"), "vec_b")
        .selectExpr("vec_a", "vec_b", f"round({dot}, 4) AS cos")
        .where(F.col("cos") >= threshold)
    )


N_CENTROIDS = 16
NPROBE = 4


def ivf_assignments(embeddings: DataFrame, n_centroids: int = N_CENTROIDS) -> DataFrame:
    """IVF coarse quantizer: corpus vectors assigned to their nearest
    centroid. Centroids are DETERMINISTIC — the (normalized) vectors
    with the n_centroids smallest vec_ids stand in for k-means
    training, keeping the operator reproducible and oracle-checkable.
    -> (vec_id, cid). One broadcast of the centroid dim; assignment
    is an argmax struct aggregate (ties -> smaller cid)."""
    n = normalized(embeddings)
    cents = F.broadcast(
        n.where(F.col("vec_id") < n_centroids).selectExpr("vec_id AS cid", "vec AS cvec")
    )
    dot = DOT.format(a="vec", b="cvec")
    return (
        n.select("vec_id", "vec")
        .crossJoin(cents)
        .selectExpr("vec_id", "cid", f"round({dot}, 4) AS d")
        .groupBy("vec_id")
        .agg(F.expr("max(struct(d, -cid AS ncid, cid)) AS best"))
        .selectExpr("vec_id", "best.cid AS cid")
    )


def ivf_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 5,
    n_centroids: int = N_CENTROIDS,
    nprobe: int = NPROBE,
) -> DataFrame:
    """IVF approximate top-k: each query probes its `nprobe` nearest
    centroids and scans ONLY those inverted lists — the corpus scan
    per query shrinks from |corpus| to ~nprobe/n_centroids of it,
    and the candidate join is a partitioned equi-join on the
    centroid id (the 100 TB shape: the corpus-side assignment table
    is bucketed by cid at rest). Recall < 1 vs brute force by design
    (the LSH trade with a different geometry). Deterministic:
    (cos DESC, vec_id ASC) ordering, self excluded.
    Output: (query_id, vec_id, cos, rk).
    """
    from pyspark.sql import Window

    n = normalized(embeddings)
    assign = ivf_assignments(embeddings, n_centroids)
    cents = F.broadcast(
        n.where(F.col("vec_id") < n_centroids).selectExpr("vec_id AS cid", "vec AS cvec")
    )
    ids = ", ".join(str(i) for i in query_ids)
    q = n.where(F.expr(f"vec_id IN ({ids})")).selectExpr("vec_id AS query_id", "vec AS qv")
    qdot = DOT.format(a="qv", b="cvec")
    # argmax/rank over ROUNDED dots on both engines: sub-1e-4 float
    # summation differences must not flip a centroid pick
    w_probe = Window.partitionBy("query_id").orderBy(F.desc("qd"), F.asc("cid"))
    probes = (
        F.broadcast(q).crossJoin(cents)
        .selectExpr("query_id", "qv", "cid", f"round({qdot}, 4) AS qd")
        .withColumn("pr", F.row_number().over(w_probe))
        .where(F.col("pr") <= nprobe)
        .select("query_id", "qv", "cid")
    )
    cand = probes.join(assign, "cid").where(F.col("query_id") != F.col("vec_id"))
    cdot = DOT.format(a="qv", b="vec")
    scored = cand.join(n.select("vec_id", "vec"), "vec_id").selectExpr(
        "query_id", "vec_id", f"round({cdot}, 4) AS cos"
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return scored.withColumn("rk", F.row_number().over(w)).where(F.col("rk") <= k)
