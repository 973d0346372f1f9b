"""Deduplication operators for large-scale training-data pipelines
over the `documents` table.

Five strategies, scale-ranked:
  * exact           md5-hash group-by (map-side combine; trivially
                    partitionable at 100 TB)
  * ngram_jaccard   exact similarity via shingle-inverted-index join
                    (shared-shingle candidate pairs only — never the
                    full cross product)
  * minhash_lsh     MinHash signatures + banded LSH bucketing: the
                    100 TB path. Candidate pairs come from band-key
                    equi-joins; exact Jaccard verifies.
  * simhash         32-bit SimHash + hamming-distance candidate pairs
  * embedding near-dup  cosine >= threshold over normalized vectors
                    (see similarity.py)

Everything is deterministic and built on a PORTABLE 32-bit hash
(md5-prefix → int) that evaluates identically in DuckDB, so even the
sketching stages are exact-oracle-checked:
  spark:  CAST(conv(substring(md5(s),1,8),16,10) AS BIGINT)
  duckdb: CAST('0x' || substring(md5(s),1,8) AS BIGINT)

Reference analogs: sha256 file hashing (builder/utils.rs:90-101),
dedup-by-key sets (array_graph.rs:104-124), and the
skip-if-hash-unchanged checkpoint (handlers.rs:112-131).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

H32_SPARK = "CAST(conv(substring(md5({s}),1,8),16,10) AS BIGINT)"

# MinHash parameters — shared with the oracle (sql/data_templates.py).
MINHASH_K = 16          # signature length
LSH_BANDS = 4           # bands of 4 rows each
LSH_ROWS = MINHASH_K // LSH_BANDS
MH_PRIME = 4294967311   # first prime > 2^32
# Multipliers stay < 2^29 so a*h32 + b < 2^63 — Spark 4 runs ANSI
# mode (arithmetic overflow raises), and DuckDB would overflow too.
MH_A = [100000007 + 40503 * i for i in range(MINHASH_K)]
MH_B = [2246822519 + 12289 * i for i in range(MINHASH_K)]
SHINGLE_N = 3


def exact_duplicates(documents: DataFrame) -> DataFrame:
    """-> (content_hash, n_docs, doc_ids): md5 groups with >1 member.
    doc_ids sorted and comma-joined (a string compares identically
    across engines; array renderings differ)."""
    return (
        documents.selectExpr("doc_id", "md5(text) AS content_hash")
        .groupBy("content_hash")
        .agg(
            F.expr("CAST(count(*) AS BIGINT) AS n_docs"),
            F.expr("array_join(transform(sort_array(collect_list(doc_id)), x -> CAST(x AS STRING)), ',') AS doc_ids"),
        )
        .where(F.col("n_docs") > 1)
    )


def shingles(documents: DataFrame, n: int = SHINGLE_N) -> DataFrame:
    """-> (doc_id, shingle): distinct word n-grams. Built with JVM
    higher-order functions (transform over sequence) — no Python."""
    return documents.selectExpr(
        "doc_id",
        "split(lower(trim(text)), '\\\\s+') AS w",
    ).selectExpr(
        "doc_id",
        f"explode(transform(sequence(0, greatest(size(w) - {n}, 0)), i -> concat_ws(' ', slice(w, i + 1, {n})))) AS shingle",
    ).where("shingle <> ''").distinct()


MAX_POSTING = 1000  # drop shingles shared by more than this many docs


def ngram_jaccard_pairs(
    documents: DataFrame, threshold: float = 0.6, max_posting: int = MAX_POSTING
) -> DataFrame:
    """Exact Jaccard >= threshold pairs via inverted-index self-join:
    only documents sharing >= 1 shingle are ever paired (the join is
    on the shingle key, so the cross product never materializes).
    Output: (doc_a, doc_b, jaccard), doc_a < doc_b.

    Hot-shingle cap: a boilerplate shingle shared by 10^6 docs turns
    the self-join into a 10^12-pair blowup, while contributing no
    discrimination (its posting list pairs everything with
    everything). Shingles with posting lists longer than max_posting
    are dropped BEFORE the self-join — one count aggregate (map-side
    combined) + a semi-join. Note the cap changes semantics only for
    pairs whose ONLY shared shingles are that hot (at max_posting =
    1000 such a pair has Jaccard < 1/1000 for any real document, far
    below any useful threshold). Both the intersection AND the union
    denominator are computed over the capped shingle universe, so
    jaccard is EXACT over the surviving shingles — numerator and
    denominator agree; a pair is never dropped merely because one
    side also contained hot boilerplate. At 10^12 docs use
    minhash_lsh_pairs instead.
    """
    sh = shingles(documents)
    cold = (
        sh.groupBy("shingle")
        .agg(F.count("*").alias("df"))
        .where(F.col("df") <= max_posting)
        .select("shingle")
    )
    sh_capped = sh.join(cold, "shingle", "left_semi")
    sizes = sh_capped.groupBy("doc_id").agg(F.count("*").alias("sz"))
    a = sh_capped.selectExpr("doc_id AS doc_a", "shingle")
    b = sh_capped.selectExpr("doc_id AS doc_b", "shingle")
    inter = (
        a.join(b, "shingle")
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("inter"))
    )
    return (
        inter.join(sizes.selectExpr("doc_id AS doc_a", "sz AS sz_a"), "doc_a")
        .join(sizes.selectExpr("doc_id AS doc_b", "sz AS sz_b"), "doc_b")
        .selectExpr(
            "doc_a", "doc_b",
            "floor((inter / (sz_a + sz_b - inter + 0.0d)) * 10000.0d + 0.5d) / 10000.0d AS jaccard",
        )
        .where(F.col("jaccard") >= threshold)
    )


def minhash_signatures(documents: DataFrame) -> DataFrame:
    """-> (doc_id, sig array<bigint>[MINHASH_K]): minhash over
    shingle h32 values with k independent affine hashes
    ((a*h + b) % p). One group-by; min() gets map-side combine, so
    the shuffle carries k partial minima per partition, not the
    shingle stream."""
    h = H32_SPARK.format(s="shingle")
    mins = [
        f"min(({a} * {h} + {b}) % {MH_PRIME}) AS m{i}"
        for i, (a, b) in enumerate(zip(MH_A, MH_B))
    ]
    sig = ", ".join(f"m{i}" for i in range(MINHASH_K))
    return (
        shingles(documents)
        .groupBy("doc_id")
        .agg(*[F.expr(m) for m in mins])
        .selectExpr("doc_id", f"array({sig}) AS sig")
    )


def minhash_lsh_pairs(documents: DataFrame, threshold: float = 0.6) -> DataFrame:
    """MinHash + banded LSH near-dup pairs, exact-verified.

    sign -> band keys (concat of LSH_ROWS sig values) -> equi-join
    docs sharing a band bucket -> distinct candidate pairs -> verify
    with exact Jaccard. Output: (doc_a, doc_b, jaccard).

    At 100 TB the band-key join is the only shuffle that matters;
    band keys are high-entropy (hash concat) so it is skew-free by
    construction.
    """
    sigs = minhash_signatures(documents)
    bands = sigs.selectExpr(
        "doc_id",
        f"explode(transform(sequence(0, {LSH_BANDS - 1}), "
        f"b -> struct(b AS band, concat_ws('_', slice(sig, b * {LSH_ROWS} + 1, {LSH_ROWS})) AS bkey))) AS bk",
    ).selectExpr("doc_id", "bk.band AS band", "bk.bkey AS bkey")
    cand = (
        bands.selectExpr("doc_id AS doc_a", "band", "bkey")
        .join(bands.selectExpr("doc_id AS doc_b", "band", "bkey"), ["band", "bkey"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    exact = ngram_jaccard_pairs_for(documents, cand)
    return exact.where(F.col("jaccard") >= threshold)


def ngram_jaccard_pairs_for(documents: DataFrame, pairs: DataFrame) -> DataFrame:
    """Exact Jaccard for an explicit candidate-pair set."""
    sh = shingles(documents)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("sz"))
    inter = (
        pairs.join(sh.selectExpr("doc_id AS doc_a", "shingle"), "doc_a")
        .join(sh.selectExpr("doc_id AS doc_b", "shingle AS shingle_b"), "doc_b")
        .where(F.col("shingle") == F.col("shingle_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("inter"))
    )
    return (
        inter.join(sizes.selectExpr("doc_id AS doc_a", "sz AS sz_a"), "doc_a")
        .join(sizes.selectExpr("doc_id AS doc_b", "sz AS sz_b"), "doc_b")
        .selectExpr("doc_a", "doc_b", "floor((inter / (sz_a + sz_b - inter + 0.0d)) * 10000.0d + 0.5d) / 10000.0d AS jaccard")
    )


def simhash(documents: DataFrame) -> DataFrame:
    """-> (doc_id, simhash bigint): 32-bit SimHash over word tokens.
    Bit j of the result is 1 iff sum over tokens of (+1 if bit j of
    h32(token) else -1) > 0. Expressed as 32 conditional sums in one
    aggregate (single pass, map-side combine)."""
    h = H32_SPARK.format(s="tok")
    toks = documents.selectExpr(
        "doc_id", "explode(split(lower(trim(text)), '\\\\s+')) AS tok"
    ).where("tok <> ''").selectExpr("doc_id", f"{h} AS th")
    sums = [
        f"sum(CASE WHEN (th >> {j}) % 2 = 1 THEN 1 ELSE -1 END) AS s{j}"
        for j in range(32)
    ]
    bits = " + ".join(f"(CASE WHEN s{j} > 0 THEN CAST({1 << j} AS BIGINT) ELSE 0 END)" for j in range(32))
    return (
        toks.groupBy("doc_id")
        .agg(*[F.expr(x) for x in sums])
        .selectExpr("doc_id", f"{bits} AS simhash")
    )


def simhash_pairs(documents: DataFrame, max_hamming: int = 3) -> DataFrame:
    """SimHash near-dup candidate pairs: hamming(simhash_a,
    simhash_b) <= max_hamming. Candidates are generated by banding
    the 32-bit hash into 4 bytes (a pair within hamming<=3 must agree
    on >= 1 byte — pigeonhole), then verified exactly. Output:
    (doc_a, doc_b, hamming)."""
    sh = simhash(documents)
    bands = sh.selectExpr(
        "doc_id", "simhash",
        "explode(transform(sequence(0, 3), b -> struct(b AS band, CAST(shiftright(simhash, b * 8) % 256 AS INT) AS bkey))) AS bk",
    ).selectExpr("doc_id", "simhash", "bk.band AS band", "bk.bkey AS bkey")
    cand = (
        bands.selectExpr("doc_id AS doc_a", "simhash AS sh_a", "band", "bkey")
        .join(bands.selectExpr("doc_id AS doc_b", "simhash AS sh_b", "band", "bkey"), ["band", "bkey"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "sh_a", "sh_b")
        .distinct()
    )
    return (
        cand.selectExpr("doc_a", "doc_b", "bit_count(sh_a ^ sh_b) AS hamming")
        .where(F.col("hamming") <= max_hamming)
    )
