"""DuckDB oracle SQL for the training-data-pipeline operators
(dedup / similarity / text-stats / multimodal metadata) over the
pre-registered `documents` and `embeddings` views.

Each string mirrors the corresponding Spark operator exactly,
including the portable 32-bit hash
(duckdb: CAST('0x' || substring(md5(s),1,8) AS BIGINT)), double-cast
float math in identical fold order, and 4-dp rounding.

Dialect notes baked in: DuckDB regexp_replace needs the 'g' flag;
DuckDB string literals do NOT process backslash escapes (patterns use
single backslashes here, doubled on the Spark side); xor()/len()/
list_transform replace ^/size/transform.
"""

from __future__ import annotations

from ..operators import dedup as DD
from ..operators import textstats as TS

H32 = "CAST('0x' || substring(md5({s}),1,8) AS BIGINT)"


def _shingles(n: int = DD.SHINGLE_N) -> str:
    return f"""
SELECT DISTINCT doc_id, shingle FROM (
  SELECT doc_id,
         unnest(list_transform(range(0, greatest(len(w) - {n - 1}, 1)),
                i -> concat_ws(' ', w[i + 1], w[i + 2], w[i + 3]))) AS shingle
  FROM (SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS w FROM documents)
) WHERE shingle <> ''"""


def exact_duplicates() -> str:
    return """
SELECT md5(text) AS content_hash,
       CAST(count(*) AS BIGINT) AS n_docs,
       string_agg(CAST(doc_id AS STRING), ',' ORDER BY doc_id) AS doc_ids
FROM documents GROUP BY md5(text) HAVING count(*) > 1"""


def shingles() -> str:
    return _shingles()


def _sizes() -> str:
    return f"SELECT doc_id, count(*) AS sz FROM ({_shingles()}) GROUP BY doc_id"


def ngram_jaccard_pairs(threshold: float = 0.6, max_posting: int = 1000) -> str:
    # mirrors the engine's hot-shingle posting-list cap (dedup.py);
    # sizes come from the CAPPED shingle set so numerator and
    # denominator share one universe (jaccard exact over survivors)
    return f"""
WITH sh0 AS ({_shingles()}),
cold AS (SELECT shingle FROM sh0 GROUP BY shingle HAVING count(*) <= {max_posting}),
sh AS (SELECT sh0.* FROM sh0 JOIN cold ON cold.shingle = sh0.shingle),
sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT doc_a, doc_b,
       floor((inter / (sa.sz + sb.sz - inter + 0.0)) * 10000.0 + 0.5) / 10000.0 AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE floor((inter / (sa.sz + sb.sz - inter + 0.0)) * 10000.0 + 0.5) / 10000.0 >= {threshold}"""


def minhash_signatures_flat() -> str:
    """(doc_id, m0..m{K-1}) — flat columns (arrays render differently
    across engines; the flat form hash-compares cleanly)."""
    h = H32.format(s="shingle")
    mins = ", ".join(
        f"min(({a} * {h} + {b}) % {DD.MH_PRIME}) AS m{i}"
        for i, (a, b) in enumerate(zip(DD.MH_A, DD.MH_B))
    )
    return f"SELECT doc_id, {mins} FROM ({_shingles()}) GROUP BY doc_id"


def minhash_lsh_pairs(threshold: float = 0.6) -> str:
    h = H32.format(s="shingle")
    mins = ", ".join(
        f"min(({a} * {h} + {b}) % {DD.MH_PRIME}) AS m{i}"
        for i, (a, b) in enumerate(zip(DD.MH_A, DD.MH_B))
    )
    band_selects = []
    for b in range(DD.LSH_BANDS):
        key = " || '_' || ".join(
            f"CAST(m{b * DD.LSH_ROWS + r} AS STRING)" for r in range(DD.LSH_ROWS)
        )
        band_selects.append(f"SELECT doc_id, {b} AS band, {key} AS bkey FROM sigs")
    bands_sql = " UNION ALL ".join(band_selects)
    return f"""
WITH sh AS ({_shingles()}), sizes AS ({_sizes()}),
sigs AS (SELECT doc_id, {mins} FROM sh GROUP BY doc_id),
bands AS ({bands_sql}),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id
),
inter AS (
  SELECT c.doc_a, c.doc_b, count(*) AS inter
  FROM cand c
  JOIN sh sa ON sa.doc_id = c.doc_a
  JOIN sh sb ON sb.doc_id = c.doc_b AND sb.shingle = sa.shingle
  GROUP BY c.doc_a, c.doc_b
)
SELECT i.doc_a, i.doc_b,
       floor((inter / (sa.sz + sb.sz - inter + 0.0)) * 10000.0 + 0.5) / 10000.0 AS jaccard
FROM inter i
JOIN sizes sa ON sa.doc_id = i.doc_a
JOIN sizes sb ON sb.doc_id = i.doc_b
WHERE floor((inter / (sa.sz + sb.sz - inter + 0.0)) * 10000.0 + 0.5) / 10000.0 >= {threshold}"""


def simhash() -> str:
    h = H32.format(s="tok")
    sums = ", ".join(
        f"sum(CASE WHEN (th >> {j}) % 2 = 1 THEN 1 ELSE -1 END) AS s{j}" for j in range(32)
    )
    bits = " + ".join(
        f"(CASE WHEN s{j} > 0 THEN CAST({1 << j} AS BIGINT) ELSE CAST(0 AS BIGINT) END)"
        for j in range(32)
    )
    return f"""
WITH toks AS (
  SELECT doc_id, {h} AS th FROM (
    SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\\s+')) AS tok FROM documents
  ) WHERE tok <> ''
),
sums AS (SELECT doc_id, {sums} FROM toks GROUP BY doc_id)
SELECT doc_id, {bits} AS simhash FROM sums"""


def simhash_pairs(max_hamming: int = 3) -> str:
    return f"""
WITH sh AS ({simhash().strip()}),
bands AS (
  SELECT doc_id, simhash, b AS band, CAST((simhash >> (b * 8)) % 256 AS INT) AS bkey
  FROM sh, (SELECT unnest([0,1,2,3]) AS b)
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b, a.simhash AS sh_a, b.simhash AS sh_b
  FROM bands a JOIN bands b ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id
)
SELECT doc_a, doc_b, bit_count(xor(sh_a, sh_b)) AS hamming
FROM cand WHERE bit_count(xor(sh_a, sh_b)) <= {max_hamming}"""


# ---------------------------------------------------------------------------
# similarity (embeddings)
# ---------------------------------------------------------------------------

_NORMED = """
SELECT vec_id, label,
       list_transform(CAST(embedding AS DOUBLE[]), v -> v / sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[])))) AS vec
FROM embeddings"""


def cosine_pairs(threshold: float = 0.9) -> str:
    return f"""
WITH n AS ({_NORMED})
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       round(list_dot_product(a.vec, b.vec), 4) AS cos
FROM n a JOIN n b ON a.vec_id < b.vec_id
WHERE round(list_dot_product(a.vec, b.vec), 4) >= {threshold}"""


def ann_topk(query_ids: list[int], k: int = 5) -> str:
    ids = ", ".join(str(i) for i in query_ids)
    return f"""
WITH n AS ({_NORMED}),
q AS (SELECT vec_id AS query_id, vec AS qv FROM n WHERE vec_id IN ({ids})),
scored AS (
  SELECT q.query_id, n.vec_id, round(list_dot_product(q.qv, n.vec), 4) AS cos
  FROM q JOIN n ON q.query_id <> n.vec_id
),
rk AS (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id ASC) AS rk
  FROM scored
)
SELECT query_id, vec_id, cos, rk FROM rk WHERE rk <= {k}"""


def lsh_signatures() -> str:
    from ..operators.similarity import DIM, N_PLANES

    def plane(p: int) -> str:
        h = H32.format(s=f"concat('plane_{p}_', CAST(d AS STRING))")
        return (
            f"list_transform(range(0, {DIM}), d -> ({h} % 2000001 - 1000000) / 1000000.0)"
        )

    bits = " + ".join(
        f"(CASE WHEN list_dot_product(vec, {plane(p)}) >= 0 THEN {1 << p} ELSE 0 END)"
        for p in range(N_PLANES)
    )
    return f"WITH n AS ({_NORMED}) SELECT vec_id, label, CAST({bits} AS INT) AS sig FROM n"


# ---------------------------------------------------------------------------
# text stats
# ---------------------------------------------------------------------------

def lang_id() -> str:
    langs = sorted(TS.LANG_STOPWORDS)
    hit_cols = []
    for lg in langs:
        words = ", ".join(f"'{w}'" for w in TS.LANG_STOPWORDS[lg])
        hit_cols.append(
            f"len(list_filter(string_split_regex(lower(text), '\\s+'), t -> list_contains([{words}], t))) AS hits_{lg}"
        )
    best = "greatest(" + ", ".join(f"hits_{lg}" for lg in langs) + ")"
    case = "CASE " + " ".join(f"WHEN hits_{lg} = best THEN '{lg}'" for lg in langs) + " END"
    return f"""
WITH hits AS (SELECT doc_id, {', '.join(hit_cols)} FROM documents),
withbest AS (SELECT *, {best} AS best FROM hits)
SELECT doc_id, {case} AS guessed_lang, best AS best_hits FROM withbest"""


def quality_score() -> str:
    allstops = sorted({w for ws in TS.LANG_STOPWORDS.values() for w in ws})
    stop_arr = ", ".join(f"'{w}'" for w in allstops)
    return f"""
WITH base AS (
  SELECT doc_id,
         length(text) AS n_chars,
         len(string_split_regex(trim(text), '\\s+')) AS n_words,
         floor((length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) / (length(text) + 1.0)) * 10000.0 + 0.5) / 10000.0 AS punct_ratio,
         floor((len(list_filter(string_split_regex(lower(text), '\\s+'), t -> list_contains([{stop_arr}], t))) / (len(string_split_regex(trim(text), '\\s+')) + 1.0)) * 10000.0 + 0.5) / 10000.0 AS stop_ratio,
         floor(((length(text) + 0.0) / (len(string_split_regex(trim(text), '\\s+')) + 1.0)) * 10000.0 + 0.5) / 10000.0 AS mean_word_len
  FROM documents
)
SELECT doc_id, n_chars, n_words, punct_ratio, stop_ratio, mean_word_len,
       floor((least(n_words / 50.0, 1.0) * 0.5 + (1.0 - least(punct_ratio * 5.0, 1.0)) * 0.25 + least(stop_ratio * 10.0, 1.0) * 0.25) * 10000.0 + 0.5) / 10000.0 AS quality
FROM base"""


def token_count() -> str:
    return f"""
SELECT doc_id,
       len(string_split_regex(trim(text), '\\s+')) AS ws_tokens,
       len(regexp_extract_all(text, '{TS.BPE_ISH_RE}')) AS bpe_tokens
FROM documents"""


def fingerprint() -> str:
    h = H32.format(s="regexp_replace(lower(text), '\\s+', ' ', 'g')")
    return f"SELECT doc_id, {h} AS fp FROM documents"


# ---------------------------------------------------------------------------
# embedding pipeline (chunking + pooled vectors)
# ---------------------------------------------------------------------------

def chunk_text(chunk_chars: int = 400, source: str = "documents") -> str:
    return f"""
SELECT doc_id, CAST(i AS INT) AS chunk_idx,
       substring(text, i * {chunk_chars} + 1, {chunk_chars}) AS chunk
FROM (SELECT doc_id, text,
             unnest(range(0, CAST(ceil(length(text) / {chunk_chars}.0) AS INT))) AS i
      FROM {source})
WHERE substring(text, i * {chunk_chars} + 1, {chunk_chars}) <> ''"""


def weighted_pool(first_weight: float = 1.2) -> str:
    return f"""
WITH f AS (
  SELECT label,
         CASE WHEN vec_id = min(vec_id) OVER (PARTITION BY label) THEN {first_weight} ELSE 1.0 END AS wt,
         unnest(CAST(embedding AS DOUBLE[])) AS val,
         generate_subscripts(embedding, 1) - 1 AS dim
  FROM embeddings
),
pooled AS (
  SELECT label, CAST(dim AS INT) AS dim, sum(wt * val) / sum(wt) AS mean_val
  FROM f GROUP BY label, dim
),
normed AS (
  SELECT label, dim, mean_val,
         sqrt(sum(mean_val * mean_val) OVER (PARTITION BY label)) AS norm
  FROM pooled
)
SELECT label, dim,
       floor((mean_val / norm) * 1000000.0 + CASE WHEN mean_val >= 0 THEN 0.5 ELSE -0.5 END) / 1000000.0 AS pooled
FROM normed"""


def weighted_pool_with_chain(
    first_weight: float = 1.2, dim: int = 16, chunk_chars: int = 400
) -> str:
    """Two-arm oracle for em_weighted_pool: 'emb' = the original pool
    over the embeddings table (weighted_pool() above, untouched —
    em_attach's CTE keeps reusing it); 'chain' = the FULL reference
    chain chunk->embed->pool (embedding.rs:49-77, :24-47, :96-104)
    over documents, with embed_chunks_vec's deterministic trigram
    featurizer transcribed into DuckDB list comprehensions. Same
    fixed-prime bucket arithmetic, same 6-dp roundings at the same
    two places (per-chunk component, pooled component)."""
    return f"""
WITH docs3 AS (SELECT doc_id, text FROM documents WHERE length(text) >= 3),
c AS ({chunk_text(chunk_chars, source="docs3")}),
g AS (
  SELECT doc_id, chunk_idx,
         CASE WHEN length(chunk) >= 3
              THEN list_transform(range(1, length(chunk) - 1), i ->
                     (ascii(substring(chunk, i, 1)) * 31
                      + ascii(substring(chunk, i + 1, 1)) * 7
                      + ascii(substring(chunk, i + 2, 1))) % {dim})
              ELSE [] END AS grams
  FROM c),
v AS (
  SELECT doc_id, chunk_idx,
         list_transform(range(0, {dim}), d -> len(list_filter(grams, x -> x = d))) AS cnts
  FROM g),
nv AS (
  SELECT doc_id, chunk_idx, cnts,
         sqrt(list_aggregate(list_transform(cnts, x -> CAST(x AS DOUBLE) * x), 'sum')) AS nrm
  FROM v),
u AS (
  SELECT doc_id, chunk_idx, nrm,
         generate_subscripts(cnts, 1) - 1 AS dim,
         unnest(cnts) AS cnt
  FROM nv),
cf AS (
  SELECT CAST(doc_id AS VARCHAR) AS label,
         CASE WHEN chunk_idx = min(chunk_idx) OVER (PARTITION BY doc_id)
              THEN {first_weight} ELSE 1.0 END AS wt,
         CAST(dim AS INT) AS dim,
         CASE WHEN nrm = 0 THEN 0.0
              ELSE floor(cnt / nrm * 1000000.0 + 0.5) / 1000000.0 END AS val
  FROM u),
cpooled AS (
  SELECT label, dim, sum(wt * val) / sum(wt) AS mean_val FROM cf GROUP BY label, dim),
cnormed AS (
  SELECT label, dim, mean_val,
         sqrt(sum(mean_val * mean_val) OVER (PARTITION BY label)) AS norm
  FROM cpooled)
SELECT 'emb' AS arm, CAST(label AS VARCHAR) AS label, dim, pooled
FROM ({weighted_pool(first_weight)})
UNION ALL
SELECT 'chain' AS arm, label, dim,
       floor((mean_val / norm) * 1000000.0
             + CASE WHEN mean_val >= 0 THEN 0.5 ELSE -0.5 END) / 1000000.0 AS pooled
FROM cnormed"""


def token_join_entities(names_cte: str) -> str:
    """Token-containment join against a names CTE
    (SELECT ... name) — runs inside the KG prelude (needs
    transcripts), so this returns only the tail SELECT."""
    return f"""
SELECT DISTINCT t.conv_id, t.turn_idx, nm.name AS matched_name
FROM (SELECT conv_id, turn_idx,
             regexp_replace(unnest(string_split_regex(lower(text), '\\s+')), '^@', '') AS tok
      FROM transcripts) t
JOIN ({names_cte}) nm ON lower(nm.name) = t.tok"""


# ---------------------------------------------------------------------------
# multimodal metadata (deterministic stub arithmetic)
# ---------------------------------------------------------------------------

def media_features() -> str:
    """Oracle for extract_features over the REAL codec arms
    (multimodal.py): predicts the decoded dimensions AND the decoded
    pixel/sample statistics arithmetically. The synthetic encoder
    writes the content ramp pixels[i] = (doc_id + i) % 256, whose sum
    over n decoded bytes has the closed form

        S(d, n) = (n // 256) * 32640 + T(d % 256, n % 256)
        T(s, r) = r*s + r(r-1)/2                       if s + r <= 256
                = (256-s)*s + (256-s)(255-s)/2
                  + (r-256+s)(r-257+s)/2               otherwise

    so a Spark-side decoder that mis-reconstructs a PNG filter, drops
    a BMP pad byte, mis-parses a RIFF header, or splits an AVI movi
    frame boundary hash-mismatches here. Dimensions derive from
    strlen(text) — DuckDB's UTF-8 octet count, matching the encoder's
    len(text.encode()) on any corpus. All four arms are REAL codecs;
    the avi arm's npx spans every frame (width*height*n_frames)."""
    return """
WITH b AS (SELECT doc_id, CAST(strlen(text) AS BIGINT) AS L,
                  CAST(doc_id % 4 AS INT) AS m FROM documents),
dims AS (
  SELECT doc_id, m, L,
    CASE m WHEN 0 THEN 'image' WHEN 1 THEN 'audio' WHEN 2 THEN 'image' ELSE 'video' END AS media_type,
    CASE m WHEN 0 THEN 'png' WHEN 1 THEN 'wav' WHEN 2 THEN 'bmp' ELSE 'avi' END AS codec,
    CAST(CASE m WHEN 0 THEN L % 64 + 1 WHEN 1 THEN 0 WHEN 2 THEN L % 32 + 1 ELSE L % 32 + 1 END AS INT) AS width,
    CAST(CASE m WHEN 0 THEN L % 48 + 1 WHEN 1 THEN 0 WHEN 2 THEN L % 24 + 1 ELSE L % 24 + 1 END AS INT) AS height,
    CAST(CASE m WHEN 0 THEN 1 WHEN 1 THEN L % 1000 + 1 WHEN 2 THEN 1 ELSE L % 24 + 1 END AS INT) AS n_frames
  FROM b),
n AS (SELECT *,
    CAST(CASE m WHEN 0 THEN width * height WHEN 1 THEN n_frames
               WHEN 2 THEN width * height
               ELSE width * height * n_frames END AS BIGINT) AS npx,
    CAST(doc_id % 256 AS BIGINT) AS s FROM dims),
sums AS (SELECT *, (npx // 256) * 32640 +
    CASE WHEN s + (npx % 256) <= 256
         THEN (npx % 256) * s + (npx % 256) * ((npx % 256) - 1) // 2
         ELSE (256 - s) * s + (256 - s) * (255 - s) // 2
              + ((npx % 256) - 256 + s) * ((npx % 256) - 257 + s) // 2
    END AS px_sum FROM n)
SELECT doc_id, media_type, codec, width, height, n_frames,
       CAST(px_sum AS BIGINT) AS px_sum,
       CAST(CASE WHEN npx > 0 THEN (px_sum * 10000) // npx ELSE 0 END AS BIGINT) AS px_mean_e4
FROM sums"""


def ivf_topk(query_ids: list[int], k: int = 5, n_centroids: int = 16, nprobe: int = 4) -> str:
    """Oracle for the IVF ANN path: deterministic centroids (the
    n_centroids smallest vec_ids), argmax assignment and probe
    ranking over ROUNDED dots (ties -> smaller cid), bucket-join
    candidates, exact re-rank."""
    ids = ", ".join(str(i) for i in query_ids)
    return f"""
WITH n AS ({_NORMED}),
cents AS (SELECT vec_id AS cid, vec AS cvec FROM n WHERE vec_id < {n_centroids}),
assign AS (
  SELECT vec_id, cid FROM (
    SELECT n.vec_id, c.cid,
           row_number() OVER (PARTITION BY n.vec_id
             ORDER BY round(list_dot_product(n.vec, c.cvec), 4) DESC, c.cid ASC) AS rk
    FROM n CROSS JOIN cents c) WHERE rk = 1
),
q AS (SELECT vec_id AS query_id, vec AS qv FROM n WHERE vec_id IN ({ids})),
probes AS (
  SELECT query_id, qv, cid FROM (
    SELECT q.query_id, q.qv, c.cid,
           row_number() OVER (PARTITION BY q.query_id
             ORDER BY round(list_dot_product(q.qv, c.cvec), 4) DESC, c.cid ASC) AS pr
    FROM q CROSS JOIN cents c) WHERE pr <= {nprobe}
),
cand AS (
  SELECT p.query_id, p.qv, a.vec_id FROM probes p
  JOIN assign a ON a.cid = p.cid WHERE p.query_id != a.vec_id
)
SELECT query_id, vec_id, cos, rk FROM (
  SELECT c.query_id, c.vec_id, round(list_dot_product(c.qv, n.vec), 4) AS cos,
         row_number() OVER (PARTITION BY c.query_id
           ORDER BY round(list_dot_product(c.qv, n.vec), 4) DESC, c.vec_id ASC) AS rk
  FROM cand c JOIN n ON n.vec_id = c.vec_id) WHERE rk <= {k}"""
