"""Second golden fixture corpus — a different SHAPE than the sf
testdata family, for pack-parameterized golden-census tests.

The reference validates against 12 fixture repos with per-language
exact censuses (ast/src/testing/mod.rs:29-61; go/mod.rs:26-130
asserts exact node/edge counts and named nodes). The sf corpus
(testdata events -> derive_transcripts) is one family: 15+ shallow
conversations in ONE directory bucket, a 40%-per-entity Zipf head
spread over 3 aliases, tid%3 test classification. This corpus is the
second family, deterministic in closed form (a pure function of the
global turn id — no seeds, no external data):

  * DEEPER conversations: 6 convs x 240 turns (vs ~67 at sf0.001),
  * MULTI-BUCKET directory tree: user ids 0,100,...,500 put every
    conversation in its OWN substring(conv_id,1,9) bucket (6
    Directory nodes vs 1),
  * HOTTER skew: 50% of ALL mentions land on the single surface
    'orderservice' (the sf head is ~16% per surface),
  * canon-chain coverage: the cold-alias rotation includes 'store'
    and 'linker' (entities 18/19, same-as chain 17-19-18) so USES
    edges must re-target the canonical entity 17,
  * test ids reference the SAME 20 tids from every conversation, so
    first-defining-turn dedup is exercised across 6 files.

Turn layout, k = turn_idx div 4 (0..59), hot = (k % 2 == 0):
  turn_idx%4 == 0  system     'sys {g} defines test_{k%20}'
  turn_idx%4 == 1  user       'u{g} please check @{alias} thanks'
  turn_idx%4 == 2  tool       'tool:search(q="@{alias}") -> ok T{k%20}'
  turn_idx%4 == 3  assistant  'a{g} used @{alias} via {verb} /api/{seg}/{100+k} ref test_{k%20}'
alias = 'orderservice' when hot, else the (k div 2 mod 5)th of
['custrepo','engine','cache','store','linker']; (verb, seg) cycles
the 5 planted endpoints (entities.ENDPOINTS) by k%5.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from . import entities as E

N_CONVS = 6
TURNS_PER_CONV = 240
COLD_ALIASES = ["custrepo", "engine", "cache", "store", "linker"]


def fixture_corpus2(spark: SparkSession) -> DataFrame:
    """-> transcripts(conv_id, turn_idx, role, text, tool, ts)."""
    cold = "array(" + ",".join(f"'{a}'" for a in COLD_ALIASES) + ")"
    verbs = "array(" + ",".join(f"'{v}'" for _, v, _ in E.ENDPOINTS) + ")"
    segs = "array(" + ",".join(f"'{s}'" for _, _, s in E.ENDPOINTS) + ")"
    n = N_CONVS * TURNS_PER_CONV
    return spark.range(0, n, 1).selectExpr(
        "id AS g",
        f"CAST(id DIV {TURNS_PER_CONV} AS INT) AS c",
        f"CAST(id % {TURNS_PER_CONV} AS INT) AS turn_idx",
    ).selectExpr(
        "g", "c", "turn_idx",
        "CAST(turn_idx DIV 4 AS INT) AS k",
    ).selectExpr(
        "g", "c", "turn_idx", "k",
        "CAST(k % 20 AS INT) AS tid",
        # 50% of mentions on ONE surface; cold rotation otherwise
        f"CASE WHEN k % 2 = 0 THEN 'orderservice' ELSE"
        f" element_at({cold}, CAST((k DIV 2) % {len(COLD_ALIASES)} AS INT) + 1) END AS alias",
        f"element_at({verbs}, CAST(k % {len(E.ENDPOINTS)} AS INT) + 1) AS verb",
        f"element_at({segs}, CAST(k % {len(E.ENDPOINTS)} AS INT) + 1) AS seg",
    ).selectExpr(
        "'conv_' || lpad(CAST(c * 100 AS STRING), 6, '0') AS conv_id",
        "turn_idx",
        "element_at(array('system','user','tool','assistant'), turn_idx % 4 + 1) AS role",
        """CASE turn_idx % 4
             WHEN 0 THEN 'sys ' || g || ' defines test_' || tid
             WHEN 1 THEN 'u' || g || ' please check @' || alias || ' thanks'
             WHEN 2 THEN 'tool:search(q="@' || alias || '") -> ok T' || tid
             ELSE 'a' || g || ' used @' || alias || ' via ' || verb
                  || ' /api/' || seg || '/' || CAST(100 + k AS STRING)
                  || ' ref test_' || tid
           END AS text""",
        "CASE WHEN turn_idx % 4 = 2 THEN 'search' ELSE '' END AS tool",
        "timestamp'2024-03-01 00:00:00' + make_interval(0, 0, 0, 0, 0, g, 0) AS ts",
    )
