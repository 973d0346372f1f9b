"""Chimera-pack recombination fuzz: the dialect interpreters must be
closed over the PACK SPACE, not just the 13 shipped points in it.

A "chimera" samples each hook key independently from a different
shipped pack's value (or omits the optional ones entirely, taking the
trait default — mod.rs's None-default methods), producing a language
no shipped Stack corresponds to.  For every chimera the single pack
definition must still drive the Spark engine and the DuckDB oracle to
identical rows — the same closure property `test_new_pack_needs_no_code`
proves for one hand-written point, proven here across seeded random
recombinations of the full 37-key hook surface.

Deterministic (fixed seed) so failures reproduce; no hypothesis here
because each sample costs a Spark job — a handful of well-spread
chimeras beats hundreds of unrunnable ones.
"""

import copy
import random

import duckdb

from stakgraph_spark.operators import dialects as D

# Hooks the interpreter reads unconditionally (the base arms of
# run_dialect_pack): every pack must carry them.
REQUIRED = {
    "rules",
    "request_styles",
    "test_classes",
    "default_test_class",
    "handler_pick",
}


def _chimera(rng: random.Random) -> dict:
    donors = list(D.DIALECT_PACKS.values())
    all_keys = sorted({k for p in donors for k in p})
    pack = {}
    for key in all_keys:
        carriers = [p[key] for p in donors if key in p]
        # one extra slot = omit (trait default); required keys always land
        slot = rng.randrange(len(carriers) + (0 if key in REQUIRED else 1))
        if slot < len(carriers):
            pack[key] = copy.deepcopy(carriers[slot])
    # the one cross-key dependency in the surface: the xpage arm
    # composes its gate from the extra_page spec (angular.rs pairs the
    # extra-page finder with the template map the same way)
    if "xpage_style" in pack and "extra_page" not in pack:
        carriers = [p["extra_page"] for p in donors if "extra_page" in p]
        pack["extra_page"] = copy.deepcopy(rng.choice(carriers))
    return pack


def test_chimera_packs_match_oracle(spark):
    rng = random.Random(0x5F2C)
    shipped = list(D.DIALECT_PACKS.values())
    novel = 0
    for i in range(6):
        pack = _chimera(rng)
        if pack not in shipped:
            novel += 1
        name = f"chimera{i}"
        got = sorted(tuple(r) for r in D.run_dialect_pack(spark, name, pack).collect())
        want = sorted(
            tuple(r) for r in duckdb.sql(D.dialects_oracle_sql({name: pack})).fetchall()
        )
        assert got == want, f"chimera {i} diverged from its oracle: {pack}"
        assert got, f"chimera {i} produced no rows"
    # the sampler genuinely leaves the shipped grid
    assert novel >= 5
