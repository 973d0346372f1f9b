"""Unit tests for the DUEL scaling-protocol scorer (scripts/duel.py):
pure-python pairing/median logic, no Spark session needed."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"))

from duel import _median, score_duel  # noqa: E402


def _builds(start: float, durs: list[float], gap: float = 0.0) -> list[list[float]]:
    out, t = [], start
    for d in durs:
        out.append([t, t + d])
        t += d + gap
    return out


def test_first_build_dropped_both_legs():
    # lo: first build 2x slower (JIT) must not contaminate samples;
    # hi: same.
    r_lo = {"turns": 1000, "builds": _builds(0.0, [200.0, 100.0])}
    r_hi = {"turns": 1000, "builds": _builds(0.0, [50.0] + [25.0] * 12)}
    rec = score_duel(r_lo, r_hi, 1, 4)
    assert rec["n_lo_builds"] == 1
    assert rec["lo_build_sec"] == [100.0]
    # scored lo build spans [200, 300]; hi scored builds all 25s ->
    # eff = 100 / (4 * 25) = 1.0
    assert rec["samples"] == [1.0]


def test_hi_median_resists_one_throttled_build():
    r_lo = {"turns": 1000, "builds": _builds(0.0, [100.0, 100.0])}
    # hi builds with midpoint inside the scored lo window [100, 200]:
    # one 60s throttled outlier among 25s builds; median (25) wins
    # over mean (36.7)
    r_hi = {"turns": 1000, "builds": _builds(0.0, [10.0, 25.0, 25.0, 25.0, 60.0, 25.0, 25.0, 25.0])}
    rec = score_duel(r_lo, r_hi, 1, 4)
    assert len(rec["samples"]) == 1
    assert rec["samples"][0] == 1.0


def test_sample_per_scored_lo_build():
    r_lo = {"turns": 1000, "builds": _builds(0.0, [100.0, 100.0, 100.0])}
    r_hi = {"turns": 1000, "builds": _builds(0.0, [25.0] * 16)}
    rec = score_duel(r_lo, r_hi, 1, 4)
    assert len(rec["samples"]) == 2  # first lo build dropped
    assert all(s == 1.0 for s in rec["samples"])


def test_efficiency_below_one_when_hi_slower_than_ideal():
    r_lo = {"turns": 1000, "builds": _builds(0.0, [100.0, 100.0])}
    # hi takes 50s per build inside the scored window -> eff 0.5
    r_hi = {"turns": 1000, "builds": _builds(0.0, [50.0] * 6)}
    rec = score_duel(r_lo, r_hi, 1, 4)
    assert rec["samples"] == [0.5]


def test_jvm_ceiling_clamped():
    r_lo = {"turns": 1000, "builds": _builds(0.0, [100.0, 100.0]), "probe_sec": 4.4}
    r_hi = {"turns": 1000, "builds": _builds(0.0, [25.0] * 10), "probe_sec": 1.0}
    rec = score_duel(r_lo, r_hi, 1, 4)
    assert rec["jvm_ceiling"] == 1.0  # 4.4/1.0/4 = 1.1 -> clamp


def test_median_even_and_odd():
    assert _median([3.0, 1.0, 2.0]) == 2.0
    assert _median([4.0, 1.0, 2.0, 3.0]) == 2.5
