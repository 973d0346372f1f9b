"""Property-based differential test: the SQL renderings of
normalize_backend_path / normalize_frontend_path / paths_match
(functions/paths.py, DuckDB dialect — cheap, no JVM) versus a direct
Python port of the reference's Rust logic (linker.rs:165-266), over
hypothesis-generated paths. Catches regex-dialect divergences the
fixed table-driven cases can't."""

from __future__ import annotations

import re

import duckdb
from hypothesis import given, settings
from hypothesis import strategies as st

from stakgraph_spark.functions.paths import (
    normalize_backend_path_sql,
    normalize_frontend_path_sql,
    paths_match_sql,
)

# --- Python port of linker.rs (the independent second implementation) ---

_BACKEND_RULES_PY = [
    (re.compile(r"<[^>]*:?[^>]+>"), ":param"),
    (re.compile(r":[^/]+"), ":param"),
    (re.compile(r"\{[^}]+\}"), ":param"),
    (re.compile(r"\([^)]+\)"), ":param"),
    (re.compile(r"\{[^}]+\?\}"), ":param"),
    (re.compile(r"\[\.\.\.[^\]]+\]"), ":param"),
    (re.compile(r"\[[^\]]+\]"), ":param"),
]


def normalize_backend_py(path: str) -> str:
    out = path
    for rx, rep in _BACKEND_RULES_PY:
        out = rx.sub(rep, out)
    if len(out) > 1 and out.endswith("/"):
        out = re.sub(r"(.)/+$", r"\1", out)
    return "/" + re.sub(r"^/+", "", out)


def normalize_frontend_py(path: str) -> str | None:
    if path.startswith("${") and path.endswith("}") and "${" not in path[2:]:
        return None
    if path.startswith("${"):
        close = path.find("}")
        if close < 0:
            return None
        part = path[close + 1:]
    else:
        part = path
    norm = re.sub(r"\$\{[^}]+\}", ":param", part).lstrip("/")
    return "/" + norm


def paths_match_py(f: str, b: str) -> bool:
    fs = [s for s in f.split("/") if s]
    bs = [s for s in b.split("/") if s]
    if len(fs) != len(bs):
        return False
    if (fs[:1] == ["api"] or bs[:1] == ["api"]) and fs[:1] != bs[:1]:
        return False
    return all(
        x == y or x.startswith(":") or y.startswith(":") for x, y in zip(fs, bs)
    )


# --- generators: path-shaped strings mixing every template style ---

_SEG = st.one_of(
    st.from_regex(r"[a-z][a-z0-9_.]{0,6}", fullmatch=True),
    st.from_regex(r"[0-9]{1,4}", fullmatch=True),
    st.sampled_from(
        [":id", "<id>", "<int:id>", "{id}", "{id?}", "(id)", "[p]", "[...p]",
         "${id}", ":param", "api"]
    ),
)
_PATH = st.builds(
    lambda lead, segs, trail: ("/" if lead else "") + "/".join(segs) + ("/" if trail else ""),
    st.booleans(),
    st.lists(_SEG, min_size=1, max_size=4),
    st.booleans(),
)
_FRONT = st.one_of(_PATH, st.builds(lambda p: "${ROOT}" + p, _PATH), st.just("${ONLY}"))

_CON = duckdb.connect()


def _sql1(expr_sql: str):
    return _CON.sql(f"SELECT {expr_sql}").fetchone()[0]


def _lit(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


@settings(max_examples=200, deadline=None)
@given(_PATH)
def test_backend_normalize_property(path):
    got = _sql1(normalize_backend_path_sql(_lit(path), "duckdb"))
    assert got == normalize_backend_py(path), path


@settings(max_examples=200, deadline=None)
@given(_FRONT)
def test_frontend_normalize_property(path):
    got = _sql1(normalize_frontend_path_sql(_lit(path), "duckdb"))
    assert got == normalize_frontend_py(path), path


@settings(max_examples=200, deadline=None)
@given(_PATH, _PATH)
def test_paths_match_property(a, b):
    got = _sql1(paths_match_sql(_lit(a), _lit(b), "duckdb"))
    assert bool(got) == paths_match_py(a, b), (a, b)
