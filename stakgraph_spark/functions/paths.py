"""Path normalization + segment-wise matching (link_api_nodes core).

Full-parity port of the reference's request->endpoint linking
semantics (ast/src/lang/linker.rs):

  * normalize_backend_path — the 7 template-var rewrites
    (`<id>`/`<int:id>`, `:id`, `{id}`, `(id)`, `{id?}`, `[...p]`,
    `[p]` -> `:param`), trailing-slash strip, leading-slash ensure
    (linker.rs:195-230);
  * normalize_frontend_path — `${var}` -> `:param`, template-prefix
    strip, pure-template rejection (linker.rs:165-193);
  * paths_match — equal segment count, api-prefix agreement, and
    segment-wise (exact OR either-is-param) comparison
    (linker.rs:241-266). Matching is performed between the NORMALIZED
    frontend path and the RAW endpoint name, exactly as
    link_api_nodes does (linker.rs:151-154).

Everything is rendered as dialect-portable SQL fragments (Spark SQL
and DuckDB) so the engine and the oracle share one definition. All
string work is built-in regexp/array functions — JVM-side, no Python
in the hot path. The nested-loop O(n*m) scan of the reference
(linker.rs:151-159) becomes a partitioned equi-join on
(n_segments, verb) with the zip-wise predicate as the join residual —
the SURVEY §2.4 prescription.
"""

from __future__ import annotations

# Backend rewrite rules, applied IN ORDER (linker.rs:197-212), NAMED
# so a dialect pack can select which template styles its framework
# uses (the per-language normalize override of the Stack trait —
# operators/dialects.py). Patterns are written with character classes
# instead of backslash escapes wherever possible so one literal
# parses identically in Spark SQL (backslash-escaped strings) and
# DuckDB (raw strings); the remaining backslashes are doubled for
# Spark by _pat().
BACKEND_RULES_NAMED: list[tuple[str, str]] = [
    ("angle", "<[^>]*:?[^>]+>"),          # Flask/FastAPI "<param>" / "<type:param>"
    ("colon", ":[^/]+"),                  # Express/Rails ":param"
    ("brace", "[{][^}]+[}]"),             # Go/Rust "{param}"
    ("paren", "[(][^)]+[)]"),             # optional "(param)"
    ("brace_opt", "[{][^}]+[?][}]"),      # optional "{param?}"
    ("catchall", r"\[\.\.\.[^\]]+\]"),    # Next.js catch-all "[...param]"
    ("bracket", r"\[[^\]]+\]"),           # Next.js "[param]"
]
_BACKEND_RULES: list[str] = [p for _, p in BACKEND_RULES_NAMED]

_FRONTEND_TEMPLATE = "[$][{][^}]+[}]"  # ${var}


def _pat(pattern: str, dialect: str) -> str:
    """Render a regex as a SQL string literal for the dialect."""
    if dialect == "spark":
        pattern = pattern.replace("\\", "\\\\")
    return "'" + pattern + "'"


def _rr(expr: str, pattern: str, replacement: str, dialect: str) -> str:
    flag = ", 'g'" if dialect == "duckdb" else ""
    return f"regexp_replace({expr}, {_pat(pattern, dialect)}, '{replacement}'{flag})"


def normalize_backend_path_sql(
    expr: str, dialect: str, styles: list[str] | None = None
) -> str:
    """SQL fragment: normalize_backend_path(expr) (linker.rs:195-230).
    Total (never NULL for non-NULL input). The rewrite chain appears
    exactly once: trailing-slash-except-root is the capture-group
    rewrite '(.)/+$' -> kept char (no-op on '/'), and the leading
    slash is ensured by stripping any leading slashes and
    re-prepending one.

    styles: optional subset of BACKEND_RULES_NAMED names — a dialect
    pack's declaration of which template-var styles its framework
    writes (default: all, the reference's full chain). Canonical rule
    ORDER is preserved regardless of the subset's order."""
    out = expr
    for name, rule in BACKEND_RULES_NAMED:
        if styles is not None and name not in styles:
            continue
        out = _rr(out, rule, ":param", dialect)
    cap = "$1" if dialect == "spark" else "\\1"
    out = _rr(out, "(.)/+$", cap, dialect)      # strip trailing slash, keep root
    out = _rr(out, "^/+", "", dialect)          # then normalize the leading one
    return f"'/' || ({out})"


# The `${` digram must NEVER appear in rendered SQL text: under a
# session with spark.sql.variable.substitute=true (the DEFAULT — and
# the driver's harness session does not disable it), Spark rewrites
# `${...}` spans BEFORE parsing, mangling both literals and the
# surrounding SQL. Render it as a concat of two literals instead;
# `||` parses identically in Spark SQL and DuckDB.
_DB = "'$' || '{'"              # the string "${", substitution-proof
_DB_PREFIX = "('$' || '{%')"    # LIKE pattern "${%", substitution-proof


def normalize_frontend_path_sql(expr: str, dialect: str) -> str:
    """SQL fragment: normalize_frontend_path(expr) (linker.rs:165-193).
    NULL when the path is a pure template literal (the reference's
    None => request not linkable)."""
    # path part after a leading ${...} prefix
    part = (
        f"CASE WHEN {expr} LIKE {_DB_PREFIX} THEN substr({expr}, instr({expr}, '}}') + 1) "
        f"ELSE {expr} END"
    )
    norm = _rr(part, _FRONTEND_TEMPLATE, ":param", dialect)
    norm = _rr(norm, "^/+", "", dialect)
    pure_template = (
        f"({expr} LIKE {_DB_PREFIX} AND {expr} LIKE '%}}' "
        f"AND instr(substr({expr}, 3), {_DB}) = 0)"
    )
    no_close = f"({expr} LIKE {_DB_PREFIX} AND instr({expr}, '}}') = 0)"
    return f"CASE WHEN {pure_template} OR {no_close} THEN NULL ELSE '/' || ({norm}) END"


def segments_sql(expr: str, dialect: str) -> str:
    """Non-empty path segments as an array (linker.rs:242-244)."""
    if dialect == "spark":
        return f"filter(split({expr}, '/'), s -> s != '')"
    return f"list_filter(string_split({expr}, '/'), s -> s != '')"


def n_segments_sql(expr: str, dialect: str) -> str:
    f = "size" if dialect == "spark" else "len"
    return f"{f}({segments_sql(expr, dialect)})"


def paths_match_sql(a: str, b: str, dialect: str) -> str:
    """Boolean SQL fragment: paths_match(a, b) (linker.rs:241-266).
    a = normalized frontend path, b = raw backend endpoint name."""
    sa, sb = segments_sql(a, dialect), segments_sql(b, dialect)
    if dialect == "spark":
        zipped_ok = (
            f"forall(zip_with({sa}, {sb}, (f, b) -> "
            f"f = b OR startswith(f, ':') OR startswith(b, ':')), x -> x)"
        )
        first = lambda s: f"element_at({s}, 1)"  # noqa: E731
    else:
        zipped_ok = (
            f"len(list_filter(list_zip({sa}, {sb}), z -> "
            f"NOT (z[1] = z[2] OR z[1] LIKE ':%' OR z[2] LIKE ':%'))) = 0"
        )
        first = lambda s: f"{s}[1]"  # noqa: E731
    n_eq = f"{n_segments_sql(a, dialect)} = {n_segments_sql(b, dialect)}"
    api_rule = (
        f"(NOT ({first(sa)} = 'api' OR {first(sb)} = 'api') "
        f"OR {first(sa)} = {first(sb)})"
    )
    return f"({n_eq} AND {api_rule} AND {zipped_ok})"


# ---------------------------------------------------------------------------
# Small scalar parity fragments (dialect-identical SQL: CASE/substr/
# instr/length parse the same in Spark SQL and DuckDB).
# ---------------------------------------------------------------------------

def trim_quotes_sql(expr: str, dialect: str = "spark") -> str:
    """trim_quotes (reference ast/src/lang/parse/utils.rs:7-22):
    trim whitespace, then strip ONE matching pair of double / single /
    back quotes, else a single leading ':' (symbol form). Exactly one
    rule applies, in that order."""
    t = f"trim({expr})"
    def pair(qsql: str) -> str:
        # starts AND ends with the quote char, long enough to hold a pair
        return (
            f"substr({t}, 1, 1) = {qsql} AND substr({t}, length({t}), 1) = {qsql}"
            f" AND length({t}) >= 2"
        )
    dq, sq, bq = "'\"'", "''''", "'`'"
    return (
        f"CASE WHEN {pair(dq)} THEN substr({t}, 2, length({t}) - 2)"
        f" WHEN {pair(sq)} THEN substr({t}, 2, length({t}) - 2)"
        f" WHEN {pair(bq)} THEN substr({t}, 2, length({t}) - 2)"
        f" WHEN substr({t}, 1, 1) = ':' THEN substr({t}, 2)"
        f" ELSE {t} END"
    )


def strip_url_sql(expr: str, dialect: str = "spark") -> str:
    """URL -> path strip (reference ast/src/lang/mod.rs:552-567):
    if the string contains '://', keep from the first '/' after the
    authority (unchanged when the authority has no path); then cut at
    '?' and at '#'; finally pop ONE trailing '/' when longer than 1.
    Rendered as a chain of nested CASE rewrites — same order as the
    reference's sequential finds."""
    p0 = expr
    # authority strip: rest = text after '://'; keep from its first '/'
    rest = f"substr({p0}, instr({p0}, '://') + 3)"
    p1 = (
        f"CASE WHEN instr({p0}, '://') > 0 AND instr({rest}, '/') > 0"
        f" THEN substr({rest}, instr({rest}, '/'))"
        f" ELSE {p0} END"
    )
    p2 = f"CASE WHEN instr({p1}, '?') > 0 THEN substr({p1}, 1, instr({p1}, '?') - 1) ELSE {p1} END"
    p3 = f"CASE WHEN instr({p2}, '#') > 0 THEN substr({p2}, 1, instr({p2}, '#') - 1) ELSE {p2} END"
    return (
        f"CASE WHEN length({p3}) > 1 AND substr({p3}, length({p3}), 1) = '/'"
        f" THEN substr({p3}, 1, length({p3}) - 1) ELSE {p3} END"
    )


# Planted scalar dims (id, raw) — quote forms, symbol form, URL forms
# with query/fragment/trailing-slash, and pass-throughs.
SCALAR_CASES: list[tuple[int, str]] = [
    (0, '"hello"'),
    (1, "'world'"),
    (2, "`tick`"),
    (3, ":sym"),
    (4, "  plain  "),
    (5, '""'),
    (6, '"mismatch\''),
    (7, "https://example.com/a/b?x=1#frag"),
    (8, "http://host"),
    (9, "/already/path/"),
    (10, "no-url?q=1#z"),
    (11, "https://h.io/x/"),
    (12, "/"),
]


def scalar_cases_cte() -> str:
    from ..sources.entities import _union_all

    return _union_all(SCALAR_CASES, ["case_id", "raw"], ["INT", "STRING"])


# ---------------------------------------------------------------------------
# Planted path dims for the oracle-gated parity queries — the
# reference's own unit cases (linker.rs:268-359) plus one of each
# remaining template form, as (id, verb, raw_path) literals shared by
# the Spark query and the DuckDB oracle.
# ---------------------------------------------------------------------------

# Frontend request names (normalize_frontend_path inputs).
REQUEST_PATH_CASES: list[tuple[int, str, str]] = [
    (0, "GET", "${ROOT}/api/user/${id}"),          # -> /api/user/:param
    (1, "GET", "${SOME_CONSTANT}/user/${id}"),     # -> /user/:param
    (2, "GET", "${ENDPOINTS.something}"),          # pure template -> NULL
    (3, "GET", "/api/users/123"),                  # concrete id
    (4, "POST", "/api/posts/${id}"),               # verb mismatch vs ep 13
    (5, "GET", "/api/user/${id}/extra"),           # segment-count mismatch
    (6, "DELETE", "api/parts/${partId}"),          # no leading slash
    (7, "GET", "/user/${id}"),                     # api-prefix rule: no match vs /api/user/:id
]

# Backend endpoint names (normalize_backend_path inputs) — one per
# template style (linker.rs:197-212 rule table).
ENDPOINT_PATH_CASES: list[tuple[int, str, str]] = [
    (10, "GET", "/api/user/:id"),                  # Express/Rails
    (11, "GET", "/api/users/<int:id>"),            # Flask/FastAPI typed
    (12, "GET", "/user/{id}"),                     # Go/Rust
    (13, "GET", "/api/posts/(id)"),                # optional
    (14, "DELETE", "/api/parts/{partId?}"),        # optional curly
    (15, "GET", "/api/docs/[...slug]"),            # Next.js catch-all
    (16, "POST", "/api/pages/[page]/"),            # Next.js + trailing slash
    (17, "GET", "/api/users/:id"),                 # concrete-id frontend target
]


def request_paths_cte() -> str:
    from ..sources.entities import _union_all

    return _union_all(REQUEST_PATH_CASES, ["req_id", "verb", "raw"], ["INT", "STRING", "STRING"])


def endpoint_paths_cte() -> str:
    from ..sources.entities import _union_all

    return _union_all(ENDPOINT_PATH_CASES, ["ep_id", "verb", "raw"], ["INT", "STRING", "STRING"])
