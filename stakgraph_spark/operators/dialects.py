"""Dialect packs — the Stack-trait hook surface as DATA.

The reference's extensibility unit is the `Stack` trait
(ast/src/lang/queries/mod.rs:51-303): ~50 overridable hooks — query
finders, `classify_test` (mod.rs:183), `handler_finder`
(mod.rs:208-223), request-template normalization (which of the
backend rewrites apply, linker.rs:195-230) — each overridden per
language in ast/src/lang/queries/*.rs. Porting that as Python
subclasses would reproduce its ~8k-LoC shape; this engine instead
makes a "language" a PACK OF DATA, interpreted by fixed operators:

  rules           extraction regexes (the round-2 rule-pack shape,
                  executed by extract.extract_mentions_rulepack)
  request_styles  which named backend template-var rewrites the
                  dialect's framework writes (functions/paths.py
                  BACKEND_RULES_NAMED; the per-language
                  normalize override)
  test_classes    ordered (regex, node_type) rules classifying a
                  test by its name + a default (the classify_test
                  override: Rust classifies by attribute macros, Go
                  by filename suffix, etc.)
  handler_pick    'first' | 'last' referencing turn per endpoint
                  (the handler_finder override: some frameworks
                  register the first matching route, some the last)
  file_filters    the should_not_include predicate stack
                  (repo.rs:477-526) as data — allowlist / junk dirs /
                  binary exts / package-file force-include / own vs
                  other-language extensions / skip suffixes, rendered
                  by operators/files.py as one portable boolean

Adding a dialect = adding a dict literal; zero engine code changes
(proved by tests/test_dialects.py::test_new_pack_needs_no_code).
Every interpreter renders dialect-portable SQL, so ONE pack
definition drives both the Spark engine and the DuckDB oracle — the
pack-parameterized differential gate (`kg_dialects`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.paths import normalize_backend_path_sql
from .extract import MENTION_RE, TESTREF_RE, TOOL_RE

# ---------------------------------------------------------------------------
# The shipped dialect packs (three "languages" with genuinely
# different behavior on the same planted input — see DIALECT_CASES).
# ---------------------------------------------------------------------------

DIALECT_PACKS: dict[str, dict] = {
    # Flask/FastAPI-ish: <param> templates; test classes by prefix
    # convention; the first registered route handles.
    "flaskish": {
        "rules": [("mention", MENTION_RE, True)],
        "request_styles": ["angle", "brace_opt"],
        "test_classes": [
            ("^unit_", "UnitTest"),
            ("^int_", "IntegrationTest"),
            ("^e2e_", "E2etest"),
        ],
        "default_test_class": "UnitTest",
        "handler_pick": "first",
        "file_filters": {
            "junk_dirs": ["__pycache__", "node_modules", ".venv"],
            "binary_exts": [".png", ".pyc"],
            "package_files": ["requirements.txt"],
            "include_exts": [".py"],
            "exclude_package_files": ["package.json", "go.mod"],
            "exclude_exts": [".js", ".go"],
            "skip_file_ends": [".sh"],
        },
    },
    # Express/Rails-ish: :param and (param) templates; *_spec naming;
    # LAST registered route wins (Express later-middleware shadowing).
    "expressish": {
        "rules": [("tool", TOOL_RE, False)],
        "request_styles": ["colon", "paren"],
        "test_classes": [
            ("^e2e_", "E2etest"),
            ("spec", "IntegrationTest"),
        ],
        "default_test_class": "UnitTest",
        "handler_pick": "last",
        "file_filters": {
            # documents the reference's ordering quirk in the gate:
            # app.min.js carries the OWN extension .js, so the own-ext
            # include (step 5) beats the .min.js skip suffix (step 7)
            "junk_dirs": ["node_modules", "dist"],
            "binary_exts": [".png"],
            "package_files": ["package.json"],
            "include_exts": [".js", ".ts"],
            "exclude_package_files": ["requirements.txt", "go.mod"],
            "exclude_exts": [".py", ".go"],
            "skip_file_ends": [".min.js"],
        },
    },
    # Next.js/Go-ish: [param] / [...catchall] / {param} templates;
    # anything not explicitly e2e is an integration test.
    "nextish": {
        "rules": [("testref", TESTREF_RE, False)],
        "request_styles": ["catchall", "bracket", "brace"],
        "test_classes": [("^e2e_", "E2etest")],
        "default_test_class": "IntegrationTest",
        "handler_pick": "first",
        "file_filters": {
            "junk_dirs": [".next", "node_modules"],
            "binary_exts": [".png"],
            "package_files": ["package.json"],
            "include_exts": [".tsx", ".ts"],
            "exclude_package_files": ["requirements.txt", "go.mod"],
            # .js claimed by ANOTHER pack here, so app.min.js is
            # excluded — the same planted file flips per dialect
            "exclude_exts": [".py", ".go", ".js"],
            "skip_file_ends": [".stories.tsx"],
        },
    },
    # Go/chi-ish: {param} templates only; table-driven *_test naming;
    # tool extraction DEDUPED per turn (the distinct flag is pack
    # data — expressish keeps every occurrence, goish one per turn).
    "goish": {
        "rules": [("tool", TOOL_RE, True)],
        "request_styles": ["brace"],
        "test_classes": [("_test$", "UnitTest"), ("^e2e_", "E2etest")],
        "default_test_class": "IntegrationTest",
        "handler_pick": "first",
        "file_filters": {
            "junk_dirs": ["vendor"],
            "binary_exts": [".png"],
            "package_files": ["go.mod"],
            "include_exts": [".go"],
            "exclude_package_files": ["package.json", "requirements.txt"],
            "exclude_exts": [".py", ".js"],
            "skip_file_ends": ["_gen.go"],
        },
    },
    # Rails-ish: :param only; rspec naming; mention extraction NOT
    # deduped (flaskish dedups — same rule, different consumer
    # semantics); file stack is an only_include allowlist — the
    # reference's step-1 short-circuit (repo.rs:481-483) where
    # nothing else in the stack is consulted.
    "railsish": {
        "rules": [("mention", MENTION_RE, False)],
        "request_styles": ["colon"],
        "test_classes": [("spec", "UnitTest"), ("^e2e_", "E2etest")],
        "default_test_class": "IntegrationTest",
        "handler_pick": "last",
        "file_filters": {
            "only_include_files": ["src/app.py", "docs/README.md"],
            # ignored by the short-circuit — present to prove it
            "junk_dirs": ["src", "docs"],
        },
    },
}

# ---------------------------------------------------------------------------
# Planted dims: one row set every pack interprets differently.
# (case_id, raw_path, test_name, text) — raw_path mixes template
# styles so each pack normalizes a different subset; test_name hits
# different classifier rules per pack; text carries one hit for each
# pack's extraction rule.
# ---------------------------------------------------------------------------

DIALECT_CASES: list[tuple[int, str, str, str]] = [
    (0, "/api/items/<id>", "unit_core", "ping @AuthCore now"),
    (1, "/api/items/:id", "int_billing", 'tool:fetch(q="x")'),
    (2, "/api/items/{id}", "e2e_checkout", "see ref test_7 here"),
    (3, "/api/(v2)/users", "order_spec", "@AuthCore and @AuthCore"),
    (4, "/api/docs/[...slug]", "helpers", "tool:calc(1) tool:calc(2)"),
    (5, "/api/u/[uid]/posts/", "e2e_spec", "ref test_7 ref test_9"),
]

# Planted file paths: one set every pack's should_not_include stack
# answers differently (own-ext vs other-ext flips, junk dirs, package
# manifests, the own-ext-beats-skip-suffix ordering quirk, and the
# railsish allowlist short-circuit).
FILE_CASES: list[tuple[int, str]] = [
    (0, "src/app.py"),
    (1, "node_modules/leftpad/index.js"),
    (2, "assets/logo.png"),
    (3, "web/app.min.js"),
    (4, "requirements.txt"),
    (5, "package.json"),
    (6, "cmd/server/main.go"),
    (7, "scripts/helper.sh"),
    (8, "src/__pycache__/app.cpython.pyc"),
    (9, "docs/README.md"),
]

# (ep, conv_id, turn_idx): several referencing turns per endpoint so
# 'first' and 'last' handler picks genuinely differ.
HANDLER_CASES: list[tuple[str, str, int]] = [
    ("GET /api/a", "conv_x", 3),
    ("GET /api/a", "conv_x", 7),
    ("GET /api/a", "conv_y", 1),
    ("POST /api/b", "conv_z", 2),
    ("POST /api/b", "conv_z", 9),
]


def dialect_cases_cte() -> str:
    from ..sources.entities import _union_all

    return _union_all(
        DIALECT_CASES,
        ["case_id", "raw_path", "test_name", "text"],
        ["INT", "STRING", "STRING", "STRING"],
    )


def handler_cases_cte() -> str:
    from ..sources.entities import _union_all

    return _union_all(
        HANDLER_CASES, ["ep", "conv_id", "turn_idx"], ["STRING", "STRING", "INT"]
    )


def file_cases_cte() -> str:
    from ..sources.entities import _union_all

    return _union_all(FILE_CASES, ["case_id", "fpath"], ["INT", "STRING"])


# ---------------------------------------------------------------------------
# Pack interpreters — fixed operators rendering dialect-portable SQL
# from pack data. No pack-specific code anywhere below this line.
# ---------------------------------------------------------------------------

def classify_test_sql(pack: dict, name_expr: str, dialect: str) -> str:
    """classify_test as data: ordered (regex, class) rules + default
    (queries/mod.rs:183 override)."""
    rx = "regexp_like" if dialect == "spark" else "regexp_matches"
    arms = " ".join(
        f"WHEN {rx}({name_expr}, '{pat}') THEN '{cls}'"
        for pat, cls in pack["test_classes"]
    )
    return f"CASE {arms} ELSE '{pack['default_test_class']}' END"


def normalize_request_sql(pack: dict, path_expr: str, dialect: str) -> str:
    """The dialect's backend-path normalization — only the pack's
    declared template styles rewrite to :param."""
    return normalize_backend_path_sql(path_expr, dialect, styles=pack["request_styles"])


def handler_pick_sql(pack: dict, dialect: str) -> str:
    """handler_finder as data: the globally-first or -last referencing
    turn per endpoint, as a struct-min/max AGGREGATE (map-side
    combine; never a per-endpoint window — mod.rs:208-223 analog).
    Renders a full SELECT over a `hc(ep, conv_id, turn_idx)` CTE."""
    agg = "min" if pack["handler_pick"] == "first" else "max"
    if dialect == "spark":
        return (
            f"SELECT ep, {agg}(struct(conv_id, turn_idx)).conv_id AS conv_id,"
            f" {agg}(struct(conv_id, turn_idx)).turn_idx AS turn_idx FROM hc GROUP BY ep"
        )
    # DuckDB oracle: a row_number pick over the same lexicographic
    # (conv_id, turn_idx) order — a deliberately different (window)
    # implementation of the same semantics
    d = "ASC" if pack["handler_pick"] == "first" else "DESC"
    return (
        "SELECT ep, conv_id, turn_idx FROM ("
        " SELECT ep, conv_id, turn_idx, row_number() OVER ("
        f" PARTITION BY ep ORDER BY conv_id {d}, turn_idx {d}) AS rk FROM hc) WHERE rk = 1"
    )


def dialect_surface_body(pack_name: str, pack: dict, dialect: str) -> str:
    """The pack's SQL hook surface over the planted dims as ONE
    UNION-ALL body (pack, kind, id, value) assuming `dc` / `hc` CTEs
    are in scope — identical semantics rendered per dialect, so the
    Spark engine and DuckDB oracle share a single pack definition.
    The extraction arm is NOT here: the engine runs it through the
    Arrow rule-pack executor (the real production path) while the
    oracle uses SQL regexp — see kg_dialects."""
    from .files import should_include_sql

    norm = normalize_request_sql(pack, "raw_path", dialect)
    cls = classify_test_sql(pack, "test_name", dialect)
    pick = handler_pick_sql(pack, dialect)
    body = (
        f"SELECT '{pack_name}' AS pack, 'norm' AS kind, CAST(case_id AS STRING) AS id,"
        f" {norm} AS value FROM dc"
        f" UNION ALL SELECT '{pack_name}', 'test', CAST(case_id AS STRING), {cls} FROM dc"
        f" UNION ALL SELECT '{pack_name}', 'handler', ep,"
        f" conv_id || '#' || CAST(turn_idx AS STRING) FROM ({pick})"
    )
    if pack.get("file_filters"):
        # should_include_sql renders LIKE/IN/= only — already
        # dialect-portable, ONE rendering serves engine and oracle
        inc = should_include_sql("fpath", pack["file_filters"])
        body += (
            f" UNION ALL SELECT '{pack_name}', 'file', fpath,"
            f" CAST({inc} AS STRING) FROM fc"
        )
    return body


def dialect_surface_sql(pack_name: str, pack: dict, dialect: str) -> str:
    return (
        f"WITH dc AS ({dialect_cases_cte()}), hc AS ({handler_cases_cte()}),"
        f" fc AS ({file_cases_cte()}) "
        + dialect_surface_body(pack_name, pack, dialect)
    )


def dialects_oracle_sql(packs: dict[str, dict] | None = None) -> str:
    """The full kg_dialects DuckDB oracle: every pack's hook surface
    PLUS its extraction rules (as SQL regexp — the independent second
    implementation of the Arrow executor) in one WITH query."""
    packs = packs if packs is not None else DIALECT_PACKS
    arms = []
    for name in sorted(packs):
        arms.append(dialect_surface_body(name, packs[name], "duckdb"))
        arms.append(dialect_extract_oracle_sql(name, packs[name]))
    return (
        f"WITH dc AS ({dialect_cases_cte()}), hc AS ({handler_cases_cte()}),"
        f" fc AS ({file_cases_cte()}) "
        + " UNION ALL ".join(arms)
    )


def run_dialect_pack(spark, pack_name: str, pack: dict) -> DataFrame:
    """Engine-side evaluation of one pack: the SQL hook surface plus
    the pack's extraction rules through the Arrow-batched rule-pack
    executor (extract.py) over the planted turns."""
    from .extract import extract_mentions_rulepack

    surface = spark.sql(dialect_surface_sql(pack_name, pack, "spark"))
    turns = spark.sql(
        "SELECT 'dialect_conv' AS conv_id, case_id AS turn_idx, text"
        f" FROM ({dialect_cases_cte()})"
    )
    ext = extract_mentions_rulepack(turns, pack["rules"]).drop("rule")
    if all(d for _, _, d in pack["rules"]):
        ext = ext.distinct()
    ext = ext.selectExpr(
        f"'{pack_name}' AS pack",
        "'extract' AS kind",
        "CAST(turn_idx AS STRING) AS id",
        "surface AS value",
    )
    return surface.unionByName(ext)


def dialect_extract_oracle_sql(pack_name: str, pack: dict) -> str:
    """DuckDB rendering of the pack's extraction rules (independent
    second implementation of the Arrow executor's semantics)."""
    arms = []
    for _rname, pattern, distinct in pack["rules"]:
        # the executor emits capture group 1 when the regex has one
        grp = 1 if "(" in pattern.replace("\\(", "").replace("(?:", "") else 0
        sel = (
            f"SELECT case_id, unnest(regexp_extract_all(text, '{pattern}', {grp})) AS surface"
            f" FROM dc"
        )
        if distinct:
            sel = f"SELECT DISTINCT case_id, surface FROM ({sel})"
        arms.append(sel)
    union = " UNION ALL ".join(arms)
    return (
        f"SELECT '{pack_name}' AS pack, 'extract' AS kind,"
        f" CAST(case_id AS STRING) AS id, surface AS value FROM ({union})"
    )
