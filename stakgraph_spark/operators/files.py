"""File-inclusion predicate stack — `should_not_include` as DATA.

The reference gates every walked file through an ordered predicate
chain before parsing (ast/src/repo.rs:477-526):

  1. only_include_files non-empty  -> include iff listed (nothing
     else is consulted — an allowlist short-circuit, repo.rs:481-483)
  2. any junk-directory path segment        -> exclude (repo.rs:485)
  3. common binary extension                -> exclude (repo.rs:490)
  4. the language's own package file        -> INCLUDE (repo.rs:496;
     requirements.txt / package.json-style manifests beat the
     extension checks)
  5. the language's own extension           -> include (repo.rs:500)
  6. another language's package file or
     exclusive extension                    -> exclude (repo.rs:506-519)
  7. skip_file_ends suffix                  -> exclude (repo.rs:521)
  8. default                                -> include

Each language overrides the lists via the Stack trait + merged
config; here the whole stack is a `filters` dict a dialect pack
carries (operators/dialects.py), rendered as ONE boolean SQL
fragment built only from `LIKE` / `IN` / `=` — identical in Spark
and DuckDB (so the dialect oracle shares the rendering) and made of
string predicates Catalyst can push toward the scan. Note the
reference's ordering quirk is preserved deliberately: a file with
the language's OWN extension is included at step 5 even when a
skip_file_ends suffix also matches (step 7 is only reached by
files no extension rule claimed).

filters keys (all optional; `{}` / None includes everything):
  only_include_files     exact relative paths (step 1)
  junk_dirs              disqualifying path segments (step 2)
  binary_exts            never-parsed extensions (step 3)
  package_files          file NAMES force-included (step 4)
  include_exts           the dialect's own extensions (step 5)
  exclude_package_files  other languages' manifests (step 6)
  exclude_exts           other languages' extensions (step 6)
  skip_file_ends         suffixes to skip, e.g. '.min.js' (step 7)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_ESC = "!"


def _lit(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def _wild(expr: str, prefix: str, value: str, suffix: str) -> str:
    """LIKE whose wildcard structure is OURS (prefix/suffix '%') and
    whose middle is the escaped user VALUE — a bare `_` in data like
    '_pb2.py' would otherwise wildcard. Explicit ESCAPE clause: the
    default escape char differs between engines, `ESCAPE '!'` parses
    identically in both."""
    escaped = (
        value.replace(_ESC, _ESC + _ESC)
        .replace("%", _ESC + "%")
        .replace("_", _ESC + "_")
    )
    return f"{expr} LIKE {_lit(prefix + escaped + suffix)} ESCAPE '{_ESC}'"


def _any(arms: list[str]) -> str:
    return "(" + " OR ".join(arms) + ")" if arms else "FALSE"


def should_include_sql(path_expr: str, filters: dict | None) -> str:
    """Boolean SQL fragment: True iff the file survives the stack.
    Portable Spark/DuckDB (LIKE/IN/= only)."""
    if not filters:
        return "TRUE"
    only = filters.get("only_include_files")
    if only:
        return f"({path_expr} IN (" + ", ".join(_lit(p) for p in only) + "))"

    junk = _any(
        [
            f"({_wild(path_expr, '%/', d, '/%')} OR {_wild(path_expr, '', d, '/%')})"
            for d in filters.get("junk_dirs", ())
        ]
    )
    binary = _any(
        [_wild(path_expr, "%", e, "") for e in filters.get("binary_exts", ())]
    )
    pkg = _any(
        [
            f"({path_expr} = {_lit(n)} OR {_wild(path_expr, '%/', n, '')})"
            for n in filters.get("package_files", ())
        ]
    )
    own = _any(
        [_wild(path_expr, "%", e, "") for e in filters.get("include_exts", ())]
    )
    other_pkg = _any(
        [
            f"({path_expr} = {_lit(n)} OR {_wild(path_expr, '%/', n, '')})"
            for n in filters.get("exclude_package_files", ())
        ]
    )
    other_ext = _any(
        [_wild(path_expr, "%", e, "") for e in filters.get("exclude_exts", ())]
    )
    skip = _any(
        [_wild(path_expr, "%", s, "") for s in filters.get("skip_file_ends", ())]
    )
    return (
        f"(NOT {junk} AND NOT {binary} AND ({pkg} OR {own} OR "
        f"(NOT {other_pkg} AND NOT {other_ext} AND NOT {skip})))"
    )


def filter_files(df: DataFrame, filters: dict | None, path_col: str = "file") -> DataFrame:
    """The packaged should_not_include stack as a DataFrame filter —
    a single .where() of sargable string predicates, so at scale the
    exclusion happens at the scan, not after it."""
    return df.where(F.expr(should_include_sql(path_col, filters)))
