"""Session-proofing regression (round-2 VERDICT 'What's wrong' #1).

The driver's harness session keeps Spark's DEFAULT
`spark.sql.variable.substitute=true`, which rewrites any `${...}`
span in SQL text BEFORE parsing. Round 2's planted path dims embedded
`${ROOT}`/`${id}` literals and were mangled under that session
(kg_path_norm hash-red, kg_paths_match 2/5 rows) while passing under
the engine's own session (session.py disables substitution).

Contract queries must not depend on session config the driver doesn't
control, so:
  1. no rendered SQL — engine or oracle dialect — may contain the
     `${` digram at all (the literals are rendered as `'$' || '{...'`
     concats);
  2. the path-parity queries must produce oracle-identical results
     with substitution forced ON.
"""

import duckdb
import pytest

from tests.conftest import SF_MID, _connect


def _all_entry_sql():
    import __spark_entry__ as E

    return E.oracle_sql()


def test_no_dollar_brace_in_oracle_sql():
    for name, sql in _all_entry_sql().items():
        assert "${" not in sql, f"oracle_sql[{name}] contains the ${{ digram"


def test_no_dollar_brace_in_spark_fragments():
    from stakgraph_spark.functions import paths as P

    for dialect in ("spark", "duckdb"):
        for frag in (
            P.normalize_frontend_path_sql("raw", dialect),
            P.normalize_backend_path_sql("raw", dialect),
            P.paths_match_sql("a", "b", dialect),
        ):
            assert "${" not in frag, f"{dialect} fragment contains ${{: {frag}"
    for cte in (P.request_paths_cte(), P.endpoint_paths_cte()):
        assert "${" not in cte


@pytest.mark.parametrize("qname", ["kg_path_norm", "kg_paths_match"])
def test_path_queries_under_substituting_session(spark, qname):
    """Force the driver's default substitution ON and require exact
    oracle parity — the literal reproduction of the round-2 failure
    mode."""
    import __spark_entry__ as E

    old = spark.conf.get("spark.sql.variable.substitute")
    spark.conf.set("spark.sql.variable.substitute", "true")
    try:
        sdf = E.queries()[qname](spark, SF_MID)
        srows = sorted(tuple(r) for r in sdf.collect())
    finally:
        spark.conf.set("spark.sql.variable.substitute", old)
    con = _connect(SF_MID)
    try:
        orows = sorted(tuple(r) for r in con.execute(E.oracle_sql()[qname]).fetchall())
    finally:
        con.close()
    assert srows == orows
