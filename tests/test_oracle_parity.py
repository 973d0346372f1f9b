"""Differential gate: the Spark engine vs the DuckDB SQL oracle —
full row-set equality per stage (the compare_graphs.rs:79-102
analog). Uses the same oracle strings the driver runs
(__spark_entry__.oracle_sql)."""

import pandas as pd
import pytest

import __spark_entry__ as ENTRY
from tests.conftest import SF_SMALL

CASES = sorted(ENTRY.queries().keys())


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    cols = sorted(df.columns)
    out = df[cols].copy()
    for c in cols:
        if out[c].dtype.kind in "iu":
            out[c] = out[c].astype("int64")
    return out.sort_values(cols).reset_index(drop=True)


@pytest.mark.parametrize("name", CASES)
def test_query_matches_oracle(name, spark, duck):
    sdf = ENTRY.queries()[name](spark, SF_SMALL)
    got = _normalize(sdf.toPandas())
    want = _normalize(duck.execute(ENTRY.oracle_sql()[name]).df())
    assert list(got.columns) == list(want.columns), (got.columns, want.columns)
    assert len(got) == len(want), f"{name}: {len(got)} vs {len(want)}"
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_rulepack_extractor_equals_builtin(spark):
    """The Arrow-batched pandas rule-pack executor must agree with the
    JVM-side built-in extraction path."""
    from stakgraph_spark.operators.extract import extract_mentions, extract_mentions_rulepack
    from stakgraph_spark.sources.transcripts import read_transcripts

    t = read_transcripts(spark, SF_SMALL)
    a = _normalize(extract_mentions(t).toPandas())
    b = _normalize(
        extract_mentions_rulepack(t).drop("rule").toPandas()
    )
    pd.testing.assert_frame_equal(a, b, check_dtype=False)
