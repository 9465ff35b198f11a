"""Stage-by-stage parity: Spark DataFrame pipeline vs DuckDB oracle SQL.

This is the repo-local version of the driver's correctness gate: every
pipeline query must produce bit-identical rows (after column-name sort and
null-safe stringify) to the independently-executed oracle SQL.
"""

from __future__ import annotations

import pytest

from timberline_spark import queries, sqlgen

from .conftest import SF_TINY, assert_frames_equal

FLOAT_COLS = {"summary": ("error_rate", "warning_rate")}

STAGES = [n for n in queries.PIPELINE_QUERIES if n != "parse_pandas_udf"]


@pytest.mark.parametrize("name", STAGES)
def test_stage_matches_oracle(spark, duck, name):
    sdf = queries.PIPELINE_QUERIES[name](spark, SF_TINY)
    oracle = duck.sql(getattr(sqlgen, f"q_{name}")())
    assert_frames_equal(sdf, oracle, float_cols=FLOAT_COLS.get(name, ()))


def test_pandas_udf_grok_equals_native(spark):
    """The Arrow-batched pandas-UDF grok path must equal the native path."""
    from .conftest import normalize

    a = normalize(queries.q_parse(spark, SF_TINY).toPandas())
    b = normalize(queries.q_parse_pandas_udf(spark, SF_TINY).toPandas())
    assert a.equals(b)
