from __future__ import annotations

import duckdb
import pytest

from timberline_spark.session import get_spark

SF_TINY = "/root/testdata/sf0.001"
SF_SMALL = "/root/testdata/sf0.01"

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


@pytest.fixture(scope="session")
def spark():
    sp = get_spark("timberline_tests", cores=8, shuffle_partitions=8)
    yield sp


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_TINY}/{t}.parquet'"
        )
    yield con
    con.close()


def normalize(pdf):
    """Sort columns by name, null-safe stringify, sort rows — for equality."""
    pdf = pdf[sorted(pdf.columns)]
    pdf = pdf.astype(object).where(pdf.notna(), "<NULL>").astype(str)
    return pdf.sort_values(list(pdf.columns)).reset_index(drop=True)


def assert_frames_equal(spark_df, duck_rel, float_cols=()):
    import numpy as np

    s = normalize(spark_df.toPandas())
    d = normalize(duck_rel.df())
    assert len(s) == len(d), f"row count {len(s)} != {len(d)}"
    assert list(s.columns) == list(d.columns), (s.columns, d.columns)
    for c in s.columns:
        if c in float_cols:
            a = s[c].replace("<NULL>", "nan").astype(float)
            b = d[c].replace("<NULL>", "nan").astype(float)
            assert np.allclose(a, b, rtol=1e-9, atol=1e-9, equal_nan=True), c
        else:
            bad = s[c].values != d[c].values
            assert not bad.any(), (
                c,
                s[bad].head(3).to_dict("records"),
                d[bad].head(3).to_dict("records"),
            )
