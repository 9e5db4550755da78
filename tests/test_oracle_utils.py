"""Canary tests for the oracle comparison harness itself.

Round-4 postmortem: an all-NULL boolean column crossed the two pandas
bridges differently — Spark ``toPandas()`` gives object-dtype ``None``
while DuckDB ``.df()`` gives object-dtype float ``NaN`` — and the
normalizer stringified them to different markers. These canaries push
all-NULL columns of several types through ``compare`` end-to-end so a
future bridge-dtype drift fails loudly here, not in a random registry
entry the driver happens to sample.
"""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest

from tests.oracle_utils import _normalize, compare


@pytest.fixture(scope="module")
def con():
    return duckdb.connect()


def test_all_null_bool_column(spark, con):
    df = spark.sql(
        "SELECT id AS k, CAST(NULL AS BOOLEAN) AS b FROM range(3)"
    )
    compare(df, con, "SELECT range AS k, CAST(NULL AS BOOLEAN) AS b FROM range(3)")


def test_all_null_bigint_column(spark, con):
    df = spark.sql("SELECT id AS k, CAST(NULL AS BIGINT) AS n FROM range(3)")
    compare(df, con, "SELECT range AS k, CAST(NULL AS BIGINT) AS n FROM range(3)")


def test_all_null_string_and_timestamp(spark, con):
    df = spark.sql(
        "SELECT id AS k, CAST(NULL AS STRING) AS s,"
        " CAST(NULL AS TIMESTAMP) AS t FROM range(3)"
    )
    compare(
        df,
        con,
        "SELECT range AS k, CAST(NULL AS VARCHAR) AS s,"
        " CAST(NULL AS TIMESTAMP) AS t FROM range(3)",
    )


def test_mixed_null_bool_column(spark, con):
    df = spark.sql(
        "SELECT id AS k, CASE WHEN id = 1 THEN true"
        " WHEN id = 2 THEN false END AS b FROM range(4)"
    )
    compare(
        df,
        con,
        "SELECT range AS k, CASE WHEN range = 1 THEN true"
        " WHEN range = 2 THEN false END AS b FROM range(4)",
    )


def test_normalize_maps_none_nan_na_nat_identically():
    a = _normalize(pd.DataFrame({"c": pd.Series([None, "x"], dtype=object)}))
    b = _normalize(pd.DataFrame({"c": pd.Series([np.nan, "x"], dtype=object)}))
    c = _normalize(pd.DataFrame({"c": pd.Series([pd.NA, "x"], dtype=object)}))
    d = _normalize(pd.DataFrame({"c": pd.Series([pd.NaT, "x"], dtype=object)}))
    assert (a["c"] == b["c"]).all()
    assert (a["c"] == c["c"]).all()
    assert (a["c"] == d["c"]).all()
    assert a["c"].iloc[0] == "\x00NULL"
