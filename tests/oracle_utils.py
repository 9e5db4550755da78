"""Local twin of the driver's DuckDB-oracle comparison: row-count, schema
(column names), and order-insensitive value equality after sorting columns
by name and rows by value."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd

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


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = s.astype("datetime64[us]").astype("int64")
        elif pd.api.types.is_float_dtype(s):
            df[c] = s.astype("float64")
        elif pd.api.types.is_integer_dtype(s):
            df[c] = s.astype("float64")  # unify int widths; exact for < 2^53
        elif pd.api.types.is_bool_dtype(s):
            df[c] = s.astype("float64")
        else:
            # Bridge-dtype edge: an all-NULL column arrives as object None
            # from Spark toPandas() but as object float-NaN from DuckDB
            # .df(); map both (and pd.NA/NaT) to the same null marker.
            df[c] = s.astype("object").map(
                lambda v: "\x00NULL"
                if v is None
                or v is pd.NaT
                or v is pd.NA
                or (isinstance(v, float) and v != v)
                else str(v)
            )
    df = df.sort_values(by=list(df.columns), na_position="first").reset_index(
        drop=True
    )
    return df


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> None:
    got = _normalize(spark_df.toPandas())
    want = _normalize(con.sql(sql).df())
    assert list(got.columns) == list(want.columns), (
        f"columns differ: spark={list(got.columns)} oracle={list(want.columns)}"
    )
    assert len(got) == len(want), f"row count: spark={len(got)} oracle={len(want)}"
    for c in got.columns:
        g, w = got[c].to_numpy(), want[c].to_numpy()
        if g.dtype.kind == "f":
            ok = np.allclose(g, w, rtol=0, atol=1e-9, equal_nan=True)
        else:
            ok = (g == w).all()
        if not ok:
            bad = np.nonzero(
                ~(np.isclose(g, w, rtol=0, atol=1e-9, equal_nan=True))
                if g.dtype.kind == "f"
                else ~(g == w)
            )[0][:5]
            raise AssertionError(
                f"column {c} differs at rows {bad.tolist()}: "
                f"spark={g[bad][:5].tolist()} oracle={w[bad][:5].tolist()}"
            )
