"""Every queries() entry with an oracle must match DuckDB on the same
parquet tables — the local twin of the driver's correctness gate.

Runs at sf0.001 by default (fast); set SPARK_GRAFT_SF_ORACLE=/root/testdata/sf0.01
to reproduce the driver's exact scale.
"""

from __future__ import annotations

import pytest

from api_to_parquet_spark.queries import all_oracles, all_queries
from tests.oracle_utils import compare, duck_connection

QUERIES = all_queries()
ORACLES = all_oracles()


@pytest.fixture(scope="module")
def duck(sf_smoke):
    con = duck_connection(sf_smoke)
    yield con
    con.close()


def test_every_oracle_has_a_query():
    assert set(ORACLES) <= set(QUERIES)


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_parity(spark, sf_smoke, duck, name):
    df = QUERIES[name](spark, sf_smoke)
    compare(df, duck, ORACLES[name])
