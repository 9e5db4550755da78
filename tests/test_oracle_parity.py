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


def test_approx_sketches_close_to_exact(spark, sf_smoke, duck):
    """approx_sketches has no value oracle (approximate by design); assert
    HLL distinct counts within the configured 2% rsd (x5 slack) and the
    approx median within 10% of the exact one."""
    approx = {
        r["event_type"]: r
        for r in QUERIES["approx_sketches"](spark, sf_smoke).collect()
    }
    exact = duck.execute(
        "SELECT event_type, COUNT(DISTINCT user_id) AS du,"
        " median(value) AS med FROM events GROUP BY 1"
    ).fetchall()
    assert len(exact) == len(approx)
    for event_type, du, med in exact:
        a = approx[event_type]
        assert abs(a["approx_users"] - du) <= max(2, 0.1 * du)
        assert abs(a["approx_median"] - med) <= 0.1 * abs(med)
