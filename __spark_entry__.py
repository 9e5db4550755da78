"""Driver contract for the spark-graft builder (PySpark target).

`entry` runs the flagship star-join query at sf0.001; `queries()` exposes
every implemented operator from SURVEY.md §2 (+ training-data extensions);
`oracle_sql()` gives the DuckDB twin for each SQL-expressible one.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from api_to_parquet_spark.queries import all_oracles, all_queries


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the TPC-H Q5-shaped star
    join (broadcast dims + single fact shuffle + grouped agg)."""
    qs = all_queries()
    return qs["revenue_by_nation"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return all_queries()


def oracle_sql() -> dict[str, str]:
    return all_oracles()
