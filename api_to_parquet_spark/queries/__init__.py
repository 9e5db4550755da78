"""Query surface registry.

Every operator in SURVEY.md §2 (plus the training-data-pipeline extension
set) is exposed as a named query: a (spark, sf_dir) -> DataFrame callable,
and — where SQL-expressible — a DuckDB oracle string with identical column
names/types. The driver compares them value-by-value; both sides round any
float arithmetic to a fixed precision so the comparison is order- and
accumulation-order-insensitive.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from api_to_parquet_spark import (
    dedup,
    multimodal,
    pipeline,
    sampling,
    similarity,
    text,
)
from api_to_parquet_spark.queries import (
    advanced,
    formats,
    kql,
    kql_registry,
    mining,
    reference,
    relational,
    scalars,
    streamingq,
    tpch,
    windows,
)

QueryFn = Callable[[SparkSession, str], DataFrame]

_MODULES = [
    reference,
    relational,
    tpch,
    windows,
    scalars,
    advanced,
    mining,
    streamingq,
    kql_registry,  # the kql translator's QUERIES/ORACLE (round-12 split)
    sampling,
    dedup,
    similarity,
    text,
    pipeline,
    multimodal,
    formats,
]


def all_queries() -> dict[str, QueryFn]:
    """Registry in round-robin module order: one query from each family in
    turn. The correctness driver samples a prefix of this dict in
    insertion order, so interleaving guarantees any prefix spans every
    operator family (reference parity, relational, TPC-H, windows,
    dedup, similarity, text, streaming, ...) instead of exhausting one
    module before reaching the next."""
    lists = [list(m.QUERIES.items()) for m in _MODULES]
    out: dict[str, QueryFn] = {}
    for i in range(max(len(lst) for lst in lists)):
        for lst in lists:
            if i < len(lst):
                k, v = lst[i]
                out[k] = v
    return out


def all_oracles() -> dict[str, str]:
    out: dict[str, str] = {}
    for m in _MODULES:
        out.update(m.ORACLE)
    return out
