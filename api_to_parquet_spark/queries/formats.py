"""Multi-format source/sink roundtrips (SURVEY.md §2.1 extension).

The reference's only at-rest format is parquet (src/main.go:23-56); a
complete Spark engine is expected to ingest and emit the other mainstream
lake formats too. Each query here writes a typed projection of `events`
out through one format's sink, reads it back through that format's source
(schema-on-read, distributed scan both ways), and aggregates — the oracle
runs the same aggregate on the original parquet, so a value mismatch
pinpoints fidelity loss in the format path.

Columns are restricted to exact types (longs + strings; money as integer
cents, time as epoch millis) so the comparison is bitwise across text
formats — float-in-text roundtrips are exercised separately by the CSV
options test in tests/test_formats.py.

Scale: the write is a normal distributed job (one file per task); the
read-back is a plain multi-file scan. CSV/JSON read with an explicit
schema to skip the inference pass a blind reader would pay at 100 TB.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from api_to_parquet_spark.lake import load

_SCHEMA = (
    "event_id long, user_id long, event_type string,"
    " epoch_ms long, cents long"
)


def _typed_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "event_type",
        F.unix_millis("ts").alias("epoch_ms"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )


def _roundtrip(spark: SparkSession, sf_dir: str, fmt: str) -> DataFrame:
    tag = os.path.basename(sf_dir.rstrip("/"))
    target = os.path.join(
        tempfile.gettempdir(), "spark_graft_formats", f"{fmt}_{tag}"
    )
    writer = _typed_events(spark, sf_dir).write.mode("overwrite").format(fmt)
    if fmt == "csv":
        writer = writer.option("header", "true")
    if fmt == "xml":
        writer = writer.option("rootTag", "events").option("rowTag", "event")
    writer.save(target)
    reader = spark.read.format(fmt)
    if fmt == "csv":
        reader = reader.option("header", "true")
    if fmt == "xml":
        reader = reader.option("rowTag", "event")
    back = reader.schema(_SCHEMA).load(target)
    return (
        back.groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.countDistinct("user_id").alias("n_users"),
            F.sum("cents").alias("sum_cents"),
            F.max("epoch_ms").alias("max_epoch_ms"),
        )
    )


def q_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events → CSV sink (header, quoted) → CSV source → aggregate."""
    return _roundtrip(spark, sf_dir, "csv")


def q_jsonl_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events → JSON-lines sink → JSON source → aggregate."""
    return _roundtrip(spark, sf_dir, "json")


def q_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events → ORC sink → ORC source → aggregate (columnar twin of the
    parquet lake; same pushdown/pruning machinery applies)."""
    return _roundtrip(spark, sf_dir, "orc")


def q_xml_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events → XML sink → XML source → aggregate, via Spark 4's native
    XML data source (rowTag element per record) — the enterprise-feed
    format the reference cannot read at all."""
    return _roundtrip(spark, sf_dir, "xml")


_AGG_ORACLE = """
    SELECT event_type, COUNT(*) AS n,
           COUNT(DISTINCT user_id) AS n_users,
           SUM(CAST(ROUND(value * 100) AS BIGINT))::BIGINT AS sum_cents,
           MAX(epoch_ms(ts)) AS max_epoch_ms
    FROM events GROUP BY event_type
"""

QUERIES = {
    "csv_roundtrip": q_csv_roundtrip,
    "jsonl_roundtrip": q_jsonl_roundtrip,
    "orc_roundtrip": q_orc_roundtrip,
    "xml_roundtrip": q_xml_roundtrip,
}

ORACLE = {
    "csv_roundtrip": _AGG_ORACLE,
    "jsonl_roundtrip": _AGG_ORACLE,
    "orc_roundtrip": _AGG_ORACLE,
    "xml_roundtrip": _AGG_ORACLE,
}
