"""Multi-format source/sink fidelity (queries/formats.py)."""

from __future__ import annotations

import math

import pytest

from pyspark.sql import functions as F


def test_csv_float_roundtrip_exact(spark, tmp_path):
    """Doubles survive the CSV text roundtrip bitwise: Spark writes
    shortest-roundtrip representations, and schema-on-read parses them
    back to the identical IEEE value (including -0.0 and subnormals)."""
    vals = [1.0 / 3.0, math.pi, 1e-300, 5e-324, -0.0, 123456789.123456789]
    df = spark.createDataFrame([(i, v) for i, v in enumerate(vals)], "i long, x double")
    target = str(tmp_path / "csv_floats")
    df.write.mode("overwrite").option("header", "true").csv(target)
    back = (
        spark.read.option("header", "true").schema("i long, x double").csv(target)
    )
    got = {r["i"]: r["x"] for r in back.collect()}
    for i, v in enumerate(vals):
        assert math.copysign(1.0, got[i]) == math.copysign(1.0, v)
        assert got[i] == v


@pytest.mark.parametrize("fmt", ["csv", "json", "orc"])
def test_roundtrip_preserves_rowcount(spark, sf_smoke, fmt):
    from api_to_parquet_spark.queries import formats
    from api_to_parquet_spark.lake import load

    q = {
        "csv": formats.q_csv_roundtrip,
        "json": formats.q_jsonl_roundtrip,
        "orc": formats.q_orc_roundtrip,
    }[fmt]
    agg = q(spark, sf_smoke)
    total = agg.agg(F.sum("n").alias("t")).collect()[0]["t"]
    assert total == load(spark, sf_smoke, "events").count()


def test_xml_roundtrip_escapes_markup(spark, tmp_path):
    """XML entity escaping: values carrying markup characters survive
    the write/read cycle byte-identically."""
    src = spark.createDataFrame(
        [(1, 'a<b>&"c'), (2, "plain")], "k BIGINT, v STRING"
    )
    path = str(tmp_path / "xml")
    (
        src.write.format("xml").option("rootTag", "rows")
        .option("rowTag", "row").mode("overwrite").save(path)
    )
    back = (
        spark.read.format("xml").option("rowTag", "row")
        .schema("k BIGINT, v STRING").load(path)
    )
    assert sorted(map(tuple, back.collect())) == sorted(
        map(tuple, src.collect())
    )
