"""Typed schemas for the ingest surface.

Mirrors the reference's fixed 8-column row (/root/reference/src/main.go:58-67)
and batch envelope (/root/reference/src/main.go:69-75). Types follow
SURVEY.md §1.1: the reference's ambiguous int32-vs-INT64 tags (Sequence,
Quality) are standardized to LongType. No schema inference anywhere — the
contract is static, which is what lets Catalyst prune and push down reliably.
"""

from __future__ import annotations

from pyspark.sql import types as T

# One time-series point — the fact row (reference src/main.go:58-67).
POINT_SCHEMA = T.StructType(
    [
        T.StructField("Timestamp", T.LongType(), True),
        T.StructField("TimeOffsetHours", T.LongType(), True),
        T.StructField("PointId", T.StringType(), True),
        T.StructField("Sequence", T.LongType(), True),
        T.StructField("Project", T.StringType(), True),
        T.StructField("Value", T.DoubleType(), True),
        T.StructField("Res", T.StringType(), True),
        T.StructField("Quality", T.LongType(), True),
    ]
)

# Batch envelope (reference src/main.go:69-75).
ENVELOPE_SCHEMA = T.StructType(
    [
        T.StructField("content", T.ArrayType(POINT_SCHEMA), True),
        T.StructField("id", T.StringType(), True),
        T.StructField("source", T.StringType(), True),
        T.StructField("timeGenerated", T.LongType(), True),
        T.StructField("file", T.StringType(), True),
    ]
)

# Go zero-value fill (SURVEY.md §1.2): the reference's BindJSON yields
# zero values, never NULLs, for absent fields (src/main.go:252).
ZERO_FILL: dict[str, object] = {
    "Timestamp": 0,
    "TimeOffsetHours": 0,
    "PointId": "",
    "Sequence": 0,
    "Project": "",
    "Value": 0.0,
    "Res": "",
    "Quality": 0,
}

POINT_COLUMNS = [f.name for f in POINT_SCHEMA.fields]

# Lake partition scheme: <source>/YYYY/MM/DD/HH/<file_key>/
# (reference README.md:5, tests/main.go:61-64). file_key = md5(file) — the
# reference's own temp-file naming idiom (src/main.go:288-290) — makes the
# batch the finest partition, so dynamic partition overwrite replaces
# exactly a re-POSTed `file` key (README.md:88) while distinct batches in
# the same hour coexist.
PARTITION_COLUMNS = ["source", "year", "month", "day", "hour", "file_key"]
