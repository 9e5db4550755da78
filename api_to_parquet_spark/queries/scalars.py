"""Scalar function surface (SURVEY.md §2.8): everything the reference
computes row-wise — md5 digests for content keys (F1, src/main.go:288-290),
path formatting (F4, tests/main.go:61-64), epoch handling (F5), greatest
(F7) — expressed as JVM-side built-ins inside whole-stage codegen; no
Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from api_to_parquet_spark.lake import load


def q_scalar_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-wise kitchen sink over documents: digest, casing, substring,
    path concat, printf formatting, greatest/least."""
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.md5("text").alias("text_md5"),
        F.length("text").alias("text_len"),
        F.upper(F.substring("text", 1, 8)).alias("head"),
        F.concat_ws("/", "lang", "source").alias("lake_path"),
        F.format_string("%06d", "doc_id").alias("doc_key"),
        F.greatest(F.col("n_chars"), F.length("text")).alias("max_len"),
    )


def q_epoch_conversions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Epoch/date conversions at the query layer only (SURVEY.md §1.4 —
    storage keeps opaque int64s): ms epoch, day truncation, Y/M/D/H parts
    and the reference's lake path formatting from a timestamp."""
    ev = load(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.unix_millis("ts").alias("epoch_ms"),
        F.year("ts").alias("y"),
        F.month("ts").alias("m"),
        F.dayofmonth("ts").alias("d"),
        F.hour("ts").alias("h"),
        F.concat(
            F.col("event_type"), F.lit("/"), F.date_format("ts", "yyyy/MM/dd/HH")
        ).alias("lake_prefix"),
    )


def q_string_cleanup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text normalization primitives: trim/lower/regexp_replace/split."""
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.lower(F.trim("text")).alias("norm_text"),
        F.regexp_replace("text", r"[^a-z ]", "").alias("alpha_only"),
        F.size(F.split(F.trim("text"), r"\s+")).alias("n_tokens"),
    )


def q_pandas_udaf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-AGGREGATE pandas UDF — the UDAF shape of the §2.10
    extension surface (scalar / grouped-map / mapInPandas / mapInArrow /
    state / UDTF are exercised elsewhere). Geometric mean per event_type.
    Scale note: unlike native aggregates, a grouped-agg pandas UDF gets
    NO partial (map-side) aggregation — every group's raw values shuffle
    to one task — which is exactly why the engine keeps Python out of
    hot aggregates and this exists as the extension-point demo. The
    oracle is the algebraic identity exp(avg(ln x)), so the Python path
    is value-checked, not just smoke-tested. Round to 6 dp: numpy and
    DuckDB accumulate the log-mean in different orders."""
    from pyspark.sql.functions import PandasUDFType, pandas_udf

    # functionType passed explicitly: `from __future__ import annotations`
    # stringifies signatures, which breaks pandas_udf's type inference.
    @pandas_udf("double", PandasUDFType.GROUPED_AGG)
    def geomean(v):
        import numpy as np

        return float(np.exp(np.log(v[v > 0]).mean()))

    ev = load(spark, sf_dir, "events")
    # Spark forbids mixing a grouped-agg pandas UDF with native aggregates
    # in one agg(); the count comes from a separate native agg joined on
    # the (tiny) group key.
    gm = ev.groupBy("event_type").agg(
        F.round(geomean("value"), 6).alias("geomean_value")
    )
    n = ev.groupBy("event_type").agg(F.count("*").alias("n"))
    return gm.join(n, "event_type").orderBy("event_type")


def q_pandas_udaf_partial(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SCALE-TRUE sibling of q_pandas_udaf: two-level aggregation.
    Geometric mean is algebraic (sum of logs + positive count), so
    level 1 computes per-(group, salt) PARTIALS with grouped-agg pandas
    UDFs — 16 salt subgroups bound any one task's rows to ~1/16 of a
    group even under extreme key skew — and level 2 merges them with
    NATIVE sum/exp (map-side combine, no Python). Same answer as the
    single-shuffle UDAF, but no task ever materializes a whole group:
    the pattern to reach for when a Python aggregate must run at
    100 TB."""
    # ONE applyInPandas partial per (group, salt) — a single Python
    # round trip carrying a single Arrow batch per subgroup, instead
    # of three separate grouped-agg pandas UDFs each paying its own
    # serialization (round-8 verdict #2: the 3-UDF shape was the one
    # perf-weak entry; one FlatMapGroupsInPandas node, plan-asserted).
    def _partials(pdf):
        import numpy as np
        import pandas as pd

        v = pdf["value"].to_numpy()
        pos = v[v > 0]
        return pd.DataFrame(
            {
                "event_type": [pdf["event_type"].iloc[0]],
                "slog": [float(np.log(pos).sum())],
                "npos": [int(pos.size)],
                "cnt": [int(v.size)],
            }
        )

    ev = load(spark, sf_dir, "events")
    partials = (
        ev.withColumn("salt", F.pmod(F.xxhash64("event_id"), F.lit(16)))
        # prune before the shuffle: only the 3 needed columns ride the
        # exchange and the Arrow transfer
        .select("event_type", "salt", "value")
        .groupBy("event_type", "salt")
        .applyInPandas(
            _partials,
            "event_type string, slog double, npos long, cnt long",
        )
    )
    return (
        partials.groupBy("event_type")
        .agg(
            # nullif: a group with NO positive values must yield NULL
            # like the oracle's FILTERed aggregates, not 0.0/0 = NaN
            F.round(
                F.exp(
                    F.sum("slog") / F.nullif(F.sum("npos"), F.lit(0))
                ),
                6,
            ).alias("geomean_value"),
            F.sum("cnt").alias("n"),
        )
        .orderBy("event_type")
    )


QUERIES = {
    "scalar_functions": q_scalar_functions,
    "epoch_conversions": q_epoch_conversions,
    "string_cleanup": q_string_cleanup,
    "pandas_udaf": q_pandas_udaf,
    "pandas_udaf_partial": q_pandas_udaf_partial,
}

ORACLE = {
    "scalar_functions": """
        SELECT doc_id, md5(text) AS text_md5, length(text) AS text_len,
               upper(substr(text, 1, 8)) AS head,
               concat_ws('/', lang, source) AS lake_path,
               printf('%06d', doc_id) AS doc_key,
               greatest(n_chars, length(text)) AS max_len
        FROM documents
    """,
    "epoch_conversions": """
        SELECT event_id, epoch_ms(ts) AS epoch_ms,
               year(ts) AS y, month(ts) AS m, day(ts) AS d, hour(ts) AS h,
               event_type || '/' || strftime(ts, '%Y/%m/%d/%H') AS lake_prefix
        FROM events
    """,
    "string_cleanup": """
        SELECT doc_id, lower(trim(text)) AS norm_text,
               regexp_replace(text, '[^a-z ]', '', 'g') AS alpha_only,
               len(regexp_split_to_array(trim(text), '\\s+')) AS n_tokens
        FROM documents
    """,
    "pandas_udaf": """
        SELECT event_type,
               -- CASE, not FILTER alone: DuckDB evaluates ln(value)
               -- vectorized before filtering, so a single zero value
               -- in the corpus aborts the query (seen at sf0.1)
               ROUND(exp(AVG(CASE WHEN value > 0 THEN ln(value) END)), 6)
                   AS geomean_value,
               COUNT(*) AS n
        FROM events GROUP BY event_type ORDER BY event_type
    """,
    # the partial-merge identity: sum(ln)/count == avg(ln), so the
    # two-level variant shares the single-level oracle
    "pandas_udaf_partial": """
        SELECT event_type,
               ROUND(exp(SUM(CASE WHEN value > 0 THEN ln(value) END)
                         / COUNT(*) FILTER (value > 0)), 6)
                   AS geomean_value,
               COUNT(*) AS n
        FROM events GROUP BY event_type ORDER BY event_type
    """,
}
