"""Streaming operators exposed as oracle-checkable queries: each runs a
real Structured Streaming query (availableNow) over the events table fed
through a file stream, in complete output mode, and returns the final
result table. Complete mode emits every window/group, so the streaming
answer must equal the batch answer — the strongest statement of the
engine's one-logical-pipeline design (same transforms, two triggers;
reference semantics at SURVEY.md §2.9)."""

from __future__ import annotations

import shutil
import tempfile
import uuid
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from api_to_parquet_spark.lake import load
from api_to_parquet_spark.streaming import EVENTS_STREAM_SCHEMA


def _run_streaming(
    spark: SparkSession,
    sf_dir: str,
    build: Callable[[DataFrame], DataFrame],
) -> DataFrame:
    """Feed events through a file stream, run the aggregation to
    completion (availableNow, complete mode), return the memory table.
    The staging copy is deleted once the query terminates — the memory
    sink holds the materialized result."""
    tmp = tempfile.mkdtemp(prefix="stream_events_")
    name = f"sq_{uuid.uuid4().hex[:12]}"
    try:
        load(spark, sf_dir, "events").write.mode("overwrite").parquet(
            f"{tmp}/events"
        )
        stream = spark.readStream.schema(EVENTS_STREAM_SCHEMA).parquet(
            f"{tmp}/events"
        )
        q = (
            build(stream)
            .writeStream.outputMode("complete")
            .format("memory")
            .queryName(name)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return spark.table(name)


def q_streaming_tumbling_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The streaming twin of tumbling_window_agg, checked against the
    SAME oracle — batch and stream must agree to the last digit."""
    return _run_streaming(
        spark,
        sf_dir,
        lambda stream: stream.groupBy(
            F.window("ts", "6 hours").alias("w"), F.col("event_type")
        )
        .agg(
            F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("sum_value")
        )
        .select(
            F.col("w.start").alias("window_start"), "event_type", "n", "sum_value"
        ),
    )


def q_streaming_state_get(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's GET / state as a streaming aggregation (ST1/ST2,
    src/main.go:313-322) — running max + arrival-max, state-store
    maintained, identical to the batch state_get oracle."""
    return _run_streaming(
        spark,
        sf_dir,
        lambda stream: stream.agg(
            F.max("ts").alias("max_timestamp"),
            F.expr("max_by(ts, event_id)").alias("last_time_generated"),
        ),
    )


def q_streaming_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (30 min gap) as a STREAMING aggregation — the
    state-store-backed merge path (sessions extend/merge as events
    arrive) — checked against the same gaps-and-islands oracle as the
    batch twin session_window_agg: stream and batch must agree exactly."""
    return _run_streaming(
        spark,
        sf_dir,
        lambda stream: stream.groupBy(
            "user_id", F.session_window("ts", "30 minutes").alias("w")
        )
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "sum_value",
        ),
    )


def q_streaming_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming EXACT dedup under replay: the events table is staged
    TWICE (every row duplicated — the replayed-POST shape the
    reference's idempotent `file` overwrite guards against,
    README.md:88), streamed through a watermarked
    dropDuplicatesWithinWatermark on (event_id), then aggregated; the
    oracle is the plain batch answer over the UN-duplicated table, so
    the result is right only if the dedup removed every replay.

    Scale shape: dedup state is keyed by event_id in the state store
    and EVICTED once the watermark passes an event's time — bounded
    state under unbounded streams, vs plain dropDuplicates' forever
    state."""
    tmp = tempfile.mkdtemp(prefix="stream_dedup_")
    name = f"sq_{uuid.uuid4().hex[:12]}"
    try:
        ev = load(spark, sf_dir, "events")
        ev.write.mode("overwrite").parquet(f"{tmp}/events/copy1")
        ev.write.mode("overwrite").parquet(f"{tmp}/events/copy2")
        stream = (
            spark.readStream.schema(EVENTS_STREAM_SCHEMA)
            .option("recursiveFileLookup", "true")
            .parquet(f"{tmp}/events")
        )
        q = (
            stream.withWatermark("ts", "1 hour")
            .dropDuplicatesWithinWatermark(["event_id"])
            .groupBy("event_type")
            .agg(
                F.count("*").alias("n"),
                F.round(F.sum("value"), 2).alias("sum_value"),
            )
            .writeStream.outputMode("complete")
            .format("memory")
            .queryName(name)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return spark.table(name)


def q_streaming_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming anomaly detection, split the way a production detector
    is: the STREAM maintains the stateful rollup (per-event-type daily
    counts — bounded state, watermark-evictable), and the DETECTOR
    scores the rollup with Tukey fences (discrete 10th/90th quantiles,
    k=1.5 — same convention as kql_series_outliers) as a cheap batch
    pass over the tiny result table. The quantile pass needs the whole
    per-key series, so it cannot live inside the streaming agg — the
    rollup/detector split is the scale-correct factoring, not a
    workaround."""
    from pyspark.sql import Window

    rollup = _run_streaming(
        spark,
        sf_dir,
        lambda stream: stream.groupBy(
            F.window("ts", "1 day").alias("w"), F.col("event_type")
        )
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("day"), "event_type", "n"),
    )
    byv = Window.partitionBy("event_type").orderBy("n")
    part = Window.partitionBy("event_type")
    ranked = rollup.select(
        "event_type",
        "day",
        F.col("n").cast("double").alias("n"),
        F.row_number().over(byv.orderBy(F.col("n"), F.col("day"))).alias("rn"),
        F.count("*").over(part).alias("cnt"),
    )
    # quantiles as window aggregates over the same partition — no
    # self-join back onto the rollup lineage
    withq = ranked.withColumn(
        "q10",
        F.max(
            F.when(
                F.col("rn")
                == F.floor(0.1 * (F.col("cnt") - 1)).cast("int") + 1,
                F.col("n"),
            )
        ).over(part),
    ).withColumn(
        "q90",
        F.max(
            F.when(
                F.col("rn")
                == F.floor(0.9 * (F.col("cnt") - 1)).cast("int") + 1,
                F.col("n"),
            )
        ).over(part),
    )
    iqr = F.col("q90") - F.col("q10")
    hi = F.col("q90") + 1.5 * iqr
    lo = F.col("q10") - 1.5 * iqr
    # zero-IQR fallback: absolute exceedance (see kql._tukey_score_sql)
    d = F.coalesce(F.nullif(iqr, F.lit(0)), F.lit(1.0))
    score = (
        F.when(F.col("n") > hi, (F.col("n") - hi) / d)
        .when(F.col("n") < lo, (F.col("n") - lo) / d)
        .otherwise(F.lit(0.0))
    )
    return withq.select(
        "event_type", "day", "n", F.round(score, 6).alias("score")
    )


QUERIES = {
    "streaming_tumbling_agg": q_streaming_tumbling_agg,
    "streaming_anomaly": q_streaming_anomaly,
    "streaming_dedup": q_streaming_dedup,
    "streaming_session_window": q_streaming_session_window,
    "streaming_state_get": q_streaming_state_get,
}

ORACLE = {
    # identical to their batch twins — that equality is the point
    "streaming_anomaly": """
        WITH rollup AS (
            SELECT time_bucket(INTERVAL '1 day', ts) AS day, event_type,
                   CAST(count(*) AS DOUBLE) AS n
            FROM events GROUP BY 1, 2
        ), ranked AS (
            SELECT *, row_number() OVER (PARTITION BY event_type
                                         ORDER BY n, day) AS rn,
                   count(*) OVER (PARTITION BY event_type) AS cnt
            FROM rollup
        ), qs AS (
            SELECT event_type,
                   max(CASE WHEN rn = CAST(floor(0.1 * (cnt - 1)) AS INT)
                       + 1 THEN n END) AS q10,
                   max(CASE WHEN rn = CAST(floor(0.9 * (cnt - 1)) AS INT)
                       + 1 THEN n END) AS q90
            FROM ranked GROUP BY event_type
        )
        SELECT r.event_type, r.day, r.n,
               round(CASE
                 WHEN r.n > q.q90 + 1.5 * (q.q90 - q.q10)
                   THEN (r.n - (q.q90 + 1.5 * (q.q90 - q.q10)))
                        / coalesce(nullif(q.q90 - q.q10, 0), 1.0)
                 WHEN r.n < q.q10 - 1.5 * (q.q90 - q.q10)
                   THEN (r.n - (q.q10 - 1.5 * (q.q90 - q.q10)))
                        / coalesce(nullif(q.q90 - q.q10, 0), 1.0)
                 ELSE 0.0 END, 6) AS score
        FROM rollup r JOIN qs q USING (event_type)
    """,
    "streaming_dedup": """
        SELECT event_type, count(*) AS n, ROUND(SUM(value), 2) AS sum_value
        FROM events GROUP BY 1
    """,
    "streaming_tumbling_agg": """
        SELECT time_bucket(INTERVAL '6 hours', ts) AS window_start,
               event_type, count(*) AS n, ROUND(SUM(value), 2) AS sum_value
        FROM events GROUP BY 1, 2
    """,
    "streaming_state_get": (
        "SELECT max(ts) AS max_timestamp,"
        " arg_max(ts, event_id) AS last_time_generated FROM events"
    ),
    "streaming_session_window": """
        WITH flagged AS (
            SELECT user_id, ts, value,
                   CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                             >= INTERVAL 30 MINUTE
                             OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                                IS NULL
                        THEN 1 ELSE 0 END AS new_sess
            FROM events),
        sess AS (
            SELECT user_id, ts, value,
                   SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                       ROWS UNBOUNDED PRECEDING) AS sess_id
            FROM flagged)
        SELECT user_id, MIN(ts) AS session_start,
               MAX(ts) + INTERVAL 30 MINUTE AS session_end,
               COUNT(*) AS n_events, ROUND(SUM(value), 2) AS sum_value
        FROM sess GROUP BY user_id, sess_id
    """,
}
