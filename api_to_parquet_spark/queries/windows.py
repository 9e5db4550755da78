"""Window / analytic operators (SURVEY.md §2.5) — absent from the
reference's Go code but begged for by its time-series model: latest point
per key, sequence-gap detection, running aggregates, as-of joins.

Every window here partitions by a key column, so the only shuffle is the
hash partition on that key; within a partition rows are sorted once and
all frames share the sort — the right shape at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from api_to_parquet_spark.lake import load


def q_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders by price per customer — rank-filter pattern."""
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), "o_orderkey"
    )
    return (
        load(spark, sf_dir, "orders")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


def q_latest_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest event per user — the reference's 'current value per PointId'
    query shape, via max_by (single agg pass, no window sort needed)."""
    return (
        load(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.max("ts").alias("latest_ts"),
            F.expr("max_by(event_id, struct(ts, event_id))").alias("latest_event_id"),
            F.expr("max_by(value, struct(ts, event_id))").alias("latest_value"),
        )
    )


def q_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running sum of value per user over time (cumulative frame)."""
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        load(spark, sf_dir, "events")
        .filter(F.col("user_id") < 50)
        .select(
            "event_id",
            "user_id",
            F.round(F.sum("value").over(w), 2).alias("running_value"),
        )
    )


def q_cumulative_unique_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative distinct users per day — the growth-curve query. A
    naive COUNT(DISTINCT) over an expanding window re-scans every prefix
    (quadratic, and Spark refuses DISTINCT in window frames anyway); the
    scalable identity is: cumulative uniques at day d = users whose FIRST
    event day ≤ d. One grouped min per user, one count per first-day, one
    tiny running sum over |days| rows."""
    ev = load(spark, sf_dir, "events")
    first_day = ev.groupBy("user_id").agg(
        F.date_trunc("day", F.min("ts")).alias("first_day")
    )
    per_day = first_day.groupBy("first_day").agg(
        F.count("*").alias("new_users")
    )
    w = Window.orderBy("first_day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return per_day.select(
        F.col("first_day").alias("day"),
        "new_users",
        F.sum("new_users").over(w).alias("cumulative_users"),
    )


def q_sequence_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap detection via lag (the reference's Sequence field begs for
    this, SURVEY.md §2.5): millisecond delta to previous event per user."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ms = F.unix_millis("ts")
    return load(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.lag("event_id").over(w).alias("prev_event_id"),
        (ms - F.lag(ms).over(w)).alias("gap_ms"),
    )


def q_repurchase_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repurchase-interval distribution: days between a customer's
    consecutive orders, bucketed — the retention curve's raw material.
    One lag over the per-customer order sequence (epoch arithmetic, so
    the same integer-day gaps compute identically in the oracle), then a
    grouped histogram."""
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    o = load(spark, sf_dir, "orders")
    # o_orderdate is TIMESTAMP_NTZ: ANSI mode forbids a direct long cast,
    # so hop through TIMESTAMP (UTC session -> same wall time) first
    epoch = F.col("o_orderdate").cast("timestamp").cast("long")
    gap_days = ((epoch - F.lag(epoch).over(w)) / 86400).cast("long")
    g = F.col("gap_days")
    bucket = (
        F.when(g < 30, "lt_30d")
        .when(g < 90, "30_90d")
        .when(g < 180, "90_180d")
        .when(g < 365, "180_365d")
        .otherwise("gte_365d")
    )
    return (
        o.withColumn("gap_days", gap_days)
        .filter(g.isNotNull())
        .groupBy(bucket.alias("bucket"))
        .agg(
            F.count("*").alias("n"),
            F.round(F.avg("gap_days"), 4).alias("avg_gap_days"),
        )
    )


def q_debounce_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-windowed dedup (debounce): keep an event only if the
    previous event of the same (user, type) is more than 5 minutes
    older — the telemetry retry/double-fire filter, and the batch twin
    of streaming dropDuplicatesWithinWatermark. One lag over the
    (user_id, event_type) partitioning; kept-row counts per type report
    the squelch rate."""
    w = Window.partitionBy("user_id", "event_type").orderBy(
        "ts", "event_id"
    )
    ev = load(spark, sf_dir, "events")
    gap = F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w)
    kept = ev.withColumn("gap_s", gap).filter(
        F.col("gap_s").isNull() | (F.col("gap_s") > 300)
    )
    return kept.groupBy("event_type").agg(
        F.count("*").alias("n_kept"),
        F.round(F.sum("value"), 2).alias("sum_value_kept"),
    )


def q_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-day rolling median of daily order counts. Spark has no
    percentile aggregate over window FRAMES; for bounded frames the
    workaround is collect_list over the frame → array_sort → interpolate
    the middle (identical definition to quantile_cont 0.5, which the
    DuckDB oracle runs natively over the same frame). Only sane for
    SMALL frames — the per-row array is O(frame); an unbounded frame
    needs a sketch instead. Base table is per-day counts, so the window
    sees |days| rows, one tiny global sort."""
    daily = (
        load(spark, sf_dir, "orders")
        .groupBy(F.date_trunc("day", "o_orderdate").alias("day"))
        .agg(F.count("*").alias("n_orders"))
    )
    w = Window.orderBy("day").rowsBetween(-6, 0)
    arr = F.array_sort(F.collect_list(F.col("n_orders").cast("double")).over(w))
    n = F.size(arr)
    lo = F.element_at(arr, F.floor((n + 1) / 2).cast("int"))
    hi = F.element_at(arr, F.ceil((n + 1) / 2).cast("int"))
    return daily.select(
        "day",
        "n_orders",
        ((lo + hi) / 2).alias("rolling_median_7d"),
    )


def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase gets the value of the user's most recent
    prior-or-equal view. Implemented as the scalable union+window pattern
    (one shuffle on user_id, one sort) rather than an O(n^2) range self-join:
    interleave both streams in time order and carry the last view value
    forward with last(ignorenulls)."""
    ev = load(spark, sf_dir, "events").filter(
        F.col("event_type").isin("view", "purchase")
    )
    tagged = ev.select(
        "event_id",
        "user_id",
        "ts",
        F.when(F.col("event_type") == "view", F.col("value")).alias("view_value"),
        (F.col("event_type") == "purchase").cast("int").alias("is_purchase"),
    )
    # views sort before purchases at identical ts (is_purchase asc)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "is_purchase", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        tagged.withColumn(
            "asof_view_value", F.last("view_value", ignorenulls=True).over(w)
        )
        .filter(F.col("is_purchase") == 1)
        .select("event_id", "user_id", "asof_view_value")
    )


def q_asof_join_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of: each purchase gets the user's NEXT view value at or
    after it (the look-ahead twin of q_asof_join — e.g. "what did they
    look at after buying"). Same union+window shape, frame flipped to
    CURRENT ROW .. UNBOUNDED FOLLOWING with first(ignorenulls); purchases
    sort BEFORE views at identical ts so an exactly-simultaneous view
    still counts as 'after'."""
    ev = load(spark, sf_dir, "events").filter(
        F.col("event_type").isin("view", "purchase")
    )
    tagged = ev.select(
        "event_id",
        "user_id",
        "ts",
        F.when(F.col("event_type") == "view", F.col("value")).alias("view_value"),
        (F.col("event_type") == "purchase").cast("int").alias("is_purchase"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", F.desc("is_purchase"), "event_id")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    return (
        tagged.withColumn(
            "next_view_value", F.first("view_value", ignorenulls=True).over(w)
        )
        .filter(F.col("is_purchase") == 1)
        .select("event_id", "user_id", "next_view_value")
    )


def q_tumbling_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time tumbling window (6h) aggregation — the batch twin of the
    streaming windowed agg in streaming.py (same F.window operator)."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "6 hours").alias("w"), F.col("event_type"))
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def q_gap_fill_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resample each user's (user_id < 20) event series onto an hourly
    grid with forward-fill — the time-series gap-filling operator every
    downstream consumer of the reference's lake ends up hand-rolling.

    Shape: per-user hour grid via sequence+explode (map-side after one
    tiny min/max agg), left join of observed hourly last-values, then one
    last(ignorenulls) window per user — a single shuffle on user_id."""
    ev = load(spark, sf_dir, "events").filter(F.col("user_id") < 20)
    hourly = ev.groupBy(
        "user_id", F.date_trunc("hour", "ts").alias("hour")
    ).agg(F.expr("max_by(value, struct(ts, event_id))").alias("obs_value"))
    span = hourly.groupBy("user_id").agg(
        F.min("hour").alias("h0"), F.max("hour").alias("h1")
    )
    grid = span.select(
        "user_id",
        F.explode(
            F.sequence("h0", "h1", F.expr("INTERVAL 1 HOUR"))
        ).alias("hour"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(hourly, ["user_id", "hour"], "left")
        .withColumn(
            "filled_value",
            F.round(F.last("obs_value", ignorenulls=True).over(w), 2),
        )
        .select("user_id", "hour", "filled_value")
    )


def q_rank_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full ranking-function family over one shared window sort —
    rank/dense_rank/percent_rank/ntile/cume_dist all reuse the single
    per-partition sort (one shuffle on o_custkey, one sort)."""
    w = Window.partitionBy("o_custkey").orderBy("o_totalprice", "o_orderkey")
    return (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_custkey") < 100)
        .select(
            "o_custkey",
            "o_orderkey",
            F.rank().over(w).alias("rnk"),
            F.dense_rank().over(w).alias("drnk"),
            F.round(F.percent_rank().over(w), 6).alias("prnk"),
            F.ntile(4).over(w).alias("quartile"),
            F.round(F.cume_dist().over(w), 6).alias("cdist"),
        )
    )


def q_time_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 1-hour average per user via a RANGE frame on event time —
    the time-series smoothing query a RANGE BETWEEN frame exists for
    (row frames would be wrong under irregular sampling)."""
    ev = load(spark, sf_dir, "events").filter(F.col("user_id") < 50)
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").cast("double"))
        .rangeBetween(-3600, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.round(F.avg("value").over(w), 4).alias("trailing_1h_avg"),
        F.count("*").over(w).alias("trailing_1h_n"),
    )


def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long reshape (unpivot/melt) of lineitem's charge columns —
    the inverse of pivot_event_counts; pure narrow Expand, no shuffle."""
    return (
        load(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") < 100)
        .unpivot(
            ["l_orderkey", "l_linenumber"],
            ["l_extendedprice", "l_discount", "l_tax"],
            "charge_kind",
            "amount",
        )
    )


def q_ohlc_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC downsampling: per user per 6h bucket, open/high/low/close of
    value — one grouped aggregate pass (min_by/max_by carry the open and
    close; no window sort needed)."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(
            "user_id", F.window("ts", "6 hours")["start"].alias("bucket_start")
        )
        .agg(
            F.expr("min_by(value, struct(ts, event_id))").alias("open"),
            F.round(F.max("value"), 2).alias("high"),
            F.round(F.min("value"), 2).alias("low"),
            F.expr("max_by(value, struct(ts, event_id))").alias("close"),
            F.count("*").alias("n"),
        )
        .select(
            "user_id",
            "bucket_start",
            F.round("open", 2).alias("open"),
            "high",
            "low",
            F.round("close", 2).alias("close"),
            "n",
        )
    )


def q_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average (alpha=0.3) of each user's
    (user_id < 20) value series — inherently sequential per key, so:
    sort-collect the series per user (one shuffle), then a JVM-side
    aggregate() fold computes the final EWMA. The fold runs inside the
    executor, not Python; state per key is one array."""
    ev = load(spark, sf_dir, "events").filter(F.col("user_id") < 20)
    series = ev.groupBy("user_id").agg(
        F.array_sort(
            F.collect_list(F.struct("ts", "event_id", "value"))
        ).alias("s")
    )
    vals = F.transform("s", lambda x: x.getField("value"))
    ewma = F.aggregate(
        vals,
        F.lit(None).cast("double"),
        lambda acc, x: F.when(acc.isNull(), x).otherwise(
            0.3 * x + 0.7 * acc
        ),
    )
    return series.select(
        "user_id",
        F.size("s").alias("n_obs"),
        F.round(ewma, 6).alias("ewma_value"),
    )


def q_ratio_to_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percent-of-total (ratio_to_report) — each nation's share of
    total order revenue, the share-of-whole window shape: one grouped
    sum, then a windowed total over the TINY aggregate (|nations|
    rows), never a second scan of the fact table. Share is exact
    integer cents divided once (float-determinism rule)."""
    from pyspark.sql import Window

    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    per_nation = (
        o.join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .groupBy("n_name")
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long")).alias(
                "rev_cents"
            )
        )
    )
    total = Window.partitionBy()
    return per_nation.select(
        "n_name",
        "rev_cents",
        F.round(
            F.col("rev_cents") / F.sum("rev_cents").over(total), 6
        ).alias("rev_share"),
    ).orderBy(F.desc("rev_cents"), "n_name")


TRAILING_DAYS = 7


def q_trailing_unique_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per day, the trailing-7-day distinct user count — the windowed
    COUNT(DISTINCT) no engine supports directly over frames. Shape:
    distinct (user, day) pairs first (the big shrink — one shuffle),
    then each pair expands into the <=7 window days it serves
    (map-side sequence/explode), then a plain grouped distinct count
    per window day. The expansion factor is the window length, applied
    AFTER per-day dedup, so the shuffled volume is |users×days|×7, not
    |events|×7."""
    e = load(spark, sf_dir, "events")
    pairs = e.select(
        "user_id", F.date_trunc("day", "ts").alias("day")
    ).distinct()
    days = F.transform(
        F.sequence(F.lit(0), F.lit(TRAILING_DAYS - 1)),
        lambda i: F.timestamp_add("DAY", i, F.col("day")),
    )
    expanded = pairs.select(
        "user_id", F.explode(days).alias("win_day")
    )
    # only report days that actually occur in the data
    present = e.select(F.date_trunc("day", "ts").alias("win_day")).distinct()
    return (
        expanded.join(present, "win_day", "left_semi")
        .groupBy("win_day")
        .agg(F.countDistinct("user_id").alias("trailing_users"))
        .orderBy("win_day")
    )


HW_ALPHA = 0.3
HW_BETA = 0.1


def q_holt_winters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt's double exponential smoothing (level+trend, alpha=0.3,
    beta=0.1) per user series — the step past EWMA for trending
    time-series: l' = a·x + (1-a)(l+b); b' = B(l'-l) + (1-B)b; init
    l=x1, b=0; one-step forecast = l+b. Same scale shape as EWMA: one
    shuffle to sort-collect each key's series, then a JVM aggregate()
    fold with a (level, trend) struct accumulator — sequential state
    stays inside the executor, no Python, no per-row window. The
    DuckDB oracle replays the identical recurrence as a recursive CTE,
    textually matching arithmetic so results are bit-identical."""
    ev = load(spark, sf_dir, "events").filter(F.col("user_id") < 20)
    series = ev.groupBy("user_id").agg(
        F.array_sort(
            F.collect_list(F.struct("ts", "event_id", "value"))
        ).alias("s")
    )
    vals = F.transform("s", lambda x: x.getField("value"))
    a, b = HW_ALPHA, HW_BETA

    def step(acc, x):
        new_l = a * x + (1 - a) * (acc["l"] + acc["b"])
        new_b = (
            b * ((a * x + (1 - a) * (acc["l"] + acc["b"])) - acc["l"])
            + (1 - b) * acc["b"]
        )
        return F.when(
            acc["l"].isNull(),
            F.struct(x.alias("l"), F.lit(0.0).alias("b")),
        ).otherwise(F.struct(new_l.alias("l"), new_b.alias("b")))

    hw = F.aggregate(
        vals,
        F.struct(
            F.lit(None).cast("double").alias("l"), F.lit(0.0).alias("b")
        ),
        step,
    )
    return series.select(
        "user_id",
        F.size("s").alias("n_obs"),
        F.round(hw["l"], 6).alias("level"),
        F.round(hw["b"], 6).alias("trend"),
        F.round(hw["l"] + hw["b"], 6).alias("forecast_next"),
    )


def q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-type transition counts (Markov bigrams) per user stream:
    lag over the per-user time order, then a global bigram count — the
    input to any user-behavior transition model. One window sort on
    user_id + one small aggregate."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count("*").alias("n"))
    )


QUERIES = {
    "window_topk_per_group": q_topk_per_group,
    "event_transitions": q_event_transitions,
    "gap_fill_resample": q_gap_fill_resample,
    "window_rank_family": q_rank_family,
    "window_time_range_frame": q_time_range_frame,
    "unpivot_charges": q_unpivot,
    "ohlc_downsample": q_ohlc_downsample,
    "ewma_smoothing": q_ewma,
    "holt_winters": q_holt_winters,
    "ratio_to_report": q_ratio_to_report,
    "trailing_unique_users": q_trailing_unique_users,
    "latest_per_key": q_latest_per_key,
    "window_running_sum": q_running_sum,
    "cumulative_unique_users": q_cumulative_unique_users,
    "window_sequence_gaps": q_sequence_gaps,
    "asof_join": q_asof_join,
    "asof_join_forward": q_asof_join_forward,
    "rolling_median": q_rolling_median,
    "debounce_events": q_debounce_events,
    "repurchase_intervals": q_repurchase_intervals,
    "tumbling_window_agg": q_tumbling_window_agg,
}

ORACLE = {
    "cumulative_unique_users": """
        WITH fd AS (
            SELECT user_id, date_trunc('day', MIN(ts)) AS first_day
            FROM events GROUP BY user_id),
        pd AS (
            SELECT first_day AS day, COUNT(*) AS new_users
            FROM fd GROUP BY 1)
        SELECT day, new_users,
               CAST(SUM(new_users) OVER (ORDER BY day
                    ROWS UNBOUNDED PRECEDING) AS BIGINT)
                   AS cumulative_users
        FROM pd
    """,
    "event_transitions": """
        SELECT prev_type, event_type AS next_type, COUNT(*) AS n
        FROM (SELECT event_type,
                     lag(event_type) OVER (PARTITION BY user_id
                                           ORDER BY ts, event_id) AS prev_type
              FROM events)
        WHERE prev_type IS NOT NULL
        GROUP BY 1, 2
    """,
    # arg_min/arg_max need a scalar ordering key in DuckDB: epoch_ms*1e6
    # + event_id reproduces the (ts, event_id) lexicographic order since
    # event_id < 1e6 on this corpus.
    "ohlc_downsample": """
        SELECT user_id,
               time_bucket(INTERVAL '6 hours', ts) AS bucket_start,
               ROUND(arg_min(value, epoch_ms(ts) * 1000000 + event_id), 2)
                   AS open,
               ROUND(MAX(value), 2) AS high,
               ROUND(MIN(value), 2) AS low,
               ROUND(arg_max(value, epoch_ms(ts) * 1000000 + event_id), 2)
                   AS close,
               COUNT(*) AS n
        FROM events GROUP BY 1, 2
    """,
    "ewma_smoothing": """
        SELECT user_id, len(vals) AS n_obs,
               ROUND(list_reduce(vals, (acc, x) -> 0.3 * x + 0.7 * acc), 6)
                   AS ewma_value
        FROM (SELECT user_id, list(value ORDER BY ts, event_id) AS vals
              FROM events WHERE user_id < 20 GROUP BY user_id)
    """,
    "ratio_to_report": """
        WITH per_nation AS (
            SELECT n_name,
                   SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS rev_cents
            FROM orders
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            GROUP BY n_name)
        SELECT n_name, rev_cents::BIGINT AS rev_cents,
               ROUND(rev_cents / CAST(SUM(rev_cents) OVER () AS DOUBLE), 6)
                   AS rev_share
        FROM per_nation
        ORDER BY rev_cents DESC, n_name
    """,
    "trailing_unique_users": """
        WITH pairs AS (
            SELECT DISTINCT user_id, date_trunc('day', ts) AS day
            FROM events),
        expanded AS (
            SELECT user_id, day + i * INTERVAL '1 day' AS win_day
            FROM pairs, unnest(range(0, 7)) AS t(i)),
        present AS (
            SELECT DISTINCT date_trunc('day', ts) AS win_day FROM events)
        SELECT win_day, COUNT(DISTINCT user_id) AS trailing_users
        FROM expanded
        WHERE win_day IN (SELECT win_day FROM present)
        GROUP BY win_day ORDER BY win_day
    """,
    # The identical Holt recurrence replayed row-by-row as a recursive
    # CTE; the arithmetic is textually the same as the Spark fold so the
    # doubles match bit-for-bit before the final ROUND.
    "holt_winters": f"""
        WITH RECURSIVE series AS (
            SELECT user_id, value,
                   row_number() OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS rn
            FROM events WHERE user_id < 20),
        counts AS (SELECT user_id, MAX(rn) AS n FROM series GROUP BY 1),
        hw AS (
            SELECT user_id, 1 AS rn, value AS l,
                   CAST(0.0 AS DOUBLE) AS b
            FROM series WHERE rn = 1
            UNION ALL
            SELECT s.user_id, s.rn,
                   {HW_ALPHA} * s.value
                       + {1 - HW_ALPHA} * (hw.l + hw.b),
                   {HW_BETA} * (({HW_ALPHA} * s.value
                       + {1 - HW_ALPHA} * (hw.l + hw.b)) - hw.l)
                       + {1 - HW_BETA} * hw.b
            FROM hw JOIN series s
                 ON s.user_id = hw.user_id AND s.rn = hw.rn + 1)
        SELECT hw.user_id, counts.n AS n_obs,
               ROUND(l, 6) AS level, ROUND(b, 6) AS trend,
               ROUND(l + b, 6) AS forecast_next
        FROM hw JOIN counts USING (user_id) WHERE hw.rn = counts.n
    """,
    "window_rank_family": """
        SELECT o_custkey, o_orderkey,
               rank() OVER w AS rnk,
               dense_rank() OVER w AS drnk,
               ROUND(percent_rank() OVER w, 6) AS prnk,
               ntile(4) OVER w AS quartile,
               ROUND(cume_dist() OVER w, 6) AS cdist
        FROM orders WHERE o_custkey < 100
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey)
    """,
    "window_time_range_frame": """
        SELECT event_id, user_id,
               ROUND(AVG(value) OVER w, 4) AS trailing_1h_avg,
               COUNT(*) OVER w AS trailing_1h_n
        FROM events WHERE user_id < 50
        WINDOW w AS (PARTITION BY user_id ORDER BY epoch(ts)
                     RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
    """,
    "unpivot_charges": """
        SELECT l_orderkey, l_linenumber, charge_kind, amount
        FROM (SELECT l_orderkey, l_linenumber, l_extendedprice, l_discount,
                     l_tax
              FROM lineitem WHERE l_orderkey < 100)
        UNPIVOT (amount FOR charge_kind IN
                 (l_extendedprice, l_discount, l_tax))
    """,
    "gap_fill_resample": """
        WITH hourly AS (
            SELECT user_id, hour, obs_value FROM (
                SELECT user_id, date_trunc('hour', ts) AS hour,
                       value AS obs_value,
                       row_number() OVER (
                           PARTITION BY user_id, date_trunc('hour', ts)
                           ORDER BY ts DESC, event_id DESC) AS rn
                FROM events WHERE user_id < 20) WHERE rn = 1),
        span AS (
            SELECT user_id, min(hour) AS h0, max(hour) AS h1
            FROM hourly GROUP BY user_id),
        grid AS (
            SELECT user_id, unnest(generate_series(h0, h1,
                       INTERVAL 1 HOUR)) AS hour
            FROM span)
        SELECT g.user_id, g.hour,
               ROUND(last_value(h.obs_value IGNORE NULLS) OVER (
                   PARTITION BY g.user_id ORDER BY g.hour
                   ROWS UNBOUNDED PRECEDING), 2) AS filled_value
        FROM grid g LEFT JOIN hourly h
          ON g.user_id = h.user_id AND g.hour = h.hour
    """,
    "window_topk_per_group": """
        SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
            SELECT o_custkey, o_orderkey, o_totalprice,
                   row_number() OVER (PARTITION BY o_custkey
                                      ORDER BY o_totalprice DESC, o_orderkey) AS rn
            FROM orders)
        WHERE rn <= 3
    """,
    "latest_per_key": """
        SELECT user_id, latest_ts, latest_event_id, latest_value FROM (
            SELECT user_id, ts AS latest_ts, event_id AS latest_event_id,
                   value AS latest_value,
                   row_number() OVER (PARTITION BY user_id
                                      ORDER BY ts DESC, event_id DESC) AS rn
            FROM events) WHERE rn = 1
    """,
    "window_running_sum": """
        SELECT event_id, user_id,
               ROUND(SUM(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
                   AS running_value
        FROM events WHERE user_id < 50
    """,
    "window_sequence_gaps": """
        SELECT event_id, user_id,
               lag(event_id) OVER w AS prev_event_id,
               epoch_ms(ts) - lag(epoch_ms(ts)) OVER w AS gap_ms
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    "repurchase_intervals": """
        WITH g AS (
            SELECT CAST((epoch(o_orderdate) - lag(epoch(o_orderdate)) OVER (
                       PARTITION BY o_custkey
                       ORDER BY o_orderdate, o_orderkey)) / 86400 AS BIGINT)
                       AS gap_days
            FROM orders)
        SELECT CASE WHEN gap_days < 30 THEN 'lt_30d'
                    WHEN gap_days < 90 THEN '30_90d'
                    WHEN gap_days < 180 THEN '90_180d'
                    WHEN gap_days < 365 THEN '180_365d'
                    ELSE 'gte_365d' END AS bucket,
               COUNT(*) AS n, ROUND(AVG(gap_days), 4) AS avg_gap_days
        FROM g WHERE gap_days IS NOT NULL
        GROUP BY 1
    """,
    "debounce_events": """
        WITH g AS (
            SELECT event_type, value,
                   epoch(ts) - lag(epoch(ts)) OVER (
                       PARTITION BY user_id, event_type
                       ORDER BY ts, event_id) AS gap_s
            FROM events)
        SELECT event_type, COUNT(*) AS n_kept,
               ROUND(SUM(value), 2) AS sum_value_kept
        FROM g WHERE gap_s IS NULL OR gap_s > 300
        GROUP BY event_type
    """,
    "rolling_median": """
        WITH daily AS (
            SELECT date_trunc('day', o_orderdate) AS day,
                   COUNT(*) AS n_orders
            FROM orders GROUP BY 1)
        SELECT day, n_orders,
               quantile_cont(n_orders::DOUBLE, 0.5) OVER (
                   ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
                   AS rolling_median_7d
        FROM daily
    """,
    "asof_join_forward": """
        WITH tagged AS (
            SELECT event_id, user_id, ts,
                   CASE WHEN event_type = 'view' THEN value END AS view_value,
                   CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is_purchase
            FROM events WHERE event_type IN ('view', 'purchase'))
        SELECT event_id, user_id, next_view_value FROM (
            SELECT event_id, user_id, is_purchase,
                   first_value(view_value IGNORE NULLS) OVER (
                       PARTITION BY user_id
                       ORDER BY ts, is_purchase DESC, event_id
                       ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
                       AS next_view_value
            FROM tagged)
        WHERE is_purchase = 1
    """,
    "asof_join": """
        WITH tagged AS (
            SELECT event_id, user_id, ts,
                   CASE WHEN event_type = 'view' THEN value END AS view_value,
                   CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is_purchase
            FROM events WHERE event_type IN ('view', 'purchase'))
        SELECT event_id, user_id, asof_view_value FROM (
            SELECT event_id, user_id, is_purchase,
                   last_value(view_value IGNORE NULLS) OVER (
                       PARTITION BY user_id ORDER BY ts, is_purchase, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS asof_view_value
            FROM tagged)
        WHERE is_purchase = 1
    """,
    "tumbling_window_agg": """
        SELECT time_bucket(INTERVAL '6 hours', ts) AS window_start,
               event_type, count(*) AS n, ROUND(SUM(value), 2) AS sum_value
        FROM events GROUP BY 1, 2
    """,
}
