"""Advanced SQL surface: subqueries (Catalyst decorrelation), grouping
sets, range joins, statistical aggregates, JSON functions, sliding and
session event-time windows, and approximate sketches.

The reference delegates all of this to Kusto/Synapse (POST /query,
/root/reference/src/main.go:88-116); rebuilding it natively is the point
of the engine (SURVEY.md §3.3). Several queries here run through
``spark.sql`` on registered lake views — the literal replacement for the
reference's query federation — and where ANSI SQL is engine-portable the
same string is the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from api_to_parquet_spark.lake import load


def _views(spark: SparkSession, sf_dir: str, *names: str) -> None:
    for n in names:
        load(spark, sf_dir, n).createOrReplaceTempView(n)


# --- Subqueries: Catalyst rewrites these to joins (decorrelation), which
# is what makes them survive scale — the correlated scalar subquery below
# becomes an aggregate + join, not a per-row re-scan.

_SCALAR_SUBQUERY_SQL = """
    SELECT p_brand,
           ROUND(SUM(l_extendedprice) / 7.0, 2) AS avg_yearly,
           COUNT(*) AS n_small
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE l_quantity < (SELECT 0.5 * AVG(l_quantity)
                        FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
    GROUP BY p_brand
"""


def q_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: correlated scalar subquery (per-part average
    threshold). Catalyst decorrelates to an aggregate-then-join plan."""
    _views(spark, sf_dir, "lineitem", "part")
    return spark.sql(_SCALAR_SUBQUERY_SQL)


_EXISTS_SUBQUERY_SQL = """
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderpriority = '1-URGENT'
                    AND o.o_totalprice > 100000)
"""


def q_exists_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS — planned as a left-semi join."""
    _views(spark, sf_dir, "customer", "orders")
    return spark.sql(_EXISTS_SUBQUERY_SQL)


_HAVING_SQL = """
    SELECT l_partkey, COUNT(*) AS n_lines, ROUND(SUM(l_quantity), 2) AS total_qty
    FROM lineitem
    GROUP BY l_partkey
    HAVING SUM(l_quantity) > 400
"""


def q_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "lineitem")
    return spark.sql(_HAVING_SQL)


_GROUPING_SETS_SQL = """
    SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
           ROUND(SUM(l_extendedprice), 2) AS sum_price
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus),
                            (l_returnflag, l_linestatus), ())
"""


def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (rollup/cube's general form — those live in
    relational.py); Spark expands to a single-pass Expand + aggregate."""
    _views(spark, sf_dir, "lineitem")
    return spark.sql(_GROUPING_SETS_SQL)


# --- Range join with interval bucketing. A bare (user_id) equi-join has
# per-key fanout = (events per user)² before the time filter; bucketing
# time into interval-width cells and joining on (user_id, bucket) bounds
# the fanout to ±1 cell — each left row probes its own cell and the next
# (any b with 0 < ts_b - ts_a <= W lives in floor(ts_a/W) or +1), so the
# equi-join emits only near-in-time pairs. The classic interval-join
# decomposition; essential when per-key history is long.

RANGE_JOIN_WINDOW_S = 300


def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    w = RANGE_JOIN_WINDOW_S
    bucket = (F.col("ts").cast("double") / w).cast("long")
    a = ev.select(
        "user_id",
        F.col("event_id").alias("event_a"),
        F.col("ts").alias("ts_a"),
        F.explode(F.array(bucket, bucket + 1)).alias("jb"),
    )
    b = ev.select(
        "user_id",
        F.col("event_id").alias("event_b"),
        F.col("ts").alias("ts_b"),
        bucket.alias("jb"),
    )
    return (
        a.join(b, ["user_id", "jb"])
        .filter(
            (F.col("ts_b") > F.col("ts_a"))
            & (
                F.col("ts_b").cast("double")
                <= F.col("ts_a").cast("double") + w
            )
        )
        .select(
            "user_id",
            "event_a",
            "event_b",
            F.round(
                F.col("ts_b").cast("double") - F.col("ts_a").cast("double"), 3
            ).alias("gap_s"),
        )
    )


# --- Statistical aggregates: exact, deterministic up to float rounding
# (both sides round to 4 decimals so accumulation order cannot flip bits).


def q_stats_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.round(F.avg("value"), 4).alias("avg_value"),
        F.round(F.stddev_samp("value"), 4).alias("stddev_value"),
        F.round(F.var_samp("value"), 4).alias("var_value"),
        F.round(F.median("value"), 4).alias("median_value"),
        F.round(F.percentile("value", 0.9), 4).alias("p90_value"),
        F.round(F.corr("value", F.col("user_id").cast("double")), 4).alias(
            "corr_value_user"
        ),
    )


# --- JSON functions over the events.props payload column.


def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        ev.select(k.alias("k"), "value")
        .groupBy("k")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
    )


def q_json_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured access through Spark 4's VariantType: props is
    parsed ONCE into a variant (binary-encoded, field-indexed — the
    open-format twin of a shredded JSON column) and fields are read
    with variant_get path extraction. At 100 TB this beats per-access
    get_json_object re-parsing: one parse, many typed reads. The
    oracle reads the same paths with DuckDB's JSON extraction."""
    ev = load(spark, sf_dir, "events")
    v = ev.select(
        "event_type", F.parse_json("props").alias("pv"), "value"
    )
    k = F.variant_get("pv", "$.k", "long")
    return (
        v.select("event_type", k.alias("k"), "value")
        .filter(F.col("k").isNotNull())
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
            F.sum("k").alias("sum_k"),
        )
        .orderBy("event_type")
    )


# --- Event-time windows beyond tumbling (batch twins of the streaming
# operators; watermarked streaming versions live in streaming.py).


def q_sliding_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """12h windows sliding every 6h — each event lands in exactly two
    epoch-aligned windows. Spark plans this as a single Expand + agg, no
    self-join."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "12 hours", "6 hours").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "sum_value")
    )


def q_session_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user session windows with a 30-minute inactivity gap
    (F.session_window; in streaming this is state-store-backed with the
    same column semantics: end = last event + gap)."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


_RECURSIVE_CALENDAR_SQL = """
    WITH RECURSIVE months(m) AS (
        SELECT (SELECT date_trunc('month', MIN(o_orderdate)) FROM orders)
        UNION ALL
        SELECT m + INTERVAL 1 MONTH FROM months
        WHERE m < (SELECT date_trunc('month', MAX(o_orderdate)) FROM orders)
    ),
    per_month AS (
        SELECT date_trunc('month', o_orderdate) AS m, COUNT(*) AS n_orders
        FROM orders GROUP BY 1)
    SELECT months.m AS month_start, COALESCE(n_orders, 0) AS n_orders
    FROM months LEFT JOIN per_month ON months.m = per_month.m
"""


def q_recursive_calendar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (Spark 4 WITH RECURSIVE): build a complete month
    spine from the data's own min/max and left-join per-month counts, so
    empty months report 0 instead of vanishing — the calendar-spine
    reporting idiom, engine-portable (same string runs on DuckDB).
    Bounded acyclic recursion only: Spark caps depth at
    spark.sql.cteRecursionLevelLimit (100) and rejects UNION-distinct
    recursion, so cyclic reachability still goes through the iterative
    DataFrame loop (dedup_clusters)."""
    _views(spark, sf_dir, "orders")
    return spark.sql(_RECURSIVE_CALENDAR_SQL)


def q_activity_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week × hour activity matrix (the ops-dashboard heatmap).
    One grouped pass; Spark's dayofweek is 1=Sunday while DuckDB's dow
    is 0=Sunday, so both sides normalize to 0=Sunday explicitly — the
    kind of cross-engine calendar divergence the oracle layer exists to
    pin down."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(
            (F.dayofweek("ts") - 1).alias("dow"),
            F.hour("ts").alias("hour"),
        )
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
    )


def q_value_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group z-score anomaly detection: events whose value deviates
    >3σ from their event_type's mean — the monitoring query a time-series
    lake exists to answer. Two-pass shape that scales: grouped mean/σ
    first (tiny result), broadcast back onto the stream, filter map-side
    — never a window sort over the fact table."""
    ev = load(spark, sf_dir, "events")
    stats = ev.groupBy("event_type").agg(
        F.avg("value").alias("mu"),
        F.stddev_samp("value").alias("sigma"),
    )
    z = (F.col("value") - F.col("mu")) / F.col("sigma")
    return (
        ev.join(F.broadcast(stats), "event_type")
        .withColumn("z", F.round(z, 4))
        .filter(F.abs("z") > 3)
        .select("event_id", "event_type", "value", "z")
    )


def q_percentile_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact grouped percentiles (p25/median/p75) of extended price per
    return flag — Spark's ``percentile`` (linear interpolation, identical
    definition to DuckDB ``quantile_cont``). Exact percentiles need the
    group's values together (one shuffle, sort inside the aggregate); the
    100 TB route is ``percentile_approx`` (q_approx_sketches), which is
    mergeable and single-pass — both surfaces exist on purpose."""
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.percentile("l_extendedprice", F.lit(0.25)), 4).alias("p25"),
        F.round(F.percentile("l_extendedprice", F.lit(0.50)), 4).alias("p50"),
        F.round(F.percentile("l_extendedprice", F.lit(0.75)), 4).alias("p75"),
    )


def q_mode_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-group mode: most frequent l_quantity per return
    flag, ties broken by smallest value. Built as count-then-rank (two
    shuffles on small keys) instead of the builtin ``mode()``, whose tie
    winner is accumulation-order-dependent and therefore not reproducible
    run-to-run — reproducibility is a pipeline requirement, not a nicety."""
    li = load(spark, sf_dir, "lineitem")
    from pyspark.sql import Window

    counts = li.groupBy("l_returnflag", "l_quantity").agg(
        F.count("*").alias("n")
    )
    w = Window.partitionBy("l_returnflag").orderBy(
        F.desc("n"), F.asc("l_quantity")
    )
    return (
        counts.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            "l_returnflag",
            F.col("l_quantity").alias("mode_quantity"),
            F.col("n").alias("mode_count"),
        )
    )


def q_merge_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands sessionization by hand: merge each user's event
    stream into sessions separated by >30 min of silence (lag → new-session
    flag → running sum → group). All three windows share ONE partitioning
    (user_id), so the whole query is a single shuffle; ordering ties are
    broken by event_id for run-to-run determinism. This is the batch twin
    of F.session_window (q_session_window_agg) — same islands, built from
    primitives, which is what you need when the merge predicate is richer
    than a fixed gap (e.g. gap depends on event_type)."""
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w)
    flagged = ev.withColumn(
        "new_sess", F.when(gap.isNull() | (gap > 1800), 1).otherwise(0)
    )
    sess = flagged.withColumn(
        "sess_id",
        F.sum("new_sess").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return sess.groupBy("user_id", "sess_id").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count("*").alias("n_events"),
    )


def q_posexplode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generator/lateral surface: explode document tokens WITH position
    (1-based) — posexplode is the built-in UDTF shape (row → many rows with
    ordinal), map-side and pipelined: no shuffle, output partitioning
    inherits the scan."""
    docs = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    return docs.select(
        "doc_id",
        F.posexplode(F.split("text", " ")).alias("pos0", "tok"),
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "tok")


# --- Approximate sketches: the 100 TB path for distinct counts and
# quantiles. Approximate by construction → no value-level oracle; the
# driver records a rows-only check, and tests/test_oracle_parity.py
# asserts closeness to the exact answers instead.


def q_approx_sketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", 0.02).alias("approx_users"),
        F.percentile_approx("value", 0.5, 10000).alias("approx_median"),
    )


def q_sketch_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-sketch rollup — the pre-aggregated-cube pattern that
    makes distinct counts O(1) to re-aggregate at 100 TB: fine-grained
    (event_type, day) HLL sketches (Datasketches HLL_4, lgK=14) are
    stored once, then ANY coarser grouping comes from hll_union_agg over
    the tiny sketch table instead of a re-scan of raw events — the
    property COUNT(DISTINCT) fundamentally lacks. The oracle is the
    exact per-type distinct count: at this corpus's cardinalities
    (~150 users/type, far below the 2^14 sketch threshold) the HLL
    coupon list is still in exact mode, so estimate == exact and the
    value-hash comparison is legitimate; at larger scale the same query
    drops to a closeness contract (see approx_sketches)."""
    ev = load(spark, sf_dir, "events")
    day = F.date_trunc("day", "ts").alias("day")
    daily = ev.groupBy("event_type", day).agg(
        F.hll_sketch_agg("user_id", 14).alias("sk"),
        F.count("*").alias("n"),
    )
    return (
        daily.groupBy("event_type")
        .agg(
            F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("users_est"),
            F.sum("n").alias("n_events"),
            F.count("*").alias("n_days"),
        )
        .orderBy("event_type")
    )


_RETURNED_ITEMS_SQL = """
    SELECT c.c_custkey, c.c_name, n.n_name,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    WHERE l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY revenue DESC, c.c_custkey
    LIMIT 20
"""


def q_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: 3-fact-dim join chain + grouped revenue + top-20.
    nation broadcasts; the returnflag filter pushes into the lineitem
    scan; order-by-limit plans TakeOrderedAndProject."""
    _views(spark, sf_dir, "customer", "orders", "lineitem", "nation")
    return spark.sql(_RETURNED_ITEMS_SQL)


def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel view → click → purchase: a user converts
    a stage only if it happens AFTER their first previous-stage event.
    One grouped pass computes each user's first qualifying timestamp per
    stage (conditional min), then a single aggregate counts survivors —
    no self-joins, no window sort."""
    ev = load(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("t_view"),
        F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias("t_click"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias(
            "t_buy"
        ),
    )
    # stage-2 qualifying click = first click after first view, etc. —
    # approximated by timestamp ordering of the firsts (exact for the
    # "first qualifying" funnel definition when stages are monotone)
    reached_view = F.col("t_view").isNotNull()
    reached_click = reached_view & F.col("t_click").isNotNull() & (
        F.col("t_click") > F.col("t_view")
    )
    reached_buy = reached_click & F.col("t_buy").isNotNull() & (
        F.col("t_buy") > F.col("t_click")
    )
    return per_user.agg(
        F.count("*").alias("n_users"),
        F.sum(reached_view.cast("long")).alias("stage_view"),
        F.sum(reached_click.cast("long")).alias("stage_click"),
        F.sum(reached_buy.cast("long")).alias("stage_purchase"),
    )


def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention: users grouped by first-activity week,
    counted per subsequent active week — two grouped passes + one join,
    the standard retention matrix."""
    ev = load(spark, sf_dir, "events")
    week = (F.unix_timestamp("ts") / (7 * 86400)).cast("long")
    first_week = ev.groupBy("user_id").agg(F.min(week).alias("cohort_week"))
    active = ev.select("user_id", week.alias("active_week")).distinct()
    return (
        active.join(first_week, "user_id")
        .groupBy("cohort_week", (F.col("active_week") - F.col("cohort_week")).alias("week_offset"))
        .agg(F.count("*").alias("n_active_users"))
    )


_PROFILE_COLS = ("l_quantity", "l_extendedprice", "l_discount", "l_tax")


def q_profile_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column data-profiling (the quality gate a pipeline runs before
    training): count / nulls / exact distinct / min / max / mean for every
    numeric lineitem column — computed in ONE scan (all aggregates in a
    single groupBy pass), then unpivoted to a tall (column, stats) table.
    The single-pass shape is the scale requirement: profiling 100 TB must
    not scan once per column."""
    li = load(spark, sf_dir, "lineitem")
    aggs = []
    for c in _PROFILE_COLS:
        aggs += [
            F.count(c).alias(f"{c}__n"),
            F.sum(F.col(c).isNull().cast("long")).alias(f"{c}__nulls"),
            F.countDistinct(c).alias(f"{c}__distinct"),
            F.round(F.min(c), 6).alias(f"{c}__min"),
            F.round(F.max(c), 6).alias(f"{c}__max"),
            F.round(F.avg(c), 6).alias(f"{c}__mean"),
        ]
    wide = li.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', {c}__n, {c}__nulls, {c}__distinct,"
        f" {c}__min, {c}__max, {c}__mean"
        for c in _PROFILE_COLS
    )
    return wide.selectExpr(
        f"stack({len(_PROFILE_COLS)}, {stack_args})"
        " AS (col_name, n, n_nulls, n_distinct, min_val, max_val, mean_val)"
    )


_PROFILE_ORACLE = " UNION ALL ".join(
    f"""
    SELECT '{c}' AS col_name, count({c}) AS n,
           count(*) - count({c}) AS n_nulls,
           count(DISTINCT {c}) AS n_distinct,
           ROUND(MIN({c}), 6) AS min_val, ROUND(MAX({c}), 6) AS max_val,
           ROUND(AVG({c}), 6) AS mean_val
    FROM lineitem"""
    for c in _PROFILE_COLS
)


QUERIES = {
    "scalar_subquery": q_scalar_subquery,
    "profile_table": q_profile_table,
    "returned_items": q_returned_items,
    "funnel": q_funnel,
    "cohort_retention": q_cohort_retention,
    "exists_subquery": q_exists_subquery,
    "having_filter": q_having,
    "grouping_sets": q_grouping_sets,
    "range_join": q_range_join,
    "stats_agg": q_stats_agg,
    "json_extract": q_json_extract,
    "json_variant": q_json_variant,
    "sliding_window_agg": q_sliding_window_agg,
    "session_window_agg": q_session_window_agg,
    "approx_sketches": q_approx_sketches,  # no oracle: approximate by design
    "sketch_rollup": q_sketch_rollup,
    "percentile_agg": q_percentile_agg,
    "value_outliers": q_value_outliers,
    "activity_heatmap": q_activity_heatmap,
    "recursive_calendar": q_recursive_calendar,
    "mode_agg": q_mode_agg,
    "merge_intervals": q_merge_intervals,
    "posexplode_tokens": q_posexplode_tokens,
}

ORACLE = {
    # Engine-portable ANSI SQL: the Spark query runs the same string.
    "scalar_subquery": _SCALAR_SUBQUERY_SQL,
    "profile_table": _PROFILE_ORACLE,
    "returned_items": _RETURNED_ITEMS_SQL,
    "funnel": """
        WITH per_user AS (
            SELECT user_id,
                   MIN(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
                   MIN(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
                   MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t_buy
            FROM events GROUP BY user_id)
        SELECT COUNT(*) AS n_users,
               SUM(CASE WHEN t_view IS NOT NULL THEN 1 ELSE 0 END)::BIGINT
                   AS stage_view,
               SUM(CASE WHEN t_view IS NOT NULL AND t_click > t_view
                        THEN 1 ELSE 0 END)::BIGINT AS stage_click,
               SUM(CASE WHEN t_view IS NOT NULL AND t_click > t_view
                             AND t_buy > t_click
                        THEN 1 ELSE 0 END)::BIGINT AS stage_purchase
        FROM per_user
    """,
    "cohort_retention": """
        WITH wk AS (
            SELECT user_id,
                   CAST(floor(epoch(ts) / (7 * 86400)) AS BIGINT) AS w
            FROM events),
        first_week AS (
            SELECT user_id, MIN(w) AS cohort_week FROM wk GROUP BY user_id),
        active AS (SELECT DISTINCT user_id, w AS active_week FROM wk)
        SELECT f.cohort_week, a.active_week - f.cohort_week AS week_offset,
               COUNT(*) AS n_active_users
        FROM active a JOIN first_week f ON a.user_id = f.user_id
        GROUP BY 1, 2
    """,
    "exists_subquery": _EXISTS_SUBQUERY_SQL,
    "having_filter": _HAVING_SQL,
    "grouping_sets": _GROUPING_SETS_SQL,
    "range_join": """
        SELECT a.user_id, a.event_id AS event_a, b.event_id AS event_b,
               ROUND(epoch(b.ts) - epoch(a.ts), 3) AS gap_s
        FROM events a JOIN events b
          ON a.user_id = b.user_id
         AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL 5 MINUTE
    """,
    "stats_agg": """
        SELECT event_type, COUNT(*) AS n,
               ROUND(AVG(value), 4) AS avg_value,
               ROUND(stddev_samp(value), 4) AS stddev_value,
               ROUND(var_samp(value), 4) AS var_value,
               ROUND(median(value), 4) AS median_value,
               ROUND(quantile_cont(value, 0.9), 4) AS p90_value,
               ROUND(corr(value, user_id::DOUBLE), 4) AS corr_value_user
        FROM events GROUP BY event_type
    """,
    "json_extract": """
        SELECT CAST(props->>'$.k' AS BIGINT) AS k, COUNT(*) AS n,
               ROUND(SUM(value), 2) AS sum_value
        FROM events GROUP BY 1
    """,
    "sketch_rollup": """
        SELECT event_type,
               COUNT(DISTINCT user_id) AS users_est,
               COUNT(*) AS n_events,
               COUNT(DISTINCT date_trunc('day', ts)) AS n_days
        FROM events GROUP BY event_type ORDER BY event_type
    """,
    "json_variant": """
        SELECT event_type, COUNT(*) AS n,
               MIN(k) AS min_k, MAX(k) AS max_k, SUM(k)::BIGINT AS sum_k
        FROM (SELECT event_type, CAST(props->>'$.k' AS BIGINT) AS k
              FROM events)
        WHERE k IS NOT NULL
        GROUP BY event_type ORDER BY event_type
    """,
    # Each event belongs to windows starting at floor_6h(ts) and
    # floor_6h(ts) - 6h (epoch-aligned, matching Spark's origin).
    "sliding_window_agg": """
        SELECT window_start, event_type, COUNT(*) AS n,
               ROUND(SUM(value), 2) AS sum_value
        FROM (SELECT time_bucket(INTERVAL '6 hours', ts)
                         - k * INTERVAL '6 hours' AS window_start,
                     event_type, value
              FROM events CROSS JOIN (SELECT unnest([0, 1]) AS k))
        GROUP BY 1, 2
    """,
    # Gaps-and-islands twin of session_window: a new session starts when
    # the gap to the previous event is >= 30 min (Spark's window end is
    # exclusive); end = last event + gap.
    "session_window_agg": """
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
    "recursive_calendar": _RECURSIVE_CALENDAR_SQL,
    "activity_heatmap": """
        SELECT date_part('dow', ts) AS dow, date_part('hour', ts) AS hour,
               COUNT(*) AS n, ROUND(SUM(value), 2) AS sum_value
        FROM events GROUP BY 1, 2
    """,
    "value_outliers": """
        WITH stats AS (
            SELECT event_type, AVG(value) AS mu,
                   stddev_samp(value) AS sigma
            FROM events GROUP BY event_type)
        SELECT event_id, e.event_type, value,
               ROUND((value - mu) / sigma, 4) AS z
        FROM events e JOIN stats USING (event_type)
        WHERE ABS(ROUND((value - mu) / sigma, 4)) > 3
    """,
    "percentile_agg": """
        SELECT l_returnflag,
               ROUND(quantile_cont(l_extendedprice, 0.25), 4) AS p25,
               ROUND(quantile_cont(l_extendedprice, 0.50), 4) AS p50,
               ROUND(quantile_cont(l_extendedprice, 0.75), 4) AS p75
        FROM lineitem GROUP BY l_returnflag
    """,
    "mode_agg": """
        WITH counts AS (
            SELECT l_returnflag, l_quantity, COUNT(*) AS n
            FROM lineitem GROUP BY 1, 2),
        ranked AS (
            SELECT *, row_number() OVER (PARTITION BY l_returnflag
                       ORDER BY n DESC, l_quantity ASC) AS rk
            FROM counts)
        SELECT l_returnflag, l_quantity AS mode_quantity, n AS mode_count
        FROM ranked WHERE rk = 1
    """,
    # Strict > 1800 s gap (vs session_window's >= semantics above):
    # deliberately the raw primitive form, event_id tie-break.
    "merge_intervals": """
        WITH flagged AS (
            SELECT user_id, ts, event_id,
                   CASE WHEN epoch(ts) - lag(epoch(ts)) OVER w > 1800
                             OR lag(ts) OVER w IS NULL
                        THEN 1 ELSE 0 END AS new_sess
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        sess AS (
            SELECT user_id, ts,
                   CAST(SUM(new_sess) OVER (PARTITION BY user_id
                        ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING)
                        AS BIGINT) AS sess_id
            FROM flagged)
        SELECT user_id, sess_id, MIN(ts) AS session_start,
               MAX(ts) AS session_end, COUNT(*) AS n_events
        FROM sess GROUP BY user_id, sess_id
    """,
    "posexplode_tokens": """
        SELECT doc_id,
               generate_subscripts(string_split(text, ' '), 1) AS pos,
               unnest(string_split(text, ' ')) AS tok
        FROM documents WHERE doc_id < 50
    """,
}
