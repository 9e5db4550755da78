"""Relational operators over the TPC-H-ish corpus (SURVEY.md §2.3/§2.4/
§2.6/§2.7): joins (broadcast/semi/anti), grouped aggregation, distinct
aggregates, sorts/top-k, set ops, rollup/cube, pivot.

The reference contains none of these in Go — they are the query surface it
delegates to Kusto/Synapse (SURVEY.md §2.3) — so each is expressed as the
idiomatic Catalyst plan: declarative joins the optimizer reorders, explicit
`broadcast()` on dimension tables, partial aggregation everywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from api_to_parquet_spark.lake import load


def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan-heavy grouped aggregation with map-side
    partial agg; the shipdate filter pushes down to the parquet scan."""
    li = load(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(charge), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


def q_top_unshipped_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: 3-way join + agg + deterministic top-10.
    customer is the small side (broadcast); orders⋈lineitem shuffles on
    the join key, which is also the grouping key — one shuffle reused."""
    cust = load(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp")
    )
    return (
        li.join(
            orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


def q_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: star join — fact lineitem⋈orders shuffles; all
    dimension tables (customer/supplier/nation/region) broadcast, so no
    extra shuffle per dim. Requires supplier and customer in the same
    nation, revenue per nation for ASIA."""
    region = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = load(spark, sf_dir, "nation")
    cust = load(spark, sf_dir, "customer")
    supp = load(spark, sf_dir, "supplier")
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(
            F.broadcast(cust),
            (F.col("o_custkey") == F.col("c_custkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


def q_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join: customers that placed at least one urgent order.
    Catalyst plans a broadcast/shuffled semi join — no row multiplication,
    no distinct needed."""
    cust = load(spark, sf_dir, "customer")
    urgent = load(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return cust.join(
        urgent, cust.c_custkey == urgent.o_custkey, "left_semi"
    ).select("c_custkey", "c_name")


def q_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join: customers with no orders at all."""
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    return cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


def q_broadcast_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit broadcast of the nation dimension into supplier — the
    pattern every star-schema join at 100 TB should use for small dims."""
    supp = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    return (
        supp.join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.count("*").alias("n_suppliers"),
            F.round(F.sum("s_acctbal"), 2).alias("total_acctbal"),
        )
    )


def q_full_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join of two per-day aggregates whose date ranges don't
    overlap at all (orders 1995-2001, events 2024) — every row exercises
    one null side; COALESCE restores the key and zero-fills the counts
    (day stays timestamp-typed: the oracle compare treats dates as opaque
    objects but timestamps as sortable values).
    Both inputs pre-aggregate to |days| rows before the join, so the
    full-outer shuffle is tiny regardless of fact size."""
    o = (
        load(spark, sf_dir, "orders")
        .groupBy(F.date_trunc("day", "o_orderdate").alias("day"))
        .agg(F.count("*").alias("n_orders"))
    )
    e = (
        load(spark, sf_dir, "events")
        .groupBy(F.date_trunc("day", "ts").alias("day"))
        .agg(F.count("*").alias("n_events"))
    )
    return o.join(e, "day", "full").select(
        "day",
        F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
    )


def q_relational_division(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relational division ("for all"): customers who have placed orders
    in EVERY order-priority class. The count-distinct-equals-universe
    formulation — one grouped pass plus a broadcast single-row universe
    count — instead of the double-NOT-EXISTS textbook form, which
    Catalyst would turn into two anti-joins; both are correct, this one
    is one shuffle."""
    o = load(spark, sf_dir, "orders")
    universe = o.select(
        F.countDistinct("o_orderpriority").alias("n_prio")
    )
    per_cust = o.groupBy("o_custkey").agg(
        F.countDistinct("o_orderpriority").alias("n_covered"),
        F.count("*").alias("n_orders"),
    )
    cust = load(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_name"
    )
    return (
        per_cust.crossJoin(F.broadcast(universe))
        .filter(F.col("n_covered") == F.col("n_prio"))
        .join(cust, "o_custkey")
        .select(
            F.col("o_custkey").alias("c_custkey"), "c_name", "n_orders"
        )
    )


def q_cross_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cartesian product of the two smallest dims (region × nation) — the
    one join shape that is ONLY safe when at least one side is tiny; Spark
    plans BroadcastNestedLoopJoin here. Kept deliberately dim×dim: a
    fact-side cross join is an anti-pattern this engine never emits."""
    r = load(spark, sf_dir, "region").select("r_name")
    n = load(spark, sf_dir, "nation").select("n_name")
    return r.crossJoin(n)


def q_sort_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k: orderBy+limit plans TakeOrderedAndProject — per-partition
    heaps + single merge, never a global sort."""
    return (
        load(spark, sf_dir, "orders")
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(100)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


def q_distinct_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT aggregates (expand + two-phase agg in the plan)."""
    return load(spark, sf_dir, "orders").agg(
        F.countDistinct("o_custkey").alias("n_customers"),
        F.countDistinct("o_orderpriority").alias("n_priorities"),
        F.count("*").alias("n_orders"),
    )


_MIN_COST_SUPPLIER_SQL = """
    SELECT p.p_partkey, p.p_name, s.s_suppkey, s.s_acctbal
    FROM part p, supplier s
    WHERE p.p_size = 10 AND p.p_partkey < 200
      AND s.s_acctbal = (SELECT MIN(s2.s_acctbal) FROM supplier s2
                         WHERE s2.s_nationkey = s.s_nationkey)
"""


def q_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: correlated MIN subquery selecting each nation's
    cheapest-balance supplier. Catalyst decorrelates to a per-nation
    aggregate joined back — no per-row rescan. Same ANSI string runs on
    both engines."""
    for t in ("part", "supplier"):
        load(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_MIN_COST_SUPPLIER_SQL)


_DISJUNCTIVE_SQL = """
    SELECT ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity >= 1 AND l.l_quantity <= 20)
       OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 10 AND 30
           AND l.l_quantity >= 10 AND l.l_quantity <= 30)
       OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 20 AND 50
           AND l.l_quantity >= 20 AND l.l_quantity <= 40)
"""


def q_disjunctive_filter_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: OR-of-ANDs mixing both join sides. Catalyst
    extracts the common single-side conjuncts (brand/size on part,
    quantity on lineitem) and pushes them below the join, so the scans
    shrink before the hash join evaluates the residual disjunction."""
    for t in ("lineitem", "part"):
        load(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_DISJUNCTIVE_SQL)


_PROMO_REVENUE_SQL = """
    SELECT ROUND(100.0 * SUM(CASE WHEN p.p_type = 'PROMO'
                   THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0 END)
               / SUM(l.l_extendedprice * (1 - l.l_discount)), 4)
               AS promo_revenue_pct,
           COUNT(*) AS n_lines
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
      AND l.l_shipdate <  TIMESTAMP '1996-04-01'
"""


def q_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: conditional aggregation over a join — the CASE
    folds into the partial aggregate, so both sums come out of one pass."""
    for t in ("lineitem", "part"):
        load(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_PROMO_REVENUE_SQL)


_DORMANT_CUSTOMERS_SQL = """
    SELECT c.c_mktsegment,
           COUNT(*) AS n_dormant,
           ROUND(SUM(c.c_acctbal), 2) AS total_bal
    FROM customer c
    WHERE c.c_acctbal > (SELECT AVG(c2.c_acctbal) FROM customer c2
                         WHERE c2.c_acctbal > 0.0)
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderpriority = '1-URGENT')
    GROUP BY c.c_mktsegment
"""


def q_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: uncorrelated AVG scalar subquery + NOT EXISTS
    anti join + grouped aggregate — above-average-balance customers with
    no urgent order, per segment."""
    for t in ("customer", "orders"):
        load(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_DORMANT_CUSTOMERS_SQL)


def q_array_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array aggregation + array functions: per-user sorted event-value
    array (deterministic order), its length, head slice, and a JVM-side
    fold (F.aggregate) — the array surface a feature-store pipeline
    uses."""
    ev = load(spark, sf_dir, "events").filter(F.col("user_id") < 30)
    arr = F.array_sort(F.collect_list(F.round("value", 2)))
    return (
        ev.groupBy("user_id")
        .agg(arr.alias("vals"))
        .select(
            "user_id",
            F.size("vals").alias("n_vals"),
            # try_element_at, not element_at: a user with < 3 events must
            # yield NULL (the DuckDB oracle's vals[3] semantics), not an
            # ANSI ARRAY_INDEX_OUT_OF_BOUNDS — the current testdata
            # happens to guarantee >= 3 everywhere, but the query must
            # not depend on that.
            F.try_element_at("vals", F.lit(1)).alias("v1"),
            F.try_element_at("vals", F.lit(2)).alias("v2"),
            F.try_element_at("vals", F.lit(3)).alias("v3"),
            F.round(
                F.aggregate(
                    "vals", F.lit(0.0), lambda acc, x: acc + x
                ),
                2,
            ).alias("sum_vals"),
        )
    )


def _jan(spark, sf_dir):
    return (
        load(spark, sf_dir, "orders")
        .filter(F.month("o_orderdate") == 1)
        .select("o_custkey")
        .distinct()
    )


def _feb(spark, sf_dir):
    return (
        load(spark, sf_dir, "orders")
        .filter(F.month("o_orderdate") == 2)
        .select("o_custkey")
        .distinct()
    )


def q_set_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _jan(spark, sf_dir).union(_feb(spark, sf_dir)).distinct()


def q_set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _jan(spark, sf_dir).intersect(_feb(spark, sf_dir))


def q_set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _jan(spark, sf_dir).exceptAll(_feb(spark, sf_dir))


def q_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP over (returnflag, linestatus) — subtotals + grand total."""
    return (
        load(spark, sf_dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        )
    )


def q_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (o_orderstatus, o_orderpriority)."""
    return (
        load(spark, sf_dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
        )
    )


EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot event_type into columns per day. Explicit value list so the
    plan needs no extra pass to discover pivot values (mandatory at scale)."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.date_trunc("day", "ts").alias("day"))
        .pivot("event_type", EVENT_TYPES)
        .count()
        .fillna(0, subset=EVENT_TYPES)
    )


def q_case_bucketize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN bucketing + per-bucket aggregates."""
    ev = load(spark, sf_dir, "events")
    bucket = (
        F.when(F.col("value") < 10, "low")
        .when(F.col("value") < 100, "mid")
        .otherwise("high")
    )
    return (
        ev.select(bucket.alias("bucket"), "value")
        .groupBy("bucket")
        .agg(F.count("*").alias("n"), F.round(F.avg("value"), 4).alias("avg_value"))
    )


QUERIES = {
    "pricing_summary": q_pricing_summary,
    "top_unshipped_orders": q_top_unshipped_orders,
    "revenue_by_nation": q_revenue_by_nation,
    "semi_join": q_semi_join,
    "anti_join": q_anti_join,
    "full_outer_join": q_full_outer_join,
    "cross_join": q_cross_join,
    "relational_division": q_relational_division,
    "broadcast_join": q_broadcast_join,
    "sort_topk": q_sort_topk,
    "distinct_agg": q_distinct_agg,
    "min_cost_supplier": q_min_cost_supplier,
    "disjunctive_filter_join": q_disjunctive_filter_join,
    "promo_revenue": q_promo_revenue,
    "dormant_customers": q_dormant_customers,
    "array_agg": q_array_agg,
    "set_union": q_set_union,
    "set_intersect": q_set_intersect,
    "set_except": q_set_except,
    "rollup_agg": q_rollup,
    "cube_agg": q_cube,
    "pivot_event_counts": q_pivot,
    "case_bucketize": q_case_bucketize,
}

ORACLE = {
    "pricing_summary": """
        SELECT l_returnflag, l_linestatus,
               ROUND(SUM(l_quantity), 2) AS sum_qty,
               ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
               ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
               ROUND(AVG(l_quantity), 4) AS avg_qty,
               ROUND(AVG(l_extendedprice), 4) AS avg_price,
               ROUND(AVG(l_discount), 4) AS avg_disc,
               count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
    """,
    "top_unshipped_orders": """
        SELECT l_orderkey, o_orderdate, o_orderpriority,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM customer
        JOIN orders ON o_custkey = c_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1998-03-15'
          AND l_shipdate > TIMESTAMP '1998-03-15'
        GROUP BY l_orderkey, o_orderdate, o_orderpriority
        ORDER BY revenue DESC, l_orderkey
        LIMIT 10
    """,
    "revenue_by_nation": """
        SELECT n_name,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1998-01-01'
        GROUP BY n_name
    """,
    "semi_join": """
        SELECT c_custkey, c_name FROM customer
        WHERE EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderpriority = '1-URGENT')
    """,
    "anti_join": """
        SELECT c_custkey, c_name FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
    "full_outer_join": """
        SELECT COALESCE(o.day, e.day) AS day,
               COALESCE(o.n_orders, 0) AS n_orders,
               COALESCE(e.n_events, 0) AS n_events
        FROM (SELECT date_trunc('day', o_orderdate) AS day, count(*) AS n_orders
              FROM orders GROUP BY 1) o
        FULL OUTER JOIN
             (SELECT date_trunc('day', ts) AS day, count(*) AS n_events
              FROM events GROUP BY 1) e
          ON o.day = e.day
    """,
    "relational_division": """
        WITH u AS (SELECT COUNT(DISTINCT o_orderpriority) AS n_prio
                   FROM orders),
        pc AS (SELECT o_custkey,
                      COUNT(DISTINCT o_orderpriority) AS n_covered,
                      COUNT(*) AS n_orders
               FROM orders GROUP BY o_custkey)
        SELECT c_custkey, c_name, n_orders
        FROM pc CROSS JOIN u
        JOIN customer ON c_custkey = o_custkey
        WHERE n_covered = n_prio
    """,
    "cross_join": """
        SELECT r_name, n_name FROM region CROSS JOIN nation
    """,
    "broadcast_join": """
        SELECT n_name, count(*) AS n_suppliers,
               ROUND(SUM(s_acctbal), 2) AS total_acctbal
        FROM supplier JOIN nation ON s_nationkey = n_nationkey
        GROUP BY n_name
    """,
    "sort_topk": """
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 100
    """,
    "min_cost_supplier": _MIN_COST_SUPPLIER_SQL,
    "disjunctive_filter_join": _DISJUNCTIVE_SQL,
    "promo_revenue": _PROMO_REVENUE_SQL,
    "dormant_customers": _DORMANT_CUSTOMERS_SQL,
    "array_agg": """
        SELECT user_id,
               len(vals) AS n_vals,
               vals[1] AS v1,
               vals[2] AS v2,
               vals[3] AS v3,
               ROUND(list_sum(vals), 2) AS sum_vals
        FROM (SELECT user_id,
                     list_sort(list(ROUND(value, 2))) AS vals
              FROM events WHERE user_id < 30 GROUP BY user_id)
    """,
    "distinct_agg": """
        SELECT count(DISTINCT o_custkey) AS n_customers,
               count(DISTINCT o_orderpriority) AS n_priorities,
               count(*) AS n_orders
        FROM orders
    """,
    "set_union": """
        SELECT DISTINCT o_custkey FROM orders WHERE month(o_orderdate) = 1
        UNION
        SELECT DISTINCT o_custkey FROM orders WHERE month(o_orderdate) = 2
    """,
    "set_intersect": """
        SELECT DISTINCT o_custkey FROM orders WHERE month(o_orderdate) = 1
        INTERSECT
        SELECT DISTINCT o_custkey FROM orders WHERE month(o_orderdate) = 2
    """,
    "set_except": """
        SELECT DISTINCT o_custkey FROM orders WHERE month(o_orderdate) = 1
        EXCEPT
        SELECT DISTINCT o_custkey FROM orders WHERE month(o_orderdate) = 2
    """,
    "rollup_agg": """
        SELECT l_returnflag, l_linestatus, count(*) AS n,
               ROUND(SUM(l_quantity), 2) AS sum_qty
        FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    "cube_agg": """
        SELECT o_orderstatus, o_orderpriority, count(*) AS n,
               ROUND(SUM(o_totalprice), 2) AS sum_price
        FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    "pivot_event_counts": """
        SELECT date_trunc('day', ts) AS day,
               COUNT(*) FILTER (WHERE event_type = 'click') AS click,
               COUNT(*) FILTER (WHERE event_type = 'error') AS error,
               COUNT(*) FILTER (WHERE event_type = 'purchase') AS purchase,
               COUNT(*) FILTER (WHERE event_type = 'signup') AS signup,
               COUNT(*) FILTER (WHERE event_type = 'view') AS view
        FROM events GROUP BY 1
    """,
    "case_bucketize": """
        SELECT CASE WHEN value < 10 THEN 'low'
                    WHEN value < 100 THEN 'mid'
                    ELSE 'high' END AS bucket,
               count(*) AS n, ROUND(AVG(value), 4) AS avg_value
        FROM events GROUP BY 1
    """,
}
