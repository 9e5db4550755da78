"""Remaining TPC-H query shapes, adapted to the reduced driver schema.

The reference delegates all relational querying to Kusto/Synapse
(SURVEY.md §2.3/§3.3 — `src/main.go:88-116` just forwards the query
string), so the full TPC-H shape family is part of the Spark SQL surface
that replaces that passthrough. The corpus (TESTDATA.md) has no partsupp
table, no l_commitdate/l_receiptdate/l_shipmode and no comment columns,
so Q4/Q9/Q11/Q12/Q13/Q16/Q20/Q21 are adapted: the *plan shape* each query
exists to exercise (EXISTS decorrelation, left-outer count distribution,
nested-agg scalar subqueries, multi-correlated EXISTS/NOT EXISTS) is
preserved on the columns that do exist.

Plan notes (verified via .explain at sf0.1, see PLANS.md):
- star-ish joins broadcast their dimension side explicitly;
- correlated EXISTS/NOT EXISTS decorrelate to semi/anti joins;
- date filters and IN-lists reach the parquet scans as pushed filters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from api_to_parquet_spark.lake import load


def _views(spark: SparkSession, sf_dir: str, *tables: str) -> None:
    for t in tables:
        load(spark, sf_dir, t).createOrReplaceTempView(t)


def q_revenue_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: pure scan + filter + ungrouped agg. All three predicates
    (shipdate range, discount band, quantity cap) push to the parquet
    scan; the aggregate is a single partial+final pair with no shuffle of
    note. The canonical 'is pushdown working' probe."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        ).agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias(
                "revenue_delta"
            ),
            F.count("*").alias("n_lines"),
        )
    )


_ORDER_PRIORITY_SQL = """
    SELECT o.o_orderpriority, count(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1997-04-01'
      AND o.o_orderdate <  TIMESTAMP '1997-07-01'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate + INTERVAL 75 DAY)
    GROUP BY o.o_orderpriority
"""


def q_order_priority_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (commit/receipt dates absent → 'shipped more than
    75 days after ordering' is the lateness predicate). The correlated
    EXISTS decorrelates to a left-semi join on l_orderkey with the date
    comparison as the join residual — no per-order rescan."""
    _views(spark, sf_dir, "orders", "lineitem")
    return spark.sql(_ORDER_PRIORITY_SQL)


def q_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7: bi-directional nation-pair trade volume by year. The
    fact join (lineitem⋈orders) is the only big shuffle; supplier,
    customer and both nation legs broadcast. The pair filter is applied
    after the nation names are attached (OR of the two directions, so it
    cannot push below the joins)."""
    n1 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    supp = load(spark, sf_dir, "supplier")
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .filter(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


def q_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8: NATION_7 suppliers' share of the AMERICA ECONOMY-part
    market by order year. The share is a conditional-sum / sum ratio
    computed in one grouped pass; every dimension (part, supplier,
    customer, nation, region) broadcasts, so the fact tables shuffle only
    for their own join."""
    part = load(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    supp = load(spark, sf_dir, "supplier")
    nation_c = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_regionkey").alias("c_rk")
    )
    nation_s = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    region = load(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation_c), F.col("c_nationkey") == F.col("c_nk"))
        .join(F.broadcast(region), F.col("c_rk") == F.col("r_regionkey"))
        .join(F.broadcast(nation_s), F.col("s_nationkey") == F.col("s_nk"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("supp_nation") == "NATION_7", vol).otherwise(0.0))
                / F.sum(vol),
                6,
            ).alias("mkt_share"),
            F.round(F.sum(vol), 2).alias("total_volume"),
        )
    )


def q_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (no partsupp → cost proxied as 60% of the part's
    retail price × quantity): profit per supplier nation per year over
    parts with 'red' in the name. part/supplier/nation broadcast; the
    only fact-fact shuffle is lineitem⋈orders."""
    part = load(spark, sf_dir, "part").filter(F.col("p_name").contains("red"))
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    supp = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    amount = F.col("l_extendedprice") * (1 - F.col("l_discount")) - 0.6 * F.col(
        "p_retailprice"
    ) * F.col("l_quantity")
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year")
        )
        .agg(F.round(F.sum(amount), 2).alias("sum_profit"))
    )


_CUST_DISTRIBUTION_SQL = """
    SELECT c_count, count(*) AS custdist
    FROM (SELECT c.c_custkey AS ck, count(o.o_orderkey) AS c_count
          FROM customer c LEFT OUTER JOIN orders o
            ON c.c_custkey = o.o_custkey
           AND o.o_orderpriority <> '1-URGENT'
          GROUP BY c.c_custkey) AS per_cust
    GROUP BY c_count
"""


def q_cust_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 (order comment filter → priority filter): customers per
    non-urgent-order count, zero included via the left outer join. Two
    inherent shuffles: per-customer count, then the tiny distribution
    re-group; the second input is |customers| rows, AQE coalesces it."""
    _views(spark, sf_dir, "customer", "orders")
    return spark.sql(_CUST_DISTRIBUTION_SQL)


def q_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: orders whose total line quantity exceeds 250. The
    HAVING pre-aggregates lineitem down to qualifying orderkeys BEFORE
    joining orders/customer (the whole point of the shape — never join
    then filter); customer broadcasts."""
    li = load(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("raw_qty"))
        .filter(F.col("raw_qty") > 250)
        .select("l_orderkey", F.round("raw_qty", 2).alias("total_qty"))
    )
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    return (
        big.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            "o_totalprice",
            "total_qty",
        )
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(20)
    )


_TOP_SUPPLIER_SQL = """
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate <  TIMESTAMP '1997-04-01'
        GROUP BY l_suppkey)
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
"""


def q_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: quarterly revenue view, supplier(s) at the max. The
    scalar MAX subquery over the same CTE becomes a one-row broadcast
    joined as a filter; revenue is computed once (CTE reuse)."""
    _views(spark, sf_dir, "supplier", "lineitem")
    return spark.sql(_TOP_SUPPLIER_SQL)


_IMPORTANT_PARTS_SQL = """
    SELECT l_partkey,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS part_value
    FROM lineitem
    GROUP BY l_partkey
    HAVING SUM(l_extendedprice * (1 - l_discount)) >
           (SELECT 1.25 * AVG(pv)
            FROM (SELECT SUM(l_extendedprice * (1 - l_discount)) AS pv
                  FROM lineitem GROUP BY l_partkey) AS per_part)
"""


def q_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (no partsupp → revenue share per part): parts
    with more than 1.25x the average per-part revenue — a scale-free
    threshold, unlike Q11's literal fraction, so the selection is
    non-trivial at every sf. The uncorrelated scalar subquery is its own
    tiny aggregate broadcast into the HAVING filter."""
    _views(spark, sf_dir, "lineitem")
    return spark.sql(_IMPORTANT_PARTS_SQL)


def q_shipping_delay_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (no shipmode → delay buckets): lines shipped in
    1997 bucketed by order-to-ship latency, counting high- vs low-
    priority orders per bucket. The CASE pair folds into one partial
    aggregate; both scans carry pushed date filters."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    orders = load(spark, sf_dir, "orders")
    delay = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
    bucket = (
        F.when(delay < 30, "fast")
        .when(delay < 75, "normal")
        .otherwise("slow")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .select(bucket.alias("delay_bucket"), high.alias("is_high"))
        .groupBy("delay_bucket")
        .agg(
            F.sum(F.when(F.col("is_high"), 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(F.col("is_high"), 0).otherwise(1)).alias("low_line_count"),
        )
    )


_BLAME_SUPPLIER_SQL = """
    SELECT s.s_name, count(*) AS numwait
    FROM supplier s
    JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
    JOIN orders o ON o.o_orderkey = l1.l_orderkey
    WHERE o.o_orderstatus = 'F'
      AND l1.l_shipdate > o.o_orderdate + INTERVAL 75 DAY
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > TIMESTAMP '1997-01-01')
    GROUP BY s.s_name
"""


def q_blame_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (lateness = shipped >75 days after ordering):
    suppliers who shipped late on a finished multi-supplier order where
    every OTHER supplier's lines predate 1997. One EXISTS (semi join) and
    one NOT EXISTS (anti join), both decorrelated onto l_orderkey — three
    passes over lineitem but zero per-row rescans."""
    _views(spark, sf_dir, "supplier", "lineitem", "orders")
    return spark.sql(_BLAME_SUPPLIER_SQL)


# The corpus has no partsupp table (TESTDATA.md), so Q16/Q20 — the two
# shapes SURVEY.md §2.11 marked as uncovered — run against a DERIVED
# partsupp: 4 suppliers per part via modular arithmetic over p_partkey.
# The derivation is pure integer math on existing columns, so the DuckDB
# oracle rebuilds the identical table and the comparison stays value-exact.
# Spark side: a part-scan × 4 explode with the supplier count broadcast —
# no shuffle, scales as a map-side expansion of the part table.
_PARTSUPP_DUCK_CTE = """
    partsupp AS (
        SELECT p_partkey AS ps_partkey,
               (p_partkey + t.i * 17) % ns.n_supp AS ps_suppkey,
               (p_partkey * 7 + t.i * 13) % 9999 + 1 AS ps_availqty,
               ((p_partkey * 31 + t.i * 19) % 100000) / 100.0 AS ps_supplycost
        FROM part
        CROSS JOIN (SELECT COUNT(*) AS n_supp FROM supplier) ns
        CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS i) t)
"""

_PARTS_SUPPLIER_CNT_SQL = """
    SELECT p_brand, p_type, p_size,
           COUNT(DISTINCT ps_suppkey) AS supplier_cnt
    FROM partsupp
    JOIN part ON p_partkey = ps_partkey
    WHERE p_brand <> 'Brand#2'
      AND p_type NOT LIKE 'ECONOMY%'
      AND p_size IN (3, 5, 11, 23, 28, 36, 42, 49)
      AND ps_suppkey NOT IN
          (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""

_PROMOTABLE_SUPPLIERS_SQL = """
    SELECT s_name, ROUND(s_acctbal, 2) AS s_acctbal
    FROM supplier
    WHERE s_suppkey IN (
        SELECT ps_suppkey
        FROM partsupp
        JOIN (SELECT p_partkey FROM part WHERE p_name LIKE 'red%') rp
          ON ps_partkey = rp.p_partkey
        JOIN (SELECT l_partkey, l_suppkey,
                     0.5 * SUM(l_quantity) AS half_qty
              FROM lineitem
              WHERE l_shipdate >= TIMESTAMP '1997-01-01'
                AND l_shipdate <  TIMESTAMP '1998-01-01'
              GROUP BY l_partkey, l_suppkey) sh
          ON sh.l_partkey = ps_partkey AND sh.l_suppkey = ps_suppkey
        WHERE ps_availqty > half_qty)
      AND s_nationkey IN
          (SELECT n_nationkey FROM nation WHERE n_name = 'NATION_3')
    ORDER BY s_name
"""


def synthetic_partsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derived partsupp (see _PARTSUPP_DUCK_CTE): map-side 4× expansion
    of the part table; the supplier count arrives as a broadcast scalar,
    so the whole build is shuffle-free at any scale."""
    part = load(spark, sf_dir, "part").select("p_partkey")
    n_supp = (
        load(spark, sf_dir, "supplier").agg(F.count("*").alias("n_supp"))
    )
    return (
        part.crossJoin(F.broadcast(n_supp))
        .withColumn("i", F.explode(F.sequence(F.lit(0), F.lit(3))))
        .select(
            F.col("p_partkey").alias("ps_partkey"),
            ((F.col("p_partkey") + F.col("i") * 17) % F.col("n_supp")).alias(
                "ps_suppkey"
            ),
            ((F.col("p_partkey") * 7 + F.col("i") * 13) % 9999 + 1).alias(
                "ps_availqty"
            ),
            (
                ((F.col("p_partkey") * 31 + F.col("i") * 19) % 100000) / 100.0
            ).alias("ps_supplycost"),
        )
    )


def q_parts_supplier_cnt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct-supplier counts per (brand, type, size)
    over the derived partsupp, excluding flagged suppliers via a
    null-aware NOT IN (plans as a broadcast anti join on the tiny
    supplier exclusion set). The COUNT(DISTINCT) is the expensive part:
    Spark's two-phase distinct-aggregate keeps it one shuffle on the
    group keys."""
    _views(spark, sf_dir, "part", "supplier")
    synthetic_partsupp(spark, sf_dir).createOrReplaceTempView("partsupp")
    return spark.sql(_PARTS_SUPPLIER_CNT_SQL)


def q_promotable_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers in one nation whose availability
    exceeds half of what they actually shipped of 'red' parts in 1997.
    The correlated availqty > half-of-shipped predicate decorrelates to
    a pre-aggregated join on (partkey, suppkey); both IN-subqueries
    become semi joins (nation filter broadcast)."""
    _views(spark, sf_dir, "part", "supplier", "lineitem", "nation")
    synthetic_partsupp(spark, sf_dir).createOrReplaceTempView("partsupp")
    return spark.sql(_PROMOTABLE_SUPPLIERS_SQL)


QUERIES = {
    "revenue_forecast": q_revenue_forecast,
    "order_priority_check": q_order_priority_check,
    "volume_shipping": q_volume_shipping,
    "market_share": q_market_share,
    "product_profit": q_product_profit,
    "cust_order_distribution": q_cust_order_distribution,
    "large_volume_customers": q_large_volume_customers,
    "top_supplier": q_top_supplier,
    "important_parts": q_important_parts,
    "shipping_delay_buckets": q_shipping_delay_buckets,
    "blame_supplier": q_blame_supplier,
    "parts_supplier_cnt": q_parts_supplier_cnt,
    "promotable_suppliers": q_promotable_suppliers,
}

ORACLE = {
    "revenue_forecast": """
        SELECT ROUND(SUM(l_extendedprice * l_discount), 2) AS revenue_delta,
               count(*) AS n_lines
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1997-01-01'
          AND l_discount >= 0.05 AND l_discount <= 0.07
          AND l_quantity < 24
    """,
    "order_priority_check": _ORDER_PRIORITY_SQL,
    "volume_shipping": """
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               year(l.l_shipdate) AS l_year,
               ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
        WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
          AND l.l_shipdate <  TIMESTAMP '1998-01-01'
          AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
            OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        GROUP BY n1.n_name, n2.n_name, year(l.l_shipdate)
    """,
    "market_share": """
        SELECT year(o.o_orderdate) AS o_year,
               ROUND(SUM(CASE WHEN n2.n_name = 'NATION_7'
                              THEN l.l_extendedprice * (1 - l.l_discount)
                              ELSE 0.0 END)
                     / SUM(l.l_extendedprice * (1 - l.l_discount)), 6)
                   AS mkt_share,
               ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2)
                   AS total_volume
        FROM lineitem l
        JOIN part p ON l.l_partkey = p.p_partkey
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n1 ON c.c_nationkey = n1.n_nationkey
        JOIN region r ON n1.n_regionkey = r.r_regionkey
        JOIN nation n2 ON s.s_nationkey = n2.n_nationkey
        WHERE p.p_type = 'ECONOMY' AND r.r_name = 'AMERICA'
        GROUP BY year(o.o_orderdate)
    """,
    "product_profit": """
        SELECT n.n_name AS nation, year(o.o_orderdate) AS o_year,
               ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)
                         - 0.6 * p.p_retailprice * l.l_quantity), 2)
                   AS sum_profit
        FROM lineitem l
        JOIN part p ON l.l_partkey = p.p_partkey
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        WHERE p.p_name LIKE '%red%'
        GROUP BY n.n_name, year(o.o_orderdate)
    """,
    "cust_order_distribution": _CUST_DISTRIBUTION_SQL,
    "large_volume_customers": """
        SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
               o.o_totalprice, big.total_qty
        FROM (SELECT l_orderkey,
                     ROUND(SUM(l_quantity), 2) AS total_qty
              FROM lineitem GROUP BY l_orderkey
              HAVING SUM(l_quantity) > 250) AS big
        JOIN orders o ON big.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        ORDER BY o.o_totalprice DESC, o.o_orderkey
        LIMIT 20
    """,
    "top_supplier": _TOP_SUPPLIER_SQL,
    "important_parts": _IMPORTANT_PARTS_SQL,
    "shipping_delay_buckets": """
        SELECT CASE WHEN date_diff('day', o.o_orderdate, l.l_shipdate) < 30
                    THEN 'fast'
                    WHEN date_diff('day', o.o_orderdate, l.l_shipdate) < 75
                    THEN 'normal'
                    ELSE 'slow' END AS delay_bucket,
               SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                        THEN 1 ELSE 0 END)::BIGINT AS high_line_count,
               SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                        THEN 0 ELSE 1 END)::BIGINT AS low_line_count
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
          AND l.l_shipdate <  TIMESTAMP '1998-01-01'
        GROUP BY 1
    """,
    "blame_supplier": _BLAME_SUPPLIER_SQL,
    "parts_supplier_cnt": f"WITH {_PARTSUPP_DUCK_CTE.strip()}\n{_PARTS_SUPPLIER_CNT_SQL}",
    "promotable_suppliers": f"WITH {_PARTSUPP_DUCK_CTE.strip()}\n{_PROMOTABLE_SUPPLIERS_SQL}",
}
