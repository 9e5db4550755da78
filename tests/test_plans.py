"""Physical-plan assertions (PLANS.md made regression-proof): pushdown,
broadcast choices, partial aggregation, and top-k strategy are properties
of the code, not accidents of one Spark version's defaults."""

from __future__ import annotations

from api_to_parquet_spark.queries import all_queries

QUERIES = all_queries()


def _plan(spark, sf_smoke, name: str) -> str:
    df = QUERIES[name](spark, sf_smoke)
    return df._jdf.queryExecution().executedPlan().toString()


def test_filter_pushdown_reaches_scan(spark, sf_smoke):
    plan = _plan(spark, sf_smoke, "pricing_summary")
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan


def test_column_pruning(spark, sf_smoke):
    plan = _plan(spark, sf_smoke, "pricing_summary")
    # only the 7 used columns of 11 reach the scan
    read = [ln for ln in plan.splitlines() if "ReadSchema" in ln][0]
    assert "l_orderkey" not in read and "l_partkey" not in read


def test_star_join_broadcasts_all_dims(spark, sf_smoke):
    plan = _plan(spark, sf_smoke, "revenue_by_nation")
    assert plan.count("BroadcastHashJoin") == 5
    assert "SortMergeJoin" not in plan


def test_partial_aggregation_before_shuffle(spark, sf_smoke):
    plan = _plan(spark, sf_smoke, "pricing_summary")
    assert "partial_sum" in plan  # map-side combine
    assert plan.index("partial_sum") > plan.index("Exchange")  # below it


def test_topk_avoids_global_sort(spark, sf_smoke):
    plan = _plan(spark, sf_smoke, "sort_topk")
    assert "TakeOrderedAndProject" in plan


def test_disjunction_extracted_and_pushed(spark, sf_smoke):
    plan = _plan(spark, sf_smoke, "disjunctive_filter_join")
    assert "PushedFilters: [IsNotNull(l_partkey), Or(" in plan


def test_scalar_subquery_decorrelated(spark, sf_smoke):
    """The correlated per-part average becomes aggregate + join — no
    per-row subquery execution node survives in the physical plan."""
    plan = _plan(spark, sf_smoke, "scalar_subquery")
    assert "BroadcastHashJoin" in plan or "SortMergeJoin" in plan
    assert "InSubquery" not in plan and "ScalarSubquery" not in plan


def test_volume_shipping_pair_filter_pushed_to_nation_scans(spark, sf_smoke):
    """Q7: Catalyst derives the single-nation disjunction from the pair
    filter and pushes it into BOTH broadcast nation scans — the filter
    written above five joins still prunes at the leaves."""
    plan = _plan(spark, sf_smoke, "volume_shipping")
    assert plan.count("BroadcastHashJoin") == 5
    assert "SortMergeJoin" not in plan
    assert plan.count("Or(EqualTo(n_name,NATION_") == 2


def test_market_share_single_fact_shuffle(spark, sf_smoke):
    """Q8: seven broadcast joins, and the only hash-partitioned exchange
    is the lineitem⋈orders fact join — dimensions never shuffle."""
    plan = _plan(spark, sf_smoke, "market_share")
    assert plan.count("BroadcastHashJoin") == 7
    assert plan.count("Exchange hashpartitioning") == 1


def test_large_volume_customers_aggregates_before_join(spark, sf_smoke):
    """Q18: the HAVING pre-aggregation runs BELOW the orders join (the
    qualifying-orderkey set shrinks lineitem first), and the final top-20
    is TakeOrderedAndProject, not a global sort."""
    plan = _plan(spark, sf_smoke, "large_volume_customers")
    assert "TakeOrderedAndProject" in plan
    first_join = plan.index("BroadcastHashJoin")
    assert "partial_sum" in plan[first_join:]  # agg below the joins


def test_blame_supplier_decorrelates_both_subqueries(spark, sf_smoke):
    """Q21: the EXISTS becomes a semi join and the NOT EXISTS an anti
    join — no per-row subquery execution survives."""
    plan = _plan(spark, sf_smoke, "blame_supplier")
    assert "LeftSemi" in plan and "LeftAnti" in plan
    assert "InSubquery" not in plan


def test_revenue_forecast_all_predicates_pushed(spark, sf_smoke):
    """Q6: shipdate range, discount band, and quantity cap all reach the
    parquet scan; no shuffle other than the single-partition final agg."""
    plan = _plan(spark, sf_smoke, "revenue_forecast")
    scan = [ln for ln in plan.splitlines() if "PushedFilters" in ln][0]
    for col in ("l_shipdate", "l_discount", "l_quantity"):
        assert col in scan
    assert "Exchange hashpartitioning" not in plan


def test_aqe_splits_skewed_join(spark):
    """The session's skew-join claim, evidenced: a join where one key
    holds 90% of rows gets its hot partition SPLIT by AQE at runtime
    (SortMergeJoin(skew=true) + AQEShuffleRead skewed in the FINAL
    adaptive plan) instead of serializing on one reducer. Broadcast is
    disabled and thresholds lowered so the small test data exercises the
    same code path a 100 TB skew would."""
    from pyspark.sql import functions as F

    s2 = spark.newSession()
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s2.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.2")
    s2.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "65536"
    )
    s2.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "65536")
    left = s2.range(2_000_000).select(
        F.when(F.col("id") % 10 < 9, F.lit(0)).otherwise(F.col("id")).alias("k"),
        F.col("id").alias("v"),
    )
    right = s2.range(10_000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("w")
    )
    df = left.join(right, "k").groupBy().count()
    assert df.collect()[0]["count"] == 1_801_000
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in plan
    assert "skew=true" in plan, plan[:800]


def test_runtime_bloom_filter_prunes_fact_side(spark, sf_smoke):
    """Runtime row-level filtering: a selective dim filter injects a
    bloom-filter semi-filter (might_contain) into the FACT side of a
    shuffle join, discarding non-matching rows before the shuffle — the
    row-group-level complement to partition pruning. On by default in
    Spark 4; thresholds lowered so the small test tables qualify."""
    from pyspark.sql import functions as F

    s2 = spark.newSession()
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s2.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
        "10MB",
    )
    s2.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter"
        ".applicationSideScanSizeThreshold",
        "0",
    )
    li = s2.read.parquet(f"{sf_smoke}/lineitem.parquet")
    orders = s2.read.parquet(f"{sf_smoke}/orders.parquet").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    df = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy()
        .count()
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "might_contain" in plan, plan[:600]


def test_partsupp_derivation_is_shuffle_free(spark, sf_smoke):
    """The derived partsupp (Q16/Q20 input) must be a map-side 4x
    expansion of the part scan with the supplier count broadcast —
    no Exchange inside the derivation subtree."""
    from api_to_parquet_spark.queries.tpch import synthetic_partsupp

    plan = (
        synthetic_partsupp(spark, sf_smoke)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastExchange" in plan
    assert "Exchange hashpartitioning" not in plan, plan[:800]


def test_parts_supplier_cnt_pushes_part_filters(spark, sf_smoke):
    plan = _plan(spark, sf_smoke, "parts_supplier_cnt")
    assert "Not(EqualTo(p_brand,Brand#2))" in plan
    # The scan's filter list is elided in toString; the brand filter above
    # plus the StartsWith in the Filter node prove both reached the scan.
    assert "StartsWith(p_type" in plan


def test_band_pairs_candidates_one_hash_join(spark, sf_smoke):
    """The banded near-dup must join on (band, code) — never plan a
    cartesian/nested-loop candidate stage like the all-pairs baseline."""
    plan = _plan(spark, sf_smoke, "embedding_band_pairs")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_simhash_band_pairs_no_cartesian(spark, sf_smoke):
    """The banded SimHash scale path must bucket on (band, value) —
    candidates come from hash joins only, never a cartesian/nested-loop
    stage like its all-pairs oracle twin (simhash_dup_pairs)."""
    plan = _plan(spark, sf_smoke, "simhash_band_pairs")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_mega_bucket_block_join_is_equi_on_cells(spark):
    """The mega-bucket path must hash-partition on (bk, bi, bj) — the
    block-pair cell is the JOIN KEY, so per-task work is bounded by
    ~MEGA_BUCKET^2 regardless of bucket size. A bk-only equi-key (with
    the block condition as a post-filter) would stream the whole bucket
    through one task."""
    from pyspark.sql import functions as F

    from api_to_parquet_spark import dedup

    df = spark.createDataFrame(
        [(list(range(3000)),)], "ids: array<long>"
    ).select(F.array_sort("ids").alias("ids"))
    plan = (
        dedup._expand_id_pairs(df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    import re

    keys = re.findall(r"hashpartitioning\(([^)]*)\)", plan)
    assert any(
        "bk" in k and "bi" in k and "bj" in k for k in keys
    ), keys


def test_pandas_udaf_partial_merges_natively(spark, sf_smoke):
    """The two-level Python aggregate: ONE applyInPandas partial at
    the salted level-1 (a single FlatMapGroupsInPandas node — one
    Python round trip, not three grouped-agg UDFs; round-8 verdict
    #2), and the level-2 merge is a NATIVE aggregate with a map-side
    partial — no group's raw rows ever funnel through one Python
    task."""
    plan = _plan(spark, sf_smoke, "pandas_udaf_partial")
    assert plan.count("FlatMapGroupsInPandas") == 1, plan[:800]
    assert (
        plan.count("ArrowAggregatePython")
        + plan.count("AggregateInPandas")
        == 0
    ), plan[:800]
    assert "partial_sum" in plan


def test_format_roundtrip_reads_with_schema(spark, sf_smoke):
    """CSV read-back must carry the explicit schema (no inference scan)
    and aggregate with a partial before the exchange."""
    plan = _plan(spark, sf_smoke, "csv_roundtrip")
    assert "Scan csv" in plan
    assert "partial_count" in plan or "HashAggregate" in plan


def test_sketch_rollup_reaggregates_sketches_not_rows(spark, sf_smoke):
    """The coarse rollup must consume the fine-grained sketch table
    (hll_union_agg), not re-scan raw events per grouping."""
    plan = _plan(spark, sf_smoke, "sketch_rollup")
    assert "hll_union_agg" in plan
    assert plan.count("Scan parquet") == 1, plan[:800]


def test_make_series_two_level_agg_no_cartesian(spark, sf_smoke):
    """make-series: the heavy aggregate keys on (group, bin) with
    map-side partial aggregation; the per-group map assembly and dense-
    axis transform add no join at all — and never a cartesian."""
    plan = _plan(spark, sf_smoke, "kql_make_series")
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan
    assert "partial_count" in plan or "partial" in plan
    # dense axis is map-side transform over sequence(), not a join
    assert "Generate explode" in plan  # only the final mv-expand explodes


def test_top_hitters_no_global_sort(spark, sf_smoke):
    plan = _plan(spark, sf_smoke, "kql_top_hitters")
    assert "TakeOrderedAndProject" in plan
    assert "partial" in plan  # map-side combine before the one shuffle


def test_gopher_rules_zero_exchange(spark, sf_smoke):
    """The Gopher filter is a pure map: corpus scan -> project. Any
    Exchange here would be a scale bug."""
    plan = _plan(spark, sf_smoke, "gopher_rules")
    # spread()'s round-robin repartition is the only allowed exchange —
    # no hash/range shuffle (no keyed redistribution of the corpus)
    assert "hashpartitioning" not in plan and "rangepartitioning" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_dsir_weight_table_broadcasts(spark, sf_smoke):
    """dsir_sample: the 1024-row weight table must broadcast onto the
    token stream — a shuffle join on the bucket id would move the full
    token volume for a 1024-key dimension."""
    from api_to_parquet_spark import sampling

    plan = (
        sampling.q_dsir_sample(spark, sf_smoke)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_semantic_dedup_no_allpairs(spark, sf_smoke):
    """semantic_dedup candidates come from the (band, code) equi-join;
    no cartesian/broadcast-nested-loop stage anywhere in the plan."""
    from api_to_parquet_spark import similarity

    plan = (
        similarity.q_semantic_dedup(spark, sf_smoke)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_kql_scan_single_group_shuffle(spark, sf_smoke):
    """scan: step predicates are plain column comparisons BEFORE the
    grouped fold; the plan has the grouping aggregate but no join, no
    window, no Python."""
    from api_to_parquet_spark.lake import load
    from api_to_parquet_spark.queries.kql import kql

    load(spark, sf_smoke, "events").createOrReplaceTempView("events")
    plan = (
        kql(
            spark,
            "events | sort by ts asc, event_id asc"
            ' | scan by user_id with (step a: event_type == "view";'
            ' step b: event_type == "purchase")',
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "ObjectHashAggregate" in plan or "SortAggregate" in plan
    assert "Join" not in plan and "BatchEvalPython" not in plan


def test_ipv4_lookup_equi_join_no_range_join(spark, sf_smoke):
    """ipv4_lookup: the CIDR match is an EQUI join on (netkey, bits)
    with the tiny lookup broadcast — never a BroadcastNestedLoopJoin
    (the non-equi range-join failure mode at scale)."""
    from api_to_parquet_spark.lake import load
    from api_to_parquet_spark.queries.kql import kql

    load(spark, sf_smoke, "events").createOrReplaceTempView("events")
    plan = (
        kql(
            spark,
            "let L = datatable(network: string, zone: string)"
            '["10.0.0.0/8", "corp", "10.1.0.0/16", "lab"];'
            ' events | extend ip = strcat("10.",'
            ' tostring(event_id % 256), ".0.1")'
            " | project event_id, ip"
            " | evaluate ipv4_lookup(L, ip, network)",
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BroadcastHashJoin" in plan or "SortMergeJoin" in plan


def test_sliding_window_single_agg_no_rescan(spark, sf_smoke):
    """sliding_window_counts: ONE grouped aggregation over the
    exploded bins — no join, no window function, no per-bin rescans
    (a second scan of events would show two FileScans)."""
    from api_to_parquet_spark.lake import load
    from api_to_parquet_spark.queries.kql import kql

    load(spark, sf_smoke, "events").createOrReplaceTempView("events")
    plan = (
        kql(
            spark,
            "events | evaluate sliding_window_counts(user_id, ts,"
            " datetime(2024-01-05), datetime(2024-01-25), 3d, 1d)",
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Join" not in plan and "Window" not in plan
    assert plan.count("Scan parquet") <= 1


def test_sequence_detect_funnel_shuffles_on_key(spark, sf_smoke):
    """sequence_detect: the scan fold and the pivot both shuffle on
    the user key — no cartesian/nested-loop stage, no Python."""
    from api_to_parquet_spark.lake import load
    from api_to_parquet_spark.queries.kql import kql

    load(spark, sf_smoke, "events").createOrReplaceTempView("events")
    plan = (
        kql(
            spark,
            "events | extend t = unixtime_seconds_todatetime("
            "1700000000 + event_id * 60),"
            ' is_v = event_type == "view", is_c = event_type == "click"'
            " | evaluate sequence_detect(t, 30m, 1h, is_v, is_c,"
            " user_id)",
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "NestedLoop" not in plan and "Cartesian" not in plan
    assert "BatchEvalPython" not in plan


def test_rolling_percentile_single_scan_no_join(spark, sf_smoke):
    """rolling_percentile (round-7): bounded bin-explode + ONE grouped
    sorted-collect; bin presence comes from the own-row flag, so there
    is no join and no second scan of the input."""
    from api_to_parquet_spark.lake import load
    from api_to_parquet_spark.queries.kql import kql

    load(spark, sf_smoke, "events").createOrReplaceTempView("events")
    plan = (
        kql(
            spark,
            "events | evaluate rolling_percentile(value, 50, ts,"
            " 1d, 3, event_type)",
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Join" not in plan and "Window" not in plan
    assert plan.count("Scan parquet") <= 1
    assert "BatchEvalPython" not in plan


def test_graph_shortest_paths_equi_joins_only(spark, sf_smoke):
    """graph-shortest-paths (round-7): bounded-k chain EQUI joins +
    one min-length window — never a nested-loop/cartesian stage."""
    from api_to_parquet_spark.lake import load
    from api_to_parquet_spark.queries.kql import kql

    load(spark, sf_smoke, "events").createOrReplaceTempView("events")
    plan = (
        kql(
            spark,
            "events | summarize n = count()"
            " by src = event_type, dst = tostring(user_id % 50)"
            " | make-graph src --> dst"
            " | graph-shortest-paths (a)-[e*1..3]->(b)"
            " project x = a, y = b",
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "NestedLoop" not in plan and "Cartesian" not in plan


def test_ipv4_lookup_unmatched_single_subtree(spark, sf_smoke):
    """ipv4_lookup return_unmatched (round-7 advice fix): ONE subtree
    with a left outer equi-join — the source (and its nondeterministic
    row ids) is evaluated once, so exactly one parquet scan of the
    fact side and no BroadcastNestedLoopJoin."""
    from api_to_parquet_spark.lake import load
    from api_to_parquet_spark.queries.kql import kql

    load(spark, sf_smoke, "events").createOrReplaceTempView("events")
    plan = (
        kql(
            spark,
            "let L = datatable(network: string, zone: string)"
            '["10.0.0.0/8", "corp"];'
            ' events | extend ip = strcat("10.",'
            ' tostring(event_id % 256), ".0.1")'
            " | project event_id, ip"
            " | evaluate ipv4_lookup(L, ip, network, true)",
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert plan.count("Scan parquet") <= 1


def test_activity_counts_two_scans_max(spark, sf_smoke):
    """activity_counts_metrics (round-7): count+dcount share ONE
    grouped aggregation, so the fact table is scanned at most twice
    (per-bin counts + per-id first periods), never per-metric."""
    from api_to_parquet_spark.lake import load
    from api_to_parquet_spark.queries.kql import kql

    load(spark, sf_smoke, "events").createOrReplaceTempView("events")
    plan = (
        kql(
            spark,
            "events | evaluate activity_counts_metrics(user_id, ts,"
            " datetime(2024-01-01), datetime(2024-01-08), 1d)",
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Scan parquet") <= 2
    assert "BatchEvalPython" not in plan


def test_activity_metrics_single_fact_scan(spark, sf_smoke):
    """activity_metrics / new_activity_metrics (round-7): the deduped
    (id, period) set is materialized once (_cache_child), so the fact
    table appears as at most ONE parquet scan — the four downstream
    subqueries read the checkpointed rows (Scan ExistingRDD)."""
    from api_to_parquet_spark.lake import load
    from api_to_parquet_spark.queries.kql import kql

    load(spark, sf_smoke, "events").createOrReplaceTempView("events")
    for q in (
        "events | evaluate activity_metrics(user_id, ts,"
        " datetime(2024-01-01), datetime(2024-01-15), 1d)",
        "events | evaluate new_activity_metrics(user_id, ts,"
        " datetime(2024-01-01), datetime(2024-01-15), 1d)",
        # round-8: dimension columns ride the same single
        # materialized dedupe
        "events | evaluate activity_metrics(user_id, ts,"
        " datetime(2024-01-01), datetime(2024-01-15), 1d,"
        " event_type)",
    ):
        plan = (
            kql(spark, q)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert plan.count("Scan parquet") <= 1, q
        assert "Scan ExistingRDD" in plan, q


def test_funnel_linear_fact_scans(spark, sf_smoke):
    """funnel_sequence_completion (round-7): levels are materialized
    through the checkpoint ring, so a 3-state funnel scans the fact
    table at most 3 times (one per step) instead of O(N^2)."""
    from api_to_parquet_spark.lake import load
    from api_to_parquet_spark.queries.kql import kql

    load(spark, sf_smoke, "events").createOrReplaceTempView("events")
    plan = (
        kql(
            spark,
            "events | evaluate funnel_sequence_completion(user_id,"
            " ts, datetime(2024-01-01), datetime(2024-01-15), 7d,"
            ' event_type, dynamic(["view", "click", "purchase"]))',
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Scan parquet") <= 3
    assert "Scan ExistingRDD" in plan


def test_dedup_keep_best_labels_join_unhinted(spark, sf_smoke):
    """dedup_keep_best: the CC label table is corpus-scale at a
    realistic near-dup rate, so its join onto documents must NOT be
    hint-forced to broadcast (a forced broadcast is a hard OOM at
    100 TB, not a slowdown) — AQE decides from runtime stats, the
    same contract as the minhash verification joins."""
    from api_to_parquet_spark import dedup

    df = dedup.q_dedup_keep_best(spark, sf_smoke)
    analyzed = df._jdf.queryExecution().analyzed().toString()
    assert "ResolvedHint" not in analyzed
    assert "UnresolvedHint" not in analyzed
