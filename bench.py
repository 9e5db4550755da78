"""Benchmark harness — the driver runs this per-round and records the JSON.

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
on local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is materialized with the `noop` sink (full execution, no driver
collect) so the measured time is the distributed plan, not result transfer.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from api_to_parquet_spark import get_spark
from api_to_parquet_spark.queries import all_queries

# Headline set: one per major operator family (SURVEY.md §2 + training-data
# extensions). Kept to ~10 so a bench run stays minutes, not hours.
HEADLINE = [
    "pricing_summary",  # TPC-H Q1-shaped scan+agg (A4/A1 family)
    "revenue_by_nation",  # star join: broadcast dims + fact shuffle (§2.3)
    "top_unshipped_orders",  # join + agg + top-k (L1/L2)
    "window_topk_per_group",  # ranking window (§2.5)
    "asof_join",  # time-series point-in-time join (§2.3)
    "tumbling_window_agg",  # event-time windowing (ST4)
    "dedup_exact",  # exact dedup over documents
    "minhash_lsh_pairs",  # MinHash+LSH near-dup
    "knn_bruteforce",  # cosine top-k over embeddings
    "text_token_stats",  # text analysis over documents
    "scalar_subquery",  # correlated subquery (decorrelation)
    "range_join",  # time-band self-join with equi key
    "session_window_agg",  # per-user session windows
    "gap_fill_resample",  # hourly grid + forward-fill
    "ann_ivf_topk",  # IVF approximate nearest neighbors
    "parts_supplier_cnt",  # TPC-H Q16 over derived partsupp
    "embedding_band_pairs",  # sign-band bucketed embedding near-dup
    "corpus_pipeline",  # composed quality->dedup corpus prep census
    "kql_summarize",  # KQL frontend translation + grouped agg
    "simhash_band_pairs",  # pigeonhole-banded SimHash near-dup (r3)
    "pandas_udaf_partial",  # salted Python partials + native merge (r3)
    "kql_make_series",  # dense gap-filled time series, 2-level agg (r3)
    "gopher_rules",  # zero-shuffle corpus quality filter (r3)
    "kql_series_anomalies",  # seasonal decompose + Tukey flags (r3)
    "semantic_dedup",  # SemDeDup: banded edges + connected components (r3)
    "dsir_sample",  # hashed-ngram importance resampling (r3)
    "kql_scan",  # greedy sequence matching via grouped fold (r3)
    "kql_join_innerunique",  # ADX default join: windowed key dedup (r4)
    "kql_fork",  # multi-consumer pipes, shared-prefix ReuseExchange (r4)
    "kql_parse_kv",  # map-side key-value extraction (r4)
    "repeated_ngram_spans",  # Lee-et-al repeated-substring signal (r4)
    "kql_sequence_detect",  # funnel mining on the scan fold (r6)
    "kql_sliding_window",  # sliding dcount via bounded bin-explode (r6)
    "kql_autocluster",  # diagnostics ONE-CUBE segment mining (r6)
    "kql_ipv4_lookup",  # longest-prefix CIDR equi-join (r6)
    "kql_rolling_percentile",  # windowed exact percentile, bin-explode (r7)
    "kql_graph_shortest",  # bounded-k relational BFS (r7)
    "kql_idioms4",  # set/bin_auto + tabular-let subqueries + bag expand (r8)
    "pii_scrub",  # map-side PII redaction chain over documents (r8)
    "kql_output_schema",  # declared-schema bag_unpack+pivot, zero discovery (r9)
    "kql_scan_self",  # self-step state refs on the scan fold (r9)
    "dedup_keep_best",  # quality-aware near-dup survivor via CC + window (r9)
    "kql_user_agent3",  # UA bot tier: map-side marker-precedence regexes (r10)
    "kql_scalar_fns14",  # ADX real-div-by-zero guard, map-side CASE (r11)
    "kql_geo2",  # S2 cell tokens: 30-step JVM Hilbert folds, no UDF (r13)
    "kql_user_agent5",  # UA tier-5 Chromium shells, map-side regexes (r13)
]

# Per-query medians pinned from the last judged round (bench_pins.json).
# A headline query slower than 1.5x its pin is flagged in the output —
# the mechanical regression gate the round-3 verdict asked for.
# CANARY-NORMALIZED pins (round-8 verdict #5): absolute seconds drift
# with container state (six runs of identical code spanned 22.7-29.1 s
# across rounds 6-8, producing only false flags), so each query is
# ALSO pinned as its ratio to the pricing_summary canary — a plain
# scan+agg with zero source churn. Container-state drift inflates the
# canary and the query together, cancelling in the ratio; a true code
# regression inflates only the query. Round-10 (round-9 verdict #7):
# absolute comparisons are DEMOTED to informational "absolute_drift" —
# still emitted so the history stays comparable, but no longer a gate
# (rounds 8-9 showed them flagging disjoint sets of zero-source-change
# queries run-to-run while the ratio pins flagged nothing). The gate is
# "ratio_regressions" + the "ingest_rate_x_canary" floor only.
PIN_FILE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "bench_pins.json")
PIN_RATIO = 1.5
CANARY = "pricing_summary"


def ingest_throughput(
    spark, n_envelopes: int = 10, rows_per_envelope: int = 80_000
) -> float:
    """Rows/sec through parse → validate → explode → normalize →
    partitioned lake write for the reference's load shape: 10 concurrent
    80 000-row POSTs (tests/hammertime.sh:7 × tests/main.go:72,
    BASELINE.md). One envelope is one JSON string = one parse task, so
    parallelism comes from envelope count — exactly as it does for the
    reference's 10-concurrent HTTP handlers."""
    import json
    import random
    import shutil
    import tempfile

    from api_to_parquet_spark import ingest, lake

    rng = random.Random(42)
    envs = []
    for e in range(n_envelopes):
        envs.append(
            json.dumps(
                {
                    "content": [
                        {
                            "Timestamp": 1700000000000 + i,
                            "PointId": f"p{rng.randint(0, 99)}",
                            "Project": f"proj{rng.randint(0, 9)}",
                            "Value": rng.uniform(1, 43),
                        }
                        for i in range(rows_per_envelope)
                    ],
                    "id": f"bench-{e}",
                    "source": "factory-1",
                    "timeGenerated": 1700000000000 + e,
                    "file": f"factory-1/2023/10/26/{e:02d}/bench.parquet",
                }
            )
        )
    target = tempfile.mkdtemp(prefix="bench_lake_")
    try:
        raw = spark.createDataFrame(
            [(e,) for e in envs], ["value"]
        ).repartition(n_envelopes)
        # Two warm passes: one is not enough JIT for the parse-heavy
        # path (measured 99k -> 117k -> 175k rows/s on identical runs),
        # and the steady state is what a long-running ingester sees.
        # Report the median of three measured runs.
        times: list[float] = []
        for rep in range(5):
            t0 = time.perf_counter()
            points, _ = ingest.ingest_batch(raw)
            lake.write_lake(points, target)
            if rep >= 2:
                times.append(time.perf_counter() - t0)
        dt = sorted(times)[len(times) // 2]
    finally:
        shutil.rmtree(target, ignore_errors=True)
    return round(n_envelopes * rows_per_envelope / dt, 1)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()

    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    for name in HEADLINE:
        # A single failing query must not zero out the whole bench run —
        # record the error and keep timing the rest.
        try:
            for _ in range(2):  # two warm passes: JIT + IO cache (see ingest note)
                qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            # Median of 3 measured runs: single-shot timings swing ±40%
            # run-to-run (GC, AQE re-plans, page cache), which made
            # round-over-round comparison uninformative.
            reps: list[float] = []
            for _ in range(3):
                t0 = time.perf_counter()
                qs[name](spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                reps.append(time.perf_counter() - t0)
            timings[name] = round(sorted(reps)[1], 3)
        except Exception as exc:  # noqa: BLE001
            errors[name] = str(exc).split("\n", 1)[0][:200]

    total = round(sum(timings.values()), 3)
    ingest_rps = ingest_throughput(spark)
    # informational only (see pin-block comment): absolute drift set
    absolute_drift: dict[str, dict[str, float]] = {}
    ratio_regressions: dict[str, dict[str, float]] = {}
    canary_t = timings.get(CANARY)
    try:
        with open(PIN_FILE) as fh:
            pins = json.load(fh)
        if str(pins.get("sf")) == sf:  # pins are sf-specific
            for name, t in timings.items():
                pin = pins["queries"].get(name)
                if pin and t > PIN_RATIO * pin:
                    absolute_drift[name] = {"now": t, "pin": pin}
            # canary-normalized flags: query/canary ratio vs its pin
            pin_ratios = pins.get("ratios", {})
            if canary_t:
                for name, t in timings.items():
                    if name == CANARY:
                        continue
                    rpin = pin_ratios.get(name)
                    r = round(t / canary_t, 3)
                    if rpin and r > PIN_RATIO * rpin:
                        ratio_regressions[name] = {
                            "now_ratio": r,
                            "pin_ratio": rpin,
                        }
            # throughput pin is a FLOOR: flag when ingest drops below
            # pin/1.5 (the round-4 345k->308k dip went unflagged)
            rps_pin = pins.get("ingest_rows_per_sec")
            if rps_pin and ingest_rps < rps_pin / PIN_RATIO:
                absolute_drift["ingest_rows_per_sec"] = {
                    "now": ingest_rps,
                    "pin": rps_pin,
                }
            # canary-normalized ingest floor: rows/s × canary seconds
            # is container-drift-invariant to first order
            rxc_pin = pins.get("ingest_rate_x_canary")
            if rxc_pin and canary_t:
                rxc = round(ingest_rps * canary_t, 1)
                if rxc < rxc_pin / PIN_RATIO:
                    ratio_regressions["ingest_rate_x_canary"] = {
                        "now_ratio": rxc,
                        "pin_ratio": rxc_pin,
                    }
    except (OSError, ValueError, KeyError):
        pass
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "ingest_rows_per_sec": ingest_rps,
                **({"errors": errors} if errors else {}),
                **(
                    {"absolute_drift": absolute_drift}
                    if absolute_drift
                    else {}
                ),
                **(
                    {"ratio_regressions": ratio_regressions}
                    if ratio_regressions
                    else {}
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
