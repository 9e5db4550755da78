"""KQL frontend tour: the round-3 analytics surface in one script.

    python examples/kql_tour.py [sf_dir]

Runs, against the driver testdata, the KQL idioms a Kusto user of the
reference's POST /query (/root/reference/src/main.go:88-116) reaches
for beyond the basics: time-series analytics (make-series +
series_fit_line / series_outliers / series_decompose_anomalies /
series_moving_avg), sequence matching (scan), diagnostics (evaluate
basket, facet), ad-hoc tables (datatable + lookup), and dashboards
ending in render.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from api_to_parquet_spark import get_spark
from api_to_parquet_spark.lake import load
from api_to_parquet_spark.queries.kql import kql


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("kql_tour", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    load(spark, sf_dir, "events").createOrReplaceTempView("events")

    print("== trend fit per user (series_fit_line) ==")
    kql(
        spark,
        "events | make-series n=count() default=0.0 on ts"
        " from datetime(2024-01-01) to datetime(2024-01-08) step 1d"
        " by user_id"
        " | extend (rsq, slope, va, rva, icept, fit) = series_fit_line(n)"
        " | project user_id, slope = round(slope, 4), rsq = round(rsq, 4)"
        " | top 5 by slope",
    ).show()

    print("== daily anomalies (series_decompose_anomalies) ==")
    kql(
        spark,
        "events | make-series n=count() default=0.0 on ts"
        " from datetime(2024-01-01) to datetime(2024-01-15) step 1d"
        " by user_id"
        " | extend (an, sc, bl) = series_decompose_anomalies(n, 7)"
        " | mv-expand ts, n, an"
        " | where an != 0 | project user_id, ts, n | take 5",
    ).show()

    print("== smoothing (series_moving_avg) ==")
    kql(
        spark,
        "print y = pack_array(1.0, 2.0, 4.0, 8.0, 16.0)"
        " | extend ma = series_moving_avg(y, 3)",
    ).show(truncate=False)

    print("== funnel sequences (scan) ==")
    kql(
        spark,
        "events | sort by ts asc, event_id asc"
        " | scan by user_id with ("
        ' step s_view: event_type == "view";'
        ' step s_click: event_type == "click";'
        ' step s_purchase: event_type == "purchase")'
        " | summarize conversions = dcountif(match_id,"
        ' step == "s_purchase") by user_id'
        " | top 5 by conversions",
    ).show()

    print("== diagnostics (evaluate basket) ==")
    kql(
        spark,
        "events | project event_type,"
        ' band = case(value < 50, "low", "high")'
        " | evaluate basket(0.15)",
    ).show()

    print("== graph analytics (make-graph + graph-match) ==")
    kql(
        spark,
        'datatable(src: string, dst: string, w: long)'
        ' ["a","b",1, "b","c",2, "a","c",3, "c","d",1]'
        " | make-graph src --> dst"
        " | graph-match (x)-[e*1..3]->(y)"
        ' where x == "a" project x, y | sort by y asc',
    ).show()

    print("== ad-hoc dimension (datatable + lookup) + render ==")
    kql(
        spark,
        'events | lookup (datatable(event_type: string, w: real)'
        ' ["purchase", 2.0, "view", 1.0]) on event_type'
        " | summarize weighted = sum(round(value * coalesce(w, 0.5), 2))"
        " by event_type | sort by event_type asc"
        " | render columnchart",
    ).show()

    print("== round-4: fork / as (multi-consumer pipes) ==")
    kql(
        spark,
        "events | summarize n = count() by event_type | as pertype"
        " | fork top2 = (top 2 by n) total = (summarize all_n = sum(n))",
    ).show()

    print("== round-4: invoke (function lets) ==")
    kql(
        spark,
        "let hourly = (source:(*)) { source"
        " | summarize n = count() by h = hourofday(ts) | top 3 by n };"
        "events | invoke hourly()",
    ).show()

    print("== round-4: parse-kv + parse_url ==")
    kql(
        spark,
        'events | take 3 | extend kvs = strcat("t=", event_type,'
        ' ";u=", tostring(user_id))'
        " | parse-kv kvs as (t:string, u:long)"
        ' with (pair_delimiter=";", kv_delimiter="=")'
        ' | extend link = strcat("https://ex.com:8080/e/", t, "#f")'
        " | project t, u, host = parse_url(link).Host,"
        " port = parse_url(link).Port",
    ).show()

    print("== round-4: diffpatterns (what differs between subsets) ==")
    kql(
        spark,
        'events | extend band = iff(value < 50, "lo", "hi")'
        " | project band, event_type"
        ' | evaluate diffpatterns(band, "lo", "hi") | take 5',
    ).show()

    print("== round-4: reduce by (log-pattern mining) ==")
    kql(
        spark,
        'events | take 200 | extend m = strcat("evt-",'
        ' tostring(event_id), " ", event_type)'
        " | reduce by m | top 5 by Count",
    ).show()

    print("== round-6: timespan + format_timespan ==")
    kql(
        spark,
        "events | summarize mn = min(ts), mx = max(ts) by user_id"
        " | extend dur = mx - mn | where dur > 12h | take 3"
        " | project user_id, span = format_timespan(dur, 'd.hh:mm:ss')",
    ).show()

    print("== round-6: scan declare (running total per instance) ==")
    kql(
        spark,
        "events | take 500 | sort by ts asc, event_id asc"
        " | scan by user_id declare (sv: real = 0.0) with ("
        ' step s1: event_type == "view" => sv = sv + value;'
        ' step s2: event_type == "purchase" => sv = sv + value)'
        " | take 5 | project user_id, step, match_id, sv",
    ).show()

    print("== round-6: sequence_detect (view->click funnels) ==")
    kql(
        spark,
        "events | extend t = unixtime_seconds_todatetime(1700000000"
        " + event_id * 60),"
        ' is_v = event_type == "view", is_c = event_type == "click"'
        " | evaluate sequence_detect(t, 30m, 1h, is_v, is_c, user_id)"
        " | take 5",
    ).show()

    print("== round-6: sliding_window_counts (3d active users) ==")
    kql(
        spark,
        "events | evaluate sliding_window_counts(user_id, ts,"
        " datetime(2024-01-05), datetime(2024-01-12), 3d, 1d)"
        " | sort by ts asc",
    ).show()

    print("== round-6: ipv4_lookup (longest-prefix CIDR zones) ==")
    kql(
        spark,
        "let L = datatable(network: string, zone: string)"
        '["10.0.0.0/8", "corp", "10.5.0.0/16", "lab"];'
        " events | take 200"
        ' | extend ip = strcat("10.", tostring(event_id % 10),'
        ' ".0.1") | project event_id, ip'
        " | evaluate ipv4_lookup(L, ip, network) | take 5",
    ).show()

    print("== round-6: evaluate python (inline script) ==")
    # round-7: the plugin exec()s query-supplied code, so it is an
    # explicit engine-level opt-in (the HTTP service never sets it)
    kql(
        spark,
        "events | take 100 | project event_id, value"
        " | evaluate python(typeof(*, vsq:real),"
        " 'result = df.assign(vsq = df.value * df.value)')"
        " | take 3",
        enable_python=True,
    ).show()

    print("== round-7: leading union + composite aggregates ==")
    kql(
        spark,
        "union withsource=src (events | where value > 99),"
        " (events | where value < 1)"
        " | summarize n = count(),"
        " pct_hi = round(todouble(100) * countif(value > 99)"
        " / count(), 1) by src",
    ).show()

    print("== round-7: tdigest rollup + rolling percentile ==")
    kql(
        spark,
        "events | extend cents = tolong(round(value * 100)),"
        " b = user_id % 4"
        " | summarize td = tdigest(cents) by event_type, b"
        " | summarize mtd = merge_tdigest(td) by event_type"
        " | project event_type, p50 = percentile_tdigest(mtd, 50),"
        " p95 = percentile_tdigest(mtd, 95, typeof(long))",
    ).show()
    kql(
        spark,
        "events | evaluate rolling_percentile(value, 50, ts, 1d, 3)"
        " | sort by ts asc | take 5",
    ).show()

    print("== round-7: graph-shortest-paths ==")
    kql(
        spark,
        "datatable(src: string, dst: string)"
        ' ["a","b", "b","c", "c","d", "a","c", "d","e"]'
        " | make-graph src --> dst"
        " | graph-shortest-paths (s)-[e*1..4]->(t)"
        ' where s == "a" project s, t | sort by t asc',
    ).show()

    print("== round-7: in ((pipe)), dynamic literals, fn lets ==")
    kql(
        spark,
        "let dbl = (x: real) { x * 2 };"
        " events | where user_id in ((events | where value > 120"
        " | project user_id))"
        " | extend tags = dynamic([1, 2, 3]), dv = dbl(value)"
        " | mv-expand tags limit 2"
        " | summarize n = count(), mx = max(dv) by tags"
        " | sort by tags asc",
    ).show()

    print("== round-7: activity_counts_metrics ==")
    kql(
        spark,
        "events | evaluate activity_counts_metrics(user_id, ts,"
        " datetime(2024-01-01), datetime(2024-01-08), 1d)"
        " | sort by ts asc",
    ).show()


if __name__ == "__main__":
    main()
