"""Idiom probe batteries (round-8): ~110 real-world KQL snippets in
the shapes users paste — joins, dynamics, datetime/string/array
scalars, aggregates, plugins. Each must translate AND execute. The
three batteries caught eight translator gaps when first run (verbatim
strings, bare-numeric lets, mv-expand kind=, where * has, has_any
over dynamic lists, stored-dynamic accessor chains, find pipe
operands, dcountif arity); frozen here so none regress."""

from __future__ import annotations

import pytest

from api_to_parquet_spark.lake import load
from api_to_parquet_spark.queries.kql import kql

PROBES = [
    ("unnamed count", "events | summarize count() by bin(ts, 1h) | take 3"),
    ("unnamed avg", "events | summarize avg(value) by event_type"),
    ("unnamed multi", "events | summarize min(ts), max(ts)"),
    ("unnamed percentile", "events | summarize percentile(value, 95) by event_type"),
    ("summarize by only", "events | summarize by event_type"),
    ("order by synonym", "events | order by value desc | take 3"),
    ("project-rename", "events | project-rename eid = event_id | take 2"),
    ("hourofday", "events | extend h = hourofday(ts), dw = dayofweek(ts), dm = dayofmonth(ts) | take 2"),
    ("distinct star", "events | distinct * | count"),
    ("sample", "events | sample 5"),
    ("mv-expand kind=array", "events | take 1 | extend a = pack_array(1,2) | mv-expand kind=array a"),
    ("where * has", 'events | where * has "view" | count'),
    ("datetime_diff", "events | extend d = datetime_diff('day', ts, datetime(2024-01-01)) | take 2"),
    ("arg_max star by", "events | summarize arg_max(ts, *) by event_type"),
    ("render", "events | summarize count() by event_type | render barchart"),
    ("case default", 'events | extend b = case(value > 50, "hi", "lo") | take 2'),
    ("in list", "events | where event_id in (1, 2, 3) | count"),
    ("top 10 by agg col", "events | summarize c = count() by user_id | top 3 by c"),
    ("extend then summarize same name", "events | extend value = value * 2 | summarize sum(value)"),
    ("project-away", "events | project-away props | take 2"),
    ("gettype", "events | extend t = gettype(value) | take 1"),
    ("strcat_delim", 'events | extend s = strcat_delim("-", event_type, tostring(event_id)) | take 1'),
    ("countif/iff", "events | summarize countif(value > 10), sumif(value, value > 10)"),
    ("let number", "let n = 5; events | take n"),
    ("let datetime", "let d = datetime(2024-01-02); events | where ts > d | count"),
    ("startofmonth", "events | extend m = startofmonth(ts) | take 1"),
    ("binary ops", "events | extend b = binary_and(event_id, 7) | take 1"),
    ("tostring null", "events | extend s = tostring(long(null)) | take 1"),
    ("array_length", "events | take 1 | extend a = pack_array(1,2) | extend n = array_length(a)"),
    ("bag_keys props", "events | take 1 | extend k = bag_keys(todynamic(props))"),
    ("column_ifexists", 'events | extend v = column_ifexists("nope", 0) | take 1'),
    ("has_all", 'events | where props has_all ("k") | count'),
    ("not()", "events | where not(value > 50) | count"),
    ("extract_all", 'events | extend xs = extract_all(@"(\\d+)", props) | take 1'),
    ("verbatim string", 'events | where event_type == @"view" | count'),
    ("multiline obfuscated", "events | where event_type has 'vi' | count"),
    ("leading union withsource", "union withsource=tbl events | count"),
    ("datatable head", 'datatable (a: long, b: string) [1, "x", 2, "y"] | where a > 1'),
    ("summarize dcountif", "events | summarize dcountif(user_id, value > 10)"),
    ("join on different names", "events | take 50 | join kind=inner (events | project uid2 = user_id, v2 = value) on $left.user_id == $right.uid2 | count"),
    ("3-way join", "events | take 20 | join (events | project user_id, a = value) on user_id | join (events | project user_id, b = value) on user_id | count"),
    ("anti join", "events | join kind=leftanti (events | where value > 50 | project user_id) on user_id | count"),
    ("summarize then join", "events | summarize c = count() by user_id | join kind=inner (events | summarize s = sum(value) by user_id) on user_id | take 3"),
    ("mv-apply summarize", "events | take 3 | extend a = pack_array(1, 2, 3) | mv-apply e = a on (summarize s = sum(e))"),
    ("nested dynamic access", "events | take 1 | extend j = parse_json('{\"a\": {\"b\": [1, 2]}}') | extend v = toint(j.a.b[1])"),
    ("bag_merge chain", 'events | take 1 | extend b = bag_merge(pack("a", 1), pack("b", 2), pack("c", 3))'),
    ("array concat", "events | take 1 | extend a = array_concat(pack_array(1), pack_array(2, 3)) | extend n = array_length(a)"),
    ("series on make-series", "events | make-series m = avg(value) default=0.0 on ts from datetime(2024-01-01) to datetime(2024-01-05) step 1d by event_type | extend s = series_stats_dynamic(m)"),
    ("dcount accuracy arg", "events | summarize dcount(user_id, 3)"),
    ("percentile multi", "events | summarize percentiles(value, 25, 50, 75) by event_type"),
    ("summarize bin alias", "events | summarize c = count() by ts = bin(ts, 1d) | take 2"),
    ("union 3-way mixed", "union events, (events | take 5), (events | where value > 90) | count"),
    ("nested let functions", "let f = (x: long) { x * 2 }; let g = (x: long) { f(x) + 1 }; events | extend r = g(event_id) | take 2"),
    ("prev after sort", "events | sort by event_id asc | extend d = value - prev(value) | take 3"),
    ("row_cumsum", "events | sort by event_id asc | extend rc = row_cumsum(value) | take 3"),
    ("top with ties-ish", "events | top 5 by value desc | project event_id, value"),
    ("extend overwrite ts", "events | extend ts = bin(ts, 1h) | summarize c = count() by ts | take 2"),
    ("has_any dynamic", 'events | where event_type has_any (dynamic(["view", "click"])) | count'),
    ("toscalar in where", "events | where value > toscalar(events | summarize avg(value)) | count"),
    ("format_datetime tokens", 'events | extend s = format_datetime(ts, "yyyy-MM-dd HH:mm:ss") | take 1'),
    ("string split index", 'events | extend p = split(props, "\\"")[0] | take 1'),
    ("summarize count_distinct", "events | summarize count_distinct(user_id)"),
    ("make_set of bin", "events | summarize s = array_sort_asc(make_set(event_type)) by user_id % 3 | take 2"),
    ("iff nested", 'events | extend t = iff(value > 50, iff(value > 90, "xl", "l"), "s") | take 2'),
    ("arg_min", "events | summarize arg_min(value, event_id, ts) by event_type"),
    ("between datetimes", "events | where ts between (datetime(2024-01-02) .. datetime(2024-01-05)) | count"),
    ("exclude project-away wildcard", "events | project-away p* | take 1"),
    ("project wildcard keep", "events | project-keep event*, value | take 1"),
    ("series_divide chain", "events | make-series m = sum(value) default=0.0 on ts from datetime(2024-01-01) to datetime(2024-01-04) step 1d | extend r = series_divide(m, series_add(m, 1.0))"),
    ("series first/last", "events | make-series m = count() default=0 on ts from datetime(2024-01-01) to datetime(2024-01-04) step 1d | extend f = m[0], l = m[array_length(m) - 1]"),
    ("scan two steps", "events | where user_id == 1 | sort by ts asc | scan with (step s1: event_type == 'view'; step s2: event_type == 'purchase';)"),
    ("graph nodes arg", "events | take 100 | make-graph user_id --> event_id | graph-match (a)-[e]->(b) project x = a, y = b | count"),
    ("startofweek sunday", "print d = startofweek(datetime(2024-01-03))"),
    ("week_of_year", "print w = week_of_year(datetime(2024-01-03))"),
    ("endofday micro", "print e = endofday(datetime(2024-01-03 10:00:00))"),
    ("dayofyear", "print d = dayofyear(datetime(2024-02-01))"),
    ("getyear/getmonth", "print y = getyear(datetime(2024-02-01)), m = getmonth(datetime(2024-02-01))"),
    ("hourofday on col", "events | summarize c = count() by h = hourofday(ts) | top 3 by c"),
    ("substring negative", "print s = substring('hello', 1)"),
    ("indexof", "print i = indexof('hello', 'll'), j = indexof('hello', 'zz')"),
    ("split no index", "events | take 1 | extend parts = split(props, ' ') | extend n = array_length(parts)"),
    ("trim chars", "print t = trim('x', 'xhellox'), ts_ = trim_start('x', 'xh'), te = trim_end('x', 'hx')"),
    ("tolower chain", "events | extend t = tolower(toupper(event_type)) | where t == event_type | count"),
    ("isnull on double", "events | extend b = isnull(value) | summarize countif(b)"),
    ("string_size vs strlen", "print a = strlen('héllo'), b = string_size('héllo')"),
    ("url fns", "print e = url_encode('a b/c'), d = url_decode(url_encode('a b/c'))"),
    ("parse_url host", "print h = tostring(parse_url('https://x.org:81/p?q=1').Host)"),
    ("round/floor/ceiling", "print r = round(2.5), f = floor(2.7, 1), c = ceiling(2.1)"),
    ("abs/sign/sqrt", "print a = abs(-3), s = sign(-2.5), q = sqrt(16.0)"),
    ("degrees/radians", "print d = degrees(pi()), r = radians(180.0)"),
    ("log bases", "print a = log(exp(1.0)), b = log10(100.0), c = log2(8.0)"),
    ("pow synonym", "print p = pow(2, 10)"),
    ("now minus ago equality", "print ok = now() >= ago(0s)"),
    ("range step timespan", "range t from datetime(2024-01-01) to datetime(2024-01-03) step 1d | count"),
    ("range numeric", "range x from 1 to 10 step 3 | summarize s = sum(x)"),
    ("print multiple", "print a = 1, b = 'x', c = datetime(2024-01-01)"),
    ("datatable pipe ops", 'datatable (x: long) [1, 2, 3] | where x > 1 | summarize s = sum(x)'),
    ("toint truncation", "print i = toint(3.9), n = tolong(-3.9)"),
    ("strcmp", "print c = strcmp('a', 'b'), e = strcmp('a', 'a')"),
    ("coalesce 3-arg", "print c = coalesce(long(null), long(null), 7)"),
    ("array_index_of", "events | take 1 | extend a = pack_array(5, 6, 7) | extend i = array_index_of(a, 6)"),
    ("array_slice neg", "events | take 1 | extend a = pack_array(1, 2, 3, 4) | extend s = array_slice(a, 1, 2)"),
    ("bag to cols via bag_unpack", "events | take 5 | extend b = pack('k1', event_id) | evaluate bag_unpack(b) | count"),
    # mixed-type zip is a documented out-of-subset edge; same-type works
    ("zip", "events | take 1 | extend z = zip(pack_array(1, 2), pack_array(3, 4))"),
    ("repeat array", "events | take 1 | extend r = repeat(7, 3) | extend n = array_length(r)"),
    ("treepath-ish multilevel", "events | take 1 | extend j = parse_json('{\"a\": [{\"b\": 5}]}') | extend v = toint(j.a[0].b)"),
    ("dynamic null handling", "events | take 1 | extend j = parse_json('null') | extend b = isnull(tostring(j))"),
]


@pytest.fixture(scope="module", autouse=True)
def _events(spark, sf_smoke):
    load(spark, sf_smoke, "events").createOrReplaceTempView("events")


@pytest.mark.parametrize(
    "name,q", PROBES, ids=[n for n, _ in PROBES]
)
def test_idiom_probe(spark, name, q):
    assert kql(spark, q).collect() is not None
