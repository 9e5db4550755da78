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
from api_to_parquet_spark.queries.kql import kql, kql_to_sql

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
    # battery 4 (round-8): aggregates / windows / serialized-row ops
    ("arg_max two extra", "events | summarize arg_max(value, event_id, ts, event_type) by user_id % 3"),
    ("make_list ordered input", "events | sort by event_id asc | summarize l = make_list(event_id, 5) by event_type | take 2"),
    ("make_set_if", "events | summarize s = make_set_if(event_type, value > 50)"),
    ("sumif zero matches", "events | summarize s = sumif(value, value > 1e9)"),
    ("avgif", "events | summarize a = avgif(value, event_type == 'view')"),
    ("minif/maxif", "events | summarize mn = minif(value, value > 10), mx = maxif(ts, event_type == 'click')"),
    ("stdev/variance", "events | summarize sd = stdev(value), vr = variance(value), sdp = stdevp(value)"),
    ("percentile on int", "events | summarize p = percentile(event_id, 50)"),
    ("percentiles assign", "events | summarize (p25, p75) = percentiles(value, 25, 75)"),
    ("binary_all", "events | summarize o = binary_all_or(event_id), a = binary_all_and(event_id), x = binary_all_xor(event_id)"),
    ("hll roundtrip", "events | summarize h = hll(user_id) | project d = dcount_hll(h)"),
    ("tdigest merge", "events | summarize t = tdigest(value) by event_type | summarize m = merge_tdigest(t) | project p = percentile_tdigest(m, 50)"),
    ("countif multiple", "events | summarize a = countif(value > 10), b = countif(value <= 10), t = count()"),
    ("dcountif", "events | summarize d = dcountif(user_id, event_type == 'view')"),
    ("take_anyif", "events | summarize v = take_anyif(event_type, value > 90)"),
    ("row_number after serialize", "events | sort by event_id asc | serialize | extend rn = row_number() | take 3"),
    ("next with default", "events | sort by event_id asc | extend nx = next(value, 1, -1.0) | take 3"),
    ("row_cumsum restart", "events | sort by event_id asc | extend rc = row_cumsum(value, event_id % 100 == 0) | take 3"),
    ("rank via row_rank_dense", "events | sort by event_type asc | extend r = row_rank_dense(event_type) | take 3"),
    ("window top-nested depth3", "events | top-nested 2 of event_type by count(), top-nested 1 of user_id % 3 by sum(value), top-nested 1 of event_id % 2 by max(value)"),
    ("partition summarize", "events | partition by event_type (summarize c = count() by user_id % 2)"),
    ("summarize over empty", "events | where value > 1e9 | summarize c = count(), s = sum(value)"),
    ("count distinct exact", "events | summarize c = count_distinct(event_type)"),
    ("percentilew edge", "events | summarize p = percentilew(event_id, 1, 100)"),
    ("make_bag", "events | take 10 | extend b = pack(event_type, value) | summarize m = make_bag(b)"),
    ("arg_min on string col", "events | summarize arg_min(event_type, event_id)"),
    ("top asc nulls", "events | extend v = iff(value > 50, value, real(null)) | top 3 by v asc nulls first"),
    ("sort nulls last", "events | extend v = iff(value > 50, value, real(null)) | sort by v desc nulls last | take 3"),
    ("bin_at alignment", "events | summarize c = count() by b = bin_at(ts, 1d, datetime(2024-01-02 06:00:00)) | take 3"),
    ("anomaly detect chain", "events | make-series m = avg(value) default=0.0 on ts from datetime(2024-01-01) to datetime(2024-01-15) step 1d | extend (f, s2, t2, r2) = series_decompose(m, 7) | extend (ad, sc, bl) = series_decompose_anomalies(m, 7)"),
    # battery 5 (round-8): parse / format / union / join edges
    ("parse typed", 'events | take 3 | extend s = strcat("id=", tostring(event_id), ";v=", tostring(value)) | parse s with "id=" pid:long ";v=" pv:double'),
    ("parse star prefix", 'events | take 3 | extend s = strcat("xx id=", tostring(event_id)) | parse s with * "id=" pid:long'),
    ("parse-where mismatch drop", 'events | take 5 | extend s = iff(event_id % 2 == 0, strcat("k=", tostring(event_id)), "nope") | parse-where s with "k=" k:long | count'),
    ("format_datetime single tokens", "print a = format_datetime(datetime(2024-03-05 07:08:09.1234), 'y-M-d H:m:s'), b = format_datetime(datetime(2024-03-05), 'dd/MM/yy')"),
    ("format_timespan tokens", "print t = format_timespan(1d + 2h + 3m + 4s, 'd.hh:mm:ss')"),
    ("union kind=outer", "union kind=outer (events | project a = event_id), (events | project b = value) | count"),
    ("union kind=inner", "union kind=inner (events | project event_id, value), (events | project event_id, value, event_type) | take 2"),
    ("union isfuzzy", "union isfuzzy=true events, missing_table_zz | count"),
    ("join rightouter", "events | take 10 | join kind=rightouter (events | take 20 | project user_id, rv = value) on user_id | count"),
    ("join fullouter", "events | take 10 | join kind=fullouter (events | take 20 | project user_id, rv = value) on user_id | count"),
    ("join leftsemi", "events | join kind=leftsemi (events | where value > 90 | project user_id) on user_id | count"),
    ("cross join via kind=cross?", "events | take 3 | extend k = 1 | join kind=inner (events | take 4 | extend k = 1 | project k, r = event_id) on k | count"),
    ("getschema after extend", "events | extend z = 1 | getschema | where ColumnName == 'z'"),
    ("facet", "events | facet by event_type"),
    ("invoke after pipe", "let cap = (source:(*)) { source | take 3 }; events | where value > 10 | invoke cap() | count"),
    ("narrow", "events | take 2 | project event_id, value | sort by event_id asc | evaluate narrow() | count"),
    ("serialize then extend rn", "events | sort by event_id asc | serialize | extend rn = row_number() | take 3"),
    ("sort multiple keys mixed", "events | sort by event_type asc, value desc | take 3"),
    ("print bool expr", "print b = 1 < 2, c = 'a' == 'a'"),
    ("datetime arithmetic days", "print d = datetime(2024-01-10) - 3d, e = datetime(2024-01-10) + 12h"),
    ("totimespan arithmetic", "print t = totimespan('1.02:00:00') + 30m"),
    ("summarize by two bins", "events | summarize c = count() by bin(ts, 1d), bin(value, 25.0) | take 3"),
    ("extend with comment-like text", "events | where event_type != 'a // b' | count"),
    ("range then join", "range x from 0 to 4 step 1 | join kind=inner (events | extend x = event_id % 5 | summarize c = count() by x) on x | project x, c"),
    # battery 6 (round-9): fresh real-world idioms
    ("top-nested with others", 'events | top-nested 2 of event_type with others = "Other" by count()'),
    ("parse kind=relaxed", 'events | take 3 | extend s = strcat("id=", tostring(event_id)) | parse kind=relaxed s with "id=" pid:long'),
    ("parse_csv index", "print f = tostring(parse_csv('a,b,c')[1])"),
    ("ipv4_is_match", "print m = ipv4_is_match('10.0.0.1', '10.0.0.0/24')"),
    ("abs of timespan", "print a = abs(datetime(2024-01-01) - datetime(2024-01-03)) > 1d"),
    ("iff timespan branches", "events | extend g = iff(value > 50, 1h, 30m) | where g > 45m | count"),
    ("not-tilde operator", 'events | where event_type !~ "VIEW" | count'),
    ("monthofyear", "print m = monthofyear(datetime(2024-02-03))"),
    ("join kind=anti alias", "events | join kind=anti (events | where value > 50 | project user_id) on user_id | count"),
    ("pivot count agg", "events | project user_id, event_type | evaluate pivot(event_type, count())"),
    ("tabular let in leading union", "let t1 = events | take 5; union t1, t1 | count"),
    ("parse_json array root index", "print v = toint(parse_json('[10, 20, 30]')[2])"),
    ("sort by expression", "events | sort by strlen(event_type) asc, event_id asc | take 3"),
    ("top by expression", "events | top 3 by value * 2 desc"),
    ("tostring of bag", "print s = tostring(pack('a', 1))"),
    ("make_list of bags", "events | take 5 | extend b = pack('t', event_type) | summarize l = make_list(b) | project n = array_length(l)"),
    ("dynamic literal index", "print v = toint(dynamic([10, 20, 30])[1])"),
    ("ago window classic", "events | where ts > ago(3650d) and ts < now() | count"),
    ("let default param", "let f = (x: long, y: long = 10) { x + y }; print r = f(5)"),
    ("todatetime iso", "print d = todatetime('2024-01-02 03:04:05')"),
    ("project bracket reserved", "events | project ['count'] = value | take 2"),
    ("join two keys", "events | take 50 | join kind=inner (events | project user_id, event_type, r = value) on user_id, event_type | count"),
    ("union withsource filter", 'union withsource=T events, (events | take 5) | where T == "events" | count'),
    ("mv-expand json to typeof", "events | take 1 | extend j = '[1, 2]' | mv-expand j to typeof(long) | summarize s = sum(j)"),
    ("coalesce string col", "events | extend t = coalesce(event_type, 'x') | count"),
    ("dynamic numeric compare", "events | take 20 | extend d = todynamic(props) | where tolong(d.k) >= 0 | count"),
    ("countof overlap", "print c = countof('aaaa', 'aa')"),
    ("summarize max of strcat", "events | summarize m = max(strcat(event_type, tostring(user_id)))"),
    ("extend then where alias", "events | extend v2 = value * 2 | where v2 > 100 | summarize c = count()"),
    ("exp/log roundtrip col", "events | extend e = exp(log(value + 1.0)) | where abs(e - value - 1.0) < 1e6 | count"),
    # battery 7 (round-9): windows, options, and long-tail idioms
    ("row_number start", "events | sort by event_id asc | extend rn = row_number(10) | take 3"),
    ("row_number restart", "events | sort by event_id asc | extend rn = row_number(1, event_id % 100 == 0) | take 3"),
    ("parse-kv single-quoted delims", "events | take 2 | extend s = 'a=1 b=2' | parse-kv s as (a: long, b: long) with (pair_delimiter=' ', kv_delimiter='=')"),
    ("mv-expand bagexpansion", "events | take 1 | extend d = pack_array(1, 2) | mv-expand bagexpansion=array d"),
    ("project-rename multiple", "events | project-rename eid = event_id, et = event_type | take 1"),
    ("chained tops", "events | top 10 by value desc | top 3 by event_id asc"),
    ("isnotempty filter", "events | where isnotempty(event_type) | count"),
    ("make_list of pack_all", "events | take 3 | summarize l = make_list(pack_all()) | project n = array_length(l)"),
    ("take 0", "events | take 0 | count"),
    ("bin on double", "events | summarize c = count() by b = bin(value, 12.5) | take 3"),
    ("union datatable + table", 'union (datatable (event_id: long) [1, 2]), (events | project event_id) | count'),
    ("let startofday now", "let today = startofday(now()); events | where ts < today | count"),
    ("unicode literal", "events | where event_type != '✓ done' | count"),
    ("float equality identity", "events | extend ok = value * 1.0 == value | summarize countif(ok)"),
    ("arg_max star by bin", "events | summarize arg_max(value, *) by bin(ts, 1d) | take 2"),
    ("dynamic project then expand", "events | take 1 | project x = dynamic([1, 2, 3]) | mv-expand x"),
    ("count_distinctif", "events | summarize c = count_distinctif(user_id, value > 50)"),
    ("startofyear endofyear", "print a = startofyear(datetime(2024-05-05)), b = endofyear(datetime(2024-05-05))"),
    ("array_reverse sum", "events | take 1 | extend a = array_reverse(pack_array(1, 2, 3)) | extend s = array_sum(a)"),
    ("min_of three args", "print m = min_of(3, 1, 2), x = max_of(3, 1, 2)"),
    ("case returning bool", 'events | extend b = case(value > 50, true, false) | summarize countif(b)'),
    ("negative datatable values", "datatable (x: long, y: real) [-1, -2.5, 3, 4.5] | summarize s = sum(x), t = sum(y)"),
    ("ago vs now offset", "print ok = ago(1h) == now(-1h) or true"),
    ("interval add column compare", "events | extend t2 = ts + 1h | where t2 > ts | count"),
    ("getschema project", "events | getschema | project ColumnName | count"),
    ("todecimal arithmetic", "print d = todecimal('1.5') + todecimal('2.5')"),
    ("iff with timespan output compare", "events | extend g = iff(value > 50, 1h, 30m) | where g > 45m | count"),
    ("nested parens predicate", "events | where ((value > 10 and value < 90) or (event_type == 'view')) | count"),
    ("summarize then mv-expand list", "events | summarize l = make_list(event_id, 3) by event_type | mv-expand l | count"),
    ("lookup basic", "events | take 20 | lookup (datatable (event_type: string, w: long) ['view', 1, 'click', 2]) on event_type | summarize s = sum(w)"),
    # battery 8 (round-10): UA-bot lines, forward-scan funnels,
    # Kusto-doc parse edge forms, union withsource + facet combos,
    # timespan-column arithmetic. First run caught five gaps: the
    # bracket-mangler ate datatable value lists containing brackets,
    # parse_json(<complex expr>).path, bare untyped parse captures,
    # tolong hex literals, bin over an interval column.
    ("ua bot family filter", "events | take 5 | extend ua = 'Mozilla/5.0 (compatible; Googlebot/2.1)' | extend b = parse_user_agent(ua, 'browser') | where tostring(parse_json(b).Browser.Family) == 'Googlebot' | count"),
    ("ua curl spider device", "print d = parse_user_agent('curl/7.88.1', 'device') | extend f = tostring(parse_json(d).Device.Family)"),
    ("ua evergreen googlebot os", "print o = parse_user_agent('Mozilla/5.0 (Linux; Android 10) Googlebot/2.1', 'os')"),
    ("ua bot ratio summarize", "events | take 200 | extend ua = iff(event_id % 3 == 0, 'Wget/1.21.3', 'Mozilla/5.0 Firefox/120.0') | extend fam = tostring(parse_json(parse_user_agent(ua, 'browser')).Browser.Family) | summarize c = count() by fam"),
    ("scan forward funnel", "events | sort by ts asc, event_id asc | scan by user_id with (step s1: event_type == 'view' and (isnull(s2.ts) or ts > s2.ts); step s2: event_type == 'purchase';) | count"),
    ("scan forward assignment", "events | sort by ts asc, event_id asc | scan declare (pv: real = 0.0) with (step s1: true => pv = iff(isnull(s2.value), 0.0, s2.value); step s2: value > 50;) | take 5"),
    ("scan forward match ids", "events | sort by ts asc, event_id asc | scan with_match_id=m with (step s1: isnull(s2.value) or value != s2.value; step s2: true;) | summarize d = dcount(m)"),
    ("scan three-step forward", "events | sort by ts asc, event_id asc | scan by user_id with (step s1: event_type == 'view' and (isnull(s3.value) or value > s3.value); step s2: event_type == 'click'; step s3: event_type == 'purchase';) | count"),
    ("timespan col div literal", "events | summarize mn = min(ts), mx = max(ts) by user_id | extend dur = mx - mn | extend days = dur / 1d | take 3"),
    ("timespan col div col", "events | summarize mn = min(ts), mx = max(ts) by user_id | extend dur = mx - mn, half = (mx - mn) / 2 | extend r = dur / half | take 3"),
    ("timespan col div in agg", "events | summarize mn = min(ts), mx = max(ts) by user_id | extend dur = mx - mn | where dur > 1d | summarize a = avg(dur / 1d)"),
    ("timespan col multiply", "events | extend d2 = (ts - datetime(2024-01-01)) * 2 | where d2 > 1d | count"),
    ("timespan col sort", "events | summarize mn = min(ts), mx = max(ts) by user_id | extend dur = mx - mn | sort by dur desc | take 3"),
    ("timespan col format", "events | summarize mn = min(ts), mx = max(ts) by user_id | extend s = format_timespan(mx - mn, 'd.hh:mm:ss') | take 3"),
    ("timespan between cols", "events | extend d = ts - datetime(2024-01-01) | where d between (1d .. 10d) | count"),
    ("bin on timespan col", "events | extend d = ts - datetime(2024-01-01) | summarize c = count() by bin(d, 1d) | take 3"),
    ("totimespan col plus ts", "events | extend w = totimespan(strcat(tostring(event_id % 3), 'h')) | extend t2 = ts + w | where t2 >= ts | count"),
    ("union withsource facet", "union withsource=src (events | where value > 50), (events | where value <= 50) | facet by src"),
    ("union withsource group", "union withsource=src events | summarize c = count() by src"),
    ("union withsource sort take", "union withsource=s (events | take 5), (events | take 5) | sort by s asc, event_id asc | take 3"),
    ("union withsource facet band", "union withsource=src (events | where value > 50), (events | where value <= 50) | extend band = iff(event_id % 2 == 0, 'even', 'odd') | facet by src, band"),
    ("parse doc sections", "datatable(s: string) ['section1 [par1][par2]'] | parse s with 'section' sec: long ' [' par1 '][' par2 ']'"),
    ("parse leading star", "events | take 5 | extend s = strcat('prefix junk id=', tostring(event_id)) | parse s with * 'id=' pid: long | project pid"),
    ("parse star mid", "events | take 5 | extend s = strcat('a=', tostring(event_id), ' junk b=', tostring(event_id * 2)) | parse s with 'a=' a: long * 'b=' b: long | project a, b"),
    ("parse relaxed star", "events | take 5 | extend s = strcat('x junk v=', tostring(event_id)) | parse kind=relaxed s with * 'v=' v: long | project v"),
    ("parse regex flags", "events | take 3 | extend s = strcat('V', tostring(event_id)) | parse kind=regex flags=i s with 'v' n: long | project n"),
    ("tolong hex literal", "print h = tolong('0x1A')"),
    ("format_datetime doc tokens", "print s = format_datetime(datetime(2015-12-14 02:03:04.12345), 'y-M-d h:m:s.fff')"),
    ("facet multi then take", "events | extend band = iff(value > 50, 'hi', 'lo') | facet by event_type, band | take 5"),
    # battery 9 (round-10): string/datetime doc forms, dynamic/array
    # edges, statement combos. First run caught five gaps: countof
    # kind=regex 3-arg, array_slice negative (from-end) indices,
    # single-quoted leading-search terms, invoke over a fn-let with a
    # DECLARED tabular-param schema, array_index_of silently dropping
    # its start argument.
    ("trim regex arg", "print t = trim('-', '--hello--')"),
    ("trim_start regex", "print t = trim_start(@'[0-9]+', '123abc')"),
    ("indexof start arg", "print i = indexof('abcabc', 'b', 2)"),
    ("countof kind regex", "print c = countof('a1b2c3', @'\\d', 'regex')"),
    ("week day month parts", "print w = week_of_year(datetime(2024-03-05)), d = dayofyear(datetime(2024-03-05)), m = monthofyear(datetime(2024-03-05))"),
    ("getyear getmonth", "print y = getyear(datetime(2024-03-05)), m = getmonth(datetime(2024-03-05))"),
    ("startofweek offset", "print s = startofweek(datetime(2024-03-05), 1)"),
    ("bin negative floor", "print b = bin(-7, 3)"),
    ("datetime month add", "print d = datetime_add('month', 2, datetime(2024-01-31))"),
    ("endofmonth leap", "print e = endofmonth(datetime(2024-02-10))"),
    ("array_index_of start", "print i = array_index_of(dynamic([1,2,3,2]), 2, 2)"),
    ("array_concat three", "print a = array_length(array_concat(dynamic([1,2]), dynamic([3]), dynamic([4,5])))"),
    ("bag_remove_keys", "print b = bag_remove_keys(dynamic({\"a\":1,\"b\":2}), dynamic([\"a\"]))"),
    ("array_slice negative", "print s = array_slice(dynamic([1,2,3,4,5]), -2, -1)"),
    ("mv-expand literal array", "print a = dynamic([1, 2, 3]) | mv-expand a | count"),
    ("range timespan step", "range t from datetime(2024-01-01) to datetime(2024-01-02) step 6h | count"),
    ("print untyped getschema", "print 1, 'a', now() | getschema | count"),
    ("sample-distinct of", "events | sample-distinct 3 of event_type"),
    ("top-hitters of by", "events | top-hitters 3 of user_id by value"),
    ("as operator mid-pipe", "events | where value > 10 | as T | summarize c = count()"),
    ("search kind before in", "search kind=case_sensitive in (events) 'view' | count"),
    ("find withsource project", "find withsource=src in (events) where value > 99 project event_id"),
    ("serialize prev default", "events | sort by event_id asc | serialize | extend p = prev(value, 1, 0.0) | take 3"),
    ("invoke tabular fn", "let addv = (T: (value: real)) { T | summarize s = sum(value) }; events | invoke addv()"),
    ("dcount accuracy arg", "events | summarize d = dcount(user_id, 3)"),
    ("summarize hint shufflekey", "events | summarize hint.shufflekey=user_id c = count() by user_id | take 3"),
    ("percentile scalar compare", "events | summarize p = percentile(value, 50) | extend ok = p >= 0.0"),
    ("iff dynamic branches", "events | take 5 | extend d = iff(value > 50, dynamic([1]), dynamic([2])) | mv-expand d"),
    ("toscalar in let", "let m = toscalar(events | summarize max(value)); events | where value == m | count"),
    ("extend name rechain", "events | extend v2 = value * 2 | extend v2 = v2 + 1 | summarize s = round(sum(v2), 4)"),
    # battery 10 (round-10): join/lookup parameter forms, wildcards,
    # datetime/string doc forms, mv-apply edges. First run caught
    # five gaps: join params were order-FIXED (hint before kind
    # rejected), mv-apply lacked with_itemindex=, typed extract's
    # source operand couldn't hold a call, extract_all rejected
    # multi-group regexes, datetime_diff lacked week/quarter units.
    ("join fullouter where after", "events | take 50 | join kind=fullouter (events | take 80 | project user_id, v2 = value) on user_id | where isnotempty(user_id) | count"),
    ("join rightouter", "events | take 20 | join kind=rightouter (events | take 30 | project user_id, v2 = value) on user_id | count"),
    ("lookup kind=leftouter", "events | take 30 | lookup kind=leftouter (datatable(event_type: string, w: long) ['view', 1]) on event_type | count"),
    ("join hint broadcast with kind", "events | join hint.strategy=broadcast kind=inner (datatable(event_type: string, w: long) ['view', 1]) on event_type | count"),
    ("summarize max datetime by bin", "events | summarize m = max(ts) by bin(ts, 1d) | count"),
    ("summarize agg over iff", "events | summarize s = sum(iff(value > 50, value, 0.0)) by event_type"),
    ("arg_min string key", "events | summarize arg_min(event_type, value) by user_id | take 3"),
    ("take_any star by two keys", "events | summarize take_any(*) by event_type, user_id | count"),
    ("hll by then merge", "events | summarize h = hll(user_id) by event_type | summarize d = dcount_hll(hll_merge(h))"),
    ("mv-apply with_itemindex", "events | take 3 | extend a = pack_array(10, 20) | mv-apply with_itemindex=i e = a on (summarize s = sum(e), mi = max(i))"),
    ("bag_pack expr keys", "events | take 3 | extend b = bag_pack(strcat('k', tostring(event_id % 2)), value) | project b"),
    ("array_sort_asc strings", "print a = array_sort_asc(dynamic(['b', 'a', 'c']))"),
    ("set_union three", "print u = array_length(set_union(dynamic([1,2]), dynamic([2,3]), dynamic([4])))"),
    ("extract typed long", "events | take 5 | extend n = extract('([0-9]+)', 1, strcat('x', tostring(event_id)), typeof(long)) | project n"),
    ("extract_all multi groups", "print x = extract_all(@'(\\w)(\\d)', 'a1 b2')"),
    ("string_size unicode", "print b = string_size('héllo')"),
    ("reverse string", "print r = reverse('abc')"),
    ("has_cs predicate", "events | where event_type has_cs 'view' | count"),
    ("matches regex anchors", "events | where event_type matches regex '^v.*w$' | count"),
    ("todatetime iso z", "print d = todatetime('2024-01-02T03:04:05Z')"),
    ("format_datetime ampm", "print s = format_datetime(datetime(2024-01-02 15:04:05), 'hh:mm tt')"),
    ("datetime_diff week quarter", "print w = datetime_diff('week', datetime(2024-02-01), datetime(2024-01-01)), q = datetime_diff('quarter', datetime(2024-07-01), datetime(2024-01-01))"),
    ("ago fractional", "events | where ts > ago(10000.5h) | count"),
    ("project-keep wildcard", "events | project-keep event* | take 1"),
    ("project-away wildcard", "events | project-away p*, u* | take 1"),
    ("top nulls first", "events | extend v = iff(event_id % 10 == 0, real(null), value) | top 3 by v desc nulls first | project event_id"),
    ("sort by expression", "events | sort by strlen(event_type) desc, event_id asc | take 3"),
    ("distinct two cols then count", "events | distinct event_type, user_id | count"),
    ("union kind=inner", "union kind=inner (events | project event_id, value), (events | project event_id, event_type) | count"),
    ("count then project Count", "events | count | project Count"),
    # battery 11 (round-10): series math, window restarts, null/NaN
    # edges, multi-table forms. First run caught three findings:
    # series_pearson_correlation unimplemented, format_ipv4 rejected
    # dotted-quad STRING input, and ADX-real division by zero is a
    # documented LOUD divergence (ANSI DIVIDE_BY_ZERO vs inf/NaN).
    ("series_stats multi-assign", "events | take 10 | summarize x = make_list(value) | extend (mn, mnid, mx, mxid, av, va, sd) = series_stats(x) | project mn, mx, av"),
    ("series_pearson", "events | summarize a = make_list(todouble(event_id % 7)), b = make_list(todouble(event_id % 5)) | extend r = series_pearson_correlation(a, b)"),
    ("make-series expand summarize", "events | make-series c = count() on ts from datetime(2024-01-01) to datetime(2024-01-15) step 1d by event_type | mv-expand c | summarize s = sum(todouble(c)) by event_type"),
    ("series_outliers scores", "events | take 50 | summarize x = make_list(value) | extend o = series_outliers(x) | project n = array_length(o)"),
    ("row_cumsum restart", "events | sort by event_id asc | extend cs = row_cumsum(value, event_id % 100 == 0) | take 5"),
    ("prev two args", "events | sort by event_id asc | extend d = value - prev(value, 2) | take 5"),
    ("iff datetime branches", "events | extend t = iff(value > 50, startofday(ts), ts) | count"),
    ("case with strcat exprs", "events | extend l = case(value > 75, strcat('hi-', event_type), value > 25, 'mid', strcat('lo-', event_type)) | summarize c = count() by l | take 5"),
    ("has_any three", "events | where event_type has_any ('view', 'click', 'zzz') | count"),
    ("has_all two", "events | where props has_all ('k') | count"),
    ("in~ literals", "events | where event_type in~ ('VIEW', 'Click') | count"),
    ("not contains_cs", "events | where event_type !contains_cs 'VIEW' | count"),
    ("parse_version compare", "print ok = parse_version('1.2.3') < parse_version('1.10.0')"),
    ("format_ipv4 mask", "print i = format_ipv4('192.168.1.255', 24)"),
    ("min_of ignores null", "print m = min_of(long(null), 5, 3)"),
    ("coalesce datetimes", "events | extend t = coalesce(datetime(null), ts) | count"),
    ("isnan real", "print a = isnan(sqrt(-1.0)), b = isnan(1.0)"),
    ("zip then expand", "print z = zip(dynamic([1, 2]), dynamic([3, 4])) | mv-expand z | count"),
    ("repeat array", "print r = array_length(repeat(7, 4))"),
    ("union three datatables nullfill", "union (datatable(a: long) [1]), (datatable(b: string) ['x']), (datatable(a: long, b: string) [2, 'y']) | count"),
    ("mv-expand two arrays zip", "print a = dynamic([1, 2]), b = dynamic(['x', 'y']) | mv-expand a, b | count"),
    ("top-nested two levels project", "events | top-nested 2 of event_type by s = sum(value), top-nested 2 of user_id by m = max(value) | project event_type, user_id, m | take 5"),
    ("summarize percentile argmax combo", "events | summarize p = percentile(value, 90), arg_max(value, event_id) by event_type | take 3"),
    ("distinct !in dynamic", "events | where event_type !in ('view', 'click') | distinct event_type"),
    ("toscalar in case", "events | extend big = case(value > toscalar(events | summarize avg(value)), 'above', 'below') | summarize c = count() by big"),
    ("strcat_delim nulls", "print s = strcat_delim('-', 'a', tostring(long(null)), 'b')"),
    ("binary ops chain", "events | extend b = binary_or(binary_and(event_id, 255), binary_shift_left(1, 8)) | take 2"),
    ("exp log roundtrip", "events | extend ok = abs(exp(log(value + 1.0)) - (value + 1.0)) < 1e-9 | summarize countif(ok)"),
    ("bin_at datetime anchor", "events | summarize c = count() by b = bin_at(ts, 7d, datetime(2024-01-03)) | take 3"),
    ("range then join events", "range d from datetime(2024-01-01) to datetime(2024-01-10) step 1d | extend k = 1 | join kind=inner (events | extend k = 1 | take 10) on k | count"),
    # --- battery 12 (round-11): Azure Monitor / Sentinel dashboard
    # shapes, database() qualifiers, dynamic-list parse_user_agent,
    # guarded rate calculations, extract_all captureGroups lists.
    # Found and fixed: mv-expand expression operands + typed
    # multi-column clauses, between (start .. <let/expr duration>),
    # extract_all named groups / captureGroups selection.
    ("b12 ago-bin dashboard", 'events | where ts > ago(100000d) | summarize n = count() by bin(ts, 5m) | top 3 by n'),
    ("b12 arg_max latest per entity", 'events | summarize arg_max(ts, *) by user_id | count'),
    ("b12 has_any triage", 'events | where event_type has_any ("view", "click") | take 10'),
    ("b12 guarded rate pct", 'events | summarize errors = countif(value > 90), total = count() by event_type | extend rate = todouble(errors) / todouble(total) * 100 | where rate >= 0 | sort by rate desc'),
    ("b12 db qualifier take", 'database("default").events | take 5'),
    ("b12 ua dynamic list", 'events | take 2 | extend ua = "Mozilla/5.0 (Windows NT 10.0) Chrome/118.0.0.0 Safari/537.36" | extend b = parse_user_agent(ua, dynamic(["browser", "os"])) | project b'),
    ("b12 make_set maxsize expand", 'events | summarize s = make_set(event_type, 5) by user_id | mv-expand s | count'),
    ("b12 extract_all named groups", 'print x = extract_all(@"(?P<w>[a-z]+)(?P<d>[0-9]+)", dynamic(["w", "d"]), "ab12 cd34")'),
    ("b12 project-away wildcard", 'events | project-away props, event_* | take 2'),
    ("b12 multi percentile", 'events | summarize p50 = percentile(value, 50), p95 = percentile(value, 95) by event_type'),
    ("b12 ipv4_is_in_range", 'print b = ipv4_is_in_range("10.1.2.3", "10.0.0.0/8")'),
    ("b12 url host extract", 'print h = extract("https?://([^/]+)/", 1, "https://portal.example.com/dash")'),
    ("b12 dcount accuracy arg", 'events | summarize d = dcount(user_id, 2) by event_type'),
    ("b12 order by todatetime", 'events | order by todatetime(ts) desc | take 3'),
    ("b12 format_datetime day", 'events | take 2 | extend day = format_datetime(ts, "yyyy-MM-dd") | project day'),
    ("b12 between let-duration", 'let w = 365d; events | where ts between (datetime(2024-01-01) .. w) | count'),
    ("b12 pct of total toscalar", 'events | summarize Total = count() by Type = event_type | extend Pct = round(100.0 * Total / toscalar(events | count), 2) | sort by Pct desc'),
    ("b12 union isfuzzy missing", 'union isfuzzy=true events, missing_table_zz | count'),
    ("b12 mv-expand props bag expr", 'events | take 3 | mv-expand todynamic(props) | count'),
    ("b12 case severity rollup", 'events | extend severity = case(value > 90, "high", value > 50, "medium", "low") | summarize n = count() by severity'),
    ("b12 in~ list", 'events | where event_type in~ ("VIEW", "Click") | count'),
    ("b12 hll two-level rollup", 'events | summarize h = hll(user_id) by event_type | summarize d = dcount_hll(hll_merge(h))'),
    ("b12 top-nested two level", 'events | top-nested 2 of event_type by count(), top-nested 1 of user_id by sum(value)'),
    ("b12 split negative index", 'events | take 2 | extend path = strcat("src/2024/01/02/03/", event_type, ".parquet") | extend tokens = split(path, "/") | extend fname = tostring(tokens[-1]) | project fname'),
    ("b12 parse path segments", 'events | take 2 | extend path = strcat("src/2024/01/02/03/", event_type, ".parquet") | parse path with source "/" y: long "/" m: long "/" d: long "/" h: long "/" fname | project source, y, fname'),
    ("b12 format_timespan span", 'events | summarize first = min(ts), last = max(ts) | extend span = format_timespan(last - first, "d.hh:mm:ss") | project span'),
    ("b12 invoke rate fn", 'let addrate = (T: (errors: long, total: long)) { T | extend rate = todouble(errors) * 1.0 / todouble(total) }; datatable(errors: long, total: long)[5, 10, 3, 0] | invoke addrate()'),
    ("b12 serialize prev delta", 'events | summarize v = round(avg(value), 2) by bin(ts, 1d) | sort by ts asc | serialize | extend delta = round(v - prev(v, 1, 0.0), 2) | take 5'),
    ("b12 summarize count alias", 'events | summarize Count = count() | project Count'),
    ("b12 ip rollup top", 'events | extend ip = strcat(tostring(event_id % 256), ".0.0.1") | summarize n = count() by ip | top 3 by n'),
    ("b12 make-series typed expand", 'events | make-series n = count() default = 0 on ts from datetime(2024-01-01) to datetime(2024-01-08) step 1d by event_type | mv-expand ts to typeof(datetime), n to typeof(long) | count'),
    ("b12 startofday count chart", 'events | summarize n = count() by day = startofday(ts) | sort by day asc | take 5'),
    # --- battery 13 (round-11, second sweep): aggregation/scalar arg
    # forms, dynamic construction aliases, subpipe stages. Found and
    # fixed: pack_dictionary alias, replace_strings fold,
    # datetime_add week/quarter, mv-apply EXPRESSION sources, and
    # mv-apply take/top subpipe stages; plus the subscript-rewrite
    # lookbehind (parse_json(...).a.b[1] chains were corrupted).
    ("b13 bin_at weekly anchor", 'events | summarize n = count() by bin_at(ts, 7d, datetime(2024-01-06)) | top 3 by n'),
    ("b13 trim_start regex", 'print a = trim_start("re", "rerere-x")'),
    ("b13 substring negative start", 'print s = substring("hello", -2), s2 = substring("hello", 1, 99)'),
    ("b13 strcat_array", 'print x = strcat_array(dynamic(["a", "b"]), "|")'),
    ("b13 minif/maxif", 'events | summarize mn = minif(value, event_type == "view"), mx = maxif(value, event_type == "view")'),
    ("b13 float bin", 'print b = bin(4.7, 0.5)'),
    ("b13 top nulls last", 'events | top 5 by value desc nulls last | project value'),
    ("b13 scalar range", 'print r = range(1, 10, 2)'),
    ("b13 pack_dictionary", 'print d = pack_dictionary("k", 1, "j", 2)'),
    ("b13 replace_strings", 'print s = replace_strings("abc", dynamic(["a", "b"]), dynamic(["x", "y"]))'),
    ("b13 percentiles_array index", 'events | summarize p = percentiles_array(value, 25, 50, 75) by event_type | project event_type, p25 = todouble(p[0])'),
    ("b13 format_datetime fff", 'print t = format_datetime(datetime(2024-01-02 03:04:05.1234567), "yyyy-MM-dd HH:mm:ss.fff")'),
    ("b13 sentinel daily timechart", 'events | where ts >= startofday(datetime(2024-01-03)) | summarize n = count() by bin(ts, 1d), event_type | order by ts asc | render timechart'),
    ("b13 iif isempty", 'events | extend et = iif(isempty(event_type), "unknown", event_type) | distinct et'),
    ("b13 coalesce typed null", 'print v = coalesce(long(null), 5)'),
    ("b13 make_list of bags maxsize", 'events | summarize l = make_list(pack("t", event_type, "v", value), 3) by user_id | take 2'),
    ("b13 parse_json deep chain", 'print j = parse_json(\'{"a": {"b": [1, 2]}}\').a.b[1]'),
    ("b13 todynamic index dot chain", 'print x = todynamic(\'[{"k": 1}]\')[0].k'),
    ("b13 order multi dir", 'events | order by event_type asc, value desc | take 4'),
    ("b13 totimespan plus literal", 'print t = totimespan("01:02:03") + 1h'),
    ("b13 datetime_add week", 'print d = datetime_add("week", 2, datetime(2024-01-01))'),
    ("b13 as mid-pipe", 'events | summarize c = count() by event_type | as T2 | where c > 10'),
    ("b13 new_guid uniqueness", 'print x = new_guid() != new_guid()'),
    ("b13 base64 roundtrip", 'print b = base64_encode_tostring("hi"), s = base64_decode_tostring("aGk=")'),
    ("b13 sample-distinct", 'events | sample-distinct 3 of event_type'),
    ("b13 max_of/min_of", 'print m = max_of(1, 5, 3), n = min_of(2.5, 1.5)'),
    ("b13 getschema count", 'events | getschema | count'),
    ("b13 bag_merge 3-arg", 'print x = bag_merge(dynamic({"a": 1}), dynamic({"b": 2}), dynamic({"a": 9}))'),
    ("b13 repeat", 'print a = repeat(7, 3)'),
    ("b13 mv-apply expression top", 'events | take 2 | mv-apply e = pack_array(1, 2, 3) on (top 2 by e | summarize s = sum(e)) | project s'),
    ("b13 round negative digits", 'print r = round(123.456, -1)'),
    ("b13 exp/log", 'print x = round(exp(1.0), 6), y = round(log(exp(1.0)), 6)'),
    ("b13 countif over bin group", 'events | summarize hot = countif(value > 75) by bin(ts, 12h) | top 3 by hot'),
    ("b13 has with strcat", 'events | where strcat(event_type, "!") has "view" | count'),
    # --- battery 14 (round-11, third sweep): wildcards, legacy
    # aliases, typed-literal arithmetic, arg-form completions. Found
    # and fixed: union wildcard table patterns, any()/anyif() legacy
    # aliases, make_set_if/make_list_if maxSize, indexof
    # length/occurrence args, dayofweek-vs-day-literal comparisons,
    # long()/real() value constructors.
    ("b14 union dup operand", 'union events, events | summarize c = count()'),
    ("b14 union wildcard tables", 'union withsource=T events* | count'),
    ("b14 ci equality", 'events | where event_type =~ "VIEW" | count'),
    ("b14 arg_min", 'events | summarize arg_min(value, event_id) by event_type'),
    ("b14 bounded rand filter", 'events | extend r = rand() | where r < 2.0 | count'),
    ("b14 legacy any()", 'events | summarize any(value)'),
    ("b14 project-keep wildcard", 'events | project-keep event_* | take 2'),
    ("b14 case default only", 'print x = case(1 > 2, "a", "b")'),
    ("b14 make_set_if maxsize", 'events | summarize s = make_set_if(event_type, value > 50, 3)'),
    ("b14 array_index_of strings", 'print x = array_index_of(dynamic(["a", "b"]), "b")'),
    ("b14 number times timespan", 'events | take 3 | extend w = 2 * 1h | project w'),
    ("b14 sumif startswith", 'events | summarize x = sumif(value, event_type startswith "v")'),
    ("b14 indexof occurrence", 'print x = indexof("abcabc", "c", 1, -1, 2)'),
    ("b14 subscript in strcat", 'print s = strcat(split("a b", " ")[0], "!")'),
    ("b14 project-reorder", 'events | top 2 by event_id | project-reorder value, event_id'),
    ("b14 bag tostring", 'print x = tostring(dynamic({"b": 2, "a": 1}))'),
    ("b14 row_number after sort", 'events | summarize c = count() by event_type | sort by c | extend rank = row_number()'),
    ("b14 dayofweek timespan compare", 'events | take 5 | extend d = iff(dayofweek(ts) == 0d, "Sun", "other") | project d'),
    ("b14 where n between", 'events | summarize n = count() by user_id | where n between (2 .. 10) | count'),
    ("b14 typed literal arith", 'print x = long(1) + int(2)'),
    ("b14 serialize assignment", 'events | distinct event_type | order by event_type | serialize idx = row_number(0)'),
    ("b14 url roundtrip", 'print x = url_decode(url_encode("a b&c"))'),
    ("b14 take 0 count", 'events | take 0 | count'),
    ("b14 percentile auto name", 'events | summarize percentile(value, 50) by event_type'),
    ("b14 make_timespan 4arg", 'print a = make_timespan(1, 2, 30, 15)'),
    ("b14 limit synonym", 'events | limit 5'),
    ("b14 mv-expand on let view", 'let V = events | take 2 | extend a = pack_array(1, 2); V | mv-expand a | count'),
    ("b14 join rightouter", 'events | take 10 | join kind=rightouter (events | take 5 | project event_id, v2 = value) on event_id | count'),
    ("b14 countof_regex", 'print n = countof("a1b2c3", @"[0-9]", "regex")'),
    ("b14 extract_json typed", 'print v = extract_json("$.a", \'{"a": 7}\', typeof(long))'),
    ("b14 dcountif by", 'events | summarize d = dcountif(user_id, value > 20) by event_type | top 3 by d'),
    ("b14 next after sort", 'events | distinct event_type | sort by event_type asc | serialize | extend nx = next(event_type)'),
    ("b14 strrep", 'print s = strrep("ab", 3)'),
    ("b14 array_sum slice", 'print s = array_sum(array_slice(pack_array(1, 2, 3, 4), 1, 2))'),
    # --- battery 15 (round-11, fourth sweep): IP/network scalars, set
    # algebra, sketch aggregates, math-special functions, unit
    # conversion, negated string operators. Found and fixed:
    # parse_ipv4_mask/format_ipv4_mask, format_bytes explicit units,
    # percentilesw, erf/erfc, the convert_* family,
    # geo_point_to_geohash.
    ("b15 ipv4_is_private", "print a = ipv4_is_private('10.1.2.3'), b = ipv4_is_private('8.8.8.8')"),
    ("b15 ipv4_compare", "print c = ipv4_compare('10.0.0.1', '10.0.0.2')"),
    ("b15 parse_ipv4_mask", "print p = parse_ipv4_mask('192.168.1.77', 24)"),
    ("b15 format_ipv4_mask", "print f = format_ipv4_mask('192.168.1.77', 24)"),
    ("b15 format_bytes units", "print f = format_bytes(1024000, 2, 'MB')"),
    ("b15 set_has_element", "print x = set_has_element(dynamic([1,2,3]), 2)"),
    ("b15 jaccard_index", "print j = jaccard_index(dynamic([1,2,3]), dynamic([2,3,4]))"),
    ("b15 array_iff", "print a = array_iff(dynamic([true,false,true]), dynamic([1,2,3]), dynamic([4,5,6]))"),
    ("b15 array_split", "print a = array_split(dynamic([1,2,3,4,5]), 2)"),
    ("b15 zip same type", "print z = zip(dynamic([1,2]), dynamic([3,4]))"),
    ("b15 hash_sha256", "print h = hash_sha256('abc')"),
    ("b15 hash_md5", "print h = hash_md5('abc')"),
    ("b15 tohex", "print h = tohex(255), h2 = tohex(26, 8)"),
    ("b15 isfinite isnan isinf", "print a = isfinite(1.0), b = isnan(todouble('NaN')), c = isinf(todouble('Infinity'))"),
    ("b15 unixtime seconds", "print d = unixtime_seconds_todatetime(1704067200)"),
    ("b15 unixtime micros", "print d = unixtime_microseconds_todatetime(1704067200000000)"),
    ("b15 negated string ops", "events | where event_type !has 'view' and event_type !contains 'zz' and event_type !startswith 'q' | count"),
    ("b15 tobool", "print a = tobool('true'), b = tobool(1), c = tobool('no')"),
    ("b15 hll roundtrip", "events | summarize h = hll(user_id) by event_type | summarize m = hll_merge(h) | project d = dcount_hll(m)"),
    ("b15 tdigest roundtrip", "events | summarize t = tdigest(value) by event_type | summarize m = merge_tdigest(t) | project p = percentile_tdigest(m, 95, typeof(real))"),
    ("b15 percentilesw", "events | extend w = 2 | summarize percentilesw(value, w, 25, 75)"),
    ("b15 percentilesw assign", "events | extend w = 1 | summarize (a, b) = percentilesw(value, w, 10, 90)"),
    ("b15 erf erfc", "print a = erf(1.0), b = erfc(1.0)"),
    ("b15 convert_angle", "print d = convert_angle(1.0, 'Degree', 'Radian')"),
    ("b15 convert_temperature", "print c = convert_temperature(98.6, 'DegreeFahrenheit', 'DegreeCelsius')"),
    ("b15 convert_speed", "print s = convert_speed(100.0, 'KilometerPerHour', 'MeterPerSecond')"),
    ("b15 geo geohash", "print g = geo_point_to_geohash(-122.3, 47.6, 6)"),
    ("b15 geo distance", "print d = geo_distance_2points(-122.3, 47.6, -122.2, 47.6)"),
    ("b15 mv-expand to typeof", "events | take 1 | extend a = dynamic([1,2,3]) | mv-expand a to typeof(long) | summarize s = sum(a)"),
    ("b15 make_bag", "events | take 3 | summarize b = make_bag(pack(event_type, value))"),
    ("b15 lookup operator", "events | take 20 | lookup kind=leftouter (events | summarize n = count() by event_type) on event_type | count"),
    ("b15 prev offset default", "events | distinct event_type | sort by event_type asc | serialize | extend p = prev(event_type, 2, 'none')"),
    ("b15 evaluate pivot", "events | project event_type, value | evaluate pivot(event_type, sum(value))"),
    ("b15 top-nested", "events | top-nested 2 of event_type by count(), top-nested 2 of user_id by sum(value)"),
    ("b15 narrow after sort", "events | take 2 | project event_id, value | sort by event_id asc | evaluate narrow()"),
    ("b15 rand bounded", "print r = rand(10) < 10"),
    ("b15 row_window_session full", "events | sort by user_id asc, ts asc | extend sid = row_window_session(ts, 1d, 1h, user_id != prev(user_id)) | count"),
    # --- battery 16 (round-11, fifth sweep): ipv6, sort nulls
    # placement, url bags, multi-array sorts, Welch's t-test,
    # serialized sessionization, Sentinel dashboard shapes. Found and
    # fixed: the ipv6 family, sort/top `nulls first|last` without
    # asc/desc, datetime_diff sub-second units, series_round/
    # magnitude/seasonal, has_any_index, welch_test, dayofweek ÷
    # timespan, variant negative subscripts, parse_url «Query
    # Parameters», parse_urlquery accessor chains, multi-array
    # array_sort_asc/desc, mv-apply element-alias exposure.
    ("b16 parse_ipv6", "print p = parse_ipv6('2001:db8::1')"),
    ("b16 parse_ipv6 v4", "print p = parse_ipv6('192.168.1.1')"),
    ("b16 parse_ipv6_mask", "print p = parse_ipv6_mask('2001:db8:abcd::1', 32)"),
    ("b16 ipv6_compare", "print c = ipv6_compare('::1', '::2')"),
    ("b16 ipv6_is_match", "print m = ipv6_is_match('fe80::1', 'fe80::ffff', 112)"),
    ("b16 ipv6_is_in_range", "print r = ipv6_is_in_range('fe80::aaaa', 'fe80::/16')"),
    ("b16 sort nulls first", "events | extend v = iff(value > 99.9, real(null), value) | order by v nulls first | take 2"),
    ("b16 top nulls last", "events | top 3 by value nulls last"),
    ("b16 dtdiff nanos", "print n = datetime_diff('nanosecond', datetime(2024-01-01 00:00:01), datetime(2024-01-01))"),
    ("b16 dtdiff millis", "print n = datetime_diff('millisecond', datetime(2024-01-01 00:00:01), datetime(2024-01-01))"),
    ("b16 series_round magnitude", "print a = series_round(dynamic([1.4, 2.6])), m = series_magnitude(dynamic([3.0, 4.0]))"),
    ("b16 series_seasonal", "print s = series_seasonal(dynamic([1.0, 2.0, 3.0, 3.0, 4.0, 5.0]), 3)"),
    ("b16 has_any_index", "print i = has_any_index('where is the cat', dynamic(['dog', 'cat']))"),
    ("b16 welch_test", "print p = welch_test(10.0, 1.0, 30, 12.0, 1.5, 30)"),
    ("b16 dayofweek div", "print d = dayofweek(datetime(2024-01-03)) / 1d"),
    ("b16 variant neg subscript", "print v = toint(todynamic('[1,2,3]')[-1])"),
    ("b16 parse_url query params", "print q = tostring(parse_url('https://h/p?x=1&y=a%20b')['Query Parameters']['y'])"),
    ("b16 parse_urlquery chain", "print q = tostring(parse_urlquery('x=1&y=2')['Query Parameters']['y'])"),
    ("b16 array_sort multi", "print x = 1 | extend t = array_sort_asc(dynamic([3, 1, 2]), dynamic(['c', 'a', 'b'])) | project t, t1"),
    ("b16 mv-apply alias", "datatable(k: long) [1] | extend a = pack_array(3, 1, 2) | mv-apply e = a to typeof(long) on (where e > 1 | top 1 by e) | project e"),
    ("b16 top-hitters", "events | top-hitters 3 of event_type"),
    ("b16 reduce by", "events | take 20 | reduce by event_type"),
    ("b16 autocluster", "events | take 50 | project event_type, user_id | evaluate autocluster()"),
    ("b16 basket", "events | take 50 | project event_type, user_id | evaluate basket()"),
    ("b16 dcount_intersect", "events | summarize h1 = hll(user_id), h2 = hll(event_id) | evaluate dcount_intersect(h1, h2)"),
    ("b16 startofquarter", "print q = startofquarter(datetime(2024-05-15)), e = endofquarter(datetime(2024-05-15))"),
    ("b16 not between", "events | where value !between (10.0 .. 90.0) | count"),
    ("b16 bag_has_key", "print b = bag_has_key(dynamic({'a': 1}), 'a')"),
    ("b16 around", "print b = around(102.0, 100.0, 5.0)"),
    ("b16 strcat_array", "print s = strcat_array(dynamic([1, 2, 3]), '-')"),
    ("b16 minif maxif avgif", "events | summarize mn = minif(value, value > 10), mx = maxif(value, value < 90), a = avgif(value, event_type == 'view')"),
    ("b16 take_anyif", "events | summarize take_anyif(event_type, value > 50)"),
    ("b16 extract group 0", "print m = extract('h(a)s', 0, 'has')"),
    ("b16 indexof_regex", "print i = indexof_regex('ab1cd', @'\\d')"),
    ("b16 scan with_match_id", "events | where user_id == 1 | sort by ts asc | scan with_match_id=m_id with (step s1: event_type == 'view';) | count"),
    ("b16 summarize hint.shufflekey", "events | summarize hint.shufflekey = user_id c = count() by user_id | count"),
    ("b16 between duration", "events | where ts between (datetime(2024-01-01) .. 3d) | count"),
    ("b16 bag_zip", "print b = bag_zip(dynamic(['a','b','c']), dynamic([1,2]))"),
    ("b16 parse_command_line", "print p = parse_command_line('a \"b c\" d', 'windows')"),
    ("b16 fit_line_dynamic", "print m = dynamic([1.0, 2.0, 3.0, 4.0]) | extend f = series_fit_line_dynamic(m) | project s = todouble(f.slope)"),
    ("b16 fit_2lines_dynamic", "print m = dynamic([1.0, 2.0, 3.0, 30.0, 40.0, 50.0]) | extend f = series_fit_2lines_dynamic(m) | project si = toint(f.split_idx)"),
    ("b16 array_index_of occurrence", "print i = array_index_of(dynamic([1,2,3,2,2]), 2, 0, -1, 2)"),
    ("b16 sequence_detect", "events | extend isV = event_type == 'view', isP = event_type == 'purchase' | evaluate sequence_detect(ts, 1d, 1d, isV, isP, user_id) | count"),
    ("b16 new_activity_metrics", "events | evaluate new_activity_metrics(user_id, ts, datetime(2024-01-01), datetime(2024-01-08), 1d) | count"),
    ("b16 rolling_percentile", "events | evaluate rolling_percentile(value, 75, ts, 1d, 3) | count"),
    # --- battery 17 (round-11, sixth sweep): join kinds, dynamic
    # table refs, aggregates tail, macro invoke args, copy-paste
    # hygiene. Found and fixed: table()/materialized_view() refs,
    # trailing semicolon, bin(expr, …) group alias, isempty/isnotempty
    # with literal/nested args, has <number>, make_list_with_nulls,
    # invoke with scalar args + defaults, dynamic({…}).path chains.
    ("b17 join innerunique", "events | take 30 | join kind=innerunique (events | project event_id, v2 = value) on event_id | count"),
    ("b17 join fullouter", "events | take 10 | join kind=fullouter (events | take 5 | project event_id, v2 = value) on event_id | count"),
    ("b17 table fn", "table('events') | count"),
    ("b17 trailing semicolon", "events | count;"),
    ("b17 bin expr key", "events | summarize c = count() by bin(ts - 1h, 1d) | count"),
    ("b17 isempty literal", "print a = isnotempty(' '), b = isempty(''), c = isempty(strcat('a', 'b'))"),
    ("b17 has number", "events | where props has 42 | count"),
    ("b17 make_list_with_nulls", "datatable(v: real) [1.0, real(null), 2.0] | summarize l = make_list_with_nulls(v) | project n = array_length(l)"),
    ("b17 invoke args", "let f = (T: (value: real), k: real) { T | where value > k }; events | project value | invoke f(50.0) | count"),
    ("b17 invoke default arg", "let f = (T: (value: real), k: real = 90.0) { T | where value > k }; events | project value | invoke f() | count"),
    ("b17 dynamic obj chain", "print v = toint(dynamic({'a': [1, {'b': 2}]}).a[1].b)"),
    ("b17 union kind=outer", "union kind=outer events, (events | extend extra = 1) | count"),
    ("b17 make_datetime", "print d = make_datetime(2024, 1, 2, 3, 4, 5.5)"),
    ("b17 datetime tz roundtrip", "print u = datetime_local_to_utc(datetime_utc_to_local(datetime(2024-06-01 12:00:00), 'US/Pacific'), 'US/Pacific')"),
    ("b17 percentiles_array", "events | summarize p = percentiles_array(value, 25, 50, 75) | project n = array_length(p)"),
    ("b17 exp2 exp10", "print a = exp2(10.0), b = exp10(3.0)"),
    ("b17 replace_regex backrefs", "print r = replace_regex('ab12', @'([a-z])(\\d)', @'\\2\\1')"),
    ("b17 in~ list", "events | where event_type in~ ('VIEW', 'CLICK') | count"),
    ("b17 count as", "events | count as Rows"),
    ("b17 bag_unpack prefix", "events | take 3 | extend b = pack('t', event_type) | evaluate bag_unpack(b, 'p_') | count"),
    # --- battery 18 (round-11, seventh sweep): copy-paste hygiene and
    # type-surface tails. Found and fixed: // line comments (every
    # pasted dashboard carries them), NEGATIVE timespan strings
    # (silently NULL before — translate-time and runtime), iOS
    # third-party browser families (CriOS/FxiOS/EdgiOS fell through
    # to Other), datatable timespan/guid columns, typeof(timespan)
    # elements routed through the totimespan parse.
    ("b18 line comments", "events // source\n| where value > 50 // filter\n| count"),
    ("b18 comment url survives", "print u = 'https://x//y' // tail"),
    ("b18 negative timespan literal", "print t = totimespan('-01:30:00') / 1m"),
    ("b18 negative timespan runtime", "datatable(s: string) ['-2h'] | extend ok = totimespan(s) == -2h | project ok"),
    ("b18 crios family", "print f = tostring(parse_json(parse_user_agent('Mozilla/5.0 (iPhone) AppleWebKit CriOS/120.0.6099.119 Mobile Safari/604.1', 'browser')).Browser.Family)"),
    ("b18 fxios family", "print f = tostring(parse_json(parse_user_agent('Mozilla/5.0 (iPhone) AppleWebKit FxiOS/121.0 Mobile Safari', 'browser')).Browser.Family)"),
    ("b18 datatable timespan", "datatable(t: timespan) [1h, 30m] | summarize s = sum(t) | project m = s / 30m"),
    ("b18 datatable guid", "datatable(g: guid, n: long) ['8F2E8AB1-0000-0000-0000-000000000001', 1] | project g, n"),
    ("b18 typeof timespan elems", "print x = 1 | extend a = dynamic(['01:00:00', '-0:30:00']) | mv-expand t_ = a to typeof(timespan) | summarize s = sum(t_) | project ok = s == 30m"),
    ("b18 runtime tsdiv numerator", "datatable(s: string) ['-01:30:00', '02:00:00'] | extend m = totimespan(s) / 1m | project m"),
    ("b18 graph-to-table nodes", "events | take 50 | make-graph user_id --> event_id | graph-to-table nodes | count"),
    ("b18 graph-to-table edges", "events | take 50 | make-graph user_id --> event_id | graph-to-table edges | count"),
    ("b18 graph-mark-components", "datatable(s: long, d: long) [1, 2, 2, 3, 5, 6] | make-graph s --> d | graph-mark-components | graph-to-table nodes | summarize c = count() by ComponentId | count"),
    # --- battery 19 (round-11, eighth sweep): join condition forms,
    # search term scoping/wildcards, widening unions, null/empty
    # aggregate edges. Found and fixed: compound $left/$right join
    # conditions (and-chained + bare-key mixing), column-scoped search
    # terms (Col:"t" / Col=="v"), `*` wildcards in search terms
    # (previously matched LITERALLY — silent divergence).
    ("b19 join two keys", "events | take 30 | join kind=inner (events | project event_id, user_id, v2 = value) on event_id, user_id | count"),
    ("b19 join compound cond", "events | take 30 | join kind=inner (events | project e2 = event_id, u2 = user_id, v2 = value) on $left.event_id == $right.e2 and $left.user_id == $right.u2 | count"),
    ("b19 join mixed keys", "events | take 30 | join kind=inner (events | project event_id, u2 = user_id, v2 = value) on event_id, $left.user_id == $right.u2 | count"),
    ("b19 search col term", 'search in (events) event_type:"view" | count'),
    ("b19 search col exact", 'search in (events) event_type=="VIEW" | count'),
    ("b19 search wildcard", 'search in (events) "vi*w" | count'),
    ("b19 union type widen", "union (events | project v = event_id), (events | project v = value) | summarize s = sum(v)"),
    ("b19 summarize by bool", "events | summarize c = count() by hot = value > 50 | sort by hot asc"),
    ("b19 empty aggregates", "events | where value > 1e9 | summarize c = count(), s = sum(value), m = max(value)"),
    ("b19 gettype surface", "print t = gettype(dynamic([1])), b = gettype(dynamic({'a':1})), s = gettype('x'), n = gettype(1), r = gettype(1.5)"),
    # --- battery 20 (round-11, ninth sweep): depth/width stress and
    # robustness pins — ZERO failures (the first saturated sweep; the
    # shapes freeze as regression pins for the stage-nesting,
    # let-chaining, and operand-scale paths).
    ("b20 30-stage extend pipe", "events | " + " | ".join(f"extend x{i} = value + {i}" for i in range(30)) + " | summarize m = max(x29)"),
    ("b20 500-item in list", "events | where event_id in (" + ", ".join(str(i) for i in range(500)) + ") | count"),
    ("b20 25-deep iff nest", "print v = " + "iff(1 > 0, " * 25 + "1" + ", 0)" * 25),
    ("b20 60-col extend", "events | extend " + ", ".join(f"c{i} = value * {i}" for i in range(60)) + " | summarize s = sum(c59)"),
    ("b20 chained tabular lets", "let A = events | where value > 10; let B = A | where value > 20; let C2 = B | where value > 30; C2 | count"),
    ("b20 render with props", "events | summarize c = count() by event_type | render columnchart with (title='x', legend=visible)"),
    ("b20 union fn-let operands", "let f1 = view () { events | take 3 }; let f2 = view () { events | take 5 }; union f1, f2 | count"),
    ("b20 multiple mv-expand", "events | take 2 | extend a = pack_array(1,2), b = pack_array(3,4) | mv-expand a | mv-expand b | count"),
    ("b20 toscalar let arithmetic", "let avg_v = toscalar(events | summarize avg(value)); events | extend d = value - avg_v | summarize m = max(d)"),
    ("b20 parse partial match", "datatable(s: string) ['x=1', 'nope'] | parse s with 'x=' v: long | count"),
    ("b20 ua opera mini", "print f = tostring(parse_json(parse_user_agent('Opera/9.80 (J2ME/MIDP) Opera Mini/9.80.1 Mobile', 'browser')).Browser.Family)"),
    ("b20 ua yandex", "print f = tostring(parse_json(parse_user_agent('Mozilla/5.0 AppleWebKit Chrome/108.0 YaBrowser/23.1.2.987 Safari/537.36', 'browser')).Browser.Family)"),
    ("b20 ua wechat", "print f = tostring(parse_json(parse_user_agent('Mozilla/5.0 (iPhone) AppleWebKit MicroMessenger/8.0.42 Mobile', 'browser')).Browser.Family)"),
    ("b20 ua qq", "print f = tostring(parse_json(parse_user_agent('Mozilla/5.0 (Linux; Android 13) AppleWebKit MQQBrowser/13.6 Mobile Chrome/94', 'browser')).Browser.Family)"),
    ("b20 decompose autodetect", "print m = dynamic([10.0,2.0,5.0,1.0,10.0,2.0,5.0,1.0,10.0,2.0,5.0,1.0,10.0,2.0,5.0,1.0,10.0,2.0,5.0,1.0]) | extend (b, s, t, res) = series_decompose(m) | project rmax = array_max(series_abs(res))"),
    ("b20 decompose -1", "print m = dynamic([1.0, 9.0, 2.0, 7.0, 3.5, 8.2, 0.5, 6.6]) | extend (b, s, t, res) = series_decompose(m, -1) | project n = array_length(b)"),
    ("b20 anomalies autodetect", "print m = dynamic([10.0,2.0,5.0,1.0,10.0,2.0,5.0,1.0,10.0,2.0,5.0,1.0,10.0,2.0,5.0,1.0,10.0,2.0,5.0,1.0]) | extend (a, sc, b) = series_decompose_anomalies(m) | project n = array_length(a)"),
    ("b20 funnel_sequence", "events | evaluate funnel_sequence(user_id, ts, datetime(2024-01-01), datetime(2024-03-01), 2d, 10d, event_type, dynamic(['view', 'click', 'purchase'])) | count"),
]


@pytest.fixture(scope="module", autouse=True)
def _events(spark, sf_smoke):
    load(spark, sf_smoke, "events").createOrReplaceTempView("events")


@pytest.mark.parametrize(
    "name,q", PROBES, ids=[n for n, _ in PROBES]
)
def test_idiom_probe(spark, name, q):
    assert kql(spark, q).collect() is not None


def test_facet_with_subpipe_loud(spark):
    """Battery 8: ADX's `facet by c with (subpipe)` returns an EXTRA
    table — inexpressible in one DataFrame, so it is a loud subset
    error (was a cryptic 'facet needs by col' message)."""
    with pytest.raises(ValueError, match="facet `with"):
        kql(spark, "events | facet by event_type with (summarize c = count())")


def test_battery8_value_checks(spark):
    """Battery 8 value pins for the five gaps it caught."""
    # bare untyped captures + bracket-containing datatable values
    r = kql(
        spark,
        "datatable(s: string) ['section1 [par1x][par2y]']"
        " | parse s with 'section' sec: long ' [' p1 '][' p2 ']'",
    ).collect()[0]
    assert (r["sec"], r["p1"], r["p2"]) == (1, "par1x", "par2y")
    # trailing bare capture takes the REST of the input (ADX)
    r = kql(
        spark,
        "print s = 'id=7;rest of line'"
        " | parse s with 'id=' i: long ';' tail",
    ).collect()[0]
    assert (r["i"], r["tail"]) == (7, "rest of line")
    # tolong/toint hex literals resolve at translate time
    r = kql(spark, "print h = tolong('0x1A'), i = toint('-0xف')"
            .replace('ف', 'F')).collect()[0]
    assert (r["h"], r["i"]) == (26, -15)
    # parse_json over a complex expression compiles to get_json_object
    r = kql(
        spark,
        "print f = tostring(parse_json(parse_user_agent("
        "'curl/8.0.1', 'browser')).Browser.Family)",
    ).collect()[0]
    assert r["f"] == "curl"
    # bin over an interval-typed column buckets as a timespan
    rows = kql(
        spark,
        "datatable(t: datetime) [datetime(2024-01-02 06:00:00),"
        " datetime(2024-01-03 01:00:00), datetime(2024-01-05 23:00:00)]"
        " | extend d = t - datetime(2024-01-01)"
        " | summarize c = count() by b = bin(d, 1d)"
        " | extend days = b / 1d | sort by days asc | project days, c",
    ).collect()
    assert [(r["days"], r["c"]) for r in rows] == [
        (1.0, 1), (2.0, 1), (4.0, 1),
    ]


def test_battery9_value_checks(spark):
    """Battery 9 value pins for the five gaps it caught."""
    r = kql(
        spark,
        "print s = array_slice(dynamic([1,2,3,4,5]), -2, -1),"
        " s2 = array_slice(dynamic([1,2,3,4,5]), 1, 3),"
        " s3 = array_slice(dynamic([1,2,3,4,5]), 3, 1),"
        " c = countof('a1b2c3', @'\\d', 'regex'),"
        " cn = countof('aaa', 'aa', 'normal'),"
        " i1 = array_index_of(dynamic([1,2,3,2]), 2, 2),"
        " i2 = array_index_of(dynamic([1,2,3,2]), 9, 1),"
        " i3 = array_index_of(dynamic([1,2,3,2]), 2, -2)",
    ).collect()[0]
    assert (r["s"], r["s2"], r["s3"]) == ([4, 5], [2, 3, 4], [])
    assert (r["c"], r["cn"]) == (3, 2)
    assert (r["i1"], r["i2"], r["i3"]) == (3, -1, 3)
    # invoke over a fn-let with a declared tabular-param schema
    spark.sql(
        "SELECT * FROM VALUES (1.0), (2.0), (3.0) AS t(value)"
    ).createOrReplaceTempView("inv_t")
    r = kql(
        spark,
        "let addv = (T: (value: real)) { T | summarize s = sum(value) };"
        " inv_t | invoke addv()",
    ).collect()[0]
    assert r["s"] == 6.0


def test_battery10_value_checks(spark):
    """Battery 10 value pins for the five gaps it caught."""
    spark.sql(
        "SELECT array(10, 20, 30, 40) AS a"
    ).createOrReplaceTempView("mvt")
    # mv-apply with_itemindex: index visible to where AND summarize
    r = kql(
        spark,
        "mvt | mv-apply with_itemindex=i e = a on"
        " (where i >= 1 | summarize s = sum(e), mi = max(i),"
        " c = count())",
    ).collect()[0]
    assert (r["s"], r["mi"], r["c"]) == (90.0, 3, 3)
    # where-only subpipe unwraps back to the value array
    r = kql(
        spark,
        "mvt | mv-apply with_itemindex=i e = a on (where i % 2 == 0)"
        " | project a",
    ).collect()[0]
    assert r["a"] == [10, 30]
    # typed extract with a CALL source; failed cast -> NULL
    r = kql(
        spark,
        "print n = extract('([0-9]+)', 1, strcat('x', tostring(42)),"
        " typeof(long)),"
        " bad = extract('([a-z]+)', 1, 'x42', typeof(long))",
    ).collect()[0]
    assert r["n"] == 42 and r["bad"] is None
    # extract_all multi-group -> array of per-match group arrays
    r = kql(
        spark, "print x = extract_all(@'(\\w)(\\d)', 'a1 b2')"
    ).collect()[0]
    assert r["x"] == [["a", "1"], ["b", "2"]]
    # week boundaries are SUNDAYS; quarter boundaries
    r = kql(
        spark,
        "print w1 = datetime_diff('week', datetime(2024-01-07),"
        " datetime(2024-01-06)),"
        " w0 = datetime_diff('week', datetime(2024-01-05),"
        " datetime(2024-01-01)),"
        " q = datetime_diff('quarter', datetime(2024-07-01),"
        " datetime(2024-01-01))",
    ).collect()[0]
    assert (r["w1"], r["w0"], r["q"]) == (1, 0, 2)
    # join parameters are order-free and agree
    a = kql(
        spark,
        "mvt | mv-expand a | extend k = 'x'"
        " | join hint.strategy=broadcast kind=inner"
        " (mvt | mv-expand a | project v2 = a, k = 'x' | take 2)"
        " on k | count",
    ).collect()[0][0]
    b = kql(
        spark,
        "mvt | mv-expand a | extend k = 'x'"
        " | join kind=inner hint.strategy=broadcast"
        " (mvt | mv-expand a | project v2 = a, k = 'x' | take 2)"
        " on k | count",
    ).collect()[0][0]
    assert a == b == 8


def test_battery11_value_checks(spark):
    """Battery 11 value pins for the findings it caught."""
    r = kql(
        spark,
        "print r1 = round(series_pearson_correlation("
        "dynamic([1.0, 2.0, 3.0]), dynamic([2.0, 4.0, 6.0])), 9),"
        " r2 = round(series_pearson_correlation("
        "dynamic([1.0, 2.0, 3.0]), dynamic([3.0, 2.0, 1.0])), 9),"
        " r0 = series_pearson_correlation(dynamic([1.0, 1.0]),"
        " dynamic([1.0, 2.0])),"
        " f1 = format_ipv4('192.168.1.255', 24),"
        " f2 = format_ipv4(3232236031, 24),"
        " f3 = format_ipv4('10.0.0.7')",
    ).collect()[0]
    assert (r["r1"], r["r2"], r["r0"]) == (1.0, -1.0, None)
    assert (r["f1"], r["f2"], r["f3"]) == (
        "192.168.1.0",
        "192.168.1.0",
        "10.0.0.7",
    )


def test_round11_advice_value_checks(spark):
    """Round-10 advice pins: duplicate join kind= rejected loudly;
    array_index_of / array_slice from-end indices below -size clamp to
    the array head (ADX's graceful -1 / prefix) instead of feeding
    slice() a nonpositive start (Spark runtime error)."""
    spark.sql("SELECT 1 AS k, 10 AS value").createOrReplaceTempView(
        "adv_l"
    )
    with pytest.raises(ValueError, match="duplicate kind"):
        kql(
            spark,
            "adv_l | join kind=inner hint.strategy=shuffle"
            " kind=leftouter (adv_l) on k",
        )
    r = kql(
        spark,
        "print i1 = array_index_of(pack_array(1, 2, 3), 2, -99),"
        " i2 = array_index_of(pack_array(1, 2, 3), 2, -2),"
        " s1 = array_slice(pack_array(1, 2, 3), -99, 1),"
        " s2 = array_slice(pack_array(1, 2, 3), -99, -98)",
    ).collect()[0]
    assert r["i1"] == 1 and r["i2"] == 1
    assert r["s1"] == [1, 2] and r["s2"] == []


def test_real_div_zero_value_checks(spark):
    """Round-10 verdict #1 pins: provably-real ÷0 follows ADX/IEEE
    (inf/-inf/NaN), nulls propagate, finite values untouched; integer
    and unknown-typed divisions keep the loud ANSI error; timespan
    division and interval/real division are unaffected."""
    import math

    r = kql(
        spark,
        "print a = 1.0 / 0, b = -2.5 / 0.0, c = 0.0 / 0,"
        " d = todouble(5) / 0, e = 1.0 / 2,"
        " f = real(null) / 0.0, g = 3.0 / real(null)",
    ).collect()[0]
    assert r["a"] == math.inf and r["b"] == -math.inf
    assert math.isnan(r["c"]) and r["d"] == math.inf
    assert r["e"] == 0.5 and r["f"] is None and r["g"] is None
    # multiplicative chains: the left-assoc numerator is preserved,
    # % rides along, two-division chains guard both
    r = kql(
        spark,
        "print x = 7 % 4 / 0.0, y = 1.0 / 2 / 0, z = 100.0 / 0 / 10,"
        " w = 0 - 1.0 / 0.0",
    ).collect()[0]
    assert r["x"] == math.inf and r["y"] == math.inf
    assert r["z"] == math.inf and r["w"] == -math.inf
    # rate-dashboard shape over a table (the motivating query)
    spark.sql(
        "SELECT 10 AS errors, 0 AS requests"
        " UNION ALL SELECT 3, 6"
    ).createOrReplaceTempView("rdz")
    rows = kql(
        spark,
        "rdz | extend rate = errors * 1.0 / requests"
        " | sort by errors asc | project rate",
    ).collect()
    assert rows[0]["rate"] == 0.5 and rows[1]["rate"] == math.inf
    # integer division stays ANSI-loud (ADX real semantics only apply
    # when an operand is provably real)
    with pytest.raises(Exception, match="DIVIDE_BY_ZERO"):
        kql(spark, "print z = 1 / 0").collect()
    # round-13 advice: a todouble SWALLOWED by an outer int conversion
    # is not evidence of realness — `toint(todouble(5)) + 1` is
    # int-typed in ADX and its ÷0 must stay loud, not emit inf
    with pytest.raises(Exception, match="DIVIDE_BY_ZERO"):
        kql(spark, "print z = (toint(todouble(5)) + 1) / 0").collect()
    # …while a TOP-LEVEL conversion inside the parens still counts
    r = kql(spark, "print z = (todouble(5) + 1) / 0").collect()[0]
    assert r["z"] == math.inf
    # digits inside a plain identifier are not a real literal
    # (col2e5x matched the unanchored \d[eE]\d probe pre-fix)
    spark.sql("SELECT 7 AS col2e5x").createOrReplaceTempView("rdz2")
    with pytest.raises(Exception, match="DIVIDE_BY_ZERO"):
        kql(spark, "rdz2 | extend z = (col2e5x + 1) / 0").collect()
    # timespan division and interval/real division unaffected
    r = kql(
        spark,
        "print r = 1h / 30m,"
        " h = (datetime(2024-01-02) - datetime(2024-01-01)) / 2.0",
    ).collect()[0]
    assert r["r"] == 2.0
    assert r["h"].total_seconds() == 43200


def test_db_qualifier_value_checks(spark):
    """Round-10 verdict #3 pins: cluster()/database() table
    qualifiers resolve to the session namespace (request db /
    current db / 'default' aliases, catalog databases qualified);
    unknown dbs and non-qualifier uses are loud; string literals
    containing the tokens are untouched."""
    from api_to_parquet_spark.queries.kql import _REQUEST_DB

    spark.sql("SELECT 1 AS k, 10 AS v").createOrReplaceTempView(
        "dbq_t"
    )
    assert (
        kql(spark, 'database("default").dbq_t | count').collect()[0][0]
        == 1
    )
    assert (
        kql(
            spark,
            'cluster("https://this.engine.local")'
            '.database("default").dbq_t | project v',
        ).collect()[0][0]
        == 10
    )
    tok = _REQUEST_DB.set("MyDb")
    try:
        assert (
            kql(spark, 'database("MyDb").dbq_t | count').collect()[0][0]
            == 1
        )
    finally:
        _REQUEST_DB.reset(tok)
    with pytest.raises(ValueError, match="unknown database"):
        kql(spark, 'database("NopeDb").dbq_t | count')
    with pytest.raises(ValueError, match="only as a table qualifier"):
        kql(spark, 'dbq_t | extend x = database("default") | count')
    # a string literal carrying the tokens is data, not a qualifier
    q = 'dbq_t | extend s = "database(\\"x\\").T" | project s'
    assert kql(spark, q).collect()[0][0] == 'database("x").T'
    # union operand form
    assert (
        kql(
            spark,
            'union database("default").dbq_t, dbq_t | count',
        ).collect()[0][0]
        == 2
    )


def test_silent_plus_prepass_value_checks(spark):
    """Round-10 verdict #4 pins: with a session, a bare col+col `+`
    probes the stage schema up front — the numeric-LOOKING string
    column case (which analyzes cleanly under ANSI implicit casts, so
    no retry trigger ever fired) now raises the ADX parity error;
    string+string concatenates on the FIRST pass; numeric arithmetic
    and literal operands are untouched."""
    spark.sql(
        "SELECT '42' AS fake_num, 5.0 AS v, 'ab' AS s, 3 AS n"
    ).createOrReplaceTempView("spp_t")
    with pytest.raises(ValueError, match="mixed string/numeric"):
        kql(spark, "spp_t | extend q = fake_num + v | project q")
    assert (
        kql(spark, "spp_t | extend q = s + s | project q").collect()[0][0]
        == "abab"
    )
    assert (
        kql(spark, "spp_t | extend q = v + n | project q").collect()[0][0]
        == 8.0
    )
    assert (
        kql(spark, "spp_t | extend q = n + 1 | project q").collect()[0][0]
        == 4
    )
    assert (
        kql(spark, 'spp_t | extend q = "a + b" | project q').collect()[0][
            0
        ]
        == "a + b"
    )


def test_user_agent_dynamic_list_value_checks(spark):
    """Round-10 verdict #6 pins: dynamic query lists return one
    combined bag in list order; sections match the single-query
    forms; unknown/duplicate queries are loud."""
    import json as _json

    ua = (
        "Mozilla/5.0 (Linux; Android 10; SM-G973F Build/QP1A)"
        " AppleWebKit/537.36 (KHTML, like Gecko)"
        " Chrome/92.0.4515.115 Mobile Safari/537.36"
    )
    spark.sql(
        f"SELECT '{ua}' AS ua"
    ).createOrReplaceTempView("ua_list_t")
    bag = kql(
        spark,
        "ua_list_t | extend b = parse_user_agent(ua,"
        " dynamic(['browser', 'os', 'device'])) | project b",
    ).collect()[0][0]
    d = _json.loads(bag)
    assert list(d) == ["Browser", "OperatingSystem", "Device"]
    assert d["Browser"]["Family"] == "Chrome"
    assert d["Browser"]["MajorVersion"] == "92"
    assert d["OperatingSystem"]["Family"] == "Android"
    assert d["Device"]["Family"] == "SM-G973F"
    # list order is the output order
    bag = kql(
        spark,
        "ua_list_t | extend b = parse_user_agent(ua,"
        " dynamic(['os', 'browser'])) | project b",
    ).collect()[0][0]
    assert list(_json.loads(bag)) == ["OperatingSystem", "Browser"]
    # single-query form agrees with the list section
    single = kql(
        spark,
        'ua_list_t | extend b = parse_user_agent(ua, "os") | project b',
    ).collect()[0][0]
    assert _json.loads(single)["OperatingSystem"] == d["OperatingSystem"]
    with pytest.raises(ValueError, match="browser.*os.*device|queries only"):
        kql(
            spark,
            "ua_list_t | extend b = parse_user_agent(ua,"
            " dynamic(['engine'])) | project b",
        )
    with pytest.raises(ValueError, match="duplicate query"):
        kql(
            spark,
            "ua_list_t | extend b = parse_user_agent(ua,"
            " dynamic(['os', 'os'])) | project b",
        )


def test_battery12_value_checks(spark):
    """Battery 12 value pins for the findings it caught (the round-10
    gotcha: collect-only probes hide silent value bugs)."""
    # mv-expand expression operands: assigned name, todynamic
    # shorthand (expands INTO the source column's name), typed
    # expression
    spark.sql(
        "SELECT '{\"a\": 1, \"b\": 2}' AS props, 7 AS k"
    ).createOrReplaceTempView("b12_t")
    rows = kql(
        spark, "b12_t | mv-expand p = todynamic(props) | project p"
    ).collect()
    assert sorted(r["p"] for r in rows) == ['{"a":"1"}', '{"b":"2"}']
    rows = kql(
        spark, "b12_t | mv-expand todynamic(props) | project props"
    ).collect()
    assert sorted(r["props"] for r in rows) == [
        '{"a":"1"}', '{"b":"2"}',
    ]
    rows = kql(
        spark,
        'b12_t | mv-expand v = split("3,4", ",") to typeof(long)'
        " | project v",
    ).collect()
    assert sorted(r["v"] for r in rows) == [3, 4]
    with pytest.raises(ValueError, match="assign a name"):
        kql(spark, "b12_t | mv-expand strcat(props, 'x') | count")
    # typed MULTI-column zip (the make-series follow-up idiom)
    r = kql(
        spark,
        "b12_t | extend a = pack_array(1, 2), b = pack_array(9)"
        " | mv-expand a to typeof(long), b to typeof(string)"
        " | project a, b",
    ).collect()
    assert sorted((x["a"], x["b"]) for x in r) == [(1, "9"), (2, None)]
    # between with a let-bound / expression duration
    spark.sql(
        "SELECT TIMESTAMP '2024-01-02 00:00:00' AS ts"
        " UNION ALL SELECT TIMESTAMP '2024-03-02 00:00:00'"
    ).createOrReplaceTempView("b12_bt")
    assert (
        kql(
            spark,
            "let w = 30d; b12_bt"
            " | where ts between (datetime(2024-01-01) .. w) | count",
        ).collect()[0][0]
        == 1
    )
    assert (
        kql(
            spark,
            "b12_bt | where ts between (datetime(2024-01-01)"
            ' .. totimespan("90d")) | count',
        ).collect()[0][0]
        == 2
    )
    # split + negative index = last path segment
    assert (
        kql(
            spark,
            'print f = tostring(split("a/b/c.parquet", "/")[-1])',
        ).collect()[0][0]
        == "c.parquet"
    )
    # extract_all captureGroups: names, single-name flat, indices
    r = kql(
        spark,
        'print x = extract_all(@"(?P<w>[a-z]+)(?P<d>[0-9]+)",'
        ' dynamic(["w", "d"]), "ab12 cd34"),'
        ' y = extract_all(@"(?P<w>[a-z]+)(?P<d>[0-9]+)",'
        ' dynamic(["d"]), "ab12 cd34"),'
        ' z = extract_all(@"([a-z]+)([0-9]+)", dynamic([2, 1]),'
        ' "ab12")',
    ).collect()[0]
    assert r["x"] == [["ab", "12"], ["cd", "34"]]
    assert r["y"] == ["12", "34"]
    assert r["z"] == [["12", "ab"]]
    with pytest.raises(ValueError, match="no capture group named"):
        kql(
            spark,
            'print x = extract_all(@"(?P<w>[a-z]+)",'
            ' dynamic(["zz"]), "ab")',
        )


def test_positive_subscript_oob_null(spark):
    """Round-11: literal subscripts of BOTH signs ride
    try_element_at — positive out-of-range yields null (ADX dynamic
    contract) instead of Spark's ANSI INVALID_ARRAY_INDEX, and
    0-based positive indexing values are unchanged."""
    r = kql(
        spark,
        'print a = tostring(split("a/b/c", "/")[1]),'
        ' b = split("a/b", "/")[9],'
        " c = dynamic([10, 20])[1],"
        " d = pack_array(5, 6)[0] + pack_array(5, 6)[1]",
    ).collect()[0]
    assert r["a"] == "b" and r["b"] is None
    assert r["c"] == 20 and r["d"] == 11


def test_battery13_value_checks(spark):
    """Battery 13 value pins for the findings it caught."""
    r = kql(
        spark,
        'print s1 = replace_strings("abc", dynamic(["a", "b"]),'
        ' dynamic(["x", "y"])),'
        ' s2 = replace_strings("ab", dynamic(["a", "xb"]),'
        ' dynamic(["x", "Z"])),'
        ' d = pack_dictionary("k", 1, "j", 2),'
        ' w = datetime_add("week", 2, datetime(2024-01-01)),'
        ' q = datetime_add("quarter", 1, datetime(2024-01-31)),'
        " j = parse_json('{\"a\": {\"b\": [1, 2]}}').a.b[1]",
    ).collect()[0]
    # replacements apply IN ORDER over the running result (s2: the
    # first rewrite creates the second lookup's match)
    assert r["s1"] == "xyc" and r["s2"] == "Z"
    assert r["d"] == '{"k":1,"j":2}'
    assert str(r["w"]) == "2024-01-15 00:00:00"
    assert str(r["q"]) == "2024-04-30 00:00:00"
    assert r["j"] == "2"
    # mv-apply: expression sources (pre-projected), take/top subpipe
    # stages
    r = kql(
        spark,
        "print z = 1 | mv-apply e = pack_array(1, 9, 5) on"
        " (top 2 by e | summarize s = sum(e)) | project s",
    ).collect()[0]
    assert r["s"] == 14.0
    r = kql(
        spark,
        "print z = 1 | mv-apply e = pack_array(7, 8, 9) on"
        " (take 2 | summarize s = sum(e)) | project s",
    ).collect()[0]
    assert r["s"] == 15.0
    with pytest.raises(ValueError, match="assign a name"):
        kql(
            spark,
            "print z = 1 | mv-apply pack_array(1, 2) on"
            " (summarize s = sum(x)) | project s",
        )


def test_battery14_value_checks(spark):
    """Battery 14 value pins for the findings it caught."""
    spark.sql("SELECT 1 AS k").createOrReplaceTempView("b14w_a")
    spark.sql("SELECT 2 AS k").createOrReplaceTempView("b14w_b")
    assert (
        kql(spark, "union b14w* | summarize s = sum(k)").collect()[0][0]
        == 3
    )
    assert (
        kql(
            spark, "union withsource=T b14w* | distinct T | count"
        ).collect()[0][0]
        == 2
    )
    with pytest.raises(ValueError, match="no tables match"):
        kql(spark, "union zz_nothing* | count")
    r = kql(
        spark,
        'print v = 5 | summarize any(v)',
    ).collect()[0]
    assert r[0] == 5
    r = kql(
        spark,
        "print z = 1 | mv-expand x = pack_array(5, 3, 9, 1)"
        " | summarize s = make_set_if(x, x > 2, 2)",
    ).collect()[0]
    assert r["s"] == [3, 5]
    r = kql(
        spark,
        'print a = indexof("abcabc", "c", 0, -1, 2),'
        ' b = indexof("abc", "c", 0, -1, 3),'
        ' c = indexof("abcabc", "c", 0, -1, 1)',
    ).collect()[0]
    assert (r["a"], r["b"], r["c"]) == (5, -1, 2)
    r = kql(
        spark,
        "print d = iff(dayofweek(datetime(2024-01-07)) == 0d,"
        ' "Sun", "other"),'
        " e = iff(1d == dayofweek(datetime(2024-01-08)),"
        ' "Mon", "other"),'
        " n = dayofweek(datetime(2024-01-09))",
    ).collect()[0]
    assert (r["d"], r["e"], r["n"]) == ("Sun", "Mon", 2)
    r = kql(
        spark, "print x = long(1) + int(2), y = real(2) / 4"
    ).collect()[0]
    assert r["x"] == 3 and r["y"] == 0.5


def test_battery15_value_checks(spark):
    """Battery 15 value pins for the six gaps it caught (plus the
    geohash/erf reference values)."""
    import math

    r = kql(
        spark,
        "print a = parse_ipv4_mask('192.168.1.77', 24),"
        " b = format_ipv4_mask('192.168.1.77', 24),"
        " c = format_bytes(1024000, 2, 'MB'),"
        " d = format_bytes(5, 0, 'Bytes')",
    ).collect()[0]
    assert (r["a"], r["b"]) == (3232235776, "192.168.1.0/24")
    assert (r["c"], r["d"]) == ("0.98 MB", "5 Bytes")
    # erf/erfc: Cody rational approximation vs the C stdlib, ~1 ulp
    r = kql(
        spark,
        "print a = erf(1.0), b = erfc(1.0), c = erf(-0.3),"
        " d = erfc(5.5), e = erf(0.2)",
    ).collect()[0]
    for k, x in (("a", 1.0), ("c", -0.3), ("e", 0.2)):
        assert abs(r[k] - math.erf(x)) < 1e-14
    assert abs(r["b"] - math.erfc(1.0)) < 1e-14
    assert abs(r["d"] - math.erfc(5.5)) / math.erfc(5.5) < 1e-12
    # convert_* ratios fold at translate time
    r = kql(
        spark,
        "print a = convert_angle(180.0, 'Degree', 'Radian'),"
        " b = convert_length(1.0, 'Mile', 'Kilometer'),"
        " c = convert_temperature(32.0, 'DegreeFahrenheit',"
        " 'DegreeCelsius'),"
        " d = convert_speed(3.6, 'KilometerPerHour',"
        " 'MeterPerSecond'),"
        " e = convert_mass(16.0, 'Ounce', 'Pound')",
    ).collect()[0]
    assert abs(r["a"] - math.pi) < 1e-12
    assert abs(r["b"] - 1.609344) < 1e-12
    assert abs(r["c"]) < 1e-12
    assert abs(r["d"] - 1.0) < 1e-12
    assert abs(r["e"] - 1.0) < 1e-12
    with pytest.raises(ValueError, match="convert_length units"):
        kql(spark, "print x = convert_length(1.0, 'Mile', 'Furlong')")
    # geohash: the canonical reference point (57.64911, 10.40744)
    # encodes to u4pruydqqvj at 11 chars
    r = kql(
        spark,
        "print g = geo_point_to_geohash(10.40744, 57.64911, 11),"
        " h = geo_point_to_geohash(-122.3, 47.6, 6),"
        " n = geo_point_to_geohash(0.0, 91.0, 6)",
    ).collect()[0]
    assert r["g"] == "u4pruydqqvj"
    assert r["h"] == "c23nbc"
    assert r["n"] is None  # out-of-range latitude
    # percentilesw: exact weighted fold, both naming forms
    r = kql(
        spark,
        "datatable(v: real, w: long) [1.0, 4, 2.0, 3, 3.0, 3]"
        " | summarize percentilesw(v, w, 25, 50, 95),"
        " (lo, hi) = percentilesw(v, w, 10, 95)",
    ).collect()[0]
    assert (r["percentile_v_25"], r["percentile_v_50"]) == (1.0, 2.0)
    assert (r["percentile_v_95"], r["lo"], r["hi"]) == (3.0, 1.0, 3.0)


def test_battery15_row_window_session_full(spark):
    """Full ADX row_window_session(Expr, MaxDistanceFromFirst,
    MaxDistanceBetweenValues[, Restart]): the from-FIRST bound is
    recursive (the session start feeds its own break test) and needs
    the ordered fold, not a window stack. 10:55 breaks on the 25m >
    20m gap; 12:05 breaks on 70m-from-first > 1h despite a 15m gap."""
    rows = kql(
        spark,
        "datatable(t: datetime) ["
        "datetime(2024-01-01 10:00:00), datetime(2024-01-01 10:15:00),"
        " datetime(2024-01-01 10:30:00), datetime(2024-01-01 10:55:00),"
        " datetime(2024-01-01 11:05:00), datetime(2024-01-01 11:20:00),"
        " datetime(2024-01-01 11:35:00), datetime(2024-01-01 11:50:00),"
        " datetime(2024-01-01 12:05:00)]"
        " | sort by t asc"
        " | extend sid = row_window_session(t, 1h, 20m)"
        " | project t, sid",
    ).collect()
    got = [r["sid"].strftime("%H:%M") for r in rows]
    assert got == ["10:00"] * 3 + ["10:55"] * 5 + ["12:05"]
    # restart expression may use prev() (row-wise, inner layer)
    rows = kql(
        spark,
        "datatable(t: datetime, g: string) ["
        "datetime(2024-01-01 10:00:00), 'a',"
        " datetime(2024-01-01 10:05:00), 'a',"
        " datetime(2024-01-01 10:10:00), 'b',"
        " datetime(2024-01-01 10:15:00), 'b']"
        " | sort by t asc"
        " | extend sid = row_window_session(t, 1h, 30m, g != prev(g))"
        " | project g, sid",
    ).collect()
    assert [(r["g"], r["sid"].strftime("%H:%M")) for r in rows] == [
        ("a", "10:00"), ("a", "10:00"), ("b", "10:10"), ("b", "10:10"),
    ]
    with pytest.raises(ValueError, match="standalone"):
        kql(
            spark,
            "events | sort by ts asc | extend x = 1,"
            " s = row_window_session(ts, 1h, 20m)",
        )


def test_battery16_value_checks(spark):
    """Battery 16 value pins for the twelve gaps it caught."""
    import math

    r = kql(
        spark,
        "print a = parse_ipv6('2001:db8::1'),"
        " b = parse_ipv6('::ffff:127.0.0.1'),"
        " c = parse_ipv6('192.168.1.1'),"
        " d = parse_ipv6('1:::2'), e = parse_ipv6('1:2:3:4:5:6:7:8:9'),"
        " f = parse_ipv6_mask('2001:db8:abcd::1', 32)",
    ).collect()[0]
    assert r["a"] == "2001:0db8:0000:0000:0000:0000:0000:0001"
    assert r["b"] == "0000:0000:0000:0000:0000:ffff:7f00:0001"
    assert r["c"] == "0000:0000:0000:0000:0000:ffff:c0a8:0101"
    assert r["d"] is None and r["e"] is None
    assert r["f"] == "2001:0db8:0000:0000:0000:0000:0000:0000"
    r = kql(
        spark,
        "print a = ipv6_compare('::1', '::2'),"
        " b = ipv6_compare('fe80::1/16', 'fe80:abcd::9'),"
        " c = ipv6_is_match('fe80::1', 'fe80::ffff', 112),"
        " d = ipv6_is_match('fe80::1', 'fe81::1', 112),"
        " e = ipv6_is_in_range('fe81::1', 'fe80::/32'),"
        " f = ipv6_compare('192.168.1.1', '::ffff:192.168.1.1')",
    ).collect()[0]
    assert (r["a"], r["b"], r["c"], r["d"]) == (-1, 0, True, False)
    assert (r["e"], r["f"]) == (False, 0)
    # nulls placement with and without a direction keyword
    rows = kql(
        spark,
        "datatable(v: real) [2.0, real(null), 1.0]"
        " | order by v nulls first",
    ).collect()
    assert rows[0]["v"] is None and rows[1]["v"] == 2.0
    rows = kql(
        spark,
        "datatable(v: real) [2.0, real(null), 1.0]"
        " | order by v asc nulls last",
    ).collect()
    assert rows[0]["v"] == 1.0 and rows[-1]["v"] is None
    # welch_test: df=2 closed form p = 1 - t/sqrt(2+t²) at t=1
    r = kql(
        spark, "print p = welch_test(2.0, 1.0, 2, 1.0, 1.0, 2)"
    ).collect()[0]
    assert abs(r["p"] - (1 - 1 / math.sqrt(3))) < 1e-10
    r = kql(
        spark,
        "print s = series_seasonal(dynamic([1.0, 2.0, 3.0, 3.0, 4.0,"
        " 5.0]), 3),"
        " m = series_magnitude(dynamic([3.0, 4.0])),"
        " i = has_any_index('where is the cat', dynamic(['dog',"
        " 'cat'])),"
        " j = has_any_index('nothing here', dynamic(['dog'])),"
        " d = dayofweek(datetime(2024-01-03)) / 1d,"
        " v = toint(todynamic('[1,2,3]')[-2]),"
        " n = datetime_diff('nanosecond',"
        " datetime(2024-01-01 00:00:01), datetime(2024-01-01))",
    ).collect()[0]
    assert r["s"] == [2.0, 3.0, 4.0, 2.0, 3.0, 4.0]
    assert (r["m"], r["i"], r["j"]) == (5.0, 1, -1)
    assert (r["d"], r["v"], r["n"]) == (3.0, 2, 1000000000)
    # parse_url Query Parameters map is url-decoded
    r = kql(
        spark,
        "print a = tostring(parse_url('https://h/p?x=1&y=a%20b')"
        "['Query Parameters']['y']),"
        " b = tostring(parse_urlquery('x=1&y=2')"
        "['Query Parameters']['y'])",
    ).collect()[0]
    assert (r["a"], r["b"]) == ("a b", "2")
    # multi-array sorts: first array orders the rest in lockstep
    r = kql(
        spark,
        "print x = 1 | extend t = array_sort_asc(dynamic([3, 1, 2]),"
        " dynamic(['c', 'a', 'b'])) | project t, t1",
    ).collect()[0]
    assert r["t"] == [1, 2, 3] and r["t1"] == ["a", "b", "c"]
    r = kql(
        spark,
        "print x = 1 | extend (s1, s2) = array_sort_desc("
        "dynamic([1, 3, 2]), dynamic([10, 30, 20])) | project s1, s2",
    ).collect()[0]
    assert r["s1"] == [3, 2, 1] and r["s2"] == [30, 20, 10]
    # mv-apply element alias exposes the filtered array
    r = kql(
        spark,
        "datatable(k: long) [1] | extend a = pack_array(3, 1, 2)"
        " | mv-apply e = a to typeof(long) on"
        " (where e > 1 | top 1 by e) | project e",
    ).collect()[0]
    assert r["e"] == [3]
    # bag_zip pads values with null to the key count
    import json

    r = kql(
        spark,
        "print b = bag_zip(dynamic(['a','b','c']), dynamic([1,2])),"
        " p = parse_command_line('a \"b c\" d', 'windows')",
    ).collect()[0]
    assert json.loads(r["b"]) == {"a": "1", "b": "2", "c": None}
    assert r["p"] == ["a", "b c", "d"]
    # fit-line bag twins carry the same math as the multi-assign chain
    r = kql(
        spark,
        "print m = dynamic([1.0, 2.0, 3.0, 4.0])"
        " | extend f = series_fit_line_dynamic(m)"
        " | project s = todouble(f.slope), r2 = todouble(f.rsquare)",
    ).collect()[0]
    assert abs(r["s"] - 1.0) < 1e-12 and abs(r["r2"] - 1.0) < 1e-12
    r = kql(
        spark,
        "print m = dynamic([1.0, 2.0, 3.0, 30.0, 40.0, 50.0])"
        " | extend f = series_fit_2lines_dynamic(m)"
        " | project si = toint(f.split_idx)",
    ).collect()[0]
    assert r["si"] == 3
    # array_index_of window + occurrence forms
    r = kql(
        spark,
        "print a = array_index_of(dynamic([1,2,3,2,2]), 2, 0, 2),"
        " b = array_index_of(dynamic([1,2,3,2,2]), 2, 0, -1, 2),"
        " c = array_index_of(dynamic([1,2,3,2,2]), 2, 2, -1, 2),"
        " e = array_index_of(dynamic([1,2,3,2]), 2, 0, 2, 2)",
    ).collect()[0]
    assert (r["a"], r["b"], r["c"], r["e"]) == (1, 3, 4, -1)


def test_battery17_value_checks(spark, sf_smoke):
    """Battery 17 value pins for the eight gaps it caught."""
    load(spark, sf_smoke, "events").createOrReplaceTempView("events")
    # table() resolves literal names; unknown form stays loud
    n_all = kql(spark, "events | count").collect()[0]["Count"]
    assert (
        kql(spark, "table('events') | count;").collect()[0]["Count"]
        == n_all
    )
    with pytest.raises(ValueError):
        kql(spark, "table(strcat('ev', 'ents')) | count")
    # bin over an EXPRESSION key gets a safe generated alias
    df = kql(spark, "events | summarize c = count() by bin(ts - 1h, 1d)")
    assert df.columns == ["key0", "c"]
    # isempty family handles literal and nested-call arguments
    r = kql(
        spark,
        "print a = isnotempty(' '), b = isempty(''),"
        " c = isempty(strcat('a', 'b')), d = isempty(long(null))",
    ).collect()[0]
    assert (r["a"], r["b"], r["c"], r["d"]) == (True, True, False, True)
    # numeric has term matches as decimal text with word boundaries
    r = kql(
        spark,
        "datatable(s: string) ['id 42 ok', 'id 420', 'none']"
        " | where s has 42 | count",
    ).collect()[0]
    assert r["Count"] == 1
    # make_list_with_nulls keeps the nulls collect_list drops
    r = kql(
        spark,
        "datatable(v: real) [1.0, real(null), 2.0]"
        " | summarize l = make_list_with_nulls(v)",
    ).collect()[0]
    assert sorted(x for x in r["l"] if x is not None) == [1.0, 2.0]
    assert len(r["l"]) == 3
    # invoke binds scalar args positionally; defaults fill the tail
    r = kql(
        spark,
        "let f = (T: (value: real), lo: real, hi: real = 1e9)"
        " { T | where value > lo and value < hi };"
        " events | project value | invoke f(50.0) | count",
    ).collect()[0]
    r2 = kql(
        spark,
        "events | project value | where value > 50.0"
        " and value < 1e9 | count",
    ).collect()[0]
    assert r["Count"] == r2["Count"]
    with pytest.raises(ValueError, match="missing argument"):
        kql(
            spark,
            "let f = (T: (value: real), k: real) { T | where value"
            " > k }; events | invoke f() | count",
        )
    # dynamic object literals route accessor chains through JSON paths
    r = kql(
        spark,
        "print v = toint(dynamic({'a': [1, {'b': 2}]}).a[1].b),"
        " w = tostring(dynamic({'k': 'x'}).k)",
    ).collect()[0]
    assert (r["v"], r["w"]) == (2, "x")


def test_battery18_value_checks(spark, sf_smoke):
    """Battery 18 value pins: comment stripping is string-aware, the
    negative-timespan silent NULL is fixed both at translate time and
    at runtime, iOS browser shells classify, timespan/guid land in
    datatable and typeof."""
    load(spark, sf_smoke, "events").createOrReplaceTempView("events")
    n = kql(spark, "events | where value > 50 | count").collect()[0][
        "Count"
    ]
    got = kql(
        spark,
        "events // the source\n| where value > 50 // keep hot\n"
        "| count // total",
    ).collect()[0]["Count"]
    assert got == n
    r = kql(
        spark,
        "print u = 'https://x//y', v = @'a//b' // real comment",
    ).collect()[0]
    assert (r["u"], r["v"]) == ("https://x//y", "a//b")
    r = kql(
        spark,
        "print a = totimespan('-01:30:00') / 1m,"
        " b = totimespan('-2h') / 1h,"
        " c = -90m == totimespan('-01:30:00')",
    ).collect()[0]
    assert (r["a"], r["b"], r["c"]) == (-90.0, -2.0, True)
    rows = kql(
        spark,
        "datatable(s: string) ['-01:30:00', '01:30:00', 'x']"
        " | project neg = totimespan(s) == -90m,"
        " pos = totimespan(s) == 90m, nl = isnull(totimespan(s))",
    ).collect()
    assert rows[0]["neg"] and rows[1]["pos"] and rows[2]["nl"]
    for tok, exp in (
        ("CriOS/120.0", "Chrome Mobile iOS"),
        ("FxiOS/121.0", "Firefox iOS"),
        ("EdgiOS/120.0", "Edge Mobile"),
    ):
        r = kql(
            spark,
            "print f = tostring(parse_json(parse_user_agent("
            f"'Mozilla/5.0 (iPhone) AppleWebKit {tok} Mobile"
            " Safari/604.1', 'browser')).Browser.Family)",
        ).collect()[0]
        assert r["f"] == exp, (tok, r["f"])
    r = kql(
        spark,
        "datatable(t: timespan) [1h, 30m]"
        " | summarize s = sum(t) | project m = s / 30m",
    ).collect()[0]
    assert r["m"] == 3.0
    r = kql(
        spark,
        "print x = 1 | extend a = dynamic(['01:00:00', '-0:30:00'])"
        " | mv-expand t_ = a to typeof(timespan)"
        " | summarize s = sum(t_) | project ok = s == 30m",
    ).collect()[0]
    assert r["ok"] is True
    # runtime totimespan(col) NUMERATOR divided by a timespan literal
    # (the make_dt_interval balanced-numerator scan)
    rows = kql(
        spark,
        "datatable(s: string) ['-01:30:00', '02:00:00']"
        " | extend m = totimespan(s) / 1m | project m",
    ).collect()
    assert [r["m"] for r in rows] == [-90.0, 120.0]
    # graph-mark-components labels nodes with the component minimum;
    # graph-to-table exports nodes/edges with the ADX default names
    rows = kql(
        spark,
        "datatable(s: long, d: long) [1, 2, 2, 3, 5, 6, 7, 7]"
        " | make-graph s --> d | graph-mark-components"
        " | graph-to-table nodes | sort by NodeId asc",
    ).collect()
    assert [(r["NodeId"], r["ComponentId"]) for r in rows] == [
        (1, 1), (2, 1), (3, 1), (5, 5), (6, 5), (7, 7),
    ]
    rows = kql(
        spark,
        "datatable(s: long, d: long, w: long) [1, 2, 10, 3, 4, 20]"
        " | make-graph s --> d | graph-to-table edges"
        " | sort by SourceId asc",
    ).collect()
    assert [(r["SourceId"], r["TargetId"], r["w"]) for r in rows] == [
        (1, 2, 10), (3, 4, 20),
    ]


def test_battery20_funnel_sequence(spark):
    """evaluate funnel_sequence (the last activity plugin): prev/next
    states around the exact greedy first occurrence, per-step window
    and total-period bounds enforced, distinct-id counts."""
    q = (
        "datatable(uid: long, t: datetime, st: string) ["
        "1, datetime(2024-01-01 10:00:00), 'login',"
        " 1, datetime(2024-01-01 10:01:00), 'view',"
        " 1, datetime(2024-01-01 10:02:00), 'click',"
        " 1, datetime(2024-01-01 10:03:00), 'buy',"
        " 1, datetime(2024-01-01 10:04:00), 'logout',"
        " 2, datetime(2024-01-01 11:00:00), 'view',"
        " 2, datetime(2024-01-01 11:01:00), 'click',"
        " 2, datetime(2024-01-01 11:02:00), 'buy',"
        " 3, datetime(2024-01-01 12:00:00), 'view',"
        " 3, datetime(2024-01-01 12:01:00), 'buy',"
        " 4, datetime(2024-01-01 13:00:00), 'search',"
        " 4, datetime(2024-01-01 13:01:00), 'view',"
        " 4, datetime(2024-01-01 13:02:00), 'click',"
        " 4, datetime(2024-01-01 13:03:00), 'buy',"
        " 4, datetime(2024-01-01 13:04:00), 'search']"
        " | evaluate funnel_sequence(uid, t, datetime(2024-01-01),"
        " datetime(2024-01-02), 10m, 1h, st,"
        " dynamic(['view', 'click', 'buy']))"
    )
    rows = kql(spark, q).collect()
    got = {(r["prev"], r["next"]): r["dcount"] for r in rows}
    assert got == {
        ("login", "logout"): 1,
        (None, None): 1,
        ("search", "search"): 1,
    }
    # a step-window violation breaks the sequence
    q2 = (
        "datatable(uid: long, t: datetime, st: string) ["
        "1, datetime(2024-01-01 10:00:00), 'view',"
        " 1, datetime(2024-01-01 10:30:00), 'click',"
        " 1, datetime(2024-01-01 10:31:00), 'buy']"
        " | evaluate funnel_sequence(uid, t, datetime(2024-01-01),"
        " datetime(2024-01-02), 10m, 1h, st,"
        " dynamic(['view', 'click', 'buy']))"
    )
    assert kql(spark, q2).count() == 0


def test_battery20_decompose_autodetect(spark):
    """series_decompose([, -1]) autodetects the period (the ADX
    default spelling — was a loud explicit-subset error): argmax
    autocorrelation over lags 2..n/2, seasonal suppressed (period 1)
    when the peak is under 0.5. On a clean period-4 signal the
    autodetected result is IDENTICAL to the explicit period-4 fit."""
    ser = ",".join(
        str(float(v)) for _ in range(5) for v in (10, 2, 5, 1)
    )
    auto = kql(
        spark,
        f"print m = dynamic([{ser}])"
        " | extend (b, s, t, res) = series_decompose(m)"
        " | project s, rmax = array_max(series_abs(res))",
    ).collect()[0]
    expl = kql(
        spark,
        f"print m = dynamic([{ser}])"
        " | extend (b, s, t, res) = series_decompose(m, 4)"
        " | project s, rmax = array_max(series_abs(res))",
    ).collect()[0]
    assert auto["s"] == expl["s"] and auto["rmax"] == expl["rmax"]
    assert auto["rmax"] < 1.0  # the periodic signal is explained
    # period-1 fallback on an aperiodic series still decomposes
    r = kql(
        spark,
        "print m = dynamic([1.0, 9.0, 2.0, 7.0, 3.5, 8.2, 0.5, 6.6])"
        " | extend (b, s, t, res) = series_decompose(m, -1)"
        " | project n = array_length(b)",
    ).collect()[0]
    assert r["n"] == 8


def test_battery19_value_checks(spark, sf_smoke):
    """Battery 19 value pins: compound join conditions keep inner-join
    cardinality, column-scoped search terms match has/equality
    semantics, and search wildcards expand instead of matching the
    star literally."""
    load(spark, sf_smoke, "events").createOrReplaceTempView("events")
    n_view = kql(
        spark, "events | where event_type == 'view' | count"
    ).collect()[0]["Count"]
    assert (
        kql(
            spark, 'search in (events) event_type:"view" | count'
        ).collect()[0]["Count"]
        == n_view
    )
    assert (
        kql(
            spark, 'search in (events) event_type=="VIEW" | count'
        ).collect()[0]["Count"]
        == n_view
    )
    # "vi*w" expands the wildcard (matches view); a non-matching
    # wildcard yields zero (the literal-star behavior matched nothing
    # either, so pin BOTH directions)
    assert (
        kql(spark, 'search in (events) "vi*w" | count').collect()[0][
            "Count"
        ]
        >= n_view
    )
    assert (
        kql(spark, 'search in (events) "qq*zz" | count').collect()[0][
            "Count"
        ]
        == 0
    )
    for q in (
        "events | take 30 | join kind=inner (events | project"
        " e2 = event_id, u2 = user_id, v2 = value) on"
        " $left.event_id == $right.e2 and $left.user_id =="
        " $right.u2 | count",
        "events | take 30 | join kind=inner (events | project"
        " event_id, u2 = user_id, v2 = value) on event_id,"
        " $left.user_id == $right.u2 | count",
        "events | take 30 | join kind=innerunique (events | project"
        " e2 = event_id, u2 = user_id) on $left.event_id =="
        " $right.e2 and $left.user_id == $right.u2 | count",
    ):
        assert kql(spark, q).collect()[0]["Count"] == 30, q


def test_battery21_ipv4_and_bag_value_checks(spark):
    """Battery 21 value pins (tenth sweep, first half): the has_ipv4
    family matches the SPECIFIC delimited address (the old form
    matched ANY valid ipv4 — '10.1.2.34' satisfied has_ipv4(text,
    '10.1.2.3'), a silent value bug), ipv4_netmask_suffix defaults to
    /32 instead of an ANSI INVALID_ARRAY_INDEX crash, bag values keep
    their JSON types through bag_remove_keys/bag_set_key, strrep
    takes a delimiter, and pack_all() keeps nulls (ADX default —
    pack_all(true) is the dropping form)."""
    pins = [
        ("print b = has_ipv4('src=10.1.2.3 dst', '10.1.2.3')", True),
        ("print b = has_ipv4('src=10.1.2.34', '10.1.2.3')", False),
        ("print b = has_ipv4('src=10.1.2.3', '10.1.2')", False),
        (
            "print b = has_ipv4_prefix('05:04:54 127.0.0.1 GET',"
            " '127.0.')",
            True,
        ),
        (
            "print b = has_ipv4_prefix('05:04:54 127.0.0.1 GET',"
            " '17.0.')",
            False,
        ),
        (
            "print b = has_any_ipv4('src 10.1.2.3', '1.2.3.4',"
            " '10.1.2.3')",
            True,
        ),
        (
            "print b = has_any_ipv4('src 10.1.2.34',"
            " dynamic(['10.1.2.3']))",
            False,
        ),
        (
            "print b = has_any_ipv4_prefix('src 10.1.2.3', '10.2.',"
            " '10.1.')",
            True,
        ),
        (
            "print b = ipv4_is_in_any_range('10.1.2.3',"
            " '192.168.0.0/16', '10.0.0.0/8')",
            True,
        ),
        (
            "print b = ipv4_is_in_any_range('11.1.2.3',"
            " dynamic(['10.0.0.0/8']))",
            False,
        ),
        ("print b = ipv4_is_in_range('10.1.2.3', '10.1.2.3')", True),
        ("print n = ipv4_netmask_suffix('10.0.0.1')", 32),
        ("print n = ipv4_netmask_suffix('192.168.1.1/24')", 24),
        ("print n = ipv4_netmask_suffix('not-an-ip')", None),
        # invalid prefix notation -> null, not 99 / not the 32
        # default (round-11 advice — ADX nulls the whole result)
        ("print n = ipv4_netmask_suffix('1.2.3.4/99')", None),
        ("print n = ipv4_netmask_suffix('1.2.3.4/abc')", None),
        ("print n = ipv4_netmask_suffix('1.2.3.4/0')", 0),
        (
            "print b = bag_remove_keys(dynamic({'a':1,'b':2}),"
            " dynamic(['a']))",
            '{"b":2}',
        ),
        (
            "print b = bag_set_key(dynamic({'a':1}), 'b', 2)",
            '{"a":1,"b":2}',
        ),
        (
            "print b = bag_set_key(dynamic({'a':1,'b':9}), 'b', 'x')",
            '{"a":1,"b":"x"}',
        ),
        ("print s = strrep('ab', 3, '-')", "ab-ab-ab"),
        ("print s = strrep('ab', 2)", "abab"),
        (
            "datatable (a: long) [1] | extend n = long(null)"
            " | extend p = pack_all(true) | project p",
            '{"a":1}',
        ),
        (
            "datatable (a: long) [1] | extend n = long(null)"
            " | extend p = pack_all() | project p",
            '{"a":1,"n":null}',
        ),
        # a column-expression ip builds the pattern at runtime
        (
            "datatable (ip: string) ['10.1.2.3'] | extend"
            " b = has_ipv4(strcat('x ', ip, ' y'), ip) | project b",
            True,
        ),
    ]
    for q, want in pins:
        got = kql(spark, q).collect()[0][0]
        assert got == want, f"{q!r}: got {got!r}, want {want!r}"


def test_battery21_partition_and_bag_structure(spark, sf_smoke):
    """Battery 21 (second half): the partition operator takes full
    subpipes (row-wise stages pass through, every summarize appends
    the key, top stays the per-key window, hints validate-and-strip),
    top-nested `with others` accepts single-quoted labels, and the
    bag accessors (bag_unpack / bag_keys / bag_has_key) work over
    stored VARIANT columns (todynamic output), not just JSON text."""
    load(spark, sf_smoke, "events").createOrReplaceTempView("events")
    n_types = kql(
        spark, "events | distinct event_type | count"
    ).collect()[0]["Count"]
    # top 2 per type, row-wise tail
    assert (
        kql(
            spark,
            "events | partition by event_type (top 2 by value"
            " | project event_type, value) | count",
        ).collect()[0]["Count"]
        == 2 * n_types
    )
    # hint accepted; a summarize that OMITS the key groups by it
    # internally but the key must NOT leak into the schema (ADX
    # returns the union of per-key outputs — aggregate columns only;
    # round-11 advice closed this silent schema divergence)
    pdf = kql(
        spark,
        "events | partition hint.strategy=shuffle by user_id"
        " (summarize c = count())",
    )
    assert pdf.columns == ["c"]
    n_users = kql(spark, "events | distinct user_id").count()
    assert len(pdf.collect()) == n_users
    # summarize then row-wise filter inside the subpipe
    m = kql(
        spark,
        "events | partition by user_id (summarize m = max(value)"
        " | where m > 50) | count",
    ).collect()[0]["Count"]
    oracle = kql(
        spark,
        "events | summarize m = max(value) by user_id"
        " | where m > 50 | count",
    ).collect()[0]["Count"]
    assert m == oracle
    with pytest.raises(ValueError, match="partition subpipe"):
        kql(spark, "events | partition by event_type (sample 3)")
    with pytest.raises(ValueError, match="unknown partition hint"):
        kql(
            spark,
            "events | partition hint.bogus=1 by event_type"
            " (top 1 by value)",
        )
    # top-nested with others: single-quoted label == double-quoted
    for quote_form in (
        "events | top-nested 2 of event_type with others = 'rest'"
        " by c = count()",
        'events | top-nested 2 of event_type with others = "rest"'
        " by c = count()",
    ):
        rows = kql(spark, quote_form).collect()
        assert len(rows) == 3 and "rest" in {
            r["event_type"] for r in rows
        }
    # bag accessors over a stored VARIANT column
    r = kql(
        spark,
        "events | take 1 | extend d = todynamic('{\"a\": 1}')"
        " | extend k = bag_keys(d), b = bag_has_key(d, 'a'),"
        " nb = bag_has_key(d, 'z')"
        " | project n = array_length(k), b, nb",
    ).collect()[0]
    assert r["n"] == 1 and r["b"] is True and r["nb"] is False
    cols = kql(
        spark,
        "events | take 3 | extend d = todynamic(props)"
        " | project-away props | evaluate bag_unpack(d, 'p_')",
    ).columns
    assert any(c.startswith("p_") for c in cols)


def test_battery21_beta_family(spark):
    """Battery 21: beta_pdf (log-form via Lanczos ln B) and beta_inv
    (60-step bisection over the Lentz beta_cdf) — plus the
    lambda-binding guard: a composite argument (the cdf∘inv
    round-trip) must bind once instead of expanding multiplicatively
    (the unbound form planned past five minutes)."""
    from math import gamma

    r = kql(
        spark,
        "print p1 = beta_pdf(0.5, 2, 2),"
        " p2 = beta_pdf(0.3, 5, 1.5),"
        " i1 = beta_inv(0.5, 2, 2),"
        " c = beta_cdf(beta_inv(0.73, 3, 4), 3, 4),"
        " z = beta_inv(0.0, 2, 2), o = beta_inv(1.0, 2, 2)",
    ).collect()[0]
    assert abs(r["p1"] - 1.5) < 1e-12
    want = 0.3**4 * 0.7**0.5 / (gamma(5) * gamma(1.5) / gamma(6.5))
    assert abs(r["p2"] - want) < 1e-12
    assert abs(r["i1"] - 0.5) < 1e-12
    assert abs(r["c"] - 0.73) < 1e-9
    assert r["z"] == 0.0 and r["o"] == 1.0
    assert kql(spark, "print e = beta_pdf(1.5, 2, 2)").collect()[0][
        "e"
    ] == 0.0


def test_battery22_value_checks(spark, sf_smoke):
    """Battery 22 value pins: hash_sha512 (FIPS 'abc' vector),
    hash_many determinism, the nested-call dayofweek fold,
    geo_geohash_to_central_point (decode inverse — cell midpoint,
    stored-bag accessor path), project-reorder wildcards with
    per-pattern ordering, join hint.shufflekey/num_partitions
    accept-and-strip, and series_fit_poly exactness on polynomial
    data (deg 1 == series_fit_line; deg 2/4 recover exact
    coefficients, highest power first)."""
    load(spark, sf_smoke, "events").createOrReplaceTempView("events")
    r = kql(
        spark,
        "print s5 = hash_sha512('abc'),"
        " hm = hash_many('a', 1) == hash_many('a', 1),"
        " dwb = dayofweek(endofweek(datetime(2024-01-03))) == 6d",
    ).collect()[0]
    assert r["s5"] == (
        "ddaf35a193617abacc417349ae20413112e6fa4e89a97ea20a9eeee64b"
        "55d39a2192992a274fc1a836ba3c23a3feebbd454d4423643ce80e2a9a"
        "c94fa54ca49f"
    )
    assert r["hm"] is True and r["dwb"] is True
    # geohash decode: 'c23nb' cell midpoint; invalid input -> null
    r = kql(
        spark,
        "print p = geo_geohash_to_central_point('c23nb'),"
        " bad = geo_geohash_to_central_point('ai')",
    ).collect()[0]
    assert r["bad"] is None
    assert '"coordinates":[-122.32177734375,47.61474609375]' in r["p"]
    # stored-bag accessor ride-along
    lon = kql(
        spark,
        "events | take 1 | extend p = geo_geohash_to_central_point("
        "geo_point_to_geohash(-122.3, 47.6, 8))"
        " | project lon = todouble(p.coordinates[0])",
    ).collect()[0]["lon"]
    assert abs(lon - -122.3) < 0.01
    # project-reorder wildcards
    assert kql(
        spark, "events | project-reorder value, e* granny-asc, *"
    ).columns == ["value", "event_id", "event_type", "ts", "user_id",
                  "props"]
    assert kql(spark, "events | project-reorder * desc").columns == [
        "value", "user_id", "ts", "props", "event_type", "event_id"
    ]
    with pytest.raises(ValueError, match="unknown column"):
        kql(spark, "events | project-reorder nope, *")
    # join hints accept-and-strip (shufflekey implies shuffle)
    for q in (
        "events | take 30 | join hint.shufflekey = user_id (events"
        " | project user_id, v2 = value) on user_id | count",
        "events | take 30 | join kind=inner hint.shufflekey ="
        " user_id hint.num_partitions = 8 (events | project user_id,"
        " v2 = value) on user_id | count",
    ):
        assert kql(spark, q).collect()[0]["Count"] > 0
    # series_fit_poly: exact quadratic + fit_line twin
    r = kql(
        spark,
        "print y = dynamic([0.0, 1.0, 4.0, 9.0])"
        " | extend (rs, co, v, rv, f) = series_fit_poly(y,"
        " dynamic([0.0, 1.0, 2.0, 3.0]), 2)"
        " | project rs, co, rv",
    ).collect()[0]
    assert r["rs"] == 1.0 and abs(r["rv"]) < 1e-18
    assert [round(c, 9) for c in r["co"]] == [1.0, 0.0, 0.0]
    r = kql(
        spark,
        "print y = dynamic([1.0, 2.9, 5.2, 6.9, 9.1])"
        " | extend (rs, sl, v, rv, ic, ln) = series_fit_line(y)"
        " | extend (rs2, co, v2, rv2, f) = series_fit_poly(y)"
        " | project d1 = abs(sl - co[0]), d2 = abs(ic - co[1]),"
        " d3 = abs(rs - rs2)",
    ).collect()[0]
    assert r["d1"] < 1e-9 and r["d2"] < 1e-9 and r["d3"] < 1e-9
    with pytest.raises(ValueError, match="degree"):
        kql(
            spark,
            "print y = dynamic([1.0, 2.0]) | extend (a, b, c, d, e)"
            " = series_fit_poly(y, dynamic([0.0, 1.0]), 9)",
        )


def test_battery23_value_checks(spark, sf_smoke):
    """Battery 23 value pins: ADX default aggregate names drop the
    make_ prefix (list_x / set_x / bag_x — make_list_x was a silent
    naming divergence), multi-assign arg_max/arg_min, search boolean
    term combinations (and binds tighter than or), bag_pack_columns,
    literal dynamic lists unpack inside in(), zero-row datatable,
    and the hll accuracy level mapping."""
    load(spark, sf_smoke, "events").createOrReplaceTempView("events")
    assert kql(
        spark, "events | summarize make_list(event_type)"
    ).columns == ["list_event_type"]
    assert kql(
        spark, "events | summarize make_set(value), make_bag(props)"
    ).columns == ["set_value", "bag_props"]
    assert kql(
        spark,
        "events | summarize make_list_if(event_type, value > 50),"
        " make_set_if(user_id, value > 50)",
    ).columns == ["list_event_type", "set_user_id"]
    # multi-assign arg_max: named columns, values match the plain form
    r = kql(
        spark,
        "events | summarize (t, v) = arg_max(ts, value)",
    ).collect()[0]
    p = kql(
        spark, "events | summarize arg_max(ts, value)"
    ).collect()[0]
    assert r["t"] == p["ts"] and r["v"] == p["value"]
    with pytest.raises(ValueError, match="one name per column"):
        kql(spark, "events | summarize (a) = arg_max(ts, value)")
    # search boolean combos: and/or with ADX precedence
    n_view = kql(
        spark, 'search in (events) event_type:"view" | count'
    ).collect()[0]["Count"]
    n_purch = kql(
        spark, 'search in (events) event_type:"purchase" | count'
    ).collect()[0]["Count"]
    assert (
        kql(
            spark,
            'search in (events) event_type:"view" or'
            ' event_type:"purchase" | count',
        ).collect()[0]["Count"]
        == n_view + n_purch
    )
    assert (
        kql(
            spark,
            'search in (events) "view" and "qqzz" or'
            ' event_type:"purchase" | count',
        ).collect()[0]["Count"]
        == n_purch
    )
    # bag_pack_columns keys are the column names, typed values
    b = kql(
        spark,
        "events | where event_id == 1 | extend"
        " b = bag_pack_columns(event_id, event_type) | project b",
    ).collect()[0]["b"]
    assert b.startswith('{"event_id":1,"event_type":')
    # in (dynamic([...])) unpacks the literal list
    n = kql(
        spark,
        "events | where event_type in (dynamic(['view', 'click']))"
        " | count",
    ).collect()[0]["Count"]
    m = kql(
        spark,
        "events | where event_type in ('view', 'click') | count",
    ).collect()[0]["Count"]
    assert n == m > 0
    # zero-row datatable keeps its declared schema
    df = kql(spark, "datatable (a: long, s: string) []")
    assert df.count() == 0 and df.columns == ["a", "s"]
    # hll accuracy levels map to valid sketch precisions
    for acc in (0, 4):
        d = kql(
            spark,
            f"events | summarize h = hll(user_id, {acc})"
            " | project d = dcount_hll(h)",
        ).collect()[0]["d"]
        assert d > 0
    with pytest.raises(ValueError, match="accuracy"):
        kql(spark, "events | summarize h = hll(user_id, 9)")


def test_battery24_value_checks(spark, sf_smoke):
    """Battery 24 value pins: KQL real literals are DOUBLES (bare 2.5
    parsed as Spark DECIMAL crept into results — iff(c, 1, 2.5) came
    back Decimal('1.0'), 0.1 + 0.2 folded decimal-exact where ADX
    computes IEEE doubles); `has` with a COLUMN term (runtime
    word-boundary match, \\E re-escaped); array_length/string_size
    are LONG (INT32 overflowed in downstream arithmetic where ADX
    computes — fuzz finding); union kind=inner common-column
    semantics; split 3-arg; indexof_regex; now(offset); zero-row
    datatable covered in battery 23."""
    load(spark, sf_smoke, "events").createOrReplaceTempView("events")
    r = kql(
        spark,
        "print a = iff(true, 1, 2.5), b = 0.1 + 0.2,"
        " c = round(2.567, 2)",
    ).collect()[0]
    assert r["a"] == 1.0 and isinstance(r["a"], float)
    assert r["b"] == 0.30000000000000004 and r["c"] == 2.57
    # timespan / version / datetime-fraction literals unaffected
    r = kql(
        spark,
        "print t = format_timespan(1.5h, 'hh:mm'),"
        " v = parse_version('1.2.10') > parse_version('1.2.9'),"
        " d = format_datetime(datetime(2024-01-02 10:30:00.123),"
        " 'ss.SSS')",
    ).collect()[0]
    assert r["t"] == "01:30" and r["v"] is True and r["d"] == "00.123"
    # has with a column term: exact delimited token, case rules
    rows = kql(
        spark,
        "datatable (msg: string, kw: string) ["
        "'err in disk io', 'disk', 'diskette full', 'disk',"
        "'Disk err', 'disk'] | extend h = msg has kw,"
        " hc = msg has_cs kw | project msg, h, hc",
    ).collect()
    got = {r["msg"]: (r["h"], r["hc"]) for r in rows}
    assert got["err in disk io"] == (True, True)
    assert got["diskette full"] == (False, False)
    assert got["Disk err"] == (True, False)
    # array_length is LONG: the overflow chain computes
    r = kql(
        spark,
        "print a = pack_array(1, 2, 3) | extend"
        " v = array_length(a) * 16843009 * 1000 | project v",
    ).collect()[0]
    assert r["v"] == 3 * 16843009 * 1000
    # union kind=inner keeps only the common columns
    assert kql(
        spark,
        "union kind=inner (events | project event_id, value),"
        " (events | project event_id, user_id)",
    ).columns == ["event_id"]
    # split with requestedIndex; indexof_regex; now(offset)
    r = kql(
        spark,
        "print s = tostring(split('a,b,c', ',', 1)),"
        " i = indexof_regex('abc123', '[0-9]+'),"
        " n = now(-1d) < now()",
    ).collect()[0]
    assert "b" in r["s"] and r["i"] == 3 and r["n"] is True


def test_battery25_value_checks(spark, sf_smoke):
    """Battery 25 value pins: to*() conversions yield NULL on
    malformed strings (toint('12.5') raised ANSI CAST_INVALID_INPUT
    where ADX returns null — to* over user data is exactly where
    garbage shows up), and stored-dynamic accessor chains accept
    bracket STRING keys (d['k'] / d['a b'] on VARIANT and string
    bags — was INVALID_EXTRACT), composing with dots and numeric
    indexes."""
    load(spark, sf_smoke, "events").createOrReplaceTempView("events")
    r = kql(
        spark,
        "print a = isnull(toint('12.5')), b = isnull(tolong('abc')),"
        " c = todouble('2.5'), d = toint('0x1A'),"
        " e = tolong(2.9)",
    ).collect()[0]
    assert r["a"] is True and r["b"] is True
    assert r["c"] == 2.5 and r["d"] == 26 and r["e"] == 2
    r = kql(
        spark,
        "events | take 1 | extend d = todynamic("
        "'{\"k\": \"v\", \"a b\": 2, \"n\": {\"m\": [5, 6]}}')"
        " | extend x = tostring(d['k']), y = toint(d['a b']),"
        " z = toint(d.n.m[1]), w = toint(d['n'].m[0])"
        " | project x, y, z, w",
    ).collect()[0]
    assert (r["x"], r["y"], r["z"], r["w"]) == ("v", 2, 6, 5)
    # string-typed bags take the same bracket path
    r = kql(
        spark,
        "events | take 1 | extend s = '{\"k\": 7}'"
        " | extend x = toint(s['k']) | project x",
    ).collect()[0]
    assert r["x"] == 7


def test_battery26_value_checks(spark, sf_smoke):
    """Battery 26 value pins: todatetime parses the common .NET date
    spellings (US slash dates, 12-hour AM/PM, compact yyyyMMdd,
    RFC-1123 — all returned null here while ADX parses them; ISO and
    timestamp passthrough unchanged), substring clamps a negative
    start to 0 (Spark's from-the-end negative start returned 'o' for
    substring('hello', -2) where ADX returns 'hello'), reduce accepts
    `with threshold=/characters=` tuning knobs, and true-array
    subscripts take RUNTIME index expressions (a[i] with i = -1 was
    an ANSI INVALID_ARRAY_INDEX crash; from-end and out-of-range-null
    now match the literal-subscript contract)."""
    load(spark, sf_smoke, "events").createOrReplaceTempView("events")
    r = kql(
        spark,
        "print a = format_datetime(todatetime('1/2/2024'),"
        " 'yyyy-MM-dd'),"
        " b = format_datetime(todatetime('1/2/2024 3:45 PM'),"
        " 'HH:mm'),"
        " c = format_datetime(todatetime("
        "'Tue, 02 Jan 2024 10:00:00 GMT'), 'HH'),"
        " d = format_datetime(todatetime('20240102'), 'MM-dd'),"
        " e = isnull(todatetime('garbage')),"
        " f = format_datetime(todatetime('2024-01-02 10:30:00'),"
        " 'HH:mm')",
    ).collect()[0]
    assert r["a"] == "2024-01-02" and r["b"] == "15:45"
    assert r["c"] == "10" and r["d"] == "01-02"
    assert r["e"] is True and r["f"] == "10:30"
    ok = kql(
        spark,
        "events | take 1 | extend d = todatetime(ts)"
        " | project ok = d == ts",
    ).collect()[0]["ok"]
    assert ok is True
    r = kql(
        spark,
        "print s = substring('hello', -2),"
        " t = substring('hello', 1, 3)",
    ).collect()[0]
    assert r["s"] == "hello" and r["t"] == "ell"
    assert (
        kql(
            spark,
            "datatable (s: string) ['aa1', 'aa2'] | reduce by s"
            " with threshold = 0.1 | count",
        ).collect()[0]["Count"]
        == 1
    )
    r = kql(
        spark,
        "events | take 1 | extend a = pack_array(1, 2, 3)"
        " | extend i = toint(-1), j = toint(1), k = toint(9)"
        " | extend v1 = toint(a[i]), v2 = toint(a[j]),"
        " v3 = isnull(a[k]), v4 = toint(a[j - 1])"
        " | project v1, v2, v3, v4",
    ).collect()[0]
    assert (r["v1"], r["v2"], r["v3"], r["v4"]) == (3, 2, True, 1)


def test_battery27_value_checks(spark, sf_smoke):
    """Battery 27 value pins: parse_xml accessor chains (xpath-
    compiled element/attribute/index steps; the bare bag form stays
    loud), tabular function-let DEFAULT parameters (`f()` standalone
    binds the declared default pipe; scalar extras fill from their
    own defaults; piping into `| invoke f()` still wins), and bare
    numeric argument substitution keeps integer-literal grammar slots
    (`take n`) parseable."""
    load(spark, sf_smoke, "events").createOrReplaceTempView("events")
    r = kql(
        spark,
        "print a = parse_xml('<a><b>1</b></a>').a.b,"
        " b = parse_xml('<a><b attr=\"z\">1</b></a>').a.b['@attr'],"
        " c = parse_xml('<a><b>1</b><b>2</b></a>').a.b[1],"
        " d = toint(parse_xml('<r><n><x>42</x></n></r>').r.n.x)",
    ).collect()[0]
    assert (r["a"], r["b"], r["c"], r["d"]) == ("1", "z", "2", 42)
    with pytest.raises(ValueError, match="accessor chains only"):
        kql(spark, "print v = parse_xml('<a/>')")
    assert (
        kql(
            spark,
            "let f = (T: (value: real) = (events | take 5))"
            " { T | count }; f()",
        ).collect()[0]["Count"]
        == 5
    )
    assert (
        kql(
            spark,
            "let f = (T: (*) = (events | take 4), n: long = 2)"
            " { T | take n }; f() | count",
        ).collect()[0]["Count"]
        == 2
    )
    assert (
        kql(
            spark,
            "let f = (T: (value: real) = (events | take 5))"
            " { T | count }; events | take 3 | invoke f()",
        ).collect()[0]["Count"]
        == 3
    )
    assert (
        kql(
            spark,
            "let f = (T: (*), n: long = 2) { T | take n };"
            " events | invoke f(3) | count",
        ).collect()[0]["Count"]
        == 3
    )
    with pytest.raises(ValueError, match="declares no default"):
        kql(spark, "let g = (T: (*)) { T | count }; g()")
    # dynamic_to_json: canonical key sort at every level (the variant
    # round-trip); null on non-JSON input
    r = kql(
        spark,
        "print a = dynamic_to_json(dynamic({'b': 2, 'a':"
        " {'z': 1, 'y': [3]}})),"
        " b = dynamic_to_json(parse_json('[3, 1, {\"q\": 1}]')),"
        " c = isnull(dynamic_to_json('not json'))",
    ).collect()[0]
    assert r["a"] == '{"a":{"y":[3],"z":1},"b":2}'
    assert r["b"] == '[3,1,{"q":1}]' and r["c"] is True


def test_battery28_value_checks(spark, sf_smoke):
    """Battery 28 (docs-shaped composite sweep) value pins: the
    dayofweek ==Nd / ÷1d folds now run at _expr's head so a bin()
    argument still matches (previously _bin_to_sql exploded the call
    past the fold regex's depth and the everyday dashboard label
    `tostring(dayofweek(bin(ts, 1d)) / 1d)` failed on interval
    typing); plain/nested spellings unchanged."""
    load(spark, sf_smoke, "events").createOrReplaceTempView("events")
    r = kql(
        spark,
        "events | take 1 | extend d = dayofweek(bin(ts, 1d)) / 1d"
        " | project ok = d >= 0 and d <= 6",
    ).collect()[0]
    assert r["ok"] is True
    assert (
        kql(spark, "print d = dayofweek(datetime(2024-01-03)) / 1d")
        .collect()[0]["d"]
        == 3.0
    )
    assert (
        kql(
            spark,
            "print b = dayofweek(endofweek(datetime(2024-01-03)))"
            " == 6d",
        ).collect()[0]["b"]
        is True
    )
    # the composite dashboard-label shape end-to-end
    rows = kql(
        spark,
        "events | extend label = strcat("
        "format_datetime(bin(ts, 1d), 'MM-dd'), ' (',"
        " tostring(dayofweek(bin(ts, 1d)) / 1d), ')')"
        " | summarize c = count() by label | top 3 by c",
    ).collect()
    assert len(rows) == 3 and all("(" in r["label"] for r in rows)
    # the stress sweep then found depth 4 past the widened regex —
    # the fold now uses a balanced paren scan (any depth), with
    # reversed operand order and string spans protected
    r = kql(
        spark,
        "print a = dayofweek(startofday(bin(endofday("
        "datetime(2024-01-03)), 1d))) / 1d,"
        " b = 3d == dayofweek(datetime(2024-01-03)),"
        " s = 'dayofweek(x) == 3d'",
    ).collect()[0]
    assert r["a"] == 3.0 and r["b"] is True
    assert r["s"] == "dayofweek(x) == 3d"
    # format_ipv4 invalid-input contract (long-fuzz finding): out of
    # range / unparseable -> EMPTY string (ADX), null stays null; a
    # negative previously formatted as garbage negative octets
    r = kql(
        spark,
        "print a = format_ipv4(16843009), b = format_ipv4(-1),"
        " c = format_ipv4(4294967296), d = format_ipv4('zz'),"
        " e = isnull(format_ipv4(long(null)))",
    ).collect()[0]
    assert r["a"] == "1.1.1.1" and r["b"] == "" and r["c"] == ""
    assert r["d"] == "" and r["e"] is True
    # tostring NEVER returns null (long-fuzz finding): a null input
    # yields the empty string, the ADX contract
    r = kql(
        spark,
        "print a = tostring(long(null)),"
        " b = isnull(tostring(real(null))),"
        " c = tostring(parse_json('[1]')[5]), d = tostring(42)",
    ).collect()[0]
    assert r["a"] == "" and r["b"] is False
    assert r["c"] == "" and r["d"] == "42"


def test_round12_advice_value_checks(spark, sf_smoke):
    """Round-12 advice pins: tostring of a REAL renders integral
    values without the decimal tail ('3', not Spark's '3.0') via a
    typeof()-gated trim — string inputs like '1.0' are untouched and
    the null->'' contract still holds; hll with a non-literal
    accuracy raises the loud subset error instead of passing
    'x, expr' downstream as one argument."""
    r = kql(
        spark,
        "print s = tostring(3.0), t = tostring(3.5),"
        " u = tostring('1.0'), v = tostring(todouble('x')),"
        " w = tostring(310.0),"
        " lbl = tostring(dayofweek(bin(datetime(2024-01-03), 1d))"
        " / 1d)",
    ).collect()[0]
    assert r["s"] == "3" and r["t"] == "3.5" and r["u"] == "1.0"
    assert r["v"] == "" and r["w"] == "310" and r["lbl"] == "3"
    # round-13 advice: strcat/strcat_delim implicit conversions go
    # through the SAME render rule as tostring — strcat(3.0,'x')
    # must equal strcat(tostring(3.0),'x')
    r = kql(
        spark,
        "print a = strcat(3.0, 'x'), b = strcat('v', 2.5),"
        " c = strcat_delim(',', 2.0, 3.5, 'q'),"
        " d = strcat_delim('-', real(null), 4.0)",
    ).collect()[0]
    assert r["a"] == "3x" and r["b"] == "v2.5"
    assert r["c"] == "2,3.5,q" and r["d"] == "-4"
    with pytest.raises(ValueError, match="literal int"):
        kql(spark, "tbl_x | summarize h = hll(x, y) by z")
    # COLUMN-TYPE real-division evidence (verdict item 2): operands
    # real only by schema — no textual todouble/real literal — still
    # follow ADX/IEEE ÷0; int-only columns stay ANSI-loud; and the
    # sessionless translator refuses bare `+` outright (item 3)
    import math

    spark.sql(
        "SELECT CAST(10 AS DOUBLE) AS errors, CAST(0 AS DOUBLE) AS"
        " requests UNION ALL SELECT CAST(0 AS DOUBLE),"
        " CAST(0 AS DOUBLE) UNION ALL SELECT CAST(-2 AS DOUBLE),"
        " CAST(0 AS DOUBLE)"
    ).createOrReplaceTempView("r12_rdc")
    rows = kql(
        spark,
        "r12_rdc | extend rate = errors / requests"
        " | sort by errors asc | project rate",
    ).collect()
    assert rows[0]["rate"] == -math.inf
    assert rows[1]["rate"] != rows[1]["rate"]  # 0/0 -> NaN
    assert rows[2]["rate"] == math.inf
    spark.sql("SELECT 10 AS a, 0 AS b").createOrReplaceTempView(
        "r12_rdi"
    )
    with pytest.raises(Exception, match="DIVIDE_BY_ZERO"):
        kql(spark, "r12_rdi | extend r = a / b | project r").collect()
    with pytest.raises(ValueError, match="sessionless"):
        kql_to_sql("t | extend c = a + b")


def test_round12_census_value_checks(spark, sf_smoke):
    """Probe battery 29 (round-12 function-reference census,
    tools/adx_coverage.py) value pins for the census-driven
    additions: conditional moments, the codepoint inverse pair,
    xxhash64 parity, ipv6 any-range, the exact .NET mixed-endian
    GUID base64 pair, environment scalars, the data-size heuristic,
    and the bag_merge VARIANT-operand fix."""
    spark.sql(
        "SELECT 'abc' AS s, CAST(7 AS BIGINT) AS i, true AS b,"
        " '{\"a\": 1}' AS j"
        " UNION ALL SELECT 'xy', 3, false, '{\"b\": 2}'"
        " UNION ALL SELECT 'abc', 5, true, '{\"a\": 9}'"
    ).createOrReplaceTempView("r12_cv")
    r = kql(
        spark,
        "r12_cv | summarize sd = stdevif(i, b), vr = varianceif(i, b),"
        " hc = dcount_hll(hll_if(s, b))",
    ).collect()[0]
    assert abs(r["sd"] - 2 ** 0.5) < 1e-9 and r["vr"] == 2.0
    assert r["hc"] == 1
    g = "74be27de-1e4e-49d9-b579-fe0b331d3642"
    r = kql(
        spark,
        f"print b64 = base64_encode_fromguid(toguid('{g}'))"
        " | extend back = base64_decode_toguid(b64),"
        " bad = base64_decode_toguid('aGk='),"
        " hx = hash_xxhash64('x') == hash('x'),"
        " hm = hash_xxhash64('x', 100) == hash('x', 100),"
        " hr = hash_xxhash64('x', 100) >= 0"
        " and hash_xxhash64('x', 100) < 100,"
        " u = strcat_array(to_utf8('hi'), ','),"
        " m = make_string(pack_array(104, 105)),"
        " v6a = ipv6_is_in_any_range('::1', '::1/120', 'fe80::/10'),"
        " v6b = ipv6_is_in_any_range('2001:db8::1',"
        " dynamic(['::1/120'])),"
        " pr = isnotempty(current_principal()),"
        " ep = isnotempty(current_cluster_endpoint())",
    ).collect()[0]
    # 3ie+… is python base64.b64encode(uuid.UUID(g).bytes_le)
    assert r["b64"] == "3ie+dE4e2Um1ef4LMx02Qg=="
    assert r["back"] == g and r["bad"] is None
    assert r["hx"] is True and r["u"] == "104,105" and r["m"] == "hi"
    # hash_xxhash64's 2-arg form is a MODULO (same contract as
    # hash(mod)): in [0, mod), and equal to hash()'s reduction
    assert r["hm"] is True and r["hr"] is True
    assert r["v6a"] is True and r["v6b"] is False
    assert r["pr"] is True and r["ep"] is True
    r = kql(
        spark,
        "r12_cv | extend z = estimate_data_size(s, i),"
        " bm = bag_merge(parse_json(j), dynamic({'z': 5}))"
        " | where s == 'xy' | project z, bm",
    ).collect()[0]
    assert r["z"] == 10
    assert r["bm"] == '{"b":"2","z":"5"}'


def test_round12_codec_value_checks(spark, sf_smoke):
    """Census batch 2: the string-codec tail as Arrow-batched stdlib
    UDFs. Punycode pins are RFC-3492 vectors (stdlib codec IS the
    RFC); '---invalid---' is deliberately VALID punycode (empty
    extension) while 'ü' (non-ASCII) is not; gzip is deterministic
    via mtime=0; zlib/gzip decompress any standard stream;
    ipv4_range_to_cidr_list is the stdlib minimal cover."""
    from api_to_parquet_spark.queries.kql import kql_to_sql

    r = kql(
        spark,
        "print pc = punycode_from_string('académie-française')"
        " | extend back = punycode_to_string(pc),"
        " plain = punycode_from_string('plain'),"
        " okdash = punycode_to_string('---invalid---'),"
        " bad = punycode_to_string('ü'),"
        " d = punycode_domain_from_string('www.bücher.de'),"
        " dd = punycode_domain_to_string('www.xn--bcher-kva.de'),"
        " z = zlib_decompress_from_base64_string("
        "zlib_compress_to_base64_string('hello world')),"
        " g = gzip_compress_to_base64_string('hi there'),"
        " gb = gzip_decompress_from_base64_string("
        "gzip_compress_to_base64_string('hi there')),"
        " zbad = zlib_decompress_from_base64_string('!!!'),"
        " cl = ipv4_range_to_cidr_list('10.0.0.1', '10.0.0.9'),"
        " cn = ipv4_range_to_cidr_list('zz', '10.0.0.9')",
    ).collect()[0]
    assert r["pc"] == "acadmie-franaise-npb1a"
    assert r["back"] == "académie-française"
    assert r["plain"] == "plain-"  # RFC 3492: basic part + delimiter
    assert r["okdash"] == "---invalid--" and r["bad"] == ""
    assert r["d"] == "www.xn--bcher-kva.de"
    assert r["dd"] == "www.bücher.de"
    assert r["z"] == "hello world" and r["gb"] == "hi there"
    assert r["g"] == "H4sIAAAAAAACA8vIVCjJSC1KBQDsdqPjCAAAAA=="
    assert r["zbad"] == ""
    assert list(r["cl"]) == [
        "10.0.0.1/32", "10.0.0.2/31", "10.0.0.4/30", "10.0.0.8/31",
    ]
    assert r["cn"] is None
    with pytest.raises(ValueError, match="SparkSession"):
        kql_to_sql("t | extend p = punycode_from_string(s)")


def test_codec_registration_is_session_scoped(spark):
    """A FRESH session must re-register the codec UDFs. Spark's
    newSession() isolates SQL conf and registered functions, so the
    registration marker (a runtime-conf key, NOT id(spark) — CPython
    recycles object ids after GC, which could alias a dead session)
    must be absent there, and ensure_registered must actually
    register on it."""
    from api_to_parquet_spark.queries.py_codecs import (
        _MARKER_CONF,
        ensure_registered,
    )

    ensure_registered(spark)
    assert spark.conf.get(_MARKER_CONF, None) == "1"
    fresh = spark.newSession()
    try:
        # isolated conf: the marker must NOT leak from the parent
        assert fresh.conf.get(_MARKER_CONF, None) is None
        ensure_registered(fresh)
        assert fresh.conf.get(_MARKER_CONF, None) == "1"
        got = fresh.sql(
            "SELECT kql_py_punycode_enc('plain') AS p"
        ).collect()[0]["p"]
        assert got == "plain-"
    finally:
        # drop the isolated session's state reference; the shared
        # SparkContext (session-scoped fixture) stays up
        del fresh


def test_round13_div_guard_residual_edges(spark):
    """Round-13 ÷0 residuals closed: >2-division chains guard every
    step (the size-gated transform() binding keeps text linear),
    deep-parenthesized operands with a real literal outside call args
    count as real evidence, IEEE -0.0 denominators flip the infinity
    sign, and a NaN numerator over zero stays NaN. An INT-typed
    operand whose swallowed real literal sits inside a call
    (`toint(2.5) + 1`) must NOT count — that chain stays ANSI-loud
    (ADX integer division is a different operation)."""
    import math

    spark.sql(
        "SELECT CAST(8 AS DOUBLE) AS a, CAST(2 AS DOUBLE) AS b,"
        " CAST(0 AS DOUBLE) AS z, CAST('-0.0' AS DOUBLE) AS nz,"
        " CAST('NaN' AS DOUBLE) AS nn, CAST(4 AS DOUBLE) AS c,"
        " CAST(0 AS BIGINT) AS i0"
    ).createOrReplaceTempView("r13_dv")
    r = kql(
        spark,
        "r13_dv | extend r1 = a / b / c / b, r2 = a / b / z,"
        " r3 = a / nz, r4 = (0.0 - a) / nz, r5 = nn / z,"
        " r6 = 0.0 / nz, r7 = ((a + (b * c)) / b),"
        " r8 = ((a + (b * c)) / z), r9 = a / b / z / c / b"
        " | project r1, r2, r3, r4, r5, r6, r7, r8, r9",
    ).collect()[0]
    assert r["r1"] == 0.5 and r["r7"] == 8.0
    assert r["r2"] == math.inf and r["r8"] == math.inf
    assert r["r9"] == math.inf
    assert r["r3"] == -math.inf and r["r4"] == math.inf
    assert math.isnan(r["r5"]) and math.isnan(r["r6"])
    with pytest.raises(Exception, match="DIVIDE_BY_ZERO"):
        kql(
            spark,
            "r13_dv | extend x = (toint(2.5) + 1) / i0 | project x",
        ).collect()


def test_literal_subscript_scanner_edges():
    """Round-13 (seed-90210 fuzz find): literal subscripts rewrite to
    try_element_at via a bracket-aware LEFT SCAN — any call-argument
    nesting depth (the old bounded regex silently left Spark-native
    [] on deep operands, an ANSI crash on empty arrays where ADX
    yields null). Pure translation-text pins; the accessor-path and
    string-literal exclusions must hold."""
    from api_to_parquet_spark.queries.kql import (
        _rewrite_literal_subscripts as R,
    )

    cases = [
        ("arr[0]", "try_element_at(arr, 1)"),
        ("arr[-1]", "try_element_at(arr, -1)"),
        ("split(s, ',')[1]", "try_element_at(split(s, ','), 2)"),
        ("ea_[0][1]", "try_element_at(try_element_at(ea_, 1), 2)"),
        # parse_json non-negative stays native: the JSON accessor
        # path (which runs later) owns it
        ("parse_json(x)[0]", "parse_json(x)[0]"),
        (
            "parse_json(x)[-2]",
            "try_element_at(try_cast(parse_json(x)"
            " AS ARRAY<VARIANT>), -2)",
        ),
        ("'a[0]'", "'a[0]'"),
        # deep nesting with an embedded bracketed string literal
        (
            "f(g(h(s, 'x[1]'), 2))[0]",
            "try_element_at(f(g(h(s, 'x[1]'), 2)), 1)",
        ),
        ("x + (a)[0]", "x + try_element_at((a), 1)"),
        # string-key bracket chains belong to the accessor path
        ("b['coordinates'][0]", "b['coordinates'][0]"),
        (
            "parse_json(f(x))['coordinates'][1]",
            "parse_json(f(x))['coordinates'][1]",
        ),
        (
            "arr[1][0] + brr[2]",
            "try_element_at(try_element_at(arr, 2), 1)"
            " + try_element_at(brr, 3)",
        ),
    ]
    for src, want in cases:
        assert R(src) == want, (src, R(src))


def test_rdiv_pregate_masks_string_literals(spark, monkeypatch):
    """Round-13 advice: the column-type ÷0 pre-gate must not pay a
    Catalyst schema probe for slashes that live only inside string
    literals (date patterns, URLs/paths) — the 'queries without the
    idiom never pay the probe' contract. A bare identifier division
    still probes."""
    import api_to_parquet_spark.queries.kql as K

    calls: list[str] = []

    def _counting_afields(s, sql):
        calls.append(sql)
        return []

    monkeypatch.setattr(K, "_afields", _counting_afields)
    tok1 = K._ACTIVE_CTX.set((spark, None))
    tok2 = K._STAGE_CHILD.set("SELECT 1 AS x")
    try:
        for lit_only in (
            "format_datetime(ts, 'yyyy/MM/dd')",
            "strcat('http://a/b', name)",
            'split(p, "/c/d")',
        ):
            assert K._rdiv_schema_reals(lit_only) == frozenset()
        assert calls == []
        K._rdiv_schema_reals("a / b")
        assert len(calls) == 1
    finally:
        K._ACTIVE_CTX.reset(tok1)
        K._STAGE_CHILD.reset(tok2)


def test_out_of_subset_loud_contract(spark, sf_smoke):
    """The documented out-of-subset tail must stay LOUD — every item
    raises with a message naming the limitation (an analysis-level
    UNRESOLVED_ROUTINE for unimplemented scalar functions is the
    same contract: loud at first use, never a silent mistranslation).
    Round-11 close regression pins."""
    load(spark, sf_smoke, "events").createOrReplaceTempView("events")
    for q, pat in [
        ("events | consume decodeblocks=true", "out of subset"),
        (
            "events | take 50 | make-graph user_id --> event_id"
            " | graph-match (a)-[e*1..99]->(b) project x = a",
            "variable-length bounds",
        ),
        ("externaldata (a: long) [ unquoted ]", "must be quoted"),
        (
            "events | top-nested 2 of event_type with others = 'r'"
            " by count(), top-nested 1 of user_id by count()",
            "single-level form only",
        ),
        (
            "events | serialize rn = row_number() | take 1",
            "preceding sort by",
        ),
        ("events | take 2 | evaluate narrow()", "preceding sort by"),
        (
            "events | facet by event_type with (take 1)",
            "documented subset",
        ),
        ("print v = parse_xml('<a/>')", "accessor chains only"),
    ]:
        with pytest.raises(ValueError, match=pat):
            kql(spark, q).collect()
    # treepath/cursor_current joined the actionable-loud tail in
    # round 13 (verdict item 2: census unresolved=0) — a ValueError
    # naming the limitation, never a Spark UNRESOLVED_ROUTINE leak
    for q in (
        "print s = treepath(dynamic({'a': 1}))",
        "print c = cursor_current()",
    ):
        with pytest.raises(ValueError, match="out of subset"):
            kql(spark, q).collect()
    # …while a truly UNKNOWN function name still surfaces Spark's loud
    # UNRESOLVED_ROUTINE (the "anything else" contract)
    from pyspark.errors import AnalysisException

    with pytest.raises(AnalysisException, match="UNRESOLVED_ROUTINE"):
        kql(spark, "print s = zz_no_such_fn(1)").collect()
