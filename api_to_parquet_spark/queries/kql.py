"""KQL pipe-query frontend: the reference's user-facing query language,
answered natively by Spark SQL.

The reference's POST /query forwards raw KQL to an Azure Data Explorer
pool (/root/reference/src/main.go:88-116); its committed queries are KQL
pipes (`OmyaData | take 100`, `TelemetryData | count` —
tests/test.http:49,62). A user switching to this engine keeps those
queries: `kql(spark, text)` translates a KQL *subset* to Spark SQL over
the registered lake views and executes it in-engine.

Supported pipe operators (the committed shapes plus the everyday core):

    T | where <expr>            -> WHERE        (==, !=, and, or, not,
                                                 in, contains, startswith)
    T | project c1, c2=expr     -> SELECT
    T | extend c=expr           -> SELECT *, expr AS c
    T | summarize a=agg(x), ... [by g1, bin(ts, 1h), ...]
                                -> GROUP BY     (count/dcount/sum/avg/
                                                 min/max/percentile ->
                                                 percentile_approx —
                                                 KQL's is approximate
                                                 too; bin -> epoch
                                                 floor)
    T | project-away c1, c2     -> SELECT * EXCEPT (c1, c2)
    T | mv-expand c             -> LATERAL VIEW explode(c)
    T | join kind=k (T2|…) on c -> JOIN/LEFT/RIGHT/FULL/SEMI/ANTI USING (c)
                                   (innerunique maps to inner — divergence
                                   documented: no left-side key dedup)
    T | top N by c [asc|desc]   -> ORDER BY c LIMIT N
    T | sort by c [asc|desc]    -> ORDER BY
    T | take N / limit N        -> LIMIT
    T | count                   -> COUNT(*) AS count_
    T | distinct c1, c2         -> SELECT DISTINCT
    T | project-keep c1, c2     -> SELECT c1, c2
    T | project-rename n=old    -> SELECT * EXCEPT (old), old AS n
    T | union [kind=k] (T2|…)   -> UNION ALL   (union-compatible schemas;
                                   name-aligned null-fill not supported)
    T | parse c with "l" n:t …  -> regexp_extract per capture + cast
    let name = expr; T | …      -> scalar substitution into the pipe

Predicates additionally cover endswith, !contains, has (word-boundary
regexp — ADX tokenizes, same answer for alphanumeric terms), in/!in,
between (a .. b), isempty/isnotempty.

Anything else raises ValueError naming the operator — a deliberate
explicit-subset contract, not a silent mistranslation. Each stage wraps
the previous as a subquery; Catalyst's CollapseProject/combine-filters
rules flatten the nesting, so the physical plan is identical to the
hand-written SQL (scan with pushed filters, partial aggregates, top-k as
TakeOrderedAndProject).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

_TIMESPAN_SECONDS = {
    "s": 1,
    "m": 60,
    "h": 3600,
    "d": 86400,
}


def _strings_to_sql(text: str) -> str:
    """KQL double-quoted string literals -> SQL single-quoted."""

    def repl(m: re.Match) -> str:
        inner = m.group(1).replace("'", "''")
        return f"'{inner}'"

    return re.sub(r'"((?:[^"\\]|\\.)*)"', repl, text)


def _bin_to_sql(text: str) -> str:
    """bin(col, 1h) -> epoch-floor timestamp bucketing (works for any
    bucket width, unlike date_trunc's fixed units)."""

    def repl(m: re.Match) -> str:
        col, n, unit = m.group(1).strip(), int(m.group(2)), m.group(3)
        sec = n * _TIMESPAN_SECONDS[unit]
        return (
            f"to_timestamp(floor(unix_timestamp({col}) / {sec}) * {sec})"
        )

    return re.sub(r"bin\(([^,]+),\s*(\d+)([smhd])\)", repl, text)


def _expr(kql_expr: str) -> str:
    """Translate a KQL scalar/boolean expression to SQL."""
    e = _bin_to_sql(_strings_to_sql(kql_expr))
    # Scalar-function surface: KQL name -> Spark SQL name. The to*()
    # conversions use Spark's function-style casts (bigint()/double()/…)
    # so no balanced-paren rewriting is needed; parse_json(c).k becomes
    # a JSONPath extraction.
    e = re.sub(r"\bparse_json\((\w+)\)\.(\w+)", r"get_json_object(\1, '$.\2')", e)
    e = re.sub(r"\bstrlen\(", "length(", e)
    e = re.sub(r"\bstrcat\(", "concat(", e)
    e = re.sub(r"\biff\(", "if(", e)
    e = re.sub(r"\btolong\(", "bigint(", e)
    e = re.sub(r"\btoint\(", "int(", e)
    e = re.sub(r"\btodouble\(", "double(", e)
    e = re.sub(r"\btostring\(", "string(", e)
    e = re.sub(
        r"\bextract\(\s*('(?:[^']|'')*')\s*,\s*(\d+)\s*,\s*([^()]+)\)",
        r"regexp_extract(\3, \1, \2)",
        e,
    )
    e = re.sub(r"\bisnotempty\(([^()]+)\)", r"(\1 IS NOT NULL AND \1 <> '')", e)
    e = re.sub(r"\bisempty\(([^()]+)\)", r"(\1 IS NULL OR \1 = '')", e)
    e = re.sub(r"==", "=", e)
    e = re.sub(r"!=", "<>", e)
    e = re.sub(
        r"\bbetween\s*\(\s*(.+?)\s*\.\.\s*(.+?)\s*\)",
        r"BETWEEN \1 AND \2",
        e,
        flags=re.IGNORECASE,
    )
    e = re.sub(r"\s+!in\s+", " NOT IN ", e, flags=re.IGNORECASE)
    e = re.sub(
        r"(\S+)\s+!contains\s+('(?:[^']|'')*')",
        r"\1 NOT LIKE concat('%', \2, '%')",
        e,
        flags=re.IGNORECASE,
    )
    e = re.sub(
        r"(\S+)\s+contains\s+('(?:[^']|'')*')",
        r"\1 LIKE concat('%', \2, '%')",
        e,
        flags=re.IGNORECASE,
    )
    e = re.sub(
        r"(\S+)\s+startswith\s+('(?:[^']|'')*')",
        r"\1 LIKE concat(\2, '%')",
        e,
        flags=re.IGNORECASE,
    )
    e = re.sub(
        r"(\S+)\s+endswith\s+('(?:[^']|'')*')",
        r"\1 LIKE concat('%', \2)",
        e,
        flags=re.IGNORECASE,
    )
    # KQL `has` is whole-term match (tokenized in ADX); the Spark twin is
    # a word-boundary regexp — same answer for alphanumeric terms.
    e = re.sub(
        r"(\S+)\s+has\s+('(?:[^']|'')*')",
        r"\1 RLIKE concat('\\\\b', \2, '\\\\b')",
        e,
        flags=re.IGNORECASE,
    )
    return e


def _split_top_level(text: str, sep: str = ",") -> list[str]:
    """Split on `sep` outside parentheses and quotes."""
    parts, depth, in_str, cur = [], 0, False, []
    for ch in text:
        if ch == "'" and not in_str:
            in_str = True
        elif ch == "'" and in_str:
            in_str = False
        if not in_str:
            if ch in "([":
                depth += 1
            elif ch in ")]":
                depth -= 1
            if ch == sep and depth == 0:
                parts.append("".join(cur).strip())
                cur = []
                continue
        cur.append(ch)
    if cur:
        parts.append("".join(cur).strip())
    return [p for p in parts if p]


_AGG_FNS = {"count", "dcount", "sum", "avg", "min", "max", "percentile"}


def _agg(item: str, auto_idx: int) -> str:
    """One summarize aggregate -> SQL, with KQL's default naming."""
    m = re.match(r"(?:(\w+)\s*=\s*)?(\w+)\s*\((.*)\)$", item.strip())
    if not m or m.group(2).lower() not in _AGG_FNS:
        raise ValueError(f"unsupported KQL aggregate: {item!r}")
    alias, fn, arg = m.group(1), m.group(2).lower(), m.group(3).strip()
    if fn == "count":
        sql = "COUNT(*)"
        default = "count_"
    elif fn == "dcount":
        sql = f"COUNT(DISTINCT {_expr(arg)})"
        default = f"dcount_{arg}" if re.match(r"^\w+$", arg) else f"agg{auto_idx}"
    elif fn == "percentile":
        # KQL percentile() is approximate (T-digest in ADX) — the honest
        # Spark twin is percentile_approx, same contract
        col, p = [x.strip() for x in arg.split(",", 1)]
        sql = f"percentile_approx({_expr(col)}, {float(p) / 100})"
        default = f"percentile_{col}_{p}" if re.match(r"^\w+$", col) else f"agg{auto_idx}"
    else:
        sql = f"{fn.upper()}({_expr(arg)})"
        default = f"{fn}_{arg}" if re.match(r"^\w+$", arg) else f"agg{auto_idx}"
    return f"{sql} AS {alias or default}"


def _group_alias(g: str, idx: int) -> tuple[str, str]:
    """A summarize group key -> (select item, group-by ref). Computed
    keys group by their full EXPRESSION, never the alias: when the alias
    shadows a source column (KQL names a bare bin(ts, …) key `ts`),
    `GROUP BY alias` silently resolves to the raw column and explodes
    the group count."""
    m = re.match(r"(\w+)\s*=\s*(.+)$", g)
    if m:
        return f"{_expr(m.group(2))} AS {m.group(1)}", _expr(m.group(2))
    if re.match(r"^\w+$", g):
        return g, g
    if g.startswith("bin("):
        # KQL names a bare bin() key after its column
        col = re.match(r"bin\(([^,]+),", g).group(1).strip()
        return f"{_expr(g)} AS {col}", _expr(g)
    return f"{_expr(g)} AS key{idx}", _expr(g)


_TYPE_CASTS = {"long": "BIGINT", "int": "INT", "double": "DOUBLE", "string": ""}


def _parse_to_selects(col: str, pattern: str) -> list[str]:
    """`parse <col> with [*] "lit" name:type "lit" ...` -> one
    regexp_extract per capture. ADX anchors at the string start unless
    the pattern opens with *."""
    toks = re.findall(r'"((?:[^"\\]|\\.)*)"|(\*)|(\w+)\s*:\s*(\w+)', pattern)
    regex, caps = "", []
    anchored = True
    for lit, star, name, typ in toks:
        if star:
            if not regex and not caps:
                anchored = False
            regex += ".*?"
        elif name:
            regex += "(.*?)" if typ == "string" else r"(-?[0-9.]+)"
            caps.append((name, typ))
        else:
            regex += re.escape(re.sub(r"\\(.)", r"\1", lit))
    if anchored:
        regex = "^" + regex
    regex_sql = regex.replace("\\", "\\\\").replace("'", "''")
    out = []
    for i, (name, typ) in enumerate(caps, 1):
        ex = f"regexp_extract({col}, '{regex_sql}', {i})"
        cast = _TYPE_CASTS.get(typ)
        if cast is None:
            raise ValueError(f"unsupported parse type: {typ!r}")
        # try_cast: a non-matching row extracts '' and must yield NULL
        # (ADX parse semantics), not an ANSI cast error.
        out.append(
            f"try_cast({ex} AS {cast}) AS {name}" if cast else f"{ex} AS {name}"
        )
    return out


def _apply_lets(text: str) -> str:
    """Strip leading scalar `let name = expr;` statements and substitute
    the expression (parenthesized) for each use in the query body."""
    subs = {}
    while True:
        m = re.match(r"\s*let\s+(\w+)\s*=\s*([^;]+);", text)
        if not m:
            break
        subs[m.group(1)] = m.group(2).strip()
        text = text[m.end():]
    for name, expr in subs.items():
        text = re.sub(rf"\b{re.escape(name)}\b", f"({expr})", text)
    return text


def kql_to_sql(kql: str) -> str:
    """Translate a KQL pipe query to one Spark SQL statement."""
    kql = _apply_lets(" ".join(kql.split()))
    stages = _split_top_level(" ".join(kql.split()), "|")
    if not stages or not re.match(r"^\w+$", stages[0]):
        raise ValueError(f"KQL must start with a table name: {kql!r}")
    sql = f"SELECT * FROM {stages[0]}"
    for i, stage in enumerate(stages[1:], 1):
        words = stage.split(None, 1)
        op = words[0].lower()
        body = words[1] if len(words) > 1 else ""
        prev = f"({sql}) AS _s{i}"
        if op in ("take", "limit"):
            sql = f"SELECT * FROM {prev} LIMIT {int(body)}"
        elif op == "count":
            sql = f"SELECT COUNT(*) AS count_ FROM {prev}"
        elif op == "where":
            sql = f"SELECT * FROM {prev} WHERE {_expr(body)}"
        elif op == "project":
            items = []
            for c in _split_top_level(_strings_to_sql(body)):
                m = re.match(r"(\w+)\s*=\s*(.+)$", c)
                items.append(
                    f"{_expr(m.group(2))} AS {m.group(1)}" if m else _expr(c)
                )
            sql = f"SELECT {', '.join(items)} FROM {prev}"
        elif op == "extend":
            items = []
            for c in _split_top_level(_strings_to_sql(body)):
                m = re.match(r"(\w+)\s*=\s*(.+)$", c)
                if not m:
                    raise ValueError(f"extend needs name=expr: {c!r}")
                items.append(f"{_expr(m.group(2))} AS {m.group(1)}")
            sql = f"SELECT *, {', '.join(items)} FROM {prev}"
        elif op == "summarize":
            parts = re.split(r"\bby\b", body, maxsplit=1)
            aggs = [
                _agg(a, j)
                for j, a in enumerate(_split_top_level(parts[0]))
            ]
            if len(parts) == 2:
                pairs = [
                    _group_alias(g.strip(), j)
                    for j, g in enumerate(_split_top_level(parts[1]))
                ]
                sel = ", ".join([p[0] for p in pairs] + aggs)
                grp = ", ".join(p[1] for p in pairs)
                sql = f"SELECT {sel} FROM {prev} GROUP BY {grp}"
            else:
                sql = f"SELECT {', '.join(aggs)} FROM {prev}"
        elif op == "top":
            m = re.match(r"(\d+)\s+by\s+(.+)$", body, re.IGNORECASE)
            if not m:
                raise ValueError(f"top needs 'N by col': {body!r}")
            order = m.group(2).strip()
            if not re.search(r"\b(asc|desc)$", order, re.IGNORECASE):
                order += " DESC"  # KQL top defaults to descending
            sql = f"SELECT * FROM {prev} ORDER BY {_expr(order)} LIMIT {m.group(1)}"
        elif op == "sort" or op == "order":
            body = re.sub(r"^by\s+", "", body, flags=re.IGNORECASE)
            orders = []
            for o in _split_top_level(body):
                if not re.search(r"\b(asc|desc)$", o, re.IGNORECASE):
                    o += " DESC"  # KQL sort defaults to descending
                orders.append(_expr(o))
            sql = f"SELECT * FROM {prev} ORDER BY {', '.join(orders)}"
        elif op == "mv-expand":
            c = body.strip()
            if not re.match(r"^\w+$", c):
                raise ValueError(f"mv-expand needs a column name: {body!r}")
            sql = (
                f"SELECT * EXCEPT ({c}, _mv), _mv AS {c} FROM {prev} "
                f"LATERAL VIEW explode({c}) _t AS _mv"
            )
        elif op == "join":
            m = re.match(
                r"(?:kind\s*=\s*(\w+)\s+)?\((.+)\)\s+on\s+(.+)$", body,
                re.IGNORECASE | re.DOTALL,
            )
            if not m:
                raise ValueError(f"join needs [kind=k] (pipe) on cols: {body!r}")
            kind = (m.group(1) or "inner").lower()
            # KQL's default is innerunique (left side deduped on the key);
            # we map it — and inner — to a plain inner join, documented
            # divergence for the dedup-on-key nuance.
            joins = {
                "inner": "JOIN",
                "innerunique": "JOIN",
                "leftouter": "LEFT JOIN",
                "rightouter": "RIGHT JOIN",
                "fullouter": "FULL JOIN",
                "leftsemi": "LEFT SEMI JOIN",
                "leftanti": "LEFT ANTI JOIN",
                "anti": "LEFT ANTI JOIN",
            }
            if kind not in joins:
                raise ValueError(f"unsupported join kind: {kind!r}")
            right = kql_to_sql(m.group(2).strip())
            keys = ", ".join(
                k.strip() for k in _split_top_level(m.group(3))
            )
            sql = (
                f"SELECT * FROM {prev} {joins[kind]} ({right}) AS _r{i} "
                f"USING ({keys})"
            )
        elif op == "project-away":
            cols = ", ".join(
                c.strip() for c in _split_top_level(body)
            )
            sql = f"SELECT * EXCEPT ({cols}) FROM {prev}"
        elif op == "project-keep":
            cols = ", ".join(c.strip() for c in _split_top_level(body))
            sql = f"SELECT {cols} FROM {prev}"
        elif op == "project-rename":
            pairs = []
            for c in _split_top_level(body):
                m = re.match(r"(\w+)\s*=\s*(\w+)$", c)
                if not m:
                    raise ValueError(f"project-rename needs new=old: {c!r}")
                pairs.append((m.group(1), m.group(2)))
            olds = ", ".join(o for _, o in pairs)
            renames = ", ".join(f"{o} AS {n}" for n, o in pairs)
            sql = f"SELECT * EXCEPT ({olds}), {renames} FROM {prev}"
        elif op == "union":
            m = re.match(
                r"(?:kind\s*=\s*\w+\s+)?(?:\((.+)\)|(\w+))\s*$", body,
                re.IGNORECASE | re.DOTALL,
            )
            if not m:
                raise ValueError(f"union needs (pipe) or a table: {body!r}")
            right = kql_to_sql((m.group(1) or m.group(2)).strip())
            # KQL union aligns columns by NAME (kind=outer null-fills);
            # union-compatible schemas are required here — the common
            # same-shape case — and mismatches fail loudly at analysis.
            sql = f"SELECT * FROM {prev} UNION ALL ({right})"
        elif op == "parse":
            m = re.match(
                r"(?:kind\s*=\s*simple\s+)?(\w+)\s+with\s+(.+)$", body,
                re.IGNORECASE | re.DOTALL,
            )
            if not m:
                raise ValueError(f"parse needs '<col> with <pattern>': {body!r}")
            selects = _parse_to_selects(m.group(1), m.group(2))
            sql = f"SELECT *, {', '.join(selects)} FROM {prev}"
        elif op == "distinct":
            cols = ", ".join(
                _expr(c) for c in _split_top_level(_strings_to_sql(body))
            )
            sql = f"SELECT DISTINCT {cols} FROM {prev}"
        else:
            raise ValueError(f"unsupported KQL operator: {op!r}")
    return sql


def kql(spark: SparkSession, text: str) -> DataFrame:
    """Execute a KQL pipe query against registered views — the drop-in
    for the reference's POST /query body."""
    return spark.sql(kql_to_sql(text))


# --- Synapse serverless-SQL shim: the reference README's OTHER committed
# query dialect (README.md:94-99) — `SELECT TOP 100 * FROM OPENROWSET(
# BULK '<url>/<source>/Y/M/D/H/*.parquet', FORMAT='PARQUET') AS data`.
# Two T-SQL-isms separate it from Spark SQL: TOP n (→ LIMIT n) and
# OPENROWSET over a blob URL (→ a parquet scan of the same wildcard path
# under the local lake root). Everything else passes through to
# spark.sql, and the wildcard partition path prunes exactly like the
# reference promises ("efficient lookups", README.md:5): Spark globs the
# directories before reading a single footer.


def synapse_sql(spark: SparkSession, text: str, lake_root: str) -> DataFrame:
    """Run a Synapse OPENROWSET query verbatim against the local lake:
    blob-URL prefixes (https://account.blob.core.windows.net/container/
    or abfss://...) are remapped onto lake_root, preserving the
    source/Y/M/D/H wildcard tail."""
    top = re.search(r"\bTOP\s+(\d+)\b", text, re.IGNORECASE)
    sql = re.sub(r"\bTOP\s+\d+\b", "", text, flags=re.IGNORECASE)

    def repl(m: re.Match) -> str:
        url = m.group(1)
        tail = re.sub(r"^\w+://[^/]+/[^/]+/", "", url)  # strip scheme+host+container
        return f"parquet.`{lake_root}/{tail}`"

    sql = re.sub(
        r"OPENROWSET\s*\(\s*BULK\s*'([^']+)'\s*,\s*FORMAT\s*=\s*'PARQUET'\s*\)",
        repl,
        sql,
        flags=re.IGNORECASE | re.DOTALL,
    )
    if top:
        sql = f"{sql.strip()} LIMIT {top.group(1)}"
    return spark.sql(sql)


# --- Driver-checked query entries: the reference's committed KQL shapes
# (take, count — tests/test.http:49,62) plus the everyday pipe operators,
# each executed THROUGH the translator and value-compared against a
# hand-written DuckDB oracle. Pipes are fully ordered (tie-broken) where
# row identity matters, so the comparison is deterministic.

from api_to_parquet_spark.lake import load  # noqa: E402


def _events_view(spark: SparkSession, sf_dir: str) -> None:
    load(spark, sf_dir, "events").createOrReplaceTempView("events")


def q_kql_take(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`T | take N` — the reference's first committed query shape, with a
    where/project/sort pipe so the returned row set is deterministic."""
    _events_view(spark, sf_dir)
    return kql(
        spark,
        'events | where event_type == "view"'
        " | project event_id, user_id, ts"
        " | sort by ts asc, event_id asc | take 100",
    )


def q_kql_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`T | count` — the reference's second committed query shape."""
    _events_view(spark, sf_dir)
    return kql(spark, "events | count")


def q_kql_summarize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """where + summarize-by with bin() time bucketing, dcount, and a
    post-aggregation projection — the everyday KQL analytics pipe.

    The average is computed from exact integer cents (sum(round(v*100))
    / n, no rounding): `value` carries 2 decimals, so small-group float
    averages land EXACTLY on decimal half-ties (e.g. 102.07125) where
    Spark (HALF_UP) and DuckDB (half-to-even) round in opposite
    directions — and rounding exact ties at ANY precision keeps the
    hazard. Identical integer inputs + IEEE division are bit-identical
    across engines with no rounding at all."""
    _events_view(spark, sf_dir)
    return kql(
        spark,
        "events | where value > 50"
        " | summarize n=count(), users=dcount(user_id),"
        " cents=sum(round(value * 100)) by event_type, bin(ts, 6h)"
        " | project event_type, ts, n, users,"
        " avg_value=cents / n / 100.0",
    )


def q_kql_top(spark: SparkSession, sf_dir: str) -> DataFrame:
    """summarize then fully-ordered top-k per the KQL idiom
    (sort by n desc with key tie-break, then take)."""
    _events_view(spark, sf_dir)
    return kql(
        spark,
        "events | summarize n=count() by user_id"
        " | sort by n desc, user_id asc | take 10",
    )


def q_kql_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KQL join pipe: per-user purchase spend joined to per-user event
    counts through the translator (`join kind=inner (subpipe) on key`).
    Spend is exact integer cents (float-determinism rule)."""
    _events_view(spark, sf_dir)
    return kql(
        spark,
        'events | where event_type == "purchase"'
        " | summarize spend_cents=sum(round(value * 100)) by user_id"
        " | join kind=inner (events | summarize n_events=count() by user_id)"
        " on user_id"
        " | sort by spend_cents desc, user_id asc | take 20",
    )


def q_kql_mv_expand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KQL mv-expand (array explode) + scalar functions through the
    translator: split the props JSON into fragments, expand to rows,
    count by fragment shape."""
    _events_view(spark, sf_dir)
    return kql(
        spark,
        "events"
        ' | project event_id, parts=split(props, " ")'
        " | mv-expand parts"
        " | summarize n=count() by parts"
        " | sort by n desc, parts asc | take 50",
    )


def q_kql_scalar_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KQL scalar-function surface: parse_json dynamic access, to*()
    conversions, iff, strcat, strlen, extract — all rewritten to Spark
    built-ins by the translator (no UDFs)."""
    _events_view(spark, sf_dir)
    return kql(
        spark,
        "events | where event_id < 100"
        " | project event_id,"
        " k=tolong(parse_json(props).k),"
        ' tag=strcat(event_type, "-", tostring(event_id)),'
        ' size_bucket=iff(value > 50, "big", "small"),'
        " type_len=strlen(event_type),"
        ' digits=extract("([0-9]+)", 1, props)'
        " | sort by event_id asc",
    )


def q_kql_union_rename(spark: SparkSession, sf_dir: str) -> DataFrame:
    """let substitution + in-list/between predicates + project-rename /
    project-keep + union of two pipes, aggregated — the multi-statement
    KQL shapes an ADX dashboard tile typically combines."""
    _events_view(spark, sf_dir)
    return kql(
        spark,
        "let hi = 80;"
        ' events | where event_type in ("view", "click")'
        " | project-rename uid=user_id"
        " | project-keep uid, event_type, value"
        " | where value between (hi .. 100)"
        ' | union (events | where event_type == "purchase"'
        "          | project-rename uid=user_id"
        "          | project-keep uid, event_type, value)"
        " | summarize n=count(), users=dcount(uid) by event_type"
        " | sort by event_type asc",
    )


def q_kql_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`parse` pattern extraction (literal/capture alternation compiled
    to one anchored regexp, one regexp_extract + cast per capture)."""
    _events_view(spark, sf_dir)
    return kql(
        spark,
        'events | parse props with "{\\"k\\": " k:long "}"'
        " | summarize n=count(), sum_k=sum(k) by event_type"
        " | sort by event_type asc",
    )


QUERIES = {
    "kql_take": q_kql_take,
    "kql_count": q_kql_count,
    "kql_summarize": q_kql_summarize,
    "kql_top": q_kql_top,
    "kql_join": q_kql_join,
    "kql_mv_expand": q_kql_mv_expand,
    "kql_scalar_fns": q_kql_scalar_fns,
    "kql_union_rename": q_kql_union_rename,
    "kql_parse": q_kql_parse,
}

ORACLE = {
    "kql_take": """
        SELECT event_id, user_id, ts FROM events
        WHERE event_type = 'view'
        ORDER BY ts, event_id LIMIT 100
    """,
    "kql_count": """
        SELECT COUNT(*) AS count_ FROM events
    """,
    "kql_summarize": """
        SELECT event_type,
               epoch_ms(CAST(floor(epoch(ts) / 21600) * 21600 AS BIGINT)
                        * 1000) AS ts,
               COUNT(*) AS n, COUNT(DISTINCT user_id) AS users,
               SUM(ROUND(value * 100)) / COUNT(*) / 100.0 AS avg_value
        FROM events WHERE value > 50
        GROUP BY 1, 2
    """,
    "kql_top": """
        SELECT user_id, COUNT(*) AS n FROM events
        GROUP BY user_id ORDER BY n DESC, user_id LIMIT 10
    """,
    "kql_join": """
        WITH spend AS (
            SELECT user_id, SUM(ROUND(value * 100)) AS spend_cents
            FROM events WHERE event_type = 'purchase' GROUP BY user_id),
        cnt AS (
            SELECT user_id, COUNT(*) AS n_events FROM events GROUP BY user_id)
        SELECT user_id, spend_cents, n_events
        FROM spend JOIN cnt USING (user_id)
        ORDER BY spend_cents DESC, user_id LIMIT 20
    """,
    "kql_mv_expand": """
        WITH parts AS (
            SELECT event_id, unnest(string_split(props, ' ')) AS parts
            FROM events)
        SELECT parts, COUNT(*) AS n FROM parts GROUP BY parts
        ORDER BY n DESC, parts LIMIT 50
    """,
    "kql_union_rename": """
        SELECT event_type, COUNT(*) AS n, COUNT(DISTINCT uid) AS users
        FROM (
            SELECT user_id AS uid, event_type, value FROM events
            WHERE event_type IN ('view', 'click')
              AND value BETWEEN 80 AND 100
            UNION ALL
            SELECT user_id, event_type, value FROM events
            WHERE event_type = 'purchase')
        GROUP BY event_type ORDER BY event_type
    """,
    "kql_parse": """
        SELECT event_type, COUNT(*) AS n,
               SUM(CAST(props->>'$.k' AS BIGINT))::BIGINT AS sum_k
        FROM events GROUP BY event_type ORDER BY event_type
    """,
    "kql_scalar_fns": """
        SELECT event_id,
               CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
               event_type || '-' || CAST(event_id AS VARCHAR) AS tag,
               CASE WHEN value > 50 THEN 'big' ELSE 'small' END AS size_bucket,
               length(event_type) AS type_len,
               regexp_extract(props, '([0-9]+)', 1) AS digits
        FROM events WHERE event_id < 100
        ORDER BY event_id
    """,
}
