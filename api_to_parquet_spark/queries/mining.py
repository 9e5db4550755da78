"""Corpus/data-mining extension operators: BM25 keyword retrieval, PII
redaction, robust (median/MAD) outlier detection, bigram language-model
statistics, referential-integrity auditing, and PageRank over the
event-transition graph.

The reference (abossard/api-to-parquet) delegates every analytical
capability to Kusto/Synapse (`/root/reference/src/main.go:88-116`,
SURVEY.md §3.3); these queries extend the native replacement surface the
same way the dedup/similarity/text families do — they are the operations
a large-scale training-data / analytics pipeline runs against the lake.

Scale notes (each verified against `.explain`, see PLANS.md):
- `bm25_search`: per-term document frequencies and the corpus-size
  aggregate are broadcast single-digit-row DataFrames; the corpus is
  token-exploded exactly once map-side, and only rows containing a query
  term survive past the first filter. One shuffle (per-doc tf groupBy).
- `pii_redact`: zero shuffles — regexp redaction is pure map-side
  whole-stage-codegen work, the shape that scales linearly to 100 TB.
- `robust_outliers`: exact per-group median/MAD in integer-cent space
  (deterministic across engines); two grouped aggregates over the same
  shuffle key, then the stats rejoin the facts via broadcast (the stats
  side is |event_type| rows — the fact table is never re-shuffled).
- `bigram_lm`: bigram expansion is map-side (`transform` over a
  projected token array — interpreted-HOF rule, PLANS.md); one shuffle
  for the bigram count; unigram counts derive from the bigram counts
  (GROUP BY w1) so the corpus is scanned once.
- `fk_integrity`: each constraint is a LEFT ANTI join counting orphans;
  parent key sides are dimension tables (broadcast), so the fact scans
  stream through without shuffling.
- `pagerank_events`: the 100 TB-sized work is ONE grouped count (raw
  events → edge weights over |event_type|² rows); the power iteration
  then runs on that tiny aggregated graph with `localCheckpoint` per
  round to keep the lineage flat (`checkpoint()` on a real cluster).
"""

from __future__ import annotations

import operator
from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from api_to_parquet_spark.dedup import words
from api_to_parquet_spark.lake import load, spread

# --- BM25 --------------------------------------------------------------

BM25_TERMS = ("spark", "join", "window")  # fixed keyword query
BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOPK = 20


def _eq_term(t: str):
    """Single-parameter lambda factory for F.filter — PySpark counts a
    lambda's parameters (defaults included) to decide whether to pass
    the element index, so a `lambda x, t=t:` capture would silently
    receive (element, index)."""
    return lambda x: x == F.lit(t)


def q_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 keyword retrieval: top-20 documents for the fixed query
    {spark, join, window}. Exact integer tf/df/doclen feed a
    fixed-order float expression, so scores are bit-identical across
    engines. IDF uses the standard Robertson form
    ln(1 + (N - df + 0.5)/(df + 0.5))."""
    d = spread(load(spark, sf_dir, "documents"))
    # ONE tokenize pass, ZERO corpus shuffles for tf (round-14): the
    # fixed 3-term query means per-doc term frequencies are plain
    # map-side array-filter counts — the former explode + filter +
    # (doc, dl, token) groupBy shuffle, plus a SECOND full tokenize
    # pass for the corpus stats, collapse into one narrow per-doc
    # projection read by all three consumers. The two-step select
    # keeps a single words() evaluation (CollapseProject does not
    # inline a multiply-referenced non-cheap alias).
    per_doc = (
        d.select("doc_id", words().alias("ws"))
        .select(
            "doc_id",
            F.size("ws").alias("dl"),
            *[
                F.size(
                    F.filter("ws", _eq_term(t))
                ).cast("long").alias(f"c{i}")
                for i, t in enumerate(BM25_TERMS)
            ],
        )
    )
    # Corpus constants in ONE tiny aggregate (round-14b): per-term
    # document frequency is sum(c_i > 0) — each doc contributes at most
    # one (doc, token) row per term, so this equals the former
    # countDistinct(doc_id) per token, without its double-aggregate
    # expansion or the extra tokenize pass that fed it. The single
    # broadcast row carries n_docs, total_dl and all three dfs.
    stats = per_doc.agg(
        F.count("*").alias("n_docs"),
        F.sum("dl").alias("total_dl"),
        *[
            F.sum((F.col(f"c{i}") > 0).cast("long")).alias(f"df{i}")
            for i in range(len(BM25_TERMS))
        ],
    )

    def term_score(i: int):
        tf, df = F.col(f"c{i}"), F.col(f"df{i}")
        idf = F.log(
            F.lit(1.0)
            + (F.col("n_docs") - df + F.lit(0.5)) / (df + F.lit(0.5))
        )
        # Fixed order: idf * (tf*(k1+1)) / (tf + k1*(1-b+b*dl/avgdl))
        denom = tf + F.lit(BM25_K1) * (
            F.lit(1 - BM25_B)
            + F.lit(BM25_B)
            * F.col("dl")
            / (F.col("total_dl") / F.col("n_docs"))
        )
        return idf * (tf * F.lit(BM25_K1 + 1)) / denom

    # Per-doc score entirely MAP-SIDE: the former explode → broadcast
    # join → groupBy(doc_id) re-aggregation summed each doc's term rows
    # inside one partial (explode emits them adjacently, in term order),
    # i.e. ((s0 + s1) + s2) over the hit terms — reproduced exactly by
    # a fixed-order sum with +0.0 for missing terms (IEEE: x + 0.0 is
    # an identity on every finite x, and scores of hit terms are
    # finite-positive). The plan collapses to scan → project →
    # TakeOrdered: zero shuffles for tf, no countDistinct, and the
    # top-k never sorts the corpus.
    hit = [F.col(f"c{i}") > 0 for i in range(len(BM25_TERMS))]
    score = None
    for i in range(len(BM25_TERMS)):
        s = F.when(hit[i], term_score(i)).otherwise(F.lit(0.0))
        score = s if score is None else score + s
    n_hit = None
    for h in hit:
        c = h.cast("long")
        n_hit = c if n_hit is None else n_hit + c
    return (
        per_doc.crossJoin(F.broadcast(stats))
        .filter(reduce(operator.or_, hit))
        .select(
            "doc_id",
            F.round(score, 6).alias("bm25"),
            n_hit.alias("n_terms_hit"),
        )
        .orderBy(F.desc("bm25"), "doc_id")
        .limit(BM25_TOPK)
    )


# --- PII redaction -----------------------------------------------------

# Patterns chosen to parse identically under Java regex (Spark) and RE2
# (DuckDB): no backreferences, no lookaround.
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE = r"\+\d[\d-]{7,}\d"
PII_IP = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"


def q_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing, the compliance pass every training-data pipeline
    needs: regex-redact emails, phone numbers, and IPv4 addresses.
    The corpus tables carry no real PII, so the fixture builds a
    deterministic contact line per customer (email/phone/IP derived
    from c_custkey) and the operator redacts it — counts prove every
    planted entity was caught. Redaction order matters: emails first
    (before their dotted domains can be mistaken for IPs), then
    phones, then IPs."""
    c = load(spark, sf_dir, "customer").filter(F.col("c_custkey") < 200)
    contact = F.concat(
        F.lit("reach "),
        F.regexp_replace(F.lower("c_name"), "#", "."),
        F.lit("@example.com or +1-"),
        F.lpad((F.col("c_custkey") * 7 % 1000).cast("string"), 3, "0"),
        F.lit("-"),
        F.lpad((F.col("c_custkey") * 13 % 10000).cast("string"), 4, "0"),
        F.lit(" at "),
        (F.col("c_custkey") * 3 % 256).cast("string"),
        F.lit(".0."),
        (F.col("c_custkey") * 5 % 256).cast("string"),
        F.lit(".1"),
    )
    withpii = c.select("c_custkey", contact.alias("contact"))
    red = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace("contact", PII_EMAIL, "[EMAIL]"),
            PII_PHONE,
            "[PHONE]",
        ),
        PII_IP,
        "[IP]",
    )
    return withpii.select(
        "c_custkey",
        F.regexp_count("contact", F.lit(PII_EMAIL)).alias("n_emails"),
        F.regexp_count("contact", F.lit(PII_PHONE)).alias("n_phones"),
        F.regexp_count("contact", F.lit(PII_IP)).alias("n_ips"),
        red.alias("redacted"),
    )


# --- Robust outliers (median / MAD) ------------------------------------

MAD_K = 4.4478  # 3 * 1.4826 (normal-consistency constant), one multiply


def q_robust_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type robust outlier counts via median absolute
    deviation — the skew-resistant twin of the z-score query
    (`value_outliers`). All stats run in integer-cent space: medians
    interpolate on .5 steps, which doubles represent exactly, so both
    engines agree bit-for-bit (events.value carries 2 decimals —
    SURVEY float-determinism rule)."""
    e = load(spark, sf_dir, "events").select(
        "event_type", F.round(F.col("value") * 100, 0).cast("long").alias("cents")
    )
    med = e.groupBy("event_type").agg(F.median("cents").alias("med"))
    dev = e.join(F.broadcast(med), "event_type").withColumn(
        "adev", F.abs(F.col("cents") - F.col("med"))
    )
    mad = dev.groupBy("event_type").agg(F.median("adev").alias("mad"))
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(F.first("med") / 100.0, 4).alias("median_value"),
            F.round(F.first("mad") / 100.0, 4).alias("mad_value"),
            F.sum(
                (F.col("adev") > F.lit(MAD_K) * F.col("mad")).cast("long")
            ).alias("n_outliers"),
        )
        .orderBy("event_type")
    )


# --- Bigram language-model statistics ----------------------------------

BIGRAM_TOPK = 30


def q_bigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-30 corpus bigrams with conditional probability
    P(w2|w1) = c(w1,w2)/c(w1) — the n-gram LM statistics pass. Bigram
    expansion is map-side over a projected token array; unigram
    (context) counts are derived from the bigram counts by a second
    tiny GROUP BY, so the corpus is token-scanned exactly once."""
    d = spread(load(spark, sf_dir, "documents")).select(
        "doc_id", words().alias("ws")
    )
    pairs = d.select(
        F.explode(
            F.when(
                F.size("ws") >= 2,
                F.transform(
                    F.sequence(F.lit(1), F.size("ws") - 1),
                    lambda i: F.struct(
                        F.col("ws")[i - 1].alias("w1"), F.col("ws")[i].alias("w2")
                    ),
                ),
            ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
        ).alias("bg")
    ).select("bg.w1", "bg.w2")
    big = pairs.groupBy("w1", "w2").agg(F.count("*").alias("n_bigram"))
    uni = big.groupBy("w1").agg(F.sum("n_bigram").alias("n_context"))
    return (
        big.join(F.broadcast(uni), "w1")
        .select(
            "w1",
            "w2",
            "n_bigram",
            "n_context",
            F.round(F.col("n_bigram") / F.col("n_context"), 6).alias("p_cond"),
        )
        .orderBy(F.desc("n_bigram"), "w1", "w2")
        .limit(BIGRAM_TOPK)
    )


def q_bigram_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document cross-entropy under the corpus bigram LM with add-1
    smoothing — the classic LM-based quality filter (wikipedia-LM
    perplexity gates in C4/CCNet-style pipelines). The LM counts come
    from one corpus-wide bigram aggregate; each document's bigram
    instances then join to the counts (shuffle on (w1,w2)) and reduce
    to a per-doc mean negative log-probability. exp() is left to the
    consumer: avg-neg-logprob is monotone in perplexity and avoids
    amplifying float error."""
    d = spread(load(spark, sf_dir, "documents")).select(
        "doc_id", words().alias("ws")
    )
    pairs = d.select(
        "doc_id",
        F.explode(
            F.when(
                F.size("ws") >= 2,
                F.transform(
                    F.sequence(F.lit(1), F.size("ws") - 1),
                    lambda i: F.struct(
                        F.col("ws")[i - 1].alias("w1"), F.col("ws")[i].alias("w2")
                    ),
                ),
            ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
        ).alias("bg"),
    ).select("doc_id", "bg.w1", "bg.w2")
    # NOT persisted (round-14, measured): a persist() of the bigram
    # stream for its two consumers was interleave-A/B'd 1.05->1.23 s
    # at sf0.1 and rejected — the join-back consumer shares scan work
    # with the count side at runtime and the materialization barrier
    # costs more than the re-expansion.
    big = pairs.groupBy("w1", "w2").agg(F.count("*").alias("c2"))
    uni = big.groupBy("w1").agg(F.sum("c2").alias("c1"))
    vocab = d.select(F.explode("ws").alias("t")).agg(
        F.countDistinct("t").alias("v")
    )
    logp = F.log(
        (F.col("c2") + F.lit(1.0)) / (F.col("c1") + F.col("v"))
    )
    return (
        pairs.join(big, ["w1", "w2"])
        .join(F.broadcast(uni), "w1")
        .crossJoin(F.broadcast(vocab))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.round(-F.avg(logp), 6).alias("avg_neg_logprob"),
        )
        .filter(F.col("doc_id") < 300)
        .orderBy("doc_id")
    )


PMI_MIN_DF = 5
PMI_TOPK = 50


def q_token_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pointwise mutual information over document-level token
    co-occurrence — the classic collocation/embedding-era statistic:
    pmi(a,b) = ln(df_ab·N / (df_a·df_b)) with document frequencies as
    the probability estimates. Pair expansion is MAP-SIDE over each
    doc's sorted distinct-token array (no self-join of the token table
    on doc_id, which would shuffle the corpus and fan out identically
    anyway); all inputs are exact integers, so the score is
    bit-identical across engines. Top-50 strongest collocations with
    df_ab >= 5."""
    d = spread(load(spark, sf_dir, "documents"))
    # NOT persisted (round-14, measured): caching this lineage for its
    # two consumers was interleave-A/B'd a wash-to-loss at sf0.1
    # (0.82 vs 0.87 s) and rejected; the second tokenize pass is
    # map-side and cheaper than the materialization.
    toks = d.select(
        "doc_id", F.array_sort(F.array_distinct(words())).alias("ts")
    )
    # ordered pairs (ts[i], ts[j]) for i < j, built per row
    pairs = toks.select(
        "doc_id",
        F.explode(
            F.flatten(
                F.transform(
                    F.col("ts"),
                    lambda x, i: F.transform(
                        F.slice(F.col("ts"), i + 2, F.size("ts")),
                        lambda y: F.struct(x.alias("t1"), y.alias("t2")),
                    ),
                )
            )
        ).alias("p"),
    ).select("doc_id", "p.t1", "p.t2")
    df_ab = pairs.groupBy("t1", "t2").agg(F.count("*").alias("df_ab"))
    df_t = (
        toks.select("doc_id", F.explode("ts").alias("t"))
        .groupBy("t")
        .agg(F.count("*").alias("df"))
    )
    n_docs = d.agg(F.count("*").alias("n_docs"))
    pmi = F.log(
        F.col("df_ab") * F.col("n_docs")
        / (F.col("df_a") * F.col("df_b"))
    )
    return (
        df_ab.filter(F.col("df_ab") >= PMI_MIN_DF)
        .join(
            F.broadcast(df_t.select(F.col("t").alias("t1"), F.col("df").alias("df_a"))),
            "t1",
        )
        .join(
            F.broadcast(df_t.select(F.col("t").alias("t2"), F.col("df").alias("df_b"))),
            "t2",
        )
        .crossJoin(F.broadcast(n_docs))
        .select(
            "t1", "t2", "df_ab", "df_a", "df_b",
            F.round(pmi, 6).alias("pmi"),
        )
        .orderBy(F.desc("pmi"), "t1", "t2")
        .limit(PMI_TOPK)
    )


# --- Referential-integrity audit ---------------------------------------

_FK_CHECKS = [
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation", "n_regionkey", "region", "r_regionkey"),
]


def q_fk_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality audit over the whole star schema: for every declared
    foreign key, the child row count and the orphan count (child keys
    with no parent — LEFT ANTI join). Parent sides are dimensions and
    broadcast, so each fact table streams through map-side; the per-
    constraint results (7 single-row aggregates) union into one report."""
    out = None
    for child, fk, parent, pk in _FK_CHECKS:
        ch = load(spark, sf_dir, child)
        pa = load(spark, sf_dir, parent).select(pk)
        orphans = ch.join(F.broadcast(pa), ch[fk] == pa[pk], "left_anti")
        row = (
            ch.agg(F.count("*").alias("n_child"))
            .crossJoin(orphans.agg(F.count("*").alias("n_orphans")))
            .select(
                F.lit(f"{child}.{fk}->{parent}.{pk}").alias("fk"),
                "n_child",
                "n_orphans",
            )
        )
        out = row if out is None else out.unionByName(row)
    return out.orderBy("fk")


# --- Join-key skew report ----------------------------------------------

_SKEW_COLS = [("events", "user_id"), ("events", "event_type"),
              ("lineitem", "l_orderkey")]


def q_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pre-join planning report: per candidate join/groupBy key,
    row count, distinct keys, the heaviest key's row count and share,
    and the p99 per-key count — exactly the numbers that decide
    salting, AQE skew thresholds, and broadcast eligibility before a
    100 TB shuffle. One grouped count per key column (map-side
    combined), then a tiny stats aggregate over the count table."""
    out = None
    for table, col in _SKEW_COLS:
        per_key = (
            load(spark, sf_dir, table)
            .groupBy(col)
            .agg(F.count("*").alias("c"))
        )
        row = per_key.agg(
            F.lit(f"{table}.{col}").alias("key_col"),
            F.sum("c").alias("n_rows"),
            F.count("*").alias("n_keys"),
            F.max("c").alias("max_key_rows"),
            F.round(F.max("c") / F.sum("c"), 6).alias("top_share"),
            F.percentile("c", 0.99).alias("p99_key_rows"),
        )
        out = row if out is None else out.unionByName(row)
    return out.orderBy("key_col")


# --- Incremental aggregation (mergeable state) -------------------------

INCR_SPLIT_DAY = 15


def q_incremental_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental ETL's core claim, verified by construction: per-group
    aggregate STATE (count / sum / min / max in exact cents) built from
    the historical slice (day < 15), merged with the new batch's
    partial state (day >= 15) by re-aggregating the union of partials —
    never rescanning history. The DuckDB oracle is the full recompute
    over all rows, so the gate proves merge(old_state, batch_state) ==
    recompute(everything), which is the invariant that lets a 100 TB
    pipeline update aggregates per-batch at batch cost."""
    e = load(spark, sf_dir, "events").select(
        "event_type",
        F.dayofmonth("ts").alias("day"),
        F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
    )

    def partial(df: DataFrame) -> DataFrame:
        return df.groupBy("event_type").agg(
            F.count("*").alias("n"),
            F.sum("cents").alias("sum_cents"),
            F.min("cents").alias("min_cents"),
            F.max("cents").alias("max_cents"),
        )

    hist = partial(e.filter(F.col("day") < INCR_SPLIT_DAY))
    batch = partial(e.filter(F.col("day") >= INCR_SPLIT_DAY))
    return (
        hist.unionByName(batch)
        .groupBy("event_type")
        .agg(
            F.sum("n").alias("n"),
            F.sum("sum_cents").alias("sum_cents"),
            F.min("min_cents").alias("min_cents"),
            F.max("max_cents").alias("max_cents"),
        )
        .orderBy("event_type")
    )


# --- PageRank over the event-transition graph --------------------------

PR_DAMPING = 0.85
PR_ITERS = 20


def q_pagerank_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the event-type transition graph. The full-scale
    work is the single grouped count that collapses the raw event
    stream into edge weights (|event_type|² rows); the power iteration
    then runs on that aggregated graph — tiny by construction — with
    `localCheckpoint` per round so the logical plan stays flat
    (dedup_clusters lesson: persist() does not cut lineage). Iterative
    and not SQL-expressible: verified against a numpy power iteration
    in tests/test_mining.py instead of a DuckDB oracle."""
    from pyspark.sql import Window

    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    edges = (
        e.select("user_id", "ts", "event_id", F.col("event_type").alias("src"))
        .withColumn("dst", F.lead("src").over(w))
        .filter(F.col("dst").isNotNull())
        .groupBy("src", "dst")
        .agg(F.count("*").alias("weight"))
    )
    out_w = edges.groupBy("src").agg(F.sum("weight").alias("out_weight"))
    # Row-stochastic transition probabilities on the aggregated graph.
    trans = edges.join(out_w, "src").select(
        "src", "dst", (F.col("weight") / F.col("out_weight")).alias("p")
    ).localCheckpoint()
    nodes = trans.select(F.col("src").alias("node")).union(
        trans.select("dst")
    ).distinct().localCheckpoint()
    n = nodes.count()
    ranks = nodes.select("node", F.lit(1.0 / n).alias("rank"))
    for _ in range(PR_ITERS):
        contrib = (
            ranks.join(trans, ranks["node"] == trans["src"])
            .groupBy("dst")
            .agg(F.sum(F.col("rank") * F.col("p")).alias("inflow"))
        )
        ranks = (
            nodes.join(contrib, nodes["node"] == contrib["dst"], "left")
            .select(
                "node",
                (
                    F.lit((1 - PR_DAMPING) / n)
                    + F.lit(PR_DAMPING) * F.coalesce("inflow", F.lit(0.0))
                ).alias("rank"),
            )
            .localCheckpoint()
        )
    return ranks.select(
        "node", F.round("rank", 6).alias("rank")
    ).orderBy(F.desc("rank"), "node")


# --- Fuzzy string matching (blocked Levenshtein join) ------------------

FUZZY_MAXDIST = 3


def q_fuzzy_name_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typo-tolerant entity matching: part-name pairs within edit
    distance 3, blocked on the trailing noun so the self-join compares
    only within-block candidates (the standard scalable shape — a full
    N² cross join never materializes; at 100 TB the block key bounds
    per-task fanout). Levenshtein is exact integer output, so the
    oracle matches bit-for-bit."""
    p = load(spark, sf_dir, "part").select(
        "p_partkey",
        F.col("p_name").alias("name"),
        F.element_at(F.split("p_name", " "), -1).alias("block"),
    )
    a, b = p.alias("a"), p.alias("b")
    return (
        a.join(b, "block")
        .filter(F.col("a.p_partkey") < F.col("b.p_partkey"))
        .select(
            F.col("a.p_partkey").alias("key1"),
            F.col("b.p_partkey").alias("key2"),
            F.col("a.name").alias("name1"),
            F.col("b.name").alias("name2"),
            F.levenshtein("a.name", "b.name").alias("dist"),
        )
        .filter(
            (F.col("dist") <= FUZZY_MAXDIST) & (F.col("name1") != F.col("name2"))
        )
        .orderBy("key1", "key2")
    )


# --- Per-document token entropy ----------------------------------------


def q_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document Shannon entropy of the token distribution plus
    type-token ratio (lexical-diversity quality signals; low entropy =
    repetitive boilerplate, a standard corpus-filter feature). Token
    counts shuffle once on (doc_id, token); the entropy sum is a second
    map-side-combined aggregate on doc_id."""
    d = spread(load(spark, sf_dir, "documents"))
    counts = (
        d.select("doc_id", F.size(words()).alias("n"), F.explode(words()).alias("t"))
        .groupBy("doc_id", "n", "t")
        .agg(F.count("*").alias("c"))
    )
    p = F.col("c") / F.col("n")
    return (
        counts.groupBy("doc_id", "n")
        .agg(
            F.round(-F.sum(p * F.log(p)), 6).alias("entropy"),
            F.count("*").alias("distinct_tokens"),
        )
        .select(
            "doc_id",
            F.col("n").alias("n_tokens"),
            "distinct_tokens",
            "entropy",
            F.round(F.col("distinct_tokens") / F.col("n"), 6).alias(
                "type_token_ratio"
            ),
        )
        .filter(F.col("doc_id") < 500)
        .orderBy("doc_id")
    )


# --- BFS shortest hops (recursive CTE, same SQL on both engines) --------

BFS_START = "signup"
BFS_MAXDEPTH = 4

_BFS_SQL = f"""
    WITH RECURSIVE edges AS (
        SELECT DISTINCT src, dst FROM (
            SELECT event_type AS src,
                   lead(event_type) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id) AS dst
            FROM events) t
        WHERE dst IS NOT NULL AND dst <> src),
    walk AS (
        SELECT '{BFS_START}' AS node, 0 AS hops
        UNION ALL
        SELECT e.dst, w.hops + 1
        FROM walk w JOIN edges e ON e.src = w.node
        WHERE w.hops < {BFS_MAXDEPTH})
    SELECT node, MIN(hops) AS hops
    FROM walk GROUP BY node ORDER BY hops, node
"""


def q_shortest_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BFS shortest hop count from '{BFS_START}' over the event-type
    transition graph, written as a WITH RECURSIVE CTE (Spark 4
    recursion surface) — the IDENTICAL SQL string is the DuckDB
    oracle. The recursive fanout is depth-capped and runs on the
    DISTINCT edge set (|event_type|² rows at most), so the walk stays
    tiny no matter the raw event volume; the data-sized work is the
    one window + distinct that builds the edges."""
    load(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(_BFS_SQL)


# --- Skyline (Pareto frontier) -----------------------------------------

_SKYLINE_SQL = """
    SELECT p_partkey, p_name, p_retailprice, p_size
    FROM part p
    WHERE NOT EXISTS (
        SELECT 1 FROM part q
        WHERE q.p_retailprice <= p.p_retailprice AND q.p_size >= p.p_size
          AND (q.p_retailprice < p.p_retailprice OR q.p_size > p.p_size))
    ORDER BY p_retailprice
"""


def q_skyline_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skyline / Pareto frontier: parts not dominated on (cheaper,
    bigger). The naive NOT EXISTS dominance (kept as the oracle) plans
    a BroadcastNestedLoopJoin — O(N²) and dead at 100 TB. This
    implementation exploits that the skyline is DISTRIBUTIVE: the
    global frontier is a subset of the union of local frontiers. Three
    cheap phases: (1) per-price best size (equal-price rows below the
    max are strictly dominated); (2) bucket-local frontier via a
    running-max window PARTITIONED by a coarse price bucket — parallel,
    and it discards almost everything; (3) one global running-max pass
    over the few survivors (single partition over a tiny set), then a
    broadcast semi-join back to recover tied rows. No nested loop
    anywhere; the window in phase 3 touches only local-frontier
    survivors."""
    from pyspark.sql import Window

    p = load(spark, sf_dir, "part").select(
        "p_partkey", "p_name", "p_retailprice", "p_size"
    )
    best = p.groupBy("p_retailprice").agg(F.max("p_size").alias("best_size"))
    local_w = (
        Window.partitionBy(F.floor(F.col("p_retailprice") / 10.0))
        .orderBy("p_retailprice")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    survivors = best.withColumn(
        "run_max", F.max("best_size").over(local_w)
    ).filter(
        F.col("run_max").isNull() | (F.col("best_size") > F.col("run_max"))
    ).drop("run_max")
    global_w = Window.orderBy("p_retailprice").rowsBetween(
        Window.unboundedPreceding, -1
    )
    frontier = survivors.withColumn(
        "run_max", F.max("best_size").over(global_w)
    ).filter(
        F.col("run_max").isNull() | (F.col("best_size") > F.col("run_max"))
    )
    return (
        p.join(
            F.broadcast(frontier),
            (p["p_retailprice"] == frontier["p_retailprice"])
            & (p["p_size"] == frontier["best_size"]),
            "left_semi",
        )
        .orderBy("p_retailprice")
    )


QUERIES = {
    "bm25_search": q_bm25_search,
    "fuzzy_name_pairs": q_fuzzy_name_pairs,
    "token_entropy": q_token_entropy,
    "shortest_hops": q_shortest_hops,
    "skyline_parts": q_skyline_parts,
    "pii_redact": q_pii_redact,
    "robust_outliers": q_robust_outliers,
    "bigram_lm": q_bigram_lm,
    "bigram_perplexity": q_bigram_perplexity,
    "token_pmi": q_token_pmi,
    "fk_integrity": q_fk_integrity,
    "skew_report": q_skew_report,
    "incremental_agg": q_incremental_agg,
    "pagerank_events": q_pagerank_events,
}

_DUCK_WS = "regexp_split_to_array(trim(text), '\\s+')"
_TERMS_SQL = ", ".join(f"'{t}'" for t in BM25_TERMS)

ORACLE = {
    "fuzzy_name_pairs": f"""
        WITH p AS (
            SELECT p_partkey, p_name AS name,
                   regexp_split_to_array(p_name, ' ')[-1] AS block
            FROM part)
        SELECT a.p_partkey AS key1, b.p_partkey AS key2,
               a.name AS name1, b.name AS name2,
               levenshtein(a.name, b.name) AS dist
        FROM p a JOIN p b USING (block)
        WHERE a.p_partkey < b.p_partkey
          AND levenshtein(a.name, b.name) <= {FUZZY_MAXDIST}
          AND a.name <> b.name
        ORDER BY key1, key2
    """,
    "token_entropy": f"""
        WITH toks AS (
            SELECT doc_id, len({_DUCK_WS}) AS n, unnest({_DUCK_WS}) AS t
            FROM documents),
        counts AS (
            SELECT doc_id, n, t, COUNT(*) AS c
            FROM toks GROUP BY 1, 2, 3)
        SELECT doc_id, n AS n_tokens, COUNT(*) AS distinct_tokens,
               ROUND(-SUM((c / CAST(n AS DOUBLE)) *
                          ln(c / CAST(n AS DOUBLE))), 6) AS entropy,
               ROUND(COUNT(*) / CAST(n AS DOUBLE), 6) AS type_token_ratio
        FROM counts WHERE doc_id < 500
        GROUP BY doc_id, n ORDER BY doc_id
    """,
    "shortest_hops": _BFS_SQL,
    "skyline_parts": _SKYLINE_SQL,
    "bm25_search": f"""
        WITH toks AS (
            SELECT doc_id, len({_DUCK_WS}) AS dl,
                   unnest({_DUCK_WS}) AS token
            FROM documents),
        tf AS (
            SELECT doc_id, dl, token, COUNT(*) AS tf
            FROM toks WHERE token IN ({_TERMS_SQL})
            GROUP BY 1, 2, 3),
        dfreq AS (
            SELECT token, COUNT(DISTINCT doc_id) AS df FROM tf GROUP BY 1),
        stats AS (
            SELECT COUNT(*) AS n_docs, SUM(len({_DUCK_WS})) AS total_dl
            FROM documents)
        SELECT doc_id,
               ROUND(SUM(
                   ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))
                   * (tf * {BM25_K1 + 1}) /
                   (tf + {BM25_K1} * ({1 - BM25_B} + {BM25_B} * dl /
                        (total_dl / n_docs)))
               ), 6) AS bm25,
               COUNT(*) AS n_terms_hit
        FROM tf JOIN dfreq USING (token) CROSS JOIN stats
        GROUP BY doc_id
        ORDER BY bm25 DESC, doc_id
        LIMIT {BM25_TOPK}
    """,
    "pii_redact": f"""
        WITH withpii AS (
            SELECT c_custkey,
                   'reach ' || replace(lower(c_name), '#', '.') ||
                   '@example.com or +1-' ||
                   lpad(CAST(c_custkey * 7 % 1000 AS VARCHAR), 3, '0') || '-' ||
                   lpad(CAST(c_custkey * 13 % 10000 AS VARCHAR), 4, '0') ||
                   ' at ' || CAST(c_custkey * 3 % 256 AS VARCHAR) || '.0.' ||
                   CAST(c_custkey * 5 % 256 AS VARCHAR) || '.1' AS contact
            FROM customer WHERE c_custkey < 200)
        SELECT c_custkey,
               len(regexp_extract_all(contact, '{PII_EMAIL}')) AS n_emails,
               len(regexp_extract_all(contact, '{PII_PHONE}')) AS n_phones,
               len(regexp_extract_all(contact, '{PII_IP}')) AS n_ips,
               regexp_replace(
                   regexp_replace(
                       regexp_replace(contact, '{PII_EMAIL}', '[EMAIL]', 'g'),
                       '{PII_PHONE}', '[PHONE]', 'g'),
                   '{PII_IP}', '[IP]', 'g') AS redacted
        FROM withpii
    """,
    "robust_outliers": f"""
        WITH e AS (
            SELECT event_type,
                   CAST(ROUND(value * 100) AS BIGINT) AS cents
            FROM events),
        med AS (
            SELECT event_type, median(cents) AS med FROM e GROUP BY 1),
        dev AS (
            SELECT e.event_type, e.cents, med.med,
                   abs(e.cents - med.med) AS adev
            FROM e JOIN med USING (event_type)),
        mad AS (
            SELECT event_type, median(adev) AS mad FROM dev GROUP BY 1)
        SELECT dev.event_type,
               COUNT(*) AS n,
               ROUND(ANY_VALUE(dev.med) / 100.0, 4) AS median_value,
               ROUND(ANY_VALUE(mad.mad) / 100.0, 4) AS mad_value,
               SUM(CASE WHEN dev.adev > {MAD_K} * mad.mad
                        THEN 1 ELSE 0 END)::BIGINT AS n_outliers
        FROM dev JOIN mad USING (event_type)
        GROUP BY 1 ORDER BY 1
    """,
    "bigram_lm": f"""
        WITH docs AS (SELECT doc_id, {_DUCK_WS} AS ws FROM documents),
        pairs AS (
            SELECT ws[i] AS w1, ws[i + 1] AS w2
            FROM docs, unnest(range(1, len(ws))) AS t(i)
            WHERE len(ws) >= 2),
        big AS (
            SELECT w1, w2, COUNT(*) AS n_bigram FROM pairs GROUP BY 1, 2),
        uni AS (
            SELECT w1, SUM(n_bigram) AS n_context FROM big GROUP BY 1)
        SELECT big.w1, big.w2, big.n_bigram, uni.n_context::BIGINT AS n_context,
               ROUND(big.n_bigram / CAST(uni.n_context AS DOUBLE), 6) AS p_cond
        FROM big JOIN uni USING (w1)
        ORDER BY n_bigram DESC, w1, w2
        LIMIT {BIGRAM_TOPK}
    """,
    "token_pmi": f"""
        WITH toks AS (
            SELECT DISTINCT doc_id, unnest({_DUCK_WS}) AS t FROM documents),
        dfab AS (
            SELECT a.t AS t1, b.t AS t2, COUNT(*) AS df_ab
            FROM toks a JOIN toks b ON a.doc_id = b.doc_id AND a.t < b.t
            GROUP BY 1, 2 HAVING COUNT(*) >= {PMI_MIN_DF}),
        dft AS (SELECT t, COUNT(*) AS df FROM toks GROUP BY 1),
        n AS (SELECT COUNT(*) AS n_docs FROM documents)
        SELECT t1, t2, df_ab, da.df AS df_a, db.df AS df_b,
               ROUND(ln(df_ab * n_docs / CAST(da.df * db.df AS DOUBLE)), 6)
                   AS pmi
        FROM dfab JOIN dft da ON da.t = dfab.t1
                  JOIN dft db ON db.t = dfab.t2
        CROSS JOIN n
        ORDER BY pmi DESC, t1, t2 LIMIT {PMI_TOPK}
    """,
    "bigram_perplexity": f"""
        WITH docs AS (SELECT doc_id, {_DUCK_WS} AS ws FROM documents),
        pairs AS (
            SELECT doc_id, ws[i] AS w1, ws[i + 1] AS w2
            FROM docs, unnest(range(1, len(ws))) AS t(i)
            WHERE len(ws) >= 2),
        big AS (
            SELECT w1, w2, COUNT(*) AS c2 FROM pairs GROUP BY 1, 2),
        uni AS (
            SELECT w1, SUM(c2) AS c1 FROM big GROUP BY 1),
        vocab AS (
            SELECT COUNT(DISTINCT t) AS v
            FROM (SELECT unnest(ws) AS t FROM docs))
        SELECT doc_id, COUNT(*) AS n_bigrams,
               ROUND(-AVG(ln((c2 + 1.0) / (c1 + v))), 6) AS avg_neg_logprob
        FROM pairs JOIN big USING (w1, w2) JOIN uni USING (w1)
        CROSS JOIN vocab
        WHERE doc_id < 300
        GROUP BY doc_id ORDER BY doc_id
    """,
    "skew_report": """
        SELECT * FROM (
            SELECT 'events.user_id' AS key_col, SUM(c)::BIGINT AS n_rows,
                   COUNT(*) AS n_keys, MAX(c) AS max_key_rows,
                   ROUND(MAX(c) / CAST(SUM(c) AS DOUBLE), 6) AS top_share,
                   quantile_cont(c, 0.99) AS p99_key_rows
            FROM (SELECT user_id, COUNT(*) AS c FROM events GROUP BY 1)
            UNION ALL
            SELECT 'events.event_type', SUM(c)::BIGINT, COUNT(*), MAX(c),
                   ROUND(MAX(c) / CAST(SUM(c) AS DOUBLE), 6),
                   quantile_cont(c, 0.99)
            FROM (SELECT event_type, COUNT(*) AS c FROM events GROUP BY 1)
            UNION ALL
            SELECT 'lineitem.l_orderkey', SUM(c)::BIGINT, COUNT(*), MAX(c),
                   ROUND(MAX(c) / CAST(SUM(c) AS DOUBLE), 6),
                   quantile_cont(c, 0.99)
            FROM (SELECT l_orderkey, COUNT(*) AS c FROM lineitem GROUP BY 1)
        ) ORDER BY key_col
    """,
    "incremental_agg": """
        SELECT event_type, COUNT(*) AS n,
               SUM(CAST(ROUND(value * 100) AS BIGINT))::BIGINT AS sum_cents,
               MIN(CAST(ROUND(value * 100) AS BIGINT)) AS min_cents,
               MAX(CAST(ROUND(value * 100) AS BIGINT)) AS max_cents
        FROM events
        GROUP BY event_type ORDER BY event_type
    """,
    "fk_integrity": """
        SELECT * FROM (
            SELECT 'lineitem.l_orderkey->orders.o_orderkey' AS fk,
                   (SELECT COUNT(*) FROM lineitem) AS n_child,
                   (SELECT COUNT(*) FROM lineitem l
                    WHERE NOT EXISTS (SELECT 1 FROM orders o
                                      WHERE o.o_orderkey = l.l_orderkey))
                       AS n_orphans
            UNION ALL
            SELECT 'lineitem.l_partkey->part.p_partkey',
                   (SELECT COUNT(*) FROM lineitem),
                   (SELECT COUNT(*) FROM lineitem l
                    WHERE NOT EXISTS (SELECT 1 FROM part p
                                      WHERE p.p_partkey = l.l_partkey))
            UNION ALL
            SELECT 'lineitem.l_suppkey->supplier.s_suppkey',
                   (SELECT COUNT(*) FROM lineitem),
                   (SELECT COUNT(*) FROM lineitem l
                    WHERE NOT EXISTS (SELECT 1 FROM supplier s
                                      WHERE s.s_suppkey = l.l_suppkey))
            UNION ALL
            SELECT 'orders.o_custkey->customer.c_custkey',
                   (SELECT COUNT(*) FROM orders),
                   (SELECT COUNT(*) FROM orders o
                    WHERE NOT EXISTS (SELECT 1 FROM customer c
                                      WHERE c.c_custkey = o.o_custkey))
            UNION ALL
            SELECT 'customer.c_nationkey->nation.n_nationkey',
                   (SELECT COUNT(*) FROM customer),
                   (SELECT COUNT(*) FROM customer c
                    WHERE NOT EXISTS (SELECT 1 FROM nation n
                                      WHERE n.n_nationkey = c.c_nationkey))
            UNION ALL
            SELECT 'supplier.s_nationkey->nation.n_nationkey',
                   (SELECT COUNT(*) FROM supplier),
                   (SELECT COUNT(*) FROM supplier s
                    WHERE NOT EXISTS (SELECT 1 FROM nation n
                                      WHERE n.n_nationkey = s.s_nationkey))
            UNION ALL
            SELECT 'nation.n_regionkey->region.r_regionkey',
                   (SELECT COUNT(*) FROM nation),
                   (SELECT COUNT(*) FROM nation n
                    WHERE NOT EXISTS (SELECT 1 FROM region r
                                      WHERE r.r_regionkey = n.n_regionkey))
        ) ORDER BY fk
    """,
}
