"""Sampling operators for training-data pipelines: deterministic
train/test splits, stratified sampling, and value histograms.

Splits use content-stable hashing (md5 of the key), NOT rand(): the same
document lands in the same split on every run, on any cluster size, and
after any repartition — the property a reproducible training pipeline
needs. rand()-based splits break all three.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from api_to_parquet_spark.lake import load

TRAIN_PCT = 80


def split_bucket(key: F.Column, n_buckets: int = 100) -> F.Column:
    """Stable [0, n_buckets) bucket from md5 of the key — portable to any
    engine that has md5 (the DuckDB oracle reproduces it exactly)."""
    return (
        F.conv(F.substring(F.md5(key.cast("string")), 1, 8), 16, 10)
        .cast("long")
        % n_buckets
    )


def q_train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """80/20 train/test split of documents, deterministic by doc_id hash;
    returns per-split counts + length stats so the oracle checks both
    membership and aggregates."""
    d = load(spark, sf_dir, "documents")
    split = F.when(split_bucket(F.col("doc_id")) < TRAIN_PCT, "train").otherwise(
        "test"
    )
    return (
        d.select(split.alias("split"), "n_chars")
        .groupBy("split")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.round(F.avg("n_chars"), 4).alias("avg_chars"),
        )
    )


def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language stratified sample via the same stable hash (50% of
    'en', 10% of everything else — rebalancing a skewed corpus). Hash
    sampling keeps it deterministic AND exactly reproducible in SQL,
    unlike sampleBy(rand). Returns per-lang sampled counts."""
    d = load(spark, sf_dir, "documents")
    frac_bucket = split_bucket(F.col("doc_id"))
    keep = F.when(F.col("lang") == "en", frac_bucket < 50).otherwise(
        frac_bucket < 10
    )
    return (
        d.filter(keep)
        .groupBy("lang")
        .agg(F.count("*").alias("n_sampled"), F.min("doc_id").alias("first_doc"))
    )


def q_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram of event values via width_bucket — the
    map-side binning every data-quality dashboard needs (one narrow pass
    + one tiny shuffle on the bucket id)."""
    ev = load(spark, sf_dir, "events")
    bucket = F.width_bucket("value", F.lit(0.0), F.lit(100.0), F.lit(20))
    return (
        ev.groupBy(bucket.alias("bucket"))
        .agg(
            F.count("*").alias("n"),
            F.round(F.min("value"), 2).alias("lo"),
            F.round(F.max("value"), 2).alias("hi"),
        )
    )


WS_N = 50  # weighted-sample size


def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Priority sampling (Duffield-Lund-Thorup): weight-proportional
    sampling without replacement, reproducible from content alone. Each
    doc gets priority q = w / u with w = n_chars and u = md5-uniform of
    doc_id; the WS_N largest priorities are the sample — long documents
    are proportionally more likely, and the same corpus always yields
    the same sample (rerunnable pipelines; no rand()).

    All arithmetic is INTEGER (q computed as w * 2^32 div (h+1)), so the
    selection boundary is bit-identical across engines — a float ln()/pow
    formulation (classic Efraimidis-Spirakis) can flip boundary rows
    between libm implementations, which the oracle compare would catch.
    One narrow pass + a top-k (TakeOrderedAndProject), no shuffle."""
    d = load(spark, sf_dir, "documents")
    return (
        d.select(
            "doc_id",
            "n_chars",
            F.expr(
                f"(n_chars * {1 << 32}) div"
                " (conv(substring(md5(cast(doc_id as string)), 1, 8), 16, 10)"
                " + 1)"
            ).alias("priority"),
        )
        .orderBy(F.desc("priority"), "doc_id")
        .limit(WS_N)
    )


RPG_N = 20  # fixed sample size per group


def q_reservoir_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-SIZE sample per group (exactly RPG_N docs per language,
    fewer only if the group is smaller) — the per-stratum quota shape,
    complementing q_stratified_sample's per-stratum RATE. Hash-ordering
    by md5(doc_id) makes the draw uniform-ish yet fully reproducible
    (rerunning the pipeline keeps the same sample — no rand()); one
    window shuffle on the group key."""
    from pyspark.sql import Window

    d = load(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    return (
        d.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= RPG_N)
        .select("lang", "doc_id", "n_chars", "rk")
    )


DSIR_B = 1024  # hashed feature buckets
DSIR_N = 100  # sample size


def q_dsir_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style importance resampling (Xie et al. 2023,
    arXiv:2302.03169): score each document by the log-likelihood ratio
    of its hashed-unigram features under a TARGET distribution (here:
    lang == 'en' docs) vs the full corpus, and keep the top-DSIR_N.

    Scale shape: tokens explode map-side; bucket counts are ONE shuffle
    onto DSIR_B=1024 keys with map-side partial aggregation; the weight
    table is 1024 rows, broadcast back onto the token stream; per-doc
    scores are one shuffle on doc_id. No driver-side model state —
    totals ride along as a broadcast one-row crossJoin.

    Deliberately TWO explode passes (round-14, measured): deriving the
    bucket counts from a persisted per-(doc, lang, bucket) table — one
    explode, one materialization — was tried and REJECTED by an
    interleaved same-session A/B at sf0.1 (old median 1.72 s vs
    persisted-variant 3.74 s): the per-doc table is ~docs × 1024 rows,
    and persisting it (serialize + block-store churn) costs more than
    re-exploding the corpus into a map-side partial aggregation that
    collapses to 1024 rows before the shuffle. The second pass is
    compute-bound (md5 per token) but stays O(corpus) with no
    materialized intermediate — the better trade at every scale where
    the doc×bucket matrix outweighs the token stream's hash cost.
    An UNPERSISTED single-pass variant (both aggregates re-referencing
    one (doc_id, lang, b) grouped subtree so AQE stage reuse runs the
    explode once) was also rejected by a settled-machine alternating
    A/B (med 1.24 s this shape vs 1.59 s restructured at sf0.1):
    pushing the doc×bucket matrix through an extra exchange costs more
    than the second map-side explode it saves.

    Float determinism for the oracle: weights are rounded to 8 decimals
    (cross-engine ln() can differ in the last ulp), and the per-doc
    score folds bucket terms in BUCKET ORDER via array_sort + aggregate
    — a grouped float sum in arbitrary order would not hash-match."""
    d = load(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        "lang",
        F.explode(F.split(F.trim("text"), r"\s+")).alias("w"),
    )
    bucketed = toks.select(
        "doc_id",
        "lang",
        (
            F.conv(F.substring(F.md5("w"), 1, 15), 16, 10).cast("long")
            % DSIR_B
        ).alias("b"),
    )
    counts = bucketed.groupBy("b").agg(
        F.count("*").alias("all_c"),
        F.sum(F.when(F.col("lang") == "en", 1).otherwise(0)).alias("tgt_c"),
    )
    totals = counts.agg(
        F.sum("all_c").alias("all_t"), F.sum("tgt_c").alias("tgt_t")
    )
    weights = counts.crossJoin(F.broadcast(totals)).select(
        "b",
        F.round(
            F.log((F.col("tgt_c") + 1.0) / (F.col("tgt_t") + float(DSIR_B)))
            - F.log((F.col("all_c") + 1.0) / (F.col("all_t") + float(DSIR_B))),
            8,
        ).alias("wt"),
    )
    doc_b = bucketed.groupBy("doc_id", "b").agg(F.count("*").alias("c"))
    terms = doc_b.join(F.broadcast(weights), "b").select(
        "doc_id", "b", (F.col("c") * F.col("wt")).alias("term")
    )
    scores = (
        terms.groupBy("doc_id")
        .agg(
            F.aggregate(
                F.array_sort(
                    F.collect_list(F.struct("b", "term"))
                ),
                F.lit(0.0),
                lambda acc, s: acc + s["term"],
            ).alias("s")
        )
        .select("doc_id", F.round("s", 4).alias("score"))
    )
    return scores.orderBy(F.desc("score"), "doc_id").limit(DSIR_N)


QUERIES = {
    "train_test_split": q_train_test_split,
    "dsir_sample": q_dsir_sample,
    "stratified_sample": q_stratified_sample,
    "value_histogram": q_value_histogram,
    "weighted_sample": q_weighted_sample,
    "reservoir_per_group": q_reservoir_per_group,
}

_BUCKET = "('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT % 100"

ORACLE = {
    "dsir_sample": f"""
        WITH toks AS (
            SELECT doc_id, lang,
                   unnest(regexp_split_to_array(trim(text), '\\s+')) AS w
            FROM documents
        ), bucketed AS (
            SELECT doc_id, lang,
                   ('0x' || substr(md5(w), 1, 15))::BIGINT % {DSIR_B} AS b
            FROM toks
        ), counts AS (
            SELECT b, count(*) AS all_c,
                   sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS tgt_c
            FROM bucketed GROUP BY b
        ), tot AS (
            SELECT sum(all_c) AS all_t, sum(tgt_c) AS tgt_t FROM counts
        ), w AS (
            SELECT b,
                   round(ln((tgt_c + 1.0) / (tgt_t + {DSIR_B}.0))
                         - ln((all_c + 1.0) / (all_t + {DSIR_B}.0)), 8) AS wt
            FROM counts CROSS JOIN tot
        ), doc_b AS (
            SELECT doc_id, b, count(*) AS c FROM bucketed GROUP BY doc_id, b
        ), terms AS (
            SELECT doc_id, b, c * wt AS term FROM doc_b JOIN w USING (b)
        ), scores AS (
            SELECT doc_id,
                   round(list_reduce(list(term ORDER BY b),
                                     (a, x) -> a + x), 4) AS score
            FROM terms GROUP BY doc_id
        )
        SELECT doc_id, score FROM scores
        ORDER BY score DESC, doc_id LIMIT {DSIR_N}
    """,
    "train_test_split": f"""
        SELECT CASE WHEN {_BUCKET} < {TRAIN_PCT} THEN 'train' ELSE 'test' END
                   AS split,
               COUNT(*) AS n_docs,
               SUM(n_chars)::BIGINT AS total_chars,
               ROUND(AVG(n_chars), 4) AS avg_chars
        FROM documents GROUP BY 1
    """,
    "stratified_sample": f"""
        SELECT lang, COUNT(*) AS n_sampled, MIN(doc_id) AS first_doc
        FROM documents
        WHERE CASE WHEN lang = 'en' THEN {_BUCKET} < 50
                   ELSE {_BUCKET} < 10 END
        GROUP BY lang
    """,
    "value_histogram": """
        SELECT CASE WHEN value < 0 THEN 0
                    WHEN value >= 100 THEN 21
                    ELSE 1 + CAST(floor(value / 5.0) AS BIGINT) END AS bucket,
               COUNT(*) AS n,
               ROUND(MIN(value), 2) AS lo,
               ROUND(MAX(value), 2) AS hi
        FROM events GROUP BY 1
    """,
    "reservoir_per_group": f"""
        SELECT lang, doc_id, n_chars, rk FROM (
            SELECT lang, doc_id, n_chars,
                   row_number() OVER (PARTITION BY lang
                       ORDER BY md5(doc_id::VARCHAR), doc_id) AS rk
            FROM documents)
        WHERE rk <= {RPG_N}
    """,
    "weighted_sample": f"""
        SELECT doc_id, n_chars,
               (n_chars * {1 << 32})
                   // (('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT
                       + 1) AS priority
        FROM documents
        ORDER BY priority DESC, doc_id LIMIT {WS_N}
    """,
}
