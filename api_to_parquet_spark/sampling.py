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


QUERIES = {
    "train_test_split": q_train_test_split,
    "stratified_sample": q_stratified_sample,
    "value_histogram": q_value_histogram,
    "weighted_sample": q_weighted_sample,
    "reservoir_per_group": q_reservoir_per_group,
}

_BUCKET = "('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT % 100"

ORACLE = {
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
