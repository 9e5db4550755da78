"""Text analysis operators over `documents`: token counting, quality
scoring, language-ID heuristic, rolling-hash fingerprinting.

All computed with JVM array/string expressions inside whole-stage codegen
— one narrow pass per query, no shuffle except the final per-lang
aggregations. The single Python boundary is the Misra-Gries candidate
pass in q_heavy_hitters (mapInPandas, O(k)-memory per partition).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from api_to_parquet_spark.dedup import word_hash60, words
from api_to_parquet_spark.lake import load, spread

# Stopword markers per language for the n-gram/stopword heuristic.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "and", "of"),
    "de": ("der", "die", "und", "das"),
    "fr": ("le", "la", "et", "les"),
    "es": ("el", "los", "y", "las"),
}


def q_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace token counting rolled up per language."""
    d = load(spark, sf_dir, "documents")
    n_tok = F.size(words())
    return (
        d.select("lang", n_tok.alias("n_tok"))
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tok").alias("sum_tokens"),
            F.round(F.avg("n_tok"), 4).alias("avg_tokens"),
        )
    )


# BPE-ish pre-tokenizer: letter runs, digit runs, and single
# non-alphanumeric marks — the shape GPT-style tokenizers split on before
# merges. Shared by the Spark query and the DuckDB oracle.
BPE_PATTERN = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \\t\\n\\r]"


def q_bpe_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting with the BPE-ish regex (vs whitespace in
    q_token_stats): per-doc token count plus tokens-per-whitespace-word
    expansion ratio, all regexp_extract_all JVM-side."""
    d = spread(load(spark, sf_dir, "documents")).select(
        "doc_id",
        # Spark's regexp_extract_all extracts a capture group (idx >= 1
        # when the pattern has groups), so wrap the whole alternation;
        # DuckDB's returns the full match for the bare pattern — same set.
        F.regexp_extract_all("text", F.lit(f"({BPE_PATTERN})"), 1).alias("toks"),
        F.size(words()).alias("n_words"),
    )
    n_tok = F.size("toks")
    return d.select(
        "doc_id",
        n_tok.alias("n_bpe_tokens"),
        F.round(n_tok.cast("double") / F.col("n_words"), 4).alias(
            "tokens_per_word"
        ),
    )


def q_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document quality heuristics: token count, type-token ratio,
    mean token length, and a blended score in [0, 1]."""
    d = spread(load(spark, sf_dir, "documents")).select(
        "doc_id", "text", words().alias("ws")
    )
    ws = F.col("ws")
    n_tok = F.size(ws)
    n_uniq = F.size(F.array_distinct(ws))
    ttr = n_uniq.cast("double") / n_tok
    avg_len = (
        F.length(F.regexp_replace("text", r"\s+", "")).cast("double") / n_tok
    )
    score = 0.5 * F.least(n_tok / F.lit(200.0), F.lit(1.0)) + 0.5 * ttr
    return d.select(
        "doc_id",
        n_tok.alias("n_tokens"),
        n_uniq.alias("n_unique"),
        F.round(ttr, 4).alias("ttr"),
        F.round(avg_len, 4).alias("avg_token_len"),
        F.round(score, 4).alias("quality_score"),
    )


def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-count language ID: argmax of per-language marker counts
    with a fixed priority order (en > de > fr > es), 'und' when no marker
    hits. Deterministic heuristic — on this synthetic corpus every lang
    shares one vocabulary, so predictions skew 'en'; accuracy vs the lang
    column is reported by q_lang_id_eval."""
    d = spread(load(spark, sf_dir, "documents")).select(
        "doc_id", "lang", words().alias("ws")
    )
    ws = F.col("ws")
    counts = {
        lang: F.size(F.filter(ws, lambda w: w.isin(*markers)))
        for lang, markers in LANG_MARKERS.items()
    }
    en, de, fr, es = counts["en"], counts["de"], counts["fr"], counts["es"]
    total = en + de + fr + es
    pred = (
        F.when(total == 0, "und")
        .when((en >= de) & (en >= fr) & (en >= es), "en")
        .when((de >= fr) & (de >= es), "de")
        .when(fr >= es, "fr")
        .otherwise("es")
    )
    return d.select("doc_id", "lang", pred.alias("predicted_lang"))


def q_lang_id_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion rollup of the heuristic against the labeled lang."""
    return (
        q_lang_id(spark, sf_dir)
        .groupBy("lang", "predicted_lang")
        .agg(F.count("*").alias("n"))
    )


def q_vocab_top_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary induction: top-100 tokens by document frequency and
    total count — the first step of tokenizer training. explode →
    two-level aggregate (map-side combine absorbs the token explosion)
    → deterministic top-k (count desc, token asc)."""
    # ONE corpus explode (round-14): per-(doc, token) counts carry both
    # signals — doc_freq = group count, term_freq = sum of counts — so
    # the former two explodes + two token shuffles become one explode,
    # one (doc, token) shuffle and one token-keyed re-aggregation of
    # the much smaller grouped table. Values identical.
    d = spread(load(spark, sf_dir, "documents"))
    per_doc = (
        d.select("doc_id", F.explode(words()).alias("token"))
        .groupBy("doc_id", "token")
        .agg(F.count("*").alias("c"))
    )
    return (
        per_doc.groupBy("token")
        .agg(
            F.count("*").alias("doc_freq"),
            F.sum("c").alias("term_freq"),
        )
        .orderBy(F.desc("term_freq"), "token")
        .limit(100)
    )


def q_shard_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-shard assignment: docs hash into 16 shards (stable md5
    bucketing, see sampling.py); output per-shard doc and token totals —
    the balance report that decides whether hash sharding suffices or a
    bin-packing pass is needed."""
    from api_to_parquet_spark.sampling import split_bucket

    d = spread(load(spark, sf_dir, "documents"))
    shard = split_bucket(F.col("doc_id"), 16)
    return (
        d.select(shard.alias("shard"), F.size(words()).alias("n_tok"))
        .groupBy("shard")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tok").alias("total_tokens"),
        )
    )


def q_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF terms per document (doc_id < 100): token explode →
    per-doc term counts and corpus doc-frequencies (both map-side
    combined), corpus size joined in as a broadcast single-row aggregate
    (never a driver-side .count() in the plan), ranked per doc."""
    from pyspark.sql import Window

    # ONE corpus explode (round-14): the per-(doc, token) grouped table
    # IS the distinct (doc, token) set, so doc frequencies re-aggregate
    # it and the tf side filters it — the former second explode +
    # distinct shuffle of the full token stream disappears. NOT
    # persisted: both branches share the grouped exchange via AQE
    # stage reuse; a persist() here was interleave-A/B'd 0.64→1.08 s
    # at sf0.1 and rejected. Values identical.
    d = spread(load(spark, sf_dir, "documents"))
    per_doc = (
        d.select("doc_id", F.explode(words()).alias("token"))
        .groupBy("doc_id", "token")
        .agg(F.count("*").alias("term_freq"))
    )
    tf = per_doc.filter(F.col("doc_id") < 100)
    df_counts = per_doc.groupBy("token").agg(
        F.count("*").alias("doc_freq")
    )
    n_docs = d.agg(F.count("*").alias("n_docs"))
    scored = (
        tf.join(df_counts, "token")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            F.round(
                F.col("term_freq")
                * F.log(F.col("n_docs") / F.col("doc_freq")),
                6,
            ),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), "token")
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("doc_id", "token", "tfidf", "rk")
    )


def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-hash document fingerprint: minimum 60-bit hash over word
    4-grams (winnowing-style min selection) — robust to local edits,
    cheap to compare."""
    d = spread(load(spark, sf_dir, "documents")).select(
        "doc_id", words().alias("ws")
    )
    ws = F.col("ws")
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(ws) - 3, F.lit(1))),
        lambda i: F.concat_ws(
            " ",
            F.element_at(ws, i),
            F.element_at(ws, i + 1),
            F.element_at(ws, i + 2),
            F.element_at(ws, i + 3),
        ),
    )
    fp = F.array_min(F.transform(F.col("grams"), word_hash60))
    return d.select("doc_id", grams.alias("grams")).select(
        "doc_id", fp.alias("fingerprint")
    )


def q_doc_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intra-document repetition (the Gopher-rules quality signal): the
    share of the document's 3-grams taken by its single most repeated
    3-gram — high share = boilerplate/spam/looping text. Grams keep
    multiplicity (shingles distinct=False); two grouped passes, both
    partitioned by doc_id so the second agg is map-side after the first
    shuffle. Docs under 3 words are excluded (no 3-grams exist)."""
    from api_to_parquet_spark.dedup import shingles

    d = (
        spread(load(spark, sf_dir, "documents"))
        .select("doc_id", words().alias("ws"))
        .filter(F.size("ws") >= 3)
        .select("doc_id", shingles(F.col("ws"), distinct=False).alias("grams"))
    )
    per_gram = d.select(
        "doc_id", F.explode("grams").alias("g")
    ).groupBy("doc_id", "g").agg(F.count("*").alias("n"))
    return per_gram.groupBy("doc_id").agg(
        F.sum("n").alias("n_grams"),
        F.round(F.max("n") / F.sum("n"), 6).alias("top_gram_share"),
        F.expr("min_by(g, struct(-n, g))").alias("top_gram"),
    )


MIX_ALPHA = 0.3  # temperature for language-mixture rebalancing


def q_lang_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multilingual sampling-weight computation (the mC4/NLLB recipe):
    per-language token share p_l, then temperature-rebalanced sampling
    weight q_l ∝ p_l^α (α = 0.3) — upsampling low-resource languages so
    training mixtures aren't dominated by the head language. ONE grouped
    pass over the corpus; both normalization constants (total tokens,
    Σp^α) are global windows over the already-aggregated |langs|-row
    frame — a crossJoin-with-agg formulation re-expanded the corpus scan
    once per constant (10-Exchange plan, caught by tools/plan_audit.py),
    vs 2 exchanges here."""
    from pyspark.sql import Window

    d = load(spark, sf_dir, "documents")
    shares = (
        d.select("lang", F.size(words()).alias("n_tok"))
        .groupBy("lang")
        .agg(F.sum("n_tok").alias("lang_tokens"))
    )
    w = Window.partitionBy(F.lit(1))
    p = F.col("lang_tokens") / F.sum("lang_tokens").over(w)
    powed = shares.select(
        "lang",
        "lang_tokens",
        F.round(p, 6).alias("p_share"),
        F.pow(p, MIX_ALPHA).alias("_pa"),
    )
    return powed.select(
        "lang",
        "lang_tokens",
        "p_share",
        F.round(F.col("_pa") / F.sum("_pa").over(w), 6).alias("q_weight"),
    )


HH_PHI = 0.004  # heavy-hitter threshold: freq >= HH_PHI * total tokens


def q_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-guided two-pass EXACT heavy hitters: tokens occurring in at
    least HH_PHI of the corpus token stream.

    Pass 1 runs a Misra-Gries summary per partition (mapInPandas, k =
    2/φ counters, O(k) memory regardless of partition size) to produce a
    candidate set. Correctness: an item with global frequency > φ·N must
    have frequency > φ·n_p in at least one partition (pigeonhole), and
    MG with k ≥ 1/φ counters retains every item with partition frequency
    > n_p/(k+1) — so the union of partition candidates is a SUPERSET of
    the true heavy hitters. Pass 2 exactly counts ONLY the candidates
    (broadcast semi-join, then one grouped count) and applies the
    threshold — final answer exact, so it oracle-checks, unlike a pure
    sketch. This is the 100 TB shape for "top tokens" when the full
    vocabulary is too wide to group cheaply but candidates fit in a
    broadcast; the one-pass exact twin is q_vocab_top_tokens."""
    d = spread(load(spark, sf_dir, "documents")).select("text")
    k = int(2 / HH_PHI)

    def mg_partition(pdfs):
        counters: dict[str, int] = {}
        for pdf in pdfs:
            for text in pdf["text"]:
                for tok in text.strip().split():
                    if tok in counters:
                        counters[tok] += 1
                    elif len(counters) < k:
                        counters[tok] = 1
                    else:  # decrement-all step
                        dead = []
                        for key in counters:
                            counters[key] -= 1
                            if counters[key] == 0:
                                dead.append(key)
                        for key in dead:
                            del counters[key]
        yield pd.DataFrame({"token": list(counters.keys())})

    candidates = (
        d.mapInPandas(mg_partition, "token STRING").distinct()
    )
    toks = d.select(F.explode(words()).alias("token"))
    total = toks.agg(F.count("*").alias("n_total"))
    return (
        toks.join(F.broadcast(candidates), "token", "left_semi")
        .groupBy("token")
        .agg(F.count("*").alias("freq"))
        .crossJoin(F.broadcast(total))
        .filter(F.col("freq") >= HH_PHI * F.col("n_total"))
        .select(
            "token",
            "freq",
            F.round(F.col("freq") / F.col("n_total"), 6).alias("rel_freq"),
        )
    )


_DUCK_WS = "regexp_split_to_array(trim(text), '\\s+')"


def _duck_marker_count(markers: tuple[str, ...]) -> str:
    lst = ", ".join(f"'{m}'" for m in markers)
    return f"len(list_filter(ws, w -> w IN ({lst})))"


_EN = _duck_marker_count(LANG_MARKERS["en"])
_DE = _duck_marker_count(LANG_MARKERS["de"])
_FR = _duck_marker_count(LANG_MARKERS["fr"])
_ES = _duck_marker_count(LANG_MARKERS["es"])

# The published Gopher quality-rule thresholds (Rae et al. 2021,
# "Scaling Language Models: Methods, Analysis & Insights from Training
# Gopher", table A1) — the de-facto standard pre-training text filter.
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")
GOPHER_BULLETS = ("•", "-", "*")


def q_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher quality-rule filter over `documents`: every rule is a
    JVM-side array/string expression (filter/transform/aggregate over
    the whitespace token array — zero Python, zero shuffle, one narrow
    pass), emitting the per-rule signals plus the conjunctive verdict:

      50 <= n_words <= 100000;  3 <= mean word length <= 10;
      symbol-to-word ratio ('#' or '…'-as-'...') <= 0.1;
      <= 90% of lines bullet-started;  <= 30% of lines ellipsis-ended;
      >= 80% of words contain a letter;  >= 2 Gopher stopwords present.

    Scale shape: embarrassingly parallel map over the corpus — the
    100 TB plan is scan -> project -> write, no exchange at all."""
    d = spread(load(spark, sf_dir, "documents"))
    w = words()
    lw = F.transform(w, F.lower)
    n_words = F.size(w).cast("bigint")
    nwd = F.nullif(n_words, F.lit(0)).cast("double")
    mean_len = F.round(
        F.aggregate(
            w, F.lit(0).cast("bigint"), lambda a, x: a + F.length(x)
        ).cast("double")
        / nwd,
        4,
    )
    alpha_frac = F.round(
        F.size(F.filter(w, lambda x: x.rlike("[A-Za-z]"))) / nwd, 4
    )
    hash_n = F.length("text") - F.length(F.regexp_replace("text", "#", ""))
    ell_n = (
        F.length("text") - F.length(F.regexp_replace("text", r"\.\.\.", ""))
    ) / 3
    symbol_ratio = F.round((hash_n + ell_n) / nwd, 4)
    lines = F.split("text", "\n")
    nl = F.nullif(F.size(lines), F.lit(0)).cast("double")
    bullet_pred = " OR ".join(
        f"startswith(ltrim(l), '{b}')" for b in GOPHER_BULLETS
    )
    bullet_frac = F.round(
        F.size(F.expr(f"filter(split(text, '\\n'), l -> {bullet_pred})"))
        / nl,
        4,
    )
    ellipsis_frac = F.round(
        F.size(
            F.expr("filter(split(text, '\\n'), l -> endswith(rtrim(l), '...'))")
        )
        / nl,
        4,
    )
    n_stop = F.size(
        F.filter(
            F.array(*[F.lit(s) for s in GOPHER_STOPWORDS]),
            lambda s: F.array_contains(lw, s),
        )
    ).cast("bigint")
    cols = {
        "n_words": n_words,
        "mean_word_len": mean_len,
        "alpha_frac": alpha_frac,
        "symbol_ratio": symbol_ratio,
        "bullet_frac": bullet_frac,
        "ellipsis_frac": ellipsis_frac,
        "n_stop": n_stop,
    }
    passes = (
        n_words.between(50, 100000)
        & mean_len.between(3, 10)
        & (symbol_ratio <= 0.1)
        & (bullet_frac <= 0.9)
        & (ellipsis_frac <= 0.3)
        & (alpha_frac >= 0.8)
        & (n_stop >= 2)
    )
    return d.select(
        "doc_id", *[c.alias(n) for n, c in cols.items()],
        passes.alias("passes"),
    )


# PII scrub patterns (round-8): the classic training-data redaction
# pass. Same regex dialect subset in Java (Spark) and RE2 (DuckDB):
# no backreferences, \b/\d/{m,n} only.
_PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PII_IPV4 = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
_PII_LONGNUM = r"\b\d{13,19}\b"
_PII_PHONE = r"\b\d{3}[-.]\d{3,4}[-.]\d{4}\b"


def q_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction (round-8): emails, IPv4s, long digit runs
    (card-like) and phone-shaped numbers replaced by typed
    placeholders — one map-side regexp_replace chain, zero shuffle,
    zero Python. Counts are per-pattern on the pre-scrub text. The
    synthetic corpus carries no natural PII, so deterministic PII is
    injected per doc first (non-vacuous oracle; the scrub itself is
    generic). Email scrubs FIRST so address-embedded digits can't be
    half-eaten by the numeric patterns."""
    d = spread(load(spark, sf_dir, "documents")).select("doc_id", "text")
    aug = F.concat(
        F.col("text"),
        F.lit(" contact u"),
        F.col("doc_id").cast("string"),
        F.lit("@ex.com from 10.0.0."),
        (F.col("doc_id") % 250).cast("string"),
        F.lit(" card 4111111111111111 tel 555-123-4567"),
    )
    scrub = F.regexp_replace(aug, _PII_EMAIL, "<EMAIL>")
    scrub = F.regexp_replace(scrub, _PII_IPV4, "<IP>")
    scrub = F.regexp_replace(scrub, _PII_LONGNUM, "<NUM>")
    scrub = F.regexp_replace(scrub, _PII_PHONE, "<PHONE>")
    return d.select(
        "doc_id",
        F.md5(scrub).alias("scrub_md5"),
        F.regexp_count(aug, F.lit(_PII_EMAIL)).alias("n_email"),
        F.regexp_count(aug, F.lit(_PII_IPV4)).alias("n_ip"),
        F.regexp_count(aug, F.lit(_PII_LONGNUM)).alias("n_num"),
    )


QUERIES = {
    "heavy_hitters": q_heavy_hitters,
    "pii_scrub": q_pii_scrub,
    "gopher_rules": q_gopher_rules,
    "doc_repetition": q_doc_repetition,
    "lang_mixture": q_lang_mixture,
    "text_token_stats": q_token_stats,
    "bpe_token_count": q_bpe_token_count,
    "text_quality_score": q_quality_score,
    "lang_id": q_lang_id,
    "vocab_top_tokens": q_vocab_top_tokens,
    "tfidf_top_terms": q_tfidf_top_terms,
    "shard_assignment": q_shard_assignment,
    "lang_id_eval": q_lang_id_eval,
    "doc_fingerprint": q_doc_fingerprint,
}

ORACLE = {
    "pii_scrub": r"""
        WITH aug AS (
            SELECT doc_id,
                   text || ' contact u' || doc_id
                        || '@ex.com from 10.0.0.' || (doc_id % 250)
                        || ' card 4111111111111111 tel 555-123-4567'
                   AS t
            FROM documents
        )
        SELECT doc_id,
               md5(regexp_replace(regexp_replace(regexp_replace(
                   regexp_replace(t,
                       '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
                       '<EMAIL>', 'g'),
                       '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b',
                       '<IP>', 'g'),
                       '\b\d{13,19}\b', '<NUM>', 'g'),
                       '\b\d{3}[-.]\d{3,4}[-.]\d{4}\b', '<PHONE>', 'g'))
                   AS scrub_md5,
               length(regexp_extract_all(t,
                   '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'
                   ))::INTEGER AS n_email,
               length(regexp_extract_all(t,
                   '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b'
                   ))::INTEGER AS n_ip,
               length(regexp_extract_all(t,
                   '\b\d{13,19}\b'))::INTEGER AS n_num
        FROM aug
    """,
    "gopher_rules": r"""
        WITH base AS (
            SELECT doc_id, text,
                   regexp_split_to_array(trim(text), '\s+') AS ws,
                   string_split(text, chr(10)) AS lines
            FROM documents
        ), m AS (
            SELECT doc_id,
                CAST(len(ws) AS BIGINT) AS n_words,
                ROUND(CAST(list_sum(list_transform(ws, w -> length(w)))
                        AS DOUBLE)
                      / CAST(nullif(len(ws), 0) AS DOUBLE), 4)
                    AS mean_word_len,
                ROUND(len(list_filter(ws,
                          w -> regexp_matches(w, '[A-Za-z]')))
                      / CAST(nullif(len(ws), 0) AS DOUBLE), 4)
                    AS alpha_frac,
                ROUND(((length(text) - length(replace(text, '#', '')))
                       + (length(text)
                          - length(replace(text, '...', ''))) / 3)
                      / CAST(nullif(len(ws), 0) AS DOUBLE), 4)
                    AS symbol_ratio,
                ROUND(len(list_filter(lines,
                          l -> ltrim(l) LIKE '•%' OR ltrim(l) LIKE '-%'
                               OR ltrim(l) LIKE '*%'))
                      / CAST(nullif(len(lines), 0) AS DOUBLE), 4)
                    AS bullet_frac,
                ROUND(len(list_filter(lines, l -> rtrim(l) LIKE '%...'))
                      / CAST(nullif(len(lines), 0) AS DOUBLE), 4)
                    AS ellipsis_frac,
                CAST(len(list_filter(
                        ['the','be','to','of','and','that','have','with'],
                        s -> list_contains(
                            list_transform(ws, w -> lower(w)), s)))
                    AS BIGINT) AS n_stop
            FROM base
        )
        SELECT doc_id, n_words, mean_word_len, alpha_frac, symbol_ratio,
               bullet_frac, ellipsis_frac, n_stop,
               (n_words BETWEEN 50 AND 100000
                AND mean_word_len BETWEEN 3 AND 10
                AND symbol_ratio <= 0.1 AND bullet_frac <= 0.9
                AND ellipsis_frac <= 0.3 AND alpha_frac >= 0.8
                AND n_stop >= 2) AS passes
        FROM m
    """,
    "lang_mixture": f"""
        WITH shares AS (
            SELECT lang, SUM(len({_DUCK_WS}))::BIGINT AS lang_tokens
            FROM documents GROUP BY lang),
        t AS (SELECT SUM(lang_tokens) AS total_tokens FROM shares),
        p AS (
            SELECT lang, lang_tokens,
                   lang_tokens / total_tokens AS p_raw,
                   pow(lang_tokens / total_tokens, {MIX_ALPHA}) AS pa
            FROM shares CROSS JOIN t),
        z AS (SELECT SUM(pa) AS z FROM p)
        SELECT lang, lang_tokens, ROUND(p_raw, 6) AS p_share,
               ROUND(pa / z.z, 6) AS q_weight
        FROM p CROSS JOIN z
    """,
    # top_gram via row_number, not arg_min((-n, g)) — DuckDB arg_min
    # rejects composite keys
    "doc_repetition": f"""
        WITH ws AS (
            SELECT doc_id, {_DUCK_WS} AS w FROM documents
            WHERE len({_DUCK_WS}) >= 3),
        grams AS (
            SELECT doc_id,
                   unnest(list_transform(generate_series(1, len(w) - 2),
                          i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS g
            FROM ws),
        per_gram AS (
            SELECT doc_id, g, COUNT(*) AS n FROM grams GROUP BY 1, 2)
        SELECT doc_id, n_grams::BIGINT AS n_grams,
               ROUND(n / n_grams, 6) AS top_gram_share,
               g AS top_gram
        FROM (SELECT doc_id, g, n,
                     SUM(n) OVER (PARTITION BY doc_id) AS n_grams,
                     row_number() OVER (PARTITION BY doc_id
                                        ORDER BY n DESC, g) AS rk
              FROM per_gram)
        WHERE rk = 1
    """,
    "heavy_hitters": f"""
        WITH toks AS (
            SELECT unnest({_DUCK_WS}) AS token FROM documents),
        n AS (SELECT COUNT(*) AS n_total FROM toks)
        SELECT token, COUNT(*) AS freq,
               ROUND(COUNT(*) / ANY_VALUE(n.n_total), 6) AS rel_freq
        FROM toks CROSS JOIN n
        GROUP BY token
        HAVING COUNT(*) >= {HH_PHI} * ANY_VALUE(n.n_total)
    """,
    "bpe_token_count": f"""
        SELECT doc_id,
               len(regexp_extract_all(text, '{BPE_PATTERN}')) AS n_bpe_tokens,
               ROUND(len(regexp_extract_all(text, '{BPE_PATTERN}'))::DOUBLE
                     / len({_DUCK_WS}), 4) AS tokens_per_word
        FROM documents
    """,
    "tfidf_top_terms": f"""
        WITH toks AS (
            SELECT doc_id, unnest({_DUCK_WS}) AS token FROM documents),
        tf AS (
            SELECT doc_id, token, COUNT(*) AS term_freq
            FROM toks WHERE doc_id < 100 GROUP BY 1, 2),
        dfc AS (
            SELECT token, COUNT(*) AS doc_freq
            FROM (SELECT DISTINCT doc_id, token FROM toks) GROUP BY token),
        n AS (SELECT COUNT(*) AS n_docs FROM documents)
        SELECT doc_id, token, tfidf, rk FROM (
            SELECT tf.doc_id, tf.token,
                   ROUND(tf.term_freq * ln(n.n_docs::DOUBLE / dfc.doc_freq), 6)
                       AS tfidf,
                   row_number() OVER (
                       PARTITION BY tf.doc_id
                       ORDER BY ROUND(tf.term_freq
                                * ln(n.n_docs::DOUBLE / dfc.doc_freq), 6)
                                DESC, tf.token) AS rk
            FROM tf JOIN dfc ON tf.token = dfc.token CROSS JOIN n)
        WHERE rk <= 3
    """,
    "vocab_top_tokens": f"""
        SELECT df.token, df.doc_freq, tf.term_freq
        FROM (SELECT token, COUNT(*) AS doc_freq
              FROM (SELECT doc_id, unnest(list_distinct({_DUCK_WS})) AS token
                    FROM documents) GROUP BY token) df
        JOIN (SELECT token, COUNT(*) AS term_freq
              FROM (SELECT unnest({_DUCK_WS}) AS token
                    FROM documents) GROUP BY token) tf
          ON df.token = tf.token
        ORDER BY tf.term_freq DESC, df.token LIMIT 100
    """,
    "shard_assignment": f"""
        SELECT ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT % 16
                   AS shard,
               COUNT(*) AS n_docs,
               CAST(SUM(len({_DUCK_WS})) AS BIGINT) AS total_tokens
        FROM documents GROUP BY 1
    """,
    "text_token_stats": f"""
        SELECT lang, count(*) AS n_docs,
               CAST(SUM(len({_DUCK_WS})) AS BIGINT) AS sum_tokens,
               ROUND(AVG(len({_DUCK_WS})), 4) AS avg_tokens
        FROM documents GROUP BY lang
    """,
    "text_quality_score": f"""
        SELECT doc_id,
               len(ws) AS n_tokens,
               len(list_distinct(ws)) AS n_unique,
               ROUND(len(list_distinct(ws))::DOUBLE / len(ws), 4) AS ttr,
               ROUND(length(regexp_replace(text, '\\s+', '', 'g'))::DOUBLE
                     / len(ws), 4) AS avg_token_len,
               ROUND(0.5 * least(len(ws) / 200.0, 1.0)
                     + 0.5 * (len(list_distinct(ws))::DOUBLE / len(ws)), 4)
                   AS quality_score
        FROM (SELECT doc_id, text, {_DUCK_WS} AS ws FROM documents)
    """,
    "lang_id": f"""
        SELECT doc_id, lang,
               CASE WHEN {_EN} + {_DE} + {_FR} + {_ES} = 0 THEN 'und'
                    WHEN {_EN} >= {_DE} AND {_EN} >= {_FR} AND {_EN} >= {_ES} THEN 'en'
                    WHEN {_DE} >= {_FR} AND {_DE} >= {_ES} THEN 'de'
                    WHEN {_FR} >= {_ES} THEN 'fr'
                    ELSE 'es' END AS predicted_lang
        FROM (SELECT doc_id, lang, {_DUCK_WS} AS ws FROM documents)
    """,
    "lang_id_eval": f"""
        SELECT lang, predicted_lang, count(*) AS n FROM (
            SELECT doc_id, lang,
                   CASE WHEN {_EN} + {_DE} + {_FR} + {_ES} = 0 THEN 'und'
                        WHEN {_EN} >= {_DE} AND {_EN} >= {_FR} AND {_EN} >= {_ES} THEN 'en'
                        WHEN {_DE} >= {_FR} AND {_DE} >= {_ES} THEN 'de'
                        WHEN {_FR} >= {_ES} THEN 'fr'
                        ELSE 'es' END AS predicted_lang
            FROM (SELECT doc_id, lang, {_DUCK_WS} AS ws FROM documents))
        GROUP BY lang, predicted_lang
    """,
    "doc_fingerprint": f"""
        SELECT doc_id,
               list_min(list_transform(
                   list_transform(generate_series(1, greatest(len(ws) - 3, 1)),
                       i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3]),
                   g -> ('0x' || substr(md5(g), 1, 15))::BIGINT)) AS fingerprint
        FROM (SELECT doc_id, {_DUCK_WS} AS ws FROM documents)
    """,
}
