"""Training-data pipeline operators: benchmark decontamination, document
chunking (built-in and Python-UDTF variants), and token-budget sequence
packing.

These extend the reference engine's surface the same way the dedup/
text/similarity families do: the reference (abossard/api-to-parquet)
stores opaque time-series rows and delegates analysis (SURVEY.md §2.3,
`src/main.go:88-116`), so large-scale corpus-preparation operators are
part of what its replacement query layer must provide natively.

Scale notes:
- `decontaminate` broadcasts the eval-set gram dictionary — eval sets
  are small by construction (thousands of benchmark docs), while the
  corpus side stays distributed and is touched exactly once.
- `doc_chunks` is pure built-in (`sequence`/`slice`/`posexplode`) —
  whole-stage-codegen, no Python. `udtf_doc_chunks` produces the same
  rows through a Python UDTF (arrow-batched lateral join) purely to
  exercise the §2.10 extension surface; the built-in path is the one to
  run at 100 TB.
- `sequence_packing` windows PARTITION BY shard, so packing
  parallelizes per shard instead of serializing on one global
  cumulative sum.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from api_to_parquet_spark.lake import load, spread

NGRAM = 4  # decontamination gram width
CHUNK = 32  # tokens per chunk
STRIDE = 24  # chunk start spacing (8-token overlap)
PACK_BUDGET = 2048  # tokens per packed bin
PACK_SHARDS = 8
EVAL_SOURCE = "src0"  # stand-in benchmark/eval subset


def _tokens(df: DataFrame) -> DataFrame:
    # Project the token array as a real column FIRST: expressions
    # referenced inside higher-order-function lambdas are re-evaluated
    # per element (interpreted, no CSE — see PLANS.md).
    return df.withColumn("ws", F.split(F.trim("text"), r"\s+"))


def _grams(df: DataFrame) -> DataFrame:
    """doc_id, source, exploded DISTINCT word n-grams."""
    toked = _tokens(df).withColumn(
        "grams",
        F.when(
            F.size("ws") >= NGRAM,
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(1), F.size("ws") - (NGRAM - 1)),
                    lambda i: F.concat_ws(" ", F.slice("ws", i, NGRAM)),
                )
            ),
        ).otherwise(F.array().cast("array<string>")),
    )
    return toked.select("doc_id", "source", F.explode("grams").alias("gram"))


def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: corpus docs sharing any word 4-gram
    with the eval subset (source = 'src0'), with the count of distinct
    shared grams. The eval gram dictionary is broadcast (small side by
    construction); the corpus is scanned once, map-side gram expansion,
    one shuffle for the per-doc count."""
    docs = load(spark, sf_dir, "documents")
    grams = _grams(docs)
    eval_grams = (
        grams.filter(F.col("source") == EVAL_SOURCE).select("gram").distinct()
    )
    return (
        grams.filter(F.col("source") != EVAL_SOURCE)
        .join(F.broadcast(eval_grams), "gram")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_shared_grams"))
    )


def q_doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window document chunking (32-token chunks every 24
    tokens — 8-token overlap), the context-length-bound preprocessing
    step. Pure built-ins: sequence → posexplode → slice, all
    codegen'd, chunk token counts derived arithmetically instead of
    re-tokenizing."""
    toked = _tokens(load(spark, sf_dir, "documents")).select(
        "doc_id", "ws", F.size("ws").alias("n")
    )
    return (
        toked.select(
            "doc_id",
            "ws",
            "n",
            F.posexplode(F.sequence(F.lit(1), F.col("n"), F.lit(STRIDE))).alias(
                "chunk_idx", "start"
            ),
        )
        .select(
            "doc_id",
            "chunk_idx",
            F.concat_ws(" ", F.slice("ws", F.col("start"), CHUNK)).alias("chunk"),
            F.least(F.lit(CHUNK), F.col("n") - F.col("start") + 1).alias(
                "chunk_tokens"
            ),
        )
    )


def q_udtf_doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same output as doc_chunks, computed by a registered Python UDTF
    in a LATERAL join — demonstrates the user-extensible table-function
    surface. Row-at-a-time Python: the built-in doc_chunks plan is the
    one to use at scale (docstring contract, PLANS.md)."""
    from pyspark.sql.functions import udtf

    stride, chunk = STRIDE, CHUNK

    class ChunkDocUDTF:
        # Defined function-locally so cloudpickle ships it BY VALUE —
        # executor Python workers don't have this repo on sys.path.
        def eval(self, doc_id, text):  # noqa: ANN001 - UDTF signature
            toks = text.strip().split()
            for idx, start in enumerate(range(0, len(toks), stride)):
                piece = toks[start : start + chunk]
                yield doc_id, idx, " ".join(piece), len(piece)

    chunker = udtf(
        ChunkDocUDTF,
        returnType=(
            "doc_id: bigint, chunk_idx: int, chunk: string, chunk_tokens: int"
        ),
    )
    spark.udtf.register("chunk_doc", chunker)
    load(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(
        "SELECT c.doc_id, c.chunk_idx, c.chunk, c.chunk_tokens"
        " FROM documents d, LATERAL chunk_doc(d.doc_id, d.text) c"
    )


def q_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy sequential packing of documents into 2048-token bins,
    sharded: docs are pseudo-shuffled by a deterministic scrambled key,
    a per-shard running token total assigns each doc to the bin where it
    starts, and the result summarizes docs/tokens per (shard, bin).
    PARTITION BY shard keeps the window parallel — the global-order
    variant would serialize the whole corpus through one task."""
    toked = _tokens(load(spark, sf_dir, "documents")).select(
        "doc_id",
        (F.col("doc_id") % PACK_SHARDS).alias("shard"),
        ((F.col("doc_id") * F.lit(2654435761)) % F.lit(1000003)).alias("skey"),
        F.size("ws").alias("n_tokens"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("skey", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    packed = toked.withColumn("cum", F.sum("n_tokens").over(w)).withColumn(
        "bin",
        F.floor((F.col("cum") - F.col("n_tokens")) / F.lit(float(PACK_BUDGET))),
    )
    return packed.groupBy("shard", "bin").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
    )


def q_corpus_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The cleaning verdict: one narrow pass assigns every document
    keep/drop with the FIRST failing rule (deterministic rule order, the
    way production filters log their drops) — too_short (<20 tokens),
    low_diversity (type-token ratio <0.3), no_stopwords (no top-language
    marker at all, a gibberish signal). Rules are cheap array/string
    expressions; heavier signals (dedup, repetition) run as their own
    operators upstream and would join in here by doc_id."""
    from api_to_parquet_spark.dedup import words
    from api_to_parquet_spark.text import LANG_MARKERS

    d = spread(load(spark, sf_dir, "documents")).select(
        "doc_id", "lang", words().alias("ws")
    )
    ws = F.col("ws")
    n_tok = F.size(ws)
    ttr = F.size(F.array_distinct(ws)).cast("double") / n_tok
    markers = [m for ms in LANG_MARKERS.values() for m in ms]
    n_markers = F.size(F.filter(ws, lambda w: w.isin(*markers)))
    reason = (
        F.when(n_tok < 20, "too_short")
        .when(ttr < 0.3, "low_diversity")
        .when(n_markers == 0, "no_stopwords")
        .otherwise("kept")
    )
    return d.select(
        "doc_id",
        n_tok.alias("n_tokens"),
        reason.alias("verdict"),
        (reason == "kept").alias("keep"),
    )


def q_corpus_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The whole corpus-prep story as ONE composed operator — the query a
    100 TB training-data team actually runs: quality filter → exact
    dedup (md5, keep-first) → near dedup (MinHash-LSH candidates, exact
    Jaccard verify, greedy drop-larger-id) — returning the per-stage
    survivor census (docs + tokens). Every stage is the scale path of
    its standalone operator: the near-dup stage is the LSH pipeline
    (one (band,bucket) shuffle, verification only on candidates), never
    the all-pairs join; at this corpus's similarity threshold LSH
    band-recall is ≈1, so the exact-Jaccard DuckDB oracle matches
    (same argument as minhash_lsh_pairs)."""
    from api_to_parquet_spark.dedup import (
        JACCARD_THRESHOLD,
        _expand_id_pairs,
        hashed_shingles,
        lsh_bands,
        minhash_signature,
        shingles,
        words,
    )
    from api_to_parquet_spark.text import LANG_MARKERS

    from pyspark.sql import Window

    d = spread(load(spark, sf_dir, "documents")).select(
        "doc_id", "text", words().alias("ws")
    )
    n_tok = F.size("ws")
    ttr = F.size(F.array_distinct("ws")).cast("double") / n_tok
    markers = [m for ms in LANG_MARKERS.values() for m in ms]
    n_markers = F.size(F.filter("ws", lambda w: w.isin(*markers)))
    # Per-doc survival flags in ONE lineage (a 4-way union of per-stage
    # aggregates recomputes the whole upstream per stage — measured 13.4s
    # vs ~3s for this shape at sf0.01). Exact dedup keep-first is a
    # window min over (q_pass, md5) — one shuffle, no self-semi-join.
    # The flag table is deliberately NOT persist()-ed (round-14,
    # measured): its consumers all sit behind the (q_pass, md5) window
    # exchange, which AQE's query-stage cache reuses at runtime, and an
    # interleaved same-session A/B at sf0.1 showed the persisted
    # variant LOSING to r13's unpersisted shape (4.22 s vs 3.18 s
    # med2) — the materialization barrier serializes the DAG, the same
    # pattern as _expand_id_pairs. text is dropped in the projection —
    # the window consumed the md5 already; ws carries the tokens the
    # shingle and census stages need.
    w_md5 = Window.partitionBy("q_pass", F.md5("text"))
    flagged = (
        d.withColumn(
            "q_pass", (n_tok >= 20) & (ttr >= 0.3) & (n_markers > 0)
        )
        .withColumn("first_id", F.min("doc_id").over(w_md5))
        .withColumn(
            "e_pass", F.col("q_pass") & (F.col("doc_id") == F.col("first_id"))
        )
        .select("doc_id", "ws", "q_pass", "e_pass")
    )
    e = flagged.filter("e_pass").select("doc_id", "ws")

    sh = e.select("doc_id", shingles(F.col("ws")).alias("sh"))
    sigs = sh.select(
        "doc_id", hashed_shingles(F.col("sh")).alias("hs")
    ).select("doc_id", minhash_signature("hs").alias("sig"))
    bands = sigs.select(
        "doc_id", F.posexplode(lsh_bands(F.col("sig"))).alias("band", "bucket")
    )
    buckets = (
        bands.groupBy("band", "bucket")
        .agg(F.collect_list("doc_id").alias("ids"))
        .filter(F.size("ids") > 1)
        .select(F.array_sort("ids").alias("ids"))
    )
    # Full-table verification joins against the e-filtered shingle
    # table, like q_minhash_lsh_pairs (the round-14 candidate-only
    # variant was interleave-A/B'd slower there and here: 4.3 s this
    # shape vs 6.6 s candidate-only at sf0.1 — the semi-join + persist
    # barriers outweigh the shingle recompute that AQE stage reuse
    # already partially dedupes).
    pairs = _expand_id_pairs(buckets)
    sa = sh.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a"))
    sb = sh.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b"))
    jac = (
        F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
        / F.size(F.array_union("sh_a", "sh_b"))
    )
    drops = (
        pairs.join(sa, "doc_a")
        .join(sb, "doc_b")
        .filter(jac >= JACCARD_THRESHOLD)
        .select(F.col("doc_b").alias("doc_id"))
        .distinct()
    )
    # Census branch rides a doc_id join exchange at scale (AQE may
    # broadcast `drops` locally): project the token ARRAY down to its
    # size first — the census only sums counts, so its exchange rows
    # carry an int instead of the tokenized document (round-15, guide
    # §2.3 project before the exchange).
    full = (
        flagged.select(
            "doc_id",
            F.size("ws").alias("n_ws"),
            "q_pass",
            "e_pass",
        )
        .join(drops.withColumn("dropped", F.lit(True)), "doc_id", "left")
        .withColumn("n_pass", F.col("e_pass") & F.col("dropped").isNull())
    )

    # One conditional aggregate over the flagged rows → a single row of
    # 8 counters, exploded driver-free into the 4-stage census.
    def pair(flag, suffix):
        return [
            F.sum(F.when(flag, 1).otherwise(0)).alias(f"d_{suffix}"),
            F.sum(F.when(flag, F.col("n_ws")).otherwise(0)).alias(
                f"t_{suffix}"
            ),
        ]

    one = full.agg(
        *pair(F.lit(True), "0"),
        *pair(F.col("q_pass"), "1"),
        *pair(F.col("e_pass"), "2"),
        *pair(F.col("n_pass"), "3"),
    )
    stages = ["input", "quality_filter", "exact_dedup", "near_dedup"]
    rows = F.array(
        *[
            F.struct(
                F.lit(i).alias("stage_idx"),
                F.lit(s).alias("stage"),
                F.col(f"d_{i}").alias("n_docs"),
                F.col(f"t_{i}").alias("n_tokens"),
            )
            for i, s in enumerate(stages)
        ]
    )
    return (
        one.select(F.explode(rows).alias("r"))
        .select("r.*")
        .orderBy("stage_idx")
    )


QUERIES = {
    "corpus_filter": q_corpus_filter,
    "corpus_pipeline": q_corpus_pipeline,
    "decontaminate": q_decontaminate,
    "doc_chunks": q_doc_chunks,
    "udtf_doc_chunks": q_udtf_doc_chunks,
    "sequence_packing": q_sequence_packing,
}

_DUCK_WS = "regexp_split_to_array(trim(text), '\\s+')"

_CHUNKS_SQL = f"""
    SELECT doc_id,
           CAST((s.start - 1) // {STRIDE} AS INT) AS chunk_idx,
           array_to_string(ws[s.start : s.start + {CHUNK - 1}], ' ') AS chunk,
           CAST(least({CHUNK}, len(ws) - s.start + 1) AS INT) AS chunk_tokens
    FROM (SELECT doc_id, {_DUCK_WS} AS ws FROM documents) t,
         LATERAL (SELECT unnest(generate_series(1, len(t.ws), {STRIDE}))
                  AS start) s
"""

_DUCK_MARKERS = (
    "('the', 'a', 'and', 'of', 'der', 'die', 'und', 'das', "
    "'le', 'la', 'et', 'les', 'el', 'los', 'y', 'las')"
)

_CORPUS_PIPELINE_SQL = f"""
    WITH d AS (
        SELECT doc_id, text, {_DUCK_WS} AS ws FROM documents),
    q AS (
        SELECT * FROM d
        WHERE len(ws) >= 20
          AND len(list_distinct(ws))::DOUBLE / len(ws) >= 0.3
          AND len(list_filter(ws, w -> w IN {_DUCK_MARKERS})) > 0),
    ek AS (
        SELECT MIN(doc_id) AS doc_id FROM q GROUP BY md5(text)),
    e AS (
        SELECT q.* FROM q JOIN ek USING (doc_id)),
    s AS MATERIALIZED (
        SELECT doc_id,
               list_sort(list_distinct(list_transform(
                   generate_series(1, greatest(len(ws) - 2, 1)),
                   i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]))) AS sh
        FROM e),
    pfx AS (
        SELECT doc_id,
               unnest(sh[1 : len(sh) - CAST(ceil(0.5 * len(sh)) AS INT) + 1])
                   AS p
        FROM s),
    cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM pfx a JOIN pfx b ON a.p = b.p AND a.doc_id < b.doc_id),
    drops AS (
        SELECT DISTINCT cand.doc_b AS doc_id
        FROM cand JOIN s a ON a.doc_id = cand.doc_a
                  JOIN s b ON b.doc_id = cand.doc_b
        WHERE len(list_intersect(a.sh, b.sh))::DOUBLE
              / len(list_distinct(list_cat(a.sh, b.sh))) >= 0.5),
    n AS (
        SELECT * FROM e
        WHERE NOT EXISTS (SELECT 1 FROM drops WHERE drops.doc_id = e.doc_id))
    SELECT 0 AS stage_idx, 'input' AS stage,
           COUNT(*) AS n_docs, SUM(len(ws))::BIGINT AS n_tokens FROM d
    UNION ALL SELECT 1, 'quality_filter', COUNT(*), SUM(len(ws))::BIGINT FROM q
    UNION ALL SELECT 2, 'exact_dedup', COUNT(*), SUM(len(ws))::BIGINT FROM e
    UNION ALL SELECT 3, 'near_dedup', COUNT(*), SUM(len(ws))::BIGINT FROM n
    ORDER BY stage_idx
"""

ORACLE = {
    "corpus_pipeline": _CORPUS_PIPELINE_SQL,
    "corpus_filter": """
        WITH d AS (
            SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS ws
            FROM documents),
        m AS (
            SELECT doc_id, len(ws) AS n_tokens,
                   len(list_distinct(ws))::DOUBLE / len(ws) AS ttr,
                   len(list_filter(ws, w -> w IN ('the', 'a', 'and', 'of', 'der', 'die', 'und', 'das', 'le', 'la', 'et', 'les', 'el', 'los', 'y', 'las'))) AS n_markers
            FROM d)
        SELECT doc_id, n_tokens,
               CASE WHEN n_tokens < 20 THEN 'too_short'
                    WHEN ttr < 0.3 THEN 'low_diversity'
                    WHEN n_markers = 0 THEN 'no_stopwords'
                    ELSE 'kept' END AS verdict,
               (CASE WHEN n_tokens < 20 THEN 'too_short'
                     WHEN ttr < 0.3 THEN 'low_diversity'
                     WHEN n_markers = 0 THEN 'no_stopwords'
                     ELSE 'kept' END) = 'kept' AS keep
        FROM m
    """,
    "decontaminate": f"""
        WITH toks AS (SELECT doc_id, source, {_DUCK_WS} AS ws FROM documents),
        grams AS (SELECT doc_id, source,
                   unnest(list_distinct(CASE WHEN len(ws) >= {NGRAM} THEN
                       list_transform(generate_series(1, len(ws) - {NGRAM - 1}),
                          i -> array_to_string(ws[i:i+{NGRAM - 1}], ' '))
                       ELSE CAST([] AS VARCHAR[]) END)) AS gram
                  FROM toks),
        ev AS (SELECT DISTINCT gram FROM grams WHERE source = '{EVAL_SOURCE}')
        SELECT g.doc_id, count(*) AS n_shared_grams
        FROM grams g JOIN ev USING (gram)
        WHERE g.source <> '{EVAL_SOURCE}'
        GROUP BY g.doc_id
    """,
    "doc_chunks": _CHUNKS_SQL,
    "udtf_doc_chunks": _CHUNKS_SQL,
    "sequence_packing": f"""
        WITH t AS (SELECT doc_id,
                          doc_id % {PACK_SHARDS} AS shard,
                          (doc_id * 2654435761) % 1000003 AS skey,
                          len({_DUCK_WS}) AS n_tokens
                   FROM documents),
        c AS (SELECT shard, doc_id, n_tokens,
                     SUM(n_tokens) OVER (PARTITION BY shard
                                         ORDER BY skey, doc_id
                                         ROWS UNBOUNDED PRECEDING) AS cum
              FROM t)
        SELECT shard, CAST(FLOOR((cum - n_tokens) / {PACK_BUDGET}.0) AS BIGINT)
                   AS bin,
               count(*) AS n_docs, SUM(n_tokens)::BIGINT AS total_tokens
        FROM c GROUP BY shard, bin
    """,
}
