"""Similarity search over the `embeddings` table (array<float> column):
brute-force cosine top-k as the exactness baseline, and a sign-random-
projection LSH variant as the 100 TB scale path.

Cosine math runs entirely in JVM array expressions (zip_with fold in
double precision) — no Python in the hot path; the LSH variant reduces the
candidate set from |Q|x|N| to per-bucket groups before exact re-ranking.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from api_to_parquet_spark.lake import load, spread

N_QUERIES = 10  # query set: vec_id < 10
TOP_K = 5


def dot(a: Column, b: Column) -> Column:
    """Sequential left-to-right double-precision fold — the same
    accumulation order DuckDB's list_dot_product uses, so results agree
    bitwise."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (F.sqrt(dot(a, a)) * F.sqrt(dot(b, b)))


def _vecs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spread(load(spark, sf_dir, "embeddings")).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v"), "label"
    )


def q_knn_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-5 cosine neighbors for each query vector (vec_id < 10).

    The query side is tiny → broadcast; the corpus side streams through
    map-side cosine + per-partition top-k heaps (window over the small
    query-id partitioning). At 1000 executors this is one broadcast + one
    narrow pass over the corpus — no corpus shuffle."""
    # query side from the raw load — 10 rows gain nothing from
    # spread()'s repartition pass (round-14); values identical.
    queries = (
        load(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") < N_QUERIES)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").cast("array<double>").alias("qv"),
        )
    )
    scored = (
        _vecs(spark, sf_dir)
        .join(F.broadcast(queries), F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(cosine(F.col("qv"), F.col("v")), 6).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )


def q_embedding_similar_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs: all pairs with cosine >= 0.45 (the corpus
    max is ~0.51, so this surfaces the closest pairs). All-pairs is the
    verification baseline; q_ann_lsh_topk is the scale path."""
    vecs = _vecs(spark, sf_dir)
    a, b = vecs.alias("a"), vecs.alias("b")
    return (
        a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            F.round(cosine(F.col("a.v"), F.col("b.v")), 6).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= 0.45)
    )


N_TABLES = 8  # independent LSH tables
BITS_PER_TABLE = 4  # sign bits per table

# For neighbors at cosine c, per-bit collision p = 1 - acos(c)/pi; recall
# across tables = 1 - (1 - p^BITS)^TABLES. At c=0.5: p=2/3, recall≈0.83.


def _plane(dim: int, table: int, j: int) -> list[float]:
    """Deterministic pseudo-random hyperplane from an LCG — reproducible
    across runs with no stored model."""
    x = (table * 97 + j + 1) * 2654435761 % (1 << 32)
    out = []
    for _ in range(dim):
        x = (1103515245 * x + 12345) % (1 << 31)
        out.append((x / float(1 << 31)) * 2.0 - 1.0)
    return out


def lsh_buckets(v: Column, dim: int) -> Column:
    """Array of per-table sign-random-projection bucket ids; bucket for
    table t encodes (t, sign bits) so tables never collide."""
    buckets = []
    for t in range(N_TABLES):
        bits = []
        for j in range(BITS_PER_TABLE):
            plane = F.lit(_plane(dim, t, j))  # single array literal node
            bits.append(
                F.when(dot(v, plane) >= 0, F.lit(1 << j)).otherwise(F.lit(0))
            )
        sig = sum(bits[1:], bits[0])
        buckets.append(sig + F.lit(t << 16))
    return F.array(*buckets)


def q_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-k: 8 independent 4-bit sign-random-projection
    tables; candidates = vectors sharing any table bucket with the query;
    exact cosine re-rank over candidates only. Rows-only check (the
    result is approximate by construction); recall against the
    brute-force baseline is asserted in tests/test_similarity.py.

    Scale shape: one narrow pass computes signatures; the candidate join
    shuffles on small (table, bucket) keys; re-rank touches only
    bucket-mates — candidate count is tuned by BITS_PER_TABLE."""
    dim = 64
    vecs = _vecs(spark, sf_dir).withColumn(
        "buckets", lsh_buckets(F.col("v"), dim)
    )
    corpus = vecs.select(
        "vec_id", "v", F.explode("buckets").alias("bucket")
    )
    # query side from the raw load (round-14): 10 rows pay neither the
    # spread repartition nor a second pass over the spread corpus; the
    # bucket signature is a deterministic function of v, so values are
    # identical.
    qraw = (
        load(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") < N_QUERIES)
        .select(
            "vec_id", F.col("embedding").cast("array<double>").alias("v")
        )
        .withColumn("buckets", lsh_buckets(F.col("v"), dim))
    )
    queries = qraw.select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.explode("buckets").alias("bucket"),
    )
    scored = (
        corpus.join(
            F.broadcast(queries),
            (corpus.bucket == queries.bucket)
            & (F.col("vec_id") != F.col("query_id")),
        )
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            "qv",
            "v",
        )
        .distinct()  # a pair may collide in several tables
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("qv"), F.col("v")), 6).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )


N_CENTROIDS = 16
N_PROBE = 4


def q_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF (inverted-file) approximate top-k: a deterministic coarse
    quantizer (centroids = evenly-strided corpus vectors, the k-means++
    seeding idea without the iteration) assigns every vector to its
    nearest centroid map-side; each query probes the N_PROBE nearest
    cells and exact-cosine re-ranks only those cells' members.

    Scale shape: the coarse quantizer is collected to the driver once
    (N_CENTROIDS×dim doubles — kilobytes, like fitting any small model)
    and shipped inside a vectorized pandas_udf closure, so cell
    assignment is a pure map-side pass over the corpus — one Arrow batch
    → one numpy matmul, NO join, NO shuffle, regardless of corpus size.
    (Per-element array expressions were 10x slower here: higher-order-
    function lambdas run interpreted, and 16 centroids × 3 dot-folds per
    row adds up — this is the \"when you must use Python, use Arrow-
    batched numpy\" case.) The probe join is then an equi-join on cell
    id; at real scale use more centroids ∝ sqrt(N) to keep cells
    balanced. Approximate by construction → rows-only check; recall vs
    brute force is asserted in tests/test_similarity.py."""
    from pyspark.sql.functions import pandas_udf

    vecs = _vecs(spark, sf_dir)
    # deterministic stride-sampled centroids (k-means++-style seeding
    # without the iteration), collected once. The fit reads the RAW scan
    # (no spread): count() is answered from parquet metadata and the
    # stride filter pushes down — two trivial jobs instead of shuffles.
    raw = load(spark, sf_dir, "embeddings")
    n_total = raw.count()
    stride = max(1, n_total // N_CENTROIDS)
    cents = (
        raw.filter(F.col("vec_id") % stride == 0)
        .orderBy("vec_id")
        .limit(N_CENTROIDS)
        .select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
        .collect()
    )
    cell_ids = np.array([int(r["vec_id"]) for r in cents])
    C = np.array([r["v"] for r in cents], dtype=np.float64)
    Cn = C / np.linalg.norm(C, axis=1, keepdims=True)

    def _sims(vs: pd.Series) -> "np.ndarray":
        M = np.array(vs.tolist(), dtype=np.float64)
        M /= np.linalg.norm(M, axis=1, keepdims=True)
        return M @ Cn.T  # (batch, N_CENTROIDS) in one BLAS call

    @pandas_udf("long")
    def nearest_cell(vs: pd.Series) -> pd.Series:
        return pd.Series(cell_ids[np.argmax(_sims(vs), axis=1)])

    @pandas_udf("array<long>")
    def probe_cells(vs: pd.Series) -> pd.Series:
        top = np.argsort(-_sims(vs), axis=1)[:, :N_PROBE]
        return pd.Series(list(cell_ids[top]))

    corpus_cells = vecs.select(
        "vec_id", "v", nearest_cell("v").alias("cell")
    )
    # query side: raw load, no spread — 10 rows gain nothing from a
    # repartition pass; broadcast the probe table explicitly (tiny by
    # construction, like knn_bruteforce's query broadcast) so the
    # corpus is never shuffled by cell id (round-14).
    queries = (
        load(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") < N_QUERIES)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").cast("array<double>").alias("qv"),
        )
    )
    query_cells = queries.select(
        "query_id", "qv", F.explode(probe_cells("qv")).alias("cell")
    )
    scored = (
        corpus_cells.join(F.broadcast(query_cells), "cell")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(cosine(F.col("qv"), F.col("v")), 6).alias("cos_sim"),
        )
        # no distinct needed: each corpus vector lives in exactly ONE
        # cell, so a (query, neighbor) pair can only arise once — unlike
        # the multi-table LSH variant above
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )


PQ_M = 8  # subspaces (64-dim -> 8 subvectors of 8 dims)
PQ_K = 64  # codewords per subspace (256 = classic 1-byte codes)
PQ_REFINE = 8  # exact-re-rank the top REFINE*TOP_K ADC candidates


def _pq_fit(
    spark: SparkSession, sf_dir: str
) -> tuple[list["np.ndarray"], int]:
    """Fit per-subspace PQ codebooks on a bounded driver-side sample:
    stride-thinned to <=4096 vectors (corpus-size-independent), then 8
    Lloyd iterations per subspace — deterministic k-means, stride-seeded
    like the IVF coarse quantizer. Returns (codebooks, subvector_dim);
    codebooks[j] is (PQ_K, sub)."""
    raw = load(spark, sf_dir, "embeddings")
    n_total = raw.count()
    stride = max(1, n_total // 4096)
    sample = (
        raw.filter(F.col("vec_id") % stride == 0)
        .select(F.col("embedding").cast("array<double>").alias("v"))
        .collect()
    )
    S = np.array([r["v"] for r in sample], dtype=np.float64)
    S /= np.linalg.norm(S, axis=1, keepdims=True)
    sub = S.shape[1] // PQ_M

    def _fit_codebook(block: "np.ndarray") -> "np.ndarray":
        centers = block[:: max(1, len(block) // PQ_K)][:PQ_K].copy()
        for _ in range(8):
            d = (
                np.sum(centers * centers, axis=1)[None, :]
                - 2.0 * (block @ centers.T)
            )
            assign = np.argmin(d, axis=1)
            for k in range(len(centers)):
                members = block[assign == k]
                if len(members):
                    centers[k] = members.mean(axis=0)
        return centers

    return [
        _fit_codebook(S[:, j * sub : (j + 1) * sub]) for j in range(PQ_M)
    ], sub


def q_ann_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization approximate top-k — the memory-bound scale
    path: each corpus vector is compressed to PQ_M one-byte codes (here
    8 codes vs 64 float64s = 64× smaller), queries score candidates via
    asymmetric distance (per-query lookup table of query-subvector ·
    codeword dots, so an approximate cosine is PQ_M table lookups + adds,
    no float vector ever re-read), and only the top REFINE*TOP_K ADC
    candidates get exact re-ranking against the full vectors. At 100 TB
    the codes table fits where the raw vectors cannot (RAM/SSD tier),
    which is the entire point of PQ; compose with the IVF cell routing
    above (IVF-PQ) when even the codes scan needs pruning.

    Spark shape: codebooks are driver-fit once (_pq_fit: deterministic
    bounded-sample k-means, kilobytes of state) and
    shipped in pandas_udf closures — encoding and ADC scoring are both
    map-side Arrow-batched numpy passes, NO shuffle over the corpus; the
    only wide ops are the per-query top-k windows over candidate rows and
    the small re-rank join. Approximate by construction → rows-only
    check; recall vs brute force asserted in tests/test_similarity.py."""
    from pyspark.sql.functions import pandas_udf

    vecs = _vecs(spark, sf_dir)
    codebooks, sub = _pq_fit(spark, sf_dir)

    @pandas_udf("array<int>")
    def encode(vs: pd.Series) -> pd.Series:
        M = np.array(vs.tolist(), dtype=np.float64)
        M /= np.linalg.norm(M, axis=1, keepdims=True)
        codes = np.empty((len(M), PQ_M), dtype=np.int32)
        for j, cb in enumerate(codebooks):
            block = M[:, j * sub : (j + 1) * sub]
            # nearest codeword by L2 == argmax(2·x·c - |c|²) per subspace
            d = (
                np.sum(cb * cb, axis=1)[None, :]
                - 2.0 * (block @ cb.T)
            )
            codes[:, j] = np.argmin(d, axis=1)
        return pd.Series(list(codes))

    queries = (
        vecs.filter(F.col("vec_id") < N_QUERIES)
        .select("vec_id", "v")
        .collect()
    )
    Q = np.array([r["v"] for r in queries], dtype=np.float64)
    Q /= np.linalg.norm(Q, axis=1, keepdims=True)
    query_ids = np.array([int(r["vec_id"]) for r in queries])
    # luts[q, j, k] = q's subvector_j · codeword_jk  => ADC cosine is
    # sum_j luts[q, j, codes[j]] because both sides are L2-normalized
    luts = np.stack(
        [Q[:, j * sub : (j + 1) * sub] @ codebooks[j].T for j in range(PQ_M)],
        axis=1,
    )  # (n_queries, PQ_M, PQ_K)

    @pandas_udf("array<double>")
    def adc_scores(codes: pd.Series) -> pd.Series:
        C = np.array(codes.tolist(), dtype=np.int64)  # (batch, PQ_M)
        # gather per query: scores (batch, n_queries)
        out = np.zeros((len(C), len(query_ids)), dtype=np.float64)
        for j in range(PQ_M):
            out += luts[:, j, C[:, j]].T  # (batch, n_queries)
        return pd.Series(list(out))

    codes = vecs.select("vec_id", encode("v").alias("codes"))
    cand = (
        codes.select(
            "vec_id",
            F.posexplode(adc_scores("codes")).alias("qidx", "adc"),
        )
        .withColumn(
            "query_id",
            F.element_at(
                F.array(*[F.lit(int(q)) for q in query_ids]),
                F.col("qidx") + 1,
            ),
        )
        .filter(F.col("vec_id") != F.col("query_id"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("adc"), "vec_id")
    shortlist = cand.withColumn("adc_rank", F.row_number().over(w)).filter(
        F.col("adc_rank") <= PQ_REFINE * TOP_K
    )
    qdf = (
        vecs.filter(F.col("vec_id") < N_QUERIES)
        .select(F.col("vec_id").alias("query_id"), F.col("v").alias("qv"))
    )
    rerank = (
        shortlist.join(vecs.select("vec_id", "v"), "vec_id")
        .join(F.broadcast(qdf), "query_id")
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(cosine(F.col("qv"), F.col("v")), 6).alias("cos_sim"),
        )
    )
    w2 = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), "neighbor_id")
    return (
        rerank.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )


def q_ann_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ: the production ANN composition (FAISS's default shape).
    IVF alone still scans full vectors in probed cells; PQ alone still
    ADC-scans the whole codes table. Composed: each vector lives in one
    coarse cell AND is stored as PQ codes, a query touches only its
    N_PROBE cells' codes (both prunings multiply), and the final
    REFINE*TOP_K shortlist re-ranks against full vectors.

    Spark shape: ONE map-side Arrow-batched pass computes (cell, codes)
    per corpus vector; the candidate restriction is an equi-join on cell
    id; ADC scoring runs vectorized on the joined rows; the corpus is
    never shuffled except by cell id. Approximate by construction →
    rows-only check; recall asserted in tests/test_similarity.py."""
    from pyspark.sql.functions import pandas_udf

    vecs = _vecs(spark, sf_dir)
    codebooks, sub = _pq_fit(spark, sf_dir)
    raw = load(spark, sf_dir, "embeddings")
    n_total = raw.count()
    stride = max(1, n_total // N_CENTROIDS)
    cents = (
        raw.filter(F.col("vec_id") % stride == 0)
        .orderBy("vec_id")
        .limit(N_CENTROIDS)
        .select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
        .collect()
    )
    cell_ids = np.array([int(r["vec_id"]) for r in cents])
    C = np.array([r["v"] for r in cents], dtype=np.float64)
    Cn = C / np.linalg.norm(C, axis=1, keepdims=True)

    @pandas_udf("cell long, codes array<int>")
    def cell_and_codes(vs: pd.Series) -> pd.DataFrame:
        M = np.array(vs.tolist(), dtype=np.float64)
        M /= np.linalg.norm(M, axis=1, keepdims=True)
        cells = cell_ids[np.argmax(M @ Cn.T, axis=1)]
        codes = np.empty((len(M), PQ_M), dtype=np.int32)
        for j, cb in enumerate(codebooks):
            block = M[:, j * sub : (j + 1) * sub]
            d = np.sum(cb * cb, axis=1)[None, :] - 2.0 * (block @ cb.T)
            codes[:, j] = np.argmin(d, axis=1)
        return pd.DataFrame({"cell": cells, "codes": list(codes)})

    corpus = vecs.select(
        "vec_id", "v", cell_and_codes("v").alias("cc")
    ).select("vec_id", "v", "cc.cell", "cc.codes")

    queries = (
        vecs.filter(F.col("vec_id") < N_QUERIES)
        .select("vec_id", "v")
        .collect()
    )
    Q = np.array([r["v"] for r in queries], dtype=np.float64)
    Q /= np.linalg.norm(Q, axis=1, keepdims=True)
    query_ids = [int(r["vec_id"]) for r in queries]
    qpos = {q: i for i, q in enumerate(query_ids)}
    luts = np.stack(
        [Q[:, j * sub : (j + 1) * sub] @ codebooks[j].T for j in range(PQ_M)],
        axis=1,
    )  # (n_queries, PQ_M, PQ_K)
    probe = np.argsort(-(Q @ Cn.T), axis=1)[:, :N_PROBE]
    probe_rows = [
        (int(q), int(cell_ids[c]))
        for qi, q in enumerate(query_ids)
        for c in probe[qi]
    ]
    probes_df = spark.createDataFrame(probe_rows, "query_id long, cell long")

    @pandas_udf("double")
    def adc(qid: pd.Series, codes: pd.Series) -> pd.Series:
        C_ = np.array(codes.tolist(), dtype=np.int64)
        qi = np.array([qpos[q] for q in qid], dtype=np.int64)
        out = np.zeros(len(C_), dtype=np.float64)
        for j in range(PQ_M):
            out += luts[qi, j, C_[:, j]]
        return pd.Series(out)

    cand = (
        corpus.join(F.broadcast(probes_df), "cell")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id", "v", adc("query_id", "codes").alias("adc"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("adc"), "vec_id")
    shortlist = cand.withColumn("adc_rank", F.row_number().over(w)).filter(
        F.col("adc_rank") <= PQ_REFINE * TOP_K
    )
    qdf = _vecs(spark, sf_dir).filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    rerank = shortlist.join(F.broadcast(qdf), "query_id").select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        F.round(cosine(F.col("qv"), F.col("v")), 6).alias("cos_sim"),
    )
    w2 = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), "neighbor_id")
    return (
        rerank.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )


_DUCK_COS = (
    "list_dot_product(a.v, b.v)"
    " / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v)))"
)

BAND_N = 4  # sign bands
BAND_BITS = 8  # dims per band at test scales; widens with N (below)
_BAND_TARGET_BUCKET = 16  # sizing goal: ~N/2^bits rows per band code


def _band_bits_for(n: int) -> int:
    """Band width ADAPTS to corpus size (round-11 100× probe finding):
    a FIXED 8-bit code gives candidates ~N²/2^8 per band — the 256×
    constant hides the quadratic law at test scales, and at 100×
    (200k vectors) the candidate join alone held ~300 M rows and
    OOM'd a 48 g local heap. Sizing bits to ceil(log2(N / target))
    keeps expected bucket occupancy ~constant, so candidates scale
    ~N·target instead of N²/2^bits. Floor 8 keeps every test-scale
    run (N <= 2000 at sf0.001-0.1) EXACTLY on the old 8-bit code —
    the static DuckDB oracles stay byte-valid — and the cap 16 is
    the 64-dim layout bound (BAND_N × bits <= dims)."""
    import math

    return max(8, min(16, math.ceil(math.log2(max(n, 1) / _BAND_TARGET_BUCKET + 1))))


def _band_code(t: int, bits: int = BAND_BITS) -> Column:
    """Sign code of dims [bits·t, bits·(t+1)): deterministic,
    model-free, and expressible identically in SQL — so the banded
    near-dup query keeps an exact oracle (unlike the random-hyperplane
    LSH tables)."""
    # try_element_at: a vector shorter than BAND_N*bits dims yields
    # NULL (-> 0-bit) instead of an ANSI out-of-bounds error; current
    # embeddings are 64-dim but the operator must not depend on that.
    bits_cols = [
        F.when(
            F.try_element_at("v", F.lit(t * bits + j + 1)) >= 0,
            F.lit(1 << j),
        ).otherwise(F.lit(0))
        for j in range(bits)
    ]
    return sum(bits_cols[1:], bits_cols[0])


def q_embedding_band_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs, banded-signature scale path: candidates
    are pairs agreeing on ALL sign bits of at least one 8-dim band; only
    candidates get the exact cosine (>= 0.45 kept). vs the all-pairs
    baseline (q_embedding_similar_pairs) this replaces the O(N^2) join
    with one shuffle on (band, code) — at 100 TB the candidate join
    touches ~N * avg_bucket_size rows. Band width adapts to the corpus
    size (one metadata-only count, the same bounded-model-state rule
    the ANN paths follow): wider codes keep bucket occupancy ~constant
    so candidates grow ~linearly, at the cost of recall at a given
    cosine — the standard LSH granularity/recall dial.

    The codes⋈codes self-join shape is deliberate (round-14, measured):
    a groupBy-(band, code) + in-array pair expansion variant (the
    minhash/simhash candidate shape) was tried and REJECTED by an
    interleaved same-session A/B at sf0.1 (1.74 s this shape vs 1.96 s
    restructured, 2.51 s with the bucket table persisted) — the
    self-join's two code projections share their exchange via AQE
    stage reuse, while the grouped-array path adds a collect_list
    aggregate + expansion on the critical path. The band-width count
    reads the raw table (kept from the rework — same value, spread()
    never changes cardinality, no repartition pass for a count)."""
    vecs = _vecs(spark, sf_dir)
    bits = _band_bits_for(load(spark, sf_dir, "embeddings").count())
    codes = vecs.select(
        "vec_id",
        F.posexplode(
            F.array(*[_band_code(t, bits) for t in range(BAND_N)])
        ).alias("band", "code"),
    )
    cand = (
        codes.alias("a")
        .join(
            codes.alias("b"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.code") == F.col("b.code"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("vec_a"), F.col("b.vec_id").alias("vec_b")
        )
        .dropDuplicates(["vec_a", "vec_b"])
    )
    va = vecs.select(F.col("vec_id").alias("vec_a"), F.col("v").alias("v_a"))
    vb = vecs.select(F.col("vec_id").alias("vec_b"), F.col("v").alias("v_b"))
    return (
        cand.join(va, "vec_a")
        .join(vb, "vec_b")
        .select(
            "vec_a",
            "vec_b",
            F.round(cosine(F.col("v_a"), F.col("v_b")), 6).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= 0.45)
    )


def q_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): treat embedding-space near-neighbors as
    duplicates, keep one representative per semantic cluster.

    Shape: candidate pairs from the banded sign-signature join (ONE
    (band, code) shuffle — q_embedding_band_pairs), exact cosine >= 0.45
    keeps an edge, connected components (large/small-star, O(log n)
    rounds) labels clusters, representative = min vec_id. Returns every
    vector with (rep, kept) so downstream joins can either filter
    (kept) or remap (rep). At 100 TB: no all-pairs stage anywhere —
    candidates scale with bucket occupancy, CC rounds with log
    diameter. Oracle: DuckDB recursive-CTE transitive closure over the
    same banded edge set."""
    from api_to_parquet_spark.dedup import connected_components

    edges = q_embedding_band_pairs(spark, sf_dir).select("vec_a", "vec_b")
    labels, _ = connected_components(edges, "vec_a", "vec_b")
    vecs = _vecs(spark, sf_dir).select("vec_id")
    rep = F.coalesce("component", F.col("vec_id"))
    return (
        vecs.join(
            labels.withColumnRenamed("n", "vec_id"), "vec_id", "left"
        )
        .select(
            "vec_id",
            rep.alias("rep"),
            (rep == F.col("vec_id")).alias("kept"),
        )
    )


def _duck_band_code(t: int) -> str:
    terms = [
        f"{1 << j} * CAST((v[{t * BAND_BITS + j + 1}] >= 0) AS INT)"
        for j in range(BAND_BITS)
    ]
    return " + ".join(terms)


_DUCK_BAND_PAIRS = f"""
    WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    codes AS (
        SELECT vec_id, t.band,
               CASE t.band
                   {" ".join(f"WHEN {t} THEN {_duck_band_code(t)}" for t in range(BAND_N))}
               END AS code
        FROM v CROSS JOIN
             (SELECT unnest(generate_series(0, {BAND_N - 1})) AS band) t),
    cand AS (
        SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
        FROM codes a
        JOIN codes b ON a.band = b.band AND a.code = b.code
                    AND a.vec_id < b.vec_id)
    SELECT * FROM (
        SELECT vec_a, vec_b, ROUND({_DUCK_COS}, 6) AS cos_sim
        FROM cand
        JOIN v a ON a.vec_id = cand.vec_a
        JOIN v b ON b.vec_id = cand.vec_b)
    WHERE cos_sim >= 0.45
"""

def q_embedding_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space QA per label: count, mean/min/max L2 norm, and the
    norm of the label centroid (collapsed centroids flag degenerate or
    mis-normalized embedding batches before any retrieval work runs).
    Norms reuse dot()'s sequential fold (bitwise-stable); the centroid is
    a per-dimension aggregate computed by posexplode + grouped avg —
    map-side combine absorbs the dimension expansion."""
    vecs = _vecs(spark, sf_dir).withColumn(
        "nrm", F.sqrt(dot(F.col("v"), F.col("v")))
    )
    norm_stats = vecs.groupBy("label").agg(
        F.count("*").alias("n"),
        F.round(F.avg("nrm"), 6).alias("avg_norm"),
        F.round(F.min("nrm"), 6).alias("min_norm"),
        F.round(F.max("nrm"), 6).alias("max_norm"),
    )
    dims = vecs.select(
        "label", F.posexplode("v").alias("dim", "x")
    )
    centroid = (
        dims.groupBy("label", "dim")
        .agg(F.avg("x").alias("c"))
        .groupBy("label")
        .agg(F.round(F.sqrt(F.sum(F.col("c") * F.col("c"))), 6).alias("centroid_norm"))
    )
    return norm_stats.join(centroid, "label")


def q_normalize_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2 normalization of the embedding column — the standard prelude
    to cosine retrieval (post-normalization, cosine = dot). One narrow
    map-side pass: norm from the same sequential double fold as dot()
    (bitwise-stable accumulation order), plus scalar digests of the
    normalized vector so the oracle compares floats with tolerance
    instead of arrays bit-for-bit."""
    # norm and unit are projected as real columns BEFORE any lambda
    # references them — expressions inside higher-order-function lambdas
    # re-evaluate per element (interpreted, no CSE; PLANS.md).
    withnorm = _vecs(spark, sf_dir).withColumn(
        "nrm", F.sqrt(dot(F.col("v"), F.col("v")))
    )
    unit = withnorm.withColumn(
        "u", F.transform(F.col("v"), lambda x: x / F.col("nrm"))
    )
    return unit.select(
        "vec_id",
        F.round("nrm", 6).alias("l2_norm"),
        F.round(F.element_at("u", 1), 6).alias("head_normalized"),
        F.round(
            F.aggregate("u", F.lit(0.0), lambda acc, x: acc + x), 6
        ).alias("sum_normalized"),
    )


def q_embedding_sq8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector int8 scalar quantization (SQ8 — the FAISS
    ScalarQuantizer storage default, 4x smaller than float32): codes =
    round(255 * (x - min) / (max - min)), dequantized for the
    reconstruction report. Pure map-side array expressions — ZERO
    shuffle at any corpus size; the per-vector min/max live in the row.
    Parity: code_sum is an EXACT integer fold (the quantizer itself is
    value-checked, not just its error statistics); MAE/max-error use
    the sequential index-ordered fold both engines share. Complements
    ann_pq_topk (codebook quantization) with the codebook-free path."""
    v = _vecs(spark, sf_dir)
    d = v.select(
        "vec_id",
        "label",
        "v",
        F.array_min("v").alias("mn"),
        F.array_max("v").alias("mx"),
    ).withColumn(
        "scale",
        F.when(F.col("mx") == F.col("mn"), F.lit(1.0)).otherwise(
            (F.col("mx") - F.col("mn")) / F.lit(255).cast("double")
        ),
    )
    d = d.withColumn(
        "codes",
        F.transform(
            "v",
            lambda x: F.round((x - F.col("mn")) / F.col("scale")).cast(
                "bigint"
            ),
        ),
    )
    errs = F.zip_with(
        "v",
        "codes",
        lambda x, c: F.abs(
            x - (F.col("mn") + c.cast("double") * F.col("scale"))
        ),
    )
    d = d.withColumn("errs", errs)
    esum = F.aggregate("errs", F.lit(0.0), lambda a, x: a + x)
    return d.select(
        "vec_id",
        "label",
        F.size("v").alias("n_dims"),
        F.aggregate(
            "codes", F.lit(0).cast("bigint"), lambda a, x: a + x
        ).alias("code_sum"),
        F.round(esum / F.size("v").cast("double"), 6).alias("mae"),
        F.round(F.array_max("errs"), 6).alias("max_err"),
    )


QUERIES = {
    "embedding_sq8": q_embedding_sq8,
    "knn_bruteforce": q_knn_bruteforce,
    "normalize_embeddings": q_normalize_embeddings,
    "embedding_stats": q_embedding_stats,
    "embedding_similar_pairs": q_embedding_similar_pairs,
    "embedding_band_pairs": q_embedding_band_pairs,
    "semantic_dedup": q_semantic_dedup,
    "ann_lsh_topk": q_ann_lsh_topk,  # no oracle: approximate by design
    "ann_ivf_topk": q_ann_ivf_topk,  # no oracle: approximate by design
    "ann_pq_topk": q_ann_pq_topk,  # no oracle: approximate by design
    "ann_ivfpq_topk": q_ann_ivfpq_topk,  # no oracle: approximate by design
}

ORACLE = {
    "embedding_sq8": """
        WITH v AS (
            SELECT vec_id, label, embedding::DOUBLE[] AS v
            FROM embeddings
        ), p AS (
            SELECT vec_id, label, v,
                   list_min(v)::DOUBLE AS mn, list_max(v)::DOUBLE AS mx
            FROM v
        ), q AS (
            SELECT vec_id, label, v, mn,
                   CASE WHEN mx = mn THEN CAST(1.0 AS DOUBLE)
                        ELSE (mx - mn) / CAST(255 AS DOUBLE) END AS scale
            FROM p
        ), c AS (
            SELECT vec_id, label, v, mn, scale,
                   list_transform(v, x ->
                       CAST(round((x - mn) / scale) AS BIGINT)) AS codes
            FROM q
        ), e AS (
            SELECT vec_id, label, v, codes,
                   list_transform(generate_series(1, len(v)), i ->
                       abs(v[i] - (mn + CAST(codes[i] AS DOUBLE)
                                   * scale))) AS errs
            FROM c
        )
        SELECT vec_id, label, len(v) AS n_dims,
               list_reduce(codes, (a, x) -> a + x) AS code_sum,
               round(list_reduce(errs, (a, x) -> a + x)
                     / CAST(len(v) AS DOUBLE), 6) AS mae,
               round(list_max(errs)::DOUBLE, 6) AS max_err
        FROM e
    """,
    "embedding_band_pairs": _DUCK_BAND_PAIRS,
    "semantic_dedup": f"""
        WITH RECURSIVE pairs AS ({_DUCK_BAND_PAIRS}),
        und AS (
            SELECT vec_a AS a, vec_b AS b FROM pairs
            UNION ALL
            SELECT vec_b, vec_a FROM pairs
        ), reach(n, m) AS (
            SELECT a, b FROM und
            UNION
            SELECT r.n, u.b FROM reach r JOIN und u ON u.a = r.m
        ), comp AS (
            SELECT n, least(min(m), n) AS rep FROM reach GROUP BY n
        )
        SELECT e.vec_id,
               coalesce(c.rep, e.vec_id) AS rep,
               coalesce(c.rep, e.vec_id) = e.vec_id AS kept
        FROM (SELECT vec_id FROM embeddings) e
        LEFT JOIN comp c ON c.n = e.vec_id
    """,
    "knn_bruteforce": f"""
        SELECT query_id, neighbor_id, cos_sim, rank FROM (
            SELECT query_id, neighbor_id, cos_sim,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY cos_sim DESC, neighbor_id) AS rank
            FROM (
                SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
                       ROUND({_DUCK_COS}, 6) AS cos_sim
                FROM (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings) a
                JOIN (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings) b
                  ON a.vec_id < {N_QUERIES} AND b.vec_id != a.vec_id))
        WHERE rank <= {TOP_K}
    """,
    "embedding_stats": """
        WITH v AS (
            SELECT label, embedding::DOUBLE[] AS v,
                   sqrt(list_dot_product(embedding::DOUBLE[],
                                         embedding::DOUBLE[])) AS nrm
            FROM embeddings),
        ns AS (
            SELECT label, COUNT(*) AS n, ROUND(AVG(nrm), 6) AS avg_norm,
                   ROUND(MIN(nrm), 6) AS min_norm,
                   ROUND(MAX(nrm), 6) AS max_norm
            FROM v GROUP BY label),
        dims AS (
            SELECT label, generate_subscripts(v, 1) - 1 AS dim,
                   unnest(v) AS x
            FROM v),
        cent AS (
            SELECT label, ROUND(sqrt(SUM(c * c)), 6) AS centroid_norm
            FROM (SELECT label, dim, AVG(x) AS c FROM dims GROUP BY 1, 2)
            GROUP BY label)
        SELECT ns.label, n, avg_norm, min_norm, max_norm, centroid_norm
        FROM ns JOIN cent ON ns.label = cent.label
    """,
    "normalize_embeddings": """
        SELECT vec_id, ROUND(nrm, 6) AS l2_norm,
               ROUND(v[1] / nrm, 6) AS head_normalized,
               ROUND(list_reduce(list_transform(v, x -> x / nrm),
                                 (acc, x) -> acc + x), 6) AS sum_normalized
        FROM (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm
              FROM (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings))
    """,
    "embedding_similar_pairs": f"""
        SELECT * FROM (
            SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
                   ROUND({_DUCK_COS}, 6) AS cos_sim
            FROM (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings) a
            JOIN (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings) b
              ON a.vec_id < b.vec_id)
        WHERE cos_sim >= 0.45
    """,
}
