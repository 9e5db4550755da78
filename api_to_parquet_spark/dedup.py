"""Deduplication operators over the `documents` table — the training-data
pipeline extension set (BASELINE.json north star): exact, bag-of-words,
MinHash+LSH, SimHash, n-gram Jaccard, and connected-component clusters.

All hashing stays JVM-side (xxhash64 / md5+conv); signatures are computed
map-side with zero shuffles, and the only shuffles are the (band, bucket)
candidate grouping and the final pair verification — the shape that
scales to 100 TB of documents.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from api_to_parquet_spark.lake import load, spread

# MinHash parameters — deterministic LCG-generated (a, b) pairs.
MERSENNE_P = 2147483647  # 2^31 - 1
N_HASHES = 64
N_BANDS = 16
ROWS_PER_BAND = 4
JACCARD_THRESHOLD = 0.5


def _lcg_params(n: int = N_HASHES) -> list[tuple[int, int]]:
    x = 123456789
    out = []
    for _ in range(n):
        x = (1103515245 * x + 12345) % (1 << 31)
        a = x % (MERSENNE_P - 1) + 1
        x = (1103515245 * x + 12345) % (1 << 31)
        b = x % MERSENNE_P
        out.append((a, b))
    return out


MINHASH_PARAMS = _lcg_params()


def words(text_col: str = "text") -> Column:
    return F.split(F.trim(F.col(text_col)), r"\s+")


def shingles(ws: Column, k: int = 3, distinct: bool = True) -> Column:
    """Word k-gram shingles (strings), built with array expressions —
    per-row, map-side, no explode needed. distinct=True (the dedup
    default) dedupes per doc; distinct=False keeps multiplicity (needed
    by repetition metrics).

    `ws` MUST be a *projected column reference* (not a nested expression):
    higher-order-function lambdas are interpreted — no codegen, no common-
    subexpression elimination — so a nested `split(...)` here would be
    re-evaluated on every `element_at` call, a >10x slowdown measured at
    sf0.1."""
    gram = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(ws) - (k - 1), F.lit(1))),
        lambda i: F.concat_ws(
            " ", *[F.element_at(ws, i + off) for off in range(k)]
        ),
    )
    return F.array_distinct(gram) if distinct else gram


def shingled_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → (doc_id, sh): words projected before the shingle
    lambda (see shingles() note) and the scan spread across cores —
    shingling is CPU-bound, not IO-bound."""
    d = spread(load(spark, sf_dir, "documents"))
    return d.select("doc_id", words().alias("ws")).select(
        "doc_id", shingles(F.col("ws")).alias("sh")
    )


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: hash-groupBy on content digest (reuses the reference's
    md5-of-content idiom, src/main.go:288-290), keep the smallest doc_id."""
    return (
        load(spark, sf_dir, "documents")
        .groupBy(F.md5("text").alias("text_md5"))
        .agg(F.min("doc_id").alias("keep_doc_id"), F.count("*").alias("n_copies"))
    )


def q_dedup_bag_of_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-insensitive exact dedup: digest of the sorted token array —
    catches shuffled word-for-word duplicates."""
    d = spread(load(spark, sf_dir, "documents"))
    digest = F.md5(F.concat_ws(" ", F.array_sort(words())))
    return d.groupBy(digest.alias("bow_md5")).agg(
        F.min("doc_id").alias("keep_doc_id"), F.count("*").alias("n_copies")
    )


def q_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-gram Jaccard near-dup pairs (j >= 0.5). The all-pairs self
    join is the *verification* baseline the LSH variant is checked
    against; at 100 TB you run q_minhash_lsh_pairs instead."""
    # shingle once, not per join side (persist, round-14 — the
    # cached twin of q_simhash_dup_pairs' fingerprint-once note).
    # LIFETIME (r14 advice): the block is never unpersisted here — the
    # returned DataFrame still references it lazily, so there is no
    # safe in-function release point. bench.py bounds it via
    # clearCache() between reps; a long-lived embedding session that
    # calls this repeatedly should spark.catalog.clearCache() (or
    # df.unpersist() after consuming the result) itself.
    d = shingled_docs(spark, sf_dir).persist()
    a, b = d.alias("a"), d.alias("b")
    inter = F.size(F.array_intersect(F.col("a.sh"), F.col("b.sh")))
    union = F.size(F.array_union(F.col("a.sh"), F.col("b.sh")))
    jac = inter.cast("double") / union
    return (
        a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.round(jac, 6).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
    )


def hashed_shingles(sh: Column) -> Column:
    """Shingle strings → 31-bit integer hashes (xxhash64 folded), the
    MinHash input domain. Project this as its own column before
    minhash_signature — see shingles() on interpreted lambdas."""
    return F.transform(sh, lambda s: F.pmod(F.xxhash64(s), F.lit(1 << 31)))


# A numpy pandas_udf variant of the signature computation was measured
# and REJECTED: at ~50 shingles/doc the Arrow transfer + per-doc Python
# loop costs more than the interpreted JVM folds (0.8s vs 0.55s at
# sf0.1). Revisit only if shingle arrays grow 10x.
def minhash_signature(hs: str = "hs") -> Column:
    """64-element MinHash signature as one array column: each permutation
    is an array_min over an affine rehash of the pre-hashed shingles —
    all computed map-side per row, zero shuffles.

    `hs` is the NAME of a projected column (round-15: the 64
    permutations are one F.expr SQL string — the Column-API/lambda
    construction cost ~64 py4j round-trip clusters of driver time per
    query construction; the parsed trees are identical, pinned bitwise
    by tests/test_dedup_scale.py). It must stay a plain column
    reference: a nested expression would be re-hashed 64x per row
    inside the interpreted lambdas."""
    parts = ", ".join(
        f"array_min(transform({hs},"
        f" _h -> pmod({a} * _h + {b}, {MERSENNE_P})))"
        for a, b in MINHASH_PARAMS
    )
    return F.expr(f"array({parts})")


def lsh_bands(sig: Column) -> Column:
    """Hash each of the 16 bands (4 signature rows) to a bucket key."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(N_BANDS - 1)),
        lambda j: F.xxhash64(F.slice(sig, j * ROWS_PER_BAND + 1, ROWS_PER_BAND), j),
    )


MEGA_BUCKET = 1024  # members; above this, pair expansion is block-joined


def _expand_id_pairs(buckets: DataFrame) -> DataFrame:
    """(ids: sorted array<long>) -> distinct (doc_a, doc_b) pairs, a < b.

    Two exactness-preserving paths, split on bucket size:

    - Normal buckets (near-dup groups, small): in-array expansion — the
      candidate stage stays ONE shuffle + map-side expansion, no
      self-join.
    - Mega-buckets (> MEGA_BUCKET members — a degenerate band value,
      e.g. an all-identical boilerplate corpus): a single task expanding
      size^2/2 pairs in one array would OOM the executor, so members are
      hashed into ceil(size/MEGA_BUCKET) blocks and each member is
      exploded into its block-pair CELLS — row role (i = blk(x),
      j = blk(x)..nb-1) and column role (i = 0..blk(y), j = blk(y)) —
      so the join is a pure EQUI-join on (bucket, i, j). Every join key
      holds ~2*MEGA_BUCKET rows, so per-task work is genuinely bounded
      by ~MEGA_BUCKET^2 comparisons no matter the bucket size (a
      bk-only equi-key would re-serialize the whole bucket through one
      task). Replication cost is size*nb ≈ size^2/MEGA_BUCKET cell rows
      — exactly comparisons/MEGA_BUCKET, the price of distributing
      them. Same pair set, provably: an unordered pair {x, y} with
      blk(x) < blk(y) matches only in cell (blk(x), blk(y)) with x in
      the row role; same-block pairs hit cell (c, c) in both
      orientations and are deduped by least/greatest + distinct.

    `buckets` is deliberately NOT persist()-ed (round-14, measured):
    the three branches (small path, mega row-cells, mega col-cells)
    print as three copies of the upstream lineage in the pre-AQE
    explain, but at RUNTIME AQE's query-stage cache reuses the
    identical band-shuffle exchange across them, so only the cheap
    post-shuffle agg+filter re-runs per branch. A persist() here was
    tried and REJECTED by an interleaved same-session A/B at sf0.1
    (clearCache between reps so no cross-run cache reuse):
    minhash_lsh_pairs 3.0 s unpersisted vs 5.2 s persisted — the
    materialization barrier serializes the DAG and the block-store
    round-trip costs more than the reused-exchange re-reads.
    """
    n_blocks = F.greatest(
        F.ceil(F.size("ids") / MEGA_BUCKET).cast("int"), F.lit(1)
    )
    small = buckets.filter(F.size("ids") <= MEGA_BUCKET)
    big = buckets.filter(F.size("ids") > MEGA_BUCKET)

    small_pairs = small.select(
        F.explode(
            F.flatten(
                F.transform(
                    "ids",
                    lambda x, i: F.transform(
                        F.slice(
                            F.col("ids"),
                            i + 2,
                            F.greatest(F.size("ids") - i - 1, F.lit(0)),
                        ),
                        lambda y: F.struct(
                            x.alias("doc_a"), y.alias("doc_b")
                        ),
                    ),
                )
            )
        ).alias("p")
    ).select("p.doc_a", "p.doc_b")

    # Mega path (round-15 restructure): each member explodes ONCE into
    # its block-pair cells carrying a ROLE tag — role 1 covers cells
    # (blk, blk..nb-1), role 2 covers (0..blk, blk) — and ONE groupBy
    # on (bk, bi, bj) gathers both roles of a cell, whose cross product
    # expands map-side exactly like the small path. The former shape
    # (row_cells JOIN col_cells on the cell key) re-ran the post-shuffle
    # band aggregate once per join side — 3 runs of it per query incl.
    # the small branch (the two mega branches were pure waste on every
    # sane corpus, where mega buckets are EMPTY) — and could not share
    # one exchange because each side's role projection forced its own
    # lineage. Now the whole mega path is one consumer: band agg runs
    # 2x (small + cells), and the cell exchange is the groupBy's own
    # hashpartitioning(bk, bi, bj), preserving the bounded-cell
    # property (~2*MEGA_BUCKET members per key, ~MEGA_BUCKET^2
    # comparisons per task, same bound as the small path's in-array
    # expansion). Same pair set, provably: cell membership per role is
    # unchanged, and the in-cell cross product emits exactly the former
    # join's (doc != doc2) matches as least/greatest pairs into the
    # same final distinct.
    cells = (
        big.select(
            F.xxhash64("ids").alias("bk"),
            n_blocks.alias("nb"),
            F.explode("ids").alias("doc"),
        )
        .select(
            "bk",
            "doc",
            "nb",
            F.pmod(F.xxhash64("doc"), F.col("nb"))
            .cast("int")
            .alias("blk"),
        )
        .select(
            "bk",
            "doc",
            F.explode(
                F.concat(
                    F.transform(
                        F.sequence(F.col("blk"), F.col("nb") - 1),
                        lambda j: F.struct(
                            F.lit(1).alias("role"),
                            F.col("blk").alias("bi"),
                            j.alias("bj"),
                        ),
                    ),
                    F.transform(
                        F.sequence(F.lit(0), F.col("blk")),
                        lambda i: F.struct(
                            F.lit(2).alias("role"),
                            i.alias("bi"),
                            F.col("blk").alias("bj"),
                        ),
                    ),
                )
            ).alias("c"),
        )
        .select("bk", "doc", "c.role", "c.bi", "c.bj")
    )
    grouped = cells.groupBy("bk", "bi", "bj").agg(
        F.collect_list(F.when(F.col("role") == 1, F.col("doc"))).alias(
            "rdocs"
        ),
        F.collect_list(F.when(F.col("role") == 2, F.col("doc"))).alias(
            "cdocs"
        ),
    )
    big_pairs = grouped.select(
        F.explode(
            F.flatten(
                F.transform(
                    "rdocs",
                    lambda x: F.transform(
                        F.filter("cdocs", lambda y: y != x),
                        lambda y: F.struct(
                            F.least(x, y).alias("doc_a"),
                            F.greatest(x, y).alias("doc_b"),
                        ),
                    ),
                )
            )
        ).alias("p")
    ).select("p.doc_a", "p.doc_b")
    return small_pairs.unionByName(big_pairs).distinct()


def _expand_struct_pairs(buckets: DataFrame, keep) -> DataFrame:
    """(ids: sorted array<struct<id, pay>>) -> distinct VERIFIED
    (doc_a, doc_b, pay_a, pay_b) pairs, doc_a < doc_b.

    _expand_id_pairs' two exactness-preserving paths (in-array for
    normal buckets, bounded block-cell equi-join for mega-buckets)
    with each member carrying a fixed-width payload and the verify
    predicate `keep(pay_a, pay_b)` applied WHERE THE PAIR IS BORN:
    inside the array expansion (small path — rejected candidates
    never even explode into rows) and immediately after the cell
    join (mega path). Round-12: the simhash 100x probe was
    candidate-bound — with verification inline, the ~n²/2^bits
    random-collision candidates die in the task that created them
    instead of crossing the distinct shuffle plus two fingerprint
    joins; only true near-dup pairs are ever shuffled. Same pair set
    provably: the predicate is the query's own final filter, applied
    before dedupe instead of after.

    Like _expand_id_pairs, `buckets` is deliberately NOT persisted:
    the three branch copies in the printed plan share one runtime
    exchange via AQE stage reuse, and a persist() was measured slower
    (see _expand_id_pairs)."""
    n_blocks = F.greatest(
        F.ceil(F.size("ids") / MEGA_BUCKET).cast("int"), F.lit(1)
    )
    small = buckets.filter(F.size("ids") <= MEGA_BUCKET)
    big = buckets.filter(F.size("ids") > MEGA_BUCKET)

    small_pairs = small.select(
        F.explode(
            F.flatten(
                F.transform(
                    "ids",
                    lambda x, i: F.filter(
                        F.transform(
                            F.slice(
                                F.col("ids"),
                                i + 2,
                                F.greatest(
                                    F.size("ids") - i - 1, F.lit(0)
                                ),
                            ),
                            lambda y: F.struct(
                                x["id"].alias("doc_a"),
                                y["id"].alias("doc_b"),
                                x["pay"].alias("pay_a"),
                                y["pay"].alias("pay_b"),
                            ),
                        ),
                        lambda p: keep(p["pay_a"], p["pay_b"]),
                    ),
                )
            )
        ).alias("p")
    ).select("p.doc_a", "p.doc_b", "p.pay_a", "p.pay_b")

    # Same round-15 single-exchange cell restructure as _expand_id_pairs
    # (see there), with each member's payload riding its cell rows and
    # the verify predicate applied WHERE THE PAIR IS BORN — inside the
    # in-cell cross product, matching the small path, so rejected
    # candidates never cross the distinct shuffle. keep()'s argument
    # order (row-role payload first) matches the former join's
    # keep(pay, pay2) exactly.
    cells = (
        big.select(
            F.xxhash64("ids").alias("bk"),
            n_blocks.alias("nb"),
            F.explode("ids").alias("m"),
        )
        .select(
            "bk",
            "m",
            "nb",
            F.pmod(F.xxhash64("m.id"), F.col("nb"))
            .cast("int")
            .alias("blk"),
        )
        .select(
            "bk",
            "m",
            F.explode(
                F.concat(
                    F.transform(
                        F.sequence(F.col("blk"), F.col("nb") - 1),
                        lambda j: F.struct(
                            F.lit(1).alias("role"),
                            F.col("blk").alias("bi"),
                            j.alias("bj"),
                        ),
                    ),
                    F.transform(
                        F.sequence(F.lit(0), F.col("blk")),
                        lambda i: F.struct(
                            F.lit(2).alias("role"),
                            i.alias("bi"),
                            F.col("blk").alias("bj"),
                        ),
                    ),
                )
            ).alias("c"),
        )
        .select("bk", "m", "c.role", "c.bi", "c.bj")
    )
    grouped = cells.groupBy("bk", "bi", "bj").agg(
        F.collect_list(F.when(F.col("role") == 1, F.col("m"))).alias(
            "rms"
        ),
        F.collect_list(F.when(F.col("role") == 2, F.col("m"))).alias(
            "cms"
        ),
    )
    big_pairs = grouped.select(
        F.explode(
            F.flatten(
                F.transform(
                    "rms",
                    lambda x: F.transform(
                        F.filter(
                            "cms",
                            lambda y: (y["id"] != x["id"])
                            & keep(x["pay"], y["pay"]),
                        ),
                        lambda y: F.struct(
                            F.least(x["id"], y["id"]).alias("doc_a"),
                            F.greatest(x["id"], y["id"]).alias("doc_b"),
                            F.when(x["id"] < y["id"], x["pay"])
                            .otherwise(y["pay"])
                            .alias("pay_a"),
                            F.when(x["id"] < y["id"], y["pay"])
                            .otherwise(x["pay"])
                            .alias("pay_b"),
                        ),
                    ),
                )
            )
        ).alias("p")
    ).select("p.doc_a", "p.doc_b", "p.pay_a", "p.pay_b")
    return small_pairs.unionByName(big_pairs).distinct()


def q_minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup detection, verified: shingle → 64 minhashes →
    16 bands of 4 → (band, bucket) group for candidates → exact Jaccard
    filter (j >= 0.5) on candidates only.

    Scale shape: signatures are map-side; candidates come from ONE
    shuffle on (band, bucket); exact verification touches only candidate
    pairs, never all pairs. For pairs with j >= 0.89 (this corpus's
    planted dups) band-recall is 1 - (1-0.89^4)^16 ≈ 1 - 1.4e-7, so the
    output equals the exact all-pairs oracle."""
    docs = shingled_docs(spark, sf_dir)
    sigs = docs.select(
        "doc_id", hashed_shingles(F.col("sh")).alias("hs")
    ).select("doc_id", minhash_signature("hs").alias("sig"))
    bands = sigs.select(
        "doc_id", F.posexplode(lsh_bands(F.col("sig"))).alias("band", "bucket")
    )
    # Candidate pairs via ONE groupBy on (band, bucket) + in-array pair
    # expansion — not a bands⋈bands self-join, which would compute the
    # whole shingle→signature lineage twice and shuffle it twice.
    # Pathological mega-buckets take _expand_id_pairs' block-join path
    # (per-task work bounded); the remaining per-bucket bound is the
    # collect_list row itself, ~8 bytes/member — fine to ~10^8 members,
    # beyond which the grouped-array stage should be replaced by feeding
    # the raw (band, bucket, doc) rows straight into the block join.
    buckets = (
        bands.groupBy("band", "bucket")
        .agg(F.collect_list("doc_id").alias("ids"))
        .filter(F.size("ids") > 1)
        .select(F.array_sort("ids").alias("ids"))
    )
    pairs = _expand_id_pairs(buckets)
    # Verification: two joins back to the shingle table. No broadcast
    # hint — candidate volume is data-dependent (tiny here, potentially
    # huge at 100 TB), so AQE picks broadcast-vs-shuffle from runtime
    # stats. A candidate-only variant (shingle just the docs named by
    # pairs, re-read from the raw table) was tried in round 14 and
    # REJECTED by an interleaved same-session A/B at sf0.1 (3.0 s this
    # shape vs 5.1 s candidate-only): the extra semi-join + persist
    # barriers cost more than the two map-side shingle passes, whose
    # scans AQE dedupes where they end in an exchange. Revisit only
    # with evidence from a corpus where shingling dominates the scan.
    sa = docs.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a"))
    sb = docs.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b"))
    jac = (
        F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
        / F.size(F.array_union("sh_a", "sh_b"))
    )
    return (
        pairs.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select("doc_a", "doc_b", F.round(jac, 6).alias("jaccard"))
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
    )


CC_DRIVER_MAX_EDGES = int(
    __import__("os").environ.get("SPARK_GRAFT_CC_DRIVER_MAX_EDGES", "200000")
)


def connected_components(
    edges: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_rounds: int = 64,
    driver_max_edges: int | None = None,
) -> tuple[DataFrame, int]:
    """Connected components over an undirected edge list via alternating
    large-star / small-star rounds (the MapReduce CC algorithm of
    Kiveris et al., "Connected Components in MapReduce and Beyond",
    SoCC'14). Returns ((node, component), rounds) with component = the
    smallest node id in the component.

    Why not plain min-label propagation: propagation needs O(diameter)
    rounds — a 10^6-node near-dup CHAIN (adversarial but real: template
    drift) would take 10^6 join rounds. Star contraction halves tree
    heights every alternation, converging in O(log^2 n) rounds (log n
    observed), each round two shuffles (groupBy + join) — the shape
    that survives 100 TB.

    large-star: every node links its LARGER neighbors to the minimum of
    its closed neighborhood; small-star links the smaller-or-equal ones.
    Both preserve connectivity and strictly shrink tree height; the
    fixpoint is a star forest rooted at component minima. Rounds are
    localCheckpoint-ed — persist() alone would let the logical plan
    grow per iteration (measured: a 1242-Exchange plan text; PLANS.md).
    Round-14 note: a LAZY-checkpoint variant (one fingerprint action
    per round materializing both stars) was measured 2.4x SLOWER at
    sf0.1 — lazy DataFrame checkpoints still block on AQE stage
    execution at construction and the un-persisted intra-round
    double reference recomputes — so the eager per-star shape stays.
    On a cluster swap in checkpoint() for executor-loss survival.

    SMALL-GRAPH FAST PATH (round-14): after the edge list is
    materialized, ONE cheap count decides the strategy — an edge set
    at or under `driver_max_edges` (default CC_DRIVER_MAX_EDGES,
    env-overridable; ~16 bytes/edge, single-digit MB against the 8 g
    driver) is collected and union-find labels it in-process, exactly
    like the ANN paths fit their bounded codebooks driver-side. The
    star loop costs ~3 driver-synchronized jobs per round regardless
    of data size, which dominated wall time on near-dup graphs of a
    few hundred nodes (measured 2.5-4 s of pure job overhead at
    sf0.1); union-find with min-root links yields the identical
    (node, min-id) labeling in microseconds. Any larger edge set
    takes the distributed loop unchanged — the decision is made from
    runtime cardinality, never a constant tuned to one scale.

    NULL node ids are OUT OF CONTRACT for both strategies and cannot
    reach either: the `u != v` pre-filter below evaluates to NULL for
    any NULL-bearing row and drops it BEFORE the strategy split, so
    the driver union-find never compares a None and the two paths
    cannot diverge on dirty edge lists (r14 advice; pinned by
    tests/test_dedup_scale.py::
    test_connected_components_null_ids_dropped_identically).
    """
    e = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint()
    )
    limit = (
        driver_max_edges
        if driver_max_edges is not None
        else CC_DRIVER_MAX_EDGES
    )
    if e.count() <= limit:
        rows = e.collect()
        parent: dict = {}

        def _find(x):
            r = x
            while parent.get(r, r) != r:
                r = parent[r]
            while parent.get(x, x) != x:
                parent[x], x = r, parent[x]
            return r

        for row in rows:
            ru, rv = _find(row[0]), _find(row[1])
            if ru != rv:
                # link the larger root under the smaller: the overall
                # minimum is never re-parented, so every final root IS
                # its component's min id (same order as Spark's
                # least/min — UTF-8 byte order preserves code-point
                # order for strings; numerics are numerics)
                if rv < ru:
                    ru, rv = rv, ru
                parent[rv] = ru
        node_set = {x for row in rows for x in row}
        from pyspark.sql.types import StructField, StructType

        dt = e.schema["u"].dataType
        labels = edges.sparkSession.createDataFrame(
            [(n, _find(n)) for n in sorted(node_set)],
            StructType(
                [
                    StructField("n", dt, False),
                    StructField("component", dt, False),
                ]
            ),
        )
        return labels, 0
    # nodes is consumed exactly once (the final labels join) and reads
    # the checkpointed e — no checkpoint of its own, no upfront job
    # (round-14: the eager nodes checkpoint was one more driver
    # round-trip for a table the final join derives in-line).
    nodes = (
        e.select(F.col("u").alias("n"))
        .union(e.select(F.col("v").alias("n")))
        .distinct()
    )

    def _star(e: DataFrame, large: bool) -> DataFrame:
        adj = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        m = adj.groupBy("u").agg(
            F.least(F.min("v"), F.first("u")).alias("m")
        )
        linked = adj.join(m, "u").filter(
            F.col("v") > F.col("u") if large else F.col("v") < F.col("u")
        ).select(F.col("v").alias("u"), F.col("m").alias("v"))
        if not large:
            # small-star also re-links u itself to its neighborhood min
            linked = linked.union(m.select("u", F.col("m").alias("v")))
        return (
            linked.filter(F.col("u") != F.col("v")).distinct().localCheckpoint()
        )

    def _fingerprint(e: DataFrame) -> tuple:
        # bit_xor, not sum: an order-free combine that cannot overflow
        # BIGINT under ANSI mode
        row = e.agg(
            F.count("*").alias("n"),
            F.expr("bit_xor(xxhash64(u, v))").alias("h"),
        ).collect()[0]
        return (row["n"], row["h"])

    rounds = 0
    fp = _fingerprint(e)
    while rounds < max_rounds:
        e = _star(_star(e, large=True), large=False)
        rounds += 1
        fp2 = _fingerprint(e)
        if fp2 == fp:
            break
        fp = fp2
    # fixpoint: e is a star forest (child -> root); roots label themselves.
    # The groupBy-min is a no-op at the fixpoint (one parent per child)
    # but keeps the answer well-defined if max_rounds cut convergence.
    labels = (
        nodes.join(
            e.select(F.col("u").alias("n"), F.col("v").alias("component")),
            "n",
            "left",
        )
        .groupBy("n")
        .agg(
            F.coalesce(F.min("component"), F.first("n")).alias("component")
        )
        # checkpoint the answer too: callers compose it into further
        # joins (q_dedup_clusters), and the contract is a flat scan —
        # no iteration lineage leaking into downstream plans
        .localCheckpoint()
    )
    return labels, rounds


def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup CLUSTERS: connected components over the LSH pair graph,
    cluster id = smallest doc_id in the component — what a production
    dedup actually keeps (one survivor per cluster), one step past
    pairwise output. Components via alternating star contraction
    (connected_components): O(log^2 n) rounds worst-case vs
    O(diameter) for label propagation — adversarial chain topologies
    are covered by tests/test_mining.py round-count assertions."""
    pairs = q_minhash_lsh_pairs(spark, sf_dir).select("doc_a", "doc_b")
    labels, _ = connected_components(pairs)
    return labels.select(
        F.col("n").alias("doc_id"), F.col("component").alias("cluster_id")
    )


def q_dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware near-dup survivor selection (round-9): cluster the
    LSH pair graph (connected_components over q_minhash_lsh_pairs) and
    keep ONE document per cluster by a quality criterion — here the
    LONGEST text (n_chars, doc_id tiebreak), the standard "keep the
    most complete duplicate" rule production corpus pipelines apply
    instead of min-id. Singleton documents are their own cluster and
    survive unchanged. Shape: the labels join is deliberately UNhinted —
    the CC label table has one row per clustered doc, which at a
    realistic 30-50%% near-dup rate is CORPUS-scale at 100 TB, so a
    forced broadcast would be a hard driver/executor OOM; AQE picks
    broadcast-vs-shuffle from runtime stats (same rationale as the
    minhash verification joins above and semantic_dedup's labels join).
    Survivor choice is ONE window per cluster — no extra corpus scan.
    Oracle: the dedup_clusters recursive CTE + a window argmax."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "n_chars")
    pairs = q_minhash_lsh_pairs(spark, sf_dir).select("doc_a", "doc_b")
    labels, _ = connected_components(pairs)
    labeled = docs.join(
        labels.withColumnRenamed("n", "doc_id"),
        "doc_id",
        "left",
    ).withColumn(
        "cluster_id", F.coalesce(F.col("component"), F.col("doc_id"))
    )
    w = Window.partitionBy("cluster_id").orderBy(
        F.col("n_chars").desc(), F.col("doc_id").asc()
    )
    return (
        labeled.withColumn("_rk", F.row_number().over(w))
        .withColumn(
            "n_members",
            F.count("*").over(Window.partitionBy("cluster_id")),
        )
        .filter(F.col("_rk") == 1)
        .select(
            "cluster_id",
            F.col("doc_id").alias("keep_doc_id"),
            F.col("n_chars").alias("keep_n_chars"),
            "n_members",
        )
    )


# SimHash: 60-bit fingerprint from md5-derived word hashes. md5 is the
# common deterministic hash DuckDB shares, so the oracle can reproduce the
# exact fingerprints (conv(md5[0:15], 16, 10) == ('0x'||md5[0:15])::BIGINT).
SIMHASH_BITS = 60


def word_hash60(w: Column) -> Column:
    return F.conv(F.substring(F.md5(w), 1, 15), 16, 10).cast("long")


def simhash(hs: Column) -> Column:
    """Classic SimHash: for each bit, majority vote over token hashes
    (ties → bit set, 2*cnt >= n). Pure array expressions, map-side.

    `hs` (the per-word 60-bit hashes) MUST be a projected column
    reference: it is referenced in 60 interpreted filter-lambdas — a
    nested expression would md5-hash every word 60x per row."""
    n = F.size(hs)

    def bit_value(b: int) -> Column:
        cnt = F.size(
            F.filter(hs, lambda h: F.shiftright(h, b).bitwiseAND(F.lit(1)) == 1)
        )
        return F.when(2 * cnt >= n, F.lit(1 << b).cast("long")).otherwise(F.lit(0).cast("long"))

    return sum([bit_value(b) for b in range(SIMHASH_BITS)], F.lit(0).cast("long"))


def _simhashed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc SimHash via explode + PACKED SUM aggregates — two 32-bit
    bit-counters per 64-bit sum (round-14: 30 aggregate buffers instead
    of 60, measured 2.15→1.58 s at sf0.1 with byte-identical
    fingerprints on the full corpus; the unpacked explode+sum shape was
    itself 2.7x faster than the 60-interpreted-lambda array expression
    simhash(), which stays as the documented reference). Packing is
    overflow-safe to 2^31-1 tokens per document: each 32-bit field
    gains at most one count per token, but the packed per-token addend
    can be up to 2^32+1, so the signed-64-bit SUM reaches its bound at
    n*(2^32+1) <= 2^63-1, i.e. n < 2^31 — past that, ANSI mode fails
    loudly rather than wrapping (r14 advice). Scale shape: the per-bit
    counting happens in the PARTIAL hash aggregate (words of one doc
    are colocated in its input row), so the exchange carries ONE
    31-column row per document, not the tokenized corpus."""
    # The 30 packed sums and the 60-term majority reconstruction are
    # built as SQL STRINGS, one F.expr each (round-15): composing them
    # through the Column API cost ~10,500 py4j socket round-trips —
    # ~2.1 s of single-threaded driver time per CONSTRUCTION of any
    # simhash query (profiled: recv_into 1.4 s, getActiveSession 0.7 s)
    # — paid on every submission at any scale. The parsed expressions
    # are the identical trees (same functions, same literal types, same
    # left-associated add chain), pinned by
    # tests/test_dedup_scale.py::test_simhash_expr_rewrite_bit_identical
    # against the full sf0.1 corpus at the rewrite commit.
    d = spread(load(spark, sf_dir, "documents"))
    ex = d.select("doc_id", F.explode(words()).alias("w")).select(
        "doc_id", word_hash60(F.col("w")).alias("h")
    )
    aggs = [
        F.expr(
            f"sum((shiftright(h, {2 * b}) & 1)"
            f" + shiftleft(shiftright(h, {2 * b + 1}) & 1, 32))"
        ).alias(f"p{b}")
        for b in range(SIMHASH_BITS // 2)
    ]
    g = ex.groupBy("doc_id").agg(F.count("*").alias("n"), *aggs)
    terms = []
    for b in range(SIMHASH_BITS // 2):
        lo = f"(p{b} & 4294967295)"
        hi = f"shiftright(p{b}, 32)"
        terms.append(
            f"CASE WHEN (2 * {lo}) >= n"
            f" THEN CAST({1 << (2 * b)} AS BIGINT)"
            " ELSE CAST(0 AS BIGINT) END"
        )
        terms.append(
            f"CASE WHEN (2 * {hi}) >= n"
            f" THEN CAST({1 << (2 * b + 1)} AS BIGINT)"
            " ELSE CAST(0 AS BIGINT) END"
        )
    return g.select(
        "doc_id", F.expr(" + ".join(terms)).alias("simhash")
    )


def q_simhash_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _simhashed(spark, sf_dir)


def q_simhash_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance <= 10 (of 60 bits).

    Deliberately all-pairs: pigeonhole banding (split 60 bits into 11
    chunks; ham<=10 ⇒ some chunk matches exactly) only pays when the
    threshold is tight — 11 bands are ~5.5 bits each, so on random
    fingerprints candidate sets approach all-pairs anyway. Band (like
    q_minhash_lsh_pairs) when the threshold is <= ~3 bits of 64; at this
    loose threshold the dense O(n²) bit-XOR is the honest cost."""
    d = (
        _simhashed(spark, sf_dir)
        .localCheckpoint(eager=False)  # fingerprint once, not per side
        .select("doc_id", F.col("simhash").alias("sh"))
    )
    a, b = d.alias("a"), d.alias("b")
    ham = F.bit_count(F.col("a.sh").bitwiseXOR(F.col("b.sh")))
    return (
        a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            ham.alias("hamming"),
        )
        .filter(F.col("hamming") <= 10)
    )


SIMHASH_BAND_BITS = 15  # 60 bits -> 4 bands of 15
SIMHASH_N_BANDS = SIMHASH_BITS // SIMHASH_BAND_BITS
SIMHASH_BAND_HAM = SIMHASH_N_BANDS - 1  # pigeonhole-exact threshold


def q_simhash_band_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BANDED SimHash near-dup pairs at Hamming <= 3 (of 60 bits) — the
    scale path q_simhash_dup_pairs deliberately lacks at its loose
    threshold. Pigeonhole: <= 3 differing bits spread over 4 disjoint
    15-bit bands leave at least one band IDENTICAL, so grouping on
    (band, band_value) yields a candidate set that provably contains
    every qualifying pair — banding here is EXACT, not probabilistic.

    Scale shape (round-12 rework — the 100x probe's 16.9x growth was
    candidate-bound): each band member carries its own 8-byte
    fingerprint into the bucket arrays, so the exact bit_count verify
    runs WHERE EACH PAIR IS BORN (_expand_struct_pairs) — the
    ~n²/2^15 random-collision candidates die inside the expansion
    task instead of crossing a distinct shuffle plus two join-back
    shuffles to the fingerprint table. One fingerprint pass, ONE
    (band, value) shuffle, mega-buckets cell-join-bounded; only true
    near-dup pairs are ever shuffled. Oracle: the all-pairs Hamming
    join at the same threshold."""
    d = _simhashed(spark, sf_dir)
    band_vals = F.array(
        *[
            F.shiftright(F.col("simhash"), b * SIMHASH_BAND_BITS).bitwiseAND(
                F.lit((1 << SIMHASH_BAND_BITS) - 1)
            )
            for b in range(SIMHASH_N_BANDS)
        ]
    )
    bands = d.select(
        F.struct(
            F.col("doc_id").alias("id"), F.col("simhash").alias("pay")
        ).alias("m"),
        F.posexplode(band_vals).alias("band", "val"),
    )
    buckets = (
        bands.groupBy("band", "val")
        .agg(F.collect_list("m").alias("ids"))
        .filter(F.size("ids") > 1)
        .select(F.array_sort("ids").alias("ids"))
    )
    pairs = _expand_struct_pairs(
        buckets,
        lambda pa, pb: F.bit_count(pa.bitwiseXOR(pb))
        <= SIMHASH_BAND_HAM,
    )
    return pairs.select(
        "doc_a",
        "doc_b",
        F.bit_count(
            F.col("pay_a").bitwiseXOR(F.col("pay_b"))
        ).alias("hamming"),
    )


_DUCK_WORDS = "regexp_split_to_array(trim(text), '\\s+')"
_DUCK_SHINGLES = (
    "list_distinct(list_transform("
    " generate_series(1, greatest(len(ws) - 2, 1)),"
    " i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]))"
)
# Oracle-side pairs use the prefix-filter candidate join rather than the
# naive all-pairs cross product: for Jaccard >= t, two sets must share at
# least one element of each other's (|A| - ceil(t*|A|) + 1)-prefix under a
# global element order, so candidates provably include every qualifying
# pair and the exact verify gives identical results (measured 11.3s ->
# 0.6s at sf0.01; four oracles share this CTE, and the driver pays the
# oracle runtime too).
_DUCK_JACCARD_PAIRS = f"""
    WITH w AS (SELECT doc_id, {_DUCK_WORDS} AS ws FROM documents),
    s AS MATERIALIZED (
        SELECT doc_id, list_sort({_DUCK_SHINGLES}) AS sh FROM w),
    pfx AS (
        SELECT doc_id,
               unnest(sh[1 : len(sh)
                          - CAST(ceil({JACCARD_THRESHOLD} * len(sh)) AS INT)
                          + 1]) AS p
        FROM s),
    cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM pfx a JOIN pfx b ON a.p = b.p AND a.doc_id < b.doc_id)
    SELECT * FROM (
        SELECT doc_a, doc_b,
               ROUND(len(list_intersect(a.sh, b.sh))::DOUBLE
                     / len(list_distinct(list_cat(a.sh, b.sh))), 6) AS jaccard
        FROM cand JOIN s a ON a.doc_id = cand.doc_a
                  JOIN s b ON b.doc_id = cand.doc_b)
    WHERE jaccard >= {JACCARD_THRESHOLD}
"""
_DUCK_SIMHASH = f"""
    SELECT doc_id, list_sum(list_transform(generate_series(0, {SIMHASH_BITS - 1}),
        b -> CASE WHEN 2 * len(list_filter(hs, h -> (h >> b) & 1 = 1)) >= len(hs)
                  THEN (1::BIGINT << b) ELSE 0 END))::BIGINT AS simhash
    FROM (SELECT doc_id,
                 list_transform({_DUCK_WORDS},
                     w -> ('0x' || substr(md5(w), 1, 15))::BIGINT) AS hs
          FROM documents)
"""

def q_prefix_filter_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT set-similarity join via prefix filtering (the ppjoin family)
    — the deterministic alternative to MinHash-LSH: if Jaccard(A, B) ≥ t,
    the first |A| - ⌈t·|A|⌉ + 1 elements of A (in a fixed global order)
    must intersect B's prefix, so candidates generated from prefixes
    alone provably include EVERY qualifying pair — no false negatives,
    unlike LSH's probabilistic recall. Ordering tokens by ascending
    document frequency keeps prefixes maximally rare → smallest
    candidate volume.

    Shapes: gram DF is one grouped count; per-doc prefix sort is an
    array sort_array over (df, gram) structs — map-side after one
    broadcast-ish join on gram; candidates come from the same single
    (gram)-bucket expansion the LSH path uses; exact Jaccard verifies
    candidates only. Same oracle as ngram_jaccard_pairs — all three
    candidate strategies (all-pairs, LSH, prefix-filter) must produce
    the identical answer.

    A hash-space candidate variant (xxhash64 every gram up front so the
    df count, rank join, prefix sort and bucket grouping shuffle 8-byte
    longs instead of gram strings) was tried in round 14 and REJECTED
    by an interleaved A/B at sf0.1 — med 19.5/21.6 s hashed vs
    14.7/15.7 s this shape: the per-doc transform+array_distinct and
    the extra hash pass cost more than the narrower shuffles save at
    any candidate-bound scale, AND a 64-bit collision inside two docs'
    gram intersection can push hash-set Jaccard BELOW gram Jaccard
    (e.g. A={a,b,c}, B={a,b,d}, h(a)=h(b): 1/3 < 1/2), so the variant
    silently forfeits this path's defining no-false-negative
    guarantee."""
    t = JACCARD_THRESHOLD
    docs = shingled_docs(spark, sf_dir)
    grams = docs.select("doc_id", F.explode("sh").alias("g"))
    dfc = grams.groupBy("g").agg(F.count("*").alias("df"))
    ranked = grams.join(dfc, "g")
    per_doc = ranked.groupBy("doc_id").agg(
        F.sort_array(
            F.collect_list(F.struct(F.col("df"), F.col("g")))
        ).alias("ordered")
    )
    n = F.size("ordered")
    prefix_len = (n - F.ceil(n * F.lit(t)) + 1).cast("int")
    prefixes = per_doc.select(
        "doc_id",
        F.explode(
            F.transform(
                F.slice("ordered", 1, prefix_len), lambda s: s["g"]
            )
        ).alias("g"),
    )
    buckets = (
        prefixes.groupBy("g")
        .agg(F.collect_list("doc_id").alias("ids"))
        .filter(F.size("ids") > 1)
        .select(F.array_sort("ids").alias("ids"))
    )
    # Full-table verification joins, like q_minhash_lsh_pairs (and for
    # the same measured reason — the round-14 candidate-only variant
    # was interleave-A/B'd slower; see the note there).
    pairs = _expand_id_pairs(buckets)
    sa = docs.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a"))
    sb = docs.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    jac = inter.cast("double") / union
    return (
        pairs.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select("doc_a", "doc_b", F.round(jac, 6).alias("jaccard"))
        .filter(F.col("jaccard") >= t)
    )


CDC_MASK = 15  # boundary when word_hash % 16 == 0 → ~16-word chunks


def q_cdc_shared_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunking dedup: find document pairs sharing
    verbatim PASSAGES even when surrounding text shifted — the case every
    whole-document scheme (exact hash, MinHash on full doc, SimHash)
    dilutes away. Chunk boundaries come from the CONTENT (a word's hash
    matching a mask), not fixed offsets, so inserting a paragraph
    re-aligns chunks after it — the rsync/LBFS trick applied to corpus
    dedup.

    Shape: one shuffle partitions words by doc (the running-sum window
    that numbers chunks), chunk hashing is a grouped md5 over ordered
    words, and the pair join keys on chunk hash — candidate volume is
    shared-content-proportional, so AQE picks the join strategy. Same
    SQL shape is the DuckDB oracle (string_agg ORDER BY)."""
    d = spread(load(spark, sf_dir, "documents")).select("doc_id", "text")
    toks = d.select(
        "doc_id", F.posexplode(words()).alias("pos", "w")
    ).withColumn("h", word_hash60(F.col("w")))
    win = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    chunked = toks.withColumn(
        "chunk_id",
        F.sum((F.col("h") % (CDC_MASK + 1) == 0).cast("long")).over(win),
    )
    chunks = chunked.groupBy("doc_id", "chunk_id").agg(
        F.md5(
            F.concat_ws(
                " ",
                F.transform(
                    F.sort_array(F.collect_list(F.struct("pos", "w"))),
                    lambda x: x["w"],
                ),
            )
        ).alias("chunk_hash"),
        F.count("*").alias("n_words"),
    ).filter(F.col("n_words") >= 3)  # drop sub-phrase noise
    a = chunks.alias("a")
    b = chunks.alias("b")
    return (
        a.join(
            b,
            (F.col("a.chunk_hash") == F.col("b.chunk_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .agg(F.countDistinct("a.chunk_hash").alias("n_shared_chunks"))
    )


REP_K = 8  # repeated-substring gram width (tokens)


def q_repeated_ngram_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document repeated-substring signal — the fixed-width
    refinement of Lee et al. 2022 ("Deduplicating Training Data Makes
    Language Models Better", arXiv:2107.06499) exact-substring dedup:
    a REP_K-token gram occurring in >= 2 distinct documents marks a
    repeated span, and each doc reports its repeated-gram count plus
    the fraction of its tokens covered by such spans (the removal
    candidate mass).

    Spark shape — the suffix-array machinery of the paper collapses to
    two bounded shuffles at fixed k: (1) map-side gram hashing
    (xxhash64 of the 8-token window — per-row transform, no explode
    until the gram rows) grouped BY GRAM to find cross-doc repeats;
    (2) hits re-grouped BY DOC for count + interval-union coverage
    (positions exploded, COUNT DISTINCT — overlap-correct without
    interval logic). Never an all-pairs doc join; gram-shuffle width
    is 8 bytes per gram (hash), not the gram text. The DuckDB oracle
    groups the gram STRINGS themselves, so a hash collision would
    surface as a mismatch (none at corpus scale: ~2^-40).
    Reference scope: the reference repo has no text analytics — this
    extends the training-data operator family (SURVEY.md §2 ext)."""
    d = (
        spread(load(spark, sf_dir, "documents"))
        .select("doc_id", words().alias("ws"))
        .select("doc_id", "ws", F.size("ws").alias("n_tokens"))
    )
    grams = (
        d.filter(F.col("n_tokens") >= REP_K)
        .select(
            "doc_id",
            F.explode(
                F.transform(
                    F.sequence(
                        F.lit(1), F.col("n_tokens") - (REP_K - 1)
                    ),
                    lambda i: F.struct(
                        i.alias("pos"),
                        F.xxhash64(
                            F.concat_ws(" ", F.slice("ws", i, REP_K))
                        ).alias("g"),
                    ),
                )
            ).alias("pg"),
        )
        .select("doc_id", F.col("pg.pos").alias("pos"), F.col("pg.g").alias("g"))
        # persist: the gram stream feeds BOTH the repeated-gram
        # aggregate and the hits join — without the cache the corpus
        # re-tokenizes and re-hashes once per consumer (round-14:
        # measured 1.6→1.1 s at sf0.1). MEMORY_AND_DISK spills at
        # scale; the alternative is a second full scan+hash pass, the
        # same O(corpus) either way but compute-bound instead of
        # IO-bound. LIFETIME (r14 advice): not unpersisted here — the
        # returned DataFrame references it lazily; bench.py bounds it
        # via clearCache() between reps, long-lived library callers
        # should clearCache()/unpersist() after consuming the result.
        .persist()
    )
    # ">= 2 distinct docs" needs only min(doc) != max(doc) — two
    # longs of partial-agg state that collapse duplicates MAP-SIDE,
    # where the original countDistinct carried a per-gram doc-id SET
    # through the shuffle (round-13 100x probe: 22.3x wall growth,
    # distinct-set spill). A window over g was also measured (one
    # g-shuffle, no join) but its full sort lost to the hash
    # agg + equi-join at 100x (47.5s vs 35.1s) — the join stays.
    rep = (
        grams.groupBy("g")
        .agg(F.min("doc_id").alias("d0"), F.max("doc_id").alias("d1"))
        .filter(F.col("d0") != F.col("d1"))
        .select("g")
    )
    hits = grams.join(rep, "g")
    # ONE doc-keyed shuffle for both outputs: repeated-gram count and
    # interval-union coverage as a sorted fold over the hit positions
    # (positions are unique per doc, so the sorted list is strictly
    # increasing and each [pos, pos+K-1] extends the union by
    # min(K, new_end - prev_end) — no 8x position explode, no
    # per-doc distinct set; the list is bounded by doc length)
    per_doc = hits.groupBy("doc_id").agg(
        F.count("*").alias("n_rep"),
        F.sort_array(F.collect_list("pos")).alias("ps"),
    )
    cov_fold = F.expr(
        "aggregate(ps,"
        f" named_struct('c', CAST(0 AS BIGINT), 'e',"
        f" CAST({-REP_K} AS BIGINT)),"
        f" (_a, _p) -> named_struct("
        f"'c', _a.c + least({REP_K}, _p + {REP_K - 1} - _a.e),"
        f" 'e', CAST(_p + {REP_K - 1} AS BIGINT)),"
        " _a -> _a.c)"
    )
    per_doc = per_doc.select(
        "doc_id", "n_rep", cov_fold.alias("cov_tokens")
    )
    return (
        d.select("doc_id", "n_tokens")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            F.coalesce("n_rep", F.lit(0)).alias("n_rep"),
            F.round(
                F.coalesce("cov_tokens", F.lit(0)).cast("double")
                / F.col("n_tokens"),
                6,
            ).alias("coverage"),
        )
    )


QUERIES = {
    "repeated_ngram_spans": q_repeated_ngram_spans,
    "dedup_exact": q_dedup_exact,
    "cdc_shared_chunks": q_cdc_shared_chunks,
    "dedup_bag_of_words": q_dedup_bag_of_words,
    "ngram_jaccard_pairs": q_ngram_jaccard_pairs,
    "minhash_lsh_pairs": q_minhash_lsh_pairs,
    "prefix_filter_pairs": q_prefix_filter_pairs,
    "dedup_clusters": q_dedup_clusters,
    "dedup_keep_best": q_dedup_keep_best,
    "simhash_fingerprint": q_simhash_fingerprint,
    "simhash_dup_pairs": q_simhash_dup_pairs,
    "simhash_band_pairs": q_simhash_band_pairs,
}

ORACLE = {
    "repeated_ngram_spans": r"""
        WITH w AS (
            SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS ws
            FROM documents
        ), d AS (
            SELECT doc_id, ws, len(ws) AS n_tokens FROM w
        ), g0 AS (
            SELECT doc_id, ws,
                   unnest(generate_series(1, len(ws) - 7)) AS pos
            FROM d WHERE len(ws) >= 8
        ), g AS (
            SELECT doc_id, pos,
                   array_to_string(ws[pos : pos + 7], ' ') AS gram
            FROM g0
        ), rep AS (
            SELECT gram FROM g GROUP BY gram
            HAVING COUNT(DISTINCT doc_id) >= 2
        ), hits AS (
            SELECT g.doc_id, g.pos FROM g JOIN rep USING (gram)
        ), nr AS (
            SELECT doc_id, COUNT(*) AS n_rep FROM hits GROUP BY doc_id
        ), cov AS (
            SELECT doc_id, COUNT(DISTINCT p) AS cov_tokens FROM (
                SELECT doc_id, unnest(generate_series(pos, pos + 7)) AS p
                FROM hits
            ) AS ps GROUP BY doc_id
        )
        SELECT d.doc_id, d.n_tokens,
               COALESCE(nr.n_rep, 0) AS n_rep,
               round(CAST(COALESCE(cov.cov_tokens, 0) AS DOUBLE)
                     / d.n_tokens, 6) AS coverage
        FROM d LEFT JOIN nr USING (doc_id) LEFT JOIN cov USING (doc_id)
    """,
    "cdc_shared_chunks": r"""
        WITH toks AS (
            SELECT doc_id,
                   generate_subscripts(
                       regexp_split_to_array(trim(text), '\s+'), 1) AS pos,
                   unnest(regexp_split_to_array(trim(text), '\s+')) AS w
            FROM documents),
        h AS (
            SELECT doc_id, pos, w,
                   ('0x' || substr(md5(w), 1, 15))::BIGINT AS h
            FROM toks),
        chunked AS (
            SELECT doc_id, pos, w,
                   SUM(CASE WHEN h % 16 = 0 THEN 1 ELSE 0 END)
                       OVER (PARTITION BY doc_id ORDER BY pos
                             ROWS UNBOUNDED PRECEDING) AS chunk_id
            FROM h),
        chunks AS (
            SELECT doc_id, chunk_id,
                   md5(string_agg(w, ' ' ORDER BY pos)) AS chunk_hash,
                   COUNT(*) AS n_words
            FROM chunked GROUP BY 1, 2 HAVING COUNT(*) >= 3)
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               COUNT(DISTINCT a.chunk_hash) AS n_shared_chunks
        FROM chunks a JOIN chunks b
          ON a.chunk_hash = b.chunk_hash AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    """,
    "dedup_exact": """
        SELECT md5(text) AS text_md5, min(doc_id) AS keep_doc_id,
               count(*) AS n_copies
        FROM documents GROUP BY 1
    """,
    "dedup_bag_of_words": f"""
        SELECT md5(array_to_string(list_sort({_DUCK_WORDS}), ' ')) AS bow_md5,
               min(doc_id) AS keep_doc_id, count(*) AS n_copies
        FROM documents GROUP BY 1
    """,
    "ngram_jaccard_pairs": _DUCK_JACCARD_PAIRS,
    # LSH recall is ~1 on this corpus (see q_minhash_lsh_pairs), so the
    # exact all-pairs result is the oracle for the LSH pipeline too.
    "minhash_lsh_pairs": _DUCK_JACCARD_PAIRS,
    # prefix filtering is EXACT by theorem — identical all-pairs oracle
    "prefix_filter_pairs": _DUCK_JACCARD_PAIRS,
    # connected components over the same pair graph via recursive CTE:
    # seed every node with itself, propagate along (bidirected) edges,
    # component id = min reachable doc_id.
    "dedup_clusters": f"""
        WITH RECURSIVE
        prs AS MATERIALIZED ({_DUCK_JACCARD_PAIRS}),
        edges AS MATERIALIZED (
            SELECT doc_a, doc_b FROM prs
            UNION ALL
            SELECT doc_b AS doc_a, doc_a AS doc_b FROM prs),
        nodes AS (SELECT DISTINCT doc_a AS doc_id FROM edges),
        reach(doc_id, r) AS (
            SELECT doc_id, doc_id FROM nodes
            UNION
            SELECT e.doc_a, reach.r
            FROM reach JOIN edges e ON reach.doc_id = e.doc_b)
        SELECT doc_id, MIN(r) AS cluster_id FROM reach GROUP BY doc_id
    """,
    # quality-aware survivor: same recursive-CTE components, then a
    # window argmax on (n_chars DESC, doc_id ASC) per cluster;
    # singletons are their own cluster
    "dedup_keep_best": f"""
        WITH RECURSIVE
        prs AS MATERIALIZED ({_DUCK_JACCARD_PAIRS}),
        edges AS MATERIALIZED (
            SELECT doc_a, doc_b FROM prs
            UNION ALL
            SELECT doc_b AS doc_a, doc_a AS doc_b FROM prs),
        nodes AS (SELECT DISTINCT doc_a AS doc_id FROM edges),
        reach(doc_id, r) AS (
            SELECT doc_id, doc_id FROM nodes
            UNION
            SELECT e.doc_a, reach.r
            FROM reach JOIN edges e ON reach.doc_id = e.doc_b),
        lab AS (SELECT doc_id, MIN(r) AS cluster_id FROM reach
                GROUP BY doc_id),
        j AS (SELECT d.doc_id,
                     coalesce(l.cluster_id, d.doc_id) AS cluster_id,
                     d.n_chars
              FROM documents d LEFT JOIN lab l USING (doc_id)),
        rk AS (SELECT *,
                      row_number() OVER (PARTITION BY cluster_id
                          ORDER BY n_chars DESC, doc_id ASC) AS rn,
                      count(*) OVER (PARTITION BY cluster_id) AS nm
               FROM j)
        SELECT cluster_id, doc_id AS keep_doc_id,
               n_chars AS keep_n_chars, CAST(nm AS BIGINT) AS n_members
        FROM rk WHERE rn = 1
    """,
    "simhash_fingerprint": _DUCK_SIMHASH,
    "simhash_dup_pairs": f"""
        SELECT * FROM (
            WITH s AS ({_DUCK_SIMHASH})
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   bit_count(xor(a.simhash, b.simhash)) AS hamming
            FROM s a JOIN s b ON a.doc_id < b.doc_id)
        WHERE hamming <= 10
    """,
    # banding at ham <= 3 is pigeonhole-EXACT, so the all-pairs Hamming
    # join at the same threshold is the oracle.
    "simhash_band_pairs": f"""
        SELECT * FROM (
            WITH s AS ({_DUCK_SIMHASH})
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   bit_count(xor(a.simhash, b.simhash)) AS hamming
            FROM s a JOIN s b ON a.doc_id < b.doc_id)
        WHERE hamming <= {SIMHASH_BAND_HAM}
    """,
}
