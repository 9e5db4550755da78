"""Amplification probe: replicate a testdata SF N× with shifted keys
into scratch, then time a set of registry queries at 1× vs N× — the
measured-scaling evidence PLANS.md cites (wall-clock growth should stay
well under the data growth when shuffles are bounded and filters push).

    python tools/scale_probe.py [sf_dir] [amp] [query ...] [--perturb]

Defaults: sf0.1, 10×, and the round-3 heavy set. Output: one line per
(query, scale) with the best of two warm runs.
"""

from __future__ import annotations

import importlib.util
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

DEFAULT_QUERIES = [
    "kql_series_anomalies",
    "kql_scan",
    "semantic_dedup",
    "dsir_sample",
    "kql_basket",
    "streaming_anomaly",
    "minhash_lsh_pairs",
    "corpus_pipeline",
]

# key column to shift per replicated table (keeps ids globally unique so
# dedup/join cardinalities scale realistically instead of collapsing)
SHIFT_KEYS = {
    "events": ("event_id", "user_id"),
    "documents": ("doc_id",),
    "embeddings": ("vec_id",),
}


def amplify(
    spark, sf_dir: str, amp: int, out_dir: str, perturb: bool = False
) -> None:
    """perturb=True additionally mutates CONTENT per replica (a
    replica-tagged token in document text, a tiny replica-dependent
    offset on embeddings) so replicas model NEW data instead of true
    copies. Without it, key-shift-only replication makes every
    replica of a near-dup cluster a genuine near-dup of every other
    replica, and pair-emitting queries (minhash/simhash/semantic
    dedup) see their OUTPUT grow ~amp² — a property of the amplified
    dataset, not of the plans (round-11 100× probe evidence)."""
    from pyspark.sql import functions as F

    from api_to_parquet_spark.lake import load

    reps = spark.range(amp).withColumnRenamed("id", "rep")
    for table, keys in SHIFT_KEYS.items():
        df = load(spark, sf_dir, table)
        n = df.count()
        out = df.crossJoin(reps)
        for k in keys:
            out = out.withColumn(k, F.col(k) + F.col("rep") * max(n, 100000))
        if perturb and table == "documents":
            # a replica-unique suffix on every SECOND word keeps
            # replicas OUT of each other's shingle/simhash/ngram
            # neighborhoods (simhash in particular is designed to
            # shrug off light edits — a 1-in-8 tag left replicas
            # within its hamming radius and pairs still blew up)
            out = out.withColumn(
                "text",
                F.expr(
                    "array_join(transform(split(text, ' '),"
                    " (_w, _i) -> IF(_i % 2 = 1,"
                    " concat(_w, 'zr', CAST(rep AS STRING)),"
                    " _w)), ' ')"
                ),
            )
        if perturb and table == "embeddings":
            # per-replica SIGN MASK: a deterministic reflection per
            # (rep, dim). An isometry — every intra-replica cosine
            # (the real near-dup structure) is preserved EXACTLY —
            # while cross-replica vectors decorrelate, so sign-band
            # LSH buckets stop holding all 100 replicas of every
            # vector (additive jitter was NOT enough: signs barely
            # flip, buckets still collapsed and candidates grew amp²)
            out = out.withColumn(
                "embedding",
                F.expr(
                    "transform(embedding, (_v, _i) ->"
                    " IF(pmod(hash(rep, _i), 2) = 0, -_v, _v))"
                ),
            )
        out.drop("rep").write.mode("overwrite").parquet(
            f"{out_dir}/{table}.parquet"
        )
    # non-replicated tables pass through untouched (dims stay dims)
    for table in (
        "region nation customer supplier part orders lineitem".split()
    ):
        src = f"{sf_dir}/{table}.parquet"
        if os.path.exists(src):
            load(spark, sf_dir, table).write.mode("overwrite").parquet(
                f"{out_dir}/{table}.parquet"
            )


def main() -> int:
    args = [a for a in sys.argv[1:] if a != "--perturb"]
    perturb = "--perturb" in sys.argv[1:]
    sf_dir = args[0] if len(args) > 0 else "/root/testdata/sf0.1"
    amp = int(args[1]) if len(args) > 1 else 10
    names = args[2:] or DEFAULT_QUERIES

    from api_to_parquet_spark import get_spark

    spark = get_spark("scale_probe")
    spark.sparkContext.setLogLevel("ERROR")
    spec = importlib.util.spec_from_file_location(
        "entry", os.path.join(REPO, "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    qs = mod.queries()

    scratch = tempfile.mkdtemp(prefix="scale_probe_")
    try:
        amplify(spark, sf_dir, amp, scratch, perturb=perturb)
        for name in names:
            for tag, d in (("1x", sf_dir), (f"{amp}x", scratch)):
                try:
                    q = qs[name]
                    q(spark, d).write.format("noop").mode(
                        "overwrite"
                    ).save()  # warm
                    times = []
                    for _ in range(2):
                        t0 = time.perf_counter()
                        q(spark, d).write.format("noop").mode(
                            "overwrite"
                        ).save()
                        times.append(time.perf_counter() - t0)
                    print(f"{name} {tag} {min(times):.2f}s", flush=True)
                except Exception as exc:  # noqa: BLE001
                    print(
                        f"{name} {tag} ERR "
                        + str(exc).split("\n", 1)[0][:120],
                        flush=True,
                    )
    finally:
        shutil.rmtree(scratch, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
