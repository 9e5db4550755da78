"""Invariant tests for the corpus-prep operators (pipeline.py): chunk
coverage/overlap, packing budget accounting, decontamination planted-dup
detection, and UDTF/built-in twin equality."""

from __future__ import annotations

import pyspark.sql.functions as F

from api_to_parquet_spark import pipeline


def test_chunks_cover_every_token_exactly(spark, sf_smoke):
    """Chunk starts advance by STRIDE with CHUNK-token windows, so token
    i of an n-token doc appears in a predictable number of chunks;
    summing chunk_tokens per doc must equal n + overlap-counted extras:
    sum = n + (n_chunks - 1) * (CHUNK - STRIDE) capped by doc end."""
    chunks = pipeline.q_doc_chunks(spark, sf_smoke)
    docs = (
        spark.read.parquet(f"{sf_smoke}/documents.parquet")
        .select("doc_id", F.size(F.split(F.trim("text"), r"\s+")).alias("n"))
    )
    got = (
        chunks.groupBy("doc_id")
        .agg(
            F.sum("chunk_tokens").alias("sum_tokens"),
            F.count("*").alias("n_chunks"),
            F.max("chunk_idx").alias("max_idx"),
        )
        .join(docs, "doc_id")
        .collect()
    )
    assert got
    for r in got:
        # chunk_idx is dense 0..n_chunks-1
        assert r.max_idx == r.n_chunks - 1
        # every chunk start s <= n, count matches ceil(n / STRIDE)
        expected_chunks = (r.n + pipeline.STRIDE - 1) // pipeline.STRIDE
        assert r.n_chunks == expected_chunks
        # each token counted once per chunk containing it; total equals
        # sum over chunks of min(CHUNK, n - start + 1)
        expect = sum(
            min(pipeline.CHUNK, r.n - s)
            for s in range(0, r.n, pipeline.STRIDE)
        )
        assert r.sum_tokens == expect


def test_udtf_twin_matches_builtin(spark, sf_smoke):
    a = pipeline.q_doc_chunks(spark, sf_smoke)
    b = pipeline.q_udtf_doc_chunks(spark, sf_smoke)
    assert a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty()


def test_packing_conserves_docs_and_tokens(spark, sf_smoke):
    packed = pipeline.q_sequence_packing(spark, sf_smoke).collect()
    docs = (
        spark.read.parquet(f"{sf_smoke}/documents.parquet")
        .select(F.size(F.split(F.trim("text"), r"\s+")).alias("n"))
        .agg(F.count("*").alias("docs"), F.sum("n").alias("tokens"))
        .first()
    )
    assert sum(r.n_docs for r in packed) == docs.docs
    assert sum(r.total_tokens for r in packed) == docs.tokens
    # bins are dense from 0 within each shard
    by_shard: dict[int, list] = {}
    for r in packed:
        by_shard.setdefault(r.shard, []).append(r.bin)
    for shard, bins in by_shard.items():
        assert sorted(bins) == list(range(len(bins))), shard
    # a bin only exceeds the budget by less than one trailing doc's
    # tokens (the straddling doc is assigned to the bin it STARTS in)
    max_doc = (
        spark.read.parquet(f"{sf_smoke}/documents.parquet")
        .select(F.max(F.size(F.split(F.trim("text"), r"\s+"))).alias("m"))
        .first()
        .m
    )
    for r in packed:
        assert r.total_tokens < pipeline.PACK_BUDGET + max_doc


def test_decontaminate_flags_eval_docs_planted_in_corpus(spark, sf_smoke):
    """A corpus doc that IS an eval doc (same text, different source)
    must be flagged with at least its own gram count."""
    docs = spark.read.parquet(f"{sf_smoke}/documents.parquet")
    planted = (
        docs.filter(F.col("source") == pipeline.EVAL_SOURCE)
        .limit(1)
        .select(
            (F.col("doc_id") + 1_000_000).alias("doc_id"),
            "text",
            "lang",
            F.lit("srcX").alias("source"),
            "n_chars",
        )
    )
    combined = docs.unionByName(planted)
    import tempfile

    with tempfile.TemporaryDirectory() as tmp:
        combined.write.parquet(f"{tmp}/documents.parquet")
        for t in ("region", "nation"):  # load() only touches documents
            pass
        flagged = {
            r.doc_id
            for r in pipeline.q_decontaminate(spark, tmp).collect()
        }
    planted_id = planted.first().doc_id
    assert planted_id in flagged


def test_cdc_finds_shifted_duplicates(spark, tmp_path):
    """Content-defined chunking must detect a shared passage even when
    one document prefixes it with extra text (boundaries re-align after
    the insertion) — the case whole-document hashing and full-doc
    MinHash dilute away."""
    import pandas as pd

    from api_to_parquet_spark.dedup import q_cdc_shared_chunks

    passage = " ".join(f"tok{i}" for i in range(120))
    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": [
                passage,
                "totally different preamble inserted here " + passage,
                " ".join(f"other{i}" for i in range(120)),
            ],
            "lang": ["en"] * 3,
            "source": ["t"] * 3,
            "n_chars": [len(passage)] * 3,
        }
    )
    docs.to_parquet(tmp_path / "documents.parquet")
    pairs = {
        (r["doc_a"], r["doc_b"]): r["n_shared_chunks"]
        for r in q_cdc_shared_chunks(spark, str(tmp_path)).collect()
    }
    assert (1, 2) in pairs and pairs[(1, 2)] >= 2  # shared passage found
    assert not any(3 in p for p in pairs)  # unrelated doc stays unpaired
