"""Mega-bucket-safe candidate pair expansion (dedup._expand_id_pairs)."""

from __future__ import annotations

from pyspark.sql import functions as F

from api_to_parquet_spark import dedup


def _pairs(spark, ids_lists):
    df = spark.createDataFrame([(ids,) for ids in ids_lists], "ids: array<long>")
    rows = dedup._expand_id_pairs(df.select(F.array_sort("ids").alias("ids")))
    return {(r["doc_a"], r["doc_b"]) for r in rows.collect()}


def test_block_join_path_matches_in_array_path(spark, monkeypatch):
    """A bucket above MEGA_BUCKET goes through the block join; forcing
    the threshold down must not change the emitted pair set."""
    ids = list(range(0, 400, 3))  # 134 members
    expected = {(a, b) for i, a in enumerate(ids) for b in ids[i + 1:]}
    assert _pairs(spark, [ids]) == expected  # in-array path (under cap)
    monkeypatch.setattr(dedup, "MEGA_BUCKET", 16)
    assert _pairs(spark, [ids]) == expected  # block-join path (over cap)


def test_mixed_bucket_sizes(spark, monkeypatch):
    monkeypatch.setattr(dedup, "MEGA_BUCKET", 8)
    small = [1, 2, 3]
    big = list(range(100, 140))
    expected = {(1, 2), (1, 3), (2, 3)} | {
        (a, b) for i, a in enumerate(big) for b in big[i + 1:]
    }
    assert _pairs(spark, [small, big]) == expected


def test_duplicate_pairs_across_buckets_dedupe(spark):
    assert _pairs(spark, [[1, 2, 5], [2, 5, 9]]) == {
        (1, 2),
        (1, 5),
        (2, 5),
        (5, 9),
        (2, 9),
    }
