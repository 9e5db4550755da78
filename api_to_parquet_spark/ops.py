"""Scale operations: small-file compaction, bucketed tables for
shuffle-free joins, and skew salting.

The reference writes ONE parquet file per POST (/root/reference/
src/main.go:288-306): at 1000 req/load-test that is 1000 files
(BASELINE.md), and at 100 TB it is millions of tiny files — the classic
lake killer (every query pays per-file open + footer read; the driver
lists them all). These operators are the remedies a Spark-native lake
needs on day one.
"""

from __future__ import annotations

import math
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from api_to_parquet_spark.lake import read_partition
from api_to_parquet_spark.schemas import PARTITION_COLUMNS

TARGET_FILE_BYTES = 128 * 1024 * 1024  # align with parquet.block.size


def _dir_bytes(spark: SparkSession, path: str) -> int:
    """Recursive on-disk size of a lake subtree (works for any Hadoop
    filesystem scheme — local, HDFS, object stores)."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return int(fs.getContentSummary(jpath).getLength())


def compact_partition(
    spark: SparkSession,
    lake_path: str,
    source: str,
    year: int,
    month: int,
    day: int,
    hour: int,
    target_file_bytes: int = TARGET_FILE_BYTES,
) -> int:
    """Rewrite one hour-partition's files into ~row-group-sized files —
    ceil(bytes / target) write tasks, at most one file per file_key
    subtree per task.

    The file_key partition level (= one POST) is PRESERVED: replaying a
    `file` key must still replace exactly that batch (README.md:88
    parity), and on plain parquet that contract is only enforceable at
    directory granularity. Collapsing across file keys needs row-level
    deletes, i.e. a transactional table format (Iceberg/Delta) — noted
    as the upgrade path, not silently broken here.

    Two-step copy through a staging directory: Spark cannot safely
    overwrite a path it is lazily reading from, so the partition is
    materialized to staging first, then written back with dynamic
    partition overwrite (which replaces exactly this partition's
    subtree).

    Returns the number of coalesced write tasks.
    """
    part = read_partition(spark, lake_path, source, year, month, day, hour)
    n_bytes = _dir_bytes(
        spark,
        f"{lake_path}/source={source}/year={year}/month={month}"
        f"/day={day}/hour={hour}",
    )
    n_files = max(1, math.ceil(n_bytes / target_file_bytes))
    staging = tempfile.mkdtemp(prefix="compact_")
    try:
        part.write.mode("overwrite").parquet(staging)
        staged = spark.read.parquet(staging)
        # re-attach the partition columns pruned into the directory path
        for col, val in zip(
            PARTITION_COLUMNS, [source, year, month, day, hour], strict=False
        ):
            if col not in staged.columns:
                staged = staged.withColumn(col, F.lit(val))
        (
            staged.coalesce(n_files)
            .write.mode("overwrite")
            .partitionBy(*PARTITION_COLUMNS)
            .parquet(lake_path)
        )
    finally:
        shutil.rmtree(staging, ignore_errors=True)
    return n_files


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    n_buckets: int,
    path: str,
) -> None:
    """Persist a table bucketed (and sorted) by the join key: two tables
    bucketed the same way join with ZERO shuffle — each task reads
    matching bucket files from both sides. At 100 TB this converts the
    biggest recurring fact-fact join from a full shuffle into a local
    merge per bucket."""
    (
        df.write.mode("overwrite")
        .format("parquet")
        .option("path", path)
        .bucketBy(n_buckets, *bucket_cols)
        .sortBy(*bucket_cols)
        .saveAsTable(table_name)
    )


def salted_agg(
    df: DataFrame,
    key_cols: list[str],
    agg_specs: dict[str, str],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase aggregation for skewed grouping keys: partial aggregate
    on (key, salt) spreads one hot key over n_salts reducers, then a
    final (cheap — one row per key per salt) aggregate merges. Only
    re-aggregable functions allowed (sum/count/min/max). AQE rebalances
    skewed *joins* automatically but not skewed aggregation keys — this
    is the manual remedy.
    """
    mergers = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
    firsts = {"sum": F.sum, "count": F.count, "min": F.min, "max": F.max}
    for fn in agg_specs.values():
        if fn not in mergers:
            raise ValueError(f"{fn} is not re-aggregable; use sum/count/min/max")
    salted = df.withColumn(
        "_salt", (F.rand(seed=42) * n_salts).cast("int")
    )
    partial = salted.groupBy(*key_cols, "_salt").agg(
        *[
            firsts[fn](c).alias(f"_p_{c}_{fn}")
            for c, fn in agg_specs.items()
        ]
    )
    return partial.groupBy(*key_cols).agg(
        *[
            mergers[fn](f"_p_{c}_{fn}").alias(f"{fn}_{c}")
            for c, fn in agg_specs.items()
        ]
    )


def salted_join(
    skewed: DataFrame,
    small: DataFrame,
    on: list[str],
    n_salts: int = 16,
) -> DataFrame:
    """Skew-resistant equi-join: the skewed side gets a random salt in
    [0, n_salts); the small side is replicated n_salts times. A hot key's
    rows then land on n_salts different reducers instead of one. Use when
    the small side is too big to broadcast but a handful of keys dominate
    the skewed side; otherwise prefer broadcast or AQE's skew-join."""
    salted_l = skewed.withColumn(
        "_salt", (F.rand(seed=42) * n_salts).cast("int")
    )
    salted_r = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return salted_l.join(salted_r, [*on, "_salt"]).drop("_salt")
