"""Manifest-committed lake snapshots: atomic per-batch replace, time
travel, and vacuum on plain parquet — no table-format jars.

The reference's idempotent replay contract is overwrite-by-`file`-key
(README.md:88, upload at src/main.go:306). A blob PUT of one object is
atomic, but a multi-file Spark rewrite of a directory is NOT: a reader
listing the directory mid-replace sees partial state. This module closes
that gap with the core idea behind Delta/Iceberg, reduced to its
essentials:

- every batch's rows land in a FRESH immutable directory
  (`_data/<hash>-<n>/`) — nothing is ever modified in place;
- a JSON manifest (`_manifests/v<NNNNN>.json`) maps each `file` key to
  its current data directory; committing a batch = writing the next
  manifest version via write-temp + atomic rename;
- readers resolve a manifest ONCE and read exactly its directories —
  a snapshot view that cannot observe a half-replaced batch;
- old versions stay readable (time travel) until `vacuum` drops data
  directories no retained manifest references.

Single-writer by design (versions are assigned by listing — the same
coordination level as the reference's last-write-wins blob PUT; a real
multi-writer deployment puts a lock or log service in front, which is
exactly what Delta's transaction log is). Scale bound worth naming: the
manifest is a full key→dir map, O(live keys) JSON per version — fine to
~10^5 keys; beyond that the log needs segmenting + checkpointing, which
is precisely the part of Delta/Iceberg this module deliberately does
not rebuild. Citations: /root/reference/README.md:88 (overwrite
contract), src/main.go:288-306 (per-POST upload path).
"""

from __future__ import annotations

import json
import posixpath
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from api_to_parquet_spark.schemas import PARTITION_COLUMNS

_MANIFESTS = "_manifests"
_DATA = "_data"


def _fs(spark: SparkSession, path: str):
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    return jvm, jpath.getFileSystem(spark._jsc.hadoopConfiguration())


def _list_versions(spark: SparkSession, root: str) -> list[int]:
    jvm, fs = _fs(spark, root)
    mdir = jvm.org.apache.hadoop.fs.Path(f"{root}/{_MANIFESTS}")
    if not fs.exists(mdir):
        return []
    out = []
    for st in fs.listStatus(mdir):
        name = st.getPath().getName()
        if name.startswith("v") and name.endswith(".json"):
            out.append(int(name[1:-5]))
    return sorted(out)


def _read_manifest(spark: SparkSession, root: str, version: int) -> dict:
    jvm, fs = _fs(spark, root)
    p = jvm.org.apache.hadoop.fs.Path(
        f"{root}/{_MANIFESTS}/v{version:05d}.json"
    )
    stream = fs.open(p)
    try:
        text = jvm.org.apache.commons.io.IOUtils.toString(
            stream, "UTF-8"
        )
    finally:
        stream.close()
    return json.loads(text)


def _write_manifest(
    spark: SparkSession, root: str, version: int, manifest: dict
) -> None:
    """Write-temp + atomic rename: the manifest becomes visible all at
    once or not at all — the commit point."""
    jvm, fs = _fs(spark, root)
    tmp = jvm.org.apache.hadoop.fs.Path(
        f"{root}/{_MANIFESTS}/.tmp-{uuid.uuid4().hex}"
    )
    final = jvm.org.apache.hadoop.fs.Path(
        f"{root}/{_MANIFESTS}/v{version:05d}.json"
    )
    out = fs.create(tmp, False)
    try:
        out.write(json.dumps(manifest, sort_keys=True).encode("utf-8"))
    finally:
        out.close()
    if not fs.rename(tmp, final):
        fs.delete(tmp, False)
        raise RuntimeError(f"concurrent commit detected for v{version}")


def commit_batch(
    spark: SparkSession, root: str, points: DataFrame
) -> int:
    """Commit one ingested batch (normalized points carrying the `file`
    column): each distinct `file` key's rows land in a fresh data
    directory, then the next manifest atomically re-points those keys.
    Returns the committed version number. Replaying a key leaves the old
    directory in place for time travel until vacuum."""
    from pyspark.sql import Window

    # Intra-batch last-write-wins: one micro-batch may carry SEVERAL
    # envelopes for the same `file` key (the reference would apply them
    # as sequential POSTs — final state is the LAST one, main.go:306);
    # keep only rows from each key's max timeGenerated envelope.
    w = Window.partitionBy("file")
    points = (
        points.withColumn(
            "_max_tg", F.max("time_generated").over(w)
        )
        .filter(F.col("time_generated") == F.col("_max_tg"))
        .drop("_max_tg")
    )
    keys = [r[0] for r in points.select("file").distinct().collect()]
    versions = _list_versions(spark, root)
    manifest = (
        _read_manifest(spark, root, versions[-1]) if versions else {}
    )
    for key in keys:
        data_dir = f"{_DATA}/{uuid.uuid4().hex}"
        (
            points.filter(F.col("file") == key)
            .drop(*PARTITION_COLUMNS)
            .write.mode("error")
            .parquet(posixpath.join(root, data_dir))
        )
        manifest[key] = data_dir
    next_version = (versions[-1] + 1) if versions else 0
    _write_manifest(spark, root, next_version, manifest)
    return next_version


def read_snapshot(
    spark: SparkSession, root: str, version: int | None = None
) -> DataFrame:
    """Read one consistent snapshot (latest, or a pinned version for
    time travel). The directory set is resolved from the manifest ONCE
    — concurrent commits cannot change what this DataFrame reads."""
    versions = _list_versions(spark, root)
    if not versions:
        raise FileNotFoundError(f"no snapshots at {root}")
    v = versions[-1] if version is None else version
    manifest = _read_manifest(spark, root, v)
    dirs = [posixpath.join(root, d) for d in sorted(set(manifest.values()))]
    return spark.read.parquet(*dirs)


def history(spark: SparkSession, root: str) -> list[dict]:
    """Version log: one entry per manifest with its key->dir mapping."""
    return [
        {"version": v, "keys": _read_manifest(spark, root, v)}
        for v in _list_versions(spark, root)
    ]


def vacuum(
    spark: SparkSession, root: str, keep_last: int = 1
) -> int:
    """Drop data directories referenced by NO retained manifest (and the
    dropped manifests themselves), keeping the last `keep_last` versions
    readable. Returns the number of data directories removed. The
    Delta VACUUM analogue — time travel shrinks to the retained window."""
    versions = _list_versions(spark, root)
    keep = versions[-keep_last:] if keep_last else []
    retained = set()
    for v in keep:
        retained.update(_read_manifest(spark, root, v).values())
    jvm, fs = _fs(spark, root)
    removed = 0
    ddir = jvm.org.apache.hadoop.fs.Path(f"{root}/{_DATA}")
    if fs.exists(ddir):
        for st in fs.listStatus(ddir):
            rel = f"{_DATA}/{st.getPath().getName()}"
            if rel not in retained:
                fs.delete(st.getPath(), True)
                removed += 1
    for v in versions:
        if v not in keep:
            fs.delete(
                jvm.org.apache.hadoop.fs.Path(
                    f"{root}/{_MANIFESTS}/v{v:05d}.json"
                ),
                False,
            )
    return removed
