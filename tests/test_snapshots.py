"""Manifest-committed snapshots: atomic replace, time travel, vacuum."""

from __future__ import annotations

import json

import pytest

from api_to_parquet_spark import ingest, snapshots


def _points(spark, file, ts_values, tg=1):
    raw = spark.createDataFrame(
        [
            (
                json.dumps(
                    {
                        "content": [
                            {"Timestamp": t, "Value": float(t)}
                            for t in ts_values
                        ],
                        "id": "b",
                        "source": "s",
                        "timeGenerated": tg,
                        "file": file,
                    }
                ),
            )
        ],
        ["value"],
    )
    points, _ = ingest.ingest_batch(raw)
    return points


def test_commit_read_replay_time_travel(spark, tmp_path):
    root = str(tmp_path / "snaplake")
    key = "s/2023/10/26/19/a.parquet"
    v0 = snapshots.commit_batch(spark, root, _points(spark, key, [1, 2, 3]))
    v1 = snapshots.commit_batch(
        spark, root, _points(spark, "s/2023/10/26/20/b.parquet", [10])
    )
    # replay key -> REPLACES its rows in the new version only
    v2 = snapshots.commit_batch(spark, root, _points(spark, key, [99], tg=2))
    assert (v0, v1, v2) == (0, 1, 2)

    latest = sorted(
        r["Timestamp"] for r in snapshots.read_snapshot(spark, root).collect()
    )
    assert latest == [10, 99]  # replaced, not appended
    # time travel: the pre-replay snapshot still reads the old rows
    old = sorted(
        r["Timestamp"]
        for r in snapshots.read_snapshot(spark, root, version=1).collect()
    )
    assert old == [1, 2, 3, 10]


def test_snapshot_isolation_under_replace(spark, tmp_path):
    """A reader that resolved its snapshot BEFORE a replace keeps
    reading the old consistent data — the atomicity the reference's
    directory overwrite cannot give."""
    root = str(tmp_path / "snaplake")
    key = "s/2023/10/26/19/a.parquet"
    snapshots.commit_batch(spark, root, _points(spark, key, [1, 2]))
    reader = snapshots.read_snapshot(spark, root)  # resolves v0's dirs
    snapshots.commit_batch(spark, root, _points(spark, key, [99], tg=2))
    # the pinned reader still sees v0 exactly
    assert sorted(r["Timestamp"] for r in reader.collect()) == [1, 2]


def test_vacuum_drops_only_unreferenced(spark, tmp_path):
    import os

    root = str(tmp_path / "snaplake")
    key = "s/2023/10/26/19/a.parquet"
    snapshots.commit_batch(spark, root, _points(spark, key, [1]))
    snapshots.commit_batch(spark, root, _points(spark, key, [2], tg=2))
    assert len(snapshots.history(spark, root)) == 2
    removed = snapshots.vacuum(spark, root, keep_last=1)
    assert removed == 1  # v0's replaced directory gone
    # latest still fully readable; old version no longer listed
    assert [
        r["Timestamp"] for r in snapshots.read_snapshot(spark, root).collect()
    ] == [2]
    assert len(snapshots.history(spark, root)) == 1
    assert len(os.listdir(f"{root}/_data")) == 1


def test_read_empty_root_raises(spark, tmp_path):
    with pytest.raises(FileNotFoundError):
        snapshots.read_snapshot(spark, str(tmp_path / "nope"))


def test_streaming_ingest_commits_snapshots(spark, tmp_path):
    """Two file-source triggers become two manifest versions; the replay
    of a key in trigger 2 atomically replaces it in the latest snapshot
    while version 0 stays time-travel-readable."""
    import time

    from api_to_parquet_spark import streaming

    def env(file, ts_values, tg):
        return json.dumps(
            {
                "content": [
                    {"Timestamp": t, "Value": float(t)} for t in ts_values
                ],
                "id": f"b{tg}",
                "source": "s",
                "timeGenerated": tg,
                "file": file,
            }
        )

    inp = tmp_path / "in"
    inp.mkdir()
    key = "s/2023/10/26/19/a.parquet"
    (inp / "b1.json").write_text(env(key, [1, 2], 1) + "\n")
    time.sleep(1.1)
    (inp / "b2.json").write_text(env(key, [99], 2) + "\n")
    root = str(tmp_path / "snaplake")
    q = streaming.start_snapshot_ingest_stream(
        spark,
        str(inp),
        root,
        str(tmp_path / "state"),
        checkpoint=str(tmp_path / "ckpt"),
        available_now=True,
    )
    q.awaitTermination(180)
    hist = snapshots.history(spark, root)
    assert len(hist) >= 1
    latest = [
        r["Timestamp"] for r in snapshots.read_snapshot(spark, root).collect()
    ]
    assert sorted(latest) == [99]  # replaced across triggers
