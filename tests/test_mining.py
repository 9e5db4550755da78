"""Tests for the mining extension family (queries/mining.py): PageRank
verified against a numpy power iteration (the operator is iterative and
has no SQL oracle), and PII redaction verified against the planted
entity counts."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from api_to_parquet_spark.queries import mining


def test_pagerank_matches_numpy(spark, sf_smoke):
    got = {
        r["node"]: r["rank"]
        for r in mining.q_pagerank_events(spark, sf_smoke).collect()
    }
    assert got, "pagerank returned no rows"
    assert abs(sum(got.values()) - 1.0) < 1e-3  # rank mass conserved

    # Rebuild the transition graph independently (pandas, per-user sort)
    # and run a dense power iteration.
    e = (
        spark.read.parquet(f"{sf_smoke}/events.parquet")
        .select("user_id", "ts", "event_id", "event_type")
        .toPandas()
        .sort_values(["user_id", "ts", "event_id"])
    )
    edges: dict[tuple[str, str], int] = {}
    for _, g in e.groupby("user_id"):
        types = g["event_type"].tolist()
        for a, b in zip(types, types[1:]):
            edges[(a, b)] = edges.get((a, b), 0) + 1
    nodes = sorted({a for a, _ in edges} | {b for _, b in edges})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    m = np.zeros((n, n))
    for (a, b), w in edges.items():
        m[idx[a], idx[b]] = w
    m = m / m.sum(axis=1, keepdims=True)
    r = np.full(n, 1.0 / n)
    for _ in range(mining.PR_ITERS):
        r = (1 - mining.PR_DAMPING) / n + mining.PR_DAMPING * (r @ m)
    for node in nodes:
        assert got[node] == pytest.approx(r[idx[node]], abs=1e-5), node


def test_pii_redact_catches_every_planted_entity(spark, sf_smoke):
    out = mining.q_pii_redact(spark, sf_smoke)
    rows = out.collect()
    assert rows
    for r in rows:
        assert (r["n_emails"], r["n_phones"], r["n_ips"]) == (1, 1, 1), r
        assert "[EMAIL]" in r["redacted"]
        assert "[PHONE]" in r["redacted"]
        assert "[IP]" in r["redacted"]
        assert "@" not in r["redacted"]
    # nothing digit-shaped survives redaction besides the +1 country code
    leak = out.filter(
        F.regexp_count("redacted", F.lit(r"\d{3,}")) > 0
    ).count()
    assert leak == 0


def test_fk_integrity_clean_star_schema(spark, sf_smoke):
    rows = mining.q_fk_integrity(spark, sf_smoke).collect()
    assert len(rows) == len(mining._FK_CHECKS)
    assert all(r["n_orphans"] == 0 for r in rows)
    assert all(r["n_child"] > 0 for r in rows)
