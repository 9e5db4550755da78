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


def test_connected_components_adversarial_topologies(spark):
    """Star contraction must solve the topologies that break label
    propagation: a long PATH (diameter = n, the worst case for
    propagation's O(diameter) rounds) and a large STAR, converging in
    O(log n) alternations, with exact components."""
    import math

    from pyspark.sql import functions as F

    from api_to_parquet_spark.dedup import connected_components

    # long path 0-1-2-...-255 (+ a disjoint triangle to prove isolation)
    n = 256
    path = [(i, i + 1) for i in range(n - 1)]
    tri = [(1000, 1001), (1001, 1002), (1000, 1002)]
    edges = spark.createDataFrame(path + tri, "doc_a: long, doc_b: long")
    # driver_max_edges=0 forces the DISTRIBUTED star loop — these
    # topologies exist to exercise it (the small-graph fast path would
    # otherwise absorb every test-sized graph)
    labels, rounds = connected_components(edges, driver_max_edges=0)
    got = {r["n"]: r["component"] for r in labels.collect()}
    assert all(got[i] == 0 for i in range(n))
    assert all(got[i] == 1000 for i in (1000, 1001, 1002))
    # label propagation would need ~n rounds; star contraction stays
    # logarithmic (2x slack over lg 256 = 8 for the alternation constant)
    assert rounds <= 2 * int(math.log2(n)) + 2, rounds

    # large star: hub 5000 with 400 leaves, hub is NOT the min id
    star = [(5000, 6000 + i) for i in range(400)] + [(5000, 10)]
    edges = spark.createDataFrame(star, "doc_a: long, doc_b: long")
    labels, rounds = connected_components(edges, driver_max_edges=0)
    got = {r["n"]: r["component"] for r in labels.collect()}
    assert set(got.values()) == {10}
    assert rounds <= 4, rounds


def test_connected_components_driver_path_matches_distributed(spark):
    """The round-14 small-graph fast path (driver union-find under
    CC_DRIVER_MAX_EDGES) must label EXACTLY like the distributed star
    loop, on a random graph with duplicate and reversed edges, and on
    string node ids (the kql graph-mark-components dtype)."""
    import random

    from api_to_parquet_spark.dedup import connected_components

    rng = random.Random(21)
    edges = [
        (rng.randrange(400), rng.randrange(400)) for _ in range(500)
    ]
    edges += [(b, a) for a, b in edges[:50]]  # reversed duplicates
    df = spark.createDataFrame(edges, "doc_a: long, doc_b: long")
    fast, r_fast = connected_components(df)
    slow, r_slow = connected_components(df, driver_max_edges=0)
    assert r_fast == 0 and r_slow >= 1

    def as_map(d):
        return {r["n"]: r["component"] for r in d.collect()}

    assert as_map(fast) == as_map(slow)

    sdf = spark.createDataFrame(
        [("b", "c"), ("a", "b"), ("x", "y")], "doc_a: string, doc_b: string"
    )
    fast_s, _ = connected_components(sdf)
    assert as_map(fast_s) == {
        "a": "a", "b": "a", "c": "a", "x": "x", "y": "x"
    }


def test_connected_components_matches_bruteforce_random(spark):
    """Random sparse graph: star-contraction components == a driver-side
    union-find oracle (the graph is test-sized; the operator never
    collects)."""
    import random

    from api_to_parquet_spark.dedup import connected_components

    rng = random.Random(7)
    nodes = list(range(300))
    edges = [
        (rng.choice(nodes), rng.choice(nodes)) for _ in range(200)
    ]
    edges = [(a, b) for a, b in edges if a != b]
    parent = {i: i for i in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        parent[find(a)] = find(b)
    expected = {}
    touched = {x for e in edges for x in e}
    for x in touched:
        expected.setdefault(find(x), set()).add(x)
    want = {x: min(members) for members in expected.values() for x in members}

    df = spark.createDataFrame(edges, "doc_a: long, doc_b: long")
    labels, _ = connected_components(df)
    got = {r["n"]: r["component"] for r in labels.collect()}
    assert got == want


def test_gopher_rules_thresholds(spark, sf_smoke):
    """The verdict is exactly the conjunction of the published
    thresholds — spot-check the two rules the synthetic corpus actually
    exercises (word-count floor, stopword minimum)."""
    from api_to_parquet_spark.text import q_gopher_rules

    rows = q_gopher_rules(spark, sf_smoke).collect()
    assert rows
    for r in rows:
        if r["n_words"] < 50 or r["n_stop"] < 2:
            assert not r["passes"]
        if r["passes"]:
            assert 50 <= r["n_words"] <= 100000 and r["n_stop"] >= 2
            assert 3 <= r["mean_word_len"] <= 10
    # every column is populated (no silent NULL verdicts on non-empty docs)
    assert all(r["passes"] is not None for r in rows if r["n_words"])
