"""S2 cell functions (round-13): the translator's SQL-fold emission
of geo_point_to_s2cell / geo_s2cell_to_central_point validated
against the pure-Python reference twin (tests/s2_pyref.py — written
independently from the public S2 algorithm description), plus anchor
vectors and the ADX invalid-input contract. H3 stays loud-by-design
(base-cell tables not reproducible from the spec text alone)."""

from __future__ import annotations

import json
import math
import random

import pytest

import s2_pyref as s2
from api_to_parquet_spark.queries.kql import kql


def test_s2_face_center_anchors(spark):
    # level-0 tokens of the six cube-face centers are fixed by the id
    # layout alone: face<<61 | 1<<60 -> hex first digit 2f+1
    r = kql(
        spark,
        "print a = geo_point_to_s2cell(0.0, 0.0, 0),"
        " b = geo_point_to_s2cell(90.0, 0.0, 0),"
        " c = geo_point_to_s2cell(0.0, 90.0, 0),"
        " d = geo_point_to_s2cell(180.0, 0.0, 0),"
        " e = geo_point_to_s2cell(-90.0, 0.0, 0),"
        " f = geo_point_to_s2cell(0.0, -90.0, 0)",
    ).collect()[0]
    assert list(r) == ["1", "3", "5", "7", "9", "b"]


def test_s2_matches_python_reference_grid(spark):
    """The SQL fold and the Python twin must agree token-for-token
    over a deterministic random grid of (point, level) probes — one
    Spark job for all rows (the fold is map-side, no shuffle)."""
    random.seed(131)
    probes = [
        (
            round(random.uniform(-180, 180), 6),
            round(random.uniform(-90, 90), 6),
            random.randint(0, 30),
        )
        for _ in range(80)
    ]
    exprs = ", ".join(
        f"t{n} = geo_point_to_s2cell({lon!r}, {lat!r}, {lvl})"
        for n, (lon, lat, lvl) in enumerate(probes)
    )
    row = kql(spark, f"print {exprs}").collect()[0]
    for n, (lon, lat, lvl) in enumerate(probes):
        assert row[f"t{n}"] == s2.point_to_token(lon, lat, lvl), (
            lon, lat, lvl,
        )


def test_s2_central_point_matches_reference_and_roundtrips(spark):
    random.seed(777)
    toks = [
        s2.point_to_token(
            random.uniform(-180, 180),
            random.uniform(-90, 90),
            random.randint(0, 30),
        )
        for _ in range(40)
    ]
    def _level(t: str) -> int:
        cid = int(t.ljust(16, "0"), 16)
        return 30 - ((cid & -cid).bit_length() - 1) // 2

    exprs = ", ".join(
        f"c{n} = geo_s2cell_to_central_point('{t}'),"
        f" r{n} = geo_point_to_s2cell("
        # re-encode the decoded center at the token's level: must
        # give the token back (bijectivity of the two folds)
        f"todouble(parse_json(geo_s2cell_to_central_point('{t}'))"
        f"['coordinates'][0]),"
        f" todouble(parse_json(geo_s2cell_to_central_point('{t}'))"
        f"['coordinates'][1]), {_level(t)})"
        for n, t in enumerate(toks)
    )
    row = kql(spark, f"print {exprs}").collect()[0]
    for n, t in enumerate(toks):
        got = json.loads(row[f"c{n}"])
        want = s2.token_to_center(t)
        assert got["type"] == "Point"
        assert math.isclose(got["coordinates"][1], want[1], abs_tol=1e-9)
        if abs(want[1]) < 90 - 1e-9:
            # longitude is degenerate at the poles (atan2(±0, ±0)
            # differs between JVM and CPython there; same point)
            assert math.isclose(
                got["coordinates"][0], want[0], abs_tol=1e-9
            )
        assert row[f"r{n}"] == t


def test_s2_invalid_input_contract(spark):
    r = kql(
        spark,
        "print a = geo_point_to_s2cell(200.0, 0.0),"
        " b = geo_point_to_s2cell(0.0, 91.0),"
        " c = geo_s2cell_to_central_point('zz'),"
        " d = geo_s2cell_to_central_point(''),"
        # face 7 (hex 'f...' -> id >> 61 = 7) is invalid
        " e = geo_s2cell_to_central_point('f1'),"
        # odd trailing-zero count (hex '2' = 0b10 -> tz 1) is invalid
        " f = geo_s2cell_to_central_point('0000000000000002')",
    ).collect()[0]
    assert all(r[c] is None for c in ["a", "b", "c", "d", "e", "f"])
    with pytest.raises(ValueError, match="level must be a literal"):
        kql(spark, "print x = geo_point_to_s2cell(0.0, 0.0, 31)")


def test_s2_column_inputs_and_default_level(spark):
    spark.sql(
        "SELECT CAST(-122.3 AS DOUBLE) AS lon, CAST(47.6 AS DOUBLE)"
        " AS lat UNION ALL SELECT 2.294481, 48.858370"
        " UNION ALL SELECT NULL, 10.0"
    ).createOrReplaceTempView("s2pts")
    rows = kql(
        spark,
        "s2pts | extend t = geo_point_to_s2cell(lon, lat),"
        " t20 = geo_point_to_s2cell(lon, lat, 20)"
        " | sort by lon asc nulls first | project t, t20",
    ).collect()
    assert rows[0]["t"] is None
    assert rows[1]["t"] == s2.point_to_token(-122.3, 47.6, 11)
    assert rows[1]["t20"] == s2.point_to_token(-122.3, 47.6, 20)
    assert rows[2]["t"] == s2.point_to_token(2.294481, 48.858370, 11)
    # hierarchy: the level-11 token is the level-20 cell's ancestor —
    # same leading curve position (token prefix property holds for
    # levels on 4-char boundaries only, so compare via cell-id math)
    cid20 = int(rows[1]["t20"].ljust(16, "0"), 16)
    lsb11 = 1 << (2 * (30 - 11))
    parent = (cid20 & ~(2 * lsb11 - 1)) | lsb11
    assert format(parent, "016x").rstrip("0") == rows[1]["t"]


def test_h3_is_loud(spark):
    for q in (
        "print x = geo_point_to_h3cell(-122.3, 47.6)",
        "print x = geo_h3cell_to_central_point('862a1072fffffff')",
    ):
        with pytest.raises(ValueError, match="H3"):
            kql(spark, q)
