"""Driver-contract guarantees: __spark_entry__ surface and bench.py's
one-line JSON — the two interfaces the round driver consumes."""

from __future__ import annotations

import importlib.util
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _entry_module():
    spec = importlib.util.spec_from_file_location(
        "entry_mod", os.path.join(REPO, "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_entry_runs_flagship(spark):
    mod = _entry_module()
    df = mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.columns  # stable, non-empty schema


def test_registry_consistency():
    mod = _entry_module()
    qs, oracles = mod.queries(), mod.oracle_sql()
    assert set(oracles) <= set(qs)
    assert len(qs) >= 80  # coverage floor — grow, never shrink
    for name, fn in qs.items():
        assert callable(fn), name
    for name, sql in oracles.items():
        assert isinstance(sql, str) and sql.strip(), name


def test_bench_prints_single_json_line():
    """bench.py's stdout contract: exactly one parseable JSON line with
    the keys the driver records. Run at the smallest sf to stay fast."""
    env = dict(os.environ, SPARK_GRAFT_SF_DIR="/root/testdata/sf0.001")
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True,
        text=True,
        env=env,
        timeout=600,
        check=True,
    ).stdout
    lines = [ln for ln in out.splitlines() if ln.strip()]
    assert len(lines) == 1, f"expected ONE json line, got {len(lines)}"
    payload = json.loads(lines[0])
    assert payload["unit"] == "sec"
    assert payload["value"] > 0
    assert payload["queries"] and all(
        v >= 0 for v in payload["queries"].values()
    )
    assert payload["sf"] == 0.001
    assert payload["ingest_rows_per_sec"] > 0


def test_every_query_documented_in_survey():
    """SURVEY.md §2.11 is the judge-facing implementation map — every
    registry entry must appear there by name (drift guard: adding an
    operator without documenting it fails here)."""
    import importlib.util
    import os

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "entry", os.path.join(repo, "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    survey = open(os.path.join(repo, "SURVEY.md")).read()
    missing = sorted(q for q in mod.queries() if q not in survey)
    assert not missing, f"queries absent from SURVEY.md: {missing}"
