"""Fleet-wide physical-plan hygiene: sweep EVERY query in the registry
and enforce the scale invariants the modules claim individually."""

from __future__ import annotations

import importlib.util
import os

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# The ONE sanctioned row-at-a-time Python node: the Python UDTF surface
# demo (SURVEY.md §2.10), whose built-in twin doc_chunks is the scale path.
ROW_PYTHON_ALLOWED = {"udtf_doc_chunks"}


@pytest.fixture(scope="module")
def registry():
    spec = importlib.util.spec_from_file_location(
        "entry", os.path.join(REPO, "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.queries()


def test_no_row_at_a_time_python_anywhere(spark, sf_smoke, registry):
    """BatchEvalPython (per-row Python UDF) must never appear in a plan
    — the sanctioned Python boundary is Arrow-batched
    (ArrowEvalPython / MapInPandas / FlatMapGroupsInPandas), except the
    explicitly-documented UDTF demo."""
    offenders = {}
    for name, fn in registry.items():
        plan = (
            fn(spark, sf_smoke)._jdf.queryExecution().executedPlan().toString()
        )
        if "BatchEvalPython" in plan and name not in ROW_PYTHON_ALLOWED:
            offenders[name] = plan.count("BatchEvalPython")
    assert not offenders, f"row-at-a-time Python UDFs leaked into: {offenders}"


def test_iterative_lineage_stays_flat(spark, sf_smoke, registry):
    """dedup_clusters converges through localCheckpoint-ed rounds: the
    returned plan must be a flat scan of checkpointed partitions, not
    the accumulated join tree of every iteration (persist() does not cut
    lineage; a persist-only loop measured 1242 Exchanges in the final
    plan text)."""
    plan = (
        registry["dedup_clusters"](spark, sf_smoke)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") == 0, plan[:500]
    assert "Scan ExistingRDD" in plan or "LogicalRDD" in plan or "Scan rdd" in plan.lower()
