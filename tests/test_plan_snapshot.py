"""Whole-surface plan-shape regression gate: every registered query's
physical-plan fingerprint (exchanges, sorts, join strategies, cartesian
products, python evals) must match the committed PLANS.json baseline.

A failure means a plan regressed (or improved) — if the change is
deliberate, regenerate with `python tools/plan_snapshot.py` and commit the
diff as documentation of the new shape."""

from __future__ import annotations

import json
import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

PLANS = os.path.join(os.path.dirname(__file__), "..", "PLANS.json")


@pytest.fixture(scope="module")
def baseline():
    with open(PLANS) as f:
        return json.load(f)


def test_every_query_has_a_baseline(baseline):
    from blockchain_etl_spark.plans.registry import get_queries

    missing = sorted(set(get_queries()) - set(baseline))
    assert not missing, (
        f"queries without a plan baseline: {missing} — run tools/plan_snapshot.py"
    )


def test_plan_shapes_match_baseline(spark, baseline):
    from plan_snapshot import collect

    # cached tables from earlier test modules flip scans to
    # InMemoryRelation and change fingerprints — compare cold plans
    spark.catalog.clearCache()
    live = collect(spark)
    diffs = {}
    for name, fp in live.items():
        base = baseline.get(name)
        if base is None:
            continue  # test_every_query_has_a_baseline reports these
        if fp != base:
            diffs[name] = {"baseline": base, "live": fp}
    assert not diffs, (
        "plan shapes drifted (regenerate PLANS.json if deliberate):\n"
        + json.dumps(diffs, indent=1, sort_keys=True)
    )
