"""OLAP-plan unit tests beyond the oracle sweep: semantics that only show
up on data shapes the synthetic tables don't contain."""

from __future__ import annotations

from pyspark.sql import Row

from blockchain_etl_spark.plans.olap import _EVENT_TYPES, pivot_event_counts


def test_pivot_total_counts_unlisted_event_types(spark):
    """n_total must be COUNT(*) — a 6th event type outside the pivot list
    still counts toward the total (the oracle's COUNT(*)), it never
    silently vanishes."""
    rows = [Row(user_id=1, event_type=t) for t in _EVENT_TYPES]
    rows += [Row(user_id=1, event_type="refund")]  # not in the pivot list
    rows += [Row(user_id=2, event_type="click"), Row(user_id=2, event_type="refund")]
    df = spark.createDataFrame(rows)
    got = {r.user_id: r.asDict() for r in pivot_event_counts(df).collect()}
    assert got[1]["n_total"] == len(_EVENT_TYPES) + 1
    assert sum(got[1][f"n_{t}"] for t in _EVENT_TYPES) == len(_EVENT_TYPES)
    assert got[2]["n_total"] == 2
    assert got[2]["n_click"] == 1
    assert sum(got[2][f"n_{t}"] for t in _EVENT_TYPES) == 1
