"""Incrementally maintained CMS heavy hitters: cells fold bit-identically
to the batch sketch at any chunking and under replays; the maintained
candidate top-k equals the registered batch query's top-k on the real
events table."""

from __future__ import annotations

import pyspark.sql.functions as F

from blockchain_etl_spark.operators.cms_state import CMSTopKState
from blockchain_etl_spark.plans.olap import cms_estimates, cms_keyed_rows
from blockchain_etl_spark.sources.testdata import load_table

SF = "/root/testdata/sf0.001"


def _events(spark):
    return load_table(spark, SF, "events").select("user_id", "event_id")


def _cells(state, spark):
    return {(r.r, r.bucket, r.cell_n) for r in state.read_cells(spark).collect()}


def _batch_cells(ev, key="user_id"):
    return {
        (r.r, r.bucket, r.cell_n)
        for r in cms_keyed_rows(ev.select(key), key)
        .groupBy("r", "bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("cell_n"))
        .collect()
    }


def test_cells_fold_equals_batch_under_any_chunking(spark, tmp_path):
    ev = _events(spark).cache()
    whole = CMSTopKState(str(tmp_path / "whole"))
    whole.fold(spark, ev, watermark=1)

    split = CMSTopKState(str(tmp_path / "split"))
    split.fold(spark, ev.filter("event_id % 3 = 0"), watermark=1)
    split.fold(spark, ev.filter("event_id % 3 = 1"), watermark=2)
    split.fold(spark, ev.filter("event_id % 3 = 2"), watermark=3)
    split.fold(spark, ev.filter("event_id % 3 = 2"), watermark=3)  # replay

    want = _batch_cells(ev)
    assert _cells(whole, spark) == want
    assert _cells(split, spark) == want
    ev.unpersist()


def test_maintained_topk_equals_batch_query(spark, tmp_path):
    from blockchain_etl_spark.plans.olap import _CMS_TOP

    ev = _events(spark).cache()
    st = CMSTopKState(str(tmp_path / "s"))
    # chunk by event id ranges — an arbitrary arrival order
    bounds = [(0, 700), (700, 1400), (1400, 10**9)]
    for i, (lo, hi) in enumerate(bounds):
        st.fold(
            spark,
            ev.filter((F.col("event_id") >= lo) & (F.col("event_id") < hi)),
            watermark=i,
        )
    got = [(r.user_id, r.est_n) for r in st.topk(spark, _CMS_TOP).collect()]
    want = [
        (r.user_id, r.est_n)
        for r in cms_estimates(ev.select("user_id"))
        .orderBy(F.col("est_n").desc(), "user_id")
        .limit(_CMS_TOP)
        .collect()
    ]
    assert got == want
    # CMS invariant: estimates only overestimate
    exact = {r.user_id: r.exact_n for r in ev.groupBy("user_id").count()
             .withColumnRenamed("count", "exact_n").collect()}
    assert all(est >= exact[u] for u, est in got)
    ev.unpersist()


def test_candidate_reentry_recovers_full_estimate(spark, tmp_path):
    """A key pruned from the candidate table re-enters with its FULL
    merged-sketch estimate (not just post-reentry counts)."""
    rows = []
    # batch 1: 70 distinct light keys (k=1000..1069, one row each) push a
    # tiny candidate table around; heavy key 7 contributes 3 rows
    rows += [(1000 + i,) for i in range(70)]
    rows += [(7,), (7,), (7,)]
    b1 = spark.createDataFrame(rows, ["user_id"])
    # batch 2: key 7 appears once more — its estimate must include batch 1
    b2 = spark.createDataFrame([(7,)], ["user_id"])
    st = CMSTopKState(str(tmp_path / "s"), n_candidates=8)
    st.fold(spark, b1, watermark=1)
    st.fold(spark, b2, watermark=2)
    top = {r.user_id: r.est_n for r in st.topk(spark, 8).collect()}
    assert top[7] >= 4  # all four occurrences, not just the re-entry one
