"""Eval gates with an injected (pre-computed) subject frame must return
exactly the results of the self-contained form — pipeline users pay for
the subject query once, not twice (r04 verdict stretch item)."""

from __future__ import annotations

import os

SF = "/root/testdata/sf0.001"


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_name_match_eval_injection(spark):
    from blockchain_etl_spark.plans.quality import customer_name_match, name_match_eval

    subject = customer_name_match(spark, SF).localCheckpoint()
    assert _rows(name_match_eval(spark, SF, matches=subject)) == _rows(
        name_match_eval(spark, SF)
    )


def test_retrieval_mrr_eval_injection(spark):
    from blockchain_etl_spark.plans.quality import retrieval_mrr_eval
    from blockchain_etl_spark.plans.similarity import (
        knn_cosine_bruteforce,
        knn_cosine_ivf,
    )

    exact = knn_cosine_bruteforce(spark, SF).localCheckpoint()
    approx = knn_cosine_ivf(spark, SF).localCheckpoint()
    assert _rows(
        retrieval_mrr_eval(spark, SF, exact_topk=exact, approx_topk=approx)
    ) == _rows(retrieval_mrr_eval(spark, SF))


def test_pq_recall_eval_injection(spark):
    from blockchain_etl_spark.plans.similarity import _pq_adc_ranked, pq_recall_eval

    ranked = _pq_adc_ranked(spark, SF).localCheckpoint()
    assert _rows(pq_recall_eval(spark, SF, adc_ranked=ranked)) == _rows(
        pq_recall_eval(spark, SF)
    )
