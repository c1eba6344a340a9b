"""Cross-query dedup properties: the skew-safe df-capped Jaccard must
report a subset of the exact baseline's pairs, with identical scores on
every pair it does report (the cap only prunes CANDIDATES; the verify
step computes the same exact Jaccard)."""

from __future__ import annotations

SF = "/root/testdata/sf0.001"


def test_dfcapped_jaccard_is_exact_subset(spark):
    from blockchain_etl_spark.plans.registry import get_queries

    qs = get_queries()
    base = {
        (r.doc_a, r.doc_b): (r.intersection, r.jaccard)
        for r in qs["dedup_ngram_jaccard"](spark, SF).collect()
    }
    capped = {
        (r.doc_a, r.doc_b): (r.intersection, r.jaccard)
        for r in qs["dedup_jaccard_dfcapped"](spark, SF).collect()
    }
    assert capped, "df-capped query found no pairs at test SF"
    assert set(capped) <= set(base)
    for pair, scores in capped.items():
        assert scores == base[pair], pair
