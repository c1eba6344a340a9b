"""Unit semantics of the corpus snapshot diff operator."""

from __future__ import annotations


def test_corpus_diff_classification(spark):
    from blockchain_etl_spark.operators.corpus_diff import corpus_diff, diff_summary

    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], ["doc_id", "text"]
    )
    new = spark.createDataFrame(
        [(2, "b"), (3, "c2"), (4, "d")], ["doc_id", "text"]
    )
    got = {r.doc_id: r.change_type for r in corpus_diff(old, new).collect()}
    assert got == {1: "removed", 2: "unchanged", 3: "changed", 4: "added"}

    summary = {r.change_type: r.n_docs for r in diff_summary(corpus_diff(old, new)).collect()}
    assert summary == {"removed": 1, "unchanged": 1, "changed": 1, "added": 1}
