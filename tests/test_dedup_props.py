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


def test_chunk_dedup_full_duplicate_is_fully_shared(spark):
    """A verbatim duplicate pair must have every chunk shared (fraction
    1.0); a unique doc with a disjoint vocabulary shares nothing."""
    import pyspark.sql.functions as F
    from blockchain_etl_spark.plans.text import doc_chunk_dedup

    base = " ".join(f"w{i % 23}" for i in range(64))
    uniq = " ".join(f"u{i}" for i in range(64))
    docs = spark.createDataFrame(
        [(1, base), (2, base), (3, uniq)], ["doc_id", "text"]
    )

    import blockchain_etl_spark.plans.text as text_mod

    orig = text_mod.load_table
    try:
        text_mod.load_table = lambda spark, sf_dir, name: docs
        got = {r.doc_id: r for r in doc_chunk_dedup(spark, "ignored").collect()}
    finally:
        text_mod.load_table = orig
    assert got[1].shared_fraction == 1.0
    assert got[2].shared_fraction == 1.0
    assert got[3].shared_fraction == 0.0
    assert got[1].n_chunks == 4


def test_boilerplate_prune_agrees_with_chunk_dedup(spark):
    """doc_boilerplate_prune and doc_chunk_dedup share the chunking and the
    df>=2 threshold, so per-doc n_chunks must match and n_pruned must equal
    n_shared_chunks; the rebuilt clean_text token count must equal the
    original minus the pruned chunks' tokens."""
    from blockchain_etl_spark.plans.registry import get_queries

    qs = get_queries()
    prune = {r.doc_id: r for r in qs["doc_boilerplate_prune"](spark, SF).collect()}
    stats = {r.doc_id: r for r in qs["doc_chunk_dedup"](spark, SF).collect()}
    assert set(prune) == set(stats)
    assert any(r.n_pruned > 0 for r in prune.values()), "no boilerplate at test SF"
    for doc_id, p in prune.items():
        s = stats[doc_id]
        assert p.n_chunks == s.n_chunks, doc_id
        assert p.n_pruned == s.n_shared_chunks, doc_id
        if p.n_pruned == 0:
            assert len(p.clean_text) > 0 or p.n_chunks == 0


def test_boilerplate_prune_rewrites_only_shared_spans(spark):
    """A doc duplicated verbatim loses everything; a unique doc keeps its
    text byte-identical."""
    from blockchain_etl_spark.plans.text import doc_boilerplate_prune

    base = " ".join(f"w{i % 23}" for i in range(64))
    uniq = " ".join(f"u{i}" for i in range(64))
    docs = spark.createDataFrame(
        [(1, base), (2, base), (3, uniq)], ["doc_id", "text"]
    )

    import blockchain_etl_spark.plans.text as text_mod

    orig = text_mod.load_table
    try:
        text_mod.load_table = lambda spark, sf_dir, name: docs
        got = {r.doc_id: r for r in doc_boilerplate_prune(spark, "ignored").collect()}
    finally:
        text_mod.load_table = orig
    assert got[1].clean_text == "" and got[1].n_pruned == got[1].n_chunks
    assert got[2].clean_text == ""
    assert got[3].clean_text == uniq and got[3].n_pruned == 0


def test_lineage_include_set_equals_clean_corpus(spark):
    """The lineage verdict must agree exactly with the cleaning gate it
    audits: include=true ids == doc_clean_corpus ids, and every excluded
    row carries a reason."""
    from blockchain_etl_spark.plans.registry import get_queries

    qs = get_queries()
    lineage = qs["corpus_doc_lineage"](spark, SF).collect()
    kept = {r.doc_id for r in qs["doc_clean_corpus"](spark, SF).collect()}
    assert {r.doc_id for r in lineage if r.include} == kept
    for r in lineage:
        assert r.include == (r.drop_reason is None)


def test_leakage_safe_splits_keep_components_atomic(spark, tmp_path):
    """No candidate-edge pair (near-dup) may straddle a split boundary,
    the assignment is a pure function of the component, and singleton
    proportions stay ~90/5/5. The synthetic corpora carry no natural
    near-dup edges, so the test writes its own documents table with an
    exact-dup pair and a rare-token star family injected."""
    from pyspark.sql import Row

    from blockchain_etl_spark.plans.pipeline import _dedup_edges
    from blockchain_etl_spark.plans.registry import get_queries

    rare = "extraordinarilyrare"  # >= 12 chars, df = 3 -> star edges
    rows = [
        Row(doc_id=i, text=f"plain document number {i} with words w{i} x{i} y{i}",
            lang="en", source="src0", n_chars=40)
        for i in range(200)
    ]
    rows += [
        Row(doc_id=3001, text="identical twin text body alpha beta gamma",
            lang="en", source="src0", n_chars=41),
        Row(doc_id=3002, text="identical twin text body alpha beta gamma",
            lang="en", source="src0", n_chars=41),
        Row(doc_id=3003, text=f"star family one {rare} shared anchor token",
            lang="en", source="src0", n_chars=42),
        Row(doc_id=3004, text=f"star family two {rare} shared anchor token!",
            lang="en", source="src0", n_chars=43),
        Row(doc_id=3005, text=f"star family three {rare} shared anchor tok",
            lang="en", source="src0", n_chars=44),
    ]
    sf = str(tmp_path)
    spark.createDataFrame(rows).write.parquet(f"{sf}/documents.parquet")

    splits = {
        r.doc_id: (r.component_id, r.split)
        for r in get_queries()["corpus_leakage_safe_splits"](spark, sf).collect()
    }
    assert len(splits) == 205
    edges = _dedup_edges(spark, sf).collect()
    assert edges, "test premise: injected docs must produce near-dup edges"
    for e in edges:
        assert splits[e.src][1] == splits[e.dst][1], (e.src, e.dst)
        assert splits[e.src][0] == splits[e.dst][0], (e.src, e.dst)
    # the exact-dup pair and the star family each share one component
    assert splits[3001][0] == splits[3002][0]
    assert splits[3003][0] == splits[3004][0] == splits[3005][0]
    from collections import Counter

    by_split = Counter(s for _, s in splits.values())
    assert set(by_split) <= {"train", "val", "test"}
    assert by_split["train"] > 0.8 * len(splits)
