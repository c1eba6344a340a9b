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


def test_prefix_filter_equals_exact_baseline(spark):
    """Completeness AND soundness of the SSJoin prefix filter: its output
    must equal the exact baseline's pairs at jaccard >= 0.5 — both
    directions, since the oracle-style subset check alone would let a
    lossy candidate rule pass."""
    from blockchain_etl_spark.plans.registry import get_queries

    qs = get_queries()
    truth = {
        (r.doc_a, r.doc_b): (r.intersection, r.jaccard)
        for r in qs["dedup_ngram_jaccard"](spark, SF).collect()
        if r.jaccard >= 0.5
    }
    got = {
        (r.doc_a, r.doc_b): (r.intersection, r.jaccard)
        for r in qs["dedup_jaccard_prefix_filter"](spark, SF).collect()
    }
    assert truth, "no >=0.5 pairs at test SF — fixture drifted"
    assert got == truth


def test_prefix_filter_stop_shingle_only_overlap_is_silent(spark):
    """Docs whose ONLY shared shingle is corpus-wide boilerplate must
    produce no output (their jaccard is far below threshold) and must not
    fan out: the boilerplate shingle's df makes it sort LAST in every
    doc's global order, so it falls outside all prefixes. Verbatim
    duplicates still surface with jaccard 1.0."""
    import blockchain_etl_spark.plans.dedup as dedup_mod
    from blockchain_etl_spark.plans.dedup import dedup_jaccard_prefix_filter

    boiler = "terms of service"
    rows = [
        (i, f"{boiler} u{i}a u{i}b u{i}c u{i}d u{i}e u{i}f") for i in range(10)
    ]
    rows.append((100, "dup one two three four five six seven"))
    rows.append((101, "dup one two three four five six seven"))
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    orig = dedup_mod.load_table
    try:
        dedup_mod.load_table = lambda spark, sf_dir, name: docs
        out = {
            (r.doc_a, r.doc_b): r.jaccard
            for r in dedup_jaccard_prefix_filter(spark, "ignored").collect()
        }
    finally:
        dedup_mod.load_table = orig
    assert out == {(100, 101): 1.0}, out


def test_dup_span_audit_flags_injected_copy(spark):
    """A paragraph copied between two otherwise-unique docs marks exactly
    its k-gram start positions duplicated in BOTH docs; a fully unique doc
    reads zero. This is the signal doc/chunk-grain hashing misses."""
    import blockchain_etl_spark.plans.dedup as dedup_mod
    from blockchain_etl_spark.plans.dedup import _SPAN_K, doc_dup_span_audit

    para = "this exact paragraph is copied verbatim between documents"
    ua = " ".join(f"alpha{i}" for i in range(12))
    ub = " ".join(f"beta{i}" for i in range(12))
    uc = " ".join(f"gamma{i}" for i in range(12))
    docs = spark.createDataFrame(
        [(1, f"{ua} {para}"), (2, f"{ub} {para}"), (3, uc)],
        ["doc_id", "text"],
    )
    orig = dedup_mod.load_table
    try:
        dedup_mod.load_table = lambda spark, sf_dir, name: docs
        got = {r.doc_id: r for r in doc_dup_span_audit(spark, "ignored").collect()}
    finally:
        dedup_mod.load_table = orig
    assert got[3].dup_grams == 0 and got[3].dup_ppm == 0
    # the copied paragraph contributes at least len(para) - K + 1 shared
    # gram starts to each carrier (more if the space before it aligns)
    floor = len(para) - _SPAN_K + 1
    assert got[1].dup_grams >= floor > 0
    assert got[2].dup_grams >= floor
    for d in (1, 2):
        assert got[d].total_grams > got[d].dup_grams
        assert 0 < got[d].dup_ppm < 1000000


def test_span_prune_consistent_with_audit(spark):
    """Prune and audit share the dup-gram definition, so per doc:
    len(clean_text) == len(text) - chars_cut; zero dup grams means an
    untouched doc; a fully-duplicated doc (dup_ppm == 1e6) prunes to
    empty — the interval union covers the whole text."""
    from blockchain_etl_spark.plans.registry import get_queries
    from blockchain_etl_spark.sources.testdata import load_table

    qs = get_queries()
    text_len = {
        r.doc_id: len(r.text)
        for r in load_table(spark, SF, "documents").select("doc_id", "text").collect()
    }
    audit = {r.doc_id: r for r in qs["doc_dup_span_audit"](spark, SF).collect()}
    prune = {r.doc_id: r for r in qs["doc_dup_span_prune"](spark, SF).collect()}
    assert set(prune) == set(text_len)  # prune covers ALL docs
    assert any(r.chars_cut > 0 for r in prune.values())
    for did, p in prune.items():
        assert len(p.clean_text) == text_len[did] - p.chars_cut, did
        a = audit.get(did)
        if a is None or a.dup_grams == 0:
            assert p.chars_cut == 0 and p.n_cut_intervals == 0, did
        else:
            assert p.chars_cut > 0, did
            if a.dup_ppm == 1_000_000:
                assert p.clean_text == "", did
