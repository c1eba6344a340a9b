"""Hybrid-retrieval fusion properties: known-item behavior and the RRF
arithmetic itself, on the real test corpus and a controlled fixture."""

from __future__ import annotations

SF = "/root/testdata/sf0.001"


def test_rrf_known_item_self_doc_wins(spark):
    """Every query doc retrieves ITSELF — or a verbatim duplicate of
    itself — at fused_rank 1 with both paths agreeing (lex_rank ==
    vec_rank == 1): the query text is the document, so any miss means a
    path's scoring or ranking broke. The duplicate allowance matters
    because the corpus contains exact-dup texts by design: a twin ties
    both paths' scores exactly and the doc_id tie-break may rank it
    first — correct retrieval, same text."""
    import pyspark.sql.functions as F
    from blockchain_etl_spark.plans.registry import get_queries
    from blockchain_etl_spark.sources.testdata import load_table

    rows = get_queries()["retrieval_hybrid_rrf"](spark, SF).collect()
    assert rows, "no query docs at test SF"
    text = {
        r.doc_id: r.text
        for r in load_table(spark, SF, "documents")
        .select("doc_id", F.lower("text").alias("text"))
        .collect()
    }
    by_q = {}
    for r in rows:
        by_q.setdefault(r.qid, []).append(r)
    for qid, rs in by_q.items():
        top = next(r for r in rs if r.fused_rank == 1)
        assert top.doc_id == qid or text[top.doc_id] == text[qid], (qid, top)
        assert top.lex_rank == 1 and top.vec_rank == 1, (qid, top)


def test_rrf_score_is_sum_of_path_reciprocals(spark):
    """rrf_fp must equal the integer reciprocal-rank sum of exactly the
    paths that ranked the doc (rank 0 = absent = contributes nothing),
    and fused_rank must be the (rrf_fp desc, doc_id) row number."""
    from blockchain_etl_spark.plans.registry import get_queries
    from blockchain_etl_spark.plans.similarity import _RRF_C

    rows = get_queries()["retrieval_hybrid_rrf"](spark, SF).collect()
    by_q = {}
    for r in rows:
        expected = 0
        for rank in (r.lex_rank, r.vec_rank):
            if rank > 0:
                expected += 1_000_000_000 // (_RRF_C + rank)
        assert r.rrf_fp == expected, r
        by_q.setdefault(r.qid, []).append(r)
    for rs in by_q.values():
        ordered = sorted(rs, key=lambda r: (-r.rrf_fp, r.doc_id))
        for i, r in enumerate(ordered, start=1):
            assert r.fused_rank == i, (i, r)


def test_rrf_two_path_consensus_beats_single_path(spark):
    """A doc ranked by BOTH paths at depth d must outscore any doc a
    single path ranked at the same depth — the point of RRF (consensus
    wins over one path's confidence) stated as arithmetic on the output."""
    from blockchain_etl_spark.plans.registry import get_queries

    rows = get_queries()["retrieval_hybrid_rrf"](spark, SF).collect()
    both = [r for r in rows if r.lex_rank > 0 and r.vec_rank > 0]
    single = [r for r in rows if (r.lex_rank > 0) != (r.vec_rank > 0)]
    assert both, "fixture lost its two-path hits"
    for b in both:
        d = max(b.lex_rank, b.vec_rank)
        for s in single:
            if max(s.lex_rank, s.vec_rank) == d:
                assert b.rrf_fp > s.rrf_fp, (b, s)
