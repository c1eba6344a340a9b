"""Incrementally maintained lexical (BM25) index: the maintained-postings ≡
batch-tokenize property under any chunking, with re-crawls, deletes, and
crash-replays — plus the serving-path identity (index BM25 == batch BM25
over the same corpus)."""

from __future__ import annotations

from blockchain_etl_spark.operators.lexical_index import LexicalIndex
from blockchain_etl_spark.plans.lexical import bm25_rank_frames, term_freq_rows


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


def _postings(ix, spark):
    return {(r.term, r.doc_id, r.tf) for r in ix.term_frequencies(spark).collect()}


def _doclens(ix, spark):
    return {(r.doc_id, r.dl) for r in ix.doclen.read(spark).collect()}


def _want(docs):
    tf = term_freq_rows(docs)
    return {(r.term, r.doc_id, r.tf) for r in tf.collect()}


def _corpus(spark):
    # per-doc distinct vocabularies with one repeated phrase inside doc 1
    # (tf > 1 for its shingles) and a shared phrase across docs 2 and 3
    rows = [
        (1, "alpha beta gamma alpha beta gamma delta"),
        (2, "shared phrase here plus two unique tails"),
        (3, "shared phrase here and another different tail"),
        (4, "wholly distinct text with enough words to shingle"),
    ]
    return _docs(spark, rows)


def test_incremental_equals_batch_under_any_chunking(spark, tmp_path):
    corpus = _corpus(spark)
    whole = LexicalIndex(str(tmp_path / "whole"))
    whole.upsert(spark, corpus, watermark=1)

    split = LexicalIndex(str(tmp_path / "split"))
    split.upsert(spark, corpus.filter("doc_id <= 2"), watermark=1)
    split.upsert(spark, corpus.filter("doc_id > 2"), watermark=2)

    want = _want(corpus)
    assert _postings(whole, spark) == want
    assert _postings(split, spark) == want
    assert _doclens(split, spark) == _doclens(whole, spark)


def test_recrawl_replaces_old_postings(spark, tmp_path):
    ix = LexicalIndex(str(tmp_path / "i"))
    ix.upsert(spark, _corpus(spark), watermark=1)
    # doc 1 re-crawled with entirely new text: every old shingle must go
    recrawl = _docs(spark, [(1, "brand new crawl body with fresh shingles")])
    ix.upsert(spark, recrawl, watermark=2)
    final = _corpus(spark).filter("doc_id != 1").unionByName(recrawl)
    assert _postings(ix, spark) == _want(final)
    assert _doclens(ix, spark) == {
        (r.doc_id, r.dl)
        for r in term_freq_rows(final)
        .groupBy("doc_id")
        .agg({"tf": "sum"})
        .withColumnRenamed("sum(tf)", "dl")
        .collect()
    }


def test_recrawl_to_zero_shingles_retracts_everything(spark, tmp_path):
    ix = LexicalIndex(str(tmp_path / "i"))
    ix.upsert(spark, _corpus(spark), watermark=1)
    # new text too short to produce a single 3-gram shingle: the doc must
    # vanish from the postings even though the batch tf frame is empty
    ix.upsert(spark, _docs(spark, [(1, "too short")]), watermark=2)
    assert {d for (_, d, _) in _postings(ix, spark)} == {2, 3, 4}


def test_replay_is_a_noop(spark, tmp_path):
    corpus = _corpus(spark)
    ix = LexicalIndex(str(tmp_path / "i"))
    ix.upsert(spark, corpus.filter("doc_id <= 2"), watermark=1)
    ix.upsert(spark, corpus.filter("doc_id > 2"), watermark=2)
    before = _postings(ix, spark)
    ix.upsert(spark, corpus.filter("doc_id > 2"), watermark=2)  # crash replay
    assert _postings(ix, spark) == before


def test_delete_drops_documents(spark, tmp_path):
    corpus = _corpus(spark)
    ix = LexicalIndex(str(tmp_path / "i"))
    ix.upsert(spark, corpus, watermark=1)
    ix.delete(spark, _docs(spark, [(2, "x")]).select("doc_id"))
    assert _postings(ix, spark) == _want(corpus.filter("doc_id != 2"))
    # the delete is an unwatermarked maintenance fold: the replay guard
    # must survive it (a replay of batch 1 stays a no-op)
    ix.upsert(spark, corpus, watermark=1)
    assert _postings(ix, spark) == _want(corpus.filter("doc_id != 2"))


def test_serving_path_equals_batch_scorer(spark, tmp_path):
    # qmod=1: every doc is a probe — maximal coverage of the scorer
    corpus = _corpus(spark)
    ix = LexicalIndex(str(tmp_path / "i"))
    ix.upsert(spark, corpus.filter("doc_id % 2 = 0"), watermark=1)
    ix.upsert(spark, corpus.filter("doc_id % 2 = 1"), watermark=2)
    served = ix.bm25_topk(spark, qmod=1, k=10)
    batch = bm25_rank_frames(term_freq_rows(corpus), qmod=1, k=10)
    assert sorted(map(tuple, served.collect()), key=lambda t: t[:2]) == sorted(
        map(tuple, batch.collect()), key=lambda t: t[:2]
    )


def test_lm_backoff_levels_and_tie_breaks(spark):
    """Force every backoff level: trigram hit, bigram-continuation hit,
    unigram fallback — and the (count DESC, token ASC) tie-break."""
    from blockchain_etl_spark.plans.lexical import lm_backoff_eval_frames

    rows = [
        # train (even ids): trigram (a b -> c) dominates; tie between
        # (t u -> p) and (t u -> q) breaks to 'p' (token ASC)
        (0, "a b c a b c t u p t u q"),
        # held (odd ids):
        (1, "a b c"),      # level 3, correct
        (3, "t u p"),      # level 3 tie-break -> p, correct
        (5, "q b x"),      # (q,b) unseen ctx, b seen as bigram ctx -> level 2
        (7, "zz yy aa"),   # nothing seen -> level 1 (global argmax)
    ]
    out = {
        r.backoff_level: (r.n_cases, r.n_correct)
        for r in lm_backoff_eval_frames(
            spark.createDataFrame(rows, ["doc_id", "text"])
        ).collect()
    }
    assert out[3] == (2, 2)
    assert out[2] == (1, 0)
    assert out[1] == (1, 0)
