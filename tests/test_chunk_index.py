"""Incremental chunk-df index: the incremental ≡ batch property under any
chunking, with re-crawls and crash-replays — mirroring the inventory
stream≡batch tests."""

from __future__ import annotations

import pyspark.sql.functions as F

from blockchain_etl_spark.operators.chunk_index import ChunkDFIndex
from blockchain_etl_spark.plans.text import chunk_rows_from_text


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


def _df_rows(df):
    return {(r.chunk_hash, r.doc_df) for r in df.collect()}


def _batch_df(docs):
    return (
        chunk_rows_from_text(docs)
        .groupBy("chunk_hash")
        .agg(F.count_distinct("doc_id").cast("long").alias("doc_df"))
    )


BOILER = " ".join(f"b{i % 7}" for i in range(32))  # 2 chunks, shared verbatim


def _corpus(spark):
    uniq = lambda d: " ".join(f"u{d}x{i}" for i in range(40))
    return _docs(
        spark,
        [(1, f"{BOILER} {uniq(1)}"), (2, f"{BOILER} {uniq(2)}"), (3, uniq(3)), (4, f"{uniq(4)} {BOILER}")],
    )


def test_incremental_equals_batch_under_any_chunking(spark, tmp_path):
    corpus = _corpus(spark)
    whole = ChunkDFIndex(str(tmp_path / "whole"))
    whole.upsert(spark, corpus, watermark=1)

    split = ChunkDFIndex(str(tmp_path / "split"))
    split.upsert(spark, corpus.filter("doc_id <= 2"), watermark=1)
    split.upsert(spark, corpus.filter("doc_id > 2"), watermark=2)

    want = _df_rows(_batch_df(corpus))
    assert _df_rows(whole.doc_df(spark)) == want
    assert _df_rows(split.doc_df(spark)) == want


def test_replay_is_a_noop(spark, tmp_path):
    corpus = _corpus(spark)
    idx = ChunkDFIndex(str(tmp_path / "i"))
    idx.upsert(spark, corpus.filter("doc_id <= 2"), watermark=1)
    idx.upsert(spark, corpus.filter("doc_id > 2"), watermark=2)
    before = _df_rows(idx.doc_df(spark))
    idx.upsert(spark, corpus.filter("doc_id > 2"), watermark=2)  # crash replay
    assert _df_rows(idx.doc_df(spark)) == before


def test_recrawl_retracts_previous_text(spark, tmp_path):
    corpus = _corpus(spark)
    idx = ChunkDFIndex(str(tmp_path / "i"))
    idx.upsert(spark, corpus, watermark=1)
    # doc 4 re-crawled WITHOUT the boilerplate span
    new4 = _docs(spark, [(4, " ".join(f"v{i}" for i in range(40)))])
    idx.upsert(spark, new4, watermark=2)

    updated = corpus.filter("doc_id != 4").unionByName(new4)
    assert _df_rows(idx.doc_df(spark)) == _df_rows(_batch_df(updated))


def test_clean_full_corpus_equals_batch_prune(spark, tmp_path):
    import blockchain_etl_spark.plans.text as text_mod
    from blockchain_etl_spark.plans.text import doc_boilerplate_prune

    corpus = _corpus(spark)
    idx = ChunkDFIndex(str(tmp_path / "i"))
    idx.upsert(spark, corpus, watermark=1)
    got = {r.doc_id: r for r in idx.clean(spark, corpus).collect()}

    orig = text_mod.load_table
    try:
        text_mod.load_table = lambda spark, sf_dir, name: corpus
        want = {r.doc_id: r for r in doc_boilerplate_prune(spark, "ignored").collect()}
    finally:
        text_mod.load_table = orig
    assert set(got) == set(want)
    for d in want:
        assert (got[d].n_chunks, got[d].n_pruned, got[d].clean_text) == (
            want[d].n_chunks,
            want[d].n_pruned,
            want[d].clean_text,
        ), d
    assert any(r.n_pruned > 0 for r in want.values())


def test_clean_unseen_chunks_are_kept(spark, tmp_path):
    corpus = _corpus(spark)
    idx = ChunkDFIndex(str(tmp_path / "i"))
    idx.upsert(spark, corpus, watermark=1)
    fresh = _docs(spark, [(99, " ".join(f"z{i}" for i in range(40)))])
    got = idx.clean(spark, fresh).collect()[0]
    assert got.n_pruned == 0
    assert got.clean_text == " ".join(f"z{i}" for i in range(40))
    # but a fresh doc carrying the known boilerplate IS pruned
    carrier = _docs(spark, [(100, BOILER + " " + " ".join(f"q{i}" for i in range(16)))])
    got2 = idx.clean(spark, carrier).collect()[0]
    assert got2.n_pruned == 2


def test_crash_between_merges_converges_on_replay(spark, tmp_path):
    """Crash-ordering contract: the df merge commits FIRST; if the process
    dies before the docs-table merge, the replay's df merge is skipped by
    the watermark guard while the docs merge (latest-wins) re-applies —
    the state converges to exactly the once-applied result."""
    corpus = _corpus(spark)
    idx = ChunkDFIndex(str(tmp_path / "i"))
    idx.upsert(spark, corpus.filter("doc_id <= 2"), watermark=1)

    # simulate the crash: run batch 2's df merge but die before the docs
    # merge, by replaying upsert with the docs target's merge_with broken
    batch2 = corpus.filter("doc_id > 2")
    real_merge = idx.docs_target.merge_with

    def boom(*a, **k):
        raise RuntimeError("simulated crash before docs merge")

    idx.docs_target.merge_with = boom
    try:
        import pytest as _pytest

        with _pytest.raises(RuntimeError):
            idx.upsert(spark, batch2, watermark=2)
    finally:
        idx.docs_target.merge_with = real_merge

    # df state already holds batch 2; docs table does not
    assert idx.df_target.watermark() == 2
    assert idx.docs_target.watermark() == 1

    # replay the batch: df merge skips (watermark), docs merge applies
    idx.upsert(spark, batch2, watermark=2)
    assert _df_rows(idx.doc_df(spark)) == _df_rows(_batch_df(corpus))
    stored_docs = {r.doc_id for r in idx.docs_target.read(spark).collect()}
    assert stored_docs == {1, 2, 3, 4}

    # and a LATER re-crawl of a batch-2 doc still retracts correctly
    new4 = _docs(spark, [(4, " ".join(f"nv{i}" for i in range(40)))])
    idx.upsert(spark, new4, watermark=3)
    updated = corpus.filter("doc_id != 4").unionByName(new4)
    assert _df_rows(idx.doc_df(spark)) == _df_rows(_batch_df(updated))
