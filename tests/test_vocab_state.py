"""UnigramDriftState: the folded state's drift report must be
BIT-IDENTICAL to the registered batch query at any chunking, under
replays, and across restarts — the hll_state contract applied to the
distribution-drift monitor."""

from __future__ import annotations

import pyspark.sql.functions as F

from blockchain_etl_spark.operators.vocab_state import UnigramDriftState
from blockchain_etl_spark.plans.registry import get_queries
from blockchain_etl_spark.sources.testdata import load_table

SF = "/root/testdata/sf0.001"


def _fold_in_chunks(spark, tmp_path, n_chunks):
    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    st = UnigramDriftState(str(tmp_path / f"drift_{n_chunks}"))
    for i in range(n_chunks):
        batch = docs.filter(F.col("doc_id") % n_chunks == i)
        st.fold(spark, batch, watermark=i + 1)
    return st


def test_folded_state_equals_batch_query_bit_for_bit(spark, tmp_path):
    batch = get_queries()["corpus_unigram_drift"](spark, SF).collect()
    for n_chunks in (1, 3):
        st = _fold_in_chunks(spark, tmp_path, n_chunks)
        got = st.read_drift(spark).collect()
        assert [r.asDict() for r in got] == [r.asDict() for r in batch], n_chunks


def test_replayed_batch_is_a_noop(spark, tmp_path):
    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    st = UnigramDriftState(str(tmp_path / "drift_replay"))
    st.fold(spark, docs.filter(F.col("doc_id") % 2 == 0), watermark=1)
    before = st.read_drift(spark).collect()
    # crash-replay of batch 1: the merge watermark must reject it — a
    # double fold would double every even-half count
    st.fold(spark, docs.filter(F.col("doc_id") % 2 == 0), watermark=1)
    assert st.read_drift(spark).collect() == before
    # the next real batch completes the corpus and matches the batch query
    st.fold(spark, docs.filter(F.col("doc_id") % 2 == 1), watermark=2)
    batch = get_queries()["corpus_unigram_drift"](spark, SF).collect()
    assert st.read_drift(spark).collect() == batch


def test_restarted_state_resumes_from_disk(spark, tmp_path):
    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    path = str(tmp_path / "drift_restart")
    UnigramDriftState(path).fold(
        spark, docs.filter(F.col("doc_id") % 2 == 0), watermark=1
    )
    # a NEW instance (restart) sees the watermark and keeps folding
    st2 = UnigramDriftState(path)
    assert st2.watermark() == 1
    st2.fold(spark, docs.filter(F.col("doc_id") % 2 == 1), watermark=2)
    batch = get_queries()["corpus_unigram_drift"](spark, SF).collect()
    assert st2.read_drift(spark).collect() == batch


# ---------------------------------------------------------------- novelty


def _novelty_batches(spark):
    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    return [docs.filter(F.col("doc_id") % 3 == k) for k in range(3)]


def _batch_checkpoint(spark, frames):
    """Independent batch Heaps recompute over the union of ``frames``:
    (n_docs, n_postings, vocab_size)."""
    from blockchain_etl_spark.plans.dedup import shingle_rows_from_text

    union = frames[0]
    for f in frames[1:]:
        union = union.unionByName(f)
    sh = shingle_rows_from_text(union)
    return (
        union.select("doc_id").distinct().count(),
        sh.count(),
        sh.select("shingle").distinct().count(),
    )


def test_novelty_curve_rows_equal_batch_checkpoints(spark, tmp_path):
    """Every maintained curve row must equal the batch Heaps recompute
    over the batches folded so far — cumulative counts, cumulative
    novelty, AND the marginal new-shingle count."""
    from blockchain_etl_spark.operators.vocab_state import ShingleVocabState

    batches = _novelty_batches(spark)
    st = ShingleVocabState(str(tmp_path / "nov"))
    prev_vocab = 0
    for k, b in enumerate(batches, start=1):
        assert st.fold(spark, b, watermark=k)
        rows = {r.batch_id: r for r in st.read_curve(spark).collect()}
        nd, np_, v = _batch_checkpoint(spark, batches[:k])
        r = rows[k]
        assert (r.n_docs, r.n_postings, r.vocab_size) == (nd, np_, v)
        assert r.novelty_ppm == v * 1_000_000 // np_
        assert r.n_new_shingles == v - prev_vocab
        prev_vocab = v
    assert len(rows) == 3


def test_novelty_fold_replay_is_a_noop(spark, tmp_path):
    from blockchain_etl_spark.operators.vocab_state import ShingleVocabState

    batches = _novelty_batches(spark)
    st = ShingleVocabState(str(tmp_path / "nov_replay"))
    st.fold(spark, batches[0], watermark=1)
    st.fold(spark, batches[1], watermark=2)
    before = sorted(map(tuple, st.read_curve(spark).collect()))
    assert not st.fold(spark, batches[1], watermark=2)  # crash replay
    assert sorted(map(tuple, st.read_curve(spark).collect())) == before


def test_novelty_crash_between_merges_converges(spark, tmp_path):
    """Crash window: vocab merged, curve not yet. The replay must skip
    the vocab merge (watermark) and still produce the correct curve row
    — the first-batch stamp keeps the marginal count derivable."""
    from blockchain_etl_spark.operators.vocab_state import ShingleVocabState

    batches = _novelty_batches(spark)
    st = ShingleVocabState(str(tmp_path / "nov_crash"))
    st.fold(spark, batches[0], watermark=1)
    # simulate the crash: apply ONLY the vocab half of batch 2
    from blockchain_etl_spark.plans.dedup import shingle_rows_from_text

    sh = shingle_rows_from_text(batches[1])

    def add_absent(target, upd):
        fresh = upd.select("shingle").distinct()
        return target.unionByName(
            fresh.join(target.select("shingle"), ["shingle"], "left_anti")
            .withColumn("first_batch", F.lit(2).cast("long"))
        )

    st.vocab.merge_with(spark, sh, add_absent, watermark=2)
    # replay of batch 2 completes the fold
    assert st.fold(spark, batches[1], watermark=2)
    rows = {r.batch_id: r for r in st.read_curve(spark).collect()}
    nd, np_, v = _batch_checkpoint(spark, batches[:2])
    assert (rows[2].n_docs, rows[2].n_postings, rows[2].vocab_size) == (nd, np_, v)


def test_docingest_novelty_hook_matches_admitted_corpus(spark, tmp_path):
    """DocIngest(novelty_state=True): curve keys on the ADMITTED docs
    (post quality + dedup), equal to the batch recompute over
    read_corpus() at each batch checkpoint."""
    from blockchain_etl_spark.streaming.docs import DocIngest

    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    docs = docs.withColumn("lang", F.lit("en"))
    ing = DocIngest(str(tmp_path / "lake"), novelty_state=True)
    ing.process_batch(docs.filter("doc_id < 150"), 0)
    ing.process_batch(docs.filter("doc_id >= 150"), 1)
    corpus = ing.read_corpus(spark).select("doc_id", "text")
    rows = {r.batch_id: r for r in ing.novelty.read_curve(spark).collect()}
    nd, np_, v = _batch_checkpoint(spark, [corpus])
    assert (rows[1].n_docs, rows[1].n_postings, rows[1].vocab_size) == (nd, np_, v)
