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
