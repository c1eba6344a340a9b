"""Incremental MinHash index: chunked upserts (with a replayed chunk) must
converge to exactly the batch signature/candidate computation — the
inventory stream≡batch property applied to the dedup pipeline."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.functions import col

from blockchain_etl_spark.operators.lsh_index import MinHashIndex
from blockchain_etl_spark.plans.dedup import (
    band_rows,
    lsh_candidate_pairs,
    minhash_signatures,
    shingle_rows_from_text,
)

SF = "/root/testdata/sf0.001"


def _docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")


def test_incremental_index_equals_batch(spark, tmp_path):
    docs = _docs(spark).cache()
    idx = MinHashIndex(str(tmp_path / "mh_index"))
    chunks = [(0, 150), (150, 300), (300, 10**9)]
    for i, (lo, hi) in enumerate(chunks, start=1):
        idx.upsert(
            spark,
            docs.filter((col("doc_id") >= lo) & (col("doc_id") < hi)),
            watermark=i,
        )
    # replay of the last chunk: watermark guard makes it a no-op
    v_before = idx.target.current_version()
    idx.upsert(spark, docs.filter(col("doc_id") >= 300), watermark=3)
    assert idx.target.current_version() == v_before

    batch_sig = minhash_signatures(shingle_rows_from_text(docs))
    got_sig = {tuple(r) for r in idx.signatures(spark).collect()}
    assert got_sig == {tuple(r) for r in batch_sig.collect()}

    got_pairs = {tuple(r) for r in idx.candidate_pairs(spark).collect()}
    want_pairs = {
        tuple(r) for r in lsh_candidate_pairs(band_rows(batch_sig)).collect()
    }
    assert got_pairs == want_pairs and want_pairs  # non-trivial corpus


def test_recrawled_doc_overwrites_signature(spark, tmp_path):
    docs = _docs(spark)
    idx = MinHashIndex(str(tmp_path / "mh_rewrite"))
    idx.upsert(spark, docs.filter(col("doc_id") < 50))
    # re-crawl doc 7 with different text: its signature must change to the
    # new text's signature, everything else untouched
    recrawl = docs.filter(col("doc_id") == 8).select(
        F.lit(7).cast("long").alias("doc_id"), "text"
    )
    idx.upsert(spark, recrawl)
    sig = {r.doc_id: tuple(r)[1:] for r in idx.signatures(spark).collect()}
    want = {
        r.doc_id: tuple(r)[1:]
        for r in minhash_signatures(shingle_rows_from_text(docs.filter(col("doc_id") < 50))).collect()
    }
    assert sig[7] == want[8]
    assert all(sig[i] == want[i] for i in want if i != 7)


def test_probe_finds_stored_near_dups(spark, tmp_path):
    docs = _docs(spark)
    idx = MinHashIndex(str(tmp_path / "mh_probe"))
    idx.upsert(spark, docs.filter(col("doc_id") < 400))
    # probe with exact copies of stored docs under new ids → every probe
    # doc must collide with its stored original on all 4 bands
    probes = docs.filter(col("doc_id") < 5).select(
        (col("doc_id") + 100000).alias("doc_id"), "text"
    )
    got = {
        (r.doc_a, r.doc_b): r.bands_hit
        for r in idx.probe(spark, probes).collect()
    }
    for i in range(5):
        assert got.get((i, i + 100000)) == 4, (i, got)


def test_upsert_coalesced_equals_sequential(spark, tmp_path):
    """Latest-wins signatures over id-disjoint batches: one coalesced
    publish must equal per-batch upserts, and the watermark advances to
    the last batch so replays stay guarded."""
    import pytest

    docs = _docs(spark)
    b1 = docs.filter("doc_id < 2")
    b2 = docs.filter("doc_id >= 2")

    seq = MinHashIndex(str(tmp_path / "seq"))
    seq.upsert(spark, b1, watermark=1)
    seq.upsert(spark, b2, watermark=2)

    coal = MinHashIndex(str(tmp_path / "coal"))
    assert coal.upsert_coalesced(spark, [(1, b1), (2, b2)])
    want = {tuple(r) for r in seq.signatures(spark).collect()}
    assert {tuple(r) for r in coal.signatures(spark).collect()} == want
    assert coal.target.watermark() == 2
    # full replay: a no-op
    assert not coal.upsert_coalesced(spark, [(1, b1), (2, b2)])
    # an id in two batches would lose its intermediate text: rejected
    fresh = MinHashIndex(str(tmp_path / "dup"))
    with pytest.raises(ValueError, match="more than one batch"):
        fresh.upsert_coalesced(spark, [(1, b1), (2, b1)])


def test_upsert_coalesced_rejects_misordered_watermarks(spark, tmp_path):
    import pytest

    docs = _docs(spark)
    b1 = docs.filter("doc_id < 2")
    b2 = docs.filter("doc_id >= 2")
    ix = MinHashIndex(str(tmp_path / "ord"))
    # misordered input must raise BEFORE any publish — otherwise the
    # last element's watermark would under-record the replay high-mark
    with pytest.raises(ValueError, match="strictly increasing"):
        ix.upsert_coalesced(spark, [(2, b2), (1, b1)])
    assert ix.target.watermark() == -1  # nothing published
