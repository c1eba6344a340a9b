"""Streaming document ingest: chunked processing (with replay) must
converge to the batch corpus-cleaning recompute over the full input, and
the maintained MinHash index must equal the batch signatures of the clean
corpus."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql.functions import col

from blockchain_etl_spark.plans.dedup import minhash_signatures, shingle_rows_from_text
from blockchain_etl_spark.streaming.docs import (
    MIN_DISTINCT_FP,
    MIN_TOKENS,
    DocIngest,
    quality_features,
)

SF = "/root/testdata/sf0.001"


def _docs(spark):
    base = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "text", "lang"
    )
    # inject cross-chunk exact duplicates and junk the quality gate drops:
    # doc 100000/100001 duplicate doc 3's text in later chunks; 100002 is
    # low-quality repetition.
    extra = [
        Row(doc_id=100000, text=None, lang="en"),
        Row(doc_id=100001, text=None, lang="en"),
        Row(doc_id=100002, text=" ".join(["dup"] * 60), lang="en"),
        Row(doc_id=100003, text="too short", lang="en"),
    ]
    t3 = base.filter(col("doc_id") == 3).collect()[0].text
    rows = [Row(doc_id=r.doc_id, text=(t3 if r.text is None else r.text), lang=r.lang)
            for r in extra]
    return base.unionByName(spark.createDataFrame(rows, base.schema))


def _batch_clean(spark, docs):
    """Independent batch recompute: quality gate, then min-doc_id canonical
    per content hash (the doc_clean_corpus rule)."""
    from pyspark.sql import Window

    q = quality_features(docs).filter(
        (col("n_tokens") >= MIN_TOKENS) & (col("distinct_fp") >= MIN_DISTINCT_FP)
    )
    w = Window.partitionBy("h")
    return q.withColumn("__m", F.min("doc_id").over(w)).filter(
        col("doc_id") == col("__m")
    ).select("doc_id", "text", "lang")


def test_chunked_ingest_equals_batch_clean(spark, tmp_path):
    docs = _docs(spark).cache()
    ing = DocIngest(str(tmp_path / "doc_lake"))
    chunks = [(0, 200), (200, 400), (400, 10**9)]
    for i, (lo, hi) in enumerate(chunks):
        ing.process_batch(
            docs.filter((col("doc_id") >= lo) & (col("doc_id") < hi)), i
        )
    # replay the last chunk — idempotent (watermark guards the merges, the
    # chunk dir is overwritten with identical content)
    ing.process_batch(docs.filter(col("doc_id") >= 400), 2)

    got = {(r.doc_id, r.text, r.lang) for r in ing.read_corpus(spark).collect()}
    want = {(r.doc_id, r.text, r.lang) for r in _batch_clean(spark, docs).collect()}
    assert got == want
    # the injected duplicates and junk were dropped
    kept_ids = {t[0] for t in got}
    assert {100000, 100001, 100002, 100003}.isdisjoint(kept_ids)

    # the maintained index equals batch signatures over the clean corpus
    clean = _batch_clean(spark, docs).select("doc_id", "text")
    want_sig = {
        tuple(r) for r in minhash_signatures(shingle_rows_from_text(clean)).collect()
    }
    got_sig = {tuple(r) for r in ing.index.signatures(spark).collect()}
    assert got_sig == want_sig


def test_cross_chunk_duplicate_keeps_first_arrival(spark, tmp_path):
    docs = _docs(spark)
    ing = DocIngest(str(tmp_path / "doc_lake2"))
    ing.process_batch(docs.filter(col("doc_id") < 10), 0)
    ing.process_batch(docs.filter(col("doc_id") >= 100000), 1)
    kept = {r.doc_id for r in ing.read_corpus(spark).collect()}
    assert 3 in kept  # original
    assert 100000 not in kept and 100001 not in kept  # later exact copies


def test_streamed_chunk_df_state_equals_batch(spark, tmp_path):
    """The ingest-maintained chunk-df index over the streamed clean corpus
    must equal a batch recompute over read_corpus() — boilerplate learned
    incrementally, crawl by crawl."""
    import pyspark.sql.functions as F

    from blockchain_etl_spark.plans.text import chunk_rows_from_text
    from blockchain_etl_spark.streaming.docs import DocIngest

    boiler = " ".join(f"b{i % 5}" for i in range(32))
    docs1 = spark.createDataFrame(
        [(1, boiler + " " + " ".join(f"a{i}" for i in range(32)))],
        ["doc_id", "text"],
    )
    docs2 = spark.createDataFrame(
        [(2, boiler + " " + " ".join(f"c{i}" for i in range(32)))],
        ["doc_id", "text"],
    )
    ing = DocIngest(str(tmp_path / "out"))
    ing.process_batch(docs1, 0)
    ing.process_batch(docs2, 1)

    want = {
        (r.chunk_hash, r.doc_df)
        for r in chunk_rows_from_text(ing.read_corpus(spark).select("doc_id", "text"))
        .groupBy("chunk_hash")
        .agg(F.count_distinct("doc_id").cast("long").alias("doc_df"))
        .collect()
    }
    got = {(r.chunk_hash, r.doc_df) for r in ing.chunk_df.doc_df(spark).collect()}
    assert got == want
    boilerset = {r.chunk_hash for r in ing.chunk_df.boilerplate_hashes(spark).collect()}
    assert len(boilerset) == 2  # the two shared 16-token spans


def test_streamed_vector_index_serves_every_live_chunk(spark, tmp_path):
    """With the retrieval plane on, the streamed IVF index must serve
    every live chunk of the converged corpus: probing with a chunk's own
    vector returns its vec_id at cosine ~1 among the top hits, across
    batch boundaries, a replay, and a re-crawl that changes a doc's
    content (the old chunk vectors must be superseded)."""
    from blockchain_etl_spark.plans.similarity import chunk_vectors

    docs = _docs(spark).cache()
    ing = DocIngest(str(tmp_path / "vec_lake"), vector_index=True)
    chunks = [(0, 200), (200, 400), (400, 10**9)]
    for i, (lo, hi) in enumerate(chunks):
        ing.process_batch(
            docs.filter((col("doc_id") >= lo) & (col("doc_id") < hi)), i
        )
    ing.process_batch(docs.filter(col("doc_id") >= 400), 2)  # replay

    corpus = ing.read_corpus(spark).select("doc_id", "text")
    vecs = chunk_vectors(corpus).cache()
    # probe with a deterministic sample of live chunk vectors
    probes = vecs.filter(col("doc_id") % 37 == 0).select(
        col("vec_id").alias("qid"), "embedding"
    )
    n_probes = probes.count()
    assert n_probes > 5
    got = ing.vectors.query(spark, probes, k=3, probes=8).collect()
    # query() excludes self-hits (vec_id != qid), so the direct probe
    # checks structure: EVERY probe comes back with hits and no
    # (qid, neighbor) duplicates survive the staleness filter
    from collections import Counter

    by_q = Counter(r.qid for r in got)
    assert set(by_q) == {r.qid for r in probes.collect()}, (
        "some probes returned no hits at all"
    )
    dupes = {k: v for k, v in Counter((r.qid, r.neighbor_id) for r in got).items() if v > 1}
    assert not dupes, dupes

    # stronger servability check: probe with a PERTURBED copy of each
    # chunk vector (still closest to the original) and expect the chunk
    # itself as the top hit
    import pyspark.sql.functions as SF

    jittered = vecs.filter(col("doc_id") % 37 == 0).select(
        (col("vec_id") + 10**12).alias("qid"),  # avoid self-exclusion
        SF.expr("transform(embedding, x -> x * CAST(1.0001 AS DOUBLE))").alias("embedding"),
        col("vec_id").alias("expect"),
    )
    hits = ing.vectors.query(
        spark, jittered.select("qid", "embedding"), k=1, probes=8
    )
    top = {r.qid: r.neighbor_id for r in hits.collect()}
    expect = {r.qid: r.expect for r in jittered.collect()}
    matched = sum(1 for q, e in expect.items() if top.get(q) == e)
    # scaling a vector leaves cosine identical, so the true chunk must be
    # the argmax for every probe (ties broken by id only on exact equals)
    assert matched == len(expect), (matched, len(expect))

    # re-crawl: doc 3's text changes entirely AND SHRINKS (fewer chunks);
    # overlapping chunk ids must be superseded in-place and the old
    # TAIL chunks tombstoned — an upsert-only path would keep serving
    # stale vectors whose provenance points at text that no longer exists
    from blockchain_etl_spark.plans.similarity import _CR_SEQ_CAP

    # grow first (batch 3): a long re-crawl gives doc 3 many chunks...
    big_text = " ".join(f"grown{i} token{i % 7} newsworthy" for i in range(140))
    ing.process_batch(
        spark.createDataFrame([(3, big_text, "en")], ["doc_id", "text", "lang"]), 3
    )
    old_chunks = {
        r.vec_id
        for r in chunk_vectors(
            spark.createDataFrame([(3, big_text)], ["doc_id", "text"])
        ).select("vec_id").collect()
    }
    # ...then shrink (batch 4): most of those chunk ids must be retired
    new_text = " ".join(f"fresh{i} token{i % 7} newsworthy" for i in range(18))
    recrawl = spark.createDataFrame(
        [(3, new_text, "en")], ["doc_id", "text", "lang"]
    )
    # content hash differs, so the clean gate admits it as a fresh row
    ing.process_batch(recrawl, 4)
    new_vecs = chunk_vectors(recrawl.select("doc_id", "text")).cache()
    new_ids = {r.vec_id for r in new_vecs.select("vec_id").collect()}
    assert len(new_ids) < len(old_chunks), "test premise: the re-crawl must shrink"

    new_vec = new_vecs.filter(col("chunk_seq") == 1)
    probe = new_vec.select((col("vec_id") + 10**12).alias("qid"), "embedding")
    r = ing.vectors.query(spark, probe, k=1, probes=8).collect()
    assert r and r[0].cosine > 0.9999, r
    assert r[0].neighbor_id == new_vec.collect()[0].vec_id

    # no hit anywhere may unpack to a retired doc-3 tail chunk
    wide = ing.vectors.query(spark, probes, k=10**6, probes=8).collect()
    doc3_hits = {
        r.neighbor_id
        for r in wide
        if r.neighbor_id // _CR_SEQ_CAP == 3
    }
    assert doc3_hits <= new_ids, doc3_hits - new_ids
    # and the tombstones are physically gone from the inventory
    inv_ids = {
        r.vec_id
        for r in ing.vectors._inventory().read(spark).collect()
        if r.vec_id // _CR_SEQ_CAP == 3
    }
    assert inv_ids == new_ids, inv_ids ^ new_ids


def test_streamed_drift_state_equals_batch_over_clean_corpus(spark, tmp_path):
    """DocIngest(drift_state=True): after any batch sequence (including a
    replay), the maintained drift report must BIT-match the batch KL
    computed over exactly the docs that entered the corpus — the
    functions/drift.py single-implementation contract, through the real
    ingest path."""
    from blockchain_etl_spark.functions.drift import (
        drift_from_counts,
        half_token_counts,
    )

    docs = _docs(spark).cache()
    ing = DocIngest(str(tmp_path / "drift_lake"), drift_state=True)
    for i, (lo, hi) in enumerate([(0, 200), (200, 400), (400, 10**9)]):
        ing.process_batch(
            docs.filter((col("doc_id") >= lo) & (col("doc_id") < hi)), i
        )
    ing.process_batch(docs.filter(col("doc_id") >= 400), 2)  # replay: no-op
    got = ing.drift.read_drift(spark).collect()
    want = drift_from_counts(
        half_token_counts(ing.read_corpus(spark).select("doc_id", "text"))
    ).collect()
    assert [r.asDict() for r in got] == [r.asDict() for r in want]
    assert got[0].n_tokens_a > 0 and got[0].n_tokens_b > 0


def test_streamed_lexical_index_equals_batch_over_clean_corpus(spark, tmp_path):
    """DocIngest(lexical_index=True): after any batch sequence (including a
    replay), the maintained BM25 postings must equal a batch tokenize of
    exactly the docs that entered the corpus — the serving state behind
    retrieval_bm25_maintained, through the real ingest path."""
    from blockchain_etl_spark.plans.lexical import term_freq_rows

    docs = _docs(spark).cache()
    ing = DocIngest(str(tmp_path / "lex_lake"), lexical_index=True)
    for i, (lo, hi) in enumerate([(0, 200), (200, 400), (400, 10**9)]):
        ing.process_batch(
            docs.filter((col("doc_id") >= lo) & (col("doc_id") < hi)), i
        )
    ing.process_batch(docs.filter(col("doc_id") >= 400), 2)  # replay: no-op
    got = {
        (r.term, r.doc_id, r.tf)
        for r in ing.lexical.term_frequencies(spark).collect()
    }
    want = {
        (r.term, r.doc_id, r.tf)
        for r in term_freq_rows(
            ing.read_corpus(spark).select("doc_id", "text")
        ).collect()
    }
    assert got == want


def test_run_stream_end_to_end_and_incremental_restart(spark, tmp_path):
    """DocIngest.run_stream: the crawler pipeline as a real Structured
    Streaming job — corpus converges to the batch clean recompute, and a
    SECOND invocation processes only files that arrived after the first
    (checkpoint offsets), folding them on top of the existing state."""
    docs = _docs(spark).cache()
    in_dir = str(tmp_path / "crawls")
    schema = docs.schema
    docs.filter(col("doc_id") < 200).write.parquet(in_dir + "/c0.parquet")
    docs.filter((col("doc_id") >= 200) & (col("doc_id") < 400)).write.parquet(
        in_dir + "/c1.parquet"
    )

    ing = DocIngest(str(tmp_path / "lake"))
    ing.run_stream(spark, in_dir + "/c*.parquet", schema)
    first = docs.filter(col("doc_id") < 400)
    got = {(r.doc_id, r.text) for r in ing.read_corpus(spark).select("doc_id", "text").collect()}
    want = {(r.doc_id, r.text) for r in _batch_clean(spark, first).select("doc_id", "text").collect()}
    assert got == want

    # late files: only the delta is processed on the next invocation
    docs.filter(col("doc_id") >= 400).write.parquet(in_dir + "/c2.parquet")
    ing.run_stream(spark, in_dir + "/c*.parquet", schema)
    got = {(r.doc_id, r.text) for r in ing.read_corpus(spark).select("doc_id", "text").collect()}
    want = {(r.doc_id, r.text) for r in _batch_clean(spark, docs).select("doc_id", "text").collect()}
    assert got == want
    # the maintained MinHash index covers exactly the admitted corpus
    idx_ids = {r.doc_id for r in ing.index.signatures(spark).select("doc_id").collect()}
    assert idx_ids == {d for d, _ in want}
    docs.unpersist()


def test_run_stream_over_lake_with_direct_batch_history(spark, tmp_path):
    """Epoch/watermark collision guard: a lake built by direct
    process_batch calls (watermark already advanced) later driven by
    run_stream must still ingest the stream's files — the pinned base
    keeps foreachBatch epochs strictly above the stored watermark."""
    docs = _docs(spark).cache()
    ing = DocIngest(str(tmp_path / "lake"))
    ing.process_batch(docs.filter(col("doc_id") < 200), 0)
    ing.process_batch(
        docs.filter((col("doc_id") >= 200) & (col("doc_id") < 400)), 1
    )
    assert ing.hashes.watermark() == 1

    in_dir = str(tmp_path / "crawls")
    docs.filter(col("doc_id") >= 400).write.parquet(in_dir + "/c0.parquet")
    ing.run_stream(spark, in_dir + "/c*.parquet", docs.schema)
    got = {(r.doc_id, r.text) for r in ing.read_corpus(spark).select("doc_id", "text").collect()}
    want = {(r.doc_id, r.text) for r in _batch_clean(spark, docs).select("doc_id", "text").collect()}
    assert got == want  # the streamed file was NOT silently dropped
    assert ing.hashes.watermark() >= 2
    docs.unpersist()
