"""Maintained decontamination plane: the screened-state ≡ batch-screen
property under any chunking, with re-crawls, deletes, and crash-replays —
plus the ingest-time hook (DocIngest(contamination_screen=True)) matching
the batch screen over the clean corpus it actually admitted."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from blockchain_etl_spark.operators.contamination_index import ContaminationIndex
from blockchain_etl_spark.plans.pipeline import (
    _contamination_per_doc,
    contamination_matrix_rollup,
    contamination_shingles,
)

# Benchmark docs hold distinctive 5-gram phrases; train docs quote some.
BENCH = [
    ("evalA", 900, "the quick brown fox jumps over the lazy dog tonight"),
    ("evalA", 901, "machine learning benchmarks measure held out accuracy"),
    ("evalB", 902, "seven silver swans swim slowly south before sunrise"),
]
TRAIN = [
    # quotes evalA doc 900 verbatim inside a longer body
    (1, "intro words then the quick brown fox jumps over the lazy dog "
        "tonight and a closing remark"),
    # clean
    (2, "completely unrelated training text with enough words to shingle"),
    # quotes evalB doc 902 partially (one full 5-gram window)
    (3, "nature notes seven silver swans swim slowly and then stop"),
    # clean
    (4, "another clean document body that shares nothing with the evals"),
]


def _bench(spark):
    return spark.createDataFrame(BENCH, ["source", "doc_id", "text"])


def _train(spark, rows=None):
    return spark.createDataFrame(rows or TRAIN, ["doc_id", "text"])


def _batch_matrix(spark, train_rows):
    """Independent batch recompute through the registered-query scaffolding:
    benchmarks + current train union, one contamination pass."""
    both = _bench(spark).unionByName(
        _train(spark, train_rows).select(
            F.lit("train").alias("source"), "doc_id", "text"
        )
    )
    per_doc = _contamination_per_doc(
        contamination_shingles(both), ("evalA", "evalB")
    )
    return {
        tuple(r) for r in contamination_matrix_rollup(per_doc).collect()
    }


def _matrix(ix, spark):
    return {tuple(r) for r in ix.matrix(spark).collect()}


def _evidence(ix, spark):
    ev = ix.evidence.read(spark)
    return set() if ev is None else {(r.shingle, r.doc_id) for r in ev.collect()}


def test_incremental_equals_batch_under_any_chunking(spark, tmp_path):
    whole = ContaminationIndex(str(tmp_path / "whole"))
    whole.build(spark, _bench(spark))
    whole.screen(spark, _train(spark), watermark=1)

    split = ContaminationIndex(str(tmp_path / "split"))
    split.build(spark, _bench(spark))
    split.screen(spark, _train(spark).filter("doc_id <= 2"), watermark=1)
    split.screen(spark, _train(spark).filter("doc_id > 2"), watermark=2)

    want = _batch_matrix(spark, TRAIN)
    assert _matrix(whole, spark) == want
    assert _matrix(split, spark) == want
    assert _evidence(whole, spark) == _evidence(split, spark)
    # contamination actually present: docs 1 and 3 hit
    assert {d for (_, d) in _evidence(whole, spark)} == {1, 3}


def test_recrawl_replaces_evidence(spark, tmp_path):
    ix = ContaminationIndex(str(tmp_path / "i"))
    ix.build(spark, _bench(spark))
    ix.screen(spark, _train(spark), watermark=1)
    # doc 1 re-crawled CLEAN, doc 2 re-crawled now quoting evalA doc 901
    recrawl = [
        (1, "scrubbed clean rewrite with none of the quoted material left"),
        (2, "now contains machine learning benchmarks measure held out "
            "accuracy verbatim"),
    ]
    ix.screen(spark, _train(spark, recrawl), watermark=2)
    final = recrawl + [r for r in TRAIN if r[0] > 2]
    assert _matrix(ix, spark) == _batch_matrix(spark, final)
    assert {d for (_, d) in _evidence(ix, spark)} == {2, 3}


def test_recrawl_to_zero_hits_sheds_all_evidence(spark, tmp_path):
    ix = ContaminationIndex(str(tmp_path / "i"))
    ix.build(spark, _bench(spark))
    ix.screen(spark, _train(spark), watermark=1)
    clean = [(d, "harmless replacement text with enough words to shingle fine")
             for d, _ in TRAIN]
    ix.screen(spark, _train(spark, clean), watermark=2)
    assert _evidence(ix, spark) == set()
    assert _matrix(ix, spark) == _batch_matrix(spark, clean)


def test_replay_is_a_noop(spark, tmp_path):
    ix = ContaminationIndex(str(tmp_path / "i"))
    ix.build(spark, _bench(spark))
    ix.screen(spark, _train(spark).filter("doc_id <= 2"), watermark=1)
    ix.screen(spark, _train(spark).filter("doc_id > 2"), watermark=2)
    before = _evidence(ix, spark)
    ix.screen(spark, _train(spark).filter("doc_id > 2"), watermark=2)  # crash replay
    assert _evidence(ix, spark) == before


def test_delete_drops_evidence_and_keeps_replay_guard(spark, tmp_path):
    ix = ContaminationIndex(str(tmp_path / "i"))
    ix.build(spark, _bench(spark))
    ix.screen(spark, _train(spark), watermark=1)
    ix.delete(spark, _train(spark).filter("doc_id = 1").select("doc_id"))
    assert {d for (_, d) in _evidence(ix, spark)} == {3}
    # unwatermarked maintenance fold must not reset the replay guard
    ix.screen(spark, _train(spark), watermark=1)
    assert {d for (_, d) in _evidence(ix, spark)} == {3}


def test_verdicts_count_distinct_bench_shingles(spark, tmp_path):
    ix = ContaminationIndex(str(tmp_path / "i"))
    ix.build(spark, _bench(spark))
    ix.screen(spark, _train(spark), watermark=1)
    got = {(r.doc_id, r.n_bench_shingles) for r in ix.verdicts(spark).collect()}
    # independent recompute: train-doc shingles ∩ distinct bench shingles
    bench_sh = contamination_shingles(
        _bench(spark), keys=("doc_id",)
    ).select("shingle").distinct()
    want = {
        (r.doc_id, r.n)
        for r in contamination_shingles(_train(spark), keys=("doc_id",))
        .join(bench_sh, ["shingle"])
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .collect()
    }
    assert got == want and got


def test_screen_before_build_raises(spark, tmp_path):
    ix = ContaminationIndex(str(tmp_path / "i"))
    with pytest.raises(FileNotFoundError):
        ix.screen(spark, _train(spark), watermark=1)


def test_matrix_with_no_screens_reports_zero_hits(spark, tmp_path):
    ix = ContaminationIndex(str(tmp_path / "i"))
    ix.build(spark, _bench(spark))
    rows = {r.benchmark: r for r in ix.matrix(spark).collect()}
    assert set(rows) == {"evalA", "evalB"}
    assert all(r.n_contaminated == 0 and r.n_docs_contaminated == 0
               for r in rows.values())


def test_doc_ingest_screen_hook_matches_batch_over_admitted_corpus(
    spark, tmp_path
):
    """DocIngest(contamination_screen=True): the maintained matrix equals
    the batch screen over exactly the docs the ingest ADMITTED (post
    quality + dedup), across two batches."""
    from blockchain_etl_spark.streaming.docs import DocIngest

    ing = DocIngest(str(tmp_path / "lake"), contamination_screen=True)
    ing.contamination.build(spark, _bench(spark))
    # pad texts past the MIN_TOKENS=10 quality gate
    rows = [
        (1, TRAIN[0][1]),
        (2, TRAIN[1][1] + " extra padding tokens beyond the minimum gate"),
        (3, TRAIN[2][1] + " extra padding tokens beyond the minimum gate"),
        (4, TRAIN[3][1] + " extra padding tokens beyond the minimum gate"),
        (5, TRAIN[0][1]),  # exact duplicate of doc 1 → deduped, never screened
    ]
    docs = spark.createDataFrame(
        [(d, t, "en") for d, t in rows], ["doc_id", "text", "lang"]
    )
    ing.process_batch(docs.filter("doc_id <= 2"), 0)
    ing.process_batch(docs.filter("doc_id > 2"), 1)
    admitted = [
        (r.doc_id, r.text) for r in ing.read_corpus(spark).collect()
    ]
    assert {d for d, _ in admitted} == {1, 2, 3, 4}  # dup 5 dropped
    assert _matrix(ing.contamination, spark) == _batch_matrix(spark, admitted)


def test_quarantine_gate_blocks_contaminated_docs(spark, tmp_path):
    """DocIngest(contamination_quarantine=N): docs at or over N distinct
    benchmark-shingle hits never reach the corpus or the indexes; they
    land in the quarantine audit trail with their counts, the admitted
    remainder is screened as usual, and replays stay idempotent."""
    from blockchain_etl_spark.streaming.docs import DocIngest

    ing = DocIngest(
        str(tmp_path / "lake"),
        contamination_screen=True,
        contamination_quarantine=2,
    )
    ing.contamination.build(spark, _bench(spark))
    rows = [
        # doc 1 quotes evalA doc 900 fully: many hits -> quarantined
        (1, TRAIN[0][1]),
        (2, TRAIN[1][1] + " extra padding tokens beyond the minimum gate"),
        # doc 3 has exactly ONE hit window: stays admitted under N=2
        (3, TRAIN[2][1] + " extra padding tokens beyond the minimum gate"),
        (4, TRAIN[3][1] + " extra padding tokens beyond the minimum gate"),
    ]
    docs = spark.createDataFrame(
        [(d, t, "en") for d, t in rows], ["doc_id", "text", "lang"]
    )
    ing.process_batch(docs.filter("doc_id <= 2"), 0)
    ing.process_batch(docs.filter("doc_id > 2"), 1)
    ing.process_batch(docs.filter("doc_id > 2"), 1)  # replay: idempotent

    admitted = {r.doc_id for r in ing.read_corpus(spark).collect()}
    assert admitted == {2, 3, 4}
    quarantined = {
        (r.doc_id, r.n_bench_shingles)
        for r in ing.read_quarantine(spark).collect()
    }
    assert {d for d, _ in quarantined} == {1}
    assert all(n >= 2 for _, n in quarantined)
    # no index saw doc 1
    assert not ing.index.signatures(spark).filter("doc_id = 1").take(1)
    # the screen state covers exactly the admitted corpus
    admitted_rows = [
        (r.doc_id, r.text) for r in ing.read_corpus(spark).collect()
    ]
    assert _matrix(ing.contamination, spark) == _batch_matrix(
        spark, admitted_rows
    )
    # doc 3's single hit is recorded as evidence but stayed under the gate
    assert {d for (_, d) in _evidence(ing.contamination, spark)} == {3}


def test_quarantine_requires_screen(spark, tmp_path):
    from blockchain_etl_spark.streaming.docs import DocIngest

    with pytest.raises(ValueError, match="contamination_screen"):
        DocIngest(str(tmp_path / "bad"), contamination_quarantine=1)


def test_quarantined_recrawl_keeps_prior_evidence(spark, tmp_path):
    """A doc admitted with below-threshold evidence, then re-crawled with
    heavily contaminated text: the re-crawl is quarantined, the corpus
    keeps the OLD text, and the evidence keeps the OLD rows — the
    admitted-ids-keyed replacement must not retract state for a doc
    whose corpus version did not change."""
    from blockchain_etl_spark.streaming.docs import DocIngest

    ing = DocIngest(
        str(tmp_path / "lake"),
        contamination_screen=True,
        contamination_quarantine=2,
    )
    ing.contamination.build(spark, _bench(spark))
    v1 = (3, TRAIN[2][1] + " extra padding tokens beyond the minimum gate")
    ing.process_batch(
        spark.createDataFrame([(v1[0], v1[1], "en")], ["doc_id", "text", "lang"]),
        0,
    )
    assert {d for (_, d) in _evidence(ing.contamination, spark)} == {3}
    before = _evidence(ing.contamination, spark)
    # re-crawl of doc 3 quoting evalA doc 900 fully -> quarantined
    ing.process_batch(
        spark.createDataFrame(
            [(3, TRAIN[0][1] + " padded beyond the minimum token gate", "en")],
            ["doc_id", "text", "lang"],
        ),
        1,
    )
    assert {r.doc_id for r in ing.read_quarantine(spark).collect()} == {3}
    corpus = {(r.doc_id, r.text) for r in ing.read_corpus(spark).collect()}
    assert corpus == {v1}  # old text still the corpus version
    assert _evidence(ing.contamination, spark) == before
    assert _matrix(ing.contamination, spark) == _batch_matrix(spark, [v1])


BENCH_C = [("evalC", 903, "purple mountain majesty rises above the fruited plain today")]


def test_add_benchmark_equals_union_registry_from_scratch(spark, tmp_path):
    """Adopting a new eval set mid-stream (registry merge + one targeted
    corpus backfill) must equal having built the union registry up front
    and screened everything against it."""
    train_v2 = TRAIN + [
        (5, "travel notes purple mountain majesty rises above the fruited "
            "plain today and beyond"),
    ]
    # path A: build evalA+evalB, screen corpus, then adopt evalC later
    a = ContaminationIndex(str(tmp_path / "a"))
    a.build(spark, _bench(spark))
    a.screen(spark, _train(spark, train_v2), watermark=1)
    a.add_benchmark(
        spark,
        spark.createDataFrame(BENCH_C, ["source", "doc_id", "text"]),
        _train(spark, train_v2),
    )
    # path B: union registry from scratch
    b = ContaminationIndex(str(tmp_path / "b"))
    b.build(
        spark,
        _bench(spark).unionByName(
            spark.createDataFrame(BENCH_C, ["source", "doc_id", "text"])
        ),
    )
    b.screen(spark, _train(spark, train_v2), watermark=1)
    assert _evidence(a, spark) == _evidence(b, spark)
    assert _matrix(a, spark) == _matrix(b, spark)
    # the new benchmark actually matched the corpus (backfill ran)
    assert any(d == 5 for (_, d) in _evidence(a, spark))
    # and later screens see the enlarged registry
    extra = [(6, "more purple mountain majesty rises above the fruited plain "
                 "today content here")]
    a.screen(spark, _train(spark, extra), watermark=2)
    b.screen(spark, _train(spark, extra), watermark=2)
    assert _evidence(a, spark) == _evidence(b, spark)


def test_add_benchmark_with_overlapping_shingles_keeps_evidence_exact(
    spark, tmp_path
):
    """A new benchmark sharing shingles with an existing one must not
    duplicate evidence rows (backfill touches only genuinely-new
    shingles)."""
    a = ContaminationIndex(str(tmp_path / "ov"))
    a.build(spark, _bench(spark))
    a.screen(spark, _train(spark), watermark=1)
    before = _evidence(a, spark)
    # evalD quotes evalA doc 900 verbatim: zero new shingles... plus one
    # genuinely new phrase
    dup_bench = [
        ("evalD", 904, "the quick brown fox jumps over the lazy dog tonight"),
        ("evalD", 905, "completely novel benchmark phrase appearing nowhere else"),
    ]
    a.add_benchmark(
        spark,
        spark.createDataFrame(dup_bench, ["source", "doc_id", "text"]),
        _train(spark),
    )
    assert _evidence(a, spark) == before  # no corpus doc matched the new phrase
    # evalD now reports through the SHARED shingle evidence
    rows = {r.benchmark: r for r in a.matrix(spark).collect()}
    assert rows["evalD"].n_docs_contaminated == 1  # doc 904 via doc 1's quote


def test_add_benchmark_ignores_superseded_recrawl_texts(spark, tmp_path):
    """A doc re-crawled CLEAN before a new benchmark is adopted: the
    superseded chunk still holds the old text, but add_benchmark must
    backfill from CURRENT texts only — resurrecting evidence the
    re-crawl's screen already retracted would poison the matrix."""
    from blockchain_etl_spark.streaming.docs import DocIngest

    ing = DocIngest(str(tmp_path / "lake"), contamination_screen=True)
    ing.contamination.build(spark, _bench(spark))
    # v1 contains the phrase evalC will later adopt
    v1 = "travel notes purple mountain majesty rises above the fruited plain today and beyond"
    v2 = "scrubbed clean rewrite body with enough plain words to pass the quality gate fine"
    ing.process_batch(
        spark.createDataFrame([(7, v1, "en")], ["doc_id", "text", "lang"]), 0
    )
    ing.process_batch(  # re-crawl: new hash, admitted, supersedes v1
        spark.createDataFrame([(7, v2, "en")], ["doc_id", "text", "lang"]), 1
    )
    assert {r.doc_id for r in ing.read_corpus(spark).collect()} == {7}
    assert ing.read_corpus(spark).count() == 2  # both crawl rows retained
    cur = ing.read_corpus_current(spark).collect()
    assert len(cur) == 1 and cur[0].text == v2
    ing.add_benchmark(
        spark, spark.createDataFrame(BENCH_C, ["source", "doc_id", "text"])
    )
    # v1's phrase must NOT have produced evidence for doc 7
    assert not any(d == 7 for (_, d) in _evidence(ing.contamination, spark))
    rows = {r.benchmark: r for r in ing.contamination.matrix(spark).collect()}
    assert rows["evalC"].n_docs_contaminated == 0


def test_add_benchmark_on_empty_corpus_merges_registry(spark, tmp_path):
    from blockchain_etl_spark.streaming.docs import DocIngest

    ing = DocIngest(str(tmp_path / "lake"), contamination_screen=True)
    ing.contamination.build(spark, _bench(spark))
    ing.add_benchmark(  # no crawls yet: registry merge + zero-row backfill
        spark, spark.createDataFrame(BENCH_C, ["source", "doc_id", "text"])
    )
    rows = {r.benchmark for r in ing.contamination.matrix(spark).collect()}
    assert rows == {"evalA", "evalB", "evalC"}
    # first crawl screens against the enlarged registry
    ing.process_batch(
        spark.createDataFrame(
            [(5, "travel notes purple mountain majesty rises above the "
                 "fruited plain today and beyond", "en")],
            ["doc_id", "text", "lang"],
        ),
        0,
    )
    assert any(d == 5 for (_, d) in _evidence(ing.contamination, spark))


def test_add_benchmark_crash_window_converges_on_retry(spark, tmp_path):
    """Crash between the evidence backfill (commits FIRST) and the
    registry merge: retrying add_benchmark must converge to the clean
    one-shot state — the distinct folds absorb the duplicate backfill."""
    train_v2 = TRAIN + [
        (5, "travel notes purple mountain majesty rises above the fruited "
            "plain today and beyond"),
    ]
    a = ContaminationIndex(str(tmp_path / "a"))
    a.build(spark, _bench(spark))
    a.screen(spark, _train(spark, train_v2), watermark=1)
    bench_c = spark.createDataFrame(BENCH_C, ["source", "doc_id", "text"])
    # simulate the crash: apply ONLY the evidence-backfill half
    fresh = (
        contamination_shingles(bench_c, keys=("doc_id",))
        .select("shingle").distinct()
        .join(a.registry.read(spark).select("shingle"), ["shingle"], "left_anti")
    )
    backfill = (
        contamination_shingles(_train(spark, train_v2), keys=("doc_id",))
        .join(fresh, ["shingle"]).select("shingle", "doc_id")
    )
    a.evidence.merge_with(
        spark, backfill,
        lambda tgt, upd: upd.distinct() if tgt is None
        else tgt.unionByName(upd).distinct(),
    )
    # retry completes both halves
    a.add_benchmark(spark, bench_c, _train(spark, train_v2))

    b = ContaminationIndex(str(tmp_path / "b"))
    b.build(spark, _bench(spark))
    b.screen(spark, _train(spark, train_v2), watermark=1)
    b.add_benchmark(spark, bench_c, _train(spark, train_v2))
    assert _evidence(a, spark) == _evidence(b, spark)
    assert _matrix(a, spark) == _matrix(b, spark)
