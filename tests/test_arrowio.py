"""Gate-scoped driver-side parquet writes (functions/arrowio.py) must be
read-path-identical to the distributed writer, preserve the _SUCCESS
chunk-commit protocol, and fire ONLY inside a gate_shuffle scope."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from blockchain_etl_spark.functions.arrowio import write_parquet_driver
from blockchain_etl_spark.operators.merge import ParquetMergeTarget, merge_latest
from blockchain_etl_spark.session import gate_shuffle


def test_arrow_write_roundtrips_values_and_schema(spark, tmp_path):
    df = spark.range(0, 100).select(
        F.col("id").alias("k"),
        F.concat(F.lit("v"), F.col("id").cast("string")).alias("s"),
        (F.col("id") * 1.5).alias("d"),
        F.when(F.col("id") % 3 == 0, F.col("id")).alias("nullable_long"),
    )
    d = str(tmp_path / "arrow")
    assert write_parquet_driver(df, d)
    back = spark.read.parquet(d)
    assert [(f.name, f.dataType) for f in back.schema.fields] == [
        (f.name, f.dataType) for f in df.schema.fields
    ]
    assert sorted(back.collect(), key=str) == sorted(df.collect(), key=str)
    assert not os.path.exists(os.path.join(d, "_SUCCESS"))


def test_arrow_write_success_marker_and_overwrite(spark, tmp_path):
    d = str(tmp_path / "chunk")
    assert write_parquet_driver(spark.range(0, 5), d, success_marker=True)
    assert os.path.exists(os.path.join(d, "_SUCCESS"))
    # overwrite replaces prior contents entirely
    assert write_parquet_driver(spark.range(0, 3), d, success_marker=True)
    back = spark.read.parquet(d)
    assert back.count() == 3


def test_arrow_miss_falls_back_to_distributed_writer(spark, tmp_path, monkeypatch):
    """The Arrow-miss fallback contract: a schema that does not convert
    to Arrow (CalendarIntervalType) returns False from
    write_parquet_driver WITHOUT touching the target directory, and a
    gate-scoped merge whose Arrow write misses lands in the
    distributed writer with identical committed state (a miss silently
    changes the write PATH, never the rows)."""
    # leg 1: a REAL conversion miss on the real function
    iv = spark.range(0, 7).selectExpr(
        "id AS k", "make_interval(0, 0, 0, CAST(id AS INT)) AS iv"
    )
    d = str(tmp_path / "miss")
    with gate_shuffle(spark):
        assert write_parquet_driver(iv, d) is False
    assert not os.path.exists(d)  # a miss writes NOTHING

    # leg 2: caller routing on a miss — force the miss (no parquet-
    # writable type fails Arrow conversion in this Spark build, so the
    # real-schema miss can't drive the caller end-to-end) and assert
    # the gate-scoped merge falls through to the distributed writer
    import blockchain_etl_spark.functions.arrowio as arrowio

    monkeypatch.setattr(
        arrowio, "write_parquet_driver", lambda *a, **k: False
    )
    df = spark.range(0, 7).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    t = ParquetMergeTarget(str(tmp_path / "miss_target"))
    with gate_shuffle(spark):
        t.merge_with(
            spark, df,
            lambda tg, u: merge_latest(tg, u, keys=["k"], order=["v"]),
            watermark=1,
        )
    files = os.listdir(os.path.join(str(tmp_path / "miss_target"), "v=1"))
    assert "_SUCCESS" in files  # distributed commit protocol ran
    monkeypatch.undo()
    t_ref = ParquetMergeTarget(str(tmp_path / "ref_target"))
    t_ref.merge_with(
        spark, df,
        lambda tg, u: merge_latest(tg, u, keys=["k"], order=["v"]),
        watermark=1,
    )
    assert sorted(t.read(spark).collect(), key=str) == sorted(
        t_ref.read(spark).collect(), key=str
    )
    assert t.current_version() == 1 and t.watermark() == 1


def test_rows_cap_falls_back_to_distributed_writer(spark, tmp_path, monkeypatch):
    """A frame that overflows _DRIVER_ROWS_CAP is by definition not a
    gate-bounded frame: write_parquet_driver must refuse (False) so the
    caller keeps the distributed writer — the 'bounded gate corpus'
    invariant enforced structurally, not by convention."""
    import blockchain_etl_spark.functions.arrowio as arrowio

    monkeypatch.setattr(arrowio, "_DRIVER_ROWS_CAP", 50)
    big = spark.range(0, 51).select(F.col("id").alias("k"))
    ok = spark.range(0, 50).select(F.col("id").alias("k"))
    d_big, d_ok = str(tmp_path / "big"), str(tmp_path / "ok")
    with gate_shuffle(spark):
        assert arrowio.write_parquet_driver(big, d_big) is False
        assert arrowio.write_parquet_driver(ok, d_ok) is True
    assert not os.path.exists(d_big)
    assert spark.read.parquet(d_ok).count() == 50


def test_gate_shuffle_restores_confs_when_pin_fails(spark, monkeypatch):
    """If conf pinning raises mid-loop, the latch must clear and every
    already-pinned conf must be restored — otherwise the session keeps
    codegen/AQE half-disabled and every later gate raises 'not
    reentrant' (round-13 hardening of the session-global override)."""
    from blockchain_etl_spark import session as sess

    keys = [
        "spark.sql.shuffle.partitions",
        "spark.sql.adaptive.enabled",
        "spark.sql.codegen.wholeStage",
    ]
    before = {k: spark.conf.get(k) for k in keys}
    real_set = spark.conf.set
    calls = {"n": 0}

    def boom(k, v):
        calls["n"] += 1
        if calls["n"] == 3:  # fail mid-pin, after two keys are set
            raise RuntimeError("injected conf failure")
        real_set(k, v)

    monkeypatch.setattr(spark.conf, "set", boom)
    try:
        with gate_shuffle(spark):
            raise AssertionError("gate body must not run")
    except RuntimeError as exc:
        assert "injected conf failure" in str(exc)
    monkeypatch.undo()
    assert {k: spark.conf.get(k) for k in keys} == before
    assert not sess.gate_scope_active()
    # and the session is NOT locked out: a later gate enters cleanly
    with gate_shuffle(spark):
        assert sess.gate_scope_active()
    assert not sess.gate_scope_active()


def test_merge_target_uses_arrow_writer_only_in_gate_scope(spark, tmp_path):
    t_out = ParquetMergeTarget(str(tmp_path / "outside"))
    df = spark.range(0, 10).select(F.col("id").alias("k"), F.col("id").alias("v"))
    t_out.merge_with(
        spark, df, lambda t, u: merge_latest(t, u, keys=["k"], order=["v"]),
        watermark=1,
    )
    # outside a gate: distributed writer (Spark part files + _SUCCESS)
    files_out = os.listdir(os.path.join(str(tmp_path / "outside"), "v=1"))
    assert "_SUCCESS" in files_out

    t_in = ParquetMergeTarget(str(tmp_path / "inside"))
    with gate_shuffle(spark):
        t_in.merge_with(
            spark, df, lambda t, u: merge_latest(t, u, keys=["k"], order=["v"]),
            watermark=1,
        )
    files_in = os.listdir(os.path.join(str(tmp_path / "inside"), "v=1"))
    assert files_in == ["part-00000.parquet"]
    # identical state either way
    a = sorted(t_out.read(spark).collect(), key=str)
    b = sorted(t_in.read(spark).collect(), key=str)
    assert a == b


def test_driver_write_target_uses_arrow_writer_outside_gate(spark, tmp_path):
    """A target tagged driver_write=True (structurally bounded state —
    CMS cells/candidates) takes the Arrow write path on every merge,
    gate scope or not, with state identical to the distributed writer."""
    df = spark.range(0, 10).select(F.col("id").alias("k"), F.col("id").alias("v"))
    t_dist = ParquetMergeTarget(str(tmp_path / "dist"))
    t_drv = ParquetMergeTarget(str(tmp_path / "drv"), driver_write=True)
    for t in (t_dist, t_drv):
        t.merge_with(
            spark, df, lambda tg, u: merge_latest(tg, u, keys=["k"], order=["v"]),
            watermark=1,
        )
    assert "_SUCCESS" in os.listdir(os.path.join(str(tmp_path / "dist"), "v=1"))
    assert os.listdir(os.path.join(str(tmp_path / "drv"), "v=1")) == [
        "part-00000.parquet"
    ]
    a = sorted(t_dist.read(spark).collect(), key=str)
    b = sorted(t_drv.read(spark).collect(), key=str)
    assert a == b


def test_gate_and_non_gate_merge_sequences_interleave(spark, tmp_path):
    """A target written inside a gate must keep merging cleanly outside
    one (and vice versa) — versions, watermark and rows all agree."""
    t = ParquetMergeTarget(str(tmp_path / "mixed"))

    def upd(lo, hi, wm, gated):
        df = spark.range(lo, hi).select(
            F.col("id").alias("k"), (F.col("id") * 10).alias("v")
        )
        if gated:
            with gate_shuffle(spark):
                t.merge_with(
                    spark, df,
                    lambda tg, u: merge_latest(tg, u, keys=["k"], order=["v"]),
                    watermark=wm,
                )
        else:
            t.merge_with(
                spark, df,
                lambda tg, u: merge_latest(tg, u, keys=["k"], order=["v"]),
                watermark=wm,
            )

    upd(0, 5, 1, gated=True)
    upd(5, 10, 2, gated=False)
    upd(10, 12, 3, gated=True)
    assert t.current_version() == 3
    assert t.watermark() == 3
    assert t.read(spark).count() == 12


def test_gate_scoped_chunk_write_keeps_commit_protocol(spark, tmp_path):
    """Inside a gate, DocIngest chunk writes go through the Arrow writer —
    which must still leave the _SUCCESS marker _complete_chunks keys on
    (regression: the first Arrow-write cut dropped it and every chunk
    became invisible crash debris, corpus watermark -1)."""
    from blockchain_etl_spark.streaming.docs import DocIngest

    docs = spark.range(0, 40).selectExpr(
        "id AS doc_id",
        "concat('alpha bravo charlie delta echo foxtrot golf hotel india "
        "juliet kilo lima mike november oscar papa word', CAST(id AS STRING),"
        " ' quebec romeo sierra tango uniform victor whiskey xray yankee "
        "zulu one two three four five six seven eight nine ten') AS text",
    )
    ing = DocIngest(str(tmp_path / "lake"))
    with gate_shuffle(spark):
        ing.process_batch(docs, 1)
    assert ing._complete_chunks() == [1]
    chunk = os.path.join(str(tmp_path / "lake"), "docs", "chunk=1")
    files = sorted(os.listdir(chunk))
    assert files == ["_SUCCESS", "part-00000.parquet"]
    assert ing.plane_watermarks()["corpus_chunks"] == 1
    rep = ing.audit()
    assert rep["consistent"], rep
    # and the lake keeps working OUTSIDE the gate afterwards
    ing.process_batch(
        docs.selectExpr("doc_id + 100 AS doc_id", "concat(text, ' more') AS text"),
        2,
    )
    assert ing._complete_chunks() == [1, 2]
    assert ing.read_corpus(spark).count() == 80


def test_fast_count_equals_spark_count(spark, tmp_path):
    """Footer-based fast_count must equal read().count() for BOTH write
    paths (driver Arrow file inside a gate, Spark part files outside),
    and corpus_row_count must equal read_corpus().count() — the
    contract the zero-job audit report rests on."""
    from blockchain_etl_spark.streaming.docs import DocIngest

    t = ParquetMergeTarget(str(tmp_path / "t"))
    assert t.fast_count() is None
    df = spark.range(0, 123).select(F.col("id").alias("k"), F.col("id").alias("v"))
    with gate_shuffle(spark):  # v=1 via the driver Arrow writer
        t.merge_with(
            spark, df, lambda tg, u: merge_latest(tg, u, keys=["k"], order=["v"]),
            watermark=1,
        )
    assert t.fast_count() == t.read(spark).count() == 123
    # v=2 via the distributed writer (multiple part files)
    t.merge_with(
        spark,
        spark.range(0, 200).select(F.col("id").alias("k"), F.col("id").alias("v")),
        lambda tg, u: merge_latest(tg, u, keys=["k"], order=["v"]),
        watermark=2,
    )
    assert t.fast_count() == t.read(spark).count() == 200

    docs = spark.range(0, 60).selectExpr(
        "id AS doc_id",
        "concat('alpha bravo charlie delta echo foxtrot golf hotel india "
        "juliet kilo lima mike november oscar papa word', CAST(id AS STRING),"
        " ' quebec romeo sierra tango uniform victor whiskey xray yankee "
        "zulu one two three four five six seven eight nine ten') AS text",
    )
    ing = DocIngest(str(tmp_path / "lake"))
    ing.process_batch(docs.filter(F.col("doc_id") < 30), 1)
    with gate_shuffle(spark):
        ing.process_batch(docs.filter(F.col("doc_id") >= 30), 2)
    assert ing.corpus_row_count() == ing.read_corpus(spark).count() == 60
