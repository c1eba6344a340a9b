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
