"""Continuous aggregate (hypertable rollup): the stored rollup must equal
the batch recompute over everything seen so far — at any chunk order
(late data), after replays, and with the refresh touching only the
buckets a batch contains."""

from __future__ import annotations

import pyspark.sql.functions as F

SF = "/root/testdata/sf0.001"


def _expected(events):
    from blockchain_etl_spark.functions.numeric import DEC

    return (
        events.withColumn("bucket_ts", F.date_trunc("hour", F.col("ts")))
        .groupBy("bucket_ts", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast(DEC)).cast(DEC).alias("sum_value"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )
    )


def _rows(df):
    return {tuple(r) for r in df.collect()}


def test_continuous_aggregate_stream_equals_batch(spark, tmp_path):
    from blockchain_etl_spark.operators.rollup import ContinuousAggregate
    from blockchain_etl_spark.sources.testdata import load_table

    events = load_table(spark, SF, "events").select("ts", "event_type", "value")
    # three chunks in NON-chronological order: the middle of the time range
    # arrives last, so its buckets are re-folded (late data path)
    chunks = [
        events.filter(F.dayofmonth("ts") <= 8),
        events.filter(F.dayofmonth("ts") >= 20),
        events.filter((F.dayofmonth("ts") > 8) & (F.dayofmonth("ts") < 20)),
    ]
    agg = ContinuousAggregate(str(tmp_path / "rollup"))
    for wm, chunk in enumerate(chunks):
        agg.refresh(spark, chunk, watermark=wm)

    assert _rows(agg.read(spark)) == _rows(_expected(events))

    # replay of an already-folded batch (stale watermark) must be a no-op
    agg.refresh(spark, chunks[0], watermark=0)
    assert _rows(agg.read(spark)) == _rows(_expected(events))


def test_refresh_preserves_untouched_buckets_and_schema(spark, tmp_path):
    from blockchain_etl_spark.operators.rollup import ContinuousAggregate
    from blockchain_etl_spark.sources.testdata import load_table

    events = load_table(spark, SF, "events").select("ts", "event_type", "value")
    early = events.filter(F.dayofmonth("ts") <= 3)
    late = events.filter(F.dayofmonth("ts") >= 28)
    agg = ContinuousAggregate(str(tmp_path / "rollup"))
    agg.refresh(spark, early, watermark=0)
    v1 = {r.bucket_ts: r for r in agg.read(spark).collect()}
    schema1 = agg.read(spark).schema
    agg.refresh(spark, late, watermark=1)
    v2 = {r.bucket_ts: r for r in agg.read(spark).collect()}
    # disjoint time ranges: every v1 bucket row survives untouched
    for b, row in v1.items():
        assert v2[b] == row, b
    # decimal accumulator type pinned across folds (no precision drift)
    assert agg.read(spark).schema == schema1


def test_continuous_aggregate_from_structured_stream(spark, tmp_path):
    """The rollup refresh IS the foreachBatch contract: a file stream
    (1 file per microbatch) folded through ContinuousAggregate must equal
    the batch recompute, including replay-safety via batch_id watermarks."""
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StringType,
        StructField,
        StructType,
        TimestampType,
    )

    from blockchain_etl_spark.operators.rollup import ContinuousAggregate
    from blockchain_etl_spark.sources.testdata import load_table

    schema = StructType(
        [
            StructField("ts", TimestampType()),
            StructField("event_type", StringType()),
            StructField("value", DoubleType()),
        ]
    )
    events = load_table(spark, SF, "events").select("ts", "event_type", "value")
    indir = tmp_path / "in"
    for i, cond in enumerate(
        [F.dayofmonth("ts") <= 10, F.dayofmonth("ts") > 10]
    ):
        events.filter(cond).coalesce(1).write.parquet(str(indir / f"chunk{i}"))

    agg = ContinuousAggregate(str(tmp_path / "rollup"))

    def fold(batch, batch_id):
        agg.refresh(batch.sparkSession, batch, watermark=batch_id)

    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(indir / "chunk*"))
        .writeStream.foreachBatch(fold)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    assert _rows(agg.read(spark)) == _rows(_expected(events))
