"""Continuous time-bucketed aggregate — the hypertable-rollup operator:
a persisted per-(time_bucket, key) aggregate table maintained
incrementally from event batches, with late data handled by re-folding
ONLY the buckets a batch touches.

Semantics follow the reference's running-stats discipline
(src/be_db_stats.erl:63-99 — associative counters folded per block,
exactly-once under replay) generalized to time buckets; the refresh
contract is the TimescaleDB continuous-aggregate one: the stored rollup
always equals the batch recompute over all data seen so far, at any
arrival order (tests/test_rollup.py proves stream ≡ batch under shuffled
late chunks).

Scale shape per refresh:
- the batch partial-aggregates map-side to one row per (bucket, key) —
  batch-sized shuffle, never state-sized;
- the stored state splits into touched/untouched by a BROADCAST semi/anti
  join on the batch's distinct bucket list (tiny — buckets per batch);
- only the touched slice unions with the partial and re-aggregates.
So refresh cost is O(batch + touched buckets), independent of how many
historical buckets the rollup holds — the property that lets a 100 TB
event store keep an always-fresh hourly rollup. Publication reuses
ParquetMergeTarget's version-and-pointer-flip (atomic, replay-safe via
the watermark guard).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.numeric import DEC
from .merge import ParquetMergeTarget, merge_accumulate


class ContinuousAggregate:
    """Persisted rollup of ``agg(events)`` by (time bucket, *keys).

    Aggregates are the associative set merge_accumulate supports —
    n_events (count-as-sum), exact-decimal value sum, min/max — so
    incremental folds equal the batch recompute at any chunking.
    """

    def __init__(
        self,
        path: str,
        ts_col: str = "ts",
        bucket: str = "hour",
        keys: Sequence[str] = ("event_type",),
        value_col: str = "value",
    ):
        self.target = ParquetMergeTarget(path)
        self.ts_col, self.bucket, self.keys, self.value_col = (
            ts_col,
            bucket,
            tuple(keys),
            value_col,
        )

    # -- batch-side partial ------------------------------------------------
    def partial(self, batch: DataFrame) -> DataFrame:
        """One row per (bucket, *keys): the map-side-combined partial."""
        v = F.col(self.value_col)
        return (
            batch.withColumn(
                "bucket_ts", F.date_trunc(self.bucket, F.col(self.ts_col))
            )
            .groupBy("bucket_ts", *self.keys)
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                # exact decimal accumulator kept IN STATE (not cast back to
                # double) so repeated folds stay order-insensitive
                F.sum(v.cast(DEC)).cast(DEC).alias("sum_value"),
                F.min(v).alias("min_value"),
                F.max(v).alias("max_value"),
            )
        )

    # -- refresh -----------------------------------------------------------
    def refresh(
        self, spark: SparkSession, batch: DataFrame, watermark: int | None = None
    ) -> DataFrame:
        """Fold a batch into the stored rollup, touching only its buckets."""
        part = self.partial(batch)

        def fold(target: DataFrame | None, upd: DataFrame) -> DataFrame:
            if target is None:
                return upd
            touched_keys = upd.select("bucket_ts").distinct()
            untouched = target.join(
                F.broadcast(touched_keys), ["bucket_ts"], "left_anti"
            )
            touched = target.join(
                F.broadcast(touched_keys), ["bucket_ts"], "left_semi"
            )
            refolded = merge_accumulate(
                touched,
                upd,
                keys=("bucket_ts", *self.keys),
                sum_cols=("n_events", "sum_value"),
                min_cols=("min_value",),
                max_cols=("max_value",),
            )
            # pin the decimal accumulator's type: Spark widens SUM(DECIMAL)
            # precision per fold (25,6 -> 35,6 -> 38,6), which would drift
            # the stored schema version to version
            refolded = refolded.withColumn(
                "sum_value", F.col("sum_value").cast(DEC)
            )
            return untouched.unionByName(refolded)

        return self.target.merge_with(spark, part, fold, watermark=watermark)

    def read(self, spark: SparkSession) -> DataFrame:
        return self.target.read(spark)
