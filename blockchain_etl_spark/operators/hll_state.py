"""Incrementally-maintained portable-HLL distinct counts — the streaming/
incremental twin of the registered ``events_hll_portable_rollup`` query
(plans/olap.py), exploiting the property that makes sketches THE answer to
distinct counts at 100 TB: the state is a fixed-size vector of per-bucket
maxima, and sketch union is elementwise MAX — associative, commutative,
idempotent — so folding per-batch partials into a stored state equals the
batch sketch over all data seen so far, at ANY chunking and under replays.
(Exact distinct counts have no such bounded mergeable state: every refresh
re-shuffles all (key, user) pairs.)

Because the repo's HLL spec is deterministic (md5 buckets, integer rho,
precomputed linear-counting table — no engine-native sketch blobs), the
incremental estimate is not just within-error-of but BIT-IDENTICAL to the
batch query, and the tests assert exactly that (stream ≡ batch, the same
contract every streaming operator here carries).

State size: ≤ m=256 rows per group key — a 100 TB event stream with 10k
event types holds a 2.56M-row state table, trivially mergeable per batch.
Persistence is a watermark-guarded ParquetMergeTarget, so crashed/replayed
batches fold exactly once.
"""

from __future__ import annotations

import os
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import col

from .merge import ParquetMergeTarget, merge_accumulate


class PortableHLLState:
    """Persisted (keys..., bucket) -> max-rho state with an estimate read.

    ``id_col``: the column whose distinct count is estimated.
    """

    def __init__(self, path: str, keys: Sequence[str], id_col: str):
        self.target = ParquetMergeTarget(path)
        self.keys = list(keys)
        self.id_col = id_col

    def _partial(self, batch: DataFrame) -> DataFrame:
        """Per-batch sketch partial: (keys, bucket) -> max zeros — the
        SHARED spec implementation (functions/hll.py), so state folds and
        the registered batch query cannot drift apart."""
        from ..functions.hll import partial

        return partial(batch, self.keys, self.id_col)

    def fold(
        self, spark: SparkSession, batch: DataFrame, watermark: int | None = None
    ) -> None:
        """Union one batch's sketch into the state (elementwise MAX merge,
        state-row-grain — never re-reads raw history)."""
        partial = self._partial(batch)
        self.target.merge_with(
            spark,
            partial,
            lambda tgt, upd: merge_accumulate(
                tgt, upd, keys=[*self.keys, "bucket"], max_cols=["mz"]
            ),
            watermark=watermark,
        )

    def estimate(self, spark: SparkSession) -> DataFrame | None:
        """(keys..., n_buckets, est_users) — identical arithmetic to the
        registered batch query (LogLog in exact DECIMAL, table-driven
        linear counting below m occupied buckets)."""
        from ..functions.hll import SUM_PRESENT_SQL, estimate_expr

        t = self.target.read(spark)
        if t is None:
            return None
        s = t.groupBy(*self.keys).agg(
            F.count(F.lit(1)).alias("n_buckets"),
            F.sum(F.expr(SUM_PRESENT_SQL)).cast("decimal(38,0)").alias("sum_present"),
        )
        return s.select(
            *self.keys,
            col("n_buckets").cast("long").alias("n_buckets"),
            estimate_expr("est_users"),
        )

    # -- streaming wrapper --------------------------------------------------
    def run_stream(
        self,
        spark: SparkSession,
        src_dir: str,
        schema,
        checkpoint_dir: str,
    ) -> None:
        """availableNow file stream → foldable sketch state; batch_id is
        the replay watermark (same contract as BlockIngest)."""

        def fold(batch: DataFrame, batch_id: int) -> None:
            self.fold(spark, batch, watermark=batch_id)

        q = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src_dir)
            .writeStream.foreachBatch(fold)
            .option("checkpointLocation", os.path.join(checkpoint_dir, "hll"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
