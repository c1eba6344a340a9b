"""Incremental codebook maintenance — mergeable k-means sufficient stats.

`plans/similarity.ivf_kmeans_codebook` trains a codebook with full Lloyd
passes over the corpus; at 100 TB you cannot re-scan history every time new
vectors land. This operator keeps the codebook fresh incrementally, the
same mergeable-state pattern as the engine's running counters and HLL
rollups (operators/merge.py, operators/rollup.py):

- The **quantizer** (cell definition) is frozen at init — assignments are
  always against it, so per-batch contributions are independent and the
  fold is associative/commutative.
- The **state** is the k-means sufficient statistic per (cell, dim):
  member count and coordinate sum on the 1e6 fixed-point grid — two int64
  per cell-dim, O(k·d) regardless of corpus size.
- `update(batch)` assigns the batch against the broadcast quantizer
  (map-side, no shuffle of history), aggregates batch partials, and folds
  them into the stored state through ParquetMergeTarget's watermark-guarded
  write-audit-publish versioning (replayed batches are no-ops).
- `centroids()` = sum div count — the refreshed codebook, integer-exact,
  identical whether the corpus arrived in 1 batch or 1000 (property-tested
  in tests/test_kmeans_state.py). Feed it back to ivf_kmeans_codebook /
  IVFIndex when drift warrants a re-partition.

Reference analogue: the running-stat inventories the follower maintains per
block instead of recomputing from genesis (src/be_db_stats.erl counters).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast, col

from .merge import ParquetMergeTarget

_FP = 1_000_000  # fixed-point grid shared with plans/similarity


def to_grid(vectors: DataFrame, emb: str = "embedding") -> DataFrame:
    """(…, embedding float[]) → (…, vf bigint[]) on the fixed-point grid."""
    return vectors.withColumn(
        "vf",
        F.expr(
            f"transform({emb}, x -> CAST(round(CAST(x AS DOUBLE) * {_FP}) AS BIGINT))"
        ),
    )


def assign_cells(batch: DataFrame, quantizer: DataFrame) -> DataFrame:
    """(vec_id, vf) × broadcast (cell, cvec) → (vec_id, vf, cell): nearest
    cell by int64 squared-L2; min-struct tie-break on the smallest cell."""
    d2 = F.expr(
        "aggregate(zip_with(vf, cvec, (x, y) -> (x - y) * (x - y)),"
        " 0L, (acc, p) -> acc + p)"
    )
    best = (
        batch.crossJoin(broadcast(quantizer))
        .select("vec_id", "cell", d2.alias("d2"))
        .groupBy("vec_id")
        .agg(F.min(F.struct("d2", "cell")).alias("w"))
        .select("vec_id", col("w.cell").alias("cell"))
    )
    return batch.join(best, ["vec_id"])


class CodebookState:
    """Layout: ``<path>/quantizer`` (cell, cvec bigint[]) — frozen;
    ``<path>/state`` — a ParquetMergeTarget of (cell, dim, n, s) rows."""

    def __init__(self, path: str):
        import os

        self.path = path
        self._quantizer_path = os.path.join(path, "quantizer")
        self._state = ParquetMergeTarget(os.path.join(path, "state"))

    def init(self, spark: SparkSession, quantizer: DataFrame) -> None:
        """``quantizer``: (cell, cvec array<bigint>) — e.g. the output of a
        Lloyd run (ivf_kmeans_codebook) pivoted to arrays, or IVFIndex's
        md5-sampled seeds on the grid."""
        quantizer.coalesce(1).write.mode("overwrite").parquet(self._quantizer_path)

    def quantizer(self, spark: SparkSession) -> DataFrame:
        return spark.read.parquet(self._quantizer_path)

    def update(
        self, spark: SparkSession, vectors: DataFrame, watermark: int | None = None
    ) -> DataFrame:
        """Fold one batch of (vec_id, embedding) into the state. Returns the
        merged (cell, dim, n, s) frame. ``watermark`` (monotone batch id)
        makes replays no-ops — exactly-once under crash-replay ingest."""
        batch = to_grid(vectors.select("vec_id", "embedding")).select("vec_id", "vf")
        assigned = assign_cells(batch, self.quantizer(spark))
        partials = (
            assigned.select("cell", F.posexplode("vf").alias("dim", "v"))
            .groupBy("cell", "dim")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("v").alias("s"),
            )
        )
        return self._state.merge_with(
            spark,
            partials,
            lambda target, upd: (
                upd
                if target is None
                else target.unionByName(upd)
                .groupBy("cell", "dim")
                .agg(F.sum("n").cast("long").alias("n"), F.sum("s").cast("long").alias("s"))
            ),
            watermark=watermark,
        )

    def centroids(self, spark: SparkSession) -> DataFrame:
        """(cell, dim, centroid_fp, n_members): running means on the grid —
        integer-exact, batch-order-independent. Every frozen-quantizer cell
        is always present: a cell with no accumulated members keeps its
        frozen centroid with n_members=0 (matching ivf_kmeans_codebook's
        COALESCE-with-previous rule), so k never silently shrinks and
        refreshed_quantizer() stays a true drop-in replacement codebook."""
        frozen = (
            self.quantizer(spark)
            .select("cell", F.posexplode("cvec").alias("dim", "frozen_fp"))
            .withColumn("dim", col("dim").cast("long"))
        )
        state = self._state.read(spark)
        if state is None:
            return frozen.select(
                "cell",
                "dim",
                col("frozen_fp").alias("centroid_fp"),
                F.lit(0).cast("long").alias("n_members"),
            )
        merged = frozen.join(
            state.select("cell", col("dim").cast("long").alias("dim"), "n", "s"),
            ["cell", "dim"],
            "left",
        )
        return merged.select(
            "cell",
            "dim",
            F.when(col("n").isNotNull(), F.expr("s div n"))
            .otherwise(col("frozen_fp"))
            .alias("centroid_fp"),
            F.coalesce(col("n"), F.lit(0)).cast("long").alias("n_members"),
        )

    def refreshed_quantizer(self, spark: SparkSession) -> DataFrame:
        """(cell, cvec): running means folded back to array form — the
        drop-in replacement codebook for the next retrain/re-partition."""
        return (
            self.centroids(spark)
            .groupBy("cell")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("dim", "centroid_fp"))),
                    lambda x: x["centroid_fp"],
                ).alias("cvec")
            )
        )
