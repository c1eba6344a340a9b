"""Lake layout writers — the physical design for 100 TB (SURVEY §4: the
reference's index strategy → partitioning + clustering in a lakehouse).

- **History tables** (blocks, transactions, rewards, dc_burns …) are
  append-only and time/height-correlated: partition by a derived
  height-bucket (or date) column so range predicates prune directories —
  the lake equivalent of the reference's BRIN index on rewards.time
  (migrations/1612220889-reward_brin_idx.sql:5).
- **Join-heavy tables** are bucketed by their join key: two tables bucketed
  the same way join with ZERO exchange on either side — the lake equivalent
  of the reference's btree FK indexes, and the difference between an
  O(data) shuffle and none at 100 TB.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def height_bucket(block: Column, blocks_per_bucket: int = 100_000) -> Column:
    """Derived partition column: height div N. At one block/min, 100k blocks
    ≈ 70 days per partition directory — large enough to avoid small files,
    small enough that height-range queries prune most of the table."""
    return (block / blocks_per_bucket).cast("long")


def write_history(
    df: DataFrame,
    path: str,
    block_col: str = "block",
    blocks_per_bucket: int = 100_000,
) -> None:
    """Append-only history write partitioned by height bucket. Readers use
    ``spark.read.parquet(path)`` and filter on ``height_bucket``/``block``;
    partition pruning keeps height-range scans proportional to the range."""
    (
        df.withColumn("height_bucket", height_bucket(F.col(block_col), blocks_per_bucket))
        .write.mode("append")
        .partitionBy("height_bucket")
        .parquet(path)
    )


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_keys: Sequence[str],
    num_buckets: int = 64,
    sort_keys: Sequence[str] | None = None,
) -> None:
    """Bucketed managed table: co-locates rows by hash(bucket_keys) at write
    time so equi-joins and aggregations on those keys need no exchange.
    ``sort_keys`` additionally sorts within buckets (sort-merge joins skip
    their sort)."""
    w = df.write.mode("overwrite").bucketBy(num_buckets, *bucket_keys)
    if sort_keys:
        w = w.sortBy(*sort_keys)
    w.format("parquet").saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def morton_key(cols: Sequence[Column], bits: int = 21) -> Column:
    """Z-order (Morton) interleave of up to 3 non-negative integer columns
    into one sort key — pure column bit math (whole-stage codegen).

    Each input is clamped to ``bits`` low bits; bit j of input i lands at
    output bit ``j * n_cols + i``. Rows close in every dimension get close
    keys, so range-sorting by the key clusters multi-dimensional locality
    into the same parquet row groups — min/max stats then prune scans on
    ANY of the interleaved columns, the open-format stand-in for Delta
    Z-ORDER (and the multi-column answer where single-column sort only
    helps one predicate).

    Caveat: the interleave only balances locality when the inputs span
    COMPARABLE bit widths — a 17-bit money column interleaved with a
    7-bit id column puts every high key bit on the money side, so file
    splits ride money alone and id probes prune nothing. Bucket wide
    columns down to the narrow column's scale first (``cents div 512``),
    the same normalization Delta's Z-ORDER applies via range-ids.
    """
    n = len(cols)
    out = F.lit(0).cast("long")
    for i, c in enumerate(cols):
        v = c.cast("long").bitwiseAND(F.lit((1 << bits) - 1))
        for j in range(bits):
            bit = F.shiftright(v, j).bitwiseAND(F.lit(1))
            out = out.bitwiseOR(F.shiftleft(bit, j * n + i))
    return out


def write_zordered(
    df: DataFrame,
    path: str,
    zorder_cols: Sequence[str],
    num_files: int = 32,
    bits: int = 21,
    manifest: bool = True,
) -> None:
    """Cluster-and-write: range-partition by the Morton key and sort within
    partitions, so every output file covers a tight hyper-rectangle of the
    zorder columns and parquet row-group min/max stats prune reads.

    With ``manifest=True`` (default) the zone-map manifest
    (sources/manifest.py) is refreshed for the zorder columns right after
    the write — the pairing that makes the clustering pay at planning
    time: Z-order gives every file a tight range on EACH interleaved
    column, and the manifest lets a range probe on ANY of them prune
    files without opening a single footer."""
    key = morton_key([F.col(c) for c in zorder_cols], bits=bits)
    (
        df.withColumn("__z", key)
        .repartitionByRange(num_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )
    if manifest:
        from .manifest import update_manifest

        update_manifest(path, list(zorder_cols))
