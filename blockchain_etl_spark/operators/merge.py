"""Incremental upsert (MERGE) emulation over parquet — SURVEY §2 J9/S2.

The reference maintains inventory tables with AFTER INSERT triggers doing
``INSERT ... ON CONFLICT (key) DO UPDATE SET col = COALESCE(EXCLUDED.col,
existing.col), last_block = EXCLUDED.last_block``
(migrations/1590689602-gateway_inventory.sql:32-62;
migrations/1610634227-reward_scale.sql:28 for the COALESCE partial-update).
Without Delta in this container, MERGE is emulated as: read current target,
union with updates, reduce per key. The reduce applies the same semantics:

- latest update wins for regular columns,
- NULL update values fall back to the previous value (COALESCE partial
  update),
- ``first_block`` keeps the minimum, ``last_block`` the maximum.

Scale notes: the union+reduce is one shuffle on the key — identical cost to
a Delta MERGE's join. Targets are written to a versioned directory and the
pointer flipped last, so a crashed merge never corrupts the current table
(write-audit-publish). On a real cluster this module is swapped for
``DeltaTable.merge`` with the same column semantics; the call sites don't
change.
"""

from __future__ import annotations

import json
import os
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import col


def merge_latest(
    target: DataFrame | None,
    updates: DataFrame,
    keys: Sequence[str],
    order: Sequence[str],
    coalesce_cols: Sequence[str] = (),
    first_col: str | None = None,
    last_col: str | None = None,
) -> DataFrame:
    """MERGE semantics as a dataframe transform.

    ``order``: columns forming a total order among updates of one key
    (e.g. ("block",)); target rows sort before all updates.
    ``coalesce_cols``: columns where a NULL update keeps the prior value.
    ``first_col``/``last_col``: bookkeeping min/max over the order column.
    """
    ordc = list(order)
    upd = updates.withColumn("__src", F.lit(1))
    if target is not None:
        src = target.withColumn("__src", F.lit(0)).unionByName(
            upd, allowMissingColumns=True
        )
    else:
        src = upd
    # updates win ties against an existing target row (replay determinism)
    asc = [col(c).asc() for c in ordc] + [col("__src").asc()]
    desc = [col(c).desc() for c in ordc] + [col("__src").desc()]
    w_asc = Window.partitionBy(*keys).orderBy(*asc)
    wall = Window.partitionBy(*keys)
    out = src.withColumn(
        "__rn", F.row_number().over(Window.partitionBy(*keys).orderBy(*desc))
    )
    for c in coalesce_cols:
        # last non-null value in order — COALESCE(EXCLUDED.c, existing.c)
        # applied transitively over the update sequence.
        out = out.withColumn(
            c,
            F.last(col(c), ignorenulls=True).over(
                w_asc.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
    if first_col:
        # a prior merge's first_col survives: min over both the stored
        # bookkeeping value and the incoming order values.
        prior = (
            F.coalesce(col(first_col), col(ordc[0]))
            if first_col in src.columns
            else col(ordc[0])
        )
        out = out.withColumn(first_col, F.min(prior).over(wall))
    if last_col:
        prior = (
            F.coalesce(col(last_col), col(ordc[0]))
            if last_col in src.columns
            else col(ordc[0])
        )
        out = out.withColumn(last_col, F.max(prior).over(wall))
    return out.filter(col("__rn") == 1).drop("__rn", "__src")


class ParquetMergeTarget:
    """A parquet-backed MERGE target with write-audit-publish versioning.

    Layout: ``<path>/v=<n>/`` data directories plus ``<path>/_current.json``
    holding the live version — readers always see a complete table, and a
    replayed merge simply writes the next version (idempotent at the
    pipeline level because merge_latest is deterministic).
    """

    def __init__(self, path: str):
        self.path = path

    @property
    def _pointer(self) -> str:
        return os.path.join(self.path, "_current.json")

    def current_version(self) -> int:
        try:
            with open(self._pointer) as f:
                return int(json.load(f)["version"])
        except (OSError, ValueError):
            return 0

    def read(self, spark: SparkSession) -> DataFrame | None:
        v = self.current_version()
        if v == 0:
            return None
        return spark.read.parquet(os.path.join(self.path, f"v={v}"))

    def merge(
        self,
        spark: SparkSession,
        updates: DataFrame,
        keys: Sequence[str],
        order: Sequence[str],
        coalesce_cols: Sequence[str] = (),
        first_col: str | None = None,
        last_col: str | None = None,
    ) -> DataFrame:
        target = self.read(spark)
        merged = merge_latest(
            target, updates, keys, order, coalesce_cols, first_col, last_col
        )
        next_v = self.current_version() + 1
        merged.write.mode("overwrite").parquet(
            os.path.join(self.path, f"v={next_v}")
        )
        os.makedirs(self.path, exist_ok=True)
        tmp = self._pointer + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"version": next_v}, f)
        os.replace(tmp, self._pointer)  # publish: atomic pointer flip
        return self.read(spark)
