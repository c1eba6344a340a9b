"""Latest-state ("inventory") operators.

The reference's signature pattern: append-only history tables plus
trigger-maintained current-state inventory tables with first_block /
last_block bookkeeping (SURVEY §2 W1/J9/J3/A5; reference
migrations/1590689602-gateway_inventory.sql:32-62,
migrations/1577040141-create-account.sql:22-27,
migrations/1586706609-ledger_first_block.sql:7-21).

Batch form here: window dedup for "latest row per key" and a combined
first/last/count rollup. The incremental form is a MERGE inside
``streaming.ingest``. At scale the batch form is one shuffle on the entity
key; the window functions below all share one ``partitionBy(key)`` so Spark
computes them in a single exchange + sort, not one shuffle each.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def latest_rows(
    df: DataFrame,
    keys: Sequence[str],
    order: Sequence[Column],
) -> DataFrame:
    """Latest row per key: row_number()==1 over a total order.

    ``order`` must be a total order within each key group (include a unique
    tie-break column) so the selected rows are deterministic.
    """
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def latest_rows_agg(
    df: DataFrame,
    keys: Sequence[str],
    order_cols: Sequence[str],
    payload_cols: Sequence[str],
) -> DataFrame:
    """Sort-free latest-row-per-key for FACT-scale inputs: a
    ``max(struct(order..., payload...))`` hash aggregate.

    Struct comparison is lexicographic by field order, so with
    ``order_cols`` forming a total order (unique tie-break included) the
    max picks exactly the row ``latest_rows`` would — but as a hash
    aggregate with map-side partial combine: only one candidate row per
    key per partition crosses the shuffle, and nothing is sorted. Use
    this when the input is the 100 TB side; ``latest_rows`` (window) only
    when rank numbers are genuinely needed. The payload rides in the
    struct and never influences the pick (order_cols tie-break first).
    """
    s = F.struct(*[F.col(c) for c in [*order_cols, *payload_cols]])
    return df.groupBy(*keys).agg(F.max(s).alias("__l")).select(
        *keys,
        *[F.col(f"__l.{c}").alias(c) for c in [*order_cols, *payload_cols]],
    )


def inventory(
    history: DataFrame,
    keys: Sequence[str],
    order: Sequence[Column],
    bookkeeping: dict[str, Column],
) -> DataFrame:
    """History → inventory: latest row per key + per-key bookkeeping columns.

    ``bookkeeping`` maps output column name → an aggregate Column evaluated
    over the whole key group (e.g. ``{"first_order_date": F.min("o_orderdate"),
    "order_count": F.count(F.lit(1))}``). Implemented as unbounded window
    aggregates sharing the dedup window's partitioning: one shuffle total,
    versus two for the reference's J3 groupBy-then-self-join shape.
    """
    w = Window.partitionBy(*keys).orderBy(*order)
    wall = Window.partitionBy(*keys)
    out = history.withColumn("__rn", F.row_number().over(w))
    for name, col in bookkeeping.items():
        out = out.withColumn(name, col.over(wall))
    return out.filter(F.col("__rn") == 1).drop("__rn")
