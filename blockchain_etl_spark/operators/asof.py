"""As-of (backward) join — SURVEY §2 J7.

Reference semantics: "oracle price at height H" = the price row with the
greatest block <= H (/root/reference/src/be_db_backfill.erl:288-299; the
streaming form keeps the last seen price in state,
src/be_db_oracle_price.erl:85-99).

Spark-first implementation for the dim-sized right side (oracle_prices is
~10^4 rows on mainnet): turn the price series into half-open validity
intervals [ts, next_ts) with one small window pass, then BROADCAST interval
join — every fact row matches at most one interval, there is no shuffle of
the big side, and the plan scales linearly with the fact table. This is the
standard OSS-Spark as-of shape; a sort-merge union+last() variant would
force a global sort of the 100 TB side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    how: str = "left",
) -> DataFrame:
    """For each left row, attach the right row with the greatest
    ``right_on`` <= ``left_on``. ``right`` must be unique on ``right_on``
    (pre-aggregate if not) and small enough to broadcast.

    General form: broadcast interval join (nested-loop against the
    broadcast side). Each left row matches at most one interval. Prefer
    :func:`asof_join_dense` when the as-of key is discrete (dates/heights)
    — it turns the nested loop into a broadcast *hash* join.
    """
    nxt = F.lead(right_on).over(Window.orderBy(right_on))
    intervals = right.withColumn("__next", nxt)
    cond = (F.col(left_on) >= F.col(right_on)) & (
        F.col("__next").isNull() | (F.col(left_on) < F.col("__next"))
    )
    return left.join(broadcast(intervals), cond, how).drop("__next")


def asof_join_dense(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    end: "F.Column | None" = None,
    how: str = "left",
) -> DataFrame:
    """As-of join for a *discrete* ordered key (DateType here): densify the
    right series into one row per key value between each observation and
    the next (forward fill via explode(sequence(...))), then plain
    broadcast equi-join.

    O(|right| × gap) densified rows — for a dim-sized series (oracle
    prices: ~10^4 rows) this stays broadcast-sized, and the 100 TB left
    side gets a BroadcastHashJoin probe instead of a nested-loop scan:
    each fact row costs O(1) instead of O(|right|).

    ``end``: last key value to fill forward to (e.g. ``lit(max(left_on))``);
    defaults to the last observation (no forward fill past it).
    """
    w = Window.orderBy(right_on)
    fill_to = F.date_sub(F.lead(right_on).over(w), 1)
    if end is not None:
        fill_to = F.coalesce(fill_to, end.cast("date"))
    else:
        fill_to = F.coalesce(fill_to, F.col(right_on))
    dense = (
        right.withColumn("__end", F.greatest(fill_to, F.col(right_on)))
        .withColumn(left_on, F.explode(F.sequence(F.col(right_on), F.col("__end"))))
        .drop("__end", right_on)
    )
    return left.join(broadcast(dense), [left_on], how)
