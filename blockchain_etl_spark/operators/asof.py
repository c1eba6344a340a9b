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
    """
    nxt = F.lead(right_on).over(Window.orderBy(right_on))
    intervals = right.withColumn("__next", nxt)
    cond = (F.col(left_on) >= F.col(right_on)) & (
        F.col("__next").isNull() | (F.col(left_on) < F.col("__next"))
    )
    return left.join(broadcast(intervals), cond, how).drop("__next")
