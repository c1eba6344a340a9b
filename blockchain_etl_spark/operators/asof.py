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
    how: str = "left",
    fill_tail: bool = True,
) -> DataFrame:
    """As-of join for a *discrete* ordered key (DateType here): densify the
    right series into one row per key value between each observation and
    the next (forward fill via explode(sequence(...))), then plain
    broadcast equi-join.

    O(|right| × gap) densified rows — for a dim-sized series (oracle
    prices: ~10^4 rows) this stays broadcast-sized, and the 100 TB left
    side gets a BroadcastHashJoin probe instead of a nested-loop scan:
    each fact row costs O(1) instead of O(|right|).

    ``fill_tail``: left rows PAST the last observation take the last
    observation's values (the reference's last-observation-carried-forward
    contract). Implemented lazily from the right series alone — a 1-row
    max(struct) reduction broadcast as a fallback — so building the plan
    never runs a job and never scans the fact side (the previous design
    took an ``end`` bound the callers computed with an eager ``.first()``
    over the fact table: a whole extra scan before the job even started).
    """
    w = Window.orderBy(right_on)
    fill_to = F.coalesce(F.date_sub(F.lead(right_on).over(w), 1), F.col(right_on))
    dense = (
        right.withColumn("__end", F.greatest(fill_to, F.col(right_on)))
        .withColumn(left_on, F.explode(F.sequence(F.col(right_on), F.col("__end"))))
        .drop("__end", right_on)
    )
    joined = left.join(broadcast(dense), [left_on], how)
    if not fill_tail:
        return joined
    value_cols = [c for c in right.columns if c != right_on]
    # 1-row "last observation" reduction: max(struct(key, values)) orders by
    # the key (unique by contract), so the values ride along.
    last = right.agg(F.max(F.struct(right_on, *value_cols)).alias("__l")).select(
        F.col(f"__l.{right_on}").alias("__last_key"),
        *[F.col(f"__l.{c}").alias(f"__last_{c}") for c in value_cols],
    )
    joined = joined.crossJoin(broadcast(last))
    for c in value_cols:
        joined = joined.withColumn(
            c,
            F.coalesce(
                F.col(c),
                F.when(F.col(left_on) >= F.col("__last_key"), F.col(f"__last_{c}")),
            ),
        )
    return joined.drop("__last_key", *[f"__last_{c}" for c in value_cols])
