"""As-of join plans — SURVEY §2 J7 (oracle price at height).

Price series analog: 'purchase' events form a sparse daily (date, price)
series (FIXTURES.md §B: "as-of join against a derived sparse price series
from events"); every click event is priced at the most recent price at or
before its day — exactly the reference's
`WHERE p.block <= $1 ORDER BY p.block DESC LIMIT 1`
(/root/reference/src/be_db_backfill.erl:288-299).

Plan shape: the dim-sized price series (oracle_prices is ~10^4 rows on
mainnet) is densified into one row per day (forward fill) and broadcast —
the fact side gets a BroadcastHashJoin probe, never shuffles, never runs a
nested-loop interval scan. See operators.asof.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import col

from ..functions.numeric import dsum, dsum_expr
from ..functions.timeutil import epoch_us, epoch_us_expr
from ..operators.asof import asof_join_dense
from ..sources.testdata import load_table
from .registry import register

# One price per day: the value of the max-event_id purchase that day
# (unique right keys for the as-of join, deterministic pick within a day).
_PRICE_SERIES_SQL = """
      SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS price_date,
             ARG_MAX(value, event_id) AS price
      FROM events WHERE event_type = 'purchase'
      GROUP BY CAST(CAST(ts AS TIMESTAMP) AS DATE)
"""


def _price_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return (
        events.filter(col("event_type") == "purchase")
        .groupBy(col("ts").cast("date").alias("price_date"))
        .agg(F.max_by("value", "event_id").alias("price"))
    )


@register(
    "events_asof_price",
    sql=f"""
    WITH prices AS ({_PRICE_SERIES_SQL})
    SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, p.price AS asof_price
    FROM events
    LEFT JOIN LATERAL (
      SELECT price FROM prices
      WHERE price_date <= CAST(CAST(ts AS TIMESTAMP) AS DATE)
      ORDER BY price_date DESC LIMIT 1
    ) p ON TRUE
    WHERE event_type = 'click'
    """,
    survey_ops=("J7", "W5"),
    doc="As-of (backward) join: latest price row at or before each fact row "
    "(src/be_db_backfill.erl:288-299). Spark plan: daily forward-filled "
    "price spine, broadcast hash join — the fact side never shuffles.",
)
def events_asof_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    clicks = events.filter(col("event_type") == "click").select(
        "event_id", "ts", col("ts").cast("date").alias("e_date")
    )
    prices = _price_series(spark, sf_dir)
    joined = asof_join_dense(clicks, prices, left_on="e_date", right_on="price_date")
    return joined.select("event_id", "ts", col("price").alias("asof_price"))


@register(
    "event_burn_valuation",
    sql=f"""
    WITH prices AS ({_PRICE_SERIES_SQL})
    SELECT burn_month,
           {dsum_expr('value * price')} AS burned_value,
           COUNT(*) AS burn_count
    FROM (
      SELECT CAST(DATE_TRUNC('month', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS burn_month,
             value, p.price
      FROM events
      LEFT JOIN LATERAL (
        SELECT price FROM prices
        WHERE price_date <= CAST(CAST(ts AS TIMESTAMP) AS DATE)
        ORDER BY price_date DESC LIMIT 1
      ) p ON TRUE
      WHERE event_type = 'error'
    ) t
    WHERE price IS NOT NULL
    GROUP BY burn_month
    """,
    survey_ops=("J7", "P6", "A6"),
    doc="dc_burns derivation: per-row burn extraction (skip non-qualifying "
    "rows, src/be_db_dc_burn.erl:74-125) valued at the as-of oracle price "
    "(src/be_db_backfill.erl:282-332), rolled up by month.",
)
def event_burn_valuation(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    burns = events.filter(col("event_type") == "error").select(
        "value", "ts", col("ts").cast("date").alias("e_date")
    )
    prices = _price_series(spark, sf_dir)
    joined = asof_join_dense(burns, prices, left_on="e_date", right_on="price_date")
    return (
        joined.filter(col("price").isNotNull())
        .withColumn("burn_month", F.date_trunc("month", col("ts")))
        .groupBy("burn_month")
        .agg(
            dsum(col("value") * col("price"), "burned_value"),
            F.count(F.lit(1)).alias("burn_count"),
        )
    )


# --------------------------------------------------------------------------
# Keyless range (interval) join — the custom-operator class Spark lacks a
# shuffle strategy for: joining a fact stream against time INTERVALS with
# no equi key degenerates to BroadcastNestedLoopJoin, which dies once the
# interval side outgrows a broadcast. The scale-safe plan is interval
# bucketing: align both sides to fixed-width time buckets (an interval
# explodes to every bucket it overlaps, an event to exactly one), equi-join
# on the bucket, then apply the range predicate as a post-filter. Shuffle
# key = bucket — bounded fan-out, no nested loop, works at any interval
# count. DuckDB's oracle uses its native IEJoin for the same semantics.
# --------------------------------------------------------------------------
_INCIDENT_VALUE_MIN = 19.0
_INCIDENT_WINDOW_US = 600_000_000  # 10 minutes


@register(
    "incident_window_events",
    sql=f"""
    WITH inc AS (
      SELECT event_id AS incident_id,
             CAST(ts AS TIMESTAMP) AS t0,
             CAST(ts AS TIMESTAMP) + INTERVAL 10 MINUTE AS t1
      FROM events
      WHERE event_type = 'error' AND value >= {_INCIDENT_VALUE_MIN})
    SELECT i.incident_id,
           COUNT(*) AS n_events,
           COUNT(DISTINCT e.user_id) AS n_users,
           {dsum_expr('e.value')} AS total_value
    FROM inc i
    JOIN events e
      ON CAST(e.ts AS TIMESTAMP) >= i.t0 AND CAST(e.ts AS TIMESTAMP) <= i.t1
    GROUP BY i.incident_id
    """,
    survey_ops=("J7",),
    doc="Keyless range join via interval bucketing: severe error events "
    "open a 10-minute incident window; every event inside any window is "
    "attributed to it (events under overlapping windows count once per "
    "window). Intervals explode to the 10-minute buckets they overlap "
    "(=2 each), events map to exactly ONE bucket — so the bucket equi-join "
    "emits each qualifying (incident, event) pair exactly once and no "
    "dedup pass is needed. Shuffle on the bucket key only; the oracle "
    "runs DuckDB's native IEJoin over the identical predicate.",
)
def incident_window_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    w = F.lit(_INCIDENT_WINDOW_US)
    inc = (
        events.filter(
            (col("event_type") == "error") & (col("value") >= _INCIDENT_VALUE_MIN)
        )
        .select(
            col("event_id").alias("incident_id"),
            epoch_us("ts").alias("t0_us"),
            (epoch_us("ts") + w).alias("t1_us"),
        )
        .withColumn(
            "bucket",
            F.explode(F.sequence(F.expr("t0_us div 600000000"), F.expr("t1_us div 600000000"))),
        )
    )
    ev = events.select(
        "user_id",
        "value",
        epoch_us("ts").alias("e_us"),
        # integer div, not float division-and-truncate: a double quotient
        # one ulp above an exact boundary would misassign the bucket
        F.expr(f"({epoch_us_expr('ts')}) div 600000000").alias("bucket"),
    )
    return (
        inc.join(ev, ["bucket"])
        .filter((col("e_us") >= col("t0_us")) & (col("e_us") <= col("t1_us")))
        .groupBy("incident_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count_distinct("user_id").alias("n_users"),
            dsum("value", "total_value"),
        )
    )
