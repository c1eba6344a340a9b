"""As-of join plans — SURVEY §2 J7 (oracle price at height).

Price series analog: 'purchase' events form a sparse (ts, price) series
(FIXTURES.md §B: "as-of join of orders against a derived sparse price series
from events"); each order is priced at the most recent price at or before
its order date — exactly the reference's
`WHERE p.block <= $1 ORDER BY p.block DESC LIMIT 1`
(/root/reference/src/be_db_backfill.erl:288-299).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import col

from ..functions.numeric import dsum, dsum_expr
from ..operators.asof import asof_join
from ..sources.testdata import load_table
from .registry import register

# One price per day: max-event_id purchase value that day (unique right keys
# for the as-of join, deterministic pick among same-day events).
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
    "orders_asof_price",
    sql=f"""
    WITH prices AS ({_PRICE_SERIES_SQL})
    SELECT o_orderkey, o_orderdate, p.price AS asof_price
    FROM orders
    LEFT JOIN LATERAL (
      SELECT price FROM prices
      WHERE price_date <= CAST(o_orderdate AS DATE)
      ORDER BY price_date DESC LIMIT 1
    ) p ON TRUE
    """,
    survey_ops=("J7", "W5"),
    doc="As-of (backward) join: latest price row with ts <= fact ts "
    "(src/be_db_backfill.erl:288-299). Spark plan: price series → validity "
    "intervals via lead() (tiny window), then broadcast interval join — the "
    "100 TB fact side never shuffles.",
)
def orders_asof_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", col("o_orderdate").cast("date").alias("o_date")
    )
    prices = _price_series(spark, sf_dir)
    joined = asof_join(orders, prices, left_on="o_date", right_on="price_date")
    return joined.select(
        "o_orderkey", "o_orderdate", col("price").alias("asof_price")
    )


@register(
    "dc_burn_valuation",
    sql=f"""
    WITH prices AS ({_PRICE_SERIES_SQL})
    SELECT burn_month,
           {dsum_expr('o_totalprice * price')} AS burned_value,
           COUNT(*) AS burn_count
    FROM (
      SELECT CAST(DATE_TRUNC('month', o_orderdate) AS TIMESTAMP) AS burn_month, o_totalprice, p.price
      FROM orders
      LEFT JOIN LATERAL (
        SELECT price FROM prices
        WHERE price_date <= CAST(o_orderdate AS DATE)
        ORDER BY price_date DESC LIMIT 1
      ) p ON TRUE
      WHERE o_orderstatus = 'F'
    ) t
    WHERE price IS NOT NULL
    GROUP BY burn_month
    """,
    survey_ops=("J7", "P6", "A6"),
    doc="dc_burns derivation: fee extraction (skip non-qualifying rows, "
    "src/be_db_dc_burn.erl:74-125) valued at the as-of oracle price, rolled "
    "up by month.",
)
def dc_burn_valuation(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(col("o_orderstatus") == "F")
        .select("o_totalprice", "o_orderdate", col("o_orderdate").cast("date").alias("o_date"))
    )
    prices = _price_series(spark, sf_dir)
    joined = asof_join(orders, prices, left_on="o_date", right_on="price_date")
    return (
        joined.filter(col("price").isNotNull())
        .withColumn("burn_month", F.date_trunc("month", col("o_orderdate")))
        .groupBy("burn_month")
        .agg(
            dsum(col("o_totalprice") * col("price"), "burned_value"),
            F.count(F.lit(1)).alias("burn_count"),
        )
    )
