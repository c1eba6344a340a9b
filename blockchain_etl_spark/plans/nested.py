"""Nested-payload plans — SURVEY §2 P3, P7, P8, F8, F15, W2.

The reference stores one polymorphic JSON document per transaction
(transactions.fields) and repeatedly (a) explodes nested arrays to rows
(jsonb_array_elements / jsonb_to_recordset) and (b) conditionally rewrites
the nested arrays (txn_filter_actor_activity). Here the nested shape is
built from the flat testdata (lineitem rows grouped under their order, the
reference's own FIXTURES.md §B analogy), then operated on with higher-order
functions — filter/transform/aggregate stay in Tungsten codegen, no Python
UDFs, no shuffle beyond the one groupBy that builds the bundle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import col

from ..sources.testdata import load_table
from .registry import register


def _order_bundles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lineitem → one row per order with a linenumber-ordered array of line
    structs (the `fields` document analog)."""
    li = load_table(spark, sf_dir, "lineitem")
    line = F.struct(
        col("l_linenumber"), col("l_partkey"), col("l_extendedprice"), col("l_discount")
    )
    return li.groupBy("l_orderkey").agg(
        F.sort_array(F.collect_list(line)).alias("lines")
    )


@register(
    "discounted_lines_exploded",
    sql="""
    SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
           l_extendedprice, l_discount,
           l_extendedprice * (1 - l_discount) AS net_price
    FROM lineitem
    WHERE l_discount > 0.05
    """,
    survey_ops=("P7", "P8", "F8", "F15", "P2"),
    doc="Conditional rewrite of a nested array then explode back to rows: "
    "txn_filter_actor_activity subsetting fields->'payments' to matching "
    "entries (migrations/1628075186-state_channel_close_v1_activity_"
    "coalesce.sql:4-27) + jsonb_array_elements lateral explode "
    "(src/be_db_backfill.erl:220-234). HOF filter+transform inside the "
    "array, then explode — all codegen, no UDF.",
)
def discounted_lines_exploded(spark: SparkSession, sf_dir: str) -> DataFrame:
    bundles = _order_bundles(spark, sf_dir)
    rewritten = bundles.withColumn(
        "kept",
        F.expr(
            """
            transform(
              filter(lines, x -> x.l_discount > 0.05),
              x -> struct(x.l_linenumber AS l_linenumber,
                          x.l_extendedprice AS l_extendedprice,
                          x.l_discount AS l_discount,
                          x.l_extendedprice * (1 - x.l_discount) AS net_price))
            """
        ),
    )
    return (
        rewritten.select("l_orderkey", F.explode("kept").alias("line"))
        .select(
            "l_orderkey",
            col("line.l_linenumber").cast("long").alias("l_linenumber"),
            col("line.l_extendedprice").alias("l_extendedprice"),
            col("line.l_discount").alias("l_discount"),
            col("line.net_price").alias("net_price"),
        )
    )


@register(
    "order_discount_activity",
    sql="""
    SELECT l_orderkey,
           CAST(COUNT(*) FILTER (WHERE l_discount > 0.05) AS BIGINT) AS n_discounted,
           CAST(COALESCE(SUM(CAST(l_extendedprice AS DECIMAL(25,6)))
                         FILTER (WHERE l_discount > 0.05),
                         CAST(0 AS DECIMAL(25,6))) AS DOUBLE) AS discounted_revenue,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem
    GROUP BY l_orderkey
    """,
    survey_ops=("P8", "A6", "A12"),
    doc="Per-document rollup of a filtered nested array (rewards rollup over "
    "fields->'rewards', migrations/1597773017-rewards.sql:17-36) via HOF "
    "aggregate with an exact DECIMAL accumulator; coalesce-empty-to-zero "
    "mirrors the reference's coalesce(array_agg, '[]') convention "
    "(migrations/1612480010-ouis.sql:90).",
)
def order_discount_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    bundles = _order_bundles(spark, sf_dir)
    return bundles.select(
        "l_orderkey",
        F.expr("CAST(size(filter(lines, x -> x.l_discount > 0.05)) AS BIGINT)").alias(
            "n_discounted"
        ),
        F.expr(
            """
            CAST(aggregate(
                   filter(lines, x -> x.l_discount > 0.05),
                   CAST(0 AS DECIMAL(25,6)),
                   (acc, x) -> CAST(acc + CAST(x.l_extendedprice AS DECIMAL(25,6))
                               AS DECIMAL(25,6))) AS DOUBLE)
            """
        ).alias("discounted_revenue"),
        F.expr("CAST(size(lines) AS BIGINT)").alias("n_lines"),
    )


@register(
    "order_json_projection",
    # JSON serialization IS comparable here: both engines emit compact
    # to_json, struct field order fixes key order, list_sort/sort_array
    # both compare structs field-lexicographically, and the payload is
    # strings + ints + doubles only — Java's Double.toString and DuckDB's
    # shortest-round-trip formatter agree on every value in range
    # (no decimals: Spark pads scale '945.00' where DuckDB trims; no
    # timestamps: formats differ; doubles >= 1e7 would hit Java
    # E-notation, far above this column's domain).
    sql="""
    WITH b AS (
      SELECT l_orderkey,
             list_sort(list(struct_pack(
                 l_linenumber := l_linenumber,
                 l_partkey := l_partkey,
                 l_extendedprice := l_extendedprice,
                 l_discount := l_discount))) AS lines
      FROM lineitem GROUP BY l_orderkey)
    SELECT o_orderkey, o_orderdate, o_orderstatus,
           to_json(struct_pack(status := o_orderstatus, lines := lines))
             AS fields_json
    FROM orders JOIN b ON l_orderkey = o_orderkey
    """,
    survey_ops=("P3",),
    doc="Txn JSON projection: each order → (key, date, status, fields_json) "
    "with the nested line array serialized to one JSON document "
    "(src/be_db_block.erl:198-215; src/be_txn.erl:14-126).",
)
def order_json_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    bundles = _order_bundles(spark, sf_dir)
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderstatus"
    )
    return orders.join(
        bundles, col("l_orderkey") == col("o_orderkey"), "inner"
    ).select(
        "o_orderkey",
        "o_orderdate",
        "o_orderstatus",
        F.to_json(F.struct(col("o_orderstatus").alias("status"), col("lines"))).alias(
            "fields_json"
        ),
    )
