"""Core relational plans — SURVEY §2.2/§2.3/§2.4/§2.5/§2.6 operators mapped
onto the driver testdata per FIXTURES.md §B.

Each query is registered with its DuckDB oracle. All double aggregates use
the exact-decimal accumulator (functions.numeric) so the value-hash matches
the oracle bit-for-bit; all top-k queries carry unique tie-break keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast, col

from ..functions.numeric import dsum, davg, dsum_expr
from ..sources.testdata import load_table
from .registry import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# --------------------------------------------------------------------------
# A2/A5 aggregation family — pricing summary (reference stats counters,
# src/be_db_stats.erl:96-217, re-expressed as a hash aggregate).
# --------------------------------------------------------------------------
@register(
    "pricing_summary",
    sql=f"""
    SELECT l_returnflag, l_linestatus,
           {dsum_expr('l_quantity')} AS sum_qty,
           {dsum_expr('l_extendedprice')} AS sum_base_price,
           {dsum_expr('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
           {dsum_expr('l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS sum_charge,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-06-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    survey_ops=("A2", "A5", "P5"),
    doc="Filtered hash aggregate over the fact table (stats-counter family, "
    "src/be_db_stats.erl:96-217). Filter is pushed to the parquet scan; "
    "partial aggregation is map-side.",
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    disc = col("l_extendedprice") * (F.lit(1) - col("l_discount"))
    charge = disc * (F.lit(1) + col("l_tax"))
    return (
        li.filter(col("l_shipdate") <= F.lit("2001-06-01 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", "sum_qty"),
            dsum("l_extendedprice", "sum_base_price"),
            dsum(disc, "sum_disc_price"),
            dsum(charge, "sum_charge"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# --------------------------------------------------------------------------
# J4 fact-fact equi-join + top-k (W3).
# --------------------------------------------------------------------------
@register(
    "top_revenue_orders",
    sql=f"""
    SELECT o_orderkey, o_orderdate,
           {dsum_expr('l_extendedprice * (1 - l_discount)')} AS revenue
    FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    WHERE o_orderstatus = 'O'
    GROUP BY o_orderkey, o_orderdate
    ORDER BY revenue DESC, o_orderkey
    LIMIT 10
    """,
    survey_ops=("J4", "W3", "A6"),
    doc="txn ⋈ blocks equi-join (src/be_db_backfill.erl:49-54) + top-k scan "
    "(src/be_db_gateway_status.erl:71-82). Both sides shuffle on the join "
    "key; top-k is a TakeOrderedAndProject, no global sort materialized.",
)
def top_revenue_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders").filter(col("o_orderstatus") == "O")
    li = _t(spark, sf_dir, "lineitem")
    disc = col("l_extendedprice") * (F.lit(1) - col("l_discount"))
    return (
        orders.join(li, col("l_orderkey") == col("o_orderkey"))
        .groupBy("o_orderkey", "o_orderdate")
        .agg(dsum(disc, "revenue"))
        .orderBy(col("revenue").desc(), col("o_orderkey"))
        .limit(10)
    )


# --------------------------------------------------------------------------
# J2 dim-join chain + A3 count-distinct (city/country stats,
# src/be_db_stats.erl:152-178).
# --------------------------------------------------------------------------
@register(
    "region_rollup",
    sql=f"""
    SELECT r_name,
           COUNT(*) AS customer_count,
           COUNT(DISTINCT n_name) AS nation_count,
           {dsum_expr('c_acctbal')} AS total_acctbal
    FROM region
    JOIN nation ON n_regionkey = r_regionkey
    JOIN customer ON c_nationkey = n_nationkey
    GROUP BY r_name
    """,
    survey_ops=("J2", "A3", "A2"),
    doc="inventory ⋈ locations inner join + count(distinct) stats "
    "(src/be_db_stats.erl:152-178). region/nation are broadcast — no "
    "shuffle of the customer side for the join itself.",
)
def region_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = _t(spark, sf_dir, "region")
    nation = _t(spark, sf_dir, "nation")
    customer = _t(spark, sf_dir, "customer")
    return (
        customer.join(broadcast(nation), col("c_nationkey") == col("n_nationkey"))
        .join(broadcast(region), col("n_regionkey") == col("r_regionkey"))
        .groupBy("r_name")
        .agg(
            F.count(F.lit(1)).alias("customer_count"),
            F.countDistinct("n_name").alias("nation_count"),
            dsum("c_acctbal", "total_acctbal"),
        )
    )


# --------------------------------------------------------------------------
# A6 rewards-rollup analog: revenue by (account, type).
# --------------------------------------------------------------------------
@register(
    "revenue_by_customer_flag",
    sql=f"""
    SELECT o_custkey, l_returnflag,
           {dsum_expr('l_extendedprice * (1 - l_discount)')} AS revenue,
           COUNT(*) AS line_count
    FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    GROUP BY o_custkey, l_returnflag
    """,
    survey_ops=("A6",),
    doc="Rewards rollup shape: sum(amount) grouped by (account, type) "
    "(src/be_db_reward.erl:159-236; migrations/1597773017-rewards.sql:17-36).",
)
def revenue_by_customer_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = _t(spark, sf_dir, "lineitem")
    disc = col("l_extendedprice") * (F.lit(1) - col("l_discount"))
    return (
        orders.join(li, col("l_orderkey") == col("o_orderkey"))
        .groupBy("o_custkey", "l_returnflag")
        .agg(dsum(disc, "revenue"), F.count(F.lit(1)).alias("line_count"))
    )


# --------------------------------------------------------------------------
# A7 packet-rollup analog: per-gateway sums.
# --------------------------------------------------------------------------
@register(
    "supplier_rollup",
    sql=f"""
    SELECT l_suppkey,
           CAST(SUM(CAST(l_quantity AS DECIMAL(25,6))) AS DOUBLE) AS total_qty,
           {dsum_expr('l_extendedprice')} AS total_price,
           COUNT(*) AS shipment_count
    FROM lineitem
    GROUP BY l_suppkey
    """,
    survey_ops=("A7", "A8"),
    doc="Packet rollup: per-gateway sum(num_packets), sum(num_dcs) "
    "(src/be_db_packet.erl:85-101; migrations/1609338698-packets.sql:17-36).",
)
def supplier_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_suppkey").agg(
        dsum("l_quantity", "total_qty"),
        dsum("l_extendedprice", "total_price"),
        F.count(F.lit(1)).alias("shipment_count"),
    )


# --------------------------------------------------------------------------
# W3 + J1: stalest-N scheduling scan with coalesce default.
# --------------------------------------------------------------------------
@register(
    "stalest_customers",
    sql="""
    SELECT c_custkey, c_name, last_order_date
    FROM (
      SELECT c_custkey, c_name,
             COALESCE(MAX(o_orderdate), TIMESTAMP '1990-01-01 00:00:00') AS last_order_date
      FROM customer LEFT JOIN orders ON o_custkey = c_custkey
      GROUP BY c_custkey, c_name
    ) t
    ORDER BY last_order_date ASC, c_custkey
    LIMIT 25
    """,
    survey_ops=("W3", "J1", "F10"),
    doc="Status-refresh scheduling scan: stalest N rows by "
    "coalesce(updated_at, to_timestamp(0)) "
    "(src/be_db_gateway_status.erl:67-83).",
)
def stalest_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = _t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    orders = _t(spark, sf_dir, "orders").select("o_custkey", "o_orderdate")
    return (
        customer.join(orders, col("o_custkey") == col("c_custkey"), "left")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.coalesce(
                F.max("o_orderdate"), F.lit("1990-01-01 00:00:00").cast("timestamp")
            ).alias("last_order_date")
        )
        .orderBy(col("last_order_date").asc(), col("c_custkey"))
        .limit(25)
    )


# --------------------------------------------------------------------------
# X1 set difference (oracle key rotation, src/be_db_vars.erl:112-122).
# --------------------------------------------------------------------------
@register(
    "churned_customers",
    sql="""
    SELECT o_custkey AS custkey FROM orders WHERE o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    EXCEPT
    SELECT o_custkey AS custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1998-01-01 00:00:00'
    """,
    survey_ops=("X1", "X2"),
    doc="Set difference Current ∖ New (src/be_db_vars.erl:112-122): "
    "customers active before 1998 with no orders after.",
)
def churned_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    before = orders.filter(
        col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp")
    ).select(col("o_custkey").alias("custkey"))
    after = orders.filter(
        col("o_orderdate") >= F.lit("1998-01-01 00:00:00").cast("timestamp")
    ).select(col("o_custkey").alias("custkey"))
    return before.subtract(after)


# --------------------------------------------------------------------------
# J6 anti-join (geocoder NOT EXISTS, src/be_db_geocoder.erl:33).
# --------------------------------------------------------------------------
@register(
    "customers_without_orders",
    sql="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
    survey_ops=("J6",),
    doc="Anti-join: rows with no match in the other table "
    "(src/be_db_geocoder.erl:33 NOT EXISTS). left_anti join in Spark.",
)
def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = _t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    orders = _t(spark, sf_dir, "orders").select("o_custkey")
    return customer.join(orders, col("o_custkey") == col("c_custkey"), "left_anti")


# --------------------------------------------------------------------------
# J10 correlated scalar subquery, decorrelated by hand into agg + join.
# --------------------------------------------------------------------------
@register(
    "above_avg_balance",
    sql="""
    SELECT c.c_custkey, c.c_nationkey, c.c_acctbal
    FROM customer c
    JOIN (
      SELECT c_nationkey,
             CAST(SUM(CAST(c_acctbal AS DECIMAL(25,6))) AS DOUBLE) / COUNT(*) AS avg_bal
      FROM customer GROUP BY c_nationkey
    ) a ON a.c_nationkey = c.c_nationkey
    WHERE c.c_acctbal > a.avg_bal
    """,
    survey_ops=("J10",),
    doc="Correlated scalar subquery (migrations/1650412999-account_owner_"
    "first_block.sql:5-15) decorrelated into groupBy-agg + broadcast join.",
)
def above_avg_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = _t(spark, sf_dir, "customer")
    avgs = (
        customer.groupBy(col("c_nationkey").alias("nk"))
        .agg(davg("c_acctbal", "avg_bal"))
    )
    return (
        customer.join(broadcast(avgs), col("c_nationkey") == col("nk"))
        .filter(col("c_acctbal") > col("avg_bal"))
        .select("c_custkey", "c_nationkey", "c_acctbal")
    )


# --------------------------------------------------------------------------
# P4/X3 actor extraction: one row per (entity, role) per transaction.
# --------------------------------------------------------------------------
@register(
    "transaction_actors",
    sql="""
    SELECT DISTINCT * FROM (
      SELECT o_orderkey AS txn, o_custkey AS actor, 'payer' AS actor_role FROM orders
      UNION ALL
      SELECT l_orderkey AS txn, l_suppkey AS actor, 'supplier' AS actor_role FROM lineitem
      UNION ALL
      SELECT l_orderkey AS txn, l_partkey AS actor, 'part' AS actor_role FROM lineitem
    ) t
    """,
    survey_ops=("P4", "X3", "X2"),
    doc="Actor extraction flatMap: per txn-type pattern match → (role, actor) "
    "pairs, dedup (src/be_db_txn_actor.erl:107-453 usort at :133-137); "
    "role re-labeling union (migrations/1591138658:4-8).",
)
def transaction_actors(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    payer = orders.select(
        col("o_orderkey").alias("txn"),
        col("o_custkey").alias("actor"),
        F.lit("payer").alias("actor_role"),
    )
    supplier = li.select(
        col("l_orderkey").alias("txn"),
        col("l_suppkey").alias("actor"),
        F.lit("supplier").alias("actor_role"),
    )
    part = li.select(
        col("l_orderkey").alias("txn"),
        col("l_partkey").alias("actor"),
        F.lit("part").alias("actor_role"),
    )
    return payer.unionByName(supplier).unionByName(part).distinct()


# --------------------------------------------------------------------------
# A4 running counters as window frame aggregates.
# --------------------------------------------------------------------------
@register(
    "running_user_stats",
    sql="""
    SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
           CAST(COUNT(*) OVER w AS BIGINT) AS running_events,
           CAST(SUM(CAST(value AS DECIMAL(25,6))) OVER w AS DOUBLE) AS running_value
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
    survey_ops=("A4", "T4"),
    doc="Running stats counters carried per block in handler state "
    "(src/be_db_stats.erl:63-99) → cumulative window aggregates. One "
    "shuffle on user_id; frame is ROWS-based with a unique order key.",
)
def running_user_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return events.select(
        "event_id",
        "user_id",
        "ts",
        F.count(F.lit(1)).over(w).alias("running_events"),
        F.sum(col("value").cast("decimal(25,6)")).over(w).cast("double").alias("running_value"),
    )


# --------------------------------------------------------------------------
# W1 rank variant: top-N per group.
# --------------------------------------------------------------------------
@register(
    "top_orders_per_customer",
    sql="""
    SELECT o_custkey, o_orderkey, o_totalprice, CAST(rn AS BIGINT) AS rn
    FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders
    ) t
    WHERE rn <= 3
    """,
    survey_ops=("W1", "W5"),
    doc="Rank-per-key window (latest/top-row-per-key family, "
    "migrations/1577040141-create-account.sql:22-27).",
)
def top_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        col("o_totalprice").desc(), col("o_orderkey")
    )
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).cast("long").alias("rn"),
        )
        .filter(col("rn") <= 3)
    )


# --------------------------------------------------------------------------
# F7 JSON path access over the events props column.
# --------------------------------------------------------------------------
@register(
    "event_props_extract",
    sql="""
    SELECT event_id, event_type,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS prop_k
    FROM events
    WHERE event_type IN ('click', 'purchase')
    """,
    survey_ops=("F7", "P5"),
    doc="JSON path access fields->>'k' (src/be_db_backfill.erl:24,345-351) "
    "+ txn-type filter (src/be_db_reward.erl:58-64).",
)
def event_props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _t(spark, sf_dir, "events")
    return events.filter(col("event_type").isin("click", "purchase")).select(
        "event_id",
        "event_type",
        F.get_json_object("props", "$.k").cast("long").alias("prop_k"),
    )


# --------------------------------------------------------------------------
# Semi-join + grouped counts (TPC-H Q4 shape).
# --------------------------------------------------------------------------
@register(
    "order_priority_counts",
    sql="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
    GROUP BY o_orderpriority
    """,
    survey_ops=("J8", "A2"),
    doc="Actor-set semi-join against ledger state: point-lookup keep-if-"
    "present (src/be_db_account.erl:114-123) → left_semi join + counts.",
)
def order_priority_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    matched = orders.join(
        li,
        (col("l_orderkey") == col("o_orderkey")) & (col("l_shipdate") > col("o_orderdate")),
        "left_semi",
    )
    return matched.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("order_count"))
