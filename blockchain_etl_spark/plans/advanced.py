"""Advanced relational plans — the remaining SURVEY §2 operators mapped onto
the driver testdata: chained derivation joins (J5), first/last-event lookups
(W4/W5/A10), ordered queue drain (W6), merge-style map aggregation (A11/P9),
array-of-struct projections (P10), typed value encoding (P11), epoch/millis
timestamp conversions (F5/F6), geo distance scan (F11), fuzzy text search
(F14), and the resume-point aggregate (A1).

Determinism notes: every canonical-map output is a sorted joined string (both
engines sort the same concatenated tokens); every float that feeds a string
is fixed-point scaled first (ROUND(x*10^k) → BIGINT) — never a raw
double→string cast, which formats differently across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast, col

from ..functions.timeutil import epoch_ms, epoch_s
from ..sources.testdata import load_table
from .registry import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# --------------------------------------------------------------------------
# J5 chained payer derivation: inventory ⋈ actors(first_block) ⋈ txns →
# project a field of the first transaction (src/be_db_backfill.erl:338-356;
# migrations/1627043667-gateway_payer.sql:7-22).
# --------------------------------------------------------------------------
@register(
    "first_order_payer_derivation",
    sql="""
    WITH first_ord AS (
      SELECT o_custkey, o_orderkey AS first_orderkey FROM (
        SELECT o_custkey, o_orderkey,
               ROW_NUMBER() OVER (PARTITION BY o_custkey
                                  ORDER BY o_orderdate, o_orderkey) AS rn
        FROM orders) t WHERE rn = 1)
    SELECT c_custkey, c_name, first_orderkey,
           o.o_orderpriority AS first_priority
    FROM customer c
    JOIN first_ord f ON f.o_custkey = c.c_custkey
    JOIN orders o ON o.o_orderkey = f.first_orderkey
    """,
    survey_ops=("J5", "W4"),
    doc="3-way derivation chain: entity → its first transaction → a field of "
    "that transaction (gateway payer derivation, src/be_db_backfill.erl:"
    "338-356). The first-row-per-key step is a min(struct) hash aggregate "
    "(map-side partials), not a window — no sort, one shuffle on the key.",
)
def first_order_payer_derivation(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    # min over (orderdate, orderkey) struct == ROW_NUMBER()=1 with that order,
    # but aggregates map-side instead of sorting partitions.
    first_ord = (
        orders.groupBy("o_custkey")
        .agg(F.min(F.struct("o_orderdate", "o_orderkey")).alias("f"))
        .select("o_custkey", col("f.o_orderkey").alias("first_orderkey"))
    )
    return (
        customer.join(first_ord, col("o_custkey") == col("c_custkey"))
        .join(
            orders.select("o_orderkey", col("o_orderpriority").alias("first_priority")),
            col("o_orderkey") == col("first_orderkey"),
        )
        .select("c_custkey", "c_name", "first_orderkey", "first_priority")
    )


# --------------------------------------------------------------------------
# W4 first-event lookup (src/be_db_gateway_status.erl:109-121: first block
# where the actor appears, `order by block limit 1` per key).
# --------------------------------------------------------------------------
@register(
    "first_event_per_user",
    sql="""
    SELECT user_id, first_ts, first_event_id FROM (
      SELECT user_id, CAST(ts AS TIMESTAMP) AS first_ts, event_id AS first_event_id,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY CAST(ts AS TIMESTAMP), event_id) AS rn
      FROM events) t WHERE rn = 1
    """,
    survey_ops=("W4",),
    doc="First-event lookup per key (src/be_db_gateway_status.erl:109-121) "
    "as a min(struct(ts, id)) hash aggregate — partial aggregation map-side, "
    "single shuffle, no sort.",
)
def first_event_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _t(spark, sf_dir, "events")
    return (
        events.groupBy("user_id")
        .agg(F.min(F.struct("ts", "event_id")).alias("f"))
        .select(
            "user_id",
            col("f.ts").alias("first_ts"),
            col("f.event_id").alias("first_event_id"),
        )
    )


# --------------------------------------------------------------------------
# W6 ordered queue drain (pending txns by created_at,
# src/be_db_pending_txn.erl:36-47).
# --------------------------------------------------------------------------
@register(
    "event_queue_drain",
    sql="""
    SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, event_type
    FROM events
    ORDER BY CAST(ts AS TIMESTAMP), event_id
    LIMIT 100
    """,
    survey_ops=("W6",),
    doc="Ordered work-queue drain: oldest N rows by creation time with a "
    "unique tie-break (src/be_db_pending_txn.erl:36-47). Physical plan is "
    "TakeOrderedAndProject — per-partition top-k then driver merge, no "
    "global sort.",
)
def event_queue_drain(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _t(spark, sf_dir, "events")
    return (
        events.select("event_id", "ts", "event_type")
        .orderBy("ts", "event_id")
        .limit(100)
    )


# --------------------------------------------------------------------------
# A10 custom LAST() aggregate + W5 last-value init
# (migrations/1593644594-location_city_search.sql:33-42;
# src/be_db_oracle_price.erl:64-69).
# --------------------------------------------------------------------------
@register(
    "last_event_value_per_user",
    sql="""
    SELECT user_id, last_ts, last_value FROM (
      SELECT user_id, CAST(ts AS TIMESTAMP) AS last_ts, value AS last_value,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY CAST(ts AS TIMESTAMP) DESC, event_id DESC) AS rn
      FROM events) t WHERE rn = 1
    """,
    survey_ops=("A10", "W5"),
    doc="LAST(anyelement) custom aggregate (migrations/1593644594:33-42) / "
    "latest-value init scan (src/be_db_oracle_price.erl:64-69): "
    "max_by over a (ts, id) ordering struct — a hash aggregate, not a "
    "window sort.",
)
def last_event_value_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _t(spark, sf_dir, "events")
    return (
        events.groupBy("user_id")
        .agg(F.max(F.struct("ts", "event_id", "value")).alias("l"))
        .select(
            "user_id",
            col("l.ts").alias("last_ts"),
            col("l.value").alias("last_value"),
        )
    )


# --------------------------------------------------------------------------
# A11 jsonb_merge_agg (migrations/1609356128-jsonb_merge_agg.sql:4-9): fold
# JSON objects per key, later values overwriting earlier — here as
# (type → latest value) map per user, canonicalized to a sorted string.
# --------------------------------------------------------------------------
@register(
    "user_props_merged",
    sql="""
    WITH per AS (
      SELECT user_id, event_type, cents FROM (
        SELECT user_id, event_type, CAST(ROUND(value * 100) AS BIGINT) AS cents,
               ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                  ORDER BY CAST(ts AS TIMESTAMP) DESC, event_id DESC) AS rn
        FROM events) t WHERE rn = 1)
    SELECT user_id,
           string_agg(event_type || ':' || CAST(cents AS VARCHAR), ','
                      ORDER BY event_type) AS merged_props,
           COUNT(*) AS n_keys
    FROM per GROUP BY user_id
    """,
    survey_ops=("A11",),
    doc="jsonb_merge_agg: fold per-event JSON objects with last-key-wins "
    "(migrations/1609356128:4-9). Two hash aggregates — (user, key) latest "
    "via max_by, then map_from_entries canonicalized as a sorted k:v string. "
    "Values fixed-point scaled before stringification.",
)
def user_props_merged(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _t(spark, sf_dir, "events")
    per = (
        events.select(
            "user_id",
            "event_type",
            "ts",
            "event_id",
            F.round(col("value") * 100).cast("long").alias("cents"),
        )
        .groupBy("user_id", "event_type")
        .agg(F.max(F.struct("ts", "event_id", "cents")).alias("l"))
        .select("user_id", "event_type", col("l.cents").alias("cents"))
    )
    kv = F.concat(col("event_type"), F.lit(":"), col("cents").cast("string"))
    return per.groupBy("user_id").agg(
        F.array_join(F.array_sort(F.collect_list(kv)), ",").alias("merged_props"),
        F.count(F.lit(1)).alias("n_keys"),
    )


# --------------------------------------------------------------------------
# P9 witness-map projection (src/be_db_gateway.erl:239-259): per entity, a
# map keyed by counterparty with {histogram count, first time, recent time}.
# --------------------------------------------------------------------------
@register(
    "supplier_brand_witnesses",
    sql="""
    WITH per AS (
      SELECT l_suppkey, p_brand, COUNT(*) AS cnt,
             MIN(l_shipdate) AS first_ship, MAX(l_shipdate) AS recent_ship
      FROM lineitem JOIN part ON p_partkey = l_partkey
      GROUP BY l_suppkey, p_brand),
    entries AS (
      SELECT l_suppkey,
             p_brand || ':' || CAST(cnt AS VARCHAR)
               || ':' || strftime(first_ship, '%Y-%m-%d')
               || ':' || strftime(recent_ship, '%Y-%m-%d') AS entry
      FROM per)
    SELECT l_suppkey,
           string_agg(entry, ',' ORDER BY entry) AS witnesses,
           COUNT(*) AS n_brands
    FROM entries GROUP BY l_suppkey
    """,
    survey_ops=("P9", "A5"),
    doc="Witness map projection (src/be_db_gateway.erl:239-259): counterparty"
    "-keyed map with histogram count + first/recent times, canonicalized to "
    "a sorted k:v string. part is broadcast; one shuffle on (supplier, "
    "brand), then a map-side second aggregate.",
)
def supplier_brand_witnesses(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select("l_suppkey", "l_partkey", "l_shipdate")
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    per = (
        li.join(broadcast(part), col("p_partkey") == col("l_partkey"))
        .groupBy("l_suppkey", "p_brand")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.min("l_shipdate").alias("first_ship"),
            F.max("l_shipdate").alias("recent_ship"),
        )
    )
    entry = F.concat(
        col("p_brand"),
        F.lit(":"),
        col("cnt").cast("string"),
        F.lit(":"),
        F.date_format("first_ship", "yyyy-MM-dd"),
        F.lit(":"),
        F.date_format("recent_ship", "yyyy-MM-dd"),
    )
    return per.groupBy("l_suppkey").agg(
        F.array_join(F.array_sort(F.collect_list(entry)), ",").alias("witnesses"),
        F.count(F.lit(1)).alias("n_brands"),
    )


# --------------------------------------------------------------------------
# P10 penalty-list projection (src/be_db_validator.erl:132-148): per entity,
# an ordered array<struct> serialized canonically.
# --------------------------------------------------------------------------
@register(
    "order_lines_projection",
    sql="""
    SELECT l_orderkey,
           string_agg(entry, ',' ORDER BY entry) AS lines,
           COUNT(*) AS n_lines
    FROM (
      SELECT l_orderkey,
             CAST(l_linenumber AS VARCHAR) || ':'
               || CAST(CAST(ROUND(l_quantity * 100) AS BIGINT) AS VARCHAR) AS entry
      FROM lineitem) t
    GROUP BY l_orderkey
    """,
    survey_ops=("P10", "A12"),
    doc="Array-of-struct list projection (validator penalties, "
    "src/be_db_validator.erl:132-148): collect_list of (line, qty) entries "
    "per key, canonically sorted; quantities fixed-point scaled. "
    "coalesce-empty collect (A12, migrations/1612480010:90).",
)
def order_lines_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    entry = F.concat(
        col("l_linenumber").cast("string"),
        F.lit(":"),
        F.round(col("l_quantity") * 100).cast("long").cast("string"),
    )
    return (
        li.select("l_orderkey", entry.alias("entry"))
        .groupBy("l_orderkey")
        .agg(
            F.array_join(
                F.coalesce(F.array_sort(F.collect_list("entry")), F.array()), ","
            ).alias("lines"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


# --------------------------------------------------------------------------
# P11 typed var encode (src/be_db_vars.erl:103-130): value → (name, type,
# value_text) with CASE-typed casts.
# --------------------------------------------------------------------------
@register(
    "typed_var_encode",
    sql="""
    SELECT event_id, event_type AS name,
           CASE WHEN value = FLOOR(value) THEN 'integer' ELSE 'float' END AS var_type,
           CASE WHEN value = FLOOR(value)
                THEN CAST(CAST(value AS BIGINT) AS VARCHAR)
                ELSE CAST(CAST(ROUND(value * 10000) AS BIGINT) AS VARCHAR)
           END AS value_text
    FROM events
    """,
    survey_ops=("P11", "F13"),
    doc="Typed var encoding (src/be_db_vars.erl:103-130): per-row CASE "
    "projection into {integer,float} discriminator + normalized text value; "
    "floats pinned to fixed-point before stringification "
    "(float-normalization concern F13, src/be_db_vars.erl:126).",
)
def typed_var_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _t(spark, sf_dir, "events")
    is_int = col("value") == F.floor(col("value"))
    return events.select(
        "event_id",
        col("event_type").alias("name"),
        F.when(is_int, F.lit("integer")).otherwise(F.lit("float")).alias("var_type"),
        F.when(is_int, col("value").cast("long").cast("string"))
        .otherwise(F.round(col("value") * 10000).cast("long").cast("string"))
        .alias("value_text"),
    )


# --------------------------------------------------------------------------
# F5/F6 epoch ↔ timestamp conversions + P1 wide projection
# (src/be_db_block.erl:25,159-182; src/be_db_gateway_status.erl:97).
# --------------------------------------------------------------------------
@register(
    "event_time_encode",
    sql="""
    SELECT event_id, CAST(ts AS TIMESTAMP) AS ts,
           epoch_us(CAST(ts AS TIMESTAMP)) // 1000000 AS epoch_s,
           epoch_ms(CAST(ts AS TIMESTAMP)) AS epoch_msec,
           make_timestamp((epoch_us(CAST(ts AS TIMESTAMP)) // 1000000) * 1000000)
             AS ts_second
    FROM events
    """,
    survey_ops=("F5", "F6", "P1"),
    doc="Epoch-seconds ↔ timestamp conversion both ways plus millis "
    "(src/be_db_block.erl:25,161-163 Gregorian arithmetic; "
    "src/be_db_gateway_status.erl:97 millis→timestamptz). Pure column "
    "expressions inside whole-stage codegen.",
)
def event_time_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _t(spark, sf_dir, "events")
    # ts is TIMESTAMP_NTZ (sources.testdata canonical): all epoch math via
    # tz-independent wall-clock diffs against the NTZ epoch, and the
    # truncated second is rebuilt as NTZ — unix_micros/timestamp_micros
    # would crash on NTZ input or shift with the session timezone.
    return events.select(
        "event_id",
        "ts",
        epoch_s("ts").alias("epoch_s"),
        epoch_ms("ts").alias("epoch_msec"),
        F.expr(
            "timestampadd(SECOND, timestampdiff(SECOND, "
            "TIMESTAMP_NTZ '1970-01-01 00:00:00', ts), "
            "TIMESTAMP_NTZ '1970-01-01 00:00:00')"
        ).alias("ts_second"),
    )


# --------------------------------------------------------------------------
# F11 geo point + distance scan (geometry POINT + geography distance,
# src/be_db_geocoder.erl:49-51, migrations/1649804744:4). Coordinates are
# derived deterministically from the key; the distance is planar squared
# (raw double ops are IEEE-identical cross-engine; trig is not).
# --------------------------------------------------------------------------
@register(
    "nearest_suppliers_geo",
    sql="""
    SELECT s_suppkey, lat, lon,
           (lat - 10.0) * (lat - 10.0) + (lon - 20.0) * (lon - 20.0) AS dist2
    FROM (
      SELECT s_suppkey,
             CAST(s_suppkey * 37 % 180 AS DOUBLE) - 90.0 + 0.5 AS lat,
             CAST(s_suppkey * 91 % 360 AS DOUBLE) - 180.0 + 0.5 AS lon
      FROM supplier) t
    ORDER BY dist2, s_suppkey
    LIMIT 10
    """,
    survey_ops=("F11", "W3"),
    doc="Geo point struct + nearest-N distance scan "
    "(src/be_db_geocoder.erl:49-51 ST_MakePoint; GIST geography index "
    "migrations/1649804744:4 → top-k scan, no index needed). Planar "
    "squared distance keeps the math engine-exact.",
)
def nearest_suppliers_geo(spark: SparkSession, sf_dir: str) -> DataFrame:
    sup = _t(spark, sf_dir, "supplier")
    lat = (col("s_suppkey") * 37 % 180).cast("double") - 90.0 + 0.5
    lon = (col("s_suppkey") * 91 % 360).cast("double") - 180.0 + 0.5
    pts = sup.select("s_suppkey", lat.alias("lat"), lon.alias("lon"))
    dist2 = (col("lat") - 10.0) * (col("lat") - 10.0) + (col("lon") - 20.0) * (
        col("lon") - 20.0
    )
    return (
        pts.withColumn("dist2", dist2)
        .orderBy("dist2", "s_suppkey")
        .limit(10)
    )


# --------------------------------------------------------------------------
# F14 trigram-ish fuzzy search (pg_trgm GIN, migrations/1593610727:38,
# 1616176828:3) — index-free: substring match ∪ edit-distance ranking.
# --------------------------------------------------------------------------
@register(
    "part_name_search",
    sql="""
    SELECT p_partkey, p_name, levenshtein(p_name, 'red bolt') AS lev_dist
    FROM part
    WHERE p_name LIKE '%red%' OR levenshtein(p_name, 'red bolt') <= 4
    ORDER BY lev_dist, p_partkey
    LIMIT 50
    """,
    survey_ops=("F14",),
    doc="Fuzzy name search standing in for trigram GIN similarity "
    "(migrations/1616176828:3): substring containment ∪ bounded edit "
    "distance, ranked by distance. Predicate evaluates in one scan; at "
    "scale a precomputed token column (part_search_words) prunes first.",
)
def part_name_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _t(spark, sf_dir, "part")
    lev = F.levenshtein(col("p_name"), F.lit("red bolt"))
    return (
        part.select("p_partkey", "p_name", lev.alias("lev_dist"))
        .filter(col("p_name").contains("red") | (col("lev_dist") <= 4))
        .orderBy("lev_dist", "p_partkey")
        .limit(50)
    )


# --------------------------------------------------------------------------
# A1 resume-point aggregate (max(height) at startup,
# src/be_db_block.erl:33-39,83-88) + A13 row accounting.
# --------------------------------------------------------------------------
@register(
    "sync_resume_point",
    sql="""
    SELECT MAX(event_id) AS max_event_id,
           COUNT(*) AS n_events,
           MAX(CAST(ts AS TIMESTAMP)) AS max_ts
    FROM events
    """,
    survey_ops=("A1", "A13"),
    doc="Startup resume point: max(height) + row accounting "
    "(src/be_db_block.erl:33-39; src/be_db_backfill.erl:305-325). "
    "Single-row global aggregate with map-side partials.",
)
def sync_resume_point(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _t(spark, sf_dir, "events")
    return events.agg(
        F.max("event_id").alias("max_event_id"),
        F.count(F.lit(1)).alias("n_events"),
        F.max("ts").alias("max_ts"),
    )


@register(
    "customer_geo_grid_density",
    sql="""
    SELECT (c_custkey * 37 % 180) // 10 AS cell_row,
           (c_custkey * 91 % 360) // 10 AS cell_col,
           COUNT(*) AS n_customers,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(25,6))) AS DOUBLE) AS total_balance
    FROM customer
    GROUP BY 1, 2
    """,
    survey_ops=("F11", "A2"),
    doc="Grid-cell density rollup — the hotspot density-map query the "
    "reference serves from H3-indexed cells (be_db_gateway location_hex, "
    "migrations/1633375157-gateway_mode.sql), expressed on the synthetic "
    "lat/lon grid: derive the cell id with integer arithmetic map-side, "
    "ONE hash aggregate. At 100 TB this is the same plan whether the cell "
    "is a 10-degree box or an H3 parent index (functions/encoding.py "
    "h3_parent) — the cell id is just a different map-side expression.",
)
def customer_geo_grid_density(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.numeric import dsum

    cust = _t(spark, sf_dir, "customer")
    return (
        cust.select(
            F.expr("(c_custkey * 37 % 180) div 10").alias("cell_row"),
            F.expr("(c_custkey * 91 % 360) div 10").alias("cell_col"),
            "c_acctbal",
        )
        .groupBy("cell_row", "cell_col")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            dsum("c_acctbal", "total_balance"),
        )
    )


# --------------------------------------------------------------------------
# F2 driver gate: base64url encode/decode as cross-engine known vectors —
# reference ?BIN_TO_B64 (include/blockchain_etl.hrl:5-6) URL-safe-encodes
# every hash/address the API serves.
# --------------------------------------------------------------------------
@register(
    "part_b64url_roundtrip",
    sql="""
    SELECT p_partkey,
           rtrim(translate(base64(encode(p_name)), '+/', '-_'), '=')
             AS b64u,
           decode(from_base64(base64(encode(p_name)))) AS decoded_name
    FROM part
    """,
    survey_ops=("F2",),
    doc="base64url as cross-engine known vectors over every part name "
    "(reference ?BIN_TO_B64, include/blockchain_etl.hrl:5-6): Spark "
    "encodes through functions/encoding.b64url_encode (translate + "
    "unpad over JVM base64 — pure codegen) and decodes back through "
    "b64url_decode (padding restored from length mod 4); DuckDB "
    "recomputes both sides from its own base64 primitives. Name "
    "lengths cover all three padding classes (none/=/==), so the hash "
    "match IS the RFC 4648 §5 conformance check on real data. "
    "Map-side only — zero shuffles at any scale.",
)
def part_b64url_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.encoding import b64url_decode, b64url_encode

    part = _t(spark, sf_dir, "part")
    raw = F.encode(col("p_name"), "UTF-8")
    b64u = b64url_encode(raw)
    return part.select(
        "p_partkey",
        b64u.alias("b64u"),
        F.decode(b64url_decode(b64u), "UTF-8").alias("decoded_name"),
    )


# --------------------------------------------------------------------------
# F12 driver gate: OUI subnet bit unpacking — reference subnet_to_list
# (src/be_db_oui.erl:100-102) splits a 48-bit packed subnet into
# [base:25, mask:23] for every OUI routing row.
# --------------------------------------------------------------------------
@register(
    "oui_subnet_unpack",
    sql="""
    SELECT s_suppkey, packed,
           CAST(packed >> 23 AS INTEGER) AS base,
           CAST(packed & 8388607 AS INTEGER) AS mask
    FROM (SELECT s_suppkey,
                 (s_suppkey * 8191 + 12345) % 281474976710656 AS packed
          FROM supplier) t
    """,
    survey_ops=("F12",),
    doc="48-bit packed OUI subnet unpacking as cross-engine known "
    "vectors (reference subnet_to_list, src/be_db_oui.erl:100-102: "
    "[base:25, mask:23]): deterministic packed subnets derived from "
    "supplier keys, split through functions/encoding."
    "subnet_to_base_mask (shiftright + bitwiseAND struct — pure JVM "
    "column expressions); DuckDB recomputes with >>/& integer "
    "arithmetic. Map-side only — zero shuffles at any scale.",
)
def oui_subnet_unpack(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.encoding import subnet_to_base_mask

    sup = _t(spark, sf_dir, "supplier")
    packed = (col("s_suppkey") * F.lit(8191) + F.lit(12345)) % F.lit(
        281474976710656
    )
    bm = subnet_to_base_mask(col("packed"))
    return (
        sup.select("s_suppkey", packed.alias("packed"))
        .select(
            "s_suppkey",
            "packed",
            bm.getField("base").alias("base"),
            bm.getField("mask").alias("mask"),
        )
    )
