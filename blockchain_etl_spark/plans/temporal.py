"""Temporal analytics plans (round 4): time-series downsampling, point-in-
time state lookup against the SCD2 dimension, and revenue-concentration
reporting.

The reference's temporal surface is block-height bookkeeping
(first_block/last_block inventories, as-of price lookups —
src/be_db_backfill.erl:288-299); these plans generalize it to event time:
OHLC bucket rollups, "state as of T" probes, and top-k share reports.

Determinism: money/values ride integer cents; open/close picks are
max_by/min_by over the (ts, event_id) total order; top-k carries a full
tie-break.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import col

from ..sources.testdata import load_table
from .registry import register


# --------------------------------------------------------------------------
# OHLC downsampling: the chart/storage-tier compaction every time-series
# store needs. ONE hash aggregate (no window sort): open/close are
# min/max over the (ts, event_id, cents) ordering struct.
# --------------------------------------------------------------------------
@register(
    "events_value_downsample",
    sql="""
    WITH e AS (
      SELECT event_type,
             date_trunc('hour', CAST(ts AS TIMESTAMP)) AS bucket_ts,
             CAST(ts AS TIMESTAMP) AS ts, event_id,
             CAST(ROUND(value * 100) AS BIGINT) AS cents
      FROM events),
    r AS (
      SELECT *,
             ROW_NUMBER() OVER (PARTITION BY event_type, bucket_ts
                                ORDER BY ts, event_id) AS rn_a,
             ROW_NUMBER() OVER (PARTITION BY event_type, bucket_ts
                                ORDER BY ts DESC, event_id DESC) AS rn_d
      FROM e)
    SELECT event_type, bucket_ts,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(cents) AS BIGINT) AS sum_cents,
           MIN(cents) AS min_cents,
           MAX(cents) AS max_cents,
           CAST(MAX(CASE WHEN rn_a = 1 THEN cents END) AS BIGINT) AS open_cents,
           CAST(MAX(CASE WHEN rn_d = 1 THEN cents END) AS BIGINT) AS close_cents
    FROM r
    GROUP BY event_type, bucket_ts
    """,
    survey_ops=("A10",),
    doc="OHLC time-series downsampling to hourly buckets per event type: "
    "count/sum/min/max plus open (first by (ts, event_id)) and close "
    "(last) — all in ONE hash aggregate, open/close as min/max over the "
    "ordering struct instead of a window sort. At 100 TB this is the "
    "map-combinable compaction pass that turns a raw event store into a "
    "chartable rollup; integer cents keep both engines exact. The oracle "
    "spells the same picks with row_number windows.",
)
def events_value_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.date_trunc("hour", col("ts")).alias("bucket_ts"),
        "ts",
        "event_id",
        F.round(col("value") * 100).cast("long").alias("cents"),
    )
    return e.groupBy("event_type", "bucket_ts").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("cents").cast("long").alias("sum_cents"),
        F.min("cents").alias("min_cents"),
        F.max("cents").alias("max_cents"),
        F.min(F.struct("ts", "event_id", "cents"))["cents"].alias("open_cents"),
        F.max(F.struct("ts", "event_id", "cents"))["cents"].alias("close_cents"),
    )


# --------------------------------------------------------------------------
# Point-in-time lookup against the SCD2 dimension (plans/quality.py
# user_state_intervals): what state was each purchasing user in ONE HOUR
# BEFORE the purchase? The classic temporal-join shape — implemented as a
# union + ordered window (one user_id shuffle), not an interval join.
# --------------------------------------------------------------------------
@register(
    "events_state_before_purchase",
    sql=None,  # composed from the registered SCD2 SQL post-registration
    survey_ops=("J7",),
    doc="Point-in-time (AS OF) probe into the SCD2 state dimension: for "
    "each purchase event, the state interval active one hour earlier. "
    "Spark shape: state-change rows and probe rows UNION into one frame, "
    "sorted per user by (ts, change-before-probe marker), and "
    "last(state, ignorenulls) carries the active state onto each probe — "
    "ONE user_id shuffle, no interval join, no per-probe subquery. The "
    "oracle uses DuckDB's native ASOF JOIN against the registered "
    "interval SQL, so both the dimension build and the probe semantics "
    "are pinned cross-engine. NULL state = the user did not exist yet.",
)
def events_state_before_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .quality import user_state_intervals

    changes = user_state_intervals(spark, sf_dir).select(
        "user_id",
        col("valid_from").alias("pts"),
        col("event_type").alias("state"),
        F.lit(None).cast("long").alias("event_id"),
        F.lit(0).alias("is_probe"),
        col("valid_from"),
    )
    probes = (
        load_table(spark, sf_dir, "events")
        .filter(col("event_type") == "purchase")
        .select(
            "user_id",
            (col("ts") - F.expr("INTERVAL 1 HOUR")).alias("pts"),
            F.lit(None).cast("string").alias("state"),
            "event_id",
            F.lit(1).alias("is_probe"),
            F.lit(None).cast(dict(load_table(spark, sf_dir, "events").dtypes)["ts"]).alias(
                "valid_from"
            ),
        )
    )
    # changes sort BEFORE probes at equal timestamp: a state starting
    # exactly at the probe instant is already active (ASOF <= semantics)
    w = (
        Window.partitionBy("user_id")
        .orderBy("pts", "is_probe", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = changes.unionByName(probes).select(
        "user_id",
        "pts",
        "event_id",
        "is_probe",
        F.last("state", ignorenulls=True).over(w).alias("state_1h_before"),
        F.last("valid_from", ignorenulls=True).over(w).alias("state_since"),
    )
    return merged.filter(col("is_probe") == 1).select(
        "event_id",
        "user_id",
        (col("pts") + F.expr("INTERVAL 1 HOUR")).alias("purchase_ts"),
        "state_1h_before",
        "state_since",
    )


def _finalize_state_probe_oracle() -> None:
    from . import quality  # noqa: F401  (registers user_state_intervals)
    from .registry import QUERIES

    QUERIES["events_state_before_purchase"].sql = f"""
    WITH iv AS ({QUERIES["user_state_intervals"].sql}),
    changes AS (
      SELECT user_id, valid_from, event_type AS state FROM iv),
    probes AS (
      SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS purchase_ts,
             CAST(ts AS TIMESTAMP) - INTERVAL 1 HOUR AS probe_ts
      FROM events WHERE event_type = 'purchase')
    SELECT p.event_id, p.user_id, p.purchase_ts,
           c.state AS state_1h_before,
           c.valid_from AS state_since
    FROM probes p
    ASOF LEFT JOIN changes c
      ON p.user_id = c.user_id AND c.valid_from <= p.probe_ts
    """


_finalize_state_probe_oracle()


# --------------------------------------------------------------------------
# Revenue concentration: how much of total revenue the top-100 customers
# carry. Top-k via TakeOrderedAndProject (per-partition heads merged on
# the driver), never a global sort.
# --------------------------------------------------------------------------
_TOP_N = 100


@register(
    "revenue_concentration",
    sql=f"""
    WITH rev AS (
      SELECT o_custkey, CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS cents
      FROM orders GROUP BY o_custkey),
    top AS (
      SELECT cents FROM rev ORDER BY cents DESC, o_custkey LIMIT {_TOP_N}),
    t AS (SELECT CAST(SUM(cents) AS BIGINT) AS top_cents,
                 COUNT(*) AS n_top FROM top),
    a AS (SELECT CAST(SUM(cents) AS BIGINT) AS total_cents,
                 COUNT(*) AS n_customers FROM rev)
    SELECT a.n_customers, t.n_top, a.total_cents, t.top_cents,
           CAST(t.top_cents * 1000000 // a.total_cents AS BIGINT) AS top_share_ppm
    FROM a, t
    """,
    survey_ops=("W3",),
    doc=f"Revenue-concentration report: the top-{_TOP_N} customers' share "
    "of total revenue in ppm. Scale shape: one customer-grain aggregate, "
    "then (a) a TakeOrderedAndProject top-k (per-partition heads, no "
    "global sort) and (b) a 1-row total — joined as broadcast singletons. "
    "The Pareto question every revenue/AB dashboard asks, with integer "
    "cents end to end.",
)
def revenue_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    rev = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.sum(F.round(col("o_totalprice") * 100).cast("long")).cast("long").alias("cents"))
    )
    rev = rev.localCheckpoint()  # two consumers: top-k and total
    top = rev.orderBy(col("cents").desc(), col("o_custkey")).limit(_TOP_N)
    t = top.agg(
        F.sum("cents").cast("long").alias("top_cents"), F.count(F.lit(1)).alias("n_top")
    )
    a = rev.agg(
        F.sum("cents").cast("long").alias("total_cents"),
        F.count(F.lit(1)).alias("n_customers"),
    )
    return a.crossJoin(t).select(
        "n_customers",
        "n_top",
        "total_cents",
        "top_cents",
        F.expr("CAST(top_cents * 1000000 div total_cents AS BIGINT)").alias("top_share_ppm"),
    )


# --------------------------------------------------------------------------
# Funnel conversion-latency percentiles: how long signup → first purchase
# takes. Complements events_funnel (WHO converts) with WHEN — the p50/p90
# numbers a growth dashboard actually plots.
# --------------------------------------------------------------------------
@register(
    "events_funnel_latency",
    sql="""
    WITH su AS (
      SELECT user_id, MIN(CAST(ts AS TIMESTAMP)) AS signup_ts
      FROM events WHERE event_type = 'signup' GROUP BY user_id),
    conv AS (
      SELECT su.user_id,
             CAST(date_diff('second', su.signup_ts,
                            MIN(CAST(e.ts AS TIMESTAMP))) AS BIGINT) AS latency_s
      FROM su JOIN events e
        ON e.user_id = su.user_id
       AND e.event_type = 'purchase'
       AND CAST(e.ts AS TIMESTAMP) > su.signup_ts
      GROUP BY su.user_id, su.signup_ts),
    n AS (SELECT COUNT(*) AS n_signups FROM su)
    SELECT n.n_signups,
           COUNT(*) AS n_converted,
           CAST(COUNT(*) * 1000000 // n.n_signups AS BIGINT) AS conversion_ppm,
           CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY latency_s) AS BIGINT)
             AS p50_latency_s,
           CAST(percentile_disc(0.9) WITHIN GROUP (ORDER BY latency_s) AS BIGINT)
             AS p90_latency_s
    FROM conv CROSS JOIN n
    GROUP BY n.n_signups
    """,
    survey_ops=("W4",),
    doc="Signup→purchase conversion latency: per signed-up user, seconds "
    "from FIRST signup to first purchase strictly after it; report "
    "conversion rate (ppm) and exact discrete p50/p90 latency. Scale "
    "shape: two user-grain hash aggregates (min-struct firsts, no window "
    "sorts) sharing the user_id shuffle, then a 1-row percentile reduce "
    "over the converted-users frame (|users| rows, not |events|). "
    "Latencies are integer seconds — cross-engine exact.",
)
def events_funnel_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    su = (
        events.filter(col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("signup_ts"))
    )
    conv = (
        events.filter(col("event_type") == "purchase")
        .join(su, ["user_id"])
        .filter(col("ts") > col("signup_ts"))
        .groupBy("user_id", "signup_ts")
        .agg(F.min("ts").alias("purchase_ts"))
        .select(
            "user_id",
            F.expr("CAST(timestampdiff(SECOND, signup_ts, purchase_ts) AS BIGINT)").alias(
                "latency_s"
            ),
        )
    )
    n = su.agg(F.count(F.lit(1)).alias("n_signups"))
    conv.crossJoin(F.broadcast(n)).createOrReplaceTempView("_efl_conv")
    return spark.sql(
        """
        SELECT n_signups,
               COUNT(*) AS n_converted,
               CAST(COUNT(*) * 1000000 div n_signups AS BIGINT) AS conversion_ppm,
               CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY latency_s) AS BIGINT)
                 AS p50_latency_s,
               CAST(percentile_disc(0.9) WITHIN GROUP (ORDER BY latency_s) AS BIGINT)
                 AS p90_latency_s
        FROM _efl_conv
        GROUP BY n_signups
        """
    )


# --------------------------------------------------------------------------
# Time-weighted average — the TimescaleDB time_weight() shape: a sensor/
# price value holds (LOCF) until the next observation, so its average over
# a span must weight each value by how LONG it held, not how OFTEN it was
# sampled. Irregularly-sampled streams (exactly this events table) make
# the unweighted AVG systematically wrong.
# --------------------------------------------------------------------------
@register(
    "events_time_weighted_avg",
    sql="""
    WITH e AS (
      SELECT user_id, event_id,
             epoch_us(CAST(ts AS TIMESTAMP)) // 1000000 AS es,
             CAST(ROUND(value * 100) AS BIGINT) AS cents
      FROM events),
    seg AS (
      SELECT user_id, cents, es,
             LEAD(es) OVER (PARTITION BY user_id ORDER BY es, event_id) - es
               AS dur_s
      FROM e)
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_segments,
           CAST(SUM(dur_s) AS BIGINT) AS span_s,
           CAST(SUM(cents * dur_s) // SUM(dur_s) AS BIGINT) AS twa_cents,
           CAST(SUM(cents) // COUNT(*) AS BIGINT) AS naive_avg_cents
    FROM seg
    WHERE dur_s IS NOT NULL
    GROUP BY user_id
    HAVING SUM(dur_s) > 0
    """,
    survey_ops=("A10",),
    doc="Per-user time-weighted average of the event value (LOCF "
    "weighting): each observation's cents weight by the SECONDS until the "
    "next observation, divided by the observed span — beside the naive "
    "per-sample average it corrects. ONE user_id shuffle serves the lead "
    "window and the aggregate (sort is per-user, never global; at 100 TB "
    "this is the same partial-sortable shape as the sessionizer). All "
    "integer math — epoch seconds x cents, floor div — so both engines "
    "agree exactly; same-second ties hold for 0 s and drop out of the "
    "weighting identically under the (es, event_id) total order.",
)
def events_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.timeutil import epoch_s

    e = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        epoch_s("ts").alias("es"),
        F.round(col("value") * 100).cast("long").alias("cents"),
    )
    w = Window.partitionBy("user_id").orderBy("es", "event_id")
    seg = e.select(
        "user_id",
        "cents",
        "es",
        (F.lead("es").over(w) - col("es")).alias("dur_s"),
    ).filter(col("dur_s").isNotNull())
    return (
        seg.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_segments"),
            F.sum("dur_s").cast("long").alias("span_s"),
            F.expr("CAST(SUM(cents * dur_s) div SUM(dur_s) AS BIGINT)").alias(
                "twa_cents"
            ),
            F.expr("CAST(SUM(cents) div COUNT(*) AS BIGINT)").alias(
                "naive_avg_cents"
            ),
        )
        .filter(col("span_s") > 0)
    )


# --------------------------------------------------------------------------
# Forecast-baseline evaluation: seasonal-naive (same hour yesterday) vs
# naive (previous hour) prediction of the hourly event count, scored as
# mean absolute error — the sanity loop before any forecasting model
# ships: a model that can't beat the seasonal-naive MAE is noise. Counts
# are integers, so the whole metric is integer arithmetic (MAE in ppm).
# --------------------------------------------------------------------------
@register(
    "events_seasonal_baseline_eval",
    sql="""
    WITH hc AS (
      SELECT event_type, date_trunc('hour', CAST(ts AS TIMESTAMP)) AS h,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2),
    scored AS (
      SELECT 'seasonal_24h' AS model, a.event_type,
             ABS(a.n - p.n) AS abs_err
      FROM hc a JOIN hc p
        ON p.event_type = a.event_type AND p.h = a.h - INTERVAL 24 HOUR
      UNION ALL
      SELECT 'naive_1h', a.event_type, ABS(a.n - p.n)
      FROM hc a JOIN hc p
        ON p.event_type = a.event_type AND p.h = a.h - INTERVAL 1 HOUR)
    SELECT model, event_type,
           CAST(COUNT(*) AS BIGINT) AS n_hours,
           CAST(SUM(abs_err) AS BIGINT) AS sum_abs_err,
           CAST(SUM(abs_err) * 1000000 // COUNT(*) AS BIGINT) AS mae_ppm
    FROM scored
    GROUP BY model, event_type
    """,
    survey_ops=(),
    doc="Forecast-baseline eval: per event type, hourly counts predicted "
    "by seasonal-naive (h-24) and naive (h-1) baselines, scored as mean "
    "absolute error in ppm over the hours where both actual and predicted "
    "buckets exist (absent buckets produce no eval case — a gap, not a "
    "zero). Scale shape: one map-combinable hourly aggregate over the "
    "fact rows, then two self-equi-joins on (type, hour) at bucket grain "
    "— |types x hours| rows, never fact rows. abs() on a subtraction of "
    "counts; no division until the final ppm reduce.",
)
def events_seasonal_baseline_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    hc = events.groupBy(
        "event_type", F.date_trunc("hour", col("ts")).alias("h")
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    hc = hc.localCheckpoint()  # consumers: actual + two prediction sides
    scored = None
    for model, hours in (("seasonal_24h", 24), ("naive_1h", 1)):
        pred = hc.select(
            "event_type",
            (col("h") + F.expr(f"INTERVAL {hours} HOURS")).alias("h"),
            col("n").alias("pn"),
        )
        part = (
            hc.join(pred, ["event_type", "h"])
            .select(
                F.lit(model).alias("model"),
                "event_type",
                F.abs(col("n") - col("pn")).alias("abs_err"),
            )
        )
        scored = part if scored is None else scored.unionByName(part)
    return scored.groupBy("model", "event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_hours"),
        F.sum("abs_err").cast("long").alias("sum_abs_err"),
        F.expr(
            "CAST(SUM(abs_err) * 1000000 div COUNT(*) AS BIGINT)"
        ).alias("mae_ppm"),
    )


# --------------------------------------------------------------------------
# T7/T8 driver gate: the gateway status state machine as a batch twin —
# CASE over joined state, the classification the reference recomputes
# per block for every gateway (src/be_db_gateway_status.erl:247-281).
# --------------------------------------------------------------------------
@register(
    "gateway_online_classification",
    sql="""
    WITH h AS (SELECT MAX(event_id) AS h FROM events),
    st AS (
      SELECT user_id AS gateway,
             COALESCE(MAX(CASE WHEN event_type = 'signup' AND value >= 140.0
                                THEN event_id END), 0) AS first_block,
             MAX(CASE WHEN event_type = 'error' THEN event_id END)
               AS last_poc_challenge,
             CAST(COUNT(*) AS BIGINT) AS n_events
      FROM events GROUP BY user_id)
    SELECT st.gateway, c.c_mktsegment AS segment, st.first_block,
           st.last_poc_challenge, st.n_events,
           CASE WHEN st.first_block >= h.h - (h.h // 64)
                  OR (st.last_poc_challenge IS NOT NULL
                      AND st.last_poc_challenge >= h.h - (h.h // 16))
                THEN 'online' ELSE 'offline' END AS online
    FROM st JOIN customer c ON c.c_custkey = st.gateway CROSS JOIN h
    """,
    survey_ops=("T7", "T8", "J1"),
    doc="Gateway online/offline status machine as a batch twin "
    "(src/be_db_gateway_status.erl:247-281: online iff recently "
    "added/asserted OR PoC-active within the interactivity window), "
    "driven through streaming/state.classify_gateway_online — the SAME "
    "CASE the streaming classifier applies, here over JOINED state: "
    "per-gateway liveness aggregated from the event log (latest "
    "high-stake signup = add/assert height; latest error event = last "
    "PoC challenge) joined to the customer inventory for metadata, the "
    "reference's inventory-JOIN-status shape. The height clock is one "
    "bounded scalar read (max event_id — the reference's "
    "current-height lookup); thresholds derive from it so the "
    "classification is scale-free. At 100 TB: one hash aggregate over "
    "the event log + a key join against the gateway inventory — no "
    "window sort, no driver state beyond the clock scalar.",
)
def gateway_online_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.state import classify_gateway_online

    ev = load_table(spark, sf_dir, "events")
    cust = load_table(spark, sf_dir, "customer")
    # the classifier's current-height input: one bounded scalar read,
    # same legitimacy class as a stream's groupState clock
    height = ev.agg(F.max("event_id")).collect()[0][0]
    state = ev.groupBy(col("user_id").alias("gateway")).agg(
        F.coalesce(
            F.max(
                F.when(
                    (col("event_type") == "signup") & (col("value") >= 140.0),
                    col("event_id"),
                )
            ),
            F.lit(0).cast("long"),
        ).alias("first_block"),
        F.max(
            F.when(col("event_type") == "error", col("event_id"))
        ).alias("last_poc_challenge"),
        F.count(F.lit(1)).cast("long").alias("n_events"),
    )
    gw = state.join(
        cust.select(
            col("c_custkey").alias("gateway"),
            col("c_mktsegment").alias("segment"),
        ),
        "gateway",
    )
    return classify_gateway_online(
        gw,
        height,
        inactive_blocks=height // 16,
        recently_added_blocks=height // 64,
    ).select(
        "gateway", "segment", "first_block", "last_poc_challenge",
        "n_events", "online",
    )
