"""Event-time streaming operators — SURVEY §2 T2/T3/T4 demos.

The blockchain ingest path needs none of this (the chain is totally ordered,
SURVEY T2), but the engine exposes the standard event-time toolkit for the
training-data/event side: watermarked tumbling-window aggregation (late data
dropped once the watermark passes) and an ``applyInPandasWithState`` custom
stateful operator (running per-key totals across microbatches — the
streaming form of the reference's in-handler counters, T4a).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

EVENT_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
    ]
)


def windowed_event_counts(
    events: DataFrame, window: str = "1 hour", watermark: str = "1 hour"
) -> DataFrame:
    """Tumbling-window counts with a watermark: late rows older than
    ``max(event time seen) - watermark`` are dropped, bounding state."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
        )
    )


def sessionized_event_counts(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "1 hour"
) -> DataFrame:
    """Session-window aggregation: per-user sessions close after ``gap`` of
    inactivity; the watermark bounds open-session state. Streaming twin of
    the batch ``events_sessionized`` plan (plans/pipeline.py) — same gap
    semantics, with Spark's native session_window instead of lag+running-sum
    (merge-able session state survives out-of-order arrival within the
    watermark)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


RUNNING_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("running_events", LongType()),
        StructField("running_value", DoubleType()),
    ]
)

_STATE_SCHEMA = StructType(
    [StructField("n", LongType()), StructField("total", DoubleType())]
)


def _running_totals(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (n, total) = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [key[0]], "running_events": [n], "running_value": [total]}
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """Custom stateful operator: per-user running event count and value sum
    carried across microbatches in explicit group state — the
    ``applyInPandasWithState`` form of the reference's handler-state
    counters (src/be_db_stats.erl:63-99)."""
    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            _running_totals,
            outputStructType=RUNNING_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def deduped_event_stream(
    events: DataFrame, keys: "list[str] | None" = None, watermark: str = "1 hour"
) -> DataFrame:
    """Streaming exactly-once dedup: drop re-deliveries of the same event
    within the watermark horizon (dropDuplicatesWithinWatermark — state is
    EVICTED once the watermark passes, unlike dropDuplicates whose state
    grows without bound). This is the ingest-side guard a training-data
    event pipeline puts in front of windowed aggregation when the source
    is at-least-once (a crawler retry, a Kafka redelivery): the chain
    ingest doesn't need it (totally ordered, idempotent writes) but the
    event plane does. Keys default to the event identity column."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        keys or ["event_id"]
    )


def purchase_attribution_stream(
    clicks: DataFrame,
    purchases: DataFrame,
    horizon_s: int = 3600,
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream interval join (T3/T4): attribute each purchase to the
    click(s) by the same user within the preceding ``horizon_s`` seconds.

    Both inputs are watermarked so Spark can BOUND the join state: a
    buffered click is evicted once the purchase-side watermark passes
    ``click.ts + horizon`` (the interval condition gives the engine the
    eviction rule — an unbounded-condition stream join would buffer
    forever). Inner join: unmatched purchases are droppable here; the
    attribution report is a separate batch query.

    Scale shape: state is partitioned by the join key (user_id), so the
    operator scales horizontally like any keyed state; the watermark, not
    the data volume, bounds per-key memory.
    """
    c = (
        clicks.withWatermark("ts", watermark)
        .select(
            F.col("user_id").alias("c_user"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("click_ts"),
        )
    )
    p = (
        purchases.withWatermark("ts", watermark)
        .select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("purchase_ts"),
            F.col("value").alias("amount"),
        )
    )
    return c.join(
        p,
        F.expr(
            f"""
            c_user = p_user AND
            purchase_ts >= click_ts AND
            purchase_ts <= click_ts + INTERVAL {horizon_s} SECONDS
            """
        ),
    ).select(
        F.col("p_user").alias("user_id"),
        "purchase_id",
        "purchase_ts",
        "click_id",
        "click_ts",
        "amount",
    )


# ---- streaming outlier detection (T4 + the events_user_outliers twin) ----

_OUTLIER_STATE_SCHEMA = StructType(
    [
        StructField("n", LongType()),
        StructField("s", LongType()),
        StructField("q", LongType()),
    ]
)

OUTLIER_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("event_id", LongType()),
        StructField("v_fp", LongType()),
        StructField("n_obs", LongType()),
    ]
)

_OUTLIER_MIN_N = 30


def _to_fp(values) -> "pd.Series":
    """round(value*10000) half-away-from-zero in int64 — the same rounding
    as the batch query's F.round (np.round is half-even; don't use it)."""
    import numpy as np

    p = values.to_numpy(dtype="float64") * 10000.0
    absp = np.abs(p)
    fl = np.floor(absp)
    r = (fl + (absp - fl >= 0.5)).astype("int64")
    return pd.Series(np.where(p < 0, -r, r))


def _outlier_flags(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
    import numpy as np

    (user_id,) = key
    n, s, q = state.get if state.exists else (0, 0, 0)
    batch = pd.concat(list(pdfs), ignore_index=True)
    vfp = _to_fp(batch["value"])
    n += len(vfp)
    s += int(vfp.sum())
    q += int((vfp.astype(object) * vfp.astype(object)).sum())  # no int64 overflow
    state.update((n, s, q))
    if n < _OUTLIER_MIN_N:
        return
    x = vfp.to_numpy(dtype="int64")
    dev = n * x - s
    flagged = (dev.astype(object) * dev.astype(object)) > 4 * (n * q - s * s)
    hits = batch.loc[np.asarray(flagged, dtype=bool)]
    if len(hits):
        yield pd.DataFrame(
            {
                "user_id": np.full(len(hits), user_id, dtype="int64"),
                "event_id": hits["event_id"].to_numpy(dtype="int64"),
                "v_fp": vfp[np.asarray(flagged, dtype=bool)].to_numpy(dtype="int64"),
                "n_obs": np.full(len(hits), n, dtype="int64"),
            }
        )


def running_user_outliers(events: DataFrame) -> DataFrame:
    """Online 2-sigma outlier detection — the streaming twin of the batch
    query ``events_user_outliers``: per-user (n, Σx, Σx²) carried in
    explicit group state (3 integers per key, O(keys) not O(rows)), each
    microbatch's rows tested against the cumulative statistics with the
    same cross-multiplied int64 identity (no float variance, no sqrt).

    Semantics are ONLINE: a row is judged against the statistics observed
    up to and including its own batch — with everything in one batch this
    equals the batch query; across batches early data is judged with less
    context (that is what streaming anomaly detection means, and why the
    batch recompute remains the reconciliation path per SURVEY §7.1)."""
    return events.groupBy("user_id").applyInPandasWithState(
        _outlier_flags,
        outputStructType=OUTLIER_SCHEMA,
        stateStructType=_OUTLIER_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


DOC_STREAM_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("text", StringType()),
    ]
)


def windowed_trending_terms(
    docs: DataFrame,
    window_duration: str = "10 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming trending-terms counts: tokenize each document map-side
    (JVM HOF explode — no Python), then a watermarked tumbling-window count
    per (window, word). Append mode emits a window's counts exactly once
    when the watermark closes it; late documents past the watermark are
    dropped like any other windowed aggregate.

    Scale shape: the explode multiplies rows map-side before ONE shuffle on
    (window, word); state is one count per (open window, word) — bounded by
    the watermark horizon, not the stream length."""
    words = docs.select(
        "ts",
        F.explode(F.expr("filter(split(text, ' '), w -> length(w) > 0)")).alias("word"),
    )
    return (
        words.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window_duration).alias("w"), "word")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("window_start"), "word", "n")
    )


def top_terms_per_window(counts: DataFrame, k: int = 3) -> DataFrame:
    """Per-window top-k over FINALIZED trending-term counts (the append-mode
    sink): rank-within-window is not incrementally maintainable under late
    data, so the ranking pass runs on closed windows only — a bounded
    window function per (window_start), k·|windows| output rows."""
    w = Window.partitionBy("window_start").orderBy(F.col("n").desc(), F.col("word"))
    return (
        counts.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )


# ---------------------------------------------------------------------------
# Streaming SCD2 maintenance — the incremental twin of the batch
# user_state_intervals plan (plans/quality.py): per-user state intervals
# maintained across microbatches with 3 scalars of state per key
# (current state, since-ts, since-event-id). A CLOSED interval is emitted
# exactly once, when the state actually changes (append output mode); the
# open interval lives in group state until its closing change arrives.
# Assumes per-user in-order delivery (the chain-ingest ordering contract);
# out-of-order sources must run through deduped/watermarked reordering
# first.
# ---------------------------------------------------------------------------
SCD2_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("valid_from", TimestampType()),
        StructField("valid_to", TimestampType()),
    ]
)

_SCD2_STATE = StructType(
    [
        StructField("cur", StringType()),
        StructField("since_us", LongType()),
        StructField("since_eid", LongType()),
    ]
)


def _scd2_fold(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    cur, since_us, since_eid = state.get if state.exists else (None, None, None)
    out = {"user_id": [], "event_type": [], "valid_from": [], "valid_to": []}
    for pdf in pdfs:
        pdf = pdf.sort_values(["ts", "event_id"])
        for ts, eid, et in zip(pdf["ts"], pdf["event_id"], pdf["event_type"]):
            ts_us = int(ts.value // 1000)  # pandas ns → µs
            if cur is None:
                cur, since_us, since_eid = et, ts_us, int(eid)
            elif et != cur:
                out["user_id"].append(key[0])
                out["event_type"].append(cur)
                out["valid_from"].append(pd.Timestamp(since_us * 1000))
                out["valid_to"].append(pd.Timestamp(ts_us * 1000))
                cur, since_us, since_eid = et, ts_us, int(eid)
    state.update((cur, since_us, since_eid))
    yield pd.DataFrame(out)


def user_state_scd2_stream(events: DataFrame) -> DataFrame:
    """events stream → closed SCD2 intervals, append-once semantics."""
    return events.groupBy("user_id").applyInPandasWithState(
        _scd2_fold,
        outputStructType=SCD2_SCHEMA,
        stateStructType=_SCD2_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
