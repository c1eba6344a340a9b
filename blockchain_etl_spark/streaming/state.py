"""Stateful streaming operators — SURVEY §2 T4/T7/T8 re-expressed as
batch-recomputable pipelines (the engine's design rule: state is an
optimization, the batch recompute is the semantics — SURVEY §7.1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import col

# defaults from the reference (src/be_db_gateway_status.erl:36-46)
HOTSPOT_INACTIVE_BLOCKS = 3600
HOTSPOT_RECENTLY_ADDED_BLOCKS = 60 * 48
VALIDATOR_HEARTBEAT_GRACE = 10


def oracle_price_changes(prices: DataFrame) -> DataFrame:
    """T4b change detection (src/be_db_oracle_price.erl:85-99: unchanged
    price → no-op): keep only rows whose price differs from the previous
    height's price. Batch form of the streaming keep-last-price state."""
    w = Window.orderBy("block")
    return (
        prices.withColumn("prev_price", F.lag("price").over(w))
        .filter(col("prev_price").isNull() | (col("prev_price") != col("price")))
        .drop("prev_price")
    )


def pending_txn_transitions(pending: DataFrame, results: DataFrame) -> DataFrame:
    """T7 status machine (src/be_db_pending_txn.erl:133-227;
    migrations/1580305069:13-17): received→pending→cleared/failed.

    ``results(hash, outcome, failed_reason)`` carries submit outcomes;
    rows without a result keep their status (MERGE whenMatchedUpdate with
    coalesce partial-update semantics, J9)."""
    valid = {
        "received": {"pending", "failed"},
        "pending": {"cleared", "failed"},
    }
    # transitions table is tiny and static → broadcast map via when() chain
    r = results.select(
        col("hash").alias("r_hash"),
        col("outcome").alias("r_outcome"),
        col("failed_reason").alias("r_reason"),
    )
    joined = pending.join(r, pending["hash"] == r["r_hash"], "left")
    ok_received = (col("status") == "received") & col("r_outcome").isin(
        *valid["received"]
    )
    ok_pending = (col("status") == "pending") & col("r_outcome").isin(*valid["pending"])
    apply_txn = col("r_outcome").isNotNull() & (ok_received | ok_pending)
    return joined.select(
        *[c for c in pending.columns if c not in ("status", "failed_reason")],
        F.when(apply_txn, col("r_outcome")).otherwise(col("status")).alias("status"),
        F.when(apply_txn & (col("r_outcome") == "failed"), col("r_reason"))
        .otherwise(col("failed_reason"))
        .alias("failed_reason"),
    )


def classify_gateway_online(
    gateways: DataFrame,
    current_height: int,
    inactive_blocks: int = HOTSPOT_INACTIVE_BLOCKS,
    recently_added_blocks: int = HOTSPOT_RECENTLY_ADDED_BLOCKS,
) -> DataFrame:
    """T8 gateway online/offline (src/be_db_gateway_status.erl:247-281):
    online iff recently added (first_block within 60·48 blocks) or active
    within hip17_interactivity_blocks."""
    recently_added = col("first_block") >= F.lit(current_height - recently_added_blocks)
    active = col("last_poc_challenge").isNotNull() & (
        col("last_poc_challenge") >= F.lit(current_height - inactive_blocks)
    )
    return gateways.withColumn(
        "online",
        F.when(recently_added | active, F.lit("online")).otherwise(F.lit("offline")),
    )


def classify_validator_online(
    validators: DataFrame,
    current_height: int,
    heartbeat_interval: int,
    grace: int = VALIDATOR_HEARTBEAT_GRACE,
) -> DataFrame:
    """T8 validator liveness (src/be_db_validator_status.erl:229-245):
    online iff last_heartbeat + interval + grace >= height."""
    return validators.withColumn(
        "online",
        F.when(
            col("last_heartbeat") + F.lit(heartbeat_interval + grace)
            >= F.lit(current_height),
            F.lit("online"),
        ).otherwise(F.lit("offline")),
    )
