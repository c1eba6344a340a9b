"""Periodic micro-jobs — SURVEY §2 T6/S5/T5: the reference's timer-driven
workers re-expressed as scheduled batch pipelines (each run is one
deterministic dataframe job; the scheduler is external — cron /
Trigger.ProcessingTime — not part of query semantics).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import col
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

from .state import classify_gateway_online


def stalest_rows(
    inventory: DataFrame,
    status: DataFrame,
    key: str,
    limit: int,
) -> DataFrame:
    """T6/W3/J1 scheduling scan (src/be_db_gateway_status.erl:67-83): left
    join status onto inventory, stalest-N by coalesce(updated_at, epoch 0)
    with the key as tie-break. TakeOrderedAndProject — no global sort."""
    s = status.select(
        col(key).alias("__sk"), col("updated_at").alias("__updated_at")
    )
    return (
        inventory.join(s, inventory[key] == s["__sk"], "left")
        .withColumn(
            "__staleness",
            F.coalesce(col("__updated_at"), F.to_timestamp(F.lit(0))),
        )
        .orderBy(col("__staleness").asc(), col(key).asc())
        .limit(limit)
        .drop("__sk", "__updated_at", "__staleness")
    )


def refresh_gateway_status(
    inventory: DataFrame,
    status: DataFrame,
    current_height: int,
    rate: int,
) -> DataFrame:
    """One status-refresh tick (src/be_db_gateway_status.erl:161-241):
    stalest N rows → classify online/offline → rows to MERGE into status.
    ``rate`` mirrors the adaptive count/(10·50) cap (BASELINE.md)."""
    batch = stalest_rows(inventory, status, "address", rate)
    return classify_gateway_online(batch, current_height).select(
        "address", "online"
    )


# ---------------------------------------------------------------------------
# S5 geocoder enrichment: locations missing from the lookup table are
# reverse-geocoded in Arrow batches. The HTTP provider is STUBBED with a
# deterministic fake (same shape as src/be_db_geocoder.erl:227-313's parsed
# address components); swapping in a real client changes only _fake_geocode.
# ---------------------------------------------------------------------------

GEOCODE_SCHEMA = StructType(
    [
        StructField("location", StringType()),
        StructField("long_city", StringType()),
        StructField("short_city", StringType()),
        StructField("long_country", StringType()),
        StructField("short_country", StringType()),
    ]
)

_CITIES = ("rivertown", "lakeside", "hillcrest", "meadowvale", "stonebridge")
_COUNTRIES = (("united states", "US"), ("germany", "DE"), ("japan", "JP"))


def _fake_geocode(h3_index: str) -> tuple[str, str, str, str]:
    v = int(h3_index[-6:], 16) if h3_index else 0
    city = _CITIES[v % len(_CITIES)]
    country, cc = _COUNTRIES[v % len(_COUNTRIES)]
    return city, city[:4], country, cc


def geocode_missing_locations(
    gateways: DataFrame,
    locations: DataFrame,
    limit: int = 100,
    provider: "callable | None" = None,
) -> DataFrame:
    """S5/J6: pick distinct gateway locations with no `locations` row
    (NOT EXISTS, src/be_db_geocoder.erl:33) and enrich them in one
    mapInPandas pass (≤``limit`` per tick, mirroring the poll batch).

    PROVIDER INTERFACE: ``provider(h3_index: str) -> (long_city,
    short_city, long_country, short_country)`` — called once per missing
    location inside the Arrow batch, so a real deployment plugs in an HTTP
    reverse-geocoder (the reference polls OpenStreetMap Nominatim,
    src/be_db_geocoder.erl:227-313) and gets batching, retry isolation,
    and the ≤limit/tick rate cap from this dataflow for free. The default
    is a deterministic stub (this sandbox has no network); the anti-join +
    mapInPandas + MERGE pipeline around it is the production path."""
    provider = provider or _fake_geocode
    missing = (
        gateways.select("location")
        .filter(col("location").isNotNull())
        .distinct()
        .join(locations.select("location"), "location", "left_anti")
        .orderBy("location")  # deterministic tick contents
        .limit(limit)
    )

    def geocode(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            geo = [provider(loc) for loc in pdf["location"]]
            yield pd.DataFrame(
                {
                    "location": pdf["location"],
                    "long_city": [g[0] for g in geo],
                    "short_city": [g[1] for g in geo],
                    "long_country": [g[2] for g in geo],
                    "short_country": [g[3] for g in geo],
                }
            )

    return missing.mapInPandas(geocode, schema=GEOCODE_SCHEMA)


# ---------------------------------------------------------------------------
# T5 commit-hook CDC: ledger keys changed without block-txn evidence arrive
# as an auxiliary changed-keys input and are unioned with the actor-derived
# key set before the ledger state join (J8).
# ---------------------------------------------------------------------------

def changed_keys_union(
    actor_keys: DataFrame, ledger_changes: DataFrame, block: int | None = None
) -> DataFrame:
    """Union of actor-derived keys and commit-hook changed keys
    (src/be_db_account.erl:128-145 "unhandled" keys; config/sys.config:71-82).

    Both sides reduce to (block, key); output is distinct — the per-block
    key set the reference feeds its ledger lookups."""
    a = actor_keys.select("block", col("actor").alias("key"))
    c = ledger_changes.select("block", "key")
    out = a.unionByName(c).distinct()
    if block is not None:
        out = out.filter(col("block") == block)
    return out
