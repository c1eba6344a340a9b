"""Backfill jobs — SURVEY §3.3: the reference's CLI-driven set-based
repairs (`be_db_backfill.erl`), re-expressed as plain batch DataFrame jobs
over the ingested history tables. The reference throttles these in
5000-block batches with sleeps to protect Postgres
(src/be_cli_backfill.erl:134); on Spark the whole repair is one job and
partition parallelism replaces the hand batching.

Each function takes DataFrames (not paths) so it runs identically on
`BlockIngest.read_table` output, snapshots, or test fixtures.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import col

from .asof import asof_join

_J = F.get_json_object


def backfill_gateway_payer(inventory: DataFrame, actors: DataFrame, txns: DataFrame) -> DataFrame:
    """J5 payer derivation (src/be_db_backfill.erl:338-356; trigger form
    migrations/1627043667-gateway_payer.sql:7-22): for each gateway, find
    the transaction that first added it (actor role 'gateway' at its
    first_block) and project that txn's payer, falling back to owner when
    the payer field is absent/empty.

    Plan shape: actors filtered to role='gateway' then equi-joined on
    (actor, block) — both sides shuffle once on the composite key; the txn
    hash join prunes to the add-transaction only.
    """
    first_txn = actors.filter(col("actor_role") == "gateway").select(
        col("actor").alias("address"),
        col("block").alias("first_block"),
        col("transaction_hash").alias("hash"),
    )
    payer = F.coalesce(
        F.nullif(_J(col("fields"), "$.payer"), F.lit("")),
        _J(col("fields"), "$.owner"),
    )
    add_txns = txns.select("hash", payer.alias("payer"))
    return (
        inventory.join(first_txn, ["address", "first_block"], "left")
        .join(add_txns, ["hash"], "left")
        .drop("hash")
    )


def backfill_missing_actors(actors: DataFrame, txns: DataFrame, derive) -> DataFrame:
    """The receipts_challenger shape (src/be_db_backfill.erl:22-43): some
    actor rows were never written; re-derive the full actor set from stored
    transaction JSON and insert only what's missing (the reference's
    INSERT ... SELECT ... ON CONFLICT DO NOTHING).

    ``derive`` is the actor-extraction transform (operators/actors.py
    extract_actors); the repair is derived ∖ existing (left_anti on the
    full natural key) unioned back — at scale the anti-join shuffles on the
    same key the insert is idempotent over.
    """
    derived = derive(txns)
    missing = derived.join(
        actors,
        ["block", "transaction_hash", "actor", "actor_role"],
        "left_anti",
    )
    return actors.unionByName(missing)


def backfill_burn_prices(dc_burns: DataFrame, oracle_prices: DataFrame) -> DataFrame:
    """As-of price backfill (src/be_db_backfill.erl:282-332): attach to
    every DC burn the oracle price in effect at its block (greatest
    price-block <= burn-block; burns before the first price get NULL).
    Broadcast interval join — the burn side never shuffles (J7).
    """
    prices = (
        oracle_prices.groupBy(col("block").alias("price_block"))
        .agg(F.max("price").alias("oracle_price"))
    )
    return asof_join(
        dc_burns, prices, left_on="block", right_on="price_block", how="left"
    ).drop("price_block")
