"""Actor-activity payload filter — SURVEY §2 P8: the reference's
``txn_filter_actor_activity(actor, type, fields)`` plpgsql function
(final form migrations/1628075186-state_channel_close_v1_activity_coalesce
.sql:4-27; evolution 1585355922 → 1585954782 → 1617917369 → 1618370855)
re-expressed as pure column expressions over the JSON payload:

- rewards_v1/v2: subset ``rewards`` to entries where account/gateway = actor
- state_channel_close_v1: subset ``state_channel.summaries`` to entries
  where owner/client = actor, coalescing empty to ``[]``
- payment_v2: payer sees the full payload; a payee sees only their payments
- consensus_group_v1: strip the bulky ``proof`` field
- every other type: payload unchanged

The rewrite uses higher-order ``filter`` over typed structs + struct
rebuild — no UDF, single projection. Typical use joins transaction_actors
to transactions and applies this per (actor, txn) row — the reference's
account-activity API shape.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import col

from ..sources.blockchain import FIELDS_SCHEMAS

# JSON round-trip note: the filtered payload is re-serialized with the same
# key set the typed schema declares, so downstream get_json_object paths
# keep working; unknown keys of other txn types pass through untouched
# because those branches return the original string.


def _filter_rewards(fields: Column, actor: Column) -> Column:
    parsed = F.from_json(fields, FIELDS_SCHEMAS["rewards_v1"])
    kept = F.filter(
        parsed["rewards"],
        lambda r: (r["account"] == actor) | (r["gateway"] == actor),
    )
    return F.to_json(parsed.withField("rewards", kept))


def _filter_sc_close(fields: Column, actor: Column) -> Column:
    parsed = F.from_json(fields, FIELDS_SCHEMAS["state_channel_close_v1"])
    kept = F.coalesce(
        F.filter(
            parsed["state_channel"]["summaries"],
            lambda s: (s["owner"] == actor) | (s["client"] == actor),
        ),
        F.expr(
            "CAST(array() AS array<struct<client:string,owner:string,"
            "num_packets:bigint,num_dcs:bigint,location:string>>)"
        ),
    )
    return F.to_json(
        parsed.withField("state_channel", parsed["state_channel"].withField("summaries", kept))
    )


def _filter_payment_v2(fields: Column, actor: Column) -> Column:
    parsed = F.from_json(fields, FIELDS_SCHEMAS["payment_v2"])
    kept = F.filter(parsed["payments"], lambda p: p["payee"] == actor)
    return F.when(parsed["payer"] == actor, fields).otherwise(
        F.to_json(parsed.withField("payments", kept))
    )


def _strip_proof(fields: Column) -> Column:
    parsed = F.from_json(fields, FIELDS_SCHEMAS["consensus_group_v1"])
    return F.to_json(parsed.dropFields("proof"))


def filter_actor_activity(fields: Column, txn_type: Column, actor: Column) -> Column:
    """Column form of txn_filter_actor_activity(actor, type, fields)."""
    return (
        F.when(txn_type.isin("rewards_v1", "rewards_v2"), _filter_rewards(fields, actor))
        .when(txn_type == "state_channel_close_v1", _filter_sc_close(fields, actor))
        .when(txn_type == "payment_v2", _filter_payment_v2(fields, actor))
        .when(txn_type == "consensus_group_v1", _strip_proof(fields))
        .otherwise(fields)
    )


def actor_activity(transactions: DataFrame, actors: DataFrame) -> DataFrame:
    """The account-activity query shape: transaction_actors ⋈ transactions
    with per-actor payload filtering — one row per (actor, txn) with the
    payload subset to that actor's view.

    Scale shape: both sides shuffle on transaction_hash (the join key);
    the payload rewrite is a pure projection after the join, inside
    whole-stage codegen except the from_json/to_json kernels.
    """
    t = transactions.select(
        col("hash").alias("transaction_hash"), "block", "time", "type", "fields"
    )
    a = actors.select("transaction_hash", "actor", "actor_role")
    joined = a.join(t, "transaction_hash")
    return joined.select(
        "actor",
        "actor_role",
        "block",
        "time",
        "transaction_hash",
        "type",
        filter_actor_activity(col("fields"), col("type"), col("actor")).alias("fields"),
    )
