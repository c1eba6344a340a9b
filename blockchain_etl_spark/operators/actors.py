"""Actor extraction (SURVEY §2 P4) — the reference's central indexing
operator: per-transaction-type pattern match producing (role, actor) pairs,
deduplicated, one output row per (block, txn, actor, role).

Reference: /root/reference/src/be_db_txn_actor.erl:107-453 (`to_actors/2`,
one clause per txn type; dedup via lists:usort at :133-137). This module is
table-driven instead of 30 code branches: each txn type maps to a list of
extractor expressions over the JSON `fields` payload; the whole operator
compiles to ONE Catalyst CASE expression yielding array<struct<role,actor>>
that is exploded and deduplicated — a single scan, no UDFs, fully
whole-stage-codegen, shuffling only for the final distinct.

rewards_v2 is treated as the rewards_v1 shape: the reference expands v2
rewards through consensus metadata + ledger owner lookups
(src/be_db_txn_actor.erl:276-326, via be_db_reward:calculate_rewards_
metadata) which SURVEY §7.4 scopes out — expanded rewards arrive as input.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _s(role: str, path: str) -> str:
    """Scalar actor at a JSON path (skipped when null/empty)."""
    v = f"nullif(get_json_object(fields, '$.{path}'), '')"
    return f"IF({v} IS NOT NULL, array(struct('{role}' AS role, {v} AS actor)), array())"


def _sd(role: str, path: str, default_path: str) -> str:
    """Scalar actor with default: payer falling back to owner when unset
    (src/be_db_txn_actor.erl:150-162 add_gateway_v1 payer/owner clause)."""
    v = (
        f"coalesce(nullif(get_json_object(fields, '$.{path}'), ''), "
        f"nullif(get_json_object(fields, '$.{default_path}'), ''))"
    )
    return f"IF({v} IS NOT NULL, array(struct('{role}' AS role, {v} AS actor)), array())"


def _arr_str(role: str, path: str) -> str:
    """One actor per element of a JSON array of strings (e.g. members)."""
    arr = f"from_json(get_json_object(fields, '$.{path}'), 'array<string>')"
    return (
        f"coalesce(transform({arr}, a -> struct('{role}' AS role, a AS actor)), array())"
    )


def _arr_field(role: str, path: str, field: str) -> str:
    """One actor per element.field of a JSON array of objects."""
    arr = (
        f"from_json(get_json_object(fields, '$.{path}'), "
        f"'array<struct<{field}:string>>')"
    )
    return (
        f"coalesce(transform({arr}, a -> struct('{role}' AS role, a.{field} AS actor)),"
        f" array())"
    )


# poc_receipts path: challengees from each path element, witnesses from each
# element's witness list (src/be_db_txn_actor.erl:200-226).
_POC_PATH = (
    "from_json(get_json_object(fields, '$.path'), "
    "'array<struct<challengee:string,witnesses:array<struct<gateway:string>>>>')"
)
_POC_CHALLENGEES = (
    f"coalesce(transform({_POC_PATH}, p -> struct('challengee' AS role, "
    f"p.challengee AS actor)), array())"
)
_POC_WITNESSES = (
    f"coalesce(flatten(transform({_POC_PATH}, p -> "
    f"coalesce(transform(p.witnesses, w -> struct('witness' AS role, "
    f"w.gateway AS actor)), array()))), array())"
)

# state_channel_close_v1: closer is sc_closer+payee, owner from the nested
# state_channel object, one packet_receiver per summary client
# (src/be_db_txn_actor.erl:350-374).
_SC_SUMMARIES = (
    "from_json(get_json_object(fields, '$.state_channel.summaries'), "
    "'array<struct<client:string>>')"
)

# type -> list of array<struct<role,actor>> expressions, concatenated.
# Each entry cites its reference clause in src/be_db_txn_actor.erl.
ACTOR_RULES: dict[str, list[str]] = {
    # :112-115
    "coinbase_v1": [_s("payee", "payee")],
    "security_coinbase_v1": [_s("payee", "payee")],
    # :116-121
    "oui_v1": [_s("owner", "owner"), _s("payer", "payer"), _arr_str("router", "addresses")],
    # :122-126
    "gen_gateway_v1": [_s("gateway", "gateway"), _s("owner", "owner")],
    # :127-135 (owner is also the fee payer)
    "routing_v1": [
        _s("owner", "owner"),
        _s("payer", "owner"),
        _arr_str("router", "action.addresses"),
    ],
    # :136-141
    "payment_v1": [_s("payer", "payer"), _s("payee", "payee")],
    "security_exchange_v1": [_s("payer", "payer"), _s("payee", "payee")],
    # :146-147
    "consensus_group_v1": [_arr_str("consensus_member", "members")],
    # :148-162 payer defaults to owner when undefined/empty
    "add_gateway_v1": [
        _s("gateway", "gateway"),
        _s("owner", "owner"),
        _sd("payer", "payer", "owner"),
    ],
    "assert_location_v1": [
        _s("gateway", "gateway"),
        _s("owner", "owner"),
        _sd("payer", "payer", "owner"),
    ],
    "assert_location_v2": [
        _s("gateway", "gateway"),
        _s("owner", "owner"),
        _sd("payer", "payer", "owner"),
    ],
    # :186-195
    "create_htlc_v1": [_s("payer", "payer"), _s("payee", "payee"), _s("escrow", "address")],
    "redeem_htlc_v1": [_s("payee", "payee"), _s("escrow", "address")],
    # :196-198
    "poc_request_v1": [_s("challenger", "challenger")],
    # :200-226
    "poc_receipts_v1": [_POC_CHALLENGEES, _POC_WITNESSES, _s("challenger", "challenger")],
    # :227-255 (v2 adds the challenger as validator)
    "poc_receipts_v2": [
        _POC_CHALLENGEES,
        _POC_WITNESSES,
        _s("challenger", "challenger"),
        _s("validator", "challenger"),
    ],
    # :256-257
    "vars_v1": [],
    # :259-275 rewards: payee per account, reward_gateway per gateway
    "rewards_v1": [
        _arr_field("payee", "rewards", "account"),
        _arr_field("reward_gateway", "rewards", "gateway"),
    ],
    "rewards_v2": [
        _arr_field("payee", "rewards", "account"),
        _arr_field("reward_gateway", "rewards", "gateway"),
    ],
    # :327-331
    "token_burn_v1": [_s("payer", "payer"), _s("payee", "payee")],
    # :332-333
    "dc_coinbase_v1": [_s("payee", "payee")],
    # :334-335
    "token_burn_exchange_rate_v1": [],
    # :336-344
    "payment_v2": [_s("payer", "payer"), _arr_field("payee", "payments", "payee")],
    # :345-349 opener is sc_opener, payer and owner
    "state_channel_open_v1": [
        _s("sc_opener", "owner"),
        _s("payer", "owner"),
        _s("owner", "owner"),
    ],
    # :350-374
    "state_channel_close_v1": [
        _s("sc_closer", "closer"),
        _s("payee", "closer"),
        _s("owner", "state_channel.owner"),
        f"coalesce(transform({_SC_SUMMARIES}, s -> struct('packet_receiver' AS role, "
        f"s.client AS actor)), array())",
    ],
    # :375-376
    "gen_price_oracle_v1": [],
    # :377-378
    "price_oracle_v1": [_s("oracle", "public_key")],
    # :379-385
    "transfer_hotspot_v1": [
        _s("gateway", "gateway"),
        _s("payee", "seller"),
        _s("payer", "buyer"),
        _s("owner", "buyer"),
    ],
    # :386-394
    "transfer_hotspot_v2": [
        _s("gateway", "gateway"),
        _s("owner", "new_owner"),
        _s("payer", "owner"),
    ],
    # :395-407
    "gen_validator_v1": [
        _s("validator", "address"),
        _s("payer", "owner"),
        _s("owner", "owner"),
    ],
    "stake_validator_v1": [
        _s("validator", "validator"),
        _s("payer", "owner"),
        _s("owner", "owner"),
    ],
    # :408-413
    "unstake_validator_v1": [
        _s("validator", "address"),
        _s("payee", "owner"),
        _s("owner", "owner"),
    ],
    # :414-430 both validators, payer=new_owner, payee=old_owner, both owners
    "transfer_validator_stake_v1": [
        _s("validator", "old_validator"),
        _s("validator", "new_validator"),
        _s("payer", "new_owner"),
        _s("payee", "old_owner"),
        _sd("owner", "new_owner", "old_owner"),
        _s("owner", "old_owner"),
    ],
    # :431-434
    "validator_heartbeat_v1": [_s("validator", "address")],
    # :435-444
    "consensus_group_failure_v1": [
        _arr_str("consensus_failure_member", "members"),
        _arr_str("consensus_failure_failed_member", "failed_members"),
    ],
    # :445-452
    "add_subnetwork_v1": [
        _s("subnetwork_key", "subnetwork_key"),
        _arr_str("reward_server", "reward_server_keys"),
    ],
    # :453-457
    "subnetwork_rewards_v1": [_arr_field("payee", "rewards", "reward_account")],
    # :458-459
    "subnetwork_fund_v1": [_s("payer", "payer")],
}


def _actors_expr() -> str:
    branches = []
    for ttype, pieces in ACTOR_RULES.items():
        body = f"concat({', '.join(pieces)})" if len(pieces) > 1 else (
            pieces[0] if pieces else "array()"
        )
        branches.append(f"WHEN '{ttype}' THEN {body}")
    cases = "\n      ".join(branches)
    return (
        "CASE type\n"
        f"      {cases}\n"
        "      ELSE CAST(array() AS array<struct<role:string,actor:string>>)\n"
        "    END"
    )


def extract_actors(transactions: DataFrame) -> DataFrame:
    """transactions(block, hash, type, fields JSON) →
    transaction_actors(block, transaction_hash, actor, actor_role).

    Mirrors the reference's transaction_actors table
    (migrations/1576305004-create-block.sql:75-84) including the usort
    dedup (src/be_db_txn_actor.erl:133-137): distinct on the output key.
    """
    return (
        transactions.select(
            "block",
            F.col("hash").alias("transaction_hash"),
            F.explode(F.expr(_actors_expr())).alias("ra"),
        )
        # null/empty actors are skipped, mirroring the reference's
        # per-clause undefined guards (e.g. rewards with no gateway,
        # src/be_db_txn_actor.erl:259-275).
        .filter(F.col("ra.actor").isNotNull() & (F.col("ra.actor") != ""))
        .select(
            F.col("ra.actor").alias("actor"),
            F.col("ra.role").alias("actor_role"),
            "transaction_hash",
            "block",
        )
        .distinct()
    )
