"""Entity history derivation — gateways / validators / ouis folded from the
transaction stream (SURVEY §1.1 per-entity history tables + §2 J9
inventories).

The reference reads entity state from the node's embedded ledger at each
block (J8 lookups, src/be_db_gateway.erl:130-144) — state Spark doesn't
have. The analytical re-expression: every state-bearing transaction emits a
*partial* history row (only the columns that transaction determines), and
the MERGE's COALESCE partial-update semantics (operators/merge.py, the
trigger semantics of migrations/1590689602:32-62) fold those partials into
per-entity current state. Ledger changes without txn evidence (rewards
ticking balances — T5) arrive via the `ledger_changes` side input exactly
as the reference's commit hooks do.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import col

from ..operators.merge import merge_latest

_J = F.get_json_object


def gateway_history(txns: DataFrame) -> DataFrame:
    """State-bearing gateway txns → partial history rows
    (block, address, owner?, location?, elevation?, gain?).

    - add_gateway_v1 / gen_gateway_v1: owner (src/be_db_gateway.erl new row)
    - assert_location_v2: location/elevation/gain (owner unchanged → NULL)
    - transfer_hotspot_v1: new owner = buyer
    - transfer_hotspot_v2: new owner = new_owner
    """
    f = col("fields")
    gw_txns = txns.filter(
        col("type").isin(
            "add_gateway_v1",
            "gen_gateway_v1",
            "assert_location_v2",
            "assert_location_v1",
            "transfer_hotspot_v1",
            "transfer_hotspot_v2",
        )
    )
    owner = (
        F.when(
            col("type").isin("add_gateway_v1", "gen_gateway_v1", "assert_location_v1", "assert_location_v2"),
            _J(f, "$.owner"),
        )
        .when(col("type") == "transfer_hotspot_v1", _J(f, "$.buyer"))
        .when(col("type") == "transfer_hotspot_v2", _J(f, "$.new_owner"))
    )
    is_assert = col("type").isin("assert_location_v1", "assert_location_v2")
    return gw_txns.select(
        "block",
        "hash",
        "time",
        _J(f, "$.gateway").alias("address"),
        owner.alias("owner"),
        F.when(is_assert, _J(f, "$.location")).alias("location"),
        F.when(is_assert, _J(f, "$.elevation").cast("int")).alias("elevation"),
        F.when(is_assert, _J(f, "$.gain").cast("int")).alias("gain"),
    ).filter(col("address").isNotNull())


def validator_history(txns: DataFrame) -> DataFrame:
    """State-bearing validator txns → partial history rows
    (block, address, owner?, stake?, last_heartbeat?, status?)."""
    f = col("fields")
    v_txns = txns.filter(
        col("type").isin(
            "gen_validator_v1",
            "stake_validator_v1",
            "unstake_validator_v1",
            "validator_heartbeat_v1",
        )
    )
    address = (
        F.when(
            col("type").isin("gen_validator_v1", "unstake_validator_v1", "validator_heartbeat_v1"),
            _J(f, "$.address"),
        ).when(col("type") == "stake_validator_v1", _J(f, "$.validator"))
    )
    is_stake = col("type").isin("gen_validator_v1", "stake_validator_v1")
    return v_txns.select(
        "block",
        "hash",
        "time",
        address.alias("address"),
        F.when(is_stake | (col("type") == "unstake_validator_v1"), _J(f, "$.owner")).alias("owner"),
        F.when(is_stake, _J(f, "$.stake").cast("long"))
        .when(col("type") == "unstake_validator_v1", F.lit(0))
        .alias("stake"),
        F.when(col("type") == "validator_heartbeat_v1", col("block")).alias("last_heartbeat"),
        F.when(is_stake, F.lit("staked"))
        .when(col("type") == "unstake_validator_v1", F.lit("unstaked"))
        .alias("status"),
    ).filter(col("address").isNotNull())


def oui_history(txns: DataFrame) -> DataFrame:
    """oui_v1 / routing_v1 → oui history rows with router address arrays
    (migrations/1612480010-ouis.sql; P7/A12 explode-aggregate shape).

    Key semantics: oui_v1 carries the *requested* index while routing_v1
    carries the *assigned* OUI, so creation rows map the txn field through
    ``V =< 1 -> 1; V -> V + 1`` (be_db_oui.erl:76-80) — a creation row and
    its later routing rows then merge under the same inventory key.

    Partial-update contract: a routing action with no router addresses
    (new_xor / update_xor / request_subnet) leaves ``addresses`` NULL so
    the MERGE's COALESCE keeps the stored value — the reference re-reads
    the full ledger routing entry, for which those actions mean
    "routers unchanged". Coercing to an empty array here would overwrite
    state. Same for nonce, except at creation where missing means 0.
    """
    f = col("fields")
    oui_txns = txns.filter(col("type").isin("oui_v1", "routing_v1"))
    is_create = col("type") == "oui_v1"
    raw_oui = _J(f, "$.oui").cast("long")
    oui_key = (
        F.when(is_create & (raw_oui <= 1), F.lit(1))
        .when(is_create, raw_oui + 1)
        .otherwise(raw_oui)
    )
    addrs = F.when(
        is_create, F.from_json(_J(f, "$.addresses"), "array<string>")
    ).otherwise(F.from_json(_J(f, "$.action.addresses"), "array<string>"))
    nonce = _J(f, "$.nonce").cast("long")
    return oui_txns.select(
        "block",
        "hash",
        oui_key.alias("oui"),
        _J(f, "$.owner").alias("owner"),
        addrs.alias("addresses"),
        F.when(is_create, F.coalesce(nonce, F.lit(0))).otherwise(nonce).alias("nonce"),
    ).filter(col("oui").isNotNull())


def vars_history(txns: DataFrame) -> DataFrame:
    """vars_v1 → one row per changed chain variable (block, hash, name,
    value) — the append-side of vars_inventory
    (migrations/1592306954-vars_inventory.sql; src/be_db_vars.erl:84-130).
    The vars payload is a dynamic name→value object, exploded via a
    map<string,string> parse; typed encoding (P11) is applied downstream by
    operators/projections.encode_vars."""
    var_map = F.from_json(
        _J(col("fields"), "$.vars"), "map<string,string>"
    )
    return (
        txns.filter(col("type") == "vars_v1")
        .select("block", "hash", F.explode(var_map).alias("name", "value"))
    )


def vars_inventory(txns: DataFrame) -> DataFrame:
    """Current chain-variable state: latest value per name with first/last
    block bookkeeping (the key-value inventory pattern, SURVEY §1.1)."""
    return merge_latest(
        None,
        vars_history(txns),
        keys=["name"],
        order=["block", "hash"],
        first_col="first_block",
        last_col="last_block",
    )


def account_inventory_from_actors(actors: DataFrame) -> DataFrame:
    """Account inventory derived from the actor index: per account-role'd
    actor, first/last activity block, transaction count, and the sorted
    role set — the analytical core of account_inventory
    (migrations/1591133143-account_inventory.sql:38-69) with the
    first_block repair semantics of migrations/1650412999 (J10: first
    activity = min block over its actor rows).

    Balances live in the node ledger the reference reads via J8 lookups;
    without a ledger they arrive through the changed-keys side input (T5),
    so this fold carries the activity bookkeeping only. One hash aggregate,
    one shuffle on the account key.
    """
    account_roles = ("payer", "payee", "owner", "oracle", "sc_opener", "router")
    return (
        actors.filter(col("actor_role").isin(*account_roles))
        .groupBy(col("actor").alias("address"))
        .agg(
            F.min("block").alias("first_block"),
            F.max("block").alias("last_block"),
            F.countDistinct("transaction_hash").alias("n_txns"),
            F.array_join(
                F.array_sort(F.collect_set("actor_role")), ","
            ).alias("roles"),
        )
    )


def fold_inventory(
    history: DataFrame,
    keys: list[str],
    coalesce_cols: list[str],
    target=None,
) -> DataFrame:
    """Fold partial history rows into current state: MERGE semantics with
    COALESCE partial update + first/last bookkeeping (one call = one batch;
    pass a ParquetMergeTarget-read frame as ``target`` for incremental)."""
    return merge_latest(
        target,
        history,
        keys=keys,
        # hash breaks same-block ties so folding is deterministic at any
        # partition count (the reference applies txns in block list order;
        # any fixed total order yields a consistent fold)
        order=["block", "hash"],
        coalesce_cols=coalesce_cols,
        first_col="first_block",
        last_col="last_block",
    )
