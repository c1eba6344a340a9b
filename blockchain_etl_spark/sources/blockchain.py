"""Schema registry for the blockchain-shaped data plane (FIXTURES.md §A).

The reference's schema is fixed and explicitly versioned by SQL migrations
(SURVEY §1.2: "never schema inference") — here every table has an explicit
StructType, and readers always pass it. Types follow the §1.2 mapping:
BIGINT→Long, JSONB→string (typed per-payload structs are applied at use
sites via from_json), TIMESTAMPTZ→Timestamp, TEXT[]→array<string>.

Citations: blocks migrations/1576305004-create-block.sql:3-17;
transactions :49-59; transaction_actors :75-84; accounts
1577040141:4-20 + 1656430115; gateways 1577890272:4-25 (+ evolution);
validators 1622293265:10-42; locations 1582900136:4-21; rewards
1597773017:4-12 + 1637295492; packets 1609338698:4-12; dc_burns
1622581070:13-23; oracle_prices 1591660917:4-9; vars/stats inventory
1592306954:11-18, 1593015009:4-9; ouis 1612480010:4-27;
pending_transactions 1580305069:25-41.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)


def _st(*fields: tuple[str, object]) -> StructType:
    return StructType([StructField(n, t, True) for n, t in fields])


BLOCKS = _st(
    ("height", LongType()),
    ("time", LongType()),
    ("timestamp", TimestampType()),
    ("prev_hash", StringType()),
    ("block_hash", StringType()),
    ("transaction_count", IntegerType()),
    ("hbbft_round", LongType()),
    ("election_epoch", LongType()),
    ("epoch_start", LongType()),
    ("rescue_signature", StringType()),
    ("snapshot_hash", StringType()),
    ("created_at", TimestampType()),
)

TRANSACTIONS = _st(
    ("block", LongType()),
    ("hash", StringType()),
    ("time", LongType()),
    ("type", StringType()),
    ("fields", StringType()),  # polymorphic JSON payload
)

TRANSACTION_ACTORS = _st(
    ("actor", StringType()),
    ("actor_role", StringType()),
    ("transaction_hash", StringType()),
    ("block", LongType()),
)

ACCOUNTS = _st(
    ("block", LongType()),
    ("address", StringType()),
    ("dc_balance", LongType()),
    ("dc_nonce", LongType()),
    ("security_balance", LongType()),
    ("security_nonce", LongType()),
    ("balance", LongType()),
    ("staked_balance", LongType()),
    ("mobile_balance", LongType()),
    ("iot_balance", LongType()),
    ("nonce", LongType()),
)

GATEWAYS = _st(
    ("block", LongType()),
    ("time", LongType()),
    ("address", StringType()),
    ("owner", StringType()),
    ("location", StringType()),
    ("last_poc_challenge", LongType()),
    ("last_poc_onion_key_hash", StringType()),
    ("witnesses", StringType()),  # JSON map addr -> {histogram, first_time, recent_time}
    ("nonce", LongType()),
    ("name", StringType()),
    ("reward_scale", DoubleType()),
    ("elevation", IntegerType()),
    ("gain", IntegerType()),
    ("location_hex", StringType()),
    ("mode", StringType()),
)

VALIDATORS = _st(
    ("block", LongType()),
    ("address", StringType()),
    ("name", StringType()),
    ("owner", StringType()),
    ("status", StringType()),
    ("stake", LongType()),
    ("nonce", LongType()),
    ("last_heartbeat", LongType()),
    ("version_heartbeat", LongType()),
    ("penalty", DoubleType()),
    ("penalties", StringType()),  # JSON [{type, height, amount}]
)

LOCATIONS = _st(
    ("location", StringType()),
    ("long_street", StringType()),
    ("short_street", StringType()),
    ("long_city", StringType()),
    ("short_city", StringType()),
    ("long_state", StringType()),
    ("short_state", StringType()),
    ("long_country", StringType()),
    ("short_country", StringType()),
    ("search_city", StringType()),
    ("city_id", StringType()),
    ("geometry_lon", DoubleType()),
    ("geometry_lat", DoubleType()),
)

REWARDS = _st(
    ("block", LongType()),
    ("transaction_hash", StringType()),
    ("time", LongType()),
    ("account", StringType()),
    ("gateway", StringType()),
    ("amount", LongType()),
    ("type", StringType()),
)

PACKETS = _st(
    ("block", LongType()),
    ("transaction_hash", StringType()),
    ("time", LongType()),
    ("gateway", StringType()),
    ("num_packets", LongType()),
    ("num_dcs", LongType()),
)

DC_BURNS = _st(
    ("block", LongType()),
    ("transaction_hash", StringType()),
    ("actor", StringType()),
    ("type", StringType()),
    ("amount", LongType()),
    ("oracle_price", LongType()),
    ("time", LongType()),
)

ORACLE_PRICES = _st(("block", LongType()), ("price", LongType()))

VARS_INVENTORY = _st(
    ("name", StringType()), ("type", StringType()), ("value", StringType())
)

STATS_INVENTORY = _st(("name", StringType()), ("value", LongType()))

OUIS = _st(
    ("block", LongType()),
    ("oui", LongType()),
    ("owner", StringType()),
    ("nonce", LongType()),
    ("addresses", ArrayType(StringType())),
    ("subnets", ArrayType(ArrayType(IntegerType()))),
)

PENDING_TRANSACTIONS = _st(
    ("created_at", TimestampType()),
    ("updated_at", TimestampType()),
    ("hash", StringType()),
    ("type", StringType()),
    ("address", StringType()),
    ("nonce", LongType()),
    ("nonce_type", StringType()),
    ("status", StringType()),
    ("failed_reason", StringType()),
    ("data", BinaryType()),
    ("fields", StringType()),
)

LEDGER_CHANGES = _st(
    ("block", LongType()), ("key", StringType()), ("kind", StringType())
)

SCHEMAS: dict[str, StructType] = {
    "blocks": BLOCKS,
    "transactions": TRANSACTIONS,
    "transaction_actors": TRANSACTION_ACTORS,
    "accounts": ACCOUNTS,
    "gateways": GATEWAYS,
    "validators": VALIDATORS,
    "locations": LOCATIONS,
    "rewards": REWARDS,
    "packets": PACKETS,
    "dc_burns": DC_BURNS,
    "oracle_prices": ORACLE_PRICES,
    "vars_inventory": VARS_INVENTORY,
    "stats_inventory": STATS_INVENTORY,
    "ouis": OUIS,
    "pending_transactions": PENDING_TRANSACTIONS,
    "ledger_changes": LEDGER_CHANGES,
}

# Typed payload schemas for the 7 txn types the reference's SQL functions
# introspect (migrations/1628075186:4-27; 1612480010:58-110; FIXTURES.md §A).
FIELDS_SCHEMAS: dict[str, str] = {
    "rewards_v1": (
        "struct<rewards:array<struct<account:string,gateway:string,"
        "amount:bigint,type:string>>,start_epoch:bigint,end_epoch:bigint>"
    ),
    "rewards_v2": (
        "struct<rewards:array<struct<account:string,gateway:string,"
        "amount:bigint,type:string>>,start_epoch:bigint,end_epoch:bigint>"
    ),
    "payment_v2": (
        "struct<payer:string,payments:array<struct<payee:string,amount:bigint>>,"
        "fee:bigint,nonce:bigint>"
    ),
    "state_channel_close_v1": (
        "struct<closer:string,state_channel:struct<owner:string,"
        "summaries:array<struct<client:string,owner:string,num_packets:bigint,"
        "num_dcs:bigint,location:string>>>>"
    ),
    "consensus_group_v1": (
        "struct<members:array<string>,proof:string,height:bigint,delay:bigint>"
    ),
    "oui_v1": (
        "struct<owner:string,payer:string,oui:bigint,addresses:array<string>,"
        "staking_fee:bigint,fee:bigint>"
    ),
    "poc_receipts_v1": (
        "struct<challenger:string,path:array<struct<challengee:string,"
        "witnesses:array<struct<gateway:string>>>>>"
    ),
    "add_gateway_v1": (
        "struct<gateway:string,owner:string,payer:string,staking_fee:bigint,fee:bigint>"
    ),
}
