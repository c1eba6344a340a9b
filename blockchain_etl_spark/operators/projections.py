"""Blockchain-plane projections — the remaining pure-function surface of
SURVEY §2.9 over the real table schemas: witness maps (P9), penalty lists
(P10), typed chain-variable encoding (P11), and the stats tick with
conditional recompute (A2/§4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import col

# witnesses JSONB: addr → {histogram: {...}, first_time, recent_time}
# (src/be_db_gateway.erl:239-259 witnesses_to_json)
_WITNESS_SCHEMA = (
    "map<string, struct<first_time:bigint, recent_time:bigint, "
    "histogram:map<string,bigint>>>"
)


def witness_summary(gateways: DataFrame) -> DataFrame:
    """P9: gateways.witnesses JSON map → per-gateway witness stats
    (count, most recent witness time, canonical sorted address list).
    map_from JSON + HOF aggregation; no explode, no shuffle."""
    parsed = F.from_json("witnesses", _WITNESS_SCHEMA)
    keys = F.map_keys(parsed)
    vals = F.map_values(parsed)
    return gateways.select(
        "block",
        "address",
        F.coalesce(F.size(keys), F.lit(0)).alias("witness_count"),
        F.array_join(F.array_sort(keys), ",").alias("witness_addrs"),
        F.aggregate(
            vals,
            F.lit(None).cast("bigint"),
            lambda acc, w: F.greatest(acc, w["recent_time"]),
        ).alias("last_witness_time"),
    )


_PENALTY_SCHEMA = "array<struct<type:string, height:bigint, amount:double>>"


def penalty_rows(validators: DataFrame) -> DataFrame:
    """P10: validators.penalties JSON array-of-structs → one row per
    penalty (src/be_db_validator.erl:132-148 penalties_to_json inverted:
    the analytical explode of the stored list)."""
    return validators.select(
        "block",
        "address",
        F.explode_outer(F.from_json("penalties", _PENALTY_SCHEMA)).alias("p"),
    ).select(
        "block",
        "address",
        col("p.type").alias("penalty_type"),
        col("p.height").alias("penalty_height"),
        col("p.amount").alias("penalty_amount"),
    )


def encode_vars(vars_kv: DataFrame) -> DataFrame:
    """P11 (src/be_db_vars.erl:103-130): raw (name, value string) chain vars
    → (name, type ∈ {integer,float,atom,binary}, value) typed encoding via
    CASE analysis of the value's lexical form."""
    v = col("value")
    is_int = v.rlike(r"^-?\d+$")
    is_float = v.rlike(r"^-?\d+\.\d+([eE][+-]?\d+)?$")
    is_atom = v.rlike(r"^[a-z][a-zA-Z0-9_]*$")
    return vars_kv.select(
        "name",
        F.when(is_int, F.lit("integer"))
        .when(is_float, F.lit("float"))
        .when(is_atom, F.lit("atom"))
        .otherwise(F.lit("binary"))
        .alias("type"),
        v.alias("value"),
    )


# txn types that can change each stat — the reference recomputes a stat
# only when its triggering type appears in the block
# (src/be_db_stats.erl:100-115 conditional recompute).
STAT_TRIGGERS: dict[str, tuple[str, ...]] = {
    "gateway_count": ("add_gateway_v1", "gen_gateway_v1", "transfer_hotspot_v1", "transfer_hotspot_v2"),
    "validator_count": ("gen_validator_v1", "stake_validator_v1", "unstake_validator_v1"),
    "oui_count": ("oui_v1", "routing_v1"),
    "consensus_groups": ("consensus_group_v1",),
}


def stats_to_recompute(block_txn_types: DataFrame) -> DataFrame:
    """A2/§4 conditional recompute: given the distinct txn types present per
    block, emit (block, stat_name) pairs for only the stats whose triggering
    types occurred — the skip-unchanged optimization as a dataflow."""
    entries = F.array(
        *[
            F.struct(
                F.lit(stat).alias("stat_name"),
                F.array(*[F.lit(t) for t in trigs]).alias("trigger_types"),
            )
            for stat, trigs in STAT_TRIGGERS.items()
        ]
    )
    return (
        block_txn_types.groupBy("block")
        .agg(F.collect_set("type").alias("types_present"))
        .select("block", F.explode(entries).alias("s"), "types_present")
        .filter(
            F.arrays_overlap(col("s.trigger_types"), col("types_present"))
        )
        .select("block", col("s.stat_name").alias("stat_name"))
    )
