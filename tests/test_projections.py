"""Blockchain-plane projection tests: witness maps, penalty explode, typed
var encoding, conditional stats recompute."""

from __future__ import annotations

import json

from pyspark.sql import Row

from blockchain_etl_spark.operators.projections import (
    encode_vars,
    penalty_rows,
    stats_to_recompute,
    witness_summary,
)


def test_witness_summary(spark):
    witnesses = {
        "gwB": {"first_time": 100, "recent_time": 900, "histogram": {"-80": 3}},
        "gwA": {"first_time": 200, "recent_time": 1500, "histogram": {"-70": 1}},
    }
    gw = spark.createDataFrame(
        [
            Row(block=10, address="gw1", witnesses=json.dumps(witnesses)),
            Row(block=10, address="gw2", witnesses=None),
        ]
    )
    got = {r.address: r for r in witness_summary(gw).collect()}
    assert got["gw1"].witness_count == 2
    assert got["gw1"].witness_addrs == "gwA,gwB"
    assert got["gw1"].last_witness_time == 1500
    assert got["gw2"].witness_count == 0


def test_penalty_rows(spark):
    pens = [
        {"type": "performance", "height": 5, "amount": 1.5},
        {"type": "tenure", "height": 9, "amount": 0.5},
    ]
    v = spark.createDataFrame(
        [
            Row(block=10, address="v1", penalties=json.dumps(pens)),
            Row(block=10, address="v2", penalties=None),
        ]
    )
    rows = penalty_rows(v).collect()
    got = {(r.address, r.penalty_type, r.penalty_height, r.penalty_amount) for r in rows}
    assert ("v1", "performance", 5, 1.5) in got
    assert ("v1", "tenure", 9, 0.5) in got
    # explode_outer keeps the no-penalties validator with NULLs
    assert ("v2", None, None, None) in got


def test_encode_vars(spark):
    kv = spark.createDataFrame(
        [
            ("poc_version", "11"),
            ("dc_percent", "0.35"),
            ("predicate_callback_mod", "miner"),
            ("price_oracle_public_keys", "3QbXK..."),
            ("neg", "-4"),
            ("sci", "1.5e-3"),
        ],
        "name string, value string",
    )
    got = {r.name: r.type for r in encode_vars(kv).collect()}
    assert got == {
        "poc_version": "integer",
        "dc_percent": "float",
        "predicate_callback_mod": "atom",
        "price_oracle_public_keys": "binary",
        "neg": "integer",
        "sci": "float",
    }


def test_stats_to_recompute(spark):
    tt = spark.createDataFrame(
        [
            (1, "payment_v2"),
            (1, "add_gateway_v1"),
            (2, "consensus_group_v1"),
            (2, "oui_v1"),
            (3, "payment_v2"),  # no triggering types → no stats row
        ],
        "block long, type string",
    )
    got = {(r.block, r.stat_name) for r in stats_to_recompute(tt).collect()}
    assert got == {
        (1, "gateway_count"),
        (2, "consensus_groups"),
        (2, "oui_count"),
    }
