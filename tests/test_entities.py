"""Entity-history fold tests: gateway/validator/oui state derived from the
txn stream vs an independent Python fold over the same transactions."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql.functions import col

from blockchain_etl_spark.sources.blockchain import SCHEMAS
from blockchain_etl_spark.streaming.entities import (
    fold_inventory,
    gateway_history,
    oui_history,
    validator_history,
)
from tests.fixtures_blockchain import gen_transactions


@pytest.fixture(scope="module")
def txn_df(spark):
    _, txns = gen_transactions()
    return spark.createDataFrame(
        [Row(**t) for t in txns], schema=SCHEMAS["transactions"]
    ).cache()


@pytest.fixture(scope="module")
def txn_rows():
    _, txns = gen_transactions()
    return sorted(txns, key=lambda t: (t["block"], t["hash"]))


def py_gateway_fold(txns):
    state = {}
    for t in txns:
        f = json.loads(t["fields"])
        ty = t["type"]
        if ty in ("add_gateway_v1", "gen_gateway_v1"):
            g = f["gateway"]
            s = state.setdefault(g, {"first": t["block"]})
            s.update(owner=f["owner"], last=t["block"])
        elif ty in ("assert_location_v1", "assert_location_v2"):
            g = f["gateway"]
            s = state.setdefault(g, {"first": t["block"]})
            s.update(
                owner=f["owner"],
                location=f.get("location"),
                last=t["block"],
            )
        elif ty == "transfer_hotspot_v1":
            g = f["gateway"]
            s = state.setdefault(g, {"first": t["block"]})
            s.update(owner=f["buyer"], last=t["block"])
    return state


def test_gateway_inventory_matches_python_fold(spark, txn_df, txn_rows):
    hist = gateway_history(txn_df)
    inv = fold_inventory(
        hist, keys=["address"], coalesce_cols=["owner", "location", "elevation", "gain"]
    )
    got = {
        r.address: (r.owner, r.location, r.first_block, r.last_block)
        for r in inv.collect()
    }
    want = py_gateway_fold(txn_rows)
    assert set(got) == set(want)
    for g, s in want.items():
        owner, location, first, last = got[g]
        assert owner == s.get("owner"), (g, owner, s)
        assert location == s.get("location"), (g, location, s)
        assert (first, last) == (s["first"], s["last"])


def test_validator_inventory(spark, txn_df, txn_rows):
    hist = validator_history(txn_df)
    inv = fold_inventory(
        hist, keys=["address"], coalesce_cols=["owner", "stake", "last_heartbeat", "status"]
    )
    # independent fold
    state = {}
    for t in txn_rows:
        f = json.loads(t["fields"])
        ty = t["type"]
        if ty == "stake_validator_v1":
            state.setdefault(f["validator"], {})["status"] = "staked"
            state[f["validator"]]["owner"] = f["owner"]
        elif ty == "unstake_validator_v1":
            state.setdefault(f["address"], {})["status"] = "unstaked"
            state[f["address"]]["owner"] = f["owner"]
        elif ty == "validator_heartbeat_v1":
            state.setdefault(f["address"], {}).setdefault("status", None)
            state[f["address"]]["hb"] = t["block"]
    got = {r.address: r for r in inv.collect()}
    assert set(got) == set(state)
    for v, s in state.items():
        if s.get("hb"):
            assert got[v].last_heartbeat == s["hb"]


def test_oui_inventory(spark, txn_df, txn_rows):
    hist = oui_history(txn_df)
    inv = fold_inventory(hist, keys=["oui"], coalesce_cols=["owner", "addresses"])
    state = {}
    for t in txn_rows:
        f = json.loads(t["fields"])
        if t["type"] == "oui_v1":
            # requested index → assigned OUI (be_db_oui.erl:76-80)
            key = 1 if f["oui"] <= 1 else f["oui"] + 1
            state[key] = {"owner": f["owner"], "addresses": f["addresses"]}
        elif t["type"] == "routing_v1":
            s = state.setdefault(f["oui"], {"owner": None, "addresses": None})
            s["owner"] = f["owner"]
            # only update_routers carries addresses; other actions leave
            # the stored router list untouched
            if f["action"].get("addresses") is not None:
                s["addresses"] = f["action"]["addresses"]
    got = {r.oui: r for r in inv.collect()}
    assert set(got) == set(state)
    for oui, s in state.items():
        assert got[oui].owner == s["owner"], oui
        have = got[oui].addresses
        assert (list(have) if have is not None else None) == s["addresses"], oui


def test_streaming_incremental_inventory_matches_batch(spark, txn_df, tmp_path):
    """The per-microbatch inventory MERGE (reference's AFTER INSERT
    triggers) converges to exactly the batch fold over full history —
    including across a replayed batch."""
    import os

    from blockchain_etl_spark.streaming.ingest import INVENTORIES, BlockIngest

    ing = BlockIngest(str(tmp_path / "out"), maintain_inventories=True)
    chunks = [(1, 40), (41, 80), (81, 120)]
    for lo, hi in chunks:
        batch = txn_df.filter((F.col("block") >= lo) & (F.col("block") <= hi))
        ing.process_batch(batch, 0)
    # replay the last batch: MERGE must be a no-op
    ing.process_batch(
        txn_df.filter((F.col("block") >= 81) & (F.col("block") <= 120)), 1
    )

    from blockchain_etl_spark.streaming.entities import vars_history
    from blockchain_etl_spark.streaming.ingest import derive_tables

    history_fns = {
        "gateways": gateway_history,
        "validators": validator_history,
        "ouis": oui_history,
        "vars": vars_history,
        "oracle_prices": lambda df: derive_tables(df)["oracle_prices"],
    }
    for name, (keys, coalesce_cols) in INVENTORIES.items():
        want_df = fold_inventory(
            history_fns[name](txn_df), keys=keys, coalesce_cols=coalesce_cols
        ).drop("hash", "time")
        got_df = ing.read_inventory(spark, name)
        assert sorted(got_df.columns) == sorted(want_df.columns), name
        cols = sorted(want_df.columns)

        def norm(df):
            return {
                tuple(tuple(v) if isinstance(v, list) else v for v in r)
                for r in df.select(*cols).collect()
            }

        assert norm(got_df) == norm(want_df), name


def test_account_inventory_from_actors(spark, txn_df, txn_rows):
    from blockchain_etl_spark.operators.actors import extract_actors
    from blockchain_etl_spark.streaming.entities import account_inventory_from_actors
    from tests.fixtures_blockchain import py_to_actors

    roles = {"payer", "payee", "owner", "oracle", "sc_opener", "router"}
    want = {}
    for t in txn_rows:
        f = json.loads(t["fields"])
        for role, actor in set(py_to_actors(t["type"], f)):
            if role not in roles:
                continue
            s = want.setdefault(actor, {"first": t["block"], "last": t["block"],
                                        "txns": set(), "roles": set()})
            s["first"] = min(s["first"], t["block"])
            s["last"] = max(s["last"], t["block"])
            s["txns"].add(t["hash"])
            s["roles"].add(role)
    inv = account_inventory_from_actors(extract_actors(txn_df))
    got = {r.address: r for r in inv.collect()}
    assert set(got) == set(want)
    for a, s in want.items():
        r = got[a]
        assert (r.first_block, r.last_block) == (s["first"], s["last"]), a
        assert r.n_txns == len(s["txns"]), a
        assert r.roles == ",".join(sorted(s["roles"])), a


def test_streaming_additive_account_inventory(spark, txn_df, tmp_path):
    """Additive aggregate state (accounts) maintained per microbatch equals
    the batch fold — and a replayed batch is skipped by the watermark guard
    rather than double-counted."""
    from blockchain_etl_spark.operators.actors import extract_actors
    from blockchain_etl_spark.streaming.entities import account_inventory_from_actors
    from blockchain_etl_spark.streaming.ingest import BlockIngest

    ing = BlockIngest(str(tmp_path / "out"), maintain_inventories=True)
    for lo, hi in ((1, 40), (41, 80), (81, 120)):
        ing.process_batch(
            txn_df.filter((F.col("block") >= lo) & (F.col("block") <= hi)), 0
        )
    # replay middle range: watermark 80 <= stored 120 → additive merge skipped
    ing.process_batch(
        txn_df.filter((F.col("block") >= 41) & (F.col("block") <= 80)), 1
    )
    got = {tuple(r) for r in ing.read_inventory(spark, "accounts").collect()}
    want = {
        tuple(r)
        for r in account_inventory_from_actors(extract_actors(txn_df)).collect()
    }
    assert got == want


def test_vars_inventory(spark, txn_df, txn_rows):
    from blockchain_etl_spark.streaming.entities import vars_inventory

    got = {r.name: (r.value, r.first_block, r.last_block)
           for r in vars_inventory(txn_df).collect()}
    want = {}
    for t in txn_rows:  # txn_rows sorted by (block, hash) — fold order
        if t["type"] != "vars_v1":
            continue
        f = json.loads(t["fields"])
        for name, value in f["vars"].items():
            s = want.setdefault(name, {"first": t["block"]})
            s["value"] = str(value)
            s["last"] = t["block"]
    assert set(got) == set(want)
    for n, s in want.items():
        assert got[n] == (s["value"], s["first"], s["last"]), (n, got[n], s)
