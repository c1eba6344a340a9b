"""End-to-end composition test: genesis bootstrap → streamed block ingest →
derived tables → actor-activity query → incremental inventory merge →
snapshot. Each piece is unit-tested elsewhere; this verifies they compose."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql.functions import col

from blockchain_etl_spark.operators.activity import actor_activity
from blockchain_etl_spark.operators.merge import ParquetMergeTarget
from blockchain_etl_spark.sources.blockchain import SCHEMAS
from blockchain_etl_spark.sources.genesis import load_genesis
from blockchain_etl_spark.streaming.ingest import BlockIngest, derive_tables
from tests.fixtures_blockchain import gen_transactions


@pytest.fixture(scope="module")
def pipeline(spark, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("e2e")
    # genesis block 0 (synthetic; fixture chain starts at height 1)
    gpath = str(tmp / "genesis.json")
    with open(gpath, "w") as f:
        json.dump(
            {
                "height": 0,
                "time": 1599999940,
                "block_hash": "bh00000",
                "transaction_count": 1,
                "transactions": [
                    {"hash": "gtx0", "type": "gen_gateway_v1",
                     "fields": {"gateway": "gw0000", "owner": "acc0000"}},
                ],
            },
            f,
        )
    _, gtxns = load_genesis(spark, gpath)

    _, txns = gen_transactions()
    txn_df = spark.createDataFrame(
        [Row(**t) for t in txns], schema=SCHEMAS["transactions"]
    )

    in_dir = str(tmp / "in")
    os.makedirs(in_dir)
    gtxns.coalesce(1).write.parquet(os.path.join(in_dir, "chunk=g"))
    import time

    time.sleep(1.1)
    for i, (lo, hi) in enumerate([(1, 40), (41, 80), (81, 120)]):
        time.sleep(1.1)
        txn_df.filter((col("block") >= lo) & (col("block") <= hi)).coalesce(
            1
        ).write.parquet(os.path.join(in_dir, f"chunk={i}"))

    out_dir = str(tmp / "out")
    ing = BlockIngest(out_dir)
    ing.run_stream(spark, in_dir + "/chunk=*", SCHEMAS["transactions"])
    return ing, txn_df, gtxns, tmp


def test_ingest_covers_genesis_through_tip(spark, pipeline):
    ing, txn_df, gtxns, _ = pipeline
    assert ing.sync_height() == 120
    stored = ing.read_table(spark, "transactions")
    assert stored.count() == txn_df.count() + gtxns.count()
    assert stored.agg(F.min("block")).first()[0] == 0


def test_activity_over_ingested_tables(spark, pipeline):
    ing, _, _, _ = pipeline
    txns = ing.read_table(spark, "transactions")
    actors = ing.read_table(spark, "transaction_actors")
    act = actor_activity(txns, actors)
    # every actor row resolves to a filtered payload over its txn
    n = act.count()
    assert n == actors.count()
    # rewards rows: filtered payloads only mention the actor
    sample = act.filter(
        (col("type") == "rewards_v1") & (col("actor_role") == "payee")
    ).limit(20).collect()
    assert sample
    for r in sample:
        kept = json.loads(r.fields)["rewards"] or []
        assert all(
            e.get("account") == r.actor or e.get("gateway") == r.actor
            for e in kept
        )


def test_incremental_reward_inventory_from_stream(spark, pipeline):
    """rewards stream → per-account inventory via incremental MERGE equals
    the batch recompute over the full rewards table."""
    ing, _, _, tmp = pipeline
    rewards = ing.read_table(spark, "rewards")
    per_block = rewards.groupBy("account", "block").agg(
        F.sum("amount").alias("block_amount")
    )
    target = ParquetMergeTarget(str(tmp / "acct_rewards"))
    for lo, hi in [(1, 60), (61, 120)]:
        target.merge(
            spark,
            per_block.filter((col("block") >= lo) & (col("block") <= hi)),
            keys=["account"],
            order=["block"],
            first_col="first_block",
            last_col="last_block",
        )
    got = {
        r.account: (r.first_block, r.last_block)
        for r in target.read(spark).collect()
    }
    want = {
        r.account: (r.first, r.last)
        for r in per_block.groupBy("account")
        .agg(F.min("block").alias("first"), F.max("block").alias("last"))
        .collect()
    }
    assert got == want


def test_snapshot_after_ingest(spark, pipeline):
    ing, _, _, _ = pipeline
    snap = ing.write_snapshot(spark, height=100)
    txns = spark.read.parquet(os.path.join(snap, "transactions"))
    assert txns.agg(F.max("block")).first()[0] <= 100
    manifest = json.load(
        open(os.path.join(ing.out_dir, "snapshots", "latest-snap.json"))
    )
    assert manifest["height"] == 100
