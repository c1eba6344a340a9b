"""Tests for the incremental MERGE operator, periodic jobs, and the small
source adapters (genesis, signatures, snapshot, pending decode)."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql.functions import col

from blockchain_etl_spark.operators.latest_state import inventory
from blockchain_etl_spark.operators.merge import ParquetMergeTarget, merge_latest
from blockchain_etl_spark.sources.blockchain import SCHEMAS
from blockchain_etl_spark.sources.genesis import block_signatures, load_genesis
from blockchain_etl_spark.streaming.jobs import (
    changed_keys_union,
    geocode_missing_locations,
    refresh_gateway_status,
    stalest_rows,
)
from tests.fixtures_blockchain import gen_account_history


@pytest.fixture(scope="module")
def history(spark):
    rows = gen_account_history()
    return spark.createDataFrame(
        [Row(**r) for r in rows], schema=SCHEMAS["accounts"]
    ).cache()


def _inv_set(df):
    cols = ["address", "balance", "nonce", "first_block", "last_block"]
    return {tuple(r) for r in df.select(*cols).collect()}


def test_incremental_merge_equals_batch_inventory(spark, history, tmp_path):
    """J9 property: applying history in 4 block-range increments through the
    MERGE target equals the batch window inventory over the full history."""
    target = ParquetMergeTarget(str(tmp_path / "acct_inv"))
    for lo, hi in [(1, 30), (31, 60), (61, 90), (91, 120)]:
        chunk = history.filter((col("block") >= lo) & (col("block") <= hi))
        target.merge(
            spark,
            chunk,
            keys=["address"],
            order=["block"],
            first_col="first_block",
            last_col="last_block",
        )
    batch = inventory(
        history,
        keys=["address"],
        order=[col("block").desc()],
        bookkeeping={
            "first_block": F.min("block"),
            "last_block": F.max("block"),
        },
    )
    assert _inv_set(target.read(spark)) == _inv_set(batch)


def test_merge_coalesce_partial_update(spark, tmp_path):
    """The reward_scale COALESCE pattern (migrations/1610634227:28): a NULL
    update keeps the prior value."""
    target = ParquetMergeTarget(str(tmp_path / "gw_inv"))
    schema = "address string, block long, reward_scale double"
    target.merge(
        spark,
        spark.createDataFrame([("gw1", 1, 0.8), ("gw2", 1, 0.5)], schema),
        keys=["address"], order=["block"], coalesce_cols=["reward_scale"],
        first_col="first_block", last_col="last_block",
    )
    out = target.merge(
        spark,
        spark.createDataFrame([("gw1", 2, None), ("gw2", 2, 0.9)], schema),
        keys=["address"], order=["block"], coalesce_cols=["reward_scale"],
        first_col="first_block", last_col="last_block",
    )
    got = {r.address: (r.reward_scale, r.first_block, r.last_block) for r in out.collect()}
    assert got == {"gw1": (0.8, 1, 2), "gw2": (0.9, 1, 2)}


def test_merge_replay_idempotent(spark, history, tmp_path):
    target = ParquetMergeTarget(str(tmp_path / "replay_inv"))
    chunk = history.filter(col("block") <= 60)
    target.merge(spark, chunk, keys=["address"], order=["block"],
                 first_col="first_block", last_col="last_block")
    first = _inv_set(target.read(spark))
    target.merge(spark, chunk, keys=["address"], order=["block"],
                 first_col="first_block", last_col="last_block")
    assert _inv_set(target.read(spark)) == first


def test_stalest_rows_and_status_refresh(spark):
    inv = spark.createDataFrame(
        [("a1", 100, None), ("a2", 1, 9000), ("a3", 1, None)],
        "address string, first_block long, last_poc_challenge long",
    )
    status = spark.createDataFrame(
        [("a1", "2024-01-01 00:00:00")],
        "address string, updated_at string",
    ).withColumn("updated_at", col("updated_at").cast("timestamp"))
    # a2/a3 have no status row → staleness epoch 0 → picked first
    picked = stalest_rows(inv, status, "address", 2)
    assert {r.address for r in picked.collect()} == {"a2", "a3"}

    refreshed = refresh_gateway_status(inv, status, current_height=10000, rate=3)
    got = {r.address: r.online for r in refreshed.collect()}
    assert got == {"a1": "offline", "a2": "online", "a3": "offline"}
    # a1 offline: first_block=100 is not recent at height 10000; a2 online:
    # poc within 3600 blocks


def test_geocode_missing_locations(spark):
    gw = spark.createDataFrame(
        [("8c1234ab",), ("8cdeadbe",), ("8c1234ab",), (None,)], "location string"
    )
    locs = spark.createDataFrame([("8c1234ab",)], "location string")
    out = geocode_missing_locations(gw, locs).collect()
    assert [r.location for r in out] == ["8cdeadbe"]
    r = out[0]
    assert r.long_city and r.short_city == r.long_city[:4] and r.short_country


def test_geocode_custom_provider_is_used(spark):
    """The provider interface: a caller-supplied geocoder runs inside the
    Arrow batch and its values land in the output columns."""
    gw = spark.createDataFrame([("8cdeadbe",)], "location string")
    locs = spark.createDataFrame([], "location string")

    def provider(h3_index):
        return ("Testville", "Test", "testland", "TL")

    r = geocode_missing_locations(gw, locs, provider=provider).collect()[0]
    assert (r.long_city, r.short_city, r.long_country, r.short_country) == (
        "Testville", "Test", "testland", "TL",
    )


def test_changed_keys_union(spark):
    actors = spark.createDataFrame(
        [(5, "acc1"), (5, "acc2"), (6, "acc1")], "block long, actor string"
    )
    changes = spark.createDataFrame(
        [(5, "acc2"), (5, "acc9")], "block long, key string"
    )
    got = {tuple(r) for r in changed_keys_union(actors, changes, block=5).collect()}
    assert got == {(5, "acc1"), (5, "acc2"), (5, "acc9")}


def test_genesis_and_signatures(spark, tmp_path):
    g = {
        "height": 1,
        "time": 1600000000,
        "block_hash": "bh00001",
        "prev_hash": None,
        "transaction_count": 1,
        "transactions": [
            {"hash": "g1", "type": "gen_gateway_v1",
             "fields": {"gateway": "gw0001", "owner": "acc0001"}},
        ],
    }
    path = str(tmp_path / "genesis.json")
    with open(path, "w") as f:
        json.dump(g, f)
    blocks, txns = load_genesis(spark, path)
    b = blocks.first()
    assert (b.height, b.block_hash, b.transaction_count) == (1, "bh00001", 1)
    t = txns.first()
    assert (t.block, t.type) == (1, "gen_gateway_v1")

    sig_blocks = spark.createDataFrame(
        [Row(height=2, signatures=[Row(signer="s1", signature="x"),
                                   Row(signer="s2", signature="y")])]
    )
    sigs = {(r.block, r.signer, r.signature) for r in block_signatures(sig_blocks).collect()}
    assert sigs == {(2, "s1", "x"), (2, "s2", "y")}


def test_pending_txn_decode(spark):
    """S7: real protobuf wire decode — a hand-encoded blockchain_txn
    wrapper round-trips to (type, nonce); malformed bytes short-circuit to
    NULL (the reference's decoding_failure → status=failed)."""
    from blockchain_etl_spark.functions.encoding import decode_pending_txn
    from blockchain_etl_spark.functions.protowire import (
        WIRE_LEN,
        WIRE_VARINT,
        encode_field,
    )

    # payment_v2 (oneof member 17) whose inner message carries
    # payer(1)=bytes, nonce(4)=7 — extra unknown inner fields must be
    # skipped, not break the decode.
    inner = (
        encode_field(1, WIRE_LEN, b"\x01payer-bin")
        + encode_field(4, WIRE_VARINT, 7)
        + encode_field(9, WIRE_VARINT, 123)  # unknown field → ignored
    )
    payment = encode_field(17, WIRE_LEN, inner)
    # vars_v1 (member 12): nonce field 3, two occurrences → last wins
    vars_txn = encode_field(
        12, WIRE_LEN, encode_field(3, WIRE_VARINT, 1) + encode_field(3, WIRE_VARINT, 9)
    )
    # heartbeat (member 28) has no nonce field registered → NULL nonce
    heartbeat = encode_field(28, WIRE_LEN, encode_field(2, WIRE_VARINT, 5000))
    df = spark.createDataFrame(
        [
            (payment,),
            (vars_txn,),
            (heartbeat,),
            (b"\x00\x01garbage",),  # malformed: field number 0
            (payment[:-3],),  # truncated mid-message
        ],
        "data binary",
    )
    rows = df.select(decode_pending_txn(col("data")).alias("d")).collect()
    assert rows[0].d.type == "payment_v2" and rows[0].d.nonce == 7
    assert rows[1].d.type == "vars_v1" and rows[1].d.nonce == 9
    assert rows[2].d.type == "validator_heartbeat_v1" and rows[2].d.nonce is None
    assert rows[3].d is None  # decode failure short-circuit
    assert rows[4].d is None


def test_protowire_parser_units():
    """Wire-format reader edge cases, independent of Spark."""
    import pytest as _pytest

    from blockchain_etl_spark.functions.protowire import (
        WIRE_LEN,
        WIRE_VARINT,
        decode_txn,
        encode_field,
        encode_varint,
        parse_fields,
        read_varint,
    )

    # multi-byte varint: 300 = 0b10101100 0b00000010
    assert encode_varint(300) == b"\xac\x02"
    assert read_varint(b"\xac\x02", 0) == (300, 2)
    with _pytest.raises(ValueError):
        read_varint(b"\xac", 0)  # continuation bit set, then EOF
    with _pytest.raises(ValueError):
        parse_fields(b"\xff" * 11)  # varint > 64 bits
    # fixed32/fixed64 are parsed (wire types 5/1)
    fields = parse_fields(b"\x0d\x01\x00\x00\x00" + b"\x11" + b"\x02" + b"\x00" * 7)
    assert fields == [(1, 5, 1), (2, 1, 2)]
    # wrapper with two oneof members is malformed for a oneof
    two = encode_field(17, WIRE_LEN, b"") + encode_field(12, WIRE_LEN, b"")
    assert decode_txn(two) is None
    assert decode_txn(None) is None
    # unknown member number still yields a typed row
    unknown = encode_field(99, WIRE_LEN, encode_field(1, WIRE_VARINT, 3))
    assert decode_txn(unknown) == ("txn_99", None)


def test_snapshot_sink(spark, tmp_path):
    from blockchain_etl_spark.streaming.ingest import BlockIngest
    from tests.fixtures_blockchain import gen_transactions

    _, txns = gen_transactions()
    txn_df = spark.createDataFrame(
        [Row(**t) for t in txns], schema=SCHEMAS["transactions"]
    )
    ing = BlockIngest(str(tmp_path / "snap_out"))
    ing.process_batch(txn_df.filter(col("block") <= 50), 0)
    snap = ing.write_snapshot(spark, height=40)
    manifest = json.load(open(os.path.join(str(tmp_path / "snap_out"), "snapshots", "latest-snap.json")))
    assert manifest["height"] == 40 and "transactions" in manifest["tables"]
    snap_txns = spark.read.parquet(os.path.join(snap, "transactions"))
    assert snap_txns.agg(F.max("block")).first()[0] <= 40


def test_protowire_roundtrip_property():
    """Property: any message built from valid (field, wire0/wire2, value)
    triples round-trips through encode_field -> parse_fields exactly."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from blockchain_etl_spark.functions.protowire import (
        WIRE_LEN,
        WIRE_VARINT,
        encode_field,
        parse_fields,
    )

    field_nums = st.integers(min_value=1, max_value=2**28)
    varints = st.integers(min_value=0, max_value=2**63 - 1)
    triple = st.one_of(
        st.tuples(field_nums, st.just(WIRE_VARINT), varints),
        st.tuples(field_nums, st.just(WIRE_LEN), st.binary(max_size=64)),
    )

    @settings(max_examples=200, deadline=None)
    @given(st.lists(triple, max_size=20))
    def check(triples):
        buf = b"".join(encode_field(f, w, v) for f, w, v in triples)
        assert parse_fields(buf) == [(f, w, v) for f, w, v in triples]

    check()
