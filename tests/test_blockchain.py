"""Blockchain-plane tests: P4 actor extraction vs an independent golden
implementation, the encoding UDF pack against known vectors/roundtrips, and
inventory semantics over account history (property: inventory ≡ window over
history — SURVEY §5 property tests).
"""

from __future__ import annotations

import base64
import json
import random

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql.functions import col

from blockchain_etl_spark.operators.actors import extract_actors
from blockchain_etl_spark.operators.latest_state import inventory
from blockchain_etl_spark.sources.blockchain import SCHEMAS
from tests.fixtures_blockchain import (
    gen_account_history,
    gen_transactions,
    py_to_actors,
)


@pytest.fixture(scope="module")
def txn_df(spark):
    _, txns = gen_transactions()
    return spark.createDataFrame(
        [Row(**t) for t in txns], schema=SCHEMAS["transactions"]
    ).cache()


def test_actor_extraction_matches_golden(spark, txn_df):
    got = {
        (r.block, r.transaction_hash, r.actor_role, r.actor)
        for r in extract_actors(txn_df).collect()
    }
    _, txns = gen_transactions()
    want = set()
    for t in txns:
        for role, actor in py_to_actors(t["type"], json.loads(t["fields"])):
            want.add((t["block"], t["hash"], role, actor))
    missing = want - got
    extra = got - want
    assert not missing and not extra, (
        f"missing={list(missing)[:5]} extra={list(extra)[:5]} "
        f"(|got|={len(got)} |want|={len(want)})"
    )


def test_actor_extraction_is_deduped(spark, txn_df):
    actors = extract_actors(txn_df)
    assert actors.count() == actors.distinct().count()


def test_all_rule_types_covered():
    from blockchain_etl_spark.operators.actors import ACTOR_RULES

    # every enum value of the reference's transaction_type that produces
    # actors has a rule; 30 types total in the final enum
    assert len(ACTOR_RULES) >= 30


def test_b64url_roundtrip(spark):
    from blockchain_etl_spark.functions.encoding import b64url_decode, b64url_encode

    rng = random.Random(7)
    data = [bytes(rng.randrange(256) for _ in range(rng.randrange(1, 40))) for _ in range(50)]
    df = spark.createDataFrame([(d,) for d in data], "b: binary")
    out = df.select(
        b64url_encode(col("b")).alias("enc"),
        b64url_decode(b64url_encode(col("b"))).alias("rt"),
        "b",
    ).collect()
    for r in out:
        assert bytes(r.rt) == bytes(r.b)
        assert r.enc == base64.urlsafe_b64encode(bytes(r.b)).rstrip(b"=").decode()


def test_b58_roundtrip_and_vectors(spark):
    from blockchain_etl_spark.functions.encoding import b58_decode, b58_encode

    rng = random.Random(11)
    data = [bytes(rng.randrange(256) for _ in range(rng.randrange(1, 33))) for _ in range(30)]
    data += [b"\x00\x00\x01", b"\x00", b"a"]
    df = spark.createDataFrame([(d,) for d in data], "b: binary")
    out = df.select("b", b58_encode(col("b")).alias("enc")).collect()
    # known vector: 'hello' in base58 (Bitcoin alphabet) is Cn8eVZg
    known = dict(df.selectExpr("b").limit(0).collect())
    assert (
        spark.createDataFrame([(b"hello",)], "b: binary")
        .select(b58_encode(col("b")).alias("e"))
        .first()
        .e
        == "Cn8eVZg"
    )
    rt = (
        spark.createDataFrame([(d,) for d in data], "b: binary")
        .select("b", b58_decode(b58_encode(col("b"))).alias("rt"))
        .collect()
    )
    for r in rt:
        assert bytes(r.rt) == bytes(r.b)


def test_subnet_bit_unpacking(spark):
    from blockchain_etl_spark.functions.encoding import subnet_to_base_mask

    # subnet = base << 23 | mask  (src/be_db_oui.erl:100-102)
    cases = [(5 << 23) | 7, (0 << 23) | 1, (1000 << 23) | (1 << 22)]
    df = spark.createDataFrame([(c,) for c in cases], "s: long")
    out = df.select(subnet_to_base_mask(col("s")).alias("bm")).collect()
    assert (out[0].bm.base, out[0].bm.mask) == (5, 7)
    assert (out[1].bm.base, out[1].bm.mask) == (0, 1)
    assert (out[2].bm.base, out[2].bm.mask) == (1000, 1 << 22)


def test_animal_name_deterministic(spark):
    from blockchain_etl_spark.functions.encoding import animal_name

    df = spark.createDataFrame([("addr1",), ("addr2",), ("addr1",)], "a: string")
    out = [r.n for r in df.select(animal_name(col("a")).alias("n")).collect()]
    assert out[0] == out[2]
    assert out[0] != out[1]
    assert len(out[0].split("-")) == 3


def test_animal_name_matches_python_twin(spark):
    """The Spark column pipeline (md5 → XOR-compress → modulo index) must
    equal the independent pure-Python implementation byte for byte — two
    implementations, one spec. With upstream wordlists mounted via
    APT_WORDLIST_DIR, both become angry_purple_tiger-compatible."""
    from blockchain_etl_spark.functions.encoding import animal_name, py_animal_name

    addrs = [f"11{i:038d}" for i in range(64)] + ["angry-purple-tiger", ""]
    df = spark.createDataFrame([(a,) for a in addrs], "a: string")
    got = {r.a: r.n for r in df.select("a", animal_name(col("a")).alias("n")).collect()}
    for a in addrs:
        assert got[a] == py_animal_name(a), a


def test_animal_name_loads_wordlist_dir(spark, tmp_path, monkeypatch):
    """APT_WORDLIST_DIR supplies the (upstream) wordlists; index = compressed
    digest byte mod list length, per-list."""
    import functools
    import hashlib

    for fname, words in (
        ("adjectives.txt", [f"adj{i}" for i in range(11)]),
        ("colors.txt", [f"col{i}" for i in range(7)]),
        ("animals.txt", [f"ani{i}" for i in range(13)]),
    ):
        (tmp_path / fname).write_text("\n".join(words) + "\n")
    monkeypatch.setenv("APT_WORDLIST_DIR", str(tmp_path))
    from blockchain_etl_spark.functions.encoding import _APT_SEGMENTS, animal_name

    addr = "112qB3YaH5bZkCnKA5uRH7tBtGNv2Y"
    digest = hashlib.md5(addr.encode()).digest()
    seg = [
        functools.reduce(lambda a, x: a ^ x, digest[lo:hi])
        for lo, hi in _APT_SEGMENTS
    ]
    want = f"adj{seg[0] % 11}-col{seg[1] % 7}-ani{seg[2] % 13}"
    df = spark.createDataFrame([(addr,)], "a: string")
    assert df.select(animal_name(col("a")).alias("n")).collect()[0].n == want


def test_account_inventory_equals_window_over_history(spark, duck):
    """J9 ≡ W1 property: the inventory operator over full history equals the
    latest-row-per-key SQL with first/last bookkeeping."""
    rows = gen_account_history()
    hist = spark.createDataFrame([Row(**r) for r in rows], schema=SCHEMAS["accounts"])
    inv = inventory(
        hist,
        keys=["address"],
        order=[col("block").desc()],
        bookkeeping={
            "first_block": F.min("block"),
            "last_block": F.max("block"),
        },
    ).select("address", "balance", "nonce", "first_block", "last_block")

    import pandas as pd

    pdf = pd.DataFrame(rows)
    duck.register("acct_hist", pdf)
    want = duck.execute(
        """
        SELECT address, balance, nonce, first_block, last_block FROM (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY address ORDER BY block DESC) rn,
                 MIN(block) OVER (PARTITION BY address) first_block,
                 MAX(block) OVER (PARTITION BY address) last_block
          FROM acct_hist) WHERE rn = 1
        """
    ).fetchdf()
    got = inv.toPandas()
    got = got.sort_values("address", ignore_index=True)
    want = want.sort_values("address", ignore_index=True)
    assert got.equals(want.astype(got.dtypes.to_dict()))


def test_h3_hierarchy_bit_math(spark):
    """F3: parent/resolution on the public H3 v3 index layout, checked
    against the documented example chain for 8928308280fffff (res 9)."""
    from pyspark.sql.functions import col

    from blockchain_etl_spark.functions.encoding import (
        h3_parent,
        h3_parent_res8,
        h3_resolution,
    )

    df = spark.createDataFrame([("8928308280fffff",)], ["h"]).select(
        h3_resolution(col("h")).alias("res"),
        h3_parent_res8(col("h")).alias("p8"),
        h3_parent(col("h"), 7).alias("p7"),
        h3_parent(col("h"), 9).alias("p9"),
    )
    r = df.first()
    assert r.res == 9
    assert r.p7 == "872830828ffffff"  # documented res-7 parent
    assert r.p8 == "8828308281fffff"
    assert r.p9 == "8928308280fffff"  # parent at own res is identity

    # coarser-than-target input → NULL; res-8 parent of a res-8 cell is itself
    df2 = spark.createDataFrame([("872830828ffffff",)], ["h"]).select(
        h3_parent_res8(col("h")).alias("p8"),
        h3_resolution(col("h")).alias("res"),
    )
    r2 = df2.first()
    assert r2.res == 7 and r2.p8 is None
    df3 = spark.createDataFrame([("8828308281fffff",)], ["h"]).select(
        h3_parent_res8(col("h")).alias("p8")
    )
    assert df3.first().p8 == "8828308281fffff"
