"""CDC changelog emission from ParquetMergeTarget: folding the changelog
versions in order onto an empty table must reproduce the target at every
version, ops must classify correctly, and replays must emit nothing."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.functions import col

from blockchain_etl_spark.operators.merge import ParquetMergeTarget, merge_latest

KEYS = ("address",)


def _merge(t, spark, rows, wm):
    upd = spark.createDataFrame(rows, ["address", "block", "owner"])
    return t.merge_with(
        spark,
        upd,
        lambda target, u: merge_latest(target, u, KEYS, ("block",), coalesce_cols=("owner",)),
        watermark=wm,
        changelog_keys=KEYS,
    )


def _snapshot(df):
    return {r.address: (r.block, r.owner) for r in df.collect()}


def _apply_changelog(state: dict, log) -> dict:
    state = dict(state)
    for r in log.collect():
        if r["__op"] == "delete":
            state.pop(r.address, None)
        else:
            state[r.address] = (r.block, r.owner)
    return state


def test_changelog_replays_to_target(spark, tmp_path):
    t = ParquetMergeTarget(str(tmp_path / "inv"))
    _merge(t, spark, [("a", 1, "o1"), ("b", 1, "o2")], wm=0)
    _merge(t, spark, [("a", 2, "o1b"), ("c", 2, None)], wm=1)   # update + insert(null owner)
    _merge(t, spark, [("c", 3, "o3"), ("b", 3, "o2")], wm=2)    # coalesce fill + no-op value

    state: dict = {}
    for v in range(1, t.current_version() + 1):
        log = t.read_changelog(spark, v)
        assert log is not None
        state = _apply_changelog(state, log)
        # folded changelog == stored version at every step
        stored = _snapshot(spark.read.parquet(str(tmp_path / "inv" / f"v={v}")))
        assert state == stored, (v, state, stored)


def test_changelog_ops_classify(spark, tmp_path):
    t = ParquetMergeTarget(str(tmp_path / "inv2"))
    _merge(t, spark, [("a", 1, "o1")], wm=0)
    log1 = t.read_changelog(spark, 1)
    assert {(r.address, r["__op"]) for r in log1.collect()} == {("a", "insert")}

    _merge(t, spark, [("a", 2, "oX"), ("b", 2, "o2")], wm=1)
    log2 = t.read_changelog(spark, 2)
    assert {(r.address, r["__op"]) for r in log2.collect()} == {
        ("a", "update"),
        ("b", "insert"),
    }

    # an unchanged key emits NOTHING (the reference's skip-no-op
    # discipline, src/be_db_gateway.erl:158-184)
    _merge(t, spark, [("b", 2, "o2")], wm=2)
    log3 = t.read_changelog(spark, 3)
    assert log3.count() == 0


def test_replayed_merge_emits_no_changelog(spark, tmp_path):
    t = ParquetMergeTarget(str(tmp_path / "inv3"))
    _merge(t, spark, [("a", 1, "o1")], wm=5)
    v = t.current_version()
    _merge(t, spark, [("a", 9, "zz")], wm=5)  # same watermark: replay, skipped
    assert t.current_version() == v
    assert t.read_changelog(spark, v + 1) is None


def test_delete_via_filtering_fold(spark, tmp_path):
    """A fold that drops keys (retention purge) must surface deletes with
    the BEFORE image."""
    t = ParquetMergeTarget(str(tmp_path / "inv4"))
    _merge(t, spark, [("a", 1, "o1"), ("b", 1, "o2")], wm=0)
    upd = spark.createDataFrame([("b", 2, "o2b")], ["address", "block", "owner"])
    t.merge_with(
        spark,
        upd,
        lambda target, u: merge_latest(target, u, KEYS, ("block",)).filter(col("address") != "a"),
        watermark=1,
        changelog_keys=KEYS,
    )
    log = t.read_changelog(spark, 2)
    rows = {r.address: r for r in log.collect()}
    assert rows["a"]["__op"] == "delete" and rows["a"].owner == "o1"
    assert rows["b"]["__op"] == "update"
    assert F  # keep the import referenced


def test_time_travel_and_vacuum(spark, tmp_path):
    t = ParquetMergeTarget(str(tmp_path / "tt"))
    _merge(t, spark, [("a", 1, "o1")], wm=0)
    _merge(t, spark, [("a", 2, "o2"), ("b", 2, "ob")], wm=1)
    _merge(t, spark, [("a", 3, "o3")], wm=2)
    assert t.versions() == [1, 2, 3]

    # time travel: every retained version readable as-of
    assert _snapshot(t.read(spark, version=1)) == {"a": (1, "o1")}
    assert _snapshot(t.read(spark, version=2)) == {"a": (2, "o2"), "b": (2, "ob")}
    assert _snapshot(t.read(spark)) == {"a": (3, "o3"), "b": (2, "ob")}

    removed = t.vacuum(keep_last=1)
    assert removed == [1, 2]
    assert t.versions() == [3]
    assert _snapshot(t.read(spark)) == {"a": (3, "o3"), "b": (2, "ob")}
    import pytest as _pytest

    with _pytest.raises(FileNotFoundError):
        t.read(spark, version=1)
    # vacuumed changelog segments are gone too; current's remains
    assert t.read_changelog(spark, 1) is None
    assert t.read_changelog(spark, 3) is not None


def test_changelog_detects_submillisecond_update(spark, tmp_path):
    """to_json serializes timestamps at millisecond precision, so a hash-of-
    JSON diff would drop an update that only moves microseconds; the struct
    eqNullSafe diff must emit it."""
    from datetime import datetime

    t = ParquetMergeTarget(str(tmp_path / "ts"))

    def m(rows, wm):
        upd = spark.createDataFrame(rows, ["k", "ts"])
        # full-replace fold: the new state IS the updates
        return t.merge_with(spark, upd, lambda tgt, u: u, watermark=wm, changelog_keys=("k",))

    m([("a", datetime(2024, 1, 1, 0, 0, 0, 123000))], wm=0)
    m([("a", datetime(2024, 1, 1, 0, 0, 0, 123400))], wm=1)  # same millisecond
    log = t.read_changelog(spark, 2)
    ops = {(r.k, r["__op"]) for r in log.collect()}
    assert ops == {("a", "update")}, ops


def test_changelog_null_fields_equal_no_spurious_rows(spark, tmp_path):
    """Rows with NULL fields that did not change must not appear in the
    changelog (inner-null equality must be null-safe)."""
    t = ParquetMergeTarget(str(tmp_path / "nulls"))

    def m(rows, wm):
        upd = spark.createDataFrame(rows, ["k", "x", "y"])
        return t.merge_with(spark, upd, lambda tgt, u: u, watermark=wm, changelog_keys=("k",))

    m([("a", None, "v"), ("b", "w", None)], wm=0)
    m([("a", None, "v"), ("b", "w", None)], wm=1)  # identical state
    log = t.read_changelog(spark, 2)
    assert log.count() == 0, log.collect()
    # and a null -> value transition IS an update
    m([("a", "now-set", "v"), ("b", "w", None)], wm=2)
    ops = {(r.k, r["__op"]) for r in t.read_changelog(spark, 3).collect()}
    assert ops == {("a", "update")}, ops


def test_uncommitted_version_is_not_a_snapshot(spark, tmp_path):
    """A crashed merge leaves a v=N+1 data dir with no pointer flip: it must
    not be listed, readable, or counted against vacuum's keep budget."""
    import os as _os

    t = ParquetMergeTarget(str(tmp_path / "crash"))
    _merge(t, spark, [("a", 1, "o1")], wm=0)
    _merge(t, spark, [("a", 2, "o2")], wm=1)
    assert t.current_version() == 2

    # simulate the crash: data for v=3 on disk, pointer still at 2
    orphan = tmp_path / "crash" / "v=3"
    orphan.mkdir()
    (orphan / "part-00000.parquet").write_bytes(b"partial garbage")

    assert t.versions() == [1, 2]
    import pytest as _pytest

    with _pytest.raises(FileNotFoundError):
        t.read(spark, version=3)
    # vacuum budget counts committed versions only: keep_last=1 keeps v=2
    assert t.vacuum(keep_last=1) == [1]
    assert t.versions() == [2]
    assert _snapshot(t.read(spark)) == {"a": (2, "o2")}
    # the next successful merge simply overwrites the orphan dir
    _merge(t, spark, [("a", 3, "o3")], wm=2)
    assert t.current_version() == 3
    assert _snapshot(t.read(spark, version=3)) == {"a": (3, "o3")}
