"""Zone-map manifest: skipping must be a strict optimization (same rows as
a full-scan filter), prune aggressively on range-clustered data, update
incrementally after appends, and never skip files it has no stats for."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from blockchain_etl_spark.sources.manifest import (
    _MANIFEST,
    pruned_file_count,
    read_skipping,
    update_manifest,
)
from tests.conftest import SF_DIR


def _write_clustered(spark, out):
    """Events written range-clustered by ts: each file covers a narrow
    time slice — the layout write_zordered/repartitionByRange produces."""
    ev = spark.read.parquet(os.path.join(SF_DIR, "events.parquet"))
    ev.repartitionByRange(8, "ts").sortWithinPartitions("ts").write.mode(
        "overwrite"
    ).parquet(out)
    return ev


def test_skipping_equals_full_scan_filter(spark, tmp_path):
    out = str(tmp_path / "events")
    ev = _write_clustered(spark, out)
    update_manifest(out, ["ts", "user_id"])

    lo, hi = [r[0] for r in ev.selectExpr(
        "timestampadd(HOUR, 100, min(ts))"
    ).collect()][0], [r[0] for r in ev.selectExpr(
        "timestampadd(HOUR, 130, min(ts))"
    ).collect()][0]

    skipped = read_skipping(spark, out, "ts", lo, hi)
    full = spark.read.parquet(out).filter((F.col("ts") >= lo) & (F.col("ts") <= hi))
    assert skipped.count() == full.count() > 0
    a = sorted(r.event_id for r in skipped.select("event_id").collect())
    b = sorted(r.event_id for r in full.select("event_id").collect())
    assert a == b

    kept, total = pruned_file_count(out, "ts", lo, hi)
    assert total >= 8 and kept < total, (kept, total)
    # the reader's actual file set matches the planning metric
    assert len(skipped.inputFiles()) == kept


def test_unbounded_and_empty_ranges(spark, tmp_path):
    out = str(tmp_path / "ev2")
    ev = _write_clustered(spark, out)
    update_manifest(out, ["ts"])
    # unbounded probe reads everything
    assert read_skipping(spark, out, "ts").count() == ev.count()
    # a range before all data prunes every file but returns correct empty
    import datetime

    lo = datetime.datetime(1990, 1, 1)
    hi = datetime.datetime(1990, 1, 2)
    df = read_skipping(spark, out, "ts", lo, hi)
    assert df.count() == 0
    assert "event_id" in df.columns


def test_incremental_update_reads_only_new_footers(spark, tmp_path, monkeypatch):
    out = str(tmp_path / "ev3")
    _write_clustered(spark, out)
    update_manifest(out, ["ts"])
    n_before = len(json.load(open(os.path.join(out, _MANIFEST)))["files"])

    # append one more file
    ev = spark.read.parquet(os.path.join(SF_DIR, "events.parquet"))
    ev.limit(10).coalesce(1).write.mode("append").parquet(out)

    import blockchain_etl_spark.sources.manifest as M

    calls = []
    orig = M._file_stats

    def counting(path, cols):
        calls.append(path)
        return orig(path, cols)

    monkeypatch.setattr(M, "_file_stats", counting)
    m = update_manifest(out, ["ts"])
    assert len(m["files"]) == n_before + 1
    assert len(calls) == 1, calls  # only the new file's footer was opened


def test_files_without_stats_are_never_skipped(spark, tmp_path):
    out = str(tmp_path / "ev4")
    _write_clustered(spark, out)
    m = update_manifest(out, ["ts"])
    # simulate a stats-less file (e.g. written by an engine without stats)
    rel = next(iter(m["files"]))
    m["files"][rel] = {}
    with open(os.path.join(out, _MANIFEST), "w") as f:
        json.dump(m, f)
    kept, total = pruned_file_count(out, "ts", None, None)
    assert kept == total
    import datetime

    kept2, _ = pruned_file_count(
        out, "ts", datetime.datetime(1990, 1, 1), datetime.datetime(1990, 1, 2)
    )
    assert kept2 == 1  # everything skipped EXCEPT the stats-less file


def test_zorder_plus_manifest_prunes_on_both_columns(spark, tmp_path):
    """write_zordered + zone maps: a range probe on EITHER interleaved
    column prunes files (single-column sort would only help one)."""
    from blockchain_etl_spark.sources.lake import write_zordered

    # z-order pays when the interleaved columns span COMPARABLE bit
    # widths — bucket the wide money column down to the user id's scale
    # first (the same normalization Delta's Z-ORDER applies internally)
    ev = spark.read.parquet(os.path.join(SF_DIR, "events.parquet")).select(
        "event_id",
        "user_id",
        (F.round(F.col("value") * 100).cast("long") / 512).cast("long").alias("cbkt"),
    )
    out = str(tmp_path / "zev")
    write_zordered(ev, out, ["user_id", "cbkt"], num_files=8)

    u_lo, u_hi = 10, 40
    kept_u, total = pruned_file_count(out, "user_id", u_lo, u_hi)
    assert total >= 8
    assert kept_u < total, (kept_u, total)

    c_lo, c_hi = 5, 40
    kept_c, _ = pruned_file_count(out, "cbkt", c_lo, c_hi)
    assert kept_c < total, (kept_c, total)

    # pruning is a strict optimization on both probes
    for colname, lo, hi in (("user_id", u_lo, u_hi), ("cbkt", c_lo, c_hi)):
        skipped = read_skipping(spark, out, colname, lo, hi)
        full = spark.read.parquet(out).filter(
            (F.col(colname) >= lo) & (F.col(colname) <= hi)
        )
        assert skipped.count() == full.count() > 0
