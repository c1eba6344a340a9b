"""blockfiles Python DataSource: file pruning, ordered streaming, gap stall.

The pruning and ordering logic is pure Python (testable without a JVM);
the end-to-end reads go through spark.read / readStream to prove the
DataSource registration and wire format.
"""

from __future__ import annotations

import json
import os
import time

import pytest

from blockchain_etl_spark.sources.blockfiles import (
    BlockFilesBatchReader,
    BlockFilesDataSource,
    BlockFilesStreamReader,
    list_block_files,
)


def _write_blockfile(dirpath: str, lo: int, hi: int) -> str:
    path = os.path.join(dirpath, f"blocks_{lo}_{hi}.jsonl")
    with open(path, "w") as f:
        for h in range(lo, hi + 1):
            f.write(
                json.dumps(
                    {
                        "height": h,
                        "block_hash": f"hash{h}",
                        "time": 1600000000 + h,
                        "txns": [{"type": "payment_v2", "fee": h}],
                    }
                )
                + "\n"
            )
    return path


@pytest.fixture()
def blockdir(tmp_path):
    d = str(tmp_path / "blocks")
    os.makedirs(d)
    _write_blockfile(d, 1, 10)
    _write_blockfile(d, 11, 25)
    _write_blockfile(d, 26, 40)
    (tmp_path / "blocks" / "sidecar.tmp").write_text("ignore me")
    return d


def test_list_ignores_non_matching_and_sorts(blockdir):
    files = list_block_files(blockdir)
    assert [(f.lo, f.hi) for f in files] == [(1, 10), (11, 25), (26, 40)]


def test_height_pushdown_prunes_files(blockdir):
    from pyspark.sql.datasource import GreaterThanOrEqual, LessThan

    r = BlockFilesBatchReader(blockdir)
    residual = list(r.pushFilters([GreaterThanOrEqual(("height",), 12)]))
    assert residual == []  # fully handled at file level
    assert [(f.lo, f.hi) for f in r.pruned_files()] == [(11, 25), (26, 40)]

    r2 = BlockFilesBatchReader(blockdir)
    list(r2.pushFilters([GreaterThanOrEqual(("height",), 12), LessThan(("height",), 26)]))
    assert [(f.lo, f.hi) for f in r2.pruned_files()] == [(11, 25)]


def test_non_height_filters_are_residual(blockdir):
    from pyspark.sql.datasource import EqualTo

    r = BlockFilesBatchReader(blockdir)
    residual = list(r.pushFilters([EqualTo(("block_hash",), "hash3")]))
    assert len(residual) == 1  # returned for Spark to re-apply


def test_stream_reader_consumes_contiguous_prefix_only(blockdir, tmp_path):
    r = BlockFilesStreamReader(blockdir, start_height=1)
    assert r.initialOffset() == {"next_height": 1}
    rows, off = r.read({"next_height": 1})
    assert off == {"next_height": 41}
    assert [x[0] for x in rows] == list(range(1, 41))

    # a gap file (45-50 with 41-44 missing) must NOT be consumed
    _write_blockfile(blockdir, 45, 50)
    rows, off = r.read(off)
    assert list(rows) == [] and off == {"next_height": 41}

    # once the missing range lands, both are consumed in order
    _write_blockfile(blockdir, 41, 44)
    rows, off = r.read(off)
    assert [x[0] for x in rows] == list(range(41, 51))
    assert off == {"next_height": 51}


def test_stream_replay_between_offsets_is_deterministic(blockdir):
    r = BlockFilesStreamReader(blockdir, start_height=1)
    rows = list(r.readBetweenOffsets({"next_height": 5}, {"next_height": 13}))
    assert [x[0] for x in rows] == list(range(5, 13))


def test_batch_read_end_to_end(spark, blockdir):
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(BlockFilesDataSource)
    df = spark.read.format("blockfiles").option("path", blockdir).load()
    assert df.count() == 40
    got = df.filter("height >= 30").selectExpr("count(*) AS n", "min(height) AS mn").first()
    assert (got["n"], got["mn"]) == (11, 30)
    row = df.filter("height = 7").first()
    assert row["block_hash"] == "hash7"
    assert json.loads(row["txns"])[0]["fee"] == 7


def test_stream_read_end_to_end(spark, blockdir, tmp_path):
    spark.dataSource.register(BlockFilesDataSource)
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    stream = (
        spark.readStream.format("blockfiles")
        .option("path", blockdir)
        .option("startHeight", 1)
        .load()
    )
    q = (
        stream.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    time.sleep(0.2)
    df = spark.read.parquet(out)
    assert df.count() == 40
    assert df.agg({"height": "max"}).first()[0] == 40


def test_blockfiles_stream_feeds_ingest(spark, tmp_path):
    """The full follower path through the source plugin: JSONL block
    archives -> blockfiles stream -> txn explode -> ordered foreachBatch
    ingest == the batch pipeline over the same transactions."""
    from pyspark.sql import Row

    from blockchain_etl_spark.sources.blockchain import SCHEMAS
    from blockchain_etl_spark.streaming.ingest import TABLES, BlockIngest, derive_tables
    from tests.fixtures_blockchain import gen_transactions

    blocks, txns = gen_transactions()
    by_height: dict[int, list] = {}
    for t in txns:
        by_height.setdefault(t["block"], []).append(t)
    block_time = {b["height"]: b["time"] for b in blocks}

    d = str(tmp_path / "archive")
    os.makedirs(d)
    # three archives covering 1..120 contiguously
    for lo, hi in ((1, 40), (41, 90), (91, 120)):
        with open(os.path.join(d, f"blocks_{lo}_{hi}.jsonl"), "w") as f:
            for h in range(lo, hi + 1):
                f.write(
                    json.dumps(
                        {
                            "height": h,
                            "block_hash": f"bh{h:05d}",
                            "time": block_time[h],
                            "txns": [
                                {
                                    "hash": t["hash"],
                                    "type": t["type"],
                                    "fields": t["fields"],
                                }
                                for t in by_height.get(h, [])
                            ],
                        }
                    )
                    + "\n"
                )

    out_dir = str(tmp_path / "out")
    ing = BlockIngest(out_dir)
    ing.run_blockfiles_stream(spark, d)

    txn_df = spark.createDataFrame([Row(**t) for t in txns], schema=SCHEMAS["transactions"])
    batch_tables = derive_tables(txn_df)
    assert ing.sync_height() == 120

    def _set(df):
        return {
            tuple(tuple(v) if isinstance(v, list) else v for v in r)
            for r in df.collect()
        }

    for name in TABLES:
        got = _set(ing.read_table(spark, name))
        want = _set(batch_tables[name])
        assert got == want, f"{name}: {len(got)} vs {len(want)}"


def test_stream_restart_resumes_from_checkpoint(spark, blockdir, tmp_path):
    """Kill the stream, land more archives, restart with the SAME
    checkpoint: the committed height offset resumes — no duplicates, no
    gaps (exactly-once at the sink for an idempotent file sink)."""
    spark.dataSource.register(BlockFilesDataSource)
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def run_once():
        q = (
            spark.readStream.format("blockfiles")
            .option("path", blockdir)
            .option("startHeight", 1)
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()
    df = spark.read.parquet(out)
    assert df.count() == 40

    _write_blockfile(blockdir, 41, 55)
    run_once()
    df = spark.read.parquet(out)
    heights = sorted(r["height"] for r in df.select("height").collect())
    assert heights == list(range(1, 56))  # each height exactly once


def test_corrupt_line_raises_not_skips(spark, blockdir):
    """A ledger feed must fail loudly on a corrupt archive line — silently
    skipping blocks would corrupt every downstream running aggregate."""
    spark.dataSource.register(BlockFilesDataSource)
    with open(os.path.join(blockdir, "blocks_41_42.jsonl"), "w") as f:
        f.write('{"height": 41, "block_hash": "h41", "time": 1, "txns": []}\n')
        f.write("THIS IS NOT JSON\n")
    with pytest.raises(Exception):
        (
            spark.read.format("blockfiles")
            .option("path", blockdir)
            .load()
            .count()
        )


def test_batch_writer_roundtrip(spark, blockdir, tmp_path):
    """read archives -> write through the blockfiles SINK -> read back:
    identical rows, and the published archive is height-sorted contiguous."""
    spark.dataSource.register(BlockFilesDataSource)
    out = str(tmp_path / "written")
    os.makedirs(out)
    src = spark.read.format("blockfiles").option("path", blockdir).load()
    src.write.format("blockfiles").option("path", out).mode("append").save()

    files = list_block_files(out)
    assert [(f.lo, f.hi) for f in files] == [(1, 40)]
    back = spark.read.format("blockfiles").option("path", out).load()
    assert sorted(r["height"] for r in back.collect()) == list(range(1, 41))
    # height-sorted inside the archive
    with open(files[0].path) as f:
        heights = [json.loads(line)["height"] for line in f]
    assert heights == sorted(heights)
    # no staging leftovers
    assert os.listdir(os.path.join(out, "_staging")) == []


def test_publish_rejects_overlapping_range(tmp_path):
    """Publishing an archive whose height range partially overlaps an
    existing archive must fail loudly (duplicate heights with possibly
    different content); rewriting the IDENTICAL range stays allowed — the
    streaming replay contract."""
    from blockchain_etl_spark.sources.blockfiles import (
        BlockFilesWriter,
        _ArchivePartCommit,
    )

    out = str(tmp_path / "arch")
    os.makedirs(out)
    w = BlockFilesWriter(out)

    def staged(lo, hi):
        os.makedirs(w.staging, exist_ok=True)
        p = os.path.join(w.staging, f"part-{lo}-{hi}.jsonl")
        with open(p, "w") as f:
            for h in range(lo, hi + 1):
                f.write(
                    json.dumps(
                        {"height": h, "block_hash": f"h{h}", "time": h, "txns": None}
                    )
                    + "\n"
                )
        return _ArchivePartCommit(tmp_path=p, lo=lo, hi=hi, count=hi - lo + 1)

    w._publish([staged(1, 10)])
    assert [(f.lo, f.hi) for f in list_block_files(out)] == [(1, 10)]
    # identical-range rewrite: allowed (idempotent replay)
    w._publish([staged(1, 10)])
    assert [(f.lo, f.hi) for f in list_block_files(out)] == [(1, 10)]
    # partial overlap: refused before the rename
    import pytest as _pytest

    with _pytest.raises(RuntimeError, match="range collision"):
        w._publish([staged(5, 15)])
    assert [(f.lo, f.hi) for f in list_block_files(out)] == [(1, 10)]
    # fresh range: fine
    w._publish([staged(11, 15)])
    assert sorted((f.lo, f.hi) for f in list_block_files(out)) == [(1, 10), (11, 15)]


def test_stream_writer_one_archive_per_batch(spark, blockdir, tmp_path):
    """Streaming sink publishes one contiguous archive per microbatch;
    a second availableNow run with new data appends the next archive."""
    spark.dataSource.register(BlockFilesDataSource)
    out = str(tmp_path / "written")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(out)

    def run_once():
        q = (
            spark.readStream.format("blockfiles")
            .option("path", blockdir)
            .option("startHeight", 1)
            .load()
            .writeStream.format("blockfiles")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()
    assert [(f.lo, f.hi) for f in list_block_files(out)] == [(1, 40)]

    _write_blockfile(blockdir, 41, 50)
    run_once()
    got = sorted((f.lo, f.hi) for f in list_block_files(out))
    assert got == [(1, 40), (41, 50)]
    back = spark.read.format("blockfiles").option("path", out).load()
    assert back.count() == 50
