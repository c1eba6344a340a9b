"""CLI smoke tests — each subcommand drives the real code paths on tiny
fixture data."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import Row

from blockchain_etl_spark.__main__ import main
from blockchain_etl_spark.sources.blockchain import SCHEMAS
from tests.fixtures_blockchain import gen_transactions


@pytest.fixture(scope="module")
def ingested(spark, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("cli")
    _, txns = gen_transactions()
    df = spark.createDataFrame([Row(**t) for t in txns], schema=SCHEMAS["transactions"])
    in_dir = str(tmp / "in")
    os.makedirs(in_dir)
    df.coalesce(1).write.parquet(os.path.join(in_dir, "chunk=0"))
    out = str(tmp / "out")
    assert main(["ingest", "--input", in_dir + "/chunk=*", "--out", out, "--inventories"]) == 0
    return out


def test_cli_ingest_compact_snapshot_backfill(ingested, capsys):
    assert main(["compact", "--out", ingested, "--table", "transactions",
                 "--blocks-per-bucket", "50"]) == 0
    assert main(["snapshot", "--out", ingested, "--height", "60"]) == 0
    assert main(["backfill", "gateway_payer", "--out", ingested]) == 0
    out = capsys.readouterr().out
    assert "_backfills/gateway_payer" in out
    assert os.path.isdir(os.path.join(ingested, "_backfills", "gateway_payer"))


def test_cli_query(capsys):
    assert main(["query", "sync_resume_point"]) == 0
    assert "sync_resume_point: 1 rows" in capsys.readouterr().out
    assert main(["query", "no_such_query"]) == 2


def test_cli_corpus_release(tmp_path, capsys):
    out = str(tmp_path / "release")
    assert main(["corpus", "--out", out]) == 0
    printed = capsys.readouterr().out
    for sub in ("clean", "pruned", "representatives", "funnel", "card", "lineage"):
        assert os.path.isdir(os.path.join(out, sub)), sub
        assert f"{sub}: " in printed


def test_cli_sql(ingested, capsys):
    assert main(["sql", "SELECT MAX(block) AS h FROM transactions", "--out", ingested]) == 0
    out = capsys.readouterr().out
    assert "'h':" in out
    # inventory views register when maintained
    assert main([
        "sql",
        "SELECT COUNT(*) AS n FROM accounts_inventory",
        "--out", ingested,
    ]) == 0
    assert "'n':" in capsys.readouterr().out


def test_cli_materialize_versions(tmp_path, capsys):
    out = str(tmp_path / "mat")
    assert main(["materialize", "pricing_summary", "--out", out]) == 0
    first = capsys.readouterr().out
    assert "pricing_summary v1:" in first
    # refresh publishes the next version atomically
    assert main(["materialize", "pricing_summary", "--out", out]) == 0
    assert "pricing_summary v2:" in capsys.readouterr().out
    assert os.path.isdir(os.path.join(out, "_materialized", "pricing_summary", "v=2"))


def test_cli_follow_tracks_live_writer(spark, tmp_path, capsys):
    """End-to-end follower CLI: a writer merges versions into a live
    target (some landing WHILE the follower polls); the follow command
    catches the view up, prints the derived metrics, and a re-run after
    more writes resumes from the stored watermark."""
    import threading
    import time

    from blockchain_etl_spark.operators.merge import ParquetMergeTarget

    src_dir = str(tmp_path / "live_src")
    view_dir = str(tmp_path / "live_view")
    t = ParquetMergeTarget(src_dir)

    states = [
        [(1, "a", 10), (2, "a", 5), (3, "b", 7)],
        [(1, "a", 12), (2, "b", 5), (3, "b", 7), (4, "c", 1)],
        [(1, "a", 12), (4, "c", 2)],
    ]

    def merge_state(i):
        upd = spark.createDataFrame(states[i], ["id", "grp", "qty"])
        t.merge_with(spark, upd, lambda _t, u: u, watermark=i, changelog_keys=("id",))

    merge_state(0)

    def writer():
        for i in (1, 2):
            time.sleep(0.4)
            merge_state(i)

    w = threading.Thread(target=writer)
    w.start()
    assert main([
        "follow", "--source", src_dir, "--view", view_dir,
        "--group-keys", "grp", "--sum-cols", "qty",
        "--interval", "0.3", "--max-idle", "6",
    ]) == 0
    w.join()
    out = capsys.readouterr().out
    assert "folded" in out and "'grp'" in out

    # final catch-up run (no writer): view must equal the recompute
    assert main([
        "follow", "--source", src_dir, "--view", view_dir,
        "--group-keys", "grp", "--sum-cols", "qty",
        "--interval", "0.05", "--max-idle", "1",
    ]) == 0
    out = capsys.readouterr().out
    assert f"view at source v{t.current_version()}" in out
    from pyspark.sql import functions as F

    expect = {
        r.grp: (r.n, r.q)
        for r in t.read(spark)
        .groupBy("grp")
        .agg(F.count("*").alias("n"), F.sum("qty").alias("q"))
        .collect()
    }
    for grp, (n, q) in expect.items():
        assert f"'grp': '{grp}', 'n_rows': {n}, 'qty': {q}" in out, (grp, out)


def test_cli_vec_compact(spark, tmp_path, capsys):
    """vec-compact folds an upserted IVF index to one segment per cell
    and serves identical results afterwards."""
    from pyspark.sql import functions as F

    from blockchain_etl_spark.operators.ann_index import IVFIndex
    from tests.conftest import SF_DIR

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    path = str(tmp_path / "vec")
    idx = IVFIndex(path)
    idx.build(spark, emb.filter(F.col("vec_id") < 40), n_cells=4)
    idx.upsert(spark, emb.filter((F.col("vec_id") >= 40) & (F.col("vec_id") < 80)), watermark=1)

    queries = emb.filter(F.col("vec_id") < 5).select(F.col("vec_id").alias("qid"), "embedding")
    before = {(r.qid, r.neighbor_id, r.rank) for r in idx.query(spark, queries, k=3, probes=4).collect()}

    assert main(["vec-compact", "--path", path, "--kind", "ivf"]) == 0
    out = capsys.readouterr().out
    assert "gen 1 -> 2" in out
    after = {(r.qid, r.neighbor_id, r.rank) for r in idx.query(spark, queries, k=3, probes=4).collect()}
    assert after == before


def test_cli_vec_health(spark, tmp_path, capsys):
    """vec-health reports the drift metrics and the rebuild decision."""
    from pyspark.sql import functions as F

    from blockchain_etl_spark.operators.ann_index import IVFIndex
    from tests.conftest import SF_DIR

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    path = str(tmp_path / "vech")
    IVFIndex(path).build(spark, emb.filter(F.col("vec_id") < 60), n_cells=4)
    assert main(["vec-health", "--path", path, "--kind", "ivf", "--n-queries", "6"]) == 0
    out = capsys.readouterr().out
    assert "rebuild: " in out and "upserted_frac: 0.0" in out


def test_cli_splits(spark, tmp_path, capsys):
    """splits reads the MAINTAINED assignment from a DocIngest layout."""
    from blockchain_etl_spark.streaming.docs import DocIngest

    ing = DocIngest(str(tmp_path / "ing"), component_index=True)
    tail = " ".join(f"w{i}x{i * 7 % 5}" for i in range(200))
    rows = [(i, f"{tail} doc{i}") for i in range(4)]
    ing.process_batch(spark.createDataFrame(rows, ["doc_id", "text"]), batch_id=1)
    assert main(["splits", "--dir", str(tmp_path / "ing"), "--limit", "5"]) == 0
    out = capsys.readouterr().out
    assert "'split':" in out and "n_components" in out
    # empty layout → clear failure, not a stack trace
    assert main(["splits", "--dir", str(tmp_path / "nothing")]) == 1


def test_cli_drift(spark, tmp_path, capsys):
    """drift reads the MAINTAINED distribution report from a DocIngest
    layout — no corpus rescan; empty layout fails clearly."""
    from blockchain_etl_spark.streaming.docs import DocIngest

    ing = DocIngest(str(tmp_path / "dr"), drift_state=True)
    tail = " ".join(f"w{i}x{i * 7 % 5}" for i in range(200))
    rows = [(i, f"{tail} doc{i}") for i in range(4)]
    ing.process_batch(spark.createDataFrame(rows, ["doc_id", "text"]), batch_id=1)
    assert main(["drift", "--dir", str(tmp_path / "dr")]) == 0
    out = capsys.readouterr().out
    assert "kl_ab_millibits:" in out and "folded through batch watermark 1" in out
    assert main(["drift", "--dir", str(tmp_path / "nothing")]) == 1


def test_cli_search(spark, tmp_path, capsys):
    """search ranks BM25 probes from the MAINTAINED lexical index of a
    DocIngest layout — no corpus rescan; empty layout fails clearly."""
    from blockchain_etl_spark.streaming.docs import DocIngest

    ing = DocIngest(str(tmp_path / "lx"), lexical_index=True)
    tail = " ".join(f"w{i}x{i * 7 % 5}" for i in range(200))
    rows = [(i, f"{tail} doc{i}") for i in range(4)]
    ing.process_batch(spark.createDataFrame(rows, ["doc_id", "text"]), batch_id=1)
    assert main(["search", "--dir", str(tmp_path / "lx"), "--qmod", "1"]) == 0
    out = capsys.readouterr().out
    assert "qid=0 rank=1" in out and "folded through batch watermark 1" in out
    assert main(["search", "--dir", str(tmp_path / "nothing")]) == 1


def test_cli_contamination_and_novelty(spark, tmp_path, capsys):
    """contamination + novelty read their MAINTAINED planes from a
    DocIngest layout — no corpus rescan; empty layouts fail clearly."""
    from blockchain_etl_spark.streaming.docs import DocIngest

    d = str(tmp_path / "cn")
    ing = DocIngest(
        d,
        contamination_screen=True,
        contamination_quarantine=2,
        novelty_state=True,
    )
    bench = spark.createDataFrame(
        [("evalA", 900, "the quick brown fox jumps over the lazy dog tonight")],
        ["source", "doc_id", "text"],
    )
    ing.contamination.build(spark, bench)
    tail = " ".join(f"w{i}x{i * 7 % 5}" for i in range(200))
    rows = [(i, f"{tail} doc{i}") for i in range(4)] + [
        (9, "intro words then the quick brown fox jumps over the lazy dog "
            "tonight and some trailing filler words to pass quality gates")
    ]
    ing.process_batch(spark.createDataFrame(rows, ["doc_id", "text"]), batch_id=1)

    assert main(["contamination", "--dir", d]) == 0
    out = capsys.readouterr().out
    assert "benchmark=evalA" in out and "quarantined docs: 1" in out
    assert main(["novelty", "--dir", d]) == 0
    out = capsys.readouterr().out
    assert "batch=1" in out and "batch_novelty_ppm=" in out
    assert main(["contamination", "--dir", str(tmp_path / "none")]) == 1
    assert main(["novelty", "--dir", str(tmp_path / "none")]) == 1


def test_cli_ingest_docs_stream(spark, tmp_path, capsys):
    """ingest-docs streams crawl files through the document pipeline and
    resumes from the streaming checkpoint on re-invocation."""
    import pyspark.sql.functions as F

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text", "lang"
    )
    crawls = str(tmp_path / "crawls")
    docs.filter(F.col("doc_id") < 200).write.parquet(crawls + "/c0.parquet")
    out = str(tmp_path / "lake")
    assert main(["ingest-docs", "--input", crawls + "/c*.parquet",
                 "--out", out, "--novelty"]) == 0
    txt = capsys.readouterr().out
    assert "corpus through batch watermark 0" in txt
    # a later crawl file: only the delta is processed
    docs.filter(F.col("doc_id") >= 200).write.parquet(crawls + "/c1.parquet")
    assert main(["ingest-docs", "--input", crawls + "/c*.parquet",
                 "--out", out, "--novelty"]) == 0
    txt = capsys.readouterr().out
    assert "corpus through batch watermark 1" in txt
    assert main(["novelty", "--dir", out]) == 0
    assert "batch=1" in capsys.readouterr().out
