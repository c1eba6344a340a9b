"""CLI — the reference ships operational commands (scripts/extensions/
backfill → be_cli_backfill; genesis load via be_cli_genesis); this module
is their engine-side equivalent:

    python -m blockchain_etl_spark ingest --input DIR --out DIR [--inventories]
    python -m blockchain_etl_spark compact --out DIR [--table NAME]
    python -m blockchain_etl_spark snapshot --out DIR --height H
    python -m blockchain_etl_spark backfill {gateway_payer,missing_actors,burn_prices} --out DIR
    python -m blockchain_etl_spark query NAME [--sf-dir DIR] [--write DIR]
    python -m blockchain_etl_spark corpus --sf-dir DIR --out DIR
    python -m blockchain_etl_spark follow --source DIR --view DIR [--group-keys K,..] [--sum-cols C,..]
    python -m blockchain_etl_spark vec-compact --path DIR [--kind ivf|ivfpq]

Backfills run over the ingested table directories and write their repaired
output under <out>/_backfills/<name> (history tables are never mutated in
place — the write-audit-publish discipline everywhere else applies here
too).
"""

from __future__ import annotations

import argparse
import sys


def _spark():
    from .session import get_spark

    spark = get_spark("blockchain-etl-spark-cli")
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def cmd_ingest(args) -> int:
    from .sources.blockchain import SCHEMAS
    from .streaming.ingest import BlockIngest

    ing = BlockIngest(args.out, maintain_inventories=args.inventories)
    ing.run_stream(_spark(), args.input, SCHEMAS["transactions"])
    print(f"synced to height {ing.sync_height()}")
    return 0


def _doc_ingest(args, detect_planes: bool = False):
    from .streaming.docs import DocIngest

    vectors, components = args.vectors, args.components
    drift, lexical, novelty = args.drift, args.lexical, args.novelty
    screen, quarantine = args.screen, args.quarantine
    if detect_planes:
        # doctor/release must see EVERY plane the lake actually has: a
        # forgotten flag would make audit() report a stale plane as
        # consistent (it simply would not be listed) and heal/release
        # would skip folding it — the monitoring signal the commands
        # exist for would be silently wrong. Union the flags with the
        # plane directories present on disk.
        import os as _os

        def _has(d: str) -> bool:
            return _os.path.isdir(_os.path.join(args.out, d))

        vectors = vectors or _has("vec_index")
        components = components or _has("comp_index")
        drift = drift or _has("drift_state")
        lexical = lexical or _has("lex_index")
        novelty = novelty or _has("novelty_state")
        screen = screen or _has("contam_index")
        if quarantine is None and _has("quarantine"):
            # threshold value is irrelevant to audit/heal; releasing
            # still takes the policy from the explicit flag
            quarantine = 1
    return DocIngest(
        args.out,
        vector_index=vectors,
        component_index=components,
        drift_state=drift,
        lexical_index=lexical,
        novelty_state=novelty,
        contamination_screen=screen,
        contamination_quarantine=quarantine,
    )


def cmd_ingest_docs(args) -> int:
    """Crawler-facing ingest: stream crawl parquet files through the full
    document pipeline (quality gate -> dedup -> corpus append + every
    enabled maintained plane). Re-invocation picks up only files that
    arrived since the last run (streaming checkpoint)."""
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    ing = _doc_ingest(args)
    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("text", StringType()),
            StructField("lang", StringType()),
        ]
    )
    ing.run_stream(_spark(), args.input, schema)
    print(f"corpus through batch watermark {ing.hashes.watermark()}")
    return 0


def cmd_doctor(args) -> int:
    """Cross-plane watermark audit — and heal — for a DocIngest dir:
    report every maintained plane's committed watermark, then (with
    --heal) roll stragglers forward from the durable corpus chunks.
    Exit 0 when the pipeline ends consistent, 1 otherwise (cron-able).
    Planes are auto-detected from the lake's directories (union of any
    explicit flags) — a forgotten flag must not hide a stale plane."""
    ing = _doc_ingest(args, detect_planes=True)
    rep = ing.audit()
    for k, v in sorted(rep["planes"].items()):
        print(f"  {k}: {v}")
    print(f"target batch: {rep['target']}")
    if rep["stragglers"]:
        print(f"stragglers: {rep['stragglers']}")
    if rep["ahead"]:
        print(f"ahead (need their crawl replayed from the source): {rep['ahead']}")
    if rep["unhealable"]:
        print(f"unhealable (chunk lost): {rep['unhealable']}")
    if args.heal and rep["stragglers"]:
        healed = ing.doctor(_spark())
        print(f"healed batches: {healed}")
        rep = ing.audit()
    print(f"consistent: {rep['consistent']}")
    return 0 if rep["consistent"] else 1


def cmd_release_quarantine(args) -> int:
    """Re-screen every quarantined doc under the CURRENT policy (this
    invocation's --quarantine threshold) by re-admitting the set through
    the normal ingest path as batch --batch; still-contaminated docs are
    re-quarantined, the rest enter the corpus and every plane (planes
    auto-detected from the lake's directories, so a forgotten flag
    cannot make the released batch skip an existing index; the
    quarantine THRESHOLD is the policy being applied and must be given
    explicitly)."""
    if args.quarantine is None:
        raise SystemExit(
            "release-quarantine: --quarantine THRESHOLD is required — it "
            "IS the policy the quarantined docs are re-screened under"
        )
    spark = _spark()
    ing = _doc_ingest(args, detect_planes=True)
    n = ing.release_quarantine(spark, args.batch)
    nq = ing.read_quarantine(spark).select("doc_id").distinct().count()
    print(f"re-screened {n} quarantined docs; still quarantined: {nq}")
    return 0


def cmd_compact(args) -> int:
    from .streaming.ingest import TABLES, BlockIngest

    ing = BlockIngest(args.out)
    spark = _spark()
    for name in [args.table] if args.table else TABLES:
        n = ing.compact(spark, name, blocks_per_bucket=args.blocks_per_bucket)
        print(f"{name}: folded {n} blockrange dirs")
    return 0


def cmd_snapshot(args) -> int:
    from .streaming.ingest import BlockIngest

    path = BlockIngest(args.out).write_snapshot(_spark(), args.height)
    print(path)
    return 0


def cmd_backfill(args) -> int:
    import os

    from .operators.actors import extract_actors
    from .operators.backfills import (
        backfill_burn_prices,
        backfill_gateway_payer,
        backfill_missing_actors,
    )
    from .streaming.ingest import BlockIngest

    spark = _spark()
    ing = BlockIngest(args.out)
    txns = ing.read_table(spark, "transactions")
    if args.job == "gateway_payer":
        out = backfill_gateway_payer(
            ing.read_inventory(spark, "gateways"), ing.read_table(spark, "transaction_actors"), txns
        )
    elif args.job == "missing_actors":
        out = backfill_missing_actors(
            ing.read_table(spark, "transaction_actors"), txns, extract_actors
        )
    else:
        out = backfill_burn_prices(
            ing.read_table(spark, "dc_burns"), ing.read_table(spark, "oracle_prices")
        )
    dest = os.path.join(args.out, "_backfills", args.job)
    out.write.mode("overwrite").parquet(dest)
    print(dest)
    return 0


def cmd_query(args) -> int:
    from .plans.registry import get_queries

    queries = get_queries()
    if args.name not in queries:
        print(f"unknown query {args.name!r}; available: {', '.join(sorted(queries))}", file=sys.stderr)
        return 2
    df = queries[args.name](_spark(), args.sf_dir)
    if args.write:
        df.write.mode("overwrite").parquet(args.write)
        print(args.write)
    else:
        print(f"{args.name}: {df.count()} rows")
    return 0


def cmd_corpus(args) -> int:
    """One-command corpus release — the training-data deliverable: the
    composed prep funnel plus the document-level outputs (cleaned
    canonical corpus, span-pruned text, near-dup representatives) and the
    per-source dataset card, each written as parquet under --out. Every
    stage is a registered, oracle-checked query; this command only
    orchestrates writes."""
    from .plans.registry import get_queries

    spark = _spark()
    queries = get_queries()
    stages = {
        "clean": "doc_clean_corpus",
        "pruned": "doc_boilerplate_prune",
        "representatives": "dedup_cluster_representatives",
        "funnel": "corpus_prep_pipeline",
        "card": "corpus_source_stats",
        "lineage": "corpus_doc_lineage",
    }
    import os

    for sub_dir, name in stages.items():
        out = os.path.join(args.out, sub_dir)
        df = queries[name](spark, args.sf_dir)
        df.write.mode("overwrite").parquet(out)
        print(f"{sub_dir}: {spark.read.parquet(out).count()} rows -> {out}")
    return 0


def cmd_sql(args) -> int:
    """Ad-hoc ANSI SQL over the ingested lakehouse — the engine-side
    equivalent of the reference's Postgres query surface: every history
    table (and inventory, when maintained) registers as a temp view, then
    the statement runs through Spark SQL/Catalyst."""
    import os

    from .streaming.ingest import TABLES, BlockIngest

    spark = _spark()
    ing = BlockIngest(args.out)
    for name in TABLES:
        try:
            ing.read_table(spark, name).createOrReplaceTempView(name)
        except Exception:  # noqa: BLE001 - table not ingested yet
            continue
    # inventories live at <out>/<entity>_inventory (accounts, gateways, ...)
    for d in sorted(os.listdir(args.out)) if os.path.isdir(args.out) else []:
        if d.endswith("_inventory"):
            try:
                ing.read_inventory(spark, d[: -len("_inventory")]).createOrReplaceTempView(d)
            except Exception:  # noqa: BLE001 - empty/unpublished target
                pass
    df = spark.sql(args.statement)
    if args.write:
        df.write.mode("overwrite").parquet(args.write)
        print(args.write)
    else:
        for row in df.limit(args.limit).collect():
            print(row.asDict())
    return 0


def cmd_materialize(args) -> int:
    """Publish a registered query's result as a versioned table
    (write-audit-publish via ParquetMergeTarget): re-running refreshes to
    the next version atomically; readers never see a partial result. The
    operational 'CREATE MATERIALIZED VIEW ... / REFRESH' pair."""
    import os

    from .operators.merge import ParquetMergeTarget
    from .plans.registry import get_queries

    queries = get_queries()
    if args.name not in queries:
        print(f"unknown query {args.name!r}", file=sys.stderr)
        return 2
    spark = _spark()
    df = queries[args.name](spark, args.sf_dir)
    target = ParquetMergeTarget(os.path.join(args.out, "_materialized", args.name))
    result = target.merge_with(spark, df, lambda _t, u: u)
    print(f"{args.name} v{target.current_version()}: {result.count()} rows")
    return 0


def cmd_follow(args) -> int:
    """Run the T6 periodic-tick CDC follower as a user-facing entry point
    (the reference's periodic workers — be_db_stats etc. — as a CLI):
    poll a live merge target's published version, fold every new
    changelog into the maintained count/sum view, exit once the writer
    stays quiet for --max-idle polls. Crash-safe by construction: every
    fold is watermarked, so a restarted follower resumes where it left
    off; a view whose needed changelog segments predate CDC (or were
    vacuumed) re-seeds from a snapshot instead of wedging."""
    from .operators.cdc_view import ChangelogAggregateView, follow
    from .operators.merge import ParquetMergeTarget

    src = ParquetMergeTarget(args.source)
    view = ChangelogAggregateView(
        args.view,
        group_keys=[k for k in args.group_keys.split(",") if k],
        sum_cols=[c for c in args.sum_cols.split(",") if c],
    )
    spark = _spark()
    # heal a missing-changelog gap once up front, then tail live folds
    view.catch_up(spark, src)
    folded = follow(
        view, spark, src, poll_interval_s=args.interval, max_idle_polls=args.max_idle
    )
    print(f"folded {folded} versions; view at source v{view.folded_version()}")
    df = view.read_derived(spark)
    if df is not None:
        for row in df.limit(args.limit).collect():
            print(row.asDict())
    return 0


def cmd_vec_compact(args) -> int:
    """Fold a persisted vector index's per-cell segment pile into one
    consolidated segment per cell (the LSM merge) — the maintenance step
    a continuous upsert stream needs periodically; crash-safe behind the
    generation pointer flip, watermark-preserving for the writer."""
    if args.kind == "ivfpq":
        from .operators.ivfpq_index import IVFPQIndex as Index
    else:
        from .operators.ann_index import IVFIndex as Index

    idx = Index(args.path)
    spark = _spark()
    gen_before = idx._gen()
    idx.compact(spark)
    print(f"compacted {args.kind} index at {args.path}: gen {gen_before} -> {idx._gen()}")
    return 0


def cmd_vec_health(args) -> int:
    """Report a persisted vector index's drift health and the rebuild
    decision: the cheap post-freeze upserted fraction (compaction-proof),
    and — unless the fraction already trips — the measured recall@k vs
    exact brute force over the live corpus. The operational face of the
    quantizer-drift lifecycle (VectorIndexMaintenance.needs_rebuild)."""
    if args.kind == "ivfpq":
        from .operators.ivfpq_index import IVFPQIndex as Index
    else:
        from .operators.ann_index import IVFIndex as Index

    idx = Index(args.path)
    spark = _spark()
    decision = idx.needs_rebuild(
        spark,
        recall_floor=args.recall_floor,
        max_upserted_frac=args.max_upserted_frac,
        k=args.k,
        n_queries=args.n_queries,
    )
    if decision.get("unbuilt"):
        print(f"no built {args.kind} index at {args.path} (no id inventory)")
        return 1
    for k, v in decision.items():
        print(f"{k}: {v}")
    return 0


def cmd_splits(args) -> int:
    """Read the MAINTAINED leakage-safe split assignment from a DocIngest
    directory (component_index=True layout): every document with its
    near-dup component and eval-wins train/val/test split, fresh as of
    the last streamed batch — no recompute."""
    import os

    from .operators.component_index import ComponentIndex
    from .operators.lsh_index import MinHashIndex

    comp = ComponentIndex(
        os.path.join(args.dir, "comp_index"),
        MinHashIndex(os.path.join(args.dir, "mh_index")),
    )
    spark = _spark()
    df = comp.splits(spark)
    if df is None:
        print("no maintained component state at", args.dir)
        return 1
    from pyspark.sql import functions as F

    for row in df.groupBy("split").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("component_id").alias("n_components"),
    ).orderBy("split").collect():
        print(row.asDict())
    for row in df.orderBy("doc_id").limit(args.limit).collect():
        print(row.asDict())
    return 0


def cmd_drift(args) -> int:
    """Read the MAINTAINED distribution-drift report from a DocIngest
    directory (drift_state=True layout): the add-1-smoothed whole-bit KL
    between the corpus halves, fresh as of the last streamed batch — no
    corpus rescan (operators/vocab_state.py)."""
    import os

    from .operators.vocab_state import UnigramDriftState

    st = UnigramDriftState(os.path.join(args.dir, "drift_state"))
    spark = _spark()
    df = st.read_drift(spark)
    if df is None:
        print("no maintained drift state at", args.dir)
        return 1
    print(f"folded through batch watermark {st.watermark()}")
    for row in df.collect():
        for k, v in row.asDict().items():
            print(f"{k}: {v}")
    return 0


def cmd_contamination(args) -> int:
    """Read the MAINTAINED decontamination report from a DocIngest
    directory (contamination_screen=True layout): the per-benchmark
    matrix comes from the persisted registry + evidence state, the
    quarantine count from the audit trail — never a corpus rescan
    (operators/contamination_index.py)."""
    import os

    from .streaming.docs import DocIngest

    ing = DocIngest(args.dir, contamination_screen=True)
    ix = ing.contamination
    spark = _spark()
    try:
        matrix = ix.matrix(spark)
    except FileNotFoundError:
        print("no maintained contamination registry at", args.dir)
        return 1
    print(f"evidence folded through batch watermark {ix.evidence.watermark()}")
    for row in matrix.orderBy("benchmark").collect():
        print(
            f"benchmark={row.benchmark} docs={row.n_docs}"
            f" hit={row.n_docs_contaminated}"
            f" worst_ppm={row.max_containment_ppm}"
        )
    # distinct ids: a doc re-crawled with different contaminated text is
    # refused once per crawl but is ONE refused doc
    nq = ing.read_quarantine(spark).select("doc_id").distinct().count()
    print(f"quarantined docs: {nq}")
    return 0


def cmd_novelty(args) -> int:
    """Read the MAINTAINED Heaps/novelty curve from a DocIngest directory
    (novelty_state=True layout): one row per folded crawl with cumulative
    and marginal novelty ppm — the stop-crawling telemetry, fresh as of
    the last streamed batch (operators/vocab_state.py)."""
    import os

    from .operators.vocab_state import ShingleVocabState

    st = ShingleVocabState(os.path.join(args.dir, "novelty_state"))
    spark = _spark()
    df = st.read_curve(spark)
    if df is None:
        print("no maintained novelty state at", args.dir)
        return 1
    print(f"folded through batch watermark {st.watermark()}")
    for row in df.orderBy("batch_id").collect():
        print(
            f"batch={row.batch_id} docs={row.n_docs} vocab={row.vocab_size}"
            f" novelty_ppm={row.novelty_ppm}"
            f" batch_novelty_ppm={row.batch_novelty_ppm}"
        )
    return 0


def cmd_search(args) -> int:
    """BM25 known-item probes against the MAINTAINED lexical index of a
    DocIngest directory (lexical_index=True layout): ranks come from the
    persisted postings + doc lengths — never a corpus rescan
    (operators/lexical_index.py)."""
    import os

    from .operators.lexical_index import LexicalIndex

    ix = LexicalIndex(os.path.join(args.dir, "lex_index"))
    spark = _spark()
    try:
        df = ix.bm25_topk(spark, qmod=args.qmod, k=args.k)
    except FileNotFoundError:
        print("no maintained lexical index at", args.dir)
        return 1
    print(f"postings folded through batch watermark {ix.postings.watermark()}")
    for row in df.orderBy("qid", "bm25_rank").limit(args.limit).collect():
        print(
            f"qid={row.qid} rank={row.bm25_rank} doc={row.doc_id}"
            f" score_fp={row.score_fp}"
        )
    return 0


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="blockchain_etl_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    s = sub.add_parser("ingest", help="ordered stream ingest of txn parquet chunks")
    s.add_argument("--input", required=True)
    s.add_argument("--out", required=True)
    s.add_argument("--inventories", action="store_true")
    s.set_defaults(fn=cmd_ingest)

    def _plane_flags(s):
        s.add_argument("--out", required=True, help="DocIngest out_dir")
        s.add_argument("--vectors", action="store_true")
        s.add_argument("--components", action="store_true")
        s.add_argument("--drift", action="store_true")
        s.add_argument("--lexical", action="store_true")
        s.add_argument("--novelty", action="store_true")
        s.add_argument("--screen", action="store_true",
                       help="contamination screen (build the registry first)")
        s.add_argument("--quarantine", type=int, default=None,
                       help="quarantine threshold (distinct benchmark-shingle hits)")

    s = sub.add_parser("ingest-docs", help="stream crawl parquet files through the document pipeline")
    s.add_argument("--input", required=True, help="crawl file glob, e.g. crawls/c*.parquet")
    _plane_flags(s)
    s.set_defaults(fn=cmd_ingest_docs)

    s = sub.add_parser("doctor", help="cross-plane watermark audit/heal for a DocIngest dir")
    _plane_flags(s)
    s.add_argument("--heal", action="store_true",
                   help="roll straggler planes forward from the corpus chunks")
    s.set_defaults(fn=cmd_doctor)

    s = sub.add_parser("release-quarantine",
                       help="re-screen quarantined docs under the current policy")
    _plane_flags(s)
    s.add_argument("--batch", type=int, required=True,
                   help="batch id for the re-admission (next unused id)")
    s.set_defaults(fn=cmd_release_quarantine)

    s = sub.add_parser("compact", help="fold blockrange dirs into height buckets")
    s.add_argument("--out", required=True)
    s.add_argument("--table")
    s.add_argument("--blocks-per-bucket", type=int, default=100_000)
    s.set_defaults(fn=cmd_compact)

    s = sub.add_parser("snapshot", help="materialize tables as of a height")
    s.add_argument("--out", required=True)
    s.add_argument("--height", type=int, required=True)
    s.set_defaults(fn=cmd_snapshot)

    s = sub.add_parser("backfill", help="set-based repair jobs")
    s.add_argument("job", choices=["gateway_payer", "missing_actors", "burn_prices"])
    s.add_argument("--out", required=True)
    s.set_defaults(fn=cmd_backfill)

    s = sub.add_parser("corpus", help="write a cleaned corpus release (clean/pruned/representatives/funnel/card)")
    s.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    s.add_argument("--out", required=True)
    s.set_defaults(fn=cmd_corpus)

    s = sub.add_parser("query", help="run a registered query")
    s.add_argument("name")
    s.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    s.add_argument("--write")
    s.set_defaults(fn=cmd_query)

    s = sub.add_parser("sql", help="ad-hoc SQL over the ingested tables (views per table)")
    s.add_argument("statement")
    s.add_argument("--out", required=True, help="ingest output dir holding the tables")
    s.add_argument("--write")
    s.add_argument("--limit", type=int, default=20)
    s.set_defaults(fn=cmd_sql)

    s = sub.add_parser("materialize", help="publish a registered query as a versioned table")
    s.add_argument("name")
    s.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    s.add_argument("--out", required=True)
    s.set_defaults(fn=cmd_materialize)

    s = sub.add_parser("vec-compact", help="fold a vector index's upsert segments into one segment per cell")
    s.add_argument("--path", required=True, help="index root directory")
    s.add_argument("--kind", choices=["ivf", "ivfpq"], default="ivf")
    s.set_defaults(fn=cmd_vec_compact)

    s = sub.add_parser("follow", help="poll a live merge target and keep a CDC count/sum view caught up")
    s.add_argument("--source", required=True, help="ParquetMergeTarget dir of the watched table")
    s.add_argument("--view", required=True, help="dir for the maintained view's state")
    s.add_argument("--group-keys", default="", help="comma-separated group columns")
    s.add_argument("--sum-cols", default="", help="comma-separated summed columns")
    s.add_argument("--interval", type=float, default=1.0, help="poll interval seconds")
    s.add_argument("--max-idle", type=int, default=3, help="quiet polls before exiting")
    s.add_argument("--limit", type=int, default=20)
    s.set_defaults(fn=cmd_follow)

    s = sub.add_parser("vec-health", help="drift health + rebuild decision for a vector index")
    s.add_argument("--path", required=True, help="index root directory")
    s.add_argument("--kind", choices=["ivf", "ivfpq"], default="ivf")
    s.add_argument("--recall-floor", type=float, default=0.8)
    s.add_argument("--max-upserted-frac", type=float, default=0.5)
    s.add_argument("--k", type=int, default=5)
    s.add_argument("--n-queries", type=int, default=16)
    s.set_defaults(fn=cmd_vec_health)

    s = sub.add_parser("drift", help="maintained unigram distribution-drift report from a DocIngest dir")
    s.add_argument("--dir", required=True)
    s.set_defaults(fn=cmd_drift)

    s = sub.add_parser("splits", help="maintained leakage-safe train/val/test splits from a DocIngest dir")
    s.add_argument("--dir", required=True, help="DocIngest out_dir (component_index=True layout)")
    s.add_argument("--limit", type=int, default=20)
    s.set_defaults(fn=cmd_splits)

    s = sub.add_parser("contamination", help="maintained decontamination matrix + quarantine count from a DocIngest dir")
    s.add_argument("--dir", required=True, help="DocIngest out_dir (contamination_screen=True layout)")
    s.set_defaults(fn=cmd_contamination)

    s = sub.add_parser("novelty", help="maintained Heaps/novelty curve from a DocIngest dir")
    s.add_argument("--dir", required=True, help="DocIngest out_dir (novelty_state=True layout)")
    s.set_defaults(fn=cmd_novelty)

    s = sub.add_parser("search", help="BM25 probes against a DocIngest dir's maintained lexical index")
    s.add_argument("--dir", required=True, help="DocIngest out_dir (lexical_index=True layout)")
    s.add_argument("--qmod", type=int, default=40, help="probe docs: doc_id %% qmod == 0")
    s.add_argument("--k", type=int, default=5)
    s.add_argument("--limit", type=int, default=20)
    s.set_defaults(fn=cmd_search)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
