#!/usr/bin/env python
"""Benchmark harness: runs every registered query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line:

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {"q": sec, ...}, "sf": ...}

Each query is forced end-to-end with a driver-side count over the final
plan (all shuffles/windows execute; nothing is cached between queries).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _noise_index(anchor_samples: list[float]) -> float:
    """p75 / min of the anchor series (>= 6 samples): flags load
    SUSTAINED over more than a quarter of the pass — the only host
    state that actually moves per-query min-of-reps — while isolated
    bursts that the reps provably absorb no longer disqualify a run.

    Why not trimmed extremes (the round-12 form, 2nd-largest /
    2nd-smallest): measured round 13, a fresh session's C2-compilation
    ramp alone reads 1.88 trimmed on an IDLE host (first ~3 anchor
    samples decay 0.4 -> 0.2 s as the JIT tiers up), and a pass whose
    other 9 samples sat in a tight 0.148-0.19 band read 1.67 off two
    isolated bursts — while three full passes of the same code agreed
    on total wall within 1%. Against the round-12 reference series the
    p75 form keeps the discrimination that matters: the genuinely
    degraded drift run (anchors 0.16 -> 0.38 across the pass) reads
    ~2.0, the load-tainted r12 artifact series reads 1.48 — both still
    flagged; the burst-y-but-stable runs pass. Raw series stays in
    BENCH_DETAIL.json for forensics."""
    srt = sorted(anchor_samples)
    if len(srt) < 6:
        return round(srt[-1] / srt[0], 2)
    return round(srt[(3 * (len(srt) - 1)) // 4] / srt[0], 2)


def _run_query_pass(spark, queries, reps: int, pass_no: int) -> dict:
    """ONE full timed pass over every registered query, anchor-bracketed.
    Returns timings + the pass's own noise evidence so the caller can
    decide whether the pass is decision-grade."""
    anchor_samples: list[float] = []
    anchor_samples.append(_anchor_time(spark))
    load_start = os.getloadavg()[0]

    # Per-query time = MIN over REPS full re-executions (build + count,
    # cache cleared between reps): the criterion-style minimum removes
    # GC/JIT scheduling noise that dominates sub-second queries without
    # hiding any real work — every rep runs the whole plan. A query
    # whose rep spread exceeds 1.5x (worst/best over ANY reps, not just
    # a first-rep spike — a spike on rep 2 of 2 is equally suspect) is
    # noise-suspect: it gets ONE extra rep so a transient spike can't
    # masquerade as the query's cost (and the extra rep never recurses).
    timings: dict[str, float] = {}
    failed: list[str] = []
    for qi, (name, fn) in enumerate(sorted(queries.items())):
        if qi and qi % 20 == 0:
            anchor_samples.append(_anchor_time(spark))
        best, worst, n = None, None, 0
        try:
            r = 0
            while r < reps or (r == reps and worst / best > 1.5):
                t0 = time.perf_counter()
                df = fn(spark, SF_DIR)
                n = df.count()
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
                worst = dt if worst is None else max(worst, dt)
                spark.catalog.clearCache()  # no cross-query cache interference
                r += 1
        except Exception as exc:  # one bad query must not lose the run
            failed.append(name)
            spark.catalog.clearCache()
            print(f"# {name}: FAILED {exc}", file=sys.stderr)
            continue
        timings[name] = round(best, 3)
        print(
            f"# [pass {pass_no}] {name}: {timings[name]:.3f}s rows={n}",
            file=sys.stderr,
        )
    anchor_samples.append(_anchor_time(spark))
    noise_idx = _noise_index(anchor_samples)
    print(
        f"# [pass {pass_no}] anchor: {len(anchor_samples)} samples "
        f"min={min(anchor_samples):.3f}s max={max(anchor_samples):.3f}s "
        f"host_noise_index={noise_idx}",
        file=sys.stderr,
    )
    return {
        "timings": timings,
        "failed": failed,
        "anchor_samples": anchor_samples,
        "noise_idx": noise_idx,
        "loadavg": [round(load_start, 2), round(os.getloadavg()[0], 2)],
    }


def main() -> None:
    from blockchain_etl_spark.plans.registry import get_queries
    from blockchain_etl_spark.session import get_spark

    spark = get_spark("blockchain-etl-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")
    queries = get_queries()

    # Warm the fixed machinery once, outside any timed region: JVM/codegen,
    # a shuffle exchange, and the Python/Arrow worker pool (pandas UDFs pay
    # multi-second startup on first use).
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    region = spark.read.parquet(os.path.join(SF_DIR, "region.parquet"))
    region.groupBy("r_name").count().count()

    @pandas_udf("long")
    def _warm(s):
        return s

    region.select(_warm(F.col("r_regionkey").cast("long"))).count()

    # Calibration anchor: a FIXED scan+shuffle+agg re-timed throughout the
    # run. Round 11's artifact read +49% vs round 10 purely from sustained
    # host load (judge A/B on the idle host: 0.98x) — min-of-reps defends
    # against per-query spikes but not a loaded host across the whole run.
    # The anchor makes that visible in the artifact itself:
    # host_noise_index = p75/min anchor time across the run (flags load
    # sustained over >1/4 of the pass — what actually moves min-of-reps).
    # ~1.0 means the numbers are decision-grade; >>1 means compare
    # medians of repeated runs, not this run's deltas.
    _anchor_time(spark)  # warm the anchor plan itself (codegen), unmeasured

    # Decision-grade retry (round-13): a pass whose own noise index
    # exceeds the threshold is a load-tainted measurement — rerun the
    # WHOLE query pass (up to SPARK_GRAFT_BENCH_PASSES total) and keep
    # the pass with the LOWEST index, so the committed artifact is the
    # closest thing to an idle-host median this run could observe
    # instead of whatever host state the first pass happened to hit.
    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "2")))
    noise_max = float(os.environ.get("SPARK_GRAFT_BENCH_NOISE_MAX", "1.4"))
    max_passes = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_PASSES", "3")))
    chosen = None
    passes_summary: list[dict] = []
    for pass_no in range(1, max_passes + 1):
        p = _run_query_pass(spark, queries, reps, pass_no)
        passes_summary.append(
            {
                "pass": pass_no,
                "host_noise_index": p["noise_idx"],
                "total_sec": round(sum(p["timings"].values()), 3),
                "loadavg_1m": p["loadavg"],
                "n_failed": len(p["failed"]),
            }
        )
        # a pass that failed fewer queries wins outright; otherwise
        # the lowest-noise pass wins
        if chosen is None or (len(p["failed"]), p["noise_idx"]) < (
            len(chosen["failed"]), chosen["noise_idx"]
        ):
            chosen = p
        if p["noise_idx"] <= noise_max and not p["failed"]:
            break
        if pass_no < max_passes:
            print(
                f"# pass {pass_no} not decision-grade "
                f"(noise {p['noise_idx']} > {noise_max} or failures) — "
                f"rerunning",
                file=sys.stderr,
            )
    timings = chosen["timings"]
    failed = chosen["failed"]
    anchor_samples = chosen["anchor_samples"]
    noise_idx = chosen["noise_idx"]

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_val: float | str = float(sf)
    except ValueError:
        sf_val = sf
    result = {
        "metric": "total_query_wall_seconds",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf_val,
        "host_noise_index": noise_idx,
        # Absolute floor of the fixed calibration query: cross-RUN
        # comparable (the within-run noise index cannot see a host that
        # is uniformly slow for the whole pass — r13 lesson: a sustained
        # ~1.6x-degraded host benched noise 1.37 with every absolute
        # number inflated; the anchor floor 0.127 -> 0.206 was the only
        # in-artifact signal). Compare against the committed
        # BENCH_DETAIL's floor before reading cross-run deltas.
        "anchor_min_sec": round(min(anchor_samples), 3),
        "loadavg_1m": chosen["loadavg"],
        "bench_passes": len(passes_summary),
        # label the artifact with its core count (r13 verdict #6 hygiene:
        # a committed BENCH_DETAIL from the driver's low-core scaling run
        # is otherwise indistinguishable from the 32-core profile)
        "cpus": int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
    }
    if failed:
        result["failed"] = failed
    if os.environ.get("SPARK_GRAFT_BENCH_ORACLE"):
        result["oracle_duckdb"] = _bench_oracle(reps)
    # Throughput benches run ONCE, each bracketed by its own anchor
    # sample so the single-run rates carry noise context (round-12
    # lesson: docs/s read 273 vs 376 across rounds purely from host
    # state, with nothing in the artifact to tell which was clean).
    throughput_anchors: dict[str, list[float]] = {}

    def _with_anchor(key: str, fn):
        a0 = _anchor_time(spark)
        try:
            result[key] = fn(spark)
        except Exception as exc:  # a throughput bench must not lose the run
            print(f"# {key} bench FAILED: {exc}", file=sys.stderr)
            return
        throughput_anchors[key] = [round(a0, 3), round(_anchor_time(spark), 3)]

    _with_anchor("blocks_per_sec", _bench_ingest)
    _with_anchor("docs_per_sec", _bench_doc_ingest)
    _with_anchor("ivm_rows_per_sec", _bench_ivm)
    # Full detail always lands on disk next to this script.
    detail_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json")
    detail = dict(result)
    detail["anchor_samples_sec"] = [round(a, 3) for a in anchor_samples]
    detail["passes"] = passes_summary
    detail["throughput_anchor_sec"] = {
        k: v
        + [round(max(v) / min(v), 2), round(min(v) / min(anchor_samples), 2)]
        for k, v in throughput_anchors.items()
        # [before, after, spread, vs_query_pass_floor]: spread flags load
        # DURING the bench; vs-floor flags a host already degraded vs the
        # selected query pass's anchor minimum
    }
    detail["measurement_note"] = (
        "single-run wall-clock on this shared VM varies +/-30-40% with host "
        "state (measured round 4: same code, 74.4s vs 91.9s totals 40min "
        "apart; round 11's artifact read +49% vs round 10 purely from load). "
        "host_noise_index = p75/min of a fixed calibration query "
        "re-timed (min-of-2) every 20 queries — flags load sustained "
        "over >1/4 of the pass (what actually moves per-query "
        "min-of-reps); isolated bursts and the fresh-session JIT ramp "
        "no longer disqualify a run whose per-query minima are "
        "unaffected (r13 A/B: three same-code passes agreed on total "
        "within 1% while trimmed-extremes read 1.67-2.64). Near 1.0 "
        "the numbers are decision-grade; above ~1.4 compare medians "
        "of repeated runs, not single-run deltas. A pass whose "
        "index exceeds SPARK_GRAFT_BENCH_NOISE_MAX (default 1.4) is "
        "rerun (up to SPARK_GRAFT_BENCH_PASSES=3 passes) and the "
        "lowest-noise pass is the one committed — see 'passes' for "
        "every pass's summary. Throughput rates are single-run, "
        "bracketed by their own anchors in throughput_anchor_sec"
    )
    with open(detail_path, "w") as f:
        json.dump(detail, f, indent=1, sort_keys=True)
    # The harness that consumes stdout keeps only the LAST ~2000 chars and
    # parses the final JSON line from that window (round-2 lesson: 91 query
    # entries pushed the line past the window and the whole run recorded as
    # unparsed). Emit the line compact, and if it still exceeds the budget,
    # keep the SLOWEST queries (the informative ones) plus summary stats
    # for the rest; BENCH_DETAIL.json always has everything.
    print(emit_line(result, timings))
    spark.stop()


def emit_line(result: dict, timings: dict, budget: int = 1900) -> str:
    """The ONE stdout JSON line, provably under ``budget`` chars: keep
    the SLOWEST queries plus summary stats for the rest, dropping five
    at a time until the line fits (queries are the only unbounded part
    of the payload, so the loop always terminates under budget as long
    as the fixed summary keys fit — tests/test_bench_line.py asserts
    both against the LIVE registry, so a new long query name cannot
    silently push the artifact past the driver's window)."""
    line = json.dumps(result, separators=(",", ":"))
    if len(line) > budget:
        ranked = sorted(timings.items(), key=lambda kv: -kv[1])
        slim = dict(result)
        while len(line) > budget and ranked:
            ranked = ranked[: max(0, len(ranked) - 5)]
            slim["queries"] = dict(sorted(ranked))
            slim["queries_total"] = len(timings)
            slim["queries_omitted"] = len(timings) - len(ranked)
            slim["median_query_sec"] = round(
                sorted(timings.values())[len(timings) // 2], 3
            )
            slim["detail_file"] = "BENCH_DETAIL.json"
            line = json.dumps(slim, separators=(",", ":"))
    return line


def _anchor_time(spark) -> float:
    """One sample of the fixed calibration workload: a full lineitem scan
    into a shuffled two-key aggregate — representative of the suite's
    fixed cost (scan + exchange + codegen'd agg), pinned so its ONLY
    variable across the run is host state. Min of 2 back-to-back runs:
    a single GC pause on a one-shot sample would fake a high noise
    index, while SUSTAINED host load (the round-11 failure mode) still
    inflates both runs. ~0.2-0.4 s at sf0.1 idle."""
    from pyspark.sql import functions as F

    li = spark.read.parquet(os.path.join(SF_DIR, "lineitem.parquet"))
    best = None
    for _ in range(2):
        t0 = time.perf_counter()
        li.groupBy("l_returnflag", "l_linestatus").agg(
            F.sum("l_quantity"), F.avg("l_extendedprice"), F.count(F.lit(1))
        ).count()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return best


def _bench_ingest(spark) -> float:
    """Ingest-throughput bench: the reference's only implicit performance
    contract is block-ingest latency (be_db_follower.erl:103-107 — keep up
    with mainnet, ~1 block/min). Time the FULL follower path — JSONL block
    archives -> blockfiles stream source (ordered offsets) -> txn explode
    -> foreachBatch derive of all 10 tables + incremental inventory MERGE —
    and report blocks/sec. The corpus is generated once (deterministic
    fixture txns across all 20 reference txn types); each timed run starts
    from a fresh checkpoint/output dir so nothing is warm-started.

    SPARK_GRAFT_BENCH_BLOCKS sets corpus size (default 240, ~12 archives);
    SPARK_GRAFT_BENCH_BLOCKS=0 disables the ingest bench."""
    import shutil
    import tempfile

    from blockchain_etl_spark.streaming.ingest import BlockIngest
    from tests.fixtures_blockchain import gen_transactions

    n_blocks = int(os.environ.get("SPARK_GRAFT_BENCH_BLOCKS", "240"))
    if n_blocks <= 0:
        return 0.0
    blocks, txns = gen_transactions(seed=7, n_blocks=n_blocks)
    by_height: dict[int, list] = {}
    for t in txns:
        by_height.setdefault(t["block"], []).append(t)
    block_time = {b["height"]: b["time"] for b in blocks}

    root = tempfile.mkdtemp(prefix="bench-ingest-")
    try:
        arch = os.path.join(root, "archive")
        os.makedirs(arch)
        per_archive = 20  # each archive becomes one ordered microbatch
        for lo in range(1, n_blocks + 1, per_archive):
            hi = min(lo + per_archive - 1, n_blocks)
            with open(os.path.join(arch, f"blocks_{lo}_{hi}.jsonl"), "w") as f:
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
        out = os.path.join(root, "out")
        ing = BlockIngest(out, maintain_inventories=True)
        t0 = time.perf_counter()
        ing.run_blockfiles_stream(spark, arch)
        dt = time.perf_counter() - t0
        assert ing.sync_height() == n_blocks, "ingest did not reach the tip"
        bps = round(n_blocks / dt, 2)
        print(
            f"# ingest: {n_blocks} blocks ({len(txns)} txns, all tables + "
            f"inventories) in {dt:.2f}s = {bps} blocks/sec",
            file=sys.stderr,
        )
        return bps
    finally:
        shutil.rmtree(root, ignore_errors=True)


def _bench_doc_ingest(spark) -> float:
    """Corpus-ingest throughput: documents/sec through the FULL streaming
    document path (quality gate -> in-batch canonical -> against-lake
    exact dedup -> clean-corpus append + MinHash signature index + chunk-df
    boilerplate index maintenance, per batch). The training-data twin of
    the blocks/sec metric: at 100 TB this is the rate the crawler-facing
    pipeline sustains.

    SPARK_GRAFT_BENCH_DOCS sets chunk count x chunk size via the sf dir's
    documents table (default 4 chunks); =0 disables."""
    import shutil
    import tempfile

    from blockchain_etl_spark.streaming.docs import DocIngest

    n_chunks = int(os.environ.get("SPARK_GRAFT_BENCH_DOCS", "4"))
    if n_chunks <= 0:
        return 0.0
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    n_docs = docs.count()
    root = tempfile.mkdtemp(prefix="bench-docingest-")
    try:
        ing = DocIngest(os.path.join(root, "lake"))
        t0 = time.perf_counter()
        for i in range(n_chunks):
            ing.process_batch(docs.filter(docs.doc_id % n_chunks == i), i)
        dt = time.perf_counter() - t0
        dps = round(n_docs / dt, 2)
        print(
            f"# corpus ingest: {n_docs} docs in {n_chunks} batches in "
            f"{dt:.2f}s = {dps} docs/sec",
            file=sys.stderr,
        )
        return dps
    finally:
        shutil.rmtree(root, ignore_errors=True)


def _bench_oracle(reps: int) -> dict:
    """Optional single-node reference: time every oracle SQL in DuckDB on
    the same parquet at the same SF (min over `reps`). Regime note: at
    the toy SFs this container holds, per-query wall-clock is dominated
    by Spark's FIXED cost (planning, codegen, task scheduling — a few
    hundred ms/query) while DuckDB runs the same megabytes in
    milliseconds; the informative signals are per-query OUTLIERS against
    that fixed floor and the scaling slope between SFs, not the totals.
    Enabled only by SPARK_GRAFT_BENCH_ORACLE=1 — stderr commentary, one
    extra JSON key ('oracle_duckdb'), stdout stays one JSON line."""
    import duckdb

    from blockchain_etl_spark.plans.registry import get_oracle_sql
    from blockchain_etl_spark.sources.testdata import TABLES

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{os.path.join(SF_DIR, t + '.parquet')}')"
        )
    timings: dict[str, float] = {}
    for name, sql in sorted(get_oracle_sql().items()):
        best = None
        try:
            for _ in range(reps):
                t0 = time.perf_counter()
                con.execute(sql).fetchall()
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
        except Exception as exc:
            print(f"# oracle {name}: FAILED {exc}", file=sys.stderr)
            continue
        timings[name] = round(best, 3)
        print(f"# oracle {name}: {timings[name]:.3f}s", file=sys.stderr)
    return {"total": round(sum(timings.values()), 3), "queries": timings}


def _bench_ivm(spark) -> float:
    """Incremental-view-maintenance throughput: delta rows/sec through the
    full join->aggregate maintenance path (IncrementalJoinAggregate —
    weighted delta join against bucket-pruned state, LSM segment append,
    CDC-watermarked aggregate fold; two atomic commits per step). The
    metric a 100 TB deployment actually cares about for maintained views:
    how fast deltas flow INTO an always-fresh join+rollup, not how fast
    the join reruns from scratch.

    Drives the sf dir's customer (dimension side) and orders (fact deltas,
    chunked into steps) tables into a per-nation order-count/cents view.
    SPARK_GRAFT_BENCH_IVM_STEPS sets the fact chunk count (default 6);
    =0 disables."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from blockchain_etl_spark.operators.ivm import IncrementalJoinAggregate

    n_steps = int(os.environ.get("SPARK_GRAFT_BENCH_IVM_STEPS", "6"))
    if n_steps <= 0:
        return 0.0
    cust = spark.read.parquet(os.path.join(SF_DIR, "customer.parquet")).select(
        F.col("c_custkey").alias("k"), F.col("c_nationkey").alias("grp")
    )
    orders = spark.read.parquet(os.path.join(SF_DIR, "orders.parquet")).select(
        F.col("o_custkey").alias("k"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("qty"),
    )
    n_rows = cust.count() + orders.count()
    root = tempfile.mkdtemp(prefix="bench-ivm-")
    try:
        jagg = IncrementalJoinAggregate(
            os.path.join(root, "jagg"),
            join_keys=["k"],
            group_keys=["grp"],
            sum_cols=["qty"],
        )
        t0 = time.perf_counter()
        jagg.apply(spark, delta_a=cust, watermark_a=0)
        for i in range(n_steps):
            jagg.apply(
                spark,
                delta_b=orders.filter(F.col("k") % n_steps == i),
                watermark_b=i,
            )
        n_groups = jagg.read(spark).count()
        dt = time.perf_counter() - t0
        assert n_groups > 0, "ivm bench produced an empty view"
        rps = round(n_rows / dt, 1)
        print(
            f"# ivm: {n_rows} delta rows through {n_steps + 1} join+agg "
            f"maintenance steps in {dt:.2f}s = {rps} rows/sec",
            file=sys.stderr,
        )
        return rps
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
