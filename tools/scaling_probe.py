"""Measured scaling ratios: run every registered query at sf0.1 and at a
synthesized 3x replica ("sf0.3"), record per-query and per-family
wall-time ratios into SCALING.json (+ a summary table for SCALE.md).

The 3x corpus is sf0.1 replicated with CONSISTENT key offsets (facts get
per-replica key shifts that preserve every foreign-key relationship; the
25-row dims stay fixed), so joins behave exactly as a larger TPC-H-ish
corpus would. Document text (and event/doc ids) are perturbed with a
replica token so duplicate-family SIZES stay constant while family COUNTS
triple — otherwise pair-generating dedup queries would measure the
data's quadratic clone blowup, not the algorithm.

Never touches BENCH_DETAIL.json (that file is the sf0.1 bench artifact).

Usage: python tools/scaling_probe.py  [--reps 2]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BASE = "/root/testdata/sf0.1"
SCALED = "/tmp/spark_graft_sf0.3"
REPLICAS = 3

# fact table → key columns that shift per replica, expressed as
# (column, key-domain) so foreign keys shift by the SAME offset as the
# primary they reference
_KEYED = {
    "customer": [("c_custkey", "cust")],
    "supplier": [("s_suppkey", "supp")],
    "part": [("p_partkey", "part")],
    "orders": [("o_orderkey", "order"), ("o_custkey", "cust")],
    "lineitem": [("l_orderkey", "order"), ("l_partkey", "part"), ("l_suppkey", "supp")],
    "events": [("event_id", "event"), ("user_id", "user")],
    "documents": [("doc_id", "doc")],
    "embeddings": [("vec_id", "vec")],
}
_DOMAIN_SRC = {
    "cust": ("customer", "c_custkey"),
    "supp": ("supplier", "s_suppkey"),
    "part": ("part", "p_partkey"),
    "order": ("orders", "o_orderkey"),
    "event": ("events", "event_id"),
    "user": ("events", "user_id"),
    "doc": ("documents", "doc_id"),
    "vec": ("embeddings", "vec_id"),
}
_DIMS = ("region", "nation")


def build_scaled(spark) -> None:
    from pyspark.sql import functions as F
    from pyspark.sql.functions import col

    if os.path.isdir(SCALED) and os.path.exists(os.path.join(SCALED, "_DONE")):
        return
    os.makedirs(SCALED, exist_ok=True)
    spans: dict[str, int] = {}
    for dom, (tbl, c) in _DOMAIN_SRC.items():
        mx = (
            spark.read.parquet(os.path.join(BASE, f"{tbl}.parquet"))
            .agg(F.max(col(c)))
            .first()[0]
        )
        spans[dom] = int(mx) + 1
    for tbl in _DIMS:
        spark.read.parquet(os.path.join(BASE, f"{tbl}.parquet")).write.mode(
            "overwrite"
        ).parquet(os.path.join(SCALED, f"{tbl}.parquet"))
    for tbl, keys in _KEYED.items():
        src = spark.read.parquet(os.path.join(BASE, f"{tbl}.parquet"))
        parts = []
        for i in range(REPLICAS):
            rep = src
            for c, dom in keys:
                rep = rep.withColumn(c, (col(c) + F.lit(i * spans[dom])).cast("long"))
            if tbl == "documents" and i > 0:
                # break exact/near-dup families ACROSS replicas: family
                # sizes stay constant, family counts scale
                rep = rep.withColumn(
                    "text", F.concat(col("text"), F.lit(f" replica{i}tok"))
                ).withColumn("n_chars", col("n_chars") + F.lit(len(f" replica{i}tok")))
            parts.append(rep)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.write.mode("overwrite").parquet(os.path.join(SCALED, f"{tbl}.parquet"))
    with open(os.path.join(SCALED, "_DONE"), "w") as f:
        f.write("ok")


def main() -> None:
    reps = 2
    if "--reps" in sys.argv:
        reps = int(sys.argv[sys.argv.index("--reps") + 1])
    from blockchain_etl_spark.plans.registry import QUERIES, get_queries
    from blockchain_etl_spark.session import get_spark

    spark = get_spark("blockchain-etl-spark-scaling")
    spark.sparkContext.setLogLevel("ERROR")
    build_scaled(spark)
    queries = get_queries()

    def run_all(sf_dir: str) -> dict[str, float]:
        out: dict[str, float] = {}
        for name, fn in sorted(queries.items()):
            best = None
            try:
                for _ in range(reps):
                    t0 = time.perf_counter()
                    fn(spark, sf_dir).count()
                    dt = time.perf_counter() - t0
                    best = dt if best is None else min(best, dt)
                    spark.catalog.clearCache()
            except Exception as exc:
                print(f"# {name} @ {sf_dir}: FAILED {exc}", file=sys.stderr)
                spark.catalog.clearCache()
                continue
            out[name] = round(best, 3)
            print(f"# {name} @ {os.path.basename(sf_dir)}: {best:.3f}s", file=sys.stderr)
        return out

    # warm fixed machinery (JVM, Arrow workers) once
    spark.read.parquet(os.path.join(BASE, "region.parquet")).count()
    t1 = run_all(BASE)
    t3 = run_all(SCALED)

    rows = {}
    fams: dict[str, dict[str, float]] = {}
    for name in sorted(set(t1) & set(t3)):
        ratio = round(t3[name] / t1[name], 2) if t1[name] > 0 else None
        rows[name] = {"sf0.1_sec": t1[name], "sf0.3_sec": t3[name], "ratio": ratio}
        fam = QUERIES[name].fn.__module__.rsplit(".", 1)[-1]
        f = fams.setdefault(fam, {"sf0.1_sec": 0.0, "sf0.3_sec": 0.0, "n": 0})
        f["sf0.1_sec"] += t1[name]
        f["sf0.3_sec"] += t3[name]
        f["n"] += 1
    for f in fams.values():
        f["ratio"] = round(f["sf0.3_sec"] / f["sf0.1_sec"], 2) if f["sf0.1_sec"] else None
        f["sf0.1_sec"] = round(f["sf0.1_sec"], 2)
        f["sf0.3_sec"] = round(f["sf0.3_sec"], 2)
    result = {
        "data_step": REPLICAS,
        "reps": reps,
        "note": (
            "3x key-consistent replica of sf0.1 (dims fixed, doc families "
            "count-scaled not size-scaled); ratio = sf0.3/sf0.1 min-of-reps "
            "wall time. Linear work at this size reads ratio in [1, 3] "
            "(fixed per-query overhead dilutes the data term); ratios well "
            "above 3 flag super-linear queries."
        ),
        "families": dict(sorted(fams.items())),
        "queries": rows,
    }
    with open(os.path.join(REPO, "SCALING.json"), "w") as f:
        json.dump(result, f, indent=1, sort_keys=True)
    worst = sorted(rows.items(), key=lambda kv: -(kv[1]["ratio"] or 0))[:12]
    print(json.dumps({"families": result["families"]}, indent=1))
    print("# worst ratios:")
    for n, r in worst:
        print(f"#   {n}: {r}")
    spark.stop()


if __name__ == "__main__":
    main()
