"""10x scaling draw for the quality and similarity families with FRESH
(non-replica) content — the follow-up to the 3x probe (scaling_probe.py):
at 3x those two families read 1.89 / 1.78, inside the linear band but with
replica-constructed text, so replica artifacts and genuine growth were
confounded. This probe rebuilds the scaled corpus at 10x where every
added document's text is REGENERATED (deterministic word draws from the
base corpus's global token vocabulary, per-doc lengths copied from a base
doc) and every added embedding is a fresh deterministic vector in
[-1, 1]^64 — natural collision structure, no replica token.

Relational tables (customer/orders/lineitem/part/events) scale by the
same key-consistent replication as the 3x probe (no text in them); dims
stay fixed. Only the quality and similarity family queries run. Results
land in SCALING_10X.json (+ a summary printed for SCALE.md);
SCALING.json and BENCH_DETAIL.json are never touched.

Usage: python tools/scaling_probe_10x.py [--reps 2]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BASE = "/root/testdata/sf0.1"
SCALED = "/tmp/spark_graft_sf1.0_fresh"
REPLICAS = 10
FAMILIES = ("quality", "similarity")

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

# name columns that are a pure function of the row's key in the base
# generator: replicas regenerate them from the SHIFTED key instead of
# copying the base string verbatim. Verbatim-replicated names gave every
# name 10 copies, inflating the SymSpell candidate-pair population ~100x
# (the round-9 confound on name_match_eval / customer_name_match); the
# regenerated names have exactly the collision statistics a genuinely
# 10x-larger corpus would have (all unique, same format, same length).
_KEYED_NAMES = {
    "customer": ("c_name", "Customer#%09d", "c_custkey"),
    "supplier": ("s_name", "Supplier#%09d", "s_suppkey"),
}

_BUILD_VERSION = "v2-fresh-names"


def build_scaled(spark) -> None:
    from pyspark.sql import functions as F
    from pyspark.sql.functions import col

    done = os.path.join(SCALED, "_DONE")
    if os.path.isdir(SCALED) and os.path.exists(done):
        with open(done) as f:
            if f.read().strip() == _BUILD_VERSION:
                return
        # stale layout from an older probe version — rebuild from scratch
        import shutil

        shutil.rmtree(SCALED, ignore_errors=True)
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
    # the base corpus's global token vocabulary (bounded by construction:
    # the synthetic generator uses a ~30-word vocabulary)
    vocab = [
        r.w
        for r in spark.read.parquet(os.path.join(BASE, "documents.parquet"))
        .select(F.explode(F.expr("filter(split(text,' '), w -> length(w) > 0)")).alias("w"))
        .distinct()
        .collect()
    ]
    vocab_sql = "array(" + ", ".join(f"'{w}'" for w in sorted(vocab)) + ")"
    nv = len(vocab)
    for tbl, keys in _KEYED.items():
        src = spark.read.parquet(os.path.join(BASE, f"{tbl}.parquet"))
        parts = []
        for i in range(REPLICAS):
            rep = src
            for c, dom in keys:
                rep = rep.withColumn(c, (col(c) + F.lit(i * spans[dom])).cast("long"))
            if tbl in _KEYED_NAMES and i > 0:
                name_col, fmt, key_col = _KEYED_NAMES[tbl]
                rep = rep.withColumn(
                    name_col, F.format_string(fmt, col(key_col))
                )
            if tbl == "documents" and i > 0:
                # FRESH text: same length as the base doc, words drawn
                # deterministically from the global vocabulary — natural
                # collision structure instead of a replica token
                rep = rep.withColumn(
                    "text",
                    F.expr(
                        "array_join(transform("
                        " sequence(1, size(filter(split(text,' '),"
                        "   w -> length(w) > 0))),"
                        f" j -> element_at({vocab_sql}, 1 + cast(pmod("
                        "   cast(conv(substr(md5(concat(cast(doc_id as string),"
                        f"     '_{i}_', cast(j as string))), 1, 6), 16, 10)"
                        f"   as bigint), {nv}) as int))), ' ')"
                    ),
                ).withColumn("n_chars", F.length("text").cast("long"))
            if tbl == "embeddings" and i > 0:
                # fresh deterministic vector in [-1, 1]^64
                rep = rep.withColumn(
                    "embedding",
                    F.expr(
                        "transform(sequence(1, 64), j -> cast((cast(conv("
                        " substr(md5(concat(cast(vec_id as string), '_e_',"
                        " cast(j as string))), 1, 6), 16, 10) as bigint)"
                        " % 2001 - 1000) / 1000.0 as float))"
                    ),
                )
            parts.append(rep)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.write.mode("overwrite").parquet(os.path.join(SCALED, f"{tbl}.parquet"))
    with open(os.path.join(SCALED, "_DONE"), "w") as f:
        f.write(_BUILD_VERSION)


def main() -> None:
    reps = 2
    if "--reps" in sys.argv:
        reps = int(sys.argv[sys.argv.index("--reps") + 1])
    only: set[str] | None = None
    if "--only" in sys.argv:
        # re-probe a subset and MERGE into the existing SCALING_10X.json
        # (family aggregates recomputed over the merged per-query rows)
        only = set(sys.argv[sys.argv.index("--only") + 1].split(","))
    from blockchain_etl_spark.plans.registry import QUERIES, get_queries
    from blockchain_etl_spark.session import get_spark

    spark = get_spark("blockchain-etl-spark-scaling-10x")
    spark.sparkContext.setLogLevel("ERROR")
    build_scaled(spark)
    queries = {
        name: fn
        for name, fn in get_queries().items()
        if QUERIES[name].fn.__module__.rsplit(".", 1)[-1] in FAMILIES
        and (only is None or name in only)
    }

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

    spark.read.parquet(os.path.join(BASE, "region.parquet")).count()
    t1 = run_all(BASE)
    t10 = run_all(SCALED)

    rows = {}
    if only is not None and os.path.exists(os.path.join(REPO, "SCALING_10X.json")):
        with open(os.path.join(REPO, "SCALING_10X.json")) as f:
            loaded = json.load(f).get("queries", {})
        # every stored row carries the corpus build version it was
        # measured on; rows from an OLDER build (e.g. the pre-v2 corpus
        # with verbatim replicated names — the round-9 confound) must not
        # silently blend with fresh timings in one family aggregate.
        for name, r in loaded.items():
            if r.get("build") == _BUILD_VERSION:
                rows[name] = r
            else:
                print(
                    f"# {name}: stored row from build "
                    f"{r.get('build', '<unstamped>')} != {_BUILD_VERSION}"
                    " — dropped from merge (re-probe it with --only)",
                    file=sys.stderr,
                )
    fams: dict[str, dict[str, float]] = {}
    for name in sorted(set(t1) & set(t10)):
        ratio = round(t10[name] / t1[name], 2) if t1[name] > 0 else None
        rows[name] = {
            "sf0.1_sec": t1[name], "sf1.0_sec": t10[name], "ratio": ratio,
            "build": _BUILD_VERSION,
        }
    for name, r in rows.items():
        if name not in QUERIES:
            # a merged row from an older SCALING_10X.json whose query was
            # renamed/removed — keep the row, but it has no family
            print(f"# {name}: not in the live registry, skipping family "
                  "rollup", file=sys.stderr)
            continue
        fam = QUERIES[name].fn.__module__.rsplit(".", 1)[-1]
        f = fams.setdefault(fam, {"sf0.1_sec": 0.0, "sf1.0_sec": 0.0, "n": 0})
        f["sf0.1_sec"] += r["sf0.1_sec"]
        f["sf1.0_sec"] += r["sf1.0_sec"]
        f["n"] += 1
    for f in fams.values():
        f["ratio"] = round(f["sf1.0_sec"] / f["sf0.1_sec"], 2) if f["sf0.1_sec"] else None
        f["sf0.1_sec"] = round(f["sf0.1_sec"], 2)
        f["sf1.0_sec"] = round(f["sf1.0_sec"], 2)
    # UPDATE the artifact, never replace it: sibling probes store their
    # own top-level keys in the same file (scaling_probe_maintained.py
    # writes "maintained") and a family re-run must not delete them
    existing = {}
    if os.path.exists(os.path.join(REPO, "SCALING_10X.json")):
        with open(os.path.join(REPO, "SCALING_10X.json")) as f:
            existing = json.load(f)
    result = {
        **{k: v for k, v in existing.items()
           if k not in ("data_step", "reps", "note", "families", "queries")},
        "data_step": REPLICAS,
        "reps": reps,
        "note": (
            "10x corpus with FRESH doc text (deterministic draws from the "
            "base vocabulary, base length distribution), fresh "
            "embeddings, and FRESH key-derived customer/supplier names "
            "(replicas regenerate name = f(shifted key), so name "
            "collision statistics match a genuinely 10x corpus instead "
            "of 10 verbatim copies); relational tables key-consistent "
            "replicas; ratio = sf1.0/sf0.1 min-of-reps wall. Linear work "
            "reads ratio in [1, 10] (fixed overhead dilutes the data term)."
        ),
        "families": dict(sorted(fams.items())),
        "queries": rows,
    }
    with open(os.path.join(REPO, "SCALING_10X.json"), "w") as f:
        json.dump(result, f, indent=1, sort_keys=True)
    print(json.dumps({"families": result["families"]}, indent=1))
    worst = sorted(rows.items(), key=lambda kv: -(kv[1]["ratio"] or 0))[:10]
    print("# worst ratios:")
    for n, r in worst:
        print(f"#   {n}: {r}")
    spark.stop()


if __name__ == "__main__":
    main()
