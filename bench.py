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

    # Per-query time = MIN over REPS full re-executions (build + count,
    # cache cleared between reps): the criterion-style minimum removes
    # GC/JIT scheduling noise that dominates sub-second queries without
    # hiding any real work — every rep runs the whole plan.
    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "2")))
    timings: dict[str, float] = {}
    failed: list[str] = []
    for name, fn in sorted(queries.items()):
        best, n = None, 0
        try:
            for _ in range(reps):
                t0 = time.perf_counter()
                df = fn(spark, SF_DIR)
                n = df.count()
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
                spark.catalog.clearCache()  # no cross-query cache interference
        except Exception as exc:  # one bad query must not lose the run
            failed.append(name)
            spark.catalog.clearCache()
            print(f"# {name}: FAILED {exc}", file=sys.stderr)
            continue
        timings[name] = round(best, 3)
        print(f"# {name}: {timings[name]:.3f}s rows={n}", file=sys.stderr)

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
    }
    if failed:
        result["failed"] = failed
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
