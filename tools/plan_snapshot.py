"""Snapshot the physical-plan shape of EVERY registered query into
PLANS.json — the whole-surface complement to tests/test_plans.py's
hand-written gates.

For each query we record the scale-relevant plan fingerprint (exchange
count, sort count, join strategy counts, cartesian products, python-UDF
evals, scan count). tests/test_plan_snapshot.py compares the live plans
against this file: any query whose shuffle/join shape drifts — a lost
broadcast, a new exchange, a window sort that used to be a hash aggregate
— fails CI with a diff, even if no hand-written gate covers it.

Regenerate intentionally after a deliberate plan change:

    python tools/plan_snapshot.py          # rewrites PLANS.json

The diff then documents the change in review.
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.001"
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLANS.json")


def fingerprint(p: str) -> dict:
    return {
        "exchanges": len(re.findall(r"\(\d+\) Exchange", p)),
        "sorts": len(re.findall(r"\(\d+\) Sort", p)),
        "smj": len(re.findall(r"\(\d+\) SortMergeJoin", p)),
        "bhj": len(re.findall(r"\(\d+\) BroadcastHashJoin", p)),
        "bnlj": len(re.findall(r"\(\d+\) BroadcastNestedLoopJoin", p)),
        "cartesian": len(re.findall(r"\(\d+\) CartesianProduct", p)),
        "windows": len(re.findall(r"\(\d+\) Window", p)),
        "scans": len(re.findall(r"\(\d+\) Scan parquet", p)),
        "python_evals": len(
            re.findall(r"\(\d+\) (?:ArrowEvalPython|BatchEvalPython|MapInPandas|FlatMapGroupsInPandas)", p)
        ),
        "take_ordered": len(re.findall(r"\(\d+\) TakeOrderedAndProject", p)),
        # explode/posexplode/inline nodes: a lost salt explode (skew.py) or
        # an accidental row-multiplying generate both show up here
        "generates": len(re.findall(r"\(\d+\) Generate", p)),
    }


def collect(spark) -> dict:
    from blockchain_etl_spark.plans.registry import get_queries

    # pin every conf that sways static planning, so the fingerprint is a
    # function of the CODE alone — the same snapshot from any session
    # (shuffle partition count changes localCheckpoint size estimates,
    # which can flip a borderline join between broadcast and sort-merge)
    pinned = {
        "spark.sql.adaptive.enabled": "false",
        "spark.sql.shuffle.partitions": "8",
        "spark.sql.autoBroadcastJoinThreshold": str(10 * 1024 * 1024),
        # Arrow sways plans, not just speed: local_df() frames built via
        # the Arrow converter carry exact (small) size statistics through
        # localCheckpoint, so a bounded driver-route frame broadcasts —
        # without Arrow the same frame reports default (huge) stats and
        # plans as the stream side. Pin to the production session's value
        # (session.py sets true) so the fingerprint matches the plans the
        # engine actually runs, from any session.
        "spark.sql.execution.arrow.pyspark.enabled": "true",
    }
    saved = {k: spark.conf.get(k, None) for k in pinned}
    for k, v in pinned.items():
        spark.conf.set(k, v)
    try:
        out = {}
        for name, fn in sorted(get_queries().items()):
            df = fn(spark, SF)
            p = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
            )
            out[name] = fingerprint(p)
    finally:
        for k, v in saved.items():
            if v is not None:
                spark.conf.set(k, v)
    return out


def main() -> int:
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .appName("plan-snapshot")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    snap = collect(spark)
    with open(OUT, "w") as f:
        json.dump(snap, f, indent=1, sort_keys=True)
    print(f"wrote {len(snap)} plan fingerprints to {OUT}")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
