#!/usr/bin/env python
"""Dump `.explain("formatted")` for the named registered queries.

    python tools/dump_plans.py <outdir> <suffix> <query> [<query> ...]

Writes <outdir>/<query>_<suffix>.txt (suffix: before/after) at sf0.1 on
the engine session — the same capture the r13 plan evidence used. Run it
from the tree whose plans you want (a git worktree of an old commit for
the *_before.txt files)."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = os.environ.get("SPARK_GRAFT_PLAN_SF_DIR", "/root/testdata/sf0.1")


def main() -> int:
    outdir, suffix, *names = sys.argv[1:]
    os.makedirs(outdir, exist_ok=True)
    from blockchain_etl_spark.plans.registry import get_queries
    from blockchain_etl_spark.session import get_spark

    spark = get_spark("dump-plans")
    spark.sparkContext.setLogLevel("ERROR")
    qs = get_queries()
    for name in names:
        df = qs[name](spark, SF)
        p = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(p)
        print(f"wrote {path} ({len(p.splitlines())} lines)")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
