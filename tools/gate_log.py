#!/usr/bin/env python
"""Driver-style sf0.01 oracle gate with a MACHINE-READABLE log.

Runs the exact verify the driver runs — vanilla SparkSession (NOT
session.get_spark), every registered query at sf0.01 compared against its
DuckDB oracle on row count + column names + order-insensitive values —
and APPENDS one audit record to GATELOG_r14.json:

    {"commit": <git HEAD>, "tree_dirty": bool, "n_queries": N,
     "n_ok": N, "fails": [...], "session_conf_hash": md5-of-confs,
     "queries": {name: true/false}}

Requested by the r13 verdict (#3): the builder's own 200/200 gate runs
become judge-auditable artifacts instead of prose claims.
"""

from __future__ import annotations

import hashlib
import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_GATE_SF_DIR", "/root/testdata/sf0.01")
LOG = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "GATELOG_r14.json"
)


def main() -> int:
    import duckdb
    import pandas as pd
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    confs = sorted(
        (k, v)
        for k, v in spark.sparkContext.getConf().getAll()
        if k.startswith("spark.sql") or k in ("spark.master",)
    )
    conf_hash = hashlib.md5(json.dumps(confs).encode()).hexdigest()

    import __spark_entry__ as e

    qs, osql = e.queries(), e.oracle_sql()
    assert len(e.entry(spark).collect()) > 0, "entry() smoke failed"
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')"
        )

    def norm(df):
        df = df.reindex(sorted(df.columns), axis=1)
        for c in df.columns:
            if str(df[c].dtype).startswith("datetime"):
                df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
        return df.sort_values(by=list(df.columns), ignore_index=True)

    results: dict[str, bool] = {}
    for name in sorted(osql):
        try:
            s = norm(qs[name](spark, SF_DIR).toPandas())
            d = norm(con.execute(osql[name]).fetchdf())
            ok = list(s.columns) == list(d.columns) and len(s) == len(d)
            if ok:
                for c in s.columns:
                    if any(
                        not (x == y or (pd.isna(x) and pd.isna(y)))
                        for x, y in zip(s[c].tolist(), d[c].tolist())
                    ):
                        ok = False
                        break
        except Exception as exc:  # a crash is a FAIL, not a lost run
            print(f"{name} ERROR {exc}", file=sys.stderr)
            ok = False
        results[name] = bool(ok)
        print(name, "OK" if ok else "FAIL", flush=True)
    fails = sorted(n for n, ok in results.items() if not ok)

    def _git(*args):
        try:
            return subprocess.run(
                ["git", *args], capture_output=True, text=True,
                cwd=os.path.dirname(LOG),
            ).stdout.strip()
        except OSError:
            return ""

    record = {
        "commit": _git("rev-parse", "HEAD"),
        "tree_dirty": bool(_git("status", "--porcelain")),
        "sf_dir": SF_DIR,
        "n_queries": len(results),
        "n_ok": sum(results.values()),
        "fails": fails,
        "session_conf_hash": conf_hash,
        "queries": results,
    }
    log = []
    if os.path.exists(LOG):
        with open(LOG) as f:
            log = json.load(f)
    log.append(record)
    with open(LOG, "w") as f:
        json.dump(log, f, indent=1, sort_keys=True)
    print(f"GATE {record['n_ok']}/{record['n_queries']} FAILS: {fails}")
    spark.stop()
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
