"""Strict Spark-vs-DuckDB differential: replicate a value-hash contract.

For every registered query with an oracle, collect both sides to pandas,
sort columns by name and rows by all columns, then compare:
  - row count
  - pandas dtype per column (int64 vs float64 IS a mismatch: a value hash
    over formatted values sees 123 != 123.0)
  - exact formatted values (repr per cell)

Usage: python tools/strict_oracle_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys

import duckdb

sys.path.insert(0, ".")

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def canon(df):
    import pandas as pd

    df = df.reindex(sorted(df.columns), axis=1)
    # Normalize differences the driver's harness tolerates (observed green
    # rows with them in r01/r02): datetime precision (ns vs us) and integer
    # widths (int8/32 vs int64). int-vs-float is NOT normalized — that is
    # the divergence that actually hash-fails (embedding_quantize_stats r02).
    for c in df.columns:
        dt = str(df[c].dtype)
        if dt.startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
        elif dt in ("int8", "int16", "int32", "uint8", "uint16", "uint32"):
            df[c] = df[c].astype("int64")
    if len(df):
        df = df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def cell(v) -> str:
    import math

    if v is None:
        return "<null>"
    if isinstance(v, float):
        if math.isnan(v):
            return "<null>"
        return repr(v)
    return repr(v)


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entry
    from blockchain_etl_spark.session import get_spark

    spark = get_spark(master="local[8]")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )

    qs = entry.queries()
    oracles = entry.oracle_sql()
    n_bad = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        if name not in oracles:
            print(f"{name}: SKIP (no oracle)")
            continue
        try:
            sdf = canon(fn(spark, sf).toPandas())
            odf = canon(con.execute(oracles[name]).df())
        except Exception as ex:  # noqa: BLE001
            print(f"{name}: ERR {type(ex).__name__} {str(ex)[:160]}")
            n_bad += 1
            continue
        problems = []
        if len(sdf) != len(odf):
            problems.append(f"rows {len(sdf)} vs {len(odf)}")
        if list(sdf.columns) != list(odf.columns):
            problems.append(f"cols {list(sdf.columns)} vs {list(odf.columns)}")
        if not problems:
            for c in sdf.columns:
                sd, od = str(sdf[c].dtype), str(odf[c].dtype)
                if sd != od:
                    problems.append(f"dtype[{c}] {sd} vs {od}")
            for c in sdf.columns:
                sv = sdf[c].map(cell)
                ov = odf[c].map(cell)
                neq = sv != ov
                if neq.any():
                    i = neq.idxmax()
                    problems.append(
                        f"value[{c}] {int(neq.sum())} rows, e.g. {sv[i]} vs {ov[i]}"
                    )
        if problems:
            n_bad += 1
            print(f"{name}: FAIL  " + "; ".join(problems[:4]))
        else:
            print(f"{name}: ok ({len(sdf)} rows)")
    print(f"\n{n_bad} queries with strict mismatches")
    return 1 if n_bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
