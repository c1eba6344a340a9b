"""Deterministic numeric aggregation helpers.

Spark sums doubles in partial-aggregation order (partition-dependent), while
a single-node oracle sums in scan order; the same query can differ in the
last few ulps and fail an exact value-hash. Every double aggregate in this
engine therefore accumulates in exact DECIMAL and casts back to DOUBLE at
the end: identical results on any engine, any partitioning, any cluster
size. The per-row double→decimal rounding is itself deterministic (IEEE 754
value → scaled decimal), so Spark and the DuckDB oracle agree bit-for-bit.

This mirrors the reference's own float-pinning concern
(/root/reference/src/be_db_vars.erl:126 formats floats with fixed decimals;
blockchain_utils:normalize_float in src/be_db_gateway.erl:195-196).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# 6 fractional digits comfortably covers the testdata's 2-dp money columns
# and ratio expressions; 25 integer digits of headroom means no overflow at
# 100 TB row counts (sum of 1e12 rows × 1e7 values < 1e19 << 1e25).
DEC = "decimal(25,6)"


def dsum(col: Column | str, alias: str | None = None) -> Column:
    """Exact (order-insensitive) sum of a double column, returned as DOUBLE."""
    c = F.col(col) if isinstance(col, str) else col
    out = F.sum(c.cast(DEC)).cast("double")
    return out.alias(alias) if alias else out


def dsum_expr(sql_expr: str) -> str:
    """Oracle-side SQL fragment matching :func:`dsum`."""
    return f"CAST(SUM(CAST({sql_expr} AS DECIMAL(25,6))) AS DOUBLE)"


def davg(col: Column | str, alias: str | None = None) -> Column:
    """Deterministic average: exact decimal sum, then one double division."""
    c = F.col(col) if isinstance(col, str) else col
    out = F.sum(c.cast(DEC)).cast("double") / F.count(c)
    return out.alias(alias) if alias else out


def davg_expr(sql_expr: str) -> str:
    return f"CAST(SUM(CAST({sql_expr} AS DECIMAL(25,6))) AS DOUBLE) / COUNT({sql_expr})"
