"""Portable HyperLogLog primitives — ONE implementation shared by the
registered batch query (plans/olap.py events_hll_portable_rollup) and the
incremental state (operators/hll_state.py), so the two can be asserted
bit-identical rather than merely close.

Spec (engine-neutral, no native sketch blobs):
- bucket   = first 8 bits of md5(id)            (m = 256 buckets)
- rho max  = 61 - bitlen(next 60 bits)          (0-value maps to 61)
- union    = elementwise MAX per (keys, bucket) (associative/idempotent)
- estimate = LogLog alpha·m²/Σ2^-rho in exact DECIMAL integer arithmetic,
  with a PRECOMPUTED integer linear-counting table for the sparse regime
  (empty buckets > 0) — no in-engine transcendental math, so DuckDB and
  Spark agree to the last bit.
"""

from __future__ import annotations

import math as _math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

M = 256
# alpha_m * m^2, milli-scaled integer: 0.7213/(1 + 1.079/m) * m^2 * 1000
A_E3 = round(0.7213 / (1 + 1.079 / M) * M * M * 1000)
# linear-counting lookup: est[e] = round(m * ln(m / e)) for e empty buckets
LC_TABLE = tuple(round(M * _math.log(M / e)) for e in range(1, M + 1))


def bucket_col(id_col: str) -> Column:
    return (
        F.expr(f"conv(substring(md5(cast({id_col} as string)), 1, 2), 16, 10)")
        .cast("long")
    )


def value_col(id_col: str) -> Column:
    return (
        F.expr(f"conv(substring(md5(cast({id_col} as string)), 3, 15), 16, 10)")
        .cast("long")
    )


MAX_ZEROS_SQL = "MAX(CASE WHEN v = 0 THEN 61 ELSE 61 - length(bin(v)) END)"

# One present bucket's term of the harmonic sum, scaled by 2^61:
# 2^61 * 2^-rho = 2^(61 - mz). (An EMPTY bucket contributes 2^61 * 2^0;
# the estimator adds those separately.) NOT 2^mz — that inversion made
# dense-regime estimates explode by ~1e15x while the sparse linear-
# counting branch hid it from the small-sf tests; the dense regime is now
# pinned by tests/test_hll_state.py::test_dense_regime_estimates.
SUM_PRESENT_SQL = (
    "CAST(shiftleft(CAST(1 AS BIGINT), CAST(61 - mz AS INT)) AS DECIMAL(38,0))"
)


def estimate_expr(alias: str = "est_users") -> Column:
    """The estimator over an aggregate frame holding ``n_buckets`` and
    ``sum_present`` (DECIMAL(38,0)) columns."""
    lc = ", ".join(str(x) for x in LC_TABLE)
    return F.expr(
        f"CAST(CASE WHEN n_buckets < {M} "
        f"THEN element_at(array({lc}), CAST({M} - n_buckets AS INT)) "
        f"ELSE (CAST({A_E3} AS DECIMAL(38,0)) * CAST(shiftleft(CAST(1 AS BIGINT), 61) AS DECIMAL(38,0))) "
        f"div sum_present div 1000 END AS BIGINT)"
    ).alias(alias)


def partial(df: DataFrame, keys: "list[str]", id_col: str) -> DataFrame:
    """(keys..., bucket) -> max zeros for one batch — the mergeable unit."""
    h = df.select(*keys, bucket_col(id_col).alias("bucket"), value_col(id_col).alias("v"))
    return h.groupBy(*keys, "bucket").agg(
        F.expr(MAX_ZEROS_SQL).cast("long").alias("mz")
    )
