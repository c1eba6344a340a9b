"""Timezone-independent epoch arithmetic over TIMESTAMP_NTZ columns.

The driver's testdata writes ``events.ts`` as parquet TIMESTAMP(NANOS,
isAdjustedToUTC=false); Spark 4.1 reads that as TIMESTAMP_NTZ (microsecond-
truncated), while older readers surfaced raw int64 nanos under the legacy
``nanosAsLong`` conf. DuckDB oracles see the same values as naive TIMESTAMP.

``unix_micros``/``unix_timestamp`` require TIMESTAMP (with local timezone)
and either crash on NTZ input (DATATYPE_MISMATCH) or — worse — coerce via
the *session timezone*, silently shifting epochs on any cluster not pinned
to UTC. The helpers here use ``timestampdiff``/``timestampadd`` against the
NTZ epoch literal: pure wall-clock arithmetic, identical on every executor
regardless of session timezone, matching DuckDB's ``epoch_us`` on naive
timestamps. (Reference analogue: src/be_db_block.erl:25,161-163 keeps all
block times as UTC Gregorian seconds for the same reason.)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_EPOCH_NTZ = "TIMESTAMP_NTZ '1970-01-01 00:00:00'"


def _ref(col: Column | str) -> str:
    if isinstance(col, str):
        return f"`{col}`" if not col.startswith("`") else col
    raise TypeError("epoch helpers take a column NAME (SQL expr string)")


def epoch_us(col: str) -> Column:
    """Microseconds since epoch of a TIMESTAMP_NTZ column, tz-independent."""
    return F.expr(f"timestampdiff(MICROSECOND, {_EPOCH_NTZ}, {_ref(col)})")


def epoch_ms(col: str) -> Column:
    return F.expr(f"timestampdiff(MICROSECOND, {_EPOCH_NTZ}, {_ref(col)}) div 1000")


def epoch_s(col: str) -> Column:
    return F.expr(f"timestampdiff(MICROSECOND, {_EPOCH_NTZ}, {_ref(col)}) div 1000000")


def epoch_us_expr(sql_expr: str) -> str:
    """SQL-fragment form for use inside F.expr strings."""
    return f"timestampdiff(MICROSECOND, {_EPOCH_NTZ}, {sql_expr})"


def ntz_from_epoch_s(seconds: Column) -> Column:
    """TIMESTAMP_NTZ from epoch seconds (inverse of epoch_s), tz-independent."""
    return F.expr(_EPOCH_NTZ) + F.make_dt_interval(secs=seconds.cast("double"))


def to_ntz(df: DataFrame, col_name: str) -> DataFrame:
    """Canonicalize a timestamp-ish column to TIMESTAMP_NTZ.

    Handles the three reader behaviors for nanos parquet:
    - bigint (legacy nanosAsLong): integer-div to micros, add to NTZ epoch.
    - timestamp_ntz (Spark 4.1 default): already canonical.
    - timestamp (ltz): cast under the session tz — callers pin UTC so the
      wall clock matches the oracle's naive reading.
    """
    dt = dict(df.dtypes).get(col_name)
    if dt == "bigint":
        return df.withColumn(
            col_name,
            F.expr(f"timestampadd(MICROSECOND, {col_name} div 1000, {_EPOCH_NTZ})"),
        )
    if dt == "timestamp":
        return df.withColumn(col_name, F.col(col_name).cast("timestamp_ntz"))
    return df
