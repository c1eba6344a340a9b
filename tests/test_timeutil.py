"""functions/timeutil: NTZ canonicalization across all three reader
behaviors, and tz-independence of the epoch helpers (the properties that
keep every events-table query correct on any session timezone)."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from blockchain_etl_spark.functions.timeutil import (
    epoch_ms,
    epoch_s,
    epoch_us,
    to_ntz,
)

_WALL = datetime.datetime(2021, 3, 4, 5, 6, 7, 123456)
_US = 1614834367123456  # epoch micros of the wall clock above, read as UTC


def test_to_ntz_from_bigint_nanos(spark):
    df = spark.createDataFrame([(_US * 1000 + 789,)], "ts long")  # nanos + sub-us
    out = to_ntz(df, "ts")
    assert dict(out.dtypes)["ts"] == "timestamp_ntz"
    assert out.first()["ts"] == _WALL  # truncated to micros


def test_to_ntz_passthrough_and_from_ltz(spark):
    ntz = spark.createDataFrame([(_WALL,)], "ts timestamp_ntz")
    assert dict(to_ntz(ntz, "ts").dtypes)["ts"] == "timestamp_ntz"
    assert to_ntz(ntz, "ts").first()["ts"] == _WALL

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    ltz = spark.createDataFrame([(_WALL,)], "ts timestamp")
    out = to_ntz(ltz, "ts")
    assert dict(out.dtypes)["ts"] == "timestamp_ntz"
    assert out.first()["ts"] == _WALL


def test_epoch_helpers_are_session_tz_independent(spark):
    df = spark.createDataFrame([(_WALL,)], "ts timestamp_ntz")
    before = spark.conf.get("spark.sql.session.timeZone")
    try:
        results = {}
        for tz in ("UTC", "America/New_York", "Asia/Tokyo"):
            spark.conf.set("spark.sql.session.timeZone", tz)
            row = df.select(
                epoch_us("ts").alias("us"),
                epoch_ms("ts").alias("ms"),
                epoch_s("ts").alias("s"),
            ).first()
            results[tz] = (row["us"], row["ms"], row["s"])
    finally:
        spark.conf.set("spark.sql.session.timeZone", before)
    assert len(set(results.values())) == 1  # identical under every tz
    assert results["UTC"] == (_US, _US // 1000, _US // 1000000)


def test_unix_micros_would_shift_with_tz(spark):
    """Document WHY the helpers exist: casting NTZ through the session tz
    (what unix_micros coercion does) moves the epoch value."""
    df = spark.createDataFrame([(_WALL,)], "ts timestamp_ntz")
    before = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "Asia/Tokyo")
        shifted = df.select(
            F.unix_micros(F.col("ts").cast("timestamp")).alias("us")
        ).first()["us"]
    finally:
        spark.conf.set("spark.sql.session.timeZone", before)
    assert shifted != _US  # Tokyo wall clock is 9h ahead of UTC
    assert shifted == _US - 9 * 3600 * 1_000_000
