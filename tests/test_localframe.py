"""local_df (Arrow-routed driver-local frames) must be value-identical to
the plain-list createDataFrame path — including nulls in integer columns,
which pandas would otherwise coerce to float64/NaN before the Arrow cast."""

from __future__ import annotations

from blockchain_etl_spark.functions.localframe import local_df


def test_local_df_matches_plain_list_path(spark):
    rows = [(1, "a", 2.5), (2, "b", -0.5)]
    ddl = "k long, name string, v double"
    got = local_df(spark, rows, ddl)
    want = spark.createDataFrame(rows, ddl)
    assert got.schema == want.schema
    assert got.collect() == want.collect()


def test_local_df_preserves_nulls_in_integer_columns(spark):
    rows = [(1, None, "x"), (None, 7, None), (3, 9, "z")]
    ddl = "a long, b long, s string"
    got = local_df(spark, rows, ddl)
    want = spark.createDataFrame(rows, ddl)
    assert got.schema == want.schema
    assert sorted(got.collect(), key=str) == sorted(want.collect(), key=str)
    # the None in a long column must arrive as a NULL, not NaN-cast junk
    assert got.filter("a IS NULL").count() == 1
    assert got.filter("b IS NULL").count() == 1


def test_local_df_empty_rows(spark):
    got = local_df(spark, [], "a long, b string")
    assert got.count() == 0
    assert [f.name for f in got.schema.fields] == ["a", "b"]


def test_local_df_comma_bearing_types(spark):
    rows = [([1, 2], {"k": 3})]
    ddl = "xs array<long>, m map<string,long>"
    got = local_df(spark, rows, ddl)
    r = got.first()
    assert r.xs == [1, 2] and r.m == {"k": 3}
