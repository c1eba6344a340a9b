"""Physical-layout tests: partition pruning on history writes, exchange-free
bucketed joins, and salted-join equivalence."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.functions import col

from blockchain_etl_spark.operators.skew import salted_join
from blockchain_etl_spark.sources.lake import write_bucketed, write_history


def test_history_partition_pruning(spark, tmp_path):
    path = str(tmp_path / "hist")
    df = spark.range(0, 10_000).select(
        col("id").alias("block"), (col("id") * 2).alias("v")
    )
    write_history(df, path, blocks_per_bucket=1000)
    back = spark.read.parquet(path)
    assert back.count() == 10_000
    pruned = back.filter(col("height_bucket") == 3)
    assert pruned.count() == 1000
    # partition pruning reaches the scan: the predicate appears as a
    # PartitionFilter, not a post-scan Filter
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "height_bucket" in plan.split(
        "PartitionFilters"
    )[1].split("]")[0]


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        orders = spark.range(0, 5000).select(
            col("id").alias("k"), (col("id") % 7).alias("a")
        )
        lines = spark.range(0, 20000).select(
            (col("id") % 5000).alias("k"), (col("id") % 11).alias("b")
        )
        write_bucketed(orders, "t_orders_b", ["k"], num_buckets=8, sort_keys=["k"])
        write_bucketed(lines, "t_lines_b", ["k"], num_buckets=8, sort_keys=["k"])
        j = spark.table("t_orders_b").join(spark.table("t_lines_b"), "k")
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert j.count() == 20000
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )
        spark.sql("DROP TABLE IF EXISTS t_orders_b")
        spark.sql("DROP TABLE IF EXISTS t_lines_b")


def test_salted_join_equals_plain_join(spark):
    # hot key: 80% of the fact side is key 0
    fact = spark.range(0, 10_000).select(
        F.when(col("id") % 5 < 4, F.lit(0)).otherwise(col("id") % 50).alias("k"),
        col("id").alias("payload"),
    )
    dim = spark.range(0, 50).select(col("id").alias("k"), (col("id") * 10).alias("attr"))
    plain = fact.join(dim, "k").select("k", "payload", "attr")
    salted = salted_join(fact, dim, "k").select("k", "payload", "attr")
    assert plain.count() == salted.count() == 10_000
    assert {tuple(r) for r in plain.collect()} == {tuple(r) for r in salted.collect()}


def test_salted_join_left_mode_equals_plain_left_join(spark):
    # fact rows with no dim match must survive exactly once (null attr)
    fact = spark.range(0, 1000).select(
        (col("id") % 80).alias("k"), col("id").alias("payload")
    )
    dim = spark.range(0, 50).select(
        col("id").alias("k"), (col("id") * 10).alias("attr")
    )
    plain = fact.join(dim, "k", "left").select("k", "payload", "attr")
    salted = salted_join(fact, dim, "k", how="left").select("k", "payload", "attr")
    assert plain.count() == salted.count() == 1000
    assert {tuple(r) for r in plain.collect()} == {tuple(r) for r in salted.collect()}


@pytest.mark.parametrize("how", ["cross", "right", "full", "outer", "right_outer"])
def test_salted_join_rejects_non_fact_preserving_modes(spark, how):
    """cross would join on (key,salt) — 16x a true cross join; right/full
    would emit each unmatched dim row once per salt bucket. The API must
    refuse rather than return wrong row counts."""
    fact = spark.range(0, 10).select(col("id").alias("k"))
    dim = spark.range(0, 3).select(col("id").alias("k"))
    with pytest.raises(ValueError, match="not fact-preserving"):
        salted_join(fact, dim, "k", how=how)


def test_salted_join_bounds_per_task_input_under_heavy_skew(spark):
    """100x+ hot-key skew: the salted join must keep every reduce task's
    input bounded (max partition <= 2x median of non-empty partitions),
    where the plain join necessarily funnels the whole hot key through ONE
    task. Partition row counts are observed with AQE off so the static
    hash partitioning is what's measured — at cluster scale these
    partitions are the reduce tasks."""
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        # 50k rows on key 0, 50k spread over 3200 cold keys (~15 rows each):
        # the hot key is ~3000x a cold key and half the fact table.
        fact = spark.range(0, 100_000).select(
            F.when(col("id") < 50_000, F.lit(0))
            .otherwise(col("id") % 3200)
            .alias("k"),
            col("id").alias("payload"),
        )
        dim = spark.range(0, 3200).select(
            col("id").alias("k"), (col("id") * 10).alias("attr")
        )

        def partition_counts(df):
            return [
                r["n"]
                for r in df.select(F.spark_partition_id().alias("pid"))
                .groupBy("pid")
                .agg(F.count(F.lit(1)).alias("n"))
                .collect()
            ]

        plain = partition_counts(fact.join(dim, "k"))
        salted = partition_counts(salted_join(fact, dim, "k", salt_buckets=64))
        assert sum(plain) == sum(salted) == 100_000
        # the plain join funnels the hot key into one task
        assert max(plain) >= 50_000, plain
        nonempty = sorted(n for n in salted if n > 0)
        median = nonempty[len(nonempty) // 2]
        assert max(nonempty) <= 2 * median, (max(nonempty), median, nonempty)
        # and the worst salted task holds a small fraction of the hot key
        assert max(nonempty) < max(plain) / 5, (max(nonempty), max(plain))
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )


def test_morton_key_interleaves_bits(spark):
    from pyspark.sql import functions as F

    from blockchain_etl_spark.sources.lake import morton_key

    df = spark.createDataFrame([(0b101, 0b011)], ["x", "y"]).select(
        morton_key([F.col("x"), F.col("y")], bits=3).alias("z")
    )
    # interleaved LSB-first (x0 y0 x1 y1 x2 y2): x=101, y=011 → 0b011011
    assert df.first().z == 0b011011
    # locality: key is monotone when both dims grow together
    df2 = spark.createDataFrame([(i, i) for i in range(8)], ["x", "y"]).select(
        "x", morton_key([F.col("x"), F.col("y")], bits=4).alias("z")
    )
    zs = [r.z for r in df2.orderBy("x").collect()]
    assert zs == sorted(zs)


def test_write_zordered_clusters_row_groups(spark, tmp_path):
    import pyarrow.parquet as pq

    from blockchain_etl_spark.sources.lake import write_zordered

    df = spark.range(0, 4096).selectExpr(
        "id % 64 AS a", "CAST(id / 64 AS LONG) AS b", "id AS payload"
    )
    out = str(tmp_path / "z")
    write_zordered(df, out, ["a", "b"], num_files=8, bits=8)
    # each output file must cover a narrow range of BOTH dims (locality):
    import glob as g

    spans_a, spans_b = [], []
    for f in g.glob(out + "/part-*.parquet"):
        t = pq.read_table(f)
        a, b = t.column("a").to_pylist(), t.column("b").to_pylist()
        spans_a.append(max(a) - min(a))
        spans_b.append(max(b) - min(b))
    # random placement would give span ~63 on both; z-order keeps the
    # average well below
    assert sum(spans_a) / len(spans_a) < 40, spans_a
    assert sum(spans_b) / len(spans_b) < 40, spans_b
