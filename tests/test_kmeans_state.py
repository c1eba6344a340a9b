"""CodebookState: incremental folds ≡ one-shot batch, replay is a no-op,
centroids match the in-plan Lloyd re-estimation for the same assignment.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from blockchain_etl_spark.operators.kmeans import CodebookState, assign_cells, to_grid

SF = "/root/testdata/sf0.001"


def _vectors(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").select("vec_id", "embedding")


def _seed_quantizer(spark, k=4):
    return (
        to_grid(_vectors(spark).filter(F.col("vec_id") < k))
        .select(F.col("vec_id").alias("cell"), F.col("vf").alias("cvec"))
    )


def _as_rows(df):
    return sorted(
        (r["cell"], r["dim"], r["centroid_fp"], r["n_members"])
        for r in df.collect()
    )


def test_incremental_equals_batch(spark, tmp_path):
    vecs = _vectors(spark)
    inc = CodebookState(str(tmp_path / "inc"))
    inc.init(spark, _seed_quantizer(spark))
    # three arbitrary uneven batches, out of id order
    inc.update(spark, vecs.filter("vec_id % 3 = 1"), watermark=1)
    inc.update(spark, vecs.filter("vec_id % 3 = 2"), watermark=2)
    inc.update(spark, vecs.filter("vec_id % 3 = 0"), watermark=3)

    one = CodebookState(str(tmp_path / "one"))
    one.init(spark, _seed_quantizer(spark))
    one.update(spark, vecs, watermark=1)

    assert _as_rows(inc.centroids(spark)) == _as_rows(one.centroids(spark))


def test_replay_is_noop(spark, tmp_path):
    vecs = _vectors(spark)
    st = CodebookState(str(tmp_path / "st"))
    st.init(spark, _seed_quantizer(spark))
    st.update(spark, vecs.filter("vec_id % 2 = 0"), watermark=1)
    before = _as_rows(st.centroids(spark))
    # crash-replay of the same batch: watermark not advanced → skipped
    st.update(spark, vecs.filter("vec_id % 2 = 0"), watermark=1)
    assert _as_rows(st.centroids(spark)) == before
    st.update(spark, vecs.filter("vec_id % 2 = 1"), watermark=2)
    assert _as_rows(st.centroids(spark)) != before


def test_centroids_match_direct_reestimation(spark, tmp_path):
    """sum div count through the state == a direct one-pass groupBy mean
    over the same frozen assignment."""
    vecs = _vectors(spark)
    st = CodebookState(str(tmp_path / "st"))
    st.init(spark, _seed_quantizer(spark))
    st.update(spark, vecs, watermark=1)

    assigned = assign_cells(
        to_grid(vecs).select("vec_id", "vf"), st.quantizer(spark)
    )
    direct = (
        assigned.select("cell", F.posexplode("vf").alias("dim", "v"))
        .groupBy("cell", "dim")
        .agg(
            F.expr("sum(v) div count(*)").alias("centroid_fp"),
            F.count(F.lit(1)).cast("long").alias("n_members"),
        )
        .select("cell", F.col("dim").cast("long").alias("dim"), "centroid_fp", "n_members")
    )
    assert _as_rows(st.centroids(spark)) == _as_rows(direct)


def test_empty_cells_keep_frozen_centroid(spark, tmp_path):
    """A quantizer cell that never receives a member must stay in the
    codebook with its frozen centroid and n_members=0 — k never silently
    shrinks (matches ivf_kmeans_codebook's COALESCE-with-previous rule)."""
    vecs = _vectors(spark)
    st = CodebookState(str(tmp_path / "st"))
    st.init(spark, _seed_quantizer(spark, k=4))
    # only feed vectors nearest to SOME cells: restrict to a tiny slice so
    # at least one of the 4 seed cells plausibly ends up empty; then force
    # the situation deterministically by feeding a single vector.
    st.update(spark, vecs.filter("vec_id = 5"), watermark=1)

    cents = st.centroids(spark)
    cells = {r["cell"] for r in cents.select("cell").distinct().collect()}
    assert cells == {0, 1, 2, 3}  # every frozen cell present
    empty = cents.filter("n_members = 0")
    assert empty.count() > 0
    # empty cells carry the frozen centroid verbatim
    frozen = {
        (r["cell"], r["dim"]): r["frozen_fp"]
        for r in st.quantizer(spark)
        .select("cell", F.posexplode("cvec").alias("dim", "frozen_fp"))
        .collect()
    }
    for r in empty.collect():
        assert r["centroid_fp"] == frozen[(r["cell"], r["dim"])]
    # and the refreshed codebook still has all k cells
    assert st.refreshed_quantizer(spark).count() == 4


def test_refreshed_quantizer_roundtrip(spark, tmp_path):
    st = CodebookState(str(tmp_path / "st"))
    st.init(spark, _seed_quantizer(spark))
    st.update(spark, _vectors(spark), watermark=1)
    q = st.refreshed_quantizer(spark)
    rows = q.collect()
    assert {r["cell"] for r in rows} <= {0, 1, 2, 3}
    dims = {len(r["cvec"]) for r in rows}
    assert dims == {64}
