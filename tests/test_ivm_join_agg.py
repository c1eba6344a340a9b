"""IncrementalJoinAggregate: a maintained join feeding a maintained
aggregate must equal the batch join+GROUP BY recompute at every step,
under inserts and deletes on both inputs, crash between the two commits,
and compaction."""

from __future__ import annotations

import collections

import pytest

from blockchain_etl_spark.operators.ivm import _W, IncrementalJoinAggregate


@pytest.fixture()
def jagg(tmp_path):
    # A(k, grp) ⋈ B(k, qty) → per-grp count + qty sum
    return IncrementalJoinAggregate(
        str(tmp_path / "jagg"),
        join_keys=["k"],
        group_keys=["grp"],
        sum_cols=["qty"],
        n_buckets=8,
    )


def _df(spark, rows, cols):
    return spark.createDataFrame(rows, cols)


class Model:
    """Driver-side ground truth: weighted bag join + group aggregate."""

    def __init__(self):
        self.a = collections.Counter()  # (k, grp) -> w
        self.b = collections.Counter()  # (k, qty) -> w

    def feed(self, da=(), db=()):
        for k, grp, w in da:
            self.a[(k, grp)] += w
        for k, qty, w in db:
            self.b[(k, qty)] += w

    def expect(self):
        out = {}
        for (ak, grp), wa in self.a.items():
            for (bk, qty), wb in self.b.items():
                if ak == bk and wa and wb:
                    n, s = out.get(grp, (0, 0))
                    out[grp] = (n + wa * wb, s + qty * wa * wb)
        return {g: v for g, v in out.items() if v[0] != 0}


def _got(jagg, spark):
    df = jagg.read(spark)
    if df is None:
        return {}
    return {r.grp: (r.n_rows, r.qty) for r in df.collect()}


def test_incremental_agg_equals_batch_at_every_step(spark, jagg):
    model = Model()
    steps = [
        (dict(da=[(1, "x", 1), (2, "y", 1)]), 0),
        (dict(db=[(1, 10, 1), (2, 3, 1), (3, 7, 1)]), 1),
        (dict(da=[(3, "x", 1)], db=[(1, 5, 2)]), 2),          # multi-weight insert
        (dict(da=[(1, "x", -1)], ), 3),                        # delete an A row
        (dict(db=[(2, 3, -1)], da=[(2, "y", 1)]), 4),          # delete B + dup A
        (dict(da=[(3, "x", -1)], db=[(3, 7, -1)]), 5),         # cancel a group
    ]
    for kwargs, wm in steps:
        da = kwargs.get("da")
        db = kwargs.get("db")
        jagg.apply(
            spark,
            _df(spark, da, ["k", "grp", _W]) if da else None,
            _df(spark, db, ["k", "qty", _W]) if db else None,
            watermark=wm,
        )
        model.feed(da or (), db or ())
        assert _got(jagg, spark) == model.expect(), (wm, _got(jagg, spark))


def test_crash_between_view_and_agg_commit_heals(spark, jagg, monkeypatch):
    """If the view commits but the aggregate fold crashes, the next apply()
    catches the aggregate up — no lost or double-counted segment."""
    jagg.apply(spark, _df(spark, [(1, "x", 1)], ["k", "grp", _W]),
               _df(spark, [(1, 4, 1)], ["k", "qty", _W]), watermark=0)
    assert _got(jagg, spark) == {"x": (1, 4)}

    # crash the aggregate fold on the next step
    real = jagg.catch_up
    monkeypatch.setattr(jagg, "catch_up", lambda s: (_ for _ in ()).throw(RuntimeError("boom")))
    with pytest.raises(RuntimeError):
        jagg.apply(spark, _df(spark, [(1, "x", 1)], ["k", "grp", _W]), None, watermark=1)
    monkeypatch.setattr(jagg, "catch_up", real)
    # aggregate is stale but the view committed; a later step heals both
    jagg.apply(spark, None, _df(spark, [(1, 6, 1)], ["k", "qty", _W]), watermark=2)
    model = Model()
    model.feed(da=[(1, "x", 1), (1, "x", 1)], db=[(1, 4, 1), (1, 6, 1)])
    assert _got(jagg, spark) == model.expect()


def test_compact_does_not_double_count(spark, jagg):
    model = Model()
    for i in range(3):
        da = [(i, "g", 1)]
        db = [(i, i + 10, 1)]
        jagg.apply(spark, _df(spark, da, ["k", "grp", _W]),
                   _df(spark, db, ["k", "qty", _W]), watermark=i)
        model.feed(da, db)
    before = _got(jagg, spark)
    assert before == model.expect()

    jagg.compact(spark)
    jagg.vacuum()
    assert _got(jagg, spark) == before
    # maintenance continues after compaction without refolding history
    da, db = [(0, "g", -1)], [(9, 9, 1)]
    jagg.apply(spark, _df(spark, da, ["k", "grp", _W]),
               _df(spark, db, ["k", "qty", _W]), watermark=7)
    model.feed(da, db)
    assert _got(jagg, spark) == model.expect()
