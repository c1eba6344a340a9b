"""Property tests for the round-5 incremental compositions:

1. ChangelogAggregateView — under ANY hypothesis-generated sequence of
   source-table states (full-replace merges emitting CDC), the
   changelog-maintained aggregate equals the batch GROUP BY recompute at
   every version.
2. IncrementalJoinAggregate — under ANY interleaving of insert/delete
   deltas on both join inputs, the maintained join-fed aggregate equals
   the batch join + GROUP BY of the net multisets after every step.
"""

from __future__ import annotations

import collections

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from blockchain_etl_spark.operators.cdc_view import ChangelogAggregateView
from blockchain_etl_spark.operators.ivm import _W, IncrementalJoinAggregate
from blockchain_etl_spark.operators.merge import ParquetMergeTarget

# -- 1: changelog-driven view ------------------------------------------------

IDS = st.integers(min_value=1, max_value=5)
GRPS = st.sampled_from(["g1", "g2", "g3"])
QTYS = st.integers(min_value=-5, max_value=20)

# one full table state: id -> (grp, qty); consecutive states diff into CDC
STATE = st.dictionaries(IDS, st.tuples(GRPS, QTYS), min_size=0, max_size=5)


@given(states=st.lists(STATE, min_size=1, max_size=4))
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_cdc_view_matches_recompute_for_any_state_sequence(
    spark, tmp_path_factory, states
):
    tmp = tmp_path_factory.mktemp("cdc_prop")
    t = ParquetMergeTarget(str(tmp / "src"))
    view = ChangelogAggregateView(str(tmp / "view"), group_keys=("grp",), sum_cols=("qty",))
    for wm, state in enumerate(states):
        rows = [(i, g, q) for i, (g, q) in sorted(state.items())]
        if not rows:
            # merge_with needs a frame; an empty state deletes everything
            rows = []
            upd = spark.createDataFrame([], "id long, grp string, qty long")
        else:
            upd = spark.createDataFrame(rows, ["id", "grp", "qty"])
        t.merge_with(spark, upd, lambda tgt, u: u, watermark=wm, changelog_keys=("id",))
        view.fold(spark, t)

        expect = collections.Counter()
        sums = collections.Counter()
        for _i, (g, q) in state.items():
            expect[g] += 1
            sums[g] += q
        got_df = view.read(spark)
        got = (
            {r.grp: (r.n_rows, r.qty) for r in got_df.collect()}
            if got_df is not None
            else {}
        )
        assert got == {g: (n, sums[g]) for g, n in expect.items()}, (wm, states)


# -- 2: join-fed aggregate ---------------------------------------------------

JKEYS = st.integers(min_value=0, max_value=3)
JGRPS = st.sampled_from(["x", "y"])
JQ = st.integers(min_value=0, max_value=9)

A_ROW = st.tuples(JKEYS, JGRPS, st.sampled_from([1, 1, -1, 2]))
B_ROW = st.tuples(JKEYS, JQ, st.sampled_from([1, 1, -1]))
JSTEP = st.one_of(
    st.tuples(st.just("a"), st.lists(A_ROW, min_size=1, max_size=3)),
    st.tuples(st.just("b"), st.lists(B_ROW, min_size=1, max_size=3)),
)


def _net(entries):
    c = collections.Counter()
    for k, v, w in entries:
        c[(k, v)] += w
    return {kv: n for kv, n in c.items() if n > 0}


@given(steps=st.lists(JSTEP, min_size=1, max_size=4))
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_join_aggregate_matches_batch_for_any_interleaving(
    spark, tmp_path_factory, steps
):
    tmp = tmp_path_factory.mktemp("jagg_prop")
    jagg = IncrementalJoinAggregate(
        str(tmp / "jagg"), join_keys=["k"], group_keys=["grp"], sum_cols=["qty"], n_buckets=4
    )
    a_hist, b_hist = [], []
    for wm, (side, rows) in enumerate(steps):
        hist = a_hist if side == "a" else b_hist
        net = _net(hist)
        rows = [(k, v, w) for k, v, w in rows if w > 0 or net.get((k, v), 0) >= -w]
        if not rows:
            continue
        cols = ["k", "grp" if side == "a" else "qty", _W]
        df = spark.createDataFrame(rows, cols)
        jagg.apply(
            spark,
            delta_a=df if side == "a" else None,
            delta_b=df if side == "b" else None,
            watermark_a=wm if side == "a" else None,
            watermark_b=wm if side == "b" else None,
        )
        hist.extend(rows)

        a, b = _net(a_hist), _net(b_hist)
        expect: dict = {}
        for (ak, grp), na in a.items():
            for (bk, qty), nb in b.items():
                if ak == bk:
                    n, s = expect.get(grp, (0, 0))
                    expect[grp] = (n + na * nb, s + qty * na * nb)
        expect = {g: v for g, v in expect.items() if v[0] != 0}
        got_df = jagg.read(spark)
        got = (
            {r.grp: (r.n_rows, r.qty) for r in got_df.collect()}
            if got_df is not None
            else {}
        )
        assert got == expect, (wm, steps, a_hist, b_hist)
