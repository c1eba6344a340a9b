"""Property test for IncrementalJoinView: under ANY hypothesis-generated
sequence of insert/delete delta batches on either side, the maintained
view equals the batch join of the net multisets after every step."""

from __future__ import annotations

import collections

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from blockchain_etl_spark.operators.ivm import IncrementalJoinView, _W

KEYS = st.integers(min_value=0, max_value=4)
VALS = st.sampled_from(["p", "q", "r"])

# one delta row: (key, value, weight ∈ {+1, -1, +2})
ROW = st.tuples(KEYS, VALS, st.sampled_from([1, 1, 1, -1, 2]))

# a step: (side, rows) — sides may interleave arbitrarily
STEP = st.tuples(st.sampled_from(["a", "b"]), st.lists(ROW, min_size=1, max_size=4))


def _net(entries):
    c = collections.Counter()
    for k, v, w in entries:
        c[(k, v)] += w
    return {kv: n for kv, n in c.items() if n > 0}


def _expected(a_entries, b_entries):
    a, b = _net(a_entries), _net(b_entries)
    out = collections.Counter()
    for (ak, av), na in a.items():
        for (bk, bv), nb in b.items():
            if ak == bk:
                out[(ak, av, bv)] += na * nb
    return {k: v for k, v in out.items() if v != 0}


@given(steps=st.lists(STEP, min_size=1, max_size=5))
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_any_delta_sequence_matches_batch_join(spark, tmp_path_factory, steps):
    tmp = tmp_path_factory.mktemp("ivm_prop")
    jv = IncrementalJoinView(str(tmp / "jv"), join_keys=["k"], n_buckets=4)
    a_hist, b_hist = [], []
    for wm, (side, rows) in enumerate(steps):
        # guard: never retract below zero net multiplicity (bag semantics)
        hist = a_hist if side == "a" else b_hist
        net = _net(hist)
        rows = [
            (k, v, w)
            for k, v, w in rows
            if w > 0 or net.get((k, v), 0) >= -w
        ]
        if not rows:
            continue
        cols = ["k", "av" if side == "a" else "bv", _W]
        df = spark.createDataFrame(rows, cols)
        jv.apply(
            spark,
            delta_a=df if side == "a" else None,
            delta_b=df if side == "b" else None,
            watermark_a=wm if side == "a" else None,
            watermark_b=wm if side == "b" else None,
        )
        hist.extend(rows)

        got = collections.Counter()
        view = jv.read(spark)
        if view is not None:
            for r in view.collect():
                got[(r.k, r.av, r.bv)] += r[_W]
        got = {k: v for k, v in got.items() if v != 0}
        assert got == _expected(a_hist, b_hist), (steps, a_hist, b_hist)


if __name__ == "__main__":  # pragma: no cover
    pytest.main([__file__, "-q"])
