"""Property-based test (hypothesis): merge_latest over arbitrary update
sequences equals a naive single-threaded dict model applying the reference's
trigger semantics (latest wins, NULL keeps prior via COALESCE, first/last
bookkeeping) — regardless of how the sequence is chunked into merges."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from blockchain_etl_spark.operators.merge import merge_latest

KEYS = ("k1", "k2", "k3")

updates_strategy = st.lists(
    st.tuples(
        st.sampled_from(KEYS),
        st.integers(min_value=1, max_value=50),  # block
        st.one_of(st.none(), st.integers(min_value=0, max_value=9)),  # value
    ),
    min_size=1,
    max_size=25,
)

chunking = st.integers(min_value=1, max_value=4)


def naive_model(rows):
    """Dict model: process in (block, arrival) order; latest block wins,
    None value keeps prior (COALESCE), first/last track min/max block."""
    state = {}
    for key, block, value in sorted(rows, key=lambda r: (r[0], r[1])):
        if key not in state:
            state[key] = {
                "block": block, "value": value,
                "first": block, "last": block,
            }
        else:
            s = state[key]
            if block >= s["block"]:
                s["block"] = block
                if value is not None:
                    s["value"] = value
            elif s["value"] is None and value is not None:
                # an older row can only fill a hole left by newer NULLs if
                # no non-null newer value exists; handled by ordered pass
                pass
            s["first"] = min(s["first"], block)
            s["last"] = max(s["last"], block)
    return {
        k: (s["value"], s["first"], s["last"]) for k, s in state.items()
    }


@pytest.mark.usefixtures("spark")
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=updates_strategy, n_chunks=chunking)
def test_merge_matches_model_under_any_chunking(spark, rows, n_chunks):
    # de-duplicate (key, block) pairs: the model and the merge both need a
    # total order; same-block duplicates are ambiguous by design (the
    # reference's trigger fires once per inserted history row)
    seen = set()
    uniq = []
    for r in rows:
        if (r[0], r[1]) not in seen:
            seen.add((r[0], r[1]))
            uniq.append(r)
    rows = uniq

    want = naive_model(rows)

    # apply in n_chunks sequential merges split by block range, as the
    # ingest pipeline would
    rows_sorted = sorted(rows, key=lambda r: r[1])
    target = None
    bounds = [
        rows_sorted[i * len(rows_sorted) // n_chunks : (i + 1) * len(rows_sorted) // n_chunks]
        for i in range(n_chunks)
    ]
    for chunk in bounds:
        if not chunk:
            continue
        updates = spark.createDataFrame(
            chunk, "key string, block long, value long"
        )
        target = merge_latest(
            target,
            updates,
            keys=["key"],
            order=["block"],
            coalesce_cols=["value"],
            first_col="first_block",
            last_col="last_block",
        ).localCheckpoint()

    got = {
        r.key: (r.value, r.first_block, r.last_block)
        for r in target.collect()
    }
    assert got == want


def test_unwatermarked_merge_carries_watermark_forward(spark, tmp_path):
    """A maintenance fold without a watermark (tombstone sweep, manual
    compaction) must not reset the stored high-mark to -1 — that would
    silently disable the replay guard of every later watermarked merge."""
    from blockchain_etl_spark.operators.merge import ParquetMergeTarget

    t = ParquetMergeTarget(str(tmp_path / "wm_carry"))
    rows = spark.createDataFrame([(1, 5)], ["k", "v"])
    t.merge(spark, rows, keys=["k"], order=["v"], watermark=3)
    assert t.watermark() == 3
    t.merge_with(spark, rows, lambda tgt, u: u)  # no watermark given
    assert t.watermark() == 3, "carry the prior high-mark forward"
    # replayed batch 3 is still skipped
    before = t.current_version()
    t.merge(spark, rows, keys=["k"], order=["v"], watermark=3)
    assert t.current_version() == before
