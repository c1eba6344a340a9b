"""ChangelogAggregateView: a derived aggregate maintained from CDC rows
alone must equal the batch GROUP BY recompute over the source table at
EVERY version, under interleaved inserts, updates (including group-key
moves), and deletes — and replays/crash-recovery re-folds are no-ops."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.functions import col

from blockchain_etl_spark.operators.cdc_view import ChangelogAggregateView
from blockchain_etl_spark.operators.merge import ParquetMergeTarget

# source table: (id PRIMARY KEY, grp, qty) — the view maintains
# per-grp row counts and qty sums.
STATES = [
    [(1, "a", 10), (2, "a", 5), (3, "b", 7)],                 # inserts
    [(1, "a", 12), (2, "b", 5), (3, "b", 7), (4, "c", 1)],    # upd qty, grp move, insert
    [(1, "a", 12), (4, "c", 2)],                              # deletes + upd
    [(5, "a", 100)],                                          # churn everything
]


def _merge_state(t, spark, rows, wm):
    upd = spark.createDataFrame(rows, ["id", "grp", "qty"])
    # full-replace fold: new state IS the updates (easiest way to express
    # deletes through merge_with while still emitting a changelog diff)
    return t.merge_with(spark, upd, lambda tgt, u: u, watermark=wm, changelog_keys=("id",))


def _recompute(spark, t, version):
    src = t.read(spark, version=version)
    return {
        (r.grp): (r.n_rows, r.qty)
        for r in src.groupBy("grp")
        .agg(F.count(F.lit(1)).alias("n_rows"), F.sum("qty").alias("qty"))
        .collect()
    }


def _view_dict(view, spark):
    return {r.grp: (r.n_rows, r.qty) for r in view.read(spark).collect()}


def test_view_equals_recompute_at_every_version(spark, tmp_path):
    t = ParquetMergeTarget(str(tmp_path / "src"))
    view = ChangelogAggregateView(str(tmp_path / "view"), group_keys=("grp",), sum_cols=("qty",))
    for i, rows in enumerate(STATES):
        _merge_state(t, spark, rows, wm=i)
        view.fold(spark, t)
        assert view.folded_version() == t.current_version()
        assert _view_dict(view, spark) == _recompute(spark, t, t.current_version()), i


def test_fold_catches_up_over_multiple_versions(spark, tmp_path):
    """A view that fell behind (e.g. consumer downtime) folds all missed
    versions in one call and lands on the same state."""
    t = ParquetMergeTarget(str(tmp_path / "src2"))
    for i, rows in enumerate(STATES):
        _merge_state(t, spark, rows, wm=i)
    view = ChangelogAggregateView(str(tmp_path / "view2"), group_keys=("grp",), sum_cols=("qty",))
    view.fold(spark, t)
    assert _view_dict(view, spark) == _recompute(spark, t, t.current_version())


def test_refold_is_noop(spark, tmp_path):
    t = ParquetMergeTarget(str(tmp_path / "src3"))
    _merge_state(t, spark, STATES[0], wm=0)
    view = ChangelogAggregateView(str(tmp_path / "view3"), group_keys=("grp",), sum_cols=("qty",))
    view.fold(spark, t)
    v_before = view.target.current_version()
    view.fold(spark, t)  # nothing new
    assert view.target.current_version() == v_before
    assert _view_dict(view, spark) == _recompute(spark, t, 1)


def test_missing_changelog_is_an_error(spark, tmp_path):
    t = ParquetMergeTarget(str(tmp_path / "src4"))
    upd = spark.createDataFrame(STATES[0], ["id", "grp", "qty"])
    t.merge_with(spark, upd, lambda tgt, u: u, watermark=0)  # no changelog_keys
    view = ChangelogAggregateView(str(tmp_path / "view4"), group_keys=("grp",), sum_cols=("qty",))
    import pytest

    with pytest.raises(ValueError, match="no changelog segment"):
        view.fold(spark, t)


def test_follow_tracks_a_live_writer(spark, tmp_path):
    """The polling follower must absorb merges that land WHILE it runs and
    settle on the recompute state (the T6 tick form of consumption)."""
    import threading
    import time

    from blockchain_etl_spark.operators.cdc_view import follow

    t = ParquetMergeTarget(str(tmp_path / "live"))
    view = ChangelogAggregateView(str(tmp_path / "lview"), group_keys=("grp",), sum_cols=("qty",))
    _merge_state(t, spark, STATES[0], wm=0)

    def writer():
        for i, rows in enumerate(STATES[1:], start=1):
            time.sleep(0.4)
            _merge_state(t, spark, rows, wm=i)

    w = threading.Thread(target=writer)
    w.start()
    folded = follow(view, spark, t, poll_interval_s=0.3, max_idle_polls=6)
    w.join()
    # the follower may settle before the last write in rare scheduling; one
    # final catch-up tick makes the assertion about CORRECTNESS, not timing
    view.fold(spark, t)
    assert folded >= 1
    assert view.folded_version() == t.current_version()
    assert _view_dict(view, spark) == _recompute(spark, t, t.current_version())


def test_catch_up_seeds_when_changelogs_predate_cdc(spark, tmp_path):
    """Enabling a view on a source that merged versions WITHOUT
    changelog_keys must seed from a snapshot (not wedge with ValueError),
    then resume CDC-only folds for subsequent versions."""
    t = ParquetMergeTarget(str(tmp_path / "seed_src"))
    # two pre-CDC versions: no changelog segments exist for them
    for i, rows in enumerate(STATES[:2]):
        upd = spark.createDataFrame(rows, ["id", "grp", "qty"])
        t.merge_with(spark, upd, lambda tgt, u: u, watermark=i)
    view = ChangelogAggregateView(
        str(tmp_path / "seed_view"), group_keys=("grp",), sum_cols=("qty",)
    )
    view.catch_up(spark, t)  # seeds from the v=2 snapshot
    assert view.folded_version() == t.current_version()
    assert _view_dict(view, spark) == _recompute(spark, t, t.current_version())
    # CDC turned on from here: catch_up folds incrementally (no re-seed —
    # the view version advances by exactly one per source version)
    for i, rows in enumerate(STATES[2:], start=2):
        _merge_state(t, spark, rows, wm=i)
        before = view.target.current_version()
        view.catch_up(spark, t)
        assert view.target.current_version() == before + 1
        assert _view_dict(view, spark) == _recompute(spark, t, t.current_version())


def test_catch_up_reseeds_after_vacuum_outran_the_view(spark, tmp_path):
    """vacuum() dropping changelog segments the view has not folded yet
    must re-seed instead of wedging."""
    t = ParquetMergeTarget(str(tmp_path / "vac_src"))
    view = ChangelogAggregateView(
        str(tmp_path / "vac_view"), group_keys=("grp",), sum_cols=("qty",)
    )
    _merge_state(t, spark, STATES[0], wm=0)
    view.catch_up(spark, t)
    for i, rows in enumerate(STATES[1:], start=1):
        _merge_state(t, spark, rows, wm=i)
    t.vacuum(keep_last=1)  # drops the changelogs the lagging view needs
    view.catch_up(spark, t)
    assert view.folded_version() == t.current_version()
    assert _view_dict(view, spark) == _recompute(spark, t, t.current_version())


def test_sum_col_that_is_a_merge_key_raises_clearly(spark, tmp_path):
    """A sum_col that is also a changelog merge key has no __before image;
    the fold must fail with the real reason, not an unresolved-column
    analysis error."""
    import pytest

    t = ParquetMergeTarget(str(tmp_path / "badsum_src"))
    _merge_state(t, spark, STATES[0], wm=0)  # changelog_keys=("id",)
    view = ChangelogAggregateView(
        str(tmp_path / "badsum_view"), group_keys=("grp",), sum_cols=("id",)
    )
    with pytest.raises(ValueError, match="merge key"):
        view.fold(spark, t)


def test_follow_counts_folds_from_view_state(spark, tmp_path):
    """follow() must report versions folded as measured by the VIEW's own
    watermark advance — a writer racing ahead between the poll and the
    fold may fold more versions than the poll observed."""
    from blockchain_etl_spark.operators.cdc_view import follow

    t = ParquetMergeTarget(str(tmp_path / "cnt_src"))
    view = ChangelogAggregateView(
        str(tmp_path / "cnt_view"), group_keys=("grp",), sum_cols=("qty",)
    )
    for i, rows in enumerate(STATES):
        _merge_state(t, spark, rows, wm=i)
    folded = follow(view, spark, t, poll_interval_s=0.05, max_idle_polls=1)
    assert folded == t.current_version()
    assert view.folded_version() == t.current_version()


def test_follow_heals_vacuumed_gap_mid_run(spark, tmp_path):
    """A vacuum that outruns a lagging follower must re-seed (pinned
    snapshot) inside the follow loop, not kill it with a
    missing-changelog ValueError."""
    from blockchain_etl_spark.operators.cdc_view import follow

    t = ParquetMergeTarget(str(tmp_path / "vacrun_src"))
    view = ChangelogAggregateView(
        str(tmp_path / "vacrun_view"), group_keys=("grp",), sum_cols=("qty",)
    )
    _merge_state(t, spark, STATES[0], wm=0)
    view.catch_up(spark, t)
    for i, rows in enumerate(STATES[1:], start=1):
        _merge_state(t, spark, rows, wm=i)
    t.vacuum(keep_last=1)  # the follower's next segments are gone
    folded = follow(view, spark, t, poll_interval_s=0.05, max_idle_polls=1)
    assert folded == t.current_version() - 1
    assert view.folded_version() == t.current_version()
    assert _view_dict(view, spark) == _recompute(spark, t, t.current_version())


def test_catch_up_seed_is_pinned_to_captured_version(spark, tmp_path):
    """catch_up must seed from the version it captured, not whatever the
    source advances to between the capture and the read — otherwise the
    next fold re-applies the racing version's changelog and
    double-counts."""
    t = ParquetMergeTarget(str(tmp_path / "pin_src"))
    view = ChangelogAggregateView(
        str(tmp_path / "pin_view"), group_keys=("grp",), sum_cols=("qty",)
    )
    # v1 without CDC (forces the seed path), v2 with CDC
    upd = spark.createDataFrame(STATES[0], ["id", "grp", "qty"])
    t.merge_with(spark, upd, lambda _t, u: u, watermark=0)

    real_read = ParquetMergeTarget.read
    seen = []

    def racing_read(self, spark_, version=None):
        # the first pinned read during catch_up: a writer publishes v2
        # BEFORE the snapshot is taken
        if version is not None and not seen:
            seen.append(version)
            _merge_state(t, spark_, STATES[1], wm=1)
        return real_read(self, spark_, version=version)

    ParquetMergeTarget.read = racing_read
    try:
        view.catch_up(spark, t)
    finally:
        ParquetMergeTarget.read = real_read
    assert seen == [1], "seed must read a PINNED version"
    # the seed covered v1 only; fold v2's changelog and compare
    view.catch_up(spark, t)
    assert view.folded_version() == t.current_version()
    assert _view_dict(view, spark) == _recompute(spark, t, t.current_version())
