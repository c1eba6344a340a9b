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


def test_catch_up_heals_gap_in_the_middle_of_the_range(spark, tmp_path):
    """A missing segment LATER in (folded, cur] — e.g. one interleaved
    merge ran without changelog_keys — must re-seed (pinned), not wedge
    fold()'s follower with a ValueError."""
    t = ParquetMergeTarget(str(tmp_path / "midgap_src"))
    view = ChangelogAggregateView(
        str(tmp_path / "midgap_view"), group_keys=("grp",), sum_cols=("qty",)
    )
    _merge_state(t, spark, STATES[0], wm=0)
    view.catch_up(spark, t)
    _merge_state(t, spark, STATES[1], wm=1)  # v2 HAS a changelog
    upd = spark.createDataFrame(STATES[2], ["id", "grp", "qty"])
    t.merge_with(spark, upd, lambda _t, u: u, watermark=2)  # v3: NO changelog
    _merge_state(t, spark, STATES[3], wm=3)  # v4 has one again
    view.catch_up(spark, t)
    assert view.folded_version() == t.current_version()
    assert _view_dict(view, spark) == _recompute(spark, t, t.current_version())


def test_catch_up_does_not_mask_sum_col_misconfig(spark, tmp_path):
    """Only the missing-segment signal triggers the re-seed: a sum_col
    that is a changelog merge key is a configuration error and must
    surface through catch_up too, not be papered over by a snapshot
    seed."""
    import pytest

    t = ParquetMergeTarget(str(tmp_path / "mask_src"))
    _merge_state(t, spark, STATES[0], wm=0)
    view = ChangelogAggregateView(
        str(tmp_path / "mask_view"), group_keys=("grp",), sum_cols=("id",)
    )
    with pytest.raises(ValueError, match="merge key"):
        view.catch_up(spark, t)


# ---------------------------------------------------------------------------
# Retractable min/max: extrema fold monotonically under inserts and
# re-derive ONLY retraction-hit groups from the pinned source snapshot.
# ---------------------------------------------------------------------------
MM_STATES = [
    [(1, "a", 10), (2, "a", 5), (3, "b", 7), (4, "b", 2)],   # inserts
    [(1, "a", 10), (2, "a", 5), (4, "b", 2), (5, "b", 9)],   # del b's max, ins new max
    [(1, "a", 3), (2, "a", 5), (4, "b", 2), (5, "b", 9)],    # upd retracts a's max 10
    [(2, "a", 5), (4, "b", 2), (5, "b", 9), (6, "c", 1)],    # del a's min, new grp
    [(6, "c", 4)],                                           # churn + upd c's extremum
]


def _mm_view(tmp_path, name):
    return ChangelogAggregateView(
        str(tmp_path / name),
        group_keys=("grp",),
        sum_cols=("qty",),
        min_cols=("qty",),
        max_cols=("qty",),
    )


def _mm_recompute(spark, t, version):
    src = t.read(spark, version=version)
    return {
        r.grp: (r.n_rows, r.qty, r.min_qty, r.max_qty)
        for r in src.groupBy("grp")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("qty").alias("qty"),
            F.min("qty").alias("min_qty"),
            F.max("qty").alias("max_qty"),
        )
        .collect()
    }


def _mm_view_dict(view, spark):
    return {
        r.grp: (r.n_rows, r.qty, r.min_qty, r.max_qty)
        for r in view.read(spark).collect()
    }


def test_minmax_view_equals_recompute_at_every_version(spark, tmp_path):
    """(min, max, count, sum) maintained ≡ GROUP BY recompute at EVERY
    version, under inserts, extremum-retracting deletes/updates, group
    churn, and a group whose only row's extremum moves."""
    t = ParquetMergeTarget(str(tmp_path / "mm_src"))
    view = _mm_view(tmp_path, "mm_view")
    for i, rows in enumerate(MM_STATES):
        _merge_state(t, spark, rows, wm=i)
        view.fold(spark, t)
        assert view.folded_version() == t.current_version()
        assert _mm_view_dict(view, spark) == _mm_recompute(spark, t, t.current_version()), i


def test_minmax_fold_reads_source_only_on_extremum_retraction(spark, tmp_path):
    """The rescan is BOUNDED: a fold whose changelog retracts no stored
    extremum performs zero source-table reads; a retraction re-derives
    from the snapshot pinned at that changelog's version."""
    t = ParquetMergeTarget(str(tmp_path / "mmb_src"))
    view = _mm_view(tmp_path, "mmb_view")

    reads = []
    real_read = ParquetMergeTarget.read

    def counting_read(self, spark_, version=None):
        if self is t:
            reads.append(version)
        return real_read(self, spark_, version=version)

    ParquetMergeTarget.read = counting_read
    try:
        _merge_state(t, spark, MM_STATES[0], wm=0)
        reads.clear()
        view.fold(spark, t)
        assert reads == [], "initial insert-only fold must not read the source"
        # an extremum-retracting update (id 2's before = a's stored min)
        # must rescan exactly once, PINNED at the changelog's version
        rows = [(1, "a", 10), (2, "a", 6), (3, "b", 7), (4, "b", 2)]
        _merge_state(t, spark, rows, wm=1)
        reads.clear()
        view.fold(spark, t)
        assert reads == [t.current_version()], reads
    finally:
        ParquetMergeTarget.read = real_read
    assert _mm_view_dict(view, spark) == _mm_recompute(spark, t, t.current_version())


def test_minmax_interior_update_reads_no_source(spark, tmp_path):
    """An update whose before-image sits strictly INSIDE the stored
    (min, max) never triggers the rescan."""
    t = ParquetMergeTarget(str(tmp_path / "mmi_src"))
    view = _mm_view(tmp_path, "mmi_view")
    _merge_state(t, spark, [(1, "a", 1), (2, "a", 5), (3, "a", 9)], wm=0)
    view.fold(spark, t)

    reads = []
    real_read = ParquetMergeTarget.read

    def counting_read(self, spark_, version=None):
        if self is t:
            reads.append(version)
        return real_read(self, spark_, version=version)

    ParquetMergeTarget.read = counting_read
    try:
        # id2: 5 → 6, interior on both ends; plus a fresh insert
        _merge_state(t, spark, [(1, "a", 1), (2, "a", 6), (3, "a", 9), (4, "a", 2)], wm=1)
        reads.clear()  # the merge itself reads its own target; count the FOLD
        view.fold(spark, t)
        assert reads == [], f"interior update must not rescan: {reads}"
        # id3: 9 → 4 retracts the stored max → exactly one PINNED read
        _merge_state(t, spark, [(1, "a", 1), (2, "a", 6), (3, "a", 4), (4, "a", 2)], wm=2)
        reads.clear()
        view.fold(spark, t)
        assert reads == [t.current_version()], reads
    finally:
        ParquetMergeTarget.read = real_read
    assert _mm_view_dict(view, spark) == _mm_recompute(spark, t, t.current_version())


def test_minmax_catch_up_seeds_and_resumes(spark, tmp_path):
    """Snapshot seeding covers the extrema too, and CDC folds resume."""
    t = ParquetMergeTarget(str(tmp_path / "mms_src"))
    view = _mm_view(tmp_path, "mms_view")
    upd = spark.createDataFrame(MM_STATES[0], ["id", "grp", "qty"])
    t.merge_with(spark, upd, lambda _t, u: u, watermark=0)  # no changelog
    view.catch_up(spark, t)
    assert _mm_view_dict(view, spark) == _mm_recompute(spark, t, t.current_version())
    for i, rows in enumerate(MM_STATES[1:], start=1):
        _merge_state(t, spark, rows, wm=i)
        view.catch_up(spark, t)
        assert _mm_view_dict(view, spark) == _mm_recompute(spark, t, t.current_version()), i


def test_coalesced_fold_equals_sequential(spark, tmp_path):
    """fold(coalesce_versions=True) over a multi-version backlog must land
    on exactly the per-version fold's state — counts/sums are linear."""
    t = ParquetMergeTarget(str(tmp_path / "co_src"))
    for i, rows in enumerate(STATES):
        _merge_state(t, spark, rows, wm=i)
    seq = ChangelogAggregateView(
        str(tmp_path / "co_seq"), group_keys=("grp",), sum_cols=("qty",)
    )
    seq.fold(spark, t)
    co = ChangelogAggregateView(
        str(tmp_path / "co_one"), group_keys=("grp",), sum_cols=("qty",)
    )
    co.fold(spark, t, coalesce_versions=True)
    assert co.folded_version() == t.current_version()
    assert co.target.current_version() == 1, "ONE commit for the whole range"
    assert _view_dict(co, spark) == _view_dict(seq, spark)
    # a later per-version fold resumes normally after the coalesced one
    _merge_state(t, spark, [(9, "z", 9)], wm=len(STATES))
    co.fold(spark, t)
    assert _view_dict(co, spark) == _recompute(spark, t, t.current_version())


def test_coalesced_fold_minmax_with_intra_range_churn(spark, tmp_path):
    """Coalesced extremum fold: a value inserted AND retracted inside the
    range, plus retraction of the stored extremum — both must land on the
    recompute (the conservative risk test may rescan, never miss)."""
    t = ParquetMergeTarget(str(tmp_path / "comm_src"))
    view = _mm_view(tmp_path, "comm_view")
    _merge_state(t, spark, [(1, "a", 5), (2, "a", 8)], wm=0)
    view.fold(spark, t)
    # range: v2 inserts a transient min 1 (id 3) and a lasting 6; v3
    # deletes the transient 1 AND the stored min 5 (id 1)
    _merge_state(t, spark, [(1, "a", 5), (2, "a", 8), (3, "a", 1), (4, "a", 6)], wm=1)
    _merge_state(t, spark, [(2, "a", 8), (4, "a", 6)], wm=2)
    view.fold(spark, t, coalesce_versions=True)
    assert view.folded_version() == t.current_version()
    assert _mm_view_dict(view, spark) == _mm_recompute(spark, t, t.current_version())


def test_coalesced_fold_minmax_from_empty_state(spark, tmp_path):
    """Coalescing a range that CREATES a group and retracts some of its
    values (no stored state yet — e.g. a brand-new follower catching up
    in one commit) must not keep retracted values as extrema."""
    t = ParquetMergeTarget(str(tmp_path / "coe_src"))
    view = _mm_view(tmp_path, "coe_view")
    # v1 inserts an inflated max 99 (id 3); v2 updates it down to 2
    _merge_state(t, spark, [(1, "a", 5), (2, "a", 8), (3, "a", 99)], wm=0)
    _merge_state(t, spark, [(1, "a", 5), (2, "a", 8), (3, "a", 2)], wm=1)
    view.fold(spark, t, coalesce_versions=True)
    assert view.target.current_version() == 1, "one commit"
    assert _mm_view_dict(view, spark) == _mm_recompute(spark, t, t.current_version())


def test_minmax_rederived_null_extremum_is_honored(spark, tmp_path):
    """A re-derived extremum can legitimately be NULL (the group's
    surviving rows are all null): the override must key on the re-derive
    FLAG, not value-coalesce — else the retracted value survives as a
    stale min/max (round-7 review live repro)."""
    t = ParquetMergeTarget(str(tmp_path / "nullext_src"))
    view = _mm_view(tmp_path, "nullext_view")

    def merge_typed(rows, wm):  # all-null batches defeat schema inference
        upd = spark.createDataFrame(rows, "id long, grp string, qty long")
        t.merge_with(spark, upd, lambda _t, u: u, watermark=wm, changelog_keys=("id",))

    merge_typed([(1, "a", None), (2, "a", 5)], wm=0)
    view.fold(spark, t)
    assert _mm_view_dict(view, spark) == _mm_recompute(spark, t, t.current_version())
    # delete the only non-null row: the retraction hits the stored
    # extremum, the rescan yields NULL over the surviving null-only row
    merge_typed([(1, "a", None)], wm=1)
    view.fold(spark, t)
    got = _mm_view_dict(view, spark)
    assert got == _mm_recompute(spark, t, t.current_version())
    assert got["a"] == (1, None, None, None), got


def test_fold_upgrades_pre_counter_state_tables(spark, tmp_path):
    """A state table persisted BEFORE the non-null counters existed
    (no __nn_* columns) must keep folding: missing counters backfill with
    __n (the old scheme's every-row-non-null assumption), so legacy
    groups read unchanged and only post-upgrade retractions can map them
    to NULL."""
    from blockchain_etl_spark.operators.cdc_view import _nn

    t = ParquetMergeTarget(str(tmp_path / "legacy_src"))
    view = ChangelogAggregateView(
        str(tmp_path / "legacy_view"), group_keys=("grp",), sum_cols=("qty",)
    )
    _merge_state(t, spark, STATES[0], wm=0)
    view.fold(spark, t)
    # simulate the pre-upgrade layout: strip the counter column in place
    legacy = view.target.read(spark).drop(_nn("qty"))
    view.target.merge_with(spark, legacy, lambda _t, u: u)
    _merge_state(t, spark, STATES[1], wm=1)
    view.fold(spark, t)  # must not die in unionByName
    assert _view_dict(view, spark) == _recompute(spark, t, t.current_version())
    # min/max views upgrade through the same backfill
    mm = _mm_view(tmp_path, "legacy_mm")
    _merge_state(t, spark, STATES[2], wm=2)
    mm.catch_up(spark, t)
    legacy_mm = mm.target.read(spark).drop(_nn("qty"))
    mm.target.merge_with(spark, legacy_mm, lambda _t, u: u)
    _merge_state(t, spark, STATES[3], wm=3)
    mm.fold(spark, t)
    assert _mm_view_dict(mm, spark) == _mm_recompute(spark, t, t.current_version())


def test_coalesced_fold_retraction_against_null_stored_extremum(spark, tmp_path):
    """Stored extremum NULL (all-null group), then a coalesced range that
    inserts AND retracts a non-null value: the risk comparison against
    NULL never trips, so the any-non-null-retraction arm must force the
    re-derive — else the retracted value folds in as the new extremum."""
    t = ParquetMergeTarget(str(tmp_path / "nullrisk_src"))
    view = _mm_view(tmp_path, "nullrisk_view")

    def merge_typed(rows, wm):
        upd = spark.createDataFrame(rows, "id long, grp string, qty long")
        t.merge_with(spark, upd, lambda _t, u: u, watermark=wm, changelog_keys=("id",))

    merge_typed([(1, "a", None)], wm=0)  # stored min/max NULL
    view.fold(spark, t)
    merge_typed([(1, "a", None), (2, "a", 7)], wm=1)  # in-range insert 7
    merge_typed([(1, "a", None)], wm=2)  # ...retracted in the same range
    view.fold(spark, t, coalesce_versions=True)
    got = _mm_view_dict(view, spark)
    assert got == _mm_recompute(spark, t, t.current_version())
    assert got["a"] == (1, None, None, None), got
