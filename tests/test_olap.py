"""OLAP-plan unit tests beyond the oracle sweep: semantics that only show
up on data shapes the synthetic tables don't contain."""

from __future__ import annotations

from pyspark.sql import Row

from blockchain_etl_spark.plans.olap import _EVENT_TYPES, pivot_event_counts


def test_pivot_total_counts_unlisted_event_types(spark):
    """n_total must be COUNT(*) — a 6th event type outside the pivot list
    still counts toward the total (the oracle's COUNT(*)), it never
    silently vanishes."""
    rows = [Row(user_id=1, event_type=t) for t in _EVENT_TYPES]
    rows += [Row(user_id=1, event_type="refund")]  # not in the pivot list
    rows += [Row(user_id=2, event_type="click"), Row(user_id=2, event_type="refund")]
    df = spark.createDataFrame(rows)
    got = {r.user_id: r.asDict() for r in pivot_event_counts(df).collect()}
    assert got[1]["n_total"] == len(_EVENT_TYPES) + 1
    assert sum(got[1][f"n_{t}"] for t in _EVENT_TYPES) == len(_EVENT_TYPES)
    assert got[2]["n_total"] == 2
    assert got[2]["n_click"] == 1
    assert sum(got[2][f"n_{t}"] for t in _EVENT_TYPES) == 1


def test_approx_stats_native_error_bounds(spark):
    """The engine-native sketch twin's estimates must sit within tight
    bounds of the exact answers (rsd 2% HLL++ -> allow 5%; t-digest
    accuracy 1e4 -> 1% rank error). Pytest-only: native estimates are
    engine-specific, so this twin is unregistered by design."""
    from blockchain_etl_spark.plans.olap import events_approx_stats_native

    sf = "/root/testdata/sf0.001"
    got = {r.event_type: r for r in events_approx_stats_native(spark, sf).collect()}

    from blockchain_etl_spark.sources.testdata import load_table
    import pyspark.sql.functions as F

    events = load_table(spark, sf, "events")
    exact = {
        r.event_type: r
        for r in events.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("users"), F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert set(got) == set(exact)
    for et, e in exact.items():
        g = got[et]
        assert abs(g.approx_users - e.users) <= max(2, 0.05 * e.users), et
        # the GK sketch guarantees RANK error <= n/accuracy, not value
        # error: assert the fraction of values at or below each estimate
        # is within 1% (plus small-group slack) of the target quantile
        for approx_q, p in zip((g.q50, g.q90, g.q99), (0.5, 0.9, 0.99)):
            frac = (
                events.filter(
                    (F.col("event_type") == et) & (F.col("value") <= approx_q)
                ).count()
                / e.n
            )
            assert abs(frac - p) <= 0.01 + 2.0 / e.n, (et, p, frac)


def test_distinct_sketch_native_error_bound(spark):
    """Union-merged daily DataSketches HLL partials (the pytest-only
    native twin) must land within 5% of the exact whole-range distinct
    count (lgK=14 standard error ~0.8%)."""
    import pyspark.sql.functions as F
    from blockchain_etl_spark.plans.olap import events_distinct_sketch_native
    from blockchain_etl_spark.sources.testdata import load_table

    sf = "/root/testdata/sf0.001"
    got = {
        r.event_type: r.approx_total_users
        for r in events_distinct_sketch_native(spark, sf).collect()
    }
    exact = {
        r.event_type: r.u
        for r in load_table(spark, sf, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("u"))
        .collect()
    }
    assert set(got) == set(exact)
    for et, u in exact.items():
        assert abs(got[et] - u) <= max(2, 0.05 * u), (et, got[et], u)


def test_distinct_rollup_exact_anchors_sketch(spark):
    """The oracle-anchored exact rollup and the native sketch twin must
    agree on shape (same event types, same n_days) and the sketch's
    estimate must land within the HLL lgK=14 bound of the exact count."""
    from blockchain_etl_spark.plans.olap import events_distinct_sketch_native
    from blockchain_etl_spark.plans.registry import get_queries

    sf = "/root/testdata/sf0.001"
    qs = get_queries()
    sketch = {r.event_type: r for r in events_distinct_sketch_native(spark, sf).collect()}
    exact = {r.event_type: r for r in qs["events_distinct_rollup_exact"](spark, sf).collect()}
    assert set(sketch) == set(exact)
    for et in exact:
        assert sketch[et].n_days == exact[et].n_days, et
        u = exact[et].exact_total_users
        assert abs(sketch[et].approx_total_users - u) <= max(2, 0.05 * u), et


def test_portable_approx_stats_bounds(spark):
    """The REGISTERED events_approx_stats (portable HLL + fixed-point
    histogram quantiles): distinct estimate within the m=256 band (15%
    loose) of exact, and each qXX is a discrete percentile — the fraction
    of values at or below it must be >= p and within bin resolution."""
    import pyspark.sql.functions as F
    from blockchain_etl_spark.plans.registry import get_queries
    from blockchain_etl_spark.sources.testdata import load_table

    sf = "/root/testdata/sf0.001"
    got = {r.event_type: r for r in get_queries()["events_approx_stats"](spark, sf).collect()}
    events = load_table(spark, sf, "events")
    exact = {
        r.event_type: r
        for r in events.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("users"), F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert set(got) == set(exact)
    for et, e in exact.items():
        g = got[et]
        assert g.n_events == e.n
        assert abs(g.approx_users - e.users) <= max(2, 0.15 * e.users), (et, g, e)
        for approx_q, p in zip((g.q50, g.q90, g.q99), (0.5, 0.9, 0.99)):
            at_or_below = events.filter(
                (F.col("event_type") == et) & (F.col("value") <= approx_q)
            ).count()
            strictly_below = events.filter(
                (F.col("event_type") == et) & (F.col("value") < approx_q - 0.005)
            ).count()
            # discrete percentile: crossing point brackets ceil(p*n)
            assert at_or_below >= p * e.n, (et, p, approx_q)
            assert strictly_below < -(-p * e.n // 1), (et, p, approx_q)


def test_portable_weekly_sketch_rollup_tracks_exact(spark):
    """The REGISTERED events_distinct_sketch_rollup (weekly grain from
    daily portable-HLL partials) must match exact weekly distinct counts
    within the m=256 band and agree on the (week, n_days) structure."""
    import pyspark.sql.functions as F
    from blockchain_etl_spark.plans.registry import get_queries
    from blockchain_etl_spark.sources.testdata import load_table

    sf = "/root/testdata/sf0.001"
    got = {
        (r.event_type, r.week): r
        for r in get_queries()["events_distinct_sketch_rollup"](spark, sf).collect()
    }
    events = load_table(spark, sf, "events").withColumn(
        "day", F.date_trunc("day", F.col("ts"))
    )
    exact = {
        (r.event_type, r.week): r
        for r in events.withColumn("week", F.date_trunc("week", F.col("day")))
        .groupBy("event_type", "week")
        .agg(
            F.countDistinct("day").alias("n_days"),
            F.countDistinct("user_id").alias("users"),
        )
        .collect()
    }
    assert set(got) == set(exact)
    for k, e in exact.items():
        g = got[k]
        assert g.n_days == e.n_days, k
        assert abs(g.est_users - e.users) <= max(2, 0.15 * e.users), (k, g, e)


def test_cms_estimate_is_a_guaranteed_overestimate(spark):
    """Count-min property: est_n >= exact_n for every reported key, and
    the heaviest user's estimate is exact when its cells are collision-free
    enough (sanity: at least one reported row should be exact)."""
    from blockchain_etl_spark.plans.registry import get_queries
    from tests.conftest import SF_DIR

    rows = get_queries()["events_user_cms_topk"](spark, SF_DIR).collect()
    assert rows
    assert all(r.est_n >= r.exact_n for r in rows)


def test_portable_hll_tracks_exact_counts(spark):
    """events_hll_portable_rollup: the hash-matched estimate must stay
    within the ~1.04/sqrt(256) = 6.5% HLL band (kept loose at 15%) of the
    exact distinct rollup, and agree on grouping/day structure."""
    from blockchain_etl_spark.plans.registry import get_queries

    qs = get_queries()
    sf = "/root/testdata/sf0.001"
    est = {r.event_type: r for r in qs["events_hll_portable_rollup"](spark, sf).collect()}
    exact = {
        r.event_type: r for r in qs["events_distinct_rollup_exact"](spark, sf).collect()
    }
    assert set(est) == set(exact)
    for t, r in est.items():
        e = exact[t]
        assert r.n_days == e.n_days, (t, r, e)
        err = abs(r.est_users - e.exact_total_users) / e.exact_total_users
        assert err <= 0.15, (t, r.est_users, e.exact_total_users)


def test_triangle_count_known_topology(spark):
    """One forced triangle (each edge co-ordered twice) plus a 4-spoke
    star (wedges but no closures): census must report exactly 1 triangle,
    and the star hub's wedges count toward gcc's denominator."""
    import blockchain_etl_spark.plans.olap as olap_mod
    from blockchain_etl_spark.plans.olap import part_triangle_count

    rows = []
    oid = 0
    # triangle 1-2-3: each pair appears in two orders
    for pair in [(1, 2), (2, 3), (1, 3)] * 2:
        oid += 1
        rows += [(oid, pair[0]), (oid, pair[1])]
    # star: hub 10 with spokes 11..14, each edge co-ordered twice
    for spoke in (11, 12, 13, 14):
        for _ in range(2):
            oid += 1
            rows += [(oid, 10), (oid, spoke)]
    li = spark.createDataFrame(rows, ["l_orderkey", "l_partkey"])
    orig = olap_mod.load_table
    try:
        olap_mod.load_table = lambda spark, sf_dir, name: li
        got = part_triangle_count(spark, "ignored").collect()[0]
    finally:
        olap_mod.load_table = orig
    assert got.n_nodes == 8 and got.n_edges == 7
    assert got.n_triangles == 1
    # wedges: triangle nodes contribute 3 * C(2,2)... deg(1)=deg(2)=deg(3)=2
    # -> 1 wedge each; hub deg 4 -> 6; spokes deg 1 -> 0. Total 9.
    assert got.n_wedges == 9
    assert got.gcc_ppm == (3 * 1 * 1_000_000) // 9


def test_hll_overlap_accuracy_controlled(spark):
    """Controlled overlap: users 1..1000 do type 'a', 501..1500 do 'b' —
    exact overlap 500, union 1500. Inclusion-exclusion over m=256
    registers has ~sqrt(2)*1.04/16 ≈ 9% union-scale std error; bound the
    estimates loosely but meaningfully."""
    import blockchain_etl_spark.plans.olap as olap_mod
    from blockchain_etl_spark.plans.olap import events_hll_overlap

    rows = [("a", u) for u in range(1, 1001)] + [
        ("b", u) for u in range(501, 1501)
    ]
    ev = spark.createDataFrame(rows, ["event_type", "user_id"])
    orig = olap_mod.load_table
    try:
        olap_mod.load_table = lambda spark, sf_dir, name: ev
        got = events_hll_overlap(spark, "ignored").collect()[0]
    finally:
        olap_mod.load_table = orig
    assert got.type_a == "a" and got.type_b == "b"
    # raw LogLog at m=256 (no HLL++ bias correction) runs ~±20% on a
    # single deterministic md5 draw (this draw: a=1138, b=1065, u=1242 —
    # verified against a pure-Python evaluation of the spec)
    assert abs(got.est_a - 1000) <= 200 and abs(got.est_b - 1000) <= 200
    assert abs(got.est_union - 1500) <= 300
    # STRUCTURAL guarantee, variance-free: union registers dominate each
    # part's registers, so the union estimate can never fall below either
    # part's — a broken pair-union join would break this immediately
    assert got.est_union >= max(got.est_a, got.est_b)
    # inclusion-exclusion stacks all three errors: overlap is bounded at
    # union scale x3 sigma, not overlap scale
    assert abs(got.est_overlap - 500) <= 525
    assert 0 <= got.jaccard_ppm <= 1_000_000


def test_price_trend_recovers_known_slope(spark):
    """A perfect synthetic line y = 5x + 100 over x = 0..999 must come
    back as slope_ppm ~ 5e6 (the den//1e6 pre-divide costs <= 1e6/den
    relative error — here den = 8.33e10, so ~15 ppm) and the exact
    integer mean; a second brand with slope -3 pins the sign path."""
    import blockchain_etl_spark.plans.olap as olap_mod
    from blockchain_etl_spark.plans.olap import part_price_trend
    import datetime as dt

    base = dt.date(1992, 1, 1)
    rows = []
    for x in range(1000):
        d = base + dt.timedelta(days=x)
        rows.append((1, d, float(5 * x + 100)))
        rows.append((2, d, float(-3 * x + 5000)))
    li = spark.createDataFrame(rows, ["l_partkey", "l_shipdate", "l_extendedprice"])
    pt = spark.createDataFrame([(1, "UP"), (2, "DOWN")], ["p_partkey", "p_brand"])
    tables = {"lineitem": li, "part": pt}
    orig = olap_mod.load_table
    try:
        olap_mod.load_table = lambda spark, sf_dir, name: tables[name]
        got = {r.p_brand: r for r in part_price_trend(spark, "ignored").collect()}
    finally:
        olap_mod.load_table = orig
    assert got["UP"].n_rows == 1000
    assert abs(got["UP"].slope_ppm - 5_000_000) <= 100
    assert got["UP"].avg_dollars == (5 * sum(range(1000)) + 100 * 1000) // 1000
    assert abs(got["DOWN"].slope_ppm + 3_000_000) <= 100


def test_kcore_peel_known_cascade(spark):
    """4-clique + 2-edge path at k=2: the path's ends peel in round 1,
    which isolates the middle node so it peels in round 2 — a real
    cascade — and the clique is the stable 2-core. Census by hand:
    (7,8) -> (5,6) -> (4,6) -> stable."""
    import blockchain_etl_spark.plans.olap as olap_mod
    from blockchain_etl_spark.plans.olap import part_kcore_census

    clique = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)]
    path = [(10, 11), (11, 12)]
    rows = []
    for oid, (a, b) in enumerate(clique + path, start=1):
        rows += [(oid, a), (oid, b)]
    li = spark.createDataFrame(rows, ["l_orderkey", "l_partkey"])
    orig_load, orig_k = olap_mod.load_table, olap_mod._KCORE_K
    try:
        olap_mod.load_table = lambda spark, sf_dir, name: li
        olap_mod._KCORE_K = 2
        got = {
            r.round: (r.n_nodes, r.n_edges)
            for r in part_kcore_census(spark, "ignored").collect()
        }
    finally:
        olap_mod.load_table, olap_mod._KCORE_K = orig_load, orig_k
    assert got[0] == (7, 8)
    assert got[1] == (5, 6)  # path ends gone, middle survives on stale degree
    assert got[2] == (4, 6)  # cascade: isolated middle peels
    for r in (3, 4, 5, 6):
        assert got[r] == (4, 6)  # the 2-core is stable
