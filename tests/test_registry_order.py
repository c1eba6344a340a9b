"""Registry iteration-order gate: never-driver-verified queries sort
first — CAPPED at half the driver's window so previously-green queries
always keep re-verification slots — with a deterministic per-round
rotation inside each group."""


def test_unverified_queries_sort_first_up_to_the_cap():
    from blockchain_etl_spark.plans import registry

    names = list(registry.get_queries())
    verified = registry._driver_verified()
    unverified = [n for n in names if n not in verified]
    cap = registry._WINDOW // 2
    head = min(len(unverified), cap)
    assert names[:head] == unverified[:head], (
        "never-driver-verified queries must occupy the window prefix"
    )


def test_priority_group_never_fills_the_whole_window(monkeypatch):
    """Even when MORE new queries land at once than the window holds, the
    second half of the window must still draw from the uniform rotation
    (which includes every verified name) — the r05 failure mode where a
    big unverified group starves greens of re-verification."""
    from blockchain_etl_spark.plans import registry

    registry._load_all()
    all_names = sorted(registry.QUERIES)
    # pretend 60 queries have ever been verified: ~80 are "new" — more
    # than the whole window, the exact starvation scenario
    fake_verified = set(all_names[:60])
    monkeypatch.setattr(
        registry, "_last_verified", lambda: {n: 1 for n in fake_verified}
    )
    names = registry._ordered_names()
    cap = registry._WINDOW // 2
    window = names[: registry._WINDOW]
    assert all(n not in fake_verified for n in window[:cap])
    # the rotation half must contain at least one verified name — greens
    # are guaranteed window slots no matter how large the new group is
    assert any(n in fake_verified for n in window[cap:]), window[cap:]


def test_order_is_deterministic_within_round():
    from blockchain_etl_spark.plans import registry

    assert registry._ordered_names() == registry._ordered_names()


def test_verified_set_only_counts_full_hash_matches():
    """rows-only driver entries (hash_match=None) never count as verified."""
    import glob
    import json
    import os

    from blockchain_etl_spark.plans import registry

    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    verified = registry._driver_verified()
    for p in glob.glob(os.path.join(repo_root, "CORRECTNESS_r*.json")):
        with open(p) as f:
            rows = json.load(f)
        for name, row in rows.items():
            if row.get("hash_match") is not True:
                continue
            assert name in verified


def test_green_queries_fill_window_slots_left_by_a_small_head(monkeypatch):
    """When fewer than window/2 queries are new, greens take EVERY
    remaining window slot in staleness order — the head never reserves
    empty space."""
    from blockchain_etl_spark.plans import registry

    registry._load_all()
    all_names = sorted(registry.QUERIES)
    last = {n: 1 for n in all_names[5:]}  # 5 brand-new queries
    names = registry.order_names(all_names, last, rnd=3, window=50)
    assert len(names[:50]) == 50
    assert sum(1 for n in names[:50] if n not in last) == 5


def test_staleness_round_robin_bounds_the_reverification_gap():
    """Simulated rounds: the driver verifies the window prefix each round
    and every query passes. No green query may go more than
    ceil(G / (window - head)) rounds without re-verification — the bound
    the staleness-desc ordering guarantees."""
    import math

    from blockchain_etl_spark.plans import registry

    n, window = 200, 50
    names = [f"q{i:03d}" for i in range(n)]
    last = {}  # round 1 starts with everything never-verified
    max_gap = 0
    for rnd in range(1, 31):
        order = registry.order_names(names, last, rnd, window=window)
        for name in order[:window]:
            last[name] = rnd  # driver verifies the prefix; all pass
        if len(last) == n:  # warm-up over: everyone verified at least once
            max_gap = max(max_gap, *(rnd - last[q] for q in names))
    assert len(last) == n, "every query must get verified during warm-up"
    # greens hold at least window/2 guaranteed slots → gap ≤ ceil(G/25)=8;
    # once no new queries remain the round-robin gets the full window and
    # tightens toward ceil(200/50)=4
    assert max_gap <= math.ceil(n / (window - window // 2)), max_gap


def test_failing_green_reenters_the_window_every_round():
    """A green query that starts failing (no fresh hash_match row) keeps
    rising in staleness and stays inside the verification window."""
    from blockchain_etl_spark.plans import registry

    n, window = 200, 50
    names = [f"q{i:03d}" for i in range(n)]
    last = {q: 1 for q in names}
    bad = "q123"
    in_window = 0
    for rnd in range(2, 12):
        order = registry.order_names(names, last, rnd, window=window)
        for name in order[:window]:
            if name != bad:  # the broken query never re-verifies
                last[name] = rnd
        if bad in order[:window]:
            in_window += 1
    assert in_window >= 8, "a failing green must keep re-entering the window"


def test_staleness_report_covers_every_query():
    from blockchain_etl_spark.plans import registry

    rep = registry.staleness_report()
    assert set(rep) == set(registry.QUERIES)
    assert all(isinstance(v, int) and v >= 0 for v in rep.values())
