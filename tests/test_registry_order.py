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
    monkeypatch.setattr(registry, "_driver_verified", lambda: fake_verified)
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
