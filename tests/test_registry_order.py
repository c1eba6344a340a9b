"""Registry iteration-order gate: never-driver-verified queries must sort
before verified ones (so every query earns a driver CORRECTNESS row within
one round of being added), with a deterministic per-round rotation inside
each group."""


def test_unverified_queries_sort_first():
    from blockchain_etl_spark.plans import registry

    names = list(registry.get_queries())
    verified = registry._driver_verified()
    unverified = [n for n in names if n not in verified]
    assert names[: len(unverified)] == unverified, (
        "never-driver-verified queries must occupy the window prefix"
    )


def test_order_is_deterministic_within_round():
    from blockchain_etl_spark.plans import registry

    assert registry._ordered_names() == registry._ordered_names()


def test_verified_set_only_counts_full_hash_matches():
    """rows-only sketch entries (hash_match=None) never count as verified,
    so sketches re-enter the window every round for a fresh rows-only check."""
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
    assert "events_distinct_sketch_rollup" not in verified
