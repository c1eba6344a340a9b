"""Driver re-verification staleness bound, asserted against the LIVE
registry — before it degrades, not after (round-10 verdict item #3).

The driver fully verifies _WINDOW queries per round; the rotation
(plans/registry.py::order_names) gives never-verified queries the window
prefix CAPPED at window//2 and fills every remaining slot with greens in
staleness order. A registration is a ONE-TIME event: the n_new head
queries verify in their first round and join the green pool, so the
worst-case gap for a green query is the smallest k with one
head-reduced round followed by full-window rounds covering every query:

    (window - min(n_new, window//2)) + (k-1)*window >= G + n_new

i.e. k = 1 + ceil(max(0, G + n_new - window + min(n_new, window//2))
/ window). With n_new = 0 this reduces to the saturated ceil(G/window).
Two assertions:

- SATURATION BOUND (hard): with the live registry's actual new-query
  count, the bound must stay <= 4 (saturated: ceil(197/50) == 4; a
  transient 2-query registration keeps k == 4 because the stalest-first
  rotation makes the slot budget cumulative). A large registration
  burst still shrinks round-1 slots enough to push k past 4 — the test
  fails at exactly the moment the risk appears, forcing registry
  consolidation (retire redundant gate variants) or a documented
  acceptance here.

- DOCUMENTED WORST CASE: the adversarial bound with a full window//2 head
  of new queries is ceil(G / (window - window//2)) = 8 rounds today.
  That is ACCEPTED explicitly (COVERAGE.md "Verification staleness"):
  it is reachable only by registering >= 25 brand-new queries in one
  round, which the hard assertion above already rejects. The acceptance
  is encoded as a ceiling so silent registry growth cannot widen it.
"""

import math

from blockchain_etl_spark.plans import registry
from blockchain_etl_spark.plans.registry import QUERIES


def _load_all_query_modules():
    import blockchain_etl_spark.plans  # noqa: F401  (registers everything)
    from blockchain_etl_spark.plans.registry import get_queries

    get_queries()


def test_live_staleness_bound_is_at_most_4():
    _load_all_query_modules()
    last = registry._last_verified()
    names = list(QUERIES)
    greens = [n for n in names if n in last]
    new = [n for n in names if n not in last]
    window = registry._WINDOW
    slots_r1 = window - min(len(new), window // 2)
    total = len(greens) + len(new)
    # smallest k with slots_r1 + (k-1)*window >= total (new queries are
    # verified in round 1 and become greens; every later round rotates a
    # full window of greens stalest-first, so slot budget accumulates)
    bound = (
        1 + math.ceil(max(0, total - slots_r1) / window) if greens else 0
    )
    assert bound <= 4, (
        f"staleness bound degraded: {len(greens)} greens, {len(new)} "
        f"unverified, {slots_r1} round-1 green slots -> worst gap "
        f"{bound} rounds (> 4). Retire redundant gate variants or "
        "document a new acceptance in tests/test_staleness_bound.py "
        "and COVERAGE.md."
    )


def test_documented_worst_case_ceiling():
    _load_all_query_modules()
    last = registry._last_verified()
    greens = [n for n in QUERIES if n in last]
    window = registry._WINDOW
    worst = math.ceil(len(greens) / (window - window // 2))
    # explicit acceptance: today 8; a registry grown past 200 greens
    # would widen it and must be re-adjudicated
    assert worst <= 8, (
        f"adversarial staleness bound widened to {worst} rounds "
        "(accepted ceiling: 8) — the green registry grew; consolidate "
        "or re-document the acceptance"
    )
