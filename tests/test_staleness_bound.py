"""Driver re-verification staleness bound, asserted against the LIVE
registry — before it degrades, not after (round-10 verdict item #3).

The driver fully verifies _WINDOW queries per round; the rotation
(plans/registry.py::order_names) gives never-verified queries the window
prefix CAPPED at window//2 and fills every remaining slot with greens in
staleness order. A registration is a ONE-TIME event: the n_new head
queries verify in their first round and join the green pool, so the
worst-case gap for a green query is the smallest k whose schedule
covers every pre-existing green: round r serves a head of
min(remaining_new, window//2) never-verified queries plus
(window - head) greens stalest-first — new queries consume HEAD slots,
never the greens' rotation budget (the earlier closed form counted
them on both sides and over-flagged small registrations). With
n_new = 0 this reduces to the saturated ceil(G/window).
Two assertions:

- SATURATION BOUND (hard): with the live registry's actual new-query
  count, the bound must stay <= 4 (saturated: ceil(197/50) == 4; a
  transient small registration keeps k == 4 because the stalest-first
  rotation makes the slot budget cumulative). A large registration
  burst still shrinks enough green slots per round to push k past 4 —
  the test fails at exactly the moment the risk appears, forcing
  registry consolidation (retire redundant gate variants) or a
  documented acceptance here.

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
    # smallest k such that rounds 1..k verify every CURRENT green: each
    # round's head serves min(remaining_new, window//2) never-verified
    # queries (they join the green pool AFTER their round, so they
    # don't compete for the pre-existing greens' slots — the previous
    # closed form double-counted them and over-flagged a 3-query
    # registration as gap 5 when the schedule covers all greens in 4);
    # the rest of the window rotates pre-existing greens stalest-first.
    new_left, covered, bound = len(new), 0, 0
    while covered < len(greens):
        bound += 1
        head = min(new_left, window // 2)
        new_left -= head
        covered += window - head
    assert bound <= 4, (
        f"staleness bound degraded: {len(greens)} greens, {len(new)} "
        f"unverified -> worst gap {bound} rounds (> 4). Retire "
        "redundant gate variants or document a new acceptance in "
        "tests/test_staleness_bound.py and COVERAGE.md."
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
