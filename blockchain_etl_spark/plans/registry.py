"""Query registry: the single source of truth for the engine's query surface.

Every operator from SURVEY.md §2 (and every training-data op) is registered
here once, with:

- a PySpark builder ``fn(spark, sf_dir) -> DataFrame`` (the implementation),
- an optional ANSI-SQL oracle string DuckDB can run on the same parquet
  views (the correctness contract; column names MUST match the Spark result),
- the SURVEY §2 operator ids it covers (for the judge's parity check).

``__spark_entry__.py`` and ``tests/test_oracle.py`` both consume this
registry, so the driver's correctness gate and local pytest exercise the
exact same plans.

Determinism rules used throughout the registered queries (so the driver's
order-insensitive value-hash matches):

1. DOUBLE aggregation order differs between Spark (parallel partial aggs)
   and DuckDB; every SUM/AVG over a double column goes through an exact
   DECIMAL accumulator and is cast back to DOUBLE at the end —
   ``CAST(SUM(CAST(x AS DECIMAL(25,6))) AS DOUBLE)`` — identical on both
   engines regardless of addition order.
2. Every top-k / limit query carries a total tie-break key (unique id) so
   the selected row set is unique.
3. Aggregate/computed columns are aliased identically on both sides.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass
class Query:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    sql: str | None  # DuckDB oracle; None → driver does rows-only check
    survey_ops: tuple[str, ...] = ()  # SURVEY.md §2 ids, e.g. ("A6", "P7")
    doc: str = ""


QUERIES: dict[str, Query] = {}


def register(
    name: str,
    sql: str | None,
    survey_ops: tuple[str, ...] = (),
    doc: str = "",
) -> Callable[[Callable[[SparkSession, str], DataFrame]], Callable[[SparkSession, str], DataFrame]]:
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = Query(name=name, fn=fn, sql=sql, survey_ops=survey_ops, doc=doc or (fn.__doc__ or ""))
        return fn

    return deco


# Iteration-order policy (disclosed to the harness owner via this docstring
# and README.md "Correctness gate" section):
#
# The external driver verifies a prefix-sized sample of queries() per round
# while local pytest (tests/test_oracle.py) checks ALL registered queries
# every run. The ordering is a HYBRID of coverage-first and staleness-fair
# rotation:
#
# 1. Queries with NO fully-verified driver row yet (no CORRECTNESS_r*.json
#    entry with hash_match=true — i.e. brand-new queries) sort FIRST,
#    CAPPED at half the driver's window: every query earns driver evidence
#    within a round or two of being added, while previously-green queries
#    keep guaranteed re-verification slots even when many new queries land
#    at once.
# 2. The remaining window slots go to previously-green queries in
#    STALENESS order — rounds since their last hash-verified driver row,
#    most stale first (ties broken by the per-round md5 rotation hash).
#    This is a round-robin over the green set: with G greens and S ≥
#    window/2 guaranteed slots per round, no green query goes more than
#    ceil(G / S) rounds without re-verification
#    (tests/test_registry_order.py asserts the bound under simulated
#    rounds). A query that FAILS re-verification gets no fresh
#    hash_match=true row, so its staleness keeps growing and it re-enters
#    the window every round until fixed.
# 3. Everything past the window sorts by the rotation hash
#    md5(f"{round}:{name}") where `round` is inferred from the number of
#    CORRECTNESS_r*.json artifacts already written.
#
# Same round → same order (deterministic); the status input is the driver's
# own past artifacts, never a locally-editable allowlist.


def _round_index() -> int:
    """Rounds completed so far, inferred from driver artifacts in the repo root."""
    import glob
    import os

    repo_root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    return len(glob.glob(os.path.join(repo_root, "CORRECTNESS_r*.json")))


def _last_verified() -> dict[str, int]:
    """name → LATEST round with a full hash-verified driver row (the
    staleness clock for the rotation and the COVERAGE.md telemetry)."""
    import glob
    import json
    import os
    import re

    repo_root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    last: dict[str, int] = {}
    for p in glob.glob(os.path.join(repo_root, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", p)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            with open(p) as f:
                rows = json.load(f)
        except (OSError, ValueError):
            continue
        for name, row in rows.items():
            if isinstance(row, dict) and row.get("hash_match") is True:
                last[name] = max(last.get(name, 0), rnd)
    return last


def _driver_verified() -> set[str]:
    """Names with a full hash-verified driver row in ANY past round."""
    return set(_last_verified())


# The driver verifies a ~50-query window (an EXTERNAL harness setting this
# constant mirrors — if the driver's window ever shrinks, shrink this with
# it, or the never-verified head below could consume most of the real
# window). At most HALF of the window is ceded to the never-verified
# priority group, so previously-green queries are guaranteed
# re-verification slots every round even when a large batch of new queries
# lands at once (otherwise a big unverified group would fill the whole
# window and regressions in greens could hide indefinitely).
_WINDOW = 50


def order_names(
    names: "list[str]", last_verified: "dict[str, int]", rnd: int, window: int = _WINDOW
) -> "list[str]":
    """The pure ordering rule (policy docstring above): never-verified
    head capped at window/2, then greens by staleness-desc round-robin
    filling the window, then the rotation tail. Pure so the staleness
    bound is testable under simulated rounds."""
    import hashlib

    def rot(n: str) -> str:
        return hashlib.md5(f"{rnd}:{n}".encode()).hexdigest()

    unverified = sorted((n for n in names if n not in last_verified), key=rot)
    head, overflow = unverified[: window // 2], unverified[window // 2 :]
    greens = sorted(
        (n for n in names if n in last_verified),
        key=lambda n: (last_verified[n] - rnd, rot(n)),  # most stale first
    )
    guaranteed = greens[: max(0, window - len(head))]
    tail = sorted(overflow + greens[len(guaranteed):], key=rot)
    return head + guaranteed + tail


def staleness_report() -> "dict[str, int]":
    """name → rounds since the last hash-verified driver row (0 = verified
    in the newest artifact; never-verified names report the full round
    count). Emitted into COVERAGE.md each round."""
    _load_all()
    rnd = _round_index()
    last = _last_verified()
    return {n: rnd - last.get(n, 0) for n in sorted(QUERIES)}


def _ordered_names() -> list[str]:
    return order_names(list(QUERIES), _last_verified(), _round_index())


def get_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    _load_all()
    return {name: QUERIES[name].fn for name in _ordered_names()}


def get_oracle_sql() -> dict[str, str]:
    _load_all()
    return {
        name: QUERIES[name].sql
        for name in _ordered_names()
        if QUERIES[name].sql is not None
    }


_LOADED = False


def _load_all() -> None:
    """Import all plan modules so their @register calls run."""
    global _LOADED
    if _LOADED:
        return
    from . import advanced  # noqa: F401
    from . import core  # noqa: F401
    from . import inventory  # noqa: F401
    from . import multimodal  # noqa: F401
    from . import nested  # noqa: F401
    from . import asof  # noqa: F401
    from . import text  # noqa: F401
    from . import dedup  # noqa: F401
    from . import similarity  # noqa: F401
    from . import pipeline  # noqa: F401
    from . import olap  # noqa: F401
    from . import quality  # noqa: F401
    from . import temporal  # noqa: F401
    from . import lexical  # noqa: F401

    _LOADED = True
