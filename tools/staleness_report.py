"""Registry staleness telemetry → COVERAGE.md.

Emits rounds-since-last-verified per registered query (from the driver's
own CORRECTNESS_r*.json artifacts, the same inputs plans/registry.py's
staleness-fair rotation consumes) and rewrites the `## Verification
staleness` section at the end of COVERAGE.md. Run once per round, after
the newest artifact lands.

Usage: python tools/staleness_report.py
"""

from __future__ import annotations

import os
import re
from collections import Counter

MARKER = "## Verification staleness"


def render() -> str:
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from blockchain_etl_spark.plans import registry

    rep = registry.staleness_report()
    rnd = registry._round_index()
    hist = Counter(rep.values())
    lines = [
        MARKER,
        "",
        f"Rounds since each query's last hash-verified driver row, after "
        f"round {rnd} ({len(rep)} queries). The registry's staleness-fair "
        f"rotation (plans/registry.py::order_names) bounds the max gap at "
        f"ceil(greens / (window - window/2)) rounds; "
        f"tests/test_registry_order.py asserts the bound under simulated "
        f"rounds. With the surface saturated (no unverified queries) all "
        f"window slots rotate greens, so the LIVE bound is "
        f"ceil(greens / window) = 4 rounds — asserted against the live "
        f"registry by tests/test_staleness_bound.py, which fails the "
        f"moment new registrations (or green-set growth past 200) would "
        f"widen it. The adversarial 8-round figure (a full window/2 head "
        f"of brand-new queries in one round) is explicitly accepted "
        f"there as a ceiling.",
        "",
        "| staleness (rounds) | queries |",
        "|---|---|",
    ]
    for s in sorted(hist):
        lines.append(f"| {s} | {hist[s]} |")
    worst = max(rep.values())
    stale = sorted((n for n, s in rep.items() if s == worst))
    lines += [
        "",
        f"Max staleness: **{worst}** — {', '.join(stale[:12])}"
        + (f" (+{len(stale) - 12} more)" if len(stale) > 12 else ""),
        "",
    ]
    return "\n".join(lines)


def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = os.path.join(repo, "COVERAGE.md")
    with open(path) as f:
        body = f.read()
    section = render()
    if MARKER in body:
        body = re.sub(
            re.escape(MARKER) + r".*?(?=\n## |\Z)", section, body, flags=re.S
        )
    else:
        body = body.rstrip("\n") + "\n\n" + section
    with open(path, "w") as f:
        f.write(body)
    print(section)


if __name__ == "__main__":
    main()
