"""Regenerate plans/registry.DRIVER_VERIFIED_GREEN from CORRECTNESS_r*.json.

Run at the START of each round, after the driver has written the previous
round's correctness file:

    python tools/update_green.py          # print the new set
    python tools/update_green.py --write  # rewrite the block in registry.py

A query is green if ANY round recorded rows_match and schema_match true
and hash_match true-or-null (null = rows-only by design); a query whose
LATEST appearance errored or hash-failed is dropped so it re-verifies at
the front of the 50-entry window.
"""

from __future__ import annotations

import glob
import json
import re
import sys

sys.path.insert(0, ".")


def compute_green() -> set[str]:
    green: set[str] = set()
    latest_bad: set[str] = set()
    for path in sorted(glob.glob("CORRECTNESS_r*.json")):
        data = json.load(open(path))
        for name, v in data.items():
            ok = (
                v.get("rows_match")
                and v.get("schema_match")
                and v.get("hash_match") in (True, None)
                and not v.get("err")
            )
            if ok:
                green.add(name)
                latest_bad.discard(name)
            else:
                latest_bad.add(name)
    return green - latest_bad


def main() -> int:
    green = compute_green()
    from blockchain_etl_spark.plans.registry import DRIVER_VERIFIED_GREEN

    added = sorted(green - DRIVER_VERIFIED_GREEN)
    removed = sorted(DRIVER_VERIFIED_GREEN - green)
    print(f"green: {len(green)}  (+{len(added)} new, -{len(removed)} dropped)")
    if added:
        print("newly green:", ", ".join(added))
    if removed:
        print("dropped (must re-verify):", ", ".join(removed))

    if "--write" in sys.argv:
        names = sorted(green)
        lines = []
        row: list[str] = []
        width = 0
        for n in names:
            tok = f'"{n}",'
            if width + len(tok) + 5 > 79 and row:
                lines.append("    " + " ".join(row))
                row, width = [], 0
            row.append(tok)
            width += len(tok) + 1
        if row:
            lines.append("    " + " ".join(row))
        block = "DRIVER_VERIFIED_GREEN: frozenset[str] = frozenset({\n" + "\n".join(lines) + "\n})"
        path = "blockchain_etl_spark/plans/registry.py"
        src = open(path).read()
        new_src, n_subs = re.subn(
            r"DRIVER_VERIFIED_GREEN: frozenset\[str\] = frozenset\(\{.*?\}\)",
            block,
            src,
            count=1,
            flags=re.S,
        )
        if n_subs != 1:
            print("ERROR: could not locate DRIVER_VERIFIED_GREEN block", file=sys.stderr)
            return 1
        open(path, "w").write(new_src)
        print(f"wrote {len(names)} names to {path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
