"""The bench stdout line must stay under the driver's parse window.

The driver keeps only the last ~2000 chars of bench stdout and parses the
final JSON line from that window; bench.py targets 1900 chars and trims
the per-query map (slowest kept) until the line fits. Round-9 measured
the emitted line at 1867 chars — 33 chars of headroom — so this pins the
guarantee against the LIVE registry: however many queries exist and
however long their names get, the emitted line fits and still parses
with its summary keys intact.
"""

import json
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
from blockchain_etl_spark.plans.registry import QUERIES  # noqa: E402


def _fake_result(timings):
    return {
        "metric": "query_suite_wall_seconds",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": 0.1,
        "host_noise_index": 1.42,
        "loadavg_1m": [31.25, 28.75],
        "blocks_per_sec": 22.4,
        "docs_per_sec": 436.1,
        "ivm_rows_per_sec": 10719.0,
    }


def test_live_registry_line_fits_budget():
    # worst-ish realistic timings: wide spread, 3-decimal rounding as in main()
    timings = {
        name: round(0.123 + (i % 97) * 0.137, 3)
        for i, name in enumerate(sorted(QUERIES))
    }
    line = bench.emit_line(_fake_result(timings), timings)
    assert len(line) <= 1900, f"bench line {len(line)} chars exceeds budget"
    parsed = json.loads(line)
    assert parsed["metric"] == "query_suite_wall_seconds"
    assert parsed["unit"] == "sec"
    assert parsed["sf"] == 0.1
    # when trimmed, the summary keys must be present and consistent
    if "queries_omitted" in parsed:
        assert parsed["queries_total"] == len(timings)
        assert parsed["queries_omitted"] == len(timings) - len(parsed["queries"])
        assert parsed["detail_file"] == "BENCH_DETAIL.json"
        # slowest queries are the ones kept
        kept = set(parsed["queries"])
        cutoff = min(parsed["queries"].values())
        dropped_faster = [
            n for n, t in timings.items() if n not in kept and t > cutoff
        ]
        assert not dropped_faster


def test_line_fits_even_with_failures_and_long_names():
    # a failed-query list plus pathological names must still converge
    timings = {f"extremely_long_query_name_{i:03d}_" + "x" * 40: 1.5 for i in range(300)}
    result = _fake_result(timings)
    result["failed"] = sorted(timings)[:3]
    line = bench.emit_line(result, timings)
    assert len(line) <= 1900
    json.loads(line)


def test_registry_headroom_alarm():
    # fixed (non-query) payload must leave real room for the query map;
    # if this ever trips, shrink the summary keys before the driver does
    timings = {}
    base = bench.emit_line(_fake_result({"q": 1.0}), {"q": 1.0})
    assert len(base) < 500, "fixed bench payload has grown suspiciously large"
