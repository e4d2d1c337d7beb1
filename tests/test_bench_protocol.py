"""bench.py stdout-protocol guard (VERDICT r9 task 7).

The driver tail-captures bench stdout; r1's summary inlined all per-op
timings (137 keys), got its HEAD truncated by the tail capture, and
became unparseable JSON — the protocol since is ONE short summary line
with only the fixed HEADLINE timings inlined. That boundedness was
asserted nowhere: a future registry at 1000 ops (or a careless field
addition) could silently regrow the line past the truncation budget.
These tests pin the protocol: the summary must stay a single parseable
JSON line under SUMMARY_MAX_BYTES no matter how many ops the sweep
timed.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE, SUMMARY_MAX_BYTES, summary_line  # noqa: E402

_ANCHOR = {"anchor_sec": 1.2345, "anchor_baseline_sec": 1.0, "box_factor": 1.2345}


def _fake_timings(n: int) -> dict[str, float]:
    # worst-case realistic shape: every headline op present (all get
    # inlined) plus long-named filler ops up to n
    t = {k: 123.4567 for k in HEADLINE}
    i = 0
    while len(t) < n:
        t[f"analytics-extremely-long-operator-name-{i:05d}"] = 9999.9999
        i += 1
    return t


def test_summary_line_bounded_at_1000_ops():
    line = summary_line(_fake_timings(1000), _ANCHOR, 0.1, "BENCH_DETAIL.json")
    assert "\n" not in line
    assert len(line.encode()) <= SUMMARY_MAX_BYTES
    parsed = json.loads(line)
    assert parsed["n_ops"] == 1000
    # only the fixed headline is inlined — the line must NOT grow with n
    assert set(parsed["queries"]) == set(HEADLINE)
    line_small = summary_line(_fake_timings(20), _ANCHOR, 0.1, "BENCH_DETAIL.json")
    assert abs(len(line) - len(line_small)) < 64  # scalar fields only


def test_summary_line_is_last_and_parseable_fields():
    parsed = json.loads(summary_line(_fake_timings(654), _ANCHOR, 0.1, "d.json"))
    for field in (
        "metric", "value", "unit", "queries", "sf", "n_ops", "median_sec",
        "sec_per_op", "anchor_sec", "box_factor", "sec_per_op_norm", "detail",
    ):
        assert field in parsed, field
    assert parsed["metric"] == "full_query_sweep_wall_sec"
    assert parsed["unit"] == "sec"


def test_summary_line_empty_and_anchorless():
    # degenerate inputs must not divide by zero or emit NaN
    parsed = json.loads(summary_line({}, {"box_factor": None}, 0.001, "d.json"))
    assert parsed["n_ops"] == 0 and parsed["sec_per_op"] == 0.0
    json.loads(summary_line({"tpch-q3": 0.1}, {}, "0.01", "d.json"))
