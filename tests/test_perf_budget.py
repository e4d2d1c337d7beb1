"""Perf-budget gate regression tests (VERDICT r9 task 3).

The gate itself (tools/check_perf_budget.py) runs against the committed
full-sweep artifact in round_close; these tests (a) hold the committed
BENCH_DETAIL.json to the gate so a regression can't be committed
silently, and (b) pin the gate's own semantics with synthetic inputs.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.check_perf_budget import BUDGET_X, PERF_PINS, check  # noqa: E402


def test_committed_bench_detail_passes_gate():
    problems = check()
    assert not problems, "\n".join(problems)


def test_gate_flags_unpinned_outlier(tmp_path):
    timings = {f"op-{i}": 1.0 for i in range(20)}
    timings["runaway-op"] = BUDGET_X + 5.0
    p = tmp_path / "detail.json"
    p.write_text(json.dumps({"queries": timings}))
    problems = check(p)
    assert len(problems) == 1 and "runaway-op" in problems[0]


def test_gate_accepts_pinned_outlier(tmp_path, monkeypatch):
    # PERF_PINS is empty since r11 (every pin retired by optimization);
    # pin a synthetic op to verify the accept path still works
    monkeypatch.setitem(PERF_PINS, "pinned-op", "synthetic pin for test")
    timings = {f"op-{i}": 1.0 for i in range(20)}
    timings["pinned-op"] = BUDGET_X + 5.0
    p = tmp_path / "detail.json"
    p.write_text(json.dumps({"queries": timings}))
    assert check(p) == []


def test_pins_carry_justifications():
    for op, why in PERF_PINS.items():
        assert len(why) > 40, f"{op}: pin justification too thin"
