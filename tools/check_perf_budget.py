#!/usr/bin/env python
"""Per-op absolute perf budget gate (VERDICT r9 task 3).

The sweep's sec/op average hid individual outliers: r9's slowest op
(embed-hubness, 7.2 s) sat at 17x the sweep median with nothing
flagging it. This gate reads the committed full-sweep detail
(BENCH_DETAIL.json) and fails on any op slower than BUDGET_X times the
sweep median unless it carries a pinned justification below. Pins are
narrow by design: a new op drifting past the budget must either get
optimized or argue its case here.

Runs standalone (`python tools/check_perf_budget.py`), from
tools/round_close.py after the sweep, and from
tests/test_perf_budget.py against the committed artifact.
"""

from __future__ import annotations

import json
import pathlib
import statistics
import sys

REPO = pathlib.Path(__file__).resolve().parent.parent

BUDGET_X = 10.0  # flag ops slower than this multiple of the sweep median
# run-to-run sweep noise is several percent; an op at 10.02x median on
# one sweep and 9.7x on the next is the same op. Ops inside
# BUDGET_X..BUDGET_X*(1+NOISE_BAND) warn (visible, not failing) so the
# gate doesn't accumulate pins for boundary-hoverers; past the band the
# gate fails hard.
NOISE_BAND = 0.10
STALE_X = 7.0  # a pinned op now under this multiple => the pin is stale

# op -> why exceeding the budget is the op's intended cost shape, not a
# plan bug. Every entry must name the irreducible work. (The r9 verdict
# adjudicated each of these as scale-safe designs — the local timing is
# volume of work, not a shuffle/skew hazard.)
PERF_PINS: dict[str, str] = {
    # EMPTY since r11: all six r10 pins were retired by optimization
    # (semdedup gemm kernel, containment persists, ivf-probe explode
    # means) or by the resulting drop in their measured multiples
    # (graph iteratives now 3-6x median). A new entry needs the
    # irreducible-work argument the old ones carried.
}


def check(detail_path: pathlib.Path | None = None) -> list[str]:
    """Return a list of problem strings (empty = gate passes)."""
    detail_path = detail_path or REPO / "BENCH_DETAIL.json"
    timings = json.loads(detail_path.read_text())["queries"]
    med = statistics.median(timings.values())
    budget = BUDGET_X * med
    problems = []
    for op, sec in sorted(timings.items(), key=lambda kv: -kv[1]):
        if op in PERF_PINS or sec <= budget:
            continue
        if sec <= budget * (1 + NOISE_BAND):
            print(
                f"WARN perf-budget boundary: {op} at {sec / med:.2f}x median "
                f"(inside the {NOISE_BAND:.0%} noise band over {BUDGET_X:.0f}x) "
                "— optimize or pin if it stays here next sweep",
                file=sys.stderr,
            )
            continue
        problems.append(
            f"{op}: {sec:.3f}s = {sec / med:.1f}x sweep median "
            f"(budget {BUDGET_X:.0f}x = {budget:.3f}s) — optimize or pin "
            "in tools/check_perf_budget.py with a justification"
        )
    for op in sorted(PERF_PINS):
        sec = timings.get(op)
        if sec is not None and sec < STALE_X * med:
            print(
                f"NOTE stale perf pin: {op} measures {sec:.3f}s = "
                f"{sec / med:.1f}x median (< {STALE_X:.0f}x) — consider "
                "removing its PERF_PINS entry",
                file=sys.stderr,
            )
    return problems


def main() -> None:
    problems = check()
    if problems:
        print("PERF BUDGET GATE FAILED:")
        for p in problems:
            print(f"  - {p}")
        raise SystemExit(1)
    print("perf budget gate: all ops within budget or pinned")


if __name__ == "__main__":
    main()
