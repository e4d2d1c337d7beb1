#!/usr/bin/env python
"""Mechanized round-close checklist (VERDICT r7 task 3).

The checklist lived in SCALING.md and memory; r6 and r7 both closed with
dirty trees because a step was skipped or reordered. This script runs it
serially (Spark jobs must not overlap on the 32-core box — concurrent
runs inflate committed timings) and `check` validates the result so the
round's last commit can assert its own hygiene.

Usage:
  python tools/round_close.py run [--skip-sf1] [--skip-sf10] [--skip-bench]
      audit -> coverage -> record rotating draw -> bench.py (sf0.1)
      -> bench_isolated (+ round-tagged copy) -> sf1 soak -> sf10 soak
  python tools/round_close.py check
      PLAN_AUDIT 0-flagged/0-errored, bench artifacts present + parse,
      round-tagged isolated bench exists, draw recorded, git tree clean.
"""

from __future__ import annotations

import argparse
import json
import pathlib
import re
import shutil
import subprocess
import sys

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

DRAW_START = "<!-- local-sim-draws:start -->"
DRAW_END = "<!-- local-sim-draws:end -->"


def _run(cmd: list[str], tail: int = 3) -> str:
    print(f"== {' '.join(cmd)}", flush=True)
    proc = subprocess.run(cmd, cwd=REPO, capture_output=True, text=True)
    out = proc.stdout + proc.stderr
    for line in out.splitlines()[-tail:]:
        print(f"   {line}", flush=True)
    if proc.returncode != 0:
        raise SystemExit(f"step failed ({proc.returncode}): {' '.join(cmd)}")
    return proc.stdout


def record_draw() -> None:
    """Record the round's rotating driver-sim draw in LOCAL_SIM_DRAWS.json
    and render the cumulative summary into SCALING.md's marked block."""
    from tools.driver_draw import current_round, driver_validated_ops, rotating_draw

    rnd = current_round(REPO)
    draw = rotating_draw(REPO)
    store_path = REPO / "LOCAL_SIM_DRAWS.json"
    store = json.loads(store_path.read_text()) if store_path.exists() else {}
    store[f"r{rnd}"] = draw
    store_path.write_text(json.dumps(store, indent=1))

    cumulative = sorted({op for ops in store.values() for op in ops})
    lines = [
        DRAW_START,
        "",
        "Per-round seeded draws (50/round r7-r8, 100/round since r9) over",
        "ops neither the REAL driver nor a prior local draw has validated",
        "(tools/driver_draw.py; certified green each round by",
        "tests/test_driver_sim.py::test_rotating_driver_draw in a vanilla",
        "subprocess session). Full lists in LOCAL_SIM_DRAWS.json.",
        "",
        f"- driver-validated ops (CORRECTNESS_r*.json): "
        f"{len(driver_validated_ops(REPO))}",
        f"- locally sim-certified via rotating draws: {len(cumulative)} "
        f"across {len(store)} round(s) ({', '.join(sorted(store))})",
        "",
        DRAW_END,
    ]
    block = "\n".join(lines)
    scaling = (REPO / "SCALING.md").read_text()
    if DRAW_START in scaling:
        scaling = re.sub(
            re.escape(DRAW_START) + r".*?" + re.escape(DRAW_END),
            block,
            scaling,
            flags=re.S,
        )
    else:
        scaling = scaling.rstrip() + "\n\n## Rotating driver-sim draws\n\n" + block + "\n"
    (REPO / "SCALING.md").write_text(scaling)
    print(f"recorded r{rnd} draw ({len(draw)} ops, cumulative {len(cumulative)})")


def do_run(args) -> None:
    from tools.driver_draw import current_round

    rnd = current_round(REPO)
    _run([sys.executable, "tools/audit_plans.py"])
    audit = (REPO / "PLAN_AUDIT.md").read_text()
    if "0 flagged, 0 errored" not in audit:
        raise SystemExit("PLAN_AUDIT.md is not 0-flagged/0-errored — fix before close")
    _run([sys.executable, "tools/gen_coverage.py"])
    record_draw()
    if not args.skip_bench:
        out = _run([sys.executable, "bench.py"], tail=1)
        json.loads(out.strip().splitlines()[-1])  # must be ONE JSON line
        _run([sys.executable, "tools/bench_isolated.py"], tail=1)
        shutil.copy(
            REPO / "BENCH_ISOLATED.json",
            REPO / f"BENCH_ISOLATED_r{rnd:02d}.json",
        )
    if not args.skip_sf1:
        _run([sys.executable, "tools/bench_sf1.py"], tail=1)
        sf1 = json.loads((REPO / "BENCH_SF1.json").read_text())
        if not sf1.get("all_pass"):
            raise SystemExit("sf1 soak has failing ratios — fix before close")
    if not args.skip_sf10:
        if (REPO / ".sf10").is_dir():
            _run([sys.executable, "tools/bench_sf10.py"], tail=1)
        else:
            print("   .sf10 fixtures absent — run tools/gen_sf10.py first (skipped)")
    print("round_close run complete — commit, then `round_close.py check`")


def do_check(_args) -> None:
    from tools.driver_draw import current_round

    rnd = current_round(REPO)
    problems = []
    audit = (REPO / "PLAN_AUDIT.md").read_text()
    if "0 flagged, 0 errored" not in audit:
        problems.append("PLAN_AUDIT.md not 0-flagged/0-errored")
    for f in ("BENCH_DETAIL.json", "BENCH_ISOLATED.json", "BENCH_SF1.json"):
        p = REPO / f
        if not p.exists():
            problems.append(f"{f} missing")
        else:
            try:
                json.loads(p.read_text())
            except Exception:
                problems.append(f"{f} unparseable")
    if not (REPO / f"BENCH_ISOLATED_r{rnd:02d}.json").exists():
        problems.append(f"BENCH_ISOLATED_r{rnd:02d}.json (round tag) missing")
    store_path = REPO / "LOCAL_SIM_DRAWS.json"
    if not store_path.exists() or f"r{rnd}" not in json.loads(store_path.read_text()):
        problems.append(f"r{rnd} rotating draw not recorded (run step or record_draw)")
    dirty = subprocess.run(
        ["git", "status", "--porcelain"], cwd=REPO, capture_output=True, text=True
    ).stdout.strip()
    if dirty:
        problems.append(f"git tree dirty:\n{dirty}")
    if problems:
        print("ROUND CLOSE CHECK FAILED:")
        for p in problems:
            print(f"  - {p}")
        raise SystemExit(1)
    print(f"round r{rnd} close check: all green, tree clean")


def main() -> None:
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)
    runp = sub.add_parser("run")
    runp.add_argument("--skip-sf1", action="store_true")
    runp.add_argument("--skip-sf10", action="store_true")
    runp.add_argument("--skip-bench", action="store_true")
    sub.add_parser("check")
    args = ap.parse_args()
    (do_run if args.cmd == "run" else do_check)(args)


if __name__ == "__main__":
    main()
