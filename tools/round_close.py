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
    """Certify the round's rotating driver-sim draw in a vanilla
    subprocess (driver's exact session shape + canonicalizer) and record
    PER-OP VERDICTS in LOCAL_SIM_DRAWS.json (VERDICT r9 task 1 — r8/r9
    entries are plain name lists, r10+ entries map op -> "pass"/"FAIL");
    then render the cumulative summary into SCALING.md's marked block."""
    from tools.driver_draw import (
        certify_draw,
        current_round,
        driver_validated_ops,
        rotating_draw,
    )

    rnd = current_round(REPO)
    draw = rotating_draw(REPO)
    verdicts = certify_draw(REPO, draw)
    fails = {op: v for op, v in verdicts.items() if v != "pass"}
    store_path = REPO / "LOCAL_SIM_DRAWS.json"
    store = json.loads(store_path.read_text()) if store_path.exists() else {}
    store[f"r{rnd}"] = verdicts
    store_path.write_text(json.dumps(store, indent=1))
    if fails:
        raise SystemExit(
            f"rotating draw has {len(fails)} failing op(s) — fix before close: {fails}"
        )

    # pass-only, matching locally_drawn_ops(): a FAIL verdict persisted
    # by an aborted close must not count as certified (r10 advice)
    cumulative = sorted(
        {
            op
            for entry in store.values()
            for op in (
                [o for o, v in entry.items() if v == "pass"]
                if isinstance(entry, dict)
                else entry
            )
        }
    )
    lines = [
        DRAW_START,
        "",
        "Per-round seeded draws (50/round r7-r8, 100/round since r9;",
        "priority-first over never-validated SURVEY §2/§2.12 ops and the",
        "seven r1 canonicalizer-crash rows since r10) over ops neither",
        "the REAL driver nor a prior local draw has validated",
        "(tools/driver_draw.py; certified green each round in a vanilla",
        "subprocess session with the driver's exact canonicalizer).",
        "Per-op verdicts (r10+) / name lists (r8-r9) in",
        "LOCAL_SIM_DRAWS.json.",
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


def record_loc() -> None:
    """Append a builder-tagged LoC-breakdown line to PROGRESS.jsonl
    (VERDICT r9 task 8): the driver's own entries report one aggregate
    `loc` that counts tests+tools+docs, which drifted 26k from the
    judge's non-test-source diagnostic. Emitting loc_source (package +
    entry + bench + tools) and loc_tests separately makes rounds
    comparable against the verdict formula. Builder lines are marked
    `"source": "builder"` so the driver's reader can ignore them."""
    import time

    from tools.driver_draw import current_round

    def _count(*roots: str) -> int:
        total = 0
        for root in roots:
            p = REPO / root
            files = [p] if p.is_file() else sorted(p.rglob("*.py"))
            for f in files:
                total += len(f.read_text().splitlines())
        return total

    entry = {
        "ts": time.time(),
        "round": current_round(REPO),
        "source": "builder",
        "loc_source": _count(
            "transit_scrape_spark", "tools", "__spark_entry__.py", "bench.py"
        ),
        "loc_tests": _count("tests"),
    }
    with open(REPO / "PROGRESS.jsonl", "a") as fh:
        fh.write(json.dumps(entry) + "\n")
    print(f"recorded LoC breakdown: {entry}")


def do_run(args) -> None:
    from tools.driver_draw import current_round

    rnd = current_round(REPO)
    _run([sys.executable, "tools/audit_plans.py"])
    audit = (REPO / "PLAN_AUDIT.md").read_text()
    if "0 flagged, 0 errored" not in audit:
        raise SystemExit("PLAN_AUDIT.md is not 0-flagged/0-errored — fix before close")
    _run([sys.executable, "tools/gen_coverage.py"])
    record_draw()
    record_loc()
    if not args.skip_bench:
        out = _run([sys.executable, "bench.py"], tail=1)
        json.loads(out.strip().splitlines()[-1])  # must be ONE JSON line
        # per-op absolute budget gate (VERDICT r9 task 3): no op may
        # exceed 10x the sweep median without a pinned justification
        _run([sys.executable, "tools/check_perf_budget.py"], tail=2)
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
    store = json.loads(store_path.read_text()) if store_path.exists() else {}
    entry = store.get(f"r{rnd}")
    if entry is None:
        problems.append(f"r{rnd} rotating draw not recorded (run step or record_draw)")
    elif isinstance(entry, dict):
        fails = {op: v for op, v in entry.items() if v != "pass"}
        if fails:
            problems.append(f"r{rnd} rotating draw has failing verdicts: {fails}")
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
