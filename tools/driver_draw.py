#!/usr/bin/env python
"""Seeded rotating driver-style draw (VERDICT r7 task 6).

The external driver has only ever validated ~87 unique ops across seven
rounds (its 50-op sample keeps re-drawing the same names). The local
harness replicates the driver check bit-for-bit for all 654, but
"driver-green" and "locally-green" stay distinct claims. This module
defines a per-round, seeded, 50-op draw over the ops the DRIVER has
never touched, which tests/test_driver_sim.py certifies in a vanilla
subprocess session — so each round adds a fresh, named, driver-shaped
sample to the evidence, and tools/round_close.py records the cumulative
set in SCALING.md.

Determinism: seed = the round number (max N over CORRECTNESS_r{N}.json
+ 1, i.e. the round currently being built), so re-running the test in
the same round reproduces the same 50 names.
"""

from __future__ import annotations

import json
import pathlib
import random
import re

REPO = pathlib.Path(__file__).resolve().parent.parent


def driver_validated_ops(repo: pathlib.Path = REPO) -> set[str]:
    """Union of op ids the real driver has checked (CORRECTNESS_r*.json)."""
    ops: set[str] = set()
    for p in sorted(repo.glob("CORRECTNESS_r*.json")):
        try:
            ops.update(json.loads(p.read_text()))
        except Exception:
            continue
    return ops


def current_round(repo: pathlib.Path = REPO) -> int:
    """The round being built = max recorded correctness round + 1."""
    rounds = [
        int(m.group(1))
        for p in repo.glob("CORRECTNESS_r*.json")
        if (m := re.search(r"CORRECTNESS_r(\d+)\.json$", p.name))
    ]
    return (max(rounds) + 1) if rounds else 1


def rotating_draw(repo: pathlib.Path = REPO, k: int = 50) -> list[str]:
    """Seeded k-op sample of registry ops the driver has never drawn."""
    import sys

    sys.path.insert(0, str(repo))
    from transit_scrape_spark.queries.registry import registry

    eligible = sorted(set(registry()) - driver_validated_ops(repo))
    rng = random.Random(current_round(repo))
    return sorted(rng.sample(eligible, min(k, len(eligible))))


if __name__ == "__main__":
    draw = rotating_draw()
    print(
        json.dumps(
            {
                "round": current_round(),
                "driver_validated": len(driver_validated_ops()),
                "draw": draw,
            },
            indent=1,
        )
    )
