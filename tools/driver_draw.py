#!/usr/bin/env python
"""Seeded rotating driver-style draw (VERDICT r7 task 6).

The external driver has only ever validated ~87 unique ops across seven
rounds (its 50-op sample keeps re-drawing the same names). The local
harness replicates the driver check bit-for-bit for all 654, but
"driver-green" and "locally-green" stay distinct claims. This module
defines a per-round, seeded draw over the ops the DRIVER has never
touched, which tests/test_driver_sim.py certifies in a vanilla
subprocess session — so each round adds a fresh, named, driver-shaped
sample to the evidence, and tools/round_close.py records the cumulative
set in SCALING.md.

Draw size: 100/round since r9 (VERDICT r8 task 4 — at 50/round the
certification tail over the ~567 never-driver-drawn ops was ~12 rounds;
100 halves it for a few extra minutes of vanilla-subprocess sweep).

Determinism: seed = the round number (max N over CORRECTNESS_r{N}.json
+ 1, i.e. the round currently being built), so re-running the test in
the same round reproduces the same names.
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


def locally_drawn_ops(repo: pathlib.Path = REPO, before_round: int | None = None) -> set[str]:
    """Ops already certified by PRIOR rounds' local rotating draws
    (LOCAL_SIM_DRAWS.json). Only rounds < before_round count, so
    re-running the current round's draw after round_close has recorded
    it reproduces the same names."""
    if before_round is None:
        before_round = current_round(repo)
    store_path = repo / "LOCAL_SIM_DRAWS.json"
    if not store_path.exists():
        return set()
    try:
        store = json.loads(store_path.read_text())
    except Exception:
        return set()
    ops: set[str] = set()
    for key, names in store.items():
        m = re.match(r"r(\d+)$", key)
        if m and int(m.group(1)) < before_round:
            ops.update(names)
    return ops


def rotating_draw(repo: pathlib.Path = REPO, k: int = 100) -> list[str]:
    """Seeded k-op sample of registry ops neither the driver nor a prior
    round's local draw has validated — cumulative coverage grows by
    exactly k/round until the pool is exhausted, then tops up from the
    already-drawn pool (re-validation beats a short draw)."""
    import sys

    sys.path.insert(0, str(repo))
    from transit_scrape_spark.queries.registry import registry

    rnd = current_round(repo)
    seen = driver_validated_ops(repo) | locally_drawn_ops(repo, before_round=rnd)
    eligible = sorted(set(registry()) - seen)
    rng = random.Random(rnd)
    draw = rng.sample(eligible, min(k, len(eligible)))
    if len(draw) < k:
        refill = sorted(set(registry()) - set(draw))
        draw += rng.sample(refill, min(k - len(draw), len(refill)))
    return sorted(draw)


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
