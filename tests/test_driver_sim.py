"""Full-registry driver simulation (VERDICT r2 item 6).

The external driver validates a random ~50-op sample per round with its
OWN vanilla SparkSession; ops outside the sample only ever run under
our configured test session. This test closes that gap: one subprocess
builds a session with NONE of our session.py configs (only master +
shuffle-partition count, which affect speed not semantics) and replays
the oracle comparison for EVERY registered op in a single session —
so the next random 50 can't surprise.

Subprocess isolation is required: pytest's session-scoped SparkSession
owns the JVM, and getOrCreate() inside the same process would inherit
its configs.
"""

from __future__ import annotations

import os
import pathlib
import subprocess
import sys

_SWEEP = r"""
import sys
sys.path.insert(0, {repo!r})
sys.path.insert(0, {tests!r})
from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.master("local[8]")
    .appName("driver-sim-sweep")
    .config("spark.sql.shuffle.partitions", "8")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

import __spark_entry__ as e
from oracle_harness import compare, duck_conn

from transit_scrape_spark.session import release_caches, persistent_rdd_count

sf = {sf_dir!r}
only = {only!r}
q, o = e.queries(), e.oracle_sql()
if only is not None:
    q = {{k: q[k] for k in only}}
con = duck_conn(sf)
failed = []
for op in sorted(q):
    try:
        compare(q[op](spark, sf), con, o[op], op)
    except Exception as ex:
        failed.append(op)
        print("FAIL " + op + ": " + str(ex)[:300], flush=True)
    release_caches(spark)
    # zero-retained-RDDs contract, attributed per op: any persist
    # release_caches cannot reclaim names the op that created it
    leftover = persistent_rdd_count(spark)
    if leftover:
        print("FAIL cache-hygiene after %s: %d persisted RDDs" % (op, leftover), flush=True)
        failed.append("cache-hygiene:" + op)
leftover = persistent_rdd_count(spark)
if leftover:
    print("FAIL cache-hygiene: %d persisted RDDs after teardown" % leftover, flush=True)
    failed.append("cache-hygiene")
print("SWEEP %d/%d green" % (len(q) - len(failed), len(q)), flush=True)
sys.exit(1 if failed else 0)
"""


def test_full_registry_driver_sim():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    code = _SWEEP.format(
        repo=repo,
        tests=os.path.join(repo, "tests"),
        sf_dir="/root/testdata/sf0.01",
        only=None,
    )
    proc = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        timeout=3600,
        cwd=repo,
    )
    tail = "\n".join(proc.stdout.splitlines()[-40:])
    assert proc.returncode == 0, (
        f"driver-sim sweep failed:\n{tail}\n--- stderr tail ---\n"
        + "\n".join(proc.stderr.splitlines()[-15:])
    )
    assert "SWEEP" in proc.stdout


def test_rotating_driver_draw():
    """Seeded driver-shaped sample (100/round since r9; priority-first
    over never-validated SURVEY §2/§2.12 ops and the seven r1
    canonicalizer-crash rows since r10, VERDICT r9 task 1) over ops
    neither the REAL driver nor a prior round's local draw has
    validated: the full sweep above already covers everything, but this
    names a fresh reproducible batch each round (seed = round number),
    certifying it in its own vanilla subprocess with PER-OP verdicts —
    the exact shape of the driver's per-round check. The verdict map is
    recorded in LOCAL_SIM_DRAWS.json by tools/round_close.py."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    from tools.driver_draw import certify_draw, current_round, rotating_draw

    draw = rotating_draw()
    print(f"round {current_round()} rotating draw ({len(draw)} ops): {draw}")
    verdicts = certify_draw(pathlib.Path(repo), draw)
    fails = {op: v for op, v in verdicts.items() if v != "pass"}
    assert sorted(verdicts) == sorted(draw), (
        f"verdict map incomplete: missing {set(draw) - set(verdicts)}"
    )
    assert not fails, f"rotating-draw sweep failed: {fails}"


def test_full_registry_driver_sim_sf01():
    """Nightly-style sf0.1 sweep (VERDICT r3 item 7) — 10x the data of
    the default sim, too slow for every pytest run, so flag-gated:
    SPARK_GRAFT_SIM_SF01=1 python -m pytest tests/test_driver_sim.py -k sf01
    """
    import pytest

    if os.environ.get("SPARK_GRAFT_SIM_SF01") != "1":
        pytest.skip("set SPARK_GRAFT_SIM_SF01=1 to run the sf0.1 sweep")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    code = _SWEEP.format(
        repo=repo,
        tests=os.path.join(repo, "tests"),
        sf_dir="/root/testdata/sf0.1",
        only=None,
    )
    proc = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        timeout=7200,
        cwd=repo,
    )
    tail = "\n".join(proc.stdout.splitlines()[-40:])
    assert proc.returncode == 0, (
        f"sf0.1 driver-sim sweep failed:\n{tail}\n--- stderr tail ---\n"
        + "\n".join(proc.stderr.splitlines()[-15:])
    )
