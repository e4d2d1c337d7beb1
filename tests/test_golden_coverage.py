"""Golden-coverage completeness gate (VERDICT r7 task 2).

README asserts the golden-uncovered ops are exactly the relational/IO/
streaming set where the DuckDB oracle is already an independent
implementation. That claim is now mechanized: ``golden_covered_ops``
(tools/gen_coverage.py) AST-derives the covered set from the actual
tests/test_golden_*.py suites, COVERAGE.md renders it as a per-op
column, and this test pins the contract — every op in a formula-dense
module must have a golden, so a new formula-dense op without one fails
CI the commit it lands.
"""

from __future__ import annotations

import pathlib
import re
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from tools.gen_coverage import FORMULA_DENSE_MODULES, golden_covered_ops
from transit_scrape_spark.queries.registry import registry


def _reg():
    return registry()


def test_formula_dense_modules_fully_golden():
    reg = _reg()
    golden = golden_covered_ops(reg)
    missing = sorted(
        op
        for op, spec in reg.items()
        if spec.fn.__module__.split(".")[-1] in FORMULA_DENSE_MODULES
        and op not in golden
    )
    assert not missing, (
        "formula-dense ops without a golden cross-check (add one to a "
        f"tests/test_golden_*.py suite): {missing}"
    )


def test_formula_dense_modules_exist():
    """Every pinned module name must still be a real queries module —
    a rename would silently empty the gate."""
    reg = _reg()
    live = {spec.fn.__module__.split(".")[-1] for spec in reg.values()}
    dead = sorted(FORMULA_DENSE_MODULES - live)
    assert not dead, f"FORMULA_DENSE_MODULES names unknown modules: {dead}"


def test_golden_set_never_shrinks():
    """The derived golden count must not drop below the r7 high-water
    mark (514, r8) — catches an accidental suite deletion or a registry
    rename that orphans literals."""
    reg = _reg()
    golden = golden_covered_ops(reg)
    assert len(golden) >= 514, len(golden)


def test_coverage_md_in_sync():
    """COVERAGE.md's golden column must match the derivation — run
    `python tools/gen_coverage.py` after adding ops or goldens."""
    reg = _reg()
    golden = golden_covered_ops(reg)
    text = (
        pathlib.Path(__file__).resolve().parent.parent / "COVERAGE.md"
    ).read_text()
    rows = re.findall(
        r"^\| `([^`]+)` \| \S+ \| \S+ \| (yes|—) \|", text, re.M
    )
    assert len(rows) == len(reg), (
        f"COVERAGE.md has {len(rows)} rows vs {len(reg)} registered ops — "
        "regenerate with python tools/gen_coverage.py"
    )
    stale = [
        op
        for op, g in rows
        if (g == "yes") != (op in golden)
    ]
    assert not stale, (
        f"COVERAGE.md golden column stale for {stale[:10]} — regenerate"
    )
