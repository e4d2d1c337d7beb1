"""Combined-hostility ("gauntlet") warehouse generator (r9 capstone).

Production data at 100 TB does not choose ONE failure mode: the same
table carries empty/unicode/padded strings, magnitude outliers, clock
garbage, malformed JSON, NULL payloads, AND at-least-once duplicate
rows simultaneously. Each r9 hostility axis proved every op against one
class in isolation; this generator CHAINS them —

    base -> extremegen (value hostility) -> hostilegen (NULLs + dups)

— so the sweep over the result (tests/test_gauntlet_parity.py) catches
*interaction* bugs that per-axis sweeps cannot: a try_divide NULL
flowing into a NULL-ordering window, a json_valid guard meeting a NULL
props, a duplicated row whose payload was already mutated to a hostile
variant, an empty-string key colliding with a NULL one in a coalesce.

Both stages are deterministic and content-derived (key-hash selected
with independent salts), so duplicated rows mutate identically in both
copies and the full-row-duplicate tie-safety argument still holds.

The zipf-skew axis is deliberately NOT chained in: skewgen REWRITES the
fact keys (a different warehouse, not an overlay), so composing it
would change which rows the other two stages select and break
axis attribution. Skew interactions are covered by its own sweep.
"""

from __future__ import annotations

import shutil

from pyspark.sql import SparkSession

from transit_scrape_spark.sources.extremegen import generate_extreme_warehouse
from transit_scrape_spark.sources.hostilegen import generate_hostile_warehouse


def generate_gauntlet_warehouse(
    spark: SparkSession,
    src: str,
    out: str,
) -> None:
    mid = out.rstrip("/") + "_mid"
    generate_extreme_warehouse(spark, src, mid)
    generate_hostile_warehouse(spark, mid, out)
    shutil.rmtree(mid, ignore_errors=True)
