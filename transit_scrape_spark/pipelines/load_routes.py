"""Load pipeline — the reference's stage 2 (``push_to_db.py`` +
``db_helpers.py:125-247``) re-expressed:

- the sequential per-file glob loop (:77-106) becomes ONE multi-file
  distributed scan;
- per-row ORM materialization + 64k-batch commits (:148-182) become a
  schema-aligned parquet (or JDBC) append;
- ``--drop-existing`` / re-run hazard (:29-30,91-92) becomes an
  idempotent anti-join against already-loaded keys (SURVEY §7 M3).
"""

from __future__ import annotations

import argparse

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from transit_scrape_spark.sources.geojson import read_geojson_features

TARGET_COLUMNS: list[tuple[str, str]] = [
    ("route_id", "string"),
    ("street", "string"),
    ("locality", "string"),
    ("route_type", "string"),
    ("notes", "string"),
    ("surface", "string"),
    ("ncn_route", "string"),
    ("traffic", "string"),
    ("local_authority", "string"),
    ("la_s_code", "string"),
    ("sh_date_uploaded", "string"),
    ("sh_src", "string"),
    ("sh_src_id", "double"),
    ("route_length_m", "double"),
    ("source_file", "string"),
    ("geometry_wkt", "string"),
]


def align_to_target(df: DataFrame) -> DataFrame:
    """rename `type`->`route_type` (reference db_helpers.py:163-165), keep
    known columns / drop unknowns (:167-169), add missing as typed NULLs,
    stamp load timestamps (db_models.py:54-55)."""
    if "type" in df.columns and "route_type" not in df.columns:
        df = df.withColumnRenamed("type", "route_type")
    cols = [
        (F.col(n).cast(t) if n in df.columns else F.lit(None).cast(t)).alias(n)
        for n, t in TARGET_COLUMNS
    ]
    return df.select(*cols).withColumn(
        "created_at", F.current_timestamp()
    ).withColumn("updated_at", F.current_timestamp())


def load(
    spark: SparkSession,
    input_glob: str,
    target_dir: str,
    drop_existing: bool = False,
    dedup_key: str = "route_id",
) -> int:
    """One distributed scan over every input file -> align -> idempotent
    append. Returns number of rows appended."""
    feats = read_geojson_features(spark, input_glob)
    if "coordinates" in feats.columns:
        from transit_scrape_spark.functions.geo import linestring_to_wkt

        feats = feats.withColumn(
            "geometry_wkt", linestring_to_wkt(F.col("coordinates"))
        ).drop("coordinates")
    aligned = align_to_target(feats)

    import os

    if drop_existing:
        import shutil

        shutil.rmtree(target_dir, ignore_errors=True)
    if os.path.isdir(target_dir) and any(
        f.endswith(".parquet") for f in os.listdir(target_dir)
    ):
        existing_keys = spark.read.parquet(target_dir).select(dedup_key).distinct()
        aligned = aligned.join(existing_keys, dedup_key, "left_anti")

    n = aligned.count()
    if n:
        aligned.write.mode("append").parquet(target_dir)
    return n


def main() -> None:
    p = argparse.ArgumentParser(description="Load processed GeoJSON (Spark)")
    p.add_argument("--input-dir", required=True)
    p.add_argument("--pattern", default="*.geojson")
    p.add_argument("--target-dir", required=True)
    p.add_argument("--drop-existing", action="store_true")
    args = p.parse_args()

    from transit_scrape_spark.session import get_spark

    n = load(
        get_spark("load-routes"),
        f"{args.input_dir}/{args.pattern}",
        args.target_dir,
        args.drop_existing,
    )
    print(f"loaded {n} records")


if __name__ == "__main__":
    main()
