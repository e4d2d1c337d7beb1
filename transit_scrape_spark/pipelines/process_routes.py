"""Process pipeline — the reference's stage 1
(``/root/reference/src/process_cycle_networks.py:120-170``) as ONE lazy
Spark plan instead of a per-row Python loop:

    read GeoJSON -> explode features -> derive columns -> reproject -> write

Reference flow (per-row, interpreted):      Our flow (declarative):
  json.load whole file (:32-33)               spark.read.json (distributed)
  iterrows loop (:82-102)                     Column expressions (codegen)
  geometry.length (:88)                       linestring_length (zip_with/aggregate)
  basename provenance (:95)                   input_file_name()
  to_crs reproject (:112)                     pandas_udf (Arrow-vectorized)
  to_file/to_csv (:149-162)                   write.json/csv (distributed)

CLI mirrors the reference's argparse surface
(``process_cycle_networks.py:176-198``).
"""

from __future__ import annotations

import argparse

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from transit_scrape_spark.functions.geo import (
    linestring_length,
    reproject_bng_to_wgs84_udf,
)
from transit_scrape_spark.sources.geojson import read_geojson_features


def process_route_features(features: DataFrame) -> DataFrame:
    """Derive route_length_m (planar metres in the source CRS) and keep
    provenance; then reproject coordinates BNG -> WGS84.

    One logical plan; errors in individual features become NULLs (the
    reference skips bad rows, :86-102 — we keep them visible instead of
    silently dropping; filter on route_length_m IS NOT NULL for parity).
    """
    reproject = reproject_bng_to_wgs84_udf()

    with_len = features.withColumn(
        "route_length_m", linestring_length(F.col("coordinates"))
    )

    # explode to vertices, reproject in Arrow batches, regroup in order —
    # pos keeps vertex order stable through the shuffle-free window
    exploded = with_len.select(
        "*", F.posexplode("coordinates").alias("pos", "vertex")
    ).withColumn("ll", reproject(F.col("vertex")[0], F.col("vertex")[1]))

    group_cols = [c for c in with_len.columns if c != "coordinates"]
    regrouped = (
        exploded.groupBy(*group_cols)
        .agg(
            F.array_sort(
                F.collect_list(F.struct("pos", "ll"))
            ).alias("_verts")
        )
        .withColumn(
            "coordinates",
            F.transform(F.col("_verts"), lambda v: F.array(v["ll"]["lon"], v["ll"]["lat"])),
        )
        .drop("_verts")
    )
    return regrouped


def run(
    spark: SparkSession, input_path: str, output_dir: str, fmt: str = "geojson"
) -> DataFrame:
    feats = read_geojson_features(spark, input_path)
    processed = process_route_features(feats)
    if fmt == "geojson":
        from transit_scrape_spark.sources.sinks import write_geojson

        write_geojson(processed, output_dir)
    elif fmt == "csv":
        from transit_scrape_spark.sources.sinks import write_csv_wkt

        write_csv_wkt(processed, output_dir)
    elif fmt == "parquet":
        processed.write.mode("overwrite").parquet(output_dir)
    else:
        raise ValueError(f"unknown format {fmt!r}")
    return processed


def main() -> None:
    p = argparse.ArgumentParser(description="Process route GeoJSON (Spark)")
    p.add_argument("--input-file", required=True)
    p.add_argument("--output-dir", required=True)
    p.add_argument("--format", choices=["geojson", "csv", "parquet"], default="geojson")
    args = p.parse_args()

    from transit_scrape_spark.session import get_spark

    run(get_spark("process-routes"), args.input_file, args.output_dir, args.format)


if __name__ == "__main__":
    main()
