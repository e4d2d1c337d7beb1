"""Source/sink/DDL operator surface (SURVEY.md §2.1, §2.3 validity ops,
plus derive/projection ops tied to scans).

These ops exercise REAL engine I/O: files are materialized
deterministically under /tmp from fixture tables, pushed through the
distributed readers/writers, and the read-back result is oracled
against the originating table.
"""

from __future__ import annotations

import glob as _glob
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from transit_scrape_spark.queries.geo import NATION_PROPS, _geojson_fixture_path
from transit_scrape_spark.queries.registry import query
from transit_scrape_spark.sources.fixtures import content_tag, fixture_dir
from transit_scrape_spark.sources.geojson import read_geojson_features
from transit_scrape_spark.sources.tables import load_table


def _tag(sf_dir: str) -> str:
    return sf_dir.strip("/").replace("/", "_")


def _glob_fixture_dir(spark: SparkSession, sf_dir: str) -> str:
    """One GeoJSON file per region (nation split by n_regionkey) — the
    reference's timestamped per-scrape file corpus (push_to_db.py:77-88)."""
    import json

    def build(d: str) -> None:
        rows = load_table(spark, sf_dir, "nation").orderBy("n_nationkey").collect()
        by_region: dict[int, list] = {}
        for r in rows:
            by_region.setdefault(r["n_regionkey"], []).append(r)
        if not by_region:
            # schema-complete empty corpus: a quiet day still lands a
            # (feature-less) file, so the glob/scan path stays exercised
            with open(os.path.join(d, "nation_none.geojson"), "w") as f:
                json.dump({"type": "FeatureCollection", "features": []}, f)
        for rk, rs in by_region.items():
            feats = [
                {
                    "type": "Feature",
                    "properties": {"n_nationkey": r["n_nationkey"], "n_name": r["n_name"]},
                    "geometry": {
                        "type": "LineString",
                        "coordinates": [
                            [float(r["n_nationkey"]), 0.0],
                            [float(r["n_nationkey"]) + 1.0, 1.0],
                        ],
                    },
                }
                for r in rs
            ]
            with open(os.path.join(d, f"nation_{rk}.geojson"), "w") as f:
                json.dump({"type": "FeatureCollection", "features": feats}, f)

    return fixture_dir("tss_glob", sf_dir, build)


@query(
    "scan-glob",
    oracle="""
        SELECT concat('nation_', CAST(n_regionkey AS VARCHAR), '.geojson') AS source_file,
               count(*) AS n
        FROM nation
        GROUP BY n_regionkey
    """,
    doc="Directory+glob ingestion (reference glob loop push_to_db.py:77-88) "
    "as ONE distributed multi-file scan — per-file counts from "
    "input_file_name, no Python loop.",
)
def scan_glob(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _glob_fixture_dir(spark, sf_dir)
    feats = read_geojson_features(
        spark, f"{d}/*.geojson", properties="n_nationkey BIGINT, n_name STRING"
    )
    return feats.groupBy("source_file").agg(F.count("*").alias("n"))


@query(
    "derive-source-file",
    oracle="""
        SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey,
               concat('nation_', CAST(n_regionkey AS VARCHAR), '.geojson') AS source_file
        FROM nation
    """,
    doc="Per-row provenance column = basename(input file) "
    "(reference process_cycle_networks.py:95).",
)
def derive_source_file(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _glob_fixture_dir(spark, sf_dir)
    feats = read_geojson_features(
        spark, f"{d}/*.geojson", properties="n_nationkey BIGINT, n_name STRING"
    )
    return feats.select(
        F.col("n_nationkey").cast("long").alias("n_nationkey"), "source_file"
    )


@query(
    "scan-geojson-lib",
    oracle="""
        SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey, n_name,
               'LineString' AS geometry_type
        FROM nation
    """,
    doc="Processed-GeoJSON read path (reference gpd.read_file, "
    "db_helpers.py:214) — same single GeoJSON reader as scan-geojson "
    "(SURVEY §2.1 'one GeoJSON reader in our engine').",
)
def scan_geojson_lib(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = _geojson_fixture_path(spark, sf_dir)
    feats = read_geojson_features(spark, path, properties=NATION_PROPS)
    return feats.select(
        F.col("n_nationkey").cast("long").alias("n_nationkey"),
        "n_name",
        "geometry_type",
    )


@query(
    "scan-sql",
    oracle="""
        SELECT c_custkey, c_name, c_acctbal
        FROM customer
        WHERE c_mktsegment IS NOT NULL AND c_mktsegment = 'MACHINERY'
        ORDER BY c_custkey
        LIMIT 500
    """,
    doc="SQL-text entry point (reference pd.read_sql pushing SQL strings "
    "to Postgres, app/app.py:52,77): spark.sql over registered views — "
    "same Catalyst plan as the DataFrame chain.",
)
def scan_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("tss_customer")
    try:
        return spark.sql(
            """
            SELECT c_custkey, c_name, c_acctbal
            FROM tss_customer
            WHERE c_mktsegment IS NOT NULL AND c_mktsegment = 'MACHINERY'
            ORDER BY c_custkey
            LIMIT 500
            """
        )
    finally:
        spark.catalog.dropTempView("tss_customer")


@query(
    "sink-geojson",
    oracle="""
        SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey,
               'LineString' AS geometry_type,
               CAST(2 AS BIGINT) AS n_points
        FROM nation
    """,
    doc="GeoJSON sink (reference to_file, process_cycle_networks.py:149-153) "
    "as newline-delimited Feature objects, then read back through the "
    "GeoJSON scanner — full write+read round-trip.",
)
def sink_geojson(spark: SparkSession, sf_dir: str) -> DataFrame:
    from transit_scrape_spark.sources.sinks import write_geojson

    path = _geojson_fixture_path(spark, sf_dir)
    feats = read_geojson_features(spark, path, properties=NATION_PROPS).select(
        F.col("n_nationkey").cast("long").alias("n_nationkey"), "coordinates"
    )
    out_dir = os.path.dirname(path) + "/geojson_out"
    write_geojson(feats, out_dir)
    back = read_geojson_features(
        spark, out_dir, multiline=False, properties="n_nationkey BIGINT"
    )
    return back.select(
        F.col("n_nationkey").cast("long").alias("n_nationkey"),
        "geometry_type",
        F.size("coordinates").cast("long").alias("n_points"),
    )


@query(
    "sink-jdbc-batch",
    oracle="""
        SELECT o_orderstatus, count(*) AS n, round(sum(o_totalprice), 2) AS total
        FROM orders
        WHERE o_orderstatus = 'F'
        GROUP BY o_orderstatus
    """,
    doc="Batched table append (reference 64k-row ORM batches, "
    "db_helpers.py:125-192): write.mode(overwrite) parquet with "
    "batchsize-equivalent row-group sizing, then read back and "
    "aggregate. The JDBC form is df.write.option('batchsize', 64000)"
    ".jdbc(...) — no JDBC server in this environment, parquet target "
    "exercises the identical plan shape.",
)
def sink_jdbc_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    # scratch output (rewritten every call): per-process path so two
    # sessions can't interleave an overwrite with a read-back
    target = f"/tmp/tss_jdbc_{_tag(sf_dir)}_{os.getpid()}"
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    o.write.mode("overwrite").option("parquet.block.size", 64 * 1024 * 1024).parquet(
        target
    )
    back = spark.read.parquet(target)
    return back.groupBy("o_orderstatus").agg(
        F.count("*").alias("n"), F.round(F.sum("o_totalprice"), 2).alias("total")
    )


@query(
    "sink-ddl",
    oracle="""
        SELECT c_mktsegment, count(*) AS n
        FROM customer
        GROUP BY c_mktsegment
    """,
    doc="DDL management (reference create_tables/drop/introspect, "
    "db_helpers.py:94-123): DROP TABLE IF EXISTS + CTAS USING parquet "
    "+ catalog verification + read back via spark.table.",
)
def sink_ddl(spark: SparkSession, sf_dir: str) -> DataFrame:
    # scratch CTAS location (dropped/recreated every call): per-process
    loc = f"/tmp/tss_ddl_{_tag(sf_dir)}_{os.getpid()}"
    shutil.rmtree(loc, ignore_errors=True)
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("tss_customer_src")
    spark.sql("DROP TABLE IF EXISTS tss_ddl_table")
    spark.sql(
        f"""
        CREATE TABLE tss_ddl_table USING parquet LOCATION '{loc}'
        AS SELECT c_custkey, c_mktsegment FROM tss_customer_src
        """
    )
    spark.catalog.dropTempView("tss_customer_src")  # CTAS ran eagerly
    assert any(t.name == "tss_ddl_table" for t in spark.catalog.listTables())
    return spark.table("tss_ddl_table").groupBy("c_mktsegment").agg(
        F.count("*").alias("n")
    )


@query(
    "project-drop-geometry",
    oracle="SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey, n_name FROM nation",
    doc="Property extraction = all columns except geometry (reference "
    "process_cycle_networks.py:84, app/app.py:180).",
)
def project_drop_geometry(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = _geojson_fixture_path(spark, sf_dir)
    feats = read_geojson_features(spark, path, properties=NATION_PROPS)
    keep = [c for c in feats.columns if c not in ("coordinates", "geometry_type")]
    return feats.select(*keep).select(
        F.col("n_nationkey").cast("long").alias("n_nationkey"), "n_name"
    )


@query(
    "derive-timestamps",
    oracle="""
        SELECT event_id, TRUE AS has_created, TRUE AS has_updated, TRUE AS stamps_equal
        FROM events
    """,
    doc="Load-time created_at/updated_at = now() defaults (reference "
    "db_models.py:54-55) via current_timestamp(); oracled on the "
    "deterministic properties (non-null, equal) since wall-clock values "
    "can't hash-match across engines.",
)
def derive_timestamps(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    stamped = ev.select("event_id").withColumn(
        "created_at", F.current_timestamp()
    ).withColumn("updated_at", F.current_timestamp())
    return stamped.select(
        "event_id",
        F.col("created_at").isNotNull().alias("has_created"),
        F.col("updated_at").isNotNull().alias("has_updated"),
        (F.col("created_at") == F.col("updated_at")).alias("stamps_equal"),
    )


def _corrupt_fixture_dir(spark: SparkSession, sf_dir: str) -> str:
    def build(d: str) -> None:
        shutil.copy(
            _geojson_fixture_path(spark, sf_dir), os.path.join(d, "good.geojson")
        )
        with open(os.path.join(d, "bad.geojson"), "w") as f:
            f.write('{"type": "FeatureCollection", "features": [ {broken')

    return fixture_dir("tss_corrupt", sf_dir, build)


@query(
    "filter-valid-rows",
    oracle="""
        SELECT CAST((SELECT count(*) FROM nation) AS BIGINT) AS n_valid,
               CAST(1 AS BIGINT) AS n_corrupt
    """,
    doc="Row-level error tolerance (reference per-feature try/except-skip, "
    "process_cycle_networks.py:86-102): PERMISSIVE read routes corrupt "
    "files to _corrupt_record instead of failing the scan; valid rows "
    "keep flowing.",
)
def filter_valid_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    from transit_scrape_spark.sources.geojson import geojson_schema

    d = _corrupt_fixture_dir(spark, sf_dir)
    raw = (
        spark.read.option("multiLine", "true")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .schema(geojson_schema(NATION_PROPS, corrupt_col="_corrupt_record"))
        .json(f"{d}/*.geojson")
        .cache()  # Spark disallows filtering on only the corrupt column otherwise
    )
    n_corrupt = raw.filter(F.col("_corrupt_record").isNotNull()).count()
    valid = read_geojson_features(spark, f"{d}/good.geojson", properties=NATION_PROPS)
    return valid.agg(F.count("*").alias("n_valid")).select(
        "n_valid", F.lit(n_corrupt).cast("long").alias("n_corrupt")
    )


@query(
    "guard-empty",
    oracle="""
        SELECT c_custkey, c_name FROM customer WHERE c_mktsegment = 'NO_SUCH_SEGMENT'
    """,
    doc="Empty-input short-circuit (reference guards "
    "process_cycle_networks.py:45-47, db_helpers.py:215-217): Catalyst's "
    "PropagateEmptyRelation + df.isEmpty() driver gate — returns the "
    "empty frame with intact schema.",
)
def guard_empty(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    out = c.filter(F.col("c_mktsegment") == "NO_SUCH_SEGMENT").select(
        "c_custkey", "c_name"
    )
    # the guard the reference implements imperatively; schema survives
    assert out.isEmpty()
    return out


from transit_scrape_spark.functions.geo_oracle import bng_to_wgs84_oracle_sql

_REPROJ_SRC = """
    SELECT n_nationkey,
           CAST(300000 + n_nationkey * 1000 AS DOUBLE) AS e,
           CAST(600000 + n_nationkey * 1000 AS DOUBLE) AS n
    FROM nation
"""


@query(
    "geo-reproject",
    oracle=bng_to_wgs84_oracle_sql(_REPROJ_SRC),
    doc="EPSG:27700 -> EPSG:4326 reprojection (reference to_crs, "
    "process_cycle_networks.py:112) as an Arrow-vectorized pandas_udf "
    "(numpy inverse TM + Helmert, ~1-5 m vs OSTN15 — golden-point tests "
    "in tests/test_pipelines.py). Oracled by a CTE chain that unrolls "
    "the same iteration (functions/geo_oracle.py) — at 8-decimal "
    "rounding both engines' libm doubles agree.",
)
def geo_reproject(spark: SparkSession, sf_dir: str) -> DataFrame:
    from transit_scrape_spark.functions.geo import reproject_bng_to_wgs84_udf

    rep = reproject_bng_to_wgs84_udf()
    n = load_table(spark, sf_dir, "nation")
    pts = n.select(
        "n_nationkey",
        (300000.0 + F.col("n_nationkey") * 1000).alias("e"),
        (600000.0 + F.col("n_nationkey") * 1000).alias("n"),
    )
    out = pts.withColumn("ll", rep(F.col("e"), F.col("n")))
    return out.select(
        "n_nationkey",
        F.round(F.col("ll.lon"), 8).alias("lon"),
        F.round(F.col("ll.lat"), 8).alias("lat"),
    )


@query(
    "scan-python-datasource",
    oracle="""
        SELECT CAST(region AS INT) AS region,
               CAST(count(*) AS BIGINT) AS n_routes,
               round(sum(CAST((i * 37) % 100000 AS DOUBLE) / 10.0), 2) AS total_len,
               CAST(max(2 + (i * 13) % 40) AS INT) AS max_stops
        FROM (SELECT range AS i, CAST(range % 9 AS INT) AS region FROM range(0, 1000))
        GROUP BY region
    """,
    doc="Custom Python DataSource scan (Spark 4 pyspark.sql.datasource; "
    "reference scrape feed src/scrape.py re-expressed as a partition-"
    "parallel connector, sources/routes_datasource.py): the source "
    "declares 8 InputPartitions, each executor generates its slice, "
    "and the result aggregates like any scan. The oracle regenerates "
    "the deterministic feed from range().",
)
def scan_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    from transit_scrape_spark.sources.routes_datasource import RouteFeedDataSource

    try:
        spark.dataSource.register(RouteFeedDataSource)
    except Exception:
        pass  # already registered in this session
    feed = (
        spark.read.format("route_feed")
        .option("n", "1000")
        .option("numPartitions", "8")
        .load()
    )
    return feed.groupBy("region").agg(
        F.count("*").cast("long").alias("n_routes"),
        F.round(F.sum("length_m"), 2).alias("total_len"),
        F.max("n_stops").alias("max_stops"),
    )


def _partitioned_orders_dir(spark: SparkSession, sf_dir: str) -> str:
    """Hive-layout copy of orders partitioned by order year — the
    directory shape a 100 TB fact table actually has (the reference's
    per-scrape timestamped loads, push_to_db.py:77-88, are the same
    time-partitioned layout one level up)."""

    def build(d: str) -> None:
        (
            load_table(spark, sf_dir, "orders")
            .withColumn("o_year", F.year("o_orderdate"))
            .repartition("o_year")
            .write.mode("overwrite")
            .partitionBy("o_year")
            .parquet(d)
        )

    return fixture_dir("tss_part", sf_dir, build)


def _read_partitioned_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scan the hive-layout orders copy with a DECLARED schema (source
    table columns + the o_year partition column): inference would list
    and foot every file an extra time at scale, and cannot bind at all
    when a partition write legitimately produced zero directories."""
    d = _partitioned_orders_dir(spark, sf_dir)
    sch = (
        load_table(spark, sf_dir, "orders")
        .withColumn("o_year", F.year("o_orderdate"))
        .schema
    )
    return spark.read.schema(sch).parquet(d)


@query(
    "scan-partition-prune",
    oracle="""
        SELECT CAST(extract(month FROM o.o_orderdate) AS BIGINT) AS o_month,
               CAST(count(*) AS BIGINT) AS n_orders,
               CAST(round(sum(CAST(o.o_totalprice AS DECIMAL(18,2))), 2)
                    AS DOUBLE) AS total
        FROM orders o
        WHERE extract(year FROM o.o_orderdate) = 1997
        GROUP BY o_month
        ORDER BY o_month
    """,
    doc="Directory-partition pruning: orders re-materialized in hive "
    "layout (o_year=YYYY/part-*.parquet), then scanned with a "
    "partition-column filter. The filter resolves against directory "
    "names only — PartitionFilters in the scan node, non-matching "
    "years never opened (asserted in test_plan_shapes) — which at "
    "100 TB is the difference between reading one year and reading "
    "the decade. Monthly totals aggregate through DECIMAL(18,2) so "
    "the sum is order-insensitive.",
)
def scan_partition_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _read_partitioned_orders(spark, sf_dir)
        .filter(F.col("o_year") == 1997)
        .groupBy(F.month("o_orderdate").cast("long").alias("o_month"))
        .agg(
            F.count("*").cast("long").alias("n_orders"),
            F.round(F.sum(F.col("o_totalprice").cast("decimal(18,2)")), 2)
            .cast("double")
            .alias("total"),
        )
        .orderBy("o_month")
    )


def _messy_csv_dir(spark: SparkSession, sf_dir: str) -> str:
    """CSV corpus with deliberate damage — the shape real scraped feeds
    arrive in (reference ingests hand-maintained files,
    process_cycle_networks.py:18-40): every 7th row has too few
    columns, every 11th a non-numeric length."""

    def build(d: str) -> None:
        rows = (
            load_table(spark, sf_dir, "nation").orderBy("n_nationkey").collect()
        )
        with open(os.path.join(d, "routes.csv"), "w") as f:
            f.write("route_id,name,length_m\n")
            for r in rows:
                k = r["n_nationkey"]
                nm = r["n_name"] if r["n_name"] is not None else ""
                if k % 7 == 3:
                    f.write(f"{k},{nm}\n")  # missing column
                elif k % 11 == 5:
                    f.write(f"{k},{nm},not-a-number\n")
                else:
                    f.write(f"{k},{nm},{k * 100}.5\n")

    return fixture_dir("tss_csv", sf_dir, build)


@query(
    "scan-csv-robust",
    oracle="""
        SELECT CAST(n_nationkey AS BIGINT) AS route_id,
               n_name AS name,
               CAST(n_nationkey * 100 AS DOUBLE) + 0.5 AS length_m
        FROM nation
        WHERE n_nationkey % 7 <> 3 AND n_nationkey % 11 <> 5
    """,
    doc="Malformed-row-tolerant CSV scan: PERMISSIVE mode with an "
    "explicit schema + columnNameOfCorruptRecord routes short rows and "
    "type-cast failures into a corrupt column instead of failing the "
    "job (or silently nulling), and the clean subset is exactly the "
    "oracle's reconstruction. The distributed analogue of the "
    "reference's per-file try/except ingest loop "
    "(src/push_to_db.py:87-106): damage quarantines per-ROW, the scan "
    "never aborts, and schema is DECLARED, not inferred (inference "
    "costs an extra full read and can flip types between runs).",
)
def scan_csv_robust(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _messy_csv_dir(spark, sf_dir)
    df = (
        spark.read.schema(
            "route_id BIGINT, name STRING, length_m DOUBLE, _bad STRING"
        )
        .option("header", "true")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_bad")
        .csv(d)
        # Spark disallows queries whose pruned schema is ONLY the corrupt
        # column (e.g. a count() over the filtered result); the documented
        # remedy is caching the parsed scan (same as filter-valid-rows).
        # At 100 TB the quarantine split is one pass writing clean and
        # corrupt rows to two sinks, not a cache.
        .cache()
    )
    return df.filter(F.col("_bad").isNull()).select(
        "route_id", "name", "length_m"
    )


def _jsonl_fixture_dir(sf_dir: str) -> str:
    """documents as a 4-file JSONL corpus — the interchange format every
    crawl/annotation pipeline emits; built once per sf_dir content."""
    import json

    import pyarrow.parquet as pq

    def build(d: str) -> None:
        tbl = pq.read_table(os.path.join(sf_dir, "documents.parquet"))
        rows = tbl.to_pylist()
        rows.sort(key=lambda r: r["doc_id"])
        files = [open(os.path.join(d, f"part-{i}.jsonl"), "w") for i in range(4)]
        try:
            for r in rows:
                files[r["doc_id"] % 4].write(
                    json.dumps(r, sort_keys=True, ensure_ascii=False) + "\n"
                )
        finally:
            for f in files:
                f.close()

    return fixture_dir("tss_jsonl", sf_dir, build)


@query(
    "scan-jsonl",
    oracle="""
        SELECT lang,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(n_chars) AS BIGINT) AS total_chars,
               CAST(count(DISTINCT source) AS BIGINT) AS n_sources
        FROM documents
        GROUP BY lang
    """,
    doc="JSON-lines ingestion (the dominant crawl/annotation interchange "
    "format): multi-file parallel scan with an EXPLICIT schema — never "
    "schema inference at scale, which costs a full extra pass over 100 "
    "TB and can mis-type sparse fields; read-back is oracled against "
    "the originating table. Each file is splittable by line, so a "
    "1000-executor cluster fans out within files too.",
)
def scan_jsonl(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _jsonl_fixture_dir(sf_dir)
    docs = spark.read.schema(
        "doc_id long, text string, lang string, source string, n_chars long"
    ).json(f"{d}/*.jsonl")
    return docs.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.countDistinct("source").alias("n_sources"),
    )


@query(
    "sink-parquet-partitioned",
    oracle="""
        SELECT lang,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(n_chars) AS BIGINT) AS total_chars
        FROM documents
        WHERE lang IN ('en', 'fr')
        GROUP BY lang
    """,
    doc="Hive-partitioned parquet sink + partition-pruned read-back: "
    "write documents partitionBy(lang), then read the lang IN "
    "('en','fr') slice — the filter prunes at the DIRECTORY level "
    "(PartitionFilters, zero bytes of other languages read). THE "
    "layout decision for a 100 TB corpus store: partition by "
    "low-cardinality routing keys (lang/source/date), never "
    "high-cardinality ids (small-file explosion); within partitions, "
    "row-group stats prune further.",
)
def sink_parquet_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    def build(d: str) -> None:
        docs = load_table(spark, sf_dir, "documents")
        docs.write.mode("overwrite").partitionBy("lang").parquet(
            os.path.join(d, "docs")
        )

    root = fixture_dir("tss_part_parquet", sf_dir, build)
    # declared read-back schema (same rationale as _read_partitioned_orders)
    back = spark.read.schema(
        load_table(spark, sf_dir, "documents").schema
    ).parquet(os.path.join(root, "docs"))
    return (
        back.filter(F.col("lang").isin("en", "fr"))
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
    )


def _xml_fixture_dir(sf_dir: str) -> str:
    """supplier rows as a 2-file XML corpus (the GTFS/WFS-adjacent feeds
    the reference scrapes are XML-family payloads; constants.py WFS URLs
    request XML feature collections)."""
    from xml.sax.saxutils import escape

    import pyarrow.parquet as pq

    def build(d: str) -> None:
        tbl = pq.read_table(
            os.path.join(sf_dir, "supplier.parquet"),
            columns=["s_suppkey", "s_name", "s_nationkey", "s_acctbal"],
        )
        rows = sorted(tbl.to_pylist(), key=lambda r: r["s_suppkey"])
        half = (len(rows) + 1) // 2
        for i, chunk in enumerate((rows[:half], rows[half:])):
            with open(os.path.join(d, f"suppliers-{i}.xml"), "w") as f:
                f.write("<suppliers>\n")
                for r in chunk:
                    # NULL column -> element omitted entirely (the XML
                    # representation of SQL NULL; emitting 'None' text
                    # would corrupt the typed scan)
                    name = (
                        f"<s_name>{escape(r['s_name'])}</s_name>"
                        if r["s_name"] is not None
                        else ""
                    )
                    bal = (
                        f"<s_acctbal>{r['s_acctbal']!r}</s_acctbal>"
                        if r["s_acctbal"] is not None
                        else ""
                    )
                    f.write(
                        "  <supplier>"
                        f"<s_suppkey>{r['s_suppkey']}</s_suppkey>"
                        f"{name}"
                        f"<s_nationkey>{r['s_nationkey']}</s_nationkey>"
                        f"{bal}"
                        "</supplier>\n"
                    )
                f.write("</suppliers>\n")

    return fixture_dir("tss_xml", sf_dir, build)


@query(
    "scan-xml",
    oracle="""
        SELECT CAST(s_nationkey AS BIGINT) AS s_nationkey,
               CAST(count(*) AS BIGINT) AS n_suppliers,
               round(sum(s_acctbal), 2) AS total_bal
        FROM supplier
        GROUP BY s_nationkey
    """,
    doc="Native XML ingestion (Spark 4 built-in xml source, rowTag "
    "record splitting) with an explicit schema — the feed format of "
    "the reference's WFS endpoints (constants.py XML feature "
    "collections). Multi-file parallel scan oracled against the "
    "originating table; at scale prefer converting XML feeds to "
    "parquet at the edge since XML is not splittable within a file — "
    "parallelism here comes from the file count.",
)
def scan_xml(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _xml_fixture_dir(sf_dir)
    sup = (
        spark.read.format("xml")
        .option("rowTag", "supplier")
        .schema("s_suppkey long, s_name string, s_nationkey long, s_acctbal double")
        .load(f"{d}/*.xml")
    )
    return sup.groupBy("s_nationkey").agg(
        F.count("*").alias("n_suppliers"),
        F.round(F.sum("s_acctbal"), 2).alias("total_bal"),
    )


@query(
    "sink-python-datasource",
    oracle="""
        SELECT lang,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(n_chars) AS BIGINT) AS total_chars
        FROM documents
        GROUP BY lang
    """,
    doc="Custom Python data SINK (Spark 4 DataSourceWriter, "
    "sources/routes_datasource.py JsonlSinkDataSource): executors "
    "write their partitions to staging files and return commit "
    "messages; the driver commits atomically only after every "
    "partition succeeds (abort discards staging) — the two-phase "
    "commit protocol production sinks need for exactly-once semantics "
    "over non-transactional targets. Read-back is oracled against the "
    "source table. The write-side twin of scan-python-datasource: "
    "together they close SURVEY §2.11's custom-connector surface.",
)
def sink_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    from transit_scrape_spark.sources.routes_datasource import JsonlSinkDataSource

    try:
        spark.dataSource.register(JsonlSinkDataSource)
    except Exception:
        pass  # already registered in this session

    def build(d: str) -> None:
        docs = load_table(spark, sf_dir, "documents").select(
            "doc_id", "lang", "n_chars"
        )
        docs.repartition(4).write.format("jsonl_sink").mode("append").option(
            "path", d
        ).save()

    root = fixture_dir("tss_pysink", sf_dir, build)
    back = spark.read.schema("doc_id long, lang string, n_chars long").json(
        f"{root}/data/*.jsonl"
    )
    return back.groupBy("lang").agg(
        F.count("*").alias("n_docs"), F.sum("n_chars").alias("total_chars")
    )


@query(
    "scan-dynamic-partition-prune",
    oracle="""
        WITH picked AS (
            SELECT DISTINCT CAST(extract(year FROM o_orderdate) AS INTEGER) AS yr
            FROM orders
            WHERE o_orderkey % 97 = 0 AND extract(year FROM o_orderdate) >= 1996
        )
        SELECT CAST(extract(year FROM o.o_orderdate) AS INTEGER) AS o_year,
               CAST(count(*) AS BIGINT) AS n_orders
        FROM orders o
        JOIN picked p ON CAST(extract(year FROM o.o_orderdate) AS INTEGER) = p.yr
        GROUP BY 1
    """,
    doc="DYNAMIC partition pruning: the years to scan come from a "
    "runtime-computed dim (not a literal), so static pruning can't "
    "apply — Spark instead injects the dim's key set as a subquery "
    "filter on the fact's PARTITION column at execution time "
    "(dynamicpruning expression in the scan, asserted in "
    "test_plan_shapes). The star-schema workhorse at 100 TB: 'join "
    "facts to the date dim WHERE week = last' prunes the fact scan to "
    "days the dim selects, without the query author naming them.",
)
def scan_dynamic_partition_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    fact = _read_partitioned_orders(spark, sf_dir)
    picked = (
        load_table(spark, sf_dir, "orders")
        .filter((F.col("o_orderkey") % 97 == 0) & (F.year("o_orderdate") >= 1996))
        .select(F.year("o_orderdate").cast("int").alias("yr"))
        .distinct()
    )
    return (
        fact.join(picked, fact.o_year == picked.yr)
        .groupBy(F.col("o_year").cast("int").alias("o_year"))
        .agg(F.count("*").alias("n_orders"))
    )


def _gzip_csv_dir(spark: SparkSession, sf_dir: str) -> str:
    """region table as 4 gzip-compressed CSV shards (the hand-off format
    scraped feeds actually arrive in)."""
    import csv
    import gzip

    import pyarrow.parquet as pq

    def build(d: str) -> None:
        tbl = pq.read_table(os.path.join(sf_dir, "nation.parquet"))
        rows = sorted(tbl.to_pylist(), key=lambda r: r["n_nationkey"])
        shards = [
            [r for r in rows if r["n_nationkey"] % 4 == i] for i in range(4)
        ]
        for i, shard in enumerate(shards):
            with gzip.open(
                os.path.join(d, f"nation-{i}.csv.gz"), "wt", newline=""
            ) as f:
                w = csv.writer(f)
                w.writerow(["n_nationkey", "n_name", "n_regionkey"])
                for r in shard:
                    w.writerow([r["n_nationkey"], r["n_name"], r["n_regionkey"]])

    return fixture_dir("tss_gzcsv", sf_dir, build)


@query(
    "scan-compressed-csv",
    oracle="""
        SELECT CAST(n_regionkey AS BIGINT) AS n_regionkey,
               CAST(count(*) AS BIGINT) AS n_nations,
               min(n_name) AS first_name
        FROM nation
        GROUP BY n_regionkey
    """,
    doc="Gzip CSV ingestion (codec inferred from the .gz extension, "
    "explicit schema, header skip): the hand-off format scraped feeds "
    "arrive in. THE operational caveat this op documents: gzip is NOT "
    "splittable — each .gz file is one task no matter its size, so a "
    "single 50 GB gzip feed serializes a 1000-executor cluster to one "
    "core. Parallelism here comes only from the file count (4 shards "
    "-> 4 tasks); the first job against such feeds should be exactly "
    "this scan + a rewrite to splittable storage (zstd parquet, "
    "sink-compaction's sizing).",
)
def scan_compressed_csv(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _gzip_csv_dir(spark, sf_dir)
    df = (
        spark.read.schema("n_nationkey long, n_name string, n_regionkey long")
        .option("header", "true")
        .csv(f"{d}/*.csv.gz")
    )
    return df.groupBy("n_regionkey").agg(
        F.count("*").alias("n_nations"),
        F.min("n_name").alias("first_name"),
    )


def _range_layout_dir(spark: SparkSession, sf_dir: str) -> str:
    """orders re-written in range layout: repartitionByRange(8, custkey)
    + sortWithinPartitions — each file owns a contiguous custkey range,
    so row-group min/max stats answer key-range probes."""

    def build(d: str) -> None:
        (
            load_table(spark, sf_dir, "orders")
            .repartitionByRange(8, "o_custkey")
            .sortWithinPartitions("o_custkey")
            .write.parquet(os.path.join(d, "orders"))
        )

    return fixture_dir("tss_rangelayout", sf_dir, build)


@query(
    "sink-range-partitioned",
    oracle="""
        SELECT CAST(count(*) AS BIGINT) AS n_orders,
               CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_customers,
               CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE)
                   AS total
        FROM orders
        WHERE o_custkey BETWEEN 1000 AND 2000
    """,
    doc="Range-layout sink + key-range probe: orders rewritten via "
    "repartitionByRange(custkey) + sortWithinPartitions, so each "
    "output file owns a contiguous, SORTED key range — a BETWEEN "
    "probe then skips most files on parquet footer min/max stats and "
    "most row groups within the hit files (the sort is what tightens "
    "per-row-group bounds). The third layout lever beside hash "
    "partitioning (co-located joins) and Z-order (two-dimensional "
    "pruning): choose range layout when the dominant predicate is a "
    "range on ONE key — time-series ids, customer ranges, pk lookups.",
)
def sink_range_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _range_layout_dir(spark, sf_dir)
    back = spark.read.parquet(os.path.join(d, "orders"))
    return back.filter(F.col("o_custkey").between(1000, 2000)).agg(
        F.count("*").alias("n_orders"),
        F.countDistinct("o_custkey").alias("n_customers"),
        F.round(F.sum(F.col("o_totalprice").cast("decimal(18,2)")), 2)
        .cast("double")
        .alias("total"),
    )


# --- WFS source (the reference pipeline's front door) -------------------------

def _wfs_fixture_dir(spark: SparkSession, sf_dir: str) -> str:
    """Canned WFS 2.0 GetFeature response (GeoServer-style JSON envelope:
    totalFeatures/numberMatched/numberReturned/timeStamp/crs around a
    FeatureCollection), derived deterministically from `nation`."""
    import json

    def build(d: str) -> None:
        rows = load_table(spark, sf_dir, "nation").orderBy("n_nationkey").collect()
        feats = []
        for r in rows:
            k = r["n_nationkey"]
            feats.append(
                {
                    "type": "Feature",
                    "id": f"nation.{k}",
                    "geometry": {
                        "type": "LineString",
                        "coordinates": [
                            [float((k * 17) % 700000), float((k * 31) % 1000000)],
                            [float((k * 17 + 500) % 700000), float((k * 31 + 800) % 1000000)],
                        ],
                    },
                    "geometry_name": "geom",
                    "properties": {
                        "n_nationkey": k,
                        "n_name": r["n_name"],
                        "n_regionkey": r["n_regionkey"],
                    },
                }
            )
        doc = {
            "type": "FeatureCollection",
            "features": feats,
            "totalFeatures": len(feats),
            "numberMatched": len(feats),
            "numberReturned": len(feats),
            "timeStamp": "2024-01-01T00:00:00Z",
            "crs": {"type": "name", "properties": {"name": "urn:ogc:def:crs:EPSG::27700"}},
        }
        with open(os.path.join(d, "getfeature_response.json"), "w") as f:
            json.dump(doc, f)

    return fixture_dir("tss_wfs", sf_dir, build)


@query(
    "source-wfs",
    oracle="""
        SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey, n_name,
               CAST(n_regionkey AS BIGINT) AS n_regionkey,
               'LineString' AS geometry_type,
               CAST(2 AS BIGINT) AS n_points,
               'wfs_getfeature.geojson' AS source_file
        FROM nation
    """,
    doc="WFS GetFeature source (the reference pipeline's front door; its "
    "dead endpoint constant is /root/reference/src/utils/constants.py:1-3 "
    "— in practice its inputs arrive as files, exactly what this op "
    "models): build_getfeature_url() constructs the WFS 2.0 request, "
    "fetch_wfs_to_geojson() lands the response (offline here via a "
    "file:// transport over a canned GeoServer-style GetFeature "
    "envelope; swap the scheme for https against a live server), and "
    "the landed document feeds the ordinary distributed scan-geojson "
    "path — extra envelope keys (totalFeatures/crs/timeStamp) are "
    "ignored by schema shape. Driver-side fetch + distributed parse is "
    "the right split at scale: the fetch is one HTTP response, the "
    "parse/flatten/downstream joins are the data-parallel work.",
)
def source_wfs(spark: SparkSession, sf_dir: str) -> DataFrame:
    import uuid

    from transit_scrape_spark.sources.wfs import (
        build_getfeature_url,
        fetch_wfs_to_geojson,
    )

    d = _wfs_fixture_dir(spark, sf_dir)
    canned = os.path.join(d, "getfeature_response.json")
    url = build_getfeature_url(f"file://{canned}", "tss:nation")
    staged = os.path.join(d, "wfs_getfeature.geojson")
    if not os.path.exists(staged):
        # fetch to a temp name, then atomically publish — a concurrent
        # session sees either nothing (and fetches its own) or all of it
        tmp = f"{staged}.tmp-{uuid.uuid4().hex[:8]}"
        fetch_wfs_to_geojson(url, tmp)
        os.replace(tmp, staged)
    feats = read_geojson_features(spark, staged, properties=NATION_PROPS)
    return feats.select(
        F.col("n_nationkey").cast("long").alias("n_nationkey"),
        "n_name",
        F.col("n_regionkey").cast("long").alias("n_regionkey"),
        "geometry_type",
        F.size("coordinates").cast("long").alias("n_points"),
        "source_file",
    )


@query(
    "sink-orc-roundtrip",
    oracle="""
        SELECT c_mktsegment,
               CAST(count(*) AS BIGINT) AS n,
               round(sum(c_acctbal), 2) AS total_bal
        FROM customer
        WHERE c_acctbal > 0
        GROUP BY c_mktsegment
    """,
    doc="ORC write + read round-trip (the reference's sink surface is "
    "Postgres-only, db_helpers.py:94-123; a Spark warehouse speaks "
    "both columnar formats): positive-balance customers written to a "
    "content-keyed ORC fixture with the same predicate-pushdown/"
    "column-pruning properties as parquet (ORC carries min/max strides "
    "+ bloom indexes), read back and aggregated. The oracle aggregates "
    "the original table — the round-trip must be lossless including "
    "double precision.",
)
def sink_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from transit_scrape_spark.sources.fixtures import fixture_dir

    def build(d: str) -> None:
        (
            load_table(spark, sf_dir, "customer")
            .filter(F.col("c_acctbal") > 0)
            .write.mode("overwrite")
            .orc(f"{d}/data")
        )

    path = fixture_dir("tss_orc", sf_dir, build) + "/data"
    back = spark.read.orc(path)
    return back.groupBy("c_mktsegment").agg(
        F.count("*").cast("long").alias("n"),
        F.round(F.sum("c_acctbal"), 2).alias("total_bal"),
    )


@query(
    "scan-binary-file",
    oracle="""
        WITH sel AS (
            -- binaryFile SKIPS zero-byte files (verified: an empty .bin
            -- never appears in the scan) — a real ingest hazard at scale
            -- (empty blobs vanish silently); the oracle pins the same
            -- exclusion
            SELECT doc_id, text FROM documents
            WHERE doc_id % 50 = 0 AND octet_length(encode(text)) > 0
        )
        SELECT doc_id,
               CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
               -- byte slice via hex (codepoint substring would overshoot
               -- on multibyte hostile text)
               substring(lower(hex(encode(text))), 1, 16) AS head_hex
        FROM sel ORDER BY doc_id
    """,
    doc="Spark's binaryFile datasource (the whole-file ingest path for "
    "media/model-artifact lakes): a handful of fixture documents "
    "are materialized as raw .bin files, then read back via "
    "format('binaryFile'), which yields (path, modificationTime, "
    "length, content) with the CONTENT as a single BinaryType "
    "cell per file — the right source when files are opaque blobs "
    "(images, audio, checkpoints) rather than rows; pathGlobFilter "
    "and recursiveFileLookup prune at listing time. doc_id parses "
    "back out of the file name; mtime is excluded (non-"
    "deterministic), and length/content must round-trip exactly "
    "against the oracle's view of the source text. At scale each "
    "file is one task — binaryFile shines for many-small-files "
    "ingest feeding a mapInPandas decode like "
    "multimodal-decode's.",
)
def scan_binary_file(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    d = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 50 == 0
    )
    target = f"/tmp/tss_binfiles_{_tag(sf_dir)}_{os.getpid()}"
    if not os.path.exists(target):
        os.makedirs(target, exist_ok=True)
        for row in d.select("doc_id", "text").collect():
            # NULL text has no bytes to write, and a zero-byte file would
            # be skipped by binaryFile anyway (pinned in the oracle)
            if not row["text"]:
                continue
            with open(
                os.path.join(target, f"doc_{row['doc_id']:08d}.bin"), "wb"
            ) as fh:
                fh.write(row["text"].encode("utf-8"))
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.bin")
        .load(target)
    )
    return (
        files.select(
            F.regexp_extract(
                F.col("path"), r"doc_(\d+)\.bin$", 1
            ).cast("long").alias("doc_id"),
            F.col("length").cast("long").alias("byte_len"),
            F.lower(F.hex(F.substring(F.col("content"), 1, 8))).alias(
                "head_hex"
            ),
        )
        .orderBy("doc_id")
    )


def _jsonl_bad_fixture_dir(sf_dir: str) -> str:
    """JSONL corpus with DETERMINISTIC damage: every doc_id % 7 == 3
    line is truncated mid-record (unclosed JSON) — the corpus a real
    crawl hand-off actually looks like."""
    import json

    import pyarrow.parquet as pq

    def build(d: str) -> None:
        tbl = pq.read_table(os.path.join(sf_dir, "documents.parquet"))
        rows = tbl.to_pylist()
        rows.sort(key=lambda r: r["doc_id"])
        files = [open(os.path.join(d, f"part-{i}.jsonl"), "w") for i in range(4)]
        try:
            for r in rows:
                line = json.dumps(r, sort_keys=True, ensure_ascii=False)
                if r["doc_id"] % 7 == 3:
                    line = line[: max(10, len(line) // 2)]
                files[r["doc_id"] % 4].write(line + "\n")
        finally:
            for f in files:
                f.close()

    return fixture_dir("tss_jsonl_bad", sf_dir, build)


@query(
    "scan-jsonl-quarantine",
    oracle="""
        SELECT lang,
               CAST(sum(CASE WHEN doc_id % 7 <> 3 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_good,
               CAST(sum(n_chars) FILTER (doc_id % 7 <> 3) AS BIGINT)
                   AS total_chars
        FROM documents
        GROUP BY lang
        UNION ALL
        SELECT '_corrupt',
               CAST(sum(CASE WHEN doc_id % 7 = 3 THEN 1 ELSE 0 END)
                    AS BIGINT),
               CAST(0 AS BIGINT)
        FROM documents
    """,
    doc="Malformed-line-tolerant JSONL scan: PERMISSIVE mode with an "
    "explicit schema + columnNameOfCorruptRecord quarantines "
    "truncated/unparseable lines into a corrupt column while clean "
    "lines parse normally — the job never aborts and damage is "
    "accounted, not silently dropped (the JSONL sibling of "
    "scan-csv-robust's CSV contract, and what a 100 TB crawl "
    "ingest needs when 0.1%% of a billion lines are cut mid-"
    "record). Output: per-language clean counts plus a '_corrupt' "
    "ledger row; the oracle reconstructs both from the originating "
    "table and the deterministic damage rule (doc_id %% 7 == 3).",
)
def scan_jsonl_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _jsonl_bad_fixture_dir(sf_dir)
    docs = spark.read.schema(
        "doc_id long, text string, lang string, source string, "
        "n_chars long, _bad string"
    ).option("mode", "PERMISSIVE").option(
        "columnNameOfCorruptRecord", "_bad"
    ).json(f"{d}/*.jsonl")
    # one labeled pass: Spark forbids corrupt-column-ONLY queries
    # (QUERY_ONLY_CORRUPT_RECORD_COLUMN), so the ledger row comes from
    # the same aggregation as the per-language counts
    labeled = docs.select(
        F.when(F.col("_bad").isNull(), F.col("lang"))
        .otherwise(F.lit("_corrupt"))
        .alias("lang"),
        F.when(F.col("_bad").isNull(), F.col("n_chars"))
        .otherwise(F.lit(0))
        .alias("nc"),
    )
    return labeled.groupBy("lang").agg(
        F.count("*").cast("long").alias("n_good"),
        F.sum("nc").cast("long").alias("total_chars"),
    )


@query(
    "sink-xml-roundtrip",
    oracle="""
        SELECT CAST(c_nationkey AS BIGINT) AS c_nationkey,
               CAST(count(*) AS BIGINT) AS n_customers,
               round(sum(c_acctbal), 2) AS total_bal
        FROM customer
        GROUP BY c_nationkey
    """,
    doc="Native XML SINK + read-back roundtrip (Spark 4 built-in xml "
    "writer, rowTag record framing): customers written as an XML "
    "feed, re-read with an explicit schema, and the aggregate "
    "oracled against the originating table — proving the writer "
    "emits what the reader parses (escaping, nulls, numeric "
    "round-trip). The export half of scan-xml's ingest: legacy "
    "B2B/ERP integrations still consume XML feeds, and the writer "
    "distributes one file per partition. Same caveat at scale: XML "
    "is an edge format — produce it at the boundary, never as an "
    "intermediate.",
)
def sink_xml_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    def build(d: str) -> None:
        cust = load_table(spark, sf_dir, "customer").select(
            "c_custkey", "c_nationkey", "c_acctbal"
        )
        cust.write.mode("overwrite").format("xml").option(
            "rowTag", "customer"
        ).option("rootTag", "customers").save(os.path.join(d, "xml"))

    root = fixture_dir("tss_xml_sink", sf_dir, build)
    back = (
        spark.read.format("xml")
        .option("rowTag", "customer")
        .schema("c_custkey long, c_nationkey long, c_acctbal double")
        .load(os.path.join(root, "xml"))
    )
    return back.groupBy("c_nationkey").agg(
        F.count("*").cast("long").alias("n_customers"),
        F.round(F.sum("c_acctbal"), 2).alias("total_bal"),
    )


def _multichar_csv_dir(spark: SparkSession, sf_dir: str) -> str:
    """nation exported with a '||' delimiter — the legacy-feed format
    single-char-delimiter parsers mangle (names contain commas)."""

    def build(d: str) -> None:
        rows = (
            load_table(spark, sf_dir, "nation").orderBy("n_nationkey").collect()
        )
        with open(os.path.join(d, "nation.csv"), "w") as f:
            f.write("n_nationkey||n_name||n_regionkey\n")
            for r in rows:
                f.write(f"{r['n_nationkey']}||{r['n_name']}||{r['n_regionkey']}\n")

    return fixture_dir("tss_multichar_csv", sf_dir, build)


@query(
    "scan-csv-multichar-delim",
    oracle="""
        SELECT CAST(n_regionkey AS BIGINT) AS n_regionkey,
               CAST(count(*) AS BIGINT) AS n_nations,
               min(n_name) AS first_name
        FROM nation
        GROUP BY n_regionkey
    """,
    doc="Multi-character-delimiter CSV ingestion (sep='||'): legacy "
    "ERP/mainframe feeds use multi-char delimiters precisely "
    "because the payload contains every single character; Spark's "
    "CSV reader takes the multi-char sep natively (since 3.0) with "
    "an explicit schema, no preprocessing pass. Read-back "
    "aggregate oracled against the originating table. The "
    "delimiter sibling of scan-csv-robust (damage tolerance) and "
    "scan-compressed-csv (codec) — together the three knobs "
    "real CSV feeds actually vary.",
)
def scan_csv_multichar_delim(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _multichar_csv_dir(spark, sf_dir)
    df = (
        spark.read.schema("n_nationkey long, n_name string, n_regionkey long")
        .option("header", "true")
        .option("sep", "||")
        .csv(f"{d}/nation.csv")
    )
    return df.groupBy("n_regionkey").agg(
        F.count("*").cast("long").alias("n_nations"),
        F.min("n_name").alias("first_name"),
    )


@query(
    "sink-parquet-bloom",
    oracle="""
        SELECT CAST(count(*) AS BIGINT) AS n_rows,
               round(sum(o_totalprice), 2) AS total
        FROM orders
        WHERE o_custkey = 371
    """,
    doc="Parquet sink with COLUMN BLOOM FILTERS "
    "(parquet.bloom.filter.enabled#o_custkey) + point-lookup "
    "read-back: row-group min/max stats prune RANGE predicates but "
    "do nothing for a point lookup on an unsorted high-cardinality "
    "key — the per-row-group bloom filter is the layout feature "
    "that lets the reader skip row groups for `key = x` probes "
    "with no sort and ~1% storage overhead (the complement of "
    "layout-zorder-key, which EARNS min/max pruning by "
    "clustering). Write once with the option, read back with the "
    "point predicate, oracle against the originating table.",
)
def sink_parquet_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    def build(d: str) -> None:
        o = load_table(spark, sf_dir, "orders")
        (
            o.write.mode("overwrite")
            .option("parquet.bloom.filter.enabled#o_custkey", "true")
            .option("parquet.bloom.filter.expected.ndv#o_custkey", "20000")
            .parquet(os.path.join(d, "orders"))
        )

    root = fixture_dir("tss_bloom_parquet", sf_dir, build)
    back = spark.read.parquet(os.path.join(root, "orders"))
    return back.filter(F.col("o_custkey") == 371).agg(
        F.count("*").cast("long").alias("n_rows"),
        F.round(F.sum("o_totalprice"), 2).alias("total"),
    )


def _nested_parquet_dir(spark: SparkSession, sf_dir: str) -> str:
    """documents re-laid-out with a nested struct column — the shape
    every crawl/annotation parquet actually has (payload + metadata
    struct), for exercising NESTED schema pruning."""

    def build(d: str) -> None:
        docs = load_table(spark, sf_dir, "documents")
        nested = docs.select(
            "doc_id",
            "text",
            F.struct(
                F.col("lang").alias("lang"),
                F.col("source").alias("source"),
                F.col("n_chars").alias("n_chars"),
            ).alias("meta"),
        )
        nested.write.mode("overwrite").parquet(os.path.join(d, "docs"))

    return fixture_dir("tss_nested_parquet", sf_dir, build)


@query(
    "scan-nested-schema-prune",
    oracle="""
        SELECT lang,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(n_chars) AS BIGINT) AS total_chars
        FROM documents
        GROUP BY lang
    """,
    doc="NESTED schema pruning: documents stored with a "
    "struct<lang,source,n_chars> metadata column, query touches "
    "only meta.lang and meta.n_chars — Catalyst's nested-column "
    "pruning (spark.sql.optimizer.nestedSchemaPruning.enabled, on "
    "by default) pushes a ReadSchema of just those two LEAF fields "
    "into the parquet scan, so the text payload and meta.source "
    "bytes are never decoded. On a 100 TB corpus whose payload "
    "dominates row size this is the difference between a metadata "
    "query costing 2% or 100% of a full scan; flat-column pruning "
    "(every other scan op) is the degenerate case. Write-once "
    "fixture, read-back aggregate oracled against the flat "
    "original.",
)
def scan_nested_schema_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _nested_parquet_dir(spark, sf_dir)
    back = spark.read.parquet(os.path.join(d, "docs"))
    return back.groupBy(F.col("meta.lang").alias("lang")).agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("meta.n_chars").cast("long").alias("total_chars"),
    )
