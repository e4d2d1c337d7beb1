"""GeoJSON source (SURVEY.md §2.1 scan-geojson / scan-glob).

Re-expresses the reference's whole-file ``json.load`` + feature-list
normalization + ``GeoDataFrame.from_features``
(``/root/reference/src/process_cycle_networks.py:18-55``) as one
distributed ``spark.read.json`` plan:

- ``multiLine=true`` because a GeoJSON document is one JSON value.
- Polymorphic envelope (FeatureCollection / bare [Feature,...] / single
  Feature — reference branching at :36-43) handled by schema shape.
- Corrupt files -> ``_corrupt_record`` (PERMISSIVE), mirroring the
  reference's try/except->None (:53-55) without killing the job.
- A directory/glob path replaces the reference's sequential per-file
  loop (``push_to_db.py:77-88``): one scan, partitioned across
  executors; ``input_file_name()`` preserves per-file provenance.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def geojson_schema(properties: str, corrupt_col: str | None = None) -> T.StructType:
    """Declared polymorphic-envelope schema for a GeoJSON scan.

    ``properties`` is a DDL fragment for the feature property keys
    (e.g. ``"n_nationkey BIGINT, n_name STRING"``). The returned schema
    declares BOTH envelope shapes (``features`` array for a
    FeatureCollection, top-level ``properties``/``geometry`` for bare
    Features), so the same null-routing branches below work unchanged.

    Why declare instead of infer: at 100 TB schema inference is an extra
    full pass over the corpus, can flip types between runs on sparse
    keys, and cannot bind at all on a legitimately-empty input (an empty
    ``features`` array infers to nothing flattenable) — the declared
    schema makes the scan total on quiet-day inputs.
    """
    prop_t = T.StructType.fromDDL(properties)
    geom_t = T.StructType(
        [
            T.StructField("type", T.StringType()),
            T.StructField("coordinates", T.ArrayType(T.ArrayType(T.DoubleType()))),
        ]
    )
    feat_t = T.StructType(
        [
            T.StructField("type", T.StringType()),
            T.StructField("properties", prop_t),
            T.StructField("geometry", geom_t),
        ]
    )
    fields = [
        T.StructField("type", T.StringType()),
        T.StructField("features", T.ArrayType(feat_t)),
        T.StructField("properties", prop_t),
        T.StructField("geometry", geom_t),
    ]
    if corrupt_col is not None:
        fields.append(T.StructField(corrupt_col, T.StringType()))
    return T.StructType(fields)


def read_geojson_features(
    spark: SparkSession,
    path: str,
    multiline: bool = True,
    properties: str | None = None,
) -> DataFrame:
    """Read GeoJSON file(s)/glob -> one row per feature.

    Output columns: every property key (flattened), plus
    ``geometry_type``, ``coordinates`` (LineString: array<array<double>>),
    and ``source_file`` (basename, reference process_cycle_networks.py:95).

    ``properties`` (DDL fragment of the property keys) switches the scan
    from inference to the declared envelope schema — see
    :func:`geojson_schema` for why that is the only correct mode at
    scale. Inference remains for ad-hoc exploration.
    """
    reader = spark.read.option("multiLine", "true" if multiline else "false")
    if properties is not None:
        reader = reader.schema(geojson_schema(properties))
    raw = reader.json(path)
    cols = set(raw.columns)

    def _flatten(feats: DataFrame) -> DataFrame:
        return feats.select(
            "f.properties.*",
            F.col("f.geometry.type").alias("geometry_type"),
            F.col("f.geometry.coordinates").alias("coordinates"),
            F.element_at(F.split(F.col("_path"), "/"), -1).alias("source_file"),
        )

    parts: list[DataFrame] = []
    if "features" in cols:
        # FeatureCollection envelope (reference :36-38)
        parts.append(
            _flatten(
                raw.filter(F.col("features").isNotNull()).select(
                    F.explode("features").alias("f"),
                    F.input_file_name().alias("_path"),
                )
            )
        )
    if "geometry" in cols or "properties" in cols:
        # single Feature or bare [Feature, ...] (reference :39-43 —
        # spark.read.json already returns one row per array element).
        # A mixed multi-file scan hits BOTH branches; the null filters
        # route each row to the branch matching its file's shape.
        direct = raw
        if "features" in cols:
            direct = direct.filter(F.col("features").isNull())
        parts.append(
            _flatten(
                direct.filter(F.col("geometry").isNotNull()).select(
                    F.struct(*[c for c in raw.columns if c != "features"]).alias("f"),
                    F.input_file_name().alias("_path"),
                )
            )
        )
    if not parts:
        raise ValueError(f"not a recognizable GeoJSON shape: columns={sorted(cols)}")

    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p, allowMissingColumns=True)
    return out
