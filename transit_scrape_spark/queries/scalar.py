"""Scalar-function surface (SURVEY.md §2.2, §2.9): string / date / math /
map / JSON projections, schema alignment, and the OS-grid-reference
function — all pure built-in Column expressions (whole-stage codegen;
zero Python UDFs in any of these paths).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from transit_scrape_spark.functions.gridref import (
    os_grid_reference,
    os_grid_reference_oracle_sql,
)
from transit_scrape_spark.queries.registry import query
from transit_scrape_spark.sources.tables import load_table


@query(
    "proj-string-funcs",
    oracle="""
        SELECT doc_id,
               upper(lang) AS lang_uc,
               CAST(length(text) AS BIGINT) AS n_chars_computed,
               substring(text, 1, 20) AS head,
               source || ':' || lang AS source_lang,
               replace(lang, 'e', 'E') AS lang_sub
        FROM documents
    """,
    doc="String scalar battery (reference f-string assembly app/app.py:124-131, "
    "geotiles rjust/indexing) — upper/length/substring/concat/replace.",
)
def proj_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.upper("lang").alias("lang_uc"),
        F.length("text").cast("long").alias("n_chars_computed"),
        F.substring("text", 1, 20).alias("head"),
        F.concat(F.col("source"), F.lit(":"), F.col("lang")).alias("source_lang"),
        F.replace(F.col("lang"), F.lit("e"), F.lit("E")).alias("lang_sub"),
    )


@query(
    "fn-basename-splitext",
    oracle="""
        SELECT doc_id,
               path,
               list_extract(string_split(path, '/'), -1) AS basename,
               regexp_replace(list_extract(string_split(path, '/'), -1),
                              '\\.[^.]+$', '') AS stem
        FROM (SELECT doc_id, 'data/raw/' || source || '/doc_'
                             || CAST(doc_id AS VARCHAR) || '.geojson' AS path
              FROM documents)
    """,
    doc="basename/splitext provenance derivation (reference "
    "process_cycle_networks.py:95,145) via split/element_at/regexp_replace.",
)
def fn_basename_splitext(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    path = F.concat(
        F.lit("data/raw/"), F.col("source"), F.lit("/doc_"),
        F.col("doc_id").cast("string"), F.lit(".geojson"),
    )
    base = F.element_at(F.split(path, "/"), -1)
    return d.select(
        "doc_id",
        path.alias("path"),
        base.alias("basename"),
        F.regexp_replace(base, r"\.[^.]+$", "").alias("stem"),
    )


@query(
    "fn-date-funcs",
    oracle="""
        SELECT o_orderkey,
               strftime(o_orderdate, '%Y%m%d_%H%M%S') AS stamp,
               CAST(year(o_orderdate) AS BIGINT) AS yr,
               CAST(month(o_orderdate) AS BIGINT) AS mo,
               CAST(date_part('day', o_orderdate) AS BIGINT) AS dom,
               CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
               CAST(o_orderdate + INTERVAL 30 DAY AS TIMESTAMP) AS due_ts
        FROM orders
    """,
    doc="Date/time scalar battery (reference strftime %Y%m%d_%H%M%S naming "
    "process_cycle_networks.py:146; now() defaults db_models.py:54-55).",
)
def fn_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.date_format("o_orderdate", "yyyyMMdd_HHmmss").alias("stamp"),
        F.year("o_orderdate").cast("long").alias("yr"),
        F.month("o_orderdate").cast("long").alias("mo"),
        F.dayofmonth("o_orderdate").cast("long").alias("dom"),
        F.date_trunc("month", F.col("o_orderdate")).alias("month_start"),
        (F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")).alias("due_ts"),
    )


@query(
    "fn-math-funcs",
    oracle="""
        SELECT l_orderkey, l_linenumber,
               l_extendedprice * (1 - l_discount) AS net_price,
               CAST(floor(l_extendedprice / 1000) AS BIGINT) AS price_bucket,
               CAST(l_partkey % 97 AS BIGINT) AS pmod97,
               -- sqrt undefined for hostile negative quantities: NULL on
               -- both engines (Spark would emit NaN, DuckDB hard-errors)
               CASE WHEN l_quantity >= 0
                    THEN round(sqrt(l_quantity), 6) END AS sqrt_qty,
               round(pow(l_discount, 2), 8) AS disc_sq,
               abs(l_quantity - 25) AS dev_from_25
        FROM lineitem
    """,
    doc="Math scalar battery (reference floor/% geotiles.py:24-43, round "
    "app/app.py:130, sqrt/pow length math process_cycle_networks.py:88).",
)
def fn_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("net_price"),
        F.floor(F.col("l_extendedprice") / 1000).alias("price_bucket"),
        (F.col("l_partkey") % 97).alias("pmod97"),
        F.round(
            F.when(F.col("l_quantity") >= 0, F.sqrt("l_quantity")), 6
        ).alias("sqrt_qty"),
        F.round(F.pow("l_discount", F.lit(2)), 8).alias("disc_sq"),
        F.abs(F.col("l_quantity") - 25).alias("dev_from_25"),
    )


@query(
    "fn-format-popup",
    oracle="""
        SELECT event_id,
               concat('<b>Event:</b> ', coalesce(event_type, 'N/A'),
                      '<br><b>User:</b> ', CAST(user_id AS VARCHAR),
                      '<br><b>Value:</b> ',
                      -- render via DECIMAL so both engines print plain
                      -- notation: Spark's double->string flips to
                      -- scientific at 1e7 (hostile magnitudes), DuckDB's
                      -- never does
                      coalesce(CAST(CAST(round(value, 2) AS DECIMAL(38,2))
                                    AS VARCHAR), 'N/A'))
                   AS popup
        FROM events
    """,
    doc="Per-row HTML popup interpolation with N/A defaults (reference "
    "app/app.py:124-131) as concat + coalesce — codegen, no Python loop.",
)
def fn_format_popup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.concat(
            F.lit("<b>Event:</b> "),
            F.coalesce(F.col("event_type"), F.lit("N/A")),
            F.lit("<br><b>User:</b> "), F.col("user_id").cast("string"),
            F.lit("<br><b>Value:</b> "),
            # decimal render: double->string is scientific >= 1e7 on Spark
            # but never on DuckDB — pin plain notation on both engines
            F.coalesce(
                F.round(F.col("value"), 2).cast("decimal(38,2)").cast("string"),
                F.lit("N/A"),
            ),
        ).alias("popup"),
    )


@query(
    "json-extract",
    oracle="""
        SELECT event_id,
               -- unparseable props are absent: Spark get_json_object
               -- silently NULLs malformed JSON, DuckDB hard-errors — the
               -- json_valid guard pins the same contract
               CASE WHEN json_valid(props)
                    THEN json_extract_string(props, '$.k') END AS k_str,
               CAST(CASE WHEN json_valid(props)
                         THEN json_extract_string(props, '$.k') END
                    AS BIGINT) AS k_int
        FROM events
    """,
    doc="JSON property extraction (reference GeoJSON envelope dissection "
    "process_cycle_networks.py:33-43; unused JSONB intent db_models.py:9) "
    "via get_json_object on events.props.",
)
def json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k")
    return ev.select("event_id", k.alias("k_str"), k.cast("long").alias("k_int"))


@query(
    "json-to-map",
    oracle="""
        SELECT event_id,
               -- json_valid guard: unparseable hostile props -> NULL map
               -- on Spark (PERMISSIVE from_json), NULL here
               CAST(CASE WHEN json_valid(props)
                         THEN json_extract_string(props, '$.k') END
                    AS DOUBLE) AS k_val
        FROM events
    """,
    doc="from_json into MapType then key access — the dynamic-property-bag "
    "pattern (reference from_features dynamic properties "
    "process_cycle_networks.py:50).",
)
def json_to_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,double>")
    return ev.select("event_id", m.getItem("k").alias("k_val"))


@query(
    "rename-type-to-route-type",
    oracle="SELECT event_id, event_type AS route_type FROM events",
    doc="Column rename at load (reference db_helpers.py:163-165 "
    "type -> route_type).",
)
def rename_type_to_route_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.select("event_id", "event_type").withColumnRenamed("event_type", "route_type")


@query(
    "schema-align",
    oracle="""
        SELECT event_id, ts, user_id, event_type,
               CAST(NULL AS DOUBLE) AS score
        FROM events
    """,
    doc="Align a dynamic source schema to a fixed target: keep known "
    "columns, drop unknowns, add missing as typed NULLs (reference "
    "db_helpers.py:167-169 silent attribute filter).",
)
def schema_align(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    target = [
        ("event_id", "long"),
        ("ts", "timestamp"),
        ("user_id", "long"),
        ("event_type", "string"),
        ("score", "double"),  # not in source -> typed NULL
    ]
    cols = [
        (F.col(name).cast(dtype) if name in ev.columns else F.lit(None).cast(dtype)).alias(name)
        for name, dtype in target
    ]
    return ev.select(*cols)


@query(
    "json-variant",
    oracle="""
        SELECT event_id,
               -- json_valid guard matches Spark's try_parse_json -> NULL
               -- variant for malformed hostile props
               CAST(CASE WHEN json_valid(props)
                         THEN json_extract_string(props, '$.k') END
                    AS DOUBLE) AS k_variant,
               CASE WHEN json_valid(props)
                    THEN json_extract_string(props, '$.missing') END
                   AS missing_key
        FROM events
    """,
    doc="VariantType path (Spark 4): parse_json -> open-schema variant, "
    "typed extraction via variant_get — the shredded-JSON storage model "
    "that replaces string-JSON reparsing at scale (parse once at "
    "ingest, store the variant in parquet, extract columnar).",
)
def json_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    # try_parse_json: one malformed props row at corpus scale must not
    # kill the job — NULL variant, NULL extractions (= oracle's
    # json_valid guard)
    v = F.try_parse_json("props")
    return ev.select(
        "event_id",
        F.variant_get(v, "$.k", "double").alias("k_variant"),
        F.variant_get(v, "$.missing", "string").alias("missing_key"),
    )


@query(
    "fn-strftime",
    oracle="""
        SELECT o_orderkey, strftime(o_orderdate, '%Y%m%d_%H%M%S') AS stamp
        FROM orders
    """,
    doc="Timestamp -> %Y%m%d_%H%M%S string (reference output-file naming, "
    "process_cycle_networks.py:146) — the SURVEY §2.2 op in isolation "
    "(battery version: fn-date-funcs).",
)
def fn_strftime(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey", F.date_format("o_orderdate", "yyyyMMdd_HHmmss").alias("stamp")
    )


@query(
    "fn-round",
    oracle="""
        SELECT l_orderkey, l_linenumber,
               round(l_extendedprice * 2, 0) AS rounded_price
        FROM lineitem
    """,
    doc="round() for display (reference app/app.py:130) — rounding at a "
    "digit where the doubled 2-decimal inputs are exact, so HALF_UP vs "
    "binary-representation rounding cannot diverge (the battery version "
    "fn-math-funcs documents the general-case hazard).",
)
def fn_round(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.col("l_extendedprice") * 2, 0).alias("rounded_price"),
    )


# --- OS grid reference over synthesized eastings/northings ----------------

_E_EXPR = "(l_partkey * 37) % 800000"   # some values exceed the 0..699999 valid band
_N_EXPR = "(l_orderkey * 53) % 1000000"


@query(
    "fn-os-grid-ref",
    oracle=f"""
        SELECT pk, e, n,
               {os_grid_reference_oracle_sql('e', 'n', 10)} AS ref10,
               {os_grid_reference_oracle_sql('e', 'n', 8)} AS ref8,
               {os_grid_reference_oracle_sql('e', 'n', 6)} AS ref6
        FROM (SELECT l_orderkey * 10 + l_linenumber AS pk,
                     CAST({_E_EXPR} AS DOUBLE) AS e,
                     CAST({_N_EXPR} AS DOUBLE) AS n
              FROM lineitem)
    """,
    doc="OS easting/northing -> grid reference at precision 6/8/10 "
    "(reference geotiles.py:8-59) as pure floor/pmod/substring/lpad "
    "expressions; invalid domain -> '' exercised by the synthesized range.",
)
def fn_os_grid_ref(spark: SparkSession, sf_dir: str) -> DataFrame:
    from transit_scrape_spark.functions.gridref import (
        os_grid_reference_parts,
        ref_from_parts,
    )

    li = load_table(spark, sf_dir, "lineitem")
    base = li.select(
        (F.col("l_orderkey") * 10 + F.col("l_linenumber")).alias("pk"),
        ((F.col("l_partkey") * 37) % 800000).cast("double").alias("e"),
        ((F.col("l_orderkey") * 53) % 1000000).cast("double").alias("n"),
    )
    # project the precision-independent parts (validity, letter pair,
    # remainders) ONCE; the three precisions then differ only in their
    # lpad/concat digits — the inline form repeated the whole letter
    # derivation per precision (r11, ~20%)
    parts = os_grid_reference_parts(F.col("e"), F.col("n"))
    mid = base.select(
        "pk", "e", "n",
        parts["valid"].alias("_valid"),
        parts["letters"].alias("_lp"),
        parts["e_rem"].alias("_er"),
        parts["n_rem"].alias("_nr"),
    )
    return mid.select(
        "pk",
        "e",
        "n",
        *[
            ref_from_parts(
                F.col("_valid"), F.col("_lp"), F.col("_er"), F.col("_nr"), p
            ).alias(f"ref{p}")
            for p in (10, 8, 6)
        ],
    )


@query(
    "fn-bitwise-battery",
    oracle="""
        SELECT n_nationkey,
               CAST(n_nationkey & 12 AS BIGINT) AS b_and,
               CAST(n_nationkey | 5 AS BIGINT) AS b_or,
               CAST(xor(n_nationkey, 21) AS BIGINT) AS b_xor,
               CAST(~n_nationkey AS BIGINT) AS b_not,
               CAST(n_nationkey << 3 AS BIGINT) AS b_shl,
               CAST(n_nationkey >> 1 AS BIGINT) AS b_shr,
               CAST(bit_count(CAST(n_nationkey AS BIGINT)) AS BIGINT) AS b_pop
        FROM nation
    """,
    doc="Bitwise expression battery (and/or/xor/not, shifts, popcount) — "
    "the ops flag-field and bitmap-index manipulation needs; all pure "
    "codegen projections. Spark exposes them as Column operators and "
    "functions; shifts take int amounts.",
)
def fn_bitwise_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = load_table(spark, sf_dir, "nation")
    k = F.col("n_nationkey").cast("long")
    return n.select(
        "n_nationkey",
        k.bitwiseAND(F.lit(12)).alias("b_and"),
        k.bitwiseOR(F.lit(5)).alias("b_or"),
        k.bitwiseXOR(F.lit(21)).alias("b_xor"),
        F.bitwise_not(k).alias("b_not"),
        F.shiftleft(k, 3).cast("long").alias("b_shl"),
        F.shiftright(k, 1).cast("long").alias("b_shr"),
        F.bit_count(k).cast("long").alias("b_pop"),
    )


@query(
    "fn-try-battery",
    oracle="""
        SELECT n_nationkey,
               CAST(n_nationkey AS DOUBLE)
                   / nullif(n_nationkey % 3, 0) AS safe_div,
               TRY_CAST(CASE WHEN n_nationkey % 2 = 0
                             THEN CAST(n_nationkey * 7 AS VARCHAR)
                             ELSE n_name END AS BIGINT) AS parsed_num,
               TRY_CAST(CASE WHEN n_nationkey % 4 = 0
                             THEN '2024-03-0' || CAST(n_nationkey % 9 + 1 AS VARCHAR)
                             ELSE n_name END AS TIMESTAMP) AS parsed_ts,
               string_split(n_name, '_')[5] AS oob_elem
        FROM nation
    """,
    doc="Error-tolerant expression battery: try_divide / try_cast / "
    "try_to_timestamp / try_element_at return NULL where strict ANSI "
    "evaluation would abort the whole 100 TB job on one bad row — the "
    "per-row analogue of the corrupt-record quarantine in "
    "scan-csv-robust. Oracled by DuckDB's TRY_CAST / NULLIF / "
    "natural out-of-bounds-NULL list semantics.",
)
def fn_try_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = load_table(spark, sf_dir, "nation")
    k = F.col("n_nationkey")
    return n.select(
        "n_nationkey",
        F.try_divide(k.cast("double"), (k % 3).cast("double")).alias("safe_div"),
        F.when((k % 2) == 0, (k * 7).cast("string"))
        .otherwise(F.col("n_name"))
        .try_cast("bigint")
        .alias("parsed_num"),
        F.try_to_timestamp(
            F.when((k % 4) == 0, F.concat(F.lit("2024-03-0"), (k % 9 + 1).cast("string")))
            .otherwise(F.col("n_name"))
        ).alias("parsed_ts"),
        F.try_element_at(F.split("n_name", "_"), F.lit(5)).alias("oob_elem"),
    )


@query(
    "fn-arrow-udf",
    oracle="""
        SELECT doc_id,
               CAST(length(regexp_replace(text, '[^aeiou]', '', 'g')) AS BIGINT)
                   AS n_vowels,
               round(CAST(length(regexp_replace(text, '[^aeiou]', '', 'g')) AS DOUBLE)
                     / length(text), 6) AS vowel_ratio
        FROM documents
    """,
    doc="Arrow-optimized Python UDF (Spark 4 useArrow=True — SURVEY "
    "§2.11's fourth Python surface next to classic udf / pandas_udf / "
    "mapInArrow): values cross the JVM boundary as Arrow columns "
    "instead of pickled rows, ~2-5x over classic UDFs while keeping "
    "the simple scalar signature (pandas_udf's batch semantics without "
    "pandas in the function body). The computation is deliberately "
    "regex-expressible so the oracle checks the UDF EXACTLY — in "
    "production this surface is reserved for logic expressions can't "
    "say (tokenizers, format parsers); anything expressible stays in "
    "codegen (the engine rule fn-os-grid-ref demonstrates).",
)
def fn_arrow_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    import re

    from pyspark.sql.functions import udf

    @udf(returnType="long", useArrow=True)
    def count_vowels(s: str) -> int:
        # total over NULL text: propagate None (the SQL regexp does)
        return len(re.findall(r"[aeiou]", s)) if s is not None else None

    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        count_vowels(F.col("text")).alias("n_vowels"),
        F.round(
            # try_divide: empty hostile text -> NULL ratio on both engines
            F.try_divide(count_vowels(F.col("text")).cast("double"), F.length("text")),
            6,
        ).alias("vowel_ratio"),
    )


@query(
    "fn-aes-roundtrip",
    oracle="""
        SELECT c_custkey, c_name,
               CAST(1 AS BIGINT) AS roundtrip_ok
        FROM customer
        WHERE c_custkey <= 100
    """,
    doc="AES-GCM encrypt/decrypt ROUNDTRIP (Spark built-in "
    "aes_encrypt/aes_decrypt, 16-byte key): ciphertext is "
    "randomized per call (GCM IV), so the CONTRACT testable "
    "across engines is decrypt(encrypt(x)) == x — emitted as the "
    "recovered plaintext plus an equality flag the oracle pins to "
    "1. Column-level encryption inside the engine is how "
    "restricted fields cross trust boundaries without a UDF or a "
    "round-trip through the driver (the cryptographic sibling of "
    "privacy-mask-battery's one-way redaction). JVM-native "
    "expressions, codegen, no Python in the path.",
    tags=("fn",),
)
def fn_aes_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 100)
    key = F.lit("0123456789abcdef")
    enc = F.expr("aes_encrypt(c_name, '0123456789abcdef')")
    dec = F.expr(
        "CAST(aes_decrypt(aes_encrypt(c_name, '0123456789abcdef'), "
        "'0123456789abcdef') AS STRING)"
    )
    _ = key, enc
    return c.select(
        "c_custkey",
        dec.alias("c_name"),
        # null-safe: roundtrip of a NULL name is NULL == NULL, still OK
        F.when(dec.eqNullSafe(F.col("c_name")), 1)
        .otherwise(0)
        .cast("long")
        .alias("roundtrip_ok"),
    )
