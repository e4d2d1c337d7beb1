"""Breadth batteries: remaining SQL-surface corners (outer/cross joins,
range window frames, sorted collects) and consolidated scalar batteries
for arrays / maps / regex / null-handling (SURVEY §2.9 completeness).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from transit_scrape_spark.queries.registry import query
from transit_scrape_spark.sources.tables import load_table


@query(
    "join-full-outer",
    oracle="""
        SELECT coalesce(f.o_custkey, o.o_custkey) AS custkey,
               coalesce(f.n, 0) AS n_f, coalesce(o.n, 0) AS n_o
        FROM (SELECT o_custkey, count(*) AS n FROM orders WHERE o_orderstatus = 'F'
              GROUP BY o_custkey) f
        FULL OUTER JOIN
             (SELECT o_custkey, count(*) AS n FROM orders WHERE o_orderstatus = 'O'
              GROUP BY o_custkey) o
          ON f.o_custkey = o.o_custkey
    """,
    doc="Full outer join: per-customer F/O order counts with zero-fill on "
    "either side — the reconciliation-report shape.",
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    f = (
        orders.filter(F.col("o_orderstatus") == "F")
        .groupBy("o_custkey")
        .agg(F.count("*").alias("n_f"))
    )
    o = (
        orders.filter(F.col("o_orderstatus") == "O")
        .groupBy("o_custkey")
        .agg(F.count("*").alias("n_o"))
    )
    joined = f.join(o, "o_custkey", "full_outer")
    return joined.select(
        F.col("o_custkey").alias("custkey"),
        F.coalesce("n_f", F.lit(0)).alias("n_f"),
        F.coalesce("n_o", F.lit(0)).alias("n_o"),
    )


@query(
    "join-cross",
    oracle="""
        SELECT r1.r_name AS from_region, r2.r_name AS to_region
        FROM region r1 CROSS JOIN region r2
        WHERE r1.r_regionkey <> r2.r_regionkey
    """,
    doc="Explicit cross join of two tiny dims (route matrix shape) — "
    "legitimate only when both sides are small; plans as broadcast "
    "nested loop.",
)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = load_table(spark, sf_dir, "region")
    r1 = r.select(F.col("r_regionkey").alias("k1"), F.col("r_name").alias("from_region"))
    r2 = r.select(F.col("r_regionkey").alias("k2"), F.col("r_name").alias("to_region"))
    return (
        r1.crossJoin(r2).filter(F.col("k1") != F.col("k2")).select("from_region", "to_region")
    )


@query(
    "window-range-frame",
    oracle="""
        SELECT user_id, event_id, ts,
               count(*) OVER (PARTITION BY user_id ORDER BY ts
                              RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
                   AS n_last_hour
        FROM events
    """,
    doc="RANGE frame window: events per user in the trailing hour — the "
    "time-based frame (vs ROWS) the sessionize/rate-limit family needs.",
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    # unix_micros, not cast-to-seconds: the frame boundary must match the
    # oracle's INTERVAL arithmetic at full timestamp precision
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-3600 * 1_000_000, 0)
    )
    return ev.select(
        "user_id", "event_id", "ts", F.count("*").over(w).alias("n_last_hour")
    )


@query(
    "agg-collect-sorted",
    oracle="""
        SELECT n_regionkey,
               array_to_string(list_sort(list(n_name)), '|') AS nations
        FROM nation
        GROUP BY n_regionkey
    """,
    doc="collect_list + array_sort: deterministic grouped collection "
    "(raw collect order is partition-dependent — always sort before "
    "comparing or emitting). Output joined to a scalar string so the "
    "driver canonicalizer never sees an ArrayType column.",
)
def agg_collect_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = load_table(spark, sf_dir, "nation")
    return n.groupBy("n_regionkey").agg(
        F.array_join(F.array_sort(F.collect_list("n_name")), "|").alias("nations")
    )


@query(
    "fn-array-battery",
    oracle="""
        SELECT doc_id,
               array_to_string(list_sort(string_split(text, ' '))[1:5], '|') AS first5_sorted,
               array_to_string(list_reverse(string_split(text, ' '))[1:3], '|') AS last3_reversed,
               CAST(len(list_filter(string_split(text, ' '), t -> length(t) > 5)) AS BIGINT)
                   AS n_long_tokens,
               array_to_string(string_split(text, ' ')[1:3], '|') AS head_joined,
               list_contains(string_split(text, ' '), 'spark') AS has_spark
        FROM documents
    """,
    doc="Array battery (§2.9): sort/slice/reverse/filter/join/contains "
    "over token arrays — all codegen'd array primitives (filter is the "
    "one HOF; bounded work per row). Array outputs joined to scalar "
    "strings for the driver canonicalizer.",
)
def fn_array_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    return d.select(
        "doc_id",
        F.array_join(F.slice(F.array_sort(toks), 1, 5), "|").alias("first5_sorted"),
        F.array_join(F.slice(F.reverse(toks), 1, 3), "|").alias("last3_reversed"),
        F.size(F.filter(toks, lambda t: F.length(t) > 5)).cast("long").alias(
            "n_long_tokens"
        ),
        F.array_join(F.slice(toks, 1, 3), "|").alias("head_joined"),
        F.array_contains(toks, "spark").alias("has_spark"),
    )


@query(
    "fn-map-battery",
    oracle="""
        SELECT event_id,
               -- json_valid guards: malformed hostile props behave as
               -- absent (Spark's PERMISSIVE from_json yields a NULL map,
               -- so every derived column is NULL)
               CAST(CASE WHEN json_valid(props)
                         THEN json_extract_string(props, '$.k') END
                    AS DOUBLE) AS k_val,
               CASE WHEN json_valid(props) THEN 'k' END AS prop_keys,
               CAST(CAST(CASE WHEN json_valid(props)
                              THEN json_extract_string(props, '$.k') END
                         AS DOUBLE) AS VARCHAR) AS prop_vals,
               CAST(CASE WHEN json_valid(props) THEN 1 END AS BIGINT)
                   AS n_props
        FROM events
    """,
    doc="Map battery (§2.9): from_json -> MapType, map_keys / map_values "
    "/ size — the dynamic-property-bag surface (reference GeoJSON "
    "properties, db_models JSONB intent). Keys/values joined to scalar "
    "strings for the driver canonicalizer (values are integer-valued "
    "doubles, so double->string formats identically in both engines).",
)
def fn_map_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,double>")
    return ev.select(
        "event_id",
        m.getItem("k").alias("k_val"),
        F.array_join(F.map_keys(m), "|").alias("prop_keys"),
        F.array_join(
            F.transform(F.map_values(m), lambda v: v.cast("string")), "|"
        ).alias("prop_vals"),
        F.size(F.map_keys(m)).cast("long").alias("n_props"),
    )


@query(
    "fn-regex-battery",
    oracle="""
        SELECT doc_id,
               regexp_extract(text, '([a-z]{5,})', 1) AS first_long_word,
               regexp_matches(text, 'table.*table') AS has_double_table,
               regexp_replace(text, '\\s+', '_', 'g') AS snaked_head
        FROM (SELECT doc_id, substring(text, 1, 40) AS text FROM documents)
    """,
    doc="Regex battery (§2.9): extract / match-test / global replace — "
    "JVM regex, codegen'd, applied to a bounded prefix.",
)
def fn_regex_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.substring("text", 1, 40).alias("text")
    )
    return d.select(
        "doc_id",
        F.regexp_extract("text", r"([a-z]{5,})", 1).alias("first_long_word"),
        F.col("text").rlike("table.*table").alias("has_double_table"),
        F.regexp_replace("text", r"\s+", "_").alias("snaked_head"),
    )


@query(
    "fn-null-battery",
    oracle="""
        SELECT e.event_id,
               coalesce(c.c_name, 'UNKNOWN') AS who,
               (c.c_custkey IS NULL) AS is_orphan,
               nullif(e.event_type, 'error') AS type_or_null,
               CASE WHEN c.c_custkey IS NOT NULL THEN 'matched' ELSE 'unmatched' END
                   AS match_status
        FROM events e LEFT JOIN customer c ON e.user_id = c.c_custkey
    """,
    doc="NULL-handling battery (§2.9 / reference N/A defaults and "
    "IS NOT NULL filters): coalesce / nullif / null tests over a "
    "left join that manufactures NULLs.",
)
def fn_null_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    c = load_table(spark, sf_dir, "customer")
    j = ev.join(F.broadcast(c), ev.user_id == c.c_custkey, "left")
    return j.select(
        "event_id",
        F.coalesce("c_name", F.lit("UNKNOWN")).alias("who"),
        F.col("c_custkey").isNull().alias("is_orphan"),
        F.nullif("event_type", F.lit("error")).alias("type_or_null"),
        F.when(F.col("c_custkey").isNotNull(), "matched")
        .otherwise("unmatched")
        .alias("match_status"),
    )


@query(
    "agg-bool-battery",
    oracle="""
        SELECT o_orderpriority,
               bool_and(o_totalprice > 1000.0) AS all_over_1k,
               bool_or(o_orderstatus = 'F') AS any_finished,
               CAST(count_if(o_totalprice > 150000.0) AS BIGINT) AS n_big,
               CAST(count_if(o_orderstatus = 'O') AS BIGINT) AS n_open
        FROM orders
        GROUP BY o_orderpriority
    """,
    doc="Boolean-aggregate battery (every/bool_and, some/bool_or, "
    "count_if): predicate rollups as single-pass aggregates — the "
    "data-quality assertion shape ('ALL rows in this partition "
    "satisfy X, count the violators') without a self-join or two "
    "scans. All are map-side-combinable (partial AND/OR/count fold on "
    "each mapper, merge on reducers), so at 100 TB the shuffle moves "
    "one boolean/long per group per mapper, not rows.",
)
def agg_bool_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.every(F.col("o_totalprice") > 1000.0).alias("all_over_1k"),
        F.some(F.col("o_orderstatus") == "F").alias("any_finished"),
        F.count_if(F.col("o_totalprice") > 150000.0)
        .cast("long")
        .alias("n_big"),
        F.count_if(F.col("o_orderstatus") == "O").cast("long").alias("n_open"),
    )


@query(
    "fn-url-battery",
    oracle="""
        SELECT doc_id,
               'w' || CAST(doc_id % 4 AS VARCHAR) || '.example.org' AS host,
               '/p/' || CAST(doc_id % 7 AS VARCHAR) AS path,
               'q=' || CAST(doc_id % 3 AS VARCHAR) || '&id='
                    || CAST(doc_id AS VARCHAR) AS query,
               CAST(doc_id AS VARCHAR) AS id_param
        FROM documents
    """,
    doc="URL structural parsing battery (parse_url HOST/PATH/QUERY + "
    "keyed query-parameter extraction): the crawl-metadata projection "
    "that precedes per-domain partitioning and politeness grouping in "
    "a web-corpus pipeline. parse_url is a JVM built-in expression — "
    "a regex-free, codegen-resident parse per component, vs the "
    "urllib-in-a-Python-UDF version that serializes every row. URLs "
    "are synthesized from doc_id so the oracle reconstructs every "
    "component arithmetically. Complements dedup-url-normalize (which "
    "canonicalizes with regexes); this op EXTRACTS components.",
)
def fn_url_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://w"),
        (F.col("doc_id") % 4).cast("string"),
        F.lit(".example.org/p/"),
        (F.col("doc_id") % 7).cast("string"),
        F.lit("?q="),
        (F.col("doc_id") % 3).cast("string"),
        F.lit("&id="),
        F.col("doc_id").cast("string"),
    )
    u = d.select("doc_id", url.alias("url"))
    return u.select(
        "doc_id",
        F.parse_url("url", F.lit("HOST")).alias("host"),
        F.parse_url("url", F.lit("PATH")).alias("path"),
        F.parse_url("url", F.lit("QUERY")).alias("query"),
        F.parse_url("url", F.lit("QUERY"), F.lit("id")).alias("id_param"),
    )


@query(
    "fn-xpath-battery",
    oracle="""
        SELECT n_nationkey,
               CAST(n_nationkey AS BIGINT) AS xid,
               coalesce(n_name, '') AS xname,
               CAST(n_regionkey AS VARCHAR) AS xregion_attr,
               CAST(2 AS BIGINT) AS n_stops
        FROM nation
    """,
    doc="XPath extraction battery (xpath_int / xpath_string / xpath "
    "array form incl. attribute access): the XML sibling of "
    "fn-url-battery for feeds that arrive as XML (GTFS-adjacent transit "
    "feeds, WFS GetFeature XML envelopes — the reference's WFS constant "
    "serves XML when not asked for JSON, src/utils/constants.py:1-3). "
    "All four are JVM built-in expressions over the string — no "
    "ElementTree-in-a-UDF serialization. The XML is synthesized from "
    "nation columns so the oracle reconstructs every extraction "
    "arithmetically.",
)
def fn_xpath_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = load_table(spark, sf_dir, "nation")
    xml = F.format_string(
        '<route region="%d"><id>%d</id><name>%s</name>'
        "<stops><s>a</s><s>b</s></stops></route>",
        F.col("n_regionkey"),
        F.col("n_nationkey"),
        F.coalesce(F.col("n_name"), F.lit("")),
    )
    x = n.select("n_nationkey", xml.alias("xml"))
    return x.select(
        "n_nationkey",
        F.xpath_int("xml", F.lit("/route/id")).cast("long").alias("xid"),
        F.xpath_string("xml", F.lit("/route/name")).alias("xname"),
        F.xpath_string("xml", F.lit("/route/@region")).alias("xregion_attr"),
        F.size(F.xpath("xml", F.lit("/route/stops/s/text()")))
        .cast("long")
        .alias("n_stops"),
    )


@query(
    "privacy-mask-battery",
    oracle="""
        SELECT c_custkey,
               -- Unicode classes, not [A-Z]: Spark's mask() classifies by
               -- Character.isUpperCase/isLowerCase (ü, Δ are letters on
               -- hostile text); RE2's \\p{Lu}/\\p{Ll}/\\p{Nd} match that
               regexp_replace(regexp_replace(regexp_replace(
                   c_name, '\\p{Lu}', 'X', 'g'), '\\p{Ll}', 'x', 'g'),
                   '\\p{Nd}', 'n', 'g') AS masked_default,
               regexp_replace(regexp_replace(regexp_replace(
                   c_name, '\\p{Lu}', '*', 'g'), '\\p{Ll}', '*', 'g'),
                   '\\p{Nd}', '#', 'g') AS masked_custom,
               c_name AS aes_roundtrip,
               -- AES pads BYTES: octet_length of the UTF-8 encoding, not
               -- the codepoint count
               CAST((octet_length(encode(c_name)) // 16 + 1) * 16 AS BIGINT)
                   AS ct_bytes
        FROM customer
    """,
    doc="Masking + reversible-encryption battery (mask(), aes_encrypt/"
    "aes_decrypt): the column-level PII controls of the privacy family "
    "(k-anonymity/l-diversity/DP cover the statistical side; this "
    "covers display masking and deterministic crypto). mask() rewrites "
    "character CLASSES (upper->X, lower->x, digit->n) keeping "
    "structure visible for debugging; AES-ECB is used here ONLY "
    "because the op must be deterministic for the oracle — real "
    "deployments use the default GCM (random IV, ciphertext "
    "non-deterministic) precisely because ECB leaks equality; when "
    "equality-preserving encryption is the POINT (join on encrypted "
    "keys), that trade-off is explicit. ct_bytes checks the PKCS "
    "block arithmetic; the decrypt(encrypt(x)) column proves the "
    "round-trip. All JVM expressions — no Python crypto per row.",
)
def privacy_mask_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    key = "0123456789abcdef"
    return c.select(
        "c_custkey",
        F.mask("c_name").alias("masked_default"),
        F.mask("c_name", F.lit("*"), F.lit("*"), F.lit("#")).alias(
            "masked_custom"
        ),
        F.expr(
            f"cast(aes_decrypt(aes_encrypt(c_name, '{key}', 'ECB'),"
            f" '{key}', 'ECB') AS STRING)"
        ).alias("aes_roundtrip"),
        F.expr(f"octet_length(aes_encrypt(c_name, '{key}', 'ECB'))")
        .cast("long")
        .alias("ct_bytes"),
    )


@query(
    "agg-regression-battery",
    oracle="""
        SELECT l_returnflag,
               round(regr_slope(l_extendedprice, l_quantity), 4) AS slope,
               round(regr_intercept(l_extendedprice, l_quantity), 4)
                   AS intercept,
               round(regr_r2(l_extendedprice, l_quantity), 6) AS r2,
               CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT)
                   AS n_pairs,
               round(regr_avgx(l_extendedprice, l_quantity), 4) AS avg_qty
        FROM lineitem
        GROUP BY l_returnflag
    """,
    doc="SQL:2003 linear-regression aggregate battery (regr_slope/"
    "intercept/r2/count/avgx): ordinary least squares as a SINGLE "
    "streaming aggregate — each partial maintains (n, sum_x, sum_y, "
    "sum_xx, sum_xy) and partials merge associatively, so the trend "
    "fit over 100 TB is one map-side-combined shuffle of 5 doubles "
    "per group, not an MLlib job or a collect. The per-group "
    "price-vs-quantity fit is the monitoring shape (drift of a "
    "relationship by segment). Both engines implement the standard "
    "definitions; results rounded to absorb summation-order last-bit "
    "drift.",
)
def agg_regression_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    y, x = F.col("l_extendedprice"), F.col("l_quantity")
    return li.groupBy("l_returnflag").agg(
        F.round(F.regr_slope(y, x), 4).alias("slope"),
        F.round(F.regr_intercept(y, x), 4).alias("intercept"),
        F.round(F.regr_r2(y, x), 6).alias("r2"),
        F.regr_count(y, x).cast("long").alias("n_pairs"),
        F.round(F.regr_avgx(y, x), 4).alias("avg_qty"),
    )


@query(
    "agg-bitmap-builtin",
    oracle="""
        SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
               CAST(count(DISTINCT user_id) AS BIGINT) AS n_distinct_users
        FROM events
        GROUP BY 1
    """,
    doc="EXACT distinct counting via the built-in bitmap aggregates "
    "(Spark 3.5 bitmap_bucket_number / bitmap_bit_position / "
    "bitmap_construct_agg / bitmap_count) — the engine-native twin of "
    "agg-bitmap-distinct's hand-rolled word-packed bitmaps: first "
    "level packs each 32768-id bucket into one binary bitmap "
    "(map-side combinable OR), second level sums popcounts per day. "
    "The shuffle carries one 4KB bitmap per (day, bucket), not one "
    "row per user — exact COUNT(DISTINCT) at 100 TB without the "
    "two-shuffle expand of count(distinct) over high-cardinality "
    "keys, and the bitmaps are mergeable across days/partitions for "
    "rollups (union = OR). Oracle is the plain exact distinct.",
)
def agg_bitmap_builtin(spark: SparkSession, sf_dir: str) -> DataFrame:
    from transit_scrape_spark.sources.tables import load_events

    ev = load_events(spark, sf_dir)
    day = F.date_trunc("day", F.col("ts")).alias("day")
    buckets = ev.select(
        day,
        F.expr("bitmap_bucket_number(user_id)").alias("bucket"),
        F.expr("bitmap_bit_position(user_id)").alias("pos"),
    ).groupBy("day", "bucket").agg(
        F.expr("bitmap_construct_agg(pos)").alias("bm")
    )
    return buckets.groupBy("day").agg(
        F.sum(F.expr("bitmap_count(bm)")).cast("long").alias("n_distinct_users")
    )


@query(
    "fn-hash-battery",
    oracle="""
        SELECT p_partkey,
               md5(p_name) AS h_md5,
               sha256(p_name) AS h_sha256,
               CAST(CAST(('0x' || substring(md5(p_name), 1, 15)) AS BIGINT)
                    AS BIGINT) AS h_md5_prefix64,
               CAST(CAST(('0x' || substring(md5(p_name), 1, 15)) AS BIGINT) % 1024
                    AS BIGINT) AS shard
        FROM part
        WHERE p_partkey <= 500
    """,
    doc="Cryptographic-hash battery (md5 / sha2-256) plus the two "
    "derived idioms every pipeline builds on them: a 60-bit integer "
    "from the md5 hex prefix (the engine-portable stable id — Spark's "
    "native hash()/xxhash64 seeds differ across engines, so "
    "cross-system contracts hash the hex) and a mod-1024 shard key. "
    "All codegen'd JVM-side expressions, one projection, no shuffle; "
    "at 100 TB this is the deterministic-bucketing primitive behind "
    "dedup-url-normalize and sample-hash-split.",
)
def fn_hash_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") <= 500)
    prefix64 = F.conv(F.substring(F.md5(F.col("p_name")), 1, 15), 16, 10).cast("long")
    return p.select(
        "p_partkey",
        F.md5(F.col("p_name")).alias("h_md5"),
        F.sha2(F.col("p_name"), 256).alias("h_sha256"),
        prefix64.alias("h_md5_prefix64"),
        (prefix64 % 1024).cast("long").alias("shard"),
    )


@query(
    "window-percentile-frame",
    oracle="""
        SELECT c_custkey, c_nationkey,
               round(c_acctbal, 2) AS acctbal,
               round(quantile_cont(c_acctbal, 0.5) OVER (PARTITION BY c_nationkey), 4)
                   AS nation_median,
               round(quantile_cont(c_acctbal, 0.9) OVER (PARTITION BY c_nationkey), 4)
                   AS nation_p90,
               c_acctbal > quantile_cont(c_acctbal, 0.9)
                   OVER (PARTITION BY c_nationkey) AS is_top_decile
        FROM customer
    """,
    doc="Exact percentiles as window aggregates: every customer row "
    "annotated with its nation's median and p90 balance and a "
    "top-decile flag — the peer-group-comparison shape (row vs its "
    "cohort's distribution) that would otherwise need a groupBy + "
    "re-join. Spark evaluates percentile() over an unbounded window "
    "by buffering each partition once; both engines interpolate "
    "(quantile_cont semantics), so values match exactly. At 100 TB "
    "cohort partitions must fit the window buffer — for heavy "
    "cohorts swap in approx_percentile over the same window or the "
    "groupBy+broadcast-join rewrite.",
)
def window_percentile_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey")
    med = F.percentile(F.col("c_acctbal"), F.lit(0.5)).over(w)
    p90 = F.percentile(F.col("c_acctbal"), F.lit(0.9)).over(w)
    return c.select(
        "c_custkey",
        "c_nationkey",
        F.round(F.col("c_acctbal"), 2).alias("acctbal"),
        F.round(med, 4).alias("nation_median"),
        F.round(p90, 4).alias("nation_p90"),
        (F.col("c_acctbal") > p90).alias("is_top_decile"),
    )


@query(
    "join-existence-multikey",
    oracle="""
        SELECT l.l_returnflag,
               CAST(count(*) AS BIGINT) AS n_with_successor,
               round(sum(l.l_extendedprice), 2) AS rev
        FROM lineitem l
        WHERE EXISTS (
            SELECT 1 FROM lineitem nxt
            WHERE nxt.l_orderkey = l.l_orderkey
              AND nxt.l_linenumber = l.l_linenumber + 1
        )
        GROUP BY l.l_returnflag
    """,
    doc="EXISTS on a COMPOSITE key (orderkey, linenumber+1): lines that "
    "have a successor line in the same order. Planned as a left-semi "
    "hash join on both columns at once — the multi-column existence "
    "probe that naive rewrites turn into IN-subqueries on "
    "concatenated strings (which kills pushdown and null semantics). "
    "Both sides shuffle on the same composite hash, so at 100 TB "
    "this is one co-partitioned exchange each way; the +1 arithmetic "
    "rides inside the join key expression.",
)
def join_existence_multikey(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    nxt = li.select(
        F.col("l_orderkey").alias("n_ok"), F.col("l_linenumber").alias("n_ln")
    )
    return (
        li.join(
            nxt,
            (F.col("l_orderkey") == F.col("n_ok"))
            & (F.col("l_linenumber") + 1 == F.col("n_ln")),
            "left_semi",
        )
        .groupBy("l_returnflag")
        .agg(
            F.count("*").cast("long").alias("n_with_successor"),
            F.round(F.sum("l_extendedprice"), 2).alias("rev"),
        )
    )


@query(
    "window-zscore-rolling",
    oracle="""
        WITH daily AS (
            SELECT event_type,
                   CAST(date_trunc('day', ts) AS DATE) AS day,
                   round(sum(value), 6) AS v
            FROM events WHERE ts IS NOT NULL GROUP BY 1, 2
        ),
        rolled AS (
            SELECT event_type, day, v,
                   avg(v) OVER w AS mu,
                   stddev_samp(v) OVER w AS sd,
                   count(*) OVER w AS n_window
            FROM daily
            WINDOW w AS (PARTITION BY event_type ORDER BY day
                         ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
        )
        SELECT event_type, day,
               CAST(n_window AS BIGINT) AS n_window,
               round((v - mu) / sd, 4) AS rolling_z,
               abs((v - mu) / sd) > 2.5 AS is_anomaly
        FROM rolled
        WHERE n_window = 7
    """,
    doc="Rolling z-score anomaly screen: each day scored against ITS OWN "
    "trailing 7-day window (mean/sample-std over ROWS 6 PRECEDING), "
    "emitted only once the window is full — the drift-adaptive "
    "variant of anomaly-zscore's global baseline (a level shift "
    "re-normalizes within a week instead of poisoning the global "
    "mean forever). Same collapsed-daily discipline as the "
    "timeseries family: one partial-agg shuffle to |types|x|days|, "
    "all three window aggregates share one WINDOW clause = one "
    "sort, one pass.",
)
def window_zscore_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    daily = ev.groupBy(
        "event_type", F.to_date(F.date_trunc("day", F.col("ts"))).alias("day")
    ).agg(F.round(F.sum("value"), 6).alias("v"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-6, Window.currentRow)
    )
    rolled = daily.select(
        "event_type",
        "day",
        "v",
        F.avg("v").over(w).alias("mu"),
        F.stddev_samp("v").over(w).alias("sd"),
        F.count("*").over(w).alias("n_window"),
    ).filter(F.col("n_window") == 7)
    z = (F.col("v") - F.col("mu")) / F.col("sd")
    return rolled.select(
        "event_type",
        "day",
        F.col("n_window").cast("long").alias("n_window"),
        F.round(z, 4).alias("rolling_z"),
        (F.abs(z) > 2.5).alias("is_anomaly"),
    )


@query(
    "agg-moments-battery",
    oracle="""
        WITH m AS (
            SELECT event_type,
                   CAST(count(*) AS BIGINT) AS n,
                   avg(value) AS m1,
                   avg(value * value) AS m2,
                   avg(value * value * value) AS m3,
                   avg(value * value * value * value) AS m4
            FROM events GROUP BY event_type
        )
        SELECT event_type, n,
               round(m1, 6) AS mean,
               round(m2 - m1 * m1, 6) AS variance,
               round((m3 - 3 * m1 * m2 + 2 * m1 * m1 * m1)
                     / pow(m2 - m1 * m1, 1.5), 6) AS skewness_g1,
               round((m4 - 4 * m1 * m3 + 6 * m1 * m1 * m2 - 3 * pow(m1, 4))
                     / pow(m2 - m1 * m1, 2) - 3, 6) AS excess_kurtosis_g2
        FROM m
    """,
    doc="Distribution-shape battery from RAW MOMENTS: population "
    "skewness g1 and excess kurtosis g2 assembled from avg(x^k), "
    "k=1..4, rather than the engines' skewness()/kurtosis() "
    "builtins — deliberately, because those builtins disagree "
    "(Spark returns population g-statistics, DuckDB "
    "bias-corrected sample G-statistics), the kind of silent "
    "semantic divergence a cross-engine contract must pin down. "
    "Moment sums are map-side-combinable, so all four moments ride "
    "ONE grouped aggregate over one scan — the same single-shuffle "
    "bound as agg-stats, with the shape statistics as pure "
    "post-arithmetic on the collapsed rows.",
)
def agg_moments_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    x = F.col("value")
    m = ev.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n"),
        F.avg(x).alias("m1"),
        F.avg(x * x).alias("m2"),
        F.avg(x * x * x).alias("m3"),
        F.avg(x * x * x * x).alias("m4"),
    )
    m1, m2, m3, m4 = F.col("m1"), F.col("m2"), F.col("m3"), F.col("m4")
    var = m2 - m1 * m1
    return m.select(
        "event_type",
        "n",
        F.round(m1, 6).alias("mean"),
        F.round(var, 6).alias("variance"),
        F.round((m3 - 3 * m1 * m2 + 2 * m1 * m1 * m1) / F.pow(var, 1.5), 6).alias(
            "skewness_g1"
        ),
        F.round(
            (m4 - 4 * m1 * m3 + 6 * m1 * m1 * m2 - 3 * F.pow(m1, 4)) / F.pow(var, 2)
            - 3,
            6,
        ).alias("excess_kurtosis_g2"),
    )


# Poisson(1) inverse-CDF breakpoints (cumulative probabilities for
# counts 0..3; the >0.981 tail collapses to 4 — error mass < 0.4%).
_BOOT_REPS = 16
_POIS_CDF = (0.367879, 0.735759, 0.919699, 0.981012)


@query(
    "sample-poisson-bootstrap",
    oracle=f"""
        WITH reps AS (SELECT range AS rep FROM range(0, {_BOOT_REPS})),
        weighted AS (
            SELECT rep, value,
                   CASE
                     WHEN u < {_POIS_CDF[0]} THEN 0
                     WHEN u < {_POIS_CDF[1]} THEN 1
                     WHEN u < {_POIS_CDF[2]} THEN 2
                     WHEN u < {_POIS_CDF[3]} THEN 3
                     ELSE 4
                   END AS w
            FROM (
                SELECT rep, value,
                       CAST(('0x' || substring(
                            md5(CAST(event_id AS VARCHAR) || ':' ||
                                CAST(rep AS VARCHAR)), 1, 12)) AS BIGINT)
                           / 281474976710656.0 AS u
                FROM events CROSS JOIN reps
            )
        ),
        rep_means AS (
            SELECT rep,
                   round(sum(w * value) / sum(w), 6) AS boot_mean
            FROM weighted
            GROUP BY rep
        )
        SELECT CAST(count(*) AS BIGINT) AS n_replicas,
               round(avg(boot_mean), 6) AS mean_of_means,
               round(quantile_cont(boot_mean, 0.025), 6) AS ci_lo,
               round(quantile_cont(boot_mean, 0.975), 6) AS ci_hi,
               round(stddev_samp(boot_mean), 6) AS boot_se
        FROM rep_means
    """,
    doc=f"Distributed Poisson bootstrap ({_BOOT_REPS} replicas): instead "
    "of resampling-with-replacement (which cannot shard — a resample "
    "needs global coordination), every row draws an independent "
    "Poisson(1) weight PER REPLICA via inverse-CDF on a salted-hash "
    "uniform, and weighted means per replica give the sampling "
    "distribution — the standard trick that makes bootstrap "
    "confidence intervals embarrassingly parallel (each partition "
    "contributes weighted partials; one groupBy on replica id). "
    "Hash-derived uniforms make it deterministic and "
    "oracle-checkable, same rationale as privacy-dp-laplace's "
    "noise. The 16x row fan-out happens AFTER column pruning (only "
    "event_id+value survive the scan), and replica partials "
    "map-side-combine, so the shuffle is 16 rows of sums.",
)
def sample_poisson_bootstrap(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("event_id", "value")
    reps = spark.range(_BOOT_REPS).select(F.col("id").alias("rep"))
    u = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col("event_id").cast("string"),
                        F.lit(":"),
                        F.col("rep").cast("string"),
                    )
                ),
                1,
                12,
            ),
            16,
            10,
        ).cast("double")
        / 281474976710656.0
    )
    w = (
        F.when(u < _POIS_CDF[0], 0)
        .when(u < _POIS_CDF[1], 1)
        .when(u < _POIS_CDF[2], 2)
        .when(u < _POIS_CDF[3], 3)
        .otherwise(4)
    )
    rep_means = (
        ev.crossJoin(F.broadcast(reps))
        .select("rep", "value", w.alias("w"))
        .groupBy("rep")
        .agg(
            F.round(
                F.sum(F.col("w") * F.col("value")) / F.sum("w"), 6
            ).alias("boot_mean")
        )
    )
    return rep_means.agg(
        F.count("*").cast("long").alias("n_replicas"),
        F.round(F.avg("boot_mean"), 6).alias("mean_of_means"),
        F.round(F.percentile(F.col("boot_mean"), F.lit(0.025)), 6).alias("ci_lo"),
        F.round(F.percentile(F.col("boot_mean"), F.lit(0.975)), 6).alias("ci_hi"),
        F.round(F.stddev_samp("boot_mean"), 6).alias("boot_se"),
    )
