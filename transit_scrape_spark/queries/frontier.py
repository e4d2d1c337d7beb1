"""Frontier Spark-4 surface (VERDICT r2 item 8): VARIANT shredded
storage + lateral explode, and AQE skew-join handling on a deliberately
skewed key (the runtime companion of scale_demo's manual salting ops).

All fully oracled: the variant payloads are synthesized from fixture
columns with format_string, so DuckDB reproduces every extracted value
arithmetically without needing a variant type; the skew ops' oracle is
the plain join the mitigations must not change.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from transit_scrape_spark.queries.registry import query
from transit_scrape_spark.sources.fixtures import fixture_dir
from transit_scrape_spark.sources.tables import load_table

# --- VARIANT ---------------------------------------------------------------


def _synth_variant(ev: DataFrame) -> DataFrame:
    """Deterministic open-schema JSON per event, parsed once to VARIANT
    (the parse-at-ingest half of the shredded storage model)."""
    # to_json, never format_string interpolation: a control character or
    # quote inside event_type (hostile fixture: '  x \t') must be escaped
    # or the synthesized record is not JSON at all.
    payload = F.to_json(
        F.struct(
            F.col("user_id").alias("a"),
            F.array(F.col("event_id") % 100, F.col("user_id") % 50).alias("arr"),
            F.coalesce(F.col("event_type"), F.lit("N/A")).alias("tag"),
        )
    )
    return ev.select("event_id", F.parse_json(payload).alias("v"))


@query(
    "variant-shredded-roundtrip",
    oracle="""
        SELECT event_id,
               CAST(user_id AS BIGINT) AS a,
               CAST(event_id % 100 AS BIGINT) AS arr0,
               coalesce(event_type, 'N/A') AS tag,
               'OBJECT<a: BIGINT, arr: ARRAY<BIGINT>, tag: STRING>' AS vschema
        FROM events
    """,
    doc="VARIANT shredded-storage round-trip (Spark 4, the step beyond "
    "json-variant's in-memory parse): parse_json at ingest -> VARIANT "
    "column WRITTEN to parquet (binary shredded encoding, not a JSON "
    "string) -> read back -> typed variant_get extraction + per-row "
    "schema_of_variant. This is the parse-once/store-binary/extract-"
    "columnar model that replaces string-JSON reparsing at 100 TB; the "
    "parquet fixture is content-keyed and built once. Oracle recomputes "
    "every extracted value arithmetically from the source columns.",
)
def variant_shredded_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    def build(d: str) -> None:
        ev = load_table(spark, sf_dir, "events")
        _synth_variant(ev).write.mode("overwrite").parquet(f"{d}/data")

    path = fixture_dir("tss_variant", sf_dir, build) + "/data"
    back = spark.read.parquet(path)
    return back.select(
        "event_id",
        F.variant_get("v", "$.a", "long").alias("a"),
        F.variant_get("v", "$.arr[0]", "long").alias("arr0"),
        F.variant_get("v", "$.tag", "string").alias("tag"),
        F.schema_of_variant(F.col("v")).alias("vschema"),
    )


@query(
    "variant-explode-agg",
    oracle="""
        SELECT event_type,
               CAST(count(*) * 3 AS BIGINT) AS n_elems,
               CAST(sum(event_id % 7 + user_id % 5 + event_id % 3) AS BIGINT)
                   AS total
        FROM events
        GROUP BY event_type
    """,
    doc="LATERAL variant_explode (Spark 4 table function) over a "
    "variant array: each event's 3-element array fans out to rows "
    "joined laterally (no Python, no UDTF), then reaggregates per "
    "event_type. The lateral join is row-local — no shuffle added "
    "beyond the final groupBy; at scale this is how nested variant "
    "collections unnest without exploding through a string-JSON "
    "reparse. Oracle folds the same arithmetic without the fan-out.",
)
def variant_explode_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    payload = F.format_string(
        "[%d, %d, %d]",
        F.col("event_id") % 7,
        F.col("user_id") % 5,
        F.col("event_id") % 3,
    )
    ev.select("event_type", F.parse_json(payload).alias("v")).createOrReplaceTempView(
        "tss_variant_src"
    )
    try:
        return spark.sql(
            """
            SELECT event_type,
                   count(*) AS n_elems,
                   sum(cast(value AS BIGINT)) AS total
            FROM tss_variant_src, LATERAL variant_explode(v)
            GROUP BY event_type
            """
        )
    finally:
        # spark.sql analyzes eagerly; dropping right away keeps the
        # shared session's temp-view namespace clean across ops.
        spark.catalog.dropTempView("tss_variant_src")


# --- skew-join mitigation --------------------------------------------------

_SKEW_ORACLE = """
    SELECT n.n_name,
           CAST(count(*) AS BIGINT) AS n_events,
           round(sum(e.value), 2) AS total_value
    FROM (
        SELECT CASE WHEN user_id % 10 < 7 THEN 0 ELSE user_id % 25 END
                   AS skew_key,
               value
        FROM events
    ) e
    JOIN nation n ON e.skew_key = n.n_nationkey
    GROUP BY n.n_name
"""


def _skewed_fact(ev: DataFrame) -> DataFrame:
    """~70% of rows land on key 0 — the hot-key shape that stalls one
    reducer in a plain shuffle join."""
    key = F.when(F.col("user_id") % 10 < 7, F.lit(0)).otherwise(
        F.col("user_id") % 25
    )
    return ev.select(key.cast("int").alias("skew_key"), "value")


@query(
    "join-skew-aqe",
    oracle=_SKEW_ORACLE,
    doc="The same hot-key join handled by AQE skew-join instead of "
    "manual salting: adaptive execution detects the oversized partition "
    "at runtime and splits it across reducers (thresholds lowered "
    "inside the op so the tiny test fact actually trips the detector; "
    "production defaults — 256 MB partition threshold, 5x median factor "
    "— fire on real 100 TB skew without any query rewrite). merge hint "
    "pins the sort-merge join AQE's OptimizeSkewedJoin rule rewrites. "
    "Confs are set/restored try/finally so neighbouring ops see their "
    "session unchanged.",
)
def join_skew_aqe(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    nation = load_table(spark, sf_dir, "nation")
    confs = {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.0",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "64KB",
    }
    old = {}
    for k, v in confs.items():
        try:
            old[k] = spark.conf.get(k)
        except Exception:
            old[k] = None
        spark.conf.set(k, v)
    try:
        fact = _skewed_fact(ev)
        dim = nation.select(
            F.col("n_nationkey").cast("int").alias("skew_key"), "n_name"
        )
        joined = fact.hint("merge").join(dim, "skew_key")
        # localCheckpoint is EAGER: the join executes here, while the
        # lowered thresholds are in force (a lazily returned plan would
        # run after the finally restored them); the few-hundred-row
        # aggregate is what gets checkpointed, not the fact table
        return (
            joined.groupBy("n_name")
            .agg(
                F.count("*").alias("n_events"),
                F.round(F.sum("value"), 2).alias("total_value"),
            )
            .localCheckpoint()
        )
    finally:
        for k, v in old.items():
            if v is None:
                try:
                    spark.conf.unset(k)
                except Exception:
                    pass
            else:
                spark.conf.set(k, v)


_SKEW_FF_ORACLE = """
    SELECT r.bucket,
           CAST(count(*) AS BIGINT) AS n_rows,
           round(sum(l.value), 2) AS total_value
    FROM (
        SELECT CASE WHEN user_id % 10 < 7 THEN 0 ELSE user_id % 25 END
                   AS skew_key,
               value
        FROM events
    ) l
    JOIN (
        SELECT DISTINCT
               CASE WHEN user_id % 10 < 7 THEN 0 ELSE user_id % 25 END
                   AS skew_key,
               CAST(event_id % 20 AS BIGINT) AS bucket
        FROM events
    ) r ON l.skew_key = r.skew_key
    GROUP BY r.bucket
"""


def run_skew_fact_fact(spark: SparkSession, sf_dir: str):
    """Build + EXECUTE the skewed fact-fact join under lowered AQE skew
    thresholds; returns (result_df, final_executed_plan_string) so both
    the registered op and the plan-shape test can assert the skew split
    actually fired (VERDICT r3 item 4)."""
    ev = load_table(spark, sf_dir, "events")
    confs = {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.0",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "4KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "4KB",
        # no broadcast escape hatch: both sides must shuffle
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    }
    old = {}
    for k, v in confs.items():
        try:
            old[k] = spark.conf.get(k)
        except Exception:
            old[k] = None
        spark.conf.set(k, v)
    try:
        # AQE splits a skewed reduce partition by MAPPER ranges
        # (ShufflePartitionsUtil.createSkewPartitionSpecs): a shuffle fed
        # by a single map task is unsplittable and the detector reports
        # 0 skewed partitions no matter how large the hot key is. A
        # cluster fact scan has thousands of mappers; the local
        # single-file fixture scan has ONE, so give the fact side real
        # mapper parallelism before the join shuffle.
        left = _skewed_fact(ev.repartition(16))
        right = ev.select(
            F.when(F.col("user_id") % 10 < 7, F.lit(0))
            .otherwise(F.col("user_id") % 25)
            .cast("int")
            .alias("skew_key"),
            (F.col("event_id") % 20).cast("long").alias("bucket"),
        ).distinct()
        agg = (
            left.hint("merge")
            .join(right, "skew_key")
            .groupBy("bucket")
            .agg(
                F.count("*").cast("long").alias("n_rows"),
                F.round(F.sum("value"), 2).alias("total_value"),
            )
        )
        # EAGER: the join runs here, with the lowered thresholds in force
        out = agg.localCheckpoint()
        plan = agg._jdf.queryExecution().executedPlan().toString()
        return out, plan
    finally:
        for k, v in old.items():
            if v is None:
                try:
                    spark.conf.unset(k)
                except Exception:
                    pass
            else:
                spark.conf.set(k, v)


@query(
    "join-skew-fact-fact-aqe",
    oracle=_SKEW_FF_ORACLE,
    doc="Skewed FACT-FACT join proof for AQE's runtime skew split "
    "(join-skew-aqe's dim-join sibling, but with broadcast disabled so "
    "BOTH sides shuffle — the shape where skew actually stalls a "
    "1000-executor cluster, because no side fits in memory and the hot "
    "key's partition pins one reducer). ~70% of left rows share "
    "skew_key 0; OptimizeSkewedJoin detects the oversized partition at "
    "runtime and splits it across reducers, duplicating the matching "
    "right-side partition. The op ASSERTS from the final adaptive plan "
    "that the split fired (SortMergeJoin(skew=true)) — a correct "
    "answer through an unsplit plan would be the 100 TB bug this op "
    "exists to catch. Thresholds are lowered so the tiny fixture trips "
    "the detector; production defaults fire on real skew unchanged.",
)
def join_skew_fact_fact_aqe(spark: SparkSession, sf_dir: str) -> DataFrame:
    out, plan = run_skew_fact_fact(spark, sf_dir)
    # an empty fact table has no skew to split — the demonstration
    # contract only binds when there are rows to skew. Gate the
    # exemption on the INPUT being empty, not the output: an empty
    # output can also mean a regression silently dropped every row,
    # which is exactly what this assert exists to catch.
    events_empty = load_table(spark, sf_dir, "events").isEmpty()
    assert "skew=true" in plan or events_empty, "AQE skew split did not fire"
    return out


@query(
    "join-bloom-runtime-filter",
    oracle="""
        SELECT l.l_returnflag,
               CAST(count(*) AS BIGINT) AS n,
               round(sum(l.l_extendedprice), 2) AS revenue
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        WHERE o.o_orderpriority = '1-URGENT'
        GROUP BY l.l_returnflag
    """,
    doc="Runtime bloom-filter semi-join reduction (Spark 3.3+ "
    "InjectRuntimeFilter): the selective dim side (urgent orders) "
    "builds a bloom filter that is pushed into the fact scan as a "
    "might-contain predicate, so lineitem rows that cannot join are "
    "dropped AT THE SCAN, before the shuffle — at 100 TB this is the "
    "difference between shuffling the whole fact table and shuffling "
    "the ~20% that survives. Thresholds are lowered inside the op so "
    "the tiny test tables actually trip the injection rule "
    "(production defaults: 10 MB creation side / 10 GB application "
    "side); confs restored try/finally, result materialized eagerly "
    "via localCheckpoint while they are in force. Values must equal "
    "the plain join (the filter is sound: false positives only).",
)
def join_bloom_runtime_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "1GB",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.optimizer.runtimeFilter.number.threshold": "10",
        # InjectRuntimeFilter skips joins that will broadcast (a
        # broadcast join already prunes at the scan); disable
        # auto-broadcast so the test-scale join takes the shuffle path
        # it would take at 100 TB, where neither side broadcasts
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    old: dict[str, str | None] = {}
    for k, v in confs.items():
        try:
            old[k] = spark.conf.get(k)
        except Exception:
            old[k] = None
        spark.conf.set(k, v)
    try:
        urgent = o.filter(F.col("o_orderpriority") == "1-URGENT")
        joined = li.join(urgent, li.l_orderkey == urgent.o_orderkey)
        out = joined.groupBy("l_returnflag").agg(
            F.count("*").cast("long").alias("n"),
            F.round(F.sum("l_extendedprice"), 2).alias("revenue"),
        )
        # the point of the exercise: the bloom filter reached the scan
        plan = out._jdf.queryExecution().optimizedPlan().toString()
        assert "might_contain" in plan, "runtime bloom filter not injected"
        return out.localCheckpoint()
    finally:
        for k, v in old.items():
            if v is None:
                try:
                    spark.conf.unset(k)
                except Exception:
                    pass
            else:
                spark.conf.set(k, v)


_RCTE_SQL = """
    WITH RECURSIVE tree AS (
        SELECT CAST(n_nationkey AS BIGINT) AS node,
               CAST(0 AS BIGINT) AS depth,
               CAST(n_nationkey AS {str_t}) AS path
        FROM {tbl} WHERE n_nationkey = 0
        UNION ALL
        SELECT CAST(c.n_nationkey AS BIGINT),
               t.depth + 1,
               t.path || '->' || CAST(c.n_nationkey AS {str_t})
        FROM {tbl} c JOIN tree t
          ON CAST(floor((c.n_nationkey - 1) / 5) AS BIGINT) = t.node
         AND c.n_nationkey > 0
    )
    SELECT node, depth, path FROM tree
"""


@query(
    "sql-recursive-cte",
    oracle=_RCTE_SQL.format(str_t="VARCHAR", tbl="nation"),
    doc="WITH RECURSIVE (new in Spark 4.0 — closes the one ANSI gap "
    "the graph module's driver-loop ops worked around): hierarchy "
    "walk over an acyclic parent tree (parent(k) = floor((k-1)/5)) "
    "accumulating depth and the root->node path string. Each "
    "recursion step is a join of the previous frontier against the "
    "dim — the engine runs the same iterate-until-empty loop "
    "graph-components-iterative codes by hand, but planned natively. "
    "Acyclic + UNION ALL keeps Spark and DuckDB semantics identical "
    "(cyclic graphs need UNION dedup, which the engines stage "
    "differently). For unbounded 100 TB hierarchies prefer the "
    "driver-loop with checkpointing; recursive CTE state lives in one "
    "query execution.",
)
def sql_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    # prefixed view name so the shared long-lived session never has a
    # temp view shadowing the 'nation' catalog/base-table name; spark.sql
    # analyzes eagerly, so dropping the view right after is safe.
    load_table(spark, sf_dir, "nation").createOrReplaceTempView("tss_rcte_nation")
    try:
        return spark.sql(_RCTE_SQL.format(str_t="STRING", tbl="tss_rcte_nation"))
    finally:
        spark.catalog.dropTempView("tss_rcte_nation")


@query(
    "sql-collation-ci",
    oracle="""
        SELECT min(lower(s)) AS segment_ci,
               CAST(count(*) AS BIGINT) AS n
        FROM (
            SELECT CASE WHEN c_custkey % 2 = 0
                        THEN upper(c_mktsegment)
                        ELSE lower(c_mktsegment) END AS s
            FROM customer
        )
        GROUP BY lower(s)
    """,
    doc="Collation-aware grouping (Spark 4 collations — comparison "
    "semantics attached to the TYPE, evaluated JVM-side): mixed-case "
    "segment strings group under UNICODE_CI without materializing a "
    "normalized key column; the aggregate emits min(lower(s)) as the "
    "canonical representative because the group's chosen display value "
    "is otherwise first-seen-wins nondeterministic. At scale, "
    "collation on the column type means every join/group/sort on that "
    "column is consistently case-insensitive with no scattered "
    "lower() wrappers to forget (the classic silent-dup bug in "
    "user-id joins). Oracle normalizes with lower() explicitly — the "
    "pre-collations workaround the feature replaces.",
)
def sql_collation_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    mixed = c.select(
        F.when(
            F.col("c_custkey") % 2 == 0, F.upper("c_mktsegment")
        ).otherwise(F.lower("c_mktsegment")).alias("s")
    )
    return mixed.groupBy(
        F.expr("collate(s, 'UNICODE_CI')").alias("k")
    ).agg(
        F.min(F.lower("s")).alias("segment_ci"),
        F.count("*").cast("long").alias("n"),
    ).drop("k")


@query(
    "join-null-safe-eq",
    oracle="""
        SELECT coalesce(n.n_name, '<null-key>') AS name,
               CAST(count(*) AS BIGINT) AS n_customers
        FROM (
            SELECT CASE WHEN c_custkey % 7 = 0 THEN NULL
                        ELSE c_nationkey END AS k
            FROM customer
        ) c
        JOIN (
            SELECT CASE WHEN n_nationkey = 13 THEN NULL
                        ELSE n_nationkey END AS k,
                   n_name
            FROM nation
        ) n ON c.k IS NOT DISTINCT FROM n.k
        GROUP BY coalesce(n.n_name, '<null-key>')
    """,
    doc="Null-safe equality join (<=> / IS NOT DISTINCT FROM): NULL "
    "keys MATCH each other instead of silently dropping — the "
    "semantics ETL needs when NULL is a real category (unknown "
    "region) rather than absent data. Catalyst plans EqualNullSafe as "
    "a hash join key (null hashes to a bucket like any value), so the "
    "plan is the same shuffle/broadcast hash join as plain equality — "
    "no nested-loop degradation. The NULL bucket is a built-in skew "
    "hazard at 100 TB (every null-key row lands on one reducer): "
    "filter-split or salt it when nulls dominate, exactly like any "
    "hot key.",
)
def join_null_safe_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select(
        F.when(F.col("c_custkey") % 7 == 0, F.lit(None))
        .otherwise(F.col("c_nationkey"))
        .alias("k")
    )
    n = load_table(spark, sf_dir, "nation").select(
        F.when(F.col("n_nationkey") == 13, F.lit(None))
        .otherwise(F.col("n_nationkey"))
        .alias("k"),
        "n_name",
    )
    joined = c.join(F.broadcast(n), c["k"].eqNullSafe(n["k"]))
    return joined.groupBy(
        F.coalesce(F.col("n_name"), F.lit("<null-key>")).alias("name")
    ).agg(F.count("*").cast("long").alias("n_customers"))


# --- SQL scripting / variables / parameters (Spark 4) ----------------------


@query(
    "sql-scripting-block",
    oracle="""
        SELECT c_mktsegment,
               CAST(count(*) AS BIGINT) AS n
        FROM customer
        GROUP BY c_mktsegment
        HAVING count(*) > (SELECT count(*) / 10 FROM customer)
        ORDER BY c_mktsegment
    """,
    doc="SQL scripting (Spark 4.0 GA, ANSI/PSM-style): BEGIN/DECLARE/"
    "SET/compound-statement block computes a threshold scalar "
    "procedurally, then the final SELECT uses it — the stored-"
    "procedure shape ported from warehouse engines without a UDF or "
    "driver-side Python glue. Control flow runs on the DRIVER between "
    "statements; each SQL statement inside is a full distributed "
    "Catalyst query, so scripting adds orchestration, never a "
    "row-at-a-time path. Oracle folds the threshold into a scalar "
    "subquery (what the script's variable materializes).",
)
def sql_scripting_block(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "customer").createOrReplaceTempView(
        "tss_script_cust"
    )
    old = None
    try:
        old = spark.conf.get("spark.sql.scripting.enabled", None)
        spark.conf.set("spark.sql.scripting.enabled", "true")
        out = spark.sql(
            """
            BEGIN
              DECLARE thresh BIGINT DEFAULT 0;
              SET thresh = (SELECT count(*) / 10 FROM tss_script_cust);
              SELECT c_mktsegment,
                     count(*) AS n
              FROM tss_script_cust
              GROUP BY c_mktsegment
              HAVING count(*) > thresh
              ORDER BY c_mktsegment;
            END
            """
        )
        # scripting executes the block during spark.sql(); pin the final
        # result so view/conf teardown below cannot invalidate it
        return out.localCheckpoint()
    finally:
        if old is None:
            try:
                spark.conf.unset("spark.sql.scripting.enabled")
            except Exception:
                pass
        else:
            spark.conf.set("spark.sql.scripting.enabled", old)
        spark.catalog.dropTempView("tss_script_cust")


@query(
    "sql-execute-immediate",
    oracle="""
        SELECT o_orderpriority,
               CAST(count(*) AS BIGINT) AS n,
               round(sum(o_totalprice), 2) AS total
        FROM orders
        WHERE o_orderstatus = 'F'
        GROUP BY o_orderpriority
    """,
    doc="EXECUTE IMMEDIATE (Spark 4): a query assembled as a string at "
    "runtime with positional ? parameters bound via USING — the "
    "dynamic-SQL surface migrations from Snowflake/BigQuery scripts "
    "expect. Parameter BINDING (not string splicing) means the "
    "literal reaches Catalyst as a typed parameter: no injection, and "
    "the plan is identical to writing the literal inline — filter "
    "pushdown into the scan included.",
)
def sql_execute_immediate(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "orders").createOrReplaceTempView(
        "tss_ei_orders"
    )
    try:
        return spark.sql(
            """
            EXECUTE IMMEDIATE
              'SELECT o_orderpriority,
                      count(*) AS n,
                      round(sum(o_totalprice), 2) AS total
               FROM tss_ei_orders
               WHERE o_orderstatus = ?
               GROUP BY o_orderpriority'
            USING 'F'
            """
        )
    finally:
        spark.catalog.dropTempView("tss_ei_orders")


@query(
    "sql-named-parameters",
    oracle="""
        SELECT l_returnflag,
               CAST(count(*) AS BIGINT) AS n,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM lineitem
        WHERE l_quantity BETWEEN 10 AND 40 AND l_discount >= 0.03
        GROUP BY l_returnflag
    """,
    doc="Named-parameter SQL (spark.sql(query, args={...}), Spark "
    "3.4+/4): the host language passes typed values into :named "
    "placeholders — the safe templating path for programmatic query "
    "construction (vs f-string splicing, which breaks on quotes and "
    "invites injection). Parameters are bound pre-analysis, so "
    "constant folding and parquet filter pushdown see the literals: "
    "the plan is byte-identical to the inlined query.",
)
def sql_named_parameters(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView(
        "tss_np_lineitem"
    )
    try:
        return spark.sql(
            """
            SELECT l_returnflag,
                   count(*) AS n,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
            FROM tss_np_lineitem
            WHERE l_quantity BETWEEN :qlo AND :qhi AND l_discount >= :dmin
            GROUP BY l_returnflag
            """,
            args={"qlo": 10, "qhi": 40, "dmin": 0.03},
        )
    finally:
        spark.catalog.dropTempView("tss_np_lineitem")


@query(
    "sql-session-variables",
    oracle="""
        SELECT c_mktsegment,
               CAST(count(*) AS BIGINT) AS n_rich
        FROM customer
        WHERE c_acctbal > 5000.0
        GROUP BY c_mktsegment
    """,
    doc="Session variables (DECLARE VARIABLE / SET VAR, Spark 4): a "
    "typed scalar lives in the session and parameterizes later "
    "queries — the cross-statement state SQL scripts share without a "
    "temp table. The variable is resolved to a literal at analysis "
    "(plan shows the folded constant, pushdown intact). Variable is "
    "DROPped in a finally so the shared long-lived session never "
    "leaks state between ops.",
)
def sql_session_variables(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "customer").createOrReplaceTempView(
        "tss_sv_cust"
    )
    try:
        spark.sql("DECLARE OR REPLACE VARIABLE tss_min_bal DOUBLE")
        spark.sql("SET VAR tss_min_bal = 5000.0")
        return spark.sql(
            """
            SELECT c_mktsegment, count(*) AS n_rich
            FROM tss_sv_cust
            WHERE c_acctbal > tss_min_bal
            GROUP BY c_mktsegment
            """
        )
    finally:
        try:
            spark.sql("DROP TEMPORARY VARIABLE IF EXISTS tss_min_bal")
        except Exception:
            pass
        spark.catalog.dropTempView("tss_sv_cust")


@query(
    "variant-get-typed",
    oracle="""
        SELECT o_orderpriority,
               CAST(sum(o_custkey % 100) AS BIGINT) AS cust_bucket_sum,
               CAST(sum(CASE WHEN o_totalprice > 150000.0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_big,
               CAST(sum(o_orderkey % 7) AS BIGINT) AS first_item_sum
        FROM orders
        GROUP BY o_orderpriority
    """,
    doc="Typed variant_get over NESTED paths ($.cust.bucket, "
    "$.flags.big, $.items[0]) — the third VARIANT op: -roundtrip "
    "covers shredded storage, -explode-agg covers lateral unnest, "
    "this covers typed point extraction, the hot path of "
    "schema-on-read analytics. Each variant_get(v, path, type) is a "
    "codegen expression over the binary variant encoding: no JSON "
    "re-parse per access (parse_json ran ONCE at ingest), which is "
    "the entire scale argument for VARIANT over string JSON at "
    "100 TB. Oracle reconstructs the same values arithmetically from "
    "the source columns the payload was synthesized from.",
)
def variant_get_typed(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    payload = F.format_string(
        '{"cust": {"id": %d, "bucket": %d}, '
        '"flags": {"big": %s}, "items": [%d, %d]}',
        F.col("o_custkey"),
        F.col("o_custkey") % 100,
        F.when(F.col("o_totalprice") > 150000.0, F.lit("true")).otherwise(
            F.lit("false")
        ),
        F.col("o_orderkey") % 7,
        F.col("o_orderkey") % 11,
    )
    v = o.select(
        "o_orderpriority", F.parse_json(payload).alias("v")
    )
    return v.groupBy("o_orderpriority").agg(
        F.sum(F.expr("variant_get(v, '$.cust.bucket', 'bigint')"))
        .cast("long")
        .alias("cust_bucket_sum"),
        F.sum(
            F.when(
                F.expr("variant_get(v, '$.flags.big', 'boolean')"), 1
            ).otherwise(0)
        )
        .cast("long")
        .alias("n_big"),
        F.sum(F.expr("variant_get(v, '$.items[0]', 'bigint')"))
        .cast("long")
        .alias("first_item_sum"),
    )


@query(
    "join-lateral-correlated",
    oracle="""
        SELECT n_name, c_name, c_acctbal
        FROM (
            SELECT n.n_name, c.c_name,
                   round(c.c_acctbal, 2) AS c_acctbal,
                   row_number() OVER (PARTITION BY n.n_nationkey
                                      ORDER BY c.c_acctbal DESC,
                                               c.c_custkey) AS rn
            FROM (SELECT DISTINCT n_nationkey, n_name FROM nation) n
            JOIN customer c ON c.c_nationkey = n.n_nationkey
        )
        WHERE rn <= 2
    """,
    doc="Correlated LATERAL subquery join (Spark 3.2+): per nation, a "
    "LATERAL (... WHERE c_nationkey = n.n_nationkey ORDER BY acctbal "
    "LIMIT 2) computes top-2 customers with the outer row in scope — "
    "the ANSI way to express per-group top-k as a join. Catalyst "
    "DECORRELATES it: the executed plan is a window/rank over one "
    "shuffle of customer, not a per-nation re-scan (N scans of a "
    "100 TB fact is the naive-correlation disaster; decorrelation is "
    "what makes LATERAL usable at scale). Oracle states the "
    "decorrelated form directly.",
)
def join_lateral_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    # nation rows must be key-unique: LATERAL runs per OUTER ROW, so a
    # duplicated dimension row doubles its top-k block while the
    # decorrelated oracle (rank per KEY) does not
    load_table(spark, sf_dir, "nation").dropDuplicates(
        ["n_nationkey"]
    ).createOrReplaceTempView("tss_lat_nation")
    load_table(spark, sf_dir, "customer").createOrReplaceTempView(
        "tss_lat_cust"
    )
    try:
        return spark.sql(
            """
            SELECT n.n_name, t.c_name, round(t.c_acctbal, 2) AS c_acctbal
            FROM tss_lat_nation n,
            LATERAL (
                SELECT c_name, c_acctbal
                FROM tss_lat_cust c
                WHERE c.c_nationkey = n.n_nationkey
                ORDER BY c.c_acctbal DESC, c.c_custkey
                LIMIT 2
            ) t
            """
        )
    finally:
        spark.catalog.dropTempView("tss_lat_nation")
        spark.catalog.dropTempView("tss_lat_cust")


@query(
    "stream-state-reader",
    oracle="""
        SELECT event_type, CAST(count(*) AS BIGINT) AS n
        FROM events
        GROUP BY event_type
    """,
    doc="State data source reader (Spark 4): a checkpointed streaming "
    "aggregation's STATE STORE read back as a plain DataFrame "
    "(spark.read.format('statestore').load(checkpoint)) — the "
    "observability surface that turns opaque HDFS state files into "
    "queryable rows for debugging stuck watermarks, hot keys, and "
    "state bloat in production streams. The state rows for a "
    "groupBy-count ARE the per-key counts, so the oracle is the batch "
    "aggregate: state contents must equal what a from-scratch batch "
    "run computes (exactly-once replay made inspectable). Checkpoint "
    "is content-keyed and built once; state partition sizing follows "
    "the streaming module's fixed-cost-per-partition analysis.",
)
def stream_state_reader(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    from transit_scrape_spark.queries.streaming import (
        _events_stream,
        _state_partitions_sized_to_cluster,
        audited_await,
    )
    from transit_scrape_spark.sources.fixtures import content_tag

    # built in place, not via fixture_dir's atomic rename: checkpoints
    # pin absolute paths (same constraint as stream-append-sink). Keyed
    # per SESSION (applicationId), not just per content: the statestore
    # reader resolves state through the driver's StateStoreCoordinator,
    # which only exists after this session has run a streaming query —
    # reusing another process's checkpoint without running one fails
    # with RpcEndpointNotFoundException. One ~2s build per session.
    tag = f"{content_tag(sf_dir)}_{spark.sparkContext.applicationId}"
    ckpt = f"/tmp/tss_state_reader_{tag}/ckpt"
    os.makedirs(os.path.dirname(ckpt), exist_ok=True)
    if not os.path.isdir(f"{ckpt}/state"):
        agg = _events_stream(spark, sf_dir).groupBy("event_type").agg(
            F.count("*").alias("n")
        )
        with _state_partitions_sized_to_cluster(spark):
            q = (
                agg.writeStream.outputMode("complete")
                .format("noop")
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            audited_await(q)
    state = spark.read.format("statestore").load(ckpt)
    return state.select(
        F.col("key.event_type").alias("event_type"),
        F.col("value.count").cast("long").alias("n"),
    )


@query(
    "sql-scalar-udf",
    oracle="""
        SELECT l_returnflag,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
               round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)
                   AS charged
        FROM lineitem
        GROUP BY l_returnflag
    """,
    doc="SQL-defined scalar function (CREATE FUNCTION ... RETURN expr, "
    "Spark 3.5+/4): business logic named ONCE in SQL and reused across "
    "queries — and, unlike a Python UDF, INLINED into the plan at "
    "analysis time: the executed plan shows the expanded arithmetic "
    "inside WholeStageCodegen, zero serialization boundary, identical "
    "performance to writing the expression inline. The right default "
    "for shared derivations at 100 TB; Python UDFs only where logic "
    "genuinely can't be expressions. Dropped in finally so the shared "
    "session's function namespace stays clean.",
)
def sql_scalar_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView(
        "tss_sudf_li"
    )
    try:
        spark.sql(
            "CREATE OR REPLACE TEMPORARY FUNCTION tss_disc_price"
            "(p DOUBLE, d DOUBLE) RETURNS DOUBLE RETURN p * (1 - d)"
        )
        spark.sql(
            "CREATE OR REPLACE TEMPORARY FUNCTION tss_charge"
            "(p DOUBLE, d DOUBLE, t DOUBLE) RETURNS DOUBLE "
            "RETURN tss_disc_price(p, d) * (1 + t)"
        )
        return spark.sql(
            """
            SELECT l_returnflag,
                   round(sum(tss_disc_price(l_extendedprice, l_discount)), 2)
                       AS revenue,
                   round(sum(tss_charge(l_extendedprice, l_discount, l_tax)), 2)
                       AS charged
            FROM tss_sudf_li
            GROUP BY l_returnflag
            """
        )
    finally:
        for fn in ("tss_charge", "tss_disc_price"):
            try:
                spark.sql(f"DROP TEMPORARY FUNCTION IF EXISTS {fn}")
            except Exception:
                pass
        spark.catalog.dropTempView("tss_sudf_li")


@query(
    "sql-table-udf",
    oracle="""
        SELECT n.n_name,
               CAST(count(*) AS BIGINT) AS n_rich,
               round(sum(c.c_acctbal), 2) AS bal_sum
        FROM nation n JOIN customer c
          ON c.c_nationkey = n.n_nationkey AND c.c_acctbal > 7500.0
        GROUP BY n.n_name
    """,
    doc="SQL-defined TABLE function (CREATE FUNCTION ... RETURNS TABLE "
    "RETURN SELECT, Spark 4): a parameterized view invoked per outer "
    "row via LATERAL — named, reusable row-set logic without a Python "
    "UDTF. Expanded at analysis time, so Catalyst DECORRELATES the "
    "lateral invocation into a single equi-join of customer (one "
    "shuffle/broadcast — never a per-nation re-scan of a 100 TB "
    "table). The body is deliberately filter-shaped: a LIMIT inside a "
    "correlated SQL TVF decorrelates to a GLOBAL limit in Spark 4.1 "
    "(observed: 3 rows total instead of 3 per nation), so per-group "
    "top-k belongs to window/rank ops, not TVF LIMIT. Oracle states "
    "the decorrelated join.",
)
def sql_table_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "nation").createOrReplaceTempView(
        "tss_tudf_nation"
    )
    load_table(spark, sf_dir, "customer").createOrReplaceTempView(
        "tss_tudf_cust"
    )
    try:
        spark.sql(
            """
            CREATE OR REPLACE TEMPORARY FUNCTION tss_rich_cust(
                nk INT, minbal DOUBLE)
            RETURNS TABLE(c_acctbal DOUBLE)
            RETURN SELECT c_acctbal
                   FROM tss_tudf_cust
                   WHERE c_nationkey = nk AND c_acctbal > minbal
            """
        )
        return spark.sql(
            """
            SELECT n.n_name,
                   count(*) AS n_rich,
                   round(sum(t.c_acctbal), 2) AS bal_sum
            FROM tss_tudf_nation n,
            LATERAL tss_rich_cust(n.n_nationkey, 7500.0) t
            GROUP BY n.n_name
            """
        )
    finally:
        try:
            spark.sql("DROP TEMPORARY FUNCTION IF EXISTS tss_rich_cust")
        except Exception:
            pass
        spark.catalog.dropTempView("tss_tudf_nation")
        spark.catalog.dropTempView("tss_tudf_cust")


@query(
    "sql-group-by-all",
    oracle="""
        SELECT o_orderstatus, o_orderpriority,
               CAST(count(*) AS BIGINT) AS n,
               round(sum(o_totalprice), 2) AS total
        FROM orders
        GROUP BY o_orderstatus, o_orderpriority
    """,
    doc="GROUP BY ALL (Spark 3.4+/4, ANSI-adopted sugar): every "
    "non-aggregate select item becomes a grouping key, so adding a "
    "dimension to the SELECT list cannot silently desync from the "
    "GROUP BY clause (the classic copy-paste rollup bug). Resolved at "
    "analysis to the explicit grouping — plan identical, one shuffle, "
    "map-side partial aggregation intact.",
)
def sql_group_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "orders").createOrReplaceTempView(
        "tss_gba_orders"
    )
    try:
        return spark.sql(
            """
            SELECT o_orderstatus, o_orderpriority,
                   count(*) AS n,
                   round(sum(o_totalprice), 2) AS total
            FROM tss_gba_orders
            GROUP BY ALL
            """
        )
    finally:
        spark.catalog.dropTempView("tss_gba_orders")


@query(
    "sql-limit-offset",
    oracle="""
        SELECT c_custkey, c_name
        FROM customer
        ORDER BY c_custkey
        LIMIT 20 OFFSET 40
    """,
    doc="LIMIT ... OFFSET pagination (Spark 3.4+): deterministic only "
    "over a TOTAL order (here the unique key), which the op pins — "
    "OFFSET without a total order returns an arbitrary page. Spark "
    "plans this as a global sort + offset-aware limit "
    "(TakeOrderedAndProject with offset): each partition produces its "
    "top offset+limit candidates, one merge on the driver-side "
    "collect — never a full materialized sort. Still, OFFSET cost "
    "grows linearly with page depth at 100 TB; keyset pagination "
    "(WHERE key > last_seen ORDER BY key LIMIT n) is the "
    "constant-cost shape for deep pages.",
)
def sql_limit_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return (
        c.select("c_custkey", "c_name")
        .orderBy("c_custkey")
        .offset(40)
        .limit(20)
    )


@query(
    "set-except-all",
    oracle="""
        SELECT o_orderpriority FROM orders WHERE o_orderstatus <> 'O'
        EXCEPT ALL
        SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'F'
    """,
    doc="EXCEPT ALL / INTERSECT ALL bag semantics (set-except covers "
    "the DISTINCT forms): duplicates are subtracted by MULTIPLICITY — "
    "each right occurrence cancels one left occurrence — which is the "
    "correct reconciliation semantics for ledgers and event streams "
    "where row counts mean something. Spark plans it as a single "
    "hash-aggregate computing per-value counts on both sides then "
    "replicating rows max(l-r, 0) times (generate) — one shuffle on "
    "the value, no join, no row-number trick.",
)
def set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    left = o.filter(F.col("o_orderstatus") != "O").select("o_orderpriority")
    right = o.filter(F.col("o_orderstatus") == "F").select("o_orderpriority")
    return left.exceptAll(right)


@query(
    "sql-star-except",
    oracle="""
        SELECT * EXCLUDE (o_totalprice)
        FROM orders
        WHERE o_orderkey <= 200
    """,
    doc="SELECT * EXCEPT (...) projection sugar (Spark 3.4+; DuckDB "
    "spells it EXCLUDE): project everything but the named columns — "
    "the wide-table ergonomic that keeps a 300-column scan from "
    "devolving into a hand-typed list when one column must be "
    "dropped (e.g. stripping a PII or cost column before handoff). "
    "Resolved at analysis time to an explicit projection, so column "
    "pruning still reaches the parquet scan: the excluded column is "
    "never read.",
)
def sql_star_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("tss_sse_orders")
    try:
        return spark.sql(
            """
            SELECT * EXCEPT (o_totalprice)
            FROM tss_sse_orders
            WHERE o_orderkey <= 200
            """
        )
    finally:
        spark.catalog.dropTempView("tss_sse_orders")


@query(
    "sql-order-by-all",
    oracle="""
        SELECT o_orderstatus, o_orderpriority,
               CAST(count(*) AS BIGINT) AS n
        FROM orders
        GROUP BY ALL
        ORDER BY ALL
    """,
    doc="ORDER BY ALL (Spark 4 / DuckDB convergent sugar): sort by "
    "every select-list item left to right — the deterministic-output "
    "idiom for report queries without enumerating sort keys. Plans "
    "as an ordinary global sort after the aggregation; at scale the "
    "sort runs over the collapsed aggregate cardinality, and "
    "range-partitioned sampling (Spark's sort shuffle) keeps it "
    "balanced.",
)
def sql_order_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("tss_oba_orders")
    try:
        return spark.sql(
            """
            SELECT o_orderstatus, o_orderpriority, count(*) AS n
            FROM tss_oba_orders
            GROUP BY ALL
            ORDER BY ALL
            """
        )
    finally:
        spark.catalog.dropTempView("tss_oba_orders")


@query(
    "agg-filter-clause",
    oracle="""
        SELECT l_returnflag,
               CAST(count(*) AS BIGINT) AS n_all,
               CAST(count(*) FILTER (WHERE l_discount > 0.05) AS BIGINT)
                   AS n_discounted,
               round(sum(l_extendedprice) FILTER (WHERE l_quantity >= 30), 2)
                   AS rev_bulk,
               round(avg(l_extendedprice) FILTER (WHERE l_tax = 0), 4)
                   AS avg_price_untaxed
        FROM lineitem
        GROUP BY l_returnflag
    """,
    doc="ANSI FILTER clause aggregates (Spark 3.0+): per-aggregate "
    "predicates in one pass — the pivot-lite pattern that replaces N "
    "self-joins or sum(CASE WHEN) boilerplate. All four conditional "
    "aggregates share a single scan and a single map-side-combined "
    "shuffle on the group key; each filter is evaluated per-row "
    "inside the partial aggregate, so cost is one pass regardless of "
    "how many filtered metrics are stacked.",
)
def agg_filter_clause(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("tss_afc_li")
    try:
        return spark.sql(
            """
            SELECT l_returnflag,
                   count(*) AS n_all,
                   count(*) FILTER (WHERE l_discount > 0.05) AS n_discounted,
                   round(sum(l_extendedprice) FILTER (WHERE l_quantity >= 30), 2)
                       AS rev_bulk,
                   round(avg(l_extendedprice) FILTER (WHERE l_tax = 0), 4)
                       AS avg_price_untaxed
            FROM tss_afc_li
            GROUP BY l_returnflag
            """
        )
    finally:
        spark.catalog.dropTempView("tss_afc_li")
