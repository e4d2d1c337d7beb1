"""TPC-H queries 2/8/9/11/15/16/20/21 adapted to the fixture star schema,
completing the 22-query suite (q1 in relational.py, the rest in tpch.py).

The fixture has no ``partsupp`` table and no comment/address/commitdate
columns, so the queries that depend on them are re-expressed over the
``lineitem`` part<->supplier bridge with the same *plan shape* as the
original: q2's correlated-min subquery, q11's global-share scalar
subquery, q15's argmax-by-scalar-subquery, q16's NOT IN exclusion,
q20's nested semi-join chain, q21's EXISTS/NOT-EXISTS double
self-join. Each is decorrelated the way Catalyst (or a careful human)
would: per-group aggregate joined back instead of per-row subquery
re-execution, single-row global aggregates broadcast via cross join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from transit_scrape_spark.queries.registry import query
from transit_scrape_spark.sources.tables import load_table


@query(
    "tpch-q2",
    oracle="""
        WITH cost AS (
            SELECT l.l_partkey AS partkey, l.l_suppkey AS suppkey,
                   min(l.l_extendedprice / l.l_quantity) AS unit_cost
            FROM lineitem l
            GROUP BY l.l_partkey, l.l_suppkey
        )
        SELECT s.s_acctbal, s.s_name, n.n_name, p.p_partkey,
               round(c.unit_cost, 4) AS unit_cost
        FROM cost c
        JOIN part p ON p.p_partkey = c.partkey
        JOIN supplier s ON s.s_suppkey = c.suppkey
        JOIN nation n ON n.n_nationkey = s.s_nationkey
        JOIN region r ON r.r_regionkey = n.n_regionkey
        WHERE p.p_size = 15 AND p.p_type = 'SMALL' AND r.r_name = 'EUROPE'
          AND c.unit_cost = (SELECT min(c2.unit_cost) FROM cost c2
                             JOIN supplier s2 ON s2.s_suppkey = c2.suppkey
                             JOIN nation n2 ON n2.n_nationkey = s2.s_nationkey
                             JOIN region r2 ON r2.r_regionkey = n2.n_regionkey
                             WHERE c2.partkey = c.partkey
                               AND r2.r_name = 'EUROPE')
        ORDER BY s.s_acctbal DESC, n.n_name, s.s_name, p.p_partkey
        LIMIT 20
    """,
    doc="TPC-H Q2 (minimum-cost supplier; partsupp re-derived as the "
    "min unit price per part x supplier over lineitem): the correlated "
    "min subquery is decorrelated to a per-part min aggregate joined "
    "back, and every dimension (part/supplier/nation/region) "
    "broadcasts — the only shuffle is the lineitem group-by. min() is "
    "order-insensitive so the double compares bit-exactly.",
)
def tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_size") == 15) & (F.col("p_type") == "SMALL")
    )
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    # suppliers in the region (tiny: broadcast everywhere below)
    s_eu = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    cost = li.groupBy(
        F.col("l_partkey").alias("partkey"), F.col("l_suppkey").alias("suppkey")
    ).agg(
        # try_divide: hostile zero quantities -> NULL unit cost, skipped by
        # min on both engines; an all-zero group yields NULL which the
        # unit_cost = min_cost equi-join drops identically.
        F.min(F.try_divide(F.col("l_extendedprice"), F.col("l_quantity"))).alias(
            "unit_cost"
        )
    )
    eu_cost = cost.join(F.broadcast(s_eu), cost.suppkey == s_eu.s_suppkey)
    part_min = eu_cost.groupBy(F.col("partkey").alias("pm_partkey")).agg(
        F.min("unit_cost").alias("min_cost")
    )
    return (
        eu_cost.join(
            part_min,
            (eu_cost.partkey == part_min.pm_partkey)
            & (eu_cost.unit_cost == part_min.min_cost),
        )
        .join(F.broadcast(p), eu_cost.partkey == p.p_partkey)
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            "p_partkey",
            F.round("unit_cost", 4).alias("unit_cost"),
        )
        .orderBy(
            F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey"
        )
        .limit(20)
    )


@query(
    "tpch-q8",
    oracle="""
        SELECT o_year,
               round(sum(CASE WHEN nation = 'NATION_5' THEN volume ELSE 0 END)
                     / sum(volume), 4) AS mkt_share
        FROM (
            SELECT CAST(extract(year FROM o.o_orderdate) AS BIGINT) AS o_year,
                   l.l_extendedprice * (1 - l.l_discount) AS volume,
                   n2.n_name AS nation
            FROM lineitem l
            JOIN part p ON p.p_partkey = l.l_partkey
            JOIN orders o ON o.o_orderkey = l.l_orderkey
            JOIN customer c ON c.c_custkey = o.o_custkey
            JOIN nation n1 ON n1.n_nationkey = c.c_nationkey
            JOIN region r ON r.r_regionkey = n1.n_regionkey
            JOIN supplier s ON s.s_suppkey = l.l_suppkey
            JOIN nation n2 ON n2.n_nationkey = s.s_nationkey
            WHERE r.r_name = 'AMERICA' AND p.p_type = 'PROMO'
              AND o.o_orderdate >= TIMESTAMP '1995-01-01'
              AND o.o_orderdate < TIMESTAMP '1998-01-01'
        )
        GROUP BY o_year
        ORDER BY o_year
    """,
    doc="TPC-H Q8 (national market share): eight-table join where every "
    "dimension broadcasts; lineitem x orders is the single big "
    "shuffle; numerator and denominator come out of ONE aggregation "
    "pass via conditional sum (no second scan).",
)
def tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    # customers in region AMERICA (broadcastable dim chain)
    c_am = (
        c.join(
            F.broadcast(
                n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey).select(
                    "n_nationkey"
                )
            ),
            c.c_nationkey == F.col("n_nationkey"),
        )
        .select("c_custkey")
    )
    n2 = n.select(
        F.col("n_nationkey").alias("n2_nationkey"), F.col("n_name").alias("nation")
    )
    vol = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c_am), o.o_custkey == c_am.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n2), s.s_nationkey == F.col("n2_nationkey"))
        .select(
            F.year("o_orderdate").cast("long").alias("o_year"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("volume"),
            "nation",
        )
    )
    return (
        vol.groupBy("o_year")
        .agg(
            F.round(
                F.sum(F.when(F.col("nation") == "NATION_5", F.col("volume")).otherwise(0.0))
                / F.sum("volume"),
                4,
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


@query(
    "tpch-q9",
    oracle="""
        SELECT nation, o_year, round(sum(amount), 2) AS sum_profit
        FROM (
            SELECT n.n_name AS nation,
                   CAST(extract(year FROM o.o_orderdate) AS BIGINT) AS o_year,
                   l.l_extendedprice * (1 - l.l_discount)
                     - 0.1 * p.p_retailprice * l.l_quantity AS amount
            FROM lineitem l
            JOIN part p ON p.p_partkey = l.l_partkey
            JOIN supplier s ON s.s_suppkey = l.l_suppkey
            JOIN nation n ON n.n_nationkey = s.s_nationkey
            JOIN orders o ON o.o_orderkey = l.l_orderkey
            WHERE p.p_name LIKE '%gear%'
        )
        GROUP BY nation, o_year
        ORDER BY nation, o_year DESC
    """,
    doc="TPC-H Q9 (product-type profit; ps_supplycost stands in as 10% "
    "of p_retailprice since the fixture has no partsupp): LIKE-filtered "
    "part dim broadcasts and prunes lineitem before the one big "
    "lineitem x orders shuffle; profit is a pure projection so the "
    "whole pre-agg pipeline is one codegen stage.",
)
def tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%gear%"))
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    o = load_table(spark, sf_dir, "orders")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
            (
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
                - 0.1 * F.col("p_retailprice") * F.col("l_quantity")
            ).alias("amount"),
        )
        .groupBy("nation", "o_year")
        .agg(F.round(F.sum("amount"), 2).alias("sum_profit"))
        .orderBy("nation", F.col("o_year").desc())
    )


@query(
    "tpch-q11",
    oracle="""
        WITH val AS (
            SELECT l.l_partkey AS partkey,
                   sum(CAST(l.l_extendedprice * (1 - l.l_discount)
                            AS DECIMAL(30,6))) AS value
            FROM lineitem l
            JOIN supplier s ON s.s_suppkey = l.l_suppkey
            WHERE s.s_nationkey < 5
            GROUP BY l.l_partkey
        )
        SELECT partkey, CAST(round(value, 2) AS DOUBLE) AS value
        FROM val
        WHERE CAST(value AS DOUBLE) >
              (SELECT 0.001 * CAST(sum(value) AS DOUBLE) FROM val)
        ORDER BY value DESC, partkey
    """,
    doc="TPC-H Q11 (important stock identification; part value re-derived "
    "as nation-filtered lineitem revenue): the scalar global-sum "
    "subquery becomes a single-row aggregate cross-joined (broadcast) "
    "into the HAVING filter — the per-part aggregate is computed ONCE "
    "and reused for both sides, not recomputed per row. The summand is "
    "quantized to DECIMAL(30,6) so the aggregate is exact, "
    "order-insensitive, and wide enough for the hostile fixture's "
    "1e15-scale products (a representable-range error on one row "
    "must not kill the stage) — a plain double sum drifts in the last bit "
    "with partition count and can flip round(x, 2) at a .005 boundary "
    "(observed at sf0.01: 585236.075 rounding both ways).",
)
def tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier").filter(F.col("s_nationkey") < 5)
    val = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .groupBy(F.col("l_partkey").alias("partkey"))
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(30,6)"
                )
            ).alias("value")
        )
    )
    total = val.agg(
        (0.001 * F.sum("value").cast("double")).alias("threshold")
    )
    return (
        val.join(F.broadcast(total))
        .filter(F.col("value").cast("double") > F.col("threshold"))
        .select(
            "partkey", F.round(F.col("value"), 2).cast("double").alias("value")
        )
        .orderBy(F.col("value").desc(), "partkey")
    )


@query(
    "tpch-q15",
    oracle="""
        WITH revenue AS (
            SELECT l.l_suppkey AS supplier_no,
                   round(sum(l.l_extendedprice * (1 - l.l_discount)), 2)
                       AS total_revenue
            FROM lineitem l
            WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
              AND l.l_shipdate < TIMESTAMP '1996-04-01'
            GROUP BY l.l_suppkey
        )
        SELECT s.s_suppkey, s.s_name, r.total_revenue
        FROM supplier s
        JOIN revenue r ON s.s_suppkey = r.supplier_no
        WHERE r.total_revenue = (SELECT max(total_revenue) FROM revenue)
        ORDER BY s.s_suppkey
    """,
    doc="TPC-H Q15 (top supplier): the revenue view is computed once, "
    "its max is a single-row aggregate broadcast back (argmax by "
    "scalar subquery, not a global sort), and the supplier dim "
    "broadcasts into the surviving row(s). Revenue is rounded to 2dp "
    "BEFORE the max-equality comparison on both engines: the raw "
    "float-equality against a separately-evaluated max is drift-"
    "fragile — on the zipf skew warehouse DuckDB's two parallel "
    "evaluations of the revenue CTE summed in different orders and "
    "the equality matched zero rows.",
)
def tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    s = load_table(spark, sf_dir, "supplier")
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("total_revenue")
    )
    max_rev = revenue.agg(F.max("total_revenue").alias("max_revenue"))
    return (
        revenue.join(F.broadcast(max_rev))
        .filter(F.col("total_revenue") == F.col("max_revenue"))
        .join(F.broadcast(s), F.col("supplier_no") == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


@query(
    "tpch-q16",
    oracle="""
        SELECT p.p_brand, p.p_type, p.p_size,
               CAST(count(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
        WHERE p.p_brand <> 'Brand#1'
          AND p.p_type <> 'PROMO'
          AND p.p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
          AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                                  WHERE s_acctbal < 0)
        GROUP BY p.p_brand, p.p_type, p.p_size
        ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p.p_size
    """,
    doc="TPC-H Q16 (parts/supplier relationship; the supplier-complaint "
    "NOT IN becomes an acctbal exclusion): NOT IN over a non-nullable "
    "key compiles to a broadcast anti-join, the part attr filter "
    "broadcasts, and count(DISTINCT) shuffles once on the group keys.",
)
def tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49)
    )
    bad_supp = load_table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0
    ).select("s_suppkey")
    return (
        li.join(F.broadcast(bad_supp), li.l_suppkey == F.col("s_suppkey"), "left_anti")
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").cast("long").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


@query(
    "tpch-q20",
    oracle="""
        SELECT s.s_name, round(s.s_acctbal, 2) AS s_acctbal
        FROM supplier s
        WHERE s.s_nationkey < 8
          AND s.s_suppkey IN (
              SELECT l.l_suppkey
              FROM lineitem l
              JOIN part p ON p.p_partkey = l.l_partkey
              WHERE p.p_name LIKE 'small%'
                AND l.l_shipdate >= TIMESTAMP '1997-01-01'
                AND l.l_shipdate < TIMESTAMP '1998-01-01'
              GROUP BY l.l_suppkey, l.l_partkey
              HAVING sum(l.l_quantity) > 50
          )
        ORDER BY s.s_name
    """,
    doc="TPC-H Q20 (potential part promotion; availqty>half-demand "
    "re-derived as shipped-quantity-over-threshold): the nested "
    "IN-subquery chain becomes aggregate -> project -> LEFT SEMI join "
    "into the supplier dim; only distinct suppkeys cross the wire.",
)
def tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load_table(spark, sf_dir, "supplier").filter(F.col("s_nationkey") < 8)
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("small%"))
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    heavy = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 50)
        .select("l_suppkey")
    )
    return (
        s.join(heavy, s.s_suppkey == heavy.l_suppkey, "left_semi")
        .select("s_name", F.round("s_acctbal", 2).alias("s_acctbal"))
        .orderBy("s_name")
    )


@query(
    "tpch-q21",
    oracle="""
        WITH late AS (
            SELECT l.l_orderkey, l.l_suppkey
            FROM lineitem l
            JOIN orders o ON o.o_orderkey = l.l_orderkey
            WHERE o.o_orderstatus = 'F'
              AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
        )
        SELECT s.s_name, CAST(count(*) AS BIGINT) AS numwait
        FROM (SELECT DISTINCT l_orderkey, l_suppkey FROM late) l1
        JOIN supplier s ON s.s_suppkey = l1.l_suppkey
        WHERE EXISTS (SELECT 1 FROM lineitem l2
                      WHERE l2.l_orderkey = l1.l_orderkey
                        AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM late l3
                          WHERE l3.l_orderkey = l1.l_orderkey
                            AND l3.l_suppkey <> l1.l_suppkey)
        GROUP BY s.s_name
        ORDER BY numwait DESC, s.s_name
        LIMIT 20
    """,
    doc="TPC-H Q21 (suppliers who kept orders waiting; lateness "
    "re-derived as shipdate > orderdate+60d since the fixture has no "
    "commit/receipt dates): instead of the textbook EXISTS semi-join + "
    "NOT-EXISTS anti-join (TWO extra passes over lineitem), one "
    "aggregation per order computes #distinct suppliers, #distinct "
    "late suppliers, and the lone late supplier — an order qualifies "
    "iff >1 suppliers and exactly 1 late one, which is the same "
    "predicate. One lineitem scan, one shuffle on l_orderkey. The "
    "oracle keeps the faithful EXISTS/NOT-EXISTS formulation so the "
    "gate proves the rewrite's equivalence.",
)
def tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    s = load_table(spark, sf_dir, "supplier")
    # Two-level aggregation instead of two countDistinct()s over
    # different expressions: mixed distinct aggregates make Catalyst
    # plan an Expand (row tripling + double shuffle of the distinct
    # buffers — the agg-approx-sketch pitfall). Level 1 collapses to
    # one row per (order, supplier) with a lateness flag; level 2 is a
    # plain partial-aggregated groupBy. Both shuffles share the
    # l_orderkey prefix.
    per_supp = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey", "l_suppkey")
        .agg(
            F.max(
                (F.col("l_shipdate") > F.date_add(F.col("o_orderdate"), 60)).cast(
                    "int"
                )
            ).alias("is_late")
        )
    )
    per_order = (
        per_supp.groupBy("l_orderkey")
        .agg(
            F.count("*").alias("supp_cnt"),
            F.sum("is_late").alias("late_cnt"),
            F.max(F.when(F.col("is_late") == 1, F.col("l_suppkey"))).alias(
                "late_suppkey"
            ),
        )
        .filter((F.col("supp_cnt") > 1) & (F.col("late_cnt") == 1))
    )
    return (
        per_order.join(F.broadcast(s), F.col("late_suppkey") == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").cast("long").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(20)
    )
