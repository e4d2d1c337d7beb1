"""Privacy-engineering operators: k-anonymity auditing and the Laplace
noise mechanism — the release-gate checks a data platform runs before
publishing aggregates or sharing quasi-identified rows.

Determinism note: the DP op derives its noise from a salted hash
inverse-CDF (uniform -> Laplace), making it reproducible across
engines/reruns for the oracle; a production release would draw real
randomness per release — the mechanism, sensitivity math, and plan
shape are identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from transit_scrape_spark.operators.dedup import sql_string_hash, string_hash
from transit_scrape_spark.queries.registry import query
from transit_scrape_spark.sources.tables import load_table

_K = 5


@query(
    "privacy-k-anonymity",
    oracle=f"""
        WITH cells AS (
            SELECT c_nationkey, c_mktsegment,
                   CAST(c_custkey % 8 AS BIGINT) AS age_band,
                   CAST(count(*) AS BIGINT) AS n
            FROM customer
            GROUP BY 1, 2, 3
        )
        SELECT CAST({_K} AS BIGINT) AS k,
               CAST(count(*) AS BIGINT) AS n_cells,
               CAST(sum(CASE WHEN n < {_K} THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_violating_cells,
               CAST(sum(CASE WHEN n < {_K} THEN n ELSE 0 END) AS BIGINT)
                   AS n_rows_at_risk,
               round(sum(CASE WHEN n < {_K} THEN n ELSE 0 END)
                     / CAST(sum(n) AS DOUBLE), 6) AS suppression_rate
        FROM cells
    """,
    doc="k-anonymity audit over the quasi-identifier tuple (nation, "
    "market segment, age band): every QI cell with fewer than k=5 "
    "members is re-identifiable — the audit counts violating cells "
    "and the rows that generalization/suppression must touch before "
    "release. ONE grouped aggregate (QI-cell cardinality is the "
    "shuffle bound) + a single-row rollup; at 100 TB this gate runs "
    "per release candidate, and the violating-cell list (not emitted "
    "here) feeds the generalization loop: widen bands, re-audit, "
    "repeat until suppression_rate is acceptable.",
)
def privacy_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    cells = c.groupBy(
        "c_nationkey",
        "c_mktsegment",
        (F.col("c_custkey") % 8).cast("long").alias("age_band"),
    ).agg(F.count("*").alias("n"))
    at_risk = F.when(F.col("n") < _K, F.col("n")).otherwise(0)
    return cells.agg(
        F.lit(_K).cast("long").alias("k"),
        F.count("*").alias("n_cells"),
        F.sum(F.when(F.col("n") < _K, 1).otherwise(0))
        .cast("long")
        .alias("n_violating_cells"),
        F.sum(at_risk).cast("long").alias("n_rows_at_risk"),
        F.round(
            F.sum(at_risk) / F.sum("n").cast("double"), 6
        ).alias("suppression_rate"),
    )


# Laplace scale b = sensitivity / epsilon; count queries have
# sensitivity 1 (one person changes one cell by one).
_DP_EPS = 0.5
_DP_B = 1.0 / _DP_EPS


@query(
    "privacy-dp-laplace",
    oracle=f"""
        WITH cells AS (
            SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS true_n
            FROM customer GROUP BY c_mktsegment
        ),
        noised AS (
            SELECT c_mktsegment, true_n,
                   (CAST(({sql_string_hash("c_mktsegment || ':dp-salt-r2'")}) AS DOUBLE)
                    / 2147483647.0) AS u
            FROM cells
        )
        SELECT c_mktsegment, true_n,
               round(true_n + CASE WHEN u >= 0.5
                                   THEN -{_DP_B} * ln(2.0 * (1.0 - u) + 1e-15)
                                   ELSE  {_DP_B} * ln(2.0 * u + 1e-15) END, 4)
                   AS released_n,
               round(abs(CASE WHEN u >= 0.5
                              THEN -{_DP_B} * ln(2.0 * (1.0 - u) + 1e-15)
                              ELSE  {_DP_B} * ln(2.0 * u + 1e-15) END), 4)
                   AS abs_noise
        FROM noised
    """,
    doc="Laplace mechanism for differentially-private count release "
    "(epsilon=0.5, sensitivity 1 -> scale b=2): per-segment counts "
    "plus inverse-CDF Laplace noise. Noise here derives from a "
    "salted hash of the group key (uniform in [0,1) -> Laplace via "
    "inverse CDF) so both engines reproduce it exactly — production "
    "swaps the hash for a fresh random draw per release and the "
    "expression is otherwise unchanged. The plan is the release "
    "shape at any scale: aggregate first (tiny), noise the SUMMARY "
    "(never row-level), post-process freely (DP is closed under "
    "post-processing).",
)
def privacy_dp_laplace(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    cells = c.groupBy("c_mktsegment").agg(F.count("*").alias("true_n"))
    u = (
        string_hash(F.concat(F.col("c_mktsegment"), F.lit(":dp-salt-r2"))).cast(
            "double"
        )
        / 2147483647.0
    )
    noise = F.when(
        u >= 0.5, -_DP_B * F.log(2.0 * (1.0 - u) + 1e-15)
    ).otherwise(_DP_B * F.log(2.0 * u + 1e-15))
    return cells.select(
        "c_mktsegment",
        "true_n",
        F.round(F.col("true_n") + noise, 4).alias("released_n"),
        F.round(F.abs(noise), 4).alias("abs_noise"),
    )


_L = 3


@query(
    "privacy-l-diversity",
    oracle=f"""
        WITH cells AS (
            SELECT c_nationkey,
                   c_mktsegment,
                   CAST(count(*) AS BIGINT) AS k_size,
                   CAST(count(DISTINCT CAST(floor(c_acctbal / 1000)
                        AS BIGINT)) AS BIGINT) AS l_distinct
            FROM customer
            GROUP BY c_nationkey, c_mktsegment
        )
        SELECT CAST(c_nationkey AS INT) AS c_nationkey,
               c_mktsegment,
               k_size,
               l_distinct,
               l_distinct < {_L} AS violates_l
        FROM cells
    """,
    doc="l-diversity audit, the companion release gate to "
    "privacy-k-anonymity: a quasi-identifier cell can be k-anonymous "
    "yet leak the sensitive attribute if every member shares one "
    "value (homogeneity attack). Per (nation, segment) cell: group "
    "size k AND distinct sensitive-value count l (acctbal banded to "
    "1k); cells with l < 3 are flagged. count(DISTINCT) per group is "
    "a two-stage partial-distinct aggregate — same single-shuffle "
    "shape at 100 TB as the k-anonymity scan, so the combined audit "
    "is one pass per table.",
)
def privacy_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    band = F.floor(F.col("c_acctbal") / 1000).cast("long")
    cells = c.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count("*").cast("long").alias("k_size"),
        F.countDistinct(band).cast("long").alias("l_distinct"),
    )
    return cells.select(
        "c_nationkey",
        "c_mktsegment",
        "k_size",
        "l_distinct",
        (F.col("l_distinct") < _L).alias("violates_l"),
    )


@query(
    "privacy-t-closeness",
    oracle="""
        WITH overall AS (
            SELECT c_mktsegment AS s,
                   CAST(count(*) AS DOUBLE)
                       / (SELECT count(*) FROM customer) AS p
            FROM customer GROUP BY 1
        ),
        grp AS (
            SELECT c_nationkey, c_mktsegment AS s,
                   CAST(count(*) AS BIGINT) AS n
            FROM customer GROUP BY 1, 2
        ),
        gsz AS (
            SELECT c_nationkey, CAST(sum(n) AS BIGINT) AS group_n
            FROM grp GROUP BY 1
        ),
        cells AS (
            SELECT z.c_nationkey, z.group_n, overall.p,
                   CAST(coalesce(g.n, 0) AS DOUBLE) / z.group_n AS q
            FROM gsz z
            CROSS JOIN overall
            LEFT JOIN grp g ON g.c_nationkey = z.c_nationkey AND g.s = overall.s
        )
        SELECT c_nationkey, group_n,
               round(0.5 * sum(abs(q - p)), 6) AS t_distance,
               0.5 * sum(abs(q - p)) <= 0.2 AS meets_t02
        FROM cells
        GROUP BY c_nationkey, group_n
    """,
    doc="t-closeness screen (the stronger cousin of k-anonymity / "
    "l-diversity, both registered in this module): for each "
    "quasi-identifier group (nation) the total-variation distance "
    "between the group's sensitive-attribute distribution "
    "(mktsegment) and the global one; a group whose distribution "
    "diverges past t leaks the attribute even when l-diverse. The "
    "missing-category subtlety is explicit: groups cross-join the "
    "global segment list so absent segments contribute |0 - p|, not "
    "nothing. Shape: two map-side-combined groupBys plus a "
    "broadcast-sized cross join of |groups| x |segments| — the fact "
    "is scanned once.",
)
def privacy_t_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    # ONE scan builds the BOUNDED (nation, segment) cells (<= 25 x
    # #segments rows at any scale, persisted as one partition); the
    # global segment distribution and the total are EXACT integer sums
    # over those cells, so the former three customer scans (total /
    # per-segment / per-cell) collapse to one
    grp = c.groupBy("c_nationkey", F.col("c_mktsegment").alias("s")).agg(
        F.count("*").cast("long").alias("n")
    ).coalesce(1).persist()
    total = grp.agg(F.sum("n").cast("double").alias("n_total"))
    glob = (
        grp.groupBy("s")
        .agg(F.sum("n").cast("double").alias("seg_n"))
        .crossJoin(F.broadcast(total))
        .select("s", (F.col("seg_n") / F.col("n_total")).alias("p"))
    )
    gsz = grp.groupBy("c_nationkey").agg(F.sum("n").cast("long").alias("group_n"))
    cells = (
        gsz.crossJoin(F.broadcast(glob.select("s", "p")))
        .join(F.broadcast(grp), ["c_nationkey", "s"], "left")
        .select(
            "c_nationkey",
            "group_n",
            "p",
            (F.coalesce(F.col("n"), F.lit(0)).cast("double") / F.col("group_n")).alias(
                "q"
            ),
        )
    )
    t = 0.5 * F.sum(F.abs(F.col("q") - F.col("p")))
    return cells.groupBy("c_nationkey", "group_n").agg(
        F.round(t, 6).alias("t_distance"),
        (t <= 0.2).alias("meets_t02"),
    )


@query(
    "privacy-generalization-ladder",
    oracle=f"""
        WITH widths AS (
            SELECT unnest([1, 2, 4, 8]) AS band_width
        ),
        cells AS (
            SELECT w.band_width,
                   c_nationkey, c_mktsegment,
                   (c_custkey % 8) // w.band_width AS age_band,
                   CAST(count(*) AS BIGINT) AS n
            FROM customer CROSS JOIN widths w
            GROUP BY 1, 2, 3, 4
        )
        SELECT band_width,
               CAST(count(*) AS BIGINT) AS n_cells,
               CAST(sum(CASE WHEN n < {_K} THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_violating_cells,
               round(sum(CASE WHEN n < {_K} THEN n ELSE 0 END)
                     / CAST(sum(n) AS DOUBLE), 6) AS suppression_rate
        FROM cells
        GROUP BY band_width
    """,
    doc="The generalization ladder privacy-k-anonymity's doc promises: "
    "re-audit k-anonymity at four widenings of the age-band "
    "quasi-identifier (width 1 = raw 8 bands ... width 8 = one "
    "band) in ONE query, showing suppression_rate falling as bands "
    "coarsen — the utility-vs-privacy curve an anonymization run "
    "walks until the rate is acceptable. A literal 4-row widths "
    "relation cross-joins into the QI aggregation (Expand-style 4x "
    "fan-out before ONE map-side-combined shuffle), so the whole "
    "ladder costs a single pass over the table rather than four "
    "audits.",
)
def privacy_generalization_ladder(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    widths = spark.createDataFrame(
        [(1,), (2,), (4,), (8,)], "band_width INT"
    )
    cells = (
        c.crossJoin(F.broadcast(widths))
        .groupBy(
            "band_width",
            "c_nationkey",
            "c_mktsegment",
            ((F.col("c_custkey") % 8) / F.col("band_width")).cast("long").alias(
                "age_band"
            ),
        )
        .agg(F.count("*").cast("long").alias("n"))
    )
    at_risk = F.when(F.col("n") < _K, F.col("n")).otherwise(0)
    return cells.groupBy("band_width").agg(
        F.count("*").cast("long").alias("n_cells"),
        F.sum(F.when(F.col("n") < _K, 1).otherwise(0))
        .cast("long")
        .alias("n_violating_cells"),
        F.round(F.sum(at_risk) / F.sum("n").cast("double"), 6).alias(
            "suppression_rate"
        ),
    )


_G_SIGMA = 9.689610525210778  # sqrt(2*ln(1.25/delta)) * sens / eps
_TWO_PI = 6.283185307179586


@query(
    "privacy-dp-gaussian",
    oracle=f"""
        WITH cells AS (
            SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS true_n
            FROM customer GROUP BY c_mktsegment
        ),
        us AS (
            SELECT c_mktsegment, true_n,
                   (CAST(({sql_string_hash("c_mktsegment || ':gauss-u1'")}) AS DOUBLE)
                    / 2147483647.0) + 1e-15 AS u1,
                   (CAST(({sql_string_hash("c_mktsegment || ':gauss-u2'")}) AS DOUBLE)
                    / 2147483647.0) AS u2
            FROM cells
        )
        SELECT c_mktsegment, true_n,
               round(true_n + {_G_SIGMA} * sqrt(-2 * ln(u1))
                     * cos({_TWO_PI} * u2), 4) AS released_n,
               round(abs({_G_SIGMA} * sqrt(-2 * ln(u1))
                     * cos({_TWO_PI} * u2)), 4) AS abs_noise
        FROM us
    """,
    doc="Gaussian mechanism for (epsilon, delta)-DP count release "
    "(eps=0.5, delta=1e-5, sensitivity 1 -> sigma = "
    "sqrt(2 ln(1.25/delta))/eps ~= 9.69): per-segment counts plus "
    "N(0, sigma^2) noise via Box-Muller over two salted-hash "
    "uniforms, so both engines reproduce the draw exactly "
    "(production swaps the hashes for fresh randomness, expression "
    "unchanged). The approximate-DP sibling of privacy-dp-laplace: "
    "Gaussian noise composes tighter over many releases (advanced "
    "composition / RDP), the regime a 100 TB pipeline that "
    "publishes thousands of aggregates actually lives in. Same "
    "aggregate-first, noise-the-summary release shape.",
)
def privacy_dp_gaussian(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    cells = c.groupBy("c_mktsegment").agg(
        F.count("*").cast("long").alias("true_n")
    )
    u1 = (
        string_hash(F.concat(F.col("c_mktsegment"), F.lit(":gauss-u1"))).cast(
            "double"
        )
        / 2147483647.0
        + 1e-15
    )
    u2 = (
        string_hash(F.concat(F.col("c_mktsegment"), F.lit(":gauss-u2"))).cast(
            "double"
        )
        / 2147483647.0
    )
    noise = _G_SIGMA * F.sqrt(-2 * F.log(u1)) * F.cos(_TWO_PI * u2)
    return cells.select(
        "c_mktsegment",
        "true_n",
        F.round(F.col("true_n") + noise, 4).alias("released_n"),
        F.round(F.abs(noise), 4).alias("abs_noise"),
    )


@query(
    "privacy-dp-exponential",
    oracle=f"""
        WITH cells AS (
            SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS true_n
            FROM customer GROUP BY c_mktsegment
        ),
        gumbel AS (
            SELECT c_mktsegment, true_n,
                   -ln(-ln((CAST(({sql_string_hash("c_mktsegment || ':expmech-u'")})
                            AS DOUBLE) / 2147483647.0) + 1e-15)) AS g
            FROM cells
        ),
        scored AS (
            SELECT c_mktsegment, true_n,
                   0.25 * true_n + g AS noisy_score,
                   row_number() OVER (ORDER BY 0.25 * true_n + g DESC,
                                      c_mktsegment) AS rnk
            FROM gumbel
        )
        SELECT c_mktsegment, true_n,
               round(noisy_score, 6) AS noisy_score,
               CAST(CASE WHEN rnk = 1 THEN 1 ELSE 0 END AS BIGINT)
                   AS selected
        FROM scored
    """,
    doc="Exponential mechanism for DP selection (which segment is "
    "largest?) via the Gumbel-max trick: score = eps/(2*sens) * "
    "utility + Gumbel noise, argmax of the noisy scores IS an "
    "exponential-mechanism draw (eps=0.5, sensitivity 1) — the "
    "release primitive for CATEGORICAL outputs where Laplace/"
    "Gaussian only handle numerics (privacy-dp-laplace/-gaussian "
    "complete the trio). Gumbel noise derives from a salted hash "
    "uniform (-ln(-ln u)) so both engines reproduce the draw; "
    "production swaps in fresh randomness. Aggregate-first shape: "
    "noise touches the k-row summary, the argmax is one window "
    "rank over it.",
)
def privacy_dp_exponential(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    c = load_table(spark, sf_dir, "customer")
    cells = c.groupBy("c_mktsegment").agg(
        F.count("*").cast("long").alias("true_n")
    )
    u = (
        string_hash(F.concat(F.col("c_mktsegment"), F.lit(":expmech-u"))).cast(
            "double"
        )
        / 2147483647.0
        + 1e-15
    )
    g = -F.log(-F.log(u))
    scored = cells.select(
        "c_mktsegment",
        "true_n",
        (0.25 * F.col("true_n") + g).alias("noisy_score"),
    )
    w = Window.orderBy(F.col("noisy_score").desc(), "c_mktsegment")
    return scored.select(
        "c_mktsegment",
        "true_n",
        F.round("noisy_score", 6).alias("noisy_score"),
        F.when(F.row_number().over(w) == 1, 1)
        .otherwise(0)
        .cast("long")
        .alias("selected"),
    )
