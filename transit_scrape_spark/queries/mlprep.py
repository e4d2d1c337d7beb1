"""ML-prep / ranking-eval / recsys operators (round 5).

The training-data-adjacent surface a large-scale pipeline needs beyond
dedup/curation: leakage-safe fold assignment, leave-one-out target
encoding, an in-engine logistic trainer, BM25 retrieval scoring,
ranking-quality metrics (NDCG/MRR/P@k), pairwise-preference strength
fitting, item-item similarity, link prediction, and one-pass weighted
reservoir sampling.

Every op follows the repo contract: a Spark DataFrame plan (codegen
expressions, partitioned windows, broadcast-bounded joins — no
empty-partition windows over data-scaled frames) plus a DuckDB oracle
computing the identical result. Deterministic hashes come from
operators/dedup.string_hash (md5-based, engine-portable).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from transit_scrape_spark.operators.dedup import sql_string_hash, string_hash
from transit_scrape_spark.queries.registry import query
from transit_scrape_spark.sources.tables import load_table


# ---------------------------------------------------------------------------
# fold assignment / encoding / training
# ---------------------------------------------------------------------------

_KFOLD_SALT = ":kfold-salt-r5"


@query(
    "ml-kfold-assign",
    oracle=f"""
        WITH per_user AS (
            SELECT user_id,
                   count(*) AS n_events,
                   sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                       AS n_purch
            FROM events GROUP BY user_id
        ),
        folded AS (
            SELECT ({sql_string_hash(
                "CAST(user_id AS VARCHAR) || '" + _KFOLD_SALT + "'"
            )}) % 5 AS fold, n_events, n_purch
            FROM per_user
        )
        SELECT CAST(fold AS BIGINT) AS fold,
               CAST(count(*) AS BIGINT) AS n_users,
               CAST(sum(n_events) AS BIGINT) AS n_events,
               round(CAST(sum(n_purch) AS DOUBLE) / sum(n_events), 6)
                   AS purchase_rate
        FROM folded GROUP BY fold
    """,
    doc="Leakage-safe GROUP k-fold assignment: every event of a user "
    "lands in the same fold because the fold is a deterministic "
    "md5-hash of the user id (not of the row) — the split discipline "
    "that keeps per-entity signal out of the validation folds "
    "(row-hash splits leak user history across folds and inflate "
    "CV scores). Engine-portable hash (same md5 mix as "
    "sample-hash-split) so any system reproduces the exact folds; "
    "per-fold size and label-rate columns make stratification drift "
    "visible. One per-user rollup + one 5-group aggregate; at 100 TB "
    "fold assignment is a stateless projection, no shuffle beyond "
    "the rollup.",
    tags=("ml",),
)
def ml_kfold_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.sum(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("n_purch"),
    )
    fold = (
        string_hash(
            F.concat(F.col("user_id").cast("string"), F.lit(_KFOLD_SALT))
        )
        % 5
    )
    return (
        per_user.groupBy(fold.cast("long").alias("fold"))
        .agg(
            F.count("*").cast("long").alias("n_users"),
            F.sum("n_events").cast("long").alias("n_events"),
            F.round(
                F.sum("n_purch").cast("double") / F.sum("n_events"), 6
            ).alias("purchase_rate"),
        )
    )


@query(
    "ml-target-encode-loo",
    oracle="""
        WITH tot AS (
            SELECT event_type, count(*) AS n, sum(value) AS s
            FROM events GROUP BY event_type
        ),
        prior AS (SELECT avg(value) AS mu FROM events),
        enc AS (
            SELECT e.event_type,
                   (t.s - e.value) / (t.n - 1) AS loo,
                   (t.s - e.value + 20 * p.mu) / (t.n - 1 + 20) AS smoothed
            FROM events e
            JOIN tot t ON t.event_type = e.event_type
            CROSS JOIN prior p
            WHERE t.n > 1
        )
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n,
               round(avg(loo), 6) AS mean_loo,
               round(avg(smoothed), 6) AS mean_smoothed,
               round(stddev_samp(loo), 6) AS sd_loo
        FROM enc GROUP BY event_type
    """,
    doc="Leave-one-out target encoding of event_type against value with "
    "additive smoothing toward the global prior (m=20 pseudo-counts): "
    "enc_i = (sum_g - y_i) / (n_g - 1) excludes the row's own target, "
    "the standard guard against the self-leakage that makes naive "
    "mean-encoding overfit memorably on rare categories; the smoothed "
    "form interpolates to the prior exactly where LOO is noisiest. "
    "Plan: one per-category total (broadcast), one 1-row prior "
    "(broadcast), encoding as pure codegen arithmetic over the fact "
    "scan — no per-row state, no window; the per-category output here "
    "summarizes the encoding (mean/sd) so the result stays "
    "driver-sized.",
    tags=("ml",),
)
def ml_target_encode_loo(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    tot = ev.groupBy("event_type").agg(
        F.count("*").alias("n"), F.sum("value").alias("s")
    )
    prior = ev.agg(F.avg("value").alias("mu"))
    e = (
        ev.join(F.broadcast(tot), "event_type")
        .crossJoin(F.broadcast(prior))
        .filter(F.col("n") > 1)
    )
    loo = (F.col("s") - F.col("value")) / (F.col("n") - 1)
    smoothed = (F.col("s") - F.col("value") + 20 * F.col("mu")) / (
        F.col("n") - 1 + 20
    )
    return e.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n"),
        F.round(F.avg(loo), 6).alias("mean_loo"),
        F.round(F.avg(smoothed), 6).alias("mean_smoothed"),
        F.round(F.stddev_samp(loo), 6).alias("sd_loo"),
    )


# ---------------------------------------------------------------------------
# retrieval / ranking evaluation
# ---------------------------------------------------------------------------

_BM25_K1 = 1.2
_BM25_B = 0.75


@query(
    "eval-bm25-topk",
    oracle=f"""
        WITH tok AS (
            SELECT doc_id,
                   unnest(regexp_extract_all(lower(text), '[a-z]+')) AS token
            FROM documents
        ),
        tf AS (
            SELECT doc_id, token, CAST(count(*) AS DOUBLE) AS tf
            FROM tok GROUP BY doc_id, token
        ),
        dl AS (
            SELECT doc_id, CAST(count(*) AS DOUBLE) AS dl
            FROM tok GROUP BY doc_id
        ),
        stats AS (
            SELECT CAST(count(*) AS DOUBLE) AS n_docs, avg(dl) AS avgdl
            FROM dl
        ),
        qterms AS (
            SELECT token FROM (
                SELECT token,
                       row_number() OVER (ORDER BY count(*) DESC, token) AS r
                FROM tok GROUP BY token
            ) WHERE r <= 3
        ),
        df AS (
            SELECT t.token, CAST(count(DISTINCT t.doc_id) AS DOUBLE) AS df
            FROM tf t JOIN qterms q ON q.token = t.token
            GROUP BY t.token
        ),
        scored AS (
            SELECT t.doc_id,
                   sum(
                       ln(1 + (s.n_docs - d.df + 0.5) / (d.df + 0.5))
                       * t.tf * ({_BM25_K1!r} + 1)
                       / (t.tf + {_BM25_K1!r}
                          * (1 - {_BM25_B!r}
                             + {_BM25_B!r} * l.dl / s.avgdl))
                   ) AS score
            FROM tf t
            JOIN df d ON d.token = t.token
            JOIN dl l ON l.doc_id = t.doc_id
            CROSS JOIN stats s
            GROUP BY t.doc_id
        )
        SELECT doc_id, round(score, 6) AS bm25
        FROM scored
        ORDER BY score DESC, doc_id
        LIMIT 10
    """,
    doc="BM25 retrieval scoring (k1=1.2, b=0.75, Lucene-style "
    "idf = ln(1 + (N-df+0.5)/(df+0.5))): query = the corpus's 3 most "
    "frequent tokens (deterministic (count desc, token) cut — "
    "Catalyst bounds the rank's serial input via "
    "TakeOrderedAndProject), scored docs ranked top-10. The lexical "
    "retrieval baseline every hybrid-search stack pairs with "
    "simsearch-topk's dense scores (and the scoring function behind "
    "text-tfidf-topterms' ranking at retrieval time). Plan: one "
    "explode + (doc, token) and doc-length hash aggs, a 3-row query "
    "broadcast, a 1-row corpus-stats broadcast, top-10 via "
    "TakeOrderedAndProject — no global sort, shuffles bounded by "
    "vocabulary.",
    tags=("eval", "text"),
)
def eval_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id",
        F.explode(
            F.regexp_extract_all(F.lower("text"), F.lit("[a-z]+"), F.lit(0))
        ).alias("token"),
    )
    tf = tok.groupBy("doc_id", "token").agg(
        F.count("*").cast("double").alias("tf")
    )
    dl = tok.groupBy("doc_id").agg(F.count("*").cast("double").alias("dl"))
    stats = dl.agg(
        F.count("*").cast("double").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
    )
    qterms = (
        tok.groupBy("token")
        .agg(F.count("*").alias("c"))
        .select(
            "token",
            F.row_number()
            .over(Window.orderBy(F.col("c").desc(), "token"))
            .alias("r"),
        )
        .filter(F.col("r") <= 3)
        .select("token")
    )
    df = (
        tf.join(F.broadcast(qterms), "token")
        .groupBy("token")
        .agg(F.count_distinct("doc_id").cast("double").alias("df"))
    )
    idf = F.log(
        1 + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    denom = F.col("tf") + _BM25_K1 * (
        1 - _BM25_B + _BM25_B * F.col("dl") / F.col("avgdl")
    )
    scored = (
        tf.join(F.broadcast(df), "token")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(F.sum(idf * F.col("tf") * (_BM25_K1 + 1) / denom).alias("score"))
    )
    return (
        scored.orderBy(F.col("score").desc(), "doc_id")
        .limit(10)
        .select("doc_id", F.round("score", 6).alias("bm25"))
    )


@query(
    "eval-ranking-metrics",
    oracle="""
        WITH ranked AS (
            SELECT user_id,
                   CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS rel,
                   row_number() OVER (PARTITION BY user_id
                                      ORDER BY value DESC, event_id) AS rn,
                   row_number() OVER (PARTITION BY user_id
                                      ORDER BY CASE WHEN event_type = 'purchase'
                                                    THEN 1 ELSE 0 END DESC,
                                               value DESC, event_id) AS irn
            FROM events
        ),
        per_user AS (
            SELECT user_id,
                   sum(CASE WHEN rn <= 10 THEN rel / log2(rn + 1.0)
                            ELSE 0 END) AS dcg10,
                   sum(CASE WHEN irn <= 10 THEN rel / log2(irn + 1.0)
                            ELSE 0 END) AS idcg10,
                   min(CASE WHEN rel = 1 THEN rn END) AS first_rel,
                   sum(CASE WHEN rn <= 5 THEN rel ELSE 0 END) / 5.0 AS p5
            FROM ranked GROUP BY user_id
        )
        SELECT CAST(count(*) AS BIGINT) AS n_users,
               round(avg(CASE WHEN idcg10 > 0 THEN dcg10 / idcg10 END), 6)
                   AS mean_ndcg_at_10,
               round(avg(coalesce(1.0 / first_rel, 0.0)), 6) AS mrr,
               round(avg(p5), 6) AS p_at_5
        FROM per_user
    """,
    doc="Ranking-quality battery over a synthetic retrieval task (the "
    "scorer ranks each user's events by value; relevance = purchase): "
    "NDCG@10 (graded-position discount against the ideal reordering "
    "of the SAME item set), MRR (reciprocal first-hit rank, 0 for "
    "users with no relevant item), and Precision@5 — the triad "
    "offline search/recsys evals report before any model ships, and "
    "the measurement loop for simsearch-two-stage-rerank's output "
    "ordering. All ranks are user-partitioned windows (one shuffle, "
    "per-partition sorts — scale-safe at any user count); the ideal "
    "ranking is a second sort key on the same window, not a second "
    "pass.",
    tags=("eval",),
)
def eval_ranking_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    rel = F.when(F.col("event_type") == "purchase", 1).otherwise(0)
    w_rank = Window.partitionBy("user_id").orderBy(
        F.col("value").desc(), "event_id"
    )
    w_ideal = Window.partitionBy("user_id").orderBy(
        rel.desc(), F.col("value").desc(), "event_id"
    )
    ranked = ev.select(
        "user_id",
        rel.alias("rel"),
        F.row_number().over(w_rank).alias("rn"),
        F.row_number().over(w_ideal).alias("irn"),
    )
    per_user = ranked.groupBy("user_id").agg(
        F.sum(
            F.when(
                F.col("rn") <= 10, F.col("rel") / F.log2(F.col("rn") + 1.0)
            ).otherwise(0.0)
        ).alias("dcg10"),
        F.sum(
            F.when(
                F.col("irn") <= 10, F.col("rel") / F.log2(F.col("irn") + 1.0)
            ).otherwise(0.0)
        ).alias("idcg10"),
        F.min(F.when(F.col("rel") == 1, F.col("rn"))).alias("first_rel"),
        (
            F.sum(F.when(F.col("rn") <= 5, F.col("rel")).otherwise(0)) / 5.0
        ).alias("p5"),
    )
    return per_user.agg(
        F.count("*").cast("long").alias("n_users"),
        F.round(
            F.avg(
                F.when(
                    F.col("idcg10") > 0, F.col("dcg10") / F.col("idcg10")
                )
            ),
            6,
        ).alias("mean_ndcg_at_10"),
        F.round(
            F.avg(F.coalesce(1.0 / F.col("first_rel"), F.lit(0.0))), 6
        ).alias("mrr"),
        F.round(F.avg("p5"), 6).alias("p_at_5"),
    )


# ---------------------------------------------------------------------------
# in-engine model fitting
# ---------------------------------------------------------------------------


@query(
    "ml-logistic-irls",
    oracle="""
        WITH pu AS (
            SELECT ln(1 + count(*)) AS x,
                   CAST(max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                        AS DOUBLE) AS y
            FROM events GROUP BY user_id
        ),
        s1 AS (
            SELECT CAST(count(*) AS DOUBLE) AS n, sum(x) AS sx,
                   sum(x * x) AS sxx,
                   sum(y - 0.5) AS g0, sum(x * (y - 0.5)) AS g1
            FROM pu
        ),
        b1 AS (
            SELECT (0.25 * sxx * g0 - 0.25 * sx * g1)
                       / (0.25 * n * 0.25 * sxx - 0.25 * sx * 0.25 * sx)
                       AS b0,
                   (0.25 * n * g1 - 0.25 * sx * g0)
                       / (0.25 * n * 0.25 * sxx - 0.25 * sx * 0.25 * sx)
                       AS b1
            FROM s1
        ),
        it2 AS (
            SELECT pu.x, pu.y, b1.b0, b1.b1,
                   1 / (1 + exp(-(b1.b0 + b1.b1 * pu.x))) AS p
            FROM pu CROSS JOIN b1
        ),
        s2 AS (
            SELECT max(b0) AS b0, max(b1) AS b1,
                   sum(p * (1 - p)) AS sw,
                   sum(p * (1 - p) * x) AS swx,
                   sum(p * (1 - p) * x * x) AS swxx,
                   sum(y - p) AS g0, sum(x * (y - p)) AS g1
            FROM it2
        ),
        b2 AS (
            SELECT b0 + (swxx * g0 - swx * g1) / (sw * swxx - swx * swx)
                       AS b0,
                   b1 + (sw * g1 - swx * g0) / (sw * swxx - swx * swx)
                       AS b1
            FROM s2
        ),
        fin AS (
            SELECT pu.y,
                   1 / (1 + exp(-(b2.b0 + b2.b1 * pu.x))) AS p,
                   b2.b0 AS b0, b2.b1 AS b1
            FROM pu CROSS JOIN b2
        )
        SELECT CAST(count(*) AS BIGINT) AS n_users,
               round(max(b0), 6) AS beta0,
               round(max(b1), 6) AS beta1,
               round(-avg(y * ln(p) + (1 - y) * ln(1 - p)), 6) AS log_loss
        FROM fin
    """,
    doc="In-engine logistic regression (two Newton/IRLS steps from "
    "beta=0) of purchase propensity on log-activity x = ln(1+events): "
    "each step is ONE aggregation pass collecting the 2x2 weighted "
    "normal equations (X'WX, X'(y-p)) plus a closed-form 2x2 solve, "
    "with the current beta broadcast back as a 1-row literal — the "
    "pattern that trains quality-classifier-sized GLMs at 100 TB "
    "without MLlib: d features cost one d^2-cell aggregate per step, "
    "fully map-side-combined, zero driver loops over data. Two steps "
    "from a cold start land within ~1e-3 of the converged fit at this "
    "separation; log-loss at the final beta is reported as the "
    "training-quality readout.",
    tags=("ml", "stats"),
)
def ml_logistic_irls(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    pu = ev.groupBy("user_id").agg(
        F.log(1 + F.count("*")).alias("x"),
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        )
        .cast("double")
        .alias("y"),
    ).select("x", "y")
    s1 = pu.agg(
        F.count("*").cast("double").alias("n"),
        F.sum("x").alias("sx"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") - 0.5).alias("g0"),
        F.sum(F.col("x") * (F.col("y") - 0.5)).alias("g1"),
    )
    det1 = 0.25 * F.col("n") * 0.25 * F.col("sxx") - 0.25 * F.col("sx") * 0.25 * F.col("sx")
    b1 = s1.select(
        ((0.25 * F.col("sxx") * F.col("g0") - 0.25 * F.col("sx") * F.col("g1")) / det1).alias("b0"),
        ((0.25 * F.col("n") * F.col("g1") - 0.25 * F.col("sx") * F.col("g0")) / det1).alias("b1"),
    )
    it2 = pu.crossJoin(F.broadcast(b1)).withColumn(
        "p", 1 / (1 + F.exp(-(F.col("b0") + F.col("b1") * F.col("x"))))
    )
    w = F.col("p") * (1 - F.col("p"))
    s2 = it2.agg(
        F.max("b0").alias("b0"),
        F.max("b1").alias("b1"),
        F.sum(w).alias("sw"),
        F.sum(w * F.col("x")).alias("swx"),
        F.sum(w * F.col("x") * F.col("x")).alias("swxx"),
        F.sum(F.col("y") - F.col("p")).alias("g0"),
        F.sum(F.col("x") * (F.col("y") - F.col("p"))).alias("g1"),
    )
    det2 = F.col("sw") * F.col("swxx") - F.col("swx") * F.col("swx")
    b2 = s2.select(
        (F.col("b0") + (F.col("swxx") * F.col("g0") - F.col("swx") * F.col("g1")) / det2).alias("b0"),
        (F.col("b1") + (F.col("sw") * F.col("g1") - F.col("swx") * F.col("g0")) / det2).alias("b1"),
    )
    fin = pu.crossJoin(F.broadcast(b2)).withColumn(
        "p", 1 / (1 + F.exp(-(F.col("b0") + F.col("b1") * F.col("x"))))
    )
    return fin.agg(
        F.count("*").cast("long").alias("n_users"),
        F.round(F.max("b0"), 6).alias("beta0"),
        F.round(F.max("b1"), 6).alias("beta1"),
        F.round(
            -F.avg(
                F.col("y") * F.log(F.col("p"))
                + (1 - F.col("y")) * F.log(1 - F.col("p"))
            ),
            6,
        ).alias("log_loss"),
    )


@query(
    "eval-bradley-terry",
    oracle="""
        WITH daily AS (
            SELECT CAST(ts AS DATE) AS day, event_type, avg(value) AS m
            FROM events GROUP BY CAST(ts AS DATE), event_type
        ),
        games AS (
            SELECT a.event_type AS i, b.event_type AS j,
                   CASE WHEN a.m > b.m THEN 1 ELSE 0 END AS wi
            FROM daily a JOIN daily b
              ON a.day = b.day AND a.event_type < b.event_type
            WHERE a.m <> b.m
        ),
        pair AS (
            SELECT i, j, CAST(count(*) AS DOUBLE) AS nij,
                   CAST(sum(wi) AS DOUBLE) AS wi
            FROM games GROUP BY i, j
        ),
        directed AS (
            SELECT i AS t, j AS o, nij, wi AS w FROM pair
            UNION ALL
            SELECT j, i, nij, nij - wi FROM pair
        ),
        wins AS (
            SELECT t, sum(w) AS big_w, sum(nij) AS games
            FROM directed GROUP BY t
        ),
        p1 AS (
            SELECT w.t,
                   w.big_w / sum(d.nij / (1.0 + 1.0)) AS p
            FROM wins w JOIN directed d ON d.t = w.t
            GROUP BY w.t, w.big_w
        ),
        p2 AS (
            SELECT w.t, w.big_w, w.games,
                   w.big_w / sum(d.nij / (pa.p + pb.p)) AS p
            FROM wins w
            JOIN directed d ON d.t = w.t
            JOIN p1 pa ON pa.t = d.t
            JOIN p1 pb ON pb.t = d.o
            GROUP BY w.t, w.big_w, w.games
        ),
        tot AS (SELECT sum(p) AS z FROM p2)
        SELECT p2.t AS event_type,
               CAST(p2.games AS BIGINT) AS games,
               CAST(p2.big_w AS BIGINT) AS wins,
               round(p2.p / tot.z, 6) AS bt_strength
        FROM p2, tot
    """,
    doc="Bradley-Terry preference-strength fit over pairwise contests "
    "(daily mean-value duels between event types; ties dropped): two "
    "minorization-maximization updates p_i <- W_i / sum_j n_ij/(p_i+"
    "p_j) from the uniform start, normalized to sum 1 — the model "
    "behind LLM arena leaderboards and RLHF reward aggregation, "
    "where raw win RATES mislead whenever opponents differ in "
    "strength (BT corrects for schedule). All iteration state lives "
    "on the k-team/k^2-pair summary (bounded by the type vocabulary); "
    "the only data-scaled pass is the daily rollup. The MM update is "
    "monotone in likelihood, so two rounds give a stable ordering "
    "even unconverged.",
    tags=("eval", "stats"),
)
def eval_bradley_terry(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.to_date("ts").alias("day"), "event_type"
    ).agg(F.avg("value").alias("m"))
    a = daily.select(F.col("day").alias("da"), F.col("event_type").alias("i"), F.col("m").alias("ma"))
    b = daily.select(F.col("day").alias("db"), F.col("event_type").alias("j"), F.col("m").alias("mb"))
    games = a.join(
        b, (F.col("da") == F.col("db")) & (F.col("i") < F.col("j"))
    ).filter(F.col("ma") != F.col("mb")).select(
        "i", "j", F.when(F.col("ma") > F.col("mb"), 1).otherwise(0).alias("wi")
    )
    pair = games.groupBy("i", "j").agg(
        F.count("*").cast("double").alias("nij"),
        F.sum("wi").cast("double").alias("wi"),
    )
    directed = pair.select(
        F.col("i").alias("t"), F.col("j").alias("o"), "nij", F.col("wi").alias("w")
    ).unionByName(
        pair.select(
            F.col("j").alias("t"), F.col("i").alias("o"), "nij",
            (F.col("nij") - F.col("wi")).alias("w"),
        )
    )
    wins = directed.groupBy("t").agg(
        F.sum("w").alias("big_w"), F.sum("nij").alias("games")
    )
    p1 = (
        wins.join(directed, "t")
        .groupBy("t", "big_w")
        .agg((F.max("big_w") / F.sum(F.col("nij") / (1.0 + 1.0))).alias("p"))
        .select("t", "p")
    )
    pa = p1.select(F.col("t").alias("t_pa"), F.col("p").alias("p_t"))
    pb = p1.select(F.col("t").alias("o_pb"), F.col("p").alias("p_o"))
    p2 = (
        wins.join(directed, "t")
        .join(F.broadcast(pa), F.col("t") == F.col("t_pa"))
        .join(F.broadcast(pb), F.col("o") == F.col("o_pb"))
        .groupBy("t", "big_w", "games")
        .agg(
            (F.max("big_w") / F.sum(F.col("nij") / (F.col("p_t") + F.col("p_o")))).alias("p")
        )
    )
    tot = p2.agg(F.sum("p").alias("z"))
    return p2.crossJoin(F.broadcast(tot)).select(
        F.col("t").alias("event_type"),
        F.col("games").cast("long").alias("games"),
        F.col("big_w").cast("long").alias("wins"),
        F.round(F.col("p") / F.col("z"), 6).alias("bt_strength"),
    )


# ---------------------------------------------------------------------------
# survival / sampling
# ---------------------------------------------------------------------------


@query(
    "stats-kaplan-meier",
    oracle="""
        WITH ends AS (SELECT CAST(max(ts) AS DATE) AS obs_end FROM events),
        pu AS (
            SELECT user_id,
                   min(CASE WHEN event_type = 'view' THEN CAST(ts AS DATE) END)
                       AS fv,
                   min(CASE WHEN event_type = 'purchase' THEN CAST(ts AS DATE) END)
                       AS fp
            FROM events GROUP BY user_id
        ),
        dur AS (
            SELECT CASE WHEN fp IS NOT NULL AND fp >= fv
                        THEN date_diff('day', fv, fp) ELSE
                             date_diff('day', fv, e.obs_end) END AS t,
                   CASE WHEN fp IS NOT NULL AND fp >= fv THEN 1 ELSE 0 END
                       AS died
            FROM pu CROSS JOIN ends e
            WHERE fv IS NOT NULL
        ),
        per_t AS (
            SELECT t, CAST(sum(died) AS DOUBLE) AS d,
                   CAST(count(*) AS DOUBLE) AS total
            FROM dur GROUP BY t
        ),
        risk AS (
            SELECT t, d,
                   sum(total) OVER (ORDER BY t DESC
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS n_risk
            FROM per_t
        ),
        km AS (
            SELECT t, d, n_risk,
                   exp(sum(CASE WHEN d > 0 THEN ln(1 - d / n_risk)
                                ELSE 0 END)
                       OVER (ORDER BY t
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
                       AS s
            FROM risk
        )
        SELECT CAST(t AS BIGINT) AS t_days,
               CAST(n_risk AS BIGINT) AS n_risk,
               CAST(d AS BIGINT) AS n_events,
               round(s, 6) AS survival
        FROM km WHERE d > 0 ORDER BY t_days
    """,
    doc="Kaplan-Meier product-limit survival curve for first-view -> "
    "first-purchase conversion with right-censoring at the corpus "
    "high-water mark (the estimator analytics-survival-censored's "
    "duration table feeds): S(t) = prod_{u<=t}(1 - d_u/n_u), with "
    "censored users leaving the risk set without contributing an "
    "event — dropping them instead (the naive rate) biases "
    "conversion-time estimates toward fast converters. n_risk is a "
    "reverse-cumulative count and the product is exp-of-summed-logs, "
    "both windows over the DISTINCT-DURATION summary (bounded by the "
    "calendar span, not the user count). Output rows at event times "
    "only, per KM convention.",
    tags=("stats",),
)
def stats_kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    ends = ev.agg(F.to_date(F.max("ts")).alias("obs_end"))
    pu = ev.groupBy("user_id").agg(
        F.min(
            F.when(F.col("event_type") == "view", F.to_date("ts"))
        ).alias("fv"),
        F.min(
            F.when(F.col("event_type") == "purchase", F.to_date("ts"))
        ).alias("fp"),
    )
    died = (F.col("fp").isNotNull() & (F.col("fp") >= F.col("fv"))).cast("int")
    dur = (
        pu.crossJoin(F.broadcast(ends))
        .filter(F.col("fv").isNotNull())
        .select(
            F.when(
                died == 1, F.datediff("fp", "fv")
            ).otherwise(F.datediff("obs_end", "fv")).alias("t"),
            died.alias("died"),
        )
    )
    per_t = dur.groupBy("t").agg(
        F.sum("died").cast("double").alias("d"),
        F.count("*").cast("double").alias("total"),
    )
    w_desc = Window.orderBy(F.col("t").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_asc = Window.orderBy("t").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    risk = per_t.select(
        "t", "d", F.sum("total").over(w_desc).alias("n_risk")
    )
    km = risk.select(
        "t",
        "d",
        "n_risk",
        F.exp(
            F.sum(
                F.when(
                    F.col("d") > 0, F.log(1 - F.col("d") / F.col("n_risk"))
                ).otherwise(0.0)
            ).over(w_asc)
        ).alias("s"),
    )
    return (
        km.filter(F.col("d") > 0)
        .select(
            F.col("t").cast("long").alias("t_days"),
            F.col("n_risk").cast("long").alias("n_risk"),
            F.col("d").cast("long").alias("n_events"),
            F.round("s", 6).alias("survival"),
        )
        .orderBy("t_days")
    )


_RES_SALT = ":reservoir-salt-r5"
_RES_P = 2147483647


@query(
    "sample-reservoir-weighted",
    oracle=f"""
        WITH keyed AS (
            SELECT event_id, event_type, value,
                   ln((({sql_string_hash(
                       "CAST(event_id AS VARCHAR) || '" + _RES_SALT + "'"
                   )}) + 0.5) / {_RES_P}.0) / (value + 1.0) AS k
            FROM events
        )
        SELECT event_id, event_type,
               round(value, 4) AS weight_minus_1,
               round(k, 6) AS res_key
        FROM keyed
        ORDER BY k DESC, event_id
        LIMIT 32
    """,
    doc="One-pass weighted reservoir sample (Efraimidis-Spirtsos A-Res, "
    "log form): each row draws a deterministic uniform u from the "
    "md5 hash of (event_id, salt) and keeps key = ln(u)/w with "
    "w = value+1; the 32 LARGEST keys are a weighted-without-"
    "replacement sample where P(selected) is proportional to w. "
    "Top-k-by-key is associative — per-partition top-32s merge to "
    "the global top-32 (TakeOrderedAndProject, no global sort) — so "
    "the same plan is the distributed one-pass reservoir at 100 TB, "
    "and the deterministic hash makes the 'random' draw reproducible "
    "across engines, retries, and cluster sizes (cf. sample-hash-"
    "split; rand()-based reservoirs are none of these).",
    tags=("sample",),
)
def sample_reservoir_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    u = (
        string_hash(
            F.concat(F.col("event_id").cast("string"), F.lit(_RES_SALT))
        )
        + 0.5
    ) / float(_RES_P)
    k = F.log(u) / (F.col("value") + 1.0)
    keyed = ev.select("event_id", "event_type", "value", k.alias("k"))
    return (
        keyed.orderBy(F.col("k").desc(), "event_id")
        .limit(32)
        .select(
            "event_id",
            "event_type",
            F.round("value", 4).alias("weight_minus_1"),
            F.round("k", 6).alias("res_key"),
        )
    )


# ---------------------------------------------------------------------------
# recsys
# ---------------------------------------------------------------------------


@query(
    "rec-item-item-cosine",
    oracle="""
        WITH items AS (
            SELECT DISTINCT l_orderkey AS ok, l_partkey AS item
            FROM lineitem WHERE l_partkey % 7 = 0
        ),
        freq AS (
            SELECT item, CAST(count(*) AS DOUBLE) AS n FROM items GROUP BY item
        ),
        co AS (
            SELECT a.item AS ia, b.item AS ib, CAST(count(*) AS DOUBLE) AS c
            FROM items a JOIN items b
              ON a.ok = b.ok AND a.item < b.item
            GROUP BY a.item, b.item
        )
        SELECT CAST(ia AS BIGINT) AS item_a,
               CAST(ib AS BIGINT) AS item_b,
               CAST(c AS BIGINT) AS n_cobaskets,
               round(c / (sqrt(fa.n) * sqrt(fb.n)), 6) AS cosine
        FROM co JOIN freq fa ON fa.item = ia JOIN freq fb ON fb.item = ib
        WHERE c >= 2
        ORDER BY cosine DESC, item_a, item_b
        LIMIT 20
    """,
    doc="Item-item collaborative-filtering similarity (the bipartite "
    "order-item graph projected onto items): co-basket counts "
    "normalized by sqrt(item frequency) — binary cosine, the "
    "Amazon-style 'customers also bought' kernel — with a min-support "
    "floor and a top-20 cut. Differs from basket-affinity (raw "
    "co-counts) exactly where it matters: normalization stops "
    "popular items from dominating every neighbor list. The "
    "within-basket self-join is co-located on the order key and its "
    "fan-out is bounded by basket size, the property that keeps "
    "item-item CF tractable at 100 TB while user-user CF is not "
    "(basket size is bounded; user history is not).",
    tags=("rec",),
)
def rec_item_item_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_partkey") % 7 == 0
    )
    items = li.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("item")
    ).distinct()
    freq = items.groupBy("item").agg(F.count("*").cast("double").alias("n"))
    a = items.select("ok", F.col("item").alias("ia"))
    b = items.select(F.col("ok").alias("ok2"), F.col("item").alias("ib"))
    co = (
        a.join(b, (F.col("ok") == F.col("ok2")) & (F.col("ia") < F.col("ib")))
        .groupBy("ia", "ib")
        .agg(F.count("*").cast("double").alias("c"))
        .filter(F.col("c") >= 2)
    )
    fa = freq.select(F.col("item").alias("ia"), F.col("n").alias("na"))
    fb = freq.select(F.col("item").alias("ib"), F.col("n").alias("nb"))
    return (
        co.join(F.broadcast(fa), "ia")
        .join(F.broadcast(fb), "ib")
        .select(
            F.col("ia").cast("long").alias("item_a"),
            F.col("ib").cast("long").alias("item_b"),
            F.col("c").cast("long").alias("n_cobaskets"),
            F.round(
                F.col("c") / (F.sqrt(F.col("na")) * F.sqrt(F.col("nb"))), 6
            ).alias("cosine"),
        )
        .orderBy(F.col("cosine").desc(), "item_a", "item_b")
        .limit(20)
    )


@query(
    "ml-pr-auc-binned",
    oracle="""
        WITH pu AS (
            SELECT avg(value) AS score,
                   CASE WHEN sum(CASE WHEN event_type = 'purchase'
                                      THEN 1 ELSE 0 END) >= 14
                        THEN 1 ELSE 0 END AS y
            FROM events GROUP BY user_id
        ),
        binned AS (
            SELECT least(CAST(floor(score / 5) AS BIGINT), 19) AS bin,
                   CAST(sum(y) AS DOUBLE) AS pos,
                   CAST(sum(1 - y) AS DOUBLE) AS neg
            FROM pu GROUP BY 1
        ),
        cum AS (
            SELECT bin,
                   sum(pos) OVER w AS cpos,
                   sum(neg) OVER w AS cneg,
                   sum(pos) OVER () AS tpos
            FROM binned
            WINDOW w AS (ORDER BY bin DESC
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        ),
        pts AS (
            SELECT bin,
                   cpos / (cpos + cneg) AS precision_,
                   cpos / tpos AS recall_,
                   cpos / tpos
                   - coalesce(lag(cpos / tpos) OVER (ORDER BY bin DESC), 0.0)
                       AS d_recall
            FROM cum
        )
        SELECT CAST(count(*) AS BIGINT) AS n_bins,
               round(sum(precision_ * d_recall), 6) AS pr_auc,
               round(max(CASE WHEN recall_ >= 0.5 THEN precision_ END), 6)
                   AS best_precision_at_recall50
        FROM pts
    """,
    doc="Precision-recall AUC (binned step interpolation) for the "
    "heavy-purchaser propensity score (per-user mean value): score bins "
    "sweep the threshold from high to low; each bin contributes "
    "precision x recall-increment. PR-AUC is the metric that stays "
    "honest under the class imbalance every conversion/quality-"
    "filter task has (ROC-AUC — stats-roc-auc-binned on the same "
    "score — saturates when negatives dominate because FPR's "
    "denominator is huge). Also reports precision at recall >= 0.5, "
    "the operating point a reviewer actually picks. Windows run over "
    "the 20-bin summary only; the fact pass is one per-user rollup "
    "+ one binned aggregate.",
    tags=("ml", "eval"),
)
def ml_pr_auc_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    pu = ev.groupBy("user_id").agg(
        F.avg("value").alias("score"),
        F.when(
            F.sum(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            )
            >= 14,
            1,
        )
        .otherwise(0)
        .alias("y"),
    )
    binned = pu.groupBy(
        F.least(F.floor(F.col("score") / 5).cast("long"), F.lit(19)).alias(
            "bin"
        )
    ).agg(
        F.sum("y").cast("double").alias("pos"),
        F.sum(1 - F.col("y")).cast("double").alias("neg"),
    )
    w = Window.orderBy(F.col("bin").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_all = Window.partitionBy()
    cum = binned.select(
        "bin",
        F.sum("pos").over(w).alias("cpos"),
        F.sum("neg").over(w).alias("cneg"),
        F.sum("pos").over(w_all).alias("tpos"),
    )
    recall = F.col("cpos") / F.col("tpos")
    pts = cum.select(
        "bin",
        (F.col("cpos") / (F.col("cpos") + F.col("cneg"))).alias("precision_"),
        recall.alias("recall_"),
        (
            recall
            - F.coalesce(
                F.lag(recall).over(Window.orderBy(F.col("bin").desc())),
                F.lit(0.0),
            )
        ).alias("d_recall"),
    )
    return pts.agg(
        F.count("*").cast("long").alias("n_bins"),
        F.round(F.sum(F.col("precision_") * F.col("d_recall")), 6).alias(
            "pr_auc"
        ),
        F.round(
            F.max(
                F.when(F.col("recall_") >= 0.5, F.col("precision_"))
            ),
            6,
        ).alias("best_precision_at_recall50"),
    )


@query(
    "rec-coverage-novelty",
    oracle="""
        WITH items AS (
            SELECT DISTINCT l_orderkey AS ok, l_partkey AS item
            FROM lineitem WHERE l_partkey % 7 = 0
        ),
        freq AS (
            SELECT item, CAST(count(*) AS DOUBLE) AS n FROM items GROUP BY item
        ),
        tot AS (
            SELECT sum(n) AS z, CAST(count(*) AS DOUBLE) AS n_items FROM freq
        ),
        co AS (
            SELECT a.item AS ia, b.item AS ib, CAST(count(*) AS DOUBLE) AS c
            FROM items a JOIN items b ON a.ok = b.ok AND a.item < b.item
            GROUP BY a.item, b.item
        ),
        recs AS (
            SELECT ia, ib FROM (
                SELECT co.ia, co.ib,
                       co.c / (sqrt(fa.n) * sqrt(fb.n)) AS cosine
                FROM co JOIN freq fa ON fa.item = co.ia
                        JOIN freq fb ON fb.item = co.ib
                WHERE co.c >= 2
                ORDER BY cosine DESC, co.ia, co.ib
                LIMIT 20
            )
        ),
        rec_items AS (
            SELECT ia AS item FROM recs UNION ALL SELECT ib FROM recs
        )
        SELECT CAST(count(DISTINCT r.item) AS BIGINT) AS n_rec_items,
               round(count(DISTINCT r.item) / max(t.n_items), 6)
                   AS catalog_coverage,
               round(avg(-log2(f.n / t.z)), 6) AS mean_novelty_bits
        FROM rec_items r
        JOIN freq f ON f.item = r.item
        CROSS JOIN tot t
    """,
    doc="Recommendation-quality diagnostics over rec-item-item-cosine's "
    "top-20 neighbor list: catalog coverage (what fraction of the "
    "item universe any recommendation touches — low coverage means "
    "the recommender only resurfaces bestsellers) and mean novelty "
    "in bits, -log2(popularity share) of recommended items (the "
    "information-theoretic surprise; pure-popularity recommenders "
    "score near log2(1/share of head items)). Accuracy metrics "
    "alone (eval-ranking-metrics) reward popularity bias; this pair "
    "is the standard counterweight. Rides the identical co-basket "
    "plan as the recommender op, so the marginal cost is two "
    "broadcast lookups over a 20-row list.",
    tags=("rec", "eval"),
)
def rec_coverage_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_partkey") % 7 == 0
    )
    items = li.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("item")
    ).distinct()
    freq = items.groupBy("item").agg(F.count("*").cast("double").alias("n"))
    tot = freq.agg(
        F.sum("n").alias("z"), F.count("*").cast("double").alias("n_items")
    )
    a = items.select("ok", F.col("item").alias("ia"))
    b = items.select(F.col("ok").alias("ok2"), F.col("item").alias("ib"))
    co = (
        a.join(b, (F.col("ok") == F.col("ok2")) & (F.col("ia") < F.col("ib")))
        .groupBy("ia", "ib")
        .agg(F.count("*").cast("double").alias("c"))
        .filter(F.col("c") >= 2)
    )
    fa = freq.select(F.col("item").alias("ia"), F.col("n").alias("na"))
    fb = freq.select(F.col("item").alias("ib"), F.col("n").alias("nb"))
    recs = (
        co.join(F.broadcast(fa), "ia")
        .join(F.broadcast(fb), "ib")
        .select(
            "ia",
            "ib",
            (F.col("c") / (F.sqrt(F.col("na")) * F.sqrt(F.col("nb")))).alias(
                "cosine"
            ),
        )
        .orderBy(F.col("cosine").desc(), "ia", "ib")
        .limit(20)
    )
    rec_items = recs.select(F.col("ia").alias("item")).unionByName(
        recs.select(F.col("ib").alias("item"))
    )
    return (
        rec_items.join(F.broadcast(freq), "item")
        .crossJoin(F.broadcast(tot))
        .agg(
            F.count_distinct("item").cast("long").alias("n_rec_items"),
            F.round(
                F.count_distinct("item") / F.max("n_items"), 6
            ).alias("catalog_coverage"),
            F.round(
                F.avg(-F.log2(F.col("n") / F.col("z"))), 6
            ).alias("mean_novelty_bits"),
        )
    )


# ---------------------------------------------------------------------------
# curation ordering / causal segments / feature screening
# ---------------------------------------------------------------------------


@query(
    "corpus-curriculum-order",
    oracle="""
        WITH scored AS (
            SELECT doc_id, lang, n_chars,
                   round(CAST(n_chars AS DOUBLE)
                         * (1 + len(string_split(text, ' '))), 4 ) AS difficulty
            FROM documents
        ),
        ranked AS (
            SELECT lang, difficulty,
                   ntile(3) OVER (ORDER BY difficulty, doc_id) AS phase
            FROM scored
        )
        SELECT CAST(phase AS BIGINT) AS phase,
               CAST(count(*) AS BIGINT) AS n_docs,
               round(min(difficulty), 4) AS min_difficulty,
               round(max(difficulty), 4) AS max_difficulty,
               CAST(count(DISTINCT lang) AS BIGINT) AS n_langs
        FROM ranked GROUP BY phase
    """,
    doc="Curriculum-learning phase assignment: documents scored by a "
    "difficulty proxy (chars x token count) and cut into exact "
    "thirds in difficulty order — easy phase first, hard last, the "
    "data-ordering curriculum shown to stabilize early LLM training. "
    "The cut must be EXACT and deterministic (a fuzzy boundary "
    "reshuffles phases between runs and breaks resumable training), "
    "so the ntile runs as the two-phase bucketed rank from "
    "operators/ranking.py — the document frame grows with the "
    "corpus, and this op is the curriculum-shaped demonstration "
    "that exact global ordering needs no single-partition sort. "
    "Per-phase language counts expose curriculum-induced domain "
    "skew (hard phases are usually long-doc-language heavy).",
    tags=("corpus", "ml"),
)
def corpus_curriculum_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    from transit_scrape_spark.operators.ranking import (
        exact_ntile,
        with_global_order,
    )

    d = load_table(spark, sf_dir, "documents")
    scored = d.select(
        "doc_id",
        "lang",
        F.round(
            F.col("n_chars").cast("double")
            * (1 + F.size(F.split("text", " "))),
            4,
        ).alias("difficulty"),
    )
    g = with_global_order(
        scored, "difficulty", tiebreakers=("doc_id",), rn="__rn",
        total_count="__n",
    )
    ranked = g.select(
        "lang",
        "difficulty",
        exact_ntile(F.col("__rn"), F.col("__n"), 3).alias("phase"),
    )
    return ranked.groupBy(F.col("phase").cast("long").alias("phase")).agg(
        F.count("*").cast("long").alias("n_docs"),
        F.round(F.min("difficulty"), 4).alias("min_difficulty"),
        F.round(F.max("difficulty"), 4).alias("max_difficulty"),
        F.count_distinct("lang").cast("long").alias("n_langs"),
    )


@query(
    "ml-uplift-by-segment",
    oracle="""
        WITH pu AS (
            SELECT user_id,
                   count(*) AS n_events,
                   max(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
                       AS treated,
                   max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                       AS converted
            FROM events GROUP BY user_id
        ),
        seg AS (
            SELECT CASE WHEN n_events < 50 THEN 'low'
                        WHEN n_events < 80 THEN 'mid' ELSE 'high' END
                       AS segment,
                   treated, converted
            FROM pu
        ),
        cell AS (
            SELECT segment,
                   CAST(sum(treated) AS BIGINT) AS n_treated,
                   CAST(sum(1 - treated) AS BIGINT) AS n_control,
                   avg(CASE WHEN treated = 1
                            THEN CAST(converted AS DOUBLE) END) AS p_t,
                   avg(CASE WHEN treated = 0
                            THEN CAST(converted AS DOUBLE) END) AS p_c
            FROM seg GROUP BY segment
        )
        SELECT segment, n_treated, n_control,
               round(p_t, 6) AS conv_treated,
               round(p_c, 6) AS conv_control,
               round(p_t - p_c, 6) AS uplift
        FROM cell
    """,
    doc="Two-model uplift readout by activity segment: conversion rate "
    "of treated (signed-up) minus control users, per engagement band "
    "— the heterogeneous-treatment-effect table that tells a "
    "targeting team WHERE the intervention works (aggregate ATE — "
    "stats-stratified-ate on the same contrast — can be positive "
    "while a segment is hurt; Simpson's territory). Fixed band edges "
    "keep segments stable across runs, the precondition for "
    "tracking uplift over time. One per-user rollup + one 3-cell "
    "aggregate; the full two-model form replaces the band cut with "
    "ml-logistic-irls scores per arm — identical plan shape.",
    tags=("ml", "stats"),
)
def ml_uplift_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    pu = ev.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.max(
            F.when(F.col("event_type") == "signup", 1).otherwise(0)
        ).alias("treated"),
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("converted"),
    )
    seg = pu.select(
        F.when(F.col("n_events") < 50, "low")
        .when(F.col("n_events") < 80, "mid")
        .otherwise("high")
        .alias("segment"),
        "treated",
        "converted",
    )
    p_t = F.avg(
        F.when(F.col("treated") == 1, F.col("converted").cast("double"))
    )
    p_c = F.avg(
        F.when(F.col("treated") == 0, F.col("converted").cast("double"))
    )
    return seg.groupBy("segment").agg(
        F.sum("treated").cast("long").alias("n_treated"),
        F.sum(1 - F.col("treated")).cast("long").alias("n_control"),
        F.round(p_t, 6).alias("conv_treated"),
        F.round(p_c, 6).alias("conv_control"),
        F.round(p_t - p_c, 6).alias("uplift"),
    )


@query(
    "ml-woe-iv",
    oracle="""
        WITH pu AS (
            SELECT user_id, avg(value) AS score,
                   CASE WHEN sum(CASE WHEN event_type = 'purchase'
                                      THEN 1 ELSE 0 END) >= 14
                        THEN 1 ELSE 0 END AS y
            FROM events GROUP BY user_id
        ),
        binned AS (
            SELECT least(CAST(floor(score / 10) AS BIGINT), 9) AS bin,
                   CAST(sum(y) AS DOUBLE) AS pos,
                   CAST(sum(1 - y) AS DOUBLE) AS neg
            FROM pu GROUP BY 1
        ),
        tot AS (SELECT sum(pos) AS tp, sum(neg) AS tn FROM binned),
        woe AS (
            SELECT bin,
                   CAST(pos AS BIGINT) AS n_pos,
                   CAST(neg AS BIGINT) AS n_neg,
                   ln(((pos + 0.5) / tp) / ((neg + 0.5) / tn)) AS woe,
                   ((pos + 0.5) / tp - (neg + 0.5) / tn)
                       * ln(((pos + 0.5) / tp) / ((neg + 0.5) / tn)) AS iv_part
            FROM binned CROSS JOIN tot
        )
        SELECT CAST(bin AS BIGINT) AS bin, n_pos, n_neg,
               round(woe, 6) AS woe,
               round(sum(iv_part) OVER (), 6) AS total_iv
        FROM woe
    """,
    doc="Weight-of-evidence / information-value feature screen for the "
    "per-user mean-value score against the heavy-purchaser label (>= 14 purchase events — a balanced class split; every user has SOME purchase in this corpus): per bin, "
    "WoE = ln(%events / %non-events) with add-half smoothing (the "
    "empty-bin guard credit scorecards standardize on), and the "
    "feature's IV = sum((%pos - %neg) * WoE) — the pre-modeling "
    "triage that ranks candidate features before any training run "
    "(IV < 0.02 useless, > 0.5 suspiciously leaky — THE smell test "
    "for target leakage in generated features). Fixed bin edges, "
    "one rollup + one 10-bin aggregate; the total-IV window runs "
    "over 10 rows.",
    tags=("ml",),
)
def ml_woe_iv(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    pu = ev.groupBy("user_id").agg(
        F.avg("value").alias("score"),
        F.when(
            F.sum(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            )
            >= 14,
            1,
        )
        .otherwise(0)
        .alias("y"),
    )
    binned = pu.groupBy(
        F.least(F.floor(F.col("score") / 10).cast("long"), F.lit(9)).alias(
            "bin"
        )
    ).agg(
        F.sum("y").cast("double").alias("pos"),
        F.sum(1 - F.col("y")).cast("double").alias("neg"),
    )
    tot = binned.agg(F.sum("pos").alias("tp"), F.sum("neg").alias("tn"))
    pp = (F.col("pos") + 0.5) / F.col("tp")
    pn = (F.col("neg") + 0.5) / F.col("tn")
    woe = binned.crossJoin(F.broadcast(tot)).select(
        "bin",
        F.col("pos").cast("long").alias("n_pos"),
        F.col("neg").cast("long").alias("n_neg"),
        F.log(pp / pn).alias("woe"),
        ((pp - pn) * F.log(pp / pn)).alias("iv_part"),
    )
    w_all = Window.partitionBy()
    return woe.select(
        F.col("bin").cast("long").alias("bin"),
        "n_pos",
        "n_neg",
        F.round("woe", 6).alias("woe"),
        F.round(F.sum("iv_part").over(w_all), 6).alias("total_iv"),
    )


@query(
    "ml-vif-collinearity",
    oracle="""
        WITH pu AS (
            SELECT ln(1 + count(*)) AS x1,
                   avg(value) AS x2,
                   ln(1 + sum(CASE WHEN event_type = 'purchase'
                                   THEN 1 ELSE 0 END)) AS x3
            FROM events GROUP BY user_id
        ),
        c AS (
            SELECT corr(x1, x2) AS r12, corr(x1, x3) AS r13,
                   corr(x2, x3) AS r23, CAST(count(*) AS BIGINT) AS n
            FROM pu
        ),
        r2 AS (
            SELECT n,
                   (r12 * r12 + r13 * r13 - 2 * r12 * r13 * r23)
                       / (1 - r23 * r23) AS r2_1,
                   (r12 * r12 + r23 * r23 - 2 * r12 * r23 * r13)
                       / (1 - r13 * r13) AS r2_2,
                   (r13 * r13 + r23 * r23 - 2 * r13 * r23 * r12)
                       / (1 - r12 * r12) AS r2_3
            FROM c
        )
        SELECT 'x1_log_events' AS feature, n AS n_users,
               round(1 / (1 - r2_1), 6) AS vif FROM r2
        UNION ALL
        SELECT 'x2_mean_value', n, round(1 / (1 - r2_2), 6) FROM r2
        UNION ALL
        SELECT 'x3_log_purchases', n, round(1 / (1 - r2_3), 6) FROM r2
    """,
    doc="Variance-inflation-factor collinearity screen for a 3-feature "
    "design (log activity, mean value, log purchases): VIF_i = "
    "1/(1 - R^2_i) where R^2_i regresses feature i on the other two "
    "— in closed form from the pairwise correlations, so the whole "
    "screen is ONE moment aggregation over the per-user rollup plus "
    "scalar algebra (no model fitting, no matrix library). VIF > 5 "
    "means the feature's coefficient is unstable and ml-logistic-"
    "irls-style fits on it will not replicate — run this BEFORE "
    "training, the same way ml-woe-iv screens predictive power. "
    "At 100 TB: d features cost one d^2-cell correlation aggregate.",
    tags=("ml", "stats"),
)
def ml_vif_collinearity(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    pu = ev.groupBy("user_id").agg(
        F.log(1 + F.count("*")).alias("x1"),
        F.avg("value").alias("x2"),
        F.log(
            1
            + F.sum(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            )
        ).alias("x3"),
    )
    c = pu.agg(
        F.corr("x1", "x2").alias("r12"),
        F.corr("x1", "x3").alias("r13"),
        F.corr("x2", "x3").alias("r23"),
        F.count("*").cast("long").alias("n"),
    )
    r12, r13, r23 = F.col("r12"), F.col("r13"), F.col("r23")
    r2_1 = (r12 * r12 + r13 * r13 - 2 * r12 * r13 * r23) / (1 - r23 * r23)
    r2_2 = (r12 * r12 + r23 * r23 - 2 * r12 * r23 * r13) / (1 - r13 * r13)
    r2_3 = (r13 * r13 + r23 * r23 - 2 * r13 * r23 * r12) / (1 - r12 * r12)
    rows = []
    for name, r2x in [
        ("x1_log_events", r2_1),
        ("x2_mean_value", r2_2),
        ("x3_log_purchases", r2_3),
    ]:
        rows.append(
            c.select(
                F.lit(name).alias("feature"),
                F.col("n").alias("n_users"),
                F.round(1 / (1 - r2x), 6).alias("vif"),
            )
        )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out


@query(
    "eval-pass-at-k",
    oracle="""
        WITH task AS (
            SELECT user_id,
                   CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(CASE WHEN event_type = 'purchase'
                                 THEN 1 ELSE 0 END) AS BIGINT) AS c
            FROM events GROUP BY user_id
        )
        SELECT CAST(count(*) AS BIGINT) AS n_tasks,
               round(avg(CASE WHEN n - c < 1 THEN 1.0
                            ELSE 1.0 - (CAST(n - c - 0 AS DOUBLE) / (n - 0)) END), 6)
                   AS pass_at_1,
               round(avg(CASE WHEN n - c < 5 THEN 1.0
                            ELSE 1.0 - (CAST(n - c - 0 AS DOUBLE) / (n - 0)) * (CAST(n - c - 1 AS DOUBLE) / (n - 1)) * (CAST(n - c - 2 AS DOUBLE) / (n - 2)) * (CAST(n - c - 3 AS DOUBLE) / (n - 3)) * (CAST(n - c - 4 AS DOUBLE) / (n - 4)) END), 6)
                   AS pass_at_5,
               round(avg(CASE WHEN n - c < 10 THEN 1.0
                            ELSE 1.0 - (CAST(n - c - 0 AS DOUBLE) / (n - 0)) * (CAST(n - c - 1 AS DOUBLE) / (n - 1)) * (CAST(n - c - 2 AS DOUBLE) / (n - 2)) * (CAST(n - c - 3 AS DOUBLE) / (n - 3)) * (CAST(n - c - 4 AS DOUBLE) / (n - 4)) * (CAST(n - c - 5 AS DOUBLE) / (n - 5)) * (CAST(n - c - 6 AS DOUBLE) / (n - 6)) * (CAST(n - c - 7 AS DOUBLE) / (n - 7)) * (CAST(n - c - 8 AS DOUBLE) / (n - 8)) * (CAST(n - c - 9 AS DOUBLE) / (n - 9)) END), 6)
                   AS pass_at_10
        FROM task WHERE n >= 10
    """,
    doc="Unbiased pass@k estimator (the HumanEval/Codex metric): per "
    "task with n attempts and c successes, pass@k = "
    "1 - C(n-c,k)/C(n,k), computed as the numerically stable "
    "k-factor product (never materializing factorials) with the "
    "fewer-than-k-failures branch pinned to 1 — the exact estimator "
    "from the Codex paper, NOT the biased empirical fraction, which "
    "systematically overestimates at small n. Tasks here are users, "
    "attempts their events, success = purchase; in an eval pipeline "
    "the same single hash-agg shape scores millions of "
    "(problem, sample) outcome rows: one rollup to (n, c) per task, "
    "then codegen arithmetic — no joins, no windows, "
    "embarrassingly parallel.",
    tags=("eval", "ml"),
)
def eval_pass_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    task = ev.groupBy("user_id").agg(
        F.count("*").cast("long").alias("n"),
        F.sum(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        )
        .cast("long")
        .alias("c"),
    )
    n, c = F.col("n"), F.col("c")

    def pass_at(k: int):
        ratio = F.lit(1.0)
        for i in range(k):
            ratio = ratio * ((n - c - i).cast("double") / (n - i))
        return F.round(
            F.avg(F.when(n - c < k, F.lit(1.0)).otherwise(1.0 - ratio)), 6
        ).alias(f"pass_at_{k}")

    return task.filter(n >= 10).agg(
        F.count("*").cast("long").alias("n_tasks"),
        *[pass_at(k) for k in [1, 5, 10]],
    )



# ---------------------------------------------------------------------------
# round 5 (cont.): survival hazard, OLS inference, ITS, naive Bayes
# ---------------------------------------------------------------------------


@query(
    "stats-nelson-aalen",
    oracle="""
        WITH ends AS (SELECT CAST(max(ts) AS DATE) AS obs_end FROM events),
        pu AS (
            SELECT user_id,
                   min(CASE WHEN event_type = 'view' THEN CAST(ts AS DATE) END)
                       AS fv,
                   min(CASE WHEN event_type = 'purchase' THEN CAST(ts AS DATE) END)
                       AS fp
            FROM events GROUP BY user_id
        ),
        dur AS (
            SELECT CASE WHEN fp IS NOT NULL AND fp >= fv
                        THEN date_diff('day', fv, fp) ELSE
                             date_diff('day', fv, e.obs_end) END AS t,
                   CASE WHEN fp IS NOT NULL AND fp >= fv THEN 1 ELSE 0 END
                       AS died
            FROM pu CROSS JOIN ends e
            WHERE fv IS NOT NULL
        ),
        per_t AS (
            SELECT t, CAST(sum(died) AS DOUBLE) AS d,
                   CAST(count(*) AS DOUBLE) AS total
            FROM dur GROUP BY t
        ),
        risk AS (
            SELECT t, d,
                   sum(total) OVER (ORDER BY t DESC
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS n_risk
            FROM per_t
        ),
        na AS (
            SELECT t, d, n_risk,
                   sum(d / n_risk) OVER w AS h,
                   sum(d / (n_risk * n_risk)) OVER w AS v
            FROM risk
            WINDOW w AS (ORDER BY t
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        )
        SELECT CAST(t AS BIGINT) AS t_days,
               CAST(n_risk AS BIGINT) AS n_risk,
               CAST(d AS BIGINT) AS n_events,
               round(h, 6) AS cum_hazard,
               round(exp(-h), 6) AS breslow_survival,
               round(sqrt(v), 6) AS hazard_se
        FROM na WHERE d > 0 ORDER BY t_days
    """,
    doc="Nelson-Aalen cumulative-hazard estimator on the SAME "
    "first-view -> first-purchase duration table as "
    "stats-kaplan-meier: H(t) = sum_{u<=t} d_u/n_u with variance "
    "sum d_u/n_u^2 (Poisson-type), plus the Breslow/Fleming-"
    "Harrington survival exp(-H) — preferred over KM's product form "
    "for small risk sets because the hazard increments are additive "
    "and the estimator never hits an absorbing zero. The windows run "
    "over the distinct-duration SUMMARY (bounded by the calendar "
    "span), never the user count, so the shape survives 100 TB: one "
    "shuffle to per-user firsts, one to per-duration counts, then "
    "tiny windows.",
    tags=("stats",),
)
def stats_nelson_aalen(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    ends = ev.agg(F.to_date(F.max("ts")).alias("obs_end"))
    pu = ev.groupBy("user_id").agg(
        F.min(
            F.when(F.col("event_type") == "view", F.to_date("ts"))
        ).alias("fv"),
        F.min(
            F.when(F.col("event_type") == "purchase", F.to_date("ts"))
        ).alias("fp"),
    )
    died = (F.col("fp").isNotNull() & (F.col("fp") >= F.col("fv"))).cast("int")
    dur = (
        pu.crossJoin(F.broadcast(ends))
        .filter(F.col("fv").isNotNull())
        .select(
            F.when(died == 1, F.datediff("fp", "fv"))
            .otherwise(F.datediff("obs_end", "fv"))
            .alias("t"),
            died.alias("died"),
        )
    )
    per_t = dur.groupBy("t").agg(
        F.sum("died").cast("double").alias("d"),
        F.count("*").cast("double").alias("total"),
    )
    w_desc = Window.orderBy(F.col("t").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_asc = Window.orderBy("t").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    risk = per_t.select(
        "t", "d", F.sum("total").over(w_desc).alias("n_risk")
    )
    na = risk.select(
        "t",
        "d",
        "n_risk",
        F.sum(F.col("d") / F.col("n_risk")).over(w_asc).alias("h"),
        F.sum(F.col("d") / (F.col("n_risk") * F.col("n_risk")))
        .over(w_asc)
        .alias("v"),
    )
    return (
        na.filter(F.col("d") > 0)
        .select(
            F.col("t").cast("long").alias("t_days"),
            F.col("n_risk").cast("long").alias("n_risk"),
            F.col("d").cast("long").alias("n_events"),
            F.round("h", 6).alias("cum_hazard"),
            F.round(F.exp(-F.col("h")), 6).alias("breslow_survival"),
            F.round(F.sqrt("v"), 6).alias("hazard_se"),
        )
        .orderBy("t_days")
    )


@query(
    "ml-ols-inference",
    oracle="""
        WITH pu AS (
            SELECT user_id,
                   ln(1 + CAST(sum(CASE WHEN event_type <> 'purchase'
                                        THEN 1 ELSE 0 END) AS DOUBLE)) AS x1,
                   avg(CASE WHEN event_type <> 'purchase' THEN value END)
                       AS x2,
                   CAST(sum(CASE WHEN event_type = 'purchase'
                                 THEN 1 ELSE 0 END) AS DOUBLE) AS y
            FROM events GROUP BY user_id
            HAVING sum(CASE WHEN event_type <> 'purchase' THEN 1 ELSE 0 END) > 0
        ),
        m AS (
            SELECT CAST(count(*) AS DOUBLE) AS n,
                   avg(x1) AS mx1, avg(x2) AS mx2, avg(y) AS my,
                   var_samp(x1) AS s11, var_samp(x2) AS s22,
                   covar_samp(x1, x2) AS s12,
                   covar_samp(x1, y) AS sy1, covar_samp(x2, y) AS sy2,
                   var_samp(y) AS syy
            FROM pu
        ),
        fit AS (
            SELECT n, mx1, mx2, my, s11, s22, s12, sy1, sy2, syy,
                   s11 * s22 - s12 * s12 AS det,
                   (sy1 * s22 - sy2 * s12) / (s11 * s22 - s12 * s12) AS b1,
                   (sy2 * s11 - sy1 * s12) / (s11 * s22 - s12 * s12) AS b2
            FROM m
        ),
        fitted AS (
            SELECT *,
                   my - b1 * mx1 - b2 * mx2 AS b0,
                   (n - 1) * (syy - b1 * sy1 - b2 * sy2) / (n - 3) AS sigma2,
                   (b1 * sy1 + b2 * sy2) / syy AS r2
            FROM fit
        )
        SELECT 'intercept' AS term, CAST(n AS BIGINT) AS n_obs,
               round(b0, 6) AS estimate,
               round(sqrt(sigma2 * (1 / n
                   + (mx1 * mx1 * s22 - 2 * mx1 * mx2 * s12 + mx2 * mx2 * s11)
                     / ((n - 1) * det))), 6) AS std_err,
               round(b0 / sqrt(sigma2 * (1 / n
                   + (mx1 * mx1 * s22 - 2 * mx1 * mx2 * s12 + mx2 * mx2 * s11)
                     / ((n - 1) * det))), 4) AS t_stat,
               round(r2, 6) AS r2
        FROM fitted
        UNION ALL
        SELECT 'x1_log_nonpurchase', CAST(n AS BIGINT), round(b1, 6),
               round(sqrt(sigma2 * s22 / ((n - 1) * det)), 6),
               round(b1 / sqrt(sigma2 * s22 / ((n - 1) * det)), 4),
               round(r2, 6)
        FROM fitted
        UNION ALL
        SELECT 'x2_mean_value', CAST(n AS BIGINT), round(b2, 6),
               round(sqrt(sigma2 * s11 / ((n - 1) * det)), 6),
               round(b2 / sqrt(sigma2 * s11 / ((n - 1) * det)), 4),
               round(r2, 6)
        FROM fitted
    """,
    doc="Two-regressor OLS with FULL inference — coefficient standard "
    "errors, t-statistics, and R^2 — in closed form from one moments "
    "aggregate: the 2x2 centered normal equations invert by cofactors "
    "(det = S11*S22 - S12^2), sigma^2 = SSE/(n-3) comes from the "
    "same covariances (SSE = (n-1)(Syy - b1*Sy1 - b2*Sy2)), and "
    "Var(b) = sigma^2 (X'X)^-1 needs nothing beyond them. Regresses "
    "per-user purchase count on log non-purchase activity and mean "
    "event value. Complements ml-vif-collinearity (same rollup, "
    "stability screen) and agg-regression-battery (single-regressor "
    "regr_* built-ins): this is the multi-feature fit WITH standard "
    "errors that neither provides. At 100 TB: one hash-agg to users, "
    "one 10-cell moment reduce, scalar algebra — no matrix library, "
    "no iterations, no collect.",
    tags=("ml", "stats"),
)
def ml_ols_inference(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    np_cnt = F.sum(
        F.when(F.col("event_type") != "purchase", 1).otherwise(0)
    )
    pu = (
        ev.groupBy("user_id")
        .agg(
            np_cnt.alias("npc"),
            F.avg(
                F.when(F.col("event_type") != "purchase", F.col("value"))
            ).alias("x2"),
            F.sum(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            )
            .cast("double")
            .alias("y"),
        )
        .filter(F.col("npc") > 0)
        .select(
            F.log(1 + F.col("npc").cast("double")).alias("x1"), "x2", "y"
        )
    )
    m = pu.agg(
        F.count("*").cast("double").alias("n"),
        F.avg("x1").alias("mx1"),
        F.avg("x2").alias("mx2"),
        F.avg("y").alias("my"),
        F.var_samp("x1").alias("s11"),
        F.var_samp("x2").alias("s22"),
        F.covar_samp("x1", "x2").alias("s12"),
        F.covar_samp("x1", "y").alias("sy1"),
        F.covar_samp("x2", "y").alias("sy2"),
        F.var_samp("y").alias("syy"),
    )
    n, mx1, mx2, my = F.col("n"), F.col("mx1"), F.col("mx2"), F.col("my")
    s11, s22, s12 = F.col("s11"), F.col("s22"), F.col("s12")
    sy1, sy2, syy = F.col("sy1"), F.col("sy2"), F.col("syy")
    det = s11 * s22 - s12 * s12
    b1 = (sy1 * s22 - sy2 * s12) / det
    b2 = (sy2 * s11 - sy1 * s12) / det
    b0 = my - b1 * mx1 - b2 * mx2
    sigma2 = (n - 1) * (syy - b1 * sy1 - b2 * sy2) / (n - 3)
    r2 = (b1 * sy1 + b2 * sy2) / syy
    se0 = F.sqrt(
        sigma2
        * (
            1 / n
            + (mx1 * mx1 * s22 - 2 * mx1 * mx2 * s12 + mx2 * mx2 * s11)
            / ((n - 1) * det)
        )
    )
    se1 = F.sqrt(sigma2 * s22 / ((n - 1) * det))
    se2 = F.sqrt(sigma2 * s11 / ((n - 1) * det))
    rows = []
    for term, est, se in [
        ("intercept", b0, se0),
        ("x1_log_nonpurchase", b1, se1),
        ("x2_mean_value", b2, se2),
    ]:
        rows.append(
            m.select(
                F.lit(term).alias("term"),
                n.cast("long").alias("n_obs"),
                F.round(est, 6).alias("estimate"),
                F.round(se, 6).alias("std_err"),
                F.round(est / se, 4).alias("t_stat"),
                F.round(r2, 6).alias("r2"),
            )
        )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out


@query(
    "timeseries-intervention-its",
    oracle="""
        WITH daily AS (
            SELECT CAST(ts AS DATE) AS d, CAST(count(*) AS DOUBLE) AS y
            FROM events GROUP BY 1
        ),
        bounds AS (
            SELECT min(d) AS d0,
                   CAST(date_diff('day', min(d), max(d)) / 2 AS BIGINT) AS t0
            FROM daily
        ),
        pts AS (
            SELECT CAST(date_diff('day', b.d0, d) AS DOUBLE) AS t, y,
                   CASE WHEN date_diff('day', b.d0, d) >= b.t0
                        THEN 1 ELSE 0 END AS post,
                   b.t0
            FROM daily CROSS JOIN bounds b
        ),
        seg AS (
            SELECT post, max(t0) AS t0,
                   CAST(count(*) AS BIGINT) AS n,
                   regr_slope(y, t) AS slope,
                   regr_intercept(y, t) AS icept
            FROM pts GROUP BY post
        )
        SELECT max(t0) AS t0_day,
               max(CASE WHEN post = 0 THEN n END) AS n_pre,
               max(CASE WHEN post = 1 THEN n END) AS n_post,
               round(max(CASE WHEN post = 0 THEN slope END), 6) AS slope_pre,
               round(max(CASE WHEN post = 1 THEN slope END), 6) AS slope_post,
               round(max(CASE WHEN post = 1 THEN slope END)
                   - max(CASE WHEN post = 0 THEN slope END), 6) AS slope_change,
               round((max(CASE WHEN post = 1 THEN icept END)
                      + max(CASE WHEN post = 1 THEN slope END) * max(t0))
                   - (max(CASE WHEN post = 0 THEN icept END)
                      + max(CASE WHEN post = 0 THEN slope END) * max(t0)),
                   6) AS level_jump
        FROM seg
    """,
    doc="Interrupted-time-series (segmented regression) on the daily "
    "event-volume series with the breakpoint at mid-span: fit "
    "independent OLS lines pre and post via regr_slope/regr_intercept "
    "and report the slope change and the level jump at the "
    "breakpoint (counterfactual pre-trend extrapolated to t0 vs the "
    "post line's value there) — the standard quasi-experimental "
    "read-out when a launch/policy lands at a known date and no "
    "control group exists (complements analytics-diff-in-diff, which "
    "needs one, and analytics-event-study, which reads day-level "
    "abnormal deltas rather than trend breaks). Daily rollup is "
    "bounded by the calendar, the regressions are built-in "
    "partial-aggregable regr_* — one shuffle total at any scale.",
    tags=("timeseries", "stats"),
)
def timeseries_intervention_its(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("d")).agg(
        F.count("*").cast("double").alias("y")
    )
    bounds = daily.agg(
        F.min("d").alias("d0"),
        (F.datediff(F.max("d"), F.min("d")) / 2)
        .cast("long")
        .alias("t0"),
    )
    pts = daily.crossJoin(F.broadcast(bounds)).select(
        F.datediff("d", "d0").cast("double").alias("t"),
        "y",
        (F.datediff("d", "d0") >= F.col("t0")).cast("int").alias("post"),
        "t0",
    )
    seg = pts.groupBy("post").agg(
        F.max("t0").alias("t0"),
        F.count("*").cast("long").alias("n"),
        F.regr_slope("y", "t").alias("slope"),
        F.regr_intercept("y", "t").alias("icept"),
    )

    def seg_max(col: str, post: int):
        return F.max(F.when(F.col("post") == post, F.col(col)))

    return seg.agg(
        F.max("t0").alias("t0_day"),
        seg_max("n", 0).alias("n_pre"),
        seg_max("n", 1).alias("n_post"),
        F.round(seg_max("slope", 0), 6).alias("slope_pre"),
        F.round(seg_max("slope", 1), 6).alias("slope_post"),
        F.round(seg_max("slope", 1) - seg_max("slope", 0), 6).alias(
            "slope_change"
        ),
        F.round(
            (seg_max("icept", 1) + seg_max("slope", 1) * F.max("t0"))
            - (seg_max("icept", 0) + seg_max("slope", 0) * F.max("t0")),
            6,
        ).alias("level_jump"),
    )


_NB_SALT = ":nb-salt-r5"


@query(
    "ml-naive-bayes",
    oracle=f"""
        WITH ev_np AS (
            SELECT * FROM events WHERE event_type <> 'purchase'
        ),
        uval AS (
            SELECT user_id, avg(value) AS mv FROM ev_np GROUP BY user_id
        ),
        ub AS (
            SELECT user_id,
                   CAST(floor(extract(hour FROM ts) / 6) AS INT) AS hb,
                   count(*) AS cnt
            FROM ev_np GROUP BY 1, 2
        ),
        uhour AS (
            SELECT user_id,
                   split_part(max(lpad(CAST(cnt AS VARCHAR), 10, '0')
                                  || ':' || CAST(hb AS VARCHAR)), ':', 2)
                       AS f_hour
            FROM ub GROUP BY user_id
        ),
        lab AS (
            SELECT user_id,
                   CASE WHEN sum(CASE WHEN event_type = 'purchase'
                                      THEN 1 ELSE 0 END) >= 13
                        THEN 1 ELSE 0 END AS label
            FROM events GROUP BY user_id
        ),
        base AS (
            SELECT v.user_id,
                   CASE WHEN v.mv < 48 THEN 'lo'
                        WHEN v.mv < 52 THEN 'mid' ELSE 'hi' END AS f_val,
                   h.f_hour, l.label,
                   ({sql_string_hash("CAST(v.user_id AS VARCHAR) || '" + _NB_SALT + "'")}) % 5
                       AS slot
            FROM uval v
            JOIN uhour h USING (user_id)
            JOIN lab l USING (user_id)
        ),
        tr AS (SELECT * FROM base WHERE slot < 4),
        te AS (SELECT * FROM base WHERE slot >= 4),
        ntr AS (SELECT CAST(count(*) AS DOUBLE) AS n_train FROM tr),
        pri AS (
            SELECT label AS c, CAST(count(*) AS DOUBLE) AS n_c
            FROM tr GROUP BY label
        ),
        cv AS (
            SELECT label AS c, f_val, CAST(count(*) AS DOUBLE) AS cnt
            FROM tr GROUP BY 1, 2
        ),
        ch AS (
            SELECT label AS c, f_hour, CAST(count(*) AS DOUBLE) AS cnt
            FROM tr GROUP BY 1, 2
        ),
        cls AS (SELECT 0 AS c UNION ALL SELECT 1),
        scored AS (
            SELECT t.user_id, t.label, cls.c,
                   ln((COALESCE(p.n_c, 0) + 1) / (n.n_train + 2))
                   + ln((COALESCE(v.cnt, 0) + 1) / (COALESCE(p.n_c, 0) + 3))
                   + ln((COALESCE(h.cnt, 0) + 1) / (COALESCE(p.n_c, 0) + 4))
                       AS ll
            FROM te t CROSS JOIN cls CROSS JOIN ntr n
            LEFT JOIN pri p ON p.c = cls.c
            LEFT JOIN cv v ON v.c = cls.c AND v.f_val = t.f_val
            LEFT JOIN ch h ON h.c = cls.c AND h.f_hour = t.f_hour
        ),
        piv AS (
            SELECT user_id, label,
                   max(CASE WHEN c = 1 THEN ll END) AS ll1,
                   max(CASE WHEN c = 0 THEN ll END) AS ll0
            FROM scored GROUP BY 1, 2
        ),
        met AS (
            SELECT label,
                   CASE WHEN ll1 > ll0 THEN 1 ELSE 0 END AS pred,
                   CASE WHEN label = 1 THEN ll1 ELSE ll0 END AS llt,
                   greatest(ll0, ll1) AS m, ll0, ll1
            FROM piv
        )
        SELECT (SELECT CAST(count(*) AS BIGINT) FROM tr) AS n_train,
               CAST(count(*) AS BIGINT) AS n_test,
               round(avg(CASE WHEN pred = label THEN 1.0 ELSE 0.0 END), 6)
                   AS accuracy,
               round(-avg(llt - (m + ln(exp(ll0 - m) + exp(ll1 - m)))), 6)
                   AS log_loss,
               round(avg(CAST(label AS DOUBLE)), 6) AS base_rate
        FROM met
    """,
    doc="In-engine categorical naive Bayes, trained AND scored in one "
    "plan: label = heavy purchaser (>= 13 purchase events), features "
    "from NON-purchase events only (mean-value bin, modal "
    "hour-of-day quadrant via the deterministic lpad-string argmax — "
    "no mode() tie ambiguity across engines), split 80/20 by the "
    "engine-portable md5 hash of user_id. Laplace-smoothed "
    "class-conditional tables are tiny groupBy outputs that join "
    "back BROADCAST to the test set; log-sum-exp normalizes the "
    "log-loss stably. Reports accuracy, log-loss, and the base rate "
    "it must beat. The 100 TB shape is exactly this: model state is "
    "O(classes x feature-values), never leaves the JVM, and scoring "
    "is a map-side join — the classic why-naive-Bayes-scales story.",
    tags=("ml",),
)
def ml_naive_bayes(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    ev_np = ev.filter(F.col("event_type") != "purchase")
    uval = ev_np.groupBy("user_id").agg(F.avg("value").alias("mv"))
    ub = ev_np.groupBy(
        "user_id",
        F.floor(F.hour("ts") / 6).cast("int").alias("hb"),
    ).agg(F.count("*").alias("cnt"))
    uhour = ub.groupBy("user_id").agg(
        F.substring_index(
            F.max(
                F.concat(
                    F.lpad(F.col("cnt").cast("string"), 10, "0"),
                    F.lit(":"),
                    F.col("hb").cast("string"),
                )
            ),
            ":",
            -1,
        ).alias("f_hour")
    )
    lab = ev.groupBy("user_id").agg(
        (
            F.sum(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            )
            >= 13
        )
        .cast("int")
        .alias("label")
    )
    slot = string_hash(
        F.concat(F.col("user_id").cast("string"), F.lit(_NB_SALT))
    ) % 5
    base = (
        uval.join(uhour, "user_id")
        .join(lab, "user_id")
        .select(
            "user_id",
            F.when(F.col("mv") < 48, "lo")
            .when(F.col("mv") < 52, "mid")
            .otherwise("hi")
            .alias("f_val"),
            "f_hour",
            "label",
            slot.alias("slot"),
        )
    )
    tr = base.filter(F.col("slot") < 4)
    te = base.filter(F.col("slot") >= 4)
    ntr = tr.agg(F.count("*").cast("double").alias("n_train"))
    pri = tr.groupBy(F.col("label").alias("c")).agg(
        F.count("*").cast("double").alias("n_c")
    )
    cv = tr.groupBy(F.col("label").alias("c"), "f_val").agg(
        F.count("*").cast("double").alias("cnt_v")
    )
    ch = tr.groupBy(F.col("label").alias("c"), "f_hour").agg(
        F.count("*").cast("double").alias("cnt_h")
    )
    cls = spark.range(2).select(F.col("id").cast("int").alias("c"))
    n_c = F.coalesce(F.col("n_c"), F.lit(0.0))
    cvr = cv.select(
        F.col("c").alias("cv_c"), F.col("f_val").alias("cv_f"), "cnt_v"
    )
    chr_ = ch.select(
        F.col("c").alias("ch_c"), F.col("f_hour").alias("ch_f"), "cnt_h"
    )
    scored = (
        te.crossJoin(F.broadcast(cls))
        .crossJoin(F.broadcast(ntr))
        .join(F.broadcast(pri), "c", "left")
        .join(
            F.broadcast(cvr),
            (F.col("c") == F.col("cv_c")) & (F.col("f_val") == F.col("cv_f")),
            "left",
        )
        .join(
            F.broadcast(chr_),
            (F.col("c") == F.col("ch_c"))
            & (F.col("f_hour") == F.col("ch_f")),
            "left",
        )
        .select(
            "user_id",
            "label",
            "c",
            (
                F.log((n_c + 1) / (F.col("n_train") + 2))
                + F.log(
                    (F.coalesce(F.col("cnt_v"), F.lit(0.0)) + 1) / (n_c + 3)
                )
                + F.log(
                    (F.coalesce(F.col("cnt_h"), F.lit(0.0)) + 1) / (n_c + 4)
                )
            ).alias("ll"),
        )
    )
    piv = scored.groupBy("user_id", "label").agg(
        F.max(F.when(F.col("c") == 1, F.col("ll"))).alias("ll1"),
        F.max(F.when(F.col("c") == 0, F.col("ll"))).alias("ll0"),
    )
    m = F.greatest("ll0", "ll1")
    llt = F.when(F.col("label") == 1, F.col("ll1")).otherwise(F.col("ll0"))
    pred = F.when(F.col("ll1") > F.col("ll0"), 1).otherwise(0)
    return piv.crossJoin(
        F.broadcast(tr.agg(F.count("*").cast("long").alias("n_train")))
    ).agg(
        F.max("n_train").alias("n_train"),
        F.count("*").cast("long").alias("n_test"),
        F.round(
            F.avg(F.when(pred == F.col("label"), 1.0).otherwise(0.0)), 6
        ).alias("accuracy"),
        F.round(
            -F.avg(
                llt
                - (
                    m
                    + F.log(
                        F.exp(F.col("ll0") - m) + F.exp(F.col("ll1") - m)
                    )
                )
            ),
            6,
        ).alias("log_loss"),
        F.round(F.avg(F.col("label").cast("double")), 6).alias("base_rate"),
    )


_BD_SALT = ":brier-salt-r5"


@query(
    "eval-brier-decomposition",
    oracle=f"""
        WITH tagged AS (
            SELECT CAST(extract(hour FROM ts) AS INT) AS h,
                   CASE WHEN event_type = 'purchase' THEN 1.0 ELSE 0.0 END
                       AS o,
                   ({sql_string_hash("CAST(event_id AS VARCHAR) || '" + _BD_SALT + "'")}) % 5
                       AS slot
            FROM events
        ),
        rates AS (
            SELECT h, avg(o) AS p FROM tagged WHERE slot < 4 GROUP BY h
        ),
        te AS (
            SELECT t.o, r.p FROM tagged t JOIN rates r ON t.h = r.h
            WHERE t.slot >= 4
        ),
        bins AS (
            SELECT p, CAST(count(*) AS DOUBLE) AS n_k, avg(o) AS obar_k
            FROM te GROUP BY p
        ),
        tot AS (
            SELECT CAST(count(*) AS DOUBLE) AS n, avg(o) AS obar,
                   avg((p - o) * (p - o)) AS brier
            FROM te
        )
        SELECT CAST(t.n AS BIGINT) AS n_test,
               round(t.brier, 6) AS brier,
               round(sum(b.n_k * (b.p - b.obar_k) * (b.p - b.obar_k)) / t.n, 6)
                   AS reliability,
               round(sum(b.n_k * (b.obar_k - t.obar) * (b.obar_k - t.obar)) / t.n, 6)
                   AS resolution,
               round(t.obar * (1 - t.obar), 6) AS uncertainty,
               round(t.brier
                     - (sum(b.n_k * (b.p - b.obar_k) * (b.p - b.obar_k)) / t.n
                        - sum(b.n_k * (b.obar_k - t.obar) * (b.obar_k - t.obar)) / t.n
                        + t.obar * (1 - t.obar)), 6) AS identity_residual
        FROM bins b CROSS JOIN tot t
        GROUP BY t.n, t.brier, t.obar
    """,
    doc="Murphy decomposition of the Brier score — Brier = reliability "
    "- resolution + uncertainty — for an hour-of-day purchase-rate "
    "forecaster: rates fit on an 80%% hash split of events, scored on "
    "the rest, with bins = the 24 distinct forecast values so the "
    "identity holds EXACTLY (identity_residual is emitted and must "
    "round to 0, a self-check the scalar Brier alone can't give). "
    "Reliability isolates calibration error, resolution the "
    "forecaster's discrimination — the pair stats-calibration-curve "
    "(per-bin rows) doesn't summarize. Scale shape: one hash-agg for "
    "rates (24 rows, broadcast back), one for bins, one global "
    "moment — no windows, no collects.",
    tags=("eval", "stats"),
)
def eval_brier_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    tagged = ev.select(
        F.hour("ts").cast("int").alias("h"),
        F.when(F.col("event_type") == "purchase", 1.0)
        .otherwise(0.0)
        .alias("o"),
        (
            string_hash(
                F.concat(F.col("event_id").cast("string"), F.lit(_BD_SALT))
            )
            % 5
        ).alias("slot"),
    )
    rates = (
        tagged.filter(F.col("slot") < 4)
        .groupBy("h")
        .agg(F.avg("o").alias("p"))
    )
    te = (
        tagged.filter(F.col("slot") >= 4)
        .join(F.broadcast(rates), "h")
        .select("o", "p")
    )
    bins = te.groupBy("p").agg(
        F.count("*").cast("double").alias("n_k"),
        F.avg("o").alias("obar_k"),
    )
    tot = te.agg(
        F.count("*").cast("double").alias("n"),
        F.avg("o").alias("obar"),
        F.avg((F.col("p") - F.col("o")) * (F.col("p") - F.col("o"))).alias(
            "brier"
        ),
    )
    nk, p, obk = F.col("n_k"), F.col("p"), F.col("obar_k")
    n, obar, brier = F.col("n"), F.col("obar"), F.col("brier")
    rel = F.sum(nk * (p - obk) * (p - obk)) / F.max(n)
    res = F.sum(nk * (obk - obar) * (obk - obar)) / F.max(n)
    unc = F.max(obar * (1 - obar))
    return (
        bins.crossJoin(F.broadcast(tot))
        .groupBy("n", "brier", "obar")
        .agg(
            F.round(rel, 6).alias("_rel"),
            F.round(res, 6).alias("_res"),
            F.round(unc, 6).alias("_unc"),
            F.round(F.max(brier) - (rel - res + unc), 6).alias(
                "identity_residual"
            ),
        )
        .select(
            F.col("n").cast("long").alias("n_test"),
            F.round("brier", 6).alias("brier"),
            F.col("_rel").alias("reliability"),
            F.col("_res").alias("resolution"),
            F.col("_unc").alias("uncertainty"),
            "identity_residual",
        )
    )


@query(
    "stats-anova-two-way",
    oracle="""
        WITH obs AS (
            SELECT event_type AS a,
                   CAST(floor(extract(hour FROM ts) / 6) AS INT) AS b,
                   value AS y
            FROM events
        ),
        g AS (SELECT avg(y) AS gm, CAST(count(*) AS DOUBLE) AS n FROM obs),
        ma AS (SELECT a, avg(y) AS am, CAST(count(*) AS DOUBLE) AS na
               FROM obs GROUP BY a),
        mb AS (SELECT b, avg(y) AS bm, CAST(count(*) AS DOUBLE) AS nb
               FROM obs GROUP BY b),
        mc AS (SELECT a, b, avg(y) AS cm, CAST(count(*) AS DOUBLE) AS nc
               FROM obs GROUP BY a, b),
        sse AS (
            SELECT sum((o.y - c.cm) * (o.y - c.cm)) AS ss_err
            FROM obs o JOIN mc c ON o.a = c.a AND o.b = c.b
        ),
        ssa AS (SELECT sum(na * (am - g.gm) * (am - g.gm)) AS ss_a,
                       CAST(count(*) AS DOUBLE) - 1 AS df_a
                FROM ma CROSS JOIN g GROUP BY g.gm),
        ssb AS (SELECT sum(nb * (bm - g.gm) * (bm - g.gm)) AS ss_b,
                       CAST(count(*) AS DOUBLE) - 1 AS df_b
                FROM mb CROSS JOIN g GROUP BY g.gm),
        ssab AS (
            SELECT sum(nc * (cm - am - bm + g.gm) * (cm - am - bm + g.gm))
                       AS ss_ab,
                   CAST(count(*) AS DOUBLE) AS n_cells
            FROM mc c
            JOIN ma ON c.a = ma.a
            JOIN mb ON c.b = mb.b
            CROSS JOIN g
            GROUP BY g.gm
        )
        SELECT src, round(ss, 4) AS sum_sq, CAST(df AS BIGINT) AS df,
               round(ss / df, 6) AS mean_sq,
               round((ss / df) / (e.ss_err / (g.n - ab.n_cells)), 4) AS f_stat
        FROM (
            SELECT 'event_type' AS src, ss_a AS ss, df_a AS df FROM ssa
            UNION ALL
            SELECT 'hour_quadrant', ss_b, df_b FROM ssb
            UNION ALL
            SELECT 'interaction', ss_ab,
                   (SELECT df_a FROM ssa) * (SELECT df_b FROM ssb)
            FROM ssab
        ) t
        CROSS JOIN sse e CROSS JOIN g CROSS JOIN ssab ab
    """,
    doc="Two-way ANOVA with interaction on event value by event_type x "
    "hour-of-day quadrant: cell-mean decomposition SS_A (weighted "
    "main effect), SS_B, SS_AB (interaction contrast "
    "cm - am - bm + gm), SSE from the full-cell model, each with its "
    "F against MSE — the factorial extension of stats-anova-oneway / "
    "stats-welch-anova that tests whether the hour effect DIFFERS by "
    "event type, not merely whether either margin moves. Unbalanced "
    "cells use the weighted (Type-I-style) decomposition; documented "
    "rather than hidden, the statistic is exactly mirrored in the "
    "oracle. Shape: three bounded groupBys (5, 4, 20 rows) + one "
    "fact-side join to cell means — one wide shuffle at any scale.",
    tags=("stats",),
)
def stats_anova_two_way(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    obs = ev.select(
        F.col("event_type").alias("a"),
        F.floor(F.hour("ts") / 6).cast("int").alias("b"),
        F.col("value").alias("y"),
    )
    g = obs.agg(
        F.avg("y").alias("gm"), F.count("*").cast("double").alias("n")
    )
    ma = obs.groupBy("a").agg(
        F.avg("y").alias("am"), F.count("*").cast("double").alias("na")
    )
    mb = obs.groupBy("b").agg(
        F.avg("y").alias("bm"), F.count("*").cast("double").alias("nb")
    )
    mc = obs.groupBy("a", "b").agg(
        F.avg("y").alias("cm"), F.count("*").cast("double").alias("nc")
    )
    ss_err = (
        obs.join(F.broadcast(mc.select("a", "b", "cm")), ["a", "b"])
        .agg(
            F.sum(
                (F.col("y") - F.col("cm")) * (F.col("y") - F.col("cm"))
            ).alias("ss_err")
        )
    )
    ssa = (
        ma.crossJoin(F.broadcast(g))
        .groupBy("gm")
        .agg(
            F.sum(
                F.col("na") * (F.col("am") - F.col("gm")) * (F.col("am") - F.col("gm"))
            ).alias("ss_a"),
            (F.count("*").cast("double") - 1).alias("df_a"),
        )
        .select("ss_a", "df_a")
    )
    ssb = (
        mb.crossJoin(F.broadcast(g))
        .groupBy("gm")
        .agg(
            F.sum(
                F.col("nb") * (F.col("bm") - F.col("gm")) * (F.col("bm") - F.col("gm"))
            ).alias("ss_b"),
            (F.count("*").cast("double") - 1).alias("df_b"),
        )
        .select("ss_b", "df_b")
    )
    inter = (
        mc.join(F.broadcast(ma.select("a", "am")), "a")
        .join(F.broadcast(mb.select("b", "bm")), "b")
        .crossJoin(F.broadcast(g))
    )
    dev = F.col("cm") - F.col("am") - F.col("bm") + F.col("gm")
    ssab = inter.groupBy("gm").agg(
        F.sum(F.col("nc") * dev * dev).alias("ss_ab"),
        F.count("*").cast("double").alias("n_cells"),
    ).select("ss_ab", "n_cells")
    rows = (
        ssa.select(
            F.lit("event_type").alias("src"),
            F.col("ss_a").alias("ss"),
            F.col("df_a").alias("df"),
        )
        .unionByName(
            ssb.select(
                F.lit("hour_quadrant").alias("src"),
                F.col("ss_b").alias("ss"),
                F.col("df_b").alias("df"),
            )
        )
        .unionByName(
            ssab.crossJoin(F.broadcast(ssa.select("df_a")))
            .crossJoin(F.broadcast(ssb.select("df_b")))
            .select(
                F.lit("interaction").alias("src"),
                F.col("ss_ab").alias("ss"),
                (F.col("df_a") * F.col("df_b")).alias("df"),
            )
        )
    )
    return (
        rows.crossJoin(F.broadcast(ss_err))
        .crossJoin(F.broadcast(g.select("n")))
        .crossJoin(F.broadcast(ssab.select("n_cells")))
        .select(
            "src",
            F.round("ss", 4).alias("sum_sq"),
            F.col("df").cast("long").alias("df"),
            F.round(F.col("ss") / F.col("df"), 6).alias("mean_sq"),
            F.round(
                (F.col("ss") / F.col("df"))
                / (F.col("ss_err") / (F.col("n") - F.col("n_cells"))),
                4,
            ).alias("f_stat"),
        )
    )


@query(
    "timeseries-croston",
    oracle="""
        WITH demand AS (
            SELECT l_partkey, CAST(l_shipdate AS DATE) AS d,
                   sum(l_quantity) AS z
            FROM lineitem GROUP BY 1, 2
        ),
        seq AS (
            SELECT l_partkey, d, z,
                   row_number() OVER w AS rn,
                   count(*) OVER (PARTITION BY l_partkey) AS n,
                   CAST(date_diff('day',
                        lag(d) OVER w, d) AS DOUBLE) AS iv
            FROM demand
            WINDOW w AS (PARTITION BY l_partkey ORDER BY d)
        ),
        eligible AS (SELECT * FROM seq WHERE n >= 4),
        zhat AS (
            SELECT l_partkey, max(n) AS n_demands,
                   sum(CASE WHEN rn = 1 THEN power(0.9, n - 1) * z
                            ELSE 0.1 * power(0.9, n - rn) * z END) AS z_hat,
                   sum(CASE WHEN rn = 2 THEN power(0.9, n - 2) * iv
                            WHEN rn > 2 THEN 0.1 * power(0.9, n - rn) * iv
                            ELSE 0 END) AS p_hat
            FROM eligible GROUP BY l_partkey
        )
        SELECT l_partkey, CAST(n_demands AS BIGINT) AS n_demands,
               round(z_hat, 6) AS size_ses,
               round(p_hat, 6) AS interval_ses,
               round(z_hat / p_hat, 6) AS croston_forecast
        FROM zhat
        ORDER BY croston_forecast DESC, l_partkey
        LIMIT 20
    """,
    doc="Croston's method for intermittent demand — the standard "
    "forecaster when most periods have ZERO demand and plain "
    "SES/Holt (timeseries-ses-grid, -holt-linear) smear the zeros "
    "into a biased level: SES(alpha=0.1) separately on the non-zero "
    "demand SIZES and on the inter-demand INTERVALS, forecast per "
    "period = z_hat/p_hat. The recursive SES is unrolled into its "
    "closed weighted form (alpha(1-alpha)^(n-k), first term "
    "(1-alpha)^(n-1)) so both engines compute an identical "
    "windowless-per-row sum; windows partition BY PART over that "
    "part's demand dates — bounded per key, parallel across the part "
    "dimension, exactly how 100 TB of sparse SKU series shards. "
    "Top-20 via global sort on the tiny per-part summary.",
    tags=("timeseries",),
)
def timeseries_croston(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem")
    demand = li.groupBy(
        "l_partkey", F.to_date("l_shipdate").alias("d")
    ).agg(F.sum("l_quantity").alias("z"))
    w = Window.partitionBy("l_partkey").orderBy("d")
    seq = demand.select(
        "l_partkey",
        "d",
        "z",
        F.row_number().over(w).alias("rn"),
        F.count("*")
        .over(Window.partitionBy("l_partkey"))
        .alias("n"),
        F.datediff("d", F.lag("d").over(w)).cast("double").alias("iv"),
    ).filter(F.col("n") >= 4)
    rn, n, z, iv = F.col("rn"), F.col("n"), F.col("z"), F.col("iv")
    a = F.lit(0.1)
    zhat = seq.groupBy("l_partkey").agg(
        F.max("n").cast("long").alias("n_demands"),
        F.sum(
            F.when(rn == 1, F.pow(1 - a, n - 1) * z).otherwise(
                a * F.pow(1 - a, n - rn) * z
            )
        ).alias("z_hat"),
        F.sum(
            F.when(rn == 2, F.pow(1 - a, n - 2) * iv)
            .when(rn > 2, a * F.pow(1 - a, n - rn) * iv)
            .otherwise(0.0)
        ).alias("p_hat"),
    )
    return (
        zhat.select(
            "l_partkey",
            "n_demands",
            F.round("z_hat", 6).alias("size_ses"),
            F.round("p_hat", 6).alias("interval_ses"),
            F.round(F.col("z_hat") / F.col("p_hat"), 6).alias(
                "croston_forecast"
            ),
        )
        .orderBy(F.col("croston_forecast").desc(), "l_partkey")
        .limit(20)
    )


_CB_SALT = ":classbal-salt-r5"


@query(
    "sample-class-balance",
    oracle=f"""
        WITH counts AS (
            SELECT lang, CAST(count(*) AS DOUBLE) AS n_c FROM documents
            GROUP BY lang
        ),
        m AS (SELECT min(n_c) AS m FROM counts),
        kept AS (
            SELECT d.lang,
                   CASE WHEN ({sql_string_hash("CAST(d.doc_id AS VARCHAR) || '" + _CB_SALT + "'")}) % 1000000
                        < CAST(floor(1000000 * mm.m / c.n_c) AS BIGINT)
                        THEN 1 ELSE 0 END AS keep
            FROM documents d
            JOIN counts c ON d.lang = c.lang
            CROSS JOIN m mm
        )
        SELECT lang,
               CAST(count(*) AS BIGINT) AS n_before,
               CAST(sum(keep) AS BIGINT) AS n_kept,
               round(sum(keep) / CAST(count(*) AS DOUBLE), 6) AS keep_rate
        FROM kept GROUP BY lang
    """,
    doc="Deterministic class rebalancing by Bernoulli hash thresholding "
    "— downsample every language to (approximately) the minority "
    "class size by keeping doc_id-hash %% 1e6 < 1e6*m/n_c: no "
    "per-class ranking window (which would funnel each class through "
    "one task at 100 TB — the exact trap sample-fixed-k-per-group "
    "documents for its small-k case), no rand() irreproducibility; "
    "re-runs, engines, and cluster sizes all keep the SAME rows. "
    "Class counts are a tiny broadcast; the pass over the fact table "
    "is map-only. Emits per-class before/after so the residual "
    "imbalance of the Bernoulli approximation is visible.",
    tags=("sample", "ml"),
)
def sample_class_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    counts = d.groupBy("lang").agg(
        F.count("*").cast("double").alias("n_c")
    )
    m = counts.agg(F.min("n_c").alias("m"))
    keep = (
        string_hash(
            F.concat(F.col("doc_id").cast("string"), F.lit(_CB_SALT))
        )
        % 1000000
        < F.floor(1000000 * F.col("m") / F.col("n_c")).cast("long")
    ).cast("int")
    kept = (
        d.join(F.broadcast(counts), "lang")
        .crossJoin(F.broadcast(m))
        .select("lang", keep.alias("keep"))
    )
    return kept.groupBy("lang").agg(
        F.count("*").cast("long").alias("n_before"),
        F.sum("keep").cast("long").alias("n_kept"),
        F.round(
            F.sum("keep") / F.count("*").cast("double"), 6
        ).alias("keep_rate"),
    )


@query(
    "stats-g-test",
    oracle="""
        WITH cells AS (
            SELECT lang, source, CAST(count(*) AS DOUBLE) AS obs
            FROM documents GROUP BY lang, source
        ),
        tot AS (
            SELECT lang, source, obs,
                   sum(obs) OVER (PARTITION BY lang) AS row_tot,
                   sum(obs) OVER (PARTITION BY source) AS col_tot,
                   sum(obs) OVER () AS n
            FROM cells
        ),
        g AS (
            SELECT max(n) AS n,
                   CAST(count(DISTINCT lang) AS DOUBLE) AS r,
                   CAST(count(DISTINCT source) AS DOUBLE) AS c,
                   2 * sum(CASE WHEN obs > 0
                                THEN obs * ln(obs / (row_tot * col_tot / n))
                                ELSE 0 END) AS g_stat
            FROM tot
        ),
        marg AS (
            SELECT sum(1.0 / row_tot) / max(g.c) AS inv_rows,
                   sum(1.0 / col_tot) / max(g.r) AS inv_cols
            FROM tot CROSS JOIN g
        )
        SELECT CAST(g.n AS BIGINT) AS n_docs,
               CAST((g.r - 1) * (g.c - 1) AS BIGINT) AS dof,
               round(g.g_stat, 6) AS g_stat,
               round(1 + (g.n * m.inv_rows - 1) * (g.n * m.inv_cols - 1)
                         / (6 * g.n * (g.r - 1) * (g.c - 1)), 6) AS williams_q,
               round(g.g_stat / (1 + (g.n * m.inv_rows - 1)
                                     * (g.n * m.inv_cols - 1)
                                     / (6 * g.n * (g.r - 1) * (g.c - 1))), 6)
                   AS g_adj
        FROM g CROSS JOIN marg m
    """,
    doc="G-test (log-likelihood-ratio independence test) on the lang x "
    "source contingency table with Williams' small-sample correction "
    "q = 1 + (N*sum(1/row)-1)(N*sum(1/col)-1) / (6N(r-1)(c-1)): "
    "G = 2*sum O ln(O/E) is additive across partitions of the table "
    "(chi-square is not) and is the test the chi2 approximates — "
    "stats-chi-square's companion for sparse cells, on a DIFFERENT "
    "pair of factors so the two ops cross-check distinct fixture "
    "margins. Cell counts, marginal windows over the bounded "
    "(lang x source) grid, one scalar combine — the same "
    "contingency shape at any data volume.",
    tags=("stats",),
)
def stats_g_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    cells = d.groupBy("lang", "source").agg(
        F.count("*").cast("double").alias("obs")
    )
    tot = cells.select(
        "lang",
        "source",
        "obs",
        F.sum("obs").over(Window.partitionBy("lang")).alias("row_tot"),
        F.sum("obs").over(Window.partitionBy("source")).alias("col_tot"),
        F.sum("obs").over(Window.partitionBy()).alias("n"),
    )
    g = tot.agg(
        F.max("n").alias("n"),
        F.countDistinct("lang").cast("double").alias("r"),
        F.countDistinct("source").cast("double").alias("c"),
        (
            2
            * F.sum(
                F.when(
                    F.col("obs") > 0,
                    F.col("obs")
                    * F.log(
                        F.col("obs")
                        / (F.col("row_tot") * F.col("col_tot") / F.col("n"))
                    ),
                ).otherwise(0.0)
            )
        ).alias("g_stat"),
    )
    marg = tot.crossJoin(F.broadcast(g.select("r", "c"))).agg(
        (F.sum(1.0 / F.col("row_tot")) / F.max("c")).alias("inv_rows"),
        (F.sum(1.0 / F.col("col_tot")) / F.max("r")).alias("inv_cols"),
    )
    q = 1 + (F.col("n") * F.col("inv_rows") - 1) * (
        F.col("n") * F.col("inv_cols") - 1
    ) / (6 * F.col("n") * (F.col("r") - 1) * (F.col("c") - 1))
    return (
        g.crossJoin(F.broadcast(marg))
        .select(
            F.col("n").cast("long").alias("n_docs"),
            ((F.col("r") - 1) * (F.col("c") - 1))
            .cast("long")
            .alias("dof"),
            F.round("g_stat", 6).alias("g_stat"),
            F.round(q, 6).alias("williams_q"),
            F.round(F.col("g_stat") / q, 6).alias("g_adj"),
        )
    )


@query(
    "eval-auc-delong-ci",
    oracle="""
        WITH scored AS (
            SELECT round(value, 2) AS s,
                   CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
            FROM events
        ),
        bins AS (
            SELECT s, CAST(sum(y) AS DOUBLE) AS np_k,
                   CAST(sum(1 - y) AS DOUBLE) AS nn_k
            FROM scored GROUP BY s
        ),
        cum AS (
            SELECT s, np_k, nn_k,
                   coalesce(sum(nn_k) OVER (ORDER BY s
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                       AS negs_below,
                   sum(np_k) OVER (ORDER BY s
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS pos_upto,
                   sum(np_k) OVER () AS np,
                   sum(nn_k) OVER () AS nn
            FROM bins
        ),
        plc AS (
            SELECT np_k, nn_k, np, nn,
                   (negs_below + nn_k / 2) / nn AS v10,
                   (np - pos_upto + np_k / 2) / np AS v01
            FROM cum
        ),
        auc AS (
            SELECT max(np) AS np, max(nn) AS nn,
                   sum(np_k * v10) / max(np) AS a
            FROM plc
        ),
        var_c AS (
            SELECT max(a.np) AS np, max(a.nn) AS nn, max(a.a) AS a,
                   sum(p.np_k * (p.v10 - a.a) * (p.v10 - a.a))
                       / (max(a.np) - 1) AS s10,
                   sum(p.nn_k * (p.v01 - a.a) * (p.v01 - a.a))
                       / (max(a.nn) - 1) AS s01
            FROM plc p CROSS JOIN auc a
        )
        SELECT CAST(np AS BIGINT) AS n_pos, CAST(nn AS BIGINT) AS n_neg,
               round(a, 6) AS auc,
               round(sqrt(s10 / np + s01 / nn), 6) AS se,
               round(a - 1.959964 * sqrt(s10 / np + s01 / nn), 6) AS ci_lo,
               round(a + 1.959964 * sqrt(s10 / np + s01 / nn), 6) AS ci_hi
        FROM var_c
    """,
    doc="Exact AUC with the DeLong variance and 95%% CI — the "
    "placement-value formulation: per distinct (rounded) score, "
    "v10 = (negatives below + half ties)/NN for positives and the "
    "mirror v01 for negatives; AUC is the positive-weighted mean of "
    "v10, Var = S10/NP + S01/NN from the weighted placement "
    "variances. Complements stats-roc-auc-binned (point estimate "
    "only): DeLong is the inference-grade answer reviewers ask for "
    "when two models' AUCs differ by 0.003. Scores round to 2 "
    "decimals so the windows run over a BOUNDED distinct-score "
    "summary (<=10k rows regardless of event count) — the same "
    "binning contract as the repo's other global-window stats ops.",
    tags=("eval", "ml", "stats"),
)
def eval_auc_delong_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    scored = ev.select(
        F.round("value", 2).alias("s"),
        F.when(F.col("event_type") == "purchase", 1)
        .otherwise(0)
        .alias("y"),
    )
    bins = scored.groupBy("s").agg(
        F.sum("y").cast("double").alias("np_k"),
        F.sum(1 - F.col("y")).cast("double").alias("nn_k"),
    )
    w_prev = Window.orderBy("s").rowsBetween(Window.unboundedPreceding, -1)
    w_upto = Window.orderBy("s").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_all = Window.partitionBy()
    cum = bins.select(
        "np_k",
        "nn_k",
        F.coalesce(F.sum("nn_k").over(w_prev), F.lit(0.0)).alias(
            "negs_below"
        ),
        F.sum("np_k").over(w_upto).alias("pos_upto"),
        F.sum("np_k").over(w_all).alias("np"),
        F.sum("nn_k").over(w_all).alias("nn"),
    )
    plc = cum.select(
        "np_k",
        "nn_k",
        "np",
        "nn",
        ((F.col("negs_below") + F.col("nn_k") / 2) / F.col("nn")).alias(
            "v10"
        ),
        (
            (F.col("np") - F.col("pos_upto") + F.col("np_k") / 2)
            / F.col("np")
        ).alias("v01"),
    )
    auc = plc.agg(
        F.max("np").alias("np"),
        F.max("nn").alias("nn"),
        (F.sum(F.col("np_k") * F.col("v10")) / F.max("np")).alias("a"),
    )
    a = F.col("a")
    var_c = plc.crossJoin(F.broadcast(auc.select(a, F.col("np").alias("np_a"), F.col("nn").alias("nn_a")))).agg(
        F.max("np_a").alias("np"),
        F.max("nn_a").alias("nn"),
        F.max("a").alias("a"),
        (
            F.sum(F.col("np_k") * (F.col("v10") - a) * (F.col("v10") - a))
            / (F.max("np_a") - 1)
        ).alias("s10"),
        (
            F.sum(F.col("nn_k") * (F.col("v01") - a) * (F.col("v01") - a))
            / (F.max("nn_a") - 1)
        ).alias("s01"),
    )
    se = F.sqrt(F.col("s10") / F.col("np") + F.col("s01") / F.col("nn"))
    return var_c.select(
        F.col("np").cast("long").alias("n_pos"),
        F.col("nn").cast("long").alias("n_neg"),
        F.round("a", 6).alias("auc"),
        F.round(se, 6).alias("se"),
        F.round(a - 1.959964 * se, 6).alias("ci_lo"),
        F.round(a + 1.959964 * se, 6).alias("ci_hi"),
    )


@query(
    "stats-ancova",
    oracle="""
        WITH obs AS (
            SELECT event_type AS g,
                   CAST(extract(hour FROM ts) AS DOUBLE) AS x,
                   value AS y
            FROM events
        ),
        per_g AS (
            SELECT g, CAST(count(*) AS DOUBLE) AS n_g,
                   avg(x) AS xbar_g, avg(y) AS ybar_g,
                   (count(*) - 1) * var_samp(x) AS sxx_g,
                   (count(*) - 1) * covar_samp(x, y) AS sxy_g,
                   (count(*) - 1) * var_samp(y) AS syy_g
            FROM obs GROUP BY g
        ),
        pooled AS (
            SELECT sum(n_g) AS n, CAST(count(*) AS DOUBLE) AS k,
                   sum(sxx_g) AS sxx_w, sum(sxy_g) AS sxy_w,
                   sum(syy_g) AS syy_w,
                   sum(n_g * xbar_g) / sum(n_g) AS xbar
            FROM per_g
        ),
        total AS (
            SELECT (count(*) - 1) * var_samp(x) AS sxx_t,
                   (count(*) - 1) * covar_samp(x, y) AS sxy_t,
                   (count(*) - 1) * var_samp(y) AS syy_t
            FROM obs
        ),
        fit AS (
            SELECT p.n, p.k, p.xbar,
                   p.sxy_w / p.sxx_w AS b_w,
                   p.syy_w - p.sxy_w * p.sxy_w / p.sxx_w AS sse_full,
                   t.syy_t - t.sxy_t * t.sxy_t / t.sxx_t AS sse_reduced
            FROM pooled p CROSS JOIN total t
        )
        SELECT g.g AS grp, CAST(g.n_g AS BIGINT) AS n,
               round(g.ybar_g, 6) AS raw_mean,
               round(g.ybar_g - f.b_w * (g.xbar_g - f.xbar), 6)
                   AS adjusted_mean,
               round(f.b_w, 6) AS common_slope,
               round(((f.sse_reduced - f.sse_full) / (f.k - 1))
                     / (f.sse_full / (f.n - f.k - 1)), 4) AS f_group
        FROM per_g g CROSS JOIN fit f
    """,
    doc="One-way ANCOVA — group effect on event value ADJUSTED for the "
    "hour-of-day covariate: pooled within-group slope b_w = "
    "Sxy_w/Sxx_w, covariate-adjusted group means "
    "ybar_g - b_w(xbar_g - xbar), and the group F comparing the "
    "common-slope model's SSE against the no-groups reduced model — "
    "the analysis stats-anova-oneway gets WRONG whenever groups "
    "differ in covariate mix (confounded margins). All from per-group "
    "var/covar sums: one bounded groupBy plus one global moment "
    "aggregate, scalar algebra after — no residual materialization, "
    "no second pass over the fact table.",
    tags=("stats",),
)
def stats_ancova(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    obs = ev.select(
        F.col("event_type").alias("g"),
        F.hour("ts").cast("double").alias("x"),
        F.col("value").alias("y"),
    )
    per_g = obs.groupBy("g").agg(
        F.count("*").cast("double").alias("n_g"),
        F.avg("x").alias("xbar_g"),
        F.avg("y").alias("ybar_g"),
        ((F.count("*") - 1) * F.var_samp("x")).alias("sxx_g"),
        ((F.count("*") - 1) * F.covar_samp("x", "y")).alias("sxy_g"),
        ((F.count("*") - 1) * F.var_samp("y")).alias("syy_g"),
    )
    pooled = per_g.agg(
        F.sum("n_g").alias("n"),
        F.count("*").cast("double").alias("k"),
        F.sum("sxx_g").alias("sxx_w"),
        F.sum("sxy_g").alias("sxy_w"),
        F.sum("syy_g").alias("syy_w"),
        (F.sum(F.col("n_g") * F.col("xbar_g")) / F.sum("n_g")).alias(
            "xbar"
        ),
    )
    total = obs.agg(
        ((F.count("*") - 1) * F.var_samp("x")).alias("sxx_t"),
        ((F.count("*") - 1) * F.covar_samp("x", "y")).alias("sxy_t"),
        ((F.count("*") - 1) * F.var_samp("y")).alias("syy_t"),
    )
    fit = (
        pooled.crossJoin(F.broadcast(total))
        .select(
            "n",
            "k",
            "xbar",
            (F.col("sxy_w") / F.col("sxx_w")).alias("b_w"),
            (
                F.col("syy_w")
                - F.col("sxy_w") * F.col("sxy_w") / F.col("sxx_w")
            ).alias("sse_full"),
            (
                F.col("syy_t")
                - F.col("sxy_t") * F.col("sxy_t") / F.col("sxx_t")
            ).alias("sse_reduced"),
        )
    )
    f_group = (
        (F.col("sse_reduced") - F.col("sse_full")) / (F.col("k") - 1)
    ) / (F.col("sse_full") / (F.col("n") - F.col("k") - 1))
    return per_g.crossJoin(F.broadcast(fit)).select(
        F.col("g").alias("grp"),
        F.col("n_g").cast("long").alias("n"),
        F.round("ybar_g", 6).alias("raw_mean"),
        F.round(
            F.col("ybar_g") - F.col("b_w") * (F.col("xbar_g") - F.col("xbar")),
            6,
        ).alias("adjusted_mean"),
        F.round("b_w", 6).alias("common_slope"),
        F.round(f_group, 4).alias("f_group"),
    )


@query(
    "stats-tukey-hsd",
    oracle="""
        WITH grp AS (
            SELECT event_type AS g, CAST(count(*) AS DOUBLE) AS n_g,
                   avg(value) AS m_g,
                   (count(*) - 1) * var_samp(value) AS ss_g
            FROM events GROUP BY event_type
        ),
        mse AS (
            SELECT sum(ss_g) / (sum(n_g) - count(*)) AS mse,
                   sum(n_g) - count(*) AS df_err
            FROM grp
        )
        SELECT a.g AS group_a, b.g AS group_b,
               round(a.m_g - b.m_g, 6) AS mean_diff,
               round(sqrt(m.mse / 2 * (1 / a.n_g + 1 / b.n_g)), 6) AS se,
               round(abs(a.m_g - b.m_g)
                     / sqrt(m.mse / 2 * (1 / a.n_g + 1 / b.n_g)), 4)
                   AS q_stat,
               CAST(m.df_err AS BIGINT) AS df_err
        FROM grp a JOIN grp b ON a.g < b.g CROSS JOIN mse m
    """,
    doc="Tukey-Kramer HSD post-hoc pairwise comparisons after one-way "
    "ANOVA (the follow-up stats-anova-oneway stops short of): for "
    "every group pair the studentized-range statistic q = |m_i - m_j| "
    "/ sqrt(MSE/2 (1/n_i + 1/n_j)) with the pooled within-group MSE "
    "— Kramer's harmonic correction handles the unbalanced cells. "
    "Compare q against q_crit(k, df) offline; emitting the statistic "
    "keeps the op table-free and engine-pure like stats-welch-ttest. "
    "The pair join is over the 5-row GROUP SUMMARY (k(k-1)/2 rows), "
    "never the fact table — post-hoc analysis costs one groupBy at "
    "any scale.",
    tags=("stats",),
)
def stats_tukey_hsd(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    grp = ev.groupBy(F.col("event_type").alias("g")).agg(
        F.count("*").cast("double").alias("n_g"),
        F.avg("value").alias("m_g"),
        ((F.count("*") - 1) * F.var_samp("value")).alias("ss_g"),
    )
    mse = grp.agg(
        (F.sum("ss_g") / (F.sum("n_g") - F.count("*"))).alias("mse"),
        (F.sum("n_g") - F.count("*")).alias("df_err"),
    )
    a = grp.select(
        F.col("g").alias("group_a"),
        F.col("n_g").alias("n_a"),
        F.col("m_g").alias("m_a"),
    )
    b = grp.select(
        F.col("g").alias("group_b"),
        F.col("n_g").alias("n_b"),
        F.col("m_g").alias("m_b"),
    )
    se = F.sqrt(
        F.col("mse") / 2 * (1 / F.col("n_a") + 1 / F.col("n_b"))
    )
    return (
        a.join(F.broadcast(b), F.col("group_a") < F.col("group_b"))
        .crossJoin(F.broadcast(mse))
        .select(
            "group_a",
            "group_b",
            F.round(F.col("m_a") - F.col("m_b"), 6).alias("mean_diff"),
            F.round(se, 6).alias("se"),
            F.round(F.abs(F.col("m_a") - F.col("m_b")) / se, 4).alias(
                "q_stat"
            ),
            F.col("df_err").cast("long").alias("df_err"),
        )
    )


@query(
    "timeseries-time-decay-avg",
    oracle="""
        WITH w AS (
            SELECT user_id, value,
                   power(0.5,
                         CAST(date_diff('second', ts,
                              max(ts) OVER (PARTITION BY user_id))
                              AS DOUBLE) / (7 * 86400.0)) AS wt
            FROM events
        ),
        pu AS (
            SELECT user_id, sum(wt * value) / sum(wt) AS decayed_avg
            FROM w GROUP BY user_id
        )
        SELECT CAST(floor(decayed_avg / 10) AS BIGINT) AS bin,
               CAST(count(*) AS BIGINT) AS n_users,
               round(avg(decayed_avg), 6) AS mean_decayed
        FROM pu GROUP BY 1
    """,
    doc="Irregular-spacing time-decayed average (half-life 7 days, "
    "anchored at each user's LAST event): weight = 0.5^(dt/halflife) "
    "— the time-aware recency metric row-based EWMA "
    "(timeseries-ewma, window-ewma) gets wrong whenever events "
    "arrive unevenly, because a row-decay treats a 1-minute gap and "
    "a 1-month gap identically. The closed weighted-sum form needs "
    "no recursion: one per-user max-ts window (PARTITIONED — "
    "per-key, parallel across users) and one groupBy ratio; "
    "histogram of the per-user result keeps output bounded. This is "
    "the standard freshness feature in feature stores at any scale.",
    tags=("timeseries", "ml"),
)
def timeseries_time_decay_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    max_ts = F.max("ts").over(Window.partitionBy("user_id"))
    wt = F.pow(
        0.5,
        (F.unix_timestamp(max_ts) - F.unix_timestamp("ts")).cast("double")
        / (7 * 86400.0),
    )
    w = ev.select("user_id", "value", wt.alias("wt"))
    pu = w.groupBy("user_id").agg(
        (F.sum(F.col("wt") * F.col("value")) / F.sum("wt")).alias(
            "decayed_avg"
        )
    )
    return pu.groupBy(
        F.floor(F.col("decayed_avg") / 10).cast("long").alias("bin")
    ).agg(
        F.count("*").cast("long").alias("n_users"),
        F.round(F.avg("decayed_avg"), 6).alias("mean_decayed"),
    )


_LC_SALT = ":lc-salt-r5"


@query(
    "ml-learning-curve",
    oracle=f"""
        WITH ev_np AS (
            SELECT user_id, avg(value) AS mv FROM events
            WHERE event_type <> 'purchase' GROUP BY user_id
        ),
        lab AS (
            SELECT user_id,
                   CASE WHEN sum(CASE WHEN event_type = 'purchase'
                                      THEN 1 ELSE 0 END) >= 13
                        THEN 1 ELSE 0 END AS label
            FROM events GROUP BY user_id
        ),
        base AS (
            SELECT v.user_id,
                   CASE WHEN v.mv < 48 THEN 'lo'
                        WHEN v.mv < 52 THEN 'mid' ELSE 'hi' END AS f_val,
                   l.label,
                   ({sql_string_hash("CAST(v.user_id AS VARCHAR) || '" + _LC_SALT + "'")}) % 100
                       AS h
            FROM ev_np v JOIN lab l USING (user_id)
        ),
        fr AS (SELECT unnest([16, 32, 48, 64, 80]) AS frac),
        model AS (
            SELECT fr.frac, b.f_val,
                   CAST(count(*) AS BIGINT) AS n_cell,
                   CASE WHEN sum(b.label) * 2 > count(*) THEN 1 ELSE 0 END
                       AS pred
            FROM base b JOIN fr ON b.h < fr.frac
            GROUP BY fr.frac, b.f_val
        ),
        nt AS (
            SELECT fr.frac, CAST(count(*) AS BIGINT) AS n_train
            FROM base b JOIN fr ON b.h < fr.frac GROUP BY fr.frac
        ),
        te AS (SELECT * FROM base WHERE h >= 80)
        SELECT m.frac AS train_pct_of_pool, nt.n_train,
               CAST(count(*) AS BIGINT) AS n_test,
               round(avg(CASE WHEN m.pred = t.label THEN 1.0 ELSE 0.0 END), 6)
                   AS accuracy
        FROM te t
        JOIN model m ON m.f_val = t.f_val
        JOIN nt ON nt.frac = m.frac
        GROUP BY m.frac, nt.n_train
    """,
    doc="Data-scaling learning curve — the per-cell majority-vote "
    "classifier (predict heavy-purchaser from the mean-value bin) "
    "retrained at 5 nested training-set sizes (16/32/48/64/80 hash "
    "percentiles of users — nested so each larger set CONTAINS the "
    "smaller, the property that makes the curve monotone-comparable) "
    "and evaluated on the fixed >=80 holdout. The multi-size sweep "
    "costs ONE pass: rows join the tiny fraction list on h < frac "
    "(each row lands in every model it belongs to) and the 5 models "
    "are one grouped aggregate — no per-size rescan, which is the "
    "difference between 5x and 1x the fact-table IO when the pool is "
    "100 TB. How accuracy bends with n is the first diagnostic for "
    "'do we need more data or a better model'.",
    tags=("ml", "eval"),
)
def ml_learning_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    ev_np = (
        ev.filter(F.col("event_type") != "purchase")
        .groupBy("user_id")
        .agg(F.avg("value").alias("mv"))
    )
    lab = ev.groupBy("user_id").agg(
        (
            F.sum(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            )
            >= 13
        )
        .cast("int")
        .alias("label")
    )
    h = string_hash(
        F.concat(F.col("user_id").cast("string"), F.lit(_LC_SALT))
    ) % 100
    base = ev_np.join(lab, "user_id").select(
        "user_id",
        F.when(F.col("mv") < 48, "lo")
        .when(F.col("mv") < 52, "mid")
        .otherwise("hi")
        .alias("f_val"),
        "label",
        h.alias("h"),
    )
    fr = spark.createDataFrame(
        [(16,), (32,), (48,), (64,), (80,)], ["frac"]
    )
    joined = base.join(F.broadcast(fr), F.col("h") < F.col("frac"))
    model = joined.groupBy("frac", "f_val").agg(
        F.count("*").cast("long").alias("n_cell"),
        (F.sum("label") * 2 > F.count("*")).cast("int").alias("pred"),
    )
    nt = joined.groupBy("frac").agg(
        F.count("*").cast("long").alias("n_train")
    )
    te = base.filter(F.col("h") >= 80)
    return (
        te.join(
            F.broadcast(model.select("frac", "f_val", "pred")), "f_val"
        )
        .join(F.broadcast(nt), "frac")
        .groupBy(
            F.col("frac").cast("long").alias("train_pct_of_pool"),
            "n_train",
        )
        .agg(
            F.count("*").cast("long").alias("n_test"),
            F.round(
                F.avg(
                    F.when(F.col("pred") == F.col("label"), 1.0).otherwise(
                        0.0
                    )
                ),
                6,
            ).alias("accuracy"),
        )
    )


@query(
    "stats-icc",
    oracle="""
        WITH grp AS (
            SELECT user_id, CAST(count(*) AS DOUBLE) AS n_g,
                   avg(value) AS m_g,
                   (count(*) - 1) * var_samp(value) AS ssw_g
            FROM events GROUP BY user_id
        ),
        g AS (
            SELECT sum(n_g) AS n, CAST(count(*) AS DOUBLE) AS grps,
                   sum(n_g * m_g) / sum(n_g) AS gm,
                   sum(ssw_g) AS ssw, sum(n_g * n_g) AS sum_n2
            FROM grp
        ),
        ms AS (
            SELECT g.n, g.grps,
                   sum(grp.n_g * (grp.m_g - g.gm) * (grp.m_g - g.gm))
                       / (g.grps - 1) AS msb,
                   g.ssw / (g.n - g.grps) AS msw,
                   (g.n - g.sum_n2 / g.n) / (g.grps - 1) AS k0
            FROM grp CROSS JOIN g
            GROUP BY g.n, g.grps, g.ssw, g.sum_n2
        )
        SELECT CAST(n AS BIGINT) AS n_obs, CAST(grps AS BIGINT) AS n_groups,
               round(msb, 6) AS ms_between,
               round(msw, 6) AS ms_within,
               round(k0, 6) AS k0,
               round((msb - msw) / (msb + (k0 - 1) * msw), 6) AS icc1
        FROM ms
    """,
    doc="Intraclass correlation ICC(1,1) — one-way random-effects "
    "reliability of event value within user: (MSB - MSW)/(MSB + "
    "(k0-1) MSW) with Searle's average-group-size correction "
    "k0 = (N - sum(n_g^2)/N)/(G-1) for unbalanced groups. The "
    "clustered-data diagnostic that decides whether per-user "
    "aggregation (and design-effect inflation ~1+(k0-1)ICC of every "
    "naive CI the repo's A/B ops compute) matters; complements "
    "stats-cronbach-alpha (item consistency) and stats-eb-shrinkage "
    "(which needs exactly this variance partition). Two bounded "
    "aggregates over the per-user summary — the fact table is read "
    "once.",
    tags=("stats",),
)
def stats_icc(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    grp = ev.groupBy("user_id").agg(
        F.count("*").cast("double").alias("n_g"),
        F.avg("value").alias("m_g"),
        ((F.count("*") - 1) * F.var_samp("value")).alias("ssw_g"),
    )
    g = grp.agg(
        F.sum("n_g").alias("n"),
        F.count("*").cast("double").alias("grps"),
        (F.sum(F.col("n_g") * F.col("m_g")) / F.sum("n_g")).alias("gm"),
        F.sum("ssw_g").alias("ssw"),
        F.sum(F.col("n_g") * F.col("n_g")).alias("sum_n2"),
    )
    ms = (
        grp.crossJoin(F.broadcast(g))
        .groupBy("n", "grps", "ssw", "sum_n2")
        .agg(
            (
                F.sum(
                    F.col("n_g")
                    * (F.col("m_g") - F.col("gm"))
                    * (F.col("m_g") - F.col("gm"))
                )
                / (F.max("grps") - 1)
            ).alias("msb"),
            (F.max("ssw") / (F.max("n") - F.max("grps"))).alias("msw"),
            (
                (F.max("n") - F.max("sum_n2") / F.max("n"))
                / (F.max("grps") - 1)
            ).alias("k0"),
        )
    )
    return ms.select(
        F.col("n").cast("long").alias("n_obs"),
        F.col("grps").cast("long").alias("n_groups"),
        F.round("msb", 6).alias("ms_between"),
        F.round("msw", 6).alias("ms_within"),
        F.round("k0", 6).alias("k0"),
        F.round(
            (F.col("msb") - F.col("msw"))
            / (F.col("msb") + (F.col("k0") - 1) * F.col("msw")),
            6,
        ).alias("icc1"),
    )


@query(
    "stats-bland-altman",
    oracle="""
        WITH paired AS (
            SELECT l.l_extendedprice / l.l_quantity AS m1,
                   p.p_retailprice AS m2
            FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        ),
        d AS (
            SELECT m1 - m2 AS diff FROM paired
        ),
        s AS (
            SELECT CAST(count(*) AS BIGINT) AS n,
                   avg(diff) AS bias, stddev_samp(diff) AS sd
            FROM d
        )
        SELECT s.n, round(s.bias, 6) AS bias,
               round(s.sd, 6) AS sd_diff,
               round(s.bias - 1.959964 * s.sd, 6) AS loa_lo,
               round(s.bias + 1.959964 * s.sd, 6) AS loa_hi,
               round(avg(CASE WHEN abs(d.diff - s.bias) > 1.959964 * s.sd
                              THEN 1.0 ELSE 0.0 END), 6) AS frac_outside
        FROM d CROSS JOIN s
        GROUP BY s.n, s.bias, s.sd
    """,
    doc="Bland-Altman agreement analysis between two measures of the "
    "same quantity — realized unit price (extendedprice/quantity) vs "
    "catalog retail price: bias (mean difference), SD of differences, "
    "95%% limits of agreement bias +/- 1.96 SD, and the observed "
    "fraction outside them (~5%% if differences are normal) — the "
    "method-comparison analysis a correlation coefficient famously "
    "CANNOT do (two methods can correlate at 0.99 and still disagree "
    "by a constant 20%%). Fact-to-dim join left to AQE (broadcast at "
    "small SF, shuffle-hash beyond), one moment pass, one re-scan of "
    "the 1-column diff relation against the broadcast scalars.",
    tags=("stats",),
)
def stats_bland_altman(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    pt = load_table(spark, sf_dir, "part")
    d = (
        li.join(pt, li["l_partkey"] == pt["p_partkey"])
        .select(
            (
                F.col("l_extendedprice") / F.col("l_quantity")
                - F.col("p_retailprice")
            ).alias("diff")
        )
    )
    s = d.agg(
        F.count("*").cast("long").alias("n"),
        F.avg("diff").alias("bias"),
        F.stddev_samp("diff").alias("sd"),
    )
    return (
        d.crossJoin(F.broadcast(s))
        .groupBy("n", "bias", "sd")
        .agg(
            F.round(
                F.avg(
                    F.when(
                        F.abs(F.col("diff") - F.col("bias"))
                        > 1.959964 * F.col("sd"),
                        1.0,
                    ).otherwise(0.0)
                ),
                6,
            ).alias("frac_outside")
        )
        .select(
            "n",
            F.round("bias", 6).alias("bias"),
            F.round("sd", 6).alias("sd_diff"),
            F.round(F.col("bias") - 1.959964 * F.col("sd"), 6).alias(
                "loa_lo"
            ),
            F.round(F.col("bias") + 1.959964 * F.col("sd"), 6).alias(
                "loa_hi"
            ),
            "frac_outside",
        )
    )


@query(
    "timeseries-cochrane-orcutt",
    oracle="""
        WITH daily AS (
            SELECT CAST(ts AS DATE) AS d, CAST(count(*) AS DOUBLE) AS y
            FROM events GROUP BY 1
        ),
        pts AS (
            SELECT CAST(date_diff('day', (SELECT min(d) FROM daily), d)
                        AS DOUBLE) AS t, y
            FROM daily
        ),
        ols AS (
            SELECT regr_slope(y, t) AS b, regr_intercept(y, t) AS a,
                   CAST(count(*) AS BIGINT) AS n
            FROM pts
        ),
        res AS (
            SELECT t, y, y - (o.a + o.b * t) AS e,
                   lag(y - (o.a + o.b * t)) OVER (ORDER BY t) AS e1,
                   lag(y) OVER (ORDER BY t) AS y1,
                   lag(t) OVER (ORDER BY t) AS t1
            FROM pts CROSS JOIN ols o
        ),
        rho_c AS (
            SELECT sum(e * e1) / sum(e1 * e1) AS rho
            FROM res WHERE e1 IS NOT NULL
        ),
        star AS (
            SELECT y - r.rho * y1 AS ys, t - r.rho * t1 AS ts_
            FROM res CROSS JOIN rho_c r WHERE y1 IS NOT NULL
        ),
        fit2 AS (
            SELECT regr_slope(ys, ts_) AS b2, regr_intercept(ys, ts_) AS a2
            FROM star
        )
        SELECT o.n AS n_days,
               round(r.rho, 6) AS rho,
               round(o.b, 6) AS slope_ols,
               round(f.b2, 6) AS slope_co,
               round(f.a2 / (1 - r.rho), 6) AS intercept_co
        FROM ols o CROSS JOIN rho_c r CROSS JOIN fit2 f
    """,
    doc="Cochrane-Orcutt AR(1)-corrected trend regression on the daily "
    "event-volume series: OLS residuals give rho = sum(e_t e_{t-1}) / "
    "sum(e_{t-1}^2), quasi-difference y* = y_t - rho*y_{t-1} (and x*) "
    "removes the serial correlation, and the re-fit slope is the one "
    "whose standard errors you may actually trust — naive OLS on an "
    "autocorrelated series (what timeseries-mom-growth-style trend "
    "reads imply, and what stats-durbin-watson DETECTS) understates "
    "SEs by ~sqrt((1+rho)/(1-rho)). Intercept rescaled by 1/(1-rho) "
    "back to original units. Everything after the daily rollup runs "
    "on the calendar-bounded summary: two regr_* fits, one lag "
    "window, three scalar broadcasts.",
    tags=("timeseries", "stats"),
)
def timeseries_cochrane_orcutt(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("d")).agg(
        F.count("*").cast("double").alias("y")
    )
    d0 = daily.agg(F.min("d").alias("d0"))
    pts = daily.crossJoin(F.broadcast(d0)).select(
        F.datediff("d", "d0").cast("double").alias("t"), "y"
    )
    ols = pts.agg(
        F.regr_slope("y", "t").alias("b"),
        F.regr_intercept("y", "t").alias("a"),
        F.count("*").cast("long").alias("n"),
    )
    w = Window.orderBy("t")
    e = F.col("y") - (F.col("a") + F.col("b") * F.col("t"))
    res = pts.crossJoin(F.broadcast(ols)).select(
        "t",
        "y",
        e.alias("e"),
        F.lag(e).over(w).alias("e1"),
        F.lag("y").over(w).alias("y1"),
        F.lag("t").over(w).alias("t1"),
    )
    rho_c = res.filter(F.col("e1").isNotNull()).agg(
        (
            F.sum(F.col("e") * F.col("e1"))
            / F.sum(F.col("e1") * F.col("e1"))
        ).alias("rho")
    )
    star = (
        res.crossJoin(F.broadcast(rho_c))
        .filter(F.col("y1").isNotNull())
        .select(
            (F.col("y") - F.col("rho") * F.col("y1")).alias("ys"),
            (F.col("t") - F.col("rho") * F.col("t1")).alias("ts_"),
        )
    )
    fit2 = star.agg(
        F.regr_slope("ys", "ts_").alias("b2"),
        F.regr_intercept("ys", "ts_").alias("a2"),
    )
    return (
        ols.crossJoin(F.broadcast(rho_c))
        .crossJoin(F.broadcast(fit2))
        .select(
            F.col("n").alias("n_days"),
            F.round("rho", 6).alias("rho"),
            F.round("b", 6).alias("slope_ols"),
            F.round("b2", 6).alias("slope_co"),
            F.round(F.col("a2") / (1 - F.col("rho")), 6).alias(
                "intercept_co"
            ),
        )
    )


@query(
    "stats-cohen-kappa-weighted",
    oracle="""
        WITH rated AS (
            SELECT CASE WHEN n_chars < 220 THEN 0
                        WHEN n_chars < 380 THEN 1 ELSE 2 END AS ra,
                   CASE WHEN length(text) - length(replace(text, ' ', ''))
                             < 40 THEN 0
                        WHEN length(text) - length(replace(text, ' ', ''))
                             < 70 THEN 1 ELSE 2 END AS rb
            FROM documents
        ),
        o AS (
            SELECT ra, rb, CAST(count(*) AS DOUBLE) AS n_ij
            FROM rated GROUP BY ra, rb
        ),
        m AS (
            SELECT ra, rb, n_ij,
                   sum(n_ij) OVER (PARTITION BY ra) AS row_n,
                   sum(n_ij) OVER (PARTITION BY rb) AS col_n,
                   sum(n_ij) OVER () AS n
            FROM o
        )
        SELECT CAST(max(n) AS BIGINT) AS n_docs,
               round(1 - sum((ra - rb) * (ra - rb) / 4.0 * n_ij / n)
                         / sum((ra - rb) * (ra - rb) / 4.0
                               * (row_n / n) * (col_n / n)), 6)
                   AS kappa_w,
               round(sum(CASE WHEN ra = rb THEN n_ij ELSE 0 END) / max(n), 6)
                   AS raw_agreement
        FROM m
    """,
    doc="Quadratic-weighted Cohen's kappa between two ordinal raters of "
    "document size — the n_chars tercile vs the whitespace-count "
    "tercile: kappa_w = 1 - sum(v_ij O_ij)/sum(v_ij E_ij) with "
    "v_ij = (i-j)^2/(k-1)^2, so near-misses on the ordinal scale "
    "cost less than 2-step disagreements (nominal kappa and "
    "eval-fleiss-kappa treat them identically — wrong for ordered "
    "labels like quality grades, the typical LLM-annotation case). "
    "Chance agreement from the margins of the same 3x3 contingency "
    "grid; everything beyond the one groupBy runs on <=9 rows.",
    tags=("stats", "eval"),
)
def stats_cohen_kappa_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    spaces = F.length("text") - F.length(F.replace(F.col("text"), F.lit(" "), F.lit("")))
    rated = d.select(
        F.when(F.col("n_chars") < 220, 0)
        .when(F.col("n_chars") < 380, 1)
        .otherwise(2)
        .alias("ra"),
        F.when(spaces < 40, 0).when(spaces < 70, 1).otherwise(2).alias("rb"),
    )
    o = rated.groupBy("ra", "rb").agg(
        F.count("*").cast("double").alias("n_ij")
    )
    m = o.select(
        "ra",
        "rb",
        "n_ij",
        F.sum("n_ij").over(Window.partitionBy("ra")).alias("row_n"),
        F.sum("n_ij").over(Window.partitionBy("rb")).alias("col_n"),
        F.sum("n_ij").over(Window.partitionBy()).alias("n"),
    )
    v = (F.col("ra") - F.col("rb")) * (F.col("ra") - F.col("rb")) / 4.0
    return m.agg(
        F.max("n").cast("long").alias("n_docs"),
        F.round(
            1
            - F.sum(v * F.col("n_ij") / F.col("n"))
            / F.sum(
                v * (F.col("row_n") / F.col("n")) * (F.col("col_n") / F.col("n"))
            ),
            6,
        ).alias("kappa_w"),
        F.round(
            F.sum(
                F.when(F.col("ra") == F.col("rb"), F.col("n_ij")).otherwise(
                    0.0
                )
            )
            / F.max("n"),
            6,
        ).alias("raw_agreement"),
    )


@query(
    "stats-chow-test",
    oracle="""
        WITH daily AS (
            SELECT CAST(ts AS DATE) AS d, CAST(count(*) AS DOUBLE) AS y
            FROM events GROUP BY 1
        ),
        bounds AS (
            SELECT min(d) AS d0,
                   CAST(date_diff('day', min(d), max(d)) / 2 AS BIGINT) AS t0
            FROM daily
        ),
        pts AS (
            SELECT CAST(date_diff('day', b.d0, d) AS DOUBLE) AS t, y,
                   CASE WHEN date_diff('day', b.d0, d) >= b.t0
                        THEN 1 ELSE 0 END AS post
            FROM daily CROSS JOIN bounds b
        ),
        seg AS (
            SELECT post, CAST(count(*) AS DOUBLE) AS n,
                   (count(*) - 1) * (var_samp(y)
                       - covar_samp(t, y) * covar_samp(t, y) / var_samp(t))
                       AS sse
            FROM pts GROUP BY post
        ),
        pooled AS (
            SELECT CAST(count(*) AS DOUBLE) AS n,
                   (count(*) - 1) * (var_samp(y)
                       - covar_samp(t, y) * covar_samp(t, y) / var_samp(t))
                       AS sse
            FROM pts
        )
        SELECT CAST(p.n AS BIGINT) AS n_days,
               CAST(max(CASE WHEN s.post = 0 THEN s.n END) AS BIGINT)
                   AS n_pre,
               CAST(max(CASE WHEN s.post = 1 THEN s.n END) AS BIGINT)
                   AS n_post,
               round(p.sse, 6) AS sse_pooled,
               round(sum(s.sse), 6) AS sse_split,
               round(((p.sse - sum(s.sse)) / 2)
                     / (sum(s.sse) / (p.n - 4)), 4) AS chow_f
        FROM seg s CROSS JOIN pooled p
        GROUP BY p.n, p.sse
    """,
    doc="Chow test for a structural break at the mid-span breakpoint of "
    "the daily event-volume trend: F = ((SSE_pooled - SSE1 - SSE2)/k) "
    "/ ((SSE1+SSE2)/(n-2k)) with k=2 (intercept+slope) — the "
    "hypothesis TEST that timeseries-intervention-its's effect "
    "estimates need behind them (ITS says HOW MUCH the line moved; "
    "Chow says whether a single line would have done). Each segment "
    "SSE comes in closed form from var/covar aggregates "
    "((n-1)(Syy - Sxy^2/Sxx)), so the whole test is one groupBy over "
    "the calendar-bounded daily table plus one global aggregate — "
    "no residual columns materialized, no second fact-table pass.",
    tags=("stats", "timeseries"),
)
def stats_chow_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("d")).agg(
        F.count("*").cast("double").alias("y")
    )
    bounds = daily.agg(
        F.min("d").alias("d0"),
        (F.datediff(F.max("d"), F.min("d")) / 2).cast("long").alias("t0"),
    )
    pts = daily.crossJoin(F.broadcast(bounds)).select(
        F.datediff("d", "d0").cast("double").alias("t"),
        "y",
        (F.datediff("d", "d0") >= F.col("t0")).cast("int").alias("post"),
    )

    def sse_expr():
        return (F.count("*") - 1) * (
            F.var_samp("y")
            - F.covar_samp("t", "y")
            * F.covar_samp("t", "y")
            / F.var_samp("t")
        )

    seg = pts.groupBy("post").agg(
        F.count("*").cast("double").alias("n"), sse_expr().alias("sse")
    )
    pooled = pts.agg(
        F.count("*").cast("double").alias("np"), sse_expr().alias("ssep")
    )
    return (
        seg.crossJoin(F.broadcast(pooled))
        .groupBy("np", "ssep")
        .agg(
            F.max(F.when(F.col("post") == 0, F.col("n")))
            .cast("long")
            .alias("n_pre"),
            F.max(F.when(F.col("post") == 1, F.col("n")))
            .cast("long")
            .alias("n_post"),
            F.round(F.sum("sse"), 6).alias("sse_split"),
            F.round(
                ((F.max("ssep") - F.sum("sse")) / 2)
                / (F.sum("sse") / (F.max("np") - 4)),
                4,
            ).alias("chow_f"),
        )
        .select(
            F.col("np").cast("long").alias("n_days"),
            "n_pre",
            "n_post",
            F.round("ssep", 6).alias("sse_pooled"),
            "sse_split",
            "chow_f",
        )
    )


@query(
    "stats-deming-regression",
    oracle="""
        WITH paired AS (
            SELECT p.p_retailprice AS x,
                   l.l_extendedprice / l.l_quantity AS y
            FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        ),
        m AS (
            SELECT CAST(count(*) AS BIGINT) AS n,
                   avg(x) AS mx, avg(y) AS my,
                   var_samp(x) AS sxx, var_samp(y) AS syy,
                   covar_samp(x, y) AS sxy
            FROM paired
        )
        SELECT n,
               round((syy - sxx + sqrt((syy - sxx) * (syy - sxx)
                                       + 4 * sxy * sxy)) / (2 * sxy), 6)
                   AS slope,
               round(my - (syy - sxx + sqrt((syy - sxx) * (syy - sxx)
                                            + 4 * sxy * sxy))
                          / (2 * sxy) * mx, 6) AS intercept,
               round(sxy / sqrt(sxx * syy), 6) AS pearson_r
        FROM m
    """,
    doc="Deming regression (errors-in-both-variables, lambda=1) between "
    "catalog retail price and realized unit price: slope = (Syy - Sxx "
    "+ sqrt((Syy-Sxx)^2 + 4 Sxy^2)) / (2 Sxy) — the method-comparison "
    "fit where ORDINARY least squares is biased toward zero "
    "(regression dilution) because the x measure is noisy too; the "
    "natural companion to stats-bland-altman on the same pairing "
    "(BA quantifies disagreement, Deming models it). Closed form "
    "from one 5-moment aggregate over the joined fact — the second "
    "cheapest regression in the repo after OLS, and symmetric: "
    "swapping x and y inverts the slope exactly.",
    tags=("stats",),
)
def stats_deming_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    pt = load_table(spark, sf_dir, "part")
    paired = li.join(pt, li["l_partkey"] == pt["p_partkey"]).select(
        F.col("p_retailprice").alias("x"),
        (F.col("l_extendedprice") / F.col("l_quantity")).alias("y"),
    )
    m = paired.agg(
        F.count("*").cast("long").alias("n"),
        F.avg("x").alias("mx"),
        F.avg("y").alias("my"),
        F.var_samp("x").alias("sxx"),
        F.var_samp("y").alias("syy"),
        F.covar_samp("x", "y").alias("sxy"),
    )
    sxx, syy, sxy = F.col("sxx"), F.col("syy"), F.col("sxy")
    slope = (
        syy - sxx + F.sqrt((syy - sxx) * (syy - sxx) + 4 * sxy * sxy)
    ) / (2 * sxy)
    return m.select(
        "n",
        F.round(slope, 6).alias("slope"),
        F.round(F.col("my") - slope * F.col("mx"), 6).alias("intercept"),
        F.round(sxy / F.sqrt(sxx * syy), 6).alias("pearson_r"),
    )


@query(
    "ml-cost-threshold",
    oracle="""
        WITH scored AS (
            SELECT round(value, 1) AS s,
                   CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
            FROM events
        ),
        bins AS (
            SELECT s, CAST(sum(y) AS DOUBLE) AS pos,
                   CAST(sum(1 - y) AS DOUBLE) AS neg
            FROM scored GROUP BY s
        ),
        cum AS (
            SELECT s,
                   sum(pos) OVER ()
                       - coalesce(sum(pos) OVER (ORDER BY s
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND 1 PRECEDING), 0) AS tp,
                   sum(neg) OVER ()
                       - coalesce(sum(neg) OVER (ORDER BY s
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND 1 PRECEDING), 0) AS fp,
                   coalesce(sum(pos) OVER (ORDER BY s
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                       AS fn,
                   sum(pos) OVER () AS np, sum(neg) OVER () AS nn
            FROM bins
        ),
        costs AS (
            SELECT c.fn_cost, u.s,
                   (u.fp * 1.0 + u.fn * c.fn_cost) / (u.np + u.nn)
                       AS exp_cost
            FROM cum u
            CROSS JOIN (SELECT unnest([1, 5, 10]) AS fn_cost) c
        ),
        best AS (
            SELECT fn_cost, s, exp_cost,
                   row_number() OVER (PARTITION BY fn_cost
                                      ORDER BY exp_cost, s) AS rn
            FROM costs
        )
        SELECT CAST(fn_cost AS BIGINT) AS fn_cost,
               round(s, 1) AS best_threshold,
               round(exp_cost, 6) AS expected_cost
        FROM best WHERE rn = 1
    """,
    doc="Cost-sensitive decision threshold: for asymmetric "
    "false-negative costs (1x, 5x, 10x a false positive) sweep every "
    "candidate threshold of the rounded score and pick the one "
    "minimizing expected cost (FP + c*FN)/N — predict-positive means "
    "score >= threshold. stats-youden-threshold maximizes J, which "
    "implicitly prices FN and FP equally; real triage (fraud review, "
    "PII escalation, unsafe-content filtering) never does. The sweep "
    "runs entirely on the bounded distinct-score summary (cumulative "
    "windows <= ~1000 rows), the 3-cost grid is a literal unnest, "
    "and per-cost argmin is a 3-partition window — fact table "
    "touched once.",
    tags=("ml", "eval"),
)
def ml_cost_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    scored = ev.select(
        F.round("value", 1).alias("s"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("y"),
    )
    bins = scored.groupBy("s").agg(
        F.sum("y").cast("double").alias("pos"),
        F.sum(1 - F.col("y")).cast("double").alias("neg"),
    )
    w_all = Window.partitionBy()
    w_prev = Window.orderBy("s").rowsBetween(Window.unboundedPreceding, -1)
    cum = bins.select(
        "s",
        (
            F.sum("pos").over(w_all)
            - F.coalesce(F.sum("pos").over(w_prev), F.lit(0.0))
        ).alias("tp"),
        (
            F.sum("neg").over(w_all)
            - F.coalesce(F.sum("neg").over(w_prev), F.lit(0.0))
        ).alias("fp"),
        F.coalesce(F.sum("pos").over(w_prev), F.lit(0.0)).alias("fn"),
        F.sum("pos").over(w_all).alias("np"),
        F.sum("neg").over(w_all).alias("nn"),
    )
    costs_dim = spark.createDataFrame([(1,), (5,), (10,)], ["fn_cost"])
    costs = cum.crossJoin(F.broadcast(costs_dim)).select(
        "fn_cost",
        "s",
        (
            (F.col("fp") * 1.0 + F.col("fn") * F.col("fn_cost"))
            / (F.col("np") + F.col("nn"))
        ).alias("exp_cost"),
    )
    w_best = Window.partitionBy("fn_cost").orderBy("exp_cost", "s")
    return (
        costs.withColumn("rn", F.row_number().over(w_best))
        .filter(F.col("rn") == 1)
        .select(
            F.col("fn_cost").cast("long").alias("fn_cost"),
            F.round("s", 1).alias("best_threshold"),
            F.round("exp_cost", 6).alias("expected_cost"),
        )
    )


@query(
    "stats-fieller-ratio-ci",
    oracle="""
        WITH pu AS (
            SELECT user_id,
                   CAST(sum(CASE WHEN event_type = 'purchase'
                                 THEN 1 ELSE 0 END) AS DOUBLE) AS purchases,
                   CAST(sum(CASE WHEN event_type = 'view'
                                 THEN 1 ELSE 0 END) AS DOUBLE) AS views
            FROM events GROUP BY user_id
        ),
        m AS (
            SELECT CAST(count(*) AS DOUBLE) AS n,
                   avg(purchases) AS ma, avg(views) AS mb,
                   var_samp(purchases) / count(*) AS va,
                   var_samp(views) / count(*) AS vb,
                   covar_samp(purchases, views) / count(*) AS vab
            FROM pu
        ),
        f AS (
            SELECT n, ma, mb, va, vb, vab,
                   ma / mb AS r,
                   1.959964 * 1.959964 * vb / (mb * mb) AS g
            FROM m
        )
        SELECT CAST(n AS BIGINT) AS n_users,
               round(r, 6) AS ratio,
               round(g, 6) AS g_fieller,
               round((r - g * vab / vb
                      - 1.959964 / mb
                        * sqrt(va - 2 * r * vab + r * r * vb
                               - g * (va - vab * vab / vb)))
                     / (1 - g), 6) AS ci_lo,
               round((r - g * vab / vb
                      + 1.959964 / mb
                        * sqrt(va - 2 * r * vab + r * r * vb
                               - g * (va - vab * vab / vb)))
                     / (1 - g), 6) AS ci_hi
        FROM f
    """,
    doc="Fieller's theorem CI for a ratio of correlated means — "
    "purchases-per-view across users: the exact-coverage interval "
    "for mean(A)/mean(B) accounting for cov(A,B), with the g-factor "
    "z^2 Var(B)/B^2 that widens (and warns, as g -> 1, that the "
    "denominator is statistically indistinguishable from zero) — "
    "where the naive delta-method CI (stats-delta-method-ci, its "
    "first-order twin) is symmetric and overconfident for noisy "
    "denominators. Ratio metrics ARE the product metrics "
    "(conversion, CTR, revenue-per-session); this is the "
    "inference-grade version. One per-user rollup, one 6-moment "
    "aggregate, scalar algebra.",
    tags=("stats",),
)
def stats_fieller_ratio_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    pu = ev.groupBy("user_id").agg(
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("double")
        .alias("purchases"),
        F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0))
        .cast("double")
        .alias("views"),
    )
    m = pu.agg(
        F.count("*").cast("double").alias("n"),
        F.avg("purchases").alias("ma"),
        F.avg("views").alias("mb"),
        (F.var_samp("purchases") / F.count("*")).alias("va"),
        (F.var_samp("views") / F.count("*")).alias("vb"),
        (F.covar_samp("purchases", "views") / F.count("*")).alias("vab"),
    )
    z = 1.959964
    r = F.col("ma") / F.col("mb")
    g = z * z * F.col("vb") / (F.col("mb") * F.col("mb"))
    rad = F.sqrt(
        F.col("va")
        - 2 * r * F.col("vab")
        + r * r * F.col("vb")
        - g * (F.col("va") - F.col("vab") * F.col("vab") / F.col("vb"))
    )
    adj = r - g * F.col("vab") / F.col("vb")
    return m.select(
        F.col("n").cast("long").alias("n_users"),
        F.round(r, 6).alias("ratio"),
        F.round(g, 6).alias("g_fieller"),
        F.round((adj - z / F.col("mb") * rad) / (1 - g), 6).alias("ci_lo"),
        F.round((adj + z / F.col("mb") * rad) / (1 - g), 6).alias("ci_hi"),
    )


@query(
    "stats-bowker-symmetry",
    oracle="""
        WITH rated AS (
            SELECT CASE WHEN n_chars < 220 THEN 0
                        WHEN n_chars < 380 THEN 1 ELSE 2 END AS ra,
                   CASE WHEN length(text) - length(replace(text, ' ', ''))
                             < 40 THEN 0
                        WHEN length(text) - length(replace(text, ' ', ''))
                             < 70 THEN 1 ELSE 2 END AS rb
            FROM documents
        ),
        o AS (
            SELECT ra, rb, CAST(count(*) AS DOUBLE) AS n_ij
            FROM rated GROUP BY ra, rb
        ),
        pairs AS (
            SELECT least(ra, rb) AS i, greatest(ra, rb) AS j,
                   sum(CASE WHEN ra < rb THEN n_ij ELSE 0 END) AS n_ij,
                   sum(CASE WHEN ra > rb THEN n_ij ELSE 0 END) AS n_ji
            FROM o WHERE ra <> rb GROUP BY 1, 2
        )
        SELECT CAST((SELECT sum(n_ij) FROM o) AS BIGINT) AS n_docs,
               CAST(count(*) AS BIGINT) AS dof,
               round(sum((n_ij - n_ji) * (n_ij - n_ji)
                         / (n_ij + n_ji)), 6) AS bowker_chi2,
               round(sum(n_ij + n_ji) / (SELECT sum(n_ij) FROM o), 6)
                   AS frac_discordant
        FROM pairs
    """,
    doc="Bowker's test of symmetry for a k x k paired-rating table — "
    "the k-category generalization of stats-mcnemar: chi2 = "
    "sum_{i<j} (n_ij - n_ji)^2/(n_ij + n_ji), df = the number of "
    "pairs with any discordance (<= k(k-1)/2 — empty pairs carry no "
    "information and drop from the df, the standard correction), on the "
    "same two ordinal size-raters as stats-cohen-kappa-weighted. "
    "Kappa asks 'do they agree'; Bowker asks the DIRECTIONAL "
    "question — is rater B systematically grading higher — which is "
    "the drift you actually act on when an annotator (or an "
    "LLM-judge version bump) shifts its scale. Everything past one "
    "groupBy runs on a <=9-row grid self-joined on its transpose.",
    tags=("stats", "eval"),
)
def stats_bowker_symmetry(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    spaces = F.length("text") - F.length(
        F.replace(F.col("text"), F.lit(" "), F.lit(""))
    )
    rated = d.select(
        F.when(F.col("n_chars") < 220, 0)
        .when(F.col("n_chars") < 380, 1)
        .otherwise(2)
        .alias("ra"),
        F.when(spaces < 40, 0).when(spaces < 70, 1).otherwise(2).alias("rb"),
    )
    o = rated.groupBy("ra", "rb").agg(
        F.count("*").cast("double").alias("n_ij")
    )
    tot = o.agg(F.sum("n_ij").alias("n_docs"))
    pairs = (
        o.filter(F.col("ra") != F.col("rb"))
        .groupBy(
            F.least("ra", "rb").alias("i"),
            F.greatest("ra", "rb").alias("j"),
        )
        .agg(
            F.sum(
                F.when(F.col("ra") < F.col("rb"), F.col("n_ij")).otherwise(
                    0.0
                )
            ).alias("n_ij"),
            F.sum(
                F.when(F.col("ra") > F.col("rb"), F.col("n_ij")).otherwise(
                    0.0
                )
            ).alias("n_ji"),
        )
    )
    return pairs.crossJoin(F.broadcast(tot)).agg(
        F.max("n_docs").cast("long").alias("n_docs"),
        F.count("*").cast("long").alias("dof"),
        F.round(
            F.sum(
                (F.col("n_ij") - F.col("n_ji"))
                * (F.col("n_ij") - F.col("n_ji"))
                / (F.col("n_ij") + F.col("n_ji"))
            ),
            6,
        ).alias("bowker_chi2"),
        F.round(
            F.sum(F.col("n_ij") + F.col("n_ji")) / F.max("n_docs"), 6
        ).alias("frac_discordant"),
    )


@query(
    "analytics-competing-risks",
    oracle="""
        WITH ends AS (SELECT CAST(max(ts) AS DATE) AS obs_end FROM events),
        pu AS (
            SELECT user_id,
                   min(CASE WHEN event_type = 'view' THEN CAST(ts AS DATE) END)
                       AS fv,
                   min(CASE WHEN event_type = 'purchase'
                            THEN CAST(ts AS DATE) END) AS fp,
                   min(CASE WHEN event_type = 'error'
                            THEN CAST(ts AS DATE) END) AS fe
            FROM events GROUP BY user_id
        ),
        dur AS (
            SELECT CASE
                     WHEN fp IS NOT NULL AND fp >= fv
                          AND (fe IS NULL OR fp <= fe)
                       THEN date_diff('day', fv, fp)
                     WHEN fe IS NOT NULL AND fe >= fv
                       THEN date_diff('day', fv, fe)
                     ELSE date_diff('day', fv, e.obs_end)
                   END AS t,
                   CASE
                     WHEN fp IS NOT NULL AND fp >= fv
                          AND (fe IS NULL OR fp <= fe) THEN 1
                     WHEN fe IS NOT NULL AND fe >= fv THEN 2
                     ELSE 0
                   END AS cause
            FROM pu CROSS JOIN ends e
            WHERE fv IS NOT NULL
        ),
        per_t AS (
            SELECT t,
                   CAST(sum(CASE WHEN cause = 1 THEN 1 ELSE 0 END)
                        AS DOUBLE) AS d1,
                   CAST(sum(CASE WHEN cause = 2 THEN 1 ELSE 0 END)
                        AS DOUBLE) AS d2,
                   CAST(count(*) AS DOUBLE) AS total
            FROM dur GROUP BY t
        ),
        risk AS (
            SELECT t, d1, d2,
                   sum(total) OVER (ORDER BY t DESC
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS n_risk
            FROM per_t
        ),
        surv AS (
            SELECT t, d1, d2, n_risk,
                   exp(coalesce(sum(CASE WHEN d1 + d2 > 0
                           THEN ln(1 - (d1 + d2) / n_risk) ELSE 0 END)
                       OVER (ORDER BY t
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND 1 PRECEDING), 0)) AS s_minus
            FROM risk
        ),
        cif AS (
            SELECT t, d1, d2, n_risk,
                   sum(s_minus * d1 / n_risk) OVER (ORDER BY t
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS cif_purchase,
                   sum(s_minus * d2 / n_risk) OVER (ORDER BY t
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS cif_error
            FROM surv
        )
        SELECT CAST(t AS BIGINT) AS t_days,
               CAST(n_risk AS BIGINT) AS n_risk,
               CAST(d1 AS BIGINT) AS n_purchase,
               CAST(d2 AS BIGINT) AS n_error,
               round(cif_purchase, 6) AS cif_purchase,
               round(cif_error, 6) AS cif_error
        FROM cif WHERE d1 + d2 > 0 ORDER BY t_days
    """,
    doc="Aalen-Johansen cumulative incidence under competing risks — "
    "first purchase vs first error racing from first view: "
    "CIF_k(t) = sum_{u<=t} S(u-) d_ku/n_u where S(u-) is the "
    "ALL-CAUSE Kaplan-Meier just before u. The estimator "
    "stats-kaplan-meier users reach for here (1 - KM per cause, "
    "censoring the competitor) is BIASED upward — the two '1-KM' "
    "curves can sum past 1; CIFs by construction cannot. Same "
    "scale contract as the KM/Nelson-Aalen twins: per-user firsts "
    "(one shuffle), duration summary bounded by the calendar, "
    "windows only over that summary.",
    tags=("analytics", "stats"),
)
def analytics_competing_risks(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    ends = ev.agg(F.to_date(F.max("ts")).alias("obs_end"))
    pu = ev.groupBy("user_id").agg(
        F.min(
            F.when(F.col("event_type") == "view", F.to_date("ts"))
        ).alias("fv"),
        F.min(
            F.when(F.col("event_type") == "purchase", F.to_date("ts"))
        ).alias("fp"),
        F.min(
            F.when(F.col("event_type") == "error", F.to_date("ts"))
        ).alias("fe"),
    )
    fp_wins = (
        F.col("fp").isNotNull()
        & (F.col("fp") >= F.col("fv"))
        & (F.col("fe").isNull() | (F.col("fp") <= F.col("fe")))
    )
    fe_wins = F.col("fe").isNotNull() & (F.col("fe") >= F.col("fv"))
    dur = (
        pu.crossJoin(F.broadcast(ends))
        .filter(F.col("fv").isNotNull())
        .select(
            F.when(fp_wins, F.datediff("fp", "fv"))
            .when(fe_wins, F.datediff("fe", "fv"))
            .otherwise(F.datediff("obs_end", "fv"))
            .alias("t"),
            F.when(fp_wins, 1).when(fe_wins, 2).otherwise(0).alias("cause"),
        )
    )
    per_t = dur.groupBy("t").agg(
        F.sum(F.when(F.col("cause") == 1, 1).otherwise(0))
        .cast("double")
        .alias("d1"),
        F.sum(F.when(F.col("cause") == 2, 1).otherwise(0))
        .cast("double")
        .alias("d2"),
        F.count("*").cast("double").alias("total"),
    )
    w_desc = Window.orderBy(F.col("t").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_prev = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, -1)
    w_upto = Window.orderBy("t").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    risk = per_t.select(
        "t", "d1", "d2", F.sum("total").over(w_desc).alias("n_risk")
    )
    d_all = F.col("d1") + F.col("d2")
    surv = risk.select(
        "t",
        "d1",
        "d2",
        "n_risk",
        F.exp(
            F.coalesce(
                F.sum(
                    F.when(
                        d_all > 0, F.log(1 - d_all / F.col("n_risk"))
                    ).otherwise(0.0)
                ).over(w_prev),
                F.lit(0.0),
            )
        ).alias("s_minus"),
    )
    cif = surv.select(
        "t",
        "d1",
        "d2",
        "n_risk",
        F.sum(F.col("s_minus") * F.col("d1") / F.col("n_risk"))
        .over(w_upto)
        .alias("cif_purchase"),
        F.sum(F.col("s_minus") * F.col("d2") / F.col("n_risk"))
        .over(w_upto)
        .alias("cif_error"),
    )
    return (
        cif.filter(F.col("d1") + F.col("d2") > 0)
        .select(
            F.col("t").cast("long").alias("t_days"),
            F.col("n_risk").cast("long").alias("n_risk"),
            F.col("d1").cast("long").alias("n_purchase"),
            F.col("d2").cast("long").alias("n_error"),
            F.round("cif_purchase", 6).alias("cif_purchase"),
            F.round("cif_error", 6).alias("cif_error"),
        )
        .orderBy("t_days")
    )


@query(
    "event-mcf-recurrent",
    oracle="""
        WITH ends AS (SELECT CAST(max(ts) AS DATE) AS obs_end FROM events),
        fu AS (
            SELECT user_id, min(CAST(ts AS DATE)) AS enter_d
            FROM events GROUP BY user_id
        ),
        purchases AS (
            SELECT e.user_id,
                   date_diff('day', f.enter_d, CAST(e.ts AS DATE)) AS t
            FROM events e JOIN fu f ON e.user_id = f.user_id
            WHERE e.event_type = 'purchase'
        ),
        risk_span AS (
            SELECT f.user_id,
                   date_diff('day', f.enter_d, x.obs_end) AS tau
            FROM fu f CROSS JOIN ends x
        ),
        ev_t AS (
            SELECT t, CAST(count(*) AS DOUBLE) AS d FROM purchases
            GROUP BY t
        ),
        exits AS (
            SELECT tau, CAST(count(*) AS DOUBLE) AS n_exit FROM risk_span
            GROUP BY tau
        ),
        grid AS (
            SELECT t, d, coalesce(x.n_exit, 0) AS n_exit
            FROM ev_t LEFT JOIN exits x ON ev_t.t = x.tau
        ),
        tot AS (SELECT CAST(count(*) AS DOUBLE) AS n_users FROM fu),
        mcf AS (
            SELECT t, d,
                   tot.n_users
                     - coalesce(sum(n_exit) OVER (ORDER BY t
                           ROWS BETWEEN UNBOUNDED PRECEDING
                           AND 1 PRECEDING), 0) AS n_risk,
                   tot.n_users
            FROM grid CROSS JOIN tot
        )
        SELECT CAST(t AS BIGINT) AS t_days,
               CAST(n_risk AS BIGINT) AS n_risk,
               CAST(d AS BIGINT) AS n_events,
               round(sum(d / n_risk) OVER (ORDER BY t
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6)
                   AS mcf
        FROM mcf ORDER BY t_days
    """,
    doc="Nelson-Aalen mean cumulative function for RECURRENT events — "
    "expected purchases per user by day t since first activity: "
    "MCF(t) = sum_{u<=t} d_u / n_u with the risk set shrinking as "
    "users' observation windows end (staggered entry -> staggered "
    "administrative censoring at the corpus high-water mark). The "
    "single-event estimators (stats-kaplan-meier and twins) describe "
    "TIME-TO-FIRST; repeat behavior — orders, support tickets, "
    "crashes per device — needs the MCF, and dividing raw cumulative "
    "counts by the day-0 cohort size (the naive curve) understates "
    "late-horizon rates exactly when censoring bites. Purchase "
    "events and exit times roll up to two calendar-bounded "
    "summaries; windows run there.",
    tags=("event", "analytics"),
)
def event_mcf_recurrent(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    ends = ev.agg(F.to_date(F.max("ts")).alias("obs_end"))
    fu = ev.groupBy("user_id").agg(F.min(F.to_date("ts")).alias("enter_d"))
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .join(fu, "user_id")
        .select(F.datediff(F.to_date("ts"), "enter_d").alias("t"))
    )
    risk_span = fu.crossJoin(F.broadcast(ends)).select(
        F.datediff("obs_end", "enter_d").alias("tau")
    )
    ev_t = purchases.groupBy("t").agg(F.count("*").cast("double").alias("d"))
    exits = risk_span.groupBy(F.col("tau").alias("t_exit")).agg(
        F.count("*").cast("double").alias("n_exit")
    )
    grid = ev_t.join(
        exits, ev_t["t"] == exits["t_exit"], "left"
    ).select(
        "t", "d", F.coalesce(F.col("n_exit"), F.lit(0.0)).alias("n_exit")
    )
    tot = fu.agg(F.count("*").cast("double").alias("n_users"))
    w_prev = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, -1)
    w_upto = Window.orderBy("t").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    mcf = grid.crossJoin(F.broadcast(tot)).select(
        "t",
        "d",
        (
            F.col("n_users")
            - F.coalesce(F.sum("n_exit").over(w_prev), F.lit(0.0))
        ).alias("n_risk"),
    )
    return mcf.select(
        F.col("t").cast("long").alias("t_days"),
        F.col("n_risk").cast("long").alias("n_risk"),
        F.col("d").cast("long").alias("n_events"),
        F.round(
            F.sum(F.col("d") / F.col("n_risk")).over(w_upto), 6
        ).alias("mcf"),
    ).orderBy("t_days")


@query(
    "stats-friedman-nemenyi",
    oracle="""
        WITH daily AS (
            SELECT CAST(ts AS DATE) AS day, event_type, avg(value) AS m
            FROM events GROUP BY CAST(ts AS DATE), event_type
        ),
        complete AS (
            SELECT day FROM daily GROUP BY day HAVING count(*) = 5
        ),
        ranked AS (
            SELECT d.day, d.event_type,
                   CAST(rank() OVER (PARTITION BY d.day ORDER BY d.m)
                        AS DOUBLE) AS r
            FROM daily d JOIN complete c ON c.day = d.day
        ),
        rbar AS (
            SELECT event_type, avg(r) AS rbar,
                   CAST(count(*) AS DOUBLE) AS n
            FROM ranked GROUP BY event_type
        ),
        k AS (SELECT CAST(count(*) AS DOUBLE) AS k, max(n) AS n FROM rbar)
        SELECT a.event_type AS type_a, b.event_type AS type_b,
               round(a.rbar, 6) AS rank_a,
               round(b.rbar, 6) AS rank_b,
               round(abs(a.rbar - b.rbar)
                     / sqrt(k.k * (k.k + 1) / (6 * k.n)), 4) AS nemenyi_q,
               round(abs(a.rbar - b.rbar)
                     / sqrt(k.k * (k.k + 1) / (6 * k.n))
                     * sqrt(2.0), 4) AS q_range_scale
        FROM rbar a JOIN rbar b ON a.event_type < b.event_type
        CROSS JOIN k
    """,
    doc="Nemenyi post-hoc after the Friedman test (stats-friedman-test, "
    "same day-blocked rank construction): for every treatment pair "
    "the standardized mean-rank difference |Rbar_i - Rbar_j| / "
    "sqrt(k(k+1)/6N) — the statistic behind critical-difference "
    "diagrams, THE standard way to compare k models over N "
    "datasets/days (Demsar 2006); also emitted on the studentized-"
    "range scale (x sqrt 2) for q_alpha tables. Friedman only says "
    "'the five types do not rank identically'; Nemenyi says WHICH "
    "pairs differ. Within-day ranking is a 5-row partitioned window; "
    "the pair join runs on the 5-row treatment summary.",
    tags=("stats", "eval"),
)
def stats_friedman_nemenyi(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.to_date("ts").alias("day"), "event_type"
    ).agg(F.avg("value").alias("m"))
    complete = (
        daily.groupBy("day")
        .agg(F.count("*").alias("k_day"))
        .filter(F.col("k_day") == 5)
        .select("day")
    )
    ranked = daily.join(complete, "day").select(
        "event_type",
        F.rank()
        .over(Window.partitionBy("day").orderBy("m"))
        .cast("double")
        .alias("r"),
    )
    rbar = ranked.groupBy("event_type").agg(
        F.avg("r").alias("rbar"), F.count("*").cast("double").alias("n")
    )
    k = rbar.agg(
        F.count("*").cast("double").alias("k"), F.max("n").alias("n")
    )
    a = rbar.select(
        F.col("event_type").alias("type_a"), F.col("rbar").alias("rank_a")
    )
    b = rbar.select(
        F.col("event_type").alias("type_b"), F.col("rbar").alias("rank_b")
    )
    se = F.sqrt(F.col("k") * (F.col("k") + 1) / (6 * F.col("n")))
    q = F.abs(F.col("rank_a") - F.col("rank_b")) / se
    return (
        a.join(F.broadcast(b), F.col("type_a") < F.col("type_b"))
        .crossJoin(F.broadcast(k))
        .select(
            "type_a",
            "type_b",
            F.round("rank_a", 6).alias("rank_a"),
            F.round("rank_b", 6).alias("rank_b"),
            F.round(q, 4).alias("nemenyi_q"),
            F.round(q * F.sqrt(F.lit(2.0)), 4).alias("q_range_scale"),
        )
    )


@query(
    "stats-yuen-trimmed-ttest",
    oracle="""
        WITH grp AS (
            SELECT CASE WHEN event_type = 'purchase' THEN 'purchase'
                        ELSE 'other' END AS g,
                   value AS y
            FROM events WHERE event_type IN ('purchase', 'view')
        ),
        cuts AS (
            SELECT g, quantile_cont(y, 0.2) AS lo,
                   quantile_cont(y, 0.8) AS hi
            FROM grp GROUP BY g
        ),
        wins AS (
            SELECT grp.g,
                   CASE WHEN y < lo THEN lo
                        WHEN y > hi THEN hi ELSE y END AS w,
                   CASE WHEN y >= lo AND y <= hi THEN 1 ELSE 0 END
                       AS in_core
            FROM grp JOIN cuts ON grp.g = cuts.g
        ),
        s AS (
            SELECT g, CAST(count(*) AS DOUBLE) AS n,
                   CAST(sum(in_core) AS DOUBLE) AS h,
                   avg(CASE WHEN in_core = 1 THEN w END) AS tmean,
                   (count(*) - 1) * var_samp(w) AS ssw
            FROM wins GROUP BY g
        )
        SELECT CAST(max(CASE WHEN g = 'purchase' THEN n END) AS BIGINT)
                   AS n_a,
               CAST(max(CASE WHEN g = 'other' THEN n END) AS BIGINT)
                   AS n_b,
               round(max(CASE WHEN g = 'purchase' THEN tmean END), 6)
                   AS trimmed_mean_a,
               round(max(CASE WHEN g = 'other' THEN tmean END), 6)
                   AS trimmed_mean_b,
               round((max(CASE WHEN g = 'purchase' THEN tmean END)
                      - max(CASE WHEN g = 'other' THEN tmean END))
                     / sqrt(max(CASE WHEN g = 'purchase'
                                     THEN ssw / (h * (h - 1)) END)
                            + max(CASE WHEN g = 'other'
                                       THEN ssw / (h * (h - 1)) END)), 4)
                   AS yuen_t
        FROM s
    """,
    doc="Yuen's trimmed-mean t-test (20%% trim) between purchase and "
    "view event values: compare 20%%-trimmed means with Winsorized "
    "variances, t = (tm_a - tm_b)/sqrt(sw_a^2/(h_a(h_a-1)) + "
    "sw_b^2/(h_b(h_b-1))) where h is the retained count — the "
    "robust two-sample test that keeps ~95%% efficiency under "
    "normality but does not hand a handful of outliers the verdict "
    "the way stats-welch-ttest does. Trim thresholds are exact "
    "linear-interpolated quantiles (Spark percentile == DuckDB "
    "quantile_cont); per-group percentile + winsorize + moments = "
    "two bounded aggregates and one broadcast of the 2-row cut "
    "table.",
    tags=("stats",),
)
def stats_yuen_trimmed_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    grp = ev.filter(
        F.col("event_type").isin("purchase", "view")
    ).select(
        F.when(F.col("event_type") == "purchase", "purchase")
        .otherwise("other")
        .alias("g"),
        F.col("value").alias("y"),
    )
    cuts = grp.groupBy("g").agg(
        F.expr("percentile(y, 0.2)").alias("lo"),
        F.expr("percentile(y, 0.8)").alias("hi"),
    )
    wins = grp.join(F.broadcast(cuts), "g").select(
        "g",
        F.when(F.col("y") < F.col("lo"), F.col("lo"))
        .when(F.col("y") > F.col("hi"), F.col("hi"))
        .otherwise(F.col("y"))
        .alias("w"),
        (
            (F.col("y") >= F.col("lo")) & (F.col("y") <= F.col("hi"))
        )
        .cast("int")
        .alias("in_core"),
    )
    s = wins.groupBy("g").agg(
        F.count("*").cast("double").alias("n"),
        F.sum("in_core").cast("double").alias("h"),
        F.avg(F.when(F.col("in_core") == 1, F.col("w"))).alias("tmean"),
        ((F.count("*") - 1) * F.var_samp("w")).alias("ssw"),
    )

    def pick(col: str, g: str):
        return F.max(F.when(F.col("g") == g, F.col(col)))

    sw_a = pick("ssw", "purchase") / (
        pick("h", "purchase") * (pick("h", "purchase") - 1)
    )
    sw_b = pick("ssw", "other") / (
        pick("h", "other") * (pick("h", "other") - 1)
    )
    return s.agg(
        pick("n", "purchase").cast("long").alias("n_a"),
        pick("n", "other").cast("long").alias("n_b"),
        F.round(pick("tmean", "purchase"), 6).alias("trimmed_mean_a"),
        F.round(pick("tmean", "other"), 6).alias("trimmed_mean_b"),
        F.round(
            (pick("tmean", "purchase") - pick("tmean", "other"))
            / F.sqrt(sw_a + sw_b),
            4,
        ).alias("yuen_t"),
    )


@query(
    "agg-theil-decomposition",
    oracle="""
        WITH pu AS (
            SELECT user_id, CAST(user_id % 4 AS BIGINT) AS seg,
                   sum(value) AS x
            FROM events WHERE event_type = 'purchase' GROUP BY user_id
        ),
        g AS (SELECT avg(x) AS mu, CAST(count(*) AS DOUBLE) AS n FROM pu),
        within AS (
            SELECT p.seg, CAST(count(*) AS DOUBLE) AS n_s, avg(p.x) AS mu_s,
                   avg((p.x / s.mu_s) * ln(p.x / s.mu_s)) AS t_s
            FROM pu p JOIN (SELECT seg, avg(x) AS mu_s FROM pu GROUP BY seg) s
                 ON p.seg = s.seg
            GROUP BY p.seg
        )
        SELECT CAST(g.n AS BIGINT) AS n_users,
               round(sum((w.n_s / g.n) * (w.mu_s / g.mu) * w.t_s), 6)
                   AS theil_within,
               round(sum((w.n_s / g.n) * (w.mu_s / g.mu)
                         * ln(w.mu_s / g.mu)), 6) AS theil_between,
               round(sum((w.n_s / g.n) * (w.mu_s / g.mu) * w.t_s)
                     + sum((w.n_s / g.n) * (w.mu_s / g.mu)
                           * ln(w.mu_s / g.mu)), 6) AS theil_total
        FROM within w CROSS JOIN g
        GROUP BY g.n
    """,
    doc="Theil T inequality index with exact between/within "
    "decomposition over user segments: T = sum_s (n_s/n)(mu_s/mu) T_s "
    "+ sum_s (n_s/n)(mu_s/mu) ln(mu_s/mu) — the property "
    "agg-gini-coefficient lacks (Gini is not additively decomposable; "
    "its 'between' term carries an overlap residual), so Theil is "
    "what answers 'how much revenue concentration lives INSIDE "
    "segments vs BETWEEN them'. Per-user purchase totals (one "
    "shuffle), per-segment entropy terms against broadcast segment "
    "means, 4-row combine. The decomposition identity is checked "
    "in-plan by emitting total = within + between.",
    tags=("agg", "analytics"),
)
def agg_theil_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    pu = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.sum("value").alias("x"))
        .select(
            (F.col("user_id") % 4).cast("long").alias("seg"), "x"
        )
    )
    g = pu.agg(
        F.avg("x").alias("mu"), F.count("*").cast("double").alias("n")
    )
    seg_mu = pu.groupBy("seg").agg(F.avg("x").alias("mu_s"))
    within = (
        pu.join(F.broadcast(seg_mu), "seg")
        .groupBy("seg")
        .agg(
            F.count("*").cast("double").alias("n_s"),
            F.max("mu_s").alias("mu_s"),
            F.avg(
                (F.col("x") / F.col("mu_s"))
                * F.log(F.col("x") / F.col("mu_s"))
            ).alias("t_s"),
        )
    )
    share = (F.col("n_s") / F.col("n")) * (F.col("mu_s") / F.col("mu"))
    t_within = F.sum(share * F.col("t_s"))
    t_between = F.sum(share * F.log(F.col("mu_s") / F.col("mu")))
    return (
        within.crossJoin(F.broadcast(g))
        .groupBy("n")
        .agg(
            F.round(t_within, 6).alias("theil_within"),
            F.round(t_between, 6).alias("theil_between"),
            F.round(t_within + t_between, 6).alias("theil_total"),
        )
        .select(
            F.col("n").cast("long").alias("n_users"),
            "theil_within",
            "theil_between",
            "theil_total",
        )
    )


@query(
    "timeseries-seasonal-mann-kendall",
    oracle="""
        WITH daily AS (
            SELECT CAST(ts AS DATE) AS d, CAST(count(*) AS DOUBLE) AS y
            FROM events GROUP BY 1
        ),
        keyed AS (
            SELECT dayofweek(d) AS dow,
                   CAST(date_diff('week', (SELECT min(d) FROM daily), d)
                        AS BIGINT) AS wk,
                   y
            FROM daily
        ),
        pairs AS (
            SELECT a.dow,
                   CASE WHEN b.y > a.y THEN 1.0
                        WHEN b.y < a.y THEN -1.0 ELSE 0.0 END AS sgn
            FROM keyed a JOIN keyed b
              ON a.dow = b.dow AND a.wk < b.wk
        ),
        per_season AS (
            SELECT k.dow, CAST(count(*) AS DOUBLE) AS n_s,
                   coalesce(max(p.s), 0) AS s_s
            FROM keyed k
            LEFT JOIN (SELECT dow, sum(sgn) AS s FROM pairs GROUP BY dow) p
              ON k.dow = p.dow
            GROUP BY k.dow
        )
        SELECT CAST(sum(n_s) AS BIGINT) AS n_days,
               CAST(count(*) AS BIGINT) AS n_seasons,
               CAST(sum(s_s) AS BIGINT) AS s_stat,
               round(sum(n_s * (n_s - 1) * (2 * n_s + 5)) / 18.0, 6)
                   AS var_s,
               round((sum(s_s) - CASE WHEN sum(s_s) > 0 THEN 1
                                      WHEN sum(s_s) < 0 THEN -1
                                      ELSE 0 END)
                     / sqrt(sum(n_s * (n_s - 1) * (2 * n_s + 5)) / 18.0), 4)
                   AS z_smk
        FROM per_season
    """,
    doc="Seasonal Mann-Kendall trend test (Hirsch-Slack) on daily event "
    "volume with day-of-week seasons: S = sum over seasons of the "
    "pairwise sign statistic computed ONLY between same-weekday "
    "observations, Var = sum n_s(n_s-1)(2n_s+5)/18, z with "
    "continuity correction — the plain MK test "
    "(timeseries-mann-kendall) reads a strong weekly cycle as noise "
    "(or worse, as trend); stratifying by season removes it without "
    "modeling it. The pairwise join is within-season over the "
    "calendar-bounded weekly index (n_s ~ span/7 rows per season) — "
    "quadratic only in WEEKS, constant in event volume.",
    tags=("timeseries", "stats"),
)
def timeseries_seasonal_mann_kendall(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("d")).agg(
        F.count("*").cast("double").alias("y")
    )
    d0 = daily.agg(F.min("d").alias("d0"))
    keyed = daily.crossJoin(F.broadcast(d0)).select(
        F.dayofweek("d").alias("dow"),
        F.floor(F.datediff("d", "d0") / 7).cast("long").alias("wk"),
        "y",
    )
    a = keyed.select(
        F.col("dow").alias("a_dow"), F.col("wk").alias("a_wk"),
        F.col("y").alias("a_y"),
    )
    b = keyed.select(
        F.col("dow").alias("b_dow"), F.col("wk").alias("b_wk"),
        F.col("y").alias("b_y"),
    )
    pairs = a.join(
        b,
        (F.col("a_dow") == F.col("b_dow")) & (F.col("a_wk") < F.col("b_wk")),
    ).select(
        F.col("a_dow").alias("dow"),
        F.when(F.col("b_y") > F.col("a_y"), 1.0)
        .when(F.col("b_y") < F.col("a_y"), -1.0)
        .otherwise(0.0)
        .alias("sgn"),
    )
    s_per = pairs.groupBy("dow").agg(F.sum("sgn").alias("s"))
    per_season = (
        keyed.groupBy("dow")
        .agg(F.count("*").cast("double").alias("n_s"))
        .join(s_per, "dow", "left")
        .select(
            "dow",
            "n_s",
            F.coalesce(F.col("s"), F.lit(0.0)).alias("s_s"),
        )
    )
    s_tot = F.sum("s_s")
    var_s = F.sum(
        F.col("n_s") * (F.col("n_s") - 1) * (2 * F.col("n_s") + 5)
    ) / 18.0
    cc = (
        F.when(s_tot > 0, 1.0).when(s_tot < 0, -1.0).otherwise(0.0)
    )
    return per_season.agg(
        F.sum("n_s").cast("long").alias("n_days"),
        F.count("*").cast("long").alias("n_seasons"),
        s_tot.cast("long").alias("s_stat"),
        F.round(var_s, 6).alias("var_s"),
        F.round((s_tot - cc) / F.sqrt(var_s), 4).alias("z_smk"),
    )


@query(
    "stats-logrank-test",
    oracle="""
        WITH ends AS (SELECT CAST(max(ts) AS DATE) AS obs_end FROM events),
        pu AS (
            SELECT user_id, CAST(user_id % 2 AS INT) AS grp,
                   min(CASE WHEN event_type = 'view' THEN CAST(ts AS DATE) END)
                       AS fv,
                   min(CASE WHEN event_type = 'purchase'
                            THEN CAST(ts AS DATE) END) AS fp
            FROM events GROUP BY user_id
        ),
        dur AS (
            SELECT grp,
                   CASE WHEN fp IS NOT NULL AND fp >= fv
                        THEN date_diff('day', fv, fp) ELSE
                             date_diff('day', fv, e.obs_end) END AS t,
                   CASE WHEN fp IS NOT NULL AND fp >= fv THEN 1 ELSE 0 END
                       AS died
            FROM pu CROSS JOIN ends e
            WHERE fv IS NOT NULL
        ),
        per_t AS (
            SELECT t,
                   CAST(sum(died) AS DOUBLE) AS d,
                   CAST(sum(CASE WHEN grp = 1 THEN died ELSE 0 END)
                        AS DOUBLE) AS d1,
                   CAST(count(*) AS DOUBLE) AS total,
                   CAST(sum(grp) AS DOUBLE) AS total1
            FROM dur GROUP BY t
        ),
        risk AS (
            SELECT t, d, d1,
                   sum(total) OVER w AS n_risk,
                   sum(total1) OVER w AS n1_risk
            FROM per_t
            WINDOW w AS (ORDER BY t DESC
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        ),
        terms AS (
            SELECT sum(d1) AS o1,
                   sum(d * n1_risk / n_risk) AS e1,
                   sum(CASE WHEN n_risk > 1
                            THEN d * (n1_risk / n_risk)
                                 * (1 - n1_risk / n_risk)
                                 * (n_risk - d) / (n_risk - 1)
                            ELSE 0 END) AS v
            FROM risk WHERE d > 0
        )
        SELECT CAST((SELECT count(*) FROM dur) AS BIGINT) AS n_users,
               round(o1, 6) AS observed_g1,
               round(e1, 6) AS expected_g1,
               round((o1 - e1) * (o1 - e1) / v, 4) AS logrank_chi2
        FROM terms
    """,
    doc="Two-group log-rank test on first-view -> first-purchase "
    "conversion (groups = user hash parity): at each event time the "
    "group-1 deaths are compared against the hypergeometric "
    "expectation d * n1/n with variance d(n1/n)(1-n1/n)(n-d)/(n-1), "
    "and chi2 = (O1-E1)^2/V — THE standard test for 'do these two "
    "survival curves differ', weighting every event time equally "
    "(Mantel-Haenszel over the risk-set 2x2 tables; the same "
    "machinery as stats-cmh-pooled-or applied along time). Completes "
    "the survival suite: KM/Nelson-Aalen estimate curves, "
    "competing-risks splits causes, log-rank TESTS group contrast. "
    "Same scale contract: windows only over the calendar-bounded "
    "duration summary.",
    tags=("stats", "analytics"),
)
def stats_logrank_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    ends = ev.agg(F.to_date(F.max("ts")).alias("obs_end"))
    pu = ev.groupBy("user_id").agg(
        F.min(
            F.when(F.col("event_type") == "view", F.to_date("ts"))
        ).alias("fv"),
        F.min(
            F.when(F.col("event_type") == "purchase", F.to_date("ts"))
        ).alias("fp"),
    ).select(
        (F.col("user_id") % 2).cast("int").alias("grp"), "fv", "fp"
    )
    died = (F.col("fp").isNotNull() & (F.col("fp") >= F.col("fv"))).cast(
        "int"
    )
    dur = (
        pu.crossJoin(F.broadcast(ends))
        .filter(F.col("fv").isNotNull())
        .select(
            "grp",
            F.when(died == 1, F.datediff("fp", "fv"))
            .otherwise(F.datediff("obs_end", "fv"))
            .alias("t"),
            died.alias("died"),
        )
    )
    n_users = dur.agg(F.count("*").cast("long").alias("n_users"))
    per_t = dur.groupBy("t").agg(
        F.sum("died").cast("double").alias("d"),
        F.sum(F.when(F.col("grp") == 1, F.col("died")).otherwise(0))
        .cast("double")
        .alias("d1"),
        F.count("*").cast("double").alias("total"),
        F.sum("grp").cast("double").alias("total1"),
    )
    w = Window.orderBy(F.col("t").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    risk = per_t.select(
        "t",
        "d",
        "d1",
        F.sum("total").over(w).alias("n_risk"),
        F.sum("total1").over(w).alias("n1_risk"),
    )
    p1 = F.col("n1_risk") / F.col("n_risk")
    terms = risk.filter(F.col("d") > 0).agg(
        F.sum("d1").alias("o1"),
        F.sum(F.col("d") * p1).alias("e1"),
        F.sum(
            F.when(
                F.col("n_risk") > 1,
                F.col("d")
                * p1
                * (1 - p1)
                * (F.col("n_risk") - F.col("d"))
                / (F.col("n_risk") - 1),
            ).otherwise(0.0)
        ).alias("v"),
    )
    return terms.crossJoin(F.broadcast(n_users)).select(
        "n_users",
        F.round("o1", 6).alias("observed_g1"),
        F.round("e1", 6).alias("expected_g1"),
        F.round(
            (F.col("o1") - F.col("e1"))
            * (F.col("o1") - F.col("e1"))
            / F.col("v"),
            4,
        ).alias("logrank_chi2"),
    )


@query(
    "timeseries-adf-test",
    oracle="""
        WITH daily AS (
            SELECT CAST(ts AS DATE) AS d, CAST(count(*) AS DOUBLE) AS y
            FROM events GROUP BY 1
        ),
        lagged AS (
            SELECT y - lag(y) OVER (ORDER BY d) AS dy,
                   lag(y) OVER (ORDER BY d) AS y1
            FROM daily
        ),
        m AS (
            SELECT CAST(count(*) AS DOUBLE) AS n,
                   covar_samp(dy, y1) / var_samp(y1) AS rho,
                   avg(dy) AS mdy, avg(y1) AS my1,
                   var_samp(dy) AS sdd, var_samp(y1) AS s11,
                   covar_samp(dy, y1) AS sd1
            FROM lagged WHERE y1 IS NOT NULL
        )
        SELECT CAST(n AS BIGINT) AS n_obs,
               round(rho, 6) AS rho_coef,
               round(rho / sqrt(((n - 1) * (sdd - sd1 * sd1 / s11)
                                 / (n - 2))
                                / ((n - 1) * s11)), 4) AS adf_t,
               round(mdy - rho * my1, 6) AS drift
        FROM m
    """,
    doc="Augmented Dickey-Fuller unit-root test (0 lags, constant): "
    "regress the first difference on the lagged level, "
    "dy_t = c + rho*y_{t-1}; the t-statistic of rho (closed form: "
    "rho / sqrt(sigma2/Sxx) with sigma2 = (n-1)(Sdd - Sd1^2/S11)/"
    "(n-2)) against the Dickey-Fuller critical values (~-2.89 at 5%) "
    "decides stationary-vs-random-walk — the complement of "
    "timeseries-kpss-level (KPSS null = stationary, ADF null = unit "
    "root; agreement of the two is the standard pre-modeling check "
    "before trusting any trend regression in this repo, including "
    "timeseries-cochrane-orcutt's AR(1) fix). One lag window over "
    "the calendar-bounded daily series, one moment aggregate.",
    tags=("timeseries", "stats"),
)
def timeseries_adf_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("d")).agg(
        F.count("*").cast("double").alias("y")
    )
    w = Window.orderBy("d")
    lagged = daily.select(
        (F.col("y") - F.lag("y").over(w)).alias("dy"),
        F.lag("y").over(w).alias("y1"),
    ).filter(F.col("y1").isNotNull())
    m = lagged.agg(
        F.count("*").cast("double").alias("n"),
        (F.covar_samp("dy", "y1") / F.var_samp("y1")).alias("rho"),
        F.avg("dy").alias("mdy"),
        F.avg("y1").alias("my1"),
        F.var_samp("dy").alias("sdd"),
        F.var_samp("y1").alias("s11"),
        F.covar_samp("dy", "y1").alias("sd1"),
    )
    n = F.col("n")
    sigma2 = (
        (n - 1)
        * (F.col("sdd") - F.col("sd1") * F.col("sd1") / F.col("s11"))
        / (n - 2)
    )
    se = F.sqrt(sigma2 / ((n - 1) * F.col("s11")))
    return m.select(
        n.cast("long").alias("n_obs"),
        F.round("rho", 6).alias("rho_coef"),
        F.round(F.col("rho") / se, 4).alias("adf_t"),
        F.round(F.col("mdy") - F.col("rho") * F.col("my1"), 6).alias(
            "drift"
        ),
    )


@query(
    "attribution-time-decay",
    oracle="""
        WITH purchases AS (
            SELECT user_id, ts AS p_ts, event_id AS p_id
            FROM events WHERE event_type = 'purchase'
        ),
        touches AS (
            SELECT e.event_type, p.p_id,
                   power(0.5, CAST(date_diff('second', e.ts, p.p_ts)
                                   AS DOUBLE) / 21600.0) AS w
            FROM events e
            JOIN purchases p ON p.user_id = e.user_id
             AND e.ts >= p.p_ts - INTERVAL 24 HOUR AND e.ts < p.p_ts
            WHERE e.event_type IN ('click', 'view', 'signup')
        ),
        norm AS (
            SELECT event_type, p_id,
                   w / sum(w) OVER (PARTITION BY p_id) AS credit
            FROM touches
        )
        SELECT event_type,
               round(sum(credit), 4) AS attributed_conversions,
               CAST(count(*) AS BIGINT) AS n_touches
        FROM norm GROUP BY event_type ORDER BY event_type
    """,
    doc="Time-decay multi-touch attribution (6h half-life): every "
    "touchpoint in the 24h pre-purchase window earns "
    "0.5^(dt/halflife), normalized per conversion so channel totals "
    "conserve conversions exactly — the fourth standard model "
    "completing the attribution family (last-touch, position-based "
    "U-shape, Shapley): position-based credits BY RANK, time-decay "
    "by RECENCY, and the two disagree precisely when touch spacing "
    "is uneven — comparing the family's outputs on the same touch "
    "relation is how analysts bound model risk. Same scale contract "
    "as its siblings: user-keyed range join bounded by the 24h "
    "lookback, one per-conversion normalization window (bounded by "
    "touches-per-purchase), codegen weights.",
    tags=("attribution", "analytics"),
)
def attribution_time_decay(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
        F.col("event_id").alias("p_id"),
    )
    touches = (
        ev.filter(F.col("event_type").isin("click", "view", "signup"))
        .join(
            purchases,
            (F.col("user_id") == F.col("p_user"))
            & (F.col("ts") >= F.col("p_ts") - F.expr("INTERVAL 24 HOURS"))
            & (F.col("ts") < F.col("p_ts")),
        )
        .select(
            "event_type",
            "p_id",
            F.pow(
                0.5,
                (
                    F.unix_timestamp("p_ts") - F.unix_timestamp("ts")
                ).cast("double")
                / 21600.0,
            ).alias("w"),
        )
    )
    wn = Window.partitionBy("p_id")
    norm = touches.select(
        "event_type",
        (F.col("w") / F.sum("w").over(wn)).alias("credit"),
    )
    return (
        norm.groupBy("event_type")
        .agg(
            F.round(F.sum("credit"), 4).alias("attributed_conversions"),
            F.count("*").cast("long").alias("n_touches"),
        )
        .orderBy("event_type")
    )


@query(
    "stats-rayleigh-circular",
    oracle="""
        WITH ang AS (
            SELECT event_type,
                   (extract(hour FROM ts) * 3600
                    + extract(minute FROM ts) * 60
                    + extract(second FROM ts))
                   * 2 * pi() / 86400.0 AS theta
            FROM events
        ),
        s AS (
            SELECT event_type, CAST(count(*) AS DOUBLE) AS n,
                   avg(cos(theta)) AS c, avg(sin(theta)) AS s
            FROM ang GROUP BY event_type
        )
        SELECT event_type, CAST(n AS BIGINT) AS n_events,
               round(CASE WHEN atan2(s, c) < 0
                          THEN (atan2(s, c) + 2 * pi()) * 86400
                               / (2 * pi()) / 3600
                          ELSE atan2(s, c) * 86400 / (2 * pi()) / 3600
                     END, 4) AS mean_hour,
               round(sqrt(c * c + s * s), 6) AS resultant_r,
               round(n * (c * c + s * s), 4) AS rayleigh_z
        FROM s ORDER BY event_type
    """,
    doc="Circular statistics of event time-of-day per event type: "
    "mean direction (converted back to hours), mean resultant length "
    "R, and the Rayleigh statistic z = n R^2 testing uniformity "
    "around the clock (z > ~3 rejects at 5%%). Clock-time is "
    "CIRCULAR — 23:30 and 00:30 are an hour apart, not 23 — so "
    "linear means/variances (and stats-uniformity-hours' binned "
    "chi2, which discards adjacency entirely) misread peaks that "
    "straddle midnight; the cos/sin resultant is the correct "
    "geometry and costs exactly one aggregation: two trig codegen "
    "columns, five groups, no windows, no joins.",
    tags=("stats", "event"),
)
def stats_rayleigh_circular(spark: SparkSession, sf_dir: str) -> DataFrame:
    import math

    ev = load_table(spark, sf_dir, "events")
    two_pi = 2 * math.pi
    theta = (
        (
            F.hour("ts") * 3600
            + F.minute("ts") * 60
            + F.second("ts")
        )
        * two_pi
        / 86400.0
    )
    s = ev.select("event_type", theta.alias("theta")).groupBy(
        "event_type"
    ).agg(
        F.count("*").cast("double").alias("n"),
        F.avg(F.cos("theta")).alias("c"),
        F.avg(F.sin("theta")).alias("s"),
    )
    mean_dir = F.atan2(F.col("s"), F.col("c"))
    mean_hour = (
        F.when(mean_dir < 0, mean_dir + two_pi).otherwise(mean_dir)
        * 86400
        / two_pi
        / 3600
    )
    r2 = F.col("c") * F.col("c") + F.col("s") * F.col("s")
    return s.select(
        "event_type",
        F.col("n").cast("long").alias("n_events"),
        F.round(mean_hour, 4).alias("mean_hour"),
        F.round(F.sqrt(r2), 6).alias("resultant_r"),
        F.round(F.col("n") * r2, 4).alias("rayleigh_z"),
    ).orderBy("event_type")


_BSE_REPS = 12
_BSE_CDF = (0.367879, 0.735759, 0.919699, 0.981012)


@query(
    "ml-bootstrap-slope-se",
    oracle=f"""
        WITH pu AS (
            SELECT user_id,
                   ln(1 + CAST(sum(CASE WHEN event_type <> 'purchase'
                                        THEN 1 ELSE 0 END) AS DOUBLE)) AS x,
                   CAST(sum(CASE WHEN event_type = 'purchase'
                                 THEN 1 ELSE 0 END) AS DOUBLE) AS y
            FROM events GROUP BY user_id
            HAVING sum(CASE WHEN event_type <> 'purchase' THEN 1 ELSE 0 END)
                   > 0
        ),
        analytic AS (
            SELECT regr_slope(y, x) AS slope,
                   sqrt(((count(*) - 1)
                         * (var_samp(y)
                            - covar_samp(x, y) * covar_samp(x, y)
                              / var_samp(x)) / (count(*) - 2))
                        / ((count(*) - 1) * var_samp(x))) AS se_analytic,
                   CAST(count(*) AS BIGINT) AS n
            FROM pu
        ),
        reps AS (SELECT range AS rep FROM range(0, {_BSE_REPS})),
        weighted AS (
            SELECT rep, x, y,
                   CASE
                     WHEN u < {_BSE_CDF[0]} THEN 0
                     WHEN u < {_BSE_CDF[1]} THEN 1
                     WHEN u < {_BSE_CDF[2]} THEN 2
                     WHEN u < {_BSE_CDF[3]} THEN 3
                     ELSE 4
                   END AS w
            FROM (
                SELECT rep, x, y,
                       CAST(('0x' || substring(
                            md5(CAST(user_id AS VARCHAR) || ':bse:' ||
                                CAST(rep AS VARCHAR)), 1, 12)) AS BIGINT)
                           / 281474976710656.0 AS u
                FROM pu CROSS JOIN reps
            )
        ),
        rep_slopes AS (
            SELECT rep,
                   (sum(w * x * y) - sum(w * x) * sum(w * y) / sum(w))
                   / (sum(w * x * x) - sum(w * x) * sum(w * x) / sum(w))
                       AS slope_b
            FROM weighted GROUP BY rep
        )
        SELECT a.n AS n_users,
               CAST({_BSE_REPS} AS BIGINT) AS n_replicas,
               round(a.slope, 6) AS slope,
               round(a.se_analytic, 6) AS se_analytic,
               round(stddev_samp(r.slope_b), 6) AS se_bootstrap,
               round(stddev_samp(r.slope_b) / a.se_analytic, 4) AS se_ratio
        FROM rep_slopes r CROSS JOIN analytic a
        GROUP BY a.n, a.slope, a.se_analytic
    """,
    doc="Poisson-bootstrap standard error of a regression slope vs the "
    "analytic OLS SE, on the per-user activity->purchases fit: each "
    "user draws a deterministic hash-Poisson(1) weight per replica "
    "(sample-poisson-bootstrap's shardable scheme) and the weighted "
    "slope recomputes from weighted moments — no resampling shuffle, "
    "no model library. se_ratio far from 1 flags "
    "heteroscedasticity/leverage that the homoscedastic analytic "
    "formula (ml-ols-inference's) misses — the cheap robustness "
    "check before trusting reported SEs. One fact pass builds the "
    "user rollup; the 12x fan-out happens on the TWO-COLUMN rollup, "
    "and each replica is one weighted-moment partial aggregate.",
    tags=("ml", "stats"),
)
def ml_bootstrap_slope_se(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    pu = (
        ev.groupBy("user_id")
        .agg(
            F.sum(
                F.when(F.col("event_type") != "purchase", 1).otherwise(0)
            ).alias("npc"),
            F.sum(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            )
            .cast("double")
            .alias("y"),
        )
        .filter(F.col("npc") > 0)
        .select(
            "user_id",
            F.log(1 + F.col("npc").cast("double")).alias("x"),
            "y",
        )
    )
    analytic = pu.agg(
        F.regr_slope("y", "x").alias("slope"),
        F.sqrt(
            (
                (F.count("*") - 1)
                * (
                    F.var_samp("y")
                    - F.covar_samp("x", "y")
                    * F.covar_samp("x", "y")
                    / F.var_samp("x")
                )
                / (F.count("*") - 2)
            )
            / ((F.count("*") - 1) * F.var_samp("x"))
        ).alias("se_analytic"),
        F.count("*").cast("long").alias("n"),
    )
    reps = spark.range(_BSE_REPS).select(F.col("id").alias("rep"))
    u = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col("user_id").cast("string"),
                        F.lit(":bse:"),
                        F.col("rep").cast("string"),
                    )
                ),
                1,
                12,
            ),
            16,
            10,
        ).cast("long")
        / 281474976710656.0
    )
    w = (
        F.when(u < _BSE_CDF[0], 0)
        .when(u < _BSE_CDF[1], 1)
        .when(u < _BSE_CDF[2], 2)
        .when(u < _BSE_CDF[3], 3)
        .otherwise(4)
        .cast("double")
    )
    weighted = pu.crossJoin(F.broadcast(reps)).select(
        "rep", "x", "y", w.alias("w")
    )
    wc = F.col("w")
    rep_slopes = weighted.groupBy("rep").agg(
        (
            (
                F.sum(wc * F.col("x") * F.col("y"))
                - F.sum(wc * F.col("x")) * F.sum(wc * F.col("y")) / F.sum(wc)
            )
            / (
                F.sum(wc * F.col("x") * F.col("x"))
                - F.sum(wc * F.col("x")) * F.sum(wc * F.col("x")) / F.sum(wc)
            )
        ).alias("slope_b")
    )
    return (
        rep_slopes.crossJoin(F.broadcast(analytic))
        .groupBy("n", "slope", "se_analytic")
        .agg(F.stddev_samp("slope_b").alias("se_boot"))
        .select(
            F.col("n").alias("n_users"),
            F.lit(_BSE_REPS).cast("long").alias("n_replicas"),
            F.round("slope", 6).alias("slope"),
            F.round("se_analytic", 6).alias("se_analytic"),
            F.round("se_boot", 6).alias("se_bootstrap"),
            F.round(F.col("se_boot") / F.col("se_analytic"), 4).alias(
                "se_ratio"
            ),
        )
    )


@query(
    "stats-page-trend-test",
    oracle="""
        WITH cell AS (
            SELECT CAST(ts AS DATE) AS day,
                   CAST(floor(extract(hour FROM ts) / 6) AS INT) AS q,
                   avg(value) AS m
            FROM events GROUP BY 1, 2
        ),
        complete AS (
            SELECT day FROM cell GROUP BY day HAVING count(*) = 4
        ),
        ranked AS (
            SELECT c.day, c.q,
                   CAST(rank() OVER (PARTITION BY c.day ORDER BY c.m)
                        AS DOUBLE) AS r
            FROM cell c JOIN complete x ON c.day = x.day
        ),
        rsums AS (
            SELECT q, sum(r) AS rj, CAST(count(*) AS DOUBLE) AS b
            FROM ranked GROUP BY q
        ),
        l AS (
            SELECT sum((q + 1) * rj) AS big_l, max(b) AS b,
                   CAST(count(*) AS DOUBLE) AS k
            FROM rsums
        )
        SELECT CAST(b AS BIGINT) AS n_blocks,
               CAST(k AS BIGINT) AS k_treatments,
               round(big_l, 4) AS page_l,
               round(b * k * (k + 1) * (k + 1) / 4.0, 4) AS expected_l,
               round((12 * big_l - 3 * b * k * (k + 1) * (k + 1))
                     / sqrt(b * k * k * (k + 1) * (k * k - 1)), 4)
                   AS page_z
        FROM l
    """,
    doc="Page's trend test for an ORDERED alternative across repeated "
    "measures: with days as blocks and the four hour-of-day "
    "quadrants as ordered treatments, L = sum_j j*R_j concentrates "
    "power on the monotone hypothesis 'value rises through the day' "
    "— the Friedman test (stats-friedman-test, same block-rank "
    "machinery) spreads power over ALL departures and misses "
    "monotone dose-response patterns this catches; z from the exact "
    "null moments E[L] = bk(k+1)^2/4. Within-day ranking is a 4-row "
    "partitioned window over the calendar-bounded day x quadrant "
    "grid — block count scales with days, never event volume.",
    tags=("stats", "timeseries"),
)
def stats_page_trend_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    cell = ev.groupBy(
        F.to_date("ts").alias("day"),
        F.floor(F.hour("ts") / 6).cast("int").alias("q"),
    ).agg(F.avg("value").alias("m"))
    complete = (
        cell.groupBy("day")
        .agg(F.count("*").alias("kq"))
        .filter(F.col("kq") == 4)
        .select("day")
    )
    ranked = cell.join(complete, "day").select(
        "q",
        F.rank()
        .over(Window.partitionBy("day").orderBy("m"))
        .cast("double")
        .alias("r"),
    )
    rsums = ranked.groupBy("q").agg(
        F.sum("r").alias("rj"), F.count("*").cast("double").alias("b")
    )
    l = rsums.agg(
        F.sum((F.col("q") + 1) * F.col("rj")).alias("big_l"),
        F.max("b").alias("b"),
        F.count("*").cast("double").alias("k"),
    )
    b, k, big_l = F.col("b"), F.col("k"), F.col("big_l")
    return l.select(
        b.cast("long").alias("n_blocks"),
        k.cast("long").alias("k_treatments"),
        F.round(big_l, 4).alias("page_l"),
        F.round(b * k * (k + 1) * (k + 1) / 4.0, 4).alias("expected_l"),
        F.round(
            (12 * big_l - 3 * b * k * (k + 1) * (k + 1))
            / F.sqrt(b * k * k * (k + 1) * (k * k - 1)),
            4,
        ).alias("page_z"),
    )


@query(
    "timeseries-sen-slope-seasonal",
    oracle="""
        WITH daily AS (
            SELECT CAST(ts AS DATE) AS d, CAST(count(*) AS DOUBLE) AS y
            FROM events GROUP BY 1
        ),
        keyed AS (
            SELECT dayofweek(d) AS dow,
                   CAST(date_diff('day', (SELECT min(d) FROM daily), d)
                        AS DOUBLE) AS t,
                   y
            FROM daily
        ),
        slopes AS (
            SELECT (b.y - a.y) / (b.t - a.t) AS m
            FROM keyed a JOIN keyed b
              ON a.dow = b.dow AND a.t < b.t
        )
        SELECT CAST(count(*) AS BIGINT) AS n_pairs,
               round(quantile_cont(m, 0.5), 6) AS sen_slope_per_day,
               round(quantile_cont(m, 0.05), 6) AS slope_p05,
               round(quantile_cont(m, 0.95), 6) AS slope_p95
        FROM slopes
    """,
    doc="Seasonal Sen's slope — the ESTIMATOR paired with "
    "timeseries-seasonal-mann-kendall's test: the median of pairwise "
    "slopes (y_j - y_i)/(t_j - t_i) computed only between SAME-"
    "weekday days, so the weekly cycle contributes no spurious "
    "pairs; p05/p95 of the slope distribution give a nonparametric "
    "band. Sen's median slope has a 29%% breakdown point where the "
    "OLS trend (timeseries-cochrane-orcutt's first stage) is wrecked "
    "by one outlier day. Pair join is within-season over the "
    "calendar-bounded day summary — quadratic in WEEKS only; the "
    "median runs on that bounded pair set (exact quantile, Spark "
    "percentile == DuckDB quantile_cont).",
    tags=("timeseries", "stats"),
)
def timeseries_sen_slope_seasonal(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("d")).agg(
        F.count("*").cast("double").alias("y")
    )
    d0 = daily.agg(F.min("d").alias("d0"))
    keyed = daily.crossJoin(F.broadcast(d0)).select(
        F.dayofweek("d").alias("dow"),
        F.datediff("d", "d0").cast("double").alias("t"),
        "y",
    )
    a = keyed.select(
        F.col("dow").alias("a_dow"), F.col("t").alias("a_t"),
        F.col("y").alias("a_y"),
    )
    b = keyed.select(
        F.col("dow").alias("b_dow"), F.col("t").alias("b_t"),
        F.col("y").alias("b_y"),
    )
    slopes = a.join(
        b,
        (F.col("a_dow") == F.col("b_dow")) & (F.col("a_t") < F.col("b_t")),
    ).select(
        ((F.col("b_y") - F.col("a_y")) / (F.col("b_t") - F.col("a_t"))).alias(
            "m"
        )
    )
    return slopes.agg(
        F.count("*").cast("long").alias("n_pairs"),
        F.round(F.expr("percentile(m, 0.5)"), 6).alias(
            "sen_slope_per_day"
        ),
        F.round(F.expr("percentile(m, 0.05)"), 6).alias("slope_p05"),
        F.round(F.expr("percentile(m, 0.95)"), 6).alias("slope_p95"),
    )


_CS_SALT = ":calib-slope-r5"


@query(
    "ml-calibration-slope",
    oracle=f"""
        WITH tagged AS (
            SELECT CAST(extract(hour FROM ts) AS INT) AS h,
                   CASE WHEN event_type = 'purchase' THEN 1.0 ELSE 0.0 END
                       AS o,
                   ({sql_string_hash("CAST(event_id AS VARCHAR) || '" + _CS_SALT + "'")}) % 5
                       AS slot
            FROM events
        ),
        rates AS (
            SELECT h, avg(o) AS p FROM tagged WHERE slot < 4 GROUP BY h
        ),
        bins AS (
            SELECT r.p, CAST(count(*) AS DOUBLE) AS n_k, avg(t.o) AS obar
            FROM tagged t JOIN rates r ON t.h = r.h
            WHERE t.slot >= 4
            GROUP BY r.p
        ),
        lg AS (
            SELECT n_k,
                   ln(p / (1 - p)) AS x,
                   ln((obar * n_k + 0.5) / ((1 - obar) * n_k + 0.5)) AS z
            FROM bins WHERE p > 0 AND p < 1
        ),
        m AS (
            SELECT sum(n_k) AS sw,
                   sum(n_k * x) / sum(n_k) AS mx,
                   sum(n_k * z) / sum(n_k) AS mz,
                   CAST(count(*) AS BIGINT) AS n_bins
            FROM lg
        )
        SELECT m.n_bins,
               CAST(m.sw AS BIGINT) AS n_test,
               round(sum(n_k * (x - mx) * (z - mz))
                     / sum(n_k * (x - mx) * (x - mx)), 6)
                   AS calibration_slope,
               round(mz - sum(n_k * (x - mx) * (z - mz))
                          / sum(n_k * (x - mx) * (x - mx)) * mx, 6)
                   AS calibration_intercept
        FROM lg CROSS JOIN m
        GROUP BY m.n_bins, m.sw, m.mx, m.mz
    """,
    doc="Cox calibration slope and intercept on the logit scale: "
    "regress the empirical log-odds per forecast bin (Haldane +0.5 "
    "smoothed) on the forecast log-odds, weighted by bin size — "
    "slope 1 / intercept 0 is perfect calibration, slope < 1 is the "
    "overconfidence signature (forecasts too extreme), intercept "
    "absorbs base-rate drift between fit and test splits. The "
    "regression READ-OUT that eval-brier-decomposition's scalar "
    "reliability cannot give (it says HOW MUCH miscalibration, this "
    "says WHICH DIRECTION and the recalibration map to apply: "
    "p' = sigmoid(a + b*logit(p))). Same hour-rate forecaster and "
    "hash split as the Brier op; weighted closed-form WLS over the "
    "<=24-bin summary.",
    tags=("ml", "eval"),
)
def ml_calibration_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    tagged = ev.select(
        F.hour("ts").cast("int").alias("h"),
        F.when(F.col("event_type") == "purchase", 1.0)
        .otherwise(0.0)
        .alias("o"),
        (
            string_hash(
                F.concat(F.col("event_id").cast("string"), F.lit(_CS_SALT))
            )
            % 5
        ).alias("slot"),
    )
    rates = (
        tagged.filter(F.col("slot") < 4)
        .groupBy("h")
        .agg(F.avg("o").alias("p"))
    )
    bins = (
        tagged.filter(F.col("slot") >= 4)
        .join(F.broadcast(rates), "h")
        .groupBy("p")
        .agg(
            F.count("*").cast("double").alias("n_k"),
            F.avg("o").alias("obar"),
        )
    )
    lg = bins.filter((F.col("p") > 0) & (F.col("p") < 1)).select(
        "n_k",
        F.log(F.col("p") / (1 - F.col("p"))).alias("x"),
        F.log(
            (F.col("obar") * F.col("n_k") + 0.5)
            / ((1 - F.col("obar")) * F.col("n_k") + 0.5)
        ).alias("z"),
    )
    m = lg.agg(
        F.sum("n_k").alias("sw"),
        (F.sum(F.col("n_k") * F.col("x")) / F.sum("n_k")).alias("mx"),
        (F.sum(F.col("n_k") * F.col("z")) / F.sum("n_k")).alias("mz"),
        F.count("*").cast("long").alias("n_bins"),
    )
    nk, x, z = F.col("n_k"), F.col("x"), F.col("z")
    mx, mz = F.col("mx"), F.col("mz")
    slope = F.sum(nk * (x - mx) * (z - mz)) / F.sum(nk * (x - mx) * (x - mx))
    return (
        lg.crossJoin(F.broadcast(m))
        .groupBy("n_bins", "sw", "mx", "mz")
        .agg(
            F.round(slope, 6).alias("calibration_slope"),
            F.round(F.max(mz) - slope * F.max(mx), 6).alias(
                "calibration_intercept"
            ),
        )
        .select(
            "n_bins",
            F.col("sw").cast("long").alias("n_test"),
            "calibration_slope",
            "calibration_intercept",
        )
    )


@query(
    "stats-jonckheere-terpstra",
    oracle="""
        WITH obs AS (
            SELECT CAST(floor(extract(hour FROM ts) / 6) AS INT) AS g,
                   round(value, 2) AS v
            FROM events
        ),
        cells AS (
            SELECT g, v, CAST(count(*) AS DOUBLE) AS c
            FROM obs GROUP BY g, v
        ),
        cum AS (
            SELECT g, v, c,
                   coalesce(sum(c) OVER (PARTITION BY g ORDER BY v
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                       AS below
            FROM cells
        ),
        u AS (
            SELECT sum(b.c * (a.below + 0.5 * a.c)) AS jt
            FROM cum a JOIN cells b ON a.v = b.v AND a.g < b.g
        ),
        sizes AS (
            SELECT sum(cnt) AS n,
                   sum(cnt * cnt) AS sn2,
                   sum(cnt * cnt * (2 * cnt + 3)) AS sn23
            FROM (SELECT g, CAST(count(*) AS DOUBLE) AS cnt
                  FROM obs GROUP BY g) t
        )
        SELECT CAST(s.n AS BIGINT) AS n_obs,
               round(u.jt, 4) AS jt_stat,
               round((s.n * s.n - s.sn2) / 4.0, 4) AS expected_jt,
               round((u.jt - (s.n * s.n - s.sn2) / 4.0)
                     / sqrt((s.n * s.n * (2 * s.n + 3) - s.sn23) / 72.0), 4)
                   AS jt_z
        FROM u CROSS JOIN sizes s
    """,
    doc="Jonckheere-Terpstra test for an ordered alternative across "
    "independent groups (hour-of-day quadrants on event value): "
    "JT = sum over ordered group pairs of the Mann-Whitney count "
    "#(a < b) + 0.5 #(ties), z from the no-tie null moments "
    "E = (N^2 - sum n_i^2)/4. Kruskal-Wallis (stats-kruskal-wallis) "
    "tests ANY group difference; JT concentrates power on the "
    "MONOTONE ordering — the independent-groups twin of "
    "stats-page-trend-test's blocked design. The pairwise count "
    "never touches row pairs: per-(group, rounded-value) counts, a "
    "per-group cumulative over the bounded value bins, and a "
    "bin-equi-join across the 6 ordered group pairs.",
    tags=("stats",),
)
def stats_jonckheere_terpstra(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    obs = ev.select(
        F.floor(F.hour("ts") / 6).cast("int").alias("g"),
        F.round("value", 2).alias("v"),
    )
    cells = obs.groupBy("g", "v").agg(
        F.count("*").cast("double").alias("c")
    )
    w = (
        Window.partitionBy("g")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = cells.select(
        "g",
        "v",
        "c",
        F.coalesce(F.sum("c").over(w), F.lit(0.0)).alias("below"),
    )
    a = cum.select(
        F.col("g").alias("a_g"), F.col("v").alias("a_v"),
        F.col("c").alias("a_c"), "below",
    )
    b = cells.select(
        F.col("g").alias("b_g"), F.col("v").alias("b_v"),
        F.col("c").alias("b_c"),
    )
    u = a.join(
        b, (F.col("a_v") == F.col("b_v")) & (F.col("a_g") < F.col("b_g"))
    ).agg(
        F.sum(
            F.col("b_c") * (F.col("below") + 0.5 * F.col("a_c"))
        ).alias("jt")
    )
    sizes = (
        obs.groupBy("g")
        .agg(F.count("*").cast("double").alias("cnt"))
        .agg(
            F.sum("cnt").alias("n"),
            F.sum(F.col("cnt") * F.col("cnt")).alias("sn2"),
            F.sum(
                F.col("cnt") * F.col("cnt") * (2 * F.col("cnt") + 3)
            ).alias("sn23"),
        )
    )
    n, sn2, sn23 = F.col("n"), F.col("sn2"), F.col("sn23")
    e_jt = (n * n - sn2) / 4.0
    var_jt = (n * n * (2 * n + 3) - sn23) / 72.0
    return u.crossJoin(F.broadcast(sizes)).select(
        n.cast("long").alias("n_obs"),
        F.round("jt", 4).alias("jt_stat"),
        F.round(e_jt, 4).alias("expected_jt"),
        F.round((F.col("jt") - e_jt) / F.sqrt(var_jt), 4).alias("jt_z"),
    )


_RS_REPS = 12
_RS_CDF = (0.367879, 0.735759, 0.919699, 0.981012)


@query(
    "eval-rank-stability-bootstrap",
    oracle=f"""
        WITH reps AS (SELECT range AS rep FROM range(0, {_RS_REPS})),
        weighted AS (
            SELECT rep, event_type, value,
                   CASE
                     WHEN u < {_RS_CDF[0]} THEN 0
                     WHEN u < {_RS_CDF[1]} THEN 1
                     WHEN u < {_RS_CDF[2]} THEN 2
                     WHEN u < {_RS_CDF[3]} THEN 3
                     ELSE 4
                   END AS w
            FROM (
                SELECT rep, event_type, value,
                       CAST(('0x' || substring(
                            md5(CAST(event_id AS VARCHAR) || ':rs:' ||
                                CAST(rep AS VARCHAR)), 1, 12)) AS BIGINT)
                           / 281474976710656.0 AS u
                FROM events CROSS JOIN reps
            )
        ),
        rep_means AS (
            SELECT rep, event_type,
                   sum(w * value) / sum(w) AS m
            FROM weighted GROUP BY rep, event_type
        ),
        rep_ranks AS (
            SELECT rep, event_type,
                   rank() OVER (PARTITION BY rep ORDER BY m DESC,
                                event_type) AS rk
            FROM rep_means
        )
        SELECT event_type,
               round(avg(CASE WHEN rk = 1 THEN 1.0 ELSE 0.0 END), 6)
                   AS p_rank1,
               round(avg(CAST(rk AS DOUBLE)), 6) AS mean_rank,
               CAST(min(rk) AS BIGINT) AS best_rank,
               CAST(max(rk) AS BIGINT) AS worst_rank
        FROM rep_ranks GROUP BY event_type ORDER BY event_type
    """,
    doc="Bootstrap ranking stability — is the leaderboard real?: each "
    "of 12 hash-Poisson replicas recomputes every event type's mean "
    "value and re-ranks; P(rank 1), mean rank, and the best-worst "
    "rank range per type quantify whether the observed winner "
    "survives resampling noise — the question a single point "
    "leaderboard (and every eval harness that reports one) leaves "
    "open, and the reason eval reports now ship rank-stability "
    "intervals. Same shardable deterministic-weight scheme as "
    "ml-bootstrap-slope-se; replica re-ranking is a 5-row window "
    "per replica. At 100 TB the fan-out multiplies the two-column "
    "projection, not the table.",
    tags=("eval", "stats"),
)
def eval_rank_stability_bootstrap(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    reps = spark.range(_RS_REPS).select(F.col("id").alias("rep"))
    u = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col("event_id").cast("string"),
                        F.lit(":rs:"),
                        F.col("rep").cast("string"),
                    )
                ),
                1,
                12,
            ),
            16,
            10,
        ).cast("long")
        / 281474976710656.0
    )
    w = (
        F.when(u < _RS_CDF[0], 0)
        .when(u < _RS_CDF[1], 1)
        .when(u < _RS_CDF[2], 2)
        .when(u < _RS_CDF[3], 3)
        .otherwise(4)
        .cast("double")
    )
    weighted = ev.crossJoin(F.broadcast(reps)).select(
        "rep", "event_type", "value", w.alias("w")
    )
    rep_means = weighted.groupBy("rep", "event_type").agg(
        (F.sum(F.col("w") * F.col("value")) / F.sum("w")).alias("m")
    )
    rk = F.rank().over(
        Window.partitionBy("rep").orderBy(
            F.col("m").desc(), "event_type"
        )
    )
    rep_ranks = rep_means.select("event_type", rk.alias("rk"))
    return (
        rep_ranks.groupBy("event_type")
        .agg(
            F.round(
                F.avg(F.when(F.col("rk") == 1, 1.0).otherwise(0.0)), 6
            ).alias("p_rank1"),
            F.round(F.avg(F.col("rk").cast("double")), 6).alias(
                "mean_rank"
            ),
            F.min("rk").cast("long").alias("best_rank"),
            F.max("rk").cast("long").alias("worst_rank"),
        )
        .orderBy("event_type")
    )
