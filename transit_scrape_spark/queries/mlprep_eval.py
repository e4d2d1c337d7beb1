"""Model-evaluation ops: ranking metrics, AUC/DeLong, calibration,
Brier decomposition, bootstrap stability. Split from mlprep.py
in round 6. Same @query/oracle discipline."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from transit_scrape_spark.operators.dedup import sql_string_hash, string_hash
from transit_scrape_spark.queries.registry import query
from transit_scrape_spark.session import cache_width
from transit_scrape_spark.sources.tables import load_table


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
    # persist the token stream (tf / dl / qterms all aggregate it) and
    # the tf relation (the df count and the scoring join both consume
    # it) — unpersisted the regexp tokenization + explode re-planned per
    # consumer (5 documents scans / 24 Exchanges in the r11 before-plan).
    tok = d.select(
        "doc_id",
        F.explode(
            F.regexp_extract_all(F.lower("text"), F.lit("[a-z]+"), F.lit(0))
        ).alias("token"),
    ).persist()
    tf = tok.groupBy("doc_id", "token").agg(
        F.count("*").cast("double").alias("tf")
    ).persist()
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
    # persist the k(k-1)/2-row pair summary: directed/wins/p1/p2 each
    # reference it several times, and uncached every reference re-runs
    # the events scan + daily rollup + day self-join (48 fact scans in
    # the executed plan — the rfm-class fan-out; at 100 TB that is 48x
    # the IO). Locally the cache barrier costs ~1s of serialization,
    # the same local-vs-scale trade window-session-concurrency made in
    # r5. release_caches() drops it after materialization.
    pair = games.groupBy("i", "j").agg(
        F.count("*").cast("double").alias("nij"),
        F.sum("wi").cast("double").alias("wi"),
    ).persist()
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
    # persist the salted projection (train rates + test slice both read
    # it) and the scored test rows (bins + tot both aggregate them) —
    # unpersisted the per-event md5 + join re-planned per consumer
    # (4 events scans / 16 Exchanges in the r11 before-plan).
    tagged = tagged.persist()
    rates = (
        tagged.filter(F.col("slot") < 4)
        .groupBy("h")
        .agg(F.avg("o").alias("p"))
    )
    te = (
        tagged.filter(F.col("slot") >= 4)
        .join(F.broadcast(rates), "h")
        .select("o", "p")
        .persist()
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
    "eval-auc-delong-ci",
    oracle="""
        WITH scored AS (
            SELECT round(value, 2) AS s,
                   CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
            FROM events WHERE value IS NOT NULL
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

    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
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
    # persist the tagged event projection (train pass + test pass both
    # consume it) and, below, the <=24-row bin summary (the WLS moment
    # pass and the final slope pass both consume THAT, replaying the
    # whole rate/bin chain). r11 tried this pair at the static
    # 32-partition cache width and reverted (+43%); the cached shapes
    # now size to the data (session.cache_width for the event-width
    # relation, one partition for the bounded bin summary).
    tagged = tagged.coalesce(cache_width(spark)).persist()
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
    ).coalesce(1).persist()  # <= 24 forecast bins at any scale
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
