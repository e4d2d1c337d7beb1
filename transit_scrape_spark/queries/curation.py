"""Corpus-curation operators: reproducible sampling/splits and
benchmark decontamination — training-data-pipeline staples that must be
deterministic at 100 TB (no rand(): hash-based assignment is stable
across reruns, partitionings, and engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from transit_scrape_spark.operators.dedup import (
    shingle_hash_rows,
    sql_shingle_hashes,
    string_hash,
    sql_string_hash,
)
from transit_scrape_spark.queries.registry import query
from transit_scrape_spark.sources.tables import load_table


@query(
    "sample-hash-split",
    oracle=f"""
        WITH assigned AS (
            SELECT doc_id, lang,
                   ({sql_string_hash("CAST(doc_id AS VARCHAR) || ':split-salt-r1'")}) % 10
                       AS slot
            FROM documents
        )
        SELECT lang,
               CASE WHEN slot < 8 THEN 'train' WHEN slot = 8 THEN 'val' ELSE 'test' END
                   AS split,
               count(*) AS n_docs
        FROM assigned
        GROUP BY 1, 2
    """,
    doc="Deterministic 80/10/10 train/val/test split: md5-hash of "
    "(id, salt) mod 10 — reproducible across reruns/engines/cluster "
    "sizes (rand()-based sampling is not), stratification visible per "
    "language. The same mechanism does p%% sampling at any scale "
    "without a shuffle.",
)
def sample_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    slot = string_hash(
        F.concat(F.col("doc_id").cast("string"), F.lit(":split-salt-r1"))
    ) % 10
    split = (
        F.when(slot < 8, "train").when(slot == 8, "val").otherwise("test")
    )
    return d.groupBy("lang", split.alias("split")).agg(F.count("*").alias("n_docs"))


@query(
    "dedup-decontaminate",
    oracle=f"""
        WITH hashed AS (
            SELECT doc_id, {sql_shingle_hashes('text')} AS sh FROM documents
        ),
        bench AS (
            SELECT DISTINCT unnest(sh) AS s FROM hashed WHERE doc_id % 97 = 0
        ),
        contaminated AS (
            SELECT DISTINCT doc_id
            FROM (SELECT doc_id, unnest(sh) AS s FROM hashed WHERE doc_id % 97 <> 0) t
            WHERE s IN (SELECT s FROM bench)
        )
        SELECT d.lang,
               CAST(count(*) AS BIGINT) AS n_candidates,
               CAST(sum(CASE WHEN c.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_removed,
               CAST(sum(CASE WHEN c.doc_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_clean
        FROM documents d LEFT JOIN contaminated c ON d.doc_id = c.doc_id
        WHERE d.doc_id % 97 <> 0
        GROUP BY d.lang
    """,
    doc="Benchmark decontamination: drop training documents sharing any "
    "3-token shingle with the held-out set (doc_id %% 97 == 0 plays the "
    "benchmark). Bench shingles form a (broadcastable) probe set; "
    "contamination detection is a semi-join on shingle hash — shuffles "
    "8-byte hashes, never text. Per-language removal report.",
)
def dedup_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    # persist the shingle rows: the benchmark shingle universe AND the
    # contamination probe both consume them — unpersisted the explode
    # re-planned per consumer (3 documents scans in the r11 before-plan)
    hashed = shingle_hash_rows(d.select("doc_id", "text")).persist()
    bench_sh = hashed.filter(F.col("doc_id") % 97 == 0).select("sh").distinct()
    contaminated = (
        hashed.filter(F.col("doc_id") % 97 != 0)
        .join(F.broadcast(bench_sh), "sh", "left_semi")
        .select("doc_id")
        .distinct()
        .withColumn("_dirty", F.lit(1))
    )
    cand = d.filter(F.col("doc_id") % 97 != 0).join(contaminated, "doc_id", "left")
    return cand.groupBy("lang").agg(
        F.count("*").alias("n_candidates"),
        F.sum(F.when(F.col("_dirty").isNotNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_removed"),
        F.sum(F.when(F.col("_dirty").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_clean"),
    )


def _multiprobe_oracle() -> str:
    from transit_scrape_spark.queries.advanced import _sql_bucket

    return _MULTIPROBE_TEMPLATE.format(bucket=_sql_bucket("CAST(embedding AS DOUBLE[])"))


_MULTIPROBE_TEMPLATE = """
        WITH tagged AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, {bucket} AS bucket
            FROM embeddings WHERE embedding IS NOT NULL
        ), q AS (SELECT v AS qv, bucket AS qbucket FROM tagged WHERE vec_id = 1),
        probes AS (
            SELECT xor((SELECT qbucket FROM q), p.f) AS pb
            FROM (VALUES (0), (1), (2), (4), (8), (16), (32), (64), (128)) p(f)
        )
        SELECT vec_id,
               round(list_dot_product(v, (SELECT qv FROM q))
                     / (sqrt(list_dot_product(v, v))
                        * sqrt(list_dot_product((SELECT qv FROM q), (SELECT qv FROM q)))), 6) AS sim
        FROM tagged
        WHERE bucket IN (SELECT pb FROM probes) AND vec_id <> 1
        ORDER BY sim DESC, vec_id
        LIMIT 5
    """


@query(
    "simsearch-lsh-multiprobe",
    oracle=_multiprobe_oracle(),
    doc="Multi-probe LSH ANN: probe the query bucket plus all 8 one-bit "
    "neighbor buckets (the planes whose sign the query was closest to "
    "flipping) — ~9/256 of the data for substantially better recall "
    "than single-probe; still partition-prunable.",
)
def simsearch_lsh_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    from transit_scrape_spark.functions.vectors import as_double, cosine
    from transit_scrape_spark.queries.advanced import N_PLANES, lsh_bucket

    e = load_table(spark, sf_dir, "embeddings").filter(F.col("embedding").isNotNull())
    tagged = e.select(
        "vec_id",
        as_double(F.col("embedding")).alias("v"),
        lsh_bucket(as_double(F.col("embedding"))).alias("bucket"),
    )
    qrows = tagged.filter(F.col("vec_id") == 1).select("v", "bucket").collect()
    if not qrows:  # no query vector (empty corpus): empty result, total op
        return tagged.select(
            "vec_id", F.lit(0.0).alias("sim")
        ).filter(F.lit(False))
    qrow = qrows[0]
    probes = [qrow["bucket"]] + [qrow["bucket"] ^ (1 << k) for k in range(N_PLANES)]
    qv = F.array(*[F.lit(x) for x in qrow["v"]])
    return (
        tagged.filter(F.col("bucket").isin(probes) & (F.col("vec_id") != 1))
        .select("vec_id", F.round(cosine(F.col("v"), qv), 6).alias("sim"))
        .orderBy(F.col("sim").desc(), F.col("vec_id"))
        .limit(5)
    )


@query(
    "sample-stratified",
    oracle="""
        WITH ranked AS (
            SELECT doc_id, lang,
                   row_number() OVER (PARTITION BY lang
                                      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
                       AS rn,
                   count(*) OVER (PARTITION BY lang) AS n_lang
            FROM documents
        )
        SELECT doc_id, lang
        FROM ranked
        WHERE rn <= ceil(0.2 * n_lang)
    """,
    doc="Stratified sampling for train/eval splits: exactly ceil(20%) of "
    "each language stratum, selected by ranking on a deterministic "
    "content hash (md5 of the id) so the sample is reproducible across "
    "runs and engines — no RNG, no seed drift. One shuffle on the "
    "stratum key; per-stratum sort only (no global order). The "
    "hash-rank trick is the scalable exact-fraction sampler: "
    "sample-hash-split gives approximate fractions, this gives exact "
    "per-stratum counts.",
)
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    d = load_table(spark, sf_dir, "documents")
    w_rank = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    w_cnt = Window.partitionBy("lang")
    return (
        d.select(
            "doc_id",
            "lang",
            F.row_number().over(w_rank).alias("rn"),
            F.count("*").over(w_cnt).alias("n_lang"),
        )
        .filter(F.col("rn") <= F.ceil(0.2 * F.col("n_lang")))
        .select("doc_id", "lang")
    )


@query(
    "dedup-url-normalize",
    oracle="""
        WITH raw AS (
            SELECT doc_id,
                   'HTTPS://WWW.' || source || '.example.com/sec' ||
                   CAST(doc_id % 7 AS VARCHAR) || '/page' ||
                   CASE WHEN doc_id % 5 = 0 THEN '/' ELSE '' END ||
                   '?utm_campaign=x&ref=' || CAST(doc_id % 3 AS VARCHAR) ||
                   CASE WHEN doc_id % 2 = 0 THEN '#frag' ELSE '' END AS url
            FROM documents
        ),
        canon AS (
            SELECT doc_id,
                   regexp_replace(
                       regexp_replace(
                           regexp_replace(
                               regexp_replace(lower(url), '#.*$', ''),
                               '\\?.*$', ''),
                           '^https?://www\\.', 'https://'),
                       '/$', '') AS canonical_url
            FROM raw
        )
        SELECT canonical_url,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(min(doc_id) AS BIGINT) AS keep_doc_id
        FROM canon
        GROUP BY canonical_url
    """,
    doc="URL canonicalization dedup — the crawl-pipeline step before "
    "any content dedup: case-fold, strip fragment, strip (all-tracking) "
    "query string, fold www., trim trailing slash; duplicates collapse "
    "on the canonical URL with the min-doc_id survivor. Pure codegen "
    "string expressions; one groupBy shuffle on the canonical key. "
    "(Messy URLs are synthesized deterministically from doc_id/source "
    "so both engines canonicalize the identical input.)",
)
def dedup_url_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("HTTPS://WWW."),
        F.col("source"),
        F.lit(".example.com/sec"),
        (F.col("doc_id") % 7).cast("string"),
        F.lit("/page"),
        F.when(F.col("doc_id") % 5 == 0, "/").otherwise(""),
        F.lit("?utm_campaign=x&ref="),
        (F.col("doc_id") % 3).cast("string"),
        F.when(F.col("doc_id") % 2 == 0, "#frag").otherwise(""),
    )
    canon = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(
                F.regexp_replace(F.lower(url), "#.*$", ""), r"\?.*$", ""
            ),
            r"^https?://www\.",
            "https://",
        ),
        "/$",
        "",
    )
    return (
        d.select("doc_id", canon.alias("canonical_url"))
        .groupBy("canonical_url")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.min("doc_id").cast("long").alias("keep_doc_id"),
        )
    )


@query(
    "dedup-paragraph-exact",
    oracle="""
        WITH toks AS (
            SELECT doc_id, string_split(text, ' ') AS t FROM documents
        ),
        chunks AS (
            SELECT doc_id, g.i AS chunk_idx,
                   array_to_string(list_slice(t, 10 * g.i + 1, 10 * g.i + 10),
                                   ' ') AS chunk
            FROM toks,
                 UNNEST(generate_series(0,
                     CAST(floor(len(t) / 10) AS INT) - 1)) AS g(i)
        ),
        ranked AS (
            SELECT doc_id, chunk_idx,
                   row_number() OVER (PARTITION BY chunk
                                      ORDER BY doc_id, chunk_idx) AS rn
            FROM chunks
        )
        SELECT CAST(doc_id AS BIGINT) AS doc_id,
               CAST(count(*) AS BIGINT) AS n_chunks,
               CAST(sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_dup_chunks
        FROM ranked
        GROUP BY doc_id
    """,
    doc="Paragraph-level exact dedup (the C4/Gopher within-corpus "
    "repetition pass, scaled down to fixed 10-token chunks since the "
    "fixture text has no paragraph breaks): every chunk is ranked by "
    "first occurrence (doc_id, position) corpus-wide and later "
    "occurrences count as duplicates. One window shuffle on the chunk "
    "text, one groupBy back to docs. At 100 TB hash the chunk to a "
    "64-bit key before the shuffle so boilerplate paragraphs move 8 "
    "bytes, not text.",
)
def dedup_paragraph_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    # token array materialized as its own column: referenced inline in
    # the lambda body below, the split(text) subtree re-evaluates per
    # chunk access (the dedup-span-coverage lesson, r10)
    toks = F.col("toks")
    nc = F.floor(F.size(toks) / 10).cast("int")
    # sequence(0, -1) REVERSES instead of returning empty — guard docs
    # shorter than one chunk
    chunks = F.when(
        nc >= 1,
        F.transform(
            F.sequence(F.lit(0), nc - 1),
            lambda i: F.concat_ws(" ", F.slice(toks, i * 10 + 1, 10)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    exploded = d.withColumn("toks", F.split("text", " ")).select(
        "doc_id", F.posexplode(chunks).alias("chunk_idx", "chunk")
    )
    w = Window.partitionBy("chunk").orderBy("doc_id", "chunk_idx")
    ranked = exploded.withColumn("rn", F.row_number().over(w))
    return (
        ranked.groupBy(F.col("doc_id").cast("long").alias("doc_id"))
        .agg(
            F.count("*").cast("long").alias("n_chunks"),
            F.sum(F.when(F.col("rn") > 1, 1).otherwise(0))
            .cast("long")
            .alias("n_dup_chunks"),
        )
    )


@query(
    "text-chunk-overlap",
    oracle="""
        WITH t AS (
            SELECT doc_id, string_split(text, ' ') AS toks FROM documents
        ),
        s AS (
            SELECT doc_id, toks,
                   unnest(range(0, len(toks), 16)) AS start
            FROM t
        )
        SELECT doc_id,
               CAST(start / 16 AS BIGINT) AS chunk_id,
               CAST(len(list_slice(toks, start + 1, start + 32)) AS BIGINT)
                   AS n_chunk_tokens,
               array_to_string(list_slice(toks, start + 1, start + 32), ' ')
                   AS chunk_text
        FROM s
    """,
    doc="Sliding-window document chunking (32-token chunks, stride 16, "
    "50%% overlap) — the context-window packing step of an LLM training "
    "pipeline. Pure codegen: sequence() generates the start offsets, "
    "explode fans out, slice+concat_ws materializes each chunk. "
    "Embarrassingly parallel (no shuffle at all — a narrow map over the "
    "corpus scan), so it scales linearly with input bytes; chunk "
    "output feeds straight into the tokenize/pack stage.",
)
def text_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    # fixture text is never empty -> size >= 1, so sequence(0, n-1, 16)
    # is always non-empty and ascending (the sequence(0,-1) reversal
    # hazard documented at dedup-paragraph-exact cannot trigger)
    starts = F.sequence(F.lit(0), F.size(toks) - 1, F.lit(16))
    chunked = d.select(
        "doc_id", toks.alias("toks"), F.explode(starts).alias("start")
    )
    chunk = F.slice(F.col("toks"), F.col("start") + 1, 32)
    return chunked.select(
        "doc_id",
        (F.col("start") / 16).cast("long").alias("chunk_id"),
        F.size(chunk).cast("long").alias("n_chunk_tokens"),
        F.concat_ws(" ", chunk).alias("chunk_text"),
    )


@query(
    "dedup-fuzzy-levenshtein",
    oracle="""
        WITH pre AS (
            SELECT doc_id, lang,
                   CAST(floor(n_chars / 16) AS BIGINT) AS sz_bucket,
                   substr(text, 1, 32) AS prefix
            FROM documents
        ),
        pairs AS (
            SELECT a.lang, levenshtein(a.prefix, b.prefix) AS dist
            FROM pre a JOIN pre b
              ON a.lang = b.lang AND a.sz_bucket = b.sz_bucket
             AND a.doc_id < b.doc_id
        )
        SELECT lang,
               CAST(count(*) AS BIGINT) AS n_pairs,
               CAST(sum(CASE WHEN dist <= 8 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_near,
               CAST(min(dist) AS BIGINT) AS min_dist
        FROM pairs
        GROUP BY lang
    """,
    doc="Fuzzy (edit-distance) near-dup detection with size blocking: "
    "candidate pairs only within (lang, n_chars/16) buckets — an "
    "equi-join shuffle, never an all-pairs cross join (true dups have "
    "near-equal lengths, so same-or-adjacent buckets catch them) — "
    "then exact levenshtein on 32-char prefixes as the verifier. The "
    "classic record-linkage blocking shape: at 100 TB the bucket key "
    "caps each join group, and the O(len^2) DP runs on bounded "
    "prefixes, keeping per-pair cost constant — per-pair cost is the "
    "knob (32-char prefixes are 4x cheaper than 64), bucket width is "
    "the pair-count knob; tighten both before reaching for "
    "approximation.",
)
def dedup_fuzzy_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    pre = d.select(
        "doc_id",
        "lang",
        F.floor(F.col("n_chars") / 16).cast("long").alias("sz_bucket"),
        F.substring("text", 1, 32).alias("prefix"),
    )
    a, b = pre.alias("a"), pre.alias("b")
    pairs = a.join(
        b,
        (F.col("a.lang") == F.col("b.lang"))
        & (F.col("a.sz_bucket") == F.col("b.sz_bucket"))
        & (F.col("a.doc_id") < F.col("b.doc_id")),
    ).select(
        F.col("a.lang").alias("lang"),
        F.levenshtein(F.col("a.prefix"), F.col("b.prefix")).alias("dist"),
    )
    return pairs.groupBy("lang").agg(
        F.count("*").cast("long").alias("n_pairs"),
        F.sum(F.when(F.col("dist") <= 8, 1).otherwise(0))
        .cast("long")
        .alias("n_near"),
        F.min("dist").cast("long").alias("min_dist"),
    )


@query(
    "corpus-resample-mix",
    oracle=f"""
        WITH keyed AS (
            SELECT lang,
                   ({sql_string_hash("CAST(doc_id AS VARCHAR) || ':mix-salt'")}) % 100
                       AS slot
            FROM documents
        ),
        kept AS (
            SELECT lang FROM keyed
            WHERE slot < (CASE lang WHEN 'en' THEN 35 ELSE 90 END)
        )
        SELECT k.lang,
               CAST(count(*) AS BIGINT) AS n_before,
               CAST((SELECT count(*) FROM kept
                     WHERE kept.lang IS NOT DISTINCT FROM k.lang) AS BIGINT)
                   AS n_after
        FROM keyed k
        GROUP BY k.lang
    """,
    doc="Language-mix resampling: per-language keep probabilities "
    "(down-weight the dominant 'en' to 35%%, keep the tail at 90%%) "
    "applied via salted doc-id hash — the data-mixing step every "
    "multilingual training pipeline runs, and it must be "
    "DETERMINISTIC (rand() sampling changes the corpus on every "
    "rerun/retry; hash sampling is a pure function of the id, so "
    "reruns, partial failures, and engines all agree). A single "
    "codegen'd filter, no shuffle until the audit counts; the same "
    "mechanism implements temperature-based mixture weights by "
    "adjusting per-group thresholds.",
)
def corpus_resample_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    slot = string_hash(
        F.concat(F.col("doc_id").cast("string"), F.lit(":mix-salt"))
    ) % 100
    keep_threshold = F.when(F.col("lang") == "en", 35).otherwise(90)
    keyed = d.select("lang", slot.alias("slot"), keep_threshold.alias("thr"))
    return keyed.groupBy("lang").agg(
        F.count("*").alias("n_before"),
        F.sum(F.when(F.col("slot") < F.col("thr"), 1).otherwise(0))
        .cast("long")
        .alias("n_after"),
    )


@query(
    "corpus-pack-sequences",
    oracle="""
        WITH toks AS (
            SELECT doc_id, lang,
                   CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
            FROM documents
        ),
        cum AS (
            SELECT doc_id, lang, n_tokens,
                   sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id) - n_tokens
                       AS offset_tokens
            FROM toks
        ),
        packed AS (
            SELECT lang, offset_tokens // 512 AS pack_id, n_tokens
            FROM cum
        )
        SELECT lang, CAST(pack_id AS BIGINT) AS pack_id,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(n_tokens) AS BIGINT) AS pack_tokens
        FROM packed
        GROUP BY lang, pack_id
    """,
    doc="Sequence packing for training (per-language 512-token packs): "
    "a deterministic-order running token total assigns each document "
    "to pack floor(offset/512) — offset-based packing instead of "
    "greedy bin packing, because greedy is inherently sequential "
    "while the cumulative sum is ONE window per language (documents "
    "stay in their lang partition; at 100 TB sub-partition the window "
    "key by doc_id range and offset the partial sums, exactly the "
    "derive-surrogate-key construction). Packs overflow their budget "
    "by at most one document — the slack the packer's attention-mask "
    "boundary handles anyway.",
)
def corpus_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", "lang", F.size(F.split("text", " ")).cast("long").alias("n_tokens")
    )
    w = Window.partitionBy("lang").orderBy("doc_id")
    cum = toks.withColumn(
        "offset_tokens", F.sum("n_tokens").over(w) - F.col("n_tokens")
    )
    packed = cum.select(
        "lang",
        F.floor(F.col("offset_tokens") / 512).alias("pack_id"),
        "n_tokens",
    )
    return packed.groupBy("lang", "pack_id").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("pack_tokens"),
    )


@query(
    "corpus-dataset-card",
    oracle="""
        WITH doc_stats AS (
            SELECT CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
                   CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
                   CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
                   CAST(sum(n_chars) AS BIGINT) AS total_chars
            FROM documents
        ),
        dup_stats AS (
            SELECT CAST(count(*) AS BIGINT) AS n_unique_texts
            FROM (SELECT DISTINCT md5(text) FROM documents)
        ),
        emb_stats AS (
            SELECT CAST(count(*) AS BIGINT) AS n_embeddings,
                   CAST(max(len(embedding)) AS BIGINT) AS embedding_dim
            FROM embeddings
        )
        SELECT d.n_docs, d.n_langs, d.n_sources, d.total_tokens, d.total_chars,
               round(1.0 - CAST(u.n_unique_texts AS DOUBLE) / d.n_docs, 6)
                   AS exact_dup_rate,
               e.n_embeddings, e.embedding_dim
        FROM doc_stats d, dup_stats u, emb_stats e
    """,
    doc="Dataset card: the one-row release summary a corpus ships with "
    "— document/language/source counts, token and char volume, "
    "measured exact-duplicate rate (1 - distinct content hashes / "
    "docs), embedding inventory. Three independent single-pass "
    "aggregates (each map-side combined to one row) cross-joined at "
    "zero cost. The numbers every data statement/datasheet requires, "
    "produced by the same engine that built the corpus — at 100 TB "
    "the dup-rate term reuses dedup-exact-hash's digest shuffle and "
    "everything else is a metadata-cheap scan.",
)
def corpus_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    doc_stats = d.agg(
        F.count("*").alias("n_docs"),
        F.countDistinct("lang").alias("n_langs"),
        F.countDistinct("source").alias("n_sources"),
        F.sum(F.size(F.split("text", " "))).cast("long").alias("total_tokens"),
        F.sum("n_chars").alias("total_chars"),
    )
    dup_stats = (
        d.select(F.md5("text").alias("h"))
        .distinct()
        .agg(F.count("*").alias("n_unique_texts"))
    )
    emb_stats = emb.agg(
        F.count("*").alias("n_embeddings"),
        F.max(F.size("embedding")).cast("long").alias("embedding_dim"),
    )
    return (
        doc_stats.join(dup_stats)
        .join(emb_stats)
        .select(
            "n_docs",
            "n_langs",
            "n_sources",
            "total_tokens",
            "total_chars",
            F.round(
                1.0 - F.col("n_unique_texts").cast("double") / F.col("n_docs"), 6
            ).alias("exact_dup_rate"),
            "n_embeddings",
            "embedding_dim",
        )
    )


@query(
    "dedup-incremental-batch",
    oracle="""
        WITH corpus AS (
            SELECT doc_id, text FROM documents WHERE doc_id % 4 <> 0
        ),
        batch AS (
            SELECT doc_id + 5000000 AS doc_id, text FROM documents
            WHERE doc_id % 4 = 0 OR doc_id % 5 = 0
        ),
        batch_hashed AS (
            SELECT doc_id, md5(text) AS h,
                   row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id)
                       AS rn_in_batch
            FROM batch
        ),
        vs_corpus AS (
            SELECT b.doc_id, b.rn_in_batch,
                   (c.h IS NOT NULL) AS dup_of_corpus
            FROM batch_hashed b
            LEFT JOIN (SELECT DISTINCT md5(text) AS h FROM corpus) c
              ON b.h = c.h
        )
        SELECT CAST(count(*) AS BIGINT) AS n_batch,
               CAST(sum(CASE WHEN dup_of_corpus THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_dup_of_corpus,
               CAST(sum(CASE WHEN NOT dup_of_corpus AND rn_in_batch > 1
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_within_batch,
               CAST(sum(CASE WHEN NOT dup_of_corpus AND rn_in_batch = 1
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_admitted
        FROM vs_corpus
    """,
    doc="INCREMENTAL dedup — the production shape: a new ingest batch "
    "checks against the standing corpus (hash semi-join: the corpus "
    "contributes only its digest set, never re-deduped, never "
    "rescanned beyond the digest column) plus within-batch "
    "first-occurrence dedup. Admitted = novel in both senses. At "
    "100 TB the corpus digest set is a bloom/bucketed table "
    "maintained incrementally (join-bloom-prefilter's structure), so "
    "per-batch cost scales with the BATCH, not the corpus — the "
    "difference between daily dedup costing minutes vs re-running "
    "dedup-exact-hash over everything.",
)
def dedup_incremental_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    corpus = d.filter(F.col("doc_id") % 4 != 0)
    batch = d.filter((F.col("doc_id") % 4 == 0) | (F.col("doc_id") % 5 == 0)).select(
        (F.col("doc_id") + 5000000).alias("doc_id"), "text"
    )
    w = Window.partitionBy("h").orderBy("doc_id")
    batch_hashed = batch.select(
        "doc_id", F.md5("text").alias("h")
    ).withColumn("rn_in_batch", F.row_number().over(w))
    corpus_hashes = corpus.select(F.md5("text").alias("h")).distinct().withColumn(
        "in_corpus", F.lit(True)
    )
    vs = batch_hashed.join(corpus_hashes, "h", "left").select(
        F.coalesce(F.col("in_corpus"), F.lit(False)).alias("dup_of_corpus"),
        "rn_in_batch",
    )
    return vs.agg(
        F.count("*").alias("n_batch"),
        F.sum(F.when(F.col("dup_of_corpus"), 1).otherwise(0))
        .cast("long")
        .alias("n_dup_of_corpus"),
        F.sum(
            F.when(~F.col("dup_of_corpus") & (F.col("rn_in_batch") > 1), 1).otherwise(0)
        )
        .cast("long")
        .alias("n_dup_within_batch"),
        F.sum(
            F.when(~F.col("dup_of_corpus") & (F.col("rn_in_batch") == 1), 1).otherwise(0)
        )
        .cast("long")
        .alias("n_admitted"),
    )


_CONTAIN_MAX_DF = 50   # stop-shingle cap: drop shingles in > this many docs
_CONTAIN_MIN = 0.5     # report pairs where either direction >= this


@query(
    "dedup-containment-score",
    oracle=f"""
        WITH sh0 AS (
            SELECT DISTINCT doc_id, s FROM (
                SELECT doc_id, unnest(sh) AS s
                FROM (SELECT doc_id, {sql_shingle_hashes('text')} AS sh
                      FROM documents)
            )
        ),
        keepable AS (
            SELECT s FROM sh0 GROUP BY s HAVING count(*) <= {_CONTAIN_MAX_DF}
        ),
        kept AS (SELECT sh0.doc_id, sh0.s FROM sh0 JOIN keepable USING (s)),
        sizes AS (SELECT doc_id, count(*) AS sz FROM kept GROUP BY doc_id),
        shared AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_shared
            FROM kept a JOIN kept b ON a.s = b.s AND a.doc_id < b.doc_id
            GROUP BY doc_a, doc_b
        )
        SELECT doc_a, doc_b, CAST(n_shared AS BIGINT) AS n_shared,
               CAST(floor(CAST(n_shared AS DOUBLE) / sa.sz * 1000000 + 0.5)
                    AS BIGINT) AS cont_a_in_b_e6,
               CAST(floor(CAST(n_shared AS DOUBLE) / sb.sz * 1000000 + 0.5)
                    AS BIGINT) AS cont_b_in_a_e6
        FROM shared
        JOIN sizes sa ON sa.doc_id = doc_a
        JOIN sizes sb ON sb.doc_id = doc_b
        WHERE greatest(CAST(n_shared AS DOUBLE) / sa.sz,
                       CAST(n_shared AS DOUBLE) / sb.sz) >= {_CONTAIN_MIN}
    """,
    doc="Asymmetric containment scoring (|A n B| / |A|) — the doc-in-doc "
    "detector Jaccard misses: a short document fully quoted inside a "
    "long one has low Jaccard but containment ~1.0 from the short "
    "side. Candidate pairs come from a self-equi-join on shingle hash "
    "with a STOP-SHINGLE cap first (shingles appearing in > 50 docs "
    "are dropped, the same df-cap discipline search engines use) — "
    "at 100 TB the cap is what bounds the join fan-out on boilerplate "
    "shingles; without it one viral sentence creates a quadratic "
    "candidate set. Shuffles carry 8-byte hashes, never text; both "
    "direction scores emit per surviving pair. floor(x*1e6+0.5) "
    "quantization (double-arithmetic rounding, as timeseries-ewma).",
)
def dedup_containment_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    # both persists are load-bearing (r11, ~2x end-to-end): sh feeds the
    # df-cap agg AND the kept join; kept feeds sizes AND both self-join
    # sides — unpersisted, the explode/window shingle pipeline re-ran
    # once per branch (4x)
    sh = shingle_hash_rows(d.select("doc_id", "text")).persist()
    keepable = (
        sh.groupBy("sh").agg(F.count("*").alias("_df"))
        .filter(F.col("_df") <= _CONTAIN_MAX_DF)
        .select("sh")
    )
    kept = sh.join(keepable, "sh").persist()
    sizes = kept.groupBy("doc_id").agg(F.count("*").alias("sz"))
    a = kept.alias("a")
    b = kept.alias("b")
    shared = (
        a.join(
            b,
            (F.col("a.sh") == F.col("b.sh"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count("*").cast("long").alias("n_shared"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("sz").alias("sz_b"))
    res = shared.join(sa, "doc_a").join(sb, "doc_b")
    cont_a = F.col("n_shared").cast("double") / F.col("sz_a")
    cont_b = F.col("n_shared").cast("double") / F.col("sz_b")
    return (
        res.filter(F.greatest(cont_a, cont_b) >= _CONTAIN_MIN)
        .select(
            "doc_a",
            "doc_b",
            "n_shared",
            F.floor(cont_a * 1000000 + 0.5).cast("long").alias("cont_a_in_b_e6"),
            F.floor(cont_b * 1000000 + 0.5).cast("long").alias("cont_b_in_a_e6"),
        )
    )


@query(
    "corpus-token-budget",
    oracle="""
        WITH src AS (
            SELECT source,
                   CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS toks
            FROM documents GROUP BY source
        ),
        tot AS (SELECT CAST(sum(toks) AS BIGINT) AS total_toks FROM src)
        SELECT source, toks,
               CAST(sum(toks) OVER (ORDER BY toks DESC, source) AS BIGINT)
                   AS cum_toks,
               round(CAST(toks AS DOUBLE) / total_toks, 6) AS share,
               sum(toks) OVER (ORDER BY toks DESC, source)
                   <= CAST(0.5 * total_toks AS BIGINT) AS in_budget
        FROM src, tot
    """,
    doc="Token-budget planning for a training mix: per-source token "
    "totals, greedy cumulative fill ordered by size (ties broken by "
    "source name for determinism), and an in_budget flag marking the "
    "sources that fit a 50%-of-corpus token budget — the first table "
    "anyone draws up before weighting a pretraining mixture (see "
    "corpus-resample-mix for the sampling side). Token counts stay "
    "integers end to end, so the running sum is exact in any engine. "
    "One map-side-combined groupBy on source; the window runs over "
    "|sources| rows.",
)
def corpus_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    d = load_table(spark, sf_dir, "documents")
    src = d.groupBy("source").agg(
        F.sum(F.size(F.split("text", " "))).cast("long").alias("toks")
    )
    tot = src.agg(F.sum("toks").cast("long").alias("total_toks"))
    w = Window.orderBy(F.col("toks").desc(), F.col("source")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = F.sum("toks").over(w)
    return (
        src.crossJoin(F.broadcast(tot))
        .select(
            "source",
            "toks",
            cum.cast("long").alias("cum_toks"),
            F.round(F.col("toks").cast("double") / F.col("total_toks"), 6).alias(
                "share"
            ),
            (cum <= (0.5 * F.col("total_toks")).cast("long")).alias("in_budget"),
        )
    )


@query(
    "dedup-crossdoc-prefix",
    oracle="""
        WITH pre AS (
            SELECT doc_id,
                   array_to_string(string_split(text, ' ')[1:8], ' ') AS prefix
            FROM documents
        )
        SELECT prefix,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(min(doc_id) AS BIGINT) AS keeper_doc_id
        FROM pre
        GROUP BY prefix
        HAVING count(*) > 1
    """,
    doc="Cross-document shared-prefix detector: the first 8 tokens of "
    "each document as a boilerplate fingerprint, grouped, and groups "
    "with >1 member surfaced with a deterministic keeper (min doc_id) "
    "— the cheap screen for header/template boilerplate that exact "
    "dedup misses (bodies differ) and MinHash wastes signatures on. "
    "At 100 TB the groupBy key should be the prefix HASH, not the "
    "string (same plan, 8-byte shuffle rows); kept as text here so "
    "the flagged boilerplate is human-readable. Map-side combine "
    "bounds the shuffle by distinct-prefix cardinality.",
)
def dedup_crossdoc_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    prefix = F.array_join(F.slice(F.split("text", " "), 1, 8), " ")
    return (
        d.select("doc_id", prefix.alias("prefix"))
        .groupBy("prefix")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.min("doc_id").cast("long").alias("keeper_doc_id"),
        )
        .filter(F.col("n_docs") > 1)
    )


@query(
    "dedup-sentence-boilerplate",
    oracle="""
        WITH sent AS (
            SELECT doc_id, trim(s) AS sentence
            FROM (
                SELECT doc_id, unnest(string_split(text, '. ')) AS s
                FROM documents
            )
            WHERE length(trim(s)) >= 20
        )
        SELECT sentence,
               CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
               CAST(count(*) AS BIGINT) AS n_occurrences
        FROM sent
        GROUP BY sentence
        HAVING count(DISTINCT doc_id) >= 3
    """,
    doc="Sentence-level cross-document repetition (the CCNet-style "
    "boilerplate screen, one granularity below "
    "dedup-paragraph-exact's chunks and one above "
    "dedup-crossdoc-prefix's fixed prefixes): explode sentences, "
    "drop fragments under 20 chars, and surface sentences recurring "
    "in >= 3 distinct documents — navigation chrome, license "
    "headers, cookie banners. These are removed line-by-line from "
    "otherwise-unique documents, which whole-doc dedup cannot do. "
    "At 100 TB: group on the 64-bit sentence hash (8-byte shuffle "
    "rows) and re-attach text only for the tiny flagged set — the "
    "minhash.py ids-only discipline; kept textual here for "
    "readability of the flagged output.",
)
def dedup_sentence_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    sent = (
        d.select(
            "doc_id",
            F.explode(F.split("text", "\\. ")).alias("s"),
        )
        .select("doc_id", F.trim(F.col("s")).alias("sentence"))
        .filter(F.length("sentence") >= 20)
    )
    return (
        sent.groupBy("sentence")
        .agg(
            F.countDistinct("doc_id").cast("long").alias("n_docs"),
            F.count("*").cast("long").alias("n_occurrences"),
        )
        .filter(F.col("n_docs") >= 3)
    )


@query(
    "corpus-shannon-diversity",
    oracle="""
        WITH tok AS (
            SELECT source,
                   unnest(regexp_extract_all(lower(text), '[a-z]+')) AS token
            FROM documents
        ),
        counted AS (
            SELECT source, token, CAST(count(*) AS BIGINT) AS n
            FROM tok GROUP BY 1, 2
        ),
        totals AS (
            SELECT source, CAST(sum(n) AS BIGINT) AS total_n,
                   CAST(count(*) AS BIGINT) AS vocab
            FROM counted GROUP BY source
        )
        SELECT c.source, t.total_n, t.vocab,
               round(-sum((CAST(c.n AS DOUBLE) / t.total_n)
                          * ln(CAST(c.n AS DOUBLE) / t.total_n)), 6) AS shannon_h,
               round(exp(-sum((CAST(c.n AS DOUBLE) / t.total_n)
                              * ln(CAST(c.n AS DOUBLE) / t.total_n))), 4)
                   AS effective_vocab
        FROM counted c JOIN totals t ON c.source = t.source
        GROUP BY c.source, t.total_n, t.vocab
    """,
    doc="Lexical diversity per source: Shannon entropy of the token "
    "distribution and its exponential (the 'effective vocabulary' — "
    "how many equally-likely tokens would give the same entropy). A "
    "source whose effective vocab collapses relative to its raw "
    "vocab is template-generated text, the corpus-level signal that "
    "per-doc quality scores miss (cf. text-zipf-slope for the "
    "rank-frequency view of the same pathology). Two "
    "map-side-combined groupBys (shuffles bounded by "
    "|source|x|vocab| then |source|) plus a broadcast-sized totals "
    "join; the entropy sum is one more groupBy over the counted "
    "relation.",
)
def corpus_shannon_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    counted = (
        d.select(
            "source",
            F.explode(
                F.regexp_extract_all(F.lower(F.col("text")), F.lit("[a-z]+"), F.lit(0))
            ).alias("token"),
        )
        .groupBy("source", "token")
        .agg(F.count("*").cast("long").alias("n"))
    )
    totals = counted.groupBy("source").agg(
        F.sum("n").cast("long").alias("total_n"),
        F.count("*").cast("long").alias("vocab"),
    )
    p = F.col("n").cast("double") / F.col("total_n")
    h = -F.sum(p * F.log(p))
    return (
        counted.join(F.broadcast(totals), "source")
        .groupBy("source", "total_n", "vocab")
        .agg(
            F.round(h, 6).alias("shannon_h"),
            F.round(F.exp(h), 4).alias("effective_vocab"),
        )
    )


@query(
    "corpus-curation-report",
    oracle="""
        WITH base AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
        exact_dup AS (
            SELECT CAST(coalesce(sum(n - 1), 0) AS BIGINT) AS n
            FROM (SELECT count(*) AS n FROM documents GROUP BY text
                  HAVING count(*) > 1)
        ),
        prefix_dup AS (
            SELECT CAST(coalesce(sum(n - 1), 0) AS BIGINT) AS n
            FROM (SELECT count(*) AS n FROM documents
                  GROUP BY array_to_string(string_split(text, ' ')[1:8], ' ')
                  HAVING count(*) > 1)
        ),
        short_docs AS (
            SELECT CAST(count(*) AS BIGINT) AS n FROM documents
            WHERE len(string_split(text, ' ')) < 20
        )
        SELECT stage, n_removed,
               round(CAST(n_removed AS DOUBLE) / (SELECT n FROM base), 6)
                   AS removal_rate
        FROM (
            SELECT 1 AS ord, 'exact-duplicate' AS stage,
                   (SELECT n FROM exact_dup) AS n_removed
            UNION ALL
            SELECT 2, 'prefix-boilerplate', (SELECT n FROM prefix_dup)
            UNION ALL
            SELECT 3, 'too-short', (SELECT n FROM short_docs)
        )
    """,
    doc="Curation-funnel summary: how many documents each cheap screen "
    "would remove — exact duplicates (keep-one-per-text), shared-"
    "8-token-prefix boilerplate (dedup-crossdoc-prefix's rule), and "
    "under-20-token fragments — each as a removal count and rate "
    "against the corpus. The one-page report a curation run opens "
    "with before the expensive MinHash pass is budgeted "
    "(dedup-lsh-tuning sizes that); stages here are measured "
    "INDEPENDENTLY (not sequentially composed), which is what you "
    "want when deciding stage order. Three map-side-combined "
    "groupBys over one scan each; every branch collapses to a "
    "single row before the union.",
)
def corpus_curation_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    base = d.agg(F.count("*").cast("long").alias("n_total"))

    n_removed = F.coalesce(F.sum(F.col("n") - 1), F.lit(0)).cast("long")
    exact_dup = (
        d.groupBy("text").agg(F.count("*").alias("n")).filter(F.col("n") > 1)
        .agg(n_removed.alias("n_removed"))
    )
    prefix_dup = (
        d.groupBy(F.array_join(F.slice(F.split("text", " "), 1, 8), " ").alias("p"))
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") > 1)
        .agg(n_removed.alias("n_removed"))
    )
    short_docs = d.filter(F.size(F.split("text", " ")) < 20).agg(
        F.count("*").cast("long").alias("n_removed")
    )
    stages = (
        exact_dup.select(F.lit("exact-duplicate").alias("stage"), "n_removed")
        .unionByName(
            prefix_dup.select(F.lit("prefix-boilerplate").alias("stage"), "n_removed")
        )
        .unionByName(
            short_docs.select(F.lit("too-short").alias("stage"), "n_removed")
        )
    )
    return stages.crossJoin(F.broadcast(base)).select(
        "stage",
        "n_removed",
        F.round(F.col("n_removed").cast("double") / F.col("n_total"), 6).alias(
            "removal_rate"
        ),
    )


@query(
    "corpus-dedup-impact",
    oracle="""
        WITH keyed AS (
            SELECT source, doc_id,
                   len(string_split(text, ' ')) AS toks,
                   md5(lower(trim(text))) AS k
            FROM documents
        ),
        kept AS (
            SELECT source, k, min(doc_id) AS keep_id,
                   count(*) AS n_copies, max(toks) AS toks
            FROM keyed GROUP BY source, k
        )
        SELECT source,
               CAST(sum(n_copies) AS BIGINT) AS docs_before,
               CAST(count(*) AS BIGINT) AS docs_after,
               CAST(sum((n_copies - 1) * toks) AS BIGINT)
                   AS tokens_removed,
               round(1 - CAST(count(*) AS DOUBLE) / sum(n_copies), 6)
                   AS dup_rate
        FROM kept GROUP BY source ORDER BY source
    """,
    doc="Dedup impact report per source: exact duplicates keyed by "
    "md5 of the normalized text, keep-first (min doc_id), and per "
    "source the before/after doc counts, tokens that dedup would "
    "drop, and the duplicate rate — the before-you-commit summary "
    "every corpus-curation pipeline prints ahead of the actual "
    "dedup write (dedup-exact-hash does the removal; this prices "
    "it). One hash agg on (source, text-hash) — the 16-byte digest "
    "is the shuffle key, never the text — then a source-level "
    "rollup of the group-size summary. Token counts ride the "
    "first pass as max() per group (copies tie by construction).",
    tags=("dedup", "corpus"),
)
def corpus_dedup_impact(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    keyed = d.select(
        "source",
        "doc_id",
        F.size(F.split("text", " ")).alias("toks"),
        F.md5(F.lower(F.trim("text"))).alias("k"),
    )
    kept = keyed.groupBy("source", "k").agg(
        F.min("doc_id").alias("keep_id"),
        F.count("*").alias("n_copies"),
        F.max("toks").alias("toks"),
    )
    return (
        kept.groupBy("source")
        .agg(
            F.sum("n_copies").cast("long").alias("docs_before"),
            F.count("*").cast("long").alias("docs_after"),
            F.sum((F.col("n_copies") - 1) * F.col("toks"))
            .cast("long")
            .alias("tokens_removed"),
            F.round(
                1 - F.count("*").cast("double") / F.sum("n_copies"), 6
            ).alias("dup_rate"),
        )
        .orderBy("source")
    )


@query(
    "corpus-cross-source-dup",
    oracle="""
        WITH keyed AS (
            SELECT DISTINCT source, md5(lower(trim(text))) AS k
            FROM documents
        ),
        pairs AS (
            SELECT a.source AS source_a, b.source AS source_b,
                   CAST(count(*) AS BIGINT) AS shared_docs
            FROM keyed a JOIN keyed b
              ON a.k = b.k AND a.source < b.source
            GROUP BY a.source, b.source
        )
        SELECT source_a, source_b, shared_docs
        FROM pairs
        ORDER BY shared_docs DESC, source_a, source_b
        LIMIT 20
    """,
    doc="Cross-source duplication matrix: which source pairs share "
    "identical (normalized) documents — the syndication/mirror "
    "detector that tells a corpus curator two 'different' crawl "
    "sources are the same feed, so their combined weight in "
    "corpus-resample-mix double-counts. Facts collapse to "
    "distinct (source, content-hash) pairs; the pair join is "
    "hash-keyed and equi — each content key contributes only "
    "its own sources' pairs, fan-out bounded by copies-per-key "
    "(the dedup-containment-score df-cap applies verbatim if a "
    "key goes viral). 16-byte digests through every shuffle, "
    "never text.",
    tags=("dedup", "corpus"),
)
def corpus_cross_source_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    keyed = d.select(
        "source", F.md5(F.lower(F.trim("text"))).alias("k")
    ).distinct()
    a = keyed.select(F.col("source").alias("source_a"), "k")
    b = keyed.select(F.col("source").alias("source_b"), F.col("k").alias("k2"))
    return (
        a.join(
            b,
            (F.col("k") == F.col("k2"))
            & (F.col("source_a") < F.col("source_b")),
        )
        .groupBy("source_a", "source_b")
        .agg(F.count("*").cast("long").alias("shared_docs"))
        .orderBy(F.col("shared_docs").desc(), "source_a", "source_b")
        .limit(20)
    )


@query(
    "corpus-chinchilla-budget",
    oracle="""
        WITH keyed AS (
            SELECT md5(lower(trim(text))) AS k,
                   len(string_split(text, ' ')) AS toks
            FROM documents
        ),
        deduped AS (
            SELECT k, max(toks) AS toks FROM keyed GROUP BY k
        ),
        corpus AS (
            SELECT CAST(sum(toks) AS DOUBLE) AS unique_tokens FROM deduped
        ),
        models AS (
            SELECT unnest([100000000.0, 1000000000.0, 10000000000.0])
                       AS n_params
        )
        SELECT CAST(n_params AS BIGINT) AS model_params,
               CAST(n_params * 20 AS BIGINT) AS tokens_needed,
               CAST(unique_tokens AS BIGINT) AS tokens_available,
               round(unique_tokens / (n_params * 20), 6) AS coverage,
               CAST(ceil(n_params * 20 / unique_tokens) AS BIGINT)
                   AS epochs_required
        FROM models, corpus
        ORDER BY model_params
    """,
    doc="Chinchilla-style training-budget planning: unique (post-"
    "exact-dedup) token supply vs the ~20-tokens-per-parameter "
    "compute-optimal demand for candidate model sizes — coverage "
    "ratio and the epoch count you'd be forced into (epochs > 1 "
    "means repeating data, with the diminishing returns "
    "text-ngram-novelty's saturation curve predicts). The "
    "corpus-side supply number is ONE dedup hash-agg + ONE sum "
    "(16-byte digests through the shuffle, the corpus-dedup-"
    "impact machinery); the demand side is a 3-row literal "
    "model table. The planning readout that decides whether to "
    "crawl more or dedup less, before any GPU is booked.",
    tags=("corpus",),
)
def corpus_chinchilla_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    keyed = d.select(
        F.md5(F.lower(F.trim("text"))).alias("k"),
        F.size(F.split("text", " ")).alias("toks"),
    )
    deduped = keyed.groupBy("k").agg(F.max("toks").alias("toks"))
    corpus = deduped.agg(
        F.sum("toks").cast("double").alias("unique_tokens")
    )
    models = spark.createDataFrame(
        [(1e8,), (1e9,), (1e10,)], "n_params DOUBLE"
    )
    need = F.col("n_params") * 20
    return (
        models.crossJoin(F.broadcast(corpus))
        .select(
            F.col("n_params").cast("long").alias("model_params"),
            need.cast("long").alias("tokens_needed"),
            F.col("unique_tokens").cast("long").alias("tokens_available"),
            F.round(F.col("unique_tokens") / need, 6).alias("coverage"),
            F.ceil(need / F.col("unique_tokens"))
            .cast("long")
            .alias("epochs_required"),
        )
        .orderBy("model_params")
    )


_CENT64 = ", ".join(f"avg(v[{i + 1}])" for i in range(64))


@query(
    "dedup-semdedup-bucket",
    oracle=f"""
        WITH v AS (
            SELECT vec_id,
                   list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
            FROM embeddings
        ),
        nbits AS (
            SELECT least(12, greatest(3,
                       CAST(ceil(log2(count(*) / 80.0)) AS INTEGER))) AS bits
            FROM v
        ),
        bucketed AS (
            SELECT vec_id, v,
                   CAST({" + ".join(
                       f"CASE WHEN {i} < nbits.bits AND v[{i + 1}] >= 0 "
                       f"THEN {1 << (11 - i)} ELSE 0 END"
                       for i in range(12)
                   )} AS BIGINT) AS bucket
            FROM v, nbits
        ),
        cent AS (
            SELECT bucket, list_value({_CENT64}) AS c
            FROM bucketed GROUP BY bucket
        ),
        scored AS (
            SELECT b.vec_id, b.bucket, b.v,
                   list_cosine_similarity(b.v, cent.c) AS cent_sim
            FROM bucketed b JOIN cent USING (bucket)
        ),
        pairs AS (
            SELECT a.bucket,
                   a.vec_id AS ida, b.vec_id AS idb,
                   a.cent_sim AS sa, b.cent_sim AS sb
            FROM scored a JOIN scored b
              ON a.bucket = b.bucket AND a.vec_id < b.vec_id
            WHERE list_cosine_similarity(a.v, b.v) > 0.85
        ),
        removed AS (
            SELECT bucket, vec_id FROM (
                SELECT bucket,
                       CASE WHEN sa >= sb THEN ida ELSE idb END AS vec_id
                FROM pairs
            ) GROUP BY bucket, vec_id
        )
        SELECT s.bucket,
               CAST(count(*) AS BIGINT) AS n_vecs,
               CAST(coalesce(max(p.np), 0) AS BIGINT) AS n_dup_pairs,
               CAST(coalesce(max(r.nr), 0) AS BIGINT) AS n_removed
        FROM scored s
        LEFT JOIN (SELECT bucket, count(*) AS np FROM pairs GROUP BY bucket) p
               ON s.bucket = p.bucket
        LEFT JOIN (SELECT bucket, count(*) AS nr FROM removed GROUP BY bucket) r
               ON s.bucket = r.bucket
        GROUP BY s.bucket
    """,
    doc="SemDeDup-style semantic dedup (Abbas et al. 2023): partition "
    "the embedding space into cells by the SIGN PATTERN of the first "
    "ceil(log2(n/80)) dimensions — cell count ADAPTS to corpus size "
    "so mean occupancy stays ~80 and the within-cell pair count "
    "scales linearly with n, the property SemDeDup gets by scaling "
    "k-means k with n (a fixed cell count went quadratic in the 10x "
    "soak). Same-bucket = same-cell; compute per-bucket "
    "centroids, then search cosine>0.85 pairs ONLY within buckets "
    "and remove the member of each pair CLOSER to its centroid "
    "(SemDeDup keeps edge examples, discards redundant "
    "near-centroid mass). Pair generation is an equi-join on the "
    "bucket key, so the quadratic blowup is bounded per cell exactly "
    "as in the paper's clustered formulation — and CELL COUNT must "
    "grow with the corpus to keep cells bounded (3 sign bits at 5k "
    "vectors put ~600 per cell and made this the slowest op in the "
    "sweep; 6 bits restored the contract). The per-cell tail "
    "(centroid, cent_sim, gram-matrix pair search, removal counts) "
    "is ONE Arrow-batched applyInPandas gemm kernel per bucket — "
    "wide per-dimension expression trees fall out of whole-stage "
    "codegen and ran interpreted (r11; see _semdedup_bucket_kernel). "
    "Complements dedup-near-embedding-lsh "
    "(random-hyperplane LSH) with the cluster-centroid flavor.",
    tags=("dedup",),
)
def dedup_semdedup_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    from transit_scrape_spark.functions.vectors import as_double, cosine

    e = load_table(spark, sf_dir, "embeddings")
    v = e.select("vec_id", as_double(F.col("embedding")).alias("v"))
    # adaptive cell count: bits = clamp(ceil(log2(n/80)), 3, 12) keeps
    # mean cell OCCUPANCY ~constant as the corpus grows, so the
    # within-cell pair count scales LINEARLY with n (fixed cells made
    # the 10x soak superlinear: occupancy, hence pairs/cell, grew
    # quadratically). SemDeDup scales k with n for exactly this reason.
    nbits = v.agg(
        F.least(
            F.lit(12),
            F.greatest(
                F.lit(3), F.ceil(F.log2(F.count("*") / 80.0)).cast("int")
            ),
        ).alias("bits")
    )
    bucket = sum(
        (
            F.when(
                (F.lit(i) < F.col("bits")) & (F.col("v")[i] >= 0),
                1 << (11 - i),
            ).otherwise(0)
            for i in range(12)
        ),
        start=F.lit(0),
    ).cast("long")
    bucketed = v.join(F.broadcast(nbits)).select(
        "vec_id", "v", bucket.alias("bucket")
    )
    # Per-bucket tail (centroid, cent_sim, pair search, removal choice,
    # counts) as ONE Arrow-batched applyInPandas gemm kernel (r11,
    # VERDICT r10 task 3 — the anndist treatment). The previous
    # expression formulation built the pairwise cosine as a 64-term
    # scalar Add tree over element_at; codegen bails on trees that wide
    # and evaluates them INTERPRETED — measured 2.7 s for 62 k pairs vs
    # 0.3 s for the bare join at sf0.1. In the kernel the whole bucket
    # is one (occ x 64) matrix: pair cosines are a single BLAS gram
    # matrix, and only 4 counter columns leave Python. Cell occupancy
    # is BOUNDED by the adaptive-bits construction above, so per-group
    # memory is bounded too — the precondition for applyInPandas here.
    return bucketed.groupBy("bucket").applyInPandas(
        _semdedup_bucket_kernel,
        schema="bucket long, n_vecs long, n_dup_pairs long, n_removed long",
    )


def _semdedup_bucket_kernel(pdf):
    """One SemDeDup cell: (vec_id, v, bucket) rows -> one counter row.

    Mirrors the SQL oracle in comparison OUTCOMES: pair gate
    ``cos > 0.85`` (NaN compares False, as NULL does), removal choice
    ``sa >= sb -> ida else idb`` (NaN False), ``ida < idb`` on id
    VALUES (duplicate-id hostile copies never self-pair but do pair
    with others — the join's exact multiplicity). NULL handling mirrors
    the expression form: NULL / short / NULL-element vectors become NaN
    rows (NaN propagates through the gram matrix and fails the gate,
    as NULL fails it in SQL); the centroid is a per-element
    NULL-skipping mean (nanmean == avg(v[i]) ignoring NULLs); a
    zero-norm row normalizes to NaN (as try_divide -> NULL)."""
    import numpy as np
    import pandas as pd

    dim = 64
    nanrow = np.full(dim, np.nan)

    def as_vec(x):
        if x is None:
            return nanrow
        try:
            a = np.asarray(x, dtype=np.float64)
        except (TypeError, ValueError):
            a = np.array(
                [np.nan if e is None else float(e) for e in x],
                dtype=np.float64,
            )
        if len(a) == dim:
            return a
        out = np.full(dim, np.nan)
        out[: min(len(a), dim)] = a[:dim]
        return out

    V = np.vstack([as_vec(x) for x in pdf["v"]])
    ids = pdf["vec_id"].to_numpy(dtype=np.int64)
    n = len(ids)
    with np.errstate(divide="ignore", invalid="ignore"):
        c = np.nanmean(V, axis=0)
        nrm = np.sqrt((V * V).sum(axis=1))
        cent_sim = (V @ c) / (nrm * np.sqrt((c * c).sum()))
        U = V / nrm[:, None]
        S = U @ U.T
    with np.errstate(invalid="ignore"):
        mask = (ids[None, :] > ids[:, None]) & (S > 0.85)
    ii, jj = np.nonzero(mask)
    n_pairs = len(ii)
    if n_pairs:
        with np.errstate(invalid="ignore"):
            keep_a = cent_sim[ii] >= cent_sim[jj]
        removed = np.where(keep_a, ids[ii], ids[jj])
        n_removed = len(np.unique(removed))
    else:
        n_removed = 0
    return pd.DataFrame(
        {
            "bucket": [int(pdf["bucket"].iloc[0])],
            "n_vecs": [n],
            "n_dup_pairs": [n_pairs],
            "n_removed": [n_removed],
        }
    )


@query(
    "corpus-language-balance-sampler",
    oracle="""
        WITH langs AS (
            SELECT lang, CAST(count(*) AS BIGINT) AS n_docs
            FROM documents GROUP BY lang
        ),
        tot AS (
            SELECT lang, n_docs,
                   sum(n_docs) OVER () AS n,
                   sum(power(n_docs, 0.3)) OVER () AS z
            FROM langs
        )
        SELECT lang, n_docs,
               round(CAST(n_docs AS DOUBLE) / n, 6) AS raw_share,
               round(power(n_docs, 0.3) / z, 6) AS temp_share,
               round(power(n_docs, 0.3) / z / (CAST(n_docs AS DOUBLE) / n), 6)
                   AS sample_weight
        FROM tot
    """,
    doc="Temperature-based multilingual sampling weights (mT5/XLM-R "
    "alpha=0.3): p_l proportional to n_l^alpha flattens the language "
    "distribution so low-resource languages are upsampled "
    "(weight > 1) and high-resource downsampled without the "
    "winner-take-all of raw proportions. One hash aggregation to "
    "per-language counts; shares via windows over the k-row "
    "summary. sample_weight feeds corpus-resample-mix's "
    "deterministic hash-split machinery to materialize the "
    "rebalanced corpus — together they are the mixture step every "
    "multilingual pretraining pipeline runs after dedup.",
    tags=("corpus",),
)
def corpus_language_balance_sampler(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    langs = d.groupBy("lang").agg(F.count("*").cast("long").alias("n_docs"))
    w = Window.partitionBy()
    tot = langs.select(
        "lang",
        "n_docs",
        F.sum("n_docs").over(w).alias("n"),
        F.sum(F.pow("n_docs", 0.3)).over(w).alias("z"),
    )
    raw = F.col("n_docs").cast("double") / F.col("n")
    temp = F.pow("n_docs", 0.3) / F.col("z")
    return tot.select(
        "lang",
        "n_docs",
        F.round(raw, 6).alias("raw_share"),
        F.round(temp, 6).alias("temp_share"),
        F.round(temp / raw, 6).alias("sample_weight"),
    )


@query(
    "corpus-quality-dedup-matrix",
    oracle="""
        WITH scored AS (
            SELECT doc_id, text,
                   len(string_split(text, ' ')) AS n_tokens,
                   CASE WHEN len(string_split(text, ' ')) BETWEEN 20 AND 1000
                         AND CAST(len(list_filter(string_split(text, ' '),
                                    t -> t IN ('a', 'the'))) AS DOUBLE)
                             / len(string_split(text, ' ')) < 0.3
                        THEN 1 ELSE 0 END AS clean
            FROM documents
        ),
        dup AS (
            SELECT doc_id,
                   CASE WHEN doc_id = min_id THEN 0 ELSE 1 END AS is_dup
            FROM (
                SELECT doc_id, min(doc_id) OVER (PARTITION BY sha256(text))
                           AS min_id
                FROM documents
            )
        )
        SELECT CASE WHEN s.clean = 1 THEN 'clean' ELSE 'lowq' END AS quality,
               CASE WHEN d.is_dup = 1 THEN 'dup' ELSE 'unique' END
                   AS dedup_status,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(s.n_tokens) AS BIGINT) AS total_tokens
        FROM scored s JOIN dup d ON s.doc_id = d.doc_id
        GROUP BY ALL
    """,
    doc="The curation DECISION MATRIX: quality gate (token bounds + "
    "stopword ratio, the corpus-filter-pipeline rules) crossed with "
    "exact-dup status (sha256 keeper = min doc_id, the dedup-exact "
    "contract) into a 2x2 of doc and token mass — clean+unique is "
    "the training set, clean+dup is recoverable by keeping one "
    "copy, lowq+unique is the filter's cost, lowq+dup is free to "
    "drop. The one-page summary a data lead reads before signing "
    "off a 100 TB pretraining cut (corpus-dedup-impact and "
    "corpus-curation-report drill into each axis separately). Two "
    "scan-shaped passes joined on doc_id; the sha256 window "
    "shuffles 8-byte hashes.",
    tags=("corpus",),
)
def corpus_quality_dedup_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    n = F.size(toks)
    stop_ratio = (
        F.size(F.filter(toks, lambda t: t.isin("a", "the"))).cast("double") / n
    )
    scored = d.select(
        "doc_id",
        "text",
        n.alias("n_tokens"),
        F.when(n.between(20, 1000) & (stop_ratio < 0.3), 1)
        .otherwise(0)
        .alias("clean"),
    )
    dup = d.select(
        "doc_id",
        F.when(
            F.col("doc_id")
            == F.min("doc_id").over(Window.partitionBy(F.sha2(F.col("text"), 256))),
            0,
        )
        .otherwise(1)
        .alias("is_dup"),
    )
    j = scored.join(dup, "doc_id")
    return j.groupBy(
        F.when(F.col("clean") == 1, "clean").otherwise("lowq").alias("quality"),
        F.when(F.col("is_dup") == 1, "dup").otherwise("unique").alias(
            "dedup_status"
        ),
    ).agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
    )


_DSIR_BUCKETS = 64


@query(
    "corpus-dsir-importance",
    oracle=f"""
        WITH tok AS (
            SELECT doc_id, lang,
                   ({sql_string_hash("unnest(string_split(lower(text), ' '))")})
                       % {_DSIR_BUCKETS} AS f
            FROM documents
        ),
        tgt AS (
            SELECT f, CAST(count(*) AS DOUBLE) AS c
            FROM tok WHERE lang = 'en' GROUP BY f
        ),
        src AS (
            SELECT f, CAST(count(*) AS DOUBLE) AS c FROM tok GROUP BY f
        ),
        tot AS (
            SELECT (SELECT sum(c) FROM tgt) AS nt,
                   (SELECT sum(c) FROM src) AS ns
        ),
        ratio AS (
            SELECT s.f,
                   ln(((coalesce(t.c, 0) + 1) / (tt.nt + {_DSIR_BUCKETS}))
                      / ((s.c + 1) / (tt.ns + {_DSIR_BUCKETS}))) AS lr
            FROM src s LEFT JOIN tgt t ON t.f = s.f CROSS JOIN tot tt
        ),
        per_doc AS (
            SELECT k.doc_id, k.lang,
                   avg(r.lr) AS log_importance
            FROM tok k JOIN ratio r ON r.f = k.f
            GROUP BY k.doc_id, k.lang
        )
        SELECT lang,
               CAST(count(*) AS BIGINT) AS n_docs,
               round(avg(log_importance), 6) AS mean_log_importance,
               CAST(sum(CASE WHEN log_importance > 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_selected
        FROM per_doc GROUP BY lang
    """,
    doc="DSIR-style importance weighting (Xie et al.'s data selection "
    "with importance resampling, condensed to its hashed-n-gram "
    "core): features are md5-hashed unigram buckets (64 bins — "
    "vocabulary-free, the property that makes DSIR run at corpus "
    "scale), the target distribution is the English slice, and each "
    "document scores the mean log importance ratio "
    "ln(P_target(f)/P_source(f)) of its tokens under add-one "
    "smoothing. Positive scores mark documents that look like the "
    "target domain — the principled replacement for hand-written "
    "quality filters when curating toward a reference corpus "
    "(complements corpus-ccnet-ppl-buckets' perplexity view). Plan: "
    "one token explode, two bucket histograms (64 rows, broadcast), "
    "per-doc mean via one hash agg.",
    tags=("corpus",),
)
def corpus_dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    # persist the hashed token stream: the bucket histogram (cnt) and
    # the per-doc scoring join BOTH consume it — unpersisted, the
    # explode + per-token md5 re-planned per consumer (3 documents
    # scans in the r11 before-plan). Same pattern as the persisted
    # dedup-span-coverage explode.
    tok = d.select(
        "doc_id",
        "lang",
        F.explode(F.split(F.lower("text"), " ")).alias("w"),
    ).select(
        "doc_id",
        "lang",
        (string_hash(F.col("w")) % _DSIR_BUCKETS).alias("f"),
    ).persist()
    # source and target bucket counts in ONE pass over the exploded
    # tokens (ct as a conditional sum), instead of a second full
    # explode + md5 pass for the en-filtered target plus a src⟕tgt
    # join to reassemble (r11). A bucket with no en tokens gets ct=0,
    # identical to the old left join's coalesce(NULL, 0).
    cnt = tok.groupBy("f").agg(
        F.count("*").cast("double").alias("cs"),
        F.sum(F.when(F.col("lang") == "en", 1).otherwise(0))
        .cast("double")
        .alias("ct"),
    ).persist()  # 64 rows, consumed by tot AND ratio
    tot = cnt.agg(
        F.sum("cs").alias("ns"), F.sum("ct").alias("nt")
    )
    ratio = (
        cnt.crossJoin(F.broadcast(tot))
        .select(
            "f",
            F.log(
                ((F.col("ct") + 1) / (F.col("nt") + _DSIR_BUCKETS))
                / ((F.col("cs") + 1) / (F.col("ns") + _DSIR_BUCKETS))
            ).alias("lr"),
        )
    )
    per_doc = (
        tok.join(F.broadcast(ratio), "f")
        .groupBy("doc_id", "lang")
        .agg(F.avg("lr").alias("log_importance"))
    )
    return per_doc.groupBy("lang").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.round(F.avg("log_importance"), 6).alias("mean_log_importance"),
        F.sum(F.when(F.col("log_importance") > 0, 1).otherwise(0))
        .cast("long")
        .alias("n_selected"),
    )


@query(
    "corpus-temperature-sampling",
    oracle="""
        WITH src AS (
            SELECT source,
                   CAST(sum(n_chars) AS DOUBLE) AS toks
            FROM documents GROUP BY source
        ),
        temps AS (SELECT unnest([0.3, 0.7, 1.0]) AS tau),
        powered AS (
            SELECT t.tau, s.source, s.toks,
                   power(s.toks, t.tau) AS p_raw
            FROM src s CROSS JOIN temps t
        ),
        norm AS (
            SELECT tau, source, toks,
                   p_raw / sum(p_raw) OVER (PARTITION BY tau) AS p
            FROM powered
        )
        SELECT round(tau, 1) AS tau, source,
               CAST(toks AS BIGINT) AS source_tokens,
               round(p, 6) AS sample_prob,
               round(p / (toks / sum(toks) OVER (PARTITION BY tau)), 4)
                   AS upsample_factor
        FROM norm ORDER BY tau, source
    """,
    doc="Temperature-scaled source sampling weights (the multilingual "
    "mixing rule from mBERT/XLM-R, now standard for corpus mixes): "
    "p_s(tau) proportional to (token share)^tau for tau in "
    "{0.3, 0.7, 1.0} — tau=1 is natural proportion, tau->0 is "
    "uniform, and the emitted upsample_factor (p_s over natural "
    "share) is exactly the per-source repetition rate a sampler "
    "must apply. Complements corpus-resample-mix (which EXECUTES a "
    "target mix) and corpus-language-balance-sampler by computing "
    "the whole tau grid from the single per-source token rollup — "
    "one groupBy over the corpus, then arithmetic on a "
    "sources x 3 grid.",
    tags=("corpus",),
)
def corpus_temperature_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    src = d.groupBy("source").agg(
        F.sum("n_chars").cast("double").alias("toks")
    )
    temps = spark.createDataFrame(
        [(0.3,), (0.7,), (1.0,)], ["tau"]
    )
    powered = src.crossJoin(F.broadcast(temps)).select(
        "tau",
        "source",
        "toks",
        F.pow(F.col("toks"), F.col("tau")).alias("p_raw"),
    )
    w = Window.partitionBy("tau")
    norm = powered.select(
        "tau",
        "source",
        "toks",
        (F.col("p_raw") / F.sum("p_raw").over(w)).alias("p"),
        (F.col("toks") / F.sum("toks").over(w)).alias("nat"),
    )
    return norm.select(
        F.round("tau", 1).alias("tau"),
        "source",
        F.col("toks").cast("long").alias("source_tokens"),
        F.round("p", 6).alias("sample_prob"),
        F.round(F.col("p") / F.col("nat"), 4).alias("upsample_factor"),
    ).orderBy("tau", "source")
