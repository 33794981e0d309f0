"""Pipeline-family extension queries (16 registrations), split out of the former
monolithic queries_ext.py with block text unchanged. Global
registration order is restored by queries_ext's reorder —
do not rely on this module's import order.
"""

from __future__ import annotations

from time_series_data_trimmer_spark.queries_common import *  # noqa: F401,F403



@register(
    "corpus_pipeline_end_to_end",
    f"""
    WITH quality AS (
      SELECT doc_id, lang, n_chars,
             ({_lang_score_sql("en")}) /
               (CASE WHEN length(trim(text)) = 0 THEN 1
                     ELSE len(string_split(trim(text), ' ')) END) AS stop_ratio,
             md5(text) AS content_key,
             CASE WHEN length(trim(text)) = 0 THEN 0
                  ELSE len(string_split(trim(text), ' ')) END AS n_tokens
      FROM documents
      WHERE n_chars >= 100
    ),
    survivors AS (
      SELECT content_key, min(doc_id) AS doc_id FROM quality GROUP BY content_key
    ),
    kept AS (
      SELECT q.* FROM quality q JOIN survivors s ON q.doc_id = s.doc_id
      WHERE q.stop_ratio > 0.01
    )
    SELECT lang, count(*) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
           {R("CAST(sum(n_chars) AS DOUBLE) / count(*)", 4)} AS avg_chars
    FROM kept GROUP BY lang
    """,
)
def _q_corpus_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The training-data pipeline story in one lazy plan: length filter →
    exact dedup (md5 survivors) → quality gate (stopword ratio) → corpus
    stats per language. Text bytes never shuffle: dedup keys are
    digests, stats are integers."""
    docs = _table(spark, sf_dir, "documents").filter(F.col("n_chars") >= 100)
    low = F.lower(F.col("text"))
    stop_hits = F.lit(0.0)
    for w in tx.LANG_MARKERS["en"]:
        stop_hits = stop_hits + tx._occurrences(low, w)
    q = docs.select(
        "doc_id", "lang", "n_chars",
        (stop_hits / F.when(tx.token_count(F.col("text")) == 0, F.lit(1))
         .otherwise(tx.token_count(F.col("text"))).cast("double")).alias("stop_ratio"),
        F.md5("text").alias("content_key"),
        tx.token_count(F.col("text")).cast("long").alias("n_tokens"),
    )
    # survivor pick = row_number over the content digest — one shuffle,
    # no join, nothing broadcast (the previous broadcast semi-join
    # shipped an O(distinct-docs) id set to every executor)
    w = Window.partitionBy("content_key").orderBy(F.col("doc_id").asc())
    kept = (
        q.withColumn("__rn", F.row_number().over(w))
        .filter((F.col("__rn") == 1) & (F.col("stop_ratio") > 0.01))
        .drop("__rn")
    )
    return kept.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        rd(F.sum("n_chars").cast("double") / F.count(F.lit(1)), 4).alias("avg_chars"),
    )


@register(
    "profile_documents",
    """
    WITH s AS (SELECT doc_id, source, lang FROM documents)
    SELECT 'doc_id' AS column, count(*) AS n_rows,
           count(*) - count(doc_id) AS n_null,
           count(DISTINCT doc_id) AS n_distinct,
           min(CAST(doc_id AS VARCHAR)) AS min_str,
           max(CAST(doc_id AS VARCHAR)) AS max_str,
           avg(CAST(len(CAST(doc_id AS VARCHAR)) AS DOUBLE)) AS avg_len
    FROM s
    UNION ALL
    SELECT 'source', count(*), count(*) - count(source),
           count(DISTINCT source), min(source), max(source),
           avg(CAST(len(source) AS DOUBLE))
    FROM s
    UNION ALL
    SELECT 'lang', count(*), count(*) - count(lang),
           count(DISTINCT lang), min(lang), max(lang),
           avg(CAST(len(lang) AS DOUBLE))
    FROM s
    """,
)
def _q_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE-style column profile (long form, one aggregation pass):
    row/null/distinct counts, min/max, average length per column — the
    corpus health report that precedes pipeline decisions. All stats
    are algebraic aggregates in ONE pass (map-side combined); the
    oracle unions per-column scalar aggregates."""
    return tx.profile_table(
        _table(spark, sf_dir, "documents"), ["doc_id", "source", "lang"]
    )


@register(
    "pipeline_c4_survivors",
    f"""
    WITH {_C4_FEATS_SQL}
    SELECT doc_id, lang_pred, q_n_tokens
    FROM ratios WHERE {_C4_CUM[-1]}
    """,
)
def _q_c4_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4/Gopher-style rule-based cleaning pass
    (`tx.c4_filter_survivors`): length band, token-shape, noise
    ratios, stopword presence, language gate — all in one scan-side
    WholeStageCodegen span, zero shuffle/UDF."""
    return tx.c4_filter_survivors(_table(spark, sf_dir, "documents"))


@register(
    "pipeline_c4_funnel",
    f"""
    WITH {_C4_FEATS_SQL},
    agg AS (
      SELECT count(*) AS n_in,
             {", ".join(f"sum(CASE WHEN {_C4_CUM[i]} THEN 1 ELSE 0 END) AS c{i}" for i in range(len(_C4_RULES_SQL)))}
      FROM ratios
    )
    SELECT 0 AS stage, 'input' AS rule, CAST(n_in AS BIGINT) AS n_pass FROM agg
    {" ".join(f"UNION ALL SELECT {i + 1} AS stage, '{name}' AS rule, CAST(c{i} AS BIGINT) AS n_pass FROM agg" for i, (name, _) in enumerate(_C4_RULES_SQL))}
    """,
)
def _q_c4_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative per-rule attrition of the C4-style filter
    (`tx.c4_filter_funnel`): one scan, conditional sums into a single
    aggregate row, exploded to (stage, rule, n_pass) rows — the
    threshold-tuning report before a full-filter rewrite."""
    return tx.c4_filter_funnel(_table(spark, sf_dir, "documents"))


@register(
    "pipeline_gopher_repetition_survivors",
    f"""
    WITH {_REP_WS},
    st AS (SELECT doc_id, {_GOPHER_STOP_SQL} AS stop FROM documents WHERE text IS NOT NULL)
    SELECT s.doc_id,
           CAST(s.n AS INT) AS n_tokens,
           CAST(st.stop AS INT) AS stopword_hits,
           {R("CAST(s.n - s.nd AS DOUBLE) / s.n", 6)} AS dup_token_frac,
           {R("CAST(u.mass AS DOUBLE) / s.chars", 6)} AS top_token_char_frac
    FROM s
    JOIN (SELECT * FROM topu WHERE rn = 1) u ON s.doc_id = u.doc_id
    JOIN st ON s.doc_id = st.doc_id
    WHERE s.n BETWEEN 20 AND 10000
      AND 3 * s.n <= s.chars AND s.chars <= 10 * s.n
      AND st.stop >= 2
      AND 5 * (s.n - s.nd) <= 3 * s.n
      AND 20 * u.mass <= 3 * s.chars
    """,
)
def _q_gopher_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition filter (`tx.gopher_repetition_filter`):
    the quality axis C4_RULES lacks — token-count and mean-length
    bounds plus stopword floor, duplicate-token cap (≤0.6), and
    top-unigram char-coverage cap (≤0.15), all INTEGER-exact
    cross-multiplied comparisons. One scan-side conjunction; at
    sf0.01 each repetition rule cuts a 20-40% band, so the filter is
    a real attrition stage, not a pass-through."""
    return tx.gopher_repetition_filter(_table(spark, sf_dir, "documents"))


@register(
    "corpus_diff_versions",
    """
    WITH h AS (
      SELECT doc_id, text,
             substr(md5('tsdt|diff|' || CAST(doc_id AS VARCHAR)), 1, 1) AS hx
      FROM documents
    ),
    new_v AS (
      SELECT doc_id,
             CASE WHEN hx = '1' THEN text || ' v2' ELSE text END AS text
      FROM h WHERE hx <> '0'
      UNION ALL
      SELECT doc_id + 1000000 AS doc_id, text FROM h WHERE hx = '2'
    ),
    o AS (SELECT doc_id, coalesce(md5(text), '<NULL>') AS do_ FROM documents),
    n AS (SELECT doc_id, coalesce(md5(text), '<NULL>') AS dn_ FROM new_v)
    SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
           CASE WHEN o.doc_id IS NULL THEN 'added'
                WHEN n.doc_id IS NULL THEN 'removed'
                WHEN o.do_ = n.dn_ THEN 'unchanged'
                ELSE 'changed' END AS status
    FROM o FULL OUTER JOIN n ON o.doc_id = n.doc_id
    """,
)
def _q_corpus_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus snapshot diff (`corpus_io.corpus_diff`): old = the
    documents table, new = a deterministically derived next crawl
    (md5 band 0 removed, band 1 edited, band 2 duplicated under new
    ids) — per-doc added/removed/changed/unchanged status. Digest-only
    full-outer shuffle-hash join; text bytes never shuffle."""
    from time_series_data_trimmer_spark.sources.corpus_io import corpus_diff

    docs = _table(spark, sf_dir, "documents")
    hx = F.substring(
        F.md5(F.concat(F.lit("tsdt|diff|"), F.col("doc_id").cast("string"))), 1, 1
    )
    h = docs.select("doc_id", "text", hx.alias("__hx"))
    new_v = (
        h.filter(F.col("__hx") != "0")
        .select(
            "doc_id",
            F.when(F.col("__hx") == "1", F.concat(F.col("text"), F.lit(" v2")))
            .otherwise(F.col("text"))
            .alias("text"),
        )
        .unionByName(
            h.filter(F.col("__hx") == "2").select(
                (F.col("doc_id") + F.lit(1000000)).alias("doc_id"), "text"
            )
        )
    )
    return corpus_diff(docs, new_v)


@register(
    "pipeline_pretraining_corpus",
    f"""
    WITH {_REP_WS},
    st AS (SELECT doc_id, {_GOPHER_STOP_SQL} AS stop FROM documents WHERE text IS NOT NULL),
    surv AS (
      SELECT d.doc_id, d.source, d.text, CAST(s.n AS INT) AS n_tokens
      FROM documents d
      JOIN s ON d.doc_id = s.doc_id
      JOIN (SELECT * FROM topu WHERE rn = 1) u ON d.doc_id = u.doc_id
      JOIN st ON d.doc_id = st.doc_id
      WHERE s.n BETWEEN 20 AND 10000
        AND 3 * s.n <= s.chars AND s.chars <= 10 * s.n
        AND st.stop >= 2
        AND 5 * (s.n - s.nd) <= 3 * s.n
        AND 20 * u.mass <= 3 * s.chars
    ),
    dd AS (
      SELECT * FROM (
        SELECT surv.*,
               row_number() OVER (
                 PARTITION BY coalesce(md5(text), '<NULL>')
                 ORDER BY doc_id ASC
               ) AS rn
        FROM surv
      ) WHERE rn = 1
    ),
    c AS (SELECT source, count(*) AS c FROM dd GROUP BY source),
    t AS (
      SELECT CAST(sum(CAST({R("sqrt(CAST(c AS DOUBLE))", 9)} AS DECIMAL(38,9))) AS DOUBLE) AS T,
             CAST(sum(c) AS DOUBLE) AS N
      FROM c
    ),
    r AS (
      SELECT source,
             least(1.0,
               ((0.3 * t.N) * {R("sqrt(CAST(c AS DOUBLE))", 9)})
                 / ((CAST(c AS DOUBLE)) * t.T)) AS rate
      FROM c, t
    ),
    sampled AS (
      SELECT dd.doc_id, dd.source, dd.n_tokens, r.rate
      FROM dd JOIN r ON dd.source = r.source
      WHERE {sp.sql_hash_u32("dd.doc_id", "tsdt|corpus")}
            < CAST(floor(r.rate * 4294967296.0) AS BIGINT)
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
           {R("any_value(rate)", 9)} AS keep_rate
    FROM sampled GROUP BY source
    """,
)
def _q_pretraining_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pretraining-corpus build as ONE lazy plan: Gopher
    repetition filter (scan-side) → exact dedup (digest window, min-id
    survivor) → α=0.5 temperature rebalancing over SURVIVOR counts
    (decimal-exact rates, md5-coin membership) → per-source corpus
    stats. Text bytes shuffle once (the dedup window on the content
    digest carries the payload only because the composition keeps
    rows; a digest-only variant is `dedup_exact_groups`); every other
    stage moves narrow rows. The end-to-end story query: raw crawl in,
    rebalanced deduped corpus accounting out."""
    docs = _table(spark, sf_dir, "documents")
    surv = tx.gopher_repetition_survivor_rows(docs)
    w = Window.partitionBy(
        F.coalesce(F.md5("text"), F.lit("<NULL>"))
    ).orderBy(F.col("doc_id").asc())
    dd = surv.withColumn("__rn", F.row_number().over(w)).filter(
        F.col("__rn") == 1
    )
    sampled = sp.temperature_sample(
        dd, target_frac=0.3, group_col="source", key_col="doc_id", seed="tsdt|corpus"
    )
    # temperature_sample is filter-shaped: `sampled` already carries the
    # full survivor schema (incl. n_tokens) plus keep_rate — aggregate it
    # directly; a compensation join would duplicate n_tokens.
    return sampled.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
        rd(F.any_value(F.col("keep_rate")), 9).alias("keep_rate"),
    )


@register(
    "profile_events_columns",
    f"""
    WITH base AS (
      SELECT event_id AS rid,
             CAST(user_id AS DOUBLE) AS user_id,
             CAST(value AS DOUBLE) AS value,
             epoch(ts) AS t
      FROM events
    ),
    stacked AS (
      SELECT rid, 'user_id' AS col, user_id AS v FROM base
      UNION ALL SELECT rid, 'value' AS col, value AS v FROM base
      UNION ALL SELECT rid, 't' AS col, t AS v FROM base
    ),
    scalar AS (
      SELECT col, count(*) AS n,
             CAST(sum(CASE WHEN v IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
             {sql_rd("min(v)", 6)} AS min_v, {sql_rd("max(v)", 6)} AS max_v
      FROM stacked GROUP BY col
    ),
    hashed AS (
      SELECT DISTINCT col,
             {sp.sql_hash_u32("CAST(CAST(floor(v * 1000000.0 + 0.5) AS BIGINT) AS VARCHAR)", _PROF_SEED)} AS u
      FROM stacked WHERE v IS NOT NULL
    ),
    kept AS (
      SELECT col, count(*) AS ndv_kept, max(u) AS kth
      FROM (SELECT col, u, row_number() OVER (PARTITION BY col ORDER BY u ASC) AS rn FROM hashed)
      WHERE rn <= 64 GROUP BY col
    ),
    ndv AS (
      SELECT col, {sql_rd("CASE WHEN ndv_kept < 64 THEN CAST(ndv_kept AS DOUBLE) ELSE 63.0 * 4294967296.0 / CAST(kth AS DOUBLE) END", 6)} AS ndv_est
      FROM kept
    ),
    regs AS (
      SELECT col, u, v FROM (
        SELECT col, {sp.sql_hash_u32("rid", _PROF_SEED + "|q")} AS u, v
        FROM stacked WHERE v IS NOT NULL
      ) QUALIFY row_number() OVER (PARTITION BY col ORDER BY u ASC, v ASC) <= 32
    ),
    ranked AS (
      SELECT col, v,
             row_number() OVER (PARTITION BY col ORDER BY v ASC, u ASC) AS vr,
             count(*) OVER (PARTITION BY col) AS nk
      FROM regs
    ),
    q25 AS (SELECT col, {sql_rd("v", 6)} AS q25 FROM ranked WHERE vr = greatest(1, CAST(ceil(0.25 * CAST(nk AS DOUBLE)) AS BIGINT))),
    q50 AS (SELECT col, {sql_rd("v", 6)} AS q50 FROM ranked WHERE vr = greatest(1, CAST(ceil(0.5 * CAST(nk AS DOUBLE)) AS BIGINT))),
    q75 AS (SELECT col, {sql_rd("v", 6)} AS q75 FROM ranked WHERE vr = greatest(1, CAST(ceil(0.75 * CAST(nk AS DOUBLE)) AS BIGINT)))
    SELECT scalar.col, n, n_null, min_v, max_v, ndv_est, q25, q50, q75
    FROM scalar JOIN ndv ON scalar.col = ndv.col
    JOIN q25 ON scalar.col = q25.col
    JOIN q50 ON scalar.col = q50.col
    JOIN q75 ON scalar.col = q75.col
    """,
)
def _q_profile_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass column profile of events (user_id, value, t) —
    `profiling.profile_columns`: the ANALYZE-TABLE primitive built
    from the sketch family (scalar stats as one aggregate, NDV from
    KMV registers, quartiles from the bottom-k quantile sketch), all
    on the portable md5 coin so the whole profile exact-oracles. At
    100 TB these are the optimizer/data-quality statistics you refresh
    per partition and MERGE (every register here is mergeable) instead
    of rescanning the table per statistic per column."""
    from time_series_data_trimmer_spark.operators.profiling import profile_columns

    ev = _events(spark, sf_dir)
    return profile_columns(
        ev, ["user_id", "value", "t"], id_col="event_id", seed=_PROF_SEED
    )


@register(
    "pipeline_cluster_topics",
    f"""
    WITH ex AS ({_EX_SQL}),
    ord AS (
      SELECT vec_id,
             row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR))) - 1 AS cid
      FROM embeddings
      QUALIFY cid <= {_TOPIC_K - 1}
    ),
    cex AS (SELECT o.cid, e.i, e.x FROM ord o JOIN ex e ON e.vec_id = o.vec_id),
    dists AS (
      SELECT e.vec_id, c.cid,
             sum(CAST({sql_rd("(e.x - c.x) * (e.x - c.x)", 9)} AS DECIMAL(38,9))) AS d
      FROM ex e JOIN cex c ON c.i = e.i
      GROUP BY e.vec_id, c.cid
    ),
    assigned AS (
      SELECT vec_id, cid FROM dists
      QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) = 1
    ),
    sizes AS (SELECT cid, count(*) AS n_docs FROM assigned GROUP BY cid),
    toks AS (
      SELECT a.cid, d.doc_id, t.token
      FROM documents d
      JOIN assigned a ON a.vec_id = d.doc_id,
           LATERAL (SELECT unnest(string_split(trim(d.text), ' ')) AS token) t
      WHERE d.text IS NOT NULL AND len(t.token) > 0
    ),
    tf AS (SELECT cid, token, count(*) AS tf FROM toks GROUP BY cid, token),
    dfreq AS (SELECT token, count(*) AS cell_df FROM tf GROUP BY token),
    scored AS (
      SELECT tf.cid, tf.token, tf.tf, d.cell_df,
             CAST(tf.tf AS DOUBLE) * {float(_TOPIC_K + 1)}
               / (CAST(d.cell_df AS DOUBLE) + 1.0) AS s
      FROM tf JOIN dfreq d ON d.token = tf.token
    ),
    ranked AS (
      SELECT cid, token, tf, cell_df, s,
             row_number() OVER (
               PARTITION BY cid ORDER BY s DESC, token ASC
             ) AS rank
      FROM scored
    )
    SELECT CAST(r.cid AS INT) AS centroid_id, z.n_docs,
           CAST(r.rank AS INT) AS rank, r.token, {R("r.s", 6)} AS score
    FROM ranked r JOIN sizes z ON z.cid = r.cid
    WHERE r.rank <= 3
    """,
)
def _q_pipeline_cluster_topics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-then-describe: IVF cells over the embeddings (the same
    decimal-exact assignment the ANN and SemDeDup paths use) joined to
    the documents, with each cell labeled by its top-3
    cluster-TF-IDF terms (tf in cell × (C+1)/(cells-with-term+1),
    un-logged per the determinism policy) — the corpus-cartography
    view: what IS each region of embedding space, in words. Cross-modal
    join keys on doc_id == vec_id; token counts shuffle narrow
    (cell, token) rows; per-cell top-3 is a keyed window."""
    emb = _table(spark, sf_dir, "embeddings")
    cents = sim.ivf_centroids(emb, _TOPIC_K)
    assigned = sim.ivf_assign_dec(emb, cents)
    docs = _table(spark, sf_dir, "documents")
    d = docs.filter(F.col("text").isNotNull()).join(
        assigned.withColumnRenamed("vec_id", "doc_id").hint("shuffle_hash"),
        "doc_id",
    )
    sizes = assigned.groupBy("centroid_id").agg(F.count(F.lit(1)).alias("n_docs"))
    toks = d.select(
        "centroid_id",
        F.explode(F.split(F.trim(F.col("text")), " ")).alias("token"),
    ).filter(F.length("token") > 0)
    tf = toks.groupBy("centroid_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).alias("cell_df"))
    scored = tf.join(dfreq.hint("shuffle_hash"), "token").select(
        "centroid_id",
        "token",
        "tf",
        "cell_df",
        (
            F.col("tf").cast("double")
            * F.lit(float(_TOPIC_K + 1))
            / (F.col("cell_df").cast("double") + F.lit(1.0))
        ).alias("s"),
    )
    w = Window.partitionBy("centroid_id").orderBy(
        F.col("s").desc(), F.col("token").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .join(sizes.hint("shuffle_hash"), "centroid_id")
        .select(
            F.col("centroid_id").cast("int").alias("centroid_id"),
            "n_docs",
            "rank",
            "token",
            rd(F.col("s"), 6).alias("score"),
        )
    )


@register(
    "pipeline_corpus_health",
    f"""
    WITH tok AS (
      SELECT t.token FROM documents d,
           LATERAL (SELECT unnest(string_split(trim(d.text), ' ')) AS token) t
      WHERE d.text IS NOT NULL AND len(t.token) > 0
    ),
    tc AS (
      SELECT doc_id,
             CASE WHEN len(trim(text)) = 0 THEN 0
                  ELSE len(string_split(trim(text), ' ')) END AS n_tok
      FROM documents WHERE text IS NOT NULL
    ),
    vh AS (
      SELECT DISTINCT {sp.sql_hash_u32("token", "tsdt|kmv")} AS u FROM tok
    ),
    vkept AS (
      SELECT count(*) AS n_kept, max(u) AS kth
      FROM (SELECT u, row_number() OVER (ORDER BY u ASC) AS rn FROM vh)
      WHERE rn <= 64
    ),
    treg AS (
      SELECT u, v FROM (
        SELECT {sp.sql_hash_u32("doc_id", "tsdt|qsk")} AS u, CAST(n_tok AS DOUBLE) AS v
        FROM tc
      ) QUALIFY row_number() OVER (ORDER BY u ASC, v ASC) <= 64
    ),
    tr AS (
      SELECT v, row_number() OVER (ORDER BY v ASC, u ASC) AS vr, count(*) OVER () AS nk
      FROM treg
    ),
    creg AS (
      SELECT u, v FROM (
        SELECT {sp.sql_hash_u32("doc_id", "tsdt|qsk")} AS u, CAST(n_chars AS DOUBLE) AS v
        FROM documents
      ) QUALIFY row_number() OVER (ORDER BY u ASC, v ASC) <= 64
    ),
    cr AS (
      SELECT v, row_number() OVER (ORDER BY v ASC, u ASC) AS vr, count(*) OVER () AS nk
      FROM creg
    )
    SELECT 'n_docs' AS metric, CAST(count(*) AS DOUBLE) AS value FROM documents
    UNION ALL
    SELECT 'null_text_frac',
           {sql_rd("CAST(sum(CASE WHEN text IS NULL THEN 1 ELSE 0 END) AS DOUBLE) / count(*)", 6)}
    FROM documents
    UNION ALL
    SELECT 'exact_dup_rate',
           {sql_rd("CAST(count(text) - count(DISTINCT md5(text)) AS DOUBLE) / count(text)", 6)}
    FROM documents
    UNION ALL
    SELECT 'vocab_ndv_est',
           {sql_rd("CASE WHEN n_kept < 64 THEN CAST(n_kept AS DOUBLE) ELSE 63.0 * 4294967296.0 / CAST(kth AS DOUBLE) END", 6)}
    FROM vkept
    UNION ALL
    SELECT 'tokens_per_doc_p50_est', {sql_rd("v", 6)} FROM tr
    WHERE vr = greatest(1, CAST(ceil(0.5 * CAST(nk AS DOUBLE)) AS BIGINT))
    UNION ALL
    SELECT 'n_chars_p90_est', {sql_rd("v", 6)} FROM cr
    WHERE vr = greatest(1, CAST(ceil(0.9 * CAST(nk AS DOUBLE)) AS BIGINT))
    UNION ALL
    SELECT 'n_langs', CAST(count(DISTINCT lang) AS DOUBLE) FROM documents
    """,
)
def _q_corpus_health(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-query corpus health report — the (metric, value) table a
    data-quality dashboard polls, composed from the round's sketch
    primitives: doc counts and null fraction (plain aggregates),
    exact duplicate rate (digest distinct), vocabulary NDV (KMV
    registers), tokens-per-doc median and n_chars p90 (bottom-k
    quantile registers), language count. Every sketch term is
    register-bounded and mergeable, so at 100 TB this report REFRESHES
    by merging per-partition registers rather than rescanning the
    corpus; the whole table is exact-oracled."""
    docs = _table(spark, sf_dir, "documents")
    toks = (
        docs.filter(F.col("text").isNotNull())
        .select(F.explode(F.split(F.trim("text"), " ")).alias("token"))
        .filter(F.length("token") > 0)
        .select(F.lit("corpus").alias("g"), F.col("token"))
    )
    tc = docs.filter(F.col("text").isNotNull()).select(
        F.lit("corpus").alias("g"),
        F.col("doc_id"),
        tx.token_count(F.col("text")).cast("double").alias("n_tok"),
    )
    ch = docs.select(
        F.lit("corpus").alias("g"), F.col("doc_id"),
        F.col("n_chars").cast("double").alias("v"),
    )

    def one(metric, col):
        return docs.agg(rd(col, 6).alias("value")).select(
            F.lit(metric).alias("metric"), "value"
        )

    n_docs = one("n_docs", F.count(F.lit(1)).cast("double"))
    nullf = one(
        "null_text_frac",
        F.sum(F.col("text").isNull().cast("long")).cast("double")
        / F.count(F.lit(1)),
    )
    dup = one(
        "exact_dup_rate",
        (F.count("text") - F.countDistinct(F.md5("text"))).cast("double")
        / F.count("text"),
    )
    # CONSTANT group ⇒ the keyed-window register form degenerates to a
    # keyless Window (the repo's own plan sweep caught it here) — the
    # corpus-wide sketches use the salted two-stage bottom-k and the
    # window-free aggregation estimator instead
    vhash = toks.select(
        "g", sp.hash_u32(F.col("token"), "tsdt|kmv").alias("u")
    ).distinct()
    vocab = sk.kmv_estimate(
        sk.bottom_k_salted(vhash, 64, ["u"]), k=64, group_col="g"
    ).select(F.lit("vocab_ndv_est").alias("metric"), rd(F.col("est_distinct"), 6).alias("value"))
    trows = tc.select(
        "g", sp.hash_u32(F.col("doc_id"), "tsdt|qsk").alias("u"),
        F.col("n_tok").alias("v"),
    )
    tq = sk.quantile_estimate_agg(
        sk.bottom_k_salted(trows, 64, ["u", "v"]), [0.5]
    ).select(F.lit("tokens_per_doc_p50_est").alias("metric"), rd(F.col("q_est"), 6).alias("value"))
    crows = ch.select(
        "g", sp.hash_u32(F.col("doc_id"), "tsdt|qsk").alias("u"), "v"
    )
    cq = sk.quantile_estimate_agg(
        sk.bottom_k_salted(crows, 64, ["u", "v"]), [0.9]
    ).select(F.lit("n_chars_p90_est").alias("metric"), rd(F.col("q_est"), 6).alias("value"))
    langs = one("n_langs", F.countDistinct("lang").cast("double"))
    out = n_docs
    for piece in (nullf, dup, vocab, tq, cq, langs):
        out = out.unionByName(piece)
    return out


@register(
    "pipeline_ccnet_buckets",
    f"""
    WITH {_CCNET_LM_SQL},
    withlang AS (
      SELECT p.doc_id, p.avg_nll, d.lang
      FROM perdoc p JOIN documents d ON d.doc_id = p.doc_id
    ),
    ranked AS (
      SELECT *, percent_rank() OVER (PARTITION BY lang ORDER BY avg_nll ASC) AS pr
      FROM withlang
    ),
    bucketed AS (
      SELECT lang, avg_nll,
             CASE WHEN pr < 1.0 / 3.0 THEN 'head'
                  WHEN pr < 2.0 / 3.0 THEN 'middle'
                  ELSE 'tail' END AS bucket
      FROM ranked
    )
    SELECT lang, bucket, count(*) AS n_docs,
           {R("CAST(sum(CAST(avg_nll AS DECIMAL(38,6))) AS DOUBLE) / count(*)", 6)} AS mean_nll
    FROM bucketed GROUP BY lang, bucket
    """,
)
def _q_ccnet_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style perplexity bucketing (Wenzek et al., LREC 2020):
    per-language head/middle/tail terciles of the corpus-trained
    bigram-LM score — the standard quality split that keeps a
    same-size slice of EVERY language instead of letting an
    English-trained threshold eat the low-resource tail. percent_rank
    keys on the operator's ROUNDED avg_nll, so rank ties are value
    ties in every engine; the per-bucket mean decimal-accumulates.
    Composes `tx.bigram_lm_score` (digest-keyed counts) + one
    lang-keyed window + one aggregation."""
    docs = _table(spark, sf_dir, "documents")
    scored = tx.bigram_lm_score(docs)
    withlang = scored.join(
        docs.select("doc_id", "lang").hint("shuffle_hash"), "doc_id"
    )
    pr = F.percent_rank().over(
        Window.partitionBy("lang").orderBy(F.col("avg_nll").asc())
    )
    bucketed = withlang.withColumn("pr", pr).withColumn(
        "bucket",
        F.when(F.col("pr") < F.lit(1.0 / 3.0), F.lit("head"))
        .when(F.col("pr") < F.lit(2.0 / 3.0), F.lit("middle"))
        .otherwise(F.lit("tail")),
    )
    return bucketed.groupBy("lang", "bucket").agg(
        F.count(F.lit(1)).alias("n_docs"),
        (
            F.sum(F.col("avg_nll").cast("decimal(38,6)")).cast("double")
            / F.count(F.lit(1))
        ).alias("__mean_raw"),
    ).select(
        "lang", "bucket", "n_docs", rd(F.col("__mean_raw"), 6).alias("mean_nll")
    )


# ---------------------------------------------------------------------------
# One-query drift dashboard (composes the r7 stats family)
# ---------------------------------------------------------------------------


@register(
    "pipeline_drift_report",
    f"""
    WITH o AS (
      SELECT event_type, (epoch_us(ts) // 3600000000) % 24 AS hod,
             count(*) AS obs
      FROM events GROUP BY 1, 2
    ),
    rt AS (SELECT event_type, sum(obs) AS rtot FROM o GROUP BY event_type),
    ct AS (SELECT hod, sum(obs) AS ctot FROM o GROUP BY hod),
    gg AS (SELECT sum(obs) AS total FROM o),
    cells AS (
      SELECT o.obs,
             CAST(rt.rtot AS DOUBLE) * ct.ctot / gg.total AS expected
      FROM o JOIN rt USING (event_type) JOIN ct USING (hod) CROSS JOIN gg
    ),
    chi2 AS (
      SELECT 'chi2_type_x_hour' AS metric, 'events' AS scope,
             {R("CAST(sum(CAST(" + sql_rd(
                 "(obs - expected) * (obs - expected) / expected", 6
             ) + " AS DECIMAL(38,6))) AS DOUBLE)", 6)} AS value
      FROM cells
    ),
    e2 AS (
      SELECT event_type,
             CASE WHEN epoch_us(ts) < {_W1_SPLIT_US} THEN 0 ELSE 1 END AS half,
             CAST(floor(value * 10000.0 + 0.5) AS BIGINT) AS sv,
             event_id
      FROM events
    ),
    r2 AS (
      SELECT event_type, half, sv,
             row_number() OVER (
               PARTITION BY event_type, half ORDER BY sv, event_id
             ) AS rn,
             count(*) OVER (PARTITION BY event_type, half) AS n
      FROM e2
    ),
    q2 AS (
      SELECT event_type, half, d.d AS decile, min(sv) AS qv
      FROM r2 JOIN generate_series(1, 9) d(d)
        ON r2.rn = CAST(ceil(d.d * r2.n / 10.0) AS BIGINT)
      GROUP BY event_type, half, d.d
    ),
    w1 AS (
      SELECT 'w1_decile_drift' AS metric, a.event_type AS scope,
             {R("CAST(sum(abs(a.qv - b.qv)) AS DOUBLE) / 9.0 / 10000.0", 6)} AS value
      FROM q2 a JOIN q2 b
        ON a.event_type = b.event_type AND a.decile = b.decile
       AND a.half = 0 AND b.half = 1
      GROUP BY a.event_type
    ),
    tr AS (
      SELECT user_id, event_type,
             lead(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
             ) AS nxt
      FROM events
    ),
    tc AS (
      SELECT event_type AS src, nxt AS dst, count(*) AS n
      FROM tr WHERE nxt IS NOT NULL GROUP BY 1, 2
    ),
    tt AS (SELECT src, sum(n) AS tot FROM tc GROUP BY src),
    tg AS (SELECT sum(n) AS total FROM tc),
    hrate AS (
      SELECT 'markov_entropy_rate_bits' AS metric, 'events' AS scope,
             {R("CAST(sum(CAST(" + sql_rd(
                 "-(CAST(tc.n AS DOUBLE) / tg.total)"
                 " * log2(CAST(tc.n AS DOUBLE) / tt.tot)", 6
             ) + " AS DECIMAL(38,6))) AS DOUBLE)", 6)} AS value
      FROM tc JOIN tt ON tt.src = tc.src CROSS JOIN tg
    )
    SELECT * FROM chi2
    UNION ALL SELECT * FROM w1
    UNION ALL SELECT * FROM hrate
    """,
)
def _q_pipeline_drift_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ingest-monitor page as ONE lazy plan: chi-square
    (categorical mix), per-type decile-Wasserstein (numeric
    distributions), and the Markov entropy rate (behavioral
    predictability), unioned into (metric, scope, value) rows — the
    `pipeline_corpus_health` pattern applied to DRIFT. Each branch is
    the registered operator's exact shape; Spark shares the events
    scan across branches and every branch's output is types-bounded."""
    chi2 = REGISTRY["stats_chi2_type_vs_hour"][0](spark, sf_dir).select(
        F.lit("chi2_type_x_hour").alias("metric"),
        F.lit("events").alias("scope"),
        rd(F.col("chi2"), 6).alias("value"),
    )
    w1 = REGISTRY["stats_w1_value_drift_by_type"][0](spark, sf_dir).select(
        F.lit("w1_decile_drift").alias("metric"),
        F.col("event_type").alias("scope"),
        F.col("w1_decile_drift").alias("value"),
    )
    hr = REGISTRY["stats_markov_entropy_rate"][0](spark, sf_dir).select(
        F.lit("markov_entropy_rate_bits").alias("metric"),
        F.lit("events").alias("scope"),
        rd(F.col("entropy_rate_bits"), 6).alias("value"),
    )
    return chi2.unionAll(w1).unionAll(hr)


@register(
    "pipeline_ingest_gate",
    f"""
    WITH rr AS (
      SELECT 'not_null(o_custkey)' AS rule,
             count(*) AS n_checked,
             count(*) FILTER (WHERE o_custkey IS NULL) AS n_violations
      FROM orders
      UNION ALL
      SELECT 'in_range(o_totalprice,0.0,100000.0)',
             count(*) FILTER (WHERE o_totalprice IS NOT NULL),
             count(*) FILTER (WHERE o_totalprice IS NOT NULL
                              AND (o_totalprice < 0.0 OR o_totalprice > 100000.0))
      FROM orders
      UNION ALL
      SELECT 'in_set(o_orderstatus)',
             count(*) FILTER (WHERE o_orderstatus IS NOT NULL),
             count(*) FILTER (WHERE o_orderstatus IS NOT NULL
                              AND o_orderstatus NOT IN ('F', 'O'))
      FROM orders
    ),
    dqrows AS (
      SELECT 'dq' AS section, rule AS key, 'violation_rate' AS metric,
             {R("CASE WHEN n_checked > 0 THEN CAST(n_violations AS DOUBLE)"
                " / CAST(n_checked AS DOUBLE) ELSE 0.0 END", 6)} AS value
      FROM rr
    ),
    per AS (
      SELECT source AS part, count(*) AS n_rows,
             CAST(sum(strlen(coalesce(text, '')) + 64) AS BIGINT) AS est_bytes
      FROM documents GROUP BY source
    ),
    tot AS (SELECT sum(est_bytes) AS total FROM per),
    lrows AS (
      SELECT 'layout' AS section, part AS key, 'pct_of_total' AS metric,
             {R("CAST(est_bytes AS DOUBLE) / CAST(tot.total AS DOUBLE)", 6)} AS value
      FROM per CROSS JOIN tot
      UNION ALL
      SELECT 'layout', part, 'n_files',
             CAST(greatest(1, CAST(ceil(CAST(est_bytes AS DOUBLE) / 1048576.0)
                  AS BIGINT)) AS DOUBLE)
      FROM per
    ),
    c AS (
      SELECT CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS cents
      FROM orders WHERE o_totalprice > 0
    ),
    dg AS (
      SELECT CAST(substr(CAST(cents AS VARCHAR), 1, 1) AS BIGINT) AS digit,
             count(*) AS n
      FROM c GROUP BY 1
    ),
    dt AS (SELECT sum(n) AS total FROM dg),
    brows AS (
      SELECT 'benford' AS section, CAST(digit AS VARCHAR) AS key,
             'deviation' AS metric,
             {R("CAST(dg.n AS DOUBLE) / CAST(dt.total AS DOUBLE)"
                " - log10(1.0 + 1.0 / CAST(dg.digit AS DOUBLE))", 6)} AS value
      FROM dg CROSS JOIN dt
    )
    SELECT * FROM dqrows
    UNION ALL SELECT * FROM lrows
    UNION ALL SELECT * FROM brows
    """,
)
def _q_pipeline_ingest_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The daily INGEST-GATE decision in one lazy plan: wave-8/9's
    quality suite (rule violation rates over the orders drop), the
    compaction planner's layout card (per-source byte share + target
    file counts), and the Benford first-digit deviations — composed
    into a single (section, key, metric, value) frame, the shape a
    monitoring sink or alert rule consumes (same composition policy as
    `pipeline_drift_report`). Three bounded branches, each one
    map-side-combined aggregation over its own scan; the unioned
    output is O(rules + sources + 9) rows."""
    from time_series_data_trimmer_spark.operators import layout as ly
    from time_series_data_trimmer_spark.operators import quality as dq

    orders = _table(spark, sf_dir, "orders")
    docs = _table(spark, sf_dir, "documents")
    rep = dq.expectations_report(
        orders,
        row_rules=[
            dq.not_null("o_custkey"),
            dq.in_range("o_totalprice", 0.0, 100000.0),
            dq.in_set("o_orderstatus", ["F", "O"]),
        ],
    )
    dqrows = rep.select(
        F.lit("dq").alias("section"),
        F.col("rule").alias("key"),
        F.lit("violation_rate").alias("metric"),
        F.col("violation_rate").alias("value"),
    )
    plan = ly.compaction_plan(
        docs,
        "source",
        (F.octet_length(F.coalesce(F.col("text"), F.lit(""))) + F.lit(64)).cast(
            "long"
        ),
        target_file_bytes=1024 * 1024,
    )
    lrows = plan.select(
        F.lit("layout").alias("section"),
        F.col("part").alias("key"),
        F.lit("pct_of_total").alias("metric"),
        F.col("pct_of_total").alias("value"),
    ).unionByName(
        plan.select(
            F.lit("layout").alias("section"),
            F.col("part").alias("key"),
            F.lit("n_files").alias("metric"),
            F.col("n_files").cast("double").alias("value"),
        )
    )
    cents = (
        orders.filter(F.col("o_totalprice") > 0)
        .select(
            F.floor(F.col("o_totalprice") * 100.0 + 0.5)
            .cast("long")
            .alias("__cents")
        )
    )
    g = (
        cents.select(
            F.substring(F.col("__cents").cast("string"), 1, 1)
            .cast("long")
            .alias("__digit")
        )
        .groupBy("__digit")
        .agg(F.count(F.lit(1)).alias("__n"))
    )
    t = g.agg(F.sum("__n").alias("__total"))
    brows = g.crossJoin(t).select(
        F.lit("benford").alias("section"),
        F.col("__digit").cast("string").alias("key"),
        F.lit("deviation").alias("metric"),
        rd(
            F.col("__n").cast("double") / F.col("__total").cast("double")
            - F.log10(F.lit(1.0) + F.lit(1.0) / F.col("__digit").cast("double")),
            6,
        ).alias("value"),
    )
    return dqrows.unionByName(lrows).unionByName(brows)


@register(
    "pipeline_dedup_budget_pack",
    f"""
    WITH RECURSIVE shingled AS ({_SH_SQL}),
    sig AS ({_SIG_SQL}),
    bands AS (
      SELECT doc_id, b.band,
             md5(sig[b.band * 2 + 1] || '|' || sig[b.band * 2 + 2]) AS key
      FROM sig, (VALUES (0), (1), (2), (3)) AS b(band)
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
    ),
    sym AS (
      SELECT id_a AS src, id_b AS dst FROM cand
      UNION
      SELECT id_b AS src, id_a AS dst FROM cand
    ),
    reach(src, dst) AS (
      SELECT doc_id AS src, doc_id AS dst FROM documents
      UNION
      SELECT r.src, s.dst FROM reach r JOIN sym s ON s.src = r.dst
    ),
    cl AS (SELECT src AS doc_id, min(dst) AS cluster_id FROM reach GROUP BY src),
    toks AS (
      SELECT doc_id, source,
             CAST({_SQL_NTOK} AS BIGINT) AS n_tokens,
             {_SQL_H} AS h
      FROM documents
      WHERE doc_id IN (SELECT doc_id FROM cl WHERE doc_id = cluster_id)
    ),
    budg AS (
      SELECT doc_id, n_tokens, h,
             CAST(sum(n_tokens) OVER (PARTITION BY source ORDER BY h, doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS cum_tokens
      FROM toks
    ),
    kept AS (SELECT doc_id, n_tokens, h FROM budg WHERE cum_tokens <= {_MIX_BUDGET}),
    c AS (
      SELECT doc_id, n_tokens,
             CAST(sum(n_tokens) OVER (ORDER BY h, doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS tok_end
      FROM kept
    ),
    o AS (
      SELECT n_tokens, tok_end,
             CAST(floor((tok_end - n_tokens) / 512.0) AS BIGINT) AS first_seq,
             CAST(floor((tok_end - 1) / 512.0) AS BIGINT) AS last_seq
      FROM c WHERE n_tokens > 0
    ),
    a AS (
      SELECT count(*) AS n_docs,
             sum(n_tokens) AS n_tokens,
             sum(CASE WHEN first_seq < last_seq THEN 1 ELSE 0 END) AS split_docs,
             sum(last_seq - first_seq + 1) AS fragments
      FROM o
    )
    SELECT CAST(n_docs AS BIGINT) AS n_docs,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST((n_tokens + 511) // 512 AS BIGINT) AS n_sequences,
           CAST(split_docs AS BIGINT) AS split_docs,
           {R("CAST(split_docs AS DOUBLE) / n_docs", 6)} AS split_frac,
           CAST(fragments AS BIGINT) AS fragments,
           {R("CAST(fragments AS DOUBLE) / ((n_tokens + 511) // 512)", 6)}
             AS docs_per_seq,
           CAST(((n_tokens + 511) // 512) * 512 - n_tokens AS BIGINT)
             AS tail_pad_tokens,
           {R("CAST(n_tokens AS DOUBLE) / (((n_tokens + 511) // 512) * 512)", 6)}
             AS utilization
    FROM a
    """,
)
def _q_pipeline_dedup_budget_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THE WHOLE TRAINING-DATA LAYOUT PIPELINE AS ONE LAZY PLAN:
    near-dedup (LSH + connected components) → per-source token budget
    over survivors (`mix_budget_after_dedup`'s order-that-matters) →
    concat-and-chop packing of the budgeted corpus → the one-row
    packing-efficiency audit. This is the query a user actually ships:
    every stage is the already-proven registered operator, composed
    lazily so Catalyst sees ONE plan (the budget window's source
    partitioning feeds the pack's shard prefix-sum without a
    materialization boundary). The oracle chains the same five stages
    in SQL — CC recursion, budget window, global pack cumsum, audit
    aggregate — so the composition, not just the pieces, is
    value-checked."""
    docs = _table(spark, sf_dir, "documents")
    comp = dd.dedup_components(docs)
    keep = comp.filter(F.col("doc_id") == F.col("cluster_id")).select("doc_id")
    surv = docs.join(keep.hint("shuffle_hash"), "doc_id", "left_semi")
    budgeted = sp.token_budget_per_stratum(surv, _MIX_BUDGET).select("doc_id")
    final_docs = docs.join(budgeted.hint("shuffle_hash"), "doc_id", "left_semi")
    packed = sp.sequence_pack_offsets(final_docs, seq_len=512)
    return _pack_efficiency_agg(packed)


@register(
    "pipeline_pack_real_tokens",
    _bpe_cte(_BPE_ROUNDS)
    + f""",
    enc AS (
      SELECT doc_id,
             CAST(len({_BPE_PAIR_TOKS}) AS BIGINT) AS n_tokens,
             {_SQL_H} AS h
      FROM s{_BPE_ROUNDS}
    ),
    c AS (
      SELECT doc_id, n_tokens,
             CAST(sum(n_tokens) OVER (ORDER BY h, doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS tok_end
      FROM enc
    )
    SELECT doc_id, n_tokens, tok_end - n_tokens AS tok_start, tok_end,
           CAST(floor((tok_end - n_tokens) / 512.0) AS BIGINT) AS first_seq,
           CAST(floor((tok_end - 1) / 512.0) AS BIGINT) AS last_seq
    FROM c WHERE n_tokens > 0
    """,
)
def _q_pipeline_pack_real_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The packing pipeline on REAL tokens: train merges → `bpe_encode`
    the corpus → `sequence_pack_offsets` (seq_len=512) budgeting on the
    ENCODED counts via its ``n_tokens_col`` hook — so the layout step
    stops trusting the chars/4 `bpe_ish_token_estimate` it used since
    r4. Same scale-safe distributed prefix-sum (shard = hash top bits,
    per-shard window + broadcast base offsets, no keyless window); the
    encode adds one scan-side codegen pass. Oracle chains the full BPE
    replay into the simple global-window packing SQL — training,
    encoding, and packing are all value-checked end-to-end in ONE
    query."""
    docs = _table(spark, sf_dir, "documents")
    merges = tx.bpe_train_merges(docs, rounds=_BPE_ROUNDS)
    counts = tx.bpe_encode_auto(docs, merges).select(
        "doc_id", F.size("bpe_tokens").cast("long").alias("n_tokens")
    )
    return sp.sequence_pack_offsets(
        counts, seq_len=512, n_tokens_col="n_tokens"
    )


@register(
    "pipeline_budget_pack_real_tokens",
    _bpe_cte(_BPE_ROUNDS)
    + f""",
    enc AS (
      SELECT s.doc_id AS doc_id, d.source AS source,
             CAST(len({_BPE_PAIR_TOKS}) AS BIGINT) AS n_tokens,
             {sp.sql_hash_u32("s.doc_id")} AS h
      FROM s{_BPE_ROUNDS} s JOIN documents d ON d.doc_id = s.doc_id
    ),
    b AS (
      SELECT doc_id, source, n_tokens, h,
             CAST(sum(n_tokens) OVER (PARTITION BY source ORDER BY h, doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS cum_tokens
      FROM enc
    ),
    kept AS (SELECT * FROM b WHERE cum_tokens <= {_MIX_BUDGET}),
    c AS (
      SELECT doc_id, source, n_tokens, cum_tokens,
             CAST(sum(n_tokens) OVER (ORDER BY h, doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS tok_end
      FROM kept
    )
    SELECT doc_id, source, n_tokens, cum_tokens,
           tok_end - n_tokens AS tok_start, tok_end,
           CAST(floor((tok_end - n_tokens) / 512.0) AS BIGINT) AS first_seq,
           CAST(floor((tok_end - 1) / 512.0) AS BIGINT) AS last_seq
    FROM c WHERE n_tokens > 0
    """,
)
def _q_pipeline_budget_pack_real_tokens(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """REAL-TOKEN adoption closed end-to-end (VERDICT r8 #6): train
    merges → `bpe_encode` the corpus → `token_budget_per_stratum` on
    the ENCODED counts (its new ``n_tokens_col`` hook — until r9 the
    budget silently re-estimated chars/4 internally, so mixes were
    budgeted on estimates while packs ran on real counts) →
    `sequence_pack_offsets` on the same real counts. One count column
    flows through budget AND pack, so the two stages can no longer
    disagree about what a token is. Oracle chains the full BPE replay
    into the stratum-budget window and the packing prefix-sum —
    training, encoding, budgeting, and packing value-checked in ONE
    query."""
    docs = _table(spark, sf_dir, "documents")
    merges = tx.bpe_train_merges(docs, rounds=_BPE_ROUNDS)
    counts = tx.bpe_encode_auto(docs, merges).select(
        "doc_id", F.size("bpe_tokens").cast("long").alias("__nt")
    )
    joined = (
        docs.select("doc_id", "source")
        .join(counts.hint("shuffle_hash"), "doc_id")
    )
    # r13 (guide §2.4): budgeted embeds the Arrow BPE encode and is
    # consumed by TWO separate jobs (the packer's internal prefix-sum
    # checkpoint and the final re-join) — cross-JOB runs can't share
    # exchanges, so the lazy form ran the encode twice. Checkpoint the
    # narrow (id, source, counts) rows once.
    budgeted = (
        sp.token_budget_per_stratum(joined, _MIX_BUDGET, n_tokens_col="__nt")
        .select("doc_id", "source", "n_tokens", "cum_tokens")
        .localCheckpoint(eager=False)
    )
    packed = sp.sequence_pack_offsets(
        budgeted, seq_len=512, n_tokens_col="n_tokens"
    )
    return packed.join(
        budgeted.select("doc_id", "source", "cum_tokens").hint(
            "shuffle_hash"
        ),
        "doc_id",
    ).select(
        "doc_id", "source", "n_tokens", "cum_tokens",
        "tok_start", "tok_end", "first_seq", "last_seq",
    )
