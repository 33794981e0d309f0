"""Extension query registry: TPC-H-style relational queries, corpus
dedup / similarity / text-analysis operators, and a Structured
Streaming tumbling-window aggregation — each with a DuckDB oracle.

Same determinism conventions as queries.py (decimal accumulation for
unordered sums, floor-formula rounding, md5-only hashing).
"""

from __future__ import annotations

import os


from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from time_series_data_trimmer_spark.functions.rounding import rd, sql_rd
from time_series_data_trimmer_spark.operators import aggregates as ag
from time_series_data_trimmer_spark.operators import dedup as dd
from time_series_data_trimmer_spark.operators import edits
from time_series_data_trimmer_spark.operators import sampling as sp
from time_series_data_trimmer_spark.operators import similarity as sim
from time_series_data_trimmer_spark.operators import text as tx
from time_series_data_trimmer_spark.queries import REGISTRY, _events, _table, register

R = sql_rd


def _dsum(term, scale: int = 4):
    """Order-independent SUM: round term, accumulate as exact decimal,
    surface as double."""
    return F.sum(rd(term, scale).cast("decimal(38,6)")).cast("double")


def _sql_dsum(term: str, scale: int = 4) -> str:
    return f"CAST(sum(CAST({sql_rd(term, scale)} AS DECIMAL(38,6))) AS DOUBLE)"


# ---------------------------------------------------------------------------
# TPC-H-style relational extension (SURVEY §7.3-M6)
# ---------------------------------------------------------------------------


@register(
    "tpch_q1_pricing_summary",
    f"""
    SELECT l_returnflag, l_linestatus,
           {_sql_dsum("l_quantity")} AS sum_qty,
           {_sql_dsum("l_extendedprice")} AS sum_base_price,
           {_sql_dsum("l_extendedprice * (1.0 - l_discount)")} AS sum_disc_price,
           {_sql_dsum("l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)")} AS sum_charge,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def _q_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    charge = disc_price * (F.lit(1.0) + F.col("l_tax"))
    return (
        l.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _dsum(F.col("l_quantity")).alias("sum_qty"),
            _dsum(F.col("l_extendedprice")).alias("sum_base_price"),
            _dsum(disc_price).alias("sum_disc_price"),
            _dsum(charge).alias("sum_charge"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "tpch_q3_shipping_priority",
    f"""
    SELECT l.l_orderkey AS order_key,
           {_sql_dsum("l.l_extendedprice * (1.0 - l.l_discount)")} AS revenue,
           o.o_orderdate AS order_date
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
      AND l.l_shipdate  > TIMESTAMP '1995-03-15 00:00:00'
    GROUP BY l.l_orderkey, o.o_orderdate
    ORDER BY revenue DESC, order_key ASC
    LIMIT 10
    """,
)
def _q_tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1995-03-15 00:00:00").cast("timestamp")
    )
    l = _table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1995-03-15 00:00:00").cast("timestamp")
    )
    # orders and customer both scale with SF, so neither may be
    # force-broadcast (an unconditional hint overrides the size
    # threshold and OOMs at 100×). shuffle_hash keeps the join
    # sort-free; AQE upgrades it to broadcast at runtime whenever the
    # filtered side actually fits.
    joined = l.join(o.hint("shuffle_hash"), l["l_orderkey"] == o["o_orderkey"]).join(
        c.hint("shuffle_hash"), o["o_custkey"] == c["c_custkey"]
    )
    rev = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    return (
        joined.groupBy(F.col("l_orderkey").alias("order_key"), F.col("o_orderdate").alias("order_date"))
        .agg(_dsum(rev).alias("revenue"))
        .select("order_key", "revenue", "order_date")
        .orderBy(F.col("revenue").desc(), F.col("order_key").asc())
        .limit(10)
    )


@register(
    "tpch_q5_local_supplier_volume",
    f"""
    SELECT n.n_name AS nation,
           {_sql_dsum("l.l_extendedprice * (1.0 - l.l_discount)")} AS revenue
    FROM lineitem l
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
    GROUP BY n.n_name
    """,
)
def _q_tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _table(spark, sf_dir, "lineitem")
    s = _table(spark, sf_dir, "supplier")
    n = _table(spark, sf_dir, "nation")
    r = _table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    dim = (
        s.join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .select("s_suppkey", "n_name")
    )
    rev = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    # nation/region are constant-size → broadcast; supplier scales with
    # SF → shuffle_hash (AQE broadcasts it at runtime while it fits)
    return (
        l.join(dim.hint("shuffle_hash"), l["l_suppkey"] == dim["s_suppkey"])
        .groupBy(F.col("n_name").alias("nation"))
        .agg(_dsum(rev).alias("revenue"))
    )


@register(
    "topk_orders_by_price",
    """
    SELECT o_orderkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 25
    """,
)
def _q_topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    # TakeOrdered physical op: per-partition partial top-k, only k rows
    # per partition reach the driver-side merge — no global sort.
    return (
        _table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(25)
    )


# ---------------------------------------------------------------------------
# Dedup operators over documents
# ---------------------------------------------------------------------------

# grams from coalesce(text, ''): Spark's word_shingles(NULL) yields the
# single "" shingle (concat_ws over a null array), and string_split('')
# reproduces it — NULL-text docs carry [''] in BOTH engines
_SH_SQL = """
    SELECT doc_id,
           list_distinct(CASE WHEN len(w) >= 3
             THEN list_transform(generate_series(1, len(w) - 2),
                                 i -> array_to_string(list_slice(w, i, i + 2), ' '))
             ELSE [array_to_string(w, ' ')] END) AS grams
    FROM (SELECT doc_id, string_split(coalesce(text, ''), ' ') AS w FROM documents)
"""

_SIG_SQL = (
    "SELECT doc_id, ["
    + ", ".join(
        (
            f"list_min(list_transform(grams, x -> substr(md5(x), {(s % 4) * 8 + 1}, 8)))"
            if s < 4
            else f"list_min(list_transform(grams, x -> substr(md5('x' || x), {(s % 4) * 8 + 1}, 8)))"
        )
        for s in range(dd.DEFAULT_NUM_HASHES)
    )
    + "] AS sig FROM shingled"
)


@register(
    "dedup_exact_groups",
    """
    SELECT md5(text) AS content_key, min(doc_id) AS keep_id, count(*) AS dup_count
    FROM documents GROUP BY md5(text)
    """,
)
def _q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dd.exact_dedup_groups(_table(spark, sf_dir, "documents"))


@register(
    "dedup_minhash_lsh_pairs",
    f"""
    WITH shingled AS ({_SH_SQL}),
    sig AS ({_SIG_SQL}),
    bands AS (
      SELECT doc_id, b.band,
             md5(sig[b.band * 2 + 1] || '|' || sig[b.band * 2 + 2]) AS key
      FROM sig, (VALUES (0), (1), (2), (3)) AS b(band)
    )
    SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
    FROM bands a JOIN bands b
      ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
    """,
)
def _q_minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dd.minhash_lsh_pairs(_table(spark, sf_dir, "documents"))


@register(
    "dedup_ngram_jaccard",
    f"""
    WITH shingled AS ({_SH_SQL}),
    base AS (
      SELECT s.doc_id, s.grams, length(d.text) // 64 AS bucket
      FROM shingled s JOIN documents d USING (doc_id)
    ),
    cand AS (
      -- NULL text => NULL bucket => ONE NULL block row (mirrors the
      -- Spark side's array_distinct([NULL, NULL]); list_distinct would
      -- DROP the NULL, so the CASE keeps it explicitly)
      SELECT doc_id, grams,
             unnest(CASE WHEN bucket IS NULL THEN [CAST(NULL AS BIGINT)]
                    ELSE [bucket, bucket + 1] END) AS blk
      FROM base
    ),
    capped AS (
      SELECT doc_id, grams, blk FROM cand
      QUALIFY row_number() OVER (PARTITION BY blk ORDER BY doc_id) <= {dd.DEFAULT_MAX_BUCKET}
    ),
    pairs AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
             len(list_intersect(a.grams, b.grams)) AS i,
             len(list_distinct(list_concat(a.grams, b.grams))) AS u
      FROM capped a JOIN capped b ON a.blk IS NOT DISTINCT FROM b.blk AND a.doc_id < b.doc_id
    )
    SELECT id_a, id_b, CAST(i AS DOUBLE) / CAST(u AS DOUBLE) AS jaccard
    FROM pairs WHERE CAST(i AS DOUBLE) / CAST(u AS DOUBLE) >= 0.2
    """,
)
def _q_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Primary form now runs the DEFAULT (bounded) blocking: every
    length block capped at dedup.DEFAULT_MAX_BUCKET docs, reproduced
    in SQL with the same QUALIFY cap — the unbounded variant is no
    longer registered anywhere (it remains callable with
    max_bucket=None as a small-corpus verification path)."""
    return dd.ngram_jaccard_pairs(_table(spark, sf_dir, "documents"), min_jaccard=0.2)


@register(
    "dedup_ngram_jaccard_capped",
    f"""
    WITH shingled AS ({_SH_SQL}),
    base AS (
      SELECT s.doc_id, s.grams, length(d.text) // 64 AS bucket
      FROM shingled s JOIN documents d USING (doc_id)
    ),
    cand AS (
      -- NULL text => NULL bucket => ONE NULL block row (mirrors the
      -- Spark side's array_distinct([NULL, NULL]); list_distinct would
      -- DROP the NULL, so the CASE keeps it explicitly)
      SELECT doc_id, grams,
             unnest(CASE WHEN bucket IS NULL THEN [CAST(NULL AS BIGINT)]
                    ELSE [bucket, bucket + 1] END) AS blk
      FROM base
    ),
    capped AS (
      SELECT doc_id, grams, blk FROM cand
      QUALIFY row_number() OVER (PARTITION BY blk ORDER BY doc_id) <= 40
    ),
    pairs AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
             len(list_intersect(a.grams, b.grams)) AS i,
             len(list_distinct(list_concat(a.grams, b.grams))) AS u
      FROM capped a JOIN capped b ON a.blk IS NOT DISTINCT FROM b.blk AND a.doc_id < b.doc_id
    )
    SELECT id_a, id_b, CAST(i AS DOUBLE) / CAST(u AS DOUBLE) AS jaccard
    FROM pairs WHERE CAST(i AS DOUBLE) / CAST(u AS DOUBLE) >= 0.2
    """,
)
def _q_ngram_jaccard_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The bounded-bucket production variant through the gate: each
    length block truncated to its first 40 docs by id (deterministic),
    reproduced in SQL with the same QUALIFY cap — proves the skew guard
    changes candidate sets identically in both engines."""
    return dd.ngram_jaccard_pairs(
        _table(spark, sf_dir, "documents"), min_jaccard=0.2, max_bucket=40
    )


_PREFIX_TAU = 0.2


@register(
    "dedup_ngram_jaccard_prefix",
    f"""
    WITH sub AS (
      SELECT doc_id, text FROM documents WHERE doc_id % 2 = 0
    ),
    shingled AS (
      SELECT doc_id,
             list_distinct(CASE WHEN len(w) >= 3
               THEN list_transform(generate_series(1, len(w) - 2),
                                   i -> array_to_string(list_slice(w, i, i + 2), ' '))
               ELSE [array_to_string(w, ' ')] END) AS grams
      FROM (SELECT doc_id, string_split(text, ' ') AS w FROM sub)
    ),
    pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             len(list_intersect(a.grams, b.grams)) AS i,
             len(list_distinct(list_concat(a.grams, b.grams))) AS u
      FROM shingled a JOIN shingled b ON a.doc_id < b.doc_id
    )
    SELECT id_a, id_b, CAST(i AS DOUBLE) / CAST(u AS DOUBLE) AS jaccard
    FROM pairs WHERE CAST(i AS DOUBLE) / CAST(u AS DOUBLE) >= {_PREFIX_TAU}
    """,
)
def _q_ngram_jaccard_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT τ-Jaccard join via PPJoin-style prefix filtering: the
    oracle is plain BRUTE FORCE over all pairs — prefix filtering has
    zero false negatives, so the blocked Spark plan must reproduce the
    exhaustive answer verbatim. Restricted to half the corpus (doc_id
    parity — keeps cross-source near-dups, unlike a source filter) so
    the quadratic oracle stays cheap; the Spark side scales by
    blocking on each doc's rarest grams (candidate volume tracks
    rare-gram df², not corpus size)."""
    docs = _table(spark, sf_dir, "documents").filter(F.col("doc_id") % 2 == 0)
    return dd.ngram_jaccard_prefix_pairs(docs, min_jaccard=_PREFIX_TAU)


_SIMHASH_BITS_SQL = "count(*) AS n, " + ", ".join(
    f"sum((h >> {b}) & 1) AS b{b}" for b in range(dd.SIMHASH_BITS)
)
_SIMHASH_FP_SQL = " + ".join(
    f"CASE WHEN 2 * b{b} - n > 0 THEN CAST({2**b} AS BIGINT) ELSE 0 END"
    for b in range(dd.SIMHASH_BITS)
)


@register(
    "dedup_simhash",
    f"""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
    ),
    hashed AS (
      SELECT doc_id, ('0x' || substr(md5(tok), 1, 15))::BIGINT AS h FROM toks
    ),
    bits AS (SELECT doc_id, {_SIMHASH_BITS_SQL} FROM hashed GROUP BY doc_id)
    SELECT doc_id, {_SIMHASH_FP_SQL} AS simhash FROM bits
    """,
)
def _q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dd.simhash(_table(spark, sf_dir, "documents"))


# the N-adaptive combinatorial blocking layout, shared verbatim with the
# oracle: m chunks, every (m − h)-subset of chunk indices is a blocking
# key (pigeonhole over Hamming ≤ h) — the SQL enumerates the SAME combos
_SIMHASH_M, _SIMHASH_COMBOS = dd.simhash_chunk_plan(3, n_chunks=6)
_SIMHASH_W = dd.SIMHASH_BITS // _SIMHASH_M
_SIMHASH_COMBO_VALUES = ", ".join(
    "(" + ", ".join(str(x) for x in (ci, *combo)) + ")"
    for ci, combo in enumerate(_SIMHASH_COMBOS)
)
_SIMHASH_COMBO_COLS = ", ".join(f"c{p}" for p in range(len(_SIMHASH_COMBOS[0])))
_SIMHASH_KEY_SQL = " + ".join(
    f"(((simhash >> (cb.c{p} * {_SIMHASH_W})) & {(1 << _SIMHASH_W) - 1}) << {p * _SIMHASH_W})"
    for p in range(len(_SIMHASH_COMBOS[0]))
)


@register(
    "dedup_simhash_pairs",
    f"""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
    ),
    hashed AS (
      SELECT doc_id, ('0x' || substr(md5(tok), 1, 15))::BIGINT AS h FROM toks
    ),
    bits AS (SELECT doc_id, {_SIMHASH_BITS_SQL} FROM hashed GROUP BY doc_id),
    fp AS (SELECT doc_id, {_SIMHASH_FP_SQL} AS simhash FROM bits),
    ck AS (
      SELECT doc_id, simhash, cb.combo_id, {_SIMHASH_KEY_SQL} AS cv
      FROM fp, (VALUES {_SIMHASH_COMBO_VALUES}) cb(combo_id, {_SIMHASH_COMBO_COLS})
    ),
    pairs AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
             a.simhash AS ha, b.simhash AS hb
      FROM ck a JOIN ck b
        ON a.combo_id = b.combo_id AND a.cv = b.cv AND a.doc_id < b.doc_id
    )
    SELECT id_a, id_b, CAST(bit_count(xor(ha, hb)) AS INTEGER) AS hamming
    FROM pairs WHERE bit_count(xor(ha, hb)) <= 3
    """,
)
def _q_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pigeonhole-blocked SimHash near-dup pairs with the N-adaptive
    combinatorial layout (m=6 chunks × 10 bits, C(6,3)=20 subsets →
    30-bit keys: bucket size N/2^30 instead of the old fixed layout's
    N/2^15). The oracle replicates fingerprint + the SAME combo table
    + Hamming filter in SQL (bit ops are engine-portable, the hash
    family is md5-only)."""
    fp = dd.simhash(_table(spark, sf_dir, "documents"))
    out = dd.simhash_pairs(fp, max_hamming=3, n_chunks=_SIMHASH_M)
    return out.select("id_a", "id_b", F.col("hamming").cast("int").alias("hamming"))


@register(
    "dedup_clusters",
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
    )
    SELECT src AS doc_id, min(dst) AS cluster_id FROM reach GROUP BY src
    """,
)
def _q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup clusters over the minhash-LSH candidate pairs: every
    document labeled with the min id reachable through the pair graph
    (iterative min-label propagation; the oracle computes the same
    fixpoint with a recursive CTE). Singletons keep their own id."""
    docs = _table(spark, sf_dir, "documents")
    pairs = dd.minhash_lsh_pairs(docs)
    return dd.connected_components(pairs, all_ids=docs.select("doc_id"))


# ---------------------------------------------------------------------------
# Similarity search over embeddings
# ---------------------------------------------------------------------------

_EX_SQL = """
      SELECT vec_id, u['i'] AS i, CAST(u['v'] AS DOUBLE) AS x
      FROM (SELECT vec_id,
                   unnest(list_transform(embedding, (x, i) -> {'v': x, 'i': i})) AS u
            FROM embeddings)
"""

_DOT_TERMS = """
      SELECT e.vec_id,
             sum(CAST({p1} AS DECIMAL(38,9))) AS dxy,
             sum(CAST({p2} AS DECIMAL(38,9))) AS dxx,
             sum(CAST({p3} AS DECIMAL(38,9))) AS dyy
      FROM (SELECT vec_id, u['i'] AS i, CAST(u['v'] AS DOUBLE) AS x
            FROM (SELECT vec_id,
                         unnest(list_transform(embedding, (x, i) -> {{'v': x, 'i': i}})) AS u
                  FROM embeddings)) e
      JOIN (SELECT u['i'] AS i, CAST(u['v'] AS DOUBLE) AS y
            FROM (SELECT unnest(list_transform(qv, (x, i) -> {{'v': x, 'i': i}})) AS u
                  FROM q)) qx
        ON e.i = qx.i
      GROUP BY e.vec_id
""".format(
    p1=sql_rd("e.x * qx.y", 9),
    p2=sql_rd("e.x * e.x", 9),
    p3=sql_rd("qx.y * qx.y", 9),
)


@register(
    "sim_cosine_scores",
    f"""
    WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
    dots AS ({_DOT_TERMS})
    SELECT vec_id,
           {R("CAST(dxy AS DOUBLE) / (sqrt(CAST(dxx AS DOUBLE)) * sqrt(CAST(dyy AS DOUBLE)))", 6)} AS cosine
    FROM dots
    """,
)
def _q_cosine_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _table(spark, sf_dir, "embeddings")
    qvec = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    scored = sim.decimal_cosine_vs_query(emb, qvec)
    return scored.select("vec_id", rd(F.col("cosine"), 6).alias("cosine"))


@register(
    "sim_ann_topk",
    f"""
    WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
    dots AS ({_DOT_TERMS})
    SELECT vec_id,
           {R("CAST(dxy AS DOUBLE) / (sqrt(CAST(dxx AS DOUBLE)) * sqrt(CAST(dyy AS DOUBLE)))", 6)} AS cosine
    FROM dots
    ORDER BY cosine DESC, vec_id ASC
    LIMIT 10
    """,
)
def _q_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _table(spark, sf_dir, "embeddings")
    qvec = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    scored = sim.decimal_cosine_vs_query(emb, qvec).select(
        "vec_id", rd(F.col("cosine"), 6).alias("cosine")
    )
    return scored.orderBy(F.col("cosine").desc(), F.col("vec_id").asc()).limit(10)


_LSH_Q_BITS = 6  # 2^6 buckets over the probe table


@register(
    "sim_lsh_topk",
    f"""
    WITH ex AS ({_EX_SQL}),
    planes AS (
      SELECT b.b, i.i,
             ('0x' || substr(md5('tsdt|t0|' || b.b || '|' || i.i), 1, 8))::BIGINT
               / 2147483648.0 - 1.0 AS w
      FROM generate_series(0, {_LSH_Q_BITS - 1}) b(b),
           generate_series(0, 63) i(i)
    ),
    pdots AS (
      SELECT e.vec_id, p.b,
             CAST(sum(CAST({sql_rd("e.x * p.w", 9)} AS DECIMAL(38,9))) AS DOUBLE) AS d
      FROM ex e JOIN planes p ON p.i = e.i - 1
      GROUP BY e.vec_id, p.b
    ),
    sigs AS (
      SELECT vec_id,
             sum(CASE WHEN d > 0 THEN CAST(1 AS BIGINT) << b ELSE 0 END) AS sig
      FROM pdots GROUP BY vec_id
    ),
    qsig AS (SELECT sig FROM sigs WHERE vec_id = 0),
    q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
    dots AS ({_DOT_TERMS})
    SELECT d.vec_id,
           {R("CAST(dxy AS DOUBLE) / (sqrt(CAST(dxx AS DOUBLE)) * sqrt(CAST(dyy AS DOUBLE)))", 6)} AS cosine
    FROM dots d JOIN sigs s ON s.vec_id = d.vec_id, qsig
    WHERE s.sig = qsig.sig
    ORDER BY cosine DESC, d.vec_id ASC
    LIMIT 10
    """,
)
def _q_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH probe top-k: score only the query's hyperplane bucket.
    Bucket assignment uses decimal-exact dot signs (lsh_signatures), so
    the oracle reproduces the bucket — the probe reads |bucket| ≈ N/2^bits
    vectors instead of N."""
    emb = _table(spark, sf_dir, "embeddings")
    qvec = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    sigs = sim.lsh_signatures(emb, dim=len(qvec), bits=_LSH_Q_BITS, tables=1)
    qsig = int(sigs.filter(F.col("vec_id") == 0).first()["sig"])  # bounded 1-row fetch
    bucket = sigs.filter(F.col("sig") == qsig).select("vec_id")
    scored = sim.decimal_cosine_vs_query(emb.join(bucket, "vec_id"), qvec)
    return (
        scored.select("vec_id", rd(F.col("cosine"), 6).alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col("vec_id").asc())
        .limit(10)
    )


# ---------------------------------------------------------------------------
# Text analysis over documents
# ---------------------------------------------------------------------------


def _occ_sql(word: str) -> str:
    pad = f"' ' || lower(text) || ' '"
    needle = f" {word} "
    return (
        f"(length({pad}) - length(replace({pad}, '{needle}', ''))) / {len(needle)}.0"
    )


def _lang_score_sql(lang: str) -> str:
    return " + ".join(_occ_sql(w) for w in tx.LANG_MARKERS[lang])


_LANG_BEST = "greatest(" + ", ".join(f"s_{lang}" for lang in tx.LANG_MARKERS) + ")"
_LANG_CASE = (
    "CASE WHEN " + _LANG_BEST + " <= 0 THEN 'und' "
    + " ".join(
        f"WHEN s_{lang} = {_LANG_BEST} THEN '{lang}'" for lang in sorted(tx.LANG_MARKERS)
    )
    + " ELSE 'und' END"
)


@register(
    "text_language_id",
    f"""
    WITH scored AS (
      SELECT doc_id, lang,
             {", ".join(f"{_lang_score_sql(lang)} AS s_{lang}" for lang in tx.LANG_MARKERS)}
      FROM documents
    )
    SELECT doc_id, lang, {_LANG_CASE} AS lang_pred FROM scored
    """,
)
def _q_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _table(spark, sf_dir, "documents")
    return tx.language_id(docs).select("doc_id", "lang", "lang_pred")


@register(
    "text_quality_score",
    f"""
    WITH feats AS (
      SELECT doc_id,
             length(text) AS q_n_chars,
             CASE WHEN length(trim(text)) = 0 THEN 0
                  ELSE len(string_split(trim(text), ' ')) END AS q_n_tokens,
             ({" + ".join(f"(length(text) - length(replace(text, '{c}', '')))" for c in ".,;:!?")}) AS punct,
             ({" + ".join(f"(length(text) - length(replace(text, '{c}', '')))" for c in "0123456789")}) AS digits,
             ({_lang_score_sql("en")}) AS stop_hits
      FROM documents
    ),
    ratios AS (
      SELECT doc_id, q_n_chars, q_n_tokens,
             CAST(punct AS DOUBLE) / (CASE WHEN q_n_chars = 0 THEN 1 ELSE q_n_chars END) AS q_punct_ratio,
             CAST(digits AS DOUBLE) / (CASE WHEN q_n_chars = 0 THEN 1 ELSE q_n_chars END) AS q_digit_ratio,
             stop_hits / (CASE WHEN q_n_tokens = 0 THEN 1 ELSE q_n_tokens END) AS q_stopword_ratio
      FROM feats
    )
    SELECT doc_id, CAST(q_n_chars AS BIGINT) AS q_n_chars, q_n_tokens,
           {R('''(CASE WHEN q_n_chars >= 100 AND q_n_chars <= 20000 THEN 0.4 ELSE 0.0 END)
             + least(q_stopword_ratio * 2.0, 0.4)
             + (0.2 - least((q_punct_ratio + q_digit_ratio) * 1.0, 0.2))''', 6)} AS quality
    FROM ratios
    """,
)
def _q_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _table(spark, sf_dir, "documents")
    scored = tx.quality_score(docs)
    return scored.select(
        "doc_id",
        F.col("q_n_chars").cast("long").alias("q_n_chars"),
        "q_n_tokens",
        rd(F.col("quality"), 6).alias("quality"),
    )


@register(
    "text_token_counts",
    """
    SELECT doc_id,
           CASE WHEN length(trim(text)) = 0 THEN 0
                ELSE len(string_split(trim(text), ' ')) END AS n_tokens,
           greatest(CAST(floor(length(text) / 4) AS BIGINT),
                    CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                         ELSE len(string_split(trim(text), ' ')) END AS BIGINT)) AS n_bpe_est
    FROM documents
    """,
)
def _q_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        tx.token_count(F.col("text")).cast("long").alias("n_tokens"),
        tx.bpe_ish_token_estimate(F.col("text")).alias("n_bpe_est"),
    )


@register(
    "text_fingerprint",
    """
    SELECT doc_id,
           md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) AS fingerprint
    FROM documents
    """,
)
def _q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tx.fingerprint(_table(spark, sf_dir, "documents")).select("doc_id", "fingerprint")


@register(
    "text_winnow_fingerprint",
    """
    WITH norm AS (
      SELECT doc_id, trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')) AS t
      FROM documents
    )
    SELECT doc_id,
           list_min(list_transform(
             generate_series(1, greatest(length(t) - 15, 1)),
             i -> md5(substr(t, i, 16)))) AS winnow_fp
    FROM norm
    """,
)
def _q_winnow(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tx.rolling_hash_fingerprint(_table(spark, sf_dir, "documents")).select(
        "doc_id", "winnow_fp"
    )


@register(
    "text_redact_fingerprint",
    f"""
    SELECT doc_id,
           md5(regexp_replace(regexp_replace(regexp_replace(text,
             '{tx.REDACT_PATTERNS[0][0]}', '<EMAIL>', 'g'),
             '{tx.REDACT_PATTERNS[1][0]}', '<URL>', 'g'),
             '{tx.REDACT_PATTERNS[2][0]}', '<NUM>', 'g')) AS redacted_md5
    FROM documents
    """,
)
def _q_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII-ish scrubbing verified end-to-end: md5 of the redacted text
    must match an independent engine applying the same pattern chain
    (the synthetic corpus contains no PII, so this checks the regex
    dialect portability; behavioral coverage is in test_extensions)."""
    out = tx.redact_documents(_table(spark, sf_dir, "documents"))
    return out.select("doc_id", F.md5(F.col("text_redacted")).alias("redacted_md5"))


@register(
    "text_token_percentiles",
    f"""
    WITH nt AS (
      SELECT lang,
             CASE WHEN length(trim(text)) = 0 THEN 0
                  ELSE len(string_split(trim(text), ' ')) END AS n_tokens
      FROM documents
    )
    SELECT lang, count(*) AS n_docs,
           {R("quantile_cont(n_tokens, 0.5)", 6)} AS p50,
           {R("quantile_cont(n_tokens, 0.9)", 6)} AS p90,
           {R("quantile_cont(n_tokens, 0.99)", 6)} AS p99
    FROM nt GROUP BY lang
    """,
)
def _q_token_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = tx.token_percentiles(_table(spark, sf_dir, "documents"))
    return out.select(
        "lang", "n_docs",
        rd(F.col("p50"), 6).alias("p50"),
        rd(F.col("p90"), 6).alias("p90"),
        rd(F.col("p99"), 6).alias("p99"),
    )


@register(
    "text_dup_rate_by_source",
    f"""
    SELECT source, count(*) AS n_docs,
           count(DISTINCT md5(text)) AS n_distinct,
           {R("CAST(count(*) - count(DISTINCT md5(text)) AS DOUBLE) / count(*)", 6)} AS dup_rate
    FROM documents GROUP BY source
    """,
)
def _q_dup_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = tx.dup_rate_by_source(_table(spark, sf_dir, "documents"))
    return out.select("source", "n_docs", "n_distinct", rd(F.col("dup_rate"), 6).alias("dup_rate"))


@register(
    "text_inverted_index",
    """
    WITH toks AS (
      SELECT doc_id, unnest(string_split(trim(text), ' ')) AS token FROM documents
    ),
    t2 AS (SELECT * FROM toks WHERE length(token) > 0),
    occ AS (SELECT token, count(*) AS total_occurrences FROM t2 GROUP BY token),
    post AS (SELECT token, doc_id FROM t2 GROUP BY 1, 2),
    idx AS (
      SELECT token, count(*) AS doc_freq,
             string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS postings
      FROM post GROUP BY token
    )
    SELECT i.token, i.doc_freq, o.total_occurrences, i.postings
    FROM idx i JOIN occ o USING (token)
    ORDER BY doc_freq DESC, token LIMIT 100
    """,
)
def _q_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index build for the 100 highest-df tokens: one
    map-side-combined aggregation on the token ((token, id) pairs
    shuffle, never text), postings as sorted id strings, TakeOrdered
    top-k. The doc_freq-desc/token-asc order is strict and total, so
    the LIMIT selects the same set in both engines."""
    return tx.inverted_index(_table(spark, sf_dir, "documents"), top_k=100)


# ---------------------------------------------------------------------------
# Deterministic sampling / data mixing (training-data pipeline ops):
# membership is a pure function of md5(seed|key) — reproducible across
# reruns, partitionings, and engines, unlike df.sample's per-partition
# RNG. All integer math; the oracles replicate the hash bit-for-bit.
# ---------------------------------------------------------------------------

_SAMPLE_RATE = 0.25
_STRATA_RATES = {"src0": 0.8, "src1": 0.5, "src2": 0.25}
_STRATA_DEFAULT = 0.1
_MIX_BUDGET = 600
_SQL_H = sp.sql_hash_u32("doc_id")
_SQL_NTOK = (
    "CASE WHEN length(trim(text)) = 0 THEN 0 "
    "ELSE len(string_split(trim(text), ' ')) END"
)


@register(
    "sample_hash_bernoulli",
    f"""
    SELECT doc_id, source FROM documents
    WHERE {_SQL_H} < {int(_SAMPLE_RATE * (1 << 32))}
    """,
)
def _q_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic Bernoulli sample (keep iff hash_u32(doc_id) <
    rate·2³²): scan-side codegen, no shuffle, membership stable under
    repartitioning — the reproducible alternative to df.sample."""
    out = sp.hash_sample(_table(spark, sf_dir, "documents"), _SAMPLE_RATE)
    return out.select("doc_id", "source")


_STRATA_CASE = (
    "CASE "
    + " ".join(
        f"WHEN source = '{s}' THEN {int(r * (1 << 32))}"
        for s, r in sorted(_STRATA_RATES.items())
    )
    + f" ELSE {int(_STRATA_DEFAULT * (1 << 32))} END"
)


@register(
    "sample_stratified_by_source",
    f"""
    SELECT doc_id, source FROM documents
    WHERE {_SQL_H} < {_STRATA_CASE}
    """,
)
def _q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-stratum deterministic sampling — the data-mixing primitive
    ('80% of src0, 50% of src1, 25% of src2, 10% of the rest'). The
    per-row threshold is a CASE over the stratum: still one scan, no
    join, no shuffle."""
    out = sp.stratified_hash_sample(
        _table(spark, sf_dir, "documents"), _STRATA_RATES, _STRATA_DEFAULT
    )
    return out.select("doc_id", "source")


@register(
    "mix_token_budget_per_source",
    f"""
    WITH toks AS (
      SELECT doc_id, source,
             CAST({_SQL_NTOK} AS BIGINT) AS n_tokens,
             {_SQL_H} AS h
      FROM documents
    ),
    c AS (
      SELECT doc_id, source, n_tokens,
             CAST(sum(n_tokens) OVER (PARTITION BY source ORDER BY h, doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS cum_tokens
      FROM toks
    )
    SELECT doc_id, source, n_tokens, cum_tokens
    FROM c WHERE cum_tokens <= {_MIX_BUDGET}
    """,
)
def _q_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget mixing: each source keeps a deterministic
    hash-ordered prefix of docs while the running token total stays
    within budget (docs are atomic — cap, never split). One window
    shuffle on the stratum key, integer cumulative sum, no joins."""
    out = sp.token_budget_per_stratum(
        _table(spark, sf_dir, "documents"), _MIX_BUDGET
    )
    return out.select("doc_id", "source", "n_tokens", "cum_tokens")


@register(
    "mix_sequence_pack_offsets",
    f"""
    WITH toks AS (
      SELECT doc_id,
             CAST({_SQL_NTOK} AS BIGINT) AS n_tokens,
             {_SQL_H} AS h
      FROM documents
    ),
    c AS (
      SELECT doc_id, n_tokens,
             CAST(sum(n_tokens) OVER (ORDER BY h, doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS tok_end
      FROM toks
    )
    SELECT doc_id, n_tokens, tok_end - n_tokens AS tok_start, tok_end,
           CAST(floor((tok_end - n_tokens) / 512.0) AS BIGINT) AS first_seq,
           CAST(floor((tok_end - 1) / 512.0) AS BIGINT) AS last_seq
    FROM c WHERE n_tokens > 0
    """,
)
def _q_pack_offsets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chop sequence packing (seq_len=512): each doc's global
    token interval and the training sequences it spans, in deterministic
    hash order. r4: scale-safe distributed prefix-sum — the shard id is
    the hash's top bits, so per-shard window cumsum + broadcast base
    offsets reproduce the global-order result bit-for-bit with no
    keyless window anywhere in the plan (the oracle stays the simple
    global-window SQL)."""
    return sp.sequence_pack_offsets(_table(spark, sf_dir, "documents"), seq_len=512)


@register(
    "mix_sequence_pack_sharded",
    f"""
    WITH toks AS (
      SELECT doc_id, source,
             CAST({_SQL_NTOK} AS BIGINT) AS n_tokens,
             {_SQL_H} AS h
      FROM documents
    ),
    c AS (
      SELECT doc_id, source, n_tokens,
             CAST(sum(n_tokens) OVER (ORDER BY source, h, doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS tok_end
      FROM toks
    )
    SELECT doc_id, source, n_tokens, tok_end - n_tokens AS tok_start, tok_end,
           CAST(floor((tok_end - n_tokens) / 512.0) AS BIGINT) AS first_seq,
           CAST(floor((tok_end - 1) / 512.0) AS BIGINT) AS last_seq
    FROM c WHERE n_tokens > 0
    """,
)
def _q_pack_sharded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Production per-shard packing (shard = source, seq_len=512):
    shard-major deterministic concat order with globally contiguous
    offsets — per-shard window cumsum, driver-side cumsum of the
    per-shard totals (one bounded row per shard), broadcast base-offset
    join. The oracle is the equivalent single global window ordered by
    (source, h, doc_id) — DuckDB doesn't need the scale-safe shape,
    the result must match it exactly."""
    return sp.sequence_pack_offsets_sharded(
        _table(spark, sf_dir, "documents"), seq_len=512
    )


# ---------------------------------------------------------------------------
# Structured Streaming: tumbling-window aggregation over events
# ---------------------------------------------------------------------------


@register(
    "stream_tumbling_hour_agg",
    f"""
    SELECT user_id, date_trunc('hour', ts) AS window_start,
           count(*) AS n_events,
           {_sql_dsum("value", 2)} AS sum_value
    FROM events
    GROUP BY user_id, date_trunc('hour', ts)
    """,
)
def _q_stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """True Structured Streaming plan (readStream → watermark → tumbling
    window → memory sink, availableNow trigger) whose final state must
    equal the batch oracle — the streaming generalization of the
    reference's seasonal fold (SURVEY §2.10/E11)."""
    from time_series_data_trimmer_spark.streaming.stream_ops import tumbling_hour_agg

    return tumbling_hour_agg(spark, os.path.join(sf_dir, "events.parquet"))


@register(
    "stream_quantile_value_by_type",
    f"""
    WITH ev AS (
      SELECT event_type, event_id, value FROM events WHERE value IS NOT NULL
    ),
    h AS (
      SELECT event_type AS g, {sp.sql_hash_u32("event_id", "tsdt|qsk")} AS u,
             CAST(value AS DOUBLE) AS v
      FROM ev
    ),
    regs AS (
      SELECT g, u, v FROM h
      QUALIFY row_number() OVER (PARTITION BY g ORDER BY u ASC, v ASC) <= 32
    ),
    ranked AS (
      SELECT g, v,
             row_number() OVER (PARTITION BY g ORDER BY v ASC, u ASC) AS vr,
             count(*) OVER (PARTITION BY g) AS n_kept
      FROM regs
    ),
    qs AS (SELECT unnest([CAST(0.5 AS DOUBLE), CAST(0.9 AS DOUBLE)]) AS q)
    SELECT g AS event_type, q, n_kept, v AS q_est
    FROM ranked CROSS JOIN qs
    WHERE vr = greatest(1, CAST(ceil(q * CAST(n_kept AS DOUBLE)) AS BIGINT))
    """,
)
def _q_stream_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming per-event-type value percentiles
    (`stream_ops.stream_quantile_sketch`): the bottom-k quantile
    registers live in GroupState (≤ k (hash, value) pairs per group),
    every emission re-merges after the run, and bottom-k's closure
    under union makes the estimates independent of micro-batch
    boundaries — BIT-EQUAL to the batch sketch, same exact oracle.
    The streaming-monitoring shape (latency/size percentiles over an
    unbounded stream) without a watermark, because the sketch is a
    pure function of the set of rows seen."""
    from time_series_data_trimmer_spark.streaming.stream_ops import (
        stream_quantile_sketch,
    )

    return stream_quantile_sketch(
        spark, os.path.join(sf_dir, "events.parquet"),
        group_col="event_type", value_col="value", id_col="event_id",
        qs=(0.5, 0.9), k=32,
    )


@register(
    "stream_kmv_distinct_users",
    f"""
    WITH hashed AS (
      SELECT DISTINCT event_type AS g,
             {sp.sql_hash_u32("user_id", "tsdt|kmv")} AS u
      FROM events
    ),
    ranked AS (
      SELECT g, u, row_number() OVER (PARTITION BY g ORDER BY u ASC) AS rn
      FROM hashed
    ),
    kept AS (
      SELECT g, count(*) AS n_kept, max(u) AS kth
      FROM ranked WHERE rn <= 64 GROUP BY g
    )
    SELECT g AS event_type, n_kept,
           {sql_rd(
               "CASE WHEN n_kept < 64 THEN CAST(n_kept AS DOUBLE)"
               " ELSE 63.0 * 4294967296.0 / CAST(kth AS DOUBLE) END",
               6,
           )} AS est_distinct
    FROM kept
    """,
)
def _q_stream_kmv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming KMV distinct-users-per-event-type
    (`stream_ops.stream_kmv_distinct`): bottom-k md5 registers held in
    GroupState (`applyInPandasWithState`, ≤ k longs per group), every
    emission re-merged after the run — bottom-k's closure under union
    makes the estimate independent of micro-batch boundaries, so the
    streaming answer is BIT-EQUAL to the batch sketch and the same
    exact DuckDB oracle applies. The sketch family's streaming face:
    the register lifecycle (registers/merge/estimate) is untouched;
    only the accumulation site moved into the stream."""
    from time_series_data_trimmer_spark.streaming.stream_ops import (
        stream_kmv_distinct,
    )

    return stream_kmv_distinct(
        spark, os.path.join(sf_dir, "events.parquet"),
        group_col="event_type", key_col="user_id", k=64,
    )


_MM_FEATS = ", ".join(
    f"('0x' || substr(h{d + 1}, {(k % 4) * 8 + 1}, 8))::BIGINT / 2147483648.0 - 1.0 AS f{k}"
    for k, d in [(k, k // 4) for k in range(16)]
)


@register(
    "multimodal_fake_features",
    f"""
    WITH h AS (SELECT doc_id AS asset_id, md5(text) AS h1 FROM documents),
    hh AS (
      SELECT asset_id, h1, md5(h1) AS h2, md5(md5(h1)) AS h3, md5(md5(md5(h1))) AS h4
      FROM h
    )
    SELECT asset_id, {_MM_FEATS} FROM hh
    """,
)
def _q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The multimodal mapInPandas plumbing through the exact-value gate:
    documents' text bytes become binary payloads, the (fake, md5-seeded)
    decoder emits 16 features per asset inside an Arrow batch stream,
    and the oracle reproduces the iterated-digest features in SQL —
    payload bytes never shuffle (output schema is id + features only).
    The real-codec path keeps its documented NotImplementedError site."""
    from time_series_data_trimmer_spark.operators.multimodal import extract_features

    assets = _table(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("asset_id"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
    )
    feats = extract_features(assets, id_col="asset_id")
    return feats.select(
        "asset_id",
        *[F.element_at(F.col("features"), k + 1).alias(f"f{k}") for k in range(16)],
    )


@register(
    "stream_spike_counts",
    """
    SELECT user_id, count(*) AS n_spikes
    FROM events WHERE value > 150.0
    GROUP BY user_id
    """,
)
def _q_stream_spikes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming per-user spike counter (threshold filter inside the
    stream); final complete-mode state == the batch filtered count."""
    from time_series_data_trimmer_spark.streaming.stream_ops import (
        streaming_spike_counts,
    )

    out = streaming_spike_counts(spark, os.path.join(sf_dir, "events.parquet"), 150.0)
    return out.select("user_id", F.col("n_spikes"))


@register(
    "stream_dedup",
    """
    SELECT DISTINCT user_id,
           md5(coalesce(event_type, '<null>') || '|' ||
               coalesce(CAST(CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS VARCHAR),
                        '<null>'))
             AS content_key
    FROM events
    """,
)
def _q_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked streaming deduplication on a content digest
    (dropDuplicatesWithinWatermark): exactly-once emission per distinct
    (user, content) observation — the streaming twin of exact_dedup.
    The digest quantizes the float channel to integer cents before
    hashing so the DuckDB oracle reproduces it bit-for-bit (raw
    double→string casts differ across engines). With the delay
    covering the corpus span, the appended rows equal batch DISTINCT."""
    from time_series_data_trimmer_spark.streaming.stream_ops import stream_dedup

    return stream_dedup(spark, os.path.join(sf_dir, "events.parquet"))


@register(
    "stream_sliding_mean",
    f"""
    WITH slotted AS (
      SELECT user_id, epoch(ts) AS t, value,
             unnest([CAST(floor(epoch(ts) / 1800.0) AS BIGINT),
                     CAST(floor(epoch(ts) / 1800.0) AS BIGINT) - 1]) AS slot
      FROM events
    )
    SELECT user_id,
           {R("slot * 1800.0", 3)} AS window_start,
           {R("slot * 1800.0 + 3600.0", 3)} AS window_end,
           {R("CAST(sum(CAST(" + sql_rd("value", 2) + " AS DECIMAL(38,6))) AS DOUBLE) / count(*)", 6)} AS mean_value,
           count(*) AS n_events
    FROM slotted
    WHERE t >= slot * 1800.0 AND t < slot * 1800.0 + 3600.0
    GROUP BY user_id, slot
    """,
)
def _q_stream_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window (1 h / 30 min) streaming mean: every event lands
    in exactly two windows; the oracle materializes the same two slots
    per event with unnest and reproduces the decimal-sum mean. Final
    complete-mode state == the batch fixpoint."""
    from time_series_data_trimmer_spark.streaming.stream_ops import sliding_mean

    out = sliding_mean(spark, os.path.join(sf_dir, "events.parquet"))
    return out.select(
        "user_id",
        rd(F.col("window_start").cast("double"), 3).alias("window_start"),
        rd(F.col("window_end").cast("double"), 3).alias("window_end"),
        rd(F.col("mean_value"), 6).alias("mean_value"),
        "n_events",
    )


@register(
    "stream_session_agg",
    f"""
    WITH gaps AS (
      SELECT user_id, epoch(ts) AS t,
             CASE WHEN epoch(ts) - lag(epoch(ts)) OVER (PARTITION BY user_id ORDER BY epoch(ts)) >= 1800.0
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    ),
    ids AS (
      SELECT user_id, t,
             CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY t
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
      FROM gaps
    )
    SELECT user_id,
           {R("min(t)", 3)} AS session_start,
           {R("max(t) + 1800.0", 3)} AS session_end,
           count(*) AS n_events
    FROM ids GROUP BY user_id, session_id
    """,
)
def _q_stream_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real Structured Streaming session windows (session_window merge
    state) whose final state must equal the batch gaps-and-islands
    fixpoint. Spark session semantics modeled exactly in the oracle:
    a session BREAKS on gap >= 30 min (merge requires next_start
    strictly inside the window) and session end = last event + gap."""
    from time_series_data_trimmer_spark.streaming.stream_ops import session_agg

    out = session_agg(spark, os.path.join(sf_dir, "events.parquet"), gap="30 minutes")
    return out.select(
        "user_id",
        rd(F.col("session_start").cast("double"), 3).alias("session_start"),
        rd(F.col("session_end").cast("double"), 3).alias("session_end"),
        "n_events",
    )


# ---------------------------------------------------------------------------
# Additional TPC-H-style coverage + end-to-end corpus pipeline
# ---------------------------------------------------------------------------


@register(
    "tpch_q6_forecast_revenue",
    f"""
    SELECT {_sql_dsum("l_extendedprice * l_discount")} AS revenue,
           count(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24.0
    """,
)
def _q_tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    # pure scan-side query: every predicate reaches the parquet reader;
    # the agg is a single map-side-combined global reduce
    l = _table(spark, sf_dir, "lineitem")
    out = l.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & F.col("l_discount").between(0.05, 0.07)
        & (F.col("l_quantity") < 24.0)
    )
    return out.agg(
        _dsum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


@register(
    "tpch_q10_returned_items",
    f"""
    SELECT c.c_custkey AS custkey, c.c_name AS name, n.n_name AS nation,
           {_sql_dsum("l.l_extendedprice * (1.0 - l.l_discount)")} AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY revenue DESC, custkey ASC
    LIMIT 20
    """,
)
def _q_tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _table(spark, sf_dir, "customer")
    n = _table(spark, sf_dir, "nation")
    o = _table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
    )
    l = _table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    dim = c.join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"]).select(
        "c_custkey", "c_name", "n_name"
    )
    rev = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    # date-filtered orders and customer⋈nation both scale with SF —
    # shuffle_hash, never an unconditional broadcast (AQE still picks
    # BHJ at runtime when a side fits)
    return (
        l.join(o.hint("shuffle_hash"), l["l_orderkey"] == o["o_orderkey"])
        .join(dim.hint("shuffle_hash"), o["o_custkey"] == dim["c_custkey"])
        .groupBy(
            F.col("c_custkey").alias("custkey"),
            F.col("c_name").alias("name"),
            F.col("n_name").alias("nation"),
        )
        .agg(_dsum(rev).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("custkey").asc())
        .limit(20)
    )


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
    "tpch_q18_large_volume_orders",
    f"""
    WITH big AS (
      SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
      HAVING {_sql_dsum("l_quantity", 2)} > 180.0
    )
    SELECT o.o_orderkey AS orderkey, o.o_totalprice AS totalprice,
           {_sql_dsum("l.l_quantity", 2)} AS total_qty
    FROM orders o
    JOIN big b ON o.o_orderkey = b.l_orderkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderkey, o.o_totalprice
    ORDER BY totalprice DESC, orderkey ASC
    LIMIT 15
    """,
)
def _q_tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    # agg → semi-join shape: the HAVING aggregate builds a key set whose
    # size is data-dependent (could be O(orders) under a loose
    # threshold) — join it back with shuffle_hash, never a forced
    # broadcast; AQE converts to BHJ at runtime when the set is small
    l = _table(spark, sf_dir, "lineitem")
    o = _table(spark, sf_dir, "orders")
    big = (
        l.groupBy("l_orderkey")
        .agg(_dsum(F.col("l_quantity"), 2).alias("q"))
        .filter(F.col("q") > 180.0)
        .select(F.col("l_orderkey").alias("big_orderkey"))  # disambiguate the self-join
    )
    return (
        o.join(big.hint("shuffle_hash"), o["o_orderkey"] == big["big_orderkey"])
        .join(l, l["l_orderkey"] == o["o_orderkey"])
        .groupBy(F.col("o_orderkey").alias("orderkey"), F.col("o_totalprice").alias("totalprice"))
        .agg(_dsum(F.col("l_quantity"), 2).alias("total_qty"))
        .orderBy(F.col("totalprice").desc(), F.col("orderkey").asc())
        .limit(15)
    )


@register(
    "skew_salted_user_agg",
    f"""
    SELECT user_id, count(*) AS n_events,
           {_sql_dsum("value", 2)} AS sum_value,
           min(value) AS min_value, max(value) AS max_value
    FROM events GROUP BY user_id
    """,
)
def _q_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-proof two-phase aggregation through the driver gate: the
    salted (key, salt) partial → key final plan must produce EXACTLY the
    plain GROUP BY answer. Sum terms are decimal (associative), so the
    salt-dependent combine order cannot perturb the result; the salt is
    a deterministic xxhash of event_id, never rand()."""
    from time_series_data_trimmer_spark.operators import skew

    ev = _events(spark, sf_dir).withColumn(
        "__v", rd(F.col("value"), 2).cast("decimal(38,6)")
    )
    out = skew.salted_agg(
        ev,
        ["user_id"],
        {
            "n_events": ("count", "*"),
            "sum_value": ("sum", "__v"),
            "min_value": ("min", "value"),
            "max_value": ("max", "value"),
        },
        salt_source="event_id",
    )
    return out.select(
        "user_id", "n_events",
        F.col("sum_value").cast("double").alias("sum_value"),
        "min_value", "max_value",
    )


@register(
    "tpch_q4_order_priority",
    """
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders o
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate
      )
    GROUP BY o_orderpriority
    """,
)
def _q_tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    # fact-fact LEFT SEMI with a mixed equi + non-equi condition
    # (adapted q4: the synthetic schema has no commit/receipt dates, so
    # "late line exists" = shipped after the order date). Both sides
    # scale with SF → shuffle-hash; the equi key carries the join, the
    # date predicate filters inside it.
    o = _table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
    )
    l = _table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    semi = o.join(
        l.hint("shuffle_hash"),
        (o["o_orderkey"] == l["l_orderkey"]) & (l["l_shipdate"] > o["o_orderdate"]),
        "left_semi",
    )
    return semi.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("order_count"))


@register(
    "tpch_q7_volume_shipping",
    f"""
    SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
           CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
           {_sql_dsum("l.l_extendedprice * (1.0 - l.l_discount)")} AS revenue
    FROM lineitem l
    JOIN orders o    ON o.o_orderkey = l.l_orderkey
    JOIN customer c  ON c.c_custkey = o.o_custkey
    JOIN supplier s  ON s.s_suppkey = l.l_suppkey
    JOIN nation ns   ON ns.n_nationkey = s.s_nationkey
    JOIN nation nc   ON nc.n_nationkey = c.c_nationkey
    WHERE ns.n_name IN ('NATION_1', 'NATION_2', 'NATION_3', 'NATION_4')
      AND nc.n_name IN ('NATION_1', 'NATION_2', 'NATION_3', 'NATION_4')
      AND ns.n_name <> nc.n_name
      AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY ns.n_name, nc.n_name, year(l.l_shipdate)
    """,
)
def _q_tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the widest join tree in the registry (6 relations): nation twice
    # (constant → broadcast); supplier, customer, orders all scale with
    # SF → shuffle_hash builds, lineitem streams. Nation-pair filters
    # push into the supplier/customer scans through the broadcast joins.
    l = _table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    o = _table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    n = _table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_1", "NATION_2", "NATION_3", "NATION_4")
    )
    s = (
        _table(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == n["n_nationkey"])
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    c = (
        _table(spark, sf_dir, "customer")
        .join(F.broadcast(n), F.col("c_nationkey") == n["n_nationkey"])
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    rev = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    joined = (
        l.join(s.hint("shuffle_hash"), l["l_suppkey"] == s["s_suppkey"])
        .join(o.hint("shuffle_hash"), l["l_orderkey"] == o["o_orderkey"])
        .join(c.hint("shuffle_hash"), o["o_custkey"] == c["c_custkey"])
        .filter(F.col("supp_nation") != F.col("cust_nation"))
    )
    return (
        joined.groupBy(
            "supp_nation", "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(_dsum(rev).alias("revenue"))
    )


@register(
    "tpch_q14_promo_revenue",
    f"""
    SELECT {R(
        "100.0 * CAST("
        + _sql_dsum("CASE WHEN p.p_type = 'PROMO' THEN l.l_extendedprice * (1.0 - l.l_discount) ELSE 0.0 END")
        + " AS DOUBLE) / CAST("
        + _sql_dsum("l.l_extendedprice * (1.0 - l.l_discount)")
        + " AS DOUBLE)", 6)} AS promo_revenue_pct
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1997-10-01 00:00:00'
    """,
)
def _q_tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    # part scales with SF (it is NOT a broadcast-safe dimension at the
    # 100 TB target) → shuffle_hash build side; the date filter reaches
    # the lineitem scan so only one month of the fact table shuffles
    l = _table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-09-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-10-01 00:00:00").cast("timestamp"))
    )
    p = _table(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0))
    joined = l.join(p.hint("shuffle_hash"), l["l_partkey"] == p["p_partkey"])
    return joined.agg(
        rd(
            F.lit(100.0) * _dsum(promo) / _dsum(rev), 6
        ).alias("promo_revenue_pct")
    )


@register(
    "tpch_q8_market_share",
    f"""
    WITH volumes AS (
      SELECT CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
             {sql_rd("l.l_extendedprice * (1.0 - l.l_discount)", 4)} AS volume,
             ns.n_name AS supp_nation
      FROM lineitem l
      JOIN orders o   ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation nc  ON nc.n_nationkey = c.c_nationkey
      JOIN region r   ON r.r_regionkey = nc.n_regionkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation ns  ON ns.n_nationkey = s.s_nationkey
      WHERE r.r_name = 'EUROPE'
        AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    )
    SELECT o_year,
           {R("CAST(sum(CAST(CASE WHEN supp_nation = 'NATION_1' THEN volume ELSE 0.0 END AS DECIMAL(38,6))) AS DOUBLE)"
              " / CAST(sum(CAST(volume AS DECIMAL(38,6))) AS DOUBLE)", 6)} AS mkt_share
    FROM volumes GROUP BY o_year
    """,
)
def _q_tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    # market-share ratio: conditional decimal sum over total decimal sum
    # within the customer region, per order year. nation/region constant
    # → broadcast; supplier/customer/orders scale → shuffle_hash.
    l = _table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    o = _table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    n = _table(spark, sf_dir, "nation")
    r = _table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    cdim = (
        _table(spark, sf_dir, "customer")
        .join(F.broadcast(n), F.col("c_nationkey") == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .select("c_custkey")
    )
    sdim = (
        _table(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == n["n_nationkey"])
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    vol = rd(F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")), 4)
    j = (
        l.join(o.hint("shuffle_hash"), l["l_orderkey"] == o["o_orderkey"])
        .join(cdim.hint("shuffle_hash"), o["o_custkey"] == cdim["c_custkey"])
        .join(sdim.hint("shuffle_hash"), l["l_suppkey"] == sdim["s_suppkey"])
        .select(
            F.year("o_orderdate").cast("long").alias("o_year"),
            vol.alias("volume"),
            "supp_nation",
        )
    )
    num = F.sum(
        F.when(F.col("supp_nation") == "NATION_1", F.col("volume"))
        .otherwise(F.lit(0.0))
        .cast("decimal(38,6)")
    ).cast("double")
    den = F.sum(F.col("volume").cast("decimal(38,6)")).cast("double")
    return j.groupBy("o_year").agg(rd(num / den, 6).alias("mkt_share"))


@register(
    "tpch_q13_customer_order_distribution",
    """
    WITH counts AS (
      SELECT c.c_custkey, count(o.o_orderkey) AS c_count
      FROM customer c LEFT OUTER JOIN orders o ON o.o_custkey = c.c_custkey
      GROUP BY c.c_custkey
    )
    SELECT c_count, count(*) AS custdist
    FROM counts GROUP BY c_count
    """,
)
def _q_tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    # LEFT OUTER fact join (customers with zero orders must appear with
    # c_count = 0) → distribution of distributions. Both sides scale
    # with SF → shuffle_hash; count(o_orderkey) ignores the null-padded
    # rows exactly like the SQL count of a nullable column.
    c = _table(spark, sf_dir, "customer").select("c_custkey")
    o = _table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    counts = (
        c.join(o.hint("shuffle_hash"), c["c_custkey"] == o["o_custkey"], "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return counts.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@register(
    "tpch_q15_top_supplier",
    f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             {_sql_dsum("l_extendedprice * (1.0 - l_discount)")} AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey AS suppkey, s.s_name AS name, r.total_revenue
    FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT max(total_revenue) FROM revenue)
    """,
)
def _q_tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    # argmax over an aggregate, scalar-subquery style (the q22 pattern,
    # PLANS.md invariant 7): reduce the per-supplier revenues to a
    # 1-ROW max aggregate and broadcast-cross-join it back, then filter
    # equality. The r3 form used max().over(Window.partitionBy()) — an
    # EMPTY-PARTITION window that funnels every supplier's aggregate
    # through one task (WindowExec "No Partition Defined"); at 100×
    # TPC-H that single task sorts millions of rows. Here the max is a
    # partial-aggregated 1-row exchange and the revenue rows stream.
    l = _table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
    )
    rev = (
        l.groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(_dsum(F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))).alias("total_revenue"))
    )
    mx = rev.agg(F.max("total_revenue").alias("__mx"))
    top = rev.crossJoin(F.broadcast(mx)).filter(
        F.col("total_revenue") == F.col("__mx")
    )
    s = _table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        s.join(top.hint("shuffle_hash"), s["s_suppkey"] == top["supplier_no"])
        .select(
            F.col("s_suppkey").alias("suppkey"),
            F.col("s_name").alias("name"),
            "total_revenue",
        )
    )


@register(
    "tpch_q17_small_quantity_revenue",
    f"""
    WITH joined AS (
      SELECT l.l_partkey, l.l_quantity, l.l_extendedprice,
             avg(l.l_quantity) OVER (PARTITION BY l.l_partkey) AS avg_qty,
             count(*) OVER (PARTITION BY l.l_partkey) AS n_lines
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      WHERE p.p_brand = 'Brand#1'
    )
    SELECT {R("CAST(" + _sql_dsum("CASE WHEN l_quantity < 0.5 * avg_qty THEN l_extendedprice ELSE NULL END")
             + " AS DOUBLE) / 7.0", 6)} AS avg_yearly
    FROM joined
    """,
)
def _q_tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    # correlated per-part average (the classic q17 scalar subquery) as a
    # window over the join — ONE pass over the brand's lineitems instead
    # of a re-aggregating subquery join. avg over integers is exact
    # (count * 0.5 thresholds), so no decimal machinery needed there.
    l = _table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    p = _table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#1").select("p_partkey")
    j = l.join(p.hint("shuffle_hash"), l["l_partkey"] == p["p_partkey"])
    w = Window.partitionBy("l_partkey")
    j = j.withColumn("avg_qty", F.avg("l_quantity").over(w))
    small = F.when(F.col("l_quantity") < F.lit(0.5) * F.col("avg_qty"), F.col("l_extendedprice"))
    return j.agg(rd(_dsum(small) / F.lit(7.0), 6).alias("avg_yearly"))


@register(
    "tpch_q19_disjunctive_revenue",
    f"""
    SELECT {_sql_dsum("l.l_extendedprice * (1.0 - l.l_discount)")} AS revenue
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 25
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 35
           AND l.l_quantity BETWEEN 20 AND 30)
    """,
)
def _q_tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    # q19 (adapted to the synthetic part schema: brand/size/quantity
    # branches instead of brand/container/shipmode): the point is the
    # DISJUNCTIVE mixed-side predicate. Expressed as a plain WHERE over
    # the equi-join, Catalyst's CNF conversion pushes the part-only
    # disjunction to the part scan and the quantity disjunction to the
    # lineitem scan (PushedFilters: Or(...) on both) — at 100 TB the
    # scan prunes before the join instead of filtering after it. Both
    # sides scale with SF → shuffle-hash, AQE upgrades when one fits.
    l = _table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    p = _table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    j = l.join(p.hint("shuffle_hash"), l["l_partkey"] == p["p_partkey"])

    def branch(brand: str, size_hi: int, q_lo: int, q_hi: int):
        return (
            (F.col("p_brand") == brand)
            & F.col("p_size").between(1, size_hi)
            & F.col("l_quantity").between(q_lo, q_hi)
        )

    j = j.filter(
        branch("Brand#1", 15, 1, 11) | branch("Brand#2", 25, 10, 20) | branch("Brand#3", 35, 20, 30)
    )
    return j.agg(
        _dsum(F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))).alias("revenue")
    )


@register(
    "tpch_q21_waiting_supplier",
    """
    WITH late AS (
      SELECT l.l_orderkey, l.l_suppkey
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      WHERE o.o_orderstatus = 'F'
        AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
    )
    SELECT s.s_name, count(*) AS numwait
    FROM late b
    JOIN supplier s ON s.s_suppkey = b.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey AND n.n_name = 'NATION_1'
    WHERE EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = b.l_orderkey AND l2.l_suppkey <> b.l_suppkey
      )
      AND NOT EXISTS (
        SELECT 1 FROM late l3
        WHERE l3.l_orderkey = b.l_orderkey AND l3.l_suppkey <> b.l_suppkey
      )
    GROUP BY s.s_name
    """,
)
def _q_tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    # q21 (adapted: lateness = shipped > 60 days after the order date —
    # the synthetic schema has no commit/receipt dates): suppliers who
    # were the ONLY late supplier of a multi-supplier finished order.
    # The two correlated subqueries become the two equi-key plan shapes
    # this registry was missing: EXISTS → LEFT SEMI shuffle-hash join,
    # NOT EXISTS → LEFT ANTI shuffle-hash join, both keyed on
    # l_orderkey with the supplier inequality as a residual condition.
    # Aggregation runs on the key (suppkey) BEFORE the supplier/nation
    # dimension joins (nation broadcasts; supplier is aggregated rows).
    o = _table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F").select(
        "o_orderkey", "o_orderdate"
    )
    l = _table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    late = (
        l.join(o.hint("shuffle_hash"), l["l_orderkey"] == o["o_orderkey"])
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .select("l_orderkey", "l_suppkey")
    )
    others = _table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o2_orderkey"), F.col("l_suppkey").alias("o2_suppkey")
    )
    semi = late.join(
        others.hint("shuffle_hash"),
        (late["l_orderkey"] == others["o2_orderkey"])
        & (late["l_suppkey"] != others["o2_suppkey"]),
        "left_semi",
    )
    other_late = late.select(
        F.col("l_orderkey").alias("a_orderkey"), F.col("l_suppkey").alias("a_suppkey")
    )
    only_late = semi.join(
        other_late.hint("shuffle_hash"),
        (semi["l_orderkey"] == other_late["a_orderkey"])
        & (semi["l_suppkey"] != other_late["a_suppkey"]),
        "left_anti",
    )
    per_supp = only_late.groupBy("l_suppkey").agg(F.count(F.lit(1)).alias("numwait"))
    s = _table(spark, sf_dir, "supplier").select("s_suppkey", "s_name", "s_nationkey")
    n = _table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_1").select(
        "n_nationkey"
    )
    dim = s.join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"]).select(
        "s_suppkey", "s_name"
    )
    return (
        per_supp.join(F.broadcast(dim), per_supp["l_suppkey"] == dim["s_suppkey"])
        .select("s_name", "numwait")
    )


@register(
    "tpch_q22_global_sales_opportunity",
    f"""
    WITH eligible AS (
      SELECT c_custkey, c_nationkey, c_acctbal
      FROM customer
      WHERE c_nationkey IN (1, 3, 5, 7, 9, 11, 13)
    ),
    thresh AS (
      SELECT sum(CAST({sql_rd("c_acctbal", 2)} AS DECIMAL(38,6))) AS total,
             count(*) AS n
      FROM eligible WHERE c_acctbal > 0.0
    )
    SELECT c_nationkey AS cntrycode, count(*) AS numcust,
           {_sql_dsum("c_acctbal", 2)} AS totacctbal
    FROM eligible c, thresh t
    WHERE CAST({sql_rd("c_acctbal", 2)} AS DECIMAL(38,6)) * t.n > t.total
      AND NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT'
      )
    GROUP BY c_nationkey
    """,
)
def _q_tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    # q22 (adapted: country code = c_nationkey — the synthetic schema
    # has no phone column; "never placed an urgent order" replaces "no
    # orders at all", which the generator never produces): above-average
    # balance customers in chosen countries with no urgent order.
    # Plan shapes: a 1-row broadcast cross join for the scalar-subquery
    # threshold, and NOT EXISTS → LEFT ANTI shuffle-hash equi-join on
    # custkey against the filtered orders side. The avg comparison is
    # decimal-exact (bal·n > Σbal) so neither engine's float summation
    # order can flip a boundary customer.
    c = _table(spark, sf_dir, "customer").filter(
        F.col("c_nationkey").isin(1, 3, 5, 7, 9, 11, 13)
    ).select("c_custkey", "c_nationkey", "c_acctbal")
    bal_dec = rd(F.col("c_acctbal"), 2).cast("decimal(38,6)")
    thresh = c.filter(F.col("c_acctbal") > 0.0).agg(
        F.sum(bal_dec).alias("total"), F.count(F.lit(1)).alias("n")
    )
    urgent = _table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    ).select("o_custkey")
    kept = (
        c.crossJoin(F.broadcast(thresh))
        .filter(bal_dec * F.col("n") > F.col("total"))
        .join(urgent.hint("shuffle_hash"), c["c_custkey"] == urgent["o_custkey"], "left_anti")
    )
    return kept.groupBy(F.col("c_nationkey").alias("cntrycode")).agg(
        F.count(F.lit(1)).alias("numcust"), _dsum(F.col("c_acctbal"), 2).alias("totacctbal")
    )


@register(
    "tpch_q2_min_cost_supplier",
    f"""
    WITH eu_supp AS (
      SELECT s_suppkey, s_name, s_acctbal, n_name
      FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
      WHERE r.r_name = 'EUROPE'
    ),
    costs AS (
      SELECT l_partkey, l_suppkey, min({sql_rd("l_extendedprice", 2)}) AS cost
      FROM lineitem GROUP BY l_partkey, l_suppkey
    ),
    ec AS (
      SELECT c.l_partkey, c.l_suppkey, c.cost, e.s_name, e.s_acctbal, e.n_name
      FROM costs c JOIN eu_supp e ON c.l_suppkey = e.s_suppkey
    ),
    mc AS (SELECT l_partkey, min(cost) AS mincost FROM ec GROUP BY l_partkey)
    SELECT p.p_partkey AS partkey, ec.s_name AS name, ec.n_name AS nation,
           {sql_rd("ec.s_acctbal", 2)} AS acctbal, ec.cost AS supply_cost
    FROM part p
    JOIN ec ON ec.l_partkey = p.p_partkey
    JOIN mc ON mc.l_partkey = ec.l_partkey AND ec.cost = mc.mincost
    WHERE p.p_size <= 10
    """,
)
def _q_tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    # q2 (adapted: the synthetic schema has no partsupp, so "supply
    # cost" = min rounded extendedprice per (part, supplier) from
    # lineitem; region filter on the SUPPLIER side as in the original).
    # The defining shape survives: a CORRELATED GROUPWISE MIN — min
    # cost per part across qualifying suppliers — expressed as a
    # per-part min aggregate equality-joined back (never a window over
    # an unkeyed frame, never a per-row subquery). nation/region
    # broadcast; every SF-scaling side joins shuffle-hash.
    n = _table(spark, sf_dir, "nation")
    r = _table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    eu = (
        _table(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    costs = (
        _table(spark, sf_dir, "lineitem")
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min(rd(F.col("l_extendedprice"), 2)).alias("cost"))
    )
    ec = costs.join(eu.hint("shuffle_hash"), costs["l_suppkey"] == eu["s_suppkey"])
    mc = ec.groupBy(F.col("l_partkey").alias("__pk")).agg(
        F.min("cost").alias("mincost")
    )
    p = _table(spark, sf_dir, "part").filter(F.col("p_size") <= 10).select("p_partkey")
    out = (
        ec.join(
            mc.hint("shuffle_hash"),
            (ec["l_partkey"] == mc["__pk"]) & (ec["cost"] == mc["mincost"]),
        )
        .join(p.hint("shuffle_hash"), ec["l_partkey"] == p["p_partkey"])
    )
    return out.select(
        F.col("p_partkey").alias("partkey"),
        F.col("s_name").alias("name"),
        F.col("n_name").alias("nation"),
        rd(F.col("s_acctbal"), 2).alias("acctbal"),
        F.col("cost").alias("supply_cost"),
    )


@register(
    "tpch_q9_product_type_profit",
    f"""
    SELECT n.n_name AS nation, CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
           {_sql_dsum("l.l_extendedprice * (1.0 - l.l_discount) - 0.5 * l.l_quantity")} AS sum_profit
    FROM lineitem l
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN part p     ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n   ON n.n_nationkey = s.s_nationkey
    WHERE p.p_name LIKE '%widget%'
    GROUP BY n.n_name, CAST(year(o.o_orderdate) AS BIGINT)
    """,
)
def _q_tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    # q9 (adapted: profit uses a constant unit cost 0.5·quantity in
    # place of the absent ps_supplycost). The shape is the widest
    # PROFIT join tree: fact ⋈ orders ⋈ part(name LIKE) ⋈ supplier ⋈
    # nation, decimal-summed by (nation, year). The LIKE filter prunes
    # part BEFORE the join (predicate at the scan), so the fact side
    # shrinks at the first shuffle-hash join.
    l = _table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey",
        "l_quantity", "l_extendedprice", "l_discount",
    )
    o = _table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    p = _table(spark, sf_dir, "part").filter(
        F.col("p_name").like("%widget%")
    ).select("p_partkey")
    s = _table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = _table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    profit = (
        F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
        - F.lit(0.5) * F.col("l_quantity")
    )
    j = (
        l.join(p.hint("shuffle_hash"), l["l_partkey"] == p["p_partkey"])
        .join(o.hint("shuffle_hash"), l["l_orderkey"] == o["o_orderkey"])
        .join(s.hint("shuffle_hash"), l["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
    )
    return j.groupBy(
        F.col("n_name").alias("nation"),
        F.year("o_orderdate").cast("long").alias("o_year"),
    ).agg(_dsum(profit).alias("sum_profit"))


@register(
    "tpch_q11_important_parts",
    f"""
    WITH rich AS (SELECT s_suppkey FROM supplier WHERE s_acctbal >= 2000.0),
    vals AS (
      SELECT l.l_partkey, {_sql_dsum("l.l_extendedprice", 2)} AS value
      FROM lineitem l JOIN rich ON l.l_suppkey = rich.s_suppkey
      GROUP BY l.l_partkey
    ),
    total AS (
      SELECT sum(CAST(value AS DECIMAL(38,6))) AS tot, count(*) AS n FROM vals
    )
    SELECT v.l_partkey AS partkey, v.value
    FROM vals v, total t
    WHERE CAST(v.value AS DECIMAL(38,6)) * t.n * 10 > 12 * t.tot
    """,
)
def _q_tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    # q11 (adapted: "important stock" = per-part lineitem value from
    # high-balance suppliers exceeding 1.2x the MEAN part value; the
    # synthetic schema has no partsupp, and a mean-relative threshold —
    # value·n·10 > 12·total, integer-decimal exact — stays meaningful at every SF where TPC-H's
    # fixed global fraction empties as the corpus grows). Shape
    # preserved: GROUP SUMS COMPARED AGAINST A GLOBAL SCALAR — the
    # per-part aggregate joins a 1-ROW total via broadcast cross join
    # (the q22 scalar pattern), decimal-exact on both engines.
    rich = _table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") >= 2000.0
    ).select("s_suppkey")
    l = _table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice"
    )
    vals = (
        l.join(rich.hint("shuffle_hash"), l["l_suppkey"] == rich["s_suppkey"])
        .groupBy("l_partkey")
        .agg(_dsum(F.col("l_extendedprice"), 2).alias("value"))
    )
    total = vals.agg(
        F.sum(F.col("value").cast("decimal(38,6)")).alias("tot"),
        F.count(F.lit(1)).alias("n"),
    )
    return (
        vals.crossJoin(F.broadcast(total))
        .filter(
            F.col("value").cast("decimal(38,6)") * F.col("n") * F.lit(10)
            > F.lit(12) * F.col("tot")
        )
        .select(F.col("l_partkey").alias("partkey"), "value")
    )


@register(
    "tpch_q12_priority_by_returnflag",
    """
    SELECT l.l_returnflag AS returnflag,
           CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l.l_returnflag
    """,
)
def _q_tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    # q12 (adapted: l_returnflag stands in for the absent l_shipmode).
    # The shape: fact-fact equi-join with CONDITIONAL INTEGER
    # AGGREGATION (CASE inside sum) — pure codegen, no decimal needed
    # since the counts are exact integers; the year filter reaches the
    # lineitem scan.
    l = _table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    ).select("l_orderkey", "l_returnflag")
    o = _table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH").cast("long")
    j = l.join(o.hint("shuffle_hash"), l["l_orderkey"] == o["o_orderkey"])
    return j.groupBy(F.col("l_returnflag").alias("returnflag")).agg(
        F.sum(high).alias("high_line_count"),
        F.sum(F.lit(1) - high).alias("low_line_count"),
    )


@register(
    "tpch_q16_supplier_variety",
    """
    SELECT p.p_brand AS brand, p.p_type AS type, p.p_size AS size,
           count(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM part p JOIN lineitem l ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#13' AND p.p_size IN (1, 2, 3, 4, 5)
      AND l.l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 1000.0
      )
    GROUP BY p.p_brand, p.p_type, p.p_size
    """,
)
def _q_tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    # q16 (adapted: "customer complaints" exclusion becomes low-balance
    # suppliers — no comment column). Shape preserved: DISTINCT-COUNT
    # aggregation over an ANTI-JOINED fact — NOT IN → LeftAnti
    # shuffle-hash (supplier scales with SF; never broadcast by hint),
    # then countDistinct per part attribute triple (Spark plans the
    # distinct as a two-phase expand + agg, map-side combined).
    bad = _table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 1000.0
    ).select("s_suppkey")
    p = _table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#13") & F.col("p_size").isin(1, 2, 3, 4, 5)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    l = _table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    kept = l.join(
        bad.hint("shuffle_hash"), l["l_suppkey"] == bad["s_suppkey"], "left_anti"
    )
    j = kept.join(p.hint("shuffle_hash"), kept["l_partkey"] == p["p_partkey"])
    return j.groupBy(
        F.col("p_brand").alias("brand"),
        F.col("p_type").alias("type"),
        F.col("p_size").alias("size"),
    ).agg(F.count_distinct(F.col("l_suppkey")).alias("supplier_cnt"))


@register(
    "tpch_q20_heavy_shippers",
    """
    WITH small_parts AS (
      SELECT p_partkey FROM part WHERE p_name LIKE 'small%'
    ),
    shipped AS (
      SELECT l.l_suppkey, sum(CAST(l.l_quantity AS BIGINT)) AS qty
      FROM lineitem l JOIN small_parts sp ON l.l_partkey = sp.p_partkey
      WHERE l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      GROUP BY l.l_suppkey
      HAVING sum(CAST(l.l_quantity AS BIGINT)) > 100
    )
    SELECT s.s_suppkey AS suppkey, s.s_name AS name
    FROM supplier s
    WHERE s.s_suppkey IN (SELECT l_suppkey FROM shipped)
    """,
)
def _q_tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    # q20 (adapted: availqty > half-of-shipped becomes a HAVING
    # threshold on shipped quantity — no partsupp). Shape preserved:
    # NESTED IN-SUBQUERIES → a semi-join CHAIN: parts filtered by name
    # prefix (scan predicate) semi-restrict lineitem, the per-supplier
    # aggregate filters by HAVING, and the result semi-joins supplier
    # (LeftSemi shuffle-hash — the key set scales with SF).
    sp_keys = _table(spark, sf_dir, "part").filter(
        F.col("p_name").like("small%")
    ).select("p_partkey")
    l = _table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    ).select("l_partkey", "l_suppkey", "l_quantity")
    shipped = (
        l.join(sp_keys.hint("shuffle_hash"), l["l_partkey"] == sp_keys["p_partkey"], "left_semi")
        .groupBy("l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("qty"))
        .filter(F.col("qty") > 100)
        .select("l_suppkey")
    )
    s = _table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        s.join(shipped.hint("shuffle_hash"), s["s_suppkey"] == shipped["l_suppkey"], "left_semi")
        .select(F.col("s_suppkey").alias("suppkey"), F.col("s_name").alias("name"))
    )


@register(
    "stream_static_enriched_counts",
    f"""
    WITH dim AS (
      SELECT DISTINCT user_id, user_id % 10 AS cohort FROM events
    )
    SELECT d.cohort, count(*) AS n_events,
           {_sql_dsum("e.value", 2)} AS sum_value
    FROM events e JOIN dim d ON e.user_id = d.user_id
    GROUP BY d.cohort
    """,
)
def _q_stream_static(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment: the event STREAM joins a broadcast
    static cohort dimension per micro-batch and aggregates per cohort —
    the events ⋈ user-profile production shape. Final streaming state
    must equal the batch join + groupBy the oracle runs."""
    from time_series_data_trimmer_spark.streaming.stream_ops import (
        stream_static_enriched_counts,
    )

    return stream_static_enriched_counts(
        spark, os.path.join(sf_dir, "events.parquet")
    )


@register(
    "f1_time_window_mean",
    f"""
    SELECT user_id, event_id,
           {R("CAST(sum(CAST(" + sql_rd("value", 2) + " AS DECIMAL(38,6))) OVER w AS DOUBLE)"
              " / CAST(count(*) OVER w AS DOUBLE)", 6)} AS tw_mean
    FROM events
    WINDOW w AS (
      PARTITION BY user_id ORDER BY epoch_us(ts)
      RANGE BETWEEN 2500000 PRECEDING AND 2500000 FOLLOWING
    )
    """,
)
def _q_time_window_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIME-based rolling mean: a RANGE window frame over the time axis
    (±2.5 s of each sample) — the frame family the sample-count rolling
    ops (F1/F2/F11, ROW frames) cannot express when sampling is
    irregular. The order key is INTEGER epoch-microseconds (Spark's
    rangeBetween takes long offsets; micros are exact in both engines),
    frame = ±2,500,000 µs. Same single (user)-keyed Exchange + sort as
    the row-frame family; the frame bound is a value offset evaluated
    inside WindowExec, no extra pass. Decimal-accumulated sum / integer
    count so the mean is order-independent; identical-µs rows are
    RANGE-peers in both engines, making ties well-defined."""
    from time_series_data_trimmer_spark.sources.events import event_micros

    df = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    ev = df.withColumn("t_us", event_micros(df))
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("t_us"))
        .rangeBetween(-2_500_000, 2_500_000)
    )
    s = F.sum(rd(F.col("value"), 2).cast("decimal(38,6)")).over(w).cast("double")
    n = F.count(F.lit(1)).over(w).cast("double")
    return ev.select(
        "user_id", "event_id", rd(s / n, 6).alias("tw_mean")
    )


@register(
    "stream_upsert_latest_state",
    """
    SELECT user_id, value FROM (
      SELECT user_id, value,
             row_number() OVER (
               PARTITION BY user_id ORDER BY ts DESC, event_id DESC
             ) AS rn
      FROM events
    ) WHERE rn = 1
    """,
)
def _q_stream_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming UPSERT sink (foreachBatch CDC apply): latest state per
    key maintained across micro-batches in hash-bucketed plain parquet
    with dynamic partition overwrite — idempotent latest-wins merge, so
    at-least-once batch replays converge (exactly-once-effective
    without an ACID table format). Final table must equal the batch
    latest-per-key oracle."""
    import shutil
    import tempfile

    from time_series_data_trimmer_spark.streaming.stream_ops import (
        stream_upsert_to_keyed_parquet,
    )

    work = tempfile.mkdtemp(prefix="tsdt_upsert_")
    try:
        out = stream_upsert_to_keyed_parquet(
            spark,
            os.path.join(sf_dir, "events.parquet"),
            os.path.join(work, "table"),
            os.path.join(work, "ckpt"),
        )
        result = out.select("user_id", "value")
        # materialize before the temp dir vanishes
        rows = result.collect()
        return spark.createDataFrame(rows, result.schema)
    finally:
        shutil.rmtree(work, ignore_errors=True)


@register(
    "stream_stream_click_purchase_join",
    f"""
    SELECT c.user_id, c.event_id AS click_id, p.event_id AS purchase_id,
           epoch_us(p.ts) - epoch_us(c.ts) AS gap_us,
           {sql_rd("p.value", 2)} AS purchase_value
    FROM events c JOIN events p
      ON p.user_id = c.user_id
     AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 2 HOUR
    WHERE c.event_type = 'click' AND p.event_type = 'purchase'
    """,
)
def _q_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAM-STREAM interval join (attribution shape): clicks and
    purchases are two live watermarked streams; the event-time interval
    in the join condition bounds both sides' state to the
    watermark+window horizon. Finals (append-mode, availableNow) must
    equal the batch interval join the oracle runs."""
    from time_series_data_trimmer_spark.streaming.stream_ops import (
        stream_stream_interval_join,
    )

    return stream_stream_interval_join(
        spark, os.path.join(sf_dir, "events.parquet")
    )


@register(
    "asof_join_click_purchase",
    f"""
    WITH l AS (
      SELECT user_id, event_id, epoch(ts) AS t
      FROM events WHERE event_type = 'click'
    ),
    r AS (
      SELECT user_id, epoch(ts) AS rt,
             max({sql_rd("value", 2)}) AS purchase_value
      FROM events WHERE event_type = 'purchase'
      GROUP BY user_id, epoch(ts)
    )
    SELECT l.user_id, l.event_id, l.t,
           r.rt AS asof_t, r.purchase_value
    FROM l ASOF LEFT JOIN r
      ON l.user_id = r.user_id AND l.t >= r.rt
    """,
)
def _q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """General AS-OF JOIN (trades⋈quotes shape): every click event
    gains the most recent purchase value per user at-or-before its
    time. Spark side = the union trick (ONE key-partitioned window,
    zero range join — a range formulation nested-loops at scale);
    oracle = DuckDB's NATIVE ASOF LEFT JOIN, so the semantics
    (inclusive ties, per-key most-recent) are checked against a
    reference as-of engine, not a re-derivation. The right side
    pre-aggregates to one row per (user, t) — as-of is only
    well-defined on a unique time series."""
    ev = _events(spark, sf_dir)
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "event_id", "t"
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "t")
        .agg(F.max(rd(F.col("value"), 2)).alias("purchase_value"))
    )
    out = edits.asof_join(
        clicks,
        purchases,
        key_cols=["user_id"],
        time_col="t",
        value_cols=["purchase_value"],
        right_time_alias="asof_t",
    )
    return out.select("user_id", "event_id", "t", "asof_t", "purchase_value")


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
    "funnel_view_click_purchase",
    """
    WITH v AS (
      SELECT user_id, event_id, epoch(ts) AS t
      FROM events WHERE event_type = 'view'
    ),
    c AS (
      SELECT user_id, epoch(ts) AS ct FROM events
      WHERE event_type = 'click' GROUP BY user_id, epoch(ts)
    ),
    p AS (
      SELECT user_id, epoch(ts) AS pt FROM events
      WHERE event_type = 'purchase' GROUP BY user_id, epoch(ts)
    ),
    vc AS (
      SELECT v.user_id, v.event_id, v.t, c.ct
      FROM v ASOF LEFT JOIN c ON v.user_id = c.user_id AND v.t <= c.ct
    ),
    vcp AS (
      SELECT vc.user_id, vc.event_id, vc.t, vc.ct, p.pt
      FROM vc ASOF LEFT JOIN p ON vc.user_id = p.user_id AND vc.ct <= p.pt
    )
    SELECT user_id, count(*) AS n_views,
           CAST(sum(CASE WHEN ct IS NOT NULL AND ct - t <= 600.0
                          AND pt IS NOT NULL AND pt - ct <= 3600.0
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_converted
    FROM vcp GROUP BY user_id
    """,
)
def _q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-sequence funnel (view → click within 10 min → purchase
    within 1 h of the click), per user — the composed form of the
    general as-of join: TWO chained forward as-of joins (each one
    keyed window over a tagged union, zero range joins), then a
    conditional count. The oracle chains DuckDB's native forward ASOF
    (``l.t <= r.t``) twice, so the composition semantics — nearest
    FOLLOWING event, inclusive, per key — are checked against a
    reference as-of engine end to end. r5: expressed through the
    general N-step `funnel` operator (this 3-step query keeps its
    original handwritten oracle; the 4-step registration below uses the
    generated one)."""
    ev = _events(spark, sf_dir)
    hops = edits.funnel(ev, ["view", "click", "purchase"], [600.0, 3600.0])
    return (
        edits.funnel_summary(hops)
        .withColumnRenamed("n_anchors", "n_views")
    )


def _funnel_oracle_sql(steps: list[str], windows: list[float]) -> str:
    """Generate the chained-native-ASOF DuckDB oracle for an N-step
    funnel — one ``ASOF LEFT JOIN`` per hop, measuring each hop from the
    previous hop's matched time, then the conversion rollup. Generated
    per step count so ANY `funnel(steps, windows)` call is
    oracle-checkable, not just the shapes someone hand-wrote."""
    ctes = [
        f"s0 AS (SELECT user_id, event_id, epoch(ts) AS t_0\n"
        f"        FROM events WHERE event_type = '{steps[0]}')"
    ]
    for i, s in enumerate(steps[1:], start=1):
        ctes.append(
            f"s{i} AS (SELECT user_id, epoch(ts) AS t_{i} FROM events\n"
            f"        WHERE event_type = '{s}' GROUP BY user_id, epoch(ts))"
        )
    prev = "s0"
    for i in range(1, len(steps)):
        ctes.append(
            f"j{i} AS (SELECT {prev}.*, s{i}.t_{i}\n"
            f"        FROM {prev} ASOF LEFT JOIN s{i}\n"
            f"        ON {prev}.user_id = s{i}.user_id"
            f" AND {prev}.t_{i - 1} <= s{i}.t_{i})"
        )
        prev = f"j{i}"
    conds = " AND ".join(
        f"t_{i} IS NOT NULL AND t_{i} - t_{i - 1} <= {float(w)}"
        for i, w in enumerate(windows, start=1)
    )
    return (
        "WITH " + ",\n".join(ctes) + f"""
    SELECT user_id, count(*) AS n_anchors,
           CAST(sum(CASE WHEN {conds} THEN 1 ELSE 0 END) AS BIGINT)
             AS n_converted
    FROM {prev} GROUP BY user_id
    """
    )


_FUNNEL4_STEPS = ["signup", "view", "click", "purchase"]
_FUNNEL4_WINDOWS = [86400.0, 3600.0, 3600.0]


@register(
    "funnel_signup_4step",
    _funnel_oracle_sql(_FUNNEL4_STEPS, _FUNNEL4_WINDOWS),
)
def _q_funnel_4step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """4-step funnel (signup → view ≤1 d → click ≤1 h → purchase ≤1 h)
    through the general N-step operator, with the oracle SQL GENERATED
    for the same (steps, windows) — proving the loop of forward as-of
    hops composes to DuckDB's chained native ASOF at arbitrary depth."""
    ev = _events(spark, sf_dir)
    hops = edits.funnel(ev, _FUNNEL4_STEPS, _FUNNEL4_WINDOWS)
    return edits.funnel_summary(hops)


@register(
    "dedup_incremental_batch",
    """
    WITH seen AS (
      SELECT DISTINCT coalesce(md5(text), '<NULL>') AS d FROM documents WHERE doc_id % 3 = 0
    ),
    batch AS (
      SELECT doc_id, coalesce(md5(text), '<NULL>') AS digest FROM documents WHERE doc_id % 3 <> 0
    ),
    fresh AS (
      SELECT b.* FROM batch b WHERE NOT EXISTS (
        SELECT 1 FROM seen s WHERE s.d = b.digest
      )
    )
    SELECT digest, min(doc_id) AS keep_id, count(*) AS batch_dups
    FROM fresh GROUP BY digest
    """,
)
def _q_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental dedup: a new batch (docs with doc_id % 3 ≠ 0)
    deduped against the already-ingested corpus (digests of the % 3 = 0
    docs) — digest anti-join + within-batch survivor pick. The
    daily-increment path: the alternative (re-running exact dedup over
    corpus+batch) rescans the full history every day."""
    docs = _table(spark, sf_dir, "documents")
    # sentinel-coalesce to match both the oracle's seen CTE and
    # dedup_incremental's batch-digest convention: with NULL-text docs in
    # the history, bare md5(text) (NULL) would never anti-join-suppress
    # the batch's '<NULL>' digests (r4 advisor finding).
    seen = (
        docs.filter(F.col("doc_id") % 3 == 0)
        .select(F.coalesce(F.md5("text"), F.lit("<NULL>")).alias("d"))
        .distinct()
    )
    batch = docs.filter(F.col("doc_id") % 3 != 0)
    return dd.dedup_incremental(batch, seen)


@register(
    "dedup_incremental_multi",
    """
    WITH d AS (
      SELECT doc_id, doc_id % 3 AS b,
             coalesce(md5(text), '<NULL>') AS digest
      FROM documents
    ),
    fb AS (SELECT digest, min(b) AS batch_id FROM d GROUP BY digest)
    SELECT d.digest, min(d.doc_id) AS keep_id,
           count(*) AS batch_dups, CAST(f.batch_id AS INT) AS batch_id
    FROM d JOIN fb f ON d.digest = f.digest AND d.b = f.batch_id
    GROUP BY d.digest, f.batch_id
    """,
)
def _q_dedup_incremental_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The incremental-dedup PRODUCTION LOOP (r5): three sequential
    batches (doc_id % 3) applied against a hash-bucketed digest-history
    table via `incremental_dedup_batches` — each batch anti-joins the
    bucketed history (history side shuffle-free) and appends its
    survivors. The oracle states the loop's fixed point directly: a
    digest survives in the EARLIEST batch containing it, with that
    batch's min id and dup count — which is what N anti-join steps
    converge to regardless of N (associativity; the 3-batch == one-shot
    equivalence is pinned in tests/test_asof_incremental.py)."""
    import shutil
    import uuid

    docs = _table(spark, sf_dir, "documents")
    batches = [docs.filter(F.col("doc_id") % 3 == i) for i in range(3)]
    table = f"tsdt_hist_{uuid.uuid4().hex[:8]}"
    try:
        out = dd.incremental_dedup_batches(spark, batches, history_table=table)
        rows = out.collect()
        result = spark.createDataFrame(rows, out.schema)
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")
        shutil.rmtree(
            os.path.join(spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
                         .removeprefix("file:"), table),
            ignore_errors=True,
        )
    return result


@register(
    "cdc_latest_event_per_user_type",
    f"""
    SELECT user_id, event_type, event_id, value
    FROM (
      SELECT *, row_number() OVER (
        PARTITION BY user_id, event_type
        ORDER BY ts DESC, event_id DESC
      ) AS rn
      FROM events
    ) WHERE rn = 1
    """,
)
def _q_cdc_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    # CDC/log-compaction dedup: keep the newest record per key — the
    # standard keep-latest operator for incremental training-data feeds.
    # max_by over a composite key would also work; row_number keeps the
    # full row without struct packing.
    df = _events(spark, sf_dir)
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        df.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_type", "event_id", "value")
    )


@register(
    "distinct_event_types_per_user",
    """
    SELECT user_id,
           count(DISTINCT event_type) AS n_types,
           count(*) AS n_events
    FROM events GROUP BY user_id
    """,
)
def _q_distinct_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _events(spark, sf_dir)
    return df.groupBy("user_id").agg(
        F.countDistinct("event_type").alias("n_types"),
        F.count(F.lit(1)).alias("n_events"),
    )


# LSH blocking parameters for the embedding near-dup query. dim=64 is a
# property of the embeddings tables (all SFs); bits/tables trade
# candidate volume vs recall (see operators/similarity.py).
_EMB_DIM, _EMB_BITS, _EMB_TABLES = 64, 8, 6


@register(
    "dedup_embedding_topk_pairs",
    f"""
    WITH ex AS ({_EX_SQL}),
    planes AS (
      SELECT t.t, b.b, i.i,
             ('0x' || substr(md5('tsdt|t' || t.t || '|' || b.b || '|' || i.i), 1, 8))::BIGINT
               / 2147483648.0 - 1.0 AS w
      FROM generate_series(0, {_EMB_TABLES - 1}) t(t),
           generate_series(0, {_EMB_BITS - 1}) b(b),
           generate_series(0, {_EMB_DIM - 1}) i(i)
    ),
    pdots AS (
      SELECT e.vec_id, p.t, p.b,
             CAST(sum(CAST({sql_rd("e.x * p.w", 9)} AS DECIMAL(38,9))) AS DOUBLE) AS d
      FROM ex e JOIN planes p ON p.i = e.i - 1
      GROUP BY e.vec_id, p.t, p.b
    ),
    sigs AS (
      SELECT vec_id, t,
             sum(CASE WHEN d > 0 THEN CAST(1 AS BIGINT) << b ELSE 0 END) AS sig
      FROM pdots GROUP BY vec_id, t
    ),
    cand AS (
      SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
      FROM sigs a JOIN sigs b ON a.t = b.t AND a.sig = b.sig AND a.vec_id < b.vec_id
    ),
    pairdots AS (
      SELECT c.id_a, c.id_b,
             sum(CAST({sql_rd("ea.x * eb.x", 9)} AS DECIMAL(38,9))) AS dxy
      FROM cand c
      JOIN ex ea ON ea.vec_id = c.id_a
      JOIN ex eb ON eb.vec_id = c.id_b AND eb.i = ea.i
      GROUP BY c.id_a, c.id_b
    ),
    norms AS (
      SELECT vec_id, sqrt(CAST(sum(CAST({sql_rd("x * x", 9)} AS DECIMAL(38,9))) AS DOUBLE)) AS nrm
      FROM ex GROUP BY vec_id
    )
    SELECT id_a, id_b,
           {R("CAST(dxy AS DOUBLE) / (na.nrm * nb.nrm)", 6)} AS cosine
    FROM pairdots
    JOIN norms na ON na.vec_id = id_a
    JOIN norms nb ON nb.vec_id = id_b
    ORDER BY CAST(dxy AS DOUBLE) / (na.nrm * nb.nrm) DESC, id_a ASC, id_b ASC
    LIMIT 20
    """,
)
def _q_embedding_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-blocked near-dup pairs (production path). The oracle SQL
    replicates the SAME deterministic blocking (md5-derived planes,
    decimal-exact dot signs), so the gate verifies the full blocked
    algorithm against an independent engine — same approach as
    dedup_minhash_lsh_pairs. The all-pairs exact path remains available
    as sim.topk_similar_pairs for recall measurement."""
    out = sim.topk_similar_pairs_blocked(
        _table(spark, sf_dir, "embeddings"), k=20, bits=_EMB_BITS,
        tables=_EMB_TABLES, dim=_EMB_DIM,
    )
    return out.select("id_a", "id_b", rd(F.col("cosine"), 6).alias("cosine"))


@register(
    "rollup_lineitem_status",
    f"""
    SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
           coalesce(l_linestatus, 'ALL') AS linestatus,
           {_sql_dsum("l_quantity", 2)} AS sum_qty,
           count(*) AS n
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def _q_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    # hierarchical totals in one pass (partial-agg friendly; Spark plans
    # rollup as Expand + single aggregation, not N scans)
    l = _table(spark, sf_dir, "lineitem")
    return (
        l.rollup("l_returnflag", "l_linestatus")
        .agg(_dsum(F.col("l_quantity"), 2).alias("sum_qty"), F.count(F.lit(1)).alias("n"))
        .select(
            F.coalesce(F.col("l_returnflag"), F.lit("ALL")).alias("returnflag"),
            F.coalesce(F.col("l_linestatus"), F.lit("ALL")).alias("linestatus"),
            "sum_qty",
            "n",
        )
    )


@register(
    "pivot_returnflag_by_status",
    f"""
    SELECT l_returnflag AS returnflag,
           {_sql_dsum("CASE WHEN l_linestatus = 'O' THEN l_quantity ELSE NULL END", 2)} AS qty_o,
           {_sql_dsum("CASE WHEN l_linestatus = 'F' THEN l_quantity ELSE NULL END", 2)} AS qty_f
    FROM lineitem GROUP BY l_returnflag
    """,
)
def _q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    # pivot compiles to the same conditional-aggregate shape as the
    # portable CASE form in the oracle
    l = _table(spark, sf_dir, "lineitem")
    return (
        l.groupBy(F.col("l_returnflag").alias("returnflag"))
        .agg(
            _dsum(F.when(F.col("l_linestatus") == "O", F.col("l_quantity")), 2).alias("qty_o"),
            _dsum(F.when(F.col("l_linestatus") == "F", F.col("l_quantity")), 2).alias("qty_f"),
        )
    )


@register(
    "melt_lineitem_measures",
    """
    SELECT l_orderkey AS orderkey, l_linenumber AS linenumber,
           channel, value
    FROM (
      UNPIVOT (
        SELECT l_orderkey, l_linenumber,
               l_quantity, l_extendedprice, l_discount, l_tax
        FROM lineitem WHERE l_orderkey % 100 = 0
      ) ON l_quantity, l_extendedprice, l_discount, l_tax
      INTO NAME channel VALUE value
    )
    """,
)
def _q_melt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long reshape (UNPIVOT/melt): the inverse of the pivot
    query, and the multi-channel overlay layout the reference's plot
    view builds per render (plot2d.py iterates channels into stacked
    series). Spark's native `unpivot` is a zero-shuffle Expand node —
    rows fan out scan-side, nothing is aggregated or joined, so the
    reshape survives any scale the scan itself survives. Measure
    columns must share a type (all double here); the filter keeps the
    oracle's row count honest without losing generality."""
    l = (
        _table(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") % 100 == 0)
        .select(
            F.col("l_orderkey").alias("orderkey"),
            F.col("l_linenumber").alias("linenumber"),
            "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        )
    )
    out = l.unpivot(
        ["orderkey", "linenumber"],
        ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        "channel",
        "value",
    )
    # Spark unpivot KEEPS null measures; DuckDB UNPIVOT drops them —
    # pin the shared (exclude-nulls) semantic explicitly
    return out.filter(F.col("value").isNotNull())


@register(
    "sim_ivf_topk",
    f"""
    WITH ex AS ({_EX_SQL}),
    ord AS (
      SELECT vec_id,
             row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR))) - 1 AS cid
      FROM embeddings
      QUALIFY cid <= 15
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
    qdist AS (
      SELECT c.cid,
             sum(CAST({sql_rd("(qq.x - c.x) * (qq.x - c.x)", 9)} AS DECIMAL(38,9))) AS d
      FROM (SELECT i, x FROM ex WHERE vec_id = 0) qq
      JOIN cex c ON c.i = qq.i
      GROUP BY c.cid
    ),
    probe AS (SELECT cid FROM qdist QUALIFY row_number() OVER (ORDER BY d, cid) <= 4),
    q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
    dots AS ({_DOT_TERMS})
    SELECT d.vec_id,
           {R("CAST(dxy AS DOUBLE) / (sqrt(CAST(dxx AS DOUBLE)) * sqrt(CAST(dyy AS DOUBLE)))", 6)} AS cosine
    FROM dots d
    JOIN assigned a ON a.vec_id = d.vec_id
    JOIN probe p ON p.cid = a.cid
    ORDER BY cosine DESC, d.vec_id ASC
    LIMIT 10
    """,
)
def _q_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF probe top-k: deterministic md5-sampled centroids, DECIMAL-
    exact assignment (ivf_assign_dec) and probe ranking
    (probe_centroids) so the oracle reproduces cell membership; only
    the nprobe=4 of 16 cells are scored."""
    emb = _table(spark, sf_dir, "embeddings")
    qvec = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    cents = sim.ivf_centroids(emb, 16)
    assigned = sim.ivf_assign_dec(emb, cents)
    probe_ids = sim.probe_centroids(cents, qvec, nprobe=4)
    keep = assigned.filter(F.col("centroid_id").isin(probe_ids)).select("vec_id")
    scored = sim.decimal_cosine_vs_query(emb.join(keep, "vec_id"), qvec)
    return (
        scored.select("vec_id", rd(F.col("cosine"), 6).alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col("vec_id").asc())
        .limit(10)
    )


@register(
    "sample_top_n_per_source",
    f"""
    WITH h AS (
      SELECT doc_id, source,
             {sp.sql_hash_u32('doc_id', 'tsdt|topn')} AS hv
      FROM documents
    )
    SELECT doc_id, source FROM h
    QUALIFY row_number() OVER (PARTITION BY source ORDER BY hv, doc_id) <= 10
    """,
)
def _q_top_n_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic fixed-size per-group sample
    (`sp.hash_top_n_per_group`, 10 docs per source by smallest u32
    hash): exact counts per stratum, append-stable membership, one
    keyed window — what rate-based sampling can't give and RNG
    reservoirs can't reproduce."""
    out = sp.hash_top_n_per_group(
        _table(spark, sf_dir, "documents"), n=10, group_col="source"
    )
    return out.select("doc_id", "source")


@register(
    "mix_train_val_test_split",
    f"""
    WITH h AS (
      SELECT doc_id, source,
             {sp.sql_hash_u32('doc_id', 'tsdt|split')} AS hv
      FROM documents
    )
    SELECT doc_id, source,
           CASE WHEN hv < {int(0.1 * (1 << 32))} THEN 'test'
                WHEN hv < {2 * int(0.1 * (1 << 32))} THEN 'val'
                ELSE 'train' END AS split
    FROM h
    """,
)
def _q_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test split (`sp.train_val_test_split`,
    10/10/80 by u32 hash bucket): labels are a pure function of
    (seed, doc_id) — no row can migrate between splits across runs,
    appends, or engines (the leakage mode randomSplit invites).
    Scan-side codegen, zero shuffle."""
    out = sp.train_val_test_split(
        _table(spark, sf_dir, "documents"), val_frac=0.1, test_frac=0.1
    )
    return out.select("doc_id", "source", "split")


_DECONTAM_SQL = """
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS w FROM documents
      WHERE source <> 'src0' AND text IS NOT NULL
    ),
    tg AS (
      SELECT doc_id, md5(g) AS gd FROM (
        SELECT doc_id, unnest(list_distinct(CASE WHEN len(w) - 3 >= 1
          THEN list_transform(generate_series(1, len(w) - 3),
                              i -> array_to_string(w[i:i+3], ' '))
          ELSE [array_to_string(w, ' ')] END)) AS g
        FROM t)
    ),
    h AS (
      SELECT DISTINCT md5(g) AS gd FROM (
        SELECT unnest(list_distinct(CASE WHEN len(w) - 3 >= 1
          THEN list_transform(generate_series(1, len(w) - 3),
                              i -> array_to_string(w[i:i+3], ' '))
          ELSE [array_to_string(w, ' ')] END)) AS g
        FROM (SELECT string_split(text, ' ') AS w FROM documents
              WHERE source = 'src0' AND text IS NOT NULL))
    )
    SELECT tg.doc_id, count(*) AS n_shared_grams
    FROM tg JOIN h USING (gd)
    GROUP BY tg.doc_id
    HAVING count(*) >= 1
    """


@register("dedup_decontaminate_vs_heldout", _DECONTAM_SQL)
def _q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-leakage scan (`dd.decontaminate`): train docs (source
    != src0) sharing any distinct word 4-gram with the held-out set
    (source == src0) are flagged with their shared-gram count — the
    decontamination pass every LLM training pipeline runs. Both sides
    shingle scan-side and join on md5 DIGESTS (narrow keys, nothing
    broadcast, linear in gram volume)."""
    docs = _table(spark, sf_dir, "documents")
    return dd.decontaminate(
        docs.filter(F.col("source") != "src0"),
        docs.filter(F.col("source") == "src0"),
        n=4,
        min_shared=1,
    )


@register("decontam_bloom_prefilter", _DECONTAM_SQL)
def _q_decontam_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`dedup_decontaminate_vs_heldout` behind a Bloom membership
    prefilter (`dd.decontaminate_bloom`): the held-out gram digests
    fold into an m=2^20-bit filter (<= m/64 longs, broadcast once);
    every train gram tests its k=4 md5 probe bits MAP-SIDE and only
    candidates enter the exact digest join — the train gram stream,
    the expensive side at 100 TB, stops shuffling. Zero false
    negatives by construction; false positives die in the exact join.
    The oracle is IDENTICAL to the plain decontamination query —
    result equality is the operator's claim (same pattern as
    `text_heavy_hitters_by_source`)."""
    docs = _table(spark, sf_dir, "documents")
    return dd.decontaminate_bloom(
        docs.filter(F.col("source") != "src0"),
        docs.filter(F.col("source") == "src0"),
        n=4,
        min_shared=1,
    )


@register(
    "sim_ivf_incremental_probe",
    f"""
    WITH ex AS ({_EX_SQL}),
    ord AS (
      SELECT vec_id,
             row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR))) - 1 AS cid
      FROM embeddings WHERE vec_id % 5 < 4
      QUALIFY cid <= 15
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
    qdist AS (
      SELECT c.cid,
             sum(CAST({sql_rd("(qq.x - c.x) * (qq.x - c.x)", 9)} AS DECIMAL(38,9))) AS d
      FROM (SELECT i, x FROM ex WHERE vec_id = 0) qq
      JOIN cex c ON c.i = qq.i
      GROUP BY c.cid
    ),
    probe AS (SELECT cid FROM qdist QUALIFY row_number() OVER (ORDER BY d, cid) <= 4),
    q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
    dots AS ({_DOT_TERMS})
    SELECT d.vec_id,
           {R("CAST(dxy AS DOUBLE) / (sqrt(CAST(dxx AS DOUBLE)) * sqrt(CAST(dyy AS DOUBLE)))", 6)} AS cosine
    FROM dots d
    JOIN assigned a ON a.vec_id = d.vec_id
    JOIN probe p ON p.cid = a.cid
    ORDER BY cosine DESC, d.vec_id ASC
    LIMIT 10
    """,
)
def _q_ivf_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental IVF index maintenance (`sim.ivf_write_index` /
    `ivf_index_probe`): centroids seed from the BASE corpus (vec_id %
    5 < 4) and FREEZE; the remaining 20% arrives as a later batch and
    is assigned + appended into the cell-partitioned on-disk index;
    the probe reads only its nprobe cell directories. The oracle is
    the probe over a one-shot index of the full corpus with the same
    frozen centroids — append-equals-rebuild is the contract (cell
    membership is a pure function of vector × centroids)."""
    import shutil
    import tempfile

    emb = _table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    base = emb.filter(F.col("vec_id") % 5 < 4)
    batch = emb.filter(F.col("vec_id") % 5 == 4)
    qvec = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    cents = sim.ivf_centroids(base, 16)
    work = tempfile.mkdtemp(prefix="tsdt_ivf_idx_")
    try:
        idx = os.path.join(work, "index")
        sim.ivf_write_index(base, idx, cents)
        sim.ivf_write_index(batch, idx, cents, mode="append")
        out = sim.ivf_index_probe(spark, idx, cents, qvec, k=10, nprobe=4)
        rows = out.collect()
        return spark.createDataFrame(rows, out.schema)
    finally:
        shutil.rmtree(work, ignore_errors=True)


@register(
    "emb_quantization_report",
    f"""
    WITH v AS (
      SELECT vec_id, embedding,
             CAST(list_aggregate(embedding, 'min') AS DOUBLE) AS lo,
             CAST(list_aggregate(embedding, 'max') AS DOUBLE) AS hi
      FROM embeddings
    ),
    s AS (
      SELECT vec_id, embedding, lo,
             CASE WHEN hi = lo THEN 1.0 ELSE (hi - lo) / 255.0 END AS scale
      FROM v
    ),
    q AS (
      SELECT vec_id, embedding, lo, scale,
             list_transform(
               embedding,
               x -> CAST(floor((CAST(x AS DOUBLE) - lo) / scale + 0.5) AS BIGINT)
             ) AS qv
      FROM s
    )
    SELECT vec_id,
           CAST(len(qv) AS INT) AS n_dims,
           CAST(list_aggregate(qv, 'sum') AS BIGINT) AS q_sum,
           {sql_rd("lo", 9)} AS q_lo,
           {sql_rd("scale", 9)} AS q_scale,
           {sql_rd("list_aggregate(list_transform(embedding, (x, i) -> abs(lo + qv[i] * scale - CAST(x AS DOUBLE))), 'max')", 9)} AS max_abs_err
    FROM q
    """,
)
def _q_quantization_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8-style scalar quantization audit (`sim.quantization_report`):
    per vector, the code CHECKSUM (pins every quantized value — the
    floor-formula codes are bit-identical cross-engine) and the max
    reconstruction error of the 4×-smaller layout. Pure scan-side
    higher-order expressions, zero shuffle."""
    return sim.quantization_report(_table(spark, sf_dir, "embeddings"))


@register(
    "text_collapse_repeat_tokens",
    """
    WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
    k AS (
      SELECT doc_id, ws,
             list_filter(ws, (x, i) -> i = 1 OR x <> ws[i - 1]) AS kept
      FROM w
    )
    SELECT doc_id,
           array_to_string(kept, ' ') AS cleaned,
           CAST(len(ws) - len(kept) AS INT) AS n_removed
    FROM k
    """,
)
def _q_collapse_repeats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intra-document repetition cleaner (`tx.collapse_repeat_tokens`):
    consecutive duplicate tokens collapse to one — scraper stutter /
    decoder-loop cleanup, pure scan-side array expressions (388 of 500
    sf0.01 docs carry at least one repeat run)."""
    return tx.collapse_repeat_tokens(_table(spark, sf_dir, "documents"))


@register(
    "text_chunk_documents",
    """
    WITH base AS (
      SELECT doc_id,
             list_filter(string_split(trim(text), ' '), x -> length(x) > 0) AS ts
      FROM documents WHERE text IS NOT NULL
    ),
    sized AS (SELECT doc_id, ts, len(ts) AS n FROM base WHERE len(ts) > 0),
    ex AS (
      SELECT doc_id, ts, n,
             CAST(unnest(generate_series(0,
               CASE WHEN n <= 32 THEN 0
                    ELSE CAST(ceil((n - 32) / 24.0) AS INT) END)) AS INT) AS chunk_id
      FROM sized
    )
    SELECT doc_id, chunk_id,
           array_to_string(list_slice(ts, chunk_id * 24 + 1, chunk_id * 24 + 32), ' ') AS chunk_text,
           CAST(least(32, n - chunk_id * 24) AS INT) AS n_tokens
    FROM ex
    """,
)
def _q_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window document chunking (`tx.chunk_documents`,
    32-token chunks, 8-token overlap → stride 24) — the chunk step of
    chunk→embed→pool retrieval pipelines. Zero-shuffle scan-side fan-
    out; the oracle rebuilds every chunk string with list slicing."""
    return tx.chunk_documents(
        _table(spark, sf_dir, "documents"), chunk_tokens=32, overlap=8
    )


@register(
    "text_tfidf_top_terms",
    f"""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(trim(text), ' ')) AS token FROM documents
    ),
    t2 AS (SELECT * FROM toks WHERE length(token) > 0),
    tf AS (SELECT doc_id, token, count(*) AS tf FROM t2 GROUP BY 1, 2),
    dfq AS (SELECT token, count(*) AS doc_freq FROM tf GROUP BY token),
    n AS (SELECT count(*) AS n_docs FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.token, tf.tf, dfq.doc_freq,
             CAST(tf.tf AS DOUBLE) * CAST(n.n_docs + 1 AS DOUBLE)
               / CAST(dfq.doc_freq + 1 AS DOUBLE) AS s
      FROM tf JOIN dfq USING (token), n
    )
    SELECT doc_id, token, tf, doc_freq,
           CAST(row_number() OVER (PARTITION BY doc_id ORDER BY s DESC, token ASC) AS INT) AS rank,
           {sql_rd("s", 6)} AS score
    FROM scored
    QUALIFY rank <= 3
    """,
)
def _q_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document top-3 tf-idf terms (`tx.tfidf_top_terms`) — keyword
    extraction over the corpus. Un-logged idf ratio so the score is
    IEEE-deterministic across engines (ln() is last-ulp ambiguous);
    one token explode, narrow tf/df aggregations, 1-row scalar N,
    keyed top-k window."""
    return tx.tfidf_top_terms(_table(spark, sf_dir, "documents"), top_k=3)


@register(
    "sim_ivf_batch_topk",
    f"""
    WITH ex AS ({_EX_SQL}),
    ord AS (
      SELECT vec_id,
             row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR))) - 1 AS cid
      FROM embeddings
      QUALIFY cid <= 15
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
    qex AS (SELECT vec_id AS query_id, i, x FROM ex WHERE vec_id IN (0, 1, 2, 3, 4)),
    qdist AS (
      SELECT q.query_id, c.cid,
             sum(CAST({sql_rd("(q.x - c.x) * (q.x - c.x)", 9)} AS DECIMAL(38,9))) AS d
      FROM qex q JOIN cex c ON c.i = q.i
      GROUP BY q.query_id, c.cid
    ),
    probe AS (
      SELECT query_id, cid FROM qdist
      QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY d, cid) <= 4
    ),
    cand AS (
      SELECT p.query_id, a.vec_id FROM probe p JOIN assigned a ON a.cid = p.cid
    ),
    terms AS (
      SELECT c.query_id, c.vec_id,
             sum(CAST({sql_rd("e.x * q.x", 9)} AS DECIMAL(38,9))) AS dxy,
             sum(CAST({sql_rd("e.x * e.x", 9)} AS DECIMAL(38,9))) AS dxx,
             sum(CAST({sql_rd("q.x * q.x", 9)} AS DECIMAL(38,9))) AS dyy
      FROM cand c
      JOIN ex e ON e.vec_id = c.vec_id
      JOIN qex q ON q.query_id = c.query_id AND q.i = e.i
      GROUP BY c.query_id, c.vec_id
    ),
    scored AS (
      SELECT query_id, vec_id,
             {R("CAST(dxy AS DOUBLE) / (sqrt(CAST(dxx AS DOUBLE)) * sqrt(CAST(dyy AS DOUBLE)))", 6)} AS cosine
      FROM terms
    )
    SELECT query_id, vec_id, cosine,
           CAST(row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, vec_id ASC) AS INT) AS rank
    FROM scored
    QUALIFY rank <= 10
    """,
)
def _q_ivf_batch_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch ANN: IVF top-10 for five query vectors in ONE corpus pass
    (`sim.ivf_batch_topk`) — the corpus is assigned once, each query
    scores only its nprobe=4 probed cells, ranking is a query-keyed
    window. The production shape for retrieval jobs that run thousands
    of probes; everything decimal-exact so the oracle reproduces cell
    membership, candidates, and ranks."""
    emb = _table(spark, sf_dir, "embeddings")
    qset = emb.filter(F.col("vec_id").isin([0, 1, 2, 3, 4]))
    return sim.ivf_batch_topk(emb, qset, k=10)


@register(
    "emb_mean_pool_by_label",
    f"""
    WITH ex AS (
      SELECT label, u['i'] - 1 AS i, CAST(u['v'] AS DOUBLE) AS x
      FROM (SELECT label,
                   unnest(list_transform(embedding, (x, i) -> {{'v': x, 'i': i}})) AS u
            FROM embeddings)
    )
    SELECT label, i,
           {sql_rd("CAST(sum(CAST(" + sql_rd("x", 9) + " AS DECIMAL(38,9))) AS DOUBLE) / count(*)", 6)} AS m,
           count(*) AS n_vecs
    FROM ex GROUP BY label, i
    """,
)
def _q_emb_mean_pool(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label mean-pooled embedding (`sim.mean_pool`) — the
    chunk→document / class-centroid pooling step of embedding
    pipelines. One map-side-combined decimal aggregation over narrow
    (label, position) partials; vectors never shuffle, means are
    decimal-exact so pooled centroids reproduce bit-for-bit in any
    engine."""
    return sim.mean_pool(_table(spark, sf_dir, "embeddings"))


@register(
    "sim_ivf_topk_refined",
    f"""
    WITH ex AS ({_EX_SQL}),
    ord AS (
      SELECT vec_id,
             row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR))) - 1 AS cid
      FROM embeddings
      QUALIFY cid <= 15
    ),
    cex0 AS (SELECT o.cid, e.i, e.x FROM ord o JOIN ex e ON e.vec_id = o.vec_id),
    sam AS (
      SELECT vec_id FROM embeddings
      WHERE substr(md5('tsdt|ivfs|' || CAST(vec_id AS VARCHAR)), 1, 1) < '8'
    ),
    d0 AS (
      SELECT e.vec_id, c.cid,
             sum(CAST({sql_rd("(e.x - c.x) * (e.x - c.x)", 9)} AS DECIMAL(38,9))) AS d
      FROM ex e JOIN sam s ON s.vec_id = e.vec_id JOIN cex0 c ON c.i = e.i
      GROUP BY e.vec_id, c.cid
    ),
    a0 AS (
      SELECT vec_id, cid FROM d0
      QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) = 1
    ),
    upd AS (
      SELECT a.cid, e.i,
             {sql_rd("CAST(sum(CAST(" + sql_rd("e.x", 9) + " AS DECIMAL(38,9))) AS DOUBLE) / count(*)", 9)} AS x
      FROM ex e JOIN a0 a ON a.vec_id = e.vec_id
      GROUP BY a.cid, e.i
    ),
    cex AS (
      SELECT cid, i, x FROM upd
      UNION ALL
      SELECT c.cid, c.i, c.x FROM cex0 c
      WHERE c.cid NOT IN (SELECT DISTINCT cid FROM upd)
    ),
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
    qdist AS (
      SELECT c.cid,
             sum(CAST({sql_rd("(qq.x - c.x) * (qq.x - c.x)", 9)} AS DECIMAL(38,9))) AS d
      FROM (SELECT i, x FROM ex WHERE vec_id = 0) qq
      JOIN cex c ON c.i = qq.i
      GROUP BY c.cid
    ),
    probe AS (SELECT cid FROM qdist QUALIFY row_number() OVER (ORDER BY d, cid) <= 4),
    q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
    dots AS ({_DOT_TERMS})
    SELECT d.vec_id,
           {R("CAST(dxy AS DOUBLE) / (sqrt(CAST(dxx AS DOUBLE)) * sqrt(CAST(dyy AS DOUBLE)))", 6)} AS cosine
    FROM dots d
    JOIN assigned a ON a.vec_id = d.vec_id
    JOIN probe p ON p.cid = a.cid
    ORDER BY cosine DESC, d.vec_id ASC
    LIMIT 10
    """,
)
def _q_ivf_topk_refined(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF probe top-k over LLOYD-REFINED centroids: one decimal-exact
    k-means round (`sim.ivf_lloyd_refine`) over a deterministic 50%
    md5-sample tightens the md5-picked seeds toward real density before
    assignment — the production index-build step for 100 TB corpora
    (VERDICT r4 #4). The oracle unrolls the round in SQL (sample →
    assign → exact decimal means → reassign), so cell membership,
    probe choice, and the re-ranked top-10 are all bit-checked."""
    emb = _table(spark, sf_dir, "embeddings")
    qvec = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    seeds = sim.ivf_centroids(emb, 16)
    cents = sim.ivf_lloyd_refine(emb, seeds, rounds=1)
    assigned = sim.ivf_assign_dec(emb, cents)
    probe_ids = sim.probe_centroids(cents, qvec, nprobe=4)
    keep = assigned.filter(F.col("centroid_id").isin(probe_ids)).select("vec_id")
    scored = sim.decimal_cosine_vs_query(emb.join(keep, "vec_id"), qvec)
    return (
        scored.select("vec_id", rd(F.col("cosine"), 6).alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col("vec_id").asc())
        .limit(10)
    )


# ---------------------------------------------------------------------------
# substring-level (span) dedup — Lee et al. ACL 2022 granularity
# ---------------------------------------------------------------------------

_SPAN_K = 8


def _span_grams_sql(k: int) -> str:
    """Shared oracle prelude: (doc_id, pos, gd) positional k-gram
    digests, 1-based, mirroring `dd.positional_grams`."""
    return f"""
    toks AS (
      SELECT doc_id, string_split(trim(text), ' ') AS w
      FROM documents WHERE text IS NOT NULL
    ),
    posns AS (
      SELECT doc_id, w, generate_subscripts(w, 1) AS pos
      FROM toks WHERE len(w) >= {k}
    ),
    grams AS (
      SELECT doc_id, pos,
             md5(array_to_string(list_slice(w, pos, pos+{k - 1}), ' ')) AS gd
      FROM posns WHERE pos <= len(w) - {k - 1}
    )"""


_SPAN_ISLANDS_SQL = f"""
    dup AS (SELECT gd FROM grams GROUP BY gd HAVING count(distinct doc_id) >= 2),
    hits AS (
      SELECT g.doc_id, g.pos AS s, g.pos + {_SPAN_K - 1} AS e
      FROM grams g JOIN dup d ON d.gd = g.gd
    ),
    marked AS (
      SELECT doc_id, s, e,
             CASE WHEN s > coalesce(max(e) OVER (
                 PARTITION BY doc_id ORDER BY s, e
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1) + 1
             THEN 1 ELSE 0 END AS new_island
      FROM hits
    ),
    islands AS (
      SELECT doc_id, s, e,
             sum(new_island) OVER (PARTITION BY doc_id ORDER BY s, e
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
      FROM marked
    )"""


@register(
    "dedup_duplicate_spans",
    f"""
    WITH {_span_grams_sql(_SPAN_K)},
    {_SPAN_ISLANDS_SQL}
    SELECT doc_id, min(s) AS span_start, max(e) AS span_end,
           max(e) - min(s) + 1 AS n_tokens
    FROM islands GROUP BY doc_id, island
    """,
)
def _q_duplicate_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Substring-level duplicate detection (`dd.duplicate_spans`): the
    dedup granularity doc-level passes miss — k-token spans repeated
    ACROSS documents (license headers, boilerplate, quoted passages),
    merged into maximal per-doc islands. Linear plan: positional gram
    digests scan-side, one distinct-doc count per digest, one
    shuffle-hash rehydration join, per-doc keyed window merge."""
    return dd.duplicate_spans(_table(spark, sf_dir, "documents"), k=_SPAN_K)


@register(
    "dedup_span_stats_by_source",
    f"""
    WITH {_span_grams_sql(_SPAN_K)},
    {_SPAN_ISLANDS_SQL},
    spans AS (
      SELECT doc_id, max(e) - min(s) + 1 AS n_tokens
      FROM islands GROUP BY doc_id, island
    ),
    per_doc AS (SELECT doc_id, sum(n_tokens) AS dup_tokens FROM spans GROUP BY doc_id),
    tok AS (
      SELECT d.source, d.doc_id,
             CASE WHEN d.text IS NOT NULL
                  THEN len(string_split(trim(d.text), ' ')) ELSE 0 END AS n_tok,
             coalesce(p.dup_tokens, 0) AS dup_tokens
      FROM documents d LEFT JOIN per_doc p ON p.doc_id = d.doc_id
    )
    SELECT source, CAST(sum(n_tok) AS BIGINT) AS total_tokens,
           CAST(sum(dup_tokens) AS BIGINT) AS dup_span_tokens,
           {R("CAST(sum(dup_tokens) AS DOUBLE) / CAST(sum(n_tok) AS DOUBLE)", 6)} AS dup_fraction
    FROM tok GROUP BY source
    """,
)
def _q_span_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source duplicated-token budget (`dd.duplicate_span_stats`):
    the corpus-health metric that decides whether a span-removal
    rewrite pass pays for itself. Algebraic aggregations only on top
    of the span plan; exact integer token counts, fraction rounded
    with the shared floor formula."""
    return dd.duplicate_span_stats(_table(spark, sf_dir, "documents"), k=_SPAN_K)


@register(
    "dedup_span_removal",
    f"""
    WITH {_span_grams_sql(_SPAN_K)},
    owners AS (
      SELECT gd, min(doc_id) AS owner FROM grams
      GROUP BY gd HAVING count(distinct doc_id) >= 2
    ),
    covered AS (
      SELECT DISTINCT g.doc_id, u.t
      FROM grams g JOIN owners o ON o.gd = g.gd AND o.owner <> g.doc_id,
           unnest(generate_series(g.pos, g.pos + {_SPAN_K - 1})) AS u(t)
    ),
    affected AS (SELECT DISTINCT doc_id FROM covered),
    aff_tok AS (
      SELECT p.doc_id, generate_subscripts(p.w, 1) AS t, unnest(p.w) AS tok
      FROM (SELECT t2.doc_id, t2.w FROM toks t2
            JOIN affected a ON a.doc_id = t2.doc_id) p
    ),
    kept AS (
      SELECT a.doc_id, a.t, a.tok FROM aff_tok a
      ANTI JOIN covered c ON c.doc_id = a.doc_id AND c.t = a.t
    ),
    rebuilt AS (
      SELECT doc_id, string_agg(tok, ' ' ORDER BY t) AS new_text
      FROM kept GROUP BY doc_id
    ),
    rebuilt_all AS (
      SELECT a.doc_id AS rid, coalesce(r.new_text, '') AS new_text
      FROM affected a LEFT JOIN rebuilt r ON r.doc_id = a.doc_id
    )
    SELECT d.doc_id,
           CASE WHEN ra.rid IS NOT NULL THEN ra.new_text ELSE d.text END AS text
    FROM documents d LEFT JOIN rebuilt_all ra ON ra.rid = d.doc_id
    """,
)
def _q_span_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-level dedup REWRITE (`dd.remove_duplicate_spans`): each
    duplicate gram's lowest-id document owns it; every other document
    drops the covered tokens — the Lee-et-al. remove-all-but-one
    contract, made deterministic and append-stable by min-id
    ownership. The token-level explode touches AFFECTED docs only;
    untouched docs pass through as a column copy."""
    return dd.remove_duplicate_spans(_table(spark, sf_dir, "documents"), k=_SPAN_K)


@register(
    "text_bigram_lm_score",
    f"""
    WITH toks AS (
      SELECT doc_id, string_split(trim(text), ' ') AS w
      FROM documents WHERE text IS NOT NULL
    ),
    posns AS (
      SELECT doc_id, w, generate_subscripts(w, 1) AS pos
      FROM toks WHERE len(w) >= 2
    ),
    bg AS (
      SELECT doc_id,
             md5(array_to_string(list_slice(w, pos, pos+1), ' ')) AS bd,
             md5(w[pos]) AS cd
      FROM posns WHERE pos <= len(w) - 1
    ),
    bgc AS (SELECT bd, count(*) AS c2 FROM bg GROUP BY bd),
    ctx AS (SELECT cd, count(*) AS c1 FROM bg GROUP BY cd),
    vocab AS (
      SELECT count(distinct md5(u.tok)) AS v
      FROM toks, unnest(toks.w) AS u(tok)
    ),
    scored AS (
      SELECT b.doc_id,
             {R("-log2(CAST(c.c2 + 1 AS DOUBLE) / CAST(x.c1 + vocab.v AS DOUBLE))", 6)} AS nll
      FROM bg b
      JOIN bgc c ON c.bd = b.bd
      JOIN ctx x ON x.cd = b.cd
      CROSS JOIN vocab
    )
    SELECT doc_id, count(*) AS n_bigrams,
           {R("CAST(sum(CAST(nll AS DECIMAL(38,6))) AS DOUBLE) / count(*)", 6)} AS avg_nll
    FROM scored GROUP BY doc_id
    """,
)
def _q_bigram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-trained bigram LM fluency score (`tx.bigram_lm_score`):
    the perplexity-style filter signal, trained and applied in one
    job. Digest-keyed counts and joins (32-hex keys shuffle, never
    token text); V is the sanctioned 1-row broadcast scalar; per-term
    -log2 terms round@6 then decimal-accumulate so the per-doc mean is
    order-independent."""
    return tx.bigram_lm_score(_table(spark, sf_dir, "documents"))


@register(
    "mix_shuffle_shards",
    f"""
    WITH h AS (
      SELECT doc_id, {sp.sql_hash_u32('doc_id', 'tsdt|shuffle')} AS hv
      FROM documents
    )
    SELECT doc_id, CAST(hv % 16 AS INTEGER) AS shard,
           CAST(row_number() OVER (PARTITION BY hv % 16 ORDER BY hv, doc_id) - 1
                AS BIGINT) AS pos
    FROM h
    """,
)
def _q_shuffle_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global training shuffle (`sp.shuffle_to_shards`):
    hash-permutation into 16 shards with within-shard positions — the
    export-order primitive (no global sort, no rand()); one shuffle +
    per-shard keyed window."""
    out = sp.shuffle_to_shards(_table(spark, sf_dir, "documents"), n_shards=16)
    return out.select("doc_id", "shard", "pos")


# C4/Gopher-style rule filter: SQL mirror of tx.C4_RULES (same order,
# same thresholds — keep in sync).
_C4_FEATS_SQL = f"""
    feats AS (
      SELECT doc_id, text,
             length(text) AS q_n_chars,
             CASE WHEN length(trim(text)) = 0 THEN 0
                  ELSE len(string_split(trim(text), ' ')) END AS q_n_tokens,
             ({" + ".join(f"(length(text) - length(replace(text, '{c}', '')))" for c in ".,;:!?")}) AS punct,
             ({" + ".join(f"(length(text) - length(replace(text, '{c}', '')))" for c in "0123456789")}) AS digits,
             {", ".join(f"{_lang_score_sql(lang)} AS s_{lang}" for lang in tx.LANG_MARKERS)}
      FROM documents
    ),
    ratios AS (
      SELECT doc_id, text, q_n_chars, q_n_tokens,
             CAST(q_n_chars - (q_n_tokens - 1) AS DOUBLE)
               / (CASE WHEN q_n_tokens = 0 THEN 1 ELSE q_n_tokens END) AS q_mean_token_len,
             CAST(punct AS DOUBLE) / (CASE WHEN q_n_chars = 0 THEN 1 ELSE q_n_chars END) AS q_punct_ratio,
             CAST(digits AS DOUBLE) / (CASE WHEN q_n_chars = 0 THEN 1 ELSE q_n_chars END) AS q_digit_ratio,
             (s_en) / (CASE WHEN q_n_tokens = 0 THEN 1 ELSE q_n_tokens END) AS q_stopword_ratio,
             {_LANG_CASE} AS lang_pred
      FROM feats
    )"""

_C4_RULES_SQL = [
    ("nonnull_text", "text IS NOT NULL"),
    ("min_tokens", "q_n_tokens >= 10"),
    ("max_tokens", "q_n_tokens <= 20000"),
    ("mean_token_len", "q_mean_token_len >= 2.0 AND q_mean_token_len <= 12.0"),
    ("digit_ratio", "q_digit_ratio <= 0.15"),
    ("punct_ratio", "q_punct_ratio <= 0.15"),
    ("stopword_ratio", "q_stopword_ratio >= 0.01"),
    ("lang_en", "lang_pred = 'en'"),
]

_C4_CUM = [
    " AND ".join(f"({c})" for _, c in _C4_RULES_SQL[: i + 1])
    for i in range(len(_C4_RULES_SQL))
]


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


_EMB_CLUSTER_TAU = 0.4


@register(
    "dedup_embedding_clusters",
    f"""
    WITH RECURSIVE ex AS ({_EX_SQL}),
    planes AS (
      SELECT t.t, b.b, i.i,
             ('0x' || substr(md5('tsdt|t' || t.t || '|' || b.b || '|' || i.i), 1, 8))::BIGINT
               / 2147483648.0 - 1.0 AS w
      FROM generate_series(0, {_EMB_TABLES - 1}) t(t),
           generate_series(0, {_EMB_BITS - 1}) b(b),
           generate_series(0, {_EMB_DIM - 1}) i(i)
    ),
    pdots AS (
      SELECT e.vec_id, p.t, p.b,
             CAST(sum(CAST({sql_rd("e.x * p.w", 9)} AS DECIMAL(38,9))) AS DOUBLE) AS d
      FROM ex e JOIN planes p ON p.i = e.i - 1
      GROUP BY e.vec_id, p.t, p.b
    ),
    sigs AS (
      SELECT vec_id, t,
             sum(CASE WHEN d > 0 THEN CAST(1 AS BIGINT) << b ELSE 0 END) AS sig
      FROM pdots GROUP BY vec_id, t
    ),
    cand AS (
      SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
      FROM sigs a JOIN sigs b ON a.t = b.t AND a.sig = b.sig AND a.vec_id < b.vec_id
    ),
    pairdots AS (
      SELECT c.id_a, c.id_b,
             sum(CAST({sql_rd("ea.x * eb.x", 9)} AS DECIMAL(38,9))) AS dxy
      FROM cand c
      JOIN ex ea ON ea.vec_id = c.id_a
      JOIN ex eb ON eb.vec_id = c.id_b AND eb.i = ea.i
      GROUP BY c.id_a, c.id_b
    ),
    norms AS (
      SELECT vec_id, sqrt(CAST(sum(CAST({sql_rd("x * x", 9)} AS DECIMAL(38,9))) AS DOUBLE)) AS nrm
      FROM ex GROUP BY vec_id
    ),
    edges AS (
      SELECT id_a, id_b FROM pairdots
      JOIN norms na ON na.vec_id = id_a
      JOIN norms nb ON nb.vec_id = id_b
      WHERE CAST(dxy AS DOUBLE) / (na.nrm * nb.nrm) >= {_EMB_CLUSTER_TAU}
    ),
    sym AS (
      SELECT id_a AS src, id_b AS dst FROM edges
      UNION
      SELECT id_b AS src, id_a AS dst FROM edges
    ),
    reach(src, dst) AS (
      SELECT vec_id AS src, vec_id AS dst FROM embeddings
      UNION
      SELECT r.src, s.dst FROM reach r JOIN sym s ON s.src = r.dst
    )
    SELECT src AS vec_id, min(dst) AS cluster_id FROM reach GROUP BY src
    """,
)
def _q_embedding_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SEMANTIC dedup clusters: LSH-blocked candidate pairs with exact
    cosine >= τ (`sim.threshold_similar_pairs_blocked` — no top-k cap,
    the full thresholded edge set) fed into the same min-label
    connected components as the text-dedup path
    (`dd.connected_components`). The embedding-space analogue of
    `dedup_clusters`; oracle computes the identical fixpoint with a
    recursive CTE over the identically-blocked edge set."""
    emb = _table(spark, sf_dir, "embeddings")
    pairs = sim.threshold_similar_pairs_blocked(
        emb, tau=_EMB_CLUSTER_TAU, bits=_EMB_BITS, tables=_EMB_TABLES, dim=_EMB_DIM
    )
    out = dd.connected_components(
        pairs.select("id_a", "id_b"), all_ids=emb.select("vec_id"), id_col="vec_id"
    )
    return out.select("vec_id", "cluster_id")


@register(
    "sim_ivf_pq_topk",
    f"""
    WITH ex AS ({_EX_SQL}),
    ord AS (
      SELECT vec_id,
             row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR))) - 1 AS cid
      FROM embeddings
      QUALIFY cid <= 15
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
    qdist AS (
      SELECT c.cid,
             sum(CAST({sql_rd("(qq.x - c.x) * (qq.x - c.x)", 9)} AS DECIMAL(38,9))) AS d
      FROM (SELECT i, x FROM ex WHERE vec_id = 0) qq
      JOIN cex c ON c.i = qq.i
      GROUP BY c.cid
    ),
    probe AS (SELECT cid FROM qdist QUALIFY row_number() OVER (ORDER BY d, cid) <= 4),
    probed AS (
      SELECT a.vec_id FROM assigned a JOIN probe p ON p.cid = a.cid
    ),
    qp AS (
      SELECT e.vec_id, min(e.x) AS lo, max(e.x) AS hi
      FROM ex e JOIN probed pr ON pr.vec_id = e.vec_id
      GROUP BY e.vec_id
    ),
    qp2 AS (
      SELECT vec_id, lo,
             CASE WHEN hi = lo THEN 1.0 ELSE (hi - lo) / 255.0 END AS scale
      FROM qp
    ),
    recon AS (
      SELECT e.vec_id, e.i,
             q2.lo + floor((e.x - q2.lo) / q2.scale + 0.5) * q2.scale AS rx
      FROM ex e JOIN qp2 q2 ON q2.vec_id = e.vec_id
    ),
    qv AS (SELECT i, x FROM ex WHERE vec_id = 0),
    adots AS (
      SELECT r.vec_id,
             CAST(sum(CAST({sql_rd("r.rx * qv.x", 9)} AS DECIMAL(38,9))) AS DOUBLE) AS approx_dot
      FROM recon r JOIN qv ON qv.i = r.i
      GROUP BY r.vec_id
    ),
    short AS (
      SELECT vec_id, approx_dot FROM adots
      QUALIFY row_number() OVER (ORDER BY approx_dot DESC, vec_id ASC) <= 30
    ),
    q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
    dots AS ({_DOT_TERMS})
    SELECT d.vec_id,
           {R("CAST(dxy AS DOUBLE) / (sqrt(CAST(dxx AS DOUBLE)) * sqrt(CAST(dyy AS DOUBLE)))", 6)} AS cosine,
           {R("s.approx_dot", 6)} AS approx_dot
    FROM dots d JOIN short s ON s.vec_id = d.vec_id
    ORDER BY cosine DESC, d.vec_id ASC
    LIMIT 10
    """,
)
def _q_ivf_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF + quantized-scan + exact re-rank (`sim.ivf_pq_topk`): the
    full disk-resident ANN read path — coarse probe (4/16 cells),
    int8-style quantized candidate scoring (the 4×-smaller layout a
    100 TB store scans), deterministic 30-candidate shortlist, exact
    decimal re-rank of the shortlist only. Oracle unrolls every stage:
    md5-seeded centroids, decimal assignment, floor-formula codes,
    reconstruction, shortlist, re-rank."""
    emb = _table(spark, sf_dir, "embeddings")
    qvec = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    out = sim.ivf_pq_topk(emb, qvec, k=10, shortlist=30, n_centroids=16, nprobe=4)
    return out.select(
        "vec_id",
        rd(F.col("cosine"), 6).alias("cosine"),
        rd(F.col("approx_dot"), 6).alias("approx_dot"),
    )


_REP_WS = """
    w AS (
      SELECT doc_id, list_filter(string_split(trim(text), ' '), x -> length(x) > 0) AS ws
      FROM documents WHERE text IS NOT NULL
    ),
    s AS (
      SELECT doc_id, ws, len(ws) AS n,
             list_aggregate(list_transform(ws, x -> length(x)), 'sum') AS chars,
             len(list_distinct(ws)) AS nd
      FROM w WHERE len(ws) > 0
    ),
    toks AS (SELECT doc_id, unnest(ws) AS tok FROM s),
    tc AS (SELECT doc_id, tok, count(*) AS c FROM toks GROUP BY 1, 2),
    topu AS (
      SELECT doc_id, tok, c, c * length(tok) AS mass,
             row_number() OVER (
               PARTITION BY doc_id ORDER BY c * length(tok) DESC, tok ASC
             ) AS rn
      FROM tc
    )
"""


@register(
    "text_repetition_stats",
    f"""
    WITH {_REP_WS},
    bgl AS (
      SELECT doc_id, list_filter(
               list_transform(ws, (x, i) ->
                 CASE WHEN i < len(ws) THEN x || ' ' || ws[i + 1] END),
               b -> b IS NOT NULL) AS bs
      FROM s
    ),
    bt AS (SELECT doc_id, unnest(bs) AS b FROM bgl),
    bc AS (SELECT doc_id, b, count(*) AS c FROM bt GROUP BY 1, 2),
    topb AS (
      SELECT doc_id, b, c, c * (length(b) - 1) AS mass,
             row_number() OVER (
               PARTITION BY doc_id ORDER BY c * (length(b) - 1) DESC, b ASC
             ) AS rn
      FROM bc
    )
    SELECT s.doc_id,
           CAST(s.n AS INT) AS n_tokens,
           CAST(s.nd AS INT) AS n_distinct,
           {R("CAST(s.n - s.nd AS DOUBLE) / s.n", 6)} AS dup_token_frac,
           u.tok AS top_token,
           CAST(u.c AS INT) AS top_token_count,
           {R("CAST(u.mass AS DOUBLE) / s.chars", 6)} AS top_token_char_frac,
           coalesce(b.b, '') AS top_bigram,
           CAST(coalesce(b.c, 0) AS INT) AS top_bigram_count,
           {R("CAST(coalesce(b.mass, 0) AS DOUBLE) / s.chars", 6)} AS top_bigram_char_frac
    FROM s
    JOIN (SELECT * FROM topu WHERE rn = 1) u ON s.doc_id = u.doc_id
    LEFT JOIN (SELECT * FROM topb WHERE rn = 1) b ON s.doc_id = b.doc_id
    """,
)
def _q_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc Gopher/MassiveText repetition metrics
    (`tx.repetition_stats`): duplicate-token fraction + top-unigram /
    top-bigram char coverage — the intra-document repetition signal
    exact dedup cannot see. Spark computes each doc's mode via
    array_sort + ONE linear run-length `aggregate` (zero shuffle,
    whole-stage codegen); the oracle takes the explode + GROUP BY +
    argmax road and must agree exactly, tie-broken to the
    lexicographically-smallest gram on equal char mass."""
    return tx.repetition_stats(_table(spark, sf_dir, "documents"))


_GOPHER_STOP_SQL = " + ".join(
    f"(length(' ' || text || ' ') - length(replace(' ' || text || ' ', ' {w} ', ''))) / {len(w) + 2}.0"
    for w in tx.GOPHER_STOPWORDS
)


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
    "mix_temperature_sample",
    f"""
    WITH c AS (SELECT source, count(*) AS c FROM documents GROUP BY source),
    t AS (
      SELECT CAST(sum(CAST({R("sqrt(CAST(c AS DOUBLE))", 9)} AS DECIMAL(38,9))) AS DOUBLE) AS T,
             CAST(sum(c) AS DOUBLE) AS N
      FROM c
    ),
    r AS (
      SELECT source,
             least(1.0,
               ((0.25 * t.N) * {R("sqrt(CAST(c AS DOUBLE))", 9)})
                 / ((CAST(c AS DOUBLE)) * t.T)) AS rate
      FROM c, t
    )
    SELECT d.doc_id, d.source, {R("r.rate", 9)} AS keep_rate
    FROM documents d JOIN r ON d.source = r.source
    WHERE {sp.sql_hash_u32("d.doc_id", "tsdt|temp")}
          < CAST(floor(r.rate * 4294967296.0) AS BIGINT)
    """,
)
def _q_temperature_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """α=0.5 temperature-scaled domain sampling
    (`sp.temperature_sample`): per-source keep rates ∝ √count/count at
    an overall 25% target — the mT5-style domain-rebalancing step.
    Rates are decimal-exact (√c rounded to 9 dp, T summed in decimal),
    membership is the portable md5 coin; the oracle reproduces every
    rate and every member bit-for-bit."""
    return sp.temperature_sample(
        _table(spark, sf_dir, "documents"), target_frac=0.25
    ).select("doc_id", "source", "keep_rate")


@register(
    "emb_covariance",
    f"""
    WITH t AS (
      SELECT vec_id,
             unnest(list_transform(embedding,
               (x, i) -> {{'i': i - 1, 'x': CAST(x AS DOUBLE)}})) AS u
      FROM embeddings
    ),
    e AS (SELECT vec_id, u.i AS i, u.x AS x FROM t),
    pr AS (
      SELECT a.i AS i, b.i AS j,
             sum(CAST({R("a.x * b.x", 9)} AS DECIMAL(38,9))) AS sp,
             count(*) AS n
      FROM e a JOIN e b ON a.vec_id = b.vec_id AND a.i <= b.i
      GROUP BY 1, 2
    ),
    m AS (
      SELECT i, CAST(sum(CAST({R("x", 9)} AS DECIMAL(38,9))) AS DOUBLE) AS sm
      FROM e GROUP BY i
    )
    SELECT CAST(pr.i AS INT) AS i, CAST(pr.j AS INT) AS j, pr.n AS n_vecs,
           {R("(CAST(pr.sp AS DOUBLE) / CAST(pr.n AS DOUBLE)) - ((mi.sm / CAST(pr.n AS DOUBLE)) * (mj.sm / CAST(pr.n AS DOUBLE)))", 6)} AS cov
    FROM pr JOIN m mi ON pr.i = mi.i JOIN m mj ON pr.j = mj.i
    """,
)
def _q_emb_covariance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed d×d covariance of the embedding store
    (`sim.covariance_matrix`) — the bounded-summary first step of
    PCA/whitening at 100 TB: N is the scale axis, the d² result is
    driver-sized. Scan-side nested shifted-slice pair expansion (no
    self-join — the oracle takes the self-join road and must agree),
    map-side-combined decimal aggregation, broadcast mean joins."""
    return sim.covariance_matrix(_table(spark, sf_dir, "embeddings"))


def _jl_oracle_sql(in_dim: int, out_dim: int, seed: str = "tsdt|jl") -> str:
    signs = sim.jl_sign_matrix(in_dim, out_dim, seed)
    inv = repr(1.0 / float(out_dim) ** 0.5)
    term = R("CAST(x AS DOUBLE)", 9)
    comps = ",\n       ".join(
        "{'k': %d, 'y': CAST(list_aggregate(list_transform(embedding, (x, j) -> "
        "CAST((%s) * ([%s][j]) AS DECIMAL(38,9))), 'sum') AS DOUBLE) * %s}"
        % (k, term, ", ".join(str(s) for s in signs[k]), inv)
        for k in range(out_dim)
    )
    return f"""
    SELECT vec_id, CAST(u.k AS INT) AS k, {R("u.y", 6)} AS y
    FROM (
      SELECT vec_id, unnest([
       {comps}
      ]) AS u
      FROM embeddings
    )
    """


@register("emb_jl_project", _jl_oracle_sql(64, 16))
def _q_jl_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson–Lindenstrauss ±1 projection 64→16 (`sim.jl_project`):
    the distance-preserving cheap dimensionality reduction before
    LSH/ANN on a 100 TB vector store. The md5-derived sign matrix is
    inlined as literals into BOTH plans; components accumulate
    9-dp-rounded terms in decimal (order-free exact sum), so every
    projected coordinate matches the oracle bit-for-bit. Pure
    scan-side fan-out, zero shuffle."""
    out = sim.jl_project(_table(spark, sf_dir, "embeddings"), in_dim=64, out_dim=16)
    return out.select("vec_id", F.col("k").cast("int").alias("k"), "y")


@register(
    "text_hashed_linear_score",
    f"""
    WITH w AS (
      SELECT doc_id,
             list_filter(string_split(trim(text), ' '), x -> length(x) > 0) AS ws
      FROM documents WHERE text IS NOT NULL
    ),
    s AS (
      SELECT doc_id, len(ws) AS n,
             list_aggregate(list_transform(ws, t ->
               CAST({R("(('0x' || substr(md5('tsdt|hls' || '|' || t), 1, 8))::BIGINT) / 4294967296.0 - 0.5", 6)} AS DECIMAL(20,6))
             ), 'sum') AS tot
      FROM w WHERE len(ws) > 0
    )
    SELECT doc_id, CAST(n AS INT) AS n_tokens,
           {R("CAST(tot AS DOUBLE) / n", 6)} AS logit
    FROM s
    """,
)
def _q_hashed_linear_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashed-feature linear scoring (`tx.hashed_linear_score`): the
    model-based quality-filter shape (fasttext/CCNet lineage) with
    md5-derived stand-in weights — mean hashed-token weight as a raw
    logit, exact decimal accumulation, zero shuffle. Swapping learned
    weights in changes a weight lookup, not the plan."""
    return tx.hashed_linear_score(_table(spark, sf_dir, "documents"))


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


def _pca_oracle_sql(rounds: int = 3, v0: str = "0.125") -> str:
    cov_expr = R(
        "(CAST(pr.sp AS DOUBLE) / CAST(pr.n AS DOUBLE)) - ((mi.sm / CAST(pr.n AS DOUBLE)) * (mj.sm / CAST(pr.n AS DOUBLE)))",
        6,
    )
    rounds_sql = ""
    prev = "v0"
    for r in range(1, rounds + 1):
        rounds_sql += f""",
    w{r} AS (
      SELECT f.i AS idx,
             CAST(sum(CAST({R("f.cov * v.val", 12)} AS DECIMAL(38,12))) AS DOUBLE) AS w
      FROM fm f JOIN {prev} v ON f.j = v.idx GROUP BY f.i
    ),
    n{r} AS (
      SELECT sqrt(CAST(sum(CAST({R("w * w", 12)} AS DECIMAL(38,12))) AS DOUBLE)) AS nm FROM w{r}
    ),
    v{r} AS (SELECT idx, {R("w / nm", 9)} AS val FROM w{r}, n{r})"""
        prev = f"v{r}"
    return f"""
    WITH t AS (
      SELECT vec_id,
             unnest(list_transform(embedding,
               (x, i) -> {{'i': i - 1, 'x': CAST(x AS DOUBLE)}})) AS u
      FROM embeddings
    ),
    e AS (SELECT vec_id, u.i AS i, u.x AS x FROM t),
    pr AS (
      SELECT a.i AS i, b.i AS j,
             sum(CAST({R("a.x * b.x", 9)} AS DECIMAL(38,9))) AS sp,
             count(*) AS n
      FROM e a JOIN e b ON a.vec_id = b.vec_id AND a.i <= b.i
      GROUP BY 1, 2
    ),
    m AS (
      SELECT i, CAST(sum(CAST({R("x", 9)} AS DECIMAL(38,9))) AS DOUBLE) AS sm
      FROM e GROUP BY i
    ),
    cv AS (
      SELECT pr.i AS i, pr.j AS j, {cov_expr} AS cov
      FROM pr JOIN m mi ON pr.i = mi.i JOIN m mj ON pr.j = mj.i
    ),
    fm AS (
      SELECT i, j, cov FROM cv
      UNION ALL
      SELECT j AS i, i AS j, cov FROM cv WHERE i <> j
    ),
    v0 AS (SELECT DISTINCT i AS idx, CAST({v0} AS DOUBLE) AS val FROM fm){rounds_sql}
    SELECT CAST(v.idx AS INT) AS i, v.val AS v, {R("n.nm", 6)} AS eigenvalue
    FROM v{rounds} v, n{rounds} n
    """


@register("emb_pca_power_iteration", _pca_oracle_sql(3))
def _q_pca_power_iteration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PCA leading axis end-to-end (`sim.power_iteration_top_eigen`):
    DISTRIBUTED covariance (the N-scale stage) + 3 decimal-exact power
    iterations on the bounded d² frame, eigenvalue = final iterate
    norm. The oracle unrolls the complete iteration (covariance →
    symmetric matrix → 3× multiply/normalize) and matches every
    component and the eigenvalue bit-for-bit."""
    return sim.power_iteration_top_eigen(_table(spark, sf_dir, "embeddings"), rounds=3)


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


# ---------------------------------------------------------------------------
# r6: SemDeDup — IVF-cell-blocked semantic dedup
# ---------------------------------------------------------------------------

_SEMDEDUP_TAU, _SEMDEDUP_K = 0.4, 16


def _semdedup_k(n: int) -> int:
    """N-adaptive cell count: k = max(16, ceil(sqrt(N))).

    Cells ∝ √N bounds BOTH the assignment work (N·k = N^1.5) and the
    expected within-cell pair volume (Σ|C|² ≈ N²/k = N^1.5) — the
    FAISS/SemDeDup sizing rule. A FIXED k makes pair volume quadratic
    (cell size ∝ N), measured 28.8× at 10× data in SCALING.md; the
    adaptive form is the scale path and is what this registry benches.
    """
    import math

    return max(16, int(math.ceil(math.sqrt(max(n, 1)))))


#: shared SemDeDup CTE chain (cells → assignment → norms → within-cell
#: pair dots); callers append their own decision CTEs on top of
#: ``pdots``/``norms``/``assigned``. Factored so the registered
#: survivor query and the τ-sensitivity sweep can never drift.
_SEMDEDUP_CTE_SQL = f"""ex AS ({_EX_SQL}),
    kk AS (
      SELECT greatest(16, CAST(ceil(sqrt(CAST(count(*) AS DOUBLE))) AS BIGINT)) AS k
      FROM embeddings
    ),
    ord AS (
      SELECT vec_id,
             row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR))) - 1 AS cid
      FROM embeddings
      QUALIFY cid <= (SELECT k FROM kk) - 1
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
    norms AS (
      SELECT vec_id, sqrt(CAST(sum(CAST({sql_rd("x * x", 9)} AS DECIMAL(38,9))) AS DOUBLE)) AS nrm
      FROM ex GROUP BY vec_id
    ),
    pdots AS (
      SELECT aa.vec_id AS id_a, bb.vec_id AS id_b,
             sum(CAST({sql_rd("ea.x * eb.x", 9)} AS DECIMAL(38,9))) AS dxy
      FROM assigned aa
      JOIN assigned bb ON aa.cid = bb.cid AND aa.vec_id < bb.vec_id
      JOIN ex ea ON ea.vec_id = aa.vec_id
      JOIN ex eb ON eb.vec_id = bb.vec_id AND eb.i = ea.i
      GROUP BY aa.vec_id, bb.vec_id
    )"""


@register(
    "dedup_semantic",
    f"""
    WITH {_SEMDEDUP_CTE_SQL},
    dropped AS (
      SELECT DISTINCT p.id_b AS vec_id
      FROM pdots p
      JOIN norms na ON na.vec_id = p.id_a
      JOIN norms nb ON nb.vec_id = p.id_b
      WHERE CAST(p.dxy AS DOUBLE) / (na.nrm * nb.nrm) >= {_SEMDEDUP_TAU}
    )
    SELECT a.vec_id, CAST(a.cid AS INT) AS centroid_id
    FROM assigned a
    WHERE a.vec_id NOT IN (SELECT vec_id FROM dropped)
    """,
)
def _q_dedup_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023) survivor set
    (`sim.semdedup_survivors`): coarse IVF cells as the blocking
    structure, exact decimal cosine >= tau within each cell, greedy
    min-id survivor per near-dup neighborhood. The embedding-space
    complement to `dedup_embedding_clusters` (LSH-blocked CC): the
    cell structure here is the SAME index `sim_ivf_*` search uses, so
    one clustering pays for dedup AND retrieval. The oracle replays
    the identical deterministic centroid pick (md5-order sample),
    decimal-exact assignment argmin, within-cell pair dots, and the
    NOT-IN drop rule.

    The cell count is N-ADAPTIVE (k = max(16, ceil(sqrt(N))), derived
    from a deterministic parquet-metadata count and replayed by the
    oracle's `kk` CTE) — the registered/benched form IS the scale
    path. r6's fixed k=16 form measured 28.8x at 10x data (quadratic
    pair volume); see `_semdedup_k` and SCALING.md §r7."""
    emb = _table(spark, sf_dir, "embeddings")
    k = _semdedup_k(emb.count())
    return sim.semdedup_survivors(
        emb, tau=_SEMDEDUP_TAU, n_centroids=k
    ).select("vec_id", F.col("centroid_id").cast("int").alias("centroid_id"))


_BM25_TERMS = ["spark", "window", "join"]
_BM25_K, _BM25_K1, _BM25_B = 15, 1.2, 0.75


@register(
    "text_bm25_topk",
    f"""
    WITH toks AS (
      SELECT doc_id, t.token
      FROM documents,
           LATERAL (SELECT unnest(string_split(trim(text), ' ')) AS token) t
      WHERE len(t.token) > 0
    ),
    dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
    stats AS (
      SELECT count(*) AS n_docs,
             CAST(sum(dl) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avgdl
      FROM dl
    ),
    tf AS (
      SELECT doc_id, token, count(*) AS tf
      FROM toks WHERE token IN ('spark', 'window', 'join')
      GROUP BY doc_id, token
    ),
    dfreq AS (SELECT token, count(*) AS doc_freq FROM tf GROUP BY token),
    scored AS (
      SELECT t.doc_id,
             CAST({sql_rd(
                 "((CAST(s.n_docs AS DOUBLE) - CAST(d.doc_freq AS DOUBLE) + 0.5)"
                 " / (CAST(d.doc_freq AS DOUBLE) + 0.5))"
                 " * (CAST(t.tf AS DOUBLE) * 2.2)"
                 " / (CAST(t.tf AS DOUBLE)"
                 "    + 1.2 * (0.25 + 0.75 * CAST(l.dl AS DOUBLE) / s.avgdl))",
                 9,
             )} AS DECIMAL(38,9)) AS s
      FROM tf t
      JOIN dfreq d ON d.token = t.token
      JOIN dl l ON l.doc_id = t.doc_id
      CROSS JOIN stats s
    )
    SELECT doc_id,
           count(*) AS n_terms_matched,
           {R("CAST(sum(s) AS DOUBLE)", 6)} AS score
    FROM scored GROUP BY doc_id
    ORDER BY score DESC, doc_id ASC
    LIMIT {_BM25_K}
    """,
)
def _q_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-k retrieval (`tx.bm25_topk`) for the query
    "spark window join": query-term filter ON the token scan, narrow
    (doc, term) tf/df shuffles, 1-row corpus-stats broadcast, un-logged
    idf (the repo's determinism-over-convention policy), decimal-summed
    per-term scores, TakeOrdered top-k. The lexical-retrieval primitive
    a RAG or eval-mining pipeline runs per query."""
    return tx.bm25_topk(
        _table(spark, sf_dir, "documents"),
        query_terms=_BM25_TERMS,
        k=_BM25_K, k1=_BM25_K1, b=_BM25_B,
    )


@register(
    "mix_epoch_upsample",
    """
    WITH c AS (
      SELECT coalesce(CAST(source AS VARCHAR), '<NULL>') AS g, count(*) AS c
      FROM documents GROUP BY 1
    ),
    m AS (SELECT max(c) AS cmax FROM c),
    e AS (
      SELECT g,
             least(4, CAST(ceil(sqrt(CAST(m.cmax AS DOUBLE) / CAST(c.c AS DOUBLE))) AS INT)) AS epochs
      FROM c, m
    )
    SELECT d.doc_id, d.source,
           CAST(unnest(generate_series(1, e.epochs)) AS INT) AS epoch
    FROM documents d
    JOIN e ON coalesce(CAST(d.source AS VARCHAR), '<NULL>') = e.g
    """,
)
def _q_epoch_upsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Epoch-based domain upsampling (`sp.epoch_upsample`): integer
    replication epochs_g = min(4, ceil(sqrt(c_max/c_g))) per source —
    the multi-epoch small-domain mixing of LLM data recipes, as an
    explode(sequence) on the scan (zero payload shuffle; the
    (group, epochs) table is a bounded broadcast). Complement of
    `mix_temperature_sample`: that down-samples dominant domains,
    this up-samples small ones, both under the alpha=0.5 law."""
    return sp.epoch_upsample(
        _table(spark, sf_dir, "documents"), max_epochs=4
    ).select("doc_id", "source", "epoch")


@register(
    "sessionize_events",
    f"""
    WITH e AS (
      SELECT user_id, event_id, ts, value, epoch_us(ts) AS us FROM events
    ),
    m AS (
      SELECT *,
             CASE WHEN lag(us) OVER w IS NULL
                       OR us - lag(us) OVER w > 1800000000
                  THEN 1 ELSE 0 END AS newf
      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    s AS (
      SELECT *,
             sum(newf) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS UNBOUNDED PRECEDING
             ) AS sess
      FROM m
    )
    SELECT user_id, CAST(sess AS BIGINT) AS session_idx,
           min(ts) AS session_start, max(ts) AS session_end,
           count(*) AS n_events,
           (max(us) - min(us)) / 1000000 AS duration_sec,
           CAST(sum(CAST({R("CAST(value AS DOUBLE)", 2)} AS DECIMAL(38,2))) AS DOUBLE) AS total_value
    FROM s GROUP BY user_id, sess
    """,
)
def _q_sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch gap-based sessionization (`ag.sessionize`, 30-min gap):
    the one-shuffle gaps-and-islands plan — lag window, boundary
    cumsum, and per-session aggregation all share the user-key
    Exchange. Integer-microsecond gap math, decimal-summed values.
    The batch twin of `stream_session_agg`."""
    out = ag.sessionize_user_events(_table(spark, sf_dir, "events"), gap_minutes=30)
    return out.select(
        "user_id",
        F.col("session_idx").cast("long").alias("session_idx"),
        "session_start", "session_end", "n_events", "duration_sec", "total_value",
    )


@register(
    "cube_revenue_by_flag_status",
    f"""
    SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
           coalesce(l_linestatus, 'ALL') AS linestatus,
           CAST(grouping(l_returnflag) * 2 + grouping(l_linestatus) AS BIGINT) AS gid,
           {_sql_dsum("l_extendedprice * (1 - l_discount)", 4)} AS revenue,
           count(*) AS n
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def _q_cube_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (returnflag, linestatus) with revenue + grouping id —
    completes the multi-level aggregation family (rollup, pivot, melt,
    grouping-set cube). Spark plans cube as ONE Expand + one
    aggregation (4 grouping sets, single scan, partial-agg friendly) —
    the same shape DuckDB executes, not N passes. `grouping_id()`
    disambiguates real NULL keys from subtotal rows; revenue is the
    order-independent decimal sum."""
    l = _table(spark, sf_dir, "lineitem")
    return (
        l.cube("l_returnflag", "l_linestatus")
        .agg(
            F.grouping_id().alias("gid"),
            _dsum(F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount")), 4).alias("revenue"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            F.coalesce(F.col("l_returnflag"), F.lit("ALL")).alias("returnflag"),
            F.coalesce(F.col("l_linestatus"), F.lit("ALL")).alias("linestatus"),
            F.col("gid").cast("long").alias("gid"),
            "revenue",
            "n",
        )
    )


@register(
    "text_quality_percentile_by_lang",
    f"""
    WITH feats AS (
      SELECT doc_id, lang,
             length(text) AS q_n_chars,
             CASE WHEN length(trim(text)) = 0 THEN 0
                  ELSE len(string_split(trim(text), ' ')) END AS q_n_tokens,
             ({" + ".join(f"(length(text) - length(replace(text, '{c}', '')))" for c in ".,;:!?")}) AS punct,
             ({" + ".join(f"(length(text) - length(replace(text, '{c}', '')))" for c in "0123456789")}) AS digits,
             ({_lang_score_sql("en")}) AS stop_hits
      FROM documents
    ),
    ratios AS (
      SELECT doc_id, lang,
             CAST(punct AS DOUBLE) / (CASE WHEN q_n_chars = 0 THEN 1 ELSE q_n_chars END) AS q_punct_ratio,
             CAST(digits AS DOUBLE) / (CASE WHEN q_n_chars = 0 THEN 1 ELSE q_n_chars END) AS q_digit_ratio,
             stop_hits / (CASE WHEN q_n_tokens = 0 THEN 1 ELSE q_n_tokens END) AS q_stopword_ratio,
             q_n_chars
      FROM feats
    ),
    q AS (
      SELECT doc_id, lang,
             {R('''(CASE WHEN q_n_chars >= 100 AND q_n_chars <= 20000 THEN 0.4 ELSE 0.0 END)
               + least(q_stopword_ratio * 2.0, 0.4)
               + (0.2 - least((q_punct_ratio + q_digit_ratio) * 1.0, 0.2))''', 6)} AS quality
      FROM ratios
    ),
    ranked AS (
      SELECT doc_id, lang, quality,
             {R("percent_rank() OVER (PARTITION BY lang ORDER BY quality ASC)", 9)} AS pct_rank
      FROM q
    )
    SELECT doc_id, lang, quality, pct_rank,
           CAST(least(9, CAST(floor(pct_rank * 10.0) AS INT)) AS BIGINT) AS decile
    FROM ranked
    """,
)
def _q_quality_percentile_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language quality normalization
    (`tx.quality_percentile_by_group`): percent_rank of the 6-dp
    quality score WITHIN each language + decile bucket — the
    "top X% per language" selection primitive. Rank keys on the
    ROUNDED score so ties are value-ties in every engine; ntile is
    deliberately avoided (it splits ties by arbitrary row order).
    One group-key shuffle; the docstring specs the two-pass histogram
    rank that replaces the per-language window at 100 TB."""
    return tx.quality_percentile_by_group(_table(spark, sf_dir, "documents"))


@register(
    "decontam_overlap_frac",
    f"""
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS w FROM documents
      WHERE source <> 'src0' AND text IS NOT NULL
    ),
    tg AS (
      SELECT doc_id, md5(g) AS gd FROM (
        SELECT doc_id, unnest(list_distinct(CASE WHEN len(w) - 3 >= 1
          THEN list_transform(generate_series(1, len(w) - 3),
                              i -> array_to_string(w[i:i+3], ' '))
          ELSE [array_to_string(w, ' ')] END)) AS g
        FROM t)
    ),
    tot AS (SELECT doc_id, count(*) AS n_grams FROM tg GROUP BY doc_id),
    h AS (
      SELECT DISTINCT md5(g) AS gd FROM (
        SELECT unnest(list_distinct(CASE WHEN len(w) - 3 >= 1
          THEN list_transform(generate_series(1, len(w) - 3),
                              i -> array_to_string(w[i:i+3], ' '))
          ELSE [array_to_string(w, ' ')] END)) AS g
        FROM (SELECT string_split(text, ' ') AS w FROM documents
              WHERE source = 'src0' AND text IS NOT NULL))
    ),
    hit AS (
      SELECT tg.doc_id, count(*) AS n_shared
      FROM tg JOIN h USING (gd) GROUP BY tg.doc_id
    )
    SELECT tot.doc_id, tot.n_grams,
           coalesce(hit.n_shared, 0) AS n_shared,
           {R("CAST(coalesce(hit.n_shared, 0) AS DOUBLE) / CAST(tot.n_grams AS DOUBLE)", 9)} AS contamination_frac
    FROM tot LEFT JOIN hit ON tot.doc_id = hit.doc_id
    """,
)
def _q_decontam_overlap_frac(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graded contamination scoring (`dd.contamination_fraction`): for
    every train doc (source != src0), the FRACTION of its distinct
    word 4-grams found anywhere in the held-out set (source == src0) —
    the tunable complement of the hard-threshold
    `dedup_decontaminate_vs_heldout` flag. Digest-only joins, total
    output (zero-hit docs score 0.0)."""
    docs = _table(spark, sf_dir, "documents")
    return dd.contamination_fraction(
        docs.filter(F.col("source") != "src0"),
        docs.filter(F.col("source") == "src0"),
        n=4,
    )


@register(
    "text_ngram_topk_global",
    """
    WITH w AS (
      SELECT string_split(trim(text), ' ') AS w FROM documents
      WHERE text IS NOT NULL
    ),
    g AS (
      SELECT array_to_string(w[i.i:i.i+1], ' ') AS gram
      FROM w, LATERAL (SELECT unnest(generate_series(1, len(w) - 1)) AS i) i
      WHERE len(w) >= 2
    )
    SELECT gram, count(*) AS occurrences
    FROM g WHERE len(gram) > 0
    GROUP BY gram
    ORDER BY occurrences DESC, gram ASC
    LIMIT 25
    """,
)
def _q_ngram_topk_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-25 bigrams by occurrence (`tx.ngram_topk_global`):
    corpus-statistics boilerplate/stop-phrase discovery. Grams build
    scan-side from shifted array views (no per-position lambda); the
    shuffle carries (gram, partial count) — bounded by vocabulary; the
    top-k is a TakeOrdered with a gram-text tie-break."""
    return tx.ngram_topk_global(_table(spark, sf_dir, "documents"), n=2, k=25)


from time_series_data_trimmer_spark.operators import sketches as sk  # noqa: E402

_KMV_TOKENS_TABLE = """(
      SELECT d.source AS source, t.token AS token
      FROM documents d,
           LATERAL (SELECT unnest(string_split(trim(d.text), ' ')) AS token) t
      WHERE d.text IS NOT NULL AND len(t.token) > 0
    ) toks"""


@register(
    "sketch_kmv_incremental_merge",
    sk.sql_kmv_distinct(_KMV_TOKENS_TABLE, "source", "token", k=64),
)
def _q_kmv_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The register MERGE lifecycle through the correctness gate (it
    was pytest-only until r7): history (doc_id % 5 < 4) and today's
    batch (doc_id % 5 == 4) are sketched INDEPENDENTLY, their register
    sets merged (`sk.kmv_merge`), and the estimate must equal the
    one-shot sketch of the whole corpus — which is exactly what the
    oracle computes (the same SQL as `sketch_kmv_distinct_tokens`).
    This is the daily-batch path at 100 TB: yesterday's registers are
    ≤ k longs per group on disk; today's scan never revisits history.
    """
    docs = _table(spark, sf_dir, "documents")

    def toks(part):
        return (
            part.filter(F.col("text").isNotNull())
            .select(
                "source",
                F.explode(F.split(F.trim(F.col("text")), " ")).alias("token"),
            )
            .filter(F.length("token") > 0)
        )

    hist = sk.kmv_registers(toks(docs.filter(F.col("doc_id") % 5 < 4)), "source", "token", k=64)
    batch = sk.kmv_registers(toks(docs.filter(F.col("doc_id") % 5 == 4)), "source", "token", k=64)
    merged = sk.kmv_merge(hist, batch, k=64)
    est = sk.kmv_estimate(merged, k=64, group_col="source")
    exact = (
        toks(docs).select("source", "token").distinct()
        .groupBy("source").agg(F.count(F.lit(1)).alias("exact_distinct"))
    )
    return est.join(exact.hint("shuffle_hash"), "source").select(
        "source", "n_kept", "est_distinct", "exact_distinct"
    )


@register(
    "sketch_kmv_distinct_tokens",
    sk.sql_kmv_distinct(_KMV_TOKENS_TABLE, "source", "token", k=64),
)
def _q_kmv_distinct_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source vocabulary size via the KMV (bottom-k) distinct
    sketch (`sk.kmv_distinct`, k=64), exact count alongside for audit.
    Unlike approx_count_distinct's engine-private HLL registers, every
    KMV register is the portable md5 hash, so the sketch (and its
    merge) is bit-identical across engines — shuffles <= k longs per
    group instead of every distinct token."""
    docs = _table(spark, sf_dir, "documents")
    toks = (
        docs.filter(F.col("text").isNotNull())
        .select(
            "source",
            F.explode(F.split(F.trim(F.col("text")), " ")).alias("token"),
        )
        .filter(F.length("token") > 0)
    )
    return sk.kmv_distinct(toks, "source", "token", k=64)


_CM_D, _CM_W, _CM_SEED = 4, 256, "tsdt|cm"
_CM_ITEMS = ["spark", "window", "join", "data", "the", "zzz-missing"]


def _cm_coord_sql() -> str:
    """The estimate-side (item, r, c) coordinate VALUES literal —
    computed once with the same md5 arithmetic `sk.cm_estimate` uses."""
    import hashlib

    vals = []
    for it in _CM_ITEMS:
        for r in range(_CM_D):
            c = int(hashlib.md5(f"{_CM_SEED}|{r}|{it}".encode()).hexdigest()[:8], 16) % _CM_W
            vals.append(f"('{it}', {r}, {c})")
    return ", ".join(vals)


_CM_CELL_UNION = "\n      UNION ALL ".join(
    f"SELECT source, {r} AS r, "
    f"{sp.sql_hash_u32('token', f'{_CM_SEED}|{r}')} % {_CM_W} AS c FROM toks"
    for r in range(_CM_D)
)


@register(
    "sketch_cm_token_freq_by_source",
    f"""
    WITH toks AS (
      SELECT d.source AS source, t.token AS token
      FROM documents d,
           LATERAL (SELECT unnest(string_split(trim(d.text), ' ')) AS token) t
      WHERE d.text IS NOT NULL AND len(t.token) > 0
    ),
    cells AS (
      SELECT source AS g, r, c, count(*) AS cnt
      FROM ({_CM_CELL_UNION})
      GROUP BY source, r, c
    ),
    coords AS (SELECT * FROM (VALUES {_cm_coord_sql()}) t(item, r, c)),
    est AS (
      SELECT g, item,
             CASE WHEN count(*) >= {_CM_D} THEN min(cnt) ELSE 0 END AS est_count
      FROM cells JOIN coords USING (r, c)
      GROUP BY g, item
    ),
    exact AS (
      SELECT source AS g, token AS item, count(*) AS exact_count
      FROM toks WHERE token IN ({", ".join(f"'{it}'" for it in _CM_ITEMS)})
      GROUP BY source, token
    )
    SELECT e.g AS source, e.item AS token,
           CAST(e.est_count AS BIGINT) AS est_count,
           CAST(coalesce(x.exact_count, 0) AS BIGINT) AS exact_count,
           CAST(e.est_count - coalesce(x.exact_count, 0) AS BIGINT) AS overest
    FROM est e LEFT JOIN exact x ON e.g = x.g AND e.item = x.item
    """,
)
def _q_cm_token_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source token-frequency estimates from the mergeable
    Count-Min sketch (`sk.cm_registers` / `_estimate`, d=4, w=256),
    exact counts alongside for audit plus the signed overestimate
    (CM never underestimates — ``overest >= 0`` always, asserted in
    tests/test_sketches_quantile.py and visible in the output).

    Completes the portable sketch family: KMV (distinct), bottom-k
    (quantiles), Count-Min (frequencies). At 100 TB the registers are
    ≤ d·w longs per source — the per-(source, token) exact count
    table they replace IS the vocabulary shuffle. Counters are sums,
    so the state is independent of partition order and merge is
    elementwise addition (merge == one-shot for ANY row split, unlike
    the bottom-k sketches' disjoint-population requirement)."""
    docs = _table(spark, sf_dir, "documents")
    toks = (
        docs.filter(F.col("text").isNotNull())
        .select(
            "source",
            F.explode(F.split(F.trim(F.col("text")), " ")).alias("token"),
        )
        .filter(F.length("token") > 0)
    )
    regs = sk.cm_registers(toks, "source", "token", d=_CM_D, w=_CM_W, seed=_CM_SEED)
    est = sk.cm_estimate(
        regs, _CM_ITEMS, d=_CM_D, w=_CM_W, seed=_CM_SEED,
        group_col="source", item_col="token",
    )
    exact = (
        toks.filter(F.col("token").isin(_CM_ITEMS))
        .groupBy("source", "token")
        .agg(F.count(F.lit(1)).alias("__exact"))
    )
    return (
        est.join(exact.hint("shuffle_hash"), ["source", "token"], "left")
        .select(
            "source", "token", "est_count",
            F.coalesce(F.col("__exact"), F.lit(0)).cast("long").alias("exact_count"),
            (F.col("est_count") - F.coalesce(F.col("__exact"), F.lit(0)))
            .cast("long")
            .alias("overest"),
        )
    )


@register(
    "text_heavy_hitters_by_source",
    """
    WITH toks AS (
      SELECT d.source AS source, t.token AS token
      FROM documents d,
           LATERAL (SELECT unnest(string_split(trim(d.text), ' ')) AS token) t
      WHERE d.text IS NOT NULL AND len(t.token) > 0
    )
    SELECT source, token, count(*) AS exact_count
    FROM toks GROUP BY source, token HAVING count(*) >= 50
    """,
)
def _q_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source heavy-hitter tokens (count ≥ 50) via the Count-Min
    prefilter (`sk.cm_heavy_hitters`): registers built once
    ((g,r,c) shuffle bounded at d·w per source), broadcast back as d
    map-side counter lookups, `least(counters) >= T` gating
    occurrences scan-side — CM never underestimates, so no heavy item
    can be pruned — and only the surviving heavy tail enters the
    exact (source, token) count. The oracle is the NAIVE full-shuffle
    GROUP BY/HAVING: matching it exactly IS the operator's claim
    (provably exact result, candidate-bounded shuffle)."""
    docs = _table(spark, sf_dir, "documents")
    toks = (
        docs.filter(F.col("text").isNotNull())
        .select(
            "source",
            F.explode(F.split(F.trim(F.col("text")), " ")).alias("token"),
        )
        .filter(F.length("token") > 0)
    )
    return sk.cm_heavy_hitters(
        toks, "source", "token", min_count=50, d=_CM_D, w=_CM_W, seed=_CM_SEED
    )


_PROF_SEED = "tsdt|prof"


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


_QSK_K, _QSK_QS, _QSK_SEED = 32, [0.25, 0.5, 0.9, 0.99], "tsdt|qsk"
_QSK_U = sp.sql_hash_u32("event_id", _QSK_SEED)


@register(
    "sketch_quantile_value_by_user",
    f"""
    WITH ev AS (
      SELECT user_id, event_id, value FROM events WHERE value IS NOT NULL
    ),
    h AS (
      SELECT user_id AS g, {_QSK_U} AS u, CAST(value AS DOUBLE) AS v FROM ev
    ),
    regs AS (
      SELECT g, u, v FROM h
      QUALIFY row_number() OVER (PARTITION BY g ORDER BY u ASC, v ASC) <= {_QSK_K}
    ),
    ranked AS (
      SELECT g, v,
             row_number() OVER (PARTITION BY g ORDER BY v ASC, u ASC) AS vr,
             count(*) OVER (PARTITION BY g) AS n_kept
      FROM regs
    ),
    qs AS (
      SELECT unnest([{", ".join(f"CAST({q} AS DOUBLE)" for q in _QSK_QS)}]) AS q
    ),
    est AS (
      SELECT g, q, n_kept, v AS q_est
      FROM ranked CROSS JOIN qs
      WHERE vr = greatest(1, CAST(ceil(q * CAST(n_kept AS DOUBLE)) AS BIGINT))
    ),
    frank AS (
      SELECT g, v,
             row_number() OVER (PARTITION BY g ORDER BY v ASC, u ASC) AS vr,
             count(*) OVER (PARTITION BY g) AS n
      FROM h
    ),
    exact AS (
      SELECT g, q, v AS q_exact
      FROM frank CROSS JOIN qs
      WHERE vr = greatest(1, CAST(ceil(q * CAST(n AS DOUBLE)) AS BIGINT))
    )
    SELECT e.g AS user_id, e.q, e.n_kept, e.q_est, x.q_exact,
           {sql_rd("abs(e.q_est - x.q_exact)", 6)} AS abs_err
    FROM est e JOIN exact x ON e.g = x.g AND e.q = x.q
    """,
)
def _q_sketch_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-trial quantile estimates from the mergeable bottom-k-by-md5
    quantile sketch (`sk.quantile_sketch_registers` / `_estimate`,
    k=32), exact nearest-rank quantiles alongside for audit.

    This is the 100 TB answer to the exact windowed percentiles that
    `ts_gap_report` / `ts_mad_outliers` / `histogram_equidepth_value`
    (and the reference's median sample-rate inference,
    data_model.py:116-126) rely on: fine per-trial, impossible
    corpus-wide. The sketch shuffles ≤ k (hash, value) registers per
    group, merges across corpus snapshots without rescanning
    (merge == one-shot proven register-for-register in
    tests/test_sketches_quantile.py), and every register and estimate
    is the portable md5 coin — bit-identical in Spark, DuckDB, Python.
    The oracle replays registers, ranks, and both estimators exactly.
    """
    ev = _events(spark, sf_dir).filter(F.col("value").isNotNull())
    regs = sk.quantile_sketch_registers(
        ev, "user_id", "value", "event_id", k=_QSK_K, seed=_QSK_SEED
    )
    est = sk.quantile_sketch_estimate(regs, _QSK_QS, group_col="g")
    # exact audit branch: same rank rule over the FULL per-trial data
    hashed = ev.select(
        F.col("user_id").alias("g"),
        sp.hash_u32(F.col("event_id"), _QSK_SEED).alias("u"),
        F.col("value").cast("double").alias("v"),
    )
    w_rank = Window.partitionBy("g").orderBy(F.col("v").asc(), F.col("u").asc())
    wp = Window.partitionBy("g")
    frank = hashed.select(
        "g", "v",
        F.row_number().over(w_rank).alias("__vr"),
        F.count(F.lit(1)).over(wp).alias("__n"),
    )
    q = F.explode(F.array(*[F.lit(float(x)) for x in _QSK_QS])).alias("q")
    tgt = F.greatest(
        F.lit(1).cast("long"), F.ceil(F.col("q") * F.col("__n").cast("double"))
    )
    exact = (
        frank.select("g", "v", "__vr", "__n", q)
        .filter(F.col("__vr") == tgt)
        .select("g", "q", F.col("v").alias("q_exact"))
    )
    return (
        est.join(exact.hint("shuffle_hash"), ["g", "q"])
        .select(
            F.col("g").alias("user_id"), "q", "n_kept", "q_est", "q_exact",
            rd(F.abs(F.col("q_est") - F.col("q_exact")), 6).alias("abs_err"),
        )
    )


@register(
    "a1_sample_rate_sketch",
    f"""
    WITH e AS (
      SELECT user_id, event_id, epoch_us(ts) AS t_us FROM events
    ),
    d AS (
      SELECT user_id, event_id,
             t_us - lag(t_us) OVER (PARTITION BY user_id ORDER BY t_us, event_id) AS dt
      FROM e
    ),
    pos AS (SELECT user_id, event_id, CAST(dt AS DOUBLE) AS dt FROM d WHERE dt > 0),
    h AS (
      SELECT user_id AS g, {sp.sql_hash_u32("event_id", _QSK_SEED)} AS u, dt AS v
      FROM pos
    ),
    regs AS (
      SELECT g, u, v FROM h
      QUALIFY row_number() OVER (PARTITION BY g ORDER BY u ASC, v ASC) <= 32
    ),
    ranked AS (
      SELECT g, v,
             row_number() OVER (PARTITION BY g ORDER BY v ASC, u ASC) AS vr,
             count(*) OVER (PARTITION BY g) AS n_kept
      FROM regs
    ),
    est AS (
      SELECT g, n_kept, v AS dt_med_est
      FROM ranked
      WHERE vr = greatest(1, CAST(ceil(0.5 * CAST(n_kept AS DOUBLE)) AS BIGINT))
    ),
    exact AS (SELECT user_id AS g, median(dt) AS dt_med FROM pos GROUP BY user_id)
    SELECT e.g AS user_id, e.n_kept,
           {sql_rd("1000000.0 / e.dt_med_est", 2)} AS rate_sketch,
           {sql_rd("1000000.0 / x.dt_med", 2)} AS rate_exact,
           {sql_rd("abs(e.dt_med_est - x.dt_med) / x.dt_med", 6)} AS dt_rel_err
    FROM est e JOIN exact x ON e.g = x.g
    """,
)
def _q_a1_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's sample-rate inference (A1, data_model.py:116-126
    — the VERDICT r6 anchor for "the operation that stops scaling
    first") re-based on the mergeable quantile sketch: per-trial
    median inter-sample gap from ≤ k bottom-k registers instead of an
    exact full-sort percentile, exact rate alongside for audit. At
    100 TB the registers come from per-day sketch merges, never a
    corpus rescan; at test scale the relative error column shows what
    k=32 buys. Same one-Exchange register chain as
    `sketch_quantile_value_by_user`."""
    ev = _table(spark, sf_dir, "events")
    us = event_micros(ev)
    w = Window.partitionBy("user_id").orderBy(F.col("t_us").asc(), F.col("event_id").asc())
    d = ev.select("user_id", "event_id", us.alias("t_us")).withColumn(
        "dt", F.col("t_us") - F.lag("t_us").over(w)
    )
    pos = d.filter(F.col("dt") > 0).select(
        "user_id", "event_id", F.col("dt").cast("double").alias("dt")
    )
    regs = sk.quantile_sketch_registers(
        pos, "user_id", "dt", "event_id", k=_QSK_K, seed=_QSK_SEED
    )
    est = sk.quantile_sketch_estimate(regs, [0.5], group_col="g").select(
        "g", "n_kept", F.col("q_est").alias("dt_med_est")
    )
    exact = pos.groupBy(F.col("user_id").alias("g")).agg(
        F.median("dt").alias("dt_med")
    )
    out = est.join(exact.hint("shuffle_hash"), "g")
    return out.select(
        F.col("g").alias("user_id"),
        "n_kept",
        rd(F.lit(1_000_000.0) / F.col("dt_med_est"), 2).alias("rate_sketch"),
        rd(F.lit(1_000_000.0) / F.col("dt_med"), 2).alias("rate_exact"),
        rd(F.abs(F.col("dt_med_est") - F.col("dt_med")) / F.col("dt_med"), 6).alias(
            "dt_rel_err"
        ),
    )


@register(
    "cohort_retention",
    """
    WITH uw AS (
      SELECT DISTINCT user_id AS u,
             CAST(floor(epoch_us(ts) / 604800000000) AS BIGINT) AS w
      FROM events
    ),
    f AS (SELECT u, min(w) AS cw FROM uw GROUP BY u),
    sizes AS (SELECT cw, count(*) AS cohort_size FROM f GROUP BY cw),
    cells AS (
      SELECT f.cw, uw.w, count(*) AS n_active
      FROM uw JOIN f USING (u) GROUP BY f.cw, uw.w
    )
    SELECT cells.cw AS cohort_week,
           cells.w - cells.cw AS week_offset,
           n_active, cohort_size,
           CAST(n_active AS DOUBLE) / CAST(cohort_size AS DOUBLE) AS retained_frac
    FROM cells JOIN sizes ON cells.cw = sizes.cw
    """,
)
def _q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort-retention triangle (`ag.cohort_retention`): users
    bucketed by first-seen epoch-week; per (cohort, offset) the active
    count and retained fraction. Integer epoch-week math, narrow
    distinct (user, week) pairs, bounded cohort-size broadcast."""
    return ag.cohort_retention(_table(spark, sf_dir, "events"))


from time_series_data_trimmer_spark.operators import intervals as iv  # noqa: E402


@register(
    "overlap_join_user_sessions",
    """
    WITH e AS (
      SELECT user_id, event_id, ts, epoch_us(ts) AS us FROM events
    ),
    m AS (
      SELECT *,
             CASE WHEN lag(us) OVER w IS NULL
                       OR us - lag(us) OVER w > 1800000000
                  THEN 1 ELSE 0 END AS newf
      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    s AS (
      SELECT *,
             sum(newf) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS UNBOUNDED PRECEDING
             ) AS sess
      FROM m
    ),
    sess AS (
      SELECT user_id, sess, min(us) AS start_us, max(us) AS end_us
      FROM s GROUP BY user_id, sess
    ),
    p AS (
      SELECT a.user_id AS ua, b.user_id AS ub,
             least(a.end_us, b.end_us) - greatest(a.start_us, b.start_us) AS ov
      FROM sess a JOIN sess b
        ON a.start_us <= b.end_us AND b.start_us <= a.end_us
       AND a.user_id < b.user_id
    )
    SELECT ua AS user_a, ub AS user_b,
           count(*) AS n_overlapping_sessions,
           CAST(sum(ov) AS BIGINT) AS total_overlap_us
    FROM p GROUP BY ua, ub
    """,
)
def _q_overlap_join_user_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-user session concurrency matrix via the bucket-blocked
    interval-overlap join (`iv.overlap_join`): sessionize each user's
    events (30-min gap), then find every overlapping session pair
    between DIFFERENT users and aggregate per user pair. The naive
    form of this join is a BroadcastNestedLoopJoin (no equi-key);
    the operator's bucket explode turns it into ONE shuffle-hash
    equi-join with an exact-predicate filter — the production
    range-join shape. Output is bounded by |user pairs| at any scale.
    The oracle runs the naive quadratic join (DuckDB plans it as an
    IEJoin) — same pairs, proving the bucket blocking lossless.

    r7: the bucket is DERIVED (`iv.auto_bucket_us` = guarded median
    interval length): candidate volume 3.77M vs 13.05M with the fixed
    1-hour bucket at sf0.1 (3.5× fewer; 0.38B vs 1.31B at 10×) —
    results bucket-invariant, pytest-pinned (SCALING.md §r7)."""
    sess = ag.sessionize_user_events(_table(spark, sf_dir, "events"), gap_minutes=30)
    ivl = sess.select(
        "user_id",
        "session_idx",
        F.unix_micros(F.col("session_start").cast("timestamp")).alias("start_us"),
        F.unix_micros(F.col("session_end").cast("timestamp")).alias("end_us"),
    )
    pairs = iv.overlap_join(ivl, ivl, bucket_us="auto").filter(
        F.col("user_id_a") < F.col("user_id_b")
    )
    return pairs.groupBy(
        F.col("user_id_a").alias("user_a"), F.col("user_id_b").alias("user_b")
    ).agg(
        F.count(F.lit(1)).alias("n_overlapping_sessions"),
        F.sum("overlap_us").alias("total_overlap_us"),
    )


_TOPIC_K = 8  # IVF cells == topic clusters


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


from time_series_data_trimmer_spark.operators import graph as gr  # noqa: E402


_PR_BASE, _PR_D = 0.15000000000000002, 0.85


@register(
    "graph_pagerank_user_concurrency",
    f"""
    WITH e AS (
      SELECT user_id, event_id, ts, epoch_us(ts) AS us FROM events
    ),
    m AS (
      SELECT *,
             CASE WHEN lag(us) OVER w IS NULL
                       OR us - lag(us) OVER w > 1800000000
                  THEN 1 ELSE 0 END AS newf
      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    s AS (
      SELECT *,
             sum(newf) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS UNBOUNDED PRECEDING
             ) AS sess
      FROM m
    ),
    sess AS (
      SELECT user_id, sess, min(us) AS start_us, max(us) AS end_us
      FROM s GROUP BY user_id, sess
    ),
    p AS (
      SELECT a.user_id AS ua, b.user_id AS ub, count(*) AS w
      FROM sess a JOIN sess b
        ON a.start_us <= b.end_us AND b.start_us <= a.end_us
       AND a.user_id < b.user_id
      GROUP BY a.user_id, b.user_id
    ),
    edges AS (
      SELECT ua AS src, ub AS dst, CAST(w AS DOUBLE) AS w FROM p
      UNION ALL
      SELECT ub AS src, ua AS dst, CAST(w AS DOUBLE) AS w FROM p
    ),
    deg AS (SELECT src, sum(w) AS wdeg FROM edges GROUP BY src),
    nodes AS (SELECT src FROM deg),
    scalar AS (SELECT CAST(count(*) AS DOUBLE) AS __n FROM nodes),
    r0 AS (
      SELECT src, 1.0 / sc.__n AS rank FROM nodes CROSS JOIN scalar sc
    ),
    c1 AS (
      SELECT e.dst AS src,
             CAST(sum(CAST({R("r.rank * e.w / d.wdeg", 9)} AS DECIMAL(38,9))) AS DOUBLE) AS s
      FROM edges e
      JOIN r0 r ON r.src = e.src
      JOIN deg d ON d.src = e.src
      GROUP BY e.dst
    ),
    r1 AS (
      SELECT n.src,
             {R(f"((0.15000000000000002) / sc.__n) + 0.85 * coalesce(c.s, 0.0)", 9)} AS rank
      FROM nodes n
      LEFT JOIN c1 c ON c.src = n.src
      CROSS JOIN scalar sc
    ),
    c2 AS (
      SELECT e.dst AS src,
             CAST(sum(CAST({R("r.rank * e.w / d.wdeg", 9)} AS DECIMAL(38,9))) AS DOUBLE) AS s
      FROM edges e
      JOIN r1 r ON r.src = e.src
      JOIN deg d ON d.src = e.src
      GROUP BY e.dst
    ),
    r2 AS (
      SELECT n.src,
             {R(f"((0.15000000000000002) / sc.__n) + 0.85 * coalesce(c.s, 0.0)", 9)} AS rank
      FROM nodes n
      LEFT JOIN c2 c ON c.src = n.src
      CROSS JOIN scalar sc
    ),
    c3 AS (
      SELECT e.dst AS src,
             CAST(sum(CAST({R("r.rank * e.w / d.wdeg", 9)} AS DECIMAL(38,9))) AS DOUBLE) AS s
      FROM edges e
      JOIN r2 r ON r.src = e.src
      JOIN deg d ON d.src = e.src
      GROUP BY e.dst
    ),
    r3 AS (
      SELECT n.src,
             {R(f"((0.15000000000000002) / sc.__n) + 0.85 * coalesce(c.s, 0.0)", 9)} AS rank
      FROM nodes n
      LEFT JOIN c3 c ON c.src = n.src
      CROSS JOIN scalar sc
    )
    SELECT src AS node, rank AS pagerank FROM r3
    """,
)
def _q_pagerank_user_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted PageRank (`gr.pagerank`, d=0.85, 3 decimal-exact
    iterations) over the cross-user session-CONCURRENCY graph: edges =
    the `overlap_join_user_sessions` matrix symmetrized, weight = the
    overlapping-session count. The centrality complement of
    `dedup_clusters`'s connected components — who sits at the center
    of the co-activity graph. Each iteration is two shuffle-hash
    vertex-keyed joins + one map-side-combined sum; the recurrence is
    unrolled bit-for-bit in the oracle (same discipline as
    `emb_pca_power_iteration`)."""
    sessd = ag.sessionize_user_events(_table(spark, sf_dir, "events"), gap_minutes=30)
    ivl = sessd.select(
        "user_id",
        "session_idx",
        F.unix_micros(F.col("session_start").cast("timestamp")).alias("start_us"),
        F.unix_micros(F.col("session_end").cast("timestamp")).alias("end_us"),
    )
    # default (1h) bucket, not "auto": the edge build happens once and
    # the iterations dominate, so the auto pass's extra sessionize job
    # costs more than the candidate reduction saves (measured ±1 s
    # both scales, SCALING.md §r7); the first-overlap-bucket guard
    # applies either way
    prs = iv.overlap_join(ivl, ivl).filter(F.col("user_id_a") < F.col("user_id_b"))
    mat = prs.groupBy(
        F.col("user_id_a").alias("ua"), F.col("user_id_b").alias("ub")
    ).agg(F.count(F.lit(1)).alias("w"))
    edges = mat.select(
        F.col("ua").alias("src"), F.col("ub").alias("dst"), F.col("w").alias("weight")
    ).unionByName(
        mat.select(
            F.col("ub").alias("src"), F.col("ua").alias("dst"), F.col("w").alias("weight")
        )
    )
    return gr.pagerank(edges, damping=_PR_D, iterations=3).select(
        F.col("node"), F.col("pagerank")
    )


_DSIR_B = 4096
_DSIR_H = sp.sql_hash_u32("gram", "tsdt|dsir")


@register(
    "mix_dsir_importance",
    f"""
    WITH wt AS (
      SELECT string_split(trim(text), ' ') AS w FROM documents
      WHERE source = 'src0' AND text IS NOT NULL
    ),
    tg AS (
      SELECT ({_DSIR_H}) % {_DSIR_B} AS b FROM (
        SELECT array_to_string(w[i.i:i.i+1], ' ') AS gram
        FROM wt, LATERAL (SELECT unnest(generate_series(1, len(w) - 1)) AS i) i
        WHERE len(w) >= 2)
    ),
    wr AS (
      SELECT doc_id, string_split(trim(text), ' ') AS w FROM documents
      WHERE source <> 'src0' AND text IS NOT NULL
    ),
    rg AS (
      SELECT doc_id, ({_DSIR_H}) % {_DSIR_B} AS b FROM (
        SELECT doc_id, array_to_string(w[i.i:i.i+1], ' ') AS gram
        FROM wr, LATERAL (SELECT unnest(generate_series(1, len(w) - 1)) AS i) i
        WHERE len(w) >= 2)
    ),
    ct AS (SELECT b, count(*) AS ct FROM tg GROUP BY b),
    cr AS (SELECT b, count(*) AS cr FROM rg GROUP BY b),
    tt AS (SELECT CAST(sum(ct) AS DOUBLE) AS t FROM ct),
    rt AS (SELECT CAST(sum(cr) AS DOUBLE) AS r FROM cr),
    ratios AS (
      SELECT coalesce(ct.b, cr.b) AS b,
             {R(f"((CAST(coalesce(ct.ct, 0) AS DOUBLE) + 1.0) / (tt.t + {float(_DSIR_B)}))"
                f" / ((CAST(coalesce(cr.cr, 0) AS DOUBLE) + 1.0) / (rt.r + {float(_DSIR_B)}))", 9)} AS ratio
      FROM ct FULL OUTER JOIN cr ON ct.b = cr.b CROSS JOIN tt CROSS JOIN rt
    )
    SELECT rg.doc_id, count(*) AS n_grams,
           {R("CAST(sum(CAST(ratio AS DECIMAL(38,9))) AS DOUBLE) / CAST(count(*) AS DOUBLE)", 9)} AS importance
    FROM rg JOIN ratios ON ratios.b = rg.b
    GROUP BY rg.doc_id
    """,
)
def _q_dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style hashed-bigram importance scoring
    (`sp.dsir_importance`, Xie et al. 2023): raw docs (source != src0)
    scored by the decimal-mean of per-bucket probability ratios vs the
    target slice (source == src0) — the in-domain data-selection
    signal. Ratio-MEAN variant (the paper's log-product is not
    bit-reproducible; same determinism policy as the un-logged idf).
    Grams collapse to hash%4096 ints on the scan; both count tables
    and their totals fold into one <= 4096-row broadcast ratio table;
    the only wide exchange is the per-doc decimal mean."""
    docs = _table(spark, sf_dir, "documents")
    return sp.dsir_importance(
        docs.filter(F.col("source") != "src0"),
        docs.filter(F.col("source") == "src0"),
        n_buckets=_DSIR_B,
    )


@register(
    "autocorr_peak_lag_by_user",
    f"""
    WITH e AS (SELECT user_id, event_id, ts, value, epoch_us(ts) AS us FROM events),
    base AS (
      SELECT user_id, CAST(value AS DOUBLE) AS __v,
             CAST(sum(CAST({R("CAST(value AS DOUBLE)", 6)} AS DECIMAL(38,6)))
                    OVER (PARTITION BY user_id) AS DOUBLE)
               / CAST(count(*) OVER (PARTITION BY user_id) AS DOUBLE) AS __m,
             lead(CAST(value AS DOUBLE), 1) OVER w AS __v1,
             lead(CAST(value AS DOUBLE), 2) OVER w AS __v2,
             lead(CAST(value AS DOUBLE), 3) OVER w AS __v3,
             lead(CAST(value AS DOUBLE), 4) OVER w AS __v4,
             lead(CAST(value AS DOUBLE), 5) OVER w AS __v5,
             lead(CAST(value AS DOUBLE), 6) OVER w AS __v6,
             lead(CAST(value AS DOUBLE), 7) OVER w AS __v7,
             lead(CAST(value AS DOUBLE), 8) OVER w AS __v8,
             lead(CAST(value AS DOUBLE), 9) OVER w AS __v9,
             lead(CAST(value AS DOUBLE), 10) OVER w AS __v10
      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
    ),
    lags AS (
      SELECT user_id, 1 AS lag,
             CAST(sum(CAST({R(f"(__v - __m) * (__v1 - __m)", 6)} AS DECIMAL(38,6))) AS DOUBLE) AS score
         FROM base WHERE __v1 IS NOT NULL GROUP BY user_id UNION ALL SELECT user_id, 2 AS lag,
             CAST(sum(CAST({R(f"(__v - __m) * (__v2 - __m)", 6)} AS DECIMAL(38,6))) AS DOUBLE) AS score
         FROM base WHERE __v2 IS NOT NULL GROUP BY user_id UNION ALL SELECT user_id, 3 AS lag,
             CAST(sum(CAST({R(f"(__v - __m) * (__v3 - __m)", 6)} AS DECIMAL(38,6))) AS DOUBLE) AS score
         FROM base WHERE __v3 IS NOT NULL GROUP BY user_id UNION ALL SELECT user_id, 4 AS lag,
             CAST(sum(CAST({R(f"(__v - __m) * (__v4 - __m)", 6)} AS DECIMAL(38,6))) AS DOUBLE) AS score
         FROM base WHERE __v4 IS NOT NULL GROUP BY user_id UNION ALL SELECT user_id, 5 AS lag,
             CAST(sum(CAST({R(f"(__v - __m) * (__v5 - __m)", 6)} AS DECIMAL(38,6))) AS DOUBLE) AS score
         FROM base WHERE __v5 IS NOT NULL GROUP BY user_id UNION ALL SELECT user_id, 6 AS lag,
             CAST(sum(CAST({R(f"(__v - __m) * (__v6 - __m)", 6)} AS DECIMAL(38,6))) AS DOUBLE) AS score
         FROM base WHERE __v6 IS NOT NULL GROUP BY user_id UNION ALL SELECT user_id, 7 AS lag,
             CAST(sum(CAST({R(f"(__v - __m) * (__v7 - __m)", 6)} AS DECIMAL(38,6))) AS DOUBLE) AS score
         FROM base WHERE __v7 IS NOT NULL GROUP BY user_id UNION ALL SELECT user_id, 8 AS lag,
             CAST(sum(CAST({R(f"(__v - __m) * (__v8 - __m)", 6)} AS DECIMAL(38,6))) AS DOUBLE) AS score
         FROM base WHERE __v8 IS NOT NULL GROUP BY user_id UNION ALL SELECT user_id, 9 AS lag,
             CAST(sum(CAST({R(f"(__v - __m) * (__v9 - __m)", 6)} AS DECIMAL(38,6))) AS DOUBLE) AS score
         FROM base WHERE __v9 IS NOT NULL GROUP BY user_id UNION ALL SELECT user_id, 10 AS lag,
             CAST(sum(CAST({R(f"(__v - __m) * (__v10 - __m)", 6)} AS DECIMAL(38,6))) AS DOUBLE) AS score
         FROM base WHERE __v10 IS NOT NULL GROUP BY user_id
    ),
    picked AS (
      SELECT user_id, lag, score,
             row_number() OVER (
               PARTITION BY user_id ORDER BY score DESC, lag ASC
             ) AS rn
      FROM lags
    )
    SELECT user_id, CAST(lag AS INT) AS peak_lag, {R("score", 4)} AS peak_score
    FROM picked WHERE rn = 1
    """,
)
def _q_autocorr_peak_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user autocorrelation peak lag (`ag.autocorr_peak_lag`,
    lags 1-10): the sample periodicity of each user's value stream —
    demeaned decimal-exact autocovariance, one key-partitioned window
    pass for all lags + mean, scan-side stack unpivot, bounded
    (key x lag) argmax. The statistical twin of e11_seasonal_fold."""
    out = ag.autocorr_peak_lag(_table(spark, sf_dir, "events"), max_lag=10)
    return out.select(
        "user_id", F.col("peak_lag").cast("int").alias("peak_lag"), "peak_score"
    )


@register(
    "dedup_fuzzy_prefix_pairs",
    """
    WITH raw AS (
      SELECT doc_id,
             substr(norm, 1, 32) AS p,
             string_split(norm, ' ')[1] AS blk
      FROM (
        SELECT doc_id,
               trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')) AS norm
        FROM documents WHERE text IS NOT NULL
      )
      WHERE len(string_split(norm, ' ')[1]) > 0
    ),
    base AS (
      SELECT doc_id, p, blk FROM (
        SELECT *, row_number() OVER (PARTITION BY blk ORDER BY doc_id ASC) AS rn
        FROM raw
      ) WHERE rn <= 200
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(levenshtein(a.p, b.p) AS INT) AS edit_dist
    FROM base a JOIN base b ON a.blk = b.blk AND a.doc_id < b.doc_id
    WHERE levenshtein(a.p, b.p) <= 5
    """,
)
def _q_fuzzy_prefix_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance near-dup pairs (`dd.fuzzy_prefix_pairs`): docs
    sharing their first normalized token whose 32-char normalized
    prefixes are within Levenshtein 5 — the typo/OCR-noise dup class
    that digest equality and shingle Jaccard both miss (one character
    edit changes every containing shingle). The DP runs only on
    blocked candidates over bounded prefixes; Spark and DuckDB
    implement the identical integer DP, so pairs are oracle-exact."""
    out = dd.fuzzy_prefix_pairs(
        _table(spark, sf_dir, "documents"), prefix_len=32, max_dist=5
    )
    return out.select(
        "id_a", "id_b", F.col("edit_dist").cast("int").alias("edit_dist")
    )


_RRF_QUERIES = {
    "q0": {"terms": ("spark", "window", "join"), "vec": 0},
    "q1": {"terms": ("hash", "merge", "sort"), "vec": 1},
}


def _rrf_bm25_cte(qid: str, terms: tuple[str, ...]) -> str:
    in_list = ", ".join(f"'{t}'" for t in terms)
    return f"""
    tf_{qid} AS (
      SELECT doc_id, token, count(*) AS tf
      FROM toks WHERE token IN ({in_list})
      GROUP BY doc_id, token
    ),
    dfreq_{qid} AS (SELECT token, count(*) AS doc_freq FROM tf_{qid} GROUP BY token),
    bscored_{qid} AS (
      SELECT t.doc_id,
             CAST({sql_rd(
                 "((CAST(s.n_docs AS DOUBLE) - CAST(d.doc_freq AS DOUBLE) + 0.5)"
                 " / (CAST(d.doc_freq AS DOUBLE) + 0.5))"
                 " * (CAST(t.tf AS DOUBLE) * 2.2)"
                 " / (CAST(t.tf AS DOUBLE)"
                 "    + 1.2 * (0.25 + 0.75 * CAST(l.dl AS DOUBLE) / s.avgdl))",
                 9,
             )} AS DECIMAL(38,9)) AS s
      FROM tf_{qid} t
      JOIN dfreq_{qid} d ON d.token = t.token
      JOIN dl l ON l.doc_id = t.doc_id
      CROSS JOIN stats s
    ),
    bm_{qid} AS (
      SELECT '{qid}' AS query_id, doc_id, {R("CAST(sum(s) AS DOUBLE)", 6)} AS score
      FROM bscored_{qid} GROUP BY doc_id
      ORDER BY score DESC, doc_id ASC LIMIT 20
    )"""


def _rrf_dense_cte(qid: str, vec: int) -> str:
    return f"""
    q_{qid} AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = {vec}),
    dots_{qid} AS (
      SELECT e.vec_id,
             sum(CAST({sql_rd("e.x * CAST(q.qv[e.i] AS DOUBLE)", 9)} AS DECIMAL(38,9))) AS dxy,
             sum(CAST({sql_rd("e.x * e.x", 9)} AS DECIMAL(38,9))) AS dxx,
             sum(CAST({sql_rd("CAST(q.qv[e.i] AS DOUBLE) * CAST(q.qv[e.i] AS DOUBLE)", 9)} AS DECIMAL(38,9))) AS dyy
      FROM ex e CROSS JOIN q_{qid} q
      GROUP BY e.vec_id
    ),
    dn_{qid} AS (
      SELECT '{qid}' AS query_id, vec_id AS doc_id,
             {R("CAST(dxy AS DOUBLE) / (sqrt(CAST(dxx AS DOUBLE)) * sqrt(CAST(dyy AS DOUBLE)))", 6)} AS score
      FROM dots_{qid}
      ORDER BY score DESC, doc_id ASC LIMIT 20
    )"""


@register(
    "retrieval_rrf_hybrid",
    f"""
    WITH toks AS (
      SELECT doc_id, t.token
      FROM documents,
           LATERAL (SELECT unnest(string_split(trim(text), ' ')) AS token) t
      WHERE len(t.token) > 0
    ),
    dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
    stats AS (
      SELECT count(*) AS n_docs,
             CAST(sum(dl) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avgdl
      FROM dl
    ),
    ex AS ({_EX_SQL}),
    {",".join(_rrf_bm25_cte(q, c["terms"]) for q, c in _RRF_QUERIES.items())},
    {",".join(_rrf_dense_cte(q, c["vec"]) for q, c in _RRF_QUERIES.items())},
    lex AS (SELECT * FROM bm_q0 UNION ALL SELECT * FROM bm_q1),
    dns AS (SELECT * FROM dn_q0 UNION ALL SELECT * FROM dn_q1),
    lexr AS (
      SELECT query_id, doc_id,
             row_number() OVER (
               PARTITION BY query_id ORDER BY score DESC, doc_id ASC
             ) AS rnk
      FROM lex
    ),
    dnsr AS (
      SELECT query_id, doc_id,
             row_number() OVER (
               PARTITION BY query_id ORDER BY score DESC, doc_id ASC
             ) AS rnk
      FROM dns
    ),
    rr AS (
      SELECT query_id, doc_id,
             CAST({sql_rd("1.0 / (60.0 + CAST(rnk AS DOUBLE))", 9)} AS DECIMAL(38,9)) AS t
      FROM lexr
      UNION ALL
      SELECT query_id, doc_id,
             CAST({sql_rd("1.0 / (60.0 + CAST(rnk AS DOUBLE))", 9)} AS DECIMAL(38,9)) AS t
      FROM dnsr
    ),
    fused AS (
      SELECT query_id, doc_id,
             count(*) AS n_lists,
             {R("CAST(sum(t) AS DOUBLE)", 9)} AS rrf_score
      FROM rr GROUP BY query_id, doc_id
    )
    SELECT query_id, doc_id, n_lists, rrf_score FROM (
      SELECT *, row_number() OVER (
        PARTITION BY query_id ORDER BY rrf_score DESC, doc_id ASC
      ) AS rn FROM fused
    ) WHERE rn <= 10
    """,
)
def _q_retrieval_rrf_hybrid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval via reciprocal-rank fusion (`tx.rrf_fuse`,
    Cormack et al. 2009) for a BATCH of two queries: each query's BM25
    top-20 fused with its decimal-cosine dense top-20, fused score =
    sum of 9-dp-rounded 1/(60+rank) terms, top-10 PER QUERY. The
    query id is a real data column (per-branch tags surviving a
    union), so every rank window is KEYED — the same plan fuses a
    million-query batch; a single-literal-query form would
    constant-fold the key away into a keyless window, which the plan
    sweep (rightly) rejects."""
    docs = _table(spark, sf_dir, "documents")
    emb = _table(spark, sf_dir, "embeddings")
    lex_parts, dense_parts = [], []
    for qid, cfg in _RRF_QUERIES.items():
        lex_parts.append(
            tx.bm25_topk(docs, list(cfg["terms"]), k=20).select(
                F.lit(qid).alias("query_id"), "doc_id", F.col("score")
            )
        )
        qvec = [
            float(x)
            for x in emb.filter(F.col("vec_id") == cfg["vec"]).first()["embedding"]
        ]
        dense_parts.append(
            sim.decimal_cosine_vs_query(emb, qvec)
            .select(
                F.lit(qid).alias("query_id"),
                F.col("vec_id").alias("doc_id"),
                rd(F.col("cosine"), 6).alias("score"),
            )
            .orderBy(F.col("score").desc(), F.col("doc_id").asc())
            .limit(20)
        )
    lex = lex_parts[0].unionByName(lex_parts[1])
    dense = dense_parts[0].unionByName(dense_parts[1])
    fused = tx.rrf_fuse([lex, dense], k=60)
    w = Window.partitionBy("query_id").orderBy(
        F.col("rrf_score").desc(), F.col("doc_id").asc()
    )
    return (
        fused.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= 10)
        .select("query_id", "doc_id", "n_lists", "rrf_score")
    )


@register(
    "text_token_gini",
    f"""
    WITH toks AS (
      SELECT doc_id, t.token
      FROM documents,
           LATERAL (SELECT unnest(string_split(trim(text), ' ')) AS token) t
      WHERE text IS NOT NULL AND len(t.token) > 0
    ),
    tf AS (SELECT doc_id, token, count(*) AS c FROM toks GROUP BY doc_id, token),
    wn AS (SELECT *, sum(c) OVER (PARTITION BY doc_id) AS n FROM tf)
    SELECT doc_id,
           CAST(max(n) AS BIGINT) AS n_tokens,
           count(*) AS n_distinct,
           {R("1.0 - CAST(sum(CAST(" + sql_rd(
               "(CAST(c AS DOUBLE) / CAST(n AS DOUBLE))"
               " * (CAST(c AS DOUBLE) / CAST(n AS DOUBLE))", 12
           ) + " AS DECIMAL(38,12))) AS DOUBLE)", 9)} AS gini
    FROM wn GROUP BY doc_id
    """,
)
def _q_token_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc token-distribution Gini impurity (`tx.token_gini`) —
    the portable lexical-diversity score (entropy needs log; Gini is
    squares of exact ratios, bit-identical everywhere, and ranks docs
    the same way for repetitive-junk filtering). One (doc, token)
    count; per-doc total on the same doc-key Exchange."""
    out = tx.token_gini(_table(spark, sf_dir, "documents"))
    return out.select(
        "doc_id", F.col("n_tokens").cast("long").alias("n_tokens"),
        "n_distinct", "gini",
    )


@register(
    "histogram_equidepth_value",
    f"""
    WITH v AS (
      SELECT event_type, {R("CAST(value AS DOUBLE)", 6)} AS v FROM events
    ),
    b AS (
      SELECT event_type, v,
             least(9, CAST(floor(
               percent_rank() OVER (PARTITION BY event_type ORDER BY v ASC) * 10.0
             ) AS BIGINT)) AS bucket
      FROM v
    )
    SELECT event_type, bucket, count(*) AS n, min(v) AS lo, max(v) AS hi
    FROM b GROUP BY event_type, bucket
    """,
)
def _q_histogram_equidepth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type equi-depth value histogram
    (`ag.equidepth_histogram`, 10 buckets): the optimizer-statistics /
    data-quality object, deterministic via percent_rank over the
    rounded value (value-ties share a bucket in every engine). One
    keyed window + one aggregation on the same Exchange."""
    return ag.equidepth_histogram(_table(spark, sf_dir, "events"))


@register(
    "events_json_props_stats",
    f"""
    SELECT event_type,
           CAST(json_extract(props, '$.k') AS BIGINT) % 10 AS k_bucket,
           count(*) AS n,
           {_sql_dsum("value", 2)} AS total_value
    FROM events
    WHERE props IS NOT NULL
    GROUP BY event_type, CAST(json_extract(props, '$.k') AS BIGINT) % 10
    """,
)
def _q_events_json_props_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured payload aggregation: parse the `props` JSON
    column with a DECLARED schema (`from_json` — vectorized Jackson
    parse inside codegen, not a per-row Python json.loads), bucket the
    extracted key, aggregate. The schema-on-read pattern every event
    pipeline needs; at scale the parse cost is why you declare the
    schema once instead of schema-inferring per batch. Oracle uses
    DuckDB's json_extract on the identical path expression."""
    from pyspark.sql.types import LongType, StructField, StructType

    e = _table(spark, sf_dir, "events")
    schema = StructType([StructField("k", LongType())])
    return (
        e.filter(F.col("props").isNotNull())
        .select(
            "event_type",
            F.pmod(F.from_json(F.col("props"), schema).getField("k"), F.lit(10)).alias("k_bucket"),
            F.col("value"),
        )
        .groupBy("event_type", "k_bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            _dsum(F.col("value"), 2).alias("total_value"),
        )
    )


@register(
    "text_chunks_udtf",
    """
    WITH w AS (
      SELECT doc_id,
             list_filter(string_split(trim(text), ' '), t -> len(t) > 0) AS toks
      FROM documents WHERE text IS NOT NULL
    )
    SELECT doc_id,
           CAST(i.i AS INT) AS seg_idx,
           array_to_string(toks[i.i * 8 + 1 : i.i * 8 + 8], ' ') AS segment
    FROM w,
         LATERAL (SELECT unnest(generate_series(0,
                    CAST(ceil(len(toks) / 8.0) AS BIGINT) - 1)) AS i) i
    WHERE len(toks) > 0
    """,
)
def _q_text_chunks_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-stride token chunking through a Python UDTF
    (`tx.chunks_udtf_frame` — Spark 4 lateral table function,
    Arrow-optimized): the §2.11 API-surface demo for logic that can't
    be an expression (external tokenizers, stateful parsers), held to
    the SAME exact oracle as the codegen chunker. Production chunking
    stays on `text_chunk_documents`; this proves the UDTF boundary is
    value-transparent."""
    return tx.chunks_udtf_frame(_table(spark, sf_dir, "documents"), chunk_tokens=8)


@register(
    "dedup_sorted_neighborhood_pairs",
    """
    WITH base AS (
      SELECT doc_id,
             substr(norm, 1, 32) AS p,
             substr(norm, 1, 4) AS blk
      FROM (
        SELECT doc_id,
               trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')) AS norm
        FROM documents WHERE text IS NOT NULL
      )
      WHERE len(substr(norm, 1, 4)) > 0
    ),
    lagged AS (
      SELECT doc_id AS id_b, p AS pb,
             lag(doc_id, 1) OVER w AS id1, lag(p, 1) OVER w AS pp1,
             lag(doc_id, 2) OVER w AS id2, lag(p, 2) OVER w AS pp2,
             lag(doc_id, 3) OVER w AS id3, lag(p, 3) OVER w AS pp3
      FROM base WINDOW w AS (PARTITION BY blk ORDER BY p ASC, doc_id ASC)
    ),
    pairs AS (
      SELECT id_b, pb, id1 AS id_a, pp1 AS pa FROM lagged WHERE id1 IS NOT NULL
      UNION ALL
      SELECT id_b, pb, id2 AS id_a, pp2 AS pa FROM lagged WHERE id2 IS NOT NULL
      UNION ALL
      SELECT id_b, pb, id3 AS id_a, pp3 AS pa FROM lagged WHERE id3 IS NOT NULL
    )
    SELECT least(id_a, id_b) AS id_a,
           greatest(id_a, id_b) AS id_b,
           CAST(levenshtein(pa, pb) AS INT) AS edit_dist
    FROM pairs
    WHERE levenshtein(pa, pb) <= 5
    """,
)
def _q_sorted_neighborhood_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sorted-neighborhood near-dup pairs
    (`dd.sorted_neighborhood_pairs`, Hernandez & Stolfo 1995):
    per-block sort by normalized prefix, compare each record only to
    its 3 predecessors — LINEAR N*w compare volume, never quadratic by
    construction (the structural alternative to `dedup_fuzzy_prefix_pairs`'
    capped block self-join). One keyed window pass + scan-side stack;
    no self-join anywhere in the plan."""
    out = dd.sorted_neighborhood_pairs(
        _table(spark, sf_dir, "documents"), window=3, prefix_len=32, max_dist=5
    )
    return out.select(
        "id_a", "id_b", F.col("edit_dist").cast("int").alias("edit_dist")
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


#: shared Fellegi-Sunter CTE chain (SNM candidates -> integer-weight
#: ``scored``) — factored so the pair-score query and the golden-record
#: entity rollup score the identical candidate set and can never drift.
_LINKAGE_SCORED_SQL = """base AS (
      SELECT doc_id,
             substr(norm, 1, 32) AS p,
             substr(norm, 1, 4) AS blk
      FROM (
        SELECT doc_id,
               trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')) AS norm
        FROM documents WHERE text IS NOT NULL
      )
      WHERE len(substr(norm, 1, 4)) > 0
    ),
    lagged AS (
      SELECT doc_id AS id_b, p AS pb,
             lag(doc_id, 1) OVER w AS id1, lag(p, 1) OVER w AS pp1,
             lag(doc_id, 2) OVER w AS id2, lag(p, 2) OVER w AS pp2,
             lag(doc_id, 3) OVER w AS id3, lag(p, 3) OVER w AS pp3
      FROM base WINDOW w AS (PARTITION BY blk ORDER BY p ASC, doc_id ASC)
    ),
    raw_pairs AS (
      SELECT id_b, pb, id1 AS id_a, pp1 AS pa FROM lagged WHERE id1 IS NOT NULL
      UNION ALL
      SELECT id_b, pb, id2 AS id_a, pp2 AS pa FROM lagged WHERE id2 IS NOT NULL
      UNION ALL
      SELECT id_b, pb, id3 AS id_a, pp3 AS pa FROM lagged WHERE id3 IS NOT NULL
    ),
    pairs AS (
      SELECT least(id_a, id_b) AS id_a,
             greatest(id_a, id_b) AS id_b,
             CAST(levenshtein(pa, pb) AS INT) AS edit_dist
      FROM raw_pairs
      WHERE levenshtein(pa, pb) <= 5
    ),
    scored AS (
      SELECT p.id_a, p.id_b, p.edit_dist,
             (CASE WHEN da.lang = db.lang THEN 2 ELSE -3 END
              + CASE WHEN da.source = db.source THEN 3 ELSE -2 END
              + CASE WHEN abs(da.n_chars - db.n_chars) <= 16 THEN 2 ELSE -3 END
              + CASE WHEN p.edit_dist <= 2 THEN 6 ELSE -5 END) AS score
      FROM pairs p
      JOIN documents da ON da.doc_id = p.id_a
      JOIN documents db ON db.doc_id = p.id_b
    )
"""


@register(
    "dedup_linkage_scores",
    f"""
    WITH {_LINKAGE_SCORED_SQL}
    SELECT id_a, id_b, edit_dist, CAST(score AS INT) AS score,
           CASE WHEN score >= 8 THEN 'match'
                WHEN score >= 0 THEN 'possible'
                ELSE 'nonmatch' END AS link_class
    FROM scored
    """,
)
def _q_linkage_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fellegi-Sunter-style record-linkage scoring
    (`dd.linkage_scores`): sorted-neighborhood candidates (linear N·w,
    no self-join) scored by fixed integer field weights (lang, source,
    size band, prefix edit distance) into match / possible / nonmatch
    — the three-way decision rule of the classic model with
    engine-portable arithmetic (EM-fitted weights are not
    deterministic; production linkage configures them, as here). Two
    narrow shuffle-hash joins pull the comparison fields; cost is
    linear in candidates at any scale."""
    return dd.linkage_scores(_table(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# r6 fourth wave: scale-grade time-series operators (operators/timeseries.py)
# ---------------------------------------------------------------------------

from time_series_data_trimmer_spark.operators import layout as ly  # noqa: E402


@register(
    "layout_zorder_keys",
    f"""
    WITH e AS (
      SELECT event_id, user_id,
             (user_id & 65535) AS ub,
             (CAST(floor(epoch_us(ts) / 3600000000.0) AS BIGINT) & 65535) AS tb
      FROM events
    )
    SELECT event_id, user_id, tb,
           {ly.sql_morton_z("ub", "tb", 16)} AS z
    FROM e
    """,
)
def _q_zorder_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order clustering keys for the events table
    (`ly.morton_z`): user and epoch-hour coordinates bit-interleaved
    into one Morton key — the sort key under which parquet row groups
    become axis-aligned (user, time) rectangles, so min/max pruning
    fires for predicates on EITHER dimension (today's time-ordered
    layout prunes only time). Pure bit arithmetic, scan-side codegen,
    byte-identical formula in the oracle. The write path
    (`ly.zorder_write`, repartitionByRange + sortWithinPartitions)
    and the measured row-group pruning win live in
    `scripts/zorder_prune.py` + SCALING.md §r7."""
    ev = _table(spark, sf_dir, "events")
    us = event_micros(ev)
    ub = F.col("user_id").bitwiseAND(F.lit(65535))
    tb = F.floor(us / F.lit(3_600_000_000.0)).cast("long").bitwiseAND(F.lit(65535))
    d = ev.select("event_id", "user_id", tb.alias("tb"), ub.alias("__ub"))
    return d.select(
        "event_id", "user_id", "tb",
        ly.morton_z(F.col("__ub"), F.col("tb"), 16).alias("z"),
    )


from time_series_data_trimmer_spark.operators import timeseries as ts
from time_series_data_trimmer_spark.sources.events import event_micros

_M4_BUCKET_US = 3_600_000_000  # 1 hour


def _events_us(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events + integer epoch-micros axis ``t_us`` (layout-adaptive)."""
    df = _table(spark, sf_dir, "events")
    return df.withColumn("t_us", event_micros(df))


@register(
    "ts_m4_downsample",
    f"""
    WITH e AS (
      SELECT user_id, epoch_us(ts) AS t_us, event_id, value FROM events
    ),
    b AS (
      SELECT user_id, t_us - (t_us % {_M4_BUCKET_US}) AS bucket_us,
             t_us, event_id, value
      FROM e
    ),
    o AS (
      SELECT user_id, bucket_us, value,
             row_number() OVER (PARTITION BY user_id, bucket_us
                                ORDER BY t_us ASC, event_id ASC) AS rf,
             row_number() OVER (PARTITION BY user_id, bucket_us
                                ORDER BY t_us DESC, event_id DESC) AS rl
      FROM b
    )
    SELECT user_id, bucket_us, count(*) AS n,
           min(value) AS v_min, max(value) AS v_max,
           max(CASE WHEN rf = 1 THEN value END) AS v_first,
           max(CASE WHEN rl = 1 THEN value END) AS v_last
    FROM o GROUP BY user_id, bucket_us
    """,
)
def _q_ts_m4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M4 visualization downsampling (`ts.m4_downsample`, Jugel et al.
    VLDB 2014): per (trial, 1-hour pixel bucket) keep n/min/max/first/
    last — the error-free line-chart reduction. The reference decimates
    for plotting by slicing (`plot_manager.py` renders raw arrays);
    at 100 TB M4 is the only thing a dashboard can afford to scan with.
    Plan: ONE map-side-combinable aggregation on (trial, bucket) —
    first/last ride struct-ordered min/max over the (t_us, event_id)
    total order, so there is no window, no join, no second exchange.
    Values are never touched arithmetically (bit-exact passthrough)."""
    e = _events_us(spark, sf_dir)
    return ts.m4_downsample(e, bucket_us=_M4_BUCKET_US)


@register(
    "ts_gap_report",
    f"""
    WITH e AS (
      SELECT user_id, epoch_us(ts) AS t_us, event_id FROM events
    ),
    d AS (
      SELECT user_id, t_us, event_id,
             t_us - lag(t_us) OVER w AS dt_us
      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t_us ASC, event_id ASC)
    ),
    m AS (
      SELECT *, quantile_cont(dt_us, 0.5) OVER (PARTITION BY user_id) AS med
      FROM d
    )
    SELECT user_id,
           t_us - dt_us AS gap_start_us,
           t_us AS gap_end_us,
           dt_us AS gap_us,
           {R("med", 4)} AS med_dt_us
    FROM m
    WHERE CAST(dt_us AS DOUBLE) > 5.0 * med
    """,
)
def _q_ts_gap_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sampling-dropout report (`ts.gap_report`): intervals where the
    lag-delta exceeds 5x the trial's median delta — the irregular-axis
    complement of the reference's NaN-island suggestions
    (`main.py` suggest_bad_segments flags values; this flags TIME).
    Integer micros end-to-end; the exact median rides the same
    trial-key partition as the lag, so the whole operator is one
    Exchange + two Window ops, zero joins."""
    e = _events_us(spark, sf_dir)
    return ts.gap_report(e, factor=5)


@register(
    "ts_mad_outliers",
    f"""
    WITH m AS (
      SELECT user_id, value,
             quantile_cont(value, 0.5) OVER (PARTITION BY user_id) AS med
      FROM events
    ),
    d AS (
      SELECT user_id, value, med, abs(value - med) AS dev FROM m
    ),
    md AS (
      SELECT *, quantile_cont(dev, 0.5) OVER (PARTITION BY user_id) AS mad
      FROM d
    )
    SELECT user_id, count(*) AS n,
           CAST(sum(CASE WHEN dev > 3.0 * mad THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
           {R("any_value(med)", 6)} AS med,
           {R("any_value(mad)", 6)} AS mad
    FROM md GROUP BY user_id
    """,
)
def _q_ts_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust (median/MAD) outlier summary per trial
    (`ts.mad_outliers`): the breakdown-resistant twin of the
    reference's mean±k*std spike rule (`main.py` suggest_bad_segments)
    — one wild sample inflates sigma and masks its neighbors; MAD's
    breakdown point is 50%. Exact interpolated percentiles in both
    engines; deviations are the identical IEEE |x − med| sequence, so
    the 3*MAD comparison is bit-stable. Window partitions and the
    final groupBy share the trial key: one Exchange total."""
    e = _table(spark, sf_dir, "events")
    return ts.mad_outliers(e, k=3.0)


@register(
    "ts_cusum_changepoint",
    f"""
    WITH e AS (
      SELECT user_id, epoch_us(ts) AS t_us, event_id,
             CAST(floor(value * 10000.0 + 0.5) AS BIGINT) AS v
      FROM events
    ),
    s AS (
      SELECT user_id, t_us, event_id,
             sum(v) OVER (PARTITION BY user_id ORDER BY t_us ASC, event_id ASC
                          ROWS UNBOUNDED PRECEDING) AS cum,
             CAST(row_number() OVER (PARTITION BY user_id
                                     ORDER BY t_us ASC, event_id ASC) AS BIGINT) AS k,
             sum(v) OVER (PARTITION BY user_id) AS total,
             count(*) OVER (PARTITION BY user_id) AS n
      FROM e
    ),
    d AS (SELECT *, n * cum - k * total AS d FROM s),
    r AS (
      SELECT *, row_number() OVER (PARTITION BY user_id
                                   ORDER BY abs(d) DESC, t_us ASC, event_id ASC) AS rn
      FROM d
    )
    SELECT user_id, t_us AS cp_t_us, event_id AS cp_event_id, k AS cp_index,
           {R("CAST(abs(d) AS DOUBLE) / (CAST(n AS DOUBLE) * 10000.0)", 6)} AS max_dev
    FROM r WHERE rn = 1
    """,
)
def _q_ts_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM level-shift locator per trial (`ts.cusum_changepoint`,
    Page 1954): the sample maximizing |sum_(i<=k)(x_i − mean)|,
    earliest on ties — where the signal's level broke, the question a
    trim tool answers by eye on a plot. Integer-exact inside: with
    values scaled to 4-dp ints, n*cumsum_k − k*total needs NO division
    until the surfaced score, so the argmax is bit-identical in any
    engine (the PCA/PageRank unroll policy applied to a window op).
    One trial-key Exchange; cumsum, totals, and the argmax rank all
    share it."""
    e = _events_us(spark, sf_dir)
    return ts.cusum_changepoint(e)


def _ewma_oracle(depth: int = 16) -> str:
    num = " + ".join(
        f"coalesce(lag(v, {j}) OVER w * {1 << (depth - 1 - j)}, 0)"
        for j in range(depth)
    )
    den = " + ".join(
        f"CASE WHEN lag(v, {j}) OVER w IS NOT NULL THEN {1 << (depth - 1 - j)} ELSE 0 END"
        for j in range(depth)
    )
    return f"""
    WITH e AS (
      SELECT user_id, epoch_us(ts) AS t_us, event_id,
             CAST(floor(value * 10000.0 + 0.5) AS BIGINT) AS v
      FROM events
    ),
    s AS (
      SELECT user_id, t_us, event_id,
             {num} AS num, {den} AS den
      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t_us ASC, event_id ASC)
    )
    SELECT user_id, t_us, event_id,
           {R("CAST(num AS DOUBLE) / CAST(den AS DOUBLE) / 10000.0", 6)} AS ewma
    FROM s
    """


@register("ts_ewma_halflife", _ewma_oracle(16))
def _q_ts_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Half-life EWMA smoother (`ts.ewma_halflife`, alpha=1/2
    truncated at 16 lags): the exponential cousin of the reference's
    moving-average filter (`filter_engine.py` moving_average). The
    untruncated recurrence is inherently sequential; truncating at
    2^-16 (<=1.6e-5 relative tail) turns it into a 16-lag weighted
    window — distributed, one sort, one Exchange. Bit-exact because
    half-life weights are exact binary INTEGERS (2^(15-j)) over 4-dp
    scaled values: numerator and weight-sum stay integer, and the one
    IEEE division at the end is the same op in every engine. Head rows
    renormalize over the lags that exist."""
    e = _events_us(spark, sf_dir)
    return ts.ewma_halflife(e, depth=16)


# ---------------------------------------------------------------------------
# r6 fifth wave: corpus-scale sketch comparison, vocabulary growth, CCNet
# ---------------------------------------------------------------------------


@register(
    "sketch_kmv_jaccard_sources",
    f"""
    WITH hashed AS (
      SELECT DISTINCT source AS g, {sp.sql_hash_u32('token', 'tsdt|kmv')} AS u
      FROM {_KMV_TOKENS_TABLE}
    ),
    regs AS (
      SELECT g, u FROM (
        SELECT g, u, row_number() OVER (PARTITION BY g ORDER BY u ASC) AS rn
        FROM hashed
      ) WHERE rn <= 64
    ),
    srcs AS (SELECT DISTINCT g FROM regs),
    pairs AS (SELECT a.g AS src_a, b.g AS src_b FROM srcs a JOIN srcs b ON a.g < b.g),
    pr AS (
      SELECT p.src_a, p.src_b, r.u, r.g
      FROM pairs p JOIN regs r ON r.g = p.src_a OR r.g = p.src_b
    ),
    per_u AS (
      SELECT src_a, src_b, u, count(*) AS n_sides
      FROM pr GROUP BY src_a, src_b, u
    ),
    kept AS (
      SELECT * FROM (
        SELECT *, row_number() OVER (PARTITION BY src_a, src_b ORDER BY u ASC) AS rn
        FROM per_u
      ) WHERE rn <= 64
    )
    SELECT src_a, src_b, count(*) AS n_union_kept,
           CAST(sum(CASE WHEN n_sides = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_common,
           {R("CAST(sum(CASE WHEN n_sides = 2 THEN 1 ELSE 0 END) AS DOUBLE)"
              " / CAST(count(*) AS DOUBLE)", 6)} AS jaccard_est
    FROM kept GROUP BY src_a, src_b
    """,
)
def _q_kmv_jaccard_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All-pairs cross-source vocabulary Jaccard from KMV registers
    alone (`sk.kmv_pairwise_jaccard`, Beyer et al. SIGMOD 2007): the
    domain-overlap audit behind mixing decisions, computed WITHOUT ever
    intersecting raw token sets — every pair costs <= 2k register longs
    (the bottom-k of a union is a function of the two bottom-k sets).
    The group list is a bounded collect (domains are O(10^2) at any
    corpus scale); pair expansion is a scan-side literal-array explode,
    so the plan has no inequality join anywhere."""
    docs = _table(spark, sf_dir, "documents")
    toks = (
        docs.filter(F.col("text").isNotNull())
        .select(
            "source",
            F.explode(F.split(F.trim(F.col("text")), " ")).alias("token"),
        )
        .filter(F.length("token") > 0)
    )
    regs = sk.kmv_registers(toks, "source", "token", k=64)
    return sk.kmv_pairwise_jaccard(regs, k=64)


@register(
    "text_vocab_growth",
    f"""
    WITH b AS (
      SELECT doc_id, text,
             CAST(floor({sp.sql_hash_u32('doc_id', 'tsdt|vocab')} * 10
                        / 4294967296.0) AS INT) AS bucket
      FROM documents WHERE text IS NOT NULL
    ),
    toks AS (
      SELECT b.bucket, md5(t.token) AS td
      FROM b, LATERAL (SELECT unnest(string_split(trim(b.text), ' ')) AS token) t
      WHERE len(t.token) > 0
    ),
    firsts AS (SELECT td, min(bucket) AS fb FROM toks GROUP BY td),
    vocab_at AS (SELECT fb, count(*) AS nv FROM firsts GROUP BY fb),
    inst_at AS (SELECT bucket, count(*) AS ni FROM toks GROUP BY bucket),
    docs_at AS (SELECT bucket, count(*) AS nd FROM b GROUP BY bucket),
    v_cum AS (
      SELECT u.b AS bucket, CAST(sum(nv) AS BIGINT) AS vocab_cum
      FROM vocab_at, unnest(generate_series(vocab_at.fb, 9)) u(b) GROUP BY u.b
    ),
    i_cum AS (
      SELECT u.b AS bucket, CAST(sum(ni) AS BIGINT) AS instances_cum
      FROM inst_at, unnest(generate_series(inst_at.bucket, 9)) u(b) GROUP BY u.b
    ),
    d_cum AS (
      SELECT u.b AS bucket, CAST(sum(nd) AS BIGINT) AS docs_cum
      FROM docs_at, unnest(generate_series(docs_at.bucket, 9)) u(b) GROUP BY u.b
    )
    SELECT d.bucket, d.docs_cum, i.instances_cum, v.vocab_cum
    FROM d_cum d JOIN i_cum i ON i.bucket = d.bucket
                 JOIN v_cum v ON v.bucket = d.bucket
    """,
)
def _q_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps-law vocabulary-growth curve (`tx.vocab_growth`, V ~ n^beta):
    cumulative distinct tokens / instances / docs after each tenth of
    the corpus in the deterministic md5 ingestion order — the
    diminishing-returns signal behind data-budget decisions (a
    flattened curve means new shards add little vocabulary). Tokens
    collapse to (digest, min bucket) — one narrow shuffle; the
    cumulative sums are explode(sequence) over <= 10 aggregate rows,
    never a keyless window."""
    return tx.vocab_growth(_table(spark, sf_dir, "documents"), n_buckets=10)


_CCNET_LM_SQL = f"""
    toks AS (
      SELECT doc_id, string_split(trim(text), ' ') AS w
      FROM documents WHERE text IS NOT NULL
    ),
    posns AS (
      SELECT doc_id, w, generate_subscripts(w, 1) AS pos
      FROM toks WHERE len(w) >= 2
    ),
    bg AS (
      SELECT doc_id,
             md5(array_to_string(list_slice(w, pos, pos+1), ' ')) AS bd,
             md5(w[pos]) AS cd
      FROM posns WHERE pos <= len(w) - 1
    ),
    bgc AS (SELECT bd, count(*) AS c2 FROM bg GROUP BY bd),
    ctx AS (SELECT cd, count(*) AS c1 FROM bg GROUP BY cd),
    vocab AS (
      SELECT count(distinct md5(u.tok)) AS v
      FROM toks, unnest(toks.w) AS u(tok)
    ),
    scored AS (
      SELECT b.doc_id,
             {R("-log2(CAST(c.c2 + 1 AS DOUBLE) / CAST(x.c1 + vocab.v AS DOUBLE))", 6)} AS nll
      FROM bg b
      JOIN bgc c ON c.bd = b.bd
      JOIN ctx x ON x.cd = b.cd
      CROSS JOIN vocab
    ),
    perdoc AS (
      SELECT doc_id,
             {R("CAST(sum(CAST(nll AS DECIMAL(38,6))) AS DOUBLE) / count(*)", 6)} AS avg_nll
      FROM scored GROUP BY doc_id
    )
"""


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
# CM-sketch join-size estimation (AMS/CM inner product)
# ---------------------------------------------------------------------------

_CMJS_D, _CMJS_W, _CMJS_SEED = 4, 1024, "tsdt|cmjs"


def _cmjs_cells_sql(src: str, group_expr: str) -> str:
    union = "\n      UNION ALL ".join(
        f"SELECT {group_expr} AS g, {r} AS r, "
        f"{sp.sql_hash_u32('user_id', f'{_CMJS_SEED}|{r}')} % {_CMJS_W} AS c "
        f"FROM {src}"
        for r in range(_CMJS_D)
    )
    return f"SELECT g, r, c, count(*) AS cnt FROM ({union}) GROUP BY g, r, c"


@register(
    "sketch_selfjoin_size_by_type",
    f"""
    WITH cells AS ({_cmjs_cells_sql("events", "event_type")}),
    prod AS (
      SELECT a.g, a.r, sum(CAST(a.cnt AS HUGEINT) * b.cnt) AS s
      FROM cells a JOIN cells b ON a.g = b.g AND a.r = b.r AND a.c = b.c
      GROUP BY a.g, a.r
    ),
    est AS (
      SELECT g,
             CASE WHEN count(*) >= {_CMJS_D} THEN min(s) ELSE 0 END AS est_f2
      FROM prod GROUP BY g
    ),
    exact AS (
      SELECT g, sum(CAST(cnt AS HUGEINT) * cnt) AS exact_f2
      FROM (SELECT event_type AS g, user_id, count(*) AS cnt
            FROM events GROUP BY 1, 2)
      GROUP BY g
    )
    SELECT e.g AS event_type,
           CAST(e.est_f2 AS BIGINT) AS est_f2,
           CAST(x.exact_f2 AS BIGINT) AS exact_f2,
           CAST(e.est_f2 - x.exact_f2 AS BIGINT) AS overest
    FROM est e JOIN exact x ON e.g = x.g
    """,
)
def _q_selfjoin_size_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self-join size (second frequency moment F2 = Σ_u f_u²) per
    event_type on the user_id key, estimated from Count-Min registers
    via the AMS/CM inner product (`sk.cm_inner_product`), exact value
    alongside for audit plus the signed overestimate (provably ≥ 0 —
    collisions only add; asserted in tests).

    This is the cardinality-planning primitive: self-join size IS the
    skew diagnostic (F2 ≫ N²/NDV means a hot key) and the inner
    product of two different sketches is the join-output-size
    forecast — both read ≤ d·w registers per group instead of
    shuffling the fact table on the join key. At 100 TB the registers
    come from per-day merges (counters are sums) and the planner never
    rescans the corpus to cost a join."""
    ev = _table(spark, sf_dir, "events")
    regs = sk.cm_registers(
        ev, "event_type", "user_id", d=_CMJS_D, w=_CMJS_W, seed=_CMJS_SEED
    )
    est = sk.cm_inner_product(regs, regs, d=_CMJS_D, out_col="__est")
    counts = ev.groupBy(F.col("event_type").alias("g"), "user_id").agg(
        F.count(F.lit(1)).alias("__cnt")
    )
    exact = counts.groupBy("g").agg(
        F.sum(
            F.col("__cnt").cast("decimal(19,0)") * F.col("__cnt").cast("decimal(19,0)")
        ).alias("__exact")
    )
    return est.join(exact.hint("shuffle_hash"), "g").select(
        F.col("g").alias("event_type"),
        F.col("__est").cast("long").alias("est_f2"),
        F.col("__exact").cast("long").alias("exact_f2"),
        (F.col("__est") - F.col("__exact")).cast("long").alias("overest"),
    )


@register(
    "sketch_join_size_clicks_purchases",
    f"""
    WITH clicks AS (SELECT user_id FROM events WHERE event_type = 'click'),
    purchases AS (SELECT user_id FROM events WHERE event_type = 'purchase'),
    ca AS ({_cmjs_cells_sql("clicks", "'all'")}),
    cb AS ({_cmjs_cells_sql("purchases", "'all'")}),
    prod AS (
      SELECT a.r, sum(CAST(a.cnt AS HUGEINT) * b.cnt) AS s
      FROM ca a JOIN cb b ON a.g = b.g AND a.r = b.r AND a.c = b.c
      GROUP BY a.r
    ),
    est AS (
      SELECT CASE WHEN count(*) >= {_CMJS_D} THEN min(s) ELSE 0 END AS est_rows
      FROM prod
    ),
    exact AS (
      SELECT coalesce(sum(CAST(a.cnt AS HUGEINT) * b.cnt), 0) AS exact_rows
      FROM (SELECT user_id, count(*) AS cnt FROM clicks GROUP BY 1) a
      JOIN (SELECT user_id, count(*) AS cnt FROM purchases GROUP BY 1) b
        ON a.user_id = b.user_id
    )
    SELECT CAST(e.est_rows AS BIGINT) AS est_rows,
           CAST(x.exact_rows AS BIGINT) AS exact_rows,
           CAST(e.est_rows - x.exact_rows AS BIGINT) AS overest
    FROM est e CROSS JOIN exact x
    """,
)
def _q_join_size_clicks_purchases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecast |clicks ⋈ purchases ON user_id| from two Count-Min
    register sets (one per stream) via the CM inner product — the
    join never runs on the sketch path; only ≤ d·w counters per side
    meet. The exact audit side computes Σ_u f_click(u)·f_purchase(u)
    from the two per-user count frames (already reduced — the
    user-keyed shuffle carries NDV rows, not occurrences).

    The 1-row register-vs-register meeting is a (g,r,c)-keyed join of
    two ≤ d·w-row frames — KB-scale regardless of stream volume."""
    ev = _table(spark, sf_dir, "events")
    a = ev.filter(F.col("event_type") == "click").withColumn("__g", F.lit("all"))
    b = ev.filter(F.col("event_type") == "purchase").withColumn("__g", F.lit("all"))
    ra = sk.cm_registers(a, "__g", "user_id", d=_CMJS_D, w=_CMJS_W, seed=_CMJS_SEED)
    rb = sk.cm_registers(b, "__g", "user_id", d=_CMJS_D, w=_CMJS_W, seed=_CMJS_SEED)
    est = sk.cm_inner_product(ra, rb, d=_CMJS_D, out_col="__est")
    fa = a.groupBy("user_id").agg(F.count(F.lit(1)).alias("__fa"))
    fb = b.groupBy("user_id").agg(F.count(F.lit(1)).alias("__fb"))
    exact = (
        fa.join(fb.hint("shuffle_hash"), "user_id")
        .agg(
            F.coalesce(
                F.sum(
                    F.col("__fa").cast("decimal(19,0)")
                    * F.col("__fb").cast("decimal(19,0)")
                ),
                F.lit(0).cast("decimal(38,0)"),
            ).alias("__exact")
        )
        .withColumn("g", F.lit("all"))
    )
    return est.join(F.broadcast(exact), "g").select(
        F.col("__est").cast("long").alias("est_rows"),
        F.col("__exact").cast("long").alias("exact_rows"),
        (F.col("__est") - F.col("__exact")).cast("long").alias("overest"),
    )


# ---------------------------------------------------------------------------
# Systematic PPS weighted sampling
# ---------------------------------------------------------------------------

_PPS_K, _PPS_S, _PPS_SEED = 100, 32, "tsdt|pps"


@register(
    "sample_pps_by_chars",
    f"""
    WITH t AS (
      SELECT doc_id, n_chars,
             {sp.sql_hash_u32('doc_id', _PPS_SEED)} AS h
      FROM documents WHERE n_chars > 0
    ),
    o AS (
      SELECT doc_id, n_chars,
             sum(n_chars) OVER (
               ORDER BY h % {_PPS_S}, h, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS cum
      FROM t
    ),
    w AS (SELECT sum(n_chars) AS tw FROM t)
    SELECT doc_id, CAST(n_chars AS BIGINT) AS weight,
           CAST(({_PPS_K} * CAST(cum AS HUGEINT)) // tw
              - ({_PPS_K} * CAST(cum - n_chars AS HUGEINT)) // tw AS BIGINT)
             AS n_hits
    FROM o CROSS JOIN w
    WHERE ({_PPS_K} * CAST(cum AS HUGEINT)) // tw
        - ({_PPS_K} * CAST(cum - n_chars AS HUGEINT)) // tw >= 1
    """,
)
def _q_pps_by_chars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample exactly {k}=100 draws from documents with inclusion
    count ∝ n_chars via systematic PPS (`sp.pps_systematic_sample`) —
    the "sample documents proportional to token count" primitive a
    training-data mix needs, with zero transcendental functions: the
    md5-shuffled order, a distributed integer prefix sum (per-shard
    window + S bounded shard totals, no global sort), and two exact
    integer divisions per row. Σ n_hits telescopes to exactly k
    (pytest-pinned); every arithmetic step is reproduced verbatim in
    the oracle, so the SAMPLE ITSELF is cross-engine identical —
    a property no rand()-based sampler has."""
    docs = _table(spark, sf_dir, "documents")
    return sp.pps_systematic_sample(
        docs, k=_PPS_K, weight_col="n_chars", key_col="doc_id",
        n_shards=_PPS_S, seed=_PPS_SEED,
    )


# ---------------------------------------------------------------------------
# Interval-union coverage + peak concurrency (distributed sweep-line)
# ---------------------------------------------------------------------------


@register(
    "interval_coverage_daily",
    f"""
    WITH e AS (
      SELECT user_id, event_id, ts, epoch_us(ts) AS us FROM events
    ),
    m AS (
      SELECT *,
             CASE WHEN lag(us) OVER w IS NULL
                       OR us - lag(us) OVER w > 1800000000
                  THEN 1 ELSE 0 END AS newf
      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    s AS (
      SELECT *,
             sum(newf) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS UNBOUNDED PRECEDING
             ) AS sess
      FROM m
    ),
    sess AS (
      SELECT user_id, sess, min(us) AS start_us, max(us) AS end_us
      FROM s GROUP BY user_id, sess
    ),
    pieces AS (
      SELECT b.bucket,
             greatest(start_us, b.bucket * {iv.DAY_US}) AS ps,
             least(end_us, (b.bucket + 1) * {iv.DAY_US}) AS pe
      FROM sess,
           LATERAL (
             SELECT unnest(generate_series(
               CAST(floor(start_us / {float(iv.DAY_US)}) AS BIGINT),
               CAST(floor(end_us / {float(iv.DAY_US)}) AS BIGINT)
             )) AS bucket
           ) b
    ),
    deltas AS (
      SELECT bucket, ps AS us, 1 AS d,
             CASE WHEN pe > ps THEN 1 ELSE 0 END AS pos FROM pieces
      UNION ALL
      SELECT bucket, pe AS us, -1 AS d, 0 AS pos FROM pieces
    ),
    grouped AS (
      SELECT bucket, us, sum(d) AS net, sum(pos) AS plus
      FROM deltas GROUP BY bucket, us
    ),
    swept AS (
      SELECT bucket, plus,
             sum(net) OVER (
               PARTITION BY bucket ORDER BY us
               ROWS UNBOUNDED PRECEDING
             ) AS conc,
             lead(us) OVER (PARTITION BY bucket ORDER BY us) - us AS span
      FROM grouped
    )
    SELECT bucket,
           CAST(sum(plus) AS BIGINT) AS n_intervals,
           CAST(coalesce(sum(CASE WHEN conc > 0 THEN span END), 0) AS BIGINT)
             AS covered_us,
           CAST(max(conc) AS BIGINT) AS max_concurrency
    FROM swept GROUP BY bucket
    """,
)
def _q_interval_coverage_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-UTC-day union coverage and peak concurrency of ALL user
    sessions (`iv.coverage_sweep`): how much wall-clock each day had
    ≥1 active session anywhere in the system, and the day's maximum
    number of simultaneously-active sessions — the sweep-line
    interval-union classic, distributed by day-bucketing the
    intervals instead of the textbook single global sort.

    Scale shape: sessions split at day boundaries (explode fan-out =
    days spanned, ~1 for session-length intervals), so every window is
    DAY-KEYED — skew rides the busiest day, never a keyless sort.
    Tie order at equal timestamps is irrelevant by construction
    (deltas are net-summed per timestamp before the running sum), so
    the result is engine-exact with no ordering caveats."""
    sess = ag.sessionize_user_events(_table(spark, sf_dir, "events"), gap_minutes=30)
    ivl = sess.select(
        F.unix_micros(F.col("session_start").cast("timestamp")).alias("start_us"),
        F.unix_micros(F.col("session_end").cast("timestamp")).alias("end_us"),
    )
    return iv.coverage_sweep(ivl, bucket_us=iv.DAY_US)


# ---------------------------------------------------------------------------
# SCD2 state history + time-weighted average (window classics)
# ---------------------------------------------------------------------------


@register(
    "scd2_user_state_history",
    """
    WITH e AS (
      SELECT user_id, epoch_us(ts) AS t_us, event_id, event_type FROM events
    ),
    m AS (
      SELECT *,
             CASE WHEN lag(event_type) OVER w IS NULL
                       OR lag(event_type) OVER w <> event_type
                  THEN 1 ELSE 0 END AS chg
      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t_us, event_id)
    ),
    v AS (
      SELECT *, sum(chg) OVER (
        PARTITION BY user_id ORDER BY t_us, event_id
        ROWS UNBOUNDED PRECEDING
      ) AS version
      FROM m
    ),
    g AS (
      SELECT user_id, version,
             min(event_type) AS event_type,
             min(t_us) AS valid_from_us,
             count(*) AS n_events
      FROM v GROUP BY user_id, version
    )
    SELECT user_id, CAST(version AS BIGINT) AS version, event_type,
           valid_from_us,
           lead(valid_from_us) OVER wv AS valid_to_us,
           lead(valid_from_us) OVER wv IS NULL AS is_current,
           CAST(n_events AS BIGINT) AS n_events
    FROM g WINDOW wv AS (PARTITION BY user_id ORDER BY version)
    """,
)
def _q_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type-2 history build: compress each
    user's event stream into state-change runs (consecutive same
    event_type collapse) and emit validity intervals — valid_from /
    valid_to (null = current) / is_current — the batch upsert-history
    complement to `cdc_latest_event_per_user_type`'s keep-latest
    compaction.

    Plan: lag + running sum share ONE (user, t, id) window pass, the
    run-collapse is a map-side-combinable agg on the same key, and the
    valid_to lead runs over the already-collapsed version table (rows
    = state changes, not events). Everything is user-keyed — no global
    sort; the history table this builds is exactly the as-of-joinable
    dimension shape (`p7_asof_lookup` consumes such intervals)."""
    e = _events_us(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy(
        F.col("t_us").asc(), F.col("event_id").asc()
    )
    chg = F.when(
        F.lag("event_type", 1).over(w).isNull()
        | (F.lag("event_type", 1).over(w) != F.col("event_type")),
        1,
    ).otherwise(0)
    v = e.select(
        "user_id", "t_us", "event_id", "event_type", chg.alias("__chg")
    ).withColumn(
        "version",
        F.sum("__chg").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    g = v.groupBy("user_id", "version").agg(
        F.min("event_type").alias("event_type"),
        F.min("t_us").alias("valid_from_us"),
        F.count(F.lit(1)).alias("n_events"),
    )
    wv = Window.partitionBy("user_id").orderBy(F.col("version").asc())
    nxt = F.lead("valid_from_us", 1).over(wv)
    return g.select(
        "user_id",
        F.col("version").cast("long").alias("version"),
        "event_type",
        "valid_from_us",
        nxt.alias("valid_to_us"),
        nxt.isNull().alias("is_current"),
        F.col("n_events").cast("long").alias("n_events"),
    )


_TWAP_HOUR_US = 3_600_000_000


@register(
    "twap_value_by_user_hour",
    f"""
    WITH e AS (
      SELECT user_id, epoch_us(ts) AS t_us, event_id,
             CAST(floor(value * 10000.0 + 0.5) AS BIGINT) AS v4
      FROM events
    ),
    d AS (
      SELECT user_id, t_us, v4,
             lead(t_us) OVER (
               PARTITION BY user_id ORDER BY t_us, event_id
             ) - t_us AS dur
      FROM e
    )
    SELECT user_id,
           t_us - (t_us % {_TWAP_HOUR_US}) AS hour_us,
           CAST(count(*) AS BIGINT) AS n_samples,
           CAST(sum(dur) AS BIGINT) AS held_us,
           {R("CAST(sum(CAST(v4 AS DECIMAL(38,0)) * dur) AS DOUBLE) / (CAST(sum(dur) AS DOUBLE) * 10000.0)", 6)} AS twap
    FROM d
    WHERE dur IS NOT NULL AND dur > 0
    GROUP BY user_id, hour_us
    """,
)
def _q_twap_by_user_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average value per (user, hour): each sample is
    weighted by how long it was the CURRENT value (duration to the
    next sample — the held interval), the standard TWAP/position-
    weighting that plain AVG gets wrong on irregular sampling.

    Integer-exact inside: value scaled to int(4 dp), the held
    duration is integer micros, and Σ v4·dur accumulates in
    DECIMAL(38,0) (a year-held 10³-magnitude value is ~10²¹ — past
    bigint, Spark non-ANSI would wrap silently); ONE double division
    at the end, then the shared rounding grid. Plan: one user-keyed
    window for the lead, one (user, hour) aggregation — attribution
    is to the hour the sample STARTED in (no interval splitting;
    the split variant is `iv.coverage_sweep`'s job)."""
    e = _events_us(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy(
        F.col("t_us").asc(), F.col("event_id").asc()
    )
    from time_series_data_trimmer_spark.operators.timeseries import _scaled_int

    d = e.select(
        "user_id",
        "t_us",
        _scaled_int(F.col("value")).alias("__v4"),
        (F.lead("t_us", 1).over(w) - F.col("t_us")).alias("__dur"),
    ).filter(F.col("__dur").isNotNull() & (F.col("__dur") > 0))
    return (
        d.groupBy(
            "user_id",
            (F.col("t_us") - F.col("t_us") % F.lit(_TWAP_HOUR_US)).alias("hour_us"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_samples"),
            F.sum("__dur").alias("__held"),
            F.sum(F.col("__v4").cast("decimal(38,0)") * F.col("__dur")).alias("__num"),
        )
        .select(
            "user_id",
            "hour_us",
            F.col("n_samples").cast("long").alias("n_samples"),
            F.col("__held").cast("long").alias("held_us"),
            rd(
                F.col("__num").cast("double")
                / (F.col("__held").cast("double") * F.lit(1e4)),
                6,
            ).alias("twap"),
        )
    )


# ---------------------------------------------------------------------------
# Document-level co-occurrence lift (PMI's exact-rational core)
# ---------------------------------------------------------------------------

_COOC_MIN_DF, _COOC_MIN_XY = 25, 10


@register(
    "text_cooc_lift_pairs",
    f"""
    WITH toks AS (
      SELECT DISTINCT d.doc_id, t.token
      FROM documents d,
           LATERAL (SELECT unnest(string_split(trim(d.text), ' ')) AS token) t
      WHERE d.text IS NOT NULL AND len(t.token) > 0
    ),
    dfreq AS (
      SELECT token, count(*) AS df FROM toks GROUP BY token
      HAVING count(*) >= {_COOC_MIN_DF}
    ),
    gated AS (
      SELECT t.doc_id, t.token, f.df
      FROM toks t JOIN dfreq f USING (token)
    ),
    pairs AS (
      SELECT a.token AS tok_a, b.token AS tok_b,
             min(a.df) AS c_x, min(b.df) AS c_y,
             count(*) AS c_xy
      FROM gated a JOIN gated b
        ON a.doc_id = b.doc_id AND a.token < b.token
      GROUP BY a.token, b.token
      HAVING count(*) >= {_COOC_MIN_XY}
    ),
    n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM toks)
    SELECT tok_a, tok_b,
           CAST(c_xy AS BIGINT) AS c_xy,
           CAST(c_x AS BIGINT) AS c_x,
           CAST(c_y AS BIGINT) AS c_y,
           {R("CAST(n_docs * c_xy AS DOUBLE) / (CAST(c_x AS DOUBLE) * c_y)", 6)} AS lift
    FROM pairs CROSS JOIN n
    """,
)
def _q_cooc_lift_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token co-occurrence lift at document level — the collocation /
    phrase-mining primitive: lift = N·c_xy / (c_x·c_y) (> 1 means the
    pair co-occurs more than independence predicts; PMI is its log,
    monotone, so ranking by lift IS ranking by PMI). The un-logged
    exact-rational form keeps the score a single IEEE division of
    exact integers — engine-identical, the `tfidf_top_terms`
    discipline (ln() is last-ulp ambiguous across engines).

    Scale bounds, both explicit knobs: the document-frequency gate
    (df ≥ {_COOC_MIN_DF}) bounds the vocabulary entering the pair join
    — df is computed on the already-distinct (doc, token) stream and
    joined back shuffle-hash on token (vocabulary-keyed, not
    occurrence-keyed); the per-doc pair fan is then |gated ∩ doc|²,
    quadratic only in the GATED per-doc vocabulary, and the support
    floor (c_xy ≥ {_COOC_MIN_XY}) bounds the output. N rides the
    sanctioned 1-row scalar broadcast."""
    docs = _table(spark, sf_dir, "documents")
    toks = (
        docs.filter(F.col("text").isNotNull())
        .select(
            "doc_id",
            F.explode(F.split(F.trim(F.col("text")), " ")).alias("token"),
        )
        .filter(F.length("token") > 0)
        .distinct()
    )
    dfreq = (
        toks.groupBy("token")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") >= _COOC_MIN_DF)
    )
    gated = toks.join(dfreq.hint("shuffle_hash"), "token").select(
        "doc_id", "token", "df"
    )
    a = gated.select(
        "doc_id", F.col("token").alias("tok_a"), F.col("df").alias("__dfa")
    )
    b = gated.select(
        "doc_id", F.col("token").alias("tok_b"), F.col("df").alias("__dfb")
    )
    pairs = (
        a.join(b.hint("shuffle_hash"), "doc_id")
        .filter(F.col("tok_a") < F.col("tok_b"))
        .groupBy("tok_a", "tok_b")
        .agg(
            F.min("__dfa").alias("c_x"),
            F.min("__dfb").alias("c_y"),
            F.count(F.lit(1)).alias("c_xy"),
        )
        .filter(F.col("c_xy") >= _COOC_MIN_XY)
    )
    n = toks.agg(F.countDistinct("doc_id").alias("n_docs"))
    return pairs.crossJoin(F.broadcast(n)).select(
        "tok_a",
        "tok_b",
        F.col("c_xy").cast("long").alias("c_xy"),
        F.col("c_x").cast("long").alias("c_x"),
        F.col("c_y").cast("long").alias("c_y"),
        rd(
            (F.col("n_docs") * F.col("c_xy")).cast("double")
            / (F.col("c_x").cast("double") * F.col("c_y")),
            6,
        ).alias("lift"),
    )


# ---------------------------------------------------------------------------
# Triangle counting over the co-occurrence graph (degree orientation)
# ---------------------------------------------------------------------------

_TRI_BLK_US = 600_000_000  # 10-minute co-occurrence block
_TRI_CAP = 12  # deterministic per-block cap (sorted-neighborhood rule)


@register(
    "graph_triangle_count_cooc",
    f"""
    WITH d AS (
      SELECT DISTINCT user_id, event_type,
             epoch_us(ts) // {_TRI_BLK_US} AS blk
      FROM events
    ),
    capped AS (
      SELECT user_id, event_type, blk
      FROM (
        SELECT *, row_number() OVER (
                 PARTITION BY event_type, blk ORDER BY user_id
               ) AS rn
        FROM d
      ) WHERE rn <= {_TRI_CAP}
    ),
    canon AS (
      SELECT DISTINCT x.user_id AS a, y.user_id AS b
      FROM capped x JOIN capped y
        ON x.event_type = y.event_type AND x.blk = y.blk
       AND x.user_id < y.user_id
    ),
    deg AS (
      SELECT v, count(*) AS deg FROM (
        SELECT a AS v FROM canon UNION ALL SELECT b AS v FROM canon
      ) GROUP BY v
    ),
    o AS (
      SELECT CASE WHEN da.deg < db.deg OR (da.deg = db.deg AND c.a < c.b)
                  THEN c.a ELSE c.b END AS u,
             CASE WHEN da.deg < db.deg OR (da.deg = db.deg AND c.a < c.b)
                  THEN c.b ELSE c.a END AS w
      FROM canon c
      JOIN deg da ON da.v = c.a
      JOIN deg db ON db.v = c.b
    ),
    wedges AS (
      SELECT l.w AS a, r.w AS b
      FROM o l JOIN o r ON l.u = r.u AND l.w < r.w
    ),
    closed AS (
      SELECT w.a FROM wedges w JOIN canon c ON c.a = w.a AND c.b = w.b
    )
    SELECT (SELECT count(*) FROM deg) AS n_vertices,
           (SELECT count(*) FROM canon) AS n_edges,
           (SELECT max(n) FROM (SELECT u, count(*) AS n FROM o GROUP BY u)) AS max_out_degree,
           (SELECT count(*) FROM wedges) AS n_wedges,
           (SELECT count(*) FROM closed) AS n_triangles
    """,
)
def _q_triangle_count_cooc(spark: SparkSession, sf_dir: str) -> DataFrame:
    f"""Triangles in the user co-occurrence graph: users are adjacent
    iff they produced the same event_type inside the same 10-minute
    block (distinct-collapsed first, so a chatty user adds no fan),
    with the per-block sorted-neighborhood cap ({_TRI_CAP} lowest
    user_ids) bounding candidate pairs at block² — the same
    bounded-blocks rule every dedup blocker in this repo follows.
    Counting itself is `graph.triangle_count`: degree orientation
    caps the wedge fan at O(sqrt(m)) per vertex, so no celebrity hub
    can recreate the curse of the last reducer at 100 TB."""
    from time_series_data_trimmer_spark.operators import graph as _gr

    ev = _events(spark, sf_dir)
    d = ev.select(
        "user_id",
        "event_type",
        F.expr(f"unix_micros(cast(ts as timestamp)) div {_TRI_BLK_US}").alias("blk"),
    ).distinct()
    wcap = Window.partitionBy("event_type", "blk").orderBy("user_id")
    capped = (
        d.withColumn("rn", F.row_number().over(wcap))
        .filter(F.col("rn") <= _TRI_CAP)
        .drop("rn")
    )
    rhs = capped.select(
        F.col("user_id").alias("ub"), "event_type", "blk"
    )
    edges = (
        capped.join(rhs.hint("shuffle_hash"), ["event_type", "blk"])
        .filter(F.col("user_id") < F.col("ub"))
        .select(F.col("user_id").alias("src"), F.col("ub").alias("dst"))
    )
    return _gr.triangle_count(edges)


# ---------------------------------------------------------------------------
# Markov transition matrix + staged funnel over the event stream
# ---------------------------------------------------------------------------


@register(
    "markov_event_transitions",
    f"""
    WITH o AS (
      SELECT user_id, event_type,
             lead(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
             ) AS nxt
      FROM events
    ),
    c AS (
      SELECT event_type AS src, nxt AS dst, count(*) AS n
      FROM o WHERE nxt IS NOT NULL GROUP BY 1, 2
    ),
    t AS (SELECT src, sum(n) AS tot FROM c GROUP BY src)
    SELECT c.src, c.dst, c.n,
           {R("CAST(c.n AS DOUBLE) / CAST(t.tot AS DOUBLE)", 6)} AS p
    FROM c JOIN t ON t.src = c.src
    """,
)
def _q_markov_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix of the event-type chain
    per user: one keyed window (user, time order) for the successor,
    then a vocabulary-bounded aggregation — the output is |types|²
    rows no matter how many events flow through, so the shuffle after
    the map-side combine is O(types² · partitions), not O(N). The
    row-normalizing total joins back on the |types|-row side. The
    probability is a single IEEE division of two exact counts —
    engine-identical before the 6-dp round."""
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    o = ev.select(
        "user_id", "event_type", F.lead("event_type").over(w).alias("nxt")
    ).filter(F.col("nxt").isNotNull())
    c = o.groupBy(
        F.col("event_type").alias("src"), F.col("nxt").alias("dst")
    ).agg(F.count(F.lit(1)).alias("n"))
    t = c.groupBy("src").agg(F.sum("n").alias("tot"))
    return c.join(t.hint("shuffle_hash"), "src").select(
        "src",
        "dst",
        "n",
        rd(F.col("n").cast("double") / F.col("tot").cast("double"), 6).alias("p"),
    )


_FUNNEL_STAGES = ("view", "click", "purchase")


@register(
    "funnel_staged_conversions",
    f"""
    WITH e AS (
      SELECT user_id, event_type, epoch_us(ts) AS us FROM events
    ),
    s1 AS (
      SELECT user_id, min(us) AS t1 FROM e
      WHERE event_type = '{_FUNNEL_STAGES[0]}' GROUP BY user_id
    ),
    s2 AS (
      SELECT e.user_id, min(e.us) AS t2
      FROM e JOIN s1 ON s1.user_id = e.user_id AND e.us > s1.t1
      WHERE e.event_type = '{_FUNNEL_STAGES[1]}' GROUP BY e.user_id
    ),
    s3 AS (
      SELECT e.user_id, min(e.us) AS t3
      FROM e JOIN s2 ON s2.user_id = e.user_id AND e.us > s2.t2
      WHERE e.event_type = '{_FUNNEL_STAGES[2]}' GROUP BY e.user_id
    )
    SELECT 1 AS stage, '{_FUNNEL_STAGES[0]}' AS event_type,
           (SELECT count(*) FROM s1) AS users
    UNION ALL
    SELECT 2, '{_FUNNEL_STAGES[1]}', (SELECT count(*) FROM s2)
    UNION ALL
    SELECT 3, '{_FUNNEL_STAGES[2]}', (SELECT count(*) FROM s3)
    """,
)
def _q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel (view -> click -> purchase): a user
    converts at stage k iff a stage-k event exists STRICTLY after
    their earliest stage-(k-1) conversion time. Each stage is one
    filter + keyed min-aggregation + one user-keyed shuffle-hash join
    onto the previous stage's (user, t) pairs — every exchange keys on
    user_id so the chain reuses one partitioning, and no window or
    per-user event array ever materializes. Stage sizes are
    monotonically shrinking, so later joins get cheaper, not costlier."""
    ev = _events(spark, sf_dir).select(
        "user_id",
        "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
    )
    cur = (
        ev.filter(F.col("event_type") == _FUNNEL_STAGES[0])
        .groupBy("user_id")
        .agg(F.min("us").alias("t"))
    )
    counts = [cur.agg(F.count(F.lit(1)).alias("users"))]
    for stage in _FUNNEL_STAGES[1:]:
        cur = (
            ev.filter(F.col("event_type") == stage)
            .join(cur.hint("shuffle_hash"), "user_id")
            .filter(F.col("us") > F.col("t"))
            .groupBy("user_id")
            .agg(F.min("us").alias("t"))
        )
        counts.append(cur.agg(F.count(F.lit(1)).alias("users")))
    rows = None
    for i, (stage, cnt) in enumerate(zip(_FUNNEL_STAGES, counts), start=1):
        row = cnt.select(
            F.lit(i).alias("stage"),
            F.lit(stage).alias("event_type"),
            F.col("users"),
        )
        rows = row if rows is None else rows.unionAll(row)
    return rows


# ---------------------------------------------------------------------------
# PAA + SAX symbolization (ts.sax_symbols)
# ---------------------------------------------------------------------------

_SAX_W = 16  # rows per PAA segment
_SAX_B = ts.SAX_BREAKPOINTS_4


@register(
    "ts_sax_symbols",
    f"""
    WITH e AS (
      SELECT user_id, epoch_us(ts) AS t_us, event_id,
             CAST(floor(value * 10000.0 + 0.5) AS BIGINT) AS sv
      FROM events
    ),
    seg AS (
      SELECT user_id, sv,
             (row_number() OVER (
                PARTITION BY user_id ORDER BY t_us, event_id
              ) - 1) // {_SAX_W} AS seg
      FROM e
    ),
    paa AS (
      SELECT user_id, seg, count(*) AS n, sum(sv) AS ssum
      FROM seg GROUP BY user_id, seg
    ),
    st AS (
      SELECT user_id, count(*) AS tn, sum(sv) AS s1,
             sum(CAST(sv AS DECIMAL(38,0)) * sv) AS s2
      FROM seg GROUP BY user_id
    ),
    z AS (
      SELECT p.user_id, p.seg, p.n,
             CASE WHEN (CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / tn) / tn <= 0.0
                  THEN 0.0
                  ELSE (CAST(ssum AS DOUBLE) / n - CAST(s1 AS DOUBLE) / tn)
                       / sqrt((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / tn) / tn)
             END AS zv
      FROM paa p JOIN st ON st.user_id = p.user_id
    )
    SELECT user_id, seg, n, {R("zv", 6)} AS z,
           CASE WHEN zv < {_SAX_B[0]!r} THEN 'a'
                WHEN zv < {_SAX_B[1]!r} THEN 'b'
                WHEN zv < {_SAX_B[2]!r} THEN 'c'
                ELSE 'd' END AS symbol
    FROM z
    """,
)
def _q_ts_sax(spark: SparkSession, sf_dir: str) -> DataFrame:
    f"""SAX symbolic representation (`ts.sax_symbols`, Lin/Keogh 2003):
    {_SAX_W}-row PAA segments z-normalized per trial and mapped to the
    4-letter standard-normal-quartile alphabet — the representation
    that turns petabyte series into strings motif/discord mining can
    index. One exchange on the trial key; every moment derives from
    exact scaled-integer sums, so z and the breakpoint comparisons are
    engine-identical IEEE expressions over exact inputs."""
    e = _events_us(spark, sf_dir)
    return ts.sax_symbols(e, segment_rows=_SAX_W)


# ---------------------------------------------------------------------------
# Matryoshka two-tier ANN (prefix-dim prune -> exact full-dim rerank)
# ---------------------------------------------------------------------------

_MAT_PREFIX = 8
_MAT_SHORT = 40
_MAT_K = 10


@register(
    "sim_matryoshka_topk",
    f"""
    WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
    ex AS ({_EX_SQL}),
    qx AS (
      SELECT u['i'] AS i, CAST(u['v'] AS DOUBLE) AS y
      FROM (SELECT unnest(list_transform(qv, (x, i) -> {{'v': x, 'i': i}})) AS u
            FROM q)
    ),
    cdots AS (
      SELECT e.vec_id,
             sum(CAST({sql_rd("e.x * qx.y", 9)} AS DECIMAL(38,9))) AS dxy,
             sum(CAST({sql_rd("e.x * e.x", 9)} AS DECIMAL(38,9))) AS dxx,
             sum(CAST({sql_rd("qx.y * qx.y", 9)} AS DECIMAL(38,9))) AS dyy
      FROM ex e JOIN qx ON e.i = qx.i
      WHERE e.i <= {_MAT_PREFIX}
      GROUP BY e.vec_id
    ),
    short AS (
      SELECT vec_id,
             {R("CAST(dxy AS DOUBLE) / (sqrt(CAST(dxx AS DOUBLE)) * sqrt(CAST(dyy AS DOUBLE)))", 6)} AS coarse_cosine
      FROM cdots
      ORDER BY coarse_cosine DESC, vec_id ASC
      LIMIT {_MAT_SHORT}
    ),
    fdots AS (
      SELECT e.vec_id,
             sum(CAST({sql_rd("e.x * qx.y", 9)} AS DECIMAL(38,9))) AS dxy,
             sum(CAST({sql_rd("e.x * e.x", 9)} AS DECIMAL(38,9))) AS dxx,
             sum(CAST({sql_rd("qx.y * qx.y", 9)} AS DECIMAL(38,9))) AS dyy
      FROM ex e
      JOIN short s ON s.vec_id = e.vec_id
      JOIN qx ON e.i = qx.i
      GROUP BY e.vec_id
    )
    SELECT s.vec_id, s.coarse_cosine,
           {R("CAST(f.dxy AS DOUBLE) / (sqrt(CAST(f.dxx AS DOUBLE)) * sqrt(CAST(f.dyy AS DOUBLE)))", 6)} AS cosine
    FROM short s JOIN fdots f ON f.vec_id = s.vec_id
    ORDER BY cosine DESC, s.vec_id ASC
    LIMIT {_MAT_K}
    """,
)
def _q_matryoshka_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    f"""Matryoshka two-tier ANN (`sim.matryoshka_topk`): coarse cosine
    on the first {_MAT_PREFIX} of 64 dims over ALL vectors (an 8×
    byte-read reduction that becomes full-column pruning when the
    prefix is stored as its own column), deterministic
    top-{_MAT_SHORT} shortlist, exact decimal full-dim rerank of the
    shortlist only — SemDeDup's float-prune/exact-verify discipline
    applied to retrieval."""
    emb = _table(spark, sf_dir, "embeddings")
    qvec = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    return sim.matryoshka_topk(
        emb, qvec, k=_MAT_K, prefix_dims=_MAT_PREFIX, shortlist=_MAT_SHORT
    )


# ---------------------------------------------------------------------------
# Per-source token entropy (tx.token_entropy)
# ---------------------------------------------------------------------------


@register(
    "text_token_entropy_by_source",
    f"""
    WITH toks AS (
      SELECT source AS grp, t.token
      FROM documents,
           LATERAL (SELECT unnest(string_split(trim(text), ' ')) AS token) t
      WHERE text IS NOT NULL AND len(t.token) > 0
    ),
    tf AS (SELECT grp, token, count(*) AS c FROM toks GROUP BY grp, token),
    tot AS (SELECT grp, sum(c) AS n, count(*) AS vocab FROM tf GROUP BY grp),
    e AS (
      SELECT tf.grp, max(tot.n) AS n_tokens, max(tot.vocab) AS vocab,
             CAST(sum(CAST({sql_rd(
                 "-(CAST(c AS DOUBLE) / CAST(n AS DOUBLE))"
                 " * log2(CAST(c AS DOUBLE) / CAST(n AS DOUBLE))", 6
             )} AS DECIMAL(38,6))) AS DOUBLE) AS h
      FROM tf JOIN tot ON tot.grp = tf.grp
      GROUP BY tf.grp
    )
    SELECT grp AS source, CAST(n_tokens AS BIGINT) AS n_tokens, vocab,
           {R("h", 6)} AS entropy_bits,
           {R("CASE WHEN vocab <= 1 THEN 0.0 ELSE h / log2(CAST(vocab AS DOUBLE)) END", 6)} AS norm_entropy
    FROM e
    """,
)
def _q_token_entropy_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-slice diversity: Shannon token entropy + log2(vocab)-
    normalized evenness per document source (`tx.token_entropy`) —
    the blend-health metric a 100 TB pretraining mix is monitored by.
    Vocabulary-bounded shuffles only; see the operator docstring for
    the log2 determinism discipline (6-dp terms, decimal sum)."""
    return tx.token_entropy(_table(spark, sf_dir, "documents"), group_col="source")


# ---------------------------------------------------------------------------
# Classical seasonal decomposition (ts.seasonal_decompose_hourly)
# ---------------------------------------------------------------------------

_SD_HOUR_US = 3_600_000_000


@register(
    "ts_seasonal_decompose",
    f"""
    WITH e AS (
      SELECT user_id, epoch_us(ts) // {_SD_HOUR_US} AS bucket,
             CAST(floor(value * 10000.0 + 0.5) AS BIGINT) AS sv
      FROM events
    ),
    b AS (
      SELECT user_id, bucket, count(*) AS n, sum(sv) AS ssum
      FROM e GROUP BY user_id, bucket
    ),
    t AS (
      SELECT *, sum(ssum) OVER w AS tsum, sum(n) OVER w AS tn
      FROM b WINDOW w AS (
        PARTITION BY user_id ORDER BY bucket
        ROWS BETWEEN 12 PRECEDING AND 11 FOLLOWING
      )
    ),
    d AS (
      SELECT user_id, bucket, bucket % 24 AS hour_of_day,
             {R("CAST(ssum AS DOUBLE) / n / 10000.0", 6)} AS hourly,
             {R("CAST(tsum AS DOUBLE) / tn / 10000.0", 6)} AS trend,
             {R("CAST(ssum AS DOUBLE) / n / 10000.0 - CAST(tsum AS DOUBLE) / tn / 10000.0", 6)} AS dd
      FROM t
    ),
    s AS (
      SELECT *,
             {R("CAST(sum(CAST(dd AS DECIMAL(38,6))) OVER ws AS DOUBLE) / count(*) OVER ws", 6)} AS seasonal
      FROM d WINDOW ws AS (PARTITION BY user_id, hour_of_day)
    )
    SELECT user_id, bucket, hour_of_day, hourly, trend, seasonal,
           {R("dd - seasonal", 6)} AS residual
    FROM s
    """,
)
def _q_ts_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical additive decomposition of each trial's hourly series
    (`ts.seasonal_decompose_hourly`): ratio-of-integer-sums trend over
    a centered 24-bucket row frame, hour-of-day seasonal means on the
    6-dp decimal grid, residual — STL's skeleton with every averaging
    step order-independent. One exchange on the trial key; the bucket
    aggregation, both row-frame windows, and the (trial, hour-of-day)
    seasonal window all reuse it."""
    e = _events_us(spark, sf_dir)
    return ts.seasonal_decompose_hourly(e)


# ---------------------------------------------------------------------------
# 1-NN label-agreement audit (sim.knn_label_agreement)
# ---------------------------------------------------------------------------


_KNN_MAX_BITS = 24  # plane pool upper bound for the adaptive rule


def _knn_bits(n: int) -> int:
    """N-adaptive hyperplane count: bits = max(base, ceil(log2 N) - 4)
    -> expected bucket occupancy ~2^4 stays CONSTANT as the corpus
    grows, so candidate volume per table is O(N), not O(N^2 / 2^bits).
    The same derived-from-a-count rule as SemDeDup's k (reproduced in
    the oracle via log2 of the exact count; ceil is ulp-safe because
    log2 of an exact power of two is exact and anything else is far
    from an integer)."""
    import math

    return max(_EMB_BITS, int(math.ceil(math.log2(max(n, 2)))) - 4)


@register(
    "emb_label_knn_agreement",
    f"""
    WITH ex AS ({_EX_SQL}),
    bitsv AS (
      SELECT greatest({_EMB_BITS},
                      CAST(ceil(log2(CAST(count(*) AS DOUBLE))) AS INTEGER) - 4)
             AS bits
      FROM embeddings
    ),
    planes AS (
      SELECT t.t, b.b, i.i,
             ('0x' || substr(md5('tsdt|t' || t.t || '|' || b.b || '|' || i.i), 1, 8))::BIGINT
               / 2147483648.0 - 1.0 AS w
      FROM generate_series(0, {_KNN_MAX_BITS - 1}) b(b)
      CROSS JOIN bitsv
      JOIN generate_series(0, {_EMB_TABLES - 1}) t(t) ON TRUE
      JOIN generate_series(0, {_EMB_DIM - 1}) i(i) ON TRUE
      WHERE b.b < bitsv.bits
    ),
    pdots AS (
      SELECT e.vec_id, p.t, p.b,
             CAST(sum(CAST({sql_rd("e.x * p.w", 9)} AS DECIMAL(38,9))) AS DOUBLE) AS d
      FROM ex e JOIN planes p ON p.i = e.i - 1
      GROUP BY e.vec_id, p.t, p.b
    ),
    sigs AS (
      SELECT vec_id, t,
             sum(CASE WHEN d > 0 THEN CAST(1 AS BIGINT) << b ELSE 0 END) AS sig
      FROM pdots GROUP BY vec_id, t
    ),
    cand AS (
      SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
      FROM sigs a JOIN sigs b ON a.t = b.t AND a.sig = b.sig AND a.vec_id < b.vec_id
    ),
    norms AS (
      SELECT vec_id, sqrt(CAST(sum(CAST({sql_rd("x * x", 9)} AS DECIMAL(38,9))) AS DOUBLE)) AS nrm
      FROM ex GROUP BY vec_id
    ),
    scored AS (
      SELECT c.id_a, c.id_b,
             {R("CAST(sum(CAST(" + sql_rd("ea.x * eb.x", 9) + " AS DECIMAL(38,9))) AS DOUBLE) / (max(na.nrm) * max(nb.nrm))", 6)} AS cos
      FROM cand c
      JOIN ex ea ON ea.vec_id = c.id_a
      JOIN ex eb ON eb.vec_id = c.id_b AND eb.i = ea.i
      JOIN norms na ON na.vec_id = c.id_a
      JOIN norms nb ON nb.vec_id = c.id_b
      GROUP BY c.id_a, c.id_b
    ),
    sym AS (
      SELECT id_a AS vid, id_b AS nbr, cos FROM scored
      UNION ALL
      SELECT id_b AS vid, id_a AS nbr, cos FROM scored
    ),
    top1 AS (
      SELECT vid, nbr FROM sym
      QUALIFY row_number() OVER (
        PARTITION BY vid ORDER BY cos DESC, nbr ASC
      ) = 1
    ),
    j AS (
      SELECT e.label AS lbl, t.nbr, n.label AS nbr_lbl
      FROM embeddings e
      LEFT JOIN top1 t ON t.vid = e.vec_id
      LEFT JOIN embeddings n ON n.vec_id = t.nbr
    )
    SELECT lbl AS label,
           count(*) AS n_vecs,
           count(*) FILTER (WHERE nbr IS NOT NULL) AS n_scored,
           count(*) FILTER (WHERE nbr_lbl = lbl) AS n_agree,
           {R("CASE WHEN count(*) FILTER (WHERE nbr IS NOT NULL) = 0 THEN 0.0"
              " ELSE CAST(count(*) FILTER (WHERE nbr_lbl = lbl) AS DOUBLE)"
              " / count(*) FILTER (WHERE nbr IS NOT NULL) END", 6)} AS agreement
    FROM j GROUP BY lbl
    """,
)
def _q_emb_label_knn_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-NN label-consistency audit (`sim.knn_label_agreement`): each
    vector's nearest LSH-blocked neighbor (exact decimal cosine,
    rounded before ranking) votes on its label; per-label agreement
    below the corpus norm flags label noise / cross-class duplication
    before anyone trains on it. Same bounded candidate generation as
    the blocked dedup path; the oracle replays the full blocked
    algorithm, planes and all."""
    emb = _table(spark, sf_dir, "embeddings")
    bits = _knn_bits(emb.count())
    return sim.knn_label_agreement(
        emb, bits=bits, tables=_EMB_TABLES, dim=_EMB_DIM
    )


# ---------------------------------------------------------------------------
# Zipf exponent per source (closed-form OLS in log-log space)
# ---------------------------------------------------------------------------

_ZIPF_TOP = 64  # ranks fitted (vocabulary-bounded; full vocab here)


@register(
    "text_zipf_slope_by_source",
    f"""
    WITH toks AS (
      SELECT source, t.token
      FROM documents,
           LATERAL (SELECT unnest(string_split(trim(text), ' ')) AS token) t
      WHERE text IS NOT NULL AND len(t.token) > 0
    ),
    tf AS (SELECT source, token, count(*) AS c FROM toks GROUP BY source, token),
    ranked AS (
      SELECT source, c,
             row_number() OVER (
               PARTITION BY source ORDER BY c DESC, token ASC
             ) AS rnk
      FROM tf
    ),
    pts AS (
      SELECT source,
             {sql_rd("log2(CAST(rnk AS DOUBLE))", 9)} AS x,
             {sql_rd("log2(CAST(c AS DOUBLE))", 9)} AS y
      FROM ranked WHERE rnk <= {_ZIPF_TOP}
    ),
    s AS (
      SELECT source, count(*) AS n,
             CAST(sum(CAST(x AS DECIMAL(38,9))) AS DOUBLE) AS sx,
             CAST(sum(CAST(y AS DECIMAL(38,9))) AS DOUBLE) AS sy,
             CAST(sum(CAST({sql_rd("x * y", 9)} AS DECIMAL(38,9))) AS DOUBLE) AS sxy,
             CAST(sum(CAST({sql_rd("x * x", 9)} AS DECIMAL(38,9))) AS DOUBLE) AS sxx
      FROM pts GROUP BY source
    )
    SELECT source, CAST(n AS BIGINT) AS n_ranks,
           {R("(n * sxy - sx * sy) / (n * sxx - sx * sx)", 6)} AS zipf_slope
    FROM s WHERE n > 1
    """,
)
def _q_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    f"""Zipf exponent per corpus slice: OLS slope of log2(freq) on
    log2(rank) over the top {_ZIPF_TOP} ranks — natural language sits
    near −1; a slice drifting toward 0 is template/boilerplate spam
    and a slice plunging below −1.5 is a collapsed vocabulary. The
    closed-form detrend discipline (F6) in log-log space: 9-dp-rounded
    terms, decimal sums, one final IEEE division — and the fit is
    rank-bounded, so corpus size only touches the first aggregation."""
    docs = _table(spark, sf_dir, "documents")
    toks = (
        docs.filter(F.col("text").isNotNull())
        .select(
            "source",
            F.explode(F.split(F.trim(F.col("text")), " ")).alias("token"),
        )
        .filter(F.length("token") > 0)
    )
    tf = toks.groupBy("source", "token").agg(F.count(F.lit(1)).alias("c"))
    wr = Window.partitionBy("source").orderBy(
        F.col("c").desc(), F.col("token").asc()
    )
    pts = (
        tf.withColumn("rnk", F.row_number().over(wr))
        .filter(F.col("rnk") <= _ZIPF_TOP)
        .select(
            "source",
            rd(F.log2(F.col("rnk").cast("double")), 9).alias("x"),
            rd(F.log2(F.col("c").cast("double")), 9).alias("y"),
        )
    )
    s = pts.groupBy("source").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("x").cast("decimal(38,9)")).cast("double").alias("sx"),
        F.sum(F.col("y").cast("decimal(38,9)")).cast("double").alias("sy"),
        F.sum(rd(F.col("x") * F.col("y"), 9).cast("decimal(38,9)"))
        .cast("double")
        .alias("sxy"),
        F.sum(rd(F.col("x") * F.col("x"), 9).cast("decimal(38,9)"))
        .cast("double")
        .alias("sxx"),
    )
    return s.filter(F.col("n") > 1).select(
        "source",
        F.col("n").cast("long").alias("n_ranks"),
        rd(
            (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
            / (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")),
            6,
        ).alias("zipf_slope"),
    )


# ---------------------------------------------------------------------------
# Streaming ordered funnel (stream_ops.stream_funnel)
# ---------------------------------------------------------------------------


@register(
    "stream_funnel_users",
    f"""
    WITH e AS (
      SELECT user_id, event_type, epoch_us(ts) AS us FROM events
      WHERE event_type IN ('view', 'click', 'purchase')
    ),
    s1 AS (
      SELECT user_id, min(us) AS t1 FROM e
      WHERE event_type = 'view' GROUP BY user_id
    ),
    s2 AS (
      SELECT e.user_id, min(e.us) AS t2
      FROM e JOIN s1 ON s1.user_id = e.user_id AND e.us > s1.t1
      WHERE e.event_type = 'click' GROUP BY e.user_id
    ),
    s3 AS (
      SELECT e.user_id, min(e.us) AS t3
      FROM e JOIN s2 ON s2.user_id = e.user_id AND e.us > s2.t2
      WHERE e.event_type = 'purchase' GROUP BY e.user_id
    ),
    u AS (SELECT DISTINCT user_id FROM e)
    SELECT u.user_id,
           CAST(CASE WHEN t3 IS NOT NULL THEN 3
                     WHEN t2 IS NOT NULL THEN 2
                     WHEN t1 IS NOT NULL THEN 1
                     ELSE 0 END AS INTEGER) AS stage_reached,
           s1.t1 AS t1_us, s2.t2 AS t2_us, s3.t3 AS t3_us
    FROM u
    LEFT JOIN s1 ON s1.user_id = u.user_id
    LEFT JOIN s2 ON s2.user_id = u.user_id
    LEFT JOIN s3 ON s3.user_id = u.user_id
    """,
)
def _q_stream_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming ordered funnel (`stream_ops.stream_funnel`): a
    constant-size per-user state machine in GroupState latches the
    earliest strictly-after timestamp of each stage across
    micro-batches; with event-time-ordered arrival the final emission
    equals the batch staged-min-join answer row for row, which is what
    the oracle checks. The batch funnel reports the aggregate
    (stage, users) counts; this one keeps per-user conversion times —
    the row-level feed a real-time attribution sink consumes."""
    from time_series_data_trimmer_spark.streaming.stream_ops import stream_funnel

    return stream_funnel(spark, os.path.join(sf_dir, "events.parquet"))


# ---------------------------------------------------------------------------
# Sequential patterns: top session event-type trigrams
# ---------------------------------------------------------------------------

_SEQ_GAP_US = 1_800_000_000  # the repo's standing 30-min session rule
_SEQ_TOPK = 20


@register(
    "seq_topk_event_trigrams",
    f"""
    WITH e AS (
      SELECT user_id, event_id, event_type, epoch_us(ts) AS us FROM events
    ),
    m AS (
      SELECT *,
             CASE WHEN lag(us) OVER w IS NULL
                       OR us - lag(us) OVER w > {_SEQ_GAP_US}
                  THEN 1 ELSE 0 END AS newf
      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
    ),
    s AS (
      SELECT *,
             sum(newf) OVER (
               PARTITION BY user_id ORDER BY us, event_id
               ROWS UNBOUNDED PRECEDING
             ) AS sess
      FROM m
    ),
    g AS (
      SELECT event_type AS t1,
             lead(event_type, 1) OVER ws AS t2,
             lead(event_type, 2) OVER ws AS t3
      FROM s WINDOW ws AS (PARTITION BY user_id, sess ORDER BY us, event_id)
    )
    SELECT t1, t2, t3, count(*) AS n
    FROM g WHERE t2 IS NOT NULL AND t3 IS NOT NULL
    GROUP BY t1, t2, t3
    ORDER BY n DESC, t1 ASC, t2 ASC, t3 ASC
    LIMIT {_SEQ_TOPK}
    """,
)
def _q_seq_topk_event_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    f"""Sequential-pattern mining, the bounded-alphabet case: the
    corpus's most common within-session event-type TRIGRAM paths
    (30-min-gap sessions, the repo's standing rule). The n-gram stream
    comes from two lead() calls on the SAME (user, session) window the
    sessionizer already sorted — no explode, no self-join — and the
    aggregation output is |types|³-bounded regardless of corpus size,
    so the final top-{_SEQ_TOPK} is a TakeOrdered over at most 125
    rows. One exchange on the user key end to end."""
    ev = _events(spark, sf_dir).select(
        "user_id",
        "event_id",
        "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
    )
    wo = Window.partitionBy("user_id").orderBy("us", "event_id")
    m = ev.withColumn(
        "newf",
        F.when(
            F.lag("us").over(wo).isNull()
            | ((F.col("us") - F.lag("us").over(wo)) > _SEQ_GAP_US),
            1,
        ).otherwise(0),
    )
    s = m.withColumn(
        "sess",
        F.sum("newf").over(wo.rowsBetween(Window.unboundedPreceding, 0)),
    )
    ws = Window.partitionBy("user_id", "sess").orderBy("us", "event_id")
    g = s.select(
        F.col("event_type").alias("t1"),
        F.lead("event_type", 1).over(ws).alias("t2"),
        F.lead("event_type", 2).over(ws).alias("t3"),
    ).filter(F.col("t2").isNotNull() & F.col("t3").isNotNull())
    return (
        g.groupBy("t1", "t2", "t3")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(
            F.col("n").desc(),
            F.col("t1").asc(),
            F.col("t2").asc(),
            F.col("t3").asc(),
        )
        .limit(_SEQ_TOPK)
    )


# ---------------------------------------------------------------------------
# Storage-encoding advisor (layout.encoding_advisor)
# ---------------------------------------------------------------------------

_ENC_COLS = ("user_id", "event_type", "value")


def _enc_sql_one(col: str) -> str:
    return f"""
      SELECT '{col}' AS "column", count(*) AS n,
             count(DISTINCT {col}) AS ndv, sum(run) AS n_runs
      FROM (
        SELECT {col},
               CASE WHEN lag({col}) OVER w_{col} IS NULL
                         OR NOT ({col} IS NOT DISTINCT FROM lag({col}) OVER w_{col})
                    THEN 1 ELSE 0 END AS run
        FROM e WINDOW w_{col} AS (PARTITION BY user_id ORDER BY us, event_id)
      )
    """


@register(
    "layout_encoding_advisor",
    f"""
    WITH e AS (
      SELECT user_id, event_id, event_type, value, epoch_us(ts) AS us
      FROM events
    ),
    per AS (
      {" UNION ALL ".join(_enc_sql_one(c) for c in _ENC_COLS)}
    )
    SELECT "column", n, CAST(ndv AS BIGINT) AS ndv,
           CAST(n_runs AS BIGINT) AS n_runs,
           {R('CAST(n_runs AS DOUBLE) / n', 6)} AS rle_ratio,
           CAST(ceil(log2(CAST(ndv AS DOUBLE))) AS BIGINT) AS dict_bits
    FROM per
    """,
)
def _q_layout_encoding_advisor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Would re-clustering pay for itself? Exact RLE run counts and
    dictionary widths for the audited columns under the trial-
    clustered (user, time) sort (`layout.encoding_advisor`) — the
    byte-level complement of `scripts/zorder_prune.py`'s row-group
    study: user_id collapses to one run per trial, event_type to
    ~NDV-bounded runs, value stays incompressible; those three numbers
    ARE the re-layout cost/benefit at 100 TB. One window pass flags
    runs for all columns; output is len(columns) rows."""
    from time_series_data_trimmer_spark.operators import layout as ly

    ev = _events(spark, sf_dir).select(
        "user_id",
        "event_id",
        "event_type",
        "value",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
    )
    return ly.encoding_advisor(
        ev, list(_ENC_COLS), key_col="user_id", order_cols=("us", "event_id")
    )


# ---------------------------------------------------------------------------
# Distribution statistics: Spearman rank correlation + chi-square drift
# ---------------------------------------------------------------------------


_SPEARMAN_RHO_SQL = (
    "(n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy)"
    " / (sqrt(n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx)"
    " * sqrt(n * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy))"
)


@register(
    "stats_spearman_value_vs_hour",
    f"""
    WITH e AS (
      SELECT event_type,
             CAST(floor(value * 10000.0 + 0.5) AS BIGINT) AS xv,
             (epoch_us(ts) // 3600000000) % 24 AS yv
      FROM events
    ),
    rx AS (
      SELECT event_type, xv, yv,
             2 * rank() OVER (PARTITION BY event_type ORDER BY xv)
               + count(*) OVER (PARTITION BY event_type, xv) - 1 AS rx2,
             2 * rank() OVER (PARTITION BY event_type ORDER BY yv)
               + count(*) OVER (PARTITION BY event_type, yv) - 1 AS ry2
      FROM e
    ),
    s AS (
      SELECT event_type, count(*) AS n,
             sum(rx2) AS sx, sum(ry2) AS sy,
             sum(CAST(rx2 AS DECIMAL(38,0)) * ry2) AS sxy,
             sum(CAST(rx2 AS DECIMAL(38,0)) * rx2) AS sxx,
             sum(CAST(ry2 AS DECIMAL(38,0)) * ry2) AS syy
      FROM rx GROUP BY event_type
    )
    SELECT event_type, CAST(n AS BIGINT) AS n,
           {R(_SPEARMAN_RHO_SQL, 6)} AS spearman_rho
    FROM s
    """,
)
def _q_spearman(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation between value and hour-of-day per
    event type — the robust monotone-association screen (is this
    signal diurnal?). EXACT with no special functions: tie-averaged
    ranks are half-integers, so DOUBLED ranks are integers
    (2·avg_rank = 2·min_rank + ties − 1), every moment accumulates as
    an exact decimal, and rho is one IEEE expression over exact sums —
    the doubling cancels in the correlation. Two rank windows + one
    tie-count window on the same event_type-keyed exchange, then a
    |types|-row aggregate."""
    ev = _events(spark, sf_dir).select(
        "event_type",
        F.floor(F.col("value") * 10000.0 + 0.5).cast("long").alias("xv"),
        (
            F.expr("unix_micros(cast(ts as timestamp)) div 3600000000") % 24
        ).alias("yv"),
    )
    wp = Window.partitionBy("event_type")
    rx2 = (
        2 * F.rank().over(wp.orderBy("xv"))
        + F.count(F.lit(1)).over(Window.partitionBy("event_type", "xv"))
        - 1
    )
    ry2 = (
        2 * F.rank().over(wp.orderBy("yv"))
        + F.count(F.lit(1)).over(Window.partitionBy("event_type", "yv"))
        - 1
    )
    r = ev.select("event_type", rx2.alias("rx2"), ry2.alias("ry2"))
    s = r.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("rx2").alias("sx"),
        F.sum("ry2").alias("sy"),
        F.sum(F.col("rx2").cast("decimal(38,0)") * F.col("ry2")).alias("sxy"),
        F.sum(F.col("rx2").cast("decimal(38,0)") * F.col("rx2")).alias("sxx"),
        F.sum(F.col("ry2").cast("decimal(38,0)") * F.col("ry2")).alias("syy"),
    )
    return s.select(
        "event_type",
        F.col("n").cast("long").alias("n"),
        rd(
            (F.col("n") * F.col("sxy").cast("double") - F.col("sx").cast("double") * F.col("sy"))
            / (
                F.sqrt(F.col("n") * F.col("sxx").cast("double") - F.col("sx").cast("double") * F.col("sx"))
                * F.sqrt(F.col("n") * F.col("syy").cast("double") - F.col("sy").cast("double") * F.col("sy"))
            ),
            6,
        ).alias("spearman_rho"),
    )


@register(
    "stats_chi2_type_vs_hour",
    f"""
    WITH o AS (
      SELECT event_type, (epoch_us(ts) // 3600000000) % 24 AS hod,
             count(*) AS obs
      FROM events GROUP BY 1, 2
    ),
    rt AS (SELECT event_type, sum(obs) AS rtot FROM o GROUP BY event_type),
    ct AS (SELECT hod, sum(obs) AS ctot FROM o GROUP BY hod),
    g AS (SELECT sum(obs) AS total FROM o),
    grid AS (
      SELECT rt.event_type, ct.hod, rt.rtot, ct.ctot FROM rt CROSS JOIN ct
    ),
    cells AS (
      SELECT gr.event_type, gr.hod, COALESCE(o.obs, 0) AS obs,
             CAST(gr.rtot AS DOUBLE) * gr.ctot / g.total AS expected
      FROM grid gr
      LEFT JOIN o ON o.event_type = gr.event_type AND o.hod = gr.hod
      CROSS JOIN g
    )
    SELECT CAST(sum(CAST({sql_rd(
               "(obs - expected) * (obs - expected) / expected", 6
           )} AS DECIMAL(38,6))) AS DOUBLE) AS chi2,
           CAST((count(DISTINCT event_type) - 1)
                * (count(DISTINCT hod) - 1) AS BIGINT) AS dof,
           CAST(sum(obs) AS BIGINT) AS n
    FROM cells
    """,
)
def _q_chi2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson chi-square independence statistic for event_type ×
    hour-of-day — the categorical drift / association test a pipeline
    monitor runs on every ingest slice. Expected counts are one IEEE
    expression over exact integer margins; per-cell terms are
    6-dp-rounded and decimal-summed (order-independent); the
    margin-grid rebuild gives ZERO cells their expected mass — a
    type absent from an hour is evidence of dependence, not a row to
    drop (r9 fix, caught by the Cramér's-V perfect-association
    pytest). The
    contingency table is |types|·24 cells no matter how many rows
    scanned — margins and cells all ride map-side combines."""
    ev = _events(spark, sf_dir).select(
        "event_type",
        (
            F.expr("unix_micros(cast(ts as timestamp)) div 3600000000") % 24
        ).alias("hod"),
    )
    o = ev.groupBy("event_type", "hod").agg(F.count(F.lit(1)).alias("obs"))
    rt = o.groupBy("event_type").agg(F.sum("obs").alias("rtot"))
    ct = o.groupBy("hod").agg(F.sum("obs").alias("ctot"))
    g = o.agg(F.sum("obs").alias("total"))
    grid = rt.select(
        "event_type",
        "rtot",
        F.explode(F.sequence(F.lit(0).cast("long"), F.lit(23).cast("long"))).alias(
            "hod"
        ),
    ).join(F.broadcast(ct), "hod")
    cells = (
        grid.join(o.hint("shuffle_hash"), ["event_type", "hod"], "left")
        .crossJoin(F.broadcast(g))
        .select(
            "event_type",
            "hod",
            F.coalesce(F.col("obs"), F.lit(0)).alias("obs"),
            (
                F.col("rtot").cast("double") * F.col("ctot") / F.col("total")
            ).alias("expected"),
        )
    )
    return cells.agg(
        F.sum(
            rd(
                (F.col("obs") - F.col("expected"))
                * (F.col("obs") - F.col("expected"))
                / F.col("expected"),
                6,
            ).cast("decimal(38,6)")
        )
        .cast("double")
        .alias("chi2"),
        ((F.count_distinct(F.col("event_type")) - 1) * (F.count_distinct(F.col("hod")) - 1))
        .cast("long")
        .alias("dof"),
        F.sum("obs").cast("long").alias("n"),
    )


# ---------------------------------------------------------------------------
# Numeric drift: decile-matched 1-D Wasserstein between month halves
# ---------------------------------------------------------------------------

_W1_SPLIT_US = 1_705_276_800_000_000  # 2024-01-15 00:00:00 UTC


@register(
    "stats_w1_value_drift_by_type",
    f"""
    WITH e AS (
      SELECT event_type,
             CASE WHEN epoch_us(ts) < {_W1_SPLIT_US} THEN 0 ELSE 1 END AS half,
             CAST(floor(value * 10000.0 + 0.5) AS BIGINT) AS sv,
             event_id
      FROM events
    ),
    r AS (
      SELECT event_type, half, sv,
             row_number() OVER (
               PARTITION BY event_type, half ORDER BY sv, event_id
             ) AS rn,
             count(*) OVER (PARTITION BY event_type, half) AS n
      FROM e
    ),
    q AS (
      SELECT event_type, half, d.d AS decile, min(sv) AS qv, min(n) AS n
      FROM r JOIN generate_series(1, 9) d(d)
        ON r.rn = CAST(ceil(d.d * r.n / 10.0) AS BIGINT)
      GROUP BY event_type, half, d.d
    )
    SELECT a.event_type,
           CAST(max(a.n) AS BIGINT) AS n_first_half,
           CAST(max(b.n) AS BIGINT) AS n_second_half,
           {R("CAST(sum(abs(a.qv - b.qv)) AS DOUBLE) / 9.0 / 10000.0", 6)} AS w1_decile_drift
    FROM q a JOIN q b
      ON a.event_type = b.event_type AND a.decile = b.decile
     AND a.half = 0 AND b.half = 1
    GROUP BY a.event_type
    """,
)
def _q_w1_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Numeric distribution drift per event type: decile-matched 1-D
    Wasserstein distance between the month's two halves — chi-square
    (`stats_chi2_type_vs_hour`) covers the categorical axis, this one
    covers numeric columns, the pair every ingest monitor needs.
    Nearest-rank deciles over 4-dp scaled INTEGERS (rank windows on
    the (type, half) key, ties broken by event_id), so the nine
    quantile gaps are exact integer differences and the final score is
    one IEEE division. Output is |types| rows; quantile extraction is
    a rank filter, not a sort-collect."""
    ev = _events(spark, sf_dir).select(
        "event_type",
        F.when(
            F.expr("unix_micros(cast(ts as timestamp))") < _W1_SPLIT_US, 0
        )
        .otherwise(1)
        .alias("half"),
        F.floor(F.col("value") * 10000.0 + 0.5).cast("long").alias("sv"),
        "event_id",
    )
    w = Window.partitionBy("event_type", "half").orderBy("sv", "event_id")
    wc = Window.partitionBy("event_type", "half")
    r = ev.select(
        "event_type",
        "half",
        "sv",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wc).alias("n"),
    )
    # decile membership scan-side via explode(sequence) — a 9-row
    # dimension joined on a mixed-side expression would plan as an
    # unsanctioned BNLJ (caught by the plan sweep); exploding the 9
    # candidate deciles onto each narrow rank row keeps it join-free
    # (the text_vocab_growth idiom)
    q = (
        r.select(
            "event_type",
            "half",
            "sv",
            "rn",
            "n",
            F.explode(F.sequence(F.lit(1), F.lit(9))).alias("decile"),
        )
        .filter(
            F.col("rn")
            == F.ceil(F.col("decile") * F.col("n") / F.lit(10.0)).cast("long")
        )
        .groupBy("event_type", "half", "decile")
        .agg(F.min("sv").alias("qv"), F.min("n").alias("n"))
    )
    a = q.filter(F.col("half") == 0).select(
        "event_type", "decile", F.col("qv").alias("qa"), F.col("n").alias("na")
    )
    b = q.filter(F.col("half") == 1).select(
        "event_type", "decile", F.col("qv").alias("qb"), F.col("n").alias("nb")
    )
    return (
        a.join(b.hint("shuffle_hash"), ["event_type", "decile"])
        .groupBy("event_type")
        .agg(
            F.max("na").cast("long").alias("n_first_half"),
            F.max("nb").cast("long").alias("n_second_half"),
            rd(
                F.sum(F.abs(F.col("qa") - F.col("qb"))).cast("double")
                / 9.0
                / 10000.0,
                6,
            ).alias("w1_decile_drift"),
        )
    )


# ---------------------------------------------------------------------------
# Markov entropy rate (predictability of the event chain)
# ---------------------------------------------------------------------------


@register(
    "stats_markov_entropy_rate",
    f"""
    WITH o AS (
      SELECT user_id, event_type,
             lead(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
             ) AS nxt
      FROM events
    ),
    c AS (
      SELECT event_type AS src, nxt AS dst, count(*) AS n
      FROM o WHERE nxt IS NOT NULL GROUP BY 1, 2
    ),
    t AS (SELECT src, sum(n) AS tot FROM c GROUP BY src),
    g AS (SELECT sum(n) AS total FROM c)
    SELECT CAST(sum(CAST({sql_rd(
               "-(CAST(c.n AS DOUBLE) / g.total)"
               " * log2(CAST(c.n AS DOUBLE) / t.tot)", 6
           )} AS DECIMAL(38,6))) AS DOUBLE) AS entropy_rate_bits,
           CAST(max(g.total) AS BIGINT) AS n_transitions
    FROM c JOIN t ON t.src = c.src CROSS JOIN g
    """,
)
def _q_markov_entropy_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Empirical entropy rate of the event-type Markov chain:
    H = −Σ p(i,j)·log2 p(j|i) — how predictable the next event is
    given the current one (0 = deterministic flows, log2|types| =
    uniform noise). Composes the `markov_event_transitions` counts;
    everything after the transition aggregation is |types|² rows, with
    the bigram-LM log2 discipline (6-dp terms, decimal sum) and the
    corpus total riding the sanctioned 1-row broadcast."""
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    o = ev.select(
        "user_id", "event_type", F.lead("event_type").over(w).alias("nxt")
    ).filter(F.col("nxt").isNotNull())
    c = o.groupBy(
        F.col("event_type").alias("src"), F.col("nxt").alias("dst")
    ).agg(F.count(F.lit(1)).alias("n"))
    t = c.groupBy("src").agg(F.sum("n").alias("tot"))
    g = c.agg(F.sum("n").alias("total"))
    term = rd(
        -(F.col("n").cast("double") / F.col("total"))
        * F.log2(F.col("n").cast("double") / F.col("tot")),
        6,
    )
    return (
        c.join(t.hint("shuffle_hash"), "src")
        .crossJoin(F.broadcast(g))
        .agg(
            F.sum(term.cast("decimal(38,6)")).cast("double").alias("entropy_rate_bits"),
            F.max("total").cast("long").alias("n_transitions"),
        )
    )


# ---------------------------------------------------------------------------
# Label propagation over the semantic-similarity graph
# ---------------------------------------------------------------------------

_LP_ITERS = 2


@register(
    "graph_label_propagation_emb",
    f"""
    WITH ex AS ({_EX_SQL}),
    bitsv AS (
      SELECT greatest({_EMB_BITS},
                      CAST(ceil(log2(CAST(count(*) AS DOUBLE))) AS INTEGER) - 4)
             AS bits
      FROM embeddings
    ),
    planes AS (
      SELECT t.t, b.b, i.i,
             ('0x' || substr(md5('tsdt|t' || t.t || '|' || b.b || '|' || i.i), 1, 8))::BIGINT
               / 2147483648.0 - 1.0 AS w
      FROM generate_series(0, {_KNN_MAX_BITS - 1}) b(b)
      CROSS JOIN bitsv
      JOIN generate_series(0, {_EMB_TABLES - 1}) t(t) ON TRUE
      JOIN generate_series(0, {_EMB_DIM - 1}) i(i) ON TRUE
      WHERE b.b < bitsv.bits
    ),
    pdots AS (
      SELECT e.vec_id, p.t, p.b,
             CAST(sum(CAST({sql_rd("e.x * p.w", 9)} AS DECIMAL(38,9))) AS DOUBLE) AS d
      FROM ex e JOIN planes p ON p.i = e.i - 1
      GROUP BY e.vec_id, p.t, p.b
    ),
    sigs AS (
      SELECT vec_id, t,
             sum(CASE WHEN d > 0 THEN CAST(1 AS BIGINT) << b ELSE 0 END) AS sig
      FROM pdots GROUP BY vec_id, t
    ),
    cand AS (
      SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
      FROM sigs a JOIN sigs b ON a.t = b.t AND a.sig = b.sig AND a.vec_id < b.vec_id
    ),
    pairdots AS (
      SELECT c.id_a, c.id_b,
             sum(CAST({sql_rd("ea.x * eb.x", 9)} AS DECIMAL(38,9))) AS dxy
      FROM cand c
      JOIN ex ea ON ea.vec_id = c.id_a
      JOIN ex eb ON eb.vec_id = c.id_b AND eb.i = ea.i
      GROUP BY c.id_a, c.id_b
    ),
    norms AS (
      SELECT vec_id, sqrt(CAST(sum(CAST({sql_rd("x * x", 9)} AS DECIMAL(38,9))) AS DOUBLE)) AS nrm
      FROM ex GROUP BY vec_id
    ),
    edges AS (
      SELECT id_a, id_b FROM pairdots
      JOIN norms na ON na.vec_id = id_a
      JOIN norms nb ON nb.vec_id = id_b
      WHERE CAST(dxy AS DOUBLE) / (na.nrm * nb.nrm) >= {_EMB_CLUSTER_TAU}
    ),
    sym AS (
      SELECT id_a AS s, id_b AS d FROM edges
      UNION ALL
      SELECT id_b AS s, id_a AS d FROM edges
    ),
    l0 AS (SELECT vec_id AS node, label AS lbl FROM embeddings),
    v1 AS (
      SELECT e.d AS node, l.lbl, count(*) AS n
      FROM sym e JOIN l0 l ON l.node = e.s GROUP BY e.d, l.lbl
    ),
    w1 AS (
      SELECT node, lbl FROM v1
      QUALIFY row_number() OVER (PARTITION BY node ORDER BY n DESC, lbl ASC) = 1
    ),
    l1 AS (
      SELECT l0.node, coalesce(w1.lbl, l0.lbl) AS lbl
      FROM l0 LEFT JOIN w1 ON w1.node = l0.node
    ),
    v2 AS (
      SELECT e.d AS node, l.lbl, count(*) AS n
      FROM sym e JOIN l1 l ON l.node = e.s GROUP BY e.d, l.lbl
    ),
    w2 AS (
      SELECT node, lbl FROM v2
      QUALIFY row_number() OVER (PARTITION BY node ORDER BY n DESC, lbl ASC) = 1
    ),
    l2 AS (
      SELECT l1.node, coalesce(w2.lbl, l1.lbl) AS lbl
      FROM l1 LEFT JOIN w2 ON w2.node = l1.node
    )
    SELECT node AS vec_id, lbl AS label FROM l2
    """,
)
def _q_graph_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    f"""Majority-vote label propagation (`graph.label_propagation`,
    Raghavan et al. 2007) over the SAME thresholded semantic-similarity
    graph the embedding-cluster dedup uses (exact cosine >= τ on
    LSH-blocked candidates): {_LP_ITERS} synchronous rounds, smallest-
    label tie-break, isolated nodes keep their seed. The label-denoise
    step after `emb_label_knn_agreement` flags noise: neighbors vote
    the label smooth. Per round it is the PageRank plan with the sum
    swapped for a keyed mode — nothing O(V) leaves the executors."""
    emb = _table(spark, sf_dir, "embeddings")
    pairs = sim.threshold_similar_pairs_blocked(
        emb, tau=_EMB_CLUSTER_TAU, bits=_knn_bits(emb.count()),
        tables=_EMB_TABLES, dim=_EMB_DIM,
    )
    return gr.label_propagation(
        pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst")),
        emb.select("vec_id", "label"),
        iterations=_LP_ITERS,
        id_col="vec_id",
        label_col="label",
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


# ---------------------------------------------------------------------------
# Hard-negative mining for contrastive training
# ---------------------------------------------------------------------------

_HN_K = 2


@register(
    "emb_hard_negatives",
    f"""
    WITH ex AS ({_EX_SQL}),
    bitsv AS (
      SELECT greatest({_EMB_BITS},
                      CAST(ceil(log2(CAST(count(*) AS DOUBLE))) AS INTEGER) - 4)
             AS bits
      FROM embeddings
    ),
    planes AS (
      SELECT t.t, b.b, i.i,
             ('0x' || substr(md5('tsdt|t' || t.t || '|' || b.b || '|' || i.i), 1, 8))::BIGINT
               / 2147483648.0 - 1.0 AS w
      FROM generate_series(0, {_KNN_MAX_BITS - 1}) b(b)
      CROSS JOIN bitsv
      JOIN generate_series(0, {_EMB_TABLES - 1}) t(t) ON TRUE
      JOIN generate_series(0, {_EMB_DIM - 1}) i(i) ON TRUE
      WHERE b.b < bitsv.bits
    ),
    pdots AS (
      SELECT e.vec_id, p.t, p.b,
             CAST(sum(CAST({sql_rd("e.x * p.w", 9)} AS DECIMAL(38,9))) AS DOUBLE) AS d
      FROM ex e JOIN planes p ON p.i = e.i - 1
      GROUP BY e.vec_id, p.t, p.b
    ),
    sigs AS (
      SELECT vec_id, t,
             sum(CASE WHEN d > 0 THEN CAST(1 AS BIGINT) << b ELSE 0 END) AS sig
      FROM pdots GROUP BY vec_id, t
    ),
    cand AS (
      SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
      FROM sigs a JOIN sigs b ON a.t = b.t AND a.sig = b.sig AND a.vec_id < b.vec_id
    ),
    norms AS (
      SELECT vec_id, sqrt(CAST(sum(CAST({sql_rd("x * x", 9)} AS DECIMAL(38,9))) AS DOUBLE)) AS nrm
      FROM ex GROUP BY vec_id
    ),
    scored AS (
      SELECT c.id_a, c.id_b,
             {R("CAST(sum(CAST(" + sql_rd("ea.x * eb.x", 9) + " AS DECIMAL(38,9))) AS DOUBLE) / (max(na.nrm) * max(nb.nrm))", 6)} AS cos
      FROM cand c
      JOIN ex ea ON ea.vec_id = c.id_a
      JOIN ex eb ON eb.vec_id = c.id_b AND eb.i = ea.i
      JOIN norms na ON na.vec_id = c.id_a
      JOIN norms nb ON nb.vec_id = c.id_b
      GROUP BY c.id_a, c.id_b
    ),
    sym AS (
      SELECT id_a AS vid, id_b AS nbr, cos FROM scored
      UNION ALL
      SELECT id_b AS vid, id_a AS nbr, cos FROM scored
    ),
    lbl AS (SELECT vec_id, label FROM embeddings),
    hard AS (
      SELECT s.vid AS vec_id, la.label, s.nbr AS neg_id,
             lb.label AS neg_label, s.cos AS cosine,
             row_number() OVER (
               PARTITION BY s.vid ORDER BY s.cos DESC, s.nbr ASC
             ) AS rank
      FROM sym s
      JOIN lbl la ON la.vec_id = s.vid
      JOIN lbl lb ON lb.vec_id = s.nbr
      WHERE la.label <> lb.label
    )
    SELECT vec_id, label, CAST(rank AS INT) AS rank, neg_id, neg_label, cosine
    FROM hard WHERE rank <= {_HN_K}
    """,
)
def _q_emb_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    f"""Hard-negative mining for contrastive training: each vector's
    top-{_HN_K} highest-cosine DIFFERENT-label neighbors from the
    LSH-blocked candidate set (N-adaptive bits, the `_knn_bits` rule) —
    the negatives that actually move an embedding model, mined without
    an all-pairs pass. Exact decimal cosines rounded before ranking,
    per-anchor keyed window, label joins on the id key. Same bounded
    candidate volume as the blocked dedup/audit paths."""
    emb = _table(spark, sf_dir, "embeddings")
    bits = _knn_bits(emb.count())
    cand = sim.lsh_candidate_pairs(
        emb, _EMB_DIM, bits, _EMB_TABLES, "vec_id", "embedding"
    )
    base = emb.select(
        "vec_id",
        F.col("embedding").alias("__v"),
        F.sqrt(sim.decimal_dot(F.col("embedding"), F.col("embedding"))).alias(
            "__nrm"
        ),
    )
    a = base.select(
        F.col("vec_id").alias("id_a"),
        F.col("__v").alias("va"),
        F.col("__nrm").alias("na"),
    )
    b = base.select(
        F.col("vec_id").alias("id_b"),
        F.col("__v").alias("vb"),
        F.col("__nrm").alias("nb"),
    )
    scored = (
        cand.join(a.hint("shuffle_hash"), "id_a")
        .join(b.hint("shuffle_hash"), "id_b")
        .select(
            "id_a",
            "id_b",
            rd(
                sim.decimal_dot(F.col("va"), F.col("vb"))
                / (F.col("na") * F.col("nb")),
                6,
            ).alias("cos"),
        )
    )
    sym = scored.select(
        F.col("id_a").alias("vec_id"), F.col("id_b").alias("nbr"), "cos"
    ).unionAll(
        scored.select(
            F.col("id_b").alias("vec_id"), F.col("id_a").alias("nbr"), "cos"
        )
    )
    la = emb.select("vec_id", "label")
    lb = emb.select(
        F.col("vec_id").alias("nbr"), F.col("label").alias("neg_label")
    )
    hard = (
        sym.join(la.hint("shuffle_hash"), "vec_id")
        .join(lb.hint("shuffle_hash"), "nbr")
        .filter(F.col("label") != F.col("neg_label"))
    )
    w = Window.partitionBy("vec_id").orderBy(F.col("cos").desc(), F.col("nbr").asc())
    return (
        hard.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _HN_K)
        .select(
            "vec_id",
            "label",
            F.col("rank").cast("int").alias("rank"),
            F.col("nbr").alias("neg_id"),
            "neg_label",
            F.col("cos").alias("cosine"),
        )
    )


# ---------------------------------------------------------------------------
# Seasonal-naive forecast baseline + MASE (forecastability audit)
# ---------------------------------------------------------------------------


@register(
    "ts_seasonal_naive_mase",
    f"""
    WITH e AS (
      SELECT user_id, epoch_us(ts) // 3600000000 AS b,
             CAST(floor(value * 10000.0 + 0.5) AS BIGINT) AS sv
      FROM events
    ),
    h AS (
      SELECT user_id, b, sum(sv) AS s, count(*) AS n FROM e GROUP BY user_id, b
    ),
    season AS (
      SELECT a.user_id,
             abs(CAST(a.s AS DOUBLE) / a.n - CAST(p.s AS DOUBLE) / p.n) AS err
      FROM h a JOIN h p ON p.user_id = a.user_id AND p.b = a.b - 24
    ),
    naive AS (
      SELECT a.user_id,
             abs(CAST(a.s AS DOUBLE) / a.n - CAST(p.s AS DOUBLE) / p.n) AS err
      FROM h a JOIN h p ON p.user_id = a.user_id AND p.b = a.b - 1
    ),
    sa AS (
      SELECT user_id, count(*) AS n_forecasts,
             CAST(sum(CAST({sql_rd("err", 6)} AS DECIMAL(38,6))) AS DOUBLE)
               / count(*) AS mae_seasonal
      FROM season GROUP BY user_id
    ),
    na AS (
      SELECT user_id, count(*) AS n_naive,
             CAST(sum(CAST({sql_rd("err", 6)} AS DECIMAL(38,6))) AS DOUBLE)
               / count(*) AS mae_naive1
      FROM naive GROUP BY user_id
    )
    SELECT sa.user_id, CAST(sa.n_forecasts AS BIGINT) AS n_forecasts,
           {R("sa.mae_seasonal / 10000.0", 6)} AS mae_seasonal,
           {R("na.mae_naive1 / 10000.0", 6)} AS mae_naive1,
           {R("CASE WHEN na.mae_naive1 = 0.0 THEN 0.0"
              " ELSE sa.mae_seasonal / na.mae_naive1 END", 6)} AS mase
    FROM sa JOIN na ON na.user_id = sa.user_id
    """,
)
def _q_ts_seasonal_naive_mase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecastability audit: seasonal-naive (same hour yesterday)
    hourly forecast per trial, scored as MASE against the calendar
    1-hour naive (Hyndman & Koehler 2006) — MASE < 1 means the daily
    cycle genuinely predicts the signal, the go/no-go number before
    anyone trains a forecaster on 100 TB of telemetry. Calendar
    alignment is two EQUI self-joins on (trial, bucket−k) — no row
    frames, so sampling gaps can't smear the season — and every error
    is an IEEE expression over exact integer bucket sums, 6-dp rounded
    and decimal-accumulated."""
    ev = _events(spark, sf_dir).select(
        "user_id",
        F.expr("unix_micros(cast(ts as timestamp)) div 3600000000").alias("b"),
        F.floor(F.col("value") * 10000.0 + 0.5).cast("long").alias("sv"),
    )
    h = ev.groupBy("user_id", "b").agg(
        F.sum("sv").alias("s"), F.count(F.lit(1)).alias("n")
    )

    def _mae(lag: int, out: str):
        p = h.select(
            "user_id",
            (F.col("b") + lag).alias("b"),
            F.col("s").alias("ps"),
            F.col("n").alias("pn"),
        )
        j = h.join(p.hint("shuffle_hash"), ["user_id", "b"])
        err = F.abs(
            F.col("s").cast("double") / F.col("n")
            - F.col("ps").cast("double") / F.col("pn")
        )
        return j.groupBy("user_id").agg(
            F.count(F.lit(1)).alias(f"n_{out}"),
            (
                F.sum(rd(err, 6).cast("decimal(38,6)")).cast("double")
                / F.count(F.lit(1))
            ).alias(out),
        )

    sa = _mae(24, "mae_seasonal")
    na = _mae(1, "mae_naive1")
    return sa.join(na.hint("shuffle_hash"), "user_id").select(
        "user_id",
        F.col("n_mae_seasonal").cast("long").alias("n_forecasts"),
        rd(F.col("mae_seasonal") / 10000.0, 6).alias("mae_seasonal"),
        rd(F.col("mae_naive1") / 10000.0, 6).alias("mae_naive1"),
        rd(
            F.when(F.col("mae_naive1") == 0.0, F.lit(0.0)).otherwise(
                F.col("mae_seasonal") / F.col("mae_naive1")
            ),
            6,
        ).alias("mase"),
    )


# ---------------------------------------------------------------------------
# Sliding-window distinct users from KMV registers
# ---------------------------------------------------------------------------

_SLIDE_W = 24  # 24-hour sliding window
_SLIDE_K = 64


@register(
    "sketch_kmv_sliding_distinct_users",
    f"""
    WITH hashed AS (
      SELECT DISTINCT event_type AS g,
             epoch_us(ts) // 3600000000 AS b,
             {sp.sql_hash_u32("user_id", "tsdt|kmv")} AS u
      FROM events
    ),
    regs AS (
      SELECT g, b, u FROM (
        SELECT *, row_number() OVER (
                 PARTITION BY g, b ORDER BY u ASC
               ) AS rn
        FROM hashed
      ) WHERE rn <= {_SLIDE_K}
    ),
    spread AS (
      SELECT DISTINCT g, u, b + o.o AS window_end
      FROM regs CROSS JOIN generate_series(0, {_SLIDE_W - 1}) o(o)
    ),
    win AS (
      SELECT g, window_end, u FROM (
        SELECT *, row_number() OVER (
                 PARTITION BY g, window_end ORDER BY u ASC
               ) AS rn
        FROM spread
      ) WHERE rn <= {_SLIDE_K}
    ),
    kept AS (
      SELECT g, window_end, count(*) AS n_kept, max(u) AS kth
      FROM win GROUP BY g, window_end
    )
    SELECT g AS event_type, window_end, CAST(n_kept AS BIGINT) AS n_kept,
           {sql_rd(
               f"CASE WHEN n_kept < {_SLIDE_K} THEN CAST(n_kept AS DOUBLE)"
               f" ELSE {float(_SLIDE_K - 1)} * 4294967296.0 / CAST(kth AS DOUBLE) END",
               6,
           )} AS est_distinct
    FROM kept
    """,
)
def _q_kmv_sliding_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    f"""Distinct users per event type over a SLIDING {_SLIDE_W}-hour
    window, from KMV registers alone (`sketches.kmv_sliding_registers`)
    — exact sliding distinct rescans W hours of raw rows per window
    (O(W·N) total work); the register path reads each raw row ONCE and
    every window is a bottom-k merge of ≤ {_SLIDE_K} longs per bucket,
    bit-equal to sketching the window's raw rows directly (closure
    under union). The hourly-register explode is {_SLIDE_W} small longs
    per register row, scan-side. This is the capacity-planning curve
    ("active users, trailing day") a 100 TB event store can't afford
    exactly."""
    from time_series_data_trimmer_spark.operators import sketches as sk

    ev = _events(spark, sf_dir).select(
        "event_type",
        F.expr("unix_micros(cast(ts as timestamp)) div 3600000000").alias("b"),
        "user_id",
    )
    regs = sk.kmv_sliding_registers(
        ev, "event_type", "b", "user_id", window_buckets=_SLIDE_W, k=_SLIDE_K
    )
    kept = regs.groupBy("g", "window_end").agg(
        F.count(F.lit(1)).alias("n_kept"), F.max("u").alias("kth")
    )
    est = F.when(
        F.col("n_kept") < _SLIDE_K, F.col("n_kept").cast("double")
    ).otherwise(
        F.lit(float(_SLIDE_K - 1))
        * F.lit(4294967296.0)
        / F.col("kth").cast("double")
    )
    return kept.select(
        F.col("g").alias("event_type"),
        "window_end",
        F.col("n_kept").cast("long").alias("n_kept"),
        rd(est, 6).alias("est_distinct"),
    )


# ---------------------------------------------------------------------------
# Exact co-engagement matrix between event types
# ---------------------------------------------------------------------------


@register(
    "coengagement_type_pairs",
    f"""
    WITH d AS (SELECT DISTINCT user_id, event_type FROM events),
    c AS (SELECT event_type, count(*) AS n FROM d GROUP BY event_type),
    p AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b,
             count(*) AS n_both
      FROM d a JOIN d b
        ON a.user_id = b.user_id AND a.event_type < b.event_type
      GROUP BY 1, 2
    )
    SELECT p.type_a, p.type_b, p.n_both,
           ca.n AS n_a, cb.n AS n_b,
           {R("CAST(p.n_both AS DOUBLE) / (ca.n + cb.n - p.n_both)", 6)} AS jaccard
    FROM p
    JOIN c ca ON ca.event_type = p.type_a
    JOIN c cb ON cb.event_type = p.type_b
    """,
)
def _q_coengagement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact audience-overlap matrix between event types: distinct
    (user, type) pairs self-joined on the user key — per-user fan is
    |types| (bounded alphabet), so the join is O(N·|types|), never
    user-quadratic — with exact Jaccard from the inclusion-exclusion
    margins. The exact small-domain complement of
    `sketch_kmv_jaccard_sources` (which handles unbounded domains from
    registers alone). Output is |types|² rows."""
    ev = _events(spark, sf_dir)
    d = ev.select("user_id", "event_type").distinct()
    c = d.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    b = d.select("user_id", F.col("event_type").alias("type_b"))
    p = (
        d.select("user_id", F.col("event_type").alias("type_a"))
        .join(b.hint("shuffle_hash"), "user_id")
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).alias("n_both"))
    )
    ca = c.select(F.col("event_type").alias("type_a"), F.col("n").alias("n_a"))
    cb = c.select(F.col("event_type").alias("type_b"), F.col("n").alias("n_b"))
    return (
        p.join(ca.hint("shuffle_hash"), "type_a")
        .join(cb.hint("shuffle_hash"), "type_b")
        .select(
            "type_a",
            "type_b",
            "n_both",
            "n_a",
            "n_b",
            rd(
                F.col("n_both").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_both")),
                6,
            ).alias("jaccard"),
        )
    )


# ---------------------------------------------------------------------------
# As-of join with tolerance (pandas merge_asof parity)
# ---------------------------------------------------------------------------

_ASOF_TOL_S = 86_400.0  # 1-day staleness bound


@register(
    "asof_join_tolerance",
    f"""
    WITH l AS (
      SELECT user_id, event_id, epoch(ts) AS t
      FROM events WHERE event_type = 'click'
    ),
    r AS (
      SELECT user_id, epoch(ts) AS rt,
             max({sql_rd("value", 2)}) AS purchase_value
      FROM events WHERE event_type = 'purchase'
      GROUP BY user_id, epoch(ts)
    ),
    m AS (
      SELECT l.user_id, l.event_id, l.t,
             r.rt AS asof_t, r.purchase_value
      FROM l ASOF LEFT JOIN r
        ON l.user_id = r.user_id AND l.t >= r.rt
    )
    SELECT user_id, event_id, t,
           CASE WHEN t - asof_t <= {_ASOF_TOL_S} THEN asof_t END AS asof_t,
           CASE WHEN t - asof_t <= {_ASOF_TOL_S} THEN purchase_value END
             AS purchase_value
    FROM m
    """,
)
def _q_asof_join_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    f"""`asof_join_click_purchase` with a {_ASOF_TOL_S:.0f}-second
    staleness bound (`asof_join(tolerance=...)`, the
    `pandas.merge_asof(tolerance=...)` contract the reference's users
    already rely on): a purchase older than a day must NOT enrich a
    click — stale calibration is worse than none. Same one-exchange
    union-trick plan; the tolerance is a null-out post-filter on the
    matched struct, and the oracle applies the identical CASE over
    DuckDB's native ASOF."""
    ev = _events(spark, sf_dir)
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "event_id", "t"
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "t")
        .agg(F.max(rd(F.col("value"), 2)).alias("purchase_value"))
    )
    return edits.asof_join(
        clicks,
        purchases,
        key_cols=["user_id"],
        time_col="t",
        value_cols=["purchase_value"],
        tolerance=_ASOF_TOL_S,
    ).select("user_id", "event_id", "t", "asof_t", "purchase_value")


# ---------------------------------------------------------------------------
# Feature engineering: leave-one-out target encoding + quantile transform
# ---------------------------------------------------------------------------


@register(
    "feature_loo_target_encoding",
    f"""
    WITH e AS (
      SELECT event_id, event_type,
             CAST(floor(value * 10000.0 + 0.5) AS BIGINT) AS sv
      FROM events
    ),
    g AS (
      SELECT event_type, sum(sv) AS s, count(*) AS n FROM e GROUP BY event_type
    ),
    gstat AS (SELECT sum(sv) AS gs, count(*) AS gn FROM e)
    SELECT e.event_id, e.event_type,
           {R("CASE WHEN g.n <= 1"
              " THEN CAST(gstat.gs AS DOUBLE) / gstat.gn / 10000.0"
              " ELSE (CAST(g.s AS DOUBLE) - e.sv) / (g.n - 1) / 10000.0 END", 6)}
             AS loo_value_mean
    FROM e JOIN g ON g.event_type = e.event_type CROSS JOIN gstat
    """,
)
def _q_feature_loo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-out target encoding of event_type against value —
    the leakage-safe categorical encoding (each row's own target is
    subtracted from its category mean; singleton categories fall back
    to the global mean). Exact: integer sums per category, one IEEE
    expression per row; the category table joins back |types|-keyed
    and the global mean rides the sanctioned 1-row broadcast. The
    shape a feature pipeline runs over billions of rows without a
    window."""
    ev = _events(spark, sf_dir).select(
        "event_id",
        "event_type",
        F.floor(F.col("value") * 10000.0 + 0.5).cast("long").alias("sv"),
    )
    g = ev.groupBy("event_type").agg(
        F.sum("sv").alias("s"), F.count(F.lit(1)).alias("n")
    )
    glob = ev.agg(F.sum("sv").alias("gs"), F.count(F.lit(1)).alias("gn"))
    return (
        ev.join(g.hint("shuffle_hash"), "event_type")
        .crossJoin(F.broadcast(glob))
        .select(
            "event_id",
            "event_type",
            rd(
                F.when(
                    F.col("n") <= 1,
                    F.col("gs").cast("double") / F.col("gn") / 10000.0,
                ).otherwise(
                    (F.col("s").cast("double") - F.col("sv"))
                    / (F.col("n") - 1)
                    / 10000.0
                ),
                6,
            ).alias("loo_value_mean"),
        )
    )


@register(
    "feature_quantile_transform",
    f"""
    WITH e AS (
      SELECT event_id, event_type,
             CAST(floor(value * 10000.0 + 0.5) AS BIGINT) AS sv
      FROM events
    ),
    r AS (
      SELECT event_id, event_type,
             2 * rank() OVER (PARTITION BY event_type ORDER BY sv)
               + count(*) OVER (PARTITION BY event_type, sv) - 1 AS r2,
             count(*) OVER (PARTITION BY event_type) AS n
      FROM e
    )
    SELECT event_id, event_type,
           {R("CAST(r2 AS DOUBLE) / (2.0 * (n + 1))", 6)} AS q
    FROM r
    """,
)
def _q_feature_quantile_transform(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-category uniform quantile transform: tie-averaged rank /
    (n+1) in (0, 1) — the monotone, outlier-proof normalization that
    needs no distribution assumption. Same doubled-rank exactness as
    the Spearman operator (half-integer average ranks become
    integers), so every emitted quantile is one IEEE division of
    exact integers. Two rank windows on one event_type-keyed
    exchange."""
    ev = _events(spark, sf_dir).select(
        "event_id",
        "event_type",
        F.floor(F.col("value") * 10000.0 + 0.5).cast("long").alias("sv"),
    )
    wp = Window.partitionBy("event_type")
    r2 = (
        2 * F.rank().over(wp.orderBy("sv"))
        + F.count(F.lit(1)).over(Window.partitionBy("event_type", "sv"))
        - 1
    )
    return ev.select(
        "event_id",
        "event_type",
        rd(
            r2.cast("double")
            / (2.0 * (F.count(F.lit(1)).over(wp) + 1)),
            6,
        ).alias("q"),
    )


# ---------------------------------------------------------------------------
# Per-doc n-gram novelty (memorization-risk screen)
# ---------------------------------------------------------------------------


@register(
    "text_ngram_novelty",
    """
    WITH w AS (
      SELECT doc_id, string_split(trim(text), ' ') AS w FROM documents
      WHERE text IS NOT NULL
    ),
    g AS (
      SELECT DISTINCT doc_id,
             md5(array_to_string(w[i.i:i.i+2], ' ')) AS gd
      FROM w, LATERAL (SELECT unnest(generate_series(1, len(w) - 2)) AS i) i
      WHERE len(w) >= 3
    ),
    dfreq AS (SELECT gd, count(*) AS df FROM g GROUP BY gd)
    SELECT g.doc_id, count(*) AS n_grams,
           CAST(count(*) FILTER (WHERE dfreq.df <= 1) AS BIGINT) AS n_rare,
           CAST(floor(CAST(count(*) FILTER (WHERE dfreq.df <= 1) AS DOUBLE)
                      / count(*) * 1000000.0 + 0.5) AS DOUBLE) / 1000000.0
             AS novelty
    FROM g JOIN dfreq ON dfreq.gd = g.gd
    GROUP BY g.doc_id
    """,
)
def _q_text_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc trigram novelty (`tx.ngram_novelty`): the fraction of a
    doc's distinct trigrams appearing in exactly one document —
    keep-or-cut signal (high = unique content, ~0 = assembled
    boilerplate) and, inverted, the memorization-risk screen. Digests
    shuffle, text never does; document frequency is one digest-keyed
    count joined back on the same key."""
    return tx.ngram_novelty(_table(spark, sf_dir, "documents"), n=3, rare_df=1)


# ---------------------------------------------------------------------------
# Embedding isotropy / collapse report
# ---------------------------------------------------------------------------


@register(
    "emb_isotropy_report",
    f"""
    WITH ex AS ({_EX_SQL}),
    lbl AS (SELECT vec_id, label FROM embeddings),
    dimsum AS (
      SELECT l.label, e.i,
             CAST(sum(CAST({sql_rd("e.x", 9)} AS DECIMAL(38,9))) AS DOUBLE) AS s
      FROM ex e JOIN lbl l ON l.vec_id = e.vec_id
      GROUP BY l.label, e.i
    ),
    cnt AS (SELECT label, count(*) AS n FROM lbl GROUP BY label),
    mu AS (
      SELECT d.label,
             CAST(sum(CAST({sql_rd("(d.s / c.n) * (d.s / c.n)", 9)} AS DECIMAL(38,9))) AS DOUBLE) AS m2
      FROM dimsum d JOIN cnt c ON c.label = d.label
      GROUP BY d.label
    ),
    nrm AS (
      SELECT l.label,
             CAST(sum(CAST({sql_rd(
                 "sqrt(CAST(nd.d2 AS DOUBLE))", 6
             )} AS DECIMAL(38,6))) AS DOUBLE) AS nsum
      FROM (
        SELECT vec_id,
               sum(CAST({sql_rd("x * x", 9)} AS DECIMAL(38,9))) AS d2
        FROM ex GROUP BY vec_id
      ) nd JOIN lbl l ON l.vec_id = nd.vec_id
      GROUP BY l.label
    )
    SELECT c.label, CAST(c.n AS BIGINT) AS n,
           {R("nrm.nsum / c.n", 6)} AS mean_norm,
           {R("sqrt(mu.m2)", 6)} AS centroid_norm,
           {R("sqrt(mu.m2) / (nrm.nsum / c.n)", 6)} AS anisotropy
    FROM cnt c
    JOIN mu ON mu.label = c.label
    JOIN nrm ON nrm.label = c.label
    """,
)
def _q_emb_isotropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space collapse audit per label: mean vector norm,
    centroid norm, and their ratio (anisotropy: ~0 = directions
    cancel, healthy spread; ->1 = the class has collapsed onto one
    ray — the classic failure of a contrastive encoder, and exactly
    the audit run before trusting `dedup_semantic` at scale). Per-dim
    decimal sums are d-bounded (the `emb_covariance` discipline);
    per-row norms never explode — one `decimal_dot` per vector."""
    emb = _table(spark, sf_dir, "embeddings")
    exploded = emb.select(
        "label",
        F.posexplode(F.col("embedding")).alias("i", "x"),
    )
    dimsum = exploded.groupBy("label", "i").agg(
        F.sum(rd(F.col("x").cast("double"), 9).cast("decimal(38,9)"))
        .cast("double")
        .alias("s")
    )
    cnt = emb.groupBy("label").agg(F.count(F.lit(1)).alias("n"))
    mu = (
        dimsum.join(cnt.hint("shuffle_hash"), "label")
        .groupBy("label")
        .agg(
            F.sum(
                rd(
                    (F.col("s") / F.col("n")) * (F.col("s") / F.col("n")), 9
                ).cast("decimal(38,9)")
            )
            .cast("double")
            .alias("m2")
        )
    )
    nrm = (
        emb.select(
            "label",
            rd(
                F.sqrt(sim.decimal_dot(F.col("embedding"), F.col("embedding"))),
                6,
            ).alias("nv"),
        )
        .groupBy("label")
        .agg(
            F.sum(F.col("nv").cast("decimal(38,6)")).cast("double").alias("nsum")
        )
    )
    return (
        cnt.join(mu.hint("shuffle_hash"), "label")
        .join(nrm.hint("shuffle_hash"), "label")
        .select(
            "label",
            F.col("n").cast("long").alias("n"),
            rd(F.col("nsum") / F.col("n"), 6).alias("mean_norm"),
            rd(F.sqrt(F.col("m2")), 6).alias("centroid_norm"),
            rd(F.sqrt(F.col("m2")) / (F.col("nsum") / F.col("n")), 6).alias(
                "anisotropy"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Split-conformal interval width from seasonal-naive residuals
# ---------------------------------------------------------------------------

_CONF_ALPHA_NUM, _CONF_ALPHA_DEN = 1, 10  # alpha = 0.1 as an exact rational


@register(
    "ts_conformal_interval",
    f"""
    WITH e AS (
      SELECT user_id, epoch_us(ts) // 3600000000 AS b,
             CAST(floor(value * 10000.0 + 0.5) AS BIGINT) AS sv
      FROM events
    ),
    h AS (
      SELECT user_id, b, sum(sv) AS s, count(*) AS n FROM e GROUP BY user_id, b
    ),
    res AS (
      SELECT a.user_id,
             abs(CAST(a.s AS DOUBLE) / a.n - CAST(p.s AS DOUBLE) / p.n) AS r
      FROM h a JOIN h p ON p.user_id = a.user_id AND p.b = a.b - 24
    ),
    ranked AS (
      SELECT user_id, r,
             row_number() OVER (PARTITION BY user_id ORDER BY r, user_id) AS rn,
             count(*) OVER (PARTITION BY user_id) AS n
      FROM res
    )
    SELECT user_id, CAST(max(n) AS BIGINT) AS n_residuals,
           {R("max(CASE WHEN rn = CAST(ceil((n + 1) * (1.0 - 1.0 * "
              f"{_CONF_ALPHA_NUM} / {_CONF_ALPHA_DEN}) "
              ") AS BIGINT) THEN r END) / 10000.0", 6)} AS q_hat
    FROM ranked
    WHERE n + 1 >= CAST(ceil((n + 1) * (1.0 - 1.0 * {_CONF_ALPHA_NUM} / {_CONF_ALPHA_DEN})) AS BIGINT)
    GROUP BY user_id
    HAVING max(CASE WHEN rn = CAST(ceil((n + 1) * (1.0 - 1.0 * {_CONF_ALPHA_NUM} / {_CONF_ALPHA_DEN})) AS BIGINT) THEN r END) IS NOT NULL
    """,
)
def _q_ts_conformal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-conformal interval half-width per trial (Vovk et al.;
    the distribution-free uncertainty wrapper): q̂ = the
    ⌈(n+1)(1−α)⌉-th smallest absolute seasonal-naive residual, α=0.1 —
    forecast ± q̂ then covers ≥ 90% of future points with NO
    distributional assumption. Composes the MASE machinery's
    calendar-aligned residuals; the calibration quantile is a
    nearest-rank filter on one trial-keyed rank window (no
    sort-collect), trials with too few residuals for the rank drop
    out. Residuals are IEEE expressions over exact integer bucket
    sums, so the selected rank is engine-identical."""
    ev = _events(spark, sf_dir).select(
        "user_id",
        F.expr("unix_micros(cast(ts as timestamp)) div 3600000000").alias("b"),
        F.floor(F.col("value") * 10000.0 + 0.5).cast("long").alias("sv"),
    )
    h = ev.groupBy("user_id", "b").agg(
        F.sum("sv").alias("s"), F.count(F.lit(1)).alias("n")
    )
    p = h.select(
        "user_id",
        (F.col("b") + 24).alias("b"),
        F.col("s").alias("ps"),
        F.col("n").alias("pn"),
    )
    res = (
        h.join(p.hint("shuffle_hash"), ["user_id", "b"])
        .select(
            "user_id",
            F.abs(
                F.col("s").cast("double") / F.col("n")
                - F.col("ps").cast("double") / F.col("pn")
            ).alias("r"),
        )
    )
    w = Window.partitionBy("user_id").orderBy("r", "user_id")
    wc = Window.partitionBy("user_id")
    alpha = float(_CONF_ALPHA_NUM) / float(_CONF_ALPHA_DEN)
    ranked = res.select(
        "user_id",
        "r",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wc).alias("n"),
    )
    target = F.ceil((F.col("n") + 1) * (1.0 - F.lit(alpha))).cast("long")
    return (
        ranked.filter(F.col("rn") == target)
        .select(
            "user_id",
            F.col("n").cast("long").alias("n_residuals"),
            rd(F.col("r") / 10000.0, 6).alias("q_hat"),
        )
    )


# ---------------------------------------------------------------------------
# Robust aggregation: trimmed mean + Tukey IQR fences
# ---------------------------------------------------------------------------


@register(
    "stats_trimmed_mean_by_type",
    f"""
    WITH e AS (
      SELECT event_type, event_id,
             CAST(floor(value * 10000.0 + 0.5) AS BIGINT) AS sv
      FROM events
    ),
    r AS (
      SELECT event_type, sv,
             row_number() OVER (
               PARTITION BY event_type ORDER BY sv, event_id
             ) AS rn,
             count(*) OVER (PARTITION BY event_type) AS n
      FROM e
    )
    SELECT event_type, CAST(max(n) AS BIGINT) AS n,
           CAST(max(n) - 2 * (max(n) // 10) AS BIGINT) AS n_kept,
           {R("CAST(sum(CASE WHEN rn > n // 10 AND rn <= n - n // 10"
              " THEN sv END) AS DOUBLE)"
              " / (max(n) - 2 * (max(n) // 10)) / 10000.0", 6)} AS trimmed_mean,
           {R("CAST(sum(sv) AS DOUBLE) / max(n) / 10000.0", 6)} AS raw_mean
    FROM r GROUP BY event_type
    """,
)
def _q_trimmed_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10%-each-tail trimmed mean per event type — the robust location
    estimate that survives the fat tails a raw mean is wrecked by,
    next to the raw mean so the gap itself is the contamination
    signal. One rank window on the type key, then a conditional
    EXACT-integer sum — no second pass, no percentile interpolation
    (the trim boundary is a rank, so integer sums stay exact)."""
    ev = _events(spark, sf_dir).select(
        "event_type",
        "event_id",
        F.floor(F.col("value") * 10000.0 + 0.5).cast("long").alias("sv"),
    )
    w = Window.partitionBy("event_type").orderBy("sv", "event_id")
    wc = Window.partitionBy("event_type")
    r = ev.select(
        "event_type",
        "sv",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wc).alias("n"),
    )
    t = F.expr("n div 10")
    return r.groupBy("event_type").agg(
        F.max("n").cast("long").alias("n"),
        (F.max("n") - 2 * F.expr("max(n) div 10")).cast("long").alias("n_kept"),
        rd(
            F.sum(
                F.when((F.col("rn") > t) & (F.col("rn") <= F.col("n") - t), F.col("sv"))
            ).cast("double")
            / (F.max("n") - 2 * F.expr("max(n) div 10"))
            / 10000.0,
            6,
        ).alias("trimmed_mean"),
        rd(F.sum("sv").cast("double") / F.max("n") / 10000.0, 6).alias("raw_mean"),
    )


@register(
    "stats_iqr_fences_by_type",
    f"""
    WITH e AS (
      SELECT event_type, event_id,
             CAST(floor(value * 10000.0 + 0.5) AS BIGINT) AS sv
      FROM events
    ),
    r AS (
      SELECT event_type, sv,
             row_number() OVER (
               PARTITION BY event_type ORDER BY sv, event_id
             ) AS rn,
             count(*) OVER (PARTITION BY event_type) AS n
      FROM e
    ),
    q AS (
      SELECT event_type, max(n) AS n,
             max(CASE WHEN rn = CAST(ceil(0.25 * n) AS BIGINT) THEN sv END) AS q1,
             max(CASE WHEN rn = CAST(ceil(0.75 * n) AS BIGINT) THEN sv END) AS q3
      FROM r GROUP BY event_type
    ),
    f AS (
      SELECT event_type, n, q1, q3,
             q1 - 1.5 * (q3 - q1) AS lo, q3 + 1.5 * (q3 - q1) AS hi
      FROM q
    )
    SELECT f.event_type, CAST(f.n AS BIGINT) AS n,
           {R("max(f.q1) / 10000.0", 6)} AS q1,
           {R("max(f.q3) / 10000.0", 6)} AS q3,
           CAST(count(*) FILTER (WHERE r.sv < f.lo OR r.sv > f.hi) AS BIGINT)
             AS n_outliers
    FROM f JOIN r ON r.event_type = f.event_type
    GROUP BY f.event_type, f.n
    """,
)
def _q_iqr_fences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey box-plot fences per event type: nearest-rank Q1/Q3 on
    4-dp scaled integers, fences at ±1.5·IQR, and the exact count
    outside them — the third member of the robust-outlier family
    (σ-rule in A5, median/MAD in ts_mad_outliers). The fence compare
    is one IEEE expression over exact integers; the quartiles are rank
    filters on the same type-keyed window the trimmed mean uses."""
    ev = _events(spark, sf_dir).select(
        "event_type",
        "event_id",
        F.floor(F.col("value") * 10000.0 + 0.5).cast("long").alias("sv"),
    )
    w = Window.partitionBy("event_type").orderBy("sv", "event_id")
    wc = Window.partitionBy("event_type")
    r = ev.select(
        "event_type",
        "sv",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wc).alias("n"),
    )
    q = r.groupBy("event_type").agg(
        F.max("n").alias("n"),
        F.max(
            F.when(
                F.col("rn") == F.ceil(0.25 * F.col("n")).cast("long"), F.col("sv")
            )
        ).alias("q1"),
        F.max(
            F.when(
                F.col("rn") == F.ceil(0.75 * F.col("n")).cast("long"), F.col("sv")
            )
        ).alias("q3"),
    )
    f = q.select(
        "event_type",
        "n",
        "q1",
        "q3",
        (F.col("q1") - 1.5 * (F.col("q3") - F.col("q1"))).alias("lo"),
        (F.col("q3") + 1.5 * (F.col("q3") - F.col("q1"))).alias("hi"),
    )
    return (
        r.select("event_type", "sv")
        .join(f.hint("shuffle_hash"), "event_type")
        .groupBy("event_type")
        .agg(
            F.max(F.col("n")).cast("long").alias("n"),
            rd(F.max("q1").cast("double") / 10000.0, 6).alias("q1"),
            rd(F.max("q3").cast("double") / 10000.0, 6).alias("q3"),
            F.sum(
                F.when(
                    (F.col("sv") < F.col("lo")) | (F.col("sv") > F.col("hi")), 1
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_outliers"),
        )
    )


# ---------------------------------------------------------------------------
# Seasonal / trend strength (Hyndman STL-strength on the decomposition)
# ---------------------------------------------------------------------------

_SD_SQL = REGISTRY["ts_seasonal_decompose"][1]


def _sql_var(col: str) -> str:
    """Order-independent variance of a 6-dp column: decimal sums of the
    values and their 12-dp squared terms, one IEEE expression out."""
    s1 = f"CAST(sum(CAST(({col}) AS DECIMAL(38,6))) AS DOUBLE)"
    s2 = f"CAST(sum(CAST({sql_rd(f'({col}) * ({col})', 12)} AS DECIMAL(38,12))) AS DOUBLE)"
    return f"(({s2}) - ({s1}) * ({s1}) / count(*)) / count(*)"


@register(
    "ts_seasonal_strength",
    f"""
    WITH base AS ({_SD_SQL})
    SELECT user_id, CAST(count(*) AS BIGINT) AS n_buckets,
           {R("CASE WHEN " + _sql_var("seasonal + residual") + " <= 0.0 THEN 0.0"
              " ELSE greatest(0.0, 1.0 - (" + _sql_var("residual") + ")"
              " / (" + _sql_var("seasonal + residual") + ")) END", 6)}
             AS seasonal_strength,
           {R("CASE WHEN " + _sql_var("hourly - seasonal") + " <= 0.0 THEN 0.0"
              " ELSE greatest(0.0, 1.0 - (" + _sql_var("residual") + ")"
              " / (" + _sql_var("hourly - seasonal") + ")) END", 6)}
             AS trend_strength
    FROM base GROUP BY user_id
    """,
)
def _q_ts_seasonal_strength(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hyndman's decomposition-strength scores per trial (FPP3 §4.5):
    seasonal strength = 1 − var(R)/var(S+R), trend strength =
    1 − var(R)/var(T+R written as hourly−seasonal) — the two numbers
    that say whether `ts_seasonal_decompose`'s components are signal
    or noise, per trial, fleet-wide. Composes the registered
    decomposition (the oracle literally embeds its SQL); variances are
    decimal-accumulated over the decomposition's own 6-dp grid, so
    partial-agg order cannot move them."""
    base = REGISTRY["ts_seasonal_decompose"][0](spark, sf_dir)

    def var_of(col):
        s1 = F.sum(col.cast("decimal(38,6)")).cast("double")
        s2 = F.sum(rd(col * col, 12).cast("decimal(38,12)")).cast("double")
        n = F.count(F.lit(1))
        return (s2 - s1 * s1 / n) / n

    sr = F.col("seasonal") + F.col("residual")
    tr = F.col("hourly") - F.col("seasonal")
    res = F.col("residual")
    agg = base.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_buckets"),
        var_of(res).alias("__vr"),
        var_of(sr).alias("__vsr"),
        var_of(tr).alias("__vtr"),
    )
    return agg.select(
        "user_id",
        "n_buckets",
        rd(
            F.when(F.col("__vsr") <= 0.0, F.lit(0.0)).otherwise(
                F.greatest(F.lit(0.0), 1.0 - F.col("__vr") / F.col("__vsr"))
            ),
            6,
        ).alias("seasonal_strength"),
        rd(
            F.when(F.col("__vtr") <= 0.0, F.lit(0.0)).otherwise(
                F.greatest(F.lit(0.0), 1.0 - F.col("__vr") / F.col("__vtr"))
            ),
            6,
        ).alias("trend_strength"),
    )


# ---------------------------------------------------------------------------
# Data-quality expectations, sketch roll-ups, compaction planning
# ---------------------------------------------------------------------------


@register(
    "dq_expectations_report",
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
      UNION ALL
      SELECT 'priority_format',
             count(*) FILTER (WHERE o_orderpriority IS NOT NULL),
             count(*) FILTER (WHERE o_orderpriority IS NOT NULL
                              AND NOT regexp_matches(o_orderpriority, '^[1-3]-'))
      FROM orders
    ),
    uq AS (
      SELECT 'unique(o_orderkey)' AS rule,
             count(o_orderkey) AS n_checked,
             count(o_orderkey) - count(DISTINCT o_orderkey) AS n_violations
      FROM orders
    ),
    fk AS (
      SELECT 'fk(o_custkey)' AS rule,
             (SELECT count(*) FROM orders WHERE o_custkey IS NOT NULL) AS n_checked,
             (SELECT count(*) FROM orders o
              WHERE o.o_custkey IS NOT NULL
                AND NOT EXISTS (SELECT 1 FROM customer c
                                WHERE c.c_custkey = o.o_custkey)) AS n_violations
    ),
    allr AS (
      SELECT * FROM rr UNION ALL SELECT * FROM uq UNION ALL SELECT * FROM fk
    )
    SELECT rule, CAST(n_checked AS BIGINT) AS n_checked,
           CAST(n_violations AS BIGINT) AS n_violations,
           {R("CASE WHEN n_checked > 0 THEN CAST(n_violations AS DOUBLE)"
              " / CAST(n_checked AS DOUBLE) ELSE 0.0 END", 6)} AS violation_rate
    FROM allr
    """,
)
def _q_dq_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality gate over the orders drop
    (`quality.expectations_report`): null / range / set / format rules
    answered by ONE scan (the whole row-rule suite folds into a single
    map-side-combined aggregation, unpivoted via explode on the 1-row
    result — no per-rule re-scan, the thing Great-Expectations-style
    suites get wrong at 100 TB), plus the exact PK-uniqueness
    aggregation and the o_custkey → customer referential-integrity
    LEFT ANTI join (narrow key columns only). Range/set/format bounds
    are deliberately tight so the violation counters are exercised
    non-trivially on clean TPC-H data.

    Reference anchor: the reference's CSV bad-cell coercion + mask
    (data_model.py bad-mask path) generalized to declarative rule
    suites with per-rule accounting."""
    from time_series_data_trimmer_spark.operators import quality as dq

    orders = _table(spark, sf_dir, "orders")
    cust = _table(spark, sf_dir, "customer")
    return dq.expectations_report(
        orders,
        row_rules=[
            dq.not_null("o_custkey"),
            dq.in_range("o_totalprice", 0.0, 100000.0),
            dq.in_set("o_orderstatus", ["F", "O"]),
            dq.matches("o_orderpriority", "^[1-3]-", label="priority_format"),
        ],
        unique_cols=["o_orderkey"],
        fks=[("o_custkey", cust, "c_custkey")],
    )


@register(
    "sketch_kmv_intersection_sources",
    f"""
    WITH hashed AS (
      SELECT DISTINCT source AS g, {sp.sql_hash_u32('token', 'tsdt|kmv')} AS u
      FROM {_KMV_TOKENS_TABLE}
    ),
    regs AS (
      SELECT g, u FROM (
        SELECT g, u, row_number() OVER (PARTITION BY g ORDER BY u ASC) AS rn
        FROM hashed
      ) WHERE rn <= 64
    ),
    sides AS (
      SELECT g, count(*) AS n_kept, max(u) AS kth FROM regs GROUP BY g
    ),
    sest AS (
      SELECT g,
             CASE WHEN n_kept < 64 THEN CAST(n_kept AS DOUBLE)
                  ELSE 63.0 * 4294967296.0 / CAST(kth AS DOUBLE) END AS est
      FROM sides
    ),
    srcs AS (SELECT DISTINCT g FROM regs),
    pairs AS (SELECT a.g AS src_a, b.g AS src_b FROM srcs a JOIN srcs b ON a.g < b.g),
    pr AS (
      SELECT p.src_a, p.src_b, r.u, r.g
      FROM pairs p JOIN regs r ON r.g = p.src_a OR r.g = p.src_b
    ),
    per_u AS (
      SELECT src_a, src_b, u, count(*) AS n_sides
      FROM pr GROUP BY src_a, src_b, u
    ),
    kept AS (
      SELECT * FROM (
        SELECT *, row_number() OVER (PARTITION BY src_a, src_b ORDER BY u ASC) AS rn
        FROM per_u
      ) WHERE rn <= 64
    ),
    agg AS (
      SELECT src_a, src_b, count(*) AS n_union_kept, max(u) AS kth,
             sum(CASE WHEN n_sides = 2 THEN 1 ELSE 0 END) AS n_common
      FROM kept GROUP BY src_a, src_b
    )
    SELECT agg.src_a, agg.src_b,
           {R("ea.est", 6)} AS est_a,
           {R("eb.est", 6)} AS est_b,
           {R("CASE WHEN agg.n_union_kept < 64 THEN CAST(agg.n_union_kept AS DOUBLE)"
              " ELSE 63.0 * 4294967296.0 / CAST(agg.kth AS DOUBLE) END", 6)} AS est_union,
           {R("CAST(agg.n_common AS DOUBLE) / CAST(agg.n_union_kept AS DOUBLE)", 6)}
             AS jaccard_est,
           {R("(CAST(agg.n_common AS DOUBLE) / CAST(agg.n_union_kept AS DOUBLE))"
              " * (CASE WHEN agg.n_union_kept < 64 THEN CAST(agg.n_union_kept AS DOUBLE)"
              " ELSE 63.0 * 4294967296.0 / CAST(agg.kth AS DOUBLE) END)", 6)}
             AS est_intersection
    FROM agg
    JOIN sest ea ON ea.g = agg.src_a
    JOIN sest eb ON eb.g = agg.src_b
    """,
)
def _q_kmv_intersection_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All-pairs cross-source JOIN-CARDINALITY card from KMV registers
    alone (`sk.kmv_pairwise_intersection`): |Â|, |B̂|, |Â∪B|, Ĵ and the
    standard KMV intersection estimator |Â∩B| = Ĵ·|Â∪B| (Beyer et al.
    SIGMOD 2007) — the "how big is this overlap before I run the join"
    planning primitive. Never rescans the corpus: every pair costs
    ≤ 2k register longs, the per-side size estimates join back over
    the G²-bounded pair table."""
    docs = _table(spark, sf_dir, "documents")
    toks = (
        docs.filter(F.col("text").isNotNull())
        .select(
            "source",
            F.explode(F.split(F.trim(F.col("text")), " ")).alias("token"),
        )
        .filter(F.length("token") > 0)
    )
    regs = sk.kmv_registers(toks, "source", "token", k=64)
    return sk.kmv_pairwise_intersection(regs, k=64)


@register(
    "sketch_quantile_value_global",
    f"""
    WITH ev AS (
      SELECT user_id, event_id, value FROM events WHERE value IS NOT NULL
    ),
    h AS (
      SELECT {_QSK_U} AS u, CAST(value AS DOUBLE) AS v FROM ev
    ),
    regs AS (
      SELECT '_all_' AS g, u, v FROM h
      QUALIFY row_number() OVER (ORDER BY u ASC, v ASC) <= {_QSK_K}
    ),
    ranked AS (
      SELECT g, v,
             row_number() OVER (PARTITION BY g ORDER BY v ASC, u ASC) AS vr,
             count(*) OVER (PARTITION BY g) AS n_kept
      FROM regs
    ),
    qs AS (
      SELECT unnest([{", ".join(f"CAST({q} AS DOUBLE)" for q in _QSK_QS)}]) AS q
    )
    SELECT g, q, CAST(n_kept AS BIGINT) AS n_kept, v AS q_est
    FROM ranked CROSS JOIN qs
    WHERE vr = greatest(1, CAST(ceil(q * CAST(n_kept AS DOUBLE)) AS BIGINT))
    """,
)
def _q_sketch_quantile_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CORPUS-WIDE quantiles from the per-group quantile registers
    alone (`sk.quantile_sketch_global` over
    `sk.quantile_sketch_registers`): per-trial sketches are computed
    once in parallel (the only pass over raw data), then the global
    bottom-k re-rank runs on ≤ k·G bounded register rows — the global
    percentile WITHOUT the global sort that is impossible at 100 TB.

    Correctness hinge (pytest-proven register-for-register in
    tests/test_sketches_quantile.py): every member of the global
    bottom-k by the shared md5 row hash also survives its own group's
    bottom-k, so rolling up per-group registers EQUALS sketching all
    raw rows directly — which is exactly what the oracle does (one
    global QUALIFY over the raw table). Window-free after the
    per-group stage: rollup and estimate are bounded
    collect_list → array_sort aggregations (`quantile_estimate_agg`),
    since a constant group key would fold to the banned keyless
    Window."""
    ev = _events(spark, sf_dir).filter(F.col("value").isNotNull())
    regs = sk.quantile_sketch_registers(
        ev, "user_id", "value", "event_id", k=_QSK_K, seed=_QSK_SEED
    )
    glob = sk.quantile_sketch_global(regs, k=_QSK_K)
    return sk.quantile_estimate_agg(glob, _QSK_QS, group_col="g").select(
        "g", "q", F.col("n_kept").cast("long").alias("n_kept"), "q_est"
    )


@register(
    "layout_compaction_plan",
    f"""
    WITH per AS (
      SELECT source AS part, count(*) AS n_rows,
             CAST(sum(strlen(coalesce(text, '')) + 64) AS BIGINT) AS est_bytes
      FROM documents GROUP BY source
    ),
    tot AS (SELECT sum(est_bytes) AS total FROM per)
    SELECT part, CAST(n_rows AS BIGINT) AS n_rows, est_bytes,
           greatest(1, CAST(ceil(CAST(est_bytes AS DOUBLE) / 1048576.0) AS BIGINT))
             AS n_files,
           {R("CAST(est_bytes AS DOUBLE)"
              " / CAST(greatest(1, CAST(ceil(CAST(est_bytes AS DOUBLE) / 1048576.0)"
              " AS BIGINT)) AS DOUBLE) / 1048576.0", 6)} AS avg_file_mb,
           {R("CAST(est_bytes AS DOUBLE) / CAST(tot.total AS DOUBLE)", 6)}
             AS pct_of_total
    FROM per CROSS JOIN tot
    """,
)
def _q_layout_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source compaction/file-sizing plan (`layout.compaction_plan`,
    target 1 MiB at test scale standing in for the production 128 MiB):
    exact row counts, scan-side byte estimates
    (octet_length(text) + 64 B row overhead), the file count landing
    each partition at the target size, and each partition's share of
    corpus bytes (the skew signal — a 40% partition wants salting, not
    more files). ONE map-side-combined aggregation + a sanctioned
    1-row-total scalar broadcast; at 100 TB this IS the compaction
    job's planning step and it costs one scan of one column."""
    from time_series_data_trimmer_spark.operators import layout as ly

    docs = _table(spark, sf_dir, "documents")
    return ly.compaction_plan(
        docs,
        "source",
        (F.octet_length(F.coalesce(F.col("text"), F.lit(""))) + F.lit(64)).cast(
            "long"
        ),
        target_file_bytes=1024 * 1024,
    )


# ---------------------------------------------------------------------------
# Wave 9: data forensics + reconciliation + robust trend
# ---------------------------------------------------------------------------


@register(
    "dq_content_fingerprint",
    f"""
    WITH h AS (
      SELECT source,
             {sp.sql_hash_u32(
                 "concat_ws('|', CAST(doc_id AS VARCHAR), coalesce(text, ''),"
                 " coalesce(lang, ''), CAST(n_chars AS VARCHAR))",
                 'tsdt|fp')} AS u
      FROM documents
    )
    SELECT source, count(*) AS n_rows,
           CAST(sum(CAST(u AS DECIMAL(38,0))) % 1000000000000000000 AS BIGINT)
             AS content_sum_mod,
           min(u) AS content_min, max(u) AS content_max
    FROM h GROUP BY source
    """,
)
def _q_dq_content_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-insensitive per-source CONTENT FINGERPRINT for cross-
    engine / cross-store reconciliation: the decimal sum (+ min/max +
    count) of a portable md5 row hash over the full row payload. Sum
    is commutative-associative, so the fingerprint is independent of
    partitioning, file order, and engine — copy a 100 TB corpus
    between stores, run this on both sides, diff G rows. A dropped,
    duplicated, or bit-flipped row moves the sum with probability
    ~1-2⁻³². ONE scan, map-side-combined aggregation; the hash
    evaluates scan-side so only (source, u) shuffles."""
    docs = _table(spark, sf_dir, "documents")
    row_repr = F.concat_ws(
        "|",
        F.col("doc_id").cast("string"),
        F.coalesce(F.col("text"), F.lit("")),
        F.coalesce(F.col("lang"), F.lit("")),
        F.col("n_chars").cast("string"),
    )
    return (
        docs.select(
            "source", sp.hash_u32(row_repr, "tsdt|fp").alias("__u")
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.pmod(
                F.sum(F.col("__u").cast("decimal(38,0)")),
                F.lit(1000000000000000000).cast("decimal(38,0)"),
            )
            .cast("long")
            .alias("content_sum_mod"),
            F.min("__u").alias("content_min"),
            F.max("__u").alias("content_max"),
        )
    )


@register(
    "dq_benford_first_digit",
    f"""
    WITH c AS (
      SELECT CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS cents
      FROM orders WHERE o_totalprice > 0
    ),
    d AS (
      SELECT CAST(substr(CAST(cents AS VARCHAR), 1, 1) AS BIGINT) AS digit FROM c
    ),
    g AS (SELECT digit, count(*) AS n FROM d GROUP BY digit),
    t AS (SELECT sum(n) AS total FROM g)
    SELECT g.digit, CAST(g.n AS BIGINT) AS n,
           {R("CAST(g.n AS DOUBLE) / CAST(t.total AS DOUBLE)", 6)} AS pct,
           {R("log10(1.0 + 1.0 / CAST(g.digit AS DOUBLE))", 6)} AS benford_pct,
           {R("CAST(g.n AS DOUBLE) / CAST(t.total AS DOUBLE)"
              " - log10(1.0 + 1.0 / CAST(g.digit AS DOUBLE))", 6)} AS deviation
    FROM g CROSS JOIN t
    """,
)
def _q_dq_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-significant-digit audit over order totals —
    the classic fabricated-/truncated-data forensic (synthetic or
    clipped value distributions drift hard from log10(1+1/d)). Digit
    extraction goes through EXACT integer cents and integer→string
    (both engines render integers identically — no float→string, no
    floor(log10()) edge cases at powers of ten). One 9-row aggregation
    + the sanctioned 1-row total broadcast."""
    orders = _table(spark, sf_dir, "orders")
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
            .alias("digit")
        )
        .groupBy("digit")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    t = g.agg(F.sum("n").alias("__total"))
    pct = F.col("n").cast("double") / F.col("__total").cast("double")
    benford = F.log10(F.lit(1.0) + F.lit(1.0) / F.col("digit").cast("double"))
    return g.crossJoin(t).select(
        "digit",
        F.col("n").cast("long").alias("n"),
        rd(pct, 6).alias("pct"),
        rd(benford, 6).alias("benford_pct"),
        rd(pct - benford, 6).alias("deviation"),
    )


@register(
    "stats_moments_by_type",
    f"""
    WITH e AS (
      SELECT event_type,
             CAST(CAST(floor(value * 10000.0 + 0.5) AS BIGINT) AS DECIMAL(12,0)) AS sv
      FROM events WHERE value IS NOT NULL
    ),
    p AS (
      SELECT event_type, sv,
             CAST(sv * sv AS DECIMAL(19,0)) AS p2
      FROM e
    ),
    s AS (
      SELECT event_type, count(*) AS n,
             sum(CAST(sv AS DECIMAL(38,0))) AS s1,
             sum(CAST(p2 AS DECIMAL(38,0))) AS s2,
             sum(CAST(p2 * sv AS DECIMAL(38,0))) AS s3,
             sum(CAST(p2 * p2 AS DECIMAL(38,0))) AS s4
      FROM p GROUP BY event_type
    ),
    m AS (
      SELECT event_type, n,
             CAST(s1 AS DOUBLE) / n AS mu,
             CAST(s2 AS DOUBLE) / n AS r2,
             CAST(s3 AS DOUBLE) / n AS r3,
             CAST(s4 AS DOUBLE) / n AS r4
      FROM s
    ),
    cm AS (
      SELECT event_type, n, mu,
             r2 - mu * mu AS m2,
             r3 - 3.0 * mu * r2 + 2.0 * mu * mu * mu AS m3,
             r4 - 4.0 * mu * r3 + 6.0 * mu * mu * r2 - 3.0 * mu * mu * mu * mu AS m4
      FROM m
    )
    SELECT event_type, CAST(n AS BIGINT) AS n,
           {R("mu / 10000.0", 6)} AS mean,
           {R("sqrt(m2) / 10000.0", 6)} AS std_pop,
           {R("m3 / power(m2, 1.5)", 6)} AS skewness,
           {R("m4 / (m2 * m2) - 3.0", 6)} AS excess_kurtosis
    FROM cm
    """,
)
def _q_stats_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact higher moments per event type — skewness and excess
    kurtosis, the tail-shape numbers that decide between the mean±kσ
    spike rule (A5) and the robust MAD/IQR family. Raw power sums
    S1..S4 accumulate 4-dp scaled INTEGERS in decimal(38,0) (sv⁴ ≤
    ~10²⁸ per term, ~10³⁴ summed — exact, partial-agg-order-proof);
    the central-moment combination is one identical IEEE expression in
    both engines, and skew/kurtosis are scale-invariant so the 1e4
    scaling cancels. ONE map-side-combined aggregation."""
    ev = _events(spark, sf_dir).filter(F.col("value").isNotNull())
    sv = (
        F.floor(F.col("value") * 10000.0 + 0.5)
        .cast("long")
        .cast("decimal(12,0)")
    )
    e = ev.select("event_type", sv.alias("__sv")).withColumn(
        "__p2", (F.col("__sv") * F.col("__sv")).cast("decimal(19,0)")
    )
    s = e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("__sv").cast("decimal(38,0)")).alias("__s1"),
        F.sum(F.col("__p2").cast("decimal(38,0)")).alias("__s2"),
        F.sum((F.col("__p2") * F.col("__sv")).cast("decimal(38,0)")).alias("__s3"),
        F.sum((F.col("__p2") * F.col("__p2")).cast("decimal(38,0)")).alias("__s4"),
    )
    m = s.select(
        "event_type",
        "n",
        (F.col("__s1").cast("double") / F.col("n")).alias("__mu"),
        (F.col("__s2").cast("double") / F.col("n")).alias("__r2"),
        (F.col("__s3").cast("double") / F.col("n")).alias("__r3"),
        (F.col("__s4").cast("double") / F.col("n")).alias("__r4"),
    )
    cm = m.select(
        "event_type",
        "n",
        "__mu",
        (F.col("__r2") - F.col("__mu") * F.col("__mu")).alias("__m2"),
        (
            F.col("__r3")
            - F.lit(3.0) * F.col("__mu") * F.col("__r2")
            + F.lit(2.0) * F.col("__mu") * F.col("__mu") * F.col("__mu")
        ).alias("__m3"),
        (
            F.col("__r4")
            - F.lit(4.0) * F.col("__mu") * F.col("__r3")
            + F.lit(6.0) * F.col("__mu") * F.col("__mu") * F.col("__r2")
            - F.lit(3.0)
            * F.col("__mu")
            * F.col("__mu")
            * F.col("__mu")
            * F.col("__mu")
        ).alias("__m4"),
    )
    return cm.select(
        "event_type",
        F.col("n").cast("long").alias("n"),
        rd(F.col("__mu") / 10000.0, 6).alias("mean"),
        rd(F.sqrt(F.col("__m2")) / 10000.0, 6).alias("std_pop"),
        rd(F.col("__m3") / F.pow(F.col("__m2"), 1.5), 6).alias("skewness"),
        rd(
            F.col("__m4") / (F.col("__m2") * F.col("__m2")) - F.lit(3.0), 6
        ).alias("excess_kurtosis"),
    )


@register(
    "ts_theilsen_lag_slope",
    f"""
    WITH e AS (
      SELECT user_id, epoch_us(ts) AS t_us, event_id,
             CAST(floor(value * 10000.0 + 0.5) AS BIGINT) AS sv
      FROM events WHERE value IS NOT NULL
    ),
    d AS (
      SELECT user_id,
             lead(sv) OVER w - sv AS dv,
             lead(t_us) OVER w - t_us AS dt_us,
             lead(event_id) OVER w AS nid
      FROM e
      WINDOW w AS (PARTITION BY user_id ORDER BY t_us, event_id)
    ),
    sl AS (
      SELECT user_id,
             CAST(dv AS DOUBLE) / 10000.0 / (CAST(dt_us AS DOUBLE) / 1000000.0)
               AS slope,
             nid
      FROM d WHERE dt_us IS NOT NULL AND dt_us > 0
    ),
    r AS (
      SELECT user_id, slope,
             row_number() OVER (
               PARTITION BY user_id ORDER BY slope, nid
             ) AS rn,
             count(*) OVER (PARTITION BY user_id) AS n
      FROM sl
    )
    SELECT user_id, CAST(max(n) AS BIGINT) AS n_slopes,
           {R("max(CASE WHEN rn = (n + 1) // 2 THEN slope END)", 6)}
             AS slope_median_per_s,
           {R("CAST(sum(CAST(CAST(floor(slope * 1000000.0 + 0.5) AS BIGINT)"
              " AS DECIMAL(38,0))) AS DOUBLE) / max(n) / 1000000.0", 6)}
             AS slope_mean_per_s
    FROM r GROUP BY user_id
    """,
)
def _q_ts_theilsen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-trial trend slope: the MEDIAN of consecutive-sample
    difference slopes (the lag-1 member of the Theil-Sen family — the
    full estimator medians all O(n²) pairs, which is exactly the
    quadratic a 100 TB trial can't afford; consecutive differences
    keep the 29% breakdown point against spike outliers that wreck
    the OLS slope in F6/detrend). Slopes are IEEE divisions of exact
    scaled integers — bit-identical both engines. The mean slope
    alongside (µ-scaled decimal accumulation) is the fragile
    contrast: on an even grid lag-1 slope sums TELESCOPE, so it
    collapses to the endpoint-to-endpoint slope — immune to interior
    spikes but wrecked by endpoint corruption (pytest-pinned), while
    the median holds either way. Two windows + the rank share ONE
    user_id exchange."""
    e = _events_us(spark, sf_dir).filter(F.col("value").isNotNull()).select(
        "user_id",
        "t_us",
        "event_id",
        F.floor(F.col("value") * 10000.0 + 0.5).cast("long").alias("__sv"),
    )
    w = Window.partitionBy("user_id").orderBy("t_us", "event_id")
    d = e.select(
        "user_id",
        (F.lead("__sv").over(w) - F.col("__sv")).alias("__dv"),
        (F.lead("t_us").over(w) - F.col("t_us")).alias("__dt"),
        F.lead("event_id").over(w).alias("__nid"),
    )
    sl = d.filter(F.col("__dt").isNotNull() & (F.col("__dt") > 0)).select(
        "user_id",
        (
            F.col("__dv").cast("double")
            / 10000.0
            / (F.col("__dt").cast("double") / 1000000.0)
        ).alias("__slope"),
        "__nid",
    )
    wr = Window.partitionBy("user_id").orderBy("__slope", "__nid")
    wn = Window.partitionBy("user_id")
    r = sl.select(
        "user_id",
        "__slope",
        F.row_number().over(wr).alias("__rn"),
        F.count(F.lit(1)).over(wn).alias("__n"),
    )
    return r.groupBy("user_id").agg(
        F.max("__n").cast("long").alias("n_slopes"),
        rd(
            F.max(
                F.when(
                    F.col("__rn") == F.expr("(__n + 1) div 2"), F.col("__slope")
                )
            ),
            6,
        ).alias("slope_median_per_s"),
        rd(
            F.sum(
                F.floor(F.col("__slope") * 1000000.0 + 0.5)
                .cast("long")
                .cast("decimal(38,0)")
            ).cast("double")
            / F.max("__n")
            / 1000000.0,
            6,
        ).alias("slope_mean_per_s"),
    )


@register(
    "stream_dq_violations",
    f"""
    WITH w AS (
      SELECT date_trunc('hour', ts) AS window_start, value, event_type
      FROM events
    ),
    g AS (
      SELECT window_start,
             count(*) AS c0,
             count(*) FILTER (WHERE value IS NULL) AS v0,
             count(*) FILTER (WHERE value IS NOT NULL) AS c1,
             count(*) FILTER (WHERE value IS NOT NULL
                              AND (value < 0.0 OR value > 300.0)) AS v1,
             count(*) FILTER (WHERE event_type IS NOT NULL) AS c2,
             count(*) FILTER (WHERE event_type IS NOT NULL AND event_type
                              NOT IN ('view','click','purchase','signup')) AS v2
      FROM w GROUP BY window_start
    ),
    u AS (
      SELECT window_start, 'not_null(value)' AS rule, c0 AS n_checked, v0 AS n_violations FROM g
      UNION ALL
      SELECT window_start, 'in_range(value,0.0,300.0)', c1, v1 FROM g
      UNION ALL
      SELECT window_start, 'in_set(event_type)', c2, v2 FROM g
    )
    SELECT window_start, rule, CAST(n_checked AS BIGINT) AS n_checked,
           CAST(n_violations AS BIGINT) AS n_violations,
           {R("CASE WHEN n_checked > 0 THEN CAST(n_violations AS DOUBLE)"
              " / CAST(n_checked AS DOUBLE) ELSE 0.0 END", 6)} AS violation_rate
    FROM u
    """,
)
def _q_stream_dq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous ingest-quality monitor
    (`stream_ops.stream_dq_violations`): the wave-8 declarative RowRule
    suite compiled into one stateless tumbling-hour streaming
    aggregation — per-window per-rule violation counts and rates as
    data lands (here the 'error' event type and the >300 value tail
    trip the set/range rules non-trivially). Watermarked like every
    tumbling query; state per open window is one counter row. The
    fold is window-pure, so complete-mode final state equals the
    batch GROUP BY oracle exactly."""
    from time_series_data_trimmer_spark.streaming.stream_ops import (
        stream_dq_violations,
    )

    return stream_dq_violations(spark, os.path.join(sf_dir, "events.parquet"))


@register(
    "ts_changepoint_binary_seg",
    f"""
    WITH e AS (
      SELECT user_id, epoch_us(ts) AS t_us, event_id,
             CAST(floor(value * 10000.0 + 0.5) AS BIGINT) AS v
      FROM events
    ),
    s1 AS (
      SELECT user_id, t_us, event_id,
             sum(v) OVER (PARTITION BY user_id ORDER BY t_us ASC, event_id ASC
                          ROWS UNBOUNDED PRECEDING) AS cum,
             CAST(row_number() OVER (PARTITION BY user_id
                                     ORDER BY t_us ASC, event_id ASC) AS BIGINT) AS k,
             sum(v) OVER (PARTITION BY user_id) AS total,
             count(*) OVER (PARTITION BY user_id) AS n
      FROM e
    ),
    d1 AS (SELECT *, n * cum - k * total AS d FROM s1),
    r1 AS (
      SELECT *, row_number() OVER (PARTITION BY user_id
                                   ORDER BY abs(d) DESC, t_us ASC, event_id ASC) AS rn
      FROM d1
    ),
    cp1 AS (SELECT user_id, t_us, event_id, k, d, n FROM r1 WHERE rn = 1),
    seg AS (
      SELECT e.user_id,
             CASE WHEN e.t_us < c.t_us
                    OR (e.t_us = c.t_us AND e.event_id <= c.event_id)
                  THEN 'L' ELSE 'R' END AS seg,
             e.t_us, e.event_id, e.v
      FROM e JOIN cp1 c ON c.user_id = e.user_id
    ),
    s2 AS (
      SELECT user_id, seg, t_us, event_id,
             sum(v) OVER (PARTITION BY user_id, seg
                          ORDER BY t_us ASC, event_id ASC
                          ROWS UNBOUNDED PRECEDING) AS cum,
             CAST(row_number() OVER (PARTITION BY user_id, seg
                                     ORDER BY t_us ASC, event_id ASC) AS BIGINT) AS k,
             sum(v) OVER (PARTITION BY user_id, seg) AS total,
             count(*) OVER (PARTITION BY user_id, seg) AS n
      FROM seg
    ),
    d2 AS (SELECT *, n * cum - k * total AS d FROM s2),
    r2 AS (
      SELECT *, row_number() OVER (PARTITION BY user_id, seg
                                   ORDER BY abs(d) DESC, t_us ASC, event_id ASC) AS rn
      FROM d2
    )
    SELECT user_id, 'all' AS seg, t_us AS cp_t_us, event_id AS cp_event_id,
           k AS cp_index,
           {R("CAST(abs(d) AS DOUBLE) / (CAST(n AS DOUBLE) * 10000.0)", 6)} AS max_dev
    FROM cp1
    UNION ALL
    SELECT user_id, seg, t_us, event_id, k,
           {R("CAST(abs(d) AS DOUBLE) / (CAST(n AS DOUBLE) * 10000.0)", 6)}
    FROM r2 WHERE rn = 1
    """,
)
def _q_ts_binseg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Depth-2 binary-segmentation changepoints per trial
    (`ts.binary_segmentation`): the CUSUM level-shift locator applied
    recursively — strongest break over the whole trial, then the
    strongest break inside each resulting half — giving the
    three-regime story a trim tool wants ("where it broke, and where
    each regime wobbles") with the recursion UNROLLED into one lazy
    plan (no O(n^2) segmentation DP, no driver loop). Decimal-exact
    argmax at both levels (n*cumsum_k − k*total on scaled integers),
    earliest-tie pinned, split membership by the same (t_us, event_id)
    total order both engines. Level 1 rides one trial exchange; the
    split row joins back narrow; level 2 re-keys on (trial, half)."""
    e = _events_us(spark, sf_dir)
    return ts.binary_segmentation(e)


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


#: shared LSH-blocked exact-cosine candidate RANKING chain (``ranked``:
#: vid, nbr, cos, rk) — factored so the MRR and NDCG retrieval evals
#: rank the identical candidate set and can never drift.
_LSH_RANKED_SQL = f"""ex AS ({_EX_SQL}),
    bitsv AS (
      SELECT greatest({_EMB_BITS},
                      CAST(ceil(log2(CAST(count(*) AS DOUBLE))) AS INTEGER) - 4)
             AS bits
      FROM embeddings
    ),
    planes AS (
      SELECT t.t, b.b, i.i,
             ('0x' || substr(md5('tsdt|t' || t.t || '|' || b.b || '|' || i.i), 1, 8))::BIGINT
               / 2147483648.0 - 1.0 AS w
      FROM generate_series(0, {_KNN_MAX_BITS - 1}) b(b)
      CROSS JOIN bitsv
      JOIN generate_series(0, {_EMB_TABLES - 1}) t(t) ON TRUE
      JOIN generate_series(0, {_EMB_DIM - 1}) i(i) ON TRUE
      WHERE b.b < bitsv.bits
    ),
    pdots AS (
      SELECT e.vec_id, p.t, p.b,
             CAST(sum(CAST({sql_rd("e.x * p.w", 9)} AS DECIMAL(38,9))) AS DOUBLE) AS d
      FROM ex e JOIN planes p ON p.i = e.i - 1
      GROUP BY e.vec_id, p.t, p.b
    ),
    sigs AS (
      SELECT vec_id, t,
             sum(CASE WHEN d > 0 THEN CAST(1 AS BIGINT) << b ELSE 0 END) AS sig
      FROM pdots GROUP BY vec_id, t
    ),
    cand AS (
      SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
      FROM sigs a JOIN sigs b ON a.t = b.t AND a.sig = b.sig AND a.vec_id < b.vec_id
    ),
    norms AS (
      SELECT vec_id, sqrt(CAST(sum(CAST({sql_rd("x * x", 9)} AS DECIMAL(38,9))) AS DOUBLE)) AS nrm
      FROM ex GROUP BY vec_id
    ),
    scored AS (
      SELECT c.id_a, c.id_b,
             {R("CAST(sum(CAST(" + sql_rd("ea.x * eb.x", 9) + " AS DECIMAL(38,9))) AS DOUBLE) / (max(na.nrm) * max(nb.nrm))", 6)} AS cos
      FROM cand c
      JOIN ex ea ON ea.vec_id = c.id_a
      JOIN ex eb ON eb.vec_id = c.id_b AND eb.i = ea.i
      JOIN norms na ON na.vec_id = c.id_a
      JOIN norms nb ON nb.vec_id = c.id_b
      GROUP BY c.id_a, c.id_b
    ),
    sym AS (
      SELECT id_a AS vid, id_b AS nbr, cos FROM scored
      UNION ALL
      SELECT id_b AS vid, id_a AS nbr, cos FROM scored
    ),
    ranked AS (
      SELECT vid, nbr, cos,
             row_number() OVER (
               PARTITION BY vid ORDER BY cos DESC, nbr ASC
             ) AS rk
      FROM sym
    )"""


@register(
    "emb_retrieval_mrr",
    f"""
    WITH {_LSH_RANKED_SQL},
    hit AS (
      SELECT r.vid, min(r.rk) AS r1
      FROM ranked r
      JOIN embeddings q ON q.vec_id = r.vid
      JOIN embeddings n ON n.vec_id = r.nbr
      WHERE n.label = q.label
      GROUP BY r.vid
    ),
    per_q AS (
      SELECT q.vec_id AS vid, q.label AS q_lbl,
             {sql_rd("CASE WHEN h.r1 IS NULL THEN 0.0"
                     " ELSE 1.0 / CAST(h.r1 AS DOUBLE) END", 6)} AS rr
      FROM embeddings q LEFT JOIN hit h ON h.vid = q.vec_id
    )
    SELECT q_lbl AS label,
           count(*) AS n_queries,
           CAST(count(*) FILTER (WHERE rr > 0) AS BIGINT) AS n_hit,
           {R("CAST(sum(CAST(rr AS DECIMAL(38,6))) AS DOUBLE)"
              " / CAST(count(*) AS DOUBLE)", 6)} AS mrr
    FROM per_q GROUP BY q_lbl
    """,
)
def _q_emb_retrieval_mrr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieval MRR with labels as relevance (`sim.retrieval_mrr`):
    per label, the mean reciprocal rank of the first same-label
    neighbor in each vector's LSH-blocked exact-cosine candidate
    ranking (rr = 0 for queries with no same-label candidate — every
    query counts). The depth complement of the 1-NN audit: agreement
    says whether the top hit is right, MRR says how far down the
    right answer lives. Adaptive `_knn_bits` blocking, decimal-summed
    reciprocal ranks; the oracle replays the full blocked ranking,
    planes and all."""
    emb = _table(spark, sf_dir, "embeddings")
    bits = _knn_bits(emb.count())
    return sim.retrieval_mrr(emb, bits=bits, tables=_EMB_TABLES, dim=_EMB_DIM)


_KMV_HOUR_US = 3_600_000_000
_KMV_DAY_US = 86_400_000_000


@register(
    "sketch_kmv_rollup_day",
    f"""
    WITH h AS (
      SELECT DISTINCT event_type AS g,
             epoch_us(ts) - (epoch_us(ts) % {_KMV_HOUR_US}) AS hb,
             {sp.sql_hash_u32("user_id", "tsdt|kmv")} AS u
      FROM events
    ),
    regs_h AS (
      SELECT g, hb, u FROM h
      QUALIFY row_number() OVER (PARTITION BY g, hb ORDER BY u ASC) <= 64
    ),
    d AS (
      SELECT DISTINCT g, hb - (hb % {_KMV_DAY_US}) AS day_us, u FROM regs_h
    ),
    regs_d AS (
      SELECT g, day_us, u FROM d
      QUALIFY row_number() OVER (PARTITION BY g, day_us ORDER BY u ASC) <= 64
    ),
    kept AS (
      SELECT g, day_us, count(*) AS n_kept, max(u) AS kth
      FROM regs_d GROUP BY g, day_us
    ),
    exact AS (
      SELECT event_type AS g,
             epoch_us(ts) - (epoch_us(ts) % {_KMV_DAY_US}) AS day_us,
             count(DISTINCT user_id) AS exact_distinct
      FROM events GROUP BY 1, 2
    )
    SELECT kept.g AS event_type, kept.day_us, kept.n_kept,
           {R("CASE WHEN kept.n_kept < 64 THEN CAST(kept.n_kept AS DOUBLE)"
              " ELSE 63.0 * 4294967296.0 / CAST(kept.kth AS DOUBLE) END", 6)}
             AS est_distinct,
           CAST(exact.exact_distinct AS BIGINT) AS exact_distinct
    FROM kept JOIN exact ON exact.g = kept.g AND exact.day_us = kept.day_us
    """,
)
def _q_kmv_rollup_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch ROLLUP across time granularities — the OLAP-cube story
    for sketches: per-(type, hour) KMV registers (the thing you
    materialize once as data lands) re-ranked per (type, day) answer
    the daily distinct-users question WITHOUT rescanning raw rows,
    because any hash in the day's true bottom-k also survives its
    hour's bottom-k (closure under union, per-granularity). The same
    registers roll to weeks/months; raw data is touched once at the
    finest grain. Exact per-day distinct joins alongside as the audit
    (the estimator is exact below k=64 anyway). All windows on real
    composite keys; one narrow audit join."""
    ev = _events_us(spark, sf_dir)
    hashed = (
        ev.select(
            F.col("event_type").alias("g"),
            (
                F.col("t_us") - F.col("t_us") % F.lit(_KMV_HOUR_US)
            ).alias("hb"),
            sp.hash_u32(F.col("user_id"), "tsdt|kmv").alias("u"),
        )
        .distinct()
    )
    w_h = Window.partitionBy("g", "hb").orderBy(F.col("u").asc())
    regs_h = (
        hashed.withColumn("__rn", F.row_number().over(w_h))
        .filter(F.col("__rn") <= 64)
        .select("g", "hb", "u")
    )
    d = regs_h.select(
        "g",
        (F.col("hb") - F.col("hb") % F.lit(_KMV_DAY_US)).alias("day_us"),
        "u",
    ).distinct()
    w_d = Window.partitionBy("g", "day_us").orderBy(F.col("u").asc())
    kept = (
        d.withColumn("__rn", F.row_number().over(w_d))
        .filter(F.col("__rn") <= 64)
        .groupBy("g", "day_us")
        .agg(F.count(F.lit(1)).alias("n_kept"), F.max("u").alias("kth"))
    )
    est = F.when(
        F.col("n_kept") < 64, F.col("n_kept").cast("double")
    ).otherwise(
        F.lit(63.0) * F.lit(4294967296.0) / F.col("kth").cast("double")
    )
    exact = ev.groupBy(
        F.col("event_type").alias("g"),
        (F.col("t_us") - F.col("t_us") % F.lit(_KMV_DAY_US)).alias("day_us"),
    ).agg(F.count_distinct("user_id").alias("exact_distinct"))
    return (
        kept.join(exact.hint("shuffle_hash"), ["g", "day_us"])
        .select(
            F.col("g").alias("event_type"),
            "day_us",
            "n_kept",
            rd(est, 6).alias("est_distinct"),
            F.col("exact_distinct").cast("long").alias("exact_distinct"),
        )
    )


@register(
    "graph_degree_stats",
    f"""
    WITH e AS (
      SELECT user_id, event_id, ts, epoch_us(ts) AS us FROM events
    ),
    m AS (
      SELECT *,
             CASE WHEN lag(us) OVER w IS NULL
                       OR us - lag(us) OVER w > 1800000000
                  THEN 1 ELSE 0 END AS newf
      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    s AS (
      SELECT *,
             sum(newf) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS UNBOUNDED PRECEDING
             ) AS sess
      FROM m
    ),
    sess AS (
      SELECT user_id, sess, min(us) AS start_us, max(us) AS end_us
      FROM s GROUP BY user_id, sess
    ),
    p AS (
      SELECT a.user_id AS ua, b.user_id AS ub, count(*) AS w
      FROM sess a JOIN sess b
        ON a.start_us <= b.end_us AND b.start_us <= a.end_us
       AND a.user_id < b.user_id
      GROUP BY a.user_id, b.user_id
    ),
    edges AS (
      SELECT ua AS src, w FROM p UNION ALL SELECT ub AS src, w FROM p
    ),
    deg AS (
      SELECT src, CAST(sum(w) AS BIGINT) AS wdeg, count(*) AS ndeg
      FROM edges GROUP BY src
    ),
    b AS (
      SELECT src, wdeg, ndeg,
             CAST(length(bin(wdeg)) - 1 AS BIGINT) AS bucket
      FROM deg
    ),
    t AS (SELECT count(*) AS n_nodes, sum(wdeg) AS tot_wdeg FROM b)
    SELECT bucket, count(*) AS n_nodes,
           CAST(min(wdeg) AS BIGINT) AS min_wdeg,
           CAST(max(wdeg) AS BIGINT) AS max_wdeg,
           CAST(max(ndeg) AS BIGINT) AS max_ndeg,
           {R("CAST(count(*) AS DOUBLE) / CAST(max(t.n_nodes) AS DOUBLE)", 6)}
             AS node_frac,
           {R("CAST(sum(wdeg) AS DOUBLE) / CAST(max(t.tot_wdeg) AS DOUBLE)", 6)}
             AS weight_frac
    FROM b CROSS JOIN t
    GROUP BY bucket
    """,
)
def _q_graph_degree_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree distribution of the session-concurrency graph in
    exact-integer log2 buckets (bucket = bit_length(wdeg) − 1, via
    length(bin(x)) so there is NO floor(log2) float edge at powers of
    two): per bucket, node count/fraction, weighted-degree range, and
    the bucket's share of total edge weight. This is the HUB-RISK
    audit behind the repo's bounded-block rules — a top bucket owning
    most of the weight is the celebrity-hub regime where unbounded
    neighborhood joins go quadratic (the reason sorted-neighborhood
    caps and degree-oriented triangle counting exist). Same edge
    build as PageRank (bucketed overlap join) — at 100 TB the matrix
    is materialized ONCE and shared with pagerank/triangles; cost
    rides its true pair volume (SCALING.md wave 12). If only degree
    counts were needed, interval-stabbing boundary ranks (N − ends
    before my start − starts after my end) would avoid pair
    enumeration entirely. Then one degree aggregation + a log-bucket
    rollup with the sanctioned 1-row total broadcast."""
    sessd = ag.sessionize_user_events(_table(spark, sf_dir, "events"), gap_minutes=30)
    ivl = sessd.select(
        "user_id",
        "session_idx",
        F.unix_micros(F.col("session_start").cast("timestamp")).alias("start_us"),
        F.unix_micros(F.col("session_end").cast("timestamp")).alias("end_us"),
    )
    prs = iv.overlap_join(ivl, ivl).filter(F.col("user_id_a") < F.col("user_id_b"))
    mat = prs.groupBy(
        F.col("user_id_a").alias("ua"), F.col("user_id_b").alias("ub")
    ).agg(F.count(F.lit(1)).alias("w"))
    edges = mat.select(F.col("ua").alias("src"), "w").unionByName(
        mat.select(F.col("ub").alias("src"), "w")
    )
    deg = edges.groupBy("src").agg(
        F.sum("w").cast("long").alias("wdeg"), F.count(F.lit(1)).alias("ndeg")
    )
    b = deg.select(
        "src",
        "wdeg",
        "ndeg",
        (F.length(F.bin(F.col("wdeg"))) - 1).cast("long").alias("bucket"),
    )
    t = b.agg(
        F.count(F.lit(1)).alias("__n_nodes"), F.sum("wdeg").alias("__tot_wdeg")
    )
    return (
        b.crossJoin(t)
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_nodes"),
            F.min("wdeg").cast("long").alias("min_wdeg"),
            F.max("wdeg").cast("long").alias("max_wdeg"),
            F.max("ndeg").cast("long").alias("max_ndeg"),
            rd(
                F.count(F.lit(1)).cast("double")
                / F.max("__n_nodes").cast("double"),
                6,
            ).alias("node_frac"),
            rd(
                F.sum("wdeg").cast("double") / F.max("__tot_wdeg").cast("double"),
                6,
            ).alias("weight_frac"),
        )
    )


@register(
    "stats_mutual_info_type_hour",
    f"""
    WITH e AS (
      SELECT event_type AS t, CAST(hour(ts) AS BIGINT) AS h FROM events
    ),
    cells AS (SELECT t, h, count(*) AS c FROM e GROUP BY t, h),
    mt AS (SELECT t, sum(c) AS ct FROM cells GROUP BY t),
    mh AS (SELECT h, sum(c) AS ch FROM cells GROUP BY h),
    n AS (SELECT sum(c) AS nn FROM cells),
    mi AS (
      SELECT CAST(max(n.nn) AS BIGINT) AS n,
             CAST(count(*) AS BIGINT) AS n_cells,
             CAST(sum(CAST(
               {sql_rd("(CAST(cells.c AS DOUBLE) / CAST(n.nn AS DOUBLE))"
                       " * log2((CAST(cells.c AS DOUBLE) * CAST(n.nn AS DOUBLE))"
                       " / (CAST(mt.ct AS DOUBLE) * CAST(mh.ch AS DOUBLE)))", 6)}
               AS DECIMAL(38,6))) AS DOUBLE) AS mi_bits
      FROM cells
      JOIN mt ON mt.t = cells.t
      JOIN mh ON mh.h = cells.h
      CROSS JOIN n
    ),
    ht AS (
      SELECT CAST(sum(CAST(
               {sql_rd("-(CAST(mt.ct AS DOUBLE) / CAST(n.nn AS DOUBLE))"
                       " * log2(CAST(mt.ct AS DOUBLE) / CAST(n.nn AS DOUBLE))", 6)}
               AS DECIMAL(38,6))) AS DOUBLE) AS h_type_bits
      FROM mt CROSS JOIN n
    ),
    hh AS (
      SELECT CAST(sum(CAST(
               {sql_rd("-(CAST(mh.ch AS DOUBLE) / CAST(n.nn AS DOUBLE))"
                       " * log2(CAST(mh.ch AS DOUBLE) / CAST(n.nn AS DOUBLE))", 6)}
               AS DECIMAL(38,6))) AS DOUBLE) AS h_hour_bits
      FROM mh CROSS JOIN n
    )
    SELECT mi.n, mi.n_cells,
           {R("mi.mi_bits", 6)} AS mi_bits,
           {R("ht.h_type_bits", 6)} AS h_type_bits,
           {R("hh.h_hour_bits", 6)} AS h_hour_bits
    FROM mi CROSS JOIN ht CROSS JOIN hh
    """,
)
def _q_stats_mutual_info(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information (bits) between event type and hour-of-day —
    the behavioral-dependence audit: MI ≈ 0 says the type mix is
    stationary across the day (time-based train/val splits are safe);
    high MI says temporal splits leak the type distribution. Exact
    counts into |types|·24 bounded cells; every −p·log₂p and
    p·log₂(pN/(p_t·p_h)) term is 6-dp rounded then DECIMAL-summed
    (the token-entropy discipline) so the sums are
    partial-agg-order-proof. The marginal entropies come from their
    OWN tiny aggregations (|types| and 24 rows) — no shared-scan
    trickery that would divide rounded terms and re-round. Everything
    after the first aggregation is O(cells); the three 1-row results
    cross-join (sanctioned scalars)."""
    ev = _events(spark, sf_dir)
    e = ev.select(
        F.col("event_type").alias("t"),
        F.hour(F.col("ts")).cast("long").alias("h"),
    )
    cells = e.groupBy("t", "h").agg(F.count(F.lit(1)).alias("c"))
    mt = cells.groupBy("t").agg(F.sum("c").alias("ct"))
    mh = cells.groupBy("h").agg(F.sum("c").alias("ch"))
    n = cells.agg(F.sum("c").alias("nn"))
    cd = F.col("c").cast("double")
    nd = F.col("nn").cast("double")
    ctd = F.col("ct").cast("double")
    chd = F.col("ch").cast("double")
    mi = (
        cells.join(mt.hint("shuffle_hash"), "t")
        .join(mh.hint("shuffle_hash"), "h")
        .crossJoin(n)
        .select(
            "nn",
            rd((cd / nd) * F.log2((cd * nd) / (ctd * chd)), 6).alias("__mi"),
        )
        .agg(
            F.max("nn").cast("long").alias("n"),
            F.count(F.lit(1)).cast("long").alias("n_cells"),
            F.sum(F.col("__mi").cast("decimal(38,6)"))
            .cast("double")
            .alias("__mi_bits"),
        )
    )
    ht = (
        mt.crossJoin(n)
        .select(rd(-(ctd / nd) * F.log2(ctd / nd), 6).alias("__t"))
        .agg(F.sum(F.col("__t").cast("decimal(38,6)")).cast("double").alias("__ht"))
    )
    hh = (
        mh.crossJoin(n)
        .select(rd(-(chd / nd) * F.log2(chd / nd), 6).alias("__t"))
        .agg(F.sum(F.col("__t").cast("decimal(38,6)")).cast("double").alias("__hh"))
    )
    return (
        mi.crossJoin(ht)
        .crossJoin(hh)
        .select(
            "n",
            "n_cells",
            rd(F.col("__mi_bits"), 6).alias("mi_bits"),
            rd(F.col("__ht"), 6).alias("h_type_bits"),
            rd(F.col("__hh"), 6).alias("h_hour_bits"),
        )
    )


_EVAL_TAUS = (0.2, 0.5)

#: Shared oracle TAIL for candidate-generator evals. Expects the
#: caller's WITH-chain to have already defined ``sub`` (doc_id, text —
#: the parity-half corpus) and ``pred`` (id_a < id_b candidate pairs);
#: appends the exact τ-Jaccard brute-force truth over ``sub`` and the
#: per-τ TP/FP/FN/precision/recall report.
_EVAL_TRUTH_TAIL_SQL = f"""truth_sh AS (
      SELECT doc_id,
             list_distinct(CASE WHEN len(w) >= 3
               THEN list_transform(generate_series(1, len(w) - 2),
                                   i -> array_to_string(list_slice(w, i, i + 2), ' '))
               ELSE [array_to_string(w, ' ')] END) AS grams
      FROM (SELECT doc_id, string_split(text, ' ') AS w FROM sub)
    ),
    jac AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
               / CAST(len(list_distinct(list_concat(a.grams, b.grams))) AS DOUBLE)
               AS j
      FROM truth_sh a JOIN truth_sh b ON a.doc_id < b.doc_id
    ),
    taus AS (SELECT unnest([{", ".join(f"CAST({t} AS DOUBLE)" for t in _EVAL_TAUS)}]) AS tau),
    truth AS (
      SELECT t.tau, j.id_a, j.id_b FROM jac j JOIN taus t ON j.j >= t.tau
    ),
    tp AS (
      SELECT t.tau, count(*) AS tp
      FROM truth t JOIN pred p ON p.id_a = t.id_a AND p.id_b = t.id_b
      GROUP BY t.tau
    ),
    nt AS (SELECT tau, count(*) AS n_truth FROM truth GROUP BY tau),
    np AS (SELECT count(*) AS n_pred FROM pred)
    SELECT taus.tau,
           CAST(coalesce(nt.n_truth, 0) AS BIGINT) AS n_truth,
           CAST(np.n_pred AS BIGINT) AS n_pred,
           CAST(coalesce(tp.tp, 0) AS BIGINT) AS tp,
           CAST(np.n_pred - coalesce(tp.tp, 0) AS BIGINT) AS fp,
           CAST(coalesce(nt.n_truth, 0) - coalesce(tp.tp, 0) AS BIGINT) AS fn,
           {R("CASE WHEN np.n_pred > 0 THEN CAST(coalesce(tp.tp, 0) AS DOUBLE)"
              " / CAST(np.n_pred AS DOUBLE) ELSE 0.0 END", 6)} AS precision_at_tau,
           {R("CASE WHEN coalesce(nt.n_truth, 0) > 0"
              " THEN CAST(coalesce(tp.tp, 0) AS DOUBLE)"
              " / CAST(nt.n_truth AS DOUBLE) ELSE 0.0 END", 6)} AS recall_at_tau
    FROM taus
    LEFT JOIN nt ON nt.tau = taus.tau
    LEFT JOIN tp ON tp.tau = taus.tau
    CROSS JOIN np"""


def _candidate_eval_frame(sub: DataFrame, pred: DataFrame) -> DataFrame:
    """Per-τ TP/FP/FN + precision/recall of a candidate-pair generator
    against exact τ-Jaccard ground truth (`dd.ngram_jaccard_prefix_pairs`
    — zero false negatives by the prefix-filter guarantee) — the shared
    engine behind the LSH and SimHash eval reports. Truth and candidate
    sets live on the same subcorpus; every eval join is (id, id)-keyed
    over bounded pair sets; the only scalar is the 1-row n_pred count
    (sanctioned 1-row-aggregate cross join)."""
    taus = list(_EVAL_TAUS)
    truth_min = dd.ngram_jaccard_prefix_pairs(sub, min_jaccard=min(taus))
    tau_rows = F.explode(
        F.array(*[F.lit(float(t)) for t in taus])
    ).alias("tau")
    truth = (
        truth_min.select("id_a", "id_b", "jaccard", tau_rows)
        .filter(F.col("jaccard") >= F.col("tau"))
        .select("tau", "id_a", "id_b")
    )
    tp = (
        truth.join(pred.hint("shuffle_hash"), ["id_a", "id_b"])
        .groupBy("tau")
        .agg(F.count(F.lit(1)).alias("tp"))
    )
    nt = truth.groupBy("tau").agg(F.count(F.lit(1)).alias("n_truth"))
    np_ = pred.agg(F.count(F.lit(1)).alias("n_pred"))
    taus_df = sub.sparkSession.range(1).select(tau_rows)
    out = (
        taus_df.join(nt.hint("shuffle_hash"), "tau", "left")
        .join(tp.hint("shuffle_hash"), "tau", "left")
        .crossJoin(np_)
    )
    ntc = F.coalesce(F.col("n_truth"), F.lit(0))
    tpc = F.coalesce(F.col("tp"), F.lit(0))
    return out.select(
        "tau",
        ntc.cast("long").alias("n_truth"),
        F.col("n_pred").cast("long").alias("n_pred"),
        tpc.cast("long").alias("tp"),
        (F.col("n_pred") - tpc).cast("long").alias("fp"),
        (ntc - tpc).cast("long").alias("fn"),
        rd(
            F.when(F.col("n_pred") > 0, tpc.cast("double") / F.col("n_pred"))
            .otherwise(F.lit(0.0)),
            6,
        ).alias("precision_at_tau"),
        rd(
            F.when(ntc > 0, tpc.cast("double") / ntc.cast("double"))
            .otherwise(F.lit(0.0)),
            6,
        ).alias("recall_at_tau"),
    )


@register(
    "dedup_lsh_eval_report",
    f"""
    WITH sub AS (
      SELECT doc_id, text FROM documents WHERE doc_id % 2 = 0
    ),
    shingled AS (
      SELECT doc_id,
             list_distinct(CASE WHEN len(w) >= 3
               THEN list_transform(generate_series(1, len(w) - 2),
                                   i -> array_to_string(list_slice(w, i, i + 2), ' '))
               ELSE [array_to_string(w, ' ')] END) AS grams
      FROM (SELECT doc_id, string_split(coalesce(text, ''), ' ') AS w FROM sub)
    ),
    sig AS ({_SIG_SQL}),
    bands AS (
      SELECT doc_id, b.band,
             md5(sig[b.band * 2 + 1] || '|' || sig[b.band * 2 + 2]) AS key
      FROM sig, (VALUES (0), (1), (2), (3)) AS b(band)
    ),
    pred AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
    ),
    {_EVAL_TRUTH_TAIL_SQL}
    """,
)
def _q_dedup_lsh_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MEASURED quality of the MinHash-LSH candidate generator against
    exact τ-Jaccard ground truth (the PPJoin exact path), at two
    relevance bars straddling the banding S-curve threshold
    ((1/b)^(1/r) ≈ 0.5 for 4 bands × 2 rows): per τ, exact
    TP/FP/FN counts, precision, recall. This is the eval that decides
    band geometry before anyone trusts LSH output at 100 TB — recall
    at τ=0.5 should be high (pairs at the S-curve knee), recall at
    τ=0.2 quantifies what the curve's tail forfeits. Truth comes from
    the zero-false-negative prefix join; both pair sets live on the
    doc-parity half corpus (the prefix query's own cost policy); the
    eval joins are (id, id)-keyed over bounded pair sets. The oracle
    replays BOTH generators brute-force."""
    sub = _table(spark, sf_dir, "documents").filter(F.col("doc_id") % 2 == 0)
    pred = dd.minhash_lsh_pairs(sub).select("id_a", "id_b")
    return _candidate_eval_frame(sub, pred)


@register(
    "text_lang_confusion",
    f"""
    WITH scored AS (
      SELECT doc_id, lang,
             {", ".join(f"{_lang_score_sql(lang)} AS s_{lang}" for lang in tx.LANG_MARKERS)}
      FROM documents
    ),
    pred AS (SELECT doc_id, lang, {_LANG_CASE} AS lang_pred FROM scored),
    cm AS (SELECT lang, lang_pred, count(*) AS n FROM pred GROUP BY lang, lang_pred),
    marg AS (SELECT lang, sum(n) AS n_label FROM cm GROUP BY lang)
    SELECT cm.lang, cm.lang_pred, CAST(cm.n AS BIGINT) AS n,
           CAST(marg.n_label AS BIGINT) AS n_label,
           {R("CAST(cm.n AS DOUBLE) / CAST(marg.n_label AS DOUBLE)", 6)}
             AS frac_of_label
    FROM cm JOIN marg ON marg.lang = cm.lang
    """,
)
def _q_text_lang_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID CONFUSION MATRIX — the n-gram marker heuristic
    (`tx.language_id`) evaluated against the corpus's stored lang
    labels: per (label, prediction) cell, count and share of the
    label's documents. The diagonal is per-language recall; off-
    diagonal mass says which marker sets collide (the eval a
    heuristic classifier needs before it gates a 100 TB mix — same
    measured-quality policy as `dedup_lsh_eval_report` and
    `emb_retrieval_mrr`). Scan-side scoring (regexp_count codegen),
    one |langs|²-bounded aggregation, one tiny margin join."""
    docs = _table(spark, sf_dir, "documents")
    pred = tx.language_id(docs).select("lang", "lang_pred")
    cm = pred.groupBy("lang", "lang_pred").agg(F.count(F.lit(1)).alias("n"))
    marg = cm.groupBy("lang").agg(F.sum("n").alias("n_label"))
    return cm.join(marg.hint("shuffle_hash"), "lang").select(
        "lang",
        "lang_pred",
        F.col("n").cast("long").alias("n"),
        F.col("n_label").cast("long").alias("n_label"),
        rd(
            F.col("n").cast("double") / F.col("n_label").cast("double"), 6
        ).alias("frac_of_label"),
    )


@register(
    "dedup_simhash_eval_report",
    f"""
    WITH sub AS (
      SELECT doc_id, text FROM documents WHERE doc_id % 2 = 0
    ),
    toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM sub
    ),
    hashed AS (
      SELECT doc_id, ('0x' || substr(md5(tok), 1, 15))::BIGINT AS h FROM toks
    ),
    bits AS (SELECT doc_id, {_SIMHASH_BITS_SQL} FROM hashed GROUP BY doc_id),
    fp AS (SELECT doc_id, {_SIMHASH_FP_SQL} AS simhash FROM bits),
    ck AS (
      SELECT doc_id, simhash, cb.combo_id, {_SIMHASH_KEY_SQL} AS cv
      FROM fp, (VALUES {_SIMHASH_COMBO_VALUES}) cb(combo_id, {_SIMHASH_COMBO_COLS})
    ),
    pred AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM ck a JOIN ck b
        ON a.combo_id = b.combo_id AND a.cv = b.cv AND a.doc_id < b.doc_id
      WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
    ),
    {_EVAL_TRUTH_TAIL_SQL}
    """,
)
def _q_dedup_simhash_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MEASURED quality of the SimHash hamming<=3 candidate generator
    against the SAME exact tau-Jaccard ground truth and SAME parity-half
    corpus as `dedup_lsh_eval_report` — together the two reports are the
    generator-selection matrix (precision/recall per tau, directly
    comparable cell-for-cell): SimHash targets cosine-of-token-counts,
    so its recall at Jaccard tau quantifies exactly what switching
    generators trades away. Shared `_candidate_eval_frame` engine;
    the oracle replays fingerprint + combinatorial blocking + hamming
    filter brute-force."""
    sub = _table(spark, sf_dir, "documents").filter(F.col("doc_id") % 2 == 0)
    fp = dd.simhash(sub)
    pred = dd.simhash_pairs(fp, max_hamming=3, n_chunks=_SIMHASH_M).select(
        "id_a", "id_b"
    )
    return _candidate_eval_frame(sub, pred)


def _pack_efficiency_agg(packed: DataFrame) -> DataFrame:
    """One-row packing audit over a pack-offsets frame (shared by the
    raw-corpus report and the dedup→budget→pack pipeline)."""
    agg = packed.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("n_tokens"),
        F.sum(
            F.when(F.col("first_seq") < F.col("last_seq"), 1).otherwise(0)
        ).alias("split_docs"),
        F.sum(F.col("last_seq") - F.col("first_seq") + 1).alias("fragments"),
    )
    nseq = F.expr("(n_tokens + 511) DIV 512")
    return agg.select(
        F.col("n_docs").cast("long").alias("n_docs"),
        F.col("n_tokens").cast("long").alias("n_tokens"),
        nseq.cast("long").alias("n_sequences"),
        F.col("split_docs").cast("long").alias("split_docs"),
        rd(F.col("split_docs").cast("double") / F.col("n_docs"), 6).alias(
            "split_frac"
        ),
        F.col("fragments").cast("long").alias("fragments"),
        rd(F.col("fragments").cast("double") / nseq, 6).alias("docs_per_seq"),
        (nseq * 512 - F.col("n_tokens")).cast("long").alias("tail_pad_tokens"),
        rd(F.col("n_tokens").cast("double") / (nseq * 512), 6).alias(
            "utilization"
        ),
    )


@register(
    "mix_pack_efficiency_report",
    f"""
    WITH toks AS (
      SELECT doc_id,
             CAST({_SQL_NTOK} AS BIGINT) AS n_tokens,
             {_SQL_H} AS h
      FROM documents
    ),
    c AS (
      SELECT doc_id, n_tokens,
             CAST(sum(n_tokens) OVER (ORDER BY h, doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS tok_end
      FROM toks
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
def _q_pack_efficiency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Packing-efficiency audit of the concat-and-chop layout
    (seq_len=512) — the report a training-data build reads before
    committing a mix to sequence files: how many docs straddle a
    sequence boundary (attention-mask fragmentation), mean docs per
    training sequence (fragments / n_sequences), and the layout's
    token utilization (concat-and-chop pads ONLY the final partial
    sequence, so utilization ~1 by construction — the row PROVES it,
    and the same report run on a pad-per-doc layout is the comparison
    that justifies packing). One aggregate row over the pack-offsets
    frame (`sp.sequence_pack_offsets`, scale-safe sharded prefix-sum);
    sequence count and tail pad in exact integer arithmetic (DIV), no
    scalar joins — a single-row select over one aggregation."""
    packed = sp.sequence_pack_offsets(
        _table(spark, sf_dir, "documents"), seq_len=512
    )
    return _pack_efficiency_agg(packed)


#: shared scorer-vs-C4-gate CTE chain (``sc``: doc_id → 6-dp logit;
#: ``surv``: C4 survivor ids) — factored so the calibration diagram and
#: the binned-AUC eval score the identical logit against the identical
#: label and can never drift.
_HLS_VS_C4_SQL = f"""{_C4_FEATS_SQL},
    surv AS (SELECT doc_id FROM ratios WHERE {_C4_CUM[-1]}),
    w AS (
      SELECT doc_id,
             list_filter(string_split(trim(text), ' '), x -> length(x) > 0) AS ws
      FROM documents WHERE text IS NOT NULL
    ),
    s AS (
      SELECT doc_id, len(ws) AS n,
             list_aggregate(list_transform(ws, t ->
               CAST({R("(('0x' || substr(md5('tsdt|hls' || '|' || t), 1, 8))::BIGINT) / 4294967296.0 - 0.5", 6)} AS DECIMAL(20,6))
             ), 'sum') AS tot
      FROM w WHERE len(ws) > 0
    ),
    sc AS (SELECT doc_id, {R("CAST(tot AS DOUBLE) / n", 6)} AS logit FROM s)"""


@register(
    "text_score_calibration",
    f"""
    WITH {_HLS_VS_C4_SQL},
    b AS (
      SELECT sc.logit,
             CASE WHEN surv.doc_id IS NOT NULL THEN 1 ELSE 0 END AS pass,
             least(CAST(floor((round(sc.logit * 1000000, 0) + 500000)
                              / 100000) AS INT), 9) AS bin
      FROM sc LEFT JOIN surv ON surv.doc_id = sc.doc_id
    )
    SELECT CAST(bin AS INTEGER) AS bin,
           {R("bin / 10.0 - 0.5", 6)} AS bin_lo,
           CAST(count(*) AS BIGINT) AS n_docs,
           {R(f"{_sql_dsum('logit', 6)} / count(*)", 6)} AS mean_logit,
           CAST(sum(pass) AS BIGINT) AS n_pass,
           {R("CAST(sum(pass) AS DOUBLE) / count(*)", 6)} AS pass_rate
    FROM b GROUP BY bin
    """,
)
def _q_text_score_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RELIABILITY DIAGRAM for the cheap model-based quality scorer:
    `tx.hashed_linear_score` logits binned into ten fixed-width bins
    over the score's closed range [-0.5, 0.5], each bin scored by the
    fraction of its documents that survive the EXPENSIVE rule-based
    C4 gate. This is the calibration eval that decides whether the
    one-scan linear scorer can pre-prune a 100 TB crawl before the
    48-string-pass C4 filter runs (monotone pass_rate across bins =
    yes, and the bin edges give the threshold): same measured-quality
    family as the LSH/SimHash eval matrix. Bin ids come from the
    ROUNDED 6-dp logit via exact integer micro-units (round to the
    integer grid first, divide on the grid — both engines floor the
    same rational), so no float bin-edge ambiguity exists. One scan
    per side, one doc_id-keyed left join, 10-row output."""
    docs = _table(spark, sf_dir, "documents")
    scores = tx.hashed_linear_score(docs).select("doc_id", "logit")
    surv = tx.c4_filter_survivors(docs).select(
        "doc_id", F.lit(1).alias("__pass")
    )
    j = scores.join(surv.hint("shuffle_hash"), "doc_id", "left")
    bin_col = F.least(
        F.floor(
            (F.round(F.col("logit") * 1000000, 0) + F.lit(500000))
            / F.lit(100000)
        ).cast("int"),
        F.lit(9),
    )
    binned = j.select(
        bin_col.alias("bin"),
        F.col("logit"),
        F.coalesce(F.col("__pass"), F.lit(0)).alias("pass"),
    )
    agg = binned.groupBy("bin").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        rd(_dsum(F.col("logit"), 6) / F.count(F.lit(1)), 6).alias("mean_logit"),
        F.sum("pass").cast("long").alias("n_pass"),
        rd(F.sum("pass").cast("double") / F.count(F.lit(1)), 6).alias(
            "pass_rate"
        ),
    )
    return agg.select(
        "bin",
        rd(F.col("bin") / F.lit(10.0) - F.lit(0.5), 6).alias("bin_lo"),
        "n_docs",
        "mean_logit",
        "n_pass",
        "pass_rate",
    )


@register(
    "stats_ks_halves_by_type",
    f"""
    WITH ev AS (
      SELECT event_type, epoch_us(ts) AS us, value AS v
      FROM events WHERE value IS NOT NULL
    ),
    rng AS (SELECT min(us) AS u0, max(us) AS u1 FROM ev),
    f AS (
      SELECT event_type, v,
             CASE WHEN us <= (u0 + u1) // 2 THEN 1 ELSE 0 END AS isa
      FROM ev CROSS JOIN rng
    ),
    r AS (
      SELECT event_type, v,
             sum(isa) OVER (PARTITION BY event_type ORDER BY v
                            ROWS UNBOUNDED PRECEDING) AS ca,
             sum(1 - isa) OVER (PARTITION BY event_type ORDER BY v
                                ROWS UNBOUNDED PRECEDING) AS cb,
             sum(isa) OVER (PARTITION BY event_type) AS na,
             sum(1 - isa) OVER (PARTITION BY event_type) AS nb,
             lead(v) OVER (PARTITION BY event_type ORDER BY v) AS nv
      FROM f
    ),
    l AS (SELECT * FROM r WHERE nv IS NULL OR nv <> v),
    m AS (
      SELECT event_type,
             max(abs(CAST(ca AS DECIMAL(38,0)) * nb
                     - CAST(cb AS DECIMAL(38,0)) * na)) AS dnum,
             max(na) AS n_a, max(nb) AS n_b
      FROM l GROUP BY event_type
    )
    SELECT event_type,
           CAST(n_a AS BIGINT) AS n_a,
           CAST(n_b AS BIGINT) AS n_b,
           {R("CAST(dnum AS DOUBLE)"
              " / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE))", 6)} AS ks_stat,
           {R("1.358 * sqrt((CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE))"
              " / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)))", 6)}
             AS c_alpha_05,
           CAST(CASE WHEN {R("CAST(dnum AS DOUBLE) / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE))", 6)}
                   > {R("1.358 * sqrt((CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE)) / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)))", 6)}
              THEN 1 ELSE 0 END AS INTEGER) AS drift_flag
    FROM m WHERE n_a > 0 AND n_b > 0
    """,
)
def _q_stats_ks_halves(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact two-sample Kolmogorov-Smirnov drift test per event type:
    the value distribution of the first time-half of the corpus vs the
    second (split at the integer midpoint of the event-time range) —
    the NONPARAMETRIC member of the drift family (chi2 = categorical,
    W1 = decile-matched magnitude, KS = max CDF gap, sensitive to
    shape changes W1's decile matching smooths over). The statistic is
    computed in EXACT INTEGER arithmetic end-to-end: the max CDF gap
    is max |ca·nb − cb·na| over decimal(38,0) cross-products (no float
    until the single final division), evaluated only at the last tie
    row of each distinct value (lead(v) ≠ v), which makes intra-tie
    window order irrelevant in both engines. One Exchange on
    event_type carries the two running sums, the partition totals, the
    lead, and the final max; the time-range midpoint is the sanctioned
    1-row scalar cross join. Output is |types| rows with the KS stat,
    the α=0.05 critical value (1.358·√((na+nb)/(na·nb)), IEEE sqrt is
    correctly rounded so both engines agree bit-for-bit), and the
    drift flag."""
    ev = _events(spark, sf_dir).filter(F.col("value").isNotNull())
    us = event_micros(ev)
    base = ev.select("event_type", us.alias("__us"), F.col("value").alias("__v"))
    rng = base.agg(F.min("__us").alias("__u0"), F.max("__us").alias("__u1"))
    flagged = base.crossJoin(F.broadcast(rng)).select(
        "event_type",
        "__v",
        F.when(
            F.col("__us") <= F.expr("(__u0 + __u1) DIV 2"), 1
        ).otherwise(0).alias("__isa"),
    )
    w = Window.partitionBy("event_type").orderBy(F.col("__v").asc())
    wcum = w.rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.partitionBy("event_type")
    r = flagged.select(
        "event_type",
        "__v",
        F.sum("__isa").over(wcum).alias("__ca"),
        F.sum(F.lit(1) - F.col("__isa")).over(wcum).alias("__cb"),
        F.sum("__isa").over(wall).alias("__na"),
        F.sum(F.lit(1) - F.col("__isa")).over(wall).alias("__nb"),
        F.lead("__v").over(w).alias("__nv"),
    )
    last = r.filter(F.col("__nv").isNull() | (F.col("__nv") != F.col("__v")))
    num = F.abs(
        F.col("__ca").cast("decimal(38,0)") * F.col("__nb")
        - F.col("__cb").cast("decimal(38,0)") * F.col("__na")
    )
    m = last.groupBy("event_type").agg(
        F.max(num).alias("__dnum"),
        F.max("__na").alias("__fna"),
        F.max("__nb").alias("__fnb"),
    ).filter((F.col("__fna") > 0) & (F.col("__fnb") > 0))
    ks = rd(
        F.col("__dnum").cast("double")
        / (F.col("__fna").cast("double") * F.col("__fnb").cast("double")),
        6,
    )
    c05 = rd(
        F.lit(1.358)
        * F.sqrt(
            (F.col("__fna").cast("double") + F.col("__fnb").cast("double"))
            / (F.col("__fna").cast("double") * F.col("__fnb").cast("double"))
        ),
        6,
    )
    return m.select(
        "event_type",
        F.col("__fna").cast("long").alias("n_a"),
        F.col("__fnb").cast("long").alias("n_b"),
        ks.alias("ks_stat"),
        c05.alias("c_alpha_05"),
        F.when(ks > c05, 1).otherwise(0).cast("int").alias("drift_flag"),
    )


@register(
    "stats_anova_value_by_type",
    f"""
    WITH e AS (
      SELECT event_type,
             CAST(CAST(floor(value * 10000.0 + 0.5) AS BIGINT)
                  AS DECIMAL(12,0)) AS sv
      FROM events WHERE value IS NOT NULL
    ),
    g AS (
      SELECT event_type, count(*) AS n,
             sum(CAST(sv AS DECIMAL(38,0))) AS s1,
             sum(CAST(CAST(sv * sv AS DECIMAL(19,0)) AS DECIMAL(38,0))) AS s2
      FROM e GROUP BY event_type
    ),
    t AS (
      SELECT event_type, n, s1, s2,
             CAST({R("CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n"
                     " / 100000000.0", 6)}
                  AS DECIMAL(38,6)) AS tg
      FROM g
    ),
    a AS (
      SELECT count(*) AS k, sum(n) AS nn,
             sum(s1) AS s1t, sum(s2) AS s2t, sum(tg) AS t1
      FROM t
    ),
    d AS (
      SELECT k, nn,
             {R("CAST(t1 AS DOUBLE) - " + R("CAST(s1t AS DOUBLE) * CAST(s1t AS DOUBLE) / nn / 100000000.0", 6), 6)} AS ssb,
             {R(R("CAST(s2t AS DOUBLE) / 100000000.0", 6) + " - CAST(t1 AS DOUBLE)", 6)} AS ssw
      FROM a
    )
    SELECT CAST(k AS BIGINT) AS k_groups,
           CAST(nn AS BIGINT) AS n,
           ssb AS ss_between, ssw AS ss_within,
           {R("(ssb / (k - 1)) / (ssw / (nn - k))", 6)} AS f_stat,
           {R("ssb / (ssb + ssw)", 6)} AS eta_squared
    FROM d
    """,
)
def _q_stats_anova(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA of value across event types — the parametric
    complement of the drift family (chi2/W1/KS ask "did it move over
    time"; ANOVA asks "do the type populations differ at all", the
    gate before type-conditioned normalization). Exact-arithmetic
    discipline throughout (the moments-query pattern): 4-dp scaled
    integer power sums in decimal(38,0) (partial-agg-order-proof), the
    per-group S²/n term computed once in IEEE double, DESCALED by the
    1e8 squared-scale factor BEFORE its 6-dp rounding (rd's floor
    lands in a long, which overflows for magnitudes past ~9.2e12 —
    descale-then-round keeps every rounded value inside the exact-long
    window; caught by the oracle gate), then decimal-summed across
    groups (order-independent). Two aggregations — one
    keyed by type (map-side combined), one over the |types|-row frame —
    no joins at all. Output: one row (k, N, SSB, SSW, F, η²)."""
    ev = _events(spark, sf_dir).filter(F.col("value").isNotNull())
    sv = (
        F.floor(F.col("value") * 10000.0 + 0.5)
        .cast("long")
        .cast("decimal(12,0)")
    )
    e = ev.select("event_type", sv.alias("__sv"))
    g = e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("__sv").cast("decimal(38,0)")).alias("__s1"),
        F.sum(
            (F.col("__sv") * F.col("__sv"))
            .cast("decimal(19,0)")
            .cast("decimal(38,0)")
        ).alias("__s2"),
    )
    t = g.select(
        "n",
        "__s1",
        "__s2",
        rd(
            F.col("__s1").cast("double")
            * F.col("__s1").cast("double")
            / F.col("n")
            / F.lit(100000000.0),
            6,
        )
        .cast("decimal(38,6)")
        .alias("__tg"),
    )
    a = t.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("n").alias("nn"),
        F.sum("__s1").alias("__s1t"),
        F.sum("__s2").alias("__s2t"),
        F.sum("__tg").alias("__t1"),
    )
    ssb = rd(
        F.col("__t1").cast("double")
        - rd(
            F.col("__s1t").cast("double")
            * F.col("__s1t").cast("double")
            / F.col("nn")
            / F.lit(100000000.0),
            6,
        ),
        6,
    )
    ssw = rd(
        rd(F.col("__s2t").cast("double") / F.lit(100000000.0), 6)
        - F.col("__t1").cast("double"),
        6,
    )
    d = a.select(
        F.col("k").cast("long").alias("k_groups"),
        F.col("nn").cast("long").alias("n"),
        ssb.alias("ss_between"),
        ssw.alias("ss_within"),
    )
    return d.select(
        "k_groups",
        "n",
        "ss_between",
        "ss_within",
        rd(
            (F.col("ss_between") / (F.col("k_groups") - 1))
            / (F.col("ss_within") / (F.col("n") - F.col("k_groups"))),
            6,
        ).alias("f_stat"),
        rd(
            F.col("ss_between")
            / (F.col("ss_between") + F.col("ss_within")),
            6,
        ).alias("eta_squared"),
    )


#: exact S-curve thresholds (1/b)^(1/r) for the three band geometries
#: of an 8-hash signature, computed ONCE in Python and injected as the
#: same literal into both engines (libm pow is 1-ulp engine-specific;
#: a shared literal is not).
_LSH_GEOMETRIES = [
    (8, 1, round((1.0 / 8.0) ** (1.0 / 1.0), 6)),
    (4, 2, round((1.0 / 4.0) ** (1.0 / 2.0), 6)),
    (2, 4, round((1.0 / 2.0) ** (1.0 / 4.0), 6)),
]


def _sql_band_pairs(b: int, r: int) -> str:
    key = " || '|' || ".join(f"sig[b.band * {r} + {k + 1}]" for k in range(r))
    bands = ", ".join(f"({i})" for i in range(b))
    return f"""
      SELECT count(*) AS n FROM (
        SELECT DISTINCT a.doc_id AS id_a, b2.doc_id AS id_b
        FROM (SELECT doc_id, b.band, md5({key}) AS key
              FROM sig, (VALUES {bands}) AS b(band)) a
        JOIN (SELECT doc_id, b.band, md5({key}) AS key
              FROM sig, (VALUES {bands}) AS b(band)) b2
          ON a.band = b2.band AND a.key = b2.key AND a.doc_id < b2.doc_id
      )"""


@register(
    "dedup_lsh_band_sweep",
    f"""
    WITH shingled AS ({_SH_SQL}),
    sig AS ({_SIG_SQL})
    {" UNION ALL ".join(
        f"SELECT {b} AS n_bands, {r} AS rows_per_band, "
        f"CAST({t} AS DOUBLE) AS s_curve_tau, "
        f"CAST(({_sql_band_pairs(b, r)}) AS BIGINT) AS n_candidate_pairs"
        for b, r, t in _LSH_GEOMETRIES
    )}
    """,
)
def _q_dedup_lsh_band_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Band-geometry OPERATING POINTS for the MinHash-LSH generator:
    from ONE 8-hash signature pass, the distinct candidate-pair volume
    of (8 bands × 1 row), (4 × 2) and (2 × 4) — the capacity-planning
    sweep run before committing a banding to a 100 TB dedup (more
    bands/shorter rows = lower S-curve threshold = more candidates;
    the S-curve knee (1/b)^(1/r) is printed beside each count, as a
    shared Python literal because libm pow is 1-ulp engine-specific).
    `dedup_lsh_eval_report` measures precision/recall AT the chosen
    point; this sweep prices the alternatives WITHOUT paying three
    exact-truth evaluations. Signatures compute once (lazy
    localCheckpoint — the pack-offsets pattern); each geometry is a
    bucketed (band, key) equi-join over bounded buckets."""
    sigs = dd.minhash_signatures(
        _table(spark, sf_dir, "documents")
    ).localCheckpoint(eager=False)
    rows = []
    for b, r, t in _LSH_GEOMETRIES:
        keys = sigs.select(
            "doc_id",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(band).alias("band"),
                            F.md5(
                                F.concat_ws(
                                    "|",
                                    *[
                                        F.col("sig")[band * r + k]
                                        for k in range(r)
                                    ],
                                )
                            ).alias("key"),
                        )
                        for band in range(b)
                    ]
                )
            ).alias("__bk"),
        ).select(
            "doc_id",
            F.col("__bk.band").alias("band"),
            F.col("__bk.key").alias("key"),
        )
        a = keys.select(
            F.col("doc_id").alias("id_a"), "band", "key"
        )
        bb = keys.select(
            F.col("doc_id").alias("id_b"), "band", "key"
        )
        pairs = (
            a.join(bb.hint("shuffle_hash"), ["band", "key"])
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b")
            .distinct()
        )
        rows.append(
            pairs.agg(
                F.count(F.lit(1)).cast("long").alias("n_candidate_pairs")
            ).select(
                F.lit(b).cast("int").alias("n_bands"),
                F.lit(r).cast("int").alias("rows_per_band"),
                F.lit(float(t)).alias("s_curve_tau"),
                "n_candidate_pairs",
            )
        )
    out = rows[0]
    for x in rows[1:]:
        out = out.unionByName(x)
    return out


@register(
    "dedup_containment_pairs",
    f"""
    WITH shingled AS ({_SH_SQL}),
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
    m AS (
      SELECT c.id_a, c.id_b,
             len(list_intersect(a.grams, b.grams)) AS inter,
             len(a.grams) AS n_a, len(b.grams) AS n_b
      FROM cand c
      JOIN shingled a ON a.doc_id = c.id_a
      JOIN shingled b ON b.doc_id = c.id_b
    ),
    s AS (
      SELECT id_a, id_b,
             CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
             CAST(inter AS BIGINT) AS n_common,
             {R("CAST(inter AS DOUBLE) / (n_a + n_b - inter)", 6)} AS jaccard,
             {R("CAST(inter AS DOUBLE) / least(n_a, n_b)", 6)} AS containment
      FROM m
    )
    SELECT *,
           CAST(CASE WHEN containment >= 0.6 AND jaccard < 0.5
                THEN 1 ELSE 0 END AS INTEGER) AS excerpt_flag
    FROM s WHERE containment >= 0.6
    """,
)
def _q_dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric n-gram containment over the LSH candidate set
    (`dd.ngram_containment_pairs`): the excerpt/quote near-dup class
    symmetric Jaccard misses — a short doc embedded in a long one has
    containment ≈ 1 while Jaccard stays under every dedup threshold.
    `excerpt_flag` marks pairs ONLY this operator catches. The oracle
    replays candidates and exact set arithmetic brute-force."""
    return dd.ngram_containment_pairs(
        _table(spark, sf_dir, "documents"), min_containment=0.6
    )


@register(
    "mix_grouped_kfold",
    f"""
    WITH d AS (
      SELECT source, CAST({_SQL_NTOK} AS BIGINT) AS n_tokens,
             ({sp.sql_hash_u32("source", "tsdt|fold")}) % 5 AS fold
      FROM documents
    ),
    f AS (
      SELECT fold, count(DISTINCT source) AS n_sources, count(*) AS n_docs,
             sum(n_tokens) AS n_tokens
      FROM d GROUP BY fold
    ),
    t AS (SELECT sum(n_tokens) AS tot FROM f)
    SELECT CAST(fold AS INTEGER) AS fold,
           CAST(n_sources AS BIGINT) AS n_sources,
           CAST(n_docs AS BIGINT) AS n_docs,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           {R("CAST(n_tokens AS DOUBLE) / tot", 6)} AS token_share
    FROM f CROSS JOIN t
    """,
)
def _q_mix_grouped_kfold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP-AWARE 5-fold assignment: every document of a source lands
    in the same fold (fold = md5-hash of the SOURCE, not the doc), so
    cross-validation and held-out splits can't leak near-duplicates
    that cluster within a source — the leakage-safe split a dedup'd
    corpus still needs (doc-level `mix_train_val_test_split` splits
    finer but lets one source straddle train/val). Report per fold:
    source count, doc count, token count, token share (the balance
    check hash-folding is supposed to deliver). One scan + one fold
    aggregation; the total is the sanctioned 1-row scalar."""
    docs = _table(spark, sf_dir, "documents")
    fold = (sp.hash_u32(F.col("source"), "tsdt|fold") % 5).cast("int")
    d = docs.select(
        "source",
        tx.token_count(F.col("text")).cast("long").alias("__ntok"),
        fold.alias("fold"),
    )
    f = d.groupBy("fold").agg(
        F.countDistinct("source").cast("long").alias("n_sources"),
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("__ntok").alias("__nt"),
    )
    t = f.agg(F.sum("__nt").alias("__tot"))
    return f.crossJoin(F.broadcast(t)).select(
        "fold",
        "n_sources",
        "n_docs",
        F.col("__nt").cast("long").alias("n_tokens"),
        rd(F.col("__nt").cast("double") / F.col("__tot"), 6).alias(
            "token_share"
        ),
    )


@register(
    "feature_pointintime_state",
    """
    WITH e AS (
      SELECT user_id, epoch_us(ts) AS t_us, event_id, event_type
      FROM events WHERE event_type <> 'purchase'
    ),
    m AS (
      SELECT *,
             CASE WHEN lag(event_type) OVER w IS NULL
                       OR lag(event_type) OVER w <> event_type
                  THEN 1 ELSE 0 END AS chg
      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t_us, event_id)
    ),
    v AS (
      SELECT *, sum(chg) OVER (
        PARTITION BY user_id ORDER BY t_us, event_id
        ROWS UNBOUNDED PRECEDING
      ) AS version
      FROM m
    ),
    g AS (
      SELECT user_id, version, min(event_type) AS event_type,
             min(t_us) AS valid_from_us
      FROM v GROUP BY user_id, version
    ),
    dim AS (
      SELECT user_id, version, event_type, valid_from_us,
             lead(valid_from_us) OVER (
               PARTITION BY user_id ORDER BY version
             ) AS valid_to_us
      FROM g
    ),
    fact AS (
      SELECT event_id, user_id, epoch_us(ts) AS t_us
      FROM events WHERE event_type = 'purchase'
    )
    SELECT f.event_id, f.user_id, f.t_us,
           d.event_type AS state_type,
           CAST(d.version AS BIGINT) AS state_version,
           CAST(f.t_us - d.valid_from_us AS BIGINT) AS state_age_us
    FROM fact f
    LEFT JOIN dim d
      ON d.user_id = f.user_id
     AND d.valid_from_us <= f.t_us
     AND (d.valid_to_us IS NULL OR f.t_us < d.valid_to_us)
    """,
)
def _q_feature_pointintime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """POINT-IN-TIME feature join — the feature-store operation that
    prevents training-serving skew: each purchase event is joined to
    the user's browsing-state SCD2 interval (built from the NON-purchase
    stream, the scd2_user_state_history machinery) that was valid AT
    the purchase instant, never to a later state (no feature leakage
    from the future). Because SCD2 intervals partition each user's
    timeline, the interval predicate matches at most one dimension row
    — no post-join dedup. Plan: the dim build is one user-keyed window
    pass; the join is a user_id-keyed shuffle-hash LEFT join with the
    interval bounds as residual filter (equi-key present — this is NOT
    the no-equi-key BNLJ class); purchases before any state keep a
    NULL state row, proving the as-of semantics honest."""
    e = _events_us(spark, sf_dir)
    browse = e.filter(F.col("event_type") != "purchase")
    w = Window.partitionBy("user_id").orderBy(
        F.col("t_us").asc(), F.col("event_id").asc()
    )
    chg = F.when(
        F.lag("event_type", 1).over(w).isNull()
        | (F.lag("event_type", 1).over(w) != F.col("event_type")),
        1,
    ).otherwise(0)
    v = browse.select(
        "user_id", "t_us", "event_id", "event_type", chg.alias("__chg")
    ).withColumn(
        "version",
        F.sum("__chg").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    g = v.groupBy("user_id", "version").agg(
        F.min("event_type").alias("__stype"),
        F.min("t_us").alias("__from"),
    )
    wv = Window.partitionBy("user_id").orderBy(F.col("version").asc())
    dim = g.select(
        F.col("user_id").alias("__du"),
        "version",
        "__stype",
        "__from",
        F.lead("__from", 1).over(wv).alias("__to"),
    )
    fact = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "t_us"
    )
    cond = (
        (F.col("__du") == F.col("user_id"))
        & (F.col("__from") <= F.col("t_us"))
        & (F.col("__to").isNull() | (F.col("t_us") < F.col("__to")))
    )
    j = fact.join(dim.hint("shuffle_hash"), cond, "left")
    return j.select(
        "event_id",
        "user_id",
        "t_us",
        F.col("__stype").alias("state_type"),
        F.col("version").cast("long").alias("state_version"),
        (F.col("t_us") - F.col("__from")).cast("long").alias("state_age_us"),
    )


_W7D_US = 7 * 24 * 3_600_000_000


@register(
    "feature_rolling_past_window",
    f"""
    WITH e AS (
      SELECT event_id, user_id, epoch_us(ts) AS t_us, value
      FROM events
    )
    SELECT event_id, user_id, t_us,
           CAST(coalesce(count(*) OVER w, 0) AS BIGINT) AS n_past_7d,
           CAST(coalesce(sum(CAST({sql_rd("value", 4)} AS DECIMAL(38,6)))
                         OVER w, 0) AS DOUBLE) AS sum_value_past_7d
    FROM e
    WINDOW w AS (PARTITION BY user_id ORDER BY t_us
                 RANGE BETWEEN {_W7D_US} PRECEDING AND 1 PRECEDING)
    """,
)
def _q_feature_rolling_past(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEAKAGE-SAFE rolling features at event time: for every event,
    the count and value-sum of the same user's events in the STRICTLY
    PAST 7 days (RANGE frame [t−7d, t−1] — simultaneous events are
    excluded by the value-based frame, so tie order can never leak the
    current row into its own feature). This is the at-training-time
    twin of the point-in-time join: features computed only from what
    was knowable before t. The float sum accumulates 4-dp decimals
    inside the frame (frame CONTENT is t-range-defined and therefore
    engine-identical even when tie ORDER differs — a ROWS frame here
    would be nondeterministic, a RANGE frame is provably not). ONE
    user-keyed Exchange; the window is a single pass."""
    e = _events_us(spark, sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("t_us").asc())
        .rangeBetween(-_W7D_US, -1)
    )
    return e.select(
        "event_id",
        "user_id",
        "t_us",
        F.coalesce(F.count(F.lit(1)).over(w), F.lit(0))
        .cast("long")
        .alias("n_past_7d"),
        F.coalesce(
            F.sum(rd(F.col("value"), 4).cast("decimal(38,6)")).over(w),
            F.lit(0).cast("decimal(38,6)"),
        )
        .cast("double")
        .alias("sum_value_past_7d"),
    )


@register(
    "dedup_impact_by_source",
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
    tok AS (
      SELECT doc_id, source, CAST({_SQL_NTOK} AS BIGINT) AS t FROM documents
    ),
    ex AS (SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)),
    base AS (
      SELECT source, count(*) AS n_docs, sum(t) AS n_tokens
      FROM tok GROUP BY source
    ),
    e AS (
      SELECT source, count(*) AS n_docs_exact, sum(t) AS n_tokens_exact
      FROM tok JOIN ex USING (doc_id) GROUP BY source
    ),
    nr AS (
      SELECT source, count(*) AS n_docs_near, sum(t) AS n_tokens_near
      FROM tok JOIN cl ON cl.doc_id = tok.doc_id
                      AND cl.doc_id = cl.cluster_id
      GROUP BY source
    )
    SELECT b.source,
           CAST(b.n_docs AS BIGINT) AS n_docs,
           CAST(b.n_tokens AS BIGINT) AS n_tokens,
           CAST(coalesce(e.n_docs_exact, 0) AS BIGINT) AS n_docs_exact,
           CAST(coalesce(e.n_tokens_exact, 0) AS BIGINT) AS n_tokens_exact,
           CAST(coalesce(nr.n_docs_near, 0) AS BIGINT) AS n_docs_near,
           CAST(coalesce(nr.n_tokens_near, 0) AS BIGINT) AS n_tokens_near,
           {R("1.0 - CAST(coalesce(nr.n_tokens_near, 0) AS DOUBLE)"
              " / b.n_tokens", 6)} AS pct_tokens_removed_near
    FROM base b
    LEFT JOIN e USING (source)
    LEFT JOIN nr USING (source)
    """,
)
def _q_dedup_impact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WHAT DEDUP COSTS EACH SOURCE — the before/after report a mix
    owner reads before re-weighting: per source, doc and token counts
    raw, after exact dedup (min-id per md5 digest), and after near-dup
    clustering (connected components over the LSH candidate graph,
    survivors = cluster representatives). A source whose token mass
    halves under near-dedup was padding the mix with near-copies; the
    mix weights must be recomputed AFTER this table, not before
    (`mix_token_budget_per_source` consumes exactly these counts).
    Composition of proven pieces: exact groups (digest shuffle), LSH
    pairs (bucketed), min-label CC (bounded rounds, localCheckpoint),
    three per-source aggregations joined on the tiny source key. The
    oracle replays CC with a recursive CTE (the dedup_clusters
    precedent)."""
    docs = _table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", "source", tx.token_count(F.col("text")).cast("long").alias("__t")
    )
    base = tok.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("__t").alias("n_tokens")
    )
    keep_exact = dd.exact_dedup_groups(docs).select(
        F.col("keep_id").alias("doc_id")
    )
    e = (
        tok.join(keep_exact.hint("shuffle_hash"), "doc_id", "left_semi")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs_exact"),
            F.sum("__t").alias("n_tokens_exact"),
        )
    )
    comp = dd.dedup_components(docs)
    keep_near = comp.filter(F.col("doc_id") == F.col("cluster_id")).select(
        "doc_id"
    )
    nr = (
        tok.join(keep_near.hint("shuffle_hash"), "doc_id", "left_semi")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs_near"),
            F.sum("__t").alias("n_tokens_near"),
        )
    )
    out = (
        base.join(e.hint("shuffle_hash"), "source", "left")
        .join(nr.hint("shuffle_hash"), "source", "left")
    )
    ntn = F.coalesce(F.col("n_tokens_near"), F.lit(0))
    return out.select(
        "source",
        F.col("n_docs").cast("long").alias("n_docs"),
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.coalesce(F.col("n_docs_exact"), F.lit(0))
        .cast("long")
        .alias("n_docs_exact"),
        F.coalesce(F.col("n_tokens_exact"), F.lit(0))
        .cast("long")
        .alias("n_tokens_exact"),
        F.coalesce(F.col("n_docs_near"), F.lit(0))
        .cast("long")
        .alias("n_docs_near"),
        ntn.cast("long").alias("n_tokens_near"),
        rd(
            F.lit(1.0) - ntn.cast("double") / F.col("n_tokens").cast("double"),
            6,
        ).alias("pct_tokens_removed_near"),
    )


@register(
    "emb_ood_zscore_by_label",
    f"""
    WITH m AS (
      SELECT label, u['i'] - 1 AS i,
             {sql_rd("CAST(sum(CAST(" + sql_rd("x", 9) + " AS DECIMAL(38,9))) AS DOUBLE) / count(*)", 6)} AS m
      FROM (SELECT label, u FROM (SELECT label,
                   unnest(list_transform(embedding, (x, i) -> {{'v': x, 'i': i}})) AS u
            FROM embeddings)),
           LATERAL (SELECT CAST(u['v'] AS DOUBLE) AS x)
      GROUP BY label, u['i'] - 1
    ),
    ex AS (
      SELECT vec_id, label, u['i'] - 1 AS i, CAST(u['v'] AS DOUBLE) AS x
      FROM (SELECT vec_id, label,
                   unnest(list_transform(embedding, (x, i) -> {{'v': x, 'i': i}})) AS u
            FROM embeddings)
    ),
    pv AS (
      SELECT e.label, e.vec_id,
             CAST(sum(CAST({sql_rd("e.x * c.m", 9)} AS DECIMAL(38,9))) AS DOUBLE) AS dxy,
             CAST(sum(CAST({sql_rd("e.x * e.x", 9)} AS DECIMAL(38,9))) AS DOUBLE) AS dxx,
             CAST(sum(CAST({sql_rd("c.m * c.m", 9)} AS DECIMAL(38,9))) AS DOUBLE) AS dyy
      FROM ex e JOIN m c ON c.label = e.label AND c.i = e.i
      GROUP BY e.label, e.vec_id
    ),
    cs AS (
      SELECT label, vec_id,
             {R("dxy / (sqrt(dxx) * sqrt(dyy))", 6)} AS c
      FROM pv
    ),
    st AS (
      SELECT *,
             {R(f"CAST(sum(CAST({sql_rd('c', 6)} AS DECIMAL(38,6))) OVER wl AS DOUBLE) / count(*) OVER wl", 6)} AS mu,
             {R(f"CAST(sum(CAST({sql_rd('c * c', 12)} AS DECIMAL(38,12))) OVER wl AS DOUBLE) / count(*) OVER wl", 12)} AS msq
      FROM cs WINDOW wl AS (PARTITION BY label)
    ),
    zz AS (
      SELECT vec_id, label, c,
             sqrt(greatest(msq - mu * mu, 0.0)) AS sig, mu
      FROM st
    )
    SELECT vec_id, label, c AS cos_centroid,
           CASE WHEN sig > 0 THEN {R("(c - mu) / sig", 6)} ELSE 0.0 END
             AS z_score,
           CAST(CASE WHEN abs(CASE WHEN sig > 0 THEN {R("(c - mu) / sig", 6)}
                              ELSE 0.0 END) >= 2.0
                THEN 1 ELSE 0 END AS INTEGER) AS ood_flag
    FROM zz
    """,
)
def _q_emb_ood(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector OOD audit (`sim.centroid_ood_zscores`): cosine to the
    vector's own label centroid, z-scored within the label — |z| ≥ 2
    flags probable mislabels/outliers before they poison contrastive
    training or centroid-assuming dedup. Decimal-exact centroids, one
    map-side-combined cosine aggregation, label-keyed stats window."""
    return sim.centroid_ood_zscores(_table(spark, sf_dir, "embeddings"))


_BITS_SWEEP = (6, 8, 10)


@register(
    "emb_lsh_bits_sweep",
    f"""
    WITH ex AS ({_EX_SQL}),
    planes AS (
      SELECT b.b, i.i,
             ('0x' || substr(md5('tsdt|t0|' || b.b || '|' || i.i), 1, 8))::BIGINT
               / 2147483648.0 - 1.0 AS w
      FROM generate_series(0, {max(_BITS_SWEEP) - 1}) b(b),
           generate_series(0, 63) i(i)
    ),
    pdots AS (
      SELECT e.vec_id, p.b,
             CAST(sum(CAST({sql_rd("e.x * p.w", 9)} AS DECIMAL(38,9))) AS DOUBLE) AS d
      FROM ex e JOIN planes p ON p.i = e.i - 1
      GROUP BY e.vec_id, p.b
    ),
    sigs AS (
      SELECT vec_id,
             sum(CASE WHEN d > 0 THEN CAST(1 AS BIGINT) << b ELSE 0 END) AS sig
      FROM pdots GROUP BY vec_id
    )
    {" UNION ALL ".join(
        f'''SELECT {b} AS n_bits, CAST(count(*) AS BIGINT) AS n_buckets,
           CAST(max(m) AS BIGINT) AS max_bucket,
           CAST(sum(m * (m - 1) / 2) AS BIGINT) AS n_candidate_pairs
        FROM (SELECT sig % {1 << b} AS bucket, count(*) AS m
              FROM sigs GROUP BY sig % {1 << b})'''
        for b in _BITS_SWEEP
    )}
    """,
)
def _q_emb_lsh_bits_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hyperplane-LSH OPERATING POINTS for the embedding blocker: from
    ONE 10-bit signature pass (decimal-exact dot signs), the bucket
    count, largest bucket, and within-bucket candidate volume at 6, 8
    and 10 bits — bits b uses the LOWER b bits of the same plane pool,
    so bucket structure NESTS (more bits strictly refine) and candidate
    volume is monotone non-increasing, the embedding twin of
    `dedup_lsh_band_sweep`'s banding theorem. This is the sweep that
    picks `_knn_bits`'s operating point with numbers instead of the
    log2 rule alone. Signature cost is paid once (lazy localCheckpoint);
    each operating point is a bucket groupBy over (id, sig) longs."""
    emb = _table(spark, sf_dir, "embeddings")
    sigs = (
        sim.lsh_signatures(emb, dim=64, bits=max(_BITS_SWEEP), tables=1)
        .select("vec_id", "sig")
        .localCheckpoint(eager=False)
    )
    rows = []
    for b in _BITS_SWEEP:
        buckets = sigs.groupBy(
            F.pmod(F.col("sig"), F.lit(1 << b)).alias("bucket")
        ).agg(F.count(F.lit(1)).alias("m"))
        rows.append(
            buckets.agg(
                F.count(F.lit(1)).cast("long").alias("n_buckets"),
                F.max("m").cast("long").alias("max_bucket"),
                F.sum(
                    (F.col("m") * (F.col("m") - 1) / 2).cast("long")
                ).cast("long").alias("n_candidate_pairs"),
            ).select(
                F.lit(b).cast("int").alias("n_bits"),
                "n_buckets",
                "max_bucket",
                "n_candidate_pairs",
            )
        )
    out = rows[0]
    for x in rows[1:]:
        out = out.unionByName(x)
    return out


@register(
    "sample_neyman_allocation",
    f"""
    WITH d AS (
      SELECT source, CAST({_SQL_NTOK} AS BIGINT) AS t FROM documents
    ),
    g AS (
      SELECT source, count(*) AS n,
             sum(CAST(t AS DECIMAL(38,0))) AS s1,
             sum(CAST(t * t AS DECIMAL(38,0))) AS s2
      FROM d GROUP BY source
    ),
    v AS (
      SELECT source, n,
             {R("sqrt(greatest(CAST(s2 AS DOUBLE) / n"
                " - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n),"
                " 0.0))", 6)} AS sigma
      FROM g
    ),
    w AS (SELECT *, CAST({R("n * sigma", 6)} AS DECIMAL(38,6)) AS wgt FROM v),
    tot AS (SELECT sum(wgt) AS tw FROM w)
    SELECT source, CAST(n AS BIGINT) AS n_docs, sigma AS sigma_tokens,
           {R("CAST(wgt AS DOUBLE) / CAST(tw AS DOUBLE)", 6)} AS share,
           CAST(floor(1000.0 * (CAST(wgt AS DOUBLE) / CAST(tw AS DOUBLE)) + 0.5)
                AS BIGINT) AS n_alloc
    FROM w CROSS JOIN tot
    """,
)
def _q_sample_neyman(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEYMAN ALLOCATION for a stratified sample (budget 1000 docs):
    each source's share ∝ N_h·σ_h (stratum size × token-count
    std-dev), the variance-minimizing allocation for estimating corpus
    token statistics from a sample — the statistics-literate upgrade
    of proportional stratified sampling (`sample_stratified_by_source`
    samples at a flat rate; Neyman oversamples high-variance strata).
    Integer-exact power sums per stratum (token counts are ints —
    decimal(38,0), no scaling needed), one IEEE sqrt per stratum, the
    σ·N weights 6-dp-rounded into decimal before the share division;
    the total is the sanctioned 1-row scalar."""
    docs = _table(spark, sf_dir, "documents")
    d = docs.select(
        "source", tx.token_count(F.col("text")).cast("long").alias("__t")
    )
    g = d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("__t").cast("decimal(38,0)")).alias("__s1"),
        F.sum((F.col("__t") * F.col("__t")).cast("decimal(38,0)")).alias(
            "__s2"
        ),
    )
    sigma = rd(
        F.sqrt(
            F.greatest(
                F.col("__s2").cast("double") / F.col("n")
                - (F.col("__s1").cast("double") / F.col("n"))
                * (F.col("__s1").cast("double") / F.col("n")),
                F.lit(0.0),
            )
        ),
        6,
    )
    w = g.select(
        "source",
        F.col("n"),
        sigma.alias("sigma"),
        rd(F.col("n") * sigma, 6).cast("decimal(38,6)").alias("__wgt"),
    )
    tot = w.agg(F.sum("__wgt").alias("__tw"))
    share = F.col("__wgt").cast("double") / F.col("__tw").cast("double")
    return w.crossJoin(F.broadcast(tot)).select(
        "source",
        F.col("n").cast("long").alias("n_docs"),
        F.col("sigma").alias("sigma_tokens"),
        rd(share, 6).alias("share"),
        F.floor(F.lit(1000.0) * share + F.lit(0.5))
        .cast("long")
        .alias("n_alloc"),
    )


@register(
    "ts_anomaly_seasonal_residual",
    f"""
    WITH e AS (
      SELECT user_id, epoch_us(ts) // {_SD_HOUR_US} AS bucket,
             CAST(floor(value * 10000.0 + 0.5) AS BIGINT) AS sv
      FROM events
    ),
    b AS (
      SELECT user_id, bucket, count(*) AS n, sum(sv) AS ssum
      FROM e GROUP BY user_id, bucket
    ),
    t AS (
      SELECT *, sum(ssum) OVER w AS tsum, sum(n) OVER w AS tn
      FROM b WINDOW w AS (
        PARTITION BY user_id ORDER BY bucket
        ROWS BETWEEN 12 PRECEDING AND 11 FOLLOWING
      )
    ),
    d AS (
      SELECT user_id, bucket, bucket % 24 AS hour_of_day,
             {R("CAST(ssum AS DOUBLE) / n / 10000.0 - CAST(tsum AS DOUBLE) / tn / 10000.0", 6)} AS dd
      FROM t
    ),
    s AS (
      SELECT user_id, bucket,
             {R("dd - " + R("CAST(sum(CAST(dd AS DECIMAL(38,6))) OVER ws AS DOUBLE) / count(*) OVER ws", 6), 6)} AS residual
      FROM d WINDOW ws AS (PARTITION BY user_id, hour_of_day)
    ),
    m AS (
      SELECT user_id, residual,
             quantile_cont(residual, 0.5) OVER (PARTITION BY user_id) AS med
      FROM s
    ),
    dv AS (
      SELECT user_id, residual, med, abs(residual - med) AS dev FROM m
    ),
    md AS (
      SELECT *, quantile_cont(dev, 0.5) OVER (PARTITION BY user_id) AS mad
      FROM dv
    )
    SELECT user_id, count(*) AS n,
           CAST(sum(CASE WHEN dev > 3.0 * mad THEN 1 ELSE 0 END) AS BIGINT)
             AS n_outliers,
           {R("any_value(med)", 6)} AS med,
           {R("any_value(mad)", 6)} AS mad
    FROM md GROUP BY user_id
    """,
)
def _q_ts_anomaly_seasonal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anomalous hours AFTER de-seasonalizing: the classical
    decomposition's residual stream fed to the median/MAD outlier rule
    — the composition that separates "weird hour" from "busy time of
    day" (raw MAD on hourly levels flags every rush hour; residual MAD
    flags only departures from trend + seasonal pattern — the right
    anomaly gate for metrics with daily rhythm). Pure composition of
    two proven single-Exchange operators on the same trial key
    (`ts.seasonal_decompose_hourly` → `ts.mad_outliers` on residual):
    the exchange is shared end-to-end."""
    dec = ts.seasonal_decompose_hourly(_events_us(spark, sf_dir))
    return ts.mad_outliers(dec, key_col="user_id", value_col="residual", k=3.0)


@register(
    "mix_budget_after_dedup",
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
    c AS (
      SELECT doc_id, source, n_tokens,
             CAST(sum(n_tokens) OVER (PARTITION BY source ORDER BY h, doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS cum_tokens
      FROM toks
    )
    SELECT doc_id, source, n_tokens, cum_tokens
    FROM c WHERE cum_tokens <= {_MIX_BUDGET}
    """,
)
def _q_mix_budget_after_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THE ORDER THAT MATTERS, MADE EXPLICIT: the per-source token
    budget applied AFTER near-dedup (survivors of the LSH + connected
    components pipeline), not before. Budgeting first and deduping
    second under-fills every dup-heavy source (its budget was spent on
    copies that dedup then removes); this composition spends the
    budget entirely on surviving documents — the pipeline
    `dedup_impact_by_source` tells you to run. Same proven pieces:
    bucketed LSH pairs, min-label CC, one stratum-keyed budget window
    over the deduped stream."""
    docs = _table(spark, sf_dir, "documents")
    comp = dd.dedup_components(docs)
    keep = comp.filter(F.col("doc_id") == F.col("cluster_id")).select("doc_id")
    surv = docs.join(keep.hint("shuffle_hash"), "doc_id", "left_semi")
    out = sp.token_budget_per_stratum(surv, _MIX_BUDGET)
    return out.select("doc_id", "source", "n_tokens", "cum_tokens")


@register(
    "stats_cuped_halves",
    f"""
    WITH ev AS (
      SELECT user_id, epoch_us(ts) AS us,
             CAST(floor(value * 10000.0 + 0.5) AS BIGINT) AS sv
      FROM events WHERE value IS NOT NULL
    ),
    rng AS (SELECT min(us) AS u0, max(us) AS u1 FROM ev),
    f AS (
      SELECT user_id, sv,
             CASE WHEN us <= (u0 + u1) // 2 THEN 1 ELSE 0 END AS isa
      FROM ev CROSS JOIN rng
    ),
    u AS (
      SELECT user_id,
             sum(CASE WHEN isa = 1 THEN 1 ELSE 0 END) AS na,
             sum(CASE WHEN isa = 1 THEN sv ELSE 0 END) AS sa,
             sum(CASE WHEN isa = 0 THEN 1 ELSE 0 END) AS nb,
             sum(CASE WHEN isa = 0 THEN sv ELSE 0 END) AS sb
      FROM f GROUP BY user_id
    ),
    xy AS (
      SELECT user_id,
             {R("CAST(sa AS DOUBLE) / na / 10000.0", 6)} AS x,
             {R("CAST(sb AS DOUBLE) / nb / 10000.0", 6)} AS y
      FROM u WHERE na > 0 AND nb > 0
    ),
    s AS (
      SELECT count(*) AS n,
             CAST(sum(CAST({sql_rd("x", 6)} AS DECIMAL(38,6))) AS DOUBLE) AS sx,
             CAST(sum(CAST({sql_rd("y", 6)} AS DECIMAL(38,6))) AS DOUBLE) AS sy,
             CAST(sum(CAST({sql_rd("x * x", 12)} AS DECIMAL(38,12))) AS DOUBLE) AS sxx,
             CAST(sum(CAST({sql_rd("y * y", 12)} AS DECIMAL(38,12))) AS DOUBLE) AS syy,
             CAST(sum(CAST({sql_rd("x * y", 12)} AS DECIMAL(38,12))) AS DOUBLE) AS sxy
      FROM xy
    ),
    m AS (
      SELECT n,
             sxx / n - (sx / n) * (sx / n) AS vx,
             syy / n - (sy / n) * (sy / n) AS vy,
             sxy / n - (sx / n) * (sy / n) AS cxy
      FROM s
    )
    SELECT CAST(n AS BIGINT) AS n_users,
           {R("cxy / vx", 6)} AS theta,
           {R("vy", 6)} AS var_y,
           {R("vy - cxy * cxy / vx", 6)} AS var_y_adjusted,
           {R("(cxy * cxy / vx) / vy", 6)} AS variance_reduction
    FROM m
    """,
)
def _q_stats_cuped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED variance reduction (Deng et al. 2013 — the experimentation
    workhorse): per user, the FIRST time-half mean value is the
    pre-experiment covariate x, the second-half mean the metric y;
    θ = cov/var(x) and var(y − θ(x − x̄)) = var(y) − cov²/var(x) (the
    closed form — no second pass). `variance_reduction` is the
    fraction of metric variance the covariate removes, i.e. how much
    smaller an A/B test this corpus could run. Exactness: per-user
    sums are 4-dp scaled integers; user means are 6-dp rounded; the
    cross-user moment sums accumulate on fixed decimal grids
    (x·y exact at 12 dp), so θ reproduces bit-for-bit. One user-keyed
    aggregation + one 1-row combine; the midpoint is the sanctioned
    scalar."""
    ev = _events(spark, sf_dir).filter(F.col("value").isNotNull())
    us = event_micros(ev)
    sv = F.floor(F.col("value") * 10000.0 + 0.5).cast("long")
    base = ev.select("user_id", us.alias("__us"), sv.alias("__sv"))
    rng = base.agg(F.min("__us").alias("__u0"), F.max("__us").alias("__u1"))
    f = base.crossJoin(F.broadcast(rng)).select(
        "user_id",
        "__sv",
        F.when(F.col("__us") <= F.expr("(__u0 + __u1) DIV 2"), 1)
        .otherwise(0)
        .alias("__isa"),
    )
    u = f.groupBy("user_id").agg(
        F.sum(F.when(F.col("__isa") == 1, 1).otherwise(0)).alias("__na"),
        F.sum(F.when(F.col("__isa") == 1, F.col("__sv")).otherwise(0)).alias(
            "__sa"
        ),
        F.sum(F.when(F.col("__isa") == 0, 1).otherwise(0)).alias("__nb"),
        F.sum(F.when(F.col("__isa") == 0, F.col("__sv")).otherwise(0)).alias(
            "__sb"
        ),
    )
    xy = u.filter((F.col("__na") > 0) & (F.col("__nb") > 0)).select(
        rd(F.col("__sa").cast("double") / F.col("__na") / 10000.0, 6).alias(
            "__x"
        ),
        rd(F.col("__sb").cast("double") / F.col("__nb") / 10000.0, 6).alias(
            "__y"
        ),
    )
    s = xy.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(rd(F.col("__x"), 6).cast("decimal(38,6)"))
        .cast("double")
        .alias("sx"),
        F.sum(rd(F.col("__y"), 6).cast("decimal(38,6)"))
        .cast("double")
        .alias("sy"),
        F.sum(rd(F.col("__x") * F.col("__x"), 12).cast("decimal(38,12)"))
        .cast("double")
        .alias("sxx"),
        F.sum(rd(F.col("__y") * F.col("__y"), 12).cast("decimal(38,12)"))
        .cast("double")
        .alias("syy"),
        F.sum(rd(F.col("__x") * F.col("__y"), 12).cast("decimal(38,12)"))
        .cast("double")
        .alias("sxy"),
    )
    m = s.select(
        "n",
        (
            F.col("sxx") / F.col("n")
            - (F.col("sx") / F.col("n")) * (F.col("sx") / F.col("n"))
        ).alias("vx"),
        (
            F.col("syy") / F.col("n")
            - (F.col("sy") / F.col("n")) * (F.col("sy") / F.col("n"))
        ).alias("vy"),
        (
            F.col("sxy") / F.col("n")
            - (F.col("sx") / F.col("n")) * (F.col("sy") / F.col("n"))
        ).alias("cxy"),
    )
    return m.select(
        F.col("n").cast("long").alias("n_users"),
        rd(F.col("cxy") / F.col("vx"), 6).alias("theta"),
        rd(F.col("vy"), 6).alias("var_y"),
        rd(
            F.col("vy") - F.col("cxy") * F.col("cxy") / F.col("vx"), 6
        ).alias("var_y_adjusted"),
        rd(
            (F.col("cxy") * F.col("cxy") / F.col("vx")) / F.col("vy"), 6
        ).alias("variance_reduction"),
    )


@register(
    "dq_freshness_by_type",
    """
    WITH e AS (SELECT event_type, epoch_us(ts) AS us FROM events),
    g AS (
      SELECT event_type, count(*) AS n, max(us) AS max_us
      FROM e GROUP BY event_type
    ),
    t AS (SELECT max(max_us) AS global_max FROM g)
    SELECT event_type, CAST(n AS BIGINT) AS n,
           CAST(max_us AS BIGINT) AS max_us,
           CAST(global_max - max_us AS BIGINT) AS lag_us,
           CAST(CASE WHEN global_max - max_us > 21600000000
                THEN 1 ELSE 0 END AS INTEGER) AS stale_flag
    FROM g CROSS JOIN t
    """,
)
def _q_dq_freshness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingest FRESHNESS audit per event type: each type's newest event
    vs the newest event anywhere; a type lagging > 6 h is a stalled
    upstream (the standard DQ freshness check next to the nulls/FK
    gate `dq_expectations_report` and the continuous
    `stream_dq_violations`). One map-side-combined aggregation; the
    global max is the sanctioned 1-row scalar."""
    ev = _events(spark, sf_dir)
    us = event_micros(ev)
    g = ev.select("event_type", us.alias("__us")).groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"), F.max("__us").alias("__max_us")
    )
    t = g.agg(F.max("__max_us").alias("__gmax"))
    lag = F.col("__gmax") - F.col("__max_us")
    return g.crossJoin(F.broadcast(t)).select(
        "event_type",
        F.col("n").cast("long").alias("n"),
        F.col("__max_us").cast("long").alias("max_us"),
        lag.cast("long").alias("lag_us"),
        F.when(lag > 21_600_000_000, 1).otherwise(0).cast("int").alias(
            "stale_flag"
        ),
    )


@register(
    "text_jsd_source_divergence",
    f"""
    WITH toks AS (
      SELECT source AS grp, t.token
      FROM documents,
           LATERAL (SELECT unnest(string_split(trim(text), ' ')) AS token) t
      WHERE text IS NOT NULL AND len(t.token) > 0
    ),
    tf AS (SELECT grp, token, count(*) AS c FROM toks GROUP BY grp, token),
    gt AS (SELECT token, sum(c) AS cg FROM tf GROUP BY token),
    ns AS (SELECT grp, sum(c) AS n FROM tf GROUP BY grp),
    nt AS (SELECT sum(cg) AS ntot FROM gt),
    terms AS (
      SELECT tf.grp,
             CAST(tf.c AS DOUBLE) / ns.n AS p,
             CAST(gt.cg AS DOUBLE) / nt.ntot AS q
      FROM tf
      JOIN ns ON ns.grp = tf.grp
      JOIN gt ON gt.token = tf.token
      CROSS JOIN nt
    ),
    e AS (
      SELECT grp,
             CAST(sum(CAST({sql_rd("0.5 * p * log2(2.0 * p / (p + q))", 6)}
                  AS DECIMAL(38,6))) AS DOUBLE) AS pterm,
             CAST(sum(CAST({sql_rd("0.5 * q * log2(2.0 * q / (p + q))", 6)}
                  AS DECIMAL(38,6))) AS DOUBLE) AS qterm_in,
             CAST(sum(CAST({sql_rd("q", 6)} AS DECIMAL(38,6))) AS DOUBLE) AS qmass
      FROM terms GROUP BY grp
    )
    SELECT grp AS source,
           {R("pterm + qterm_in + 0.5 * (1.0 - qmass)", 6)} AS jsd_bits
    FROM e
    """,
)
def _q_text_jsd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jensen-Shannon divergence (bits) between each source's unigram
    distribution and the WHOLE-CORPUS distribution — the mix-balance
    audit that ranks sources by lexical distance from the blend
    (entropy says how diverse a source is; JSD says how FAR it sits
    from the mix; MI covered dependence — this completes the repo's
    information-theoretic family). Tokens ABSENT from a source
    contribute q·log2(2q/(0+q)) = q exactly, so the out-of-support
    tail collapses to the closed form ½(1 − Σ_{{t∈s}} q_t) and the
    computation never materializes the |V|×|sources| zero grid — only
    (source, token) cells that EXIST shuffle (the vocabulary-bounded
    discipline). Per-term 6-dp rounding + decimal sums (the
    entropy-query determinism rule; log2 terms rounded before any
    accumulation)."""
    docs = _table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    tok = docs.select(
        F.col("source").alias("grp"),
        F.explode(
            F.filter(
                F.split(F.trim(F.col("text")), " "),
                lambda x: F.length(x) > 0,
            )
        ).alias("token"),
    )
    tf = tok.groupBy("grp", "token").agg(F.count(F.lit(1)).alias("c"))
    gt = tf.groupBy("token").agg(F.sum("c").alias("cg"))
    ns = tf.groupBy("grp").agg(F.sum("c").alias("n"))
    nt = gt.agg(F.sum("cg").alias("ntot"))
    terms = (
        tf.join(ns.hint("shuffle_hash"), "grp")
        .join(gt.hint("shuffle_hash"), "token")
        .crossJoin(F.broadcast(nt))
        .select(
            "grp",
            (F.col("c").cast("double") / F.col("n")).alias("__p"),
            (F.col("cg").cast("double") / F.col("ntot")).alias("__q"),
        )
    )
    p, q = F.col("__p"), F.col("__q")
    e = terms.groupBy("grp").agg(
        F.sum(
            rd(F.lit(0.5) * p * F.log2(F.lit(2.0) * p / (p + q)), 6).cast(
                "decimal(38,6)"
            )
        )
        .cast("double")
        .alias("__pterm"),
        F.sum(
            rd(F.lit(0.5) * q * F.log2(F.lit(2.0) * q / (p + q)), 6).cast(
                "decimal(38,6)"
            )
        )
        .cast("double")
        .alias("__qterm"),
        F.sum(rd(q, 6).cast("decimal(38,6)")).cast("double").alias("__qmass"),
    )
    return e.select(
        F.col("grp").alias("source"),
        rd(
            F.col("__pterm")
            + F.col("__qterm")
            + F.lit(0.5) * (F.lit(1.0) - F.col("__qmass")),
            6,
        ).alias("jsd_bits"),
    )


_AA_CAP = 50  # per-node neighbor cap for the two-hop expansion


@register(
    "graph_adamic_adar_links",
    f"""
    WITH e AS (
      SELECT user_id, event_id, ts, epoch_us(ts) AS us FROM events
    ),
    m AS (
      SELECT *,
             CASE WHEN lag(us) OVER w IS NULL
                       OR us - lag(us) OVER w > 1800000000
                  THEN 1 ELSE 0 END AS newf
      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    s AS (
      SELECT *,
             sum(newf) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS UNBOUNDED PRECEDING
             ) AS sess
      FROM m
    ),
    sess AS (
      SELECT user_id, sess, min(us) AS start_us, max(us) AS end_us
      FROM s GROUP BY user_id, sess
    ),
    ed AS (
      SELECT DISTINCT a.user_id AS ua, b.user_id AS ub
      FROM sess a JOIN sess b
        ON a.start_us <= b.end_us AND b.start_us <= a.end_us
       AND a.user_id < b.user_id
    ),
    sym AS (
      SELECT ua AS u, ub AS v FROM ed
      UNION ALL
      SELECT ub AS u, ua AS v FROM ed
    ),
    deg AS (SELECT u, count(*) AS d FROM sym GROUP BY u),
    nbr AS (
      SELECT u, v FROM (
        SELECT u, v,
               row_number() OVER (
                 PARTITION BY u
                 ORDER BY {sp.sql_hash_u32("v", "tsdt|aa")} ASC, v ASC
               ) AS rn
        FROM sym
      ) WHERE rn <= {_AA_CAP}
    ),
    hop2 AS (
      SELECT a.v AS x, b.v AS y, a.u AS via
      FROM nbr a JOIN nbr b ON a.u = b.u AND a.v < b.v
    ),
    sc AS (
      SELECT h.x, h.y,
             CAST(sum(CAST({sql_rd("1.0 / log2(CAST(d.d AS DOUBLE))", 6)}
                  AS DECIMAL(38,6))) AS DOUBLE) AS aa
      FROM hop2 h JOIN deg d ON d.u = h.via
      GROUP BY h.x, h.y
    ),
    new_links AS (
      SELECT sc.x, sc.y, sc.aa
      FROM sc LEFT JOIN ed ON ed.ua = sc.x AND ed.ub = sc.y
      WHERE ed.ua IS NULL
    )
    SELECT x AS user_a, y AS user_b, {R("aa", 6)} AS aa_score
    FROM new_links
    ORDER BY aa DESC, x ASC, y ASC
    LIMIT 20
    """,
)
def _q_graph_adamic_adar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ADAMIC-ADAR link prediction over the session-concurrency graph:
    for every non-adjacent user pair, Σ 1/log2(deg(b)) across shared
    neighbors b — the classic "who will overlap next" score (rare
    shared contacts count more than hubs), completing the graph family
    (pagerank = importance, triangles = cohesion, label-prop =
    denoise, degree stats = hub risk, AA = prediction). Two-hop
    expansion is the textbook scale hazard (Σ deg² explodes at hubs):
    neighbor lists are CAPPED at {_AA_CAP} per node by the portable
    md5 hash order (the bounded-block rule — deterministic, oracle-
    reproducible, bounds every bucket at C({_AA_CAP},2) pairs), while
    degrees for the weight stay TRUE degrees. Per-term 6-dp rounding +
    decimal sums; anti-join removes already-linked pairs; top-20 with
    full tie-break."""
    ev = _table(spark, sf_dir, "events")
    sess = ag.sessionize_user_events(ev, gap_minutes=30)
    ivl = sess.select(
        "user_id",
        F.unix_micros(F.col("session_start").cast("timestamp")).alias(
            "start_us"
        ),
        F.unix_micros(F.col("session_end").cast("timestamp")).alias("end_us"),
    )
    pairs = iv.overlap_join(ivl, ivl, bucket_us="auto").filter(
        F.col("user_id_a") < F.col("user_id_b")
    )
    ed = pairs.select(
        F.col("user_id_a").alias("ua"), F.col("user_id_b").alias("ub")
    ).distinct()
    sym = ed.select(F.col("ua").alias("u"), F.col("ub").alias("v")).unionAll(
        ed.select(F.col("ub").alias("u"), F.col("ua").alias("v"))
    )
    deg = sym.groupBy("u").agg(F.count(F.lit(1)).alias("d"))
    wn = Window.partitionBy("u").orderBy(
        sp.hash_u32(F.col("v"), "tsdt|aa").asc(), F.col("v").asc()
    )
    nbr = (
        sym.withColumn("__rn", F.row_number().over(wn))
        .filter(F.col("__rn") <= _AA_CAP)
        .select("u", "v")
    )
    a = nbr.select(F.col("u").alias("__via"), F.col("v").alias("x"))
    b = nbr.select(F.col("u").alias("__via"), F.col("v").alias("y"))
    hop2 = a.join(b.hint("shuffle_hash"), "__via").filter(
        F.col("x") < F.col("y")
    )
    term = rd(F.lit(1.0) / F.log2(F.col("d").cast("double")), 6)
    sc = (
        hop2.join(
            deg.select(F.col("u").alias("__via"), "d").hint("shuffle_hash"),
            "__via",
        )
        .groupBy("x", "y")
        .agg(F.sum(term.cast("decimal(38,6)")).cast("double").alias("__aa"))
    )
    new_links = sc.join(
        ed.hint("shuffle_hash"),
        (F.col("x") == F.col("ua")) & (F.col("y") == F.col("ub")),
        "left_anti",
    )
    return (
        new_links.select(
            F.col("x").alias("user_a"),
            F.col("y").alias("user_b"),
            rd(F.col("__aa"), 6).alias("aa_score"),
        )
        .orderBy(F.col("aa_score").desc(), F.col("user_a").asc(), F.col("user_b").asc())
        .limit(20)
    )


@register(
    "layout_partition_advisor",
    f"""
    WITH cand AS (
      SELECT 'event_type' AS part_col, event_type AS k FROM events
      UNION ALL
      SELECT 'user_id' AS part_col, CAST(user_id AS VARCHAR) AS k FROM events
      UNION ALL
      SELECT 'event_day' AS part_col,
             CAST(epoch_us(ts) // 86400000000 AS VARCHAR) AS k FROM events
    ),
    per_key AS (
      SELECT part_col, k, count(*) AS rows_in_part
      FROM cand GROUP BY part_col, k
    ),
    agg AS (
      SELECT part_col, count(*) AS n_partitions, sum(rows_in_part) AS total_rows,
             max(rows_in_part) AS max_part
      FROM per_key GROUP BY part_col
    )
    SELECT part_col,
           CAST(n_partitions AS BIGINT) AS n_partitions,
           CAST(total_rows AS BIGINT) AS total_rows,
           CAST(max_part AS BIGINT) AS max_part_rows,
           {R("CAST(max_part AS DOUBLE)"
              " / (CAST(total_rows AS DOUBLE) / n_partitions)", 6)} AS skew_ratio,
           CAST(CASE WHEN n_partitions BETWEEN 5 AND 100000
                      AND CAST(max_part AS DOUBLE)
                          / (CAST(total_rows AS DOUBLE) / n_partitions) < 10.0
                THEN 1 ELSE 0 END AS INTEGER) AS advisable
    FROM agg
    """,
)
def _q_layout_partition_advisor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PARTITION-KEY advisor for the events table: for each candidate
    key (event_type, user_id, epoch-day) the partition count, largest
    partition, and skew ratio (max/mean) — the two failure modes of
    `partitionBy` at 100 TB are too FEW/too MANY partitions and one
    giant hot partition, and this row flags both (advisable = 5 ≤
    parts ≤ 1e5 AND skew < 10). Completes the layout family: encoding
    advisor (column codecs) → compaction plan (file sizing) → z-order
    (clustering) → THIS (directory partitioning). One scan exploded to
    three candidate keyings, two aggregations, |keys|-bounded rows."""
    ev = _events_us(spark, sf_dir)
    cand = (
        ev.select(
            F.lit("event_type").alias("part_col"),
            F.col("event_type").cast("string").alias("k"),
        )
        .unionAll(
            ev.select(
                F.lit("user_id").alias("part_col"),
                F.col("user_id").cast("string").alias("k"),
            )
        )
        .unionAll(
            ev.select(
                F.lit("event_day").alias("part_col"),
                F.expr("CAST(t_us DIV 86400000000 AS STRING)").alias("k"),
            )
        )
    )
    per_key = cand.groupBy("part_col", "k").agg(
        F.count(F.lit(1)).alias("rows_in_part")
    )
    agg = per_key.groupBy("part_col").agg(
        F.count(F.lit(1)).alias("n_partitions"),
        F.sum("rows_in_part").alias("total_rows"),
        F.max("rows_in_part").alias("max_part"),
    )
    skew = F.col("max_part").cast("double") / (
        F.col("total_rows").cast("double") / F.col("n_partitions")
    )
    return agg.select(
        "part_col",
        F.col("n_partitions").cast("long").alias("n_partitions"),
        F.col("total_rows").cast("long").alias("total_rows"),
        F.col("max_part").cast("long").alias("max_part_rows"),
        rd(skew, 6).alias("skew_ratio"),
        F.when(
            (F.col("n_partitions").between(5, 100000)) & (skew < 10.0), 1
        )
        .otherwise(0)
        .cast("int")
        .alias("advisable"),
    )


#: (z_{α/2} + z_β)² for α=0.05 two-sided, power 0.8 — a shared Python
#: literal (normal quantiles are not SQL builtins in either engine).
_Z2_80_05 = round((1.959963985 + 0.841621234) ** 2, 9)
_AB_MDE_ABS = 0.5  # absolute minimum detectable effect, value units


@register(
    "stats_ab_power",
    f"""
    WITH cuped AS ({REGISTRY["stats_cuped_halves"][1]})
    SELECT n_users,
           var_y, var_y_adjusted,
           CAST({_AB_MDE_ABS} AS DOUBLE) AS mde_abs,
           CAST(ceil(2.0 * {_Z2_80_05} * var_y
                     / ({_AB_MDE_ABS} * {_AB_MDE_ABS})) AS BIGINT)
             AS n_required_raw,
           CAST(ceil(2.0 * {_Z2_80_05} * var_y_adjusted
                     / ({_AB_MDE_ABS} * {_AB_MDE_ABS})) AS BIGINT)
             AS n_required_cuped,
           {R(f"1.0 - ceil(2.0 * {_Z2_80_05} * var_y_adjusted / ({_AB_MDE_ABS} * {_AB_MDE_ABS}))"
              f" / ceil(2.0 * {_Z2_80_05} * var_y / ({_AB_MDE_ABS} * {_AB_MDE_ABS}))", 6)}
             AS sample_saving
    FROM cuped
    """,
)
def _q_stats_ab_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B SAMPLE-SIZE calculator fed by the CUPED row: users per arm
    to detect an absolute {_AB_MDE_ABS}-unit shift of the second-half
    metric at α=0.05 / power 0.8, with and without the covariate
    adjustment — `sample_saving` is CUPED's headline number (the
    experiment you DIDN'T have to run). n = 2(z_α/2+z_β)²σ²/δ², the
    z-quantile constant injected as one shared Python literal (normal
    quantiles are not builtins in either engine). Pure 1-row
    composition over `stats_cuped_halves` — its SQL is reused verbatim
    as a CTE, so the two can never drift."""
    c = REGISTRY["stats_cuped_halves"][0](spark, sf_dir)
    n_raw = F.ceil(
        F.lit(2.0) * F.lit(_Z2_80_05) * F.col("var_y")
        / F.lit(_AB_MDE_ABS * _AB_MDE_ABS)
    )
    n_cuped = F.ceil(
        F.lit(2.0) * F.lit(_Z2_80_05) * F.col("var_y_adjusted")
        / F.lit(_AB_MDE_ABS * _AB_MDE_ABS)
    )
    return c.select(
        "n_users",
        "var_y",
        "var_y_adjusted",
        F.lit(float(_AB_MDE_ABS)).alias("mde_abs"),
        n_raw.cast("long").alias("n_required_raw"),
        n_cuped.cast("long").alias("n_required_cuped"),
        rd(
            F.lit(1.0) - n_cuped.cast("double") / n_raw.cast("double"), 6
        ).alias("sample_saving"),
    )


_MOTIF_WORD = 4  # symbols per motif word


@register(
    "ts_sax_motifs",
    f"""
    WITH sax AS ({REGISTRY["ts_sax_symbols"][1]}),
    words AS (
      SELECT user_id, symbol
             || lead(symbol, 1) OVER w || lead(symbol, 2) OVER w
             || lead(symbol, 3) OVER w AS word
      FROM sax WINDOW w AS (PARTITION BY user_id ORDER BY seg)
    ),
    wc AS (
      SELECT user_id, word, count(*) AS cnt
      FROM words WHERE word IS NOT NULL
      GROUP BY user_id, word
    ),
    rk AS (
      SELECT user_id, word, cnt,
             row_number() OVER (
               PARTITION BY user_id ORDER BY cnt DESC, word ASC
             ) AS rank
      FROM wc
    )
    SELECT user_id, word, CAST(cnt AS BIGINT) AS cnt,
           CAST(rank AS INTEGER) AS rank
    FROM rk WHERE rank <= 3
    """,
)
def _q_ts_sax_motifs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MOTIF mining over the SAX strings (the payoff of
    `ts_sax_symbols`): each trial's top-3 recurring {_MOTIF_WORD}-symbol
    words — the recurring shapes (daily ramps, sawtooths, flat spells)
    a petabyte of raw floats hides but a 4-letter alphabet surfaces as
    simple string counts (Lin/Keogh's motif-discovery application).
    The SAX SQL is reused verbatim as a CTE so symbolization can never
    drift from the registered query. Sliding words via 3 leads on the
    trial-keyed window; (trial, word) counts and the top-3 window all
    reuse the same single Exchange (hash(user) satisfies every wider
    clustering)."""
    sax = REGISTRY["ts_sax_symbols"][0](spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy(F.col("seg").asc())
    word = F.concat(
        F.col("symbol"),
        F.lead("symbol", 1).over(w),
        F.lead("symbol", 2).over(w),
        F.lead("symbol", 3).over(w),
    )
    words = sax.select("user_id", word.alias("word")).filter(
        F.col("word").isNotNull()
    )
    wc = words.groupBy("user_id", "word").agg(F.count(F.lit(1)).alias("cnt"))
    rk = wc.select(
        "user_id",
        "word",
        F.col("cnt").cast("long").alias("cnt"),
        F.row_number()
        .over(
            Window.partitionBy("user_id").orderBy(
                F.col("cnt").desc(), F.col("word").asc()
            )
        )
        .cast("int")
        .alias("rank"),
    )
    return rk.filter(F.col("rank") <= 3)


@register(
    "emb_separability_by_label",
    f"""
    WITH ex AS (
      SELECT vec_id, label, u['i'] - 1 AS i, CAST(u['v'] AS DOUBLE) AS x
      FROM (SELECT vec_id, label,
                   unnest(list_transform(embedding, (x, i) -> {{'v': x, 'i': i}})) AS u
            FROM embeddings)
    ),
    nv AS (
      SELECT vec_id,
             sqrt(CAST(sum(CAST({sql_rd("x * x", 9)} AS DECIMAL(38,9)))
                  AS DOUBLE)) AS nrm
      FROM ex GROUP BY vec_id
    ),
    un AS (
      SELECT e.label, e.vec_id, e.i, {sql_rd("e.x / n.nrm", 9)} AS u
      FROM ex e JOIN nv n ON n.vec_id = e.vec_id WHERE n.nrm > 0
    ),
    li AS (
      SELECT label, i,
             CAST(sum(CAST({sql_rd("u", 9)} AS DECIMAL(38,9))) AS DOUBLE) AS s,
             CAST(sum(CAST({sql_rd("u * u", 12)} AS DECIMAL(38,12))) AS DOUBLE) AS q
      FROM un GROUP BY label, i
    ),
    ti AS (
      SELECT i, CAST(sum(CAST({sql_rd("s", 9)} AS DECIMAL(38,9))) AS DOUBLE) AS st
      FROM li GROUP BY i
    ),
    nl AS (SELECT label, count(DISTINCT vec_id) AS n FROM un GROUP BY label),
    nt AS (SELECT count(*) AS ntot FROM nv WHERE nrm > 0),
    lg AS (
      SELECT li.label,
             CAST(sum(CAST({sql_rd("li.s * li.s", 9)} AS DECIMAL(38,9))) AS DOUBLE) AS ss,
             CAST(sum(CAST({sql_rd("li.q", 12)} AS DECIMAL(38,12))) AS DOUBLE) AS qq,
             CAST(sum(CAST({sql_rd("li.s * (ti.st - li.s)", 9)} AS DECIMAL(38,9))) AS DOUBLE) AS cross_dot
      FROM li JOIN ti ON ti.i = li.i
      GROUP BY li.label
    )
    SELECT lg.label, CAST(nl.n AS BIGINT) AS n_vecs,
           {R("(ss - qq) / (nl.n * (nl.n - 1))", 6)} AS intra_mean_cos,
           {R("cross_dot / (CAST(nl.n AS DOUBLE) * (nt.ntot - nl.n))", 6)}
             AS inter_mean_cos,
           {R("(ss - qq) / (nl.n * (nl.n - 1))"
              " - cross_dot / (CAST(nl.n AS DOUBLE) * (nt.ntot - nl.n))", 6)}
             AS separability_gap
    FROM lg JOIN nl ON nl.label = lg.label CROSS JOIN nt
    WHERE nl.n > 1
    """,
)
def _q_emb_separability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label SEPARABILITY without a single pair: mean intra-label and
    mean inter-label cosine from CLOSED FORMS over per-label unit-sum
    vectors — Σ_{{i≠j}} uᵢ·uⱼ = ‖S_a‖² − Σ‖uᵢ‖² and the inter term is
    S_a·(S_tot − S_a), so the contrastive-quality headline (do labels
    cohere, and do they separate?) costs three d-bounded aggregations
    instead of N² pair dots — at 100 TB this is the difference between
    an audit and an impossibility. `separability_gap` ≤ 0 means labels
    are indistinguishable to cosine (retrain the encoder before
    trusting SemDeDup cells or kNN votes). Unit vectors on the 9-dp
    grid; every sum decimal-accumulated; the only joins are on the
    64-row dimension key and the |labels|-row label key."""
    emb = _table(spark, sf_dir, "embeddings")
    ex = emb.select(
        "vec_id", "label", F.posexplode("embedding").alias("i", "x")
    ).withColumn("x", F.col("x").cast("double"))
    nv = ex.groupBy("vec_id").agg(
        F.sqrt(
            F.sum(rd(F.col("x") * F.col("x"), 9).cast("decimal(38,9)")).cast(
                "double"
            )
        ).alias("__nrm")
    )
    un = (
        ex.join(nv.hint("shuffle_hash"), "vec_id")
        .filter(F.col("__nrm") > 0)
        .select(
            "label",
            "vec_id",
            "i",
            rd(F.col("x") / F.col("__nrm"), 9).alias("__u"),
        )
    )
    li = un.groupBy("label", "i").agg(
        F.sum(rd(F.col("__u"), 9).cast("decimal(38,9)"))
        .cast("double")
        .alias("__s"),
        F.sum(rd(F.col("__u") * F.col("__u"), 12).cast("decimal(38,12)"))
        .cast("double")
        .alias("__q"),
    )
    ti = li.groupBy("i").agg(
        F.sum(rd(F.col("__s"), 9).cast("decimal(38,9)"))
        .cast("double")
        .alias("__st")
    )
    nl = un.groupBy("label").agg(F.countDistinct("vec_id").alias("__n"))
    nt = nv.filter(F.col("__nrm") > 0).agg(
        F.count(F.lit(1)).alias("__ntot")
    )
    lg = (
        li.join(F.broadcast(ti), "i")
        .groupBy("label")
        .agg(
            F.sum(rd(F.col("__s") * F.col("__s"), 9).cast("decimal(38,9)"))
            .cast("double")
            .alias("__ss"),
            F.sum(rd(F.col("__q"), 12).cast("decimal(38,12)"))
            .cast("double")
            .alias("__qq"),
            F.sum(
                rd(
                    F.col("__s") * (F.col("__st") - F.col("__s")), 9
                ).cast("decimal(38,9)")
            )
            .cast("double")
            .alias("__cross"),
        )
    )
    j = (
        lg.join(nl.hint("shuffle_hash"), "label")
        .crossJoin(F.broadcast(nt))
        .filter(F.col("__n") > 1)
    )
    intra = rd(
        (F.col("__ss") - F.col("__qq"))
        / (F.col("__n") * (F.col("__n") - 1)),
        6,
    )
    inter = rd(
        F.col("__cross")
        / (F.col("__n").cast("double") * (F.col("__ntot") - F.col("__n"))),
        6,
    )
    gap = rd(
        (F.col("__ss") - F.col("__qq"))
        / (F.col("__n") * (F.col("__n") - 1))
        - F.col("__cross")
        / (F.col("__n").cast("double") * (F.col("__ntot") - F.col("__n"))),
        6,
    )
    return j.select(
        "label",
        F.col("__n").cast("long").alias("n_vecs"),
        intra.alias("intra_mean_cos"),
        inter.alias("inter_mean_cos"),
        gap.alias("separability_gap"),
    )


@register(
    "dq_quarantine_rows",
    f"""
    WITH f AS (
      SELECT o.o_orderkey,
             CASE WHEN o.o_custkey IS NULL THEN 1 ELSE 0 END AS r_null,
             CASE WHEN o.o_totalprice IS NOT NULL
                       AND (o.o_totalprice < 0.0 OR o.o_totalprice > 100000.0)
                  THEN 1 ELSE 0 END AS r_range,
             CASE WHEN o.o_orderstatus IS NOT NULL
                       AND o.o_orderstatus NOT IN ('F', 'O')
                  THEN 1 ELSE 0 END AS r_set,
             CASE WHEN o.o_orderpriority IS NOT NULL
                       AND NOT regexp_matches(o.o_orderpriority, '^[1-3]-')
                  THEN 1 ELSE 0 END AS r_fmt,
             CASE WHEN o.o_custkey IS NOT NULL AND c.c_custkey IS NULL
                  THEN 1 ELSE 0 END AS r_fk
      FROM orders o LEFT JOIN customer c ON c.c_custkey = o.o_custkey
    )
    SELECT o_orderkey,
           array_to_string(list_sort(
             [x FOR x IN [
               CASE WHEN r_null = 1 THEN 'not_null(o_custkey)' END,
               CASE WHEN r_range = 1 THEN 'in_range(o_totalprice)' END,
               CASE WHEN r_set = 1 THEN 'in_set(o_orderstatus)' END,
               CASE WHEN r_fmt = 1 THEN 'priority_format' END,
               CASE WHEN r_fk = 1 THEN 'fk(o_custkey)' END
             ] IF x IS NOT NULL]), ',') AS reasons,
           CAST(r_null + r_range + r_set + r_fmt + r_fk AS INTEGER) AS n_reasons
    FROM f
    WHERE r_null + r_range + r_set + r_fmt + r_fk > 0
    """,
)
def _q_dq_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROW-LEVEL quarantine: the failing rows behind
    `dq_expectations_report`'s counts, each labeled with every rule it
    violates (sorted, comma-joined) — the quarantine TABLE a production
    ingest writes next to the clean drop so violations are debuggable
    and replayable, not just counted. Same five rules as the report
    (null / range / set / format / FK); the FK check is one
    broadcast-size LEFT join; everything else is scan-side codegen.
    Output is violation-bounded."""
    orders = _table(spark, sf_dir, "orders")
    cust = _table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("__ck")
    )
    j = orders.join(
        F.broadcast(cust), orders["o_custkey"] == F.col("__ck"), "left"
    )
    r_null = F.when(F.col("o_custkey").isNull(), 1).otherwise(0)
    r_range = F.when(
        F.col("o_totalprice").isNotNull()
        & ((F.col("o_totalprice") < 0.0) | (F.col("o_totalprice") > 100000.0)),
        1,
    ).otherwise(0)
    r_set = F.when(
        F.col("o_orderstatus").isNotNull()
        & ~F.col("o_orderstatus").isin("F", "O"),
        1,
    ).otherwise(0)
    r_fmt = F.when(
        F.col("o_orderpriority").isNotNull()
        & ~F.col("o_orderpriority").rlike("^[1-3]-"),
        1,
    ).otherwise(0)
    r_fk = F.when(
        F.col("o_custkey").isNotNull() & F.col("__ck").isNull(), 1
    ).otherwise(0)
    flagged = j.select(
        "o_orderkey",
        r_null.alias("__rn"),
        r_range.alias("__rr"),
        r_set.alias("__rs"),
        r_fmt.alias("__rf"),
        r_fk.alias("__rk"),
    )
    total = (
        F.col("__rn") + F.col("__rr") + F.col("__rs")
        + F.col("__rf") + F.col("__rk")
    )
    reasons = F.array_join(
        F.array_sort(
            F.filter(
                F.array(
                    F.when(F.col("__rn") == 1, F.lit("not_null(o_custkey)")),
                    F.when(F.col("__rr") == 1, F.lit("in_range(o_totalprice)")),
                    F.when(F.col("__rs") == 1, F.lit("in_set(o_orderstatus)")),
                    F.when(F.col("__rf") == 1, F.lit("priority_format")),
                    F.when(F.col("__rk") == 1, F.lit("fk(o_custkey)")),
                ),
                lambda x: x.isNotNull(),
            )
        ),
        ",",
    )
    return flagged.filter(total > 0).select(
        "o_orderkey",
        reasons.alias("reasons"),
        total.cast("int").alias("n_reasons"),
    )


_EXPORT_SHARDS = 8


@register(
    "export_manifest_shards",
    f"""
    WITH h AS (
      SELECT ({sp.sql_hash_u32("doc_id", "tsdt|shard")}) % {_EXPORT_SHARDS}
               AS shard,
             CAST({_SQL_NTOK} AS BIGINT) AS n_tokens,
             {sp.sql_hash_u32(
                 "concat_ws('|', CAST(doc_id AS VARCHAR), coalesce(text, ''),"
                 " coalesce(lang, ''), CAST(n_chars AS VARCHAR))",
                 'tsdt|fp')} AS u
      FROM documents
    )
    SELECT CAST(shard AS INTEGER) AS shard,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
           CAST(sum(CAST(u AS DECIMAL(38,0))) % 1000000000000000000 AS BIGINT)
             AS content_sum_mod,
           min(u) AS content_min, max(u) AS content_max
    FROM h GROUP BY shard
    """,
)
def _q_export_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXPORT MANIFEST for a sharded corpus handoff: per hash shard
    (the deterministic md5 shard every doc would be written to), the
    doc count, token count, and the order-insensitive content
    fingerprint — the receiving side recomputes this table on what
    arrived and diffs {_EXPORT_SHARDS} rows to localize any dropped /
    duplicated / corrupted shard WITHOUT re-reading the healthy ones
    (the `dq_content_fingerprint` reconciliation made shard-local, the
    integrity contract a 100 TB handoff signs). One scan, map-side-
    combined aggregation."""
    docs = _table(spark, sf_dir, "documents")
    row_repr = F.concat_ws(
        "|",
        F.col("doc_id").cast("string"),
        F.coalesce(F.col("text"), F.lit("")),
        F.coalesce(F.col("lang"), F.lit("")),
        F.col("n_chars").cast("string"),
    )
    h = docs.select(
        (sp.hash_u32(F.col("doc_id"), "tsdt|shard") % _EXPORT_SHARDS)
        .cast("int")
        .alias("shard"),
        tx.token_count(F.col("text")).cast("long").alias("__nt"),
        sp.hash_u32(row_repr, "tsdt|fp").alias("__u"),
    )
    return h.groupBy("shard").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("__nt").cast("long").alias("n_tokens"),
        (
            F.sum(F.col("__u").cast("decimal(38,0)"))
            % F.lit(1000000000000000000).cast("decimal(38,0)")
        )
        .cast("long")
        .alias("content_sum_mod"),
        F.min("__u").alias("content_min"),
        F.max("__u").alias("content_max"),
    )


@register(
    "events_rfm_segments",
    f"""
    WITH e AS (
      SELECT user_id, epoch_us(ts) AS us, value FROM events
    ),
    u AS (
      SELECT user_id,
             max(us) AS last_us,
             count(*) AS frequency,
             CAST(sum(CAST({sql_rd("coalesce(value, 0.0)", 4)}
                  AS DECIMAL(38,6))) AS DOUBLE) AS monetary
      FROM e GROUP BY user_id
    ),
    g AS (SELECT max(last_us) AS gmax FROM u),
    rfm AS (
      SELECT user_id,
             CAST((gmax - last_us) // 86400000000 AS BIGINT) AS recency_days,
             frequency, {R("monetary", 2)} AS monetary
      FROM u CROSS JOIN g
    ),
    b AS (
      SELECT quantile_cont(recency_days, [0.2, 0.4, 0.6, 0.8]) AS rb,
             quantile_cont(frequency, [0.2, 0.4, 0.6, 0.8]) AS fb,
             quantile_cont(monetary, [0.2, 0.4, 0.6, 0.8]) AS mb
      FROM rfm
    ),
    sc AS (
      SELECT user_id, recency_days, frequency, monetary,
             5 - (CASE WHEN recency_days > rb[1] THEN 1 ELSE 0 END
                + CASE WHEN recency_days > rb[2] THEN 1 ELSE 0 END
                + CASE WHEN recency_days > rb[3] THEN 1 ELSE 0 END
                + CASE WHEN recency_days > rb[4] THEN 1 ELSE 0 END) AS r_score,
             1 + CASE WHEN frequency > fb[1] THEN 1 ELSE 0 END
               + CASE WHEN frequency > fb[2] THEN 1 ELSE 0 END
               + CASE WHEN frequency > fb[3] THEN 1 ELSE 0 END
               + CASE WHEN frequency > fb[4] THEN 1 ELSE 0 END AS f_score,
             1 + CASE WHEN monetary > mb[1] THEN 1 ELSE 0 END
               + CASE WHEN monetary > mb[2] THEN 1 ELSE 0 END
               + CASE WHEN monetary > mb[3] THEN 1 ELSE 0 END
               + CASE WHEN monetary > mb[4] THEN 1 ELSE 0 END AS m_score
      FROM rfm CROSS JOIN b
    )
    SELECT user_id, recency_days, CAST(frequency AS BIGINT) AS frequency,
           monetary,
           CAST(r_score AS INTEGER) AS r_score,
           CAST(f_score AS INTEGER) AS f_score,
           CAST(m_score AS INTEGER) AS m_score,
           CASE WHEN r_score >= 4 AND f_score >= 4 AND m_score >= 4
                  THEN 'champion'
                WHEN r_score <= 2 AND f_score >= 3 THEN 'at_risk'
                WHEN r_score <= 2 AND f_score <= 2 THEN 'hibernating'
                ELSE 'regular' END AS segment
    FROM sc
    """,
)
def _q_events_rfm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM SEGMENTATION (recency / frequency / monetary) — the classic
    OLAP customer-scoring shape, built scale-safe: quintile BOUNDARIES
    come from ONE interpolated-percentile AGGREGATE row (the sanctioned
    1-row scalar, broadcast back), NOT from a global rank window — an
    ntile() over all users is a keyless-window single-partition sort
    that both violates the repo's plan rule and dies at 10⁹ users,
    while boundary-broadcast scoring is one user-keyed aggregation +
    one scan. Ties score identically by construction (strict >
    against interpolated boundaries), so no engine-varying tie order
    exists; monetary sums accumulate 4-dp decimals."""
    ev = _events(spark, sf_dir)
    us = event_micros(ev)
    u = ev.select("user_id", us.alias("__us"), "value").groupBy("user_id").agg(
        F.max("__us").alias("__last"),
        F.count(F.lit(1)).alias("frequency"),
        F.sum(rd(F.coalesce(F.col("value"), F.lit(0.0)), 4).cast("decimal(38,6)"))
        .cast("double")
        .alias("__mon"),
    )
    g = u.agg(F.max("__last").alias("__gmax"))
    rfm = u.crossJoin(F.broadcast(g)).select(
        "user_id",
        F.expr("(__gmax - __last) DIV 86400000000").cast("long").alias(
            "recency_days"
        ),
        "frequency",
        rd(F.col("__mon"), 2).alias("monetary"),
    )
    b = rfm.agg(
        F.percentile(F.col("recency_days"), F.array(*[F.lit(x) for x in (0.2, 0.4, 0.6, 0.8)])).alias("__rb"),
        F.percentile(F.col("frequency"), F.array(*[F.lit(x) for x in (0.2, 0.4, 0.6, 0.8)])).alias("__fb"),
        F.percentile(F.col("monetary"), F.array(*[F.lit(x) for x in (0.2, 0.4, 0.6, 0.8)])).alias("__mb"),
    )

    def bucket(col, arr, invert=False):
        s = None
        for k in range(4):
            t = F.when(col > F.col(arr)[k], 1).otherwise(0)
            s = t if s is None else s + t
        return (F.lit(5) - s) if invert else (F.lit(1) + s)

    sc = rfm.crossJoin(F.broadcast(b)).select(
        "user_id",
        "recency_days",
        F.col("frequency").cast("long").alias("frequency"),
        "monetary",
        bucket(F.col("recency_days"), "__rb", invert=True)
        .cast("int")
        .alias("r_score"),
        bucket(F.col("frequency"), "__fb").cast("int").alias("f_score"),
        bucket(F.col("monetary"), "__mb").cast("int").alias("m_score"),
    )
    seg = (
        F.when(
            (F.col("r_score") >= 4) & (F.col("f_score") >= 4) & (F.col("m_score") >= 4),
            F.lit("champion"),
        )
        .when((F.col("r_score") <= 2) & (F.col("f_score") >= 3), F.lit("at_risk"))
        .when((F.col("r_score") <= 2) & (F.col("f_score") <= 2), F.lit("hibernating"))
        .otherwise(F.lit("regular"))
    )
    return sc.withColumn("segment", seg)


_SEMDEDUP_SWEEP_TAUS = (0.5, 0.7, 0.9)


@register(
    "dedup_semantic_tau_sweep",
    f"""
    WITH {_SEMDEDUP_CTE_SQL},
    cos AS (
      SELECT p.id_a, p.id_b,
             CAST(p.dxy AS DOUBLE) / (na.nrm * nb.nrm) AS c
      FROM pdots p
      JOIN norms na ON na.vec_id = p.id_a
      JOIN norms nb ON nb.vec_id = p.id_b
    ),
    taus AS (SELECT unnest([{", ".join(f"CAST({t} AS DOUBLE)" for t in _SEMDEDUP_SWEEP_TAUS)}]) AS tau),
    nt AS (SELECT count(*) AS n FROM embeddings),
    per AS (
      SELECT t.tau,
             count(c2.id_a) AS n_pairs,
             count(DISTINCT c2.id_b) AS n_dropped
      FROM taus t LEFT JOIN cos c2 ON c2.c >= t.tau
      GROUP BY t.tau
    )
    SELECT per.tau,
           CAST(per.n_pairs AS BIGINT) AS n_pairs,
           CAST(per.n_dropped AS BIGINT) AS n_dropped,
           {R("CAST(per.n_dropped AS DOUBLE) / nt.n", 6)} AS drop_frac
    FROM per CROSS JOIN nt
    """,
)
def _q_dedup_semantic_tau_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup τ-SENSITIVITY from ONE within-cell pair pass: the pair
    count, dropped-doc count, and corpus drop fraction at τ ∈
    {_SEMDEDUP_SWEEP_TAUS} — the curve a mix owner reads before
    committing a threshold (drop 2% or 20%?), priced at one blocking
    pass instead of three dedup runs. Pairs come from
    `sim.semdedup_pairs` at the LOWEST τ (every higher-τ answer is a
    filter of that set); the SQL reuses `_SEMDEDUP_CTE_SQL` verbatim,
    so the sweep can never drift from the registered survivor query.
    N-adaptive cells as always; the τ explode is a 3-literal array."""
    emb = _table(spark, sf_dir, "embeddings")
    k = _semdedup_k(emb.count())
    pairs = sim.semdedup_pairs(
        emb, tau=min(_SEMDEDUP_SWEEP_TAUS), n_centroids=k
    ).select("id_a", "id_b", "cosine")
    tau_rows = F.explode(
        F.array(*[F.lit(float(t)) for t in _SEMDEDUP_SWEEP_TAUS])
    ).alias("tau")
    taus_df = emb.sparkSession.range(1).select(tau_rows)
    nt = emb.agg(F.count(F.lit(1)).alias("__n"))
    # explode τ INTO the pair rows and filter (the wave-14 eval shape:
    # an inequality JOIN here would be an unsanctioned 3-row BNLJ); the
    # tiny taus frame equi-joins back so zero-pair τ rows survive
    hits = (
        pairs.select("id_a", "id_b", "cosine", tau_rows)
        .filter(F.col("cosine") >= F.col("tau"))
        .groupBy("tau")
        .agg(
            F.count("id_a").alias("n_pairs"),
            F.countDistinct("id_b").alias("n_dropped"),
        )
    )
    per = taus_df.join(hits.hint("shuffle_hash"), "tau", "left").select(
        "tau",
        F.coalesce(F.col("n_pairs"), F.lit(0)).alias("n_pairs"),
        F.coalesce(F.col("n_dropped"), F.lit(0)).alias("n_dropped"),
    )
    return per.crossJoin(F.broadcast(nt)).select(
        "tau",
        F.col("n_pairs").cast("long").alias("n_pairs"),
        F.col("n_dropped").cast("long").alias("n_dropped"),
        rd(F.col("n_dropped").cast("double") / F.col("__n"), 6).alias(
            "drop_frac"
        ),
    )


_RECALL_Q = 8  # probe vectors: vec_id 0..7 (deterministic sample)


@register(
    "emb_lsh_recall_by_bits",
    f"""
    WITH ex AS ({_EX_SQL}),
    planes AS (
      SELECT b.b, i.i,
             ('0x' || substr(md5('tsdt|t0|' || b.b || '|' || i.i), 1, 8))::BIGINT
               / 2147483648.0 - 1.0 AS w
      FROM generate_series(0, {max(_BITS_SWEEP) - 1}) b(b),
           generate_series(0, 63) i(i)
    ),
    pdots AS (
      SELECT e.vec_id, p.b,
             CAST(sum(CAST({sql_rd("e.x * p.w", 9)} AS DECIMAL(38,9))) AS DOUBLE) AS d
      FROM ex e JOIN planes p ON p.i = e.i - 1
      GROUP BY e.vec_id, p.b
    ),
    sigs AS (
      SELECT vec_id,
             sum(CASE WHEN d > 0 THEN CAST(1 AS BIGINT) << b ELSE 0 END) AS sig
      FROM pdots GROUP BY vec_id
    ),
    norms AS (
      SELECT vec_id,
             sqrt(CAST(sum(CAST({sql_rd("x * x", 9)} AS DECIMAL(38,9))) AS DOUBLE)) AS nrm
      FROM ex GROUP BY vec_id
    ),
    qex AS (SELECT vec_id AS qid, i, x FROM ex WHERE vec_id < {_RECALL_Q}),
    dots AS (
      SELECT q.qid, e.vec_id,
             CAST(sum(CAST({sql_rd("q.x * e.x", 9)} AS DECIMAL(38,9))) AS DOUBLE) AS dxy
      FROM qex q JOIN ex e ON e.i = q.i AND e.vec_id <> q.qid
      GROUP BY q.qid, e.vec_id
    ),
    cos AS (
      SELECT d.qid, d.vec_id,
             {R("d.dxy / (nq.nrm * nv.nrm)", 6)} AS c
      FROM dots d
      JOIN norms nq ON nq.vec_id = d.qid
      JOIN norms nv ON nv.vec_id = d.vec_id
    ),
    truth AS (
      SELECT qid, vec_id FROM (
        SELECT qid, vec_id,
               row_number() OVER (PARTITION BY qid ORDER BY c DESC, vec_id ASC) AS rn
        FROM cos
      ) WHERE rn <= 10
    )
    {" UNION ALL ".join(
        f'''SELECT {b} AS n_bits,
           {R(f"CAST(sum(hit) AS DOUBLE) / ({_RECALL_Q} * 10.0)", 6)} AS recall_at_10,
           CAST(count(*) AS BIGINT) AS n_candidates
        FROM (
          SELECT CASE WHEN t.qid IS NOT NULL AND pr.rn <= 10 THEN 1 ELSE 0 END AS hit
          FROM (
            SELECT c.qid, c.vec_id,
                   row_number() OVER (PARTITION BY c.qid ORDER BY c.c DESC, c.vec_id ASC) AS rn
            FROM cos c
            JOIN sigs sq ON sq.vec_id = c.qid
            JOIN sigs sv ON sv.vec_id = c.vec_id
            WHERE sq.sig % {1 << b} = sv.sig % {1 << b}
          ) pr
          LEFT JOIN truth t ON t.qid = pr.qid AND t.vec_id = pr.vec_id
        )'''
        for b in _BITS_SWEEP
    )}
    """,
)
def _q_emb_lsh_recall_by_bits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MEASURED recall for the bits sweep: `emb_lsh_bits_sweep` prices
    candidate volume per operating point; this query prices what each
    point FORFEITS — recall@10 over {_RECALL_Q} deterministic probe
    vectors (exact decimal-cosine top-10 as truth, same-bucket
    candidates ranked by the same cosine as the probe result). The
    bucket nests (lower b bits of one plane pool), so recall is
    monotone non-increasing in bits while candidates shrink — the two
    tables together ARE the bits decision. At 100 TB the probe set is
    a sample, the per-probe cost is one bucket scan, and truth costs
    Q·N — the standard sampled-recall audit (the IVF/PQ recall rows'
    methodology, now for the hyperplane blocker)."""
    emb = _table(spark, sf_dir, "embeddings")
    sigs = (
        sim.lsh_signatures(emb, dim=64, bits=max(_BITS_SWEEP), tables=1)
        .select("vec_id", "sig")
        .localCheckpoint(eager=False)
    )
    ex = emb.select(
        "vec_id", F.posexplode("embedding").alias("i", "x")
    ).withColumn("x", F.col("x").cast("double"))
    # probe rows join the broadcast 8×64 query-element table on the
    # DIMENSION key (equi-join — an array-vs-array form here would be
    # an unsanctioned 8-row BNLJ), the oracle's own shape
    qex = ex.filter(F.col("vec_id") < _RECALL_Q).select(
        F.col("vec_id").alias("qid"), "i", F.col("x").alias("__qx")
    )
    dots = (
        ex.join(F.broadcast(qex), "i")
        .filter(F.col("vec_id") != F.col("qid"))
        .groupBy("qid", "vec_id")
        .agg(
            F.sum(rd(F.col("__qx") * F.col("x"), 9).cast("decimal(38,9)"))
            .cast("double")
            .alias("__dxy")
        )
    )
    norms = ex.groupBy("vec_id").agg(
        F.sqrt(
            F.sum(rd(F.col("x") * F.col("x"), 9).cast("decimal(38,9)")).cast(
                "double"
            )
        ).alias("__nrm")
    ).localCheckpoint(eager=False)
    cos = (
        dots.join(
            F.broadcast(
                norms.select(F.col("vec_id").alias("qid"), F.col("__nrm").alias("__nq")).filter(
                    F.col("qid") < _RECALL_Q
                )
            ),
            "qid",
        )
        .join(norms.hint("shuffle_hash"), "vec_id")
        .select(
            "qid",
            "vec_id",
            rd(F.col("__dxy") / (F.col("__nq") * F.col("__nrm")), 6).alias(
                "__c"
            ),
        )
        .localCheckpoint(eager=False)
    )
    wq = Window.partitionBy("qid").orderBy(
        F.col("__c").desc(), F.col("vec_id").asc()
    )
    truth = (
        cos.withColumn("__rn", F.row_number().over(wq))
        .filter(F.col("__rn") <= 10)
        .select("qid", "vec_id", F.lit(1).alias("__t"))
    )
    qsig = sigs.select(F.col("vec_id").alias("qid"), F.col("sig").alias("__qs"))
    vsig = sigs.select("vec_id", F.col("sig").alias("__vs"))
    rows = []
    for b in _BITS_SWEEP:
        probe = (
            cos.join(F.broadcast(qsig), "qid")
            .join(vsig.hint("shuffle_hash"), "vec_id")
            .filter(
                F.pmod(F.col("__qs"), F.lit(1 << b))
                == F.pmod(F.col("__vs"), F.lit(1 << b))
            )
            .withColumn("__rn", F.row_number().over(wq))
        )
        scored = probe.join(
            truth.hint("shuffle_hash"), ["qid", "vec_id"], "left"
        ).select(
            F.when(
                (F.col("__t") == 1) & (F.col("__rn") <= 10), 1
            ).otherwise(0).alias("hit")
        )
        rows.append(
            scored.agg(
                rd(
                    F.sum("hit").cast("double") / F.lit(_RECALL_Q * 10.0), 6
                ).alias("recall_at_10"),
                F.count(F.lit(1)).cast("long").alias("n_candidates"),
            ).select(
                F.lit(b).cast("int").alias("n_bits"),
                "recall_at_10",
                "n_candidates",
            )
        )
    out = rows[0]
    for x in rows[1:]:
        out = out.unionByName(x)
    return out


@register(
    "dedup_cluster_size_histogram",
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
    sz AS (SELECT cluster_id, count(*) AS size FROM cl GROUP BY cluster_id),
    bk AS (
      SELECT cluster_id, size,
             CAST(length(bin(size)) - 1 AS BIGINT) AS bucket
      FROM sz
    )
    SELECT bucket,
           CAST(count(*) AS BIGINT) AS n_clusters,
           CAST(sum(size) AS BIGINT) AS n_docs,
           CAST(min(size) AS BIGINT) AS min_size,
           CAST(max(size) AS BIGINT) AS max_size
    FROM bk GROUP BY bucket
    """,
)
def _q_dedup_cluster_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HOW DUPLICATED is the corpus, as a shape: near-dup cluster sizes
    in exact log2 buckets (bucket = bit_length(size)−1, the
    degree-stats convention — no float log edge at powers of two).
    Bucket 0 = unique documents; a heavy tail is the OOM/skew hazard
    every bounded-block rule in this repo guards against, and THIS
    table is where that tail is measured before it bites (the r3
    pair-explosion incident would have shown here first). Same CC
    chain as the survivors pipeline; output is O(log max-size) rows."""
    docs = _table(spark, sf_dir, "documents")
    comp = dd.dedup_components(docs)
    sz = comp.groupBy("cluster_id").agg(F.count(F.lit(1)).alias("size"))
    bk = sz.select(
        "size", F.expr("CAST(length(bin(size)) - 1 AS BIGINT)").alias("bucket")
    )
    return bk.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("long").alias("n_clusters"),
        F.sum("size").cast("long").alias("n_docs"),
        F.min("size").cast("long").alias("min_size"),
        F.max("size").cast("long").alias("max_size"),
    )


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


_NPROBE_SWEEP = (1, 2, 4)


def _nprobe_branch_sql(np_: int) -> str:
    return f"""SELECT {np_} AS nprobe,
           CAST(count(*) AS BIGINT) AS n_hits,
           {R("CAST(count(*) AS DOUBLE) / 50.0", 6)} AS recall_at_10
        FROM (
          SELECT s.query_id, s.vec_id,
                 row_number() OVER (
                   PARTITION BY s.query_id ORDER BY s.cosine DESC, s.vec_id ASC
                 ) AS rn
          FROM scored_all s
          JOIN (SELECT p.query_id, a.vec_id
                FROM (SELECT query_id, cid FROM qdist
                      QUALIFY row_number() OVER (
                        PARTITION BY query_id ORDER BY d, cid) <= {np_}) p
                JOIN assigned a ON a.cid = p.cid) c
            ON c.query_id = s.query_id AND c.vec_id = s.vec_id
        ) pr
        JOIN truth t ON t.query_id = pr.query_id AND t.vec_id = pr.vec_id
        WHERE pr.rn <= 10"""


@register(
    "sim_ivf_nprobe_recall",
    f"""
    WITH ex AS ({_EX_SQL}),
    ord AS (
      SELECT vec_id,
             row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR))) - 1 AS cid
      FROM embeddings
      QUALIFY cid <= 15
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
    qex AS (SELECT vec_id AS query_id, i, x FROM ex WHERE vec_id IN (0, 1, 2, 3, 4)),
    qdist AS (
      SELECT q.query_id, c.cid,
             sum(CAST({sql_rd("(q.x - c.x) * (q.x - c.x)", 9)} AS DECIMAL(38,9))) AS d
      FROM qex q JOIN cex c ON c.i = q.i
      GROUP BY q.query_id, c.cid
    ),
    terms AS (
      SELECT q.query_id, e.vec_id,
             sum(CAST({sql_rd("e.x * q.x", 9)} AS DECIMAL(38,9))) AS dxy,
             sum(CAST({sql_rd("e.x * e.x", 9)} AS DECIMAL(38,9))) AS dxx,
             sum(CAST({sql_rd("q.x * q.x", 9)} AS DECIMAL(38,9))) AS dyy
      FROM ex e JOIN qex q ON q.i = e.i
      GROUP BY q.query_id, e.vec_id
    ),
    scored_all AS (
      SELECT query_id, vec_id,
             {R("CAST(dxy AS DOUBLE) / (sqrt(CAST(dxx AS DOUBLE)) * sqrt(CAST(dyy AS DOUBLE)))", 6)} AS cosine
      FROM terms
    ),
    truth AS (
      SELECT query_id, vec_id FROM (
        SELECT query_id, vec_id,
               row_number() OVER (
                 PARTITION BY query_id ORDER BY cosine DESC, vec_id ASC
               ) AS rn
        FROM scored_all
      ) WHERE rn <= 10
    )
    {" UNION ALL ".join(_nprobe_branch_sql(np_) for np_ in _NPROBE_SWEEP)}
    """,
)
def _q_sim_ivf_nprobe_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The THIRD operating-point sweep: measured recall@10 per IVF
    nprobe ∈ {_NPROBE_SWEEP} over the five standard probe vectors —
    with `dedup_lsh_band_sweep` (banding) and `emb_lsh_recall_by_bits`
    (hyperplane bits) this completes the blocking-knob trilogy: every
    approximate structure in the repo now carries a measured
    cost-vs-recall curve, not a rule of thumb. Truth is the exact
    decimal-cosine top-10 (= nprobe exhausting all 16 cells); the
    centroid table is shared across all nprobe branches, so the sweep
    pays ONE corpus assignment per branch instead of re-deriving
    centroids. Cell membership, probe ranking, and candidate ranks are
    all decimal-exact — the oracle replays them cell-for-cell."""
    emb = _table(spark, sf_dir, "embeddings")
    cents = sim.ivf_centroids(emb, 16)
    qset = emb.filter(F.col("vec_id").isin([0, 1, 2, 3, 4]))
    assigned = sim.ivf_assign_dec(emb, cents).localCheckpoint(eager=False)
    truth = sim.ivf_batch_topk(
        emb, qset, k=10, nprobe=16, centroids=cents, assigned=assigned
    ).select("query_id", "vec_id")
    rows = []
    for np_ in _NPROBE_SWEEP:
        pred = sim.ivf_batch_topk(
            emb, qset, k=10, nprobe=np_, centroids=cents, assigned=assigned
        ).select("query_id", "vec_id")
        hits = pred.join(
            truth.hint("shuffle_hash"), ["query_id", "vec_id"]
        ).agg(F.count(F.lit(1)).alias("n_hits"))
        rows.append(
            hits.select(
                F.lit(np_).cast("int").alias("nprobe"),
                F.col("n_hits").cast("long").alias("n_hits"),
                rd(F.col("n_hits").cast("double") / F.lit(50.0), 6).alias(
                    "recall_at_10"
                ),
            )
        )
    out = rows[0]
    for x in rows[1:]:
        out = out.unionByName(x)
    return out


@register(
    "stream_content_fingerprint",
    f"""
    WITH h AS (
      SELECT source,
             {sp.sql_hash_u32(
                 "concat_ws('|', CAST(doc_id AS VARCHAR), coalesce(text, ''),"
                 " coalesce(lang, ''), CAST(n_chars AS VARCHAR))",
                 'tsdt|fp')} AS u
      FROM documents
    )
    SELECT source, count(*) AS n_rows,
           CAST(sum(CAST(u AS DECIMAL(38,0))) % 1000000000000000000 AS BIGINT)
             AS content_sum_mod,
           min(u) AS content_min, max(u) AS content_max
    FROM h GROUP BY source
    """,
)
def _q_stream_content_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING ingest-integrity fingerprint
    (`stream_ops.stream_content_fingerprint`): the order-insensitive
    reconciliation sum maintained as streaming state while document
    files arrive — because count/sum/min/max are merge-equals-one-shot,
    the final streaming state must equal the BATCH fingerprint of the
    same corpus bit-for-bit (the oracle here IS the batch
    `dq_content_fingerprint` SQL, unchanged — that equality is the
    entire point: continuous handoffs verify without batch re-reads)."""
    from time_series_data_trimmer_spark.streaming.stream_ops import (
        stream_content_fingerprint,
    )

    return stream_content_fingerprint(
        spark, os.path.join(sf_dir, "documents.parquet")
    )


_LTTB_BUCKET_US = 3_600_000_000


@register(
    "ts_lttb_downsample",
    f"""
    WITH e AS (
      SELECT user_id, epoch_us(ts) AS t, value AS v,
             CAST(floor(value * 10000.0 + 0.5) AS BIGINT) AS sv,
             epoch_us(ts) // {_LTTB_BUCKET_US} AS b
      FROM events
    ),
    s AS (
      SELECT user_id, b, count(*) AS n,
             sum(t) AS st, sum(sv) AS ssv
      FROM e GROUP BY user_id, b
    ),
    a AS (
      SELECT user_id, b, n,
             lag({R(f"CAST(st AS DOUBLE) / n / {float(_LTTB_BUCKET_US)}", 9)}) OVER w AS xp,
             lag({R("CAST(ssv AS DOUBLE) / n / 10000.0", 6)}) OVER w AS yp,
             lead({R(f"CAST(st AS DOUBLE) / n / {float(_LTTB_BUCKET_US)}", 9)}) OVER w AS xn,
             lead({R("CAST(ssv AS DOUBLE) / n / 10000.0", 6)}) OVER w AS yn
      FROM s WINDOW w AS (PARTITION BY user_id ORDER BY b)
    ),
    j AS (
      SELECT e.user_id, e.b, e.t, e.v, a.n,
             CASE WHEN a.xp IS NOT NULL AND a.xn IS NOT NULL
                  THEN -abs((a.xp - a.xn)
                            * ({R("CAST(e.sv AS DOUBLE) / 10000.0", 6)} - a.yp)
                          - (a.xp - CAST(e.t AS DOUBLE) / {float(_LTTB_BUCKET_US)})
                            * (a.yn - a.yp))
                  ELSE 0.0 END AS negscore
      FROM e JOIN a ON a.user_id = e.user_id AND a.b = e.b
    )
    SELECT user_id, b AS bucket, t AS t_us, v AS value,
           CAST(n AS BIGINT) AS n_in_bucket
    FROM (
      SELECT *, row_number() OVER (
        PARTITION BY user_id, b ORDER BY negscore ASC, t ASC
      ) AS rn FROM j
    ) WHERE rn = 1
    """,
)
def _q_ts_lttb(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Largest-Triangle one-per-bucket downsampling
    (`ts.lttb_downsample`, the distributed LTOB relaxation of
    Steinarsson's LTTB): per hour bucket keep the point forming the
    largest triangle with neighbor-bucket centroids — the
    shape-preserving complement of M4's lossless min/max envelope.
    Centroid anchors on fixed rounding grids; the area itself is never
    rounded (magnitudes would overflow rd's long floor — invariant 14)
    and serves only the per-bucket argmax with a timestamp tie-break."""
    e = _events_us(spark, sf_dir)
    return ts.lttb_downsample(e, bucket_us=_LTTB_BUCKET_US)


@register(
    "funnel_step_latency",
    f"""
    WITH v AS (
      SELECT user_id, event_id, epoch(ts) AS t
      FROM events WHERE event_type = 'view'
    ),
    c AS (
      SELECT user_id, epoch(ts) AS ct FROM events
      WHERE event_type = 'click' GROUP BY user_id, epoch(ts)
    ),
    p AS (
      SELECT user_id, epoch(ts) AS pt FROM events
      WHERE event_type = 'purchase' GROUP BY user_id, epoch(ts)
    ),
    vc AS (
      SELECT v.user_id, v.event_id, v.t, c.ct
      FROM v ASOF LEFT JOIN c ON v.user_id = c.user_id AND v.t <= c.ct
    ),
    vcp AS (
      -- DuckDB ASOF orders a NULL left key FIRST and so matches it to
      -- the user's earliest purchase; the chained-funnel semantics
      -- (and Spark's NULL-time guard) say a broken hop matches
      -- NOTHING — mask pt where the previous hop never happened
      SELECT vc.user_id, vc.event_id, vc.t, vc.ct,
             CASE WHEN vc.ct IS NOT NULL THEN p.pt END AS pt
      FROM vc ASOF LEFT JOIN p ON vc.user_id = p.user_id AND vc.ct <= p.pt
    )
    SELECT 1 AS hop, 'view->click' AS step,
           CAST(count(t) AS BIGINT) AS n_anchors,
           CAST(count(ct) AS BIGINT) AS n_matched,
           CAST(count(CASE WHEN ct - t <= 600.0 THEN 1 END) AS BIGINT)
             AS n_within,
           {R("quantile_cont(CASE WHEN ct - t <= 600.0 THEN ct - t END, 0.5)", 6)}
             AS p50_latency_s,
           {R("quantile_cont(CASE WHEN ct - t <= 600.0 THEN ct - t END, 0.9)", 6)}
             AS p90_latency_s
    FROM vcp
    UNION ALL
    SELECT 2 AS hop, 'click->purchase' AS step,
           CAST(count(ct) AS BIGINT) AS n_anchors,
           CAST(count(pt) AS BIGINT) AS n_matched,
           CAST(count(CASE WHEN pt - ct <= 3600.0 THEN 1 END) AS BIGINT)
             AS n_within,
           {R("quantile_cont(CASE WHEN pt - ct <= 3600.0 THEN pt - ct END, 0.5)", 6)}
             AS p50_latency_s,
           {R("quantile_cont(CASE WHEN pt - ct <= 3600.0 THEN pt - ct END, 0.9)", 6)}
             AS p90_latency_s
    FROM vcp
    """,
)
def _q_funnel_step_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HOW LONG each funnel hop takes, not just whether it converts:
    per hop (view→click, click→purchase), the anchor/match/within
    counts and the exact interpolated p50/p90 latency of within-window
    hops — the product-analytics readout that decides which step to
    fix (a hop with high match rate but p90 at the window edge is a
    UX latency problem, not a drop-off). Reuses the chained-forward
    as-of machinery (`edits.funnel`) — each hop is one keyed exchange,
    latencies are exact second diffs, percentiles interpolated
    identically in both engines (the MAD precedent). The oracle chains
    DuckDB's native ASOF twice and filters per hop."""
    ev = _events(spark, sf_dir)
    hops = edits.funnel(ev, ["view", "click", "purchase"], [600.0, 3600.0])

    def hop_row(hop_i: int, label: str, prev: str, cur: str, win: float):
        dt = F.when(
            F.col(cur).isNotNull()
            & ((F.col(cur) - F.col(prev)) <= F.lit(win)),
            F.col(cur) - F.col(prev),
        )
        return hops.agg(
            F.count(F.col(prev)).cast("long").alias("n_anchors"),
            F.count(F.col(cur)).cast("long").alias("n_matched"),
            F.count(dt).cast("long").alias("n_within"),
            rd(F.percentile(dt, F.lit(0.5)), 6).alias("p50_latency_s"),
            rd(F.percentile(dt, F.lit(0.9)), 6).alias("p90_latency_s"),
        ).select(
            F.lit(hop_i).cast("int").alias("hop"),
            F.lit(label).alias("step"),
            "n_anchors",
            "n_matched",
            "n_within",
            "p50_latency_s",
            "p90_latency_s",
        )

    h1 = hop_row(1, "view->click", "t_0", "t_1", 600.0)
    h2 = hop_row(2, "click->purchase", "t_1", "t_2", 3600.0)
    return h1.unionByName(h2)


# ---------------------------------------------------------------------------
# r7 wave 30: alignment / spectral / interpolated-asof / prototype pruning
# ---------------------------------------------------------------------------

_XCORR_BUCKET_US, _XCORR_MAX_LAG = 3_600_000_000, 12


@register(
    "ts_xcorr_lag",
    f"""
    WITH e AS (
      SELECT event_type, epoch_us(ts) AS t_us, value FROM events
    ),
    xs AS (
      SELECT t_us - (t_us % {_XCORR_BUCKET_US}) AS b,
             sum(CAST(floor(value * 10000.0 + 0.5) AS BIGINT)) AS x
      FROM e WHERE event_type = 'click' GROUP BY 1
    ),
    ys AS (
      SELECT t_us - (t_us % {_XCORR_BUCKET_US}) AS b,
             sum(CAST(floor(value * 10000.0 + 0.5) AS BIGINT)) AS y
      FROM e WHERE event_type = 'purchase' GROUP BY 1
    ),
    lg AS (SELECT unnest(range(-{_XCORR_MAX_LAG}, {_XCORR_MAX_LAG + 1})) AS lag),
    yl AS (
      SELECT l.lag, y.b - l.lag * {_XCORR_BUCKET_US} AS b, y.y
      FROM ys y CROSS JOIN lg l
    ),
    m AS (
      SELECT yl.lag, count(*) AS n_overlap,
             sum(CAST(xs.x AS HUGEINT)) AS sx,
             sum(CAST(yl.y AS HUGEINT)) AS sy,
             sum(CAST(xs.x AS HUGEINT) * CAST(yl.y AS HUGEINT)) AS sxy,
             sum(CAST(xs.x AS HUGEINT) * CAST(xs.x AS HUGEINT)) AS sxx,
             sum(CAST(yl.y AS HUGEINT) * CAST(yl.y AS HUGEINT)) AS syy
      FROM xs JOIN yl ON xs.b = yl.b
      GROUP BY yl.lag
    )
    SELECT CAST(lag AS INT) AS lag, n_overlap,
           CASE WHEN CAST(n_overlap AS HUGEINT) * sxx - sx * sx > 0
                 AND CAST(n_overlap AS HUGEINT) * syy - sy * sy > 0
                THEN {R("CAST(CAST(n_overlap AS HUGEINT) * sxy - sx * sy AS DOUBLE)"
                        " / sqrt(CAST(CAST(n_overlap AS HUGEINT) * sxx - sx * sx AS DOUBLE)"
                        " * CAST(CAST(n_overlap AS HUGEINT) * syy - sy * sy AS DOUBLE))", 6)}
           END AS r
    FROM m
    """,
)
def _q_ts_xcorr_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-correlation lag scan (`ts.xcorr_lag`): Pearson r of the
    hourly-bucketed click series against the purchase series at every
    lag in ±12 h — the channel-alignment probe (which lag best aligns
    B to A) the reference answers by eye with overlaid plots
    (`plot_manager.py`). Exact decimal moments over integer bucket
    sums (HUGEINT on the oracle side), one double division per lag.
    Plan: two partial-agg event scans; everything after is kilobytes
    (bounded bucket tables × 25 lags, equi-join on bucket)."""
    e = _events_us(spark, sf_dir)
    return ts.xcorr_lag(
        e, "click", "purchase",
        max_lag=_XCORR_MAX_LAG, bucket_us=_XCORR_BUCKET_US,
    )


_SPECTRAL_PERIODS_US = (86_400_000_000, 604_800_000_000)


@register(
    "ts_spectral_probe",
    f"""
    WITH e AS (
      SELECT event_type, epoch_us(ts) AS t_us, value FROM events
    ),
    st AS (
      SELECT event_type, count(*) AS n,
             sum(CAST(floor(value * 10000.0 + 0.5) AS BIGINT)) AS sv
      FROM e GROUP BY 1
    ),
    p AS (SELECT unnest([{", ".join(str(p) for p in _SPECTRAL_PERIODS_US)}]) AS period_us),
    x AS (
      SELECT e.event_type, p.period_us, e.t_us,
             e.value - (CAST(st.sv AS DOUBLE) / (CAST(st.n AS DOUBLE) * 10000.0)) AS cv
      FROM e JOIN st USING (event_type) CROSS JOIN p
    ),
    a AS (
      SELECT event_type, period_us, count(*) AS n,
             sum(CAST({R("cv * cos(CAST(t_us % period_us AS DOUBLE) / CAST(period_us AS DOUBLE) * 6.283185307179586)", 4)} AS DECIMAL(38,6))) AS c,
             sum(CAST({R("cv * sin(CAST(t_us % period_us AS DOUBLE) / CAST(period_us AS DOUBLE) * 6.283185307179586)", 4)} AS DECIMAL(38,6))) AS s
      FROM x GROUP BY 1, 2
    )
    SELECT event_type, CAST(period_us / 3600000000 AS INT) AS period_h, n,
           {R("2.0 * sqrt(CAST(c AS DOUBLE) * CAST(c AS DOUBLE) + CAST(s AS DOUBLE) * CAST(s AS DOUBLE)) / CAST(n AS DOUBLE)", 6)} AS amp
    FROM a
    """,
)
def _q_ts_spectral_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-frequency DFT probe (`ts.spectral_probe`): per channel,
    the amplitude of the daily and weekly components — the band-energy
    inspection the reference's Butterworth stack implies
    (`filter_engine.py:94-146` asks for cutoff frequencies; this
    measures where the energy IS), distributed as one plain
    aggregation per (channel × period) with integer-modulus phase
    arguments so cos/sin see identical doubles in both engines."""
    e = _events_us(spark, sf_dir)
    return ts.spectral_probe(e, periods_us=_SPECTRAL_PERIODS_US)


@register(
    "ts_interp_asof",
    f"""
    WITH s AS (
      SELECT user_id, epoch_us(ts) AS t, event_id AS id, value AS v,
             0 AS tag
      FROM events WHERE event_type = 'view'
    ),
    q AS (
      SELECT user_id, epoch_us(ts) AS t, event_id AS id,
             CAST(NULL AS DOUBLE) AS v, 1 AS tag
      FROM events WHERE event_type = 'click'
    ),
    u AS (SELECT * FROM s UNION ALL SELECT * FROM q),
    m AS (
      SELECT *,
        last_value(CASE WHEN tag = 0 THEN {{'t': t, 'v': v}} END IGNORE NULLS)
          OVER (PARTITION BY user_id ORDER BY t ASC, tag ASC, id ASC
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev,
        first_value(CASE WHEN tag = 0 THEN {{'t': t, 'v': v}} END IGNORE NULLS)
          OVER (PARTITION BY user_id ORDER BY t ASC, tag DESC, id ASC
                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nxt
      FROM u
    )
    SELECT user_id, id AS event_id, t AS t_us,
           prev['t'] AS t_prev_us, nxt['t'] AS t_next_us,
           CASE WHEN prev IS NOT NULL AND nxt IS NOT NULL THEN
             CASE WHEN nxt['t'] = prev['t'] THEN {R("prev['v']", 6)}
                  ELSE {R("prev['v'] + (nxt['v'] - prev['v'])"
                          " * (CAST(t - prev['t'] AS DOUBLE)"
                          " / CAST(nxt['t'] - prev['t'] AS DOUBLE))", 6)}
             END
           END AS v_interp
    FROM m WHERE tag = 1
    """,
)
def _q_ts_interp_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated as-of join (`edits.interp_asof_join`): evaluate
    each user's view-value series AT their click timestamps by linear
    interpolation between the bracketing samples — the resample-onto-
    a-master-clock primitive (the two-table form of the reference's
    within-channel interpolate, `filter_engine.py`). Single-exchange
    union trick: both tables share one user-keyed partition pass, two
    IGNORE-NULLS window sweeps resolve the brackets — no join at all."""
    e = _events_us(spark, sf_dir)
    clicks = e.filter(F.col("event_type") == "click")
    views = e.filter(F.col("event_type") == "view")
    return edits.interp_asof_join(clicks, views)


_PROTO_K, _PROTO_PRUNE_PCT = 16, 20


@register(
    "data_prune_prototypicality",
    f"""
    WITH ex AS ({_EX_SQL}),
    ord AS (
      SELECT vec_id,
             row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR))) - 1 AS cid
      FROM embeddings
      QUALIFY cid <= {_PROTO_K - 1}
    ),
    cex AS (SELECT o.cid, e.i, e.x FROM ord o JOIN ex e ON e.vec_id = o.vec_id),
    dists AS (
      SELECT e.vec_id, c.cid,
             sum(CAST({R("(e.x - c.x) * (e.x - c.x)", 9)} AS DECIMAL(38,9))) AS d
      FROM ex e JOIN cex c ON c.i = e.i
      GROUP BY e.vec_id, c.cid
    ),
    assigned AS (
      SELECT vec_id, cid FROM dists
      QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) = 1
    ),
    sdot AS (
      SELECT a.vec_id, a.cid,
             sum(CAST({R("e.x * c.x", 9)} AS DECIMAL(38,9))) AS dxy,
             sum(CAST({R("e.x * e.x", 9)} AS DECIMAL(38,9))) AS dxx,
             sum(CAST({R("c.x * c.x", 9)} AS DECIMAL(38,9))) AS dyy
      FROM assigned a
      JOIN ex e ON e.vec_id = a.vec_id
      JOIN cex c ON c.cid = a.cid AND c.i = e.i
      GROUP BY a.vec_id, a.cid
    ),
    scored AS (
      SELECT vec_id, cid,
             {R("CAST(dxy AS DOUBLE) / (sqrt(CAST(dxx AS DOUBLE)) * sqrt(CAST(dyy AS DOUBLE)))", 6)} AS proto_cos
      FROM sdot
    ),
    rk AS (
      SELECT *,
             row_number() OVER (PARTITION BY cid
                                ORDER BY proto_cos DESC, vec_id ASC) AS rn,
             count(*) OVER (PARTITION BY cid) AS nc
      FROM scored
    )
    SELECT vec_id, CAST(cid AS INT) AS centroid_id, proto_cos,
           rn > (nc * {_PROTO_PRUNE_PCT}) // 100 AS keep
    FROM rk
    """,
)
def _q_data_prune_prototypicality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SSL-prototypes pruning decision (`sim.prototypicality_prune`,
    Sorscher et al. 2022): per IVF cell, rank vectors by cosine to
    their own centroid and drop the 20% most prototypical — the
    keep/prune bit a curation pipeline writes after SemDeDup has
    removed near-copies. Same deterministic IVF structure as
    `sim_ivf_*`/`dedup_semantic`; FIXED k is the scale path here
    (assignment N·k, rank one window — no pair volume anywhere)."""
    emb = _table(spark, sf_dir, "embeddings")
    return sim.prototypicality_prune(
        emb, n_centroids=_PROTO_K, prune_pct=_PROTO_PRUNE_PCT
    )


# ---------------------------------------------------------------------------
# r7 wave 31: binned AUC eval, PSI drift, linkage golden record
# ---------------------------------------------------------------------------


@register(
    "eval_auc_binned",
    f"""
    WITH {_HLS_VS_C4_SQL},
    b AS (
      SELECT least(CAST(floor((round(sc.logit * 1000000, 0) + 500000)
                               / 10000) AS INT), 99) AS bin,
             CASE WHEN surv.doc_id IS NOT NULL THEN 1 ELSE 0 END AS pass
      FROM sc LEFT JOIN surv ON surv.doc_id = sc.doc_id
    ),
    bins AS (
      SELECT bin, CAST(sum(pass) AS HUGEINT) AS np,
             CAST(count(*) - sum(pass) AS HUGEINT) AS nn
      FROM b GROUP BY bin
    ),
    cum AS (
      SELECT bin, np, nn,
             COALESCE(sum(nn) OVER (ORDER BY bin ASC
                                    ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND 1 PRECEDING), 0) AS cneg
      FROM bins
    ),
    tot AS (
      SELECT sum(np) AS p, sum(nn) AS nneg,
             sum(np * (2 * cneg + nn)) AS num,
             count(*) AS n_bins
      FROM cum
    )
    SELECT CAST(p AS BIGINT) AS n_pos, CAST(nneg AS BIGINT) AS n_neg,
           CAST(n_bins AS BIGINT) AS n_bins,
           CASE WHEN p > 0 AND nneg > 0 THEN
             {R("CAST(num AS DOUBLE) / (2.0 * CAST(p AS DOUBLE) * CAST(nneg AS DOUBLE))", 6)}
           END AS auc
    FROM tot
    """,
)
def _q_eval_auc_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binned ROC AUC of the cheap hashed-linear scorer against the
    expensive C4 gate — the ONE-NUMBER ranking eval next to
    `text_score_calibration`'s reliability diagram (same factored
    logit and label, `_HLS_VS_C4_SQL`, so the two evals can never
    score different things). AUC is computed the scale-safe way: 100
    fixed 6-dp-grid logit bins (no global rank, no keyless window),
    then the Mann-Whitney pair count as EXACT INTEGERS — 2·P·N·AUC =
    Σ_b np_b·(2·cneg_<b + nn_b), ties-counted-half — accumulated in
    decimal (HUGEINT oracle-side) and divided ONCE. The Spark plan
    reduces the 100 bin rows to a single collect_list row and folds
    the cumulative with `F.aggregate` — all JVM-side, zero windows,
    zero joins after the bin agg."""
    docs = _table(spark, sf_dir, "documents")
    scores = tx.hashed_linear_score(docs).select("doc_id", "logit")
    surv = tx.c4_filter_survivors(docs).select(
        "doc_id", F.lit(1).alias("__pass")
    )
    j = scores.join(surv.hint("shuffle_hash"), "doc_id", "left")
    bin_col = F.least(
        F.floor(
            (F.round(F.col("logit") * 1000000, 0) + F.lit(500000))
            / F.lit(10000)
        ).cast("int"),
        F.lit(99),
    )
    bins = (
        j.select(
            bin_col.alias("__bin"),
            F.coalesce(F.col("__pass"), F.lit(0)).alias("__p"),
        )
        .groupBy("__bin")
        .agg(
            F.sum("__p").cast("decimal(38,0)").alias("__np"),
            (F.count(F.lit(1)) - F.sum("__p")).cast("decimal(38,0)").alias("__nn"),
        )
    )
    row = bins.agg(
        F.sort_array(
            F.collect_list(F.struct(F.col("__bin"), F.col("__np"), F.col("__nn")))
        ).alias("__bs"),
        F.sum("__np").alias("__p"),
        F.sum("__nn").alias("__n"),
        F.count(F.lit(1)).alias("__nbins"),
    )
    zero = F.lit(0).cast("decimal(38,0)")
    folded = F.aggregate(
        F.col("__bs"),
        F.struct(zero.alias("cneg"), zero.alias("num")),
        lambda acc, x: F.struct(
            (acc["cneg"] + x["__nn"]).cast("decimal(38,0)").alias("cneg"),
            (acc["num"] + x["__np"] * (acc["cneg"] * F.lit(2) + x["__nn"]))
            .cast("decimal(38,0)")
            .alias("num"),
        ),
    )
    auc = rd(
        F.col("__num").cast("double")
        / (
            F.lit(2.0)
            * F.col("__p").cast("double")
            * F.col("__n").cast("double")
        ),
        6,
    )
    return row.select(
        F.col("__p").cast("long").alias("n_pos"),
        F.col("__n").cast("long").alias("n_neg"),
        F.col("__nbins").cast("long").alias("n_bins"),
        folded["num"].alias("__num"),
        "__p",
        "__n",
    ).select(
        "n_pos",
        "n_neg",
        "n_bins",
        F.when((F.col("__p") > 0) & (F.col("__n") > 0), auc).alias("auc"),
    )


_PSI_DECILES = [i / 10.0 for i in range(1, 10)]


@register(
    "stats_psi_halves_by_type",
    f"""
    WITH ev AS (
      SELECT event_type, epoch_us(ts) AS us, value AS v
      FROM events WHERE value IS NOT NULL
    ),
    rng AS (SELECT min(us) AS u0, max(us) AS u1 FROM ev),
    f AS (
      SELECT event_type, v,
             CASE WHEN us <= (u0 + u1) // 2 THEN 1 ELSE 2 END AS half
      FROM ev CROSS JOIN rng
    ),
    bounds AS (
      SELECT event_type,
             quantile_cont(v, [{", ".join(str(q) for q in _PSI_DECILES)}]) AS bs
      FROM f WHERE half = 1 GROUP BY event_type
    ),
    x AS (
      SELECT f.event_type, f.half,
             len(list_filter(b.bs, q -> f.v > q)) AS bin
      FROM f JOIN bounds b USING (event_type)
    ),
    c AS (
      SELECT event_type, bin,
             sum(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS n1b,
             sum(CASE WHEN half = 2 THEN 1 ELSE 0 END) AS n2b
      FROM x GROUP BY event_type, bin
    ),
    t AS (
      SELECT event_type, sum(n1b) AS n1, sum(n2b) AS n2
      FROM c GROUP BY event_type
    ),
    terms AS (
      SELECT c.event_type, t.n1, t.n2,
             CASE WHEN c.n1b > 0 AND c.n2b > 0 THEN 1 ELSE 0 END AS used,
             CASE WHEN c.n1b > 0 AND c.n2b > 0 THEN
               CAST({R("(CAST(c.n2b AS DOUBLE) / CAST(t.n2 AS DOUBLE)"
                       " - CAST(c.n1b AS DOUBLE) / CAST(t.n1 AS DOUBLE))"
                       " * ln((CAST(c.n2b AS DOUBLE) / CAST(t.n2 AS DOUBLE))"
                       " / (CAST(c.n1b AS DOUBLE) / CAST(t.n1 AS DOUBLE)))", 8)}
                 AS DECIMAL(38,8))
             END AS term
      FROM c JOIN t USING (event_type)
    )
    SELECT event_type,
           CAST(max(n1) AS BIGINT) AS n1, CAST(max(n2) AS BIGINT) AS n2,
           CAST(sum(used) AS BIGINT) AS n_bins_used,
           CAST(count(*) - sum(used) AS BIGINT) AS n_bins_skipped,
           {R("CAST(sum(term) AS DOUBLE)", 6)} AS psi
    FROM terms GROUP BY event_type
    """,
)
def _q_stats_psi_halves(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index drift per event type: second
    time-half value proportions against FIRST-half decile bins — the
    industry drift score (PSI = Σ(p2−p1)·ln(p2/p1); >0.1 = shifting,
    >0.25 = shifted) completing the drift family next to KS (max CDF
    gap), chi2 (categorical) and W1: PSI is the one monitoring
    dashboards alarm on, because per-bin terms say WHERE the mass
    moved. Same global integer-midpoint time split as
    `stats_ks_halves_by_type` so the family reads one split. Bins are
    the reference deciles (exact interpolated percentiles, the MAD
    precedent); bin membership is one broadcast array fold per row
    (strict ``v > boundary``, identical in both engines — no explode,
    no window); terms are 8-dp-rounded and decimal-summed so partial
    aggregation cannot reorder float error; empty bins (either side)
    are skipped and REPORTED rather than epsilon-fudged. Plan: two
    event scans (bounds, then binning) + two bounded aggs — holds at
    any N; the 1-row range is the sanctioned scalar cross join."""
    ev = _events(spark, sf_dir).filter(F.col("value").isNotNull())
    us = event_micros(ev)
    base = ev.select("event_type", us.alias("__us"), F.col("value").alias("__v"))
    rng = base.agg(F.min("__us").alias("__u0"), F.max("__us").alias("__u1"))
    halved = base.crossJoin(F.broadcast(rng)).select(
        "event_type",
        "__v",
        F.when(F.col("__us") <= F.expr("(__u0 + __u1) DIV 2"), 1)
        .otherwise(2)
        .alias("__half"),
    )
    bounds = (
        halved.filter(F.col("__half") == 1)
        .groupBy("event_type")
        .agg(
            F.percentile(
                F.col("__v"), F.array(*[F.lit(q) for q in _PSI_DECILES])
            ).alias("__bs")
        )
    )
    x = halved.join(F.broadcast(bounds), "event_type").select(
        "event_type",
        "__half",
        F.aggregate(
            F.col("__bs"),
            F.lit(0),
            lambda acc, q: acc + F.when(F.col("__v") > q, 1).otherwise(0),
        ).alias("__bin"),
    )
    c = x.groupBy("event_type", "__bin").agg(
        F.sum(F.when(F.col("__half") == 1, 1).otherwise(0)).alias("__n1b"),
        F.sum(F.when(F.col("__half") == 2, 1).otherwise(0)).alias("__n2b"),
    )
    t = c.groupBy("event_type").agg(
        F.sum("__n1b").alias("__n1"), F.sum("__n2b").alias("__n2")
    )
    ct = c.join(F.broadcast(t), "event_type")
    p1 = F.col("__n1b").cast("double") / F.col("__n1").cast("double")
    p2 = F.col("__n2b").cast("double") / F.col("__n2").cast("double")
    ok = (F.col("__n1b") > 0) & (F.col("__n2b") > 0)
    term = F.when(ok, rd((p2 - p1) * F.log(p2 / p1), 8).cast("decimal(38,8)"))
    out = ct.select(
        "event_type",
        "__n1",
        "__n2",
        F.when(ok, 1).otherwise(0).alias("__used"),
        term.alias("__term"),
    ).groupBy("event_type").agg(
        F.max("__n1").cast("long").alias("n1"),
        F.max("__n2").cast("long").alias("n2"),
        F.sum("__used").cast("long").alias("n_bins_used"),
        (F.count(F.lit(1)) - F.sum("__used")).cast("long").alias("n_bins_skipped"),
        rd(F.sum("__term").cast("double"), 6).alias("psi"),
    )
    return out


@register(
    "linkage_golden_record",
    f"""
    WITH RECURSIVE {_LINKAGE_SCORED_SQL},
    me AS (
      SELECT id_a, id_b FROM scored WHERE score >= 8
    ),
    sym AS (
      SELECT id_a AS src, id_b AS dst FROM me
      UNION
      SELECT id_b AS src, id_a AS dst FROM me
    ),
    reach(src, dst) AS (
      SELECT DISTINCT src, src FROM sym
      UNION
      SELECT r.src, s.dst FROM reach r JOIN sym s ON s.src = r.dst
    ),
    lbl AS (
      SELECT src AS doc_id, min(dst) AS entity_id FROM reach GROUP BY src
    ),
    g AS (
      SELECT l.entity_id, count(*) AS n_members,
             min(d.n_chars) AS min_n_chars, max(d.n_chars) AS max_n_chars
      FROM lbl l JOIN documents d ON d.doc_id = l.doc_id
      GROUP BY l.entity_id
    )
    SELECT g.entity_id, CAST(g.n_members AS BIGINT) AS n_members,
           dc.lang AS canonical_lang, dc.source AS canonical_source,
           g.min_n_chars, g.max_n_chars
    FROM g JOIN documents dc ON dc.doc_id = g.entity_id
    """,
)
def _q_linkage_golden_record(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity resolution END of the linkage pipeline: transitive
    closure over the Fellegi-Sunter 'match' pairs (same factored
    candidate chain as `dedup_linkage_scores` — `_LINKAGE_SCORED_SQL`)
    into entities, then one GOLDEN RECORD per multi-member entity:
    entity_id = min member id, member count, the canonical (min-id)
    member's attributes, and the member size span. This is the
    master-data rollup a dedup decision feeds — pairwise scores alone
    can't be acted on until transitivity is resolved (A~B, B~C ⇒ one
    entity even when A,C never paired). Closure via the same
    min-label propagation + pointer-jumping as `dedup_clusters`
    (O(log n) rounds, (id,label) longs only); the oracle replays it
    with a recursive CTE. Canonical attributes come from ONE
    doc_id-keyed join against the entity id — no per-entity text ever
    shuffles."""
    docs = _table(spark, sf_dir, "documents")
    match_pairs = dd.linkage_scores(docs).filter(
        F.col("link_class") == "match"
    ).select("id_a", "id_b")
    lbl = dd.connected_components(match_pairs)
    g = (
        lbl.join(
            docs.select(F.col("doc_id"), F.col("n_chars")).hint("shuffle_hash"),
            "doc_id",
        )
        .groupBy(F.col("cluster_id").alias("entity_id"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_members"),
            F.min("n_chars").alias("min_n_chars"),
            F.max("n_chars").alias("max_n_chars"),
        )
    )
    canon = docs.select(
        F.col("doc_id").alias("entity_id"),
        F.col("lang").alias("canonical_lang"),
        F.col("source").alias("canonical_source"),
    )
    return g.join(canon.hint("shuffle_hash"), "entity_id").select(
        "entity_id",
        "n_members",
        "canonical_lang",
        "canonical_source",
        "min_n_chars",
        "max_n_chars",
    )


# ---------------------------------------------------------------------------
# r7 wave 32: banded DTW channel distance
# ---------------------------------------------------------------------------

_DTW_B, _DTW_L, _DTW_W = 21_600_000_000, 120, 8
_DTW_INF = 1_000_000_000_000_000


@register(
    "ts_dtw_channel_pairs",
    f"""
    WITH RECURSIVE e AS (
      SELECT event_type AS ty, epoch_us(ts) AS t, value AS v FROM events
    ),
    rng AS (SELECT min(t) AS t0 FROM e),
    bk AS (
      SELECT ty, (t - t0) // {_DTW_B} AS b,
             CAST(floor(v * 10000.0 + 0.5) AS BIGINT) AS sv
      FROM e CROSS JOIN rng
      WHERE (t - t0) // {_DTW_B} BETWEEN 0 AND {_DTW_L - 1}
    ),
    s AS (SELECT ty, b, CAST(sum(sv) AS BIGINT) AS s FROM bk GROUP BY 1, 2),
    tys AS (SELECT DISTINCT ty FROM e),
    grid AS (
      SELECT tys.ty, g.b
      FROM tys CROSS JOIN (SELECT unnest(range(0, {_DTW_L})) AS b) g
    ),
    dense AS (
      SELECT grid.ty, grid.b, COALESCE(s.s, 0) AS s
      FROM grid LEFT JOIN s ON s.ty = grid.ty AND s.b = grid.b
    ),
    ser AS (SELECT ty, list(s ORDER BY b) AS vs FROM dense GROUP BY ty),
    pairs AS (
      SELECT a.ty AS type_a, b.ty AS type_b, a.vs AS xs, b.vs AS ys
      FROM ser a JOIN ser b ON a.ty < b.ty
    ),
    r0 AS (
      SELECT type_a, type_b, xs, ys,
        list_reduce(
          list_transform(range(0, {_DTW_L}), j ->
            CASE WHEN j = 0 THEN [abs(xs[1] - ys[1])]
                 ELSE [CAST(j AS BIGINT)] END),
          (acc, x) -> list_append(acc,
            CASE WHEN x[1] > {_DTW_W} THEN {_DTW_INF}
                 ELSE abs(xs[1] - ys[x[1] + 1]) + acc[len(acc)] END)
        ) AS row
      FROM pairs
    ),
    dp AS (
      SELECT type_a, type_b, xs, ys, 0 AS i, row FROM r0
      UNION ALL
      SELECT type_a, type_b, xs, ys, i + 1,
        list_reduce(
          list_transform(range(0, {_DTW_L}), j ->
            CASE WHEN j = 0 THEN
              [CASE WHEN i + 1 > {_DTW_W} THEN {_DTW_INF}
                    ELSE abs(xs[i + 2] - ys[1]) + row[1] END]
            ELSE [CAST(j AS BIGINT)] END),
          (acc, x) -> list_append(acc,
            CASE WHEN abs((i + 1) - x[1]) > {_DTW_W} THEN {_DTW_INF}
                 ELSE abs(xs[i + 2] - ys[x[1] + 1])
                      + least(row[x[1] + 1], row[x[1]], acc[len(acc)]) END)
        )
      FROM dp WHERE i < {_DTW_L - 1}
    )
    SELECT type_a, type_b,
           CAST({_DTW_L} AS INTEGER) AS n_buckets,
           CAST({_DTW_W} AS INTEGER) AS band,
           row[{_DTW_L}] AS dtw_cost_e4,
           CAST(list_aggregate(list_transform(range(0, {_DTW_L}),
                j -> abs(xs[j + 1] - ys[j + 1])), 'sum') AS BIGINT)
             AS lockstep_cost_e4,
           {R(f"CAST(row[{_DTW_L}] AS DOUBLE) / 10000.0 / {float(_DTW_L)}", 6)}
             AS dtw_per_step
    FROM dp WHERE i = {_DTW_L - 1}
    """,
)
def _q_ts_dtw_channel_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sakoe-Chiba banded DTW between every channel pair
    (`ts.dtw_band_distance`): the alignment-invariant distance — which
    channels move together modulo a local warp of ±8 six-hour buckets.
    The DP is a nested `F.aggregate` fold over integer arrays (pure
    Catalyst higher-order functions, exact bigint end-to-end); the
    oracle replays the identical recurrence with a recursive CTE +
    list_reduce, so costs compare EXACTLY. The lockstep (band-0)
    distance rides along: DTW ≤ lockstep is a pinned identity."""
    e = _events_us(spark, sf_dir)
    return ts.dtw_band_distance(
        e, bucket_us=_DTW_B, n_buckets=_DTW_L, band=_DTW_W
    )


# ---------------------------------------------------------------------------
# r7 wave 33: NDCG@k retrieval eval (completes the MRR/recall family)
# ---------------------------------------------------------------------------

_NDCG_K = 10
_NDCG_WS, _NDCG_IDCG = sim.ndcg_weights(_NDCG_K)


@register(
    "emb_retrieval_ndcg",
    f"""
    WITH {_LSH_RANKED_SQL},
    lbl AS (SELECT vec_id, label FROM embeddings),
    cnt AS (SELECT label, count(*) AS c FROM embeddings GROUP BY label),
    terms AS (
      SELECT r.vid,
             CASE WHEN n.label = q.label AND r.rk <= {_NDCG_K}
                  THEN CAST(([{", ".join(repr(w) for w in _NDCG_WS)}])[r.rk]
                            AS DECIMAL(38,9))
                  ELSE CAST(0 AS DECIMAL(38,9)) END AS term
      FROM ranked r
      JOIN lbl q ON q.vec_id = r.vid
      JOIN lbl n ON n.vec_id = r.nbr
    ),
    dcg AS (SELECT vid, sum(term) AS dcg FROM terms GROUP BY vid),
    perq AS (
      SELECT q.vec_id AS vid, q.label AS q_lbl,
             CASE WHEN least({_NDCG_K}, cnt.c - 1) >= 1 THEN
               {R(f"CAST(COALESCE(d.dcg, 0) AS DOUBLE)"
                  f" / ([{', '.join(repr(v) for v in _NDCG_IDCG)}])"
                  f"[least({_NDCG_K}, cnt.c - 1)]", 6)}
             END AS ndcg
      FROM embeddings q
      JOIN cnt ON cnt.label = q.label
      LEFT JOIN dcg d ON d.vid = q.vec_id
    )
    SELECT q_lbl AS label,
           count(*) AS n_queries,
           CAST(count(*) FILTER (WHERE ndcg = 0.0) AS BIGINT) AS n_zero,
           {R("CAST(sum(CAST(ndcg AS DECIMAL(38,6))) AS DOUBLE)"
              " / CAST(count(*) AS DOUBLE)", 6)} AS ndcg
    FROM perq GROUP BY q_lbl
    """,
)
def _q_emb_retrieval_ndcg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NDCG@10 with labels as binary relevance
    (`sim.retrieval_ndcg`): the graded-position retrieval eval over
    the SAME LSH-blocked exact-cosine ranking as `emb_retrieval_mrr`
    (factored `_LSH_RANKED_SQL`, so the two evals can never rank
    different candidates). MRR reads the FIRST hit's depth; NDCG pays
    for every relevant item the top-k misses — normalized by the ideal
    DCG over min(k, |label|−1) corpus-wide relevants, it also charges
    the blocking structure for candidates it never produced.
    Position weights and the IDCG table are shared 9-dp literals
    (`sim.ndcg_weights`) — neither engine computes log2 at query
    time."""
    emb = _table(spark, sf_dir, "embeddings")
    bits = _knn_bits(emb.count())
    return sim.retrieval_ndcg(
        emb, k=_NDCG_K, bits=bits, tables=_EMB_TABLES, dim=_EMB_DIM
    )


# ---------------------------------------------------------------------------
# r7 wave 34: distributed BPE merge trainer
# ---------------------------------------------------------------------------

_BPE_ROUNDS = 5


def _bpe_cte(rounds: int) -> str:
    """Unrolled per-round CTE chain replaying the trainer verbatim:
    pair count → deterministic top-1 → corpus rewrite. The rewrite is
    a DELIMITER-GUARDED string replace — tokens joined by '||' and
    wrapped in single '|' ends, so pair (a,b) is the substring
    '|a||b|' and its merge is '|a b|'; occurrences share no characters
    and replace() scans leftmost non-overlapping, which is EXACTLY the
    fold's (arr, carry) semantics (incl. the 'a a a' overlap case:
    first two merge, third survives). Chosen over list_reduce, whose
    DuckDB 1.0 lambda list-aliasing corrupts multi-round folds (see
    the verify skill); tokens are [a-z0-9 ]+ so '|' can never occur
    inside one.

    Returns the ``WITH ...`` prefix ending at ``s{rounds}`` (the fully
    rewritten corpus) and ``m1..m{rounds}`` (the merge table) — shared
    by the trainer, encoder, and real-token packing oracles, which
    append their own final SELECT."""
    head = """t0 AS (
      SELECT doc_id,
             list_filter(string_split(trim(regexp_replace(lower(text),
                 '[^a-z0-9]+', ' ', 'g')), ' '), x -> length(x) > 0) AS toks
      FROM documents WHERE text IS NOT NULL
    ),
    s0 AS (
      SELECT doc_id, '|' || array_to_string(toks, '||') || '|' AS s FROM t0
    )"""
    parts = [head]
    pair_toks = (
        "list_filter(string_split(trim(s, '|'), '||'), x -> length(x) > 0)"
    )
    for r in range(1, rounds + 1):
        parts.append(f"""p{r} AS (
      SELECT u['a'] AS a, u['b'] AS b, count(*) AS cnt
      FROM (SELECT unnest(list_transform(range(1, len(toks)),
                    i -> {{'a': toks[i], 'b': toks[i + 1]}})) AS u
            FROM (SELECT {pair_toks} AS toks FROM s{r - 1}))
      GROUP BY 1, 2
    ),
    m{r} AS (
      SELECT a, b, cnt FROM p{r}
      QUALIFY row_number() OVER (ORDER BY cnt DESC, a ASC, b ASC) = 1
    ),
    s{r} AS (
      SELECT t.doc_id,
             replace(t.s, '|' || m.a || '||' || m.b || '|',
                          '|' || m.a || ' ' || m.b || '|') AS s
      FROM s{r - 1} t CROSS JOIN m{r} m
    )""")
    return "WITH " + ",\n    ".join(parts)


def _bpe_oracle_sql(rounds: int) -> str:
    """The trainer oracle: the merge table from the shared CTE chain."""
    union = "\n    UNION ALL\n    ".join(
        f"SELECT CAST({r} AS INTEGER) AS round, a AS lhs, b AS rhs, cnt AS n_merges FROM m{r}"
        for r in range(1, rounds + 1)
    )
    return _bpe_cte(rounds) + "\n    " + union


@register("text_bpe_merge_rounds", _bpe_oracle_sql(_BPE_ROUNDS))
def _q_text_bpe_merge_rounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed BPE-style merge training (`tx.bpe_merge_trainer`,
    word-level Sennrich et al. 2016 — equivalently greedy phrase
    mining): five rounds of most-frequent-adjacent-pair merge over the
    whole corpus, later rounds free to merge earlier merges into
    longer phrases. The returned merge table IS the trained tokenizer
    artifact. Per round: one token scan (zip_with slices → pair
    explode → map-side-combined count), top-1 via TakeOrdered (no
    global sort), then the corpus rewrite as ONE `F.aggregate` fold
    per document (struct (arr, carry) state, leftmost-first
    non-overlapping) — all codegen; lineage truncated per round. The
    oracle unrolls all five rounds verbatim, fold included."""
    docs = _table(spark, sf_dir, "documents")
    return tx.bpe_merge_trainer(docs, rounds=_BPE_ROUNDS)


# ---------------------------------------------------------------------------
# r7 wave 35: streaming PSI drift monitor
# ---------------------------------------------------------------------------


@register(
    "stream_psi_drift_daily",
    f"""
    WITH ev AS (
      SELECT event_type, ts, value FROM events WHERE value IS NOT NULL
    ),
    bounds AS (
      SELECT event_type,
             quantile_cont(value, [{", ".join(str(q) for q in _PSI_DECILES)}]) AS bs
      FROM ev GROUP BY event_type
    ),
    binned AS (
      SELECT e.event_type, date_trunc('day', e.ts) AS window_start,
             len(list_filter(b.bs, q -> e.value > q)) AS bin
      FROM ev e JOIN bounds b USING (event_type)
    ),
    refc AS (
      SELECT event_type, bin, count(*) AS rc FROM binned GROUP BY 1, 2
    ),
    reft AS (SELECT event_type, sum(rc) AS nr FROM refc GROUP BY 1),
    wc AS (
      SELECT event_type, window_start, bin, count(*) AS cw
      FROM binned GROUP BY 1, 2, 3
    ),
    wt AS (
      SELECT event_type, window_start, sum(cw) AS n
      FROM wc GROUP BY 1, 2
    ),
    grid AS (
      SELECT wt.event_type, wt.window_start, wt.n, g.bin
      FROM wt CROSS JOIN (SELECT unnest(range(0, 10)) AS bin) g
    ),
    terms AS (
      SELECT grid.event_type, grid.window_start, grid.n,
             COALESCE(wc.cw, 0) AS cw, COALESCE(refc.rc, 0) AS rc, reft.nr,
             CASE WHEN COALESCE(wc.cw, 0) > 0 AND COALESCE(refc.rc, 0) > 0
                  THEN 1 ELSE 0 END AS used,
             CASE WHEN COALESCE(wc.cw, 0) > 0 AND COALESCE(refc.rc, 0) > 0
               THEN CAST({R("(CAST(wc.cw AS DOUBLE) / CAST(grid.n AS DOUBLE)"
                            " - CAST(refc.rc AS DOUBLE) / CAST(reft.nr AS DOUBLE))"
                            " * ln((CAST(wc.cw AS DOUBLE) / CAST(grid.n AS DOUBLE))"
                            " / (CAST(refc.rc AS DOUBLE) / CAST(reft.nr AS DOUBLE)))", 8)}
                    AS DECIMAL(38,8))
             END AS term
      FROM grid
      LEFT JOIN wc ON wc.event_type = grid.event_type
                  AND wc.window_start = grid.window_start
                  AND wc.bin = grid.bin
      LEFT JOIN refc ON refc.event_type = grid.event_type
                    AND refc.bin = grid.bin
      JOIN reft ON reft.event_type = grid.event_type
    )
    SELECT window_start, event_type, CAST(max(n) AS BIGINT) AS n,
           CAST(sum(used) AS BIGINT) AS n_bins_used,
           CAST(count(*) - sum(used) AS BIGINT) AS n_bins_skipped,
           {R("CAST(sum(term) AS DOUBLE)", 6)} AS psi
    FROM terms GROUP BY window_start, event_type
    """,
)
def _q_stream_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming PSI drift monitor (`stream_ops.stream_psi_drift`):
    per tumbling DAY window and channel, the PSI of that window's
    value distribution against the corpus-wide reference deciles — the
    continuous twin of `stats_psi_halves_by_type` (same bins, same
    term arithmetic, same skip-and-report contract). Streaming state
    is 10 bin counters + a total per open (window, type) — pure
    map-side-combinable sums, so the complete-mode final state equals
    the batch GROUP BY and the exact oracle applies; bin assignment is
    a stateless stream-static broadcast array fold."""
    from time_series_data_trimmer_spark.streaming.stream_ops import (
        stream_psi_drift,
    )

    return stream_psi_drift(spark, os.path.join(sf_dir, "events.parquet"))


# ---------------------------------------------------------------------------
# r7 wave 36: isotonic calibration + k-anonymity privacy audit
# ---------------------------------------------------------------------------


@register(
    "eval_isotonic_calibration",
    f"""
    WITH {_HLS_VS_C4_SQL},
    b AS (
      SELECT least(CAST(floor((round(sc.logit * 1000000, 0) + 500000)
                               / 100000) AS INT), 9) AS bin,
             CASE WHEN surv.doc_id IS NOT NULL THEN 1 ELSE 0 END AS pass
      FROM sc LEFT JOIN surv ON surv.doc_id = sc.doc_id
    ),
    bins AS (
      SELECT bin, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(pass) AS BIGINT) AS np
      FROM b GROUP BY bin
    ),
    packed AS (
      SELECT list(bin ORDER BY bin) AS bs,
             list(n ORDER BY bin) AS cs,
             list(np ORDER BY bin) AS ps,
             count(*) AS m
      FROM bins
    ),
    pre AS (
      SELECT bs, cs, ps, m,
             list_transform(range(0, m + 1), i ->
               CAST(list_aggregate(list_concat([CAST(0 AS BIGINT)],
                    list_slice(cs, 1, i)), 'sum') AS BIGINT)) AS pc,
             list_transform(range(0, m + 1), i ->
               CAST(list_aggregate(list_concat([CAST(0 AS BIGINT)],
                    list_slice(ps, 1, i)), 'sum') AS BIGINT)) AS pp
      FROM packed
    ),
    fit AS (
      SELECT bs, cs, ps, m,
             list_transform(range(0, m), i ->
               list_aggregate(
                 list_transform(range(0, i + 1), j ->
                   list_aggregate(
                     list_transform(range(i, m), k ->
                       CAST(pp[k + 2] - pp[j + 1] AS DOUBLE)
                       / CAST(pc[k + 2] - pc[j + 1] AS DOUBLE)),
                     'min')),
                 'max')) AS iso
      FROM pre
    ),
    rows_ AS (
      SELECT unnest(range(0, m)) AS i, bs, cs, ps, iso FROM fit
    )
    SELECT CAST(bs[i + 1] AS INTEGER) AS bin,
           cs[i + 1] AS n_docs,
           ps[i + 1] AS n_pass,
           {R("CAST(ps[i + 1] AS DOUBLE) / CAST(cs[i + 1] AS DOUBLE)", 6)}
             AS pass_rate,
           {R("iso[i + 1]", 6)} AS iso_rate
    FROM rows_
    """,
)
def _q_eval_isotonic_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ISOTONIC (PAVA) calibration of the cheap scorer against the C4
    gate: the monotone-non-decreasing pass-rate curve closest (weighted
    L2) to the raw per-bin rates — the calibration map a production
    threshold actually ships, completing the eval trilogy (reliability
    diagram = raw rates, AUC = ranking power, isotonic = the deployable
    monotone curve). Same factored logit/label (`_HLS_VS_C4_SQL`) and
    the calibration query's exact integer-grid bins.

    No sequential PAVA loop anywhere: the fit uses the CLOSED minimax
    form fitted[i] = max_{{j≤i}} min_{{k≥i}} avg(y[j..k]) over exact
    integer prefix sums — pure nested min/max array transforms on ONE
    collected row (≤10 bins ⇒ ≤1000 exact-rational terms), identical
    in both engines because every compared double is a ratio of exact
    integers. Zero windows, zero joins after the bin agg."""
    docs = _table(spark, sf_dir, "documents")
    scores = tx.hashed_linear_score(docs).select("doc_id", "logit")
    surv = tx.c4_filter_survivors(docs).select(
        "doc_id", F.lit(1).alias("__pass")
    )
    j = scores.join(surv.hint("shuffle_hash"), "doc_id", "left")
    bin_col = F.least(
        F.floor(
            (F.round(F.col("logit") * 1000000, 0) + F.lit(500000))
            / F.lit(100000)
        ).cast("int"),
        F.lit(9),
    )
    bins = (
        j.select(
            bin_col.alias("__bin"),
            F.coalesce(F.col("__pass"), F.lit(0)).alias("__p"),
        )
        .groupBy("__bin")
        .agg(
            F.count(F.lit(1)).cast("long").alias("__n"),
            F.sum("__p").cast("long").alias("__np"),
        )
    )
    packed = bins.agg(
        F.sort_array(
            F.collect_list(F.struct(F.col("__bin"), F.col("__n"), F.col("__np")))
        ).alias("__a"),
        F.count(F.lit(1)).cast("int").alias("__m"),
    ).select(
        F.transform(F.col("__a"), lambda x: x["__bin"]).alias("__bs"),
        F.transform(F.col("__a"), lambda x: x["__n"]).alias("__cs"),
        F.transform(F.col("__a"), lambda x: x["__np"]).alias("__ps"),
        F.col("__m"),
    )
    zero_l = F.lit(0).cast("long")

    def prefix(arr):
        return F.transform(
            F.sequence(F.lit(0), F.col("__m")),
            lambda i: F.aggregate(
                F.slice(arr, F.lit(1), i), zero_l, lambda a, v: a + v
            ),
        )

    pre = packed.select(
        "__bs", "__cs", "__ps", "__m",
        prefix(F.col("__cs")).alias("__pc"),
        prefix(F.col("__ps")).alias("__pp"),
    )
    pp, pc = F.col("__pp"), F.col("__pc")
    iso = F.transform(
        F.sequence(F.lit(0), F.col("__m") - 1),
        lambda i: F.array_max(
            F.transform(
                F.sequence(F.lit(0), i),
                lambda j: F.array_min(
                    F.transform(
                        F.sequence(i, F.col("__m") - 1),
                        lambda k: (
                            F.element_at(pp, k + 2) - F.element_at(pp, j + 1)
                        ).cast("double")
                        / (
                            F.element_at(pc, k + 2) - F.element_at(pc, j + 1)
                        ).cast("double"),
                    )
                ),
            )
        ),
    )
    rows = pre.select(
        "__bs", "__cs", "__ps", iso.alias("__iso"),
        F.explode(F.sequence(F.lit(0), F.col("__m") - 1)).alias("__i"),
    )
    at = lambda a: F.element_at(F.col(a), F.col("__i") + 1)  # noqa: E731
    return rows.select(
        at("__bs").cast("int").alias("bin"),
        at("__cs").alias("n_docs"),
        at("__ps").alias("n_pass"),
        rd(at("__ps").cast("double") / at("__cs").cast("double"), 6).alias(
            "pass_rate"
        ),
        rd(at("__iso"), 6).alias("iso_rate"),
    )


_KANON_BAND = 256


@register(
    "privacy_k_anonymity_audit",
    f"""
    WITH q AS (
      SELECT lang, source, n_chars // {_KANON_BAND} AS size_band
      FROM documents
    ),
    g AS (
      SELECT lang, source, size_band, count(*) AS k
      FROM q GROUP BY 1, 2, 3
    ),
    classed AS (
      SELECT CASE WHEN k = 1 THEN 'k=1 unique'
                  WHEN k < 5 THEN 'k=2-4'
                  WHEN k < 20 THEN 'k=5-19'
                  ELSE 'k>=20' END AS risk_class,
             k
      FROM g
    )
    SELECT risk_class,
           CAST(count(*) AS BIGINT) AS n_groups,
           CAST(sum(k) AS BIGINT) AS n_docs,
           CAST(min(k) AS BIGINT) AS min_k,
           CAST(max(k) AS BIGINT) AS max_k
    FROM classed GROUP BY risk_class
    """,
)
def _q_privacy_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-ANONYMITY audit over the corpus's quasi-identifier tuple
    (lang, source, 256-char size band): how many documents sit in
    equivalence classes small enough to re-identify (k=1 means the
    metadata alone pins the document). The release gate a corpus runs
    BEFORE publication — unique quasi-identifier combinations are
    where linkage attacks start (Sweeney 2002), and at 100 TB the
    audit is exactly one partial-agg groupBy over three narrow
    columns + a bounded 4-row rollup. Integer band edges (`div`) so
    the classes reproduce in any engine."""
    docs = _table(spark, sf_dir, "documents")
    g = (
        docs.select(
            "lang",
            "source",
            F.expr(f"n_chars DIV {_KANON_BAND}").alias("size_band"),
        )
        .groupBy("lang", "source", "size_band")
        .agg(F.count(F.lit(1)).alias("k"))
    )
    risk = (
        F.when(F.col("k") == 1, "k=1 unique")
        .when(F.col("k") < 5, "k=2-4")
        .when(F.col("k") < 20, "k=5-19")
        .otherwise("k>=20")
    )
    return g.select(risk.alias("risk_class"), "k").groupBy("risk_class").agg(
        F.count(F.lit(1)).cast("long").alias("n_groups"),
        F.sum("k").cast("long").alias("n_docs"),
        F.min("k").cast("long").alias("min_k"),
        F.max("k").cast("long").alias("max_k"),
    )


# ---------------------------------------------------------------------------
# r7 wave 37: Matryoshka recall-by-prefix-dims sweep
# ---------------------------------------------------------------------------

_MRL_DIMS = (8, 16, 32, 64)
_MRL_SHORTLIST = 40


def _mrl_dim_cols_sql() -> str:
    return ",\n             ".join(
        f"CAST(sum(CASE WHEN q.i <= {d} THEN CAST({sql_rd('q.x * e.x', 9)} AS DECIMAL(38,9)) END) AS DOUBLE) AS dxy{d},\n"
        f"             CAST(sum(CASE WHEN q.i <= {d} THEN CAST({sql_rd('e.x * e.x', 9)} AS DECIMAL(38,9)) END) AS DOUBLE) AS dxx{d}"
        for d in _MRL_DIMS
    )


@register(
    "emb_matryoshka_recall_by_dim",
    f"""
    WITH ex AS ({_EX_SQL}),
    qex AS (SELECT vec_id AS qid, i, x FROM ex WHERE vec_id < {_RECALL_Q}),
    qn AS (
      SELECT qid,
             {", ".join(f'''CAST(sum(CASE WHEN i <= {d} THEN CAST({sql_rd("x * x", 9)} AS DECIMAL(38,9)) END) AS DOUBLE) AS qxx{d}''' for d in _MRL_DIMS)}
      FROM qex GROUP BY qid
    ),
    dots AS (
      SELECT q.qid, e.vec_id,
             {_mrl_dim_cols_sql()}
      FROM qex q JOIN ex e ON e.i = q.i AND e.vec_id <> q.qid
      GROUP BY q.qid, e.vec_id
    ),
    cosd AS (
      {" UNION ALL ".join(
        f'''SELECT {d} AS pd, d.qid, d.vec_id,
               {R(f"d.dxy{d} / (sqrt(n.qxx{d}) * sqrt(d.dxx{d}))", 6)} AS c
        FROM dots d JOIN qn n ON n.qid = d.qid'''
        for d in _MRL_DIMS)}
    ),
    short AS (
      SELECT pd, qid, vec_id FROM (
        SELECT pd, qid, vec_id,
               row_number() OVER (PARTITION BY pd, qid
                                  ORDER BY c DESC, vec_id ASC) AS rn
        FROM cosd
      ) WHERE rn <= {_MRL_SHORTLIST}
    ),
    truth AS (
      SELECT qid, vec_id FROM (
        SELECT qid, vec_id,
               row_number() OVER (PARTITION BY qid
                                  ORDER BY c DESC, vec_id ASC) AS rn
        FROM cosd WHERE pd = {max(_MRL_DIMS)}
      ) WHERE rn <= 10
    )
    SELECT s.pd AS prefix_dims,
           CAST(count(t.qid) AS BIGINT) AS n_hits,
           {R(f"CAST(count(t.qid) AS DOUBLE) / ({_RECALL_Q} * 10.0)", 6)}
             AS recall_at_10
    FROM short s
    LEFT JOIN truth t ON t.qid = s.qid AND t.vec_id = s.vec_id
    GROUP BY s.pd
    """,
)
def _q_emb_matryoshka_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MEASURED recall for the Matryoshka prefix-dims knob
    (`sim.matryoshka_topk`'s coarse tier): recall@10 over the standard
    {_RECALL_Q} probes when the 40-deep shortlist is built from only
    the first D ∈ {_MRL_DIMS} coordinates — the exact re-rank recovers
    ordering, so the ONLY loss is truth items the prefix tier never
    shortlists, and recall = |truth ∩ shortlist| / 10 exactly. D=64 is
    the built-in identity row (full-dim shortlist ⊇ truth ⇒ recall 1),
    pinning the harness. Completes the measured cost-vs-recall family:
    LSH bits, IVF nprobe, PQ bits, and now the MRL prefix — every
    approximate blocking structure in the repo carries its forfeit
    curve. One pass computes all four prefix dots as conditional
    decimal sums (no fourfold scan); per-(D, probe) ranks are keyed
    windows."""
    emb = _table(spark, sf_dir, "embeddings")
    ex = emb.select(
        "vec_id", F.posexplode("embedding").alias("i", "x")
    ).withColumn("x", F.col("x").cast("double"))
    qex = ex.filter(F.col("vec_id") < _RECALL_Q).select(
        F.col("vec_id").alias("qid"), "i", F.col("x").alias("__qx")
    )

    def csum(cond, term):
        return F.sum(F.when(cond, rd(term, 9).cast("decimal(38,9)"))).cast(
            "double"
        )

    qn = qex.groupBy("qid").agg(
        *[
            csum(F.col("i") < d, F.col("__qx") * F.col("__qx")).alias(f"__qxx{d}")
            for d in _MRL_DIMS
        ]
    )
    dots = (
        ex.join(F.broadcast(qex), "i")
        .filter(F.col("vec_id") != F.col("qid"))
        .groupBy("qid", "vec_id")
        .agg(
            *[
                c
                for d in _MRL_DIMS
                for c in (
                    csum(F.col("i") < d, F.col("__qx") * F.col("x")).alias(
                        f"__dxy{d}"
                    ),
                    csum(F.col("i") < d, F.col("x") * F.col("x")).alias(
                        f"__dxx{d}"
                    ),
                )
            ]
        )
    )
    j = dots.join(F.broadcast(qn), "qid")
    cosd = None
    for d in _MRL_DIMS:
        c = rd(
            F.col(f"__dxy{d}")
            / (F.sqrt(F.col(f"__qxx{d}")) * F.sqrt(F.col(f"__dxx{d}"))),
            6,
        )
        part = j.select(
            F.lit(d).alias("pd"), "qid", "vec_id", c.alias("__c")
        )
        cosd = part if cosd is None else cosd.unionByName(part)
    wsh = Window.partitionBy("pd", "qid").orderBy(
        F.col("__c").desc(), F.col("vec_id").asc()
    )
    short = (
        cosd.withColumn("__rn", F.row_number().over(wsh))
        .filter(F.col("__rn") <= _MRL_SHORTLIST)
        .select("pd", "qid", "vec_id")
    )
    wtr = Window.partitionBy("qid").orderBy(
        F.col("__c").desc(), F.col("vec_id").asc()
    )
    truth = (
        cosd.filter(F.col("pd") == max(_MRL_DIMS))
        .withColumn("__rn", F.row_number().over(wtr))
        .filter(F.col("__rn") <= 10)
        .select(F.col("qid"), F.col("vec_id"), F.lit(1).alias("__hit"))
    )
    return (
        short.join(truth.hint("shuffle_hash"), ["qid", "vec_id"], "left")
        .groupBy(F.col("pd").alias("prefix_dims"))
        .agg(
            F.sum(F.coalesce(F.col("__hit"), F.lit(0)))
            .cast("long")
            .alias("n_hits"),
        )
        .select(
            "prefix_dims",
            "n_hits",
            rd(
                F.col("n_hits").cast("double") / F.lit(_RECALL_Q * 10.0), 6
            ).alias("recall_at_10"),
        )
    )


# ---------------------------------------------------------------------------
# r7 wave 38: Brown double-smoothing forecast
# ---------------------------------------------------------------------------

_HOLT_D = 8


def _holt_sql() -> str:
    D = _HOLT_D
    den1 = (1 << D) - 1
    num1 = " + ".join(
        f"lag(v, {j}) OVER w * {1 << (D - 1 - j)}" if j else f"v * {1 << (D - 1)}"
        for j in range(D)
    )
    num2 = " + ".join(
        (f"lag(v, {m}) OVER w" if m else "v")
        + f" * {min(m + 1, 2 * D - 1 - m) * (1 << (2 * D - 2 - m))}"
        for m in range(2 * D - 1)
    )
    full = f"lag(v, {2 * D - 2}) OVER w IS NOT NULL"
    d2 = den1 * den1
    return f"""
    WITH e AS (
      SELECT user_id, epoch_us(ts) AS t_us, event_id,
             CAST(floor(value * 10000.0 + 0.5) AS BIGINT) AS v
      FROM events
    ),
    s AS (
      SELECT user_id, t_us, event_id,
             CASE WHEN {full} THEN {num1} END AS n1,
             CASE WHEN {full} THEN {num2} END AS n2
      FROM e
      WINDOW w AS (PARTITION BY user_id ORDER BY t_us ASC, event_id ASC)
    )
    SELECT user_id, t_us, event_id,
           {R(f"CAST(n1 AS DOUBLE) / {float(den1)} / 10000.0", 6)} AS s1,
           {R(f"CAST(n2 AS DOUBLE) / {float(d2)} / 10000.0", 6)} AS s2,
           {R(f"CAST(3 * n1 * {den1} - 2 * n2 AS DOUBLE) / {float(d2)} / 10000.0", 6)}
             AS forecast_next
    FROM s
    """


@register("ts_holt_forecast", _holt_sql())
def _q_ts_holt_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brown's double exponential smoothing forecast
    (`ts.holt_brown_forecast`): trend-corrected one-step-ahead
    ŷ = 3S1 − 2S2 per trial, truncated to exact integer weights (the
    triangular self-convolution) so the numerators are bit-portable
    ints under 2^53 and both engines divide identically ONCE. Rows
    without the full 2D−1 history are NULL by contract. One
    trial-keyed window pass."""
    e = _events_us(spark, sf_dir)
    return ts.holt_brown_forecast(e, depth=_HOLT_D)


# ---------------------------------------------------------------------------
# r7 wave 39: sketch accuracy report
# ---------------------------------------------------------------------------

_QERR_K = 32
_QERR_QS = (0.5, 0.9)


@register(
    "sketch_quantile_error_report",
    f"""
    WITH ev AS (
      SELECT event_type, event_id, value FROM events WHERE value IS NOT NULL
    ),
    h AS (
      SELECT event_type AS g, {sp.sql_hash_u32("event_id", "tsdt|qsk")} AS u,
             CAST(value AS DOUBLE) AS v
      FROM ev
    ),
    regs AS (
      SELECT g, u, v FROM h
      QUALIFY row_number() OVER (PARTITION BY g ORDER BY u ASC, v ASC) <= {_QERR_K}
    ),
    ranked AS (
      SELECT g, v,
             row_number() OVER (PARTITION BY g ORDER BY v ASC, u ASC) AS vr,
             count(*) OVER (PARTITION BY g) AS n_kept
      FROM regs
    ),
    qs AS (SELECT unnest([{", ".join(f"CAST({q} AS DOUBLE)" for q in _QERR_QS)}]) AS q),
    est AS (
      SELECT g AS event_type, q, n_kept, v AS sketch_q
      FROM ranked CROSS JOIN qs
      WHERE vr = greatest(1, CAST(ceil(q * CAST(n_kept AS DOUBLE)) AS BIGINT))
    ),
    ex AS (
      SELECT event_type, count(*) AS n_total,
             {", ".join(f"{R(f'quantile_cont(value, {q})', 6)} AS x{i}" for i, q in enumerate(_QERR_QS))}
      FROM ev GROUP BY event_type
    ),
    exl AS (
      {" UNION ALL ".join(
        f"SELECT event_type, n_total, CAST({q} AS DOUBLE) AS q, x{i} AS exact_q FROM ex"
        for i, q in enumerate(_QERR_QS))}
    )
    SELECT e.event_type, e.q, x.n_total, CAST(e.n_kept AS BIGINT) AS n_kept,
           x.exact_q, e.sketch_q,
           {R("abs(e.sketch_q - x.exact_q)", 6)} AS abs_err
    FROM est e JOIN exl x ON x.event_type = e.event_type AND x.q = e.q
    """,
)
def _q_sketch_quantile_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The sketch family's HONEST-ERROR row: per channel and q ∈
    {_QERR_QS}, the {_QERR_K}-register bottom-k quantile estimate next
    to the EXACT interpolated percentile and their absolute gap — the
    measured answer to "what accuracy do 32 registers actually buy",
    the same discipline as the recall curves for every approximate
    blocking structure. Registers, estimator (nearest-rank on the
    (v, u) total order) and exact percentile are all deterministic, so
    even the ERROR is oracle-exact. One scan + bounded register
    windows + one 5-row exact agg."""
    ev = _events(spark, sf_dir).filter(F.col("value").isNotNull())
    regs = sk.quantile_sketch_registers(
        ev, group_col="event_type", value_col="value", id_col="event_id",
        k=_QERR_K,
    )
    est = sk.quantile_sketch_estimate(regs, qs=list(_QERR_QS)).select(
        F.col("g").alias("event_type"),
        "q",
        F.col("n_kept").cast("long").alias("n_kept"),
        F.col("q_est").alias("sketch_q"),
    )
    exact = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_total"),
        *[
            rd(F.percentile(F.col("value"), F.lit(float(q))), 6).alias(
                f"__x{i}"
            )
            for i, q in enumerate(_QERR_QS)
        ],
    )
    exl = None
    for i, q in enumerate(_QERR_QS):
        part = exact.select(
            "event_type",
            "n_total",
            F.lit(float(q)).alias("q"),
            F.col(f"__x{i}").alias("exact_q"),
        )
        exl = part if exl is None else exl.unionByName(part)
    return est.join(F.broadcast(exl), ["event_type", "q"]).select(
        "event_type",
        "q",
        "n_total",
        "n_kept",
        "exact_q",
        "sketch_q",
        rd(F.abs(F.col("sketch_q") - F.col("exact_q")), 6).alias("abs_err"),
    )


# ---------------------------------------------------------------------------
# r7 wave 40: chi2 residual drill-down + exponential inter-arrival fit
# ---------------------------------------------------------------------------


@register(
    "stats_chi2_residuals",
    f"""
    WITH o AS (
      SELECT event_type, (epoch_us(ts) // 3600000000) % 24 AS hod,
             count(*) AS obs
      FROM events GROUP BY 1, 2
    ),
    rt AS (SELECT event_type, sum(obs) AS rtot FROM o GROUP BY event_type),
    ct AS (SELECT hod, sum(obs) AS ctot FROM o GROUP BY hod),
    g AS (SELECT sum(obs) AS total FROM o),
    grid AS (
      SELECT rt.event_type, ct.hod, rt.rtot, ct.ctot FROM rt CROSS JOIN ct
    ),
    cells AS (
      SELECT gr.event_type, gr.hod, COALESCE(o.obs, 0) AS obs,
             CAST(gr.rtot AS DOUBLE) * gr.ctot / g.total AS expected
      FROM grid gr
      LEFT JOIN o ON o.event_type = gr.event_type AND o.hod = gr.hod
      CROSS JOIN g
    )
    SELECT event_type, CAST(hod AS INT) AS hod, CAST(obs AS BIGINT) AS obs,
           {R("expected", 6)} AS expected,
           {R("(obs - expected) / sqrt(expected)", 6)} AS std_residual,
           CAST(CASE WHEN abs({R("(obs - expected) / sqrt(expected)", 6)}) > 3.0
                THEN 1 ELSE 0 END AS INTEGER) AS flag
    FROM cells
    """,
)
def _q_stats_chi2_residuals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The chi-square test's DRILL-DOWN: per (event_type, hour) cell,
    the standardized Pearson residual (O−E)/√E — `stats_chi2_type_vs_
    hour` says THAT type and hour associate; this says WHICH cells
    drive it (|residual| > 3 flags), the readout an on-call engineer
    actually acts on. Same margin-grid contingency construction (zero
    cells included — their residual −√E is exactly the missing-type
    signal, r9 fix) and exact-integer margins as the parent test (the two share the
    engine-identical expected expression), one IEEE division + sqrt
    per cell, |types|·24 rows at any scale."""
    ev = _events(spark, sf_dir).select(
        "event_type",
        (
            F.expr("unix_micros(cast(ts as timestamp)) div 3600000000") % 24
        ).alias("hod"),
    )
    o = ev.groupBy("event_type", "hod").agg(F.count(F.lit(1)).alias("obs"))
    rt = o.groupBy("event_type").agg(F.sum("obs").alias("rtot"))
    ct = o.groupBy("hod").agg(F.sum("obs").alias("ctot"))
    g = o.agg(F.sum("obs").alias("total"))
    grid = rt.select(
        "event_type",
        "rtot",
        F.explode(F.sequence(F.lit(0).cast("long"), F.lit(23).cast("long"))).alias(
            "hod"
        ),
    ).join(F.broadcast(ct), "hod")
    cells = (
        grid.join(o.hint("shuffle_hash"), ["event_type", "hod"], "left")
        .crossJoin(F.broadcast(g))
        .select(
            "event_type",
            "hod",
            F.coalesce(F.col("obs"), F.lit(0)).alias("obs"),
            (
                F.col("rtot").cast("double") * F.col("ctot") / F.col("total")
            ).alias("__e"),
        )
    )
    resid = rd(
        (F.col("obs") - F.col("__e")) / F.sqrt(F.col("__e")), 6
    )
    return cells.select(
        "event_type",
        F.col("hod").cast("int").alias("hod"),
        F.col("obs").cast("long").alias("obs"),
        rd(F.col("__e"), 6).alias("expected"),
        resid.alias("std_residual"),
        F.when(F.abs(resid) > 3.0, 1).otherwise(0).cast("int").alias("flag"),
    )


@register(
    "stats_interarrival_expfit",
    f"""
    WITH e AS (
      SELECT event_type, epoch_us(ts) AS t, event_id FROM events
    ),
    d AS (
      SELECT event_type, t - lag(t) OVER w AS dt, event_id
      FROM e WINDOW w AS (PARTITION BY event_type ORDER BY t ASC, event_id ASC)
    ),
    dd_ AS (SELECT event_type, dt, event_id FROM d WHERE dt IS NOT NULL),
    st AS (
      SELECT event_type, count(*) AS n, sum(dt) AS sdt FROM dd_ GROUP BY 1
    ),
    r AS (
      SELECT dd_.event_type, dt, n, sdt,
             row_number() OVER (PARTITION BY dd_.event_type
                                ORDER BY dt ASC, event_id ASC) AS i
      FROM dd_ JOIN st USING (event_type)
    ),
    k AS (
      SELECT event_type, n, sdt,
             max({R("CAST(i AS DOUBLE) / CAST(n AS DOUBLE)"
                    " - (1.0 - exp(-(CAST(dt AS DOUBLE) * CAST(n AS DOUBLE) / CAST(sdt AS DOUBLE))))", 6)})
               AS dplus,
             max({R("(1.0 - exp(-(CAST(dt AS DOUBLE) * CAST(n AS DOUBLE) / CAST(sdt AS DOUBLE))))"
                    " - CAST(i - 1 AS DOUBLE) / CAST(n AS DOUBLE)", 6)})
               AS dminus
      FROM r GROUP BY 1, 2, 3
    )
    SELECT event_type, CAST(n AS BIGINT) AS n,
           {R("CAST(sdt AS DOUBLE) / CAST(n AS DOUBLE) / 1000000.0", 6)}
             AS mean_dt_s,
           greatest(dplus, dminus) AS ks_stat,
           {R("1.358 / sqrt(CAST(n AS DOUBLE))", 6)} AS c_alpha_05,
           CAST(CASE WHEN greatest(dplus, dminus)
                     > {R("1.358 / sqrt(CAST(n AS DOUBLE))", 6)}
                THEN 1 ELSE 0 END AS INTEGER) AS reject_exponential
    FROM k
    """,
)
def _q_stats_interarrival_expfit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Is each channel's arrival process POISSON? One-sample KS
    goodness-of-fit of the inter-arrival deltas against
    Exponential(1/mean): D = max(D⁺, D⁻) over the fitted CDF
    1 − e^(−dt·n/Σdt), with the fitted rate an EXACT integer ratio so
    both engines exponentiate the identical double (per-term 6-dp
    rounding before the max, the ln/log2 discipline). A channel that
    rejects exponential arrivals has bursts or scheduling — the
    modeling assumption behind Poisson-based capacity planning and the
    gap detector's median heuristic, now tested instead of assumed.
    Two keyed windows (lag, rank) on one event_type exchange; tie
    order can't move the max (within a dt tie, the extreme index
    dominates both D⁺ and D⁻)."""
    ev = _events_us(spark, sf_dir)
    w = Window.partitionBy("event_type").orderBy(
        F.col("t_us").asc(), F.col("event_id").asc()
    )
    d = ev.select(
        "event_type",
        (F.col("t_us") - F.lag("t_us", 1).over(w)).alias("__dt"),
        "event_id",
    ).filter(F.col("__dt").isNotNull())
    st = d.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("__n"), F.sum("__dt").alias("__sdt")
    )
    wr = Window.partitionBy("event_type").orderBy(
        F.col("__dt").asc(), F.col("event_id").asc()
    )
    r = d.join(F.broadcast(st), "event_type").select(
        "event_type",
        "__dt",
        "__n",
        "__sdt",
        F.row_number().over(wr).alias("__i"),
    )
    fmodel = F.lit(1.0) - F.exp(
        -(
            F.col("__dt").cast("double")
            * F.col("__n").cast("double")
            / F.col("__sdt").cast("double")
        )
    )
    k = r.groupBy("event_type", "__n", "__sdt").agg(
        F.max(
            rd(F.col("__i").cast("double") / F.col("__n").cast("double") - fmodel, 6)
        ).alias("__dplus"),
        F.max(
            rd(
                fmodel
                - (F.col("__i") - 1).cast("double") / F.col("__n").cast("double"),
                6,
            )
        ).alias("__dminus"),
    )
    ks = F.greatest(F.col("__dplus"), F.col("__dminus"))
    c05 = rd(F.lit(1.358) / F.sqrt(F.col("__n").cast("double")), 6)
    return k.select(
        "event_type",
        F.col("__n").cast("long").alias("n"),
        rd(
            F.col("__sdt").cast("double")
            / F.col("__n").cast("double")
            / F.lit(1e6),
            6,
        ).alias("mean_dt_s"),
        ks.alias("ks_stat"),
        c05.alias("c_alpha_05"),
        F.when(ks > c05, 1).otherwise(0).cast("int").alias("reject_exponential"),
    )


# ---------------------------------------------------------------------------
# r7 wave 41: hysteresis burst segments
# ---------------------------------------------------------------------------


@register(
    "ts_burst_segments",
    f"""
    WITH e AS (
      SELECT event_type, epoch_us(ts) AS t, event_id FROM events
    ),
    d AS (
      SELECT event_type, t, event_id, t - lag(t) OVER w AS gap
      FROM e WINDOW w AS (PARTITION BY event_type ORDER BY t ASC, event_id ASC)
    ),
    st AS (
      SELECT event_type, count(gap) AS n, sum(CAST(gap AS HUGEINT)) AS sg
      FROM d GROUP BY 1
    ),
    m AS (
      SELECT d.event_type, d.t, d.event_id, d.gap,
             CASE WHEN d.gap IS NULL THEN 0
                  WHEN CAST(d.gap AS HUGEINT) * st.n * 3 < st.sg THEN 1
                  WHEN CAST(d.gap AS HUGEINT) * st.n > st.sg THEN 0
             END AS marker
      FROM d JOIN st USING (event_type)
    ),
    f AS (
      SELECT *, COALESCE(last_value(marker IGNORE NULLS)
               OVER (PARTITION BY event_type ORDER BY t ASC, event_id ASC
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0)
             AS inb
      FROM m
    ),
    c AS (
      SELECT *, CASE WHEN COALESCE(lag(inb) OVER (PARTITION BY event_type
                          ORDER BY t ASC, event_id ASC), 0) <> inb
                     THEN 1 ELSE 0 END AS chg
      FROM f
    ),
    s AS (
      SELECT *, sum(chg) OVER (PARTITION BY event_type
                               ORDER BY t ASC, event_id ASC
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND CURRENT ROW) AS seg
      FROM c
    )
    SELECT event_type, min(t) AS start_us, max(t) AS end_us,
           CAST(count(*) AS BIGINT) AS n_events,
           {R("CAST(sum(CAST(gap AS HUGEINT)) AS DOUBLE) / count(*) / 1000000.0", 6)}
             AS mean_gap_s
    FROM s WHERE inb = 1
    GROUP BY event_type, seg
    """,
)
def _q_ts_burst_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hysteresis burst detector (`ts.burst_segments`): contiguous
    faster-than-norm arrival runs per channel — enter below mean/3,
    exit above the mean, so borderline gaps can't flicker segments.
    The WHERE answer to `stats_interarrival_expfit`'s THAT (non-
    Poisson arrivals). The 1-bit state machine is re-expressed as an
    IGNORE-NULLS forward-fill of threshold CROSSINGS (no fold, no
    per-key arrays — one trial-keyed Exchange carries lag, fill and
    island numbering); thresholds compare exact integers
    (gap·n·3 < Σgap in decimal/HUGEINT), so membership is
    bit-portable."""
    e = _events_us(spark, sf_dir)
    return ts.burst_segments(e)


# ---------------------------------------------------------------------------
# r7 wave 42: TextRank chunk centrality
# ---------------------------------------------------------------------------

_CENT_C = 12  # chunk tokens, no overlap
_CENT_D = 0.85


def _cent_iter_sql(prev: str, out_c: str, out_pr: str) -> str:
    return f"""{out_c} AS (
      SELECT t.doc_id, t.i AS cid,
             CAST(sum(CAST({R("t.t * p.pr", 9)} AS DECIMAL(38,9))) AS DOUBLE) AS c
      FROM trans t JOIN {prev} p ON p.doc_id = t.doc_id AND p.cid = t.j
      GROUP BY 1, 2
    ),
    {out_pr} AS (
      SELECT p.doc_id, p.cid,
             {R(f"(1.0 - {_CENT_D}) / p.ns + {_CENT_D} * COALESCE(c.c, 0.0)", 9)} AS pr,
             p.ns
      FROM {prev} p
      LEFT JOIN {out_c} c ON c.doc_id = p.doc_id AND c.cid = p.cid
    )"""


@register(
    "text_chunk_centrality",
    f"""
    WITH base AS (
      SELECT doc_id,
             list_filter(string_split(trim(text), ' '), x -> length(x) > 0) AS ts
      FROM documents WHERE text IS NOT NULL
    ),
    sized AS (SELECT doc_id, ts, len(ts) AS n FROM base WHERE len(ts) > 0),
    ex AS (
      SELECT doc_id, ts, n,
             CAST(unnest(generate_series(0,
               CASE WHEN n <= {_CENT_C} THEN 0
                    ELSE CAST(ceil((n - {_CENT_C}) / {float(_CENT_C)}) AS INT) END)) AS INT)
               AS cid
      FROM sized
    ),
    chtok AS (
      SELECT doc_id, cid,
             unnest(list_distinct(
               list_slice(ts, cid * {_CENT_C} + 1, cid * {_CENT_C} + {_CENT_C})))
               AS tok
      FROM ex
    ),
    sizes AS (SELECT doc_id, cid, count(*) AS sz FROM chtok GROUP BY 1, 2),
    ov AS (
      SELECT a.doc_id, a.cid AS i, b.cid AS j, count(*) AS ov
      FROM chtok a
      JOIN chtok b ON a.doc_id = b.doc_id AND a.tok = b.tok AND a.cid <> b.cid
      GROUP BY 1, 2, 3
    ),
    edges AS (
      SELECT ov.doc_id, i, j,
             {R("CAST(ov AS DOUBLE) / CAST(si.sz + sj.sz AS DOUBLE)", 9)} AS w
      FROM ov
      JOIN sizes si ON si.doc_id = ov.doc_id AND si.cid = ov.i
      JOIN sizes sj ON sj.doc_id = ov.doc_id AND sj.cid = ov.j
    ),
    wsum AS (
      SELECT doc_id, j,
             CAST(sum(CAST(w AS DECIMAL(38,9))) AS DOUBLE) AS ws
      FROM edges GROUP BY 1, 2
    ),
    trans AS (
      SELECT e.doc_id, e.i, e.j, e.w / s.ws AS t
      FROM edges e JOIN wsum s ON s.doc_id = e.doc_id AND s.j = e.j
    ),
    nper AS (SELECT doc_id, count(*) AS ns FROM ex GROUP BY 1),
    pr0 AS (
      SELECT e.doc_id, e.cid, 1.0 / np.ns AS pr, np.ns
      FROM ex e JOIN nper np USING (doc_id)
    ),
    {_cent_iter_sql("pr0", "c1", "pr1")},
    {_cent_iter_sql("pr1", "c2", "pr2")}
    SELECT doc_id, CAST(cid AS INT) AS top_chunk_id,
           CAST(ns AS BIGINT) AS n_chunks, {R("pr", 6)} AS centrality
    FROM pr2
    QUALIFY row_number() OVER (PARTITION BY doc_id
                               ORDER BY pr DESC, cid ASC) = 1
    """,
)
def _q_text_chunk_centrality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TextRank chunk centrality (`tx.chunk_centrality`, Mihalcea &
    Tarau 2004 over 12-token windows): each document's most
    REPRESENTATIVE chunk by two exact weighted-PageRank iterations
    over the within-doc chunk-overlap graph — the budget-truncation
    primitive that beats lead-bias truncation. Weights are exact
    integer ratios, every float sum 9-dp decimal-accumulated, the
    recurrence unrolled verbatim in the oracle (the pagerank
    precedent); pair volume is bounded per doc by its own chunk
    count."""
    docs = _table(spark, sf_dir, "documents")
    return tx.chunk_centrality(docs, chunk_tokens=_CENT_C, damping=_CENT_D)


# ---------------------------------------------------------------------------
# r7 wave 43: lexical complexity + cross-source duplication matrix
# ---------------------------------------------------------------------------


@register(
    "text_lexical_complexity_by_source",
    f"""
    WITH toks AS (
      SELECT source, t.tok
      FROM documents,
           unnest(list_filter(string_split(trim(lower(text)), ' '),
                              x -> length(x) > 0)) AS t(tok)
      WHERE text IS NOT NULL
    ),
    m AS (
      SELECT source, count(*) AS n_words,
             sum(length(tok)) AS n_chars,
             sum(len(regexp_extract_all(tok, '[aeiou]+'))) AS n_syll,
             sum(CASE WHEN length(tok) >= 7 THEN 1 ELSE 0 END) AS n_long,
             sum(CASE WHEN len(regexp_extract_all(tok, '[aeiou]+')) <= 1
                 THEN 1 ELSE 0 END) AS n_mono
      FROM toks GROUP BY source
    )
    SELECT source, CAST(n_words AS BIGINT) AS n_words,
           {R("CAST(n_chars AS DOUBLE) / n_words", 6)} AS mean_word_len,
           {R("CAST(n_syll AS DOUBLE) / n_words", 6)} AS mean_syllables,
           {R("CAST(n_long AS DOUBLE) / n_words", 6)} AS pct_long_words,
           {R("CAST(n_mono AS DOUBLE) / n_words", 6)} AS pct_monosyllabic
    FROM m
    """,
)
def _q_text_lexical_complexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source LEXICAL COMPLEXITY profile: mean word length,
    vowel-group syllable estimate, long-word and monosyllabic
    fractions — the readability-class quality signals (the exact
    integer counts under Flesch/Coleman-Liau style scores, reported
    raw rather than through a sentence-dependent formula this corpus
    can't support). Complexity outliers flag OCR junk and boilerplate
    the C4 string rules miss. One token explode + one map-side-
    combined agg; every ratio is an exact-integer division."""
    docs = _table(spark, sf_dir, "documents")
    toks = docs.filter(F.col("text").isNotNull()).select(
        "source",
        F.explode(
            F.filter(
                F.split(F.trim(F.lower(F.col("text"))), " "),
                lambda x: F.length(x) > 0,
            )
        ).alias("__tok"),
    )
    syll = F.size(F.expr("regexp_extract_all(__tok, '[aeiou]+', 0)"))
    m = toks.groupBy("source").agg(
        F.count(F.lit(1)).alias("__nw"),
        F.sum(F.length("__tok")).alias("__nc"),
        F.sum(syll).alias("__ns"),
        F.sum(F.when(F.length("__tok") >= 7, 1).otherwise(0)).alias("__nl"),
        F.sum(F.when(syll <= 1, 1).otherwise(0)).alias("__nm"),
    )
    nw = F.col("__nw").cast("double")
    return m.select(
        "source",
        F.col("__nw").cast("long").alias("n_words"),
        rd(F.col("__nc").cast("double") / nw, 6).alias("mean_word_len"),
        rd(F.col("__ns").cast("double") / nw, 6).alias("mean_syllables"),
        rd(F.col("__nl").cast("double") / nw, 6).alias("pct_long_words"),
        rd(F.col("__nm").cast("double") / nw, 6).alias("pct_monosyllabic"),
    )


@register(
    "dedup_cross_source_matrix",
    """
    WITH d AS (
      SELECT md5(array_to_string(list_slice(
               list_filter(string_split(trim(lower(text)), ' '),
                           x -> length(x) > 0), 1, 16), ' ')) AS dig,
             source
      FROM documents WHERE text IS NOT NULL
    ),
    ds AS (SELECT DISTINCT dig, source FROM d),
    cnt AS (SELECT dig, source, count(*) AS n FROM d GROUP BY 1, 2),
    pairs AS (
      SELECT a.dig, a.source AS source_a, b.source AS source_b,
             ca.n AS n_a, cb.n AS n_b
      FROM ds a
      JOIN ds b ON a.dig = b.dig AND a.source < b.source
      JOIN cnt ca ON ca.dig = a.dig AND ca.source = a.source
      JOIN cnt cb ON cb.dig = b.dig AND cb.source = b.source
    )
    SELECT source_a, source_b,
           CAST(count(*) AS BIGINT) AS n_shared_digests,
           CAST(sum(n_a + n_b) AS BIGINT) AS n_docs_involved
    FROM pairs GROUP BY source_a, source_b
    """,
)
def _q_dedup_cross_source_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WHO COPIES WHOM: the source×source shared-OPENER matrix — for
    each source pair, how many distinct 16-token normalized prefixes
    they share and how many documents carry them. Shared openers are
    the boilerplate/syndication provenance signal (full-content dup
    matrices stay empty until corpora literally mirror each other;
    prefix sharing surfaces the template reuse that precedes it), and
    the heavy-hitter pairs say which sources to cross-dedup FIRST —
    the provenance-graph complement of `dedup_impact_by_source`.
    Digests shuffle, never text; the within-digest pair explode is
    bounded by a digest's source multiplicity (≤ |sources|), so the
    join is output-proportional at any corpus size."""
    docs = _table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    prefix = F.concat_ws(
        " ",
        F.slice(
            F.filter(
                F.split(F.trim(F.lower(F.col("text"))), " "),
                lambda x: F.length(x) > 0,
            ),
            1,
            16,
        ),
    )
    d = docs.select(F.md5(prefix).alias("__dig"), "source")
    ds = d.distinct()
    cnt = d.groupBy("__dig", "source").agg(F.count(F.lit(1)).alias("__n"))
    a = ds.select(F.col("__dig"), F.col("source").alias("source_a"))
    b = ds.select(F.col("__dig"), F.col("source").alias("source_b"))
    ca = cnt.select(
        F.col("__dig"), F.col("source").alias("source_a"), F.col("__n").alias("__na")
    )
    cb = cnt.select(
        F.col("__dig"), F.col("source").alias("source_b"), F.col("__n").alias("__nb")
    )
    pairs = (
        a.join(b.hint("shuffle_hash"), "__dig")
        .filter(F.col("source_a") < F.col("source_b"))
        .join(ca.hint("shuffle_hash"), ["__dig", "source_a"])
        .join(cb.hint("shuffle_hash"), ["__dig", "source_b"])
    )
    return pairs.groupBy("source_a", "source_b").agg(
        F.count(F.lit(1)).cast("long").alias("n_shared_digests"),
        F.sum(F.col("__na") + F.col("__nb")).cast("long").alias("n_docs_involved"),
    )


# ---------------------------------------------------------------------------
# r8 wave 1: BPE tokenizer APPLICATION (the missing half of the r7
# trainer, VERDICT r7 #4) — encode the corpus with the learned merges,
# then run the packing pipeline on REAL token counts instead of the
# chars/4 estimate.
# ---------------------------------------------------------------------------

_BPE_PAIR_TOKS = (
    "list_filter(string_split(trim(s, '|'), '||'), x -> length(x) > 0)"
)


@register(
    "text_bpe_encode_counts",
    _bpe_cte(_BPE_ROUNDS)
    + f""",
    enc AS (
      SELECT doc_id,
             CAST(len({_BPE_PAIR_TOKS}) AS BIGINT) AS n_tokens_bpe
      FROM s{_BPE_ROUNDS}
    )
    SELECT t0.doc_id,
           CAST(len(t0.toks) AS BIGINT) AS n_tokens_raw,
           enc.n_tokens_bpe,
           CAST(len(t0.toks) AS BIGINT) - enc.n_tokens_bpe AS n_merged
    FROM t0 JOIN enc ON enc.doc_id = t0.doc_id
    """,
)
def _q_text_bpe_encode_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer APPLICATION (`tx.bpe_encode`): train the 5-round merge
    table (`tx.bpe_train_merges`, the r7 trainer's driver-side form),
    then ENCODE every document with it — the trainer's
    leftmost-non-overlapping `_merge_fold` applied per merge in
    training order, merge table shipped as literals (no join, no
    shuffle, no Python; one scan-side codegen pass, expression depth
    bounded by `checkpoint_every` for production-size tables). Output:
    per-doc raw vs encoded token counts and the merge applications
    (raw − encoded: each application shortens the doc by exactly one
    token). The oracle replays training AND encoding through the same
    delimiter-guarded CTE chain (`_bpe_cte`) the trainer oracle uses."""
    docs = _table(spark, sf_dir, "documents")
    merges = tx.bpe_train_merges(docs, rounds=_BPE_ROUNDS)
    enc = tx.bpe_encode(docs, merges)
    return enc.select(
        "doc_id",
        "n_tokens_raw",
        F.size("bpe_tokens").cast("long").alias("n_tokens_bpe"),
        (F.col("n_tokens_raw") - F.size("bpe_tokens").cast("long")).alias(
            "n_merged"
        ),
    )


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
    counts = tx.bpe_encode(docs, merges).select(
        "doc_id", F.size("bpe_tokens").cast("long").alias("n_tokens")
    )
    return sp.sequence_pack_offsets(
        counts, seq_len=512, n_tokens_col="n_tokens"
    )


# ---------------------------------------------------------------------------
# r8 wave 2: the dedup report family's shared LSH+CC prefix amortized
# (VERDICT r7 #5) — one labeling, every report section.
# ---------------------------------------------------------------------------

def _suite_unpivot_sql() -> str:
    """UNION ALL block normalizing the four report sections to
    (section, k, metric, value) rows; integer metrics only, so DOUBLE
    carries them exactly in both engines."""
    branches = []
    for m in ("n_clusters", "n_docs", "min_size", "max_size"):
        branches.append(
            f"SELECT 'histogram' AS section, CAST(bucket AS VARCHAR) AS k,"
            f" '{m}' AS metric, CAST({m} AS DOUBLE) AS value FROM hb"
        )
    for m in (
        "n_docs", "n_tokens", "n_docs_exact", "n_tokens_exact",
        "n_docs_near", "n_tokens_near",
    ):
        branches.append(
            f"SELECT 'impact', source, '{m}', CAST({m} AS DOUBLE) FROM imp"
        )
    for m in ("n_docs_kept", "n_tokens_kept"):
        branches.append(
            f"SELECT 'budget', source, '{m}', CAST({m} AS DOUBLE) FROM bsum"
        )
    for m in (
        "n_docs", "n_tokens", "n_sequences", "split_docs", "fragments",
        "tail_pad_tokens",
    ):
        branches.append(
            f"SELECT 'pack', '_all', '{m}', CAST({m} AS DOUBLE) FROM pk"
        )
    return "\n    UNION ALL\n    ".join(branches)


@register(
    "dedup_report_suite",
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
    sz AS (SELECT cluster_id, count(*) AS size FROM cl GROUP BY cluster_id),
    hb AS (
      SELECT CAST(length(bin(size)) - 1 AS BIGINT) AS bucket,
             count(*) AS n_clusters, sum(size) AS n_docs,
             min(size) AS min_size, max(size) AS max_size
      FROM sz GROUP BY 1
    ),
    tok AS (
      SELECT doc_id, source, CAST({_SQL_NTOK} AS BIGINT) AS t, {_SQL_H} AS h
      FROM documents
    ),
    ex AS (SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)),
    base AS (
      SELECT source, count(*) AS n_docs, sum(t) AS n_tokens
      FROM tok GROUP BY source
    ),
    e AS (
      SELECT source, count(*) AS n_docs_exact, sum(t) AS n_tokens_exact
      FROM tok JOIN ex USING (doc_id) GROUP BY source
    ),
    nr AS (
      SELECT source, count(*) AS n_docs_near, sum(t) AS n_tokens_near
      FROM tok JOIN cl ON cl.doc_id = tok.doc_id AND cl.doc_id = cl.cluster_id
      GROUP BY source
    ),
    imp AS (
      SELECT b.source,
             b.n_docs, b.n_tokens,
             coalesce(e.n_docs_exact, 0) AS n_docs_exact,
             coalesce(e.n_tokens_exact, 0) AS n_tokens_exact,
             coalesce(nr.n_docs_near, 0) AS n_docs_near,
             coalesce(nr.n_tokens_near, 0) AS n_tokens_near
      FROM base b LEFT JOIN e USING (source) LEFT JOIN nr USING (source)
    ),
    budg AS (
      SELECT tok.doc_id, tok.source, tok.t AS n_tokens, tok.h,
             CAST(sum(tok.t) OVER (PARTITION BY tok.source
                  ORDER BY tok.h, tok.doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS cum_tokens
      FROM tok JOIN cl ON cl.doc_id = tok.doc_id AND cl.doc_id = cl.cluster_id
    ),
    kept AS (SELECT * FROM budg WHERE cum_tokens <= {_MIX_BUDGET}),
    bsum AS (
      SELECT source, count(*) AS n_docs_kept, sum(n_tokens) AS n_tokens_kept
      FROM kept GROUP BY source
    ),
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
    pk AS (
      SELECT CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
             CAST((sum(n_tokens) + 511) // 512 AS BIGINT) AS n_sequences,
             CAST(sum(CASE WHEN first_seq < last_seq THEN 1 ELSE 0 END)
                  AS BIGINT) AS split_docs,
             CAST(sum(last_seq - first_seq + 1) AS BIGINT) AS fragments,
             CAST(((sum(n_tokens) + 511) // 512) * 512 - sum(n_tokens)
                  AS BIGINT) AS tail_pad_tokens
      FROM o
    )
    {_suite_unpivot_sql()}
    """,
)
def _q_dedup_report_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EVERY DEDUP REPORT, ONE LABELING (`dd.dedup_components`): the
    cluster-size histogram, the per-source impact accounting, the
    post-dedup budget summary, and the dedup→budget→pack audit — four
    report sections that each independently recomputed the identical
    LSH-candidate graph + connected components when run as standalone
    queries (the 4 most expensive entries in the r7 bench, ~33 s
    combined). Here the CC labeling is computed ONCE (materialized by
    the CC loop's own localCheckpoint) and every section reads it;
    output is normalized (section, k, metric, value) rows with
    integer-valued metrics so DOUBLE carries them exactly. The
    standalone queries stay registered — each section remains
    independently oracle-checked — while this suite is the form a
    corpus owner (and the bench) actually runs."""
    docs = _table(spark, sf_dir, "documents")
    comp = dd.dedup_components(docs)

    def unpivot(frame, section, k_expr, metrics):
        stack = ", ".join(
            f"'{m}', CAST({m} AS DOUBLE)" for m in metrics
        )
        return frame.withColumn("__k", k_expr).selectExpr(
            f"'{section}' AS section",
            "__k AS k",
            f"stack({len(metrics)}, {stack}) AS (metric, value)",
        )

    # §1 cluster-size histogram (log2 buckets)
    sz = comp.groupBy("cluster_id").agg(F.count(F.lit(1)).alias("size"))
    hb = (
        sz.select(
            F.expr("CAST(length(bin(size)) - 1 AS BIGINT)").alias("bucket"),
            "size",
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_clusters"),
            F.sum("size").cast("long").alias("n_docs"),
            F.min("size").cast("long").alias("min_size"),
            F.max("size").cast("long").alias("max_size"),
        )
    )
    hist = unpivot(
        hb, "histogram", F.col("bucket").cast("string"),
        ["n_clusters", "n_docs", "min_size", "max_size"],
    )

    # §2 per-source impact (raw / exact / near)
    tok = docs.select(
        "doc_id", "source",
        tx.token_count(F.col("text")).cast("long").alias("__t"),
    )
    base = tok.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("__t").alias("n_tokens")
    )
    keep_exact = dd.exact_dedup_groups(docs).select(
        F.col("keep_id").alias("doc_id")
    )
    e = (
        tok.join(keep_exact.hint("shuffle_hash"), "doc_id", "left_semi")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs_exact"),
            F.sum("__t").alias("n_tokens_exact"),
        )
    )
    keep_near = comp.filter(F.col("doc_id") == F.col("cluster_id")).select(
        "doc_id"
    )
    nr = (
        tok.join(keep_near.hint("shuffle_hash"), "doc_id", "left_semi")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs_near"),
            F.sum("__t").alias("n_tokens_near"),
        )
    )
    imp = (
        base.join(e.hint("shuffle_hash"), "source", "left")
        .join(nr.hint("shuffle_hash"), "source", "left")
        .select(
            "source",
            F.col("n_docs").cast("long").alias("n_docs"),
            F.col("n_tokens").cast("long").alias("n_tokens"),
            F.coalesce(F.col("n_docs_exact"), F.lit(0)).cast("long").alias("n_docs_exact"),
            F.coalesce(F.col("n_tokens_exact"), F.lit(0)).cast("long").alias("n_tokens_exact"),
            F.coalesce(F.col("n_docs_near"), F.lit(0)).cast("long").alias("n_docs_near"),
            F.coalesce(F.col("n_tokens_near"), F.lit(0)).cast("long").alias("n_tokens_near"),
        )
    )
    impact = unpivot(
        imp, "impact", F.col("source"),
        ["n_docs", "n_tokens", "n_docs_exact", "n_tokens_exact",
         "n_docs_near", "n_tokens_near"],
    )

    # §3 post-dedup budget summary (survivors only)
    surv = docs.join(keep_near.hint("shuffle_hash"), "doc_id", "left_semi")
    budgeted = sp.token_budget_per_stratum(surv, _MIX_BUDGET)
    bsum = budgeted.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs_kept"),
        F.sum("n_tokens").cast("long").alias("n_tokens_kept"),
    )
    budget = unpivot(
        bsum, "budget", F.col("source"), ["n_docs_kept", "n_tokens_kept"]
    )

    # §4 pack audit over the budgeted corpus
    final_docs = docs.join(
        budgeted.select("doc_id").hint("shuffle_hash"), "doc_id", "left_semi"
    )
    packed = sp.sequence_pack_offsets(final_docs, seq_len=512)
    audit = _pack_efficiency_agg(packed)
    pack = unpivot(
        audit, "pack", F.lit("_all"),
        ["n_docs", "n_tokens", "n_sequences", "split_docs", "fragments",
         "tail_pad_tokens"],
    )

    return hist.unionByName(impact).unionByName(budget).unionByName(pack)


# ---------------------------------------------------------------------------
# r8 wave 3: sketch-backed quantile transform (VERDICT r7 #7) — the
# corpus-wide variant of `feature_quantile_transform`, whose exact
# rank windows scale with rows-per-group.
# ---------------------------------------------------------------------------

_QTX_K, _QTX_SEED = 256, "tsdt|qtx"
_QTX_QS = [round(0.1 * i, 1) for i in range(1, 10)]


@register(
    "feature_quantile_transform_sketched",
    f"""
    WITH e AS (
      SELECT event_id, event_type,
             CAST(floor(value * 10000.0 + 0.5) AS BIGINT) AS sv
      FROM events WHERE value IS NOT NULL
    ),
    h AS (
      SELECT event_type AS g, {sp.sql_hash_u32("event_id", _QTX_SEED)} AS u,
             CAST(sv AS DOUBLE) AS v
      FROM e
    ),
    regs AS (
      SELECT g, u, v FROM h
      QUALIFY row_number() OVER (PARTITION BY g ORDER BY u ASC, v ASC) <= {_QTX_K}
    ),
    ranked AS (
      SELECT g, v,
             row_number() OVER (PARTITION BY g ORDER BY v ASC, u ASC) AS vr,
             count(*) OVER (PARTITION BY g) AS n_kept
      FROM regs
    ),
    qs AS (
      SELECT unnest([{", ".join(f"CAST({q} AS DOUBLE)" for q in _QTX_QS)}]) AS q
    ),
    bnd AS (
      SELECT g, q, v AS b
      FROM ranked CROSS JOIN qs
      WHERE vr = greatest(1, CAST(ceil(q * CAST(n_kept AS DOUBLE)) AS BIGINT))
    )
    SELECT e.event_id, e.event_type,
           CAST(sum(CASE WHEN CAST(e.sv AS DOUBLE) > bnd.b
                         THEN 1 ELSE 0 END) AS INTEGER) AS q_bucket
    FROM e JOIN bnd ON bnd.g = e.event_type
    GROUP BY e.event_id, e.event_type
    """,
)
def _q_feature_quantile_transform_sketched(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """SKETCH-BACKED quantile transform — the 100 TB form of
    `feature_quantile_transform`: instead of tie-averaged rank windows
    over EVERY row of every group (two full-width sort exchanges whose
    per-partition sort cost grows with rows-per-group), derive per-group
    DECILE boundaries from the mergeable bottom-k-by-md5 quantile
    sketch (k=256 registers per group, the `sketch_quantile_value_by_
    user` machinery), broadcast the ≤ 9·|groups| boundary rows, and
    assign each row its decile bucket SCAN-SIDE (an `F.aggregate` fold
    over the 9 sorted boundaries — no per-row rank, no full-width
    window). Values are the same 1e4-scaled integers as the exact
    form, so boundary comparisons are exact in both engines; the
    oracle replays registers → nearest-rank boundaries → the same
    strictly-greater bucket rule. Registered alongside the exact form:
    per-trial/per-category scales exact, corpus-wide scales this."""
    ev = (
        _events(spark, sf_dir)
        .filter(F.col("value").isNotNull())
        .select(
            "event_id",
            "event_type",
            F.floor(F.col("value") * 10000.0 + 0.5).cast("long").alias("sv"),
        )
    )
    regs = sk.quantile_sketch_registers(
        ev, "event_type", "sv", "event_id", k=_QTX_K, seed=_QTX_SEED
    )
    est = sk.quantile_sketch_estimate(regs, _QTX_QS, group_col="g")
    bnd = est.groupBy("g").agg(
        F.sort_array(
            F.collect_list(F.struct(F.col("q"), F.col("q_est")))
        ).alias("__bs")
    )
    out = ev.join(F.broadcast(bnd), ev["event_type"] == bnd["g"])
    bucket = F.aggregate(
        F.col("__bs"),
        F.lit(0),
        lambda acc, b: acc
        + F.when(F.col("sv").cast("double") > b["q_est"], 1).otherwise(0),
    )
    return out.select(
        "event_id", "event_type", bucket.cast("int").alias("q_bucket")
    )


# ---------------------------------------------------------------------------
# r8 wave 4: Mann-Whitney U rank-sum drift test — the nonparametric
# location-shift companion to the KS/PSI/W1/chi2 drift family.
# ---------------------------------------------------------------------------


@register(
    "stats_mannwhitney_halves_by_type",
    f"""
    WITH ev AS (
      SELECT event_type, epoch_us(ts) AS us,
             CAST(floor(value * 10000.0 + 0.5) AS BIGINT) AS sv
      FROM events WHERE value IS NOT NULL
    ),
    rng AS (SELECT min(us) AS u0, max(us) AS u1 FROM ev),
    f AS (
      SELECT event_type, sv,
             CASE WHEN us <= (u0 + u1) // 2 THEN 1 ELSE 0 END AS isa
      FROM ev CROSS JOIN rng
    ),
    r AS (
      SELECT event_type, sv, isa,
             2 * rank() OVER (PARTITION BY event_type ORDER BY sv)
               + count(*) OVER (PARTITION BY event_type, sv) - 1 AS r2
      FROM f
    ),
    g AS (
      SELECT event_type,
             sum(isa) AS n_a, sum(1 - isa) AS n_b,
             sum(CASE WHEN isa = 1 THEN CAST(r2 AS DECIMAL(38,0))
                      ELSE CAST(0 AS DECIMAL(38,0)) END) AS r2a
      FROM r GROUP BY event_type
    ),
    t AS (
      SELECT event_type,
             sum(CAST(c AS DECIMAL(38,0)) * c * c - c) AS t3t
      FROM (SELECT event_type, sv, count(*) AS c FROM f GROUP BY 1, 2)
      GROUP BY 1
    ),
    m AS (
      SELECT g.event_type,
             CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
             CAST(r2a - CAST(n_a AS DECIMAL(38,0)) * (n_a + 1) AS BIGINT)
               AS u2,
             CAST(t3t AS DOUBLE) AS t3t,
             CAST(n_a + n_b AS BIGINT) AS n
      FROM g JOIN t ON t.event_type = g.event_type
      WHERE n_a > 0 AND n_b > 0
    )
    SELECT event_type, n_a, n_b, u2,
           {R("CAST(u2 AS DOUBLE) / (2.0 * CAST(n_a AS DOUBLE)"
              " * CAST(n_b AS DOUBLE))", 6)} AS cles,
           CASE WHEN CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) / 12.0
                     * ((CAST(n AS DOUBLE) + 1.0)
                        - t3t / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)))
                     > 0.0
                THEN {R("(CAST(u2 AS DOUBLE) - CAST(n_a AS DOUBLE)"
                        " * CAST(n_b AS DOUBLE))"
                        " / (2.0 * sqrt(CAST(n_a AS DOUBLE)"
                        " * CAST(n_b AS DOUBLE) / 12.0"
                        " * ((CAST(n AS DOUBLE) + 1.0)"
                        " - t3t / (CAST(n AS DOUBLE)"
                        " * (CAST(n AS DOUBLE) - 1.0)))))", 6)}
           END AS z
    FROM m
    """,
)
def _q_stats_mannwhitney_halves(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MANN-WHITNEY U rank-sum drift test (first time-half vs second,
    per event type) — the nonparametric LOCATION-SHIFT member of the
    drift family: KS sees any CDF gap, PSI/W1 see binned/transport
    distance, chi2 sees categorical dependence; the rank-sum z says
    specifically whether later values run HIGHER or LOWER, robust to
    outliers and any monotone transform. Exactness discipline: doubled
    tie-averaged ranks (the Spearman precedent — half-integer ranks
    become integers), so U2 = 2·U is an exact BIGINT; the tie
    correction Σ(t³−t) accumulates in DECIMAL(38,0); the only floats
    are the final CLES (= U/(n_a·n_b), the probability a later value
    exceeds an earlier one) and the tie-corrected z, each one literal
    IEEE expression 6-dp-rounded identically in both engines (zero-
    variance groups emit NULL z by the same CASE guard). One
    event_type-keyed exchange: rank window + tie counts + group sums
    all share it."""
    evs = _events(spark, sf_dir).filter(F.col("value").isNotNull())
    ev = evs.select(
        "event_type",
        event_micros(evs).alias("__us"),
        F.floor(F.col("value") * 10000.0 + 0.5).cast("long").alias("sv"),
    )
    rng = ev.agg(
        F.min("__us").alias("__u0"), F.max("__us").alias("__u1")
    )
    f = ev.crossJoin(F.broadcast(rng)).select(
        "event_type",
        "sv",
        F.when(
            F.col("__us")
            <= F.floor((F.col("__u0") + F.col("__u1")) / F.lit(2)).cast("long"),
            1,
        )
        .otherwise(0)
        .alias("isa"),
    )
    wp = Window.partitionBy("event_type")
    r2 = (
        2 * F.rank().over(wp.orderBy("sv"))
        + F.count(F.lit(1)).over(Window.partitionBy("event_type", "sv"))
        - 1
    )
    r = f.select("event_type", "sv", "isa", r2.cast("long").alias("__r2"))
    g = r.groupBy("event_type").agg(
        F.sum("isa").alias("n_a"),
        F.sum(F.lit(1) - F.col("isa")).alias("n_b"),
        F.sum(
            F.when(
                F.col("isa") == 1, F.col("__r2").cast("decimal(38,0)")
            ).otherwise(F.lit(0).cast("decimal(38,0)"))
        ).alias("__r2a"),
    )
    ties = (
        f.groupBy("event_type", "sv")
        .agg(F.count(F.lit(1)).alias("__c"))
        .groupBy("event_type")
        .agg(
            F.sum(
                F.col("__c").cast("decimal(38,0)") * F.col("__c") * F.col("__c")
                - F.col("__c")
            ).alias("__t3t")
        )
    )
    m = (
        g.join(ties.hint("shuffle_hash"), "event_type")
        .filter((F.col("n_a") > 0) & (F.col("n_b") > 0))
        .select(
            "event_type",
            F.col("n_a").cast("long").alias("n_a"),
            F.col("n_b").cast("long").alias("n_b"),
            (
                F.col("__r2a")
                - F.col("n_a").cast("decimal(38,0)") * (F.col("n_a") + 1)
            )
            .cast("long")
            .alias("u2"),
            F.col("__t3t").cast("double").alias("__t3t"),
            (F.col("n_a") + F.col("n_b")).cast("long").alias("__n"),
        )
    )
    na, nb = F.col("n_a").cast("double"), F.col("n_b").cast("double")
    n = F.col("__n").cast("double")
    var = na * nb / 12.0 * ((n + 1.0) - F.col("__t3t") / (n * (n - 1.0)))
    z = (F.col("u2").cast("double") - na * nb) / (2.0 * F.sqrt(var))
    return m.select(
        "event_type", "n_a", "n_b", "u2",
        rd(F.col("u2").cast("double") / (2.0 * na * nb), 6).alias("cles"),
        F.when(var > 0.0, rd(z, 6)).alias("z"),
    )


# ---------------------------------------------------------------------------
# r8 wave 5: packing-length operating points + tokenizer fertility —
# the layout and tokenizer-eval tables a training run is planned from.
# ---------------------------------------------------------------------------

_PACK_LENS = (256, 512, 1024)


@register(
    "mix_pack_len_sweep",
    f"""
    WITH toks AS (
      SELECT doc_id,
             CAST({_SQL_NTOK} AS BIGINT) AS n_tokens,
             {_SQL_H} AS h
      FROM documents
    ),
    c AS (
      SELECT doc_id, n_tokens,
             CAST(sum(n_tokens) OVER (ORDER BY h, doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS tok_end
      FROM toks
    ),
    ls AS (SELECT unnest([{", ".join(str(L) for L in _PACK_LENS)}]) AS seq_len),
    o AS (
      SELECT seq_len, n_tokens,
             CAST(floor((tok_end - n_tokens) / CAST(seq_len AS DOUBLE))
                  AS BIGINT) AS first_seq,
             CAST(floor((tok_end - 1) / CAST(seq_len AS DOUBLE))
                  AS BIGINT) AS last_seq
      FROM c CROSS JOIN ls WHERE n_tokens > 0
    ),
    a AS (
      SELECT seq_len,
             count(*) AS n_docs,
             sum(n_tokens) AS n_tokens,
             sum(CASE WHEN first_seq < last_seq THEN 1 ELSE 0 END) AS split_docs,
             sum(last_seq - first_seq + 1) AS fragments
      FROM o GROUP BY seq_len
    )
    SELECT CAST(seq_len AS INTEGER) AS seq_len,
           CAST(n_docs AS BIGINT) AS n_docs,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST((n_tokens + seq_len - 1) // seq_len AS BIGINT) AS n_sequences,
           CAST(split_docs AS BIGINT) AS split_docs,
           {R("CAST(split_docs AS DOUBLE) / n_docs", 6)} AS split_frac,
           CAST(fragments AS BIGINT) AS fragments,
           {R("CAST(fragments AS DOUBLE)"
              " / ((n_tokens + seq_len - 1) // seq_len)", 6)} AS docs_per_seq,
           CAST(((n_tokens + seq_len - 1) // seq_len) * seq_len - n_tokens
                AS BIGINT) AS tail_pad_tokens,
           {R("CAST(n_tokens AS DOUBLE)"
              " / (((n_tokens + seq_len - 1) // seq_len) * seq_len)", 6)}
             AS utilization
    FROM a
    """,
)
def _q_mix_pack_len_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SEQUENCE-LENGTH OPERATING POINTS from ONE corpus scan: the
    packing-efficiency audit (`mix_pack_efficiency_report`) at 256 /
    512 / 1024 tokens simultaneously. The global concat order and the
    prefix-sum intervals [tok_start, tok_end) do not depend on
    seq_len — only the chop does — so the sweep computes the prefix
    sum ONCE and derives every length's split/fragment/utilization
    numbers by integer floor-division of the SAME intervals (a 3-way
    explode of narrow (n_tokens, tok_end) longs, then one 3-group
    agg). The table a training run picks its context length from:
    longer sequences cross fewer chop boundaries (fewer split
    documents) but pack more documents per sequence — the
    attention-masking/fragmentation cost — and strand more tail
    padding."""
    docs = _table(spark, sf_dir, "documents")
    packed = sp.sequence_pack_offsets(docs, seq_len=512).select(
        "n_tokens", "tok_start", "tok_end"
    )
    o = packed.select(
        "n_tokens",
        "tok_start",
        "tok_end",
        F.explode(
            F.array(*[F.lit(int(L)) for L in _PACK_LENS])
        ).alias("seq_len"),
    ).select(
        "seq_len",
        "n_tokens",
        F.floor(
            F.col("tok_start") / F.col("seq_len").cast("double")
        ).cast("long").alias("__fs"),
        F.floor(
            (F.col("tok_end") - 1) / F.col("seq_len").cast("double")
        ).cast("long").alias("__ls"),
    )
    a = o.groupBy("seq_len").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("n_tokens"),
        F.sum(
            F.when(F.col("__fs") < F.col("__ls"), 1).otherwise(0)
        ).alias("split_docs"),
        F.sum(F.col("__ls") - F.col("__fs") + 1).alias("fragments"),
    )
    nseq = F.expr("(n_tokens + seq_len - 1) DIV seq_len")
    return a.select(
        F.col("seq_len").cast("int").alias("seq_len"),
        F.col("n_docs").cast("long").alias("n_docs"),
        F.col("n_tokens").cast("long").alias("n_tokens"),
        nseq.cast("long").alias("n_sequences"),
        F.col("split_docs").cast("long").alias("split_docs"),
        rd(F.col("split_docs").cast("double") / F.col("n_docs"), 6).alias(
            "split_frac"
        ),
        F.col("fragments").cast("long").alias("fragments"),
        rd(F.col("fragments").cast("double") / nseq, 6).alias("docs_per_seq"),
        (nseq * F.col("seq_len") - F.col("n_tokens"))
        .cast("long")
        .alias("tail_pad_tokens"),
        rd(
            F.col("n_tokens").cast("double") / (nseq * F.col("seq_len")), 6
        ).alias("utilization"),
    )


@register(
    "text_bpe_fertility_by_lang",
    _bpe_cte(_BPE_ROUNDS)
    + f""",
    enc AS (
      SELECT doc_id,
             CAST(len({_BPE_PAIR_TOKS}) AS BIGINT) AS n_bpe
      FROM s{_BPE_ROUNDS}
    ),
    j AS (
      SELECT d.lang, CAST(len(t0.toks) AS BIGINT) AS n_words, enc.n_bpe
      FROM t0 JOIN enc ON enc.doc_id = t0.doc_id
      JOIN documents d ON d.doc_id = t0.doc_id
    )
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_words) AS BIGINT) AS n_words,
           CAST(sum(n_bpe) AS BIGINT) AS n_bpe_tokens,
           {R("CAST(sum(n_bpe) AS DOUBLE) / sum(n_words)", 6)} AS fertility,
           {R("CAST(sum(n_words) - sum(n_bpe) AS DOUBLE)"
              " / sum(n_words)", 6)} AS merge_rate
    FROM j WHERE n_words > 0 GROUP BY lang
    """,
)
def _q_text_bpe_fertility_by_lang(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TOKENIZER FERTILITY by language — the eval table a tokenizer
    ships with (how many tokens the encoder spends per word, per
    language slice): train the 5-round merge table on the WHOLE corpus
    (one tokenizer, like production), `bpe_encode` every document, and
    report per-lang fertility = bpe_tokens/words (1.0 = no merges
    apply — the tokenizer underserves that language, the
    multilingual-equity number) and merge_rate = fraction of words
    absorbed into merges. Same train+encode machinery as
    `text_bpe_encode_counts` (oracle replays it through `_bpe_cte`),
    plus one lang-keyed aggregation."""
    docs = _table(spark, sf_dir, "documents")
    merges = tx.bpe_train_merges(docs, rounds=_BPE_ROUNDS)
    enc = tx.bpe_encode(docs, merges)
    j = enc.join(
        docs.select("doc_id", "lang").hint("shuffle_hash"), "doc_id"
    ).filter(F.col("n_tokens_raw") > 0)
    return j.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_tokens_raw").cast("long").alias("n_words"),
        F.sum(F.size("bpe_tokens").cast("long")).cast("long").alias(
            "n_bpe_tokens"
        ),
        rd(
            F.sum(F.size("bpe_tokens").cast("long")).cast("double")
            / F.sum("n_tokens_raw"),
            6,
        ).alias("fertility"),
        rd(
            (
                F.sum("n_tokens_raw")
                - F.sum(F.size("bpe_tokens").cast("long"))
            ).cast("double")
            / F.sum("n_tokens_raw"),
            6,
        ).alias("merge_rate"),
    )


# ---------------------------------------------------------------------------
# r8 wave 6: k-core peel bound (graph) + l-diversity audit (privacy)
# ---------------------------------------------------------------------------

_KCORE_KS, _KCORE_ROUNDS = (2, 3, 4), 3


def _kcore_oracle_sql(rounds: int = _KCORE_ROUNDS) -> str:
    """Canon co-occurrence edges (the triangle-count fragment) + an
    unrolled peel per (k, round): degree → keep(deg>=k) → re-filter
    edges, ``rounds`` rounds, then per-k survivor counts unioned.
    Shared by `graph_kcore_bound` (3 rounds — the screen) and
    `graph_kcore_exact` (16 rounds = the Spark loop's cap: past the
    fixpoint each peel round is the identity, so a fixed unroll at
    the cap replays any converged run exactly)."""
    head = f"""d AS (
      SELECT DISTINCT user_id, event_type,
             epoch_us(ts) // {_TRI_BLK_US} AS blk
      FROM events
    ),
    capped AS (
      SELECT user_id, event_type, blk
      FROM (
        SELECT *, row_number() OVER (
                 PARTITION BY event_type, blk ORDER BY user_id
               ) AS rn
        FROM d
      ) WHERE rn <= {_TRI_CAP}
    ),
    canon AS MATERIALIZED (
      SELECT DISTINCT x.user_id AS a, y.user_id AS b
      FROM capped x JOIN capped y
        ON x.event_type = y.event_type AND x.blk = y.blk
       AND x.user_id < y.user_id
    )"""
    parts = [head]
    for k in _KCORE_KS:
        prev = "canon"
        for r in range(1, rounds + 1):
            parts.append(f"""dg{k}_{r} AS (
      SELECT v, count(*) AS deg FROM (
        SELECT a AS v FROM {prev} UNION ALL SELECT b AS v FROM {prev}
      ) GROUP BY v
    ),
    kp{k}_{r} AS (SELECT v FROM dg{k}_{r} WHERE deg >= {k}),
    e{k}_{r} AS MATERIALIZED (
      SELECT e.a, e.b FROM {prev} e
      JOIN kp{k}_{r} x ON x.v = e.a
      JOIN kp{k}_{r} y ON y.v = e.b
    )""")
            prev = f"e{k}_{r}"
    finals = "\n    UNION ALL\n    ".join(
        f"""SELECT CAST({k} AS INTEGER) AS k,
           (SELECT count(*) FROM (SELECT DISTINCT v FROM (
              SELECT a AS v FROM e{k}_{rounds}
              UNION ALL SELECT b AS v FROM e{k}_{rounds})))
             AS n_vertices,
           (SELECT count(*) FROM e{k}_{rounds}) AS n_edges"""
        for k in _KCORE_KS
    )
    return "WITH " + ",\n    ".join(parts) + "\n    " + finals


@register("graph_kcore_bound", _kcore_oracle_sql())
def _q_graph_kcore_bound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-CORE survivor bound over the user co-occurrence graph
    (`graph.kcore_bound`, k ∈ {2,3,4}, 3 peel rounds): the dense-core
    audit that separates organic co-engagement from bot rings — a
    vertex survives the k-peel only if k of its peers ALSO keep k
    peers after the fringe is stripped. Same bounded co-occurrence
    edges as `graph_triangle_count_cooc` (distinct-collapsed,
    per-block sorted-neighborhood cap), then per (k, round): one
    vertex-keyed degree agg + two semi joins of long pairs — fixed
    3×3 round grid, oracle unrolled verbatim. Fixed rounds converge
    from above (survivors ⊇ true k-core); the bound tightens one
    fringe layer per round."""
    from time_series_data_trimmer_spark.operators import graph as _gr

    ev = _events(spark, sf_dir)
    d = ev.select(
        "user_id",
        "event_type",
        F.expr(f"unix_micros(cast(ts as timestamp)) div {_TRI_BLK_US}").alias(
            "blk"
        ),
    ).distinct()
    wcap = Window.partitionBy("event_type", "blk").orderBy("user_id")
    capped = (
        d.withColumn("rn", F.row_number().over(wcap))
        .filter(F.col("rn") <= _TRI_CAP)
        .drop("rn")
    )
    rhs = capped.select(F.col("user_id").alias("ub"), "event_type", "blk")
    edges = (
        capped.join(rhs.hint("shuffle_hash"), ["event_type", "blk"])
        .filter(F.col("user_id") < F.col("ub"))
        .select(F.col("user_id").alias("src"), F.col("ub").alias("dst"))
    )
    return _gr.kcore_bound(edges, ks=_KCORE_KS, rounds=_KCORE_ROUNDS)


@register(
    "privacy_l_diversity_audit",
    """
    WITH q AS (
      SELECT event_type, (epoch_us(ts) // 3600000000) % 24 AS hod, user_id
      FROM events
    ),
    g AS (
      SELECT event_type, hod,
             count(*) AS k, count(DISTINCT user_id) AS l
      FROM q GROUP BY 1, 2
    ),
    classed AS (
      SELECT CASE WHEN l = 1 THEN 'l=1 attribute-disclosed'
                  WHEN l < 5 THEN 'l=2-4'
                  WHEN l < 20 THEN 'l=5-19'
                  ELSE 'l>=20' END AS risk_class,
             k, l
      FROM g
    )
    SELECT risk_class,
           CAST(count(*) AS BIGINT) AS n_groups,
           CAST(sum(k) AS BIGINT) AS n_events,
           CAST(min(l) AS BIGINT) AS min_l,
           CAST(max(l) AS BIGINT) AS max_l,
           CAST(min(k) AS BIGINT) AS min_k
    FROM classed GROUP BY risk_class
    """,
)
def _q_privacy_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-DIVERSITY audit (Machanavajjhala et al. 2007 — the
    k-anonymity complement): per quasi-identifier class (event_type ×
    hour-of-day), how many DISTINCT sensitive values (user_id) it
    contains. A class can be k-anonymous with large k and still leak
    everything if every row belongs to ONE user (l=1): k-anonymity
    hides WHICH row is yours, l-diversity hides WHAT the class says
    about you. Exact distinct counts via two-phase partial aggregation
    over three narrow columns; integer hour bucketing
    ((epoch_us // 3.6e9) % 24, the chi2-drift convention) so classes
    reproduce in any engine; output is the bounded 4-row risk
    rollup."""
    ev = _events(spark, sf_dir)
    g = (
        ev.select(
            "event_type",
            F.expr("pmod(unix_micros(cast(ts as timestamp)) div 3600000000, 24)").alias(
                "hod"
            ),
            "user_id",
        )
        .groupBy("event_type", "hod")
        .agg(
            F.count(F.lit(1)).alias("k"),
            F.countDistinct("user_id").alias("l"),
        )
    )
    risk = (
        F.when(F.col("l") == 1, "l=1 attribute-disclosed")
        .when(F.col("l") < 5, "l=2-4")
        .when(F.col("l") < 20, "l=5-19")
        .otherwise("l>=20")
    )
    return (
        g.select(risk.alias("risk_class"), "k", "l")
        .groupBy("risk_class")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_groups"),
            F.sum("k").cast("long").alias("n_events"),
            F.min("l").cast("long").alias("min_l"),
            F.max("l").cast("long").alias("max_l"),
            F.min("k").cast("long").alias("min_k"),
        )
    )


# ---------------------------------------------------------------------------
# r8 wave 7: chunk-level BM25 retrieval — the RAG-shaped query: rank
# CHUNKS, return each document's best chunk.
# ---------------------------------------------------------------------------

_CHUNK_RET_TERMS = ("spark", "window", "join")
_CHUNK_RET_K = 10
_CHUNK_T, _CHUNK_OV = 32, 8  # chunk_documents defaults; stride = 24


@register(
    "retrieval_chunk_topk",
    f"""
    WITH t0 AS (
      SELECT doc_id,
             list_filter(string_split(trim(text), ' '),
                         x -> length(x) > 0) AS toks
      FROM documents WHERE text IS NOT NULL
    ),
    b AS (
      SELECT doc_id, toks, len(toks) AS n,
             CASE WHEN len(toks) <= {_CHUNK_T} THEN 1
                  ELSE CAST(ceil((len(toks) - {_CHUNK_T})
                                 / {float(_CHUNK_T - _CHUNK_OV)}) AS INTEGER) + 1
             END AS nc
      FROM t0 WHERE len(toks) > 0
    ),
    ch AS (
      SELECT doc_id, CAST(c.c AS INTEGER) AS chunk_id,
             list_slice(toks, c.c * {_CHUNK_T - _CHUNK_OV} + 1,
                        c.c * {_CHUNK_T - _CHUNK_OV} + {_CHUNK_T}) AS piece,
             least({_CHUNK_T}, n - c.c * {_CHUNK_T - _CHUNK_OV}) AS dl
      FROM b, LATERAL (SELECT unnest(range(0, nc)) AS c) c
    ),
    ctoks AS (
      SELECT doc_id, chunk_id, t.token
      FROM ch, LATERAL (SELECT unnest(piece) AS token) t
      WHERE length(t.token) > 0
    ),
    stats AS (
      SELECT count(*) AS n_chunks,
             CAST(sum(dl) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avgdl
      FROM ch
    ),
    tf AS (
      SELECT doc_id, chunk_id, token, count(*) AS tf
      FROM ctoks
      WHERE token IN ({", ".join(repr(t) for t in _CHUNK_RET_TERMS)})
      GROUP BY 1, 2, 3
    ),
    cfreq AS (SELECT token, count(*) AS cf FROM tf GROUP BY token),
    scored AS (
      SELECT t.doc_id, t.chunk_id,
             CAST({sql_rd(
                 "((CAST(s.n_chunks AS DOUBLE) - CAST(d.cf AS DOUBLE) + 0.5)"
                 " / (CAST(d.cf AS DOUBLE) + 0.5))"
                 " * (CAST(t.tf AS DOUBLE) * 2.2)"
                 " / (CAST(t.tf AS DOUBLE)"
                 "    + 1.2 * (0.25 + 0.75 * CAST(c.dl AS DOUBLE) / s.avgdl))",
                 9,
             )} AS DECIMAL(38,9)) AS s
      FROM tf t
      JOIN cfreq d ON d.token = t.token
      JOIN ch c ON c.doc_id = t.doc_id AND c.chunk_id = t.chunk_id
      CROSS JOIN stats s
    ),
    per_chunk AS (
      SELECT doc_id, chunk_id,
             count(*) AS n_terms_matched, sum(s) AS s
      FROM scored GROUP BY 1, 2
    ),
    best AS (
      SELECT * FROM per_chunk
      QUALIFY row_number() OVER (
        PARTITION BY doc_id ORDER BY s DESC, chunk_id ASC) = 1
    )
    SELECT doc_id, chunk_id AS best_chunk_id,
           CAST(n_terms_matched AS BIGINT) AS n_terms_matched,
           {R("CAST(s AS DOUBLE)", 6)} AS score
    FROM best
    ORDER BY s DESC, doc_id ASC
    LIMIT {_CHUNK_RET_K}
    """,
)
def _q_retrieval_chunk_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CHUNK-level BM25 retrieval — the RAG-shaped query: score every
    32-token chunk (`tx.chunk_documents`, overlap 8) against the query
    bag, keep each DOCUMENT's best chunk (dedup-by-doc, the step that
    stops one long document flooding the context window), return the
    global top-10. BM25 follows `tx.bm25_topk`'s portability rules
    (un-logged idf ratio, 9-dp decimal term sums) with chunk-corpus
    statistics (N = chunks, avgdl over chunk lengths — chunk dl comes
    free from the chunker, no re-count). Plan: chunking is scan-side
    (sequence + slice fan-out, no shuffle), the query-term isin lands
    on the exploded-token scan, tf/cf move only (chunk, query-term)
    rows, best-chunk is one doc-keyed window over matched chunks only,
    top-10 is TakeOrdered. Oracle replays chunking (list_slice stride
    arithmetic), scoring, and both ranks verbatim."""
    docs = _table(spark, sf_dir, "documents")
    ch = tx.chunk_documents(
        docs, chunk_tokens=_CHUNK_T, overlap=_CHUNK_OV
    )
    toks = ch.select(
        "doc_id",
        "chunk_id",
        F.explode(F.split(F.col("chunk_text"), " ")).alias("token"),
    ).filter(F.length("token") > 0)
    dl = ch.select("doc_id", "chunk_id", F.col("n_tokens").alias("__dl"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("__n_chunks"),
        (
            F.sum("__dl").cast("double") / F.count(F.lit(1)).cast("double")
        ).alias("__avgdl"),
    )
    tf = (
        toks.filter(F.col("token").isin(list(_CHUNK_RET_TERMS)))
        .groupBy("doc_id", "chunk_id", "token")
        .agg(F.count(F.lit(1)).alias("__tf"))
    )
    cfreq = tf.groupBy("token").agg(F.count(F.lit(1)).alias("__cf"))
    joined = (
        tf.join(cfreq.hint("shuffle_hash"), "token")
        .join(dl.hint("shuffle_hash"), ["doc_id", "chunk_id"])
        .crossJoin(F.broadcast(stats))
    )
    idf = (
        F.col("__n_chunks").cast("double")
        - F.col("__cf").cast("double")
        + F.lit(0.5)
    ) / (F.col("__cf").cast("double") + F.lit(0.5))
    denom = F.col("__tf").cast("double") + F.lit(1.2) * (
        F.lit(0.25) + F.lit(0.75) * F.col("__dl").cast("double") / F.col("__avgdl")
    )
    term_score = idf * (F.col("__tf").cast("double") * F.lit(2.2)) / denom
    per_chunk = (
        joined.select(
            "doc_id",
            "chunk_id",
            rd(term_score, 9).cast("decimal(38,9)").alias("__s"),
        )
        .groupBy("doc_id", "chunk_id")
        .agg(
            F.count(F.lit(1)).alias("n_terms_matched"),
            F.sum("__s").alias("__s"),
        )
    )
    wbest = Window.partitionBy("doc_id").orderBy(
        F.col("__s").desc(), F.col("chunk_id").asc()
    )
    best = (
        per_chunk.withColumn("__rn", F.row_number().over(wbest))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    return (
        best.orderBy(F.col("__s").desc(), F.col("doc_id").asc())
        .limit(_CHUNK_RET_K)
        .select(
            "doc_id",
            F.col("chunk_id").alias("best_chunk_id"),
            F.col("n_terms_matched").cast("long").alias("n_terms_matched"),
            rd(F.col("__s").cast("double"), 6).alias("score"),
        )
    )


# ---------------------------------------------------------------------------
# r8 wave 8: Poisson bootstrap — the at-scale resampling primitive.
# ---------------------------------------------------------------------------

#: Poisson(1) CDF thresholds scaled to the 32-bit hash space, computed
#: ONCE in Python (PLANS.md invariant 15 — exp(-1) never evaluates at
#: query time in either engine). w = #thresholds the hash clears, cap 6.
_BOOT_B = 32
_BOOT_T = (1580030168, 3160060337, 3950075421, 4213413783, 4279248373,
           4292415291)
_BOOT_SEED = "tsdt|boot"


def _boot_w_sql(u: str) -> str:
    branches = " ".join(
        f"WHEN {u} < {t} THEN {i}" for i, t in enumerate(_BOOT_T)
    )
    return f"CASE {branches} ELSE {len(_BOOT_T)} END"


@register(
    "stats_bootstrap_mean_ci_by_type",
    f"""
    WITH ev AS (
      SELECT event_id, event_type,
             CAST(floor(value * 10000.0 + 0.5) AS BIGINT) AS sv
      FROM events WHERE value IS NOT NULL
    ),
    r AS (
      SELECT event_type, sv, b.b AS b,
             {sp.sql_hash_u32(
                 "CAST(event_id AS VARCHAR) || '#' || CAST(b.b AS VARCHAR)",
                 _BOOT_SEED,
             )} AS u
      FROM ev CROSS JOIN (SELECT unnest(range(0, {_BOOT_B})) AS b) b
    ),
    m AS (
      SELECT event_type, b,
             sum({_boot_w_sql("u")}) AS sw,
             sum(CAST({_boot_w_sql("u")} AS DECIMAL(38,0)) * sv) AS swv
      FROM r GROUP BY 1, 2
    ),
    mb AS (
      SELECT event_type, b,
             {R("CAST(swv AS DOUBLE) / (10000.0 * CAST(sw AS DOUBLE))", 6)}
               AS mean_b
      FROM m WHERE sw > 0
    ),
    f AS (
      SELECT event_type, count(*) AS n,
             {R("CAST(sum(sv) AS DOUBLE)"
                " / (10000.0 * CAST(count(*) AS DOUBLE))", 6)} AS mean
      FROM ev GROUP BY event_type
    )
    SELECT f.event_type, CAST(f.n AS BIGINT) AS n, f.mean,
           min(mb.mean_b) AS boot_lo, max(mb.mean_b) AS boot_hi,
           CAST(count(*) AS INTEGER) AS n_resamples
    FROM f JOIN mb ON mb.event_type = f.event_type
    GROUP BY f.event_type, f.n, f.mean
    """,
)
def _q_stats_bootstrap_mean_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """POISSON BOOTSTRAP mean interval per event type — the resampling
    scheme that actually scales (Chamandy et al. 2012, "Estimating
    uncertainty for massive data streams"): classic bootstrap needs N
    draws WITH replacement per resample (a global shuffle per
    replicate); Poisson bootstrap gives each row an independent
    Poisson(1) weight per replicate, so all B = 32 resamples ride ONE
    scan with a 32-way explode of narrow longs into a map-side-combined
    (type, b) aggregation. Determinism: the weight is a CASE ladder of
    the portable md5 row-replicate hash against Poisson(1) CDF
    thresholds precomputed in Python as 32-bit integer literals
    (invariant 15 — no exp() at query time in either engine); weighted
    sums accumulate in DECIMAL. Reported interval = [min, max] of the
    32 resample means (≈94% coverage for the mean at B=32); empty
    resamples (all-zero weights, P≈0.37^n) drop out identically in
    both engines via the sw > 0 guard."""
    evs = _events(spark, sf_dir).filter(F.col("value").isNotNull())
    ev = evs.select(
        "event_id",
        "event_type",
        F.floor(F.col("value") * 10000.0 + 0.5).cast("long").alias("sv"),
    )
    r = ev.select(
        "event_type",
        "sv",
        F.explode(F.sequence(F.lit(0), F.lit(_BOOT_B - 1))).alias("b"),
        "event_id",
    ).select(
        "event_type",
        "sv",
        "b",
        sp.hash_u32(
            F.concat(
                F.col("event_id").cast("string"),
                F.lit("#"),
                F.col("b").cast("string"),
            ),
            _BOOT_SEED,
        ).alias("u"),
    )
    w = F.lit(len(_BOOT_T))
    for i in range(len(_BOOT_T) - 1, -1, -1):
        w = F.when(F.col("u") < _BOOT_T[i], i).otherwise(w)
    m = r.select("event_type", "b", "sv", w.alias("__w")).groupBy(
        "event_type", "b"
    ).agg(
        F.sum("__w").alias("__sw"),
        F.sum(F.col("__w").cast("decimal(38,0)") * F.col("sv")).alias("__swv"),
    )
    mb = m.filter(F.col("__sw") > 0).select(
        "event_type",
        "b",
        rd(
            F.col("__swv").cast("double")
            / (10000.0 * F.col("__sw").cast("double")),
            6,
        ).alias("__mean_b"),
    )
    f = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        rd(
            F.sum("sv").cast("double")
            / (10000.0 * F.count(F.lit(1)).cast("double")),
            6,
        ).alias("mean"),
    )
    return (
        f.join(mb.hint("shuffle_hash"), "event_type")
        .groupBy("event_type", "n", "mean")
        .agg(
            F.min("__mean_b").alias("boot_lo"),
            F.max("__mean_b").alias("boot_hi"),
            F.count(F.lit(1)).cast("int").alias("n_resamples"),
        )
        .select(
            "event_type",
            F.col("n").cast("long").alias("n"),
            "mean",
            "boot_lo",
            "boot_hi",
            "n_resamples",
        )
    )


# ---------------------------------------------------------------------------
# r8 wave 9: BPE suite — train once, every tokenizer report.
# ---------------------------------------------------------------------------


def _bpe_suite_unpivot_sql() -> str:
    branches = [
        f"""SELECT 'merges' AS section, CAST(round AS VARCHAR) AS k,
           lhs || ' + ' || rhs AS metric, CAST(n_merges AS DOUBLE) AS value
    FROM (SELECT CAST({r} AS INTEGER) AS round, a AS lhs, b AS rhs,
                 cnt AS n_merges FROM m{r})"""
        for r in range(1, _BPE_ROUNDS + 1)
    ]
    for m in ("n_docs", "n_words", "n_bpe_tokens"):
        branches.append(
            f"SELECT 'fertility', lang, '{m}', CAST({m} AS DOUBLE) FROM fert"
        )
    branches.append(
        "SELECT 'fertility', lang, 'fertility_e6', "
        "CAST(fertility_e6 AS DOUBLE) FROM fert"
    )
    for m in (
        "n_docs", "n_tokens", "n_sequences", "split_docs", "fragments",
        "tail_pad_tokens",
    ):
        branches.append(
            f"SELECT 'pack', '_all', '{m}', CAST({m} AS DOUBLE) FROM pk"
        )
    return "\n    UNION ALL\n    ".join(branches)


@register(
    "text_bpe_suite",
    _bpe_cte(_BPE_ROUNDS)
    + f""",
    enc AS (
      SELECT doc_id,
             CAST(len({_BPE_PAIR_TOKS}) AS BIGINT) AS n_bpe
      FROM s{_BPE_ROUNDS}
    ),
    j AS (
      SELECT d.doc_id, d.lang,
             CAST(len(t0.toks) AS BIGINT) AS n_words, enc.n_bpe,
             {sp.sql_hash_u32("d.doc_id")} AS h
      FROM t0 JOIN enc ON enc.doc_id = t0.doc_id
      JOIN documents d ON d.doc_id = t0.doc_id
    ),
    fert AS (
      SELECT lang,
             count(*) AS n_docs,
             sum(n_words) AS n_words,
             sum(n_bpe) AS n_bpe_tokens,
             CAST(floor(CAST(sum(n_bpe) AS DOUBLE) * 1000000.0
                        / sum(n_words) + 0.5) AS BIGINT) AS fertility_e6
      FROM j WHERE n_words > 0 GROUP BY lang
    ),
    c AS (
      SELECT doc_id, n_bpe AS n_tokens,
             CAST(sum(n_bpe) OVER (ORDER BY h, doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS tok_end
      FROM j
    ),
    o AS (
      SELECT n_tokens, tok_end,
             CAST(floor((tok_end - n_tokens) / 512.0) AS BIGINT) AS first_seq,
             CAST(floor((tok_end - 1) / 512.0) AS BIGINT) AS last_seq
      FROM c WHERE n_tokens > 0
    ),
    pk AS (
      SELECT CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
             CAST((sum(n_tokens) + 511) // 512 AS BIGINT) AS n_sequences,
             CAST(sum(CASE WHEN first_seq < last_seq THEN 1 ELSE 0 END)
                  AS BIGINT) AS split_docs,
             CAST(sum(last_seq - first_seq + 1) AS BIGINT) AS fragments,
             CAST(((sum(n_tokens) + 511) // 512) * 512 - sum(n_tokens)
                  AS BIGINT) AS tail_pad_tokens
      FROM o
    )
    {_bpe_suite_unpivot_sql()}
    """,
)
def _q_text_bpe_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EVERY TOKENIZER REPORT, ONE TRAINING RUN (the dedup_report_suite
    pattern applied to the BPE family): the three standalone BPE
    queries each retrain the 5-round merge table (~11 s apiece at
    sf0.1) to stay independently oracle-checkable; this suite trains
    ONCE (`tx.bpe_train_merges`), encodes ONCE (`tx.bpe_encode` +
    lazy localCheckpoint so fertility AND packing read one
    materialization), and emits the merge table, the per-lang
    fertility/equity numbers, and the real-token pack audit as
    normalized (section, k, metric, value) rows. Float-free contract:
    fertility ships as floor(1e6·ratio+0.5) micro-units so every value
    is integer-exact in DOUBLE. The standalone queries stay registered;
    the suite is what a tokenizer owner actually runs."""
    docs = _table(spark, sf_dir, "documents")
    merges = tx.bpe_train_merges(docs, rounds=_BPE_ROUNDS)
    enc = tx.bpe_encode(docs, merges).localCheckpoint(eager=False)

    mrows = spark.createDataFrame(
        [
            (
                "merges",
                str(r),
                f"{lhs} + {rhs}",
                float(cnt),
            )
            for (r, lhs, rhs, cnt) in merges
        ],
        "section string, k string, metric string, value double",
    )

    j = enc.join(
        docs.select("doc_id", "lang").hint("shuffle_hash"), "doc_id"
    ).select(
        "doc_id",
        "lang",
        "n_tokens_raw",
        F.size("bpe_tokens").cast("long").alias("__nb"),
    )
    fert = (
        j.filter(F.col("n_tokens_raw") > 0)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_tokens_raw").cast("long").alias("n_words"),
            F.sum("__nb").cast("long").alias("n_bpe_tokens"),
            F.floor(
                F.sum("__nb").cast("double")
                * 1000000.0
                / F.sum("n_tokens_raw")
                + 0.5
            )
            .cast("long")
            .alias("fertility_e6"),
        )
    )
    frows = fert.withColumn("__k", F.col("lang")).selectExpr(
        "'fertility' AS section",
        "__k AS k",
        "stack(4, 'n_docs', CAST(n_docs AS DOUBLE),"
        " 'n_words', CAST(n_words AS DOUBLE),"
        " 'n_bpe_tokens', CAST(n_bpe_tokens AS DOUBLE),"
        " 'fertility_e6', CAST(fertility_e6 AS DOUBLE)) AS (metric, value)",
    )

    counts = j.select(
        "doc_id", F.col("__nb").alias("n_tokens")
    )
    packed = sp.sequence_pack_offsets(counts, seq_len=512, n_tokens_col="n_tokens")
    audit = _pack_efficiency_agg(packed)
    prows = audit.withColumn("__k", F.lit("_all")).selectExpr(
        "'pack' AS section",
        "__k AS k",
        "stack(6, 'n_docs', CAST(n_docs AS DOUBLE),"
        " 'n_tokens', CAST(n_tokens AS DOUBLE),"
        " 'n_sequences', CAST(n_sequences AS DOUBLE),"
        " 'split_docs', CAST(split_docs AS DOUBLE),"
        " 'fragments', CAST(fragments AS DOUBLE),"
        " 'tail_pad_tokens', CAST(tail_pad_tokens AS DOUBLE))"
        " AS (metric, value)",
    )
    return mrows.unionByName(frows).unionByName(prows)


# ---------------------------------------------------------------------------
# r8 wave 10: PR operating-point curve (eval) + degree assortativity
# (graph) — rounding out the two thinnest extension families.
# ---------------------------------------------------------------------------


@register(
    "eval_pr_curve_binned",
    f"""
    WITH {_HLS_VS_C4_SQL},
    b AS (
      SELECT least(CAST(floor((round(sc.logit * 1000000, 0) + 500000)
                               / 10000) AS INT), 99) AS bin,
             CASE WHEN surv.doc_id IS NOT NULL THEN 1 ELSE 0 END AS pass
      FROM sc LEFT JOIN surv ON surv.doc_id = sc.doc_id
    ),
    bins AS (
      SELECT bin, CAST(sum(pass) AS HUGEINT) AS np,
             CAST(count(*) - sum(pass) AS HUGEINT) AS nn
      FROM b GROUP BY bin
    ),
    cum AS (
      SELECT bin,
             sum(np) OVER (ORDER BY bin DESC
                           ROWS UNBOUNDED PRECEDING) AS tp,
             sum(np + nn) OVER (ORDER BY bin DESC
                                ROWS UNBOUNDED PRECEDING) AS n_pred
      FROM bins
    ),
    tot AS (SELECT sum(np) AS p FROM bins)
    SELECT CAST(cum.bin AS BIGINT) AS bin,
           CAST(n_pred AS BIGINT) AS n_pred,
           CAST(tp AS BIGINT) AS tp,
           {R("CAST(tp AS DOUBLE) / CAST(n_pred AS DOUBLE)", 6)} AS precision,
           CASE WHEN p > 0 THEN
             {R("CAST(tp AS DOUBLE) / CAST(p AS DOUBLE)", 6)}
           END AS recall
    FROM cum CROSS JOIN tot
    """,
)
def _q_eval_pr_curve_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binned PRECISION-RECALL operating-point curve of the cheap
    hashed-linear scorer vs the C4 gate — the imbalance-honest
    complement of `eval_auc_binned` (ROC AUC flatters a scorer when
    negatives dominate; precision at a threshold is what a pre-prune
    deployment actually pays). Same factored logit + label
    (`_HLS_VS_C4_SQL`) and the same 100 fixed 6-dp-grid bins, so all
    three evals (AUC, calibration, PR) can never score different
    things. One row per occupied bin read as "predict positive at
    logit ≥ this bin": cumulative-from-the-top TP and predicted
    counts. Scale shape: the descending cumulative is an `F.aggregate`
    fold over the ≤100 collected bin rows (array state, then explode)
    — zero keyless windows, zero joins after the bin agg; the oracle
    uses a plain window (no plan constraints oracle-side)."""
    docs = _table(spark, sf_dir, "documents")
    scores = tx.hashed_linear_score(docs).select("doc_id", "logit")
    surv = tx.c4_filter_survivors(docs).select(
        "doc_id", F.lit(1).alias("__pass")
    )
    j = scores.join(surv.hint("shuffle_hash"), "doc_id", "left")
    bin_col = F.least(
        F.floor(
            (F.round(F.col("logit") * 1000000, 0) + F.lit(500000))
            / F.lit(10000)
        ).cast("int"),
        F.lit(99),
    )
    bins = (
        j.select(
            bin_col.alias("__bin"),
            F.coalesce(F.col("__pass"), F.lit(0)).alias("__p"),
        )
        .groupBy("__bin")
        .agg(
            F.sum("__p").cast("decimal(38,0)").alias("__np"),
            (F.count(F.lit(1)) - F.sum("__p"))
            .cast("decimal(38,0)")
            .alias("__nn"),
        )
    )
    row = bins.agg(
        F.sort_array(
            F.collect_list(
                F.struct(F.col("__bin"), F.col("__np"), F.col("__nn"))
            ),
            asc=False,
        ).alias("__bs"),
        F.sum("__np").cast("decimal(38,0)").alias("__ptot"),
    )
    zero = F.lit(0).cast("decimal(38,0)")
    arr_t = "array<struct<bin:int,tp:decimal(38,0),n_pred:decimal(38,0)>>"
    folded = F.aggregate(
        F.col("__bs"),
        F.struct(
            zero.alias("tp"),
            zero.alias("pp"),
            F.lit(None).cast(arr_t).alias("arr"),
        ),
        lambda acc, x: F.struct(
            (acc["tp"] + x["__np"]).cast("decimal(38,0)").alias("tp"),
            (acc["pp"] + x["__np"] + x["__nn"])
            .cast("decimal(38,0)")
            .alias("pp"),
            F.concat(
                F.coalesce(acc["arr"], F.array().cast(arr_t)),
                F.array(
                    F.struct(
                        x["__bin"].alias("bin"),
                        (acc["tp"] + x["__np"])
                        .cast("decimal(38,0)")
                        .alias("tp"),
                        (acc["pp"] + x["__np"] + x["__nn"])
                        .cast("decimal(38,0)")
                        .alias("n_pred"),
                    )
                ),
            ).alias("arr"),
        ),
        lambda acc: acc["arr"],
    )
    ex = row.select(F.col("__ptot"), F.explode(folded).alias("__r"))
    return ex.select(
        F.col("__r.bin").cast("long").alias("bin"),
        F.col("__r.n_pred").cast("long").alias("n_pred"),
        F.col("__r.tp").cast("long").alias("tp"),
        rd(
            F.col("__r.tp").cast("double") / F.col("__r.n_pred").cast("double"),
            6,
        ).alias("precision"),
        F.when(
            F.col("__ptot") > 0,
            rd(
                F.col("__r.tp").cast("double") / F.col("__ptot").cast("double"),
                6,
            ),
        ).alias("recall"),
    )


@register(
    "graph_degree_assortativity",
    f"""
    WITH d AS (
      SELECT DISTINCT user_id, event_type,
             epoch_us(ts) // {_TRI_BLK_US} AS blk
      FROM events
    ),
    capped AS (
      SELECT user_id, event_type, blk
      FROM (
        SELECT *, row_number() OVER (
                 PARTITION BY event_type, blk ORDER BY user_id
               ) AS rn
        FROM d
      ) WHERE rn <= {_TRI_CAP}
    ),
    canon AS (
      SELECT DISTINCT x.user_id AS a, y.user_id AS b
      FROM capped x JOIN capped y
        ON x.event_type = y.event_type AND x.blk = y.blk
       AND x.user_id < y.user_id
    ),
    deg AS (
      SELECT v, count(*) AS dg FROM (
        SELECT a AS v FROM canon UNION ALL SELECT b AS v FROM canon
      ) GROUP BY v
    ),
    e AS (
      SELECT da.dg AS ja, db.dg AS jb
      FROM canon c
      JOIN deg da ON da.v = c.a
      JOIN deg db ON db.v = c.b
    ),
    s AS (
      SELECT CAST(2 * count(*) AS BIGINT) AS n,
             sum(CAST(ja AS DECIMAL(38,0)) + jb) AS sx,
             sum(CAST(ja AS DECIMAL(38,0)) * ja
                 + CAST(jb AS DECIMAL(38,0)) * jb) AS sxx,
             sum(CAST(2 AS DECIMAL(38,0)) * ja * jb) AS sxy
      FROM e
    )
    SELECT n AS n_directed_edges,
           (SELECT CAST(count(*) AS BIGINT) FROM deg) AS n_vertices,
           CASE WHEN CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0.0
                THEN {R("(CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)"
                        " - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))"
                        " / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)"
                        " - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))", 6)}
           END AS assortativity
    FROM s
    """,
)
def _q_graph_degree_assortativity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """DEGREE ASSORTATIVITY (Newman 2002) of the user co-occurrence
    graph: the Pearson correlation of endpoint degrees over all edges
    — organic social graphs wire assortatively (hubs befriend hubs,
    r > 0); bot rings and scraper farms wire DISassortatively (one
    controller touches many leaves, r < 0), so this single number is a
    corpus-level spam smell next to `graph_kcore_bound`'s WHERE. Each
    undirected edge contributes both orientations, so Σx = Σy and the
    correlation reduces to three integer moment sums (Σ(ja+jb),
    Σ(ja²+jb²), 2Σ(ja·jb)) accumulated in DECIMAL over the same capped
    canon edges as the triangle count; one degree aggregation + two
    vertex-keyed joins + a 1-row combine; the zero-variance
    (degree-regular) graph yields NULL by the same guard in both
    engines."""
    ev = _events(spark, sf_dir)
    d = ev.select(
        "user_id",
        "event_type",
        F.expr(f"unix_micros(cast(ts as timestamp)) div {_TRI_BLK_US}").alias(
            "blk"
        ),
    ).distinct()
    wcap = Window.partitionBy("event_type", "blk").orderBy("user_id")
    capped = (
        d.withColumn("rn", F.row_number().over(wcap))
        .filter(F.col("rn") <= _TRI_CAP)
        .drop("rn")
    )
    rhs = capped.select(F.col("user_id").alias("ub"), "event_type", "blk")
    canon = (
        capped.join(rhs.hint("shuffle_hash"), ["event_type", "blk"])
        .filter(F.col("user_id") < F.col("ub"))
        .select(F.col("user_id").alias("a"), F.col("ub").alias("b"))
        .distinct()
    )
    deg = (
        canon.select(F.col("a").alias("v"))
        .unionAll(canon.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("__dg"))
    )
    e = canon.join(
        deg.withColumnRenamed("v", "a").withColumnRenamed("__dg", "__ja").hint(
            "shuffle_hash"
        ),
        "a",
    ).join(
        deg.withColumnRenamed("v", "b").withColumnRenamed("__dg", "__jb").hint(
            "shuffle_hash"
        ),
        "b",
    )
    ja = F.col("__ja").cast("decimal(38,0)")
    jb = F.col("__jb").cast("decimal(38,0)")
    s = e.agg(
        (2 * F.count(F.lit(1))).cast("long").alias("n_directed_edges"),
        F.sum(ja + jb).alias("__sx"),
        F.sum(ja * F.col("__ja") + jb * F.col("__jb")).alias("__sxx"),
        F.sum(F.lit(2).cast("decimal(38,0)") * ja * F.col("__jb")).alias(
            "__sxy"
        ),
    )
    nv = deg.agg(F.count(F.lit(1)).cast("long").alias("n_vertices"))
    n = F.col("n_directed_edges").cast("double")
    sx = F.col("__sx").cast("double")
    sxx = F.col("__sxx").cast("double")
    sxy = F.col("__sxy").cast("double")
    denom = n * sxx - sx * sx
    return s.crossJoin(F.broadcast(nv)).select(
        "n_directed_edges",
        "n_vertices",
        F.when(denom > 0.0, rd((n * sxy - sx * sx) / denom, 6)).alias(
            "assortativity"
        ),
    )


# ---------------------------------------------------------------------------
# r8 wave 11: curriculum shard manifest — the training-ORDER handoff.
# ---------------------------------------------------------------------------

_CURR_P = (0.3333333333333333, 0.6666666666666666)  # invariant 15 literals
_CURR_SEED = "tsdt|curr"


@register(
    "mix_curriculum_shards",
    f"""
    WITH {_HLS_VS_C4_SQL},
    bd AS (
      SELECT {R(f"quantile_cont(logit, {_CURR_P[0]!r})", 6)} AS b1,
             {R(f"quantile_cont(logit, {_CURR_P[1]!r})", 6)} AS b2
      FROM sc
    ),
    toks AS (
      SELECT doc_id, CAST({_SQL_NTOK} AS BIGINT) AS n_tokens FROM documents
    ),
    assigned AS (
      SELECT CASE WHEN sc.logit <= bd.b1 THEN 'A_low'
                  WHEN sc.logit <= bd.b2 THEN 'B_mid'
                  ELSE 'C_high' END AS band,
             CAST({sp.sql_hash_u32("sc.doc_id", _CURR_SEED)} // 1073741824
                  AS INTEGER) AS shard,
             toks.n_tokens,
             CAST(round(sc.logit * 1000000, 0) AS BIGINT) AS logit_e6
      FROM sc CROSS JOIN bd
      JOIN toks ON toks.doc_id = sc.doc_id
    )
    SELECT band, shard,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
           {R("CAST(sum(logit_e6) AS DOUBLE)"
              " / (1000000.0 * CAST(count(*) AS DOUBLE))", 6)} AS mean_logit
    FROM assigned GROUP BY band, shard
    """,
)
def _q_mix_curriculum_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CURRICULUM SHARD MANIFEST — the training-ORDER handoff: band
    every document into quality terciles of the hashed-linear scorer
    logit (the SAME factored scorer the three eval queries audit, so
    the curriculum signal is the one whose calibration/AUC/PR the
    repo already measures), then split each band into 4 deterministic
    hash shards (top 2 bits). A curriculum run consumes shards in
    band order (easy → hard or the reverse); the manifest reports each
    shard's doc/token mass and mean logit so the schedule's token
    budget is known BEFORE any data moves. Portability discipline:
    tercile boundaries are exact interpolated percentiles 6-dp-rounded
    on both engines (`percentile` ≡ `quantile_cont`, the
    token_percentiles precedent) with probe literals written once in
    Python (invariant 15); band compares happen on the already-6-dp
    logit; mean logit accumulates integer 1e6 micro-units. One scan +
    a 1-row boundary broadcast + one (band, shard) aggregation."""
    docs = _table(spark, sf_dir, "documents")
    sc = tx.hashed_linear_score(docs).select("doc_id", "logit")
    bd = sc.agg(
        rd(
            F.expr(f"percentile(logit, {_CURR_P[0]!r})"), 6
        ).alias("__b1"),
        rd(
            F.expr(f"percentile(logit, {_CURR_P[1]!r})"), 6
        ).alias("__b2"),
    )
    toks = docs.select(
        "doc_id", tx.token_count(F.col("text")).cast("long").alias("__nt")
    )
    band = (
        F.when(F.col("logit") <= F.col("__b1"), "A_low")
        .when(F.col("logit") <= F.col("__b2"), "B_mid")
        .otherwise("C_high")
    )
    assigned = (
        sc.crossJoin(F.broadcast(bd))
        .join(toks.hint("shuffle_hash"), "doc_id")
        .select(
            band.alias("band"),
            F.shiftright(
                sp.hash_u32(F.col("doc_id"), _CURR_SEED), 30
            ).cast("int").alias("shard"),
            F.col("__nt").alias("n_tokens"),
            F.round(F.col("logit") * 1000000, 0).cast("long").alias(
                "__logit_e6"
            ),
        )
    )
    return assigned.groupBy("band", "shard").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("n_tokens"),
        rd(
            F.sum("__logit_e6").cast("double")
            / (1000000.0 * F.count(F.lit(1)).cast("double")),
            6,
        ).alias("mean_logit"),
    )


# ---------------------------------------------------------------------------
# r9 wave 1: merge-count-scalable tokenizer application (VERDICT r8 #2)
# — the ranked-table Arrow kernel, value-checked at TOKEN-SEQUENCE level
# (digest of the encoded sequence, not just counts) against the same
# delimiter-guarded DuckDB replay the fold encoder uses.
# ---------------------------------------------------------------------------


@register(
    "text_bpe_encode_ranked",
    _bpe_cte(_BPE_ROUNDS)
    + f""",
    enc AS (
      SELECT doc_id, {_BPE_PAIR_TOKS} AS toks
      FROM s{_BPE_ROUNDS}
    )
    SELECT t0.doc_id,
           CAST(len(t0.toks) AS BIGINT) AS n_tokens_raw,
           CAST(len(enc.toks) AS BIGINT) AS n_tokens_bpe,
           md5(array_to_string(enc.toks, ' ')) AS tok_digest
    FROM t0 JOIN enc ON enc.doc_id = t0.doc_id
    """,
)
def _q_text_bpe_encode_ranked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The merge-count-SCALABLE encoder (`tx.bpe_encode_ranked`,
    VERDICT r8 #2): train the 5-round merge table, then encode every
    document in ONE Arrow `mapInPandas` pass over the broadcast RANKED
    table — plan depth constant in |merges| (the fold encoder's depth
    is linear: one stage per rule, prohibitive at production 10^4-rule
    tables). Value check is stronger than `text_bpe_encode_counts`:
    the md5 digest of each encoded token SEQUENCE must match the
    oracle's delimiter-guarded replay token for token, proving the
    kernel reproduces `_merge_fold`'s leftmost-non-overlapping
    semantics exactly, not merely the same lengths."""
    docs = _table(spark, sf_dir, "documents")
    merges = tx.bpe_train_merges(docs, rounds=_BPE_ROUNDS)
    enc = tx.bpe_encode_ranked(docs, merges)
    return enc.select(
        "doc_id",
        "n_tokens_raw",
        F.size("bpe_tokens").cast("long").alias("n_tokens_bpe"),
        F.md5(F.concat_ws(" ", "bpe_tokens")).alias("tok_digest"),
    )


_KCORE_EXACT_CAP = 16


@register("graph_kcore_exact", _kcore_oracle_sql(_KCORE_EXACT_CAP))
def _q_graph_kcore_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT k-core over the user co-occurrence graph
    (`graph.kcore_exact`, VERDICT r8 #5): the peel LOOPS UNTIL FIXED
    POINT under the connected-components convergence contract —
    localCheckpoint per round, an edge-count probe per round (unchanged
    count certifies no vertex sits below k), and a hard
    ``max_rounds=16`` cap that raises instead of returning a loose
    bound. `graph_kcore_bound` stays the fixed-3-round screen; this is
    the authority (a chain fringe peels one layer per round, so 3
    rounds provably under-peel deep cascades — pytest-demonstrated).
    Oracle: the same unrolled peel at the CAP — past the fixpoint each
    round is the identity, so a fixed 16-round replay equals any Spark
    run that completed without raising. Same bounded canon edges as
    the bound/triangle queries; ``n_rounds`` is intentionally not part
    of the registered output (it is a Python-API observability field;
    the oracle's static unroll cannot name the convergence round)."""
    from time_series_data_trimmer_spark.operators import graph as _gr

    ev = _events(spark, sf_dir)
    d = ev.select(
        "user_id",
        "event_type",
        F.expr(f"unix_micros(cast(ts as timestamp)) div {_TRI_BLK_US}").alias(
            "blk"
        ),
    ).distinct()
    wcap = Window.partitionBy("event_type", "blk").orderBy("user_id")
    capped = (
        d.withColumn("rn", F.row_number().over(wcap))
        .filter(F.col("rn") <= _TRI_CAP)
        .drop("rn")
    )
    rhs = capped.select(F.col("user_id").alias("ub"), "event_type", "blk")
    edges = (
        capped.join(rhs.hint("shuffle_hash"), ["event_type", "blk"])
        .filter(F.col("user_id") < F.col("ub"))
        .select(F.col("user_id").alias("src"), F.col("ub").alias("dst"))
    )
    return _gr.kcore_exact(
        edges, ks=_KCORE_KS, max_rounds=_KCORE_EXACT_CAP
    ).drop("n_rounds")


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
    counts = tx.bpe_encode(docs, merges).select(
        "doc_id", F.size("bpe_tokens").cast("long").alias("__nt")
    )
    joined = (
        docs.select("doc_id", "source")
        .join(counts.hint("shuffle_hash"), "doc_id")
    )
    budgeted = sp.token_budget_per_stratum(
        joined, _MIX_BUDGET, n_tokens_col="__nt"
    ).select("doc_id", "source", "n_tokens", "cum_tokens")
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


@register(
    "stream_state_partition_report",
    """
    WITH ev AS (
      SELECT user_id, event_type,
             epoch_us(ts) // 3600000000 AS hour_bucket,
             CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
      FROM events
    ),
    classes AS (
      SELECT 'join_stream_stream' AS state_class,
             (SELECT count(*) FROM ev
              WHERE event_type IN ('click', 'purchase')) AS n_state_keys
      UNION ALL
      SELECT 'dedup_within_watermark',
             (SELECT count(*) FROM (
                SELECT DISTINCT user_id,
                       md5(coalesce(event_type, '<null>') || '|' ||
                           coalesce(CAST(cents AS VARCHAR), '<null>'))
                FROM ev))
      UNION ALL
      SELECT 'groupstate_by_user',
             (SELECT count(DISTINCT user_id) FROM ev)
      UNION ALL
      SELECT 'groupstate_by_type',
             (SELECT count(DISTINCT event_type) FROM ev)
      UNION ALL
      SELECT 'window_agg_hour_type',
             (SELECT count(*) FROM (
                SELECT DISTINCT hour_bucket, event_type FROM ev))
    )
    SELECT state_class,
           CAST(n_state_keys AS BIGINT) AS n_state_keys,
           CAST(n_state_keys * 87 AS BIGINT) AS state_bytes_est,
           CAST(greatest(4, CAST(ceil(n_state_keys / 25000.0) AS BIGINT))
                AS BIGINT) AS recommended_partitions
    FROM classes
    """,
)
def _q_stream_state_partition_report(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Invariant 18 made AUDITABLE (VERDICT r8 #4): the data-derived
    state-partition recommendation per streaming state-op CLASS,
    computed from the batch corpus the stream would ingest. Each
    class's state-size driver: the stream-stream join buffers both
    filtered sides within the watermark horizon (rows); watermarked
    dedup holds one entry per distinct (key, content digest);
    GroupState ops hold one entry per group (user / type); window aggs
    hold one row per open (window, type). Recommendation =
    max(4, ceil(keys / 25 000)) — `_auto_state_partitions`' formula
    UNCAPPED (the session-width cap is a deploy-time bound, not a data
    property); `state_bytes_est` prices capacity at the measured
    ≈87 B/key RocksDB footprint (COVERAGE.md, sf0.01 dedup
    measurement). The same numbers `state_store_metrics` reports at
    runtime, predicted from data — what a capacity planner runs BEFORE
    the stream exists; the r9 state-partition matrix (SCALING.md)
    validates the recommendation per class."""
    ev = _events(spark, sf_dir)
    cents = F.floor(F.col("value") * F.lit(100.0) + F.lit(0.5)).cast("long")
    base = ev.select(
        "user_id",
        "event_type",
        F.expr("unix_micros(cast(ts as timestamp)) div 3600000000").alias(
            "hour_bucket"
        ),
        cents.alias("cents"),
    )
    digest = F.md5(
        F.concat(
            F.coalesce(F.col("event_type"), F.lit("<null>")),
            F.lit("|"),
            F.coalesce(F.col("cents").cast("string"), F.lit("<null>")),
        )
    )
    join_keys = base.filter(
        F.col("event_type").isin("click", "purchase")
    ).agg(F.count(F.lit(1)).alias("n"))
    dedup_keys = (
        base.select("user_id", digest.alias("ck"))
        .distinct()
        .agg(F.count(F.lit(1)).alias("n"))
    )
    user_keys = base.agg(F.countDistinct("user_id").alias("n"))
    type_keys = base.agg(F.countDistinct("event_type").alias("n"))
    win_keys = (
        base.select("hour_bucket", "event_type")
        .distinct()
        .agg(F.count(F.lit(1)).alias("n"))
    )
    rows = [
        ("join_stream_stream", join_keys),
        ("dedup_within_watermark", dedup_keys),
        ("groupstate_by_user", user_keys),
        ("groupstate_by_type", type_keys),
        ("window_agg_hour_type", win_keys),
    ]
    out = None
    for name, agg in rows:
        r = agg.select(
            F.lit(name).alias("state_class"),
            F.col("n").cast("long").alias("n_state_keys"),
            (F.col("n") * F.lit(87)).cast("long").alias("state_bytes_est"),
            F.greatest(
                F.lit(4), F.ceil(F.col("n") / F.lit(25000.0)).cast("long")
            ).cast("long").alias("recommended_partitions"),
        )
        out = r if out is None else out.unionByName(r)
    return out


# ---------------------------------------------------------------------------
# r9 wave 5: the recall-curve suite — ONE exact truth, every forfeit
# curve (the dedup_report_suite / text_bpe_suite amortization pattern
# applied to the ANN blocking family).
# ---------------------------------------------------------------------------


def _suite_lsh_branch_sql(b: int) -> str:
    return f"""SELECT 'lsh_bits' AS section, CAST({b} AS INTEGER) AS k,
           CAST(sum(hit) AS BIGINT) AS n_hits,
           CAST(count(*) AS BIGINT) AS n_candidates,
           {R(f"CAST(sum(hit) AS DOUBLE) / ({_RECALL_Q} * 10.0)", 6)} AS recall_at_10
    FROM (
      SELECT CASE WHEN t.qid IS NOT NULL AND pr.rn <= 10 THEN 1 ELSE 0 END AS hit
      FROM (
        SELECT c.qid, c.vec_id,
               row_number() OVER (PARTITION BY c.qid ORDER BY c.c DESC, c.vec_id ASC) AS rn
        FROM cos c
        JOIN sigs sq ON sq.vec_id = c.qid
        JOIN sigs sv ON sv.vec_id = c.vec_id
        WHERE sq.sig % {1 << b} = sv.sig % {1 << b}
      ) pr
      LEFT JOIN truth t ON t.qid = pr.qid AND t.vec_id = pr.vec_id
    )"""


def _suite_ivf_branch_sql(np_: int) -> str:
    return f"""SELECT 'ivf_nprobe' AS section, CAST({np_} AS INTEGER) AS k,
           CAST(sum(hit) AS BIGINT) AS n_hits,
           CAST(count(*) AS BIGINT) AS n_candidates,
           {R(f"CAST(sum(hit) AS DOUBLE) / ({_RECALL_Q} * 10.0)", 6)} AS recall_at_10
    FROM (
      SELECT CASE WHEN t.qid IS NOT NULL AND pr.rn <= 10 THEN 1 ELSE 0 END AS hit
      FROM (
        SELECT c.qid, c.vec_id,
               row_number() OVER (PARTITION BY c.qid ORDER BY c.c DESC, c.vec_id ASC) AS rn
        FROM cos c
        JOIN assigned a ON a.vec_id = c.vec_id
        JOIN (
          SELECT qid, cid FROM qdist
          QUALIFY row_number() OVER (PARTITION BY qid ORDER BY d, cid) <= {np_}
        ) p ON p.qid = c.qid AND p.cid = a.cid
      ) pr
      LEFT JOIN truth t ON t.qid = pr.qid AND t.vec_id = pr.vec_id
    )"""


def _suite_mrl_branch_sql(d: int) -> str:
    return f"""SELECT 'mrl_dim' AS section, CAST({d} AS INTEGER) AS k,
           CAST(count(t.qid) AS BIGINT) AS n_hits,
           CAST(count(*) AS BIGINT) AS n_candidates,
           {R(f"CAST(count(t.qid) AS DOUBLE) / ({_RECALL_Q} * 10.0)", 6)} AS recall_at_10
    FROM (
      SELECT qid, vec_id FROM (
        SELECT qid, vec_id,
               row_number() OVER (PARTITION BY qid ORDER BY c DESC, vec_id ASC) AS rn
        FROM mcos WHERE pd = {d}
      ) WHERE rn <= {_MRL_SHORTLIST}
    ) s
    LEFT JOIN truth t ON t.qid = s.qid AND t.vec_id = s.vec_id"""


_SUITE_RECALL_SQL = (
    f"""
    WITH ex AS ({_EX_SQL}),
    qex AS (SELECT vec_id AS qid, i, x FROM ex WHERE vec_id < {_RECALL_Q}),
    norms AS (
      SELECT vec_id,
             sqrt(CAST(sum(CAST({sql_rd("x * x", 9)} AS DECIMAL(38,9))) AS DOUBLE)) AS nrm
      FROM ex GROUP BY vec_id
    ),
    dots AS (
      SELECT q.qid, e.vec_id,
             CAST(sum(CAST({sql_rd("q.x * e.x", 9)} AS DECIMAL(38,9))) AS DOUBLE) AS dxy
      FROM qex q JOIN ex e ON e.i = q.i AND e.vec_id <> q.qid
      GROUP BY q.qid, e.vec_id
    ),
    cos AS (
      SELECT d.qid, d.vec_id,
             {R("d.dxy / (nq.nrm * nv.nrm)", 6)} AS c
      FROM dots d
      JOIN norms nq ON nq.vec_id = d.qid
      JOIN norms nv ON nv.vec_id = d.vec_id
    ),
    truth AS (
      SELECT qid, vec_id FROM (
        SELECT qid, vec_id,
               row_number() OVER (PARTITION BY qid ORDER BY c DESC, vec_id ASC) AS rn
        FROM cos
      ) WHERE rn <= 10
    ),
    planes AS (
      SELECT b.b, i.i,
             ('0x' || substr(md5('tsdt|t0|' || b.b || '|' || i.i), 1, 8))::BIGINT
               / 2147483648.0 - 1.0 AS w
      FROM generate_series(0, {max(_BITS_SWEEP) - 1}) b(b),
           generate_series(0, 63) i(i)
    ),
    pdots AS (
      SELECT e.vec_id, p.b,
             CAST(sum(CAST({sql_rd("e.x * p.w", 9)} AS DECIMAL(38,9))) AS DOUBLE) AS d
      FROM ex e JOIN planes p ON p.i = e.i - 1
      GROUP BY e.vec_id, p.b
    ),
    sigs AS (
      SELECT vec_id,
             sum(CASE WHEN d > 0 THEN CAST(1 AS BIGINT) << b ELSE 0 END) AS sig
      FROM pdots GROUP BY vec_id
    ),
    ord AS (
      SELECT vec_id,
             row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR))) - 1 AS cid
      FROM embeddings
      QUALIFY cid <= 15
    ),
    cex AS (SELECT o.cid, e.i, e.x FROM ord o JOIN ex e ON e.vec_id = o.vec_id),
    cdists AS (
      SELECT e.vec_id, c.cid,
             sum(CAST({sql_rd("(e.x - c.x) * (e.x - c.x)", 9)} AS DECIMAL(38,9))) AS d
      FROM ex e JOIN cex c ON c.i = e.i
      GROUP BY e.vec_id, c.cid
    ),
    assigned AS (
      SELECT vec_id, cid FROM cdists
      QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) = 1
    ),
    qdist AS (
      SELECT q.qid, c.cid,
             sum(CAST({sql_rd("(q.x - c.x) * (q.x - c.x)", 9)} AS DECIMAL(38,9))) AS d
      FROM qex q JOIN cex c ON c.i = q.i
      GROUP BY q.qid, c.cid
    ),
    qn AS (
      SELECT qid,
             {", ".join(f'''CAST(sum(CASE WHEN i <= {d} THEN CAST({sql_rd("x * x", 9)} AS DECIMAL(38,9)) END) AS DOUBLE) AS qxx{d}''' for d in _MRL_DIMS)}
      FROM qex GROUP BY qid
    ),
    mdots AS (
      SELECT q.qid, e.vec_id,
             {_mrl_dim_cols_sql()}
      FROM qex q JOIN ex e ON e.i = q.i AND e.vec_id <> q.qid
      GROUP BY q.qid, e.vec_id
    ),
    mcos AS (
      {" UNION ALL ".join(
        f'''SELECT {d} AS pd, d.qid, d.vec_id,
               {R(f"d.dxy{d} / (sqrt(n.qxx{d}) * sqrt(d.dxx{d}))", 6)} AS c
        FROM mdots d JOIN qn n ON n.qid = d.qid'''
        for d in _MRL_DIMS)}
    )
    """
    + "\n    UNION ALL\n    ".join(
        [_suite_lsh_branch_sql(b) for b in _BITS_SWEEP]
        + [_suite_ivf_branch_sql(np_) for np_ in _NPROBE_SWEEP]
        + [_suite_mrl_branch_sql(d) for d in _MRL_DIMS]
    )
)


@register("sim_recall_suite", _SUITE_RECALL_SQL)
def _q_sim_recall_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    f"""The recall-curve SUITE: every approximate blocking structure's
    forfeit curve — LSH hyperplane bits ∈ {_BITS_SWEEP}, IVF nprobe ∈
    {_NPROBE_SWEEP}, Matryoshka prefix dims ∈ {_MRL_DIMS} — off ONE
    exact-cosine truth computation (the third instance of the
    amortize-the-shared-prefix pattern after dedup_report_suite and
    text_bpe_suite). The standalone curves each pay the Q×N exact
    truth pass and their own candidate machinery; here the shared cos
    matrix (8 probes × corpus, self-excluded, decimal-exact,
    lazily checkpointed) feeds all ten operating points, and every
    candidate set is RANKED BY THE SAME cos values — so the three
    curves are comparable cell-for-cell: one truth, one probe set, one
    ranking rule. Normalized (section, k, n_hits, n_candidates,
    recall_at_10) rows. Conventions unified suite-wide (probes =
    vec_id < {_RECALL_Q}, self excluded); the standalone queries keep
    their own contracts and remain independently oracle-checked — the
    LSH and MRL sections reconcile with them exactly (pytest), the IVF
    section differs by design (8 probes vs 5, self excluded vs kept).
    """
    emb = _table(spark, sf_dir, "embeddings")
    ex = emb.select(
        "vec_id", F.posexplode("embedding").alias("i", "x")
    ).withColumn("x", F.col("x").cast("double"))
    qex = ex.filter(F.col("vec_id") < _RECALL_Q).select(
        F.col("vec_id").alias("qid"), "i", F.col("x").alias("__qx")
    )
    norms = ex.groupBy("vec_id").agg(
        F.sqrt(
            F.sum(rd(F.col("x") * F.col("x"), 9).cast("decimal(38,9)")).cast(
                "double"
            )
        ).alias("__nrm")
    ).localCheckpoint(eager=False)
    dots = (
        ex.join(F.broadcast(qex), "i")
        .filter(F.col("vec_id") != F.col("qid"))
        .groupBy("qid", "vec_id")
        .agg(
            F.sum(rd(F.col("__qx") * F.col("x"), 9).cast("decimal(38,9)"))
            .cast("double")
            .alias("__dxy")
        )
    )
    cos = (
        dots.join(
            F.broadcast(
                norms.select(
                    F.col("vec_id").alias("qid"), F.col("__nrm").alias("__nq")
                ).filter(F.col("qid") < _RECALL_Q)
            ),
            "qid",
        )
        .join(norms.hint("shuffle_hash"), "vec_id")
        .select(
            "qid",
            "vec_id",
            rd(F.col("__dxy") / (F.col("__nq") * F.col("__nrm")), 6).alias(
                "__c"
            ),
        )
        .localCheckpoint(eager=False)
    )
    wq = Window.partitionBy("qid").orderBy(
        F.col("__c").desc(), F.col("vec_id").asc()
    )
    truth = (
        cos.withColumn("__rn", F.row_number().over(wq))
        .filter(F.col("__rn") <= 10)
        .select("qid", "vec_id", F.lit(1).alias("__t"))
        .localCheckpoint(eager=False)
    )

    def branch(section: str, k: int, pred) -> DataFrame:
        scored = pred.join(
            truth.hint("shuffle_hash"), ["qid", "vec_id"], "left"
        ).select(
            F.when(
                (F.col("__t") == 1) & (F.col("__rn") <= 10), 1
            ).otherwise(0).alias("hit")
        )
        return scored.agg(
            F.sum("hit").cast("long").alias("n_hits"),
            F.count(F.lit(1)).cast("long").alias("n_candidates"),
        ).select(
            F.lit(section).alias("section"),
            F.lit(k).cast("int").alias("k"),
            "n_hits",
            "n_candidates",
            rd(
                F.col("n_hits").cast("double") / F.lit(_RECALL_Q * 10.0), 6
            ).alias("recall_at_10"),
        )

    rows = []
    # LSH bits: one signature pass at max bits, nested lower-bit buckets
    sigs = (
        sim.lsh_signatures(emb, dim=64, bits=max(_BITS_SWEEP), tables=1)
        .select("vec_id", "sig")
        .localCheckpoint(eager=False)
    )
    qsig = sigs.select(F.col("vec_id").alias("qid"), F.col("sig").alias("__qs"))
    vsig = sigs.select("vec_id", F.col("sig").alias("__vs"))
    for b in _BITS_SWEEP:
        pred = (
            cos.join(F.broadcast(qsig), "qid")
            .join(vsig.hint("shuffle_hash"), "vec_id")
            .filter(
                F.pmod(F.col("__qs"), F.lit(1 << b))
                == F.pmod(F.col("__vs"), F.lit(1 << b))
            )
            .withColumn("__rn", F.row_number().over(wq))
        )
        rows.append(branch("lsh_bits", b, pred))
    # IVF nprobe: one corpus assignment, driver-ranked probe cells
    cents = sim.ivf_centroids(emb, 16)
    assigned = sim.ivf_assign_dec(emb, cents).localCheckpoint(eager=False)
    qrows = emb.filter(F.col("vec_id") < _RECALL_Q).select(
        "vec_id", "embedding"
    ).collect()
    for np_ in _NPROBE_SWEEP:
        probe_rows = [
            (int(r["vec_id"]), cid)
            for r in qrows
            for cid in sim.probe_centroids(
                cents, [float(x) for x in r["embedding"]], np_
            )
        ]
        probe_df = spark.createDataFrame(
            probe_rows, "qid bigint, centroid_id int"
        )
        cand = assigned.join(F.broadcast(probe_df), "centroid_id").select(
            "vec_id", "qid"
        )
        pred = cos.join(
            cand.hint("shuffle_hash"), ["qid", "vec_id"]
        ).withColumn("__rn", F.row_number().over(wq))
        rows.append(branch("ivf_nprobe", np_, pred))
    # MRL prefix dims: one pass computes every prefix dot conditionally
    def csum(cond, term):
        return F.sum(F.when(cond, rd(term, 9).cast("decimal(38,9)"))).cast(
            "double"
        )

    qn = qex.groupBy("qid").agg(
        *[
            csum(F.col("i") < d, F.col("__qx") * F.col("__qx")).alias(
                f"__qxx{d}"
            )
            for d in _MRL_DIMS
        ]
    )
    mdots = (
        ex.join(F.broadcast(qex), "i")
        .filter(F.col("vec_id") != F.col("qid"))
        .groupBy("qid", "vec_id")
        .agg(
            *[
                c
                for d in _MRL_DIMS
                for c in (
                    csum(F.col("i") < d, F.col("__qx") * F.col("x")).alias(
                        f"__dxy{d}"
                    ),
                    csum(F.col("i") < d, F.col("x") * F.col("x")).alias(
                        f"__dxx{d}"
                    ),
                )
            ]
        )
    )
    j = mdots.join(F.broadcast(qn), "qid").localCheckpoint(eager=False)
    for d in _MRL_DIMS:
        c = rd(
            F.col(f"__dxy{d}")
            / (F.sqrt(F.col(f"__qxx{d}")) * F.sqrt(F.col(f"__dxx{d}"))),
            6,
        )
        wsh = Window.partitionBy("qid").orderBy(
            F.col("__mc").desc(), F.col("vec_id").asc()
        )
        short = (
            j.select("qid", "vec_id", c.alias("__mc"))
            .withColumn("__rn", F.row_number().over(wsh))
            .filter(F.col("__rn") <= _MRL_SHORTLIST)
            .select("qid", "vec_id", F.lit(1).alias("__rn"))
        )
        rows.append(branch("mrl_dim", d, short))
    out = rows[0]
    for x in rows[1:]:
        out = out.unionByName(x)
    return out


# ---------------------------------------------------------------------------
# r9 wave 6: local clustering coefficient, t-closeness, ECE.
# ---------------------------------------------------------------------------


@register(
    "graph_clustering_by_degree",
    f"""
    WITH d AS (
      SELECT DISTINCT user_id, event_type,
             epoch_us(ts) // {_TRI_BLK_US} AS blk
      FROM events
    ),
    capped AS (
      SELECT user_id, event_type, blk
      FROM (
        SELECT *, row_number() OVER (
                 PARTITION BY event_type, blk ORDER BY user_id
               ) AS rn
        FROM d
      ) WHERE rn <= {_TRI_CAP}
    ),
    canon AS MATERIALIZED (
      SELECT DISTINCT x.user_id AS a, y.user_id AS b
      FROM capped x JOIN capped y
        ON x.event_type = y.event_type AND x.blk = y.blk
       AND x.user_id < y.user_id
    ),
    deg AS (
      SELECT v, count(*) AS deg FROM (
        SELECT a AS v FROM canon UNION ALL SELECT b AS v FROM canon
      ) GROUP BY v
    ),
    o AS (
      SELECT CASE WHEN da.deg < db.deg OR (da.deg = db.deg AND c.a < c.b)
                  THEN c.a ELSE c.b END AS u,
             CASE WHEN da.deg < db.deg OR (da.deg = db.deg AND c.a < c.b)
                  THEN c.b ELSE c.a END AS w
      FROM canon c
      JOIN deg da ON da.v = c.a
      JOIN deg db ON db.v = c.b
    ),
    wedges AS (
      SELECT l.u AS u, l.w AS a, r.w AS b
      FROM o l JOIN o r ON l.u = r.u AND l.w < r.w
    ),
    tri AS (
      SELECT w.u, w.a, w.b
      FROM wedges w JOIN canon c ON c.a = w.a AND c.b = w.b
    ),
    tv AS (
      SELECT v, count(*) AS t FROM (
        SELECT u AS v FROM tri
        UNION ALL SELECT a FROM tri
        UNION ALL SELECT b FROM tri
      ) GROUP BY v
    ),
    cc AS (
      SELECT g.v, g.deg, COALESCE(tv.t, 0) AS t,
             CASE WHEN g.deg >= 2 THEN
               {R("2.0 * CAST(COALESCE(tv.t, 0) AS DOUBLE) / (CAST(g.deg AS DOUBLE) * (CAST(g.deg AS DOUBLE) - 1.0))", 6)}
             ELSE 0.0 END AS cc
      FROM deg g LEFT JOIN tv ON tv.v = g.v
    )
    SELECT CAST(length(bin(deg)) - 1 AS INTEGER) AS deg_bucket,
           CAST(count(*) AS BIGINT) AS n_vertices,
           CAST(sum(t) AS BIGINT) AS sum_vertex_triangles,
           {R("CAST(sum(CAST(cc AS DECIMAL(38,6))) AS DOUBLE) / count(*)", 6)} AS mean_cc
    FROM cc GROUP BY 1
    """,
)
def _q_graph_clustering_by_degree(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LOCAL clustering coefficient by degree bucket — the
    Watts-Strogatz per-vertex completion next to the global triangle
    count: cc(v) = 2·T(v)/(deg(v)·(deg(v)−1)) over the same capped
    co-occurrence graph (`graph.local_clustering`), rolled up by exact
    log2-degree bucket (length(bin(d))−1, the graph_degree_stats
    convention). Organic communities keep cc HIGH at moderate degree;
    bot rings and broadcast hubs show high degree with near-zero cc —
    the curve shape is the audit, complementing assortativity's one
    number and the k-core's WHERE. Per-vertex triangle counts come
    from the SAME degree-oriented wedge enumeration as
    `graph_triangle_count_cooc` (each closed wedge credits its three
    corners — a bounded explode of triangle rows, never a per-vertex
    neighborhood materialization); every cc is one IEEE division of
    exact integers, 6-dp rounded, decimal-summed per bucket.
    Reference: Watts & Strogatz 1998; graph-family extension (the
    reference repo has no graph surface)."""
    from time_series_data_trimmer_spark.operators import graph as _gr

    ev = _events(spark, sf_dir)
    d = ev.select(
        "user_id",
        "event_type",
        F.expr(f"unix_micros(cast(ts as timestamp)) div {_TRI_BLK_US}").alias(
            "blk"
        ),
    ).distinct()
    wcap = Window.partitionBy("event_type", "blk").orderBy("user_id")
    capped = (
        d.withColumn("rn", F.row_number().over(wcap))
        .filter(F.col("rn") <= _TRI_CAP)
        .drop("rn")
    )
    rhs = capped.select(F.col("user_id").alias("ub"), "event_type", "blk")
    edges = (
        capped.join(rhs.hint("shuffle_hash"), ["event_type", "blk"])
        .filter(F.col("user_id") < F.col("ub"))
        .select(F.col("user_id").alias("src"), F.col("ub").alias("dst"))
    )
    cc = _gr.local_clustering(edges)
    return cc.groupBy(
        F.expr("length(bin(deg)) - 1").cast("int").alias("deg_bucket")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_vertices"),
        F.sum("n_triangles").cast("long").alias("sum_vertex_triangles"),
        rd(
            F.sum(F.col("cc").cast("decimal(38,6)")).cast("double")
            / F.count(F.lit(1)).cast("double"),
            6,
        ).alias("mean_cc"),
    )


@register(
    "privacy_t_closeness_audit",
    f"""
    WITH {_HLS_VS_C4_SQL},
    lab AS (
      SELECT d.doc_id, d.lang, d.source,
             CASE WHEN surv.doc_id IS NOT NULL THEN 1 ELSE 0 END AS pass
      FROM documents d LEFT JOIN surv ON surv.doc_id = d.doc_id
      WHERE d.text IS NOT NULL
    ),
    tot AS (
      SELECT CAST(sum(pass) AS DOUBLE) / count(*) AS p_glob FROM lab
    ),
    cls AS (
      SELECT lang, source, count(*) AS n, CAST(sum(pass) AS DOUBLE) / count(*) AS p_cls
      FROM lab GROUP BY lang, source
    ),
    tdist AS (
      SELECT lang, source, n,
             {R("abs(p_cls - (SELECT p_glob FROM tot))", 6)} AS t
      FROM cls
    ),
    classed AS (
      SELECT CASE WHEN t >= 0.3 THEN 't>=0.3 distribution-disclosed'
                  WHEN t >= 0.1 THEN 't=0.1-0.3'
                  ELSE 't<0.1 close' END AS risk_class,
             n, t
      FROM tdist
    )
    SELECT risk_class,
           CAST(count(*) AS BIGINT) AS n_classes,
           CAST(sum(n) AS BIGINT) AS n_docs,
           {R("max(t)", 6)} AS max_t,
           {R("CAST(sum(CAST(t AS DECIMAL(38,6))) AS DOUBLE) / count(*)", 6)} AS mean_t
    FROM classed GROUP BY risk_class
    """,
)
def _q_privacy_t_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-CLOSENESS audit (Li, Li & Venkatasubramanian 2007 — the third
    leg of the privacy release trilogy after k-anonymity and
    l-diversity): per quasi-identifier class (lang × source), the
    distance between the class's SENSITIVE-attribute distribution and
    the corpus-global one. A class can be k-anonymous AND l-diverse
    yet still disclose — if its distribution over the sensitive value
    differs sharply from global, membership alone shifts an attacker's
    posterior. Sensitive attribute: the C4 quality gate's pass bit
    (the released corpus's own quality label); for a binary attribute
    the variational distance is |p_class − p_global| exactly. Risk
    rollup by t band + per-band max/mean; every ratio is
    exact-integer division, one narrow groupBy at any scale, the
    global term one broadcast scalar."""
    docs = _table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    )
    surv = tx.c4_filter_survivors(docs).select(
        "doc_id", F.lit(1).alias("__pass")
    )
    lab = docs.select("doc_id", "lang", "source").join(
        surv.hint("shuffle_hash"), "doc_id", "left"
    ).select(
        "lang", "source", F.coalesce(F.col("__pass"), F.lit(0)).alias("__p")
    )
    tot = lab.agg(
        (F.sum("__p").cast("double") / F.count(F.lit(1))).alias("__pg")
    )
    cls = lab.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("__n"),
        (F.sum("__p").cast("double") / F.count(F.lit(1))).alias("__pc"),
    )
    t = cls.crossJoin(F.broadcast(tot)).select(
        "__n", rd(F.abs(F.col("__pc") - F.col("__pg")), 6).alias("__t")
    )
    risk = (
        F.when(F.col("__t") >= 0.3, "t>=0.3 distribution-disclosed")
        .when(F.col("__t") >= 0.1, "t=0.1-0.3")
        .otherwise("t<0.1 close")
    )
    return t.groupBy(risk.alias("risk_class")).agg(
        F.count(F.lit(1)).cast("long").alias("n_classes"),
        F.sum("__n").cast("long").alias("n_docs"),
        rd(F.max("__t"), 6).alias("max_t"),
        rd(
            F.sum(F.col("__t").cast("decimal(38,6)")).cast("double")
            / F.count(F.lit(1)).cast("double"),
            6,
        ).alias("mean_t"),
    )


@register(
    "eval_ece_binned",
    f"""
    WITH {_HLS_VS_C4_SQL},
    b AS (
      SELECT least(CAST(floor((round(sc.logit * 1000000, 0) + 500000)
                               / 10000) AS INT), 99) AS bin,
             CAST(round(sc.logit * 1000000, 0) + 500000 AS BIGINT) AS conf_micro,
             CASE WHEN surv.doc_id IS NOT NULL THEN 1 ELSE 0 END AS pass
      FROM sc LEFT JOIN surv ON surv.doc_id = sc.doc_id
    ),
    bins AS (
      SELECT bin, count(*) AS n, CAST(sum(pass) AS BIGINT) AS np,
             CAST(sum(conf_micro) AS BIGINT) AS smic
      FROM b GROUP BY bin
    ),
    tot AS (SELECT CAST(sum(n) AS BIGINT) AS nn FROM bins),
    gaps AS (
      SELECT bin, n,
             {R("abs(CAST(np AS DOUBLE) / n - CAST(smic AS DOUBLE) / (n * 1000000.0))", 9)} AS gap
      FROM bins
    )
    SELECT (SELECT nn FROM tot) AS n_docs,
           CAST(count(*) AS BIGINT) AS n_bins,
           {R("max(" + sql_rd("gap", 6) + ")", 6)} AS max_gap,
           {R("CAST(sum(CAST(" + sql_rd("gap * n / (SELECT nn FROM tot)", 9) + " AS DECIMAL(38,9))) AS DOUBLE)", 6)} AS ece
    FROM gaps
    """,
)
def _q_eval_ece_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expected Calibration Error (Naeini et al. 2015) — the
    one-number summary of `text_score_calibration`'s reliability
    diagram, over the SAME factored logit/label and the SAME 100 fixed
    6-dp bins as AUC and the PR curve (one family, one binning, four
    evals). Confidence maps the bounded logit to [0,1] as exact
    integer micro-units (logit·1e6 + 5e5); per bin the |accuracy −
    confidence| gap is one IEEE expression of exact integers, 9-dp
    rounded; ECE is the n_b/N-weighted decimal sum, rounded once.
    Everything after the bin aggregation is ≤100 rows — scan-bound at
    any corpus size."""
    docs = _table(spark, sf_dir, "documents")
    scores = tx.hashed_linear_score(docs).select("doc_id", "logit")
    surv = tx.c4_filter_survivors(docs).select(
        "doc_id", F.lit(1).alias("__pass")
    )
    j = scores.join(surv.hint("shuffle_hash"), "doc_id", "left")
    conf_micro = (F.round(F.col("logit") * 1000000, 0) + F.lit(500000)).cast(
        "long"
    )
    bin_col = F.least(
        F.floor(conf_micro / F.lit(10000)).cast("int"), F.lit(99)
    )
    bins = (
        j.select(
            bin_col.alias("__bin"),
            conf_micro.alias("__cm"),
            F.coalesce(F.col("__pass"), F.lit(0)).alias("__p"),
        )
        .groupBy("__bin")
        .agg(
            F.count(F.lit(1)).alias("__n"),
            F.sum("__p").cast("long").alias("__np"),
            F.sum("__cm").cast("long").alias("__smic"),
        )
    )
    tot = bins.agg(F.sum("__n").cast("long").alias("__nn"))
    gaps = bins.crossJoin(F.broadcast(tot)).select(
        "__n",
        "__nn",
        rd(
            F.abs(
                F.col("__np").cast("double") / F.col("__n")
                - F.col("__smic").cast("double")
                / (F.col("__n") * F.lit(1000000.0))
            ),
            9,
        ).alias("__gap"),
    )
    return gaps.agg(
        F.max("__nn").cast("long").alias("n_docs"),
        F.count(F.lit(1)).cast("long").alias("n_bins"),
        rd(F.max(rd(F.col("__gap"), 6)), 6).alias("max_gap"),
        rd(
            F.sum(
                rd(
                    F.col("__gap") * F.col("__n") / F.col("__nn"), 9
                ).cast("decimal(38,9)")
            ).cast("double"),
            6,
        ).alias("ece"),
    )


# ---------------------------------------------------------------------------
# r9 wave 7: split-leakage audit — the contamination number a
# deterministic split still leaves on the table.
# ---------------------------------------------------------------------------


@register(
    "mix_split_leakage_audit",
    f"""
    WITH shingled AS ({_SH_SQL}),
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
    sp AS (
      SELECT doc_id,
             CASE WHEN {sp.sql_hash_u32('doc_id', 'tsdt|split')} < {int(0.1 * (1 << 32))} THEN 'test'
                  WHEN {sp.sql_hash_u32('doc_id', 'tsdt|split')} < {2 * int(0.1 * (1 << 32))} THEN 'val'
                  ELSE 'train' END AS split
      FROM documents
    ),
    labeled AS (
      SELECT least(sa.split, sb.split) AS split_a,
             greatest(sa.split, sb.split) AS split_b
      FROM cand c
      JOIN sp sa ON sa.doc_id = c.id_a
      JOIN sp sb ON sb.doc_id = c.id_b
    ),
    tot AS (SELECT count(*) AS n FROM labeled)
    SELECT split_a, split_b,
           CAST(count(*) AS BIGINT) AS n_pairs,
           CASE WHEN split_a <> split_b THEN 1 ELSE 0 END AS crosses_split,
           {R("CAST(count(*) AS DOUBLE) / (SELECT n FROM tot)", 6)} AS frac_of_pairs
    FROM labeled GROUP BY split_a, split_b
    """,
)
def _q_mix_split_leakage_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPLIT-LEAKAGE audit: how many NEAR-DUPLICATE pairs (the
    MinHash-LSH candidate generator every dedup query trusts) straddle
    the deterministic train/val/test split — the contamination a
    doc-level hash split still leaves when near-dups aren't collapsed
    first. A train/test bridging pair means the eval set contains a
    near-copy of training data: eval scores inflate even though the
    split itself is perfectly reproducible. This is the MEASURED
    argument for `pipeline_dedup_budget_pack`'s dedup-BEFORE-split
    ordering and the quantitative companion of
    `dedup_decontaminate_vs_heldout` (which decontaminates against an
    explicit held-out set; this audits the split you already made).
    Output: (split_a ≤ split_b) pair counts with a crosses_split flag
    and each cell's share of all candidate pairs. Plan: the standard
    bucketed LSH pair generator (digests shuffle, never text) + two
    id-keyed joins onto the scan-side split labels + a ≤6-row agg;
    the total joins back as one broadcast scalar."""
    docs = _table(spark, sf_dir, "documents")
    cand = dd.minhash_lsh_pairs(docs).select("id_a", "id_b")
    splits = sp.train_val_test_split(
        docs, val_frac=0.1, test_frac=0.1
    ).select("doc_id", "split")
    sa = splits.select(
        F.col("doc_id").alias("id_a"), F.col("split").alias("__sa")
    )
    sb = splits.select(
        F.col("doc_id").alias("id_b"), F.col("split").alias("__sb")
    )
    labeled = (
        cand.join(sa.hint("shuffle_hash"), "id_a")
        .join(sb.hint("shuffle_hash"), "id_b")
        .select(
            F.least(F.col("__sa"), F.col("__sb")).alias("split_a"),
            F.greatest(F.col("__sa"), F.col("__sb")).alias("split_b"),
        )
    )
    tot = labeled.agg(F.count(F.lit(1)).alias("__n"))
    return (
        labeled.groupBy("split_a", "split_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_pairs"))
        .crossJoin(F.broadcast(tot))
        .select(
            "split_a",
            "split_b",
            "n_pairs",
            F.when(F.col("split_a") != F.col("split_b"), 1)
            .otherwise(0)
            .alias("crosses_split"),
            rd(
                F.col("n_pairs").cast("double") / F.col("__n").cast("double"),
                6,
            ).alias("frac_of_pairs"),
        )
    )


# ---------------------------------------------------------------------------
# r9 wave 8: MMR diversification — the greedy re-rank as a Catalyst
# fold, oracle = the unrolled greedy walk.
# ---------------------------------------------------------------------------

_MMR_SHORT, _MMR_K, _MMR_LAM = 20, 10, 0.7


def _mmr_step_sql(s: int) -> str:
    # every per-step CTE is MATERIALIZED: rem/sel/pick are each read by
    # 2-3 consumers at the next step, and DuckDB re-inlines plain CTEs
    # (3^k scan blowup — "too many open files" at k=10; PLANS.md
    # invariant 17's oracle-side half).
    return f"""ms{s} AS MATERIALIZED (
      SELECT r.qid, r.id, max(pc.c) AS msim
      FROM rem{s - 1} r
      JOIN sel{s - 1} sl ON sl.qid = r.qid
      JOIN paircos pc ON pc.qid = r.qid AND pc.a = r.id AND pc.b = sl.id
      GROUP BY r.qid, r.id
    ),
    sc{s} AS MATERIALIZED (
      SELECT r.qid, r.id, r.rel,
             {R(f"{_MMR_LAM} * r.rel - (1.0 - {_MMR_LAM}) * COALESCE(ms.msim, 0.0)", 6)} AS s
      FROM rem{s - 1} r
      LEFT JOIN ms{s} ms ON ms.qid = r.qid AND ms.id = r.id
    ),
    pick{s} AS MATERIALIZED (
      SELECT qid, id FROM sc{s}
      QUALIFY row_number() OVER (PARTITION BY qid ORDER BY s DESC, id ASC) = 1
    ),
    sel{s} AS MATERIALIZED (
      SELECT qid, id, rank FROM sel{s - 1}
      UNION ALL
      SELECT qid, id, {s} AS rank FROM pick{s}
    ),
    rem{s} AS MATERIALIZED (
      SELECT r.qid, r.id, r.rel FROM rem{s - 1} r
      WHERE NOT EXISTS (
        SELECT 1 FROM pick{s} p WHERE p.qid = r.qid AND p.id = r.id
      )
    )"""


_MMR_SQL = (
    f"""
    WITH ex AS ({_EX_SQL}),
    qex AS (SELECT vec_id AS qid, i, x FROM ex WHERE vec_id < {_RECALL_Q}),
    norms AS (
      SELECT vec_id,
             sqrt(CAST(sum(CAST({sql_rd("x * x", 9)} AS DECIMAL(38,9))) AS DOUBLE)) AS nrm
      FROM ex GROUP BY vec_id
    ),
    dots AS (
      SELECT q.qid, e.vec_id,
             CAST(sum(CAST({sql_rd("q.x * e.x", 9)} AS DECIMAL(38,9))) AS DOUBLE) AS dxy
      FROM qex q JOIN ex e ON e.i = q.i AND e.vec_id <> q.qid
      GROUP BY q.qid, e.vec_id
    ),
    cos AS (
      SELECT d.qid, d.vec_id,
             {R("d.dxy / (nq.nrm * nv.nrm)", 6)} AS c
      FROM dots d
      JOIN norms nq ON nq.vec_id = d.qid
      JOIN norms nv ON nv.vec_id = d.vec_id
    ),
    short AS MATERIALIZED (
      SELECT qid, vec_id, c FROM (
        SELECT qid, vec_id, c,
               row_number() OVER (PARTITION BY qid ORDER BY c DESC, vec_id ASC) AS rn
        FROM cos
      ) WHERE rn <= {_MMR_SHORT}
    ),
    prs AS (
      SELECT s1.qid, s1.vec_id AS a, s2.vec_id AS b
      FROM short s1 JOIN short s2
        ON s1.qid = s2.qid AND s1.vec_id <> s2.vec_id
    ),
    pdots AS (
      SELECT p.qid, p.a, p.b,
             CAST(sum(CAST({sql_rd("ea.x * eb.x", 9)} AS DECIMAL(38,9))) AS DOUBLE) AS dxy
      FROM prs p
      JOIN ex ea ON ea.vec_id = p.a
      JOIN ex eb ON eb.vec_id = p.b AND eb.i = ea.i
      GROUP BY p.qid, p.a, p.b
    ),
    paircos AS MATERIALIZED (
      SELECT d.qid, d.a, d.b,
             {R("d.dxy / (na.nrm * nb.nrm)", 6)} AS c
      FROM pdots d
      JOIN norms na ON na.vec_id = d.a
      JOIN norms nb ON nb.vec_id = d.b
    ),
    sel0 AS MATERIALIZED (SELECT qid, vec_id AS id, 0 AS rank FROM short WHERE 1 = 0),
    rem0 AS MATERIALIZED (SELECT qid, vec_id AS id, c AS rel FROM short),
    """
    + ",\n    ".join(_mmr_step_sql(s) for s in range(1, _MMR_K + 1))
    + f"""
    SELECT qid AS query_id, id AS vec_id, CAST(rank AS INTEGER) AS mmr_rank
    FROM sel{_MMR_K}
    """
)


@register("retrieval_mmr_topk", _MMR_SQL)
def _q_retrieval_mmr_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    f"""MMR diversification (`sim.mmr_diversify`, Carbonell & Goldstein
    1998): per standard probe, the exact-cosine top-{_MMR_SHORT}
    shortlist greedily re-ranked by λ·rel − (1−λ)·max-sim-to-selected
    (λ={_MMR_LAM}, k={_MMR_K}) — the post-retrieval pass that stops
    near-duplicate hits from crowding a RAG context window. The greedy
    recurrence is sequential in k, so it runs as one Catalyst
    `F.aggregate` fold over each query's BOUNDED collected shortlist
    (the DTW precedent: per-key bounded arrays + fold = pure codegen,
    no Python, no driver loop, k fold steps at plan time). The oracle
    replays the walk as {_MMR_K} unrolled steps (argmax by (score
    desc, id), selected-set max-sim via the precomputed shortlist
    pair-cosine table); every cosine is the repo's decimal-exact dot,
    6-dp rounded, so both engines pick the same candidate at every
    step."""
    emb = _table(spark, sf_dir, "embeddings")
    ex = emb.select(
        "vec_id", F.posexplode("embedding").alias("i", "x")
    ).withColumn("x", F.col("x").cast("double"))
    qex = ex.filter(F.col("vec_id") < _RECALL_Q).select(
        F.col("vec_id").alias("qid"), "i", F.col("x").alias("__qx")
    )
    norms = ex.groupBy("vec_id").agg(
        F.sqrt(
            F.sum(rd(F.col("x") * F.col("x"), 9).cast("decimal(38,9)")).cast(
                "double"
            )
        ).alias("__nrm")
    ).localCheckpoint(eager=False)
    dots = (
        ex.join(F.broadcast(qex), "i")
        .filter(F.col("vec_id") != F.col("qid"))
        .groupBy("qid", "vec_id")
        .agg(
            F.sum(rd(F.col("__qx") * F.col("x"), 9).cast("decimal(38,9)"))
            .cast("double")
            .alias("__dxy")
        )
    )
    cos = (
        dots.join(
            F.broadcast(
                norms.select(
                    F.col("vec_id").alias("qid"), F.col("__nrm").alias("__nq")
                ).filter(F.col("qid") < _RECALL_Q)
            ),
            "qid",
        )
        .join(norms.hint("shuffle_hash"), "vec_id")
        .select(
            "qid",
            "vec_id",
            rd(F.col("__dxy") / (F.col("__nq") * F.col("__nrm")), 6).alias(
                "__c"
            ),
        )
    )
    wq = Window.partitionBy("qid").orderBy(
        F.col("__c").desc(), F.col("vec_id").asc()
    )
    short = (
        cos.withColumn("__rn", F.row_number().over(wq))
        .filter(F.col("__rn") <= _MMR_SHORT)
        .select("qid", "vec_id", "__c")
    )
    scored = short.join(
        emb.select("vec_id", "embedding").hint("shuffle_hash"), "vec_id"
    )
    return sim.mmr_diversify(
        scored,
        k=_MMR_K,
        lam=_MMR_LAM,
        query_col="qid",
        id_col="vec_id",
        rel_col="__c",
        vec_col="embedding",
    ).select(
        F.col("qid").alias("query_id"),
        "vec_id",
        "mmr_rank",
    )


@register(
    "events_ohlc_hourly",
    f"""
    WITH e AS (
      SELECT event_type, epoch_us(ts) // 3600000000 AS hour_bucket,
             epoch_us(ts) AS us, event_id, value
      FROM events WHERE value IS NOT NULL
    ),
    r AS (
      SELECT event_type, hour_bucket, value,
             row_number() OVER (PARTITION BY event_type, hour_bucket
                                ORDER BY us ASC, event_id ASC) AS rn_a,
             row_number() OVER (PARTITION BY event_type, hour_bucket
                                ORDER BY us DESC, event_id DESC) AS rn_d
      FROM e
    )
    SELECT event_type, hour_bucket,
           CAST(count(*) AS BIGINT) AS n_events,
           {R("max(CASE WHEN rn_a = 1 THEN value END)", 2)} AS open,
           {R("max(value)", 2)} AS high,
           {R("min(value)", 2)} AS low,
           {R("max(CASE WHEN rn_d = 1 THEN value END)", 2)} AS close
    FROM r GROUP BY event_type, hour_bucket
    """,
)
def _q_events_ohlc_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC bars per (event_type, hour) — the classic time-series
    downsample-for-monitoring shape (finance candles, metrics rollups):
    open/close are the first/last value by (time, event_id) — a
    DETERMINISTIC tie-break, where naive min_by/max_by on the bare
    timestamp would be engine-undefined under equal timestamps — and
    high/low are plain extrema. One keyed exchange carries both
    row-number windows and the aggregation; output is
    |types| × |hours| rows at any input size. Complements
    `ts_m4_downsample` (min/max/first/last per pixel bucket for viz)
    and `twap_value_by_user_hour` (time-weighted mean) in the bar
    family."""
    ev = _events(spark, sf_dir).filter(F.col("value").isNotNull())
    e = ev.select(
        "event_type",
        F.expr("unix_micros(cast(ts as timestamp)) div 3600000000").alias(
            "hour_bucket"
        ),
        F.expr("unix_micros(cast(ts as timestamp))").alias("__us"),
        "event_id",
        "value",
    )
    wa = Window.partitionBy("event_type", "hour_bucket").orderBy(
        F.col("__us").asc(), F.col("event_id").asc()
    )
    wd = Window.partitionBy("event_type", "hour_bucket").orderBy(
        F.col("__us").desc(), F.col("event_id").desc()
    )
    r = e.select(
        "event_type",
        "hour_bucket",
        "value",
        F.row_number().over(wa).alias("__ra"),
        F.row_number().over(wd).alias("__rd"),
    )
    return r.groupBy("event_type", "hour_bucket").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        rd(F.max(F.when(F.col("__ra") == 1, F.col("value"))), 2).alias("open"),
        rd(F.max("value"), 2).alias("high"),
        rd(F.min("value"), 2).alias("low"),
        rd(F.max(F.when(F.col("__rd") == 1, F.col("value"))), 2).alias("close"),
    )


# ---------------------------------------------------------------------------
# r9 wave 10: Brier decomposition + weight-of-evidence encoding.
# ---------------------------------------------------------------------------


@register(
    "eval_brier_decomposition",
    f"""
    WITH {_HLS_VS_C4_SQL},
    b AS (
      SELECT least(CAST(floor((round(sc.logit * 1000000, 0) + 500000)
                               / 10000) AS INT), 99) AS bin,
             CAST(round(sc.logit * 1000000, 0) + 500000 AS BIGINT) AS conf_micro,
             CASE WHEN surv.doc_id IS NOT NULL THEN 1 ELSE 0 END AS pass
      FROM sc LEFT JOIN surv ON surv.doc_id = sc.doc_id
    ),
    bins AS (
      SELECT bin, count(*) AS n, CAST(sum(pass) AS BIGINT) AS np,
             CAST(sum(conf_micro) AS BIGINT) AS smic
      FROM b GROUP BY bin
    ),
    tot AS (
      SELECT CAST(sum(n) AS BIGINT) AS nn, CAST(sum(np) AS BIGINT) AS npos
      FROM bins
    ),
    terms AS (
      SELECT n,
             CAST(np AS DOUBLE) / n AS acc,
             CAST(smic AS DOUBLE) / (n * 1000000.0) AS conf,
             CAST((SELECT npos FROM tot) AS DOUBLE) / (SELECT nn FROM tot) AS obar
      FROM bins
    ),
    parts AS (
      SELECT
        CAST(sum(CAST({sql_rd("(conf - acc) * (conf - acc) * n / (SELECT nn FROM tot)", 9)} AS DECIMAL(38,9))) AS DOUBLE) AS rel,
        CAST(sum(CAST({sql_rd("(acc - obar) * (acc - obar) * n / (SELECT nn FROM tot)", 9)} AS DECIMAL(38,9))) AS DOUBLE) AS res,
        max({R("obar * (1.0 - obar)", 9)}) AS unc
      FROM terms
    )
    SELECT (SELECT nn FROM tot) AS n_docs,
           {R("rel", 6)} AS reliability,
           {R("res", 6)} AS resolution,
           {R("unc", 6)} AS uncertainty,
           {R("rel - res + unc", 6)} AS brier_binned
    FROM parts
    """,
)
def _q_eval_brier_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Murphy decomposition of the binned Brier score (Murphy 1973):
    Brier = RELIABILITY − RESOLUTION + UNCERTAINTY over the same
    factored logit/label and 100 fixed bins as AUC/PR/ECE — the
    decomposition says WHY a scorer's probabilistic quality is what it
    is (badly calibrated? or just uninformative?), where ECE only
    prices the calibration term. REL = Σ n_b/N·(conf_b − acc_b)²,
    RES = Σ n_b/N·(acc_b − ō)², UNC = ō(1−ō), and the binned identity
    brier = REL − RES + UNC holds exactly (pytest). All terms are IEEE
    expressions of exact integer ratios, 9-dp rounded per bin, decimal
    summed, 6-dp surfaced; ≤100 rows after the bin agg."""
    docs = _table(spark, sf_dir, "documents")
    scores = tx.hashed_linear_score(docs).select("doc_id", "logit")
    surv = tx.c4_filter_survivors(docs).select(
        "doc_id", F.lit(1).alias("__pass")
    )
    j = scores.join(surv.hint("shuffle_hash"), "doc_id", "left")
    conf_micro = (F.round(F.col("logit") * 1000000, 0) + F.lit(500000)).cast(
        "long"
    )
    bin_col = F.least(
        F.floor(conf_micro / F.lit(10000)).cast("int"), F.lit(99)
    )
    bins = (
        j.select(
            bin_col.alias("__bin"),
            conf_micro.alias("__cm"),
            F.coalesce(F.col("__pass"), F.lit(0)).alias("__p"),
        )
        .groupBy("__bin")
        .agg(
            F.count(F.lit(1)).alias("__n"),
            F.sum("__p").cast("long").alias("__np"),
            F.sum("__cm").cast("long").alias("__smic"),
        )
    )
    tot = bins.agg(
        F.sum("__n").cast("long").alias("__nn"),
        F.sum("__np").cast("long").alias("__npos"),
    )
    terms = bins.crossJoin(F.broadcast(tot)).select(
        "__n",
        "__nn",
        (F.col("__np").cast("double") / F.col("__n")).alias("__acc"),
        (
            F.col("__smic").cast("double") / (F.col("__n") * F.lit(1000000.0))
        ).alias("__conf"),
        (F.col("__npos").cast("double") / F.col("__nn")).alias("__obar"),
    )
    rel_t = rd(
        (F.col("__conf") - F.col("__acc"))
        * (F.col("__conf") - F.col("__acc"))
        * F.col("__n")
        / F.col("__nn"),
        9,
    )
    res_t = rd(
        (F.col("__acc") - F.col("__obar"))
        * (F.col("__acc") - F.col("__obar"))
        * F.col("__n")
        / F.col("__nn"),
        9,
    )
    parts = terms.agg(
        F.max("__nn").cast("long").alias("n_docs"),
        F.sum(rel_t.cast("decimal(38,9)")).cast("double").alias("__rel"),
        F.sum(res_t.cast("decimal(38,9)")).cast("double").alias("__res"),
        F.max(
            rd(F.col("__obar") * (F.lit(1.0) - F.col("__obar")), 9)
        ).alias("__unc"),
    )
    return parts.select(
        "n_docs",
        rd(F.col("__rel"), 6).alias("reliability"),
        rd(F.col("__res"), 6).alias("resolution"),
        rd(F.col("__unc"), 6).alias("uncertainty"),
        rd(F.col("__rel") - F.col("__res") + F.col("__unc"), 6).alias(
            "brier_binned"
        ),
    )


@register(
    "feature_woe_encoding",
    f"""
    WITH {_HLS_VS_C4_SQL},
    lab AS (
      SELECT d.doc_id, d.source,
             CASE WHEN surv.doc_id IS NOT NULL THEN 1 ELSE 0 END AS pass
      FROM documents d LEFT JOIN surv ON surv.doc_id = d.doc_id
      WHERE d.text IS NOT NULL
    ),
    tot AS (
      SELECT CAST(sum(pass) AS BIGINT) AS pos,
             CAST(count(*) - sum(pass) AS BIGINT) AS neg
      FROM lab
    ),
    cls AS (
      SELECT source, count(*) AS n,
             CAST(sum(pass) AS BIGINT) AS np,
             CAST(count(*) - sum(pass) AS BIGINT) AS nn
      FROM lab GROUP BY source
    ),
    woe_t AS (
      SELECT source, n, np, nn,
             (np + 0.5) / ((SELECT pos FROM tot) + 0.5) AS ps,
             (nn + 0.5) / ((SELECT neg FROM tot) + 0.5) AS ns
      FROM cls
    )
    SELECT source,
           CAST(n AS BIGINT) AS n_docs,
           CAST(np AS BIGINT) AS n_pos,
           {R("ln(ps / ns)", 6)} AS woe,
           {R("(ps - ns) * ln(ps / ns)", 6)} AS iv_term
    FROM woe_t
    """,
)
def _q_feature_woe_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-of-Evidence categorical encoding + Information Value —
    the credit-scoring-standard supervised encoding next to
    `feature_loo_target_encoding`: per source, WOE = ln(pos_share /
    neg_share) with 0.5 Laplace smoothing (never ±∞ on pure classes),
    target = the C4 gate's pass bit. IV_term per category sums to the
    feature's Information Value (the keep-this-feature number: <0.02
    useless, >0.5 suspicious). Shares are exact smoothed-integer
    ratios, so both engines take ln of identical doubles; one narrow
    groupBy + a 2-scalar broadcast at any corpus size."""
    docs = _table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    )
    surv = tx.c4_filter_survivors(docs).select(
        "doc_id", F.lit(1).alias("__pass")
    )
    lab = docs.select("doc_id", "source").join(
        surv.hint("shuffle_hash"), "doc_id", "left"
    ).select("source", F.coalesce(F.col("__pass"), F.lit(0)).alias("__p"))
    tot = lab.agg(
        F.sum("__p").cast("long").alias("__pos"),
        (F.count(F.lit(1)) - F.sum("__p")).cast("long").alias("__neg"),
    )
    cls = lab.groupBy("source").agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum("__p").cast("long").alias("__np"),
        (F.count(F.lit(1)) - F.sum("__p")).cast("long").alias("__nn"),
    )
    w = cls.crossJoin(F.broadcast(tot)).select(
        "source",
        "__n",
        "__np",
        (
            (F.col("__np") + F.lit(0.5)) / (F.col("__pos") + F.lit(0.5))
        ).alias("__ps"),
        (
            (F.col("__nn") + F.lit(0.5)) / (F.col("__neg") + F.lit(0.5))
        ).alias("__ns"),
    )
    return w.select(
        "source",
        F.col("__n").cast("long").alias("n_docs"),
        F.col("__np").cast("long").alias("n_pos"),
        rd(F.log(F.col("__ps") / F.col("__ns")), 6).alias("woe"),
        rd(
            (F.col("__ps") - F.col("__ns"))
            * F.log(F.col("__ps") / F.col("__ns")),
            6,
        ).alias("iv_term"),
    )


# ---------------------------------------------------------------------------
# r9 wave 11: RAKE keyword extraction.
# ---------------------------------------------------------------------------

_RAKE_STOP_SQL = ", ".join(f"'{w}'" for w in tx.RAKE_STOPWORDS)


@register(
    "text_rake_top_keyword",
    f"""
    WITH t0 AS (
      SELECT doc_id,
             list_filter(string_split(trim(regexp_replace(lower(text),
                 '[^a-z0-9]+', ' ', 'g')), ' '), x -> length(x) > 0) AS toks
      FROM documents WHERE text IS NOT NULL
    ),
    pos AS (
      SELECT doc_id, u['i'] AS pos, u['v'] AS w
      FROM (SELECT doc_id,
                   unnest(list_transform(toks, (x, i) -> {{'v': x, 'i': i}})) AS u
            FROM t0)
    ),
    marked AS (
      SELECT doc_id, pos, w,
             sum(CASE WHEN w IN ({_RAKE_STOP_SQL}) THEN 1 ELSE 0 END)
               OVER (PARTITION BY doc_id ORDER BY pos) AS isl,
             w IN ({_RAKE_STOP_SQL}) AS stop
      FROM pos
    ),
    ph AS (
      SELECT doc_id, isl,
             string_agg(w, ' ' ORDER BY pos) AS phrase,
             count(*) AS n_words
      FROM marked WHERE NOT stop
      GROUP BY doc_id, isl
      HAVING count(*) <= {tx.RAKE_MAX_PHRASE}
    ),
    wrd AS (
      SELECT doc_id, isl, n_words, unnest(string_split(phrase, ' ')) AS w
      FROM ph
    ),
    st AS (
      SELECT doc_id, w, count(*) AS freq, sum(n_words) AS deg
      FROM wrd GROUP BY doc_id, w
    ),
    sw AS (
      SELECT wr.doc_id, wr.isl,
             {R("CAST(st.deg AS DOUBLE) / st.freq", 6)} AS s
      FROM wrd wr JOIN st ON st.doc_id = wr.doc_id AND st.w = wr.w
    ),
    sc AS (
      SELECT doc_id, isl,
             {R("CAST(sum(CAST(s AS DECIMAL(38,6))) AS DOUBLE)", 6)} AS score
      FROM sw GROUP BY doc_id, isl
    ),
    ranked AS (
      SELECT p.doc_id, p.phrase, CAST(p.n_words AS INTEGER) AS n_words,
             sc.score,
             row_number() OVER (PARTITION BY p.doc_id
                                ORDER BY sc.score DESC, p.phrase ASC) AS rn
      FROM ph p JOIN sc ON sc.doc_id = p.doc_id AND sc.isl = p.isl
    )
    SELECT doc_id, phrase, n_words, score FROM ranked WHERE rn = 1
    """,
)
def _q_text_rake_top_keyword(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAKE keyword extraction (`tx.rake_keywords`, Rose et al. 2010):
    each document's TOP candidate phrase by the degree/frequency score
    — training-free document keywords for index terms, dataset cards,
    and topic labels, computed entirely from the document's own
    collocation structure (no corpus statistics, no model). Candidate
    phrases are maximal non-stopword runs (fixed literal stopword
    list, phrases capped at {tx.RAKE_MAX_PHRASE} words); word score =
    deg/freq favors words living in longer collocations; phrase score
    is the 6-dp decimal sum of its word scores; top-1 per doc breaks
    ties on the phrase text. Everything is per-document bounded —
    segmentation is one keyed gaps-and-islands window, scoring two
    doc-keyed aggregations."""
    docs = _table(spark, sf_dir, "documents")
    cand = tx.rake_keywords(docs)
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("phrase").asc()
    )
    return (
        cand.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("doc_id", "phrase", "n_words", "score")
    )


# ---------------------------------------------------------------------------
# r9 wave 12: Jaccard link prediction + dedup-aware epoch weighting.
# ---------------------------------------------------------------------------


@register(
    "graph_jaccard_links",
    f"""
    WITH e AS (
      SELECT user_id, event_id, ts, epoch_us(ts) AS us FROM events
    ),
    m AS (
      SELECT *,
             CASE WHEN lag(us) OVER w IS NULL
                       OR us - lag(us) OVER w > 1800000000
                  THEN 1 ELSE 0 END AS newf
      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    s AS (
      SELECT *,
             sum(newf) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS UNBOUNDED PRECEDING
             ) AS sess
      FROM m
    ),
    sess AS (
      SELECT user_id, sess, min(us) AS start_us, max(us) AS end_us
      FROM s GROUP BY user_id, sess
    ),
    ed AS (
      SELECT DISTINCT a.user_id AS ua, b.user_id AS ub
      FROM sess a JOIN sess b
        ON a.start_us <= b.end_us AND b.start_us <= a.end_us
       AND a.user_id < b.user_id
    ),
    sym AS (
      SELECT ua AS u, ub AS v FROM ed
      UNION ALL
      SELECT ub AS u, ua AS v FROM ed
    ),
    deg AS (SELECT u, count(*) AS d FROM sym GROUP BY u),
    nbr AS (
      SELECT u, v FROM (
        SELECT u, v,
               row_number() OVER (
                 PARTITION BY u
                 ORDER BY {sp.sql_hash_u32("v", "tsdt|aa")} ASC, v ASC
               ) AS rn
        FROM sym
      ) WHERE rn <= {_AA_CAP}
    ),
    hop2 AS (
      SELECT a.v AS x, b.v AS y
      FROM nbr a JOIN nbr b ON a.u = b.u AND a.v < b.v
    ),
    com AS (SELECT x, y, count(*) AS c FROM hop2 GROUP BY x, y),
    sc AS (
      SELECT com.x, com.y, com.c,
             dx.d + dy.d - com.c AS uni
      FROM com
      JOIN deg dx ON dx.u = com.x
      JOIN deg dy ON dy.u = com.y
    ),
    new_links AS (
      SELECT sc.x, sc.y, sc.c, sc.uni
      FROM sc LEFT JOIN ed ON ed.ua = sc.x AND ed.ub = sc.y
      WHERE ed.ua IS NULL
    )
    SELECT x AS user_a, y AS user_b,
           CAST(c AS BIGINT) AS n_common,
           {R("CAST(c AS DOUBLE) / uni", 6)} AS jaccard
    FROM new_links
    ORDER BY jaccard DESC, x ASC, y ASC
    LIMIT 20
    """,
)
def _q_graph_jaccard_links(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JACCARD link prediction over the session-concurrency graph —
    Adamic-Adar's size-normalized sibling: |N(x)∩N(y)| / |N(x)∪N(y)|
    for non-adjacent pairs, union from TRUE degrees
    (d(x)+d(y)−common), common neighbors from the SAME capped two-hop
    expansion as `graph_adamic_adar_links` (per-node {_AA_CAP}-cap by
    portable hash order — the bounded-block rule that keeps Σdeg²
    finite at hubs). AA rewards rare shared contacts; Jaccard rewards
    OVERLAP SHARE — a pair with 3 of 4 neighbors shared outranks a
    hub pair with 10 of 500. The two scores together are the link-
    prediction panel. Exact integer count/union ratio, 6-dp round,
    top-20 fully tie-broken."""
    ev = _table(spark, sf_dir, "events")
    sess = ag.sessionize_user_events(ev, gap_minutes=30)
    ivl = sess.select(
        "user_id",
        F.unix_micros(F.col("session_start").cast("timestamp")).alias(
            "start_us"
        ),
        F.unix_micros(F.col("session_end").cast("timestamp")).alias("end_us"),
    )
    pairs = iv.overlap_join(ivl, ivl, bucket_us="auto").filter(
        F.col("user_id_a") < F.col("user_id_b")
    )
    ed = pairs.select(
        F.col("user_id_a").alias("ua"), F.col("user_id_b").alias("ub")
    ).distinct()
    sym = ed.select(F.col("ua").alias("u"), F.col("ub").alias("v")).unionAll(
        ed.select(F.col("ub").alias("u"), F.col("ua").alias("v"))
    )
    deg = sym.groupBy("u").agg(F.count(F.lit(1)).alias("d"))
    wn = Window.partitionBy("u").orderBy(
        sp.hash_u32(F.col("v"), "tsdt|aa").asc(), F.col("v").asc()
    )
    nbr = (
        sym.withColumn("__rn", F.row_number().over(wn))
        .filter(F.col("__rn") <= _AA_CAP)
        .select("u", "v")
    )
    a = nbr.select(F.col("u").alias("__via"), F.col("v").alias("x"))
    b = nbr.select(F.col("u").alias("__via"), F.col("v").alias("y"))
    com = (
        a.join(b.hint("shuffle_hash"), "__via")
        .filter(F.col("x") < F.col("y"))
        .groupBy("x", "y")
        .agg(F.count(F.lit(1)).alias("__c"))
    )
    dx = deg.select(F.col("u").alias("x"), F.col("d").alias("__dx"))
    dy = deg.select(F.col("u").alias("y"), F.col("d").alias("__dy"))
    sc = (
        com.join(dx.hint("shuffle_hash"), "x")
        .join(dy.hint("shuffle_hash"), "y")
        .select(
            "x", "y", "__c",
            (F.col("__dx") + F.col("__dy") - F.col("__c")).alias("__uni"),
        )
    )
    new_links = sc.join(
        ed.hint("shuffle_hash"),
        (F.col("x") == F.col("ua")) & (F.col("y") == F.col("ub")),
        "left_anti",
    )
    return (
        new_links.select(
            F.col("x").alias("user_a"),
            F.col("y").alias("user_b"),
            F.col("__c").cast("long").alias("n_common"),
            rd(F.col("__c").cast("double") / F.col("__uni"), 6).alias(
                "jaccard"
            ),
        )
        .orderBy(
            F.col("jaccard").desc(), F.col("user_a").asc(), F.col("user_b").asc()
        )
        .limit(20)
    )


@register(
    "mix_dedup_aware_epochs",
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
    sz AS (SELECT cluster_id, count(*) AS csize FROM cl GROUP BY cluster_id),
    d AS (
      SELECT doc.doc_id, doc.source,
             CAST(ceil(length(coalesce(doc.text, '')) / 4.0) AS BIGINT) AS n_tokens,
             sz.csize
      FROM documents doc
      JOIN cl ON cl.doc_id = doc.doc_id
      JOIN sz ON sz.cluster_id = cl.cluster_id
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS raw_tokens,
           {R("CAST(sum(CAST(" + sql_rd("CAST(n_tokens AS DOUBLE) / csize", 6) + " AS DECIMAL(38,6))) AS DOUBLE)", 6)} AS effective_tokens,
           {R("CAST(sum(CAST(" + sql_rd("CAST(n_tokens AS DOUBLE) / csize", 6) + " AS DECIMAL(38,6))) AS DOUBLE) / sum(n_tokens)", 6)} AS dup_discount
    FROM d GROUP BY source
    """,
)
def _q_mix_dedup_aware_epochs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DEDUP-AWARE epoch weighting — the SOFT alternative to
    drop-the-duplicates: every document keeps membership, but its
    training weight is 1/cluster_size of its near-dup LSH+CC cluster,
    so a 5-copy boilerplate family contributes ONE document's worth of
    gradient per epoch instead of five (the "data diet" form the
    dedup literature recommends when provenance must be preserved).
    Per source: raw token mass, dup-discounted EFFECTIVE token mass
    (Σ n_tokens/csize, 6-dp decimal sum), and the discount ratio —
    the number a mix owner feeds into per-source epoch counts. Same
    proven LSH + pointer-jumped CC labeling (`dd.dedup_components`);
    one size join + one source agg on top."""
    docs = _table(spark, sf_dir, "documents")
    comp = dd.dedup_components(docs)
    sz = comp.groupBy("cluster_id").agg(F.count(F.lit(1)).alias("__csize"))
    d = (
        docs.select(
            "doc_id",
            "source",
            F.ceil(
                F.length(F.coalesce(F.col("text"), F.lit(""))) / F.lit(4.0)
            ).cast("long").alias("__nt"),
        )
        .join(comp.hint("shuffle_hash"), "doc_id")
        .join(sz.hint("shuffle_hash"), "cluster_id")
    )
    eff_term = rd(
        F.col("__nt").cast("double") / F.col("__csize"), 6
    ).cast("decimal(38,6)")
    return d.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("__nt").cast("long").alias("raw_tokens"),
        rd(F.sum(eff_term).cast("double"), 6).alias("effective_tokens"),
        rd(
            F.sum(eff_term).cast("double")
            / F.sum("__nt").cast("double"),
            6,
        ).alias("dup_discount"),
    )


@register(
    "eval_confusion_at_threshold",
    f"""
    WITH {_HLS_VS_C4_SQL},
    b AS (
      SELECT CASE WHEN sc.logit >= 0.0 THEN 1 ELSE 0 END AS pred,
             CASE WHEN surv.doc_id IS NOT NULL THEN 1 ELSE 0 END AS pass
      FROM sc LEFT JOIN surv ON surv.doc_id = sc.doc_id
    ),
    c AS (
      SELECT CAST(sum(pred * pass) AS BIGINT) AS tp,
             CAST(sum(pred * (1 - pass)) AS BIGINT) AS fp,
             CAST(sum((1 - pred) * pass) AS BIGINT) AS fn,
             CAST(sum((1 - pred) * (1 - pass)) AS BIGINT) AS tn
      FROM b
    )
    SELECT tp, fp, fn, tn,
           CASE WHEN tp + fp > 0 THEN
             {R("CAST(tp AS DOUBLE) / (CAST(tp AS DOUBLE) + CAST(fp AS DOUBLE))", 6)}
           END AS prec,
           CASE WHEN tp + fn > 0 THEN
             {R("CAST(tp AS DOUBLE) / (CAST(tp AS DOUBLE) + CAST(fn AS DOUBLE))", 6)}
           END AS recall,
           CASE WHEN 2 * tp + fp + fn > 0 THEN
             {R("(2.0 * CAST(tp AS DOUBLE)) / (2.0 * CAST(tp AS DOUBLE) + CAST(fp AS DOUBLE) + CAST(fn AS DOUBLE))", 6)}
           END AS f1,
           {R("(CAST(tp AS DOUBLE) + CAST(tn AS DOUBLE)) / (CAST(tp AS DOUBLE) + CAST(fp AS DOUBLE) + CAST(fn AS DOUBLE) + CAST(tn AS DOUBLE))", 6)} AS accuracy,
           CASE WHEN (tp + fp) > 0 AND (tp + fn) > 0 AND (tn + fp) > 0 AND (tn + fn) > 0 THEN
             {R("(CAST(tp AS DOUBLE) * CAST(tn AS DOUBLE) - CAST(fp AS DOUBLE) * CAST(fn AS DOUBLE)) / sqrt(((CAST(tp AS DOUBLE) + CAST(fp AS DOUBLE)) * (CAST(tp AS DOUBLE) + CAST(fn AS DOUBLE))) * ((CAST(tn AS DOUBLE) + CAST(fp AS DOUBLE)) * (CAST(tn AS DOUBLE) + CAST(fn AS DOUBLE))))", 6)}
           END AS mcc
    FROM c
    """,
)
def _q_eval_confusion_at_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OPERATING-POINT eval for the cheap hashed-linear quality
    scorer against the expensive C4 gate: the confusion matrix and
    its derived rates at the deployment threshold (logit >= 0) — the
    number a pipeline owner reads AFTER `eval_auc_binned` says the
    ranking is good and `text_score_calibration` picks the threshold:
    what do we actually keep/lose if the cheap scorer pre-prunes the
    crawl HERE. Same factored scorer+label pair (`_HLS_VS_C4_SQL`) as
    the rest of the eval family, so all four evals (AUC, PR, Brier,
    confusion) score the identical logit against the identical label.
    Counts are exact integers off one scan + one doc_id-keyed left
    join; precision/recall/F1/accuracy/MCC are single IEEE
    expressions on the four counts (explicitly parenthesized so both
    engines multiply in the same order; sqrt is correctly rounded),
    zero-denominator cells NULL-guarded. Single-row output — at
    100 TB this is a pure scan + one broadcast-sized join, no state."""
    docs = _table(spark, sf_dir, "documents")
    scores = tx.hashed_linear_score(docs).select("doc_id", "logit")
    surv = tx.c4_filter_survivors(docs).select(
        "doc_id", F.lit(1).alias("__pass")
    )
    j = scores.join(surv.hint("shuffle_hash"), "doc_id", "left").select(
        F.when(F.col("logit") >= 0.0, 1).otherwise(0).alias("__pred"),
        F.coalesce(F.col("__pass"), F.lit(0)).alias("__y"),
    )
    c = j.agg(
        F.sum(F.col("__pred") * F.col("__y")).cast("long").alias("tp"),
        F.sum(F.col("__pred") * (F.lit(1) - F.col("__y"))).cast("long").alias("fp"),
        F.sum((F.lit(1) - F.col("__pred")) * F.col("__y")).cast("long").alias("fn"),
        F.sum((F.lit(1) - F.col("__pred")) * (F.lit(1) - F.col("__y"))).cast("long").alias("tn"),
    )
    tp = F.col("tp").cast("double")
    fp = F.col("fp").cast("double")
    fn = F.col("fn").cast("double")
    tn = F.col("tn").cast("double")
    mcc_den = F.sqrt(((tp + fp) * (tp + fn)) * ((tn + fp) * (tn + fn)))
    return c.select(
        "tp", "fp", "fn", "tn",
        F.when(F.col("tp") + F.col("fp") > 0, rd(tp / (tp + fp), 6)).alias("prec"),
        F.when(F.col("tp") + F.col("fn") > 0, rd(tp / (tp + fn), 6)).alias("recall"),
        F.when(
            F.lit(2) * F.col("tp") + F.col("fp") + F.col("fn") > 0,
            rd((F.lit(2.0) * tp) / (F.lit(2.0) * tp + fp + fn), 6),
        ).alias("f1"),
        rd((tp + tn) / (tp + fp + fn + tn), 6).alias("accuracy"),
        F.when(
            (F.col("tp") + F.col("fp") > 0)
            & (F.col("tp") + F.col("fn") > 0)
            & (F.col("tn") + F.col("fp") > 0)
            & (F.col("tn") + F.col("fn") > 0),
            rd((tp * tn - fp * fn) / mcc_den, 6),
        ).alias("mcc"),
    )


@register(
    "stats_bh_fdr_ks_by_type",
    f"""
    WITH ev AS (
      SELECT event_type, epoch_us(ts) AS us, value AS v
      FROM events WHERE value IS NOT NULL
    ),
    rng AS (SELECT min(us) AS u0, max(us) AS u1 FROM ev),
    f AS (
      SELECT event_type, v,
             CASE WHEN us <= (u0 + u1) // 2 THEN 1 ELSE 0 END AS isa
      FROM ev CROSS JOIN rng
    ),
    r AS (
      SELECT event_type, v,
             sum(isa) OVER (PARTITION BY event_type ORDER BY v
                            ROWS UNBOUNDED PRECEDING) AS ca,
             sum(1 - isa) OVER (PARTITION BY event_type ORDER BY v
                                ROWS UNBOUNDED PRECEDING) AS cb,
             sum(isa) OVER (PARTITION BY event_type) AS na,
             sum(1 - isa) OVER (PARTITION BY event_type) AS nb,
             lead(v) OVER (PARTITION BY event_type ORDER BY v) AS nv
      FROM f
    ),
    l AS (SELECT * FROM r WHERE nv IS NULL OR nv <> v),
    m AS (
      SELECT event_type,
             max(abs(CAST(ca AS DECIMAL(38,0)) * nb
                     - CAST(cb AS DECIMAL(38,0)) * na)) AS dnum,
             max(na) AS n_a, max(nb) AS n_b
      FROM l GROUP BY event_type
    ),
    k AS (
      SELECT event_type,
             CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
             {R("CAST(dnum AS DOUBLE) / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE))", 6)} AS ks_stat
      FROM m WHERE n_a > 0 AND n_b > 0
    ),
    p AS (
      SELECT event_type, n_a, n_b, ks_stat,
             {R("least(1.0, 2.0 * exp(-2.0 * ((ks_stat * ks_stat) * ((CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)) / (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE))))))", 8)} AS p_value
      FROM k
    ),
    rr AS (
      SELECT *, row_number() OVER (ORDER BY p_value, event_type) AS rn,
             count(*) OVER () AS mm
      FROM p
    ),
    q AS (
      SELECT event_type, n_a, n_b, ks_stat, p_value,
             {R("least(1.0, min((p_value * CAST(mm AS DOUBLE)) / CAST(rn AS DOUBLE)) OVER (ORDER BY rn ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))", 8)} AS q_value
      FROM rr
    )
    SELECT event_type, n_a, n_b, ks_stat, p_value, q_value,
           CAST(CASE WHEN q_value <= 0.05 THEN 1 ELSE 0 END AS INTEGER) AS discovery
    FROM q
    """,
)
def _q_stats_bh_fdr_ks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MULTIPLE-TESTING control over the drift family: the per-type
    KS drift test (identical exact-integer statistic as
    `stats_ks_halves_by_type`) promoted from one critical value to
    asymptotic p-values (p = 2·exp(−2·d²·n_a·n_b/(n_a+n_b)), computed
    from the 6-dp-rounded stat so both engines exponentiate the same
    double) with BENJAMINI-HOCHBERG step-up q-values across the m
    types — the correction a monitoring pipeline needs the moment it
    runs the drift test per segment × per day (at 100 TB that is
    thousands of simultaneous tests; per-test α would page on noise
    every night). q_i = min(1, min_{{j≥i}} p_(j)·m/j) is computed
    WITHOUT a keyless window: the per-type rows (≤|types|) collect
    into ONE sorted array and an O(m²) `F.transform` over index
    suffixes takes the running min — the eval-family
    collect-list-and-fold pattern, all JVM-side. Tie order between
    equal p-values provably cannot change q (equal p at ranks i<j
    share the suffix min), so the sort key needs no tiebreak for
    value agreement. Output: stat, p, q (8-dp), FDR-0.05 discovery
    flag per type."""
    ev = _events(spark, sf_dir).filter(F.col("value").isNotNull())
    us = event_micros(ev)
    base = ev.select("event_type", us.alias("__us"), F.col("value").alias("__v"))
    rng = base.agg(F.min("__us").alias("__u0"), F.max("__us").alias("__u1"))
    flagged = base.crossJoin(F.broadcast(rng)).select(
        "event_type",
        "__v",
        F.when(F.col("__us") <= F.expr("(__u0 + __u1) DIV 2"), 1)
        .otherwise(0)
        .alias("__isa"),
    )
    w = Window.partitionBy("event_type").orderBy(F.col("__v").asc())
    wcum = w.rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.partitionBy("event_type")
    r = flagged.select(
        "event_type",
        "__v",
        F.sum("__isa").over(wcum).alias("__ca"),
        F.sum(F.lit(1) - F.col("__isa")).over(wcum).alias("__cb"),
        F.sum("__isa").over(wall).alias("__na"),
        F.sum(F.lit(1) - F.col("__isa")).over(wall).alias("__nb"),
        F.lead("__v").over(w).alias("__nv"),
    )
    last = r.filter(F.col("__nv").isNull() | (F.col("__nv") != F.col("__v")))
    num = F.abs(
        F.col("__ca").cast("decimal(38,0)") * F.col("__nb")
        - F.col("__cb").cast("decimal(38,0)") * F.col("__na")
    )
    m = last.groupBy("event_type").agg(
        F.max(num).alias("__dnum"),
        F.max("__na").alias("__fna"),
        F.max("__nb").alias("__fnb"),
    ).filter((F.col("__fna") > 0) & (F.col("__fnb") > 0))
    na_d = F.col("__fna").cast("double")
    nb_d = F.col("__fnb").cast("double")
    ks = rd(F.col("__dnum").cast("double") / (na_d * nb_d), 6)
    pval = rd(
        F.least(
            F.lit(1.0),
            F.lit(2.0)
            * F.exp(
                F.lit(-2.0) * ((ks * ks) * ((na_d * nb_d) / (na_d + nb_d)))
            ),
        ),
        8,
    )
    per = m.select(
        pval.alias("p"),
        F.col("event_type"),
        ks.alias("ks_stat"),
        F.col("__fna").cast("long").alias("n_a"),
        F.col("__fnb").cast("long").alias("n_b"),
    )
    row = per.agg(
        F.sort_array(
            F.collect_list(
                F.struct("p", "event_type", "ks_stat", "n_a", "n_b")
            )
        ).alias("__arr")
    )
    arr = F.col("__arr")
    mm = F.size(arr).cast("double")
    qarr = F.transform(
        F.sequence(F.lit(1), F.size(arr)),
        lambda i: rd(
            F.least(
                F.lit(1.0),
                F.array_min(
                    F.transform(
                        F.sequence(i, F.size(arr)),
                        lambda j: (F.element_at(arr, j)["p"] * mm)
                        / j.cast("double"),
                    )
                ),
            ),
            8,
        ),
    )
    z = row.select(F.explode(F.arrays_zip(arr, qarr.alias("__q"))).alias("__z"))
    return z.select(
        F.col("__z.__arr.event_type").alias("event_type"),
        F.col("__z.__arr.n_a").alias("n_a"),
        F.col("__z.__arr.n_b").alias("n_b"),
        F.col("__z.__arr.ks_stat").alias("ks_stat"),
        F.col("__z.__arr.p").alias("p_value"),
        F.col("__z.__q").alias("q_value"),
        F.when(F.col("__z.__q") <= 0.05, 1).otherwise(0).cast("int").alias("discovery"),
    )


@register(
    "mix_doremi_step",
    f"""
    WITH w AS (
      SELECT doc_id,
             list_filter(string_split(trim(text), ' '), x -> length(x) > 0) AS ws
      FROM documents WHERE text IS NOT NULL
    ),
    s AS (
      SELECT doc_id, len(ws) AS n,
             list_aggregate(list_transform(ws, t ->
               CAST({R("(('0x' || substr(md5('tsdt|hls' || '|' || t), 1, 8))::BIGINT) / 4294967296.0 - 0.5", 6)} AS DECIMAL(20,6))
             ), 'sum') AS tot
      FROM w WHERE len(ws) > 0
    ),
    sc AS (SELECT doc_id, {R("CAST(tot AS DOUBLE) / n", 6)} AS logit FROM s),
    d AS (
      SELECT doc.source,
             CAST(ceil(length(coalesce(doc.text, '')) / 4.0) AS BIGINT) AS nt,
             sc.logit
      FROM documents doc JOIN sc ON sc.doc_id = doc.doc_id
    ),
    per AS (
      SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(nt) AS BIGINT) AS tokens,
             sum(CAST(logit AS DECIMAL(38,6))) AS slog
      FROM d GROUP BY source
    ),
    tot AS (SELECT sum(tokens) AS tt FROM per),
    p2 AS (
      SELECT source, n_docs, tokens,
             {R("CAST(tokens AS DOUBLE) / CAST(tt AS DOUBLE)", 8)} AS share,
             {R("(-(CAST(slog AS DOUBLE))) / CAST(n_docs AS DOUBLE)", 8)} AS loss
      FROM per CROSS JOIN tot
    ),
    refc AS (SELECT sum(CAST({R("share * loss", 12)} AS DECIMAL(38,12))) AS r FROM p2),
    p3 AS (
      SELECT p2.*, {R(f"loss - {R('CAST(r AS DOUBLE)', 8)}", 8)} AS excess
      FROM p2 CROSS JOIN refc
    ),
    p4 AS (SELECT p3.*, {R("share * exp(excess)", 8)} AS wraw FROM p3),
    ws2 AS (SELECT sum(CAST(wraw AS DECIMAL(38,8))) AS wsum FROM p4)
    SELECT source, n_docs, tokens, share, loss AS proxy_loss, excess,
           {R("wraw / CAST(wsum AS DOUBLE)", 6)} AS weight
    FROM p4 CROSS JOIN ws2
    """,
)
def _q_mix_doremi_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DOMAIN REWEIGHTING, DoReMi-shaped: one exponentiated-gradient
    step on per-source mixture weights from per-source EXCESS LOSS —
    the principled alternative to hand-tuned source weights
    (`mix_temperature_sample` is the heuristic member; this is the
    optimizer member the DoReMi paper distills a proxy run into).
    Loss proxy: the negated mean hashed-linear quality logit per
    source (one scan, the eval family's scorer — swap in real proxy-
    model NLL by replacing one column); reference loss: the token-
    share-weighted mixture mean, so excess_s = loss_s − Σ share·loss
    is positive exactly for harder-than-mixture domains, which EG
    then upweights: w'_s ∝ share_s·exp(η·excess_s), η=1, normalized.
    Determinism: every float is rounded to a fixed grid BEFORE the
    next stage consumes it (losses/shares 8-dp, share·loss terms
    12-dp decimal-summed, exp terms 8-dp decimal-summed, final weight
    6-dp), so both engines fold identical doubles; the three mixture
    scalars attach via sanctioned 1-row broadcast cross joins. Plan:
    one document scan + one source-keyed exchange, then |sources|-row
    arithmetic — at 100 TB the cost is the scan, the EG step is
    free."""
    docs = _table(spark, sf_dir, "documents")
    scores = tx.hashed_linear_score(docs).select("doc_id", "logit")
    base = docs.select(
        "doc_id",
        "source",
        F.ceil(
            F.length(F.coalesce(F.col("text"), F.lit(""))) / F.lit(4.0)
        ).cast("long").alias("__nt"),
    ).join(scores.hint("shuffle_hash"), "doc_id")
    per = base.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("__nt").cast("long").alias("tokens"),
        F.sum(F.col("logit").cast("decimal(38,6)")).alias("__slog"),
    )
    tot = per.agg(F.sum("tokens").alias("__tt"))
    p2 = per.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_docs",
        "tokens",
        rd(F.col("tokens").cast("double") / F.col("__tt").cast("double"), 8).alias("share"),
        rd(
            (-(F.col("__slog").cast("double"))) / F.col("n_docs").cast("double"),
            8,
        ).alias("loss"),
    )
    ref = p2.agg(
        F.sum(rd(F.col("share") * F.col("loss"), 12).cast("decimal(38,12)")).alias("__r")
    )
    p3 = p2.crossJoin(F.broadcast(ref)).select(
        "source", "n_docs", "tokens", "share", "loss",
        rd(F.col("loss") - rd(F.col("__r").cast("double"), 8), 8).alias("excess"),
    )
    p4 = p3.select(
        "*", rd(F.col("share") * F.exp(F.col("excess")), 8).alias("__wraw")
    )
    wsum = p4.agg(F.sum(F.col("__wraw").cast("decimal(38,8)")).alias("__ws"))
    return p4.crossJoin(F.broadcast(wsum)).select(
        "source",
        "n_docs",
        "tokens",
        "share",
        F.col("loss").alias("proxy_loss"),
        "excess",
        rd(F.col("__wraw") / F.col("__ws").cast("double"), 6).alias("weight"),
    )


@register(
    "ts_hampel_filter",
    f"""
    WITH e AS (
      SELECT event_id, user_id, event_type, ts, value AS v
      FROM events WHERE value IS NOT NULL
    ),
    fr AS (
      SELECT event_id, user_id, event_type, v,
             list_sort(list(v) OVER (
               PARTITION BY user_id, event_type ORDER BY ts, event_id
               ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)) AS arr
      FROM e
    ),
    md AS (
      SELECT event_id, user_id, event_type, v, arr,
             (arr[CAST(floor((len(arr) + 1) / 2) AS INT)]
              + arr[CAST(floor(len(arr) / 2) AS INT) + 1]) / 2.0 AS med
      FROM fr
    ),
    dv AS (
      SELECT event_id, user_id, event_type, v, med,
             list_sort(list_transform(arr, x -> abs(x - med))) AS arr2
      FROM md
    ),
    mz AS (
      SELECT event_id, user_id, event_type, v, med,
             (arr2[CAST(floor((len(arr2) + 1) / 2) AS INT)]
              + arr2[CAST(floor(len(arr2) / 2) AS INT) + 1]) / 2.0 AS mad
      FROM dv
    )
    SELECT event_id, user_id, event_type,
           {R("med", 6)} AS med,
           {R("mad", 6)} AS mad,
           CAST(CASE WHEN abs(v - med) > 3.0 * (1.4826 * mad) THEN 1 ELSE 0 END AS INTEGER) AS is_outlier,
           {R("CASE WHEN abs(v - med) > 3.0 * (1.4826 * mad) THEN med ELSE v END", 6)} AS filtered
    FROM mz
    """,
)
def _q_ts_hampel_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HAMPEL FILTER — the robust despiking standard for sensor
    streams: a centered 7-row window per event type, the window
    MEDIAN as the local level and the window MAD (median absolute
    deviation, ×1.4826 for Gaussian consistency) as the robust sigma;
    a point farther than 3σ̂ from the local median is an outlier and
    is REPLACED by it. The robust sibling of a Bollinger/z-score
    despiker: one spike cannot inflate its own rejection threshold
    the way it inflates a rolling stddev (`ts_mad_outliers` is the
    GLOBAL member; this is the rolling one). Built exactly like
    `f2_rolling_median`: the frame collects into a sorted array once,
    the median AND the MAD (a second sort over the absolute
    deviations from that median — a pure array expression, no second
    window) both come off it, edges shrink naturally. The window keys on (user_id,
    event_type) — per-ENTITY series, so partition count scales with
    the data (a type-keyed window would leave |types| tasks at
    100 TB) and each frame stays O(7). Interpolated (mean-of-middle-pair) medians keep
    both engines on the same rational."""
    ev = (
        _events(spark, sf_dir)
        .filter(F.col("value").isNotNull())
        .select("event_id", "user_id", "event_type", "ts", F.col("value").alias("__v"))
    )
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    arr = F.sort_array(F.collect_list("__v").over(w.rowsBetween(-3, 3)))
    fr = ev.select("event_id", "user_id", "event_type", "__v", arr.alias("__arr"))

    def _med(a):
        n = F.size(a)
        lo = F.element_at(a, F.floor((n + F.lit(1)) / F.lit(2)).cast("int"))
        hi = F.element_at(a, F.floor(n / F.lit(2)).cast("int") + F.lit(1))
        return (lo + hi) / F.lit(2.0)

    md = fr.select(
        "event_id", "user_id", "event_type", "__v", "__arr", _med(F.col("__arr")).alias("__med")
    )
    arr2 = F.sort_array(
        F.transform(F.col("__arr"), lambda x: F.abs(x - F.col("__med")))
    )
    mz = md.select(
        "event_id", "user_id", "event_type", "__v", "__med", _med(arr2).alias("__mad")
    )
    hit = F.abs(F.col("__v") - F.col("__med")) > F.lit(3.0) * (
        F.lit(1.4826) * F.col("__mad")
    )
    return mz.select(
        "event_id",
        "user_id",
        "event_type",
        rd(F.col("__med"), 6).alias("med"),
        rd(F.col("__mad"), 6).alias("mad"),
        F.when(hit, 1).otherwise(0).cast("int").alias("is_outlier"),
        rd(F.when(hit, F.col("__med")).otherwise(F.col("__v")), 6).alias("filtered"),
    )


@register(
    "emb_centroid_shift_by_label",
    f"""
    WITH ex AS (
      SELECT vec_id, label, u['i'] - 1 AS i, CAST(u['v'] AS DOUBLE) AS x,
             vec_id % 2 AS half
      FROM (SELECT vec_id, label,
                   unnest(list_transform(embedding, (x, i) -> {{'v': x, 'i': i}})) AS u
            FROM embeddings)
    ),
    m AS (
      SELECT label, i, half,
             {R("CAST(sum(CAST(" + sql_rd("x", 9) + " AS DECIMAL(38,9))) AS DOUBLE) / count(*)", 9)} AS m,
             count(*) AS n
      FROM ex GROUP BY label, i, half
    ),
    piv AS (
      SELECT label, i,
             max(CASE WHEN half = 0 THEN m END) AS a,
             max(CASE WHEN half = 1 THEN m END) AS b,
             max(CASE WHEN half = 0 THEN n END) AS na,
             max(CASE WHEN half = 1 THEN n END) AS nb
      FROM m GROUP BY label, i
    ),
    ok2 AS (SELECT * FROM piv WHERE a IS NOT NULL AND b IS NOT NULL),
    agg AS (
      SELECT label,
             CAST(max(na) AS BIGINT) AS n_a, CAST(max(nb) AS BIGINT) AS n_b,
             CAST(sum(CAST({R("a * b", 12)} AS DECIMAL(38,12))) AS DOUBLE) AS dot,
             CAST(sum(CAST({R("a * a", 12)} AS DECIMAL(38,12))) AS DOUBLE) AS naa,
             CAST(sum(CAST({R("b * b", 12)} AS DECIMAL(38,12))) AS DOUBLE) AS nbb,
             CAST(sum(CAST({R("(a - b) * (a - b)", 12)} AS DECIMAL(38,12))) AS DOUBLE) AS sh2
      FROM ok2 GROUP BY label
    )
    SELECT label, n_a, n_b,
           {R("dot / (sqrt(naa) * sqrt(nbb))", 6)} AS centroid_cosine,
           {R("sqrt(sh2)", 6)} AS l2_shift
    FROM agg
    """,
)
def _q_emb_centroid_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EMBEDDING DRIFT detector — the check a retrieval/dedup owner
    runs after re-embedding a corpus with a new model checkpoint or
    ingesting a new batch: split each label's vectors into two
    deterministic halves (vec_id parity standing in for
    old-batch/new-batch), mean-pool each half (the proven
    `emb_mean_pool_by_label` decimal-exact per-dimension pattern),
    and compare the two centroids per label by cosine and L2 shift.
    Centroid cosine ≈ 1 and small L2 → the space is stable and ANN
    index parameters / dedup thresholds transfer; a label whose
    halves disagree flags re-tuning BEFORE recall silently degrades
    (the drift sibling of `emb_ood_zscore_by_label`, which scores
    points, not the space). Plan: one explode + one (label, dim,
    half)-keyed decimal mean — vectors never shuffle whole — then a
    64-row-per-label pivot and one label agg; every sum
    order-independent via fixed-grid rounding + decimal
    accumulation. |labels|-row output."""
    emb = _table(spark, sf_dir, "embeddings")
    ex = emb.select(
        "vec_id", "label", F.posexplode("embedding").alias("i", "__xf")
    ).select(
        "label",
        "i",
        F.col("__xf").cast("double").alias("__x"),
        (F.col("vec_id") % 2).alias("__half"),
    )
    m = ex.groupBy("label", "i", "__half").agg(
        rd(
            F.sum(rd(F.col("__x"), 9).cast("decimal(38,9)")).cast("double")
            / F.count(F.lit(1)),
            9,
        ).alias("__m"),
        F.count(F.lit(1)).alias("__n"),
    )
    piv = m.groupBy("label", "i").agg(
        F.max(F.when(F.col("__half") == 0, F.col("__m"))).alias("__a"),
        F.max(F.when(F.col("__half") == 1, F.col("__m"))).alias("__b"),
        F.max(F.when(F.col("__half") == 0, F.col("__n"))).alias("__na"),
        F.max(F.when(F.col("__half") == 1, F.col("__n"))).alias("__nb"),
    ).filter(F.col("__a").isNotNull() & F.col("__b").isNotNull())

    def _ds12(term):
        return F.sum(rd(term, 12).cast("decimal(38,12)")).cast("double")

    agg = piv.groupBy("label").agg(
        F.max("__na").cast("long").alias("n_a"),
        F.max("__nb").cast("long").alias("n_b"),
        _ds12(F.col("__a") * F.col("__b")).alias("__dot"),
        _ds12(F.col("__a") * F.col("__a")).alias("__naa"),
        _ds12(F.col("__b") * F.col("__b")).alias("__nbb"),
        _ds12((F.col("__a") - F.col("__b")) * (F.col("__a") - F.col("__b"))).alias("__sh2"),
    )
    return agg.select(
        "label",
        "n_a",
        "n_b",
        rd(
            F.col("__dot") / (F.sqrt(F.col("__naa")) * F.sqrt(F.col("__nbb"))), 6
        ).alias("centroid_cosine"),
        rd(F.sqrt(F.col("__sh2")), 6).alias("l2_shift"),
    )


@register(
    "graph_hits_scores",
    f"""
    WITH ed AS (
      SELECT user_id, event_type, CAST(count(*) AS DOUBLE) AS c
      FROM events GROUP BY user_id, event_type
    ),
    t0 AS (SELECT DISTINCT event_type FROM ed),
    ntc AS (SELECT count(*) AS nt FROM t0),
    a0 AS (SELECT event_type, {R("1.0 / nt", 12)} AS a FROM t0 CROSS JOIN ntc),
    h1r AS (
      SELECT user_id, CAST(sum(CAST({R("c * a", 12)} AS DECIMAL(38,12))) AS DOUBLE) AS h
      FROM ed JOIN a0 USING (event_type) GROUP BY user_id
    ),
    h1s AS (SELECT CAST(sum(CAST({R("h", 12)} AS DECIMAL(38,12))) AS DOUBLE) AS s FROM h1r),
    h1 AS (SELECT user_id, {R("h / s", 12)} AS h FROM h1r CROSS JOIN h1s),
    a1r AS (
      SELECT event_type, CAST(sum(CAST({R("c * h", 12)} AS DECIMAL(38,12))) AS DOUBLE) AS a
      FROM ed JOIN h1 USING (user_id) GROUP BY event_type
    ),
    a1s AS (SELECT CAST(sum(CAST({R("a", 12)} AS DECIMAL(38,12))) AS DOUBLE) AS s FROM a1r),
    a1 AS (SELECT event_type, {R("a / s", 12)} AS a FROM a1r CROSS JOIN a1s),
    h2r AS (
      SELECT user_id, CAST(sum(CAST({R("c * a", 12)} AS DECIMAL(38,12))) AS DOUBLE) AS h
      FROM ed JOIN a1 USING (event_type) GROUP BY user_id
    ),
    h2s AS (SELECT CAST(sum(CAST({R("h", 12)} AS DECIMAL(38,12))) AS DOUBLE) AS s FROM h2r),
    h2 AS (SELECT user_id, {R("h / s", 12)} AS h FROM h2r CROSS JOIN h2s),
    a2r AS (
      SELECT event_type, CAST(sum(CAST({R("c * h", 12)} AS DECIMAL(38,12))) AS DOUBLE) AS a
      FROM ed JOIN h2 USING (user_id) GROUP BY event_type
    ),
    a2s AS (SELECT CAST(sum(CAST({R("a", 12)} AS DECIMAL(38,12))) AS DOUBLE) AS s FROM a2r),
    a2 AS (SELECT event_type, {R("a / s", 12)} AS a FROM a2r CROSS JOIN a2s),
    nu AS (SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS n_users FROM ed GROUP BY event_type)
    SELECT a2.event_type, nu.n_users,
           {R("a2.a", 6)} AS authority,
           {R("a2.a - a1.a", 6)} AS delta_last_iter
    FROM a2 JOIN a1 ON a1.event_type = a2.event_type
    JOIN nu ON nu.event_type = a2.event_type
    """,
)
def _q_graph_hits_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS (Kleinberg hubs-and-authorities) on the user ↔ event-type
    bipartite engagement graph — the mutual-reinforcement ranking
    member of the graph family next to `graph_pagerank_user_concurrency`
    (random-walk member): an event type is AUTHORITATIVE when heavy
    multi-type users (hubs) engage with it, a user is a hub when they
    engage with authoritative types — the structure simple count
    ranking misses (a type with many single-type drive-by users
    outranks on counts but not on authority). Two fixed power-iteration
    rounds with L1 normalization after every half-step (fixed-round =
    the `graph_kcore_bound` contract: a deep-cascade-independent,
    plan-depth-bounded screen; `delta_last_iter` reports residual
    movement so the reader sees convergence). Exactness: every Σ c·x
    rounds terms to the 12-dp grid and accumulates in decimal, every
    normalization scalar attaches as a sanctioned 1-row broadcast —
    both engines fold identical doubles at every half-step. Plan: one
    (user,type) edge agg, then per round one broadcast join + type agg
    and one user-keyed shuffle-hash join + user agg — all keyed, no
    iteration-count data dependence."""
    ev = _events(spark, sf_dir)
    ed = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).cast("double").alias("__c")
    )

    def _ds12(term):
        return F.sum(rd(term, 12).cast("decimal(38,12)")).cast("double")

    t0 = ed.select("event_type").distinct()
    ntc = t0.agg(F.count(F.lit(1)).alias("__nt"))
    a = t0.crossJoin(F.broadcast(ntc)).select(
        "event_type", rd(F.lit(1.0) / F.col("__nt"), 12).alias("__a")
    )
    a_prev = None
    for _ in range(2):
        hr = (
            ed.join(F.broadcast(a), "event_type")
            .groupBy("user_id")
            .agg(_ds12(F.col("__c") * F.col("__a")).alias("__h"))
        )
        hs = hr.agg(_ds12(F.col("__h")).alias("__s"))
        h = hr.crossJoin(F.broadcast(hs)).select(
            "user_id", rd(F.col("__h") / F.col("__s"), 12).alias("__h")
        )
        ar = (
            ed.join(h.hint("shuffle_hash"), "user_id")
            .groupBy("event_type")
            .agg(_ds12(F.col("__c") * F.col("__h")).alias("__ar"))
        )
        asum = ar.agg(_ds12(F.col("__ar")).alias("__s"))
        a_prev = a
        a = ar.crossJoin(F.broadcast(asum)).select(
            "event_type", rd(F.col("__ar") / F.col("__s"), 12).alias("__a")
        )
    nu = ed.groupBy("event_type").agg(
        F.countDistinct("user_id").cast("long").alias("n_users")
    )
    prev = a_prev.select("event_type", F.col("__a").alias("__ap"))
    return (
        a.join(F.broadcast(prev), "event_type")
        .join(F.broadcast(nu), "event_type")
        .select(
            "event_type",
            "n_users",
            rd(F.col("__a"), 6).alias("authority"),
            rd(F.col("__a") - F.col("__ap"), 6).alias("delta_last_iter"),
        )
    )


@register(
    "retrieval_prf_expansion",
    f"""
    WITH toks AS (
      SELECT doc_id, t.token
      FROM documents,
           LATERAL (SELECT unnest(string_split(trim(text), ' ')) AS token) t
      WHERE len(t.token) > 0
    ),
    dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
    stats AS (
      SELECT count(*) AS n_docs,
             CAST(sum(dl) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avgdl
      FROM dl
    ),
    tf1 AS (
      SELECT doc_id, token, count(*) AS tf
      FROM toks WHERE token IN ('spark', 'window', 'join')
      GROUP BY doc_id, token
    ),
    dfreq1 AS (SELECT token, count(*) AS doc_freq FROM tf1 GROUP BY token),
    scored1 AS (
      SELECT t.doc_id,
             CAST({sql_rd(
                 "((CAST(s.n_docs AS DOUBLE) - CAST(d.doc_freq AS DOUBLE) + 0.5)"
                 " / (CAST(d.doc_freq AS DOUBLE) + 0.5))"
                 " * (CAST(t.tf AS DOUBLE) * 2.2)"
                 " / (CAST(t.tf AS DOUBLE)"
                 "    + 1.2 * (0.25 + 0.75 * CAST(l.dl AS DOUBLE) / s.avgdl))",
                 9,
             )} AS DECIMAL(38,9)) AS s
      FROM tf1 t
      JOIN dfreq1 d ON d.token = t.token
      JOIN dl l ON l.doc_id = t.doc_id
      CROSS JOIN stats s
    ),
    fb AS (
      SELECT doc_id FROM (
        SELECT doc_id, {R("CAST(sum(s) AS DOUBLE)", 6)} AS score
        FROM scored1 GROUP BY doc_id
        ORDER BY score DESC, doc_id ASC LIMIT 5
      )
    ),
    cand AS (
      SELECT t.token, count(*) AS fbtf
      FROM toks t JOIN fb ON fb.doc_id = t.doc_id
      WHERE len(t.token) >= 3 AND t.token NOT IN ('spark', 'window', 'join')
      GROUP BY t.token
    ),
    cdf AS (
      SELECT token, count(DISTINCT doc_id) AS doc_freq
      FROM toks WHERE token IN (SELECT token FROM cand)
      GROUP BY token
    ),
    exp AS (
      SELECT token, 0.5 AS w FROM (
        SELECT c.token AS token,
               {sql_rd(
                   "CAST(c.fbtf AS DOUBLE)"
                   " * ((CAST(s.n_docs AS DOUBLE) - CAST(cd.doc_freq AS DOUBLE) + 0.5)"
                   " / (CAST(cd.doc_freq AS DOUBLE) + 0.5))",
                   9,
               )} AS escore
        FROM cand c JOIN cdf cd ON cd.token = c.token
        CROSS JOIN stats s
        ORDER BY escore DESC, c.token ASC LIMIT 3
      )
    ),
    qterms AS (
      SELECT token, 1.0 AS w FROM (VALUES ('spark'), ('window'), ('join')) v(token)
      UNION ALL
      SELECT token, w FROM exp
    ),
    tf2 AS (
      SELECT doc_id, token, count(*) AS tf
      FROM toks WHERE token IN (SELECT token FROM qterms)
      GROUP BY doc_id, token
    ),
    dfreq2 AS (SELECT token, count(*) AS doc_freq FROM tf2 GROUP BY token),
    scored2 AS (
      SELECT t.doc_id,
             CAST({sql_rd(
                 "q.w * (((CAST(s.n_docs AS DOUBLE) - CAST(d.doc_freq AS DOUBLE) + 0.5)"
                 " / (CAST(d.doc_freq AS DOUBLE) + 0.5))"
                 " * (CAST(t.tf AS DOUBLE) * 2.2)"
                 " / (CAST(t.tf AS DOUBLE)"
                 "    + 1.2 * (0.25 + 0.75 * CAST(l.dl AS DOUBLE) / s.avgdl)))",
                 9,
             )} AS DECIMAL(38,9)) AS s
      FROM tf2 t
      JOIN dfreq2 d ON d.token = t.token
      JOIN qterms q ON q.token = t.token
      JOIN dl l ON l.doc_id = t.doc_id
      CROSS JOIN stats s
    )
    SELECT doc_id,
           count(*) AS n_terms_matched,
           {R("CAST(sum(s) AS DOUBLE)", 6)} AS score
    FROM scored2 GROUP BY doc_id
    ORDER BY score DESC, doc_id ASC
    LIMIT 20
    """,
)
def _q_retrieval_prf_expansion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PSEUDO-RELEVANCE-FEEDBACK retrieval (`tx.bm25_prf_topk`) for
    the query "spark window join": round-1 BM25 top-5 become the
    feedback set, their 3 strongest new terms (feedback tf × the same
    un-logged rarity ratio, len≥3, originals excluded) join the query
    at Rocchio weight β=0.5, and the corpus is rescored — the classic
    recall move for short queries, completing the retrieval family
    (BM25 = lexical, chunk_topk = granular, MMR = diversity, RRF =
    fusion, PRF = expansion). Both retrieval rounds keep BM25's scale
    shape — query-term semi-join ON the token scan, narrow (doc,
    term) shuffles, 1-row stats broadcast, TakeOrdered cuts — and the
    feedback/expansion tables stay in-plan as bounded broadcasts
    (never collected). Weighted per-term scores round to 9 dp and
    accumulate in decimal; every cut orders by rounded score then
    id/token."""
    return tx.bm25_prf_topk(
        _table(spark, sf_dir, "documents"),
        query_terms=_BM25_TERMS,
        k=20, fb_docs=5, fb_terms=3, beta=0.5,
        k1=_BM25_K1, b=_BM25_B,
    )


@register(
    "stats_cramers_v_pairs",
    f"""
    WITH base AS (
      SELECT event_type,
             CAST((epoch_us(ts) // 3600000000) % 24 AS VARCHAR) AS hod,
             CAST((epoch_us(ts) // 86400000000 + 4) % 7 AS VARCHAR) AS dow
      FROM events
    ),
    m AS (
      SELECT 'type_x_hod' AS pair, event_type AS x, hod AS y FROM base
      UNION ALL SELECT 'type_x_dow', event_type, dow FROM base
      UNION ALL SELECT 'hod_x_dow', hod, dow FROM base
    ),
    o AS (SELECT pair, x, y, count(*) AS obs FROM m GROUP BY 1, 2, 3),
    rt AS (SELECT pair, x, sum(obs) AS rtot FROM o GROUP BY pair, x),
    ct AS (SELECT pair, y, sum(obs) AS ctot FROM o GROUP BY pair, y),
    g AS (SELECT pair, sum(obs) AS total FROM o GROUP BY pair),
    grid AS (
      SELECT rt.pair, rt.x, ct.y, rt.rtot, ct.ctot
      FROM rt JOIN ct ON ct.pair = rt.pair
    ),
    cells AS (
      SELECT gr.pair, COALESCE(o.obs, 0) AS obs,
             CAST(gr.rtot AS DOUBLE) * gr.ctot / g.total AS expected,
             gr.x, gr.y
      FROM grid gr
      LEFT JOIN o ON o.pair = gr.pair AND o.x = gr.x AND o.y = gr.y
      JOIN g ON g.pair = gr.pair
    ),
    agg AS (
      SELECT pair,
             CAST(sum(CAST({sql_rd(
                 "(obs - expected) * (obs - expected) / expected", 6
             )} AS DECIMAL(38,6))) AS DOUBLE) AS chi2,
             count(DISTINCT x) AS r, count(DISTINCT y) AS c,
             sum(obs) AS n
      FROM cells GROUP BY pair
    )
    SELECT pair,
           {R("chi2", 6)} AS chi2,
           CAST((r - 1) * (c - 1) AS BIGINT) AS dof,
           CAST(n AS BIGINT) AS n,
           CASE WHEN least(r - 1, c - 1) > 0 THEN
             {R("sqrt(chi2 / (CAST(n AS DOUBLE) * least(r - 1, c - 1)))", 6)}
           END AS cramers_v
    FROM agg
    """,
)
def _q_stats_cramers_v_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CRAMÉR'S V association panel over the categorical column pairs
    (event_type × hour-of-day, event_type × day-of-week, hour × dow)
    — `stats_chi2_type_vs_hour` generalized from one raw statistic to
    the NORMALIZED effect size a profiler can compare ACROSS pairs
    with different table shapes (chi2 grows with n and dof; V =
    √(χ²/(n·min(r−1,c−1))) ∈ [0,1] does not), which is how a feature-
    selection or leakage audit ranks categorical dependencies. All
    three contingency tables ride ONE unpivoted (pair, x, y) keyed
    aggregation (`stack`, scan-side) + margin joins — no per-pair
    rescan; the margin×margin grid is rebuilt so ZERO cells
    contribute their expected mass (dropping them understates χ² —
    exactly on the drifted slices the test exists for; perfect
    association pins V=1 in pytest); hour/dow are integer epoch buckets (no calendar-locale
    trap between engines); per-cell terms 6-dp-rounded and
    decimal-summed like the chi2 parent. 3-row output."""
    base = _events(spark, sf_dir).select(
        "event_type",
        (F.expr("unix_micros(cast(ts as timestamp)) div 3600000000") % 24)
        .cast("string")
        .alias("hod"),
        ((F.expr("unix_micros(cast(ts as timestamp)) div 86400000000") + 4) % 7)
        .cast("string")
        .alias("dow"),
    )
    m = base.select(
        F.expr(
            "stack(3, 'type_x_hod', event_type, hod,"
            " 'type_x_dow', event_type, dow,"
            " 'hod_x_dow', hod, dow) as (pair, x, y)"
        )
    )
    o = m.groupBy("pair", "x", "y").agg(F.count(F.lit(1)).alias("obs"))
    rt = o.groupBy("pair", "x").agg(F.sum("obs").alias("rtot"))
    ct = o.groupBy("pair", "y").agg(F.sum("obs").alias("ctot"))
    g = o.groupBy("pair").agg(F.sum("obs").alias("total"))
    grid = rt.join(ct.hint("shuffle_hash"), "pair")
    cells = (
        grid.join(o.hint("shuffle_hash"), ["pair", "x", "y"], "left")
        .join(F.broadcast(g), "pair")
        .select(
            "pair",
            F.coalesce(F.col("obs"), F.lit(0)).alias("obs"),
            (F.col("rtot").cast("double") * F.col("ctot") / F.col("total")).alias(
                "expected"
            ),
            "x",
            "y",
        )
    )
    agg = cells.groupBy("pair").agg(
        F.sum(
            rd(
                (F.col("obs") - F.col("expected"))
                * (F.col("obs") - F.col("expected"))
                / F.col("expected"),
                6,
            ).cast("decimal(38,6)")
        )
        .cast("double")
        .alias("__chi2"),
        F.count_distinct(F.col("x")).alias("__r"),
        F.count_distinct(F.col("y")).alias("__c"),
        F.sum("obs").alias("__n"),
    )
    return agg.select(
        "pair",
        rd(F.col("__chi2"), 6).alias("chi2"),
        ((F.col("__r") - 1) * (F.col("__c") - 1)).cast("long").alias("dof"),
        F.col("__n").cast("long").alias("n"),
        F.when(
            F.least(F.col("__r") - 1, F.col("__c") - 1) > 0,
            rd(
                F.sqrt(
                    F.col("__chi2")
                    / (
                        F.col("__n").cast("double")
                        * F.least(F.col("__r") - 1, F.col("__c") - 1)
                    )
                ),
                6,
            ),
        ).alias("cramers_v"),
    )


@register(
    "dq_functional_dependency",
    f"""
    WITH fd1 AS (
      SELECT 'orders.o_orderkey->o_custkey' AS fd,
             count(*) AS n_lhs,
             CAST(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_violating
      FROM (SELECT o_orderkey, count(DISTINCT o_custkey) AS nd
            FROM orders GROUP BY o_orderkey)
    ),
    fd2 AS (
      SELECT 'lineitem.l_orderkey->l_returnflag' AS fd,
             count(*) AS n_lhs,
             CAST(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_violating
      FROM (SELECT l_orderkey, count(DISTINCT l_returnflag) AS nd
            FROM lineitem GROUP BY l_orderkey)
    ),
    fd3 AS (
      SELECT 'lineitem.l_partkey->l_suppkey' AS fd,
             count(*) AS n_lhs,
             CAST(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_violating
      FROM (SELECT l_partkey, count(DISTINCT l_suppkey) AS nd
            FROM lineitem GROUP BY l_partkey)
    ),
    fd4 AS (
      SELECT 'part.p_brand->p_type' AS fd,
             count(*) AS n_lhs,
             CAST(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_violating
      FROM (SELECT p_brand, count(DISTINCT p_type) AS nd
            FROM part GROUP BY p_brand)
    ),
    u AS (
      SELECT * FROM fd1 UNION ALL SELECT * FROM fd2
      UNION ALL SELECT * FROM fd3 UNION ALL SELECT * FROM fd4
    )
    SELECT fd, CAST(n_lhs AS BIGINT) AS n_lhs, n_violating,
           {R("CAST(n_violating AS DOUBLE) / n_lhs", 6)} AS violation_rate,
           CAST(CASE WHEN n_violating = 0 THEN 1 ELSE 0 END AS INTEGER) AS holds
    FROM u
    """,
)
def _q_dq_functional_dependency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FUNCTIONAL-DEPENDENCY audit — the schema-contract member of
    the DQ family (`dq_expectations_report` checks value ranges; this
    checks STRUCTURE): for each candidate FD lhs→rhs, the count of
    lhs values bound to more than one rhs value. Validates key
    contracts (o_orderkey→o_custkey must hold: violation = corrupted
    ingest or a bad merge) and DOCUMENTS true multiplicities the
    optimizer/modeler must not assume away (l_partkey→l_suppkey
    violates by design — multi-sourcing). Each FD is one
    lhs-keyed count-distinct aggregation reduced to a single row —
    map-side combined, four tiny rows unioned; at 100 TB each audit
    is one exchange on its lhs. The FD set is the audit's
    configuration; adding one is one more UNION branch."""
    def _fd(df, name, lhs, rhs):
        nd = df.groupBy(lhs).agg(F.count_distinct(F.col(rhs)).alias("__nd"))
        return nd.agg(
            F.lit(name).alias("fd"),
            F.count(F.lit(1)).cast("long").alias("n_lhs"),
            F.sum(F.when(F.col("__nd") > 1, 1).otherwise(0)).cast("long").alias("n_violating"),
        )

    orders = _table(spark, sf_dir, "orders")
    li = _table(spark, sf_dir, "lineitem")
    part = _table(spark, sf_dir, "part")
    u = (
        _fd(orders, "orders.o_orderkey->o_custkey", "o_orderkey", "o_custkey")
        .unionByName(_fd(li, "lineitem.l_orderkey->l_returnflag", "l_orderkey", "l_returnflag"))
        .unionByName(_fd(li, "lineitem.l_partkey->l_suppkey", "l_partkey", "l_suppkey"))
        .unionByName(_fd(part, "part.p_brand->p_type", "p_brand", "p_type"))
    )
    return u.select(
        "fd",
        "n_lhs",
        "n_violating",
        rd(F.col("n_violating").cast("double") / F.col("n_lhs"), 6).alias(
            "violation_rate"
        ),
        F.when(F.col("n_violating") == 0, 1).otherwise(0).cast("int").alias("holds"),
    )


@register(
    "eval_lift_gains_decile",
    f"""
    WITH {_HLS_VS_C4_SQL},
    b AS (
      SELECT least(CAST(floor((round(sc.logit * 1000000, 0) + 500000)
                               / 100000) AS INT), 9) AS bin,
             CASE WHEN surv.doc_id IS NOT NULL THEN 1 ELSE 0 END AS pass
      FROM sc LEFT JOIN surv ON surv.doc_id = sc.doc_id
    ),
    bins AS (
      SELECT bin, count(*) AS n_docs, sum(pass) AS n_pass
      FROM b GROUP BY bin
    ),
    tot AS (SELECT sum(n_docs) AS tn, sum(n_pass) AS tp FROM bins),
    cum AS (
      SELECT bin, n_docs, n_pass,
             sum(n_docs) OVER (ORDER BY bin DESC
                               ROWS UNBOUNDED PRECEDING) AS cn,
             sum(n_pass) OVER (ORDER BY bin DESC
                               ROWS UNBOUNDED PRECEDING) AS cp
      FROM bins
    )
    SELECT CAST(bin AS INTEGER) AS bin,
           {R("bin / 10.0 - 0.5", 6)} AS bin_lo,
           CAST(n_docs AS BIGINT) AS n_docs,
           CAST(n_pass AS BIGINT) AS n_pass,
           {R("CAST(n_pass AS DOUBLE) / n_docs", 6)} AS pass_rate,
           CASE WHEN tp > 0 THEN
             {R("(CAST(n_pass AS DOUBLE) / n_docs) / (CAST(tp AS DOUBLE) / tn)", 6)}
           END AS lift,
           {R("CAST(cn AS DOUBLE) / tn", 6)} AS cum_share,
           CASE WHEN tp > 0 THEN
             {R("CAST(cp AS DOUBLE) / tp", 6)}
           END AS cum_gains,
           CASE WHEN tp > 0 THEN
             {R("(CAST(cp AS DOUBLE) / cn) / (CAST(tp AS DOUBLE) / tn)", 6)}
           END AS cum_lift
    FROM cum CROSS JOIN tot
    """,
)
def _q_eval_lift_gains_decile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIFT / GAINS table for the cheap quality scorer — the
    TARGETING readout of the eval family: bin documents by the same
    ten fixed logit bands as the calibration diagram, walk from the
    TOP band down, and report per band the pass-rate lift over the
    corpus base rate plus the cumulative share of all C4 survivors
    captured (gains) — i.e. "score-prune the top X% of the crawl and
    you keep Y% of everything the expensive gate would keep", the
    single chart that prices a pre-filter threshold in retained-data
    terms (confusion prices ONE threshold; this prices all ten).
    Same factored `_HLS_VS_C4_SQL` scorer+label, fixed integer-grid
    bins (no global rank), cumulative sums over the ≤10 bin rows via
    the collect-sorted-array fold — the BH/AUC pattern, no keyless
    window. Zero-pass corpora NULL-guard every lift column."""
    docs = _table(spark, sf_dir, "documents")
    scores = tx.hashed_linear_score(docs).select("doc_id", "logit")
    surv = tx.c4_filter_survivors(docs).select("doc_id", F.lit(1).alias("__pass"))
    j = scores.join(surv.hint("shuffle_hash"), "doc_id", "left")
    bin_col = F.least(
        F.floor(
            (F.round(F.col("logit") * 1000000, 0) + F.lit(500000)) / F.lit(100000)
        ).cast("int"),
        F.lit(9),
    )
    bins = (
        j.select(bin_col.alias("__bin"), F.coalesce(F.col("__pass"), F.lit(0)).alias("__p"))
        .groupBy("__bin")
        .agg(F.count(F.lit(1)).alias("__n"), F.sum("__p").alias("__np"))
    )
    row = bins.agg(
        F.reverse(
            F.sort_array(F.collect_list(F.struct("__bin", "__n", "__np")))
        ).alias("__arr"),
        F.sum("__n").alias("__tn"),
        F.sum("__np").alias("__tp"),
    )
    arr = F.col("__arr")
    cumn = F.transform(
        F.sequence(F.lit(1), F.size(arr)),
        lambda i: F.aggregate(
            F.slice(arr, F.lit(1), i),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x["__n"],
        ),
    )
    cump = F.transform(
        F.sequence(F.lit(1), F.size(arr)),
        lambda i: F.aggregate(
            F.slice(arr, F.lit(1), i),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x["__np"],
        ),
    )
    z = row.select(
        "__tn",
        "__tp",
        F.explode(
            F.arrays_zip(arr, cumn.alias("__cn"), cump.alias("__cp"))
        ).alias("__z"),
    ).select(
        F.col("__z.__arr.__bin").alias("bin"),
        F.col("__z.__arr.__n").alias("__n"),
        F.col("__z.__arr.__np").alias("__np"),
        F.col("__z.__cn").alias("__cn"),
        F.col("__z.__cp").alias("__cp"),
        "__tn",
        "__tp",
    )
    tp_pos = F.col("__tp") > 0
    base = F.col("__tp").cast("double") / F.col("__tn")
    return z.select(
        F.col("bin").cast("int").alias("bin"),
        rd(F.col("bin") / F.lit(10.0) - F.lit(0.5), 6).alias("bin_lo"),
        F.col("__n").cast("long").alias("n_docs"),
        F.col("__np").cast("long").alias("n_pass"),
        rd(F.col("__np").cast("double") / F.col("__n"), 6).alias("pass_rate"),
        F.when(tp_pos, rd((F.col("__np").cast("double") / F.col("__n")) / base, 6)).alias("lift"),
        rd(F.col("__cn").cast("double") / F.col("__tn"), 6).alias("cum_share"),
        F.when(tp_pos, rd(F.col("__cp").cast("double") / F.col("__tp"), 6)).alias("cum_gains"),
        F.when(tp_pos, rd((F.col("__cp").cast("double") / F.col("__cn")) / base, 6)).alias("cum_lift"),
    )


@register(
    "graph_ppr_seed_topk",
    f"""
    WITH e AS (
      SELECT user_id, event_id, ts, epoch_us(ts) AS us FROM events
    ),
    m AS (
      SELECT *,
             CASE WHEN lag(us) OVER w IS NULL
                       OR us - lag(us) OVER w > 1800000000
                  THEN 1 ELSE 0 END AS newf
      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    s AS (
      SELECT *,
             sum(newf) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS UNBOUNDED PRECEDING
             ) AS sess
      FROM m
    ),
    sess AS (
      SELECT user_id, sess, min(us) AS start_us, max(us) AS end_us
      FROM s GROUP BY user_id, sess
    ),
    p AS (
      SELECT a.user_id AS ua, b.user_id AS ub, count(*) AS w
      FROM sess a JOIN sess b
        ON a.start_us <= b.end_us AND b.start_us <= a.end_us
       AND a.user_id < b.user_id
      GROUP BY a.user_id, b.user_id
    ),
    edges AS (
      SELECT ua AS src, ub AS dst, CAST(w AS DOUBLE) AS w FROM p
      UNION ALL
      SELECT ub AS src, ua AS dst, CAST(w AS DOUBLE) AS w FROM p
    ),
    deg AS (SELECT src, sum(w) AS wdeg FROM edges GROUP BY src),
    marked AS (
      SELECT src, CASE WHEN src % 20 = 0 THEN 1 ELSE 0 END AS isseed
      FROM deg
    ),
    nsc AS (SELECT CAST(sum(isseed) AS DOUBLE) AS __ns FROM marked),
    svec AS (
      SELECT src,
             CASE WHEN isseed = 1 THEN 1.0 / sc.__ns ELSE 0.0 END AS sv
      FROM marked CROSS JOIN nsc sc
    ),
    r0 AS (SELECT src, sv AS rank FROM svec),
    c1 AS (
      SELECT e.dst AS src,
             CAST(sum(CAST({R("r.rank * e.w / d.wdeg", 9)} AS DECIMAL(38,9))) AS DOUBLE) AS cs
      FROM edges e JOIN r0 r ON r.src = e.src JOIN deg d ON d.src = e.src
      GROUP BY e.dst
    ),
    r1 AS (
      SELECT v.src, {R("0.15000000000000002 * v.sv + 0.85 * coalesce(c.cs, 0.0)", 9)} AS rank
      FROM svec v LEFT JOIN c1 c ON c.src = v.src
    ),
    c2 AS (
      SELECT e.dst AS src,
             CAST(sum(CAST({R("r.rank * e.w / d.wdeg", 9)} AS DECIMAL(38,9))) AS DOUBLE) AS cs
      FROM edges e JOIN r1 r ON r.src = e.src JOIN deg d ON d.src = e.src
      GROUP BY e.dst
    ),
    r2 AS (
      SELECT v.src, {R("0.15000000000000002 * v.sv + 0.85 * coalesce(c.cs, 0.0)", 9)} AS rank
      FROM svec v LEFT JOIN c2 c ON c.src = v.src
    ),
    c3 AS (
      SELECT e.dst AS src,
             CAST(sum(CAST({R("r.rank * e.w / d.wdeg", 9)} AS DECIMAL(38,9))) AS DOUBLE) AS cs
      FROM edges e JOIN r2 r ON r.src = e.src JOIN deg d ON d.src = e.src
      GROUP BY e.dst
    ),
    r3 AS (
      SELECT v.src, {R("0.15000000000000002 * v.sv + 0.85 * coalesce(c.cs, 0.0)", 9)} AS rank
      FROM svec v LEFT JOIN c3 c ON c.src = v.src
    )
    SELECT src AS node,
           CAST(CASE WHEN src % 20 = 0 THEN 1 ELSE 0 END AS INTEGER) AS is_seed,
           rank AS ppr
    FROM r3
    ORDER BY rank DESC, node ASC
    LIMIT 20
    """,
)
def _q_graph_ppr_seed_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PERSONALIZED PageRank (`gr.personalized_pagerank`, d=0.85, 3
    decimal-exact rounds) over the same session-concurrency graph as
    `graph_pagerank_user_concurrency`, with teleport mass pinned to a
    deterministic seed cohort (user_id % 20 == 0): the top-20 by
    seed-proximity is the GRAPH-BASED DATA-SELECTION primitive —
    expand a trusted/labeled subset through the co-activity graph to
    find candidates for labeling/inclusion, the link-analysis
    analogue of `mix_dsir_importance`. Global PageRank answers "who
    is central"; PPR answers "who is central RELATIVE TO THESE" —
    seeds rank high by restart mass, their non-seed neighbors by
    received flow (`is_seed` column separates the two readings). Same
    per-iteration plan as the parent (two vertex-keyed shuffle-hash
    joins + one map-side sum), one extra broadcast seed indicator,
    recurrence unrolled bit-for-bit in the oracle."""
    sessd = ag.sessionize_user_events(_table(spark, sf_dir, "events"), gap_minutes=30)
    ivl = sessd.select(
        "user_id",
        "session_idx",
        F.unix_micros(F.col("session_start").cast("timestamp")).alias("start_us"),
        F.unix_micros(F.col("session_end").cast("timestamp")).alias("end_us"),
    )
    prs = iv.overlap_join(ivl, ivl).filter(F.col("user_id_a") < F.col("user_id_b"))
    mat = prs.groupBy(
        F.col("user_id_a").alias("ua"), F.col("user_id_b").alias("ub")
    ).agg(F.count(F.lit(1)).alias("w"))
    edges = mat.select(
        F.col("ua").alias("src"), F.col("ub").alias("dst"), F.col("w").alias("weight")
    ).unionByName(
        mat.select(
            F.col("ub").alias("src"), F.col("ua").alias("dst"), F.col("w").alias("weight")
        )
    )
    seeds = edges.select("src").distinct().filter(F.col("src") % 20 == 0).select(
        F.col("src").alias("node")
    )
    out = gr.personalized_pagerank(edges, seeds, damping=_PR_D, iterations=3)
    return (
        out.select(
            "node",
            F.when(F.col("node") % 20 == 0, 1).otherwise(0).cast("int").alias("is_seed"),
            "ppr",
        )
        .orderBy(F.col("ppr").desc(), F.col("node").asc())
        .limit(20)
    )


@register(
    "privacy_dp_count_report",
    f"""
    WITH g AS (
      SELECT event_type, sum(cnt_per_user) AS n,
             count(*) AS n_users,
             max(cnt_per_user) AS max_user_contrib
      FROM (
        SELECT event_type, user_id, count(*) AS cnt_per_user
        FROM events GROUP BY event_type, user_id
      ) t
      GROUP BY event_type
    ),
    eps AS (SELECT * FROM (VALUES (0.1), (1.0)) e(epsilon))
    SELECT g.event_type,
           CAST(g.n AS BIGINT) AS n,
           CAST(g.n_users AS BIGINT) AS n_users,
           CAST(g.max_user_contrib AS BIGINT) AS sensitivity,
           CAST(e.epsilon AS DOUBLE) AS epsilon,
           {R("CAST(g.max_user_contrib AS DOUBLE) / e.epsilon", 6)} AS laplace_scale,
           {R("(CAST(g.max_user_contrib AS DOUBLE) / e.epsilon) / g.n", 6)} AS rel_err,
           CAST(CASE WHEN (CAST(g.max_user_contrib AS DOUBLE) / e.epsilon) / g.n < 0.05
                THEN 1 ELSE 0 END AS INTEGER) AS publishable
    FROM g CROSS JOIN eps e
    """,
)
def _q_privacy_dp_count_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DIFFERENTIAL-PRIVACY budget planner for per-type event counts
    — the deterministic half of a DP release (the noise draw happens
    at publication; THIS report decides whether a release is worth
    making): per event type, the USER-LEVEL sensitivity (max events
    one user contributes — user-level DP, not the naive row-level
    Δ=1), the Laplace scale Δ/ε and expected relative error (E|Lap| =
    b) at ε ∈ {{0.1, 1}}, and a publishable flag (rel. error < 5%).
    Complements the re-identification audits (k-anonymity,
    l-diversity, t-closeness judge the raw table; this prices the
    NOISED aggregate). One (type, user) keyed agg + one type agg —
    map-side combined; output |types|×|ε| rows."""
    ev = _events(spark, sf_dir)
    per_user = ev.groupBy("event_type", "user_id").agg(
        F.count(F.lit(1)).alias("__c")
    )
    g = per_user.groupBy("event_type").agg(
        F.sum("__c").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.max("__c").cast("long").alias("sensitivity"),
    )
    j = g.select(
        "*", F.explode(F.array(F.lit(0.1), F.lit(1.0))).alias("epsilon")
    )
    scale = F.col("sensitivity").cast("double") / F.col("epsilon")
    rel = scale / F.col("n")
    return j.select(
        "event_type",
        "n",
        "n_users",
        "sensitivity",
        F.col("epsilon").cast("double").alias("epsilon"),
        rd(scale, 6).alias("laplace_scale"),
        rd(rel, 6).alias("rel_err"),
        F.when(rel < 0.05, 1).otherwise(0).cast("int").alias("publishable"),
    )


@register(
    "stream_cusum_level_alerts",
    f"""
    WITH e AS (
      SELECT event_type, ts, event_id,
             CAST(floor(value * 10000.0 + 0.5) AS BIGINT) - 1050000 AS d
      FROM events WHERE value IS NOT NULL
    ),
    c AS (
      SELECT event_type, ts, event_id, d,
             sum(d) OVER (PARTITION BY event_type ORDER BY ts, event_id
                          ROWS UNBOUNDED PRECEDING) AS cum
      FROM e
    ),
    s AS (
      SELECT event_type, d, cum,
             cum - least(CAST(0 AS BIGINT),
                         min(cum) OVER (PARTITION BY event_type
                                        ORDER BY ts, event_id
                                        ROWS UNBOUNDED PRECEDING)) AS sc
      FROM c
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_obs,
           {sql_rd("CAST(max(sc) AS DOUBLE) / 10000.0", 4)} AS max_cusum,
           CAST(sum(CASE WHEN sc > 5000000 THEN 1 ELSE 0 END) AS BIGINT) AS n_alerts,
           {sql_rd("CAST(sum(d) - least(CAST(0 AS BIGINT), min(cum)) AS DOUBLE) / 10000.0", 4)} AS cusum_now
    FROM s GROUP BY event_type
    """,
)
def _q_stream_cusum_level_alerts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming CUSUM level-shift monitor (`stream_cusum_alert`,
    Page 1954) per event type — the ORDER-DEPENDENT state-machine
    member of the streaming family (counters/sketches/windows commute
    with batching; this one does not, which is exactly why it needs
    `applyInPandasWithState`): S⁺ = max(0, S⁺ + (x−μ₀−κ)) with alerts
    on S⁺ > h, carried across micro-batches as O(1) integer state via
    the closed form S⁺_n = cum_n − min(0, min prefix cum). Values
    quantize to integer ten-thousandths scan-side, so stream state
    and the oracle's two window passes are EXACT INT64 end-to-end —
    the final streaming state equals the batch fixpoint bit-for-bit
    (μ₀=100, κ=5, h=500 on the events value scale). Emits running
    totals per trigger; the registry entry reduces emissions to the
    final state per key (n_obs is monotone)."""
    from time_series_data_trimmer_spark.streaming.stream_ops import (
        stream_cusum_alert,
    )

    out = stream_cusum_alert(spark, os.path.join(sf_dir, "events.parquet"))
    agg = out.groupBy("event_type").agg(
        F.max(
            F.struct("n_obs", "n_alerts", "max_cusum", "cusum_now")
        ).alias("__s")
    )
    return agg.select(
        "event_type",
        F.col("__s.n_obs").alias("n_obs"),
        F.col("__s.max_cusum").alias("max_cusum"),
        F.col("__s.n_alerts").alias("n_alerts"),
        F.col("__s.cusum_now").alias("cusum_now"),
    )


@register(
    "feature_hashing_collision_report",
    f"""
    WITH toks AS (
      SELECT DISTINCT t.token
      FROM documents,
           LATERAL (SELECT unnest(string_split(trim(text), ' ')) AS token) t
      WHERE len(t.token) > 0 AND text IS NOT NULL
    ),
    h AS (
      SELECT token,
             ('0x' || substr(md5('tsdt|fh|' || token), 1, 8))::BIGINT AS u
      FROM toks
    ),
    ks AS (SELECT * FROM (VALUES (12), (16), (20)) k(k_bits)),
    b AS (
      SELECT k.k_bits, h.u % (CAST(1 AS BIGINT) << k.k_bits) AS bucket
      FROM h CROSS JOIN ks k
    )
    SELECT k_bits,
           CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(count(DISTINCT bucket) AS BIGINT) AS buckets_used,
           CAST(count(*) - count(DISTINCT bucket) AS BIGINT) AS n_collided,
           {R("CAST(count(*) - count(DISTINCT bucket) AS DOUBLE) / count(*)", 6)} AS collision_rate,
           {R("CAST(count(DISTINCT bucket) AS DOUBLE) / (CAST(1 AS BIGINT) << k_bits)", 6)} AS load_factor
    FROM b GROUP BY k_bits
    """,
)
def _q_feature_hashing_collision_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FEATURE-HASHING capacity audit for the hashed-linear scorer
    family (`tx.hashed_linear_score` hashes tokens to weights; THIS
    says how many weights the table actually needs): per hash width
    k ∈ {{12, 16, 20}} bits, the corpus vocabulary's distinct-bucket
    occupancy, collided-token count/rate, and table load factor — the
    numbers that pick the hashing-trick width before training (too
    narrow = gradient interference from collisions, too wide = wasted
    parameters; Weinberger et al. 2009). One DISTINCT-token scan, the
    three widths fan out scan-side (3 rows per distinct token), one
    (k, bucket) distinct-count — all map-side combinable; 3-row
    output at any corpus size."""
    docs = _table(spark, sf_dir, "documents")
    toks = (
        docs.filter(F.col("text").isNotNull())
        .select(F.explode(F.split(F.trim(F.col("text")), " ")).alias("token"))
        .filter(F.length("token") > 0)
        .distinct()
    )
    u = F.conv(
        F.substring(F.md5(F.concat(F.lit("tsdt|fh|"), F.col("token"))), 1, 8), 16, 10
    ).cast("long")
    b = toks.select(
        u.alias("__u"),
        F.explode(F.array(F.lit(12), F.lit(16), F.lit(20))).alias("k_bits"),
    ).select(
        "k_bits",
        F.pmod(
            F.col("__u"), F.expr("shiftleft(cast(1 as bigint), k_bits)")
        ).alias("__bucket"),
    )
    agg = b.groupBy("k_bits").agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
        F.count_distinct(F.col("__bucket")).cast("long").alias("buckets_used"),
    )
    return agg.select(
        "k_bits",
        "n_tokens",
        "buckets_used",
        (F.col("n_tokens") - F.col("buckets_used")).cast("long").alias("n_collided"),
        rd(
            (F.col("n_tokens") - F.col("buckets_used")).cast("double")
            / F.col("n_tokens"),
            6,
        ).alias("collision_rate"),
        rd(
            F.col("buckets_used").cast("double")
            / F.expr("shiftleft(cast(1 as bigint), k_bits)"),
            6,
        ).alias("load_factor"),
    )


@register(
    "dq_volume_anomaly_daily",
    f"""
    WITH d AS (
      SELECT epoch_us(ts) // 86400000000 AS day, count(*) AS n
      FROM events GROUP BY 1
    ),
    arrs AS (
      SELECT list_sort(list(n)) AS arr FROM d
    ),
    med AS (
      SELECT (arr[CAST(floor((len(arr) + 1) / 2) AS INT)]
              + arr[CAST(floor(len(arr) / 2) AS INT) + 1]) / 2.0 AS med, arr
      FROM arrs
    ),
    mz AS (
      SELECT med,
             (arr2[CAST(floor((len(arr2) + 1) / 2) AS INT)]
              + arr2[CAST(floor(len(arr2) / 2) AS INT) + 1]) / 2.0 AS mad
      FROM (SELECT med, list_sort(list_transform(arr, x -> abs(x - med))) AS arr2 FROM med)
    )
    SELECT CAST(d.day AS BIGINT) AS day,
           CAST(d.n AS BIGINT) AS n_rows,
           {R("m.med", 6)} AS median_rows,
           {R("m.mad", 6)} AS mad_rows,
           CASE WHEN m.mad > 0.0 THEN
             {R("(d.n - m.med) / (1.4826 * m.mad)", 6)}
           END AS robust_z,
           CAST(CASE WHEN m.mad > 0.0 AND abs((d.n - m.med) / (1.4826 * m.mad)) > 3.5
                THEN 1 ELSE 0 END AS INTEGER) AS anomaly
    FROM d CROSS JOIN mz m
    """,
)
def _q_dq_volume_anomaly_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INGEST-VOLUME anomaly detector — the DQ check that catches a
    broken producer or a double-delivery before any value-level test
    can (freshness says data ARRIVED; this says the right AMOUNT
    arrived): daily row counts scored by robust z against the
    corpus's own median/MAD (the Hampel identifier on the day axis —
    a crashed day cannot drag the threshold the way it drags a
    mean±kσ rule). Day counts are one map-side-combined agg (≤ a few
    thousand rows for years of data); the median and MAD come off ONE
    sorted collected array (the `ts_hampel_filter` interpolated
    formula) attached back as a sanctioned 1-row broadcast. |days|-row
    output, MAD=0 NULL-guarded."""
    ev = _events(spark, sf_dir)
    d = ev.select(
        F.expr("unix_micros(cast(ts as timestamp)) div 86400000000").alias("day")
    ).groupBy("day").agg(F.count(F.lit(1)).alias("__n"))
    arrs = d.agg(F.sort_array(F.collect_list(F.col("__n").cast("double"))).alias("__arr"))

    def _med(a):
        n = F.size(a)
        lo = F.element_at(a, F.floor((n + F.lit(1)) / F.lit(2)).cast("int"))
        hi = F.element_at(a, F.floor(n / F.lit(2)).cast("int") + F.lit(1))
        return (lo + hi) / F.lit(2.0)

    med = arrs.select(
        "__arr", _med(F.col("__arr")).alias("__med")
    )
    arr2 = F.sort_array(F.transform(F.col("__arr"), lambda x: F.abs(x - F.col("__med"))))
    mz = med.select("__med", _med(arr2).alias("__mad"))
    j = d.crossJoin(F.broadcast(mz))
    zexpr = (F.col("__n") - F.col("__med")) / (F.lit(1.4826) * F.col("__mad"))
    return j.select(
        F.col("day").cast("long").alias("day"),
        F.col("__n").cast("long").alias("n_rows"),
        rd(F.col("__med"), 6).alias("median_rows"),
        rd(F.col("__mad"), 6).alias("mad_rows"),
        F.when(F.col("__mad") > 0.0, rd(zexpr, 6)).alias("robust_z"),
        F.when((F.col("__mad") > 0.0) & (F.abs(zexpr) > 3.5), 1)
        .otherwise(0)
        .cast("int")
        .alias("anomaly"),
    )


def _kc_sql(k: int = 8) -> str:
    """Unrolled k-center greedy oracle: round r's center = argmax of
    the running min-squared-distance, every distance an exact
    decimal(38,9) sum — the `graph_pagerank` unrolled-recurrence
    discipline applied to farthest-point traversal."""
    dterm = sql_rd("(e.x - c.x) * (e.x - c.x)", 9)
    parts = [
        f"WITH ex AS ({_EX_SQL}),",
        "sd AS (SELECT vec_id FROM embeddings"
        " ORDER BY md5('tsdt|kc|' || CAST(vec_id AS VARCHAR)), vec_id LIMIT 1),",
        "c1 AS (SELECT e.i, e.x FROM ex e JOIN sd ON sd.vec_id = e.vec_id),",
        f"d1 AS (SELECT e.vec_id, sum(CAST({dterm} AS DECIMAL(38,9))) AS dmin"
        " FROM ex e JOIN c1 c ON c.i = e.i GROUP BY e.vec_id),",
    ]
    for r in range(2, k + 1):
        parts.append(
            f"p{r} AS (SELECT vec_id, dmin FROM d{r-1}"
            " ORDER BY dmin DESC, vec_id ASC LIMIT 1),"
        )
        if r < k:
            parts.append(
                f"c{r} AS (SELECT e.i, e.x FROM ex e JOIN p{r} ON p{r}.vec_id = e.vec_id),"
            )
            parts.append(
                f"n{r} AS (SELECT e.vec_id, sum(CAST({dterm} AS DECIMAL(38,9))) AS d"
                f" FROM ex e JOIN c{r} c ON c.i = e.i GROUP BY e.vec_id),"
            )
            parts.append(
                f"d{r} AS (SELECT d.vec_id, least(d.dmin, n.d) AS dmin"
                f" FROM d{r-1} d JOIN n{r} n ON n.vec_id = d.vec_id),"
            )
    sel = [
        "SELECT 1 AS round, sd.vec_id, CAST(NULL AS DOUBLE) AS dist2_to_set FROM sd"
    ]
    for r in range(2, k + 1):
        sel.append(
            f"SELECT {r} AS round, p{r}.vec_id,"
            f" {sql_rd(f'CAST(p{r}.dmin AS DOUBLE)', 6)} AS dist2_to_set FROM p{r}"
        )
    body = "\n    ".join(parts).rstrip(",")
    union = "\n    UNION ALL\n    ".join(sel)
    return f"{body}\n    {union}"


@register("sample_kcenter_coreset", _kc_sql(8))
def _q_sample_kcenter_coreset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-CENTER GREEDY coreset (farthest-point traversal, the
    2-approximation of Gonzalez 1985): 8 maximally-DIVERSE embedding
    exemplars — the opposite pole of `data_prune_prototypicality`
    (which keeps the most TYPICAL points): active-learning seed sets,
    eval-set design, and coverage-first data pruning all start from
    exactly this traversal, and `dist2_to_set` at each pick is the
    shrinking covering-radius curve (pick k where it elbows). Every
    candidate-to-set distance is an exact decimal(38,9) sum of 9-dp
    squared-difference terms, argmax ties break on vec_id, the seed
    is the min-md5 point — fully deterministic, recurrence unrolled
    bit-for-bit in the oracle like the PageRank family. Plan: k−1
    fixed rounds × (one 64-row broadcast center join + one
    vec-keyed distance agg + a TakeOrdered-1); the running-min state
    localCheckpoints per round (PLANS.md invariant 17). Vectors
    never shuffle; k is plan-time fixed."""
    emb = _table(spark, sf_dir, "embeddings")
    ex = emb.select(
        "vec_id", F.posexplode("embedding").alias("i", "__xf")
    ).select("vec_id", "i", F.col("__xf").cast("double").alias("x"))
    seed = (
        emb.select(
            "vec_id",
            F.md5(F.concat(F.lit("tsdt|kc|"), F.col("vec_id").cast("string"))).alias("__h"),
        )
        .orderBy(F.col("__h").asc(), F.col("vec_id").asc())
        .limit(1)
        .select("vec_id")
    )

    def _dist_to(center_ids: DataFrame) -> DataFrame:
        cvec = ex.join(F.broadcast(center_ids), "vec_id").select(
            "i", F.col("x").alias("__cx")
        )
        term = rd((F.col("x") - F.col("__cx")) * (F.col("x") - F.col("__cx")), 9)
        return (
            ex.join(F.broadcast(cvec), "i")
            .groupBy("vec_id")
            .agg(F.sum(term.cast("decimal(38,9)")).alias("__d"))
        )

    state = _dist_to(seed).withColumnRenamed("__d", "__dmin").localCheckpoint()
    picks = [
        seed.select(
            F.lit(1).alias("round"),
            "vec_id",
            F.lit(None).cast("double").alias("dist2_to_set"),
        )
    ]
    k = 8
    for r in range(2, k + 1):
        p = state.orderBy(F.col("__dmin").desc(), F.col("vec_id").asc()).limit(1)
        picks.append(
            p.select(
                F.lit(r).alias("round"),
                "vec_id",
                rd(F.col("__dmin").cast("double"), 6).alias("dist2_to_set"),
            )
        )
        if r < k:
            dn = _dist_to(p.select("vec_id"))
            state = (
                state.join(dn.hint("shuffle_hash"), "vec_id")
                .select("vec_id", F.least(F.col("__dmin"), F.col("__d")).alias("__dmin"))
                .localCheckpoint()
            )
    out = picks[0]
    for p in picks[1:]:
        out = out.unionByName(p)
    return out


@register(
    "orders_basket_lift_pairs",
    f"""
    WITH items AS (
      SELECT DISTINCT l_orderkey AS okey, l_partkey AS pk FROM lineitem
    ),
    nord AS (SELECT CAST(count(DISTINCT okey) AS DOUBLE) AS n FROM items),
    cnt AS (SELECT pk, count(*) AS c FROM items GROUP BY pk),
    pairs AS (
      SELECT a.pk AS part_a, b.pk AS part_b, count(*) AS n_pair
      FROM items a JOIN items b
        ON a.okey = b.okey AND a.pk < b.pk
      GROUP BY a.pk, b.pk
    ),
    scored AS (
      SELECT p.part_a, p.part_b, p.n_pair,
             {R("CAST(p.n_pair AS DOUBLE) / nord.n", 6)} AS support,
             {R("CAST(p.n_pair AS DOUBLE) / ca.c", 6)} AS conf_a_b,
             {R("CAST(p.n_pair AS DOUBLE) / cb.c", 6)} AS conf_b_a,
             {R("(nord.n * p.n_pair) / (CAST(ca.c AS DOUBLE) * cb.c)", 6)} AS lift
      FROM pairs p
      JOIN cnt ca ON ca.pk = p.part_a
      JOIN cnt cb ON cb.pk = p.part_b
      CROSS JOIN nord
      WHERE p.n_pair >= 3
    )
    SELECT * FROM scored
    ORDER BY lift DESC, part_a ASC, part_b ASC
    LIMIT 20
    """,
)
def _q_orders_basket_lift_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MARKET-BASKET association rules over order line items:
    support / directed confidence / lift per co-purchased part pair,
    top-20 by lift (min support 3 orders) — the classic retail
    analytics workload (Agrawal-Srikant Apriori at the pair level),
    and the relational sibling of `coengagement_type_pairs` (events)
    and `text_cooc_lift_pairs` (tokens). SCALE SHAPE is the whole
    point: pairs come from a basket-keyed self-join, and TPC-H
    baskets are ≤7 items, so the fan-out is ≤21 pairs per order —
    bounded by the BASKET size law, never by part popularity (the
    same bounded-pair-generator discipline as the dedup family,
    PLANS.md invariant 6); part marginals join keyed, the order
    count is the 1-row broadcast, the cut is TakeOrdered. Exact
    integer counts; four 6-dp ratios on top."""
    li = _table(spark, sf_dir, "lineitem")
    items = li.select(
        F.col("l_orderkey").alias("__okey"), F.col("l_partkey").alias("__pk")
    ).distinct()
    nord = items.agg(
        F.count_distinct(F.col("__okey")).cast("double").alias("__n")
    )
    cnt = items.groupBy("__pk").agg(F.count(F.lit(1)).alias("__c"))
    a = items.select(F.col("__okey"), F.col("__pk").alias("part_a"))
    b = items.select(F.col("__okey"), F.col("__pk").alias("part_b"))
    pairs = (
        a.join(b.hint("shuffle_hash"), "__okey")
        .filter(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("n_pair"))
        .filter(F.col("n_pair") >= 3)
    )
    ca = cnt.select(F.col("__pk").alias("part_a"), F.col("__c").alias("__ca"))
    cb = cnt.select(F.col("__pk").alias("part_b"), F.col("__c").alias("__cb"))
    scored = (
        pairs.join(ca.hint("shuffle_hash"), "part_a")
        .join(cb.hint("shuffle_hash"), "part_b")
        .crossJoin(F.broadcast(nord))
        .select(
            "part_a",
            "part_b",
            F.col("n_pair").cast("long").alias("n_pair"),
            rd(F.col("n_pair").cast("double") / F.col("__n"), 6).alias("support"),
            rd(F.col("n_pair").cast("double") / F.col("__ca"), 6).alias("conf_a_b"),
            rd(F.col("n_pair").cast("double") / F.col("__cb"), 6).alias("conf_b_a"),
            rd(
                (F.col("__n") * F.col("n_pair"))
                / (F.col("__ca").cast("double") * F.col("__cb")),
                6,
            ).alias("lift"),
        )
    )
    return scored.orderBy(
        F.col("lift").desc(), F.col("part_a").asc(), F.col("part_b").asc()
    ).limit(20)


def _markov_stat_sql(rounds: int = 3) -> str:
    """Unrolled π ← normalize(πP) recurrence over the 6-dp transition
    matrix — pagerank's unrolled-recurrence discipline on the
    |types|² chain."""
    head = f"""WITH o AS (
      SELECT user_id, event_type,
             lead(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
             ) AS nxt
      FROM events
    ),
    c AS (
      SELECT event_type AS src, nxt AS dst, count(*) AS n
      FROM o WHERE nxt IS NOT NULL GROUP BY 1, 2
    ),
    t AS (SELECT src, sum(n) AS tot FROM c GROUP BY src),
    pm AS (
      SELECT c.src, c.dst, {sql_rd("CAST(c.n AS DOUBLE) / CAST(t.tot AS DOUBLE)", 6)} AS p
      FROM c JOIN t ON t.src = c.src
    ),
    ty AS (SELECT DISTINCT event_type AS et FROM events),
    nt AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM ty),
    pi0 AS (SELECT et, {sql_rd("1.0 / nt.n", 12)} AS pi FROM ty CROSS JOIN nt)"""
    parts = [head]
    prev = "pi0"
    for r in range(1, rounds + 1):
        parts.append(
            f""",
    r{r} AS (
      SELECT pm.dst AS et,
             CAST(sum(CAST({sql_rd("pr.pi * pm.p", 12)} AS DECIMAL(38,12))) AS DOUBLE) AS raw
      FROM pm JOIN {prev} pr ON pr.et = pm.src GROUP BY pm.dst
    ),
    s{r} AS (SELECT CAST(sum(CAST({sql_rd("raw", 12)} AS DECIMAL(38,12))) AS DOUBLE) AS s FROM r{r}),
    pi{r} AS (
      SELECT t.et, coalesce({sql_rd("r.raw / s.s", 12)}, 0.0) AS pi
      FROM ty t LEFT JOIN r{r} r ON r.et = t.et CROSS JOIN s{r} s
    )"""
        )
        prev = f"pi{r}"
    parts.append(
        f""",
    emp AS (
      SELECT event_type AS et, count(*) AS n FROM events GROUP BY 1
    ),
    tot AS (SELECT CAST(sum(n) AS DOUBLE) AS n FROM emp)
    SELECT p.et AS event_type,
           {sql_rd("p.pi", 6)} AS stationary_p,
           {sql_rd("CAST(e.n AS DOUBLE) / tot.n", 6)} AS empirical_p,
           {sql_rd(f"p.pi - CAST(e.n AS DOUBLE) / tot.n", 6)} AS delta
    FROM {prev} p JOIN emp e ON e.et = p.et CROSS JOIN tot"""
    )
    return "".join(parts)


@register("markov_stationary_dist", _markov_stat_sql(3))
def _q_markov_stationary_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STATIONARY distribution of the event-type Markov chain (3
    decimal-exact power rounds of π ← normalize(πP) from uniform,
    the `graph_pagerank` fixed-round contract) set against the
    EMPIRICAL type share — the behavioral-model readout on top of
    `markov_event_transitions` (matrix) and
    `stats_markov_entropy_rate` (predictability): where the chain is
    HEADING vs where the counts ARE; a large delta means the recent
    transition structure is pulling traffic toward a type faster
    than its historical share shows (early drift signal at the
    process level, not the value level). All linear algebra happens
    on |types|-row vectors against the |types|²-row 6-dp matrix —
    broadcast joins, 12-dp-rounded decimal-summed contributions,
    renormalized per round (rounding + dangling-type leakage cannot
    compound). |types|-row output."""
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    o = ev.select(
        "event_type", F.lead("event_type").over(w).alias("__nxt")
    ).filter(F.col("__nxt").isNotNull())
    c = o.groupBy(
        F.col("event_type").alias("__src"), F.col("__nxt").alias("__dst")
    ).agg(F.count(F.lit(1)).alias("__n"))
    t = c.groupBy("__src").agg(F.sum("__n").alias("__tot"))
    pm = c.join(t.hint("shuffle_hash"), "__src").select(
        "__src", "__dst",
        rd(F.col("__n").cast("double") / F.col("__tot").cast("double"), 6).alias("__p"),
    )
    ty = ev.select(F.col("event_type").alias("__et")).distinct()
    nt = ty.agg(F.count(F.lit(1)).cast("double").alias("__nt"))
    pi = ty.crossJoin(F.broadcast(nt)).select(
        "__et", rd(F.lit(1.0) / F.col("__nt"), 12).alias("__pi")
    )

    def _ds12(term):
        return F.sum(rd(term, 12).cast("decimal(38,12)")).cast("double")

    for _ in range(3):
        raw = (
            pm.join(F.broadcast(pi.withColumnRenamed("__et", "__src")), "__src")
            .groupBy("__dst")
            .agg(_ds12(F.col("__pi") * F.col("__p")).alias("__raw"))
        )
        s = raw.agg(_ds12(F.col("__raw")).alias("__s"))
        pi = (
            ty.join(
                F.broadcast(raw.withColumnRenamed("__dst", "__et")), "__et", "left"
            )
            .crossJoin(F.broadcast(s))
            .select(
                "__et",
                F.coalesce(
                    rd(F.col("__raw") / F.col("__s"), 12), F.lit(0.0)
                ).alias("__pi"),
            )
        )
    emp = ev.groupBy(F.col("event_type").alias("__et")).agg(
        F.count(F.lit(1)).alias("__n")
    )
    tot = emp.agg(F.sum("__n").cast("double").alias("__tn"))
    return (
        pi.join(F.broadcast(emp), "__et")
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("__et").alias("event_type"),
            rd(F.col("__pi"), 6).alias("stationary_p"),
            rd(F.col("__n").cast("double") / F.col("__tn"), 6).alias("empirical_p"),
            rd(
                F.col("__pi") - F.col("__n").cast("double") / F.col("__tn"), 6
            ).alias("delta"),
        )
    )


@register(
    "graph_lp_modularity",
    f"""
    WITH e0 AS (
      SELECT user_id, event_id, ts, epoch_us(ts) AS us FROM events
    ),
    m0 AS (
      SELECT *,
             CASE WHEN lag(us) OVER w IS NULL
                       OR us - lag(us) OVER w > 1800000000
                  THEN 1 ELSE 0 END AS newf
      FROM e0 WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    s0 AS (
      SELECT *,
             sum(newf) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS UNBOUNDED PRECEDING
             ) AS sess
      FROM m0
    ),
    sess AS (
      SELECT user_id, sess, min(us) AS start_us, max(us) AS end_us
      FROM s0 GROUP BY user_id, sess
    ),
    p AS (
      SELECT DISTINCT a.user_id AS ua, b.user_id AS ub
      FROM sess a JOIN sess b
        ON a.start_us <= b.end_us AND b.start_us <= a.end_us
       AND a.user_id < b.user_id
    ),
    e AS (
      SELECT ua AS s, ub AS d FROM p
      UNION ALL SELECT ub AS s, ua AS d FROM p
    ),
    nodes AS (SELECT DISTINCT s AS node FROM e),
    l0 AS (SELECT node, node AS lbl FROM nodes),
    v1 AS (
      SELECT e.d AS node, l.lbl, count(*) AS n
      FROM e JOIN l0 l ON l.node = e.s GROUP BY e.d, l.lbl
    ),
    w1 AS (
      SELECT node, lbl AS new_lbl FROM v1
      QUALIFY row_number() OVER (PARTITION BY node ORDER BY n DESC, lbl ASC) = 1
    ),
    l1 AS (
      SELECT l.node, coalesce(w.new_lbl, l.lbl) AS lbl
      FROM l0 l LEFT JOIN w1 w ON w.node = l.node
    ),
    v2 AS (
      SELECT e.d AS node, l.lbl, count(*) AS n
      FROM e JOIN l1 l ON l.node = e.s GROUP BY e.d, l.lbl
    ),
    w2 AS (
      SELECT node, lbl AS new_lbl FROM v2
      QUALIFY row_number() OVER (PARTITION BY node ORDER BY n DESC, lbl ASC) = 1
    ),
    l2 AS (
      SELECT l.node, coalesce(w.new_lbl, l.lbl) AS lbl
      FROM l1 l LEFT JOIN w2 w ON w.node = l.node
    ),
    mm AS (SELECT CAST(count(*) AS DOUBLE) AS m FROM p),
    dc AS (
      SELECT l.lbl, CAST(count(*) AS DOUBLE) AS d
      FROM e JOIN l2 l ON l.node = e.s GROUP BY l.lbl
    ),
    ec AS (
      SELECT la.lbl, CAST(count(*) AS DOUBLE) AS ein
      FROM p JOIN l2 la ON la.node = p.ua JOIN l2 lb ON lb.node = p.ub
      WHERE la.lbl = lb.lbl GROUP BY la.lbl
    ),
    terms AS (
      SELECT d.lbl,
             CAST({sql_rd("coalesce(e.ein, 0.0) / mm.m - (d.d / (2.0 * mm.m)) * (d.d / (2.0 * mm.m))", 9)} AS DECIMAL(38,9)) AS q,
             coalesce(e.ein, 0.0) AS ein
      FROM dc d LEFT JOIN ec e ON e.lbl = d.lbl CROSS JOIN mm
    ),
    cs AS (SELECT lbl, count(*) AS nn FROM l2 GROUP BY lbl)
    SELECT CAST((SELECT count(*) FROM nodes) AS BIGINT) AS n_nodes,
           CAST((SELECT m FROM mm) AS BIGINT) AS n_edges,
           CAST((SELECT count(*) FROM cs) AS BIGINT) AS n_communities,
           CAST((SELECT max(nn) FROM cs) AS BIGINT) AS largest_comm,
           {sql_rd("(SELECT sum(ein) FROM terms) / (SELECT m FROM mm)", 6)} AS intra_edge_frac,
           {sql_rd("CAST((SELECT sum(q) FROM terms) AS DOUBLE)", 6)} AS modularity_q
    """,
)
def _q_graph_lp_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COMMUNITY QUALITY readout: 2-round deterministic label
    propagation (`gr.label_propagation`, min-label tie-break) over the
    session-concurrency graph, scored by Newman MODULARITY Q =
    Σ_c (e_c/m − (d_c/2m)²) plus the intra-edge fraction — the number
    that says whether the co-activity graph HAS community structure
    worth exploiting (Q ≈ 0 → don't bother sharding/sampling by
    community; Q ≫ 0 → community-aware negative sampling and graph
    partitioning pay). Completes the graph family's unsupervised
    side: CC = connectivity, k-core = density, LP+Q = mesoscale.
    Every piece is exact-integer until the final ratios (counts,
    degrees, canonical intra-pair counts); the LP recurrence and the
    Q reduction unroll bit-for-bit in the oracle. Plan: the proven
    bounded session-overlap pair build, then per LP round one
    vertex-keyed join + a keyed majority vote; Q is three
    |labels|-row aggregates. 1-row output."""
    sessd = ag.sessionize_user_events(_table(spark, sf_dir, "events"), gap_minutes=30)
    ivl = sessd.select(
        "user_id",
        "session_idx",
        F.unix_micros(F.col("session_start").cast("timestamp")).alias("start_us"),
        F.unix_micros(F.col("session_end").cast("timestamp")).alias("end_us"),
    )
    prs = iv.overlap_join(ivl, ivl).filter(F.col("user_id_a") < F.col("user_id_b"))
    p = prs.select(
        F.col("user_id_a").alias("ua"), F.col("user_id_b").alias("ub")
    ).distinct()
    nodes = (
        p.select(F.col("ua").alias("node"))
        .unionByName(p.select(F.col("ub").alias("node")))
        .distinct()
    )
    seeds = nodes.select("node", F.col("node").alias("label"))
    lab = gr.label_propagation(
        p.select(F.col("ua").alias("src"), F.col("ub").alias("dst")),
        seeds,
        iterations=2,
    )
    e = p.select(F.col("ua").alias("s"), F.col("ub").alias("d")).unionByName(
        p.select(F.col("ub").alias("s"), F.col("ua").alias("d"))
    )
    mm = p.agg(F.count(F.lit(1)).cast("double").alias("__m"))
    la = lab.select(F.col("node").alias("s"), F.col("label").alias("__lbl"))
    dc = e.join(la.hint("shuffle_hash"), "s").groupBy("__lbl").agg(
        F.count(F.lit(1)).cast("double").alias("__d")
    )
    lpa = lab.select(F.col("node").alias("ua"), F.col("label").alias("__la"))
    lpb = lab.select(F.col("node").alias("ub"), F.col("label").alias("__lb"))
    ec = (
        p.join(lpa.hint("shuffle_hash"), "ua")
        .join(lpb.hint("shuffle_hash"), "ub")
        .filter(F.col("__la") == F.col("__lb"))
        .groupBy(F.col("__la").alias("__lbl"))
        .agg(F.count(F.lit(1)).cast("double").alias("__ein"))
    )
    terms = (
        dc.join(ec.hint("shuffle_hash"), "__lbl", "left")
        .crossJoin(F.broadcast(mm))
        .select(
            rd(
                F.coalesce(F.col("__ein"), F.lit(0.0)) / F.col("__m")
                - (F.col("__d") / (F.lit(2.0) * F.col("__m")))
                * (F.col("__d") / (F.lit(2.0) * F.col("__m"))),
                9,
            )
            .cast("decimal(38,9)")
            .alias("__q"),
            F.coalesce(F.col("__ein"), F.lit(0.0)).alias("__einf"),
        )
    )
    cs = lab.groupBy("label").agg(F.count(F.lit(1)).alias("__nn"))
    stats = (
        terms.agg(
            F.sum("__q").cast("double").alias("__qsum"),
            F.sum("__einf").alias("__eins"),
        )
        .crossJoin(F.broadcast(nodes.agg(F.count(F.lit(1)).cast("long").alias("n_nodes"))))
        .crossJoin(F.broadcast(mm))
        .crossJoin(
            F.broadcast(
                cs.agg(
                    F.count(F.lit(1)).cast("long").alias("n_communities"),
                    F.max("__nn").cast("long").alias("largest_comm"),
                )
            )
        )
    )
    return stats.select(
        "n_nodes",
        F.col("__m").cast("long").alias("n_edges"),
        "n_communities",
        "largest_comm",
        rd(F.col("__eins") / F.col("__m"), 6).alias("intra_edge_frac"),
        rd(F.col("__qsum"), 6).alias("modularity_q"),
    )


def _holt_backtest_sql() -> str:
    """The `_holt_sql` recurrence extended with the NEXT actual value:
    per evaluable row, model error |next − ŷ| vs naive error
    |next − current|, reduced to one MASE-style row."""
    D = _HOLT_D
    den1 = (1 << D) - 1
    num1 = " + ".join(
        f"lag(v, {j}) OVER w * {1 << (D - 1 - j)}" if j else f"v * {1 << (D - 1)}"
        for j in range(D)
    )
    num2 = " + ".join(
        (f"lag(v, {m}) OVER w" if m else "v")
        + f" * {min(m + 1, 2 * D - 1 - m) * (1 << (2 * D - 2 - m))}"
        for m in range(2 * D - 1)
    )
    full = f"lag(v, {2 * D - 2}) OVER w IS NOT NULL"
    d2 = den1 * den1
    fc = sql_rd(f"CAST(3 * n1 * {den1} - 2 * n2 AS DOUBLE) / {float(d2)} / 10000.0", 6)
    em = sql_rd(f"abs(CAST(vnext AS DOUBLE) / 10000.0 - {fc})", 6)
    en = sql_rd("abs(CAST(vnext AS DOUBLE) / 10000.0 - CAST(v AS DOUBLE) / 10000.0)", 6)
    return f"""
    WITH e AS (
      SELECT user_id, epoch_us(ts) AS t_us, event_id,
             CAST(floor(value * 10000.0 + 0.5) AS BIGINT) AS v
      FROM events WHERE value IS NOT NULL
    ),
    s AS (
      SELECT user_id, v,
             lead(v) OVER w AS vnext,
             CASE WHEN {full} THEN {num1} END AS n1,
             CASE WHEN {full} THEN {num2} END AS n2
      FROM e
      WINDOW w AS (PARTITION BY user_id ORDER BY t_us ASC, event_id ASC)
    ),
    ev AS (
      SELECT {em} AS em, {en} AS en
      FROM s WHERE n1 IS NOT NULL AND vnext IS NOT NULL
    ),
    agg AS (
      SELECT count(*) AS n_evals,
             CAST(sum(CAST(em AS DECIMAL(38,6))) AS DOUBLE) AS sm,
             CAST(sum(CAST(en AS DECIMAL(38,6))) AS DOUBLE) AS sn,
             CAST(sum(CASE WHEN em < en THEN 1 ELSE 0 END) AS BIGINT) AS wins
      FROM ev
    )
    SELECT CAST(n_evals AS BIGINT) AS n_evals,
           {sql_rd("sm / n_evals", 6)} AS mae_model,
           {sql_rd("sn / n_evals", 6)} AS mae_naive,
           CASE WHEN sn > 0.0 THEN {sql_rd("sm / sn", 6)} END AS mase_vs_naive,
           {sql_rd("CAST(wins AS DOUBLE) / n_evals", 6)} AS win_rate
    FROM agg
    """


@register("ts_holt_backtest_mase", _holt_backtest_sql())
def _q_ts_holt_backtest_mase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ONE-STEP BACKTEST of the Holt forecaster against the
    random-walk naive — the eval that decides whether
    `ts_holt_forecast` earns its keep on this data (a forecaster that
    loses to "predict the last value" should not ship): per evaluable
    row, |next − ŷ_holt| vs |next − current|, reduced to MAE both
    sides, their MASE-style ratio (<1 = model wins), and the per-row
    win rate. Errors are 6-dp-rounded and decimal-summed
    (order-independent); the forecast is the SAME truncated-exact
    integer convolution the forecast query surfaces, so backtest and
    forecast can never disagree. One user-keyed window pass (the
    convolution + the lead share it), one global agg. 1-row output."""
    from time_series_data_trimmer_spark.operators import timeseries as tso
    from time_series_data_trimmer_spark.sources.events import event_micros

    ev = _events(spark, sf_dir).filter(F.col("value").isNotNull())
    base = ev.select(
        "user_id",
        event_micros(ev).alias("t_us"),
        "event_id",
        "value",
    )
    fc = tso.holt_brown_forecast(
        base, key_col="user_id", value_col="value",
        order_cols=("t_us", "event_id"), depth=_HOLT_D,
    ).select("user_id", "t_us", "event_id", "forecast_next")
    w = Window.partitionBy("user_id").orderBy(
        F.col("t_us").asc(), F.col("event_id").asc()
    )
    scaled = F.floor(F.col("value") * F.lit(10000.0) + F.lit(0.5)).cast("long")
    nxt = base.select(
        "user_id", "t_us", "event_id",
        F.lead(scaled).over(w).alias("__vnext"),
        scaled.alias("__v"),
    )
    j = nxt.join(fc.hint("shuffle_hash"), ["user_id", "t_us", "event_id"]).filter(
        F.col("forecast_next").isNotNull() & F.col("__vnext").isNotNull()
    )
    em = rd(
        F.abs(F.col("__vnext").cast("double") / F.lit(10000.0) - F.col("forecast_next")),
        6,
    )
    en = rd(
        F.abs(
            F.col("__vnext").cast("double") / F.lit(10000.0)
            - F.col("__v").cast("double") / F.lit(10000.0)
        ),
        6,
    )
    agg = j.select(em.alias("__em"), en.alias("__en")).agg(
        F.count(F.lit(1)).cast("long").alias("n_evals"),
        F.sum(F.col("__em").cast("decimal(38,6)")).cast("double").alias("__sm"),
        F.sum(F.col("__en").cast("decimal(38,6)")).cast("double").alias("__sn"),
        F.sum(F.when(F.col("__em") < F.col("__en"), 1).otherwise(0))
        .cast("long")
        .alias("__wins"),
    )
    return agg.select(
        "n_evals",
        rd(F.col("__sm") / F.col("n_evals"), 6).alias("mae_model"),
        rd(F.col("__sn") / F.col("n_evals"), 6).alias("mae_naive"),
        F.when(F.col("__sn") > 0.0, rd(F.col("__sm") / F.col("__sn"), 6)).alias(
            "mase_vs_naive"
        ),
        rd(F.col("__wins").cast("double") / F.col("n_evals"), 6).alias("win_rate"),
    )


@register(
    "dq_srm_check",
    f"""
    WITH u AS (SELECT DISTINCT user_id FROM events),
    h AS (
      SELECT user_id,
             ('0x' || substr(md5('tsdt|ab|' || CAST(user_id AS VARCHAR)), 1, 8))::BIGINT AS hv
      FROM u
    ),
    b AS (
      SELECT 'ab_2way' AS scheme, 2 AS k, hv % 2 AS bucket FROM h
      UNION ALL
      SELECT 'uniform_10way' AS scheme, 10 AS k, hv % 10 AS bucket FROM h
    ),
    o AS (SELECT scheme, k, bucket, count(*) AS n FROM b GROUP BY 1, 2, 3),
    t AS (SELECT scheme, max(k) AS k, sum(n) AS tot FROM o GROUP BY scheme),
    c AS (
      SELECT o.scheme, t.k, t.tot,
             CAST(sum(CAST({sql_rd(
                 "(o.n - CAST(t.tot AS DOUBLE) / t.k) * (o.n - CAST(t.tot AS DOUBLE) / t.k) / (CAST(t.tot AS DOUBLE) / t.k)",
                 6,
             )} AS DECIMAL(38,6))) AS DOUBLE) AS chi2
      FROM o JOIN t ON t.scheme = o.scheme
      GROUP BY o.scheme, t.k, t.tot
    )
    SELECT scheme,
           CAST(k AS INTEGER) AS n_buckets,
           CAST(tot AS BIGINT) AS n_users,
           {R("chi2", 6)} AS chi2,
           CAST(k - 1 AS BIGINT) AS dof,
           CASE WHEN k = 2 THEN 3.841 ELSE 16.919 END AS crit_05,
           CAST(CASE WHEN {R("chi2", 6)} > (CASE WHEN k = 2 THEN 3.841 ELSE 16.919 END)
                THEN 1 ELSE 0 END AS INTEGER) AS srm_flag
    FROM c
    """,
)
def _q_dq_srm_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SAMPLE-RATIO-MISMATCH check for hash-based experiment
    assignment — the first thing an experimentation platform
    validates before trusting ANY A/B readout (`stats_ab_power` sizes
    the test; THIS says the assignment itself isn't broken): users
    bucket by md5 (the same deterministic assignment a real system
    ships), observed bucket counts against the uniform expectation by
    chi-square, for the 2-way A/B split and a 10-way uniformity probe
    (dof 1 and 9, α=0.05 critical values as literals — no inverse-CDF
    dependence). A flagged SRM means biased bucketing (bot users,
    hash collisions with an ID scheme, a dropped bucket) — the
    invalidator of every downstream CUPED/power/MW readout. One
    distinct-user scan fanned to both schemes scan-side, two tiny
    keyed aggs; per-bucket terms 6-dp-rounded and decimal-summed.
    2-row output."""
    ev = _events(spark, sf_dir)
    u = ev.select("user_id").distinct()
    hv = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("tsdt|ab|"), F.col("user_id").cast("string"))), 1, 8
        ),
        16,
        10,
    ).cast("long")
    h = u.select(hv.alias("__hv"))
    b = h.select(
        F.expr(
            "stack(2, 'ab_2way', 2, __hv % 2, 'uniform_10way', 10, __hv % 10)"
            " as (scheme, k, bucket)"
        )
    )
    o = b.groupBy("scheme", "k", "bucket").agg(F.count(F.lit(1)).alias("__n"))
    t = o.groupBy("scheme").agg(F.max("k").alias("__k"), F.sum("__n").alias("__tot"))
    exp_n = F.col("__tot").cast("double") / F.col("__k")
    term = rd(
        (F.col("__n") - exp_n) * (F.col("__n") - exp_n) / exp_n, 6
    ).cast("decimal(38,6)")
    c = (
        o.join(F.broadcast(t), "scheme")
        .groupBy("scheme", "__k", "__tot")
        .agg(F.sum(term).cast("double").alias("__chi2"))
    )
    crit = F.when(F.col("__k") == 2, F.lit(3.841)).otherwise(F.lit(16.919))
    chi2r = rd(F.col("__chi2"), 6)
    return c.select(
        "scheme",
        F.col("__k").cast("int").alias("n_buckets"),
        F.col("__tot").cast("long").alias("n_users"),
        chi2r.alias("chi2"),
        (F.col("__k") - 1).cast("long").alias("dof"),
        crit.alias("crit_05"),
        F.when(chi2r > crit, 1).otherwise(0).cast("int").alias("srm_flag"),
    )


_ILV_N = 120


@register(
    "mix_interleave_schedule",
    f"""
    WITH w AS (
      SELECT doc_id,
             CAST(ceil(length(coalesce(text, '')) / 4.0) AS BIGINT) AS nt,
             source
      FROM documents
    ),
    per AS (
      SELECT source, CAST(sum(nt) AS BIGINT) AS tokens FROM w GROUP BY source
    ),
    tot AS (SELECT CAST(sum(tokens) AS DOUBLE) AS tt FROM per),
    sh AS (
      SELECT source, {R("CAST(tokens AS DOUBLE) / tot.tt", 8)} AS share
      FROM per CROSS JOIN tot
    ),
    ns AS (SELECT CAST(count(*) AS BIGINT) AS n FROM sh WHERE share > 0.0),
    emis AS (
      SELECT source, share,
             unnest(generate_series(1, CAST(ceil(({_ILV_N} + ns.n) * share) + 1 AS BIGINT))) AS j
      FROM sh CROSS JOIN ns WHERE share > 0.0
    ),
    timed AS (
      SELECT source, {R("CAST(j AS DOUBLE) / share", 9)} AS t FROM emis
    ),
    ranked AS (
      SELECT source, t,
             row_number() OVER (ORDER BY t ASC, source ASC) AS step
      FROM timed
    )
    SELECT CAST(step AS BIGINT) AS step, source, t AS sched_t
    FROM ranked WHERE step <= {_ILV_N}
    """,
)
def _q_mix_interleave_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DETERMINISTIC SOURCE-INTERLEAVE SCHEDULE for a training data
    loader: the first {_ILV_N} batch slots assigned to sources by the
    virtual-time rule (source s emits at times j/share_s; slots are
    emissions in time order) — the smooth-weighted-round-robin that
    keeps every prefix of the stream within one batch of the target
    token-share mix, where IID sampling wanders O(√n) off-mix and a
    naive block schedule front-loads big sources. The schedule TABLE
    is the artifact a reproducible loader ships (step → source), the
    mix-order counterpart of `mix_shuffle_shards`' intra-shard order.
    Emission times are one division each (9-dp-rounded so both
    engines order the same grid; ties break by source name); the
    candidate pool is Σ ceil((N+|sources|)·share_s)+1 ≈ N+2|sources|
    rows — sized to cover virtual time N+|sources|, the latest time
    the N-th slot can occur (a dominant source with share > 1/|sources|
    pushes tail slots past N+1/share, which an N·share pool would
    miss) — so the final rank is a bounded collect-and-explode, not a
    data-scale sort. One documents scan for the shares; everything
    after is |sources|-row arithmetic."""
    docs = _table(spark, sf_dir, "documents")
    per = docs.select(
        "source",
        F.ceil(
            F.length(F.coalesce(F.col("text"), F.lit(""))) / F.lit(4.0)
        ).cast("long").alias("__nt"),
    ).groupBy("source").agg(F.sum("__nt").cast("long").alias("__tokens"))
    tot = per.agg(F.sum("__tokens").cast("double").alias("__tt"))
    sh = per.crossJoin(F.broadcast(tot)).select(
        "source",
        rd(F.col("__tokens").cast("double") / F.col("__tt"), 8).alias("__share"),
    ).filter(F.col("__share") > 0.0)
    ns = sh.agg(F.count(F.lit(1)).cast("long").alias("__nsrc"))
    emis = sh.crossJoin(F.broadcast(ns)).select(
        "source",
        "__share",
        F.explode(
            F.sequence(
                F.lit(1).cast("long"),
                (
                    F.ceil(
                        (F.lit(_ILV_N) + F.col("__nsrc")) * F.col("__share")
                    )
                    + F.lit(1)
                ).cast("long"),
            )
        ).alias("__j"),
    )
    timed = emis.select(
        "source", rd(F.col("__j").cast("double") / F.col("__share"), 9).alias("__t")
    )
    row = timed.agg(
        F.sort_array(F.collect_list(F.struct("__t", "source"))).alias("__arr")
    )
    z = row.select(
        F.posexplode(F.slice(F.col("__arr"), 1, _ILV_N)).alias("__i", "__s")
    )
    return z.select(
        (F.col("__i") + 1).cast("long").alias("step"),
        F.col("__s.source").alias("source"),
        F.col("__s.__t").alias("sched_t"),
    )


@register(
    "dedup_family_agreement",
    f"""
    WITH shingled AS ({_SH_SQL}),
    sig AS ({_SIG_SQL}),
    bands AS (
      SELECT doc_id, b.band,
             md5(sig[b.band * 2 + 1] || '|' || sig[b.band * 2 + 2]) AS key
      FROM sig, (VALUES (0), (1), (2), (3)) AS b(band)
    ),
    mh AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
    ),
    toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
    ),
    hashed AS (
      SELECT doc_id, ('0x' || substr(md5(tok), 1, 15))::BIGINT AS h FROM toks
    ),
    bits AS (SELECT doc_id, {_SIMHASH_BITS_SQL} FROM hashed GROUP BY doc_id),
    fp AS (SELECT doc_id, {_SIMHASH_FP_SQL} AS simhash FROM bits),
    ck AS (
      SELECT doc_id, simhash, cb.combo_id, {_SIMHASH_KEY_SQL} AS cv
      FROM fp, (VALUES {_SIMHASH_COMBO_VALUES}) cb(combo_id, {_SIMHASH_COMBO_COLS})
    ),
    shp AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM ck a JOIN ck b
        ON a.combo_id = b.combo_id AND a.cv = b.cv AND a.doc_id < b.doc_id
      WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
    ),
    u AS (
      SELECT coalesce(m.id_a, s.id_a) AS id_a,
             coalesce(m.id_b, s.id_b) AS id_b,
             CASE WHEN m.id_a IS NOT NULL THEN 1 ELSE 0 END AS in_mh,
             CASE WHEN s.id_a IS NOT NULL THEN 1 ELSE 0 END AS in_sh
      FROM mh m FULL OUTER JOIN shp s
        ON s.id_a = m.id_a AND s.id_b = m.id_b
    ),
    agg AS (
      SELECT CAST(sum(in_mh) AS BIGINT) AS n_minhash,
             CAST(sum(in_sh) AS BIGINT) AS n_simhash,
             CAST(sum(in_mh * in_sh) AS BIGINT) AS n_both,
             CAST(count(*) AS BIGINT) AS n_union
      FROM u
    )
    SELECT n_minhash, n_simhash, n_both, n_union,
           CASE WHEN n_union > 0 THEN
             {R("CAST(n_both AS DOUBLE) / n_union", 6)}
           END AS overlap_jaccard,
           CASE WHEN n_minhash + n_simhash > 0 THEN
             {R("2.0 * n_both / (CAST(n_minhash AS DOUBLE) + n_simhash)", 6)}
           END AS dice
    FROM agg
    """,
)
def _q_dedup_family_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """METHOD-AGREEMENT audit between the two near-dup families:
    MinHash-LSH candidate pairs (Jaccard lens) vs pigeonhole-blocked
    SimHash pairs (Hamming lens) — pair-set overlap Jaccard and Dice.
    The reading a dedup owner needs BEFORE trusting either eval
    report alone: high agreement → one cheap method suffices; low
    agreement → the two families see DIFFERENT duplication (shingle
    overlap vs token-multiset similarity) and the pipeline should
    run both (each family's recall eval, `dedup_lsh_eval_report` /
    `dedup_simhash_eval_report`, scores against its OWN ground truth
    and cannot see this). Both generators are the proven bounded
    ones; the comparison is one full-outer join on the (bounded)
    pair keys + a 1-row agg. Zero new machinery — pure composition."""
    docs = _table(spark, sf_dir, "documents")
    mh = dd.minhash_lsh_pairs(docs).select("id_a", "id_b", F.lit(1).alias("__mh"))
    fp = dd.simhash(docs)
    sh = dd.simhash_pairs(fp, max_hamming=3, n_chunks=_SIMHASH_M).select(
        "id_a", "id_b", F.lit(1).alias("__sh")
    )
    u = mh.join(sh.hint("shuffle_hash"), ["id_a", "id_b"], "full_outer").select(
        F.coalesce(F.col("__mh"), F.lit(0)).alias("__m"),
        F.coalesce(F.col("__sh"), F.lit(0)).alias("__s"),
    )
    agg = u.agg(
        F.sum("__m").cast("long").alias("n_minhash"),
        F.sum("__s").cast("long").alias("n_simhash"),
        F.sum(F.col("__m") * F.col("__s")).cast("long").alias("n_both"),
        F.count(F.lit(1)).cast("long").alias("n_union"),
    )
    return agg.select(
        "n_minhash",
        "n_simhash",
        "n_both",
        "n_union",
        F.when(
            F.col("n_union") > 0,
            rd(F.col("n_both").cast("double") / F.col("n_union"), 6),
        ).alias("overlap_jaccard"),
        F.when(
            F.col("n_minhash") + F.col("n_simhash") > 0,
            rd(
                F.lit(2.0) * F.col("n_both")
                / (F.col("n_minhash").cast("double") + F.col("n_simhash")),
                6,
            ),
        ).alias("dice"),
    )


@register(
    "privacy_qi_risk_sweep",
    f"""
    WITH base AS (
      SELECT event_type,
             CAST((epoch_us(ts) // 3600000000) % 24 AS VARCHAR) AS hod,
             CAST((epoch_us(ts) // 86400000000 + 4) % 7 AS VARCHAR) AS dow
      FROM events
    ),
    m AS (
      SELECT 'type' AS qi_set, event_type AS qk FROM base
      UNION ALL
      SELECT 'type+hour', event_type || '|' || hod FROM base
      UNION ALL
      SELECT 'type+hour+dow', event_type || '|' || hod || '|' || dow FROM base
    ),
    g AS (SELECT qi_set, qk, count(*) AS k FROM m GROUP BY qi_set, qk),
    agg AS (
      SELECT qi_set,
             CAST(count(*) AS BIGINT) AS n_groups,
             CAST(min(k) AS BIGINT) AS min_k,
             CAST(sum(k) AS BIGINT) AS n_rows,
             CAST(sum(CASE WHEN k < 5 THEN k ELSE 0 END) AS BIGINT) AS rows_at_risk
      FROM g GROUP BY qi_set
    )
    SELECT qi_set, n_groups, min_k, n_rows, rows_at_risk,
           {R("CAST(rows_at_risk AS DOUBLE) / n_rows", 6)} AS risk_share,
           CAST(CASE WHEN min_k >= 5 THEN 1 ELSE 0 END AS INTEGER) AS k5_anonymous
    FROM agg
    """,
)
def _q_privacy_qi_risk_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """QUASI-IDENTIFIER dimensionality sweep — how re-identification
    risk GROWS as attributes stack (Sweeney's 87%-from-three-attrs
    result, as a query): for QI sets {{type}}, {{type,hour}},
    {{type,hour,dow}}, the equivalence-class count, the smallest
    class (the k in k-anonymity), and the share of rows in classes
    below k=5. `privacy_k_anonymity_audit` judges ONE chosen QI set;
    this is the PLANNING view that picks which attributes a release
    can afford to keep before that audit runs. One scan fans the
    three key shapes scan-side (`stack`), one (set, key) count, one
    |sets|-row reduction — the same shape discipline as the Cramér's
    panel. 3-row output at any scale."""
    base = _events(spark, sf_dir).select(
        "event_type",
        (F.expr("unix_micros(cast(ts as timestamp)) div 3600000000") % 24)
        .cast("string")
        .alias("__hod"),
        ((F.expr("unix_micros(cast(ts as timestamp)) div 86400000000") + 4) % 7)
        .cast("string")
        .alias("__dow"),
    )
    m = base.select(
        F.expr(
            "stack(3,"
            " 'type', event_type,"
            " 'type+hour', concat(event_type, '|', __hod),"
            " 'type+hour+dow', concat(event_type, '|', __hod, '|', __dow)"
            ") as (qi_set, qk)"
        )
    )
    g = m.groupBy("qi_set", "qk").agg(F.count(F.lit(1)).alias("__k"))
    agg = g.groupBy("qi_set").agg(
        F.count(F.lit(1)).cast("long").alias("n_groups"),
        F.min("__k").cast("long").alias("min_k"),
        F.sum("__k").cast("long").alias("n_rows"),
        F.sum(F.when(F.col("__k") < 5, F.col("__k")).otherwise(0))
        .cast("long")
        .alias("rows_at_risk"),
    )
    return agg.select(
        "qi_set",
        "n_groups",
        "min_k",
        "n_rows",
        "rows_at_risk",
        rd(F.col("rows_at_risk").cast("double") / F.col("n_rows"), 6).alias(
            "risk_share"
        ),
        F.when(F.col("min_k") >= 5, 1).otherwise(0).cast("int").alias("k5_anonymous"),
    )


@register(
    "stats_tost_equivalence_by_type",
    f"""
    WITH ev AS (
      SELECT event_type, epoch_us(ts) AS us, value AS v
      FROM events WHERE value IS NOT NULL
    ),
    rng AS (SELECT min(us) AS u0, max(us) AS u1 FROM ev),
    f AS (
      SELECT event_type, v,
             CASE WHEN us <= (u0 + u1) // 2 THEN 1 ELSE 0 END AS isa
      FROM ev CROSS JOIN rng
    ),
    g AS (
      SELECT event_type,
             sum(isa) AS n_a, sum(1 - isa) AS n_b,
             CAST(sum(CASE WHEN isa = 1 THEN CAST({R("v", 6)} AS DECIMAL(38,6)) ELSE CAST(0 AS DECIMAL(38,6)) END) AS DOUBLE) AS sa,
             CAST(sum(CASE WHEN isa = 0 THEN CAST({R("v", 6)} AS DECIMAL(38,6)) ELSE CAST(0 AS DECIMAL(38,6)) END) AS DOUBLE) AS sb,
             CAST(sum(CASE WHEN isa = 1 THEN CAST({R("v * v", 6)} AS DECIMAL(38,6)) ELSE CAST(0 AS DECIMAL(38,6)) END) AS DOUBLE) AS qa,
             CAST(sum(CASE WHEN isa = 0 THEN CAST({R("v * v", 6)} AS DECIMAL(38,6)) ELSE CAST(0 AS DECIMAL(38,6)) END) AS DOUBLE) AS qb
      FROM f GROUP BY event_type
    ),
    m AS (
      SELECT event_type,
             CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
             sa / n_a AS ma, sb / n_b AS mb,
             GREATEST((qa - sa * sa / n_a) / (n_a - 1), 0) AS va,
             GREATEST((qb - sb * sb / n_b) / (n_b - 1), 0) AS vb
      FROM g WHERE n_a > 1 AND n_b > 1
    ),
    t AS (
      SELECT event_type, n_a, n_b,
             mb - ma AS d,
             sqrt(va / n_a + vb / n_b) AS se,
             0.2 * sqrt(va) AS margin
      FROM m
    )
    SELECT event_type, n_a, n_b,
           {R("d", 6)} AS mean_diff,
           {R("se", 6)} AS se,
           {R("margin", 6)} AS margin,
           CASE WHEN se > 0.0 THEN {R("(d + margin) / se", 6)} END AS z_lower,
           CASE WHEN se > 0.0 THEN {R("(margin - d) / se", 6)} END AS z_upper,
           CAST(CASE WHEN se > 0.0
                      AND {R("(d + margin) / se", 6)} > 1.645
                      AND {R("(margin - d) / se", 6)} > 1.645
                THEN 1 ELSE 0 END AS INTEGER) AS equivalent
    FROM t
    """,
)
def _q_stats_tost_equivalence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TOST EQUIVALENCE test per event type (two one-sided Welch z
    tests between the time halves, margin δ = 0.2·σ_first-half) — the
    test the drift family is MISSING a direction for: KS/MW/PSI can
    only REJECT sameness; failing to reject proves nothing. TOST
    inverts the burden — both one-sided tests clearing 1.645 AFFIRMS
    the halves are within δ (the "no regression" launch criterion,
    Schuirmann 1987). Moments accumulate as 6-dp decimal sums (value
    and value² both), variances/SE are closed-form IEEE on those
    exact sums, δ is data-derived from the FIRST half only (the
    invariant-13 degeneracy rule: a drifted second half cannot widen
    its own acceptance margin). One event_type exchange + the 1-row
    time-midpoint broadcast. |types|-row output."""
    ev = _events(spark, sf_dir).filter(F.col("value").isNotNull())
    us = event_micros(ev)
    base = ev.select("event_type", us.alias("__us"), F.col("value").alias("__v"))
    rng = base.agg(F.min("__us").alias("__u0"), F.max("__us").alias("__u1"))
    flagged = base.crossJoin(F.broadcast(rng)).select(
        "event_type",
        "__v",
        F.when(F.col("__us") <= F.expr("(__u0 + __u1) DIV 2"), 1)
        .otherwise(0)
        .alias("__isa"),
    )

    def _dside(cond, term):
        return (
            F.sum(
                F.when(cond, rd(term, 6).cast("decimal(38,6)")).otherwise(
                    F.lit(0).cast("decimal(38,6)")
                )
            ).cast("double")
        )

    isa = F.col("__isa") == 1
    g = flagged.groupBy("event_type").agg(
        F.sum("__isa").cast("long").alias("__na"),
        F.sum(F.lit(1) - F.col("__isa")).cast("long").alias("__nb"),
        _dside(isa, F.col("__v")).alias("__sa"),
        _dside(~isa, F.col("__v")).alias("__sb"),
        _dside(isa, F.col("__v") * F.col("__v")).alias("__qa"),
        _dside(~isa, F.col("__v") * F.col("__v")).alias("__qb"),
    ).filter((F.col("__na") > 1) & (F.col("__nb") > 1))
    na_d = F.col("__na").cast("double")
    nb_d = F.col("__nb").cast("double")
    ma = F.col("__sa") / na_d
    mb = F.col("__sb") / nb_d
    # Clamp at 0: the 6-dp-rounded v/v² sums can make a near-constant
    # slice's sample variance go slightly negative, which would NaN the
    # sqrt here and range-error DuckDB's sqrt on the oracle side.
    va = F.greatest(
        (F.col("__qa") - F.col("__sa") * F.col("__sa") / na_d) / (na_d - 1),
        F.lit(0.0),
    )
    vb = F.greatest(
        (F.col("__qb") - F.col("__sb") * F.col("__sb") / nb_d) / (nb_d - 1),
        F.lit(0.0),
    )
    t = g.select(
        "event_type",
        F.col("__na").alias("n_a"),
        F.col("__nb").alias("n_b"),
        (mb - ma).alias("__d"),
        F.sqrt(va / na_d + vb / nb_d).alias("__se"),
        (F.lit(0.2) * F.sqrt(va)).alias("__margin"),
    )
    zl = rd((F.col("__d") + F.col("__margin")) / F.col("__se"), 6)
    zu = rd((F.col("__margin") - F.col("__d")) / F.col("__se"), 6)
    se_pos = F.col("__se") > 0.0
    return t.select(
        "event_type",
        "n_a",
        "n_b",
        rd(F.col("__d"), 6).alias("mean_diff"),
        rd(F.col("__se"), 6).alias("se"),
        rd(F.col("__margin"), 6).alias("margin"),
        F.when(se_pos, zl).alias("z_lower"),
        F.when(se_pos, zu).alias("z_upper"),
        F.when(se_pos & (zl > 1.645) & (zu > 1.645), 1)
        .otherwise(0)
        .cast("int")
        .alias("equivalent"),
    )


@register(
    "eval_f1_threshold_sweep",
    f"""
    WITH {_HLS_VS_C4_SQL},
    b AS (
      SELECT least(CAST(floor((round(sc.logit * 1000000, 0) + 500000)
                               / 10000) AS INT), 99) AS bin,
             CASE WHEN surv.doc_id IS NOT NULL THEN 1 ELSE 0 END AS pass
      FROM sc LEFT JOIN surv ON surv.doc_id = sc.doc_id
    ),
    bins AS (
      SELECT bin, count(*) AS n, sum(pass) AS np FROM b GROUP BY bin
    ),
    tot AS (SELECT sum(np) AS p FROM bins),
    cum AS (
      SELECT bin,
             sum(np) OVER (ORDER BY bin DESC ROWS UNBOUNDED PRECEDING) AS tp,
             sum(n - np) OVER (ORDER BY bin DESC ROWS UNBOUNDED PRECEDING) AS fp
      FROM bins
    ),
    sc2 AS (
      SELECT bin, CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
             CAST(t.p - tp AS BIGINT) AS fn,
             CASE WHEN 2 * tp + fp + (t.p - tp) > 0 THEN
               {R("2.0 * tp / (2.0 * tp + fp + (t.p - tp))", 6)}
             ELSE 0.0 END AS f1
      FROM cum CROSS JOIN tot t
    ),
    mx AS (SELECT max(f1) AS mf FROM sc2),
    mb AS (SELECT min(bin) AS mbin FROM sc2 CROSS JOIN mx WHERE f1 = mf)
    SELECT CAST(s.bin AS INTEGER) AS bin,
           {R("s.bin / 100.0 - 0.5", 6)} AS threshold_logit,
           s.tp, s.fp, s.fn,
           CASE WHEN s.tp + s.fp > 0 THEN {R("CAST(s.tp AS DOUBLE) / (s.tp + s.fp)", 6)} END AS prec,
           CASE WHEN s.tp + s.fn > 0 THEN {R("CAST(s.tp AS DOUBLE) / (s.tp + s.fn)", 6)} END AS recall,
           s.f1,
           CAST(CASE WHEN s.f1 = mx.mf AND s.bin = mb.mbin THEN 1 ELSE 0 END AS INTEGER) AS is_best
    FROM sc2 s CROSS JOIN mx CROSS JOIN mb
    """,
)
def _q_eval_f1_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL THRESHOLD SWEEP for the cheap scorer: every occupied
    6-dp-grid score bin as a candidate cut (predict keep when
    bin ≥ t), with TP/FP/FN, precision, recall, F1, and the best-F1
    row flagged (ties → lowest threshold) — the OPERATING-POINT
    CHOOSER that closes the eval family's loop: calibration shows the
    shape, AUC/PR judge the ranking, lift/gains price retention,
    confusion audits ONE point, and THIS picks the point. Same
    factored scorer/label and the AUC query's 100 fixed bins;
    cumulative TP/FP are suffix sums over ≤100 collected rows (the
    BH/lift fold pattern — no keyless window); counts exact, ratios
    6-dp. ≤100-row output at any corpus size."""
    docs = _table(spark, sf_dir, "documents")
    scores = tx.hashed_linear_score(docs).select("doc_id", "logit")
    surv = tx.c4_filter_survivors(docs).select("doc_id", F.lit(1).alias("__pass"))
    j = scores.join(surv.hint("shuffle_hash"), "doc_id", "left")
    bin_col = F.least(
        F.floor(
            (F.round(F.col("logit") * 1000000, 0) + F.lit(500000)) / F.lit(10000)
        ).cast("int"),
        F.lit(99),
    )
    bins = (
        j.select(bin_col.alias("__bin"), F.coalesce(F.col("__pass"), F.lit(0)).alias("__p"))
        .groupBy("__bin")
        .agg(F.count(F.lit(1)).alias("__n"), F.sum("__p").alias("__np"))
    )
    row = bins.agg(
        F.reverse(
            F.sort_array(F.collect_list(F.struct("__bin", "__n", "__np")))
        ).alias("__arr"),
        F.sum("__np").cast("long").alias("__p"),
    )
    arr = F.col("__arr")

    def _suffix(field):
        return F.transform(
            F.sequence(F.lit(1), F.size(arr)),
            lambda i: F.aggregate(
                F.slice(arr, F.lit(1), i),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x[field],
            ),
        )

    tp_arr = _suffix("__np")
    n_arr = _suffix("__n")
    z = row.select(
        "__p",
        F.explode(
            F.arrays_zip(arr, tp_arr.alias("__tp"), n_arr.alias("__cn"))
        ).alias("__z"),
    ).select(
        F.col("__z.__arr.__bin").alias("bin"),
        F.col("__z.__tp").alias("tp"),
        (F.col("__z.__cn") - F.col("__z.__tp")).alias("fp"),
        (F.col("__p") - F.col("__z.__tp")).alias("fn"),
    )
    f1 = F.when(
        F.lit(2) * F.col("tp") + F.col("fp") + F.col("fn") > 0,
        rd(
            F.lit(2.0) * F.col("tp")
            / (F.lit(2.0) * F.col("tp") + F.col("fp") + F.col("fn")),
            6,
        ),
    ).otherwise(F.lit(0.0))
    sc2 = z.select(
        "bin",
        F.col("tp").cast("long").alias("tp"),
        F.col("fp").cast("long").alias("fp"),
        F.col("fn").cast("long").alias("fn"),
        f1.alias("f1"),
    )
    mx = sc2.agg(F.max("f1").alias("__mf"))
    mb = (
        sc2.crossJoin(F.broadcast(mx))
        .filter(F.col("f1") == F.col("__mf"))
        .agg(F.min("bin").alias("__mbin"))
    )
    return (
        sc2.crossJoin(F.broadcast(mx))
        .crossJoin(F.broadcast(mb))
        .select(
            F.col("bin").cast("int").alias("bin"),
            rd(F.col("bin") / F.lit(100.0) - F.lit(0.5), 6).alias("threshold_logit"),
            "tp",
            "fp",
            "fn",
            F.when(
                F.col("tp") + F.col("fp") > 0,
                rd(F.col("tp").cast("double") / (F.col("tp") + F.col("fp")), 6),
            ).alias("prec"),
            F.when(
                F.col("tp") + F.col("fn") > 0,
                rd(F.col("tp").cast("double") / (F.col("tp") + F.col("fn")), 6),
            ).alias("recall"),
            "f1",
            F.when(
                (F.col("f1") == F.col("__mf")) & (F.col("bin") == F.col("__mbin")), 1
            )
            .otherwise(0)
            .cast("int")
            .alias("is_best"),
        )
    )



@register(
    "sketch_kmv_error_vs_k",
    """SELECT CAST(64 AS INTEGER) AS k, q.source, q.n_kept, q.est_distinct, q.exact_distinct, (floor((q.est_distinct - q.exact_distinct) / q.exact_distinct * 1000000.0 + 0.5) / 1000000.0) AS rel_err FROM (
    WITH hashed AS (
      SELECT DISTINCT source AS g, ('0x' || substr(md5('tsdt|kmv' || '|' || CAST(token AS VARCHAR)), 1, 8))::BIGINT AS u FROM (SELECT source, t.token FROM documents, LATERAL (SELECT unnest(string_split(trim(text), ' ')) AS token) t WHERE len(t.token) > 0 AND text IS NOT NULL) tt
    ),
    ranked AS (
      SELECT g, u, row_number() OVER (PARTITION BY g ORDER BY u ASC) AS rn
      FROM hashed
    ),
    exact AS (SELECT g, count(*) AS exact_distinct FROM hashed GROUP BY g),
    kept AS (
      SELECT g, count(*) AS n_kept, max(u) AS kth
      FROM ranked WHERE rn <= 64 GROUP BY g
    )
    SELECT kept.g AS source, kept.n_kept,
           (floor((CASE WHEN kept.n_kept < 64 THEN CAST(kept.n_kept AS DOUBLE) ELSE 63.0 * 4294967296.0 / CAST(kept.kth AS DOUBLE) END) * 1000000.0 + 0.5) / 1000000.0) AS est_distinct,
           exact.exact_distinct
    FROM kept JOIN exact ON kept.g = exact.g
    
) q
UNION ALL
SELECT CAST(256 AS INTEGER) AS k, q.source, q.n_kept, q.est_distinct, q.exact_distinct, (floor((q.est_distinct - q.exact_distinct) / q.exact_distinct * 1000000.0 + 0.5) / 1000000.0) AS rel_err FROM (
    WITH hashed AS (
      SELECT DISTINCT source AS g, ('0x' || substr(md5('tsdt|kmv' || '|' || CAST(token AS VARCHAR)), 1, 8))::BIGINT AS u FROM (SELECT source, t.token FROM documents, LATERAL (SELECT unnest(string_split(trim(text), ' ')) AS token) t WHERE len(t.token) > 0 AND text IS NOT NULL) tt
    ),
    ranked AS (
      SELECT g, u, row_number() OVER (PARTITION BY g ORDER BY u ASC) AS rn
      FROM hashed
    ),
    exact AS (SELECT g, count(*) AS exact_distinct FROM hashed GROUP BY g),
    kept AS (
      SELECT g, count(*) AS n_kept, max(u) AS kth
      FROM ranked WHERE rn <= 256 GROUP BY g
    )
    SELECT kept.g AS source, kept.n_kept,
           (floor((CASE WHEN kept.n_kept < 256 THEN CAST(kept.n_kept AS DOUBLE) ELSE 255.0 * 4294967296.0 / CAST(kept.kth AS DOUBLE) END) * 1000000.0 + 0.5) / 1000000.0) AS est_distinct,
           exact.exact_distinct
    FROM kept JOIN exact ON kept.g = exact.g
    
) q
UNION ALL
SELECT CAST(1024 AS INTEGER) AS k, q.source, q.n_kept, q.est_distinct, q.exact_distinct, (floor((q.est_distinct - q.exact_distinct) / q.exact_distinct * 1000000.0 + 0.5) / 1000000.0) AS rel_err FROM (
    WITH hashed AS (
      SELECT DISTINCT source AS g, ('0x' || substr(md5('tsdt|kmv' || '|' || CAST(token AS VARCHAR)), 1, 8))::BIGINT AS u FROM (SELECT source, t.token FROM documents, LATERAL (SELECT unnest(string_split(trim(text), ' ')) AS token) t WHERE len(t.token) > 0 AND text IS NOT NULL) tt
    ),
    ranked AS (
      SELECT g, u, row_number() OVER (PARTITION BY g ORDER BY u ASC) AS rn
      FROM hashed
    ),
    exact AS (SELECT g, count(*) AS exact_distinct FROM hashed GROUP BY g),
    kept AS (
      SELECT g, count(*) AS n_kept, max(u) AS kth
      FROM ranked WHERE rn <= 1024 GROUP BY g
    )
    SELECT kept.g AS source, kept.n_kept,
           (floor((CASE WHEN kept.n_kept < 1024 THEN CAST(kept.n_kept AS DOUBLE) ELSE 1023.0 * 4294967296.0 / CAST(kept.kth AS DOUBLE) END) * 1000000.0 + 0.5) / 1000000.0) AS est_distinct,
           exact.exact_distinct
    FROM kept JOIN exact ON kept.g = exact.g
    
) q""",
)
def _q_sketch_kmv_error_vs_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV ACCURACY-vs-BUDGET curve: the per-source distinct-token
    estimate at k ∈ {64, 256, 1024} registers next to the exact
    count — the measured error curve that picks the register budget
    BEFORE a 100 TB run commits to one (the distinct-count sibling of
    `sketch_quantile_error_report`; theory says σ ≈ 1/√(k−2), the
    table shows what THIS corpus does, including the saturation
    regime where k exceeds the true cardinality and the sketch turns
    exact). Three runs of the proven `sk.kmv_distinct` (distinct
    narrow (group, hash) pairs, bottom-k keyed window, ≤k longs of
    state) unioned with a k column. |sources|×3-row output."""
    import time_series_data_trimmer_spark.operators.sketches as sk

    docs = _table(spark, sf_dir, "documents")
    toks = (
        docs.filter(F.col("text").isNotNull())
        .select(
            "source", F.explode(F.split(F.trim(F.col("text")), " ")).alias("token")
        )
        .filter(F.length("token") > 0)
    )
    parts = []
    for kk in (64, 256, 1024):
        r = sk.kmv_distinct(toks, "source", "token", k=kk).select(
            F.lit(kk).cast("int").alias("k"),
            "source",
            "n_kept",
            "est_distinct",
            "exact_distinct",
            rd(
                (F.col("est_distinct") - F.col("exact_distinct"))
                / F.col("exact_distinct"),
                6,
            ).alias("rel_err"),
        )
        parts.append(r)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


@register(
    "text_vocab_coverage_by_freq_band",
    f"""
    WITH toks AS (
      SELECT t.token
      FROM documents,
           LATERAL (SELECT unnest(string_split(trim(text), ' ')) AS token) t
      WHERE len(t.token) > 0 AND text IS NOT NULL
    ),
    freq AS (SELECT token, count(*) AS n FROM toks GROUP BY token),
    banded AS (
      SELECT length(bin(n)) - 1 AS band, n FROM freq
    ),
    b AS (
      SELECT band, count(*) AS n_types, CAST(sum(n) AS BIGINT) AS mass
      FROM banded GROUP BY band
    ),
    tot AS (SELECT CAST(sum(mass) AS DOUBLE) AS tm, sum(n_types) AS tv FROM b),
    cum AS (
      SELECT band, n_types, mass,
             sum(mass) OVER (ORDER BY band DESC ROWS UNBOUNDED PRECEDING) AS cmass,
             sum(n_types) OVER (ORDER BY band DESC ROWS UNBOUNDED PRECEDING) AS ctypes
      FROM b
    )
    SELECT CAST(c.band AS INTEGER) AS band,
           CAST(CAST(1 AS BIGINT) << c.band AS BIGINT) AS min_freq,
           CAST(c.n_types AS BIGINT) AS n_types,
           c.mass,
           {R("CAST(c.mass AS DOUBLE) / t.tm", 6)} AS mass_share,
           {R("CAST(c.cmass AS DOUBLE) / t.tm", 6)} AS coverage_from_top,
           CAST(c.ctypes AS BIGINT) AS vocab_from_top
    FROM cum c CROSS JOIN tot t
    """,
)
def _q_text_vocab_coverage_by_freq_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VOCAB COVERAGE curve by frequency band — the tokenizer-design
    readout `text_vocab_growth` (new types per doc) and
    `text_token_percentiles` (lengths) don't give: for each power-of-
    two frequency band, how many token TYPES live there and what
    share of the corpus TOKEN MASS the bands from the top down cover
    — i.e. "a vocab of the N most-frequent types covers X% of
    running text", the Zipf-head table that sizes a vocabulary before
    training (read next to `text_zipf_slope_by_source`, and against
    `feature_hashing_collision_report` when the vocab will be hashed
    instead). The band is floor(log2(n)) computed EXACTLY as
    length(bin(n))−1 — no libm log at a power-of-two boundary can
    disagree between engines. One token scan + one vocab-bounded agg;
    the cumulative walk is over ≤~25 band rows (collect-and-fold).
    ~|bands|-row output at any scale."""
    docs = _table(spark, sf_dir, "documents")
    freq = (
        docs.filter(F.col("text").isNotNull())
        .select(F.explode(F.split(F.trim(F.col("text")), " ")).alias("token"))
        .filter(F.length("token") > 0)
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("__n"))
    )
    b = freq.select(
        (F.length(F.expr("bin(__n)")) - 1).alias("band"), F.col("__n")
    ).groupBy("band").agg(
        F.count(F.lit(1)).alias("__types"), F.sum("__n").cast("long").alias("__mass")
    )
    row = b.agg(
        F.reverse(
            F.sort_array(F.collect_list(F.struct("band", "__types", "__mass")))
        ).alias("__arr"),
        F.sum("__mass").cast("double").alias("__tm"),
    )
    arr = F.col("__arr")

    def _suffix(field):
        return F.transform(
            F.sequence(F.lit(1), F.size(arr)),
            lambda i: F.aggregate(
                F.slice(arr, F.lit(1), i),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x[field],
            ),
        )

    z = row.select(
        "__tm",
        F.explode(
            F.arrays_zip(arr, _suffix("__mass").alias("__cm"), _suffix("__types").alias("__ct"))
        ).alias("__z"),
    )
    return z.select(
        F.col("__z.__arr.band").cast("int").alias("band"),
        F.expr("shiftleft(cast(1 as bigint), __z.__arr.band)").alias("min_freq"),
        F.col("__z.__arr.__types").cast("long").alias("n_types"),
        F.col("__z.__arr.__mass").cast("long").alias("mass"),
        rd(F.col("__z.__arr.__mass").cast("double") / F.col("__tm"), 6).alias(
            "mass_share"
        ),
        rd(F.col("__z.__cm").cast("double") / F.col("__tm"), 6).alias(
            "coverage_from_top"
        ),
        F.col("__z.__ct").cast("long").alias("vocab_from_top"),
    )
