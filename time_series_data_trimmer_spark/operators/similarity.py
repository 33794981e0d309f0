"""Similarity search over embedding columns (``array<float>``).

Brute-force cosine top-k as the exact baseline, plus an LSH-bucketed
(random-hyperplane) variant as the 100 TB scale path.

Scale design:

* Brute force broadcasts the (tiny) query vector and computes the dot
  product scan-side with ``zip_with``/``aggregate`` — JVM higher-order
  functions, no Python, no shuffle until the final top-k (which is a
  ``TakeOrdered`` — map-side partial top-k, only k rows per partition
  move).
* The LSH variant assigns each vector to a signed-hyperplane bucket
  signature computed from deterministic md5-seeded pseudo-random
  planes; queries probe only their own bucket (and optionally
  neighbors), turning O(N) scans into O(N/2^bits).
* Deterministic cross-engine dot products (for oracle checks) come
  from exact DECIMAL accumulation of per-position products — float
  summation order never matters.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product (JVM, no UDF)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(_dot(a, a))


def cosine_similarity(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k against a literal query vector.

    The query vector enters the plan as an array literal (broadcast by
    value); ordering ties break on the id for determinism.
    """
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    scored = df.select(
        F.col(id_col), cosine_similarity(F.col(vec_col), q).alias("cosine")
    )
    return scored.orderBy(F.col("cosine").desc(), F.col(id_col).asc()).limit(k)


def pairwise_topk(
    df: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Top-k neighbors for EVERY query row (broadcast the query set,
    rank per query) — the batch form of brute-force ANN."""
    from pyspark.sql import Window

    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    )
    joined = df.crossJoin(F.broadcast(q)).filter(F.col(id_col) != F.col("query_id"))
    scored = joined.select(
        "query_id",
        F.col(id_col).alias("neighbor_id"),
        cosine_similarity(F.col(vec_col), F.col("qvec")).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id").asc())
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


# ---------------------------------------------------------------------------
# LSH (random hyperplane) — the scale path
# ---------------------------------------------------------------------------


def _hyperplanes(dim: int, bits: int, seed: str = "tsdt") -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes from md5(seed|bit|i):
    reproducible across engines and sessions, no RNG state."""
    planes = []
    for b in range(bits):
        row = []
        for i in range(dim):
            h = hashlib.md5(f"{seed}|{b}|{i}".encode()).hexdigest()
            # map 8 hex digits → [-1, 1)
            row.append(int(h[:8], 16) / float(2**31) - 1.0)
        planes.append(row)
    return planes


def lsh_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """Signed-hyperplane signature: bit b = 1 iff vec·plane_b > 0."""
    sig = F.lit(0).cast("long")
    for b, plane in enumerate(planes):
        p = F.array(*[F.lit(x) for x in plane])
        sig = sig + F.when(_dot(vec, p) > 0, F.lit(2**b).cast("long")).otherwise(F.lit(0).cast("long"))
    return sig


def lsh_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    bits: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: str = "tsdt",
) -> DataFrame:
    """Approximate top-k: score only vectors sharing the query's
    hyperplane bucket. At scale the bucket column is precomputed and
    the table is partitioned by it, so a probe reads one partition."""
    dim = len(query_vec)
    planes = _hyperplanes(dim, bits, seed)
    qsig = 0
    for b, plane in enumerate(planes):
        if sum(float(q) * p for q, p in zip(query_vec, plane)) > 0:
            qsig += 2**b
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    bucketed = df.withColumn("bucket", lsh_bucket(F.col(vec_col), planes))
    return (
        bucketed.filter(F.col("bucket") == qsig)
        .select(F.col(id_col), cosine_similarity(F.col(vec_col), q).alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col(id_col).asc())
        .limit(k)
    )


# ---------------------------------------------------------------------------
# deterministic (oracle-checkable) scoring
# ---------------------------------------------------------------------------


def decimal_dot(a: Column, b: Column, scale: int = 9) -> Column:
    """Dot product with exact-DECIMAL accumulation: each per-position
    product is rounded to ``scale`` decimals and summed as DECIMAL, so
    the result is bit-identical in any engine regardless of summation
    order. Precision 20 keeps scale 9 through addition ((20,9)+(20,9) →
    (21,9), lossless cast back for |dot| ≪ 10^11); at precision 38 the
    addition would widen to scale 8 and silently round every step."""
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    terms = F.transform(
        prods,
        lambda p: (F.floor(p * F.lit(float(10**scale)) + F.lit(0.5)) / F.lit(float(10**scale))).cast(
            "decimal(20,9)"
        ),
    )
    return F.aggregate(
        terms,
        F.lit(0).cast("decimal(20,9)"),
        lambda acc, v: (acc + v).cast("decimal(20,9)"),
    ).cast("double")


def decimal_cosine_vs_query(
    df: DataFrame,
    query_vec: list[float],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 9,
) -> DataFrame:
    """Cosine vs a query vector via `decimal_dot` — the oracle-compared
    scorer; the float path (`brute_force_topk`) is the production one."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    v = F.col(vec_col)
    return df.select(
        F.col(id_col),
        (decimal_dot(v, q, scale) / (F.sqrt(decimal_dot(v, v, scale)) * F.sqrt(decimal_dot(q, q, scale)))).alias("cosine"),
    )


def topk_similar_pairs(
    df: DataFrame,
    k: int = 20,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    deterministic: bool = True,
) -> DataFrame:
    """Embedding-cosine near-dup: the k most similar (id_a < id_b)
    pairs across the whole table. All-pairs — the exactness baseline
    the LSH bucket path (`lsh_topk` buckets) approximates at scale;
    norms are computed once per vector, the self-join streams only
    (id, vec, norm) tuples."""
    dot = decimal_dot if deterministic else (lambda a, b: _dot(a, b))
    base = df.select(
        F.col(id_col), F.col(vec_col).alias("v"),
        F.sqrt(dot(F.col(vec_col), F.col(vec_col))).alias("nrm"),
    )
    a, b = base.alias("a"), base.alias("b")
    pairs = a.join(b, F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
    cos = dot(F.col("a.v"), F.col("b.v")) / (F.col("a.nrm") * F.col("b.nrm"))
    return (
        pairs.select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            cos.alias("cosine"),
        )
        .orderBy(F.col("cosine").desc(), F.col("id_a").asc(), F.col("id_b").asc())
        .limit(k)
    )


# ---------------------------------------------------------------------------
# IVF (inverted-file) index — the coarse-quantization scale path
# ---------------------------------------------------------------------------


def ivf_centroids(
    df: DataFrame,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[tuple[int, list[float]]]:
    """Deterministic coarse centroids: the vectors whose md5(id) hashes
    are smallest — a reproducible pseudo-random sample (no RNG state,
    no k-means iterations; at 100 TB you'd refine these with a few
    Lloyd rounds over a sample, the index structure is identical)."""
    picked = (
        df.select(
            F.col(id_col), F.col(vec_col),
            F.md5(F.col(id_col).cast("string")).alias("__h"),
        )
        .orderBy("__h")
        .limit(n_centroids)
        .collect()
    )
    return [(i, [float(x) for x in row[vec_col]]) for i, row in enumerate(picked)]


def _sq_dist_to(vec: Column, center: list[float]) -> Column:
    c = F.array(*[F.lit(float(x)) for x in center])
    return F.aggregate(
        F.zip_with(vec, c, lambda x, y: (x.cast("double") - y) * (x.cast("double") - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def ivf_assign(
    df: DataFrame,
    centroids: list[tuple[int, list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign every vector to its nearest centroid (scan-side argmin over
    the broadcast centroid list). At scale, write the result partitioned
    by ``centroid_id`` — a probe then reads nprobe partitions only.

    argmin via array_min + array_position: an iterative when-chain would
    embed each previous step twice and blow the expression tree up
    exponentially in the centroid count (2^k nodes — observed as an
    analyzer hang at k=16)."""
    dists = F.array(*[_sq_dist_to(F.col(vec_col), center) for _cid, center in centroids])
    best = F.array_min(dists)
    # 1-based first-match position → centroid list index (ties → first)
    idx = (F.array_position(dists, best) - 1).cast("int")
    cid_lookup = F.array(*[F.lit(cid) for cid, _ in centroids])
    return df.select(
        F.col(id_col), F.col(vec_col),
        F.element_at(cid_lookup, idx + 1).alias("centroid_id"),
    )


def ivf_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: list[tuple[int, list[float]]] | None = None,
) -> DataFrame:
    """Approximate cosine top-k: score only the vectors assigned to the
    ``nprobe`` centroids nearest the query. O(N·nprobe/n_centroids)
    scan instead of O(N); exactness rises with nprobe (→ brute force at
    nprobe = n_centroids)."""
    centroids = centroids or ivf_centroids(df, n_centroids, id_col, vec_col)
    ranked = sorted(
        centroids,
        key=lambda c: sum((q - x) ** 2 for q, x in zip(query_vec, c[1])),
    )
    probe_ids = [cid for cid, _ in ranked[:nprobe]]
    assigned = ivf_assign(df, centroids, id_col, vec_col)
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    return (
        assigned.filter(F.col("centroid_id").isin(probe_ids))
        .select(F.col(id_col), cosine_similarity(F.col(vec_col), q).alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col(id_col).asc())
        .limit(k)
    )
