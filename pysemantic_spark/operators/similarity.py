"""Similarity search over embedding columns (array<float>).

- `cosine_topk`         — exact brute force: broadcast the (small) query
                          set, fused JVM dot products via zip_with/aggregate,
                          per-query top-k. The corpus is scanned once, never
                          shuffled; only (n_queries × k) rows survive.
- `lsh_bucketed_topk`   — scale path: random-hyperplane LSH buckets
                          (deterministic seeded planes) so each query only
                          scores its bucket's candidates; recall traded via
                          n_planes/probe count.
- `embedding_near_dup_pairs` — near-duplicate detection: cosine ≥ threshold
                          pairs via LSH bucket self-join.

At 100 TB the corpus side stays partition-local in all three: the only
shuffles are on bucket ids (bounded cardinality) and the final top-k agg
(n_queries groups).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v)
    )


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    k: int = 10,
) -> DataFrame:
    """Exact top-k by cosine: (query_id, vec_id, cos_sim), k rows/query.

    Queries broadcast (small side); per-query top-k via window row_number —
    Catalyst turns the per-group sort into partial top-k with AQE.
    Ties broken by vec_id for determinism."""
    q = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("_qvec")
    )
    scored = corpus.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("_cvec")
    ).crossJoin(F.broadcast(q))
    scored = scored.select(
        "query_id",
        "vec_id",
        F.round(cosine(F.col("_cvec"), F.col("_qvec")), 6).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def hyperplane_buckets_arrow(
    vec_col: Column, dim: int, n_planes: int, n_tables: int, seed: int = 42
) -> Column:
    """All tables' LSH bucket ids in ONE Arrow-batched matmul:
    array<long> of length n_tables.

    Matches ``hyperplane_bucket`` with seed ``seed + 7919*t`` for table t
    (same seeded planes, same sign rule) up to float summation order: the
    sequential fold and the BLAS matmul accumulate the dot product in
    different orders, so a dot within ~1e-12 of zero can flip sign and land
    the vector in a different bucket — harmless for LSH recall (such
    vectors sit ON the hyperplane; either bucket is equally valid), but the
    two paths are not guaranteed bit-identical on those measure-zero cases.
    Computes every (table, plane) dot product as one (batch × dim) @
    (dim × T·P) numpy matmul instead of T·P interpreted higher-order folds
    per row — the expression path is not codegen'd and measured ~10× slower
    at T·P ≳ 100."""
    planes = np.concatenate(
        [
            np.random.default_rng(seed + 7919 * t).standard_normal((n_planes, dim))
            for t in range(n_tables)
        ],
        axis=0,
    )  # (T*P, dim)
    weights = np.ascontiguousarray(planes.T)  # (dim, T*P)
    bit_vals = (1 << np.arange(n_planes, dtype=np.int64))  # per-table bit weights

    @F.pandas_udf("array<long>")
    def _buckets(vecs: pd.Series) -> pd.Series:
        mat = np.stack(vecs.to_numpy())  # (batch, dim)
        signs = (mat @ weights) >= 0  # (batch, T*P)
        bits = signs.reshape(len(mat), n_tables, n_planes)
        buckets = (bits * bit_vals).sum(axis=2)  # (batch, T)
        return pd.Series(list(buckets))

    return _buckets(vec_col)


def hyperplane_bucket(vec_col: Column, dim: int, n_planes: int = 12, seed: int = 42) -> Column:
    """LSH bucket id: sign pattern of dot products with seeded random
    hyperplanes, packed into an int. Deterministic across runs/workers
    (planes generated driver-side from the seed and folded into the plan
    as literals)."""
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_planes, dim))
    bucket = F.lit(0)
    for p in range(n_planes):
        row = planes[p]
        dot = F.aggregate(
            F.zip_with(
                vec_col,
                F.array(*[F.lit(float(v)) for v in row]),
                lambda x, y: x * y,
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bucket = bucket + F.when(dot >= 0, F.lit(1 << p)).otherwise(F.lit(0))
    return bucket


def lsh_bucketed_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    k: int = 10,
    n_planes: int = 8,
    n_probe_bits: int = 1,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: score only corpus rows in the query's LSH
    bucket(s), multi-probe.

    Join on bucket id instead of crossJoin — candidate set shrinks ~2^-p
    per plane. ``n_probe_bits=1`` (standard multi-probe) also probes every
    bucket one plane-flip away: a neighbor at per-plane agreement prob q
    is found with P(≥n_planes−1 planes agree) instead of P(all agree) —
    e.g. q=0.75, 8 planes: 0.10 → 0.37. Probes expand ONLY the broadcast
    query side (n_planes+1 rows per query); the corpus is hashed once and
    never shuffled. A (query, corpus) pair matches in at most one probe
    (the corpus row has a single bucket), so no candidate dedup is needed.
    ``n_probe_bits=0`` = exact-bucket only."""
    if n_probe_bits not in (0, 1):
        raise ValueError("n_probe_bits supports 0 (single) or 1 (multi-probe)")
    cb = corpus.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("_cvec"),
        hyperplane_bucket(F.col(vec_col), dim, n_planes, seed).alias("_bucket"),
    )
    qbase = hyperplane_bucket(F.col(vec_col), dim, n_planes, seed)
    probe_exprs = [qbase]
    if n_probe_bits == 1:
        probe_exprs += [qbase.bitwiseXOR(F.lit(1 << p)) for p in range(n_planes)]
    qb = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(vec_col).alias("_qvec"),
        F.explode(F.array(*probe_exprs)).alias("_bucket"),
    )
    scored = cb.join(F.broadcast(qb), on="_bucket").select(
        "query_id",
        "vec_id",
        F.round(cosine(F.col("_cvec"), F.col("_qvec")), 6).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def train_ivf_centroids(
    corpus: DataFrame,
    dim: int,
    n_centroids: int = 16,
    vec_col: str = "embedding",
    sample_size: int = 10_000,
    n_iters: int = 10,
    seed: int = 42,
) -> np.ndarray:
    """Coarse quantizer for IVF: k-means on a driver-side sample.

    At 10^9+ vectors you train on a bounded sample anyway — the centroids
    are a tiny (n_centroids × dim) model broadcast into the plan as
    literals; only the sample ever reaches the driver."""
    frac = min(1.0, sample_size / max(corpus.count(), 1))
    sample = (
        corpus.sample(fraction=frac, seed=seed)
        .select(vec_col)
        .toPandas()[vec_col]
    )
    x = np.array([np.asarray(v, dtype=np.float64) for v in sample])
    rng = np.random.default_rng(seed)
    cents = x[rng.choice(len(x), size=min(n_centroids, len(x)), replace=False)]
    for _ in range(n_iters):
        d = ((x[:, None, :] - cents[None, :, :]) ** 2).sum(-1)
        assign = d.argmin(1)
        for c in range(len(cents)):
            members = x[assign == c]
            if len(members):
                cents[c] = members.mean(0)
    return cents


def ivf_assign_expr(vec_col: Column, centroids: np.ndarray) -> Column:
    """Nearest-centroid id as a Column expr (argmin of squared L2),
    evaluated JVM-side against centroid literals."""
    best_id = F.lit(0)
    best_d = None
    for cid, cent in enumerate(centroids):
        lit_vec = F.array(*[F.lit(float(v)) for v in cent])
        d = F.aggregate(
            F.zip_with(vec_col, lit_vec, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        if best_d is None:
            best_d = d
        else:
            best_id = F.when(d < best_d, F.lit(cid)).otherwise(best_id)
            best_d = F.least(best_d, d)
    return best_id


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    k: int = 10,
    n_centroids: int = 16,
    seed: int = 42,
) -> DataFrame:
    """IVF approximate top-k: score only corpus rows in the query's coarse
    cluster (nprobe=1). Complements the hyperplane-LSH variant; both reduce
    the candidate set before the exact cosine scoring."""
    cents = train_ivf_centroids(
        corpus, dim, n_centroids=n_centroids, vec_col=vec_col, seed=seed
    )
    from pysemantic_spark.operators.dedup import _materialize

    cb = _materialize(
        corpus.select(
            F.col(id_col).alias("vec_id"),
            F.col(vec_col).alias("_cvec"),
            ivf_assign_expr(F.col(vec_col), cents).alias("_cluster"),
        )
    )
    qb = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(vec_col).alias("_qvec"),
        ivf_assign_expr(F.col(vec_col), cents).alias("_cluster"),
    )
    scored = cb.join(F.broadcast(qb), on="_cluster").select(
        "query_id",
        "vec_id",
        F.round(cosine(F.col("_cvec"), F.col("_qvec")), 6).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def embedding_near_dup_pairs(
    df: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    n_planes: int = 8,
    n_tables: int = 1,
    seed: int = 42,
) -> DataFrame:
    """Embedding-cosine near-dup pairs (id_a < id_b, cos_sim ≥ threshold)
    via MULTI-TABLE sign-LSH: candidates collide in ≥1 of ``n_tables``
    independent ``n_planes``-plane tables, then exact-cosine verify.

    Recall math (choose the operating point per target threshold): a pair
    at angle θ agrees on one random hyperplane with prob 1−θ/π, collides in
    one k-plane table with p = (1−θ/π)^k, and survives L tables with
    recall = 1 − (1−p)^L. Examples:
      cos ≥ 0.95 (θ≤18°): k=8 → p≈0.43; L=8  → recall ≈ 0.99
      cos ≥ 0.5  (θ≤60°): k=6 → p≈0.088; L=24 → recall ≈ 0.89
    A single table (round-1 default) has recall = p — 9% at cos 0.5, which
    silently dropped most qualifying pairs. Cost: candidates are
    distinct()'d across tables before the exact verify, so each pair pays
    the cosine once however many tables it collides in; shuffle volume is
    (id, 1 int bucket) per table, vectors join back only for candidates."""
    from pysemantic_spark.operators.dedup import _materialize

    base = _materialize(
        df.select(
            F.col(id_col).alias("_id"),
            F.col(vec_col).alias("_vec"),
            # one Arrow matmul for all tables' buckets — NOT n_tables
            # interpreted fold expressions (10× at n_tables·n_planes ≳ 100)
            hyperplane_buckets_arrow(
                F.col(vec_col), dim, n_planes, n_tables, seed
            ).alias("_buckets"),
        )
    )
    bucketed = base.select(
        "_id", F.posexplode("_buckets").alias("table", "bucket")
    )
    l, r = bucketed.alias("a"), bucketed.alias("b")
    cand = (
        l.join(r, on=["table", "bucket"])
        .filter(F.col("a._id") < F.col("b._id"))
        .select(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
        .distinct()
    )
    vecs = base.select("_id", "_vec")
    return (
        cand.join(vecs.withColumnsRenamed({"_id": "id_a", "_vec": "vec_a"}), "id_a")
        .join(vecs.withColumnsRenamed({"_id": "id_b", "_vec": "vec_b"}), "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(cosine(F.col("vec_a"), F.col("vec_b")), 6).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )
