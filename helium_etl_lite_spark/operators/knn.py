"""Embedding similarity operators: brute-force cosine top-k, nearest-
centroid assignment, and random-hyperplane LSH ANN.

Design for scale (north star): embeddings are array<float> columns; all
kernels run JVM-side via higher-order functions (zip_with/aggregate) —
no Python in the hot path. Brute-force is the exact baseline
(O(Q x N), broadcast the query side); the LSH variant buckets vectors
by hyperplane sign bits so candidate generation is a hash-partitioned
equi-join at 100 TB instead of a cross join.

Determinism: cosine is rounded to 6 decimals before ranking and ties
break on vec_id, so results are reproducible across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _as_double(col):
    return F.transform(col, lambda x: x.cast("double"))


def dot(a, b):
    # Sequential left-to-right accumulation — same order DuckDB uses,
    # so the oracle matches bit-for-bit before rounding.
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def l2_norm(a):
    return F.sqrt(dot(a, a))


def cosine(a, b):
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def cosine_topk(
    vectors: DataFrame, queries: DataFrame, k: int, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Exact top-k cosine neighbors of each query among `vectors`.

    Queries are broadcast (Q is small); the scan over N vectors stays
    fully parallel and shuffle-free until the final per-query top-k,
    which is a window over q_id — Q partitions, each tiny.
    """
    v = vectors.select(F.col(id_col).alias("vec_id"), _as_double(F.col(vec_col)).alias("e"))
    q = queries.select(F.col(id_col).alias("q_id"), _as_double(F.col(vec_col)).alias("qe"))
    pairs = v.join(F.broadcast(q), F.col("vec_id") != F.col("q_id"))
    scored = pairs.select(
        "q_id",
        "vec_id",
        F.round(cosine(F.col("qe"), F.col("e")), 6).alias("cos_sim"),
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cos_sim").desc(), F.col("vec_id").asc())
    return scored.withColumn("rn", F.row_number().over(w)).where(F.col("rn") <= k)


def assign_nearest_centroid(
    vectors: DataFrame, centroids: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Nearest-centroid assignment by squared L2 (broadcast centroids)."""
    v = vectors.select(F.col(id_col).alias("vec_id"), _as_double(F.col(vec_col)).alias("e"))
    c = centroids.select(F.col(id_col).alias("centroid_id"), _as_double(F.col(vec_col)).alias("ce"))
    sq_dist = F.aggregate(
        F.zip_with(F.col("e"), F.col("ce"), lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    pairs = v.join(F.broadcast(c)).select(
        "vec_id", "centroid_id", F.round(sq_dist, 6).alias("sq_dist")
    )
    w = Window.partitionBy("vec_id").orderBy(F.col("sq_dist").asc(), F.col("centroid_id").asc())
    return pairs.withColumn("rn", F.row_number().over(w)).where(F.col("rn") == 1).drop("rn")


def hyperplane_lsh_buckets(
    vectors: DataFrame, n_planes: int = 16, dim: int = 64, vec_col: str = "embedding"
) -> DataFrame:
    """Random-hyperplane LSH: bucket id = sign-bit string of `n_planes`
    pseudo-random hyperplanes. Plane coefficients are derived from
    xxhash64(plane, dim) so they are deterministic with no driver-side
    randomness and no data shipped to executors.
    """
    # Deterministic pseudo-random plane coefficients, generated driver-side
    # (a Weyl-sequence hash — no RNG state, reproducible across runs).
    def coeff(p: int, d: int) -> float:
        x = (p * 100003 + d * 10007 + 12345) * 2654435761 % (1 << 32)
        return x / float(1 << 31) - 1.0

    planes = [
        F.array(*[F.lit(coeff(p, d)) for d in range(dim)]) for p in range(n_planes)
    ]
    v = vectors.withColumn("e", _as_double(F.col(vec_col)))
    bits = [F.when(dot(F.col("e"), planes[p]) >= 0, F.lit("1")).otherwise(F.lit("0")) for p in range(n_planes)]
    return v.withColumn("bucket", F.concat(*bits)).drop("e")


def ann_topk_lsh(
    vectors: DataFrame, queries: DataFrame, k: int, n_planes: int = 12, dim: int = 64,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: only candidates sharing the query's LSH bucket
    are scored. At 100 TB this replaces the cross join with an equi-join
    on bucket (hash-partitioned, skew handled by AQE)."""
    vb = hyperplane_lsh_buckets(vectors, n_planes, dim, vec_col).select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("e_raw"), "bucket"
    )
    qb = hyperplane_lsh_buckets(queries, n_planes, dim, vec_col).select(
        F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_raw"), F.col("bucket").alias("qbucket")
    )
    cand = vb.join(F.broadcast(qb), (F.col("bucket") == F.col("qbucket")) & (F.col("vec_id") != F.col("q_id")))
    scored = cand.select(
        "q_id",
        "vec_id",
        F.round(cosine(_as_double(F.col("q_raw")), _as_double(F.col("e_raw"))), 6).alias("cos_sim"),
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cos_sim").desc(), F.col("vec_id").asc())
    return scored.withColumn("rn", F.row_number().over(w)).where(F.col("rn") <= k)
