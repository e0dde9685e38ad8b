"""Similarity search over embedding columns (SURVEY §2k X3).

- ``cosine`` / ``brute_force_topk``: the exact baseline. Dot products
  run as JVM higher-order functions (zip_with + sequential aggregate
  fold), so summation order is deterministic and oracle-checkable.
- ``lsh_bucket`` / ``lsh_topk``: the scale path — random-hyperplane
  LSH (Charikar '02). Hyperplane coefficients are derived from sha-256
  so they are plain literals: the bucketing is reproducible on any
  engine and needs no stored model. At 100 TB: bucket assignment is a
  narrow map-only pass; search shuffles only within the probed bucket
  instead of broadcasting the full corpus.

Queries-side note: scoring K query vectors against N corpus vectors is
expressed as broadcast(queries) x corpus — the corpus never shuffles.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ecommerce_dataengineering_project_spark.functions.scalars import round_half_up


def _fold_sum(arr: Column) -> Column:
    """Sequential left-fold sum of an array<double> (deterministic
    order; matches a SQL list_reduce oracle bit-for-bit)."""
    return F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + x)


def dot(a: Column, b: Column) -> Column:
    return _fold_sum(F.zip_with(a, b, lambda x, y: x * y))


def norm(a: Column) -> Column:
    return F.sqrt(_fold_sum(F.transform(a, lambda x: x * x)))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity of two array<float|double> columns, computed
    in double precision."""
    ad = F.transform(a, lambda x: x.cast("double"))
    bd = F.transform(b, lambda x: x.cast("double"))
    return dot(ad, bd) / (norm(ad) * norm(bd))


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
) -> DataFrame:
    """Exact top-k neighbors for each query vector.

    queries is broadcast (K rows), corpus streams through map-side —
    no corpus shuffle; the only shuffle is the per-query top-k window
    over K*N scored rows, bounded by the window partition count K.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
    scored = c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id")).select(
        "query_id",
        "neighbor_id",
        round_half_up(cosine(F.col("qv"), F.col("cv")), 6).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


NUM_PLANES = 8


def hyperplane(plane: int, dim: int) -> list[float]:
    """Deterministic pseudo-random hyperplane: coefficient (j, d) is a
    sha-256-derived value in [-1, 1). Pure data — identical literals
    in engine code and oracle SQL."""
    coeffs = []
    for d in range(dim):
        h = hashlib.sha256(f"plane_{plane}_dim_{d}".encode()).hexdigest()
        coeffs.append(((int(h[:15], 16) % 2001) - 1000) / 1000.0)
    return coeffs


def lsh_bucket(vec: Column, dim: int, num_planes: int = NUM_PLANES) -> Column:
    """Sign-bit bucket id: bit j = (vec . plane_j) >= 0."""
    vd = F.transform(vec, lambda x: x.cast("double"))
    bucket = F.lit(0)
    for j in range(num_planes):
        plane = F.array(*[F.lit(c) for c in hyperplane(j, dim)])
        bit = F.when(dot(vd, plane) >= 0.0, F.lit(1 << j)).otherwise(F.lit(0))
        bucket = bucket + bit
    return bucket.cast("int")


def lsh_topk(
    queries: DataFrame,
    corpus: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
) -> DataFrame:
    """ANN top-k: score only corpus vectors in the query's bucket.

    Trades recall for a ~2^planes candidate reduction; recall is
    regression-tested against brute_force_topk in tests/.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        lsh_bucket(F.col(vec_col), dim).alias("bucket"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        lsh_bucket(F.col(vec_col), dim).alias("bucket"),
    )
    scored = c.join(F.broadcast(q), on="bucket").where(
        F.col("query_id") != F.col("neighbor_id")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.select(
            "query_id",
            "neighbor_id",
            round_half_up(cosine(F.col("qv"), F.col("cv")), 6).alias("cosine"),
        )
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )
