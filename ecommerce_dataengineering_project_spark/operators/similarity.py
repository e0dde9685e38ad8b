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


def _at(name: str, i: int, cast: bool) -> str:
    e = f"element_at(`{name}`, {i})"
    return f"CAST({e} AS DOUBLE)" if cast else e


def _dot_sql(a: str, b: str, dim: int, cast: bool) -> str:
    terms = " + ".join(f"{_at(a, i, cast)} * {_at(b, i, cast)}" for i in range(1, dim + 1))
    return f"(0.0D + {terms})"


def _norm_sql(a: str, dim: int, cast: bool) -> str:
    terms = " + ".join(f"{_at(a, i, cast)} * {_at(a, i, cast)}" for i in range(1, dim + 1))
    return f"SQRT(0.0D + {terms})"


def dot(
    a: Column | str, b: Column | str, dim: int | None = None, cast: bool = False
) -> Column:
    """Dot product. With ``dim`` known (pass column NAMES, not Columns),
    the sum is unrolled into a left-associated
    ``a[1]*b[1] + ... + a[d]*b[d]`` expression — the SAME IEEE-754
    evaluation order as the sequential fold (bit-identical result), but
    it runs inside WholeStageCodegen instead of interpreting 2*d lambda
    calls per row. The unrolled tree is built as ONE ``F.expr`` SQL
    string: constructing it Column-by-Column costs thousands of py4j
    round trips (~10 ms each) before Spark ever sees the plan.

    ``cast=True`` casts each ELEMENT to double at extraction — use it
    when the input is an un-materialized float array: wrapping the
    array in ``transform(.., cast)`` and then unrolling would
    re-materialize the whole casted array once per term after
    projection collapse."""
    if dim is None:
        ad = as_double(a) if cast else a
        bd = as_double(b) if cast else b
        return _fold_sum(F.zip_with(ad, bd, lambda x, y: x * y))
    assert isinstance(a, str) and isinstance(b, str), "unrolled dot takes column names"
    return F.expr(_dot_sql(a, b, dim, cast))


def norm(a: Column | str, dim: int | None = None, cast: bool = False) -> Column:
    if dim is None:
        ad = as_double(a) if cast else a
        return F.sqrt(_fold_sum(F.transform(ad, lambda x: x * x)))
    assert isinstance(a, str), "unrolled norm takes a column name"
    return F.expr(_norm_sql(a, dim, cast))


def as_double(a: Column | str) -> Column:
    a = F.col(a) if isinstance(a, str) else a
    return F.transform(a, lambda x: x.cast("double"))


def cosine(a: Column | str, b: Column | str, dim: int | None = None) -> Column:
    """Cosine similarity of two array<float|double> columns, computed
    in double precision (element-wise casts; bit-identical to casting
    the arrays first)."""
    if dim is None:
        return dot(a, b, cast=True) / (norm(a, cast=True) * norm(b, cast=True))
    assert isinstance(a, str) and isinstance(b, str)
    return F.expr(
        f"{_dot_sql(a, b, dim, True)} / ({_norm_sql(a, dim, True)} * {_norm_sql(b, dim, True)})"
    )


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    dim: int | None = None,
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
        round_half_up(cosine("qv", "cv", dim), 6).alias("cosine"),
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


def lsh_bucket(vec: str, dim: int, num_planes: int = NUM_PLANES) -> Column:
    """Sign-bit bucket id for a named vector column:
    bit j = (vec . plane_j) >= 0. Plane coefficients are inlined as
    double literals in one F.expr string (see dot() on why)."""
    parts = []
    for j in range(num_planes):
        coeffs = hyperplane(j, dim)
        dot_txt = " + ".join(
            f"CAST(element_at(`{vec}`, {i + 1}) AS DOUBLE) * {coeffs[i]!r}D"
            for i in range(dim)
        )
        parts.append(f"CASE WHEN (0.0D + {dot_txt}) >= 0.0D THEN {1 << j} ELSE 0 END")
    return F.expr("CAST(" + " + ".join(parts) + " AS INT)")


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
        lsh_bucket(vec_col, dim).alias("bucket"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        lsh_bucket(vec_col, dim).alias("bucket"),
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
            round_half_up(cosine("qv", "cv", dim), 6).alias("cosine"),
        )
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )
