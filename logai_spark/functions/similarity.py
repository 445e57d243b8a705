"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k as the exact baseline, plus an LSH-bucketed variant
(random-hyperplane signs from deterministic md5-derived pseudo-planes) as the
scale path: at 100 TB you bucket first so each query only scans its bucket.

Dot products run through ``F.aggregate``/``zip_with`` — JVM higher-order
functions, no Python in the loop. Queries are broadcast (they're small by
definition), so the scan side never shuffles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0).cast("double"),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0).cast("double"), lambda acc, v: acc + v * v)
    )


def cosine_expr(a: Column, b: Column, decimals: int = 6) -> Column:
    return F.round(_dot(a, b) / (_norm(a) * _norm(b)), decimals)


def cosine_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact top-k by cosine: broadcast queries x scan vectors, rank per query.

    Output: (query_id, vec_id, cosine, rank). Ties broken by vec_id so the
    result is total-ordered and oracle-comparable.
    """
    q = queries.select(
        F.col(query_id_col), F.col(vec_col).alias("_qvec")
    )
    scored = vectors.crossJoin(F.broadcast(q)).select(
        query_id_col,
        id_col,
        cosine_expr(F.col(vec_col), F.col("_qvec")).alias("cosine"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def hyperplane_signs(vec_col: Column, dim: int, n_planes: int = 8) -> Column:
    """Deterministic random-hyperplane sign bucket for a vector.

    Plane p's component j = (md5-hash(p:j) mod 2001 - 1000)/1000 — a fixed
    pseudo-random direction identical on every executor with no RNG state.
    Returns a bigint bucket = sum of sign bits.
    """
    bucket = F.lit(0).cast("long")
    for p in range(n_planes):
        comps = F.array(
            *[
                F.lit(
                    (_det_coeff(p, j)) / 1000.0
                )
                for j in range(dim)
            ]
        )
        dot = _dot(vec_col, comps)
        bucket = bucket + F.when(dot > 0, F.lit(2 ** p).cast("long")).otherwise(F.lit(0).cast("long"))
    return bucket


def _det_coeff(p: int, j: int) -> int:
    import hashlib

    h = int.from_bytes(hashlib.md5(f"plane:{p}:{j}".encode()).digest()[:4], "big")
    return (h % 2001) - 1000


def lsh_bucket_topk(
    vectors: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    n_planes: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Approximate top-k: only vectors in the query's hyperplane-sign bucket
    are scored. At scale the bucket column is a partition/cluster key, so a
    query touches ~1/2^planes of the data."""
    vb = vectors.withColumn("_bucket", hyperplane_signs(F.col(vec_col), dim, n_planes))
    qb = queries.select(
        F.col(query_id_col),
        F.col(vec_col).alias("_qvec"),
    ).withColumn("_bucket", hyperplane_signs(F.col("_qvec"), dim, n_planes))
    scored = vb.join(F.broadcast(qb), "_bucket").select(
        query_id_col,
        id_col,
        cosine_expr(F.col(vec_col), F.col("_qvec")).alias("cosine"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine").desc(), F.col(id_col).asc()
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
