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


def hyperplane_signs(
    vec_col: Column, dim: int, n_planes: int = 8, plane_offset: int = 0
) -> Column:
    """Deterministic random-hyperplane sign bucket for a vector.

    Plane p's component j = (md5-hash(p:j) mod 2001 - 1000)/1000 — a fixed
    pseudo-random direction identical on every executor with no RNG state.
    Returns a bigint bucket = sum of sign bits. ``plane_offset`` selects a
    disjoint plane family (used by banded LSH: band b uses planes
    [b*r, (b+1)*r)).
    """
    bucket = F.lit(0).cast("long")
    for p in range(n_planes):
        comps = F.array(
            *[
                F.lit(
                    (_det_coeff(plane_offset + p, j)) / 1000.0
                )
                for j in range(dim)
            ]
        )
        dot = _dot(vec_col, comps)
        bucket = bucket + F.when(dot > 0, F.lit(2 ** p).cast("long")).otherwise(F.lit(0).cast("long"))
    return bucket


def near_dup_pairs(
    vectors: DataFrame,
    dim: int,
    threshold: float = 0.3,
    bands: int = 4,
    rows_per_band: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    method: str = "auto",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, bucketed (no all-pairs join).

    Candidate generation is banded hyperplane LSH (OR over ``bands`` bands of
    ``rows_per_band`` sign bits each): vectors agreeing on every bit of any
    band become a candidate pair via an equi-join on (band, bucket) — a hash
    shuffle whose cost tracks bucket occupancy, never a cartesian product.
    Exact cosine then runs ONLY on candidates. The operator's contract is
    "pairs that LSH-collide AND have cosine >= threshold": collision recall
    vs brute force is tunable with bands/rows_per_band (P[collide] =
    1-(1-p^r)^b, p = 1 - angle/pi) and measured in tests/test_ivf.py.

    ``method``: ``sql`` inlines the plane coefficients as literals (pure JVM,
    oracle-expressible); ``arrow`` computes all band buckets in one
    broadcast-matrix pandas_udf crossing; ``auto`` picks sql up to
    ``_SQL_PLANE_BUDGET`` plane-coefficient literals — beyond that (real
    embedding dims x 16 bands) the inlined expression hits the codegen
    compile-size wall.
    """
    if method not in ("auto", "sql", "arrow"):
        raise ValueError("method must be auto|sql|arrow")
    use_sql = method == "sql" or (
        method == "auto" and bands * rows_per_band * dim <= _SQL_PLANE_BUDGET
    )
    if use_sql:
        band_buckets = F.array(
            *[
                hyperplane_signs(
                    F.col(vec_col), dim, rows_per_band, plane_offset=b * rows_per_band
                )
                for b in range(bands)
            ]
        )
    else:
        band_buckets = band_buckets_arrow(F.col(vec_col), dim, bands, rows_per_band)
    vb = vectors.select(
        F.col(id_col), F.posexplode(band_buckets).alias("_band", "_bucket")
    )
    a = vb.select(F.col(id_col).alias("id_a"), "_band", "_bucket")
    b = vb.select(F.col(id_col).alias("id_b"), "_band", "_bucket")
    cand = (
        a.join(b, ["_band", "_bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    va = vectors.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("_va"))
    vb2 = vectors.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("_vb"))
    from logai_spark.functions.textops import round4

    cos = round4(_dot(F.col("_va"), F.col("_vb")) / (_norm(F.col("_va")) * _norm(F.col("_vb"))))
    return (
        cand.join(va, "id_a")
        .join(vb2, "id_b")
        .select("id_a", "id_b", cos.alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )


def semantic_dedup(
    vectors: DataFrame,
    dim: int,
    threshold: float = 0.5,
    bands: int = 4,
    rows_per_band: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    method: str = "auto",
) -> DataFrame:
    """SemDeDup-style embedding-level deduplication (Abbas et al. 2023,
    arXiv:2303.09540 — remove semantically redundant documents, not just
    lexical near-copies): a vector is REMOVED iff some earlier vector
    (smaller id) LSH-collides with it and has cosine >= threshold; the
    earliest member of every semantic neighborhood survives. This is the
    deterministic bucketed re-expression of the paper's
    cluster-then-dedup-within-cluster rule — hyperplane-LSH bands play the
    role of the k-means clusters, so the result is reproducible at any
    parallelism with no RNG/iteration state.

    Scale shape: candidate generation is :func:`near_dup_pairs`' banded
    equi-join (never all-pairs); the removed-id set is one DISTINCT
    projection of the pair table (partial-agg, stays distributed); the
    keep flag is a left join of ids against it. Nothing collects.

    Returns one row per input vector: (id_col, kept boolean).
    """
    pairs = near_dup_pairs(
        vectors,
        dim=dim,
        threshold=threshold,
        bands=bands,
        rows_per_band=rows_per_band,
        id_col=id_col,
        vec_col=vec_col,
        method=method,
    )
    removed = (
        pairs.select(F.col("id_b").alias(id_col))
        .distinct()
        .withColumn("_rm", F.lit(True))
    )
    return (
        vectors.select(id_col)
        .join(removed, id_col, "left")
        .select(id_col, F.coalesce(~F.col("_rm"), F.lit(True)).alias("kept"))
    )


def _det_coeff(p: int, j: int) -> int:
    import hashlib

    h = int.from_bytes(hashlib.md5(f"plane:{p}:{j}".encode()).digest()[:4], "big")
    return (h % 2001) - 1000


def _plane_matrix(n_planes: int, dim: int, plane_offset: int = 0):
    """The same deterministic pseudo-plane coefficients hyperplane_signs
    inlines as literals, materialized once as a numpy matrix."""
    import numpy as np

    return np.array(
        [
            [_det_coeff(plane_offset + p, j) / 1000.0 for j in range(dim)]
            for p in range(n_planes)
        ]
    )


#: expression-path budget: planes x dim literals beyond this and the inlined
#: coefficient arrays hit the same codegen/compile-size wall _cell_expr had
#: (real embedding dims 768-1536 x 16 planes ~ 10^4-10^5 literals) — switch
#: to the broadcast-matrix Arrow path.
_SQL_PLANE_BUDGET = 4096


def band_buckets_arrow(
    vec_col: Column, dim: int, bands: int, rows_per_band: int
) -> Column:
    """All ``bands`` hyperplane sign buckets in ONE Arrow crossing: the
    (bands x rows_per_band, dim) plane matrix lives in the UDF closure
    (broadcast with the serialized function, one copy per executor), each
    batch is a single numpy sign-matrix multiply.

    Parity with the literal-expression path: same planes, same sign rule,
    equality pinned on real embeddings in tests — but the dot products sum
    in a different order (numpy blocked/pairwise vs the SQL left fold), so a
    product within ~1 ulp of exactly 0 could in principle flip a bit between
    the paths. LSH recall is insensitive to a single bit on a measure-zero
    tie, and ``method='auto'`` picks the path from the static shape
    (bands*rows*dim), never per row, so any one configuration is internally
    consistent. NULL or wrong-length vectors degrade to bucket 0, exactly
    like the SQL path's ``when(dot > 0)`` on a NULL dot."""
    import numpy as np
    import pandas as pd

    P = _plane_matrix(bands * rows_per_band, dim)
    pows = 2 ** np.arange(rows_per_band, dtype=np.int64)

    @F.pandas_udf("array<long>")
    def _buckets(s):
        vals = s.tolist()
        X = np.zeros((len(vals), dim))
        for i, v in enumerate(vals):
            if v is not None and len(v) == dim and not any(x is None for x in v):
                X[i] = v
        S = (X @ P.T) > 0  # (n, bands*rows)
        B = (S.reshape(len(X), bands, rows_per_band) * pows[None, None, :]).sum(2)
        return pd.Series([row.tolist() for row in B.astype("int64")])

    return _buckets(vec_col.cast("array<double>"))


def lsh_bucket_topk(
    vectors: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    n_planes: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    method: str = "auto",
) -> DataFrame:
    """Approximate top-k: only vectors in the query's hyperplane-sign bucket
    are scored. At scale the bucket column is a partition/cluster key, so a
    query touches ~1/2^planes of the data.

    ``method`` as in :func:`near_dup_pairs`: sql literals vs one-band Arrow
    matrix signs above the plane-literal budget."""
    if method not in ("auto", "sql", "arrow"):
        raise ValueError("method must be auto|sql|arrow")
    use_sql = method == "sql" or (
        method == "auto" and n_planes * dim <= _SQL_PLANE_BUDGET
    )
    if use_sql:
        def _sig(c):
            return hyperplane_signs(c, dim, n_planes)
    else:
        def _sig(c):
            return F.element_at(band_buckets_arrow(c, dim, 1, n_planes), 1)

    vb = vectors.withColumn("_bucket", _sig(F.col(vec_col)))
    qb = queries.select(
        F.col(query_id_col),
        F.col(vec_col).alias("_qvec"),
    ).withColumn("_bucket", _sig(F.col("_qvec")))
    scored = vb.join(F.broadcast(qb), "_bucket").select(
        query_id_col,
        id_col,
        cosine_expr(F.col(vec_col), F.col("_qvec")).alias("cosine"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine").desc(), F.col(id_col).asc()
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN — coarse k-means quantizer + multi-probe search
# ---------------------------------------------------------------------------


def ivf_train_centroids(
    vectors: DataFrame,
    vec_col: str = "embedding",
    n_cells: int = 16,
    iters: int = 8,
    sample_rows: int = 50_000,
) -> list[list[float]]:
    """Driver-side deterministic k-means on a sample: the coarse quantizer of
    a classic IVF index (the other scale path besides LSH — at 100 TB the
    cell id is a partition key and a query probes a handful of cells).

    Determinism: the sample itself is a pure function of the data — the
    ``sample_rows`` vectors with the smallest xxhash64 of their rendered
    value (orderBy+limit compiles to TakeOrdered, a single O(n) scan with a
    bounded heap per partition, not a full sort). Seeds are evenly spaced
    rows of the sample sorted by vector value; Lloyd iterations are
    order-free. No RNG state, no dependence on physical partitioning — the
    same table yields the same centroids at any cluster size.
    """
    import numpy as np

    pdf = (
        vectors.select(vec_col)
        .orderBy(F.xxhash64(F.col(vec_col).cast("string")))
        .limit(sample_rows)
        .toPandas()
    )
    X = np.array([list(v) for v in pdf[vec_col]], dtype=float)
    order = np.lexsort(X.T[::-1])
    X = X[order]
    n_cells = min(n_cells, len(X))
    seeds = X[np.linspace(0, len(X) - 1, n_cells).astype(int)]
    C = seeds.copy()
    for _ in range(iters):
        d2 = ((X[:, None, :] - C[None, :, :]) ** 2).sum(2)
        assign = d2.argmin(1)
        for c in range(n_cells):
            members = X[assign == c]
            if len(members):
                C[c] = members.mean(0)
    return [list(map(float, c)) for c in C]


def _cell_expr(vec_col: Column, centroids: list[list[float]]) -> Column:
    """Nearest-centroid id as a pure SQL expression (JVM-side, no UDF):
    argmin over squared distances computed with zip_with/aggregate."""
    best_id = F.lit(0)
    best_d = None
    for i, c in enumerate(centroids):
        carr = F.array(*[F.lit(float(x)) for x in c])
        d = F.aggregate(
            F.zip_with(vec_col, carr, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0).cast("double"),
            lambda acc, v: acc + v,
        )
        if best_d is None:
            best_d = d
        else:
            best_id = F.when(d < best_d, F.lit(i)).otherwise(best_id)
            best_d = F.least(best_d, d)
    return best_id


def ivf_assign(
    vectors: DataFrame,
    centroids: list[list[float]],
    vec_col: str = "embedding",
    cell_col: str = "ivf_cell",
    method: str = "auto",
) -> DataFrame:
    """Tag every vector with its IVF cell. At scale you'd
    ``write.partitionBy(cell_col)`` so probing prunes file groups.

    Two assignment paths:
    - ``sql``  — nested-CASE argmin, pure JVM expression. Great up to a few
      dozen cells; the expression is O(cells x dim) and stops compiling at
      the thousands of cells a real index needs.
    - ``arrow`` — vectorized pandas_udf: one Arrow batch -> one numpy
      ||x-c||^2 matrix argmin (O(batch x cells x dim) BLAS work). Handles
      thousands of cells; ties broken by lowest cell id on both paths.
    ``auto`` picks sql for <= 32 cells, arrow beyond.
    """
    if method not in ("auto", "sql", "arrow"):
        raise ValueError("method must be auto|sql|arrow")
    if method == "sql" or (method == "auto" and len(centroids) <= 32):
        return vectors.withColumn(cell_col, _cell_expr(F.col(vec_col), centroids))

    import numpy as np
    import pandas as pd

    C = np.asarray(centroids, dtype=float)
    c_sq = (C * C).sum(1)

    @F.pandas_udf("int")
    def _assign(s):
        X = np.asarray(s.tolist(), dtype=float)
        if X.ndim != 2:  # empty batch
            return pd.Series([], dtype="int32")
        # ||x-c||^2 = ||x||^2 - 2 x.c + ||c||^2; the x^2 term is constant
        # per row and irrelevant to the argmin
        d2 = -2.0 * (X @ C.T) + c_sq[None, :]
        return pd.Series(d2.argmin(1).astype("int32"))

    return vectors.withColumn(cell_col, _assign(F.col(vec_col).cast("array<double>")))


def ivf_topk(
    vectors_with_cells: DataFrame,
    queries: DataFrame,
    centroids: list[list[float]],
    k: int = 5,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    cell_col: str = "ivf_cell",
) -> DataFrame:
    """Approximate top-k: score only vectors in the query's ``n_probe``
    nearest cells. The cell filter is an equi-join on the (broadcast)
    query->cells table, so with cell-partitioned storage it becomes
    partition pruning, not a scan."""
    import numpy as np

    q = queries.select(query_id_col, F.col(vec_col).alias("_qvec")).toPandas()
    C = np.array(centroids)
    probe_rows = []
    for _, row in q.iterrows():
        qv = np.array(list(row["_qvec"]), dtype=float)
        d2 = ((C - qv) ** 2).sum(1)
        for cell in np.argsort(d2, kind="stable")[:n_probe]:
            probe_rows.append((row[query_id_col], int(cell), list(map(float, qv))))
    spark = vectors_with_cells.sparkSession
    probes = spark.createDataFrame(probe_rows, [query_id_col, cell_col, "_qvec"])
    scored = vectors_with_cells.join(F.broadcast(probes), cell_col).select(
        query_id_col,
        id_col,
        cosine_expr(F.col(vec_col), F.col("_qvec").cast("array<double>")).alias("cosine"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine").desc(), F.col(id_col).asc()
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
