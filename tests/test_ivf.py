"""IVF ANN index: coarse k-means cells + multi-probe search.

Invariants: probing ALL cells must reproduce the exact brute-force top-k;
probing few cells keeps high recall on clustered data; the cell expression
is pure SQL (no python in the scan path); determinism across calls.
"""

import numpy as np
import pandas as pd

from logai_spark.functions.similarity import (
    cosine_topk,
    ivf_assign,
    ivf_topk,
    ivf_train_centroids,
)


def _embeddings(spark, n=400, dim=8, clusters=8, seed=13):
    rng = np.random.default_rng(seed)
    centers = rng.normal(0, 5, size=(clusters, dim))
    rows = []
    for i in range(n):
        c = i % clusters
        rows.append((i, (centers[c] + rng.normal(0, 0.3, dim)).tolist()))
    return spark.createDataFrame(pd.DataFrame(rows, columns=["vec_id", "embedding"]))


def test_ivf_full_probe_equals_exact(spark):
    vecs = _embeddings(spark)
    queries = vecs.filter("vec_id in (0, 7, 13)").selectExpr(
        "vec_id as query_id", "embedding"
    )
    cents = ivf_train_centroids(vecs, n_cells=8)
    tagged = ivf_assign(vecs, cents).cache()
    exact = cosine_topk(vecs, queries, k=5).collect()
    full = ivf_topk(tagged, queries, cents, k=5, n_probe=len(cents)).collect()
    key = lambda rows: sorted((r["query_id"], r["rank"], r["vec_id"]) for r in rows)
    assert key(full) == key(exact)


def test_ivf_few_probes_high_recall(spark):
    vecs = _embeddings(spark)
    queries = vecs.filter("vec_id in (1, 2, 3, 4)").selectExpr(
        "vec_id as query_id", "embedding"
    )
    cents = ivf_train_centroids(vecs, n_cells=8)
    tagged = ivf_assign(vecs, cents).cache()
    exact = {(r["query_id"], r["vec_id"]) for r in cosine_topk(vecs, queries, k=5).collect()}
    approx = {(r["query_id"], r["vec_id"]) for r in ivf_topk(tagged, queries, cents, k=5, n_probe=2).collect()}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.8, recall


def test_ivf_deterministic_and_jvm_side(spark):
    vecs = _embeddings(spark, n=200)
    c1 = ivf_train_centroids(vecs, n_cells=4)
    c2 = ivf_train_centroids(vecs, n_cells=4)
    assert c1 == c2
    tagged = ivf_assign(vecs, c1)
    plan = tagged._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    cells = {r["ivf_cell"] for r in tagged.select("ivf_cell").distinct().collect()}
    assert cells.issubset(set(range(4))) and len(cells) >= 2


def test_ivf_real_embeddings_table(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    cents = ivf_train_centroids(emb, n_cells=8)
    tagged = ivf_assign(emb, cents)
    queries = emb.limit(2).selectExpr("vec_id as query_id", "embedding")
    out = ivf_topk(tagged, queries, cents, k=3, n_probe=3)
    rows = out.collect()
    assert len(rows) == 6
    assert all(r["rank"] <= 3 for r in rows)


def test_ivf_arrow_assignment_matches_sql_path(spark):
    """The Arrow matrix-argmin assignment (the path for real cell counts)
    agrees with the nested-CASE SQL expression cell-for-cell."""
    vecs = _embeddings(spark)
    cents = ivf_train_centroids(vecs, n_cells=16)
    sql_cells = ivf_assign(vecs, cents, method="sql").orderBy("vec_id").collect()
    arrow_cells = ivf_assign(vecs, cents, method="arrow").orderBy("vec_id").collect()
    assert [r["ivf_cell"] for r in sql_cells] == [r["ivf_cell"] for r in arrow_cells]


def test_ivf_256_cells_full_probe_exact_sf01(spark):
    """Real embeddings table at sf0.1 with 256 cells (Arrow assignment path):
    full probing still reproduces the exact brute-force top-k."""
    emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet").selectExpr(
        "vec_id", "cast(embedding as array<double>) as embedding"
    )
    queries = emb.filter("vec_id < 3").selectExpr("vec_id as query_id", "embedding")
    cents = ivf_train_centroids(emb, n_cells=256)
    assert len(cents) == 256
    tagged = ivf_assign(emb, cents).cache()
    exact = cosine_topk(emb, queries, k=5).collect()
    full = ivf_topk(tagged, queries, cents, k=5, n_probe=len(cents)).collect()
    key = lambda rows: sorted((r["query_id"], r["rank"], r["vec_id"]) for r in rows)
    assert key(full) == key(exact)


def test_near_dup_lsh_recall_vs_brute_force(spark):
    """Banded-LSH near-dup candidates: measure recall against brute force on
    the real embeddings table. The operator's contract is collide-AND-cosine,
    so this pins the collision probability empirically (documented, not
    asserted at 1.0 — banding is probabilistic by design)."""
    from logai_spark.functions.similarity import near_dup_pairs

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet").selectExpr(
        "vec_id", "cast(embedding as array<double>) as embedding"
    )
    pdf = emb.toPandas()
    X = np.array(pdf["embedding"].tolist(), dtype=float)
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    S = Xn @ Xn.T
    iu = np.triu_indices(len(X), 1)
    true_pairs = {
        (int(pdf["vec_id"][i]), int(pdf["vec_id"][j]))
        for i, j in zip(*iu)
        if S[i, j] >= 0.3
    }
    got = near_dup_pairs(emb, dim=64, threshold=0.3, bands=4, rows_per_band=4)
    got_pairs = {(r["id_a"], r["id_b"]) for r in got.collect()}
    assert got_pairs <= true_pairs  # no false positives (exact cosine verify)
    recall = len(got_pairs) / max(len(true_pairs), 1)
    assert recall > 0.35  # 4 bands x 4 rows at cos>=0.3; raise bands for more


def test_hyperplane_arrow_matches_sql_path(spark):
    """The broadcast-matrix Arrow signs must produce bit-identical buckets
    and identical near-dup pairs to the literal-expression path."""
    import numpy as np
    import pandas as pd

    from logai_spark.functions.similarity import lsh_bucket_topk, near_dup_pairs

    rng = np.random.RandomState(7)
    dim = 24
    base = rng.randn(40, dim)
    vecs = np.vstack([base, base[:10] + rng.randn(10, dim) * 0.01])
    df = spark.createDataFrame(
        pd.DataFrame({"vec_id": range(len(vecs)),
                      "embedding": [list(map(float, v)) for v in vecs]})
    )
    key = ["id_a", "id_b"]
    sql_pairs = (near_dup_pairs(df, dim, threshold=0.8, method="sql")
                 .toPandas().sort_values(key).reset_index(drop=True))
    arrow_pairs = (near_dup_pairs(df, dim, threshold=0.8, method="arrow")
                   .toPandas().sort_values(key).reset_index(drop=True))
    assert len(sql_pairs) > 0
    assert sql_pairs.equals(arrow_pairs)

    q = df.limit(3).withColumnRenamed("vec_id", "query_id")
    key = ["query_id", "rank"]
    s = (lsh_bucket_topk(df, q, dim, method="sql")
         .toPandas().sort_values(key).reset_index(drop=True))
    a = (lsh_bucket_topk(df, q, dim, method="arrow")
         .toPandas().sort_values(key).reset_index(drop=True))
    assert len(s) > 0 and s.equals(a)


def test_hyperplane_arrow_tolerates_null_and_ragged_vectors(spark):
    """NULL / wrong-length embeddings must not crash the Arrow path; both
    paths send them to bucket 0 (the SQL path's when(dot>0)-on-NULL rule)."""
    import pandas as pd

    from logai_spark.functions.similarity import band_buckets_arrow, hyperplane_signs
    from pyspark.sql import functions as F

    dim = 8
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "vec_id": [0, 1, 2, 3],
                "embedding": [
                    [1.0] * dim,       # normal
                    None,              # NULL vector
                    [1.0] * (dim - 3), # ragged
                    [float(i) for i in range(dim)],
                ],
            }
        )
    )
    got = df.select(
        "vec_id",
        band_buckets_arrow(F.col("embedding"), dim, 2, 3).alias("arrow"),
        F.array(
            hyperplane_signs(F.col("embedding"), dim, 3, plane_offset=0),
            hyperplane_signs(F.col("embedding"), dim, 3, plane_offset=3),
        ).alias("sql"),
    ).orderBy("vec_id").collect()
    for r in got:
        assert r["arrow"] == r["sql"]
    assert got[1]["arrow"] == [0, 0]  # NULL -> bucket 0 in every band


def test_near_dup_high_dim_uses_bounded_plan(spark):
    """dim 768 x 16 planes exceeds the plane-literal budget: auto must take
    the Arrow path and keep the plan compact (no 10^4-literal expression)."""
    import contextlib
    import io

    import numpy as np
    import pandas as pd

    from logai_spark.functions.similarity import near_dup_pairs

    rng = np.random.RandomState(3)
    dim = 768
    base = rng.randn(20, dim)
    vecs = np.vstack([base, base[:5] + rng.randn(5, dim) * 0.005])
    df = spark.createDataFrame(
        pd.DataFrame({"vec_id": range(len(vecs)),
                      "embedding": [list(map(float, v)) for v in vecs]})
    )
    out = near_dup_pairs(df, dim, threshold=0.9, bands=4, rows_per_band=4)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    assert len(plan) < 60_000, f"plan blew up to {len(plan)} chars"
    assert "ArrowEvalPython" in plan or "BatchEvalPython" in plan
    pairs = out.toPandas()
    truth = {(i, 768 // 768 * (20 + i)) for i in range(5)}  # (i, 20+i)
    got = set(map(tuple, pairs[["id_a", "id_b"]].values))
    assert {(i, 20 + i) for i in range(5)} <= got
