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
