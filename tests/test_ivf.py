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
