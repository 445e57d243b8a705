"""Measured recall-vs-brute-force curves for the ANN / near-dup family.

The operators are exact per their own contract (oracle-checked); what a user
tuning a 100 TB dedup/search pass needs is the RECALL each approximate
setting buys against brute force on real-shaped data. This sweeps:

  - near_dup_pairs: bands x rows_per_band grid, recall of true cosine>=T
    pairs (brute force via the exact all-pairs on the bench-scale table)
  - ivf_topk: n_probe sweep at fixed cells, top-k overlap vs cosine_topk

over $SPARK_GRAFT_SF_DIR/embeddings.parquet (default /root/testdata/sf0.1)
and prints a markdown table for BASELINE.md.

Usage: python tools/recall_curves.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    from pyspark.sql import functions as F

    from logai_spark.functions.similarity import (
        cosine_expr,
        cosine_topk,
        ivf_assign,
        ivf_topk,
        ivf_train_centroids,
        near_dup_pairs,
    )
    from logai_spark.session import get_spark

    spark = get_spark("recall_curves", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", 8)))
    vecs = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet")).select(
        "vec_id", "embedding"
    )
    n = vecs.count()
    dim = len(vecs.first()["embedding"])
    print(f"# embeddings: {n} vectors, dim {dim} ({sf_dir})\n")

    # ---- brute-force truth for near-dup (bench scale only!) ----
    # threshold matched to the synthetic table's cosine distribution (max
    # pairwise cosine ~0.60; ~200 pairs at 0.4) — overridable for other data
    threshold = float(sys.argv[2]) if len(sys.argv) > 2 else 0.4
    a = vecs.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("_va"))
    b = vecs.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("_vb"))
    truth = {
        (r["id_a"], r["id_b"])
        for r in a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a", "id_b",
            cosine_expr(F.col("_va"), F.col("_vb")).alias("cos"),
        )
        .filter(F.col("cos") >= threshold)
        .collect()
    }
    print(f"brute-force pairs at cosine>={threshold}: {len(truth)}\n")
    print(f"## near_dup_pairs recall (bands x rows_per_band), cosine>={threshold}\n")
    print("| bands | rows/band | pairs found | recall |")
    print("|---|---|---|---|")
    for bands in (2, 4, 8, 16):
        for rows in (2, 4, 8):
            got = {
                (r["id_a"], r["id_b"])
                for r in near_dup_pairs(
                    vecs, dim, threshold=threshold, bands=bands, rows_per_band=rows
                ).collect()
            }
            rec = len(got & truth) / max(len(truth), 1)
            print(f"| {bands} | {rows} | {len(got)} | {rec:.3f} |")

    # ---- IVF top-k recall vs exact ----
    k = 10
    queries = (
        vecs.orderBy(F.xxhash64("vec_id")).limit(20)
        .withColumnRenamed("vec_id", "query_id")
    )
    exact = {
        (r["query_id"], r["vec_id"])
        for r in cosine_topk(vecs, queries, k=k).collect()
    }
    n_cells = 16
    cents = ivf_train_centroids(vecs, n_cells=n_cells)
    with_cells = ivf_assign(vecs, cents)
    print(f"\n## ivf_topk recall vs exact top-{k} ({n_cells} cells, 20 queries)\n")
    print("| n_probe | recall |")
    print("|---|---|")
    for n_probe in (1, 2, 4, 8, 16):
        approx = {
            (r["query_id"], r["vec_id"])
            for r in ivf_topk(with_cells, queries, cents, k=k, n_probe=n_probe).collect()
        }
        rec = len(approx & exact) / max(len(exact), 1)
        print(f"| {n_probe} | {rec:.3f} |")
    spark.stop()


if __name__ == "__main__":
    main()
