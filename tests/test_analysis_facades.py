"""Analysis facade layer parity (reference logai/analysis/*): algo_name
dispatch through the factory for detection, NN detection, and clustering."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from logai_spark.analysis import (
    AnomalyDetectionConfig,
    AnomalyDetector,
    Clustering,
    ClusteringConfig,
    NNAnomalyDetector,
)


def test_anomaly_detector_facade_isolation_forest(spark):
    pdf = pd.DataFrame({"x": [1.0] * 40 + [50.0], "y": [2.0] * 40 + [60.0]})
    df = spark.createDataFrame(pdf)
    det = AnomalyDetector(
        AnomalyDetectionConfig(algo_name="isolation_forest")
    )
    det.fit(df, ["x", "y"])
    out = det.predict(df, ["x", "y"]).toPandas()
    assert "anom_score" in out.columns and len(out) == 41


def test_nn_anomaly_detector_facade_forecast(spark):
    seq = []
    for i in range(60):
        seq.extend([0, 1, 2] if i % 5 else [0, 3])
    rows = [(seq[i:i + 3], seq[i + 3]) for i in range(len(seq) - 3)]
    df = spark.createDataFrame(
        pd.DataFrame({"window_ids": [r[0] for r in rows],
                      "next_id": [r[1] for r in rows]})
    )
    det = NNAnomalyDetector(
        AnomalyDetectionConfig(
            algo_name="forecast_next_event", algo_params={"vocab_size": 4, "g": 2}
        )
    )
    det.fit(df)
    scored = det.predict(df)
    assert {"next_rank", "anom_score", "is_anomaly"} <= set(scored.columns)


def test_clustering_facade_dbscan(spark):
    pdf = pd.DataFrame(
        {"id": range(30),
         "x": [0.0] * 15 + [10.0] * 15,
         "y": [0.0] * 15 + [10.0] * 15}
    )
    df = spark.createDataFrame(pdf)
    cl = Clustering(ClusteringConfig(algo_name="dbscan",
                                     algo_params={"eps": 1.0, "min_samples": 3}))
    out = cl.fit_predict(df, ["x", "y"], "id").toPandas()
    assert out["cluster_id"].nunique() == 2


def test_facade_unknown_algo_raises(spark):
    with pytest.raises(KeyError):
        AnomalyDetector(AnomalyDetectionConfig(algo_name="nope"))


def test_clustering_facade_fit_then_predict_dbscan(spark):
    """Reference call pattern (analysis/clustering.py:48-63): fit on train,
    predict on test — DbScanAlgo.predict re-clusters the given data."""
    pdf = pd.DataFrame(
        {"id": range(30),
         "x": [0.0] * 15 + [10.0] * 15,
         "y": [0.0] * 15 + [10.0] * 15}
    )
    df = spark.createDataFrame(pdf)
    cl = Clustering(ClusteringConfig(algo_name="dbscan",
                                     algo_params={"eps": 1.0, "min_samples": 3}))
    cl.fit(df, ["x", "y"], "id")
    out = cl.predict(df).toPandas()
    assert out["cluster_id"].nunique() == 2


def test_clustering_facade_fit_then_predict_birch(spark):
    """Birch is genuinely fit-then-predict: the model fitted on train assigns
    test rows by nearest subcluster (clustering_algo/birch.py:47-66)."""
    train = spark.createDataFrame(pd.DataFrame(
        {"id": range(40),
         "x": [0.0] * 20 + [10.0] * 20,
         "y": [0.0] * 20 + [10.0] * 20}
    ))
    test = spark.createDataFrame(pd.DataFrame(
        {"id": [100, 101], "x": [0.2, 9.8], "y": [0.1, 10.1]}
    ))
    cl = Clustering(ClusteringConfig(algo_name="birch",
                                     algo_params={"threshold": 2.0, "n_clusters": 2}))
    cl.fit(train, ["x", "y"])
    out = cl.predict(test).toPandas().sort_values("id")
    assert len(out) == 2
    assert out["cluster_id"].iloc[0] != out["cluster_id"].iloc[1]
