"""Anomaly detectors: isolation forest, per-series detectors, divergence."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from logai_spark.operators.anomaly import (
    IsolationForest,
    detect_anomalies_per_series,
    distribution_divergence,
    fit_isolation_forest,
    score_with_model,
)


def test_isolation_forest_separates_outliers():
    rng = np.random.default_rng(0)
    normal = rng.normal(0, 1, size=(500, 2))
    outliers = np.array([[8.0, 8.0], [-9.0, 7.5], [10.0, -10.0]])
    X = np.vstack([normal, outliers])
    m = IsolationForest(n_estimators=50, seed=1).fit(X)
    scores = m.score_samples(X)
    assert scores[-3:].mean() < scores[:-3].mean()  # outliers more negative
    preds = m.predict(outliers)
    assert (preds == -1).all()


def test_isolation_forest_spark_scoring(spark):
    rng = np.random.default_rng(1)
    pdf = pd.DataFrame(rng.normal(0, 1, size=(300, 3)), columns=["f0", "f1", "f2"])
    pdf.loc[299] = [15.0, 15.0, 15.0]
    df = spark.createDataFrame(pdf)
    model = fit_isolation_forest(df, ["f0", "f1", "f2"], n_estimators=50, seed=2)
    scored = score_with_model(df, model, ["f0", "f1", "f2"])
    worst = scored.orderBy("anom_score").first()
    assert worst["f0"] == 15.0 and worst["is_anomaly"] == 1


def _counter_series(n_keys=3, n_points=40, anomaly_at=35):
    rows = []
    for k in range(n_keys):
        for i in range(n_points):
            v = 10.0 + (i % 3)
            if k == 0 and i == anomaly_at:
                v = 500.0
            rows.append((f"attr{k}", pd.Timestamp("2024-01-01") + pd.Timedelta(minutes=5 * i), v))
    # a too-short series that must be skipped (MIN_TS_LENGTH)
    for i in range(5):
        rows.append(("short", pd.Timestamp("2024-01-01") + pd.Timedelta(minutes=5 * i), 1.0))
    return pd.DataFrame(rows, columns=["attribute", "timestamp", "counts"])


@pytest.mark.parametrize("algo", ["dbl", "ets"])
def test_per_series_detector(spark, algo):
    df = spark.createDataFrame(_counter_series())
    out = detect_anomalies_per_series(
        df, ["attribute"], "timestamp", "counts", algo=algo
    ).toPandas()
    assert "short" not in set(out["attribute"])  # skipped
    flagged = out[out["is_anomaly"] == 1]
    assert len(flagged) >= 1
    # the planted 500-spike must be flagged; all flags belong to the spiky
    # series (ETS additionally flags the post-spike level shift — correct)
    assert (flagged["attribute"] == "attr0").all()
    assert 500.0 in set(flagged["counts"])
    # only test-split rows are scored (70/30)
    assert len(out[out["attribute"] == "attr1"]) == 12


def test_distribution_divergence(spark):
    a = spark.range(0, 5000).select((F.col("id") % 100).cast("double").alias("v"))
    b_same = spark.range(0, 5000).select((F.col("id") % 100).cast("double").alias("v"))
    b_diff = spark.range(0, 5000).select((F.col("id") % 10).cast("double").alias("v"))
    same = distribution_divergence(a, b_same, "v")
    diff = distribution_divergence(a, b_diff, "v")
    assert same["kl"] < 1e-6 and same["js"] < 1e-6
    assert diff["kl"] > 0.5 and diff["js"] > 0.1
