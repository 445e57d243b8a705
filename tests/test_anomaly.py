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


# ---------------------------------------------------------------------------
# local outlier factor (reference local_outlier_factor.py:46-94, novelty mode)
# ---------------------------------------------------------------------------

def test_lof_uniform_cluster_scores_near_minus_one():
    from logai_spark.operators.anomaly import LocalOutlierFactor

    rng = np.random.default_rng(3)
    X = rng.uniform(0, 1, size=(400, 2))
    m = LocalOutlierFactor(n_neighbors=10).fit(X)
    scores = m.score_samples(X)
    # LOF of points inside a uniform-density cloud is ~1 -> score ~ -1
    assert abs(np.median(scores) + 1.0) < 0.1
    assert (m.predict(X) == 1).mean() > 0.97


def test_lof_flags_planted_outliers():
    from logai_spark.operators.anomaly import LocalOutlierFactor

    rng = np.random.default_rng(4)
    train = rng.normal(0, 1, size=(300, 3))
    m = LocalOutlierFactor(n_neighbors=20).fit(train)
    far = np.array([[12.0, 12.0, -12.0], [20.0, 0.0, 0.0]])
    near = rng.normal(0, 1, size=(5, 3))
    assert (m.predict(far) == -1).all()
    assert (m.predict(near) == 1).all()
    assert m.score_samples(far).max() < m.score_samples(near).min()


def test_lof_spark_broadcast_scoring(spark):
    from logai_spark.operators.anomaly import fit_lof

    rng = np.random.default_rng(5)
    pdf = pd.DataFrame(rng.normal(0, 1, size=(250, 2)), columns=["f0", "f1"])
    pdf.loc[249] = [18.0, -18.0]
    df = spark.createDataFrame(pdf)
    model = fit_lof(df, ["f0", "f1"], n_neighbors=15)
    scored = score_with_model(df, model, ["f0", "f1"])
    worst = scored.orderBy("anom_score").first()
    assert worst["f0"] == 18.0 and worst["is_anomaly"] == 1
    # gaussian tails put a few % past the -1.5 novelty offset (as in sklearn)
    assert scored.filter("is_anomaly = 1").count() <= 25


def test_lof_factory_roundtrip(spark):
    from logai_spark.plans.factory import factory

    algo = factory.get_algorithm("detection", "lof", factory.get_config("detection", "lof", {"n_neighbors": 12}))
    rng = np.random.default_rng(6)
    pdf = pd.DataFrame(rng.normal(0, 1, size=(200, 2)), columns=["f0", "f1"])
    pdf.loc[199] = [25.0, 25.0]
    df = spark.createDataFrame(pdf)
    out = algo.fit(df, ["f0", "f1"]).predict(df, ["f0", "f1"])
    assert out.orderBy("anom_score").first()["is_anomaly"] == 1


def test_iplom_factory_roundtrip(spark):
    from logai_spark.plans.factory import factory

    algo = factory.get_algorithm("parsing", "iplom", None)
    df = spark.createDataFrame(
        pd.DataFrame({"logline": [f"job {i} done in {i * 2}ms" for i in range(30)]})
    )
    parsed = algo.parse(df, "logline")
    tpls = {r["template"] for r in parsed.select("template").distinct().collect()}
    assert len(tpls) == 1 and "<*>" in next(iter(tpls))


# ---------------------------------------------------------------------------
# one-class SVM (reference one_class_svm.py:44-90) and DBSCAN (dbscan.py:44-79)
# ---------------------------------------------------------------------------

def test_ocsvm_separates_planted_outliers():
    from logai_spark.operators.anomaly import OneClassSVM

    rng = np.random.default_rng(7)
    train = rng.normal(0, 1, size=(300, 2))
    m = OneClassSVM(nu=0.1).fit(train)
    far = np.array([[9.0, 9.0], [-8.0, 8.0]])
    near = np.zeros((3, 2))
    assert (m.predict(far) == -1).all()
    assert (m.predict(near) == 1).all()
    # dual feasibility: alpha on the capped simplex
    assert abs(m._alpha.sum() - 1.0) < 1e-6
    assert m._alpha.max() <= 1.0 / (0.1 * 300) + 1e-9
    # nu upper-bounds the training outlier fraction (soft check)
    assert (m.predict(train) == -1).mean() <= 0.2


def test_ocsvm_spark_broadcast_scoring(spark):
    from logai_spark.operators.anomaly import fit_ocsvm, score_with_model

    rng = np.random.default_rng(8)
    pdf = pd.DataFrame(rng.normal(0, 1, size=(200, 2)), columns=["f0", "f1"])
    pdf.loc[199] = [11.0, -11.0]
    df = spark.createDataFrame(pdf)
    model = fit_ocsvm(df, ["f0", "f1"], nu=0.05)
    scored = score_with_model(df, model, ["f0", "f1"])
    assert scored.orderBy("anom_score").first()["f0"] == 11.0


def test_dbscan_two_blobs_and_noise():
    from logai_spark.operators.anomaly import dbscan_labels

    rng = np.random.default_rng(9)
    a = rng.normal(0, 0.05, size=(60, 2))
    b = rng.normal(5, 0.05, size=(60, 2)) 
    noise = np.array([[2.5, 2.5]])
    X = np.vstack([a, b, noise])
    labels = dbscan_labels(X, eps=0.3, min_samples=5)
    assert set(labels[:60]) == {0}
    assert set(labels[60:120]) == {1}
    assert labels[120] == -1


def test_dbscan_spark_join_back(spark):
    from logai_spark.operators.anomaly import dbscan_fit_predict

    rng = np.random.default_rng(10)
    pdf = pd.DataFrame(
        np.vstack([rng.normal(0, 0.05, size=(50, 2)), rng.normal(3, 0.05, size=(50, 2))]),
        columns=["f0", "f1"],
    )
    pdf["row_id"] = range(len(pdf))
    out = dbscan_fit_predict(spark.createDataFrame(pdf), ["f0", "f1"], "row_id", eps=0.3, min_samples=5)
    got = {r["row_id"]: r["cluster_id"] for r in out.collect()}
    assert len({got[i] for i in range(50)}) == 1
    assert len({got[i] for i in range(50, 100)}) == 1
    assert got[0] != got[99]


def test_seasonal_dbl_catches_daily_cycle_anomaly(spark):
    """A counter with a strong daily cycle (nights ~5, days ~100): a spike to
    60 at 3 am is 12x the nightly baseline but well inside the FLAT
    mean±3σ band (global mean ~52, σ ~47) — plain DBL must miss it, the
    'daily'-trend seasonal baseline must flag it (Merlion DynamicBaseline
    contract, reference dbl.py:46-122)."""
    import pandas as pd

    rows = []
    for day in range(14):
        for hour in range(24):
            ts = pd.Timestamp("2024-03-01") + pd.Timedelta(days=day, hours=hour)
            base = 100.0 if 8 <= hour < 20 else 5.0
            val = base + (hour % 3)  # small deterministic jitter
            rows.append(("s1", ts, val))
    # test-window anomaly: day 12, 3 am spike (inside the last 30%)
    rows = [
        (k, ts, 60.0) if (ts.day == 13 and ts.hour == 3) else (k, ts, v)
        for k, ts, v in rows
    ]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["series", "timestamp", "counts"]))

    flat = detect_anomalies_per_series(
        df, ["series"], algo="dbl", n_sigma=3.0
    ).toPandas()
    flat_hit = flat[(flat["timestamp"].dt.day == 13) & (flat["timestamp"].dt.hour == 3)]
    assert int(flat_hit["is_anomaly"].iloc[0]) == 0  # flat baseline is blind

    seasonal = detect_anomalies_per_series(
        df, ["series"], algo="dbl", n_sigma=3.0, trends=["daily"]
    ).toPandas()
    hit = seasonal[(seasonal["timestamp"].dt.day == 13) & (seasonal["timestamp"].dt.hour == 3)]
    assert int(hit["is_anomaly"].iloc[0]) == 1  # seasonal baseline catches it
    # and the ordinary cycle is not flagged
    normal = seasonal[~((seasonal["timestamp"].dt.day == 13) & (seasonal["timestamp"].dt.hour == 3))]
    assert int(normal["is_anomaly"].sum()) == 0


def test_seasonal_dbl_weekly_trend_and_bad_trend(spark):
    import pandas as pd
    import pytest

    rows = []
    for day in range(28):
        ts = pd.Timestamp("2024-03-04") + pd.Timedelta(days=day)
        val = 200.0 if ts.dayofweek >= 5 else 20.0  # weekend-heavy counter
        rows.append(("s1", ts, val))
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["series", "timestamp", "counts"]))
    out = detect_anomalies_per_series(
        df, ["series"], algo="dbl", n_sigma=3.0, trends=["weekly"]
    ).toPandas()
    assert int(out["is_anomaly"].sum()) == 0  # the cycle itself is baseline

    with pytest.raises(ValueError, match="unsupported trend"):
        detect_anomalies_per_series(df, ["series"], trends=["monthly"])
