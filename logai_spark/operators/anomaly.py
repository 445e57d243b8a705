"""Anomaly detection: isolation forest, time-series baselines, divergence.

The reference wraps sklearn / Merlion (neither is in this image):
- isolation_forest.py:47-94 (sklearn IsolationForest; note its
  warm_start=verbose bug at :65 which we deliberately do NOT reproduce)
- ets.py:55-145 / dbl.py:46-122 (Merlion forecasters over [timestamp,counts])
- anomaly_detector_het.py:25-105 (per-attribute loop, min 10 points,
  chronological 70/30 split)
- distribution_divergence.py:46-92 (KL/JS between train/test histograms)

Spark-first shape (SURVEY.md §2.10): features are SMALL after aggregation, so
models fit on the driver over a collected/sampled matrix and score
distributedly via a broadcast model + Arrow pandas_udf. The per-attribute
detector is groupBy().applyInPandas — embarrassingly parallel. The isolation
forest itself is a from-scratch numpy implementation of the published
algorithm (Liu/Ting/Zhou 2008), matching sklearn's scoring convention
(score_samples = -2^(-E[h]/c(n)); anom_score<threshold ~ anomalous).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# isolation forest (from scratch, numpy)
# ---------------------------------------------------------------------------


def _c(n: float) -> float:
    """Average unsuccessful-search path length in a BST of n nodes."""
    if n <= 1:
        return 0.0
    return 2.0 * (math.log(n - 1) + 0.5772156649) - 2.0 * (n - 1) / n


@dataclass
class _ITreeNode:
    feature: int = -1
    threshold: float = 0.0
    left: object = None
    right: object = None
    size: int = 0  # leaf size


def _build_tree(X: np.ndarray, rng: np.random.Generator, depth: int, max_depth: int):
    n = X.shape[0]
    if depth >= max_depth or n <= 1:
        return _ITreeNode(size=n)
    f = int(rng.integers(0, X.shape[1]))
    lo, hi = X[:, f].min(), X[:, f].max()
    if lo == hi:
        return _ITreeNode(size=n)
    t = float(rng.uniform(lo, hi))
    mask = X[:, f] < t
    return _ITreeNode(
        feature=f,
        threshold=t,
        left=_build_tree(X[mask], rng, depth + 1, max_depth),
        right=_build_tree(X[~mask], rng, depth + 1, max_depth),
    )


def _path_length(node: _ITreeNode, x: np.ndarray, depth: int = 0) -> float:
    while node.feature >= 0:
        node = node.left if x[node.feature] < node.threshold else node.right
        depth += 1
    return depth + _c(node.size)


class IsolationForest:
    """Minimal isolation forest: fit(X), score_samples(X) like sklearn's
    (more negative = more anomalous), predict -> -1 anomaly / 1 normal."""

    def __init__(self, n_estimators: int = 100, max_samples: int = 256, seed: int = 42,
                 contamination: float = 0.05):
        self.n_estimators = n_estimators
        self.max_samples = max_samples
        self.seed = seed
        self.contamination = contamination
        self.trees: list[_ITreeNode] = []
        self.sample_size = 0
        self.offset = 0.0

    def fit(self, X: np.ndarray) -> "IsolationForest":
        X = np.asarray(X, dtype=float)
        rng = np.random.default_rng(self.seed)
        n = X.shape[0]
        self.sample_size = min(self.max_samples, n)
        max_depth = int(math.ceil(math.log2(max(self.sample_size, 2))))
        self.trees = []
        for _ in range(self.n_estimators):
            idx = rng.choice(n, size=self.sample_size, replace=False)
            self.trees.append(_build_tree(X[idx], rng, 0, max_depth))
        scores = self.score_samples(X)
        self.offset = float(np.quantile(scores, self.contamination))
        return self

    def score_samples(self, X: np.ndarray) -> np.ndarray:
        X = np.asarray(X, dtype=float)
        cn = _c(self.sample_size)
        out = np.empty(X.shape[0])
        for i, x in enumerate(X):
            eh = np.mean([_path_length(t, x) for t in self.trees])
            out[i] = -(2.0 ** (-eh / cn))
        return out

    def predict(self, X: np.ndarray) -> np.ndarray:
        return np.where(self.score_samples(X) < self.offset, -1, 1)


def fit_isolation_forest(
    df: DataFrame,
    feature_cols: list[str],
    max_fit_rows: int = 100_000,
    **params,
) -> IsolationForest:
    """Driver-side fit on the (post-aggregation, small) feature matrix.
    Deterministic sample cap guards against accidentally huge inputs."""
    pdf = df.select(*feature_cols).limit(max_fit_rows).toPandas()
    model = IsolationForest(**params)
    model.fit(pdf.to_numpy(dtype=float))
    return model


def score_with_model(
    df: DataFrame,
    model,
    feature_cols: list[str],
    score_col: str = "anom_score",
    flag_col: str = "is_anomaly",
) -> DataFrame:
    """Broadcast the fitted model; score in Arrow batches (the reference's
    predict path, isolation_forest.py:79-94, distributed)."""
    spark = df.sparkSession
    bc = spark.sparkContext.broadcast(model)

    @F.pandas_udf(T.DoubleType())
    def _score(*cols: pd.Series) -> pd.Series:
        X = np.column_stack([c.to_numpy(dtype=float) for c in cols])
        return pd.Series(bc.value.score_samples(X))

    out = df.withColumn(score_col, _score(*[F.col(c) for c in feature_cols]))
    return out.withColumn(flag_col, (F.col(score_col) < F.lit(model.offset)).cast("int"))


# ---------------------------------------------------------------------------
# local outlier factor (from scratch, numpy)
# ---------------------------------------------------------------------------


class LocalOutlierFactor:
    """From-scratch LOF in novelty mode (Breunig et al. 2000), the algorithm
    the reference wraps from sklearn (local_outlier_factor.py:46-94;
    novelty=True default at :42). Brute-force distances — the fit set is the
    small post-aggregation feature matrix, collected driver-side; scoring
    runs distributed via the broadcast model (see :func:`score_with_model`).

    Scoring convention mirrors sklearn: ``score_samples(X) = -LOF(X)``
    against the TRAIN set (lower = more anomalous); with contamination
    'auto' the novelty decision offset is -1.5, so predict() flags
    score < -1.5 as -1 (outlier).
    """

    def __init__(self, n_neighbors: int = 20, offset: float = -1.5):
        self.n_neighbors = n_neighbors
        self.offset = offset
        self._X: np.ndarray | None = None
        self._kdist: np.ndarray | None = None
        self._lrd: np.ndarray | None = None

    @staticmethod
    def _dists(A: np.ndarray, B: np.ndarray) -> np.ndarray:
        # (a-b)^2 = a^2 + b^2 - 2ab; clamp tiny negatives from rounding
        sq = (
            (A * A).sum(1)[:, None]
            + (B * B).sum(1)[None, :]
            - 2.0 * (A @ B.T)
        )
        return np.sqrt(np.maximum(sq, 0.0))

    def fit(self, X: np.ndarray) -> "LocalOutlierFactor":
        X = np.asarray(X, dtype=float)
        n = len(X)
        k = min(self.n_neighbors, n - 1)
        if k < 1:
            raise ValueError("LOF needs at least 2 fit points")
        self._X = X
        self._k = k
        d = self._dists(X, X)
        np.fill_diagonal(d, np.inf)
        idx = np.argsort(d, axis=1)[:, :k]  # kNN of each train point
        ndist = np.take_along_axis(d, idx, axis=1)
        self._kdist = ndist[:, -1]  # k-distance per train point
        # local reachability density over the train set
        reach = np.maximum(ndist, self._kdist[idx])
        self._lrd = 1.0 / (reach.mean(axis=1) + 1e-10)
        return self

    def score_samples(self, X: np.ndarray) -> np.ndarray:
        X = np.asarray(X, dtype=float)
        d = self._dists(X, self._X)
        idx = np.argsort(d, axis=1)[:, : self._k]
        ndist = np.take_along_axis(d, idx, axis=1)
        reach = np.maximum(ndist, self._kdist[idx])
        lrd_x = 1.0 / (reach.mean(axis=1) + 1e-10)
        lof = self._lrd[idx].mean(axis=1) / lrd_x
        return -lof

    def predict(self, X: np.ndarray) -> np.ndarray:
        return np.where(self.score_samples(X) < self.offset, -1, 1)


def fit_lof(
    df: DataFrame,
    feature_cols: list[str],
    max_fit_rows: int = 50_000,
    **params,
) -> LocalOutlierFactor:
    """Driver-side LOF fit on the (post-aggregation, small) feature matrix;
    score with :func:`score_with_model` (broadcast + Arrow batches)."""
    pdf = df.select(*feature_cols).limit(max_fit_rows).toPandas()
    return LocalOutlierFactor(**params).fit(pdf.to_numpy(dtype=float))


# ---------------------------------------------------------------------------
# per-attribute time-series detectors (het detector semantics)
# ---------------------------------------------------------------------------

MIN_TS_LENGTH = 10  # reference constants.py:40


def detect_anomalies_per_series(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str = "timestamp",
    value_col: str = "counts",
    train_frac: float = 0.7,
    n_sigma: float = 3.0,
    algo: str = "dbl",
) -> DataFrame:
    """Per-key fit/predict via applyInPandas (anomaly_detector_het.py:72-98):
    series shorter than MIN_TS_LENGTH are skipped; the first ``train_frac``
    chronologically is train (log_anomaly_detection.py:144-149).

    algo='dbl': dynamic baseline — flag test points beyond mean ± n_sigma of
    the train window (Merlion DynamicBaseline spirit, dbl.py:46-122).
    algo='ets': simple exponential smoothing one-step forecasts; flag test
    points whose residual exceeds n_sigma of train residuals (ets.py:55-145
    spirit, statsmodels-free).
    """
    out_fields = [df.schema[c] for c in key_cols] + [
        df.schema[ts_col],
        df.schema[value_col],
        T.StructField("anom_score", T.DoubleType()),
        T.StructField("is_anomaly", T.IntegerType()),
    ]
    schema = T.StructType(out_fields)

    def fit_predict(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(ts_col).reset_index(drop=True)
        n = len(pdf)
        if n < MIN_TS_LENGTH:
            return pdf.head(0)[[*key_cols, ts_col, value_col]].assign(
                anom_score=pd.Series(dtype=float), is_anomaly=pd.Series(dtype="int32")
            )
        split = int(n * train_frac)
        y = pdf[value_col].to_numpy(dtype=float)
        train, test = y[:split], y[split:]
        if algo == "ets":
            alpha = 0.3
            level = train[0]
            resid = []
            for v in train[1:]:
                resid.append(v - level)
                level = alpha * v + (1 - alpha) * level
            sigma = float(np.std(resid)) if resid else 1.0
            sigma = sigma if sigma > 0 else 1.0
            scores = np.zeros(n)
            lvl = level
            for i, v in enumerate(test):
                scores[split + i] = (v - lvl) / sigma
                lvl = alpha * v + (1 - alpha) * lvl
        else:  # dbl
            mu, sd = float(train.mean()), float(train.std() or 1.0)
            sd = sd if sd > 0 else 1.0
            scores = np.zeros(n)
            scores[split:] = (test - mu) / sd
        out = pdf[[*key_cols, ts_col, value_col]].copy()
        out["anom_score"] = scores
        out["is_anomaly"] = (np.abs(scores) > n_sigma).astype("int32")
        return out.iloc[split:]

    return df.groupBy(*key_cols).applyInPandas(fit_predict, schema)


# ---------------------------------------------------------------------------
# distribution divergence (pure SQL)
# ---------------------------------------------------------------------------


def distribution_divergence(
    train: DataFrame,
    test: DataFrame,
    value_col: str,
    n_bins: int = 10,
    lo: float | None = None,
    hi: float | None = None,
) -> dict:
    """KL and JS divergence between train/test histograms
    (distribution_divergence.py:46-92). Two groupBy-count scans + tiny
    driver-side math over n_bins numbers."""
    if lo is None or hi is None:
        row = train.select(
            F.min(value_col).alias("lo"), F.max(value_col).alias("hi")
        ).first()
        lo = lo if lo is not None else float(row["lo"])
        hi = hi if hi is not None else float(row["hi"])
    width = (hi - lo) / n_bins or 1.0

    def probs(df: DataFrame) -> np.ndarray:
        bucket = F.least(
            F.greatest(F.floor((F.col(value_col) - lo) / width), F.lit(0)),
            F.lit(n_bins - 1),
        ).cast("int")
        rows = df.select(bucket.alias("b")).groupBy("b").count().collect()
        h = np.full(n_bins, 1e-12)
        for r in rows:
            h[r["b"]] += r["count"]
        return h / h.sum()

    p, q = probs(train), probs(test)
    kl = float(np.sum(p * np.log(p / q)))
    m = (p + q) / 2
    js = float(0.5 * np.sum(p * np.log(p / m)) + 0.5 * np.sum(q * np.log(q / m)))
    return {"kl": kl, "js": js}
