"""Analysis facades: the reference's ``logai/analysis`` layer on Spark.

Parity targets:
- AnomalyDetector (/root/reference/logai/analysis/anomaly_detector.py:37-63):
  config carries ``algo_name`` + ``algo_params``; the facade resolves the
  algorithm through the factory and delegates fit/predict.
- NNAnomalyDetector (nn_anomaly_detector.py:16-47): identical dispatch, for
  the sequence detectors (here the torch-free ``forecast_next_event`` and
  ``logbert`` registry entries).
- Clustering (clustering.py:37-63): same shape over the clustering task.

Each facade stays a thin dispatcher: all distributed behavior lives in the
registered algorithms (plans/factory.py), which consume and return
DataFrames.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

from logai_spark.plans.factory import factory


@dataclass
class AnomalyDetectionConfig:
    algo_name: str = "one_class_svm"
    algo_params: dict[str, Any] = field(default_factory=dict)
    custom_params: dict[str, Any] = field(default_factory=dict)


# the reference aliases the NN config to the same class (nn_anomaly_detector.py:13)
NNAnomalyDetectionConfig = AnomalyDetectionConfig


@dataclass
class ClusteringConfig:
    algo_name: str = "dbscan"
    algo_params: dict[str, Any] = field(default_factory=dict)
    custom_params: dict[str, Any] = field(default_factory=dict)


def _resolve(task: str, config) -> Any:
    cfg = factory.get_config(task, config.algo_name.lower(), config.algo_params)
    return factory.get_algorithm(task, config.algo_name.lower(), cfg)


class AnomalyDetector:
    """Dispatches to a registered detection algorithm by ``algo_name``."""

    def __init__(self, config: AnomalyDetectionConfig | None = None):
        self.config = config or AnomalyDetectionConfig()
        self.anomaly_detector = _resolve("detection", self.config)

    def fit(self, df, *args, **kwargs):
        return self.anomaly_detector.fit(df, *args, **kwargs)

    def predict(self, df, *args, **kwargs):
        return self.anomaly_detector.predict(df, *args, **kwargs)


class NNAnomalyDetector(AnomalyDetector):
    """Sequence-detector facade (forecast_next_event / logbert entries)."""


class Clustering:
    """Dispatches to a registered clustering algorithm by ``algo_name``."""

    def __init__(self, config: ClusteringConfig | None = None):
        self.config = config or ClusteringConfig()
        self.model = _resolve("clustering", self.config)

    def fit(self, df, *args, **kwargs):
        return self.model.fit(df, *args, **kwargs)

    def predict(self, df, *args, **kwargs):
        return self.model.predict(df, *args, **kwargs)

    def fit_predict(self, df, *args, **kwargs):
        if hasattr(self.model, "fit_predict"):
            return self.model.fit_predict(df, *args, **kwargs)
        self.model.fit(df, *args, **kwargs)
        return self.model.predict(df, *args, **kwargs)
