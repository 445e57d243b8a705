"""Information-extraction facades: the reference's
``logai/information_extraction`` layer on Spark.

Parity targets:
- LogVectorizer (log_vectorizer.py:30-75): config carries ``algo_name`` +
  ``algo_param``; dispatches fit/transform through the vectorization
  registry.
- CategoricalEncoder (categorical_encoder.py:21-76): ``name`` picks
  label_encoder / one_hot_encoder / ordinal_encoder; fit_transform applies
  the encoding (functions/encoders.py — the reference's three
  categorical_encoding_algo classes).
- FeatureExtractor (feature_extractor.py:59-214): ``group_by_category`` +
  ``group_by_time`` config drives convert_to_counter_vector /
  convert_to_sequence over the grouped log table (operators/features.py).

Facades are thin: all distributed behavior lives in the delegated
operators; these exist so reference-shaped workflow code ports unchanged.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame

from logai_spark.plans.factory import factory


@dataclass
class VectorizerConfig:
    algo_name: str = "word2vec"
    algo_param: dict[str, Any] = field(default_factory=dict)
    custom_param: dict[str, Any] = field(default_factory=dict)


class LogVectorizer:
    """fit/transform dispatch over the vectorization registry."""

    def __init__(self, config: VectorizerConfig | None = None):
        self.config = config or VectorizerConfig()
        cfg = factory.get_config(
            "vectorization", self.config.algo_name.lower(), self.config.algo_param
        )
        self.vectorizer = factory.get_algorithm(
            "vectorization", self.config.algo_name.lower(), cfg
        )

    def fit(self, df: DataFrame, *args, **kwargs):
        return self.vectorizer.fit(df, *args, **kwargs)

    def transform(self, df: DataFrame, *args, **kwargs):
        return self.vectorizer.transform(df, *args, **kwargs)


@dataclass
class CategoricalEncoderConfig:
    name: str = "label_encoder"
    params: dict[str, Any] = field(default_factory=dict)


class CategoricalEncoder:
    """name-dispatch over the three categorical encoders
    (categorical_encoder.py:49-60 maps name -> algorithm)."""

    _ENCODERS = ("label_encoder", "one_hot_encoder", "ordinal_encoder")

    def __init__(self, config: CategoricalEncoderConfig | None = None):
        self.config = config or CategoricalEncoderConfig()
        name = self.config.name.lower()
        if name not in self._ENCODERS:
            raise ValueError(
                f"unknown encoder {name!r}; choose from {self._ENCODERS}"
            )
        self.name = name

    def fit_transform(self, df: DataFrame, cols: list[str]) -> DataFrame:
        from logai_spark.functions import encoders

        fn = {
            "label_encoder": encoders.label_encode,
            "one_hot_encoder": encoders.one_hot_encode,
            "ordinal_encoder": encoders.ordinal_encode,
        }[self.name]
        return fn(df, cols)


@dataclass
class FeatureExtractorConfig:
    group_by_category: list[str] = field(default_factory=list)
    group_by_time: str = "5 minutes"  # Spark window duration string
    sliding_window: int = 0
    steps: int = 1


class FeatureExtractor:
    """Grouped feature extraction (feature_extractor.py:59-214): counter
    vectors per (categories, time bucket) and sliding sequences."""

    def __init__(self, config: FeatureExtractorConfig | None = None):
        self.config = config or FeatureExtractorConfig()

    def convert_to_counter_vector(
        self, df: DataFrame, ts_col: str = "timestamp"
    ) -> DataFrame:
        from logai_spark.operators.features import counter_vector

        return counter_vector(
            df,
            group_by_cats=self.config.group_by_category or None,
            ts_col=ts_col,
            freq=self.config.group_by_time,
        )

    def convert_to_sequence(
        self, df: DataFrame, line_col: str = "logline", order_by: str = "seq"
    ) -> DataFrame:
        from logai_spark.operators.features import sliding_windows

        return sliding_windows(
            df,
            window_size=max(self.config.sliding_window, 1),
            partition_by=self.config.group_by_category or None,
            order_by=order_by,
            line_col=line_col,
            step=self.config.steps,
        )
