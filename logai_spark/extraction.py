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
    # Spark window duration string; None/"" = no time bucketing (reference
    # _get_group skips pd.Grouper when group_by_time is falsy)
    group_by_time: str | None = "5 minutes"
    # <= 0 = whole group as ONE sequence (reference feature_extractor.py:
    # 215-219 else-branch); > 0 = count-based sliding windows
    sliding_window: int = 0
    steps: int = 1


class FeatureExtractor:
    """Grouped feature extraction (feature_extractor.py:59-214): counter
    vectors per (categories [, time bucket]) and sliding/whole-group
    sequences, with the reference's edge semantics: groups SHORTER than the
    window still emit one whole-group row (:195-197), sliding_window <= 0
    collapses each group to one sequence, steps must be positive (:190)."""

    def __init__(self, config: FeatureExtractorConfig | None = None):
        self.config = config or FeatureExtractorConfig()
        if self.config.steps <= 0:
            raise RuntimeError("Step should be greater than zero.")

    def convert_to_counter_vector(
        self, df: DataFrame, ts_col: str = "timestamp"
    ) -> DataFrame:
        from logai_spark.operators.features import counter_vector

        return counter_vector(
            df,
            group_by_cats=self.config.group_by_category or None,
            ts_col=ts_col if self.config.group_by_time else None,
            freq=self.config.group_by_time or "5 minutes",
        )

    def convert_to_sequence(
        self, df: DataFrame, line_col: str = "logline", order_by: str = "seq"
    ) -> DataFrame:
        from pyspark.sql import Window
        from pyspark.sql import functions as F

        from logai_spark.operators.features import session_windows, sliding_windows

        parts = self.config.group_by_category or None
        if self.config.sliding_window <= 0:
            if not parts:
                raise ValueError(
                    "sliding_window <= 0 (whole-group sequences) requires "
                    "group_by_category"
                )
            return session_windows(
                df, span_col=parts[0], line_col=line_col, order_col=order_by
            )
        w = self.config.sliding_window
        grp = Window.partitionBy(*(parts or []))
        sized = df.withColumn("_grp_n", F.count(F.lit(1)).over(grp))
        full = sliding_windows(
            sized.filter(F.col("_grp_n") >= w).drop("_grp_n"),
            window_size=w, partition_by=parts, order_by=order_by,
            line_col=line_col, step=self.config.steps,
        )
        # groups shorter than the window emit ONE whole-group sequence
        # (reference :195-197) — built directly, so the stride filter never
        # sees (and never drops) them
        shorts = (
            sized.filter(F.col("_grp_n") < w)
            .groupBy(*(parts or []))
            .agg(
                F.transform(
                    F.sort_array(
                        F.collect_list(F.struct(F.col(order_by), F.col(line_col)))
                    ),
                    lambda s: s[line_col],
                ).alias("window_lines")
            )
            .withColumn("window_text", F.array_join("window_lines", " "))
        )
        return full.unionByName(shorts, allowMissingColumns=True)
