"""Information-extraction facade parity (reference information_extraction/*)."""

import pandas as pd
import pytest

from logai_spark.extraction import (
    CategoricalEncoder,
    CategoricalEncoderConfig,
    FeatureExtractor,
    FeatureExtractorConfig,
    LogVectorizer,
    VectorizerConfig,
)


def test_log_vectorizer_facade_tfidf(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [0, 1, 2, 3],
                      "logline": ["a b c", "a b", "c d", "d e f"]})
    )
    v = LogVectorizer(VectorizerConfig(algo_name="tfidf"))
    v.fit(df)
    out = v.transform(df)
    assert out.count() == 4


def test_categorical_encoder_facade(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"level": ["INFO", "WARN", "INFO", "ERROR"]})
    )
    enc = CategoricalEncoder(CategoricalEncoderConfig(name="label_encoder"))
    out = enc.fit_transform(df, ["level"]).toPandas()
    assert out.filter(like="level").shape[1] >= 2  # original + encoded
    with pytest.raises(ValueError):
        CategoricalEncoder(CategoricalEncoderConfig(name="bogus"))


def test_feature_extractor_facade_counter_and_sequence(spark):
    rows = []
    for i in range(40):
        rows.append(
            {
                "logline": f"msg {i % 3}",
                "app": f"app{i % 2}",
                "timestamp": pd.Timestamp("2024-01-01") + pd.Timedelta(minutes=i),
                "seq": i,
            }
        )
    df = spark.createDataFrame(pd.DataFrame(rows))
    fx = FeatureExtractor(
        FeatureExtractorConfig(
            group_by_category=["app"], group_by_time="10 minutes",
            sliding_window=4, steps=2,
        )
    )
    counters = fx.convert_to_counter_vector(df).toPandas()
    assert set(counters.columns) >= {"app", "timestamp", "counts"}
    assert counters["counts"].sum() == 40
    seqs = fx.convert_to_sequence(df)
    assert "window_text" in seqs.columns and seqs.count() > 0
