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


def test_feature_extractor_whole_group_and_short_groups(spark):
    rows = [
        {"logline": f"m{i}", "app": "a", "seq": i} for i in range(6)
    ] + [{"logline": f"s{i}", "app": "b", "seq": i} for i in range(2)]
    df = spark.createDataFrame(pd.DataFrame(rows))

    # sliding_window <= 0: one whole-group sequence per group
    fx0 = FeatureExtractor(
        FeatureExtractorConfig(group_by_category=["app"], sliding_window=0)
    )
    whole = fx0.convert_to_sequence(df).toPandas()
    assert len(whole) == 2  # one row per group

    # short groups (len < window) still emit one whole-group row
    fx4 = FeatureExtractor(
        FeatureExtractorConfig(group_by_category=["app"], sliding_window=4)
    )
    out = fx4.convert_to_sequence(df).toPandas()
    b_rows = out[out["window_text"].str.startswith("s")]
    assert len(b_rows) == 1 and b_rows.iloc[0]["window_text"] == "s0 s1"
    a_rows = out[out["window_text"].str.startswith("m")]
    assert all(len(t.split()) == 4 for t in a_rows["window_text"])


def test_feature_extractor_category_only_counters(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"app": ["a", "a", "b"]})  # no timestamp column at all
    )
    fx = FeatureExtractor(
        FeatureExtractorConfig(group_by_category=["app"], group_by_time=None)
    )
    out = fx.convert_to_counter_vector(df).toPandas()
    assert dict(zip(out["app"], out["counts"])) == {"a": 2, "b": 1}


def test_feature_extractor_nonpositive_step_raises(spark):
    with pytest.raises(RuntimeError):
        FeatureExtractor(FeatureExtractorConfig(sliding_window=4, steps=0))


def test_record_io_rejects_remote_schemes(spark):
    from logai_spark.sources.record_io import save_record_csv

    df = spark.createDataFrame(pd.DataFrame({"logline": ["x"]}))
    with pytest.raises(ValueError):
        save_record_csv(df, "s3a://bucket/rec", {"body": ["logline"]})


def test_record_io_dtype_round_trip(spark, tmp_path):
    """Schema rides in the sidecar: numeric/timestamp columns keep their
    types across save/load (reference load_from_csv uses pandas inference,
    data_model.py:126-132; plain CSV would string-ify everything)."""
    import datetime

    from logai_spark.sources.record_io import load_record_csv, save_record_csv

    df = spark.createDataFrame(
        [(datetime.datetime(2024, 1, 1, 12, 0), "a", 3, 1.5)],
        "ts timestamp, logline string, sev int, score double",
    )
    path = str(tmp_path / "rec")
    save_record_csv(df, path, {"timestamp": ["ts"], "body": ["logline"],
                               "severity_number": ["sev"]})
    back, meta = load_record_csv(spark, path)
    assert dict(back.dtypes) == dict(df.dtypes)
    assert meta["body"] == ["logline"]
    assert "_spark_schema" not in meta
    row = back.collect()[0]
    assert row["sev"] == 3 and abs(row["score"] - 1.5) < 1e-9
