"""Structured-Streaming smoke: parquet-source stream through watermarked
counters / sessions / template match, driven to completion via memory sink."""

import pandas as pd
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from logai_spark.streaming import (
    streaming_counter_vector,
    streaming_match_templates,
    streaming_session_windows,
)

SCHEMA = T.StructType(
    [
        T.StructField("timestamp", T.TimestampType()),
        T.StructField("span_id", T.StringType()),
        T.StructField("logline", T.StringType()),
    ]
)


@pytest.fixture(scope="module")
def stream_dir(spark, tmp_path_factory):
    p = tmp_path_factory.mktemp("stream")
    rows = []
    for i in range(200):
        rows.append(
            (
                pd.Timestamp("2024-01-01") + pd.Timedelta(seconds=40 * i),
                f"span{i % 4}",
                f"request {i} handled",
            )
        )
    pdf = pd.DataFrame(rows, columns=["timestamp", "span_id", "logline"])
    spark.createDataFrame(pdf, SCHEMA).write.mode("overwrite").parquet(str(p / "in"))
    return str(p / "in")


def _run_to_memory(q_df, name):
    q = (
        q_df.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .start()
    )
    q.processAllAvailable()
    q.stop()


def test_streaming_counter_vector(spark, stream_dir):
    stream = spark.readStream.schema(SCHEMA).parquet(stream_dir)
    agg = streaming_counter_vector(stream, ["span_id"], freq="5 minutes")
    _run_to_memory(agg, "counters_out")
    out = spark.sql("SELECT * FROM counters_out").toPandas()
    # append mode emits only watermark-closed windows; all but the last are closed
    assert out["counts"].sum() > 0
    assert (out["counts"] > 0).all()
    assert out.groupby(["span_id", "timestamp"]).size().max() == 1


def test_streaming_session_windows(spark, stream_dir):
    stream = spark.readStream.schema(SCHEMA).parquet(stream_dir)
    sess = streaming_session_windows(stream, gap="2 minutes")
    _run_to_memory(sess, "sessions_out")
    out = spark.sql("SELECT * FROM sessions_out").toPandas()
    assert len(out) > 0
    assert (out["session_len"] > 0).all()
    assert (out["session_end"] > out["session_start"]).all()


def test_streaming_template_match(spark, stream_dir):
    from logai_spark.parse.distributed import mine_templates

    batch = spark.read.parquet(stream_dir)
    templates = mine_templates(batch)
    stream = spark.readStream.schema(SCHEMA).parquet(stream_dir)
    matched = streaming_match_templates(stream, templates)
    _run_to_memory(matched, "match_out")
    out = spark.sql("SELECT * FROM match_out").toPandas()
    assert len(out) == 200
    assert out["template_id"].notna().all()
    assert out["template_id"].nunique() == 1  # "request * handled"
