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


def test_streaming_dbl_state_carries_across_microbatches(spark, tmp_path):
    """applyInPandasWithState baseline detector: the baseline learned in
    micro-batch 1 must score micro-batch 2 (state store carry-over), and a
    planted spike in batch 2 must be the only flagged point."""
    import pandas as pd

    from logai_spark.streaming import streaming_dbl_scores

    schema = T.StructType(
        [
            T.StructField("timestamp", T.TimestampType()),
            T.StructField("key", T.StringType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    base = pd.Timestamp("2024-01-01")
    batch1 = pd.DataFrame(
        {
            "timestamp": [base + pd.Timedelta(seconds=i) for i in range(50)],
            "key": "k",
            "value": [10.0 + (i % 5) * 0.1 for i in range(50)],
        }
    )
    vals2 = [10.0 + (i % 5) * 0.1 for i in range(50)]
    vals2[25] = 500.0  # planted spike
    batch2 = pd.DataFrame(
        {
            "timestamp": [base + pd.Timedelta(seconds=100 + i) for i in range(50)],
            "key": "k",
            "value": vals2,
        }
    )
    p = tmp_path / "in"
    spark.createDataFrame(batch1, schema).coalesce(1).write.mode("overwrite").parquet(
        str(p / "b1")
    )
    spark.createDataFrame(batch2, schema).coalesce(1).write.mode("overwrite").parquet(
        str(p / "b2")
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(p / "b*"))
    )
    scored = streaming_dbl_scores(stream, ["key"], "timestamp", "value")
    q = (
        scored.writeStream.outputMode("append")
        .format("memory")
        .queryName("dbl_out")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    out = spark.sql("SELECT * FROM dbl_out").toPandas().sort_values("timestamp")
    assert len(out) == 100
    flagged = out[out["is_anomaly"] == 1]
    assert len(flagged) == 1
    assert float(flagged["value"].iloc[0]) == 500.0
    # the spike is in batch 2: catching it proves the batch-1 baseline
    # survived in the state store
    assert flagged["timestamp"].iloc[0] >= base + pd.Timedelta(seconds=100)


def test_streaming_forecast_scoring(spark, tmp_path):
    """The forecast scorer is stateless (broadcast weights + pandas_udf), so
    it is stream-valid as-is: score a parquet stream of (window_ids,
    next_id) rows to a memory sink and check the DeepLog verdicts match the
    batch path row for row."""
    import numpy as np

    from logai_spark.operators.forecast import (
        fit_next_event_model,
        score_next_event,
    )

    seq = []
    for i in range(60):
        seq.extend([0, 1, 2] if i % 5 else [0, 3])
    rows = [(seq[i : i + 3], seq[i + 3]) for i in range(len(seq) - 3)]
    pdf = pd.DataFrame(
        {"window_ids": [r[0] for r in rows], "next_id": [r[1] for r in rows]}
    )
    batch = spark.createDataFrame(pdf)
    model = fit_next_event_model(batch, vocab_size=4)

    schema = T.StructType(
        [
            T.StructField("window_ids", T.ArrayType(T.LongType())),
            T.StructField("next_id", T.LongType()),
        ]
    )
    src = str(tmp_path / "win_stream")
    batch.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(schema).parquet(src)
    _run_to_memory(score_next_event(stream, model, g=2), "forecast_out")
    got = spark.sql("select * from forecast_out").toPandas()
    want = score_next_event(batch, model, g=2).toPandas()
    assert len(got) == len(want)
    key = lambda d: d.assign(k=d["window_ids"].map(tuple)).sort_values(
        ["k", "next_id", "next_rank"]
    )["is_anomaly"].tolist()
    assert key(got) == key(want)


def test_streaming_sessionize_gap_boundary(spark, tmp_path):
    """session_window membership is INCLUSIVE at the gap boundary: an event
    exactly gap after the previous one still joins (Spark merges a window
    whose start equals the prior session end) — identical to the batch
    sessionize_by_gap rule, which breaks only on strictly-greater."""
    import datetime as dt

    from logai_spark.streaming import counters as sc

    base = dt.datetime(2024, 1, 1)
    rows = [
        (1, base, 0),
        (1, base + dt.timedelta(seconds=60), 1),    # exactly gap -> joins
        (1, base + dt.timedelta(seconds=121), 2),   # 61s later -> NEW session
        (2, base, 3),
    ]
    src = str(tmp_path / "sess_src")
    spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long"
    ).coalesce(1).write.parquet(src)

    stream = spark.readStream.schema(
        "user_id long, ts timestamp, event_id long"
    ).parquet(src)
    agg = sc.streaming_sessionize(stream, ["user_id"], ts_col="ts", gap="60 seconds")
    q = (
        agg.writeStream.format("memory")
        .queryName("sessionize_out")
        .outputMode("complete")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt_sess"))
        .start()
    )
    q.awaitTermination()
    out = spark.sql(
        "SELECT * FROM sessionize_out ORDER BY user_id, session_start"
    ).collect()
    per_user = {}
    for r in out:
        per_user.setdefault(r.user_id, []).append(r.n_events)
    assert per_user == {1: [2, 1], 2: [1]}

    # equivalence with the batch sessionizer on the same rows
    from logai_spark.operators.features import sessionize_by_gap

    batch = sessionize_by_gap(
        spark.createDataFrame(rows, "user_id long, ts timestamp, event_id long"),
        ["user_id"], "ts", 60, ["event_id"],
    )
    batch_sizes = {
        (r.user_id, r.session_seq): r.n
        for r in batch.groupBy("user_id", "session_seq")
        .agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert batch_sizes == {(1, 1): 2, (1, 2): 1, (2, 1): 1}


def test_streaming_exact_dedup_cross_batch(spark, tmp_path):
    """A content duplicate arriving in a LATER micro-batch (within the
    watermark) must be dropped by the state store, not just within-batch."""
    import os

    from pyspark.sql import functions as F

    from logai_spark.streaming.dedup import streaming_exact_dedup

    src = str(tmp_path / "src")
    base = spark.createDataFrame(
        [(i, f"text {i % 3}") for i in range(6)], "doc_id long, text string"
    ).withColumn("warc_ts", F.to_timestamp(F.lit("2024-01-01 00:00:00")))
    late_dup = spark.createDataFrame(
        [(100, "text 0")], "doc_id long, text string"
    ).withColumn("warc_ts", F.to_timestamp(F.lit("2024-01-01 00:01:00")))
    base.coalesce(1).write.parquet(os.path.join(src, "a.parquet"))
    late_dup.coalesce(1).write.parquet(os.path.join(src, "b.parquet"))

    stream = (
        spark.readStream.schema(base.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(src, "*.parquet"))
    )
    out = streaming_exact_dedup(stream, ["text"], ts_col="warc_ts")
    name = "_stream_dedup_test"
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination()
    rows = spark.sql(f"SELECT * FROM {name}").collect()
    # 3 distinct texts survive; the 4 within-batch dups AND the
    # cross-batch doc 100 are dropped
    assert len(rows) == 3
    assert sorted({r["text"] for r in rows}) == ["text 0", "text 1", "text 2"]
    assert 100 not in {r["doc_id"] for r in rows}
