"""Multimodal plumbing (stubbed decode, real Spark shapes) + HDFS/BGL prep."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from logai_spark.functions.multimodal import (
    decode_image,
    extract_image_features,
    resize_images,
    sample_video_frames,
    synth_media,
)
from logai_spark.preprocess_opensets import bgl_preprocess, hdfs_preprocess


def test_decode_stub_raises_without_fake():
    with pytest.raises(NotImplementedError):
        decode_image(b"xx")


def test_image_features_shape_and_determinism(spark):
    media = synth_media(spark, 20)
    feats = extract_image_features(media, fake_decode=True).toPandas()
    assert len(feats) == 20
    widths = feats["features"].map(len).unique()
    assert list(widths) == [24]  # 3 channels x 8 bins
    # l1-normalized
    assert all(abs(sum(v) - 1.0) < 1e-9 for v in feats["features"])
    # deterministic across partitionings
    again = extract_image_features(synth_media(spark, 20), fake_decode=True).toPandas()
    a = dict(zip(feats["media_id"], feats["features"].map(tuple)))
    b = dict(zip(again["media_id"], again["features"].map(tuple)))
    assert a == b


def test_resize_images(spark):
    media = synth_media(spark, 5)
    out = resize_images(media, 8, 4, fake_decode=True).toPandas()
    assert (out["width"] == 8).all() and (out["height"] == 4).all()
    assert out["resized"].map(len).unique().tolist() == [8 * 4 * 3]


def test_sample_video_frames(spark):
    media = synth_media(spark, 3, kind="video")
    out = sample_video_frames(media, n_frames=4, fake_decode=True).toPandas()
    assert len(out) == 12
    assert set(out["frame_idx"]) == {0, 1, 2, 3}


def test_bgl_preprocess(spark):
    pdf = pd.DataFrame(
        {
            "Id": [1117838570, 1117838580, 1117838700, 1117838760],
            "Label": ["-", "KERNDTLB", "-", "-"],
            "logline": ["a", "b", "c", "d"],
        }
    )
    out = bgl_preprocess(spark.createDataFrame(pdf)).toPandas()
    assert out["span_id"].tolist() == ["0", "0", "2", "3"]
    assert out["labels"].tolist() == [0, 1, 0, 0]


def test_hdfs_preprocess_with_labels(spark):
    pdf = pd.DataFrame(
        {
            "logline": [
                "Receiving block blk_123 src: /1.2.3.4:5 dest: /1.2.3.4:6",
                "PacketResponder 1 for block blk_-99 terminating",
                "no block here",
            ]
        }
    )
    labels = spark.createDataFrame(
        pd.DataFrame({"BlockId": ["blk_-99"], "Label": ["Anomaly"]})
    )
    out = hdfs_preprocess(spark.createDataFrame(pdf), labels).toPandas()
    byline = out.set_index("logline")
    assert byline.loc["Receiving block blk_123 src: /1.2.3.4:5 dest: /1.2.3.4:6", "span_id"] == "blk_123"
    assert byline.loc["PacketResponder 1 for block blk_-99 terminating", "labels"] == 1
    assert byline.loc["Receiving block blk_123 src: /1.2.3.4:5 dest: /1.2.3.4:6", "labels"] == 0
