"""OpenSet anomaly-detection workflow: the reference's §3.2 flow on Spark.

Parity target: ``OpenSetADWorkflow.execute``
(/root/reference/logai/examples/... openset_anomaly_detection_workflow.py:
525-538): load -> dataset preprocess -> parse -> partition into session/
sliding windows -> train/dev/test split by span -> dedup-with-counts ->
vectorize -> detector. The reference checkpoints every stage to CSV and
resumes (:260-321); here each stage can checkpoint to parquet+manifest via
operators.route.checkpoint (idempotent resume, north_rule).

The torch detectors are out of v1 scope (SURVEY §2.10); the detector stage
offers (a) the isolation forest over per-window count features and (b) the
torch-free forecast path (``detector="forecast_next_event"``): sequential
vocab over the TRAIN lines, (window_ids, next_id) pairs via the vocab join,
DeepLog top-g next-event detection (operators/forecast.py — the reference's
forecast_nn decision rule, anomaly_detection_algo/forecast_nn.py:76-115),
session verdict = OR of window verdicts, plus precision/recall/F1 vs the
span labels (utils/evaluate.py:12-27 parity). Same contract either way:
windows in, window_anomalies out.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from logai_spark.operators.anomaly import fit_isolation_forest, score_with_model
from logai_spark.operators.features import dedup_with_counts, sliding_windows
from logai_spark.operators.route import checkpoint
from logai_spark.operators.splits import split_by_span
from logai_spark.parse.distributed import parse_df
from logai_spark.parse.drain import DrainConfig
from logai_spark.preprocess import PreprocessorConfig, clean_log_openset
from logai_spark.preprocess_opensets import (
    bgl_preprocess,
    hdfs_preprocess,
    thunderbird_preprocess,
)
from logai_spark.sources.readers import load_openset


@dataclass
class OpenSetADConfig:
    dataset: str = "hdfs"  # hdfs | bgl | thunderbird
    filepath: str = ""
    label_filepath: str | None = None
    preprocessor: PreprocessorConfig = field(default_factory=PreprocessorConfig)
    drain: DrainConfig = field(default_factory=DrainConfig)
    parse: bool = True
    window_size: int = 10
    training_type: str = "unsupervised"
    checkpoint_dir: str | None = None
    detector: str = "isolation_forest"  # | "forecast_next_event"
    forecast_g: int = 3
    forecast_hidden: int | None = None  # MLP width; None = linear forecaster


def run_openset_ad(spark: SparkSession, config: OpenSetADConfig) -> dict[str, DataFrame]:
    """Returns {windows, train, dev, test, scored} DataFrames."""
    cfg = config

    def ckpt(df: DataFrame, stage: str) -> DataFrame:
        if cfg.checkpoint_dir:
            return checkpoint(df, os.path.join(cfg.checkpoint_dir, stage), stage)
        return df

    # 1. load + dataset preprocess (span ids + labels)
    df = load_openset(spark, cfg.dataset, cfg.filepath)
    if cfg.dataset == "hdfs":
        labels = (
            spark.read.options(header=True).csv(cfg.label_filepath)
            if cfg.label_filepath
            else None
        )
        df = hdfs_preprocess(df, labels)
        if "labels" not in df.columns:
            df = df.withColumn("labels", F.lit(0))
    elif cfg.dataset == "bgl":
        df = df.withColumnRenamed("span_id", "Id").withColumnRenamed("labels", "Label")
        df = bgl_preprocess(df)
    elif cfg.dataset == "thunderbird":
        df = thunderbird_preprocess(df)
    df = df.filter(F.col("span_id").isNotNull())
    if cfg.preprocessor.custom_replace_list or cfg.preprocessor.custom_delimiters_regex:
        df = clean_log_openset(df, "logline", cfg.preprocessor)
    df = ckpt(df, "preprocessed")

    # 2. optional parse (:276-297)
    if cfg.parse:
        df, _templates = parse_df(df, "logline", cfg.drain)
        line_col = "template"
    else:
        line_col = "logline"

    # 3. deterministic in-span sequence + sliding windows w/ window label
    seq = F.row_number().over(
        Window.partitionBy("span_id").orderBy(
            F.coalesce(F.col("timestamp").cast("string"), F.lit("")), line_col
        )
    )
    df = df.withColumn("_seq", seq)
    windows = sliding_windows(
        df,
        cfg.window_size,
        partition_by=["span_id"],
        order_by="_seq",
        line_col=line_col,
        exclude_smaller_windows=False,
        with_next_line=True,
        label_col="labels",
    )
    windows = ckpt(windows, "windows")

    # 4. train/dev/test split by span (:299-321 + dataset_utils)
    split_df = split_by_span(
        windows, "span_id", "window_label", order_col="_seq",
        training_type=cfg.training_type,
    )

    # 5. dedup with counts (:377-410)
    train = dedup_with_counts(
        split_df.filter(F.col("split") == "train"),
        ["span_id", "window_text"],
        label_col="window_label",
    )
    dev = split_df.filter(F.col("split") == "dev")
    test = split_df.filter(F.col("split") == "test")

    # 6. vectorize + detect
    if cfg.detector == "forecast_next_event":
        scored, metrics = _forecast_detect(split_df, cfg)
        return {
            "windows": windows, "train": train, "dev": dev, "test": test,
            "scored": scored, "metrics": metrics,
        }

    # per-window count features -> isolation forest
    feats = train.select(
        F.col("counts").cast("double").alias("f_count"),
        F.length("window_text").cast("double").alias("f_len"),
    )
    model = fit_isolation_forest(feats, ["f_count", "f_len"])
    scored = score_with_model(
        test.withColumn("f_count", F.lit(1.0)).withColumn(
            "f_len", F.length("window_text").cast("double")
        ),
        model,
        ["f_count", "f_len"],
    )
    return {"windows": windows, "train": train, "dev": dev, "test": test, "scored": scored}


_US = "\x1f"  # unit separator: never occurs in log lines or templates


def _forecast_detect(split_df: DataFrame, cfg: OpenSetADConfig):
    """DeepLog-style sequence AD over the split windows table.

    Vocab is fit on TRAIN lines only (unsupervised split = normal grammar);
    window/next lines map to dense ids through DataFrame joins (never a
    collected literal map); the model fits on the deduplicated train
    (window_ids, next_id) table and scores test windows via a broadcast
    weight matrix. Session verdict = OR of its window verdicts — the
    deep-loglizer evaluation protocol the reference's forecast_nn models
    are scored under."""
    from logai_spark.functions.vectorizers import _ids_by_join, sequential_vocab
    from logai_spark.operators.evaluate import binary_metrics
    from logai_spark.operators.forecast import fit_next_event_model, score_next_event

    train_w = split_df.filter(F.col("split") == "train")
    vocab = sequential_vocab(
        train_w.select(F.explode("window_lines").alias("_line")), "_line"
    )
    oov = vocab.count()

    def to_ids(wdf: DataFrame) -> DataFrame:
        keyed = wdf.filter(F.col("next_logline").isNotNull()).withColumn(
            "_wkey", F.array_join("window_lines", _US)
        )
        mapped = _ids_by_join(
            keyed, vocab, "_wkey", F.split(F.col("_wkey"), _US),
            "_line", "line_id", cfg.window_size, oov,
        ).withColumnRenamed("token_ids", "window_ids")
        nxt = vocab.select(
            F.col("_line").alias("next_logline"), F.col("line_id").alias("_nid")
        )
        return (
            mapped.join(nxt, "next_logline", "left")
            .withColumn("next_id", F.coalesce("_nid", F.lit(oov)))
            .drop("_nid", "_wkey")
        )

    model = fit_next_event_model(
        to_ids(train_w), vocab_size=oov, hidden=cfg.forecast_hidden
    )
    test_w = split_df.filter(F.col("split") == "test")
    scored = score_next_event(to_ids(test_w), model, g=cfg.forecast_g)
    # Ground-truth span labels come from ALL test windows — the scoring set
    # drops each span's final window (no next line), so aggregating labels
    # from `scored` would mislabel a span whose only anomalous line is its
    # last, and 1-line spans would vanish from the metrics denominator.
    span_labels = test_w.groupBy("span_id").agg(
        F.max("window_label").alias("label")
    )
    span_preds = scored.groupBy("span_id").agg(F.max("is_anomaly").alias("pred"))
    span_verdicts = span_labels.join(span_preds, "span_id", "left").withColumn(
        "pred", F.coalesce("pred", F.lit(0))
    )
    return scored, binary_metrics(span_verdicts, "pred", "label")
