"""Train/dev/test split by span id for anomaly-detection workflows.

Parity target: ``split_train_dev_test_for_anomaly_detection``
(/root/reference/logai/utils/dataset_utils.py:15-113): rows are assigned by
their SPAN; chronologically (shuffle=False) the first 72% of rows are train,
next 8% dev, last 20% test; in unsupervised mode every anomalous (label=1)
span from train/dev moves to test so training sees only normal data.

Spark shape: percent_rank over a deterministic row order -> per-row split,
then span-level aggregation (a span's split = its rows' split; anomalous
spans overridden) -> semi-join assignment. No driver-side id lists.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def split_by_span(
    df: DataFrame,
    span_col: str = "span_id",
    label_col: str | None = "labels",
    order_col: str | None = None,
    training_type: str = "unsupervised",
    test_frac: float = 0.2,
    dev_frac: float = 0.08,
) -> DataFrame:
    """Adds a ``split`` column in {train, dev, test}.

    Spans are ordered chronologically (min of ``order_col`` per span; falls
    back to the span id itself) and cut into train/dev/test fractions; in
    unsupervised mode anomalous spans in train/dev are reassigned to test
    (dataset_utils.py:70-85).
    """
    if training_type not in ("supervised", "unsupervised"):
        raise ValueError("training_type must be supervised or unsupervised")

    aggs = [F.min(order_col).alias("_ord")] if order_col else []
    if label_col:
        aggs.append(F.max(label_col).alias("_span_label"))
    else:
        aggs.append(F.lit(0).alias("_span_label"))
    spans = df.groupBy(span_col).agg(*aggs)
    order = F.col("_ord") if order_col else F.col(span_col)
    r = F.percent_rank().over(Window.orderBy(order, span_col))
    spans = spans.withColumn("_r", r)

    train_cut = 1.0 - test_frac - dev_frac
    dev_cut = 1.0 - test_frac
    split = (
        F.when(F.col("_r") < train_cut, "train")
        .when(F.col("_r") < dev_cut, "dev")
        .otherwise("test")
    )
    spans = spans.withColumn("split", split)
    if training_type == "unsupervised":
        # anomalous spans never train: move them to test (dataset_utils.py:70-85)
        spans = spans.withColumn(
            "split",
            F.when(F.col("_span_label") == 1, "test").otherwise(F.col("split")),
        )
    assignment = spans.select(span_col, "split")
    return df.join(F.broadcast(assignment), span_col, "left")
