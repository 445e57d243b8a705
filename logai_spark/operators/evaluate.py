"""Evaluation metrics for anomaly-detection workflows.

Parity target: /root/reference/logai/utils/evaluate.py:12-27 — get_accuracy_
precision_recall computes (accuracy, precision, recall) from binary label and
prediction series via sklearn metrics. Re-expressed as ONE Spark aggregate
(TP/FP/FN/TN partial sums), so it runs map-side over any table size; F1 is
added because every AD paper reports it.

Division-by-zero semantics match sklearn's zero_division=0 default: an empty
denominator yields 0.0, not null.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _safe_div(num: Column, den: Column) -> Column:
    return F.when(den > 0, num / den).otherwise(F.lit(0.0))


def binary_metrics(
    df: DataFrame, pred_col: str = "pred", label_col: str = "label"
) -> DataFrame:
    """One-row DataFrame: tp, fp, fn, tn, accuracy, precision, recall, f1.

    ``pred_col``/``label_col`` must be 0/1-valued (any numeric or boolean
    type; cast internally). All eight outputs derive from one hash-free
    aggregate — partial-aggregatable, no shuffle wider than 4 longs.
    """
    p = F.col(pred_col).cast("int")
    y = F.col(label_col).cast("int")
    agg = df.agg(
        F.sum(p * y).alias("tp"),
        F.sum(p * (1 - y)).alias("fp"),
        F.sum((1 - p) * y).alias("fn"),
        F.sum((1 - p) * (1 - y)).alias("tn"),
    )
    tp, fp, fn, tn = F.col("tp"), F.col("fp"), F.col("fn"), F.col("tn")
    prec = _safe_div(tp, tp + fp)
    rec = _safe_div(tp, tp + fn)
    return agg.select(
        "tp",
        "fp",
        "fn",
        "tn",
        _safe_div(tp + tn, tp + fp + fn + tn).alias("accuracy"),
        prec.alias("precision"),
        rec.alias("recall"),
        _safe_div(2 * prec * rec, prec + rec).alias("f1"),
    )
