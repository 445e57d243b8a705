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


def auc_score(
    df: DataFrame, score_col: str = "score", label_col: str = "label"
) -> DataFrame:
    """ROC-AUC as a one-row DataFrame — the metric the reference's LogBERT
    evaluation reports per instance-score (eval_metric_utils.py:174-231
    computes sklearn roc_auc_score over top6_loss etc.).

    Exact Mann-Whitney formulation with midrank tie handling:
        AUC = sum_s  npos(s) * (cumneg_below(s) + nneg(s)/2) / (NPos*NNeg)
    over DISTINCT score values s. Distributed shape: one groupBy(score)
    hash aggregate compresses the fact table to per-score (npos, nneg)
    counts; the cumulative pass runs over that aggregate — typically
    orders of magnitude smaller than the input (scores here are ranks,
    losses rounded by round4-style operators, or histogram bins). For a
    truly continuous score at web scale, quantile-bin first; the window
    over distinct scores is the only non-partial step.

    Returns columns ``auc, n_pos, n_neg``; AUC is null when either class
    is absent (undefined, mirroring sklearn's ValueError — null instead of
    a throw so it composes in SQL)."""
    from pyspark.sql import Window

    s = F.col(score_col)
    y = F.col(label_col).cast("int")
    per_score = df.groupBy(s.alias("_s")).agg(
        F.sum(y).alias("_pos"), F.sum(1 - y).alias("_neg")
    )
    w = Window.orderBy("_s").rowsBetween(Window.unboundedPreceding, -1)
    contrib = per_score.withColumn(
        "_cumneg", F.coalesce(F.sum("_neg").over(w), F.lit(0))
    ).select(
        (F.col("_pos") * (F.col("_cumneg") + F.col("_neg") / 2.0)).alias("_u"),
        "_pos",
        "_neg",
    )
    agg = contrib.agg(
        F.sum("_u").alias("_usum"),
        F.sum("_pos").alias("n_pos"),
        F.sum("_neg").alias("n_neg"),
    )
    # double denominator: a long*long product overflows (silently, non-ANSI)
    # past ~3e9 rows per class
    denom = F.col("n_pos").cast("double") * F.col("n_neg").cast("double")
    return agg.select(
        F.when(
            (F.col("n_pos") > 0) & (F.col("n_neg") > 0),
            F.col("_usum") / denom,
        ).alias("auc"),
        "n_pos",
        "n_neg",
    )
