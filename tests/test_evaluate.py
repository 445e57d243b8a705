"""Evaluation metrics: binary PRF aggregate + rank-based ROC-AUC."""

import math

import pandas as pd

from logai_spark.operators.evaluate import auc_score, binary_metrics


def test_binary_metrics_known_counts(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"pred": [1, 1, 0, 0, 1], "label": [1, 0, 1, 0, 1]})
    )
    m = binary_metrics(df).collect()[0]
    assert (m["tp"], m["fp"], m["fn"], m["tn"]) == (2, 1, 1, 1)
    assert math.isclose(m["precision"], 2 / 3)
    assert math.isclose(m["recall"], 2 / 3)


def test_auc_perfect_and_inverted(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"score": [0.9, 0.8, 0.2, 0.1], "label": [1, 1, 0, 0]})
    )
    assert auc_score(df).collect()[0]["auc"] == 1.0
    inv = spark.createDataFrame(
        pd.DataFrame({"score": [0.9, 0.8, 0.2, 0.1], "label": [0, 0, 1, 1]})
    )
    assert auc_score(inv).collect()[0]["auc"] == 0.0


def test_auc_with_ties_midrank(spark):
    # scores: pos at {0.5, 0.9}, neg at {0.5, 0.1}: pairs
    # (0.5p vs 0.5n)=0.5, (0.5p vs 0.1)=1, (0.9 vs 0.5)=1, (0.9 vs 0.1)=1
    # AUC = 3.5/4
    df = spark.createDataFrame(
        pd.DataFrame({"score": [0.5, 0.9, 0.5, 0.1], "label": [1, 1, 0, 0]})
    )
    assert math.isclose(auc_score(df).collect()[0]["auc"], 3.5 / 4)


def test_auc_single_class_is_null(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"score": [0.5, 0.9], "label": [1, 1]})
    )
    r = auc_score(df).collect()[0]
    assert r["auc"] is None and r["n_neg"] == 0
