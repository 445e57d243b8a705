"""Categorical encoders: label / ordinal / one-hot.

Parity targets (/root/reference/logai/algorithms/categorical_encoding_algo/):
- label_encoding.py:14-37  — per-column LabelEncoder -> ``{col}_categorical``
  (sklearn LabelEncoder sorts classes, so ids are alphabetical)
- ordinal_encoding.py:35-62 — OrdinalEncoder -> ``{col}-categorical``
- one_hot_encoding.py:32-63 — dense OneHotEncoder, columns ``{col}-{i}``

All are joins against tiny distinct-value dimension tables (broadcast) or a
pivot — no fitted Python state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _value_ids(df: DataFrame, col: str) -> DataFrame:
    """Distinct values of ``col`` with alphabetical dense ids (sklearn
    LabelEncoder semantics: classes_ sorted)."""
    w = Window.orderBy(col)
    return df.select(col).distinct().withColumn("_id", F.row_number().over(w) - 1)


def label_encode(df: DataFrame, cols: list[str]) -> DataFrame:
    """Add ``{col}_categorical`` int columns (label_encoding.py:24-37)."""
    out = df
    for c in cols:
        ids = _value_ids(df, c).withColumnRenamed("_id", f"{c}_categorical")
        out = out.join(F.broadcast(ids), c, "left")
    return out


def ordinal_encode(df: DataFrame, cols: list[str]) -> DataFrame:
    """Add ``{col}-categorical`` double columns (ordinal_encoding.py:46-62)."""
    out = df
    for c in cols:
        ids = _value_ids(df, c).withColumn(
            f"{c}-categorical", F.col("_id").cast("double")
        ).drop("_id")
        out = out.join(F.broadcast(ids), c, "left")
    return out


def one_hot_encode(df: DataFrame, cols: list[str]) -> DataFrame:
    """Add dense 0/1 columns ``{col}-{i}`` per distinct value, i in
    alphabetical order (one_hot_encoding.py:44-63).

    A dense one-hot needs the category set in the SCHEMA, so one small
    distinct-values job per column is unavoidable; all indicators for a
    column are then added in a single select (one projection node, not one
    withColumn plan layer per value). Meant for bounded-cardinality dims —
    for unbounded categories use label_encode (id join) instead.
    """
    out = df
    for c in cols:
        values = [r[c] for r in _value_ids(df, c).orderBy("_id").collect()]
        indicators = [
            (F.col(c) == F.lit(v)).cast("int").alias(f"{c}-{i}")
            for i, v in enumerate(values)
        ]
        out = out.select("*", *indicators)
    return out
