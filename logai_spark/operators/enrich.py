"""Lookup enrichment via broadcast hash joins on small dimension tables.

Pattern from the reference's HDFS label join (set-membership lookup,
/root/reference/logai/preprocess/hdfs_preprocessor.py:25-39) generalized per
BASELINE.json north_star: lang / geo / severity dimension tables joined onto
the fact stream. Dimensions are small by definition -> always broadcast; the
fact side never shuffles for these joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def enrich(
    fact: DataFrame,
    dim: DataFrame,
    on: str | list[str],
    how: str = "left",
    select: list[str] | None = None,
) -> DataFrame:
    """Broadcast-join ``dim`` onto ``fact``.

    ``select`` optionally projects the dim columns to carry (early pruning —
    Catalyst would do it too once a downstream select exists, but being
    explicit keeps the broadcast payload minimal).
    """
    keys = [on] if isinstance(on, str) else list(on)
    if select is not None:
        dim = dim.select(*keys, *select)
    return fact.join(F.broadcast(dim), keys, how)


def label_spans(
    fact: DataFrame,
    labels: DataFrame,
    span_col: str = "span_id",
    label_key: str = "span_id",
    label_val: str = "label",
    anomaly_value: str = "Anomaly",
    out_col: str = "labels",
) -> DataFrame:
    """HDFS-style anomaly labeling: span is anomalous iff its id is in the
    anomaly label table (hdfs_preprocessor.py:31-39). Broadcast left join +
    boolean cast; missing spans are normal (0)."""
    lab = labels.select(
        F.col(label_key).alias(span_col),
        (F.col(label_val) == anomaly_value).cast("int").alias(out_col),
    )
    joined = fact.join(F.broadcast(lab), span_col, "left")
    return joined.withColumn(out_col, F.coalesce(F.col(out_col), F.lit(0)))
