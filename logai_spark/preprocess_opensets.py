"""Dataset-specific preprocessors: HDFS / BGL session + label derivation.

Parity targets:
- BGL (/root/reference/logai/preprocess/bgl_preprocessor.py:23-41):
  session id = floor((Id_seconds - first)/60); label = int(Label != "-")
- HDFS (hdfs_preprocessor.py:25-39): span = block ids extracted from the
  content; anomaly label via membership in the anomaly-block table
  (broadcast join here, not a python set)
- Thunderbird (thunderbird_preprocessor.py): label = int(Label != "-") —
  same shape as BGL.

All pure column expressions + one broadcast join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from logai_spark.operators.enrich import label_spans

BLOCK_ID_PATTERN = r"(blk_-?\d+)"


def bgl_preprocess(
    df: DataFrame,
    id_col: str = "Id",
    label_col: str = "Label",
    bucket_seconds: int = 60,
) -> DataFrame:
    """Add span_id (time-bucket session) and labels (bgl_preprocessor.py:23-41)."""
    t0 = df.agg(F.min(F.col(id_col).cast("long"))).first()[0]
    return df.withColumn(
        "span_id",
        F.floor((F.col(id_col).cast("long") - F.lit(t0)) / bucket_seconds).cast("string"),
    ).withColumn("labels", (F.col(label_col) != "-").cast("int"))


def hdfs_preprocess(
    df: DataFrame,
    labels: DataFrame | None = None,
    content_col: str = "logline",
) -> DataFrame:
    """Extract the block id as span_id; label spans via broadcast join against
    the anomaly-block table (hdfs_preprocessor.py:25-39).

    The reference concatenates ALL distinct block ids of a line into one
    key; >1 block id per line is rare — we take the first (and keep the full
    array for callers that need it)."""
    sql_pattern = BLOCK_ID_PATTERN.replace("\\", "\\\\")  # SQL literal escaping
    out = df.withColumn(
        "block_ids", F.expr(f"regexp_extract_all({content_col}, '{sql_pattern}', 1)")
    ).withColumn("span_id", F.get(F.col("block_ids"), 0))
    if labels is not None:
        out = label_spans(out, labels, "span_id", "BlockId", "Label")
    return out


def thunderbird_preprocess(df: DataFrame, label_col: str = "labels") -> DataFrame:
    """Thunderbird labels: int(raw alert tag != "-")
    (thunderbird_preprocessor.py:30-36); span_id passes through unchanged —
    the reference's _get_ids returns the configured span dimension (the
    node name ``Admin`` in sources/openset_configs/thunderbird.json, the
    grouping deep-loglizer uses for this dataset)."""
    return df.withColumn(label_col, (F.col(label_col) != "-").cast("int"))
