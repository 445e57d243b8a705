"""Fan-out routing to per-template sinks + lineage manifest + skew salting.

north_rule requirements this module carries:
- fan-out routing (reference has none; nearest analog is group-by-template,
  auto_log_summarization.py:47-50): ``write.partitionBy(template_id)`` into a
  partitioned parquet layout (Iceberg-shaped; the catalog jar is not in the
  sandbox image so parquet + manifest is the documented fallback,
  SURVEY.md §7.3),
- per-partition lineage + metrics manifest so a re-run can skip completed
  stages (idempotent resume; reference analog is per-stage CSV checkpointing,
  openset_anomaly_detection_workflow.py:260-274),
- salted repartition for hot keys (template skew), on top of AQE skew-join.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MANIFEST = "_lineage_manifest.json"


def salted_repartition(df: DataFrame, key: str, salt_buckets: int = 8) -> DataFrame:
    """Repartition on (key, salt) so one hot key spreads over ``salt_buckets``
    output tasks instead of serializing into one writer."""
    salted = df.withColumn(
        "_salt", F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(salt_buckets))
    )
    return salted.repartition(key, "_salt").drop("_salt")


def route_to_sinks(
    df: DataFrame,
    path: str,
    partition_col: str = "template_id",
    mode: str = "overwrite",
    salt_buckets: int = 8,
    stage: str = "route",
    extra_meta: dict | None = None,
) -> dict:
    """Write the routed table partitioned by ``partition_col``; return (and
    persist) the manifest: per-sink row counts + stage metrics.

    The per-sink counts come from one aggregate over the same frame — they are
    the 'aggregate counts per sink' the north_rule checks against the
    reference, and they double as resume lineage (a later run with an
    identical manifest can skip the stage).
    """
    t0 = time.time()
    (
        salted_repartition(df, partition_col, salt_buckets)
        .write.mode(mode)
        .partitionBy(partition_col)
        .parquet(path)
    )
    counts = {
        str(r[partition_col]): r["n"]
        for r in df.groupBy(partition_col).agg(F.count(F.lit(1)).alias("n")).collect()
    }
    manifest = {
        "stage": stage,
        "path": path,
        "partition_col": partition_col,
        "sinks": counts,
        "total_rows": int(sum(counts.values())),
        "n_sinks": len(counts),
        "wall_sec": round(time.time() - t0, 3),
        **(extra_meta or {}),
    }
    with open(os.path.join(path, MANIFEST), "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    return manifest


def manifest_of(path: str) -> dict | None:
    p = os.path.join(path, MANIFEST)
    if os.path.exists(p):
        with open(p) as f:
            return json.load(f)
    return None


def read_sink(spark: SparkSession, path: str, template_id: str | None = None) -> DataFrame:
    """Read the routed table back; a template_id filter becomes partition
    pruning (only that sink's files are scanned)."""
    df = spark.read.parquet(path)
    if template_id is not None:
        df = df.filter(F.col("template_id") == template_id)
    return df


def checkpoint(
    df: DataFrame, path: str, stage: str, resume: bool = True
) -> DataFrame:
    """Stage checkpoint: write parquet + manifest unless a completed manifest
    already exists, then read back (cuts lineage, enables mid-DAG resume).
    Spark analog of the reference's write-CSV-then-reload-if-present stages
    (openset_anomaly_detection_workflow.py:260-321)."""
    spark = df.sparkSession
    m = manifest_of(path)
    if resume and m is not None and m.get("stage") == stage:
        return spark.read.parquet(path)
    t0 = time.time()
    df.write.mode("overwrite").parquet(path)
    out = spark.read.parquet(path)
    manifest = {
        "stage": stage,
        "path": path,
        "total_rows": out.count(),
        "wall_sec": round(time.time() - t0, 3),
    }
    with open(os.path.join(path, MANIFEST), "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    return out
