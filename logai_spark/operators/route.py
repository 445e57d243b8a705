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
LINEAGE_DIR = "_lineage_files"  # parquet sidecar: per-FILE lineage rows


def file_lineage(spark: SparkSession, path: str) -> DataFrame:
    """The per-file lineage sidecar of a routed/checkpointed layout as a
    DataFrame (one row per written data file with its row count, plus the
    sink key for partitioned layouts). Lives at ``path/_lineage_files`` —
    an underscore-prefixed dir, so data readers ignore it. Kept OUT of the
    driver JSON manifest on purpose: at 10^12 docs the manifest would
    otherwise carry millions of per-file keys; the JSON holds per-sink
    totals only, the sidecar scales with the table like any other table."""
    return spark.read.parquet(os.path.join(path, LINEAGE_DIR))


def footer_lineage_scan(
    spark: SparkSession,
    path: str,
    partition_col: str | None = None,
    driver_threshold: int = 4096,
) -> DataFrame:
    """Per-file row counts from parquet FOOTER metadata, distributed:
    list the layout's data files (the same driver-side listing every scan's
    planning performs), fan the paths out to executors, and read each
    footer's ``num_rows`` with pyarrow. No row-group data is ever read, so
    the cost scales with FILE COUNT, not table bytes — unlike an
    empty-schema ``spark.read.parquet(path).groupBy(input_file_name())``
    scan, which still iterates every row as an empty InternalRow (measured
    ~3 s of fixed wall per pipeline run at 6.45M rows; footers take
    milliseconds per file). Trust base is unchanged: parquet ``count(*)``
    answers from the same footer row counts, and a truncated file fails
    the footer read loudly.

    Returns ([partition_col,] file, n_rows); the sink key is decoded from
    the ``partition_col=value`` path segment (hive layout), percent-escapes
    unquoted exactly as Spark's partition reader does. Local/posix paths
    here; on an object store pyarrow opens s3://... URIs natively — only
    the file:// prefix needs stripping.

    Small layouts (<= ``driver_threshold`` files) read their footers on the
    DRIVER in a plain loop: at ~1 ms per footer that beats spinning up
    Arrow python workers and a Spark job by seconds, the same
    small-side-goes-local reasoning as a broadcast join. Big layouts fan
    out with mapInPandas so lineage cost stays file-count-proportional and
    never concentrates on the driver."""
    files = sorted(spark.read.parquet(path).inputFiles())
    pcol = partition_col
    schema = (f"`{pcol}` string, " if pcol else "") + "file string, n_rows long"

    def _footer_row(uri: str) -> tuple:
        import re as _re
        from urllib.parse import unquote

        import pyarrow.parquet as _pq

        local = _re.sub(r"^file:(//)?", "", uri)
        rec: list = [uri.rsplit("/", 1)[-1], _pq.read_metadata(local).num_rows]
        if pcol is not None:
            m = _re.search(_re.escape(pcol) + r"=([^/]+)/", uri)
            rec.insert(0, unquote(m.group(1)) if m else None)
        return tuple(rec)

    if len(files) <= driver_threshold:
        return spark.createDataFrame([_footer_row(u) for u in files], schema)

    par = max(1, min(len(files), spark.sparkContext.defaultParallelism))
    paths_df = spark.createDataFrame(
        [(p,) for p in files], "path string"
    ).repartition(par)

    def _read_footers(batches):
        import pandas as _pd

        cols = ([pcol] if pcol else []) + ["file", "n_rows"]
        for pdf in batches:
            rows = [_footer_row(uri) for uri in pdf["path"]]
            yield _pd.DataFrame(rows, columns=cols)

    return paths_df.mapInPandas(_read_footers, schema=schema)


def salted_repartition(df: DataFrame, key: str, salt_buckets: int = 8) -> DataFrame:
    """Repartition on (key, salt) so one hot key spreads over ``salt_buckets``
    output tasks instead of serializing into one writer.

    The salt is a hash of the FULL ROW CONTENT — a deterministic expression,
    so a retried task recomputes the same partitioning (salting with
    monotonically_increasing_id would let rows migrate between partitions
    across task attempts, the classic repartition-retry correctness hazard).
    Exact duplicate rows share a salt; if the hot key's rows are literal
    duplicates, dedup-with-counts first.
    """
    salted = df.withColumn(
        "_salt",
        F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(salt_buckets)),
    )
    return salted.repartition(key, "_salt").drop("_salt")


def hot_key_buckets(
    sizes: dict[str, int], parallelism: int = 32, skew_factor: float = 2.0
) -> dict[str, int]:
    """Decide per-key salt-bucket counts from known key sizes.

    Keys holding more than ``skew_factor``x the mean per-task share get split
    into ceil(share/mean) buckets (capped at parallelism); everything else
    stays unsalted (1 bucket) so non-skewed sinks write exactly one file.
    The template sizes from the mining pass make this free for routing.
    """
    total = sum(sizes.values()) or 1
    mean_share = total / max(parallelism, 1)
    out = {}
    for key, n in sizes.items():
        if n > skew_factor * mean_share:
            out[key] = min(int(n / mean_share) + 1, parallelism)
    return out


def skew_aware_repartition(
    df: DataFrame, key: str, hot_buckets: dict[str, int] | None
) -> DataFrame:
    """Repartition on (key, salt) where only known-hot keys get salt > 0.

    Non-hot keys keep salt 0 -> all rows of a sink land in one task (one
    output file); hot keys spread over their bucket count.
    """
    if not hot_buckets:
        return df.repartition(F.col(key))
    pairs = []
    for k, n in hot_buckets.items():
        pairs.extend([F.lit(k), F.lit(n)])
    buckets = F.coalesce(
        F.create_map(*pairs)[F.col(key)], F.lit(1)
    )
    # deterministic salt: input-partition id, folded into the key's bucket
    # count. Each (input partition, hot key) pair lands on one reducer; a hot
    # key spreads over min(#input partitions, buckets) writers.
    salted = df.withColumn(
        "_salt", F.pmod(F.xxhash64(F.spark_partition_id()), buckets)
    )
    return salted.repartition(F.col(key), F.col("_salt")).drop("_salt")


def route_to_sinks(
    df: DataFrame,
    path: str,
    partition_col: str = "template_id",
    mode: str = "overwrite",
    hot_buckets: dict[str, int] | None = None,
    stage: str = "route",
    extra_meta: dict | None = None,
    compute_counts: bool = True,
) -> dict:
    """Write the routed table partitioned by ``partition_col``; return (and
    persist) the manifest: per-sink row counts + stage metrics.

    ``hot_buckets`` (from :func:`hot_key_buckets`) salts only known-skewed
    keys so cold sinks get exactly one file while hot sinks parallelize.
    The per-sink counts are the 'aggregate counts per sink' the north_rule
    checks against the reference, and they double as resume lineage.
    """
    t0 = time.time()
    (
        skew_aware_repartition(df, partition_col, hot_buckets)
        # sort within each task so the partitionBy writer keeps ONE open file
        # at a time per task instead of one per (task x key) — fewer, bigger
        # files and far less writer-open overhead
        .sortWithinPartitions(partition_col)
        .write.mode(mode)
        .partitionBy(partition_col)
        .parquet(path)
    )
    manifest = {
        "stage": stage,
        "path": path,
        "partition_col": partition_col,
        "wall_sec": round(time.time() - t0, 3),
        **(extra_meta or {}),
    }
    if compute_counts:
        # derive per-sink counts from the WRITTEN data's parquet footers
        # (footer_lineage_scan — file-count-proportional, no row scan):
        # avoids recomputing the upstream plan and verifies what landed.
        # Callers that aggregate the routed table anyway should pass
        # compute_counts=False and fill the manifest via write_manifest with
        # counts rolled up from their aggregate.
        spark = df.sparkSession
        # per-FILE counts (file == writer task -> per-partition lineage)
        # land in the parquet sidecar WITHOUT ever touching the driver;
        # per-sink totals (the north_rule's per-sink aggregate equality,
        # O(#templates)) are the only rows collected into the JSON manifest.
        (
            footer_lineage_scan(spark, path, partition_col)
            .write.mode("overwrite")
            .parquet(os.path.join(path, LINEAGE_DIR))
        )
        counts = {
            str(r[partition_col]): int(r["n"])
            for r in file_lineage(spark, path)
            .groupBy(partition_col)
            .agg(F.sum("n_rows").alias("n"))
            .collect()
        }
        manifest["sinks"] = counts
        manifest["total_rows"] = int(sum(counts.values()))
        manifest["n_sinks"] = len(counts)
    write_manifest(path, manifest)
    return manifest


def write_manifest(path: str, manifest: dict) -> None:
    with open(os.path.join(path, MANIFEST), "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)


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
    (openset_anomaly_detection_workflow.py:260-321).

    PER-PARTITION lineage (north_rule): one row per written file (file ==
    writer task/partition) with its row count, written to the
    ``_lineage_files`` parquet sidecar (see :func:`file_lineage`) so a
    resume can verify the checkpoint is complete and an auditor can trace
    every output row to the task that wrote it; the JSON manifest keeps the
    scalar totals, staying bounded at any file count. The per-file counts
    come from one footer-cheap scan of the freshly written columnar files.
    """
    spark = df.sparkSession
    m = manifest_of(path)
    if resume and m is not None and m.get("stage") == stage:
        return spark.read.parquet(path)
    t0 = time.time()
    df.write.mode("overwrite").parquet(path)
    out = spark.read.parquet(path)
    # per-file lineage goes to the parquet sidecar (no driver collect —
    # bounded manifest at any file count); the JSON keeps the two scalars a
    # resume check needs. Footer metadata only — no row scan.
    (
        footer_lineage_scan(spark, path)
        .write.mode("overwrite")
        .parquet(os.path.join(path, LINEAGE_DIR))
    )
    total_rows, n_files = file_lineage(spark, path).agg(
        F.sum("n_rows"), F.count(F.lit(1))
    ).collect()[0]
    manifest = {
        "stage": stage,
        "path": path,
        "total_rows": int(total_rows or 0),
        "n_partitions": int(n_files),
        "wall_sec": round(time.time() - t0, 3),
    }
    with open(os.path.join(path, MANIFEST), "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    return out


def sink_file_stats(path: str, partition_col: str = "template_id") -> dict[str, dict]:
    """Per-sink file count + byte size from the filesystem layout.

    Driver-side listing is fine here: one entry per FILE of one table — at
    real deployments this is the table-format metadata (Iceberg manifest
    files) rather than an object-store LIST, and the result is O(#files),
    the same thing a compaction planner must hold anyway."""
    import urllib.parse

    stats: dict[str, dict] = {}
    prefix = f"{partition_col}="
    for entry in sorted(os.listdir(path)):
        if not entry.startswith(prefix):
            continue
        value = urllib.parse.unquote(entry[len(prefix):])
        files = [
            f
            for f in os.listdir(os.path.join(path, entry))
            if f.endswith(".parquet")
        ]
        stats[value] = {
            "dir": entry,
            "n_files": len(files),
            "bytes": sum(
                os.path.getsize(os.path.join(path, entry, f)) for f in files
            ),
        }
    return stats


def compact_sinks(
    spark: SparkSession,
    path: str,
    partition_col: str = "template_id",
    target_bytes: int = 128 * 1024 * 1024,
    min_files_to_compact: int = 2,
) -> dict:
    """Compact small files inside a routed sink layout (the maintenance op a
    long-lived incremental/streaming fan-out needs: every micro-batch and
    every writer task adds a file per touched sink, and parquet scan cost is
    dominated by file count once files are small). Iceberg analog:
    ``rewrite_data_files``; the reference has no sink layout at all.

    Plan (scale shapes):
    - pick sinks where n_files > max(min_files_to_compact - 1,
      ceil(bytes/target_bytes)) from :func:`sink_file_stats`;
    - ONE pruned scan of just those sinks (partition pruning via an isin
      filter on ``partition_col``);
    - per-sink output file count enforced by a broadcast (key -> n_buckets)
      join + deterministic row-hash bucket, then ``repartition(key,
      bucket)`` — same shape as :func:`skew_aware_repartition`, but joined
      (not a literal map) so ANY number of sinks compacts in one job;
    - rewritten under ``path/_compact_tmp`` then swapped directory-by-
      directory (idempotent: a crash mid-swap leaves each sink either old
      or new, both complete; re-running converges);
    - per-sink row counts re-verified against the manifest BEFORE the swap
      — a compaction that would change row counts fails loudly; the verify
      pass is ONE scan of the rewritten tmp output that also yields the
      refreshed per-file lineage (total data read: old files once for the
      rewrite, new files once for the gate);
    - manifest per-file lineage refreshed for the rewritten sinks.

    Returns {"compacted": {key: {files_before, files_after, rows}},
    "skipped": n}.
    """
    import math
    import shutil

    # recover from a crash inside a previous swap window: the two renames
    # (live -> ._pre_compact, tmp -> live) are not jointly atomic without a
    # table-format catalog (Iceberg snapshot commit); if the crash landed
    # between them the live dir is missing and the backup holds the data —
    # restore it, then replan. A backup WITH a live dir present means the
    # crash was after the second rename: the new data is live, drop the
    # backup.
    for entry in os.listdir(path):
        if entry.endswith("._pre_compact"):
            live = os.path.join(path, entry[: -len("._pre_compact")])
            backup = os.path.join(path, entry)
            if os.path.exists(live):
                shutil.rmtree(backup)
            else:
                os.rename(backup, live)
    # stale lineage staging from a crash before its swap window
    shutil.rmtree(os.path.join(path, LINEAGE_DIR + ".new"), ignore_errors=True)

    stats = sink_file_stats(path, partition_col)
    plan: dict[str, int] = {}
    for key, st in stats.items():
        needed = max(1, math.ceil(st["bytes"] / target_bytes))
        if st["n_files"] >= max(min_files_to_compact, needed + 1):
            plan[key] = needed
    if not plan:
        return {"compacted": {}, "skipped": len(stats)}

    tmp = os.path.join(path, "_compact_tmp")
    shutil.rmtree(tmp, ignore_errors=True)  # leftover from a crashed run

    targets = spark.createDataFrame(
        [(k, n) for k, n in sorted(plan.items())], [partition_col, "_n_buckets"]
    )
    src = spark.read.parquet(path).filter(
        F.col(partition_col).cast("string").isin(list(plan))
    )
    data_cols = [c for c in src.columns if c != partition_col]
    bucketed = (
        src.join(F.broadcast(targets), partition_col)
        .withColumn(
            "_bucket",
            F.pmod(F.xxhash64(*[F.col(c) for c in data_cols]), F.col("_n_buckets")),
        )
        .repartition(F.col(partition_col), F.col("_bucket"))
        .sortWithinPartitions(partition_col)
        .drop("_n_buckets", "_bucket")
    )
    # target size is enforced by maxRecordsPerFile (deterministic splitting
    # inside each writer task, AQE-coalesce-proof); the bucket repartition
    # above only provides write parallelism for big sinks. records/file is
    # derived from the sinks' own measured on-disk bytes per row — taken from
    # the manifest counts when present so the estimate costs zero scans; a
    # manifest-less layout pays one pre-count of the planned sinks.
    manifest = manifest_of(path)
    old_counts = (manifest or {}).get("sinks", {})
    plan_bytes = sum(stats[k]["bytes"] for k in plan)
    if all(k in old_counts for k in plan):
        plan_rows = sum(int(old_counts[k]) for k in plan)
    else:
        plan_rows = sum(
            int(r["n"])
            for r in src.groupBy(partition_col)
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        )
    rows_per_file = max(1, int(target_bytes / max(plan_bytes / max(plan_rows, 1), 1)))
    (
        bucketed.write.mode("overwrite")
        .option("maxRecordsPerFile", rows_per_file)
        .partitionBy(partition_col)
        .parquet(tmp)
    )

    # verify BEFORE swapping: per-sink rows in tmp == per-sink rows on disk.
    # One footer-metadata pass over tmp yields both the per-sink totals for
    # the gate (the only rows collected — O(#sinks)) and the per-file
    # lineage, which goes to a staging parquet sidecar (same file basenames
    # post-swap — only the directories rename), never to the driver.
    tmp_lineage_path = os.path.join(path, "_compact_tmp_lineage")
    shutil.rmtree(tmp_lineage_path, ignore_errors=True)
    (
        footer_lineage_scan(spark, tmp, partition_col)
        .write.mode("overwrite")
        .parquet(tmp_lineage_path)
    )
    new_lineage = spark.read.parquet(tmp_lineage_path)
    new_counts = {
        str(r[partition_col]): int(r["n"])
        for r in new_lineage.groupBy(partition_col)
        .agg(F.sum("n_rows").alias("n"))
        .collect()
    }
    for key in plan:
        before = old_counts.get(key)
        if before is not None and int(before) != new_counts.get(key, -1):
            shutil.rmtree(tmp, ignore_errors=True)
            shutil.rmtree(tmp_lineage_path, ignore_errors=True)
            raise RuntimeError(
                f"compaction would change sink {key!r} rows "
                f"{before} -> {new_counts.get(key)}; aborting before swap"
            )

    result: dict[str, dict] = {}
    for key, st in ((k, stats[k]) for k in plan):
        src_dir = os.path.join(tmp, st["dir"])
        dst_dir = os.path.join(path, st["dir"])
        old_dir = dst_dir + "._pre_compact"
        os.rename(dst_dir, old_dir)
        os.rename(src_dir, dst_dir)
        shutil.rmtree(old_dir)
        result[key] = {
            "files_before": st["n_files"],
            "files_after": len(
                [f for f in os.listdir(dst_dir) if f.endswith(".parquet")]
            ),
            "rows": new_counts.get(key, 0),
        }
    shutil.rmtree(tmp, ignore_errors=True)

    # refresh the per-file lineage sidecar for the rewritten sinks: keep
    # the untouched sinks' rows, splice in the pre-swap tmp lineage (file
    # basenames survive the directory rename). Written to a staging dir
    # then swapped — overwriting a parquet dir that is also a read source
    # of the same plan is undefined.
    lineage_path = os.path.join(path, LINEAGE_DIR)
    if os.path.exists(lineage_path):
        merged = (
            file_lineage(spark, path)
            .filter(~F.col(partition_col).isin(list(plan)))
            .unionByName(new_lineage)
        )
        staging = lineage_path + ".new"
        merged.write.mode("overwrite").parquet(staging)
        # same two-rename swap as the data dirs (never rmtree-then-rename:
        # a crash between those would lose the whole sidecar with no
        # recovery hook). A crash inside THIS window leaves a
        # ``_lineage_files._pre_compact`` entry that the recovery preamble
        # at the top of this function restores on the next run.
        backup = lineage_path + "._pre_compact"
        shutil.rmtree(backup, ignore_errors=True)
        os.rename(lineage_path, backup)
        os.rename(staging, lineage_path)
        shutil.rmtree(backup)
    shutil.rmtree(tmp_lineage_path, ignore_errors=True)
    if manifest is not None:
        manifest["compactions"] = manifest.get("compactions", 0) + 1
        write_manifest(path, manifest)
    return {"compacted": result, "skipped": len(stats) - len(plan)}
