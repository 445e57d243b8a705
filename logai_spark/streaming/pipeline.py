"""End-to-end Structured-Streaming pipeline: pages stream -> routed sinks.

Streaming analog of :func:`logai_spark.pipeline.run_pipeline` (the reference
is batch-only — SURVEY.md §2.12; nearest analog is re-running the batch
workflow on file drops). Design, chosen for exactly-once at 10^12-doc scale:

- ONE streaming query with ``foreachBatch``: every micro-batch runs the same
  fused extract+match crossing, broadcast-dim enrichment, and fan-out route
  as the batch pipeline — per-batch work is stateless, so the stream scales
  exactly like the batch job.
- **Idempotent batch commits instead of streaming state.** Each micro-batch
  writes under its own ``batch_id=N`` partition with dynamic partition
  overwrite, so a replayed batch (failure before the checkpoint advanced)
  OVERWRITES its own half-written output instead of appending duplicates;
  a per-batch lineage manifest (written last, after both sinks) marks the
  batch committed and short-circuits fully-committed replays. Output is
  exactly-once without a transactional sink.
- **Associative partial aggregates instead of watermarked state.** The
  windowed counter vectors are summable, so each batch appends its PARTIAL
  per-window counts and :func:`read_streaming_agg` re-sums at read time.
  Late data therefore lands in its true event-time window no matter how
  late it arrives — no watermark, no dropped rows, no unbounded state store
  (the streaming-counters module keeps the watermarked variants for
  latency-bounded consumers).
- Dead-letter routing: lines the broadcast dictionary cannot match land in
  an explicit ``template_id=__dead_letter__`` sink; feed that sink to
  :func:`logai_spark.parse.distributed.update_templates` to evolve the
  dictionary without re-mining the corpus, then restart the stream with the
  updated broadcast.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from logai_spark.operators.enrich import enrich
from logai_spark.operators.features import counter_vector
from logai_spark.pipeline import PipelineConfig, extract_parse, lang_dimension

DEAD_LETTER = "__dead_letter__"
BATCH_MANIFEST_DIR = "stream_manifests"


def _batch_manifest_path(out_dir: str, batch_id: int) -> str:
    return os.path.join(out_dir, BATCH_MANIFEST_DIR, f"batch_{int(batch_id)}.json")


def _batch_fingerprint(batch_df: DataFrame) -> str | None:
    """Content identity of a micro-batch for the replay short-circuit.

    For file sources this is a hash of the batch's input file list, read
    with a zero-data-column job (``input_file_name()`` distinct — the
    DataFrame-level ``inputFiles()`` is empty inside ``foreachBatch``).
    Needed because batch ids alone are not stable across checkpoint loss: a
    restarted stream re-bundles ALL unprocessed files into a fresh batch 0,
    so a committed ``batch_0.json`` from the old lineage must NOT suppress a
    batch 0 that now carries new files. Non-file sources return None (no
    cheap identity; the short-circuit then degrades to batch-id-only, the
    pre-fingerprint behavior)."""
    import hashlib

    try:
        files = sorted(
            r[0]
            for r in batch_df.select(F.input_file_name()).distinct().collect()
            if r[0]
        )
    except Exception:
        files = []
    if not files:
        return None
    return hashlib.md5("\n".join(files).encode()).hexdigest()


def run_streaming_pipeline(
    spark: SparkSession,
    pages_stream: DataFrame,
    out_dir: str,
    templates: list[tuple[str, int]],
    config: PipelineConfig | None = None,
    checkpoint_dir: str | None = None,
    await_termination: bool = True,
):
    """Start (and by default drain, with ``availableNow``) the streaming
    pipeline. ``pages_stream`` is a streaming DataFrame with the pages
    schema (url, warc_ts, html, lang, ...); ``templates`` is the broadcast
    dictionary mined offline (batch sample or a previous run's
    ``update_templates``). Returns the StreamingQuery (already finished when
    ``await_termination``).
    """
    cfg = config or PipelineConfig()
    routed_path = os.path.join(out_dir, "routed")
    agg_path = os.path.join(out_dir, "agg_parts")
    os.makedirs(os.path.join(out_dir, BATCH_MANIFEST_DIR), exist_ok=True)

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        man_path = _batch_manifest_path(out_dir, batch_id)
        fingerprint = _batch_fingerprint(batch_df)
        if os.path.exists(man_path):
            # replay of a fully-committed batch (manifest is written LAST):
            # skip ONLY if the batch carries the same input as the committed
            # one — after checkpoint loss the re-bundled batch 0 may include
            # files the old batch 0 never saw, and skipping would silently
            # drop them. A mismatch falls through to reprocess: dynamic
            # partition overwrite replaces the batch's own partitions and
            # the manifest is rewritten, so the rerun is exactly-once too.
            with open(man_path) as fp:
                committed = json.load(fp)
            if committed.get("input_fingerprint") == fingerprint:
                return
        sess = batch_df.sparkSession
        # dynamic overwrite: only the touched batch_id partitions are
        # replaced, so a replayed half-written batch self-heals. Restored
        # after the batch — leaking 'dynamic' session-wide would change the
        # semantics of every full-path overwrite in the batch pipeline.
        prev_mode = sess.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
        sess.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            _run_batch(sess, batch_df, batch_id, man_path, fingerprint)
        finally:
            sess.conf.set("spark.sql.sources.partitionOverwriteMode", prev_mode)

    def _run_batch(
        sess, batch_df: DataFrame, batch_id: int, man_path: str, fingerprint
    ) -> None:
        parsed = extract_parse(batch_df, templates, cfg.drain)
        lines = (
            enrich(parsed, lang_dimension(sess), "lang", select=["lang_name", "script"])
            .withColumn(
                "template_id",
                F.coalesce(F.col("template_id"), F.lit(DEAD_LETTER)),
            )
            .withColumn("batch_id", F.lit(int(batch_id)))
        )
        from pyspark import StorageLevel

        lines = lines.persist(StorageLevel.MEMORY_AND_DISK)
        (
            lines.repartition(F.col("template_id"))
            .sortWithinPartitions("template_id")
            .write.mode("overwrite")
            .partitionBy("batch_id", "template_id")
            .parquet(routed_path)
        )
        part = counter_vector(
            lines, ["template_id", "lang"], "warc_ts", cfg.window
        ).withColumn("batch_id", F.lit(int(batch_id)))
        part = part.persist(StorageLevel.MEMORY_AND_DISK)
        (
            part.coalesce(1)
            .write.mode("overwrite")
            .partitionBy("batch_id")
            .parquet(agg_path)
        )
        # per-sink counts roll up from the partial aggregate (#sinks rows to
        # the driver, never the full window x template frame)
        per_sink = (
            part.groupBy("template_id").agg(F.sum("counts").alias("n")).collect()
        )
        part.unpersist()
        lines.unpersist()
        manifest = {
            "batch_id": int(batch_id),
            "input_fingerprint": fingerprint,
            "sinks": {str(r["template_id"]): int(r["n"]) for r in per_sink},
        }
        manifest["total_rows"] = int(sum(manifest["sinks"].values()))
        manifest["n_sinks"] = len(manifest["sinks"])
        # the commit record: written only after BOTH sinks landed
        with open(man_path, "w") as fp:
            json.dump(manifest, fp, indent=1, sort_keys=True)

    writer = (
        pages_stream.writeStream.foreachBatch(_process)
        .outputMode("update")
        .trigger(availableNow=True)
    )
    if checkpoint_dir is not None:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    query = writer.start()
    if await_termination:
        query.awaitTermination()
    return query


def read_streaming_routed(spark: SparkSession, out_dir: str) -> DataFrame:
    """The routed line table across all committed batches (batch_id is
    lineage metadata, still a partition column for per-batch audits)."""
    return spark.read.parquet(os.path.join(out_dir, "routed"))


def read_streaming_agg(spark: SparkSession, out_dir: str) -> DataFrame:
    """Final windowed aggregate = sum of the per-batch partials (counts are
    associative, so this equals the batch pipeline's counter_vector over the
    union of all batches — late rows included, nothing dropped)."""
    parts = spark.read.parquet(os.path.join(out_dir, "agg_parts"))
    return parts.groupBy("template_id", "lang", "timestamp").agg(
        F.sum("counts").alias("counts")
    )


def streaming_manifest_totals(out_dir: str) -> dict:
    """Roll the per-batch commit manifests into pipeline-level lineage:
    per-sink totals + committed batch ids (what the batch pipeline's single
    manifest records, accumulated across the stream's life)."""
    man_dir = os.path.join(out_dir, BATCH_MANIFEST_DIR)
    sinks: dict[str, int] = {}
    batches: list[int] = []
    for name in sorted(os.listdir(man_dir)):
        if not name.startswith("batch_"):
            continue
        with open(os.path.join(man_dir, name)) as fp:
            m = json.load(fp)
        batches.append(m["batch_id"])
        for k, n in m["sinks"].items():
            sinks[k] = sinks.get(k, 0) + int(n)
    return {
        "batches": sorted(batches),
        "sinks": sinks,
        "total_rows": int(sum(sinks.values())),
        "n_sinks": len(sinks),
    }
