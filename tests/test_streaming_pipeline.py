"""End-to-end streaming pipeline: routed-row + aggregate equality vs the
batch pipeline, exactly-once on replay, manifest lineage."""

import os
import shutil

import pytest
from pyspark.sql import functions as F

from logai_spark.operators.features import counter_vector
from logai_spark.parse.distributed import mine_templates
from logai_spark.pipeline import extract_parse, pages_to_lines
from logai_spark.sources.webpages import synth_webpages
from logai_spark.streaming.pipeline import (
    DEAD_LETTER,
    _batch_manifest_path,
    read_streaming_agg,
    read_streaming_routed,
    run_streaming_pipeline,
    streaming_manifest_totals,
)


@pytest.fixture(scope="module")
def pages_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("pages_src"))
    # two single-part files -> exactly two micro-batches under
    # maxFilesPerTrigger=1 (and a stable file order: a before b by mtime)
    pages = synth_webpages(spark, 120)
    first = pages.filter(F.pmod(F.xxhash64("url"), F.lit(2)) == 0)
    first.coalesce(1).write.parquet(os.path.join(d, "a.parquet"))
    pages.join(first.select("url"), "url", "left_anti").coalesce(1).write.parquet(
        os.path.join(d, "b.parquet")
    )
    return d


def _stream(spark, pages_dir):
    schema = spark.read.parquet(os.path.join(pages_dir, "a.parquet")).schema
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(pages_dir, "*.parquet"))
    )


def test_streaming_pipeline_matches_batch(spark, pages_dir, tmp_path):
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    pages = synth_webpages(spark, 120)
    templates = mine_templates(pages_to_lines(pages))
    run_streaming_pipeline(
        spark, _stream(spark, pages_dir), out, templates, checkpoint_dir=ckpt
    )

    # routed-row equality vs the batch fused extract+match on the same pages
    routed = read_streaming_routed(spark, out).select(
        "url",
        "seq",
        F.when(F.col("template_id") == DEAD_LETTER, F.lit(None))
        .otherwise(F.col("template_id"))
        .alias("template_id"),
    )
    expected = extract_parse(pages, templates).select("url", "seq", "template_id")
    assert routed.exceptAll(expected).count() == 0
    assert expected.exceptAll(routed).count() == 0

    # aggregate equality: summed partials == batch counter_vector
    agg = read_streaming_agg(spark, out)
    exp_agg = counter_vector(
        extract_parse(pages, templates)
        .withColumn(
            "template_id", F.coalesce(F.col("template_id"), F.lit(DEAD_LETTER))
        ),
        ["template_id", "lang"],
        "warc_ts",
        "1 hour",
    )
    assert agg.exceptAll(exp_agg).count() == 0
    assert exp_agg.exceptAll(agg).count() == 0

    # lineage rollup agrees with the data
    totals = streaming_manifest_totals(out)
    assert totals["total_rows"] == read_streaming_routed(spark, out).count()
    assert len(totals["batches"]) == 2  # one per source file


def test_streaming_pipeline_exactly_once_on_replay(spark, pages_dir, tmp_path):
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    pages = synth_webpages(spark, 120)
    templates = mine_templates(pages_to_lines(pages))
    stream = _stream(spark, pages_dir)
    run_streaming_pipeline(spark, stream, out, templates, checkpoint_dir=ckpt)
    n1 = read_streaming_routed(spark, out).count()

    # restart with the SAME checkpoint: no new files -> no new batches
    run_streaming_pipeline(spark, stream, out, templates, checkpoint_dir=ckpt)
    assert read_streaming_routed(spark, out).count() == n1

    # full replay (checkpoint lost): committed-batch manifests short-circuit,
    # dynamic batch_id overwrite self-heals — still no duplicates
    shutil.rmtree(ckpt)
    run_streaming_pipeline(
        spark, stream, out, templates, checkpoint_dir=str(tmp_path / "ckpt2")
    )
    assert read_streaming_routed(spark, out).count() == n1

    # half-committed batch: manifest missing -> the batch REruns and
    # overwrites its own partition (no dup, content restored)
    os.remove(_batch_manifest_path(out, 0))
    run_streaming_pipeline(
        spark, stream, out, templates, checkpoint_dir=str(tmp_path / "ckpt3")
    )
    assert read_streaming_routed(spark, out).count() == n1
    assert os.path.exists(_batch_manifest_path(out, 0))


def test_streaming_pipeline_checkpoint_loss_with_new_file(spark, pages_dir, tmp_path):
    """Checkpoint loss + a NEW source file: the restarted stream re-bundles
    everything into a fresh batch 0, whose id collides with the committed
    batch_0 manifest. The input fingerprint must force a reprocess (NOT a
    skip) so the new file's rows are not silently dropped."""
    src = str(tmp_path / "src")
    os.makedirs(src)
    shutil.copytree(
        os.path.join(pages_dir, "a.parquet"), os.path.join(src, "a.parquet")
    )
    out = str(tmp_path / "out")
    pages = synth_webpages(spark, 120)
    templates = mine_templates(pages_to_lines(pages))

    def one_batch_stream():
        # no maxFilesPerTrigger: ALL unprocessed files bundle into batch 0
        schema = spark.read.parquet(os.path.join(src, "a.parquet")).schema
        return spark.readStream.schema(schema).parquet(os.path.join(src, "*.parquet"))

    run_streaming_pipeline(
        spark, one_batch_stream(), out, templates, checkpoint_dir=str(tmp_path / "c1")
    )
    n_a = read_streaming_routed(spark, out).count()
    assert n_a > 0

    # new file lands, checkpoint is lost
    shutil.copytree(
        os.path.join(pages_dir, "b.parquet"), os.path.join(src, "b.parquet")
    )
    run_streaming_pipeline(
        spark, one_batch_stream(), out, templates, checkpoint_dir=str(tmp_path / "c2")
    )
    routed = read_streaming_routed(spark, out)
    n_all = routed.count()
    assert n_all > n_a  # b's rows arrived
    assert routed.select("url", "seq").distinct().count() == n_all  # and no dups

    # identical replay (checkpoint lost again, no new file): fingerprint
    # matches -> short-circuit, still exactly once
    run_streaming_pipeline(
        spark, one_batch_stream(), out, templates, checkpoint_dir=str(tmp_path / "c3")
    )
    assert read_streaming_routed(spark, out).count() == n_all
