"""Structured-Streaming operators: windowed counters, session windows, match.

The reference is batch-only (SURVEY.md §2.12 — event-time bucketing exists
but no watermarks/late-data handling). These are the streaming analogs per
the Spark mapping: ``window()``/``session_window()`` + ``withWatermark``;
the template dictionary is a broadcast (mined on a batch sample, refreshed
out-of-band), so the streaming match pass is stateless and scales like any
map stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_counter_vector(
    stream: DataFrame,
    group_by_cats: list[str],
    ts_col: str = "timestamp",
    freq: str = "5 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming analog of convert_to_counter_vector
    (feature_extractor.py:86-110): watermarked tumbling-window counts.
    Late rows beyond the watermark are dropped (the reference can't see late
    data at all; this is the explicit streaming contract)."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(*group_by_cats, F.window(F.col(ts_col), freq))
        .agg(F.count(F.lit(1)).alias("counts"))
        .select(
            *group_by_cats,
            F.col("window.start").alias("timestamp"),
            "counts",
        )
    )


def streaming_session_windows(
    stream: DataFrame,
    span_col: str = "span_id",
    ts_col: str = "timestamp",
    gap: str = "5 minutes",
    watermark: str = "10 minutes",
    line_col: str = "logline",
) -> DataFrame:
    """Streaming sessionization: gap-based session_window per span
    (analog of openset_partitioner.py:119-142 where a 'session' is all rows
    of one span — here bounded by an inactivity gap, the streaming-correct
    definition)."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(F.col(ts_col), gap).alias("session"), F.col(span_col))
        .agg(
            F.count(F.lit(1)).alias("session_len"),
            F.array_join(F.collect_list(line_col), " ").alias("session_text"),
        )
        .select(
            span_col,
            F.col("session.start").alias("session_start"),
            F.col("session.end").alias("session_end"),
            "session_len",
            "session_text",
        )
    )


def streaming_match_templates(
    stream: DataFrame,
    templates: list[tuple[str, int]],
    column: str = "logline",
    config=None,
) -> DataFrame:
    """Stateless streaming template match: same broadcast-dictionary Arrow
    UDF as the batch pass (parse/distributed.py) — valid on streams because
    the matcher is frozen."""
    from logai_spark.parse.distributed import match_templates

    return match_templates(stream, column, templates, config, template_col=None)
