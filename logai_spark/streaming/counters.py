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


def streaming_dbl_scores(
    stream: DataFrame,
    key_cols: list[str],
    ts_col: str = "timestamp",
    value_col: str = "value",
    n_sigma: float = 3.0,
    min_points: int = 10,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Custom STATEFUL streaming operator via ``applyInPandasWithState``:
    per-key running-baseline anomaly scores — the streaming analog of the
    batch DBL detector (reference dbl.py:46-122 spirit, anomaly.py
    detect_anomalies_per_series): a point is scored against the baseline of
    everything seen BEFORE it, then absorbed into the baseline.

    State per key is the Welford accumulator (n, mean, M2) — constant-size,
    exactly-once-updated by the state store across micro-batches, so a key's
    baseline survives restarts with checkpointing. Scores are 0 until the
    key has ``min_points`` observations (the reference's MIN_TS_LENGTH
    gate). Anomalous points DO update the baseline (streaming contract: no
    lookahead, no shielding — flag fast, adapt after).
    """
    import math

    import pandas as pd
    from pyspark.sql import types as T
    from pyspark.sql.streaming.state import GroupStateTimeout

    key_fields = [stream.schema[c] for c in key_cols]
    out_schema = T.StructType(
        key_fields
        + [
            stream.schema[ts_col],
            stream.schema[value_col],
            T.StructField("anom_score", T.DoubleType()),
            T.StructField("is_anomaly", T.IntegerType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("n", T.LongType()),
            T.StructField("mean", T.DoubleType()),
            T.StructField("m2", T.DoubleType()),
        ]
    )

    def fn(key, pdfs, state):
        n, mean, m2 = state.get if state.exists else (0, 0.0, 0.0)
        # a big group arrives as MULTIPLE Arrow chunks in arbitrary relative
        # order: concatenate and sort ONCE so every point is scored against
        # strictly-earlier points — per-chunk sorting would make scores
        # depend on maxRecordsPerBatch / partition layout
        pdf = pd.concat(list(pdfs), ignore_index=True).sort_values(ts_col)
        scores, flags = [], []
        for v in pdf[value_col]:
            v = float(v)
            if n >= min_points:
                var = m2 / (n - 1) if n > 1 else 0.0
                sd = math.sqrt(var) if var > 0 else 1.0
                s = (v - mean) / sd
            else:
                s = 0.0
            scores.append(s)
            flags.append(1 if abs(s) > n_sigma else 0)
            n += 1
            d = v - mean
            mean += d / n
            m2 += d * (v - mean)
        out = pd.DataFrame(
            {
                **{c: pdf[c].values for c in key_cols},
                ts_col: pdf[ts_col].values,
                value_col: pdf[value_col].values,
                "anom_score": scores,
                "is_anomaly": pd.Series(flags, dtype="int32"),
            }
        )
        yield out
        state.update((n, mean, m2))

    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(*key_cols)
        .applyInPandasWithState(
            fn, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
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


def streaming_sessionize(
    stream: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    gap: str = "6 hours",
    watermark: str = "30 days",
) -> DataFrame:
    """Streaming gap sessionization over arbitrary keys (counts + bounds):
    the native ``session_window`` keeps per-key open-session state in the
    state store and merges on arrival, so state is O(open sessions), not
    O(events). Semantics: an event extends its session iff it is at most
    ``gap`` after the previous event (boundary INCLUSIVE — Spark merges a
    window whose start equals the prior session's end), which is exactly
    ``features.sessionize_by_gap``'s batch break-on-strictly-greater rule;
    verified on the exact-gap boundary in tests/test_streaming.py."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(
            *key_cols, F.session_window(F.col(ts_col), gap).alias("session")
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            *key_cols,
            F.col("session.start").alias("session_start"),
            F.col("session.end").alias("session_end"),
            "n_events",
        )
    )
