"""Feature extraction: counter vectors, sliding/session windows, dedup.

Parity targets (reference, pandas):
- counter vectors: ``FeatureExtractor.convert_to_counter_vector``
  (/root/reference/logai/information_extraction/feature_extractor.py:86-110)
  and ``Partitioner.group_counter`` (preprocess/partitioner.py:61-101)
- sliding windows: ``Partitioner.sliding_window`` / ``group_sliding_window``
  (partitioner.py:51-59, 103-212) and ``convert_to_sequence``
  (feature_extractor.py:174-214)
- session windows: ``OpenSetPartitioner.generate_session_window``
  (preprocess/openset_partitioner.py:119-142) + sliding-with-next-line
  (openset_partitioner.py:64-117)
- dedup with counts: openset_anomaly_detection_workflow.py:377-410

All pure DataFrame ops — hash aggregates get map-side partial aggregation and
AQE sizing for free; window functions shuffle once on the partition keys.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def counter_vector(
    df: DataFrame,
    group_by_cats: list[str] | None = None,
    ts_col: str | None = None,
    freq: str = "5 minutes",
    count_col: str = "counts",
) -> DataFrame:
    """Group by categorical cols and/or an event-time bucket -> counts.

    The time bucket is ``window(ts, freq).start`` exposed as ``timestamp``
    (reference floors timestamps the same way: pd.Grouper(freq)/dt.floor,
    partitioner.py:86-93, feature_extractor.py:256-260).
    """
    keys: list[Column] = [F.col(c) for c in (group_by_cats or [])]
    if ts_col:
        keys.append(F.window(F.col(ts_col), freq).start.alias("timestamp"))
    if not keys:
        raise ValueError("need at least one grouping key")
    return df.groupBy(*keys).agg(F.count(F.lit(1)).alias(count_col))


def group_loglines(
    df: DataFrame,
    group_by: list[str],
    line_col: str = "logline",
    order_col: str | None = None,
    sep: str = " ",
    out_col: str = "logline",
) -> DataFrame:
    """Per-group ordered concatenation of loglines (session window concat,
    partitioner.py:103-174). Order inside the group is (order_col, line) via
    sort_array over structs — deterministic without a global sort."""
    if order_col:
        pair = F.struct(F.col(order_col), F.col(line_col))
        agg = F.array_join(
            F.transform(F.sort_array(F.collect_list(pair)), lambda s: s[line_col]),
            sep,
        )
    else:
        agg = F.array_join(F.sort_array(F.collect_list(F.col(line_col))), sep)
    return df.groupBy(*group_by).agg(agg.alias(out_col))


def sliding_windows(
    df: DataFrame,
    window_size: int,
    partition_by: list[str] | None = None,
    order_by: str = "seq",
    line_col: str = "logline",
    step: int = 1,
    exclude_smaller_windows: bool = True,
    with_next_line: bool = False,
    label_col: str | None = None,
    sep: str = " ",
) -> DataFrame:
    """Count-based sliding windows over ordered lines, optionally per group.

    Window w ending at row r = the last ``window_size`` lines up to r
    (rowsBetween). ``step`` keeps every step-th window (stride semantics of
    convert_to_sequence, feature_extractor.py:174-214 — strided view [::step]
    anchored at the FIRST full window). ``with_next_line`` adds the line after
    the window (forecast target, openset_partitioner.py:64-117); window label
    = max of member labels.
    """
    parts = partition_by or []
    w = Window.partitionBy(*parts).orderBy(order_by)
    span = w.rowsBetween(-(window_size - 1), 0)
    out = df.withColumn("_rn", F.row_number().over(w))
    out = out.withColumn("window_lines", F.collect_list(line_col).over(span))
    if with_next_line:
        out = out.withColumn("next_logline", F.lead(line_col, 1).over(w))
    if label_col:
        out = out.withColumn("window_label", F.max(label_col).over(span))
    if exclude_smaller_windows:
        out = out.filter(F.size("window_lines") == window_size)
    if step > 1:
        # strided: keep windows whose end row aligns with the stride grid
        # anchored at the first full window (_rn == window_size)
        out = out.filter((F.col("_rn") - window_size) % step == 0)
    return out.withColumn("window_text", F.array_join("window_lines", sep)).drop("_rn")


def session_windows(
    df: DataFrame,
    span_col: str = "span_id",
    line_col: str = "logline",
    order_col: str | None = None,
    label_col: str | None = None,
    sep: str = " ",
) -> DataFrame:
    """All lines of one span -> one row (openset_partitioner.py:119-142);
    session label = OR/max of member labels."""
    aggs = []
    if order_col:
        pair = F.struct(F.col(order_col), F.col(line_col))
        aggs.append(
            F.array_join(
                F.transform(F.sort_array(F.collect_list(pair)), lambda s: s[line_col]),
                sep,
            ).alias("session_text")
        )
    else:
        aggs.append(F.array_join(F.collect_list(F.col(line_col)), sep).alias("session_text"))
    aggs.append(F.count(F.lit(1)).alias("session_len"))
    if label_col:
        aggs.append(F.max(label_col).alias("session_label"))
    return df.groupBy(span_col).agg(*aggs)


def dedup_with_counts(
    df: DataFrame,
    keys: list[str],
    ts_col: str | None = None,
    label_col: str | None = None,
) -> DataFrame:
    """Collapse duplicate (span, line) rows keeping count / last ts / OR-label
    (openset_anomaly_detection_workflow.py:377-410)."""
    aggs = [F.count(F.lit(1)).alias("counts")]
    if ts_col:
        aggs.append(F.max(ts_col).alias(ts_col))
    if label_col:
        aggs.append(F.max(label_col).alias(label_col))
    return df.groupBy(*keys).agg(*aggs)


def feature_vector_mean(
    df: DataFrame, group_by: list[str], vec_col: str = "features"
) -> DataFrame:
    """Element-wise mean of equal-length array vectors per group
    (feature_extractor.py:140-146). posexplode + avg + reassemble: one
    shuffle, no UDF, works at any vector width."""
    exploded = df.select(*group_by, F.posexplode(vec_col).alias("_pos", "_val"))
    means = exploded.groupBy(*group_by, "_pos").agg(F.avg("_val").alias("_avg"))
    return (
        means.groupBy(*group_by)
        .agg(
            F.transform(
                F.sort_array(F.collect_list(F.struct("_pos", "_avg"))),
                lambda s: s["_avg"],
            ).alias(vec_col)
        )
    )


def chrono_split(
    df: DataFrame,
    order_col: str = "timestamp",
    partition_by: list[str] | None = None,
    train_frac: float = 0.7,
    flag_col: str = "is_train",
) -> DataFrame:
    """Chronological train/test split per series: first ``train_frac`` of rows
    by time are train (log_anomaly_detection.py:144-149; shuffle=False split,
    dataset_utils.py:53-66). percent_rank keeps it one window pass."""
    w = Window.partitionBy(*(partition_by or [])).orderBy(order_col)
    return df.withColumn(flag_col, F.percent_rank().over(w) <= train_frac)


def sessionize_by_gap(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str = "timestamp",
    gap_secs: int = 1800,
    tiebreak_cols: list[str] | None = None,
    out_col: str = "session_seq",
) -> DataFrame:
    """Gap-based sessionization: within each key, a new session starts when
    the time since the previous event exceeds ``gap_secs``. Extends the
    reference's fixed-bucket session ids (openset_partitioner.py:119-142) to
    the gap semantics a web/event pipeline needs.

    Scale shape: both windows partition on the session keys, so the whole
    operator is ONE shuffle on ``key_cols`` followed by an in-partition sort
    — no global window, no driver state. ``tiebreak_cols`` make the order
    (and therefore session numbering) deterministic under equal timestamps.
    """
    order = [F.col(ts_col), *[F.col(c) for c in (tiebreak_cols or [])]]
    w = Window.partitionBy(*key_cols).orderBy(*order)
    # exact integer micros (no double rounding at the gap boundary)
    micros = F.unix_micros(F.col(ts_col).cast("timestamp_ltz"))
    prev = F.lag(micros).over(w)
    brk = F.when(
        prev.isNull() | (micros - prev > gap_secs * 1_000_000), 1
    ).otherwise(0)
    run = Window.partitionBy(*key_cols).orderBy(*order).rowsBetween(
        Window.unboundedPreceding, 0
    )
    return df.withColumn("_brk", brk).withColumn(
        out_col, F.sum("_brk").over(run).cast("long")
    ).drop("_brk")


def pack_sequences(
    df: DataFrame,
    budget: int,
    group_cols: list[str],
    order_cols: list[str],
    size_col: str = "n_tokens",
    out_col: str = "pack_id",
) -> DataFrame:
    """Greedy token-budget sequence packing: walk each group in order,
    accumulating ``size_col``; start a new pack whenever adding the next doc
    would exceed ``budget`` (an oversized doc gets a pack of its own). The
    standard pre-training step that concatenates documents into fixed-budget
    training sequences.

    Scale shape: greedy packing is inherently sequential WITHIN a group —
    that is its definition, not an implementation limit — so the parallelism
    unit is the group (source/shard/partition), exactly how production
    packers run: thousands of shards packed independently. applyInPandas
    gives one Arrow batch per group; memory is O(group rows) of (ids, sizes)
    only, the text itself never enters the Python worker (callers join the
    assignment back by id).
    """
    import pandas as pd

    sizes = df.select(*group_cols, *order_cols, size_col)
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in sizes.schema.fields
    ) + f", {out_col} long"

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_cols, kind="mergesort").reset_index(drop=True)
        packs, pack, cum = [], 1, 0
        for tok in pdf[size_col].tolist():
            if cum > 0 and cum + tok > budget:
                pack, cum = pack + 1, tok
            else:
                cum += tok
            packs.append(pack)
        pdf[out_col] = pd.Series(packs, dtype="int64")
        return pdf

    return sizes.groupBy(*group_cols).applyInPandas(_pack, out_schema)
