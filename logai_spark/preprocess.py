"""Log-line cleaning: regex delimiter stripping + replace-with-capture.

Parity target: ``Preprocessor.clean_log``
(/root/reference/logai/preprocess/preprocessor.py:36-71) and
``OpenSetPreprocessor.clean_log`` (openset_preprocessor.py:36-63).

Everything is chained ``regexp_replace`` / ``regexp_extract_all`` SQL
expressions — whole-stage-codegen'd JVM work, no Python in the hot path.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class PreprocessorConfig:
    """Mirrors the reference config (preprocessor.py:16-25).

    custom_delimiters_regex: patterns replaced by a single space.
    custom_replace_list: [(pattern, replacement)] — every match is captured
        into a side column named after the replacement token, then replaced.
    """

    custom_delimiters_regex: list[str] = field(default_factory=list)
    custom_replace_list: list[tuple[str, str]] = field(default_factory=list)


def clean_log(
    df: DataFrame, column: str = "logline", config: PreprocessorConfig | None = None
) -> DataFrame:
    """Clean ``column`` in place; add one capture column per replace pair.

    The capture column holds ``array<string>`` of all matches found before
    replacement (reference keeps them in the ``terms`` side frame,
    preprocessor.py:55-70).
    """
    cfg = config or PreprocessorConfig()
    out = df
    cleaned = F.col(column)
    for pattern in cfg.custom_delimiters_regex:
        cleaned = F.regexp_replace(cleaned, pattern, " ")
    for pattern, replacement in cfg.custom_replace_list:
        out = out.withColumn(
            replacement, F.expr(f"regexp_extract_all({column}, '{_sql_quote(pattern)}', 0)")
        )
        cleaned = F.regexp_replace(cleaned, pattern, replacement)
    return out.withColumn(column, cleaned)


def clean_log_openset(
    df: DataFrame, column: str = "logline", config: PreprocessorConfig | None = None
) -> DataFrame:
    """OpenSet variant: after clean_log, collapse runs of each replacement
    token (``((TOK)[ /=]*)+`` -> ``TOK``), drop ``*`` chars, squeeze spaces
    (openset_preprocessor.py:45-54)."""
    cfg = config or PreprocessorConfig()
    out = clean_log(df, column, cfg)
    cleaned = F.col(column)
    for _, replacement in cfg.custom_replace_list:
        run = r"((" + replacement + r")[ /=]*)+"
        cleaned = F.regexp_replace(cleaned, run, replacement)
    cleaned = F.regexp_replace(F.regexp_replace(cleaned, r"\*", ""), " +", " ")
    return out.withColumn(column, cleaned)


def _sql_quote(pattern: str) -> str:
    return pattern.replace("\\", "\\\\").replace("'", "\\'")


def distributed_dense_ids(
    df: DataFrame, column: str, out_col: str, buckets: int | None = None
) -> DataFrame:
    """Dense 0-based ids in global sort order WITHOUT a single-task window.

    ``row_number() over (order by col)`` funnels every row through ONE task —
    fine for bounded categorical dims, a driver-side bottleneck for web-scale
    vocabularies (one id per distinct logline can be 10^7+). This variant
    stays fully distributed:

    1. range-repartition the distinct keys into ``buckets`` sorted ranges
       (distributed sample + range sort — the same machinery as orderBy),
    2. rank within each range (window partitioned by the materialized range
       id — each range is one task),
    3. add per-range offsets (a tiny count table, broadcast).

    Ids equal the global-sort row numbers regardless of where the range
    boundaries fall, because ranges partition the key ORDER: id = (#keys in
    earlier ranges) + rank within range. The frame with materialized range
    ids is eagerly localCheckpoint-ed: that freezes the _range assignment
    (lineage truncated, so a retry can never recompute a different
    spark_partition_id) AND lets the blocks be garbage-collected with the
    DataFrame — a named .persist() here would leak executor cache on every
    vocab/idf fit for the session lifetime. On a cluster where executor
    loss must be survivable, substitute a reliable checkpoint dir.
    """
    keys = df.select(column).distinct()
    out = distributed_order_ids(keys, [F.asc(column)], out_col, buckets)
    return out.select(column, out_col)


def ranged_with_offsets(
    df: DataFrame, order_exprs: list, val_agg, buckets: int | None = None
):
    """Shared skeleton of the two-phase distributed rank/cumulative-sum:
    range-repartition on the TOTAL ``order_exprs``, materialize the range
    id (the eager localCheckpoint freezes the assignment against retries —
    see distributed_dense_ids for the full rationale), and compute per-
    range EXCLUSIVE prefix offsets of ``val_agg`` over the tiny
    (#buckets)-row range table. Returns (keys_with_range, offsets), where
    offsets has columns (_range, _n, _offset).

    Consumers: :func:`distributed_order_ids` (val = row count → global
    ranks) and ``operators.shards.balanced_shards`` (val = sum of sizes →
    global running token sums). Either way, (offset from earlier ranges) +
    (position within range) is invariant to where the range boundaries
    fall, so results are identical at any parallelism."""
    from pyspark.sql import Window

    spark = df.sparkSession
    n = buckets or spark.sparkContext.defaultParallelism * 4
    keys = (
        df.repartitionByRange(n, *order_exprs)
        .withColumn("_range", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    per = keys.groupBy("_range").agg(val_agg.alias("_n"))
    w_off = Window.orderBy("_range").rowsBetween(Window.unboundedPreceding, -1)
    offsets = per.withColumn(
        "_offset", F.coalesce(F.sum("_n").over(w_off), F.lit(0))
    )
    return keys, offsets


def distributed_order_ids(
    df: DataFrame, order_exprs: list, out_col: str, buckets: int | None = None
) -> DataFrame:
    """Rank the rows of ``df`` in the given (total) order, fully distributed.

    Generalization of :func:`distributed_dense_ids` to arbitrary sort
    expressions (e.g. ``[F.desc("cnt"), F.asc("token")]`` for a
    frequency-ordered vocabulary): range-repartition on the sort expressions,
    rank within each sorted range, add broadcast per-range offsets. The
    ordering must be TOTAL (ties fully broken) or ids are nondeterministic.
    Same localCheckpoint rationale as distributed_dense_ids: freeze the
    range assignment against retries, let blocks be GC'd with the frame.
    """
    from pyspark.sql import Window

    keys, offsets = ranged_with_offsets(
        df, order_exprs, F.count(F.lit(1)), buckets
    )
    w_in = Window.partitionBy("_range").orderBy(*order_exprs)
    ranked = keys.withColumn("_rank", F.row_number().over(w_in) - 1)
    out = ranked.join(F.broadcast(offsets.select("_range", "_offset")), "_range")
    return out.select(
        *df.columns, (F.col("_rank") + F.col("_offset")).alias(out_col)
    )


def dense_ids(df: DataFrame, column: str, out_col: str) -> DataFrame:
    """String keys -> dense 0-based int ids, deterministically (sorted order).

    Reference: serial-id dict encode (openset_preprocessor.py:30-34) — but the
    reference's `set()` iteration order is nondeterministic; we sort instead.
    Implemented as a broadcast join against the distinct-key table so it scales
    (no global window over the fact table).
    """
    from pyspark.sql import Window

    ids = (
        df.select(column)
        .distinct()
        .withColumn(out_col, F.row_number().over(Window.orderBy(column)) - 1)
    )
    return df.join(F.broadcast(ids), column, "left")
