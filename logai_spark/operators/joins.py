"""Time-ordered joins: distributed as-of join.

The reference engine has no as-of join (it is pandas `merge_asof` territory,
used ad hoc in notebooks); a log/event pipeline at scale needs it constantly
("state of X at the time of event Y"). Spark has no native ASOF JOIN either,
and the naive range-join formulation (`l.ts >= r.ts` + row_number) explodes
into a near-cartesian. This module implements the scalable UNION pattern:

  1. tag left rows `_side=1`, right rows `_side=0`,
  2. union on an aligned schema (each side null-pads the other's columns),
  3. one window `partitionBy(keys).orderBy(ts, _side, tiebreaks)` with
     `last(value, ignorenulls=True)` carries the latest right-side values
     forward onto every left row,
  4. filter `_side=1`.

Cost: ONE shuffle on the join keys + an in-partition sort — the same cost as
a co-partitioned equi-join, independent of the time-match fan-out. This is
the plan that survives 100 TB; a range join does not.

Semantics match DuckDB `ASOF LEFT JOIN ... ON l.key = r.key AND l.ts >= r.ts`
(backward, inclusive): at equal timestamps the right row sorts first
(`_side` ascending) so a left row matches a right row with the identical
timestamp. If the right side can hold several rows per (key, ts) the caller
must pre-aggregate them — which row wins would otherwise be unordered.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    ts_col: str,
    value_cols: list[str],
    right_ts_out: str | None = None,
    tiebreak_cols: list[str] | None = None,
    tolerance_secs: float | None = None,
) -> DataFrame:
    """Backward as-of join: for every left row, attach ``value_cols`` from
    the latest right row of the same ``on`` keys with right.ts <= left.ts
    (inclusive). Left rows with no prior right row keep nulls.

    ``right_ts_out``: also expose the matched right row's timestamp under
    this name (e.g. to compute "seconds since"). ``tiebreak_cols`` (left
    columns) make ordering among equal-ts left rows deterministic — they do
    not affect which right row matches. ``tolerance_secs`` (pandas
    merge_asof parity): a match older than this is nulled out — "state must
    be fresh within X"; applied as a row-local post-filter, so the plan
    shape (one keyed shuffle) is unchanged.
    """
    for c in value_cols:
        if c in left.columns:
            raise ValueError(f"value column {c!r} collides with a left column")
    if right_ts_out is not None and right_ts_out in left.columns:
        # without this, the carry loop would silently REPLACE the existing
        # left column with the matched right timestamp
        raise ValueError(
            f"right_ts_out {right_ts_out!r} collides with a left column"
        )
    carry = list(value_cols)
    r = right.select(*on, ts_col, *value_cols)
    # tolerance needs the matched right ts even when the caller didn't ask
    ts_internal = right_ts_out or ("_asof_right_ts" if tolerance_secs is not None else None)
    if ts_internal is not None:
        r = r.withColumn(ts_internal, F.col(ts_col))
        carry.append(ts_internal)

    left_only = [c for c in left.columns if c not in on and c != ts_col]
    l_tag = left.withColumn("_side", F.lit(1))
    for c in carry:
        l_tag = l_tag.withColumn(c, F.lit(None).cast(r.schema[c].dataType))
    r_tag = r.withColumn("_side", F.lit(0))
    for c in left_only:
        r_tag = r_tag.withColumn(c, F.lit(None).cast(left.schema[c].dataType))

    cols = [*on, ts_col, *left_only, *carry, "_side"]
    unioned = l_tag.select(*cols).unionByName(r_tag.select(*cols))

    order = [F.col(ts_col), F.col("_side"), *[F.col(c) for c in (tiebreak_cols or [])]]
    w = (
        Window.partitionBy(*on)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = unioned.select(
        *on,
        ts_col,
        *left_only,
        *[F.last(c, ignorenulls=True).over(w).alias(c) for c in carry],
        "_side",
    )
    out = filled.filter(F.col("_side") == 1).drop("_side")
    if tolerance_secs is not None:
        micros = lambda col: F.unix_micros(F.col(col).cast("timestamp_ltz"))  # noqa: E731
        stale = micros(ts_col) - micros(ts_internal) > int(tolerance_secs * 1_000_000)
        for c in carry:
            out = out.withColumn(c, F.when(stale, F.lit(None)).otherwise(F.col(c)))
        if right_ts_out is None:
            out = out.drop(ts_internal)
    return out
