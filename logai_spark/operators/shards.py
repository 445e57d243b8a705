"""Balanced output sharding for training-corpus writers.

The last step of a pre-training data pipeline writes the curated corpus as
K shard files of ~equal token budget, in a deterministic global order (so
any two runs — and any two cluster sizes — produce byte-identical shards).
The natural formulation is a running sum over the global order:

    shard(row) = (tokens_before_row * K) div total_tokens, capped at K-1

``sum() over (order by ...)`` computes that in ONE task — the same
single-task-window cliff ``preprocess.distributed_order_ids`` exists to
avoid. This module applies the identical two-phase trick to CUMULATIVE
SUMS: range-repartition on the (total) order, per-range exclusive running
sum (each sorted range is one independent task), then add broadcast
per-range size offsets. The per-range offsets and the grand total come
from one tiny (#buckets)-row aggregate that is broadcast, never collected
to the driver.

Determinism: the range boundaries may differ across cluster sizes, but
(offset within range) + (sum of earlier ranges) is invariant to where the
boundaries fall, exactly as with distributed_order_ids' ranks — provided
the order is TOTAL (callers must tie-break, e.g. on the doc id).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def balanced_shards(
    df: DataFrame,
    n_shards: int,
    size_col: str = "n_tokens",
    order_exprs: list | None = None,
    buckets: int | None = None,
    out_col: str = "shard",
) -> DataFrame:
    """Assign every row a shard in [0, n_shards) so shard size budgets are
    balanced (each within one max-row-size of total/K) and rows within a
    shard are contiguous in the global order.

    ``order_exprs`` must be a total order (default: ascending ``doc_id``).
    All-zero sizes degenerate to NULL shard (div by zero) — callers filter
    empty docs first, as the curation pipeline does.
    """
    from logai_spark.preprocess import ranged_with_offsets

    order_exprs = order_exprs or [F.asc("doc_id")]
    sized = df.withColumn("_sz", F.col(size_col).cast("long"))
    # shared two-phase skeleton (range-freeze + per-range exclusive prefix
    # offsets) — same machinery distributed_order_ids uses for ranks,
    # instantiated with sum-of-sizes instead of row count
    keys, offsets = ranged_with_offsets(
        sized, order_exprs, F.sum("_sz"), buckets
    )
    total = offsets.agg(F.sum("_n").alias("_total"))
    w_in = (
        Window.partitionBy("_range")
        .orderBy(*order_exprs)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = keys.withColumn("_cb", F.coalesce(F.sum("_sz").over(w_in), F.lit(0)))
    out = cum.join(F.broadcast(offsets.select("_range", "_offset")), "_range")
    out = out.crossJoin(F.broadcast(total))
    shard = F.least(
        F.lit(n_shards - 1),
        F.expr(f"CAST(((_cb + _offset) * {int(n_shards)}) DIV _total AS INT)"),
    )
    return out.select(*df.columns, shard.alias(out_col))
