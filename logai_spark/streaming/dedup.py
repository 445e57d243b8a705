"""Streaming incremental exact dedup for continuously-ingested corpora.

The batch dedup family (textops.exact_dedup, incremental_dedup) assumes a
bounded snapshot. A crawl firehose needs the streaming dual: drop a page
whose content hash was already seen, while bounding the dedup state so it
does not grow with the corpus. Structured Streaming's
``dropDuplicatesWithinWatermark`` is exactly that operator: per-key state
lives in the state store only until the event-time watermark passes
``delay``, so state is O(keys per watermark window), not O(corpus) — the
only formulation that survives an unbounded 10^12-doc stream. Pair it with
the batch ``incremental_dedup`` (fingerprint anti-join against the
long-term snapshot) for dedup beyond the watermark horizon: the stream
stage kills the burst duplicates (mirrors, reposts, crawler retries
cluster in time), the batch stage the long-tail ones.

Keys are 128-bit md5 of a null-safe JSON encoding of the key columns (same
construction as ``exact_dedup(hash_key=True)``: state and shuffle carry
16-byte digests, never document bodies; NULL, '' and separator-bearing
values all encode distinctly).

UPGRADE NOTE (key-format change): before round 4 the key was
``md5(concat_ws(0x1f, cols))``, which collapsed NULL with '' and was
separator-injectable; it is now the null-safe ``to_json(struct(...))``
hash above. The two formats hash the same document differently, so a
streaming query RESTARTED FROM AN EXISTING CHECKPOINT after the upgrade
will not match pre-restart state entries: duplicates of keys first seen
before the restart pass through until the watermark expires that old
state. Start upgraded queries from a fresh checkpoint (or accept one
watermark window of weakened dedup across the boundary); the batch
``incremental_dedup`` stage downstream catches what slips through.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_exact_dedup(
    stream: DataFrame,
    key_cols: list[str],
    ts_col: str = "warc_ts",
    delay: str = "10 minutes",
) -> DataFrame:
    """First-seen row per content key survives; duplicates arriving within
    the watermark ``delay`` are dropped by the state store. Rows whose key
    reappears AFTER the watermark horizon pass through (hand those to the
    batch ``incremental_dedup`` stage)."""
    from logai_spark.functions.textops import _null_safe_key_hash

    keyed = stream.withColumn("_k", _null_safe_key_hash(key_cols))
    return (
        keyed.withWatermark(ts_col, delay)
        .dropDuplicatesWithinWatermark(["_k"])
        .drop("_k")
    )
