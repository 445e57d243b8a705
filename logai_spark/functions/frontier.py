"""Crawl-frontier scheduling — politeness-ordered fetch slots per domain.

The operational complement of robots handling (functions/robots.py): given
the URLs that SURVIVE the robots filter, a crawler must serialize fetches
within each domain (one request per ``delay_ms``) while domains proceed in
parallel — the standard frontier design (Heydon & Najork, "Mercator: a
scalable, extensible web crawler", WWW 1999 §3.2: per-host FIFO queues +
politeness delay). This module re-expresses that as a declarative plan:

- slot assignment is ONE per-domain window (``row_number`` ordered by
  priority desc, then url for determinism) — the per-domain sequence IS
  the semantics, so the domain-keyed shuffle is irreducible, and a domain's
  schedule lands in one task exactly like it lands on one politeness queue;
- ``max_per_domain`` caps hot domains with a rank<=K filter Catalyst
  compiles to WindowGroupLimit — every input partition forwards at most K
  candidate urls per domain BEFORE the exchange, so a 10^9-url domain costs
  K rows per partition, not a corpus-sized task (a real frontier bounds
  per-host queues the same way);
- per-domain crawl delays (e.g. robots.txt Crawl-delay) arrive as a small
  (domain, delay_ms) table, BROADCAST left-joined, defaulting to
  ``delay_ms``;
- ``fetch_at_ms = slot * delay`` gives each url its scheduled offset from
  the domain's first fetch — workers consume (domain, slot) order and stay
  polite without coordination.

Reference surface: beyond the reference (SURVEY.md §2.13 web-pipeline
extensions); LogAI has no crawl side at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from logai_spark.functions.textops import url_domain_expr


def crawl_frontier(
    urls: DataFrame,
    delay_ms: int = 1000,
    max_per_domain: int | None = None,
    delays: DataFrame | None = None,
    url_col: str = "url",
    priority_col: str | None = None,
) -> DataFrame:
    """Schedule fetches: output (url, domain, slot, fetch_at_ms) where
    ``slot`` is the url's 0-based position in its domain's politeness queue
    (priority desc first if ``priority_col`` given, then url ascending —
    fully deterministic) and ``fetch_at_ms = slot * delay`` with the
    domain's delay from ``delays`` (broadcast (domain, delay_ms) table,
    e.g. robots.txt Crawl-delay values) or the ``delay_ms`` default.
    ``max_per_domain`` drops everything past slot K-1 (WindowGroupLimit —
    see module docstring)."""
    work = urls.withColumn("domain", url_domain_expr(url_col))
    order = (
        [F.desc(priority_col), F.asc(url_col)] if priority_col else [F.asc(url_col)]
    )
    w = Window.partitionBy("domain").orderBy(*order)
    # filter on the RAW row_number: Catalyst's InferWindowGroupLimit only
    # recognizes rank <= k on the window column itself (a filter on
    # row_number() - 1 defeats the rewrite and buffers hot domains whole)
    work = work.withColumn("_rn", F.row_number().over(w))
    if max_per_domain is not None:
        work = work.filter(F.col("_rn") <= max_per_domain)
    work = work.withColumn("slot", F.col("_rn") - 1).drop("_rn")
    if delays is not None:
        d = delays.select(
            F.col("domain").alias("_dd"), F.col("delay_ms").alias("_delay")
        )
        work = work.join(
            F.broadcast(d), work["domain"] == d["_dd"], "left"
        ).drop("_dd")
    else:
        work = work.withColumn("_delay", F.lit(None).cast("long"))
    return work.select(
        url_col,
        "domain",
        "slot",
        (F.col("slot") * F.coalesce(F.col("_delay"), F.lit(delay_ms))).alias(
            "fetch_at_ms"
        ),
    )
