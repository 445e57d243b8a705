"""Corpus-hygiene operators for web-scale training-data curation.

Two first-class stages every large text-corpus pipeline runs before dedup
and quality filtering (cf. CCNet, Wenzek et al. 2020; Gopher, Rae et al.
2021 §A1 — public methodology, re-expressed Spark-first; the reference
salesforce/logai has no corpus-curation stage at all, this module extends
its preprocessing surface for the 100 TB web-corpus target):

- ``text_normalize``: ftfy-lite typography/whitespace cleanup as ONE chain
  of JVM column expressions (translate + 5 regexp passes) — zero shuffle,
  whole-stage codegen, no UDF. Deterministic byte-for-byte.
- ``boilerplate_rm``: CCNet-style line-level boilerplate removal. A line
  (nav bar, footer, cookie banner) that appears in more than ``max_df``
  DISTINCT documents is dropped from every document; remaining lines are
  reassembled in original order. Scale shape: the document corpus is
  exploded once; the doc-frequency aggregate shuffles 8-byte line hashes
  (never line text); the hot-line set is at most total_lines / max_df rows
  — small by construction — so the removal join is a BROADCAST hash join
  and the only wide shuffle of full text is the final per-document
  reassembly, partitioned on doc id.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# single-char typography fixes in one translate() pass (1 JVM scan):
# curly single quotes -> ', curly double quotes -> ", en/em dash -> -,
# NBSP -> space. The 1->3-char ellipsis fix needs regexp_replace.
_TR_FROM = "‘’‚‛“”„–— "
_TR_TO = "''''\"\"\"-- "
# C0 controls except \t (x09) and \n (x0a), plus DEL. \r (x0d) is stripped
# too: web text mixes CRLF/LF and downstream line operators key on \n.
_CTRL_RE = r"[\x00-\x08\x0b-\x1f\x7f]"


def normalize_text_expr(col: str | Column) -> Column:
    """The normalization chain as a single column expression.

    Order matters and is part of the contract (the DuckDB oracle applies
    the identical sequence): typography translate -> ellipsis -> control
    strip -> horizontal-whitespace squeeze -> strip spaces around newlines
    -> collapse 3+ newlines to a blank line -> trim. All RE2/Java-compatible
    patterns, byte-stable cross-engine.
    """
    c = F.col(col) if isinstance(col, str) else col
    c = F.translate(c, _TR_FROM, _TR_TO)
    c = F.regexp_replace(c, "…", "...")
    c = F.regexp_replace(c, _CTRL_RE, "")
    c = F.regexp_replace(c, r"[ \t]+", " ")
    c = F.regexp_replace(c, r" ?\n ?", "\n")
    c = F.regexp_replace(c, r"\n{3,}", "\n\n")
    return F.trim(c)


def text_normalize(
    df: DataFrame, text_col: str = "text", out_col: str = "norm_text"
) -> DataFrame:
    """Add the normalized text plus a ``changed`` flag (did any rule fire).

    Pure narrow projection — composes with any upstream scan without
    adding a stage boundary.
    """
    norm = normalize_text_expr(text_col)
    return df.withColumn(out_col, norm).withColumn(
        "changed", F.col(out_col) != F.col(text_col)
    )


# html_extract regex passes, in contract order. No backreferences anywhere:
# script/style get separate passes so every pattern is RE2-legal and the
# DuckDB oracle can run the identical chain. Entities decode AFTER tag
# stripping (decoding "&lt;b&gt;" first would fabricate tags) and "&amp;"
# decodes last (so "&amp;lt;" correctly yields the literal text "&lt;").
_HTML_TAG_PASSES: list[tuple[str, str]] = [
    (r"(?is)<script[^>]*>.*?</script>", ""),
    (r"(?is)<style[^>]*>.*?</style>", ""),
    (r"(?is)<title[^>]*>.*?</title>", ""),
    (r"(?s)<!--.*?-->", ""),
    (r"(?i)<(?:br|/p|/div|/h[1-6]|/li|/tr|/table|/ul|/ol)[^>]*>", "\n"),
    (r"(?s)<[^>]*>", ""),
]
_HTML_ENTITIES: list[tuple[str, str]] = [
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
]


def html_extract_expr(col: str | Column) -> Column:
    """HTML -> text extraction as one chain of JVM column expressions.

    The WET-record step of a crawl pipeline (what Common Crawl's WARC->WET
    conversion and trafilatura/jusText approximate with full parsers),
    re-expressed as a fixed regex contract so it stays zero-shuffle,
    whole-stage-codegen, and byte-identical in the DuckDB oracle: drop
    script/style bodies and comments, turn block-level closers into
    newlines, strip remaining tags, decode the six common entities, then
    the same whitespace squeeze as :func:`normalize_text_expr`. A real
    HTML5 tree parser is out of scope by design — malformed nesting (an
    unclosed ``<script>``) degrades to tag-stripping its body rather than
    erroring, which is the right failure mode mid-pipeline.
    """
    c = F.col(col) if isinstance(col, str) else col
    for pat, rep in _HTML_TAG_PASSES:
        c = F.regexp_replace(c, pat, rep)
    for ent, ch in _HTML_ENTITIES:
        c = F.replace(c, F.lit(ent), F.lit(ch))
    c = F.regexp_replace(c, r"[ \t]+", " ")
    c = F.regexp_replace(c, r" ?\n ?", "\n")
    c = F.regexp_replace(c, r"\n{3,}", "\n\n")
    # full whitespace trim (trim() strips spaces only — block closers leave
    # a trailing newline behind otherwise)
    return F.regexp_replace(c, r"^\s+|\s+$", "")


def html_extract(
    df: DataFrame, html_col: str = "html", out_col: str = "text"
) -> DataFrame:
    """Add extracted plain text next to the raw HTML column.

    Pure narrow projection (zero shuffle, no stage boundary), like
    :func:`text_normalize`; ``n_chars_html``/``n_chars_text`` ride along so
    a downstream quality filter can cut on markup ratio without re-reading
    the HTML.
    """
    return (
        df.withColumn(out_col, html_extract_expr(html_col))
        .withColumn("n_chars_html", F.coalesce(F.length(html_col), F.lit(0)))
        .withColumn("n_chars_text", F.coalesce(F.length(out_col), F.lit(0)))
    )


def boilerplate_rm(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_df: int = 100,
    sep: str = "\n",
    inplace: bool = False,
) -> DataFrame:
    """Remove lines shared by more than ``max_df`` distinct documents.
    ``inplace=True`` returns ALL caller columns with ``text_col`` rewritten
    (plus the stat columns) — the pipeline variant that avoids a second
    id-join to glue clean text back.

    Returns one row per input document: (id, clean_text, n_removed,
    n_lines). Documents whose every line is boilerplate come back with
    ``clean_text = ''`` rather than vanishing, as do NULL-text documents.
    Blank/whitespace-only lines are never treated as boilerplate (they are
    paragraph separators; dropping them corpus-wide would merge every
    paragraph in every document).

    ``sep`` is used both as the split REGEX and the re-join literal, so it
    must be a regex-neutral string (the default newline is; a "." would
    split on every char while joining with a literal dot).

    ``max_df`` is an absolute doc-frequency cutoff; pick it as a fraction
    of corpus size (CCNet drops paragraphs above ~0.01% df). The hot-line
    set is bounded by total_lines / max_df regardless of corpus size,
    which is what makes the broadcast join below safe at 10^12 docs.
    """
    # NULL text coalesces to '' so the doc still yields one (empty) line
    # and survives to the output; blank/whitespace-only lines are exempt
    # from the hot set — they are paragraph separators, not boilerplate,
    # and stripping them corpus-wide would merge every paragraph.
    lines = df.select(
        F.col(id_col),
        F.posexplode(
            F.split(F.coalesce(F.col(text_col), F.lit("")), sep)
        ).alias("pos", "line"),
    )
    # df-count per line HASH: the shuffle for this aggregate carries
    # (8-byte hash, id) pairs, never the line text. countDistinct expands
    # to the standard two-phase partial-distinct plan.
    hot = (
        lines.filter(F.trim("line") != "")
        .groupBy(F.xxhash64("line").alias("_lh"))
        .agg(F.count_distinct(id_col).alias("_df"))
        .filter(F.col("_df") > max_df)
        .select("_lh", F.lit(True).alias("_hot"))
    )
    # only the HOT (id, pos) int pairs leave the flagging join; they fold
    # to one thin (id, array<int>) row per affected doc and the rewrite
    # happens on the original document row — line TEXT never crosses an
    # exchange in this operator (the previous shape re-grouped the exploded
    # line text per doc: one corpus-text exchange + a per-doc sort).
    drop_tbl = (
        lines.withColumn("_lh", F.xxhash64("line"))
        .join(F.broadcast(hot), "_lh")
        .groupBy(id_col)
        .agg(F.collect_set("pos").alias("_drop_pos"))
    )
    dp = F.coalesce(F.col("_drop_pos"), F.array().cast("array<int>"))
    lines_arr = F.split(F.coalesce(F.col(text_col), F.lit("")), sep)
    kept = F.filter(lines_arr, lambda l, i: ~F.array_contains(dp, i))
    joined = df.join(drop_tbl, id_col, "left")
    out_cols = [
        F.array_join(kept, sep).alias("clean_text" if not inplace else text_col),
        F.size(dp).alias("n_removed"),
        F.size(lines_arr).alias("n_lines"),
    ]
    if inplace:
        return joined.select(
            *[c for c in df.columns if c != text_col], *out_cols
        )
    return joined.select(F.col(id_col), *out_cols)


def compression_ratio(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "zlib_ratio",
    level: int = 6,
) -> DataFrame:
    """Per-document zlib compression ratio ``compressed_bytes / raw_bytes``
    (floor-rounded 4 dp) — the classic machine-generated/templated-spam
    detector (highly repetitive pages compress far below natural text;
    used as a quality feature by CCNet-family pipelines and the Common
    Crawl spam heuristics). Empty/NULL text gets ratio 1.0 (neutral).

    Python IS the right path here (documented exception to the
    codegen-first rule): the JVM SQL surface has no DEFLATE, and the
    signal is byte-level — an Arrow-batched pandas UDF over utf-8 bytes,
    row-local, zero shuffle, no state. Determinism note: byte-exact for a
    fixed zlib/level, so tests pin same-process; the driver oracle
    recomputes independently from the raw parquet with the same stdlib.
    """
    from pyspark.sql import types as T

    @F.pandas_udf(T.DoubleType())
    def ratio(texts):
        import math
        import zlib

        import pandas as pd

        def one(t):
            if t is None or t == "":
                return 1.0
            raw = t.encode("utf-8")
            return math.floor(
                len(zlib.compress(raw, level)) / len(raw) * 10000 + 0.5
            ) / 10000

        return pd.Series([one(t) for t in texts])

    return df.withColumn(out_col, ratio(F.col(text_col)))
