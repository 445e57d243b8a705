"""Web-corpus cleaning operators beyond the reference: the Gopher quality
rule bundle, C4-style span deduplication, the C4 line-level filter, and
token-level exact-substring deduplication.

These implement the published filtering recipes large-scale text pipelines
run before training (Rae et al. 2021 "Scaling Language Models: ... Gopher",
Appendix A; Raffel et al. 2020 "C4" §2.2; Lee et al. 2021 "Deduplicating
Training Data Makes Language Models Better" §4.1) — not anything in
/root/reference, which stops at log analytics. They complete the curation
surface next to textops.quality_score / repetition_stats.

Scale notes are per-function; the common theme is that every Gopher/C4
rule is a row-local zero-shuffle projection, and the window-dedup family
(span_dedup, substring_dedup) shuffles only 16-byte window hashes +
integer positions (never document text) through two linear aggregations.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from logai_spark.functions.textops import round4

# The eight "required words" from Gopher Appendix A.1.1: a document must
# contain at least two of them to pass the stopword rule.
GOPHER_REQUIRED_WORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]

_BULLET_RE = r"^\s*[-*•]"           # -, *, • bullets
_ELLIPSIS_END_RE = r"(\.\.\.|…)\s*$"  # ... or … at end of line


def _words(text: Column) -> Column:
    """Whitespace word split; empty/blank text -> empty array (split('')
    would yield [''], which inflates every count by one)."""
    t = F.trim(text)
    return F.when(F.length(t) == 0, F.array().cast("array<string>")).otherwise(
        F.split(t, r"\s+")
    )


def gopher_rules(
    df: DataFrame,
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_word_ratio: float = 0.1,
    max_bullet_line_frac: float = 0.9,
    max_ellipsis_line_frac: float = 0.3,
    min_alpha_word_frac: float = 0.8,
    min_stopword_hits: int = 2,
) -> DataFrame:
    """Gopher quality-rule bundle (Rae et al. 2021, Appendix A.1.1) as ONE
    zero-shuffle projection: word-count band, mean-word-length band,
    symbol-to-word ratio (# and ellipsis), bullet-start / ellipsis-end line
    fractions, alphabetic-word fraction, and the required-stopword rule.

    Emits the measured statistics (4-dp rounded for engine-stable floats),
    one boolean per rule, and ``gopher_keep`` = AND of all rules, so callers
    can either filter or audit which rule fired. Defaults are the paper's
    published thresholds.

    Scale: pure `pyspark.sql.functions` expressions over each row — no
    shuffle, no UDF, whole-stage codegen end to end; at 100 TB this runs at
    scan speed and pushes nothing to the driver.
    """
    # NULL text behaves as empty (count 0, all rules evaluated) rather than
    # poisoning every downstream column with NULL booleans
    txt = F.coalesce(F.col(text_col), F.lit(""))
    words = _words(txt)
    n_words = F.size(words)
    n_words_nz = F.greatest(n_words, F.lit(1))

    # total non-whitespace chars / word count (sum of word lengths without
    # a higher-order aggregate)
    mean_word_len = round4(F.length(F.regexp_replace(txt, r"\s+", "")) / n_words_nz)

    n_hash = F.coalesce(F.regexp_count(txt, F.lit("#")), F.lit(0))
    n_ellipsis = F.coalesce(
        F.regexp_count(txt, F.lit(r"(\.\.\.|…)")), F.lit(0)
    )
    symbol_word_ratio = round4((n_hash + n_ellipsis) / n_words_nz)

    lines = F.filter(F.split(txt, r"\n"), lambda l: F.length(F.trim(l)) > 0)
    n_lines_nz = F.greatest(F.size(lines), F.lit(1))
    bullet_line_frac = round4(
        F.size(F.filter(lines, lambda l: l.rlike(_BULLET_RE))) / n_lines_nz
    )
    ellipsis_line_frac = round4(
        F.size(F.filter(lines, lambda l: l.rlike(_ELLIPSIS_END_RE))) / n_lines_nz
    )

    alpha_word_frac = round4(
        F.size(F.filter(words, lambda w: w.rlike("[A-Za-z]"))) / n_words_nz
    )

    stop_arr = F.array(*[F.lit(w) for w in GOPHER_REQUIRED_WORDS])
    stopword_hits = F.size(
        F.array_intersect(F.transform(words, F.lower), stop_arr)
    )

    out = (
        df.withColumn("n_words", n_words)
        .withColumn("mean_word_len", mean_word_len)
        .withColumn("symbol_word_ratio", symbol_word_ratio)
        .withColumn("bullet_line_frac", bullet_line_frac)
        .withColumn("ellipsis_line_frac", ellipsis_line_frac)
        .withColumn("alpha_word_frac", alpha_word_frac)
        .withColumn("stopword_hits", stopword_hits)
    )
    rules = {
        "rule_word_count": (F.col("n_words") >= min_words)
        & (F.col("n_words") <= max_words),
        "rule_mean_word_len": (F.col("mean_word_len") >= min_mean_word_len)
        & (F.col("mean_word_len") <= max_mean_word_len),
        "rule_symbol_ratio": F.col("symbol_word_ratio") <= max_symbol_word_ratio,
        "rule_bullet_lines": F.col("bullet_line_frac") <= max_bullet_line_frac,
        "rule_ellipsis_lines": F.col("ellipsis_line_frac")
        <= max_ellipsis_line_frac,
        "rule_alpha_words": F.col("alpha_word_frac") >= min_alpha_word_frac,
        "rule_stopwords": F.col("stopword_hits") >= min_stopword_hits,
    }
    keep = F.lit(True)
    for name, expr in rules.items():
        out = out.withColumn(name, expr)
        keep = keep & F.col(name)
    return out.withColumn("gopher_keep", keep)


# Sentence segmentation shared by span_dedup and its DuckDB oracle: runs of
# non-terminator chars followed by a terminator run (or end of string).
# RE2-safe (no lookaround), so the IDENTICAL pattern text runs in Spark's
# Java regex and DuckDB's RE2.
SENTENCE_RE = r"[^.!?]+(?:[.!?]+|$)"


def span_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    span: int = 3,
) -> DataFrame:
    """C4-style span deduplication (Raffel et al. 2020 §2.2): every
    ``span``-sentence sliding window that occurs more than once in the
    corpus keeps exactly ONE occurrence (the smallest (doc, position) in
    deterministic order); the sentences covered by every other occurrence
    are removed and each document's text is reassembled from its surviving
    sentences in order.

    Returns one row per input document: (id, clean_text, n_sentences,
    n_kept). Documents with fewer than ``span`` sentences (or empty text)
    pass through unchanged.

    Scale shape: the only data that shuffles is (span_md5, id, pos) — a
    16-byte hash plus two integers per span, never document text. Keeper
    election is a partial-aggregatable min(struct(id, pos)) per hash
    (map-side combine collapses corpus-frequent spans before the exchange,
    the same reason exact_dedup scales); removal is an integer anti-join on
    (id, sentence_pos); reassembly is one groupBy(id) whose values are the
    document's own sentences — the same linear footprint as reading the
    corpus. No windows, no driver collect.
    """
    # trim + drop whitespace-only matches BEFORE positions are assigned, so
    # sentence positions and span coverage index the same (non-empty) list
    # NB: the explicit lambda matters — F.trim has an optional second
    # parameter in Spark 4, so passing it bare makes transform() feed the
    # element INDEX as the trim string
    sents = F.filter(
        F.transform(
            F.regexp_extract_all(F.col(text_col), F.lit(SENTENCE_RE), F.lit(0)),
            lambda s: F.trim(s),
        ),
        lambda s: F.length(s) > 0,
    )
    return _window_dedup(df, id_col, sents, span).withColumnRenamed(
        "n_units", "n_sentences"
    )


def substring_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 50,
) -> DataFrame:
    """Token-level exact-substring deduplication (Lee et al. 2021,
    "Deduplicating Training Data Makes Language Models Better", the
    EXACTSUBSTR method of §4.1, re-expressed for a distributed engine):
    every ``window``-token sliding window that occurs more than once in
    the corpus keeps exactly one occurrence — the smallest (doc, position)
    — and the tokens covered by every other occurrence are removed before
    the documents are reassembled. The paper's 50-token threshold is the
    default.

    The paper builds a single suffix array over the concatenated corpus —
    inherently single-machine. The fixed-width rolling-window formulation
    here finds the identical duplicated regions whenever the duplicated
    substring is >= ``window`` tokens (every such region is a union of
    duplicated windows) at the cost of missing shorter matches, and it
    distributes: only (16-byte window hash, id, int position) ever
    shuffles, keeper election is a partial-aggregatable min(struct), and
    removal is an integer anti-join — the same linear-footprint shape as
    span_dedup. Window construction is O(tokens × window) characters per
    document but strictly row-local (no shuffle grows with ``window``).

    Tokens are whitespace runs, case-sensitive (exact-match semantics).
    Returns one row per input document: (id, clean_text, n_tokens,
    n_kept). Documents with fewer than ``window`` tokens pass through
    unchanged.
    """
    toks = F.filter(
        F.split(F.trim(F.coalesce(F.col(text_col), F.lit(""))), r"\s+"),
        lambda t: F.length(t) > 0,
    )
    return _window_dedup(df, id_col, toks, window).withColumnRenamed(
        "n_units", "n_tokens"
    )


def _window_dedup(
    df: DataFrame, id_col: str, units: Column, span: int
) -> DataFrame:
    """Shared machinery for span_dedup / substring_dedup: given an ordered
    per-document unit array (sentences or tokens), remove every unit
    covered by a non-first occurrence of a corpus-duplicated ``span``-unit
    window and reassemble. Returns (id, clean_text, n_units, n_kept)."""
    unit_tbl = df.select(F.col(id_col), F.posexplode(units).alias("pos", "unit"))

    # windows: unit i starts the window covering [i, i+span-1]
    w_ids = F.col(id_col)
    span_tbl = (
        df.select(
            w_ids,
            F.posexplode(
                F.when(
                    F.size(units) >= span,
                    F.transform(
                        F.sequence(F.lit(0), F.size(units) - span),
                        lambda i: F.concat_ws(
                            " ", F.slice(units, i + 1, span)
                        ),
                    ),
                ).otherwise(F.array().cast("array<string>"))
            ).alias("pos", "span_text"),
        )
        .withColumn("span_h", F.md5("span_text"))
        .drop("span_text")
    )

    keepers = span_tbl.groupBy("span_h").agg(
        F.min(F.struct(F.col(id_col), F.col("pos"))).alias("first")
    )
    dropped = (
        span_tbl.join(keepers, "span_h")
        .filter(
            (F.col(id_col) != F.col("first")[id_col])
            | (F.col("pos") != F.col("first.pos"))
        )
        .select(
            F.col(id_col),
            F.explode(
                F.sequence(F.col("pos"), F.col("pos") + (span - 1))
            ).alias("pos"),
        )
        .distinct()
    )

    kept_units = unit_tbl.join(dropped, [id_col, "pos"], "left_anti")
    rebuilt = kept_units.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "unit"))),
                lambda s: s["unit"],
            ),
            " ",
        ).alias("clean_text"),
        F.count("*").alias("n_kept"),
    )
    totals = unit_tbl.groupBy(id_col).agg(F.count("*").alias("n_units"))

    return (
        df.select(id_col)
        .join(totals, id_col, "left")
        .join(rebuilt, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
            F.coalesce("n_units", F.lit(0)).alias("n_units"),
            F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
        )
    )


# C4 §2.2 line filter constants. Terminal punctuation per the paper:
# period, exclamation mark, question mark, or end quotation mark. The
# policy-phrase line removals are the C4-style line filters FineWeb
# carries alongside them (Penedo et al. 2024, C4 filter set).
_TERMINAL_PUNCT_RE = r'[.!?"]$'
C4_POLICY_PHRASES = [
    "terms of use",
    "privacy policy",
    "cookie policy",
    "uses cookies",
]


def line_filter(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_line_words: int = 3,
    min_sentences: int = 5,
    policy_phrases: list[str] | None = None,
) -> DataFrame:
    """C4 line-level filter (Raffel et al. 2020 §2.2): keep only lines
    that end in terminal punctuation, contain at least ``min_line_words``
    words, and mention neither "javascript" nor a policy phrase
    ("terms of use" / "privacy policy" / ... — the C4-style line set
    FineWeb retains); then flag whole documents that contain "lorem
    ipsum" or "{", or whose retained text has fewer than
    ``min_sentences`` sentences.

    Adds to every input row: ``clean_text`` (kept lines joined with
    newlines), ``n_lines`` / ``n_kept_lines``, ``n_sentences`` (sentence
    count of the retained text, SENTENCE_RE semantics shared with
    span_dedup), the doc-level booleans ``has_lorem_ipsum`` /
    ``has_brace`` / ``rule_min_sentences``, and ``c4_keep`` = the AND of
    the doc-level rules — callers filter on ``c4_keep`` or audit which
    rule fired, mirroring gopher_rules.

    Scale: pure `pyspark.sql.functions` expressions over each row — no
    shuffle, no UDF, whole-stage codegen end to end; at 100 TB this runs
    at scan speed (the same zero-shuffle contract as gopher_rules,
    pinned by the plan-shape tests).
    """
    phrases = C4_POLICY_PHRASES if policy_phrases is None else policy_phrases
    txt = F.coalesce(F.col(text_col), F.lit(""))
    lines = F.filter(
        F.transform(F.split(txt, r"\n"), lambda l: F.trim(l)),
        lambda l: F.length(l) > 0,
    )

    def _line_ok(l: Column) -> Column:
        low = F.lower(l)
        ok = (
            l.rlike(_TERMINAL_PUNCT_RE)
            & (F.size(F.split(l, r"\s+")) >= min_line_words)
            & ~low.contains("javascript")
        )
        for p in phrases:
            ok = ok & ~low.contains(p)
        return ok

    kept = F.filter(lines, _line_ok)
    clean = F.array_join(kept, "\n")
    n_sentences = F.size(
        F.filter(
            F.transform(
                F.regexp_extract_all(clean, F.lit(SENTENCE_RE), F.lit(0)),
                lambda s: F.trim(s),
            ),
            lambda s: F.length(s) > 0,
        )
    )

    out = (
        df.withColumn("clean_text", clean)
        .withColumn("n_lines", F.size(lines))
        .withColumn("n_kept_lines", F.size(kept))
        .withColumn("n_sentences", n_sentences)
        .withColumn("has_lorem_ipsum", F.lower(txt).contains("lorem ipsum"))
        .withColumn("has_brace", txt.contains("{"))
        .withColumn(
            "rule_min_sentences", F.col("n_sentences") >= min_sentences
        )
    )
    return out.withColumn(
        "c4_keep",
        F.col("rule_min_sentences")
        & ~F.col("has_lorem_ipsum")
        & ~F.col("has_brace"),
    )
