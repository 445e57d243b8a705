"""Inverted index construction — token -> (df, capped posting list).

The serving-side complement of the curation pipeline: a corpus-wide
inverted index (exact document frequency per token plus the first K doc
ids) is what powers contamination lookups, keyword routing, and corpus
search. The scale hazard is the hot token: at 10^12 documents a stopword's
posting list IS the corpus, so an uncapped ``collect_list`` puts the whole
corpus in one aggregation buffer. Shape here:

- (token, id) pairs dedupe with ONE partial-agg shuffle keyed on the pair
  (``groupBy`` — map-side combine kills the per-doc repeats before the
  exchange);
- exact ``df`` is a second partial agg on the thin pair table (same key
  prefix, so AQE reuses the exchange);
- the POSTING list caps at ``max_postings`` via a rank<=K filter that
  Catalyst rewrites to WindowGroupLimit — every input partition forwards
  at most K ids per token BEFORE the final per-token limit, so no task
  ever buffers a hot token's full posting set;
- postings serialize as a comma-joined string (``array_join``), keeping
  the row engine-portable for the driver's DuckDB oracle and
  Parquet-friendly for the sink.

Reference surface: builder-brief web-pipeline extension; the reference's
only index is its routed per-template table (SURVEY.md §2 "fan-out
routing"), which this generalizes to token granularity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from logai_spark.functions.textops import tokenize_expr


def inverted_index(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_postings: int = 20,
    min_df: int = 1,
) -> DataFrame:
    """(token, df, postings) — exact document frequency and the first
    ``max_postings`` doc ids (ascending) per token; tokens below
    ``min_df`` drop. Tokenization is textops.tokenize_expr (lowercased
    \\w+ runs), identical to the tf-idf / n-gram operators so the index
    is consistent with the rest of the engine.
    """
    pairs = (
        docs.select(
            F.col(id_col).alias("id"),
            F.explode(tokenize_expr(text_col)).alias("token"),
        )
        .groupBy("token", "id")
        .agg(F.count(F.lit(1)).alias("_tf"))
    )
    df_tbl = pairs.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    w = Window.partitionBy("token").orderBy(F.asc("id"))
    top = (
        pairs.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") <= max_postings)
        .groupBy("token")
        .agg(
            F.array_join(
                # sort NUMERICALLY first, stringify after (lexicographic
                # sort would order "10" before "2")
                F.transform(
                    F.sort_array(F.collect_list("id")),
                    lambda x: x.cast("string"),
                ),
                ",",
            ).alias("postings")
        )
    )
    out = df_tbl.join(top, "token")
    if min_df > 1:
        out = out.filter(F.col("df") >= min_df)
    return out
