"""Vectorizers: TF-IDF (sklearn-formula parity), sequential, semantic, pad.

Parity targets (/root/reference/logai/algorithms/vectorization_algo/):
- tfidf.py:88-152 — wraps sklearn TfidfVectorizer with defaults
  token_pattern=r"(?u)\\b\\w\\w+\\b", lowercase, smooth_idf, l2 norm.
  sklearn's formula (reproduced explicitly here; sklearn itself is NOT in
  the image): idf(t) = ln((1 + n_docs) / (1 + df(t))) + 1, vec = tf * idf,
  then l2-normalize per document.
- sequential.py:33-103 — logline-string -> dense id vocab; transform splits
  a session string on a separator, maps to ids (OOV -> vocab_size), pads.
- semantic.py:48-228 — token -> id vocab with embeddings; here: token-id
  mapping + pad (embedding training is Spark-ML Word2Vec, see word2vec()).
- pad: utils/functions.py:19-33 (trim/pad to max_len with a fill value).

Everything is explode/groupBy/join/higher-order-function work; the idf map
and vocabularies are broadcast dimension tables, not Python state.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

SKLEARN_TOKEN_PATTERN = r"(?u)\b\w\w+\b"


def _tokens_expr(col: Column, lowercase: bool) -> Column:
    c = F.lower(col) if lowercase else col
    # \w\w+ == tokens of >=2 word chars (sklearn default token_pattern)
    return F.filter(
        F.split(F.regexp_replace(c, r"[^\w]+", " "), " "),
        lambda t: F.length(t) >= 2,
    )


def tfidf_fit(
    df: DataFrame,
    text_col: str = "logline",
    lowercase: bool = True,
    smooth_idf: bool = True,
    min_df: int = 1,
) -> DataFrame:
    """Fit: document frequencies -> idf table [token, idf, token_idx].

    token_idx is the alphabetical vocabulary index (sklearn sorts its
    vocabulary alphabetically), so dense vectors align with the reference.
    """
    n_docs = df.count()
    toks = _tokens_expr(F.col(text_col), lowercase)
    docs = df.select(F.array_distinct(toks).alias("_toks"))
    dfreq = (
        docs.select(F.explode("_toks").alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") >= min_df)
    )
    s = 1 if smooth_idf else 0
    idf = dfreq.withColumn(
        "idf", F.log((F.lit(float(n_docs + s))) / (F.col("df") + s)) + 1.0
    )
    w = Window.orderBy("token")
    return idf.withColumn("token_idx", F.row_number().over(w) - 1)


def tfidf_transform(
    df: DataFrame,
    idf_table: DataFrame,
    text_col: str = "logline",
    id_col: str = "doc_id",
    lowercase: bool = True,
    sublinear_tf: bool = False,
    l2_norm: bool = True,
    dense: bool = False,
) -> DataFrame:
    """Transform: per-doc sparse tfidf as (indices, values) arrays, l2-normed.

    Sparse representation on purpose — the reference densifies
    (tfidf.py:144-146) which SURVEY.md §4 flags as an anti-pattern. Pass
    ``dense=True`` to also emit the dense array (small vocabs only).
    """
    toks = _tokens_expr(F.col(text_col), lowercase)
    exploded = df.select(id_col, F.explode(toks).alias("token")).groupBy(
        id_col, "token"
    ).agg(F.count(F.lit(1)).alias("tf"))
    tf = (
        F.lit(1.0) + F.log("tf") if sublinear_tf else F.col("tf").cast("double")
    )
    scored = exploded.join(F.broadcast(idf_table), "token").select(
        id_col, "token_idx", (tf * F.col("idf")).alias("w")
    )
    per_doc = scored.groupBy(id_col).agg(
        F.sort_array(F.collect_list(F.struct("token_idx", "w"))).alias("_iw")
    )
    indices = F.transform("_iw", lambda s: s["token_idx"])
    values = F.transform("_iw", lambda s: s["w"])
    # keep docs with zero in-vocabulary tokens (empty vector), like sklearn
    all_ids = df.select(id_col).distinct()
    out = (
        all_ids.join(per_doc, id_col, "left")
        .withColumn("_iw", F.coalesce("_iw", F.array()))
        .select(F.col(id_col), indices.alias("indices"), values.alias("values"))
    )
    if l2_norm:
        norm = F.sqrt(
            F.aggregate("values", F.lit(0.0), lambda acc, v: acc + v * v)
        )
        out = out.withColumn(
            "values", F.transform("values", lambda v: v / norm)
        )
    if dense:
        size = idf_table.count()
        m = F.map_from_arrays("indices", "values")
        out = out.withColumn(
            "dense",
            F.transform(
                F.sequence(F.lit(0), F.lit(size - 1)),
                lambda i: F.coalesce(m[i], F.lit(0.0)),
            ),
        )
    return out


def pad_array(col: Column, max_len: int, value: float | int = 0) -> Column:
    """Trim/pad a 1-d array to max_len (utils/functions.py:19-33)."""
    return F.slice(
        F.concat(col, F.array_repeat(F.lit(value), max_len)), 1, max_len
    )


def sequential_vocab(df: DataFrame, line_col: str = "logline") -> DataFrame:
    """Distinct logline -> dense id (sequential.py:33-60); deterministic
    (alphabetical) instead of first-seen order."""
    w = Window.orderBy(line_col)
    return (
        df.select(line_col).distinct().withColumn("line_id", F.row_number().over(w) - 1)
    )


def sequential_transform(
    df: DataFrame,
    vocab: DataFrame,
    session_col: str = "session_text",
    sep: str = " [SEP] ",
    max_len: int = 10,
    line_col: str = "logline",
) -> DataFrame:
    """Split a session string on the separator, map each line to its vocab id
    (OOV -> vocab size), pad to max_len (sequential.py:82-103).

    The vocab is broadcast as a map expression — no Python UDF.
    """
    rows = vocab.collect()
    oov = len(rows)
    pairs = []
    for r in rows:
        pairs.extend([F.lit(r[line_col]), F.lit(r["line_id"])])
    vmap = F.create_map(*pairs) if pairs else F.create_map()
    import re as _re

    ids = F.transform(
        F.split(F.col(session_col), _re.escape(sep)),
        lambda x: F.coalesce(vmap[x], F.lit(oov)),
    )
    return df.withColumn("token_ids", pad_array(ids, max_len, oov))


def semantic_vocab(
    df: DataFrame, line_col: str = "logline", min_count: int = 1
) -> DataFrame:
    """Token -> dense id over whitespace tokens (semantic.py:83-113),
    frequency-filtered, deterministic order (count desc, token)."""
    toks = F.split(F.trim(F.col(line_col)), r"\s+")
    counts = (
        df.select(F.explode(toks).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") >= min_count)
    )
    w = Window.orderBy(F.desc("cnt"), "token")
    return counts.withColumn("token_id", F.row_number().over(w) - 1)


def semantic_transform(
    df: DataFrame,
    vocab: DataFrame,
    line_col: str = "logline",
    max_len: int = 10,
) -> DataFrame:
    """Map tokens to ids (OOV -> vocab size), pad (semantic.py:209-228)."""
    rows = vocab.collect()
    oov = len(rows)
    pairs = []
    for r in rows:
        pairs.extend([F.lit(r["token"]), F.lit(r["token_id"])])
    vmap = F.create_map(*pairs) if pairs else F.create_map()
    ids = F.transform(
        F.split(F.trim(F.col(line_col)), r"\s+"),
        lambda t: F.coalesce(vmap[t], F.lit(oov)),
    )
    return df.withColumn("token_ids", pad_array(ids, max_len, oov))


def word2vec_embeddings(
    df: DataFrame,
    tokens_col: str = "tokens",
    dim: int = 16,
    min_count: int = 1,
    seed: int = 42,
):
    """Spark-ML Word2Vec (JVM) replacing the reference's gensim dependency
    (word2vec.py:37-102). Returns (model, vectors DataFrame[word, vector])."""
    from pyspark.ml.feature import Word2Vec

    w2v = Word2Vec(
        vectorSize=dim,
        minCount=min_count,
        seed=seed,
        inputCol=tokens_col,
        outputCol="_w2v",
    )
    model = w2v.fit(df)
    return model, model.getVectors()
