from logai_spark.functions.textops import (
    token_count,
    quality_score,
    lang_id,
    doc_fingerprint,
    exact_dedup,
    minhash_signatures,
    lsh_duplicate_pairs,
    ngram_jaccard_pairs,
    simhash,
    tokenize_expr,
)
from logai_spark.functions.similarity import (
    cosine_topk,
    lsh_bucket_topk,
    near_dup_pairs,
)

__all__ = [
    "near_dup_pairs",
    "token_count",
    "quality_score",
    "lang_id",
    "doc_fingerprint",
    "exact_dedup",
    "minhash_signatures",
    "lsh_duplicate_pairs",
    "ngram_jaccard_pairs",
    "simhash",
    "tokenize_expr",
    "cosine_topk",
    "lsh_bucket_topk",
]
