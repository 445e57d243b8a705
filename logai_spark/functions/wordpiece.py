"""Distributed WordPiece subword tokenizer training + encoding, torch-free.

Reference behavioral contract: LogAI's LogBERT vectorizer trains a
HuggingFace WordPiece tokenizer over the log corpus
(vectorization_algo/logbert.py:87-146: ``models.WordPiece`` +
``trainers.WordPieceTrainer(vocab_size, special_tokens)`` with
``BertPreTokenizer`` and the ``##`` continuation prefix; see also
nn_model/logbert/tokenizer_utils.py). This module re-expresses that
training Spark-first:

- The DATA-SIZED step — counting distinct pre-tokens over the corpus — is
  a partial-aggregatable ``groupBy(word).count()``: at 10^12 docs the
  shuffle carries one row per distinct word per map partition, and the
  result is the (bounded) vocabulary-candidate table, optionally truncated
  to the ``max_words`` most frequent words (log/web corpora concentrate
  token mass heavily; the cut is on the count-ordered aggregate, one
  TakeOrdered).
- The merge-learning LOOP runs on that aggregate on the driver — exactly
  what HuggingFace's trainer does internally (``train_from_iterator``
  first reduces the corpus to word counts, then loops over pair scores);
  the loop's cost is O(vocab_size * distinct_words) and independent of
  corpus size, so distributing it would only add round-trips.
- ENCODING is distributed again: greedy longest-match-first WordPiece over
  each pre-token with the trained vocab broadcast to executors, memoized
  per distinct word inside each Arrow batch.

Semantics (documented deviations from HF, all deliberate):
- Pre-tokenization: ``[A-Za-z0-9]+`` words plus single non-ASCII-word
  chars (``[^\\sA-Za-z0-9]``), optional lowercasing — expressible
  identically in Java regex (Spark side) and Python ``re`` (replica side),
  unlike BertPreTokenizer's Unicode punctuation classes.
- Merge scoring: the WordPiece objective score(a,b) = count(ab) /
  (count(a)*count(b)); ties break on (higher pair count, lexicographically
  smaller merged token) so training is fully deterministic regardless of
  hash/iteration order.
- Unknown handling: a word that cannot be fully segmented becomes
  ``[UNK]`` (HF WordPiece semantics: no partial fallback).
"""

from __future__ import annotations

import re
from typing import Iterable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

PRETOKEN_RE = "[A-Za-z0-9]+|[^\\sA-Za-z0-9]"
SPECIAL_TOKENS = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"]
UNK = "[UNK]"
CONT = "##"


def pretokenize_expr(text_col: str, lowercase: bool = True):
    """Spark-side pre-tokenizer: array of pre-tokens per row (JVM regex,
    zero Python)."""
    col = F.lower(F.col(text_col)) if lowercase else F.col(text_col)
    return F.regexp_extract_all(col, F.lit(PRETOKEN_RE), F.lit(0))


def pretokenize_py(text: str, lowercase: bool = True) -> list[str]:
    """The identical pre-tokenizer in pure Python (oracle replica side)."""
    if text is None:
        return []
    if lowercase:
        text = text.lower()
    return re.findall(PRETOKEN_RE, text)


def word_counts(
    df: DataFrame,
    text_col: str = "text",
    lowercase: bool = True,
    max_words: int | None = None,
) -> DataFrame:
    """(word, n) over the corpus — the only corpus-sized stage of training.
    ``max_words`` keeps the top-N by (count desc, word asc): a bounded,
    deterministic candidate table at any corpus size."""
    out = (
        df.select(F.explode(pretokenize_expr(text_col, lowercase)).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    if max_words is not None:
        out = out.orderBy(F.col("n").desc(), F.col("word")).limit(max_words)
    return out


def train_wordpiece_from_counts(
    counts: Iterable[tuple[str, int]],
    vocab_size: int = 5000,
    special_tokens: list[str] | None = None,
    min_frequency: int = 1,
) -> list[str]:
    """Learn a WordPiece vocabulary from a (word, count) aggregate.

    Classic WordPiece merge learning (the loop HF's WordPieceTrainer runs
    after reducing the corpus to word counts): start from the character
    alphabet (word-initial chars bare, continuations ``##``-prefixed),
    repeatedly merge the adjacent symbol pair with the highest
    count(ab)/(count(a)*count(b)) score until ``vocab_size`` is reached or
    no pair remains. Returns the vocab as an ordered list: specials,
    alphabet (sorted), then merges in learned order.
    """
    specials = list(special_tokens or SPECIAL_TOKENS)
    words: dict[str, int] = {}
    for w, n in counts:
        if w and n >= min_frequency:
            words[w] = words.get(w, 0) + int(n)

    # each word as its current symbol sequence
    segs: dict[str, list[str]] = {
        w: [w[0]] + [CONT + ch for ch in w[1:]] for w in words
    }
    alphabet = sorted({s for seq in segs.values() for s in seq})
    vocab = list(specials) + [a for a in alphabet if a not in specials]
    have = set(vocab)

    def pair_merge(a: str, b: str) -> str:
        return a + b[len(CONT):] if b.startswith(CONT) else a + b

    while len(vocab) < vocab_size:
        sym_count: dict[str, int] = {}
        pair_count: dict[tuple[str, str], int] = {}
        for w, n in words.items():
            seq = segs[w]
            for s in seq:
                sym_count[s] = sym_count.get(s, 0) + n
            for a, b in zip(seq, seq[1:]):
                pair_count[(a, b)] = pair_count.get((a, b), 0) + n
        best, best_score, best_c = None, -1.0, -1
        for (a, b), c in sorted(pair_count.items()):
            tok = pair_merge(a, b)
            if tok in have:
                continue
            score = c / (sym_count[a] * sym_count[b])
            # deterministic: higher score, then higher pair count, then the
            # lexicographically smallest merged token (the sorted iteration
            # makes 'first seen' == 'smallest (a, b)')
            if (
                score > best_score
                or (score == best_score and c > best_c)
                or (score == best_score and c == best_c and tok < best[2])
            ):
                best, best_score, best_c = (a, b, tok), score, c
        if best is None:
            break
        a, b, tok = best
        vocab.append(tok)
        have.add(tok)
        for w in segs:
            seq = segs[w]
            if len(seq) < 2:
                continue
            out, i = [], 0
            while i < len(seq):
                if i + 1 < len(seq) and seq[i] == a and seq[i + 1] == b:
                    out.append(tok)
                    i += 2
                else:
                    out.append(seq[i])
                    i += 1
            segs[w] = out
    return vocab


def fit_wordpiece(
    df: DataFrame,
    text_col: str = "text",
    vocab_size: int = 5000,
    lowercase: bool = True,
    min_frequency: int = 1,
    max_words: int | None = 1_000_000,
    special_tokens: list[str] | None = None,
) -> list[str]:
    """Distributed fit: corpus-sized word-count aggregate in Spark, merge
    loop on the driver over the (bounded) aggregate."""
    rows = word_counts(df, text_col, lowercase, max_words).collect()
    return train_wordpiece_from_counts(
        ((r["word"], r["n"]) for r in rows),
        vocab_size=vocab_size,
        special_tokens=special_tokens,
        min_frequency=min_frequency,
    )


def encode_word(word: str, vocab: set[str], max_chars: int = 200) -> list[str]:
    """Greedy longest-match-first WordPiece segmentation of one pre-token
    (HF WordPiece inference semantics, incl. whole-word [UNK] fallback and
    the long-word cutoff)."""
    if len(word) > max_chars:
        return [UNK]
    out, start = [], 0
    while start < len(word):
        end = len(word)
        cur = None
        while start < end:
            piece = word[start:end]
            if start > 0:
                piece = CONT + piece
            if piece in vocab:
                cur = piece
                break
            end -= 1
        if cur is None:
            return [UNK]
        out.append(cur)
        start = end
    return out


def wordpiece_encode(
    df: DataFrame,
    vocab: list[str],
    text_col: str = "text",
    out_col: str = "tokens",
    lowercase: bool = True,
) -> DataFrame:
    """Distributed encode: pre-tokenize JVM-side, segment each pre-token
    with the broadcast vocab in an Arrow-batched pandas UDF, memoized per
    distinct word (log/web corpora repeat words heavily). Appends
    ``out_col: array<string>``."""
    spark = df.sparkSession
    bc = spark.sparkContext.broadcast(set(vocab))

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def seg(words_series):
        import pandas as pd

        vset = bc.value
        memo: dict[str, list[str]] = {}

        def run(words):
            if words is None:
                return []
            out = []
            for w in words:
                if w not in memo:
                    memo[w] = encode_word(w, vset)
                out.extend(memo[w])
            return out

        return pd.Series([run(ws) for ws in words_series])

    return df.withColumn(out_col, seg(pretokenize_expr(text_col, lowercase)))


def wordpiece_token_count(
    df: DataFrame,
    vocab: list[str],
    text_col: str = "text",
    out_col: str = "n_wp_tokens",
    lowercase: bool = True,
) -> DataFrame:
    """Per-row count of WordPiece tokens under the trained vocab."""
    enc = wordpiece_encode(df, vocab, text_col, "_wp", lowercase)
    return enc.withColumn(out_col, F.size("_wp").cast("long")).drop("_wp")
