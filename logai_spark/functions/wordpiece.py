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
  chars, optional lowercasing — the whitespace set is written as the
  EXPLICIT char class ``[ \\t\\n\\x0B\\f\\r]`` (Java's default ``\\s``),
  never as ``\\s`` itself: Python ``\\s`` matches Unicode whitespace
  (U+00A0, U+2028, U+3000, ...) while Java's is ASCII-only, so a bare
  ``\\s`` silently diverges between the Spark path and the Python
  replica on any corpus with Unicode whitespace. Explicit chars are
  expressible identically in both engines, unlike BertPreTokenizer's
  Unicode punctuation classes.
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

PRETOKEN_RE = "[A-Za-z0-9]+|[^ \\t\\n\\x0B\\f\\rA-Za-z0-9]"
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

    # Incremental trainer state, built once: recomputing sym/pair counts
    # from every word's full symbol sequence on every merge is
    # O(merges x total symbols) driver work — hours at the shipped
    # defaults (vocab 5000, 1M words). Only words containing the merged
    # pair change, so counts are maintained by per-word deltas (the
    # standard incremental BPE/WordPiece trainer); best-pair selection is
    # a single O(distinct pairs) scan per merge, no sort.
    sym_count: dict[str, int] = {}
    pair_count: dict[tuple[str, str], int] = {}
    # pair -> words that contained it when last touched (lazily cleaned:
    # membership may be stale after other merges re-segment a word).
    pair_words: dict[tuple[str, str], set[str]] = {}
    for w, n in words.items():
        seq = segs[w]
        for s in seq:
            sym_count[s] = sym_count.get(s, 0) + n
        for p in zip(seq, seq[1:]):
            pair_count[p] = pair_count.get(p, 0) + n
            pair_words.setdefault(p, set()).add(w)

    while len(vocab) < vocab_size:
        best, best_score, best_c = None, -1.0, -1
        for (a, b), c in pair_count.items():
            if c <= 0:
                continue
            tok = pair_merge(a, b)
            if tok in have:
                continue
            score = c / (sym_count[a] * sym_count[b])
            # deterministic total order: higher score, then higher pair
            # count, then lexicographically smallest merged token, then
            # smallest (a, b) — two distinct pairs CAN merge to the same
            # token, and the final key makes the winner independent of
            # dict iteration order (matches the previous sorted() scan).
            if (
                score > best_score
                or (score == best_score and c > best_c)
                or (score == best_score and c == best_c and tok < best[2])
                or (
                    score == best_score
                    and c == best_c
                    and tok == best[2]
                    and (a, b) < (best[0], best[1])
                )
            ):
                best, best_score, best_c = (a, b, tok), score, c
        if best is None:
            break
        a, b, tok = best
        vocab.append(tok)
        have.add(tok)
        for w in sorted(pair_words.get((a, b), ())):
            seq = segs[w]
            # stale membership: the word may have been re-segmented by a
            # later merge and no longer contain (a, b)
            if not any(
                seq[i] == a and seq[i + 1] == b for i in range(len(seq) - 1)
            ):
                continue
            n = words[w]
            for s in seq:
                sym_count[s] -= n
            for p in zip(seq, seq[1:]):
                pair_count[p] -= n
            out, i = [], 0
            while i < len(seq):
                if i + 1 < len(seq) and seq[i] == a and seq[i + 1] == b:
                    out.append(tok)
                    i += 2
                else:
                    out.append(seq[i])
                    i += 1
            segs[w] = out
            for s in out:
                sym_count[s] = sym_count.get(s, 0) + n
            for p in zip(out, out[1:]):
                pair_count[p] = pair_count.get(p, 0) + n
                pair_words.setdefault(p, set()).add(w)
        pair_count.pop((a, b), None)
        pair_words.pop((a, b), None)
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
