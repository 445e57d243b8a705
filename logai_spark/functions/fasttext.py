"""Trained FastText subword skip-gram — torch-free, gensim-free, distributed.

The reference wraps gensim FastText (salesforce/logai
``logai/algorithms/vectorization_algo/fasttext.py:45-117``); its defining
capability over Word2Vec is LEARNED char-ngram vectors, so out-of-vocabulary
words get meaningful embeddings composed from subwords that were themselves
trained by skip-gram gradients (Bojanowski et al., "Enriching Word Vectors
with Subword Information", TACL 2017). Until round 4 this repo shipped only
the composition half (``vectorizers.fasttext_subword_vectors`` averages
*word* vectors per ngram after the fact); this module trains the ngram
vectors directly.

Training scheme — the same data-parallel layout Spark-ML Word2Vec uses
internally (per-partition SGD on a broadcast parameter copy, then a global
weighted average each epoch):

- vocabulary: one distributed ``groupBy`` count, collected to the driver
  (bounded by ``max_vocab``, the standard embedding-training bound — the
  PARAMETER MATRIX must fit on every worker regardless of framework);
- char ngrams of ``<word>`` (FastText boundary markers) are hashed into
  ``bucket`` slots with FNV-1a, exactly fastText's trick for an O(1)-size
  subword table independent of corpus ngram cardinality;
- each epoch, every partition runs skip-gram-with-negative-sampling in
  numpy over its own sentences: the center word's hidden vector is the MEAN
  of its input rows (word row + ngram bucket rows, the fastText convention),
  gradients are split equally across those rows; negatives come from the
  unigram^0.75 table;
- partition results are weighted-averaged on the driver (weights = pairs
  processed) in partition-index order, so a fixed (input, partitioning,
  seed) is bit-deterministic — matching Spark-ML Word2Vec, which is likewise
  deterministic per layout but not across different parallelism.

Scale notes: the corpus is never collected — only (V + bucket) x dim
matrices move (broadcast out, one copy per partition back; ~6 MB at the
defaults). Per-epoch cost is one pass over the corpus, embarrassingly
parallel. The python pair loop is per-partition CPU, amortized across
executors; fit-time token volume should be capped by the caller the same way
the reference caps gensim fit time (it trains on the driver on the WHOLE
corpus — this is strictly more scalable).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def char_ngrams(word: str, min_n: int = 3, max_n: int = 5) -> list[str]:
    """Boundary-marked char ngrams of a word (fastText convention: ngrams
    are drawn from ``<word>`` so prefixes/suffixes are distinguishable)."""
    marked = f"<{word}>"
    out = []
    for n in range(min_n, max_n + 1):
        for i in range(len(marked) - n + 1):
            out.append(marked[i : i + n])
    return out


def ngram_bucket(gram: str, bucket: int) -> int:
    """FNV-1a 32-bit hash mod bucket — fastText's subword hashing
    (deterministic across runs/processes, unlike python's ``hash``)."""
    h = 2166136261
    for b in gram.encode("utf-8"):
        h = ((h ^ b) * 16777619) & 0xFFFFFFFF
    return h % bucket


@dataclass
class FastTextModel:
    """Trained parameters. ``w_in`` rows: [0, V) = word input vectors,
    [V, V+bucket) = ngram bucket vectors. ``w_out`` = context (output)
    vectors, vocab-sized."""

    vocab: list[str]
    counts: np.ndarray
    w_in: np.ndarray
    w_out: np.ndarray
    dim: int
    min_n: int
    max_n: int
    bucket: int

    def word_rows(self, word: str, in_vocab_id: int | None = None) -> np.ndarray:
        v = len(self.vocab)
        rows = [] if in_vocab_id is None else [in_vocab_id]
        rows += [
            v + ngram_bucket(g, self.bucket)
            for g in char_ngrams(word, self.min_n, self.max_n)
        ]
        return np.array(sorted(set(rows)), dtype=np.int64)

    def word_vector(self, word: str) -> np.ndarray | None:
        """Mean of the word's input rows (word row if in vocab + ngram
        buckets) — fastText ``getWordVector``. None only when the word is
        OOV *and* too short to yield a single ngram."""
        try:
            wid = self.vocab.index(word)
        except ValueError:
            wid = None
        rows = self.word_rows(word, wid)
        if len(rows) == 0:
            return None
        return self.w_in[rows].mean(axis=0)


def _build_vocab(
    df: DataFrame, tokens_col: str, min_count: int, max_vocab: int
) -> tuple[list[str], np.ndarray]:
    counts = (
        df.select(F.explode(tokens_col).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= min_count)
        .orderBy(F.desc("n"), "w")
        .limit(max_vocab)
        .collect()
    )
    return [r["w"] for r in counts], np.array([r["n"] for r in counts], dtype=np.float64)


def train_fasttext(
    df: DataFrame,
    tokens_col: str = "tokens",
    dim: int = 16,
    window: int = 5,
    negative: int = 5,
    epochs: int = 3,
    lr: float = 0.05,
    min_count: int = 1,
    min_n: int = 3,
    max_n: int = 5,
    bucket: int = 20_000,
    max_vocab: int = 200_000,
    seed: int = 42,
    num_partitions: int | None = None,
) -> FastTextModel:
    """Train subword skip-gram over a token-array column. See module
    docstring for the distribution scheme and determinism contract.

    ``num_partitions``: coalesce the sentence RDD before training.
    Parameter averaging trades fidelity for parallelism — P partitions
    each take gradient steps from the SAME broadcast snapshot, so on a
    SMALL corpus split P ways every partition sees too few pairs to move
    and the average washes out (identical to Spark-ML Word2Vec's
    numPartitions trade-off, and why its default is 1). Rule of thumb:
    scale partitions with corpus size, not with cluster size."""
    spark = df.sparkSession
    vocab, counts = _build_vocab(df, tokens_col, min_count, max_vocab)
    v = len(vocab)
    if v == 0:
        raise ValueError("empty vocabulary (check tokens_col / min_count)")
    vocab_idx = {w: i for i, w in enumerate(vocab)}
    # per-word input rows (word + hashed ngrams), precomputed once on the
    # driver over the BOUNDED vocab (never per corpus row)
    sub_rows = [
        np.array(
            sorted({i} | {v + ngram_bucket(g, bucket) for g in char_ngrams(w, min_n, max_n)}),
            dtype=np.int64,
        )
        for i, w in enumerate(vocab)
    ]
    # unigram^0.75 negative-sampling CDF
    p = counts ** 0.75
    neg_cdf = np.cumsum(p / p.sum())

    rng0 = np.random.default_rng(seed)
    w_in = ((rng0.random((v + bucket, dim)) - 0.5) / dim).astype(np.float64)
    w_out = np.zeros((v, dim), dtype=np.float64)

    sents_rdd = df.select(F.col(tokens_col).alias("_t")).rdd.map(lambda r: r["_t"])
    if num_partitions is not None:
        sents_rdd = sents_rdd.coalesce(num_partitions)
    sents_rdd = sents_rdd.cache()
    sc = spark.sparkContext
    vocab_b = sc.broadcast(vocab_idx)
    rows_b = sc.broadcast(sub_rows)
    cdf_b = sc.broadcast(neg_cdf)

    for epoch in range(epochs):
        alpha = max(lr * (1.0 - epoch / max(epochs, 1)), lr * 1e-2)
        win_b = sc.broadcast(w_in)
        wout_b = sc.broadcast(w_out)

        def _part(pidx, it, _epoch=epoch, _alpha=alpha):
            rng = np.random.default_rng((seed, _epoch, pidx))
            vi = vocab_b.value
            rows_tab = rows_b.value
            cdf = cdf_b.value
            win = win_b.value.copy()
            wout = wout_b.value.copy()
            n_pairs = 0
            for sent in it:
                if not sent:
                    continue
                ids = [vi[t] for t in sent if t in vi]
                k = len(ids)
                for pos in range(k):
                    c = ids[pos]
                    b = int(rng.integers(1, window + 1))
                    lo, hi = max(0, pos - b), min(k, pos + b + 1)
                    crows = rows_tab[c]
                    nr = len(crows)
                    for j in range(lo, hi):
                        if j == pos:
                            continue
                        ctx = ids[j]
                        negs = np.searchsorted(cdf, rng.random(negative))
                        negs = negs[negs != ctx]
                        targets = np.concatenate(([ctx], negs))
                        labels = np.zeros(len(targets))
                        labels[0] = 1.0
                        h = win[crows].mean(axis=0)
                        scores = 1.0 / (1.0 + np.exp(-wout[targets] @ h))
                        g = (labels - scores) * _alpha
                        grad_h = g @ wout[targets]
                        wout[targets] += np.outer(g, h)
                        win[crows] += grad_h / nr
                        n_pairs += 1
            if n_pairs:
                yield pidx, n_pairs, win.tobytes(), wout.tobytes()

        parts = sents_rdd.mapPartitionsWithIndex(_part).collect()
        win_b.destroy()
        wout_b.destroy()
        if not parts:
            break
        parts.sort(key=lambda t: t[0])
        total = float(sum(t[1] for t in parts))
        w_in = np.zeros_like(w_in)
        w_out = np.zeros_like(w_out)
        for _, n, wi, wo in parts:
            w_in += (n / total) * np.frombuffer(wi).reshape(w_in.shape)
            w_out += (n / total) * np.frombuffer(wo).reshape(w_out.shape)
    sents_rdd.unpersist()
    for b in (vocab_b, rows_b, cdf_b):
        b.destroy()
    return FastTextModel(
        vocab=vocab, counts=counts, w_in=w_in, w_out=w_out,
        dim=dim, min_n=min_n, max_n=max_n, bucket=bucket,
    )


def fasttext_vectors_df(model: FastTextModel, spark) -> DataFrame:
    """(word, vector) table for the trained vocabulary — same shape as
    ``Word2VecModel.getVectors()`` after vector_to_array, so it drops into
    ``word2vec_transform`` and every downstream consumer unchanged."""
    rows = [
        (w, [float(x) for x in model.w_in[model.word_rows(w, i)].mean(axis=0)])
        for i, w in enumerate(model.vocab)
    ]
    return spark.createDataFrame(rows, "word string, vector array<double>")


def fasttext_oov_vectors_df(
    words: DataFrame, model: FastTextModel, word_col: str = "word"
) -> DataFrame:
    """Compose vectors for ARBITRARY words (the fastText OOV capability)
    from the trained ngram-bucket table, distributed: the (bucket x dim)
    slab broadcasts once, an Arrow-batched pandas iterator does the ngram
    hashing + row means per batch — no per-row Python UDF, no collect of
    the word table. Words too short for a single ngram get a NULL vector
    (callers must never lose words silently)."""
    import pandas as pd

    spark = words.sparkSession
    v = len(model.vocab)
    vocab_idx = {w: i for i, w in enumerate(model.vocab)}
    win_b = spark.sparkContext.broadcast(model.w_in)
    vi_b = spark.sparkContext.broadcast(vocab_idx)
    min_n, max_n, bucket = model.min_n, model.max_n, model.bucket

    def _batches(it):
        win = win_b.value
        vi = vi_b.value
        for pdf in it:
            vecs = []
            for w in pdf[word_col]:
                wid = vi.get(w)
                rows = [] if wid is None else [wid]
                rows += [v + ngram_bucket(g, bucket) for g in char_ngrams(w, min_n, max_n)]
                rows = sorted(set(rows))
                vecs.append(
                    None if not rows else [float(x) for x in win[np.array(rows)].mean(axis=0)]
                )
            yield pd.DataFrame({word_col: pdf[word_col], "vector": vecs})

    out_schema = f"{word_col} string, vector array<double>"
    return words.select(word_col).distinct().mapInPandas(_batches, out_schema)
