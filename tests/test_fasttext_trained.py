"""Trained FastText subword skip-gram (functions/fasttext.py).

Covers what the round-3 composition approximation could not: ngram vectors
are LEARNED by skip-gram gradients, so (a) words sharing contexts embed
close, (b) OOV morphological variants land near their stems via shared
ngram buckets, (c) training is deterministic for a fixed (input,
partitioning, seed) — the same contract Spark-ML Word2Vec gives.

Reference behavioral contract: salesforce/logai fasttext.py:45-117 (gensim
FastText fit/transform); this trainer is a from-scratch distributed
re-expression, not a port.
"""

import numpy as np
import pandas as pd
import pytest

from logai_spark.functions.fasttext import (
    FastTextModel,
    char_ngrams,
    fasttext_oov_vectors_df,
    fasttext_vectors_df,
    ngram_bucket,
    train_fasttext,
)


def _cos(a, b):
    a, b = np.asarray(a, float), np.asarray(b, float)
    return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))


def _corpus(spark, n=60):
    """Two interchangeable verb groups in disjoint contexts: {open, close}
    act on files, {eat, drink} on foods — skip-gram should pull each pair
    together and push the groups apart."""
    sents = []
    for i in range(n):
        f = ["alpha.txt", "beta.log", "gamma.cfg"][i % 3]
        food = ["bread", "water", "apple"][i % 3]
        sents.append(["user", "open" if i % 2 else "close", "file", f])
        sents.append(["guest", "eat" if i % 2 else "drink", "some", food])
    return spark.createDataFrame(
        pd.DataFrame({"tokens": sents}), "tokens array<string>"
    )


def test_ngram_helpers():
    assert char_ngrams("ab", 3, 4) == ["<ab", "ab>", "<ab>"]
    assert char_ngrams("a", 5, 5) == []  # too short for one ngram
    b = ngram_bucket("<re", 1000)
    assert 0 <= b < 1000
    assert b == ngram_bucket("<re", 1000)  # FNV is process-stable


def test_trained_embedding_semantics(spark):
    df = _corpus(spark)
    m = train_fasttext(df, dim=12, epochs=10, window=3, bucket=2000, seed=7,
                       lr=0.1, num_partitions=2)
    vo, vc = m.word_vector("open"), m.word_vector("close")
    ve, vd = m.word_vector("eat"), m.word_vector("drink")
    same1, same2 = _cos(vo, vc), _cos(ve, vd)
    cross = max(_cos(vo, ve), _cos(vo, vd), _cos(vc, ve), _cos(vc, vd))
    assert same1 > cross and same2 > cross


def test_oov_composition_from_learned_ngrams(spark):
    df = _corpus(spark)
    m = train_fasttext(df, dim=12, epochs=10, window=3, bucket=2000, seed=7,
                       lr=0.1, num_partitions=2)
    # 'opens' never occurs; its ngrams (<op, ope, pen, ...) were trained as
    # part of 'open' and must dominate its composed vector
    v_oov = m.word_vector("opens")
    assert v_oov is not None
    assert _cos(v_oov, m.word_vector("open")) > _cos(v_oov, m.word_vector("drink"))


def test_determinism_fixed_layout(spark):
    df = _corpus(spark, n=20).repartition(4).cache()
    m1 = train_fasttext(df, dim=8, epochs=2, bucket=500, seed=11)
    m2 = train_fasttext(df, dim=8, epochs=2, bucket=500, seed=11)
    assert m1.vocab == m2.vocab
    np.testing.assert_array_equal(m1.w_in, m2.w_in)
    np.testing.assert_array_equal(m1.w_out, m2.w_out)
    m3 = train_fasttext(df, dim=8, epochs=2, bucket=500, seed=12)
    assert not np.array_equal(m1.w_in, m3.w_in)
    df.unpersist()


def test_vectors_df_and_oov_df(spark):
    df = _corpus(spark, n=10)
    m = train_fasttext(df, dim=6, epochs=1, bucket=300, seed=3)
    vecs = fasttext_vectors_df(m, spark).toPandas()
    assert set(vecs["word"]) == set(m.vocab)
    assert all(len(v) == 6 for v in vecs["vector"])
    # df path == driver helper for an in-vocab word
    got = dict(zip(vecs["word"], vecs["vector"]))["open"]
    np.testing.assert_allclose(got, m.word_vector("open"), rtol=1e-12)

    words = spark.createDataFrame(pd.DataFrame({"word": ["opens", "open", "zz"]}))
    oov = fasttext_oov_vectors_df(words, m).toPandas()
    by_w = dict(zip(oov["word"], oov["vector"]))
    assert len(by_w) == 3 and all(v is not None for v in by_w.values())
    np.testing.assert_allclose(by_w["open"], m.word_vector("open"), rtol=1e-12)


def test_oov_too_short_is_null(spark):
    m = FastTextModel(
        vocab=["abc"], counts=np.array([1.0]),
        w_in=np.zeros((1 + 10, 4)), w_out=np.zeros((1, 4)),
        dim=4, min_n=6, max_n=6, bucket=10,
    )
    # 'zz' -> '<zz>' has 4 chars < min_n 6: no ngrams, OOV -> NULL vector
    assert m.word_vector("zz") is None
    words = spark.createDataFrame(pd.DataFrame({"word": ["zz"]}))
    row = fasttext_oov_vectors_df(words, m).collect()[0]
    assert row["vector"] is None


def test_factory_trained_fasttext(spark):
    from logai_spark.plans.factory import factory

    lines = spark.createDataFrame(
        pd.DataFrame({"doc_id": list(range(12)),
                      "logline": ["reading logs fast", "reader of logs"] * 6})
    )
    algo = factory.get_algorithm(
        "vectorization", "fasttext",
        factory.get_config("vectorization", "fasttext",
                           {"dim": 4, "epochs": 2, "bucket": 500}),
    )
    algo.fit(lines, "logline")
    assert algo.model is not None  # trained path is the default
    out = algo.transform(lines, "logline", "doc_id").toPandas()
    assert len(out) == 12
    assert all(len(v) == 12 for v in out["log_vector"])  # 3 tokens x 4 dims
    oov = algo.oov_vectors(
        spark.createDataFrame(pd.DataFrame({"word": ["reads"]}))
    ).collect()
    assert len(oov) == 1 and len(oov[0]["vector"]) == 4


def test_empty_vocab_raises(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"tokens": [[], []]}), "tokens array<string>"
    )
    with pytest.raises(ValueError, match="empty vocabulary"):
        train_fasttext(df)
