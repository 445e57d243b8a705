"""Vectorizers: sklearn-formula TF-IDF parity (hand-computed), vocab/pad."""

import math

import pandas as pd
import pytest
from pyspark.sql import functions as F

from logai_spark.functions.vectorizers import (
    pad_array,
    semantic_transform,
    semantic_vocab,
    sequential_transform,
    sequential_vocab,
    tfidf_fit,
    tfidf_transform,
)

DOCS = [
    "user login ok",
    "user login failed",
    "disk full on node07",
]


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(
        pd.DataFrame({"doc_id": range(len(DOCS)), "logline": DOCS})
    ).cache()


def test_tfidf_matches_sklearn_formula(spark, docs_df):
    """Reproduce sklearn TfidfVectorizer defaults by hand (tfidf.py:60-85:
    smooth_idf, l2 norm, token_pattern \\w\\w+) and compare exactly."""
    idf_table = tfidf_fit(docs_df)
    idf = {r["token"]: (r["idf"], r["token_idx"]) for r in idf_table.collect()}
    # vocabulary: tokens >=2 chars, sorted; "on" IS a token (len 2)
    expected_vocab = sorted({"user", "login", "ok", "failed", "disk", "full", "on", "node07"})
    assert sorted(idf) == expected_vocab
    n = 3
    # df: user 2, login 2, ok 1, failed 1, disk 1, full 1, on 1, node07 1
    for tok, df_t in [("user", 2), ("login", 2), ("ok", 1), ("node07", 1)]:
        want = math.log((1 + n) / (1 + df_t)) + 1
        assert abs(idf[tok][0] - want) < 1e-12

    out = tfidf_transform(docs_df, idf_table, dense=True).orderBy("doc_id").collect()
    # doc 0: tokens user, login, ok -> weights idf; l2-normalized
    w_user = math.log(4 / 3) + 1
    w_ok = math.log(4 / 2) + 1
    norm = math.sqrt(2 * w_user**2 + w_ok**2)
    dense0 = out[0]["dense"]
    assert abs(dense0[idf["user"][1]] - w_user / norm) < 1e-9
    assert abs(dense0[idf["ok"][1]] - w_ok / norm) < 1e-9
    assert abs(sum(v * v for v in dense0) - 1.0) < 1e-9  # unit norm


def test_tfidf_sparse_and_dense_agree(spark, docs_df):
    idf_table = tfidf_fit(docs_df)
    rows = tfidf_transform(docs_df, idf_table, dense=True).collect()
    for r in rows:
        for i, v in zip(r["indices"], r["values"]):
            assert abs(r["dense"][i] - v) < 1e-12


def test_pad_array(spark):
    df = spark.range(1).select(
        pad_array(F.array(F.lit(1.0), F.lit(2.0)), 4, 0).alias("p4"),
        pad_array(F.array(F.lit(1.0), F.lit(2.0), F.lit(3.0)), 2, 0).alias("p2"),
    )
    row = df.first()
    assert list(row["p4"]) == [1.0, 2.0, 0.0, 0.0]
    assert list(row["p2"]) == [1.0, 2.0]


def test_sequential_vocab_and_transform(spark):
    lines = spark.createDataFrame(
        pd.DataFrame({"logline": ["a x", "b y", "a x"]})
    )
    vocab = sequential_vocab(lines)
    assert {(r["logline"], r["line_id"]) for r in vocab.collect()} == {("a x", 0), ("b y", 1)}
    sessions = spark.createDataFrame(
        pd.DataFrame({"session_text": ["a x [SEP] b y [SEP] zz q"]})
    )
    out = sequential_transform(sessions, vocab, max_len=4).first()
    assert list(out["token_ids"]) == [0, 1, 2, 2]  # OOV=2, padded with OOV


def test_semantic_vocab_and_transform(spark):
    lines = spark.createDataFrame(
        pd.DataFrame({"logline": ["alpha beta", "alpha gamma"]})
    )
    vocab = semantic_vocab(lines)
    ids = {r["token"]: r["token_id"] for r in vocab.collect()}
    assert ids["alpha"] == 0  # most frequent first
    out = semantic_transform(lines, vocab, max_len=3).collect()
    first = [r for r in out if r["logline"] == "alpha beta"][0]
    assert list(first["token_ids"])[0] == 0
    assert len(first["token_ids"]) == 3


def test_distributed_dense_ids_match_global_sort(spark):
    """distributed_dense_ids == row_number over a global sort, at any input
    partitioning (the scale-safe id assigner behind tfidf/sequential vocab)."""
    import pandas as pd

    from logai_spark.preprocess import distributed_dense_ids

    vals = [f"key_{i:05d}" for i in range(0, 5000, 3)]
    import random

    shuffled = vals[:]
    random.Random(7).shuffle(shuffled)
    df = spark.createDataFrame(pd.DataFrame({"k": shuffled})).repartition(7)
    got = {
        r["k"]: r["id"]
        for r in distributed_dense_ids(df, "k", "id", buckets=13).collect()
    }
    expected = {v: i for i, v in enumerate(sorted(vals))}
    assert got == expected
    # different partitioning, same ids
    got2 = {
        r["k"]: r["id"]
        for r in distributed_dense_ids(df.repartition(3), "k", "id", buckets=5).collect()
    }
    assert got2 == expected
