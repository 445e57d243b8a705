"""Model/artifact persistence: save + reload reproduces identical outputs
without refitting (resumable-pipeline contract; reference pickles models at
log_parser.py:95-122, semantic.py:67-81 — we use JSON/parquet artifacts)."""

import numpy as np
import pandas as pd
import pytest

from logai_spark.operators.anomaly import (
    Birch,
    IsolationForest,
    LocalOutlierFactor,
    OneClassSVM,
)
from logai_spark.persist import (
    load_model,
    load_table,
    load_templates,
    save_model,
    save_table,
    save_templates,
)


@pytest.fixture()
def X():
    rng = np.random.default_rng(7)
    return np.vstack([rng.normal(0, 1, (200, 3)), [[9.0, 9.0, 9.0]]])


def test_isolation_forest_roundtrip(tmp_path, X):
    m = IsolationForest(n_estimators=30, seed=3).fit(X)
    p = str(tmp_path / "if.json")
    save_model(m, p)
    m2 = load_model(p)
    assert np.array_equal(m.score_samples(X), m2.score_samples(X))
    assert m2.offset == m.offset


def test_lof_roundtrip(tmp_path, X):
    m = LocalOutlierFactor(n_neighbors=10).fit(X)
    p = str(tmp_path / "lof.json")
    save_model(m, p)
    m2 = load_model(p)
    assert np.array_equal(m.score_samples(X), m2.score_samples(X))


def test_ocsvm_roundtrip(tmp_path, X):
    m = OneClassSVM(nu=0.2).fit(X[:80])
    p = str(tmp_path / "ocsvm.json")
    save_model(m, p)
    m2 = load_model(p)
    assert np.array_equal(m.score_samples(X), m2.score_samples(X))


def test_birch_roundtrip(tmp_path, X):
    m = Birch(threshold=1.0, n_clusters=3).fit(X)
    p = str(tmp_path / "birch.json")
    save_model(m, p)
    m2 = load_model(p)
    assert np.array_equal(m.predict(X), m2.predict(X))


def test_templates_roundtrip(tmp_path):
    tpls = [("user * logged in", 120), ("error code *", 7)]
    p = str(tmp_path / "templates.json")
    save_templates(tpls, p)
    assert load_templates(p) == tpls


def test_idf_table_roundtrip_and_rescoring(spark, tmp_path):
    """The fit stage persists its artifact; a fresh transform from the
    reloaded table reproduces the original vectors exactly (resume without
    refit)."""
    from logai_spark.functions.vectorizers import tfidf_fit, tfidf_transform

    docs = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [1, 2, 3],
                "logline": ["alpha beta gamma", "alpha alpha", "beta delta"],
            }
        )
    )
    idf = tfidf_fit(docs, "logline")
    path = str(tmp_path / "idf_parquet")
    save_table(idf, path)
    idf2 = load_table(spark, path)
    a = tfidf_transform(docs, idf, "logline", "doc_id").orderBy("doc_id").collect()
    b = tfidf_transform(docs, idf2, "logline", "doc_id").orderBy("doc_id").collect()
    assert [r.asDict() for r in a] == [r.asDict() for r in b]


def test_drain_templates_resume_rescoring(spark, tmp_path):
    """Mine once, persist the dictionary, reload, and match — identical
    template assignment without re-mining (the parse-stage resume path)."""
    from logai_spark.parse.distributed import match_templates, mine_templates

    lines = [f"job {i} finished ok" for i in range(50)] + [
        f"disk {i} failed hard" for i in range(50)
    ]
    df = spark.createDataFrame(pd.DataFrame({"logline": lines}))
    tpls = mine_templates(df)
    p = str(tmp_path / "drain_templates.json")
    save_templates(tpls, p)
    tpls2 = load_templates(p)
    assert tpls2 == tpls
    a = match_templates(df, templates=tpls).orderBy("logline").collect()
    b = match_templates(df, templates=tpls2).orderBy("logline").collect()
    assert [r["template_id"] for r in a] == [r["template_id"] for r in b]
    assert all(r["template_id"] is not None for r in a)


def test_next_event_model_roundtrip(tmp_path):
    import numpy as np

    from logai_spark.operators.forecast import NextEventModel

    W = np.array([[0, 1, 2], [1, 2, 0], [2, 0, 1]] * 10)
    y = np.array([0, 1, 2] * 10)
    m = NextEventModel(vocab_size=3).fit(W, y, np.ones(len(y)))
    p = str(tmp_path / "ne.json")
    save_model(m, p)
    m2 = load_model(p)
    assert np.array_equal(m.probs(W), m2.probs(W))
