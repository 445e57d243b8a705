"""Round-2 additions: Birch clusterer, Holt-Winters ETS, camelCase/digit
tokenizers, semantic embedding matrix, FastText-style subword vectors."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from logai_spark.operators.anomaly import (
    Birch,
    birch_fit_predict,
    detect_anomalies_per_series,
)


# ---------------------------------------------------------------------------
# Birch
# ---------------------------------------------------------------------------


def _blobs(seed=0, n=100):
    rng = np.random.default_rng(seed)
    a = rng.normal((0, 0), 0.3, (n, 2))
    b = rng.normal((5, 5), 0.3, (n, 2))
    c = rng.normal((0, 6), 0.3, (n, 2))
    return np.vstack([a, b, c])


def test_birch_separates_blobs():
    X = _blobs()
    m = Birch(threshold=1.0, n_clusters=3).fit(X)
    labels = m.predict(X)
    # each blob maps to exactly one label, and the three labels differ
    l0, l1, l2 = (set(labels[i * 100:(i + 1) * 100]) for i in range(3))
    assert len(l0) == len(l1) == len(l2) == 1
    assert len(l0 | l1 | l2) == 3


def test_birch_subcluster_mode_without_global_k():
    """n_clusters=None -> labels are subcluster indices (sklearn semantics,
    reference birch.py default n_clusters=None)."""
    X = _blobs()
    m = Birch(threshold=1.0, n_clusters=None).fit(X)
    labels = m.predict(X)
    assert labels.max() + 1 == len(m.centroids())


def test_birch_partial_fit_incremental():
    X = _blobs()
    m = Birch(threshold=1.0, n_clusters=3)
    m.partial_fit(X[:150])
    m.partial_fit(X[150:])
    assert len(set(m.predict(X))) == 3


def test_birch_spark_fit_predict(spark):
    X = _blobs(seed=1)
    pdf = pd.DataFrame(X, columns=["f0", "f1"])
    pdf["row"] = range(len(pdf))
    df = spark.createDataFrame(pdf)
    out = birch_fit_predict(df, ["f0", "f1"], "row", threshold=1.0, n_clusters=3)
    got = out.toPandas().sort_values("row")
    assert got["cluster_id"].nunique() == 3
    # same-blob rows agree on their label
    assert got["cluster_id"].iloc[:100].nunique() == 1


def test_birch_factory_registration(spark):
    from logai_spark.plans.factory import factory

    assert "birch" in factory.names("clustering")
    algo = factory.get_algorithm(
        "clustering", "birch",
        factory.get_config("clustering", "birch", {"threshold": 1.0, "n_clusters": 3}),
    )
    pdf = pd.DataFrame(_blobs(seed=2), columns=["f0", "f1"])
    pdf["row"] = range(len(pdf))
    out = algo.fit_predict(spark.createDataFrame(pdf), ["f0", "f1"], "row")
    assert out.select("cluster_id").distinct().count() == 3


# ---------------------------------------------------------------------------
# Holt-Winters ETS
# ---------------------------------------------------------------------------


def _seasonal_series(spark, period=12, cycles=8, spike_at=85, spike=40.0):
    """Strong additive seasonality + one planted spike in the test window."""
    n = period * cycles
    t = np.arange(n)
    y = 20.0 + 10.0 * np.sin(2 * np.pi * t / period)
    y[spike_at] += spike
    pdf = pd.DataFrame({"key": "k", "timestamp": t, "counts": y})
    return spark.createDataFrame(pdf)


def test_holt_winters_catches_seasonal_spike_where_ses_fails(spark):
    df = _seasonal_series(spark)
    hw = detect_anomalies_per_series(
        df, ["key"], ts_col="timestamp", value_col="counts",
        algo="ets", seasonal_periods=12, n_sigma=3.0,
    ).toPandas()
    flagged = set(hw[hw["is_anomaly"] == 1]["timestamp"])
    assert flagged == {85}
    # SES (no seasonal model) drowns: seasonal swings inflate sigma, so the
    # same spike stays under 3 sigma — the reason the HW upgrade exists
    ses = detect_anomalies_per_series(
        df, ["key"], ts_col="timestamp", value_col="counts",
        algo="ets", seasonal_periods=None, n_sigma=3.0,
    ).toPandas()
    spike_score_hw = float(hw[hw["timestamp"] == 85]["anom_score"].abs().iloc[0])
    spike_score_ses = float(ses[ses["timestamp"] == 85]["anom_score"].abs().iloc[0])
    assert spike_score_hw > spike_score_ses


def test_holt_winters_quiet_on_pure_seasonality(spark):
    df = _seasonal_series(spark, spike=0.0)
    hw = detect_anomalies_per_series(
        df, ["key"], ts_col="timestamp", value_col="counts",
        algo="ets", seasonal_periods=12, n_sigma=3.0,
    ).toPandas()
    assert int(hw["is_anomaly"].sum()) == 0


# ---------------------------------------------------------------------------
# tokenizers (reference tokenize.py:39-56)
# ---------------------------------------------------------------------------


def test_camel_case_split(spark):
    from logai_spark.functions.textops import camel_case_split_expr

    df = spark.createDataFrame(pd.DataFrame({"s": ["getUserIDFromDB", "plain"]}))
    out = [r["t"] for r in df.select(camel_case_split_expr("s").alias("t")).collect()]
    # reference _tokenize_camel_case: space before uppercase runs, then before
    # Capitalized words (double spaces preserved mid-string, ends stripped)
    import re

    def ref(s):
        return re.sub("([A-Z][a-z]+)", r" \1", re.sub("([A-Z]+)", r" \1", s)).strip()

    assert out == [ref("getUserIDFromDB"), ref("plain")]


def test_digit_mask(spark):
    from logai_spark.functions.textops import DIGITS_SUB, mask_digit_tokens_expr

    df = spark.createDataFrame(
        pd.DataFrame({"s": ["error 404 on node17 at 1200", "no digits here"]})
    )
    out = [r["t"] for r in df.select(mask_digit_tokens_expr("s").alias("t")).collect()]
    assert out[0] == f"error {DIGITS_SUB} on node17 at {DIGITS_SUB}"
    assert out[1] == "no digits here"


# ---------------------------------------------------------------------------
# semantic embedding matrix + fasttext-style subwords
# ---------------------------------------------------------------------------


def test_semantic_embedding_matrix(spark):
    from logai_spark.functions.vectorizers import SPECIAL_TOKENS, semantic_embedding_matrix

    lines = spark.createDataFrame(
        pd.DataFrame({"logline": ["alpha beta gamma", "alpha beta", "alpha"] * 10})
    )
    mat = semantic_embedding_matrix(lines, dim=8).toPandas()
    assert {"token", "token_id", "vector"} <= set(mat.columns)
    # ids dense and unique; specials occupy the tail with zero vectors
    assert sorted(mat["token_id"]) == list(range(len(mat)))
    specials = mat[mat["token"].isin(SPECIAL_TOKENS)]
    assert len(specials) == 3
    assert all(all(v == 0.0 for v in vec) for vec in specials["vector"])
    # most frequent token gets id 0 (deterministic count-desc order)
    assert mat.loc[mat["token_id"] == 0, "token"].iloc[0] == "alpha"
    assert all(len(v) == 8 for v in mat["vector"])


def test_fasttext_subword_oov_composition(spark):
    from logai_spark.functions.vectorizers import (
        compose_oov_vectors,
        fasttext_subword_vectors,
    )

    vectors = spark.createDataFrame(
        pd.DataFrame(
            {
                "word": ["reading", "reader", "writer"],
                "vector": [[1.0, 0.0], [1.0, 0.2], [0.0, 1.0]],
            }
        )
    )
    table = fasttext_subword_vectors(vectors, min_n=3, max_n=4)
    oov = compose_oov_vectors(
        spark.createDataFrame(pd.DataFrame({"word": ["reads"]})), table,
        min_n=3, max_n=4,
    ).collect()
    assert len(oov) == 1
    v = oov[0]["vector"]
    assert len(v) == 2
    # 'reads' shares <re/rea/read/ead... ngrams with the two read* words only,
    # so its composed vector leans to their side of the space
    assert v[0] > v[1]


# ---------------------------------------------------------------------------
# factory registry completeness + word2vec transform parity shape
# ---------------------------------------------------------------------------


def test_factory_registry_covers_reference_non_dl_surface():
    from logai_spark.plans.factory import factory

    assert set(factory.names("parsing")) >= {"drain", "ael", "iplom"}
    assert set(factory.names("detection")) >= {
        "isolation_forest", "lof", "one_class_svm",
        "ets", "dbl", "distribution_divergence",
    }
    assert set(factory.names("clustering")) >= {"kmeans", "dbscan", "birch"}
    assert set(factory.names("vectorization")) >= {
        "tfidf", "word2vec", "sequential", "semantic", "fasttext",
    }


def test_word2vec_transform_flattened_shape(spark):
    """Reference word2vec.py:73-96: per-line vector = flattened concat of the
    line's token vectors, '*' skipped, capped at max_token_len."""
    from logai_spark.plans.factory import factory

    lines = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [1, 2, 3],
                "logline": ["open file x", "close * x", "open open"],
            }
        )
    )
    algo = factory.get_algorithm(
        "vectorization", "word2vec",
        factory.get_config("vectorization", "word2vec", {"dim": 4}),
    )
    out = algo.fit(lines, "logline").transform(lines, "logline", "doc_id").toPandas()
    by_id = dict(zip(out["doc_id"], out["log_vector"]))
    assert len(by_id[1]) == 12  # 3 tokens x 4 dims
    assert len(by_id[2]) == 8   # '*' skipped
    assert len(by_id[3]) == 8
    # same token -> same vector slice, order preserved
    assert list(by_id[3][:4]) == list(by_id[3][4:])
    assert list(by_id[1][:4]) == list(by_id[3][:4])  # 'open' leads both


def test_fasttext_factory_oov(spark):
    from logai_spark.plans.factory import factory

    lines = spark.createDataFrame(
        pd.DataFrame({"logline": ["reading logs fast", "reader of logs"] * 5})
    )
    algo = factory.get_algorithm(
        "vectorization", "fasttext",
        factory.get_config("vectorization", "fasttext", {"dim": 4}),
    )
    algo.fit(lines, "logline")
    oov = algo.oov_vectors(
        spark.createDataFrame(pd.DataFrame({"word": ["reads"]}))
    ).collect()
    assert len(oov) == 1 and len(oov[0]["vector"]) == 4


def test_semantic_factory_roundtrip(spark):
    from logai_spark.plans.factory import factory

    lines = spark.createDataFrame(
        pd.DataFrame({"logline": ["alpha beta", "alpha gamma", "alpha beta"]})
    )
    algo = factory.get_algorithm(
        "vectorization", "semantic",
        factory.get_config("vectorization", "semantic", {"dim": 4, "max_len": 3}),
    )
    out = algo.fit(lines, "logline").transform(lines, "logline").toPandas()
    ids = out[out["logline"] == "alpha beta"]["token_ids"].iloc[0]
    assert list(ids)[:1] == [0]  # 'alpha' most frequent -> id 0
    assert len(ids) == 3


def test_ets_dbl_factory(spark):
    from logai_spark.plans.factory import factory

    df = _seasonal_series(spark)
    algo = factory.get_algorithm(
        "detection", "ets",
        factory.get_config("detection", "ets", {"seasonal_periods": 12}),
    )
    out = algo.fit_predict(df, ["key"], ts_col="timestamp", value_col="counts").toPandas()
    assert set(out[out["is_anomaly"] == 1]["timestamp"]) == {85}
    dbl = factory.get_algorithm("detection", "dbl")
    assert dbl.fit_predict(df, ["key"], ts_col="timestamp", value_col="counts").count() > 0
