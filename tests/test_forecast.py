"""Forecast-based sequence AD (DeepLog top-g criterion, linear next-event
model): on a deterministic event grammar, normal transitions rank within g
and a planted illegal transition is flagged."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from logai_spark.operators.forecast import (
    NextEventModel,
    fit_next_event_model,
    score_next_event,
)


def _grammar_sequences(n_cycles=60):
    """Event grammar: 0 -> 1 -> 2 -> 0 ... with occasional 0 -> 3 -> 0."""
    seq = []
    for i in range(n_cycles):
        seq.extend([0, 1, 2] if i % 5 else [0, 3])
    return seq


def _windows(seq, w=3):
    rows = []
    for i in range(len(seq) - w):
        rows.append((seq[i:i + w], seq[i + w]))
    return rows


def test_model_learns_grammar_locally():
    rows = _windows(_grammar_sequences())
    W = np.array([r[0] for r in rows])
    y = np.array([r[1] for r in rows])
    m = NextEventModel(vocab_size=4).fit(W, y, np.ones(len(y)))
    ranks = m.rank_of_next(W, y)
    assert (ranks <= 2).mean() > 0.95  # grammar is near-deterministic
    # an illegal transition ranks poorly
    bad_rank = m.rank_of_next(np.array([[0, 1, 2]]), np.array([3]))[0]
    good_rank = m.rank_of_next(np.array([[0, 1, 2]]), np.array([0]))[0]
    assert good_rank == 1 and bad_rank > 2


def test_spark_fit_and_score_flags_planted_transition(spark):
    rows = _windows(_grammar_sequences(100))
    pdf = pd.DataFrame(
        {"window_ids": [r[0] for r in rows], "next_id": [r[1] for r in rows]}
    )
    # plant one illegal (window, next) pair in the SCORING set only
    score_pdf = pd.concat(
        [pdf, pd.DataFrame({"window_ids": [[1, 2, 0]], "next_id": [2]})],
        ignore_index=True,
    )
    train = spark.createDataFrame(pdf)
    model = fit_next_event_model(train, vocab_size=4)
    scored = score_next_event(spark.createDataFrame(score_pdf), model, g=2).toPandas()
    planted = scored[
        scored["window_ids"].map(lambda w: list(w) == [1, 2, 0])
        & (scored["next_id"] == 2)
    ]
    assert (planted["is_anomaly"] == 1).all() and len(planted) == 1
    # normal traffic: overwhelmingly within the top-g candidates
    normal = scored.drop(planted.index)
    assert (normal["is_anomaly"] == 0).mean() > 0.9


def test_fit_is_deterministic(spark):
    rows = _windows(_grammar_sequences(40))
    pdf = pd.DataFrame(
        {"window_ids": [r[0] for r in rows], "next_id": [r[1] for r in rows]}
    )
    df = spark.createDataFrame(pdf)
    m1 = fit_next_event_model(df, vocab_size=4)
    m2 = fit_next_event_model(df.repartition(5), vocab_size=4)
    assert np.array_equal(m1.W, m2.W) and np.array_equal(m1.b, m2.b)


def test_masked_event_detector_flags_grammar_break(spark):
    """LogBERT-capability path: train masked-event model on clean cyclic
    sessions; a session with an illegal event scores a much higher
    top6_loss/max_loss than every clean session."""
    from logai_spark.operators.forecast import (
        fit_masked_event_model,
        score_masked_sessions,
    )

    clean = [0, 1, 2] * 8
    sessions = [(f"s{i}", clean) for i in range(10)]
    train = spark.createDataFrame(
        pd.DataFrame(sessions, columns=["session_id", "session_ids"])
    )
    model = fit_masked_event_model(train, vocab_size=4, radius=2)

    bad = clean[:10] + [3] + clean[10:]
    test = spark.createDataFrame(
        pd.DataFrame(
            [("clean", clean), ("bad", bad)], columns=["session_id", "session_ids"]
        )
    )
    out = score_masked_sessions(test, model, radius=2).toPandas().set_index("session_id")
    assert set(out.columns) == {
        "max_loss", "sum_loss", "num_loss", "top6_loss",
        "top6_max_prob", "top6_min_logprob", "top6_max_entropy",
    }
    assert out.loc["bad", "top6_loss"] > 2 * out.loc["clean", "top6_loss"]
    assert out.loc["bad", "max_loss"] > out.loc["clean", "max_loss"] + 1.0
    assert out.loc["clean", "num_loss"] == len(clean)
    assert out.loc["bad", "num_loss"] == len(bad)


def test_masked_event_pairs_contexts(spark):
    from logai_spark.operators.forecast import masked_event_pairs

    df = spark.createDataFrame(
        pd.DataFrame([("a", [10, 11, 12])], columns=["session_id", "session_ids"])
    )
    rows = (
        masked_event_pairs(df, radius=1, oov_id=99)
        .orderBy("_pos")
        .select("context", "target")
        .collect()
    )
    assert [(list(r["context"]), r["target"]) for r in rows] == [
        ([99, 11], 10),
        ([10, 12], 11),
        ([11, 99], 12),
    ]


def test_max_params_guard_at_construction():
    """MAX_PARAMS must trip in __init__ when window_size is explicit — not
    only in the infer-at-fit branch (a large vocab would otherwise attempt a
    multi-GB W allocation unguarded)."""
    import pytest

    from logai_spark.operators.forecast import NextEventModel

    with pytest.raises(ValueError, match="MAX_PARAMS"):
        NextEventModel(vocab_size=200_000, window_size=10)


def test_mlp_capacity_beats_linear_on_xor_grammar():
    """The one-hidden-layer model (VERDICT r2 #8) represents position
    CONJUNCTIONS a linear softmax provably cannot: next = XOR of the two
    window events. The linear model converges to uniform 0.5/0.5 on every
    window; the MLP drives the correct next above 0.99. Both deterministic
    (fixed-seed init) — re-fit is bit-identical."""
    from logai_spark.operators.forecast import MLPNextEventModel

    W = np.array([[0, 0], [0, 1], [1, 0], [1, 1]])
    y = np.array([0, 1, 1, 0])  # xor
    c = np.ones(4)
    lin = NextEventModel(2, lr=2.0, iters=400).fit(W, y, c)
    lin_own = lin.probs(W)[np.arange(4), y]
    assert lin_own.max() < 0.6  # linear cannot separate xor
    mlp = MLPNextEventModel(2, hidden=8, lr=0.5, iters=1500).fit(W, y, c)
    mlp_own = mlp.probs(W)[np.arange(4), y]
    assert mlp_own.min() > 0.95
    assert (mlp.rank_of_next(W, y) == 1).all()
    mlp2 = MLPNextEventModel(2, hidden=8, lr=0.5, iters=1500).fit(W, y, c)
    assert np.array_equal(mlp.W1, mlp2.W1) and np.array_equal(mlp.W2, mlp2.W2)


def test_mlp_spark_fit_learns_grammar(spark):
    """fit_next_event_model(hidden=...) end-to-end through the Spark dedup
    table + broadcast scoring path, on the cyclic grammar."""
    rows = _windows(_grammar_sequences(100))
    pdf = pd.DataFrame(
        {"window_ids": [r[0] for r in rows], "next_id": [r[1] for r in rows]}
    )
    df = spark.createDataFrame(pdf)
    m = fit_next_event_model(df, vocab_size=4, hidden=16)
    scored = score_next_event(df, m, g=2)
    frac_ok = scored.filter(F.col("is_anomaly") == 0).count() / df.count()
    assert frac_ok > 0.95


def test_torch_lstm_adapter_gated():
    """The torch LSTM adapter must raise cleanly without torch and train a
    usable next-event model with it (gated: skips where torch is absent)."""
    import numpy as np
    import pytest as _pytest

    from logai_spark.operators.forecast import (
        TorchLSTMNextEventModel,
        torch_available,
    )

    if not torch_available():
        with _pytest.raises(ImportError, match="torch"):
            TorchLSTMNextEventModel(vocab_size=5)
        return
    m = TorchLSTMNextEventModel(vocab_size=5, iters=300)
    # grammar: next id = (last window id + 1) % 5 — learnable by an LSTM
    wins = np.array([[i % 5, (i + 1) % 5, (i + 2) % 5] for i in range(40)])
    nxt = (wins[:, -1] + 1) % 5
    m.fit(wins, nxt, np.ones(len(wins)))
    P = m.probs(wins)
    assert (P.argmax(axis=1) == nxt).mean() > 0.9


def test_torch_cnn_transformer_adapters_gated():
    """CNN / Transformer adapters mirror the reference forecast_nn family
    (cnn.py:27-81, transformer.py:40-69); without torch they must raise the
    same clean ImportError as the LSTM adapter; with it they must learn the
    same next-id grammar. fit_next_event_model routes by arch name."""
    import numpy as np
    import pytest as _pytest

    from logai_spark.operators.forecast import (
        _TORCH_ARCHS,
        TorchCNNNextEventModel,
        TorchTransformerNextEventModel,
        torch_available,
    )

    assert set(_TORCH_ARCHS) == {"torch_lstm", "torch_cnn", "torch_transformer"}
    if not torch_available():
        for cls in (TorchCNNNextEventModel, TorchTransformerNextEventModel):
            with _pytest.raises(ImportError, match="torch"):
                cls(vocab_size=5)
        return
    wins = np.array([[i % 5, (i + 1) % 5, (i + 2) % 5] for i in range(40)])
    nxt = (wins[:, -1] + 1) % 5
    for cls in (TorchCNNNextEventModel, TorchTransformerNextEventModel):
        m = cls(vocab_size=5, iters=300)
        m.fit(wins, nxt, np.ones(len(wins)))
        assert (m.probs(wins).argmax(axis=1) == nxt).mean() > 0.9


def test_unknown_arch_raises(spark):
    import pytest as _pytest

    from logai_spark.operators.forecast import fit_next_event_model

    pairs = spark.createDataFrame(
        [([0, 1], 2)], "window_ids array<int>, next_id int"
    )
    with _pytest.raises(ValueError, match="unknown arch"):
        fit_next_event_model(pairs, vocab_size=3, arch="nope")


def test_masked_event_torch_arch_routing(spark):
    """fit_masked_event_model threads arch to the shared fitter: the
    LogBERT adapter (arch='torch_transformer', a BERT-style MLM over the
    masked context) must raise the clean torch ImportError where torch is
    absent, and the torch-free default must be unaffected by the new
    parameter. The factory's detection/logbert config exposes the knob."""
    import pytest as _pytest

    from logai_spark.operators.forecast import (
        fit_masked_event_model,
        score_masked_sessions,
        torch_available,
    )

    sessions = spark.createDataFrame(
        [(i, [j % 4 for j in range(i, i + 6)]) for i in range(12)],
        "session_id long, session_ids array<int>",
    )
    # default path: unchanged torch-free stand-in
    m = fit_masked_event_model(sessions, vocab_size=5, iters=50)
    out = score_masked_sessions(sessions, m)
    assert out.count() == 12

    if not torch_available():
        with _pytest.raises(ImportError, match="torch"):
            fit_masked_event_model(
                sessions, vocab_size=5, arch="torch_transformer"
            )
    else:
        m2 = fit_masked_event_model(
            sessions, vocab_size=5, iters=100, arch="torch_transformer"
        )
        assert score_masked_sessions(sessions, m2).count() == 12

    # factory knob reaches the fitter
    from logai_spark.plans.factory import AlgorithmFactory

    factory = AlgorithmFactory()
    cfg = factory.get_config(
        "detection", "logbert", {"vocab_size": 5, "arch": "auto", "iters": 50}
    )
    algo = factory.get_algorithm("detection", "logbert", cfg)
    algo.fit(sessions)
    assert algo.predict(sessions).count() == 12
