"""Forecast-based log-sequence anomaly detection, from scratch (no torch).

Capability target: the reference's forecast_nn detectors (LSTM/CNN/
Transformer wrappers, /root/reference/logai/algorithms/anomaly_detection_algo/
forecast_nn.py:76-115 over nn_model/forecast_nn/*) and their decision rule —
predict the NEXT log event from a window of preceding events and flag the
window when the observed next event is not among the model's top-``g``
candidates (the published DeepLog criterion, Du et al. CCS'17, which the
reference's forecast models implement). SURVEY §2.10 scopes the torch stack
out of v1; this module supplies the same DETECTION SEMANTICS with a
from-scratch multinomial logistic next-event model:

    P(next = j | window) = softmax(mean(onehot(window ids)) @ W + b)

trained driver-side with deterministic full-batch gradient descent (numpy,
no RNG — zero init, fixed step count). Linear next-event models are weaker
than an LSTM on long-range grammar but identical in interface, decision
rule, and data flow: windows come from the same sliding_windows +
sequential vocab operators that would feed the NN, fitting consumes the
aggregated (window, next) TABLE, and scoring runs distributed through a
broadcast weight matrix in Arrow batches.

Scale shape: the fit set is the deduplicated (window_ids, next_id, count)
table — bounded by distinct windows, collected under a deterministic cap —
and scoring is one pandas_udf matrix multiply per batch.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


class NextEventModel:
    """Multinomial logistic next-event predictor over dense event ids.

    ``fit(windows, nexts, counts)``: windows is an (n, w) int array of event
    ids (OOV id = vocab_size allowed), nexts an (n,) int array, counts the
    duplicate weights. Features are POSITION-AWARE concatenated one-hots
    (w x vocab columns) — a bag-of-events would collapse every rotation of a
    cyclic grammar onto one feature vector and be unable to predict the next
    event; positional one-hots keep the order information the NN's embedding
    sequence carries. Training is ``iters`` steps of weighted full-batch
    softmax-regression gradient descent from zero init (deterministic; no
    RNG, no shuffling).
    """

    #: hard cap on weight-matrix size (w * (v+1)^2 float64 entries). The
    #: positional-one-hot parameterization is quadratic in vocab — right for
    #: log-TEMPLATE vocabs (tens to low thousands of events); a raw-token
    #: vocab must be capped (top-K + OOV) before it reaches this model.
    MAX_PARAMS = 200_000_000  # ~1.6 GB of float64

    def __init__(self, vocab_size: int, lr: float = 2.0, iters: int = 200,
                 window_size: int | None = None):
        self.v = vocab_size + 1  # + OOV row
        self.lr = lr
        self.iters = iters
        self.w = window_size  # inferred at fit when None
        if self.w is not None:
            self._check_params()  # fail at construction, before any data pass
        self.W: np.ndarray | None = None
        self.b = np.zeros(self.v)

    def _check_params(self) -> None:
        if self.w * self.v * self.v > self.MAX_PARAMS:
            raise ValueError(
                f"window={self.w} x vocab={self.v - 1} needs "
                f"{self.w * self.v * self.v:,} weights (> MAX_PARAMS="
                f"{self.MAX_PARAMS:,}); cap the event vocab (top-K + OOV) "
                "before fitting — this model is meant for template/event "
                "vocabs, not raw tokens."
            )

    # feature row i = w one-hot blocks of width v; stored sparsely as the w
    # set-bit indices (pos * v + id). Never materializes the dense (n, w*v)
    # matrix the naive formulation needs.
    _CHUNK_CELLS = 50_000_000  # gather-buffer budget: chunk * w * v cells

    def _check_ids(self, arr: np.ndarray, what: str) -> None:
        if arr.size and (arr.min() < 0 or arr.max() >= self.v):
            raise ValueError(
                f"{what} id out of range [0, {self.v - 1}] (vocab_size + OOV): "
                f"min={arr.min()}, max={arr.max()}. Ids must come from the "
                "same vocab this model was sized for (OOV id = vocab_size)."
            )

    def _indices(self, windows) -> np.ndarray:
        windows = np.asarray(windows, dtype=int)
        if windows.ndim != 2 or windows.shape[0] == 0:
            raise ValueError(
                "windows must be a non-empty (n, window_size) id array; got "
                f"shape {windows.shape}. (Did the train split produce any "
                "(window, next) pairs? Spans of length <= window_size yield "
                "none.)"
            )
        n, w = windows.shape
        if self.w is None:
            self.w = w
            self._check_params()
        elif w != self.w:
            raise ValueError(f"window width {w} != fitted width {self.w}")
        self._check_ids(windows, "window event")
        return np.arange(w) * self.v + windows  # (n, w) weight-row indices

    def _chunk(self, w: int) -> int:
        return max(1, self._CHUNK_CELLS // max(1, w * self.v))

    def _logits(self, idx: np.ndarray) -> np.ndarray:
        out = np.empty((idx.shape[0], self.v))
        step = self._chunk(idx.shape[1])
        for s in range(0, idx.shape[0], step):
            out[s:s + step] = self.W[idx[s:s + step]].sum(axis=1)
        return out + self.b

    def fit(self, windows: np.ndarray, nexts: np.ndarray, counts: np.ndarray) -> "NextEventModel":
        idx = self._indices(windows)
        n, w = idx.shape
        if self.W is None:
            self.W = np.zeros((w * self.v, self.v))
        y = np.asarray(nexts, dtype=int)
        self._check_ids(y, "next event")
        wts = np.asarray(counts, dtype=float)
        wts = wts / wts.sum()
        step = self._chunk(w)
        for _ in range(self.iters):
            gW = np.zeros_like(self.W)
            gb = np.zeros(self.v)
            for s in range(0, n, step):
                i = idx[s:s + step]
                Z = self.W[i].sum(axis=1) + self.b
                Z -= Z.max(axis=1, keepdims=True)
                P = np.exp(Z)
                P /= P.sum(axis=1, keepdims=True)
                yc = y[s:s + step]
                P[np.arange(len(yc)), yc] -= 1.0  # P - Y, in place
                G = P * wts[s:s + step, None]
                np.add.at(gW, i.ravel(), np.repeat(G, w, axis=0))
                gb += G.sum(axis=0)
            self.W -= self.lr * gW
            self.b -= self.lr * gb
        return self

    def probs(self, windows: np.ndarray) -> np.ndarray:
        Z = self._logits(self._indices(windows))
        Z -= Z.max(axis=1, keepdims=True)
        P = np.exp(Z)
        return P / P.sum(axis=1, keepdims=True)

    @staticmethod
    def _rank_from_probs(P: np.ndarray, nexts: np.ndarray) -> np.ndarray:
        # rank = 1 + number of classes STRICTLY more probable (ties favor
        # the observed event -> deterministic, optimistic like DeepLog)
        own = P[np.arange(len(nexts)), nexts]
        return 1 + (P > own[:, None]).sum(axis=1)

    def rank_of_next(self, windows: np.ndarray, nexts: np.ndarray) -> np.ndarray:
        """1-based rank of the observed next event among predictions (the
        DeepLog criterion compares this to g)."""
        return self._rank_from_probs(self.probs(windows), np.asarray(nexts, dtype=int))


class MLPNextEventModel(NextEventModel):
    """One-hidden-layer next-event predictor: the capacity notch above the
    linear model (VERDICT r2 #8) while staying numpy + deterministic.

        P(next | window) = softmax(tanh(onehots @ W1 + b1) @ W2 + b2)

    The hidden layer lets the model represent CONJUNCTIONS of window
    positions (e.g. "event a at -3 AND event b at -1 implies c") that a
    linear softmax provably cannot (XOR-style grammars —
    test_forecast_mlp_capacity pins one the linear model fails). Interface,
    decision rule, sparse positional-one-hot feature flow, chunked gathers,
    and broadcast-Arrow scoring are all inherited. Init is a FIXED-seed
    ``default_rng`` (zero init would freeze a symmetric MLP); same seed ->
    bit-identical weights on any host, so determinism is preserved.
    """

    def __init__(self, vocab_size: int, hidden: int = 64, lr: float = 0.5,
                 iters: int = 400, window_size: int | None = None, seed: int = 0):
        self.h = hidden
        self.seed = seed
        super().__init__(vocab_size, lr, iters, window_size)
        self.W1: np.ndarray | None = None
        self.W2: np.ndarray | None = None
        self.b1 = np.zeros(hidden)
        self.b2 = np.zeros(self.v)

    def _check_params(self) -> None:
        n_params = self.w * self.v * self.h + self.h * self.v
        if n_params > self.MAX_PARAMS:
            raise ValueError(
                f"window={self.w} x vocab={self.v - 1} x hidden={self.h} needs "
                f"{n_params:,} weights (> MAX_PARAMS={self.MAX_PARAMS:,}); "
                "cap the event vocab or shrink hidden."
            )

    def _init_weights(self) -> None:
        rng = np.random.default_rng(self.seed)
        self.W1 = rng.standard_normal((self.w * self.v, self.h)) * 0.1
        self.W2 = rng.standard_normal((self.h, self.v)) * 0.1

    def _hidden_act(self, idx: np.ndarray) -> np.ndarray:
        out = np.empty((idx.shape[0], self.h))
        step = self._chunk(idx.shape[1])
        for s in range(0, idx.shape[0], step):
            out[s:s + step] = np.tanh(self.W1[idx[s:s + step]].sum(axis=1) + self.b1)
        return out

    def _logits(self, idx: np.ndarray) -> np.ndarray:
        return self._hidden_act(idx) @ self.W2 + self.b2

    def fit(self, windows: np.ndarray, nexts: np.ndarray, counts: np.ndarray) -> "MLPNextEventModel":
        idx = self._indices(windows)
        n, w = idx.shape
        if self.W1 is None:
            self._init_weights()
        y = np.asarray(nexts, dtype=int)
        self._check_ids(y, "next event")
        wts = np.asarray(counts, dtype=float)
        wts = wts / wts.sum()
        step = self._chunk(w)
        for _ in range(self.iters):
            gW1 = np.zeros_like(self.W1)
            gW2 = np.zeros_like(self.W2)
            gb1 = np.zeros(self.h)
            gb2 = np.zeros(self.v)
            for s in range(0, n, step):
                i = idx[s:s + step]
                H = np.tanh(self.W1[i].sum(axis=1) + self.b1)
                Z = H @ self.W2 + self.b2
                Z -= Z.max(axis=1, keepdims=True)
                P = np.exp(Z)
                P /= P.sum(axis=1, keepdims=True)
                yc = y[s:s + step]
                P[np.arange(len(yc)), yc] -= 1.0
                G = P * wts[s:s + step, None]
                gW2 += H.T @ G
                gb2 += G.sum(axis=0)
                dH = (G @ self.W2.T) * (1.0 - H * H)
                np.add.at(gW1, i.ravel(), np.repeat(dH, w, axis=0))
                gb1 += dH.sum(axis=0)
            self.W1 -= self.lr * gW1
            self.b1 -= self.lr * gb1
            self.W2 -= self.lr * gW2
            self.b2 -= self.lr * gb2
        return self


def torch_available() -> bool:
    try:
        import torch  # noqa: F401

        return True
    except ImportError:
        return False


class _TorchNextEventBase(NextEventModel):
    """Shared machinery for the reference-shaped torch next-event models,
    ACTIVE only when torch is importable (it is not in this container — the
    adapters exist so a real deployment gets the reference's
    nn_model/forecast_nn family without code changes). All three share the
    reference's data flow (event-id embedding -> encoder -> linear head
    over the vocab) and this repo's: Adam on the weighted distinct
    (window, next, count) table, so fit/probs/rank_of_next are drop-in for
    the torch-free models. Deterministic: seeded torch.manual_seed,
    full-batch steps. Subclasses implement ``_build()``."""

    _arch = "torch"

    def __init__(
        self,
        vocab_size: int,
        embedding_dim: int = 32,
        hidden_size: int = 64,
        num_layers: int = 1,
        bidirectional: bool = False,
        lr: float = 1e-2,
        iters: int = 200,
        seed: int = 0,
    ):
        if not torch_available():
            raise ImportError(
                f"{type(self).__name__} requires torch; use the default "
                "linear/MLP next-event models in this environment"
            )
        # Same id contract as NextEventModel: ids in [0, vocab_size] with
        # OOV id = vocab_size, so the embedding/head are sized v = vocab+1.
        self.v = int(vocab_size) + 1
        self.embedding_dim = embedding_dim
        self.hidden_size = hidden_size
        self.num_layers = num_layers
        self.bidirectional = bidirectional
        self.lr = lr
        self.iters = iters
        self.seed = seed
        self._net = None

    def _build(self):  # pragma: no cover - abstract
        raise NotImplementedError

    def fit(self, windows: np.ndarray, nexts: np.ndarray, counts: np.ndarray):
        import torch

        self._check_ids(np.asarray(windows), "window ids")
        self._check_ids(np.asarray(nexts), "next ids")
        net = self._build()
        opt = torch.optim.Adam(net.parameters(), lr=self.lr)
        X = torch.as_tensor(np.asarray(windows), dtype=torch.long)
        y = torch.as_tensor(np.asarray(nexts), dtype=torch.long)
        w = torch.as_tensor(np.asarray(counts), dtype=torch.float32)
        w = w / w.sum()
        loss_fn = torch.nn.CrossEntropyLoss(reduction="none")
        net.train()
        for _ in range(self.iters):
            opt.zero_grad()
            loss = (loss_fn(net(X), y) * w).sum()
            loss.backward()
            opt.step()
        net.eval()
        self._net = net
        return self

    def probs(self, windows: np.ndarray) -> np.ndarray:
        import torch

        with torch.no_grad():
            logits = self._net(
                torch.as_tensor(np.asarray(windows), dtype=torch.long)
            )
            return torch.softmax(logits, dim=1).numpy().astype(np.float64)


class TorchLSTMNextEventModel(_TorchNextEventBase):
    """Reference nn_model/forecast_nn/lstm.py:72-106: embedding ->
    (optionally bidirectional) LSTM -> linear head on the LAST position."""

    _arch = "torch_lstm"

    def _build(self):
        import torch
        from torch import nn

        torch.manual_seed(self.seed)
        dirs = 2 if self.bidirectional else 1

        class _Net(nn.Module):
            def __init__(self, v, e, h, layers, bidi):
                super().__init__()
                self.emb = nn.Embedding(v, e)
                self.lstm = nn.LSTM(
                    input_size=e,
                    hidden_size=h,
                    num_layers=layers,
                    batch_first=True,
                    bidirectional=bidi,
                )
                self.head = nn.Linear(h * dirs, v)

            def forward(self, idx):
                x = self.emb(idx)
                out, _ = self.lstm(x)
                return self.head(out[:, -1, :])

        return _Net(
            self.v,
            self.embedding_dim,
            self.hidden_size,
            self.num_layers,
            self.bidirectional,
        )


class TorchCNNNextEventModel(_TorchNextEventBase):
    """Reference nn_model/forecast_nn/cnn.py:27-81: embedding -> one
    Conv2d(1, hidden, (K, emb_dim)) per kernel size (default [2, 3, 4]) ->
    relu + max-pool over the sequence -> concat -> linear head.
    ``hidden_size`` is the per-kernel channel count, as in the reference."""

    _arch = "torch_cnn"

    def __init__(self, *args, kernel_sizes: tuple[int, ...] = (2, 3, 4), **kw):
        super().__init__(*args, **kw)
        self.kernel_sizes = tuple(kernel_sizes)

    def _build(self):
        import torch
        from torch import nn

        torch.manual_seed(self.seed)

        class _Net(nn.Module):
            def __init__(self, v, e, h, ks):
                super().__init__()
                self.emb = nn.Embedding(v, e)
                self.convs = nn.ModuleList(
                    [nn.Conv2d(1, h, (k, e)) for k in ks]
                )
                self.ks = ks
                self.head = nn.Linear(h * len(ks), v)

            def forward(self, idx):
                # windows shorter than the largest kernel pad with the PAD
                # row 0 on the left so every conv yields >=1 position
                need = max(self.ks) - idx.shape[1]
                if need > 0:
                    idx = nn.functional.pad(idx, (need, 0))
                x = self.emb(idx).unsqueeze(1)  # (B, 1, seq, emb)
                pooled = [
                    torch.relu(c(x)).squeeze(3).max(dim=2).values
                    for c in self.convs
                ]  # [(B, hidden)] * len(ks), cf. cnn.py:78-81
                return self.head(torch.cat(pooled, dim=1))

        return _Net(self.v, self.embedding_dim, self.hidden_size, self.kernel_sizes)


class TorchTransformerNextEventModel(_TorchNextEventBase):
    """Reference nn_model/forecast_nn/transformer.py:40-69: embedding ->
    TransformerEncoder(emb_dim, nhead, ff=hidden_size) x num_layers ->
    MEAN-pool over positions -> linear head (the reference pools with
    ``.mean(dim=1)``, transformer.py:67)."""

    _arch = "torch_transformer"

    def __init__(self, *args, nhead: int = 4, **kw):
        super().__init__(*args, **kw)
        self.nhead = nhead

    def _build(self):
        import torch
        from torch import nn

        torch.manual_seed(self.seed)

        class _Net(nn.Module):
            def __init__(self, v, e, h, layers, nhead):
                super().__init__()
                self.emb = nn.Embedding(v, e)
                layer = nn.TransformerEncoderLayer(
                    e, nhead, h, batch_first=True
                )
                self.enc = nn.TransformerEncoder(layer, num_layers=layers)
                self.head = nn.Linear(e, v)

            def forward(self, idx):
                x = self.enc(self.emb(idx))
                return self.head(x.mean(dim=1))

        return _Net(
            self.v, self.embedding_dim, self.hidden_size,
            self.num_layers, self.nhead,
        )


_TORCH_ARCHS = {
    "torch_lstm": TorchLSTMNextEventModel,
    "torch_cnn": TorchCNNNextEventModel,
    "torch_transformer": TorchTransformerNextEventModel,
}


def fit_next_event_model(
    pairs: DataFrame,
    vocab_size: int,
    window_col: str = "window_ids",
    next_col: str = "next_id",
    max_fit_rows: int = 100_000,
    lr: float | None = None,
    iters: int = 200,
    hidden: int | None = None,
    arch: str = "auto",
) -> NextEventModel:
    """Fit on the deduplicated (window_ids, next_id) table with counts —
    log windows repeat heavily, so the weighted distinct table is orders of
    magnitude smaller than the raw window stream. Deterministic cap by row
    hash (same rule as every other driver-side fit here).

    ``hidden``: None fits the linear model; an int fits the one-hidden-layer
    MLP (MLPNextEventModel) with that width at lr/4 (tanh nets need the
    smaller step) and 2x the iteration count.

    ``arch``: 'auto' (default) keeps the hidden-driven linear/MLP choice —
    the torch-free stand-ins that run everywhere; 'torch_lstm' /
    'torch_cnn' / 'torch_transformer' fit the reference-shaped deep models
    (nn_model/forecast_nn/{lstm,cnn,transformer}.py) and raise ImportError
    where torch is absent."""
    dedup = pairs.groupBy(window_col, next_col).agg(F.count(F.lit(1)).alias("_cnt"))
    pdf = (
        dedup.orderBy(F.xxhash64(window_col, next_col))
        .limit(max_fit_rows)
        .toPandas()
    )
    windows = np.array(pdf[window_col].tolist(), dtype=int)
    # lr default depends on arch (full-batch GD wants 2.0; Adam wants 1e-2),
    # so None = per-arch default and an explicit value is always honored.
    if arch in _TORCH_ARCHS:
        model: NextEventModel = _TORCH_ARCHS[arch](
            vocab_size,
            hidden_size=hidden if hidden is not None else 64,
            lr=lr if lr is not None else 1e-2,
            iters=iters,
        )
    elif arch == "auto":
        base_lr = lr if lr is not None else 2.0
        model = (
            NextEventModel(vocab_size, base_lr, iters)
            if hidden is None
            else MLPNextEventModel(vocab_size, hidden, base_lr / 4.0, iters * 2)
        )
    else:
        raise ValueError(
            f"unknown arch {arch!r} (auto|{'|'.join(sorted(_TORCH_ARCHS))})"
        )
    return model.fit(windows, pdf[next_col].to_numpy(), pdf["_cnt"].to_numpy())


def score_next_event(
    df: DataFrame,
    model: NextEventModel,
    window_col: str = "window_ids",
    next_col: str = "next_id",
    g: int = 3,
) -> DataFrame:
    """DeepLog-style detection: window is anomalous iff the observed next
    event's rank exceeds ``g``. Adds ``next_rank``, ``anom_score``
    (-log P(observed next)) and ``is_anomaly``; scoring is a broadcast
    weight matrix + one matrix multiply per Arrow batch."""
    spark = df.sparkSession
    bc = spark.sparkContext.broadcast(model)

    out_t = T.StructType(
        [
            T.StructField("next_rank", T.IntegerType()),
            T.StructField("anom_score", T.DoubleType()),
        ]
    )

    @F.pandas_udf(out_t)
    def _score(wins: pd.Series, nxt: pd.Series) -> pd.DataFrame:
        m = bc.value
        W = np.array(wins.tolist(), dtype=int)
        y = nxt.to_numpy(dtype=int)
        if len(W) == 0:
            return pd.DataFrame({"next_rank": [], "anom_score": []})
        P = m.probs(W)
        own = P[np.arange(len(y)), y]
        rank = NextEventModel._rank_from_probs(P, y)
        return pd.DataFrame(
            {
                "next_rank": rank.astype("int32"),
                "anom_score": -np.log(np.maximum(own, 1e-300)),
            }
        )

    out = df.withColumn("_s", _score(F.col(window_col), F.col(next_col)))
    return (
        out.withColumn("next_rank", F.col("_s.next_rank"))
        .withColumn("anom_score", F.col("_s.anom_score"))
        .withColumn("is_anomaly", (F.col("next_rank") > g).cast("int"))
        .drop("_s")
    )


# ---------------------------------------------------------------------------
# Masked-event detection (LogBERT-capability, torch-free)
# ---------------------------------------------------------------------------

def masked_event_pairs(
    df: DataFrame,
    seq_col: str = "session_ids",
    radius: int = 2,
    *,
    oov_id: int,
) -> DataFrame:
    """(context, target) pairs for masked-event modeling: every position of
    every session sequence becomes a row whose context is the +-``radius``
    neighborhood with the center REMOVED — the masked-LM factorization the
    reference's LogBERT inference applies per token (nn_model/logbert/
    predict.py:63-104 masks each non-special position and scores the
    masked-LM loss there). Out-of-bounds context slots take ``oov_id``
    (BERT's [PAD]; keyword-only and REQUIRED — a defaulted 0 would collide
    with valid dense event id 0; every id scheme in this repo reserves
    OOV = vocab_size). Built entirely JVM-side: posexplode + guarded
    element_at — no Python in the pair-generation path. The session array
    itself is DROPPED from the output: keeping it would ship the full
    sequence on every exploded row (O(len^2) shuffle bytes per session at
    web scale); downstream only needs the bounded 2*radius context."""
    offsets = [o for o in range(-radius, radius + 1) if o != 0]
    seq = F.col(seq_col)
    idx = lambda o: F.col("_pos") + 1 + o  # element_at is 1-based
    ctx = F.array(
        *[
            F.when(
                (idx(o) >= 1) & (idx(o) <= F.size(seq)), F.element_at(seq, idx(o))
            ).otherwise(F.lit(oov_id))
            for o in offsets
        ]
    )
    return (
        df.select("*", F.posexplode(seq).alias("_pos", "target"))
        .withColumn("context", ctx)
        .drop(seq_col)
    )


def fit_masked_event_model(
    sessions: DataFrame,
    vocab_size: int,
    seq_col: str = "session_ids",
    radius: int = 2,
    max_fit_rows: int = 100_000,
    lr: float | None = None,
    iters: int = 200,
    hidden: int | None = None,
    arch: str = "auto",
) -> NextEventModel:
    """Train the masked-event model: same softmax-regression machinery as the
    next-event forecaster, features = positional one-hots of the 2*radius
    context slots. Fits on the deduplicated weighted (context, target) table
    (training-capability analog of nn_model/logbert/train.py's MLM fit).
    ``hidden`` selects the MLP variant, as in fit_next_event_model.

    ``arch='torch_transformer'`` is the LogBERT adapter proper: a
    TransformerEncoder over the masked context with mean pooling and a
    vocab head — a BERT-style MLM predicting the masked center, the same
    factorization the reference trains (nn_model/logbert/train.py) —
    active only where torch is importable, like the forecast_nn adapters.
    The default stays the torch-free stand-in that runs everywhere."""
    pairs = masked_event_pairs(sessions, seq_col, radius, oov_id=vocab_size)
    return fit_next_event_model(
        pairs, vocab_size, "context", "target",
        max_fit_rows=max_fit_rows,
        lr=lr, iters=iters, hidden=hidden, arch=arch,
    )


def score_masked_sessions(
    df: DataFrame,
    model: NextEventModel,
    seq_col: str = "session_ids",
    id_col: str = "session_id",
    radius: int = 2,
    top_k: int = 6,
) -> DataFrame:
    """Per-session masked-LM anomaly aggregates with the reference's exact
    output columns (nn_model/logbert/predict.py:179-187): ``max_loss,
    sum_loss, num_loss, top6_loss`` (mean loss over the ``top_k`` worst
    masked positions), ``top6_max_prob, top6_min_logprob, top6_max_entropy``.
    Per-position losses come from one broadcast-matrix Arrow batch multiply,
    and that UDF subtree executes ONCE: totals (max/sum/count) ride the same
    per-session window partitioning as the top-k rank, so the plan is one
    exchange on the session key feeding both. The top-k leg filters to
    ``top_k`` rows before its aggregate — no collect_list of all positions,
    so a 10^5-event session never materializes as one array in an
    aggregation buffer. Ties rank deterministically by position."""
    spark = df.sparkSession
    bc = spark.sparkContext.broadcast(model)

    out_t = T.StructType(
        [
            T.StructField("loss", T.DoubleType()),
            T.StructField("prob", T.DoubleType()),
            T.StructField("entropy", T.DoubleType()),
        ]
    )

    @F.pandas_udf(out_t)
    def _mlm_score(ctx: pd.Series, tgt: pd.Series) -> pd.DataFrame:
        m = bc.value
        if len(ctx) == 0:
            return pd.DataFrame({"loss": [], "prob": [], "entropy": []})
        C = np.array(ctx.tolist(), dtype=int)
        y = tgt.to_numpy(dtype=int)
        P = m.probs(C)
        own = np.maximum(P[np.arange(len(y)), y], 1e-300)
        ent = -(P * np.log(np.maximum(P, 1e-300))).sum(axis=1)
        return pd.DataFrame({"loss": -np.log(own), "prob": own, "entropy": ent})

    from pyspark.sql import Window

    pairs = masked_event_pairs(df, seq_col, radius, oov_id=model.v - 1)
    scored = pairs.withColumn("_s", _mlm_score("context", "target"))
    per_pos = scored.select(
        id_col,
        "_pos",
        F.col("_s.loss").alias("loss"),
        F.col("_s.prob").alias("prob"),
        F.col("_s.entropy").alias("entropy"),
    )
    part = Window.partitionBy(id_col)
    ranked = per_pos.select(
        id_col,
        "loss",
        "prob",
        "entropy",
        F.max("loss").over(part).alias("max_loss"),
        F.sum("loss").over(part).alias("sum_loss"),
        F.count(F.lit(1)).over(part).alias("num_loss"),
        F.row_number()
        .over(part.orderBy(F.desc("loss"), F.asc("_pos")))
        .alias("_rk"),
    )
    return (
        ranked.filter(F.col("_rk") <= top_k)
        .groupBy(id_col)
        .agg(
            F.max("max_loss").alias("max_loss"),
            F.max("sum_loss").alias("sum_loss"),
            F.max("num_loss").alias("num_loss"),
            F.avg("loss").alias("top6_loss"),
            F.max("prob").alias("top6_max_prob"),
            F.log(F.min("prob")).alias("top6_min_logprob"),
            F.max("entropy").alias("top6_max_entropy"),
        )
    )
