"""Model / artifact persistence: save + reload everything a resumable
pipeline needs without refitting.

The reference pickles its fitted objects (log_parser.py:95-122 pickles the
parser model, sequential.py:45-51 the vocab, semantic.py:67-81 the vocab +
embedding matrix as .pkl/.npy). Pickle is neither portable nor auditable, so
here every artifact is JSON (small model state: template dictionaries,
detector parameters, tree structures) or parquet (tabular state: idf tables,
vocabularies, embedding matrices — saved/loaded with plain
``DataFrame.write.parquet``). A 100 TB pipeline can stop after the expensive
fit stages and resume scoring from these files on a different cluster.

Model JSON layout: {"type": <registry key>, "state": {...}} — numpy arrays
are stored as nested lists, isolation-forest trees as nested dicts. Round-
trip equality is exact for every float (json repr keeps full precision).
"""

from __future__ import annotations

import json
import os
from typing import Any

import numpy as np


# ---------------------------------------------------------------------------
# template dictionaries (Drain / AEL / IPLoM mining output)
# ---------------------------------------------------------------------------


def save_templates(templates: list[tuple[str, int]], path: str) -> None:
    """[(template, size)] -> JSON file (order preserved)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w", encoding="utf-8") as f:
        json.dump([[t, int(s)] for t, s in templates], f, ensure_ascii=False)


def load_templates(path: str) -> list[tuple[str, int]]:
    with open(path, encoding="utf-8") as f:
        return [(t, int(s)) for t, s in json.load(f)]


# ---------------------------------------------------------------------------
# tabular artifacts (idf tables, vocabularies, embedding matrices)
# ---------------------------------------------------------------------------


def save_table(df, path: str) -> None:
    """Persist a dimension-table artifact (idf table, vocab, ...) as parquet."""
    df.write.mode("overwrite").parquet(path)


def load_table(spark, path: str):
    return spark.read.parquet(path)


# ---------------------------------------------------------------------------
# fitted detector / clusterer models (JSON)
# ---------------------------------------------------------------------------


def _tree_to_dict(node) -> dict:
    if node.feature < 0:
        return {"s": int(node.size)}
    return {
        "f": int(node.feature),
        "t": float(node.threshold),
        "l": _tree_to_dict(node.left),
        "r": _tree_to_dict(node.right),
    }


def _tree_from_dict(d: dict):
    from logai_spark.operators.anomaly import _ITreeNode

    if "f" not in d:
        return _ITreeNode(size=d["s"])
    return _ITreeNode(
        feature=d["f"],
        threshold=d["t"],
        left=_tree_from_dict(d["l"]),
        right=_tree_from_dict(d["r"]),
    )


def _encode(model) -> dict[str, Any]:
    from logai_spark.operators.anomaly import (
        Birch,
        IsolationForest,
        LocalOutlierFactor,
        OneClassSVM,
    )
    from logai_spark.operators.forecast import NextEventModel

    if isinstance(model, NextEventModel):
        return {
            "type": "next_event",
            "state": {
                "v": model.v,
                "w": model.w,
                "lr": model.lr,
                "iters": model.iters,
                "W": model.W.tolist() if model.W is not None else None,
                "b": model.b.tolist(),
            },
        }

    if isinstance(model, IsolationForest):
        return {
            "type": "isolation_forest",
            "state": {
                "n_estimators": model.n_estimators,
                "max_samples": model.max_samples,
                "seed": model.seed,
                "contamination": model.contamination,
                "sample_size": model.sample_size,
                "offset": model.offset,
                "trees": [_tree_to_dict(t) for t in model.trees],
            },
        }
    if isinstance(model, LocalOutlierFactor):
        return {
            "type": "lof",
            "state": {
                "n_neighbors": model.n_neighbors,
                "offset": model.offset,
                "k": model._k,
                "X": model._X.tolist(),
                "kdist": model._kdist.tolist(),
                "lrd": model._lrd.tolist(),
            },
        }
    if isinstance(model, OneClassSVM):
        return {
            "type": "one_class_svm",
            "state": {
                "nu": model.nu,
                "gamma": model._gamma,
                "rho": model.rho,
                "offset": model.offset,
                "X": model._X.tolist(),
                "alpha": model._alpha.tolist(),
            },
        }
    if isinstance(model, Birch):
        return {
            "type": "birch",
            "state": {
                "threshold": model.threshold,
                "branching_factor": model.branching_factor,
                "n_clusters": model.n_clusters,
                "n": [int(x) for x in model._n],
                "ls": [ls.tolist() for ls in model._ls],
                "ss": [float(x) for x in model._ss],
            },
        }
    raise TypeError(f"no persistence codec for {type(model).__name__}")


def _decode(doc: dict[str, Any]):
    from logai_spark.operators.anomaly import (
        Birch,
        IsolationForest,
        LocalOutlierFactor,
        OneClassSVM,
    )

    kind, st = doc["type"], doc["state"]
    if kind == "next_event":
        from logai_spark.operators.forecast import NextEventModel

        m = NextEventModel(st["v"] - 1, st["lr"], st["iters"], st["w"])
        m.W = np.array(st["W"], dtype=float) if st["W"] is not None else None
        m.b = np.array(st["b"], dtype=float)
        return m
    if kind == "isolation_forest":
        m = IsolationForest(
            n_estimators=st["n_estimators"],
            max_samples=st["max_samples"],
            seed=st["seed"],
            contamination=st["contamination"],
        )
        m.sample_size = st["sample_size"]
        m.offset = st["offset"]
        m.trees = [_tree_from_dict(t) for t in st["trees"]]
        return m
    if kind == "lof":
        m = LocalOutlierFactor(n_neighbors=st["n_neighbors"], offset=st["offset"])
        m._k = st["k"]
        m._X = np.array(st["X"], dtype=float)
        m._kdist = np.array(st["kdist"], dtype=float)
        m._lrd = np.array(st["lrd"], dtype=float)
        return m
    if kind == "one_class_svm":
        m = OneClassSVM(nu=st["nu"], gamma=st["gamma"])
        m._gamma = st["gamma"]
        m.rho = st["rho"]
        m.offset = st["offset"]
        m._X = np.array(st["X"], dtype=float)
        m._alpha = np.array(st["alpha"], dtype=float)
        return m
    if kind == "birch":
        m = Birch(
            threshold=st["threshold"],
            branching_factor=st["branching_factor"],
            n_clusters=st["n_clusters"],
        )
        m._n = list(st["n"])
        m._ls = [np.array(x, dtype=float) for x in st["ls"]]
        m._ss = list(st["ss"])
        m._C = m.centroids() if m._n else None  # keep partial_fit usable
        return m
    raise ValueError(f"unknown model type {kind!r}")


def save_model(model, path: str) -> None:
    """Persist a fitted detector/clusterer as a JSON artifact."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w", encoding="utf-8") as f:
        json.dump(_encode(model), f)


def load_model(path: str):
    """Reload a model saved by :func:`save_model`; scoring is bit-identical
    to the pre-save model (tested in tests/test_persist.py)."""
    with open(path, encoding="utf-8") as f:
        return _decode(json.load(f))
