"""Anomaly detection: isolation forest, time-series baselines, divergence.

The reference wraps sklearn / Merlion (neither is in this image):
- isolation_forest.py:47-94 (sklearn IsolationForest; note its
  warm_start=verbose bug at :65 which we deliberately do NOT reproduce)
- ets.py:55-145 / dbl.py:46-122 (Merlion forecasters over [timestamp,counts])
- anomaly_detector_het.py:25-105 (per-attribute loop, min 10 points,
  chronological 70/30 split)
- distribution_divergence.py:46-92 (KL/JS between train/test histograms)

Spark-first shape (SURVEY.md §2.10): features are SMALL after aggregation, so
models fit on the driver over a collected/sampled matrix and score
distributedly via a broadcast model + Arrow pandas_udf. The per-attribute
detector is groupBy().applyInPandas — embarrassingly parallel. The isolation
forest itself is a from-scratch numpy implementation of the published
algorithm (Liu/Ting/Zhou 2008), matching sklearn's scoring convention
(score_samples = -2^(-E[h]/c(n)); anom_score<threshold ~ anomalous).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# isolation forest (from scratch, numpy)
# ---------------------------------------------------------------------------


def _c(n: float) -> float:
    """Average unsuccessful-search path length in a BST of n nodes."""
    if n <= 1:
        return 0.0
    return 2.0 * (math.log(n - 1) + 0.5772156649) - 2.0 * (n - 1) / n


@dataclass
class _ITreeNode:
    feature: int = -1
    threshold: float = 0.0
    left: object = None
    right: object = None
    size: int = 0  # leaf size


def _build_tree(X: np.ndarray, rng: np.random.Generator, depth: int, max_depth: int):
    n = X.shape[0]
    if depth >= max_depth or n <= 1:
        return _ITreeNode(size=n)
    f = int(rng.integers(0, X.shape[1]))
    lo, hi = X[:, f].min(), X[:, f].max()
    if lo == hi:
        return _ITreeNode(size=n)
    t = float(rng.uniform(lo, hi))
    mask = X[:, f] < t
    return _ITreeNode(
        feature=f,
        threshold=t,
        left=_build_tree(X[mask], rng, depth + 1, max_depth),
        right=_build_tree(X[~mask], rng, depth + 1, max_depth),
    )


def _path_length(node: _ITreeNode, x: np.ndarray, depth: int = 0) -> float:
    while node.feature >= 0:
        node = node.left if x[node.feature] < node.threshold else node.right
        depth += 1
    return depth + _c(node.size)


class IsolationForest:
    """Minimal isolation forest: fit(X), score_samples(X) like sklearn's
    (more negative = more anomalous), predict -> -1 anomaly / 1 normal."""

    def __init__(self, n_estimators: int = 100, max_samples: int = 256, seed: int = 42,
                 contamination: float = 0.05):
        self.n_estimators = n_estimators
        self.max_samples = max_samples
        self.seed = seed
        self.contamination = contamination
        self.trees: list[_ITreeNode] = []
        self.sample_size = 0
        self.offset = 0.0

    def fit(self, X: np.ndarray) -> "IsolationForest":
        X = np.asarray(X, dtype=float)
        rng = np.random.default_rng(self.seed)
        n = X.shape[0]
        self.sample_size = min(self.max_samples, n)
        max_depth = int(math.ceil(math.log2(max(self.sample_size, 2))))
        self.trees = []
        for _ in range(self.n_estimators):
            idx = rng.choice(n, size=self.sample_size, replace=False)
            self.trees.append(_build_tree(X[idx], rng, 0, max_depth))
        scores = self.score_samples(X)
        self.offset = float(np.quantile(scores, self.contamination))
        return self

    def score_samples(self, X: np.ndarray) -> np.ndarray:
        X = np.asarray(X, dtype=float)
        cn = _c(self.sample_size)
        out = np.empty(X.shape[0])
        for i, x in enumerate(X):
            eh = np.mean([_path_length(t, x) for t in self.trees])
            out[i] = -(2.0 ** (-eh / cn))
        return out

    def predict(self, X: np.ndarray) -> np.ndarray:
        return np.where(self.score_samples(X) < self.offset, -1, 1)


def _deterministic_sample(df: DataFrame, cols: list[str], cap: int) -> pd.DataFrame:
    """Collect up to ``cap`` rows as a pure function of the DATA: the rows
    with the smallest xxhash64 of the selected tuple (orderBy+limit compiles
    to TakeOrdered — one scan with a bounded heap, not a full sort). A bare
    limit() takes whichever rows arrive first, so the fitted model would
    vary with partition layout / executor count, violating the
    identical-output-across-cluster-sizes rule."""
    return (
        df.select(*cols)
        .orderBy(F.xxhash64(*[F.col(c) for c in cols]))
        .limit(cap)
        .toPandas()
    )


def fit_isolation_forest(
    df: DataFrame,
    feature_cols: list[str],
    max_fit_rows: int = 100_000,
    **params,
) -> IsolationForest:
    """Driver-side fit on the (post-aggregation, small) feature matrix.
    The sample cap is DATA-deterministic (smallest xxhash64 of the feature
    tuple, TakeOrdered): a bare limit() would depend on partition layout."""
    pdf = _deterministic_sample(df, feature_cols, max_fit_rows)
    model = IsolationForest(**params)
    model.fit(pdf.to_numpy(dtype=float))
    return model


def score_with_model(
    df: DataFrame,
    model,
    feature_cols: list[str],
    score_col: str = "anom_score",
    flag_col: str = "is_anomaly",
) -> DataFrame:
    """Broadcast the fitted model; score in Arrow batches (the reference's
    predict path, isolation_forest.py:79-94, distributed)."""
    spark = df.sparkSession
    bc = spark.sparkContext.broadcast(model)

    @F.pandas_udf(T.DoubleType())
    def _score(*cols: pd.Series) -> pd.Series:
        X = np.column_stack([c.to_numpy(dtype=float) for c in cols])
        return pd.Series(bc.value.score_samples(X))

    out = df.withColumn(score_col, _score(*[F.col(c) for c in feature_cols]))
    return out.withColumn(flag_col, (F.col(score_col) < F.lit(model.offset)).cast("int"))


# ---------------------------------------------------------------------------
# local outlier factor (from scratch, numpy)
# ---------------------------------------------------------------------------


class LocalOutlierFactor:
    """From-scratch LOF in novelty mode (Breunig et al. 2000), the algorithm
    the reference wraps from sklearn (local_outlier_factor.py:46-94;
    novelty=True default at :42). Brute-force distances — the fit set is the
    small post-aggregation feature matrix, collected driver-side; scoring
    runs distributed via the broadcast model (see :func:`score_with_model`).

    Scoring convention mirrors sklearn: ``score_samples(X) = -LOF(X)``
    against the TRAIN set (lower = more anomalous); with contamination
    'auto' the novelty decision offset is -1.5, so predict() flags
    score < -1.5 as -1 (outlier).
    """

    def __init__(self, n_neighbors: int = 20, offset: float = -1.5):
        self.n_neighbors = n_neighbors
        self.offset = offset
        self._X: np.ndarray | None = None
        self._kdist: np.ndarray | None = None
        self._lrd: np.ndarray | None = None

    @staticmethod
    def _knn(A: np.ndarray, B: np.ndarray, k: int, self_is_b: bool = False,
             chunk: int = 512) -> tuple[np.ndarray, np.ndarray]:
        """kNN (indices, distances) of each row of A within B, computed in
        row chunks: peak memory is O(chunk x |B|), never the full |A| x |B|
        matrix (a 50k-row fit would otherwise allocate ~20 GB on the driver).
        argpartition + a stable sort of the k finalists replaces a full-row
        argsort. ``self_is_b`` masks the diagonal (train-set kNN)."""
        n = len(A)
        bsq = (B * B).sum(1)
        idx = np.empty((n, k), dtype=np.int64)
        nd = np.empty((n, k))
        for s in range(0, n, chunk):
            a = A[s:s + chunk]
            sq = (a * a).sum(1)[:, None] + bsq[None, :] - 2.0 * (a @ B.T)
            d = np.sqrt(np.maximum(sq, 0.0))
            if self_is_b:
                d[np.arange(len(a)), np.arange(s, s + len(a))] = np.inf
            part = np.argpartition(d, k - 1, axis=1)[:, :k]
            pdist = np.take_along_axis(d, part, axis=1)
            order = np.argsort(pdist, axis=1, kind="stable")
            idx[s:s + len(a)] = np.take_along_axis(part, order, axis=1)
            nd[s:s + len(a)] = np.take_along_axis(pdist, order, axis=1)
        return idx, nd

    def fit(self, X: np.ndarray) -> "LocalOutlierFactor":
        X = np.asarray(X, dtype=float)
        n = len(X)
        k = min(self.n_neighbors, n - 1)
        if k < 1:
            raise ValueError("LOF needs at least 2 fit points")
        self._X = X
        self._k = k
        idx, ndist = self._knn(X, X, k, self_is_b=True)
        self._kdist = ndist[:, -1]  # k-distance per train point
        # local reachability density over the train set
        reach = np.maximum(ndist, self._kdist[idx])
        self._lrd = 1.0 / (reach.mean(axis=1) + 1e-10)
        return self

    def score_samples(self, X: np.ndarray) -> np.ndarray:
        X = np.asarray(X, dtype=float)
        idx, ndist = self._knn(X, self._X, self._k)
        reach = np.maximum(ndist, self._kdist[idx])
        lrd_x = 1.0 / (reach.mean(axis=1) + 1e-10)
        lof = self._lrd[idx].mean(axis=1) / lrd_x
        return -lof

    def predict(self, X: np.ndarray) -> np.ndarray:
        return np.where(self.score_samples(X) < self.offset, -1, 1)


def fit_lof(
    df: DataFrame,
    feature_cols: list[str],
    max_fit_rows: int = 50_000,
    **params,
) -> LocalOutlierFactor:
    """Driver-side LOF fit on the (post-aggregation, small) feature matrix;
    score with :func:`score_with_model` (broadcast + Arrow batches).
    Data-deterministic sample cap (see fit_isolation_forest)."""
    pdf = _deterministic_sample(df, feature_cols, max_fit_rows)
    return LocalOutlierFactor(**params).fit(pdf.to_numpy(dtype=float))


# ---------------------------------------------------------------------------
# one-class SVM (from scratch, numpy)
# ---------------------------------------------------------------------------


class OneClassSVM:
    """From-scratch one-class SVM (Schölkopf et al. 2001) — the detector the
    reference wraps from sklearn (one_class_svm.py:44-90; RBF kernel and
    nu=0.5 defaults). Solves the dual

        min 1/2 a^T K a   s.t. 0 <= a_i <= 1/(nu*n),  sum(a) = 1

    by deterministic projected gradient descent (fit sets are the small
    post-aggregation feature matrices, so an O(n^2) kernel is fine; scoring
    distributes via the broadcast model). ``gamma='scale'`` reproduces
    sklearn's 1/(d * Var(X)).

    score_samples(x) = sum_i a_i k(x_i, x); decision = score - rho; predict
    -1 when decision < 0 (sklearn convention).
    """

    def __init__(self, nu: float = 0.5, gamma: str | float = "scale",
                 max_iter: int = 3000, tol: float = 1e-12):
        self.nu = nu
        self.gamma = gamma
        self.max_iter = max_iter
        self.tol = tol

    def _rbf(self, A: np.ndarray, B: np.ndarray) -> np.ndarray:
        sq = (
            (A * A).sum(1)[:, None]
            + (B * B).sum(1)[None, :]
            - 2.0 * (A @ B.T)
        )
        return np.exp(-self._gamma * np.maximum(sq, 0.0))

    @staticmethod
    def _project(a: np.ndarray, ub: float) -> np.ndarray:
        """Euclidean projection onto {0 <= a <= ub, sum(a) = 1} (capped
        simplex) by bisection on the shift."""
        lo, hi = a.min() - 1.0, a.max()
        for _ in range(100):
            mid = 0.5 * (lo + hi)
            s = np.clip(a - mid, 0.0, ub).sum()
            if s > 1.0:
                lo = mid
            else:
                hi = mid
        return np.clip(a - 0.5 * (lo + hi), 0.0, ub)

    def fit(self, X: np.ndarray) -> "OneClassSVM":
        X = np.asarray(X, dtype=float)
        n, d = X.shape
        if self.gamma == "scale":
            v = X.var()
            self._gamma = 1.0 / (d * v) if v > 0 else 1.0
        else:
            self._gamma = float(self.gamma)
        self._X = X
        K = self._rbf(X, X)
        ub = 1.0 / max(self.nu * n, 1e-12)
        a = np.full(n, 1.0 / n)
        if ub < 1.0 / n:  # infeasible start guard (nu > 1)
            a = self._project(a, ub)
        # accelerated projected gradient (FISTA) — plain PGD converges too
        # slowly on this quadratic for rho (and hence the nu-property of the
        # training outlier fraction) to come out right
        step = 1.0 / max(np.linalg.norm(K, ord=2), 1e-12)
        y, t_m = a.copy(), 1.0
        prev_obj = np.inf
        for _ in range(self.max_iter):
            a_next = self._project(y - step * (K @ y), ub)
            t_next = 0.5 * (1.0 + math.sqrt(1.0 + 4.0 * t_m * t_m))
            y = a_next + ((t_m - 1.0) / t_next) * (a_next - a)
            a, t_m = a_next, t_next
            obj = 0.5 * a @ K @ a
            if prev_obj - obj < self.tol * max(abs(prev_obj), 1.0) and prev_obj >= obj:
                break
            prev_obj = obj
        self._alpha = a
        # rho = decision value at margin support vectors (0 < a_i < ub)
        margin = (a > 1e-8) & (a < ub - 1e-8)
        dec = K @ a
        self.rho = float(dec[margin].mean() if margin.any() else dec[a > 1e-8].mean())
        self.offset = 0.0  # decision threshold: score - rho < 0 -> outlier
        return self

    def score_samples(self, X: np.ndarray) -> np.ndarray:
        X = np.asarray(X, dtype=float)
        return self._rbf(X, self._X) @ self._alpha - self.rho

    def predict(self, X: np.ndarray) -> np.ndarray:
        return np.where(self.score_samples(X) < 0.0, -1, 1)


def fit_ocsvm(
    df: DataFrame,
    feature_cols: list[str],
    max_fit_rows: int = 20_000,
    **params,
) -> OneClassSVM:
    """Driver-side one-class-SVM fit; score via :func:`score_with_model`.
    Data-deterministic sample cap (see fit_isolation_forest)."""
    pdf = _deterministic_sample(df, feature_cols, max_fit_rows)
    return OneClassSVM(**params).fit(pdf.to_numpy(dtype=float))


# ---------------------------------------------------------------------------
# DBSCAN (from scratch, numpy; reference clustering_algo/dbscan.py:44-79)
# ---------------------------------------------------------------------------


def dbscan_labels(
    X: np.ndarray, eps: float = 0.3, min_samples: int = 10, chunk: int = 512
) -> np.ndarray:
    """Classic DBSCAN over a small matrix: core points have >= min_samples
    neighbors within eps (inclusive, counting self, as sklearn does);
    clusters are connected components of core points; border points join a
    neighboring core's cluster; the rest are noise (-1). Deterministic:
    clusters are seeded in row order.

    The neighborhood structure is built in row chunks (adjacency lists, peak
    memory O(chunk x n) plus the actual edges) instead of one n x n boolean
    matrix, so the fit cap doesn't translate into a multi-GB driver alloc."""
    X = np.asarray(X, dtype=float)
    n = len(X)
    xsq = (X * X).sum(1)
    neighbors: list[np.ndarray] = []
    core = np.zeros(n, dtype=bool)
    for s in range(0, n, chunk):
        a = X[s:s + chunk]
        sq = (a * a).sum(1)[:, None] + xsq[None, :] - 2.0 * (a @ X.T)
        within = np.sqrt(np.maximum(sq, 0.0)) <= eps
        for r in range(len(a)):
            nb = np.flatnonzero(within[r])
            neighbors.append(nb)
            core[s + r] = len(nb) >= min_samples
    labels = np.full(n, -1)
    cluster = 0
    for i in range(n):
        if not core[i] or labels[i] != -1:
            continue
        # BFS over density-reachable points
        labels[i] = cluster
        frontier = [i]
        while frontier:
            j = frontier.pop()
            for k in neighbors[j]:
                if labels[k] == -1:
                    labels[k] = cluster
                    if core[k]:
                        frontier.append(int(k))
        cluster += 1
    return labels


def dbscan_fit_predict(
    df: DataFrame,
    feature_cols: list[str],
    id_col: str,
    eps: float = 0.3,
    min_samples: int = 10,
    max_fit_rows: int = 50_000,
) -> DataFrame:
    """Cluster the (small, post-aggregation) feature matrix driver-side and
    join labels back by ``id_col`` — the reference's fit_predict shape
    (dbscan.py:63-79) made explicit about row identity, since Spark rows
    have no stable index."""
    spark = df.sparkSession
    pdf = _deterministic_sample(df, [id_col, *feature_cols], max_fit_rows)
    labels = dbscan_labels(pdf[feature_cols].to_numpy(dtype=float), eps, min_samples)
    lab = spark.createDataFrame(
        pd.DataFrame({id_col: pdf[id_col], "cluster_id": labels})
    )
    return df.join(F.broadcast(lab), id_col, "left")


# ---------------------------------------------------------------------------
# BIRCH (from scratch; reference clustering_algo/birch.py:34-67 wraps sklearn)
# ---------------------------------------------------------------------------


class Birch:
    """From-scratch BIRCH (Zhang/Ramakrishnan/Livny 1996) in the flat-CF form:
    each subcluster is a clustering feature (n, LS, SS); a point merges into
    its nearest subcluster when the merged radius stays <= ``threshold``,
    otherwise it seeds a new subcluster. ``branching_factor`` bounds the
    number of LIVE subclusters (the flat-CF analog of the CF-tree's node
    capacity): when an insert would exceed it, the two closest subclusters
    merge first — BIRCH's node-rebuild behavior collapsed onto one level.
    sklearn's tree shares the memory-bound role but not exact split
    mechanics; cluster semantics here follow the CF algebra, not sklearn's
    tree shape.

    sklearn parity of the API surface (reference birch.py:34-67):
    partial_fit(X) is incremental; with n_clusters=None predict returns the
    subcluster index, with n_clusters=k the subcluster centroids are merged
    agglomeratively (closest-centroid pairs first, deterministic index
    tiebreak) down to k global clusters. Deterministic: no RNG anywhere.
    """

    def __init__(self, threshold: float = 1.5, branching_factor: int = 50,
                 n_clusters: int | None = None):
        self.threshold = threshold
        self.branching_factor = branching_factor
        self.n_clusters = n_clusters
        self._n: list[int] = []
        self._ls: list[np.ndarray] = []
        self._ss: list[float] = []
        self._labels: np.ndarray | None = None
        self._C: np.ndarray | None = None  # centroid matrix, kept in sync

    def partial_fit(self, X: np.ndarray) -> "Birch":
        X = np.asarray(X, dtype=float)
        for x in X:
            if not self._n:
                self._add(x)
                continue
            # incremental centroid matrix: rebuilt-from-scratch-per-point is
            # O(rows x subclusters x dim) of pure re-materialization
            d2 = ((self._C - x) ** 2).sum(1)
            j = int(d2.argmin())
            n_new = self._n[j] + 1
            ls_new = self._ls[j] + x
            ss_new = self._ss[j] + float(x @ x)
            # radius of the merged subcluster: sqrt(SS/n - ||LS/n||^2)
            r2 = ss_new / n_new - float(ls_new @ ls_new) / (n_new * n_new)
            if math.sqrt(max(r2, 0.0)) <= self.threshold:
                self._n[j], self._ls[j], self._ss[j] = n_new, ls_new, ss_new
                self._C[j] = ls_new / n_new
            else:
                if len(self._n) >= self.branching_factor:
                    self._merge_closest_pair()
                self._add(x)
        self._labels = None  # invalidate global clustering
        return self

    fit = partial_fit

    def _merge_closest_pair(self) -> None:
        """Capacity rebuild: fold the two closest subclusters into one
        (deterministic lowest-index tiebreak via argmin scan order)."""
        C = self._C
        d2 = ((C[:, None, :] - C[None, :, :]) ** 2).sum(2)
        np.fill_diagonal(d2, np.inf)
        a, b = np.unravel_index(int(d2.argmin()), d2.shape)
        a, b = (int(a), int(b)) if a < b else (int(b), int(a))
        self._n[a] += self._n[b]
        self._ls[a] = self._ls[a] + self._ls[b]
        self._ss[a] += self._ss[b]
        del self._n[b], self._ls[b], self._ss[b]
        self._C[a] = self._ls[a] / self._n[a]
        self._C = np.delete(self._C, b, axis=0)

    def _add(self, x: np.ndarray) -> None:
        self._n.append(1)
        self._ls.append(x.copy())
        self._ss.append(float(x @ x))
        row = x[None, :]
        self._C = row.copy() if self._C is None else np.vstack([self._C, row])

    def centroids(self) -> np.ndarray:
        return np.array([ls / n for ls, n in zip(self._ls, self._n)])

    def _global_labels(self) -> np.ndarray:
        """Subcluster index -> global cluster label."""
        k = len(self._n)
        if self.n_clusters is None or self.n_clusters >= k:
            return np.arange(k)
        # agglomerative centroid-linkage merge down to n_clusters, weighted
        # by subcluster mass; deterministic tiebreak on (i, j)
        groups = {i: (self._n[i], self._ls[i].copy()) for i in range(k)}
        parent = list(range(k))
        while len(groups) > self.n_clusters:
            keys = sorted(groups)
            best = None
            for a_i in range(len(keys)):
                for b_i in range(a_i + 1, len(keys)):
                    a, b = keys[a_i], keys[b_i]
                    ca = groups[a][1] / groups[a][0]
                    cb = groups[b][1] / groups[b][0]
                    d = float(((ca - cb) ** 2).sum())
                    if best is None or d < best[0]:
                        best = (d, a, b)
            _, a, b = best
            na, la = groups[a]
            nb, lb = groups[b]
            groups[a] = (na + nb, la + lb)
            del groups[b]
            parent = [a if p == b else p for p in parent]
        remap = {g: i for i, g in enumerate(sorted(groups))}
        return np.array([remap[p] for p in parent])

    def predict(self, X: np.ndarray) -> np.ndarray:
        if self._labels is None:
            self._labels = self._global_labels()
        X = np.asarray(X, dtype=float)
        C = self.centroids()
        d2 = (X * X).sum(1)[:, None] - 2.0 * (X @ C.T) + (C * C).sum(1)[None, :]
        return self._labels[d2.argmin(1)]


def birch_fit(
    df: DataFrame,
    feature_cols: list[str],
    threshold: float = 1.5,
    branching_factor: int = 50,
    n_clusters: int | None = None,
    max_fit_rows: int = 50_000,
) -> Birch:
    """Driver-side BIRCH fit on a capped, data-deterministic sample.

    The fit sample is a pure function of the data (smallest xxhash64 of the
    feature tuple; TakeOrdered, not a full sort) — a bare limit() would pick
    whichever rows arrive first and make the fitted model depend on
    partition layout, breaking the identical-output-across-cluster-sizes
    rule. Fit order = hash order, also data-deterministic."""
    pdf = (
        df.select(*feature_cols)
        .orderBy(F.xxhash64(*[F.col(c) for c in feature_cols]))
        .limit(max_fit_rows)
        .toPandas()
    )
    model = Birch(threshold, branching_factor, n_clusters)
    model.fit(pdf.to_numpy(dtype=float))
    model._labels = model._global_labels()  # materialize before broadcast
    return model


def birch_assign(
    df: DataFrame, model: Birch, feature_cols: list[str]
) -> DataFrame:
    """Attach ``cluster_id`` DISTRIBUTEDLY via the broadcast fitted model in
    Arrow batches (nearest-centroid predict is a matrix op)."""
    spark = df.sparkSession
    bc = spark.sparkContext.broadcast(model)

    @F.pandas_udf(T.IntegerType())
    def _predict(*cols: pd.Series) -> pd.Series:
        X = np.column_stack([c.to_numpy(dtype=float) for c in cols])
        return pd.Series(bc.value.predict(X).astype("int32"))

    return df.withColumn("cluster_id", _predict(*[F.col(c) for c in feature_cols]))


def birch_fit_predict(
    df: DataFrame,
    feature_cols: list[str],
    id_col: str,
    threshold: float = 1.5,
    branching_factor: int = 50,
    n_clusters: int | None = None,
    max_fit_rows: int = 50_000,
) -> DataFrame:
    """birch_fit on ``df``'s own sample, then birch_assign on all of ``df``."""
    model = birch_fit(
        df, feature_cols, threshold, branching_factor, n_clusters, max_fit_rows
    )
    return birch_assign(df, model, feature_cols)


# ---------------------------------------------------------------------------
# per-attribute time-series detectors (het detector semantics)
# ---------------------------------------------------------------------------

MIN_TS_LENGTH = 10  # reference constants.py:40


def _ets_one_step_scores(
    y: np.ndarray,
    split: int,
    alpha: float = 0.3,
    beta: float = 0.1,
    gamma: float = 0.2,
    seasonal_periods: int | None = None,
    n_sigma: float = 3.0,
) -> np.ndarray:
    """Normalized one-step-ahead forecast errors from an additive
    exponential-smoothing family, from scratch:

    - Holt-Winters additive (level + trend + season) when
      ``seasonal_periods`` is set and the train window covers >= 2 seasons —
      the (A,A,A) model Merlion's ETS defaults to (reference ets.py:55-145).
    - Holt (level + trend) when no usable season.
    - SES (level only) for very short trains.

    Residual sigma comes from the train one-step errors; test scores are
    (observed - forecast)/sigma with state updated on observed values.
    Smoothing constants are fixed (no MLE optimizer) — documented stand-in
    for Merlion's fitted params; the seasonal structure is what matters for
    log-volume counters.
    """
    n = len(y)
    train = y[:split]
    scores = np.zeros(n)
    m = seasonal_periods if (seasonal_periods and split >= 2 * seasonal_periods) else None
    if m:
        level = float(train[:m].mean())
        trend = (float(train[m:2 * m].mean()) - level) / m
        season = [float(train[i]) - level for i in range(m)]
        start = m
    elif split >= 4:
        level, trend = float(train[0]), float(train[1] - train[0])
        season, start = None, 1
    else:
        level, trend = float(train[0]), 0.0
        season, start = None, 1

    resid = []
    sigma = None
    for t in range(start, n):
        s = season[t % m] if m else 0.0
        f = level + trend + s
        obs = float(y[t])
        err = obs - f
        if t < split:
            resid.append(err)
        else:
            if sigma is None:
                # floor relative to the data scale: a model that fits the
                # train window (near-)exactly must not turn numerical noise
                # into infinite scores
                scale = float(np.std(train)) or 1.0
                sigma = max(float(np.std(resid)) if resid else 0.0, 1e-6 * scale)
            scores[t] = err / sigma
            if abs(scores[t]) > n_sigma:
                # same threshold as the caller's flag: a point flagged
                # anomalous must also be the one shielded from the state
                # shielded update: an anomalous observation must not corrupt
                # the smoothing state (else one spike flags every later
                # point); substitute the forecast
                obs = f
        new_level = alpha * (obs - s) + (1 - alpha) * (level + trend)
        trend = beta * (new_level - level) + (1 - beta) * trend
        if m:
            season[t % m] = gamma * (obs - new_level) + (1 - gamma) * s
        level = new_level
    return scores


def detect_anomalies_per_series(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str = "timestamp",
    value_col: str = "counts",
    train_frac: float = 0.7,
    n_sigma: float = 3.0,
    algo: str = "dbl",
    seasonal_periods: int | None = None,
    trends: list[str] | None = None,
    wind_sz_minutes: int = 60,
) -> DataFrame:
    """Per-key fit/predict via applyInPandas (anomaly_detector_het.py:72-98):
    series shorter than MIN_TS_LENGTH are skipped; the first ``train_frac``
    chronologically is train (log_anomaly_detection.py:144-149).

    algo='dbl': dynamic baseline — flag test points beyond mean ± n_sigma of
    the train window (Merlion DynamicBaseline contract, dbl.py:46-122).
    Without ``trends`` the baseline is the global train mean/std; with
    ``trends`` (any of 'daily'/'weekly', Merlion DynamicBaselineConfig) each
    test point is scored against the SEASONAL baseline of its own bucket —
    'daily' buckets time-of-day into ``wind_sz_minutes`` windows (Merlion's
    wind_sz), 'weekly' adds day-of-week — which is what catches a 3 am spike
    that a flat mean±nσ over a daily-cycled counter can never see. Buckets
    with <2 train points fall back to the global baseline.
    algo='ets': additive exponential smoothing one-step forecasts — full
    Holt-Winters (level/trend/season) when ``seasonal_periods`` is given,
    honoring the Merlion-ETS (A,A,A) contract (ets.py:55-145); flags test
    points whose normalized residual exceeds n_sigma.
    """
    for t in trends or []:
        if t not in ("daily", "weekly"):
            raise ValueError(f"unsupported trend {t!r}; use 'daily'/'weekly'")
    out_fields = [df.schema[c] for c in key_cols] + [
        df.schema[ts_col],
        df.schema[value_col],
        T.StructField("anom_score", T.DoubleType()),
        T.StructField("is_anomaly", T.IntegerType()),
    ]
    schema = T.StructType(out_fields)

    def fit_predict(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(ts_col).reset_index(drop=True)
        n = len(pdf)
        if n < MIN_TS_LENGTH:
            return pdf.head(0)[[*key_cols, ts_col, value_col]].assign(
                anom_score=pd.Series(dtype=float), is_anomaly=pd.Series(dtype="int32")
            )
        split = int(n * train_frac)
        y = pdf[value_col].to_numpy(dtype=float)
        train, test = y[:split], y[split:]
        if algo == "ets":
            scores = _ets_one_step_scores(
                y, split, seasonal_periods=seasonal_periods, n_sigma=n_sigma
            )
        else:  # dbl
            g_mu, g_sd = float(train.mean()), float(train.std() or 1.0)
            g_sd = g_sd if g_sd > 0 else 1.0
            scores = np.zeros(n)
            if trends:
                ts = pd.to_datetime(pdf[ts_col])
                bucket = np.zeros(n, dtype=np.int64)
                if "daily" in trends:
                    minutes = (ts.dt.hour * 60 + ts.dt.minute).to_numpy()
                    bucket = bucket * 10_000 + minutes // max(wind_sz_minutes, 1)
                if "weekly" in trends:
                    bucket = bucket * 10 + ts.dt.dayofweek.to_numpy()
                stats = (
                    pd.DataFrame({"k": bucket[:split], "y": train})
                    .groupby("k")["y"]
                    .agg(["mean", "std", "count"])
                )
                test_k = pd.Series(bucket[split:])
                mu = test_k.map(stats["mean"]).to_numpy()
                sd = test_k.map(stats["std"]).to_numpy()
                cnt = test_k.map(stats["count"]).fillna(0).to_numpy()
                thin = cnt < 2  # unseen or single-point bucket -> global
                mu = np.where(thin, g_mu, mu)
                # zero-variance bucket: the baseline is exact, so keep the
                # same unit floor the flat branch uses — falling back to the
                # (cycle-inflated) global σ would blind the seasonal detector
                sd = np.where(thin, g_sd, np.where(sd > 0, sd, 1.0))
                scores[split:] = (test - mu) / sd
            else:
                scores[split:] = (test - g_mu) / g_sd
        out = pdf[[*key_cols, ts_col, value_col]].copy()
        out["anom_score"] = scores
        out["is_anomaly"] = (np.abs(scores) > n_sigma).astype("int32")
        return out.iloc[split:]

    return df.groupBy(*key_cols).applyInPandas(fit_predict, schema)


# ---------------------------------------------------------------------------
# distribution divergence (pure SQL)
# ---------------------------------------------------------------------------


def distribution_divergence(
    train: DataFrame,
    test: DataFrame,
    value_col: str,
    n_bins: int = 10,
    lo: float | None = None,
    hi: float | None = None,
) -> dict:
    """KL and JS divergence between train/test histograms
    (distribution_divergence.py:46-92). Two groupBy-count scans + tiny
    driver-side math over n_bins numbers."""
    if lo is None or hi is None:
        row = train.select(
            F.min(value_col).alias("lo"), F.max(value_col).alias("hi")
        ).first()
        lo = lo if lo is not None else float(row["lo"])
        hi = hi if hi is not None else float(row["hi"])
    width = (hi - lo) / n_bins or 1.0

    def probs(df: DataFrame) -> np.ndarray:
        bucket = F.least(
            F.greatest(F.floor((F.col(value_col) - lo) / width), F.lit(0)),
            F.lit(n_bins - 1),
        ).cast("int")
        rows = df.select(bucket.alias("b")).groupBy("b").count().collect()
        h = np.full(n_bins, 1e-12)
        for r in rows:
            h[r["b"]] += r["count"]
        return h / h.sum()

    p, q = probs(train), probs(test)
    kl = float(np.sum(p * np.log(p / q)))
    m = (p + q) / 2
    js = float(0.5 * np.sum(p * np.log(p / m)) + 0.5 * np.sum(q * np.log(q / m)))
    return {"kl": kl, "js": js}
