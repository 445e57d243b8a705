"""Algorithm registry: the engine's extension surface.

Same contract as the reference's singleton AlgorithmFactory
(/root/reference/logai/algorithms/factory.py:12-126): ``@factory.register
(task, name, config_class)`` over tasks {detection, parsing, clustering,
vectorization}; lookups by (task, name) return config/algorithm classes or
instances. Here each registered algorithm contributes DataFrame->DataFrame
transforms (built-ins or Arrow UDFs), not pandas objects.
"""

from __future__ import annotations

from dataclasses import fields, is_dataclass


class AlgorithmFactory:
    _TASKS = ("detection", "parsing", "clustering", "vectorization")

    _instance = None

    def __new__(cls):
        if cls._instance is None:
            cls._instance = super().__new__(cls)
            cls._instance._algorithms = {t: {} for t in cls._TASKS}
        return cls._instance

    def register(self, task: str, name: str | list[str], config_class):
        if task not in self._algorithms:
            raise ValueError(f"unknown task {task}; choose from {self._TASKS}")

        def wrap(algo_class):
            for n in [name] if isinstance(name, str) else name:
                if n in self._algorithms[task]:
                    raise ValueError(f"algorithm {n} already registered for {task}")
                self._algorithms[task][n] = (config_class, algo_class)
            return algo_class

        return wrap

    def unregister(self, task: str, name: str):
        return self._algorithms[task].pop(name, None)

    def names(self, task: str) -> list[str]:
        return sorted(self._algorithms[task])

    def get_config_class(self, task: str, name: str):
        return self._algorithms[task][name][0]

    def get_algorithm_class(self, task: str, name: str):
        return self._algorithms[task][name][1]

    def get_config(self, task: str, name: str, config_dict: dict):
        cls = self.get_config_class(task, name)
        if is_dataclass(cls):
            valid = {f.name for f in fields(cls)}
            return cls(**{k: v for k, v in (config_dict or {}).items() if k in valid})
        return cls(**(config_dict or {}))

    def get_algorithm(self, task: str, name: str, config=None):
        config_class, algo_class = self._algorithms[task][name]
        if config is not None and not isinstance(config, config_class):
            raise TypeError(f"config must be a {config_class.__name__}")
        return algo_class(config or config_class())


factory = AlgorithmFactory()


def _register_builtins() -> None:
    """Register the engine's built-in algorithms (mirrors the reference
    registry listed in SURVEY.md §2.11, minus torch extras)."""
    from logai_spark.operators.anomaly import IsolationForest
    from logai_spark.parse.ael import AELConfig, ael_parse
    from logai_spark.parse.drain import DrainConfig, DrainTree

    class _DrainAlgo:
        def __init__(self, cfg: DrainConfig):
            self.cfg = cfg

        def parse(self, df, column="logline"):
            from logai_spark.parse.distributed import parse_df

            return parse_df(df, column, self.cfg)[0]

    class _AELAlgo:
        def __init__(self, cfg: AELConfig):
            self.cfg = cfg

        def parse(self, df, column="logline"):
            return ael_parse(df, column, self.cfg)

    from dataclasses import dataclass

    @dataclass
    class IsolationForestConfig:
        n_estimators: int = 100
        max_samples: int = 256
        seed: int = 42
        contamination: float = 0.05

    class _IFAlgo:
        def __init__(self, cfg: IsolationForestConfig):
            self.cfg = cfg
            self.model = None

        def fit(self, df, feature_cols):
            from logai_spark.operators.anomaly import fit_isolation_forest

            self.model = fit_isolation_forest(
                df,
                feature_cols,
                n_estimators=self.cfg.n_estimators,
                max_samples=self.cfg.max_samples,
                seed=self.cfg.seed,
                contamination=self.cfg.contamination,
            )
            return self

        def predict(self, df, feature_cols):
            from logai_spark.operators.anomaly import score_with_model

            return score_with_model(df, self.model, feature_cols)

    @dataclass
    class LOFConfig:
        n_neighbors: int = 20
        offset: float = -1.5

    class _LOFAlgo:
        def __init__(self, cfg: LOFConfig):
            self.cfg = cfg
            self.model = None

        def fit(self, df, feature_cols):
            from logai_spark.operators.anomaly import fit_lof

            self.model = fit_lof(
                df, feature_cols,
                n_neighbors=self.cfg.n_neighbors, offset=self.cfg.offset,
            )
            return self

        def predict(self, df, feature_cols):
            from logai_spark.operators.anomaly import score_with_model

            return score_with_model(df, self.model, feature_cols)

    @dataclass
    class OCSVMConfig:
        nu: float = 0.5
        gamma: object = "scale"

    class _OCSVMAlgo:
        def __init__(self, cfg: OCSVMConfig):
            self.cfg = cfg
            self.model = None

        def fit(self, df, feature_cols):
            from logai_spark.operators.anomaly import fit_ocsvm

            self.model = fit_ocsvm(df, feature_cols, nu=self.cfg.nu, gamma=self.cfg.gamma)
            return self

        def predict(self, df, feature_cols):
            from logai_spark.operators.anomaly import score_with_model

            return score_with_model(df, self.model, feature_cols)

    @dataclass
    class DBSCANConfig:
        eps: float = 0.3
        min_samples: int = 10

    class _DBSCANAlgo:
        def __init__(self, cfg: DBSCANConfig):
            self.cfg = cfg

        def fit_predict(self, df, feature_cols, id_col):
            from logai_spark.operators.anomaly import dbscan_fit_predict

            return dbscan_fit_predict(
                df, feature_cols, id_col, eps=self.cfg.eps, min_samples=self.cfg.min_samples
            )

        # Reference Clustering is fit-then-predict (analysis/clustering.py:48-63);
        # its DbScanAlgo.predict re-runs fit_predict on the given data
        # (clustering_algo/dbscan.py:63-80), so fit is train-and-discard.
        def fit(self, df, feature_cols, id_col):
            self._fit_args = (feature_cols, id_col)
            return self

        def predict(self, df, feature_cols=None, id_col=None):
            fc, ic = getattr(self, "_fit_args", (feature_cols, id_col))
            return self.fit_predict(df, feature_cols or fc, id_col or ic)

    @dataclass
    class BirchConfig:
        threshold: float = 1.5
        branching_factor: int = 50
        n_clusters: int | None = None

    class _BirchAlgo:
        def __init__(self, cfg: BirchConfig):
            self.cfg = cfg
            self.model = None

        def fit_predict(self, df, feature_cols, id_col):
            from logai_spark.operators.anomaly import birch_fit_predict

            return birch_fit_predict(
                df, feature_cols, id_col,
                threshold=self.cfg.threshold,
                branching_factor=self.cfg.branching_factor,
                n_clusters=self.cfg.n_clusters,
            )

        # Reference Birch is genuinely fit-then-predict (partial_fit on train,
        # nearest-subcluster predict on test — clustering_algo/birch.py:47-66).
        def fit(self, df, feature_cols, id_col=None):
            from logai_spark.operators.anomaly import birch_fit

            self.model = birch_fit(
                df, feature_cols,
                threshold=self.cfg.threshold,
                branching_factor=self.cfg.branching_factor,
                n_clusters=self.cfg.n_clusters,
            )
            self._feature_cols = list(feature_cols)
            return self

        def predict(self, df, feature_cols=None, id_col=None):
            from logai_spark.operators.anomaly import birch_assign

            if self.model is None:
                raise RuntimeError("Birch predict before fit")
            return birch_assign(df, self.model, feature_cols or self._feature_cols)

    @dataclass
    class IPLoMFactoryConfig:
        max_event_len: int = 200
        ct: float = 0.0
        lower_bound: float = 0.25
        upper_bound: float = 0.9
        shards_per_group: int = 1

    class _IPLoMAlgo:
        def __init__(self, cfg: IPLoMFactoryConfig):
            self.cfg = cfg

        def parse(self, df, column="logline"):
            from logai_spark.parse.iplom import IPLoMConfig, parse_iplom

            return parse_iplom(
                df,
                column,
                IPLoMConfig(
                    max_event_len=self.cfg.max_event_len,
                    ct=self.cfg.ct,
                    lower_bound=self.cfg.lower_bound,
                    upper_bound=self.cfg.upper_bound,
                    shards_per_group=self.cfg.shards_per_group,
                ),
            )[0]

    @dataclass
    class TfIdfConfig:
        lowercase: bool = True
        smooth_idf: bool = True
        min_df: int = 1
        sublinear_tf: bool = False

    class _TfIdfAlgo:
        def __init__(self, cfg: TfIdfConfig):
            self.cfg = cfg
            self.idf_table = None

        def fit(self, df, text_col="logline"):
            from logai_spark.functions.vectorizers import tfidf_fit

            self.idf_table = tfidf_fit(
                df, text_col, self.cfg.lowercase, self.cfg.smooth_idf, self.cfg.min_df
            ).cache()
            return self

        def transform(self, df, text_col="logline", id_col="doc_id", **kw):
            from logai_spark.functions.vectorizers import tfidf_transform

            return tfidf_transform(
                df, self.idf_table, text_col, id_col,
                self.cfg.lowercase, self.cfg.sublinear_tf, **kw
            )

    @dataclass
    class SeriesDetectorConfig:
        """Shared knobs for the per-series ETS/DBL detectors
        (reference ets.py:55-145, dbl.py:46-122)."""

        train_frac: float = 0.7
        n_sigma: float = 3.0
        seasonal_periods: int | None = None
        # DBL seasonal baselines (Merlion DynamicBaselineConfig trends/wind_sz)
        trends: list | None = None
        wind_sz_minutes: int = 60

    def _series_algo(algo_name: str):
        class _SeriesAlgo:
            def __init__(self, cfg: SeriesDetectorConfig):
                self.cfg = cfg

            def fit_predict(self, df, key_cols, ts_col="timestamp", value_col="counts"):
                from logai_spark.operators.anomaly import detect_anomalies_per_series

                return detect_anomalies_per_series(
                    df, key_cols, ts_col=ts_col, value_col=value_col,
                    train_frac=self.cfg.train_frac, n_sigma=self.cfg.n_sigma,
                    algo=algo_name, seasonal_periods=self.cfg.seasonal_periods,
                    trends=self.cfg.trends,
                    wind_sz_minutes=self.cfg.wind_sz_minutes,
                )

        return _SeriesAlgo

    @dataclass
    class ForecastConfig:
        """Linear next-event forecaster (operators/forecast.py) — the
        torch-free stand-in for the reference's forecast_nn detectors
        (forecast_nn.py:76-115), same DeepLog top-g decision rule."""

        vocab_size: int = 100
        g: int = 3
        lr: float | None = None  # None = per-arch default (2.0 GD / 1e-2 Adam)
        iters: int = 200
        hidden: int | None = None  # MLP width; None = linear
        # 'auto' = torch-free linear/MLP stand-ins; 'torch_lstm' /
        # 'torch_cnn' / 'torch_transformer' = the reference-shaped deep
        # adapters, nn_model/forecast_nn/* (need torch installed)
        arch: str = "auto"

    @dataclass
    class MLPForecastConfig(ForecastConfig):
        """The one-hidden-layer variant (operators/forecast.py
        MLPNextEventModel): same DeepLog rule, extra capacity for
        conjunction/long-range grammars a linear softmax cannot express."""

        hidden: int | None = 64

    class _ForecastAlgo:
        def __init__(self, cfg: ForecastConfig):
            self.cfg = cfg
            self.model = None

        def fit(self, df, window_col="window_ids", next_col="next_id"):
            from logai_spark.operators.forecast import fit_next_event_model

            self.model = fit_next_event_model(
                df, self.cfg.vocab_size, window_col, next_col,
                lr=self.cfg.lr, iters=self.cfg.iters, hidden=self.cfg.hidden,
                arch=getattr(self.cfg, "arch", "auto"),
            )
            return self

        def predict(self, df, window_col="window_ids", next_col="next_id"):
            from logai_spark.operators.forecast import score_next_event

            return score_next_event(df, self.model, window_col, next_col, self.cfg.g)

    @dataclass
    class MaskedEventConfig:
        """Masked-event detector (operators/forecast.py) — the torch-free
        stand-in for the reference's LogBERT AD (logbert.py:17-41 +
        nn_model/logbert/predict.py): per-position masked-LM loss with the
        same per-instance aggregates (max/sum/num loss, top6_*).
        ``mask_ngram`` analog: positions are masked singly (reference
        default mask_ngram=1, configs.py:45)."""

        vocab_size: int = 100
        radius: int = 2
        top_k: int = 6
        lr: float | None = None
        iters: int = 200
        # 'auto' = torch-free masked-softmax stand-in (runs everywhere);
        # 'torch_transformer' = the LogBERT adapter proper (BERT-style MLM
        # over the masked context; needs torch installed)
        arch: str = "auto"

    class _MaskedEventAlgo:
        def __init__(self, cfg: MaskedEventConfig):
            self.cfg = cfg
            self.model = None

        def fit(self, df, seq_col="session_ids"):
            from logai_spark.operators.forecast import fit_masked_event_model

            self.model = fit_masked_event_model(
                df, self.cfg.vocab_size, seq_col, self.cfg.radius,
                lr=self.cfg.lr, iters=self.cfg.iters, arch=self.cfg.arch,
            )
            return self

        def predict(self, df, seq_col="session_ids", id_col="session_id"):
            from logai_spark.operators.forecast import score_masked_sessions

            return score_masked_sessions(
                df, self.model, seq_col, id_col, self.cfg.radius, self.cfg.top_k
            )

    @dataclass
    class DivergenceConfig:
        n_bins: int = 10

    class _DivergenceAlgo:
        def __init__(self, cfg: DivergenceConfig):
            self.cfg = cfg

        def compare(self, train, test, value_col):
            from logai_spark.operators.anomaly import distribution_divergence

            return distribution_divergence(train, test, value_col, self.cfg.n_bins)

    @dataclass
    class Word2VecConfig:
        dim: int = 16
        min_count: int = 1
        seed: int = 42
        max_token_len: int = 100

    class _Word2VecAlgo:
        def __init__(self, cfg: Word2VecConfig):
            self.cfg = cfg
            self.vectors = None

        def fit(self, df, line_col="logline"):
            from pyspark.sql import functions as F

            from logai_spark.functions.vectorizers import word2vec_embeddings

            toks = F.filter(
                F.split(F.lower(F.col(line_col)), " "),
                lambda t: (t != "") & (t != "*"),
            )
            _, vecs = word2vec_embeddings(
                df.select(toks.alias("_toks")), "_toks",
                dim=self.cfg.dim, min_count=self.cfg.min_count, seed=self.cfg.seed,
            )
            from pyspark.ml.functions import vector_to_array

            self.vectors = vecs.select(
                "word", vector_to_array("vector").alias("vector")
            ).cache()
            return self

        def transform(self, df, line_col="logline", id_col="doc_id"):
            from logai_spark.functions.vectorizers import word2vec_transform

            return word2vec_transform(
                df, self.vectors, line_col, id_col, self.cfg.max_token_len
            )

    @dataclass
    class SequentialConfig:
        max_len: int = 10
        sep: str = " [SEP] "

    class _SequentialAlgo:
        def __init__(self, cfg: SequentialConfig):
            self.cfg = cfg
            self.vocab = None

        def fit(self, df, line_col="logline"):
            from logai_spark.functions.vectorizers import sequential_vocab

            self.vocab = sequential_vocab(df, line_col).cache()
            return self

        def transform(self, df, session_col="session_text"):
            from logai_spark.functions.vectorizers import sequential_transform

            return sequential_transform(
                df, self.vocab, session_col, self.cfg.sep, self.cfg.max_len
            )

    @dataclass
    class SemanticConfig:
        max_len: int = 10
        dim: int = 16
        min_count: int = 1

    class _SemanticAlgo:
        def __init__(self, cfg: SemanticConfig):
            self.cfg = cfg
            self.matrix = None  # [token, token_id, vector] (semantic.py:114-178)

        def fit(self, df, line_col="logline"):
            from logai_spark.functions.vectorizers import semantic_embedding_matrix

            self.matrix = semantic_embedding_matrix(
                df, line_col, self.cfg.dim, self.cfg.min_count
            ).cache()
            return self

        def transform(self, df, line_col="logline"):
            from logai_spark.functions.vectorizers import semantic_transform

            return semantic_transform(df, self.matrix, line_col, self.cfg.max_len)

    @dataclass
    class LogBERTVectorizerConfig:
        """LogBERT vectorizer capability (vectorization_algo/logbert.py:
        24-49): frequency-built vocab capped at ``max_vocab_size``, OOV
        mapping, truncation/padding to ``max_token_len``. The learned
        WordPiece subword merges live in the 'wordpiece' vectorizer
        (functions/wordpiece.py, torch-free re-expression of the HF
        training the reference delegates to)."""

        max_token_len: int = 384
        max_vocab_size: int = 5000
        min_count: int = 1

    class _LogBERTVecAlgo:
        def __init__(self, cfg: LogBERTVectorizerConfig):
            self.cfg = cfg
            self.vocab = None
            self.oov = None

        def fit(self, df, line_col="logline"):
            from pyspark.sql import functions as F

            from logai_spark.functions.vectorizers import semantic_vocab

            self.vocab = semantic_vocab(df, line_col, self.cfg.min_count).filter(
                F.col("token_id") < self.cfg.max_vocab_size
            )
            # OOV/pad id = ACTUAL vocab row count (repo-wide contract,
            # sequential.py:96-99 semantics) — not max_vocab_size, which
            # would leave downstream one-hot consumers sized 5001 for a
            # 121-token corpus.
            self.oov = self.vocab.count()
            return self

        def transform(self, df, line_col="logline"):
            from logai_spark.functions.vectorizers import semantic_transform

            return semantic_transform(
                df, self.vocab, line_col, self.cfg.max_token_len,
                oov_id=self.oov,
            )

    @dataclass
    class WordPieceVectorizerConfig:
        """Learned-subword tokenizer capability (the WordPiece training the
        reference delegates to HF — vectorization_algo/logbert.py:87-146 /
        nn_model/logbert/tokenizer_utils.py — re-expressed torch-free in
        functions/wordpiece.py: distributed word-count aggregate + driver
        merge loop + broadcast-vocab distributed encode)."""

        vocab_size: int = 5000
        lowercase: bool = True
        min_frequency: int = 1
        max_words: int | None = 1_000_000

    class _WordPieceVecAlgo:
        def __init__(self, cfg: WordPieceVectorizerConfig):
            self.cfg = cfg
            self.vocab: list[str] | None = None

        def fit(self, df, line_col="logline"):
            from logai_spark.functions.wordpiece import fit_wordpiece

            self.vocab = fit_wordpiece(
                df,
                text_col=line_col,
                vocab_size=self.cfg.vocab_size,
                lowercase=self.cfg.lowercase,
                min_frequency=self.cfg.min_frequency,
                max_words=self.cfg.max_words,
            )
            return self

        def transform(self, df, line_col="logline"):
            from logai_spark.functions.wordpiece import wordpiece_encode

            return wordpiece_encode(df, self.vocab, text_col=line_col)

    @dataclass
    class ForecastNNVectorizerConfig:
        """ForecastNN vectorizer (vectorization_algo/forecast_nn.py:24-218):
        sequential line ids per window plus the {session_idx, features,
        window_anomalies, window_labels} record the NN trainers consume —
        assembled as a struct column with those exact field names."""

        max_len: int = 10
        sep: str = " [SEP] "

    class _ForecastNNVecAlgo:
        def __init__(self, cfg: ForecastNNVectorizerConfig):
            self.cfg = cfg
            self.vocab = None
            self.oov = None

        def fit(self, df, line_col="logline"):
            from logai_spark.functions.vectorizers import sequential_vocab

            self.vocab = sequential_vocab(df, line_col)
            self.oov = self.vocab.count()
            return self

        def transform(
            self,
            windows,
            session_col="window_text",
            idx_col="span_id",
            anomaly_col=None,
            label_col="window_label",
        ):
            from pyspark.sql import functions as F

            from logai_spark.functions.vectorizers import sequential_transform

            out = sequential_transform(
                windows, self.vocab, session_col, self.cfg.sep,
                self.cfg.max_len, oov_id=self.oov,
            )
            anom = F.col(anomaly_col) if anomaly_col else F.lit(None).cast("int")
            return out.withColumn(
                "forecast_nn_record",
                F.struct(
                    F.col(idx_col).alias("session_idx"),
                    F.col("token_ids").alias("features"),
                    anom.alias("window_anomalies"),
                    F.col(label_col).alias("window_labels"),
                ),
            )

    @dataclass
    class FastTextConfig:
        dim: int = 16
        min_count: int = 1
        seed: int = 42
        min_n: int = 3
        max_n: int = 5
        max_token_len: int = 100
        # trained=True (default) runs the real subword skip-gram trainer
        # (functions/fasttext.py: per-partition SGNS + parameter averaging,
        # learned ngram-bucket vectors — the fastText capability the
        # reference gets from gensim, fasttext.py:45-117). trained=False
        # keeps the cheaper round-3 approximation (Spark-ML Word2Vec word
        # vectors + per-ngram averages composed AFTER training).
        trained: bool = True
        window: int = 5
        negative: int = 5
        epochs: int = 3
        bucket: int = 20_000
        lr: float = 0.05
        # parameter-averaging fan-out; None = input partitioning. Scale
        # with corpus size, not cluster size (see train_fasttext docstring).
        num_partitions: int | None = None

    class _FastTextAlgo:
        """FastText vectorizer (reference fasttext.py:45-117). Default path
        TRAINS subword skip-gram from scratch (functions/fasttext.py);
        word vectors surface as the same (word, vector) table the Word2Vec
        algo produces, so transform shares word2vec_transform. OOV words
        compose from the LEARNED ngram buckets."""

        def __init__(self, cfg: FastTextConfig):
            self.cfg = cfg
            self.vectors = None
            self.subwords = None
            self.model = None

        def fit(self, df, line_col="logline"):
            from pyspark.sql import functions as F

            toks = F.filter(
                F.split(F.lower(F.col(line_col)), " "),
                lambda t: (t != "") & (t != "*"),
            )
            if self.cfg.trained:
                from logai_spark.functions.fasttext import (
                    fasttext_vectors_df,
                    train_fasttext,
                )

                self.model = train_fasttext(
                    df.select(toks.alias("_toks")), "_toks",
                    dim=self.cfg.dim, window=self.cfg.window,
                    negative=self.cfg.negative, epochs=self.cfg.epochs,
                    lr=self.cfg.lr, min_count=self.cfg.min_count,
                    min_n=self.cfg.min_n, max_n=self.cfg.max_n,
                    bucket=self.cfg.bucket, seed=self.cfg.seed,
                    num_partitions=self.cfg.num_partitions,
                )
                self.vectors = fasttext_vectors_df(
                    self.model, df.sparkSession
                ).cache()
                return self

            from logai_spark.functions.vectorizers import (
                fasttext_subword_vectors,
                word2vec_embeddings,
            )

            _, vecs = word2vec_embeddings(
                df.select(toks.alias("_toks")), "_toks",
                dim=self.cfg.dim, min_count=self.cfg.min_count, seed=self.cfg.seed,
            )
            from pyspark.ml.functions import vector_to_array

            self.vectors = vecs.select(
                "word", vector_to_array("vector").alias("vector")
            ).cache()
            self.subwords = fasttext_subword_vectors(
                self.vectors, min_n=self.cfg.min_n, max_n=self.cfg.max_n
            ).cache()
            return self

        def transform(self, df, line_col="logline", id_col="doc_id"):
            from logai_spark.functions.vectorizers import word2vec_transform

            return word2vec_transform(
                df, self.vectors, line_col, id_col, self.cfg.max_token_len
            )

        def oov_vectors(self, words):
            if self.cfg.trained:
                from logai_spark.functions.fasttext import fasttext_oov_vectors_df

                return fasttext_oov_vectors_df(words, self.model)
            from logai_spark.functions.vectorizers import compose_oov_vectors

            return compose_oov_vectors(
                words, self.subwords, min_n=self.cfg.min_n, max_n=self.cfg.max_n
            )

    @dataclass
    class KMeansConfig:
        k: int = 8
        seed: int = 42
        max_iter: int = 20

    class _KMeansAlgo:
        """Spark-ML KMeans over an array<double> feature column."""

        def __init__(self, cfg: KMeansConfig):
            self.cfg = cfg
            self.model = None

        def fit(self, df, features_col="features"):
            from pyspark.ml.clustering import KMeans
            from pyspark.ml.functions import array_to_vector

            vecs = df.withColumn("_v", array_to_vector(features_col))
            self.model = KMeans(
                k=self.cfg.k, seed=self.cfg.seed, maxIter=self.cfg.max_iter,
                featuresCol="_v", predictionCol="cluster_id",
            ).fit(vecs)
            return self

        def predict(self, df, features_col="features"):
            from pyspark.ml.functions import array_to_vector

            vecs = df.withColumn("_v", array_to_vector(features_col))
            return self.model.transform(vecs).drop("_v")

    factory.register("parsing", "drain", DrainConfig)(_DrainAlgo)
    factory.register("parsing", "ael", AELConfig)(_AELAlgo)
    factory.register("parsing", "iplom", IPLoMFactoryConfig)(_IPLoMAlgo)
    factory.register("detection", "isolation_forest", IsolationForestConfig)(_IFAlgo)
    factory.register("detection", "lof", LOFConfig)(_LOFAlgo)
    factory.register("detection", "one_class_svm", OCSVMConfig)(_OCSVMAlgo)
    factory.register("clustering", "dbscan", DBSCANConfig)(_DBSCANAlgo)
    factory.register("clustering", "birch", BirchConfig)(_BirchAlgo)
    factory.register("vectorization", "tfidf", TfIdfConfig)(_TfIdfAlgo)
    factory.register("clustering", "kmeans", KMeansConfig)(_KMeansAlgo)
    factory.register("detection", "ets", SeriesDetectorConfig)(_series_algo("ets"))
    factory.register("detection", "dbl", SeriesDetectorConfig)(_series_algo("dbl"))
    factory.register("detection", "distribution_divergence", DivergenceConfig)(
        _DivergenceAlgo
    )
    factory.register("detection", "forecast_next_event", ForecastConfig)(_ForecastAlgo)
    factory.register("detection", "forecast_next_event_mlp", MLPForecastConfig)(
        _ForecastAlgo
    )
    factory.register("detection", "logbert", MaskedEventConfig)(_MaskedEventAlgo)
    factory.register("vectorization", "word2vec", Word2VecConfig)(_Word2VecAlgo)
    factory.register("vectorization", "sequential", SequentialConfig)(_SequentialAlgo)
    factory.register("vectorization", "semantic", SemanticConfig)(_SemanticAlgo)
    factory.register("vectorization", "fasttext", FastTextConfig)(_FastTextAlgo)
    factory.register("vectorization", "logbert", LogBERTVectorizerConfig)(
        _LogBERTVecAlgo
    )
    factory.register("vectorization", "forecast_nn", ForecastNNVectorizerConfig)(
        _ForecastNNVecAlgo
    )
    factory.register("vectorization", "wordpiece", WordPieceVectorizerConfig)(
        _WordPieceVecAlgo
    )


_register_builtins()
