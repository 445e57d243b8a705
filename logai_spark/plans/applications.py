"""Application facades: the reference's three end-to-end workflows on Spark.

Parity targets:
- LogAnomalyDetection (/root/reference/logai/applications/
  log_anomaly_detection.py:112-212): load -> clean -> parse -> counter
  features -> (time-series path per attribute | feature path with
  vectorize+encode+detector) -> anomalous rows via group back-join.
- AutoLogSummarization (auto_log_summarization.py:116-146 + lookups
  :47-114): parsed-table index with template/parameter lookups.
- LogClustering (log_clustering.py:68-122): clean -> parse -> vectorize ->
  encode -> pad -> cluster.

Each ``execute`` builds one lazy DataFrame DAG; results stay distributed
(DataFrames), unlike the reference's in-memory pandas properties.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from logai_spark.operators.anomaly import (
    detect_anomalies_per_series,
    fit_isolation_forest,
    score_with_model,
)
from logai_spark.operators.features import counter_vector, feature_vector_mean
from logai_spark.parse.distributed import parameter_list_expr, parse_df
from logai_spark.parse.drain import DrainConfig
from logai_spark.preprocess import PreprocessorConfig, clean_log

COUNTER_AD_ALGOS = ("ets", "dbl")  # reference constants.py:41


@dataclass
class WorkFlowConfig:
    """Slimmed analog of the reference WorkFlowConfig
    (applications/application_interfaces.py:25-121), driving the Spark DAG."""

    preprocessor: PreprocessorConfig = field(default_factory=PreprocessorConfig)
    drain: DrainConfig = field(default_factory=DrainConfig)
    attributes: list[str] = field(default_factory=list)
    ts_col: str | None = "timestamp"
    freq: str = "5 minutes"
    ad_algo: str = "isolation_forest"  # or ets | dbl
    train_frac: float = 0.7
    n_sigma: float = 3.0
    anomaly_threshold_quantile: float = 0.05

    @classmethod
    def from_dict(cls, d: dict) -> "WorkFlowConfig":
        cfg = cls()
        if "preprocessor" in d:
            cfg.preprocessor = PreprocessorConfig(**d["preprocessor"])
        if "drain" in d:
            cfg.drain = DrainConfig(**d["drain"])
        for k in ("attributes", "ts_col", "freq", "ad_algo", "train_frac", "n_sigma"):
            if k in d:
                setattr(cfg, k, d[k])
        return cfg


class LogAnomalyDetection:
    """load -> clean -> parse -> counter vector -> detector -> anomalous rows
    (log_anomaly_detection.py:112-212)."""

    def __init__(self, config: WorkFlowConfig):
        self.config = config
        self.templates: list[tuple[str, int]] = []

    def execute(self, df: DataFrame) -> DataFrame:
        """``df`` needs ``logline`` plus configured attribute/ts columns.
        Returns the input rows with is_anomaly flags (the reference's
        ``anomaly_results`` property, :74-76)."""
        cfg = self.config
        cleaned = clean_log(df, "logline", cfg.preprocessor)
        parsed, self.templates = parse_df(cleaned, "logline", cfg.drain)
        keys = ["template_id", *cfg.attributes]

        if cfg.ad_algo in COUNTER_AD_ALGOS:
            # time-series path (:132-162): per-(template, attrs) counter
            # series, per-series detector via applyInPandas
            counters = counter_vector(parsed, keys, cfg.ts_col, cfg.freq)
            scored = detect_anomalies_per_series(
                counters,
                keys,
                "timestamp",
                "counts",
                train_frac=cfg.train_frac,
                n_sigma=cfg.n_sigma,
                algo=cfg.ad_algo,
            )
            anomalous_groups = scored.filter(F.col("is_anomaly") == 1).select(*keys).distinct()
            # group back-join (:197-210): mark member rows of anomalous groups
            return parsed.join(
                F.broadcast(anomalous_groups.withColumn("is_anomaly", F.lit(1))),
                keys,
                "left",
            ).fillna({"is_anomaly": 0})

        # feature path (:164-195): counter features per group -> driver-fit
        # isolation forest -> broadcast scoring -> back-join
        counters = counter_vector(parsed, keys, cfg.ts_col, cfg.freq)
        model = fit_isolation_forest(
            counters, ["counts"], contamination=cfg.anomaly_threshold_quantile
        )
        scored = score_with_model(counters, model, ["counts"])
        anomalous_groups = scored.filter(F.col("is_anomaly") == 1).select(*keys, "timestamp")
        bucket = F.window(F.col(cfg.ts_col), cfg.freq).start.alias("timestamp")
        fact = parsed.withColumn("timestamp_bucket", bucket)
        marked = fact.join(
            F.broadcast(
                anomalous_groups.withColumnRenamed("timestamp", "timestamp_bucket")
                .withColumn("is_anomaly", F.lit(1))
            ),
            [*keys, "timestamp_bucket"],
            "left",
        )
        return marked.fillna({"is_anomaly": 0}).drop("timestamp_bucket")


class AutoLogSummarization:
    """Parsed-table index + pattern/parameter lookups
    (auto_log_summarization.py:47-114)."""

    def __init__(self, config: WorkFlowConfig):
        self.config = config
        self.parsed: DataFrame | None = None
        self.templates: list[tuple[str, int]] = []

    def execute(self, df: DataFrame) -> DataFrame:
        cleaned = clean_log(df, "logline", self.config.preprocessor)
        parsed, self.templates = parse_df(cleaned, "logline", self.config.drain)
        self.parsed = parsed.withColumn(
            "parameter_list", parameter_list_expr("logline", "template")
        ).cache()
        return self.parsed

    def log_patterns(self) -> DataFrame:
        """Distinct templates (:47-50)."""
        return self.parsed.select("template", "template_id").distinct()

    def get_parameter_list(self, log_pattern: str) -> DataFrame:
        """Positional parameter summary for one template (:52-77):
        posexplode the parameter lists, aggregate values per position."""
        rows = self.parsed.filter(F.col("template") == log_pattern)
        return (
            rows.select(F.posexplode("parameter_list").alias("position", "value"))
            .groupBy("position")
            .agg(
                F.count(F.lit(1)).alias("value_counts"),
                F.collect_list("value").alias("values"),
            )
            .withColumn("position", F.concat(F.lit("POSITION_"), F.col("position")))
        )

    def find_log_pattern(self, logline: str) -> str | None:
        """Point lookup (:91-114) — a filter on the parsed index."""
        row = self.parsed.filter(F.col("logline") == logline).select("template").first()
        return row["template"] if row else None


class LogClustering:
    """clean -> parse -> tfidf -> pad/assemble (+ encoded attrs) -> kmeans
    (log_clustering.py:68-122)."""

    def __init__(self, config: WorkFlowConfig, k: int = 8, max_len: int = 100):
        self.config = config
        self.k = k
        self.max_len = max_len  # reference MAX_LEN=100 (log_clustering.py:38)

    def execute(self, df: DataFrame) -> DataFrame:
        from logai_spark.functions.encoders import label_encode
        from logai_spark.functions.vectorizers import (
            pad_array,
            tfidf_fit,
            tfidf_transform,
        )
        from logai_spark.plans.factory import factory

        cfg = self.config
        cleaned = clean_log(df, "logline", cfg.preprocessor)
        parsed, _ = parse_df(cleaned, "logline", cfg.drain)
        # content-hash row key, NOT a global row_number window (which would
        # funnel the whole fact table through one task and depends on
        # retry-unstable monotonically_increasing_id). Identical content rows
        # share a key on purpose: their features and cluster are identical,
        # so vectorization runs once per distinct content and the final join
        # fans the cluster id back out to every duplicate row.
        key_cols = ["logline", "template"] + list(cfg.attributes or [])
        # 128-bit content key: at the 10^9+-row scale this targets, a 64-bit
        # hash has birthday collisions (~0.3% at 10^9 keys) that would fan out
        # the final join and assign the partner's cluster; md5 over the
        # null-safe JSON encoding makes that probability negligible.
        parsed = parsed.withColumn(
            "row_id", F.md5(F.to_json(F.struct(*key_cols)))
        )
        distinct_rows = parsed.select("row_id", "template", *(cfg.attributes or [])).distinct()

        # idf is fit on the FULL table (duplicates count toward document
        # frequency, reference semantics); transform runs per distinct row
        idf = tfidf_fit(parsed, "template")
        vecs = tfidf_transform(distinct_rows, idf, "template", "row_id", dense=True)
        feats = vecs.withColumn(
            "features", pad_array(F.col("dense"), self.max_len, 0.0)
        ).select("row_id", "features")
        if cfg.attributes:
            encoded = label_encode(parsed, cfg.attributes)
            attr_vec = F.array(
                *[F.col(f"{c}_categorical").cast("double") for c in cfg.attributes]
            )
            # distinct: row_id keys distinct content, parsed carries one row
            # per duplicate — without it the join would fan out
            enc = encoded.select("row_id", attr_vec.alias("_attrs")).distinct()
            feats = feats.join(enc, "row_id").withColumn(
                "features", F.concat("features", "_attrs")
            ).drop("_attrs")

        km = factory.get_algorithm(
            "clustering", "kmeans", factory.get_config("clustering", "kmeans", {"k": self.k})
        )
        km.fit(feats)
        clusters = km.predict(feats).select("row_id", "cluster_id")
        return parsed.join(clusters, "row_id")
