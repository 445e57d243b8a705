from logai_spark.plans.factory import AlgorithmFactory, factory
from logai_spark.plans.applications import (
    LogAnomalyDetection,
    AutoLogSummarization,
    LogClustering,
    WorkFlowConfig,
)

__all__ = [
    "AlgorithmFactory",
    "factory",
    "LogAnomalyDetection",
    "AutoLogSummarization",
    "LogClustering",
    "WorkFlowConfig",
]
