"""logai_spark — a from-scratch PySpark-native log/telemetry analytics engine.

Re-expresses the query and data-processing capabilities of salesforce/logai
(parse -> enrich -> route -> aggregate, plus vectorization / anomaly scoring /
clustering support operators) as idiomatic Spark DataFrame pipelines:

- declarative plans (Catalyst handles pushdown/pruning/join selection),
- Arrow-vectorized pandas UDFs for the genuinely non-relational pieces
  (Drain template mining, model scoring), never per-row Python UDFs,
- broadcast hash joins for dimension enrichment,
- partitioned fan-out sinks with per-partition lineage manifests,
- explicit skew handling (salting + AQE).

The reference implementation being matched is the pandas-based LogAI library;
file:line citations in docstrings point at /root/reference for parity checks.
"""

__version__ = "0.1.0"
