"""Table-format selection: Iceberg when the runtime is present, parquet
otherwise.

The north-star deployment reads/writes Iceberg tables (snapshot isolation,
hidden partitioning, compaction — what a resumable 10^12-row pipeline wants
under it). The sandbox image has no Iceberg runtime jar and no network to
fetch one, so the engine DETECTS support at session build (SURVEY.md §7.0)
and transparently falls back to plain parquet paths: every operator in this
repo addresses tables through these two functions, so pointing the engine at
a real cluster with `--packages org.apache.iceberg:iceberg-spark-runtime-*`
switches the storage layer without touching operator code.

On an Iceberg-enabled cluster also set:
    spark.sql.catalog.logai=org.apache.iceberg.spark.SparkCatalog
    spark.sql.catalog.logai.type=hadoop
    spark.sql.catalog.logai.warehouse=<warehouse uri>
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

_CACHE: dict[int, bool] = {}


def iceberg_available(spark: SparkSession) -> bool:
    """True iff the Iceberg Spark runtime is on the JVM classpath."""
    key = id(spark)
    if key not in _CACHE:
        try:
            spark._jvm.java.lang.Class.forName(
                "org.apache.iceberg.spark.SparkCatalog"
            )
            _CACHE[key] = True
        except Exception:
            _CACHE[key] = False
    return _CACHE[key]


def table_format(spark: SparkSession) -> str:
    return "iceberg" if iceberg_available(spark) else "parquet"


def write_table(
    df: DataFrame,
    target: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> str:
    """Write ``df`` as an Iceberg table (identifier target) when the runtime
    is present, else as parquet (path target). Returns the format used."""
    fmt = table_format(df.sparkSession)
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if fmt == "iceberg":
        writer.format("iceberg").saveAsTable(target)
    else:
        writer.parquet(target)
    return fmt


def read_table(spark: SparkSession, target: str) -> DataFrame:
    if iceberg_available(spark):
        try:
            return spark.read.format("iceberg").load(target)
        except Exception:
            pass  # identifier may be a plain path written pre-upgrade
    return spark.read.parquet(target)
