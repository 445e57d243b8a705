"""Sources: csv/tsv/json scans and the grok-style free-text log reader.

Parity target: ``FileDataLoader``
(/root/reference/logai/dataloader/data_loader.py:33-160): a ``log_format``
template like ``"<Date> <Time> <Pid> <Level> <Content>"`` compiles to a
named-group regex applied per line; configured ``dimensions`` map raw columns
onto the canonical log-record fields (multi-column body/timestamp fields are
space-concatenated, data_loader.py:116-150).

Spark shape: ``spark.read.text`` + one ``regexp_extract`` per group — all
JVM-side; unmatched lines (regexp_extract yields '' for every group) are split
off for a dead-letter sink instead of being dropped with a log line
(data_loader.py:96-106).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

LOGLINE = "logline"
SPAN_ID = "span_id"
LABELS = "labels"
TIMESTAMP = "timestamp"


def grok_to_regex(log_format: str) -> tuple[str, list[str]]:
    """``"<A> <B>"`` -> ``^(?P<A>.*?)\\s+(?P<B>.*?)$`` plus header list.

    Same template grammar as the reference (data_loader.py:81-91): literal
    text between ``<...>`` groups is kept, runs of spaces become ``\\s+``.
    Java regex (Spark) does not need the (?P<>) names — we return group order.
    """
    parts = re.split(r"(<[^<>]+>)", log_format)
    headers: list[str] = []
    regex = ""
    for i, part in enumerate(parts):
        if i % 2 == 0:
            regex += re.sub(" +", r"\\s+", re.escape(part).replace(r"\ ", " "))
        else:
            headers.append(part.strip("<>").strip())
            regex += "(.*?)"
    return "^" + regex + "$", headers


def read_grok_text(
    spark: SparkSession, path: str, log_format: str
) -> tuple[DataFrame, DataFrame]:
    """Read a free-text log file into columns per the grok template.

    Returns (matched, dead_letter). ``matched`` has one string column per
    template field; ``dead_letter`` keeps the raw unparseable lines.
    """
    pattern, headers = grok_to_regex(log_format)
    raw = spark.read.text(path).withColumn("value", F.trim("value"))
    flagged = raw.withColumn("_ok", F.col("value").rlike(pattern))
    matched = flagged.filter("_ok").select(
        *[
            F.regexp_extract("value", pattern, i + 1).alias(h)
            for i, h in enumerate(headers)
        ]
    )
    dead = flagged.filter(~F.col("_ok")).select(F.col("value").alias("raw"))
    return matched, dead


@dataclass
class DataLoaderConfig:
    """Mirrors the reference loader config (data_loader.py:19-31)."""

    filepath: str = ""
    log_type: str = "csv"  # csv | tsv | json | log (grok free-text)
    dimensions: dict[str, list[str]] = field(default_factory=dict)
    reader_args: dict = field(default_factory=dict)
    infer_datetime: bool = True
    datetime_format: str | None = None  # in Spark's to_timestamp grammar


def load_data(spark: SparkSession, config: DataLoaderConfig) -> DataFrame:
    """Load a file into the canonical log-record frame.

    Output columns: ``logline`` (body, multi-cols space-joined), ``timestamp``
    (parsed when configured), ``span_id``, ``labels``, plus attribute columns
    under their raw names — the Spark analog of LogRecordObject
    (SURVEY.md §1.2: one DataFrame, not nine parallel frames).
    """
    lt = config.log_type.lower()
    reader_args = dict(config.reader_args)
    schema_names = reader_args.pop("schema_names", None)
    if lt == "csv":
        reader_args.setdefault("header", "false" if schema_names else "true")
        reader = spark.read.options(**reader_args)
        df = reader.csv(config.filepath)
        if schema_names:
            df = df.toDF(*schema_names)
    elif lt == "tsv":
        reader_args.setdefault("header", "true")
        df = spark.read.options(sep="\t", **reader_args).csv(config.filepath)
    elif lt == "json":
        df = spark.read.options(**config.reader_args).json(config.filepath)
    elif lt == "log":
        df, _dead = read_grok_text(
            spark, config.filepath, reader_args["log_format"]
        )
    else:
        raise ValueError(f"unsupported log_type {config.log_type}")

    dims = config.dimensions
    if not dims:
        return df.select(F.concat_ws(" ", *df.columns).alias(LOGLINE))

    cols: list = []
    for fld, raw_cols in dims.items():
        if fld == "body":
            cols.append(F.concat_ws(" ", *raw_cols).alias(LOGLINE))
        elif fld == "timestamp":
            ts = F.concat_ws(" ", *raw_cols)
            if config.infer_datetime and config.datetime_format:
                ts = F.to_timestamp(ts, config.datetime_format)
            cols.append(ts.alias(TIMESTAMP))
        elif fld == "span_id":
            if len(raw_cols) != 1:
                raise ValueError("span_id must be a single column")
            cols.append(F.col(raw_cols[0]).alias(SPAN_ID))
        elif fld == "labels":
            cols.append(F.col(raw_cols[0]).alias(LABELS))
        elif fld == "attributes":
            cols.extend(F.col(c) for c in raw_cols)
    return df.select(*cols)


def load_openset(spark: SparkSession, dataset: str, filepath: str) -> DataFrame:
    """Config-driven open-dataset loader (OpenSetDataLoader parity,
    /root/reference/logai/dataloader/openset_data_loader.py:17-53): the
    per-dataset JSON configs under ``sources/openset_configs/`` carry the
    dimension mapping, grok format, and datetime grammar (translated to
    Spark's to_timestamp patterns).

    Configs are read through ``importlib.resources`` so the loader works
    when the package ships as a ``--py-files`` zip (the spark-submit ship
    surface), where ``__file__``-relative ``open()`` would fail."""
    import importlib.resources
    import json

    res = (
        importlib.resources.files("logai_spark.sources")
        / "openset_configs"
        / f"{dataset.lower()}.json"
    )
    raw = json.loads(res.read_text())
    cfg = DataLoaderConfig(
        filepath=filepath,
        log_type=raw["log_type"],
        dimensions=raw["dimensions"],
        reader_args=raw.get("reader_args", {}),
        infer_datetime=raw.get("infer_datetime", True),
        datetime_format=raw.get("datetime_format"),
    )
    return load_data(spark, cfg)
