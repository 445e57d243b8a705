"""CSV sink/source with a field-map metadata sidecar.

Parity target: the reference's LogRecordObject persistence
(/root/reference/logai/dataloader/data_model.py:111-132): ``save_to_csv``
writes the joined frame as CSV plus a ``*_metadata.json`` sidecar holding
the {field: [columns]} map; ``load_from_csv`` inverts it. Here the "record"
is one DataFrame (SURVEY §1.2 — the nine parallel frames collapse into one
schema), so the sidecar carries the OTel-field -> column-name mapping that
lets a loader reconstruct the logical record fields from the flat CSV.

Spark shape: ``df.write.csv`` (header, distributed, one part file per
partition — at web scale a CSV interchange dump is partitioned like any
sink; the reference's single-file semantics are a driver-side convenience
this deliberately does not reproduce). The parquet+manifest checkpoint path
(operators/route.checkpoint) remains the engine-native persistence; this
module exists for interchange parity with reference tooling.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession

#: the reference's LogRecordObject field names (data_model.py:37-45)
RECORD_FIELDS = (
    "timestamp", "attributes", "resource", "trace_id", "span_id",
    "severity_text", "severity_number", "body", "labels",
)


def _sidecar_path(path: str) -> str:
    # The sidecar is written/read with builtin open(): LOCAL (or shared
    # POSIX) filesystems only. Fail before the expensive CSV write rather
    # than after it — an object-store sink would succeed and then strand a
    # CSV with no sidecar. Remote interchange belongs to the parquet
    # checkpoint path (operators/route.checkpoint).
    if "://" in path:
        raise ValueError(
            f"record_io supports local filesystem paths only (got {path!r}); "
            "the metadata sidecar uses builtin open(). Use the parquet "
            "checkpoint sink for object stores."
        )
    # single-file .csv: reference naming — suffix replaced by _metadata.json
    # (data_model.py:117-118), so reference-written records load unchanged;
    # directory sinks: sidecar sits next to the directory.
    if path.endswith(".csv"):
        return path[: -len(".csv")] + "_metadata.json"
    return path.rstrip("/") + "_metadata.json"


def save_record_csv(
    df: DataFrame, path: str, meta_data: dict[str, list[str]]
) -> None:
    """Write ``df`` as a header CSV directory plus the field-map sidecar.

    ``meta_data`` maps LogRecordObject field names to the column lists that
    realize them (reference _meta_data semantics); unknown field names or
    columns absent from ``df`` fail fast, mirroring the reference's
    KeyError on invalid fields (data_model.py:100-107).
    """
    sidecar = _sidecar_path(path)  # validates the path scheme BEFORE the write
    cols = set(df.columns)
    for field, mapped in meta_data.items():
        if field not in RECORD_FIELDS:
            raise KeyError(
                f"{field} is not a record field; valid fields: {RECORD_FIELDS}"
            )
        missing = [c for c in mapped if c not in cols]
        if missing:
            raise KeyError(f"columns {missing} for field {field} not in DataFrame")
    df.write.mode("overwrite").option("header", True).csv(path)
    # Dtype fidelity across the CSV round trip: the reference relies on pandas
    # inference (data_model.py:126-132); CSV-without-schema would read every
    # column back as string. The exact Spark schema rides in the sidecar under
    # a reserved key (ignored by reference tooling, which only reads its own
    # field names) and is re-applied on load.
    with open(sidecar, "w") as fp:
        json.dump({**meta_data, "_spark_schema": json.loads(df.schema.json())}, fp)


def load_record_csv(
    spark: SparkSession, path: str
) -> tuple[DataFrame, dict[str, list[str]]]:
    """Read the CSV directory + sidecar back: (DataFrame, field map).

    Columns are projected in sidecar order (fields in RECORD_FIELDS order,
    then any unmapped columns), so a round trip yields a stable layout.
    """
    with open(_sidecar_path(path)) as fp:
        meta_data = json.load(fp)
    schema_json = meta_data.pop("_spark_schema", None)
    if schema_json is not None:
        from pyspark.sql.types import StructType

        schema = StructType.fromJson(schema_json)
        df = spark.read.option("header", True).schema(schema).csv(path)
    else:
        # reference-written sidecar (no schema key): mirror the reference's
        # pandas dtype inference with Spark's inferSchema
        df = spark.read.option("header", True).option("inferSchema", True).csv(path)
    ordered: list[str] = []
    for field in RECORD_FIELDS:
        for c in meta_data.get(field, []):
            if c in df.columns and c not in ordered:
                ordered.append(c)
    ordered += [c for c in df.columns if c not in ordered]
    return df.select(*ordered), meta_data


def record_fields(df: DataFrame, meta_data: dict[str, list[str]], field: str) -> DataFrame:
    """Project one logical record field's columns (select_by_* analog)."""
    if field not in meta_data:
        raise KeyError(f"field {field} not present; have {sorted(meta_data)}")
    return df.select(*meta_data[field])
