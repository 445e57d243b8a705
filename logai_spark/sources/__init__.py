from logai_spark.sources.readers import (
    DataLoaderConfig,
    load_data,
    read_grok_text,
    grok_to_regex,
)
from logai_spark.sources.webpages import synth_webpages, WEBPAGE_SCHEMA
from logai_spark.sources.record_io import (
    load_record_csv,
    record_fields,
    save_record_csv,
)

__all__ = [
    "load_record_csv",
    "record_fields",
    "save_record_csv",
    "DataLoaderConfig",
    "load_data",
    "read_grok_text",
    "grok_to_regex",
    "synth_webpages",
    "WEBPAGE_SCHEMA",
]
