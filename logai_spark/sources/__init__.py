from logai_spark.sources.readers import (
    DataLoaderConfig,
    load_data,
    read_grok_text,
    grok_to_regex,
)
from logai_spark.sources.webpages import synth_webpages, WEBPAGE_SCHEMA

__all__ = [
    "DataLoaderConfig",
    "load_data",
    "read_grok_text",
    "grok_to_regex",
    "synth_webpages",
    "WEBPAGE_SCHEMA",
]
