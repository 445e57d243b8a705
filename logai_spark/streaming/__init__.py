from logai_spark.streaming.counters import (
    streaming_counter_vector,
    streaming_session_windows,
    streaming_match_templates,
    streaming_dbl_scores,
)

__all__ = [
    "streaming_counter_vector",
    "streaming_session_windows",
    "streaming_match_templates",
    "streaming_dbl_scores",
]
