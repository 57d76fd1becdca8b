from deeptime_spark.streaming.accumulate import (
    StreamingEstimator,
    streaming_drop_exact_duplicates,
    streaming_transition_counts,
    windowed_event_counts,
)

__all__ = ["StreamingEstimator", "windowed_event_counts", "streaming_transition_counts", "streaming_drop_exact_duplicates"]
