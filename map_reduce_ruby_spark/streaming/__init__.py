from map_reduce_ruby_spark.streaming.windows import (
    streaming_events,
    streaming_tumbling_counts,
    streaming_sessionize,
    streaming_stateful_user_totals,
    run_stream_to_memory,
    state_partitions_for,
)

__all__ = [
    "streaming_events",
    "streaming_tumbling_counts",
    "streaming_sessionize",
    "streaming_stateful_user_totals",
    "run_stream_to_memory",
    "state_partitions_for",
]
