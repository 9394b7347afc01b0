from .curation import (
    stream_c4_clean,
    stream_classifier_gate,
    stream_gopher_gate,
    stream_contamination_flags,
    stream_quality_filter,
    stream_url_dedup,
)
from .joins import stream_enrich, stream_stream_join
from .rollup import batch_rollup, compact_rollup, continuous_aggregate, read_rollup
from .sinks import (
    compact_upserted,
    foreach_batch_parquet_upsert,
    foreach_batch_sink,
    read_upserted,
    stream_to_parquet,
)
from .stateful import sessionize_with_state
from .windows import (
    read_events_stream,
    session_windowed,
    sliding_windowed,
    stream_dedup,
    stream_to_memory,
    tumbling_windowed,
)

__all__ = [
    "read_events_stream",
    "tumbling_windowed",
    "sliding_windowed",
    "session_windowed",
    "sessionize_with_state",
    "stream_dedup",
    "stream_contamination_flags",
    "stream_quality_filter",
    "stream_classifier_gate",
    "stream_gopher_gate",
    "stream_c4_clean",
    "stream_url_dedup",
    "continuous_aggregate",
    "batch_rollup",
    "read_rollup",
    "compact_rollup",
    "stream_enrich",
    "stream_stream_join",
    "stream_to_memory",
    "stream_to_parquet",
    "foreach_batch_sink",
    "foreach_batch_parquet_upsert",
    "read_upserted",
    "compact_upserted",
]
