from cloudtrace_exporter_spark.streaming.pipeline import (
    bloom_dedup_foreach_batch,
    dedup_within_watermark,
    read_event_stream,
    semdedup_stream_index,
    session_windows,
    sliding_counts,
    stateful_running_totals,
    stream_bloom_dedup,
    stream_semdedup,
    stream_static_enrich,
    stream_stream_interval_join,
    tumbling_counts,
)
from cloudtrace_exporter_spark.streaming.sinks import (
    DeliveryCounters,
    foreach_batch_graph_upsert,
    foreach_batch_quality_gated,
)

__all__ = [
    "DeliveryCounters",
    "bloom_dedup_foreach_batch",
    "dedup_within_watermark",
    "foreach_batch_graph_upsert",
    "foreach_batch_quality_gated",
    "read_event_stream",
    "semdedup_stream_index",
    "session_windows",
    "sliding_counts",
    "stateful_running_totals",
    "stream_bloom_dedup",
    "stream_semdedup",
    "stream_static_enrich",
    "stream_stream_interval_join",
    "tumbling_counts",
]
