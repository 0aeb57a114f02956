"""Structured Streaming layer (SURVEY §2.11).

The reference's only streaming artifact is a Kafka split type in its scan
IR (StreamKafkaSourceNode.java:25) — actual streaming semantics live in
Spark itself, so this layer IS the capability: file-source micro-batches
over the events fixture with watermarks, tumbling/sliding/session windows,
stateful dedup and applyInPandasWithState custom state.

A Kafka deployment swaps `read_events_stream` for
`spark.readStream.format("kafka")...` — every downstream transformation is
source-agnostic. (No broker or kafka connector jar ships in this
environment, so that path is documented, not exercised.)
"""

from incubator_gluten_spark.streaming.jobs import (
    read_events_stream,
    run_to_memory,
    session_rollup,
    session_window_stats,
    sliding_window_counts,
    stateful_user_counts,
    streaming_dedup,
    tumbling_window_counts,
)

__all__ = [
    "read_events_stream",
    "run_to_memory",
    "tumbling_window_counts",
    "sliding_window_counts",
    "session_rollup",
    "session_window_stats",
    "streaming_dedup",
    "stateful_user_counts",
]
