"""Streaming jobs over the events fixture.

Each job builds a readStream -> transform -> memory-sink pipeline and runs
it with Trigger.AvailableNow (process-everything-then-stop micro-batches) —
the bounded-input harness for semantics that run identically on an
unbounded Kafka source. State stores are per-query HDFS-backed locals; at
cluster scale the same code runs with RocksDB state stores + checkpoint
dirs on durable storage.
"""

from __future__ import annotations

import uuid
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

# schema-inference cache, keyed by parquet path (fixtures are immutable
# within a session; a regenerated fixture lands in a fresh process)
_EVENTS_SCHEMA_CACHE: dict[str, object] = {}


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source micro-batch stream over the events parquet.

    The stream schema is inferred from a batch read of the same file so the
    reader survives fixture regeneration (round 3's fixture stored int64
    nanos; round 4's stores TIMESTAMP(MICROS) — a hardcoded bigint schema
    silently read raw micros as nanos and collapsed every event to 1970).
    The inferred schema is cached per path: the one-off footer read cost
    every streaming entry ~0.2s per build (the round-4 stream_tumbling/
    stream_session bench regression).
    """
    from pyspark.sql.types import LongType, TimestampType

    from incubator_gluten_spark.catalog import ensure_runtime_confs

    ensure_runtime_confs(spark)  # nanosAsLong + UTC on foreign sessions
    events_path = f"{sf_dir}/events.parquet"
    batch_schema = _EVENTS_SCHEMA_CACHE.get(events_path)
    if batch_schema is None:
        batch_schema = spark.read.parquet(events_path).schema
        _EVENTS_SCHEMA_CACHE[events_path] = batch_schema
    raw = (
        spark.readStream.schema(batch_schema)
        # the file stream source wants a directory; glob-filter to the one table
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    ts_type = batch_schema["ts"].dataType
    if isinstance(ts_type, LongType):
        # int64-nanos fixture: truncate to micros like the batch catalog does
        raw = raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif not isinstance(ts_type, TimestampType):
        raw = raw.withColumn("ts", F.col("ts").cast("timestamp"))
    # watermarks require TIMESTAMP (not NTZ); session tz is pinned UTC so
    # values and formatting agree with the batch catalog and DuckDB
    return raw


def run_to_memory(
    stream_df: DataFrame, mode: str = "append", name: str | None = None
) -> DataFrame:
    """Execute a streaming DataFrame to completion into a memory sink and
    return the sink table as a batch DataFrame.

    Shuffle partitions are capped for the stream's lifetime: a stateful
    query instantiates one state store PER shuffle partition PER stateful
    operator, and the partition count is frozen into the checkpoint — the
    batch session's width (cores*2) would mean 64+ store instances for a
    bounded test stream. Production sizing picks this from expected keyed
    state volume, not core count."""
    spark = stream_df.sparkSession
    name = name or f"sink_{uuid.uuid4().hex[:8]}"
    old_shuffle = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        query = (
            stream_df.writeStream.format("memory")
            .queryName(name)
            .outputMode(mode)
            .trigger(availableNow=True)
            .start()
        )
        query.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_shuffle)
    return spark.table(name)


def tumbling_window_counts(events: DataFrame, width: str = "1 hour") -> DataFrame:
    """Watermarked tumbling-window aggregate."""
    return (
        events.withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", width), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total"))
        .select(
            F.date_format("window.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n",
            "total",
        )
    )


def sliding_window_counts(
    events: DataFrame, width: str = "2 hours", slide: str = "1 hour"
) -> DataFrame:
    """Sliding windows: each event lands in width/slide overlapping windows."""
    return (
        events.withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", width, slide))
        .agg(F.count("*").alias("n"))
        .select(
            F.date_format("window.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "n",
        )
    )


def session_window_stats(events: DataFrame, gap: str = "10 minutes") -> DataFrame:
    """Session windows: per-user activity bursts separated by >= gap.

    Only the session aggregation is stateful-streaming; roll it up per user
    in batch on the sink (two chained stateful aggs in one streaming query
    trip Spark's global-watermark correctness check)."""
    return (
        events.withWatermark("ts", "2 hours")
        .groupBy(F.session_window("ts", gap), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select("user_id", "n_events")
    )


def session_rollup(sessions: DataFrame) -> DataFrame:
    """Batch rollup of the session sink: per-user session stats."""
    return sessions.groupBy("user_id").agg(
        F.count("*").alias("n_sessions"),
        F.max("n_events").alias("max_session_events"),
        F.sum("n_events").alias("total_events"),
    )


def streaming_dedup(events: DataFrame) -> DataFrame:
    """Watermarked stateful dedup on event_id (dropDuplicates keeps state
    only within the watermark horizon -> bounded memory on infinite streams)."""
    return events.withWatermark("ts", "2 hours").dropDuplicates(["event_id"])


def stateful_user_counts(events: DataFrame) -> DataFrame:
    """Custom stateful operator via applyInPandasWithState: running
    per-user event count + value sum (the applyInPandasWithState analog of
    the reference's native UDAF plugin surface, SURVEY §2.12)."""

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, round(total, 2)))
        yield pd.DataFrame(
            {"user_id": [user_id], "n_events": [n], "value_sum": [round(total, 2)]}
        )

    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType="user_id bigint, n_events bigint, value_sum double",
            stateStructType="n bigint, total double",
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def stream_static_enrich(events: DataFrame, dim: DataFrame) -> DataFrame:
    """Stream-static join: enrich the event stream against a batch
    dimension (the dimension is re-read per micro-batch, so a cluster
    deployment broadcasts it; no state store involved — unlike
    stream-stream joins this needs no watermark on the static side)."""
    return (
        events.join(
            F.broadcast(dim),
            events["user_id"] == dim["user_key"],
            "left",
        )
        .groupBy("segment")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total"))
    )


def stream_stream_join(events_a: DataFrame, events_b: DataFrame) -> DataFrame:
    """Stream-stream inner join: purchases matched to same-user clicks in
    the preceding hour. Both sides are watermarked and the join condition
    carries the time band, so each side's state store evicts rows once the
    other side's watermark passes — bounded state on unbounded streams
    (the unbounded-join memory blowup is the #1 stream-join mistake)."""
    clicks = (
        events_a.filter(F.col("event_type") == "click")
        .withWatermark("ts", "2 hours")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("c_ts"),
            F.col("event_id").alias("c_id"),
        )
    )
    purchases = (
        events_b.filter(F.col("event_type") == "purchase")
        .withWatermark("ts", "2 hours")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
            F.col("event_id").alias("p_id"),
        )
    )
    return purchases.join(
        clicks,
        (F.col("p_user") == F.col("c_user"))
        & (F.col("c_ts") < F.col("p_ts"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 1 HOUR")),
    )


def stateful_topk_values(events: DataFrame, k: int = 3) -> DataFrame:
    """Custom stateful operator #2: running top-k VALUES per user kept in
    state (a bounded list, not a counter — the state-shape that generalizes
    to sessions, baskets, model features). Emits each user's current
    top-k on every update; with availableNow the last emit is the global
    answer."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key, pdfs, state: GroupState):
        (user_id,) = key
        top = list(state.get[0]) if state.exists else []
        for pdf in pdfs:
            for v in pdf["value"]:
                top.append(float(v))
        top = sorted(top, reverse=True)[:k]
        state.update((top,))
        yield pd.DataFrame({"user_id": [user_id], "topv": [top]})

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType="user_id bigint, topv array<double>",
        stateStructType="topv array<double>",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def transform_with_state_totals(events: DataFrame) -> DataFrame:
    """Spark 4 transformWithStateInPandas — the successor API to
    applyInPandasWithState (typed state variables via a StatefulProcessor
    handle, multiple state vars, timers, TTL). Running per-user count +
    value max kept in a ValueState; requires the RocksDB state store
    provider (set per-query by the caller).

    Reference analog: the custom stateful-operator surface
    (SURVEY §2.11/2.12); this is the API a migrating reference user would
    adopt on Spark 4."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class RunningTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._agg = handle.getValueState("agg", "n BIGINT, vmax DOUBLE")

        def handleInputRows(self, key, rows, timerValues):
            n, vmax = 0, float("-inf")
            if self._agg.exists():
                prev = self._agg.get()
                n, vmax = int(prev[0]), float(prev[1])
            for pdf in rows:
                n += len(pdf)
                if len(pdf):
                    vmax = max(vmax, float(pdf["value"].max()))
            self._agg.update((n, vmax))
            yield pd.DataFrame(
                {"user_id": [int(key[0])], "n_events": [n], "value_max": [round(vmax, 4)]}
            )

        def close(self) -> None:
            pass

    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=RunningTotals(),
        outputStructType="user_id bigint, n_events bigint, value_max double",
        outputMode="Update",
        timeMode="None",
    )


def stream_stream_left_outer(purchases: DataFrame, clicks: DataFrame) -> DataFrame:
    """Watermarked stream-stream LEFT OUTER join: purchases keep a NULL
    click when no click preceded them within the hour. Outer rows emit
    only once the watermark passes the join window — on a bounded
    AvailableNow run the final watermark closes every window, so the
    result equals the batch LEFT JOIN exactly."""
    p = (
        purchases.filter(F.col("event_type") == "purchase")
        .withWatermark("ts", "2 hours")
        .select(
            F.col("event_id").alias("p_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
        )
    )
    c = (
        clicks.filter(F.col("event_type") == "click")
        .withWatermark("ts", "2 hours")
        .select(
            F.col("event_id").alias("c_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("c_ts"),
        )
    )
    return p.join(
        c,
        (F.col("p_user") == F.col("c_user"))
        & (F.col("c_ts") < F.col("p_ts"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 1 HOUR")),
        "left_outer",
    )


def stream_stream_full_outer(purchases: DataFrame, clicks: DataFrame) -> DataFrame:
    """Watermarked stream-stream FULL OUTER join: unmatched rows on BOTH
    sides NULL-pad and emit once the watermark passes their match
    window (purchases with no prior click in the hour AND clicks that
    led to no purchase within the hour).  The range condition bounds
    each side's state against the other, so state stays finite — the
    requirement Spark enforces for outer stream-stream joins."""
    p = (
        purchases.filter(F.col("event_type") == "purchase")
        .withWatermark("ts", "2 hours")
        .select(
            F.col("event_id").alias("p_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
        )
    )
    c = (
        clicks.filter(F.col("event_type") == "click")
        .withWatermark("ts", "2 hours")
        .select(
            F.col("event_id").alias("c_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("c_ts"),
        )
    )
    return p.join(
        c,
        (F.col("p_user") == F.col("c_user"))
        & (F.col("c_ts") < F.col("p_ts"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 1 HOUR")),
        "full_outer",
    )
