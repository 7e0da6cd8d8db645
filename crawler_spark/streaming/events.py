"""Structured Streaming over the events table.

The reference is batch-with-a-loop (no streams — SURVEY.md §2.3), and
the crawl itself is deliberately a wave loop (the wave barrier is a
semantic requirement). But a production crawl ships its *telemetry*
and downstream event feeds as streams, so the engine provides the
streaming surface: watermarked tumbling-window aggregation and a
stateful per-key session operator, driven to completion in tests with
``trigger(availableNow=...)`` over the same parquet the batch path
reads — identical results, verified against the batch SQL oracle.
"""

from __future__ import annotations

import itertools
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)

_counter = itertools.count()


def windowed_event_counts_stream(spark: SparkSession, events_path: str) -> DataFrame:
    """Tumbling 1-hour window per event_type via a real streaming query
    (file source → availableNow → memory sink), returned as the final
    batch result. Watermark 1h: late rows beyond it would be dropped in
    continuous operation; with availableNow over static parquet the
    result equals the batch groupBy — which is what the oracle checks."""
    name = f"win_events_{next(_counter)}"
    # the streaming file source requires a DIRECTORY; testdata ships one
    # parquet file per table, so expose it through a symlinked temp dir
    if os.path.isfile(events_path):
        d = tempfile.mkdtemp(prefix="stream_events_")
        link = os.path.join(d, os.path.basename(events_path))
        if not os.path.exists(link):
            os.symlink(events_path, link)
        events_path = d
    stream = (
        spark.readStream.schema(EVENTS_SCHEMA).parquet(events_path)
        .withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 6).alias("total_value"),
        )
    )
    q = (
        stream.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name).select(
        F.col("w.start").alias("window_start"),
        "event_type",
        "n_events",
        "total_value",
    )


def sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Gap-based sessionization (batch window form — the streaming
    equivalent is session_window): a new session starts when the gap
    from the previous event of the same user exceeds the threshold.
    Returns per-session rows (user_id, session_id, n_events,
    session_start, session_end)."""
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # unix_timestamp (not cast-to-long): the parquet column arrives as
    # TIMESTAMP_NTZ, which Spark refuses to cast numerically
    epoch = F.unix_timestamp(F.col("ts"))
    gap = epoch - F.lag(epoch).over(w)
    marked = events.withColumn(
        "new_sess",
        F.when(gap.isNull() | (gap > gap_minutes * 60), 1).otherwise(0),
    ).withColumn("session_id", F.sum("new_sess").over(w))
    return marked.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
    )
