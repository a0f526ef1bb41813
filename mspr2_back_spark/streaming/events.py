"""Structured Streaming over the events stream.

The reference has no streaming layer (SURVEY §1.1); this module is
the engine extension for the `events` table's native shape: an
append-only timestamped stream. The same aggregation logic exists in
batch form as the `hourly_events` query (plans/queries.py), so batch
and streaming results are directly comparable — the classic
lambda-architecture parity check, used by the tests.

Scale notes: windowed aggregation state is bounded by the watermark
(late rows beyond it are dropped and their state evicted); the
shuffle key is (window, event_type), so state distributes across
executors; `availableNow` triggers give batch-sized reprocessing with
streaming semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mspr2_back_spark.functions.numeric import METRIC


def read_event_stream(spark, path: str, schema) -> DataFrame:
    """File-source stream: new parquet files under `path` become
    micro-batches."""
    return spark.readStream.schema(schema).parquet(path)


def windowed_event_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Tumbling-window counts + exact decimal sums per event type,
    tolerating `watermark` of event-time lateness."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("win"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast(METRIC)).cast("double").alias("total_value"),
        )
        .select(
            F.date_format(F.col("win.start"), "yyyy-MM-dd HH").alias("hour"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def run_to_memory(stream_df: DataFrame, table_name: str, mode: str = "update") -> None:
    """Drain all available input into an in-memory sink (test/serving
    harness; a production job would write a parquet/Delta sink with a
    checkpoint location)."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(table_name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
