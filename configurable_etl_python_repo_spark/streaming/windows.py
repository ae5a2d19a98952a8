"""Event-time windowed aggregation with watermarks + session windows.

The reference has no event-time processing at all (SURVEY §2.9) — these are
the north-star streaming operators over the `events` table shape:
tumbling/sliding rollups (F.window + watermark for late data) and session
windows (F.session_window with an inactivity gap — the streaming form of
catalog e2_sessionize_gap30m).

Each transform takes ANY DataFrame — batch or streaming — because
Structured Streaming's unified model plans the same expressions either way;
tests assert the batch result and then run the identical transform under
readStream/availableNow to prove the streaming plan is legal too.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def tumbling_rollup(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """Per (window, event_type) counts/sums with a late-data watermark.
    On a stream, state for windows older than the watermark is dropped —
    bounded memory at any scale."""
    src = events.withWatermark(ts_col, watermark) if events.isStreaming else events
    return (
        src.groupBy(F.window(ts_col, window).alias("w"), "event_type")
        .agg(
            F.count("event_id").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type", "n_events", "sum_value",
        )
    )


def sliding_rollup(
    events: DataFrame,
    window: str = "1 hour",
    slide: str = "15 minutes",
    watermark: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    src = events.withWatermark(ts_col, watermark) if events.isStreaming else events
    return (
        src.groupBy(F.window(ts_col, window, slide).alias("w"), "event_type")
        .agg(F.count("event_id").alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events")
    )


def session_rollup(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """Session windows per user with an inactivity gap — the built-in
    stateful operator (no applyInPandasWithState needed for this shape)."""
    src = events.withWatermark(ts_col, watermark) if events.isStreaming else events
    return (
        src.groupBy(F.session_window(ts_col, gap).alias("w"), "user_id")
        .agg(F.count("event_id").alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


def start_stream_rollup(
    spark: SparkSession,
    source_dir: str,
    schema,
    checkpoint: str,
    transform=tumbling_rollup,
    output_table: str = "rollup_out",
):
    """Run a rollup transform as a real streaming query against a file
    source, draining with availableNow into an in-memory sink (tests) —
    swap the sink for parquet/kafka in production."""
    stream = spark.readStream.format("parquet").schema(schema).load(source_dir)
    out = transform(stream)
    return (
        out.writeStream.format("memory")
        .queryName(output_table)
        .outputMode("complete")
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
