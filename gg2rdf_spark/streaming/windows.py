"""Event-time windowed aggregation with watermarked late-data handling.

The reference has no event-time semantics (its streaming is a git job
queue, SURVEY.md §2 note) — this is a first-class training-data-
pipeline addition: per-window mention/event counts over a transcript
or event stream with bounded state.

* watermark bounds state: windows older than (max event time − delay)
  are finalized and dropped from the state store, so state size is
  O(active windows), not O(stream length) — the property that matters
  at 10^12 events.
* append output mode emits each window exactly once, when the
  watermark passes its end — late rows beyond the delay are dropped
  (counted nowhere), rows within the delay still update their window.

Batch equivalence: `windowed_counts(df)` on a static frame computes
identical (window, key, n) rows to running the stream to completion
with no late data — asserted in tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_counts(
    events: DataFrame, ts_col: str = "ts", key_col: str = "event_type",
    window: str = "1 hour",
) -> DataFrame:
    """Tumbling-window counts (batch shape — same plan Structured
    Streaming runs incrementally)."""
    return (
        events.groupBy(F.window(ts_col, window).alias("w"), key_col)
        .agg(F.count("*").alias("n"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            key_col, "n",
        )
    )


def stream_windowed_counts(
    spark, in_dir: str, out_dir: str, checkpoint_dir: str,
    schema: str, ts_col: str = "ts", key_col: str = "event_type",
    window: str = "1 hour", watermark_delay: str = "2 hours",
):
    """File-source stream → watermarked tumbling-window counts →
    append-mode parquet sink.

    Returns the StreamingQuery.  State is bounded by the watermark:
    a row later than ``watermark_delay`` behind the max seen event
    time is dropped; windows finalize (and emit) once the watermark
    passes their end."""
    stream = spark.readStream.schema(schema).parquet(in_dir)
    agg = (
        stream.withWatermark(ts_col, watermark_delay)
        .groupBy(F.window(ts_col, window).alias("w"), key_col)
        .agg(F.count("*").alias("n"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            key_col, "n",
        )
    )
    return (
        agg.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
