"""Event-stream operators over the events table.

Batch DataFrame implementations here (SQL-oracle-checkable); the same
transformations run under Structured Streaming in
shacl_rust_spark/streaming/ (readStream → writeStream, watermarks for
late data) — the reference has no streaming surface (SURVEY.md §2),
so these are pipeline-side additions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SESSION_GAP_MIN = 30


def windowed_counts(events: DataFrame) -> DataFrame:
    """Tumbling 1-hour counts + value sums per event_type."""
    return (
        events.groupBy(
            F.date_trunc("hour", "ts").alias("window_start"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            # exact decimal accumulation → identical double in any
            # engine regardless of partial-aggregation order
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("double").alias("sum_value"),
        )
    )


def sessionize(events: DataFrame) -> DataFrame:
    """Gap-based sessions per user (new session when > 30 min since the
    previous event); returns per-session bounds + event count."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # ts is TIMESTAMP_NTZ; unix_seconds(cast …) floors to whole seconds.
    # Only DIFFS are used, so any constant session-timezone offset cancels.
    secs = F.expr("unix_seconds(cast(ts as timestamp))")
    gapped = events.withColumn(
        "_new",
        (secs - F.lag(secs, 1).over(w) > SESSION_GAP_MIN * 60).cast("int"),
    ).withColumn("_new", F.coalesce(F.col("_new"), F.lit(1)))
    sess = gapped.withColumn(
        "session_seq", F.sum("_new").over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        )
    )
    return (
        sess.groupBy("user_id", "session_seq")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )
