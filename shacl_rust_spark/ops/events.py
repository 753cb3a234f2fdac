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


def asof_join(
    events: DataFrame, probe_type: str = "click", ref_type: str = "view"
) -> DataFrame:
    """As-of join within the events table: for every probe event (e.g.
    a click), the most recent ref event (e.g. a view) by the SAME user
    at-or-before the probe's timestamp — <= semantics, ties on ts break
    to the highest ref event_id. Probes with no prior ref are dropped
    (inner as-of). Returns (probe_id, user_id, probe_ts, ref_id,
    ref_ts, ref_value, gap_us).

    Spark has no ASOF JOIN operator (DuckDB/Pandas do), so this is the
    composition that scales: union both sides and take a running
    last(ignorenulls) of the ref struct over one window per user
    ordered by (ts, is_ref DESC, event_id) — refs sort before probes at
    equal ts, giving the <= bound. ONE shuffle on user_id, state
    bounded by a single struct per row; never the range self-join,
    whose per-user quadratic term explodes on power users."""
    cols = ["user_id", "ts", "event_id", "value"]
    refs = events.where(F.col("event_type") == ref_type).select(
        *cols, F.lit(1).alias("_is_ref")
    )
    probes = events.where(F.col("event_type") == probe_type).select(
        *cols, F.lit(0).alias("_is_ref")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(
            F.col("ts").asc(), F.col("_is_ref").desc(), F.col("event_id").asc()
        )
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    ref_struct = F.when(
        F.col("_is_ref") == 1,
        F.struct(
            F.col("event_id").alias("rid"),
            F.col("ts").alias("rts"),
            F.col("value").alias("rvalue"),
        ),
    )
    # only DIFFS of unix_micros are used, so the NTZ→LTZ cast's constant
    # session-timezone offset cancels (same device as sessionize above)
    micros = F.unix_micros(F.col("ts").cast("timestamp"))
    ref_micros = F.unix_micros(F.col("_ref.rts").cast("timestamp"))
    return (
        refs.unionByName(probes)
        .withColumn("_ref", F.last(ref_struct, ignorenulls=True).over(w))
        .where((F.col("_is_ref") == 0) & F.col("_ref").isNotNull())
        .select(
            F.col("event_id").alias("probe_id"),
            "user_id",
            F.col("ts").alias("probe_ts"),
            F.col("_ref.rid").alias("ref_id"),
            F.col("_ref.rts").alias("ref_ts"),
            F.col("_ref.rvalue").alias("ref_value"),
            (micros - ref_micros).alias("gap_us"),
        )
    )
