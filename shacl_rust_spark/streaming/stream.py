"""readStream → window agg → writeStream over the events table.

At scale this tails a Kafka/file source; here the file source replays
the parquet events dir with Trigger.AvailableNow (each input file =
one micro-batch), which exercises the full streaming planner including
state store and watermark eviction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def streaming_windowed_counts(stream: DataFrame) -> DataFrame:
    """Tumbling 1-hour windowed counts per event_type with a 2-hour
    watermark — late events beyond the watermark are dropped and state
    for closed windows is evicted (bounded state at any scale)."""
    return (
        stream
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("double").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type", "n_events", "sum_value",
        )
    )


def run_streaming_once(
    spark: SparkSession, events_parquet_dir: str, out_table: str
) -> DataFrame:
    """Replays the events dir as a stream into an in-memory sink;
    returns the sink contents after completion."""
    schema = spark.read.parquet(events_parquet_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(events_parquet_dir)
    )
    agg = streaming_windowed_counts(stream)
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(out_table)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(out_table)


def streaming_attribution_join(
    views: DataFrame, clicks: DataFrame,
    horizon: str = "30 minutes", delay: str = "30 minutes",
) -> DataFrame:
    """STREAM-STREAM event-time interval join: every (view, click)
    pair of the same user with view_ts ≤ click_ts ≤ view_ts + horizon
    — last-touch-window ad attribution as a continuous query.

    Both sides carry watermarks and the join condition includes the
    event-time range, so the engine provably evicts view state older
    than (watermark − horizon) and click state older than the
    watermark: state is bounded by the horizon × arrival rate, never
    by stream length. Inner join ⇒ every emitted pair is final; after
    a full in-order replay the result equals the batch range join
    exactly (late data beyond the watermark is dropped, the same
    contract as the other streaming ops)."""
    v = (
        views.withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", delay)
        .select(
            F.col("event_id").alias("view_id"),
            "user_id",
            F.col("ts").alias("view_ts"),
            F.col("value").alias("view_value"),
        )
    )
    c = (
        clicks.withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", delay)
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("_cu"),
            F.col("ts").alias("click_ts"),
        )
    )
    return (
        v.join(
            c,
            (F.col("user_id") == F.col("_cu"))
            & (F.col("click_ts") >= F.col("view_ts"))
            & (F.col("click_ts")
               <= F.col("view_ts") + F.expr(f"INTERVAL {horizon}")),
            "inner",
        )
        .select("click_id", "user_id", "click_ts",
                "view_id", "view_ts", "view_value")
    )


def attribution_replay(
    spark: SparkSession, events_path: str, n_chunks: int = 4
) -> DataFrame:
    """Gate harness for the stream-stream join: replay the events
    table as two in-order streams (views / clicks filtered from the
    same ascending-ts chunk files) through streaming_attribution_join
    and return the joined pairs — equal to the batch range join, the
    DuckDB oracle. The driver-side chunk write is the replay FIXTURE,
    not the operator (production sources are Kafka topics)."""
    import shutil
    import tempfile
    import uuid

    import pyarrow as pa
    import pyarrow.parquet as pq

    # stream-stream join keeps two state stores per shuffle partition
    # per micro-batch: narrow the replay's shuffle width in a child
    # session (same device as sessionize_replay_closed)
    child = spark.newSession()
    child.conf.set("spark.sql.shuffle.partitions", "8")
    spark = child

    pdf = spark.read.parquet(events_path).toPandas()
    pdf = pdf.sort_values(["ts", "event_id"]).reset_index(drop=True)
    d = tempfile.mkdtemp(prefix="attr_replay_")
    try:
        step = (len(pdf) + n_chunks - 1) // n_chunks
        for k, i in enumerate(range(0, len(pdf), step)):
            pq.write_table(
                pa.Table.from_pandas(pdf.iloc[i:i + step],
                                     preserve_index=False),
                f"{d}/chunk-{k:03d}.parquet", coerce_timestamps="us")
        schema = spark.read.parquet(d).schema

        def src():
            return (
                spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(d)
            )

        joined = streaming_attribution_join(
            src().where(F.col("event_type") == "view"),
            src().where(F.col("event_type") == "click"),
        )
        name = "attr_replay_" + uuid.uuid4().hex[:8]
        q = (
            joined.writeStream.outputMode("append")
            .format("memory")
            .queryName(name)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        out = spark.table(name).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(d, ignore_errors=True)
    return out
