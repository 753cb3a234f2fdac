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
