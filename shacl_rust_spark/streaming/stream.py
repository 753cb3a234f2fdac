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


def _attribution_chunk_replay(
    spark: SparkSession,
    events_path: str,
    n_chunks: int,
    join_fn,
    out_schema: str,
    sentinel: bool = False,
) -> DataFrame:
    """Shared chunked-replay scaffold for the attribution joins:
    replay the events table as two in-order streams (views / clicks
    filtered from the same ascending-ts chunk files) through
    ``join_fn`` and return the sink contents. The driver-side chunk
    write is the replay FIXTURE, not the operator (production sources
    are Kafka topics). Empty input short-circuits to an empty frame
    of ``out_schema`` (the chunking loop can't run on zero rows).

    With ``sentinel`` a watermark-flush pair (view + click at
    max_ts + 2 h, user_id −1) is appended INSIDE the final chunk —
    never as its own file: FileStreamSource orders initial files by
    modification time with millisecond granularity, so a separate
    back-to-back-written sentinel file could TIE with the last data
    chunk and be processed first, jumping the watermark past the
    unprocessed tail and mass-dropping it as late. Inside the final
    chunk the sentinel cannot precede the data it shares a batch
    with, and the watermark only advances after that batch. Sentinel
    rows are filtered back out NULL-safely (a NULL user_id row is
    real data and must survive the filter, matching the batch
    oracle)."""
    import shutil
    import tempfile
    import uuid

    import pandas as pd
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
    if len(pdf) == 0:
        return spark.createDataFrame([], out_schema)
    step = (len(pdf) + n_chunks - 1) // n_chunks
    chunks = [pdf.iloc[i:i + step] for i in range(0, len(pdf), step)]
    if sentinel:
        flush_ts = pdf["ts"].max() + pd.Timedelta(hours=2)
        s = pd.DataFrame({
            "event_id": [-1, -2],
            "ts": [flush_ts, flush_ts],
            "user_id": [-1, -1],
            "event_type": ["view", "click"],
        })
        for col in pdf.columns:
            if col not in s.columns:
                s[col] = None
        s = s[list(pdf.columns)].astype(pdf.dtypes.to_dict())
        chunks[-1] = pd.concat([chunks[-1], s], ignore_index=True)
    d = tempfile.mkdtemp(prefix="attr_replay_")
    try:
        for k, ch in enumerate(chunks):
            pq.write_table(
                pa.Table.from_pandas(ch, preserve_index=False),
                f"{d}/chunk-{k:03d}.parquet", coerce_timestamps="us")
        schema = spark.read.parquet(d).schema

        def src():
            return (
                spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(d)
            )

        joined = join_fn(
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
        out = spark.table(name)
        if sentinel:
            out = out.where(
                F.coalesce(F.col("user_id") >= 0, F.lit(True))
            )
        out = out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(d, ignore_errors=True)
    return out


def attribution_replay(
    spark: SparkSession, events_path: str, n_chunks: int = 4
) -> DataFrame:
    """Gate harness for the INNER stream-stream join — equal to the
    batch range join, the DuckDB oracle (see
    _attribution_chunk_replay for the scaffold)."""
    return _attribution_chunk_replay(
        spark, events_path, n_chunks, streaming_attribution_join,
        "click_id long, user_id long, click_ts timestamp, "
        "view_id long, view_ts timestamp, view_value double",
    )


def streaming_attribution_join_outer(
    views: DataFrame, clicks: DataFrame,
    horizon: str = "30 minutes", delay: str = "30 minutes",
) -> DataFrame:
    """LEFT OUTER stream-stream interval join: every view paired with
    its horizon-window clicks, PLUS a null row for every view that
    gets none — the unconverted-impression stream, which the inner
    join (streaming_attribution_join) structurally cannot produce.

    The hard semantics is WHEN the null row may be emitted: only once
    the watermark passes view_ts + horizon can the engine prove no
    matching click is still coming, so unmatched views are emitted by
    state eviction, not by data arrival. Consequence: at end-of-input
    the tail of the view stream sits below the final watermark
    forever — a replay that must equal the batch left join appends a
    sentinel event past max_ts + horizon + delay to flush it
    (attribution_outer_replay does exactly that, then filters the
    sentinel back out). State bounds are the inner join's: both
    stores evict at the watermark ± horizon.

    The nullable click columns are emitted as STRINGS (click_id_s,
    click_ts_s): a NULL BIGINT/TIMESTAMP round-trips through the
    oracle's pandas bridge as NaN/NaT, a NULL VARCHAR stays NULL —
    the same cross-engine-NULL device as the ROLLUP calendar keys."""
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
            "leftOuter",
        )
        .select(
            "view_id", "user_id", "view_ts", "view_value",
            F.col("click_id").cast("string").alias("click_id_s"),
            F.col("click_ts").cast("string").alias("click_ts_s"),
        )
    )


def attribution_outer_replay(
    spark: SparkSession, events_path: str, n_chunks: int = 4
) -> DataFrame:
    """Replay harness for the LEFT OUTER interval join: the events
    table as two in-order streams plus one sentinel chunk (a view and
    a click at max_ts + 2 h, user_id −1) whose only purpose is to
    push the final watermark past every real view's horizon so the
    eviction-driven null rows all emit; sentinel rows are filtered
    back out NULL-safely. Result equals the batch left range join —
    the DuckDB oracle. The sentinel rides INSIDE the final chunk (see
    _attribution_chunk_replay: a separate sentinel file can tie on
    modification time with the last data chunk and be replayed first,
    watermark-dropping the tail)."""
    return _attribution_chunk_replay(
        spark, events_path, n_chunks, streaming_attribution_join_outer,
        "view_id long, user_id long, view_ts timestamp, "
        "view_value double, click_id_s string, click_ts_s string",
        sentinel=True,
    )


def streaming_cdc_apply(
    spark: SparkSession,
    changelog_dir: str,
    base: DataFrame,
    out_dir: str,
    key_col: str = "key",
    val_col: str = "val",
    op_col: str = "op",
    seq_cols: tuple = ("ts", "event_id"),
) -> DataFrame:
    """Streaming twin of ops/olap.cdc_apply: maintain a keyed snapshot
    under foreachBatch, merging each changelog micro-batch into the
    current snapshot (latest-per-key within the batch, 'D' deletes,
    I/U upsert, untouched keys pass through WITH their existing src —
    the carried src column is what makes incremental application equal
    the one-shot batch merge). Snapshots are versioned directories
    (v0, v1, ...) — a reader never observes a half-written snapshot,
    and the previous version stays readable during the write (the
    same committed-snapshot discipline as pipeline/emit.py).

    Equivalence contract (the gate's oracle): when micro-batches
    arrive in non-decreasing seq order (a log replay / Kafka
    partition-per-key guarantees per-key order), folding batches
    left-to-right computes exactly cdc_apply(base, whole changelog) —
    later batches override earlier ones just as higher seqs win
    within one batch. Per-batch cost: one window over the batch +
    one key-join against the snapshot; at scale the snapshot is
    bucketed by key and the join is shuffle-free."""
    from pyspark.sql import Window

    schema = spark.read.parquet(changelog_dir).schema
    base.select(
        F.col(key_col), F.col(val_col), F.lit("base").alias("src")
    ).write.mode("overwrite").parquet(f"{out_dir}/v0")
    state = {"v": 0}

    def run_batch(batch_df: DataFrame, batch_id: int) -> None:
        s = batch_df.sparkSession  # cloned session: build frames HERE
        cur = s.read.parquet(f"{out_dir}/v{state['v']}")
        w = Window.partitionBy(key_col).orderBy(
            *[F.desc(c) for c in seq_cols]
        )
        latest = (
            batch_df.where(F.col(key_col).isNotNull())
            .withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .select(
                F.col(key_col).alias("_k"),
                F.col(val_col).alias("_cv"),
                F.col(op_col).alias("_op"),
            )
        )
        merged = (
            cur.withColumnRenamed(key_col, "_k")
            .join(latest, "_k", "full_outer")
            .where(F.col("_op").isNull() | (F.col("_op") != F.lit("D")))
            .select(
                F.col("_k").alias(key_col),
                F.coalesce("_cv", F.col(val_col)).alias(val_col),
                F.when(F.col("_op").isNull(), F.col("src"))
                .otherwise(F.lit("cdc")).alias("src"),
            )
        )
        merged.write.mode("overwrite").parquet(
            f"{out_dir}/v{state['v'] + 1}"
        )
        state["v"] += 1

    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(changelog_dir)
        .writeStream.foreachBatch(run_batch)
        .option("checkpointLocation", f"{out_dir}/_chk")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(f"{out_dir}/v{state['v']}")


def streaming_mv_incremental(
    spark: SparkSession, src_dir: str, out_dir: str
) -> DataFrame:
    """Incremental materialized-view maintenance: keep the
    (event_type, day) count/sum aggregate current under an append-only
    stream by folding each micro-batch's PARTIAL aggregate into a
    versioned MV snapshot — per-batch cost O(|MV| + |batch agg|),
    never a rescan of history; the full-table recompute GROUP BY is
    the oracle. Sums accumulate in DECIMAL: exact addition is
    associative and commutative, so fold order cannot matter and
    incremental equals recompute bit-for-bit (the property a float
    accumulator would NOT give). Snapshot versioning is the same
    committed-directory discipline as the CDC folds. At scale the MV
    is grouping-key-sized (types × days), so the per-batch merge is a
    broadcast-sized union + re-agg."""
    schema = spark.read.parquet(src_dir).schema
    mv_schema = (
        "event_type string, day string, "
        "n_events bigint, sum_v decimal(28,6)"
    )
    spark.createDataFrame([], mv_schema).write.mode(
        "overwrite"
    ).parquet(f"{out_dir}/v0")
    state = {"v": 0}

    def run_batch(batch_df: DataFrame, batch_id: int) -> None:
        s = batch_df.sparkSession  # cloned session: build frames HERE
        cur = s.read.parquet(f"{out_dir}/v{state['v']}")
        delta = (
            batch_df.select(
                "event_type",
                F.to_date("ts").cast("string").alias("day"),
                F.col("value").cast("decimal(18,6)").alias("_v"),
            )
            .groupBy("event_type", "day")
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.sum("_v").cast("decimal(28,6)").alias("sum_v"),
            )
        )
        merged = (
            cur.unionByName(delta)
            .groupBy("event_type", "day")
            .agg(
                F.sum("n_events").alias("n_events"),
                F.sum("sum_v").cast("decimal(28,6)").alias("sum_v"),
            )
        )
        merged.write.mode("overwrite").parquet(
            f"{out_dir}/v{state['v'] + 1}"
        )
        state["v"] += 1

    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
        .writeStream.foreachBatch(run_batch)
        .option("checkpointLocation", f"{out_dir}/_chk")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(f"{out_dir}/v{state['v']}").select(
        "event_type", "day", "n_events",
        F.col("sum_v").cast("double").alias("sum_value"),
    )


def mv_incremental_replay(
    spark: SparkSession, sf_dir: str, n_chunks: int = 4
) -> DataFrame:
    """Gate harness for streaming_mv_incremental: the events table
    replayed as micro-batch chunks; the folded MV must equal the
    one-shot GROUP BY recompute (the oracle)."""
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    pdf = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .toPandas().sort_values(["ts", "event_id"])
        .reset_index(drop=True)
    )
    d = tempfile.mkdtemp(prefix="mv_replay_")
    out = tempfile.mkdtemp(prefix="mv_state_")
    step = (len(pdf) + n_chunks - 1) // n_chunks
    for k, i in enumerate(range(0, len(pdf), step)):
        pq.write_table(
            pa.Table.from_pandas(pdf.iloc[i:i + step],
                                 preserve_index=False),
            f"{d}/chunk-{k:03d}.parquet", coerce_timestamps="us")
    return streaming_mv_incremental(spark, d, out)


def streaming_cdc_apply_ooo(
    spark: SparkSession,
    changelog_dir: str,
    base: DataFrame,
    out_dir: str,
    key_col: str = "key",
    val_col: str = "val",
    op_col: str = "op",
    seq_cols: tuple = ("ts", "event_id"),
) -> DataFrame:
    """Out-of-order-safe streaming CDC merge — the production
    hardening of streaming_cdc_apply, which requires per-key
    in-order micro-batches. This variant drops that requirement:
    the snapshot carries each key's winning seq tuple, and an
    incoming change is applied ONLY when its seq is strictly greater
    than the stored one (equal seq = redelivery, kept idempotent).
    Deletes cannot physically drop the row — a late-arriving stale
    upsert would resurrect it — so they become TOMBSTONES (_del=true,
    seq retained) that the read view filters out; a compaction pass
    may purge tombstones older than the source's max replay lag.

    Equivalence contract: for seq tuples unique per key, folding
    micro-batches in ANY delivery order computes exactly
    cdc_apply(base, whole changelog). Per-batch cost is unchanged:
    one window over the batch + one key-join against the snapshot
    (shuffle-free when the snapshot is bucketed by key); the only
    overhead vs the in-order fold is the seq struct column and the
    tombstone rows awaiting compaction."""
    from pyspark.sql import Window
    from pyspark.sql import types as T

    schema = spark.read.parquet(changelog_dir).schema
    seq_t = T.StructType(
        [T.StructField(c, schema[c].dataType) for c in seq_cols]
    )
    base.select(
        F.col(key_col), F.col(val_col), F.lit("base").alias("src"),
        F.lit(False).alias("_del"),
        F.lit(None).cast(seq_t).alias("_seq"),
    ).write.mode("overwrite").parquet(f"{out_dir}/v0")
    state = {"v": 0}

    def run_batch(batch_df: DataFrame, batch_id: int) -> None:
        s = batch_df.sparkSession  # cloned session: build frames HERE
        cur = s.read.parquet(f"{out_dir}/v{state['v']}")
        w = Window.partitionBy(key_col).orderBy(
            *[F.desc(c) for c in seq_cols]
        )
        latest = (
            batch_df.where(F.col(key_col).isNotNull())
            .withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .select(
                F.col(key_col).alias("_k"),
                F.col(val_col).alias("_cv"),
                F.col(op_col).alias("_op"),
                F.struct(*[F.col(c) for c in seq_cols]).alias("_cseq"),
            )
        )
        wins = F.col("_op").isNotNull() & (
            F.col("_seq").isNull() | (F.col("_cseq") > F.col("_seq"))
        )
        merged = (
            cur.withColumnRenamed(key_col, "_k")
            .join(latest, "_k", "full_outer")
            .select(
                F.col("_k").alias(key_col),
                F.when(wins, F.col("_cv")).otherwise(F.col(val_col))
                .alias(val_col),
                F.when(wins, F.lit("cdc")).otherwise(F.col("src"))
                .alias("src"),
                F.when(wins, F.col("_op") == F.lit("D"))
                .otherwise(F.coalesce("_del", F.lit(False)))
                .alias("_del"),
                F.when(wins, F.col("_cseq")).otherwise(F.col("_seq"))
                .alias("_seq"),
            )
        )
        merged.write.mode("overwrite").parquet(
            f"{out_dir}/v{state['v'] + 1}"
        )
        state["v"] += 1

    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(changelog_dir)
        .writeStream.foreachBatch(run_batch)
        .option("checkpointLocation", f"{out_dir}/_chk")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return (
        spark.read.parquet(f"{out_dir}/v{state['v']}")
        .where(~F.col("_del"))
        .select(key_col, val_col, "src")
    )


def compact_cdc_snapshot(
    snapshot: DataFrame, min_seq_struct,
) -> DataFrame:
    """Tombstone compaction for streaming_cdc_apply_ooo snapshots:
    physically drop tombstones whose seq is strictly below
    `min_seq_struct` (a struct literal matching the snapshot's _seq
    type — the source's low-watermark: no change with a smaller seq
    can still arrive). Live rows and newer tombstones pass through
    untouched, so correctness under late delivery is preserved
    exactly up to the stated replay horizon. One narrow filter scan —
    run it as the same job that rewrites the snapshot bucket files."""
    return snapshot.where(
        (~F.col("_del")) | F.col("_seq").isNull()
        | (F.col("_seq") >= min_seq_struct)
    )


def cdc_apply_replay(
    spark: SparkSession, sf_dir: str, n_chunks: int = 4
) -> DataFrame:
    """Gate harness for streaming_cdc_apply: the customer snapshot
    upserted/deleted by the events-derived changelog (the SAME
    derivation as the batch gate olap_cdc_merge), replayed as
    ascending-(ts, event_id) micro-batch chunks — so the one-shot
    batch MERGE SQL is this query's exact oracle. The driver-side
    chunk write is the replay FIXTURE, not the operator."""
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    base = cust.select(
        F.col("c_custkey").alias("key"),
        F.round(F.col("c_acctbal") * 100, 0).cast("bigint")
        .alias("val"),
    )
    chg = spark.read.parquet(f"{sf_dir}/events.parquet").where(
        F.col("event_type").isin("signup", "purchase", "error")
    ).select(
        (F.col("user_id") + 1).alias("key"),
        F.round(F.coalesce(F.col("value"), F.lit(0.0)) * 100, 0)
        .cast("bigint").alias("val"),
        F.when(F.col("event_type") == "error", F.lit("D"))
        .when(F.col("event_type") == "signup", F.lit("I"))
        .otherwise(F.lit("U")).alias("op"),
        "ts", "event_id",
    )
    pdf = chg.toPandas().sort_values(["ts", "event_id"]) \
        .reset_index(drop=True)
    d = tempfile.mkdtemp(prefix="cdc_replay_")
    out = tempfile.mkdtemp(prefix="cdc_state_")
    step = (len(pdf) + n_chunks - 1) // n_chunks
    for k, i in enumerate(range(0, len(pdf), step)):
        pq.write_table(
            pa.Table.from_pandas(pdf.iloc[i:i + step],
                                 preserve_index=False),
            f"{d}/chunk-{k:03d}.parquet", coerce_timestamps="us")
    snap = streaming_cdc_apply(spark, d, base, out)
    return snap.select("key", "val", "src")


def cdc_apply_ooo_replay(
    spark: SparkSession, sf_dir: str, n_chunks: int = 4
) -> DataFrame:
    """Gate harness for streaming_cdc_apply_ooo: the SAME
    events-derived changelog as olap_cdc_merge, split into ascending
    seq chunks but DELIVERED in a scrambled fixed order (file mtimes
    force the file source to replay chunk 2, 0, 3, 1, ...) — stale
    seqs arrive after newer ones, late deletes after reinserts. The
    one-shot batch MERGE SQL is still the exact oracle because the
    seq-guarded tombstone merge is delivery-order-invariant."""
    import os
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    base = cust.select(
        F.col("c_custkey").alias("key"),
        F.round(F.col("c_acctbal") * 100, 0).cast("bigint")
        .alias("val"),
    )
    chg = spark.read.parquet(f"{sf_dir}/events.parquet").where(
        F.col("event_type").isin("signup", "purchase", "error")
    ).select(
        (F.col("user_id") + 1).alias("key"),
        F.round(F.coalesce(F.col("value"), F.lit(0.0)) * 100, 0)
        .cast("bigint").alias("val"),
        F.when(F.col("event_type") == "error", F.lit("D"))
        .when(F.col("event_type") == "signup", F.lit("I"))
        .otherwise(F.lit("U")).alias("op"),
        "ts", "event_id",
    )
    pdf = chg.toPandas().sort_values(["ts", "event_id"]) \
        .reset_index(drop=True)
    d = tempfile.mkdtemp(prefix="cdc_ooo_replay_")
    out = tempfile.mkdtemp(prefix="cdc_ooo_state_")
    step = (len(pdf) + n_chunks - 1) // n_chunks
    chunks = [pdf.iloc[i:i + step] for i in range(0, len(pdf), step)]
    # fixed scramble: odd-index chunks first reversed, then evens —
    # for 4 chunks this is [3, 1, 0, 2]: newest seqs land early
    order = [i for i in range(len(chunks) - 1, -1, -1) if i % 2 == 1] \
        + [i for i in range(len(chunks)) if i % 2 == 0]
    for pos, k in enumerate(order):
        p = f"{d}/chunk-{k:03d}.parquet"
        pq.write_table(
            pa.Table.from_pandas(chunks[k], preserve_index=False),
            p, coerce_timestamps="us")
        os.utime(p, (1_000_000 + pos, 1_000_000 + pos))
    snap = streaming_cdc_apply_ooo(spark, d, base, out)
    return snap.select("key", "val", "src")


def streaming_enrich_static(
    stream: DataFrame, dim: DataFrame
) -> DataFrame:
    """Stream-static broadcast enrichment — the stateless streaming
    join: each micro-batch joins the (small, broadcast) dimension with
    no state store, no watermark, and per-batch cost O(batch); the
    dimension re-resolves every batch, so slowly-changing dims pick up
    updates between batches for free. The fourth streaming join shape
    next to the two interval joins and the CDC fold."""
    return (
        stream
        .withColumn("k", F.col("user_id") % 25)
        .join(F.broadcast(dim), "k")
        .select("event_id", "event_type", "segment")
    )


def enrich_static_replay(spark, events_path: str,
                         n_chunks: int = 4) -> DataFrame:
    """Gate harness for streaming_enrich_static: replay the events
    table in ts-ordered chunks joined to a deterministic 25-key
    segment dimension; stateless ⇒ the union of batch outputs equals
    the batch join exactly (the oracle) with no sentinel machinery."""
    import shutil
    import tempfile
    import uuid

    import pyarrow as pa
    import pyarrow.parquet as pq

    child = spark.newSession()
    child.conf.set("spark.sql.shuffle.partitions", "8")
    spark = child

    dim = spark.range(0, 25).select(
        F.col("id").alias("k"),
        F.concat(F.lit("seg"), (F.col("id") % 5).cast("string"))
        .alias("segment"),
    )
    pdf = (
        spark.read.parquet(events_path)
        .select("event_id", "ts", "user_id", "event_type")
        .toPandas()
        .sort_values(["ts", "event_id"])
        .reset_index(drop=True)
    )
    d = tempfile.mkdtemp(prefix="enrich_replay_")
    try:
        step = (len(pdf) + n_chunks - 1) // n_chunks
        for k, i in enumerate(range(0, len(pdf), step)):
            pq.write_table(
                pa.Table.from_pandas(pdf.iloc[i:i + step],
                                     preserve_index=False),
                f"{d}/chunk-{k:03d}.parquet", coerce_timestamps="us")
        from .stateful import run_events_stream_once

        name = "enrich_replay_" + uuid.uuid4().hex[:8]
        out = run_events_stream_once(
            spark, d, lambda s: streaming_enrich_static(s, dim), name)
        out = out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(d, ignore_errors=True)
    return out


def cdc_time_travel_replay(
    spark: SparkSession, sf_dir: str, n_chunks: int = 4,
    read_version: int = 2,
) -> DataFrame:
    """TIME-TRAVEL read over the versioned CDC snapshot line: run the
    identical in-order replay as cdc_apply_replay, then read snapshot
    v``read_version`` — the state after exactly that many committed
    micro-batches — instead of the head. The committed-version
    directories ARE the lakehouse time-travel surface (`VERSION AS
    OF`): because each fold equals the batch merge of its changelog
    prefix, the oracle is the one-shot MERGE SQL over the first
    read_version chunks' rows (a deterministic (ts, event_id)-order
    prefix). Readers of v_k never observe later writes — the
    committed-snapshot discipline the pipeline sink shares."""
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    base = cust.select(
        F.col("c_custkey").alias("key"),
        F.round(F.col("c_acctbal") * 100, 0).cast("bigint")
        .alias("val"),
    )
    chg = spark.read.parquet(f"{sf_dir}/events.parquet").where(
        F.col("event_type").isin("signup", "purchase", "error")
    ).select(
        (F.col("user_id") + 1).alias("key"),
        F.round(F.coalesce(F.col("value"), F.lit(0.0)) * 100, 0)
        .cast("bigint").alias("val"),
        F.when(F.col("event_type") == "error", F.lit("D"))
        .when(F.col("event_type") == "signup", F.lit("I"))
        .otherwise(F.lit("U")).alias("op"),
        "ts", "event_id",
    )
    pdf = chg.toPandas().sort_values(["ts", "event_id"]) \
        .reset_index(drop=True)
    d = tempfile.mkdtemp(prefix="cdc_tt_replay_")
    out = tempfile.mkdtemp(prefix="cdc_tt_state_")
    step = (len(pdf) + n_chunks - 1) // n_chunks
    for k, i in enumerate(range(0, len(pdf), step)):
        pq.write_table(
            pa.Table.from_pandas(pdf.iloc[i:i + step],
                                 preserve_index=False),
            f"{d}/chunk-{k:03d}.parquet", coerce_timestamps="us")
    streaming_cdc_apply(spark, d, base, out)
    return spark.read.parquet(f"{out}/v{read_version}").select(
        "key", "val", "src"
    )
