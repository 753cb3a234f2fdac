"""Custom stateful streaming operators over the events stream.

Streaming twins of the batch ops in ops/events.py (the reference has
no streaming surface — SURVEY.md §2 — these are pipeline-side
additions for a long-running ingest):

- streaming_sessionize: gap-based sessionization as a CUSTOM STATEFUL
  operator via applyInPandasWithState (Arrow-batched, no per-row
  Python). Spark has session windows, but the batch twin assigns a
  per-user ordinal session_seq — reproducing that exactly needs
  explicit state, which is precisely what the GroupState API is for.
- streaming_dedup_events: exactly-once event dedup with
  dropDuplicatesWithinWatermark — dedup state is EVICTED once the
  watermark passes, so state stays bounded at any scale (a plain
  streaming dropDuplicates keys state forever).

Scale design: state per user is only the timestamps of the user's
still-open sessions — everything older than (watermark - gap) has been
emitted and removed, so state size is bounded by the event rate within
one watermark horizon, independent of total stream length. Groups are
hash-partitioned by user_id by the streaming planner; no skew beyond
the per-user event rate itself.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from ..ops.events import SESSION_GAP_MIN
from ..ops.sketch import scaled_alpha

SESSION_OUT_SCHEMA = StructType([
    StructField("user_id", LongType()),
    StructField("session_seq", LongType()),
    StructField("session_start", TimestampType()),
    StructField("session_end", TimestampType()),
    StructField("n_events", LongType()),
])

# (pending open-session event timestamps in epoch ms, ascending;
#  number of sessions already emitted for this user)
_STATE_SCHEMA = StructType([
    StructField("pending_ms", ArrayType(LongType())),
    StructField("emitted_seq", LongType()),
])

_GAP_MS = SESSION_GAP_MIN * 60 * 1000


_GAP_S = SESSION_GAP_MIN * 60


def _split_sessions(ts_us: list) -> list:
    """Ascending epoch-microsecond timestamps → list of sessions (lists
    of timestamps), new session when the gap to the previous event
    exceeds the gap. The gap is compared on SECONDS-FLOORED values —
    exactly the batch twin's unix_seconds(lag()) predicate — so a
    boundary gap (e.g. 1800.4s between .9 and .3 sub-second parts)
    splits identically in both engines."""
    sessions: list = []
    cur: list = []
    for t in ts_us:
        if cur and t // 1_000_000 - cur[-1] // 1_000_000 > _GAP_S:
            sessions.append(cur)
            cur = []
        cur.append(t)
    if cur:
        sessions.append(cur)
    return sessions


def _sessionize_fn(
    key: Tuple[Any, ...],
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    pending: list = []
    seq = 0
    if state.exists:
        pending, seq = state.get
        pending = list(pending)
    for pdf in pdfs:
        if len(pdf):
            # tz-naive datetime64[ns] → epoch us, preserving the full
            # microsecond precision of the source for the emitted
            # session bounds (gap logic floors to seconds separately)
            pending.extend((pdf["ts"].astype("int64") // 1_000).tolist())
    pending.sort()
    wm = state.getCurrentWatermarkMs()

    sessions = _split_sessions(pending)
    # Sessions are in ts order; a session is CLOSED once the watermark
    # proves no future event can extend it (any such event would carry
    # ts <= session_end + gap <= wm and be dropped as late before this
    # operator). Closure is therefore a prefix of the session list, so
    # the ordinal seq matches the batch twin's ts-ordered running sum.
    rows = []
    still: list = []
    first_open_end = None
    for s in sessions:
        # closure check in watermark milliseconds (floor of the us value
        # — conservative: never closes earlier than the true event time)
        if not still and s[-1] // 1_000 + _GAP_MS <= wm:
            seq += 1
            rows.append((
                key[0], seq,
                pd.Timestamp(s[0], unit="us"),
                pd.Timestamp(s[-1], unit="us"),
                len(s),
            ))
        else:
            if first_open_end is None:
                first_open_end = s[-1]
            still.extend(s)

    # State always keeps the emitted-session counter: the ordinal
    # session_seq is a forever-per-user running count (same as the
    # batch twin), so removing state on an empty tail would restart the
    # numbering when the user reappears. Keys are bounded by user
    # cardinality, values by the open-session horizon.
    state.update((still, seq))
    if still:
        # wake as soon as the FIRST open session becomes provably
        # closed (not the last — a closable prefix must not wait for
        # the whole tail's horizon), even if the user never sends
        # another event
        timeout = first_open_end // 1_000 + _GAP_MS + 1
        state.setTimeoutTimestamp(max(timeout, wm + 1))

    if rows:
        yield pd.DataFrame(
            rows,
            columns=[
                "user_id", "session_seq", "session_start",
                "session_end", "n_events",
            ],
        )


def streaming_sessionize(
    stream: DataFrame, delay: str = "30 minutes"
) -> DataFrame:
    """Gap-based sessions per user over an event stream; emits each
    session exactly once, when the event-time watermark passes
    session_end + gap. Output matches the batch sessionize() rows for
    every session the watermark has closed."""
    return (
        stream
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", delay)
        .groupBy("user_id")
        .applyInPandasWithState(
            _sessionize_fn,
            SESSION_OUT_SCHEMA,
            _STATE_SCHEMA,
            "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )


def run_events_stream_once(spark, events_dir: str, transform, out_table: str,
                           output_mode: str = "append"):
    """Replay a parquet events dir file-by-file (1 file = 1 micro-batch,
    files in path order — write them in ascending-ts chunks so the
    watermark advances monotonically like a live source) through
    `transform` into an in-memory sink; returns the sink table."""
    schema = spark.read.parquet(events_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(events_dir)
    )
    q = (
        transform(stream)
        .writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(out_table)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(out_table)


_DELAY_MS = 30 * 60 * 1000


def sessionize_replay_closed(
    spark, events_path: str, n_chunks: int = 4
) -> DataFrame:
    """Gate harness for the stateful streaming sessionizer: replay the
    events table as an in-order stream (ascending-ts chunk files, one
    per micro-batch) through streaming_sessionize and return the
    DETERMINISTICALLY CLOSED session set — sessions with
    floor_ms(session_end) + gap <= floor_ms(max ts) - delay — which is
    exactly the batch sessionize() output under the same filter.

    Two far-future sentinel events (user -1) are appended as their own
    trailing chunks: timeouts fire at the START of a micro-batch
    against the PREVIOUS batch's watermark, so the first sentinel
    flushes everything closed by the final real watermark and the
    second flushes any 1-ms boundary straggler — all inside data
    batches, independent of whether the engine runs a shutdown batch.
    Sentinel sessions and later-than-watermark extras are filtered out.

    The driver-side toPandas/chunk-write here is the REPLAY FIXTURE,
    not the operator: in production the source is Kafka/files arriving
    in event order and streaming_sessionize runs unchanged.
    """
    import shutil
    import tempfile
    import uuid

    import pyarrow as pa
    import pyarrow.parquet as pq

    # Stateful micro-batch cost is dominated by per-partition state
    # store instances (tasks × batches), not data volume: run the
    # replay in a child session with a narrower shuffle width instead
    # of the session-global one. (At real scale a long-running
    # streaming job sizes this to its state volume, not to the batch
    # analytics width.)
    child = spark.newSession()
    child.conf.set("spark.sql.shuffle.partitions", "8")
    spark = child

    pdf = spark.read.parquet(events_path).toPandas()
    pdf = pdf.sort_values(["ts", "event_id"]).reset_index(drop=True)
    max_ms = pd.Timestamp(pdf["ts"].max()).value // 1_000_000
    d = tempfile.mkdtemp(prefix="sess_replay_")
    try:
        step = (len(pdf) + n_chunks - 1) // n_chunks
        k = 0
        for i in range(0, len(pdf), step):
            pq.write_table(
                pa.Table.from_pandas(pdf.iloc[i:i + step],
                                     preserve_index=False),
                f"{d}/chunk-{k:03d}.parquet", coerce_timestamps="us")
            k += 1
        for days in (1, 2):
            tail = pdf.iloc[[-1]].copy()
            tail["ts"] = tail["ts"] + pd.Timedelta(days=days)
            tail["user_id"] = -1
            tail["event_id"] = -days
            pq.write_table(
                pa.Table.from_pandas(tail, preserve_index=False),
                f"{d}/chunk-{k:03d}.parquet", coerce_timestamps="us")
            k += 1
        name = "sess_replay_" + uuid.uuid4().hex[:8]
        out = run_events_stream_once(spark, d, streaming_sessionize, name)
        # memory-sink rows live in driver memory; safe to drop the files
        out = out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(d, ignore_errors=True)
    wm = max_ms - _DELAY_MS
    return out.where(
        (F.col("user_id") >= 0)
        & (F.unix_millis(F.col("session_end")) + F.lit(_GAP_MS) <= F.lit(wm))
    )


HLL_OUT_SCHEMA = StructType([
    StructField("event_type", StringType()),
    StructField("n_batches", LongType()),
    StructField("n_registers_used", LongType()),
    StructField("est_distinct", DoubleType()),
])

# (the 4096 HLL registers, densely; number of micro-batches folded in)
_HLL_STATE_SCHEMA = StructType([
    StructField("regs", ArrayType(LongType())),
    StructField("n_batches", LongType()),
])


def _hll_fn(
    key: Tuple[Any, ...],
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    import hashlib
    import math

    regs = [0] * 4096
    nb = 0
    if state.exists:
        regs, nb = state.get
        regs = list(regs)
    for pdf in pdfs:
        for v in pdf["user_id"].dropna().tolist():
            h = hashlib.md5(str(v).encode()).hexdigest()
            b = int(h[:3], 16)
            x = int(h[3:18], 16)
            rho = 61 if x == 0 else 61 - x.bit_length()
            if rho > regs[b]:
                regs[b] = rho
    nb += 1
    state.update((regs, nb))
    used = sum(1 for r in regs if r)
    s = sum((1 << (50 - r)) if r <= 50 else 0 for r in regs if r)
    s += (4096 - used) * (1 << 50)
    raw = scaled_alpha() / s
    empty = 4096 - used
    if raw <= 2.5 * 4096 and empty > 0:
        est = 4096.0 * math.log(4096.0 / empty)
    else:
        est = raw
    yield pd.DataFrame(
        [(key[0], nb, used, est)],
        columns=["event_type", "n_batches", "n_registers_used",
                 "est_distinct"],
    )


def streaming_distinct_users(stream: DataFrame) -> DataFrame:
    """Continuously-updated distinct-user estimate per event_type — the
    streaming twin of ops/sketch.hll_distinct, same md5 registers and
    closed forms, so after the final micro-batch the emitted estimate
    is BIT-IDENTICAL to the batch sketch over the same rows (the
    parity test asserts equality, not closeness).

    This is where HLL's mergeability pays off in streaming: state per
    key is a CONSTANT 4096 registers regardless of how many distinct
    users ever appear — a streaming exact count-distinct would grow
    state without bound. Emits (event_type, n_batches,
    n_registers_used, est_distinct) in update mode each micro-batch;
    no watermark needed because state never grows."""
    return (
        stream
        .groupBy("event_type")
        .applyInPandasWithState(
            _hll_fn,
            HLL_OUT_SCHEMA,
            _HLL_STATE_SCHEMA,
            "update",
            GroupStateTimeout.NoTimeout,
        )
    )


def streaming_dedup_events(
    stream: DataFrame, delay: str = "30 minutes"
) -> DataFrame:
    """Exactly-once events by event_id. dropDuplicatesWithinWatermark
    keeps a key's dedup state only until the watermark passes, so the
    state store is bounded by the duplicate-arrival horizon instead of
    the full key cardinality — the only viable streaming dedup at
    10^12-event scale."""
    return (
        stream
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", delay)
        .dropDuplicatesWithinWatermark(["event_id"])
    )


def dedup_replay(spark, events_path: str, n_chunks: int = 4) -> DataFrame:
    """Gate harness for streaming_dedup_events: inject an at-least-once
    duplicate (all columns identical, ts +1 minute) for every
    event_id % 3 == 0 row, replay the union as ascending-ts chunk
    files (one per micro-batch), and return the stream's emitted rows
    — which must be exactly one row per original event_id, the batch
    DISTINCT. The global ts sort makes the check deterministic AND
    keeps every duplicate inside the watermark horizon by
    construction: when a duplicate (ts0+1m) lands in a later batch,
    the previous batch's max ts is ≤ ts0+1m (sorted chunks), so the
    watermark is ≤ ts0+1m−30m, strictly before the key's ts0+30m
    eviction point. ts is projected OUT of the result because which
    twin is emitted within a single micro-batch is engine-order
    dependent; every other column is identical on both twins.

    The driver-side toPandas/chunk-write is the REPLAY FIXTURE, not
    the operator (same charter as sessionize_replay_closed)."""
    import shutil
    import tempfile
    import uuid

    import pyarrow as pa
    import pyarrow.parquet as pq

    child = spark.newSession()
    child.conf.set("spark.sql.shuffle.partitions", "8")
    spark = child

    pdf = (
        spark.read.parquet(events_path)
        .select("event_id", "ts", "user_id", "event_type")
        .toPandas()
    )
    dups = pdf[pdf["event_id"] % 3 == 0].copy()
    dups["ts"] = dups["ts"] + pd.Timedelta(minutes=1)
    both = pd.concat([pdf, dups], ignore_index=True)
    both = both.sort_values(["ts", "event_id"]).reset_index(drop=True)
    d = tempfile.mkdtemp(prefix="dedup_replay_")
    try:
        step = (len(both) + n_chunks - 1) // n_chunks
        for k, i in enumerate(range(0, len(both), step)):
            pq.write_table(
                pa.Table.from_pandas(both.iloc[i:i + step],
                                     preserve_index=False),
                f"{d}/chunk-{k:03d}.parquet", coerce_timestamps="us")
        name = "dedup_replay_" + uuid.uuid4().hex[:8]
        out = run_events_stream_once(spark, d, streaming_dedup_events,
                                     name)
        out = out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(d, ignore_errors=True)
    return out.select("event_id", "user_id", "event_type")


def streaming_tumbling_counts(
    stream: DataFrame, delay: str = "30 minutes", win: str = "1 hour"
) -> DataFrame:
    """Tumbling-window event counts per type with a watermark — THE
    canonical Structured Streaming aggregation (the hash-exact,
    integer-only sibling of stream.streaming_windowed_counts, whose
    float sum_value serves the parity test but not a cross-engine
    hash oracle): state is bounded by
    open windows (closed windows emit once, in append mode, when the
    watermark passes the window end, and their state is dropped);
    late rows beyond the delay are discarded instead of reopening
    emitted windows. The batch twin is a plain date_trunc group-by."""
    return (
        stream
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", delay)
        .groupBy(F.window("ts", win), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("window.start").alias("win_start"),
            "event_type",
            "n_events",
        )
    )


def windowed_replay_closed(
    spark, events_path: str, n_chunks: int = 4
) -> DataFrame:
    """Gate harness for streaming_tumbling_counts: replay the events
    table as ascending-ts micro-batches; two far-future sentinel
    chunks (event_type __flush__, +1/+2 days) push the final
    watermark past every real window end so append mode emits ALL
    real windows inside data batches (the sessionize_replay_closed
    sentinel device); sentinel windows themselves stay open and are
    filtered. With the full table replayed, the emitted set equals
    the batch tumbling-window counts — the oracle."""
    import shutil
    import tempfile
    import uuid

    import pyarrow as pa
    import pyarrow.parquet as pq

    child = spark.newSession()
    child.conf.set("spark.sql.shuffle.partitions", "8")
    spark = child

    pdf = (
        spark.read.parquet(events_path)
        .select("event_id", "ts", "event_type")
        .toPandas()
        .sort_values(["ts", "event_id"])
        .reset_index(drop=True)
    )
    d = tempfile.mkdtemp(prefix="win_replay_")
    try:
        step = (len(pdf) + n_chunks - 1) // n_chunks
        k = 0
        for i in range(0, len(pdf), step):
            pq.write_table(
                pa.Table.from_pandas(pdf.iloc[i:i + step],
                                     preserve_index=False),
                f"{d}/chunk-{k:03d}.parquet", coerce_timestamps="us")
            k += 1
        for days in (1, 2):
            tail = pdf.iloc[[-1]].copy()
            tail["ts"] = tail["ts"] + pd.Timedelta(days=days)
            tail["event_type"] = "__flush__"
            tail["event_id"] = -days
            pq.write_table(
                pa.Table.from_pandas(tail, preserve_index=False),
                f"{d}/chunk-{k:03d}.parquet", coerce_timestamps="us")
            k += 1
        name = "win_replay_" + uuid.uuid4().hex[:8]
        out = run_events_stream_once(
            spark, d, streaming_tumbling_counts, name)
        out = out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(d, ignore_errors=True)
    return out.where(F.col("event_type") != "__flush__")


def streaming_session_windows(
    stream: DataFrame, gap: str = "30 minutes", delay: str = "30 minutes"
) -> DataFrame:
    """Spark's BUILT-IN session-window aggregation — the engine-native
    sibling of streaming_sessionize (applyInPandasWithState): state
    merging, watermark eviction, and append-mode emission are all
    Catalyst's (SessionWindowStateStore), no Python in the loop. Kept
    alongside the custom sessionizer deliberately: the custom one
    carries per-session derived state the built-in can't (and is the
    applyInPandasWithState showcase); this one is what you reach for
    FIRST at scale when plain (start, end, count) sessions suffice.
    Session semantics: an event exactly ``gap`` after the previous
    one still MERGES into the session (the engine treats the window
    end as a closed merge boundary — same gap-equal behavior as the
    custom sessionizer's strict-> rule; pinned by unit fixture), and
    the reported session end is EXCLUSIVE (last event + gap).
    Integer-only output: (user_id, session_start, session_end_excl,
    n_events), end EXCLUSIVE (last event + gap) — the engine's native
    window.end, emitted verbatim rather than re-deriving last-event
    ts, which the built-in does not expose."""
    return (
        stream
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", delay)
        .groupBy("user_id", F.session_window("ts", gap))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end_excl"),
            "n_events",
        )
    )


def session_window_replay_closed(
    spark, events_path: str, n_chunks: int = 4
) -> DataFrame:
    """Gate harness for streaming_session_windows: ascending-ts
    chunked replay (1 file = 1 micro-batch) with two far-future
    sentinel chunks (user_id -1, +1/+2 days) pushing the final
    watermark past every real session's end so append mode emits the
    complete real session set inside data batches; sentinel sessions
    filter out. The emitted set then equals the batch
    session_window group-by — the oracle (the windowed_replay_closed
    device, keyed)."""
    import shutil
    import tempfile
    import uuid

    import pyarrow as pa
    import pyarrow.parquet as pq

    child = spark.newSession()
    child.conf.set("spark.sql.shuffle.partitions", "8")
    spark = child

    pdf = (
        spark.read.parquet(events_path)
        .select("event_id", "ts", "user_id")
        .toPandas()
        .sort_values(["ts", "event_id"])
        .reset_index(drop=True)
    )
    d = tempfile.mkdtemp(prefix="sesswin_replay_")
    try:
        step = (len(pdf) + n_chunks - 1) // n_chunks
        k = 0
        for i in range(0, len(pdf), step):
            pq.write_table(
                pa.Table.from_pandas(pdf.iloc[i:i + step],
                                     preserve_index=False),
                f"{d}/chunk-{k:03d}.parquet", coerce_timestamps="us")
            k += 1
        for days in (1, 2):
            tail = pdf.iloc[[-1]].copy()
            tail["ts"] = tail["ts"] + pd.Timedelta(days=days)
            tail["user_id"] = -1
            tail["event_id"] = -days
            pq.write_table(
                pa.Table.from_pandas(tail, preserve_index=False),
                f"{d}/chunk-{k:03d}.parquet", coerce_timestamps="us")
            k += 1
        name = "sesswin_replay_" + uuid.uuid4().hex[:8]
        out = run_events_stream_once(
            spark, d, streaming_session_windows, name)
        out = out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(d, ignore_errors=True)
    return out.where(F.col("user_id") >= 0)


def late_replay_closed(
    spark, events_path: str, n_chunks: int = 6
) -> DataFrame:
    """Late-data DROP semantics gate: every 17th event's EVENT TIME is
    shifted 2 h earlier while its ARRIVAL position is unchanged, so
    once the watermark (30 min delay) has passed a shifted row's
    window end, the engine must discard it — the one watermark
    behavior the strictly-in-order replays never exercise. Chunks are
    cut over ARRIVAL order (1 file = 1 micro-batch, equal row
    counts); two far-future sentinels flush the final windows. The
    oracle reproduces the admission rule in closed form, as MEASURED
    on this engine's availableNow replay and pinned at three SFs: the
    watermark micro-batch k applies is (max event time of chunks
    ≤ k−2) − delay — watermark updates propagate with ONE COMMIT OF
    LAG, so a batch never sees the watermark its immediate
    predecessor established — and a row is admitted iff its window
    end ≥ that watermark. The two far-future sentinels exist for
    exactly this lag: the second one's batch finally sees the
    watermark the first advanced, flushing every real window.

    Emits streaming_tumbling_counts' (win_start, event_type,
    n_events) over the admitted set."""
    import shutil
    import tempfile
    import uuid

    import pyarrow as pa
    import pyarrow.parquet as pq

    child = spark.newSession()
    child.conf.set("spark.sql.shuffle.partitions", "8")
    spark = child

    pdf = (
        spark.read.parquet(events_path)
        .select("event_id", "ts", "event_type")
        .toPandas()
        .sort_values(["ts", "event_id"])
        .reset_index(drop=True)
    )
    late = pdf["event_id"] % 17 == 0
    pdf.loc[late, "ts"] = pdf.loc[late, "ts"] - pd.Timedelta(hours=2)
    d = tempfile.mkdtemp(prefix="late_replay_")
    try:
        step = (len(pdf) + n_chunks - 1) // n_chunks
        k = 0
        for i in range(0, len(pdf), step):
            pq.write_table(
                pa.Table.from_pandas(pdf.iloc[i:i + step],
                                     preserve_index=False),
                f"{d}/chunk-{k:03d}.parquet", coerce_timestamps="us")
            k += 1
        for days in (1, 2):
            tail = pdf.iloc[[-1]].copy()
            tail["ts"] = tail["ts"] + pd.Timedelta(days=days)
            tail["event_type"] = "__flush__"
            tail["event_id"] = -days
            pq.write_table(
                pa.Table.from_pandas(tail, preserve_index=False),
                f"{d}/chunk-{k:03d}.parquet", coerce_timestamps="us")
            k += 1
        name = "late_replay_" + uuid.uuid4().hex[:8]
        out = run_events_stream_once(
            spark, d, streaming_tumbling_counts, name)
        out = out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(d, ignore_errors=True)
    return out.where(F.col("event_type") != "__flush__")
