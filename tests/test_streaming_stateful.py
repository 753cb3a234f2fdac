"""Stateful-streaming parity tests: the applyInPandasWithState
sessionizer and the watermarked dedup must agree with their batch twins
(ops/events.py) on every session/row the watermark has closed."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from pyspark.sql import functions as F

from shacl_rust_spark.ops import events as ev
from shacl_rust_spark.streaming import (
    run_events_stream_once,
    streaming_dedup_events,
    streaming_distinct_users,
    streaming_sessionize,
)

EVENTS = "/root/testdata/sf0.001/events.parquet"
GAP_MS = ev.SESSION_GAP_MIN * 60 * 1000
DELAY_MS = 30 * 60 * 1000


def _write_ts_ordered_chunks(src_pdf: pd.DataFrame, out_dir, n_chunks=6,
                             dup_each=False, sentinel=False):
    """Write ascending-ts chunk files chunk-00.parquet… so the file
    source replays them like a live in-order stream. dup_each writes
    every chunk twice (adjacent) to plant within-watermark duplicates.
    sentinel appends a last chunk holding one far-future event (user
    -1): timeouts are evaluated at the START of a micro-batch against
    the watermark of the previous one, so without a batch after the
    last real chunk the tail closures never flush (a live pipeline gets
    this for free from the next arriving event — the sentinel is that
    event)."""
    out_dir.mkdir()
    pdf = src_pdf.sort_values(["ts", "event_id"]).reset_index(drop=True)
    step = (len(pdf) + n_chunks - 1) // n_chunks
    k = 0
    for i in range(0, len(pdf), step):
        chunk = pa.Table.from_pandas(pdf.iloc[i:i + step],
                                     preserve_index=False)
        # Spark's parquet reader rejects TIMESTAMP(NANOS)
        pq.write_table(chunk, out_dir / f"chunk-{k:03d}.parquet",
                       coerce_timestamps="us")
        k += 1
        if dup_each:
            pq.write_table(chunk, out_dir / f"chunk-{k:03d}.parquet",
                           coerce_timestamps="us")
            k += 1
    if sentinel:
        tail = pdf.iloc[[-1]].copy()
        tail["ts"] = tail["ts"] + pd.Timedelta(days=2)
        tail["user_id"] = -1
        tail["event_id"] = -1
        pq.write_table(pa.Table.from_pandas(tail, preserve_index=False),
                       out_dir / f"chunk-{k:03d}.parquet",
                       coerce_timestamps="us")
    return str(out_dir)


def test_streaming_sessionize_matches_batch(spark, tmp_path):
    src = spark.read.parquet(EVENTS).toPandas()
    d = _write_ts_ordered_chunks(src, tmp_path / "sess_stream",
                                 sentinel=True)

    out = run_events_stream_once(
        spark, d, streaming_sessionize, "sess_stream_test")
    # exact-datetime comparison (timestamps carry microseconds; going
    # through float epoch seconds would round)
    got = {(r.user_id, r.session_seq):
           (r.session_start, r.session_end, r.n_events)
           for r in out.collect() if r.user_id != -1}

    # batch truth over the REAL events, restricted to sessions the last
    # pre-sentinel watermark closed: wm = floor_ms(max(ts)) - delay;
    # closed iff floor_ms(session_end) + gap <= wm
    batch = ev.sessionize(
        spark.read.parquet(d)
        .where(F.col("user_id") != -1)
        .withColumn("ts", F.col("ts").cast("timestamp"))
    ).collect()

    def _ms(dt):
        return pd.Timestamp(dt).value // 1_000_000

    wm = max(_ms(r.session_end) for r in batch) - DELAY_MS
    want_all = {(r.user_id, r.session_seq):
                (r.session_start, r.session_end, r.n_events)
                for r in batch}
    closed = {k for k, v in want_all.items() if _ms(v[1]) + GAP_MS <= wm}

    assert closed, "fixture must close at least one session"
    # sound: every emitted session is byte-identical to its batch twin
    assert all(want_all.get(k) == v for k, v in got.items())
    # complete: every session the final real watermark provably closed
    # was emitted (the engine may additionally flush boundary sessions
    # in its shutdown timeout batch — those are checked by soundness)
    assert closed <= set(got)


def test_streaming_sessionize_emits_exactly_once(spark, tmp_path):
    src = spark.read.parquet(EVENTS).toPandas()
    d = _write_ts_ordered_chunks(src, tmp_path / "sess_once")
    out = run_events_stream_once(
        spark, d, streaming_sessionize, "sess_once_test").collect()
    keys = [(r.user_id, r.session_seq) for r in out]
    assert len(keys) == len(set(keys))


def test_streaming_hll_matches_batch_sketch_exactly(spark, tmp_path):
    """After the last micro-batch, the streaming HLL's estimate per
    event_type equals the batch sketch bit-for-bit (same registers),
    including across duplicate re-deliveries (HLL updates are
    idempotent — max is max)."""
    from shacl_rust_spark.ops import sketch

    src = spark.read.parquet(EVENTS).toPandas()
    d = _write_ts_ordered_chunks(src, tmp_path / "hll_stream",
                                 dup_each=True)
    out = run_events_stream_once(
        spark, d, streaming_distinct_users, "hll_stream_test",
        output_mode="update")
    rows = out.collect()
    final = {}
    for r in rows:
        if (r.event_type not in final
                or r.n_batches > final[r.event_type].n_batches):
            final[r.event_type] = r
    batch = {
        r.event_type: r
        for r in sketch.hll_distinct(
            spark.read.parquet(EVENTS), F.col("user_id"),
            group_cols=("event_type",)).collect()
    }
    assert set(final) == set(batch)
    for et, b in batch.items():
        s = final[et]
        assert s.n_registers_used == b.n_registers_used
        assert s.est_distinct == b.est_distinct  # bit-identical
        # sanity: estimate is in the right ballpark of the exact count
        exact = len(set(src[src["event_type"] == et]["user_id"]))
        assert abs(s.est_distinct - exact) / max(exact, 1) < 0.1


def test_streaming_dedup_within_watermark(spark, tmp_path):
    """Each chunk written twice: the duplicate copy arrives within the
    watermark and must be dropped; output = the distinct event set."""
    src = spark.read.parquet(EVENTS).toPandas()
    d = _write_ts_ordered_chunks(src, tmp_path / "dedup_stream",
                                 dup_each=True)
    out = run_events_stream_once(
        spark, d, streaming_dedup_events, "dedup_stream_test")
    got = sorted(r.event_id for r in out.collect())
    want = sorted(src["event_id"].tolist())
    assert got == want


def test_stream_stream_attribution_matches_batch_range_join(spark, tmp_path):
    """Planted interval-join case: pairs inside the 30-min horizon
    join, a click 1 s past the horizon and a click before the view do
    not; the full-replay stream output equals the batch range join."""
    import datetime as dt

    from shacl_rust_spark.streaming.stream import attribution_replay

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        # user 1: view@0; clicks at +10min (in), +30min (boundary, in),
        # +30min1s (out), and -1s (before the view, out)
        (1, t0, 1, "view", 5.0, "{}"),
        (2, t0 + dt.timedelta(minutes=10), 1, "click", 0.0, "{}"),
        (3, t0 + dt.timedelta(minutes=30), 1, "click", 0.0, "{}"),
        (4, t0 + dt.timedelta(minutes=30, seconds=1), 1, "click", 0.0, "{}"),
        (5, t0 - dt.timedelta(seconds=1), 1, "click", 0.0, "{}"),
        # user 2: same-ts view+click (boundary, in); user 3: view only
        (6, t0, 2, "view", 7.0, "{}"),
        (7, t0, 2, "click", 0.0, "{}"),
        (8, t0, 3, "view", 1.0, "{}"),
    ]
    pdf = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type",
                       "value", "props"])
    d = str(tmp_path / "attr_events")
    import os
    os.makedirs(d)
    pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False),
                   f"{d}/events.parquet", coerce_timestamps="us")
    out = attribution_replay(spark, f"{d}/events.parquet", n_chunks=3)
    got = {(r.click_id, r.view_id) for r in out.collect()}
    assert got == {(2, 1), (3, 1), (7, 6)}


def test_streaming_cdc_fold_matches_batch_merge(spark, tmp_path):
    """Cross-chunk orderings that distinguish a fold from a one-shot
    merge: delete-then-reinsert, upsert-then-delete, and an untouched
    base key keeping src='base' across batches where other keys
    change. The fold over in-order chunks must equal cdc_apply."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pyspark.sql import functions as F
    from shacl_rust_spark.ops.olap import cdc_apply
    from shacl_rust_spark.streaming.stream import streaming_cdc_apply

    base = spark.createDataFrame(
        [(1, 100), (2, 200), (3, 300)], ["key", "val"])
    chunk1 = [(1, 111, "D", 1, 1),   # delete base key...
              (4, 444, "U", 1, 2),   # new key via update
              (5, 555, "U", 1, 3)]
    chunk2 = [(1, 122, "U", 2, 4),   # ...reinsert it later
              (5, 0, "D", 2, 5)]     # delete the new key later
    d = tmp_path / "cdc_chunks"
    d.mkdir()
    for i, rows in enumerate([chunk1, chunk2]):
        pq.write_table(
            pa.table({
                "key": [r[0] for r in rows],
                "val": [r[1] for r in rows],
                "op": [r[2] for r in rows],
                "ts": [r[3] for r in rows],
                "event_id": [r[4] for r in rows],
            }),
            str(d / f"chunk-{i:03d}.parquet"))
    snap = streaming_cdc_apply(
        spark, str(d), base, str(tmp_path / "cdc_state"),
        seq_cols=("ts", "event_id"))
    got = {(r.key, r.val, r.src) for r in snap.collect()}
    chg = spark.createDataFrame(
        chunk1 + chunk2, ["key", "val", "op", "ts", "event_id"])
    want = {(r.key, r.val, r.src)
            for r in cdc_apply(base, chg,
                               seq_cols=("ts", "event_id")).collect()}
    assert got == want
    assert got == {(1, 122, "cdc"), (2, 200, "base"), (3, 300, "base"),
                   (4, 444, "cdc")}


def _write_cdc_chunks(tmp_path, name, chunks):
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path / name
    d.mkdir()
    for pos, rows in enumerate(chunks):
        p = str(d / f"chunk-{pos:03d}.parquet")
        pq.write_table(
            pa.table({
                "key": [r[0] for r in rows],
                "val": [r[1] for r in rows],
                "op": [r[2] for r in rows],
                "ts": [r[3] for r in rows],
                "event_id": [r[4] for r in rows],
            }), p)
        os.utime(p, (1_000_000 + pos, 1_000_000 + pos))
    return str(d)


def test_streaming_cdc_ooo_fold_is_order_invariant(spark, tmp_path):
    """The seq-guarded tombstone merge must converge to the one-shot
    batch merge for EVERY delivery order of the same chunks — the
    scenarios that break a naive fold: a stale upsert arriving after
    the delete that supersedes it (must NOT resurrect the key), a
    stale delete arriving after the reinsert that supersedes it (must
    NOT kill it), and a redelivered duplicate (idempotent)."""
    from itertools import permutations

    from shacl_rust_spark.ops.olap import cdc_apply
    from shacl_rust_spark.streaming.stream import streaming_cdc_apply_ooo

    base = spark.createDataFrame(
        [(1, 100), (2, 200), (3, 300)], ["key", "val"])
    all_rows = [
        (1, 111, "U", 1, 1),   # stale upsert of key 1...
        (1, 0, "D", 2, 2),     # ...superseded by this delete
        (2, 0, "D", 1, 3),     # stale delete of key 2...
        (2, 222, "U", 2, 4),   # ...superseded by this reinsert
        (4, 444, "I", 1, 5),   # new key
        (4, 444, "I", 1, 5),   # exact redelivery (at-least-once)
    ]
    chg = spark.createDataFrame(
        all_rows, ["key", "val", "op", "ts", "event_id"])
    want = {(r.key, r.val, r.src)
            for r in cdc_apply(base, chg,
                               seq_cols=("ts", "event_id")).collect()}
    assert want == {(3, 300, "base"), (2, 222, "cdc"),
                    (4, 444, "cdc")}
    splits = [all_rows[0:2], all_rows[2:4], all_rows[4:6]]
    for pi, perm in enumerate(permutations(range(3))):
        d = _write_cdc_chunks(
            tmp_path, f"ooo_{pi}", [splits[i] for i in perm])
        snap = streaming_cdc_apply_ooo(
            spark, d, base, str(tmp_path / f"ooo_state_{pi}"),
            seq_cols=("ts", "event_id"))
        got = {(r.key, r.val, r.src) for r in snap.collect()}
        assert got == want, f"order {perm} diverged: {got}"


def test_streaming_mv_incremental_fold_equals_recompute(spark, tmp_path):
    """Folding micro-batch partial aggregates into the MV must equal
    the one-shot GROUP BY recompute, in either chunk order — exact
    DECIMAL accumulation makes the fold order-independent."""
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq

    from shacl_rust_spark.streaming.stream import streaming_mv_incremental

    t = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        ("click", t, 0.1), ("click", t, 0.2),
        ("view", t + dt.timedelta(days=1), 0.3),
        ("click", t + dt.timedelta(days=1), None),
    ]
    chunks = [rows[:2], rows[2:]]
    want = {("click", "2024-01-01", 2, 0.3),
            ("view", "2024-01-02", 1, 0.3),
            ("click", "2024-01-02", 1, None)}
    for oi, order in enumerate([(0, 1), (1, 0)]):
        d = tmp_path / f"mv_src_{oi}"
        d.mkdir()
        for pos, ci in enumerate(order):
            p = str(d / f"chunk-{pos:03d}.parquet")
            pq.write_table(pa.table({
                "event_type": [r[0] for r in chunks[ci]],
                "ts": pa.array([r[1] for r in chunks[ci]],
                               type=pa.timestamp("us")),
                "value": [r[2] for r in chunks[ci]],
            }), p)
            import os
            os.utime(p, (1_000_000 + pos, 1_000_000 + pos))
        mv = streaming_mv_incremental(
            spark, str(d), str(tmp_path / f"mv_out_{oi}"))
        got = {(r.event_type, r.day, r.n_events,
                round(r.sum_value, 6) if r.sum_value is not None
                else None)
               for r in mv.collect()}
        assert got == want, f"order {order}: {got}"


def test_compact_cdc_snapshot_drops_only_expired_tombstones(spark, tmp_path):
    """Compaction below the replay low-watermark removes old tombstones
    but keeps live rows (incl. base rows with NULL seq) and tombstones
    at/after the watermark — then the compacted snapshot still absorbs
    a late stale upsert correctly at the horizon boundary."""
    from shacl_rust_spark.streaming.stream import (
        compact_cdc_snapshot, streaming_cdc_apply_ooo)

    base = spark.createDataFrame([(1, 100)], ["key", "val"])
    chunk = [(2, 0, "D", 1, 1),    # old tombstone (below watermark)
             (3, 0, "D", 5, 5),    # young tombstone (kept)
             (4, 444, "U", 2, 2)]  # live cdc row
    d = _write_cdc_chunks(tmp_path, "compact_src", [chunk])
    out = str(tmp_path / "compact_state")
    streaming_cdc_apply_ooo(spark, d, base, out,
                            seq_cols=("ts", "event_id"))
    from pyspark.sql import functions as F
    snap = spark.read.parquet(f"{out}/v1")
    wm = F.struct(F.lit(3).cast("bigint").alias("ts"),
                  F.lit(0).cast("bigint").alias("event_id"))
    kept = compact_cdc_snapshot(snap, wm)
    got = {(r.key, bool(r._del)) for r in kept.collect()}
    assert got == {(1, False), (3, True), (4, False)}  # key 2 purged
    # the young tombstone still blocks a stale upsert (seq 4 < 5)
    assert (3, True) in got


def test_stream_stream_attribution_outer_emits_null_rows(spark, tmp_path):
    """The left-outer variant must additionally emit null rows for
    the never-clicked view AND for the out-of-horizon-only view —
    including a TAIL view whose horizon extends past the last real
    event (only the sentinel flush can evict it)."""
    import datetime as dt
    import os

    from shacl_rust_spark.streaming.stream import (
        attribution_outer_replay,
    )

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        (1, t0, 1, "view", 5.0, "{}"),                       # clicked
        (2, t0 + dt.timedelta(minutes=10), 1, "click", 0.0, "{}"),
        (3, t0, 2, "view", 7.0, "{}"),                       # never
        # user 3: click arrives 31 min later — outside horizon
        (4, t0, 3, "view", 1.0, "{}"),
        (5, t0 + dt.timedelta(minutes=31), 3, "click", 0.0, "{}"),
        # tail view: last real event, nothing after it
        (6, t0 + dt.timedelta(minutes=40), 4, "view", 2.0, "{}"),
    ]
    pdf = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type",
                       "value", "props"])
    d = str(tmp_path / "attr_outer_events")
    os.makedirs(d)
    pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False),
                   f"{d}/events.parquet", coerce_timestamps="us")
    out = attribution_outer_replay(spark, f"{d}/events.parquet",
                                   n_chunks=3)
    got = {(r.view_id, r.click_id_s) for r in out.collect()}
    assert got == {(1, "2"), (3, None), (4, None), (6, None)}


def test_attribution_replays_empty_input(spark, tmp_path):
    """Zero-row events must short-circuit to empty frames (the
    chunking loop can't run on zero rows), for both replay variants."""
    import os

    from shacl_rust_spark.streaming.stream import (
        attribution_outer_replay, attribution_replay,
    )

    pdf = pd.DataFrame(
        {"event_id": pd.Series([], dtype="int64"),
         "ts": pd.Series([], dtype="datetime64[us]"),
         "user_id": pd.Series([], dtype="int64"),
         "event_type": pd.Series([], dtype="object"),
         "value": pd.Series([], dtype="float64"),
         "props": pd.Series([], dtype="object")})
    d = str(tmp_path / "attr_empty")
    os.makedirs(d)
    pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False),
                   f"{d}/events.parquet", coerce_timestamps="us")
    assert attribution_replay(spark, f"{d}/events.parquet").count() == 0
    out = attribution_outer_replay(spark, f"{d}/events.parquet")
    assert out.count() == 0
    assert out.columns == ["view_id", "user_id", "view_ts",
                           "view_value", "click_id_s", "click_ts_s"]


def test_attribution_outer_null_user_survives_sentinel_filter(
    spark, tmp_path
):
    """A NULL-user view is real data: the batch left join emits it
    with null click columns, so the sentinel filter must be NULL-safe
    and keep it."""
    import datetime as dt
    import os

    from shacl_rust_spark.streaming.stream import (
        attribution_outer_replay,
    )

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    pdf = pd.DataFrame(
        [(1, t0, 7.0, 1.0, "view", "{}"),
         (2, t0, None, 5.0, "view", "{}")],
        columns=["event_id", "ts", "user_id", "value",
                 "event_type", "props"])
    pdf = pdf[["event_id", "ts", "user_id", "event_type",
               "value", "props"]]
    d = str(tmp_path / "attr_nulluser")
    os.makedirs(d)
    pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False),
                   f"{d}/events.parquet", coerce_timestamps="us")
    out = attribution_outer_replay(spark, f"{d}/events.parquet",
                                   n_chunks=1)
    got = {(r.view_id, r.user_id, r.click_id_s)
           for r in out.collect()}
    assert got == {(1, 7, None), (2, None, None)}
