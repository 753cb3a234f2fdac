"""Context-window chunking & contiguous shard packing — the last mile
of a training-data pipeline: documents → fixed-token-budget chunks →
deterministically packed output shards.

Chunking is a pure-Column explode (sequence → slice → array_join): one
scan, fan-out inside whole-stage codegen, no Python, no shuffle.

Shard assignment needs a GLOBAL prefix sum of token counts in doc_id
order — the one operation a naive window turns into a single-partition
bottleneck. The scale-safe shape used here is the classic two-phase
prefix sum: (1) per-bucket token totals (a tiny aggregate, one row per
doc_id range), (2) exclusive bucket offsets computed driver-side over
those few rows (bounded by n_buckets, like the driver-side closure caps
elsewhere in this repo), (3) broadcast the offsets back and run the
cumulative window PARTITIONED BY BUCKET — every partition-local window
runs in parallel and the global order is recovered exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import word_array


def chunk_documents(
    docs: DataFrame, chunk_tokens: int = 64, overlap: int = 16
) -> DataFrame:
    """(doc_id, chunk_id, n_chunk_tokens, chunk) — whitespace-token
    windows of `chunk_tokens` with `overlap` tokens shared between
    consecutive chunks; the final chunk may be short. n_chunks =
    1 + max(0, ceil((n - chunk_tokens) / stride))."""
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("need 0 <= overlap < chunk_tokens")
    stride = chunk_tokens - overlap
    toks = word_array()
    n = F.size(toks)
    n_chunks = F.lit(1) + F.greatest(
        F.lit(0), F.ceil((n - F.lit(chunk_tokens)) / F.lit(stride))
    ).cast("int")
    base = docs.select(
        "doc_id", toks.alias("_toks"),
        F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_id"),
    )
    piece = F.slice(
        F.col("_toks"), F.col("chunk_id") * stride + 1, chunk_tokens
    )
    return base.select(
        "doc_id", "chunk_id",
        F.size(piece).alias("n_chunk_tokens"),
        F.array_join(piece, " ").alias("chunk"),
    )


def assign_shards(
    docs: DataFrame, tokens_per_shard: int, bucket_width: int = 1000
) -> DataFrame:
    """(doc_id, n_tokens, shard) — contiguous packing: documents in
    doc_id order fill shard 0 until `tokens_per_shard` tokens are
    reached, then shard 1, ... A document's shard is determined by its
    STARTING offset in the global token stream, so every engine
    computing the same prefix sum agrees (the DuckDB oracle uses a
    plain global window; this implementation uses the distributed
    two-phase prefix sum described in the module docstring)."""
    d = docs.select(
        "doc_id", F.size(word_array()).alias("n_tokens")
    )
    started = _with_global_start(d, "n_tokens", bucket_width)
    return started.select(
        "doc_id", "n_tokens",
        F.floor(F.col("_start") / tokens_per_shard)
        .cast("long").alias("shard"),
    )


def _with_global_start(
    d: DataFrame, len_col: str, bucket_width: int
) -> DataFrame:
    """Adds ``_start`` = exclusive prefix sum of ``len_col`` in doc_id
    order — the distributed two-phase prefix sum from the module
    docstring (per-bucket totals → bounded driver offsets → broadcast
    back → per-bucket window). ``d`` must have a ``doc_id`` column."""
    from pyspark.sql import Window

    d = d.withColumn(
        "_bucket", (F.col("doc_id") / bucket_width).cast("long")
    )
    # materialize the per-bucket aggregate once (executor-side), then
    # check the bucket count SPARK-SIDE before collecting — a guard
    # after .collect() cannot prevent the driver blowup it exists to
    # stop, and counting a lazy plan would re-run the corpus scan
    per_bucket = (
        d.groupBy("_bucket").agg(F.sum(len_col).alias("_sum"))
        .localCheckpoint(eager=True)
    )
    n_buckets = per_bucket.count()
    if n_buckets > 1_000_000:
        raise ValueError(
            f"{n_buckets} prefix-sum buckets would be driver-collected; "
            f"raise bucket_width (currently {bucket_width}) so the "
            "bucket count stays bounded"
        )
    totals = sorted(
        (r["_bucket"], r["_sum"]) for r in per_bucket.collect()
    )
    offsets, running = [], 0
    for b, s in totals:
        offsets.append((b, running))
        running += s
    off = F.broadcast(
        d.sparkSession.createDataFrame(offsets, "_bucket long, _offset long")
    )
    w = (
        Window.partitionBy("_bucket").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    start = (
        F.col("_offset") + F.sum(len_col).over(w) - F.col(len_col)
    )
    return (
        d.join(off, "_bucket")
        .withColumn("_start", start.cast("long"))
        .drop("_bucket", "_offset")
    )


def pack_sequences(
    docs: DataFrame, seq_len: int = 128, bucket_width: int = 1000
) -> DataFrame:
    """GPT-style sequence packing: the corpus is one virtual token
    stream — each document's whitespace tokens followed by ONE eos
    token — cut into fixed ``seq_len`` training sequences with no
    padding; documents cross sequence boundaries. Output is the pack
    manifest, one row per (sequence, document) overlap:
    (seq_id, doc_id, offset_in_seq, n_tokens_in_seq) — exactly what a
    loader needs to materialize sequence ``seq_id`` by slicing the
    referenced documents. All integers, engine-exact; the DuckDB
    oracle states the same closed form over a single global window.

    Scale design: the only global coordination is the exclusive prefix
    sum over doc lengths — the same two-phase bucket machinery as
    assign_shards (no single-partition window); the per-doc sequence
    fan-out is a codegen explode over ≤ len/seq_len + 1 elements."""
    d = docs.select(
        "doc_id", (F.size(word_array()) + F.lit(1)).alias("_len")
    )
    started = _with_global_start(d, "_len", bucket_width)
    first = F.floor(F.col("_start") / seq_len).cast("long")
    last = F.floor(
        (F.col("_start") + F.col("_len") - 1) / seq_len
    ).cast("long")
    ex = started.select(
        "doc_id", "_start", "_len",
        F.explode(F.sequence(first, last)).alias("seq_id"),
    )
    seq_lo = F.col("seq_id") * seq_len
    begin = F.greatest(F.col("_start"), seq_lo)
    end = F.least(F.col("_start") + F.col("_len"), seq_lo + seq_len)
    return ex.select(
        "seq_id", "doc_id",
        (begin - seq_lo).cast("int").alias("offset_in_seq"),
        (end - begin).cast("int").alias("n_tokens_in_seq"),
    )


def curriculum_stages(
    docs: DataFrame, n_stages: int = 3, length_col: str = "n_chars"
) -> DataFrame:
    """Curriculum staging for training-order construction: documents
    bucketed into ``n_stages`` difficulty stages by exact length
    quantile boundaries (easy-to-hard curriculum à la Bengio et al.
    2009, with doc length as the standard difficulty proxy), plus a
    deterministic md5 shuffle_key — the write-time twin is
    repartitionByRange(stage, shuffle_key) so each stage's shards
    are internally shuffled but stage order is preserved.

    Boundaries are VALUES (the k-th and 2k-th smallest lengths),
    computed via orderBy().limit(k) + max — TakeOrderedAndProject,
    distributed, no global rank window; the doc count is a single
    driver scalar (bounded-driver policy). Ties at a boundary share
    the lower stage (value-deterministic; exact tercile balance is
    deliberately sacrificed — a tie must not be split by engine-
    dependent row order)."""
    n = docs.count()
    if n == 0:
        # same columns as the non-empty branch so downstream
        # union/schema comparison holds on an empty corpus
        return docs.select(
            "doc_id",
            F.col(length_col).cast("bigint").alias(length_col),
            F.lit(0).cast("bigint").alias("stage"),
            F.lit("").alias("shuffle_key"))
    bounds = []
    for s in range(1, n_stages):
        k = (n * s + n_stages - 1) // n_stages
        b = (
            docs.select(length_col).orderBy(F.asc(length_col))
            .limit(k)
            .agg(F.max(length_col))
            .collect()[0][0]
        )
        bounds.append(b)
    stage = None
    for i, b in enumerate(bounds):
        cond = F.col(length_col) <= F.lit(b)
        stage = F.when(cond, i) if stage is None else stage.when(cond, i)
    stage = stage.otherwise(n_stages - 1)
    return docs.select(
        "doc_id",
        F.col(length_col).cast("bigint").alias(length_col),
        stage.cast("bigint").alias("stage"),
        F.md5(F.concat(F.lit("cur:"),
                       F.col("doc_id").cast("string")))
        .alias("shuffle_key"),
    )
