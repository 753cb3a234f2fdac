"""Similarity search over the embeddings table (array<float> column).

- cosine_topk: brute-force baseline — query×corpus cross join, cosine
  via F.aggregate/F.zip_with (JVM-side, sequential fold → deterministic
  double arithmetic), window top-k. At scale the query side is small
  and broadcast; the corpus scan is embarrassingly parallel.
- ivf_topk: scale path — per-label mean centroids (an IVF coarse
  quantizer with labels as the train assignment), probe the nearest
  centroid's cluster only. Corpus scan drops to ~1/n_labels.

Ranking stability: cosines are rounded to 6 decimals before ordering
(ties → smaller vec_id) so rank order is reproducible bit-for-bit in
any engine computing in double precision.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: F.Column, b: F.Column) -> F.Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: F.Column) -> F.Column:
    return F.sqrt(F.aggregate(
        F.transform(a, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    ))


def with_cosine(df: DataFrame, a: str, b: str, out: str) -> DataFrame:
    # one lambda-bearing expression per projection (PySpark 4.1 lambda
    # collision — see pipeline/link.py)
    df = df.withColumn("_dot", _dot(F.col(a), F.col(b)))
    df = df.withColumn("_na", _norm(F.col(a)))
    df = df.withColumn("_nb", _norm(F.col(b)))
    # zero-norm vectors have no direction: cosine is NULL (ANSI mode
    # would otherwise hard-fail the whole job on a single zero vector)
    return df.withColumn(
        out,
        F.when((F.col("_na") > 0) & (F.col("_nb") > 0),
               F.col("_dot") / (F.col("_na") * F.col("_nb"))),
    ).drop("_dot", "_na", "_nb")


def cosine_topk(
    embeddings: DataFrame, queries: DataFrame, k: int = 5
) -> DataFrame:
    """queries (query_id, qvec) × embeddings (vec_id, embedding) →
    (query_id, rank, neighbor_id) top-k by cosine, self excluded."""
    joined = F.broadcast(queries).crossJoin(
        embeddings.select("vec_id", "embedding")
    ).where(F.col("query_id") != F.col("vec_id"))
    scored = with_cosine(joined, "qvec", "embedding", "_cos").withColumn(
        "_r", F.round("_cos", 6)
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("_r").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", F.col("vec_id").alias("neighbor_id"))
    )


def label_centroids(embeddings: DataFrame) -> DataFrame:
    """(label, centroid array<double>): positional mean per label —
    explode with position, avg per (label, pos), re-assemble. No
    lambda-combination pitfalls, scales to any dimension."""
    ex = embeddings.select(
        "label", F.posexplode("embedding").alias("_pos", "_v")
    )
    avg = ex.groupBy("label", "_pos").agg(
        F.avg(F.col("_v").cast("double")).alias("_a")
    )
    return (
        avg.groupBy("label")
        .agg(F.array_sort(
            F.collect_list(F.struct("_pos", "_a"))
        ).alias("_pairs"))
        .select(
            "label",
            F.transform("_pairs", lambda p: p.getField("_a")).alias("centroid"),
        )
    )


def ivf_topk(embeddings: DataFrame, queries: DataFrame, k: int = 5) -> DataFrame:
    """IVF: route each query to its nearest label-centroid, then
    brute-force only within that cluster."""
    cents = F.broadcast(label_centroids(embeddings))
    qc = F.broadcast(queries).crossJoin(cents)
    qc = with_cosine(qc, "qvec", "centroid", "_cc").withColumn(
        "_rc", F.round("_cc", 6)
    )
    wq = Window.partitionBy("query_id").orderBy(
        F.col("_rc").desc(), F.col("label").asc()
    )
    routed = (
        qc.withColumn("_rn", F.row_number().over(wq))
        .where(F.col("_rn") == 1)
        .select("query_id", "qvec", F.col("label").alias("_probe"))
    )
    joined = F.broadcast(routed).join(
        embeddings.select("vec_id", "embedding", "label"),
        F.col("label") == F.col("_probe"),
    ).where(F.col("query_id") != F.col("vec_id"))
    scored = with_cosine(joined, "qvec", "embedding", "_cos").withColumn(
        "_r", F.round("_cos", 6)
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("_r").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", F.col("vec_id").alias("neighbor_id"))
    )


def pq_topk(
    embeddings: DataFrame,
    k: int = 5,
    m: int = 4,
    n_codes: int = 4,
    iters: int = 2,
    dims: int = 64,
    query_max_id: int = 10,
) -> DataFrame:
    """Product-quantization top-k (Jégou et al. 2011, derandomized):
    split each vector into `m` contiguous subspaces, train an
    `n_codes`-entry codebook per subspace with the deterministic
    Lloyd's device (cluster.train_centroids — smallest-id init,
    round-6 centroid updates, so both codebooks and codes are
    engine-exact), encode every vector as its m nearest-centroid
    codes, and answer queries by ADC (asymmetric distance
    computation): dist(q, x) ≈ Σ_s d(q_s, codebook_s[code_s(x)]).
    Returns (qid, rank, nid) — integer-only output; the approximate
    distance itself stays internal (per-row fixed-order double fold,
    deterministic, but not worth exporting).

    This completes the ANN family's SCALE story next to IVF: the
    index the query side scans is m SMALL INTEGER CODES per vector
    (m·log2(n_codes) bits — here 8 bits/vec vs 64 doubles/vec, a
    64× memory compression), so a 100 TB embedding corpus becomes a
    codes table that fits hot storage; the query→centroid distance
    table (m·n_codes doubles per query) is a Column expression over
    the broadcast query side, never a shuffle. Codebook training
    scans the corpus iters·m times map-side with k·d-cell aggregates
    (bounded driver state); production would sample the training set
    — stated, not needed at gate scale."""
    from pyspark.sql import Window

    from . import cluster

    sub = dims // m
    if sub * m != dims:
        raise ValueError("m must divide dims")
    e = embeddings.select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double"))
        .alias("_full"),
    ).localCheckpoint(eager=True)

    codebooks: list[list[list[float]]] = []
    codes = None
    for s in range(m):
        es = e.select(
            "vec_id", F.slice("_full", s * sub + 1, sub).alias("_v"))
        cents = cluster.train_centroids(es, n_codes, iters)
        codebooks.append(cents)
        asg = cluster._assign(es, cents, "_v").select(
            "vec_id", F.col("cluster").alias(f"code{s}"))
        codes = asg if codes is None else codes.join(asg, "vec_id")

    q = e.where(F.col("vec_id") < query_max_id).select(
        F.col("vec_id").alias("qid"), F.col("_full").alias("_q"))
    adc = None
    for s in range(m):
        qsub = F.slice("_q", s * sub + 1, sub)
        darr = F.array(*[cluster._sq_dist(qsub, c)
                         for c in codebooks[s]])
        term = F.element_at(darr, F.col(f"code{s}") + 1)
        adc = term if adc is None else adc + term

    w = Window.partitionBy("qid").orderBy("_adc", "vec_id")
    return (
        q.crossJoin(codes)
        .where(F.col("vec_id") != F.col("qid"))
        .withColumn("_adc", adc)
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("qid", F.col("rank").cast("bigint").alias("rank"),
                F.col("vec_id").alias("nid"))
    )


def topk_recall(exact: DataFrame, approx: DataFrame) -> DataFrame:
    """ANN quality evaluation: per query the exact-top-k hit count of
    an approximate index — (query_id, n_exact, n_hit), recall@k =
    n_hit/n_exact as consumer arithmetic. The ANN twin of
    dedup_eval_recall: every approximate path in this module (IVF,
    PQ, LSH banding) states recall as its sacrifice, and this is the
    measurement that prices it. Inputs are two (query_id, rank,
    neighbor_id) frames; one (query_id, neighbor_id) equi-join +
    one per-query aggregate."""
    ap = approx.select("query_id", "neighbor_id",
                       F.lit(1).alias("_hit"))
    return (
        exact.select("query_id", "neighbor_id")
        .join(ap, ["query_id", "neighbor_id"], "left")
        .groupBy("query_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_exact"),
            F.sum(F.when(F.col("_hit").isNotNull(), 1).otherwise(0))
            .cast("bigint").alias("n_hit"),
        )
    )
