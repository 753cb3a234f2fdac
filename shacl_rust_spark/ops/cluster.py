"""K-means clustering over embedding columns (distributed Lloyd's).

The clustering primitive behind semantic dedup (SemDeDup, Abbas et al.
2023 — cluster, then prune near-dups within clusters), topic bucketing,
and IVF index training (ops/ann.py's coarse quantizer is exactly a
trained centroid set). Spark MLlib has KMeans, but its init and float
reduction order are not reproducible across engines; curation pipelines
need the assignment to be a pure function of the input, so this is the
deterministic re-expression:

- init: the k vectors with the smallest ids (deterministic, no RNG);
- assign: nearest centroid by squared L2, ties to the lowest cluster
  id — a pure Column expression over the array (k·d fused
  multiply-adds inside whole-stage codegen, no UDF);
- update: per-dimension mean via posexplode → groupBy (cluster, dim)
  with map-side partial aggregation — the shuffle carries k·d cells,
  not the corpus — then ROUNDED to 6 decimals so the centroid is
  identical regardless of float summation order (Spark partial-agg
  order, DuckDB's list_sum, and any 1000-executor reduction tree agree
  once rounded; assignment flips would need two centroids equidistant
  to ~1e-9, which rounding does not manufacture).

Per iteration: one corpus scan + one k·d-cell aggregate collected to
the driver (bounded driver-side state, same policy as the closure
caps). Iterations are a fixed small count — the classic Lloyd's
trade: each pass is embarrassingly parallel, convergence is fast on
separated data, and a fixed budget keeps the job's stage graph static.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _sq_dist(vec_col: F.Column, centroid: list[float]) -> F.Column:
    """Σ_d (x_d − c_d)² as one fused expression over the array column."""
    return F.aggregate(
        F.zip_with(
            vec_col,
            F.array(*[F.lit(c) for c in centroid]),
            lambda x, c: (x - c) * (x - c),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _assign(emb: DataFrame, centroids: list[list[float]],
            vec_col: str) -> DataFrame:
    """Add `cluster` = argmin over centroids (ties → lowest id)."""
    dists = [_sq_dist(F.col(vec_col), c) for c in centroids]
    best = F.lit(0)
    best_d = dists[0]
    for j in range(1, len(dists)):
        improves = dists[j] < best_d
        best = F.when(improves, F.lit(j)).otherwise(best)
        best_d = F.when(improves, dists[j]).otherwise(best_d)
    return emb.withColumn("cluster", best).withColumn("_dist", best_d)


def train_centroids(
    e: DataFrame, k: int, iters: int, id_col: str = "vec_id",
) -> list[list[float]]:
    """The Lloyd's loop behind kmeans, exposed so quantizer trainings
    (IVF coarse codebooks, PQ sub-codebooks) can reuse it: `e` carries
    (id_col, _v double array); returns the final rounded centroid list
    (k×d — bounded driver-side state by construction, same policy as
    the closure caps). Empty clusters keep their previous centroid."""
    init_rows = e.orderBy(id_col).limit(k).collect()
    centroids = [list(r["_v"]) for r in init_rows]

    for _ in range(iters):
        assigned = _assign(e, centroids, "_v")
        cells = (
            assigned.select("cluster", F.posexplode("_v").alias("d", "x"))
            .groupBy("cluster", "d")
            .agg(F.round(F.avg("x"), 6).alias("c"))
            .collect()
        )
        by_cluster: dict[int, dict[int, float]] = {}
        for r in cells:
            by_cluster.setdefault(r["cluster"], {})[r["d"]] = r["c"]
        dims = len(centroids[0])
        centroids = [
            [by_cluster[j][d] for d in range(dims)]
            if j in by_cluster else centroids[j]  # empty cluster: keep
            for j in range(k)
        ]
    return centroids


def kmeans(
    emb: DataFrame,
    k: int = 4,
    iters: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(id, cluster, dist): deterministic k-means assignment after
    `iters` Lloyd's updates from the k-smallest-id init. `dist` is the
    squared L2 to the final (rounded) centroid."""
    e = emb.select(
        F.col(id_col),
        F.transform(F.col(vec_col), lambda x: x.cast("double"))
        .alias("_v"),
    )
    e = e.localCheckpoint(eager=False)  # reused every iteration
    centroids = train_centroids(e, k, iters, id_col)
    return _assign(e, centroids, "_v").select(
        F.col(id_col), "cluster", F.col("_dist").alias("dist")
    )


def semantic_dedup(
    emb: DataFrame,
    threshold: float,
    k: int = 4,
    iters: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): k-means the embeddings, then drop
    every vector whose cosine to a LOWER-id vector in the same cluster
    is ≥ threshold. Returns the dropped rows as (id, cluster, dup_of)
    with dup_of = the smallest dominating id — the mapping a dedup pass
    applies with one anti-join.

    This is the scale design from the paper: the quadratic pair search
    runs per cluster, and k grows with the corpus so cluster size (and
    the per-cluster join) stays bounded — the clustering is what makes
    embedding dedup tractable where the global all-pairs join is not.
    The threshold compares round(cos, 6) so the cut is reduction-order
    independent (same device as dedup_embedding)."""
    from . import ann

    assigned = kmeans(emb, k, iters, vec_col, id_col) \
        .select(id_col, "cluster")
    # Candidate pairs form on the NARROW id frame, then spread across
    # the cluster before the embeddings join back: the pair join keys
    # on `cluster`, whose cardinality is k — hash-partitioning the
    # O(d)-per-row cosine stage on a k-value key would run it on ≤ k
    # tasks no matter how many executors exist (and cluster-size skew
    # would pile the biggest cluster's quadratic pair set on one).
    # The explicit exchange is the production plan, same pattern as
    # edit_distance_pairs' pre-rescore repartition.
    a_ids = assigned.select(F.col(id_col).alias("a"), "cluster")
    b_ids = assigned.select(F.col(id_col).alias("b"), "cluster")
    cand = (
        a_ids.join(b_ids, "cluster")
        .where(F.col("a") < F.col("b"))
        .repartition(
            max(emb.sparkSession.sparkContext.defaultParallelism, 8)
        )
    )
    ea = emb.select(F.col(id_col).alias("a"), F.col(vec_col).alias("_ea"))
    eb = emb.select(F.col(id_col).alias("b"), F.col(vec_col).alias("_eb"))
    pairs = ann.with_cosine(
        cand.join(ea, "a").join(eb, "b"),
        "_ea", "_eb", "_cos",
    ).where(F.round("_cos", 6) >= threshold)
    return (
        pairs.groupBy("b", "cluster")
        .agg(F.min("a").alias("dup_of"))
        .select(F.col("b").alias(id_col), "cluster", "dup_of")
    )
