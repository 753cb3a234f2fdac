"""Deterministic sampling & source mixing for corpus curation.

At 100 TB, sampling must be (a) a pure map over the scan — no shuffle,
no driver state; (b) exactly reproducible across engines and reruns;
(c) independent of partitioning and row order. `rand()`-Bernoulli
fails (b) and (c); TABLESAMPLE fails (c). Hashing a stable business key
passes all three: a row is kept iff the first 8 hex chars of
``md5(salt || key)`` sort lexicographically below the rate's hex
threshold. md5 is bit-identical everywhere (the DuckDB oracle runs the
same expression), equal-length lowercase hex strings compare exactly
like the integers they encode, and changing the salt draws an
independent sample — the standard trick for train/val splits that must
never drift between pipeline runs.

Source mixing (the per-domain / per-language rates every LLM data
recipe specifies) is the same predicate with a per-group threshold
looked up from the mixing table — still one scan, zero shuffles;
`.explain` shows a single Filter over the file scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_HEX_SPAN = 16 ** 8  # 8 hex chars


def rate_threshold(rate: float) -> str:
    """Hex threshold such that P[hash8 < threshold] == rate.

    rate ≥ 1 returns "g": every hex digit sorts below 'g', so all rows
    pass without a 9-character threshold breaking the equal-length
    lexicographic == numeric property. rate ≤ 0 returns "": nothing
    sorts below the empty string."""
    if rate >= 1.0:
        return "g"
    if rate <= 0.0:
        return ""
    return f"{int(rate * _HEX_SPAN):08x}"


def sample_hash(key: Column, salt: str) -> Column:
    """First 8 hex chars of md5(salt || key) — the sampling coordinate
    in [0, 16^8), uniform for any high-entropy key."""
    return F.substring(
        F.md5(F.concat(F.lit(salt), key.cast("string"))), 1, 8
    )


def deterministic_sample(
    df: DataFrame, rate: float, salt: str = "s0", key_col: str = "doc_id"
) -> DataFrame:
    """Keep a `rate` fraction of rows, deterministically by key."""
    return df.where(
        sample_hash(F.col(key_col), salt) < F.lit(rate_threshold(rate))
    )


def mix_sources(
    df: DataFrame,
    rates: dict[str, float],
    default_rate: float = 0.0,
    group_col: str = "lang",
    salt: str = "mix",
    key_col: str = "doc_id",
) -> DataFrame:
    """Per-group downsampling rates (data-mixing recipe): group g keeps
    a rates.get(g, default_rate) fraction of its rows. One scan, one
    Filter; the rates table compiles to a CASE expression (broadcast-
    free — mixing tables are spec-sized, not data-sized)."""
    thr: Column = F.lit(rate_threshold(default_rate))
    for g, r in sorted(rates.items()):
        thr = F.when(F.col(group_col) == g, F.lit(rate_threshold(r))) \
            .otherwise(thr)
    return df.where(sample_hash(F.col(key_col), salt) < thr)


_HEX12_SPAN = 16 ** 12  # 48 bits — exact in a double


def weighted_sample(
    df: DataFrame,
    weight_col: str,
    k: int,
    salt: str = "ws",
    key_col: str = "doc_id",
    n_salts: int = 32,
) -> DataFrame:
    """Exact weighted sampling WITHOUT replacement (Efraimidis &
    Spirakis 2006, A-ES): row i is kept with probability proportional
    to its weight, by taking the k smallest exponential keys
    eᵢ = −ln(uᵢ)/wᵢ with uᵢ a deterministic uniform from the md5 hash
    of (salt, key). "Sample 100k docs biased by quality score" is this
    primitive; the salt draws an independent sample.

    Determinism: uᵢ = (hex12(md5)+1)/(16¹²+1) — a 48-bit integer, so
    the double is exact, and eᵢ is the same IEEE closed form on any
    engine/partitioning (the DuckDB oracle computes the identical
    expression via the '0x'-cast). Ties break on the key. Rows with
    weight ≤ 0 or NULL are never selected (P→0 in the limit; they are
    filtered, documented). Same two-phase sharded top-k as
    stratified_sample, so no single task ever sorts the full corpus.
    """
    from pyspark.sql import Window

    v = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(salt), F.col(key_col).cast("string"))),
            1, 12,
        ),
        16, 10,
    ).cast("bigint")
    u = (v + F.lit(1)).cast("double") / F.lit(float(_HEX12_SPAN + 1))
    e = -F.log(u) / F.col(weight_col).cast("double")
    shard = F.pmod(F.xxhash64(F.col(key_col)), F.lit(n_salts))
    local = Window.partitionBy("_shard").orderBy(
        F.asc("_e"), F.asc(key_col)
    )
    glob = Window.partitionBy().orderBy(F.asc("_e"), F.asc(key_col))
    return (
        df.where(
            F.col(weight_col).isNotNull() & (F.col(weight_col) > 0)
        )
        .withColumn("_e", e)
        .withColumn("_shard", shard)
        .withColumn("_lr", F.row_number().over(local))
        .where(F.col("_lr") <= k)
        .withColumn("sample_rank", F.row_number().over(glob))
        .where(F.col("sample_rank") <= k)
        .drop("_e", "_shard", "_lr")
    )


def stratified_sample(
    df: DataFrame,
    n_per_stratum: int,
    stratum_col: str = "lang",
    salt: str = "strat",
    key_col: str = "doc_id",
    n_salts: int = 32,
) -> DataFrame:
    """EXACT n rows per stratum (vs mix_sources' rate-expected count):
    the n smallest sampling hashes in each stratum, ties broken by key
    — a pure function of (salt, keys), so reruns, repartitions, and
    other engines select the identical rows. This is the "give me
    exactly 10k eval docs per language" primitive.

    A naive row_number() over (partition by stratum) sorts EVERY row of
    a stratum in ONE task — a head language at 100 TB is a straggler or
    an OOM. Instead the standard exact two-phase top-n: a first window
    over (stratum, shard) — shard = key hash mod n_salts, so each task
    sorts ~1/n_salts of the stratum — keeps n candidates per shard,
    then the second window ranks the surviving ≤ n·n_salts rows per
    stratum. Any row in the true global top-n is in its shard's top-n,
    so phase 1 never drops a winner; both windows are now bounded.
    The oracle states the semantics as the single direct window.
    """
    from pyspark.sql import Window

    h = sample_hash(F.col(key_col), salt)
    shard = F.pmod(F.xxhash64(F.col(key_col)), F.lit(n_salts))
    local = Window.partitionBy(stratum_col, "_shard").orderBy(
        F.asc("_h"), F.asc(key_col)
    )
    glob = Window.partitionBy(stratum_col).orderBy(
        F.asc("_h"), F.asc(key_col)
    )
    return (
        df.withColumn("_h", h)
        .withColumn("_shard", shard)
        .withColumn("_lr", F.row_number().over(local))
        .where(F.col("_lr") <= n_per_stratum)
        .withColumn("sample_rank", F.row_number().over(glob))
        .where(F.col("sample_rank") <= n_per_stratum)
        .drop("_h", "_shard", "_lr")
    )


def group_split(
    df: DataFrame,
    group_col: str,
    weights: tuple = (0.8, 0.1, 0.1),
    names: tuple = ("train", "val", "test"),
    salt: str = "split",
) -> DataFrame:
    """Leakage-safe train/val/test assignment: the SPLIT is decided by
    hashing the GROUP key (source/domain/url-host), never the row, so
    every document of a group lands in the same split — near-duplicates
    and templated siblings concentrate within groups, and a row-level
    split would leak them across the train/eval boundary (the classic
    contamination bug this operator exists to prevent). Deterministic
    (md5 coordinate, same expression on any engine), stateless, and a
    pure map — no shuffle, no sampling state to persist.

    weights are cumulative-bucketed on the [0, 16^8) hex coordinate via
    rate_threshold, so the group-level proportions are exact in
    expectation and every engine computing md5 agrees on every row."""
    if len(weights) != len(names):
        raise ValueError("weights and names must align")
    h = sample_hash(F.col(group_col), salt)
    acc = 0.0
    expr = None
    for w, name in zip(weights[:-1], names[:-1]):
        acc += w
        cond = h < F.lit(rate_threshold(acc))
        expr = (F.when(cond, name) if expr is None
                else expr.when(cond, name))
    expr = (expr.otherwise(names[-1]) if expr is not None
            else F.lit(names[-1]))
    return df.withColumn("split", expr)


def select_under_budget(
    scored: DataFrame, budget: int, max_score_buckets: int = 1_000_000
) -> DataFrame:
    """(doc_id, score, n_tokens) → the prefix of the corpus, in
    (score DESC, doc_id ASC) priority order, whose running token total
    stays within `budget` — budget-constrained curation (take the
    best documents until the training-token budget is spent), with
    the inclusive running total emitted as cum_tokens.

    The global ordered prefix sum uses the pack_shards two-phase
    device transposed onto the PRIORITY key: per-score totals
    aggregate first (scores are bounded-domain integers — quality
    classifiers bucket their outputs), the bounded per-score offsets
    resolve driver-side, and each score's documents window only
    within their own score partition ordered by doc_id. No global
    single-partition sort; the only full-width shuffle is the
    score-keyed window, and the final budget cut is a pure filter."""
    from pyspark.sql import Window

    d = scored.select(
        "doc_id",
        F.col("score").cast("long").alias("score"),
        F.col("n_tokens").cast("long").alias("n_tokens"),
    ).where(  # a null priority or weight has no place in the order
        F.col("score").isNotNull() & F.col("n_tokens").isNotNull()
    )
    per_score = (
        d.groupBy("score").agg(F.sum("n_tokens").alias("_sum"))
        .localCheckpoint(eager=True)
    )
    if per_score.count() > max_score_buckets:
        raise ValueError("score domain too wide for driver offsets; "
                         "coarsen the score")
    rows = sorted(per_score.collect(), key=lambda r: -r["score"])
    offsets, acc = [], 0
    for r in rows:
        offsets.append((r["score"], acc))
        acc += r["_sum"]
    off = F.broadcast(
        d.sparkSession.createDataFrame(offsets, ["score", "_off"]))
    w = Window.partitionBy("score").orderBy("doc_id") \
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        d.join(off, "score")
        .withColumn("cum_tokens",
                    (F.col("_off") + F.sum("n_tokens").over(w))
                    .cast("long"))
        .where(F.col("cum_tokens") <= budget)
        .select("doc_id", "score", "n_tokens", "cum_tokens")
    )


def corrupt_tails(
    triples: DataFrame, k: int = 2, salt: str = "neg",
) -> DataFrame:
    """Deterministic corrupt-tail negative sampling for KG-embedding
    training (the TransE/Bordes et al. 2013 recipe, derandomized):
    for each positive triple (s, p, o) draw `k` replacement tails
    from the entity vocabulary by the md5-uniform device — the j-th
    draw lands on entity index
    ``hex12(md5(salt|s|p|o|#j)) mod |E|`` — then FILTER the draws
    that collide with a true fact ((s, p, neg) exists) or with the
    positive tail itself, i.e. "filtered" negatives. Deterministic
    per (triple, j) on any engine / partitioning / rerun, which is
    what makes a training set reproducible and a cross-engine oracle
    possible at all.

    Entity vocabulary = distinct subjects ∪ distinct objects of the
    triple set, densely indexed 0..|E|-1 by lexicographic
    row_number. Returns (s, p, o, j, neg_o).

    Plan shape at 100 TB: the vocabulary index is ONE global sort of
    the (small relative to triples) node set; draws explode k-fold
    map-side; the index join keys on a uniform hash residue (no skew
    by construction — every idx is equally likely), and the
    filtered-negative check is a left_anti join on (s, p, neg)
    against the triple set, shuffle-partitioned the same way the
    triples already are. The vocabulary row_number is a single
    global window: acceptable because |E| ≪ |triples|; if the node
    set itself outgrew a sort, zipWithIndex-style per-partition
    offsets are the swap-in."""
    from pyspark.sql import Window

    nodes = (
        triples.select(F.col("s").alias("node"))
        .unionByName(triples.select(F.col("o").alias("node")))
        .distinct()
    )
    idx = nodes.withColumn(
        "_idx",
        F.row_number().over(Window.orderBy("node")) - 1,
    )
    n = idx.count()  # single scalar — bounded-driver policy
    draws = triples.select(
        "s", "p", "o",
        F.explode(F.array(*[F.lit(j) for j in range(k)])).alias("j"),
    )
    coord = F.conv(
        F.substring(
            F.md5(F.concat_ws("|", F.lit(salt), F.col("s"),
                              F.col("p"), F.col("o"),
                              F.concat(F.lit("#"), F.col("j")))),
            1, 12,
        ), 16, 10,
    ).cast("long")
    drawn = (
        draws.withColumn("_idx", F.pmod(coord, F.lit(n)))
        .join(idx.withColumnRenamed("node", "neg_o"), "_idx")
        .where(F.col("neg_o") != F.col("o"))
    )
    true_pairs = triples.select(
        "s", "p", F.col("o").alias("neg_o")
    ).distinct()
    return (
        drawn.join(true_pairs, ["s", "p", "neg_o"], "left_anti")
        .select("s", "p", "o", F.col("j").cast("long").alias("j"),
                "neg_o")
    )
