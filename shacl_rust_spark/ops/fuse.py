"""Conflicting-claim resolution (truth discovery) for KG construction.

When the same (subject, predicate) is asserted with different objects
by different sources — the normal state of a 10^12-page crawl — the
emit stage must pick one value per functional predicate. This is
majority vote with a deterministic tie-break, the baseline every truth
discovery paper (TruthFinder, Zhao et al.) compares against, and the
variant production KGs actually ship because it is one aggregation.

Plan shape: dedup (s,p,o,source) so a source spamming the same claim
counts once, count votes per (s,p,o), then one row_number window per
(s,p). Both shuffles key on (at least) (s,p); head-entity skew is the
same one pipeline/link.py salts, and the window's per-key work is
bounded by the candidate-object count, not the claim count, because
votes are pre-aggregated.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def majority_vote(claims: DataFrame) -> DataFrame:
    """claims(s, p, o, source) → one winning (s, p, o) per (s, p) with
    its distinct-source vote count and the number of competing
    candidate objects. Ties break to the lexicographically smallest
    object so two engines agree bit-for-bit."""
    votes = (
        claims.select("s", "p", "o", "source")
        .dropDuplicates(["s", "p", "o", "source"])
        .groupBy("s", "p", "o")
        .agg(F.count(F.lit(1)).alias("votes"))
    )
    w = Window.partitionBy("s", "p")
    rank = Window.partitionBy("s", "p").orderBy(
        F.col("votes").desc(), F.col("o").asc())
    return (
        votes.withColumn("n_candidates", F.count(F.lit(1)).over(w))
        .withColumn("rn", F.row_number().over(rank))
        .where(F.col("rn") == 1)
        .select("s", "p", "o", "votes", "n_candidates")
    )


def disambiguate_by_context(
    mentions: DataFrame,
    candidates: DataFrame,
) -> DataFrame:
    """Context-overlap entity disambiguation — the step after blocking
    when a surface form maps to SEVERAL dictionary entities ("Paris"
    the city vs the person): score every (mention, candidate) pair by
    the number of DISTINCT tokens shared between the mention's context
    and the candidate's description, and keep the argmax with a
    deterministic tie-break (score desc, entity_id asc — two engines
    agree bit-for-bit, and score 0 still links to the first candidate
    rather than dropping the mention; the caller filters on ``score``
    if it wants abstention).

    mentions(mention_id, surface, tokens array<string>) ×
    candidates(surface, entity_id, tokens array<string>) →
    (mention_id, surface, entity_id, score, n_candidates).

    Plan shape: the dense pair frame is mentions ⋈ candidates on
    surface — bounded by the dictionary's ambiguity degree (candidates
    per surface), NOT quadratic in mentions. The overlap count runs
    SPARSE: explode both token arrays to (key, token) posting rows,
    dedup, join on (surface, entity-pair, token) only where tokens
    match, then re-attach to the dense pairs with a left join so
    zero-overlap pairs keep score 0. Mentions whose surface has no
    dictionary entry drop out (they are the linker's "unlinked" lane,
    handled upstream)."""
    m = mentions.select("mention_id", "surface", "tokens")
    c = candidates.select("surface", "entity_id", "tokens")
    m_tok = m.select(
        "mention_id", "surface", F.explode("tokens").alias("tok")
    ).dropDuplicates(["mention_id", "tok"])
    c_tok = c.select(
        "surface", "entity_id", F.explode("tokens").alias("tok")
    ).dropDuplicates(["entity_id", "tok"])
    overlap = (
        m_tok.join(c_tok, ["surface", "tok"])
        .groupBy("mention_id", "entity_id")
        .agg(F.count(F.lit(1)).alias("overlap"))
    )
    pairs = m.drop("tokens").join(c.drop("tokens"), "surface")
    scored = pairs.join(overlap, ["mention_id", "entity_id"], "left") \
        .withColumn("score", F.coalesce("overlap", F.lit(0)).cast("bigint"))
    w = Window.partitionBy("mention_id")
    rank = Window.partitionBy("mention_id").orderBy(
        F.col("score").desc(), F.col("entity_id").asc())
    return (
        scored.withColumn("n_candidates", F.count(F.lit(1)).over(w))
        .withColumn("rn", F.row_number().over(rank))
        .where(F.col("rn") == 1)
        .select("mention_id", "surface", "entity_id", "score",
                "n_candidates")
    )


def fuse_numeric(
    claims: DataFrame,
    group_cols: tuple = ("s", "p"),
    value_col: str = "v",
) -> DataFrame:
    """Numeric truth fusion (the KBT/median rule for conflicting
    NUMERIC claims — majority_vote's sibling for values where exact
    string equality is the wrong consensus notion): per group the
    LOWER MEDIAN of the claimed values plus the conflict envelope
    (n_claims, v_min, v_med, v_max). The median is an order
    statistic, not an average — robust to outlier claims and exactly
    representable in integers, so the fused value is engine-exact
    (an avg would be a float of data-dependent summation order).

    Lower median = the value at row ⌈n/2⌉ of the ascending order —
    deterministic for even n too. Plan: one window (row_number +
    count over the group) and one aggregate, both partitioned on the
    group key; claim rows are NOT deduplicated (three sources
    asserting 7 is stronger evidence than one — multiplicity is the
    vote)."""
    from pyspark.sql import Window

    g = list(group_cols)
    w = Window.partitionBy(*g).orderBy(F.col("_v").asc())
    ranked = claims.select(*g, F.col(value_col).alias("_v")) \
        .withColumn("_rn", F.row_number().over(w))
    med = (
        ranked.join(
            ranked.groupBy(*g).agg(F.count(F.lit(1)).alias("_n")), g
        )
        .where(F.col("_rn") == F.expr("(_n + 1) DIV 2"))
        .select(*g, F.col("_v").alias("v_med"))
    )
    stats = claims.groupBy(*g).agg(
        F.count(F.lit(1)).alias("n_claims"),
        F.min(value_col).alias("v_min"),
        F.max(value_col).alias("v_max"),
    )
    return stats.join(med, g).select(
        *g, "n_claims", "v_min", "v_med", "v_max"
    )
