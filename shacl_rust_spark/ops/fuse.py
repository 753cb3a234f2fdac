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
