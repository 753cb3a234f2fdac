"""Stage 4: linked mentions → candidate RDF triples (string form) and
sameAs edge extraction for canonicalization.

Surface → IRI contract (the inverse of pages.py's sentence grammar):
  Customer#<k> → ex:cust/<k>     Client-<k> → ex:alt/<k>
  Client2-<k>  → ex:alt2/<k>     Order-<o>  → ex:order/<o>
Unlinked lives_in objects stay as plain-literal surfaces — the SHACL
layer rejects them (nodeKind/class) and emission drops them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

EX = "http://example.org/"
P_LOCATED_IN = EX + "locatedIn"
P_PLACED_BY = EX + "placedBy"
P_SAME_AS = EX + "sameAs"


def surface_to_iri(col: F.Column) -> F.Column:
    num = F.regexp_extract(col, r"(\d+)$", 1)
    return (
        F.when(col.startswith("Customer#"), F.concat(F.lit(EX + "cust/"), num))
        .when(col.startswith("Client2-"), F.concat(F.lit(EX + "alt2/"), num))
        .when(col.startswith("Client-"), F.concat(F.lit(EX + "alt/"), num))
        .when(col.startswith("Order-"), F.concat(F.lit(EX + "order/"), num))
    )


def assemble_triples(linked: DataFrame) -> DataFrame:
    """linked mentions → (url, s, p, o, o_is_iri) candidate triples."""
    subj = surface_to_iri(F.col("subj_surface"))

    lives = linked.where(F.col("kind") == "lives_in").select(
        "url",
        subj.alias("s"),
        F.lit(P_LOCATED_IN).alias("p"),
        F.coalesce(F.col("entity_id"), F.col("obj_surface")).alias("o"),
        F.col("entity_id").isNotNull().alias("o_is_iri"),
    )
    placed = linked.where(F.col("kind") == "placed_by").select(
        "url",
        subj.alias("s"),
        F.lit(P_PLACED_BY).alias("p"),
        surface_to_iri(F.col("obj_surface")).alias("o"),
        F.lit(True).alias("o_is_iri"),
    )
    same = linked.where(F.col("kind") == "same_as").select(
        "url",
        subj.alias("s"),
        F.lit(P_SAME_AS).alias("p"),
        surface_to_iri(F.col("obj_surface")).alias("o"),
        F.lit(True).alias("o_is_iri"),
    )
    return lives.unionByName(placed).unionByName(same)


def sameas_edges(triples: DataFrame) -> DataFrame:
    return (
        triples.where(F.col("p") == P_SAME_AS)
        .select(F.col("s").alias("src"), F.col("o").alias("dst"))
        .dropDuplicates(["src", "dst"])
    )


def asof_resolve(cand: DataFrame) -> DataFrame:
    """Recency-based truth resolution over timestamped candidate
    triples (s, p, o, asof_day): per (s, p) keep the object asserted
    by the LATEST page (ties broken by smallest o — deterministic),
    with the conflict profile riding along: (s, p, o, asof_day,
    n_values = distinct objects ever asserted, n_assertions =
    distinct (o, day) assertions). The functional-property as-of rule
    a crawl-driven KG needs for single-valued predicates whose value
    changes over time (a customer moves nation between crawls) —
    complementary to kg_truth_discovery's source-voting rule: voting
    weighs WHO said it, as-of weighs WHEN.

    Plan: one dropDuplicates + one window + one aggregate, all
    partitioned on (s, p) — three narrow-key shuffles of candidate-
    cardinality data; the window partitions by the same key the
    aggregate groups on, so AQE coalesces them onto one exchange."""
    from pyspark.sql import Window

    d = cand.select("s", "p", "o", "asof_day").dropDuplicates(
        ["s", "p", "o", "asof_day"]
    )
    w = Window.partitionBy("s", "p").orderBy(
        F.desc("asof_day"), F.asc("o")
    )
    latest = (
        d.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("s", "p", "o", "asof_day")
    )
    stats = d.groupBy("s", "p").agg(
        F.count_distinct("o").alias("n_values"),
        F.count(F.lit(1)).alias("n_assertions"),
    )
    return latest.join(stats, ["s", "p"])
