"""Deterministic synthetic Common-Crawl-style pages table.

BASELINE.json input_hint mandates the input shape
(url string, warc_ts timestamp, html binary, text string, lang string);
no external data is allowed, so pages are synthesized with pure Column
expressions from the driver's star-schema tables — every derivation is
a closed-form key-modulo formula that the DuckDB oracle can reproduce.

Two page families:
- ORDER pages (one per `orders` row): carry extractable sentences —
  entity mentions with a planted Zipf head (≥50% of mentions hit one
  nation → exercises salted aggregation), typo'd surfaces (fuzzy
  linking), unlinkable surfaces (SHACL-dropped), and alias sentences
  (sameAs edges → connected components).
- DOC pages (one per `documents` row): free text, no extractable
  sentences — exercises the no-mention path and the text-analysis ops.

Sentence grammar (the extractor's contract, see extract.py):
  "Order <o> was placed by <SUBJ>."
  "<SUBJ> lives in <NATION_SURFACE>."
  "<ALIAS> is also known as <SUBJ>."          (o % 5 == 0)
  "<ALIAS2> is also known as <ALIAS>."        (o % 25 == 0)
where SUBJ      = "Client-<k>" if o % 5 == 0 else "Customer#<k>"
      ALIAS     = "Client-<k>",  ALIAS2 = "Client2-<k>"
      NATION_SURFACE =
        "XYZZY_<o%3>"        if o % 11 == 0   (unlinkable)
        n_name || "X"        elif o % 7 == 0  (typo → fuzzy link)
        n_name               otherwise
      mentioned nation key = 1 if o % 2 == 0 else o % 25  (Zipf head)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

HTML_PRE = "<html><head><title>"
HTML_MID = "</title></head><body><p>"
HTML_POST = "</p></body></html>"


def _order_text() -> F.Column:
    o = F.col("o_orderkey")
    k = F.col("o_custkey")
    cust = F.concat(F.lit("Customer#"), k.cast("string"))
    alias = F.concat(F.lit("Client-"), k.cast("string"))
    alias2 = F.concat(F.lit("Client2-"), k.cast("string"))
    subj = F.when(o % 5 == 0, alias).otherwise(cust)

    nation_key = F.when(o % 2 == 0, F.lit(1)).otherwise(o % 25)
    base_name = F.concat(F.lit("NATION_"), nation_key.cast("string"))
    surface = (
        F.when(o % 11 == 0, F.concat(F.lit("XYZZY_"), (o % 3).cast("string")))
        .when(o % 7 == 0, F.concat(base_name, F.lit("X")))
        .otherwise(base_name)
    )

    total = F.floor(F.col("o_totalprice")).cast("long").cast("string")
    sent1 = F.concat(
        F.lit("Order "), o.cast("string"), F.lit(" was placed by "), subj, F.lit(". ")
    )
    sent2 = F.concat(subj, F.lit(" lives in "), surface, F.lit(". "))
    sent3 = F.concat(F.lit("Total value "), total, F.lit(" USD."))
    alias_sent = F.when(
        o % 25 == 0,
        F.concat(
            F.lit(" "), alias, F.lit(" is also known as "), cust, F.lit("."),
            F.lit(" "), alias2, F.lit(" is also known as "), alias, F.lit("."),
        ),
    ).when(
        o % 5 == 0,
        F.concat(F.lit(" "), alias, F.lit(" is also known as "), cust, F.lit(".")),
    ).otherwise(F.lit(""))
    return F.concat(sent1, sent2, sent3, alias_sent)


def _wrap_html(title: F.Column, text: F.Column) -> F.Column:
    return F.encode(
        F.concat(F.lit(HTML_PRE), title, F.lit(HTML_MID), text, F.lit(HTML_POST)),
        "UTF-8",
    )


def _replicated_orders(spark: SparkSession, sf_dir: str, replicas: int) -> DataFrame:
    """Orders replicated `replicas`× with disjoint shifted key spaces —
    each replica is a distinct entity population, so every pipeline
    stage's work scales linearly (the scaling-evidence input; see
    scripts/scaling.py). replicas=1 is the plain table.

    One scan + explode(sequence) instead of an N-way self-union: the
    base rows are repartitioned FIRST (a ~6 MB exchange of narrow
    columns), then the replica fan-out runs JVM-side inside whole-stage
    codegen in parallel across the cluster; the driver plan stays O(1)
    in `replicas`."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").repartition(
        _page_parts(spark), "o_orderkey"
    )
    if replicas <= 1:
        return o
    return (
        o.withColumn(
            "_r",
            F.explode(
                F.sequence(F.lit(0).cast("long"),
                           F.lit(replicas - 1).cast("long"))
            ),
        )
        .select(
            (F.col("o_orderkey") + F.col("_r") * F.lit(1_000_000_000)
             ).alias("o_orderkey"),
            (F.col("o_custkey") + F.col("_r") * F.lit(10_000_000)
             ).alias("o_custkey"),
            "o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority",
        )
    )


def _page_parts(spark: SparkSession) -> int:
    import os as _os
    return (int(_os.environ.get("KG_PAGE_PARTS", "0"))
            or spark.sparkContext.defaultParallelism * 2)


def order_pages(spark: SparkSession, sf_dir: str, replicas: int = 1) -> DataFrame:
    # The narrow key columns (~40 B/row) are repartitioned inside
    # _replicated_orders BEFORE the page body is synthesized: the
    # exchange that fans the single-file scan out to cluster-wide
    # parallelism moves 15× fewer bytes than shuffling finished
    # (html, text) pages would. At real scale the crawl input is
    # already thousands of splits and this exchange disappears entirely.
    o = _replicated_orders(spark, sf_dir, replicas)
    title = F.concat(F.lit("Order "), F.col("o_orderkey").cast("string"))
    text = _order_text()
    return o.select(
        F.concat(
            F.lit("http://ex"), (F.col("o_custkey") % 100).cast("string"),
            F.lit(".test/o"), F.col("o_orderkey").cast("string"),
        ).alias("url"),
        F.col("o_orderdate").alias("warc_ts"),
        _wrap_html(title, text).alias("html"),
        text.alias("text"),
        F.lit("en").alias("lang"),
    )


def doc_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    title = F.concat(F.lit("Doc "), F.col("doc_id").cast("string"))
    return d.select(
        F.concat(
            F.lit("http://docs.test/d"), F.col("doc_id").cast("string")
        ).alias("url"),
        (F.lit("2024-01-01 00:00:00").cast("timestamp")
         + F.make_interval(secs=F.col("doc_id").cast("double"))).alias("warc_ts"),
        _wrap_html(title, F.col("text")).alias("html"),
        F.col("text").alias("text"),
        F.col("lang").alias("lang"),
    )


def pages(spark: SparkSession, sf_dir: str, replicas: int = 1) -> DataFrame:
    """The full pages table.

    The source parquet is a single small file (one row group → one scan
    split), which would cap the CPU-bound extraction stage at a handful
    of tasks regardless of cluster size; order_pages repartitions its
    narrow key columns to 2× total cores before synthesizing the page
    body, so task parallelism scales with the cluster while the exchange
    stays cheap. doc pages are a tiny fraction (documents table) and
    keep their scan partitioning."""
    return order_pages(spark, sf_dir, replicas).unionByName(
        doc_pages(spark, sf_dir)
    )


def entity_dict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(surface, entity_id, entity_class) linking dictionary from the
    nation table — tiny, always broadcast."""
    n = spark.read.parquet(f"{sf_dir}/nation.parquet")
    return n.select(
        F.col("n_name").alias("surface"),
        F.concat(F.lit("http://example.org/nation/"),
                 F.col("n_nationkey").cast("string")).alias("entity_id"),
        F.lit("http://example.org/Nation").alias("entity_class"),
    )
