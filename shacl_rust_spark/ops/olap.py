"""Star-schema OLAP rollups over the TPC-H-shaped tables.

The KG pipeline treats these tables as entity sources; a consumer of
the same lake also runs classic dimensional analytics. The pattern to
demonstrate at 100 TB: the FACT side (lineitem) is scanned once and
shuffled at most once on its join key; every dimension chain
(customer → nation → region) is dimension-cardinality and broadcasts
(AQE picks it under the threshold — no forced hints on
data-proportional relations, per the round-1 lesson).

Money arithmetic is INTEGER: prices and discounts convert to cents /
percent once (`ROUND(x*100)` on the identical input double is the
identical integer on any engine), and revenue accumulates as BIGINT
"centi-cents" — float revenue sums in shuffle-arrival order and
drifts in the last ulps, which would make a cross-engine hash compare
a coin flip (same policy as the fixed-point PageRank).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _cents(col: F.Column) -> F.Column:
    return F.round(col * 100, 0).cast("bigint")


def revenue_by_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(r_name, n_items, revenue_cc): lineitem revenue
    price_cents × (100 − discount_pct) rolled up through the
    order → customer → nation → region dimension chain."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    region = spark.read.parquet(f"{sf_dir}/region.parquet")
    rev = _cents(F.col("l_extendedprice")) * (
        F.lit(100).cast("bigint") - _cents(F.col("l_discount"))
    )
    return (
        li.select(F.col("l_orderkey").alias("o_orderkey"),
                  rev.alias("_rev"))
        .join(orders.select("o_orderkey", "o_custkey"), "o_orderkey")
        .join(cust.select(F.col("c_custkey").alias("o_custkey"),
                          "c_nationkey"), "o_custkey")
        .join(nation.select(F.col("n_nationkey").alias("c_nationkey"),
                            "n_regionkey"), "c_nationkey")
        .join(region.select(F.col("r_regionkey").alias("n_regionkey"),
                            "r_name"), "n_regionkey")
        .groupBy("r_name")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum("_rev").alias("revenue_cc"),
        )
    )
