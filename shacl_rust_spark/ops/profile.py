"""Table profiling — the data-quality / expectations surface (à la
Deequ/Great Expectations) a pipeline runs before training on a new
table drop: per-column row count, null count, exact distinct count,
and min/max.

Scale design: ONE aggregate pass over the table computes every
column's statistics (Catalyst fuses them into a single
HashAggregate over the scan — the table is read once, never once per
column); the per-column output rows are then exploded from that one
driver-sized aggregate row. Exact count(DISTINCT) is used here
because the oracle must hash-match; at 100 TB you swap in
approx_count_distinct (HLL) per column — one line, same plan shape
(noted, not silently substituted: exactness is the contract of this
op's gate).

Output typing: numeric columns report min/max as DOUBLE
(min_num/max_num), everything else as engine-cast strings
(min_str/max_str). The two families are separate columns rather than
one stringly column because Spark renders large doubles in scientific
notation ("1.0E7") while other engines do not — a string-typed
numeric min/max would desynchronize oracles. The inactive family
carries SENTINELS (0.0 / ''), never NULL, with `is_numeric`
disambiguating: pandas surfaces SQL NULL doubles as NaN, which no
row-value comparator treats as NULL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_NUMERIC = (T.ByteType, T.ShortType, T.IntegerType, T.LongType,
            T.FloatType, T.DoubleType, T.DecimalType)


def profile_table(df: DataFrame, columns: tuple = ()) -> DataFrame:
    """(col_name, n, n_null, n_distinct, min_num, max_num, min_str,
    max_str) — one row per profiled column, one scan total."""
    cols = list(columns) or [f.name for f in df.schema.fields]
    aggs = [F.count(F.lit(1)).alias("_n")]
    numeric = {}
    for c in cols:
        numeric[c] = isinstance(df.schema[c].dataType, _NUMERIC)
        aggs.append(F.count(c).alias(f"_nn_{c}"))
        aggs.append(F.count_distinct(c).alias(f"_nd_{c}"))
        if numeric[c]:
            aggs.append(F.min(c).cast("double").alias(f"_mn_{c}"))
            aggs.append(F.max(c).cast("double").alias(f"_mx_{c}"))
        else:
            aggs.append(F.min(c).cast("string").alias(f"_mn_{c}"))
            aggs.append(F.max(c).cast("string").alias(f"_mx_{c}"))
    row = df.agg(*aggs)
    zero_d = F.lit(0.0)
    empty_s = F.lit("")
    structs = [
        F.struct(
            F.lit(c).alias("col_name"),
            F.lit(1 if numeric[c] else 0).alias("is_numeric"),
            F.col("_n").alias("n"),
            (F.col("_n") - F.col(f"_nn_{c}")).alias("n_null"),
            F.col(f"_nd_{c}").alias("n_distinct"),
            # all-NULL columns still yield NULL min/max: coalesce to
            # the sentinel there too (n_null == n flags that case)
            F.coalesce(
                F.col(f"_mn_{c}") if numeric[c] else zero_d, zero_d
            ).alias("min_num"),
            F.coalesce(
                F.col(f"_mx_{c}") if numeric[c] else zero_d, zero_d
            ).alias("max_num"),
            F.coalesce(
                empty_s if numeric[c] else F.col(f"_mn_{c}"), empty_s
            ).alias("min_str"),
            F.coalesce(
                empty_s if numeric[c] else F.col(f"_mx_{c}"), empty_s
            ).alias("max_str"),
        )
        for c in cols
    ]
    return row.select(
        F.explode(F.array(*structs)).alias("_s")
    ).select("_s.*")


def profile_table_approx(
    df: DataFrame, columns: tuple = (), rsd: float = 0.05
) -> DataFrame:
    """(col_name, n, n_null, n_distinct_approx) — the 100 TB swap-in
    for :func:`profile_table`'s exact count(DISTINCT): one scan, one
    fused HashAggregate, with every per-column cardinality served by
    ``approx_count_distinct`` (HyperLogLog++, target relative standard
    deviation ``rsd``). The exact variant keeps the oracle-hash
    contract for the expectations gate; THIS is the plan you run on a
    corpus where 11 exact count-distincts would each carry a full
    dedup shuffle — HLL sketches fold map-side into fixed-size
    buffers, so the scan stays one pass and the shuffle is one
    sketch row per column regardless of table size. Min/max/null
    counts are already single-pass in the exact variant and are not
    duplicated here; the approx frame is meant to be joined back to
    it (or consumed alone for cardinality monitoring)."""
    cols = list(columns) or [f.name for f in df.schema.fields]
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in cols:
        aggs.append(F.count(c).alias(f"_nn_{c}"))
        aggs.append(
            F.approx_count_distinct(c, rsd).alias(f"_nd_{c}")
        )
    row = df.agg(*aggs)
    structs = [
        F.struct(
            F.lit(c).alias("col_name"),
            F.col("_n").alias("n"),
            (F.col("_n") - F.col(f"_nn_{c}")).alias("n_null"),
            F.col(f"_nd_{c}").alias("n_distinct_approx"),
        )
        for c in cols
    ]
    return row.select(
        F.explode(F.array(*structs)).alias("_s")
    ).select("_s.*")
