"""Cardinality sketching (HyperLogLog) for corpus statistics.

"How many distinct URLs / words / users per slice?" at 100 TB is an
HLL question: exact count-distinct shuffles one row per distinct key,
an HLL register table is a CONSTANT 16^prefix_len rows per group, and
the per-group union is a max() — the sketch mergeable across
partitions, days, and datasets. Spark's built-in
``approx_count_distinct`` is HLL++ but its register hashing is
engine-private — useless when the number must be reproducible across
engines and runs (the same reason ops/sample hashes md5 instead of
``rand()``). This one is DETERMINISTIC end-to-end:

- register index = first ``prefix_len`` hex chars of md5(key) —
  a string bucket, no integer conversion (ops/rank's DSIR device);
- rho = 1 + leading-zero bits of the NEXT 15 hex chars (60 bits),
  via ``61 - length(bin(v))`` — Spark and DuckDB print identical
  binary strings, v=0 pins rho=61;
- the harmonic sum Σ 2^-M_b is computed in EXACT INTEGER arithmetic,
  scaled by 2^50: registers with M_b > 50 contribute 0 (in both
  engines — deterministic truncation of a ≤2^-51 term), empty
  registers contribute 2^50, so the only float op is one final
  division of two exactly-agreed numbers.

The standard small-range correction applies (Flajolet et al. 2007):
when the raw estimate ≤ 2.5·m and empty registers exist, switch to
linear counting, m·ln(m/empty) — itself a closed form over exact
integers, so still engine-deterministic. No large-range correction
(64-bit hash space; collisions irrelevant below ~2^57). With m=4096
registers the standard error is ~1.04/√m ≈ 1.6 %.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_PREFIX_LEN = 3
_M = 16 ** _PREFIX_LEN            # 4096 registers
_SHIFT = 50                       # integer scale 2^50 for Σ 2^-M


def scaled_alpha(m: int = _M, shift: int = _SHIFT) -> float:
    """alpha_m · m² · 2^shift — the numerator of the HLL estimate,
    one double literal shared verbatim with the DuckDB oracle."""
    alpha = 0.7213 / (1 + 1.079 / m)
    return alpha * m * m * float(2 ** shift)


_CMS_DEPTH = 4


def cms_table(df: DataFrame, key: Column, depth: int = _CMS_DEPTH) -> DataFrame:
    """Count-min sketch of ``key`` frequencies: (row, bucket, c) with
    ``depth`` independent md5-salted rows of 16^prefix_len counters —
    a CONSTANT depth·4096-row table whatever the corpus size, built
    with one groupBy (map-side combined) per row, union'd. Mergeable:
    two sketches merge by summing counters. NULL keys ignored."""
    parts = []
    for r in range(depth):
        parts.append(
            df.where(key.isNotNull()).select(
                F.lit(r).alias("row"),
                F.substring(
                    F.md5(F.concat(F.lit(f"cm{r}:"),
                                   key.cast("string"))),
                    1, _PREFIX_LEN,
                ).alias("bucket"),
            )
        )
    allrows = parts[0]
    for p in parts[1:]:
        allrows = allrows.unionByName(p)
    return allrows.groupBy("row", "bucket").agg(
        F.count(F.lit(1)).alias("c")
    )


def cms_estimate(
    sketch_df: DataFrame, candidates: DataFrame, key_col: str,
    depth: int = _CMS_DEPTH,
) -> DataFrame:
    """Point-estimate candidate keys against a cms_table: cms_n =
    min over rows of the key's counter. The count-min guarantee is
    one-sided — cms_n ≥ true count always, with overestimate ≤
    εN w.h.p. — so the sketch can gate 'is this n-gram frequent?'
    at 100 TB without a full groupBy over the corpus; the candidate
    set is the only thing that must be known (sampled or enumerated).
    Everything is integer and md5-derived → engine-exact."""
    keyed = candidates.select(
        F.col(key_col),
        *[
            F.substring(
                F.md5(F.concat(F.lit(f"cm{r}:"),
                               F.col(key_col).cast("string"))),
                1, _PREFIX_LEN,
            ).alias(f"_b{r}")
            for r in range(depth)
        ],
    )
    out = keyed
    for r in range(depth):
        s = sketch_df.where(F.col("row") == r).select(
            F.col("bucket").alias(f"_b{r}"), F.col("c").alias(f"_c{r}")
        )
        # LEFT join: a candidate hashing to an untouched bucket has a
        # zero counter (the sketch stores zeros implicitly)
        out = out.join(F.broadcast(s), f"_b{r}", "left")
    return out.select(
        key_col,
        F.least(*[
            F.coalesce(F.col(f"_c{r}"), F.lit(0).cast("bigint"))
            for r in range(depth)
        ]).alias("cms_n"),
    )


def hll_distinct(
    df: DataFrame, key: Column, group_cols: tuple = ()
) -> DataFrame:
    """Distinct-count estimate of ``key`` per group (one global row if
    ``group_cols`` is empty): (…group_cols, n_registers_used,
    est_distinct). NULL keys are ignored (count-distinct semantics)."""
    gc = list(group_cols)
    h = F.md5(key.cast("string"))
    v = F.conv(
        F.substring(h, _PREFIX_LEN + 1, 15), 16, 10
    ).cast("bigint")
    rows = df.where(key.isNotNull()).select(
        *gc,
        F.substring(h, 1, _PREFIX_LEN).alias("_bucket"),
        F.when(v == 0, F.lit(61))
        .otherwise(F.lit(61) - F.length(F.bin(v)))
        .alias("_rho"),
    )
    regs = rows.groupBy(*gc, "_bucket").agg(F.max("_rho").alias("_m"))
    scaled = F.when(
        F.col("_m") <= _SHIFT,
        F.expr(f"shiftleft(CAST(1 AS BIGINT), {_SHIFT} - _m)"),
    ).otherwise(F.lit(0).cast("bigint"))
    per_group = regs.groupBy(*gc).agg(
        F.count(F.lit(1)).alias("n_registers_used"),
        F.sum(scaled).alias("_s_used"),
    )
    s_total = (
        F.col("_s_used")
        + (F.lit(_M) - F.col("n_registers_used"))
        * F.lit(2 ** _SHIFT).cast("bigint")
    )
    raw = F.lit(scaled_alpha()) / s_total
    empty = F.lit(_M) - F.col("n_registers_used")
    linear = F.lit(float(_M)) * F.log(F.lit(float(_M)) / empty)
    return per_group.select(
        *gc,
        "n_registers_used",
        F.when((raw <= F.lit(2.5 * _M)) & (empty > 0), linear)
        .otherwise(raw)
        .alias("est_distinct"),
    )


def hist_quantiles(
    df: DataFrame,
    value_col: str,
    group_cols: tuple = (),
    quantiles: tuple = (50, 90, 99),
) -> DataFrame:
    """Mergeable power-of-two histogram quantile sketch: values bucket
    into bin = bit_length(v)-1 (v clamped to ≥ 1), per-group bin
    counts, and the q-th percentile estimate is the UPPER BOUND
    2^(bin+1)−1 of the first bin whose cumulative count reaches
    ⌈q%·n⌉. One groupBy of (group, bin) — state is ≤ 64 counters per
    group, counters merge by addition (map-side combined), so unlike
    exact percentile (a full sort) or GK/t-digest (merge-order-
    dependent) this sketch is deterministic under ANY partitioning —
    which is what makes a cross-engine hash-exact oracle possible.
    Estimator variant stated per ADVICE.md policy: upper-bound-of-bin,
    relative error ≤ 2× by construction.

    bin is computed from the BINARY-STRING length (length(bin(v))−1),
    never floor(log2(v)) — libm log2 is not guaranteed exact at
    powers of two, and one ulp flips the bucket."""
    g = [F.col(c) for c in group_cols]
    v = F.greatest(F.col(value_col).cast("bigint"), F.lit(1))
    b = (F.length(F.bin(v)) - 1).alias("bin")
    counts = df.select(*g, b).groupBy(*group_cols, "bin").agg(
        F.count(F.lit(1)).alias("n")
    )
    wcum = (
        Window.partitionBy(*group_cols).orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wtot = Window.partitionBy(*group_cols)
    cum = counts.withColumn("cum", F.sum("n").over(wcum)) \
                .withColumn("total", F.sum("n").over(wtot))
    aggs = [F.sum("n").alias("n")]
    for q in quantiles:
        qbin = F.min(
            F.when(F.col("cum") * 100 >= F.lit(q) * F.col("total"),
                   F.col("bin"))
        )
        aggs.append(qbin.alias(f"p{q}_bin"))
    out = cum.groupBy(*group_cols).agg(*aggs)
    for q in quantiles:
        # SQL shiftleft: the shift amount can be a column there
        # (the PySpark wrapper only takes a Python int)
        out = out.withColumn(
            f"p{q}_est",
            F.expr(f"shiftleft(CAST(1 AS BIGINT), p{q}_bin + 1)"
                   " - CAST(1 AS BIGINT)"),
        )
    return out


def bloom_prefilter(
    keys: DataFrame,
    key_col: F.Column,
    probes: DataFrame,
    probe_key: F.Column,
    m: int = 4096,
    k: int = 3,
    salt: str = "bf",
) -> DataFrame:
    """Bloom-filter pre-join: returns the probe rows whose key MIGHT
    be in `keys` (all k bits set), dropping the definite misses before
    an expensive exact join — the classic shuffle-avoidance device for
    joins where most probes miss (incremental dedup against a huge
    seen-set, decontamination against an eval set).

    Bits are md5-slice positions (the repo's engine-portable hash
    idiom), so the filter — INCLUDING its false positives — is a
    deterministic function of the key set, on any engine and any
    partitioning; the DuckDB oracle reproduces the exact accept set.

    This is the RELATIONAL twin of the broadcast-bitmap
    implementation: the bit set is a ≤ m row frame (broadcasts far
    below the autoBroadcastJoinThreshold), membership is "no probe
    bit missing" = two anti-joins. At scale you aggregate the same
    positions into a byte-array bitmap once and broadcast that; the
    accept set is identical — this form is the one a SQL oracle can
    restate."""
    def bit_cols(col: F.Column) -> list:
        h = F.md5(F.concat(F.lit(salt), col.cast("string")))
        return [
            (F.conv(F.substring(h, 1 + 8 * i, 8), 16, 10)
             .cast("bigint") % m).alias("bit")
            for i in range(k)
        ]

    key_bits = (
        keys.select(F.explode(F.array(*bit_cols(key_col))).alias("bit"))
        .distinct()
    )
    probe_bits = probes.select(
        probe_key.alias("_pk"),
        F.explode(F.array(*bit_cols(probe_key))).alias("bit"),
    ).distinct()
    missing = probe_bits.join(key_bits, "bit", "left_anti") \
        .select("_pk").distinct()
    return probes.join(
        missing.withColumnRenamed("_pk", "_miss"),
        probe_key == F.col("_miss"), "left_anti",
    )


def hll_registers(
    df: DataFrame, key: Column, group_cols: tuple = ()
) -> DataFrame:
    """The MERGEABLE half of :func:`hll_distinct`: per-group register
    table (…group_cols, bucket, rho_max) — the sketch STATE a
    distributed pipeline actually ships (per-partition / per-day /
    per-source sketches unioned and max-merged, never raw keys). Same
    md5 register/rank derivation as hll_distinct, so
    ``hll_estimate(hll_merge(hll_registers(...)))`` over any
    partitioning of the rows equals ``hll_distinct`` over their union
    — max() is associative/commutative/idempotent, and the gate query
    + oracle pin the implementation to that contract."""
    gc = list(group_cols)
    h = F.md5(key.cast("string"))
    v = F.conv(
        F.substring(h, _PREFIX_LEN + 1, 15), 16, 10
    ).cast("bigint")
    return (
        df.where(key.isNotNull())
        .select(
            *gc,
            F.substring(h, 1, _PREFIX_LEN).alias("bucket"),
            F.when(v == 0, F.lit(61))
            .otherwise(F.lit(61) - F.length(F.bin(v)))
            .alias("rho"),
        )
        .groupBy(*gc, "bucket")
        .agg(F.max("rho").alias("rho_max"))
    )


def hll_merge(regs: DataFrame, group_cols: tuple = ()) -> DataFrame:
    """Union-merge register tables down to ``group_cols`` by register-
    wise max — the sketch algebra's ⊕. Input may carry EXTRA grouping
    columns (source, day, partition id) that the merge folds away."""
    gc = list(group_cols)
    return regs.groupBy(*gc, "bucket").agg(
        F.max("rho_max").alias("rho_max")
    )


def hll_estimate(regs: DataFrame, group_cols: tuple = ()) -> DataFrame:
    """Estimate distinct counts from a register table — the read-out
    half of :func:`hll_distinct` (identical integer register sum and
    small-range linear-counting correction; see that docstring for
    the estimator charter)."""
    gc = list(group_cols)
    scaled = F.when(
        F.col("rho_max") <= _SHIFT,
        F.expr(f"shiftleft(CAST(1 AS BIGINT), {_SHIFT} - rho_max)"),
    ).otherwise(F.lit(0).cast("bigint"))
    per_group = regs.groupBy(*gc).agg(
        F.count(F.lit(1)).alias("n_registers_used"),
        F.sum(scaled).alias("_s_used"),
    )
    s_total = (
        F.col("_s_used")
        + (F.lit(_M) - F.col("n_registers_used"))
        * F.lit(2 ** _SHIFT).cast("bigint")
    )
    raw = F.lit(scaled_alpha()) / s_total
    empty = F.lit(_M) - F.col("n_registers_used")
    linear = F.lit(float(_M)) * F.log(F.lit(float(_M)) / empty)
    return per_group.select(
        *gc,
        "n_registers_used",
        F.when((raw <= F.lit(2.5 * _M)) & (empty > 0), linear)
        .otherwise(raw)
        .alias("est_distinct"),
    )


def cms_merge(tables: list) -> DataFrame:
    """Union-merge count-min tables by counter ADDITION — the sketch
    algebra's ⊕ for CMS (max for HLL, sum here): per-source/per-day
    sketches built independently merge into the corpus sketch without
    touching raw keys, the property that lets a 100 TB pipeline ship
    constant-size state per partition. Inputs are cms_table outputs
    (row, bucket, c) — extra leading group columns are allowed and
    folded away."""
    allrows = tables[0]
    for t in tables[1:]:
        allrows = allrows.unionByName(t)
    return allrows.groupBy("row", "bucket").agg(
        F.sum("c").alias("c")
    )


# --- KMV (k-minimum-values) distinct sketch ------------------------------

_KMV_BITS = 52  # 13 md5 hex chars → uniform [0, 2^52): small enough
# that (k-1)·2^52 stays inside BIGINT for the estimator's exact
# floor division, large enough that corpus-scale distinct sets
# collide with negligible probability


def kmv_hash(key: Column) -> Column:
    """The shared 52-bit md5 hash value KMV orders by — identical
    expression on both engines (same device as the HLL registers)."""
    return F.conv(
        F.substring(F.md5(key.cast("string")), 1, 13), 16, 10
    ).cast("bigint")


def kmv_table(df: DataFrame, key: Column, k: int = 64) -> DataFrame:
    """K-minimum-values sketch of ``key``'s distinct count: the k
    SMALLEST distinct 52-bit hash values, as rows (hv bigint). The
    third sketch algebra beside HLL (max-merge) and CMS (sum-merge):
    KMV merges by 'union then re-take the k smallest', and unlike HLL
    it also supports set INTERSECTION estimates (shared hashes of two
    sketches), the primitive behind sketch-join cardinality planning.

    Plan: distinct-hash stream → global top-k via orderBy().limit(k),
    which Spark executes as TakeOrderedAndProject (per-partition
    heap + driver merge of k·n_partitions rows) — no single-partition
    window, no full sort. NULL keys ignored."""
    return (
        df.where(key.isNotNull())
        .select(kmv_hash(key).alias("hv"))
        .dropDuplicates(["hv"])
        .orderBy("hv")
        .limit(k)
    )


def kmv_merge(tables: list, k: int = 64) -> DataFrame:
    """⊕ for KMV: union the partial sketches' hash sets and keep the
    k smallest of the union — associative, commutative, idempotent
    (a hash seen by two partials collapses via dropDuplicates), so
    per-source/per-partition sketches built independently merge into
    exactly the sketch of the whole corpus. Requires a non-empty
    ``tables`` list (there is no session to build an empty sketch
    from)."""
    if not tables:
        raise ValueError("kmv_merge requires at least one sketch table")
    allrows = tables[0]
    for t in tables[1:]:
        allrows = allrows.unionByName(t)
    return allrows.dropDuplicates(["hv"]).orderBy("hv").limit(k)


def kmv_estimate(sketch_df: DataFrame, k: int = 64) -> DataFrame:
    """Read-out: one row (k_used, kth_hash, est_distinct). With the
    sketch full (k_used = k), the classic unbiased KMV estimator
    F0 ≈ (k-1)/U_(k) with U_(k) = kth_hash/2^52, computed as the
    exact BIGINT floor division (k-1)·2^52 DIV kth_hash (the 52-bit
    hash keeps the product inside BIGINT up to k = 2048); with fewer
    than k distinct hashes the sketch IS the distinct set and the
    count is exact. Every value is integer, so the estimate is
    engine-exact."""
    agg = sketch_df.agg(
        F.count(F.lit(1)).alias("k_used"),
        F.max("hv").alias("kth_hash"),
    )
    full = (F.col("k_used") >= k) & (F.col("kth_hash") > 0)
    est = F.when(
        full,
        F.expr(
            f"CAST({k - 1} AS BIGINT) "
            f"* shiftleft(CAST(1 AS BIGINT), {_KMV_BITS}) DIV kth_hash"
        ),
    ).otherwise(F.col("k_used").cast("bigint"))
    return agg.select(
        F.col("k_used").cast("bigint").alias("k_used"),
        F.coalesce(F.col("kth_hash"), F.lit(0)).cast("bigint")
        .alias("kth_hash"),
        est.alias("est_distinct"),
    )


def kmv_pair_jaccard(
    df: DataFrame, key: Column, part_col: str, k: int = 64
) -> DataFrame:
    """Pairwise set-similarity estimates between partitions (sources,
    days, datasets) from their KMV sketches — the estimate KMV
    supports and HLL cannot: for each partition pair (a < b) take the
    k smallest hashes of Sa ∪ Sb and count how many sit in BOTH
    sketches; Jaccard ≈ n_shared / k_used (Beyer et al. 2007). The
    sketch-join cardinality/overlap planner at 100 TB: per-partition
    sketches are constant-size, the pair join touches k·P rows, never
    raw keys. Output (part_a, part_b, k_used, n_shared) — all exact
    integers; the division is the consumer's.

    Plan: distinct (part, hv) stream → per-part top-k via a window
    over the PART-partitioned hash stream (vocabulary-sized, never
    the corpus) → full-outer pairwise hash alignment → per-pair
    union-rank window over ≤ 2k rows."""
    sk = (
        df.where(key.isNotNull())
        .select(F.col(part_col).alias("part"), kmv_hash(key).alias("hv"))
        .dropDuplicates(["part", "hv"])
    )
    w = Window.partitionBy("part").orderBy("hv")
    topk = sk.withColumn("rn", F.row_number().over(w)) \
        .where(F.col("rn") <= k).select("part", "hv")
    # pair frame: for each (pa < pb) the union of their hash sets with
    # membership flags — built from the per-part sketches, not raw data
    pa = topk.select(F.col("part").alias("pa"), "hv")
    pb = topk.select(F.col("part").alias("pb"), "hv")
    parts = topk.select("part").distinct()
    pairs = (
        parts.select(F.col("part").alias("pa"))
        .join(parts.select(F.col("part").alias("pb")),
              F.col("pa") < F.col("pb"))
    )
    u = (
        pairs.join(pa, "pa")
        .select("pa", "pb", "hv", F.lit(1).alias("in_a"))
        .unionByName(
            pairs.join(pb, "pb")
            .select("pa", "pb", "hv", F.lit(0).alias("in_a")))
        .groupBy("pa", "pb", "hv")
        .agg(F.max("in_a").alias("in_a"),
             F.min("in_a").alias("_min"))
        .select("pa", "pb", "hv",
                "in_a", (F.col("_min") == 0).cast("int").alias("in_b"))
    )
    wu = Window.partitionBy("pa", "pb").orderBy("hv")
    ranked = u.withColumn("urn", F.row_number().over(wu)) \
        .where(F.col("urn") <= k)
    return (
        ranked.groupBy(F.col("pa").alias("part_a"),
                       F.col("pb").alias("part_b"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("k_used"),
            F.sum((F.col("in_a") * F.col("in_b")).cast("bigint"))
            .cast("bigint").alias("n_shared"),
        )
    )
