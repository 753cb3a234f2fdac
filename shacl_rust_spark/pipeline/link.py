"""Stage 2: entity linking — mention surfaces → canonical entity IRIs.

Two passes, mirroring the broadcast-or-bucketed design in
BASELINE.json north_star:

1. EXACT: broadcast hash join of mention surfaces against the (tiny)
   entity dictionary. At 100 TB the mentions side never shuffles.
2. FUZZY (unmatched only): minhash-LSH blocking over character
   3-grams — surfaces and dictionary entries are minhashed with B
   bands × R rows (md5-based, deterministic, no RNG); candidates
   sharing any band bucket are rescored with EXACT character-3-gram
   Jaccard, argmax per surface (ties → smallest entity_id), accepted
   at jaccard ≥ 0.5. The band join is the only shuffle and it touches
   only the (small) unmatched remainder.

Head-entity skew (one nation takes ≥50% of mentions by construction)
is handled where it bites — the per-entity aggregation — with an
explicit two-stage SALTED aggregate (salt → partial agg → final agg),
see salted_count(). AQE's skew-join splitting complements but does not
replace this for aggregations.

All surface→gram/minhash work is pure Column expressions on arrays
(F.transform/F.aggregate) — JVM-side, no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

N_HASHES = 8   # minhash signature length
N_BANDS = 4    # bands of R = N_HASHES / N_BANDS rows each
JACCARD_MIN = 0.5
GRAM = 3


def char_grams(col: F.Column, n: int = GRAM) -> F.Column:
    """Distinct character n-grams of a string as an array<string>."""
    idx = F.sequence(F.lit(0), F.greatest(F.length(col) - n, F.lit(0)))
    return F.array_distinct(
        F.transform(idx, lambda i: col.substr(i + 1, F.lit(n)))
    )


def _gram_hash(gram: F.Column, seed: int) -> F.Column:
    """Deterministic 64-bit-ish hash of a gram under one seed (md5 prefix)."""
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(f"s{seed}:"), gram)), 1, 15), 16, 10
    ).cast("long")


def with_minhash_sig(
    df, key_col: str, grams_col: str, out_col: str, n_hashes: int = N_HASHES
):
    """Adds an array<long> minhash signature column (min over gram
    hashes per seed), keyed by the unique ``key_col``.

    Deliberately NO higher-order lambdas: several F.transform lambdas in
    one (or Catalyst-collapsed) projection cross-contaminate their
    lambda variables in PySpark 4.1 and return wrong minima. Instead:
    explode grams → plain md5 hash columns → groupBy(key).min per seed.
    The explode touches only deduped surfaces, so the extra shuffle is
    on a tiny relation at any scale."""
    ex = df.select(F.col(key_col), F.explode(F.col(grams_col)).alias("_gram"))
    hashed = ex.select(
        key_col,
        *[_gram_hash(F.col("_gram"), s).alias(f"_h{s}") for s in range(n_hashes)],
    )
    sig = hashed.groupBy(key_col).agg(
        *[F.min(f"_h{s}").alias(f"_mh{s}") for s in range(n_hashes)]
    ).select(
        key_col,
        F.array(*[F.col(f"_mh{s}") for s in range(n_hashes)]).alias(out_col),
    )
    return df.join(sig, key_col)


def band_keys(sig: F.Column, n_bands: int = N_BANDS) -> F.Column:
    """array<string> LSH band keys: band index + joined rows."""
    r = N_HASHES // n_bands
    return F.array(*[
        F.concat_ws(":", F.lit(str(b)),
                    *[sig.getItem(b * r + i).cast("string") for i in range(r)])
        for b in range(n_bands)
    ])


def link_mentions(
    mentions: DataFrame,
    entity_dict: DataFrame,
    kinds: tuple = ("lives_in",),
) -> DataFrame:
    """(… obj_surface) → + (entity_id nullable, link_method).

    entity_dict: (surface, entity_id, entity_class) — small, broadcast.

    Only mention kinds that semantically target the dictionary go
    through linking; the rest (node references like placed_by/same_as,
    resolved by IRI-minting instead) pass through untouched. Without
    this split, every distinct node surface (~100k at sf0.1×4) flows
    into the fuzzy minhash pass and dominates the stage (52 s → <5 s).
    """
    linkable = F.col("kind").isin(list(kinds))

    d = F.broadcast(entity_dict.select("surface", "entity_id"))

    # ONE pass over the mentions frame: exact broadcast join, then a
    # second broadcast join against the (tiny) fuzzy-resolution map,
    # then a single CASE projection — no union of per-method branches,
    # which would re-read the (checkpointed) mentions once per branch.
    exact = mentions.join(
        d, linkable & (mentions["obj_surface"] == d["surface"]), "left"
    ).drop("surface")

    # fuzzy pass on the distinct unmatched linkable surfaces only
    surfaces = (
        exact.where(linkable & F.col("entity_id").isNull())
        .select("obj_surface")
        .dropDuplicates(["obj_surface"])
    )
    s_grams = with_minhash_sig(
        surfaces.select("obj_surface", char_grams(F.col("obj_surface")).alias("_g")),
        "obj_surface", "_g", "_sig",
    ).withColumn("_band", F.explode(band_keys(F.col("_sig")))).drop("_sig")

    d_grams = F.broadcast(
        with_minhash_sig(
            entity_dict.select(
                F.col("surface").alias("_dsurf"), "entity_id",
                char_grams(F.col("surface")).alias("_dg"),
            ),
            "_dsurf", "_dg", "_dsig",
        ).withColumn("_band", F.explode(band_keys(F.col("_dsig")))).drop("_dsig")
    )

    cand = (
        s_grams.join(d_grams, "_band")
        .dropDuplicates(["obj_surface", "entity_id"])
        .withColumn(
            "_jac",
            F.size(F.array_intersect("_g", "_dg"))
            / F.size(F.array_union("_g", "_dg")),
        )
        .where(F.col("_jac") >= JACCARD_MIN)
    )
    # argmax per surface: best jaccard, ties broken by smallest entity_id
    from pyspark.sql import Window

    w = Window.partitionBy("obj_surface").orderBy(
        F.col("_jac").desc(), F.col("entity_id").asc()
    )
    best = (
        cand.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select(F.col("obj_surface").alias("_fsurf"),
                F.col("entity_id").alias("_fid"))
    )

    return (
        exact.join(
            F.broadcast(best),
            linkable & F.col("entity_id").isNull()
            & (exact["obj_surface"] == F.col("_fsurf")),
            "left",
        )
        .select(
            *mentions.columns,
            F.when(~linkable, F.lit(None).cast("string"))
            .otherwise(F.coalesce(F.col("entity_id"), F.col("_fid")))
            .alias("entity_id"),
            F.when(~linkable, F.lit("n/a"))
            .when(F.col("entity_id").isNotNull(), F.lit("exact"))
            .when(F.col("_fid").isNotNull(), F.lit("fuzzy"))
            .otherwise(F.lit("unlinked"))
            .alias("link_method"),
        )
    )


def salted_count(df: DataFrame, key: str, n_salts: int = 32) -> DataFrame:
    """Two-stage skew-proof count per key: salt → partial → final.

    The head entity owns ≥50% of rows; a naive groupBy(key) funnels
    them through one reducer. Salting bounds any single task at
    ~1/n_salts of the head key's rows; the second agg touches only
    (#keys × n_salts) rows.
    """
    salt = (F.crc32(F.col("url").cast("binary")) % n_salts).alias("_salt")
    partial = (
        df.select(F.col(key), salt)
        .groupBy(key, "_salt")
        .agg(F.count(F.lit(1)).alias("_pc"))
    )
    return partial.groupBy(key).agg(F.sum("_pc").alias("n_mentions"))
