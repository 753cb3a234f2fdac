"""Deduplication operators over the documents table.

- exact_duplicates: hash-groupBy on a normalization key; survivors =
  min doc_id. One shuffle on the key; at 100 TB the key is a 128-bit
  digest so the shuffle payload stays narrow.
- jaccard_pairs: exact word-set Jaccard over co-blocked pairs (the
  verify stage of dedup). Blocking bounds the quadratic term; at scale
  the blocks come from LSH, here also from `source` (≤25 docs/block).
- minhash_lsh_pairs: scale path — minhash band blocking first, exact
  rescoring second. Minhash values are lexicographic minima of md5 hex
  digests (deterministic, reproducible in any engine; no RNG).
- simhash64: 64-bit simhash from word md5 bits via bit aggregation —
  pure Column ops; near-dup = small Hamming distance.
- embedding_near_dups: cosine over the embeddings table (see ann.py).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

WORD_RE = r"[^\s]+"
N_HASHES = 8
N_BANDS = 4


def words_col(text: F.Column) -> F.Column:
    """Distinct word set of a document (order-independent)."""
    return F.array_distinct(
        F.filter(F.split(text, r"\s+"), lambda w: w != "")
    )


def exact_duplicates(docs: DataFrame, key: F.Column) -> DataFrame:
    """(doc_id, canonical_id) for every doc whose normalization key is
    shared with an earlier doc; survivors (min doc_id per key) are not
    returned."""
    keyed = docs.select(F.col("doc_id"), key.alias("_k"))
    canon = keyed.groupBy("_k").agg(F.min("doc_id").alias("canonical_id"))
    return (
        keyed.join(canon, "_k")
        .where(F.col("doc_id") != F.col("canonical_id"))
        .select("doc_id", "canonical_id")
    )


def _word_sets(docs: DataFrame) -> DataFrame:
    return docs.select(
        "doc_id", "source", words_col(F.col("text")).alias("_w")
    )


def jaccard_pairs(docs: DataFrame, threshold: float) -> DataFrame:
    """Within-source exact word-set Jaccard pairs ≥ threshold.

    Jaccard expressed in INTEGER arithmetic (|∩| and |∪| counts with
    cross-multiplied threshold) so the cut is engine-exact."""
    ws = _word_sets(docs)
    a = ws.select(F.col("doc_id").alias("a"), F.col("source"),
                  F.col("_w").alias("_wa"))
    b = ws.select(F.col("doc_id").alias("b"), F.col("source"),
                  F.col("_w").alias("_wb"))
    num, den = int(threshold * 10000), 10000
    return (
        a.join(b, "source")
        .where(F.col("a") < F.col("b"))
        .withColumn("_i", F.size(F.array_intersect("_wa", "_wb")))
        .withColumn("_u", F.size(F.array_union("_wa", "_wb")))
        .where(F.col("_i") * den >= F.col("_u") * num)
        .select("a", "b", "_i", "_u")
        .withColumnRenamed("_i", "n_common")
        .withColumnRenamed("_u", "n_union")
    )


def prefix_filter_pairs(docs: DataFrame, threshold: float) -> DataFrame:
    """Set-similarity join by PREFIX FILTERING (the AllPairs/PPJoin
    candidate scheme, Bayardo et al. 2007 / Xiao et al. 2008):
    identical output contract to jaccard_pairs — within-source word-set
    Jaccard ≥ threshold as (a, b, n_common, n_union) — but WITHOUT the
    all-pairs join, and unlike minhash-LSH with DETERMINISTIC recall
    1.0: order every document's tokens by a global total order
    (doc-frequency ASC, token ASC — rarest first), keep each document's
    first n − ⌈t·n⌉ + 1 tokens as its prefix, and generate a candidate
    only when two prefixes share a token. Any pair with J ≥ t MUST
    share a prefix token (pigeonhole on the sorted sets), so the exact
    array-intersect rescore on candidates equals the all-pairs result —
    which is exactly what the gate's oracle asserts by being the
    all-pairs SQL verbatim.

    Scale shape: one global token-frequency aggregate
    (vocab-cardinality, broadcasts), one row_number window per doc
    (single shuffle of the token frame on doc_id), and a bucketed
    self-join keyed on PREFIX tokens — rare tokens by construction, so
    bucket sizes track the frequency tail, not the corpus. The known
    caveat: very SHORT documents keep hot tokens in their prefixes
    (p = 1 at n·(1−t) < 1), so a head-heavy short-doc corpus re-grows
    hot buckets — the standard mitigations (length binning /
    positional filter) are the PPJoin extensions, stated not built.
    Prefix sizes are exact integers: ⌈t·n⌉ = (num·n + den − 1) DIV den
    with the same num/den = t·10000 device as the rescore.

    The PPJoin POSITIONAL filter tightens the candidates further (and
    stays recall-1.0): a witness token at sorted positions (i, j) in
    the two prefixes bounds the achievable overlap at
    1 + min(n_a − i, n_b − j), and J ≥ t needs overlap ≥
    ⌈t(n_a+n_b)/(1+t)⌉ — a pair survives if ANY witness meets the
    bound, and for a truly-similar pair its first common prefix token
    always does (Xiao et al. 2008, Lemma 1), so nothing true is
    dropped. This is what keeps the short-doc hot-token caveat above
    from exploding: the hot witness usually sits too deep in the
    longer doc's order to satisfy the bound."""
    from pyspark.sql import Window

    num, den = int(threshold * 10000), 10000
    ws = _word_sets(docs)
    ex = ws.select("doc_id", "source", F.explode("_w").alias("w"))
    freq = ex.groupBy("w").agg(F.count(F.lit(1)).alias("_df"))
    wdoc = Window.partitionBy("doc_id").orderBy("_df", "w")
    szs = ws.select("doc_id", F.size("_w").alias("_n"))
    prefix = (
        ex.join(freq, "w")
        .withColumn("_rn", F.row_number().over(wdoc))
        .join(szs, "doc_id")
        .where(F.col("_rn")
               <= F.col("_n")
               - F.expr(f"({num} * _n + {den - 1}) div {den}") + 1)
        .select("doc_id", "source", "w", "_rn", "_n")
    )
    alpha = F.expr(
        f"({num} * (_na + _nb) + {num + den - 1}) div {num + den}")
    cand = (
        prefix.select(F.col("doc_id").alias("a"), "source", "w",
                      F.col("_rn").alias("_ra"),
                      F.col("_n").alias("_na"))
        .join(prefix.select(F.col("doc_id").alias("b"), "source", "w",
                            F.col("_rn").alias("_rb"),
                            F.col("_n").alias("_nb")),
              ["source", "w"])
        .where(F.col("a") < F.col("b"))
        .where(F.lit(1)
               + F.least(F.col("_na") - F.col("_ra"),
                         F.col("_nb") - F.col("_rb")) >= alpha)
        .select("a", "b")
        .dropDuplicates(["a", "b"])
    )
    wa = ws.select(F.col("doc_id").alias("a"), F.col("_w").alias("_wa"))
    wb = ws.select(F.col("doc_id").alias("b"), F.col("_w").alias("_wb"))
    return (
        cand.join(wa, "a").join(wb, "b")
        .withColumn("_i", F.size(F.array_intersect("_wa", "_wb")))
        .withColumn("_u", F.size(F.array_union("_wa", "_wb")))
        .where(F.col("_i") * den >= F.col("_u") * num)
        .select("a", "b", F.col("_i").alias("n_common"),
                F.col("_u").alias("n_union"))
    )


def containment_pairs(docs: DataFrame, threshold: float) -> DataFrame:
    """Within-source one-sided containment pairs: emit (contained,
    container) where |A∩B| / |A| ≥ threshold — catches a document
    that is a QUOTE/SUBSET of a longer one, which symmetric Jaccard
    misses (a tweet embedded in an article has tiny Jaccard but
    containment ≈ 1). Broder's containment coefficient over word
    sets; INTEGER cross-multiplied threshold like jaccard_pairs, so
    the cut is engine-exact. This is the blocked verify path (the
    scale path pre-filters candidates with minhash_lsh_pairs — LSH
    for containment uses the same buckets, rescoring with this
    formula). Self-pairs excluded; both directions emitted when both
    hold (A≈B)."""
    ws = _word_sets(docs)
    a = ws.select(F.col("doc_id").alias("contained"), F.col("source"),
                  F.col("_w").alias("_wa"))
    b = ws.select(F.col("doc_id").alias("container"), F.col("source"),
                  F.col("_w").alias("_wb"))
    num, den = int(threshold * 10000), 10000
    return (
        a.join(b, "source")
        .where(F.col("contained") != F.col("container"))
        .withColumn("_i", F.size(F.array_intersect("_wa", "_wb")))
        .withColumn("_na", F.size("_wa"))
        .where((F.col("_na") > 0)
               & (F.col("_i") * den >= F.col("_na") * num))
        .select("contained", "container",
                F.col("_i").alias("n_common"),
                F.col("_na").alias("n_contained_words"))
    )


def incremental_new_docs(
    docs: DataFrame, seen_keys: DataFrame, key: F.Column
) -> DataFrame:
    """Cross-corpus incremental dedup — THE daily-crawl operation: keep
    only documents whose dedup key does not already exist in the
    accumulated corpus. ``seen_keys`` is a one-column frame of keys
    already ingested (the running state a production pipeline persists
    between runs); new-batch-internal duplicates also collapse to
    their smallest doc_id (exact_duplicates semantics), so the output
    is ingestable as-is and its keys can be unioned into seen_keys.

    Scale design: one left_anti shuffle on the key (both sides
    key-partitioned; at 100 TB the seen side is a bucketed table and
    the join is co-located), then the within-batch groupBy(min). No
    driver state, no collect."""
    keyed = docs.withColumn("_k", key)
    fresh = keyed.join(
        seen_keys.select(F.col(seen_keys.columns[0]).alias("_k")),
        "_k", "left_anti",
    )
    firsts = fresh.groupBy("_k").agg(F.min("doc_id").alias("_first"))
    return (
        fresh.join(firsts, "_k")
        .where(F.col("doc_id") == F.col("_first"))
        .drop("_k", "_first")
    )


def _word_minhash(docs: DataFrame, n_hashes: int = N_HASHES) -> DataFrame:
    """(doc_id, sig array<string>) — per seed, the lexicographic min of
    md5('s<seed>:' || word) hex digests over the doc's word set."""
    ex = _word_sets(docs).select("doc_id", F.explode("_w").alias("_word"))
    hashed = ex.select(
        "doc_id",
        *[F.md5(F.concat(F.lit(f"s{s}:"), F.col("_word"))).alias(f"_h{s}")
          for s in range(n_hashes)],
    )
    return hashed.groupBy("doc_id").agg(
        *[F.min(f"_h{s}").alias(f"_m{s}") for s in range(n_hashes)]
    ).select(
        "doc_id",
        F.array(*[F.col(f"_m{s}") for s in range(n_hashes)]).alias("sig"),
    )


MAX_BUCKET = 50


def minhash_lsh_pairs(docs: DataFrame, threshold: float) -> DataFrame:
    """Minhash-LSH near-dup pairs: band-bucket join (the only shuffle
    over candidate space) then EXACT word-set Jaccard rescoring.

    Standard stop-bucket removal: band buckets with more than
    MAX_BUCKET members are degenerate (common-word pileups) and are
    skipped — without this a single hot bucket contributes O(n²)
    candidate pairs and dominates the join (observed 137 s → ~10 s at
    sf0.1 on the synthetic word-soup corpus, which has a tiny
    vocabulary and therefore extreme bucket skew)."""
    r = N_HASHES // N_BANDS
    sig = _word_minhash(docs)
    bands = sig.select(
        "doc_id",
        F.explode(F.array(*[
            F.concat_ws("|", F.lit(str(bi)),
                        *[F.col("sig").getItem(bi * r + i) for i in range(r)])
            for bi in range(N_BANDS)
        ])).alias("_band"),
    )
    small = (
        bands.groupBy("_band")
        .agg(F.count(F.lit(1)).alias("_bn"))
        .where(F.col("_bn") <= MAX_BUCKET)
        .select("_band")
    )
    bands = bands.join(small, "_band", "left_semi")
    cand = (
        bands.alias("x")
        .join(bands.alias("y"), "_band")
        .where(F.col("x.doc_id") < F.col("y.doc_id"))
        .select(F.col("x.doc_id").alias("a"), F.col("y.doc_id").alias("b"))
        .dropDuplicates(["a", "b"])
    )
    ws = _word_sets(docs)
    num, den = int(threshold * 10000), 10000
    return (
        cand.join(ws.select(F.col("doc_id").alias("a"),
                            F.col("_w").alias("_wa")), "a")
        .join(ws.select(F.col("doc_id").alias("b"),
                        F.col("_w").alias("_wb")), "b")
        .withColumn("_i", F.size(F.array_intersect("_wa", "_wb")))
        .withColumn("_u", F.size(F.array_union("_wa", "_wb")))
        .where(F.col("_i") * den >= F.col("_u") * num)
        .select("a", "b")
    )


def _hyperplanes(n_planes: int, dim: int) -> list[tuple[int, int, float]]:
    """Deterministic pseudo-random hyperplane weights in [-1, 1]:
    component (plane, pos) is derived from md5(f"hp:{plane}:{pos}") —
    no RNG state, reproducible in any engine."""
    out = []
    for plane in range(n_planes):
        for pos in range(dim):
            h = int.from_bytes(
                hashlib.md5(f"hp:{plane}:{pos}".encode()).digest()[:8], "big"
            )
            out.append((plane, pos, (h / float(1 << 63)) - 1.0))
    return out


def _band_sig_udf(n_planes: int, band_size: int, dim: int):
    """Arrow-batched signature kernel: embedding → array of per-band
    LSH signatures. Plane p contributes 2^(p mod band_size) to band
    floor(p / band_size) when the hyperplane projection is positive —
    bit-for-bit the banding layout of the Column formulation it
    replaced. The (n_planes × dim) weight matrix is a deterministic
    closure constant (a few KB), shipped once per executor with the
    UDF."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    w = np.zeros((n_planes, dim))
    for plane, pos, weight in _hyperplanes(n_planes, dim):
        w[plane, pos] = weight
    n_bands = -(-n_planes // band_size)
    band_idx = np.arange(n_planes) // band_size
    bit_weight = 1 << (np.arange(n_planes) % band_size)

    def sig(emb):  # pd.Series[array] -> pd.Series[array<long>]
        mat = np.vstack(emb.map(np.asarray).to_numpy()).astype(np.float64)
        vals = ((mat @ w.T) > 0) * bit_weight  # (batch, n_planes)
        sigs = np.zeros((vals.shape[0], n_bands), dtype=np.int64)
        for b in range(n_bands):
            sigs[:, b] = vals[:, band_idx == b].sum(axis=1)
        return pd.Series(list(sigs))

    return pandas_udf(sig, "array<long>")


def embedding_lsh_pairs(
    embeddings: DataFrame,
    threshold: float,
    n_planes: int = 64,
    band_size: int = 2,
    max_bucket: int = 200,
) -> DataFrame:
    """Same-label embedding near-dup pairs at cosine ≥ threshold via
    random-hyperplane LSH banding + EXACT cosine rescore — the banded
    sibling of the all-pairs verify path (queries_ops.dedup_embedding),
    mirroring minhash_lsh_pairs' shape: block first, rescore second.

    Candidate generation never self-joins the corpus unblocked: the join
    key is (label, band, band-signature), hot buckets above max_bucket
    are dropped (stop-bucket removal), and precision is exact because
    every candidate is rescored with the true cosine. Recall is tuned by
    (n_planes, band_size): a plane agrees with probability 1 - θ/π, so
    at the demo threshold 0.35 (θ ≈ 69°, p ≈ 0.615) 32 bands of 2 give
    a per-pair miss rate of (1 - 0.615²)^32 ≈ 2e-7; higher thresholds
    allow wider bands and fewer planes.

    Projection layout: per-vector band signatures are computed MAP-SIDE
    by an Arrow-batched pandas UDF (one numpy matmul against the
    broadcast (n_planes × dim) hyperplane matrix per batch) — ZERO
    shuffle for candidate signatures, linear in corpus size and
    embarrassingly parallel at 100 TB. (An earlier layout exploded
    vectors to (vec_id, pos, v) and partial-aggregated dot products —
    correct, but it shuffled dim × n_planes rows per vector; the matmul
    does the same arithmetic inside one Arrow batch.) Sign ties at
    exactly 0.0 could order-differently than a sequential sum, but
    banding only gates candidate RECALL — the exact cosine rescore
    keeps precision identical.
    """
    head = embeddings.select("embedding").first()
    if head is None:  # empty corpus → no pairs (and no dim to probe)
        return (
            embeddings.select(F.col("vec_id").alias("a"),
                              F.col("vec_id").alias("b"))
            .limit(0)
        )
    dim = len(head[0])
    sig_udf = _band_sig_udf(n_planes, band_size, dim)
    sigs = embeddings.select(
        "vec_id", "label",
        F.posexplode(sig_udf(F.col("embedding"))).alias("_band", "_sig"),
    )
    counts = (
        sigs.groupBy("label", "_band", "_sig")
        .count().where(F.col("count") <= max_bucket)
        .select("label", "_band", "_sig")
    )
    buckets = sigs.join(counts, ["label", "_band", "_sig"], "left_semi")
    cand = (
        buckets.alias("x")
        .join(buckets.alias("y"), ["label", "_band", "_sig"])
        .where(F.col("x.vec_id") < F.col("y.vec_id"))
        .select(F.col("x.vec_id").alias("a"), F.col("y.vec_id").alias("b"))
        .dropDuplicates(["a", "b"])
    )
    ea = embeddings.select(F.col("vec_id").alias("a"),
                           F.col("embedding").alias("_ea"))
    eb = embeddings.select(F.col("vec_id").alias("b"),
                           F.col("embedding").alias("_eb"))
    from . import ann

    scored = ann.with_cosine(cand.join(ea, "a").join(eb, "b"),
                             "_ea", "_eb", "_cos")
    return scored.where(F.round("_cos", 6) >= threshold).select("a", "b")


def simhash64(docs: DataFrame) -> DataFrame:
    """(doc_id, simhash long): per word take the full 64 bits of md5
    (first 16 hex chars), sum ±1 per bit over the word set, sign → bit.
    Pure Column ops (explode + conditional sums), no UDFs.

    The 64-bit word hash is carried as two 32-bit halves (hi = hex
    chars 1-8, lo = chars 9-16) so every intermediate fits a signed
    long; the assembled simhash is the standard two's-complement long
    (bit 63 contributes -2^63)."""
    ex = _word_sets(docs).select("doc_id", F.explode("_w").alias("_word"))
    md5 = F.md5(F.col("_word"))
    h = ex.select(
        "doc_id",
        F.conv(F.substring(md5, 1, 8), 16, 10).cast("long").alias("_hi"),
        F.conv(F.substring(md5, 9, 8), 16, 10).cast("long").alias("_lo"),
    )

    def _bit(b: int):
        if b < 32:
            return F.shiftright(F.col("_lo"), b).bitwiseAND(F.lit(1))
        return F.shiftright(F.col("_hi"), b - 32).bitwiseAND(F.lit(1))

    bit_sums = h.groupBy("doc_id").agg(*[
        F.sum(F.when(_bit(b) == 1, F.lit(1)).otherwise(F.lit(-1)))
        .alias(f"_b{b}")
        for b in range(64)
    ])
    sim = F.lit(0).cast("long")
    for b in range(64):
        weight = -(1 << 63) if b == 63 else (1 << b)
        sim = sim + F.when(F.col(f"_b{b}") > 0,
                           F.lit(weight).cast("long")).otherwise(F.lit(0))
    return bit_sums.select("doc_id", sim.alias("simhash"))


def remove_duplicated_spans(
    docs: DataFrame, n: int = 4, min_docs: int = 2
) -> DataFrame:
    """Exact-substring dedup at word-n-gram granularity (the
    remove-duplicated-spans pass of Lee et al. 2021, "Deduplicating
    Training Data Makes Language Models Better", approximated on
    n-gram boundaries instead of suffix arrays): any n-word span that
    appears in >= min_docs DISTINCT documents is removed from every
    document, and the surviving words are reassembled in order.

    Returns one row per input document:
    (doc_id, n_words, n_removed, cleaned_text) — a document fully
    covered by hot spans survives with cleaned_text = ''.

    Corpus-vs-itself twin of ops/contamination.py (corpus-vs-benchmark).
    Plan shape for 100 TB: the text column is scanned exactly TWICE
    (word explode + gram explode — deriving grams from the word frame
    instead would trade the second columnar scan for a full shuffle of
    the corpus through a per-doc window, a bad trade at scale); the
    hot-span set is one groupBy on a fixed-width md5 digest (two-phase
    count-distinct, map-side partial agg) and is tiny relative to the
    corpus (only spans repeated across documents), so AQE broadcasts it
    into the gram join; covered positions join the word frame on
    (doc_id, pos) and ONE groupBy doc_id computes totals, kept counts,
    and the reassembled text together; the completeness join for
    zero-word documents reads doc_id alone (column-pruned). No corpus
    self-join anywhere."""
    from .text import word_array

    empty = F.array().cast("array<string>")
    split_once = F.when(
        F.trim(F.col("text")) == "", empty
    ).otherwise(word_array())
    # materialize the token array behind a projection so the gram
    # lambda's many slice() references don't each re-run split()
    # (Catalyst keeps the projection because _arr is referenced more
    # than once by a non-cheap expression — one split per row, not
    # one per gram)
    toks = docs.select("doc_id", split_once.alias("_arr"))
    arr = F.col("_arr")

    words = toks.select(
        "doc_id", F.posexplode(arr).alias("_p0", "_w")
    ).select("doc_id", (F.col("_p0") + 1).alias("_pos"), "_w")

    k = F.size(arr) - (n - 1)
    gram_arr = F.when(
        k >= 1,
        F.transform(
            F.sequence(F.lit(1), F.greatest(k, F.lit(1))),
            lambda i: F.array_join(F.slice(arr, i, n), " "),
        ),
    ).otherwise(empty)
    grams = toks.select(
        "doc_id", F.posexplode(gram_arr).alias("_g0", "_gram")
    ).select(
        "doc_id",
        (F.col("_g0") + 1).alias("_gpos"),
        F.md5(F.col("_gram")).alias("_gkey"),
    )

    hot = (
        grams.groupBy("_gkey")
        .agg(F.count_distinct("doc_id").alias("_nd"))
        .where(F.col("_nd") >= min_docs)
        .select("_gkey")
    )
    covered = (
        grams.join(hot, "_gkey")
        .select(
            "doc_id",
            F.explode(
                F.sequence(F.col("_gpos"), F.col("_gpos") + F.lit(n - 1))
            ).alias("_pos"),
        )
        .distinct()
        .withColumn("_cov", F.lit(1))
    )
    keep = F.col("_cov").isNull()
    agg = (
        words.join(covered, ["doc_id", "_pos"], "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("_n_words"),
            F.sum(keep.cast("long")).alias("_n_kept"),
            # collect_list skips nulls → only kept words are gathered
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.when(keep, F.struct(
                        F.col("_pos").alias("p"), F.col("_w").alias("w")
                    )))),
                    lambda s: s["w"],
                ),
                " ",
            ).alias("cleaned_text"),
        )
    )
    return (
        docs.select("doc_id").join(agg, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("_n_words"), F.lit(0))
            .cast("long").alias("n_words"),
            (F.coalesce(F.col("_n_words"), F.lit(0))
             - F.coalesce(F.col("_n_kept"), F.lit(0)))
            .cast("long").alias("n_removed"),
            F.coalesce(F.col("cleaned_text"), F.lit("")).alias("cleaned_text"),
        )
    )


def snapshot_diff(
    old: DataFrame, new: DataFrame, key: str, fingerprint: F.Column
) -> DataFrame:
    """Corpus version diff: (key, status) with status ∈ {'added',
    'removed', 'changed'} between two snapshots, compared by a content
    fingerprint (unchanged rows are omitted — at scale they are the
    overwhelming majority and emitting them would make the diff
    corpus-sized). ONE full-outer join on the key; fingerprints are
    computed in the scan projections so each side is read once. The
    ingest-audit op a versioned lake runs between drops."""
    o = old.select(F.col(key).alias("_k"), fingerprint.alias("_fo"))
    n = new.select(F.col(key).alias("_k"), fingerprint.alias("_fn"))
    j = o.join(n, "_k", "full_outer")
    status = (
        F.when(F.col("_fo").isNull(), F.lit("added"))
        .when(F.col("_fn").isNull(), F.lit("removed"))
        .when(F.col("_fo") != F.col("_fn"), F.lit("changed"))
    )
    return (
        j.select(F.col("_k").alias(key), status.alias("status"))
        .where(F.col("status").isNotNull())
    )


def simhash_band_pairs(
    docs: DataFrame,
    max_hamming: int = 3,
    max_bucket: int | None = None,
) -> DataFrame:
    """Near-duplicate pairs by simhash Hamming distance: (a, b,
    hamming) for every unordered doc pair with
    Hamming(simhash_a, simhash_b) ≤ `max_hamming` — the scale path
    for the simhash family (dedup_simhash computes signatures; this
    turns them into pairs without an all-pairs join).

    Banding uses the PIGEONHOLE guarantee (Manku et al.'s
    simhash-blocking construction): split the 64-bit signature into
    max_hamming+1 equal bands — two signatures within `max_hamming`
    bits of each other MUST agree exactly on at least one band, so
    the banded candidate join has recall 1.0 (deterministic, unlike
    minhash banding's probabilistic recall), and the exact
    bit_count(xor) rescore makes precision 1.0. 64 must divide evenly
    (max_hamming ∈ {1, 3, 7, 15}).

    Plan — signature-cluster compressed, multi-table banded:

    1. Signatures materialize ONCE (lazy localCheckpoint — at corpus
       scale this is the standard "write the signature table" step)
       and compress to DISTINCT signatures with cluster counts: a
       mega-cluster of n identical signatures rides the band shuffle
       as ONE row instead of n, so its C(n,2) output pairs are
       produced by a single expansion join at the end — never
       shuffled 8× through a pair-dedup exchange.
    2. Band keys per distinct signature. For max_hamming ≤ 3 the
       classic k+1 equal bands (32/16-bit keys). For max_hamming = 7
       the k+1 construction would pin bands at 8 bits (256 values —
       bucket size grows LINEARLY with corpus, candidates
       quadratically), so it uses Manku-style multi-table banding
       instead: 9 blocks (one 8-bit + eight 7-bit), one table per
       block PAIR — C(9,2) = 36 compound keys of 14–15 bits. Two
       signatures within Hamming 7 differ in at most 7 blocks, hence
       agree exactly on ≥ 2 of the 9, hence share at least one
       compound key: recall stays deterministically 1.0 while bucket
       cardinality grows from 2⁸ to ≥ 2¹⁴ per table.
    3. Bucketed self-join on (table, key) at the SIGNATURE level
       (s1 ≤ s2 keeps same-signature clusters), pair dedup across
       tables on the small sig-pair set, exact bit_count rescore,
       then expansion joins back to doc ids.

    `max_bucket` (None = off, exact semantics — what the oracle
    states) drops hot buckets before the join, counted in DOCS
    (cluster-weighted), exactly the pre-compression semantics: at
    corpus scale dropping a mega-cluster's buckets is the same stated
    recall sacrifice as LSH stop-bucket removal."""
    if max_hamming == 7:
        widths = [8] + [7] * 8
        offs, acc = [], 0
        for w in widths:
            offs.append(acc)
            acc += w

        def _block(i: int):
            return F.shiftright("simhash", offs[i]).bitwiseAND(
                F.lit((1 << widths[i]) - 1)
            )

        from itertools import combinations

        band_keys = [
            F.struct(
                F.lit(t).alias("band"),
                (_block(i) * F.lit(1 << widths[j]) + _block(j)).alias("v"),
            )
            for t, (i, j) in enumerate(combinations(range(9), 2))
        ]
    else:
        n_bands = max_hamming + 1
        if 64 % n_bands:
            raise ValueError("max_hamming must be one of 1, 3, 7, 15")
        width = 64 // n_bands
        mask = (1 << width) - 1
        band_keys = [
            F.struct(
                F.lit(i).alias("band"),
                F.shiftright("simhash", width * i)
                .bitwiseAND(F.lit(mask)).alias("v"),
            )
            for i in range(n_bands)
        ]
    sig = simhash64(docs).localCheckpoint(eager=False)
    usig = sig.groupBy("simhash").agg(F.count(F.lit(1)).alias("_n"))
    bands = usig.select(
        "simhash", "_n",
        F.explode(F.array(*band_keys)).alias("bv"),
    ).select("simhash", "_n", "bv.band", "bv.v")
    if max_bucket is not None:
        sizes = bands.groupBy("band", "v").agg(F.sum("_n").alias("_sz"))
        bands = bands.join(
            sizes.where(F.col("_sz") <= max_bucket)
            .select("band", "v"),
            ["band", "v"], "left_semi",
        )
    left = bands.select("band", "v", F.col("simhash").alias("_sa"))
    right = bands.select("band", "v", F.col("simhash").alias("_sb"))
    sig_pairs = (
        left.join(right, ["band", "v"])
        .where(F.col("_sa") <= F.col("_sb"))
        .select("_sa", "_sb")
        .dropDuplicates(["_sa", "_sb"])
        .withColumn(
            "hamming",
            F.bit_count(F.col("_sa").bitwiseXOR(F.col("_sb"))),
        )
        .where(F.col("hamming") <= max_hamming)
    )
    da = sig.select(F.col("simhash").alias("_sa"), F.col("doc_id").alias("_da"))
    db = sig.select(F.col("simhash").alias("_sb"), F.col("doc_id").alias("_db"))
    return (
        sig_pairs.join(da, "_sa").join(db, "_sb")
        .where((F.col("_sa") != F.col("_sb")) | (F.col("_da") < F.col("_db")))
        .select(
            F.least("_da", "_db").alias("a"),
            F.greatest("_da", "_db").alias("b"),
            "hamming",
        )
    )


def edit_distance_pairs(
    docs: DataFrame,
    max_hamming: int = 7,
    prefix: int = 120,
    rel_pct: int = 10,
    max_bucket: int | None = None,
) -> DataFrame:
    """Edit-distance-verified near-duplicate pairs: simhash pigeonhole
    banding generates the candidates (recall 1.0 within
    ``max_hamming`` — see simhash_band_pairs), then an EXACT
    Levenshtein rescore over the first ``prefix`` characters keeps
    pairs with lev ≤ rel_pct% of the longer prefix (integer
    cross-multiplied: lev·100 ≤ rel_pct·max(len_a, len_b)). Returns
    (a, b, lev) — the verifier for boilerplate families whose word
    SETS diverge (so Jaccard misses them) but whose leading bytes are
    near-identical (mirror pages, version-stamped templates).

    Cost shape at 100 TB: Levenshtein is O(prefix²) per PAIR, never
    per corpus row — the banding keeps the pair count near-linear and
    the prefix cap bounds each comparison at a constant; the text
    column joins back onto the candidate pairs only (two
    doc_id-keyed hash joins), so full documents never ride through
    the band shuffle. `max_bucket` forwards to the banding with the
    same mega-cluster recall trade."""
    cand = simhash_band_pairs(docs, max_hamming, max_bucket)
    # Spread the candidates across the cluster BEFORE the rescore: AQE
    # coalesces post-shuffle partitions by BYTE size, and a few million
    # narrow (a, b) rows compress under the advisory target — without
    # this the O(prefix²)-per-row Levenshtein stage runs on ONE task
    # (measured at sf0.1: 1.42M pairs → 1 partition → 179 s single-
    # threaded; repartitioned → ~6 s). Byte-based coalescing can never
    # see per-row CPU cost, so the explicit exchange is the correct
    # plan at every scale, not a local-mode workaround.
    cand = cand.repartition(
        max(docs.sparkSession.sparkContext.defaultParallelism, 8)
    )
    pa = docs.select(
        F.col("doc_id").alias("a"),
        F.substring("text", 1, prefix).alias("_ta"),
    )
    pb = docs.select(
        F.col("doc_id").alias("b"),
        F.substring("text", 1, prefix).alias("_tb"),
    )
    lev = F.levenshtein(F.col("_ta"), F.col("_tb"))
    return (
        cand.join(pa, "a").join(pb, "b")
        .withColumn("lev", lev.cast("long"))
        .where(
            F.col("lev") * 100
            <= F.lit(rel_pct)
            * F.greatest(F.length("_ta"), F.length("_tb"))
        )
        .select("a", "b", "lev")
    )


def duplicated_sentences(docs: DataFrame, min_docs: int = 2) -> DataFrame:
    """(sent_hash, n_docs, n_occurrences, canonical_doc, sentence):
    sentences appearing in ≥ ``min_docs`` DISTINCT documents — the
    CCNet paragraph-dedup decision table (CCNet dedups at
    paragraph/sentence granularity BEFORE document-level near-dup, so
    boilerplate shared across sites — cookie banners, nav footers —
    dies even when the surrounding documents differ). Sentence
    boundaries come from ops/text.split_sentences' regex (the shared
    sentence contract, unlike dedup_spans' fixed-n word windows);
    canonical_doc is the smallest containing doc_id and `sentence`
    rides along for the removal join. One explode + one md5-keyed
    groupBy with map-side combine (occurrences collapse per doc
    first is NOT done — n_occurrences counts total repeats, the
    cross-doc count is count_distinct); output is bounded by
    duplicated sentences, tiny vs the corpus."""
    from .text import split_sentences

    s = split_sentences(docs).select(
        "doc_id", "sentence", F.md5("sentence").alias("sent_hash")
    )
    return (
        s.groupBy("sent_hash")
        .agg(
            F.count_distinct("doc_id").alias("n_docs"),
            F.count(F.lit(1)).alias("n_occurrences"),
            F.min("doc_id").alias("canonical_doc"),
            F.min("sentence").alias("sentence"),
        )
        .where(F.col("n_docs") >= min_docs)
    )


def cdc_chunks(
    docs: DataFrame,
    window: int = 8,
    mask_bits: int = 6,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Content-defined chunking (Rabin-style rolling hash): split each
    document at positions where the hash of the trailing ``window``
    characters lands on a zero residue — boundaries are decided by
    CONTENT, so an insertion early in a document shifts chunk
    boundaries only locally (the property byte-offset chunking lacks)
    and identical passages chunk identically across documents. The
    storage/dedup primitive behind chunk-level dedup of near-identical
    crawls and incremental corpus snapshots.

    Boundary rule (stateless per position → embarrassingly parallel
    and SQL-restatable): after 1-based position i ≥ window iff
    H(i) = (Σ_{j=0..w-1} code(s[i-j])·31^j) mod 2^30 ≡ 0 (mod 2^m).
    Expected chunk length 2^m = 64 chars at the defaults. No
    min/max-length clamps (FastCDC's clamps make the rule stateful;
    the plain Rabin rule keeps every position independent).

    Output: (doc_id, chunk_idx, chunk_len, chunk_md5). The kernel is
    a vectorized Arrow batch (numpy sliding-window dot with the power
    table — one pass per doc, no per-char Python loop); cross-doc
    chunk grouping stays in DataFrame algebra downstream."""
    from typing import Iterator

    import numpy as np
    import pandas as pd
    from pyspark.sql.types import (
        LongType, StringType, StructField, StructType,
    )

    mask = (1 << mask_bits) - 1
    mod = 1 << 30
    powers = np.array(
        [pow(31, j, mod) for j in range(window - 1, -1, -1)],
        dtype=np.int64,
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _h

        for pdf in batches:
            ids: list[int] = []
            idxs: list[int] = []
            lens: list[int] = []
            digests: list[str] = []
            for rid, text in zip(pdf[id_col], pdf[text_col]):
                s = "" if text is None else str(text)
                n = len(s)
                bounds: list[int] = []
                if n >= window:
                    codes = np.frombuffer(
                        s.encode("utf-32-le"), dtype=np.uint32
                    ).astype(np.int64)
                    win = np.lib.stride_tricks.sliding_window_view(
                        codes, window
                    )
                    h = (win @ powers) % mod
                    # windows end at positions window..n (1-based)
                    bounds = (np.nonzero((h & mask) == 0)[0]
                              + window).tolist()
                prev = 0
                ci = 0
                for e in bounds + ([n] if (not bounds or
                                           bounds[-1] != n) else []):
                    chunk = s[prev:e]
                    if chunk == "" and n > 0:
                        prev = e
                        continue
                    ids.append(int(rid))
                    idxs.append(ci)
                    lens.append(len(chunk))
                    digests.append(
                        _h.md5(chunk.encode("utf-8")).hexdigest())
                    ci += 1
                    prev = e
            yield pd.DataFrame({
                "doc_id": ids, "chunk_idx": idxs,
                "chunk_len": lens, "chunk_md5": digests,
            })

    schema = StructType([
        StructField("doc_id", LongType(), False),
        StructField("chunk_idx", LongType(), False),
        StructField("chunk_len", LongType(), False),
        StructField("chunk_md5", StringType(), False),
    ])
    return docs.select(id_col, text_col).mapInPandas(run, schema)


def cdc_shared_stats(chunks: DataFrame) -> DataFrame:
    """Per-document chunk-sharing profile over a cdc_chunks frame:
    (doc_id, n_chunks, n_shared_chunks) where a chunk is shared iff
    its md5 occurs in ≥ 2 DISTINCT documents — the chunk-level
    containment signal (partial near-dups, boilerplate reuse) that
    whole-doc hashing misses. Two vocabulary-of-chunks-sized
    aggregates; the per-chunk doc count joins back broadcast-style."""
    occ = chunks.groupBy("chunk_md5").agg(
        F.count_distinct("doc_id").alias("n_docs"))
    return (
        chunks.join(occ, "chunk_md5")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum(F.when(F.col("n_docs") >= 2, 1).otherwise(0))
            .cast("bigint").alias("n_shared_chunks"),
        )
    )


def chunk_store_delta(
    chunks_old: DataFrame, chunks_new: DataFrame
) -> DataFrame:
    """Content-defined chunk STORE delta between two corpus snapshots
    (the storage question CDC chunking exists to answer): one row
    (n_new_chunks, new_chars, n_reused_chunks, reused_chars) over the
    new snapshot's DISTINCT chunks — a chunk already in yesterday's
    store costs nothing to ingest; only content-novel chunks add
    payload (reported in characters — the fixture corpus is ASCII). Because boundaries are content-defined, an insertion early
    in a document re-uses every chunk after the next boundary —
    byte-offset chunking would re-store the whole tail. Inputs are
    cdc_chunks frames; digests are md5 (collision-free at corpus
    scale), so (digest → length) is a function and DISTINCT pairs are
    well-defined.

    Plan: two digest-level distincts + one left join keyed on the
    digest + one aggregate — all narrow keys, store-sized not
    corpus-sized."""
    old = chunks_old.select("chunk_md5").dropDuplicates(["chunk_md5"]) \
        .withColumn("_in_old", F.lit(1))
    newd = chunks_new.select("chunk_md5", "chunk_len") \
        .dropDuplicates(["chunk_md5"])
    j = newd.join(old, "chunk_md5", "left")
    reused = F.col("_in_old").isNotNull()
    return j.agg(
        F.sum(F.when(~reused, 1).otherwise(0)).cast("bigint")
        .alias("n_new_chunks"),
        F.sum(F.when(~reused, F.col("chunk_len")).otherwise(0))
        .cast("bigint").alias("new_chars"),
        F.sum(F.when(reused, 1).otherwise(0)).cast("bigint")
        .alias("n_reused_chunks"),
        F.sum(F.when(reused, F.col("chunk_len")).otherwise(0))
        .cast("bigint").alias("reused_chars"),
    )


def boilerplate_chunks(
    chunks: DataFrame,
    docs_meta: DataFrame,
    group_col: str = "source",
    min_share_pct: int = 50,
) -> DataFrame:
    """Boilerplate detection at chunk granularity (the trafilatura-
    style template-removal question, answered with the CDC chunk
    algebra instead of DOM heuristics): a chunk is BOILERPLATE within
    a group (site/host/source) iff it occurs in ≥ ``min_share_pct`` %
    of the group's documents AND in at least two documents (a
    single-page site must not mark its entire content as template —
    the standard minimum-support guard) — navigation, footers, and
    legal text chunk identically across a site's pages because
    boundaries are content-defined. Output per document: (doc_id, n_chunks,
    n_boiler_chunks, boiler_chars) — the content-to-template ratio a
    curation pass thresholds on. The threshold is integer
    cross-multiplied (nd·100 ≥ pct·ng), never a float share.

    Plan: one distinct (group, chunk, doc) projection → per-(group,
    chunk) doc counts joined against broadcast group sizes → flag
    joined back to the chunk stream on the digest key; aggregates are
    chunk-vocabulary-sized."""
    meta = docs_meta.select("doc_id", F.col(group_col).alias("_grp"))
    ch = chunks.join(meta, "doc_id")
    grp_sizes = meta.groupBy("_grp").agg(
        F.count(F.lit(1)).alias("_ng"))
    presence = (
        ch.select("_grp", "chunk_md5", "doc_id")
        .dropDuplicates(["_grp", "chunk_md5", "doc_id"])
        .groupBy("_grp", "chunk_md5")
        .agg(F.count(F.lit(1)).alias("_nd"))
    )
    boiler = (
        presence.join(F.broadcast(grp_sizes), "_grp")
        .where((F.col("_nd") >= 2)
               & (F.col("_nd") * 100
                  >= F.lit(min_share_pct) * F.col("_ng")))
        .select("_grp", "chunk_md5", F.lit(1).alias("_boiler"))
    )
    return (
        ch.join(boiler, ["_grp", "chunk_md5"], "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_chunks"),
            F.sum(F.when(F.col("_boiler").isNotNull(), 1).otherwise(0))
            .cast("bigint").alias("n_boiler_chunks"),
            F.sum(F.when(F.col("_boiler").isNotNull(),
                         F.col("chunk_len")).otherwise(0))
            .cast("bigint").alias("boiler_chars"),
        )
    )
