"""TF-IDF and BM25 relevance scoring over the documents table.

Training-data pipelines use lexical ranking in two places: selecting
in-domain documents against a seed query (data selection à la
Brown et al. 2020's quality classifier baselines) and keyword-driven
corpus audits. Both reduce to the classic sparse ranking functions:

- tf-idf per (doc, term): tf * ln(N / df)
- BM25 (Robertson/Spärck Jones): idf * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))
  with idf = ln(1 + (N - df + 0.5)/(df + 0.5))

Scale design: ONE explode scan of the corpus produces (doc, word, tf)
with map-side partial aggregation; document frequencies are a groupBy
over the distinct (word, doc) stream. The df table is vocabulary-sized
— orders of magnitude smaller than the corpus — so the tf⋈df join is a
broadcast, never a shuffle of the corpus. Scalars (N, avgdl) ride in
as literals computed from one count aggregate. Every arithmetic input
(tf, df, N, dl) is an exact integer, so the float scores are identical
deterministic functions of integers on any engine and any partitioning
— the DuckDB oracles compute the same closed forms.

Tokenization is the shared `word_array` contract from ops/text.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import word_array


def _term_freqs(docs: DataFrame) -> DataFrame:
    """(doc_id, word, tf) — one explode scan, map-side combined."""
    return (
        docs.select("doc_id", F.explode(word_array()).alias("word"))
        .where(F.col("word") != "")
        .groupBy("doc_id", "word")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def doc_freqs(tf: DataFrame) -> DataFrame:
    """(word, df) from the term-frequency stream — vocabulary-sized."""
    return tf.groupBy("word").agg(F.count(F.lit(1)).alias("df"))


def tfidf_topk(docs: DataFrame, k: int = 3, min_df: int = 2) -> DataFrame:
    """Top-k characteristic terms per document by tf-idf.

    (doc_id, word, tf, score) with score = tf * ln(N/df), ranked per
    doc by (score desc, word asc) — the deterministic tie-break makes
    the result engine-exact. min_df drops hapax noise (which would
    otherwise dominate with the max idf). The per-doc top-k window
    partitions on doc_id — millions of small groups, no skew.
    """
    n_docs = docs.count()  # one scalar aggregate, rides in as a literal
    tf = _term_freqs(docs)
    df = doc_freqs(tf).where(F.col("df") >= min_df)
    scored = tf.join(F.broadcast(df), "word").select(
        "doc_id",
        "word",
        "tf",
        (F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df")))
        .alias("score"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy(
        F.desc("score"), F.asc("word")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("doc_id", "word", "tf", "score", "rank")
    )


def first_relevant_rank(docs: DataFrame, terms: tuple) -> DataFrame:
    """(term, n_ranked, first_rel_rank): the retrieval-eval primitive
    behind MRR/recall@k — for each query term, rank every doc
    containing it by (tf desc, doc_id asc) and report the rank of the
    first doc whose boolean `rel` label is true (NULL when no relevant
    doc ranks). Everything that decides order is an integer, so the
    ranking is engine-exact; MRR itself is the consumer's trivial
    avg(1/first_rel_rank) over this frame. One explode+groupBy scan
    for tf, one window partitioned by term over the term-filtered
    postings (terms are a tiny IN-list → the filter prunes before the
    window shuffle)."""
    from pyspark.sql import Window

    tf = _term_freqs(docs.select("doc_id", "text"))
    labels = docs.select("doc_id", "rel")
    hits = tf.where(F.col("word").isin(*terms)).join(labels, "doc_id")
    w = Window.partitionBy("word").orderBy(
        F.desc("tf"), F.asc("doc_id")
    )
    return (
        hits.withColumn("rank", F.row_number().over(w))
        .groupBy(F.col("word").alias("term"))
        .agg(
            F.count(F.lit(1)).alias("n_ranked"),
            F.min(F.when(F.col("rel"), F.col("rank")))
            .alias("first_rel_rank"),
        )
    )


def bm25_scores(
    docs: DataFrame,
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """BM25 score of every matching document against a bag-of-words
    query: (doc_id, n_matched, score), documents with no query term
    omitted.

    The query-term set is a literal handful — the tf stream is filtered
    to it FIRST (predicate on the exploded word, pushed below the
    aggregation), so everything after the one corpus scan is
    query-matches-sized. dl (doc length in words) and avgdl derive from
    the same tokenization; avgdl is kept exact as the integer pair
    (total_len, n_docs) and the division happens once inside the score
    expression, so the float is a pure function of integers.
    """
    terms = [t for t in query_terms if t]
    lens = docs.select(
        "doc_id",
        F.size(F.filter(word_array(), lambda w: w != "")).alias("dl"),
    )
    totals = lens.agg(
        F.sum("dl").alias("total_len"), F.count(F.lit(1)).alias("n")
    ).collect()[0]
    n_docs, total_len = totals["n"], totals["total_len"] or 0

    tf_all = _term_freqs(docs)
    tf_q = tf_all.where(F.col("word").isin(terms))
    df = doc_freqs(tf_q)  # df per query term, ≤ len(terms) rows

    avgdl = F.lit(float(total_len)) / F.lit(float(n_docs))
    idf = F.log(
        F.lit(1.0)
        + (F.lit(float(n_docs)) - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
    )
    tf_term = F.col("tf") * (F.lit(k1) + 1.0)
    norm = F.col("tf") + F.lit(k1) * (
        F.lit(1.0 - b) + F.lit(b) * F.col("dl") / avgdl
    )
    per_term = (
        tf_q.join(F.broadcast(df), "word")
        .join(lens, "doc_id")
        .select("doc_id", "word", (idf * tf_term / norm).alias("s"))
    )
    return per_term.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_matched"),
        F.sum("s").alias("score"),
    )


def bigram_logprob(docs: DataFrame, alpha: float = 1.0) -> DataFrame:
    """Per-document mean negative log-probability under a corpus-level
    BIGRAM LM with add-alpha smoothing — the sharper sibling of
    unigram_logprob (KenLM-style filtering uses n-gram context; the
    bigram model already separates shuffled-word gibberish from
    natural order, which no unigram score can).

    p(w₂|w₁) = (c(w₁w₂) + α) / (c(w₁·) + α·(V+1)) with c(w₁·) the
    count of bigrams headed by w₁ and V the unigram vocabulary size
    (the +1 is the unseen-word slot). Output: (doc_id, n_bigrams, nll)
    with nll = −Σ tf·ln p / Σ tf; documents with fewer than two tokens
    are omitted (no bigram to score).

    Scale design: the bigram-count table is n-gram-vocabulary-sized —
    big at 100 TB but ≪ corpus — and joins the per-doc tf stream on
    the bigram key (Catalyst broadcasts when it fits, sort-merges
    when not; either way the corpus shuffles once, on the bigram).
    Head totals derive from the LM table itself (split on the first
    space — tokens cannot contain spaces by construction), not from a
    second corpus scan. All count inputs are exact integers → the
    floats are engine-identical closed forms."""
    w = word_array()
    base = docs.select("doc_id", w.alias("_w"))
    bgs = base.select(
        "doc_id",
        F.explode(
            F.expr(
                "CASE WHEN size(_w) >= 2 THEN "
                "transform(sequence(1, size(_w) - 1), "
                " i -> concat(element_at(_w, i), ' ', "
                "             element_at(_w, i + 1))) "
                "ELSE cast(array() AS array<string>) END"
            )
        ).alias("bg"),
    )
    tf = bgs.groupBy("doc_id", "bg").agg(F.count(F.lit(1)).alias("tf"))
    lm = tf.groupBy("bg").agg(F.sum("tf").alias("cnt"))
    heads = (
        lm.groupBy(F.substring_index("bg", " ", 1).alias("_w1"))
        .agg(F.sum("cnt").alias("head_cnt"))
    )
    v = (
        docs.select(F.explode(w).alias("_u"))
        .where(F.col("_u") != "")
        .agg(F.count_distinct("_u"))
        .collect()[0][0]
    )
    denom = F.col("head_cnt").cast("double") + F.lit(alpha * (v + 1))
    scored = (
        tf.join(lm, "bg")
        .join(heads, F.substring_index(tf["bg"], " ", 1) == heads["_w1"])
        .select(
            "doc_id",
            "tf",
            (
                F.col("tf")
                * F.log((F.col("cnt") + F.lit(alpha)) / denom)
            ).alias("_lp"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.sum("tf").alias("n_bigrams"),
        (-F.sum("_lp") / F.sum("tf")).alias("nll"),
    )


def hashed_ngram_importance(
    docs: DataFrame,
    is_target,
    prefix_len: int = 3,
    alpha: float = 1.0,
) -> DataFrame:
    """DSIR-style data selection (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): score every document
    by the log importance ratio between a TARGET distribution (the
    in-domain slice selected by the boolean Column ``is_target``) and
    the RAW corpus distribution, both estimated over hashed n-gram
    features. High-scoring documents look like the target domain;
    resampling by this weight skews a 100 TB crawl toward it.

    Features are word unigrams + bigrams hashed into 16**prefix_len
    buckets by md5-hex prefix — a STRING bucket key, so Spark and the
    DuckDB oracle agree byte-for-byte with no integer-conversion
    divergence (same device as ops/sample's threshold sampling).
    Bucket log-ratios use add-alpha smoothing:
    lr(b) = ln((t_b+α)/(T+αB)) − ln((r_b+α)/(R+αB)).
    Output: (doc_id, n_features, logweight) with logweight the
    feature-count-weighted mean of lr over the doc's buckets;
    documents with no tokens are omitted.

    Scale design: ONE explode scan produces the feature stream; both
    distributions are groupBys onto ≤B=16^prefix_len rows, so the
    lr table is broadcast back — the corpus is never shuffled on a
    wide key. All count inputs are exact integers → the float scores
    are engine-identical closed forms (cf. unigram_logprob)."""
    buckets = 16 ** prefix_len
    w = word_array()
    base = docs.select(
        "doc_id", is_target.alias("_t"), w.alias("_w")
    )
    feats = base.select(
        "doc_id",
        "_t",
        F.explode(
            F.concat(
                F.expr("filter(_w, x -> x <> '')"),
                F.expr(
                    "CASE WHEN size(_w) >= 2 THEN "
                    "transform(sequence(1, size(_w) - 1), "
                    " i -> concat(element_at(_w, i), ' ', "
                    "             element_at(_w, i + 1))) "
                    "ELSE cast(array() AS array<string>) END"
                ),
            )
        ).alias("feat"),
    )
    fb = feats.select(
        "doc_id", "_t",
        F.substring(F.md5("feat"), 1, prefix_len).alias("bucket"),
    )
    # collapse the feature stream to (doc, bucket) granularity FIRST
    # (one explode scan, one shuffle); everything else — raw counts,
    # target counts, totals, per-doc scoring — derives from this much
    # smaller frame, checkpointed so the explode runs exactly once
    per_doc = (
        fb.groupBy("doc_id", "_t", "bucket")
        .agg(F.count(F.lit(1)).alias("n"))
        .localCheckpoint(eager=True)
    )
    raw = per_doc.groupBy("bucket").agg(F.sum("n").alias("r"))
    tgt = (
        per_doc.where(F.col("_t"))
        .groupBy("bucket")
        .agg(F.sum("n").alias("t"))
    )
    totals = per_doc.agg(F.sum("n")).collect()[0][0] or 0
    t_total = (
        per_doc.where(F.col("_t")).agg(F.sum("n")).collect()[0][0] or 0
    )
    lr = raw.join(tgt, "bucket", "left").select(
        "bucket",
        (
            F.log(
                (F.coalesce(F.col("t"), F.lit(0)) + F.lit(alpha))
                / F.lit(float(t_total) + alpha * buckets)
            )
            - F.log(
                (F.col("r") + F.lit(alpha))
                / F.lit(float(totals) + alpha * buckets)
            )
        ).alias("lr"),
    )
    return (
        per_doc.join(F.broadcast(lr), "bucket")
        .groupBy("doc_id")
        .agg(
            F.sum("n").alias("n_features"),
            (F.sum(F.col("n") * F.col("lr")) / F.sum("n"))
            .alias("logweight"),
        )
    )


def unigram_logprob(docs: DataFrame, alpha: float = 1.0) -> DataFrame:
    """Per-document mean negative log-probability under a corpus-level
    unigram LM with add-alpha smoothing — the CCNet-style
    perplexity-proxy quality signal (documents scoring far from the
    corpus distribution are boilerplate, gibberish, or wrong-language).

    p(w) = (count(w) + alpha) / (total + alpha * (V + 1)); unseen words
    (possible when scoring against a reference corpus) take the
    count=0 slot. Output: (doc_id, n_words, nll) with
    nll = -Σ tf·ln p(w) / Σ tf; documents with no tokens are omitted
    (they have no distribution to score — gate them on length first).

    Plan: ONE explode scan feeds both the LM counts and the per-doc
    term frequencies (self-derived, so Spark computes the explode
    twice — at 100 TB checkpoint the tf frame and derive both).
    The LM table is vocabulary-sized → BroadcastExchange into the
    scoring join; the scalars (total, V) fold to literals. All p(w)
    inputs are exact integers, so the floats are engine-identical;
    the per-doc Σ is over ≤ distinct-words-per-doc terms, compared
    only after the hash's 6-decimal rounding."""
    tf = _term_freqs(docs)
    lm = tf.groupBy("word").agg(F.sum("tf").alias("cnt"))
    totals = lm.agg(
        F.sum("cnt").alias("total"), F.count(F.lit(1)).alias("v")
    ).collect()[0]
    total, v = totals["total"] or 0, totals["v"]
    denom = F.lit(float(total)) + F.lit(alpha) * F.lit(float(v + 1))
    logp = F.log((F.col("cnt") + F.lit(alpha)) / denom)
    scored = tf.join(F.broadcast(lm), "word").select(
        "doc_id", (F.col("tf") * logp).alias("_lp"), "tf"
    )
    return scored.groupBy("doc_id").agg(
        F.sum("tf").alias("n_words"),
        (-F.sum("_lp") / F.sum("tf")).alias("nll"),
    )


def postings(docs: DataFrame, min_df: int = 2) -> DataFrame:
    """Inverted index over the corpus: (word, df, postings) where
    postings is the doc_id-ascending list "doc:tf,doc:tf,…" — the
    search/audit index a BM25 serving layer consumes, built from the
    same one-explode-scan (doc, word, tf) stream as tf-idf.

    Plan: the tf stream shuffles ONCE on word; collect_list + one
    array_sort inside the aggregate keeps per-word memory bounded by
    that word's document frequency. Ultra-common words are exactly the
    rows a real index shards further (or stoplists); min_df trims the
    hapax tail, which dominates vocabulary size but serves no query.
    Serialized as a string (not array<struct>) so the row is engine-
    portable and oracle-hashable."""
    tf = _term_freqs(docs)
    df = tf.groupBy("word").agg(
        F.count(F.lit(1)).alias("df"),
        F.array_sort(
            F.collect_list(F.struct("doc_id", "tf"))
        ).alias("_p"),
    )
    return (
        df.where(F.col("df") >= min_df)
        .select(
            "word",
            "df",
            F.array_join(
                F.transform(
                    "_p",
                    lambda s: F.concat_ws(
                        ":",
                        s["doc_id"].cast("string"),
                        s["tf"].cast("string"),
                    ),
                ),
                ",",
            ).alias("postings"),
        )
    )


def rrf_fuse(
    ranks_a: DataFrame, ranks_b: DataFrame, k: int = 60
) -> DataFrame:
    """Reciprocal-rank fusion of two retriever rankings: per doc,
    RRF(d) = Σ_lists 1/(k + rank_d). The industry-standard way to
    merge heterogeneous retrievers (lexical + semantic, two indexes,
    two scoring functions) without calibrating their score scales —
    only RANKS enter, so wildly different score distributions fuse
    cleanly.

    Exactness: the fused score is kept as the EXACT RATIONAL
    (rrf_num, rrf_den) — for two lists num = (k+ra)+(k+rb),
    den = (k+ra)(k+rb); single-list docs contribute 1/(k+r) — so the
    hash compare is integer-exact and the float `rrf` column is ONE
    division of those integers (deterministic on any engine).
    Missing-list ranks surface as -1 sentinels, never NULL ints
    (pandas NULL-int → NaN-float stringification hazard).

    Plan: one full-outer join on doc_id — both inputs are
    ranking-sized (top-k or match-filtered), not corpus-sized."""
    a = ranks_a.select(F.col("doc_id"), F.col("rank").alias("_ra"))
    b = ranks_b.select(F.col("doc_id"), F.col("rank").alias("_rb"))
    ka = (F.col("_ra") + F.lit(k)).cast("bigint")
    kb = (F.col("_rb") + F.lit(k)).cast("bigint")
    num = (
        F.when(F.col("_ra").isNotNull() & F.col("_rb").isNotNull(),
               ka + kb)
        .otherwise(F.lit(1).cast("bigint"))
    )
    den = (
        F.when(F.col("_ra").isNotNull() & F.col("_rb").isNotNull(),
               ka * kb)
        .when(F.col("_ra").isNotNull(), ka)
        .otherwise(kb)
    )
    return (
        a.join(b, "doc_id", "full_outer")
        .select(
            "doc_id",
            F.coalesce("_ra", F.lit(-1)).alias("rank_a"),
            F.coalesce("_rb", F.lit(-1)).alias("rank_b"),
            num.alias("rrf_num"),
            den.alias("rrf_den"),
            (num.cast("double") / den.cast("double")).alias("rrf"),
        )
    )


def precision_at_k(docs: DataFrame, terms: tuple, k: int = 5) -> DataFrame:
    """(term, k, n_ranked, n_rel_at_k): exact-integer precision@k per
    query term — rank docs by (tf desc, doc_id asc) (the engine-exact
    ordering first_relevant_rank uses), count relevant among the top
    min(k, n_ranked). P@k = n_rel_at_k / k stays with the consumer —
    the integer numerator is the cross-engine-safe part. One term
    explode + one rank window per term + one aggregate; the rn ≤ k
    predicate gets the WindowGroupLimit map-side cut."""
    from pyspark.sql import Window

    tf = _term_freqs(docs).where(F.col("word").isin(*terms))
    w = Window.partitionBy("word").orderBy(
        F.desc("tf"), F.asc("doc_id")
    )
    ranked = tf.withColumn("rn", F.row_number().over(w))
    return (
        ranked.groupBy(F.col("word").alias("term"))
        .agg(
            F.count(F.lit(1)).alias("n_ranked"),
            F.sum(
                F.when(
                    (F.col("rn") <= k) & (F.col("doc_id") % 13 == 0),
                    1,
                ).otherwise(0)
            ).cast("bigint").alias("n_rel_at_k"),
        )
        .select("term", F.lit(k).cast("bigint").alias("k"),
                "n_ranked", "n_rel_at_k")
    )


def kneser_ney_bigram(docs: DataFrame, min_count: int = 4) -> DataFrame:
    """Interpolated Kneser-Ney bigram probabilities with the classic
    d = 3/4 discount, as EXACT RATIONALS — (w1, w2, c12, kn_num,
    kn_den) where P(w2|w1) = kn_num / kn_den:

        P = max(c12 − 3/4, 0)/c1 + (3/(4·c1))·N1+(w1·)·N1+(·w2)/NB

    multiplied through by 4·c1·NB (NB = distinct bigram types):

        kn_num = (4·c12 − 3)·NB + 3·N1+(w1·)·N1+(·w2)
        kn_den = 4·c1·NB

    Every term is an integer count, so the fraction is bit-identical
    on any engine — the same no-float-ever-compared device as the
    fixed-point PageRank; consumers divide at the edge. The
    continuation counts N1+ are what distinguish KN from add-α: a
    w2 seen after many DIFFERENT heads gets backoff mass even when
    c(w1,w2) = 0 (here only observed bigrams are emitted, where the
    discount term is positive — c12 ≥ 1 ⇒ 4·c12 − 3 ≥ 1).

    Plan: one corpus scan → bigram LM table (n-gram-vocab-sized);
    head totals and both continuation counts derive from the LM
    table itself (group-bys on its two key halves, no second corpus
    scan); NB is one scalar aggregate (bounded driver-side scalar,
    the unigram-LM policy). Output is filtered to c12 ≥ min_count —
    the LM-pruning threshold, applied AFTER the statistics so the
    probabilities are those of the unpruned model."""
    w = word_array()
    base = docs.select("doc_id", w.alias("_w"))
    bgs = base.select(
        F.explode(
            F.expr(
                "CASE WHEN size(_w) >= 2 THEN "
                "transform(sequence(1, size(_w) - 1), "
                " i -> concat(element_at(_w, i), ' ', "
                "             element_at(_w, i + 1))) "
                "ELSE cast(array() AS array<string>) END"
            )
        ).alias("bg"),
    )
    lm = (
        bgs.groupBy("bg")
        .agg(F.count(F.lit(1)).alias("c12"))
        .select(
            F.substring_index("bg", " ", 1).alias("w1"),
            F.substring_index("bg", " ", -1).alias("w2"),
            "c12",
        )
        .localCheckpoint(eager=True)
    )
    nb = lm.count()
    heads = lm.groupBy("w1").agg(
        F.sum("c12").alias("c1"),
        F.count(F.lit(1)).alias("n1_fwd"),
    )
    tails = lm.groupBy("w2").agg(F.count(F.lit(1)).alias("n1_bwd"))
    return (
        lm.where(F.col("c12") >= min_count)
        .join(heads, "w1")
        .join(tails, "w2")
        .select(
            "w1", "w2", "c12",
            ((4 * F.col("c12") - 3) * F.lit(nb)
             + 3 * F.col("n1_fwd") * F.col("n1_bwd"))
            .cast("long").alias("kn_num"),
            (4 * F.col("c1") * F.lit(nb)).cast("long").alias("kn_den"),
        )
    )


def mrr_at_k(ranked: DataFrame, k: int = 10) -> DataFrame:
    """Exact-integer MRR@k over a (term, first_rel_rank) frame (the
    first_relevant_rank output): reciprocal ranks are scaled by
    L = lcm(1..k) so every 1/r with r ≤ k is an INTEGER L/r, ranks
    beyond k (or no relevant doc) contribute 0 — the standard cutoff
    that also makes cross-engine bit-exactness possible (unbounded
    reciprocal sums have unbounded denominators). One row:
    (n_terms, n_hit_at_k, mrr_scaled, scale); MRR = mrr_scaled /
    (scale · n_terms), a division the CONSUMER performs — the same
    num/den charter as rank_rrf and the modularity q_num."""
    import math

    scale = math.lcm(*range(1, k + 1))
    hit = F.col("first_rel_rank").isNotNull() & (
        F.col("first_rel_rank") <= k
    )
    return ranked.agg(
        F.count(F.lit(1)).alias("n_terms"),
        F.sum(F.when(hit, 1).otherwise(0)).cast("bigint")
        .alias("n_hit_at_k"),
        F.sum(
            F.when(hit, F.expr(f"{scale} DIV first_rel_rank"))
            .otherwise(F.lit(0))
        ).cast("bigint").alias("mrr_scaled"),
        F.lit(scale).cast("bigint").alias("scale"),
    )


def ndcg_weight_table(k: int, weight_bits: int = 20) -> list[int]:
    """The fixed integer DCG discount table W[r] = round(2^bits /
    log2(r+1)) for r = 1..k. The table is computed ONCE at build time
    (plain Python floats) and embedded as literals in both the Spark
    plan and the SQL oracle, so neither engine ever evaluates a
    logarithm — the classic device for making a float-weighted metric
    engine-exact (same charter as mrr_at_k's lcm scaling)."""
    import math

    s = 1 << weight_bits
    return [round(s / math.log2(r + 1)) for r in range(1, k + 1)]


def graded_ranking(
    docs: DataFrame, terms: tuple, gain: F.Column
) -> DataFrame:
    """(term, rank, gain): per query term, every doc containing it
    ranked by (tf desc, doc_id asc) — the retrieval frame NDCG grades.
    `gain` is the caller's relevance expression over the doc columns
    (graded labels, not just boolean). Same plan shape as
    first_relevant_rank: term IN-list filter prunes the postings
    before the per-term window shuffle."""
    from pyspark.sql import Window

    tf = _term_freqs(docs.select("doc_id", "text"))
    labels = docs.select("doc_id", gain.cast("bigint").alias("gain"))
    hits = tf.where(F.col("word").isin(*terms)).join(labels, "doc_id")
    w = Window.partitionBy("word").orderBy(F.desc("tf"), F.asc("doc_id"))
    return hits.select(
        F.col("word").alias("term"),
        F.row_number().over(w).alias("rank"),
        "gain",
    )


def ndcg_at_k(ranked: DataFrame, k: int = 10,
              weight_bits: int = 20) -> DataFrame:
    """Exact-integer NDCG@k over a (term, rank, gain) frame: one row
    per term (term, n_ranked, dcg_scaled, idcg_scaled, wscale) with
    dcg_scaled  = Σ_{r≤k} gain_r · W[r]   (observed ranking) and
    idcg_scaled = Σ_{r≤k} gain_(r) · W[r] (gains resorted descending),
    W the ndcg_weight_table literals — NDCG = dcg_scaled/idcg_scaled
    is the CONSUMER's division, so no float ever crosses engines.
    Ideal order ties are gain-equal and thus weight-sum-invariant.

    Plan: two per-term windows over the already-tiny graded frame
    (terms are an IN-list; the frame is matches-sized, not
    corpus-sized), then one groupBy."""
    from pyspark.sql import Window

    wt = ndcg_weight_table(k, weight_bits)
    wexpr = "CASE rk " + " ".join(
        f"WHEN {r + 1} THEN {w}" for r, w in enumerate(wt)
    ) + " ELSE 0 END"
    iw = Window.partitionBy("term").orderBy(
        F.desc("gain"), F.asc("rank")
    )
    g = (
        ranked.withColumn("irank", F.row_number().over(iw))
        .select(
            "term", "gain",
            F.expr(wexpr.replace("rk", "rank")).alias("w_obs"),
            F.expr(wexpr.replace("rk", "irank")).alias("w_ideal"),
        )
    )
    return g.groupBy("term").agg(
        F.count(F.lit(1)).alias("n_ranked"),
        F.sum(F.col("gain") * F.col("w_obs")).cast("bigint")
        .alias("dcg_scaled"),
        F.sum(F.col("gain") * F.col("w_ideal")).cast("bigint")
        .alias("idcg_scaled"),
        F.lit(1 << weight_bits).cast("bigint").alias("wscale"),
    )


def ap_at_k(ranked: DataFrame, k: int = 10) -> DataFrame:
    """Exact-integer average precision @k over a (term, rank, rel)
    frame: AP = (1/R) Σ_{i hit, i≤k} precision@i with precision@i =
    hits_at_i / i — scaled by L = lcm(1..k) so each term
    hits_at_i · (L DIV i) is an INTEGER. One row per term (term,
    n_ranked, n_rel, n_rel_at_k, ap_scaled, scale); AP = ap_scaled /
    (scale · min(n_rel, k)) is the CONSUMER's division — n_rel is
    R, the TOTAL relevant count in the ranked frame, emitted so the
    denominator is computable even when relevant items rank below k.
    Completes the eval family (precision@k, MRR, NDCG, recall) with
    the order-sensitive mean — same lcm charter as mrr_at_k.

    Plan: one per-term window (running hit count) + one aggregate."""
    import math

    from pyspark.sql import Window

    scale = math.lcm(*range(1, k + 1))
    w = (
        Window.partitionBy("term").orderBy("rank")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    g = ranked.withColumn(
        "hits_at", F.sum(F.when(F.col("rel"), 1).otherwise(0)).over(w)
    )
    contrib = F.when(
        F.col("rel") & (F.col("rank") <= k),
        F.col("hits_at") * F.expr(f"{scale} DIV rank"),
    ).otherwise(F.lit(0))
    return g.groupBy("term").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_ranked"),
        F.sum(F.when(F.col("rel"), 1).otherwise(0))
        .cast("bigint").alias("n_rel"),
        F.sum(F.when(F.col("rel") & (F.col("rank") <= k), 1)
              .otherwise(0)).cast("bigint").alias("n_rel_at_k"),
        F.sum(contrib).cast("bigint").alias("ap_scaled"),
        F.lit(scale).cast("bigint").alias("scale"),
    )


def kendall_topk(ra: DataFrame, rb: DataFrame) -> DataFrame:
    """Kendall rank correlation between two rankings of the same
    items, exact integers: inputs are (term, rank, doc_id) frames;
    over the docs BOTH rankings contain, count concordant and
    discordant pairs — τ = (C − D)/(C + D + T) is consumer
    arithmetic (ties on either side counted separately). The ranker-
    agreement audit run when swapping a scorer (tf → BM25 → learned):
    a low τ on held-out queries means the swap reorders results, not
    just rescores them.

    Plan: one (term, doc) equi-join aligns the rankings, one
    per-term self-join on doc_id < doc_id2 enumerates pairs — the
    inputs are top-k lists, so the pair frame is k²-bounded per term,
    never corpus-sized."""
    a = ra.select("term", F.col("doc_id"), F.col("rank").alias("ra"))
    b = rb.select("term", F.col("doc_id"), F.col("rank").alias("rb"))
    both = a.join(b, ["term", "doc_id"])
    lhs = both.select("term", F.col("doc_id").alias("d1"),
                      F.col("ra").alias("ra1"), F.col("rb").alias("rb1"))
    rhs = both.select("term", F.col("doc_id").alias("d2"),
                      F.col("ra").alias("ra2"), F.col("rb").alias("rb2"))
    pairs = lhs.join(rhs, "term").where(F.col("d1") < F.col("d2"))
    sgn_a = F.signum(F.col("ra2") - F.col("ra1"))
    sgn_b = F.signum(F.col("rb2") - F.col("rb1"))
    return pairs.groupBy("term").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.sum(F.when(sgn_a * sgn_b > 0, 1).otherwise(0))
        .cast("bigint").alias("n_concordant"),
        F.sum(F.when(sgn_a * sgn_b < 0, 1).otherwise(0))
        .cast("bigint").alias("n_discordant"),
    )
