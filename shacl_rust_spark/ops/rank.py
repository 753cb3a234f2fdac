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
    n_docs, total_len = totals["n"], totals["total_len"]

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
    total, v = totals["total"], totals["v"]
    denom = F.lit(float(total)) + F.lit(alpha) * F.lit(float(v + 1))
    logp = F.log((F.col("cnt") + F.lit(alpha)) / denom)
    scored = tf.join(F.broadcast(lm), "word").select(
        "doc_id", (F.col("tf") * logp).alias("_lp"), "tf"
    )
    return scored.groupBy("doc_id").agg(
        F.sum("tf").alias("n_words"),
        (-F.sum("_lp") / F.sum("tf")).alias("nll"),
    )
