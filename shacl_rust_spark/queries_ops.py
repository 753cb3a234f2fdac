"""Driver-gate queries for the training-data operators (ops/)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .ops import (
    ann, cluster, contamination, dedup, events, graph, multimodal, pack,
    pii, rank, sample, sketch, text, web,
)
from .pipeline import pages as kg_pages_mod


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


# Per-(session, sf_dir) memo of shared derived graph inputs: 17 gates
# consume the SAME Jaccard ≥ 0.8 near-dup pair graph over documents
# (and four more its minhash-LSH twin), but the driver gate and the
# bench call each query separately — without sharing, every gate
# re-pays the quadratic verify-twin pair computation (the round-4
# bench's dominant graph-gate cost). Same device as queries_kg's stage
# memo; checkpointed once per session+sf_dir. This also mirrors the
# production shape at 100 TB: the pair graph is built once and
# persisted, downstream graph analytics read it.
_SHARED_CACHE: dict = {}


def _shared(spark: SparkSession, sf_dir: str, key: str, build) -> DataFrame:
    ck = (id(spark), sf_dir, key)
    if ck not in _SHARED_CACHE:
        _SHARED_CACHE[ck] = build().localCheckpoint(eager=True)
    return _SHARED_CACHE[ck]


def _jaccard_pairs08(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-shared exact Jaccard ≥ 0.8 near-dup pair graph."""
    return _shared(
        spark, sf_dir, "jaccard08",
        lambda: dedup.jaccard_pairs(_docs(spark, sf_dir), 0.8),
    )


def _minhash_pairs08(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-shared minhash-LSH ≥ 0.8 near-dup pair graph."""
    return _shared(
        spark, sf_dir, "minhash08",
        lambda: dedup.minhash_lsh_pairs(_docs(spark, sf_dir), 0.8),
    )


# --- dedup ---------------------------------------------------------------

def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup on a 40-char-prefix normalization key."""
    return dedup.exact_duplicates(
        _docs(spark, sf_dir), F.substring("text", 1, 40)
    )


def dedup_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-source word-set Jaccard ≥ 0.8 pairs (exact verify path)."""
    return _jaccard_pairs08(spark, sf_dir)


def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Minhash-LSH blocked near-dup pairs at Jaccard ≥ 0.8 (scale path;
    banding is a recall filter, rescoring is exact)."""
    return _minhash_pairs08(spark, sf_dir)


def dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-sided containment pairs at 0.9 (ops/dedup.containment_pairs):
    docs whose word set is ≥90% inside another doc's — quote/subset
    duplicates symmetric Jaccard misses."""
    return dedup.containment_pairs(_docs(spark, sf_dir), 0.9)


def dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily-crawl incremental dedup (ops/dedup.incremental_new_docs):
    even doc_ids play the already-ingested corpus (their 40-char
    prefix keys are the persisted state), odd doc_ids are the new
    batch; keep only genuinely new documents, batch-internal dups
    collapsed to the smallest doc_id."""
    d = _docs(spark, sf_dir)
    key = F.substring("text", 1, 40)
    seen = (
        d.where(F.col("doc_id") % 2 == 0)
        .select(key.alias("k"))
        .distinct()
    )
    out = dedup.incremental_new_docs(
        d.where(F.col("doc_id") % 2 == 1), seen, key
    )
    return out.select("doc_id", "lang", "n_chars")


def dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate document CLUSTERS: the minhash-LSH pair set as an
    undirected edge set → connected components (the same CC operator the
    KG pipeline uses for sameAs canonicalization), component = min
    doc_id of the cluster. Gives the canonical-representative mapping a
    dedup pass applies with one anti-join; only documents with at least
    one near-dup partner appear. doc_ids ride zero-padded through the
    string-keyed CC so lexicographic min == numeric min."""
    from .pipeline import cc

    pairs = _minhash_pairs08(spark, sf_dir)
    pad = lambda c: F.lpad(c.cast("string"), 12, "0")  # noqa: E731
    labels = cc.connected_components(
        pairs.select(pad(F.col("a")).alias("src"),
                     pad(F.col("b")).alias("dst"))
    )
    return labels.select(
        F.col("node").cast("bigint").alias("doc_id"),
        F.col("component").cast("bigint").alias("component"),
    )


def corpus_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite training-corpus curation — the end-to-end selection
    pass a web-scale pipeline runs, composed from the already
    oracle-checked operators:

      1. quality gate (text.quality_scores: ≥20 words, ≥5% stopwords)
      2. language gate (text.lang_id == 'en')
      3. exact dedup among survivors (min doc_id per 40-char prefix)
      4. near-dup pruning (minhash-LSH pairs over survivors →
         connected components → keep each cluster's min doc_id)

    Stages 1-2 are flag columns in ONE scan (quality_scores/lang_id
    with keep= passthrough — no doc_id self-joins); 3 is one
    groupBy + left-semi; 4 reuses the KG pipeline's CC operator.
    Returns the kept doc_ids."""
    from .pipeline import cc

    docs = _docs(spark, sf_dir)
    s1 = (
        text.lang_id(
            text.quality_scores(docs, keep=("text", "source"))
            .where("is_quality")
            .select("doc_id", "text", "source"),
            keep=("text", "source"),
        )
        .where(F.col("predicted_lang") == "en")
        .select("doc_id", "text", "source")
    )
    canon = (
        s1.groupBy(F.substring("text", 1, 40).alias("_k"))
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    s2 = s1.join(canon, "doc_id", "left_semi")
    pairs = dedup.minhash_lsh_pairs(s2, 0.8)
    pad = lambda c: F.lpad(c.cast("string"), 12, "0")  # noqa: E731
    labels = cc.connected_components(
        pairs.select(pad(F.col("a")).alias("src"),
                     pad(F.col("b")).alias("dst"))
    )
    non_rep = labels.where(F.col("node") != F.col("component")).select(
        F.col("node").cast("bigint").alias("doc_id")
    )
    return s2.join(non_rep, "doc_id", "left_anti").select("doc_id")


def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit simhash per document (near-dup = small Hamming distance)."""
    return dedup.simhash64(_docs(spark, sf_dir))


def dedup_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs: same-label cosine ≥ 0.35 (demo-scale
    threshold — the synthetic vectors have no near-1 pairs)."""
    e = _emb(spark, sf_dir)
    a = e.select(F.col("vec_id").alias("a"), F.col("label"),
                 F.col("embedding").alias("_ea"))
    b = e.select(F.col("vec_id").alias("b"), F.col("label"),
                 F.col("embedding").alias("_eb"))
    joined = a.join(b, "label").where(F.col("a") < F.col("b"))
    scored = ann.with_cosine(joined, "_ea", "_eb", "_cos")
    return (
        scored.where(F.round("_cos", 6) >= 0.35)
        .select("a", "b")
    )


def dedup_embedding_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded sibling of dedup_embedding: random-hyperplane LSH buckets
    + exact rescore (ops/dedup.embedding_lsh_pairs). Same semantics —
    same-label cosine ≥ 0.35 — so the all-pairs SQL is its oracle; at
    scale the bucketed join replaces the quadratic within-label join."""
    return dedup.embedding_lsh_pairs(_emb(spark, sf_dir), 0.35)


# --- similarity search ---------------------------------------------------

def ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _emb(spark, sf_dir)
    q = e.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    return ann.cosine_topk(e, q, k=5)


def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _emb(spark, sf_dir)
    q = e.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    return ann.ivf_topk(e, q, k=5)


# --- text analysis -------------------------------------------------------

def text_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text.token_counts(_docs(spark, sf_dir))


def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text.quality_scores(_docs(spark, sf_dir))


def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text.lang_id(_docs(spark, sf_dir))


def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text.fingerprints(_docs(spark, sf_dir))


# --- curation: sampling / PII / repetition / domains (round 3) ------------

def curation_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 10% hash sample (ops/sample.deterministic_sample):
    keep iff md5('r3' || doc_id)[:8] < '19999999' — a pure map, exactly
    reproducible; the oracle runs the identical expression in DuckDB
    (md5 is engine-independent)."""
    return sample.deterministic_sample(
        _docs(spark, sf_dir), 0.1, salt="r3"
    ).select("doc_id", "lang")


def curation_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language mixing rates (ops/sample.mix_sources): en 0.5,
    zh 1.0, everything else 0.25 — the data-mixing recipe as one
    filtered scan with a CASE threshold."""
    return sample.mix_sources(
        _docs(spark, sf_dir), {"en": 0.5, "zh": 1.0}, default_rate=0.25
    ).select("doc_id", "lang")


def curation_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scan + redaction (ops/pii) over documents with
    deterministically planted PII (base corpus text is digit- and
    @-free, verified, so the oracle is CLOSED FORM: counts are the
    plant indicators and the redacted text is the base text with typed
    placeholders — pinning the regexes against hand-derived truth)."""
    d = _docs(spark, sf_dir)
    did = F.col("doc_id")
    aug = d.withColumn("text", F.concat(
        F.col("text"),
        F.when(did % 3 == 0, F.concat(
            F.lit(" contact user"), did.cast("string"),
            F.lit("@mail.example.com"),
        )).otherwise(F.lit("")),
        F.when(did % 5 == 0, F.concat(
            F.lit(" call +1-"), (100 + did % 900).cast("string"),
            F.lit("-555-"), (1000 + did % 9000).cast("string"),
        )).otherwise(F.lit("")),
        F.when(did % 7 == 0, F.concat(
            F.lit(" ip 10.0."), (did % 256).cast("string"),
            F.lit("."), (did % 250).cast("string"),
        )).otherwise(F.lit("")),
    ))
    # has_pii projected as int: the oracle-compare stringifies python
    # bools as "true"/"false" but pandas-fetched DuckDB booleans as
    # numpy bools — ints sidestep the dialect
    return (
        pii.pii_scan(aug).join(pii.pii_redact(aug), "doc_id")
        .withColumn("has_pii", F.col("has_pii").cast("int"))
    )


def curation_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition signals (ops/text.repetition_stats):
    integer-exact word/bigram totals, distinct counts, and top-gram
    counts per document."""
    return text.repetition_stats(_docs(spark, sf_dir))


def curation_domain_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-registrable-domain page counts (ops/web.domain_stats) over
    the synthetic crawl (hosts exN.test + docs.test)."""
    return web.domain_stats(kg_pages_mod.pages(spark, sf_dir))


def curation_domain_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style per-domain cap (ops/web.cap_per_domain): keep at most 5
    pages per domain, deterministically by normalized URL — the oracle
    replays the same window over the closed-form URL formulas."""
    capped = web.cap_per_domain(kg_pages_mod.pages(spark, sf_dir), 5)
    return capped.select("url", "domain")


def curation_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination (ops/contamination): docs with
    doc_id % 97 == 0 play the evaluation set; every other document
    sharing a word n-gram with it is flagged with its gram counts.
    n=4 here — real deployments use n≈8-13, but the synthetic corpus's
    tiny vocabulary makes 4-grams the realistic analog (8 docs flagged
    at sf0.01 vs zero at n=8). Oracle recomputes the same n-gram join
    in DuckDB."""
    d = _docs(spark, sf_dir)
    bench = d.where(F.col("doc_id") % 97 == 0)
    corpus = d.where(F.col("doc_id") % 97 != 0)
    return contamination.contaminated_docs(corpus, bench, n=4)


def pack_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window chunking (ops/pack.chunk_documents): 64-token
    windows with 16-token overlap, as a pure-Column sequence-explode —
    the oracle recomputes chunk count, boundaries, and joined text from
    the same slicing formulas."""
    return pack.chunk_documents(_docs(spark, sf_dir), 64, 16)


def pack_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contiguous shard packing (ops/pack.assign_shards): documents in
    doc_id order fill 5000-token shards; the distributed two-phase
    prefix sum must agree exactly with the oracle's single global
    window."""
    return pack.assign_shards(_docs(spark, sf_dir), 5000, bucket_width=100)


# --- multimodal / events -------------------------------------------------

def multimodal_sniff(spark: SparkSession, sf_dir: str) -> DataFrame:
    return multimodal.sniff_binary(kg_pages_mod.pages(spark, sf_dir))


def multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end binary decode: deterministic BMP + PNG + GIF + WAV
    payloads are synthesized per document (ops/multimodal.synth_assets),
    then decoded by the REAL pure-Python codecs (bottom-up BMP rows,
    stdlib-zlib PNG inflate + unfiltering across all five filter types,
    GIF variable-width LZW with dictionary growth, RIFF chunk walk)
    inside Arrow mapInPandas. The oracle recomputes every metadata
    field (including the position-sensitive first_px / first_sample)
    in closed form, so a row-order, padding, unfiltering, or LZW
    bit-packing bug in a decoder hash-mismatches."""
    assets = multimodal.synth_assets(_docs(spark, sf_dir))
    # Null numeric columns become float+NaN through pandas-based oracle
    # fetches, so the gate projection uses -1 sentinels for the fields
    # that do not apply to a modality; the library API keeps real nulls.
    return multimodal.decode_assets(assets).na.fill(-1)


def multimodal_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio feature extraction (ops/multimodal.audio_features) over the
    REAL decoded synthetic WAVs: exact-integer energy, peak amplitude,
    zero crossings, highest-energy 16-sample window. The oracle
    recomputes all four in closed form from the sample formula, so an
    off-by-one in windowing or the RIFF walk hash-mismatches."""
    assets = multimodal.synth_assets(_docs(spark, sf_dir))
    return multimodal.audio_features(assets)


def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image resize plumbing: synth BMPs → decode → nearest-neighbor
    2× downsample → re-encode, all inside Arrow mapInPandas. The oracle
    recomputes dims, the sampled-pixel sum, and the re-encoded BMP byte
    size (header + padded stride × rows) in closed form, so sampling
    offsets, rounding, and padding are all pinned."""
    assets = multimodal.synth_assets(_docs(spark, sf_dir))
    return multimodal.resize_images(assets).drop("payload")


def multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame-sampling plumbing: deterministic FVID containers →
    every-2nd-frame decode, exploding each video row to per-frame rows
    inside one Arrow batch."""
    videos = multimodal.synth_videos(_docs(spark, sf_dir))
    return multimodal.sample_frames(videos)


def events_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    return events.windowed_counts(
        spark.read.parquet(f"{sf_dir}/events.parquet")
    )


def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    return events.sessionize(spark.read.parquet(f"{sf_dir}/events.parquet"))


def events_sessionize_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured Streaming twin of events_sessionize: the
    applyInPandasWithState sessionizer over an in-order replay of the
    events table, restricted to the watermark-closed session set (which
    equals the batch output under the same filter — the oracle)."""
    from .streaming.stateful import sessionize_replay_closed

    return sessionize_replay_closed(spark, f"{sf_dir}/events.parquet")


def dedup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring span dedup (ops/dedup.remove_duplicated_spans):
    every 4-word span appearing in >= 2 distinct documents is removed
    corpus-wide and the survivors reassembled — the Lee et al. 2021
    remove-duplicated-spans pass at n-gram granularity. Covers all 500
    sf0.01 docs, ~370 of them partially rewritten."""
    return dedup.remove_duplicated_spans(_docs(spark, sf_dir), n=4,
                                         min_docs=2)


def text_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary with occurrence + document frequencies
    (ops/text.vocabulary) — the tokenizer-training input table."""
    return text.vocabulary(_docs(spark, sf_dir), min_docs=2)


def rank_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 characteristic terms per document by tf-idf
    (ops/rank.tfidf_topk): one explode scan, broadcast df join,
    per-doc window — integer inputs make the float scores
    engine-exact."""
    return rank.tfidf_topk(_docs(spark, sf_dir), k=3, min_df=2)


def rank_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 document scores against a 3-term query
    (ops/rank.bm25_scores): the tf stream is filtered to the query
    terms before aggregation, so post-scan work is matches-sized."""
    return rank.bm25_scores(
        _docs(spark, sf_dir), ["join", "data", "spark"]
    )


def rank_dsir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance weights (ops/rank.hashed_ngram_importance)
    against the English slice as the target domain: documents that
    look like lang='en' text score high; resample by logweight to
    skew the corpus toward the target."""
    return rank.hashed_ngram_importance(
        _docs(spark, sf_dir), is_target=F.col("lang") == "en"
    )


def text_bpe_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-50 adjacent character pairs weighted by word frequency
    (ops/text.bpe_pair_counts) — the count step of the first BPE
    merge over the corpus vocabulary."""
    return text.bpe_pair_counts(_docs(spark, sf_dir), top_k=50)


def text_unigram_nll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc mean negative log-prob under the corpus unigram LM with
    add-1 smoothing (ops/rank.unigram_logprob) — the CCNet-style
    perplexity-proxy quality signal."""
    return rank.unigram_logprob(_docs(spark, sf_dir), alpha=1.0)


def _entity_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed entity graph from the TPC-H-shaped tables — the same
    row→entity links the KG pipeline emits as triples, as a generic
    (src, dst) edge list with type-prefixed node ids (o=order,
    c=customer, s=supplier, p=part, n=nation, r=region)."""
    def tbl(name):
        return spark.read.parquet(f"{sf_dir}/{name}.parquet")

    def edge(df, s_pre, s_col, d_pre, d_col):
        return df.select(
            F.concat(F.lit(s_pre), F.col(s_col).cast("string"))
            .alias("src"),
            F.concat(F.lit(d_pre), F.col(d_col).cast("string"))
            .alias("dst"),
        )

    li = tbl("lineitem")
    return (
        edge(tbl("orders"), "o", "o_orderkey", "c", "o_custkey")
        .unionByName(edge(tbl("customer"), "c", "c_custkey",
                          "n", "c_nationkey"))
        .unionByName(edge(tbl("supplier"), "s", "s_suppkey",
                          "n", "s_nationkey"))
        .unionByName(edge(li, "o", "l_orderkey", "p", "l_partkey"))
        .unionByName(edge(li, "o", "l_orderkey", "s", "l_suppkey"))
        .unionByName(edge(tbl("nation"), "n", "n_nationkey",
                          "r", "n_regionkey"))
    )


def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-100 entities by 6-iteration fixed-point-integer PageRank
    (ops/graph.pagerank) over the typed entity graph — entity salience
    for linking priors. Deterministic tie-break on node id."""
    pr = graph.pagerank(_entity_edges(spark, sf_dir), iterations=6)
    return pr.orderBy(F.desc("rank_scaled"), "node").limit(100)


def graph_degrees(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Joint (out_degree, in_degree) histogram of the typed entity
    graph (ops/graph.degrees) — hub/skew shape at a glance."""
    return (
        graph.degrees(_entity_edges(spark, sf_dir))
        .groupBy("out_degree", "in_degree")
        .agg(F.count(F.lit(1)).alias("n_nodes"))
    )


def sketch_word_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min point estimates for the 20 most frequent words
    (ops/sketch.cms_table + cms_estimate) next to their exact counts —
    cms_n ≥ exact_n always (one-sided error), equal when no bucket
    collision; both engines build the identical counter table."""
    from .ops.text import word_array

    words = (
        _docs(spark, sf_dir)
        .select(F.explode(word_array()).alias("word"))
        .where(F.col("word") != "")
    )
    exact = words.groupBy("word").agg(F.count(F.lit(1)).alias("exact_n"))
    top = exact.orderBy(F.desc("exact_n"), "word").limit(20)
    est = sketch.cms_estimate(
        sketch.cms_table(words, F.col("word")), top, "word"
    )
    return top.join(est, "word")


def pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GPT-style cross-document packing manifest at seq_len=128
    (ops/pack.pack_sequences): each doc's tokens + one EOS laid into
    fixed sequences, docs crossing boundaries."""
    return pack.pack_sequences(_docs(spark, sf_dir), seq_len=128)


def sketch_distinct_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language distinct-word cardinality: deterministic HLL
    estimate (ops/sketch.hll_distinct, 4096 md5-bucketed registers)
    side-by-side with the exact count — the estimate lands within the
    sketch's ~1.6 % standard error, and both engines compute the
    identical register table."""
    from .ops.text import word_array

    words = (
        _docs(spark, sf_dir)
        .select("lang", F.explode(word_array()).alias("word"))
        .where(F.col("word") != "")
    )
    est = sketch.hll_distinct(words, F.col("word"), group_cols=("lang",))
    exact = words.groupBy("lang").agg(
        F.count_distinct("word").alias("exact_distinct")
    )
    return est.join(exact, "lang")


def curation_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly 100 docs sampled WITHOUT replacement with probability ∝
    n_chars (ops/sample.weighted_sample, Efraimidis–Spirakis keys) —
    'sample biased toward longer documents', engine/rerun-stable."""
    return sample.weighted_sample(
        _docs(spark, sf_dir), weight_col="n_chars", k=100
    ).select("doc_id", "n_chars", "sample_rank")


def curation_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text cleaning stage (ops/text.normalize_text): per doc the
    normalized length, change flag, and a 32-char preview of the
    canonical form."""
    return text.normalize_text(_docs(spark, sf_dir)).select(
        "doc_id",
        "n_chars_norm",
        "changed",
        F.substring("text_norm", 1, 32).alias("norm_prefix"),
    )


def text_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character entropy + type-token ratio per doc
    (ops/text.char_stats) — gibberish and boilerplate signals."""
    return text.char_stats(_docs(spark, sf_dir))


def text_sentences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sentence segmentation (ops/text.split_sentences) over a
    deterministic 2% md5 sample of the synthesized web pages (the
    documents table is punctuation-free word salad — pages carry real
    multi-sentence prose). Output keyed by url."""
    from .pipeline import pages as pages_mod

    p = pages_mod.pages(spark, sf_dir).select(
        F.col("url").alias("doc_id"), "text"
    )
    p = p.where(
        sample.sample_hash(F.col("doc_id"), "sent") <
        F.lit(sample.rate_threshold(0.02))
    )
    return text.split_sentences(p).withColumnRenamed("doc_id", "url")


def text_bigram_nll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc mean negative log-prob under the corpus bigram LM with
    add-1 smoothing (ops/rank.bigram_logprob) — context-aware quality
    signal; shuffled-word docs score far from natural ones."""
    return rank.bigram_logprob(_docs(spark, sf_dir), alpha=1.0)


def curation_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly 20 docs per language (ops/sample.stratified_sample):
    the 20 smallest sampling hashes per stratum via the skew-safe
    two-phase top-n; rerun/repartition/engine-stable."""
    out = sample.stratified_sample(_docs(spark, sf_dir), 20)
    return out.select("doc_id", "lang", "sample_rank")


def text_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language length distribution summary
    (ops/text.length_quantiles): exact interpolated quantiles +
    integer-exact mean, one digest-sized groupBy."""
    return text.length_quantiles(_docs(spark, sf_dir))


def cluster_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic k-means over the embeddings (ops/cluster.kmeans):
    k=4, two Lloyd's iterations from the k-smallest-id init; the
    oracle unrolls the identical iterations in SQL."""
    return cluster.kmeans(_emb(spark, sf_dir), k=4, iters=2)


def dedup_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (ops/cluster.semantic_dedup): k-means clusters, then
    drop vectors with cosine >= 0.35 to a lower-id cluster-mate —
    the cluster-bounded embedding dedup; the oracle composes the
    unrolled kmeans SQL with the pair join."""
    return cluster.semantic_dedup(_emb(spark, sf_dir), 0.35,
                                  k=4, iters=2)


def events_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (ops/events.asof_join): each click joined to the
    same user's most recent view at-or-before it — the union+window
    composition (one shuffle) standing in for the ASOF JOIN operator
    Spark lacks; the DuckDB oracle states the same semantics
    independently as a range join + row_number pick."""
    return events.asof_join(
        spark.read.parquet(f"{sf_dir}/events.parquet"),
        probe_type="click", ref_type="view",
    )


def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel view→click→purchase (ops/events.funnel): one
    per-user HOF scan; the oracle states the same semantics as the
    min-ts join chain."""
    return events.funnel(spark.read.parquet(f"{sf_dir}/events.parquet"))


def events_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention matrix (ops/events.retention)."""
    return events.retention(
        spark.read.parquet(f"{sf_dir}/events.parquet")
    )


def events_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native ROLLUP over (event_type, day) with grouping_id
    disambiguation (ops/events.rollup_counts)."""
    return events.rollup_counts(
        spark.read.parquet(f"{sf_dir}/events.parquet")
    )


def events_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type mean-ratio outliers (ops/events.value_outliers):
    value > 4× the type mean, cross-multiplied exact comparison."""
    return events.value_outliers(
        spark.read.parquet(f"{sf_dir}/events.parquet"), factor=4
    )


def graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node triangle counts (ops/graph.triangles) over the
    Jaccard ≥ 0.8 near-duplicate pair graph — clique-density as the
    template-family detector on top of the dedup candidate edges."""
    pairs = _jaccard_pairs08(spark, sf_dir)
    return graph.triangles(
        pairs.select(F.col("a").alias("src"), F.col("b").alias("dst"))
    )


def rank_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted index with doc:tf posting strings (ops/rank.postings),
    min_df=2."""
    return rank.postings(_docs(spark, sf_dir), min_df=2)


def text_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frozen-weight logistic quality classifier
    (ops/text.quality_classifier) over the integer quality features."""
    return text.quality_classifier(_docs(spark, sf_dir))


def events_attribution_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream event-time interval join
    (streaming/stream.attribution_replay): views ⋈ clicks of the same
    user within a 30-minute horizon, replayed as two watermarked
    streams; inner-join completeness makes the full replay equal the
    batch range join, which is the oracle."""
    from .streaming.stream import attribution_replay

    return attribution_replay(spark, f"{sf_dir}/events.parquet")


def events_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition counts per user stream
    (ops/events.transitions)."""
    return events.transitions(
        spark.read.parquet(f"{sf_dir}/events.parquet")
    )


def graph_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded 6-round k-core peel at k=3 (ops/graph.k_core) over the
    MINHASH-LSH near-dup pair graph (ops/dedup.minhash_lsh_pairs,
    Jaccard ≥ 0.8 exact rescore) — the dense-core extractor running
    end-to-end on the production candidate topology: banded buckets
    with stop-bucket removal feed the graph operator, not the
    quadratic all-pairs verify twin. The oracle restates the same LSH
    pair set then unrolls the identical six integer peel rounds. On
    both gate corpora the peel CONVERGES within 6 rounds (round 7 is
    a no-op, verified in DuckDB), so this equals the exact k-core
    here; hypothesis shows long chains can need more rounds — the
    bounded-round contract (tests/test_property.py)."""
    pairs = _minhash_pairs08(spark, sf_dir)
    return graph.k_core(
        pairs.select(F.col("a").alias("src"), F.col("b").alias("dst")),
        k=3, rounds=6,
    )


def graph_common_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared-neighborhood link-prediction shortlist
    (ops/graph.common_neighbors): each node's top-3 candidates with
    >= 2 common neighbors over the Jaccard >= 0.8 near-dup graph —
    candidates the direct pass missed, output bounded at nodes x k
    instead of the clique-quadratic pair count."""
    pairs = _jaccard_pairs08(spark, sf_dir)
    return graph.common_neighbors(
        pairs.select(F.col("a").alias("src"), F.col("b").alias("dst")),
        min_common=2, top_k=3,
    )


def sketch_length_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language power-of-two histogram quantile sketch of document
    lengths (ops/sketch.hist_quantiles) — the mergeable, partitioning-
    independent alternative to the exact percentile scan."""
    return sketch.hist_quantiles(
        _docs(spark, sf_dir), "n_chars", group_cols=("lang",)
    )


def events_json_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed JSON payload extraction + per-type integer aggregates
    (ops/events.props_stats)."""
    return events.props_stats(
        spark.read.parquet(f"{sf_dir}/events.parquet")
    )


def events_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native PIVOT with an explicit value list: daily activity
    matrix, one count column per event type
    (ops/events.pivot_daily_counts)."""
    return events.pivot_daily_counts(
        spark.read.parquet(f"{sf_dir}/events.parquet")
    )


def graph_copurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bipartite projection of lineitem (order, part) onto part-part
    co-purchase edges with support >= 2 (ops/graph.bipartite_project)
    — market-basket graph construction; the quadratic term is bounded
    per order."""
    from .ops import graph as g

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return g.bipartite_project(
        li, "l_orderkey", "l_partkey", min_support=2
    )


def curation_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-scan table profile of lineitem (ops/profile.profile_table):
    per-column null/distinct/min/max — the expectations check before a
    new table drop enters the pipeline."""
    from .ops.profile import profile_table

    return profile_table(spark.read.parquet(f"{sf_dir}/lineitem.parquet"))


def curation_profile_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The stated 100 TB swap-in for curation_profile, gated with an
    rsd-bounded error check (ops/profile.profile_table_approx):
    per-column HLL++ approximate distinct counts at rsd=0.05 joined
    against the exact profile, emitting (col_name, within_bound) with
    within_bound = 1 iff |approx - exact| <= 25% of exact (5 sigma at
    the target rsd; HLL++ is deterministic for fixed data, and small
    cardinalities sit in the sketch's exact sparse mode). The oracle
    states the expectation — every column within bound — so the gate
    fails if the approx path's error budget is ever exceeded, while
    the exact variant's gate keeps the hash-exact contract."""
    from .ops.profile import profile_table, profile_table_approx

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    exact = profile_table(li).select("col_name", "n_distinct")
    approx = profile_table_approx(li, rsd=0.05).select(
        "col_name", "n_distinct_approx")
    d = F.abs(F.col("n_distinct_approx") - F.col("n_distinct"))
    return exact.join(approx, "col_name").select(
        "col_name",
        (d * 100 <= F.col("n_distinct") * 25)
        .cast("int").alias("within_bound"),
    )


def olap_revenue_by_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star-schema revenue rollup in integer centi-cents
    (ops/olap.revenue_by_region): fact side shuffled once, dimension
    chain broadcast by AQE."""
    from .ops import olap

    return olap.revenue_by_region(spark, sf_dir)


def dedup_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus version diff (ops/dedup.snapshot_diff): v1 = doc_id not
    divisible by 3, v2 = doc_id not divisible by 5 with every
    7-divisible doc's text amended — deterministic synthetic drop pair;
    md5 fingerprints, one full-outer join, unchanged rows omitted."""
    d = _docs(spark, sf_dir)
    v1 = d.where(F.col("doc_id") % 3 != 0)
    v2 = d.where(F.col("doc_id") % 5 != 0).withColumn(
        "text",
        F.when(F.col("doc_id") % 7 == 0,
               F.concat(F.col("text"), F.lit(" v2")))
        .otherwise(F.col("text")),
    )
    return dedup.snapshot_diff(v1, v2, "doc_id", F.md5("text"))


def sketch_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic Bloom pre-join filter
    (ops/sketch.bloom_prefilter): odd doc_ids probe the even docs'
    40-char-prefix key set through a 4096-bit / 3-hash filter; the
    accept set (true hits + deterministic false positives) is
    reproduced exactly by the oracle."""
    d = _docs(spark, sf_dir)
    key = F.substring("text", 1, 40)
    seen = (d.where(F.col("doc_id") % 2 == 0)
            .select(key.alias("k")).distinct())
    probes = d.where(F.col("doc_id") % 2 == 1).select(
        "doc_id", key.alias("k"))
    out = sketch.bloom_prefilter(
        seen, F.col("k"), probes, F.col("k"), m=4096, k=3)
    return out.select("doc_id")


def graph_lpa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded 4-round synchronous label-propagation communities
    (ops/graph.label_propagation) over the Jaccard ≥ 0.8 near-dup
    pair graph — splits CC's chance-bridged merges into dense
    template families; the oracle unrolls the identical four
    mode-with-min-tie-break rounds."""
    pairs = _jaccard_pairs08(spark, sf_dir)
    return graph.label_propagation(
        pairs.select(F.col("a").alias("src"), F.col("b").alias("dst")),
        rounds=4,
    )


def graph_bfs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-source BFS hop distances (ops/graph.bfs_distances) from
    the doc_id % 7 == 0 exemplar seeds over the Jaccard ≥ 0.8
    near-dup pair graph, 4-hop horizon — distance-to-labeled-exemplar
    for propagation-based labeling; the oracle is 4 unrolled
    min-relaxation rounds (equal because BFS discovers every node at
    its minimal hop count). Seeds are mod-7 because the synthetic
    near-dup families stride doc_id by 10 — a mod-10 seed set's
    neighbors are all seeds themselves (zero expansion); mod-7 cuts
    across the families, so the gate actually exercises hops 1+."""
    d = _docs(spark, sf_dir)
    pairs = _jaccard_pairs08(spark, sf_dir)
    seeds = d.where(F.col("doc_id") % 7 == 0).select("doc_id")
    return graph.bfs_distances(
        pairs.select(F.col("a").alias("src"), F.col("b").alias("dst")),
        seeds, max_hops=4,
    )


def olap_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 customer order-status dimension
    (ops/olap.scd2_intervals): each customer's o_orderstatus
    changelog (ordered by order date, orderkey tie-break) collapsed
    into validity intervals with a 9999-01-01 open-end sentinel."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    from .ops.olap import scd2_intervals

    return scd2_intervals(
        orders, "o_custkey", "o_orderstatus", "o_orderdate",
        "o_orderkey",
    )


def olap_cdc_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC MERGE-apply (ops/olap.cdc_apply): the customer account
    snapshot (balance in cents) upserted/deleted by a changelog
    derived from the events stream — signup/purchase upsert the
    event's value-in-cents under key user_id+1, error deletes;
    latest (ts, event_id) per key wins."""
    from .ops.olap import cdc_apply

    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    base = cust.select(
        F.col("c_custkey").alias("key"),
        F.round(F.col("c_acctbal") * 100, 0).cast("bigint")
        .alias("val"),
    )
    chg = ev.where(
        F.col("event_type").isin("signup", "purchase", "error")
    ).select(
        (F.col("user_id") + 1).alias("key"),
        F.round(F.coalesce(F.col("value"), F.lit(0.0)) * 100, 0)
        .cast("bigint").alias("val"),
        F.when(F.col("event_type") == "error", F.lit("D"))
        .when(F.col("event_type") == "signup", F.lit("I"))
        .otherwise(F.lit("U")).alias("op"),
        "ts", "event_id",
    )
    return cdc_apply(
        base, chg, key_col="key", val_col="val", op_col="op",
        seq_cols=("ts", "event_id"),
    )


def events_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense per-user daily grid with forward fill
    (ops/events.gapfill_daily) over the events table."""
    return events.gapfill_daily(
        spark.read.parquet(f"{sf_dir}/events.parquet")
    )


def curation_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe 80/10/10 train/val/test split keyed on the GROUP
    (ops/sample.group_split): the md5 coordinate hashes `source`, so
    near-duplicate / templated siblings (which concentrate within a
    source) can never straddle the train-eval boundary."""
    return sample.group_split(
        _docs(spark, sf_dir), "source"
    ).select("doc_id", "source", "split")


def olap_zorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order layout assignment (ops/olap.zorder_layout) of the
    events table on (user_id, minute-of-day): Morton-interleaved
    clustering key + 16 ntile file buckets over the exact global
    (zkey, event_id) order — the deterministic twin of
    repartitionByRange at write time."""
    from .ops.olap import zorder_layout

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id", "user_id",
        (F.hour("ts") * 60 + F.minute("ts")).alias("minute_of_day"),
    )
    return zorder_layout(
        ev, "user_id", "minute_of_day", "event_id", n_files=16
    )


def dedup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simhash near-dup pairs at Hamming ≤ 3
    (ops/dedup.simhash_band_pairs): 4-band pigeonhole candidate join
    with exact bit_count(xor) rescore — recall is GUARANTEED (any two
    signatures within 3 bits agree on a full 16-bit band), so the
    all-pairs Hamming filter is the exact oracle."""
    return dedup.simhash_band_pairs(_docs(spark, sf_dir), max_hamming=3)


def olap_pit_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time dimension join (ops/olap.pit_join): every order
    row picks up its customer's order-status SCD2 interval valid AT
    the order's own date — the temporal-correctness feature join;
    the intervals partition each key's history, so each order matches
    exactly one dimension row (row count == orders count)."""
    from .ops.olap import pit_join, scd2_intervals

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    dim = scd2_intervals(
        orders, "o_custkey", "o_orderstatus", "o_orderdate",
        "o_orderkey",
    )
    facts = orders.select(
        "o_orderkey",
        F.col("o_custkey").alias("key"),
        F.col("o_orderdate").alias("ts"),
    )
    return pit_join(facts, dim).select(
        "o_orderkey", "key",
        F.col("attr").alias("status_at"), "version",
    )


def olap_cdc_merge_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming CDC fold (streaming/stream.cdc_apply_replay): the
    customer snapshot upserted by the SAME events-derived changelog as
    olap_cdc_merge, but applied as ts-ordered micro-batches through a
    foreachBatch versioned-snapshot MERGE — in-order folding equals
    the one-shot batch MERGE, which is the oracle."""
    from .streaming.stream import cdc_apply_replay

    return cdc_apply_replay(spark, sf_dir)


def olap_cdc_merge_ooo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-of-order streaming CDC fold (streaming/stream.
    cdc_apply_ooo_replay): the same changelog as olap_cdc_merge but
    micro-batches delivered in a scrambled order — the seq-guarded
    tombstone merge must still converge to the one-shot batch MERGE,
    which is the oracle."""
    from .streaming.stream import cdc_apply_ooo_replay

    return cdc_apply_ooo_replay(spark, sf_dir)


_RRF_TERMS = ("join", "data", "spark")


def rank_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal-rank fusion (ops/rank.rrf_fuse) of two
    integer-deterministic retrievers over the 3-term query: retriever
    A ranks matched docs by total query-term tf (recall-ish), stricter
    retriever B only admits docs matching ≥2 distinct terms and ranks
    by (n_matched desc, doc length asc) (precision-ish) — B's smaller
    list exercises the single-list sentinel path. Integer rankings,
    rational fusion ⇒ the hash compare never touches float ordering."""
    from pyspark.sql import Window

    d = _docs(spark, sf_dir)
    tf = rank._term_freqs(d).where(F.col("word").isin(*_RRF_TERMS))
    wa = Window.orderBy(F.desc("_s"), F.asc("doc_id"))
    ranks_a = (
        tf.groupBy("doc_id").agg(F.sum("tf").alias("_s"))
        .select("doc_id", F.row_number().over(wa).alias("rank"))
    )
    from .ops.text import word_array

    lens = d.select(
        "doc_id",
        F.size(F.filter(word_array(), lambda w: w != "")).alias("_dl"),
    )
    wb = Window.orderBy(F.desc("_nm"), F.asc("_dl"), F.asc("doc_id"))
    ranks_b = (
        tf.groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("_nm"))
        .where(F.col("_nm") >= 2)
        .join(lens, "doc_id")
        .select("doc_id", F.row_number().over(wb).alias("rank"))
    )
    return rank.rrf_fuse(ranks_a, ranks_b)


def graph_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integer-exact Newman modularity (ops/graph.modularity) of the
    4-round label-propagation partition over the Jaccard ≥ 0.8
    near-dup pair graph — the quality score that closes the community
    -detection loop: per community (n_nodes, e_in, deg_sum,
    q_num = 4·m·e_in − deg_sum²), Q = Σ q_num / (4m²)."""
    pairs = _jaccard_pairs08(spark, sf_dir)
    e = pairs.select(F.col("a").alias("src"), F.col("b").alias("dst"))
    labels = graph.label_propagation(e, rounds=4)
    return graph.modularity(e, labels)


def text_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-100 PMI collocations (ops/text.collocations) at
    min_count=3 — multiword-expression mining; counts are exact
    integers, pmi is one fixed-shape float expression of them, so
    even the top-k ORDER is engine-exact."""
    return text.collocations(_docs(spark, sf_dir))


def olap_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Co-located bucketed join (ops/olap.bucketed_join_revenue):
    orders ⋈ customer with ZERO join-side Exchanges because both
    tables are written bucketed+sorted on the key first — the
    write-once/join-free layout contract; oracle = the plain join."""
    from .ops.olap import bucketed_join_revenue

    return bucketed_join_revenue(spark, sf_dir)


def curation_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language order-statistic winsorization of document lengths
    (ops/text.winsorize_lengths): clip bounds are the values at
    sorted positions ceil(p·n/100) — integer selection, engine-exact
    where interpolated quantiles are last-ulp floats."""
    return text.winsorize_lengths(_docs(spark, sf_dir))


def olap_zorder_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-file min/max statistics of the QUANTILE-CODED Z-ordered
    events layout (ops/olap.zorder_quantile_codes +
    zorder_pruning_stats) with point-probe hit flags on both raw
    dimensions (user_id = 42, minute_of_day = 600) — the measured
    file-pruning ratio of the Morton layout, hash-checked via the
    identical integer stats in the oracle. Quantile codes, not raw
    values: the raw interleave degenerates into a minute-of-day sort
    (its 11 bits out-rank user_id's 8) and the user probe hits every
    file — the classic unequal-width Z-order pitfall, kept out of the
    layout by rank-coding each dimension first."""
    from .ops.olap import zorder_pruning_stats, zorder_quantile_codes

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id", "user_id",
        (F.hour("ts") * 60 + F.minute("ts")).alias("minute_of_day"),
    )
    coded = zorder_quantile_codes(
        ev, "user_id", "minute_of_day", "event_id", bits=6
    )
    return zorder_pruning_stats(
        coded, "user_id", "minute_of_day", "event_id",
        probe_a=42, probe_b=600, n_files=16, bits=6,
        code_a="a_code", code_b="b_code",
    )


def curation_gopher(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style four-rule format filter (ops/text.gopher_rules):
    word-count bounds, mean-word-length bounds, symbol-to-word ratio,
    and distinct-stopword floor, every threshold integer-exact."""
    return text.gopher_rules(_docs(spark, sf_dir))


def olap_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native CUBE over (l_returnflag, l_linestatus) with grouping_id
    (ops/olap.cube_revenue) — all four grouping sets in one shuffle."""
    from .ops import olap

    return olap.cube_revenue(
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    )


def events_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-3 heaviest users per event type
    (ops/events.heavy_hitters), ties to the smaller user_id."""
    return events.heavy_hitters(
        spark.read.parquet(f"{sf_dir}/events.parquet"), k=3
    )


def rank_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-of-first-relevant per query term
    (ops/rank.first_relevant_rank) — the MRR ingredient, integer-exact
    ranking by (tf desc, doc_id asc); relevance label is the
    deterministic doc_id % 13 == 0 slice."""
    d = _docs(spark, sf_dir).withColumn(
        "rel", F.col("doc_id") % 13 == 0
    )
    return rank.first_relevant_rank(d, _RRF_TERMS)


def olap_mv_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-view maintenance
    (streaming/stream.streaming_mv_incremental): the (event_type, day)
    count/sum MV folded over micro-batch replays of the events table;
    the full-table GROUP BY recompute is the oracle — exact-DECIMAL
    accumulation makes the fold order-independent."""
    from .streaming.stream import mv_incremental_replay

    return mv_incremental_replay(spark, sf_dir)


def text_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Five rounds of real BPE merge training
    (ops/text.bpe_train_merges): per-round argmax pair over the
    evolving vocabulary, merges applied between rounds; the oracle is
    the identical five-stage unrolled loop in SQL (each stage
    MATERIALIZED — DuckDB inlines plain CTEs at every reference)."""
    return text.bpe_train_merges(_docs(spark, sf_dir), rounds=5)


def _link_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The deterministic link-bearing crawl fixture shared by
    kg_link_graph and kg_warc: (url, html binary) synthesized from
    orders — each page at ex{c%100}.test links ex{(c+1)%100} and
    ex{(c+7)%100}, every third page links docs.test, plus one
    relative and one mailto: link."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    c = F.col("o_custkey").cast("bigint")
    ok = F.col("o_orderkey").cast("bigint")
    h = lambda e: F.concat(  # noqa: E731
        F.lit("http://ex"), e.cast("string"), F.lit(".test")
    )
    html = F.concat(
        F.lit('<html><body><p>x</p><a href="'),
        h((c + 1) % 100), F.lit('/x"></a><a href="'),
        h((c + 7) % 100), F.lit('/y"></a>'),
        F.when(ok % 3 == 0,
               F.lit('<a href="http://docs.test/z"></a>'))
        .otherwise(F.lit("")),
        F.lit('<a href="/rel"></a>'
              '<a href="mailto:a@b.test"></a></body></html>'),
    )
    return o.select(
        F.concat(h(c % 100), F.lit("/o"), ok.cast("string"))
        .alias("url"),
        F.encode(html, "UTF-8").alias("html"),
    )


def kg_link_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hyperlink host graph (ops/web.host_link_graph) over the
    deterministic link-bearing crawl fixture (_link_pages). The
    oracle rebuilds the identical HTML strings in SQL and runs the
    same href-regex extraction."""
    return web.host_link_graph(_link_pages(spark, sf_dir))


def kg_host_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Host-level PageRank over the extracted hyperlink graph — link
    extraction (ops/web.host_link_graph) chained into the fixed-point-
    integer ranking (ops/graph.pagerank), the Common-Crawl host-rank
    recipe. Edges are the distinct host pairs; 6 iterations; ties to
    the lexicographically smaller host."""
    g = kg_link_graph(spark, sf_dir)
    edges = g.select(
        F.col("src_host").alias("src"), F.col("dst_host").alias("dst")
    )
    pr = graph.pagerank(edges, iterations=6)
    return pr.orderBy(F.desc("rank_scaled"), "node").limit(100)


def curation_url_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl URL canonicalization (ops/web.canonicalize_url) over a
    deterministic messy-URL corpus from orders: scheme/host case,
    default :80 port, utm tracking params, unsorted query params, and
    fragments all collapse. The oracle derives the canonical form in
    CLOSED FORM (not by re-running the canonicalizer), so it verifies
    the semantics independently."""
    ok = F.col("o_orderkey")
    c = (F.col("o_custkey") % 100).cast("string")
    url = F.concat(
        F.when(ok % 4 == 0, F.lit("HTTP://")).otherwise(
            F.lit("http://")),
        F.when(ok % 2 == 0, F.lit("EX")).otherwise(F.lit("ex")), c,
        F.lit(".test"),
        F.when(ok % 5 == 0, F.lit(":80")).otherwise(F.lit("")),
        F.lit("/o"), ok.cast("string"),
        F.when(ok % 3 == 0, F.lit("?utm_source=feed&b=2&a=1"))
        .when(ok % 3 == 1, F.lit("?a=1&b=2")).otherwise(F.lit("")),
        F.when(ok % 7 == 0, F.lit("#sec")).otherwise(F.lit("")),
    )
    p = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        url.alias("url")
    )
    return p.select(
        "url", web.canonicalize_url(F.col("url")).alias("canonical_url")
    )


def multimodal_ahash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual average-hash (ops/multimodal.image_ahash) over the
    decoded synthetic BMPs: the oracle recomputes every bit of the
    hash in closed form from the pixel formula, so a decode, mean, or
    bit-packing bug mismatches."""
    assets = multimodal.synth_assets(_docs(spark, sf_dir))
    return multimodal.image_ahash(assets)


def text_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer APPLY (ops/text.bpe_encode): the five trained merges
    (text_bpe_train's loop, already oracle-checked) replayed in
    training order over the corpus vocabulary — one chained
    pure-Column replace, encoding the distinct-word table once instead
    of the corpus (the Heaps-law scale statement). The oracle extends
    the unrolled trainer SQL with the word carried through every merge
    stage and reads the final vocabulary's symbol sequences."""
    return text.bpe_encode(_docs(spark, sf_dir), rounds=5)


def text_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch reading ease (ops/text.readability) as exact rationals —
    sentence/word/vowel-group counts are integers on both engines and
    the score crosses as (fre_num, fre_den), so no float ever decides
    the hash."""
    return text.readability(_docs(spark, sf_dir))


def graph_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unnormalized integer HITS (ops/graph.hits, 3 rounds) over the
    distinct host pairs of the extracted hyperlink graph — hubs =
    pages that link well, authorities = pages linked FROM good hubs,
    the complement of kg_host_pagerank on the same edges. The oracle
    unrolls all six half-steps as materialized SQL stages."""
    g = kg_link_graph(spark, sf_dir)
    edges = g.select(
        F.col("src_host").alias("src"), F.col("dst_host").alias("dst")
    )
    h = graph.hits(edges, iterations=3)
    return h.orderBy(
        F.desc("authority"), F.desc("hub"), "node"
    ).limit(100)


def kg_anchor_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-target-host anchor-text aggregation
    (ops/web.anchor_text_terms) over an anchor-bearing deterministic
    crawl from orders: each page anchors its ex{(c+1)%100} link with
    "buy widget {ok%5}", its ex{(c+7)%100} link with "cheap widget",
    and every third page labels docs.test "read the docs"; relative
    and mailto links carry text that must be dropped with them. The
    oracle rebuilds the identical HTML and tag regexes in SQL."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    c = F.col("o_custkey").cast("bigint")
    ok = F.col("o_orderkey").cast("bigint")
    h = lambda e: F.concat(  # noqa: E731
        F.lit("http://ex"), e.cast("string"), F.lit(".test")
    )
    html = F.concat(
        F.lit('<html><body><a href="'),
        h((c + 1) % 100), F.lit('/x">buy widget '),
        (ok % 5).cast("string"), F.lit('</a><a href="'),
        h((c + 7) % 100), F.lit('/y">cheap widget</a>'),
        F.when(ok % 3 == 0,
               F.lit('<a href="http://docs.test/z">read the docs</a>'))
        .otherwise(F.lit("")),
        F.lit('<a href="/rel">skip me</a>'
              '<a href="mailto:a@b.test">mail me</a></body></html>'),
    )
    pages = o.select(
        F.concat(h(c % 100), F.lit("/o"), ok.cast("string"))
        .alias("url"),
        F.encode(html, "UTF-8").alias("html"),
    )
    return web.anchor_text_terms(pages, top_k=5)


def crawl_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-host politeness scheduling (ops/web.crawl_schedule) over
    the deterministic crawl frontier from orders: URLs of one host
    serialize 500 ms apart, hosts proceed in parallel — one window
    keyed by host, the natural parallelism unit."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    c = F.col("o_custkey").cast("bigint")
    ok = F.col("o_orderkey").cast("bigint")
    pages = o.select(
        F.concat(
            F.lit("http://ex"), (c % 100).cast("string"),
            F.lit(".test/o"), ok.cast("string"),
        ).alias("url")
    )
    return web.crawl_schedule(pages, delay_ms=500)


def crawl_robots(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFC 9309 robots.txt rule matching (ops/web.robots_filter):
    longest-prefix wins, Allow beats Disallow on length ties, no
    match => allowed. The frontier is the orders-derived URL corpus;
    the parsed rules corpus is deterministic per host ex{k}.test:
    every host disallows /o1, every third host re-allows /o12 (the
    longer override), every fifth host disallows / (so only its /o1*
    URLs escape up to the more specific rules)."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    c = F.col("o_custkey").cast("bigint")
    ok = F.col("o_orderkey").cast("bigint")
    urls = o.select(
        F.concat(
            F.lit("http://ex"), (c % 100).cast("string"),
            F.lit(".test/o"), ok.cast("string"),
        ).alias("url")
    )
    k = spark.range(100).select(
        F.concat(F.lit("ex"), F.col("id").cast("string"),
                 F.lit(".test")).alias("host"),
        F.col("id"),
    )
    rules = (
        k.select("host", F.lit("/o1").alias("path_prefix"),
                 F.lit(False).alias("allow"))
        .unionByName(
            k.where(F.col("id") % 3 == 0).select(
                "host", F.lit("/o12").alias("path_prefix"),
                F.lit(True).alias("allow"))
        )
        .unionByName(
            k.where(F.col("id") % 5 == 0).select(
                "host", F.lit("/").alias("path_prefix"),
                F.lit(False).alias("allow"))
        )
    )
    return web.robots_filter(urls, rules)


def graph_scc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strongly connected components (ops/graph.scc, mutual-reach
    formulation with the doubling closure) over the hyperlink host
    graph: the +1-mod-100 ring makes ex0..ex99 one giant SCC while
    docs.test (no out-links) stays a singleton — the shape that
    distinguishes SCC from undirected CC. Oracle: DuckDB recursive
    closure + mutual join."""
    g = kg_link_graph(spark, sf_dir)
    edges = g.select(
        F.col("src_host").alias("src"), F.col("dst_host").alias("dst")
    )
    return graph.scc(edges)


def events_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU + trailing-7-day WAU per observed day
    (ops/events.active_users): the contribution-explode formulation —
    a sliding COUNT(DISTINCT) doesn't decompose as a window function,
    so each (user, day) is exploded onto the 7 days it supports and
    re-aggregated; the oracle states the same window as a range
    join."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return events.active_users(ev, window_days=7)


def curation_url_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL-level duplicate groups (ops/web.url_dedup_groups) over a
    deliberately colliding messy-URL corpus (path keyed by ok%40, so
    scheme/host case, :80, utm params, param order, and fragments
    fold many raw variants onto each canonical). The oracle derives
    the canonical key in closed form and groups identically."""
    ok = F.col("o_orderkey")
    c = (F.col("o_custkey") % 100).cast("string")
    url = F.concat(
        F.when(ok % 4 == 0, F.lit("HTTP://")).otherwise(
            F.lit("http://")),
        F.when(ok % 2 == 0, F.lit("EX")).otherwise(F.lit("ex")), c,
        F.lit(".test"),
        F.when(ok % 5 == 0, F.lit(":80")).otherwise(F.lit("")),
        F.lit("/p"), (ok % 40).cast("string"),
        F.when(ok % 3 == 0, F.lit("?utm_source=feed&b=2&a=1"))
        .when(ok % 3 == 1, F.lit("?a=1&b=2")).otherwise(F.lit("")),
        F.when(ok % 7 == 0, F.lit("#sec")).otherwise(F.lit("")),
    )
    p = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        url.alias("url")
    )
    return web.url_dedup_groups(p)


def multimodal_vad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Energy-threshold voice-activity segments
    (ops/multimodal.audio_vad_segments) over the synthetic WAVs: the
    Arrow kernel computes real decoded frame energies, the DataFrame
    layer does the mean threshold (cross-multiplied integers) and
    run-length merge; the oracle recomputes every frame energy in
    closed form from the PCM sample formula."""
    assets = multimodal.synth_assets(_docs(spark, sf_dir))
    return multimodal.audio_vad_segments(assets)


def olap_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction planning (ops/olap.compaction_plan) over
    a synthetic per-partition file manifest built from lineitem
    (part = linestatus, file_id = orderkey mod 500, bytes = the
    file's integral quantity sum): size-descending start-offset
    bucketing at target 2500 — the deterministic set formulation of
    bin packing both engines compute identically."""
    from .ops import olap

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    files = (
        li.groupBy(
            F.col("l_linestatus").alias("part"),
            (F.col("l_orderkey") % 500).alias("file_id"),
        )
        .agg(
            F.sum(F.round("l_quantity", 0).cast("bigint"))
            .cast("bigint").alias("bytes")
        )
    )
    return olap.compaction_plan(files, target_bytes=2500)


def kg_microdata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """schema.org JSON-LD extraction (ops/web.extract_structured_data)
    over a deterministic product-page crawl from part: three of every
    four pages embed an ld+json Product block (name + integer-cent
    offer price); the fourth has none and must drop out. The oracle
    rebuilds the identical JSON text and reads it back with DuckDB's
    JSON path functions."""
    p = spark.read.parquet(f"{sf_dir}/part.parquet")
    pk = F.col("p_partkey").cast("bigint")
    cents = F.round(F.col("p_retailprice") * 100, 0).cast("bigint")
    block = F.concat(
        F.lit('<script type="application/ld+json">'
              '{"@type": "Product", "name": "part '),
        pk.cast("string"),
        F.lit('", "offers": {"price": '),
        cents.cast("string"),
        F.lit("}}</script>"),
    )
    html = F.concat(
        F.lit("<html><head>"),
        F.when(pk % 4 != 0, block).otherwise(F.lit("")),
        F.lit("</head><body>x</body></html>"),
    )
    pages = p.select(
        F.concat(
            F.lit("http://ex"), (pk % 100).cast("string"),
            F.lit(".test/p"), pk.cast("string"),
        ).alias("url"),
        F.encode(html, "UTF-8").alias("html"),
    )
    return web.extract_structured_data(pages)


def events_attribution_stream_outer(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """LEFT OUTER stream-stream interval join
    (streaming/stream.attribution_outer_replay): views ⋈ clicks within
    a 30-minute horizon PLUS eviction-driven null rows for unconverted
    views — the replay appends a sentinel past every view's horizon so
    the final watermark flushes the tail, making the full replay equal
    the batch left range join (the oracle). Nullable click columns
    cross as strings (the NULL-through-pandas device)."""
    from .streaming.stream import attribution_outer_replay

    return attribution_outer_replay(spark, f"{sf_dir}/events.parquet")


def crawl_sitemap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sitemap URL discovery (ops/web.sitemap_discovery): each host's
    sitemap lists one already-known URL (/o{ok}, in the frontier), one
    new URL (/n{ok}) and — every fourth page — a relative <loc> that
    must drop; only the new absolute URLs survive the frontier
    anti-join. Oracle: same regex + NOT EXISTS."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    c = (F.col("o_custkey") % 100).cast("string")
    ok = F.col("o_orderkey").cast("bigint")
    base = F.concat(F.lit("http://ex"), c, F.lit(".test"))
    xml = F.concat(
        F.lit("<urlset><url><loc>"),
        base, F.lit("/o"), ok.cast("string"),
        F.lit("</loc></url><url><loc>"),
        base, F.lit("/n"), ok.cast("string"),
        F.lit("</loc></url>"),
        F.when(ok % 4 == 0,
               F.lit("<url><loc>/rel</loc></url>"))
        .otherwise(F.lit("")),
        F.lit("</urlset>"),
    )
    pages = o.select(F.encode(xml, "UTF-8").alias("html"))
    frontier = o.select(
        F.concat(base, F.lit("/o"), ok.cast("string")).alias("url")
    )
    return web.sitemap_discovery(pages, frontier)


def graph_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-integer Pearson components for out-in degree
    assortativity (ops/graph.assortativity_terms) over the hyperlink
    host graph: (m, num, den_x, den_y) with r = num/√(den_x·den_y)
    left to the consumer — no float crosses the engine boundary."""
    g = kg_link_graph(spark, sf_dir)
    edges = g.select(
        F.col("src_host").alias("src"), F.col("dst_host").alias("dst")
    )
    return graph.assortativity_terms(edges)


def text_stem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S-stemmer vocabulary fold (ops/text.stemmed_vocabulary):
    Harman's three plural rules collapse surface forms onto stems;
    the oracle mirrors the CASE chain byte-for-byte."""
    return text.stemmed_vocabulary(_docs(spark, sf_dir))


def dedup_sentences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style sentence-granularity dedup
    (ops/dedup.duplicated_sentences) over the 2% page sample (real
    multi-sentence prose — text_sentences' corpus): sentences present
    in ≥2 distinct pages are cross-site boilerplate and come out as a
    decision table with the smallest containing url as canonical."""
    from .pipeline import pages as pages_mod

    p = pages_mod.pages(spark, sf_dir).select(
        F.col("url").alias("doc_id"), "text"
    )
    p = p.where(
        sample.sample_hash(F.col("doc_id"), "sent") <
        F.lit(sample.rate_threshold(0.02))
    )
    return dedup.duplicated_sentences(p, min_docs=2)


def text_skipgrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """±2-window skip-gram co-occurrence counts
    (ops/text.skipgram_pairs) — the word2vec/GloVe preprocessing
    sweep; position-banded self-join, linear in corpus tokens. The
    oracle states the identical pair multiset as a per-document
    list-comprehension flatten."""
    return text.skipgram_pairs(_docs(spark, sf_dir), window=2,
                               min_count=2)


def rank_precision(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-integer precision@5 per query term
    (ops/rank.precision_at_k): relevant = doc_id % 13 == 0 (the
    rank_eval slice), ranking by (tf desc, doc_id asc)."""
    return rank.precision_at_k(_docs(spark, sf_dir), _RRF_TERMS, k=5)


def multimodal_scenes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scene-cut segmentation (ops/multimodal.video_scenes) over the
    synthetic FVID videos: consecutive-frame absolute pixel
    differences in the Arrow kernel, the above-mean cut test as
    cross-multiplied integers and the running cut count as scene_id
    in DataFrame algebra. The oracle recomputes every pair diff in
    closed form from the frame pixel formula (per-pixel |Δ| is 3, or
    248 at the mod-251 wrap)."""
    videos = multimodal.synth_videos(_docs(spark, sf_dir))
    return multimodal.video_scenes(videos)


def olap_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The TPC-H Q1 pricing summary in integer centi-cents: per
    (returnflag, linestatus), quantity / base / discounted /
    discounted+taxed sums and row counts over shipdate ≤ 1998-09-02 —
    the canonical one-scan-one-shuffle OLAP aggregate, every money
    value ROUND(×100) so both engines sum identical BIGINTs."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").where(
        F.col("l_shipdate") <= F.lit("1998-09-02").cast("date")
    )
    price_cc = F.round(F.col("l_extendedprice") * 100, 0).cast("bigint")
    disc = F.lit(100) - F.round(F.col("l_discount") * 100, 0).cast("bigint")
    tax = F.lit(100) + F.round(F.col("l_tax") * 100, 0).cast("bigint")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.round("l_quantity", 0).cast("bigint"))
            .cast("bigint").alias("sum_qty"),
            F.sum(price_cc).cast("bigint").alias("sum_base_cc"),
            F.sum(price_cc * disc).cast("bigint").alias("sum_disc_cc"),
            F.sum(price_cc * disc * tax).cast("bigint")
            .alias("sum_charge_cc"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


def kg_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity-surface co-occurrence graph (same-page pairing over the
    mention detector's output — the KG edge-candidate sweep that
    complements the explicit sameAs links): distinct (page, surface)
    from both mention slots, within-page pairs (a < b), kept when
    seen on ≥2 pages. The copurchase plan shape: per-page entity
    counts are bounded, so the self-join is page-banded and the
    aggregate is graph-sized."""
    from . import queries_kg as K

    m = K.kg_mentions(spark, sf_dir)
    s = (
        m.select("url", F.col("subj_surface").alias("surface"))
        .unionByName(
            m.select("url", F.col("obj_surface").alias("surface"))
        )
        .dropDuplicates(["url", "surface"])
    )
    pairs = (
        s.alias("a")
        .join(s.alias("b"), "url")
        .where(F.col("a.surface") < F.col("b.surface"))
        .select(
            F.col("a.surface").alias("ent_a"),
            F.col("b.surface").alias("ent_b"),
        )
    )
    return (
        pairs.groupBy("ent_a", "ent_b")
        .agg(F.count(F.lit(1)).alias("n_pages"))
        .where(F.col("n_pages") >= 2)
    )


def kg_redirects(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Redirect-chain resolution by pointer doubling
    (ops/web.resolve_redirects) over a synthetic redirect map with
    chains up to 7 hops: part p_i 301s to p_{i-1} unless i % 8 == 0
    (the terminal), so the doubling loop needs 3 rounds where a
    per-hop join would need 7. The oracle follows the same edges with
    a recursive CTE — an independent chain walk, not the doubling."""
    from .ops import web

    p = spark.read.parquet(f"{sf_dir}/part.parquet")
    edges = p.where(F.col("p_partkey") % 8 != 0).select(
        F.concat(F.lit("http://r.test/p"),
                 F.col("p_partkey").cast("string")).alias("url"),
        F.concat(F.lit("http://r.test/p"),
                 (F.col("p_partkey") - 1).cast("string")).alias("target"),
    )
    return web.resolve_redirects(edges).select(
        "url", "final_url", "hops",
        F.col("resolved").cast("string").alias("resolved"),
    )


def kg_rdfs_entailment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full RDFS entailment materialization (ops/ontology.rdfs_closure:
    rdfs2/3/5/7/9/11) over a synthetic ontology + instance mix: a
    9-deep subClassOf CHAIN (forces >3 closure-doubling rounds), a
    4-deep subPropertyOf chain whose root carries domain+range, typed
    instances from part, and property facts from lineitem. The oracle
    states the same stratified rules with recursive CTEs for the two
    closures. Short prefixed names stand in for the full IRIs (the
    rule engine takes the vocabulary as parameters)."""
    from .ops import ontology

    p = spark.read.parquet(f"{sf_dir}/part.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    cls = spark.range(1, 10).select(
        F.concat(F.lit("C"), F.col("id").cast("string")).alias("s"),
        F.lit("sco").alias("p"),
        F.concat(F.lit("C"), (F.col("id") - 1).cast("string")).alias("o"))
    props = spark.range(1, 5).select(
        F.concat(F.lit("q"), F.col("id").cast("string")).alias("s"),
        F.lit("spo").alias("p"),
        F.concat(F.lit("q"), (F.col("id") - 1).cast("string")).alias("o"))
    dom_rng = spark.range(1).select(
        F.lit("q0").alias("s"), F.lit("domain").alias("p"),
        F.lit("C5").alias("o")
    ).unionByName(spark.range(1).select(
        F.lit("q0").alias("s"), F.lit("range").alias("p"),
        F.lit("C7").alias("o")))
    types = p.select(
        F.concat(F.lit("e"), F.col("p_partkey").cast("string")).alias("s"),
        F.lit("type").alias("p"),
        F.concat(F.lit("C"), (F.col("p_partkey") % 10).cast("string"))
        .alias("o"))
    facts = li.select(
        F.concat(F.lit("x"),
                 (F.col("l_orderkey") % 200).cast("string")).alias("s"),
        F.concat(F.lit("q"),
                 (F.col("l_suppkey") % 5).cast("string")).alias("p"),
        F.concat(F.lit("y"),
                 (F.col("l_partkey") % 100).cast("string")).alias("o"))
    triples = cls.unionByName(props).unionByName(dom_rng) \
        .unionByName(types).unionByName(facts) \
        .dropDuplicates(["s", "p", "o"])
    return ontology.rdfs_closure(
        triples, type_iri="type", sco_iri="sco", spo_iri="spo",
        domain_iri="domain", range_iri="range")


def kg_truth_discovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Majority-vote conflicting-claim resolution (ops/fuse
    .majority_vote) over a synthetic multi-source claim table:
    lineitem rows assert entity attributes with per-source
    disagreement (object drawn from l_partkey % 7, source from
    l_suppkey), duplicate same-source claims collapse to one vote,
    ties break to the smallest object. The oracle restates the vote +
    window in SQL."""
    from .ops import fuse

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    claims = li.select(
        F.concat(F.lit("e"),
                 (F.col("l_orderkey") % 300).cast("string")).alias("s"),
        F.concat(F.lit("attr"),
                 (F.col("l_linenumber") % 3).cast("string")).alias("p"),
        F.concat(F.lit("v"),
                 (F.col("l_partkey") % 7).cast("string")).alias("o"),
        F.concat(F.lit("src"),
                 (F.col("l_suppkey") % 11).cast("string")).alias("source"))
    return fuse.majority_vote(claims)


def events_dedup_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exactly-once dedup gate
    (streaming/stateful.dedup_replay → streaming_dedup_events): every
    third event is re-delivered at-least-once one minute later, the
    union replays as ascending-ts micro-batches, and
    dropDuplicatesWithinWatermark must emit exactly the original
    table — the oracle is the batch DISTINCT (= the events table
    itself, event_ids being unique)."""
    from .streaming.stateful import dedup_replay

    return dedup_replay(spark, f"{sf_dir}/events.parquet")


def olap_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted skew join (ops/olap.salted_join_agg): 90% of lineitem
    rows hash to ONE foreign key (k=0) — the head-entity shape that
    makes an unsalted first shuffle put 90% of the fact on a single
    reducer. The fact carries salt = l_linenumber % 8, the dim
    explodes across all 8 salts, the join keys on (k, salt), and the
    post-join re-aggregate drops the salt — so the oracle is the
    PLAIN unsalted join + group-by."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    fact = li.select(
        F.when(F.col("l_orderkey") % 10 < 9, F.lit(0))
        .otherwise(F.col("l_orderkey") % 97).alias("k"),
        (F.col("l_linenumber") % 8).cast("int").alias("salt"),
        F.col("l_quantity").cast("bigint").alias("v"),
    )
    dim = spark.range(0, 100).select(
        F.col("id").alias("k"),
        F.concat(F.lit("grp"), (F.col("id") % 5).cast("string"))
        .alias("attr"),
    )
    from .ops import olap

    return olap.salted_join_agg(fact, dim, n_salts=8)


def olap_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS one-scan margins (ops/olap.grouping_sets_revenue):
    the two one-dimensional rollups cube/rollup can't express as a
    pair, computed with a single Expand + aggregate over one lineitem
    scan; gid disambiguates the NULL dimension rows."""
    from .ops import olap

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return olap.grouping_sets_revenue(li)


def text_hashed_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashing-trick sparse term features (ops/text.hashed_features):
    64 md5-derived buckets, per-doc tf — the vocabulary-free
    featurization for corpus-scale linear models; oracle recomputes
    the md5 bucket in closed form."""
    return text.hashed_features(_docs(spark, sf_dir), n_buckets=64)


def text_kn_bigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated Kneser-Ney bigram LM with d=3/4 as exact rationals
    (ops/rank.kneser_ney_bigram): kn_num/kn_den in integer counts
    only, continuation counts included — the smoothing estimator
    KenLM-style quality filters use; emitted for bigrams with
    c12 ≥ 4, statistics over the unpruned model."""
    return rank.kneser_ney_bigram(_docs(spark, sf_dir), min_count=4)


def graph_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Horizon-4 closeness centrality terms
    (ops/graph.closeness_terms) for the doc_id % 31 == 0 seed sample
    over the Jaccard ≥ 0.8 near-dup pair graph — integer
    (n_reached, dist_sum) per seed; the oracle unrolls 4 per-seed
    min-relaxation rounds (the per-seed lift of graph_bfs's
    oracle)."""
    d = _docs(spark, sf_dir)
    pairs = _jaccard_pairs08(spark, sf_dir)
    seeds = d.where(F.col("doc_id") % 31 == 0).select("doc_id")
    return graph.closeness_terms(
        pairs.select(F.col("a").alias("src"), F.col("b").alias("dst")),
        seeds, max_hops=4,
    )


def kg_warc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WARC archive round-trip (ops/warc): the crawl fixture is
    serialized into one multi-record WARC-style file per host (pure
    binary Column concat), then parsed back by the offset-driven
    record walker inside Arrow mapInPandas — the Common-Crawl
    ingestion step. The oracle derives (url, type, byte length,
    payload md5) in closed form from the fixture HTML; a record
    misalignment in the walker corrupts every subsequent record's
    md5."""
    from .ops import warc

    files = warc.to_warc_files(_link_pages(spark, sf_dir))
    return warc.parse_warc(files).select(
        "url", "rec_type", "content_length", "payload_md5")


def multimodal_ahash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate image detection
    (ops/multimodal.ahash_near_dup_pairs): perceptual average-hashes
    banded into 4 chunks, bucket-joined within identical geometry,
    exact-Hamming rescored at ≤ 5 bits — image dedup for a
    multimodal training corpus. The oracle recomputes the hashes
    from the pixel formula and states the band condition
    arithmetically (some xor band == 0) over same-geometry pairs."""
    assets = multimodal.synth_assets(_docs(spark, sf_dir))
    return multimodal.ahash_near_dup_pairs(
        multimodal.image_ahash(assets), n_bands=4, max_hamming=5)


def events_windowed_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of events_windowed: tumbling 1-hour counts per
    event type under a 30-minute watermark
    (streaming/stateful.streaming_tumbling_counts), replayed as
    ascending-ts micro-batches with sentinel flush chunks — append
    mode must emit every real window exactly once, equal to the batch
    date_trunc group-by (the oracle)."""
    from .streaming.stateful import windowed_replay_closed

    return windowed_replay_closed(spark, f"{sf_dir}/events.parquet")


def crawl_cdx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDX archive index (ops/warc.parse_warc offsets +
    ops/web.surt_key): the WARC fixture parsed back with each
    record's byte span, keyed by the SURT sort key web archives use —
    (surt, url, host, offset, rec_length). The oracle recomputes the
    offsets in closed form: per-host url-ordered records, rec_length
    = 74 + len(url) + len(str(content_length)) + content_length, and
    offset = the running sum of preceding records — so a serializer
    or walker off-by-one anywhere breaks every later offset in the
    host's file."""
    from .ops import warc

    files = warc.to_warc_files(_link_pages(spark, sf_dir))
    recs = warc.parse_warc(files, keep=("host",))
    return recs.select(
        web.surt_key(F.col("url")).alias("surt"),
        "url", "host", "offset", "rec_length",
    )


def events_enrich_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static broadcast enrichment gate
    (streaming/stream.streaming_enrich_static): every replayed event
    joins a 25-key segment dimension per micro-batch — stateless, so
    the replayed union must equal the batch join exactly (the
    oracle); completes the streaming join family (two interval
    joins + CDC fold + this)."""
    from .streaming.stream import enrich_static_replay

    return enrich_static_replay(spark, f"{sf_dir}/events.parquet")


def graph_walks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic random-walk sampling
    (ops/graph.deterministic_walks): 3-step md5-argmin walks from the
    doc_id % 31 == 0 seeds over the Jaccard ≥ 0.8 pair graph — the
    DeepWalk corpus-generation step, derandomized so the oracle (3
    unrolled argmin joins) hash-compares."""
    d = _docs(spark, sf_dir)
    pairs = _jaccard_pairs08(spark, sf_dir)
    seeds = d.where(F.col("doc_id") % 31 == 0).select("doc_id")
    return graph.deterministic_walks(
        pairs.select(F.col("a").alias("src"), F.col("b").alias("dst")),
        seeds, walk_len=3,
    )


def olap_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 (ops/olap.forecast_revenue_change): one
    predicate-heavy lineitem scan (year 1996, 5-7% discount,
    quantity < 24) into a single global aggregate — the canonical
    pushdown query, integer cent·percent revenue."""
    from .ops import olap

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return olap.forecast_revenue_change(li)


def curation_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Budget-constrained corpus selection
    (ops/sample.select_under_budget): documents taken in quality-score
    priority order (deterministic pseudo-score n_chars % 97) until 20%
    of the corpus token total is spent — the token-budget curation
    cut, computed with the two-phase per-score prefix sum instead of
    a global sort. The oracle is the plain global ordered window."""
    from .ops import sample

    d = _docs(spark, sf_dir).select(
        "doc_id",
        (F.col("n_chars") % 97).alias("score"),
        F.size(text.word_array()).alias("n_tokens"),
    ).localCheckpoint(eager=True)
    total = d.agg(F.sum("n_tokens")).collect()[0][0]
    return sample.select_under_budget(d, budget=total // 5)


def olap_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 (ops/olap.shipping_priority): segment-filtered
    customer ⋈ date-filtered orders ⋈ date-filtered lineitem, revenue
    per order, deterministic top-10 via TakeOrderedAndProject."""
    from .ops import olap

    return olap.shipping_priority(spark, sf_dir)


def kg_nodes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Node-table derivation — the north_star's SECOND sink table
    (triples + nodes): every distinct subject plus every distinct IRI
    object of the validated emission, pipeline/run.py's finalize rule
    gated on CONTENT (kg_triple_counts only checks the metric). IRI
    test mirrors the emission's o_is_iri flag (all IRIs in the
    fixture are http-prefixed)."""
    from . import queries_kg as K

    t = K.kg_validated_triples(spark, sf_dir)
    return (
        t.select(F.col("s").alias("node"))
        .unionByName(
            t.where(F.col("o").startswith("http"))
            .select(F.col("o").alias("node")))
        .dropDuplicates(["node"])
    )


def graph_ra_linkpred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resource-Allocation link prediction
    (ops/graph.resource_allocation): each node's top-3 missing-link
    candidates over the Jaccard >= 0.8 near-dup graph, scored by the
    integer-exact sum of 1e12 DIV deg(z) over common neighbors — the
    degree-weighted refinement of graph_common_neighbors (a shared
    leaf outweighs a shared hub). Same Sigma-deg^2 wedge bound; the
    oracle restates the identical BIGINT floor-division sum."""
    pairs = _jaccard_pairs08(spark, sf_dir)
    return graph.resource_allocation(
        pairs.select(F.col("a").alias("src"), F.col("b").alias("dst")),
        min_common=2, top_k=3,
    )


def dedup_editdist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance-verified near-dup pairs
    (ops/dedup.edit_distance_pairs): simhash pigeonhole banding at
    hamming <= 7 generates candidates (recall 1.0), exact Levenshtein
    over the first 120 chars keeps pairs within 10% relative edit
    distance. Runs UNGUARDED (max_bucket off) so the all-pairs oracle
    is exactly equal — the same verify-vs-scale statement as
    dedup_simhash_pairs."""
    return dedup.edit_distance_pairs(
        _docs(spark, sf_dir), max_hamming=7, prefix=120, rel_pct=10
    )


def olap_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 (ops/olap.local_supplier_volume): per-nation revenue
    where customer and supplier share a nation, ASIA, order year
    1996 — the customer-supplier nation equi-condition is the
    defining Q5 twist."""
    from .ops import olap

    return olap.local_supplier_volume(spark, sf_dir)


def olap_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 (ops/olap.returned_items): top-20 customers by
    revenue lost to returns in 1996Q1, deterministic tiebreak,
    TakeOrderedAndProject."""
    from .ops import olap

    return olap.returned_items(spark, sf_dir)


def olap_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 (ops/olap.promo_revenue): promo vs total revenue for
    ship month 1996-03 as the exact integer (promo_cc, total_cc)
    pair."""
    from .ops import olap

    return olap.promo_revenue(spark, sf_dir)


def olap_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 (ops/olap.large_volume_customers): orders with total
    line quantity > 180 joined to their customers, top-100 by total
    price."""
    from .ops import olap

    return olap.large_volume_customers(spark, sf_dir)


def multimodal_header_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Header-only media triage (ops/multimodal.header_dims): magic
    bytes + fixed-offset header fields give (kind, dims) for every
    synthesized BMP/PNG/GIF/WAV payload WITHOUT decoding — pure
    Column arithmetic on the binary type, no Arrow, no Python, no
    inflate/LZW. The oracle recomputes every dimension in closed form
    from the synthesis formulas, so an endianness or offset slip
    hash-mismatches."""
    assets = multimodal.synth_assets(_docs(spark, sf_dir))
    return multimodal.header_dims(assets)


def graph_ktruss(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded 3-round k-truss peel at k=4 (ops/graph.k_truss) over
    the Jaccard >= 0.8 near-dup pair graph — the edge-cohesion
    extractor one notch denser than graph_kcore (every surviving edge
    closes >= 2 triangles among survivors). Deliberately expensive
    gate: three triangle enumerations on a shrinking edge set; the
    oracle unrolls the identical integer rounds."""
    pairs = _jaccard_pairs08(spark, sf_dir)
    return graph.k_truss(
        pairs.select(F.col("a").alias("src"), F.col("b").alias("dst")),
        k=4, rounds=3,
    )


def olap_nation_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 (ops/olap.nation_trade_volume): bilateral
    NATION_1/NATION_2 trade by ship year — the disjunctive
    nation-pair predicate evaluated after broadcast dimension
    joins."""
    from .ops import olap

    return olap.nation_trade_volume(spark, sf_dir)


def olap_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 (ops/olap.discounted_revenue): OR-of-conjunctions
    brand/size/quantity revenue with the common quantity envelope
    factored into the fact scan."""
    from .ops import olap

    return olap.discounted_revenue(spark, sf_dir)


def text_textrank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TextRank keyword extraction (Mihalcea & Tarau 2004),
    derandomized and composed from two existing exact operators: the
    ±2-window skip-gram co-occurrence graph (ops/text.skipgram_pairs,
    min_count=2 prunes noise edges) feeds the fixed-point-integer
    PageRank (ops/graph.pagerank, 4 iterations) — word salience from
    graph structure instead of frequency. Top-50 words by
    (rank_scaled DESC, node). The oracle chains the skip-gram pair
    CTE into the unrolled BIGINT PageRank CTEs, so the whole
    composite is bit-exact."""
    pairs = text.skipgram_pairs(_docs(spark, sf_dir), window=2,
                                min_count=2)
    pr = graph.pagerank(
        pairs.select(F.col("center").alias("src"),
                     F.col("context").alias("dst")),
        iterations=4,
    )
    return pr.orderBy(F.desc("rank_scaled"), "node").limit(50)


def olap_customer_distribution(
    spark: SparkSession, sf_dir: str,
) -> DataFrame:
    """TPC-H Q13 (ops/olap.customer_distribution): count-of-counts
    order histogram per customer, zero-order customers included via
    the LEFT join."""
    from .ops import olap

    return olap.customer_distribution(spark, sf_dir)


def graph_ppr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Personalized PageRank (ops/graph.personalized_pagerank) over
    the Jaccard >= 0.8 near-dup pair graph, seeds = doc_id % 50 == 0,
    4 iterations — seed-local proximity ranking, the KG
    entity-similarity primitive. Top-100 reached nodes by
    (rank_scaled DESC, node); the oracle unrolls the identical
    seed-teleport BIGINT rounds."""
    pairs = _jaccard_pairs08(spark, sf_dir)
    edges = pairs.select(F.col("a").alias("src"),
                         F.col("b").alias("dst"))
    nodes = (edges.select(F.col("src").alias("node"))
             .unionByName(edges.select(F.col("dst").alias("node")))
             .dropDuplicates(["node"]))
    seeds = nodes.where(F.col("node") % 50 == 0)
    # symmetric closure: the pair graph is undirected, the walk needs
    # both directions
    sym = edges.unionByName(
        edges.select(F.col("dst").alias("src"),
                     F.col("src").alias("dst")))
    pr = graph.personalized_pagerank(sym, seeds, iterations=4)
    return pr.orderBy(F.desc("rank_scaled"), "node").limit(100)


def ann_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN (ops/ann.pq_topk): 4 sub-codebooks of
    4 codes trained with the deterministic Lloyd's device, vectors
    encoded to 4 small codes (8 bits vs 64 doubles — the memory-side
    scale path next to IVF's compute-side one), queries answered by
    ADC lookup. Integer-only (qid, rank, nid) output; the oracle
    replays the full train->encode->ADC chain."""
    from .ops import ann

    return ann.pq_topk(
        spark.read.parquet(f"{sf_dir}/embeddings.parquet"))


def dedup_prefix_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prefix-filtering set-similarity join
    (ops/dedup.prefix_filter_pairs): Jaccard >= 0.8 pairs WITHOUT the
    all-pairs join and with deterministic recall 1.0 (AllPairs/PPJoin
    pigeonhole on frequency-sorted prefixes). The oracle is the
    all-pairs dedup_jaccard SQL VERBATIM — hash equality IS the
    recall/precision-1.0 proof."""
    return dedup.prefix_filter_pairs(_docs(spark, sf_dir), 0.8)


def olap_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 (ops/olap.order_priority_check): per-priority counts
    of quarter orders with at least one late line — the EXISTS
    compiles to LEFT SEMI, never duplicating order rows."""
    from .ops import olap

    return olap.order_priority_check(spark, sf_dir)


def olap_running_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative monthly revenue per nation
    (ops/olap.running_revenue): the running-total window runs on the
    nation-month aggregate, never the fact table; BIGINT centi-cents
    end to end."""
    from .ops import olap

    return olap.running_revenue(spark, sf_dir)


def graph_component_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup cluster size distribution: the dedup_components
    labeling rolled into a count-of-counts histogram (size,
    n_components) — the duplication-profile diagnostic a curation run
    reads first (how much of the corpus sits in template
    mega-clusters vs isolated pairs). Two tiny aggregates on top of
    the already-verified CC labels; the oracle wraps the
    dedup_components SQL verbatim."""
    labels = dedup_components(spark, sf_dir)
    per = labels.groupBy("component").agg(
        F.count(F.lit(1)).alias("size"))
    return per.groupBy("size").agg(
        F.count(F.lit(1)).alias("n_components"))


def dedup_eval_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH recall meta-evaluation: one row (n_exact, n_lsh, n_common)
    comparing the minhash-LSH pair set against the exact all-pairs
    Jaccard >= 0.8 truth on the same corpus — the measurement that
    turns "LSH recall is probabilistic" from a docstring claim into a
    per-corpus number (recall = n_common / n_exact, precision = 1 by
    construction since LSH rescores exactly). Both sides are
    already-verified operators; the oracle nests both verified SQL
    twins and counts the join."""
    ex = _jaccard_pairs08(spark, sf_dir) \
        .select("a", "b")
    lsh = _minhash_pairs08(spark, sf_dir) \
        .select("a", "b")
    common = ex.join(lsh, ["a", "b"], "left_semi")
    # three single-row aggregates cross-joined — one plan, no driver
    # collection
    return (
        ex.agg(F.count(F.lit(1)).alias("n_exact"))
        .crossJoin(lsh.agg(F.count(F.lit(1)).alias("n_lsh")))
        .crossJoin(common.agg(F.count(F.lit(1)).alias("n_common")))
    )


def dedup_banding_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-table simhash banding recall, measured per corpus: one
    row (n_banded, n_allpairs, n_missing, n_extra) comparing
    simhash_band_pairs at hamming <= 7 (9-block / C(9,2)-table Manku
    banding) against the brute-force all-pairs bit_count(xor) truth
    over the same signatures. The pigeonhole theorem says recall is
    deterministically 1.0 — so n_missing = n_extra = 0 and
    n_banded = n_allpairs on EVERY corpus, which this gate asserts
    against DuckDB's independently-computed all-pairs count (the
    dedup_eval_recall device, applied to the deterministic banding
    family)."""
    banded = dedup.simhash_band_pairs(_docs(spark, sf_dir), 7) \
        .select("a", "b")
    sig = dedup.simhash64(_docs(spark, sf_dir))
    l = sig.select(F.col("doc_id").alias("a"),
                   F.col("simhash").alias("_sa"))
    r = sig.select(F.col("doc_id").alias("b"),
                   F.col("simhash").alias("_sb"))
    allp = (
        l.crossJoin(r).where(F.col("a") < F.col("b"))
        .where(F.bit_count(F.col("_sa").bitwiseXOR(F.col("_sb"))) <= 7)
        .select("a", "b")
    )
    return (
        banded.agg(F.count(F.lit(1)).alias("n_banded"))
        .crossJoin(allp.agg(F.count(F.lit(1)).alias("n_allpairs")))
        .crossJoin(
            allp.join(banded, ["a", "b"], "left_anti")
            .agg(F.count(F.lit(1)).alias("n_missing")))
        .crossJoin(
            banded.join(allp, ["a", "b"], "left_anti")
            .agg(F.count(F.lit(1)).alias("n_extra")))
    )


def events_reciprocal_transitions(
    spark: SparkSession, sf_dir: str,
) -> DataFrame:
    """Reciprocal behavior pairs: unordered event-type pairs whose
    first-order Markov transitions run in BOTH directions
    (type_a, type_b, n_ab, n_ba) — the cyclic-behavior signal
    (browse<->purchase loops) a one-way funnel analysis misses. One
    self-join of the (|types|^2-bounded) transition table on the
    swapped key, canonical a < b orientation; self-loops excluded."""
    t = events.transitions(
        spark.read.parquet(f"{sf_dir}/events.parquet"))
    a = t.select(F.col("from_type").alias("ta"),
                 F.col("to_type").alias("tb"),
                 F.col("n").alias("n_ab"))
    b = t.select(F.col("to_type").alias("ta"),
                 F.col("from_type").alias("tb"),
                 F.col("n").alias("n_ba"))
    return (
        a.join(b, ["ta", "tb"])
        .where(F.col("ta") < F.col("tb"))
        .select(F.col("ta").alias("type_a"),
                F.col("tb").alias("type_b"), "n_ab", "n_ba")
    )


def olap_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 (ops/olap.market_share): per-year national market
    share as an exact BIGINT rational (share_num_cc / share_den_cc) —
    no float division ever hashed."""
    from .ops import olap

    return olap.market_share(spark, sf_dir)


def olap_shipmode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 (ops/olap.shipmode_priority): late-line priority
    counts per synthetic shipmode MODES[(orderkey+linenumber) % 4] —
    the lake carries no shipmode column, so both engines state the
    same deterministic formula."""
    from .ops import olap

    return olap.shipmode_priority(spark, sf_dir)


def olap_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 (ops/olap.top_supplier): max-quarterly-revenue
    supplier(s) via a single-row broadcast max joined back — the
    view-vs-max formulation without a collect."""
    from .ops import olap

    return olap.top_supplier(spark, sf_dir)


def olap_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 (ops/olap.small_qty_revenue): brand revenue from
    below-half-average-quantity lines, the avg test cross-multiplied
    into BIGINTs (qty*2*n < sum_qty)."""
    from .ops import olap

    return olap.small_qty_revenue(spark, sf_dir)


def olap_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 (ops/olap.waiting_suppliers): suppliers who were the
    only late contributor on finished multi-supplier orders — EXISTS
    as LEFT SEMI, NOT EXISTS as LEFT ANTI, both with the
    suppkey-inequality residual."""
    from .ops import olap

    return olap.waiting_suppliers(spark, sf_dir)


def olap_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 (ops/olap.sales_opportunity): customers with no
    orders since 2001 whose balance beats their country-code cohort's
    positive-balance average (cross-multiplied), code =
    c_nationkey % 10 — the lake has no phone column."""
    from .ops import olap

    return olap.sales_opportunity(spark, sf_dir)


def olap_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 (ops/olap.min_cost_supplier) over the derived
    partsupp (distinct fact pairs + closed-form cost columns — the
    lake has no partsupp table): per-part argmin supply cost among
    EUROPE suppliers as MIN-join-back, never a global-sort window."""
    from .ops import olap

    return olap.min_cost_supplier(spark, sf_dir)


def olap_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 (ops/olap.product_type_profit): per (nation, year)
    profit with revenue and supply cost in the same BIGINT
    centi-cent·percent scale; the composite (partkey, suppkey) join
    is the non-star shuffle stress."""
    from .ops import olap

    return olap.product_type_profit(spark, sf_dir)


def olap_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 (ops/olap.important_stock): per-part supply value of
    one nation vs a broadcast global total, threshold
    cross-multiplied (value·100 > total·1)."""
    from .ops import olap

    return olap.important_stock(spark, sf_dir)


def olap_parts_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 (ops/olap.parts_supplier_counts): distinct-supplier
    counts per (brand, type, size) with brand/type/size exclusions
    and the complaint NOT-IN as a broadcast LEFT ANTI join."""
    from .ops import olap

    return olap.parts_supplier_counts(spark, sf_dir)


def olap_part_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 (ops/olap.part_promotion_suppliers): suppliers whose
    availqty beats half their year's shipped quantity on a
    promotion-candidate part (cross-multiplied, zero-ship pairs
    qualify via the left join's zero path)."""
    from .ops import olap

    return olap.part_promotion_suppliers(spark, sf_dir)


def graph_clustering_coeff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node local clustering coefficient as the exact rational
    (n_triangles, n_wedges) over the Jaccard ≥ 0.8 near-duplicate
    pair graph (ops/graph.clustering_coefficient) — clique-like
    template families read cc → 1, chain accretion cc → 0."""
    pairs = _jaccard_pairs08(spark, sf_dir)
    return graph.clustering_coefficient(
        pairs.select(F.col("a").alias("src"), F.col("b").alias("dst"))
    )


def events_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort LTV curve (ops/events.cohort_ltv): per
    (cohort_week, week_age) user counts, landed revenue in integer
    cents, and the running cumulative — the window runs on the
    cohort×age aggregate, never the fact table."""
    return events.cohort_ltv(
        spark.read.parquet(f"{sf_dir}/events.parquet")
    )


def curation_kanonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit (ops/pii.k_anonymity, k=5) over the corpus
    quasi-identifiers (lang, source, 100-char length bucket): per
    equivalence class its size and safe flag — the
    re-identification-risk companion to curation_pii's direct
    identifier scan."""
    from .ops import pii

    d = _docs(spark, sf_dir).select(
        "lang", "source",
        F.expr("n_chars div 100").cast("bigint").alias("len_bucket"),
    )
    return pii.k_anonymity(d, ("lang", "source", "len_bucket"), k=5)


def multimodal_jpeg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Baseline-JPEG decode gate (ops/multimodal.decode_jpeg via the
    decode_assets Arrow kernel) over synth_jpeg_assets' block-constant
    grayscale fixtures: real canonical-Huffman entropy decode, DC
    prediction, dequantize, IDCT — integer-exact on these assets by
    construction (DC-only blocks under the uniform q=8 table), so the
    oracle restates the closed-form block-pixel formula. Nulls
    coalesce to -1 like multimodal_decode."""
    assets = multimodal.synth_jpeg_assets(_docs(spark, sf_dir))
    out = multimodal.decode_assets(assets)
    return out.select(
        "doc_id", "kind",
        *[F.coalesce(F.col(c), F.lit(-1)).cast("bigint").alias(c)
          for c in ("width", "height", "pixel_sum", "first_px",
                    "sample_rate", "n_samples", "sample_sum",
                    "first_sample", "duration_us")],
    )


def events_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 third-order behavior paths (ops/events.path_triples):
    consecutive event-type triples per user's ordered stream, the
    "top paths" report above transitions()'s pair table."""
    return events.path_triples(
        spark.read.parquet(f"{sf_dir}/events.parquet")
    )


def text_ttr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc type-token ratio as the exact (n_types, n_tokens)
    integer pair (ops/text.lexical_diversity) under the shared
    word_array tokenization contract."""
    return text.lexical_diversity(_docs(spark, sf_dir))


def kg_ifp_sameas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverse-functional-property sameAs inference
    (ops/ontology.ifp_sameas) over a synthetic multi-asserted claim
    mix: every customer asserts an mbox (shared in contiguous blocks
    of 5) and a homepage (blocks of 11), each order RE-asserts its
    customer's mbox (the at-least-once claim duplication the dedup
    must collapse), and a non-IFP segment predicate rides along and
    must be ignored. Block-DIV values keep witness-bucket sizes
    scale-invariant (5 and 11 at every SF) — the gate runs the exact
    uncapped path; max_bucket is the stated corpus-scale skew guard.
    The oracle restates the filtered self-join."""
    from .ops import ontology

    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    subj = F.concat(F.lit("c"), F.col("c_custkey").cast("string"))
    claims = (
        c.select(
            subj.alias("s"), F.lit("mbox").alias("p"),
            F.concat(F.lit("m"), F.expr("c_custkey DIV 5")).alias("o"))
        .unionByName(c.select(
            subj.alias("s"), F.lit("home").alias("p"),
            F.concat(F.lit("h"), F.expr("c_custkey DIV 11")).alias("o")))
        .unionByName(c.select(
            subj.alias("s"), F.lit("seg").alias("p"),
            F.col("c_mktsegment").alias("o")))
        .unionByName(o.select(
            F.concat(F.lit("c"), F.col("o_custkey").cast("string"))
            .alias("s"),
            F.lit("mbox").alias("p"),
            F.concat(F.lit("m"), F.expr("o_custkey DIV 5")).alias("o")))
    )
    return ontology.ifp_sameas(claims, ["mbox", "home"])


def kg_disambiguate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-overlap entity disambiguation
    (ops/fuse.disambiguate_by_context): every 50th document is an
    entity "description", the rest are mentions; surfaces collide mod
    5 so each mention faces several candidates at every SF, and the winner is the
    candidate whose first-20-token description shares the most
    DISTINCT tokens with the mention's first-20-token context
    (tie: entity_id asc). Real Zipfian document text drives the
    scores; the oracle restates the sparse posting join + argmax."""
    from .ops import fuse

    d = _docs(spark, sf_dir)
    toks = F.slice(F.split(F.col("text"), " "), 1, 20)
    cands = d.where(F.col("doc_id") % 50 == 0).select(
        F.concat(F.lit("s"), F.expr("(doc_id DIV 50) % 5"))
        .alias("surface"),
        F.concat(F.lit("e"), F.col("doc_id").cast("string"))
        .alias("entity_id"),
        toks.alias("tokens"),
    )
    mentions = d.where(F.col("doc_id") % 50 != 0).select(
        F.col("doc_id").alias("mention_id"),
        F.concat(F.lit("s"), F.expr("doc_id % 5")).alias("surface"),
        toks.alias("tokens"),
    )
    return fuse.disambiguate_by_context(mentions, cands)


def events_markov_stationary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-point-integer Markov mass vector
    (ops/graph.markov_stationary, 4 synchronous power steps) over the
    first-order transition counts of every user's ts-ordered event
    stream (ops/events.transitions) — the next-event-prediction /
    frontier-ordering prior. Same BIGINT floor-division charter as
    pagerank (absorbing states leak mass; deterministic across
    engines), so the oracle unrolls the identical four steps."""
    trans = events.transitions(
        spark.read.parquet(f"{sf_dir}/events.parquet")
    ).select(
        F.col("from_type").alias("src"), F.col("to_type").alias("dst"),
        "n",
    )
    return graph.markov_stationary(trans, iterations=4)


def graph_squares(spark: SparkSession, sf_dir: str) -> DataFrame:
    """4-cycle census (ops/graph.square_pairs) on a deterministic
    100-wide grid-with-diagonals graph keyed off part: node k joins
    k+1 (unless at the right wall), k+100 (unless in the dropped
    band every 10th row — forces boundary handling), and k+101 (the
    diagonal, making common-neighbor counts vary 2–4). Emits every
    diagonal pair with ≥ 2 common neighbors and its C(c,2) cycle
    count; total squares = Σ c4_pairs / 2. The oracle recomputes the
    wedge join from the same closed-form edge list."""
    p = spark.read.parquet(f"{sf_dir}/part.parquet")
    k = F.col("p_partkey")
    node = lambda e: F.concat(F.lit("g"), F.expr(e))  # noqa: E731
    right = p.where(k % 100 != 99).select(
        node("p_partkey").alias("src"),
        node("p_partkey + 1").alias("dst"))
    down = p.where(F.expr("(p_partkey DIV 100) % 10") != 9).select(
        node("p_partkey").alias("src"),
        node("p_partkey + 100").alias("dst"))
    diag = p.where(
        (k % 100 != 99) & (F.expr("(p_partkey DIV 100) % 10") != 9)
    ).select(
        node("p_partkey").alias("src"),
        node("p_partkey + 101").alias("dst"))
    return graph.square_pairs(
        right.unionByName(down).unionByName(diag), min_common=2
    )


def kg_ntriples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table-lane N-Triples export (rdf/serialize.ntriples_lines —
    the codegen'd twin of the driver-side Term.n3 serializer) over a
    synthetic triple set whose odd-key literals embed every character
    the wire format must escape (backslash, quote, LF, CR) plus a TAB
    that must stay literal; even keys are IRI objects. The oracle
    rebuilds the exact lines with chr()-level replaces, so a single
    mis-ordered escape flips the hash."""
    from .rdf.serialize import ntriples_lines

    p = spark.read.parquet(f"{sf_dir}/part.parquet")
    nasty = F.concat(
        F.lit("v"), F.col("p_partkey").cast("string"),
        F.lit(' say "hi" \\ '), F.expr("char(10)"), F.expr("char(13)"),
        F.lit("\tend"),
    )
    triples = p.select(
        F.concat(F.lit("http://x.test/s"),
                 F.col("p_partkey").cast("string")).alias("s"),
        F.concat(F.lit("http://x.test/p"),
                 (F.col("p_partkey") % 3).cast("string")).alias("p"),
        F.when(
            F.col("p_partkey") % 2 == 0,
            F.concat(F.lit("http://x.test/o"),
                     (F.col("p_partkey") % 50).cast("string")),
        ).otherwise(nasty).alias("o"),
        (F.col("p_partkey") % 2 == 0).alias("o_is_iri"),
    )
    return ntriples_lines(triples)


def kg_skolemize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic bnode skolemization (ops/ontology.skolemize) over
    a synthetic triple mix: every third subject and every tenth
    object is a blank node; skolem IRIs are base+md5(label), so the
    oracle recomputes them with SQL md5 and a single case-branch slip
    (wrong label offset, literal accidentally skolemized, o_is_iri
    not flipped) breaks the hash."""
    from .ops import ontology

    p = spark.read.parquet(f"{sf_dir}/part.parquet")
    k = F.col("p_partkey")
    triples = p.select(
        F.when(k % 3 == 0,
               F.concat(F.lit("_:b"), k.cast("string")))
        .otherwise(F.concat(F.lit("http://x.test/s"), k.cast("string")))
        .alias("s"),
        F.concat(F.lit("http://x.test/p"),
                 (k % 4).cast("string")).alias("p"),
        F.when(k % 10 == 0, F.concat(F.lit("_:ob"), k.cast("string")))
        .when(k % 2 == 0,
              F.concat(F.lit("http://x.test/o"), (k % 50).cast("string")))
        .otherwise(F.concat(F.lit("lit "), k.cast("string")))
        .alias("o"),
        ((k % 10 != 0) & (k % 2 == 0)).alias("o_is_iri"),
    )
    return ontology.skolemize(triples).select(
        "s", "p", "o", F.col("o_is_iri").cast("string").alias("o_is_iri")
    )


def kg_disjoint_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """owl:disjointWith audit (ops/ontology.disjoint_violations):
    entities carry two type generators (mod-6 and 6+mod-4 classes,
    re-asserted once to exercise the dedup), the axiom table carries
    a symmetric duplicate and a self-disjointness that must both be
    canonicalized away; violations are the mod-12 residue classes the
    oracle states directly."""
    from .ops import ontology

    p = spark.read.parquet(f"{sf_dir}/part.parquet")
    ent = F.concat(F.lit("e"), F.col("p_partkey").cast("string"))
    t1 = p.select(ent.alias("s"),
                  F.concat(F.lit("C"), (F.col("p_partkey") % 6)
                           .cast("string")).alias("cls"))
    t2 = p.select(ent.alias("s"),
                  F.concat(F.lit("C"), (F.col("p_partkey") % 4 + 6)
                           .cast("string")).alias("cls"))
    types = t1.unionByName(t2).unionByName(t1)
    axioms = spark.createDataFrame(
        [("C0", "C6"), ("C1", "C7"), ("C8", "C2"),
         ("C3", "C3"), ("C6", "C0")],
        "c1 string, c2 string",
    )
    return ontology.disjoint_violations(types, axioms)


def events_session_window_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engine-native streaming session windows
    (streaming/stateful.streaming_session_windows — Spark's built-in
    session_window aggregation with watermark state eviction, the
    no-Python sibling of events_sessionize_stream) over the in-order
    chunked replay; sentinel chunks flush every real session, so the
    emitted set equals the batch gap-sessionization with the
    built-in's >=-gap boundary rule — the oracle."""
    from .streaming.stateful import session_window_replay_closed

    return session_window_replay_closed(spark, f"{sf_dir}/events.parquet")


def sketch_hll_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch mergeability contract (ops/sketch.hll_registers →
    hll_merge → hll_estimate): per-(lang, source) register tables —
    the state a 100 TB pipeline ships instead of raw keys — union-
    merged by register-wise max down to lang and estimated. The
    oracle computes per-lang registers DIRECTLY from all rows, so the
    gate passes iff merge(partials) ≡ global (max-associativity of
    the implementation, bucket alignment, empty-register handling)."""
    from .ops import sketch
    from .ops.text import word_array

    words = (
        _docs(spark, sf_dir)
        .select("lang", "source", F.explode(word_array()).alias("word"))
        .where(F.col("word") != "")
    )
    partials = sketch.hll_registers(
        words, F.col("word"), group_cols=("lang", "source")
    )
    merged = sketch.hll_merge(partials, group_cols=("lang",))
    return sketch.hll_estimate(merged, group_cols=("lang",))


def graph_conductance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-community conductance terms (ops/graph.conductance) of the
    4-round LPA labeling over the Jaccard ≥ 0.8 near-dup pair graph —
    (cut, volume, min-denominator) as exact integers; the boundary-
    mass quality score that complements graph_modularity's density
    functional on the same labeling. The oracle nests the identical
    LPA unroll and states cut/volume directly."""
    pairs = _jaccard_pairs08(spark, sf_dir)
    edges = pairs.select(F.col("a").alias("src"), F.col("b").alias("dst"))
    labels = graph.label_propagation(edges, rounds=4).select(
        "node", "community"
    )
    return graph.conductance(edges, labels)


def kg_datatype_inference(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed-literal emission pass (ops/ontology
    .infer_literal_datatype): six closed-form lexical families built
    from part keys — plain/negative integers, decimals, booleans,
    dates, dateTimes, and free text — each stamped with its xsd
    datatype by the anchored-regex gates; the oracle restates the
    same gates with SQL regexp_matches, so a mis-anchored pattern or
    wrong rule order flips the hash."""
    from .ops import ontology

    p = spark.read.parquet(f"{sf_dir}/part.parquet")
    k = F.col("p_partkey")
    lex = (
        F.when(k % 6 == 0, F.concat(F.lit("12"), k.cast("string")))
        .when(k % 6 == 1, F.concat(F.lit("-"), k.cast("string")))
        .when(k % 6 == 2,
              F.concat(k.cast("string"), F.lit("."),
                       (k % 100).cast("string")))
        .when(k % 6 == 3,
              F.when(k % 2 == 1, F.lit("true")).otherwise(F.lit("false")))
        .when(k % 6 == 4,
              F.concat(F.lit("19"), (92 + k % 8).cast("string"),
                       F.lit("-0"), (1 + k % 9).cast("string"),
                       F.lit("-1"), (k % 10).cast("string")))
        .otherwise(
            F.when(k % 12 == 5,
                   F.concat(F.lit("19"), (92 + k % 8).cast("string"),
                            F.lit("-0"), (1 + k % 9).cast("string"),
                            F.lit("-1"), (k % 10).cast("string"),
                            F.lit("T0"), (k % 10).cast("string"),
                            F.lit(":00:0"), (k % 6).cast("string"),
                            F.lit("Z")))
            .otherwise(F.concat(F.lit("plain "), k.cast("string"))))
    )
    return p.select(
        k.cast("string").alias("key"),
        lex.alias("lex"),
        ontology.infer_literal_datatype(lex).alias("datatype"),
    )


def kg_acronym_link(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Acronym-alias candidate generation (ops/ontology
    .acronym_candidates): a synthetic multi-word dictionary (a FIXED
    40-entity key range so 'Alpha <d> Beta <d>' name families collide
    ~2 entities per acronym at every SF — the candidate-not-decision
    contract with a bounded fan-out) against
    a mention stream where every third order emits the acronym
    surface in varying case; the oracle re-derives word-initial
    acronyms with SQL list_transform."""
    from .ops import ontology

    n = spark.read.parquet(f"{sf_dir}/part.parquet")
    entities = n.where(
        (F.col("p_partkey") % 5 == 0) & (F.col("p_partkey") < 200)
    ).select(
        F.concat(F.lit("e"), F.col("p_partkey").cast("string"))
        .alias("entity_id"),
        F.concat(
            F.lit("Alpha "), (F.col("p_partkey") % 7).cast("string"),
            F.lit(" Beta "), (F.col("p_partkey") % 3).cast("string"),
        ).alias("name"),
    )
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    mentions = o.where(F.col("o_orderkey") % 3 == 0).select(
        F.col("o_orderkey").alias("mention_id"),
        F.concat(
            F.when(F.col("o_orderkey") % 2 == 0, F.lit("A"))
            .otherwise(F.lit("a")),
            (F.col("o_orderkey") % 7).cast("string"),
            F.when(F.col("o_orderkey") % 4 == 0, F.lit("B"))
            .otherwise(F.lit("b")),
            (F.col("o_orderkey") % 3).cast("string"),
        ).alias("surface"),
    )
    return ontology.acronym_candidates(entities, mentions)


def curation_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust MAD outlier flags on per-language document lengths
    (ops/text.mad_outliers, k=3): lower-median order statistics for
    both center and spread, pure integer comparisons; the oracle
    restates the two-stage selection with SQL windows."""
    return text.mad_outliers(_docs(spark, sf_dir), k=3)


def events_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak simultaneous sessions per hour (ops/events
    .session_concurrency — sweep-line deltas + HIERARCHICAL two-level
    prefix sum: fully-parallel within-day running sums, calendar-
    bounded cross-day carry) over the gap-sessionized events table;
    the oracle runs the flat single-sequence running sum, so the gate
    passes iff the day-split carry math is exact."""
    sess = events.sessionize(
        spark.read.parquet(f"{sf_dir}/events.parquet")
    )
    return events.session_concurrency(sess)


def events_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type hourly CUSUM drift alarms (ops/events.cusum_alarms,
    k = 1.5×mean, h = 4k): the recurrence evaluated through the exact
    prefix-min identity in scaled integers; the oracle restates the
    identical two windows."""
    return events.cusum_alarms(
        spark.read.parquet(f"{sf_dir}/events.parquet")
    )


def dedup_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-priority canonical selection for near-dup clusters —
    the dedup policy production corpora actually want (keep the BEST
    member, not the smallest id): the LSH→CC cluster labeling
    (dedup_components) joined to the quality profile
    (text.quality_scores) and argmax'd per component by
    (is_quality desc, n_words desc, doc_id asc). Output one row per
    clustered doc with its cluster's chosen canonical and a demotion
    flag — the anti-join input for the keep-best dedup pass. The
    oracle nests the verified components SQL and restates the argmax.
    """
    from pyspark.sql import Window

    labels = dedup_components(spark, sf_dir)
    q = text.quality_scores(_docs(spark, sf_dir))
    joined = labels.join(q, "doc_id")
    w = (
        Window.partitionBy("component")
        .orderBy(F.col("is_quality").desc(), F.col("n_words").desc(),
                 F.col("doc_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return joined.select(
        "doc_id", "component",
        F.first("doc_id").over(w).alias("canonical_id"),
    ).withColumn(
        "demoted",
        F.when(F.col("doc_id") != F.col("canonical_id"), F.lit(1))
        .otherwise(F.lit(0)),
    )


def events_late_data_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark late-data DROP semantics
    (streaming/stateful.late_replay_closed): every 17th event arrives
    2 h event-time-late; tumbling counts must exclude exactly the
    rows whose window end the inter-batch watermark had already
    passed. The oracle states the admission rule in closed form over
    the same deterministic chunking."""
    from .streaming.stateful import late_replay_closed

    return late_replay_closed(spark, f"{sf_dir}/events.parquet")


def rank_mrr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-integer MRR@10 (ops/rank.mrr_at_k, scale = lcm(1..10) =
    2520) over the rank_eval first-relevant-rank frame; the oracle
    nests the verified ranking SQL and restates the scaled sum."""
    d = _docs(spark, sf_dir).withColumn("rel", F.col("doc_id") % 13 == 0)
    return rank.mrr_at_k(rank.first_relevant_rank(d, _RRF_TERMS), k=10)


def events_abtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic A/B bucketing + per-variant metric rollup
    (ops/events.ab_assign_metrics: md5 user bucketing, integer-cents
    value sums, exact distinct users); the oracle restates the hash
    assignment and aggregates."""
    return events.ab_assign_metrics(
        spark.read.parquet(f"{sf_dir}/events.parquet")
    )


def sketch_cms_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CMS mergeability contract (ops/sketch.cms_table per source →
    cms_merge by counter addition → cms_estimate): the additive twin
    of sketch_hll_merge — the oracle computes the global sketch
    DIRECTLY, so the gate passes iff merge(per-source partials) ≡
    global. Candidates are the fixed query-term list."""
    from .ops import sketch as sk

    d = _docs(spark, sf_dir)
    words = d.select(
        "source",
        F.explode(
            F.filter(F.split(F.trim("text"), " +"),
                     lambda w: w != "")
        ).alias("word"),
    )
    sources = [r.source for r in words.select("source")
               .distinct().collect()]
    tables = [
        sk.cms_table(words.where(F.col("source") == s_),
                     F.col("word"))
        for s_ in sorted(sources)
    ]
    merged = sk.cms_merge(tables)
    cands = words.sparkSession.createDataFrame(
        [(t,) for t in _RRF_TERMS], "word string"
    )
    return sk.cms_estimate(merged, cands, "word")


def olap_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lakehouse time travel (streaming/stream.cdc_time_travel_replay):
    read snapshot VERSION 2 of the 4-chunk CDC fold — the oracle is
    the batch MERGE over exactly the first two chunks' changelog
    prefix, so the gate pins both the versioned-commit line and the
    prefix-equivalence contract."""
    from .streaming.stream import cdc_time_travel_replay

    return cdc_time_travel_replay(spark, sf_dir)


def graph_bowtie(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broder bow-tie decomposition (ops/graph.bowtie) of a synthetic
    directed web-shaped graph: a 20-node core ring, fixed IN and OUT
    fringes, tendrils hanging off IN, and a disconnected pair family
    (all node sets SF-invariant via bounded key ranges, so the
    closure stays tiny at every SF). The oracle recomputes SCC via a
    recursive closure + mutual join and the two reachability passes
    as recursive CTEs."""
    p = spark.read.parquet(f"{sf_dir}/part.parquet")
    k = F.col("p_partkey")
    c = lambda e: F.concat(F.lit("c"), F.expr(e).cast("string"))  # noqa: E731
    ring = p.where(k <= 20).select(
        c("p_partkey % 20").alias("src"),
        c("(p_partkey + 1) % 20").alias("dst"))
    fin = p.where((k % 7 == 0) & (k <= 140)).select(
        F.concat(F.lit("i"), k.cast("string")).alias("src"),
        c("p_partkey % 20").alias("dst"))
    fout = p.where((k % 5 == 0) & (k <= 100)).select(
        c("p_partkey % 20").alias("src"),
        F.concat(F.lit("o"), k.cast("string")).alias("dst"))
    tend = p.where((k % 7 == 0) & (k <= 140)).select(
        F.concat(F.lit("i"), k.cast("string")).alias("src"),
        F.concat(F.lit("t"), k.cast("string")).alias("dst"))
    disc = p.where((k % 11 == 0) & (k <= 110)).select(
        F.concat(F.lit("x"), k.cast("string")).alias("src"),
        F.concat(F.lit("y"), k.cast("string")).alias("dst"))
    edges = ring.unionByName(fin).unionByName(fout) \
        .unionByName(tend).unionByName(disc)
    return graph.bowtie(edges)


def kg_schema_alignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Instance-based predicate alignment
    (ops/ontology.align_predicates): source A asserts lineitem facts
    under an 'a'-vocabulary, source B re-asserts 80% of the same
    (s, o) pairs under a 'b'-vocabulary (k % 5 != 0 survives) plus
    its own noise family — aligned pairs share statements, noise
    pairs fall under min_shared. The oracle restates the evidence
    join."""
    from .ops import ontology

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    s = F.concat(F.lit("e"), (F.col("l_orderkey") % 500).cast("string"))
    o = F.concat(F.lit("v"), (F.col("l_partkey") % 120).cast("string"))
    left = li.select(
        s.alias("s"),
        F.concat(F.lit("a"), (F.col("l_linenumber") % 3).cast("string"))
        .alias("p"),
        o.alias("o"),
    )
    right = li.where(F.col("l_suppkey") % 5 != 0).select(
        s.alias("s"),
        F.concat(F.lit("b"), (F.col("l_linenumber") % 3).cast("string"))
        .alias("p"),
        o.alias("o"),
    ).unionByName(li.select(
        s.alias("s"), F.lit("bnoise").alias("p"),
        F.concat(F.lit("w"), (F.col("l_suppkey") % 7).cast("string"))
        .alias("o"),
    ))
    return ontology.align_predicates(left, right)


def rank_ndcg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-integer NDCG@10 (ops/rank.ndcg_at_k): graded relevance
    (3 / 1 / 0 by doc_id residue) over the per-term tf ranking, DCG
    weights from the FIXED build-time integer table
    ndcg_weight_table(10) shared verbatim with the oracle — no engine
    ever evaluates log2. NDCG = dcg_scaled/idcg_scaled is consumer
    division (the mrr num/den charter)."""
    d = _docs(spark, sf_dir)
    gain = (
        F.when(F.col("doc_id") % 13 == 0, F.lit(3))
        .when(F.col("doc_id") % 7 == 0, F.lit(1))
        .otherwise(F.lit(0))
    )
    ranked = rank.graded_ranking(d, _RRF_TERMS, gain)
    return rank.ndcg_at_k(ranked, k=10)


def sketch_kmv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV mergeability contract (ops/sketch.kmv_table per source →
    kmv_merge → kmv_estimate): the third sketch algebra beside HLL
    (max-⊕) and CMS (sum-⊕) — union-then-re-take-k-smallest. The
    oracle builds the k-minimum set DIRECTLY from all rows, so the
    gate passes iff merge(per-source partials) ≡ global sketch
    (idempotent union, ordering, the exact (k−1)·2^52 DIV kth_hash
    estimator and the k_used < k exact-count branch)."""
    from .ops import sketch as sk

    d = _docs(spark, sf_dir)
    words = d.select(
        "source",
        F.explode(
            F.filter(F.split(F.trim("text"), " +"), lambda w: w != "")
        ).alias("word"),
    )
    sources = [r.source for r in words.select("source")
               .distinct().collect()]
    tables = [
        sk.kmv_table(words.where(F.col("source") == s_),
                     F.col("word"), k=64)
        for s_ in sorted(sources)
    ]
    merged = sk.kmv_merge(tables, k=64)
    return sk.kmv_estimate(merged, k=64)


def text_chi2_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source chi-square keywords (ops/text.chi2_keywords): the
    top-5 words whose document frequency is most source-skewed, with
    the Pearson statistic carried as the exact integral
    (N·(ad−bc)²·10⁴) DIV denominator in DECIMAL(38,0) — the oracle
    restates the contingency algebra in HUGEINT."""
    return text.chi2_keywords(_docs(spark, sf_dir), top_n=5)


def dedup_cdc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunking + chunk-level sharing profile
    (ops/dedup.cdc_chunks → cdc_shared_stats): Rabin rolling-hash
    boundaries (window 8, mask 2⁶) make identical passages chunk
    identically across documents; the per-doc (n_chunks,
    n_shared_chunks) profile is the chunk-level containment signal.
    The Arrow kernel is a vectorized sliding-window dot; the oracle
    restates the boundary rule position-by-position in SQL."""
    return dedup.cdc_shared_stats(dedup.cdc_chunks(_docs(spark, sf_dir)))


def multimodal_dhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual difference-hash (ops/multimodal.image_dhash) over
    the decoded synthetic BMPs: gradient-sign bits, the exposure-
    invariant sibling of multimodal_ahash — the oracle recomputes
    every bit from the pixel formula in closed form."""
    assets = multimodal.synth_assets(_docs(spark, sf_dir))
    return multimodal.image_dhash(assets)


def graph_eccentricity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Landmark eccentricity profile (ops/graph.landmark_distances →
    eccentricity_profile) over the Jaccard ≥ 0.8 near-dup pair graph:
    per-landmark (n_reached, ecc) within 4 hops — max ecc lower-
    bounds the diameter, min the radius. Landmarks = the 5 smallest
    doc_ids that appear in the pair graph (deterministic, degree-
    agnostic). The oracle unrolls 4 rounds of per-seed min-hop
    relaxation over the same pair set."""
    pairs = _jaccard_pairs08(spark, sf_dir)
    seeds = (
        pairs.select(F.col("a").alias("node"))
        .unionByName(pairs.select(F.col("b").alias("node")))
        .distinct().orderBy("node").limit(5)
    )
    return graph.eccentricity_profile(
        pairs.select(F.col("a").alias("src"), F.col("b").alias("dst")),
        seeds, max_hops=4,
    )


def events_cuped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED sufficient statistics (ops/events.cuped_stats): per
    md5-sticky variant the exact-integer (n_users, Σx, Σy, Σx², Σxy)
    over pre/post landed cents split at the stream's temporal
    midpoint — θ and the adjusted lift are consumer arithmetic. The
    oracle computes the same midpoint in a scalar CTE and restates
    the two-level aggregate."""
    return events.cuped_stats(
        spark.read.parquet(f"{sf_dir}/events.parquet")
    )


def text_rake(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level RAKE keywords (ops/text.rake_keywords): stopword-
    delimited phrase islands, word deg/freq as exact integers, score
    as (deg·10⁴) DIV freq, top-10 via TakeOrderedAndProject. The
    oracle restates the gaps-and-islands segmentation in SQL."""
    return text.rake_keywords(_docs(spark, sf_dir), top_n=10)


def sketch_kmv_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise source-overlap estimates from KMV sketches
    (ops/sketch.kmv_pair_jaccard): the set-INTERSECTION estimate KMV
    supports and HLL cannot — per source pair the k smallest hashes
    of the union with two-sided membership counts. The oracle builds
    every sketch and union rank directly with windows."""
    from .ops import sketch as sk

    d = _docs(spark, sf_dir)
    words = d.select(
        "source",
        F.explode(
            F.filter(F.split(F.trim("text"), " +"), lambda w: w != "")
        ).alias("word"),
    )
    return sk.kmv_pair_jaccard(words, F.col("word"), "source", k=64)


def graph_harmonic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Landmark harmonic centrality (ops/graph.harmonic_centrality)
    over the Jaccard ≥ 0.8 pair graph — Σ scale DIV dist with
    scale = lcm(1..4), the integer-exact sampled-centrality estimate
    (HyperBall's bounded-radius twin); same 5 smallest-doc-id
    landmarks as graph_eccentricity, so the two gates pin the same
    landmark_distances frame from two different aggregates."""
    pairs = _jaccard_pairs08(spark, sf_dir)
    seeds = (
        pairs.select(F.col("a").alias("node"))
        .unionByName(pairs.select(F.col("b").alias("node")))
        .distinct().orderBy("node").limit(5)
    )
    return graph.harmonic_centrality(
        pairs.select(F.col("a").alias("src"), F.col("b").alias("dst")),
        seeds, max_hops=4,
    )


def events_attribution_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-touch attribution sufficient statistics
    (ops/events.attribution_touch_stats): per channel the exact
    first/last/middle/solo touch counts over each user's pre-
    first-purchase path — U-shaped/linear credit is consumer
    arithmetic (per-touch fractions have data-dependent denominators
    and cannot cross engines). The oracle ranks the same paths from
    both ends with windows."""
    return events.attribution_touch_stats(
        spark.read.parquet(f"{sf_dir}/events.parquet")
    )


def events_survival(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier churn sufficient table (ops/events.survival_table):
    per observed lifetime the at-risk/churned/censored integer counts
    with right-censoring at a 7-day horizon before the window end —
    Ŝ(t) is consumer arithmetic. The oracle restates the per-user
    envelope and the reverse running at-risk sum."""
    return events.survival_table(
        spark.read.parquet(f"{sf_dir}/events.parquet")
    )


def graph_cc_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental connected components equivalence gate
    (pipeline/cc.incremental_components): yesterday's labeling (pair
    edges with (a+b)%3 ≠ 0) + today's delta (the rest) must equal
    direct CC over the full Jaccard pair graph — the oracle computes
    the DIRECT closure, so the gate passes iff the quotient-graph
    merge is exact (new-node entry, label rewrite, min-id
    preservation). Same zero-padded string keys as dedup_components."""
    from .pipeline import cc as cc_mod

    pairs = _jaccard_pairs08(spark, sf_dir)
    pad = lambda c: F.lpad(c.cast("string"), 12, "0")  # noqa: E731
    e = pairs.select(pad(F.col("a")).alias("src"),
                     pad(F.col("b")).alias("dst"),
                     ((F.col("a") + F.col("b")) % 3 == 0).alias("_new"))
    base = e.where(~F.col("_new")).select("src", "dst")
    delta = e.where(F.col("_new")).select("src", "dst")
    labels = cc_mod.connected_components(base)
    merged = cc_mod.incremental_components(labels, delta)
    return merged.select(
        F.col("node").cast("bigint").alias("doc_id"),
        F.col("component").cast("bigint").alias("component"),
    )


def graph_mst(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Borůvka minimum spanning forest (ops/graph.boruvka_mst) over a
    ring-plus-pendants fixture (24-node weighted ring from the part
    keys, distinct weights (37·i) mod 101, one pendant per ring
    node): the MST of a ring is CLOSED-FORM — every edge except the
    heaviest, plus every pendant bridge — so the oracle states it
    directly while the operator runs the full multi-round
    pick-min/contract loop. Determinism beyond the fixture is pinned
    by the Kruskal property test in tests/test_ops.py."""
    p = spark.read.parquet(f"{sf_dir}/part.parquet")
    i = (F.col("p_partkey") - 1).cast("bigint")
    base = p.where(F.col("p_partkey") <= 24).select(i.alias("i"))
    n = lambda e: F.concat(F.lit("n"), F.expr(e).cast("string"))  # noqa: E731
    ring = base.select(
        n("i").alias("src"), n("(i + 1) % 24").alias("dst"),
        ((F.lit(37) * F.col("i")) % 101).alias("w"),
    )
    pend = base.select(
        n("i").alias("src"),
        F.concat(F.lit("p"), F.col("i").cast("string")).alias("dst"),
        (F.lit(200) + F.col("i")).alias("w"),
    )
    return graph.boruvka_mst(ring.unionByName(pend))


def text_oov(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer vocabulary coverage (ops/text.oov_rate): per source
    the token count and out-of-vocabulary mass against the corpus
    top-100 vocabulary (ties word-asc) — the UNK-rate audit before
    committing a vocab budget. The oracle restates the top-V cut and
    the left-join OOV flag."""
    return text.oov_rate(_docs(spark, sf_dir), vocab_size=100)


def multimodal_audio_landmarks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shazam-style constellation fingerprints
    (ops/multimodal.audio_landmarks) over oscillating WAV fixtures
    (synth_audio_tones — the plain ramp fixture has a monotonic
    energy curve and would make this gate vacuous): consecutive
    energy-local-max frame pairs with bit_length energy buckets —
    audio near-dup matching becomes an exact equi-join on
    (b1, b2, f2−f1). The oracle recomputes frame energies from the
    quadratic-phase sample formula and the landmark/pair windows in
    closed form."""
    assets = multimodal.synth_audio_tones(_docs(spark, sf_dir))
    return multimodal.audio_landmarks(assets)


def pack_curriculum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum staging (ops/pack.curriculum_stages): exact length-
    quantile stages via TakeOrderedAndProject boundary values (ties
    share the lower stage — value-deterministic) + md5 shuffle keys
    for write-time repartitionByRange. The oracle restates the k-th
    smallest boundary cut with ORDER/LIMIT subqueries."""
    return pack.curriculum_stages(_docs(spark, sf_dir))


def events_rate_burst(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window burst screen (ops/events.rate_bursts): per user
    the exact max events in any trailing 60 s window via a RANGE
    frame (no fixed-bucket edge-splitting, no O(n²) self-join) and
    the ≥5 bot flag. The oracle states the identical RANGE frame."""
    return events.rate_bursts(
        spark.read.parquet(f"{sf_dir}/events.parquet")
    )


def graph_reciprocity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed reciprocity (ops/graph.reciprocity) — the mutual-link
    spam signal beside kg_host_pagerank — over a designed directed
    fixture (the _link_pages crawl graph's +1/+7 ring edges are
    never mutual, which would make the gate vacuously zero): a
    20-node ring with every third ring edge reciprocated plus +5
    chords (SF-invariant via bounded part keys). n_edges = 47,
    n_reciprocated = 14. The oracle restates the edge set and the
    reverse-membership join."""
    p = spark.read.parquet(f"{sf_dir}/part.parquet")
    i = (F.col("p_partkey") - 1).cast("bigint")
    base = p.where(F.col("p_partkey").between(1, 20)) \
        .select(i.alias("i"))
    h = lambda e: F.concat(F.lit("h"), F.expr(e).cast("string"))  # noqa: E731
    ring = base.select(h("i").alias("src"), h("(i + 1) % 20").alias("dst"))
    back = base.where(F.col("i") % 3 == 0).select(
        h("(i + 1) % 20").alias("src"), h("i").alias("dst"))
    chord = base.select(h("i").alias("src"), h("(i + 5) % 20").alias("dst"))
    return graph.reciprocity(
        ring.unionByName(back).unionByName(chord)
    )


def ann_eval_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN recall meta-eval (ops/ann.topk_recall): IVF's top-5 hit
    count against the exact cosine top-5 per query — the measurement
    that prices IVF's stated recall sacrifice (the ANN twin of
    dedup_eval_recall). The oracle nests both verified twins and
    joins."""
    e = _emb(spark, sf_dir)
    q = e.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qvec"),
    )
    return ann.topk_recall(
        ann.cosine_topk(e, q, k=5), ann.ivf_topk(e, q, k=5)
    )


def rank_ap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-integer average precision @10 (ops/rank.ap_at_k) over
    the per-term tf ranking with doc_id%7 relevance — the order-
    sensitive mean completing the eval family; lcm(1..10) scaling,
    consumer division (the mrr charter). The oracle restates the
    running hit count and the scaled precision contributions."""
    d = _docs(spark, sf_dir)
    ranked = rank.graded_ranking(
        d, _RRF_TERMS,
        F.when(F.col("doc_id") % 7 == 0, F.lit(1)).otherwise(F.lit(0)),
    ).select("term", "rank", (F.col("gain") == 1).alias("rel"))
    return rank.ap_at_k(ranked, k=10)


def dedup_chunk_store(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunk-store snapshot delta (ops/dedup.chunk_store_delta): even
    doc_ids are yesterday's ingested store, odd doc_ids today's
    batch; one row of new/reused distinct-chunk counts and character
    mass — the storage question content-defined chunking exists to
    answer. The oracle composes the verified chunk CTE twice."""
    d = _docs(spark, sf_dir)
    old = dedup.cdc_chunks(d.where(F.col("doc_id") % 2 == 0))
    new = dedup.cdc_chunks(d.where(F.col("doc_id") % 2 == 1))
    return dedup.chunk_store_delta(old, new)


def graph_tree_betweenness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact tree edge betweenness (ops/graph.tree_edge_betweenness,
    Brandes-on-trees via parallel leaf pruning) over the Borůvka
    forest of the 24-ring+pendants fixture (partkeys 1..24 exactly,
    so the MST is closed-form: the ring minus its heaviest edge plus
    every pendant): each pendant edge carries 1·47 paths; the ring
    edge j positions from the break carries 2j·(48−2j). The oracle
    states exactly that."""
    p = spark.read.parquet(f"{sf_dir}/part.parquet")
    i = (F.col("p_partkey") - 1).cast("bigint")
    base = p.where(F.col("p_partkey").between(1, 24)).select(i.alias("i"))
    n = lambda e: F.concat(F.lit("n"), F.expr(e).cast("string"))  # noqa: E731
    ring = base.select(
        n("i").alias("src"), n("(i + 1) % 24").alias("dst"),
        ((F.lit(37) * F.col("i")) % 101).alias("w"),
    )
    pend = base.select(
        n("i").alias("src"),
        F.concat(F.lit("p"), F.col("i").cast("string")).alias("dst"),
        (F.lit(200) + F.col("i")).alias("w"),
    )
    mst = graph.boruvka_mst(ring.unionByName(pend))
    return graph.tree_edge_betweenness(
        mst.select(F.col("a").alias("src"), F.col("b").alias("dst"))
    )


# long enough to contain several content-defined boundaries of its
# own (verified offline: 7 internal boundary positions), so the
# chunks BETWEEN them are byte-identical across every doc that
# carries the footer — the mechanism the gate exists to exercise
_FOOTER = (" Copyright Example Corp. All rights reserved."
           " Contact admin at example dot test for help."
           " Terms of service apply. Privacy policy available."
           " Follow our newsletter for updates and offers."
           " This site uses deterministic cookies only."
           " Navigation home products about contact legal. Site ")


def text_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunk-granularity boilerplate detection
    (ops/dedup.boilerplate_chunks): every doc carries its source's
    shared footer (appended in the gate — the raw synthetic texts
    share no 64-char runs, which would make the gate vacuous); a
    chunk present in ≥ 50% of a source's docs is template mass. The
    oracle chunks the identical derived text via the parameterized
    chunk CTE and restates the share threshold."""
    d = _docs(spark, sf_dir).select(
        "doc_id", "source",
        F.concat(F.col("text"), F.lit(_FOOTER), F.col("source"),
                 F.lit(".")).alias("text"),
    )
    ch = dedup.cdc_chunks(d)
    return dedup.boilerplate_chunks(ch, d.select("doc_id", "source"))


def rank_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall rank agreement (ops/rank.kendall_topk) between two
    scorers over the SAME top-20 candidate pool per term (the
    rerank-audit setup: candidates from the tf retriever, second
    order from a recency proxy, doc_id mod 17 — disjoint top-k lists
    would make the pair count vacuous, so the pool is fixed first):
    exact concordant/discordant pair counts, τ is consumer
    arithmetic. The oracle restates the pool cut, both windows, and
    the k²-bounded pair join."""
    from pyspark.sql import Window

    d = _docs(spark, sf_dir)
    tf = rank._term_freqs(d.select("doc_id", "text")).where(
        F.col("word").isin(*_RRF_TERMS))
    wa = Window.partitionBy("word").orderBy(
        F.desc("tf"), F.asc("doc_id"))
    pool = tf.withColumn("rank", F.row_number().over(wa)) \
        .where(F.col("rank") <= 20)
    ra = pool.select(F.col("word").alias("term"), "doc_id", "rank")
    wb = Window.partitionBy("word").orderBy(
        F.asc(F.col("doc_id") % 17), F.asc("doc_id"))
    rb = pool.withColumn("rank2", F.row_number().over(wb)) \
        .select(F.col("word").alias("term"), "doc_id",
                F.col("rank2").alias("rank"))
    return rank.kendall_topk(ra, rb)


def pii_luhn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Luhn-validated card detection (ops/pii.luhn_card_scan) over a
    synthesized payment-text fixture: each order page embeds a
    16-digit number whose check digit is CORRECT for 2/3 of orders
    and corrupted (+5 mod 10) for the rest — so the gate pins both
    the candidate regexp and the checksum filter, not just one. The
    oracle recomputes the unrolled Luhn sum of the same closed-form
    digit string."""
    from .ops.pii import _luhn_sum_expr, luhn_card_scan

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    base = ("lpad(CAST((o_orderkey * 987654321 + 12345) % "
            "1000000000000000 AS STRING), 15, '0')")
    s15 = _luhn_sum_expr(f"({base})", 15)
    chk = f"(10 - (({s15}) % 10)) % 10"
    digit = (f"CASE WHEN o_orderkey % 3 = 0 "
             f"THEN (({chk}) + 5) % 10 ELSE {chk} END")
    docs = o.select(
        F.col("o_orderkey").alias("doc_id"),
        F.expr(f"concat('order pays card ', {base}, "
               f"CAST({digit} AS STRING), ' thanks')").alias("text"),
    )
    return luhn_card_scan(docs)
