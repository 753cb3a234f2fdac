"""Text-analysis operators over the documents table.

All pure Column expressions (regexp/array functions — JVM-side,
whole-stage codegen). Ratios are expressed in integer cross-multiplied
form wherever a threshold is applied, so results are engine-exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# tiny per-language stopword marker lists for the n-gram heuristic
LANG_MARKERS = {
    "en": ["the", "a", "of"],
    "es": ["el", "la", "de"],
    "de": ["der", "die", "das"],
    "fr": ["le", "la", "et"],
    "zh": ["的", "是", "了"],
}
STOPWORDS = ["the", "a", "of", "and", "to", "in"]


def word_array(text_col: str = "text") -> F.Column:
    """THE whitespace tokenization contract shared by repetition_stats,
    ops/pack, and ops/contamination — trim + run-collapsing split, so
    no empty tokens appear mid-array (a lone empty string remains for
    empty input; token consumers filter it where it matters). Every
    DuckDB oracle mirrors this as string_split_regex(trim(text), ' +');
    changing one side without the other desynchronizes the oracles."""
    return F.split(F.trim(F.col(text_col)), " +")


def _count_word(text: F.Column, word: str) -> F.Column:
    return F.size(F.regexp_extract_all(text, F.lit(rf"\b{word}\b"), 0))


def token_counts(docs: DataFrame) -> DataFrame:
    """(doc_id, n_ws_tokens, n_bpe_ish): whitespace tokens and a
    BPE-ish segmentation (letter runs / digit runs / single punct)."""
    return docs.select(
        "doc_id",
        F.size(F.filter(F.split("text", r"\s+"), lambda w: w != ""))
        .alias("n_ws_tokens"),
        F.size(F.regexp_extract_all(
            F.col("text"), F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"), 0
        )).alias("n_bpe_ish"),
    )


def quality_scores(docs: DataFrame, keep: tuple = ()) -> DataFrame:
    """(doc_id, n_chars, n_words, n_stopwords, n_punct, is_quality):
    is_quality = words ≥ 20 AND stopword share ≥ 5% (integer math).
    `keep` passes input columns through unchanged — composites filter
    on the flag in the SAME scan instead of self-joining on doc_id."""
    n_stop = None
    for wrd in STOPWORDS:
        c = _count_word(F.col("text"), wrd)
        n_stop = c if n_stop is None else n_stop + c
    out = docs.select(
        "doc_id",
        *keep,
        F.length("text").alias("n_chars"),
        F.size(F.filter(F.split("text", r"\s+"), lambda w: w != ""))
        .alias("n_words"),
        n_stop.alias("n_stopwords"),
        F.size(F.regexp_extract_all(
            F.col("text"), F.lit(r"[^\w\s]"), 0
        )).alias("n_punct"),
    )
    return out.withColumn(
        "is_quality",
        (F.col("n_words") >= 20)
        & (F.col("n_stopwords") * 100 >= F.col("n_words") * 5),
    )


def gopher_rules(
    docs: DataFrame,
    min_words: int = 20,
    max_words: int = 80,
    min_mwl: int = 3,
    max_mwl: int = 10,
    max_symbol_pct: int = 10,
    min_stopwords: int = 2,
) -> DataFrame:
    """(doc_id, n_words, r_words, r_mwl, r_symbol, r_stop, keep): the
    Gopher-style document-format filter (Rae et al. 2021 §A1.1) as one
    pure-Column scan — four independent rules plus the conjunction,
    every threshold cross-multiplied to integer form so no float ratio
    is ever compared:

      r_words : min_words ≤ n_words ≤ max_words
      r_mwl   : mean word length in [min_mwl, max_mwl], tested as
                min_mwl·n_words ≤ n_word_chars ≤ max_mwl·n_words
      r_symbol: symbol-to-word ratio ('#' chars + '...' runs) ≤
                max_symbol_pct %, tested as 100·n_sym ≤ pct·n_words
      r_stop  : at least min_stopwords DISTINCT stopwords present

    Word-count bounds are calibrated to the synthetic corpus (10-99
    words/doc); the paper's 50/100k bounds are a parameter swap. No
    shuffle: the filter is embarrassingly parallel and belongs fused
    into the first post-extract scan at corpus scale."""
    n_words = F.size(
        F.filter(F.split("text", r"\s+"), lambda w: w != "")
    )
    # chars belonging to words = total minus all whitespace
    n_word_chars = F.length(F.regexp_replace("text", r"\s+", ""))
    n_hash = F.length("text") - F.length(
        F.replace(F.col("text"), F.lit("#"))
    )
    n_ellipsis = (
        F.length("text")
        - F.length(F.replace(F.col("text"), F.lit("...")))
    ) / F.lit(3)
    n_sym = (n_hash + n_ellipsis).cast("bigint")
    n_distinct_stop = None
    for wrd in STOPWORDS:
        hit = (_count_word(F.col("text"), wrd) > 0).cast("int")
        n_distinct_stop = (
            hit if n_distinct_stop is None else n_distinct_stop + hit
        )
    out = docs.select(
        "doc_id",
        n_words.alias("n_words"),
        n_word_chars.alias("n_word_chars"),
        n_sym.alias("n_sym"),
        n_distinct_stop.alias("n_distinct_stop"),
    )
    r_words = (F.col("n_words") >= min_words) & (
        F.col("n_words") <= max_words
    )
    r_mwl = (
        F.lit(min_mwl) * F.col("n_words") <= F.col("n_word_chars")
    ) & (F.col("n_word_chars") <= F.lit(max_mwl) * F.col("n_words"))
    r_symbol = (
        F.lit(100) * F.col("n_sym")
        <= F.lit(max_symbol_pct) * F.col("n_words")
    )
    r_stop = F.col("n_distinct_stop") >= min_stopwords
    return out.select(
        "doc_id", "n_words",
        r_words.alias("r_words"),
        r_mwl.alias("r_mwl"),
        r_symbol.alias("r_symbol"),
        r_stop.alias("r_stop"),
        (r_words & r_mwl & r_symbol & r_stop).alias("keep"),
    )


def lang_id(docs: DataFrame, keep: tuple = ()) -> DataFrame:
    """(doc_id, predicted_lang): argmax of per-language marker counts,
    ties and all-zero → 'und'. Deterministic tie-break: language list
    order en,es,de,fr,zh (first maximal wins only if strictly greater
    than every later one → expressed as strict argmax, else 'und').
    `keep` passes input columns through (see quality_scores)."""
    out = docs.select("doc_id", "text",
                      *[c for c in keep if c != "text"])
    for lang, markers in LANG_MARKERS.items():
        c = None
        for m in markers:
            cc = _count_word(F.col("text"), m)
            c = cc if c is None else c + cc
        out = out.withColumn(f"_c_{lang}", c)
    langs = list(LANG_MARKERS)
    best = F.greatest(*[F.col(f"_c_{lang}") for lang in langs])
    n_best = None
    for lang in langs:
        hit = (F.col(f"_c_{lang}") == best).cast("int")
        n_best = hit if n_best is None else n_best + hit
    pred = F.when((best == 0) | (n_best > 1), F.lit("und"))
    for lang in langs:
        pred = pred.when(F.col(f"_c_{lang}") == best, F.lit(lang))
    return out.select("doc_id", *keep, pred.alias("predicted_lang"))


def fingerprints(docs: DataFrame) -> DataFrame:
    """(doc_id, fp): md5 of the sorted distinct word bag — an
    order-insensitive document fingerprint."""
    return docs.select(
        "doc_id",
        F.md5(F.concat_ws(
            " ",
            F.array_sort(F.array_distinct(
                F.filter(F.split("text", r"\s+"), lambda w: w != "")
            )),
        )).alias("fp"),
    )


def repetition_stats(docs: DataFrame) -> DataFrame:
    """Gopher/MassiveText-style repetition signals, integer-exact:
    (doc_id, n_words, n_distinct_words, top_word_count, n_bigrams,
    n_distinct_bigrams, top_bigram_count). Duplicate-word fraction is
    1 - n_distinct/n_words and top-n-gram fraction is top_count/n —
    kept as integer numerator/denominator pairs so thresholds apply
    engine-exactly (cross-multiplied), never as floats.

    Plan shape: one scan → split/explode → two partial-aggregating
    groupBys keyed by doc_id — map-side combine keeps the shuffle at
    one row per (doc, distinct gram), and skew is bounded because a
    document's gram count is bounded by its length."""
    # trim + run-collapsing split: no empty tokens, and — deliberately —
    # no F.filter lambda (PySpark 4.1 cross-contaminates lambda
    # variables when several higher-order lambdas share a projection;
    # see pipeline/link.py::with_minhash_sig — zip_with below must stay
    # the only lambda in this plan)
    words = docs.select(
        "doc_id",
        F.explode(word_array()).alias("_w"),
    ).where(F.col("_w") != "")
    per_w = words.groupBy("doc_id", "_w").agg(F.count(F.lit(1)).alias("_c"))
    w_stats = per_w.groupBy("doc_id").agg(
        F.sum("_c").alias("n_words"),
        F.count(F.lit(1)).alias("n_distinct_words"),
        F.max("_c").alias("top_word_count"),
    )
    # bigrams over the same trimmed, run-collapsed word array
    arr = word_array()
    n1 = F.greatest(F.size(arr) - 1, F.lit(0))
    bigrams = docs.select(
        "doc_id",
        F.explode(
            F.zip_with(
                F.slice(arr, 1, n1), F.slice(arr, 2, n1),
                lambda x, y: F.concat_ws(" ", x, y),
            )
        ).alias("_b"),
    )
    per_b = bigrams.groupBy("doc_id", "_b").agg(F.count(F.lit(1)).alias("_c"))
    b_stats = per_b.groupBy("doc_id").agg(
        F.sum("_c").alias("n_bigrams"),
        F.count(F.lit(1)).alias("n_distinct_bigrams"),
        F.max("_c").alias("top_bigram_count"),
    )
    return w_stats.join(b_stats, "doc_id", "left").na.fill(0)


def length_quantiles(
    docs: DataFrame,
    quantiles: tuple = (0.25, 0.5, 0.75, 0.95),
    group_col: str = "lang",
    value_col: str = "n_chars",
) -> DataFrame:
    """Per-group EXACT length quantiles (linear interpolation at rank
    p·(n−1)) plus count and mean — the distribution summary every
    curation recipe reads before setting length cutoffs, per language
    or per source.

    Spark's `percentile` is the exact algorithm (not approx_percentile):
    one groupBy with map-side partial collection; group cardinality is
    bounded by the value domain, and the number of groups (languages /
    sources) is tiny, so the shuffle carries digests, not the corpus.
    At 100 TB over a high-cardinality value domain, swap in
    approx_percentile(…, accuracy) — same plan shape, bounded memory.
    DuckDB's quantile_cont implements the identical interpolation, so
    the oracle is the direct twin. The mean stays integer-exact
    (sum(bigint)/count), engine-identical."""
    pctl = F.expr(
        f"percentile({value_col}, array({', '.join(map(str, quantiles))}))"
    )
    cols = [
        F.col("_q")[i].alias(f"q{int(q * 100)}")
        for i, q in enumerate(quantiles)
    ]
    return (
        docs.groupBy(group_col)
        .agg(
            F.count(F.lit(1)).alias("n"),
            (F.sum(value_col) / F.count(F.lit(1))).alias("mean_len"),
            pctl.alias("_q"),
        )
        .select(group_col, "n", "mean_len", *cols)
    )


def vocabulary(docs: DataFrame, min_docs: int = 2) -> DataFrame:
    """(word, n_occurrences, n_docs): corpus-wide word-frequency table,
    the tokenizer-training prep stage (BPE/unigram trainers start from
    exactly this). min_docs filters hapax noise by document frequency.

    One explode scan → a single groupBy word with map-side partial
    aggregation (count + two-phase count-distinct); the shuffle carries
    one row per distinct (word, doc) — sublinear in corpus size. Top-k
    consumers should orderBy+limit (TakeOrderedAndProject: per-partition
    partial top-k, never a global sort)."""
    words = docs.select(
        "doc_id", F.explode(word_array()).alias("_w")
    ).where(F.col("_w") != "")
    return (
        words.groupBy("_w")
        .agg(
            F.count(F.lit(1)).alias("n_occurrences"),
            F.count_distinct("doc_id").alias("n_docs"),
        )
        .where(F.col("n_docs") >= min_docs)
        .select(F.col("_w").alias("word"), "n_occurrences", "n_docs")
    )


def char_stats(docs: DataFrame) -> DataFrame:
    """Per-doc character-distribution signals: Shannon entropy of the
    character histogram (gibberish/binary-paste detector — natural
    text sits ~4-4.5 bits, single-char spam near 0, random base64
    near 6) and word type-token ratio (vocabulary richness;
    boilerplate repeats words). Output: (doc_id, n_chars_counted,
    char_entropy [bits], n_words, ttr); empty-text docs are omitted.

    One scan fans out to characters via a codegen transform+explode
    (no Python); the entropy aggregation shuffles (doc, char) rows —
    alphabet-bounded per doc. All inputs to the float math are exact
    integer counts, so the entropy/ttr values are engine-identical
    closed forms (DuckDB oracle states the same)."""
    chars = docs.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, length(text)), "
                " i -> substring(text, i, 1))"
            )
        ).alias("ch"),
    )
    hist = chars.groupBy("doc_id", "ch").agg(
        F.count(F.lit(1)).alias("n")
    )
    ent = hist.groupBy("doc_id").agg(
        F.sum("n").alias("n_chars_counted"),
        (
            -F.sum(F.col("n") * F.log2(F.col("n")))
            / F.sum("n")
            + F.log2(F.sum("n"))
        ).alias("char_entropy"),
    )
    words = docs.select(
        "doc_id", F.explode(word_array()).alias("w")
    ).where(F.col("w") != "")
    wstats = words.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_words"),
        (
            F.count_distinct("w").cast("double")
            / F.count(F.lit(1))
        ).alias("ttr"),
    )
    return ent.join(wstats, "doc_id", "left").select(
        "doc_id", "n_chars_counted", "char_entropy",
        F.coalesce("n_words", F.lit(0)).alias("n_words"),
        F.coalesce("ttr", F.lit(0.0)).alias("ttr"),
    )


def split_sentences(docs: DataFrame) -> DataFrame:
    """(doc_id, sent_id, sentence, n_words): sentence segmentation on
    terminal-punctuation runs ([.!?]+ followed by whitespace or end) —
    the regex heuristic every fast pipeline uses before sentence-level
    dedup/contamination checks. Empty segments (e.g. after the
    trailing period) are dropped; sent_id is the segment's 0-based
    position in the RAW split (stable and join-able; gaps where empty
    segments were dropped — renumbering densely would cost a per-doc
    window for no consumer benefit). Pure-Column split+posexplode,
    one scan, no shuffle."""
    segs = F.expr(r"split(text, '[.!?]+(\\s+|$)')")
    ex = docs.select(
        "doc_id", F.posexplode(segs).alias("_pos", "_raw")
    ).where(F.trim(F.col("_raw")) != "")
    return ex.select(
        "doc_id",
        F.col("_pos").alias("sent_id"),
        F.trim(F.col("_raw")).alias("sentence"),
        F.size(
            F.split(F.trim(F.col("_raw")), " +")
        ).alias("n_words"),
    )


def normalize_text(docs: DataFrame) -> DataFrame:
    """Canonical text cleaning, the first stage of every training-data
    recipe (C4/Gopher pipelines normalize before dedup so that
    whitespace/case variants hash identically): control characters
    → space, whitespace runs collapsed to one space, trimmed,
    lower-cased. Adds (text_norm, n_chars_norm, changed) to the input
    frame — pure Column regexes, zero shuffles, one scan, fully
    pushdown-friendly. Unicode note: lower() is the engine's default
    casefold; for the ASCII-dominant web corpus this matches the
    DuckDB oracle exactly (both are utf8-aware defaults, neither does
    locale-specific Turkish-I folding)."""
    cleaned = F.lower(
        F.trim(
            F.regexp_replace(
                F.regexp_replace(
                    F.col("text"), r"[\x00-\x1f\x7f]", " "
                ),
                r"\s+", " ",
            )
        )
    )
    return docs.withColumn("text_norm", cleaned).withColumn(
        "n_chars_norm", F.length("text_norm")
    ).withColumn(
        "changed", (F.col("text_norm") != F.col("text")).cast("int")
    )


def bpe_pair_counts(docs: DataFrame, top_k: int = 50) -> DataFrame:
    """(pair, n): the ``top_k`` most frequent adjacent character pairs
    across the corpus, weighted by word frequency — the count step of
    one BPE merge iteration (Sennrich et al. 2016). The returned
    argmax pair is what a BPE trainer would merge first.

    The BPE trick makes this corpus-size-independent after one scan:
    pair frequencies are Σ over the VOCABULARY of
    word_count × (pair occurrences in word), so the explode over
    character positions runs on the vocabulary table (distinct words),
    not on the 100 TB corpus. Pairs are within-word only (standard
    BPE pre-tokenizes at whitespace; no cross-word merges). Counts are
    integers → engine-exact; ties break on the pair string so the
    top-k cut is deterministic."""
    w = word_array()
    vocab = (
        docs.select(F.explode(w).alias("word"))
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("wc"))
        .where(F.length("word") >= 2)
    )
    pairs = vocab.select(
        "wc",
        F.explode(
            F.expr(
                "transform(sequence(1, length(word) - 1), "
                " i -> substring(word, i, 2))"
            )
        ).alias("pair"),
    )
    return (
        pairs.groupBy("pair")
        .agg(F.sum("wc").alias("n"))
        .orderBy(F.desc("n"), "pair")
        .limit(top_k)
    )


def bpe_train_merges(docs: DataFrame, rounds: int = 5) -> DataFrame:
    """(round, left_sym, right_sym, merged, pair_count): `rounds`
    iterations of actual BPE merge TRAINING (Sennrich et al. 2016) —
    each round counts adjacent-symbol pairs over the evolving
    vocabulary, merges the argmax pair (ties to the lexicographically
    smaller pair), and rewrites every word's symbol sequence before
    the next round. Extends bpe_pair_counts (the one-step counter) to
    the full trainer loop.

    Scale shape: after ONE corpus scan builds the (word, freq)
    vocabulary table, every round runs on the VOCABULARY (Heaps-law
    millions of rows at 100 TB, never the corpus): one explode +
    groupBy per round, one collected argmax row per round (the same
    bounded-driver policy as pagerank's n/m scalars), and a pure-
    Column replace to apply the merge. The vocabulary frame is
    re-checkpointed each round so the plan stays flat.

    Symbol sequences are framed as "(s1)(s2)...": replace of
    "(a)(b)" → "(ab)" is non-overlapping left-to-right in every
    engine AND adjacent matches share no characters, so "(a)(a)(a)(a)"
    merges to "(aa)(aa)" — exactly BPE's greedy left-to-right pass (a
    space-separated framing would silently skip the second pair).
    Charter: the framing chars '(' ')' must not occur in the alphabet
    (true for the corpus; a production trainer swaps in control
    bytes). Pair occurrences within a word are counted overlapping
    ("aaa" has two (a,a)), the standard trainer convention."""
    vocab = (
        docs.select(F.explode(word_array()).alias("w"))
        .where(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
        .select(
            F.regexp_replace("w", "(.)", r"($1)").alias("s"), "freq"
        )
    )
    cur = vocab.localCheckpoint(eager=True)
    out = []
    for r in range(1, rounds + 1):
        pairs = (
            cur.select(
                "freq",
                F.expr(
                    r"split(substring(s, 2, length(s) - 2),"
                    r" '\\)\\(')"
                ).alias("_arr"),
            )
            .where(F.size("_arr") > 1)
            .select(
                "freq",
                F.explode(F.expr(
                    "transform(sequence(1, size(_arr) - 1), i -> "
                    "concat(element_at(_arr, i), char(1), "
                    "element_at(_arr, i + 1)))"
                )).alias("pr"),
            )
            .groupBy("pr")
            .agg(F.sum("freq").alias("cnt"))
        )
        best = pairs.orderBy(F.desc("cnt"), F.asc("pr")).limit(1) \
            .collect()
        if not best:
            break
        left, right = best[0]["pr"].split("\x01")
        out.append((r, left, right, left + right,
                    int(best[0]["cnt"])))
        cur = cur.select(
            F.replace(
                F.col("s"),
                F.lit(f"({left})({right})"), F.lit(f"({left}{right})"),
            ).alias("s"),
            "freq",
        ).localCheckpoint(eager=True)
    return docs.sparkSession.createDataFrame(
        out,
        "round int, left_sym string, right_sym string, "
        "merged string, pair_count bigint",
    )


def bpe_encode(docs: DataFrame, rounds: int = 5) -> DataFrame:
    """(word, freq, tokens, n_tokens): the tokenizer-APPLY step —
    encode the corpus VOCABULARY with the first ``rounds`` trained BPE
    merges (bpe_train_merges), replayed in training order. Encoding at
    the vocabulary level is the scale statement: BPE application is a
    pure word→tokens function, so a 100 TB corpus tokenizes by
    encoding the Heaps-law-sized distinct-word table once and
    broadcast-joining the result back onto documents — never by
    running the merge loop per document.

    The merge replay is the identical framed-string surgery the
    trainer uses ("(a)(b)" → "(ab)", greedy left-to-right — see
    bpe_train_merges for why the framing makes overlap semantics
    engine-exact); the merges arrive as `rounds` collected scalar rows
    (bounded-driver policy) and compile into one chained
    pure-Column replace — no Python in the encode scan. `tokens` is
    the space-joined symbol sequence, `n_tokens` its length."""
    merges = [
        (m["left_sym"], m["right_sym"], m["merged"])
        for m in bpe_train_merges(docs, rounds).orderBy("round")
        .collect()
    ]
    s = F.regexp_replace("w", "(.)", r"($1)")
    for left, right, merged in merges:
        s = F.replace(
            s, F.lit(f"({left})({right})"), F.lit(f"({merged})")
        )
    toks = F.expr(r"regexp_extract_all(_s, '\\(([^)]*)\\)', 1)")
    return (
        docs.select(F.explode(word_array()).alias("w"))
        .where(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
        .select(F.col("w").alias("word"), "freq", s.alias("_s"))
        .select(
            "word", "freq",
            F.array_join(toks, " ").alias("tokens"),
            F.size(toks).cast("bigint").alias("n_tokens"),
        )
    )


def readability(docs: DataFrame) -> DataFrame:
    """(doc_id, n_sentences, n_words, n_syllables, fre_num, fre_den):
    Flesch reading ease per document as an EXACT RATIONAL —
    fre = 206.835 − 1.015·(W/S) − 84.6·(Syl/W), emitted as the
    integer pair (fre_num, fre_den) with

        fre_num = 206835·S·W − 1015·W² − 84600·Syl·S
        fre_den = 1000·S·W

    so fre = fre_num/fre_den in FRE points and no float ever crosses
    the engine boundary (same device as rank_rrf's exact rationals).
    S counts terminal-punctuation runs followed by whitespace/end
    (split_sentences' regex, min 1); W is the word_array count;
    syllables are vowel-group runs [aeiouy]+ per lower-cased word,
    min 1 per word (the standard heuristic — "rhythm" has no vowel
    letter but one spoken syllable). Everything is one pure-Column
    scan — the per-word syllable sum is an aggregate HOF over the
    split array, no explode, no shuffle."""
    # word_array never emits empty tokens mid-array (run-collapsing
    # split), so the only empty-token case is fully-blank text — no
    # filter lambda needed (PySpark 4.1 cross-contaminates lambda
    # variables when several land in one projection; see link.py).
    n_words = F.greatest(
        F.lit(1),
        F.when(F.trim(F.col("text")) == "", F.lit(0))
        .otherwise(F.size(word_array())),
    ).cast("bigint")
    n_sentences = F.greatest(
        F.lit(1),
        F.size(F.regexp_extract_all(
            F.col("text"), F.lit(r"[.!?]+(\s+|$)"), 0
        )),
    ).cast("bigint")
    n_syllables = F.expr(
        "aggregate(split(trim(text), ' +'), 0L, (acc, w) -> acc +"
        " CASE WHEN w = '' THEN 0L ELSE greatest(1L, size("
        r"regexp_extract_all(lower(w), '[aeiouy]+', 0))) END)"
    ).cast("bigint")
    s, w, syl = n_sentences, n_words, n_syllables
    return docs.select(
        "doc_id",
        s.alias("n_sentences"),
        w.alias("n_words"),
        syl.alias("n_syllables"),
        (F.lit(206835) * s * w - F.lit(1015) * w * w
         - F.lit(84600) * syl * s).cast("bigint").alias("fre_num"),
        (F.lit(1000) * s * w).cast("bigint").alias("fre_den"),
    )


# fixed fastText-style weights for the logistic quality gate: length,
# stopword density, punctuation density. Frozen here (not trained) so
# the op is deterministic; a production pipeline would drop in its own.
_CLF_BIAS = -3.2
_CLF_W_LOGLEN = 0.6
_CLF_W_STOP = 8.0
_CLF_W_PUNCT = -2.0


def quality_classifier(docs: DataFrame) -> DataFrame:
    """(doc_id, z, score, label): linear quality classifier over the
    quality_scores features — z = b + w·(ln(1+words), stop ratio,
    punct ratio), score = σ(z), label = 1 iff z ≥ 0 (⟺ score ≥ 0.5,
    stated on z so the threshold never touches the sigmoid's float).
    The CCNet/fastText-style quality gate as a pure-Column scan: every
    feature is an exact integer ratio, so z is the same deterministic
    double on any engine and any partitioning; no shuffle at all."""
    q = quality_scores(docs)
    stop_ratio = F.when(
        F.col("n_words") > 0,
        F.col("n_stopwords").cast("double") / F.col("n_words"),
    ).otherwise(F.lit(0.0))
    punct_ratio = F.when(
        F.col("n_chars") > 0,
        F.col("n_punct").cast("double") / F.col("n_chars"),
    ).otherwise(F.lit(0.0))
    z = (
        F.lit(_CLF_BIAS)
        + F.lit(_CLF_W_LOGLEN) * F.log(F.lit(1.0) + F.col("n_words"))
        + F.lit(_CLF_W_STOP) * stop_ratio
        + F.lit(_CLF_W_PUNCT) * punct_ratio
    )
    return q.select(
        "doc_id",
        z.alias("z"),
        (F.lit(1.0) / (F.lit(1.0) + F.exp(-z))).alias("score"),
        (z >= 0).cast("int").alias("label"),
    )


def collocations(
    docs: DataFrame, min_count: int = 3, top_k: int = 100
) -> DataFrame:
    """Top collocations (statistically glued word pairs) by pointwise
    mutual information: PMI(a,b) = ln( p(ab) / (p(a)·p(b)) ) with
    p(ab) over bigram slots (B) and p(a), p(b) over tokens (W) —
    multiword-expression mining for tokenizer vocab curation and
    corpus audits ("new york", "machine learning" score high; frequent
    -but-independent pairs score ~0). Output: (bigram, n_ab, u_a, u_b,
    pmi) for pairs seen ≥ min_count, top_k by (pmi desc, bigram asc).

    Every count is an exact integer; pmi is ONE fixed-shape float
    expression of those integers — ln((n_ab·W·W)/(B·u_a·u_b)) with
    identical association order in the DuckDB oracle, so the doubles
    (and therefore the top-k ORDER) are engine-identical, the same
    guarantee tfidf/bm25 rely on. W and B are two bounded scalar
    aggregates (the bounded-driver policy).

    Plan: the bigram tf stream shuffles once on the bigram; unigram
    counts are vocabulary-sized and join the (min_count-pruned,
    ≪ vocabulary) pair table twice — AQE broadcasts them. min_count
    prunes BEFORE the unigram joins; top-k is orderBy+limit
    (TakeOrderedAndProject, per-partition partial top-k)."""
    w = word_array()
    base = docs.select(w.alias("_w"))
    bgs = base.select(
        F.explode(
            F.expr(
                "CASE WHEN size(_w) >= 2 THEN "
                "transform(sequence(1, size(_w) - 1), "
                " i -> concat(element_at(_w, i), ' ', "
                "             element_at(_w, i + 1))) "
                "ELSE cast(array() AS array<string>) END"
            )
        ).alias("bigram")
    )
    pair = bgs.groupBy("bigram").agg(F.count(F.lit(1)).alias("n_ab"))
    uni = (
        docs.select(F.explode(w).alias("_u"))
        .where(F.col("_u") != "")
        .groupBy("_u")
        .agg(F.count(F.lit(1)).alias("_uc"))
    )
    tot = uni.agg(
        F.sum("_uc").alias("W"), F.lit(1).alias("_one")
    ).collect()[0]
    # empty corpus: SUM collects NULL — the b_tot guard below returns
    # the schema-complete empty frame, so any placeholder works here
    big_w = int(tot["W"] or 0)
    b_tot = pair.agg(F.sum("n_ab")).collect()[0][0]
    if not b_tot:
        return docs.sparkSession.createDataFrame(
            [], "bigram string, n_ab bigint, u_a bigint, "
                "u_b bigint, pmi double"
        )
    pruned = pair.where(F.col("n_ab") >= min_count)
    scored = (
        pruned
        .join(uni.select(F.col("_u").alias("_w1"),
                         F.col("_uc").alias("u_a")),
              F.substring_index("bigram", " ", 1) == F.col("_w1"))
        .join(uni.select(F.col("_u").alias("_w2"),
                         F.col("_uc").alias("u_b")),
              F.substring_index("bigram", " ", -1) == F.col("_w2"))
        .select(
            "bigram", "n_ab", "u_a", "u_b",
            F.log(
                (F.col("n_ab").cast("double")
                 * F.lit(float(big_w)) * F.lit(float(big_w)))
                / (F.lit(float(b_tot))
                   * F.col("u_a").cast("double")
                   * F.col("u_b").cast("double"))
            ).alias("pmi"),
        )
    )
    return scored.orderBy(F.desc("pmi"), F.asc("bigram")).limit(top_k)


def winsorize_lengths(
    docs: DataFrame, p_lo: int = 5, p_hi: int = 95
) -> DataFrame:
    """Per-language winsorization of document lengths at ORDER
    STATISTICS, not interpolated percentiles: the clip bounds are the
    values at sorted positions ceil(p·n/100) — pure integer
    selection, so the bounds (and therefore every clip comparison)
    are engine-exact, where interpolated quantiles are doubles whose
    last-ulp placement can differ across engines exactly when a bound
    lands next to an integer length. Output: (doc_id, lang, n_chars,
    clipped, was_clipped) — the outlier-robust feature column every
    length-based quality filter wants (a 10 MB page otherwise
    dominates any mean/variance the filter computes).

    Plan: one window shuffle on lang (row_number on the value order —
    the value AT position k is permutation-invariant under ties) +
    one lang-cardinality bounds join AQE broadcasts."""
    from pyspark.sql import Window

    w = Window.partitionBy("lang").orderBy("n_chars", "doc_id")
    ranked = docs.select("doc_id", "lang", "n_chars").withColumn(
        "_rn", F.row_number().over(w)
    )
    n = ranked.groupBy("lang").agg(F.max("_rn").alias("_n"))
    bounds = (
        ranked.join(n, "lang")
        .withColumn("_klo", F.floor((F.lit(p_lo) * F.col("_n")
                                     + F.lit(99)) / F.lit(100)))
        .withColumn("_khi", F.floor((F.lit(p_hi) * F.col("_n")
                                     + F.lit(99)) / F.lit(100)))
        .withColumn(
            "_lo",
            F.when(F.col("_rn") == F.col("_klo"), F.col("n_chars")),
        )
        .withColumn(
            "_hi",
            F.when(F.col("_rn") == F.col("_khi"), F.col("n_chars")),
        )
        .groupBy("lang")
        .agg(F.max("_lo").alias("lo"), F.max("_hi").alias("hi"))
    )
    return (
        docs.select("doc_id", "lang", "n_chars")
        .join(bounds, "lang")
        .select(
            "doc_id", "lang", "n_chars",
            F.greatest(F.least(F.col("n_chars"), F.col("hi")),
                       F.col("lo")).alias("clipped"),
            F.when((F.col("n_chars") < F.col("lo"))
                   | (F.col("n_chars") > F.col("hi")), F.lit(1))
            .otherwise(F.lit(0)).alias("was_clipped"),
        )
    )


def s_stem(word: F.Column) -> F.Column:
    """Harman's S-stemmer (1991) — the three-rule plural stripper IR
    pipelines use when Porter is overkill: IES→Y (unless preceded by
    a/e), drop ES (unless preceded by a/e/o... i.e. only for -Ces
    where the e belongs to the suffix), drop final S (unless -US/-SS).
    Pure nested CASE on string suffixes. The branch is selected by
    the SUFFIX alone; each rule's exception list means 'leave the
    word unchanged', NOT 'fall through to the next rule' — 'goes'
    takes the -es branch and stays 'goes', it does not fall through
    to the -s rule (the reading under which the exception lists
    actually protect anything)."""
    return (
        F.when(
            word.rlike("ies$"),
            F.when(
                ~word.rlike("(aies|eies)$"),
                F.regexp_replace(word, "ies$", "y"),
            ).otherwise(word),
        )
        .when(
            word.rlike("es$"),
            F.when(
                ~word.rlike("(aes|ees|oes)$"),
                F.regexp_replace(word, "s$", ""),
            ).otherwise(word),
        )
        .when(
            word.rlike("s$"),
            F.when(
                ~word.rlike("(us|ss)$"),
                F.regexp_replace(word, "s$", ""),
            ).otherwise(word),
        )
        .otherwise(word)
    )


def stemmed_vocabulary(docs: DataFrame) -> DataFrame:
    """(stem, n_words, n_forms): the corpus vocabulary folded through
    the S-stemmer — n_words = total occurrences, n_forms = distinct
    surface forms per stem. One scan + one vocabulary groupBy + one
    stem groupBy (both map-side combined, both vocabulary-sized)."""
    vocab = (
        docs.select(F.explode(word_array()).alias("word"))
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return (
        vocab.select(s_stem(F.col("word")).alias("stem"), "n", "word")
        .groupBy("stem")
        .agg(
            F.sum("n").alias("n_words"),
            F.count(F.lit(1)).alias("n_forms"),
        )
    )


def skipgram_pairs(
    docs: DataFrame, window: int = 2, min_count: int = 2
) -> DataFrame:
    """(center, context, n): word co-occurrence counts within a
    ±``window`` token distance — the word2vec/GloVe preprocessing
    sweep. Formulated as posexplode + a self-join on
    (doc_id, |i−j| ≤ window, i ≠ j): the join is position-banded, so
    each token pairs with at most 2·window others — output is linear
    in corpus tokens, never quadratic. The join key is doc_id
    (positions filter after the hash match); at corpus scale both
    sides are the SAME exploded frame, checkpointed once and shuffled
    once on doc_id, and the (center, context) aggregate map-side
    combines. min_count prunes the long tail (standard word2vec
    practice) and keeps the output vocabulary²-bounded in practice."""
    toks = docs.select(
        "doc_id",
        F.posexplode(word_array()).alias("pos", "w"),
    ).where(F.col("w") != "").localCheckpoint(eager=True)
    a = toks.select(
        "doc_id", F.col("pos").alias("i"), F.col("w").alias("center")
    )
    b = toks.select(
        "doc_id", F.col("pos").alias("j"), F.col("w").alias("context")
    )
    pairs = a.join(b, "doc_id").where(
        (F.abs(F.col("i") - F.col("j")) <= window)
        & (F.col("i") != F.col("j"))
    )
    return (
        pairs.groupBy("center", "context")
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") >= min_count)
    )


def hashed_features(docs: DataFrame, n_buckets: int = 64) -> DataFrame:
    """Hashing-trick term features (Weinberger et al. 2009): every
    token maps to bucket = (first 32 bits of md5(token)) mod
    n_buckets, and the doc's feature vector is the per-bucket tf —
    (doc_id, bucket, tf), sparse rows. The fixed-width feature space
    is what makes linear classifiers trainable over 10^12 docs: no
    vocabulary table to build, broadcast, or keep consistent across
    runs, and the transform is one stateless scan (explode + group on
    (doc_id, bucket) — the shuffle key includes doc_id, so a hot
    bucket never concentrates on one reducer). md5 rather than
    xxhash64/murmur because it is the hash both engines compute
    identically — the DuckDB oracle restates the bucket in closed
    form; a production job would swap in xxhash64 (same plan, faster
    hash)."""
    toks = docs.select(
        "doc_id", F.explode(word_array()).alias("w")
    ).where(F.col("w") != "")
    bucket = (
        F.conv(F.substring(F.md5(F.col("w")), 1, 8), 16, 10)
        .cast("long") % n_buckets
    )
    return (
        toks.select("doc_id", bucket.alias("bucket"))
        .groupBy("doc_id", "bucket")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def lexical_diversity(docs: DataFrame) -> DataFrame:
    """Per-doc type-token ratio kept as the exact integer pair
    (n_types, n_tokens): distinct words over total words under the
    shared word_array() contract (empty docs report (0, 0)) — the
    lexical-diversity quality signal (template/boilerplate text reads
    low, natural prose high) next to entropy and the repetition
    ratios. One explode + two map-side-combined aggregates per doc;
    no join."""
    words = docs.select(
        "doc_id", F.explode(word_array()).alias("word")
    ).where(F.col("word") != "")
    return (
        docs.select("doc_id").join(
            words.groupBy("doc_id").agg(
                F.count_distinct("word").alias("n_types"),
                F.count(F.lit(1)).alias("n_tokens"),
            ),
            "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_types", F.lit(0)).cast("bigint")
            .alias("n_types"),
            F.coalesce("n_tokens", F.lit(0)).cast("bigint")
            .alias("n_tokens"),
        )
    )


def mad_outliers(
    docs: DataFrame, k: int = 3
) -> DataFrame:
    """Median-absolute-deviation outlier flags for document lengths —
    the robust-statistics sibling of winsorize_lengths (percentile
    clips): per language, med = n_chars at sorted position ⌈n/2⌉ (the
    LOWER median — pure integer selection, no interpolated midpoint,
    same engine-exactness argument as the winsorize bounds), mad =
    the same order statistic of |n_chars − med|, and a doc is an
    outlier when |n_chars − med| > k·mad. MAD tolerates up to 50 %
    contamination where mean/stddev break at one 10 MB page — the
    robust filter a crawled corpus needs. Output: (doc_id, lang,
    n_chars, med, mad, is_outlier ∈ {0,1}) — all integers.

    Plan: two window shuffles on lang (value rank, then deviation
    rank) + two lang-cardinality joins AQE broadcasts; deviations
    derive from the med JOIN, never a second scan of a huge upstream.
    """
    from pyspark.sql import Window

    base = docs.select("doc_id", "lang", "n_chars")

    def order_stat(df, val_col, pos_num, pos_den):
        w = Window.partitionBy("lang").orderBy(val_col, "doc_id")
        ranked = df.withColumn("_rn", F.row_number().over(w))
        n = ranked.groupBy("lang").agg(F.max("_rn").alias("_n"))
        return (
            ranked.join(n, "lang")
            .where(
                F.col("_rn")
                == F.floor((F.lit(pos_num) * F.col("_n")
                            + F.lit(pos_den - 1)) / F.lit(pos_den))
            )
            .select("lang", F.col(val_col).alias("_stat"))
        )

    med = order_stat(base, "n_chars", 1, 2).withColumnRenamed(
        "_stat", "med")
    dev = base.join(med, "lang").withColumn(
        "_dev", F.abs(F.col("n_chars") - F.col("med"))
    )
    mad = order_stat(dev.select("doc_id", "lang",
                                F.col("_dev").alias("n_chars")),
                     "n_chars", 1, 2).withColumnRenamed("_stat", "mad")
    return (
        dev.join(mad, "lang")
        .select(
            "doc_id", "lang", "n_chars", "med", "mad",
            F.when(F.col("_dev") > F.lit(k) * F.col("mad"), F.lit(1))
            .otherwise(F.lit(0)).alias("is_outlier"),
        )
    )


def chi2_keywords(docs: DataFrame, top_n: int = 5,
                  scale: int = 10_000) -> DataFrame:
    """Per-source characteristic keywords by Pearson chi-square over
    the word↔source document contingency table — the classic
    domain-keyword / corpus-drift audit (what distinguishes this
    source's documents from the rest of the corpus?).

    For each (source, word): a = docs in source containing word,
    b = source docs without it, c = other docs containing it,
    d = the rest; chi2 = N·(ad−bc)² / ((a+b)(c+d)(a+c)(b+d)).
    Emitted as chi2_scaled = (N·(ad−bc)²·scale) DIV denominator —
    an EXACT integral division (Pearson's statistic is ≤ N, so the
    quotient always fits BIGINT; the numerator rides in DECIMAL(38,0),
    which holds it up to ~10^15 documents — DuckDB's twin uses
    HUGEINT). Top `top_n` words per source by (chi2_scaled desc,
    word asc).

    Plan: ONE explode scan → distinct (doc, word) → the per-source
    doc-frequency aggregate; the global doc frequency is a re-
    aggregate OF that vocabulary-sized frame (Σ over sources), so the
    corpus is scanned once, not once per aggregate. The ranking
    window partitions by source over the vocabulary-sized frame,
    never the corpus."""
    from pyspark.sql import Window

    dw = (
        docs.select("doc_id", "source",
                    F.explode(word_array()).alias("word"))
        .where(F.col("word") != "")
        .dropDuplicates(["doc_id", "word"])
    )
    n_total = docs.count()
    src_sizes = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("ns"))
    per_src = dw.groupBy("source", "word").agg(
        F.count(F.lit(1)).alias("a"))
    # a doc has ONE source, so global df = Σ per-source df — derived
    # from the vocabulary-sized frame, no second corpus scan
    global_df = per_src.groupBy("word").agg(F.sum("a").alias("cw"))
    dec = "DECIMAL(38,0)"
    joined = (
        per_src.join(F.broadcast(src_sizes), "source")
        .join(global_df, "word")
        .select(
            "source", "word", "a",
            (F.col("ns") - F.col("a")).alias("b"),
            (F.col("cw") - F.col("a")).alias("c"),
            (F.lit(n_total) - F.col("ns")
             - (F.col("cw") - F.col("a"))).alias("d"),
        )
    )
    # a word present in EVERY document has (b+d) = 0 (and chi2 = 0);
    # drop it before the division so neither engine divides by zero.
    # (c+d) = N - ns is 0 only for a single-source corpus, same guard.
    joined = joined.where(
        (F.col("b") + F.col("d") > 0) & (F.col("c") + F.col("d") > 0)
    )
    chi2 = joined.withColumn(
        "chi2_scaled",
        F.expr(
            f"CAST({n_total} AS {dec})"
            f" * CAST(a*d - b*c AS {dec}) * CAST(a*d - b*c AS {dec})"
            f" * {scale}"
            f" DIV (CAST((a+b) AS {dec}) * CAST((c+d) AS {dec})"
            f"      * CAST((a+c) AS {dec}) * CAST((b+d) AS {dec}))"
        ),
    )
    w = Window.partitionBy("source").orderBy(
        F.desc("chi2_scaled"), F.asc("word"))
    return (
        chi2.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= top_n)
        .select("source", F.col("rk").cast("bigint").alias("rk"),
                "word", F.col("a").cast("bigint").alias("df_in"),
                F.col("c").cast("bigint").alias("df_out"),
                "chi2_scaled")
    )


RAKE_STOPWORDS = (
    "the", "a", "an", "of", "to", "and", "in", "is", "on", "for",
    "with", "was", "by", "at", "it",
)


def rake_keywords(docs: DataFrame, top_n: int = 10,
                  scale: int = 10_000) -> DataFrame:
    """RAKE keyword scores (Rose et al. 2010) at corpus level:
    candidate phrases are maximal stopword-free token runs; per word
    freq = number of phrase occurrences containing it, deg = Σ phrase
    length over those occurrences (co-occurrence degree including
    self); score = deg/freq, emitted as the exact integral
    (deg·scale) DIV freq. Top ``top_n`` words by (score_scaled desc,
    word asc) — multi-word-phrase affinity without any parser.

    Plan: one posexplode scan; phrase segmentation is the classic
    gaps-and-islands device (island id = pos − row_number over the
    stopword-filtered per-doc stream — constant within each run);
    phrase lengths come from one (doc, island) aggregate joined back
    on the island key; the final ranking is orderBy().limit() —
    TakeOrderedAndProject, never a single-partition window over the
    vocabulary."""
    from pyspark.sql import Window

    toks = (
        docs.select("doc_id",
                    F.posexplode(word_array()).alias("pos", "word"))
        .where((F.col("word") != "")
               & ~F.lower(F.col("word")).isin(*RAKE_STOPWORDS))
    )
    wd = Window.partitionBy("doc_id").orderBy("pos")
    isl = toks.withColumn(
        "grp", F.col("pos") - F.row_number().over(wd)
    )
    plen = isl.groupBy("doc_id", "grp").agg(
        F.count(F.lit(1)).alias("phrase_len"))
    scored = (
        isl.join(plen, ["doc_id", "grp"])
        .groupBy("word")
        .agg(
            F.count(F.lit(1)).alias("freq"),
            F.sum("phrase_len").alias("deg"),
        )
        .select(
            "word", F.col("freq").cast("bigint").alias("freq"),
            F.col("deg").cast("bigint").alias("deg"),
            F.expr(f"(deg * {scale}) DIV freq").alias("score_scaled"),
        )
    )
    top = scored.orderBy(F.desc("score_scaled"), F.asc("word")) \
        .limit(top_n)
    wr = Window.orderBy(F.desc("score_scaled"), F.asc("word"))
    return top.withColumn(
        "rk", F.row_number().over(wr).cast("bigint")
    ).select("rk", "word", "freq", "deg", "score_scaled")


def oov_rate(docs: DataFrame, vocab_size: int = 100) -> DataFrame:
    """Per-source out-of-vocabulary profile against the corpus top-V
    vocabulary: (source, n_tokens, n_oov) with the vocabulary = the
    `vocab_size` most frequent corpus tokens (ties → word asc) — the
    tokenizer-coverage audit run before committing a vocab budget
    (OOV mass per source predicts UNK rates per domain). n_oov/
    n_tokens is consumer arithmetic.

    Plan: one explode scan feeds BOTH the corpus term counts and the
    per-source token counts; the vocabulary is a TakeOrderedAndProject
    top-V of the vocabulary-sized count frame, broadcast back as the
    join's build side (V rows); the OOV test is a broadcast LEFT
    anti-ish flag, not a shuffle of the corpus."""
    toks = (
        docs.select("source", F.explode(word_array()).alias("word"))
        .where(F.col("word") != "")
    )
    vocab = (
        toks.groupBy("word").agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("word"))
        .limit(vocab_size)
        .select("word", F.lit(1).alias("_in_vocab"))
    )
    return (
        toks.join(F.broadcast(vocab), "word", "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
            F.sum(F.when(F.col("_in_vocab").isNull(), 1).otherwise(0))
            .cast("bigint").alias("n_oov"),
        )
    )
