"""Train/eval decontamination: flag corpus documents sharing word
n-grams with a benchmark (evaluation) set.

The standard LLM-pipeline stage (GPT-3 §C / PaLM / Llama recipes):
before training, any candidate document containing an n-gram (n≈8-13
words) that also appears in an evaluation benchmark is flagged or
dropped, so test questions don't leak into training data.

Scale shape: the benchmark side is spec-sized (MBs of eval suites, not
corpus-sized), so its distinct n-gram set BROADCASTS; the corpus side
is one scan → n-gram explode → hash join against the broadcast set →
per-doc counts with map-side partial aggregation. No corpus self-join
anywhere. The n-gram expansion uses a single transform lambda over
sequence+slice (one higher-order function per plan — the PySpark 4.1
multi-lambda contamination gotcha, see pipeline/link.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def word_ngrams(
    df: DataFrame, n: int, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, gram) — DISTINCT word n-grams per document. A document with
    fewer than n words contributes no rows (Spark's sequence(1, 0)
    DESCENDS rather than producing an empty range, so the window count
    is clamped to ≥ 1 and the too-short case is masked to an empty
    array explicitly)."""
    from .text import word_array

    arr = word_array(text_col)
    k = F.size(arr) - (n - 1)
    grams = F.when(
        k >= 1,
        F.transform(
            F.sequence(F.lit(1), F.greatest(k, F.lit(1))),
            lambda i: F.array_join(F.slice(arr, i, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        df.select(F.col(id_col), F.explode(grams).alias("gram"))
        .dropDuplicates([id_col, "gram"])
    )


def contaminated_docs(
    corpus: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, n_grams, n_contaminated) for every corpus document
    that shares at least one word n-gram with the benchmark set.
    `n_contaminated / n_grams` is the usual drop-threshold input — kept
    as integers so thresholds apply engine-exactly.

    One corpus pass: the n-gram expansion left-joins the broadcast
    benchmark gram set with a hit flag, and a single aggregation
    produces both the total and contaminated counts — the dominant
    scan/explode/dedup cost is paid once, not once per aggregate."""
    cg = word_ngrams(corpus, n, id_col, text_col)
    bg = F.broadcast(
        word_ngrams(benchmark, n, id_col, text_col)
        .select("gram").distinct()
        .withColumn("_hit", F.lit(1))
    )
    return (
        cg.join(bg, "gram", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.count("_hit").alias("n_contaminated"),
        )
        .where(F.col("n_contaminated") > 0)
    )
