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
    """(id, gram) — DISTINCT word n-grams per document."""
    arr = F.split(F.trim(F.col(text_col)), " +")
    k = F.greatest(F.size(arr) - (n - 1), F.lit(0))
    grams = F.transform(
        F.sequence(F.lit(1), k),
        lambda i: F.array_join(F.slice(arr, i, n), " "),
    )
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
    as integers so thresholds apply engine-exactly."""
    cg = word_ngrams(corpus, n, id_col, text_col)
    bg = F.broadcast(
        word_ngrams(benchmark, n, id_col, text_col)
        .select("gram").distinct()
    )
    totals = cg.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_grams"))
    hits = (
        cg.join(bg, "gram")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_contaminated"))
    )
    return hits.join(totals, id_col).select(
        id_col, "n_grams", "n_contaminated"
    )
