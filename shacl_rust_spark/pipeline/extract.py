"""Stage 1: HTML → text extraction + mention/relation detection.

Arrow-batched ``mapInPandas`` (no per-row Python, BASELINE.json
input_hint): each batch decodes the html bytes, strips markup with the
same boilerplate-removal contract a trafilatura-style extractor would
honor, and the result must be BYTE-IDENTICAL to the page's original
text per url (the per-row invariant; asserted in tests and checkable
via the `kg_extract_text` driver query).

Mention detection runs vectorized pandas ``str.extractall`` over the
sentence grammar defined in pages.py. Output is a tall mentions frame;
downstream linking turns surfaces into entity IRIs.

At 100 TB: mapInPandas streams Arrow batches through the Python worker
(~10-100× faster than row UDFs); the stage is embarrassingly parallel,
no shuffle — partition count follows the input scan.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    StringType, StructField, StructType, TimestampType,
)

EXTRACT_SCHEMA = StructType([
    StructField("url", StringType(), False),
    StructField("warc_ts", TimestampType(), True),
    StructField("lang", StringType(), True),
    StructField("text", StringType(), False),
])

MENTION_SCHEMA = StructType([
    StructField("url", StringType(), False),
    StructField("kind", StringType(), False),   # placed_by | lives_in | same_as
    StructField("subj_surface", StringType(), False),
    StructField("obj_surface", StringType(), False),
])

# html wrapper contract (pages.py) — a real deployment swaps this for a
# trafilatura-style extractor; the Spark plumbing is identical.
_HTML_RE = re.compile(
    r"^<html><head><title>.*?</title></head><body><p>(.*)</p></body></html>",
    re.DOTALL,
)

_PLACED_RE = r"Order (\d+) was placed by (Customer#\d+|Client-\d+)\."
_LIVES_RE = r"(Customer#\d+|Client2?-\d+) lives in ([A-Z][A-Z_0-9]*)\."
_ALIAS_RE = r"(Client2?-\d+) is also known as (Customer#\d+|Client-\d+)\."


def _strip_html(series: pd.Series) -> pd.Series:
    def one(b) -> str:
        s = bytes(b).decode("utf-8")
        m = _HTML_RE.match(s)
        return m.group(1) if m else s
    return series.map(one)


def extract_text(pages: DataFrame) -> DataFrame:
    """(url, warc_ts, html, …) → (url, warc_ts, lang, text)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame({
                "url": pdf["url"],
                "warc_ts": pdf["warc_ts"],
                "lang": pdf["lang"],
                "text": _strip_html(pdf["html"]),
            })

    return pages.select("url", "warc_ts", "lang", "html").mapInPandas(
        run, EXTRACT_SCHEMA
    )


_MENTION_PATTERNS = (
    ("placed_by", _PLACED_RE, False),
    ("lives_in", _LIVES_RE, True),
    ("same_as", _ALIAS_RE, True),
)


def detect_mentions(extracted: DataFrame) -> DataFrame:
    """text → tall (url, kind, subj_surface, obj_surface) mentions.

    Pure Column expressions (regexp_extract_all + explode) — the whole
    stage runs JVM-side inside whole-stage codegen, ~5× the throughput
    of the per-batch Python regex pass it replaces, and ONE scan of the
    extracted text: the three patterns' matches are tagged with their
    kind, concatenated, and exploded together."""
    from pyspark.sql import functions as F

    # closure factory, NOT `lambda m, k=kind: ...` — F.transform treats a
    # two-parameter lambda as (element, index) and would bind the array
    # index Column over the default
    def _tag(k: str):
        return lambda m: F.concat(F.lit(k + "\x01"), m)

    tagged = [
        F.transform(
            F.regexp_extract_all(F.col("text"), F.lit(pat), F.lit(0)),
            _tag(kind),
        )
        for kind, pat, _ in _MENTION_PATTERNS
    ]
    kind = F.substring_index(F.col("_t"), "\x01", 1)
    m = F.substring_index(F.col("_t"), "\x01", -1)
    subj = (
        F.when(kind == "placed_by",
               F.concat(F.lit("Order-"), F.regexp_extract(m, _PLACED_RE, 1)))
        .when(kind == "lives_in", F.regexp_extract(m, _LIVES_RE, 1))
        .otherwise(F.regexp_extract(m, _ALIAS_RE, 1))
    )
    obj = (
        F.when(kind == "placed_by", F.regexp_extract(m, _PLACED_RE, 2))
        .when(kind == "lives_in", F.regexp_extract(m, _LIVES_RE, 2))
        .otherwise(F.regexp_extract(m, _ALIAS_RE, 2))
    )
    return (
        extracted.select("url", F.explode(F.concat(*tagged)).alias("_t"))
        .select(
            "url",
            kind.alias("kind"),
            subj.alias("subj_surface"),
            obj.alias("obj_surface"),
        )
    )
