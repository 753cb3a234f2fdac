"""WARC-style archive serialization and record-walking parse.

Common-Crawl ships as WARC files: concatenated records, each a
CRLF-terminated header block (WARC/1.0 line + name: value fields,
Content-Length giving the exact payload byte count) followed by the
payload and a blank-line separator. A KG-construction pipeline's first
stage is exactly this walk — split multi-gigabyte archive blobs into
(url, payload) rows — so the reader must be a streaming per-record
scan, not a regex over the whole file (payloads may contain anything,
including header-looking bytes; only Content-Length delimits them).

Spark shape: one archive file = one row (binary column); files are
independent, so mapInPandas parallelizes at file granularity with zero
shuffle — the scan IS the parallelism, the same contract as the
multimodal codecs. The serializer is pure binary Column concat
(whole-stage codegen, no Python) and exists so the gate can round-trip
without external data; the parser is the production-shaped piece.

Corrupt-input contract (shared with ops/multimodal codecs): malformed
records raise ValueError — never a wrong record.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType, StringType, StructField, StructType,
)

WARC_RECORD_SCHEMA = StructType([
    StructField("url", StringType()),
    StructField("rec_type", StringType()),
    StructField("content_length", LongType()),
    StructField("payload_md5", StringType()),
    StructField("offset", LongType()),
    StructField("rec_length", LongType()),
])


def to_warc_files(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """(host, warc): serialize pages into one WARC-style response
    archive per host, records in url order (determinism only — the
    parser never relies on order). All concatenation is BINARY, so a
    payload byte count is a byte count; Content-Length comes from
    length() on the binary column."""
    from .web import host_of

    rec = F.concat(
        F.encode(
            F.concat(
                F.lit("WARC/1.0\r\nWARC-Type: response\r\n"
                      "WARC-Target-URI: "),
                F.col(url_col),
                F.lit("\r\nContent-Length: "),
                F.length(F.col(html_col)).cast("string"),
                F.lit("\r\n\r\n"),
            ),
            "UTF-8",
        ),
        F.col(html_col),
        F.encode(F.lit("\r\n\r\n"), "UTF-8"),
    )
    return (
        pages.select(
            host_of(F.col(url_col)).alias("host"),
            F.col(url_col).alias("_u"),
            rec.alias("_rec"),
        )
        .groupBy("host")
        .agg(F.collect_list(F.struct("_u", "_rec")).alias("_recs"))
        .select(
            "host",
            F.expr(
                "aggregate(transform(array_sort(_recs), x -> x._rec),"
                " cast('' as binary), (acc, r) -> concat(acc, r))"
            ).alias("warc"),
        )
    )


def parse_warc(
    files: DataFrame, file_col: str = "warc", keep: tuple = ()
) -> DataFrame:
    """Archive blobs → one row per record: (url, rec_type,
    content_length, payload_md5, offset, rec_length) plus any `keep`
    passthrough columns (e.g. the archive id, so a CDX index can name
    which file an offset points into). The walk is offset-driven —
    header block up to the first CRLFCRLF, then exactly
    Content-Length payload bytes, then the record separator — so
    payloads containing 'WARC/1.0' or CRLFCRLF never desynchronize
    it; offset/rec_length are the record's byte span in the archive,
    the pair a range-request replay needs. payload_md5 stands in for
    the payload column in the gate (hash-comparable); the production
    variant yields the payload bytes themselves."""
    schema = StructType(
        [f for f in files.select(*keep).schema.fields]
        + WARC_RECORD_SCHEMA.fields
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {f.name: [] for f in schema.fields}
            for row in pdf.itertuples(index=False):
                blob = getattr(row, file_col)
                b = bytes(blob)
                i = 0
                while i < len(b):
                    j = b.find(b"\r\n\r\n", i)
                    if j < 0:
                        raise ValueError("warc: unterminated header")
                    lines = b[i:j].decode("utf-8").split("\r\n")
                    if lines[0] != "WARC/1.0":
                        raise ValueError("warc: bad version line")
                    fields = {}
                    for ln in lines[1:]:
                        k, _, v = ln.partition(": ")
                        fields[k] = v
                    try:
                        n = int(fields["Content-Length"])
                    except (KeyError, ValueError) as exc:
                        raise ValueError(
                            "warc: missing/bad Content-Length"
                        ) from exc
                    payload = b[j + 4:j + 4 + n]
                    if len(payload) != n or b[j + 4 + n:j + 8 + n] \
                            != b"\r\n\r\n":
                        raise ValueError("warc: truncated record")
                    out["url"].append(fields.get("WARC-Target-URI"))
                    out["rec_type"].append(fields.get("WARC-Type"))
                    out["content_length"].append(n)
                    out["payload_md5"].append(
                        hashlib.md5(payload).hexdigest())
                    out["offset"].append(i)
                    out["rec_length"].append(j + 8 + n - i)
                    for k in keep:
                        out[k].append(getattr(row, k))
                    i = j + 8 + n
            yield pd.DataFrame(out)

    return files.select(*keep, file_col).mapInPandas(run, schema)
