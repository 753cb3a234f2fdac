"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The pattern for image/audio/video at 100 TB: keep the payload as a
`binary` column, carry typed metadata beside it, and run decode /
feature-extract / resize / frame-sample as Arrow-batched pandas UDFs
over mapInPandas — the Spark-side schema, batching, and partitioning
are real and tested here; the actual codecs are STUBBED (this container
has no image/audio libraries) behind NotImplementedError with a
deterministic metadata-sniff fallback.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    LongType, StringType, StructField, StructType,
)

SNIFF_SCHEMA = StructType([
    StructField("url", StringType(), False),
    StructField("n_bytes", LongType(), False),
    StructField("sniffed_type", StringType(), False),
])

_MAGIC = [
    (b"\x89PNG", "image/png"),
    (b"\xff\xd8\xff", "image/jpeg"),
    (b"RIFF", "audio/wav"),
    (b"<html", "text/html"),
]


def decode_image(payload: bytes) -> object:
    """Stub: decode an image payload to HWC array. A real deployment
    plugs Pillow/libvips here; the container ships neither."""
    raise NotImplementedError("image codecs not available in this container")


def decode_audio(payload: bytes) -> object:
    raise NotImplementedError("audio codecs not available in this container")


def sniff_binary(pages: DataFrame, payload_col: str = "html") -> DataFrame:
    """(url, n_bytes, sniffed_type) via Arrow-batched mapInPandas —
    the same plumbing a decode/feature-extract stage uses."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def sniff(b) -> str:
            raw = bytes(b)
            for magic, typ in _MAGIC:
                if raw[: len(magic)] == magic:
                    return typ
            return "application/octet-stream"

        for pdf in batches:
            payload = pdf[payload_col]
            yield pd.DataFrame({
                "url": pdf["url"],
                "n_bytes": payload.map(len).astype("int64"),
                "sniffed_type": payload.map(sniff),
            })

    return pages.select("url", payload_col).mapInPandas(run, SNIFF_SCHEMA)
