"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Real pipelines carry image/audio/video as ``binary`` columns with a metadata
struct, and decode/featurize inside Arrow-batched ``mapInPandas`` so bytes
never round-trip through Python row objects. The decode libraries aren't in
this container, so the decode step is a clearly-marked STUB
(:func:`decode_image_stub` raises ``NotImplementedError``; the pipeline uses
:func:`_fake_features`, a deterministic pure-bytes featurizer) — but the
Spark-side plumbing (schema, batch iteration, partitioning, output shape) is
the real thing and is what the tests cover.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F

PAYLOAD_SCHEMA = (
    "doc_id long, payload binary, media_type string, n_bytes int"
)
FEATURES_SCHEMA = (
    "doc_id long, media_type string, n_bytes int, first_byte int, head_sum long"
)

#: media types cycled by the synthetic binary fixture (doc_id mod 3)
MEDIA_TYPES = ["image/png", "audio/wav", "video/mp4"]


def to_payload_table(documents: DataFrame) -> DataFrame:
    """Simulate a multimodal table: the doc text's bytes as an opaque binary
    payload plus typed metadata. (With real data this is the parquet/Iceberg
    binary column as-is — no text involved.)"""
    eligible = documents.filter(F.col("text").isNotNull() & (F.length("text") > 0))
    return eligible.select(
        "doc_id",
        F.encode("text", "UTF-8").alias("payload"),
        F.lit("text/plain").alias("media_type"),
        F.length(F.encode("text", "UTF-8")).alias("n_bytes"),
    )


def synthetic_binary_payloads(documents: DataFrame) -> DataFrame:
    """Deterministic REAL-binary fixture: payload = md5 digest bytes of the
    doc_id string (16 arbitrary bytes, most of them invalid UTF-8), media
    type cycled per doc. Proves the binary plumbing (Arrow binary columns
    through mapInPandas) on payloads that are not text in disguise; the
    DuckDB oracle reproduces the bytes via ``from_hex(md5(...))``."""
    mt = F.array(*[F.lit(m) for m in MEDIA_TYPES])
    return documents.select(
        "doc_id",
        F.unhex(F.md5(F.col("doc_id").cast("string"))).alias("payload"),
        F.element_at(mt, (F.col("doc_id") % 3 + 1).cast("int")).alias("media_type"),
        F.lit(16).alias("n_bytes"),
    )


def decode_image_stub(payload: bytes) -> "object":
    """STUB: real deployments decode with PIL/ffmpeg here (not installed in
    this container)."""
    raise NotImplementedError(
        "image/audio decode requires PIL/ffmpeg; wire the real decoder here"
    )


def _fake_features(payload: bytes) -> tuple[int, int, int]:
    """Deterministic stand-in featurizer: (n_bytes, first_byte, sum of the
    first 8 bytes). Pure bytes → reproducible everywhere, incl. the SQL
    oracle."""
    head = payload[:8]
    return len(payload), (payload[0] if payload else 0), int(sum(head))


def extract_features(payloads: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over the binary column. Batch shape:
    ``Iterator[pd.DataFrame]`` → ``Iterator[pd.DataFrame]`` (mapInPandas), so
    per-batch setup (a real model load) happens once per partition."""

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # real pipelines load the decoder/model HERE, once per partition
        for pdf in batches:
            feats = pdf["payload"].map(_fake_features)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": feats.map(lambda t: t[0]),
                    "first_byte": feats.map(lambda t: t[1]),
                    "head_sum": feats.map(lambda t: t[2]),
                }
            )

    return payloads.mapInPandas(featurize, FEATURES_SCHEMA)
