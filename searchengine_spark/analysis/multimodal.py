"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Real pipelines carry image/audio/video as ``binary`` columns with a metadata
struct, and decode/featurize inside Arrow-batched ``mapInPandas`` so bytes
never round-trip through Python row objects.

Decode status by format:

- ``image/png`` and ``audio/wav``: REAL decoders, written from the public
  specs in numpy + stdlib zlib/struct (``analysis/media_codecs.py``) —
  :func:`decode_media_features` runs them inside the Arrow batches.
- JPEG / video: still a clearly-marked STUB (:func:`decode_image_stub`
  raises ``NotImplementedError``) — DCT/ffmpeg codecs aren't in this
  container and are out of scope for a from-scratch build.
- :func:`extract_features` (+ :func:`_fake_features`) remains the
  format-agnostic pure-bytes featurizer with a byte-accurate DuckDB oracle
  (``q_multimodal_binary``); the PNG/WAV path is pytest-verified via
  encode→decode round-trips (zlib output isn't SQL-expressible).
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
    """STUB for the formats that genuinely need external codecs (JPEG's DCT,
    video via ffmpeg — not installed in this container, and a from-scratch
    DCT pipeline is out of scope). PNG and PCM WAV decode is REAL — see
    :mod:`searchengine_spark.analysis.media_codecs` and
    :func:`decode_media_features`."""
    raise NotImplementedError(
        "JPEG/video decode requires PIL/ffmpeg; PNG and WAV are implemented "
        "in analysis/media_codecs.py"
    )


# decoded-media feature schema: one row per payload, modality-specific
# columns null for the other modality
DECODED_SCHEMA = (
    "doc_id long, media_type string, width int, height int, channels int, "
    "pixel_mean double, sample_rate int, n_samples long, rms double"
)


def decode_media_features(payloads: DataFrame) -> DataFrame:
    """REAL decode + featurize over the binary column, Arrow-batched
    (``mapInPandas``): ``image/png`` payloads through the from-scratch PNG
    decoder (zlib inflate + scanline unfilter,
    :func:`media_codecs.png_decode`), ``audio/wav`` through the RIFF/PCM
    decoder. Emits per-payload modality features — image (width, height,
    channels, pixel mean), audio (rate, sample count, RMS). Unknown media
    types raise (no silent drops); batch shape and partitioning are
    identical to :func:`extract_features`, so the scale path
    (rows-per-executor parallelism, decoder state loaded once per
    partition) is the same."""
    from searchengine_spark.analysis import media_codecs as mc

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = []
            for doc_id, payload, media_type in zip(
                pdf["doc_id"], pdf["payload"], pdf["media_type"]
            ):
                if media_type == "image/png":
                    img = mc.png_decode(bytes(payload))
                    h, w, c = img.shape
                    rows.append(
                        (doc_id, media_type, w, h, c,
                         round(float(img.mean()), 6), None, None, None)
                    )
                elif media_type == "audio/wav":
                    samples, rate = mc.wav_decode(bytes(payload))
                    rms = float(
                        np.sqrt(np.mean(samples.astype(np.float64) ** 2))
                    )
                    rows.append(
                        (doc_id, media_type, None, None, None, None,
                         rate, samples.shape[0], round(rms, 6))
                    )
                else:
                    raise ValueError(f"no decoder for media type {media_type}")
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "media_type", "width", "height", "channels",
                    "pixel_mean", "sample_rate", "n_samples", "rms",
                ],
            )

    return payloads.mapInPandas(decode, DECODED_SCHEMA)


def synthetic_media_payloads(documents: DataFrame) -> DataFrame:
    """Deterministic REAL-media fixture: even doc_ids carry an actual PNG
    (8×6 RGB, pixel values a fixed function of (doc_id, x, y, channel)),
    odd doc_ids an actual PCM WAV (64 samples of a doc_id-seeded integer
    ramp at 8 kHz). Encoding runs in the same Arrow batches the decode path
    uses, so the fixture exercises real binary payloads end-to-end without
    any external library."""
    from searchengine_spark.analysis import media_codecs as mc

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                if d % 2 == 0:
                    y, x, c = np.meshgrid(
                        np.arange(6), np.arange(8), np.arange(3),
                        indexing="ij",
                    )
                    img = ((d + 3 * x + 5 * y + 17 * c) % 256).astype("uint8")
                    rows.append((d, mc.png_encode(img), "image/png"))
                else:
                    t = np.arange(64, dtype=np.int64)
                    samples = (((d * 31 + t * 7) % 4096) - 2048).astype(
                        "int16"
                    )
                    rows.append((d, mc.wav_encode(samples, 8000), "audio/wav"))
            yield pd.DataFrame(
                rows, columns=["doc_id", "payload", "media_type"]
            )

    return documents.select("doc_id").mapInPandas(
        encode, "doc_id long, payload binary, media_type string"
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
