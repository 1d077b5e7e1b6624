"""PNG/WAV codec correctness (analysis/media_codecs.py) + the Spark decode
pipeline (multimodal.decode_media_features)."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from searchengine_spark.analysis import media_codecs as mc
from searchengine_spark.analysis import multimodal


# ---------------------------------------------------------------------------
# PNG round-trips (encoder emits filter 0; decoder must invert exactly)
# ---------------------------------------------------------------------------
@pytest.mark.parametrize("channels", [1, 2, 3, 4])
def test_png_roundtrip_exact(channels):
    rng = np.random.RandomState(channels)
    img = rng.randint(0, 256, size=(13, 7, channels), dtype=np.uint8)
    out = mc.png_decode(mc.png_encode(img))
    np.testing.assert_array_equal(out, img)


def test_png_grayscale_2d_input():
    img = np.arange(20, dtype=np.uint8).reshape(4, 5)
    out = mc.png_decode(mc.png_encode(img))
    np.testing.assert_array_equal(out[:, :, 0], img)


# ---------------------------------------------------------------------------
# all five scanline filters, verified against an independent straight-line
# unfilter written from RFC 2083 §6 (per-byte ints, no numpy)
# ---------------------------------------------------------------------------
def _reference_unfilter(raw: bytes, w: int, h: int, c: int) -> list:
    stride = w * c
    out = []
    prev = [0] * stride
    pos = 0
    for _y in range(h):
        ft = raw[pos]
        row = list(raw[pos + 1 : pos + 1 + stride])
        pos += 1 + stride
        cur = [0] * stride
        for x in range(stride):
            a = cur[x - c] if x >= c else 0
            b = prev[x]
            cc = prev[x - c] if x >= c else 0
            if ft == 0:
                r = row[x]
            elif ft == 1:
                r = row[x] + a
            elif ft == 2:
                r = row[x] + b
            elif ft == 3:
                r = row[x] + (a + b) // 2
            elif ft == 4:
                p = a + b - cc
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else cc)
                r = row[x] + pr
            cur[x] = r % 256
        out.append(cur)
        prev = cur
    return out


def _png_from_raw(raw: bytes, w: int, h: int, ctype: int) -> bytes:
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + mc._chunk(b"IHDR", ihdr)
        + mc._chunk(b"IDAT", zlib.compress(raw))
        + mc._chunk(b"IEND", b"")
    )


@pytest.mark.parametrize("ctype,c", [(0, 1), (2, 3), (6, 4)])
def test_png_all_filter_types_match_reference(ctype, c):
    rng = np.random.RandomState(42 + ctype)
    w, h = 6, 5
    stride = w * c
    # one scanline per filter type 0..4
    raw = b"".join(
        bytes([ft]) + rng.randint(0, 256, stride).astype(np.uint8).tobytes()
        for ft in range(5)
    )
    got = mc.png_decode(_png_from_raw(raw, w, h, ctype))
    exp = np.array(_reference_unfilter(raw, w, h, c), dtype=np.uint8)
    np.testing.assert_array_equal(got.reshape(h, stride), exp)


def test_png_rejects_bad_inputs():
    img = np.zeros((3, 3, 3), dtype=np.uint8)
    good = mc.png_encode(img)
    with pytest.raises(ValueError, match="signature"):
        mc.png_decode(b"JUNK" + good)
    corrupted = bytearray(good)
    corrupted[20] ^= 0xFF  # flip a byte inside IHDR → CRC mismatch
    with pytest.raises(ValueError, match="CRC"):
        mc.png_decode(bytes(corrupted))
    # 16-bit depth is out of scope and must raise, not silently garble
    ihdr = struct.pack(">IIBBBBB", 3, 3, 16, 2, 0, 0, 0)
    deep = (
        b"\x89PNG\r\n\x1a\n"
        + mc._chunk(b"IHDR", ihdr)
        + mc._chunk(b"IDAT", zlib.compress(b"\x00" * (3 * (1 + 18))))
        + mc._chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="depth"):
        mc.png_decode(deep)


def test_box_downsample_exact_integer_means():
    img = np.arange(4 * 4 * 1, dtype=np.uint8).reshape(4, 4, 1)
    out = mc.box_downsample(img, 2)
    # each 2x2 box mean, floor-divided
    exp = np.array([[[2], [4]], [[10], [12]]], dtype=np.uint8)
    np.testing.assert_array_equal(out, exp)


# ---------------------------------------------------------------------------
# WAV
# ---------------------------------------------------------------------------
@pytest.mark.parametrize("channels", [1, 2])
def test_wav_roundtrip_exact(channels):
    rng = np.random.RandomState(7 + channels)
    samples = rng.randint(-32768, 32768, size=(50, channels)).astype(np.int16)
    out, rate = mc.wav_decode(mc.wav_encode(samples, 44100))
    assert rate == 44100
    np.testing.assert_array_equal(out, samples)


def test_wav_rejects_non_pcm():
    data = bytearray(mc.wav_encode(np.zeros(4, dtype=np.int16), 8000))
    data[20] = 3  # format tag -> IEEE float
    with pytest.raises(ValueError, match="format tag"):
        mc.wav_decode(bytes(data))


# ---------------------------------------------------------------------------
# Spark pipeline: encode fixture → decode features, vs local numpy
# ---------------------------------------------------------------------------
def test_decode_media_features_end_to_end(spark):
    docs = spark.range(0, 12).withColumnRenamed("id", "doc_id")
    payloads = multimodal.synthetic_media_payloads(docs)
    got = (
        multimodal.decode_media_features(payloads)
        .toPandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert len(got) == 12
    for d in range(12):
        row = got.loc[d]
        if d % 2 == 0:
            y, x, c = np.meshgrid(
                np.arange(6), np.arange(8), np.arange(3), indexing="ij"
            )
            img = ((d + 3 * x + 5 * y + 17 * c) % 256).astype("uint8")
            assert (row["width"], row["height"], row["channels"]) == (8, 6, 3)
            assert row["pixel_mean"] == round(float(img.mean()), 6)
        else:
            t = np.arange(64, dtype=np.int64)
            samples = (((d * 31 + t * 7) % 4096) - 2048).astype("int16")
            rms = round(float(np.sqrt(np.mean(samples.astype(np.float64) ** 2))), 6)
            assert (row["sample_rate"], row["n_samples"]) == (8000, 64)
            assert row["rms"] == rms


def test_decode_media_features_raises_on_unknown_type(spark):
    df = spark.createDataFrame(
        [(1, b"\x00\x01", "video/mp4")],
        "doc_id long, payload binary, media_type string",
    )
    with pytest.raises(Exception, match="no decoder"):
        multimodal.decode_media_features(df).collect()
