"""Baseline JPEG raster decode (operators/jpegdec) against the
independent encoder in fixtures_jpeg — the same planted-oracle
discipline as the PNG/WAV round trips: writer and parser share no
code, uniform-per-block images reconstruct EXACTLY (their DCT is a
bare integer DC coefficient), full-random images reconstruct within
float-rounding tolerance at quant=1."""

from __future__ import annotations

import math

import numpy as np
import pytest

from jsonschema_validator_spark.fixtures_jpeg import encode_baseline_jpeg
from jsonschema_validator_spark.operators.jpegdec import decode_jpeg_raster


def _rnd(x):
    return max(0, min(255, math.floor(x + 0.5)))


def test_gray_uniform_blocks_exact():
    rng = np.random.RandomState(11)
    vals = rng.randint(0, 256, size=(3, 5))
    img = np.repeat(np.repeat(vals, 8, axis=0), 8, axis=1).astype(np.uint8)
    d = decode_jpeg_raster(encode_baseline_jpeg([img]))
    assert d["kind"] == "image/jpeg"
    assert (d["width"], d["height"], d["bit_depth"]) == (40, 24, 8)
    assert d["pixel_sum"] == int(img.astype(np.int64).sum())


def test_gray_random_near_lossless():
    rng = np.random.RandomState(5)
    img = rng.randint(0, 256, size=(32, 40)).astype(np.uint8)
    d = decode_jpeg_raster(encode_baseline_jpeg([img]))
    # quant all-ones: error is only DCT float rounding, < 1 per pixel;
    # the sum over 1280 pixels stays within a tiny band
    assert abs(d["pixel_sum"] - int(img.astype(np.int64).sum())) <= 64


def test_color_444_uniform_exact_rgb():
    y, cb, cr = 90, 100, 180
    planes = [np.full((16, 16), v, np.uint8) for v in (y, cb, cr)]
    d = decode_jpeg_raster(encode_baseline_jpeg(planes))
    exp = 256 * (
        _rnd(y + 1.402 * (cr - 128))
        + _rnd(y - 0.344136 * (cb - 128) - 0.714136 * (cr - 128))
        + _rnd(y + 1.772 * (cb - 128))
    )
    assert d["pixel_sum"] == exp


def test_color_420_with_restart_markers():
    rng = np.random.RandomState(3)
    yv = rng.randint(0, 256, (4, 4))
    yp = np.repeat(np.repeat(yv, 8, 0), 8, 1).astype(np.uint8)  # 32x32
    cb = np.full((16, 16), 77, np.uint8)
    cr = np.full((16, 16), 200, np.uint8)
    enc = encode_baseline_jpeg(
        [yp, cb, cr], sampling=[(2, 2), (1, 1), (1, 1)], restart_interval=2
    )
    assert b"\xff\xd0" in enc or b"\xff\xd1" in enc  # RSTn actually emitted
    d = decode_jpeg_raster(enc)
    assert (d["width"], d["height"]) == (32, 32)
    # exact: uniform blocks per component; replicate the conversion
    exp = 0
    for by in range(4):
        for bx in range(4):
            yy = int(yv[by, bx])
            exp += 64 * (
                _rnd(yy + 1.402 * (200 - 128))
                + _rnd(yy - 0.344136 * (77 - 128) - 0.714136 * (200 - 128))
                + _rnd(yy + 1.772 * (77 - 128))
            )
    assert d["pixel_sum"] == exp


def test_odd_dims_cropped():
    rng = np.random.RandomState(9)
    img = rng.randint(0, 256, (13, 21)).astype(np.uint8)
    d = decode_jpeg_raster(encode_baseline_jpeg([img]))
    assert (d["width"], d["height"]) == (21, 13)


def test_lossy_quant_table_decodes():
    rng = np.random.RandomState(1)
    img = rng.randint(0, 256, (16, 16)).astype(np.uint8)
    q = np.array([16, 11, 10, 16, 24, 40, 51, 61] * 8)
    d = decode_jpeg_raster(encode_baseline_jpeg([img], quant_luma=q))
    assert d is not None and d["pixel_sum"] is not None


def test_progressive_and_garbage_fall_back():
    # progressive: flip SOF0 marker to SOF2 in a valid stream
    img = np.full((8, 8), 42, np.uint8)
    enc = bytearray(encode_baseline_jpeg([img]))
    i = enc.find(b"\xff\xc0")
    enc[i + 1] = 0xC2
    assert decode_jpeg_raster(bytes(enc)) is None
    # garbage after SOI
    assert decode_jpeg_raster(b"\xff\xd8\x00\x01\x02") is None
    # not a JPEG at all
    assert decode_jpeg_raster(b"\x89PNG\r\n\x1a\n") is None


def test_decode_image_bytes_routes_jpeg_full_raster(spark):
    """decode_images (the mapInPandas surface) now returns a real
    pixel_sum for baseline JPEG payloads, and still header-only for a
    SOS-less JPEG prefix (the image_headers planting)."""
    from jsonschema_validator_spark.operators.multimodal import decode_images

    img = np.repeat(np.repeat(np.arange(4).reshape(2, 2) * 60, 8, 0), 8, 1).astype(
        np.uint8
    )
    full = encode_baseline_jpeg([img])
    # header-only prefix: SOI + SOF0 segment, no scan
    i = full.find(b"\xff\xc4")
    prefix = full[:i] + b"\xff\xd9"
    df = spark.createDataFrame(
        [(1, bytearray(full)), (2, bytearray(prefix))], "doc_id long, img binary"
    )
    rows = {r["doc_id"]: r for r in decode_images(df, "doc_id", "img").collect()}
    assert rows[1]["pixel_sum"] == int(img.astype(np.int64).sum())
    assert rows[1]["width"] == 16 and rows[1]["height"] == 16
    assert rows[2]["pixel_sum"] is None  # header fallback keeps dims
    assert rows[2]["width"] == 16


def test_16bit_quant_table_parsed():
    """DQT precision 1 (16-bit table entries, T.81 B.2.4.1): rewrite a
    valid 8-bit-DQT stream into the 16-bit encoding of the same table —
    decode must be identical."""
    import struct

    img = np.repeat(np.repeat(np.arange(4).reshape(2, 2) * 50, 8, 0), 8, 1).astype(
        np.uint8
    )
    enc = encode_baseline_jpeg([img])
    want = decode_jpeg_raster(enc)["pixel_sum"]
    i = enc.find(b"\xff\xdb")
    seglen = struct.unpack_from(">H", enc, i + 2)[0]
    assert seglen == 67  # 2 + 1 + 64 (8-bit table)
    body = enc[i + 4 : i + 2 + seglen]
    pq_tq, table = body[0], body[1:]
    assert pq_tq == 0x00
    wide = bytes([0x10]) + b"".join(
        struct.pack(">H", v) for v in table
    )  # pq=1, same values
    enc16 = (
        enc[: i + 2]
        + struct.pack(">H", len(wide) + 2)
        + wide
        + enc[i + 2 + seglen :]
    )
    d = decode_jpeg_raster(enc16)
    assert d is not None and d["pixel_sum"] == want


def test_truncated_entropy_stream_returns_none():
    """Truncation mid-entropy must fall back (None), not emit a
    partial raster. The image must be incompressible — a uniform one
    fits its whole entropy stream in ~10 bytes and legitimately
    survives a near-SOS cut."""
    rng = np.random.RandomState(21)
    img = rng.randint(0, 256, (32, 40)).astype(np.uint8)
    enc = encode_baseline_jpeg([img])
    sos = enc.find(b"\xff\xda")
    assert len(enc) - sos > 500  # incompressible: plenty of entropy bytes
    cut = enc[: sos + 30]
    assert decode_jpeg_raster(cut) is None
