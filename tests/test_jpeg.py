"""Baseline JPEG codec (sources/jpeg.py) + container wiring (q157).

Pins: encode→decode round trips stay within tight error bounds across
gray / RGB 4:4:4 / RGB 4:2:0, every geometry class (MCU-aligned, odd,
tiny), quality levels, and restart intervals; strict rejection (None,
never an exception) of everything the module does not own —
progressive SOF2, arithmetic SOF9, 12-bit precision, truncation,
entropy-stream lies, absurd geometry; 16-bit DQT precision accepted;
and the Spark pass — a JPEG re-encode of a raw raster decodes through
`normalize_assets` to pixels that dHash within a small Hamming radius
of the raw twin (near-dup, NOT identity: JPEG is lossy, unlike q156's
exact WAV/PNG round trips). External parity runs when PyMuPDF is
importable (skipped in this sandbox, like the PDF parity gates).
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pytest

from ocr_vector_db_spark.sources.jpeg import (
    JPEG_MAGIC,
    ZIGZAG,
    decode_jpeg,
    encode_jpeg,
)


def _gradient(w, h, seed="g"):
    """Smooth deterministic test image (natural-image-like: small
    quantization error), md5-seeded so tests are reproducible."""
    b = hashlib.md5(seed.encode()).digest()
    yy, xx = np.mgrid[0:h, 0:w]
    img = (
        np.sin(xx / (5.0 + b[0] % 7)) * 55
        + np.cos(yy / (4.0 + b[1] % 5)) * 45
        + 128
    )
    return np.clip(img, 0, 255).astype(np.uint8)


def test_zigzag_is_the_standard_order():
    # spot-pin the generated walk against the published T.81 sequence
    assert ZIGZAG[:10] == [0, 1, 8, 16, 9, 2, 3, 10, 17, 24]
    assert ZIGZAG[-6:] == [61, 54, 47, 55, 62, 63]
    assert sorted(ZIGZAG) == list(range(64))


@pytest.mark.parametrize("w,h", [(64, 48), (17, 9), (23, 31), (8, 8),
                                 (1, 1), (100, 3)])
def test_gray_round_trip_error_bound(w, h):
    img = _gradient(w, h, f"{w}x{h}")
    dec = decode_jpeg(encode_jpeg(img.tobytes(), w, h, 1, quality=90))
    assert (dec["width"], dec["height"], dec["channels"]) == (w, h, 1)
    got = np.frombuffer(dec["raw"], np.uint8).reshape(h, w)
    err = np.abs(got.astype(int) - img.astype(int))
    assert err.max() <= 12 and err.mean() <= 3.0


@pytest.mark.parametrize("subsample", ["4:4:4", "4:2:0", "4:2:2",
                                       "4:4:0"])
def test_rgb_round_trip_error_bound(subsample):
    w, h = 72, 40
    g = _gradient(w, h, "rgb")
    rgb = np.stack([g, np.roll(g, 3, axis=1), 255 - g], axis=-1)
    dec = decode_jpeg(
        encode_jpeg(rgb.tobytes(), w, h, 3, quality=90,
                    subsample=subsample)
    )
    assert (dec["width"], dec["height"], dec["channels"]) == (w, h, 3)
    got = np.frombuffer(dec["raw"], np.uint8).reshape(h, w, 3)
    err = np.abs(got.astype(int) - rgb.astype(int))
    # subsampling loses chroma resolution; luma stays tight either way
    assert err.mean() <= (1.6 if subsample == "4:4:4" else 4.5)
    y_err = np.abs(
        got.astype(float) @ [0.299, 0.587, 0.114]
        - rgb.astype(float) @ [0.299, 0.587, 0.114]
    )
    assert y_err.max() <= 10


def test_quality_curve_monotone():
    """Lower quality → smaller file and (weakly) larger error."""
    w, h = 64, 64
    img = _gradient(w, h, "q")
    sizes, errs = [], []
    for q in (95, 75, 40, 10):
        data = encode_jpeg(img.tobytes(), w, h, 1, quality=q)
        got = np.frombuffer(decode_jpeg(data)["raw"], np.uint8)
        sizes.append(len(data))
        errs.append(
            np.abs(got.astype(int) - img.reshape(-1).astype(int)).mean()
        )
    assert sizes == sorted(sizes, reverse=True)
    assert errs[0] <= errs[-1]


def test_restart_intervals_round_trip():
    """DRI/RSTn: predictors reset and the stream re-aligns at every
    restart — decode must agree exactly with the no-restart decode."""
    w, h = 80, 56
    img = _gradient(w, h, "rst")
    plain = decode_jpeg(encode_jpeg(img.tobytes(), w, h, 1, quality=85))
    for ri in (1, 3, 7):
        data = encode_jpeg(img.tobytes(), w, h, 1, quality=85,
                           restart_interval=ri)
        assert b"\xff\xdd" in data  # DRI segment present
        dec = decode_jpeg(data)
        assert dec["raw"] == plain["raw"], f"restart_interval={ri}"
    # RGB 4:2:0 with restarts too
    rgb = np.stack([img] * 3, axis=-1)
    p3 = decode_jpeg(encode_jpeg(rgb.tobytes(), w, h, 3, quality=85,
                                 subsample="4:2:0"))
    d3 = decode_jpeg(encode_jpeg(rgb.tobytes(), w, h, 3, quality=85,
                                 subsample="4:2:0", restart_interval=2))
    assert d3["raw"] == p3["raw"]


def test_sixteen_bit_dqt_accepted():
    """DQT precision 1 (16-bit entries) is legal baseline — rewrite the
    8-bit table segment as 16-bit and the decode must be identical."""
    w, h = 24, 16
    img = _gradient(w, h, "dqt16")
    data = encode_jpeg(img.tobytes(), w, h, 1, quality=90)
    # locate the DQT segment (FF DB, len 67, id byte 0x00, 64 entries)
    i = data.index(b"\xff\xdb")
    body = data[i + 4:i + 4 + 65]
    assert body[0] == 0x00
    wide = b"\x10" + b"".join(
        struct.pack(">H", v) for v in body[1:65]
    )
    data16 = (data[:i] + b"\xff\xdb" + struct.pack(">H", len(wide) + 2)
              + wide + data[i + 4 + 65:])
    assert decode_jpeg(data16)["raw"] == decode_jpeg(data)["raw"]


def test_rejections_return_none_never_raise():
    w, h = 24, 16
    img = _gradient(w, h, "rej")
    good = encode_jpeg(img.tobytes(), w, h, 1, quality=90)

    assert decode_jpeg(b"notajpeg") is None
    assert decode_jpeg(good[:20]) is None            # truncated header
    assert decode_jpeg(good[:-30]) is None           # truncated scan

    # progressive (SOF2) and arithmetic (SOF9): honest passthrough
    for sof in (0xC2, 0xC9):
        prog = bytearray(good)
        j = good.index(b"\xff\xc0")
        prog[j + 1] = sof
        assert decode_jpeg(bytes(prog)) is None

    # 12-bit precision
    deep = bytearray(good)
    j = good.index(b"\xff\xc0")
    deep[j + 4] = 12
    assert decode_jpeg(bytes(deep)) is None

    # absurd declared geometry rejects before allocating planes
    big = bytearray(good)
    struct.pack_into(">HH", big, j + 5, 60000, 60000)
    assert decode_jpeg(bytes(big)) is None

    # entropy-stream lies: flip bytes mid-scan — None or a decode, never
    # an uncaught exception
    for off in range(len(good) - 25, len(good) - 5):
        bad = bytearray(good)
        bad[off] ^= 0x55
        try:
            out = decode_jpeg(bytes(bad))
        except Exception as exc:  # pragma: no cover
            raise AssertionError(f"raised at offset {off}: {exc}")
        assert out is None or len(out["raw"]) == w * h


def test_normalize_assets_decodes_jpeg(spark):
    """Container wiring: a JPEG row decodes through normalize_assets to
    raw pixels + container=jpeg metadata; a progressive JPEG passes
    through byte-identical."""
    from pyspark.sql import functions as F

    from ocr_vector_db_spark.sources.containers import normalize_assets

    w, h = 40, 24
    img = _gradient(w, h, "spark")
    jpg = encode_jpeg(img.tobytes(), w, h, 1, quality=92)
    prog = bytearray(jpg)
    j = jpg.index(b"\xff\xc0")
    prog[j + 1] = 0xC2
    rows = [
        ("jpg", "unknown", jpg, {}),
        ("prog", "unknown", bytes(prog), {}),
    ]
    adf = spark.createDataFrame(
        rows,
        "asset_id string, kind string, data binary, "
        "metadata map<string,string>",
    )
    got = {r.asset_id: r for r in normalize_assets(adf).collect()}
    md = dict(got["jpg"].metadata)
    assert (got["jpg"].kind, md["container"], md["format"]) == (
        "image", "jpeg", "raw")
    assert (md["width"], md["height"], md["channels"]) == (
        str(w), str(h), "1")
    dec = np.frombuffer(bytes(got["jpg"].data), np.uint8).reshape(h, w)
    assert np.abs(dec.astype(int) - img.astype(int)).max() <= 12
    assert bytes(got["prog"].data) == bytes(prog)  # passthrough
    _ = F  # imported for parity with sibling tests


def test_external_decoder_parity():
    """When PyMuPDF is importable (not in this sandbox), a real decoder
    must agree with ours on our encoder's output within quantization
    tolerance — the same gated-parity pattern as the PDF stack."""
    fitz = pytest.importorskip("fitz")
    w, h = 48, 32
    img = _gradient(w, h, "fitz")
    data = encode_jpeg(img.tobytes(), w, h, 1, quality=90)
    pix = fitz.Pixmap(data)
    theirs = np.frombuffer(pix.samples, np.uint8).reshape(h, w, -1)
    theirs = theirs[:, :, 0]
    ours = np.frombuffer(decode_jpeg(data)["raw"], np.uint8).reshape(h, w)
    assert np.abs(theirs.astype(int) - ours.astype(int)).max() <= 2
