"""Baseline + progressive JPEG codec (sources/jpeg.py) + container
wiring (q157).

Pins: encode→decode round trips stay within tight error bounds across
gray / RGB 4:4:4 / RGB 4:2:0, every geometry class (MCU-aligned, odd,
tiny), quality levels, and restart intervals; progressive (SOF2)
encode→decode agrees BIT-EXACTLY with the baseline decode of the same
pixels (same quantized coefficients, two entropy codings); strict
rejection (None, never an exception) of everything the module does
not own — arithmetic SOF9, 12-bit precision, truncation,
entropy-stream lies, absurd geometry; 16-bit DQT precision accepted;
and the Spark pass — a JPEG re-encode of a raw raster decodes through
`normalize_assets` to pixels that dHash within a small Hamming radius
of the raw twin (near-dup, NOT identity: JPEG is lossy, unlike q156's
exact WAV/PNG round trips).

INDEPENDENT parity (verdict r14 #4): the JDK's javax.imageio JPEG
decoder — a real-world, widely-deployed implementation reachable
through the running SparkSession's py4j gateway, no extra imports —
must agree with ours within IDCT rounding (±3) on our encoder's
baseline AND progressive output, and on two tiny committed fixtures
produced by an EXTERNAL encoder (tests/fixtures/ext_*.jpg, from the
CPython/IPython test suites). PyMuPDF parity still runs when fitz is
importable (not in this sandbox).
"""

from __future__ import annotations

import hashlib
import pathlib
import struct

import numpy as np
import pytest

from ocr_vector_db_spark.sources.jpeg import (
    JPEG_MAGIC,
    ZIGZAG,
    decode_jpeg,
    encode_jpeg,
    encode_jpeg_progressive,
)

FIXTURES = pathlib.Path(__file__).parent / "fixtures"


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

    # arithmetic (SOF9): honest passthrough; a baseline stream with
    # its marker flipped to SOF2 is a CORRUPT progressive file (the
    # baseline SOS header declares band 0-63, illegal for a SOF2 DC
    # scan) and must also reject cleanly
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
    """Container wiring: baseline AND progressive JPEG rows decode
    through normalize_assets to raw pixels + container=jpeg metadata;
    an arithmetic-coded (SOF9) JPEG passes through byte-identical."""
    from pyspark.sql import functions as F

    from ocr_vector_db_spark.sources.containers import normalize_assets

    w, h = 40, 24
    img = _gradient(w, h, "spark")
    jpg = encode_jpeg(img.tobytes(), w, h, 1, quality=92)
    pjpg = encode_jpeg_progressive(img.tobytes(), w, h, 1, quality=92)
    arith = bytearray(jpg)
    j = jpg.index(b"\xff\xc0")
    arith[j + 1] = 0xC9
    rows = [
        ("jpg", "unknown", jpg, {}),
        ("pjpg", "unknown", pjpg, {}),
        ("arith", "unknown", bytes(arith), {}),
    ]
    adf = spark.createDataFrame(
        rows,
        "asset_id string, kind string, data binary, "
        "metadata map<string,string>",
    )
    got = {r.asset_id: r for r in normalize_assets(adf).collect()}
    for key in ("jpg", "pjpg"):
        md = dict(got[key].metadata)
        assert (got[key].kind, md["container"], md["format"]) == (
            "image", "jpeg", "raw"), key
        assert (md["width"], md["height"], md["channels"]) == (
            str(w), str(h), "1"), key
        dec = np.frombuffer(bytes(got[key].data), np.uint8).reshape(h, w)
        assert np.abs(dec.astype(int) - img.astype(int)).max() <= 12
    # same pixel pipeline → the two entropy codings decode identically
    assert bytes(got["jpg"].data) == bytes(got["pjpg"].data)
    assert bytes(got["arith"].data) == bytes(arith)  # passthrough
    _ = F  # imported for parity with sibling tests


# ------------------------------------------------------- progressive


@pytest.mark.parametrize("w,h", [(64, 48), (17, 9), (8, 8), (1, 1),
                                 (100, 3), (72, 40)])
def test_progressive_gray_matches_baseline_exactly(w, h):
    """SOF2 is just another entropy coding of the SAME quantized
    coefficients: all six scan kinds of the gray script (DC first at
    Al=1 + refine, AC 1-5/6-63 first at Al=2, refine to 1 then 0 with
    EOB runs and correction bits) must reconstruct coefficients
    bit-exactly, so decoded pixels equal the baseline decode."""
    img = _gradient(w, h, f"p{w}x{h}")
    base = decode_jpeg(encode_jpeg(img.tobytes(), w, h, 1, quality=90))
    data = encode_jpeg_progressive(img.tobytes(), w, h, 1, quality=90)
    assert b"\xff\xc2" in data and b"\xff\xc0" not in data[2:]
    prog = decode_jpeg(data)
    assert (prog["width"], prog["height"], prog["channels"]) == (w, h, 1)
    assert prog["raw"] == base["raw"]


@pytest.mark.parametrize("subsample", ["4:4:4", "4:2:0", "4:2:2",
                                       "4:4:0"])
def test_progressive_rgb_matches_baseline_exactly(subsample):
    """Color script adds interleaved DC scans over subsampled MCUs and
    per-component non-interleaved AC scans on the TRUE block grid
    (which differs from the padded grid when width%16 ≤ 8)."""
    w, h = 72, 40
    g = _gradient(w, h, "prgb")
    rgb = np.stack([g, np.roll(g, 3, axis=1), 255 - g], axis=-1)
    base = decode_jpeg(encode_jpeg(rgb.tobytes(), w, h, 3, quality=85,
                                   subsample=subsample))
    prog = decode_jpeg(encode_jpeg_progressive(
        rgb.tobytes(), w, h, 3, quality=85, subsample=subsample))
    assert prog["raw"] == base["raw"]


def test_progressive_restart_intervals():
    """RSTn inside progressive scans: DC predictors, EOB runs and the
    correction-bit buffer all reset per restart segment."""
    w, h = 80, 56
    img = _gradient(w, h, "prst")
    base = decode_jpeg(encode_jpeg(img.tobytes(), w, h, 1, quality=85))
    for ri in (1, 3, 7):
        data = encode_jpeg_progressive(img.tobytes(), w, h, 1,
                                       quality=85, restart_interval=ri)
        assert b"\xff\xdd" in data
        assert decode_jpeg(data)["raw"] == base["raw"], ri
    rgb = np.stack([img] * 3, axis=-1)
    b3 = decode_jpeg(encode_jpeg(rgb.tobytes(), w, h, 3, quality=85,
                                 subsample="4:2:0"))
    d3 = decode_jpeg(encode_jpeg_progressive(
        rgb.tobytes(), w, h, 3, quality=85, subsample="4:2:0",
        restart_interval=2))
    assert d3["raw"] == b3["raw"]


def test_progressive_noisy_high_detail():
    """Noise maximizes nonzero AC coefficients → exercises ZRL-in-
    refinement, correction-bit buffering and EOB-run edge cases that
    smooth gradients never reach."""
    rng = np.random.default_rng(42)
    for ch, sub in [(1, "4:4:4"), (3, "4:4:4"), (3, "4:2:0")]:
        px = rng.integers(0, 256, (56, 88, ch)).astype(np.uint8)
        base = decode_jpeg(encode_jpeg(px.tobytes(), 88, 56, ch,
                                       quality=92, subsample=sub))
        prog = decode_jpeg(encode_jpeg_progressive(
            px.tobytes(), 88, 56, ch, quality=92, subsample=sub))
        assert prog["raw"] == base["raw"], (ch, sub)


def test_progressive_rejections():
    img = _gradient(32, 24, "prej")
    good = encode_jpeg_progressive(img.tobytes(), 32, 24, 1, quality=85)
    # truncated mid-scan → None (never an exception)
    assert decode_jpeg(good[:-15]) is None
    # every mid-stream byte flip decodes or rejects, never raises
    for off in range(len(good) - 40, len(good) - 5):
        bad = bytearray(good)
        bad[off] ^= 0x55
        out = decode_jpeg(bytes(bad))
        assert out is None or len(out["raw"]) == 32 * 24
    # an AC scan claiming two components violates T.81 G.1 → None
    i = good.index(b"\xff\xda")  # first SOS (DC, ns=1 gray)
    hacked = bytearray(good)
    hacked[i + 4] = 2  # ns=2 with only one component declared
    assert decode_jpeg(bytes(hacked)) is None


# ------------------------------------ independent decoder parity (JDK)


def _imageio_decode(spark, data: bytes):
    """Decode JPEG bytes with the JVM's javax.imageio (an independent,
    known-good decoder that ships with the Java 17 Spark already
    requires), via the running session's py4j gateway. Reads the RAW
    raster (getPixels), NOT getRGB — getRGB routes a grayscale image
    through a linear-gray→sRGB ColorSpace conversion (128→188)."""
    jvm = spark._jvm
    gw = spark.sparkContext._gateway
    stream = jvm.java.io.ByteArrayInputStream(data)
    img = jvm.javax.imageio.ImageIO.read(stream)
    if img is None:
        return None
    w, h = img.getWidth(), img.getHeight()
    raster = img.getRaster()
    nb = raster.getNumBands()
    arr = gw.new_array(gw.jvm.int, w * h * nb)
    raster.getPixels(0, 0, w, h, arr)
    return np.array(list(arr), np.int32).reshape(h, w, nb)


def _ours(data):
    dec = decode_jpeg(data)
    return np.frombuffer(dec["raw"], np.uint8).reshape(
        dec["height"], dec["width"], dec["channels"]).astype(np.int32)


def test_jdk_parity_external_fixtures(spark):
    """Committed fixtures from EXTERNAL encoders (CPython / IPython
    test suites — real libjpeg-family output with its own huffman
    tables and JFIF layout): ours vs javax.imageio. The gray 2×2 must
    match exactly; the 4:2:0 16×16 logo differs only by chroma
    upsampling style (JDK interpolates, we replicate — T.81 leaves
    this to the implementation), so it gets a mean bound and an
    exact-luma check instead of a pixel pin."""
    data = (FIXTURES / "ext_gray_2x2.jpg").read_bytes()
    theirs = _imageio_decode(spark, data)
    ours = _ours(data)
    assert theirs.shape == (2, 2, 1) and ours.shape == (2, 2, 1)
    assert np.array_equal(theirs, ours)

    data = (FIXTURES / "ext_rgb420_16x16.jpg").read_bytes()
    theirs = _imageio_decode(spark, data)
    ours = _ours(data)
    assert theirs.shape == (16, 16, 3) and ours.shape == (16, 16, 3)
    diff = np.abs(theirs - ours)
    assert diff.mean() <= 8.0
    luma = lambda a: a.astype(float) @ [0.299, 0.587, 0.114]  # noqa
    y_diff = np.abs(luma(theirs) - luma(ours))
    # luma is NOT subsampled in this file: only IDCT rounding + the
    # chroma bleed through color conversion may differ
    assert np.median(y_diff) <= 2.0


def test_jdk_parity_our_encoder_baseline(spark):
    """Our baseline output decoded by the JDK vs by us: at 4:4:4 the
    only legal divergence is IDCT rounding — pin it at ±3."""
    rng = np.random.default_rng(7)
    g = (_gradient(64, 48, "jdkg").astype(float)
         + rng.normal(0, 25, (48, 64))).clip(0, 255).astype(np.uint8)
    data = encode_jpeg(g.tobytes(), 64, 48, 1, quality=85)
    assert np.abs(_imageio_decode(spark, data) - _ours(data)).max() <= 3

    rgb = rng.integers(0, 256, (40, 72, 3)).astype(np.uint8)
    data = encode_jpeg(rgb.tobytes(), 72, 40, 3, quality=90,
                       subsample="4:4:4", restart_interval=3)
    assert np.abs(_imageio_decode(spark, data) - _ours(data)).max() <= 3


def test_jdk_parity_our_encoder_progressive(spark):
    """The NEW progressive writer/reader against the independent
    decoder: if our EOB-run or correction-bit framing were wrong in
    any direction, the JDK's decode would diverge wildly, not by ±3."""
    rng = np.random.default_rng(11)
    g = (_gradient(64, 48, "jdkp").astype(float)
         + rng.normal(0, 25, (48, 64))).clip(0, 255).astype(np.uint8)
    data = encode_jpeg_progressive(g.tobytes(), 64, 48, 1, quality=85)
    assert np.abs(_imageio_decode(spark, data) - _ours(data)).max() <= 3

    rgb = rng.integers(0, 256, (40, 72, 3)).astype(np.uint8)
    data = encode_jpeg_progressive(rgb.tobytes(), 72, 40, 3, quality=90,
                                   subsample="4:4:4")
    assert np.abs(_imageio_decode(spark, data) - _ours(data)).max() <= 3
    # 4:2:0 with restarts: JDK decodes it (stream well-formed), bounded
    # loosely (upsampling styles differ on noise)
    data = encode_jpeg_progressive(rgb.tobytes(), 72, 40, 3, quality=80,
                                   subsample="4:2:0", restart_interval=3)
    theirs = _imageio_decode(spark, data)
    assert theirs is not None
    assert np.abs(theirs - _ours(data)).mean() <= 16.0


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
