"""TIFF container codec (sources/tiff.py) + wiring (q158).

Pins: exact round trips for every lossless compression × strip shape ×
sample layout; bilevel CCITT fax paths (G3/G4/RLE) against the
already-certified ccitt.py; JPEG-in-TIFF within JPEG error bounds;
FillOrder 2 bit reversal; big-endian files; 16-bit high-byte
reduction; palette expansion; predictor-2 LZW; multi-page IFD chains
with cycle guards; strict rejection (None, never an exception) for
everything unsupported or malformed; the Spark normalize_assets /
normalize_frame_rows wiring; and INDEPENDENT parity — the JDK's
javax.imageio TIFF reader (shipped since Java 9, reachable through
the running SparkSession) must agree byte-exactly on our lossless
output.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from ocr_vector_db_spark.sources.tiff import (
    TIFF_MAGIC_BE,
    TIFF_MAGIC_LE,
    decode_tiff,
    encode_tiff,
    encode_tiff_pages,
    extract_tiff_pages,
    n_tiff_pages,
    packbits_decode,
    packbits_encode,
)


def _gradient(w, h, seed=3):
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.sin(xx / (4.0 + seed)) * 55 + np.cos(yy / 5.0) * 45 + 128
    return np.clip(img, 0, 255).astype(np.uint8)


def test_packbits_round_trip_property():
    rng = np.random.default_rng(11)
    for _ in range(50):
        n = int(rng.integers(0, 400))
        # mix long runs and literals
        d = bytes(rng.integers(0, 3, n).astype(np.uint8))
        assert packbits_decode(packbits_encode(d)) == d
    # worst-case incompressible
    d = bytes(rng.integers(0, 256, 999).astype(np.uint8))
    assert packbits_decode(packbits_encode(d)) == d
    with pytest.raises(Exception):
        packbits_decode(b"\x05ab")  # truncated literal


@pytest.mark.parametrize("comp", ["none", "packbits", "lzw"])
@pytest.mark.parametrize("rps", [None, 1, 7])
def test_lossless_round_trips(comp, rps):
    img = _gradient(37, 23)
    rgb = np.stack([img, 255 - img, np.roll(img, 5, axis=1)], -1)
    for raw, ch in [(img.tobytes(), 1), (rgb.tobytes(), 3)]:
        t = encode_tiff(raw, 37, 23, ch, comp, rows_per_strip=rps)
        d = decode_tiff(t)
        assert d["raw"] == raw
        assert (d["width"], d["height"], d["channels"]) == (37, 23, ch)


@pytest.mark.parametrize("comp", ["g3", "g4"])
def test_bilevel_fax_round_trips(comp):
    img = _gradient(70, 30)
    bil = ((img > 127) * 255).astype(np.uint8)
    for rps in (None, 9):
        t = encode_tiff(bil.tobytes(), 70, 30, 1, comp,
                        rows_per_strip=rps)
        d = decode_tiff(t)
        assert d["raw"] == bil.tobytes(), (comp, rps)
        assert d["channels"] == 1


def test_bilevel_raw_and_packbits():
    """1-bit raw strips (MSB-first rows, photometric 0) and their
    PackBits wrap — hand-built, not via our encoder."""
    width, height = 11, 5
    bits = np.zeros((height, width), np.uint8)
    bits[::2, ::3] = 1  # ink
    rowbytes = (width + 7) // 8
    packed = np.packbits(bits, axis=1).tobytes()
    assert len(packed) == rowbytes * height

    def tif(comp, strip):
        entries = [
            (256, 4, [width]), (257, 4, [height]), (258, 3, [1]),
            (259, 3, [comp]), (262, 3, [0]), (273, 4, [200]),
            (277, 3, [1]), (278, 4, [height]), (279, 4, [len(strip)]),
        ]
        out = bytearray(TIFF_MAGIC_LE + struct.pack("<I", 8))
        body = struct.pack("<H", len(entries))
        for tag, typ, vals in entries:
            payload = struct.pack(
                "<" + str(len(vals)) + {3: "H", 4: "I"}[typ], *vals)
            body += struct.pack("<HHI", tag, typ, len(vals)) \
                + payload.ljust(4, b"\x00")
        out += body + struct.pack("<I", 0)
        out += b"\x00" * (200 - len(out))  # strip parked at offset 200
        out += strip
        return bytes(out)

    want = ((1 - bits) * 255).astype(np.uint8).tobytes()  # photo 0
    assert decode_tiff(tif(1, packed))["raw"] == want
    assert decode_tiff(tif(32773, packbits_encode(packed)))["raw"] == \
        want


def test_fillorder2_ccitt():
    """Fax files commonly store CCITT bits LSB-first (FillOrder 2) —
    reverse-bit the codestream and the decode must be identical."""
    img = _gradient(40, 18)
    bil = ((img > 127) * 255).astype(np.uint8)
    t = bytearray(encode_tiff(bil.tobytes(), 40, 18, 1, "g4"))
    # parse: find IFD, add FillOrder 2 by rebuilding via pages writer
    # is complex — instead reverse the strip bytes in place and patch
    # a FillOrder entry into the IFD using the known writer layout:
    # strips first, then IFD; tag table is sorted so inserting means
    # rebuild. Simplest robust route: decode the original, re-encode
    # by hand with the tag present.
    d0 = decode_tiff(bytes(t))
    assert d0["raw"] == bil.tobytes()
    from ocr_vector_db_spark.sources.ccitt import encode_g4

    ink = bytes(1 if b < 128 else 0 for b in bil.tobytes())
    strip = encode_g4(ink, 40, 18)
    rev = bytes(int(f"{b:08b}"[::-1], 2) for b in strip)
    entries = [
        (256, 4, [40]), (257, 4, [18]), (258, 3, [1]), (259, 3, [4]),
        (262, 3, [0]), (266, 3, [2]), (273, 4, [200]), (277, 3, [1]),
        (278, 4, [18]), (279, 4, [len(rev)]),
    ]
    out = bytearray(TIFF_MAGIC_LE + struct.pack("<I", 8))
    body = struct.pack("<H", len(entries))
    for tag, typ, vals in entries:
        payload = struct.pack(
            "<" + str(len(vals)) + {3: "H", 4: "I"}[typ], *vals)
        body += struct.pack("<HHI", tag, typ, len(vals)) \
            + payload.ljust(4, b"\x00")
    out += body + struct.pack("<I", 0)
    out += b"\x00" * (200 - len(out))
    out += rev
    assert decode_tiff(bytes(out))["raw"] == bil.tobytes()


def test_big_endian_and_16bit():
    """MM byte order with 16-bit samples: values reduce to the high
    byte (the PNG/WAV convention), endianness-aware."""
    width, height = 6, 4
    hi = _gradient(width, height)
    samples = (hi.astype(np.uint16) << 8) | 0x5A  # low byte is noise
    strip = samples.astype(">u2").tobytes()
    entries = [
        (256, 4, [width]), (257, 4, [height]), (258, 3, [16]),
        (259, 3, [1]), (262, 3, [1]), (273, 4, [130]), (277, 3, [1]),
        (278, 4, [height]), (279, 4, [len(strip)]),
    ]
    out = bytearray(TIFF_MAGIC_BE + struct.pack(">I", 8))
    body = struct.pack(">H", len(entries))
    for tag, typ, vals in entries:
        payload = struct.pack(
            ">" + str(len(vals)) + {3: "H", 4: "I"}[typ], *vals)
        body += struct.pack(">HHI", tag, typ, len(vals)) \
            + payload.ljust(4, b"\x00")
    out += body + struct.pack(">I", 0)
    out += b"\x00" * (130 - len(out))
    out += strip
    d = decode_tiff(bytes(out))
    assert d["raw"] == hi.tobytes()


def test_palette_expands_through_colormap():
    width, height = 8, 3
    idx = np.arange(width * height, dtype=np.uint8).reshape(
        height, width) % 16
    cmap = [0] * (3 * 256)
    for i in range(16):  # 16 used entries, 16-bit values
        cmap[i] = (i * 17) << 8          # R
        cmap[256 + i] = (255 - i * 17) << 8  # G
        cmap[512 + i] = (i * 8) << 8     # B
    strip = idx.tobytes()
    entries = [
        (256, 4, [width]), (257, 4, [height]), (258, 3, [8]),
        (259, 3, [1]), (262, 3, [3]), (273, 4, [1700]), (277, 3, [1]),
        (278, 4, [height]), (279, 4, [len(strip)]),
        (320, 3, cmap),
    ]
    out = bytearray(TIFF_MAGIC_LE + struct.pack("<I", 8))
    body = struct.pack("<H", len(entries))
    extra = bytearray()
    extra_base = 8 + 2 + 12 * len(entries) + 4
    for tag, typ, vals in entries:
        payload = struct.pack(
            "<" + str(len(vals)) + {3: "H", 4: "I"}[typ], *vals)
        head = struct.pack("<HHI", tag, typ, len(vals))
        if len(payload) <= 4:
            body += head + payload.ljust(4, b"\x00")
        else:
            body += head + struct.pack("<I", extra_base + len(extra))
            extra += payload
    out += body + struct.pack("<I", 0) + extra
    out += b"\x00" * (1700 - len(out))
    out += strip
    d = decode_tiff(bytes(out))
    assert d["channels"] == 3
    got = np.frombuffer(d["raw"], np.uint8).reshape(height, width, 3)
    assert got[0, 1].tolist() == [17, 238, 8]
    assert got[0, 0].tolist() == [0, 255, 0]


def test_jpeg_in_tiff_and_predictor():
    img = _gradient(64, 32)
    t = encode_tiff(img.tobytes(), 64, 32, 1, "jpeg", quality=92)
    d = decode_tiff(t)
    err = np.abs(np.frombuffer(d["raw"], np.uint8).astype(int)
                 - img.reshape(-1).astype(int))
    assert err.max() <= 12
    # predictor 2 (horizontal differencing) + LZW, hand-built
    rgb = np.stack([img, 255 - img, np.roll(img, 3, 1)], -1)
    diff = rgb.astype(np.int16)
    diff[:, 1:, :] -= rgb[:, :-1, :].astype(np.int16)
    diff = (diff % 256).astype(np.uint8)
    from ocr_vector_db_spark.sources.pdf_decode import lzw_encode

    strip = lzw_encode(diff.tobytes())
    entries = [
        (256, 4, [64]), (257, 4, [32]), (258, 3, [8, 8, 8]),
        (259, 3, [5]), (262, 3, [2]), (273, 4, [400]), (277, 3, [3]),
        (278, 4, [32]), (279, 4, [len(strip)]), (317, 3, [2]),
    ]
    out = bytearray(TIFF_MAGIC_LE + struct.pack("<I", 8))
    body = struct.pack("<H", len(entries))
    extra = bytearray()
    extra_base = 8 + 2 + 12 * len(entries) + 4
    for tag, typ, vals in entries:
        payload = struct.pack(
            "<" + str(len(vals)) + {3: "H", 4: "I"}[typ], *vals)
        head = struct.pack("<HHI", tag, typ, len(vals))
        if len(payload) <= 4:
            body += head + payload.ljust(4, b"\x00")
        else:
            body += head + struct.pack("<I", extra_base + len(extra))
            extra += payload
    out += body + struct.pack("<I", 0) + extra
    out += b"\x00" * (400 - len(out))
    out += strip
    assert decode_tiff(bytes(out))["raw"] == rgb.tobytes()


def test_multipage_chain_and_page_count():
    img = _gradient(20, 10)
    pages = [
        {"raw": img.tobytes(), "width": 20, "height": 10,
         "channels": 1},
        {"raw": (255 - img).tobytes(), "width": 20, "height": 10,
         "channels": 1},
        {"raw": np.stack([img] * 3, -1).tobytes(), "width": 20,
         "height": 10, "channels": 3},
    ]
    t = encode_tiff_pages(pages, "packbits")
    assert n_tiff_pages(t) == 3
    got = extract_tiff_pages(t)
    assert [p["page"] for p in got] == [0, 1, 2]
    assert got[1]["data"] == (255 - img).tobytes()
    assert got[2]["metadata"]["channels"] == "3"
    assert got[0]["metadata"]["pages"] == "3"
    assert decode_tiff(t, page=2)["channels"] == 3
    assert decode_tiff(t, page=9) is None
    # a self-looping IFD chain must terminate, not spin: point the
    # LAST page's next-IFD pointer back at the first IFD
    loop = bytearray(t)
    (first_ifd,) = struct.unpack_from("<I", loop, 4)
    off, prev_ptr = first_ifd, 4
    while off:
        (cnt,) = struct.unpack_from("<H", loop, off)
        prev_ptr = off + 2 + cnt * 12
        (off,) = struct.unpack_from("<I", loop, prev_ptr)
    struct.pack_into("<I", loop, prev_ptr, first_ifd)
    assert n_tiff_pages(bytes(loop)) == 3  # cycle guard stops the walk


def test_rejections_return_none_never_raise():
    img = _gradient(24, 12)
    good = encode_tiff(img.tobytes(), 24, 12, 1, "lzw")
    assert decode_tiff(b"nottiff") is None
    assert decode_tiff(TIFF_MAGIC_LE + b"junk") is None
    assert decode_tiff(good[:30]) is None  # truncated mid-IFD/strip
    assert n_tiff_pages(b"nottiff") == 0
    assert extract_tiff_pages(b"nottiff") == []
    for off in range(8, min(len(good), 120)):
        bad = bytearray(good)
        bad[off] ^= 0xA5
        try:
            out = decode_tiff(bytes(bad))
        except Exception as exc:  # pragma: no cover
            raise AssertionError(f"raised at {off}: {exc}")
        assert out is None or isinstance(out["raw"], bytes)
    # absurd geometry rejects before allocation
    big = bytearray(good)
    (first_ifd,) = struct.unpack_from("<I", big, 4)
    (n,) = struct.unpack_from("<H", big, first_ifd)
    for k in range(n):
        tag, typ, cnt = struct.unpack_from("<HHI", big,
                                           first_ifd + 2 + 12 * k)
        if tag == 256:
            struct.pack_into("<I", big, first_ifd + 2 + 12 * k + 8,
                             1 << 20)
    assert decode_tiff(bytes(big)) is None


def test_tiff_mutation_fuzz_never_raises():
    """Seeded 2k-mutation no-raise fuzz across every compression —
    the r14 JPEG fuzz discipline applied to the TIFF walk (IFD bounds,
    strip offsets, codec dispatch all see hostile bytes)."""
    img = _gradient(28, 18)
    bil = ((img > 127) * 255).astype(np.uint8)
    corpus = [
        encode_tiff(img.tobytes(), 28, 18, 1, "none"),
        encode_tiff(img.tobytes(), 28, 18, 1, "packbits"),
        encode_tiff(img.tobytes(), 28, 18, 1, "lzw", rows_per_strip=5),
        encode_tiff(img.tobytes(), 28, 18, 1, "jpeg"),
        encode_tiff(bil.tobytes(), 28, 18, 1, "g4"),
        encode_tiff(bil.tobytes(), 28, 18, 1, "g3"),
    ]
    rng = np.random.default_rng(23)
    for _ in range(2000):
        base = corpus[int(rng.integers(len(corpus)))]
        bad = bytearray(base)
        for _ in range(int(rng.integers(1, 4))):
            bad[int(rng.integers(len(bad)))] = int(rng.integers(256))
        try:
            out = decode_tiff(bytes(bad))
            n_tiff_pages(bytes(bad))
        except Exception as exc:  # pragma: no cover
            raise AssertionError(f"raised: {exc!r}")
        assert out is None or isinstance(out["raw"], bytes)


def test_normalize_assets_decodes_tiff(spark):
    from ocr_vector_db_spark.sources.containers import (
        normalize_assets,
        normalize_frame_rows,
    )

    img = _gradient(40, 24)
    bil = ((img > 127) * 255).astype(np.uint8)
    pages = [
        {"raw": img.tobytes(), "width": 40, "height": 24,
         "channels": 1},
        {"raw": bil.tobytes(), "width": 40, "height": 24,
         "channels": 1},
    ]
    rows = [
        ("scan", "unknown", encode_tiff_pages(pages, "g4")
         if False else encode_tiff_pages(pages, "lzw"), {}),
        ("fax", "unknown", encode_tiff(bil.tobytes(), 40, 24, 1,
                                       "g4"), {}),
        ("bad", "unknown", TIFF_MAGIC_BE + b"junk", {}),
    ]
    adf = spark.createDataFrame(
        rows,
        "asset_id string, kind string, data binary, "
        "metadata map<string,string>",
    )
    got = {r.asset_id: r for r in normalize_assets(adf).collect()}
    md = dict(got["scan"].metadata)
    assert (got["scan"].kind, md["container"], md["pages"]) == (
        "image", "tiff", "2")
    assert bytes(got["scan"].data) == img.tobytes()  # page 0
    assert bytes(got["fax"].data) == bil.tobytes()
    assert bytes(got["bad"].data) == bytes(rows[2][2])  # passthrough

    fdf = spark.createDataFrame(
        [("f1", encode_tiff(img.tobytes(), 40, 24, 1, "packbits"),
          1, 1)],
        "id string, data binary, width int, height int",
    )
    out = normalize_frame_rows(fdf).collect()[0]
    assert (out.width, out.height) == (40, 24)  # header wins over row
    assert bytes(out.data) == img.tobytes()


def test_explode_tiff_pages_fan_out(spark):
    """Multi-page fan-out: a 3-page TIFF becomes three image rows
    (asset_id#pN, per-page dims/metadata) that dedup INDIVIDUALLY
    against their raw twins through the perceptual stack; non-TIFF and
    corrupt-TIFF rows pass through unchanged."""
    from pyspark.sql import functions as F

    from ocr_vector_db_spark.operators.image_hash import (
        asset_raw_frames,
        dhash_signatures_mixed,
    )
    from ocr_vector_db_spark.sources.containers import (
        explode_tiff_pages,
    )

    img = _gradient(40, 24)
    pages = [
        {"raw": img.tobytes(), "width": 40, "height": 24,
         "channels": 1},
        {"raw": (255 - img).tobytes(), "width": 40, "height": 24,
         "channels": 1},
        {"raw": np.roll(img, 7, 1).tobytes(), "width": 40,
         "height": 24, "channels": 1},
    ]
    rows = [
        ("fax", "unknown", encode_tiff_pages(pages, "lzw"),
         {"src": "s"}),
        ("plain", "text", b"not a tiff", {"k": "v"}),
        ("broken", "unknown", TIFF_MAGIC_LE + b"junk", {}),
        # raw twin of page 1 — must pair with fax#p1's signature
        ("p1_raw", "image", (255 - img).tobytes(),
         {"format": "raw", "channels": "1", "width": "40",
          "height": "24"}),
    ]
    adf = spark.createDataFrame(
        rows,
        "asset_id string, kind string, data binary, "
        "metadata map<string,string>",
    )
    got = {r.asset_id: r for r in explode_tiff_pages(adf).collect()}
    assert set(got) == {"fax#p0", "fax#p1", "fax#p2", "plain",
                       "broken", "p1_raw"}
    for i in range(3):
        r = got[f"fax#p{i}"]
        md = dict(r.metadata)
        assert (r.kind, md["page"], md["pages"], md["src"]) == (
            "image", str(i), "3", "s")
        assert bytes(r.data) == pages[i]["raw"]
    assert bytes(got["plain"].data) == b"not a tiff"
    assert dict(got["plain"].metadata) == {"k": "v"}
    assert bytes(got["broken"].data) == TIFF_MAGIC_LE + b"junk"

    sigs = {r.id: r.dhash for r in dhash_signatures_mixed(
        asset_raw_frames(explode_tiff_pages(adf))).collect()}
    assert sigs["fax#p1"] == sigs["p1_raw"]  # per-page dedup works
    _ = F


def test_jdk_imageio_tiff_parity(spark):
    """Independent decoder parity: the JDK's built-in TIFF reader
    (javax.imageio, since Java 9) must agree BYTE-EXACTLY with ours on
    our lossless output across compressions, and on G4 fax."""
    jvm = spark._jvm
    gw = spark.sparkContext._gateway

    def jdk(data):
        img = jvm.javax.imageio.ImageIO.read(
            jvm.java.io.ByteArrayInputStream(data))
        if img is None:
            return None
        w, h = img.getWidth(), img.getHeight()
        raster = img.getRaster()
        nb = raster.getNumBands()
        arr = gw.new_array(gw.jvm.int, w * h * nb)
        raster.getPixels(0, 0, w, h, arr)
        return np.array(list(arr), np.int32).reshape(h, w, nb)

    img = _gradient(33, 21)
    rgb = np.stack([img, 255 - img, np.roll(img, 4, 1)], -1)
    cases = [
        (img.tobytes(), 1, "none"), (img.tobytes(), 1, "packbits"),
        (img.tobytes(), 1, "lzw"), (rgb.tobytes(), 3, "lzw"),
    ]
    for raw, ch, comp in cases:
        t = encode_tiff(raw, 33, 21, ch, comp, rows_per_strip=6)
        theirs = jdk(t)
        assert theirs is not None, comp
        ours = np.frombuffer(decode_tiff(t)["raw"], np.uint8).reshape(
            21, 33, ch)
        assert np.array_equal(theirs, ours), (comp, ch)
    bil = ((img > 127) * 255).astype(np.uint8)
    t = encode_tiff(bil.tobytes(), 33, 21, 1, "g4")
    theirs = jdk(t)
    assert theirs is not None
    ours = np.frombuffer(decode_tiff(t)["raw"], np.uint8).reshape(
        21, 33, 1)
    # JDK returns bilevel as 0/1 samples; scale for comparison
    if theirs.max() <= 1:
        theirs = theirs * 255
    assert np.array_equal(theirs, ours)

    # LZW width-boundary crossing (the r15 early-change off-by-one this
    # parity test CAUGHT: our pair widened one entry early on both
    # sides — self-consistent, invisible to round trips, misaligned
    # with every real decoder once the table passed 510 entries)
    rng = np.random.default_rng(17)
    big = (rng.integers(0, 5, (120, 200)) * 60).astype(np.uint8)
    t = encode_tiff(big.tobytes(), 200, 120, 1, "lzw")
    theirs = jdk(t)
    assert theirs is not None
    assert np.array_equal(theirs.reshape(120, 200), big)

    # and the REVERSE direction: a JDK-WRITTEN LZW TIFF (independent
    # encoder) must decode byte-exactly through our strip walk
    bi = jvm.java.awt.image.BufferedImage(
        200, 120, jvm.java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    arr = gw.new_array(gw.jvm.int, 200 * 120)
    flat = big.reshape(-1)
    for i in range(flat.size):
        arr[i] = int(flat[i])
    bi.getRaster().setPixels(0, 0, 200, 120, arr)
    writer = jvm.javax.imageio.ImageIO.getImageWritersByFormatName(
        "tiff").next()
    baos = jvm.java.io.ByteArrayOutputStream()
    ios = jvm.javax.imageio.ImageIO.createImageOutputStream(baos)
    writer.setOutput(ios)
    param = writer.getDefaultWriteParam()
    param.setCompressionMode(
        jvm.javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    param.setCompressionType("LZW")
    writer.write(None, jvm.javax.imageio.IIOImage(bi, None, None),
                 param)
    ios.flush()
    ext = bytes(baos.toByteArray())
    d = decode_tiff(ext)
    assert d is not None and d["raw"] == big.tobytes()
