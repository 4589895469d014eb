"""BMP container codec (sources/bmp.py) + wiring.

Pins: exact round trips (8-bit palette gray ± RLE8, 24-bit BGR) over
every geometry class; hand-built 1/4-bit palette, top-down and 32-bit
files; all-gray palette collapse; byte-exact bidirectional
javax.imageio parity; Spark normalize wiring; seeded mutation fuzz
never raises. BMP deliberately has NO driver golden — the container
matrix queries (q156-q159) already certify the decode→signature
composition, and the window load stays reserved for the stale-tier
drain; parity here is the JDK, not an oracle.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from ocr_vector_db_spark.sources.bmp import (
    BMP_MAGIC,
    decode_bmp,
    encode_bmp,
)


def _gradient(w, h, seed=5):
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.sin(xx / (4.0 + seed)) * 55 + np.cos(yy / 5.0) * 45 + 128
    return np.clip(img, 0, 255).astype(np.uint8)


@pytest.mark.parametrize("w,h", [(72, 40), (37, 23), (1, 1), (33, 3)])
def test_round_trips(w, h):
    img = _gradient(w, h)
    assert decode_bmp(encode_bmp(img.tobytes(), w, h, 1))["raw"] == \
        img.tobytes()
    d = decode_bmp(encode_bmp(img.tobytes(), w, h, 1, rle=True))
    assert d["raw"] == img.tobytes() and d["channels"] == 1
    rgb = np.stack([img, 255 - img, np.roll(img, 3, 1)], -1)
    d = decode_bmp(encode_bmp(rgb.tobytes(), w, h, 3))
    assert d["raw"] == rgb.tobytes() and d["channels"] == 3


def _pal_bmp(bits, rows_packed, width, height, pal_rgb, neg=False):
    pal = b"".join(bytes((b_, g, r, 0)) for r, g, b_ in pal_rgb)
    pal += bytes(4 * ((1 << bits) - len(pal_rgb)))
    pix_off = 14 + 40 + len(pal)
    info = struct.pack("<IiiHHIIiiII", 40, width,
                       -height if neg else height, 1, bits, 0,
                       len(rows_packed), 0, 0, len(pal_rgb), 0)
    return (BMP_MAGIC
            + struct.pack("<IHHI", pix_off + len(rows_packed), 0, 0,
                          pix_off) + info + pal + rows_packed)


def test_sub_byte_palette_depths():
    # 1-bit 10x2 checker (bottom-up rows)
    bits1 = np.zeros((2, 10), np.uint8)
    bits1[0, ::2] = 1
    bits1[1, 1::2] = 1
    packed = np.zeros((2, 4), np.uint8)
    for y in range(2):
        packed[1 - y, :2] = np.packbits(bits1[y])[:2]
    d = decode_bmp(_pal_bmp(1, packed.tobytes(), 10, 2,
                            [(0, 0, 0), (255, 255, 255)]))
    assert d["channels"] == 1
    assert d["raw"] == (bits1 * 255).astype(np.uint8).tobytes()

    # 4-bit 5x1 with a COLOR palette (no gray collapse)
    row = bytes([0x01, 0x23, 0x40]) + b"\x00"
    pal_rgb = [(10, 0, 0), (0, 20, 0), (0, 0, 30), (40, 40, 0),
               (0, 50, 50)]
    d = decode_bmp(_pal_bmp(4, row, 5, 1, pal_rgb))
    got = np.frombuffer(d["raw"], np.uint8).reshape(1, 5, 3)
    assert [tuple(v) for v in got[0]] == pal_rgb


def test_top_down_and_32bit():
    img = _gradient(8, 4)
    rgb = np.stack([img, 255 - img, np.roll(img, 1, 1)], -1)
    b = bytearray(encode_bmp(rgb.tobytes(), 8, 4, 3))
    struct.pack_into("<i", b, 22, -4)  # negative height = top-down
    stride = ((8 * 3 + 3) // 4) * 4
    (pix_off,) = struct.unpack_from("<I", b, 10)
    body = bytes(b[pix_off:])
    rows = [body[i * stride:(i + 1) * stride] for i in range(4)]
    b[pix_off:] = b"".join(reversed(rows))
    assert decode_bmp(bytes(b))["raw"] == rgb.tobytes()

    # 32-bit BGRX, hand-built bottom-up
    bgrx = np.zeros((4, 8, 4), np.uint8)
    bgrx[:, :, 0] = np.roll(img, 1, 1)  # B
    bgrx[:, :, 1] = 255 - img           # G
    bgrx[:, :, 2] = img                 # R
    pix_off = 14 + 40
    info = struct.pack("<IiiHHIIiiII", 40, 8, 4, 1, 32, 0,
                       bgrx.size, 0, 0, 0, 0)
    data = (BMP_MAGIC + struct.pack("<IHHI", pix_off + bgrx.size, 0,
                                    0, pix_off) + info
            + bgrx[::-1].tobytes())
    assert decode_bmp(data)["raw"] == rgb.tobytes()


def test_rejections_and_fuzz():
    assert decode_bmp(b"BMshort") is None
    assert decode_bmp(b"nope" + bytes(60)) is None
    img = _gradient(20, 10)
    corpus = [encode_bmp(img.tobytes(), 20, 10, 1),
              encode_bmp(img.tobytes(), 20, 10, 1, rle=True),
              encode_bmp(np.stack([img] * 3, -1).tobytes(), 20, 10, 3)]
    # 16-bit depth is honest passthrough
    b = bytearray(corpus[0])
    struct.pack_into("<H", b, 28, 16)
    assert decode_bmp(bytes(b)) is None
    rng = np.random.default_rng(37)
    for _ in range(2000):
        base = corpus[int(rng.integers(len(corpus)))]
        bad = bytearray(base)
        for _ in range(int(rng.integers(1, 4))):
            bad[int(rng.integers(len(bad)))] = int(rng.integers(256))
        try:
            out = decode_bmp(bytes(bad))
        except Exception as exc:  # pragma: no cover
            raise AssertionError(f"raised: {exc!r}")
        assert out is None or isinstance(out["raw"], bytes)


def test_normalize_assets_decodes_bmp(spark):
    from ocr_vector_db_spark.sources.containers import (
        normalize_assets,
        normalize_frame_rows,
    )

    img = _gradient(40, 24)
    rows = [
        ("pic", "unknown", encode_bmp(img.tobytes(), 40, 24, 1), {}),
        ("rle", "unknown",
         encode_bmp(img.tobytes(), 40, 24, 1, rle=True), {}),
        ("bad", "unknown", BMP_MAGIC + bytes(60), {}),
    ]
    adf = spark.createDataFrame(
        rows,
        "asset_id string, kind string, data binary, "
        "metadata map<string,string>",
    )
    got = {r.asset_id: r for r in normalize_assets(adf).collect()}
    for key in ("pic", "rle"):
        md = dict(got[key].metadata)
        assert (got[key].kind, md["container"], md["channels"]) == (
            "image", "bmp", "1"), key
        assert bytes(got[key].data) == img.tobytes()
    assert bytes(got["bad"].data) == bytes(rows[2][2])

    fdf = spark.createDataFrame(
        [("f1", encode_bmp(img.tobytes(), 40, 24, 1), 1, 1)],
        "id string, data binary, width int, height int",
    )
    out = normalize_frame_rows(fdf).collect()[0]
    assert (out.width, out.height) == (40, 24)
    assert bytes(out.data) == img.tobytes()


def test_jdk_bmp_parity_both_directions(spark):
    """javax.imageio's BMP codec: byte-exact agreement on our output
    (plain + RLE8 + 24-bit), and a JDK-written BMP decodes byte-exactly
    through us."""
    jvm = spark._jvm
    gw = spark.sparkContext._gateway

    def jdk_raw(data):
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

    img = _gradient(37, 23)
    for rle in (False, True):
        b = encode_bmp(img.tobytes(), 37, 23, 1, rle=rle)
        theirs = jdk_raw(b)
        ours = np.frombuffer(decode_bmp(b)["raw"], np.uint8).reshape(
            23, 37, 1)
        assert theirs is not None
        assert np.array_equal(theirs.astype(np.uint8), ours), rle
    rgb = np.stack([img, 255 - img, np.roll(img, 3, 1)], -1)
    b = encode_bmp(rgb.tobytes(), 37, 23, 3)
    assert np.array_equal(
        jdk_raw(b).astype(np.uint8),
        np.frombuffer(decode_bmp(b)["raw"], np.uint8).reshape(23, 37,
                                                              3))
    bi = jvm.java.awt.image.BufferedImage(
        37, 23, jvm.java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    arr = gw.new_array(gw.jvm.int, 37 * 23)
    flat = img.reshape(-1)
    for i in range(flat.size):
        arr[i] = int(flat[i])
    bi.getRaster().setPixels(0, 0, 37, 23, arr)
    baos = jvm.java.io.ByteArrayOutputStream()
    assert jvm.javax.imageio.ImageIO.write(bi, "bmp", baos)
    d = decode_bmp(bytes(baos.toByteArray()))
    assert d is not None and d["channels"] == 1
    assert d["raw"] == img.tobytes()
