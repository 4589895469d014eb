"""WAV/RIFF + PNG container codecs and normalize_assets (q156).

Pins: PNG round-trips across all five scanline filter types, gray and
RGB, at non-cell-divisible dims; WAV chunk-walk edge cases (LIST chunks
before fmt, odd-size word alignment, WAVE_FORMAT_EXTENSIBLE, ragged
data tails); strict rejection of everything the module does not own;
and the Spark pass — containerized rows decode to raw shapes whose
perceptual signatures equal their raw twins', everything else passes
through byte-identical.
"""

from __future__ import annotations

import random
import struct

import pytest
from pyspark.sql import functions as F

from ocr_vector_db_spark.sources.containers import (
    PNG_MAGIC,
    decode_png,
    decode_wav,
    encode_png,
    encode_wav,
    normalize_assets,
    normalize_clip_rows,
    normalize_frame_rows,
)


@pytest.mark.parametrize("channels", [1, 3])
@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
def test_png_round_trip_every_filter(channels, filter_type):
    rnd = random.Random(f"{channels}:{filter_type}")
    w, h = 23, 11
    raw = bytes(rnd.randrange(256) for _ in range(w * h * channels))
    got = decode_png(encode_png(raw, w, h, channels,
                                filter_type=filter_type))
    assert got == {"raw": raw, "width": w, "height": h,
                   "channels": channels}


def test_png_rejections():
    raw = bytes(range(60))
    png = encode_png(raw, 10, 6, 1)
    assert decode_png(b"notapng") is None
    assert decode_png(PNG_MAGIC + b"garbage") is None
    assert decode_png(png[:40]) is None            # truncated chunk
    # 16-bit depth / palette / interlace are out of scope
    ihdr = struct.pack(">IIBBBBB", 10, 6, 16, 0, 0, 0, 0)
    deep = png.replace(png[8:33], (
        struct.pack(">I", 13) + b"IHDR" + ihdr + png[29:33]), 1)
    assert decode_png(deep) is None
    # corrupt the deflate stream: decode must return None, not raise
    bad = bytearray(png)
    bad[50] ^= 0xFF
    assert decode_png(bytes(bad)) is None


def test_png_decompression_bomb_is_bounded():
    """ADVICE r13: a crafted PNG whose IDAT inflates far past the
    declared geometry must be rejected by a BOUNDED inflate (the length
    check used to run only after a full zlib.decompress, so a ~100 KB
    row could attempt GB-scale allocations per executor)."""
    import zlib

    from ocr_vector_db_spark.sources.containers import (
        MAX_PIXELS,
        _png_chunk,
    )

    def craft(w, h, payload):
        ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
        return (PNG_MAGIC + _png_chunk(b"IHDR", ihdr)
                + _png_chunk(b"IDAT", zlib.compress(payload, 9))
                + _png_chunk(b"IEND", b""))

    # declares 10x6 gray (want=66 bytes) but inflates to 100 MB: the
    # crafted container is ~100 KB; decode must return None without
    # materializing the bomb (decompressobj max_length caps at want+1)
    bomb = craft(10, 6, b"\x00" * (100 * 1024 * 1024))
    assert len(bomb) < 200 * 1024
    assert decode_png(bomb) is None

    # absurd declared geometry (> MAX_PIXELS) rejects BEFORE any inflate
    assert (2 << 16) * (2 << 16) > MAX_PIXELS
    assert decode_png(craft(2 << 16, 2 << 16, b"")) is None

    # short stream (inflates to less than declared) rejects too
    assert decode_png(craft(10, 6, b"\x00" * 30)) is None

    # trailing garbage after a complete zlib stream rejects
    ihdr = struct.pack(">IIBBBBB", 10, 6, 8, 0, 0, 0, 0)
    good = zlib.compress(bytes(66), 9)
    tail = (PNG_MAGIC + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", good + b"junk")
            + _png_chunk(b"IEND", b""))
    assert decode_png(tail) is None

    # control: the same geometry with an exact payload still decodes
    ok = craft(10, 6, bytes(66))
    assert decode_png(ok) == {"raw": bytes(60), "width": 10, "height": 6,
                              "channels": 1}


@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
def test_png_palette_and_alpha_types(filter_type):
    """Verdict r13 #4: palette (PLTE lookup), gray+alpha and RGBA
    decode through the same filter reconstruction; alpha drops, a color
    palette expands to RGB, and an ALL-GRAY palette collapses to one
    channel so a palettized scan of a gray page is byte-identical to
    its raw gray twin."""
    rnd = random.Random(f"plte:{filter_type}")
    w, h = 23, 11

    # color palette → RGB expansion
    pal = bytes(rnd.randrange(256) for _ in range(3 * 16))
    idx = bytes(rnd.randrange(16) for _ in range(w * h))
    png = encode_png(idx, w, h, filter_type=filter_type, color_type=3,
                     palette=pal)
    want = b"".join(pal[3 * i:3 * i + 3] for i in idx)
    assert decode_png(png) == {"raw": want, "width": w, "height": h,
                               "channels": 3}

    # all-gray palette → collapses to channels=1, byte-equal to the twin
    gpal = bytes(v for v in range(0, 256, 16) for _ in range(3))
    gpng = encode_png(idx, w, h, filter_type=filter_type, color_type=3,
                      palette=gpal)
    gray_twin = bytes(16 * i for i in idx)
    assert decode_png(gpng) == {"raw": gray_twin, "width": w, "height": h,
                                "channels": 1}

    # gray+alpha → alpha dropped, channels=1
    gray = bytes(rnd.randrange(256) for _ in range(w * h))
    ga = b"".join(bytes((g, rnd.randrange(256))) for g in gray)
    apng = encode_png(ga, w, h, filter_type=filter_type, color_type=4)
    assert decode_png(apng) == {"raw": gray, "width": w, "height": h,
                                "channels": 1}

    # RGBA → alpha dropped, channels=3
    rgb = bytes(rnd.randrange(256) for _ in range(w * h * 3))
    rgba = b"".join(rgb[3 * i:3 * i + 3] + bytes((rnd.randrange(256),))
                    for i in range(w * h))
    cpng = encode_png(rgba, w, h, filter_type=filter_type, color_type=6)
    assert decode_png(cpng) == {"raw": rgb, "width": w, "height": h,
                                "channels": 3}


@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
@pytest.mark.parametrize("depth", [1, 2, 4])
def test_png_sub_byte_depths(depth, filter_type):
    """1/2/4-bit gray (bilevel document scans!) and palette PNGs decode
    with exact sample scaling; the filter unit is one byte regardless
    of depth (RFC 2083 §6.2)."""
    rnd = random.Random(f"d{depth}:{filter_type}")
    w, h = 29, 13  # stride not byte-aligned to the sample grid
    scale = {1: 255, 2: 85, 4: 17}[depth]
    vals = bytes(rnd.randrange(1 << depth) for _ in range(w * h))
    png = encode_png(vals, w, h, filter_type=filter_type, depth=depth)
    assert png[24] == depth  # IHDR bit-depth byte
    want = bytes(v * scale for v in vals)
    assert decode_png(png) == {"raw": want, "width": w, "height": h,
                               "channels": 1}

    # sub-byte palette: indices look up PLTE unscaled
    n = 1 << depth
    pal = bytes(rnd.randrange(256) for _ in range(3 * n))
    ppng = encode_png(vals, w, h, filter_type=filter_type,
                      color_type=3, palette=pal, depth=depth)
    wantp = b"".join(pal[3 * v:3 * v + 3] for v in vals)
    assert decode_png(ppng)["raw"] == wantp


@pytest.mark.parametrize("filter_type", [0, 2, 4])
def test_png_sixteen_bit_reduces_to_high_byte(filter_type):
    rnd = random.Random(f"16:{filter_type}")
    w, h = 21, 9
    hi = bytes(rnd.randrange(256) for _ in range(w * h))
    raw16 = b"".join(
        bytes((b, rnd.randrange(256))) for b in hi  # random low bytes
    )
    png = encode_png(raw16, w, h, filter_type=filter_type, depth=16)
    assert decode_png(png) == {"raw": hi, "width": w, "height": h,
                               "channels": 1}
    # 16-bit RGBA: high bytes of RGB, alpha dropped
    rgb_hi = bytes(rnd.randrange(256) for _ in range(w * h * 3))
    raw64 = b"".join(
        rgb_hi[3 * i:3 * i + 3][c:c + 1] + bytes((rnd.randrange(256),))
        for i in range(w * h) for c in range(3)
    )
    # interleave alpha sample (2 bytes) after each RGB triple
    raw64 = b"".join(
        b"".join(rgb_hi[3 * i + c:3 * i + c + 1]
                 + bytes((rnd.randrange(256),)) for c in range(3))
        + bytes((rnd.randrange(256), rnd.randrange(256)))
        for i in range(w * h)
    )
    png2 = encode_png(raw64, w, h, filter_type=filter_type,
                      color_type=6, depth=16)
    got = decode_png(png2)
    assert (got["channels"], got["raw"]) == (3, rgb_hi)

    # illegal pairs reject at both ends
    with pytest.raises(ValueError):
        encode_png(hi, w, h, depth=3)
    with pytest.raises(ValueError):
        encode_png(hi, w, h, color_type=2, depth=4)


@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
def test_png_adam7_interlace(filter_type):
    """Adam7 round trips pixel-exact across color types and depths —
    each of the seven sub-images is independently filtered, and
    de-interlacing scatters them back; dims too small for some passes
    (1×1, 3×2) skip the empty ones."""
    rnd = random.Random(f"a7:{filter_type}")

    for w, h in ((23, 11), (8, 8), (1, 1), (3, 2), (16, 5)):
        gray = bytes(rnd.randrange(256) for _ in range(w * h))
        png = encode_png(gray, w, h, filter_type=filter_type,
                         interlace=True)
        assert png[28] == 1  # IHDR interlace byte
        assert decode_png(png) == {"raw": gray, "width": w, "height": h,
                                   "channels": 1}

    w, h = 23, 11
    rgb = bytes(rnd.randrange(256) for _ in range(w * h * 3))
    png = encode_png(rgb, w, h, 3, filter_type=filter_type,
                     interlace=True)
    assert decode_png(png)["raw"] == rgb

    # interlaced bilevel scan (the classic fax-like shape)
    bits = bytes(rnd.randrange(2) for _ in range(w * h))
    png = encode_png(bits, w, h, filter_type=filter_type, depth=1,
                     interlace=True)
    assert decode_png(png)["raw"] == bytes(255 * v for v in bits)

    # interlaced 16-bit RGB reduces to high bytes
    hi = bytes(rnd.randrange(256) for _ in range(w * h * 3))
    raw48 = b"".join(bytes((b, rnd.randrange(256))) for b in hi)
    png = encode_png(raw48, w, h, filter_type=filter_type,
                     color_type=2, depth=16, interlace=True)
    assert decode_png(png)["raw"] == hi

    # interlaced palette
    pal = bytes(rnd.randrange(256) for _ in range(3 * 16))
    idx = bytes(rnd.randrange(16) for _ in range(w * h))
    png = encode_png(idx, w, h, filter_type=filter_type, color_type=3,
                     palette=pal, depth=4, interlace=True)
    assert decode_png(png)["raw"] == b"".join(
        pal[3 * i:3 * i + 3] for i in idx)


def test_png_palette_rejections():
    """A palette PNG whose container lies — missing/ragged PLTE or an
    index past the palette — is undecodable (exact-hash passthrough),
    never an out-of-bounds read."""
    import zlib

    from ocr_vector_db_spark.sources.containers import _png_chunk

    idx = bytes([0, 1, 2, 3] * 15)
    pal = bytes(range(12))  # 4 entries
    png = encode_png(idx, 10, 6, color_type=3, palette=pal)
    assert decode_png(png)["channels"] == 3

    # index 9 with only 4 palette entries
    bad_idx = bytes([0, 9] * 30)
    ihdr = struct.pack(">IIBBBBB", 10, 6, 8, 3, 0, 0, 0)
    plane = b"".join(b"\x00" + bad_idx[y * 10:(y + 1) * 10]
                     for y in range(6))
    bad = (PNG_MAGIC + _png_chunk(b"IHDR", ihdr)
           + _png_chunk(b"PLTE", pal)
           + _png_chunk(b"IDAT", zlib.compress(plane))
           + _png_chunk(b"IEND", b""))
    assert decode_png(bad) is None

    # PLTE missing entirely / ragged length
    no_plte = (PNG_MAGIC + _png_chunk(b"IHDR", ihdr)
               + _png_chunk(b"IDAT", zlib.compress(plane))
               + _png_chunk(b"IEND", b""))
    assert decode_png(no_plte) is None
    ragged = (PNG_MAGIC + _png_chunk(b"IHDR", ihdr)
              + _png_chunk(b"PLTE", pal + b"\x01")
              + _png_chunk(b"IDAT", zlib.compress(plane))
              + _png_chunk(b"IEND", b""))
    assert decode_png(ragged) is None

    with pytest.raises(ValueError):
        encode_png(idx, 10, 6, color_type=3)  # palette required
    with pytest.raises(ValueError):
        encode_png(idx, 10, 6, color_type=3, palette=b"\x00\x01")
    with pytest.raises(ValueError):
        encode_png(idx, 10, 6, color_type=7)


def test_decoders_never_raise_on_mutated_containers():
    """normalize_assets calls the decoders inside an executor UDF — an
    uncaught exception on a crafted crawl row would kill the job, so
    every mutation of a valid container must return a decode or None,
    NEVER raise. (A 20k-mutation sweep ran at review time; this pins a
    seeded 2.5k subset.)"""
    from ocr_vector_db_spark.sources.jpeg import decode_jpeg, encode_jpeg

    rnd = random.Random(14)
    img = bytes(rnd.randrange(256) for _ in range(40 * 24))
    seeds = {
        "png": encode_png(img, 40, 24, 1, filter_type=4),
        "png_i": encode_png(img, 40, 24, 1, filter_type=2,
                            interlace=True),
        "png_p": encode_png(bytes(v % 16 for v in img), 40, 24,
                            color_type=3, palette=bytes(range(48)),
                            depth=4),
        "wav": encode_wav(img, 16000, 1),
        "jpg": encode_jpeg(img, 40, 24, 1, quality=80),
    }
    for name, base in seeds.items():
        dec = decode_jpeg if name == "jpg" else (
            decode_wav if name == "wav" else decode_png)
        for _ in range(500):
            b = bytearray(base)
            mode = rnd.randrange(4)
            if mode == 0:
                for _ in range(rnd.randrange(1, 6)):
                    b[rnd.randrange(len(b))] ^= rnd.randrange(1, 256)
            elif mode == 1:
                b = b[:rnd.randrange(len(b))]
            elif mode == 2:
                i = rnd.randrange(len(b))
                b = (b[:i] + bytes(rnd.randrange(256) for _ in
                                   range(rnd.randrange(1, 40))) + b[i:])
            else:
                i = rnd.randrange(len(b))
                j = min(len(b), i + rnd.randrange(1, 60))
                b = b[:i] + b[i:j] + b[i:]
            dec(bytes(b))  # decode-or-None; a raise fails the test


def test_containers_first_chunk_wins():
    """ADVICE r13: a crafted duplicate fmt/data (or IHDR) chunk must not
    silently replace the first one — last-wins would let the perceptual
    gate fingerprint a different payload than decoders that honor the
    first chunk (dedup-gate confusion on untrusted crawl input)."""
    import zlib

    from ocr_vector_db_spark.sources.containers import _png_chunk

    pcm_a = b"\x01\x00\x02\x00\x03\x00\x04\x00"
    pcm_b = b"\x09\x00\x08\x00"
    wav = encode_wav(pcm_a, 16000, 1)
    body = wav[12:]
    # append a second data chunk with different payload: first wins
    dup = body + b"data" + struct.pack("<I", len(pcm_b)) + pcm_b
    crafted = b"RIFF" + struct.pack("<I", 4 + len(dup)) + b"WAVE" + dup
    assert decode_wav(crafted)["pcm"] == pcm_a

    # a second fmt chunk claiming a different rate: first wins
    fmt2 = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    dup2 = body + b"fmt " + struct.pack("<I", len(fmt2)) + fmt2
    crafted2 = b"RIFF" + struct.pack("<I", 4 + len(dup2)) + b"WAVE" + dup2
    got = decode_wav(crafted2)
    assert (got["pcm"], got["sample_rate"]) == (pcm_a, 16000)

    # PNG: duplicate IHDR declaring different geometry — first wins
    raw = bytes(range(60))
    png = encode_png(raw, 10, 6, 1)
    ihdr2 = _png_chunk(b"IHDR", struct.pack(">IIBBBBB", 6, 10, 8, 0, 0,
                                            0, 0))
    # splice the second IHDR right after the first (before IDAT)
    first_end = 8 + 12 + 13
    crafted3 = png[:first_end] + ihdr2 + png[first_end:]
    assert decode_png(crafted3) == {
        "raw": raw, "width": 10, "height": 6, "channels": 1}


def test_wav_chunk_walk_edge_cases():
    rnd = random.Random(7)
    pcm = bytes(rnd.randrange(256) for _ in range(2 * 501))  # odd count
    wav = encode_wav(pcm, 16000, 1)
    want = {"pcm": pcm, "sample_rate": 16000, "channels": 1}
    assert decode_wav(wav) == want

    # a LIST metadata chunk before fmt must be skipped (word-aligned)
    body = wav[12:]
    lst = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"
    wav2 = (b"RIFF" + struct.pack("<I", 4 + len(lst) + len(body))
            + b"WAVE" + lst + body)
    assert decode_wav(wav2) == want

    # WAVE_FORMAT_EXTENSIBLE with a PCM sub-format decodes
    base = struct.pack("<HHIIHH", 0xFFFE, 2, 8000, 8000 * 4, 4, 16)
    ext = base + struct.pack("<HHI", 22, 16, 0) + struct.pack("<H", 1) \
        + bytes(14)
    chunks = (b"WAVE" + b"fmt " + struct.pack("<I", len(ext)) + ext
              + b"data" + struct.pack("<I", 12) + bytes(12))
    got = decode_wav(b"RIFF" + struct.pack("<I", len(chunks)) + chunks)
    assert got == {"pcm": bytes(12), "sample_rate": 8000, "channels": 2}

    # ragged data tail (not a whole frame) truncates to whole frames
    chunks = (b"WAVE" + wav[12:12 + 24]  # fmt chunk of the mono file
              + b"data" + struct.pack("<I", 5) + b"\x01\x02\x03\x04\x05"
              + b"\x00")
    got = decode_wav(b"RIFF" + struct.pack("<I", len(chunks)) + chunks)
    assert got["pcm"] == b"\x01\x02\x03\x04"

    # rejections: wrong form type, truncation, actual codecs
    assert decode_wav(b"RIFF" + struct.pack("<I", 4) + b"AVI ") is None
    assert decode_wav(wav[:20]) is None
    mu = bytearray(wav)
    mu[20] = 7  # audio_format = mu-law
    assert decode_wav(bytes(mu)) is None
    odd = bytearray(wav)
    odd[34] = 12  # nonstandard bit depth
    assert decode_wav(bytes(odd)) is None


def test_wav_bit_depth_reductions():
    """8/24/32-bit integer and 32-bit float PCM reduce to s16le with
    exact high-bits / scale-and-clip semantics — the standard
    reductions, pure structure like the rest of the chunk walk."""

    def wav_of(fmt_code, bits, payload, rate=16000, ch=1):
        bw = bits // 8
        fmt = struct.pack("<HHIIHH", fmt_code, ch, rate,
                          rate * bw * ch, bw * ch, bits)
        chunks = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
                  + b"data" + struct.pack("<I", len(payload)) + payload
                  + (b"\x00" if len(payload) & 1 else b""))
        return b"RIFF" + struct.pack("<I", len(chunks)) + chunks

    # 24-bit: high 16 bits survive, low byte drops
    samples = [0x123456, -0x123456, 0x7FFFFF, -0x800000, 0x000080]
    p24 = b"".join(v.to_bytes(3, "little", signed=True) for v in samples)
    got = decode_wav(wav_of(1, 24, p24))
    want = [v >> 8 for v in samples]
    assert got["pcm"] == b"".join(
        v.to_bytes(2, "little", signed=True) for v in want)

    # 32-bit int: same reduction
    p32 = b"".join((v << 8).to_bytes(4, "little", signed=True)
                   for v in samples)
    assert decode_wav(wav_of(1, 32, p32))["pcm"] == got["pcm"]

    # 8-bit unsigned: (v - 128) << 8
    p8 = bytes([0, 128, 255, 200])
    assert decode_wav(wav_of(1, 8, p8))["pcm"] == b"".join(
        ((v - 128) << 8).to_bytes(2, "little", signed=True) for v in p8)

    # float32: scale to ±32767, out-of-range clips
    vals = [0.0, 0.5, -0.5, 1.0, -1.0, 1.7, -1.7]
    pf = struct.pack("<7f", *vals)
    wantf = [0, 16384, -16384, 32767, -32767, 32767, -32768]
    assert decode_wav(wav_of(3, 32, pf))["pcm"] == b"".join(
        v.to_bytes(2, "little", signed=True) for v in wantf)

    # ragged 24-bit tail drops a partial frame
    assert decode_wav(wav_of(1, 24, p24 + b"\x01\x02"))["pcm"] == \
        got["pcm"]

    # a 24-bit WAV re-encode of a 16-bit clip reduces back EXACTLY
    pcm16 = bytes(range(256)) * 2
    up24 = b"".join(b"\x00" + pcm16[i:i + 2]
                    for i in range(0, len(pcm16), 2))
    assert decode_wav(wav_of(1, 24, up24))["pcm"] == pcm16

    # G.711 µ-law (format 7) / A-law (format 6): table expansions with
    # the published anchor values, sign symmetry and per-sign
    # monotonicity — companding is a curve, not an entropy codec
    import struct as _st

    def g711(fmt_code, payload):
        got = decode_wav(wav_of(fmt_code, 8, payload))
        return [v[0] for v in _st.iter_unpack("<h", got["pcm"])]

    assert g711(7, bytes([0xFF, 0x7F, 0x00, 0x80])) == \
        [0, 0, -32124, 32124]
    assert g711(6, bytes([0x55, 0xD5, 0x2A, 0xAA])) == \
        [-8, 8, -32256, 32256]
    for fmt_code in (6, 7):
        vals = g711(fmt_code, bytes(range(256)))
        for b in range(256):  # flipping the coded sign bit negates
            assert vals[b] == -vals[b ^ 0x80]
        # within one sign, the coded magnitude ramp is monotone
        neg = sorted(v for v in vals if v < 0)
        pos = sorted(v for v in vals if v > 0)
        assert len(set(neg)) == len(neg) and len(set(pos)) == len(pos)

    # µ-law with 16-bit depth claimed is malformed → None
    assert decode_wav(wav_of(7, 16, bytes(8))) is None


def _ref_ima_decode(data, channels, block_align):
    """Independent per-sample scalar IMA decoder (straight from the
    published reference algorithm) — pins the numpy block-wavefront."""
    from ocr_vector_db_spark.sources.adpcm import IMA_INDEX, IMA_STEPS

    out = []
    bpc = (block_align - 4 * channels) // channels
    for b0 in range(0, len(data) - block_align + 1, block_align):
        blk = data[b0:b0 + block_align]
        preds, idxs, nibs = [], [], []
        for c in range(channels):
            preds.append(struct.unpack_from("<h", blk, 4 * c)[0])
            idxs.append(min(88, blk[4 * c + 2]))
        payload = blk[4 * channels:]
        for c in range(channels):
            if channels == 1:
                chb = payload
            else:
                chb = b"".join(
                    payload[g + 4 * c:g + 4 * c + 4]
                    for g in range(0, len(payload), 4 * channels))
            ns = []
            for byte in chb:
                ns += [byte & 0x0F, byte >> 4]
            nibs.append(ns)
        samples = [[preds[c]] for c in range(channels)]
        for c in range(channels):
            pred, idx = preds[c], idxs[c]
            for n in nibs[c]:
                step = IMA_STEPS[idx]
                diff = step >> 3
                if n & 4:
                    diff += step
                if n & 2:
                    diff += step >> 1
                if n & 1:
                    diff += step >> 2
                pred = max(-32768, min(32767,
                                       pred - diff if n & 8
                                       else pred + diff))
                idx = max(0, min(88, idx + IMA_INDEX[n & 7]))
                samples[c].append(pred)
        for s in range(bpc * 2 + 1):
            for c in range(channels):
                out.append(samples[c][s])
    return b"".join(v.to_bytes(2, "little", signed=True) for v in out)


def test_adpcm_ima_matches_scalar_reference():
    """The numpy wavefront decode must equal a scalar per-sample
    reference on arbitrary payload bytes (not just our encoder's
    output), mono and stereo."""
    import numpy as np

    from ocr_vector_db_spark.sources.adpcm import decode_ima

    rng = np.random.default_rng(5)
    for channels, block_align in [(1, 256), (2, 136), (1, 12)]:
        data = bytes(rng.integers(0, 256,
                                  block_align * 3).astype(np.uint8))
        # clamp header index bytes into range like real encoders do
        data = bytearray(data)
        for b0 in range(0, len(data), block_align):
            for c in range(channels):
                data[b0 + 4 * c + 2] %= 89
        data = bytes(data)
        assert decode_ima(data, channels, block_align) == \
            _ref_ima_decode(data, channels, block_align), \
            (channels, block_align)


def test_adpcm_round_trips_through_decode_wav():
    """encode_wav_adpcm → decode_wav recovers the take within codec
    SNR for both codecs, mono and stereo, including the short final
    block; geometry lies return None instead of mis-decoding."""
    import numpy as np

    from ocr_vector_db_spark.sources.adpcm import encode_wav_adpcm

    t = np.arange(13337)  # NOT a block multiple: ragged final block
    base = np.clip(6000 * np.sin(t / 23) + 3000 * np.sin(t / 7.3),
                   -32768, 32767).astype("<i2")
    for channels in (1, 2):
        pcm = (np.repeat(base, channels).astype("<i2").tobytes()
               if channels == 2 else base.tobytes())
        ref = np.frombuffer(pcm, "<i2").astype(float)
        for codec in ("ima", "ms"):
            wav = encode_wav_adpcm(pcm, 16000, channels, codec)
            got = decode_wav(wav)
            assert got["channels"] == channels
            assert got["sample_rate"] == 16000
            out = np.frombuffer(got["pcm"], "<i2").astype(float)
            m = min(len(out), len(ref))
            # length matches to within the final byte/group padding
            assert abs(len(out) - len(ref)) <= 16 * channels
            err = out[:m] - ref[:m]
            snr = 10 * np.log10(np.mean(ref[:m] ** 2)
                                / max(1e-9, np.mean(err ** 2)))
            assert snr > 25.0, (codec, channels, snr)
            assert len(wav) < len(pcm) // 3  # ~4:1 coding

    # geometry rejections: block_align not covering the header, a
    # crafted giant block_align, stereo payload off the 4-byte grid
    from ocr_vector_db_spark.sources.adpcm import decode_ima, decode_ms

    assert decode_ima(bytes(64), 1, 4) is None
    assert decode_ima(bytes(64), 1, 2 << 20) is None
    assert decode_ima(bytes(64), 2, 14) is None  # (14-8)%8 != 0
    assert decode_ms(bytes(64), 1, 7) is None
    assert decode_ms(bytes(64), 1, 2 << 20) is None

    # an ADPCM fmt with the wrong bit depth is malformed → None
    wav = encode_wav_adpcm(base.tobytes(), 16000, 1, "ima")
    i = wav.index(b"fmt ")
    bad = bytearray(wav)
    struct.pack_into("<H", bad, i + 8 + 14, 16)  # wBitsPerSample
    assert decode_wav(bytes(bad)) is None


def test_adpcm_ms_truncating_predictor():
    """MS ADPCM's predictor is spec'd as /256 with C truncation toward
    zero; floor division would round negative predictors down one —
    pin a block whose running predictor goes negative."""
    import numpy as np

    from ocr_vector_db_spark.sources.adpcm import (
        MS_ADAPT,
        MS_COEFS,
        decode_ms,
    )

    # hand-build one mono block: predictor idx 1 (coef 512,-256) so the
    # prediction mixes both history samples; seeds straddle zero
    block = bytes([1]) + struct.pack("<hhh", 64, -300, 500)
    payload = bytes([0x7F, 0x18, 0xE3])
    data = block + payload
    got = np.frombuffer(decode_ms(data, 1, len(data)), "<i2").tolist()
    # scalar reference with explicit trunc-toward-zero
    c1, c2 = MS_COEFS[1]
    delta, s1, s2 = 64, -300, 500
    want = [500, -300]
    for n in [7, 0xF, 1, 8, 0xE, 3]:
        sn = n - 16 if n >= 8 else n
        p = s1 * c1 + s2 * c2
        p = -((-p) // 256) if p < 0 else p // 256
        cur = max(-32768, min(32767, p + sn * delta))
        s2, s1 = s1, cur
        delta = max(16, (MS_ADAPT[n] * delta) >> 8)
        want.append(cur)
    assert got == want


def test_normalize_assets_decodes_and_passes_through(spark):
    """Container rows decode to raw twins with identical perceptual
    signatures (the q156 contract); undecodable rows pass through
    byte-identical with untouched metadata."""
    from ocr_vector_db_spark.operators.audio_fingerprint import (
        asset_pcm_frames,
        audio_fingerprints,
    )
    from ocr_vector_db_spark.operators.image_hash import (
        asset_gray_frames,
        dhash_signatures,
    )

    rnd = random.Random(11)
    pcm = b"".join(
        (rnd.randrange(-2000, 2000) * ((i % 40) - 20) // 20)
        .to_bytes(2, "little", signed=True)
        for i in range(8000)
    )
    img = bytes(((x * 7 + y * 13) % 251)
                for y in range(40) for x in range(72))
    rows = [
        ("clip_raw", "audio", pcm,
         {"format": "pcm_s16le", "channels": "1", "sample_rate": "16000"}),
        ("clip_wav", "unknown", encode_wav(pcm, 16000, 1), {"x": "y"}),
        ("img_raw", "image", img,
         {"format": "raw", "channels": "1", "width": "72",
          "height": "40"}),
        ("img_png", "unknown", encode_png(img, 72, 40, 1, filter_type=3),
         {}),
        ("mp3", "audio", b"ID3fake", {"format": "mp3"}),
        ("bad_png", "unknown", PNG_MAGIC + b"nope", {"k": "v"}),
    ]
    adf = spark.createDataFrame(
        rows,
        "asset_id string, kind string, data binary, "
        "metadata map<string,string>",
    )
    norm = normalize_assets(adf)

    afp = {r.id: r.afp for r in
           audio_fingerprints(asset_pcm_frames(norm)).collect()}
    assert afp["clip_raw"] == afp["clip_wav"]
    dh = {r.id: r.dhash for r in
          dhash_signatures(asset_gray_frames(norm)).collect()}
    assert dh["img_raw"] == dh["img_png"]

    by_id = {r.asset_id: r for r in norm.collect()}
    assert bytes(by_id["clip_wav"].data) == pcm
    assert by_id["clip_wav"].kind == "audio"
    assert by_id["clip_wav"].metadata["container"] == "wav"
    assert by_id["clip_wav"].metadata["x"] == "y"  # original keys kept
    assert bytes(by_id["img_png"].data) == img
    assert by_id["img_png"].metadata["container"] == "png"
    for aid, _, data, meta in rows:
        if aid in ("mp3", "bad_png"):
            assert bytes(by_id[aid].data) == data, aid
            assert dict(by_id[aid].metadata) == meta, aid


def test_normalize_slim_row_shapes(spark):
    """The slim-row normalizers the CLI streaming gates wire in:
    `normalize_clip_rows` swaps WAV payloads for raw PCM, downmixing
    multichannel to mono (non-WAV rows untouched);
    `normalize_frame_rows` decodes PNG and OVERWRITES the row's
    declared dims from IHDR (container dims are untrusted), keeping RGB
    only when a channels column can carry it."""
    from ocr_vector_db_spark.operators.audio_fingerprint import (
        downmix_pcm16_bytes,
    )

    pcm = bytes(range(256)) * 4
    spread = b"".join(pcm[i:i + 2] * 2 for i in range(0, len(pcm), 2))
    rows = [
        ("wav", encode_wav(pcm, 16000, 1)),
        ("wav_stereo", encode_wav(pcm, 16000, 2)),
        ("wav_spread", encode_wav(spread, 16000, 2)),
        ("raw", pcm),
    ]
    adf = spark.createDataFrame(rows, "asset_id string, data binary")
    got = {r.asset_id: bytes(r.data)
           for r in normalize_clip_rows(adf).collect()}
    assert got["wav"] == pcm
    # stereo downmixes to mono at the gate (verdict r13 #7): an L==R
    # spread recovers the mono bytes exactly, arbitrary stereo goes
    # through the exact integer average
    assert got["wav_stereo"] == downmix_pcm16_bytes(pcm, 2)
    assert got["wav_spread"] == pcm
    assert got["raw"] == pcm

    img = bytes((x * 3 + y * 11) % 251 for y in range(12) for x in range(10))
    rgb = bytes(v for p in img for v in (p, p, p))
    frows = [
        ("png", encode_png(img, 10, 12, 1), 999, 999),   # dims lie
        ("png_rgb", encode_png(rgb, 10, 12, 3), 10, 12),
        ("raw", img, 10, 12),
        ("bad", PNG_MAGIC + b"zz", 4, 4),
    ]
    fdf = spark.createDataFrame(
        frows, "asset_id string, data binary, width int, height int")
    got = {r.asset_id: r for r in normalize_frame_rows(fdf).collect()}
    assert bytes(got["png"].data) == img
    assert (got["png"].width, got["png"].height) == (10, 12)  # IHDR wins
    # gray-only shape: an RGB decode would be mis-read as gray — skip
    assert bytes(got["png_rgb"].data) == frows[1][1]
    assert bytes(got["bad"].data) == frows[3][1]

    cdf = spark.createDataFrame(
        [(a, d, w, h, 1) for a, d, w, h in frows],
        "asset_id string, data binary, width int, height int, "
        "channels int")
    got = {r.asset_id: r for r in normalize_frame_rows(cdf).collect()}
    assert bytes(got["png_rgb"].data) == rgb     # channels column: keep
    assert got["png_rgb"].channels == 3
    assert got["png"].channels == 1


def test_stream_gate_dedups_wav_container(spark, tmp_path):
    """End-to-end through the streaming audio gate with the CLI's
    normalize_clip_rows wiring: a WAV-encoded 2x-gain re-encode of an
    INDEXED raw clip is dropped perceptually (Hamming 0 via the gain
    invariance) — before this seam it fell to the unhashable exact-hash
    path and was wrongly accepted."""
    import shutil

    from ocr_vector_db_spark.operators.audio_fingerprint import (
        AudioFpIndex,
    )
    from ocr_vector_db_spark.streaming.assets import (
        exact_clip_key,
        hashable_clips_pred,
        stream_ingest_asset_dedup,
    )
    from ocr_vector_db_spark.streaming.pipeline import ParquetAcceptedSink

    base = [((i % 50) - 25) * ((i // 997) % 30 + 5)
            for i in range(20000)]
    pcm = b"".join(int(v).to_bytes(2, "little", signed=True)
                   for v in base)
    loud = b"".join(int(v * 2).to_bytes(2, "little", signed=True)
                    for v in base)
    clips = spark.createDataFrame(
        [("orig", pcm)], "asset_id string, data binary")
    idx = AudioFpIndex.build(spark, clips, str(tmp_path / "afp_wav"),
                             r=6, n_buckets=8)

    stage = tmp_path / "wav_stage"
    spark.createDataFrame(
        [("re_encode_wav", encode_wav(loud, 16000, 1)),
         ("novel", bytes(2 * 20000))],
        "asset_id string, data binary",
    ).coalesce(1).write.mode("overwrite").parquet(str(stage))
    src = tmp_path / "wav_src"
    src.mkdir()
    shutil.copy(next(stage.glob("part-*.parquet")), src / "b0.parquet")

    stats: list = []
    sink = ParquetAcceptedSink(str(tmp_path / "wav_acc"))
    q = stream_ingest_asset_dedup(
        normalize_clip_rows(
            spark.readStream.schema("asset_id string, data binary")
            .parquet(str(src))
        ),
        idx, sink, stats=stats, checkpoint=str(tmp_path / "wav_ckpt"),
        hashable_pred=hashable_clips_pred, exact_key=exact_clip_key,
    )
    q.awaitTermination(60)
    assert stats[-1]["accepted"] == 1
    assert stats[-1]["dropped_as_dup"] == 1   # the WAV re-encode
    assert [r.asset_id for r in sink.read(spark).collect()] == ["novel"]
