"""Baseline (SOF0) + progressive (SOF2) JPEG codec for the
multimodal container stack.

JPEG is *the* image format of a 100 TB crawl; until round 14 a JPEG
re-encode of an indexed raster fell through to the exact-byte-hash path
and never deduped perceptually (`sources/pdf_decode.py` stops at a
DCTDecode passthrough). This module decodes baseline sequential JPEG —
huffman entropy coding, any DQT/DHT the file carries, 8-bit precision,
grayscale and 3-component YCbCr with sampling factors up to 2×2
(4:4:4 / 4:2:2 / 4:2:0 / 4:4:0), restart intervals — to the raw
gray/RGB shapes `asset_gray_frames` / `asset_raw_frames` consume.
Round 15 adds progressive JPEG (SOF2, ~10% of crawl JPEGs): spectral
selection AND successive approximation, all four scan kinds of
T.81 Annex G.2 — DC first/refine, AC first/refine with EOB-run
coding — folded scan-by-scan into the same coefficient planes, so a
progressive re-encode of an indexed raster now dedups perceptually
instead of falling to the exact-hash path. Everything else
(arithmetic coding, 12-bit, CMYK, lossless/hierarchical SOFs,
sampling factors > 2) returns None so the row passes through
byte-identical to the exact-hash fallback, exactly like the other
containers.

JPEG is LOSSY: unlike the WAV/PNG round-trips (q156), the contract is
NEAR-duplication — a JPEG re-encode of a raw raster lands within a
small Hamming radius of its twin's perceptual hash (q157), not at
hash identity.

Implementation notes:
- The IDCT/FDCT are numpy-batched over ALL blocks of a component at
  once (one einsum against the 8-point orthonormal DCT-II matrix) —
  per-byte Python there would be untenably slow (see the PNG filter
  numbers in SCALING.md).
- Huffman decode uses a 2^16-entry (symbol, length) lookup per table:
  one peek + one skip per symbol, never bit-by-bit tree walking.
- The encoder exists so fixtures and exports are self-contained
  (same reason as encode_wav/encode_png): Annex-K quantization tables
  scaled by the libjpeg quality curve, the standard DC/AC huffman
  tables written into DHT segments (the decoder always reads tables
  from the file, so encoder/decoder stay consistent by construction),
  gray and every standard chroma subsampling. `encode_jpeg_progressive`
  writes the libjpeg standard scan script with per-scan OPTIMAL
  huffman tables (T.81 Annex K.2) — the Annex K.3 baseline tables
  carry no EOBn>0 symbols, so progressive AC scans cannot use them
  (the same reason libjpeg forces optimized tables for progressive).
- Same decompression-posture as decode_png: declared geometry is
  capped (MAX_PIXELS) before any plane is allocated, and every
  entropy-stream lie (bad prefix, coefficient overrun, truncation)
  rejects to None rather than raising.

Scale shape: per-asset decode with zero cross-row state — wired into
`containers.normalize_assets` / `normalize_frame_rows`, the same
Arrow-batched mapInPandas grain as the PDF decrypt. Reference parity:
none — the reference ingests PDF/text/markdown only (its rasters go to
an external OCR service, reference ingestion/parsers/); this is the
multimodal brief's decode step for the dominant crawl image format.
"""

from __future__ import annotations

import struct

JPEG_MAGIC = b"\xff\xd8\xff"
MAX_PIXELS = 64 * 1024 * 1024  # reject > 64 MP before allocating planes

# ---------------------------------------------------------------- tables

# ITU-T T.81 Annex K.1 example quantization tables (the de-facto
# standard base tables every libjpeg-family encoder scales by quality).
QUANT_LUMA = [
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
]
QUANT_CHROMA = [
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
]

# Annex K.3 typical huffman tables: (BITS[1..16], HUFFVAL). The decoder
# never assumes these — it reads DHT from the file — so a file with
# optimized tables decodes identically; the encoder writes THESE tables
# into its DHT segments, keeping the pair self-consistent and the
# output readable by any baseline decoder.
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))
AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]
AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119]
AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
    0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
    0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
    0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
    0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]


def _zigzag_order() -> list[int]:
    """Indices into a row-major 8×8 block in zigzag scan order,
    generated from the diagonal walk instead of hardcoded."""
    out = []
    for s in range(15):
        ys = range(max(0, s - 7), min(s, 7) + 1)
        diag = [(y, s - y) for y in ys]
        if s % 2 == 0:
            diag.reverse()  # even diagonals walk up-right
        out.extend(y * 8 + x for y, x in diag)
    return out


ZIGZAG = _zigzag_order()


def _dct_matrix():
    """8-point orthonormal DCT-II matrix M: forward D = M B Mᵀ,
    inverse B = Mᵀ D M."""
    import math

    import numpy as np

    m = np.empty((8, 8), np.float64)
    for k in range(8):
        s = math.sqrt(0.125) if k == 0 else 0.5
        for n in range(8):
            m[k, n] = s * math.cos(math.pi * (2 * n + 1) * k / 16.0)
    return m


class _JpegError(Exception):
    """Internal: malformed/unsupported stream → decode_jpeg returns None."""


# ---------------------------------------------------------------- decode


def _build_decode_lut(bits: list[int], vals: list[int]) -> list:
    """Canonical huffman → 2^16-entry (symbol, code_length) lookup:
    decode is one 16-bit peek + one skip, never a bit-at-a-time walk."""
    lut = [(None, 0)] * 65536
    code = 0
    vi = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            if vi >= len(vals) or code >= (1 << length):
                raise _JpegError("overfull huffman table")
            lo = code << (16 - length)
            hi = lo + (1 << (16 - length))
            lut[lo:hi] = [(vals[vi], length)] * (hi - lo)
            vi += 1
            code += 1
        code <<= 1
    if vi != len(vals):
        raise _JpegError("huffman table count mismatch")
    return lut


def _build_multi_dc(base: list) -> list:
    """16-bit window → (consumed_bits, dc_diff) when the DC code AND its
    difference bits both fit inside the window — one lookup replaces the
    code lookup + separate bit extraction. None falls back to the
    one-symbol path (codes longer than the window allows, or value bits
    spilling past it)."""
    out = [None] * 65536
    for w in range(65536):
        sym, ln = base[w]
        if sym is None:
            continue
        if sym == 0:
            out[w] = (ln, 0)
            continue
        if ln + sym > 16:
            continue
        v0 = (w >> (16 - ln - sym)) & ((1 << sym) - 1)
        out[w] = (ln + sym,
                  v0 if v0 >= (1 << (sym - 1)) else v0 - (1 << sym) + 1)
    return out


# coefficient packing for the decode loop's one-append-per-coefficient
# scatter: packed = (flat_zigzag_index << _PACK_SH) + value + _PACK_BIAS.
# Values are bounded by |v| < 2^15 (size categories <= 15), indexes by
# MAX_PIXELS (2^26) * 64/64, so the pack fits comfortably in int64.
_PACK_SH = 17
_PACK_BIAS = 1 << 16

# low-bit masks indexed by bit count: `acc &= _MASKS[nbits]` replaces a
# fresh (1 << nbits) - 1 big-int construction on every consume
_MASKS = [(1 << i) - 1 for i in range(72)]


def _build_multi_ac(base: list) -> list:
    """16-bit window → (consumed_bits, packed_ops, k_advance, ended,
    guard_span): as many COMPLETE (run/size + value bits) AC items as fit
    in the window, with a terminating EOB folded in (`ended`) — the
    libjpeg-turbo multi-symbol idea in LUT form (optimization r16,
    VERDICT r15 #4). Typical q85 content packs 2-3 items + the EOB per
    window, so the per-item Python dispatch cost is paid once per 2-4
    coefficients instead of once each.

    `packed_ops` are ((rel_k << _PACK_SH) + value + _PACK_BIAS, ...) with
    rel_k relative to the k at lookup time — the decode loop emits each
    coefficient as ONE list append of base+op (the zigzag-order scatter
    in _decode_scan). `k_advance` is the total k movement.

    Exactness: values are decoded at build time from the same window
    bits the sequential path would read; a ZRL is only emitted as a LONE
    entry (folding items past a ZRL could consume bits the sequential
    loop's `while k < 64` re-check would never read); `guard_span` makes
    the single runtime check `k + guard_span <= 64` reject any entry
    that could cross the k==64 boundary mid-entry — in particular a
    folded EOB needs k to land STRICTLY below 64, because a block whose
    ops fill it exactly codes NO EOB and the folded bits would be the
    next block's DC — every rejected window falls back to the bit-exact
    single-symbol path. Windows with no complete item hold a sentinel
    whose guards always fail (consumed=99 > max nbits), so the hot loop
    skips a None test on every hit."""
    out = [(99, (), 0, False, 99)] * 65536
    for w in range(65536):
        off = 0
        ops = []
        rel = 0
        ended = False
        while True:
            sym, ln = base[(w << off) & 0xFFFF]
            if sym is None or off + ln > 16:
                break
            s = sym & 15
            if s == 0:
                if sym == 0xF0:  # ZRL: only as a lone entry
                    if not ops:
                        out[w] = (ln, (), 16, False, 16)
                    break
                off += ln  # EOB folds into the entry
                ended = True
                break
            if off + ln + s > 16:
                break
            v0 = (w >> (16 - off - ln - s)) & ((1 << s) - 1)
            rel += sym >> 4
            ops.append((rel << _PACK_SH) + _PACK_BIAS
                       + (v0 if v0 >= (1 << (s - 1))
                          else v0 - (1 << s) + 1))
            rel += 1
            off += ln + s
        if off and out[w][0] == 99:
            out[w] = (off, tuple(ops), rel, ended,
                      rel + (1 if ended else 0))
    return out


def _build_partial_ac(base: list) -> list:
    """16-bit window → (code_len, run, size) for every window whose AC
    code resolves but whose VALUE bits spill past the window (the common
    case on high-entropy content, where _build_multi_ac yields None) —
    the runtime skips the second base-LUT lookup and the run/size/EOB/ZRL
    branch chain and goes straight to the value extraction. None only for
    unresolvable prefixes (garbage / stream tail)."""
    out = [None] * 65536
    for w in range(65536):
        sym, ln = base[w]
        if sym is None:
            continue
        out[w] = (ln, sym >> 4, sym & 15)
    return out


def _decode_luts(kind: int, bits: bytes, vals: bytes):
    """(base, multi, partial) decode tables for one DHT definition,
    memoized by table CONTENT: crawl JPEGs overwhelmingly share the
    Annex-K standard tables, so the 2^16-entry expansions build once per
    (reused) worker process, not once per image. `partial` is None for
    DC tables (kind 0)."""
    key = (kind, bits, vals)
    hit = _LUT_MEMO.get(key)
    if hit is not None:
        return hit
    base = _build_decode_lut(list(bits), list(vals))
    if kind == 0:
        multi, partial = _build_multi_dc(base), None
    else:
        multi, partial = _build_multi_ac(base), _build_partial_ac(base)
    if len(_LUT_MEMO) > 64:  # bound worker memory on adversarial corpora
        _LUT_MEMO.clear()
    _LUT_MEMO[key] = (base, multi, partial)
    return _LUT_MEMO[key]


_LUT_MEMO: dict = {}


def _split_entropy(data: bytes, start: int) -> tuple[list[bytes], int]:
    """Unstuff (FF 00 → FF) the entropy-coded bytes from `start`,
    splitting at RSTn markers → (segments, offset past the scan).
    Skips between 0xFF sightings with bytes.find + slice copies (C
    speed) instead of a per-byte Python loop — measured ~12% of a
    512×512 decode before (optimization r16); behavior is byte-for-byte
    the old walk's."""
    segs = []
    cur = bytearray()
    i = start
    n = len(data)
    while i < n:
        j = data.find(b"\xff", i)
        if j < 0:
            cur += data[i:]
            i = n
            break
        cur += data[i:j]
        if j + 1 >= n:
            i = j
            break
        m = data[j + 1]
        if m == 0x00:
            cur.append(0xFF)
            i = j + 2
        elif 0xD0 <= m <= 0xD7:  # RSTn: segment boundary
            segs.append(bytes(cur))
            cur = bytearray()
            i = j + 2
        else:  # a real marker ends the scan
            i = j
            break
    segs.append(bytes(cur))
    return segs, i


def decode_jpeg(data: bytes) -> dict | None:
    """Baseline or progressive JPEG → {'raw': bytes, 'width',
    'height', 'channels'} (gray → 1, YCbCr → RGB 3); None for anything
    this module does not own (arithmetic/12-bit/CMYK/lossless/sampling
    > 2×2, malformed or truncated streams, geometry past MAX_PIXELS)."""
    import numpy as np

    if not data.startswith(JPEG_MAGIC):
        return None
    try:
        qt: dict[int, list[int]] = {}
        huff: dict[tuple[int, int], list] = {}  # (class, id) → LUT
        sof = None
        restart = 0
        progressive = False
        geom = None  # (hmax, vmax, mcux, mcuy) once coef planes exist
        nscans = 0
        i = 2
        n = len(data)
        while i + 2 <= n:
            if data[i] != 0xFF:
                raise _JpegError("marker desync")
            marker = data[i + 1]
            if marker == 0xFF:  # fill bytes before a marker
                i += 1
                continue
            if marker == 0xD8 or 0xD0 <= marker <= 0xD7:
                i += 2
                continue
            if marker == 0xD9:  # EOI: progressive renders what it has
                break
            if i + 4 > n:
                break  # truncated between segments
            (seglen,) = struct.unpack_from(">H", data, i + 2)
            if seglen < 2 or i + 2 + seglen > n:
                raise _JpegError("truncated segment")
            body = data[i + 4:i + 2 + seglen]
            if marker == 0xDB:  # DQT
                o = 0
                while o < len(body):
                    pq, tq = body[o] >> 4, body[o] & 15
                    o += 1
                    if pq == 0:
                        tbl = list(body[o:o + 64])
                        o += 64
                    elif pq == 1:
                        tbl = [struct.unpack_from(">H", body, o + 2 * k)[0]
                               for k in range(64)]
                        o += 128
                    else:
                        raise _JpegError("bad DQT precision")
                    if len(tbl) < 64 or min(tbl) < 1:
                        raise _JpegError("short/zero DQT")
                    qt[tq] = tbl
            elif marker == 0xC4:  # DHT
                o = 0
                while o + 17 <= len(body):
                    tc, th = body[o] >> 4, body[o] & 15
                    bits = list(body[o + 1:o + 17])
                    cnt = sum(bits)
                    vals = list(body[o + 17:o + 17 + cnt])
                    if len(vals) < cnt or tc > 1:
                        raise _JpegError("bad DHT")
                    huff[(tc, th)] = _decode_luts(
                        tc, bytes(bits), bytes(vals)
                    )
                    o += 17 + cnt
            elif marker in (0xC0, 0xC2):  # SOF0 baseline / SOF2 progr.
                prec, h, w, nc = struct.unpack_from(">BHHB", body, 0)
                if prec != 8 or nc not in (1, 3):
                    return None  # 12-bit / CMYK: honest passthrough
                if w < 1 or h < 1 or w * h > MAX_PIXELS:
                    return None
                comps = []
                for c in range(nc):
                    cid, hv, tq = struct.unpack_from(">BBB", body,
                                                     6 + 3 * c)
                    ch, cv = hv >> 4, hv & 15
                    if not (1 <= ch <= 2 and 1 <= cv <= 2):
                        return None  # sampling > 2×2: passthrough
                    comps.append({"id": cid, "h": ch, "v": cv, "tq": tq})
                sof = (w, h, comps)
                progressive = marker == 0xC2
            elif marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9,
                            0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
                return None  # arithmetic/lossless/hierarchical SOFs
            elif marker == 0xDD:  # DRI
                (restart,) = struct.unpack_from(">H", body, 0)
            elif marker == 0xDA:  # SOS
                if sof is None:
                    raise _JpegError("SOS before SOF")
                ns = body[0]
                w, h, comps = sof
                if not progressive:
                    if ns != len(comps):
                        return None  # multi-scan baseline: out of scope
                    tabmap = {}
                    for s in range(ns):
                        cs, tt = body[1 + 2 * s], body[2 + 2 * s]
                        tabmap[cs] = (tt >> 4, tt & 15)
                    for c in comps:
                        if c["id"] not in tabmap or c["tq"] not in qt:
                            raise _JpegError("missing tables")
                        td, ta = tabmap[c["id"]]
                        if (0, td) not in huff or (1, ta) not in huff:
                            raise _JpegError("missing huffman table")
                        c["dc"], c["dc2"], _ = huff[(0, td)]
                        c["ac"], c["ac2"], c["ac3"] = huff[(1, ta)]
                        c["q"] = qt[c["tq"]]
                    segs, _ = _split_entropy(data, i + 2 + seglen)
                    return _decode_scan(np, w, h, comps, segs, restart)
                # -- progressive scan: fold into the coefficient planes
                if not (1 <= ns <= len(comps)) or len(body) < 4 + 2 * ns:
                    raise _JpegError("bad SOS header")
                ss, se = body[1 + 2 * ns], body[2 + 2 * ns]
                ahal = body[3 + 2 * ns]
                ah, al = ahal >> 4, ahal & 15
                if ss == 0:
                    if se != 0:
                        raise _JpegError("bad DC band")
                elif ns != 1 or not (ss <= se <= 63):
                    raise _JpegError("bad AC band")
                if al > 13 or (ah and ah != al + 1):
                    raise _JpegError("bad successive approximation")
                if geom is None:
                    geom = _alloc_coefs(np, w, h, comps)
                byid = {c["id"]: c for c in comps}
                scomps = []
                for s in range(ns):
                    cs, tt = body[1 + 2 * s], body[2 + 2 * s]
                    if cs not in byid:
                        raise _JpegError("unknown scan component")
                    c = byid[cs]
                    # bind only the table this scan kind actually reads
                    # (a DC refinement scan is raw bits, no tables)
                    if ss == 0 and ah == 0:
                        if (0, tt >> 4) not in huff:
                            raise _JpegError("missing huffman table")
                        c["dc"] = huff[(0, tt >> 4)][0]
                    if ss > 0:
                        if (1, tt & 15) not in huff:
                            raise _JpegError("missing huffman table")
                        c["ac"] = huff[(1, tt & 15)][0]
                    scomps.append(c)
                segs, off = _split_entropy(data, i + 2 + seglen)
                _decode_progressive_scan(np, geom, scomps, segs,
                                         restart, ss, se, ah, al)
                nscans += 1
                i = off
                continue
            i += 2 + seglen
        if progressive and nscans:
            w, h, comps = sof
            for c in comps:
                if c["tq"] not in qt:
                    raise _JpegError("missing quant table")
                c["q"] = qt[c["tq"]]
            return _finish(np, w, h, comps, geom[0], geom[1])
        raise _JpegError("no SOS")
    except (_JpegError, struct.error, IndexError):
        return None


def _alloc_coefs(np, w, h, comps):
    """Per-component coefficient planes on the padded MCU grid, plus
    the TRUE block dims (tbx, tby) that non-interleaved progressive
    scans cover (T.81 A.2.2: ceil(ceil(dim·sampling/max)/8))."""
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    for c in comps:
        c["bx"] = mcux * c["h"]
        c["by"] = mcuy * c["v"]
        c["tbx"] = -(-(-(-(w * c["h"]) // hmax)) // 8)
        c["tby"] = -(-(-(-(h * c["v"]) // vmax)) // 8)
        c["coef"] = np.zeros((c["by"] * c["bx"], 64), np.int32)
        c["pred"] = 0
    return hmax, vmax, mcux, mcuy


def _decode_scan(np, w, h, comps, segs, restart) -> dict | None:
    hmax, vmax, mcux, mcuy = _alloc_coefs(np, w, h, comps)
    nmcu = mcux * mcuy

    seg_i = 0
    # the entropy loop is THE per-core decode bottleneck: the bit
    # reader is inlined as local ints (acc/nbits/pos) — method-call
    # dispatch per symbol measured ~1.7× slower at 512×512.
    # Coefficients land in per-component PYTHON lists as single packed
    # ints ((zigzag_flat_index << _PACK_SH) + value + _PACK_BIAS) and
    # scatter into the numpy planes in ONE vectorized pass per component
    # at the end: a numpy scalar store (`row[zz[k]] = v`) costs ~5× a
    # list append, and on smooth content those per-block stores dominate
    # the whole scan (optimization r16). The planes are built in ZIGZAG
    # order (position k, no per-coefficient zz[] remap) and _finish
    # un-zigzags once, vectorized, during dequantization.
    for c in comps:
        c["_pk"] = []  # packed AC/DC coefficient stores, zigzag order
        c["_di"] = []  # DC flat indexes (values can exceed the pack bias
        c["_dv"] = []  # on hostile streams, so DC stays a pair of lists)
    # 32-bit word refill: each segment's whole-word prefix unpacks ONCE
    # (C loop) so the hot path refills with a single list index + shift
    # instead of up to 6 byte iterations; the <=3 tail bytes keep the
    # byte loop. (The r15 "6-byte slice refill 12% slower" negative was
    # measured at per-SYMBOL consumption — the multi-symbol entries
    # consume enough per lookup that the word batch now wins; A/B'd.)
    data = segs[0]
    nseg = len(data)
    nw = nseg >> 2
    words = list(struct.unpack(f">{nw}I", data[:nw * 4])) if nw else []
    wi = 0
    pos = nw * 4
    acc = nbits = 0
    for m in range(nmcu):
        if restart and m and m % restart == 0:
            seg_i += 1
            if seg_i >= len(segs):
                raise _JpegError("missing restart segment")
            data = segs[seg_i]
            nseg = len(data)
            nw = nseg >> 2
            words = (list(struct.unpack(f">{nw}I", data[:nw * 4]))
                     if nw else [])
            wi = 0
            pos = nw * 4
            acc = nbits = 0
            for c in comps:
                c["pred"] = 0
        my, mx = divmod(m, mcux)
        for c in comps:
            dc_lut = c["dc"]
            dc2, ac2, ac3 = c["dc2"], c["ac2"], c["ac3"]
            cv, chh, cbx = c["v"], c["h"], c["bx"]
            pk, di, dv = c["_pk"], c["_di"], c["_dv"]
            for v in range(cv):
                for hh in range(chh):
                    if nbits < 32:
                        if wi < nw:
                            acc = (acc << 32) | words[wi]
                            wi += 1
                            nbits += 32
                        else:
                            while nbits <= 48 and pos < nseg:
                                acc = (acc << 8) | data[pos]
                                pos += 1
                                nbits += 8
                    peek = ((acc >> (nbits - 16)) & 0xFFFF
                            if nbits >= 16
                            else (acc << (16 - nbits)) & 0xFFFF)
                    # fast path: DC code + difference bits in one lookup
                    e = dc2[peek]
                    if e is not None and e[0] <= nbits:
                        nbits -= e[0]
                        c["pred"] += e[1]
                    else:
                        sym, ln = dc_lut[peek]
                        if sym is None or ln > nbits:
                            raise _JpegError("bad DC prefix")
                        nbits -= ln
                        if sym:
                            if nbits < sym:
                                raise _JpegError(
                                    "truncated entropy stream")
                            nbits -= sym
                            v0 = (acc >> nbits) & ((1 << sym) - 1)
                            diff = (v0 if v0 >= (1 << (sym - 1))
                                    else v0 - (1 << sym) + 1)
                            c["pred"] += diff
                    acc &= _MASKS[nbits]
                    b64 = ((my * cv + v) * cbx + (mx * chh + hh)) * 64
                    di.append(b64)
                    dv.append(c["pred"])
                    k = 1
                    while k < 64:
                        if nbits < 32:
                            if wi < nw:
                                acc = (acc << 32) | words[wi]
                                wi += 1
                                nbits += 32
                            else:
                                while nbits <= 48 and pos < nseg:
                                    acc = (acc << 8) | data[pos]
                                    pos += 1
                                    nbits += 8
                        peek = ((acc >> (nbits - 16)) & 0xFFFF
                                if nbits >= 16
                                else (acc << (16 - nbits)) & 0xFFFF)
                        # fast path: every complete (run/size + value)
                        # item inside the 16-bit window — usually 2-3
                        # coefficients plus the terminating EOB — in ONE
                        # dispatch, taken only when the entry provably
                        # stays inside this block (k_span guard) and the
                        # stream holds all its bits
                        consumed, ops, adv, ended, guard = ac2[peek]
                        if consumed <= nbits and k + guard <= 64:
                            nbits -= consumed
                            acc &= _MASKS[nbits]
                            bk = (b64 + k) << _PACK_SH
                            for op in ops:
                                pk.append(bk + op)
                            k += adv
                            if ended:
                                break  # folded EOB
                            continue
                        # single-item path, precomputed (code_len, run,
                        # size): no second LUT resolve, no sym bit-math
                        p = ac3[peek]
                        if p is None or p[0] > nbits:
                            raise _JpegError("bad AC prefix")
                        ln, run, s = p
                        nbits -= ln
                        acc &= _MASKS[nbits]
                        if s == 0:
                            if run == 15:  # ZRL
                                k += 16
                                continue
                            break  # EOB
                        k += run
                        if k > 63:
                            raise _JpegError("AC overrun")
                        if nbits < s:
                            raise _JpegError("truncated entropy stream")
                        nbits -= s
                        v0 = (acc >> nbits) & ((1 << s) - 1)
                        acc &= _MASKS[nbits]
                        pk.append(((b64 + k) << _PACK_SH) + _PACK_BIAS
                                  + (v0 if v0 >= (1 << (s - 1))
                                     else v0 - (1 << s) + 1))
                        k += 1

    for c in comps:
        flat = c["coef"].reshape(-1)
        pk = c.pop("_pk")
        if pk:
            arr = np.fromiter(pk, np.int64, len(pk))
            flat[arr >> _PACK_SH] = (
                arr & ((1 << _PACK_SH) - 1)) - _PACK_BIAS
        di = c.pop("_di")
        dv = c.pop("_dv")
        if di:
            flat[np.fromiter(di, np.int64, len(di))] = np.fromiter(
                dv, np.int64, len(dv)).astype(np.int32)
    return _finish(np, w, h, comps, hmax, vmax, zigzag_coefs=True)


def _finish(np, w, h, comps, hmax, vmax, zigzag_coefs=False) -> dict:
    """Dequantize + batched inverse DCT + upsample + color convert the
    accumulated coefficient planes (shared by the baseline one-shot
    scan and the progressive multi-scan fold). `zigzag_coefs`: the
    baseline scan stores planes in ZIGZAG order (coefficient k at flat
    position k — no per-coefficient remap in the entropy loop); the
    un-zigzag happens here, fused into the vectorized dequantization.
    Progressive planes stay natural-order (False)."""
    zz = ZIGZAG
    dctm = _dct_matrix()
    planes = []
    for c in comps:
        q = np.array(c["q"], np.int32)
        deq = np.empty_like(c["coef"])
        if zigzag_coefs:
            deq[:, zz] = c["coef"] * q  # both sides in zigzag sequence
        else:
            deq[:, zz] = c["coef"][:, zz] * q  # DC at zz[0]=0, AC dequant
        # one batched inverse DCT for the whole component
        blocks = deq.reshape(-1, 8, 8).astype(np.float64)
        pix = np.einsum("ij,njk,kl->nil", dctm.T, blocks, dctm)
        pix = np.clip(np.round(pix) + 128, 0, 255).astype(np.uint8)
        plane = (
            pix.reshape(c["by"], c["bx"], 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(c["by"] * 8, c["bx"] * 8)
        )
        # upsample to the luma grid (sample replication), crop to w×h
        plane = plane.repeat(vmax // c["v"], axis=0).repeat(
            hmax // c["h"], axis=1
        )[:h, :w]
        planes.append(plane)

    if len(planes) == 1:
        return {"raw": planes[0].tobytes(), "width": w, "height": h,
                "channels": 1}
    y = planes[0].astype(np.float64)
    cb = planes[1].astype(np.float64) - 128.0
    cr = planes[2].astype(np.float64) - 128.0
    rgb = np.stack(
        [y + 1.402 * cr,
         y - 0.344136 * cb - 0.714136 * cr,
         y + 1.772 * cb],
        axis=-1,
    )
    rgb = np.clip(np.round(rgb), 0, 255).astype(np.uint8)
    return {"raw": rgb.tobytes(), "width": w, "height": h, "channels": 3}


def _decode_progressive_scan(np, geom, scomps, segs, restart, ss, se,
                             ah, al) -> None:
    """One SOF2 scan folded into the components' coefficient planes
    (T.81 G.2, structured after the public libjpeg jdphuff logic):
    DC first/refine over the interleaved MCU grid (true block grid
    when non-interleaved), AC first/refine over a single component's
    true block grid with EOB-run coding and in-place correction bits.
    The bit reader is inlined as local ints per loop, like the
    baseline scan (method dispatch measured ~1.7× slower there)."""
    hmax, vmax, mcux, mcuy = geom
    zz = ZIGZAG
    interleaved = len(scomps) > 1
    nmcu = (mcux * mcuy if interleaved
            else scomps[0]["tbx"] * scomps[0]["tby"])
    if ss == 0:
        for c in scomps:
            # block indices this DC scan covers, grouped by MCU
            if interleaved:
                c["_mcu"] = [
                    [(my * c["v"] + v) * c["bx"] + (mx * c["h"] + hh)
                     for v in range(c["v"]) for hh in range(c["h"])]
                    for my in range(mcuy) for mx in range(mcux)
                ]
            else:
                c["_mcu"] = [
                    [row * c["bx"] + col]
                    for row in range(c["tby"]) for col in range(c["tbx"])
                ]
    data = segs[0]
    nseg = len(data)
    seg_i = 0
    pos = acc = nbits = 0

    if ss == 0 and ah == 0:
        # ---- DC first: baseline DC diff decode, scaled by 2^Al
        for c in scomps:
            c["pred"] = 0
        for m in range(nmcu):
            if restart and m and m % restart == 0:
                seg_i += 1
                if seg_i >= len(segs):
                    raise _JpegError("missing restart segment")
                data = segs[seg_i]
                nseg = len(data)
                pos = acc = nbits = 0
                for c in scomps:
                    c["pred"] = 0
            for c in scomps:
                dc_lut = c["dc"]
                coef = c["coef"]
                for bi in c["_mcu"][m]:
                    while nbits <= 48 and pos < nseg:
                        acc = (acc << 8) | data[pos]
                        pos += 1
                        nbits += 8
                    peek = ((acc >> (nbits - 16)) & 0xFFFF
                            if nbits >= 16
                            else (acc << (16 - nbits)) & 0xFFFF)
                    sym, ln = dc_lut[peek]
                    if sym is None or ln > nbits:
                        raise _JpegError("bad DC prefix")
                    nbits -= ln
                    if sym:
                        if nbits < sym:
                            raise _JpegError("truncated entropy stream")
                        nbits -= sym
                        v0 = (acc >> nbits) & ((1 << sym) - 1)
                        c["pred"] += (v0 if v0 >= (1 << (sym - 1))
                                      else v0 - (1 << sym) + 1)
                    acc &= (1 << nbits) - 1
                    coef[bi, 0] = c["pred"] << al
        return

    if ss == 0:
        # ---- DC refine: one raw bit per block sets bit Al
        p1 = 1 << al
        for m in range(nmcu):
            if restart and m and m % restart == 0:
                seg_i += 1
                if seg_i >= len(segs):
                    raise _JpegError("missing restart segment")
                data = segs[seg_i]
                nseg = len(data)
                pos = acc = nbits = 0
            for c in scomps:
                coef = c["coef"]
                for bi in c["_mcu"][m]:
                    while nbits < 1 and pos < nseg:
                        acc = (acc << 8) | data[pos]
                        pos += 1
                        nbits += 8
                    if nbits < 1:
                        raise _JpegError("truncated entropy stream")
                    nbits -= 1
                    if (acc >> nbits) & 1:
                        coef[bi, 0] |= p1
                    acc &= (1 << nbits) - 1
        return

    c = scomps[0]
    ac_lut = c["ac"]
    coef = c["coef"]
    tbx, bx = c["tbx"], c["bx"]
    if ah == 0:
        # ---- AC first: band [Ss,Se] values at 2^Al, EOB-run coded
        eobrun = 0
        for m in range(nmcu):
            if restart and m and m % restart == 0:
                seg_i += 1
                if seg_i >= len(segs):
                    raise _JpegError("missing restart segment")
                data = segs[seg_i]
                nseg = len(data)
                pos = acc = nbits = 0
                eobrun = 0
            if eobrun:
                eobrun -= 1
                continue
            crow = coef[(m // tbx) * bx + (m % tbx)]
            k = ss
            while k <= se:
                while nbits <= 48 and pos < nseg:
                    acc = (acc << 8) | data[pos]
                    pos += 1
                    nbits += 8
                peek = ((acc >> (nbits - 16)) & 0xFFFF
                        if nbits >= 16
                        else (acc << (16 - nbits)) & 0xFFFF)
                sym, ln = ac_lut[peek]
                if sym is None or ln > nbits:
                    raise _JpegError("bad AC prefix")
                nbits -= ln
                acc &= (1 << nbits) - 1
                r, s = sym >> 4, sym & 15
                if s:
                    k += r
                    if k > se:
                        raise _JpegError("AC overrun")
                    if nbits < s:
                        raise _JpegError("truncated entropy stream")
                    nbits -= s
                    v0 = (acc >> nbits) & ((1 << s) - 1)
                    acc &= (1 << nbits) - 1
                    crow[zz[k]] = (v0 if v0 >= (1 << (s - 1))
                                   else v0 - (1 << s) + 1) << al
                    k += 1
                elif r != 15:
                    eobrun = (1 << r) - 1  # current block is a member
                    if r:
                        if nbits < r:
                            raise _JpegError("truncated entropy stream")
                        nbits -= r
                        eobrun += (acc >> nbits) & ((1 << r) - 1)
                        acc &= (1 << nbits) - 1
                    break
                else:
                    k += 16  # ZRL
        return

    # ---- AC refine: ±1 corrections at bit Al for already-sent coefs,
    # newly-nonzero coefs at ±2^Al, EOB runs carrying correction bits
    p1 = 1 << al
    eobrun = 0
    for m in range(nmcu):
        if restart and m and m % restart == 0:
            seg_i += 1
            if seg_i >= len(segs):
                raise _JpegError("missing restart segment")
            data = segs[seg_i]
            nseg = len(data)
            pos = acc = nbits = 0
            eobrun = 0
        crow = coef[(m // tbx) * bx + (m % tbx)]
        k = ss
        if eobrun == 0:
            while k <= se:
                while nbits <= 48 and pos < nseg:
                    acc = (acc << 8) | data[pos]
                    pos += 1
                    nbits += 8
                peek = ((acc >> (nbits - 16)) & 0xFFFF
                        if nbits >= 16
                        else (acc << (16 - nbits)) & 0xFFFF)
                sym, ln = ac_lut[peek]
                if sym is None or ln > nbits:
                    raise _JpegError("bad AC prefix")
                nbits -= ln
                acc &= (1 << nbits) - 1
                r, s = sym >> 4, sym & 15
                newval = 0
                if s:
                    if s != 1:
                        raise _JpegError("bad refinement symbol")
                    if nbits < 1:
                        raise _JpegError("truncated entropy stream")
                    nbits -= 1
                    newval = p1 if (acc >> nbits) & 1 else -p1
                    acc &= (1 << nbits) - 1
                elif r != 15:
                    eobrun = 1 << r  # decremented after the tail walk
                    if r:
                        if nbits < r:
                            raise _JpegError("truncated entropy stream")
                        nbits -= r
                        eobrun += (acc >> nbits) & ((1 << r) - 1)
                        acc &= (1 << nbits) - 1
                    break
                # advance past r zero-history coefs, reading correction
                # bits for every nonzero-history coef passed on the way
                while k <= se:
                    zk = zz[k]
                    cur = int(crow[zk])
                    if cur:
                        while nbits < 1 and pos < nseg:
                            acc = (acc << 8) | data[pos]
                            pos += 1
                            nbits += 8
                        if nbits < 1:
                            raise _JpegError("truncated entropy stream")
                        nbits -= 1
                        if (acc >> nbits) & 1 and not (cur & p1):
                            crow[zk] = cur + (p1 if cur >= 0 else -p1)
                        acc &= (1 << nbits) - 1
                    else:
                        r -= 1
                        if r < 0:
                            break  # the newly-nonzero coef's position
                    k += 1
                if newval:
                    if k > se:
                        raise _JpegError("refinement overrun")
                    crow[zz[k]] = newval
                k += 1
        if eobrun > 0:
            # rest of this block's band: correction bits only
            while k <= se:
                zk = zz[k]
                cur = int(crow[zk])
                if cur:
                    while nbits < 1 and pos < nseg:
                        acc = (acc << 8) | data[pos]
                        pos += 1
                        nbits += 8
                    if nbits < 1:
                        raise _JpegError("truncated entropy stream")
                    nbits -= 1
                    if (acc >> nbits) & 1 and not (cur & p1):
                        crow[zk] = cur + (p1 if cur >= 0 else -p1)
                    acc &= (1 << nbits) - 1
                k += 1
            eobrun -= 1


# ---------------------------------------------------------------- encode


class _BitWriter:
    __slots__ = ("out", "acc", "nbits")

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | code
        self.nbits += length
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1-bits (T.81)
        return bytes(self.out)


def _build_encode_table(bits, vals) -> dict[int, tuple[int, int]]:
    """symbol → (code, length) from the canonical (BITS, HUFFVAL)."""
    table = {}
    code = 0
    vi = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[vals[vi]] = (code, length)
            vi += 1
            code += 1
        code <<= 1
    return table


def _scaled_quant(base: list[int], quality: int) -> list[int]:
    """libjpeg quality curve: 1..100 → scaled Annex-K table."""
    quality = min(100, max(1, quality))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return [min(255, max(1, (b * scale + 50) // 100)) for b in base]


def _magnitude(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


def _encode_component_blocks(np, plane, q, dctm):
    """plane (H, W) multiple-of-8 → quantized zigzag coeffs
    (nblocks, 64) int32, blocks in row-major MCU-free order."""
    hh, ww = plane.shape
    by, bx = hh // 8, ww // 8
    blocks = (
        plane.reshape(by, 8, bx, 8).transpose(0, 2, 1, 3)
        .reshape(-1, 8, 8).astype(np.float64) - 128.0
    )
    coef = np.einsum("ij,njk,kl->nil", dctm, blocks, dctm.T)
    qarr = np.asarray(q, np.float64)  # natural order, like the coeffs
    quant = np.round(coef.reshape(-1, 64) / qarr).astype(np.int32)
    return quant[:, ZIGZAG], by, bx  # zigzag-ordered coefficients


def _emit_block(bw, zcoef, pred, dc_tab, ac_tab) -> int:
    dc = int(zcoef[0])
    diff = dc - pred
    s = _magnitude(diff)
    code, ln = dc_tab[s]
    bw.write(code, ln)
    if s:
        bw.write(diff if diff > 0 else diff + (1 << s) - 1, s)
    run = 0
    last = 63
    while last > 0 and zcoef[last] == 0:
        last -= 1
    for k in range(1, last + 1):
        v = int(zcoef[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_tab[0xF0]  # ZRL
            bw.write(code, ln)
            run -= 16
        s = _magnitude(v)
        code, ln = ac_tab[(run << 4) | s]
        bw.write(code, ln)
        bw.write(v if v > 0 else v + (1 << s) - 1, s)
        run = 0
    if last < 63:
        code, ln = ac_tab[0x00]  # EOB
        bw.write(code, ln)
    return dc


def _pad_edge(np, plane, mult_y, mult_x):
    hh, ww = plane.shape
    py = (-hh) % mult_y
    px = (-ww) % mult_x
    if py or px:
        plane = np.pad(plane, ((0, py), (0, px)), mode="edge")
    return plane


def _encode_prep(np, raw, width, height, channels, quality, subsample):
    """Shared encoder front half (baseline + progressive): validate,
    color-convert, subsample, pad to the MCU grid, FDCT + quantize →
    per-component zigzag coefficient planes with their geometry."""
    if channels not in (1, 3):
        raise ValueError("channels must be 1 (gray) or 3 (RGB)")
    if len(raw) != width * height * channels:
        raise ValueError("raw length != width*height*channels")
    if subsample not in ("4:4:4", "4:2:0", "4:2:2", "4:4:0"):
        raise ValueError(
            "subsample must be '4:4:4', '4:2:0', '4:2:2' or '4:4:0'")

    dctm = _dct_matrix()
    ql = _scaled_quant(QUANT_LUMA, quality)
    qc = _scaled_quant(QUANT_CHROMA, quality)

    if channels == 1:
        y = np.frombuffer(raw, np.uint8).reshape(height, width)
        planes = [y.astype(np.float64)]
        samp = [(1, 1)]
    else:
        px = np.frombuffer(raw, np.uint8).reshape(height, width, 3)
        r = px[:, :, 0].astype(np.float64)
        g = px[:, :, 1].astype(np.float64)
        b = px[:, :, 2].astype(np.float64)
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
        cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
        # chroma box-average on an edge-padded grid; the luma sampling
        # factors carry the ratio (chroma stays 1×1)
        fy, fx = {"4:4:4": (1, 1), "4:2:0": (2, 2),
                  "4:2:2": (1, 2), "4:4:0": (2, 1)}[subsample]
        if (fy, fx) != (1, 1):
            def box(p):
                p = _pad_edge(np, p, fy, fx)
                return p.reshape(p.shape[0] // fy, fy,
                                 p.shape[1] // fx, fx).mean(axis=(1, 3))

            cb, cr = box(cb), box(cr)
        samp = [(fx, fy), (1, 1), (1, 1)]
        planes = [y, cb, cr]

    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux = -(-width // (8 * hmax))
    mcuy = -(-height // (8 * vmax))

    encoded = []
    for ci, (plane, (sh, sv)) in enumerate(zip(planes, samp)):
        plane = np.clip(np.round(plane), 0, 255)
        # pad (edge-replicate) to the full MCU grid for this component
        target_h, target_w = 8 * mcuy * sv, 8 * mcux * sh
        plane = _pad_edge(np, plane, target_h, target_w)
        plane = plane[:target_h, :target_w]
        zc, by, bx = _encode_component_blocks(
            np, plane, ql if ci == 0 else qc, dctm
        )
        cw = -(-(width * sh) // hmax)
        chp = -(-(height * sv) // vmax)
        encoded.append({"zc": zc, "bx": bx, "by": by, "h": sh, "v": sv,
                        "cid": ci + 1,
                        "tbx": -(-cw // 8), "tby": -(-chp // 8),
                        "dtid": 0 if ci == 0 else 1,
                        "atid": 0 if ci == 0 else 1})
    return encoded, samp, mcux, mcuy, ql, qc


def _seg(marker: int, body: bytes) -> bytes:
    return bytes((0xFF, marker)) + struct.pack(">H", len(body) + 2) + body


def _assemble_headers(channels, width, height, samp, ql, qc,
                      sof_marker) -> bytearray:
    """SOI + JFIF APP0 + DQT(s) + SOF (0xC0 baseline / 0xC2
    progressive) — the header prefix both writers share."""
    out = bytearray(b"\xff\xd8")
    out += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    # DQT bodies are zigzag-ordered in the file (T.81 B.2.4.1)
    zql = bytes(ql[ZIGZAG[k]] for k in range(64))
    zqc = bytes(qc[ZIGZAG[k]] for k in range(64))
    out += _seg(0xDB, b"\x00" + zql)
    if channels == 3:
        out += _seg(0xDB, b"\x01" + zqc)
    sof = bytearray(struct.pack(">BHHB", 8, height, width, channels))
    for ci in range(channels):
        sh, sv = samp[ci]
        sof += bytes((ci + 1, (sh << 4) | sv, 0 if ci == 0 else 1))
    out += _seg(sof_marker, bytes(sof))
    return out


def encode_jpeg(raw: bytes, width: int, height: int, channels: int = 1,
                quality: int = 85, subsample: str = "4:4:4",
                restart_interval: int = 0) -> bytes:
    """Write 8-bit gray/RGB raw pixels as a baseline JFIF JPEG
    (fixture/export writer, like encode_wav/encode_png): Annex-K quant
    tables on the libjpeg quality curve, the standard huffman tables
    (emitted in DHT, so any decoder reads them), gray or YCbCr with
    4:4:4 / 4:2:0 / 4:2:2 / 4:4:0 chroma subsampling, optional
    DRI/RSTn restart markers every `restart_interval` MCUs."""
    import numpy as np

    encoded, samp, mcux, mcuy, ql, qc = _encode_prep(
        np, raw, width, height, channels, quality, subsample)
    dc_l = _build_encode_table(DC_LUMA_BITS, DC_LUMA_VALS)
    ac_l = _build_encode_table(AC_LUMA_BITS, AC_LUMA_VALS)
    dc_c = _build_encode_table(DC_CHROMA_BITS, DC_CHROMA_VALS)
    ac_c = _build_encode_table(AC_CHROMA_BITS, AC_CHROMA_VALS)
    for ci, e in enumerate(encoded):
        e["dc"] = dc_l if ci == 0 else dc_c
        e["ac"] = ac_l if ci == 0 else ac_c

    bw = _BitWriter()
    preds = [0] * len(encoded)
    scan = bytearray()
    rst = 0
    for m in range(mcux * mcuy):
        if restart_interval and m and m % restart_interval == 0:
            scan += bw.flush()
            scan += bytes((0xFF, 0xD0 + rst))
            rst = (rst + 1) % 8
            bw = _BitWriter()
            preds = [0] * len(encoded)
        my, mx = divmod(m, mcux)
        for ci, e in enumerate(encoded):
            for v in range(e["v"]):
                for hh in range(e["h"]):
                    bi = (my * e["v"] + v) * e["bx"] + (mx * e["h"] + hh)
                    preds[ci] = _emit_block(
                        bw, e["zc"][bi], preds[ci], e["dc"], e["ac"]
                    )
    scan += bw.flush()
    scan = bytes(scan)

    out = _assemble_headers(channels, width, height, samp, ql, qc, 0xC0)
    out += _seg(0xC4, b"\x00" + bytes(DC_LUMA_BITS) + bytes(DC_LUMA_VALS))
    out += _seg(0xC4, b"\x10" + bytes(AC_LUMA_BITS) + bytes(AC_LUMA_VALS))
    if channels == 3:
        out += _seg(0xC4, b"\x01" + bytes(DC_CHROMA_BITS)
                    + bytes(DC_CHROMA_VALS))
        out += _seg(0xC4, b"\x11" + bytes(AC_CHROMA_BITS)
                    + bytes(AC_CHROMA_VALS))
    if restart_interval:
        out += _seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytearray((channels,))
    for ci in range(channels):
        sos += bytes((ci + 1, 0x00 if ci == 0 else 0x11))
    sos += b"\x00\x3f\x00"
    out += _seg(0xDA, bytes(sos))
    out += scan
    out += b"\xff\xd9"
    return bytes(out)


# ------------------------------------------------------ encode (SOF2)


def _optimal_huffman(freq) -> tuple[list[int], list[int]]:
    """T.81 Annex K.2 optimal code-length derivation over a 256-symbol
    frequency table (+1 reserved symbol so no code is all ones),
    limited to 16 bits. This exists because the Annex K.3 baseline
    tables carry no EOBn>0 symbols, so progressive AC scans NEED
    generated tables — the same reason libjpeg forces optimize_coding
    for progressive output. Returns (BITS[1..16], HUFFVAL)."""
    freq = list(freq) + [1]
    others = [-1] * 257
    codesize = [0] * 257
    while True:
        c1 = c2 = -1
        v = None
        for j in range(257):  # smallest freq; ties → largest symbol
            if freq[j] and (v is None or freq[j] <= v):
                v = freq[j]
                c1 = j
        v = None
        for j in range(257):
            if freq[j] and j != c1 and (v is None or freq[j] <= v):
                v = freq[j]
                c2 = j
        if c2 < 0:
            break
        freq[c1] += freq[c2]
        freq[c2] = 0
        codesize[c1] += 1
        while others[c1] >= 0:
            c1 = others[c1]
            codesize[c1] += 1
        others[c1] = c2
        codesize[c2] += 1
        while others[c2] >= 0:
            c2 = others[c2]
            codesize[c2] += 1
    bits = [0] * 33
    for j in range(257):
        if codesize[j]:
            bits[codesize[j]] += 1
    for ln in range(32, 16, -1):  # Annex K.2 Figure K.3: limit to 16
        while bits[ln] > 0:
            j = ln - 2
            while bits[j] == 0:
                j -= 1
            bits[ln] -= 2
            bits[ln - 1] += 1
            bits[j + 1] += 2
            bits[j] -= 1
    ln = 16
    while bits[ln] == 0:
        ln -= 1
    bits[ln] -= 1  # drop the reserved code point
    huffval = [s for _, s in
               sorted((codesize[s], s) for s in range(256) if codesize[s])]
    return bits[1:17], huffval


class _ScanSink:
    """Two-pass progressive scan emission: with codes=None it counts
    symbol frequencies per huffman table id (feeding
    `_optimal_huffman`); with codes it writes the entropy stream,
    inserting RSTn markers at `restart()`."""

    def __init__(self, codes=None):
        self.codes = codes  # {tid: {sym: (code, len)}} or None
        self.counts: dict[int, list[int]] = {}
        self.bw = _BitWriter() if codes is not None else None
        self.out = bytearray()
        self.rst = 0

    def symbol(self, tid, sym):
        if self.codes is None:
            self.counts.setdefault(tid, [0] * 256)[sym] += 1
        else:
            code, ln = self.codes[tid][sym]
            self.bw.write(code, ln)

    def bits(self, val, n):
        if self.codes is not None and n:
            self.bw.write(val & ((1 << n) - 1), n)

    def restart(self):
        if self.codes is not None:
            self.out += self.bw.flush()
            self.out += bytes((0xFF, 0xD0 + self.rst))
            self.rst = (self.rst + 1) % 8
            self.bw = _BitWriter()

    def finish(self) -> bytes:
        if self.codes is not None:
            self.out += self.bw.flush()
        return bytes(self.out)


def _scan_blocks(e, interleaved, mcux):
    """Block indices one MCU covers for component `e`, as a function
    m → [bi] (interleaved: its h×v blocks on the padded grid;
    non-interleaved: the single true-grid block)."""
    if interleaved:
        def at(m):
            my, mx = divmod(m, mcux)
            return [(my * e["v"] + v) * e["bx"] + (mx * e["h"] + hh)
                    for v in range(e["v"]) for hh in range(e["h"])]
    else:
        def at(m):
            row, col = divmod(m, e["tbx"])
            return [row * e["bx"] + col]
    return at


def _emit_scan_dc_first(sink, scomps, al, mcux, mcuy, restart_interval):
    interleaved = len(scomps) > 1
    nmcu = (mcux * mcuy if interleaved
            else scomps[0]["tbx"] * scomps[0]["tby"])
    ats = [_scan_blocks(e, interleaved, mcux) for e in scomps]
    preds = [0] * len(scomps)
    for m in range(nmcu):
        if restart_interval and m and m % restart_interval == 0:
            sink.restart()
            preds = [0] * len(scomps)
        for ci, e in enumerate(scomps):
            for bi in ats[ci](m):
                val = int(e["zc"][bi][0]) >> al
                diff = val - preds[ci]
                preds[ci] = val
                s = _magnitude(diff)
                sink.symbol(e["dtid"], s)
                if s:
                    sink.bits(diff if diff > 0 else diff + (1 << s) - 1,
                              s)


def _emit_scan_dc_refine(sink, scomps, al, mcux, mcuy,
                         restart_interval):
    interleaved = len(scomps) > 1
    nmcu = (mcux * mcuy if interleaved
            else scomps[0]["tbx"] * scomps[0]["tby"])
    ats = [_scan_blocks(e, interleaved, mcux) for e in scomps]
    for m in range(nmcu):
        if restart_interval and m and m % restart_interval == 0:
            sink.restart()
        for ci, e in enumerate(scomps):
            for bi in ats[ci](m):
                sink.bits((int(e["zc"][bi][0]) >> al) & 1, 1)


def _emit_scan_ac_first(sink, e, ss, se, al, restart_interval):
    zc, tid = e["zc"], e["atid"]
    tbx, bx = e["tbx"], e["bx"]
    nmcu = e["tby"] * tbx
    eobrun = 0

    def flush_eob():
        nonlocal eobrun
        if eobrun > 0:
            nb = eobrun.bit_length() - 1
            sink.symbol(tid, nb << 4)
            if nb:
                sink.bits(eobrun, nb)
            eobrun = 0

    for m in range(nmcu):
        if restart_interval and m and m % restart_interval == 0:
            flush_eob()
            sink.restart()
        crow = zc[(m // tbx) * bx + (m % tbx)]
        r = 0
        for k in range(ss, se + 1):
            v = int(crow[k])  # zc rows are already zigzag-ordered
            if v >= 0:
                t = v >> al
                t2 = t
            else:
                t = (-v) >> al
                t2 = ~t
            if t == 0:
                r += 1
                continue
            flush_eob()
            while r > 15:
                sink.symbol(tid, 0xF0)
                r -= 16
            s = t.bit_length()
            sink.symbol(tid, (r << 4) | s)
            sink.bits(t2, s)
            r = 0
        if r > 0:
            eobrun += 1
            if eobrun == 0x7FFF:
                flush_eob()
    flush_eob()


def _emit_scan_ac_refine(sink, e, ss, se, al, restart_interval):
    """libjpeg jcphuff-style AC refinement: correction bits for
    already-sent coefs buffer until the symbol they ride behind — the
    current block's (`br`) behind its next ZRL / newly-nonzero symbol,
    completed EOB-run blocks' (`be`) behind the eventual EOBn."""
    zc, tid = e["zc"], e["atid"]
    tbx, bx = e["tbx"], e["bx"]
    nmcu = e["tby"] * tbx
    eobrun = 0
    be: list[int] = []

    def flush_eob():
        nonlocal eobrun
        if eobrun > 0:
            nb = eobrun.bit_length() - 1
            sink.symbol(tid, nb << 4)
            if nb:
                sink.bits(eobrun, nb)
            eobrun = 0
            for b in be:
                sink.bits(b, 1)
            del be[:]

    for m in range(nmcu):
        if restart_interval and m and m % restart_interval == 0:
            flush_eob()
            sink.restart()
        crow = zc[(m // tbx) * bx + (m % tbx)]
        absval = [abs(int(crow[k])) >> al for k in range(ss, se + 1)]
        eob = -1  # last NEWLY-nonzero position; ZRLs beyond it fold
        for k in range(ss, se + 1):
            if absval[k - ss] == 1:
                eob = k
        r = 0
        br: list[int] = []
        for k in range(ss, se + 1):
            t = absval[k - ss]
            if t == 0:
                r += 1
                continue
            while r > 15 and k <= eob:
                flush_eob()
                sink.symbol(tid, 0xF0)
                r -= 16
                for b in br:
                    sink.bits(b, 1)
                br = []
            if t > 1:  # already-sent coef: one correction bit
                br.append(t & 1)
                continue
            flush_eob()
            sink.symbol(tid, (r << 4) | 1)
            sink.bits(1 if int(crow[k]) >= 0 else 0, 1)
            for b in br:
                sink.bits(b, 1)
            br = []
            r = 0
        if r > 0 or br:
            eobrun += 1
            be.extend(br)
            if eobrun == 0x7FFF or len(be) > 900:
                flush_eob()
    flush_eob()


def encode_jpeg_progressive(raw: bytes, width: int, height: int,
                            channels: int = 1, quality: int = 85,
                            subsample: str = "4:4:4",
                            restart_interval: int = 0) -> bytes:
    """Write 8-bit gray/RGB raw pixels as a PROGRESSIVE (SOF2) JFIF
    JPEG using the libjpeg standard scan script — spectral selection
    plus successive approximation (DC 1+refine; luma AC 1-5/6-63 at
    2, refine to 1 then 0; chroma full-band) — with per-scan optimal
    huffman tables (see `_optimal_huffman`). Same pixel pipeline as
    `encode_jpeg`, so a progressive re-encode decodes to the SAME
    coefficients and identical pixels."""
    import numpy as np

    encoded, samp, mcux, mcuy, ql, qc = _encode_prep(
        np, raw, width, height, channels, quality, subsample)
    if channels == 1:
        script = [
            ([0], 0, 0, 0, 1),
            ([0], 1, 5, 0, 2),
            ([0], 6, 63, 0, 2),
            ([0], 1, 63, 2, 1),
            ([0], 0, 0, 1, 0),
            ([0], 1, 63, 1, 0),
        ]
    else:  # jcparam.c std script: luma banded, chroma whole-band
        script = [
            ([0, 1, 2], 0, 0, 0, 1),
            ([0], 1, 5, 0, 2),
            ([2], 1, 63, 0, 1),
            ([1], 1, 63, 0, 1),
            ([0], 6, 63, 0, 2),
            ([0], 1, 63, 2, 1),
            ([0, 1, 2], 0, 0, 1, 0),
            ([2], 1, 63, 1, 0),
            ([1], 1, 63, 1, 0),
            ([0], 1, 63, 1, 0),
        ]
    out = _assemble_headers(channels, width, height, samp, ql, qc, 0xC2)
    if restart_interval:
        out += _seg(0xDD, struct.pack(">H", restart_interval))
    for cidx, ss, se, ah, al in script:
        scomps = [encoded[ci] for ci in cidx]

        def run(sink, scomps=scomps, ss=ss, se=se, ah=ah, al=al):
            if ss == 0 and ah == 0:
                _emit_scan_dc_first(sink, scomps, al, mcux, mcuy,
                                    restart_interval)
            elif ss == 0:
                _emit_scan_dc_refine(sink, scomps, al, mcux, mcuy,
                                     restart_interval)
            elif ah == 0:
                _emit_scan_ac_first(sink, scomps[0], ss, se, al,
                                    restart_interval)
            else:
                _emit_scan_ac_refine(sink, scomps[0], ss, se, al,
                                     restart_interval)

        counter = _ScanSink(None)
        run(counter)
        codes = {}
        for tid, freq in sorted(counter.counts.items()):
            bits, vals = _optimal_huffman(freq)
            tclass = 0 if ss == 0 else 1
            out += _seg(0xC4, bytes(((tclass << 4) | tid,))
                        + bytes(bits) + bytes(vals))
            codes[tid] = _build_encode_table(bits, vals)
        writer = _ScanSink(codes)
        run(writer)
        sos = bytearray((len(scomps),))
        for e in scomps:
            td = e["dtid"] if ss == 0 and ah == 0 else 0
            ta = e["atid"] if ss > 0 else 0
            sos += bytes((e["cid"], (td << 4) | ta))
        sos += bytes((ss, se, (ah << 4) | al))
        out += _seg(0xDA, bytes(sos))
        out += writer.finish()
    out += b"\xff\xd9"
    return bytes(out)
