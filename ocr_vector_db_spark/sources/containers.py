"""WAV/RIFF and PNG container ingestion for the multimodal stack.

The raw-buffer operators (image dHash/resize q150/q152, audio
fingerprints/quality q153/q154, video frame hashes q155) consume
already-decoded pixels/samples; a real crawl arrives CONTAINERIZED. The
two containers whose decode is pure structure — no codec math — are
handled here so those rows stop falling through to the exact-byte-hash
path:

- **WAV/RIFF**: a chunk walk (RIFF → fmt → data). PCM16 little-endian
  payloads are exactly the `pcm_s16le` bytes `asset_pcm_frames` wants —
  the "decode" is locating them; 8/24/32-bit integer and 32-bit float
  payloads reduce to s16 by the standard high-bits / scale-and-clip
  reductions, and G.711 µ-law/A-law telephony payloads expand through
  their 256-entry companding tables (numpy, still zero codec math).
- **PNG**: chunk walk (IHDR → PLTE? → IDAT* → IEND), one BOUNDED zlib
  inflate of the concatenated IDAT stream, then the five standard
  per-scanline filters reconstructed (None/Sub/Up/Average/Paeth,
  RFC 2083 §6 — numpy-vectorized where the recurrence allows). All
  five non-interlaced color types: gray (0), RGB (2), palette (3,
  expanded via PLTE lookup; an all-gray palette collapses to one
  channel), gray+alpha (4) and RGBA (6) with alpha dropped — at every
  legal bit depth (1/2/4-bit gray and palette — bilevel document
  scans — unpack and scale exactly; 16-bit reduces to the high byte),
  progressive (Adam7) or not — the shapes `asset_gray_frames` /
  `asset_raw_frames` consume. Full-spec PNG coverage.

Anything else (MP3/MP4 entropy coding) stays behind
`multimodal.extract_features`'s pluggable decode seam, honestly out
of scope. JPEG — baseline SOF0 and progressive SOF2 — lives in its
own module (`sources/jpeg.py`), TIFF (the scanner archive format,
reusing the CCITT/LZW/JPEG codecs) in `sources/tiff.py`, GIF (static
+ animated; animated gray GIFs become raw VIDEO rows) in
`sources/gif.py`, and IMA/MS ADPCM telephony WAV payloads in
`sources/adpcm.py`; all are wired through the same
`normalize_assets` pass.

Scale shape: decode is per-ASSET work with zero cross-row state, so
`normalize_assets` runs it as one Arrow-batched `mapInPandas` pass —
the same grain as the PDF decrypt (`sources/pdf_decode.py`) — and every
downstream operator keeps its certified distributed shape. Rows that
are not (or not decodably) containerized pass through UNCHANGED, so the
exact-hash fallback still owns them.

Reference parity: none — the reference ingests PDF/text/markdown only
(ingestion/parsers/); this is the multimodal-columns brief's decode
step made real for the two structure-only containers.

The matching `encode_wav` / `encode_png` writers exist so round-trips
are testable end-to-end (decode(encode(x)) == x) and raw assets can be
exported to standard files; `encode_png` emits fixed-filter scanlines
and exercises every filter type in tests.
"""

from __future__ import annotations

import struct
import zlib
from collections.abc import Iterator

from pyspark.sql import DataFrame

WAV_MAGIC = b"RIFF"
PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
MAX_PIXELS = 64 * 1024 * 1024  # reject > 64 MP before any inflate


# ------------------------------------------------------------------ WAV


def _mulaw_table():
    """G.711 µ-law byte → s16 expansion (the CCITT decode: complement,
    then ((mant<<3)+BIAS)<<exp − BIAS with BIAS=0x84; range ±32124).
    A 256-entry table — telephony 'compression' is a companding curve,
    not an entropy codec, so it belongs with the structure-only
    containers."""
    out = []
    for b in range(256):
        u = ~b & 0xFF
        t = (((u & 0x0F) << 3) + 0x84) << ((u >> 4) & 7)
        out.append(0x84 - t if u & 0x80 else t - 0x84)
    return out


def _alaw_table():
    """G.711 A-law byte → s16 expansion (xor 0x55; exp 0 is linear,
    else ((mant<<4)+0x108)<<(exp−1); range ±32256; bit 7 clear =
    negative)."""
    out = []
    for b in range(256):
        a = b ^ 0x55
        mant, exp = a & 0x0F, (a >> 4) & 7
        t = (mant << 4) + 8 if exp == 0 else ((mant << 4) + 0x108) << (
            exp - 1)
        out.append(t if a & 0x80 else -t)
    return out


_G711 = {6: _alaw_table, 7: _mulaw_table}  # WAVE format tags


def decode_wav(data: bytes) -> dict | None:
    """RIFF/WAVE → {'pcm': bytes (s16le), 'sample_rate': int,
    'channels': int} for every integer/float PCM shape: 16-bit passes
    through; 8-bit unsigned, 24-bit and 32-bit integer reduce to the
    high 16 bits (the standard bit-depth reduction — pure structure, no
    codec math); 32-bit IEEE float (format 3) scales to ±32767 with
    clipping; G.711 µ-law (7) / A-law (6) expand through their 256-entry
    companding tables; IMA (0x11) and MS (0x02) ADPCM decode through
    `sources/adpcm.py`'s block-wavefront tables. None for actual
    entropy codecs (MP3-in-WAV) and malformed files. Walks chunks with
    the word-alignment rule; LIST/INFO and unknown chunks skip."""
    if len(data) < 12 or data[0:4] != b"RIFF" or data[8:12] != b"WAVE":
        return None
    fmt = None
    pcm = None
    o = 12
    n = len(data)
    while o + 8 <= n:
        cid = data[o:o + 4]
        (size,) = struct.unpack_from("<I", data, o + 4)
        body = data[o + 8:o + 8 + size]
        if len(body) < size:
            return None  # truncated chunk
        if cid == b"fmt " and size >= 16 and fmt is None:
            # first chunk wins: a crafted duplicate fmt/data must not
            # make the perceptual gate fingerprint a different payload
            # than decoders that honor the first chunk (dedup-gate
            # confusion on untrusted crawl input)
            audio_format, channels, sample_rate = struct.unpack_from(
                "<HHI", body, 0
            )
            (block_align,) = struct.unpack_from("<H", body, 12)
            (bits,) = struct.unpack_from("<H", body, 14)
            # 0xFFFE = WAVE_FORMAT_EXTENSIBLE: PCM iff the 16-byte
            # sub-format GUID starts with the PCM tag
            if audio_format == 0xFFFE and size >= 40:
                (sub,) = struct.unpack_from("<H", body, 24)
                audio_format = sub
            fmt = (audio_format, channels, sample_rate, bits,
                   block_align)
        elif cid == b"data" and pcm is None:
            pcm = body
        o += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or pcm is None:
        return None
    audio_format, channels, sample_rate, bits, block_align = fmt
    if channels < 1:
        return None
    if audio_format == 1 and bits in (8, 16, 24, 32):
        bw = bits // 8
        frame = bw * channels
        usable = len(pcm) - (len(pcm) % frame)  # drop ragged tail bytes
        pcm = pcm[:usable]
        if bits != 16:
            import numpy as np

            if bits == 8:  # unsigned → signed, widen to the high byte
                s = np.frombuffer(pcm, np.uint8).astype(np.int16)
                out = (s - 128) << 8
            elif bits == 24:  # little-endian: top 16 bits are bytes 1-2
                a = np.frombuffer(pcm, np.uint8).reshape(-1, 3)
                out = np.ascontiguousarray(
                    a[:, 1:3]).view("<i2").reshape(-1)
            else:  # 32-bit int: top 16 bits
                out = (np.frombuffer(pcm, "<i4") >> 16).astype("<i2")
            pcm = out.astype("<i2").tobytes()
    elif audio_format == 3 and bits == 32:  # IEEE float
        import numpy as np

        frame = 4 * channels
        usable = len(pcm) - (len(pcm) % frame)
        f = np.frombuffer(pcm[:usable], "<f4").astype(np.float64)
        # NaN survives np.clip (clip(NaN)=NaN) and the int16 cast of NaN
        # is platform-dependent — map it to 0 so a degenerate float WAV
        # fingerprints identically everywhere
        f = np.nan_to_num(f, nan=0.0)
        out = np.clip(np.round(f * 32767.0), -32768, 32767)
        pcm = out.astype("<i2").tobytes()
    elif audio_format in _G711 and bits == 8:  # µ-law / A-law companding
        import numpy as np

        usable = len(pcm) - (len(pcm) % channels)
        table = np.array(_G711[audio_format](), "<i2")
        pcm = table[np.frombuffer(pcm[:usable], np.uint8)].tobytes()
    elif audio_format == 0x11 and bits == 4:  # IMA/DVI ADPCM
        from ocr_vector_db_spark.sources.adpcm import decode_ima

        pcm = decode_ima(pcm, channels, block_align)
        if pcm is None:
            return None
    elif audio_format == 0x02 and bits == 4:  # Microsoft ADPCM
        from ocr_vector_db_spark.sources.adpcm import decode_ms

        pcm = decode_ms(pcm, channels, block_align)
        if pcm is None:
            return None
    else:
        return None  # actual entropy codecs (MP3-in-WAV/...) stay out
    return {
        "pcm": pcm,
        "sample_rate": sample_rate,
        "channels": channels,
    }


def encode_wav(pcm: bytes, sample_rate: int, channels: int = 1) -> bytes:
    """Minimal canonical RIFF/WAVE writer for 16-bit PCM (fmt + data)."""
    block = 2 * channels
    fmt = struct.pack(
        "<HHIIHH", 1, channels, sample_rate, sample_rate * block, block, 16
    )
    chunks = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(pcm)) + pcm
        + (b"\x00" if len(pcm) & 1 else b"")
    )
    return b"RIFF" + struct.pack("<I", len(chunks)) + chunks


# ------------------------------------------------------------------ PNG


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


# samples per pixel by PNG color type:
# 0 gray, 2 RGB, 3 palette index, 4 gray+alpha, 6 RGBA
_PNG_SPP = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}
# exact 8-bit scaling of sub-byte gray samples (255 / (2^d - 1))
_PNG_GRAY_SCALE = {1: 255, 2: 85, 4: 17}
# Adam7 interlace passes: (x0, y0, dx, dy) — RFC 2083 §2.6
_ADAM7 = [(0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
          (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2)]


def _png_stride(w: int, spp: int, depth: int) -> int:
    return (w * spp * depth + 7) // 8


def _samples_of(px, hp: int, wp: int, spp: int, depth: int):
    """Unfiltered packed rows (hp, stride) → one uint8 SAMPLE per
    (pixel, channel), shape (hp, wp*spp): 16-bit takes the high byte
    (the standard 16→8 reduction), sub-byte depths unpack bits (gray
    scaling happens later — palette indices must stay indices)."""
    import numpy as np

    if depth == 8:
        return px
    if depth == 16:
        return np.ascontiguousarray(px.reshape(hp, -1)[:, 0::2])
    bits = np.unpackbits(px, axis=1)
    vals = np.zeros((hp, bits.shape[1] // depth), np.uint8)
    for k in range(depth):
        vals = (vals << 1) | bits[:, k::depth]
    return vals[:, :wp]


def _unfilter_wavefront(np, f: int, lines, prev, bpp: int):
    """Reconstruct a RUN of consecutive Average(3)/Paeth(4) rows by
    anti-diagonal wavefronts. In (row r, pixel-group g) coordinates the
    recurrence for cell (r, g) reads (r, g-1), (r-1, g), (r-1, g-1) —
    all on earlier anti-diagonals r+g, so each diagonal computes as ONE
    vectorized step of up to min(nrows, ngroups) cells × bpp lanes
    instead of a per-byte Python loop (measured ~20× on Paeth-filtered
    images; SCALING.md). `prev` is the completed row above the run (or
    zeros); returns the run's decoded rows (nrows, stride) uint8."""
    nrows, stride = lines.shape
    ngroups = stride // bpp
    # padded state: buf[r+1, g+1] = decoded byte; row 0 = prev row,
    # column 0 = the zero left edge (RFC 2083 boundary rule)
    buf = np.zeros((nrows + 1, ngroups + 1, bpp), np.int16)
    buf[0, 1:] = prev.reshape(ngroups, bpp)
    ln = lines.reshape(nrows, ngroups, bpp).astype(np.int16)
    rows_idx = np.arange(nrows)
    for k in range(nrows + ngroups - 1):
        lo = max(0, k - ngroups + 1)
        hi = min(nrows - 1, k)
        rs = rows_idx[lo:hi + 1]
        gs = k - rs
        a = buf[rs + 1, gs]      # left  (r, g-1)
        b = buf[rs, gs + 1]      # up    (r-1, g)
        if f == 3:
            pred = (a + b) >> 1
        else:
            c = buf[rs, gs]      # up-left (r-1, g-1)
            p = a + b - c
            pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
            pred = np.where(
                (pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c)
            )
        buf[rs + 1, gs + 1] = (ln[rs, gs] + pred) & 0xFF
    return buf[1:, 1:].astype(np.uint8).reshape(nrows, stride)


def _unfilter(plane: bytes, h: int, stride: int, bpp: int):
    """Reconstruct the five standard scanline filters (RFC 2083 §6)
    from the inflated plane → uint8 array (h, stride), or None on an
    unknown filter type. Fully numpy-vectorized: None/Up are whole-row
    ops, Sub is a per-lane mod-256 cumsum, and runs of consecutive
    Average/Paeth rows (sequential in x through the >>1 / predictor
    non-linearity) go through the anti-diagonal wavefront
    (`_unfilter_wavefront`) — this is what sizes per-core decode
    throughput on a 100 TB PNG backfill (numbers in SCALING.md)."""
    import numpy as np

    rows = np.frombuffer(plane, np.uint8).reshape(h, 1 + stride)
    ftypes = rows[:, 0]
    if int(ftypes.max(initial=0)) > 4:
        return None
    lines = rows[:, 1:]
    out = np.empty((h, stride), np.uint8)
    zero = np.zeros(stride, np.uint8)
    y = 0
    while y < h:
        f = ftypes[y]
        line = lines[y]
        prev = out[y - 1] if y else zero
        if f == 0:                                        # None
            out[y] = line
            y += 1
        elif f == 2:                                      # Up
            out[y] = line + prev  # uint8 wraps = mod 256
            y += 1
        elif f == 1:                                      # Sub
            # out[i] = line[i] + out[i-bpp]: a running sum per channel
            # lane, and mod-256 commutes with addition → one cumsum
            cum = line.reshape(-1, bpp).cumsum(axis=0, dtype=np.int64)
            out[y] = (cum & 0xFF).astype(np.uint8).reshape(-1)
            y += 1
        else:                                             # Average/Paeth
            y1 = y + 1
            while y1 < h and ftypes[y1] == f:
                y1 += 1  # extend the same-type run
            nrows = y1 - y
            # the wavefront pays ~O(nrows + ngroups) numpy-dispatch
            # overhead; for SHORT runs (adaptive encoders alternate
            # filter types per row) the per-byte loop wins — measured
            # break-even ≈ run 32 at stride 1024, captured by this
            # cost-model inequality (cells·c_scalar vs diagonals·c_disp)
            if nrows * stride > (nrows + stride // bpp) * 32:
                out[y:y1] = _unfilter_wavefront(
                    np, int(f), lines[y:y1], prev, bpp)
            else:
                pv = prev.tolist()
                for yy in range(y, y1):
                    lv = lines[yy].tolist()
                    ov = [0] * stride
                    if f == 3:
                        for i in range(stride):
                            a = ov[i - bpp] if i >= bpp else 0
                            ov[i] = (lv[i] + ((a + pv[i]) >> 1)) & 0xFF
                    else:
                        for i in range(stride):
                            a = ov[i - bpp] if i >= bpp else 0
                            b = pv[i]
                            c = pv[i - bpp] if i >= bpp else 0
                            ov[i] = (lv[i] + _paeth(a, b, c)) & 0xFF
                    out[yy] = ov
                    pv = ov
            y = y1
    return out


def decode_png(data: bytes) -> dict | None:
    """PNG → {'raw': bytes, 'width', 'height', 'channels'} for every
    legal (depth, color type, interlace) combination: gray (0) and
    palette-index (3) → channels=1 or 3, RGB (2) → 3, gray+alpha (4) →
    1 (alpha dropped), RGBA (6) → 3 (alpha dropped); sub-byte depths
    1/2/4 (bilevel document scans!) unpack and scale exactly, 16-bit
    reduces to the high byte; Adam7 de-interlaces (each of the seven
    sub-images independently unfiltered, then scattered); None
    otherwise. One BOUNDED inflate of the IDAT stream, numpy filter
    reconstruction, then the palette lookup / alpha drop."""
    import numpy as np

    if not data.startswith(PNG_MAGIC):
        return None
    o = len(PNG_MAGIC)
    n = len(data)
    hdr = None
    plte = None
    idat = bytearray()
    while o + 8 <= n:
        (size,) = struct.unpack_from(">I", data, o)
        ctype = data[o + 4:o + 8]
        body = data[o + 8:o + 8 + size]
        if len(body) < size:
            return None
        if ctype == b"IHDR" and hdr is None:  # first chunk wins
            if size < 13:
                return None
            w, h = struct.unpack_from(">II", body, 0)
            depth, color, comp, filt, interlace = body[8:13]
            hdr = (w, h, depth, color, comp, filt, interlace)
        elif ctype == b"PLTE" and plte is None:
            plte = body
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            break
        o += 12 + size  # len + type + body + crc
    if hdr is None or not idat:
        return None
    w, h, depth, color, comp, filt, interlace = hdr
    if comp != 0 or filt != 0 or interlace not in (0, 1):
        return None
    spp = _PNG_SPP.get(color)
    if spp is None:
        return None
    # legal (depth, color) pairs per the PNG spec: sub-byte only for
    # gray/palette (bilevel document scans!), 16-bit never for palette
    if depth not in (1, 2, 4, 8, 16):
        return None
    if depth < 8 and color not in (0, 3):
        return None
    if depth == 16 and color == 3:
        return None
    if color == 3 and (
        plte is None or len(plte) == 0 or len(plte) % 3 != 0
    ):
        return None
    if w < 1 or h < 1 or w * h > MAX_PIXELS:
        return None
    bpp = max(1, spp * depth // 8)  # the FILTER unit (RFC 2083 §6.2)
    stride = _png_stride(w, spp, depth)
    if interlace:
        # Adam7: seven sub-images, each independently filtered
        passes = []
        want = 0
        for px0, py0, pdx, pdy in _ADAM7:
            wp = (w - px0 + pdx - 1) // pdx
            hp = (h - py0 + pdy - 1) // pdy
            if wp <= 0 or hp <= 0:
                continue
            sp = _png_stride(wp, spp, depth)
            passes.append((px0, py0, pdx, pdy, wp, hp, sp))
            want += hp * (1 + sp)
    else:
        want = h * (1 + stride)
    # BOUNDED inflate of the untrusted IDAT stream: a 97 KB crafted PNG
    # can otherwise inflate to GB scale before any length check runs
    # (decompression bomb). decompressobj(max_length=want+1) caps the
    # allocation at the declared-geometry size; any overflow, short
    # stream, or leftover compressed input means the container lied —
    # undecodable, so the row passes through to the exact-hash path.
    try:
        dobj = zlib.decompressobj()
        plane = dobj.decompress(bytes(idat), want + 1)
    except zlib.error:
        return None
    if len(plane) != want or not dobj.eof or dobj.unused_data:
        return None
    if interlace:
        px = np.zeros((h, w, spp), np.uint8)
        off = 0
        for px0, py0, pdx, pdy, wp, hp, sp in passes:
            sub = _unfilter(plane[off:off + hp * (1 + sp)], hp, sp, bpp)
            if sub is None:
                return None
            off += hp * (1 + sp)
            sub = _samples_of(sub, hp, wp, spp, depth)
            px[py0::pdy, px0::pdx, :] = sub.reshape(hp, wp, spp)
        px = px.reshape(h, w * spp)
    else:
        px = _unfilter(plane, h, stride, bpp)
        if px is None:
            return None
        px = _samples_of(px, h, w, spp, depth)
    if depth < 8 and color == 0:
        # exact sub-byte gray scaling (palette indices stayed indices)
        px = px * np.uint8(_PNG_GRAY_SCALE[depth])
    if color == 3:
        pal = np.frombuffer(plte, np.uint8).reshape(-1, 3)
        if int(px.max()) >= pal.shape[0]:
            return None  # index past the palette: the container lied
        # an all-gray palette (r==g==b) collapses to ONE channel so a
        # palettized scan of a gray page is byte-identical to its raw
        # twin; a color palette expands to RGB
        if bool((pal[:, 0] == pal[:, 1]).all()
                and (pal[:, 1] == pal[:, 2]).all()):
            raw, ch = pal[px.reshape(-1), 0].tobytes(), 1
        else:
            raw, ch = pal[px.reshape(-1)].tobytes(), 3
    elif color == 4:
        raw, ch = np.ascontiguousarray(
            px.reshape(h, w, 2)[:, :, 0]).tobytes(), 1
    elif color == 6:
        raw, ch = np.ascontiguousarray(
            px.reshape(h, w, 4)[:, :, :3]).tobytes(), 3
    else:
        raw, ch = px.tobytes(), spp
    return {"raw": raw, "width": w, "height": h, "channels": ch}


def _png_chunk(ctype: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body)) + ctype + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


def encode_png(raw: bytes, width: int, height: int, channels: int = 1,
               filter_type: int = 0, color_type: int | None = None,
               palette: bytes | None = None, depth: int = 8,
               interlace: bool = False) -> bytes:
    """Write 8-bit raw samples as a PNG with one fixed filter type per
    scanline (0–4; fixture/export writer — a size-optimizing encoder
    would pick per-line, which the decoder handles anyway). `color_type`
    defaults from `channels` (1 → gray, 3 → RGB); pass 3/4/6 explicitly
    to write palette-index (`raw` = 1 byte/px indices into `palette`'s
    RGB triplets), gray+alpha (2 bytes/px) or RGBA (4 bytes/px) files.
    `depth` widens the writable set: 1/2/4-bit gray or palette (`raw` =
    one byte per sample holding a value < 2^depth; the encoder packs
    bits) and 16-bit gray/RGB/alpha types (`raw` = 2 big-endian bytes
    per sample, passed through). Filtering is numpy-vectorized for
    every type — unlike the decoder's Average/Paeth recurrence, the
    filter PASS reads only the raw input, so the Paeth predictor is one
    whole-image np.where."""
    import numpy as np

    if color_type is None:
        if channels not in (1, 3):
            raise ValueError("channels must be 1 (gray) or 3 (RGB)")
        color_type = 0 if channels == 1 else 2
    spp = _PNG_SPP.get(color_type)
    if spp is None:
        raise ValueError(f"unsupported color_type {color_type}")
    if depth not in (1, 2, 4, 8, 16) or (
        depth < 8 and color_type not in (0, 3)
    ) or (depth == 16 and color_type == 3):
        raise ValueError(f"illegal depth {depth} for color {color_type}")
    if color_type == 3:
        if not palette or len(palette) % 3 != 0 or len(palette) > 768:
            raise ValueError("palette must be 1..256 RGB triplets")
    elif palette is not None:
        raise ValueError("palette only applies to color_type 3")
    n_samples = width * height * spp
    if len(raw) != n_samples * (2 if depth == 16 else 1):
        raise ValueError("raw length != sample count for this depth")
    if not 0 <= filter_type <= 4:
        raise ValueError("filter_type must be 0..4")
    bpp = max(1, spp * depth // 8)

    def pack(vals, hp, wp):
        """(hp, wp*spp[*2]) sample bytes → packed filter rows."""
        if depth >= 8:
            return vals
        sp = _png_stride(wp, spp, depth)
        bits = np.zeros((hp, sp * 8), np.uint8)
        for k in range(depth):
            bits[:, k::depth][:, :wp] = (vals >> (depth - 1 - k)) & 1
        return np.packbits(bits, axis=1)

    def filt_plane(px):
        """Packed rows → filtered plane with the leading type byte.
        Predictor inputs: a = left (bpp back), b = above, c = above-
        left — zero-padded at the sub-image edges (RFC 2083 §6.2)."""
        a = np.zeros_like(px)
        a[:, bpp:] = px[:, :-bpp]
        b = np.zeros_like(px)
        b[1:] = px[:-1]
        c = np.zeros_like(px)
        c[1:, bpp:] = px[:-1, :-bpp]
        if filter_type == 0:
            filt = px
        elif filter_type == 1:
            filt = px - a
        elif filter_type == 2:
            filt = px - b
        elif filter_type == 3:
            ai = a.astype(np.int16)
            filt = (px - ((ai + b) >> 1).astype(np.uint8))
        else:
            ai, bi, ci = (x.astype(np.int16) for x in (a, b, c))
            p = ai + bi - ci
            pa, pb, pc = abs(p - ai), abs(p - bi), abs(p - ci)
            pred = np.where(
                (pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c)
            )
            filt = px - pred
        out = np.empty((px.shape[0], 1 + px.shape[1]), np.uint8)
        out[:, 0] = filter_type
        out[:, 1:] = filt
        return out

    unit = spp * (2 if depth == 16 else 1) if depth >= 8 else 1
    vals = np.frombuffer(raw, np.uint8).reshape(height, width, unit)
    if depth < 8 and int(vals.max(initial=0)) >= (1 << depth):
        raise ValueError(f"sample value out of {depth}-bit range")
    if interlace:
        planes = []
        for px0, py0, pdx, pdy in _ADAM7:
            sub = vals[py0::pdy, px0::pdx, :]
            hp, wp = sub.shape[0], sub.shape[1]
            if hp == 0 or wp == 0:
                continue
            planes.append(filt_plane(pack(
                np.ascontiguousarray(sub).reshape(hp, wp * unit)
                if depth >= 8 else np.ascontiguousarray(sub[:, :, 0]),
                hp, wp,
            )))
        plane_bytes = b"".join(p.tobytes() for p in planes)
    else:
        plane = filt_plane(pack(
            vals.reshape(height, width * unit) if depth >= 8
            else vals[:, :, 0],
            height, width,
        ))
        plane_bytes = plane.tobytes()
    ihdr = struct.pack(">IIBBBBB", width, height, depth, color_type,
                       0, 0, 1 if interlace else 0)
    out = PNG_MAGIC + _png_chunk(b"IHDR", ihdr)
    if color_type == 3:
        out += _png_chunk(b"PLTE", palette)
    return (
        out
        + _png_chunk(b"IDAT", zlib.compress(plane_bytes, 6))
        + _png_chunk(b"IEND", b"")
    )


# ------------------------------------------------------- Spark plumbing


def normalize_assets(assets: DataFrame) -> DataFrame:
    """ASSET_SCHEMA → ASSET_SCHEMA with WAV and PNG rows decoded to the
    raw shapes the perceptual operators consume; every other row passes
    through byte-identical. Detection is by MAGIC BYTES, never crawl
    metadata (which lies). Decoded rows get:

    - WAV → kind=audio, data=PCM payload, metadata format=pcm_s16le +
      sample_rate/channels (+container=wav); stereo stays stereo — the
      mono projection (`asset_pcm_frames`) owns that policy.
    - PNG → kind=image, data=raw pixels, metadata format=raw +
      width/height/channels (+container=png).
    - JPEG (baseline SOF0 + progressive SOF2, `sources/jpeg.py`) →
      kind=image, data=raw pixels, same metadata shape
      (+container=jpeg); arithmetic/unsupported JPEGs pass through
      byte-identical.
    - TIFF (`sources/tiff.py` — the scanner archive format; CCITT/
      LZW/PackBits/JPEG strips) → kind=image, data=page-0 raw pixels,
      same metadata shape (+container=tiff, +pages=N so multi-page
      scans are discoverable; `extract_tiff_pages` owns page fan-out).
    - GIF (`sources/gif.py`) → a single frame decodes like the other
      image containers (all-gray palettes collapse to one channel);
      an ANIMATED gray GIF becomes kind=video with the concatenated
      frame buffers + n_frames — the exact raw-video shape the q155
      aligned near-dup stack samples (+container=gif).
    - BMP (`sources/bmp.py` — legacy Windows rasters; 1/4/8-bit
      palette, 24/32-bit BGR, RLE8) → kind=image, same metadata shape
      (+container=bmp).

    Per-asset decode, zero cross-row state → one Arrow-batched
    mapInPandas pass; partitioning, pushdown and every downstream
    operator shape are untouched."""
    import pandas as pd

    from ocr_vector_db_spark.sources.bmp import BMP_MAGIC, decode_bmp
    from ocr_vector_db_spark.sources.gif import (
        GIF_MAGICS,
        decode_gif_asset,
    )
    from ocr_vector_db_spark.sources.jpeg import JPEG_MAGIC, decode_jpeg
    from ocr_vector_db_spark.sources.multimodal import ASSET_SCHEMA
    from ocr_vector_db_spark.sources.tiff import (
        TIFF_MAGIC_BE,
        TIFF_MAGIC_LE,
        decode_tiff,
        n_tiff_pages,
    )

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            kinds, datas, metas = [], [], []
            for kind, data, meta in zip(
                pdf["kind"], pdf["data"], pdf["metadata"]
            ):
                raw = bytes(data) if data is not None else b""
                meta = dict(meta) if meta is not None else {}
                if raw.startswith(WAV_MAGIC):
                    dec = decode_wav(raw)
                    if dec is not None:
                        kind = "audio"
                        raw = dec["pcm"]
                        meta.update(
                            format="pcm_s16le",
                            sample_rate=str(dec["sample_rate"]),
                            channels=str(dec["channels"]),
                            container="wav",
                        )
                elif raw.startswith(PNG_MAGIC) or raw.startswith(
                    JPEG_MAGIC
                ) or raw.startswith(TIFF_MAGIC_LE) or raw.startswith(
                    TIFF_MAGIC_BE
                ) or raw.startswith(BMP_MAGIC):
                    if raw.startswith(PNG_MAGIC):
                        container = "png"
                        dec = decode_png(raw)
                    elif raw.startswith(JPEG_MAGIC):
                        container = "jpeg"
                        dec = decode_jpeg(raw)
                    elif raw.startswith(BMP_MAGIC):
                        container = "bmp"
                        dec = decode_bmp(raw)
                    else:
                        container = "tiff"
                        dec = decode_tiff(raw)
                    if dec is not None:
                        if container == "tiff":
                            meta["pages"] = str(n_tiff_pages(raw))
                        kind = "image"
                        raw = dec["raw"]
                        meta.update(
                            format="raw",
                            width=str(dec["width"]),
                            height=str(dec["height"]),
                            channels=str(dec["channels"]),
                            container=container,
                        )
                elif raw[:6] in GIF_MAGICS:
                    dec = decode_gif_asset(raw)
                    if dec is not None:
                        kind = dec["kind"]  # image, or video if an
                        raw = dec["raw"]    # animated gray GIF
                        meta.update(
                            format="raw",
                            width=str(dec["width"]),
                            height=str(dec["height"]),
                            channels=str(dec["channels"]),
                            n_frames=str(dec["n_frames"]),
                            container="gif",
                        )
                        if kind == "video":
                            meta.setdefault("fps", "1")
                kinds.append(kind)
                datas.append(raw)
                metas.append(meta)
            yield pd.DataFrame({
                "asset_id": pdf["asset_id"],
                "kind": kinds,
                "data": datas,
                "metadata": metas,
            })

    return assets.mapInPandas(run, ASSET_SCHEMA)


def normalize_clip_rows(df: DataFrame, data_col: str = "data") -> DataFrame:
    """`normalize_assets` for the SLIM audio-clip row shape the streaming
    gate consumes (id, data, ...): 16-bit WAV payloads (magic-byte
    detected) are replaced by their raw PCM bytes, with multichannel
    payloads downmixed to mono (exact integer average,
    `downmix_pcm16_bytes`) so a STEREO re-encode arriving on the stream
    also dedups perceptually against an indexed mono clip; every other
    row passes through unchanged. Same Arrow-batched per-asset grain;
    works on streaming DataFrames (mapInPandas is
    streaming-compatible)."""
    import pandas as pd

    from ocr_vector_db_spark.operators.audio_fingerprint import (
        downmix_pcm16_bytes,
    )

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            out = []
            for data in pdf[data_col]:
                raw = bytes(data) if data is not None else data
                if raw is not None and raw.startswith(WAV_MAGIC):
                    dec = decode_wav(raw)
                    if dec is not None:
                        raw = dec["pcm"]
                        if dec["channels"] > 1:
                            raw = downmix_pcm16_bytes(
                                raw, dec["channels"]
                            )
                out.append(raw)
            pdf = pdf.copy()
            pdf[data_col] = out
            yield pdf

    return df.mapInPandas(run, df.schema)


def normalize_frame_rows(df: DataFrame, data_col: str = "data") -> DataFrame:
    """`normalize_assets` for the SLIM raster row shape the streaming
    gate consumes (id, data, width, height[, channels]): PNG, JPEG
    (baseline + progressive), TIFF, GIF (first frame) and BMP payloads
    are replaced by their raw pixels with
    width/height (and channels, when the column rides along)
    overwritten from the container header — a container row's declared
    dims are untrusted. RGB decodes are kept only when a `channels`
    column exists to carry 3 (the gray-only shape would otherwise
    mis-read an RGB buffer as gray); everything undecodable passes
    through unchanged."""
    import pandas as pd

    from ocr_vector_db_spark.sources.bmp import BMP_MAGIC, decode_bmp
    from ocr_vector_db_spark.sources.gif import GIF_MAGICS, decode_gif
    from ocr_vector_db_spark.sources.jpeg import JPEG_MAGIC, decode_jpeg
    from ocr_vector_db_spark.sources.tiff import (
        TIFF_MAGIC_BE,
        TIFF_MAGIC_LE,
        decode_tiff,
    )

    has_ch = "channels" in df.columns

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            pdf = pdf.copy()
            datas = list(pdf[data_col])
            ws = list(pdf["width"])
            hs = list(pdf["height"])
            chs = list(pdf["channels"]) if has_ch else None
            for i, data in enumerate(datas):
                raw = bytes(data) if data is not None else None
                if raw is None:
                    continue
                if raw.startswith(PNG_MAGIC):
                    dec = decode_png(raw)
                elif raw.startswith(JPEG_MAGIC):
                    dec = decode_jpeg(raw)
                elif raw.startswith(TIFF_MAGIC_LE) or raw.startswith(
                        TIFF_MAGIC_BE):
                    dec = decode_tiff(raw)
                elif raw[:6] in GIF_MAGICS:
                    dec = decode_gif(raw)  # first frame (slim raster
                elif raw.startswith(BMP_MAGIC):  # rows: single-image)
                    dec = decode_bmp(raw)
                else:
                    continue
                if dec is None or (dec["channels"] == 3 and not has_ch):
                    continue
                datas[i] = dec["raw"]
                ws[i] = dec["width"]
                hs[i] = dec["height"]
                if has_ch:
                    chs[i] = dec["channels"]
            pdf[data_col] = datas
            pdf["width"] = ws
            pdf["height"] = hs
            if has_ch:
                pdf["channels"] = chs
            yield pdf

    return df.mapInPandas(run, df.schema)


def normalize_video_rows(df: DataFrame, data_col: str = "data") -> DataFrame:
    """`normalize_assets` for the SLIM video row shape the streaming
    gate consumes (id, data, width, height, n_frames): ANIMATED gray
    GIF payloads (magic-byte detected) are replaced by their
    concatenated raw frame buffers with width/height/n_frames
    OVERWRITTEN from the container — declared dims are untrusted — so
    a GIF re-encode of an indexed clip arriving on the video stream
    dedups perceptually through the aligned frame gate instead of
    falling to the exact-byte path. Single-frame or color GIFs (no
    gray-video shape to offer) and everything undecodable pass through
    unchanged. Same Arrow-batched per-asset grain,
    streaming-compatible."""
    import pandas as pd

    from ocr_vector_db_spark.sources.gif import (
        GIF_MAGICS,
        decode_gif_asset,
    )

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            pdf = pdf.copy()
            datas = list(pdf[data_col])
            ws = list(pdf["width"])
            hs = list(pdf["height"])
            nfs = list(pdf["n_frames"])
            for i, data in enumerate(datas):
                raw = bytes(data) if data is not None else None
                if raw is None or raw[:6] not in GIF_MAGICS:
                    continue
                dec = decode_gif_asset(raw)
                if dec is None or dec["kind"] != "video":
                    continue
                datas[i] = dec["raw"]
                ws[i] = dec["width"]
                hs[i] = dec["height"]
                nfs[i] = dec["n_frames"]
            pdf[data_col] = datas
            pdf["width"] = ws
            pdf["height"] = hs
            pdf["n_frames"] = nfs
            yield pdf

    return df.mapInPandas(run, df.schema)


def explode_tiff_pages(assets: DataFrame,
                       max_pages: int = 64) -> DataFrame:
    """ASSET_SCHEMA rows carrying multi-page TIFFs → one ASSET_SCHEMA
    row PER DECODABLE PAGE (`asset_id#p{i}`, kind=image, raw pixels,
    page/pages metadata); every non-TIFF row passes through unchanged.

    Complements `normalize_assets`, which rewrites a TIFF row to its
    page-0 pixels: a scanned 40-page fax archive becomes 40 separately
    dedupable page assets here, each feeding the q150 perceptual stack
    on its own — the scanner-archive sibling of the PDF image
    extraction. mapInPandas legitimately changes cardinality, so the
    fan-out stays one Arrow-batched per-asset pass with zero cross-row
    state; undecodable pages are skipped (partial archives still index
    their good pages)."""
    import pandas as pd

    from ocr_vector_db_spark.sources.multimodal import ASSET_SCHEMA
    from ocr_vector_db_spark.sources.tiff import (
        TIFF_MAGIC_BE,
        TIFF_MAGIC_LE,
        extract_tiff_pages,
    )

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            ids, kinds, datas, metas = [], [], [], []
            for aid, kind, data, meta in zip(
                pdf["asset_id"], pdf["kind"], pdf["data"],
                pdf["metadata"]
            ):
                raw = bytes(data) if data is not None else b""
                meta = dict(meta) if meta is not None else {}
                if not (raw.startswith(TIFF_MAGIC_LE)
                        or raw.startswith(TIFF_MAGIC_BE)):
                    ids.append(aid)
                    kinds.append(kind)
                    datas.append(raw)
                    metas.append(meta)
                    continue
                pages = extract_tiff_pages(raw, max_pages=max_pages)
                if not pages:  # corrupt TIFF: exact-hash path owns it
                    ids.append(aid)
                    kinds.append(kind)
                    datas.append(raw)
                    metas.append(meta)
                    continue
                for pg in pages:
                    ids.append(f"{aid}#p{pg['page']}")
                    kinds.append("image")
                    datas.append(pg["data"])
                    metas.append({**meta, **pg["metadata"]})
            yield pd.DataFrame({
                "asset_id": ids,
                "kind": kinds,
                "data": datas,
                "metadata": metas,
            })

    return assets.mapInPandas(run, ASSET_SCHEMA)
