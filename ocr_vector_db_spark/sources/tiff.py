"""TIFF container decode for the multimodal stack — the scanner format.

TIFF is THE archival format of scanned-document pipelines (multi-page
fax/scanner output), i.e. exactly the corpus the reference's OCR domain
ingests. Structurally it is an IFD tag walk over strips whose payloads
use codecs this repo ALREADY owns: CCITT G3/G4 (`sources/ccitt.py`,
compressions 2/3/4), MSB-first early-change LZW (`sources/
pdf_decode.py` — the PDF §7.4.4.2 variant with EarlyChange=1 is
bit-identical to TIFF 6.0 §13 LZW), baseline/progressive JPEG
(`sources/jpeg.py`, compression 7 incl. the JPEGTables splice), plus
trivial PackBits RLE added here. So this module is wiring + the strip/
bit-layout math, not new codec work.

Supported: both byte orders (II/MM); bilevel (1-bit raw, CCITT RLE/
G3 1D+2D/G4, PackBits) with FillOrder 2 bit reversal; 8-bit gray, RGB
and palette; 16-bit gray/RGB reduced to the high byte (the PNG/WAV
convention); LZW with horizontal-differencing predictor 2; PackBits;
JPEG-in-TIFF (single strip, with or without a shared JPEGTables tag);
multi-strip assembly; multi-page IFD chains (`extract_tiff_pages`,
cycle-guarded). Everything else — tiles, planar config 2, alpha,
floating-point samples, old-style JPEG (6) — returns None and the
asset passes through byte-identical to the exact-hash path, the same
posture as every other container.

Scale shape: per-asset decode with zero cross-row state, wired through
the same Arrow-batched `normalize_assets` mapInPandas grain. The
per-pixel work is numpy (bit unpack, LUTs, cumsum predictor) or the
already-measured codecs; nothing here loops per pixel in Python.
Reference parity: none — the reference hands scans to an external OCR
service; this is the multimodal brief's decode step for the scanner
archive format. Fixture writer: `encode_tiff` / `encode_tiff_pages`.
"""

from __future__ import annotations

import struct

TIFF_MAGIC_LE = b"II*\x00"
TIFF_MAGIC_BE = b"MM\x00*"
MAX_PIXELS = 64 * 1024 * 1024  # same posture as PNG/JPEG
MAX_PAGES = 64

_REVBITS = bytes(int(f"{b:08b}"[::-1], 2) for b in range(256))


class _TiffError(Exception):
    """Internal: malformed/unsupported file → decode_tiff returns None."""


# ------------------------------------------------------------ PackBits


def packbits_decode(data: bytes, expect: int | None = None) -> bytes:
    """TIFF 6.0 §9 PackBits RLE → bytes (stops early at `expect`)."""
    out = bytearray()
    i = 0
    n = len(data)
    while i < n and (expect is None or len(out) < expect):
        c = data[i]
        i += 1
        if c < 128:  # literal run of c+1 bytes
            if i + c + 1 > n:
                raise _TiffError("truncated PackBits literal")
            out += data[i:i + c + 1]
            i += c + 1
        elif c > 128:  # repeat next byte 257-c times
            if i >= n:
                raise _TiffError("truncated PackBits repeat")
            out += bytes((data[i],)) * (257 - c)
            i += 1
        # c == 128: no-op
    return bytes(out)


def packbits_encode(data: bytes) -> bytes:
    """Greedy PackBits writer (runs ≥ 3 become repeat packets)."""
    out = bytearray()
    i = 0
    n = len(data)
    while i < n:
        run = 1
        while i + run < n and run < 128 and data[i + run] == data[i]:
            run += 1
        if run >= 3:
            out += bytes((257 - run, data[i]))
            i += run
            continue
        lit = i
        while i < n and i - lit < 128:
            run = 1
            while i + run < n and run < 3 and data[i + run] == data[i]:
                run += 1
            if run >= 3 and i + run <= n:
                break
            i += 1
        out += bytes((i - lit - 1,)) + data[lit:i]
    return bytes(out)


# -------------------------------------------------------------- decode


_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 6: 1, 7: 1, 8: 2, 9: 4}
_TYPE_FMT = {1: "B", 2: "B", 3: "H", 4: "I", 6: "b", 7: "B",
             8: "h", 9: "i"}


def _parse_ifds(data: bytes):
    if data[:4] == TIFF_MAGIC_LE:
        en = "<"
    elif data[:4] == TIFF_MAGIC_BE:
        en = ">"
    else:
        raise _TiffError("not a TIFF")
    (off,) = struct.unpack_from(en + "I", data, 4)
    ifds = []
    seen = set()
    while off and off not in seen and len(ifds) < MAX_PAGES:
        seen.add(off)
        if off + 2 > len(data):
            raise _TiffError("truncated IFD")
        (cnt,) = struct.unpack_from(en + "H", data, off)
        if off + 2 + cnt * 12 + 4 > len(data):
            raise _TiffError("truncated IFD entries")
        tags = {}
        for k in range(cnt):
            tag, typ, num = struct.unpack_from(en + "HHI", data,
                                               off + 2 + 12 * k)
            tags[tag] = (typ, num, off + 2 + 12 * k + 8)
        (off,) = struct.unpack_from(en + "I", data, off + 2 + cnt * 12)
        ifds.append(tags)
    if not ifds:
        raise _TiffError("no IFD")
    return en, ifds


def _values(data: bytes, en: str, entry) -> list[int]:
    typ, cnt, vo = entry
    size = _TYPE_SIZE.get(typ)
    if size is None or cnt > 1 << 20:
        raise _TiffError("bad tag type/count")
    total = size * cnt
    if total > 4:
        (src,) = struct.unpack_from(en + "I", data, vo)
    else:
        src = vo
    if src + total > len(data):
        raise _TiffError("tag value out of bounds")
    return list(struct.unpack_from(en + str(cnt) + _TYPE_FMT[typ],
                                   data, src))


def _tag_bytes(data: bytes, en: str, entry) -> bytes:
    typ, cnt, vo = entry
    size = _TYPE_SIZE.get(typ, 1) * cnt
    src = struct.unpack_from(en + "I", data, vo)[0] if size > 4 else vo
    if src + size > len(data):
        raise _TiffError("tag bytes out of bounds")
    return data[src:src + size]


def _decode_page(np, data: bytes, en: str, tags) -> dict:
    def g(tag, default=None):
        return _values(data, en, tags[tag]) if tag in tags else default

    width = (g(256) or [0])[0]
    height = (g(257) or [0])[0]
    if width < 1 or height < 1 or width * height > MAX_PIXELS:
        raise _TiffError("bad geometry")
    comp = (g(259) or [1])[0]
    photo = (g(262) or [1])[0]
    spp = (g(277) or [1])[0]
    bps = g(258) or [1] * spp
    planar = (g(284) or [1])[0]
    fill = (g(266) or [1])[0]
    pred = (g(317) or [1])[0]
    rps = (g(278) or [height])[0] or height
    offs, cnts = g(273), g(279)
    if offs is None or cnts is None or len(offs) != len(cnts):
        raise _TiffError("missing strip layout")
    if planar != 1 or spp not in (1, 3) or len(bps) != spp \
            or len(set(bps)) != 1:
        raise _TiffError("unsupported sample layout")
    nstrips = -(-height // rps)
    if len(offs) != nstrips:
        raise _TiffError("strip count mismatch")
    strips = []
    for o, c in zip(offs, cnts):
        if o + c > len(data):
            raise _TiffError("strip out of bounds")
        strips.append(data[o:o + c])
    if fill == 2:
        if comp in (5, 7, 32773):
            raise _TiffError("FillOrder 2 outside bit codecs")
        strips = [bytes(_REVBITS[b] for b in s) for s in strips]
    elif fill != 1:
        raise _TiffError("bad FillOrder")

    bit = bps[0]
    if comp == 7:  # JPEG-in-TIFF: whole image in one strip
        from ocr_vector_db_spark.sources.jpeg import decode_jpeg

        if len(strips) != 1 or bit != 8:
            raise _TiffError("multi-strip JPEG unsupported")
        stream = strips[0]
        if 347 in tags:  # shared tables: SOI+tables+EOI ++ SOI+frame
            jt = _tag_bytes(data, en, tags[347])
            if len(jt) > 4 and jt[:2] == b"\xff\xd8":
                stream = jt[:-2] + stream[2:]
        dec = decode_jpeg(stream)
        if dec is None or dec["width"] != width \
                or dec["height"] != height:
            raise _TiffError("JPEG strip decode failed")
        return dec

    if bit == 1 and spp == 1:  # bilevel
        rows = bytearray()
        for si, strip in enumerate(strips):
            srows = min(rps, height - si * rps)
            if comp in (2, 3, 4):
                from ocr_vector_db_spark.sources.ccitt import (
                    CCITTError,
                    decode_g3,
                    decode_g4,
                )

                try:
                    if comp == 4:
                        px = decode_g4(strip, width, rows=srows)
                    elif comp == 2:  # CCITT RLE: 1-D, byte-aligned rows
                        px = decode_g3(strip, width, rows=srows, k=0,
                                       byte_align=True)
                    else:
                        t4 = (g(292) or [0])[0]
                        px = decode_g3(strip, width, rows=srows,
                                       k=(4 if t4 & 1 else 0),
                                       byte_align=bool(t4 & 4))
                except CCITTError as exc:
                    raise _TiffError(f"CCITT strip: {exc}") from exc
                if len(px) < srows * width:
                    raise _TiffError("short CCITT strip")
                rows += px[:srows * width]
            else:
                if comp == 32773:
                    strip = packbits_decode(
                        strip, expect=srows * ((width + 7) // 8))
                elif comp != 1:
                    raise _TiffError("unsupported bilevel compression")
                rowbytes = (width + 7) // 8
                if len(strip) < srows * rowbytes:
                    raise _TiffError("short bilevel strip")
                arr = np.frombuffer(
                    strip[:srows * rowbytes], np.uint8
                ).reshape(srows, rowbytes)
                bits = np.unpackbits(arr, axis=1)[:, :width]
                rows += bits.tobytes()
        px = np.frombuffer(bytes(rows), np.uint8)
        # CCITT codes ink=1; raw bilevel photometric 0 stores white=0.
        # Either way "1" is ink for photo 0 and paper for photo 1.
        gray = (1 - px) * 255 if photo == 0 else px * 255
        return {"raw": gray.astype(np.uint8).tobytes(), "width": width,
                "height": height, "channels": 1}

    if bit not in (8, 16):
        raise _TiffError("unsupported bit depth")
    bw = bit // 8
    out = bytearray()
    for si, strip in enumerate(strips):
        srows = min(rps, height - si * rps)
        expect = srows * width * spp * bw
        if comp == 5:
            from ocr_vector_db_spark.sources.pdf_decode import _lzw_decode

            raw = _lzw_decode(strip)
            if raw is None:
                raise _TiffError("bad LZW strip")
        elif comp == 32773:
            raw = packbits_decode(strip, expect=expect)
        elif comp == 1:
            raw = strip
        else:
            raise _TiffError("unsupported compression")
        if len(raw) < expect:
            raise _TiffError("short strip")
        raw = raw[:expect]
        if pred == 2:  # horizontal differencing, per row per channel
            a = np.frombuffer(raw, np.uint8).reshape(
                srows, width, spp * bw).astype(np.uint8)
            a = np.cumsum(a, axis=1, dtype=np.uint64).astype(np.uint8)
            raw = a.tobytes()
        elif pred != 1:
            raise _TiffError("unsupported predictor")
        out += raw
    arr = np.frombuffer(bytes(out), np.uint8)
    if bit == 16:  # reduce to the high byte (PNG/WAV convention)
        arr = arr.reshape(-1, 2)[:, 0 if en == ">" else 1]
    arr = arr.reshape(height, width, spp)

    if photo == 3:  # palette → RGB through the 16-bit ColorMap
        if spp != 1 or 320 not in tags:
            raise _TiffError("bad palette layout")
        cmap = g(320)
        if len(cmap) != 3 * (1 << bit):
            raise _TiffError("bad ColorMap size")
        lut = (np.array(cmap, np.uint32).reshape(3, -1).T >> 8).astype(
            np.uint8)
        rgb = lut[arr[:, :, 0]]
        return {"raw": rgb.tobytes(), "width": width, "height": height,
                "channels": 3}
    if photo == 0 and spp == 1:
        arr = 255 - arr
    elif photo not in (1, 2):
        raise _TiffError("unsupported photometric")
    if photo == 2 and spp != 3:
        raise _TiffError("RGB needs 3 samples")
    return {"raw": arr.tobytes(), "width": width, "height": height,
            "channels": spp}


def decode_tiff(data: bytes, page: int = 0) -> dict | None:
    """TIFF → {'raw': bytes, 'width', 'height', 'channels'} for the
    requested page; None for anything this module does not own."""
    import numpy as np

    if not (data.startswith(TIFF_MAGIC_LE)
            or data.startswith(TIFF_MAGIC_BE)):
        return None
    try:
        en, ifds = _parse_ifds(data)
        if not 0 <= page < len(ifds):
            return None
        return _decode_page(np, data, en, ifds[page])
    except (_TiffError, struct.error, IndexError, ValueError):
        return None


def n_tiff_pages(data: bytes) -> int:
    """IFD-chain length (0 for non-TIFF/corrupt) — cheap page count for
    metadata without decoding any strip."""
    try:
        return len(_parse_ifds(data)[1])
    except (_TiffError, struct.error, IndexError):
        return 0


def extract_tiff_pages(data: bytes, max_pages: int = MAX_PAGES) -> list:
    """All decodable pages of a (multi-page) TIFF as asset dicts:
    [{'page': i, 'data': raw, 'metadata': {...}}] — the scanner-archive
    sibling of `pdf_decode.extract_pdf_images`. Undecodable pages are
    skipped (partial archives still index their good pages)."""
    import numpy as np

    if not (data.startswith(TIFF_MAGIC_LE)
            or data.startswith(TIFF_MAGIC_BE)):
        return []
    try:
        en, ifds = _parse_ifds(data)
    except (_TiffError, struct.error):
        return []
    out = []
    for i, tags in enumerate(ifds[:max_pages]):
        try:
            dec = _decode_page(np, data, en, tags)
        except (_TiffError, struct.error, IndexError, ValueError):
            continue
        out.append({
            "page": i,
            "kind": "image",
            "data": dec["raw"],
            "metadata": {
                "format": "raw",
                "container": "tiff",
                "page": str(i),
                "pages": str(len(ifds)),
                "width": str(dec["width"]),
                "height": str(dec["height"]),
                "channels": str(dec["channels"]),
            },
        })
    return out


# -------------------------------------------------------------- encode


def _pack_ifd(en, entries, ifd_off):
    """Entries [(tag, type, values)] → (ifd_bytes_before_nextptr,
    extra_values_blob); arrays wider than 4 bytes land in the blob."""
    body = struct.pack(en + "H", len(entries))
    extra = bytearray()
    extra_base = ifd_off + 2 + 12 * len(entries) + 4
    for tag, typ, vals in sorted(entries):
        fmt = _TYPE_FMT[typ]
        payload = struct.pack(en + str(len(vals)) + fmt, *vals)
        head = struct.pack(en + "HHI", tag, typ, len(vals))
        if len(payload) <= 4:
            body += head + payload.ljust(4, b"\x00")
        else:
            body += head + struct.pack(en + "I",
                                       extra_base + len(extra))
            extra += payload
            if len(extra) & 1:
                extra += b"\x00"
    return body, bytes(extra)


def encode_tiff_pages(pages: list[dict], compression: str = "none",
                      rows_per_strip: int | None = None,
                      quality: int = 90) -> bytes:
    """Multi-page TIFF writer (fixture/export twin of `decode_tiff`).
    Each page: {'raw': bytes, 'width', 'height', 'channels'} with
    channels 1 (gray — bilevel for the CCITT compressions, threshold
    128) or 3 (RGB). compression: none | packbits | lzw | g3 | g4 |
    jpeg. Little-endian, chunky, photometric 1/2 (0 for CCITT)."""
    comp_tag = {"none": 1, "packbits": 32773, "lzw": 5, "g3": 3,
                "g4": 4, "jpeg": 7}[compression]
    en = "<"
    out = bytearray(TIFF_MAGIC_LE + struct.pack(en + "I", 8))
    prev_next_ptr = 4  # header offset holding the first IFD pointer
    for pg in pages:
        raw, width, height = pg["raw"], pg["width"], pg["height"]
        spp = pg.get("channels", 1)
        if len(raw) != width * height * spp:
            raise ValueError("raw length != width*height*channels")
        rps = rows_per_strip or height
        if comp_tag == 7:
            rps = height  # single strip carries the whole JPEG
        strips = []
        bilevel = comp_tag in (3, 4)
        if bilevel and spp != 1:
            raise ValueError("CCITT compressions need gray input")
        for y0 in range(0, height, rps):
            srows = min(rps, height - y0)
            seg = raw[y0 * width * spp:(y0 + srows) * width * spp]
            if bilevel:
                from ocr_vector_db_spark.sources.ccitt import (
                    encode_g3,
                    encode_g4,
                )

                ink = bytes(1 if b < 128 else 0 for b in seg)
                strips.append(
                    encode_g4(ink, width, srows) if comp_tag == 4
                    else encode_g3(ink, width, srows, k=0))
            elif comp_tag == 32773:
                strips.append(packbits_encode(seg))
            elif comp_tag == 5:
                from ocr_vector_db_spark.sources.pdf_decode import (
                    lzw_encode,
                )

                strips.append(lzw_encode(seg))
            elif comp_tag == 7:
                from ocr_vector_db_spark.sources.jpeg import encode_jpeg

                strips.append(encode_jpeg(seg, width, srows, spp,
                                          quality=quality))
            else:
                strips.append(seg)
        offs, cnts = [], []
        for s in strips:
            if len(out) & 1:
                out += b"\x00"
            offs.append(len(out))
            cnts.append(len(s))
            out += s
        if len(out) & 1:
            out += b"\x00"
        photo = 0 if bilevel else (2 if spp == 3 else 1)
        if comp_tag == 7:
            photo = 2 if spp == 3 else 1  # JPEG strips decode upright
        entries = [
            (256, 4, [width]), (257, 4, [height]),
            (258, 3, [1] * spp if bilevel else [8] * spp),
            (259, 3, [comp_tag]), (262, 3, [photo]),
            (273, 4, offs), (277, 3, [spp]), (278, 4, [rps]),
            (279, 4, cnts),
        ]
        ifd_off = len(out)
        body, extra = _pack_ifd(en, entries, ifd_off)
        struct.pack_into(en + "I", out, prev_next_ptr, ifd_off)
        prev_next_ptr = ifd_off + len(body)
        out += body + struct.pack(en + "I", 0) + extra
    return bytes(out)


def encode_tiff(raw: bytes, width: int, height: int, channels: int = 1,
                compression: str = "none",
                rows_per_strip: int | None = None,
                quality: int = 90) -> bytes:
    """Single-page convenience wrapper over `encode_tiff_pages`."""
    return encode_tiff_pages(
        [{"raw": raw, "width": width, "height": height,
          "channels": channels}],
        compression=compression, rows_per_strip=rows_per_strip,
        quality=quality)
