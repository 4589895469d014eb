"""BMP/DIB container decode — the legacy Windows raster.

Rounds out the crawl-image container matrix (PNG/JPEG/TIFF/GIF have
golden queries q156-q159; BMP is the long-tail legacy format, pinned
by unit tests + byte-exact javax.imageio parity instead of its own
driver golden to hold the query-window load). Pure structure: file
header, any BITMAPINFOHEADER-family DIB header (size ≥ 40; the core
fields sit at fixed offsets), bottom-up or top-down rows padded to 4
bytes, BI_RGB at 1/4/8-bit (palette, BGRX quads) and 24/32-bit
(BGR/BGRX), plus BI_RLE8 runs (encoded/absolute/EOL/EOD/delta).
All-gray palettes collapse to one channel (the PNG precedent).
16-bit / BI_BITFIELDS / embedded PNG-JPEG (BI_PNG/BI_JPEG) return
None → byte-identical passthrough.

Scale shape: per-asset decode with zero cross-row state on the same
Arrow-batched `normalize_assets` grain; per-pixel work is numpy (bit
unpack, palette LUT, row flip). Reference parity: none — the
reference ingests PDF/text/markdown only. Fixture writer:
`encode_bmp` (8-bit palette gray or 24-bit BGR, optional RLE8).
"""

from __future__ import annotations

import struct

BMP_MAGIC = b"BM"
MAX_PIXELS = 64 * 1024 * 1024


class _BmpError(Exception):
    """Internal: malformed/unsupported file → decode_bmp returns None."""


def _rle8_decode(data: bytes, width: int, height: int) -> bytes:
    """BI_RLE8 → row-major (bottom-up) index bytes, width*height."""
    import numpy as np

    out = np.zeros((height, width), np.uint8)
    x = y = 0
    i = 0
    n = len(data)
    while i + 1 < n:
        cnt, val = data[i], data[i + 1]
        i += 2
        if cnt:  # encoded run
            if y >= height:
                raise _BmpError("RLE run outside bitmap")
            end = min(x + cnt, width)
            out[y, x:end] = val
            x = end
            continue
        if val == 0:  # end of line
            x, y = 0, y + 1
        elif val == 1:  # end of data
            return out.tobytes()
        elif val == 2:  # delta
            if i + 2 > n:
                raise _BmpError("truncated RLE delta")
            x += data[i]
            y += data[i + 1]
            i += 2
            if x > width or y > height:
                raise _BmpError("RLE delta outside bitmap")
        else:  # absolute mode: val literal bytes, word-aligned
            if i + val > n or y >= height:
                raise _BmpError("truncated RLE absolute run")
            end = min(x + val, width)
            out[y, x:end] = np.frombuffer(
                data[i:i + (end - x)], np.uint8)
            x = end
            i += val + (val & 1)
    return out.tobytes()  # missing EOD tolerated


def decode_bmp(data: bytes) -> dict | None:
    """BMP → {'raw': bytes, 'width', 'height', 'channels'} (gray when
    the palette is all-gray, else RGB); None for anything this module
    does not own."""
    import numpy as np

    if not data.startswith(BMP_MAGIC) or len(data) < 54:
        return None
    try:
        (pix_off,) = struct.unpack_from("<I", data, 10)
        (hdr_size,) = struct.unpack_from("<I", data, 14)
        if hdr_size < 40:
            return None  # BITMAPCOREHEADER: long-dead, passthrough
        width, height = struct.unpack_from("<ii", data, 18)
        planes, bits = struct.unpack_from("<HH", data, 26)
        (comp,) = struct.unpack_from("<I", data, 30)
        (clr_used,) = struct.unpack_from("<I", data, 46)
        top_down = height < 0
        height = abs(height)
        if width < 1 or height < 1 or width * height > MAX_PIXELS \
                or planes != 1:
            return None
        if comp == 0 and bits in (1, 4, 8, 24, 32):
            pass
        elif comp == 1 and bits == 8:
            pass
        else:
            return None  # 16-bit/bitfields/RLE4/BI_JPEG/BI_PNG

        pal = None
        if bits <= 8:
            n_colors = clr_used or (1 << bits)
            if n_colors > 1 << bits:
                raise _BmpError("palette larger than depth")
            pal_off = 14 + hdr_size
            quads = np.frombuffer(
                data[pal_off:pal_off + 4 * n_colors], np.uint8)
            if quads.size < 4 * n_colors:
                raise _BmpError("truncated palette")
            pal = quads.reshape(-1, 4)[:, [2, 1, 0]]  # BGRX → RGB

        if comp == 1:
            idx = np.frombuffer(
                _rle8_decode(data[pix_off:], width, height), np.uint8
            ).reshape(height, width)
            if not top_down:
                idx = idx[::-1]
            rows = idx
        else:
            stride = ((width * bits + 31) // 32) * 4
            body = data[pix_off:pix_off + stride * height]
            if len(body) < stride * height:
                raise _BmpError("truncated pixel data")
            arr = np.frombuffer(body, np.uint8).reshape(height, stride)
            if not top_down:
                arr = arr[::-1]
            if bits == 24:
                rgb = arr[:, :width * 3].reshape(
                    height, width, 3)[:, :, ::-1]
                return {"raw": np.ascontiguousarray(rgb).tobytes(),
                        "width": width, "height": height, "channels": 3}
            if bits == 32:
                rgb = arr[:, :width * 4].reshape(
                    height, width, 4)[:, :, [2, 1, 0]]
                return {"raw": np.ascontiguousarray(rgb).tobytes(),
                        "width": width, "height": height, "channels": 3}
            if bits == 8:
                rows = arr[:, :width]
            else:  # 1- or 4-bit: MSB-first packed
                unpacked = np.unpackbits(arr, axis=1)
                if bits == 4:
                    u = unpacked.reshape(height, -1, 4)
                    vals = (u[:, :, 0] * 8 + u[:, :, 1] * 4
                            + u[:, :, 2] * 2 + u[:, :, 3])
                    rows = vals[:, :width].astype(np.uint8)
                else:
                    rows = unpacked[:, :width]
        if rows.max(initial=0) >= len(pal):
            raise _BmpError("palette index out of range")
        rgb = pal[rows]
        if (rgb[:, :, 0] == rgb[:, :, 1]).all() \
                and (rgb[:, :, 1] == rgb[:, :, 2]).all():
            return {"raw": np.ascontiguousarray(
                        rgb[:, :, 0]).tobytes(),
                    "width": width, "height": height, "channels": 1}
        return {"raw": np.ascontiguousarray(rgb).tobytes(),
                "width": width, "height": height, "channels": 3}
    except (_BmpError, struct.error, IndexError, ValueError):
        return None


def encode_bmp(raw: bytes, width: int, height: int, channels: int = 1,
               rle: bool = False) -> bytes:
    """Fixture/export writer: gray → 8-bit palette BMP (optionally
    BI_RLE8), RGB → 24-bit BGR; bottom-up, 4-byte row padding."""
    import numpy as np

    if channels not in (1, 3):
        raise ValueError("channels must be 1 or 3")
    if len(raw) != width * height * channels:
        raise ValueError("raw length != width*height*channels")
    px = np.frombuffer(raw, np.uint8).reshape(height, width, channels)
    if channels == 3:
        if rle:
            raise ValueError("RLE8 needs 8-bit (gray) input")
        stride = ((width * 3 + 3) // 4) * 4
        body = np.zeros((height, stride), np.uint8)
        body[:, :width * 3] = px[::-1, :, ::-1].reshape(height, -1)
        pixels = body.tobytes()
        pal = b""
        bits = 24
        comp = 0
    else:
        pal = b"".join(bytes((v, v, v, 0)) for v in range(256))
        bits = 8
        rows = px[::-1, :, 0]
        if rle:
            comp = 1
            out = bytearray()
            for y in range(height):
                row = rows[y]
                x = 0
                while x < width:
                    run = 1
                    while (x + run < width and run < 255
                           and row[x + run] == row[x]):
                        run += 1
                    out += bytes((run, int(row[x])))
                    x += run
                out += b"\x00\x00"  # EOL
            out += b"\x00\x01"  # EOD
            pixels = bytes(out)
        else:
            comp = 0
            stride = ((width + 3) // 4) * 4
            body = np.zeros((height, stride), np.uint8)
            body[:, :width] = rows
            pixels = body.tobytes()
    pix_off = 14 + 40 + len(pal)
    info = struct.pack("<IiiHHIIiiII", 40, width, height, 1, bits,
                       comp, len(pixels), 2835, 2835,
                       256 if pal else 0, 0)
    hdr = (BMP_MAGIC
           + struct.pack("<IHHI", pix_off + len(pixels), 0, 0, pix_off))
    return hdr + info + pal + pixels
