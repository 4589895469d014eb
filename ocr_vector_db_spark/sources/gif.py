"""GIF container decode (87a/89a, static + animated) for the
multimodal stack.

GIF closes the crawl-image container matrix (PNG q156, JPEG q157,
TIFF q158): palette-indexed frames behind the LSB-first GIF variant of
LZW — variable minimum code size, clear/end codes at 2^mcs, code
widths 3..12 with NO early change, deferred-clear tolerated — plus
frame composition (disposal methods 0-3, transparency index,
interlaced row order). A static GIF decodes like the other containers
(first frame → raw pixels); an ANIMATED GIF is a video: `
extract_gif_frames` composes every frame onto the logical screen so
the video fingerprint stack (q155's aligned near-dup join) can dedup a
GIF re-encode of an indexed clip.

The palette is RGB; an all-gray palette collapses to one channel
(the PNG precedent), so a gray page re-encoded as GIF dedups at
Hamming 0 against its raw gray twin rather than forking into an RGB
signature family.

Scale shape: per-asset decode, zero cross-row state, wired through the
same Arrow-batched `normalize_assets` mapInPandas grain; the per-pixel
work is the LZW symbol loop (same order of cost as the PNG inflate)
plus numpy palette LUTs and interlace row scatter. Reference parity:
none — the reference ingests PDF/text/markdown only. Fixture writer:
`encode_gif` (static or animated, optional interlace, optional
per-frame local palettes).
"""

from __future__ import annotations

import struct

GIF_MAGICS = (b"GIF87a", b"GIF89a")
MAX_PIXELS = 64 * 1024 * 1024
MAX_FRAMES = 256


class _GifError(Exception):
    """Internal: malformed/unsupported stream → decode returns None."""


# ----------------------------------------------------------- GIF LZW


def gif_lzw_decode(data: bytes, mcs: int, expect: int) -> bytes:
    """GIF-variant LZW (LSB-first bit packing, clear=2^mcs, end=+1,
    widths mcs+1..12, no early change, deferred clear tolerated) →
    `expect` pixel-index bytes (extra output is trimmed, a clean early
    end is an error only if short)."""
    if not 2 <= mcs <= 11:
        raise _GifError("bad LZW min code size")
    clear = 1 << mcs
    end = clear + 1
    base = [bytes([i]) for i in range(clear)] + [b"", b""]
    table = list(base)
    width = mcs + 1
    prev = None
    out = bytearray()
    bitbuf = nbits = 0
    for byte in data:
        bitbuf |= byte << nbits
        nbits += 8
        while nbits >= width:
            code = bitbuf & ((1 << width) - 1)
            bitbuf >>= width
            nbits -= width
            if code == clear:
                table = list(base)
                width = mcs + 1
                prev = None
                continue
            if code == end:
                if len(out) < expect:
                    raise _GifError("short LZW stream")
                return bytes(out[:expect])
            if prev is None:
                if code >= len(table):
                    raise _GifError("bad first code")
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                if len(table) < 4096:
                    table.append(prev + entry[:1])
            elif code == len(table) and len(table) < 4096:
                entry = prev + prev[:1]
                table.append(entry)
            else:
                raise _GifError("code out of range")
            out += entry
            prev = entry
            if len(table) == (1 << width) and width < 12:
                width += 1
            if len(out) >= expect:
                return bytes(out[:expect])
    if len(out) < expect:
        raise _GifError("truncated LZW stream")
    return bytes(out[:expect])


def gif_lzw_encode(data: bytes, mcs: int) -> bytes:
    """Mirror of `gif_lzw_decode` (fixture writer): LSB-first, clear
    first, clear again when the table fills."""
    clear = 1 << mcs
    end = clear + 1
    codes: list[tuple[int, int]] = []
    table = {bytes([i]): i for i in range(clear)}
    next_code = clear + 2
    width = mcs + 1
    codes.append((clear, width))
    w = b""
    for ch in data:
        wc = w + bytes([ch])
        if wc in table:
            w = wc
            continue
        codes.append((table[w], width))
        table[wc] = next_code
        next_code += 1
        # decoder lags one entry: bump when ITS table (one smaller)
        # reaches 2^width, i.e. our next_code passes 2^width + 1
        if next_code == (1 << width) + 1 and width < 12:
            width += 1
        if next_code == 4096:  # table full → clear
            codes.append((clear, width))
            table = {bytes([i]): i for i in range(clear)}
            next_code = clear + 2
            width = mcs + 1
        w = bytes([ch])
    if w:
        codes.append((table[w], width))
    codes.append((end, width))
    out = bytearray()
    bitbuf = nbits = 0
    for code, wd in codes:
        bitbuf |= code << nbits
        nbits += wd
        while nbits >= 8:
            out.append(bitbuf & 0xFF)
            bitbuf >>= 8
            nbits -= 8
    if nbits:
        out.append(bitbuf & 0xFF)
    return bytes(out)


# -------------------------------------------------------------- decode


def _sub_blocks(data: bytes, o: int) -> tuple[bytes, int]:
    out = bytearray()
    n = len(data)
    while True:
        if o >= n:
            raise _GifError("unterminated sub-blocks")
        ln = data[o]
        o += 1
        if ln == 0:
            return bytes(out), o
        if o + ln > n:
            raise _GifError("truncated sub-block")
        out += data[o:o + ln]
        o += ln


_INTERLACE = ((0, 8), (4, 8), (2, 4), (1, 2))


def _parse_frames(np, data: bytes, max_frames: int):
    """→ (width, height, frames) where each frame is an RGB uint8
    canvas snapshot AFTER compositing that frame."""
    if data[:6] not in GIF_MAGICS:
        raise _GifError("not a GIF")
    if len(data) < 13:
        raise _GifError("truncated header")
    width, height = struct.unpack_from("<HH", data, 6)
    flags, bg = data[10], data[11]
    if width < 1 or height < 1 or width * height > MAX_PIXELS:
        raise _GifError("bad geometry")
    o = 13
    gct = None
    if flags & 0x80:
        sz = 2 << (flags & 7)
        gct = np.frombuffer(data[o:o + 3 * sz], np.uint8)
        if gct.size < 3 * sz:
            raise _GifError("truncated GCT")
        gct = gct.reshape(sz, 3)
        o += 3 * sz
    bg_rgb = (gct[bg] if gct is not None and bg < len(gct)
              else np.zeros(3, np.uint8))
    canvas = np.empty((height, width, 3), np.uint8)
    canvas[:] = bg_rgb
    frames = []
    transparent = None
    disposal = 0
    n = len(data)
    while o < n:
        b = data[o]
        o += 1
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension
            if o + 1 > n:
                raise _GifError("truncated extension")
            label = data[o]
            o += 1
            body, o = _sub_blocks(data, o)
            if label == 0xF9 and len(body) >= 4:  # graphic control
                disposal = (body[0] >> 2) & 7
                transparent = body[3] if body[0] & 1 else None
            continue
        if b != 0x2C:  # image descriptor
            raise _GifError("unknown block")
        if o + 9 > n:
            raise _GifError("truncated image descriptor")
        fx, fy, fw, fh = struct.unpack_from("<HHHH", data, o)
        iflags = data[o + 8]
        o += 9
        if fw < 1 or fh < 1 or fx + fw > width or fy + fh > height:
            raise _GifError("frame outside logical screen")
        pal = gct
        if iflags & 0x80:  # local color table
            sz = 2 << (iflags & 7)
            pal = np.frombuffer(data[o:o + 3 * sz], np.uint8)
            if pal.size < 3 * sz:
                raise _GifError("truncated LCT")
            pal = pal.reshape(sz, 3)
            o += 3 * sz
        if pal is None:
            raise _GifError("no color table")
        if o >= n:
            raise _GifError("missing LZW size")
        mcs = data[o]
        o += 1
        stream, o = _sub_blocks(data, o)
        idx = np.frombuffer(
            gif_lzw_decode(stream, mcs, fw * fh), np.uint8
        ).reshape(fh, fw)
        if iflags & 0x40:  # interlaced: scatter pass rows back
            deinter = np.empty_like(idx)
            src = 0
            for start, step in _INTERLACE:
                rows = range(start, fh, step)
                deinter[list(rows)] = idx[src:src + len(rows)]
                src += len(rows)
            idx = deinter
        if idx.max(initial=0) >= len(pal):
            raise _GifError("palette index out of range")
        before = canvas.copy() if disposal == 3 else None
        region = canvas[fy:fy + fh, fx:fx + fw]
        rgb = pal[idx]
        if transparent is not None:
            mask = (idx == transparent)[:, :, None]
            rgb = np.where(mask, region, rgb)
        canvas[fy:fy + fh, fx:fx + fw] = rgb
        frames.append(canvas.copy())
        if len(frames) >= max_frames:
            break
        # dispose AFTER snapshotting, ready for the next frame
        if disposal == 2:
            canvas[fy:fy + fh, fx:fx + fw] = bg_rgb
        elif disposal == 3 and before is not None:
            canvas = before
        disposal = 0
        transparent = None
    if not frames:
        raise _GifError("no frames")
    return width, height, frames


def _maybe_gray(np, rgb):
    """(H, W, 3) → (H, W) bytes when R==G==B everywhere (all-gray
    palettes collapse, the PNG precedent)."""
    if (rgb[:, :, 0] == rgb[:, :, 1]).all() \
            and (rgb[:, :, 1] == rgb[:, :, 2]).all():
        return rgb[:, :, 0], 1
    return rgb, 3


def decode_gif(data: bytes) -> dict | None:
    """GIF → {'raw', 'width', 'height', 'channels' (+'n_frames')} for
    the FIRST frame (composited); None for anything malformed."""
    import numpy as np

    if data[:6] not in GIF_MAGICS:
        return None
    try:
        width, height, frames = _parse_frames(np, data, MAX_FRAMES)
    except (_GifError, struct.error, IndexError, ValueError):
        return None
    out, ch = _maybe_gray(np, frames[0])
    return {"raw": out.tobytes(), "width": width, "height": height,
            "channels": ch, "n_frames": len(frames)}


def decode_gif_asset(data: bytes) -> dict | None:
    """One-parse asset-level decode for `normalize_assets`:

    - single frame → {'kind': 'image', 'raw', 'width', 'height',
      'channels', 'n_frames': 1}
    - ANIMATED with every frame all-gray → {'kind': 'video', 'raw' =
      n_frames gray buffers back to back, 'channels': 1, 'n_frames'} —
      exactly the raw-video shape `asset_video_frames` samples, so an
      animated GIF re-encode of an indexed clip dedups through the
      q155 aligned near-dup join.
    - animated with color frames → first frame as an image (the video
      stack is gray-frame; n_frames metadata keeps the animation
      discoverable).
    """
    import numpy as np

    if data[:6] not in GIF_MAGICS:
        return None
    try:
        width, height, frames = _parse_frames(np, data, MAX_FRAMES)
    except (_GifError, struct.error, IndexError, ValueError):
        return None
    grays = [_maybe_gray(np, f) for f in frames]
    if len(frames) > 1 and all(ch == 1 for _, ch in grays):
        return {"kind": "video",
                "raw": b"".join(g.tobytes() for g, _ in grays),
                "width": width, "height": height, "channels": 1,
                "n_frames": len(frames)}
    out, ch = grays[0]
    return {"kind": "image", "raw": out.tobytes(), "width": width,
            "height": height, "channels": ch,
            "n_frames": len(frames)}


def extract_gif_frames(data: bytes,
                       max_frames: int = MAX_FRAMES) -> list:
    """All composited frames of a (possibly animated) GIF as asset
    dicts [{'frame': i, 'data': raw, 'metadata': {...}}] — the
    animation sibling of `tiff.extract_tiff_pages`, shaped for the
    video fingerprint stack (every frame full-canvas, so frame_idx
    aligns across re-encodes)."""
    import numpy as np

    if data[:6] not in GIF_MAGICS:
        return []
    try:
        width, height, frames = _parse_frames(np, data, max_frames)
    except (_GifError, struct.error, IndexError, ValueError):
        return []
    out = []
    for i, fr in enumerate(frames):
        raw, ch = _maybe_gray(np, fr)
        out.append({
            "frame": i,
            "kind": "image",
            "data": raw.tobytes(),
            "metadata": {
                "format": "raw", "container": "gif",
                "frame": str(i), "n_frames": str(len(frames)),
                "width": str(width), "height": str(height),
                "channels": str(ch),
            },
        })
    return out


# -------------------------------------------------------------- encode


def _palette_of(np, frames_px):
    """Exact palette (≤256 colors) over uint8 (H, W, 3) frames →
    (palette bytes padded to a power of two, per-frame index arrays)."""
    allpx = np.concatenate([f.reshape(-1, 3) for f in frames_px])
    colors, inverse = np.unique(allpx, axis=0, return_inverse=True)
    if len(colors) > 256:
        raise ValueError("encode_gif needs <= 256 distinct colors")
    bits = max(1, int(len(colors) - 1).bit_length())
    size = 1 << bits
    pal = np.zeros((size, 3), np.uint8)
    pal[:len(colors)] = colors
    idxs = []
    pos = 0
    for f in frames_px:
        cnt = f.shape[0] * f.shape[1]
        idxs.append(inverse[pos:pos + cnt].astype(np.uint8).reshape(
            f.shape[0], f.shape[1]))
        pos += cnt
    return pal, idxs, bits


def encode_gif(frames, width: int, height: int, channels: int = 1,
               interlace: bool = False, delay_cs: int = 4) -> bytes:
    """Fixture/export writer: raw frame(s) → GIF89a. `frames` is bytes
    (one frame) or a list of bytes; gray input expands through a gray
    palette. One global color table built exactly from the colors
    used; animated output carries a NETSCAPE loop block and per-frame
    graphic control (disposal 1)."""
    import numpy as np

    if isinstance(frames, (bytes, bytearray)):
        frames = [bytes(frames)]
    px = []
    for raw in frames:
        if len(raw) != width * height * channels:
            raise ValueError("frame length != width*height*channels")
        a = np.frombuffer(raw, np.uint8).reshape(height, width,
                                                 channels)
        px.append(np.repeat(a, 3, axis=2) if channels == 1 else a)
    pal, idxs, bits = _palette_of(np, px)
    mcs = max(2, bits)

    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", width, height)
    out += bytes(((0x80 | ((bits - 1) & 7)), 0, 0))  # GCT, bg 0
    out += pal.tobytes()
    if len(px) > 1:  # NETSCAPE 2.0 loop-forever
        out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"
    for idx in idxs:
        if len(px) > 1:
            out += b"\x21\xf9\x04" + bytes((1 << 2,)) \
                + struct.pack("<H", delay_cs) + b"\x00\x00"
        out += b"\x2c" + struct.pack("<HHHH", 0, 0, width, height)
        out += bytes(((0x40 if interlace else 0),))
        rows = idx
        if interlace:
            order = []
            for start, step in _INTERLACE:
                order.extend(range(start, height, step))
            rows = idx[order]
        stream = gif_lzw_encode(rows.tobytes(), mcs)
        out += bytes((mcs,))
        for o in range(0, len(stream), 255):
            chunk = stream[o:o + 255]
            out += bytes((len(chunk),)) + chunk
        out += b"\x00"
    out += b"\x3b"
    return bytes(out)
