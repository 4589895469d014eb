"""JBIG2 (ITU-T T.88) embedded-stream codec — generic regions, the form
scanned-OCR PDFs ship behind /JBIG2Decode.

Pure Python, public-spec only: the MQ arithmetic coder is transcribed
from ITU-T T.88 Annex E (the same coder as JPEG 2000, T.800 Annex C) —
Qe/NMPS/NLPS/SWITCH state table, INITDEC/DECODE/BYTEIN and the encoder
twins INITENC/CODEMPS/CODELPS/BYTEOUT/FLUSH; the generic region decoding
procedure is T.88 §6.2.5 (GBTEMPLATE 0 with the four movable AT pixels
and TPGDON typical-prediction rows, context 0x9B25); the embedded
segment organization (headers, page information type 48, immediate
lossless generic region type 39) is T.88 §7 as profiled for PDF by ISO
32000-1 §7.4.7. Round 11 adds the SYMBOL-CODED profile: the integer
arithmetic decoding procedures of Annex A (IADH/IADW/IAEX/IADT/IAFS/
IADS/IAIT/IARI + the IAID tree of A.3), symbol dictionary segments
(§6.5, arithmetic, no refinement — one shared MQ codestream and GB
context across all symbol bitmaps) and text regions (§6.4, arithmetic
symbol codes, untransposed, OR composition) — jbig2enc's default symbol
mode. Round 14 adds the HALFTONE profile: pattern dictionaries (§6.7,
one wide generic region split into patterns, AT1 = (-HDPW, 0)) and
halftone regions (§6.6 — the grayscale image as Gray-coded bitplanes
per Annex C.5, all planes sharing one MQ codestream and GB context set,
patterns rendered along the (HRX, HRY) grid vector with OR
composition). Reference parity: the reference decodes JBIG2 rasters
only through PyMuPDF (ingestion/parsers/pymupdf_parser.py:61-132,
518-569); this module now covers the generic-region, symbol-coded AND
halftone families on the pure-Python path — refinement/huffman
segments stay PyMuPDF-only (raise JBIG2Error here).

Codec domain is SEMANTIC, like `sources/ccitt.py`: decoders return one
byte per pixel with 1 = black (T.88's convention), and the encoder twins
take the same. PDF-layer polarity (/Decode) is `pdf_decode.
jbig2_image_xobject`'s concern.

The encoder is the decoder's exact structural mirror — same context
template, same sorted AT order, same TPGDON toggle protocol — so
round-trips are structural, not coincidental (the CCITT module's
contract, ccitt.py:20-26).
"""

from __future__ import annotations

import functools
import struct


class JBIG2Error(Exception):
    """Malformed or unsupported-profile JBIG2 data."""


def _struct_safe(fn):
    """Truncated payloads surface as JBIG2Error, never struct.error /
    IndexError — decode_embedded's callers (jbig2_image_xobject) promise
    'returns None when malformed' by catching JBIG2Error only, so every
    fixed-layout unpack/index in the segment parsers must fold into it."""
    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        try:
            return fn(*args, **kwargs)
        except (struct.error, IndexError) as exc:
            raise JBIG2Error(f"truncated segment payload: {exc}") from exc
    return wrapped


# --------------------------------------------------------------- MQ coder
# T.88 Table E.1: (Qe, NMPS, NLPS, SWITCH), 47 states.
_QE = [
    (0x5601, 1, 1, 1), (0x3401, 2, 6, 0), (0x1801, 3, 9, 0),
    (0x0AC1, 4, 12, 0), (0x0521, 5, 29, 0), (0x0221, 38, 33, 0),
    (0x5601, 7, 6, 1), (0x5401, 8, 14, 0), (0x4801, 9, 14, 0),
    (0x3801, 10, 14, 0), (0x3001, 11, 17, 0), (0x2401, 12, 18, 0),
    (0x1C01, 13, 20, 0), (0x1601, 29, 21, 0), (0x5601, 15, 14, 1),
    (0x5401, 16, 14, 0), (0x5101, 17, 15, 0), (0x4801, 18, 16, 0),
    (0x3801, 19, 17, 0), (0x3401, 20, 18, 0), (0x3001, 21, 19, 0),
    (0x2801, 22, 19, 0), (0x2401, 23, 20, 0), (0x2201, 24, 21, 0),
    (0x1C01, 25, 22, 0), (0x1801, 26, 23, 0), (0x1601, 27, 24, 0),
    (0x1401, 28, 25, 0), (0x1201, 29, 26, 0), (0x1101, 30, 27, 0),
    (0x0AC1, 31, 28, 0), (0x09C1, 32, 29, 0), (0x08A1, 33, 30, 0),
    (0x0521, 34, 31, 0), (0x0441, 35, 32, 0), (0x02A1, 36, 33, 0),
    (0x0221, 37, 34, 0), (0x0141, 38, 35, 0), (0x0111, 39, 36, 0),
    (0x0085, 40, 37, 0), (0x0049, 41, 38, 0), (0x0025, 42, 39, 0),
    (0x0015, 43, 40, 0), (0x0009, 44, 41, 0), (0x0005, 45, 42, 0),
    (0x0001, 45, 43, 0), (0x5601, 46, 46, 0),
]


class MQDecoder:
    """T.88 Annex E arithmetic decoder. Context storage is caller-owned:
    a dict cx → [index, mps] (sized by the caller's context model, 2^16
    for generic template 0)."""

    def __init__(self, data: bytes):
        self.data = data
        self.bp = 0
        b0 = data[0] if data else 0xFF
        self.c = b0 << 16
        self._bytein()
        self.c = (self.c << 7) & 0xFFFFFFFF
        self.ct -= 7
        self.a = 0x8000

    def _bytein(self) -> None:
        data, bp = self.data, self.bp
        b = data[bp] if bp < len(data) else 0xFF
        if b == 0xFF:
            b1 = data[bp + 1] if bp + 1 < len(data) else 0xFF
            if b1 > 0x8F:          # marker: feed 1-bits forever
                self.c += 0xFF00
                self.ct = 8
            else:
                self.bp = bp + 1
                self.c += b1 << 9
                self.ct = 7
        else:
            self.bp = bp + 1
            b1 = data[bp + 1] if bp + 1 < len(data) else 0xFF
            self.c += b1 << 8
            self.ct = 8

    def decode(self, cx: list[int]) -> int:
        """cx = [index, mps] mutable pair; returns the decision bit."""
        qe, nmps, nlps, switch = _QE[cx[0]]
        self.a -= qe
        if (self.c >> 16) < qe:
            # LPS exchange path
            if self.a < qe:
                self.a = qe
                d = cx[1]
                cx[0] = nmps
            else:
                self.a = qe
                d = 1 - cx[1]
                if switch:
                    cx[1] = 1 - cx[1]
                cx[0] = nlps
        else:
            self.c -= qe << 16
            if self.a & 0x8000:
                return cx[1]
            if self.a < qe:
                d = 1 - cx[1]
                if switch:
                    cx[1] = 1 - cx[1]
                cx[0] = nlps
            else:
                d = cx[1]
                cx[0] = nmps
        # RENORMD
        while True:
            if self.ct == 0:
                self._bytein()
            self.a = (self.a << 1) & 0xFFFF
            self.c = (self.c << 1) & 0xFFFFFFFF
            self.ct -= 1
            if self.a & 0x8000:
                break
        return d


class MQEncoder:
    """T.88 Annex E arithmetic encoder — the decoder's exact mirror
    (CODEMPS/CODELPS with conditional exchange, BYTEOUT stuffing, FLUSH
    per E.3.8)."""

    def __init__(self):
        self.a = 0x8000
        self.c = 0
        self.ct = 12
        self.out = bytearray()
        self.b = -1  # byte position of the pending output byte; -1 = none

    def encode(self, d: int, cx: list[int]) -> None:
        qe, nmps, nlps, switch = _QE[cx[0]]
        if d == cx[1]:  # CODEMPS
            self.a -= qe
            if self.a & 0x8000:
                self.c += qe  # MPS owns the upper subinterval (E.3.2)
                return
            if self.a < qe:
                self.a = qe   # conditional exchange: keep the lower
            else:
                self.c += qe
            cx[0] = nmps
        else:           # CODELPS
            self.a -= qe
            if self.a < qe:
                self.c += qe
            else:
                self.a = qe
            if switch:
                cx[1] = 1 - cx[1]
            cx[0] = nlps
        while True:     # RENORME
            if self.ct == 0:
                self._byteout()
            self.a = (self.a << 1) & 0xFFFF
            self.c = (self.c << 1) & 0xFFFFFFF
            self.ct -= 1
            if self.a & 0x8000:
                break

    def _byteout(self) -> None:
        out = self.out
        if self.b >= 0 and out[self.b] == 0xFF:
            out.append((self.c >> 20) & 0xFF)
            self.b = len(out) - 1
            self.c &= 0xFFFFF
            self.ct = 7
        elif self.c < 0x8000000:
            out.append((self.c >> 19) & 0xFF)
            self.b = len(out) - 1
            self.c &= 0x7FFFF
            self.ct = 8
        else:
            if self.b >= 0:
                out[self.b] += 1
                if out[self.b] == 0xFF:
                    self.c &= 0x7FFFFFF
                    out.append((self.c >> 20) & 0xFF)
                    self.b = len(out) - 1
                    self.c &= 0xFFFFF
                    self.ct = 7
                    return
            out.append((self.c >> 19) & 0xFF)
            self.b = len(out) - 1
            self.c &= 0x7FFFF
            self.ct = 8

    def flush(self) -> bytes:
        # SETBITS (E.3.8): force as many 1-bits into C as the interval
        # allows, so trailing bytes compress to the 0xFF-stuffing form
        tempc = self.c + self.a
        self.c |= 0xFFFF
        if self.c >= tempc:
            self.c -= 0x8000
        self.c = (self.c << self.ct) & 0xFFFFFFFF
        self._byteout()
        self.c = (self.c << self.ct) & 0xFFFFFFFF
        self._byteout()
        # drop a trailing 0xFF (the decoder's marker detection regenerates
        # the implicit 1-bits), per the spec's optional truncation
        out = self.out
        while out and out[-1] == 0xFF:
            out.pop()
        return bytes(out)


# ------------------------------------------------- generic region (T.88 §6.2)
# GBTEMPLATE 0: 12 fixed context pixels + 4 movable AT pixels; templates
# 1-3 use smaller fixed sets + 1 AT pixel (the spec's Figures 4-7).
# Context bits assemble in (y, x) sorted order, MSB first — for the
# nominal AT positions this IS the figures' row-major layout. TPGDON rows
# toggle LTP with the per-template contexts of §6.2.5.7.
_FIXED_T0 = [(-1, -2), (0, -2), (1, -2),
             (-2, -1), (-1, -1), (0, -1), (1, -1), (2, -1),
             (-4, 0), (-3, 0), (-2, 0), (-1, 0)]
_FIXED_T1 = [(-1, -2), (0, -2), (1, -2), (2, -2),
             (-2, -1), (-1, -1), (0, -1), (1, -1), (2, -1),
             (-3, 0), (-2, 0), (-1, 0)]
_FIXED_T2 = [(-1, -2), (0, -2), (1, -2),
             (-2, -1), (-1, -1), (0, -1), (1, -1),
             (-2, 0), (-1, 0)]
_FIXED_T3 = [(-3, -1), (-2, -1), (-1, -1), (0, -1), (1, -1),
             (-4, 0), (-3, 0), (-2, 0), (-1, 0)]
_FIXED = {0: _FIXED_T0, 1: _FIXED_T1, 2: _FIXED_T2, 3: _FIXED_T3}
_NOMINAL_AT = [(3, -1), (-3, -1), (2, -2), (-2, -2)]
_NOMINAL_AT_N = {0: _NOMINAL_AT, 1: [(3, -1)], 2: [(2, -1)], 3: [(2, -1)]}
_AT_COUNT = {0: 4, 1: 1, 2: 1, 3: 1}
# TPGD pseudo-pixel contexts per template (§6.2.5.7)
_TPGD_CXS = {0: 0x9B25, 1: 0x0795, 2: 0x00E5, 3: 0x0195}
_TPGD_CX = _TPGD_CXS[0]


def _template_of(template: int,
                 at: list[tuple[int, int]] | None) -> list[tuple[int, int]]:
    fixed = _FIXED.get(template)
    if fixed is None:
        raise JBIG2Error(f"GBTEMPLATE {template} unsupported")
    if at is None:
        at = _NOMINAL_AT_N[template]
    if len(at) != _AT_COUNT[template]:
        raise JBIG2Error(
            f"template {template} needs {_AT_COUNT[template]} AT "
            f"pixels, got {len(at)}"
        )
    tpl = fixed + list(at)
    tpl.sort(key=lambda p: (p[1], p[0]))
    return tpl


def _template0(at: list[tuple[int, int]]) -> list[tuple[int, int]]:
    return _template_of(0, at)


def _region_pass(width: int, height: int, template, tpgdon: bool,
                 coder, rows: list[bytearray] | None,
                 cxs: dict[int, list[int]] | None = None,
                 tpgd_cx: int = _TPGD_CX) -> bytes:
    """The ONE scan shared by decode and encode: identical context
    assembly and TPGD protocol, differing only in whether each decision
    bit comes from the MQ decoder (rows=None) or goes to the MQ encoder
    (rows = the source bitmap). `cxs` lets a caller PERSIST the context
    model across regions sharing one MQ codestream — the symbol
    dictionary decodes every symbol bitmap with the same GB contexts
    (T.88 §6.5.5 step 2)."""
    if cxs is None:
        cxs = {}

    def cx_of(key: int) -> list[int]:
        s = cxs.get(key)
        if s is None:
            s = cxs[key] = [0, 0]
        return s

    decode = rows is None
    out: list[bytearray] = []
    ltp = 0
    for y in range(height):
        if tpgdon:
            if decode:
                sltp = coder.decode(cx_of(tpgd_cx))
            else:
                same = y > 0 and rows[y] == rows[y - 1]
                want = 1 if same else 0
                sltp = want ^ ltp
                coder.encode(sltp, cx_of(tpgd_cx))
            ltp ^= sltp
            if ltp:
                out.append(bytearray(out[y - 1]) if y > 0
                           else bytearray(width))
                continue
        row = bytearray(width) if decode else rows[y]
        hist = out if decode else rows  # completed rows (decode: built so far)
        for x in range(width):
            ctx = 0
            for dx, dy in template:
                xx, yy = x + dx, y + dy
                if yy < 0 or xx < 0 or xx >= width or yy > y or (
                        yy == y and xx >= x):
                    bit = 0  # outside the bitmap / not yet coded
                elif yy == y:
                    bit = row[x + dx]  # already coded on the current row
                else:
                    bit = hist[yy][xx]
                ctx = (ctx << 1) | (1 if bit else 0)
            if decode:
                row[x] = coder.decode(cx_of(ctx))
            else:
                coder.encode(1 if row[x] else 0, cx_of(ctx))
        out.append(row)
    if decode:
        return b"".join(bytes(r) for r in out)
    return b""


def decode_generic_region(data: bytes, width: int, height: int,
                          at: list[tuple[int, int]] | None = None,
                          tpgdon: bool = False,
                          template: int = 0) -> bytes:
    """MQ-coded generic region (templates 0-3) → width*height bytes,
    1=black."""
    if width <= 0 or height <= 0:
        raise JBIG2Error("empty region")
    tpl = _template_of(template, at)
    return _region_pass(width, height, tpl, tpgdon, MQDecoder(data), None,
                        tpgd_cx=_TPGD_CXS[template])


def encode_generic_region(pixels: bytes, width: int, height: int,
                          at: list[tuple[int, int]] | None = None,
                          tpgdon: bool = False,
                          template: int = 0) -> bytes:
    """Exact encoder mirror of `decode_generic_region`."""
    if len(pixels) != width * height:
        raise JBIG2Error("pixels must be width*height bytes")
    rows = [bytearray(1 if p else 0 for p in pixels[y * width:(y + 1) * width])
            for y in range(height)]
    tpl = _template_of(template, at)
    enc = MQEncoder()
    _region_pass(width, height, tpl, tpgdon, enc, rows,
                 tpgd_cx=_TPGD_CXS[template])
    return enc.flush()


# --------------------------------- integer arithmetic coding (T.88 Annex A)
# Each IAx procedure owns a 512-leaf context tree keyed by PREV; values
# code as a sign bit + a 6-class prefix + offset bits, MSB first. S=1,V=0
# is the out-of-band marker (OOB — class terminators in the symbol/text
# procedures). The encoder is the exact mirror: same PREV walk, same
# class table, so round-trips are structural (the module contract).

_INT_CLASSES = [
    # (extra prefix 1-bits before the 0, value bits, offset)
    (0, 2, 0), (1, 4, 4), (2, 6, 20), (3, 8, 84), (4, 12, 340),
]
_INT_TOP = (5, 32, 4436)  # '11111' prefix (no closing 0), 32 bits


def _prev_next(prev: int, bit: int) -> int:
    nxt = (prev << 1) | bit
    return nxt if prev < 256 else ((nxt & 511) | 256)


def _int_cx(cxs: dict[int, list[int]], prev: int) -> list[int]:
    s = cxs.get(prev)
    if s is None:
        s = cxs[prev] = [0, 0]
    return s


def _int_decode(dec: "MQDecoder", cxs: dict[int, list[int]]) -> int | None:
    """One IAx value; None = OOB."""
    prev = 1
    s = dec.decode(_int_cx(cxs, prev))
    prev = _prev_next(prev, s)
    ones = 0
    while ones < 5:
        bit = dec.decode(_int_cx(cxs, prev))
        prev = _prev_next(prev, bit)
        if not bit:
            break
        ones += 1
    n_bits, offset = (
        (_INT_TOP[1], _INT_TOP[2]) if ones == 5
        else (_INT_CLASSES[ones][1], _INT_CLASSES[ones][2])
    )
    v = 0
    for _ in range(n_bits):
        bit = dec.decode(_int_cx(cxs, prev))
        prev = _prev_next(prev, bit)
        v = (v << 1) | bit
    v += offset
    if s and v == 0:
        return None  # OOB
    return -v if s else v


def _int_encode(enc: "MQEncoder", cxs: dict[int, list[int]],
                value: int | None) -> None:
    """Mirror of `_int_decode`; value=None emits OOB."""
    if value is None:
        s, v = 1, 0
    else:
        s, v = (1, -value) if value < 0 else (0, value)
        if v > 0x7FFFFFFF + 4436:
            raise JBIG2Error("integer out of codable range")
    prev = 1
    enc.encode(s, _int_cx(cxs, prev))
    prev = _prev_next(prev, s)
    for ones, n_bits, offset in _INT_CLASSES:
        hi = offset + (1 << n_bits) - 1
        if v <= hi:
            break
    else:
        ones, n_bits, offset = _INT_TOP
    for _ in range(ones):
        enc.encode(1, _int_cx(cxs, prev))
        prev = _prev_next(prev, 1)
    if ones < 5:  # the top class has no closing 0
        enc.encode(0, _int_cx(cxs, prev))
        prev = _prev_next(prev, 0)
    rest = v - offset
    for i in range(n_bits - 1, -1, -1):
        bit = (rest >> i) & 1
        enc.encode(bit, _int_cx(cxs, prev))
        prev = _prev_next(prev, bit)


def _iaid_decode(dec: "MQDecoder", cxs: dict[int, list[int]],
                 symcodelen: int) -> int:
    prev = 1
    for _ in range(symcodelen):
        bit = dec.decode(_int_cx(cxs, prev))
        prev = (prev << 1) | bit
    return prev - (1 << symcodelen)


def _iaid_encode(enc: "MQEncoder", cxs: dict[int, list[int]],
                 symcodelen: int, value: int) -> None:
    prev = 1
    for i in range(symcodelen - 1, -1, -1):
        bit = (value >> i) & 1
        enc.encode(bit, _int_cx(cxs, prev))
        prev = (prev << 1) | bit


def _symcodelen(n_syms: int) -> int:
    return max(1, (n_syms - 1).bit_length())


# ----------------------------------- symbol dictionary (T.88 §6.5, type 0)
# Supported profile: arithmetic coding (SDHUFF=0), no refinement/aggregate
# (SDREFAGG=0), template 0 — what jbig2enc's symbol mode emits without -r.
# Symbols are (width, height, pixels) with 1 = black, the module's codec
# domain.


@_struct_safe
def decode_symbol_dict(payload: bytes,
                       input_syms: list[tuple[int, int, bytes]],
                       ) -> list[tuple[int, int, bytes]]:
    """Symbol dictionary segment payload → the EXPORTED symbol list (in
    export order — the id space text regions index)."""
    if len(payload) < 2:
        raise JBIG2Error("truncated symbol dictionary")
    flags = struct.unpack(">H", payload[:2])[0]
    if flags & 0x01:
        raise JBIG2Error("huffman symbol dictionaries unsupported")
    if flags & 0x02:
        raise JBIG2Error("refinement/aggregate symbol coding unsupported")
    template = (flags >> 10) & 0x03
    n_at = _AT_COUNT.get(template)
    if n_at is None:
        raise JBIG2Error(f"SDTEMPLATE {template} unsupported")
    pos = 2
    at = [(struct.unpack(">b", payload[pos + 2 * i:pos + 2 * i + 1])[0],
           struct.unpack(">b", payload[pos + 2 * i + 1:pos + 2 * i + 2])[0])
          for i in range(n_at)]
    pos += 2 * n_at
    n_ex, n_new = struct.unpack(">II", payload[pos:pos + 8])
    pos += 8
    if n_new > 1 << 20 or n_ex > 1 << 20:
        raise JBIG2Error("implausible symbol counts")
    dec = MQDecoder(payload[pos:])
    iadh: dict[int, list[int]] = {}
    iadw: dict[int, list[int]] = {}
    iaex: dict[int, list[int]] = {}
    gb_cx: dict[int, list[int]] = {}
    tpl = _template_of(template, at)
    new_syms: list[tuple[int, int, bytes]] = []
    hc_height = 0
    while len(new_syms) < n_new:
        dh = _int_decode(dec, iadh)
        if dh is None:
            raise JBIG2Error("OOB height delta")
        hc_height += dh
        if hc_height <= 0 or hc_height > 1 << 14:
            raise JBIG2Error("bad symbol height")
        sym_width = 0
        while True:
            dw = _int_decode(dec, iadw)
            if dw is None:
                break  # end of height class
            sym_width += dw
            if sym_width <= 0 or sym_width > 1 << 14:
                raise JBIG2Error("bad symbol width")
            if len(new_syms) >= n_new:
                raise JBIG2Error("more symbols than declared")
            bitmap = _region_pass(sym_width, hc_height, tpl, False,
                                  dec, None, cxs=gb_cx)
            new_syms.append((sym_width, hc_height, bitmap))
    # export flags: alternating no-export/export runs over input ∪ new
    pool = list(input_syms) + new_syms
    exported: list[tuple[int, int, bytes]] = []
    i, exflag = 0, 0
    while i < len(pool) and len(exported) < n_ex:
        run = _int_decode(dec, iaex)
        if run is None or run < 0:
            raise JBIG2Error("bad export run")
        if exflag:
            exported.extend(pool[i:i + run])
        i += run
        exflag ^= 1
    if len(exported) != n_ex:
        raise JBIG2Error("export count mismatch")
    return exported


def encode_symbol_dict(symbols: list[tuple[int, int, bytes]]) -> bytes:
    """Mirror of `decode_symbol_dict`'s supported profile: all `symbols`
    (which must be in nondecreasing-height order — the height-class
    protocol) are coded and exported, in order."""
    if not symbols:
        raise JBIG2Error("no symbols")
    if any(symbols[i][1] > symbols[i + 1][1] for i in range(len(symbols) - 1)):
        raise JBIG2Error("symbols must be sorted by nondecreasing height")
    enc = MQEncoder()
    iadh: dict[int, list[int]] = {}
    iadw: dict[int, list[int]] = {}
    iaex: dict[int, list[int]] = {}
    gb_cx: dict[int, list[int]] = {}
    tpl = _template0(_NOMINAL_AT)
    hc_height = 0
    i = 0
    while i < len(symbols):
        h = symbols[i][1]
        _int_encode(enc, iadh, h - hc_height)
        hc_height = h
        sym_width = 0
        while i < len(symbols) and symbols[i][1] == h:
            w, _, pix = symbols[i]
            _int_encode(enc, iadw, w - sym_width)
            sym_width = w
            rows = [bytearray(1 if p else 0 for p in pix[y * w:(y + 1) * w])
                    for y in range(h)]
            _region_pass(w, h, tpl, False, enc, rows, cxs=gb_cx)
            i += 1
        _int_encode(enc, iadw, None)  # OOB: height class done
    _int_encode(enc, iaex, 0)             # first (no-export) run empty
    _int_encode(enc, iaex, len(symbols))  # export everything
    flags = 0  # SDHUFF=0, SDREFAGG=0, template 0
    at = b"".join(struct.pack(">bb", dx, dy) for dx, dy in _NOMINAL_AT)
    return (struct.pack(">H", flags) + at
            + struct.pack(">II", len(symbols), len(symbols))
            + enc.flush())


# ----------------------------------------- text region (T.88 §6.4, types 4-7)
# Supported profile: arithmetic symbol codes (SBHUFF=0), no refinement,
# untransposed, OR composition — jbig2enc's default text-region shape.
# REFCORNER semantics follow §6.4.5 step 3(c): S is the left column either
# way (the right-corner cases place the right edge at CURS + W - 1, which
# is the same bitmap position), T is the top row for TOP corners and the
# bottom row for BOTTOM corners.


@_struct_safe
def decode_text_region(payload: bytes,
                       syms: list[tuple[int, int, bytes]],
                       ) -> tuple[int, int, int, int, bytes]:
    """Text region segment payload + the referenced symbol list →
    (w, h, x, y, region bitmap with 1 = black)."""
    w, h, x0, y0, _comb = _parse_region_info(payload)
    if w * h > 64 << 20:
        raise JBIG2Error("text region too large")
    flags = struct.unpack(">H", payload[17:19])[0]
    if flags & 0x01:
        raise JBIG2Error("huffman text regions unsupported")
    refine = bool(flags & 0x02)
    log_strips = (flags >> 2) & 0x03
    strips = 1 << log_strips
    ref_corner = (flags >> 4) & 0x03
    if flags & 0x40:
        raise JBIG2Error("transposed text regions unsupported")
    comb_op = (flags >> 7) & 0x03
    if comb_op != 0:
        raise JBIG2Error(f"SBCOMBOP {comb_op} unsupported (OR only)")
    def_pixel = (flags >> 9) & 0x01
    ds_offset = (flags >> 10) & 0x1F
    if ds_offset > 15:
        ds_offset -= 32  # signed 5-bit
    pos = 19
    if refine and not (flags & 0x8000):
        pos += 4  # refinement AT pixels (template 0)
    n_instances = struct.unpack(">I", payload[pos:pos + 4])[0]
    pos += 4
    if not syms:
        raise JBIG2Error("text region with no symbols in scope")
    symcodelen = _symcodelen(len(syms))
    dec = MQDecoder(payload[pos:])
    iadt: dict[int, list[int]] = {}
    iafs: dict[int, list[int]] = {}
    iads: dict[int, list[int]] = {}
    iait: dict[int, list[int]] = {}
    iari: dict[int, list[int]] = {}
    iaid: dict[int, list[int]] = {}
    region = bytearray(b"\x01" * (w * h) if def_pixel else w * h)
    dt0 = _int_decode(dec, iadt)
    if dt0 is None:
        raise JBIG2Error("OOB initial strip T")
    strip_t = -dt0 * strips
    first_s = 0
    n_done = 0
    while n_done < n_instances:
        dt = _int_decode(dec, iadt)
        if dt is None:
            raise JBIG2Error("OOB strip delta")
        strip_t += dt * strips
        dfs = _int_decode(dec, iafs)
        if dfs is None:
            raise JBIG2Error("OOB first S")
        first_s += dfs
        cur_s = first_s
        first = True
        while True:
            if not first:
                ids = _int_decode(dec, iads)
                if ids is None:
                    break  # end of strip
                cur_s += ids + ds_offset
            first = False
            cur_t = 0 if strips == 1 else _int_decode(dec, iait)
            if cur_t is None:
                raise JBIG2Error("OOB intra-strip T")
            t = strip_t + cur_t
            sym_id = _iaid_decode(dec, iaid, symcodelen)
            if not 0 <= sym_id < len(syms):
                raise JBIG2Error(f"symbol id {sym_id} out of range")
            if refine and _int_decode(dec, iari):
                raise JBIG2Error("refined symbol instances unsupported")
            sw, sh, spix = syms[sym_id]
            top = t if ref_corner & 1 else t - sh + 1
            for yy in range(sh):
                py = top + yy
                if not 0 <= py < h:
                    continue
                base = py * w
                rowbase = yy * sw
                for xx in range(sw):
                    px = cur_s + xx
                    if 0 <= px < w and spix[rowbase + xx]:
                        region[base + px] = 1
            cur_s += sw - 1
            n_done += 1
            if n_done > n_instances:
                raise JBIG2Error("more instances than declared")
    return w, h, x0, y0, bytes(region)


def encode_text_region(
    w: int, h: int,
    placements: list[tuple[int, int, int]],
    syms: list[tuple[int, int, bytes]],
    x0: int = 0, y0: int = 0,
) -> bytes:
    """Mirror of `decode_text_region`'s supported profile: `placements`
    = (symbol id, s, t) with (s, t) the TOP-LEFT pixel of each instance,
    sorted by (t, s); one strip per distinct t (SBSTRIPS=1)."""
    if sorted(placements, key=lambda p: (p[2], p[1])) != list(placements):
        raise JBIG2Error("placements must be sorted by (t, s)")
    symcodelen = _symcodelen(len(syms))
    enc = MQEncoder()
    iadt: dict[int, list[int]] = {}
    iafs: dict[int, list[int]] = {}
    iads: dict[int, list[int]] = {}
    iaid: dict[int, list[int]] = {}
    strip_t = 0
    _int_encode(enc, iadt, 0)  # STRIPT starts at 0
    first_s = 0
    i = 0
    while i < len(placements):
        t = placements[i][2]
        _int_encode(enc, iadt, t - strip_t)
        strip_t = t
        _, s, _ = placements[i]
        _int_encode(enc, iafs, s - first_s)
        first_s = s
        cur_s = s
        first = True
        while i < len(placements) and placements[i][2] == t:
            sym_id, s, _ = placements[i]
            if not first:
                _int_encode(enc, iads, s - cur_s)
            first = False
            _iaid_encode(enc, iaid, symcodelen, sym_id)
            cur_s = s + syms[sym_id][0] - 1
            i += 1
        _int_encode(enc, iads, None)  # OOB: strip done
    region_info = struct.pack(">IIII", w, h, x0, y0) + b"\x00"
    flags = 1 << 4  # REFCORNER = TOPLEFT; SBHUFF=0, REFINE=0, OR, strips=1
    return (region_info + struct.pack(">H", flags)
            + struct.pack(">I", len(placements)) + enc.flush())


# --------------------------------------- halftone regions (T.88 §6.6/§6.7)
# The third scanned-raster family: a PATTERN DICTIONARY (all patterns
# decoded as ONE wide generic region, then split) plus a HALFTONE REGION
# whose grayscale image decodes as Gray-coded bitplanes (Annex C.5 —
# every plane shares one MQ codestream and one GB context set, MSB
# first, each lower plane XORed with the one above as it lands) and
# renders pattern[gray] cells along the (HRX, HRY) grid vector.
# Supported profile: arithmetic coding, ENABLESKIP=0, OR composition —
# what halftone-emitting scanner pipelines produce; MMR-coded planes,
# skip bitmaps and non-OR ops raise (PyMuPDF path), as do refinement
# and huffman segments.


def decode_pattern_dict(payload: bytes) -> tuple[int, int, list[bytes]]:
    """Pattern dictionary segment (§6.7) → (HDPW, HDPH, patterns): the
    GRAYMAX+1 patterns decode as ONE generic region of width
    (GRAYMAX+1)*HDPW with AT1 = (-HDPW, 0) (§6.7.5), then split."""
    if len(payload) < 7:
        raise JBIG2Error("truncated pattern dictionary")
    flags = payload[0]
    hdmmr = flags & 1
    template = (flags >> 1) & 3
    hdpw, hdph = payload[1], payload[2]
    (graymax,) = struct.unpack(">I", payload[3:7])
    if hdpw < 1 or hdph < 1:
        raise JBIG2Error("empty pattern")
    if graymax > 4095:
        raise JBIG2Error("pattern dictionary too large")
    width = (graymax + 1) * hdpw
    if hdmmr:
        from ocr_vector_db_spark.sources.ccitt import CCITTError, decode_g4

        try:
            collage = decode_g4(payload[7:], width, rows=hdph)
        except CCITTError as exc:
            raise JBIG2Error(f"bad MMR pattern dict: {exc}") from exc
    else:
        at = [(-hdpw, 0), (-3, -1), (2, -2),
              (-2, -2)][:_AT_COUNT[template]]
        collage = decode_generic_region(payload[7:], width, hdph,
                                        at=at, template=template)
    pats = []
    for k in range(graymax + 1):
        pats.append(b"".join(
            collage[y * width + k * hdpw:y * width + (k + 1) * hdpw]
            for y in range(hdph)
        ))
    return hdpw, hdph, pats


def encode_pattern_dict(patterns: list[bytes], hdpw: int, hdph: int,
                        template: int = 0) -> bytes:
    """Exact mirror of `decode_pattern_dict` (arithmetic profile)."""
    if not patterns or any(len(p) != hdpw * hdph for p in patterns):
        raise JBIG2Error("patterns must all be HDPW*HDPH bytes")
    width = len(patterns) * hdpw
    collage = b"".join(
        b"".join(p[y * hdpw:(y + 1) * hdpw] for p in patterns)
        for y in range(hdph)
    )
    at = [(-hdpw, 0), (-3, -1), (2, -2), (-2, -2)][:_AT_COUNT[template]]
    mq = encode_generic_region(collage, width, hdph, at=at,
                               template=template)
    return (bytes(((template & 3) << 1,)) + bytes((hdpw, hdph))
            + struct.pack(">I", len(patterns) - 1) + mq)


def _gray_at(template: int) -> list[tuple[int, int]]:
    """AT pixels of the grayscale bitplane decode (§6.6.5.1)."""
    return [((3 if template <= 1 else 2), -1), (-3, -1), (2, -2),
            (-2, -2)][:_AT_COUNT[template]]


def decode_halftone_region(
    payload: bytes, patterns: tuple[int, int, list[bytes]],
) -> tuple[int, int, int, int, bytes]:
    """Halftone region segment (§6.6) → (w, h, x, y, bitmap 1=black)."""
    w, h, x0, y0, _ = _parse_region_info(payload)
    if len(payload) < 38:
        raise JBIG2Error("truncated halftone region")
    flags = payload[17]
    hmmr = flags & 1
    template = (flags >> 1) & 3
    enableskip = (flags >> 3) & 1
    combop = (flags >> 4) & 7
    defpixel = (flags >> 7) & 1
    hgw, hgh = struct.unpack(">II", payload[18:26])
    hgx, hgy = struct.unpack(">ii", payload[26:34])
    hrx, hry = struct.unpack(">HH", payload[34:38])
    if hmmr or enableskip or combop != 0:
        raise JBIG2Error("halftone MMR/skip/non-OR unsupported "
                         "(PyMuPDF path)")
    hdpw, hdph, pats = patterns
    if not pats:
        raise JBIG2Error("halftone region before pattern dictionary")
    if hgw < 1 or hgh < 1 or hgw * hgh > 16 << 20:
        raise JBIG2Error("bad halftone grid")
    if w * h > 64 << 20:
        raise JBIG2Error("halftone region too large")
    bpp = max(1, (len(pats) - 1).bit_length())
    # bound TOTAL work, not just the output geometry: a crafted segment
    # can declare a 16M-cell grid × 8 gray planes (pure-Python MQ
    # decode) or 255×255 patterns (per-cell render loop) and cost 1e10+
    # operations while every individual cap above still passes. In a
    # legitimate tiling cells×pattern-area ≈ region area, so budget
    # both phases proportional to the 64 MP region cap.
    if hgw * hgh * bpp > 64 << 20:
        raise JBIG2Error("halftone gray-plane work over budget")
    if hgw * hgh * hdpw * hdph > 4 * (64 << 20):
        raise JBIG2Error("halftone render work over budget")
    # Annex C.5 grayscale decode: planes MSB→0 share ONE MQ decoder and
    # ONE GB context set; each lower plane XORs with the plane above
    dec = MQDecoder(payload[38:])
    cxs: dict[int, list[int]] = {}
    tpl = _template_of(template, _gray_at(template))
    vals = [0] * (hgw * hgh)
    prev: bytes | None = None
    for j in range(bpp - 1, -1, -1):
        raw = _region_pass(hgw, hgh, tpl, False, dec, None, cxs=cxs,
                           tpgd_cx=_TPGD_CXS[template])
        cur = raw if prev is None else bytes(
            a ^ b for a, b in zip(raw, prev))
        for i, bit in enumerate(cur):
            if bit:
                vals[i] |= 1 << j
        prev = cur
    region = bytearray(b"\x01" if defpixel else b"\x00") * (w * h)
    nmax = len(pats) - 1
    for m in range(hgh):
        for n in range(hgw):
            gi = vals[m * hgw + n]
            if gi > nmax:
                gi = nmax  # out-of-range gray clamps (§6.6.5.2)
            pat = pats[gi]
            px = (hgx + m * hry + n * hrx) >> 8
            py = (hgy + m * hrx - n * hry) >> 8
            for yy in range(hdph):
                ty = py + yy
                if ty < 0 or ty >= h:
                    continue
                base = ty * w
                rowbase = yy * hdpw
                for xx in range(hdpw):
                    tx = px + xx
                    if 0 <= tx < w and pat[rowbase + xx]:
                        region[base + tx] = 1
    return w, h, x0, y0, bytes(region)


def encode_halftone_region(
    width: int, height: int, grays: list[int], hgw: int, hgh: int,
    patterns: list[bytes], hdpw: int, hdph: int, template: int = 0,
) -> bytes:
    """Exact mirror of `decode_halftone_region`: axis-aligned grid
    (HRX = HDPW<<8, HRY = 0 — both grid steps equal HDPW, so only
    square cells tile without overlap or gaps), arithmetic Gray-coded
    planes sharing one MQ codestream."""
    if hdpw != hdph:
        # the axis-aligned HRY=0 grid this writer emits cannot express
        # rectangular cells — cells would overlap (hdph > hdpw) or gap
        # (hdph < hdpw); reject instead of silently mis-tiling
        raise JBIG2Error("halftone writer requires square cells "
                         "(hdpw == hdph)")
    if len(grays) != hgw * hgh:
        raise JBIG2Error("grays must be HGW*HGH values")
    nmax = len(patterns) - 1
    if any(g < 0 or g > nmax for g in grays):
        raise JBIG2Error("gray value out of pattern range")
    bpp = max(1, nmax.bit_length())
    region_info = struct.pack(">IIII", width, height, 0, 0) + b"\x00"
    flags = (template & 3) << 1  # arithmetic, no skip, OR, defpixel 0
    head = (region_info + bytes((flags,))
            + struct.pack(">II", hgw, hgh)
            + struct.pack(">ii", 0, 0)
            + struct.pack(">HH", hdpw << 8, 0))
    enc = MQEncoder()
    cxs: dict[int, list[int]] = {}
    tpl = _template_of(template, _gray_at(template))
    prev: list[int] | None = None
    for j in range(bpp - 1, -1, -1):
        bits = [(g >> j) & 1 for g in grays]
        coded = bits if prev is None else [
            a ^ b for a, b in zip(bits, prev)]
        rows = [bytearray(coded[y * hgw:(y + 1) * hgw])
                for y in range(hgh)]
        _region_pass(hgw, hgh, tpl, False, enc, rows, cxs=cxs,
                     tpgd_cx=_TPGD_CXS[template])
        prev = bits
    return head + enc.flush()


# ------------------------------------------------ embedded segments (T.88 §7)
_SYMBOL_DICT = 0
_INTERMEDIATE_TEXT = 4
_IMM_TEXT = 6
_IMM_LOSSLESS_TEXT = 7
_PATTERN_DICT = 16
_INTERMEDIATE_HALFTONE = 20
_IMM_HALFTONE = 22
_IMM_LOSSLESS_HALFTONE = 23
_PAGE_INFO = 48
_IMM_GENERIC = 38
_IMM_LOSSLESS_GENERIC = 39
_INTERMEDIATE_GENERIC = 36
_END_OF_PAGE = 49
_END_OF_STRIPE = 50
_END_OF_FILE = 51
_TEXT_TYPES = (_INTERMEDIATE_TEXT, _IMM_TEXT, _IMM_LOSSLESS_TEXT)
_HALFTONE_TYPES = (_INTERMEDIATE_HALFTONE, _IMM_HALFTONE,
                   _IMM_LOSSLESS_HALFTONE)


@_struct_safe
def _parse_segment_header(data: bytes, pos: int):
    """→ (seg_number, seg_type, page, data_length, data_start)."""
    if pos + 11 > len(data):
        raise JBIG2Error("truncated segment header")
    number = struct.unpack(">I", data[pos:pos + 4])[0]
    flags = data[pos + 4]
    seg_type = flags & 0x3F
    page_assoc_4 = bool(flags & 0x40)
    pos += 5
    rts = data[pos]
    count = rts >> 5
    if count == 7:  # long form: 4-byte count + retention bitmap
        count = struct.unpack(">I", data[pos:pos + 4])[0] & 0x1FFFFFFF
        pos += 4 + (count + 8) // 8
    else:
        pos += 1
    ref_size = 1 if number <= 256 else (2 if number <= 65536 else 4)
    pos += count * ref_size
    if page_assoc_4:
        page = struct.unpack(">I", data[pos:pos + 4])[0]
        pos += 4
    else:
        page = data[pos]
        pos += 1
    length = struct.unpack(">I", data[pos:pos + 4])[0]
    pos += 4
    if length == 0xFFFFFFFF:
        raise JBIG2Error("unknown-length segments unsupported")
    return number, seg_type, page, length, pos


def parse_segments(data: bytes):
    """Embedded-organization segment stream → [(type, payload bytes)]."""
    out = []
    pos = 0
    while pos < len(data):
        _, seg_type, _, length, start = _parse_segment_header(data, pos)
        end = start + length
        if end > len(data):
            raise JBIG2Error("segment data overruns stream")
        out.append((seg_type, data[start:end]))
        pos = end
    return out


def _parse_region_info(payload: bytes):
    if len(payload) < 17:
        raise JBIG2Error("truncated region segment info")
    w, h, x, y = struct.unpack(">IIII", payload[:16])
    comb_op = payload[16] & 0x07
    return w, h, x, y, comb_op


@_struct_safe
def decode_embedded(stream: bytes, globals_data: bytes = b"") -> tuple[int, int, bytes]:
    """PDF /JBIG2Decode stream (+ optional /JBIG2Globals) → (width,
    height, width*height bytes with 1 = black).

    Supports the scanned-raster profiles: one page information segment,
    immediate (lossless) generic regions composed by OR (jbig2enc
    -generic, scanners), AND symbol-coded pages — symbol dictionary
    segments (arithmetic, no refinement) + text regions (arithmetic
    symbol codes, untransposed, OR) — jbig2enc's default symbol mode.
    Symbol dictionaries accumulate in stream order (globals first), text
    regions index the accumulated export list — the single-dictionary
    shape PDF encoders emit. Halftone/refinement/huffman segments raise
    JBIG2Error (PyMuPDF path)."""
    segments = parse_segments(globals_data) + parse_segments(stream)
    page_w = page_h = 0
    page: bytearray | None = None
    symbols: list[tuple[int, int, bytes]] = []
    patterns: tuple[int, int, list[bytes]] = (0, 0, [])
    for seg_type, payload in segments:
        if seg_type == _PAGE_INFO:
            if len(payload) < 8:
                raise JBIG2Error("truncated page info")
            page_w, page_h = struct.unpack(">II", payload[:8])
            if page_h == 0xFFFFFFFF:
                raise JBIG2Error("striped unknown-height pages unsupported")
            if page_w * page_h > 64 << 20:
                raise JBIG2Error("page too large")
            page = bytearray(page_w * page_h)
        elif seg_type in (_IMM_GENERIC, _IMM_LOSSLESS_GENERIC,
                          _INTERMEDIATE_GENERIC):
            if page is None:
                raise JBIG2Error("region before page information")
            w, h, x0, y0, _ = _parse_region_info(payload)
            flags = payload[17]
            template = (flags >> 1) & 0x03
            tpgdon = bool(flags & 0x08)
            if flags & 0x01:
                # MMR=1: the data is a T.6 (MMR) codestream — decode
                # through the shared fax codec (sources/ccitt.py), which
                # lives in the same 1=black semantic domain (T.88
                # §6.2.5.2 defers to T.6 exactly)
                from ocr_vector_db_spark.sources.ccitt import (
                    CCITTError,
                    decode_g4,
                )

                try:
                    bitmap = decode_g4(payload[18:], w, rows=h)
                except CCITTError as exc:
                    raise JBIG2Error(f"bad MMR region: {exc}") from exc
            else:
                n_at = _AT_COUNT.get(template)
                if n_at is None:
                    raise JBIG2Error(f"GBTEMPLATE {template} unsupported")
                at = [
                    (struct.unpack(
                        ">b", payload[18 + 2 * i:19 + 2 * i])[0],
                     struct.unpack(
                        ">b", payload[19 + 2 * i:20 + 2 * i])[0])
                    for i in range(n_at)
                ]
                bitmap = decode_generic_region(
                    payload[18 + 2 * n_at:], w, h,
                    at=at, tpgdon=tpgdon, template=template,
                )
            for yy in range(h):
                py = y0 + yy
                if py >= page_h:
                    break
                base = py * page_w + x0
                rowbase = yy * w
                for xx in range(min(w, page_w - x0)):
                    if bitmap[rowbase + xx]:
                        page[base + xx] = 1
        elif seg_type == _SYMBOL_DICT:
            symbols.extend(decode_symbol_dict(payload, symbols))
        elif seg_type == _PATTERN_DICT:
            patterns = decode_pattern_dict(payload)
        elif seg_type in _HALFTONE_TYPES:
            if page is None:
                raise JBIG2Error("halftone region before page info")
            w, h, x0, y0, bitmap = decode_halftone_region(payload,
                                                          patterns)
            for yy in range(h):
                py = y0 + yy
                if py >= page_h:
                    break
                base = py * page_w + x0
                rowbase = yy * w
                for xx in range(min(w, page_w - x0)):
                    if bitmap[rowbase + xx]:
                        page[base + xx] = 1
        elif seg_type in _TEXT_TYPES:
            if page is None:
                raise JBIG2Error("text region before page information")
            w, h, x0, y0, bitmap = decode_text_region(payload, symbols)
            for yy in range(h):
                py = y0 + yy
                if py >= page_h:
                    break
                base = py * page_w + x0
                rowbase = yy * w
                for xx in range(min(w, page_w - x0)):
                    if bitmap[rowbase + xx]:
                        page[base + xx] = 1
        elif seg_type in (_END_OF_PAGE, _END_OF_STRIPE, _END_OF_FILE):
            continue
        else:
            raise JBIG2Error(f"segment type {seg_type} unsupported "
                             "(refinement/huffman stay on PyMuPDF)")
    if page is None:
        raise JBIG2Error("no page information segment")
    return page_w, page_h, bytes(page)


def _segment(number: int, seg_type: int, page: int, payload: bytes) -> bytes:
    head = struct.pack(">IB", number, seg_type & 0x3F)
    head += b"\x00"                    # 0 referred-to segments, short form
    head += struct.pack(">B", page)    # 1-byte page association
    head += struct.pack(">I", len(payload))
    return head + payload


def encode_embedded(pixels: bytes, width: int, height: int,
                    tpgdon: bool = False, template: int = 0,
                    mmr: bool = False) -> bytes:
    """pixels (1 = black) → a PDF-embeddable JBIG2 stream: page info +
    one immediate lossless generic region covering the page — the exact
    mirror of `decode_embedded`'s generic profiles (MQ templates 0-3, or
    MMR via the shared T.6 fax codec)."""
    if len(pixels) != width * height:
        raise JBIG2Error("pixels must be width*height bytes")
    page_info = struct.pack(">IIII", width, height, 0, 0) + b"\x01" + b"\x00\x00"
    region_info = struct.pack(">IIII", width, height, 0, 0) + b"\x00"
    if mmr:
        from ocr_vector_db_spark.sources.ccitt import encode_g4

        body = bytes([0x01]) + encode_g4(pixels, width, height)
    else:
        flags = ((0x08 if tpgdon else 0x00)
                 | ((template & 0x03) << 1))
        at = b"".join(struct.pack(">bb", dx, dy)
                      for dx, dy in _NOMINAL_AT_N[template])
        mq = encode_generic_region(pixels, width, height,
                                   tpgdon=tpgdon, template=template)
        body = bytes([flags]) + at + mq
    region = region_info + body
    return (_segment(0, _PAGE_INFO, 1, page_info)
            + _segment(1, _IMM_LOSSLESS_GENERIC, 1, region))


def encode_embedded_halftone(
    width: int, height: int, grays: list[int], hgw: int, hgh: int,
    patterns: list[bytes], hdpw: int, hdph: int,
) -> bytes:
    """Halftone page → a PDF-embeddable JBIG2 stream: page info + one
    pattern dictionary + one immediate lossless halftone region covering
    the page — the exact mirror of `decode_embedded`'s halftone profile
    (axis-aligned square-cell grid, arithmetic Gray-coded planes)."""
    page_info = (struct.pack(">IIII", width, height, 0, 0)
                 + b"\x01" + b"\x00\x00")
    pd = encode_pattern_dict(patterns, hdpw, hdph)
    ht = encode_halftone_region(width, height, grays, hgw, hgh,
                                patterns, hdpw, hdph)
    return (_segment(0, _PAGE_INFO, 1, page_info)
            + _segment(1, _PATTERN_DICT, 1, pd)
            + _segment(2, _IMM_LOSSLESS_HALFTONE, 1, ht))


def encode_embedded_symbols(
    width: int, height: int,
    symbols: list[tuple[int, int, bytes]],
    placements: list[tuple[int, int, int]],
) -> bytes:
    """Symbol-coded page → a PDF-embeddable JBIG2 stream: page info + one
    symbol dictionary (all symbols exported, nondecreasing-height order
    required) + one immediate lossless text region covering the page
    (`placements` = (symbol id, s, t) top-left pixels sorted by (t, s)) —
    the exact mirror of `decode_embedded`'s symbol profile, i.e. the
    jbig2enc -symbol shape."""
    page_info = (struct.pack(">IIII", width, height, 0, 0)
                 + b"\x01" + b"\x00\x00")
    sd = encode_symbol_dict(symbols)
    tr = encode_text_region(width, height, placements, symbols)
    return (_segment(0, _PAGE_INFO, 1, page_info)
            + _segment(1, _SYMBOL_DICT, 1, sd)
            + _segment(2, _IMM_LOSSLESS_TEXT, 1, tr))
