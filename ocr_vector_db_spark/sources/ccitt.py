"""ITU-T T.6 (Group 4 / MMR) + T.4 (Group 3) fax codecs — the full
/CCITTFaxDecode image filter family scanned-OCR PDFs ship.

Pure Python, public-spec only: mode codes and the modified-Huffman run
tables are transcribed from ITU-T Recommendation T.4 §2 (terminating +
make-up codes, EOL/RTC framing, mixed-mode tag bits) and T.6 §2 (2-D
modes); the PDF parameter semantics are ISO 32000-1 §7.4.6. Reference
parity: the reference decodes CCITT rasters only through PyMuPDF
(ingestion/parsers/pymupdf_parser.py:518-569); this module covers every
/K regime on the pure-Python path — K < 0 (Group 4 MMR, the dominant
scanned-OCR form), K = 0 (Group 3 1-D MH) and K > 0 (Group 3 mixed,
tagged rows re-syncing 1-D every K rows).

Codec domain is SEMANTIC: decoders return one byte per pixel with
1 = black, and the encoder twins take the same. /BlackIs1 and the
image's /Decode array are PDF-layer concerns: `pdf_decode.
ccitt_image_xobject` maps CCITT-black → sample bit (per /BlackIs1) →
gray (per /Decode), exactly the ISO 32000 rendering pipeline.

Both directions are per-row O(changing elements) over transition lists
(never per-pixel bit twiddling inside the mode loop), and the encoder is
the decoder's exact mirror (same b1/b2 discovery, same mode choice rules:
pass when b2 < a1, vertical within ±3, horizontal otherwise) — so
round-trips are structural, not coincidental.
"""

from __future__ import annotations

# --------------------------------------------------------------- MH tables
# ITU-T T.4 Table 2 (white) / Table 3 (black) terminating codes, run 0-63.
_WHITE_TERM = [
    "00110101", "000111", "0111", "1000", "1011", "1100", "1110", "1111",
    "10011", "10100", "00111", "01000", "001000", "000011", "110100",
    "110101", "101010", "101011", "0100111", "0001100", "0001000",
    "0010111", "0000011", "0000100", "0101000", "0101011", "0010011",
    "0100100", "0011000", "00000010", "00000011", "00011010", "00011011",
    "00010010", "00010011", "00010100", "00010101", "00010110", "00010111",
    "00101000", "00101001", "00101010", "00101011", "00101100", "00101101",
    "00000100", "00000101", "00001010", "00001011", "01010010", "01010011",
    "01010100", "01010101", "00100100", "00100101", "01011000", "01011001",
    "01011010", "01011011", "01001010", "01001011", "00110010", "00110011",
    "00110100",
]
_BLACK_TERM = [
    "0000110111", "010", "11", "10", "011", "0011", "0010", "00011",
    "000101", "000100", "0000100", "0000101", "0000111", "00000100",
    "00000111", "000011000", "0000010111", "0000011000", "0000001000",
    "00001100111", "00001101000", "00001101100", "00000110111",
    "00000101000", "00000010111", "00000011000", "000011001010",
    "000011001011", "000011001100", "000011001101", "000001101000",
    "000001101001", "000001101010", "000001101011", "000011010010",
    "000011010011", "000011010100", "000011010101", "000011010110",
    "000011010111", "000001101100", "000001101101", "000011011010",
    "000011011011", "000001010100", "000001010101", "000001010110",
    "000001010111", "000001100100", "000001100101", "000001010010",
    "000001010011", "000000100100", "000000110111", "000000111000",
    "000000100111", "000000101000", "000001011000", "000001011001",
    "000000101011", "000000101100", "000001011010", "000001100110",
    "000001100111",
]
# T.4 make-up codes, runs 64, 128, …, 1728.
_WHITE_MAKEUP = {
    64: "11011", 128: "10010", 192: "010111", 256: "0110111",
    320: "00110110", 384: "00110111", 448: "01100100", 512: "01100101",
    576: "01101000", 640: "01100111", 704: "011001100", 768: "011001101",
    832: "011010010", 896: "011010011", 960: "011010100", 1024: "011010101",
    1088: "011010110", 1152: "011010111", 1216: "011011000",
    1280: "011011001", 1344: "011011010", 1408: "011011011",
    1472: "010011000", 1536: "010011001", 1600: "010011010",
    1664: "011000", 1728: "010011011",
}
_BLACK_MAKEUP = {
    64: "0000001111", 128: "000011001000", 192: "000011001001",
    256: "000001011011", 320: "000000110011", 384: "000000110100",
    448: "000000110101", 512: "0000001101100", 576: "0000001101101",
    640: "0000001001010", 704: "0000001001011", 768: "0000001001100",
    832: "0000001001101", 896: "0000001110010", 960: "0000001110011",
    1024: "0000001110100", 1088: "0000001110101", 1152: "0000001110110",
    1216: "0000001110111", 1280: "0000001010010", 1344: "0000001010011",
    1408: "0000001010100", 1472: "0000001010101", 1536: "0000001011010",
    1600: "0000001011011", 1664: "0000001100100", 1728: "0000001100101",
}
# T.4 extended make-up (colour-independent), runs 1792-2560.
_EXT_MAKEUP = {
    1792: "00000001000", 1856: "00000001100", 1920: "00000001101",
    1984: "000000010010", 2048: "000000010011", 2112: "000000010100",
    2176: "000000010101", 2240: "000000010110", 2304: "000000010111",
    2368: "000000011100", 2432: "000000011101", 2496: "000000011110",
    2560: "000000011111",
}


def _decode_table(term: list[str], makeup: dict[int, str]) -> dict[str, int]:
    t = {code: run for run, code in enumerate(term)}
    t.update({code: run for run, code in makeup.items()})
    t.update({code: run for run, code in _EXT_MAKEUP.items()})
    return t


_WHITE_DEC = _decode_table(_WHITE_TERM, _WHITE_MAKEUP)
_BLACK_DEC = _decode_table(_BLACK_TERM, _BLACK_MAKEUP)
_MAX_CODE_LEN = 13


class CCITTError(ValueError):
    pass


class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0  # bit index

    def read(self) -> int:
        i = self.pos
        if i >> 3 >= len(self.data):
            raise CCITTError("unexpected end of CCITT data")
        self.pos = i + 1
        return (self.data[i >> 3] >> (7 - (i & 7))) & 1

    def align(self) -> None:
        self.pos = (self.pos + 7) & ~7

    def at_end(self) -> bool:
        # only padding bits (zeros) of the final byte remain
        if self.pos >> 3 >= len(self.data):
            return True
        rest = self.data[self.pos >> 3:]
        first = rest[0] & (0xFF >> (self.pos & 7))
        return first == 0 and not any(rest[1:])


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, bits: str) -> None:
        for b in bits:
            self.acc = (self.acc << 1) | (b == "1")
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                self.acc, self.n = 0, 0

    def align(self) -> None:
        if self.n:
            self.out.append(self.acc << (8 - self.n))
            self.acc, self.n = 0, 0

    def bytes(self) -> bytes:
        self.align()
        return bytes(self.out)


def _read_run(r: _BitReader, black: bool) -> int:
    """One complete MH run length: make-up codes accumulate until a
    terminating (< 64) code closes the run."""
    table = _BLACK_DEC if black else _WHITE_DEC
    total = 0
    while True:
        code = ""
        while len(code) <= _MAX_CODE_LEN:
            code += "1" if r.read() else "0"
            run = table.get(code)
            if run is not None:
                break
        else:
            raise CCITTError(f"invalid MH code {code!r}")
        total += run
        if run < 64:
            return total


def _emit_run(w: _BitWriter, run: int, black: bool) -> None:
    makeup = _BLACK_MAKEUP if black else _WHITE_MAKEUP
    term = _BLACK_TERM if black else _WHITE_TERM
    while run >= 2624:
        w.write(_EXT_MAKEUP[2560])
        run -= 2560
    if run >= 64:
        big = (run // 64) * 64
        w.write(_EXT_MAKEUP[big] if big > 1728 else makeup[big])
        run -= big
    w.write(term[run])


def _find_b(ref: list[int], a0: int, color: int, first: bool) -> tuple[int, int]:
    """(b1, b2): the first reference-line changing element past a0 whose
    NEW colour is opposite to the current colour (even transition index →
    to-black, odd → to-white), and the one after it. `first` admits a
    transition AT position 0 (a0 is then the imaginary white element just
    before the row). Linear scan — callers advance monotonically, and rows
    are short relative to the run tables' reach."""
    want_parity = 0 if color == 0 else 1  # to-black when white, to-white when black
    for i, t in enumerate(ref):
        if (t > a0 or (first and t >= a0)) and (i & 1) == want_parity:
            return t, ref[i + 1] if i + 1 < len(ref) else _INF
    return _INF, _INF


_INF = 1 << 30


def _decode_2d_row(
    r: _BitReader, ref: list[int], columns: int
) -> tuple[list[int], bool]:
    """One 2-D-coded row (T.6 §2 / T.4 §4.2 — the mode set is shared):
    returns (transition list, hit-EOL flag)."""
    cur: list[int] = []
    a0, color, first = 0, 0, True
    eofb = False
    while a0 < columns:
        # mode dispatch by leading-zero count (T.6 code table):
        # 1=V0 01x=VL1/VR1 001=H 0001=P 00001x=V2 000001x=V3
        # 0000001=extension EOL=11 zeros then 1
        z = 0
        while not r.read():
            z += 1
            if z > 13:
                raise CCITTError("lost sync in T.6 mode codes")
        if z == 0:
            d = 0
        elif z == 1:
            d = 1 if r.read() else -1
        elif z == 2:
            d = None  # horizontal
        elif z == 3:
            # pass mode
            b1, b2 = _find_b(ref, a0, color, first)
            a0, first = min(b2, columns), False
            continue
        elif z == 4:
            d = 2 if r.read() else -2
        elif z == 5:
            d = 3 if r.read() else -3
        elif z == 11:
            eofb = True  # EOL (T.6: first half of EOFB; T.4: row sync)
            break
        else:
            raise CCITTError(f"unsupported T.6 code (zeros={z})")
        if d is None:  # horizontal: two MH runs, colour then opposite
            r1 = _read_run(r, black=bool(color))
            r2 = _read_run(r, black=not color)
            a1 = a0 + r1
            a2 = a1 + r2
            if a1 <= columns:
                cur.append(a1)
            if a2 <= columns:
                # r2 == 0 gives a1 == a2: keep BOTH transitions — the
                # double toggle is a net no-op at that position, while
                # dropping one would invert the rest of the row (no
                # compliant encoder emits it mid-row, but a foreign
                # stream must decode right, not upside-down)
                cur.append(a2)
            a0, first = a2, False
        else:  # vertical
            b1, _ = _find_b(ref, a0, color, first)
            a1 = min(b1, columns) + d
            if not (0 <= a1 <= columns) or (cur and a1 < cur[-1]):
                raise CCITTError("vertical mode out of range")
            cur.append(a1)
            a0, color, first = a1, color ^ 1, False
    return cur, eofb


def _row_bytes(cur: list[int], columns: int) -> bytearray:
    """Materialize a row (1 byte/pixel, 1 = black) from its transitions."""
    row = bytearray(columns)
    col = 0
    px = 0
    for t in cur:
        t = min(t, columns)
        if px:
            for i in range(col, t):
                row[i] = 1
        col, px = t, px ^ 1
    if px:
        for i in range(col, columns):
            row[i] = 1
    return row


def decode_g4(
    data: bytes,
    columns: int,
    rows: int | None = None,
    byte_align: bool = False,
) -> bytes:
    """Decode a T.6 (K < 0) codestream → `columns * n_rows` bytes, one per
    pixel, 1 = black. Stops at EOFB (two EOLs) or, when `rows` is given,
    after that many rows (EndOfBlock false streams have no EOFB).
    `byte_align` = /EncodedByteAlign: each row's first code starts on a
    byte boundary."""
    r = _BitReader(data)
    ref: list[int] = []  # imaginary all-white reference line
    out = bytearray()
    n_rows = 0
    while rows is None or n_rows < rows:
        if byte_align:
            r.align()
        if rows is None and r.at_end():
            break
        cur, eofb = _decode_2d_row(r, ref, columns)
        if eofb:
            break
        out.extend(_row_bytes(cur, columns))
        ref = [t for t in cur if t < columns]
        n_rows += 1
    return bytes(out)


def _row_transitions(row: bytes) -> list[int]:
    """Positions where a one-byte-per-pixel row changes colour."""
    cur: list[int] = []
    last = 0
    for x, p in enumerate(row):
        p = 1 if p else 0
        if p != last:
            cur.append(x)
            last = p
    return cur


def _encode_2d_row(
    w: _BitWriter, cur: list[int], ref: list[int], width: int
) -> None:
    """One 2-D-coded row against the reference line — the decoder's exact
    mirror (same b1/b2 discovery, pass when b2 < a1, vertical within ±3,
    horizontal otherwise)."""
    a0, color, first = 0, 0, True
    ci = 0  # index into cur of the next transition after a0
    while a0 < width:
        a1 = cur[ci] if ci < len(cur) else _INF
        b1, b2 = _find_b(ref, a0, color, first)
        if b2 < a1:
            w.write("0001")  # pass
            a0, first = min(b2, width), False
        elif abs(a1 - b1) <= 3:
            w.write({0: "1", 1: "011", 2: "000011", 3: "0000011",
                     -1: "010", -2: "000010", -3: "0000010"}[a1 - b1])
            a0, color, first = a1, color ^ 1, False
            ci += 1
        else:
            a1c = min(a1, width)
            a2 = cur[ci + 1] if ci + 1 < len(cur) else _INF
            a2c = min(a2, width)
            w.write("001")
            _emit_run(w, a1c - a0, black=bool(color))
            _emit_run(w, a2c - a1c, black=not color)
            a0, first = a2c, False
            ci += 2


def _encode_1d_row(w: _BitWriter, cur: list[int], width: int) -> None:
    """One MH-coded row: alternating white/black runs from the white
    start (a leading black pixel rides a zero-length white run)."""
    prev, color = 0, 0
    for t in cur:
        _emit_run(w, t - prev, black=bool(color))
        prev, color = t, color ^ 1
    _emit_run(w, width - prev, black=bool(color))


def encode_g4(
    pixels: bytes,
    width: int,
    height: int,
    byte_align: bool = False,
) -> bytes:
    """Encode `width*height` one-byte-per-pixel (nonzero = black) data as
    a T.6 codestream, EOFB-terminated — the fixture twin of `decode_g4`."""
    if len(pixels) != width * height:
        raise CCITTError("pixels must be width*height bytes")
    w = _BitWriter()
    ref: list[int] = []
    for y in range(height):
        cur = _row_transitions(pixels[y * width:(y + 1) * width])
        if byte_align:
            w.align()
        _encode_2d_row(w, cur, ref, width)
        ref = cur
    if byte_align:
        # the decoder aligns before every row attempt, including the one
        # that finds EOFB — mirror it
        w.align()
    w.write("000000000001" * 2)  # EOFB
    return w.bytes()


# ----------------------------------------------------------- Group 3 (T.4)

_EOL = "000000000001"


def _try_eol(r: _BitReader) -> bool:
    """Consume fill bits + one EOL if present at the current position.
    An EOL is ≥ 11 zeros then a 1 (fill prepends zeros); no valid T.4
    code starts with more than 7 zeros (the extended make-ups), so ≥ 8
    zeros before the first 1 can only be an EOL. On anything shorter the
    reader rewinds untouched."""
    save = r.pos
    z = 0
    try:
        while not r.read():
            z += 1
    except CCITTError:
        r.pos = save
        return False
    if z >= 8:
        return True
    r.pos = save
    return False


def _decode_1d_row(r: _BitReader, columns: int) -> list[int]:
    """One MH-coded (1-D) row → transition list. Rows start white; a
    black-first row arrives as a zero-length white run."""
    cur: list[int] = []
    col, color = 0, 0
    while col < columns:
        run = _read_run(r, black=bool(color))
        col += run
        cur.append(min(col, columns))
        color ^= 1
    return cur


def decode_g3(
    data: bytes,
    columns: int,
    rows: int | None = None,
    k: int = 0,
    byte_align: bool = False,
) -> bytes:
    """Decode a T.4 Group 3 codestream (/CCITTFaxDecode K ≥ 0) →
    `columns * n_rows` bytes, one per pixel, 1 = black.

    K = 0: pure 1-D MH rows; EOLs between rows are optional (consumed
    when present — ISO 32000 /EndOfLine). K > 0: mixed mode — each row's
    EOL carries a tag bit, 1 = the next row is 1-D coded, 0 = 2-D coded
    with the T.6 mode set against the previous row. `byte_align` =
    /EncodedByteAlign. When `rows` is None (no /Rows or /Height), the
    stream decodes until RTC/exhaustion: trailing EOL runs and a clean
    end both terminate; a mid-row error without a row budget is treated
    as the RTC tail (PDF images virtually always carry /Rows — the
    open-ended form is best-effort, matching viewers)."""
    r = _BitReader(data)
    ref: list[int] = []
    out = bytearray()
    n_rows = 0
    while rows is None or n_rows < rows:
        if byte_align:
            r.align()
        if r.at_end():
            break
        saw_eol = _try_eol(r)
        while saw_eol and _try_eol(r):  # RTC: back-to-back EOLs
            pass
        if r.at_end():
            break
        two_d = False
        if k > 0 and saw_eol:
            two_d = not r.read()  # tag: 1 = 1-D, 0 = 2-D
            if _try_eol(r):  # EOL right after the tag: the RTC tail
                break
        try:
            if two_d:
                cur, eol = _decode_2d_row(r, ref, columns)
                if eol:  # EOL mid-row: RTC tail reached
                    break
            else:
                cur = _decode_1d_row(r, columns)
        except CCITTError:
            if rows is None:
                break
            raise
        out.extend(_row_bytes(cur, columns))
        ref = [t for t in cur if t < columns]
        n_rows += 1
    return bytes(out)


def encode_g3(
    pixels: bytes,
    width: int,
    height: int,
    k: int = 0,
    byte_align: bool = False,
) -> bytes:
    """Encode one-byte-per-pixel (nonzero = black) data as a T.4 Group 3
    codestream, RTC-terminated — the fixture twin of `decode_g3`. K = 0
    writes EOL + MH runs per row; K > 0 writes EOL + tag, re-syncing
    with a 1-D row every k rows (the T.4 error-confinement rule) and
    2-D-coding the rows between."""
    if len(pixels) != width * height:
        raise CCITTError("pixels must be width*height bytes")
    if k < 0:
        raise CCITTError("encode_g3 needs K >= 0 (use encode_g4)")
    w = _BitWriter()
    ref: list[int] = []
    for y in range(height):
        cur = _row_transitions(pixels[y * width:(y + 1) * width])
        if byte_align:
            w.align()
        w.write(_EOL)
        one_d = k == 0 or y % k == 0
        if k > 0:
            w.write("1" if one_d else "0")
        if one_d:
            _encode_1d_row(w, cur, width)
        else:
            _encode_2d_row(w, cur, ref, width)
        ref = cur
    for _ in range(6):  # RTC (aligned like every row when byte_align —
        # the decoder aligns before each row attempt, including the one
        # that finds the tail)
        if byte_align:
            w.align()
        w.write(_EOL + ("1" if k > 0 else ""))
    return w.bytes()
