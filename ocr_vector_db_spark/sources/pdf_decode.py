"""Pure-Python PDF decode → block dicts (no native PDF library needed).

The reference's primary ingestion path is PyMuPDF block extraction
(ingestion/parsers/pymupdf_parser.py:518-569: per-page text/image blocks
with bbox, min-length filter, adjacent-merge). PyMuPDF is not available in
this container, so this module implements the decode step from the public
PDF spec directly:

- COS object scan (`N 0 obj … endobj`), stream payloads, FlateDecode via
  stdlib zlib;
- page-tree walk (/Root → /Pages → /Kids, /Contents may be a ref or array);
- content-stream interpretation: BT/ET text objects, Td/TD/Tm/T* text
  positioning, Tj/TJ/'/" show operators, literal-string escapes + hex
  strings, Tf font size (for line/block gap heuristics), cm CTM + `name Do`
  image XObject draws → image blocks.

Coverage is the simple-PDF subset PLUS CID-keyed fonts with /ToUnicode
CMaps: Type0/Identity-H show strings (the encoding every Korean/CJK PDF in
the reference's corpus uses) decode through the font's bfchar/bfrange map
to Unicode, exactly as PyMuPDF resolves them. Also handled: /ObjStm object
streams (the PDF 1.5+ compressed-object layout), /LZWDecode, the TIFF/PNG
predictors of §7.4.4.4 on Flate/LZW streams, the text filters
/ASCIIHexDecode, /ASCII85Decode and /RunLengthDecode, multi-member
filter CHAINS (`/Filter [/ASCII85Decode /FlateDecode]`, decoded in array
order, Table-6 abbreviations accepted), and Standard-security-handler
ENCRYPTION across the whole Standard-handler ladder — revisions 2/3
(RC4 40–128-bit), V4/R4 /AESV2 (AES-128-CBC), and V5/R6 /AESV3
(PDF 2.0 AES-256: Algorithm-2.B password hash, /UE-wrapped file key).
The AES core is pure Python, validated against the FIPS-197 Appendix
C.1/C.3 vectors, with a T-table fast path for the KDF's bulk
encryption; every derived key is validated against /U BEFORE any
stream is touched (empty user password, the corpus norm). Still out of
scope: password-protected user passwords and CID fonts WITHOUT a
ToUnicode map (no unicode info exists in the file; PyMuPDF shows
U+FFFD there too) — `decode_pdf` in parsers.py first tries PyMuPDF if
importable and falls back here.

Output block schema matches parse_pdf_blocks() input:
    {page: int, bbox: [x0, y0, x1, y1], kind: 'text'|'image', content: str}

`build_simple_pdf` is the matching fixture writer (tests + golden queries
need deterministic PDF bytes without any PDF library).
"""

from __future__ import annotations

import re
import struct
import zlib

# ---------------------------------------------------------------- COS layer

_OBJ_RE = re.compile(rb"(\d+)\s+\d+\s+obj\b")
_STREAM_RE = re.compile(rb"stream\r?\n")
_REF_RE = re.compile(rb"(\d+)\s+\d+\s+R\b")
_NAME_NUM_RE = re.compile(rb"/(\w+)\s+(-?\d+(?:\.\d+)?)")


def _scan_objects(data: bytes) -> dict[int, tuple[bytes, bytes | None]]:
    """objnum → (object source before any stream, raw stream bytes or None)."""
    objects: dict[int, tuple[bytes, bytes | None]] = {}
    for m in _OBJ_RE.finditer(data):
        num = int(m.group(1))
        end = data.find(b"endobj", m.end())
        if end < 0:
            continue
        body = data[m.end():end]
        sm = _STREAM_RE.search(body)
        if sm:
            # Prefer the exact /Length slice (the spec's definition of the
            # stream extent). The endstream heuristic is ambiguous for
            # payloads that END in EOL bytes — ~0.8% of zlib streams end
            # in 0x0A/0x0D (the adler32 tail is uniform), and a blanket
            # rstrip(b"\r\n") ate those real bytes (caught by a raster
            # round-trip regression test). Heuristic kept only for
            # indirect-/Length dicts: strip AT MOST one EOL.
            # (?![0-9]) anchors the number end so an indirect multi-digit
            # reference `/Length 123 0 R` can't backtrack into a bogus
            # direct match of "12" (the lookahead alone rejects only the
            # full number, letting the engine shorten the group).
            lm = re.search(rb"/Length\s+(\d+)(?![0-9])(?!\s+\d+\s+R)",
                           body[: sm.start()])
            stream = None
            if lm:
                # slice from `data` at absolute offsets: the endobj-bounded
                # `body` can be cut short when the binary payload itself
                # contains b"endobj"
                start = m.end() + sm.end()
                n = int(lm.group(1))
                candidate = data[start: start + n]
                # Trust the slice only if what follows is (optional EOL +)
                # `endstream` — a wrong /Length (e.g. a stale value after
                # an incremental update) otherwise truncates the payload.
                tail = data[start + n: start + n + 16]
                if re.match(rb"(\r\n|\r|\n|\s)*endstream", tail):
                    stream = candidate
            if stream is None:
                tail = body.rfind(b"endstream")
                stream = body[sm.end():tail] if tail > sm.end() else b""
                if stream.endswith(b"\r\n"):
                    stream = stream[:-2]
                elif stream.endswith((b"\n", b"\r")):
                    stream = stream[:-1]
            objects[num] = (body[: sm.start()], stream)
        else:
            objects[num] = (body, None)
    # decrypt BEFORE ObjStm expansion: object streams are themselves
    # encrypted, and objects inlined from one are covered by the
    # container's decryption (ISO 32000-1 §7.6.2 Note 2)
    _maybe_decrypt(data, objects)
    _expand_object_streams(objects)
    return objects


# ----------------------------------------------- standard security handler
# ISO 32000-1 §7.6.2-7.6.4: RC4 ("ARC4") with the Standard handler at
# revision 2 (40-bit) and 3 (up to 128-bit) — the legacy encryption that
# dominates scanned/OCR corpora. V4/V5 (AES) is detected and left alone
# (PyMuPDF handles it when importable; no AES primitive in the stdlib).

_PAD = bytes([
    0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41, 0x64, 0x00, 0x4E, 0x56,
    0xFF, 0xFA, 0x01, 0x08, 0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
    0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A,
])


def _rc4(key: bytes, data: bytes) -> bytes:
    S = list(range(256))
    j = 0
    for i in range(256):
        j = (j + S[i] + key[i % len(key)]) & 0xFF
        S[i], S[j] = S[j], S[i]
    out = bytearray()
    i = j = 0
    for b in data:
        i = (i + 1) & 0xFF
        j = (j + S[i]) & 0xFF
        S[i], S[j] = S[j], S[i]
        out.append(b ^ S[(S[i] + S[j]) & 0xFF])
    return bytes(out)


# -- AES-128 (FIPS-197), pure Python — the AESV2 crypt filter of V4 files.
# Validated against the Appendix C.1 test vector (test_pdf.py). Throughput
# is fixture-grade (~1 MB/s); real encrypted corpora go through PyMuPDF
# when importable, exactly like every other PDF path.


def _aes_tables():
    exp = [0] * 510
    log = [0] * 256
    x = 1
    for i in range(255):
        exp[i] = x
        log[x] = i
        xt = ((x << 1) ^ 0x1B) & 0xFF if x & 0x80 else (x << 1)
        x ^= xt  # multiply by the generator 3
    for i in range(255, 510):
        exp[i] = exp[i - 255]

    def rotl8(b: int, n: int) -> int:
        return ((b << n) | (b >> (8 - n))) & 0xFF

    sbox = [0] * 256
    inv_s = [0] * 256
    for a in range(256):
        b = 0 if a == 0 else exp[255 - log[a]]
        s = b ^ rotl8(b, 1) ^ rotl8(b, 2) ^ rotl8(b, 3) ^ rotl8(b, 4) ^ 0x63
        sbox[a] = s
        inv_s[s] = a

    def gmul(a: int, b: int) -> int:
        if a == 0 or b == 0:
            return 0
        return exp[log[a] + log[b]]

    return sbox, inv_s, gmul


_AES_SBOX, _AES_INV_SBOX, _GMUL = _aes_tables()


def _aes_round_keys(key: bytes) -> list[list[list[int]]]:
    """Key expansion for AES-128 (Nk=4, 10 rounds) and AES-256 (Nk=8,
    14 rounds — the extra SubWord at i % 8 == 4 per FIPS-197 §5.2)."""
    nk = len(key) // 4
    assert nk in (4, 8)
    nr = {4: 10, 8: 14}[nk]
    rcon = 1
    w = [list(key[i:i + 4]) for i in range(0, len(key), 4)]
    for i in range(nk, 4 * (nr + 1)):
        t = list(w[i - 1])
        if i % nk == 0:
            t = t[1:] + t[:1]
            t = [_AES_SBOX[b] for b in t]
            t[0] ^= rcon
            rcon = ((rcon << 1) ^ 0x1B) & 0xFF if rcon & 0x80 else rcon << 1
        elif nk == 8 and i % nk == 4:
            t = [_AES_SBOX[b] for b in t]
        w.append([a ^ b for a, b in zip(w[i - nk], t)])
    return [w[4 * r:4 * r + 4] for r in range(nr + 1)]


def _aes_block(block: bytes, rks, encrypt: bool) -> bytes:
    # state is column-major: state[col][row]
    nr = len(rks) - 1
    state = [list(block[i:i + 4]) for i in range(0, 16, 4)]

    def add_rk(rk):
        for c in range(4):
            for r in range(4):
                state[c][r] ^= rk[c][r]

    if encrypt:
        add_rk(rks[0])
        for rnd in range(1, nr + 1):
            for c in range(4):
                for r in range(4):
                    state[c][r] = _AES_SBOX[state[c][r]]
            for r in range(1, 4):  # ShiftRows: row r rotates left by r
                row = [state[c][r] for c in range(4)]
                row = row[r:] + row[:r]
                for c in range(4):
                    state[c][r] = row[c]
            if rnd != nr:
                for c in range(4):
                    a = [state[c][r] for r in range(4)]
                    state[c][0] = _GMUL(a[0], 2) ^ _GMUL(a[1], 3) ^ a[2] ^ a[3]
                    state[c][1] = a[0] ^ _GMUL(a[1], 2) ^ _GMUL(a[2], 3) ^ a[3]
                    state[c][2] = a[0] ^ a[1] ^ _GMUL(a[2], 2) ^ _GMUL(a[3], 3)
                    state[c][3] = _GMUL(a[0], 3) ^ a[1] ^ a[2] ^ _GMUL(a[3], 2)
            add_rk(rks[rnd])
    else:
        add_rk(rks[nr])
        for rnd in range(nr - 1, -1, -1):
            for r in range(1, 4):  # InvShiftRows: row r rotates right by r
                row = [state[c][r] for c in range(4)]
                row = row[-r:] + row[:-r]
                for c in range(4):
                    state[c][r] = row[c]
            for c in range(4):
                for r in range(4):
                    state[c][r] = _AES_INV_SBOX[state[c][r]]
            add_rk(rks[rnd])
            if rnd != 0:
                for c in range(4):
                    a = [state[c][r] for r in range(4)]
                    state[c][0] = (_GMUL(a[0], 14) ^ _GMUL(a[1], 11)
                                   ^ _GMUL(a[2], 13) ^ _GMUL(a[3], 9))
                    state[c][1] = (_GMUL(a[0], 9) ^ _GMUL(a[1], 14)
                                   ^ _GMUL(a[2], 11) ^ _GMUL(a[3], 13))
                    state[c][2] = (_GMUL(a[0], 13) ^ _GMUL(a[1], 9)
                                   ^ _GMUL(a[2], 14) ^ _GMUL(a[3], 11))
                    state[c][3] = (_GMUL(a[0], 11) ^ _GMUL(a[1], 13)
                                   ^ _GMUL(a[2], 9) ^ _GMUL(a[3], 14))
    return bytes(state[c][r] for c in range(4) for r in range(4))


def _aes_enc_tables():
    """T-tables (SubBytes+ShiftRows+MixColumns fused into four 32-bit
    lookups per column) — the classic software-AES speedup; the
    Algorithm-2.B KDF encrypts ~8k blocks per invocation, which the
    simple byte-loop form does ~5× slower (cross-checked against
    `_aes_block` in the tests)."""
    t0 = [0] * 256
    t1 = [0] * 256
    t2 = [0] * 256
    t3 = [0] * 256
    for x in range(256):
        s = _AES_SBOX[x]
        s2 = _GMUL(s, 2)
        s3 = _GMUL(s, 3)
        t0[x] = (s2 << 24) | (s << 16) | (s << 8) | s3
        t1[x] = (s3 << 24) | (s2 << 16) | (s << 8) | s
        t2[x] = (s << 24) | (s3 << 16) | (s2 << 8) | s
        t3[x] = (s << 24) | (s << 16) | (s3 << 8) | s2
    return t0, t1, t2, t3


_AES_T = _aes_enc_tables()


def _rk_words(rks) -> list[list[int]]:
    """Round keys as one 32-bit word per column (row0 in the high byte)."""
    return [
        [(rk[c][0] << 24) | (rk[c][1] << 16) | (rk[c][2] << 8) | rk[c][3]
         for c in range(4)]
        for rk in rks
    ]


def _aes_encrypt_words(d0, d1, d2, d3, rkw):
    """One AES block encrypt over four 32-bit column words (row 0 in the
    high byte) → four words. Unrolled locals instead of the former
    per-round 4-list comprehension — the list allocation + indexing was
    ~2× the arithmetic (optimization r16; q121's Algorithm-2.B KDF runs
    ~18k CHAINED blocks per validation on one executor task, so only
    constant-factor work here moves it). Word values stay 32-bit, so the
    top-byte shifts need no mask."""
    t0, t1, t2, t3 = _AES_T
    sbox = _AES_SBOX
    nr = len(rkw) - 1
    rk = rkw[0]
    w0 = d0 ^ rk[0]
    w1 = d1 ^ rk[1]
    w2 = d2 ^ rk[2]
    w3 = d3 ^ rk[3]
    for rnd in range(1, nr):
        rk = rkw[rnd]
        x0 = (t0[w0 >> 24] ^ t1[(w1 >> 16) & 255]
              ^ t2[(w2 >> 8) & 255] ^ t3[w3 & 255] ^ rk[0])
        x1 = (t0[w1 >> 24] ^ t1[(w2 >> 16) & 255]
              ^ t2[(w3 >> 8) & 255] ^ t3[w0 & 255] ^ rk[1])
        x2 = (t0[w2 >> 24] ^ t1[(w3 >> 16) & 255]
              ^ t2[(w0 >> 8) & 255] ^ t3[w1 & 255] ^ rk[2])
        x3 = (t0[w3 >> 24] ^ t1[(w0 >> 16) & 255]
              ^ t2[(w1 >> 8) & 255] ^ t3[w2 & 255] ^ rk[3])
        w0, w1, w2, w3 = x0, x1, x2, x3
    rk = rkw[nr]
    return (
        ((sbox[w0 >> 24] << 24) | (sbox[(w1 >> 16) & 255] << 16)
         | (sbox[(w2 >> 8) & 255] << 8) | sbox[w3 & 255]) ^ rk[0],
        ((sbox[w1 >> 24] << 24) | (sbox[(w2 >> 16) & 255] << 16)
         | (sbox[(w3 >> 8) & 255] << 8) | sbox[w0 & 255]) ^ rk[1],
        ((sbox[w2 >> 24] << 24) | (sbox[(w3 >> 16) & 255] << 16)
         | (sbox[(w0 >> 8) & 255] << 8) | sbox[w1 & 255]) ^ rk[2],
        ((sbox[w3 >> 24] << 24) | (sbox[(w0 >> 16) & 255] << 16)
         | (sbox[(w1 >> 8) & 255] << 8) | sbox[w2 & 255]) ^ rk[3],
    )


def _aes_encrypt_block_fast(block: bytes, rkw: list[list[int]]) -> bytes:
    w = _aes_encrypt_words(*struct.unpack(">4I", block), rkw)
    return struct.pack(">4I", *w)


def _aes_cbc_encrypt(key: bytes, iv: bytes, data: bytes) -> bytes:
    """IV + CBC ciphertext with the spec's always-pad (1..16 bytes, each
    byte = pad length) — the AESV2 stream layout (§7.6.2)."""
    rkw = _rk_words(_aes_round_keys(key))
    pad = 16 - (len(data) % 16)
    data = data + bytes([pad]) * pad
    out = bytearray(iv)
    p0, p1, p2, p3 = struct.unpack(">4I", iv)
    for i in range(0, len(data), 16):
        d0, d1, d2, d3 = struct.unpack_from(">4I", data, i)
        p0, p1, p2, p3 = _aes_encrypt_words(
            d0 ^ p0, d1 ^ p1, d2 ^ p2, d3 ^ p3, rkw
        )
        out += struct.pack(">4I", p0, p1, p2, p3)
    return bytes(out)


def _aes_cbc_decrypt(key: bytes, data: bytes) -> bytes | None:
    """Inverse of `_aes_cbc_encrypt`; None for malformed ciphertext."""
    if len(data) < 32 or len(data) % 16:
        return None
    rks = _aes_round_keys(key)
    prev = data[:16]
    out = bytearray()
    for i in range(16, len(data), 16):
        blk = data[i:i + 16]
        out += bytes(a ^ b for a, b in zip(_aes_block(blk, rks, False), prev))
        prev = blk
    pad = out[-1]
    if not 1 <= pad <= 16:
        return None
    return bytes(out[:-pad])


def _aes_cbc_raw(key: bytes, iv: bytes, data: bytes,
                 encrypt: bool) -> bytes:
    """CBC without padding or an embedded IV — the form the R6 KDF and
    the /UE//OE key wrapping use (data length must be a block multiple)."""
    rks = _aes_round_keys(key)
    out = bytearray()
    prev = iv
    if encrypt:
        rkw = _rk_words(rks)
        p0, p1, p2, p3 = struct.unpack(">4I", iv)
        for i in range(0, len(data), 16):
            d0, d1, d2, d3 = struct.unpack_from(">4I", data, i)
            p0, p1, p2, p3 = _aes_encrypt_words(
                d0 ^ p0, d1 ^ p1, d2 ^ p2, d3 ^ p3, rkw
            )
            out += struct.pack(">4I", p0, p1, p2, p3)
    else:
        for i in range(0, len(data), 16):
            blk = data[i:i + 16]
            out += bytes(
                a ^ b for a, b in zip(_aes_block(blk, rks, False), prev)
            )
            prev = blk
    return bytes(out)


def _hash_2b(pwd: bytes, salt: bytes, udata: bytes) -> bytes:
    """ISO 32000-2 Algorithm 2.B — the R6 password hash: an iterated
    SHA-256/384/512 schedule keyed by AES-128-CBC of the running state.
    (256 ≡ 1 mod 3, so the spec's big-endian-mod-3 of E's first 16 bytes
    equals the byte-sum mod 3.) Round-trip/self-consistency tested; real
    R6 corpora additionally go through PyMuPDF when importable."""
    import hashlib

    k = hashlib.sha256(pwd + salt + udata).digest()
    i = 0
    while True:
        k1 = (pwd + k + udata) * 64
        e = _aes_cbc_raw(k[:16], k[16:32], k1, True)
        mod = sum(e[:16]) % 3
        k = (hashlib.sha256, hashlib.sha384, hashlib.sha512)[mod](e).digest()
        i += 1
        if i >= 64 and e[-1] <= i - 32:
            return k[:32]


def _std_file_key(o: bytes, p: int, id0: bytes, r: int, nbytes: int,
                  user_pw: bytes = b"",
                  encrypt_metadata: bool = True) -> bytes:
    """Algorithm 2: the file encryption key from the (empty by default)
    user password. R4 with /EncryptMetadata false appends ffffffff."""
    import hashlib
    import struct

    pw = (user_pw + _PAD)[:32]
    seed = pw + o[:32] + struct.pack("<i", p) + id0
    if r >= 4 and not encrypt_metadata:
        seed += b"\xff\xff\xff\xff"
    h = hashlib.md5(seed).digest()
    if r >= 3:
        for _ in range(50):
            h = hashlib.md5(h[:nbytes]).digest()
    return h[:nbytes]


def _obj_key(key: bytes, num: int, gen: int = 0, aes: bool = False) -> bytes:
    """Algorithm 1: the per-object key (AESV2 appends the 'sAlT' marker)."""
    import hashlib

    ext = key + bytes([
        num & 0xFF, (num >> 8) & 0xFF, (num >> 16) & 0xFF,
        gen & 0xFF, (gen >> 8) & 0xFF,
    ])
    if aes:
        ext += b"sAlT"
    return hashlib.md5(ext).digest()[: min(len(key) + 5, 16)]


def _string_value(src: bytes, key: bytes) -> bytes | None:
    """The byte value of `/key (literal)` or `/key <hex>` in a dict —
    binary-safe literal parsing (nesting + escapes), unlike the text-side
    `_decode_literal`."""
    m = re.search(re.escape(key) + rb"\s*(\(|<)", src)
    if not m:
        return None
    i = m.end()
    if m.group(1) == b"<":
        end = src.find(b">", i)
        if end < 0:
            return None
        hexs = re.sub(rb"\s", b"", src[i:end])
        if len(hexs) % 2:
            hexs += b"0"
        try:
            return bytes.fromhex(hexs.decode("ascii"))
        except ValueError:
            return None
    out = bytearray()
    depth = 1
    esc = {ord("n"): 10, ord("r"): 13, ord("t"): 9, ord("b"): 8,
           ord("f"): 12}
    while i < len(src):
        c = src[i]
        if c == 0x5C:  # backslash
            i += 1
            if i >= len(src):
                break
            c2 = src[i]
            if c2 in esc:
                out.append(esc[c2])
            elif 0x30 <= c2 <= 0x37:  # \ooo octal, 1-3 digits
                oct_digits = [c2 - 0x30]
                while (len(oct_digits) < 3 and i + 1 < len(src)
                       and 0x30 <= src[i + 1] <= 0x37):
                    i += 1
                    oct_digits.append(src[i] - 0x30)
                v = 0
                for d in oct_digits:
                    v = v * 8 + d
                out.append(v & 0xFF)
            else:
                out.append(c2)  # \( \) \\ and unknown escapes: literal
        elif c == 0x28:  # (
            depth += 1
            out.append(c)
        elif c == 0x29:  # )
            depth -= 1
            if depth == 0:
                return bytes(out)
            out.append(c)
        else:
            out.append(c)
        i += 1
    return None


def _maybe_decrypt(data: bytes, objects: dict) -> None:
    """Detect a Standard-handler /Encrypt dict and RC4-decrypt every
    stream in place (per-object keys, generation 0 — the scanner's
    assumption throughout). No-op for unencrypted files, non-Standard
    handlers, and V>=4 (AES). The default empty user password is the
    scanned-corpus norm; XRef streams stay plaintext per spec."""
    enc = None
    for m in re.finditer(rb"/Encrypt\s+(\d+)\s+\d+\s+R", data):
        enc = int(m.group(1))
    if enc is None or enc not in objects:
        return
    src = objects[enc][0]
    if b"/Standard" not in src:
        return
    vm = re.search(rb"/V\s+(\d+)", src)
    v = int(vm.group(1)) if vm else 1
    aes = False
    if v >= 5:
        # V5/R6 (PDF 2.0, /AESV3): the file key is wrapped in /UE, the
        # password check is the Algorithm-2.B hash against /U — no
        # per-object keys, streams are AES-256-CBC under the file key
        u = _string_value(src, b"/U")
        ue = _string_value(src, b"/UE")
        if not (b"/AESV3" in src and u and ue and len(u) >= 48
                and len(ue) >= 32):
            return
        vsalt, ksalt = u[32:40], u[40:48]
        if _hash_2b(b"", vsalt, b"") != u[:32]:
            return  # non-empty user password — leave the file encrypted
        fkey = _aes_cbc_raw(_hash_2b(b"", ksalt, b""), b"\x00" * 16,
                            ue[:32], False)
        for num, (osrc, stream) in objects.items():
            if stream is None or num == enc:
                continue
            if re.search(rb"/Type\s*/XRef\b", osrc):
                continue
            dec = _aes_cbc_decrypt(fkey, stream)
            objects[num] = (osrc, dec if dec is not None else b"")
        return
    if v >= 4:
        # V4 names its stream scheme via crypt filters: /AESV2 is the
        # AES-128-CBC path implemented here; /V2 inside /CF is RC4 with
        # per-object keys (same as V2)
        if b"/AESV2" in src:
            aes = True
        elif b"/V2" not in src:
            return
    rm = re.search(rb"/R\s+(\d+)", src)
    pm = re.search(rb"/P\s+(-?\d+)", src)
    o = _string_value(src, b"/O")
    if not (rm and pm and o):
        return
    r = int(rm.group(1))
    lm = re.search(rb"/Length\s+(\d+)", src)
    nbytes = (int(lm.group(1)) // 8) if lm else 5
    if aes:
        nbytes = 16  # AESV2 is AES-128 regardless of the outer /Length
    enc_meta = not re.search(rb"/EncryptMetadata\s+false", src)
    id0 = b""
    for m in re.finditer(rb"/ID\s*\[\s*<([0-9A-Fa-f]+)>", data):
        id0 = bytes.fromhex(m.group(1).decode("ascii"))
    # wrap P to signed 32-bit (files store it either way)
    p = int(pm.group(1))
    if p > 0x7FFFFFFF:
        p -= 0x100000000
    key = _std_file_key(o, p, id0, r, nbytes, encrypt_metadata=enc_meta)
    # Algorithm 6: validate the derived key against /U BEFORE touching any
    # stream — a non-empty user password (or an /ID form the regex above
    # didn't parse) would otherwise RC4 every stream into silent garbage
    # that flows downstream as document content. On mismatch the file is
    # left encrypted: Flate streams then fail to inflate and pages yield
    # no blocks, the honest "cannot decode" outcome.
    u = _string_value(src, b"/U")
    if u is None:
        return
    if r == 2:
        if _rc4(key, _PAD) != u[:32]:
            return
    else:
        import hashlib

        expect = _rc4(key, hashlib.md5(_PAD + id0).digest())
        for i in range(1, 20):
            expect = _rc4(bytes(b ^ i for b in key), expect)
        if expect != u[:16]:
            return
    for num, (osrc, stream) in objects.items():
        if stream is None or num == enc:
            continue
        if re.search(rb"/Type\s*/XRef\b", osrc):
            continue  # cross-reference streams are never encrypted
        if aes:
            dec = _aes_cbc_decrypt(_obj_key(key, num, aes=True), stream)
            objects[num] = (osrc, dec if dec is not None else b"")
        else:
            objects[num] = (osrc, _rc4(_obj_key(key, num), stream))


def _expand_object_streams(objects) -> None:
    """Inline the contents of /ObjStm object streams (ISO 32000-1 §7.5.7,
    the PDF 1.5+ layout where most non-stream objects live compressed):
    the decoded stream is `/N` (objnum, offset) integer pairs followed by
    the serialized objects at `/First` + offset. Each contained object
    joins the map as a plain (body, None) entry, so the page-tree walk and
    font/CMap loads see them exactly like top-level objects. A top-level
    object with the same number wins (it is the incremental update)."""
    for num in list(objects):
        src, stream = objects[num]
        if b"/ObjStm" not in src or stream is None:
            continue
        data = _decode_stream(src, stream)
        mn = re.search(rb"/N\s+(\d+)", src)
        mf = re.search(rb"/First\s+(\d+)", src)
        if data is None or not (mn and mf):
            continue
        n, first = int(mn.group(1)), int(mf.group(1))
        header = data[:first].split()
        if len(header) < 2 * n:
            continue
        pairs = [(int(header[2 * i]), int(header[2 * i + 1]))
                 for i in range(n)]
        for i, (objnum, off) in enumerate(pairs):
            end = first + pairs[i + 1][1] if i + 1 < n else len(data)
            body = data[first + off: end]
            if objnum not in objects:
                objects[objnum] = (body, None)


def _dict_src(objects, num: int) -> bytes:
    return objects.get(num, (b"", None))[0]


def _first_ref(src: bytes, key: bytes) -> int | None:
    m = re.search(rb"/" + key + rb"\s+(\d+)\s+\d+\s+R", src)
    return int(m.group(1)) if m else None


def _all_refs(src: bytes, key: bytes) -> list[int]:
    """Refs under /Key — either `/Key N 0 R` or `/Key [N 0 R M 0 R …]`."""
    m = re.search(rb"/" + key + rb"\s*\[(.*?)\]", src, re.S)
    if m:
        return [int(r.group(1)) for r in _REF_RE.finditer(m.group(1))]
    one = _first_ref(src, key)
    return [one] if one is not None else []


def _decode_parms(dict_src: bytes) -> dict:
    """Predictor parameters from /DecodeParms (dict or 1-element array)."""
    m = re.search(rb"/DecodeParms\s*\[?\s*<<(.*?)>>", dict_src, re.S)
    src = m.group(1) if m else b""

    def num(key: bytes, default: int) -> int:
        mm = re.search(rb"/" + key + rb"\s+(\d+)", src)
        return int(mm.group(1)) if mm else default

    return {
        "predictor": num(b"Predictor", 1),
        "columns": num(b"Columns", 1),
        "colors": num(b"Colors", 1),
        "early_change": num(b"EarlyChange", 1),
    }


def _apply_predictor(data: bytes, predictor: int, columns: int,
                     colors: int) -> bytes:
    """Undo the TIFF (2) / PNG (10-15) predictors of ISO 32000-1 §7.4.4.4
    at 8 bits per component — the form every Flate/LZW-predicted PDF
    stream in practice uses (xref streams, predicted image rasters)."""
    if predictor <= 1:
        return data
    bpp = colors          # bytes per pixel at 8 bpc
    row_len = columns * colors
    if row_len <= 0:
        return data
    if predictor == 2:    # TIFF horizontal differencing
        out = bytearray(data)
        for r0 in range(0, len(out) - row_len + 1, row_len):
            for j in range(bpp, row_len):
                out[r0 + j] = (out[r0 + j] + out[r0 + j - bpp]) & 0xFF
        return bytes(out)
    # PNG predictors: every row is prefixed by its filter-type byte
    out = bytearray()
    prev = bytearray(row_len)
    stride = row_len + 1
    i = 0
    while i + stride <= len(data):
        ft = data[i]
        row = bytearray(data[i + 1: i + stride])
        i += stride
        if ft == 1:       # Sub
            for j in range(bpp, row_len):
                row[j] = (row[j] + row[j - bpp]) & 0xFF
        elif ft == 2:     # Up
            for j in range(row_len):
                row[j] = (row[j] + prev[j]) & 0xFF
        elif ft == 3:     # Average
            for j in range(row_len):
                left = row[j - bpp] if j >= bpp else 0
                row[j] = (row[j] + ((left + prev[j]) >> 1)) & 0xFF
        elif ft == 4:     # Paeth
            for j in range(row_len):
                a = row[j - bpp] if j >= bpp else 0
                b = prev[j]
                c = prev[j - bpp] if j >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                row[j] = (row[j] + pred) & 0xFF
        out += row
        prev = row
    return bytes(out)


def _lzw_decode(data: bytes, early_change: int = 1) -> bytes | None:
    """PDF-variant LZW (ISO 32000-1 §7.4.4.2): MSB-first 9→12-bit codes,
    256 = clear table, 257 = end of data, `early_change` widens the code
    size one entry early (the spec default). Returns None on malformed
    input rather than raising — callers treat it like any other
    undecodable stream."""
    table: list[bytes] = [bytes([i]) for i in range(256)] + [b"", b""]
    width, prev = 9, None
    out = bytearray()
    bitbuf = nbits = 0
    for byte in data:
        bitbuf = (bitbuf << 8) | byte
        nbits += 8
        while nbits >= width:
            code = (bitbuf >> (nbits - width)) & ((1 << width) - 1)
            nbits -= width
            if code == 256:
                table = [bytes([i]) for i in range(256)] + [b"", b""]
                width, prev = 9, None
                continue
            if code == 257:
                return bytes(out)
            if prev is None:
                if code >= len(table):
                    return None
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(prev + entry[:1])
            elif code == len(table):     # the KwKwK case
                entry = prev + prev[:1]
                table.append(entry)
            else:
                return None
            out += entry
            prev = entry
            # width bump: the ENCODER widens after adding entry value
            # 511 (spec: "increase ... when it adds entry 511", early
            # change); the decoder lags one entry behind, so it widens
            # after ITS table adds value 510 — len(table) == 511.
            # (r15: was >= (1<<width)-1, one entry EARLY on both sides
            # of our pair — self-consistent, so round trips never saw
            # it, but real-world streams crossing a width boundary
            # misaligned; caught by javax.imageio TIFF parity.)
            if (len(table) + early_change >= (1 << width)
                    and width < 12):
                width += 1
    return bytes(out)    # tolerated: EOD marker missing at end of data


def _ascii_hex_decode(data: bytes) -> bytes | None:
    """/ASCIIHexDecode (ISO 32000-1 §7.4.2): hex pairs, whitespace ignored,
    `>` is EOD, a dangling final digit is padded with 0."""
    out = bytearray()
    hi = -1
    for b in data:
        if b == 0x3E:              # '>'
            break
        if b in b" \t\r\n\x0c\x00":
            continue
        c = chr(b)
        if c not in "0123456789abcdefABCDEF":
            return None
        v = int(c, 16)
        if hi < 0:
            hi = v
        else:
            out.append(hi * 16 + v)
            hi = -1
    if hi >= 0:
        out.append(hi * 16)
    return bytes(out)


def _ascii85_decode(data: bytes) -> bytes | None:
    """/ASCII85Decode (ISO 32000-1 §7.4.3): base-85 groups of 5 chars →
    4 bytes, `z` = a zero group, `~>` is EOD, whitespace ignored; a final
    partial group of k chars yields k-1 bytes."""
    if data.startswith(b"<~"):
        data = data[2:]
    end = data.find(b"~>")
    if end != -1:
        data = data[:end]
    out = bytearray()
    group: list[int] = []
    for b in data:
        if b in b" \t\r\n\x0c\x00":
            continue
        if b == 0x7A:              # 'z'
            if group:
                return None        # z inside a group is malformed
            out += b"\x00\x00\x00\x00"
            continue
        if not 33 <= b <= 117:     # '!' … 'u'
            return None
        group.append(b - 33)
        if len(group) == 5:
            n = 0
            for g in group:
                n = n * 85 + g
            if n > 0xFFFFFFFF:
                return None
            out += n.to_bytes(4, "big")
            group = []
    if group:
        if len(group) == 1:
            return None            # 1 leftover char encodes nothing
        k = len(group)
        group += [84] * (5 - k)    # pad with 'u'
        n = 0
        for g in group:
            n = n * 85 + g
        out += n.to_bytes(4, "big")[: k - 1]
    return bytes(out)


def _run_length_decode(data: bytes) -> bytes | None:
    """/RunLengthDecode (ISO 32000-1 §7.4.5): length byte L — L < 128
    copies the next L+1 bytes literally, L > 128 repeats the next byte
    257-L times, L == 128 is EOD."""
    out = bytearray()
    i = 0
    while i < len(data):
        l = data[i]
        i += 1
        if l == 128:
            return bytes(out)
        if l < 128:
            if i + l + 1 > len(data):
                return None
            out += data[i: i + l + 1]
            i += l + 1
        else:
            if i >= len(data):
                return None
            out += bytes([data[i]]) * (257 - l)
            i += 1
    return bytes(out)              # tolerated: EOD marker missing


# canonical names + the ISO 32000-1 Table 6 abbreviations
_TEXT_FILTERS = {
    b"FlateDecode": "flate", b"Fl": "flate",
    b"LZWDecode": "lzw", b"LZW": "lzw",
    b"ASCIIHexDecode": "ahx", b"AHx": "ahx",
    b"ASCII85Decode": "a85", b"A85": "a85",
    b"RunLengthDecode": "rl", b"RL": "rl",
}


def _filter_chain(dict_src: bytes) -> list[bytes]:
    """The /Filter entry as an ordered name list — a bare name or an
    array (`/Filter [/ASCII85Decode /FlateDecode]` means: the stored
    bytes are ASCII85 OVER Flate; decode in array order)."""
    m = re.search(rb"/Filter\s*(\[[^\]]*\]|/[A-Za-z0-9]+)", dict_src)
    if not m:
        return []
    return re.findall(rb"/([A-Za-z0-9]+)", m.group(1))


def _decode_stream(dict_src: bytes, stream: bytes) -> bytes | None:
    """Apply the stream's full filter CHAIN in order. Supported:
    Flate, LZW, ASCIIHex, ASCII85, RunLength (+ Table-6 abbreviations);
    anything else in the chain (DCT, JPX, CCITT, Crypt) returns None —
    rasters with those codecs are handled by their dedicated paths
    (`jpeg_image_xobject`) or by PyMuPDF when importable."""
    names = _filter_chain(dict_src)
    if not names:
        return stream
    data = stream
    for name in names:
        kind = _TEXT_FILTERS.get(name)
        if kind == "flate":
            try:
                data = zlib.decompress(data)
            except zlib.error:
                return None
        elif kind == "lzw":
            data = _lzw_decode(data, _decode_parms(dict_src)["early_change"])
        elif kind == "ahx":
            data = _ascii_hex_decode(data)
        elif kind == "a85":
            data = _ascii85_decode(data)
        elif kind == "rl":
            data = _run_length_decode(data)
        else:                      # unsupported filter (DCT, JPX, CCITT…)
            return None
        if data is None:
            return None
    p = _decode_parms(dict_src)
    return _apply_predictor(data, p["predictor"], p["columns"], p["colors"])


def _page_numbers(objects) -> list[int]:
    """Walk the page tree in order; fall back to scan order of /Type/Page."""
    root = None
    for num, (src, _) in objects.items():
        if b"/Type" in src and b"/Catalog" in src:
            root = num
            break
    ordered: list[int] = []

    def walk(num: int) -> None:
        src = _dict_src(objects, num)
        if b"/Page" in src and b"/Pages" not in src and b"/Kids" not in src:
            ordered.append(num)
            return
        for kid in _all_refs(src, b"Kids"):
            walk(kid)

    if root is not None:
        pages_ref = _first_ref(_dict_src(objects, root), b"Pages")
        if pages_ref is not None:
            walk(pages_ref)
    if not ordered:
        ordered = [
            n for n, (src, _) in sorted(objects.items())
            if b"/Type" in src and re.search(rb"/Page\b", src) and b"/Kids" not in src
        ]
    return ordered


def _dict_body(src: bytes, key: bytes) -> bytes | None:
    """Balanced `<<…>>` body following /Key — a non-greedy regex stops at
    the first `>>` and truncates dictionaries whose entries are themselves
    inline dicts (e.g. a /Font map mixing inline simple fonts and CID font
    refs)."""
    m = re.search(rb"/" + key + rb"\s*<<", src)
    if not m:
        return None
    depth, i = 1, m.end()
    while i < len(src) and depth:
        if src[i : i + 2] == b"<<":
            depth += 1
            i += 2
        elif src[i : i + 2] == b">>":
            depth -= 1
            i += 2
        else:
            i += 1
    return src[m.end() : i - 2] if depth == 0 else None


def _xobject_map(objects, page_src: bytes) -> dict[bytes, int]:
    """/Resources /XObject name → object number (image detection for Do)."""
    res_ref = _first_ref(page_src, b"Resources")
    res_src = _dict_src(objects, res_ref) if res_ref is not None else page_src
    body = _dict_body(res_src, b"XObject")
    if body is None:
        return {}
    return {
        nm.group(1): int(nm.group(2))
        for nm in re.finditer(rb"/(\w+)\s+(\d+)\s+\d+\s+R", body)
    }


# ------------------------------------------------------------- font layer

_HEX_PAIR_RE = re.compile(rb"<([0-9A-Fa-f]+)>")


def _parse_tounicode(cmap: bytes) -> tuple[int, dict[int, str]]:
    """Parse a /ToUnicode CMap stream (PDF 32000-1 §9.10.3) into
    (code_width_bytes, {code: unicode_str}).

    Handles begincodespacerange (code width), beginbfchar (pairs
    `<src> <dst>`) and beginbfrange (`<lo> <hi> <dst0>` increments the LAST
    dst code unit, or `<lo> <hi> [<d0> <d1> …]` explicit array) — the three
    constructs real-world ToUnicode CMaps use. Destinations are UTF-16BE
    (can be multi-unit, e.g. ligature expansions)."""
    nbytes = 1
    m = re.search(rb"begincodespacerange(.*?)endcodespacerange", cmap, re.S)
    if m:
        pairs = _HEX_PAIR_RE.findall(m.group(1))
        if pairs:
            nbytes = max(1, len(pairs[0]) // 2)

    def dst_str(hexdigits: bytes) -> str:
        raw = bytes.fromhex(hexdigits.decode("ascii"))
        try:
            return raw.decode("utf-16-be")
        except UnicodeDecodeError:
            return "�"

    table: dict[int, str] = {}
    for m in re.finditer(rb"beginbfchar(.*?)endbfchar", cmap, re.S):
        toks = _HEX_PAIR_RE.findall(m.group(1))
        for src, dst in zip(toks[0::2], toks[1::2]):
            table[int(src, 16)] = dst_str(dst)
    for m in re.finditer(rb"beginbfrange(.*?)endbfrange", cmap, re.S):
        body = m.group(1)
        # array form: <lo> <hi> [<d0> <d1> ...]
        for am in re.finditer(
            rb"<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>\s*\[(.*?)\]", body, re.S
        ):
            lo, hi = int(am.group(1), 16), int(am.group(2), 16)
            dsts = _HEX_PAIR_RE.findall(am.group(3))
            for off, d in enumerate(dsts):
                if lo + off <= hi:
                    table[lo + off] = dst_str(d)
        # increment form: <lo> <hi> <dst> (last UTF-16 unit increments).
        # Strip WHOLE array entries — lo/hi included — or their orphaned
        # <lo> <hi> tokens would shift the 3-token grouping below whenever
        # an array entry precedes an increment entry.
        body_wo_arrays = re.sub(
            rb"<[0-9A-Fa-f]+>\s*<[0-9A-Fa-f]+>\s*\[.*?\]", b"", body, flags=re.S
        )
        toks = _HEX_PAIR_RE.findall(body_wo_arrays)
        for lo_h, hi_h, dst_h in zip(toks[0::3], toks[1::3], toks[2::3]):
            lo, hi = int(lo_h, 16), int(hi_h, 16)
            base = dst_str(dst_h)
            for off in range(hi - lo + 1):
                table[lo + off] = base[:-1] + chr(ord(base[-1]) + off) if base else ""
    return nbytes, table


def _load_fonts(objects, page_src: bytes) -> dict[bytes, tuple[int, dict[int, str]]]:
    """/Resources /Font name → (code_width, ToUnicode table) for fonts that
    CARRY a /ToUnicode CMap (CID/Type0 or simple fonts with explicit maps).
    Fonts without one fall through to Latin-1 passthrough in the
    interpreter — matching what the bytes literally say."""
    res_ref = _first_ref(page_src, b"Resources")
    res_src = _dict_src(objects, res_ref) if res_ref is not None else page_src
    body = _dict_body(res_src, b"Font")
    if body is None:
        return {}
    out: dict[bytes, tuple[int, dict[int, str]]] = {}
    for nm in re.finditer(rb"/(\w+)\s+(\d+)\s+\d+\s+R", body):
        name, ref = nm.group(1), int(nm.group(2))
        font_src = _dict_src(objects, ref)
        tu_ref = _first_ref(font_src, b"ToUnicode")
        if tu_ref is None:
            continue
        dict_src, stream = objects.get(tu_ref, (b"", None))
        if stream is None:
            continue
        decoded = _decode_stream(dict_src, stream)
        if decoded:
            out[name] = _parse_tounicode(decoded)
    return out


# ------------------------------------------------------- content stream layer

_STR_ESCAPES = {
    b"n": "\n", b"r": "\r", b"t": "\t", b"b": "\b", b"f": "\f",
    b"(": "(", b")": ")", b"\\": "\\",
}

_TOKEN_RE = re.compile(
    rb"\((?:\\.|[^\\()])*\)"        # literal string (1-level; escapes ok)
    rb"|<[0-9A-Fa-f\s]*>"           # hex string
    rb"|\[|\]"
    rb"|/\w+"
    rb"|-?\d*\.?\d+"
    rb"|[A-Za-z'\"*]+",
    re.S,
)


def _decode_literal(tok: bytes) -> str:
    out: list[str] = []
    body = tok[1:-1]
    i = 0
    while i < len(body):
        c = body[i:i + 1]
        if c == b"\\" and i + 1 < len(body):
            nxt = body[i + 1:i + 2]
            if nxt in _STR_ESCAPES:
                out.append(_STR_ESCAPES[nxt])
                i += 2
            elif nxt.isdigit():
                octal = body[i + 1:i + 4]
                j = 1
                while j < 3 and body[i + j:i + j + 1].isdigit():
                    j += 1
                out.append(chr(int(body[i + 1:i + 1 + j], 8) & 0xFF))
                i += 1 + j
            elif nxt in (b"\n", b"\r"):   # line continuation
                i += 2
            else:
                out.append(nxt.decode("latin-1"))
                i += 2
        else:
            out.append(c.decode("latin-1"))
            i += 1
    return "".join(out)


def _decode_hex(tok: bytes) -> str:
    digits = re.sub(rb"\s", b"", tok[1:-1])
    if len(digits) % 2:
        digits += b"0"
    return bytes.fromhex(digits.decode("ascii")).decode("latin-1")


class _TextRun:
    __slots__ = ("x", "y", "size", "text")

    def __init__(self, x: float, y: float, size: float, text: str):
        self.x, self.y, self.size, self.text = x, y, size, text


def _interpret(content: bytes, xobjects: dict[bytes, int], objects,
               page_no: int,
               fonts: dict[bytes, tuple[int, dict[int, str]]] | None = None,
               ) -> tuple[list[_TextRun], list[dict]]:
    """One pass over a page's content stream: text runs + image blocks."""
    fonts = fonts or {}
    runs: list[_TextRun] = []
    images: list[dict] = []
    stack: list[object] = []
    size = 12.0
    leading = 0.0
    tx = ty = 0.0          # text-space position (Tm translation + Td offsets)
    ctm = (1.0, 0.0, 0.0, 1.0, 0.0, 0.0)
    cur_font: bytes = b""

    def shownum() -> list[float]:
        return [float(v) for v in stack if isinstance(v, float)]

    def decode_shown(s: str) -> str:
        """Map a shown string through the current font's ToUnicode CMap.
        String tokens are decoded latin-1 (lossless byte carrier); CID fonts
        consume them as big-endian code units of the CMap's code width."""
        fo = fonts.get(cur_font)
        if fo is None:
            return s
        nbytes, table = fo
        raw = s.encode("latin-1", "replace")
        out: list[str] = []
        for i in range(0, len(raw) - nbytes + 1, nbytes):
            code = int.from_bytes(raw[i : i + nbytes], "big")
            out.append(table.get(code, "�"))
        return "".join(out)

    def show(s: str) -> None:
        if s:
            runs.append(_TextRun(tx, ty, size, s))

    for tok in _TOKEN_RE.finditer(content):
        t = tok.group(0)
        if t.startswith(b"("):
            stack.append(_decode_literal(t))
        elif t.startswith(b"<"):
            stack.append(_decode_hex(t))
        elif t in (b"[", b"]"):
            continue          # TJ arrays: strings/numbers already on stack
        elif t.startswith(b"/"):
            stack.append(t[1:])
        elif re.fullmatch(rb"-?\d*\.?\d+", t):
            stack.append(float(t))
        else:
            op = t
            if op == b"Tf":
                nums = shownum()
                if nums:
                    size = nums[-1]
                fname = next(
                    (v for v in reversed(stack) if isinstance(v, bytes)), None
                )
                if fname is not None:
                    cur_font = fname
            elif op in (b"Td", b"TD"):
                nums = shownum()
                if len(nums) >= 2:
                    tx += nums[-2]
                    ty += nums[-1]
                    if op == b"TD":
                        leading = -nums[-1]
            elif op == b"Tm":
                nums = shownum()
                if len(nums) >= 6:
                    tx, ty = nums[-2], nums[-1]
            elif op == b"TL":
                nums = shownum()
                if nums:
                    leading = nums[-1]
            elif op == b"T*":
                ty -= leading if leading else size * 1.2
            elif op == b"BT":
                tx = ty = 0.0
            elif op in (b"Tj", b"TJ"):
                show("".join(decode_shown(v) for v in stack if isinstance(v, str)))
            elif op in (b"'", b'"'):
                ty -= leading if leading else size * 1.2
                show("".join(decode_shown(v) for v in stack if isinstance(v, str)))
            elif op == b"cm":
                nums = shownum()
                if len(nums) >= 6:
                    ctm = tuple(nums[-6:])   # type: ignore[assignment]
            elif op == b"Do":
                name = next(
                    (v for v in reversed(stack) if isinstance(v, bytes)), None
                )
                ref = xobjects.get(name or b"")
                if ref is not None:
                    src = _dict_src(objects, ref)
                    if b"/Image" in src:
                        a, _b, _c, d, e, f = ctm
                        props = dict(
                            (k.decode(), v)
                            for k, v in (
                                (m.group(1), float(m.group(2)))
                                for m in _NAME_NUM_RE.finditer(src)
                            )
                            if k in (b"Width", b"Height")
                        )
                        images.append({
                            "page": page_no,
                            "bbox": [e, f, e + abs(a), f + abs(d)],
                            "kind": "image",
                            "content": "pdf-image "
                            + " ".join(f"{k}={int(v)}" for k, v in sorted(props.items())),
                            # internal: XObject ref for the raster decode
                            # pass (stripped from extract_pdf_blocks output)
                            "ref": ref,
                        })
            stack.clear()
    return runs, images


def _runs_to_blocks(runs: list[_TextRun], page_no: int,
                    block_gap_factor: float = 1.8) -> list[dict]:
    """Group positioned text runs into blocks: a vertical jump larger than
    block_gap_factor × font size starts a new block (the analogue of
    PyMuPDF's layout blocks); smaller jumps are new lines inside a block."""
    blocks: list[dict] = []
    cur: list[_TextRun] = []

    def flush() -> None:
        if not cur:
            return
        lines: list[str] = []
        last_y = None
        for r in cur:
            if last_y is not None and abs(r.y - last_y) > 0.1:
                lines.append(r.text)
            elif lines:
                lines[-1] += r.text
            else:
                lines.append(r.text)
            last_y = r.y
        xs = [r.x for r in cur]
        ys = [r.y for r in cur]
        smax = max(r.size for r in cur)
        width = max(len(line) for line in lines) * smax * 0.5
        blocks.append({
            "page": page_no,
            "bbox": [min(xs), min(ys) - smax * 0.2, min(xs) + width, max(ys) + smax],
            "kind": "text",
            "content": "\n".join(lines),
        })
        cur.clear()

    prev: _TextRun | None = None
    for r in runs:
        if prev is not None and abs(prev.y - r.y) > block_gap_factor * max(
            prev.size, r.size
        ):
            flush()
        cur.append(r)
        prev = r
    flush()
    return blocks


def extract_pdf_blocks(data: bytes) -> list[dict]:
    """bytes → ordered block dicts (text + image), all pages."""
    objects = _scan_objects(data)
    out: list[dict] = []
    for page_no, page_obj in enumerate(_page_numbers(objects)):
        page_src = _dict_src(objects, page_obj)
        xobjects = _xobject_map(objects, page_src)
        fonts = _load_fonts(objects, page_src)
        parts: list[bytes] = []
        for ref in _all_refs(page_src, b"Contents"):
            dict_src, stream = objects.get(ref, (b"", None))
            if stream is None:
                continue
            decoded = _decode_stream(dict_src, stream)
            if decoded:
                parts.append(decoded)
        runs, images = _interpret(
            b"\n".join(parts), xobjects, objects, page_no, fonts
        )
        text_blocks = _runs_to_blocks(runs, page_no)
        # interleave by vertical position (PDF y grows upward → sort desc),
        # stable for equal positions
        keyed = [(b["bbox"][1], i, b) for i, b in enumerate(text_blocks + images)]
        for _, _, b in sorted(keyed, key=lambda k: (-k[0], k[1])):
            b.pop("ref", None)
            out.append(b)
    return out


# ------------------------------------------------------- image raster layer

def decode_image_xobject(objects, ref: int) -> dict | None:
    """Decode one image XObject to a raw pixel buffer.

    Supports the self-contained subset: FlateDecode / LZWDecode (with
    TIFF/PNG predictors) or unfiltered DeviceRGB / DeviceGray at 8 bits
    per component — the encodings `build_simple_pdf` writes and
    scanned-text PDFs commonly embed. DCT payloads pass through verbatim
    as JPEG (`jpeg_image_xobject`); CCITT Group 4 decodes via the T.6
    codec (`ccitt_image_xobject`); JPX and CCITT Group 3 return None —
    those stay behind the PyMuPDF path, exactly like the reference's 3x
    page render (ingestion/parsers/pymupdf_parser.py:773-823) needs
    PyMuPDF.

    Returns {width, height, channels, colorspace, pixels: bytes} with
    len(pixels) == width*height*channels (row-major, no padding at 8 bpc),
    or None when the encoding is unsupported or the payload is malformed."""
    dict_src, stream = objects.get(ref, (b"", None))
    if stream is None or b"/Image" not in dict_src:
        return None
    props = {
        m.group(1): float(m.group(2)) for m in _NAME_NUM_RE.finditer(dict_src)
    }
    width = int(props.get(b"Width", 0))
    height = int(props.get(b"Height", 0))
    bpc = int(props.get(b"BitsPerComponent", 8))
    if width <= 0 or height <= 0 or bpc != 8:
        return None
    if b"/DeviceRGB" in dict_src:
        colorspace, channels = "rgb", 3
    elif b"/DeviceGray" in dict_src:
        colorspace, channels = "gray", 1
    else:
        return None
    pixels = _decode_stream(dict_src, stream)  # None for DCT/LZW/...
    if pixels is None or len(pixels) < width * height * channels:
        return None
    return {
        "width": width,
        "height": height,
        "channels": channels,
        "colorspace": colorspace,
        "pixels": pixels[: width * height * channels],
    }


def jpeg_image_xobject(objects, ref: int) -> dict | None:
    """DCTDecode passthrough: per the PDF spec (ISO 32000-1 §7.4.8) the
    stream bytes of a /DCTDecode image XObject ARE a complete JPEG/JFIF
    file — an OCR/vision provider accepts them as-is (the reference
    hands PyMuPDF rasters to the same provider,
    pymupdf_parser.py:773-823), and since round 14 the emitted asset
    rows also decode to raw PIXELS downstream through
    `containers.normalize_assets` (baseline SOF0, `sources/jpeg.py`) —
    pinned by q157's PDF-embedded-JPEG near-dup golden. Returns
    {width, height, jpeg: bytes} (dimensions from the image dict — the
    spec requires them to match the JPEG's) or None when the object is
    not a DCTDecode image or the payload lacks the JPEG SOI marker."""
    dict_src, stream = objects.get(ref, (b"", None))
    if (
        stream is None
        or b"/Image" not in dict_src
        or b"/DCTDecode" not in dict_src
    ):
        return None
    if not stream.startswith(b"\xff\xd8"):  # JPEG SOI — malformed otherwise
        return None
    props = {
        m.group(1): float(m.group(2)) for m in _NAME_NUM_RE.finditer(dict_src)
    }
    width = int(props.get(b"Width", 0))
    height = int(props.get(b"Height", 0))
    if width <= 0 or height <= 0:
        return None
    return {"width": width, "height": height, "jpeg": stream}


def _jpx_siz(stream: bytes) -> tuple[int, int, int, int] | None:
    """Parse the SIZ marker of a JPEG 2000 payload (raw J2K codestream or
    JP2 container) → (width, height, n_components, bit_depth), or None.
    Per ISO/IEC 15444-1: the codestream starts SOC (FF4F) with SIZ (FF51)
    immediately after; a JP2 file wraps the codestream in boxes, so scan
    for the SOC+SIZ pair. Image size = (Xsiz - XOsiz, Ysiz - YOsiz)."""
    import struct as _struct

    pos = stream.find(b"\xff\x4f\xff\x51")
    # the last read is Ssiz at stream[pos + 42], so 43 bytes must exist
    if pos < 0 or pos + 43 > len(stream):
        return None
    siz = pos + 4  # FF51 already matched; siz points at Lsiz
    xsiz, ysiz, xosiz, yosiz = _struct.unpack(
        ">IIII", stream[siz + 4:siz + 20]
    )
    csiz = _struct.unpack(">H", stream[siz + 36:siz + 38])[0]
    if xsiz <= xosiz or ysiz <= yosiz or not 1 <= csiz <= 16384:
        return None
    ssiz = stream[siz + 38]
    return xsiz - xosiz, ysiz - yosiz, csiz, (ssiz & 0x7F) + 1


def jpx_image_xobject(objects, ref: int) -> dict | None:
    """JPXDecode passthrough, the DCTDecode treatment for JPEG 2000: per
    ISO 32000-1 §7.4.9 the stream bytes ARE a complete JP2/J2K payload —
    downstream consumers (vision providers, real decoders at the
    multimodal seam) take them as-is, so rasterization isn't needed to
    carry the asset. Dimensions/components/depth parse from the
    codestream's own SIZ marker (trusted over the image dict, as the
    spec says /Width//Height are overridden by JPX data). Returns
    {width, height, components, bit_depth, jpx: bytes, media_type} or
    None when not a JPXDecode image or no SIZ is found. Raster decode
    stays on the PyMuPDF/external path, like the reference."""
    dict_src, stream = objects.get(ref, (b"", None))
    if (
        stream is None
        or b"/Image" not in dict_src
        or b"/JPXDecode" not in dict_src
    ):
        return None
    siz = _jpx_siz(stream)
    if siz is None:
        return None
    w, h, n_comp, depth = siz
    media = ("image/jp2" if stream[:8] == b"\x00\x00\x00\x0cjP  "
             else "image/x-j2c")
    return {"width": w, "height": h, "components": n_comp,
            "bit_depth": depth, "jpx": stream, "media_type": media}


def ccitt_image_xobject(objects, ref: int) -> dict | None:
    """Decode a /CCITTFaxDecode image XObject to 8-bit gray pixels via
    the pure-Python T.6/T.4 codecs (`sources/ccitt.py`) — every /K
    regime: K < 0 (Group 4 MMR, the dominant scanned-OCR form), K = 0
    (Group 3 1-D) and K > 0 (Group 3 mixed), with /Columns, /Rows,
    /EncodedByteAlign. Filter chains stay on the PyMuPDF path, like the
    reference (ingestion/parsers/pymupdf_parser.py:518-569).

    Polarity follows ISO 32000 exactly: a CCITT-black pixel becomes
    sample bit 1 when /BlackIs1 is true, else 0 (the default), and the
    sample maps to gray through the image's /Decode array (default
    [0 1] — so the spec-default combination renders black pixels at
    gray 0, but /BlackIs1 true WITHOUT a compensating /Decode [1 0]
    legitimately renders the inverse, exactly as a compliant viewer
    would). Returns the decode_image_xobject raster dict shape, or None
    when unsupported/malformed."""
    from ocr_vector_db_spark.sources.ccitt import (
        CCITTError,
        decode_g3,
        decode_g4,
    )

    dict_src, stream = objects.get(ref, (b"", None))
    if stream is None or b"/Image" not in dict_src:
        return None
    names = _filter_chain(dict_src)
    if names not in ([b"CCITTFaxDecode"], [b"CCF"]):
        return None
    m = re.search(rb"/DecodeParms\s*\[?\s*<<(.*?)>>", dict_src, re.S)
    parms = m.group(1) if m else b""
    km = re.search(rb"/K\s+(-?\d+)", parms)
    k = int(km.group(1)) if km else 0  # ISO 32000 default K = 0
    cm = re.search(rb"/Columns\s+(\d+)", parms)
    columns = int(cm.group(1)) if cm else 1728
    rm = re.search(rb"/Rows\s+(\d+)", parms)
    props = {
        p.group(1): float(p.group(2)) for p in _NAME_NUM_RE.finditer(dict_src)
    }
    height = int(props.get(b"Height", 0))
    rows = int(rm.group(1)) if rm else (height or None)
    byte_align = bool(re.search(rb"/EncodedByteAlign\s+true", parms))
    black_is_1 = bool(re.search(rb"/BlackIs1\s+true", parms))
    dm = re.search(
        rb"/Decode\s*\[\s*(\d+(?:\.\d+)?)\s+(\d+(?:\.\d+)?)\s*\]",
        dict_src,
    )
    decode = (float(dm.group(1)), float(dm.group(2))) if dm else (0.0, 1.0)
    if columns <= 0:
        return None
    try:
        if k < 0:
            pix = decode_g4(stream, columns, rows=rows,
                            byte_align=byte_align)
        else:
            pix = decode_g3(stream, columns, rows=rows, k=k,
                            byte_align=byte_align)
    except CCITTError:
        return None
    n_rows = len(pix) // columns
    if n_rows == 0:
        return None
    # codec-semantic bits (1 = black) → 1-bit sample per /BlackIs1 →
    # gray per /Decode: the exact ISO 32000 §7.4.6/§8.9.5.2 pipeline
    g = [
        max(0, min(255, round(decode[0] * 255))),  # sample 0
        max(0, min(255, round(decode[1] * 255))),  # sample 1
    ]
    gray = bytes(
        g[(1 if p else 0) if black_is_1 else (0 if p else 1)] for p in pix
    )
    return {
        "width": columns,
        "height": n_rows,
        "channels": 1,
        "colorspace": "gray",
        "pixels": gray,
    }


def jbig2_image_xobject(objects, ref: int) -> dict | None:
    """Decode a /JBIG2Decode image XObject to 8-bit gray pixels via the
    pure-Python T.88 codec (`sources/jbig2.py`) — the generic-region AND
    symbol-coded profiles scanned-OCR PDFs ship; /JBIG2Globals streams
    resolve from the object table and prepend their segments (symbol
    dictionaries in globals serve the text regions, the jbig2enc -p
    layout). Halftone/refinement/huffman segments stay on the PyMuPDF
    path, like the reference (ingestion/parsers/pymupdf_parser.py:518-569).

    Polarity follows ISO 32000 §7.4.7: JBIG2's 1 = black becomes sample
    0 (the filter inverts, like every compliant viewer), and the sample
    maps to gray through the image's /Decode array (default [0 1] —
    black renders at gray 0). Returns the decode_image_xobject raster
    dict shape, or None when unsupported/malformed."""
    from ocr_vector_db_spark.sources.jbig2 import JBIG2Error, decode_embedded

    dict_src, stream = objects.get(ref, (b"", None))
    if stream is None or b"/Image" not in dict_src:
        return None
    if _filter_chain(dict_src) != [b"JBIG2Decode"]:
        return None
    globals_data = b""
    gm = re.search(rb"/JBIG2Globals\s+(\d+)\s+\d+\s+R", dict_src)
    if gm:
        g_src, g_stream = objects.get(int(gm.group(1)), (b"", None))
        if g_stream is not None:
            globals_data = g_stream
    dm = re.search(
        rb"/Decode\s*\[\s*(\d+(?:\.\d+)?)\s+(\d+(?:\.\d+)?)\s*\]",
        dict_src,
    )
    decode = (float(dm.group(1)), float(dm.group(2))) if dm else (0.0, 1.0)
    try:
        width, height, pix = decode_embedded(stream, globals_data)
    except JBIG2Error:
        return None
    if width <= 0 or height <= 0:
        return None
    # codec-semantic bits (1 = black) → sample (inverted, §7.4.7) → gray
    # per /Decode: the same ISO 32000 §8.9.5.2 pipeline as CCITT above
    g = [
        max(0, min(255, round(decode[0] * 255))),  # sample 0
        max(0, min(255, round(decode[1] * 255))),  # sample 1
    ]
    gray = bytes(g[0 if p else 1] for p in pix)
    return {
        "width": width,
        "height": height,
        "channels": 1,
        "colorspace": "gray",
        "pixels": gray,
    }


def extract_pdf_images(data: bytes) -> list[dict]:
    """bytes → decoded raster rows for every image drawn on a page, in the
    multimodal asset shape (sources/multimodal.ASSET_SCHEMA): the pixel
    buffer is the opaque `data` payload and the typed facts ride `metadata`,
    so rows feed `multimodal.extract_features` / the OCR gate directly —
    closing the pure-Python half of the reference's render-page-and-OCR
    loop (pymupdf_parser.py:518-569). FlateDecode rasters decode to raw
    pixels (metadata format=raw); DCTDecode images pass their stream bytes
    through verbatim as ready-to-send JPEG (metadata format=jpeg — no
    decoder needed, see jpeg_image_xobject); CCITT rasters in every /K
    regime (Group 4 MMR, Group 3 1-D and mixed) decode through the
    pure-Python T.6/T.4 codecs (ccitt_image_xobject, format=raw);
    JBIG2 generic regions AND symbol-coded pages decode through the
    pure-Python T.88 codec (jbig2_image_xobject, format=raw); JPXDecode
    images pass their JP2/J2K payload through verbatim with dimensions/
    components/depth parsed from the codestream's SIZ marker
    (jpx_image_xobject, format=jpx — the DCT treatment). JBIG2
    halftone/refinement segments are skipped; the PyMuPDF path covers
    them when importable."""
    import hashlib

    objects = _scan_objects(data)
    out: list[dict] = []
    for page_no, page_obj in enumerate(_page_numbers(objects)):
        page_src = _dict_src(objects, page_obj)
        xobjects = _xobject_map(objects, page_src)
        parts: list[bytes] = []
        for ref in _all_refs(page_src, b"Contents"):
            dict_src, stream = objects.get(ref, (b"", None))
            if stream is None:
                continue
            decoded = _decode_stream(dict_src, stream)
            if decoded:
                parts.append(decoded)
        _, images = _interpret(
            b"\n".join(parts), xobjects, objects, page_no, {}
        )
        for idx, blk in enumerate(images):
            ref = blk.get("ref")
            if not ref:
                continue
            raster = (decode_image_xobject(objects, ref)
                      or ccitt_image_xobject(objects, ref)
                      or jbig2_image_xobject(objects, ref))
            if raster is not None:
                payload = raster.pop("pixels")
                facts = {"format": "raw", **raster}
            else:
                jpg = jpeg_image_xobject(objects, ref)
                jpx = None if jpg else jpx_image_xobject(objects, ref)
                if jpg is not None:
                    payload = jpg.pop("jpeg")
                    facts = {"format": "jpeg",
                             "media_type": "image/jpeg", **jpg}
                elif jpx is not None:
                    payload = jpx.pop("jpx")
                    facts = {"format": "jpx", **jpx}
                else:
                    continue
            digest = hashlib.md5(payload).hexdigest()
            out.append({
                "asset_id": f"pdfimg:p{page_no}:i{idx}:{digest[:12]}",
                "kind": "image",
                "data": payload,
                "metadata": {
                    "page": str(page_no),
                    "bbox": ",".join(f"{v:.2f}" for v in blk["bbox"]),
                    **{k: str(v) for k, v in facts.items()},
                },
            })
    return out


# ------------------------------------------------------------ fixture writer

def run_length_encode(data: bytes) -> bytes:
    """/RunLengthDecode-compatible encoder (fixtures/tests): runs of ≥3
    identical bytes emit (257-n, byte); everything else goes in literal
    spans of ≤128; 128 terminates (EOD)."""
    out = bytearray()
    i, n = 0, len(data)
    lit = bytearray()

    def flush() -> None:
        j = 0
        while j < len(lit):
            span = lit[j: j + 128]
            out.append(len(span) - 1)
            out.extend(span)
            j += 128
        lit.clear()

    while i < n:
        run = 1
        while i + run < n and run < 128 and data[i + run] == data[i]:
            run += 1
        if run >= 3:
            flush()
            out.append(257 - run)
            out.append(data[i])
        else:
            lit += data[i: i + run]
        i += run
    flush()
    out.append(128)
    return bytes(out)


def lzw_encode(data: bytes, early_change: int = 1) -> bytes:
    """PDF-variant LZW encoder — fixture-writer support (the inverse of
    `_lzw_decode`, same §7.4.4.2 rules: MSB-first 9→12-bit codes,
    clear=256/EOD=257, early width change). Lets tests and golden queries
    emit /LZWDecode streams without any codec library."""
    bits: list[tuple[int, int]] = []
    table = {bytes([i]): i for i in range(256)}
    next_code, width = 258, 9
    bits.append((256, width))
    w = b""
    for ch in data:
        wc = w + bytes([ch])
        if wc in table:
            w = wc
            continue
        bits.append((table[w], width))
        table[wc] = next_code
        next_code += 1
        # mirror of _lzw_decode's bump: widen after ADDING entry value
        # (1<<width) - early_change, i.e. next_code passes 512-1+1 for
        # the early-change default (see the decoder comment; r15 fix)
        if next_code + early_change >= (1 << width) + 1 and width < 12:
            width += 1
        if next_code >= 4096 - early_change:  # table full → reset
            bits.append((256, width))
            table = {bytes([i]): i for i in range(256)}
            next_code, width = 258, 9
        w = bytes([ch])
    if w:
        bits.append((table[w], width))
    bits.append((257, width))
    buf = n = 0
    out = bytearray()
    for code, wd in bits:
        buf = (buf << wd) | code
        n += wd
        while n >= 8:
            out.append((buf >> (n - 8)) & 0xFF)
            n -= 8
    if n:
        out.append((buf << (8 - n)) & 0xFF)
    return bytes(out)


def png_predict_up(pixels: bytes, columns: int, colors: int) -> bytes:
    """Forward PNG Up-filter (type 2) over 8-bpc rows — fixture-writer
    support for /Predictor 12 streams (the inverse of _apply_predictor's
    Up branch)."""
    row_len = columns * colors
    out = bytearray()
    prev = bytearray(row_len)
    for r0 in range(0, len(pixels), row_len):
        row = pixels[r0: r0 + row_len]
        out += b"\x02" + bytes((row[j] - prev[j]) & 0xFF
                               for j in range(len(row)))
        prev = bytearray(row)
    return bytes(out)


def build_objstm_pdf(text: str, x: float = 72, y: float = 700,
                     size: float = 12) -> bytes:
    """Single-page fixture in the PDF 1.5+ layout: catalog/pages/page
    packed into a Flate-compressed /ObjStm object stream, content stream
    top-level — what modern PDF writers emit and `_expand_object_streams`
    decodes."""
    inner = [
        (2, b"<< /Type /Catalog /Pages 3 0 R >>"),
        (3, b"<< /Type /Pages /Kids [4 0 R] /Count 1 >>"),
        (4, b"<< /Type /Page /Parent 3 0 R /MediaBox [0 0 612 792] "
            b"/Contents 5 0 R /Resources << /Font << /F1 << /Type /Font "
            b"/Subtype /Type1 /BaseFont /Helvetica >> >> >> >>"),
    ]
    offsets, bodies, pos = [], [], 0
    for num, body in inner:
        offsets.append((num, pos))
        bodies.append(body)
        pos += len(body) + 1
    header = " ".join(f"{n} {o}" for n, o in offsets).encode() + b"\n"
    payload = zlib.compress(header + b"\n".join(bodies) + b"\n")
    esc = text.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")
    content = (
        f"BT /F1 {size} Tf {x} {y} Td ({esc}) Tj ET".encode("latin-1")
    )
    return (
        b"%PDF-1.5\n"
        b"1 0 obj\n<< /Type /ObjStm /N 3 /First "
        + str(len(header)).encode()
        + b" /Filter /FlateDecode /Length "
        + str(len(payload)).encode()
        + b" >>\nstream\n" + payload + b"\nendstream\nendobj\n"
        b"5 0 obj\n<< /Length " + str(len(content)).encode()
        + b" >>\nstream\n" + content + b"\nendstream\nendobj\n"
    )


def _tounicode_cmap(chars: set[str]) -> bytes:
    """Minimal spec-shaped ToUnicode CMap: 2-byte Identity codespace, one
    bfchar entry per used char (code = the char's BMP codepoint — the
    Identity-H convention), ≤100 entries per bfchar section per spec."""
    ordered = sorted(chars)
    sections: list[str] = []
    for i in range(0, len(ordered), 100):
        chunk = ordered[i : i + 100]
        entries = "\n".join(f"<{ord(c):04X}> <{ord(c):04X}>" for c in chunk)
        sections.append(f"{len(chunk)} beginbfchar\n{entries}\nendbfchar")
    return (
        "/CIDInit /ProcSet findresource begin\n"
        "12 dict begin\nbegincmap\n"
        "1 begincodespacerange\n<0000> <FFFF>\nendcodespacerange\n"
        + "\n".join(sections)
        + "\nendcmap\nCMapName currentdict /CMap defineresource pop\nend\nend"
    ).encode("latin-1")


def build_simple_pdf(pages: list[list[dict]],
                     compress: bool | str = True) -> bytes:
    """Deterministic minimal PDF writer for fixtures/tests (no library).

    `pages` = list of pages; each page a list of blocks:
      {'kind': 'text', 'text': str, 'x': float, 'y': float, 'size': float}
      {'kind': 'image', 'x', 'y', 'w', 'h', 'width': px, 'height': px}
        (+ optional 'pixels'/'channels', 'predictor': 12 for a PNG-Up
        predicted Flate raster, or 'jpeg': bytes for a /DCTDecode stream)

    `compress`: True = FlateDecode content streams, "lzw" = LZWDecode,
    False = stored.

    Text containing non-Latin-1 characters (Korean, CJK, …) is emitted the
    way real-world PDFs carry it: a Type0 /Identity-H font whose show
    strings are 2-byte hex codes, plus a /ToUnicode CMap stream mapping
    code → Unicode — the exact structure the reader's CID path decodes."""
    objects: list[bytes] = []      # 1-indexed bodies, object 1 = catalog

    def esc(s: str) -> str:
        return s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")

    def is_latin1(s: str) -> bool:
        try:
            s.encode("latin-1")
            return True
        except UnicodeEncodeError:
            return False

    n_pages = len(pages)
    page_obj_start = 3             # 1=Catalog, 2=Pages
    body_objs: list[bytes] = []
    page_refs: list[str] = []
    next_obj = page_obj_start + n_pages
    page_bodies: list[bytes] = []

    for blocks in pages:
        content_lines: list[str] = []
        xobj_entries: list[str] = []
        img_objs: list[bytes] = []
        cid_chars: set[str] = set()
        uses_cid = any(
            b["kind"] == "text" and not is_latin1(b["text"]) for b in blocks
        )
        for b in blocks:
            if b["kind"] == "text":
                size = b.get("size", 12)
                cid = not is_latin1(b["text"])
                font = "F2" if cid else "F1"
                content_lines.append("BT")
                content_lines.append(f"/{font} {size} Tf")
                content_lines.append(f"{b['x']} {b['y']} Td")

                def show(line: str) -> str:
                    if cid:
                        cid_chars.update(line)
                        return "<" + "".join(f"{ord(c):04X}" for c in line) + "> Tj"
                    return f"({esc(line)}) Tj"

                lines = b["text"].split("\n")
                content_lines.append(show(lines[0]))
                for line in lines[1:]:
                    content_lines.append(f"0 -{size + 2} Td")
                    content_lines.append(show(line))
                content_lines.append("ET")
            else:
                name = f"Im{len(xobj_entries)}"
                if b.get("jpeg") is not None:
                    # entropy-coded fixture: a /DCTDecode XObject whose
                    # stream is the caller's JPEG bytes verbatim (what a
                    # scanner-produced PDF embeds) — exercises the
                    # jpeg_image_xobject passthrough
                    jpeg = b["jpeg"]
                    img_objs.append(
                        f"<< /Type /XObject /Subtype /Image "
                        f"/Width {b['width']} /Height {b['height']} "
                        f"/ColorSpace /DeviceRGB /BitsPerComponent 8 "
                        f"/Filter /DCTDecode "
                        f"/Length {len(jpeg)} >>\nstream\n".encode("latin-1")
                        + jpeg + b"\nendstream"
                    )
                    xobj_entries.append(
                        f"/{name} {next_obj + len(img_objs) - 1} 0 R"
                    )
                    content_lines.append(
                        f"q {b['w']} 0 0 {b['h']} {b['x']} {b['y']} cm "
                        f"/{name} Do Q"
                    )
                    continue
                if b.get("jpx") is not None:
                    # JPEG 2000 fixture: a /JPXDecode XObject whose
                    # stream is the caller's JP2/J2K bytes verbatim —
                    # exercises the jpx_image_xobject passthrough
                    jpx = b["jpx"]
                    img_objs.append(
                        f"<< /Type /XObject /Subtype /Image "
                        f"/Width {b['width']} /Height {b['height']} "
                        f"/Filter /JPXDecode "
                        f"/Length {len(jpx)} >>\nstream\n".encode("latin-1")
                        + jpx + b"\nendstream"
                    )
                    xobj_entries.append(
                        f"/{name} {next_obj + len(img_objs) - 1} 0 R"
                    )
                    content_lines.append(
                        f"q {b['w']} 0 0 {b['h']} {b['x']} {b['y']} cm "
                        f"/{name} Do Q"
                    )
                    continue
                if b.get("jbig2"):
                    # scanned-raster fixture: a /JBIG2Decode bilevel
                    # stream — either a generic region (`pixels` = w*h
                    # bytes, nonzero = black; `tpgdon` turns on typical-
                    # prediction rows) or, with `jbig2_symbols` =
                    # (symbols, placements), a symbol-coded page —
                    # encoded with the matching twins (sources/jbig2.py).
                    from ocr_vector_db_spark.sources.jbig2 import (
                        encode_embedded,
                        encode_embedded_halftone,
                        encode_embedded_symbols,
                    )

                    if b.get("jbig2_symbols"):
                        symbols, placements = b["jbig2_symbols"]
                        payload_img = encode_embedded_symbols(
                            b["width"], b["height"], symbols, placements,
                        )
                    elif b.get("jbig2_halftone"):
                        # (grays, hgw, hgh, patterns, hdpw, hdph) — a
                        # halftone page encoded with the matching twin
                        grays, hgw, hgh, pats, hdpw, hdph = \
                            b["jbig2_halftone"]
                        payload_img = encode_embedded_halftone(
                            b["width"], b["height"], grays, hgw, hgh,
                            pats, hdpw, hdph,
                        )
                    else:
                        pix = b["pixels"]
                        assert len(pix) == b["width"] * b["height"]
                        payload_img = encode_embedded(
                            pix, b["width"], b["height"],
                            tpgdon=bool(b.get("tpgdon")),
                        )
                    img_objs.append(
                        f"<< /Type /XObject /Subtype /Image "
                        f"/Width {b['width']} /Height {b['height']} "
                        f"/ColorSpace /DeviceGray /BitsPerComponent 1 "
                        f"/Filter /JBIG2Decode "
                        f"/Length {len(payload_img)} >>\nstream\n"
                        .encode("latin-1") + payload_img + b"\nendstream"
                    )
                    xobj_entries.append(
                        f"/{name} {next_obj + len(img_objs) - 1} 0 R"
                    )
                    content_lines.append(
                        f"q {b['w']} 0 0 {b['h']} {b['x']} {b['y']} cm "
                        f"/{name} Do Q"
                    )
                    continue
                if b.get("ccitt"):
                    # scanned-fax fixture: a /CCITTFaxDecode bilevel
                    # raster — `pixels` is w*h bytes, nonzero = black,
                    # encoded with the matching twin (sources/ccitt.py).
                    # `k` picks the regime: default -1 (Group 4 MMR),
                    # 0 (Group 3 1-D), > 0 (Group 3 mixed).
                    from ocr_vector_db_spark.sources.ccitt import (
                        encode_g3,
                        encode_g4,
                    )

                    pix = b["pixels"]
                    assert len(pix) == b["width"] * b["height"]
                    k = int(b.get("k", -1))
                    if k < 0:
                        payload_img = encode_g4(
                            pix, b["width"], b["height"]
                        )
                    else:
                        payload_img = encode_g3(
                            pix, b["width"], b["height"], k=k
                        )
                    img_objs.append(
                        f"<< /Type /XObject /Subtype /Image "
                        f"/Width {b['width']} /Height {b['height']} "
                        f"/ColorSpace /DeviceGray /BitsPerComponent 1 "
                        f"/Filter /CCITTFaxDecode /DecodeParms << /K {k} "
                        f"/Columns {b['width']} /Rows {b['height']} >> "
                        f"/Length {len(payload_img)} >>\nstream\n"
                        .encode("latin-1") + payload_img + b"\nendstream"
                    )
                    xobj_entries.append(
                        f"/{name} {next_obj + len(img_objs) - 1} 0 R"
                    )
                    content_lines.append(
                        f"q {b['w']} 0 0 {b['h']} {b['x']} {b['y']} cm "
                        f"/{name} Do Q"
                    )
                    continue
                # real raster payload: optional caller-provided `pixels`
                # (+ `channels`, default gray), else a deterministic
                # gradient — so decode_image_xobject round-trips the exact
                # bytes instead of a stub
                channels = int(b.get("channels", 1))
                cs = "/DeviceRGB" if channels == 3 else "/DeviceGray"
                need = b["width"] * b["height"] * channels
                pixels = b.get("pixels")
                if pixels is None:
                    wch = b["width"] * channels
                    pixels = b"".join(
                        bytes((c * 31 + r * 17) % 251 for c in range(wch))
                        for r in range(b["height"])
                    )
                assert len(pixels) == need, "pixels must be w*h*channels bytes"
                if b.get("predictor") == 12:
                    # PNG Up-predicted raster (+ /DecodeParms), the layout
                    # real scanners/optimizers commonly emit
                    payload_img = zlib.compress(
                        png_predict_up(pixels, b["width"], channels)
                    )
                    parms = (
                        f" /DecodeParms << /Predictor 12 /Colors {channels}"
                        f" /Columns {b['width']} >>"
                    )
                else:
                    payload_img = zlib.compress(pixels)
                    parms = ""
                img_objs.append(
                    f"<< /Type /XObject /Subtype /Image /Width {b['width']} "
                    f"/Height {b['height']} /ColorSpace {cs} "
                    f"/BitsPerComponent 8 /Filter /FlateDecode{parms} "
                    f"/Length {len(payload_img)} >>\nstream\n".encode("latin-1")
                    + payload_img + b"\nendstream"
                )
                xobj_entries.append(f"/{name} {next_obj + len(img_objs) - 1} 0 R")
                content_lines.append(
                    f"q {b['w']} 0 0 {b['h']} {b['x']} {b['y']} cm /{name} Do Q"
                )
        content = "\n".join(content_lines).encode("latin-1")
        if compress == "lzw":
            payload = lzw_encode(content)
            stream_dict = f"<< /Length {len(payload)} /Filter /LZWDecode >>"
        elif compress == "a85":
            # filter CHAIN: stored bytes are ASCII85 over Flate; stdlib
            # a85encode is the independent encoder the decoder must invert
            import base64

            payload = base64.a85encode(zlib.compress(content)) + b"~>"
            stream_dict = (
                f"<< /Length {len(payload)} "
                f"/Filter [/ASCII85Decode /FlateDecode] >>"
            )
        elif compress == "rl":
            payload = run_length_encode(content)
            stream_dict = (
                f"<< /Length {len(payload)} /Filter /RunLengthDecode >>"
            )
        elif compress:
            payload = zlib.compress(content)
            stream_dict = f"<< /Length {len(payload)} /Filter /FlateDecode >>"
        else:
            payload = content
            stream_dict = f"<< /Length {len(payload)} >>"
        cid_objs: list[bytes] = []
        font_entries = "/F1 << /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"
        if uses_cid:
            cmap_payload = _tounicode_cmap(cid_chars)
            cmap_obj = next_obj + len(img_objs)
            font_obj = cmap_obj + 1
            cid_objs.append(
                f"<< /Length {len(cmap_payload)} >>".encode("latin-1")
                + b"\nstream\n" + cmap_payload + b"\nendstream"
            )
            cid_objs.append(
                (
                    f"<< /Type /Font /Subtype /Type0 /BaseFont /GenGothic "
                    f"/Encoding /Identity-H /ToUnicode {cmap_obj} 0 R >>"
                ).encode("latin-1")
            )
            font_entries += f" /F2 {font_obj} 0 R"
        content_obj = next_obj + len(img_objs) + len(cid_objs)
        xobj_dict = (
            f" /XObject << {' '.join(xobj_entries)} >>" if xobj_entries else ""
        )
        page_bodies.append(
            (
                f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
                f"/Contents {content_obj} 0 R /Resources << /Font "
                f"<< {font_entries} >>"
                f"{xobj_dict} >> >>"
            ).encode("latin-1")
        )
        body_objs.extend(img_objs)
        body_objs.extend(cid_objs)
        body_objs.append(
            stream_dict.encode("latin-1") + b"\nstream\n" + payload + b"\nendstream"
        )
        next_obj = content_obj + 1

    for i in range(n_pages):
        page_refs.append(f"{page_obj_start + i} 0 R")

    objects.append(b"<< /Type /Catalog /Pages 2 0 R >>")
    objects.append(
        (
            f"<< /Type /Pages /Kids [{' '.join(page_refs)}] /Count {n_pages} >>"
        ).encode("latin-1")
    )
    objects.extend(page_bodies)
    objects.extend(body_objs)

    out = bytearray(b"%PDF-1.4\n")
    offsets: list[int] = []
    for i, body in enumerate(objects, start=1):
        offsets.append(len(out))
        out += f"{i} 0 obj\n".encode("latin-1") + body + b"\nendobj\n"
    xref_at = len(out)
    out += f"xref\n0 {len(objects) + 1}\n0000000000 65535 f \n".encode("latin-1")
    for off in offsets:
        out += f"{off:010d} 00000 n \n".encode("latin-1")
    out += (
        f"trailer\n<< /Size {len(objects) + 1} /Root 1 0 R >>\n"
        f"startxref\n{xref_at}\n%%EOF\n"
    ).encode("latin-1")
    return bytes(out)


def encrypt_pdf_rc4(
    data: bytes,
    user_pw: bytes = b"",
    owner_pw: bytes = b"owner",
    r: int = 3,
    nbits: int = 128,
) -> bytes:
    """Fixture-side Standard-handler encryption (ISO 32000-1 §7.6.3,
    Algorithms 2/3/4/5): RC4-encrypt every stream in `data` with
    per-object keys and append the /Encrypt dict + /ID trailer entries.
    RC4 is length-preserving, so streams are substituted IN PLACE and the
    original xref offsets stay valid. r=2 forces 40-bit keys per spec;
    r=3 honors `nbits` (default 128). The inverse of `_maybe_decrypt`
    (round-trip-tested)."""
    import hashlib

    assert r in (2, 3)
    nbytes = 5 if r == 2 else nbits // 8
    id0 = hashlib.md5(b"fixture-id" + data[:64]).digest()
    p = -44  # print + modify denied, the common scanned-corpus value

    # Algorithm 3: /O from the owner password
    h = hashlib.md5((owner_pw + _PAD)[:32]).digest()
    if r >= 3:
        for _ in range(50):
            h = hashlib.md5(h).digest()
    okey = h[:nbytes]
    o = _rc4(okey, (user_pw + _PAD)[:32])
    if r >= 3:
        for i in range(1, 20):
            o = _rc4(bytes(b ^ i for b in okey), o)

    key = _std_file_key(o, p, id0, r, nbytes, user_pw)

    # Algorithm 4/5: /U (validation value; unused by our reader but real)
    if r == 2:
        u = _rc4(key, _PAD)
    else:
        u = _rc4(key, hashlib.md5(_PAD + id0).digest())
        for i in range(1, 20):
            u = _rc4(bytes(b ^ i for b in key), u)
        u = u + b"\x00" * 16

    out = bytearray(data)
    max_num = 0
    for m in _OBJ_RE.finditer(data):
        num = int(m.group(1))
        max_num = max(max_num, num)
        end = data.find(b"endobj", m.end())
        if end < 0:
            continue
        body = data[m.end():end]
        sm = _STREAM_RE.search(body)
        if not sm:
            continue
        lm = re.search(rb"/Length\s+(\d+)(?![0-9])(?!\s+\d+\s+R)",
                       body[: sm.start()])
        if not lm:
            continue
        start = m.end() + sm.end()
        n = int(lm.group(1))
        out[start: start + n] = _rc4(_obj_key(key, num), data[start: start + n])

    enc_num = max_num + 1
    out += (
        f"{enc_num} 0 obj\n<< /Filter /Standard /V {1 if r == 2 else 2} "
        f"/R {r} /Length {nbytes * 8} /P {p} /O <{o.hex()}> /U <{u.hex()}> "
        f">>\nendobj\n"
    ).encode("latin-1")
    out += (
        f"trailer\n<< /Encrypt {enc_num} 0 R "
        f"/ID [<{id0.hex()}> <{id0.hex()}>] >>\n"
    ).encode("latin-1")
    return bytes(out)


def encrypt_pdf_aes(
    data: bytes,
    user_pw: bytes = b"",
    owner_pw: bytes = b"owner",
) -> bytes:
    """Fixture-side V4/R4 AESV2 encryption (AES-128-CBC crypt filter,
    §7.6.2): every stream becomes IV + CBC ciphertext with the spec's
    always-pad, its direct /Length is patched (AES changes stream
    lengths, unlike RC4), and the /Encrypt dict (+/CF /StdCF /AESV2) and
    /ID land in an appended trailer. IVs are deterministic (md5 of the
    object number + plaintext) so fixtures are byte-stable. The inverse
    of `_maybe_decrypt`'s AES path (round-trip-tested)."""
    import hashlib

    nbytes = 16
    id0 = hashlib.md5(b"fixture-id-aes" + data[:64]).digest()
    p = -44

    h = hashlib.md5((owner_pw + _PAD)[:32]).digest()
    for _ in range(50):
        h = hashlib.md5(h).digest()
    okey = h[:nbytes]
    o = _rc4(okey, (user_pw + _PAD)[:32])
    for i in range(1, 20):
        o = _rc4(bytes(b ^ i for b in okey), o)

    key = _std_file_key(o, p, id0, 4, nbytes, user_pw)

    u = _rc4(key, hashlib.md5(_PAD + id0).digest())
    for i in range(1, 20):
        u = _rc4(bytes(b ^ i for b in key), u)
    u = u + b"\x00" * 16

    pieces: list[bytes] = []
    cursor = 0
    max_num = 0
    for m in _OBJ_RE.finditer(data):
        num = int(m.group(1))
        max_num = max(max_num, num)
        end = data.find(b"endobj", m.end())
        if end < 0:
            continue
        body = data[m.end():end]
        sm = _STREAM_RE.search(body)
        if not sm:
            continue
        lm = re.search(rb"/Length\s+(\d+)(?![0-9])(?!\s+\d+\s+R)",
                       body[: sm.start()])
        if not lm:
            continue
        start = m.end() + sm.end()
        n = int(lm.group(1))
        iv = hashlib.md5(f"iv:{num}:".encode("ascii")
                         + data[start: start + n]).digest()
        enc = _aes_cbc_encrypt(
            _obj_key(key, num, aes=True), iv, data[start: start + n]
        )
        dict_src = body[: sm.start()]
        patched = (
            dict_src[: lm.start(1)]
            + str(len(enc)).encode("ascii")
            + dict_src[lm.end(1):]
        )
        pieces.append(data[cursor:m.end()])
        pieces.append(patched + b"stream\n" + enc + b"\nendstream\n")
        cursor = end  # continue from "endobj"
    pieces.append(data[cursor:])
    out = bytearray(b"".join(pieces))

    enc_num = max_num + 1
    out += (
        f"{enc_num} 0 obj\n<< /Filter /Standard /V 4 /R 4 /Length 128 "
        f"/CF << /StdCF << /CFM /AESV2 /Length 16 >> >> "
        f"/StmF /StdCF /StrF /StdCF "
        f"/P {p} /O <{o.hex()}> /U <{u.hex()}> >>\nendobj\n"
    ).encode("latin-1")
    out += (
        f"trailer\n<< /Encrypt {enc_num} 0 R "
        f"/ID [<{id0.hex()}> <{id0.hex()}>] >>\n"
    ).encode("latin-1")
    return bytes(out)


def encrypt_pdf_aes256(
    data: bytes,
    user_pw: bytes = b"",
    owner_pw: bytes = b"owner",
) -> bytes:
    """Fixture-side V5/R6 AESV3 encryption (ISO 32000-2 / PDF 2.0):
    streams become IV + AES-256-CBC ciphertext under ONE file key (no
    per-object derivation in V5); /U carries the Algorithm-2.B user hash
    + validation/key salts, /UE wraps the file key under the
    key-salt-derived intermediate, /O//OE the owner-side twins (hashed
    over the 48-byte /U per spec), /Perms the ECB-sealed permissions.
    Deterministic salts/IVs keep fixtures byte-stable. The inverse of
    `_maybe_decrypt`'s V5 branch (round-trip-tested)."""
    import hashlib
    import struct

    fkey = hashlib.sha256(b"fixture-filekey" + data[:64]).digest()
    id0 = hashlib.md5(b"fixture-id-aes256" + data[:64]).digest()
    p = -44
    vsalt = hashlib.md5(b"vs" + id0).digest()[:8]
    ksalt = hashlib.md5(b"ks" + id0).digest()[:8]
    u = _hash_2b(user_pw, vsalt, b"") + vsalt + ksalt
    ue = _aes_cbc_raw(_hash_2b(user_pw, ksalt, b""), b"\x00" * 16,
                      fkey, True)
    ovsalt = hashlib.md5(b"ovs" + id0).digest()[:8]
    oksalt = hashlib.md5(b"oks" + id0).digest()[:8]
    o = _hash_2b(owner_pw, ovsalt, u) + ovsalt + oksalt
    oe = _aes_cbc_raw(_hash_2b(owner_pw, oksalt, u), b"\x00" * 16,
                      fkey, True)
    perms_blk = (struct.pack("<i", p) + b"\xff\xff\xff\xff" + b"T"
                 + b"adb" + b"fixd")
    perms = _aes_block(perms_blk, _aes_round_keys(fkey), True)

    pieces: list[bytes] = []
    cursor = 0
    max_num = 0
    for m in _OBJ_RE.finditer(data):
        num = int(m.group(1))
        max_num = max(max_num, num)
        end = data.find(b"endobj", m.end())
        if end < 0:
            continue
        body = data[m.end():end]
        sm = _STREAM_RE.search(body)
        if not sm:
            continue
        lm = re.search(rb"/Length\s+(\d+)(?![0-9])(?!\s+\d+\s+R)",
                       body[: sm.start()])
        if not lm:
            continue
        start = m.end() + sm.end()
        n = int(lm.group(1))
        iv = hashlib.md5(f"iv256:{num}:".encode("ascii")
                         + data[start: start + n]).digest()
        enc = _aes_cbc_encrypt(fkey, iv, data[start: start + n])
        dict_src = body[: sm.start()]
        patched = (
            dict_src[: lm.start(1)]
            + str(len(enc)).encode("ascii")
            + dict_src[lm.end(1):]
        )
        pieces.append(data[cursor:m.end()])
        pieces.append(patched + b"stream\n" + enc + b"\nendstream\n")
        cursor = end
    pieces.append(data[cursor:])
    out = bytearray(b"".join(pieces))

    enc_num = max_num + 1
    out += (
        f"{enc_num} 0 obj\n<< /Filter /Standard /V 5 /R 6 /Length 256 "
        f"/CF << /StdCF << /CFM /AESV3 /Length 32 >> >> "
        f"/StmF /StdCF /StrF /StdCF /P {p} "
        f"/U <{u.hex()}> /UE <{ue.hex()}> "
        f"/O <{o.hex()}> /OE <{oe.hex()}> /Perms <{perms.hex()}> "
        f">>\nendobj\n"
    ).encode("latin-1")
    out += (
        f"trailer\n<< /Encrypt {enc_num} 0 R "
        f"/ID [<{id0.hex()}> <{id0.hex()}>] >>\n"
    ).encode("latin-1")
    return bytes(out)
