"""IMA (DVI) and Microsoft ADPCM decode for WAV payloads.

ADPCM is the last common NON-entropy voice codec in scanner/telephony
archives (format tags 0x0011 and 0x0002): a fixed 4-bit delta
quantizer with a published step/adaptation table — predictor state, no
bitstream entropy coding — so it belongs with the structure-only
container decodes (G.711 landed in r14 on the same reasoning; MP3/MP4
entropy coding stays out of scope). Decoding it means a telephony WAV
re-encode of an indexed clip dedups perceptually (q156) instead of
falling to the exact-byte-hash path.

Scale shape: ADPCM blocks are INDEPENDENT — every block header carries
the full predictor state — so the only true recurrence is the
within-block sample chain. The decoders below vectorize across blocks
with numpy and loop only over the ~500 samples of one block (the same
wavefront trick as the PNG Paeth filter in `containers.py`): per-core
cost is O(samples) numpy element-ops on (nblocks,) vectors, not
per-sample Python. Encoders are fixture/export writers (pure-Python
per-sample loops, not a hot path), kept decoder-consistent by updating
their state through the same table math.

Algorithms are the published IMA/DVI ADPCM reference
(step/index tables, (step>>3)+bit-gated accumulation) and the MS ADPCM
spec (7 coefficient pairs, /256 truncating predictor, adaptive delta);
layout follows the WAVE format registrations (IMA: 4-byte per-channel
preamble then little-nibble-first bytes, stereo in alternating 4-byte
groups; MS: 7-byte per-channel preamble emitting sample2 then sample1,
big-nibble-first bytes, stereo nibbles alternating channels).
Reference parity: none — the reference has no audio surface at all.
"""

from __future__ import annotations

import struct

IMA_STEPS = [
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31,
    34, 37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130,
    143, 157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449,
    494, 544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411,
    1552, 1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026,
    4428, 4871, 5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442,
    11487, 12635, 13899, 15289, 16818, 18500, 20350, 22385, 24623,
    27086, 29794, 32767,
]
IMA_INDEX = [-1, -1, -1, -1, 2, 4, 6, 8]

MS_COEFS = [(256, 0), (512, -256), (0, 0), (192, 64), (240, 0),
            (460, -208), (392, -232)]
MS_ADAPT = [230, 230, 230, 230, 307, 409, 512, 614,
            768, 614, 512, 409, 307, 230, 230, 230]

MAX_BLOCK_ALIGN = 1 << 20  # a crafted fmt chunk must not size arrays


def _trunc_div_256(a):
    """C-style truncation toward zero for the MS predictor (/256 in the
    spec; floor division would round negatives the wrong way)."""
    import numpy as np

    return np.where(a >= 0, a >> 8, -((-a) >> 8))


def decode_ima(data: bytes, channels: int, block_align: int):
    """IMA ADPCM payload → interleaved s16le bytes, or None when the
    geometry is invalid. A ragged final block decodes up to the samples
    its bytes actually carry."""
    import numpy as np

    header = 4 * channels
    if channels < 1 or block_align <= header \
            or block_align > MAX_BLOCK_ALIGN:
        return None
    if channels > 1 and (block_align - header) % (4 * channels):
        return None  # stereo payload must tile 4-byte channel groups
    bpc = (block_align - header) // channels  # payload bytes/channel
    spb = bpc * 2 + 1
    nfull, tail = divmod(len(data), block_align)
    ntail_samples = 0
    if tail >= header and tail > 0:
        # pad the ragged block to full size; zero nibbles past the real
        # payload decode to garbage that we trim below
        avail = tail - header
        if channels > 1:
            avail -= avail % (4 * channels)
        ntail_samples = (avail // channels) * 2 + 1
        data = data[:nfull * block_align + tail] \
            + b"\x00" * (block_align - tail)
        nblocks = nfull + 1
    else:
        data = data[:nfull * block_align]
        nblocks = nfull
    if nblocks == 0:
        return b""
    blocks = np.frombuffer(data, np.uint8).reshape(nblocks, block_align)

    pred = np.empty((nblocks, channels), np.int32)
    idx = np.empty((nblocks, channels), np.int32)
    for c in range(channels):
        hdr = blocks[:, 4 * c:4 * c + 4]
        pred[:, c] = np.ascontiguousarray(hdr[:, :2]).view("<i2")[:, 0]
        idx[:, c] = np.clip(hdr[:, 2].astype(np.int32), 0, 88)
    payload = blocks[:, header:]
    if channels == 1:
        chb = payload[:, None, :]
    else:  # alternating 4-byte groups per channel
        g = payload.reshape(nblocks, -1, channels, 4)
        chb = np.ascontiguousarray(g.transpose(0, 2, 1, 3)).reshape(
            nblocks, channels, bpc)
    nib = np.empty((nblocks, channels, bpc * 2), np.uint8)
    nib[..., 0::2] = chb & 0x0F  # low nibble first
    nib[..., 1::2] = chb >> 4

    steps = np.array(IMA_STEPS, np.int32)
    index = np.array(IMA_INDEX, np.int32)
    out = np.empty((nblocks, spb, channels), np.int16)
    out[:, 0, :] = pred
    for s in range(spb - 1):  # wavefront: numpy across all blocks
        n = nib[:, :, s].astype(np.int32)
        step = steps[idx]
        diff = ((step >> 3)
                + np.where(n & 4, step, 0)
                + np.where(n & 2, step >> 1, 0)
                + np.where(n & 1, step >> 2, 0))
        pred = np.clip(np.where(n & 8, pred - diff, pred + diff),
                       -32768, 32767)
        idx = np.clip(idx + index[n & 7], 0, 88)
        out[:, s + 1, :] = pred

    flat = out.reshape(nblocks * spb, channels)
    if ntail_samples:
        keep = nfull * spb + ntail_samples
        flat = flat[:keep]
    return flat.astype("<i2").tobytes()


def decode_ms(data: bytes, channels: int, block_align: int):
    """MS ADPCM payload → interleaved s16le bytes, or None when the
    geometry is invalid. Ragged final blocks decode their real bytes."""
    import numpy as np

    header = 7 * channels
    if channels < 1 or block_align <= header \
            or block_align > MAX_BLOCK_ALIGN:
        return None
    bpc = (block_align - header) // channels
    spb = bpc * 2 + 2
    nfull, tail = divmod(len(data), block_align)
    ntail_samples = 0
    if tail >= header and tail > 0:
        avail = tail - header
        ntail_samples = (avail // channels) * 2 + 2
        data = data[:nfull * block_align + tail] \
            + b"\x00" * (block_align - tail)
        nblocks = nfull + 1
    else:
        data = data[:nfull * block_align]
        nblocks = nfull
    if nblocks == 0:
        return b""
    blocks = np.frombuffer(data, np.uint8).reshape(nblocks, block_align)

    coefs = np.array(MS_COEFS, np.int32)
    adapt = np.array(MS_ADAPT, np.int32)
    cidx = np.clip(blocks[:, :channels].astype(np.int32), 0, 6)
    c1 = coefs[cidx, 0]  # (nblocks, channels)
    c2 = coefs[cidx, 1]

    def i16(col):  # int16 fields packed per channel after the bytes
        a = blocks[:, channels + 2 * col * channels:
                   channels + 2 * (col + 1) * channels]
        return np.ascontiguousarray(a).view("<i2").astype(np.int32)

    delta = i16(0)
    samp1 = i16(1)
    samp2 = i16(2)
    payload = blocks[:, header:]
    nib = np.empty((nblocks, (block_align - header) * 2), np.uint8)
    nib[:, 0::2] = payload >> 4  # big nibble first
    nib[:, 1::2] = payload & 0x0F
    # stereo: nibbles alternate channels in stream order
    nib = nib.reshape(nblocks, -1, channels)

    out = np.empty((nblocks, spb, channels), np.int16)
    out[:, 0, :] = samp2
    out[:, 1, :] = samp1
    for s in range(spb - 2):
        n = nib[:, s, :].astype(np.int32)
        snib = np.where(n >= 8, n - 16, n)
        predicted = _trunc_div_256(samp1 * c1 + samp2 * c2)
        cur = np.clip(predicted + snib * delta, -32768, 32767)
        samp2, samp1 = samp1, cur
        delta = np.maximum(16, (adapt[n] * delta) >> 8)
        out[:, s + 2, :] = cur

    flat = out.reshape(nblocks * spb, channels)
    if ntail_samples:
        flat = flat[:nfull * spb + ntail_samples]
    return flat.astype("<i2").tobytes()


# ------------------------------------------------------------- writers


def encode_ima(pcm: bytes, channels: int = 1,
               samples_per_block: int = 505) -> tuple[bytes, int]:
    """s16le PCM → (IMA ADPCM payload, block_align). Per-sample Python
    by design (fixture writer); the quantizer updates its state through
    the DECODER's table math so the pair can never drift."""
    import numpy as np

    if (samples_per_block - 1) % 8:
        raise ValueError("samples_per_block-1 must divide by 8")
    samples = np.frombuffer(
        pcm[:len(pcm) - len(pcm) % (2 * channels)], "<i2"
    ).reshape(-1, channels).astype(int)
    bpc = (samples_per_block - 1) // 2
    block_align = 4 * channels + bpc * channels
    out = bytearray()
    idx = [0] * channels
    for b0 in range(0, len(samples), samples_per_block):
        blk = samples[b0:b0 + samples_per_block]
        chnibs: list[list[int]] = []
        for c in range(channels):
            pred = int(blk[0, c])
            out_hdr = struct.pack("<hBB", pred, idx[c], 0)
            nibs = []
            for s in range(1, len(blk)):
                step = IMA_STEPS[idx[c]]
                diff = int(blk[s, c]) - pred
                n = 8 if diff < 0 else 0
                diff = abs(diff)
                if diff >= step:
                    n |= 4
                    diff -= step
                if diff >= step >> 1:
                    n |= 2
                    diff -= step >> 1
                if diff >= step >> 2:
                    n |= 1
                # decoder-consistent state update
                d = (step >> 3) + (step if n & 4 else 0) \
                    + ((step >> 1) if n & 2 else 0) \
                    + ((step >> 2) if n & 1 else 0)
                pred = max(-32768, min(32767, pred - d if n & 8
                                       else pred + d))
                idx[c] = max(0, min(88, idx[c] + IMA_INDEX[n & 7]))
                nibs.append(n)
            # a short FINAL block stays short (the decoder's ragged-
            # block path trims to the bytes actually present); pad only
            # to the layout unit — a byte for mono, a 4-byte channel
            # group for stereo
            unit = 2 if channels == 1 else 8
            nibs += [0] * (-len(nibs) % unit)
            out += out_hdr
            chnibs.append(nibs)
        # payload: mono sequential; stereo alternating 4-byte groups
        bytes_pc = len(chnibs[0]) // 2
        if channels == 1:
            for k in range(bytes_pc):
                out.append(chnibs[0][2 * k] | (chnibs[0][2 * k + 1] << 4))
        else:
            for g in range(0, bytes_pc, 4):
                for c in range(channels):
                    for k in range(g, g + 4):
                        out.append(chnibs[c][2 * k]
                                   | (chnibs[c][2 * k + 1] << 4))
    return bytes(out), block_align


def encode_ms(pcm: bytes, channels: int = 1,
              samples_per_block: int = 500) -> tuple[bytes, int]:
    """s16le PCM → (MS ADPCM payload, block_align); fixed predictor 0
    (coef pair 256/0 — pure delta coding), adaptive delta. Fixture
    writer, decoder-consistent like `encode_ima`."""
    import numpy as np

    samples = np.frombuffer(
        pcm[:len(pcm) - len(pcm) % (2 * channels)], "<i2"
    ).reshape(-1, channels).astype(int)
    bpc = (samples_per_block - 2) // 2
    block_align = 7 * channels + bpc * channels
    out = bytearray()
    for b0 in range(0, len(samples), samples_per_block):
        blk = samples[b0:b0 + samples_per_block]
        if len(blk) < 2:
            break  # a block cannot carry fewer than its two seeds
        s2 = [int(blk[0, c]) for c in range(channels)]
        s1 = [int(blk[1, c]) for c in range(channels)]
        delta = [max(16, abs(s1[c] - s2[c]) // 4 or 16)
                 for c in range(channels)]
        out += bytes([0] * channels)  # predictor index 0 per channel
        for c in range(channels):
            out += struct.pack("<h", delta[c])
        for c in range(channels):
            out += struct.pack("<h", s1[c])
        for c in range(channels):
            out += struct.pack("<h", s2[c])
        nibs = []
        for s in range(2, len(blk)):  # short final block stays short
            for c in range(channels):
                target = int(blk[s, c])
                predicted = s1[c] * 256 + s2[c] * 0
                predicted = (predicted >> 8 if predicted >= 0
                             else -((-predicted) >> 8))
                n = (target - predicted + (delta[c] // 2)) // delta[c]
                n = max(-8, min(7, n))
                cur = max(-32768, min(32767, predicted + n * delta[c]))
                s2[c], s1[c] = s1[c], cur
                nb = n & 0x0F
                delta[c] = max(16, (MS_ADAPT[nb] * delta[c]) >> 8)
                nibs.append(nb)
        nibs += [0] * (len(nibs) % 2)
        for k in range(0, len(nibs), 2):
            out.append((nibs[k] << 4) | nibs[k + 1])
    return bytes(out), block_align


def encode_wav_adpcm(pcm: bytes, sample_rate: int, channels: int = 1,
                     codec: str = "ima") -> bytes:
    """RIFF/WAVE writer around `encode_ima` / `encode_ms`: fmt chunk
    with the codec's extension words (wSamplesPerBlock; MS adds the
    coefficient table) and a fact chunk, per the WAVE registrations."""
    if codec == "ima":
        payload, block_align = encode_ima(pcm, channels)
        spb = ((block_align - 4 * channels) // channels) * 2 + 1
        ext = struct.pack("<H", spb)
        tag = 0x0011
    elif codec == "ms":
        payload, block_align = encode_ms(pcm, channels)
        spb = ((block_align - 7 * channels) // channels) * 2 + 2
        ext = struct.pack("<HH", spb, len(MS_COEFS))
        for a, b in MS_COEFS:
            ext += struct.pack("<hh", a, b)
        tag = 0x0002
    else:
        raise ValueError("codec must be 'ima' or 'ms'")
    nsamples = len(pcm) // (2 * channels)
    fmt = struct.pack(
        "<HHIIHH", tag, channels, sample_rate,
        sample_rate * block_align // max(1, spb), block_align, 4,
    ) + struct.pack("<H", len(ext)) + ext
    chunks = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + (b"\x00" if len(fmt) & 1 else b"")
        + b"fact" + struct.pack("<II", 4, nsamples)
        + b"data" + struct.pack("<I", len(payload)) + payload
        + (b"\x00" if len(payload) & 1 else b"")
    )
    return b"RIFF" + struct.pack("<I", len(chunks)) + chunks
