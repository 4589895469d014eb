"""GIF container codec (sources/gif.py) + wiring (q159).

Pins: the GIF LZW variant (LSB-first, variable min code size, no
early change, table-full clears, deferred clear) round trips and
matches the JDK's GIF codec BYTE-EXACTLY in both directions; static /
interlaced / animated round trips; frame composition (disposal 1/2/3,
transparency index, sub-rect frames); the all-gray palette collapse;
animated-gray-GIF → raw VIDEO row through normalize_assets; strict
rejection (None, never an exception).
"""

from __future__ import annotations

import numpy as np
import pytest

from ocr_vector_db_spark.sources.gif import (
    GIF_MAGICS,
    decode_gif,
    decode_gif_asset,
    encode_gif,
    extract_gif_frames,
    gif_lzw_decode,
    gif_lzw_encode,
)


def _gradient(w, h, seed=5):
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.sin(xx / (4.0 + seed)) * 55 + np.cos(yy / 5.0) * 45 + 128
    return (np.clip(img, 0, 255).astype(np.uint8) // 2) * 2


def test_gif_lzw_round_trip_property():
    """Width growth through 2^w boundaries, table-full clears, small
    minimum code sizes, incompressible data."""
    rng = np.random.default_rng(7)
    for mcs in (2, 4, 8):
        maxv = 1 << mcs
        for n in (1, 5, 600, 30000, 90000):
            d = bytes(rng.integers(0, maxv, n).astype(np.uint8))
            assert gif_lzw_decode(gif_lzw_encode(d, mcs), mcs, n) == d
    with pytest.raises(Exception):
        gif_lzw_decode(b"\x00", 8, 100)  # truncated


@pytest.mark.parametrize("interlace", [False, True])
def test_static_round_trip(interlace):
    img = _gradient(72, 40)
    g = encode_gif(img.tobytes(), 72, 40, 1, interlace=interlace)
    d = decode_gif(g)
    assert (d["width"], d["height"], d["channels"]) == (72, 40, 1)
    assert d["raw"] == img.tobytes()  # gray palette collapses
    assert d["n_frames"] == 1


def test_rgb_round_trip_and_palette_limit():
    rgb = np.zeros((30, 40, 3), np.uint8)
    rgb[:15] = [200, 30, 40]
    rgb[15:] = [10, 220, 100]
    rgb[::3, ::4] = [5, 5, 250]
    g = encode_gif(rgb.tobytes(), 40, 30, 3)
    d = decode_gif(g)
    assert d["channels"] == 3 and d["raw"] == rgb.tobytes()
    # > 256 distinct colors must refuse to encode, not quantize
    rng = np.random.default_rng(1)
    noisy = rng.integers(0, 256, (30, 40, 3)).astype(np.uint8)
    with pytest.raises(ValueError):
        encode_gif(noisy.tobytes(), 40, 30, 3)


def test_animation_round_trip_and_video_asset():
    base = _gradient(36, 24)
    frames = [np.roll(base, i * 3, axis=1).tobytes() for i in range(6)]
    g = encode_gif(frames, 36, 24, 1)
    ext = extract_gif_frames(g)
    assert [f["data"] for f in ext] == frames
    assert ext[3]["metadata"]["frame"] == "3"
    asset = decode_gif_asset(g)
    assert asset["kind"] == "video" and asset["n_frames"] == 6
    assert asset["raw"] == b"".join(frames)
    assert asset["channels"] == 1
    # a single-frame GIF stays an image asset
    assert decode_gif_asset(encode_gif(frames[0], 36, 24, 1))["kind"] \
        == "image"


def test_composition_disposal_and_transparency():
    """Hand-built animation: frame 2 is a SUB-RECT with a transparency
    index (underlying canvas shows through) after disposal-2 (restore
    background) of frame 1 — composition must match a scalar model."""
    import struct as _st

    # 2-entry palette: color 0 = 10, color 1 = 200 (gray)
    pal = bytes([10, 10, 10, 200, 200, 200]).ljust(6, b"\x00")
    w, h = 8, 6
    f1 = np.ones((h, w), np.uint8)          # all color 1 (200)
    f2 = np.zeros((3, 4), np.uint8)         # sub-rect at (2,1), color 0
    f2[1, 1] = 1                            # one transparent pixel (idx
    out = bytearray(b"GIF89a")              # 1 declared transparent)
    out += _st.pack("<HH", w, h)
    out += bytes((0x80, 0, 0))  # GCT 2 entries, bg 0
    out += pal
    # frame 1: GCE disposal=2 (restore bg), full frame
    out += b"\x21\xf9\x04" + bytes(((2 << 2),)) + b"\x00\x00\x00\x00"
    out += b"\x2c" + _st.pack("<HHHH", 0, 0, w, h) + b"\x00"
    s = gif_lzw_encode(f1.tobytes(), 2)
    out += bytes((2, len(s))) + s + b"\x00"
    # frame 2: GCE transparent idx 1, sub-rect at (x=2, y=1)
    out += b"\x21\xf9\x04" + bytes((0x01,)) + b"\x00\x00\x01\x00"
    out += b"\x2c" + _st.pack("<HHHH", 2, 1, 4, 3) + b"\x00"
    s = gif_lzw_encode(f2.tobytes(), 2)
    out += bytes((2, len(s))) + s + b"\x00"
    out += b"\x3b"

    frames = extract_gif_frames(bytes(out))
    assert len(frames) == 2
    got1 = np.frombuffer(frames[0]["data"], np.uint8).reshape(h, w)
    assert (got1 == 200).all()
    got2 = np.frombuffer(frames[1]["data"], np.uint8).reshape(h, w)
    # canvas was restored to bg (10) after frame 1; the sub-rect paints
    # 10s except its transparent pixel, which shows the bg 10 as well
    want = np.full((h, w), 10, np.uint8)
    assert np.array_equal(got2, want)


def test_rejections_return_none_never_raise():
    img = _gradient(24, 12)
    good = encode_gif(img.tobytes(), 24, 12, 1)
    assert decode_gif(b"notagif") is None
    assert decode_gif(b"GIF89a\x01") is None
    assert decode_gif(good[:-8]) is None  # truncated (no trailer/data)
    assert extract_gif_frames(b"GIF87a|||") == []
    for off in range(6, len(good), 3):
        bad = bytearray(good)
        bad[off] ^= 0x5A
        try:
            r = decode_gif(bytes(bad))
        except Exception as exc:  # pragma: no cover
            raise AssertionError(f"raised at {off}: {exc}")
        assert r is None or isinstance(r["raw"], bytes)
    # absurd geometry rejects up front
    big = bytearray(good)
    import struct as _st

    _st.pack_into("<HH", big, 6, 65535, 65535)
    assert decode_gif(bytes(big)) is None


def test_gif_mutation_fuzz_never_raises():
    """Seeded 2k-mutation no-raise fuzz over static, interlaced and
    animated streams (LZW table state, sub-block walk, composition
    bounds all see hostile bytes)."""
    img = _gradient(28, 18)
    frames = [np.roll(img, i * 2, axis=1).tobytes() for i in range(4)]
    corpus = [
        encode_gif(img.tobytes(), 28, 18, 1),
        encode_gif(img.tobytes(), 28, 18, 1, interlace=True),
        encode_gif(frames, 28, 18, 1),
    ]
    rng = np.random.default_rng(29)
    for _ in range(2000):
        base = corpus[int(rng.integers(len(corpus)))]
        bad = bytearray(base)
        for _ in range(int(rng.integers(1, 4))):
            bad[int(rng.integers(len(bad)))] = int(rng.integers(256))
        try:
            out = decode_gif(bytes(bad))
            extract_gif_frames(bytes(bad), max_frames=8)
        except Exception as exc:  # pragma: no cover
            raise AssertionError(f"raised: {exc!r}")
        assert out is None or isinstance(out["raw"], bytes)


def test_adpcm_wav_mutation_fuzz_never_raises():
    """Same discipline for the ADPCM WAV dispatch (fmt lies, block
    geometry, payload corruption)."""
    from ocr_vector_db_spark.sources.adpcm import encode_wav_adpcm
    from ocr_vector_db_spark.sources.containers import decode_wav

    t = np.arange(4000)
    pcm = np.clip(6000 * np.sin(t / 23), -32768, 32767).astype(
        "<i2").tobytes()
    corpus = [
        encode_wav_adpcm(pcm, 16000, 1, "ima"),
        encode_wav_adpcm(pcm, 16000, 1, "ms"),
        encode_wav_adpcm(pcm + pcm, 16000, 2, "ima"),
    ]
    rng = np.random.default_rng(31)
    for _ in range(2000):
        base = corpus[int(rng.integers(len(corpus)))]
        bad = bytearray(base)
        for _ in range(int(rng.integers(1, 4))):
            bad[int(rng.integers(len(bad)))] = int(rng.integers(256))
        try:
            out = decode_wav(bytes(bad))
        except Exception as exc:  # pragma: no cover
            raise AssertionError(f"raised: {exc!r}")
        assert out is None or isinstance(out["pcm"], bytes)


def test_normalize_assets_decodes_gif(spark):
    from ocr_vector_db_spark.sources.containers import normalize_assets

    img = _gradient(40, 24)
    frames = [np.roll(img, i * 2, axis=0).tobytes() for i in range(4)]
    rows = [
        ("pic", "unknown", encode_gif(img.tobytes(), 40, 24, 1), {}),
        ("anim", "unknown", encode_gif(frames, 40, 24, 1), {}),
        ("bad", "unknown", b"GIF89a junk", {}),
    ]
    adf = spark.createDataFrame(
        rows,
        "asset_id string, kind string, data binary, "
        "metadata map<string,string>",
    )
    got = {r.asset_id: r for r in normalize_assets(adf).collect()}
    md = dict(got["pic"].metadata)
    assert (got["pic"].kind, md["container"], md["n_frames"]) == (
        "image", "gif", "1")
    assert bytes(got["pic"].data) == img.tobytes()
    md = dict(got["anim"].metadata)
    assert (got["anim"].kind, md["n_frames"], md["fps"]) == (
        "video", "4", "1")
    assert bytes(got["anim"].data) == b"".join(frames)
    assert bytes(got["bad"].data) == b"GIF89a junk"


def test_normalize_video_rows_slim_shape(spark):
    """The video streaming gate's slim row shape (id, data, width,
    height, n_frames): an animated gray GIF payload swaps to raw frame
    buffers with the header dims OVERWRITING the row's (untrusted)
    declared ones; a single-frame GIF and a non-GIF row pass through
    unchanged."""
    from ocr_vector_db_spark.sources.containers import (
        normalize_video_rows,
    )

    img = _gradient(36, 24)
    frames = [np.roll(img, i * 2, axis=1).tobytes() for i in range(5)]
    anim = encode_gif(frames, 36, 24, 1)
    still = encode_gif(frames[0], 36, 24, 1)
    rawvid = b"".join(frames)
    rows = [
        # declared dims LIE (1x1x1) — the container header must win
        ("anim", anim, 1, 1, 1),
        ("still", still, 9, 9, 9),
        ("raw", rawvid, 36, 24, 5),
    ]
    df = spark.createDataFrame(
        rows,
        "asset_id string, data binary, width int, height int, "
        "n_frames int",
    )
    got = {r.asset_id: r for r in normalize_video_rows(df).collect()}
    assert bytes(got["anim"].data) == rawvid
    assert (got["anim"].width, got["anim"].height,
            got["anim"].n_frames) == (36, 24, 5)
    assert bytes(got["still"].data) == still  # no gray-video shape
    assert (got["still"].width, got["still"].height) == (9, 9)
    assert bytes(got["raw"].data) == rawvid  # passthrough


def test_stream_gate_dedups_animated_gif(spark, tmp_path):
    """End-to-end through the streaming VIDEO gate with the CLI's
    normalize_video_rows wiring: an animated-GIF re-encode of an
    INDEXED raw clip is dropped perceptually through the aligned
    frame-hash screen — before this seam it fell to the exact-hash
    path and was wrongly accepted. The GIF row's declared dims lie
    (the container header wins)."""
    import shutil

    from ocr_vector_db_spark.operators.video_hash import VideoFpIndex
    from ocr_vector_db_spark.sources.containers import (
        normalize_video_rows,
    )
    from ocr_vector_db_spark.streaming.assets import (
        exact_video_key,
        hashable_videos_pred,
        stream_ingest_asset_dedup,
    )
    from ocr_vector_db_spark.streaming.pipeline import ParquetAcceptedSink

    base = _gradient(36, 24)
    frames = [np.roll(base, i * 3, axis=1).tobytes() for i in range(8)]
    rawvid = b"".join(frames)
    other = [np.roll(255 - base, i * 5, axis=0).tobytes()
             for i in range(8)]
    clips = spark.createDataFrame(
        [("orig", rawvid, 36, 24, 8)],
        "asset_id string, data binary, width int, height int, "
        "n_frames int",
    )
    idx = VideoFpIndex.build(spark, clips, str(tmp_path / "vfp_gif"),
                             r=4, n_buckets=8, every=2, min_frac=0.6)

    stage = tmp_path / "gif_stage"
    spark.createDataFrame(
        [("re_encode_gif", encode_gif(frames, 36, 24, 1), 1, 1, 1),
         ("novel", b"".join(other), 36, 24, 8)],
        "asset_id string, data binary, width int, height int, "
        "n_frames int",
    ).coalesce(1).write.mode("overwrite").parquet(str(stage))
    src = tmp_path / "gif_src"
    src.mkdir()
    shutil.copy(next(stage.glob("part-*.parquet")), src / "b0.parquet")

    stats: list = []
    sink = ParquetAcceptedSink(str(tmp_path / "gif_acc"))
    q = stream_ingest_asset_dedup(
        normalize_video_rows(
            spark.readStream
            .schema("asset_id string, data binary, width int, "
                    "height int, n_frames int")
            .parquet(str(src))
        ),
        idx, sink, stats=stats, checkpoint=str(tmp_path / "gif_ckpt"),
        hashable_pred=hashable_videos_pred, exact_key=exact_video_key,
    )
    q.awaitTermination(60)
    assert stats[-1]["accepted"] == 1
    assert stats[-1]["dropped_as_dup"] == 1  # the GIF re-encode
    assert [r.asset_id for r in sink.read(spark).collect()] == ["novel"]


def test_jdk_gif_parity_both_directions(spark):
    """javax.imageio's GIF codec (independent, in every JRE since 1.4):
    our encoder's output decodes byte-exactly there (static, interlaced,
    RGB), and a JDK-WRITTEN GIF decodes byte-exactly through us."""
    jvm = spark._jvm
    gw = spark.sparkContext._gateway

    def jdk_rgb(data, w, h):
        img = jvm.javax.imageio.ImageIO.read(
            jvm.java.io.ByteArrayInputStream(data))
        if img is None:
            return None
        argb = img.getRGB(0, 0, w, h, None, 0, w)
        a = np.array(list(argb), np.int64) & 0xFFFFFF
        return np.stack([(a >> 16) & 255, (a >> 8) & 255, a & 255],
                        -1).astype(np.uint8).reshape(h, w, 3)

    img = _gradient(72, 40)
    for interlace in (False, True):
        g = encode_gif(img.tobytes(), 72, 40, 1, interlace=interlace)
        theirs = jdk_rgb(g, 72, 40)
        ours = np.repeat(
            np.frombuffer(decode_gif(g)["raw"], np.uint8).reshape(
                40, 72, 1), 3, 2)
        assert theirs is not None and np.array_equal(theirs, ours)

    rgb = np.zeros((30, 40, 3), np.uint8)
    rgb[:15] = [200, 30, 40]
    rgb[15:] = [10, 220, 100]
    rgb[::3, ::4] = [5, 5, 250]
    g = encode_gif(rgb.tobytes(), 40, 30, 3)
    theirs = jdk_rgb(g, 40, 30)
    assert np.array_equal(
        theirs,
        np.frombuffer(decode_gif(g)["raw"], np.uint8).reshape(30, 40, 3))

    # reverse: JDK writes, we decode
    bi = jvm.java.awt.image.BufferedImage(
        72, 40, jvm.java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    arr = gw.new_array(gw.jvm.int, 72 * 40)
    flat = img.reshape(-1)
    for i in range(flat.size):
        arr[i] = int(flat[i])
    bi.getRaster().setPixels(0, 0, 72, 40, arr)
    baos = jvm.java.io.ByteArrayOutputStream()
    assert jvm.javax.imageio.ImageIO.write(bi, "gif", baos)
    d = decode_gif(bytes(baos.toByteArray()))
    assert d is not None and d["channels"] == 1
    assert d["raw"] == img.tobytes()
