"""Audio energy fingerprints + quality gates over raw PCM16 (q153/q154).

Pins the Spark Column math against an independent pure-Python reference
(per-sample frame sums, integer cross-multiplied comparisons), the two
EXACT invariances (gain, 2× sample duplication), banded ≡ brute-force pair
parity, the persisted incremental screen (AudioFpIndex via SimHashIndex's
hook), and the map-side-combine plan shape.
"""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from ocr_vector_db_spark.operators.audio_fingerprint import (
    N_FRAMES,
    asset_pcm_frames,
    audio_fingerprints,
    audio_near_dup_pairs,
    audio_quality_stats,
    pcm_frame_cells,
)
from ocr_vector_db_spark.operators.image_hash import hamming_hex


def _synth(seed: str, n: int, gain: int = 1, burst=None, zero=None,
           clip_at=None, seg_len: int = 997):
    """Deterministic triangle wave with a per-segment md5 amplitude
    envelope — energy structure without any audio library. Keep
    `seg_len` at or below the frame length (n/65) when a test needs
    distinct seeds to be FAR in signature space: longer envelopes leave
    consecutive frames near-tied and collapse the signature entropy."""
    out = []
    for i in range(n):
        seg = i // seg_len
        a = hashlib.md5(f"{seed}:{seg}".encode()).digest()[0] % 48 * 64 + 400
        v = a * ((i % 50) - 25) // 25 * gain
        if burst and burst[0] <= i < burst[1]:
            v = min(32767, v + 15000)
        if zero and zero[0] <= i < zero[1]:
            v = 0
        if clip_at and clip_at[0] <= i < clip_at[1]:
            v = 32767 if v >= 0 else -32768
        out.append(max(-32768, min(32767, v)))
    return out


def _pcm(samples) -> bytes:
    return b"".join(int(s).to_bytes(2, "little", signed=True)
                    for s in samples)


def _ref_cells(samples, n_frames=N_FRAMES):
    n = len(samples)
    s = [0] * n_frames
    c = [0] * n_frames
    for x, v in enumerate(samples):
        f = x * n_frames // n
        s[f] += abs(v)
        c[f] += 1
    return s, c


def _ref_fp(samples) -> str:
    s, c = _ref_cells(samples)
    val = 0
    for i in range(N_FRAMES - 1):
        val = val * 2 + (1 if s[i] * c[i + 1] > s[i + 1] * c[i] else 0)
    return format(val, "016x")


def _clips_df(spark, clips):
    rows = [(aid, _pcm(s), len(s), 16000) for aid, s in clips]
    return spark.createDataFrame(
        rows,
        "asset_id string, data binary, n_samples long, sample_rate int",
    )


def test_fingerprint_matches_python_reference(spark):
    """Spark signature == independent per-sample reference, across chunk
    straddles (n > 4096, not divisible by 65 or 4096) and a sub-chunk
    clip."""
    clips = [
        ("a", _synth("clip-A", 13001)),   # 4 chunks, straddling frames
        ("b", _synth("clip-B", 13001)),
        ("small", _synth("clip-S", 900)),  # single partial chunk
        ("odd", _synth("clip-O", 4161)),   # just past one chunk
    ]
    got = {r.id: r.afp
           for r in audio_fingerprints(_clips_df(spark, clips)).collect()}
    for aid, s in clips:
        assert got[aid] == _ref_fp(s), aid


def test_gain_and_upsample_invariance(spark):
    """The two bit-exact invariances: integer gain (no clipping) scales
    every cross-multiplication uniformly; 2× sample duplication doubles
    every frame sum AND count (per-sample frame convention)."""
    base = _synth("inv", 13000)
    clips = [
        ("base", base),
        ("gain3", [v * 3 for v in base]),
        ("up2", [v for v in base for _ in (0, 1)]),
        ("burst", _synth("inv", 13000, burst=(6000, 6400))),
        ("other", _synth("inv-other", 13000)),
    ]
    got = {r.id: r.afp
           for r in audio_fingerprints(_clips_df(spark, clips)).collect()}
    assert got["base"] == got["gain3"] == got["up2"]
    assert got["burst"] != got["base"]
    pairs = {(p.id_a, p.id_b): p.hamming
             for p in audio_near_dup_pairs(
                 audio_fingerprints(_clips_df(spark, clips)), r=6
             ).collect()}
    assert pairs[("base", "gain3")] == 0
    assert pairs[("base", "up2")] == 0
    assert 0 < pairs[("base", "burst")] <= 6
    assert not any("other" in k for k in pairs)


@pytest.mark.parametrize("r", [2, 6])
def test_banded_equals_brute_force(spark, r):
    """The nibble pigeonhole screen returns EXACTLY the brute-force
    cross-join pairs at radius r (the q88/q127/q150 discipline)."""
    clips = [(f"c{i}", _synth(f"bf-{i // 3}", 7000,
                              burst=(i % 3 * 900, i % 3 * 900 + 300)))
             for i in range(9)]
    sigs = audio_fingerprints(_clips_df(spark, clips))
    banded = {(p.id_a, p.id_b): p.hamming
              for p in audio_near_dup_pairs(sigs, r=r).collect()}
    a = sigs.select(F.col("id").alias("id_a"), F.col("afp").alias("fa"))
    b = sigs.select(F.col("id").alias("id_b"), F.col("afp").alias("fb"))
    brute = {
        (p.id_a, p.id_b): p.h
        for p in a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("h", hamming_hex(F.col("fa"), F.col("fb")))
        .filter(F.col("h") <= r).collect()
    }
    assert banded == brute


def test_asset_pcm_frames_projection(spark):
    """Only mono raw PCM16 rows reach the math; compressed and stereo
    rows wait for the decode seam (like jpeg vs asset_gray_frames)."""
    rows = [
        ("mono", "audio", _pcm(_synth("p", 200)),
         {"format": "pcm_s16le", "channels": "1", "sample_rate": "8000"}),
        ("stereo", "audio", b"\x00\x01" * 64,
         {"format": "pcm_s16le", "channels": "2", "sample_rate": "8000"}),
        ("mp3", "audio", b"ID3fake", {"format": "mp3"}),
        ("img", "image", b"px", {"format": "raw", "channels": "1"}),
    ]
    adf = spark.createDataFrame(
        rows,
        "asset_id string, kind string, data binary, "
        "metadata map<string,string>",
    )
    got = {r.asset_id: (r.n_samples, r.sample_rate)
           for r in asset_pcm_frames(adf).collect()}
    assert got == {"mono": (200, 8000)}


def test_asset_pcm_frames_downmix(spark):
    """`downmix=True` (verdict r13 #7) averages multichannel pcm_s16le
    rows to mono with exact integer semantics — an L==R stereo spread
    of a mono clip comes back BYTE-IDENTICAL, a 3-channel mix floors
    sum/3, a ragged tail drops — while the mono fast path and the
    decode-seam filters (mp3) are untouched."""
    from ocr_vector_db_spark.operators.audio_fingerprint import (
        downmix_pcm16_bytes,
    )

    mono = _pcm(_synth("p", 200))
    spread = b"".join(mono[i:i + 2] * 2 for i in range(0, len(mono), 2))
    tri = b"".join(
        v.to_bytes(2, "little", signed=True)
        for v in (10, 20, 31, -10, -20, -31)
    )
    rows = [
        ("mono", "audio", mono,
         {"format": "pcm_s16le", "channels": "1", "sample_rate": "8000"}),
        ("spread", "audio", spread,
         {"format": "pcm_s16le", "channels": "2", "sample_rate": "8000"}),
        ("tri", "audio", tri + b"\x07\x00",  # ragged: 1 extra sample
         {"format": "pcm_s16le", "channels": "3", "sample_rate": "8000"}),
        ("mp3", "audio", b"ID3fake", {"format": "mp3"}),
    ]
    adf = spark.createDataFrame(
        rows,
        "asset_id string, kind string, data binary, "
        "metadata map<string,string>",
    )
    got = {r.asset_id: (bytes(r.data), r.n_samples)
           for r in asset_pcm_frames(adf, downmix=True).collect()}
    assert set(got) == {"mono", "spread", "tri"}
    assert got["spread"] == (mono, 200)     # L==R round-trips exactly
    assert got["mono"] == (mono, 200)
    # floor((10+20+31)/3)=20, floor((-10-20-31)/3)=-21 (floor, not trunc)
    assert got["tri"] == (_pcm([20, -21]), 2)
    assert downmix_pcm16_bytes(b"\x01\x00", 2) == b""  # sub-frame clip


def test_degenerate_inputs_filtered(spark):
    """Clips shorter than the frame grid (or with odd byte length) carry
    no frame structure and are dropped, not crashed on."""
    ok = _synth("ok", 700)
    rows = [
        ("ok", _pcm(ok), 700, 16000),
        ("short", _pcm(_synth("s", N_FRAMES - 1)), N_FRAMES - 1, 16000),
    ]
    df = spark.createDataFrame(
        rows,
        "asset_id string, data binary, n_samples long, sample_rate int",
    )
    odd = spark.createDataFrame(
        [("odd", b"\x01\x02\x03", 1, 16000)],
        "asset_id string, data binary, n_samples long, sample_rate int",
    )
    got = audio_fingerprints(df.unionByName(odd))
    assert [r.id for r in got.collect()] == ["ok"]
    assert got.filter(F.col("id") == "ok").first().afp == _ref_fp(ok)


def test_quality_stats_match_reference(spark):
    """Every gate field equals the independent reference: the integer
    sums are exact, and both engines do the same IEEE division at the
    end. The quiet clip trips silence_ratio; the clipped clip trips
    clip_ratio; the biased clip shows its dc_offset."""
    quiet = _synth("q", 13000, zero=(2000, 8000))
    clipped = _synth("cl", 13000, clip_at=(1000, 3000))
    biased = [v + 500 for v in _synth("b", 13000, gain=0)]  # pure DC
    clips = [("quiet", quiet), ("clipped", clipped), ("biased", biased)]
    got = {r.asset_id: r
           for r in audio_quality_stats(_clips_df(spark, clips)).collect()}
    for aid, s in clips:
        n = len(s)
        sa = sum(abs(v) for v in s)
        sq = sum(v * v for v in s)
        fr_s, fr_c = _ref_cells(s)
        silent = sum(1 for f in range(N_FRAMES)
                     if fr_s[f] < fr_c[f] * 100)
        r = got[aid]
        assert r.duration_s == n / 16000
        assert r.mean_abs == sa / n
        assert r.rms == math.sqrt(sq / n)
        assert r.peak_abs == max(abs(v) for v in s)
        assert r.clip_ratio == sum(1 for v in s if abs(v) >= 32767) / n
        assert r.dc_offset == sum(s) / n
        assert r.silence_ratio == silent / N_FRAMES
    assert got["quiet"].silence_ratio > 0.3
    assert got["clipped"].clip_ratio > 0.05
    assert got["biased"].dc_offset == 500.0


def test_audio_index_incremental_screen(spark, tmp_path):
    """AudioFpIndex = SimHashIndex via the _sig_expr hook (PhashIndex's
    single-seam pattern): build, screen, dedup_new, add + replay guard,
    and screen ≡ the one-shot pairs restricted to cross-side pairs."""
    from ocr_vector_db_spark.operators.audio_fingerprint import AudioFpIndex

    corpus = [(s, _synth(s, 9000, seg_len=130)) for s in ("tka", "tkb", "tkc")]
    idx = AudioFpIndex.build(
        spark, _clips_df(spark, corpus), str(tmp_path / "afpidx"), r=6
    )
    base = _synth("tka", 9000, seg_len=130)
    batch = [
        ("tka_gain", [v * 2 for v in base]),                 # hamming 0
        ("tka_burst", _synth("tka", 9000, burst=(4000, 4500), seg_len=130)),
        ("fresh", _synth("tknew", 9000, seg_len=130)),
    ]
    bdf = _clips_df(spark, batch)
    hits = idx.screen(bdf, id_col="asset_id")
    got = {(h.new_id, h.corpus_id): h.hamming for h in hits.collect()}
    assert got[("tka_gain", "tka")] == 0
    assert ("tka_burst", "tka") in got and got[("tka_burst", "tka")] <= 6
    assert not any(n == "fresh" for n, _ in got)

    both = _clips_df(spark, corpus + batch)
    sigs = audio_fingerprints(both)
    corpus_ids = {c[0] for c in corpus}
    cross = {
        tuple(sorted((p.id_a, p.id_b))): p.hamming
        for p in audio_near_dup_pairs(sigs, r=6).collect()
        if (p.id_a in corpus_ids) != (p.id_b in corpus_ids)
    }
    assert cross == {tuple(sorted(k)): v for k, v in got.items()}

    survivors = idx.dedup_new(bdf, id_col="asset_id")
    assert [r.asset_id for r in survivors.collect()] == ["fresh"]
    assert idx.add(survivors, id_col="asset_id") == 1
    assert idx.add(bdf, id_col="asset_id") == 2
    assert idx.add(bdf, id_col="asset_id") == 0
    reloaded = AudioFpIndex.load(spark, str(tmp_path / "afpidx"))
    assert reloaded.bits == 64 and reloaded.signatures().count() == 6


def test_frame_cells_plan_shape(spark):
    """The 100 TB claim, pinned (SCALING.md): the sample grain never
    shuffles — per-chunk frame sums reduce map-side (partial_sum before
    the (id, f) exchange), chunks come from the transform+posexplode
    that hands each row ONE chunk's hex, nothing is a cartesian."""
    df = _clips_df(spark, [("a", _synth("plan", 13000))])
    plan = pcm_frame_cells(df)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "posexplode(transform(sequence(" in plan
    # the chunk cut must slice the BINARY column (direct-offset
    # arraycopy) and hex per chunk — one whole-clip hex() followed by
    # string substring cuts is O(offset) per cut and goes quadratic on
    # long clips (the ADVICE r12 finding: 2M->4M samples went 3.2x)
    assert "hex(substr(__bin" in plan
    assert "hex(data" not in plan
    import re

    first_exchange = plan.index("Exchange hashpartitioning")
    assert re.search(r"partial_sum", plan[first_exchange:]), plan


def test_stream_ingest_audio_dedup(spark, tmp_path):
    """The streaming asset gate through its audio seams: batch 1 seeds
    the persisted AudioFpIndex; batch 2's 2x-gain re-encode of an
    indexed clip drops against the store, an intra-batch re-encode pair
    collapses keep-min, a sub-frame-grid jingle dedups by exact byte
    hash cross-batch, and the novel clip is accepted and folded in."""
    import shutil

    from ocr_vector_db_spark.operators.audio_fingerprint import AudioFpIndex
    from ocr_vector_db_spark.streaming.assets import (
        ExactFrameStore,
        exact_clip_key,
        hashable_clips_pred,
        stream_ingest_asset_dedup,
    )
    from ocr_vector_db_spark.streaming.pipeline import ParquetAcceptedSink

    schema = "asset_id string, data binary"

    def feed(src, name, rows):
        stage = tmp_path / f"stage_{name}"
        spark.createDataFrame(
            [(aid, _pcm(s)) for aid, s in rows], schema
        ).coalesce(1).write.mode("overwrite").parquet(str(stage))
        part = next(stage.glob("part-*.parquet"))
        src.mkdir(exist_ok=True)
        shutil.copy(part, src / f"{name}.parquet")

    take_a = _synth("st-a", 9000, seg_len=130)
    take_b = _synth("st-b", 9000, seg_len=130)
    take_new = _synth("st-new", 9000, seg_len=130)
    jingle = _synth("st-jingle", 40)  # below the 65-sample frame grid

    empty = spark.createDataFrame([], schema)
    idx = AudioFpIndex.build(
        spark, empty, str(tmp_path / "afpidx_stream"), r=6, n_buckets=8
    )
    xstore = ExactFrameStore(spark, str(tmp_path / "exact_clips"))
    src = tmp_path / "clips"
    sink = ParquetAcceptedSink(str(tmp_path / "accepted_audio"))
    ckpt = str(tmp_path / "auctkpt")

    def run(stats):
        q = stream_ingest_asset_dedup(
            spark.readStream.schema(schema).parquet(str(src)), idx, sink,
            stats=stats, checkpoint=ckpt, exact_store=xstore,
            hashable_pred=hashable_clips_pred,
            exact_key=exact_clip_key,
        )
        q.awaitTermination(60)

    feed(src, "b1", [("take_a", take_a), ("take_b", take_b),
                     ("jingle", jingle)])
    stats: list = []
    run(stats)
    assert sorted(r.asset_id for r in sink.read(spark).collect()) == \
        ["jingle", "take_a", "take_b"]
    assert stats[-1] == {"epoch": 0, "accepted": 3, "dropped_as_dup": 0,
                         "unhashable": 1, "dropped_exact_dup": 0}

    # batch 2: a gain re-encode of an indexed take (store screen), two
    # re-encodes of a new take in the SAME batch (keep-min), the same
    # jingle bytes again (exact store screen), one novel take
    feed(src, "b2", [
        ("take_a_loud", [v * 2 for v in take_a]),
        ("take_new_a", take_new),
        ("take_new_b", [v * 3 for v in take_new]),
        ("jingle_again", jingle),
        ("take_novel", _synth("st-novel", 9000, seg_len=130)),
    ])
    stats2: list = []
    run(stats2)
    accepted = {(r.asset_id, r.epoch_id) for r in sink.read(spark).collect()}
    assert accepted == {("take_a", 0), ("take_b", 0), ("jingle", 0),
                        ("take_new_a", 1), ("take_novel", 1)}
    assert stats2[-1] == {"epoch": 1, "accepted": 2, "dropped_as_dup": 2,
                          "unhashable": 1, "dropped_exact_dup": 1}
    sigs = {r.doc for r in idx.signatures().collect()}
    assert sigs == {"take_a", "take_b", "take_new_a", "take_novel"}


def test_resample_pcm_matches_reference_and_round_trips(spark):
    """resample_pcm = exact box-average decimation, pinned against an
    independent Python reference across factors (incl. a factor that
    doesn't divide the chunk size or n), and decimating an exact 2x
    upsample by 2 returns the ORIGINAL BYTES."""
    from ocr_vector_db_spark.operators.audio_fingerprint import resample_pcm

    def ref(samples, f):
        out = []
        for o in range(len(samples) // f):
            s = sum(samples[o * f:(o + 1) * f])
            out.append((2 * s + f) // (2 * f))
        return _pcm(out)

    base = _synth("rs", 13001)
    other = _synth("rs-b", 9000)
    df = _clips_df(spark, [("a", base), ("b", other)])
    for f in (2, 3, 4):
        got = {r.asset_id: bytes(r.data)
               for r in resample_pcm(df, f).collect()}
        assert got == {"a": ref(base, f), "b": ref(other, f)}, f

    up2 = [v for v in base for _ in (0, 1)]
    rt = resample_pcm(
        _clips_df(spark, [("u", up2)]), 2
    ).first()
    assert bytes(rt.data) == _pcm(base)

    # factor=1 is the identity passthrough
    ident = resample_pcm(df, 1).collect()
    assert {r.asset_id: bytes(r.data) for r in ident} == \
        {"a": _pcm(base), "b": _pcm(other)}


def test_resample_pcm_sub_factor_clip_keeps_row(spark):
    """A clip with n < factor decimates to ZERO samples but must still
    emit its row (empty bytes) — the pre-fix filter dropped it entirely,
    so id joins on resampled output silently lost rows and factor=1 vs
    factor>1 disagreed on which ids exist (the ADVICE r12 finding)."""
    from ocr_vector_db_spark.operators.audio_fingerprint import resample_pcm

    df = _clips_df(spark, [("tiny", [100, -200, 300]), ("ok", range(10))])
    for f in (4, 7):
        got = {r.asset_id: bytes(r.data)
               for r in resample_pcm(df, f).collect()}
        assert set(got) == {"tiny", "ok"}, f
        assert got["tiny"] == b"", f
        assert len(got["ok"]) == (10 // f) * 2, f


def test_audio_keep_best(spark):
    """Quality-aware audio dedup: the re-encode family keeps the LONGEST
    copy (least-truncated master), singletons keep themselves."""
    from ocr_vector_db_spark.operators.audio_fingerprint import (
        audio_keep_best,
    )

    base = _synth("kb", 13000, seg_len=130)
    clips = [
        ("take_short", base[:13000 - 2600]),      # truncated re-encode
        ("take_full", base),
        ("take_loud", [v * 2 for v in base]),
        ("lone", _synth("kb-lone", 13000, seg_len=130)),
    ]
    got = {r.asset_id: (r.family, r.keep)
           for r in audio_keep_best(
               _clips_df(spark, clips), r=6).collect()}
    fam = got["take_full"][0]
    assert got["take_loud"][0] == fam
    # the full-length copy survives; the loud re-encode (same length,
    # higher id) and any truncated family member drop
    assert got["take_full"][1] is True
    assert got["take_loud"][1] is False
    assert got["lone"] == ("lone", True)


def test_quality_stats_sub_frame_grid_clips_exact(spark):
    """Regression (review repro): clips SHORTER than the 65-sample frame
    grid produce empty (chunk ∩ frame) cells; an unguarded
    sequence(a, b-1) is DESCENDING in Spark and re-folded every sample
    once per empty cell (32x inflation on a 2-sample clip). Stats must
    be exact for any clip length; silence is 0.0 below the grid."""
    from ocr_vector_db_spark.operators.audio_fingerprint import (
        audio_quality_stats,
    )

    clips = [
        ("two", [100, -50]),
        ("one", [32767]),
        ("sixtyfour", _synth("sg64", 64)),
        ("grid", _synth("sg65", 65)),
    ]
    got = {r.asset_id: r
           for r in audio_quality_stats(_clips_df(spark, clips)).collect()}
    for aid, s in clips:
        n = len(s)
        r = got[aid]
        assert r.mean_abs == sum(abs(v) for v in s) / n, aid
        assert r.dc_offset == sum(s) / n, aid
        assert r.peak_abs == max(abs(v) for v in s), aid
        assert r.clip_ratio == sum(1 for v in s if abs(v) >= 32767) / n
    assert got["two"].mean_abs == 75.0 and got["two"].dc_offset == 25.0
    assert got["two"].silence_ratio == 0.0
    assert got["one"].clip_ratio == 1.0
