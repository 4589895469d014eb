"""Audio-level near-duplicate detection and quality gates over raw PCM.

Raw PCM16 audio is "already samples" the way raw rasters are "already
pixels" (`operators/image_hash.py`), so the multimodal audio operators need
no decoder stub: frame-energy fingerprinting and quality statistics run as
REAL distributed Column math — `hex()` once per clip, then substring/conv
sample parsing inside whole-stage codegen, exact integer accumulation, no
Python in the row path.

A 100 TB crawled corpus carries the same recording re-encoded at different
gains and sample rates (the audio twin of re-scanned pages). The classic
screen is an energy fingerprint: split the clip into F time frames, compare
successive frame energies, and take the SIGN of each delta as one bit — the
audio analogue of dHash (relative comparisons, so the signature is invariant
to global gain). 65 frames → 64 bits → the SAME 16-hex-char signature space
as the image hashes, so the nibble pigeonhole banding
(`image_hash.phash_near_dup_pairs`), the Hamming verification and the
persisted incremental index (`SimHashIndex` via the `_sig_expr` hook, q127's
machinery) are reused VERBATIM.

Two invariances are EXACT, not approximate, because frame comparisons are
integer cross-multiplications (`s_i·c_j > s_j·c_i` in decimal — never a
float division):

- **gain**: scaling every sample by a positive integer g (no clipping)
  scales every frame sum by g; both sides of each comparison scale by g.
- **2× upsample** (each sample duplicated — the 16 kHz → 32 kHz resample a
  re-encode pipeline produces): the per-sample frame convention
  (sample x ∈ frame f iff floor(x·F/n) = f) maps duplicated pairs to the
  same frame, so frame sums and counts BOTH double exactly.

Scale shape of the fingerprint build (mirrors `image_grid_cells`, with
chunks standing in for scanlines — audio is 1-D, so "lines" are fixed
4096-sample windows rather than raster rows):

  1. one `hex()` projection per clip (map-side, O(bytes));
  2. chunk explode: ceil(n/4096) slim rows per clip, each carrying ONE
     chunk's hex via transform+posexplode (the full-clip string is never
     duplicated per row);
  3. per chunk row, ONE linear `split` pass cuts the chunk hex into a
     4-chars-per-sample ARRAY, so each sample read is an O(1)
     `element_at` + one `conv` + a bitwise byte swap. (Per-sample
     `substring` into the chunk string — the image path's idiom, fine on
     144-char scanlines — is O(offset) on UTF8String and goes QUADRATIC
     on 16K-char chunks: measured 29× slower at the q153 grain.);
  4. a chunk straddles at most a few frame boundaries: per chunk row,
     explode the ≤ (4096·F/n + 2) frames it intersects, each with an exact
     integer |sample| sum over the intersection range;
  5. ONE shuffle keyed (clip, frame) with map-side partial sums — ≤ F rows
     per clip reach the exchange; the sample grain never shuffles;
  6. per-clip assembly of the 16-hex-char signature (bounded collect of
     ≤ F frame rows).

Reference parity: the reference has no audio path at all (it ingests
PDF/text/markdown only — ingestion/parsers/); this module is part of the
training-data-pipeline extension brief (multimodal columns × dedup), like
q150's image near-dup. Compressed codecs (mp3/ogg/flac) need a real decoder
first — that is `multimodal.extract_features`'s pluggable decode seam; THIS
module is the post-decode math, which is where all the distributed cost
lives.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ocr_vector_db_spark.operators.image_hash import (
    _row_hex,
    hex_sig_to_bigint,
    phash_near_dup_pairs,
)
from ocr_vector_db_spark.operators.simhash_index import SimHashIndex

N_FRAMES = 65           # 65 frame energies → 64 delta-sign bits
CHUNK_SAMPLES = 4096    # samples per exploded work row (16 KiB raw)
CLIP_ABS = 32767        # |sample| at or above this counts as clipped


def asset_pcm_frames(assets: DataFrame, downmix: bool = False) -> DataFrame:
    """Project `multimodal.ASSET_SCHEMA` audio rows holding raw signed
    16-bit little-endian mono PCM (format=pcm_s16le, channels=1) to the
    (asset_id, data, n_samples, sample_rate) shape the audio operators
    consume. With `downmix=True`, multichannel pcm_s16le rows are
    averaged to mono (`downmix_pcm16`, per-asset Arrow-batched grain —
    a stereo re-encode then dedups perceptually against its mono twin)
    instead of dropped; the mono fast path stays pure-column either
    way. Compressed rows still need the decode seam first
    (`multimodal.extract_features`), exactly like jpeg rasters vs
    `asset_gray_frames`."""
    md = F.col("metadata")
    base = assets.filter(
        (F.col("kind") == "audio") & (md["format"] == "pcm_s16le")
    )
    mono = base.filter(md["channels"] == "1").select(
        "asset_id", "data",
        (F.length("data") / 2).cast("long").alias("n_samples"),
        md["sample_rate"].cast("int").alias("sample_rate"),
    )
    if not downmix:
        return mono
    multi = base.filter(
        md["channels"].cast("int") > 1
    ).select(
        "asset_id",
        downmix_pcm16("data", md["channels"].cast("int")).alias("data"),
        md["sample_rate"].cast("int").alias("sample_rate"),
    ).select(
        "asset_id", "data",
        (F.length("data") / 2).cast("long").alias("n_samples"),
        "sample_rate",
    )
    return mono.unionByName(multi)


def downmix_pcm16_bytes(raw: bytes, channels: int) -> bytes:
    """Average interleaved signed-16-LE multichannel PCM to mono: per
    frame, floor(sum(channels) / n_channels) — exact integer semantics,
    so an L==R stereo spread of a mono clip downmixes back
    BYTE-IDENTICAL. A ragged tail that is not a whole frame is dropped,
    like decode_wav."""
    import numpy as np

    frame = 2 * channels
    usable = len(raw) - (len(raw) % frame)
    if usable == 0:
        return b""
    s = np.frombuffer(raw[:usable], "<i2").astype(np.int32)
    mixed = s.reshape(-1, channels).sum(axis=1) // channels
    return mixed.astype("<i2").tobytes()


def downmix_pcm16(data_col, channels_col) -> Column:
    """`downmix_pcm16_bytes` as an Arrow-batched pandas UDF at the
    per-asset grain (the decode grain: one clip in, one clip out, zero
    cross-row state)."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _mix(data, ch):
        out = []
        for raw, c in zip(data, ch):
            if raw is None or c is None or int(c) < 1:
                out.append(None)
                continue
            out.append(downmix_pcm16_bytes(bytes(raw), int(c)))
        return pd.Series(out)

    # `from __future__ import annotations` stringifies hints, which
    # pandas_udf can't resolve — attach real annotation objects instead.
    _mix.__annotations__ = {"data": pd.Series, "ch": pd.Series,
                            "return": pd.Series}
    return pandas_udf("binary")(_mix)(data_col, channels_col)


def _sample_at(arr: Column, li: Column) -> Column:
    """SIGNED 16-bit value of local sample `li` (0-based) from the
    4-hex-chars-per-sample array: one O(1) element_at + one conv, then a
    bitwise byte swap (PCM16LE stores the LOW byte first, so the hex pair
    order is (lo, hi)) and the two's-complement fold."""
    u = F.conv(F.element_at(arr, (li + 1).cast("int")), 16, 10).cast("long")
    v = u.bitwiseAND(F.lit(255)) * 256 + F.shiftright(u, 8)
    return F.when(v >= 32768, v - 65536).otherwise(v)


def _pcm_chunks(
    df: DataFrame, id_col: str, data_col: str,
    chunk_samples: int = CHUNK_SAMPLES,
) -> DataFrame:
    """(id, n, s0, s1, arr): one row per `chunk_samples` window of each
    clip, carrying only that window's samples as a 4-hex-chars-per-sample
    array — the audio scanline explode, plus the one linear split that
    makes every later sample read O(1) (see the module docstring's step
    3). Malformed rows (odd byte length) are dropped like the image path
    drops dimension-mismatched buffers.

    The chunk cut itself slices the BINARY column (a direct-offset
    arraycopy, like video_hash's frame slice) and hexes each chunk row —
    NEVER `substring` into one whole-clip hex string: UTF8String
    substring walks from offset 0, so a transform over ceil(n/chunk)
    string cuts is O(n²/chunk) per clip (measured superlinear: 2M→4M
    samples took 17s→55s; an hour-long 16 kHz clip would take hours).
    Total cut+hex work here is O(n) per clip."""
    n = (F.length(data_col) / 2).cast("long")
    src = df.filter(
        (F.length(data_col) % 2 == 0) & (n > 0)
    ).select(
        F.col(id_col).alias("id"), n.alias("n"),
        F.col(data_col).alias("__bin"),
    )
    chunks = src.select(
        "id", "n",
        F.posexplode(
            F.transform(
                F.sequence(
                    F.lit(0), F.ceil(F.col("n") / chunk_samples).cast("int") - 1
                ),
                lambda j: F.hex(
                    F.col("__bin").substr(
                        j * (chunk_samples * 2) + 1,
                        F.lit(chunk_samples * 2),
                    )
                ),
            )
        ).alias("j", "chex"),
    )
    s0 = F.col("j").cast("long") * chunk_samples
    return chunks.select(
        "id", "n",
        F.split("chex", r"(?<=\G.{4})").alias("arr"),
        s0.alias("s0"),
        F.least(F.col("n"), s0 + chunk_samples).alias("s1"),
    )


def pcm_frame_cells(
    df: DataFrame,
    n_frames: int = N_FRAMES,
    id_col: str = "asset_id",
    data_col: str = "data",
) -> DataFrame:
    """Per-frame exact energy cells: one row per (id, f) with the frame's
    integer |sample| sum `s` and sample count `c`.

    Frame membership is PER SAMPLE — sample x ∈ frame f iff
    floor(x·F/n) = f, so frame f's range is [ceil(f·n/F), ceil((f+1)·n/F))
    (the image cell convention, which is what makes 2× sample duplication
    an exact invariance). A chunk intersects ≤ a handful of frames; each
    intersection is one exact integer aggregate over the chunk's hex.
    Clips shorter than F samples carry no frame structure and are filtered
    (screen them by exact byte hash, like sub-grid images)."""
    chunks = _pcm_chunks(df, id_col, data_col).filter(
        F.col("n") >= n_frames
    )
    nF = F.lit(n_frames)
    f0 = F.floor(F.col("s0") * nF / F.col("n"))
    f1 = F.floor((F.col("s1") - 1) * nF / F.col("n"))

    def frame_cell(f: Column) -> Column:
        a = F.greatest(F.col("s0"), F.ceil(f * F.col("n") / nF))
        b = F.least(F.col("s1"), F.ceil((f + 1) * F.col("n") / nF))
        s = F.aggregate(
            F.sequence(a, b - 1),
            F.lit(0).cast("long"),
            lambda x_acc, x: x_acc + F.abs(
                _sample_at(F.col("arr"), x - F.col("s0"))
            ),
        )
        return F.struct(f.alias("f"), s.alias("s"), (b - a).alias("c"))

    per_chunk = chunks.select(
        "id",
        F.explode(
            F.transform(F.sequence(f0, f1), frame_cell)
        ).alias("b"),
    )
    return (
        per_chunk.groupBy("id", F.col("b.f").alias("f"))
        .agg(F.sum("b.s").alias("s"), F.sum("b.c").alias("c"))
    )


def _gt_exact(si: Column, ci: Column, sj: Column, cj: Column) -> Column:
    """mean_i > mean_j decided EXACTLY: s_i·c_j > s_j·c_i in decimal(38,0)
    (cross-multiplication — no float division, so gain and upsample
    invariances are bit-exact, and a days-long clip can't overflow)."""
    d = "decimal(38,0)"
    return (si.cast(d) * cj.cast(d)) > (sj.cast(d) * ci.cast(d))


def audio_fingerprints(
    df: DataFrame,
    id_col: str = "asset_id",
    data_col: str = "data",
) -> DataFrame:
    """(id, afp) — 64-bit audio energy fingerprint as 16 lowercase hex
    chars, the same signature space as the image hashes.

    65 frame energies → bit i (MSB first) = frame i strictly louder than
    frame i+1, decided by exact integer cross-multiplication. Relative
    comparisons make the signature invariant to global gain; the
    per-sample frame convention makes it invariant to exact 2× sample
    duplication (see module docstring)."""
    cells = pcm_frame_cells(df, N_FRAMES, id_col=id_col, data_col=data_col)
    rows = (
        cells.groupBy("id")
        .agg(F.array_sort(F.collect_list(F.struct("f", "s", "c"))).alias("m"))
        .select(
            "id",
            F.transform(
                F.sequence(F.lit(0), F.lit(N_FRAMES - 2)),
                lambda i: _gt_exact(
                    F.element_at("m", i + 1)["s"],
                    F.element_at("m", i + 1)["c"],
                    F.element_at("m", i + 2)["s"],
                    F.element_at("m", i + 2)["c"],
                ),
            ).alias("bits"),
        )
    )
    return rows.select(
        "id",
        F.concat_ws(
            "",
            F.transform(
                F.sequence(F.lit(0), F.lit(7)),
                lambda r: _row_hex(F.slice("bits", r * 8 + 1, 8)),
            ),
        ).alias("afp"),
    )


def audio_near_dup_pairs(
    sigs: DataFrame, r: int = 6, id_col: str = "id"
) -> DataFrame:
    """Pairs (id_a < id_b, hamming ≤ r) over audio fingerprints — the
    image path's nibble pigeonhole banding + exact XOR verification,
    UNCHANGED (banded ≡ brute force; same 64-bit hex space)."""
    return phash_near_dup_pairs(sigs, r=r, id_col=id_col, sig_col="afp")


class AudioFpIndex(SimHashIndex):
    """Persisted audio near-dup index: energy fingerprints in
    SimHashIndex's banded Hamming layout — build/add/screen/dedup_new/
    compact, generation pointers, bucket-partitioned bands and the exact
    bit_count verification all inherited via the `_sig_expr` hook, the
    same single-seam subclassing as `image_hash.PhashIndex`. Input rows
    are PCM clips (id, data, ...) — `asset_pcm_frames` output."""

    def _sig_expr(self, docs: DataFrame, id_col: str,
                  text_col: str) -> DataFrame:
        if self.bits != 64:
            raise ValueError("AudioFpIndex is 64-bit (energy fingerprint)")
        sigs = audio_fingerprints(docs, id_col=id_col)
        return sigs.select(
            F.col("id").alias("doc"),
            hex_sig_to_bigint(F.col("afp")).alias("simhash"),
        )

    @classmethod
    def build(  # noqa: D417 - narrowed signature over the text parent
        cls, spark, clips: DataFrame, path: str, r: int = 6,
        n_buckets: int = 64, id_col: str = "asset_id",
    ) -> "AudioFpIndex":
        return super().build(
            spark, clips, path, bits=64, r=r, n_buckets=n_buckets,
            id_col=id_col, text_col="data",
        )


def audio_quality_stats(
    df: DataFrame,
    id_col: str = "asset_id",
    data_col: str = "data",
    rate_col: str = "sample_rate",
    silence_frame_abs: int = 100,
) -> DataFrame:
    """Per-clip audio quality gates for a training-data pipeline, in one
    pass over the chunk rows (exact integer partials, one frame-grain
    pass for the silence ratio):

    - duration_s       n / sample_rate
    - mean_abs         mean |sample| (overall loudness; exact int sum)
    - rms              sqrt(Σ sample² / n) (sum of squares is exact —
                       fits bigint to ~2^33 samples ≈ 74 h at 32 kHz)
    - peak_abs         max |sample|
    - clip_ratio       fraction of samples at |s| ≥ 32767 (clipping —
                       distorted / over-amplified sources)
    - dc_offset        mean SIGNED sample (a broken recorder bias)
    - silence_ratio    fraction of the 65 energy frames whose mean |s|
                       < silence_frame_abs (dead air / truncated takes;
                       0.0 for clips below the 65-sample frame grid,
                       which carry no frame structure)

    ONE pass over the samples: the chunk rows fold per (chunk ∩ frame)
    intersection into quality structs (Σ|s|, Σs², max, clipped count,
    Σs — all exact bigint), one exchange per clip keyed (clip, frame) at
    ≤ 65 rows, and BOTH the clip-level sums and the silence ratio reduce
    from those same frame cells — the corpus is never hex-scanned twice.
    (Only the slim (id, rate) projection touches the source again.)"""
    chunks = _pcm_chunks(df, id_col, data_col)
    nF = F.lit(N_FRAMES)
    f0 = F.floor(F.col("s0") * nF / F.col("n"))
    f1 = F.floor((F.col("s1") - 1) * nF / F.col("n"))

    def frame_cell(f: Column) -> Column:
        a = F.greatest(F.col("s0"), F.ceil(f * F.col("n") / nF))
        b = F.least(F.col("s1"), F.ceil((f + 1) * F.col("n") / nF))
        zero = F.struct(
            F.lit(0).cast("long").alias("sa"),
            F.lit(0).cast("long").alias("sq"),
            F.lit(0).cast("long").alias("pk"),
            F.lit(0).cast("long").alias("cl"),
            F.lit(0).cast("long").alias("dc"),
        )

        def step(acc: Column, x: Column) -> Column:
            s = _sample_at(F.col("arr"), x - F.col("s0"))
            a_ = F.abs(s)
            return F.struct(
                (acc["sa"] + a_).alias("sa"),
                (acc["sq"] + s * s).alias("sq"),
                F.greatest(acc["pk"], a_).alias("pk"),
                (acc["cl"] + (a_ >= CLIP_ABS).cast("long")).alias("cl"),
                (acc["dc"] + s).alias("dc"),
            )

        # a sub-frame-grid clip (n < 65) leaves some frames EMPTY in a
        # chunk: F.sequence(a, b-1) with b <= a is a DESCENDING sequence
        # in Spark, which would re-fold samples once per empty frame —
        # guard the fold to zero (caught by an empirical review repro:
        # a 2-sample clip inflated every stat 32×)
        p = F.when(
            b > a, F.aggregate(F.sequence(a, b - 1), zero, step)
        ).otherwise(zero)
        return F.struct(
            f.alias("f"), p.alias("p"),
            F.greatest(F.lit(0).cast("long"), b - a).alias("c"),
        )

    per_chunk = chunks.select(
        "id", "n",
        F.explode(F.transform(F.sequence(f0, f1), frame_cell)).alias("b"),
    )
    cells = (
        per_chunk.groupBy("id", F.col("b.f").alias("f"))
        .agg(
            F.first("n").alias("n"),
            F.sum("b.p.sa").alias("sa"), F.sum("b.p.sq").alias("sq"),
            F.max("b.p.pk").alias("pk"), F.sum("b.p.cl").alias("cl"),
            F.sum("b.p.dc").alias("dc"), F.sum("b.c").alias("c"),
        )
    )
    per_clip = (
        cells.groupBy("id")
        .agg(
            F.first("n").alias("n"),
            F.sum("sa").alias("sa"), F.sum("sq").alias("sq"),
            F.max("pk").alias("pk"), F.sum("cl").alias("cl"),
            F.sum("dc").alias("dc"),
            F.when(
                F.first("n") >= N_FRAMES,
                F.sum((F.col("sa") < F.col("c") * silence_frame_abs)
                      .cast("int")) / F.count("*"),
            ).otherwise(F.lit(0.0)).alias("silence_ratio"),
        )
    )
    rates = df.select(
        F.col(id_col).alias("id"), F.col(rate_col).alias("rate")
    )
    return (
        per_clip.join(rates, "id")
        .select(
            F.col("id").alias(id_col),
            (F.col("n") / F.col("rate")).alias("duration_s"),
            (F.col("sa") / F.col("n")).alias("mean_abs"),
            F.sqrt(F.col("sq") / F.col("n")).alias("rms"),
            F.col("pk").cast("int").alias("peak_abs"),
            (F.col("cl") / F.col("n")).alias("clip_ratio"),
            (F.col("dc") / F.col("n")).alias("dc_offset"),
            "silence_ratio",
        )
    )


def resample_pcm(
    df: DataFrame,
    factor: int,
    id_col: str = "asset_id",
    data_col: str = "data",
) -> DataFrame:
    """REAL distributed sample-rate reduction — the audio twin of
    `image_hash.resize_raster` (image resize ↔ audio resample ↔ video
    frame-sample): decimate raw PCM16 by an integer `factor` via exact
    box averages — output sample o = round-half-up(mean of input samples
    [o·f, (o+1)·f)), the standard anti-aliased integer decimation for
    already-bandlimited material (a trailing remainder of n % f samples
    truncates, matching every fixed-ratio resampler). (id, data) → the
    same shape at n/f samples; callers halve/third their `sample_rate`
    metadata alongside. A clip with n < factor decimates to ZERO samples
    but still emits its row (empty `data` bytes) — every well-formed
    input id appears in the output at every factor, so id joins never
    silently lose rows (only odd-byte-length/empty inputs drop, same as
    factor=1).

    All math is exact integers — the sum is exact, and the one rounding
    per OUTPUT sample is floor((2·sum + f) / (2·f)) (half-up toward +∞,
    branchless, no float) — so results are bit-deterministic under any
    partitioning, and resampling an exact 2× upsample by 2 returns the
    ORIGINAL BYTES (pinned by tests).

    Scale shape: entirely MAP-SIDE until one output-bounded exchange —
    chunk rows are cut at a factor-aligned size (the largest multiple of
    `factor` ≤ CHUNK_SAMPLES) so no output sample ever straddles chunks;
    each chunk row emits its own decimated hex (O(chunk) work, O(chunk/f)
    output); the single exchange is the per-clip assembly collect of
    ≤ n/(f·chunk) chunk-output rows — output-sized, never input-sized."""
    if not 1 <= factor <= CHUNK_SAMPLES:
        raise ValueError(f"factor must be in [1, {CHUNK_SAMPLES}]")
    if factor == 1:
        # same output contract as every other factor: the column is named
        # `data` and malformed (odd-byte-length / empty) rows drop
        return df.filter(
            (F.length(data_col) % 2 == 0) & (F.length(data_col) > 0)
        ).select(F.col(id_col).alias(id_col), F.col(data_col).alias("data"))
    eff = CHUNK_SAMPLES - (CHUNK_SAMPLES % factor)
    chunks = _pcm_chunks(df, id_col, data_col, chunk_samples=eff)

    def out_hex(g: Column) -> Column:
        s = F.aggregate(
            F.sequence(g * factor, (g + 1) * factor - 1),
            F.lit(0).cast("long"),
            lambda acc, i: acc + _sample_at(F.col("arr"), i),
        )
        v = F.floor((2 * s + factor) / F.lit(2 * factor)).cast("long")
        u = v.bitwiseAND(F.lit(0xFFFF))
        byte = [u.bitwiseAND(F.lit(255)), F.shiftright(u, 8)]
        return F.concat(*[
            F.lpad(F.lower(F.conv(b.cast("string"), 10, 16)), 2, "0")
            for b in byte
        ])

    n_groups = F.floor((F.col("s1") - F.col("s0")) / factor).cast("int")
    # a chunk shorter than `factor` (the trailing remainder, or a whole
    # clip with n < factor) emits an EMPTY hex rather than being filtered
    # out: filtering would drop sub-factor clips entirely (no output
    # row), while factor=1 keeps them — callers joining back on id would
    # silently lose rows. Such clips decimate to zero samples: one row,
    # empty `data` bytes. (The when-guard also keeps the descending
    # F.sequence(0, -1) of an empty group range from ever evaluating.)
    per_chunk = chunks.select(
        "id", "s0",
        F.when(
            n_groups > 0,
            F.concat_ws(
                "",
                F.transform(F.sequence(F.lit(0), n_groups - 1), out_hex),
            ),
        ).otherwise(F.lit("")).alias("ohex"),
    )
    return (
        per_chunk.groupBy("id")
        .agg(
            F.unhex(
                F.concat_ws(
                    "",
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("s0", "ohex"))),
                        lambda s: s["ohex"],
                    ),
                )
            ).alias("data")
        )
        .select(F.col("id").alias(id_col), "data")
    )


def audio_keep_best(
    clips: DataFrame,
    r: int = 6,
    id_col: str = "asset_id",
) -> DataFrame:
    """Quality-aware audio dedup — `image_hash.image_keep_best`'s audio
    twin: fingerprint near-dup pairs → transitive closure
    (`dedup.connected_components`) → per family keep the LONGEST copy
    (max sample count: a re-encode chain keeps the least-truncated
    master; min id on ties). Returns (id, family, n_samples, keep) for
    every input clip (singletons are their own family).

    Scale shape: the signature build + banded pair search (q153's
    shapes), the min-label closure over the PAIR graph only, one
    window-free keep selection via two slim family-keyed aggregates."""
    from ocr_vector_db_spark.operators.dedup import keep_best_by_quality

    sigs = audio_fingerprints(clips, id_col=id_col)
    pairs = audio_near_dup_pairs(sigs, r=r)
    items = clips.select(
        F.col(id_col),
        (F.length("data") / 2).cast("long").alias("n_samples"),
    )
    return keep_best_by_quality(items, pairs, "n_samples", id_col=id_col)
