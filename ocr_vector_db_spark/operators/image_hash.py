"""Image-level near-duplicate detection: perceptual hashes over raw pixels.

A 100 TB scanned corpus is full of re-scanned / re-encoded / rescaled copies
of the same page that are INVISIBLE to text dedup (the OCR text differs, the
bytes differ, the pixels don't — much). The classic screen is a perceptual
hash: downsample the image to a tiny grid, derive a 64-bit signature from
brightness structure, and call two images near-dups when the signatures are
within a small Hamming distance.

Reference parity: the reference decodes page rasters (PyMuPDF,
ingestion/parsers/pymupdf_parser.py:518-569) but never dedups them; this is
the "dedup × multimodal columns" combination the pipeline brief implies.
Inputs are the repo's own raster rows — `sources/pdf_decode.extract_pdf_images`
/ `sources/multimodal.ASSET_SCHEMA` (binary `data` + width/height metadata).

Two hashes, both over the same grid downsample:

- dHash (difference hash, 9×8 grid): bit = cell brighter than its right
  neighbour. Robust to rescaling and global brightness/contrast shifts
  (comparisons are relative), the workhorse screen.
- aHash (average hash, 8×8 grid): bit = cell brighter than the global mean.

Everything is built-in Column expressions — `hex()` once per image, then
substring/conv byte math inside whole-stage codegen; no Python in the row
path. Scale shape of the signature build:

  1. one `hex()` projection per image (map-side, O(bytes));
  2. scanline explode: H slim rows per image, each carrying ONE scanline's
     hex (via transform+posexplode, so the full-image string is never
     duplicated per row);
  3. per-scanline per-cell integer sums (map-side F.aggregate over the
     cell's x-range — exact integer math, no float accumulation order);
  4. ONE shuffle keyed (asset, cell_y, cell_x) with map-side partial sums,
     groups of ≤ grid_w × grid_h × images rows — the heavy pixel grain
     never shuffles;
  5. per-asset assembly of the 16-hex-char signature (bounded collects of
     ≤ grid rows per asset).

Signatures are fixed-length LOWERCASE HEX STRINGS (16 chars = 64 bits): the
engine-portable representation (hex→int64 conversion differs across engines;
hex strings compare/band identically everywhere). Hamming verification
splits the signature into two 32-bit halves so bit_count stays inside
signed-bigint range.

Near-dup pairs reuse the SimHash pigeonhole discipline
(`dedup.simhash_band_widths` / `simhash_near_dup_pairs`, q88) at NIBBLE
granularity: the 16 nibbles split into r+1 contiguous bands — two signatures
within Hamming distance r differ in ≤ r nibbles, so they MUST agree exactly
on ≥ 1 band. Candidates come from an equi-join on (band, band_value); each
candidate is verified exactly with bit_count(a XOR b) ≤ r, so the result is
exact (banded ≡ brute force — pinned by tests/test_image_hash.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ocr_vector_db_spark.operators.dedup import simhash_band_widths
from ocr_vector_db_spark.operators.simhash_index import SimHashIndex

_SIG_NIBBLES = 16  # 64-bit signatures, 16 hex chars


def _byte_at(line: Column, idx: Column) -> Column:
    """Integer value of byte `idx` (0-based) of a hex-encoded string."""
    return F.conv(F.substring(line, idx * 2 + 1, F.lit(2)), 16, 10).cast("long")


def image_grid_cells(
    df: DataFrame,
    grid_w: int,
    grid_h: int,
    id_col: str = "asset_id",
    data_col: str = "data",
    width_col: str = "width",
    height_col: str = "height",
    channels: int = 1,
    per_channel: bool = False,
) -> DataFrame:
    """Box-average downsample of raw images to a grid_w × grid_h grid:
    one row per (id, cy, cx) with the cell's mean brightness — or, with
    `per_channel=True`, one row per (id, cy, cx, ch) with the cell's
    mean of THAT band (the channel-preserving resize path; the default
    merges bands into integer luma, which is what the hashes want).

    `data` is a raw row-major pixel buffer (width × height × channels
    bytes). Images smaller than the grid carry no full cell structure
    and are filtered out (screen them by exact byte hash instead). Cell
    sums are exact integers; the single division per cell is the only
    float op, so the means are bit-deterministic regardless of
    partitioning."""
    w, h = F.col(width_col), F.col(height_col)
    stride = channels * 2  # hex chars per pixel
    src = df.filter(
        (w >= grid_w) & (h >= grid_h)
        & (F.length(data_col) == w * h * channels)
    ).select(
        F.col(id_col).alias("id"), w.alias("__w"),
        F.hex(F.col(data_col)).alias("__hex"), h.alias("__h"),
    )
    # H slim rows per image; transform-then-posexplode hands each row ONE
    # scanline's hex instead of duplicating the whole-image string
    lines = src.select(
        "id", F.col("__w").alias("w"),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.col("__h") - 1),
                lambda y: F.substring(
                    F.col("__hex"),
                    y * F.col("__w") * stride + 1,
                    F.col("__w") * stride,
                ),
            )
        ).alias("y", "line"),
        F.col("__h").alias("h"),
    )
    cy = F.floor(F.col("y") * grid_h / F.col("h")).cast("int")

    def xr(gx: int):
        # pixel x belongs to cell gx iff floor(x*grid_w/w) == gx, so the
        # cell's x-range is [ceil(gx*w/grid_w), ceil((gx+1)*w/grid_w))
        # (ceil, NOT floor — they differ when w % grid_w != 0, and the
        # per-pixel convention is what the scanline cy uses too)
        x0 = F.ceil(F.lit(gx) * F.col("w") / grid_w).cast("int")
        x1 = F.ceil(F.lit(gx + 1) * F.col("w") / grid_w).cast("int")
        return x0, x1

    def cell(gx: int) -> Column:
        x0, x1 = xr(gx)
        s = F.aggregate(
            F.sequence(x0, x1 - 1),
            F.lit(0).cast("long"),
            lambda acc, x: acc + sum(
                _byte_at(F.col("line"), x * channels + c)
                for c in range(channels)
            ),
        )
        return F.struct(
            F.lit(gx).alias("cx"), F.lit(0).alias("ch"), s.alias("s"),
            ((x1 - x0) * channels).cast("long").alias("c"),
        )

    def band_cell(gx: int, c: int) -> Column:
        x0, x1 = xr(gx)
        s = F.aggregate(
            F.sequence(x0, x1 - 1),
            F.lit(0).cast("long"),
            lambda acc, x: acc + _byte_at(F.col("line"), x * channels + c),
        )
        return F.struct(
            F.lit(gx).alias("cx"), F.lit(c).alias("ch"), s.alias("s"),
            (x1 - x0).cast("long").alias("c"),
        )

    structs = (
        [band_cell(gx, c) for gx in range(grid_w) for c in range(channels)]
        if per_channel else [cell(gx) for gx in range(grid_w)]
    )
    per_line = lines.select(
        "id", cy.alias("cy"),
        F.explode(F.array(*structs)).alias("b"),
    )
    keys = ["id", "cy", F.col("b.cx").alias("cx")] + (
        [F.col("b.ch").alias("ch")] if per_channel else []
    )
    out_cols = ["id", "cy", "cx"] + (["ch"] if per_channel else [])
    return (
        per_line.groupBy(*keys)
        .agg(F.sum("b.s").alias("s"), F.sum("b.c").alias("c"))
        .select(
            *out_cols,
            (F.col("s") / F.col("c")).alias("mean"),
        )
    )


def _row_hex(bits: Column) -> Column:
    """8-element int array of bits (MSB first) → 2 lowercase hex chars."""
    val = F.aggregate(
        bits, F.lit(0), lambda acc, b: acc * 2 + b.cast("int")
    )
    return F.lpad(F.lower(F.conv(val.cast("string"), 10, 16)), 2, "0")


def _assemble(rows: DataFrame, out_col: str) -> DataFrame:
    """(id, cy, row_hex) → (id, 16-char signature) — bounded collect of
    ≤ grid_h struct rows per asset."""
    return rows.groupBy("id").agg(
        F.concat_ws(
            "",
            F.transform(
                F.array_sort(F.collect_list(F.struct("cy", "hx"))),
                lambda s: s["hx"],
            ),
        ).alias(out_col)
    )


def dhash_signatures(df: DataFrame, **cols) -> DataFrame:
    """(id, dhash) — 64-bit difference hash as 16 lowercase hex chars.

    9×8 grid; bit (cy, gx) = cell (cy, gx) strictly brighter than its
    right neighbour (cy, gx+1): 8 bits per row (MSB = gx 0), row cy 0 is
    the most significant byte. Relative comparisons make the signature
    invariant to exact rescaling and global brightness shifts."""
    cells = image_grid_cells(df, 9, 8, **cols)
    rows = (
        cells.groupBy("id", "cy")
        .agg(F.array_sort(F.collect_list(F.struct("cx", "mean"))).alias("m"))
        .select(
            "id", "cy",
            _row_hex(
                F.transform(
                    F.sequence(F.lit(0), F.lit(7)),
                    lambda i: (
                        F.element_at("m", i + 1)["mean"]
                        > F.element_at("m", i + 2)["mean"]
                    ),
                )
            ).alias("hx"),
        )
    )
    return _assemble(rows, "dhash")


def ahash_signatures(df: DataFrame, **cols) -> DataFrame:
    """(id, ahash) — 64-bit average hash as 16 lowercase hex chars.

    8×8 grid; bit = cell strictly brighter than the image's global mean
    (the mean of cell means — the grid is an exact partition of the
    pixels only when dims divide evenly, but the hash just needs a
    deterministic reference level)."""
    cells = image_grid_cells(df, 8, 8, **cols)
    glob = cells.groupBy("id").agg(F.avg("mean").alias("gmean"))
    rows = (
        cells.join(glob, "id")
        .groupBy("id", "cy")
        .agg(
            F.array_sort(F.collect_list(F.struct("cx", "mean"))).alias("m"),
            F.first("gmean").alias("gmean"),
        )
        .select(
            "id", "cy",
            _row_hex(
                F.transform(
                    F.sequence(F.lit(0), F.lit(7)),
                    lambda i: F.element_at("m", i + 1)["mean"]
                    > F.col("gmean"),
                )
            ).alias("hx"),
        )
    )
    return _assemble(rows, "ahash")


def hamming_hex(a: Column, b: Column) -> Column:
    """Exact Hamming distance between two 16-hex-char signatures: XOR of
    the 32-bit halves (each fits signed bigint) + bit_count."""
    def half(col: Column, start: int) -> Column:
        return F.conv(F.substring(col, start, 8), 16, 10).cast("bigint")

    return (
        F.bit_count(half(a, 1).bitwiseXOR(half(b, 1)))
        + F.bit_count(half(a, 9).bitwiseXOR(half(b, 9)))
    ).cast("int")


def phash_near_dup_pairs(
    sigs: DataFrame,
    r: int = 6,
    id_col: str = "id",
    sig_col: str = "dhash",
    align_col: str | None = None,
) -> DataFrame:
    """Pairs (id_a < id_b, hamming ≤ r) over 64-bit hex signatures.

    Pigeonhole banding at nibble granularity: the 16 hex chars split into
    r+1 contiguous bands (`simhash_band_widths(16, r)` — the same
    remainder-spreading split as the text SimHash path); ≤ r differing
    bits touch ≤ r nibbles, hence ≤ r bands, hence ≥ 1 band matches
    exactly. Candidates are DISTINCT (id, id) pairs from the band
    equi-join; each verifies with the exact XOR bit_count, so the output
    equals the brute-force cross-join (tests pin banded ≡ brute).

    With `align_col` (the video path), the alignment value joins INTO
    every key — band candidates, distinct, and the verify re-attach —
    so only rows sharing it ever meet, and the output carries it:
    (id_a, id_b, align_col, hamming). One banding implementation serves
    images, audio and aligned video frames.

    Scale shape: r+1 slim rows per signature, one shuffle on the band
    value (substring — selective: 64/(r+1) bits each), candidate pairs
    distinct BEFORE the signatures re-attach by id join. Requires r ≤ 15
    (one band per nibble at most)."""
    if not 0 <= r < _SIG_NIBBLES:
        raise ValueError(f"r must be in [0, {_SIG_NIBBLES - 1}]")
    al = [align_col] if align_col else []
    sig = sigs.select(
        F.col(id_col).alias("id"), *al, F.col(sig_col).alias("sig")
    )
    band_structs = [
        F.struct(
            F.lit(j).alias("band"),
            F.substring("sig", lo + 1, w).alias("val"),
        )
        for j, (lo, w) in enumerate(simhash_band_widths(_SIG_NIBBLES, r))
    ]
    bands = sig.select(
        "id", *al, F.explode(F.array(*band_structs)).alias("b")
    ).select("id", *al, F.col("b.band").alias("band"),
             F.col("b.val").alias("val"))
    a, b = bands.alias("a"), bands.alias("b")
    align_eq = (
        (F.col(f"a.{align_col}") == F.col(f"b.{align_col}"))
        if align_col else F.lit(True)
    )
    cand = (
        a.join(
            b,
            align_eq
            & (F.col("a.band") == F.col("b.band"))
            & (F.col("a.val") == F.col("b.val"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"),
            *[F.col(f"a.{c}").alias(c) for c in al],
        )
        .distinct()
    )
    sig_a = sig.select(F.col("id").alias("id_a"), *al,
                       F.col("sig").alias("sig_a"))
    sig_b = sig.select(F.col("id").alias("id_b"), *al,
                       F.col("sig").alias("sig_b"))
    return (
        cand.join(sig_a, ["id_a"] + al)
        .join(sig_b, ["id_b"] + al)
        .withColumn("hamming", hamming_hex(F.col("sig_a"), F.col("sig_b")))
        .filter(F.col("hamming") <= r)
        .select("id_a", "id_b", *al, "hamming")
    )


def hex_sig_to_bigint(sig: Column) -> Column:
    """16-hex-char signature → the signed-64-bit bigint with the same bit
    pattern. conv() of the FULL 16 chars overflows bigint when bit 63 is
    set (unsigned decimal string > 2^63-1), so build from two 32-bit
    halves: shiftleft is a bitwise op (Java <<), which wraps into the
    sign bit instead of erroring."""
    hi = F.conv(F.substring(sig, 1, 8), 16, 10).cast("bigint")
    lo = F.conv(F.substring(sig, 9, 8), 16, 10).cast("bigint")
    return F.shiftleft(hi, 32).bitwiseOR(lo)


class PhashIndex(SimHashIndex):
    """Persisted image near-dup index: dHash signatures in SimHashIndex's
    banded Hamming layout (q127's build/add/screen/dedup_new/compact
    machinery UNCHANGED — generation pointers, bucket-partitioned bands,
    re-add guard, exact bit_count verification). Input rows are raster
    frames (id, data, width, height) — `asset_gray_frames` output;
    `text_col` is meaningless for images and ignored.

    Implemented as the `_sig_expr` subclass hook: only the signature
    function differs, so the incremental-ingestion discipline the text
    screen certifies (append ordering, crash-window adjudication,
    compaction, bucket pruning) carries over verbatim. Always 64-bit
    (dHash's size); pick r like the one-shot `phash_near_dup_pairs`."""

    def _sig_expr(self, docs: DataFrame, id_col: str,
                  text_col: str) -> DataFrame:
        if self.bits != 64:
            raise ValueError("PhashIndex is 64-bit (dHash)")
        # frames carrying a `channels` column (asset_raw_frames — mixed
        # gray/RGB corpora) hash through the channel-split union; bare
        # gray frames through the single plan
        sigs = dhash_signatures_mixed(docs, id_col=id_col)
        return sigs.select(
            F.col("id").alias("doc"),
            hex_sig_to_bigint(F.col("dhash")).alias("simhash"),
        )

    @classmethod
    def build(  # noqa: D417 - narrowed signature over the text parent
        cls, spark, frames: DataFrame, path: str, r: int = 4,
        n_buckets: int = 64, id_col: str = "asset_id",
    ) -> "PhashIndex":
        return super().build(
            spark, frames, path, bits=64, r=r, n_buckets=n_buckets,
            id_col=id_col, text_col="data",
        )


def image_keep_best(
    frames: DataFrame,
    r: int = 4,
    id_col: str = "asset_id",
) -> DataFrame:
    """Quality-aware image dedup — the raster twin of the text keep-best
    pass (q64): dHash near-dup pairs → transitive closure
    (`dedup.connected_components`, the same production discipline as
    MinHash-LSH → closure) → per family keep the HIGHEST-RESOLUTION copy
    (max width×height, min id on ties — a re-scan corpus keeps the best
    master, not an arbitrary one). Returns (id, family, pixels, keep):
    every input frame labeled with its near-dup family (singletons are
    their own), `keep` marking the survivor.

    Scale shape: the signature build + banded pair search (q150's
    shapes), the min-label closure over the PAIR graph only (near-dup
    families are shallow), one window-free keep selection via a per-family
    max-struct aggregate + equi-join."""
    from ocr_vector_db_spark.operators.dedup import keep_best_by_quality

    sigs = dhash_signatures_mixed(frames, id_col=id_col)
    pairs = phash_near_dup_pairs(sigs, r=r)
    items = frames.select(
        F.col(id_col),
        (F.col("width").cast("long")
         * F.col("height").cast("long")).alias("pixels"),
    )
    return keep_best_by_quality(items, pairs, "pixels", id_col=id_col)


def asset_gray_frames(assets: DataFrame) -> DataFrame:
    """Project `multimodal.ASSET_SCHEMA` raster rows (format=raw) to the
    (asset_id, data, width, height) shape the hashers consume. Gray
    (channels=1) passes through; use `asset_raw_frames` +
    `dhash_signatures_mixed` for corpora that also carry RGB rasters.
    JPEG/JPX-format rows need a real decoder first
    (`multimodal.extract_features`'s decode seam)."""
    md = F.col("metadata")
    return assets.filter(
        (F.col("kind") == "image")
        & (md["format"] == "raw")
        & (md["channels"] == "1")
    ).select(
        "asset_id", "data",
        md["width"].cast("int").alias("width"),
        md["height"].cast("int").alias("height"),
    )


def asset_raw_frames(assets: DataFrame) -> DataFrame:
    """All raw rasters — gray AND RGB — as (asset_id, data, width,
    height, channels). `decode_image_xobject` emits channels 3 for color
    scans; `dhash_signatures_mixed` hashes both kinds into the same
    64-bit space (RGB through integer luma), so a gray re-scan of a
    color page still clusters with it."""
    md = F.col("metadata")
    return assets.filter(
        (F.col("kind") == "image")
        & (md["format"] == "raw")
        & (md["channels"].isin("1", "3"))
    ).select(
        "asset_id", "data",
        md["width"].cast("int").alias("width"),
        md["height"].cast("int").alias("height"),
        md["channels"].cast("int").alias("channels"),
    )


def dhash_signatures_mixed(df: DataFrame, id_col: str = "asset_id",
                           **cols) -> DataFrame:
    """(id, dhash) over frames whose `channels` COLUMN is 1 or 3: the
    byte-offset math needs a per-plan channel constant, so the relation
    splits by channels value and unions the two signature plans — same
    hash space either way (cell means; RGB averages the bands, exact
    integer luma), so gray and color copies of one page pair up."""
    if "channels" not in df.columns:
        return dhash_signatures(df, id_col=id_col, **cols)
    parts = [
        dhash_signatures(
            df.filter(F.col("channels") == c).drop("channels"),
            id_col=id_col, channels=c, **cols,
        )
        for c in (1, 3)
    ]
    return parts[0].unionByName(parts[1])


def resize_raster(
    df: DataFrame,
    out_w: int,
    out_h: int,
    id_col: str = "asset_id",
    channels: int = 1,
) -> DataFrame:
    """REAL distributed raster resize — the multimodal 'resize' operator
    as exact box-average downsampling, entirely JVM-side (no decode stub:
    raw buffers are already pixels). (id, data, width, height) → the same
    shape at out_w × out_h, one gray byte per pixel (channels > 1 inputs
    resize through integer luma, like the hashers).

    Output pixel (cy, cx) = round-half-up(mean of its exact source box)
    — the same per-pixel cell convention as `image_grid_cells` (the hash
    grids ARE this resize at 9×8 / 8×8, minus the final byte rounding:
    the hashers compare unrounded means, so a hash of a resized raster
    can differ from the direct hash only on sub-1-gray-level ties).
    Cell sums are exact integers; the one division + round per OUTPUT
    pixel is the only float op, so results are bit-deterministic under
    any partitioning.

    Scale shape: the pixel grain never shuffles (scanline transform +
    posexplode, map-side partial sums); the one exchange is keyed
    (id, cy, cx) at ≤ out_w·out_h rows per image, and the byte-assembly
    aggregations collect ≤ out_w cells per row / ≤ out_h rows per image
    — output-bounded, never input-bounded. Upscaling past the source
    grid is out of scope (cells would be empty); inputs smaller than
    out_w × out_h are filtered like the hashers filter sub-grid frames.

    Reference parity: the reference delegates all raster work to PyMuPDF
    (ingestion/parsers/pymupdf_parser.py:518-569); this is the scale
    path for thumbnailing / model-input normalization at 100 TB."""
    cells = image_grid_cells(
        df, out_w, out_h, id_col=id_col, channels=channels
    )
    px_hex = F.lpad(
        F.lower(
            F.conv(F.round(F.col("mean"), 0).cast("int").cast("string"),
                   10, 16)
        ),
        2, "0",
    )
    rows = (
        cells.groupBy("id", "cy")
        .agg(
            F.concat_ws(
                "",
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("cx", px_hex.alias("hx")))
                    ),
                    lambda s: s["hx"],
                ),
            ).alias("row_hex")
        )
    )
    return (
        rows.groupBy("id")
        .agg(
            F.unhex(
                F.concat_ws(
                    "",
                    F.transform(
                        F.array_sort(
                            F.collect_list(F.struct("cy", "row_hex"))
                        ),
                        lambda s: s["row_hex"],
                    ),
                )
            ).alias("data")
        )
        .select(
            F.col("id").alias(id_col), "data",
            F.lit(out_w).alias("width"), F.lit(out_h).alias("height"),
        )
    )


def resize_raster_rgb(
    df: DataFrame,
    out_w: int,
    out_h: int,
    id_col: str = "asset_id",
    channels: int = 3,
) -> DataFrame:
    """Channel-PRESERVING exact box-average resize — `resize_raster`'s
    color twin for model-input normalization (luma is right for the
    hashes; a training pipeline's thumbnailer must keep the bands).
    (id, data, width, height) row-major interleaved buffers → the same
    shape at out_w × out_h × channels, each output byte the
    round-half-up mean of ITS channel's exact source box.

    The cell math IS `image_grid_cells(per_channel=True)` — one shared
    implementation of the scanline/ceil-boundary convention, so the
    bands can never drift from the hashes and the gray resize. Same
    scale shape as `resize_raster` (scanline explode, map-side exact
    integer partial sums, one output-bounded exchange — keyed
    (id, cy, cx, ch) at ≤ out_w·out_h·channels rows per image), and the
    interleaved byte order falls out of the lexicographic (cx, ch)
    struct sort at assembly."""
    cells = image_grid_cells(
        df, out_w, out_h, id_col=id_col, channels=channels,
        per_channel=True,
    )
    px_hex = F.lpad(
        F.lower(
            F.conv(F.round(F.col("mean"), 0).cast("int").cast("string"),
                   10, 16)
        ),
        2, "0",
    )
    rows = (
        cells.groupBy("id", "cy")
        .agg(
            F.concat_ws(
                "",
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("cx", "ch",
                                                px_hex.alias("hx")))
                    ),
                    lambda s: s["hx"],
                ),
            ).alias("row_hex")
        )
    )
    return (
        rows.groupBy("id")
        .agg(
            F.unhex(
                F.concat_ws(
                    "",
                    F.transform(
                        F.array_sort(
                            F.collect_list(F.struct("cy", "row_hex"))
                        ),
                        lambda s: s["row_hex"],
                    ),
                )
            ).alias("data")
        )
        .select(
            F.col("id").alias(id_col), "data",
            F.lit(out_w).alias("width"), F.lit(out_h).alias("height"),
            F.lit(channels).alias("channels"),
        )
    )
