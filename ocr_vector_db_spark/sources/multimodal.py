"""Multimodal (image/audio/video) columns as opaque binary + typed metadata.

The Spark-side plumbing — schema, partition-friendly layout, Arrow-batched
UDF signatures, batch shapes — is real and tested; the actual media decode
is stubbed behind DECODERS because the image/audio libraries aren't in this
container. Production swaps the stub for Pillow/ffmpeg bodies with the same
row contract (this mirrors the reference's pluggable Vision-OCR provider,
ingestion/parsers/pymupdf_parser.py:61-132, which is likewise an external
service behind an interface).

Deterministic fake features: derived from md5 of the bytes, so tests have
stable expectations without any media library.

Two of the multimodal operators need NO decode stub because raw rasters
are already pixels, so they run as real distributed Column math:
`operators/image_hash.py::resize_raster` (exact box-average resize —
thumbnailing / model-input normalization) and the dHash/aHash perceptual
hashes (image near-dup, q150) over `asset_gray_frames`/`asset_raw_frames`
projections of ASSET_SCHEMA rows.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

ASSET_SCHEMA = T.StructType([
    T.StructField("asset_id", T.StringType(), False),
    T.StructField("kind", T.StringType(), False),       # image|audio|video
    T.StructField("data", T.BinaryType(), False),        # opaque payload
    T.StructField("metadata", T.MapType(T.StringType(), T.StringType()), True),
])

FEATURE_SCHEMA = T.StructType([
    T.StructField("asset_id", T.StringType(), False),
    T.StructField("kind", T.StringType(), False),
    T.StructField("n_bytes", T.LongType(), False),
    T.StructField("content_hash", T.StringType(), False),
    T.StructField("width", T.IntegerType(), True),       # images/video
    T.StructField("height", T.IntegerType(), True),
    T.StructField("duration_s", T.DoubleType(), True),   # audio/video
    T.StructField("feature", T.ArrayType(T.DoubleType()), True),
])


def _fake_decode(kind: str, data: bytes) -> dict:
    """Deterministic stand-in for a real decoder. Real implementation:
    Pillow `Image.open(BytesIO(data))` / ffprobe — same output dict."""
    h = hashlib.md5(data).digest()
    width = 64 + h[0] * 4 if kind in ("image", "video") else None
    height = 64 + h[1] * 4 if kind in ("image", "video") else None
    duration = round(h[2] / 8.0, 3) if kind in ("audio", "video") else None
    feature = [((h[i % 16] / 255.0) * 2 - 1) for i in range(16)]
    return {
        "width": width, "height": height, "duration_s": duration, "feature": feature,
    }


def extract_features(assets: DataFrame, decode=_fake_decode) -> DataFrame:
    """Arrow-batched decode/feature-extract over the binary column. Batches
    stream through the Python worker (mapInPandas), so one oversized asset
    never materializes a whole partition in memory."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [bytes(d) for d in pdf["data"]]
            rows = [
                {
                    "asset_id": aid,
                    "kind": kind,
                    "n_bytes": len(data),
                    "content_hash": hashlib.md5(data).hexdigest(),
                    **decode(kind, data),
                }
                for aid, kind, data in zip(pdf["asset_id"], pdf["kind"], payloads)
            ]
            yield pd.DataFrame(rows, columns=[f.name for f in FEATURE_SCHEMA.fields])

    return assets.mapInPandas(run, FEATURE_SCHEMA)


def frame_sample_plan(assets: DataFrame, every_s: float = 1.0) -> DataFrame:
    """Video → frame-sampling plan rows (asset_id, frame_idx, t_offset).
    The actual frame decode is the stubbed step; the explode/distribution
    shape (one output row per sampled frame) is the real contract."""
    from pyspark.sql import functions as F

    feats = extract_features(assets.filter(F.col("kind") == "video"))
    n_frames = F.greatest(F.lit(1), F.floor(F.col("duration_s") / every_s).cast("int"))
    return (
        feats.select(
            "asset_id",
            F.explode(F.sequence(F.lit(0), n_frames - 1)).alias("frame_idx"),
        ).withColumn("t_offset_s", F.col("frame_idx") * every_s)
    )
