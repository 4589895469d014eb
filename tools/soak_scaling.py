#!/usr/bin/env python
"""Linear-scaling soak of the heaviest operator families (VERDICT r12 #7).

The per-round bench runs at sf0.1 and can't see superlinearity that only
bites at 10x the data (the audio `substring` O(offset) bug was invisible
at fixture grain). This soak generates corpora ENTIRELY Spark-side
(expression-synthesized binary/text/vector columns — nothing large ever
sits on the driver) at a base scale N and at 10N, times each family at
both, and prints the wall-time ratio. A family whose plan is linear
lands near 10x (modulo fixed overheads, which push the ratio BELOW 10);
banded pair families produce more pairs at 10N (collision growth), so
their honest budget is ~12-15x. A ratio far above that is a hidden
superlinearity.

Usage: python tools/soak_scaling.py [base_n]   (default 400)
Writes one human table to stdout; record the numbers in SCALING.md.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def synth_binary(spark, n: int, nbytes: int, salt: str):
    """(asset_id string, data binary) — `nbytes` pseudo-random bytes per
    row from an md5 chain, generated INSIDE the JVM (no driver data)."""
    reps = (nbytes + 15) // 16
    hexpr = F.concat_ws(
        "",
        F.transform(
            F.sequence(F.lit(0), F.lit(reps - 1)),
            lambda j: F.md5(F.concat_ws(":", F.lit(salt), F.col("id"), j)),
        ),
    )
    return (
        spark.range(n)
        .select(
            F.concat(F.lit(salt), F.col("id")).alias("asset_id"),
            F.unhex(F.substring(hexpr, 1, nbytes * 2)).alias("data"),
        )
    )


def synth_docs(spark, n: int):
    """(doc_id, text): ~80 pseudo-random words per doc with a 10% shared
    prefix band so MinHash banding has real collisions to verify."""
    words = F.concat_ws(
        " ",
        F.transform(
            F.sequence(F.lit(0), F.lit(79)),
            lambda j: F.substring(
                F.md5(F.concat_ws(":", F.col("id") % 10, j,
                                  (F.col("id") / 10).cast("long")
                                  * ((j > 7).cast("long")))),
                1, 6,
            ),
        ),
    )
    return spark.range(n).select(
        F.col("id").alias("doc_id"), words.alias("text")
    )


def synth_vectors(spark, n: int, dim: int = 64):
    vec = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda j: (
            F.conv(F.substring(F.md5(F.concat_ws(":", F.col("id"), j)),
                               1, 6), 16, 10).cast("double")
            / 16777215.0 * 2 - 1
        ).cast("float"),
    )
    return spark.range(n).select(
        F.col("id").alias("vec_id"), vec.alias("embedding"),
        (F.col("id") % 8).cast("int").alias("label"),
    )


def main() -> None:
    base_n = int(sys.argv[1]) if len(sys.argv) > 1 else 400

    from ocr_vector_db_spark.session import get_spark

    spark = get_spark("soak_scaling")
    spark.sparkContext.setLogLevel("ERROR")

    import tempfile

    tmp = tempfile.mkdtemp(prefix="soak_")

    def family_minhash(n):
        from ocr_vector_db_spark.operators.dedup import (
            minhash_lsh_candidates,
        )

        return minhash_lsh_candidates(synth_docs(spark, n)).count()

    def family_image(n):
        from ocr_vector_db_spark.operators.image_hash import (
            dhash_signatures,
            phash_near_dup_pairs,
        )

        frames = synth_binary(spark, n, 72 * 40, "img").select(
            "asset_id", "data", F.lit(72).alias("width"),
            F.lit(40).alias("height"),
        )
        sigs = dhash_signatures(frames)
        return phash_near_dup_pairs(sigs, r=4).count()

    def family_audio(n):
        from ocr_vector_db_spark.operators.audio_fingerprint import (
            audio_fingerprints,
            audio_near_dup_pairs,
        )

        clips = synth_binary(spark, n, 2 * 65000, "pcm")
        sigs = audio_fingerprints(clips)
        return audio_near_dup_pairs(sigs, r=6).count()

    def family_video(n):
        from ocr_vector_db_spark.operators.video_hash import (
            video_clip_frames,
            video_frame_signatures,
            video_near_dup_pairs,
        )

        clips = synth_binary(spark, n // 4, 36 * 24 * 8, "vid").select(
            "asset_id", "data", F.lit(36).alias("width"),
            F.lit(24).alias("height"), F.lit(8).alias("n_frames"),
        )
        vsigs = video_frame_signatures(video_clip_frames(clips, every=2))
        return video_near_dup_pairs(vsigs, r=4).count()

    soak_seq = [0]

    def family_ivfpq(n):
        from ocr_vector_db_spark.operators.ivfpq import IVFPQIndex

        soak_seq[0] += 1
        idx = IVFPQIndex.build(
            spark, synth_vectors(spark, n * 4),
            f"{tmp}/ivfpq_{soak_seq[0]}", dim=64,
            num_clusters=16, m=8, k=16,
        )
        return idx.codes().count()

    families = [
        ("minhash_lsh", family_minhash),
        ("image_neardup", family_image),
        ("audio_neardup", family_audio),
        ("video_neardup", family_video),
        ("ivfpq_build", family_ivfpq),
    ]

    print(f"{'family':<15}{'n':>8}{'rows':>10}{'wall_s':>9}")
    results = {}
    for name, fn in families:
        fn(max(base_n // 4, 8))  # untimed warmup at a small grain
        for n in (base_n, base_n * 10):
            t0 = time.time()
            rows = fn(n)
            dt = time.time() - t0
            results.setdefault(name, []).append(dt)
            print(f"{name:<15}{n:>8}{rows:>10}{dt:>9.2f}")
    print()
    for name, (t1, t10) in results.items():
        print(f"{name:<15} 10x-data wall ratio: {t10 / t1:.2f}x")


if __name__ == "__main__":
    main()
