#!/usr/bin/env python
"""Pinned-corpus JPEG decode throughput (SCALING.md methodology).

Deterministic 512×512 corpus spanning the content classes that bound the
entropy decoder differently: smooth (IDCT-dominated), textured (the
crawl-JPEG middle), noisy (entropy-loop-dominated) — gray and RGB 4:2:0,
q85, standard Annex-K tables. Reports min-of-N MP/s per class.

Usage: python tools/bench_jpeg_decode.py [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def corpus():
    import numpy as np

    from ocr_vector_db_spark.sources.jpeg import encode_jpeg

    rng = np.random.default_rng(0)
    xx, yy = np.meshgrid(np.arange(512), np.arange(512))
    classes = {
        "smooth": (128 + 90 * np.sin(xx / 37.0) * np.cos(yy / 53.0))
        .clip(0, 255).astype(np.uint8),
        "textured": (128 + 60 * np.sin(xx / 23.0) + 50 * np.cos(yy / 31.0)
                     + rng.normal(0, 18, (512, 512)))
        .clip(0, 255).astype(np.uint8),
        "noisy": rng.integers(0, 256, (512, 512), dtype=np.uint8),
    }
    out = []
    for name, g in classes.items():
        out.append((f"{name} gray q85",
                    encode_jpeg(g.tobytes(), 512, 512, 1, quality=85)))
        rgb = __import__("numpy").stack(
            [g, __import__("numpy").roll(g, 7, 0),
             __import__("numpy").roll(g, 13, 1)], -1)
        out.append((f"{name} rgb420 q85",
                    encode_jpeg(rgb.tobytes(), 512, 512, 3, quality=85,
                                subsample="4:2:0")))
    return out


def main() -> None:
    from ocr_vector_db_spark.sources.jpeg import decode_jpeg

    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 9
    mp = 0.512 * 0.512
    for label, enc in corpus():
        decode_jpeg(enc)  # warm: LUT expansions build once per process
        best = min(
            (lambda t0: (decode_jpeg(enc), time.perf_counter() - t0)[1])(
                time.perf_counter()
            )
            for _ in range(reps)
        )
        print(f"{label:20s}: {mp / best:6.2f} MP/s  ({best * 1e3:.1f} ms)")


if __name__ == "__main__":
    main()
