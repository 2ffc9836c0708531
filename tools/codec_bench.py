"""Regenerate the SCALING.md codec-throughput table: single-thread
encode/decode latency per ~1.5 KB fixture payload (64x24 gray,
min-of-5 batches of 60 reps) for every container arm. These codecs run
inside Arrow mapInPandas stages, so per-executor throughput multiplies
by cores and this is the per-core decode budget at 100 TB ingest.

Usage: python tools/codec_bench.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import data_engineer_project_spark.operators.multimodal as mm  # noqa: E402


def _t(fn, reps=60, batches=5):
    best = float("inf")
    for _ in range(batches):
        t0 = time.perf_counter()
        for _ in range(reps):
            fn()
        best = min(best, (time.perf_counter() - t0) / reps)
    return best * 1000.0  # ms


def main() -> None:
    rng = np.random.RandomState(5)
    px = rng.randint(0, 256, 64 * 24).astype(np.uint8).tobytes()
    w = 64
    arms = [
        ("pgm", lambda: mm.encode_pnm(px, w), mm.decode_pnm),
        ("bmp", lambda: mm.encode_bmp8(px, w), mm.decode_bmp),
        ("png (stored-block)", lambda: mm.encode_png(px, w), mm.decode_png),
        ("tif", lambda: mm.encode_tiff_gray(px, w), mm.decode_tiff),
        ("wav", lambda: mm.encode_wav_pcm8(px), mm.decode_wav),
        ("gif (LZW)", lambda: mm.encode_gif(px, w), mm.decode_gif),
        (
            "jpeg lossless (SOF3)",
            lambda: mm.encode_jpeg_lossless(px, w),
            mm.decode_jpeg,
        ),
        (
            "jpeg baseline (SOF0)",
            lambda: mm.encode_jpeg_baseline(px, w),
            mm.decode_jpeg,
        ),
        (
            "jpeg progressive (SOF2)",
            lambda: mm.encode_jpeg_progressive(px, w),
            mm.decode_jpeg,
        ),
    ]
    print("| arm | encode ms | decode ms | decode MB/s (per core) |")
    print("|---|---|---|---|")
    for name, enc, dec in arms:
        payload = enc()
        dec(payload)  # warm LUT caches
        enc_ms = _t(enc)
        dec_ms = _t(lambda: dec(payload))
        mbs = (len(payload) / 1e6) / (dec_ms / 1000.0)
        mbs_txt = f"{mbs:.0f}" if mbs >= 10 else f"{mbs:.1f}"
        print(f"| {name} | {enc_ms:.3f} | {dec_ms:.3f} | {mbs_txt} |")


if __name__ == "__main__":
    main()
