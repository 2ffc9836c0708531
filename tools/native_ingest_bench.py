"""End-to-end Spark-level measurement of the native decode tier.

The codec table (SCALING.md, `tools/codec_bench.py`) prices the
decoders single-threaded; this harness prices what actually ships:
`decode_media` running inside Arrow `mapInPandas` on local[N], where
every Python worker owns one JVM decode sidecar. It answers the 100 TB
question directly — aggregate decode MB/s per executor for a
JPEG-dominated corpus (the mix that dominates a real crawl's decode
cost), Python engine vs native engine, same plan, same data.

Corpus: `--rows` documents (default 512) carrying 512x256 grayscale
baseline-JPEG payloads (8 distinct images replicated — decode cost is
per-payload, so distinctness is irrelevant), written to a temp parquet
so both engines read identical bytes through a real scan.

Usage: python tools/native_ingest_bench.py [--rows N] [--progressive]
Prints one JSON line per engine: wall seconds, corpus MB, MB/s.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    rows = 512
    prog = "--progressive" in sys.argv
    if "--rows" in sys.argv:
        rows = int(sys.argv[sys.argv.index("--rows") + 1])

    import data_engineer_project_spark.operators.multimodal as mm
    from data_engineer_project_spark.session import get_spark

    enc = mm.encode_jpeg_progressive if prog else mm.encode_jpeg_baseline
    rng = np.random.RandomState(7)
    payloads = [
        enc(rng.randint(0, 256, 512 * 256).astype(np.uint8).tobytes(), 512)
        for _ in range(8)
    ]
    corpus_mb = sum(len(payloads[i % 8]) for i in range(rows)) / 1e6

    spark = get_spark(
        "native-ingest-bench",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    import pandas as pd

    tmp = tempfile.mkdtemp(prefix="native_ingest_")
    try:
        pdf = pd.DataFrame(
            {
                "doc_id": range(rows),
                "lang": ["en"] * rows,
                "media": [payloads[i % 8] for i in range(rows)],
                "media_format": ["jpg"] * rows,
            }
        )
        spark.createDataFrame(pdf).repartition(32).write.mode(
            "overwrite"
        ).parquet(f"{tmp}/media")
        media = spark.read.parquet(f"{tmp}/media")

        meta = {
            "harness": "native-ingest",
            "rows": rows,
            "mode": "progressive" if prog else "baseline",
            "corpus_mb": round(corpus_mb, 1),
            "cpus": os.cpu_count(),
            "loadavg": round(os.getloadavg()[0], 2),
        }
        print(json.dumps(meta), flush=True)
        for engine in ("python", "native"):
            best = None
            for _ in range(2 if engine == "python" else 3):
                t0 = time.time()
                out = mm.decode_media(
                    media, use_real_codec=True, engine=engine
                ).agg({"sum_px": "sum"}).collect()
                dt = time.time() - t0
                best = dt if best is None else min(best, dt)
            print(
                json.dumps(
                    {
                        "engine": engine,
                        "sec": round(best, 2),
                        "mb_per_sec": round(corpus_mb / best, 1),
                        "checksum": int(out[0][0]),
                    }
                ),
                flush=True,
            )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
