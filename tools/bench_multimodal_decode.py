#!/usr/bin/env python
"""Multimodal decode throughput (round 10, VERDICT r9 #5): the codecs
(operators/multimodal.py PNG/PPM/WAV, operators/jpeg.py baseline JPEG)
are hash-correct but had no scale measurement — a 100 TB intake needs
bytes/sec/core to size the decode fleet.

Protocol:

  1. GENERATE a deterministic image corpus executor-side (numpy
     RandomState(media_id) noise → the repo's own encoders via
     mapInPandas) and stage it to parquet ONCE per (format, size):
       * PNG  (filter 0, zlib-bound decode) — ~1 GB compressed target
       * JPEG (pure-numpy huffman+DCT)      — smaller corpus, the
         honest pure-Python tier (real deployments swap in libjpeg
         via the same mapInPandas seam; the PLUMBING is what scales)
  2. DECODE through ``parse_image`` in ``mapInPandas`` with a per-image
     pixel checksum aggregate (forces full decode; Catalyst cannot
     prune it), at partitions ∈ {8, 16, 32} — linear scaling with
     cores is the pass criterion for the Spark-side plumbing.

Reports MB/s (compressed bytes), MB/s/core, and Mpixel/s.

Usage:  python tools/bench_multimodal_decode.py [png_images jpeg_images]
        default: 14000 PNGs of 160x160 (~1.08 GB), 96 JPEGs of 128x128
        (the pure-Python JPEG decode runs ~4.6 s/image — the corpus is
        sized for the scaling check, and Mpixel/s/core is the number a
        libjpeg swap-in would scale from)
Writes BENCH_multimodal_r10.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import pyspark.sql.functions as F

PNG_SIDE = 160
JPEG_SIDE = 128


def gen_corpus(spark, n_images, side, fmt, out):
    """Encode n_images deterministic noise images executor-side."""
    if os.path.exists(os.path.join(out, "_SUCCESS")):
        return

    def encode(batches):
        import numpy as np
        import pandas as pd

        from data_pipeline_package_for_python_spark.operators import (
            jpeg as J,
            multimodal as M,
        )

        for pdf in batches:
            payloads = []
            for mid in pdf["id"]:
                rng = np.random.RandomState(int(mid) % (2**31))
                rgb = rng.randint(
                    0, 256, size=side * side * 3, dtype=np.uint8
                ).tobytes()
                if fmt == "png":
                    payloads.append(M.png_encode(side, side, rgb))
                else:
                    payloads.append(J.jpeg_encode(side, side, rgb))
            yield pd.DataFrame(
                {"media_id": pdf["id"], "payload": payloads}
            )

    (
        spark.range(n_images)
        .repartition(32)
        .mapInPandas(encode, schema="media_id long, payload binary")
        .write.mode("overwrite")
        .parquet(out)
    )


def timed_decode(spark, path, n_partitions):
    """Full-decode pass: parse every payload, checksum every pixel.

    Parallelism is controlled by ``spark.sql.files.maxPartitionBytes``
    bin-packing over the corpus's 32 files — NO repartition: a
    mid-pipeline shuffle of the raw payload bytes is exactly what an
    intake pipeline avoids (decode at scan parallelism), and an early
    version of this tool that repartitioned measured the 1 GB shuffle,
    not the codec (32-partition PNG looked 3× slower than 8)."""
    import glob

    def decode(batches):
        import pandas as pd

        from data_pipeline_package_for_python_spark.operators import (
            multimodal as M,
        )

        for pdf in batches:
            sums, pixels, nbytes = [], [], []
            for p in pdf["payload"]:
                b = bytes(p)
                w, h, rgb = M.parse_image(b)
                sums.append(sum(rgb[:: max(1, len(rgb) // 4096)]))
                pixels.append(w * h)
                nbytes.append(len(b))
            yield pd.DataFrame(
                {"cksum": sums, "pixels": pixels, "nbytes": nbytes}
            )

    total = sum(
        os.path.getsize(f) for f in glob.glob(f"{path}/*.parquet")
    )
    old_mpb = spark.conf.get("spark.sql.files.maxPartitionBytes")
    old_oc = spark.conf.get("spark.sql.files.openCostInBytes")
    spark.conf.set(
        "spark.sql.files.maxPartitionBytes",
        str(max(1, total // n_partitions + 1)),
    )
    # the default 4 MB open-cost padding forces one-file-per-partition
    # on small-file corpora regardless of maxPartitionBytes — zero it
    # so the requested parallelism is the actual parallelism
    spark.conf.set("spark.sql.files.openCostInBytes", "0")
    try:
        df = spark.read.parquet(path).mapInPandas(
            decode, schema="cksum long, pixels long, nbytes long"
        )
        t0 = time.perf_counter()
        row = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("cksum").alias("ck"),
            F.sum("pixels").alias("px"),
            F.sum("nbytes").alias("mb"),
        ).collect()[0]
        dt = time.perf_counter() - t0
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", old_mpb)
        spark.conf.set("spark.sql.files.openCostInBytes", old_oc)
    return dt, row["n"], row["px"], row["mb"]


def main(argv) -> int:
    from data_pipeline_package_for_python_spark.session import get_spark

    n_png = int(argv[1]) if len(argv) > 1 else 14_000
    n_jpeg = int(argv[2]) if len(argv) > 2 else 96

    spark = get_spark(app_name="bench-multimodal")
    spark.sparkContext.setLogLevel("ERROR")

    out = {"metric": "multimodal_decode_r10", "formats": {}}
    for fmt, n, side in (("png", n_png, PNG_SIDE),
                         ("jpeg", n_jpeg, JPEG_SIDE)):
        path = f"/tmp/dpp_media_{fmt}_{n}_{side}"
        t0 = time.perf_counter()
        gen_corpus(spark, n, side, fmt, path)
        t_gen = time.perf_counter() - t0

        runs = []
        for parts in (8, 16, 32):
            # warm-up (python workers + page cache), then 2 timed
            timed_decode(spark, path, parts)
            best = None
            for _ in range(2):
                dt, cnt, px, nbytes = timed_decode(spark, path, parts)
                best = dt if best is None else min(best, dt)
            mb = nbytes / 1e6
            runs.append({
                "partitions": parts,
                "sec": round(best, 2),
                "mb_compressed": round(mb, 1),
                "mb_per_sec": round(mb / best, 2),
                "mb_per_sec_per_core": round(mb / best / parts, 3),
                "mpixel_per_sec": round(px / best / 1e6, 3),
                "kpixel_per_sec_per_core": round(
                    px / best / 1e3 / parts, 2),
                "images": cnt,
            })
            print(json.dumps({"fmt": fmt, **runs[-1]}))
        out["formats"][fmt] = {
            "n_images": n, "side": side,
            "sec_generate_once": round(t_gen, 1),
            "runs": runs,
            "scaling_16_to_32": round(
                runs[2]["mb_per_sec"] / runs[1]["mb_per_sec"], 2),
            "scaling_8_to_16": round(
                runs[1]["mb_per_sec"] / runs[0]["mb_per_sec"], 2),
        }

    with open(os.path.join(ROOT, "BENCH_multimodal_r10.json"), "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps({k: v for k, v in out.items() if k != "formats"}))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv))
