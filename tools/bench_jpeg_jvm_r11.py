"""JPEG decode tier bench (round 11): JVM ImageIO vs pure-Python codec.

The r10 verdict named the pure-Python JPEG codec (~0.05 Mpixel/s/box)
the one remaining scale-killer: a 100 TB JPEG intake through it is
computationally impossible.  This measures the fix — Spark's JVM
``image`` source (Java ImageIO, no installs needed) — on the SAME files
the oracle-tier codec wrote, and reports both tiers' Mpixel/s.

Protocol (artifact name carries the corpus shape so re-runs with other
args never overwrite a committed artifact):

1. generate ``n`` synthetic ``side``×``side`` RGB images, encoded to
   baseline JPEG by the package's own encoder IN PARALLEL (mapInPandas
   over the id range — the encode cost is why corpus generation is
   distributed);
2. time the JVM tier: one ``read_images_jvm`` scan aggregating
   width×height over every file (any row materialization decodes — the
   aggregate forces all pixels);
3. time the oracle tier on ``python_sample`` of the same files
   driver-side (the floor is ~0.05 Mpixel/s; decoding the full corpus
   through it would take longer than every other bench combined);
4. cross-check one image per tier pair (dims exact, |Δpixel| ≤ 2).

Usage: python tools/bench_jpeg_jvm_r11.py [n_images] [side] [sample]
"""

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from data_pipeline_package_for_python_spark import get_spark  # noqa: E402
from data_pipeline_package_for_python_spark.operators.jpeg import (  # noqa: E402
    jpeg_parse,
)
from data_pipeline_package_for_python_spark.operators.multimodal import (  # noqa: E402
    bgr_to_rgb,
    read_images_jvm,
)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    side = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    sample = int(sys.argv[3]) if len(sys.argv) > 3 else 4

    spark = get_spark(app_name="bench-jpeg-jvm-r11")
    corpus = tempfile.mkdtemp(prefix="bench_jpeg_jvm_")

    # -------- corpus generation: parallel pure-Python ENCODE ---------- #
    ids = spark.range(n).repartition(32)

    def gen(it):
        import numpy as np
        import pandas as pd

        from data_pipeline_package_for_python_spark.operators.jpeg import (
            jpeg_encode,
        )

        for pdf in it:
            out = []
            for did in pdf["id"]:
                did = int(did)
                i = np.arange(side * side * 3, dtype=np.int64)
                src = (
                    (did * 31 + (i // (side * 3)) * 17
                     + ((i % (side * 3)) // 3) * 7 + (i % 3) * 3) % 256
                ).astype(np.uint8)
                payload = jpeg_encode(side, side, src.tobytes())
                with open(f"{corpus}/d{did}.jpg", "wb") as fh:
                    fh.write(payload)
                out.append((did, len(payload)))
            yield pd.DataFrame(out, columns=["id", "nbytes"])

    t0 = time.monotonic()
    total_bytes = (
        ids.mapInPandas(gen, schema="id long, nbytes long")
        .agg(F.sum("nbytes"))
        .collect()[0][0]
    )
    gen_s = time.monotonic() - t0
    print(f"generated {n} x {side}x{side} JPEGs "
          f"({total_bytes / 1e6:.1f} MB) in {gen_s:.1f}s")

    # -------- JVM tier: ImageIO decode of the whole corpus ----------- #
    # warm scan once (file listing + JVM class load), then time 3 runs
    def jvm_scan():
        return (
            read_images_jvm(spark, corpus)
            .agg(
                F.count(F.lit(1)).alias("files"),
                F.sum(F.col("width") * F.col("height")).alias("px"),
                F.sum(F.length("data_bgr")).alias("data_bytes"),
            )
            .collect()[0]
        )

    jvm_scan()
    jvm_runs = []
    for _ in range(3):
        t0 = time.monotonic()
        row = jvm_scan()
        jvm_runs.append(time.monotonic() - t0)
    assert row["files"] == n and row["px"] == n * side * side
    jvm_s = sorted(jvm_runs)[1]
    jvm_mpix_s = row["px"] / 1e6 / jvm_s

    # -------- oracle tier: pure-Python decode of a sample ------------ #
    py_px = 0
    t0 = time.monotonic()
    for did in range(sample):
        with open(f"{corpus}/d{did}.jpg", "rb") as fh:
            w, h, _ = jpeg_parse(fh.read())
        py_px += w * h
    py_s = time.monotonic() - t0
    py_mpix_s = py_px / 1e6 / py_s

    # -------- cross-tier equivalence on one image -------------------- #
    one = (
        bgr_to_rgb(read_images_jvm(spark, corpus))
        .filter(F.col("origin").endswith("/d0.jpg"))
        .collect()[0]
    )
    with open(f"{corpus}/d0.jpg", "rb") as fh:
        w, h, out = jpeg_parse(fh.read())
    assert (one.width, one.height) == (w, h)
    delta = np.abs(
        np.frombuffer(bytes(one.rgb), np.uint8).astype(np.int64)
        - np.frombuffer(out, np.uint8).astype(np.int64)
    ).max()
    assert delta <= 2, f"tier disagreement {delta}"

    result = {
        "metric": "jpeg_decode_tiers_r11",
        "n_images": n,
        "side": side,
        "corpus_mb": round(total_bytes / 1e6, 2),
        "gen_parallel_encode_sec": round(gen_s, 2),
        "jvm_runs_sec": [round(x, 3) for x in jvm_runs],
        "jvm_median_sec": round(jvm_s, 3),
        "jvm_mpixel_per_sec": round(jvm_mpix_s, 1),
        "python_sample_images": sample,
        "python_sec": round(py_s, 2),
        "python_mpixel_per_sec": round(py_mpix_s, 4),
        "jvm_over_python": round(jvm_mpix_s / py_mpix_s, 1),
        "cross_tier_max_pixel_delta": int(delta),
    }
    line = json.dumps(result)
    print(line)
    out_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        f"BENCH_jpeg_jvm_r11_{n}x{side}.json",
    )
    with open(out_path, "w") as fh:
        fh.write(line + "\n")
    spark.stop()


if __name__ == "__main__":
    main()
