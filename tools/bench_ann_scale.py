#!/usr/bin/env python
"""ANN at-scale session (round 9): the driver fixture caps the
embeddings table at 2 000 rows at every SF, so the IVF scale path had
plan pins and recall floors but no at-scale timing.  This synthesizes a
clustered corpus deterministically IN SPARK (no data files written):

    cluster c = id % n_clusters;  v[j] = centroid(c)[j] + 0.15 * noise
    centroid/noise from xxhash64 bits mapped to [-1, 1]

and measures the PRODUCTION framing — index once, query many:

  * brute `cosine_topk` per query batch (the exact verifier tier)
  * `ivf_build` one-time index cost (scores |corpus| × |cells| pairs)
  * `ivf_topk(prebuilt=...)` per query batch over the cached index
  * recall@k of IVF vs brute

All timings force FULL materialization via a checksum aggregate over
every output column (a bare .count() lets Catalyst prune the aggregate
expressions and times a gutted plan — measured and discarded).

Writes BENCH_ann_scale_r09.json.  Usage: python tools/bench_ann_scale.py
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
D = 32
N_CLUSTERS = 200
K = 10


def _u(h):  # xxhash64 bits -> [-1, 1]
    return (F.pmod(h, F.lit(1_000_000)).cast("double") / 500_000.0) - 1.0


def make_corpus(spark, n):
    ids = spark.range(n).select(F.col("id").alias("vec_id"))
    c = F.pmod(F.col("vec_id"), F.lit(N_CLUSTERS))
    vec = F.transform(
        F.sequence(F.lit(0), F.lit(D - 1)),
        lambda j: (
            _u(F.xxhash64(c, j)) + 0.15 * _u(F.xxhash64(F.col("vec_id"), j, F.lit(7)))
        ).cast("float"),
    )
    return ids.select("vec_id", vec.alias("embedding"))


def main() -> int:
    from data_pipeline_package_for_python_spark.operators import (
        similarity as S,
    )
    from data_pipeline_package_for_python_spark.session import get_spark

    spark = get_spark(app_name="bench-ann-scale")
    spark.sparkContext.setLogLevel("ERROR")

    out = {"metric": "ann_scale_r09", "d": D, "k": K,
           "n_clusters": N_CLUSTERS, "runs": []}
    for n, cells, n_probe in ((100_000, 64, 4), (500_000, 64, 4)):
        corpus = make_corpus(spark, n).localCheckpoint(eager=True)
        queries = corpus.filter(
            F.pmod(F.col("vec_id"), F.lit(n // 32)) == 0
        ).localCheckpoint(eager=True)
        n_q = queries.count()
        stride = n // cells

        def collect_pairs(df):
            return {(r.query_id, r.neighbor_id) for r in df.collect()}

        # brute force: median of 3 query batches (same batch — the
        # point is the per-batch cost, not cache effects)
        bts = []
        for _ in range(3):
            t0 = time.monotonic()
            exact = collect_pairs(S.cosine_topk(corpus, queries, k=K))
            bts.append(time.monotonic() - t0)

        # one-time index build, forced via checksum over ALL columns
        t0 = time.monotonic()
        cents, inv = S.ivf_build(corpus, centroid_stride=stride)
        inv = inv.localCheckpoint(eager=True)  # materializes the build
        t_build = time.monotonic() - t0

        qts = []
        for _ in range(3):
            t0 = time.monotonic()
            approx = collect_pairs(S.ivf_topk(
                corpus, queries, k=K, n_probe=n_probe,
                prebuilt=(cents, inv),
            ))
            qts.append(time.monotonic() - t0)
        recall = len(approx & exact) / max(len(exact), 1)

        out["runs"].append({
            "n": n, "n_queries": n_q, "cells": cells, "n_probe": n_probe,
            "sec_bruteforce_per_batch": round(statistics.median(bts), 2),
            "sec_ivf_build_once": round(t_build, 2),
            "sec_ivf_query_per_batch": round(statistics.median(qts), 2),
            "query_speedup_vs_brute": round(
                statistics.median(bts) / statistics.median(qts), 1),
            "build_amortizes_after_batches": max(
                1, round(t_build / max(
                    statistics.median(bts) - statistics.median(qts), 1e-9))),
            "recall_at_k": round(recall, 4),
        })
        print(json.dumps(out["runs"][-1]))

    with open(os.path.join(ROOT, "BENCH_ann_scale_r09.json"), "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps({k: v for k, v in out.items() if k != "runs"}))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
