#!/usr/bin/env python
"""ANN at-scale session (rounds 9-10): the driver fixture caps the
embeddings table at 2 000 rows at every SF, so the IVF scale path had
plan pins and recall floors but no at-scale timing.  This synthesizes a
clustered corpus deterministically IN SPARK (no data files written):

    cluster c = id % n_clusters;  v[j] = centroid(c)[j] + 0.15 * noise
    centroid/noise from xxhash64 bits mapped to [-1, 1]

and measures the PRODUCTION framing — index once, query many:

  * brute `cosine_topk` per query batch (the exact verifier tier)
  * `ivf_build` one-time index cost — BOTH tiers:
      - stride: relational n_probe=1 max_by path, 64 data-blind cells
      - trained (r10): numpy-Lloyd codebook over a hash-sample,
        cells ∝ sqrt(n), map-only Arrow matmul-argmax assignment
  * `ivf_topk(prebuilt=...)` per query batch over each cached index
  * recall@k of IVF vs brute across an n_probe curve
  * cell-occupancy skew (max/mean) per tier

All timings force FULL materialization (collect of the pair set).

Sizes come from argv so every published data point is reproducible from
the checked-in script (r9 advice):

    python tools/bench_ann_scale.py [n ...]     default: 100000 500000 2000000

Writes BENCH_ann_scale_r10.json.
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
DEFAULT_SIZES = (100_000, 500_000, 2_000_000)


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


def main(argv) -> int:
    from data_pipeline_package_for_python_spark.operators import (
        similarity as S,
    )
    from data_pipeline_package_for_python_spark.session import get_spark

    sizes = tuple(int(a) for a in argv[1:]) or DEFAULT_SIZES

    spark = get_spark(app_name="bench-ann-scale")
    spark.sparkContext.setLogLevel("ERROR")

    out = {"metric": "ann_scale_r11", "d": D, "k": K,
           "n_clusters": N_CLUSTERS, "runs": []}
    for n in sizes:
        cells_stride, n_probe = 64, 4
        corpus = make_corpus(spark, n).localCheckpoint(eager=True)
        queries = corpus.filter(
            F.pmod(F.col("vec_id"), F.lit(n // 32)) == 0
        ).localCheckpoint(eager=True)
        n_q = queries.count()
        stride = n // cells_stride

        def collect_pairs(df):
            return {(r.query_id, r.neighbor_id) for r in df.collect()}

        # brute force: median of 3 query batches (same batch — the
        # point is the per-batch cost, not cache effects)
        bts = []
        for _ in range(3):
            t0 = time.monotonic()
            exact = collect_pairs(S.cosine_topk(corpus, queries, k=K))
            bts.append(time.monotonic() - t0)
        t_brute = statistics.median(bts)

        run = {"n": n, "n_queries": n_q, "k": K,
               "sec_bruteforce_per_batch": round(t_brute, 2), "tiers": {}}

        # --- tier A: stride codebook, relational assignment (r9) ---
        t0 = time.monotonic()
        cents_s, inv_s = S.ivf_build(corpus, centroid_stride=stride)
        inv_s = inv_s.localCheckpoint(eager=True)
        t_build_s = time.monotonic() - t0

        # --- tier B: trained codebook ∝ sqrt(n), map-only assignment,
        # r10 behavior (no rebalance) kept as the comparison point ---
        t0 = time.monotonic()
        cents_t, inv_t = S.ivf_build_trained(corpus, cells="auto",
                                             lloyd_rounds=2,
                                             balance_rounds=0)
        inv_t = inv_t.localCheckpoint(eager=True)
        t_build_t = time.monotonic() - t0
        cells_trained = cents_t.count()

        # --- tier C: r11 split/steal rebalanced codebook (default) ---
        t0 = time.monotonic()
        cents_b, inv_b = S.ivf_build_trained(corpus, cells="auto",
                                             lloyd_rounds=2)
        inv_b = inv_b.localCheckpoint(eager=True)
        t_build_b = time.monotonic() - t0
        cells_balanced = cents_b.count()

        for name, cents, inv, t_build, cells in (
            ("stride_64cells_relational", cents_s, inv_s, t_build_s,
             cells_stride),
            ("trained_sqrtn_codebook_unbalanced", cents_t, inv_t,
             t_build_t, cells_trained),
            ("trained_sqrtn_codebook_balanced_r11", cents_b, inv_b,
             t_build_b, cells_balanced),
        ):
            stats = S.ivf_cell_stats(inv)
            # timed at BOTH n_probe=4 and 8: the √n codebook slices the
            # corpus finer, so its served recall point sits at a higher
            # n_probe than the 64-cell tier — time both so the serving
            # config (recall ≥ 0.95) has an honest cost
            timed = {}
            for np_t in (n_probe, 8):
                qts = []
                for _ in range(3):
                    t0 = time.monotonic()
                    approx = collect_pairs(S.ivf_topk(
                        corpus, queries, k=K, n_probe=np_t,
                        prebuilt=(cents, inv),
                    ))
                    qts.append(time.monotonic() - t0)
                timed[np_t] = (statistics.median(qts), approx)
            t_q = timed[n_probe][0]
            recall_curve = {}
            for np_, (_, got) in timed.items():
                recall_curve[str(np_)] = round(
                    len(got & exact) / max(len(exact), 1), 4)
            # recall-only points (single pass)
            for np_ in (1, 2):
                got = collect_pairs(S.ivf_topk(
                    corpus, queries, k=K, n_probe=np_,
                    prebuilt=(cents, inv),
                ))
                recall_curve[str(np_)] = round(
                    len(got & exact) / max(len(exact), 1), 4)
            run["tiers"][name] = {
                "cells": cells,
                "sec_build_once": round(t_build, 2),
                "sec_query_per_batch_nprobe4": round(t_q, 2),
                "sec_query_per_batch_nprobe8": round(timed[8][0], 2),
                "query_speedup_vs_brute": round(t_brute / t_q, 1),
                "query_speedup_vs_brute_nprobe8": round(
                    t_brute / timed[8][0], 1),
                "build_amortizes_after_batches": max(
                    1, round(t_build / max(t_brute - t_q, 1e-9))),
                "recall_at_k_by_nprobe": dict(sorted(
                    recall_curve.items(), key=lambda kv: int(kv[0]))),
                "cell_skew": {
                    "min": int(stats["min"]), "max": int(stats["max"]),
                    "mean": round(float(stats["mean"]), 1),
                    "p99": round(float(stats["p99"]), 1),
                    "max_over_mean": round(stats["max_over_mean"], 2),
                },
            }
            print(json.dumps({"n": n, "tier": name,
                              **run["tiers"][name]}))
        out["runs"].append(run)

    tag = "_".join(str(x) for x in sizes)
    with open(os.path.join(ROOT, f"BENCH_ann_scale_r11_{tag}.json"), "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps({k: v for k, v in out.items() if k != "runs"}))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv))
