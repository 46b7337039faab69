#!/usr/bin/env python
"""BPE batched-training scale proof at sf1 (r8 verdict item 5).

Trains >=1k merges over the sf1 documents corpus with ``batch_m=256``
and records every distributed count pass: (pass_index, merges
committed, seconds).  The claim under test — a 32k-merge vocabulary
costs ~32k/batch_m count passes with FLAT per-pass cost — holds iff:

  * total passes ~= n_merges / (batch_m * fill), fill being the
    greedy disjoint-acceptance fill factor (conflicts defer, so
    fill <= 1); and
  * per-pass seconds do not trend upward as the symbol table grows
    (the working frame is capped at max_words rows and each pass is
    one zip-explode count + one map-only merge over it).

Writes BENCH_bpe_sf1_r09.json at the repo root.

Usage: python tools/bench_bpe_sf1.py [n_merges] [batch_m]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF1 = os.environ.get(
    "SPARK_GRAFT_SF1_DIR", os.path.join(ROOT, ".testdata", "sf1")
)


def main() -> int:
    n_merges = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    batch_m = int(sys.argv[2]) if len(sys.argv) > 2 else 256

    from data_pipeline_package_for_python_spark.operators.text import (
        bpe_train,
    )
    from data_pipeline_package_for_python_spark.session import get_spark

    import pyspark.sql.functions as F

    spark = get_spark(app_name="bench-bpe-sf1")
    raw = spark.read.parquet(os.path.join(SF1, "documents.parquet"))
    # The synthetic corpus has only 30 distinct words, so word-level
    # BPE saturates at ~90 merges regardless of SF (measured: the pair
    # supply dries up).  To exercise a >=1k-merge vocabulary with the
    # operator UNCHANGED, compound adjacent word pairs into single
    # tokens ("batch part" -> "batchpart"): 30^2 ~= 900 word types of
    # ~9 chars, deterministic and derived from the same sf1 text —
    # the realistic vocabulary-size regime the amortization claim is
    # about.  bpe_train's own pre-clean/tokenize runs on top as usual.
    toks = F.split(F.regexp_replace(F.lower("text"), "[^a-z ]", " "), " +")
    docs = raw.select(
        F.array_join(
            F.transform(
                F.sequence(F.lit(0), (F.size(toks) / 2 - 1).cast("int")),
                lambda i: F.concat(
                    F.element_at(toks, (i * 2 + 1).cast("int")),
                    F.element_at(toks, (i * 2 + 2).cast("int")),
                ),
            ),
            " ",
        ).alias("text")
    )
    n_docs = docs.count()  # warm the scan

    log: list[tuple[int, int, float]] = []
    t0 = time.monotonic()
    merges = bpe_train(
        docs, "text",
        n_merges=n_merges, batch_m=batch_m, max_words=20000,
        round_log=log,
    )
    n_learned = merges.count()
    total = time.monotonic() - t0

    secs = [s for _, _, s in log]
    fills = [c / batch_m for _, c, c_s in [(i, c, s) for i, c, s in log]]
    half = len(secs) // 2
    out = {
        "metric": "bpe_batched_sf1",
        "sf": 1,
        "n_docs": n_docs,
        "n_merges": n_learned,
        "batch_m": batch_m,
        "max_words": 20000,
        "passes": len(log),
        "ideal_passes": n_merges / batch_m,
        "fill_factor_mean": round(sum(fills) / len(fills), 3),
        "total_sec": round(total, 2),
        "sec_per_pass_median": round(statistics.median(secs), 3),
        "sec_per_pass_first_half_median": round(
            statistics.median(secs[:half]) if half else secs[0], 3),
        "sec_per_pass_second_half_median": round(
            statistics.median(secs[half:]), 3),
        "sec_per_merge": round(total / max(n_learned, 1), 4),
        "projected_32k_vocab_passes": round(
            32768 / (batch_m * (sum(fills) / len(fills)))),
        "projected_32k_vocab_sec": round(
            32768 / (batch_m * (sum(fills) / len(fills)))
            * statistics.median(secs)),
        "per_pass": [
            {"i": i, "committed": c, "sec": round(s, 3)}
            for i, c, s in log
        ],
    }
    path = os.path.join(ROOT, "BENCH_bpe_sf1_r09.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps({k: v for k, v in out.items() if k != "per_pass"}))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
