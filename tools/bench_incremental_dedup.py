#!/usr/bin/env python
"""Incremental/cross-run dedup scale session (r8 verdict item 6).

The one LLM operator family without an sf3+ measurement: time
``incremental_dedup`` (plain LEFT ANTI on md5 digests) against the
Bloom-prefiltered path (``build_bloom`` + prefilter) at sf3 and sf10
with a planted new-batch split, and pin that the prefilter's bitmap
reduce stays fanin-bounded (driver traffic = fanin sketch-sized rows,
independent of corpus partitions).

Split construction (deterministic, hash-based): documents whose
``xxhash64(doc_id) % 10 < 9`` are the SEEN corpus; the rest are the
genuinely-new batch.  The incoming batch = genuinely-new rows UNION a
planted resample of seen rows (same text, fresh ids) — so the expected
output is exactly the genuinely-new rows, and both paths must agree.

Writes BENCH_incremental_dedup_r09.json at the repo root.

Usage: python tools/bench_incremental_dedup.py [sf3_dir] [sf10_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_one(spark, sf_name: str, sf_dir: str) -> dict:
    from data_pipeline_package_for_python_spark.operators.dedup import (
        BloomSketch,
        build_bloom,
        incremental_dedup,
    )

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    bucket = F.pmod(F.xxhash64("doc_id"), F.lit(10))
    seen = docs.filter(bucket < 9).localCheckpoint(eager=True)
    fresh = docs.filter(bucket >= 9)
    planted = (
        seen.filter(F.pmod(F.xxhash64("doc_id", F.lit(7)), F.lit(9)) == 0)
        .withColumn("doc_id", -F.col("doc_id"))
    )
    batch = fresh.unionByName(planted).localCheckpoint(eager=True)
    n_seen, n_batch = seen.count(), batch.count()
    n_fresh = fresh.count()

    # Path A: plain anti-join (runtime Bloom may inject its own probe)
    t0 = time.monotonic()
    a_rows = incremental_dedup(batch, seen, "text").count()
    t_anti = time.monotonic() - t0

    # Path B: explicit Bloom prefilter, built once per ingest epoch
    t0 = time.monotonic()
    sketch = build_bloom(
        seen.select(F.md5("text").alias("d")), "d",
        expected_items=n_seen, fpp=0.01,
    )
    t_build = time.monotonic() - t0
    t0 = time.monotonic()
    b_rows = incremental_dedup(batch, seen, "text", prefilter=sketch).count()
    t_pref = time.monotonic() - t0

    # Exactness, three independent facts:
    #  (1) both paths emit the SAME id multiset;
    #  (2) every planted duplicate (negative doc_id) is removed;
    #  (3) the output count equals batch minus an INDEPENDENTLY
    #      computed duplicate count (LEFT SEMI on the digest — a
    #      different join operator than the anti join under test).
    # NB: n_expected_new ("fresh" rows) overcounts — the synthetic
    # corpus contains cross-id duplicate TEXTS, so some fresh rows are
    # true dups of seen rows and are correctly dropped.
    ids_a = incremental_dedup(batch, seen, "text").select("doc_id")
    ids_b = incremental_dedup(
        batch, seen, "text", prefilter=sketch
    ).select("doc_id")
    sym_diff = ids_a.exceptAll(ids_b).count() + ids_b.exceptAll(ids_a).count()
    n_dups_semi = (
        batch.withColumn("__d", F.md5("text"))
        .join(
            seen.select(F.md5("text").alias("__d")).distinct(),
            "__d", "left_semi",
        ).count()
    )
    planted_survivors = ids_a.filter(F.col("doc_id") < 0).count()

    # Fanin bound: the partial-bitmap stage emits one row per input
    # partition, the OR-reduce collapses them to <= fanin rows before
    # the driver OR — sketch bytes are the ONLY driver traffic unit.
    m_bits, _k = BloomSketch.params(n_seen, 0.01)
    return {
        "sf": sf_name,
        "n_seen": n_seen,
        "n_batch": n_batch,
        "n_expected_new": n_fresh,
        "n_out_anti": a_rows,
        "n_out_bloom": b_rows,
        "n_dups_by_semi_join": n_dups_semi,
        "planted_survivors": planted_survivors,
        "paths_agree": (
            sym_diff == 0
            and a_rows == b_rows == n_batch - n_dups_semi
            and planted_survivors == 0
        ),
        "sketch_mb": round(m_bits / 8 / 1e6, 2),
        "driver_traffic_bound_mb": round(16 * m_bits / 8 / 1e6, 2),
        "sec_anti_join": round(t_anti, 2),
        "sec_bloom_build": round(t_build, 2),
        "sec_bloom_prefilter_dedup": round(t_pref, 2),
    }


def main() -> int:
    from data_pipeline_package_for_python_spark.session import get_spark

    sf3 = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        ROOT, ".testdata", "sf3")
    sf10 = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        ROOT, ".testdata", "sf10")

    spark = get_spark(app_name="bench-incremental-dedup")
    out = {
        "metric": "incremental_dedup_scale",
        "runs": [run_one(spark, "sf3", sf3), run_one(spark, "sf10", sf10)],
    }
    path = os.path.join(ROOT, "BENCH_incremental_dedup_r09.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
