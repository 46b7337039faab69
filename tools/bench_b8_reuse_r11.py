#!/usr/bin/env python
"""A/B: near_dedup_minhash signature-subtree reuse experiment (r11 s2).

The executed (AQE-final) plan of ``dedup_near_minhash`` contains the
shingle+md5+minhash chain FOUR times as written: twice with the 16
signature mins (streamed band side + broadcast band side) and twice
shingle-array-only (the two verify lookups).  Runtime exchange reuse
collapses some of those; this harness measures how many actually
execute, then A/Bs the current shape against variants that force the
chain under a reusable exchange:

  A  current shape (ensure_parallel round-robin below the chain)
  B  sigs.repartition(id) above the chain — ONE exchange carries
     (id, __sh_arr, s0..s15); every consumer reuses it
  C  REPARTITION(band_key) on the bands CTE only — dedupes the
     signature chain across the two band-join sides, leaves the
     verify lookups on broadcast reuse

Timed with the noop sink (guide §1.4), interleaved A/B/C per round,
median of N.  Results must stay hash-identical — verified separately
via tools/check_correctness.py (the variants only move exchanges).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
RUNS = int(os.environ.get("RUNS", "7"))


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    from data_pipeline_package_for_python_spark.operators import dedup
    from data_pipeline_package_for_python_spark.session import get_spark

    spark = get_spark(app_name="b8-reuse-ab")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")

    def variant_a():
        return dedup.near_dedup_minhash(
            docs, "doc_id", "text", threshold=0.1
        )

    def _sql_tail(sigs, threshold=0.1, bands=4, num_hashes=16,
                  band_hint="", sig_repart=False):
        if sig_repart:
            sigs = sigs.repartition("id")
        sig_cols = [c for c in sigs.columns if c not in ("id", "__sh_arr")]
        band_src = (
            f"SELECT {band_hint} id, "
            + dedup._band_explode_sql(sig_cols, bands, num_hashes // bands)
            + " FROM {sigs}"
        )
        return sigs.sparkSession.sql(
            f"""
            WITH bands AS ({band_src}),
            cand AS (
              SELECT DISTINCT a.id AS id_a, b.id AS id_b
              FROM bands a JOIN bands b USING (band_key)
              WHERE a.id < b.id
            ),
            scored AS (
              SELECT c.id_a, c.id_b,
                     size(array_intersect(sa.__sh_arr, sb.__sh_arr))
                       AS n_common,
                     size(sa.__sh_arr) AS __na, size(sb.__sh_arr) AS __nb
              FROM cand c
              JOIN {{sigs}} sa ON sa.id = c.id_a
              JOIN {{sigs}} sb ON sb.id = c.id_b
            )
            SELECT id_a, id_b,
                   n_common / (__na + __nb - n_common) AS jaccard
            FROM scored
            WHERE n_common / (__na + __nb - n_common)
                  >= CAST({threshold!r} AS DOUBLE)
            """,
            sigs=sigs,
        )

    def fresh_sigs():
        arrs = dedup._shingle_arrays(docs, "doc_id", "text", 3)
        return dedup._signatures_from_arrays(arrs, num_hashes=16)

    def variant_b():
        return _sql_tail(fresh_sigs(), sig_repart=True)

    def variant_c():
        return _sql_tail(
            fresh_sigs(), band_hint="/*+ REPARTITION(64, band_key) */"
        )

    variants = {"A_current": variant_a, "B_sig_repart": variant_b,
                "C_band_repart": variant_c}

    # --- how many times does the md5 chain execute in the final plan? ---
    reuse_report = {}
    for name, fn in variants.items():
        df = fn()
        noop(df)  # materialize so AQE finalizes
        final = df._jdf.queryExecution().executedPlan().toString()
        reuse_report[name] = {
            "reused_exchanges": final.count("ReusedExchange"),
            "md5_chain_instances": final.count("md5("),
        }
        print(name, reuse_report[name], file=sys.stderr)

    # --- interleaved timing ---
    times: dict[str, list[float]] = {k: [] for k in variants}
    for fn in variants.values():  # warm-up round, discarded
        noop(fn())
    for _ in range(RUNS):
        for name, fn in variants.items():
            t0 = time.perf_counter()
            noop(fn())
            times[name].append(time.perf_counter() - t0)
    med = {k: round(statistics.median(v), 4) for k, v in times.items()}
    out = {
        "metric": "b8_reuse_ab",
        "sf_dir": SF_DIR,
        "runs": RUNS,
        "median_sec": med,
        "all_times": {k: [round(x, 4) for x in v] for k, v in times.items()},
        "reuse": reuse_report,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
