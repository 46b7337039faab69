#!/usr/bin/env python
"""sf3 scale session for the LLM hot path: B8 + dedup_clusters.

The round-6 verdict (ask 3) wants the B8 scale curve extended one
notch past sf1 — the claim under test is that the Spark/DuckDB gap
WIDENS with scale (B8 was 1.54x at sf0.1, 0.18x at sf1) because
DuckDB's md5-minhash SQL scales super-linearly while the engine's
map-side signatures + banded LSH shuffle scale linearly — plus the
connected-components round count and per-round time at sf3.

Dataset: ``tools/make_sf1.py`` with SPARK_GRAFT_SF1_REPLICAS=30 into
``.testdata/sf3`` (same key-offset replication; duplicate clusters
replicate linearly — BASELINE.md round-4 protocol).

Protocol: one discarded Spark warm-up pass (JIT/codegen), then median
of 3 timed Spark runs per query.  The DuckDB control runs B8's two
oracles TWICE each (timed; first run doubles as its warm-up — DuckDB
has no JIT ramp and the page cache is already hot from the Spark
reads); the better of the two is the control number, and the
first-run timing is kept in the JSON so the choice is auditable.  The
dedup_clusters oracle (recursive-CTE transitive closure, quadratic
per cluster, declared oracle-scale-only) is NOT run at sf3.  Every
intermediate result is streamed to stderr as it lands, so a timeout
loses nothing measured.

The CC loop is additionally re-run instrumented: per-round
large-star/small-star + checksum wall time, using the operator's own
internals so the measured loop IS the shipped loop.

Prints ONE JSON line on stdout at the end.

Usage: python tools/bench_sf3_llm.py   # expects .testdata/sf3
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = os.environ.get(
    "SPARK_GRAFT_SF3_DIR", os.path.join(ROOT, ".testdata", "sf3")
)
RUNS = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
DUCK_RUNS = int(os.environ.get("SPARK_GRAFT_DUCK_RUNS", "2"))

B8 = ("dedup_exact", "dedup_near_minhash")
CC = "dedup_clusters"


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def main() -> None:
    import duckdb

    from data_pipeline_package_for_python_spark.queries import QUERIES
    from data_pipeline_package_for_python_spark.session import get_spark

    spark = get_spark(app_name="dpp-bench-sf3")
    spark.sparkContext.setLogLevel("ERROR")

    names = list(B8) + [CC]
    out: dict[str, dict] = {}

    # Spark warm-up + timed runs, streamed per query.
    for n in names:
        q = QUERIES[n]
        t0 = time.perf_counter()
        q.spark_fn(spark, SF_DIR).toPandas()
        log(f"warmup {n}: {time.perf_counter() - t0:.1f}s")
        s_times = []
        for _ in range(RUNS):
            t0 = time.perf_counter()
            rows = len(q.spark_fn(spark, SF_DIR).toPandas())
            s_times.append(time.perf_counter() - t0)
        out[n] = {
            "spark_sec": round(statistics.median(s_times), 3),
            "spark_runs": [round(t, 3) for t in s_times],
            "rows": rows,
        }
        log(f"{n}: spark={out[n]['spark_sec']}s rows={rows}")

    # DuckDB control, B8 only.
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF_DIR}/documents.parquet')"
    )
    for n in B8:
        d_times = []
        for i in range(DUCK_RUNS):
            t0 = time.perf_counter()
            con.execute(QUERIES[n].oracle).fetchall()
            d_times.append(round(time.perf_counter() - t0, 3))
            log(f"duckdb {n} run{i + 1}: {d_times[-1]}s")
        out[n]["duckdb_runs"] = d_times
        out[n]["duckdb_sec"] = min(d_times)
        out[n]["ratio"] = round(out[n]["spark_sec"] / min(d_times), 3)
        log(f"{n}: {out[n]}")

    # Instrumented CC loop: the shipped internals, timed per round.
    from pyspark.sql import functions as F

    from data_pipeline_package_for_python_spark.operators import dedup as D
    from data_pipeline_package_for_python_spark.operators.graph import (
        _edge_checksum,
        _large_star,
        _small_star,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    pairs = D.jaccard_similar_pairs(
        docs, "doc_id", "text", n=3, threshold=0.1, max_shingle_freq=None
    ).select("id_a", "id_b")
    edges = (
        pairs.select(
            F.col("id_a").cast("long").alias("u"),
            F.col("id_b").cast("long").alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    t0 = time.perf_counter()
    prev = _edge_checksum(edges)
    pair_build = time.perf_counter() - t0
    rounds = []
    for _ in range(25):
        t0 = time.perf_counter()
        edges = _small_star(_large_star(edges)).localCheckpoint(
            eager=False
        )
        cur = _edge_checksum(edges)
        rounds.append(round(time.perf_counter() - t0, 3))
        log(f"cc round {len(rounds)}: {rounds[-1]}s edges={cur[0]}")
        if cur == prev:
            break
        prev = cur
    out["cc_loop"] = {
        "n_edges": prev[0],
        "pair_build_plus_checksum_sec": round(pair_build, 3),
        "rounds": rounds,
        "n_rounds": len(rounds),
    }
    log(f"cc_loop: {out['cc_loop']}")

    b8_s = sum(out[n]["spark_sec"] for n in B8)
    b8_d = sum(out[n]["duckdb_sec"] for n in B8)
    print(
        json.dumps(
            {
                "metric": "bench_sf3_llm_hot_path",
                "sf": 3.0,
                "runs": RUNS,
                "b8_spark": round(b8_s, 3),
                "b8_duckdb": round(b8_d, 3),
                "b8_ratio": round(b8_s / b8_d, 3),
                "queries": out,
            }
        )
    )


if __name__ == "__main__":
    main()
