#!/usr/bin/env python
"""Derive an sf1-scale bench dataset from the driver's sf0.1 fixtures.

BASELINE.md's round-3 decomposition showed that at sf0.1 every sub-second
bench query measures Spark's per-job scheduler constant (~70-105 ms),
not operator efficiency; the round-3 verdict asked for ONE sf1 bench
session to demonstrate the amortized regime (ratios converging toward
B8's 1.2-1.9x as real work grows past ~0.5 s/query).  The driver only
ships sf{0.001,0.01,0.1}, and /root/testdata is read-only, so this
script derives sf1 into ``<repo>/.testdata/sf1`` (gitignored).

Method — 10x key-offset replication, NOT resampling:

* ``customer`` / ``orders`` / ``lineitem``: replica *i* shifts every
  key column by ``i * (max_key + 1)`` (c_custkey; o_orderkey+o_custkey;
  l_orderkey).  Joins stay exactly as selective as sf0.1, per-key group
  sizes are UNCHANGED (each replica is a disjoint key universe), and
  value distributions (dates, prices, flags) are bit-identical — so a
  bench ratio at sf1 measures 10x the rows through the same plan
  shapes, which is precisely the scaling question.
* ``documents``: doc_id shifted the same way; replica i > 0 appends a
  ``" r<i>"`` suffix to ``text`` (and fixes up n_chars) so duplicate
  clusters replicate LINEARLY — verbatim replication would make every
  text a 10-way cross-replica duplicate and blow candidate-pair volume
  up ~100x, distorting B8 into a different workload, not a bigger one.
* ``region nation supplier part events embeddings``: copied as-is
  (dimension tables don't scale in TPC-H either; B1-B8 don't scan
  events/embeddings).

DuckDB does the replication (COPY ... TO parquet): one pass per table,
no Spark session involved, deterministic output.

Usage:  python tools/make_sf1.py [--force]
Then:   SPARK_GRAFT_SF_DIR=$REPO/.testdata/sf1 python bench.py
"""

from __future__ import annotations

import os
import shutil
import sys

import duckdb

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = os.environ.get("SPARK_GRAFT_SF_SRC", "/root/testdata/sf0.1")
# Knobs: SPARK_GRAFT_SF1_REPLICAS=30 SPARK_GRAFT_SF1_DST=.testdata/sf3
# reproduces the BASELINE.md round-4 B3 scaling-curve dataset.
DST = os.environ.get(
    "SPARK_GRAFT_SF1_DST", os.path.join(ROOT, ".testdata", "sf1")
)
REPLICAS = int(os.environ.get("SPARK_GRAFT_SF1_REPLICAS", "10"))

COPY_AS_IS = ("region", "nation", "supplier", "part", "events",
              "embeddings")


def main() -> None:
    if os.path.isdir(DST) and "--force" not in sys.argv:
        if os.path.exists(os.path.join(DST, "lineitem.parquet")):
            print(f"{DST} already exists (use --force to rebuild)")
            return
    os.makedirs(DST, exist_ok=True)
    con = duckdb.connect()

    def src(t: str) -> str:
        return f"read_parquet('{SRC}/{t}.parquet')"

    c_span = con.execute(
        f"SELECT max(c_custkey) + 1 FROM {src('customer')}"
    ).fetchone()[0]
    o_span = con.execute(
        f"SELECT max(o_orderkey) + 1 FROM {src('orders')}"
    ).fetchone()[0]
    d_span = con.execute(
        f"SELECT max(doc_id) + 1 FROM {src('documents')}"
    ).fetchone()[0]
    reps = f"(SELECT unnest(range({REPLICAS})) AS i)"

    jobs = {
        "customer": f"""
            SELECT c_custkey + i * {c_span} AS c_custkey,
                   c_name, c_nationkey, c_acctbal, c_mktsegment
            FROM {src('customer')} CROSS JOIN {reps}
        """,
        "orders": f"""
            SELECT o_orderkey + i * {o_span} AS o_orderkey,
                   o_custkey + i * {c_span} AS o_custkey,
                   o_orderstatus, o_totalprice, o_orderdate,
                   o_orderpriority
            FROM {src('orders')} CROSS JOIN {reps}
        """,
        "lineitem": f"""
            SELECT l_orderkey + i * {o_span} AS l_orderkey,
                   l_partkey, l_suppkey, l_linenumber, l_quantity,
                   l_extendedprice, l_discount, l_tax, l_returnflag,
                   l_linestatus, l_shipdate
            FROM {src('lineitem')} CROSS JOIN {reps}
        """,
        "documents": f"""
            SELECT doc_id + i * {d_span} AS doc_id,
                   CASE WHEN i = 0 THEN text
                        ELSE text || ' r' || CAST(i AS VARCHAR) END
                       AS text,
                   lang, source,
                   CASE WHEN i = 0 THEN n_chars
                        ELSE n_chars + 2 + len(CAST(i AS VARCHAR)) END
                       AS n_chars
            FROM {src('documents')} CROSS JOIN {reps}
        """,
    }
    for t, q in jobs.items():
        out = os.path.join(DST, f"{t}.parquet")
        con.execute(f"COPY ({q}) TO '{out}' (FORMAT parquet)")
        n = con.execute(f"SELECT count(*) FROM read_parquet('{out}')"
                        ).fetchone()[0]
        print(f"{t}: {n} rows -> {out}")
    for t in COPY_AS_IS:
        shutil.copyfile(
            os.path.join(SRC, f"{t}.parquet"),
            os.path.join(DST, f"{t}.parquet"),
        )
        print(f"{t}: copied as-is")


if __name__ == "__main__":
    main()
