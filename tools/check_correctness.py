#!/usr/bin/env python
"""Local mirror of the driver's t2 correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB over the same parquet tables, then compares:
  - row count
  - schema (sorted column names)
  - order-insensitive value hash (columns sorted by name, cells
    canonicalized, rows sorted, sha256)

Usage:
    python tools/check_correctness.py [query ...]
    SPARK_GRAFT_CHECK_SF=/root/testdata/sf0.01 python tools/check_correctness.py
"""

from __future__ import annotations

import datetime
import hashlib
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

SF_DIR = os.environ.get("SPARK_GRAFT_CHECK_SF", "/root/testdata/sf0.001")
TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def canon_cell(v) -> str:
    if v is None:
        return "\0NULL"
    if isinstance(v, bool):
        return f"b:{int(v)}"
    if isinstance(v, float):
        if math.isnan(v):
            return "f:nan"
        return f"f:{v!r}"
    if isinstance(v, int):
        return f"i:{v}"
    if isinstance(v, datetime.datetime):
        return "t:" + v.isoformat()
    if isinstance(v, datetime.date):
        return "d:" + v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon_cell(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(
            f"{k}={canon_cell(v[k])}" for k in sorted(v)
        ) + "}"
    return "s:" + str(v)


def canonicalize(columns: list[str], rows) -> tuple[int, list[str], str]:
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    sorted_cols = [columns[i] for i in order]
    canon_rows = sorted(
        "|".join(canon_cell(row[i]) for i in order) for row in rows
    )
    digest = hashlib.sha256("\n".join(canon_rows).encode()).hexdigest()
    return len(canon_rows), sorted_cols, digest


def main() -> int:
    only = set(sys.argv[1:])

    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()

    from data_pipeline_package_for_python_spark.session import get_spark

    spark = get_spark(app_name="check-correctness")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')"
        )

    failures, checked, weak = [], 0, 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"spark error: {e}"))
            print(f"FAIL  {name}: spark error: {e}")
            continue
        oracle = oracles.get(name)
        if oracle is None:
            weak += 1
            print(f"weak  {name}: rows-only ({len(srows)} rows, "
                  f"{time.time()-t0:.1f}s)")
            continue
        try:
            res = con.execute(oracle)
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"duckdb error: {e}"))
            print(f"FAIL  {name}: duckdb error: {e}")
            continue
        sn, sc, sh = canonicalize(scols, srows)
        dn, dc, dh = canonicalize(dcols, drows)
        checked += 1
        if sc != dc:
            failures.append((name, f"schema: spark={sc} duckdb={dc}"))
            print(f"FAIL  {name}: schema mismatch\n  spark:  {sc}\n  duckdb: {dc}")
        elif sn != dn:
            failures.append((name, f"rowcount: spark={sn} duckdb={dn}"))
            print(f"FAIL  {name}: rowcount spark={sn} duckdb={dn}")
        elif sh != dh:
            failures.append((name, "value hash mismatch"))
            print(f"FAIL  {name}: value hash mismatch ({sn} rows)")
            # print a small diff sample to debug
            sset = set("|".join(canon_cell(r[i]) for i in
                       sorted(range(len(scols)), key=lambda i: scols[i]))
                       for r in srows)
            dset = set("|".join(canon_cell(r[i]) for i in
                       sorted(range(len(dcols)), key=lambda i: dcols[i]))
                       for r in drows)
            for s in list(sset - dset)[:3]:
                print(f"    spark-only:  {s}")
            for s in list(dset - sset)[:3]:
                print(f"    duckdb-only: {s}")
        else:
            print(f"ok    {name} ({sn} rows, {time.time()-t0:.1f}s)")

    print(f"\n{checked} hash-checked, {weak} rows-only, "
          f"{len(failures)} failures @ {SF_DIR}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
