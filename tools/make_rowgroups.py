#!/usr/bin/env python
"""Rewrite a bench fixture directory with multi-row-group parquet.

Why: every parquet file the driver ships (sf0.001/0.01/0.1) is a SINGLE
row group, so scan parallelism is 1 task/table for BOTH engines (Spark
splits parquet by row group; so does DuckDB).  That caps the 8-vs-32-core
bench axis at ≈1 for every query — the fixture's file layout, not the
operators (VERDICT r11 "what's wrong" #1 / "next round" #1).  This tool
derives a byte-identical-content copy whose files carry >= GROUPS row
groups each, under a caller-chosen directory, WITHOUT touching
/root/testdata (read-only) or bench.py (driver contract).

Rows, values and row ORDER are preserved exactly — only the row-group
boundaries move — so every query result, oracle hash and bench semantics
are unchanged; the copy only restores the scan parallelism a real 100 TB
layout (thousands of row groups) always has.

Usage:
    python tools/make_rowgroups.py [SRC] [DST] [GROUPS]
    # defaults: SRC=/root/testdata/sf0.1  DST=<repo>/.testdata/rg32/sf0.1
    #           GROUPS=32 (one per local core; VERDICT asked >= 8)
Then:
    SPARK_GRAFT_SF_DIR=<DST> SPARK_GRAFT_CPUS={8,32} python bench.py

Name DST so its basename stays ``sf<float>`` — bench.py parses the scale
factor from it.
"""

from __future__ import annotations

import math
import os
import sys

import pyarrow.parquet as pq

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def rewrite(src: str, dst: str, groups: int) -> None:
    os.makedirs(dst, exist_ok=True)
    for name in sorted(os.listdir(src)):
        if not name.endswith(".parquet"):
            continue
        in_path = os.path.join(src, name)
        out_path = os.path.join(dst, name)
        table = pq.read_table(in_path)
        n = table.num_rows
        # ceil so we never exceed ``groups`` row groups; the 256-row
        # floor keeps tiny dimension tables (region: 5 rows, nation: 25)
        # from degenerating into 1-row groups — at 100 TB dimensions are
        # still small single-group files, so mirroring that is the
        # honest layout.
        per_group = max(256, math.ceil(n / groups))
        pq.write_table(table, out_path, row_group_size=per_group)
        got = pq.ParquetFile(out_path).metadata.num_row_groups
        print(f"{name}: {n} rows -> {got} row groups "
              f"({per_group} rows/group)")


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.path.join(ROOT, ".testdata", "rg32", "sf0.1")
    )
    groups = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    rewrite(src, dst, groups)


if __name__ == "__main__":
    main()
