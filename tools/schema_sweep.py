#!/usr/bin/env python
"""Plan-only DecimalType output sweep (r8 verdict item 2).

Builds every ``queries()`` entry's DataFrame at a tiny SF and inspects
``df.schema`` — no job execution, no collect — for DecimalType fields
in the FINAL output.  Any such column will hash-diverge under the
grading driver whenever its DuckDB oracle twin lands as float64
(pandas Decimal cells hash differently from floats), which is exactly
how `sql_pipe_syntax` went red in round 8.  Explicit DECIMAL(38)
intermediates inside a query are fine; this sweep proves they are all
cast back before the result surfaces.

Caveat: a handful of queries eagerly evaluate at plan-construction
time by design (connected-components checkpointing), so "plan-only"
still runs those pipelines — hence the sf0.001 default.

Usage: python tools/schema_sweep.py [sf_dir]
Exit 1 if any query's output schema contains a DecimalType.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql.types import ArrayType, DecimalType, MapType, StructType


def _decimal_paths(dt, path=""):
    if isinstance(dt, DecimalType):
        yield path or "<root>"
    elif isinstance(dt, StructType):
        for f in dt.fields:
            yield from _decimal_paths(f.dataType, f"{path}.{f.name}" if path else f.name)
    elif isinstance(dt, ArrayType):
        yield from _decimal_paths(dt.elementType, path + "[]")
    elif isinstance(dt, MapType):
        yield from _decimal_paths(dt.keyType, path + "<key>")
        yield from _decimal_paths(dt.valueType, path + "<val>")


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

    import __spark_entry__ as entrymod
    from data_pipeline_package_for_python_spark.session import get_spark

    spark = get_spark(app_name="schema-sweep")
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()

    offenders, errors, n = [], [], 0
    for name, fn in qs.items():
        try:
            df = fn(spark, sf_dir)
        except Exception as e:  # noqa: BLE001
            errors.append((name, f"{type(e).__name__}: {e}"))
            continue
        n += 1
        hits = list(_decimal_paths(df.schema))
        if hits:
            tag = "hash-checked" if name in oracles else "rows-only"
            offenders.append((name, tag, hits))
            print(f"DECIMAL  {name} ({tag}): {', '.join(hits)}")

    print(f"\n{n} schemas swept, {len(offenders)} with DecimalType outputs, "
          f"{len(errors)} errors @ {sf_dir}")
    for name, err in errors:
        print(f"  ERR {name}: {err[:160]}")
    return 1 if offenders or errors else 0


if __name__ == "__main__":
    raise SystemExit(main())
