"""Prepared queries — pay the Catalyst front-end once, execute many.

BASELINE.md's round-3 decomposition measured that 0.05–0.12 s of every
freshly-built bench query is FRONT-END cost: py4j DataFrame
construction plus Catalyst analysis, a per-plan constant that does not
grow with data.  A real deployment runs the same report/pipeline shape
thousands of times; it should pay that constant once per statement,
like a prepared statement in any database.

``prepare(df)`` snapshots the query's ANALYZED logical plan on the
JVM.  Each :meth:`PreparedQuery.dataframe` call then mints a fresh
``Dataset`` from that plan in ~1–2 ms (one py4j call), skipping Python
construction and Catalyst analysis while leaving everything downstream
honest: the new handle owns a fresh ``QueryExecution``, so the
optimizer, physical planning, and AQE all run anew and NO shuffle
stages or files from a previous run are reused (re-collecting the
*same* DataFrame would reuse its materialized AQE query stages and
time only the final stage — the dishonest shortcut BASELINE.md
documents; this facility deliberately does not do that).

Semantics pinned by ``tests/test_plans.py``:

* results are identical to a freshly-built query;
* every ``dataframe()`` call yields an independent ``QueryExecution``;
* the analyzed plan is resolved AT PREPARE TIME — file listings,
  schemas, view definitions, and current-database context are frozen
  then, exactly like a database prepared statement (re-``prepare`` to
  pick up new partitions of an append-only table).

The reference system re-executes its whole eager pipeline per run
(/root/reference/dpp.py:337-376 walks the step list each call); a
prepared handle is the Spark-first counterpart for repeated execution.

Only the classic py4j runtime exposes ``Dataset.ofRows``; under Spark
Connect :func:`prepare` raises with a clear message rather than
silently degrading.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

__all__ = ["PreparedQuery", "prepare"]


def _dataset_class(jvm):
    """The concrete Dataset companion for this Spark's JVM layout.

    Spark 4 moved it to ``sql.classic``; Spark 3 has it at ``sql``.
    Probed structurally (py4j returns ``JavaPackage`` for a missing
    class, ``JavaClass`` for a real one) rather than by catching a bare
    Exception around the call — a genuine ``ofRows`` failure on Spark 4
    (e.g. an internal analysis error) must propagate as itself, not be
    retried down the 3.x path and re-raised as a confusing 'JavaPackage
    is not callable' (r7 advice)."""
    from py4j.java_gateway import JavaClass

    classic = jvm.org.apache.spark.sql.classic.Dataset
    if isinstance(classic, JavaClass):
        return classic
    return jvm.org.apache.spark.sql.Dataset  # Spark 3.x layout


def _of_rows(spark: SparkSession, j_logical_plan) -> DataFrame:
    """Fresh DataFrame from a JVM logical plan (classic runtime)."""
    jdf = _dataset_class(spark._jvm).ofRows(
        spark._jsparkSession, j_logical_plan
    )
    return DataFrame(jdf, spark)


class PreparedQuery:
    """A query whose analyzed plan is cached for repeated execution.

    Use :func:`prepare` (or ``Pipeline.prepare``) to construct one.
    """

    def __init__(self, spark: SparkSession, df: DataFrame):
        self._spark = spark
        # Forcing the schema runs Catalyst analysis exactly once, here.
        df.schema
        self._analyzed = df._jdf.queryExecution().analyzed()
        self.columns = list(df.columns)

    def dataframe(self) -> DataFrame:
        """A fresh execution handle over the prepared plan.

        Each call returns a new DataFrame with its own
        ``QueryExecution``: optimization, physical planning, and AQE
        run from scratch (honest re-execution), but Python-side
        construction and analysis are skipped.
        """
        return _of_rows(self._spark, self._analyzed)

    # Convenience executors — one fresh handle per call.
    def collect(self):
        return self.dataframe().collect()

    def toPandas(self):  # noqa: N802 - Spark naming
        return self.dataframe().toPandas()

    def count(self) -> int:
        return self.dataframe().count()


def prepare(df: DataFrame) -> PreparedQuery:
    """Prepare ``df`` for repeated execution (see module docstring)."""
    spark = df.sparkSession
    if not hasattr(spark, "_jsparkSession"):  # Spark Connect client
        raise RuntimeError(
            "prepare() requires the classic py4j runtime; the Spark "
            "Connect client does not expose Dataset.ofRows"
        )
    return PreparedQuery(spark, df)
