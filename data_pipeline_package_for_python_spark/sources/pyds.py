"""Python DataSource API (Spark 4): a custom batch source.

The DataSource API is how this engine grows sources Spark doesn't ship
— internal feeds, bespoke formats, synthetic generators — without JVM
code: implement ``DataSource``/``DataSourceReader`` in Python, register
on the session, and ``spark.read.format(name)`` plans it like any other
source, with partitions becoming tasks.

``SynthRangeDataSource`` is the proof-of-wiring: a deterministic,
seedless synthetic table (id, bucket, val) whose rows are a pure
function of the row index, split into ``partitions`` independent input
partitions.  Each partition generates its own index range, so the
source scales horizontally exactly like a real one (no partition ever
materializes another's rows, nothing routes through the driver).  The
Knuth-multiplier formula is plain 64-bit integer arithmetic, so any
engine can reproduce it exactly — which is what the DuckDB oracle does.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
)

__all__ = [
    "SynthRangeDataSource",
    "SynthStreamDataSource",
    "register_synth_range",
    "register_synth_stream",
]

_KNUTH = 2654435761
_MOD = 1000000007


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class _SynthRangeReader(DataSourceReader):
    def __init__(self, options: dict):
        self.n = int(options.get("n", 1000))
        self.n_parts = max(1, int(options.get("partitions", 8)))
        self.n_buckets = int(options.get("buckets", 8))

    def partitions(self):
        step = -(-self.n // self.n_parts)  # ceil
        return [
            _RangePartition(lo, min(lo + step, self.n))
            for lo in range(0, self.n, step)
        ]

    def read(self, partition: _RangePartition):
        nb = self.n_buckets
        for i in range(partition.start, partition.end):
            yield (i, i % nb, (i * _KNUTH) % _MOD)


class SynthRangeDataSource(DataSource):
    """``spark.read.format("synthrange").option("n", N)`` → N rows of
    (id, bucket, val), generated partition-parallel."""

    @classmethod
    def name(cls) -> str:
        return "synthrange"

    def schema(self) -> str:
        return "id BIGINT, bucket BIGINT, val BIGINT"

    def reader(self, schema) -> DataSourceReader:
        return _SynthRangeReader(self.options)


def register_synth_range(spark) -> None:
    """Idempotent session registration (latest registration wins)."""
    spark.dataSource.register(SynthRangeDataSource)


# ---------------------------------------------------------------------- #
# Python DataSource WRITER — the sink half of the API: executors each    #
# write their partition to an independent jsonl file (no cross-task      #
# coordination, no driver routing), the standard parallel-sink shape.    #
# ---------------------------------------------------------------------- #

from pyspark.sql.datasource import DataSourceWriter, WriterCommitMessage  # noqa: E402


class _JsonLinesCommit(WriterCommitMessage):
    def __init__(self, path: str, n_rows: int):
        self.path = path
        self.n_rows = n_rows


class _JsonLinesWriter(DataSourceWriter):
    def __init__(self, options: dict):
        self.path = options["path"]

    def write(self, iterator):
        """Executor-side: stream THIS partition's rows to its own file.

        Atomicity discipline: write to a ``.inprogress`` name and let
        ``commit`` rename — a failed/speculative task never leaves a
        half-file that a reader would pick up."""
        import json
        import os

        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        os.makedirs(self.path, exist_ok=True)
        final = os.path.join(self.path, f"part-{pid:05d}.jsonl")
        tmp = final + ".inprogress"
        n = 0
        with open(tmp, "w") as f:
            for row in iterator:
                f.write(json.dumps(row.asDict(), sort_keys=True) + "\n")
                n += 1
        return _JsonLinesCommit(tmp, n)

    def commit(self, messages):
        """Driver-side: promote every task's .inprogress file — the
        two-phase protocol that makes the sink all-or-nothing."""
        import os

        for m in messages:
            os.replace(m.path, m.path[: -len(".inprogress")])

    def abort(self, messages):
        import os

        for m in messages:
            try:
                os.remove(m.path)
            except OSError:
                pass


class JsonLinesSinkDataSource(DataSource):
    """``df.write.format("dpp_jsonl").option("path", ...)`` sink."""

    @classmethod
    def name(cls) -> str:
        return "dpp_jsonl"

    def writer(self, schema, overwrite: bool):
        return _JsonLinesWriter(self.options)


def register_jsonl_sink(spark) -> None:
    """Idempotently register the jsonl sink on the session."""
    spark.dataSource.register(JsonLinesSinkDataSource)


# ---------------------------------------------------------------------- #
# streaming source                                                       #
# ---------------------------------------------------------------------- #

from pyspark.sql.datasource import SimpleDataSourceStreamReader  # noqa: E402


class _SynthStreamReader(SimpleDataSourceStreamReader):
    """Offset-tracked streaming twin of ``_SynthRangeReader``: each
    micro-batch advances the offset by ``batch_rows`` until ``n`` rows
    have been produced, then reports no progress — which is exactly the
    signal Trigger.AvailableNow needs to terminate a drain.

    Rows are the same pure function of the global row index as the
    batch source, so (a) replays from any committed offset are
    idempotent — the exactly-once contract a custom streaming source
    must honor, offsets ARE the state — and (b) a DuckDB oracle can
    reproduce the full drained stream from the closed formula.
    """

    def __init__(self, options: dict):
        self.n = int(options.get("n", 1000))
        self.batch_rows = max(1, int(options.get("batch_rows", 100)))
        self.n_buckets = int(options.get("buckets", 8))

    def initialOffset(self) -> dict:
        return {"i": 0}

    def read(self, start: dict):
        lo = int(start["i"])
        hi = min(lo + self.batch_rows, self.n)
        nb = self.n_buckets
        # A LIST ITERATOR, precisely: the runtime's prefetch cache
        # requires an iterator (it next()s it) AND copy.copy()s it when
        # re-planning — generators satisfy neither, bare lists fail the
        # iterator check, list_iterator satisfies both.
        rows = [(i, i % nb, (i * _KNUTH) % _MOD) for i in range(lo, hi)]
        return iter(rows), {"i": hi}

    def readBetweenOffsets(self, start: dict, end: dict):
        nb = self.n_buckets
        for i in range(int(start["i"]), int(end["i"])):
            yield (i, i % nb, (i * _KNUTH) % _MOD)


class SynthStreamDataSource(DataSource):
    """``spark.readStream.format("synthstream")`` → the deterministic
    (id, bucket, val) table as a bounded stream of ``batch_rows``-sized
    micro-batches."""

    @classmethod
    def name(cls) -> str:
        return "synthstream"

    def schema(self) -> str:
        return "id bigint, bucket bigint, val bigint"

    def simpleStreamReader(self, schema) -> _SynthStreamReader:
        return _SynthStreamReader(self.options)


def register_synth_stream(spark) -> None:
    spark.dataSource.register(SynthStreamDataSource)


# ---------------------------------------------------------------------- #
# streaming sink                                                         #
# ---------------------------------------------------------------------- #

from pyspark.sql.datasource import DataSourceStreamWriter  # noqa: E402


class _JsonLinesStreamWriter(DataSourceStreamWriter):
    """Streaming half of the jsonl sink: the same two-phase
    .inprogress→rename protocol as the batch writer, but the COMMIT
    boundary is the micro-batch — ``commit(messages, batchId)`` stamps
    every task file of the epoch with the batch id in one driver-side
    pass, ``abort`` removes them, so a crashed epoch leaves nothing a
    reader would pick up and a replayed epoch (same batchId after
    recovery) overwrites its own files idempotently — the sink side of
    the exactly-once contract (source offsets + idempotent sink)."""

    def __init__(self, options: dict):
        self.path = options["path"]

    def write(self, iterator):
        import json
        import os
        import uuid

        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        os.makedirs(self.path, exist_ok=True)
        tmp = os.path.join(
            self.path, f".part-{pid:05d}-{uuid.uuid4().hex}.inprogress"
        )
        n = 0
        with open(tmp, "w") as f:
            for row in iterator:
                f.write(json.dumps(row.asDict(), sort_keys=True) + "\n")
                n += 1
        return _JsonLinesCommit(tmp, n)

    def commit(self, messages, batchId):
        import os
        import re

        for k, m in enumerate(messages):
            if m is None:
                continue
            final = os.path.join(
                self.path, f"batch-{batchId:05d}-part-{k:05d}.jsonl"
            )
            os.replace(m.path, final)
        # Idempotent-replay hygiene: a recovered epoch re-commits the
        # same batchId; files beyond this epoch's task count (from a
        # previous, larger attempt) would double-count — remove them.
        pat = re.compile(
            rf"batch-{batchId:05d}-part-(\d+)\.jsonl$"
        )
        for name in os.listdir(self.path):
            mt = pat.search(name)
            if mt and int(mt.group(1)) >= len(messages):
                os.remove(os.path.join(self.path, name))

    def abort(self, messages, batchId):
        import os

        for m in messages:
            if m is None:
                continue
            try:
                os.remove(m.path)
            except OSError:
                pass


class JsonLinesStreamSinkDataSource(DataSource):
    """``df.writeStream.format("dpp_jsonl_stream")`` sink."""

    @classmethod
    def name(cls) -> str:
        return "dpp_jsonl_stream"

    def streamWriter(self, schema, overwrite):
        return _JsonLinesStreamWriter(self.options)


def register_jsonl_stream_sink(spark) -> None:
    spark.dataSource.register(JsonLinesStreamSinkDataSource)
