"""§2 A-ext — custom connector via the Spark 4 Python Data Source API.

The reference ships pluggable source connectors (CSV exports, HTTP-ish
feeds — SURVEY §2 A); Spark 4's ``pyspark.sql.datasource`` is the
idiomatic extension point for a source Spark lacks natively. This module
implements a deterministic generator source ("seqgen") demonstrating the
full surface: options, schema declaration, partition planning (the source
reports P ``InputPartition``s, so the scan parallelizes across executors
with NO driver materialization — each task generates only its slice), and
per-partition iteration.

The same shape carries a real paginated-API or message-feed connector at
100 TB: partitions = page ranges / shard ids, ``read`` streams one
partition's rows, and Spark handles distribution, retries, and the
downstream plan. Rows are generated lazily per partition — memory is O(1)
per task regardless of n.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)


class _SeqPartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start, self.end = start, end


class _SeqReader(DataSourceReader):
    def __init__(self, options):
        self.n = int(options.get("n", "1000"))
        self.p = int(options.get("partitions", "8"))

    def partitions(self):
        step = (self.n + self.p - 1) // self.p
        return [
            _SeqPartition(i, min(i + step, self.n))
            for i in range(0, self.n, step)
        ]

    def read(self, partition: _SeqPartition):
        for i in range(partition.start, partition.end):
            yield (i, i * i, f"row-{i}")


class SeqDataSource(DataSource):
    """``spark.read.format("seqgen").option("n", N)`` → (id, square, label)."""

    @classmethod
    def name(cls) -> str:
        return "seqgen"

    def schema(self) -> str:
        return "id bigint, square bigint, label string"

    def reader(self, schema) -> _SeqReader:
        return _SeqReader(self.options)

    def streamReader(self, schema) -> "_SeqStreamReader":
        return _SeqStreamReader(self.options)


def ensure_registered(spark) -> None:
    """Register the seqgen source with this session. Unconditional:
    ``dataSource.register`` is an idempotent overwrite, and caching on
    ``id(spark)`` is unsound — CPython recycles addresses, so a new
    session allocated where a dead one lived would silently skip
    registration (r13 review)."""
    spark.dataSource.register(SeqDataSource)


class _SeqStreamReader(DataSourceStreamReader):
    """Streaming half of the connector (Spark 4
    ``DataSourceStreamReader``): offsets are row positions; each
    micro-batch covers [start.pos, end.pos), planned as up to ``p``
    InputPartitions so the batch parallelizes across executors exactly
    like the batch scan. ``latestOffset`` advances ``batch_rows`` per
    call up to ``n`` — a bounded deterministic feed (a paginated API /
    shard-cursor message source at 100 TB has this exact shape: offsets
    = cursors, partitions = page ranges, ``commit`` = cursor ack)."""

    def __init__(self, options):
        self.n = int(options.get("n", "1000"))
        self.batch = int(options.get("batch_rows", "250"))
        self.p = int(options.get("partitions", "4"))
        self._pos = 0

    def initialOffset(self):
        return {"pos": 0}

    def latestOffset(self):
        self._pos = min(self._pos + self.batch, self.n)
        return {"pos": self._pos}

    def partitions(self, start, end):
        s, e = int(start["pos"]), int(end["pos"])
        if e <= s:
            return [_SeqPartition(s, s)]
        step = max(1, (e - s + self.p - 1) // self.p)
        return [
            _SeqPartition(i, min(i + step, e)) for i in range(s, e, step)
        ]

    def read(self, partition: _SeqPartition):
        for i in range(partition.start, partition.end):
            yield (i, i * i, f"row-{i}")

    def commit(self, end):
        pass  # cursor ack seam — nothing to release for a generator

    def stop(self):
        pass
