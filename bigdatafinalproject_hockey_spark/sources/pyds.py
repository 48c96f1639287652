"""Custom connector via the Python Data Source API (Spark 4,
SPARK-44076): the extension point for sources Spark has no built-in
reader for (internal services, proprietary formats, synthetic
generators) written in pure Python but planned and parallelized by
the engine like any other scan.

The demo source is a deterministic row generator — the "load a
benchmark/synthetic corpus straight into executors" case — but the
structure is the general one:

- ``DataSource.schema()`` declares the typed schema Catalyst plans
  against (projection pruning works like any scan).
- ``DataSourceReader.partitions()`` returns one InputPartition per
  row-range split: THIS is where a real connector encodes its
  parallelism (file chunks, kafka partitions, shard ids). Spark
  schedules one task per partition — reads happen executor-side,
  never through the driver.
- ``read(partition)`` yields that split's rows only; splits are
  disjoint, so the result is independent of scheduling order.

Rows derive from the row id by Knuth's multiplicative hash
(id · 2654435761 mod 2^32) — pure integer arithmetic any SQL engine
reproduces exactly, so the scan is value-checkable end to end.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

KNUTH = 2654435761
MOD32 = 1 << 32
LABELS = ["alpha", "beta", "gamma", "delta", "epsilon"]


class RangeRowsPartition(InputPartition):
    def __init__(self, start: int, end: int) -> None:
        self.start = start
        self.end = end


class RangeRowsReader(DataSourceReader):
    def __init__(self, options) -> None:
        self.n_rows = int(options.get("n_rows", "1000"))
        self.n_parts = int(options.get("n_parts", "8"))

    def partitions(self):
        step = max(1, -(-self.n_rows // self.n_parts))
        return [
            RangeRowsPartition(lo, min(lo + step, self.n_rows))
            for lo in range(0, self.n_rows, step)
        ]

    def read(self, partition: RangeRowsPartition):
        for i in range(partition.start, partition.end):
            h = (i * KNUTH) % MOD32
            yield (i, h, LABELS[h % 5])


class RangeRowsDataSource(DataSource):
    """``spark.read.format("range_rows").option("n_rows", ...)``."""

    @classmethod
    def name(cls) -> str:
        return "range_rows"

    def schema(self) -> str:
        return "id bigint, h bigint, label string"

    def reader(self, schema) -> RangeRowsReader:
        return RangeRowsReader(self.options)


def register_range_rows(spark) -> None:
    """Idempotent registration (re-registering is a no-op overwrite)."""
    spark.dataSource.register(RangeRowsDataSource)


class RangeRowsStreamReader(SimpleDataSourceStreamReader):
    """Micro-batch reader over the same deterministic generator: the
    offset is simply the next unread row position, advanced
    ``batch_rows`` per micro-batch. ``readBetweenOffsets`` replays any
    committed range on recovery — the method a real connector backs
    with its retention window (kafka offsets, log sequence numbers);
    here replay is pure recomputation, so recovery is always exact."""

    def __init__(self, options) -> None:
        self.n_rows = int(options.get("n_rows", "2000"))
        self.batch = int(options.get("batch_rows", "500"))

    def initialOffset(self):
        return {"pos": 0}

    def _rows(self, start: int, end: int):
        # Materialized list, not a generator: the runtime's prefetch
        # cache copy.copy()s the returned iterator, and generators
        # aren't copyable (TypeError: cannot pickle 'generator').
        return [
            (i, (i * KNUTH) % MOD32, LABELS[((i * KNUTH) % MOD32) % 5])
            for i in range(start, end)
        ]

    def read(self, start):
        s = start["pos"]
        e = min(s + self.batch, self.n_rows)
        return iter(self._rows(s, e)), {"pos": e}

    def readBetweenOffsets(self, start, end):
        return iter(self._rows(start["pos"], end["pos"]))


class RangeRowsStreamDataSource(DataSource):
    """``spark.readStream.format("range_rows_stream")`` — the
    streaming face of the connector."""

    @classmethod
    def name(cls) -> str:
        return "range_rows_stream"

    def schema(self) -> str:
        return "id bigint, h bigint, label string"

    def simpleStreamReader(self, schema) -> RangeRowsStreamReader:
        return RangeRowsStreamReader(self.options)


def register_range_rows_stream(spark) -> None:
    spark.dataSource.register(RangeRowsStreamDataSource)
