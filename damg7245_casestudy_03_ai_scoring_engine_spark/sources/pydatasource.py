"""Custom Python DataSource (Spark 4 `pyspark.sql.datasource` API) —
the engine's source-extension surface (SURVEY.md §2.1 extension).

A deterministic synthetic-signals source: every row is derived from
md5(partition|index), so (a) the source needs NO external state,
(b) each InputPartition generates independently (the distributed
source contract — partitions() fans the scan out exactly like file
splits), and (c) a SQL oracle can REGENERATE the same rows and verify
the scan end-to-end.

At scale the identical skeleton wraps any per-partition-iterable
system (a REST cursor per shard, a Kafka partition, a range of a
key-value store) — partitions() enumerates shards, read() streams
one shard.
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

N_PARTS = 4
ROWS_PER_PART = 2000


class SyntheticSignalsDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "synthetic_signals"

    def schema(self) -> str:
        return "part int, i int, key string, val double"

    def reader(self, schema):
        return _SyntheticReader()


class _SyntheticReader(DataSourceReader):
    def partitions(self):
        return [InputPartition(p) for p in range(N_PARTS)]

    def read(self, partition):
        import hashlib

        p = partition.value
        for i in range(ROWS_PER_PART):
            h = hashlib.md5(f"{p}|{i}".encode()).hexdigest()
            yield (p, i, h[:2], int(h[2:10], 16) / 4294967296.0)
