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

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

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


# --- streaming variant: offset-managed micro-batch source ------------------

STREAM_BATCH_ROWS = 500
STREAM_MAX_ROWS = 2000


class SyntheticSignalsStreamSource(DataSource):
    """Streaming twin of the batch source: a custom
    `DataSourceStreamReader` with explicit offset management — the
    Python form of a Kafka-like micro-batch source.  Offsets are
    `{"idx": n}`; every trigger advances the high-watermark by
    STREAM_BATCH_ROWS until STREAM_MAX_ROWS, and `partitions(start,
    end)` splits each batch's index range into two InputPartitions so
    even a single micro-batch scans in parallel.

    Row content depends ONLY on the global index (md5(i)), never on
    batch boundaries — so however the trigger slices the offsets, the
    drained stream equals the deterministic regeneration
    (tests/test_streaming.py pins stream == closed form)."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_signals_stream"

    def schema(self) -> str:
        return "i int, key string, val double"

    def streamReader(self, schema):
        return _SyntheticStreamReader()


def _gen_row(i: int):
    import hashlib

    h = hashlib.md5(f"{i}".encode()).hexdigest()
    return (i, h[:2], int(h[2:10], 16) / 4294967296.0)


class _SyntheticStreamReader(DataSourceStreamReader):
    def __init__(self):
        self._watermark = 0

    def initialOffset(self):
        return {"idx": 0}

    def latestOffset(self):
        # Offsets must stay MONOTONIC across checkpoint restarts: a
        # fresh reader instance starts _watermark at 0, but the engine
        # may resume from a committed offset > 0 — without the clamp in
        # partitions() below, end < start would yield reversed/empty
        # ranges and a silently stalled stream.  commit() re-seeds the
        # in-memory watermark from the engine's durable progress so the
        # next latestOffset() continues from where the checkpoint left
        # off rather than replaying from zero.
        self._watermark = min(self._watermark + STREAM_BATCH_ROWS, STREAM_MAX_ROWS)
        return {"idx": self._watermark}

    def partitions(self, start, end):
        lo = start["idx"]
        hi = max(end["idx"], lo)  # never a reversed range, even mid-recovery
        # partitions() is the first place a restarted reader SEES the
        # checkpoint's offsets — fast-forward the watermark so the next
        # latestOffset() advances from the restored position instead of
        # replaying from zero.
        self._watermark = max(self._watermark, hi)
        mid = (lo + hi) // 2
        return [InputPartition((lo, mid)), InputPartition((mid, hi))]

    def read(self, partition):
        lo, hi = partition.value
        for i in range(lo, hi):
            yield _gen_row(i)

    def commit(self, end):
        # Durable-progress callback: keep the in-memory watermark at
        # least at the committed offset (restart-safe monotonicity).
        self._watermark = max(self._watermark, end["idx"])

    def stop(self):
        pass
