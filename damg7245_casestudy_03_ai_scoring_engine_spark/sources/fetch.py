"""Throttled document fetching (SURVEY.md §2.1 S1/S3) and binary
artifact sinks (S4/S21).

The reference downloads SEC filings with a client-side rate limit of
5 req/s (reference app/pipelines/sec_edgar.py:42-61) and writes the
raw bytes to data/raw/ or S3 (sec_edgar.py:144-162,
app/services/s3_storage.py:44-63).

This container has no network, so the fetch layer is dependency-
injected: `RateLimitedFetcher` takes any `fetch_fn(url) -> bytes`;
the default `http_fetch` stub raises NotImplementedError with clear
instructions (wire `urllib`/`requests` in a deployment).  The
throttle, retry accounting, and Spark-side plumbing are real and
unit-tested.

Scale posture: fetching runs on executors via `mapInPandas` so a
1000-executor cluster fetches in parallel — with the rate limit
applied PER PARTITION, so total request rate = partitions × limit;
cap partitions of the URL frame to respect the remote's global
budget (the reference's single-process 5 req/s maps to
`urls.repartition(1)` + limit 5, or N partitions × 5/N each).
"""

from __future__ import annotations

import time
from collections.abc import Callable, Iterator
from dataclasses import dataclass, field

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def http_fetch(url: str) -> bytes:
    """Network fetch stub — this environment has no egress.  Swap in
    urllib/requests in deployment; everything else in this module is
    network-agnostic."""
    raise NotImplementedError(
        "network fetch is not available in this environment; "
        "construct RateLimitedFetcher(fetch_fn=...) with a real client"
    )


@dataclass
class RateLimitedFetcher:
    """Token-bucket throttle around an injectable fetch function —
    the reference's `_throttle` loop (sec_edgar.py:42-61) made
    reusable.  `max_per_sec` is enforced with a monotonic-clock
    sleep, never busy-waiting."""

    fetch_fn: Callable[[str], bytes] = http_fetch
    max_per_sec: float = 5.0
    clock: Callable[[], float] = time.monotonic
    sleep: Callable[[float], None] = time.sleep
    _next_slot: float = field(default=0.0, init=False)
    requests_made: int = field(default=0, init=False)

    def fetch(self, url: str) -> bytes:
        now = self.clock()
        if now < self._next_slot:
            self.sleep(self._next_slot - now)
            now = self._next_slot
        self._next_slot = now + 1.0 / self.max_per_sec
        self.requests_made += 1
        return self.fetch_fn(url)


_FETCH_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("content", T.BinaryType()),
        T.StructField("error", T.StringType()),
    ]
)


def fetch_urls(
    urls: DataFrame,
    fetch_fn: Callable[[str], bytes] = http_fetch,
    max_per_sec: float = 5.0,
) -> DataFrame:
    """S3 as a distributed operator: `mapInPandas` over a one-column
    `url` frame; each partition runs its own throttled fetcher.
    Errors are captured per-row (url, NULL, error) instead of failing
    the job — the reference's try/except download loop."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        fetcher = RateLimitedFetcher(fetch_fn=fetch_fn, max_per_sec=max_per_sec)
        for pdf in batches:
            out = {"url": [], "content": [], "error": []}
            for url in pdf["url"]:
                try:
                    content, error = fetcher.fetch(url), None
                except Exception as exc:  # per-row capture, job continues
                    content, error = None, f"{type(exc).__name__}: {exc}"
                out["url"].append(url)
                out["content"].append(content)
                out["error"].append(error)
            yield pd.DataFrame(out)

    return urls.select("url").mapInPandas(kernel, schema=_FETCH_SCHEMA)


def write_artifacts(df: DataFrame, path: str, fmt: str = "json") -> None:
    """S4/S21: artifact sink — append-mode write of proof artifacts
    (reference collect_signals.py:249-260 S3 JSON/text artifacts).
    `path` may be local, `s3a://`, or any Hadoop-FS URL; the writer
    is identical.  Text format requires a single string column named
    `value` (Spark's text sink contract)."""
    writer = df.write.mode("append")
    if fmt == "json":
        writer.json(path)
    elif fmt == "text":
        writer.text(path)
    elif fmt == "parquet":
        writer.parquet(path)
    else:
        raise ValueError(f"unsupported artifact format {fmt!r}")
