"""Query/operator registry.

Every operator from SURVEY.md §2 (plus the LLM-data-pipeline
extensions) is registered here as a named `(spark, sf_dir) ->
DataFrame` callable with an optional DuckDB oracle SQL string.  The
driver contract (`__spark_entry__.py`) simply re-exports this
registry.

Oracle discipline (the correctness gate hashes values
order-insensitively with columns sorted by name):
- every computed column is aliased identically in Spark and SQL;
- float aggregates are rounded (4–6 dp) on BOTH sides;
- no wall-clock (`current_timestamp`) — fixed literal date windows;
- divisions are guarded on both sides (Spark 4 ANSI mode safe).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL over pre-registered table views
    survey: str  # SURVEY.md §2 operator ids covered (e.g. "J1,A6")
    doc: str = ""
    bench: bool = field(default=False)  # include in bench.py headline set


REGISTRY: dict[str, QuerySpec] = {}


def register(
    name: str,
    *,
    oracle: str | None = None,
    survey: str = "",
    doc: str = "",
    bench: bool = False,
) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = QuerySpec(
            name=name,
            fn=fn,
            oracle=oracle.strip() if oracle else None,
            survey=survey,
            doc=(doc or (fn.__doc__ or "").strip().splitlines()[0] if (doc or fn.__doc__) else ""),
            bench=bench,
        )
        return fn

    return deco
