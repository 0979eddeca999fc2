"""Parquet table catalog over the driver-generated test data.

Mirrors the reference's Snowflake table scans (every
``cur.execute("SELECT ...")`` — reference app/services/snowflake.py:14-30,
app/scoring_engine/signal_store.py:70-113) with ``spark.read.parquet``
scans.  Catalyst handles column pruning + predicate pushdown, so the
callers just ``.select``/``.filter`` declaratively.

At 100 TB these tables would be Delta/partitioned parquet; the reader
is path-based so the same code works on a directory of many files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension-sized tables that should always end up on the build side of
# a broadcast join at any scale factor (region/nation are fixed-size;
# supplier/part grow slowly relative to the fact tables).
BROADCAST_TABLES = frozenset({"region", "nation", "supplier", "part"})


def load(spark: SparkSession, sf_dir: str, name: str, fan_out: bool = False) -> DataFrame:
    """Read one test table.

    fan_out=True repartitions to the cluster's default parallelism —
    required before expression-heavy narrow stages (shingling,
    hashing, vector math) because the test parquet files have a
    SINGLE row group, so the scan itself cannot split and would pin
    the whole pipeline to one task.  On production multi-file tables
    the scan fans out naturally and this becomes a no-op choice.
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    if name == "events":
        # events.ts is parquet TIMESTAMP(NANOS) which vanilla Spark
        # refuses to read; the legacy conf maps it to LongType
        # (nanoseconds since naive epoch).  We keep it as long — a
        # plain int64 column: timezone-proof comparisons and full
        # predicate pushdown.  Use `ns()` for window literals.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if fan_out:
        df = df.repartition(spark.sparkContext.defaultParallelism)
    return df


def ns(iso_date: str) -> int:
    """Nanoseconds since epoch for a naive ISO date/datetime literal —
    the boundary form for filters on events.ts (matches DuckDB's naive
    TIMESTAMP comparison exactly, independent of session timezone)."""
    from datetime import datetime, timezone

    fmt = "%Y-%m-%d %H:%M:%S" if " " in iso_date else "%Y-%m-%d"
    dt = datetime.strptime(iso_date, fmt).replace(tzinfo=timezone.utc)
    return int(dt.timestamp()) * 1_000_000_000


def load_all(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    return {n: load(spark, sf_dir, n) for n in (names or TABLES)}
