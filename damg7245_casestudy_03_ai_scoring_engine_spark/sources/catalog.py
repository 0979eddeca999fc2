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
from pyspark.sql import functions as F
from pyspark.sql import types as T

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
        # Older fixtures store ts as parquet TIMESTAMP(NANOS), which
        # vanilla Spark refuses to read; this legacy conf maps those to
        # LongType (ns since naive epoch).  Newer fixtures store
        # TIMESTAMP_NTZ(µs), where the conf is a no-op — those are
        # normalized to the same int64-ns contract below.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        df = normalize_events_ts(df)
    if fan_out:
        df = df.repartition(spark.sparkContext.defaultParallelism)
    return df


def normalize_events_ts(df: DataFrame) -> DataFrame:
    """Normalize events.ts to the repo-wide contract: int64 nanoseconds
    since the NAIVE epoch (a wall-clock instant read as UTC), matching
    `ns()` literals and DuckDB's naive-TIMESTAMP comparisons exactly.

    Branches on the dtype the scan actually produced:

    - LongType — fixture was TIMESTAMP(NANOS) read under
      `nanosAsLong`; already ns, pass through.
    - TimestampNTZType — fixture is TIMESTAMP_NTZ(µs).  Converted with
      pure-NTZ `timestampdiff` arithmetic against the NTZ epoch, which
      is session-timezone-proof (`to_utc_timestamp`/`unix_micros` are
      NOT: they implicitly route NTZ through the session zone and
      shift the value — verified under America/New_York).
    - TimestampType (LTZ) — instant-based `unix_micros`, inherently
      timezone-proof.
    """
    dt = df.schema["ts"].dataType
    if isinstance(dt, T.LongType):
        return df
    if isinstance(dt, T.TimestampNTZType):
        ns_col = F.expr(
            "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts) * 1000"
        )
    elif isinstance(dt, T.TimestampType):
        ns_col = F.unix_micros(F.col("ts")) * F.lit(1000)
    else:  # pragma: no cover - unexpected fixture dtype
        raise TypeError(f"events.ts has unsupported dtype {dt}")
    return df.withColumn("ts", ns_col.cast("long"))


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
