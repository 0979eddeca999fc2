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

# Schema memo per (SparkSession id, parquet path): `spark.read.parquet`
# runs a 1-task schema-inference job against the footer on EVERY call,
# so a bench pass over N queries × M tables × R reps paid N·M·R footer
# jobs (stage-probe r13: TPC-H Q5 ran SIX 1-task `parquet at` stages
# per run, one per table).  Inferring once per session and passing the
# explicit schema afterwards removes those jobs; pure metadata, not a
# result cache — at 100 TB the catalog (Delta/Iceberg/metastore) serves
# the schema the same way (guide §6: listing/planning is driver-side
# overhead to amortize).  Keyed by session id so a new session (new
# confs, e.g. nanosAsLong) re-infers.
_SCHEMA_MEMO: dict[tuple[str, str], "T.StructType"] = {}


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
    path = f"{sf_dir}/{name}.parquet"
    memo_key = (spark.sparkContext.applicationId, path)
    schema = _SCHEMA_MEMO.get(memo_key)
    if schema is None:
        df = spark.read.parquet(path)
        _SCHEMA_MEMO[memo_key] = df.schema
    else:
        df = spark.read.schema(schema).parquet(path)
    if name == "events":
        df = normalize_events_ts(df, source_path=path)
    if fan_out:
        df = df.repartition(spark.sparkContext.defaultParallelism)
    return df


_DF_MEMO: dict[tuple[str, str], DataFrame] = {}


def read_parquet_memo(spark: SparkSession, path: str) -> DataFrame:
    """Session-memoized read of a WRITE-ONCE layout artifact
    (bucketed/partitioned/z-ordered scratch tables written once per
    (session, sf) and read back on every run of their consumer
    queries).

    Memoizes the DataFrame itself, not just the schema: a fresh
    path-based `spark.read.parquet` re-runs partition DISCOVERY
    (driver-side recursive file listing — ~0.35 s per build against
    the month-partitioned lineitem layout) on EVERY call, while the
    memoized DataFrame keeps its resolved InMemoryFileIndex.  Pure
    metadata, not a result cache — executions still scan the files;
    at 100 TB a manifest-backed table format (Delta/Iceberg) serves
    the file list the same way (guide §6: listing is driver overhead
    to amortize; table formats avoid directory listing altogether).

    CONTRACT: callers only pass scratch paths written exactly once per
    session (all three call sites create a fresh `scratch_dir` and
    write before the first read) — a path rewritten mid-session must
    NOT go through this memo or the stale file index would dangle."""
    memo_key = (spark.sparkContext.applicationId, path)
    df = _DF_MEMO.get(memo_key)
    if df is None:
        df = spark.read.parquet(path)
        _DF_MEMO[memo_key] = df
    return df


def _long_ts_ns_multiplier(source_path: str) -> int:
    """When the scan yields a LongType ts, decide what unit the file
    actually stores (driver-side parquet footer read — no Spark job).

    parquet TIMESTAMP(NANOS) under `nanosAsLong` → already ns (×1).
    A PLAIN int64 column has no declared unit, so infer it from the
    row-group max statistic: pick the power-of-1000 multiplier that
    lands the epoch in the plausible ns range (1973–2128).  Defensive
    against the driver's testdata regenerations switching encodings —
    the round-2 ts regression class."""
    try:
        import pyarrow.parquet as pq

        f = pq.ParquetFile(source_path)
        t = f.schema_arrow.field("ts").type
        if str(t).startswith("timestamp[ns"):
            return 1
        mx = None
        for rg in range(f.metadata.num_row_groups):
            for ci in range(f.metadata.num_columns):
                col = f.metadata.row_group(rg).column(ci)
                if col.path_in_schema == "ts" and col.statistics is not None:
                    v = col.statistics.max
                    if isinstance(v, int):
                        mx = v if mx is None else max(mx, v)
        if mx is None:
            return 1
        for mult in (1, 1_000, 1_000_000, 1_000_000_000):
            if 1e17 <= mx * mult < 5e18:  # ~1973..2128 as ns
                return mult
    except Exception:  # pragma: no cover - footer read is best-effort
        pass
    return 1


def normalize_events_ts(df: DataFrame, source_path: str | None = None) -> DataFrame:
    """Normalize events.ts to the repo-wide contract: int64 nanoseconds
    since the NAIVE epoch (a wall-clock instant read as UTC), matching
    `ns()` literals and DuckDB's naive-TIMESTAMP comparisons exactly.

    Branches on the dtype the scan actually produced:

    - LongType — fixture was TIMESTAMP(NANOS) read under
      `nanosAsLong` (pass through), or a PLAIN int64 whose unit is
      inferred from the parquet footer stats (`_long_ts_ns_multiplier`)
      and rescaled to ns.
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
        mult = _long_ts_ns_multiplier(source_path) if source_path else 1
        if mult == 1:
            return df
        return df.withColumn("ts", (F.col("ts") * F.lit(mult)).cast("long"))
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
