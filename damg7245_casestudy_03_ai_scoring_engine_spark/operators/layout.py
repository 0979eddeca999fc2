"""Storage-layout operators: bucketed co-located joins and
partition-pruned scans (SURVEY.md §4 physical-execution posture; the
two layout levers that matter most at 100 TB).

The reference's Snowflake warehouse gets clustering/pruning for free
from micro-partitions (reference app/db/schema.sql table DDLs carry no
explicit clustering — Snowflake does it implicitly).  On Spark the
equivalent levers are explicit and these queries exercise both, each
with a plan pin in tests/test_plans.py proving the layout actually
changed the physical plan:

- **Bucketing** (`bucketBy` + `sortBy` on the join key): both fact
  tables pre-hashed into the same number of buckets on the join key,
  so the sort-merge join reads co-located buckets with NO Exchange on
  either side.  At 100 TB this converts the biggest shuffle in the
  workload (orders ⋈ lineitem) into a shuffle-free zip of bucket
  pairs — the Spark analog of the co-located join every MPP warehouse
  does on distribution keys.
- **Partition pruning** (hive-style `partitionBy` directory layout):
  a month-partitioned fact + a month filter scans only the matching
  directories (static pruning), and a join against a filtered month
  dim prunes at RUNTIME via dynamic partition pruning (the
  `dynamicpruningexpression` subquery) — only the dim's surviving
  months are ever read from the fact.

Layout builds are memoized per (session, sf_dir) under the process
scratch root: the write happens once, every query run after that is
pure read — mirroring production where layout is an ingest-time cost
amortized over every downstream query.
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.catalog import load
from ..sources.scratch import scratch_dir
from .registry import register

N_BUCKETS = 8

# Exact revenue arithmetic (the float-hygiene posture, see
# tests/test_oracle_parity.py lint): l_extendedprice has 2 decimals
# and l_discount has 2 decimals, so revenue·10^4 is an exact integer.
# Summing LONGS is order-independent across any partitioning; ONE
# final IEEE division + round_stable is bit-identical in every engine.
_REV_ORACLE = (
    "floor((CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)"
    " * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS DOUBLE)"
    " / 10000.0) * 100.0 + 0.5) / 100.0"
)


def _rev_exact() -> F.Column:
    price_i = F.round(F.col("l_extendedprice") * 100).cast("long")
    keep_i = F.lit(100) - F.round(F.col("l_discount") * 100).cast("long")
    total = F.sum(price_i * keep_i).cast("double") / F.lit(10000.0)
    return F.floor(total * F.lit(100.0) + F.lit(0.5)) / F.lit(100.0)


def _sf_tag(sf_dir: str) -> str:
    return re.sub(r"[^0-9a-zA-Z]+", "_", sf_dir.rstrip("/").rsplit("/", 1)[-1])


# --- bucketed co-located join ----------------------------------------------


def _bucketed_table(
    spark: SparkSession, sf_dir: str, name: str, key: str
) -> DataFrame:
    """Write (once) and read back `name` bucketed+sorted on `key`.

    The table is registered in the session catalog (bucketing metadata
    lives in the catalog, so a plain path read would NOT see the
    bucket spec) with an explicit external LOCATION under the scratch
    root — independent of whatever warehouse dir the driver's session
    was built with."""
    tbl = f"bkt_{name}_{_sf_tag(sf_dir)}"
    if not spark.catalog.tableExists(tbl):
        path = scratch_dir(f"bucketed_{name}_")
        (
            load(spark, sf_dir, name)
            .write.mode("overwrite")
            .bucketBy(N_BUCKETS, key)
            .sortBy(key)
            .option("path", os.path.join(path, tbl))
            .format("parquet")
            .saveAsTable(tbl)
        )
    return spark.table(tbl)


@register(
    "bucketed_colocated_join",
    survey="J2,A1 (bucketed co-located scale path)",
    bench=True,
    oracle=f"""
SELECT o.o_orderpriority AS priority,
       count(*) AS n_items,
       {_REV_ORACLE} AS revenue
FROM orders o
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
GROUP BY o.o_orderpriority
""",
)
def bucketed_colocated_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2 on bucketed layout: orders and lineitem both bucketed into
    the same number of buckets on the order key, so the fact-fact
    sort-merge join is CO-LOCATED — no Exchange on either join side
    (plan-pinned in tests/test_plans.py).  This is the layout the
    100 TB deployment would bake into bronze: the workload's biggest
    shuffle, paid once at ingest instead of per-query.

    Reference J2: scores ⋈ scoring_runs fact-fact equi-join
    (app/routers/scoring.py:306-318); same shape, Spark-first layout.
    """
    o = _bucketed_table(spark, sf_dir, "orders", "o_orderkey")
    li = _bucketed_table(spark, sf_dir, "lineitem", "l_orderkey")
    # At 100 TB neither side broadcasts — SMJ is the real physical
    # choice; the merge hint makes the test-scale plan show the same
    # shape (otherwise AQE broadcasts the tiny test orders side and
    # the co-location being pinned never appears in the plan).
    return (
        li.hint("merge").join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            _rev_exact().alias("revenue"),
        )
    )


# --- partition pruning (static + dynamic) ----------------------------------


def _month_partitioned_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write (once) lineitem hive-partitioned by ship month; read back
    via directory discovery so `ship_month` is a PARTITION column and
    month predicates become directory pruning, not data filters."""
    tag = _sf_tag(sf_dir)
    key = f"_layout_lineitem_month_{tag}"
    if not hasattr(spark, key):
        path = scratch_dir(f"lineitem_bymonth_{tag}_")
        (
            load(spark, sf_dir, "lineitem")
            .withColumn("ship_month", F.date_format("l_shipdate", "yyyy-MM"))
            .write.mode("overwrite")
            .partitionBy("ship_month")
            .parquet(path)
        )
        setattr(spark, key, path)
    return spark.read.parquet(getattr(spark, key))


@register(
    "partition_pruned_scan",
    survey="P5,S15 (partition-pruned layout scale path)",
    oracle=f"""
SELECT l_returnflag,
       count(*) AS n_items,
       {_REV_ORACLE} AS revenue
FROM lineitem
WHERE strftime(l_shipdate, '%Y-%m') = '1997-03'
GROUP BY l_returnflag
""",
)
def partition_pruned_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5 on partitioned layout: the time-window predicate hits a
    PARTITION column, so Spark lists only the `ship_month=1997-03`
    directory — at 100 TB with daily partitions this is the difference
    between scanning one day and scanning three years.  Plan-pinned:
    PartitionFilters non-empty, no ship_month predicate left in the
    post-scan Filter."""
    li = _month_partitioned_lineitem(spark, sf_dir)
    return (
        li.filter(F.col("ship_month") == "1997-03")
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            _rev_exact().alias("revenue"),
        )
    )


# 24-month calendar dim (1996-01 .. 1997-12) with a quarter attribute;
# tiny → broadcast; the DPP filter arrives via the ATTRIBUTE, not the
# join key, so only runtime pruning can skip fact partitions.
_MONTH_DIM = [
    (f"{y}-{m:02d}", f"{y}Q{(m - 1) // 3 + 1}")
    for y in (1996, 1997)
    for m in range(1, 13)
]
_MONTH_DIM_VALUES = ", ".join(f"('{mo}', '{q}')" for mo, q in _MONTH_DIM)


# --- Z-order (space-filling-curve) layout ----------------------------------

_Z_BITS = 16  # 16 bits per dimension → 32-bit Morton code


def _interleave_sql(xcol: str, ycol: str) -> str:
    """SQL for the 2-D Morton (Z) code of two 16-bit ints: bit i of x
    lands at position 2i, bit i of y at 2i+1.  Bits never overlap, so
    `+` is `|` and the whole thing is one codegen-friendly integer
    expression — no UDF, no loop at runtime."""
    terms = []
    for i in range(_Z_BITS):
        terms.append(f"(shiftleft(shiftright({xcol}, {i}) & 1, {2 * i}))")
        terms.append(f"(shiftleft(shiftright({ycol}, {i}) & 1, {2 * i + 1}))")
    return " + ".join(terms)


def _zorder_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write (once) events Z-ORDERED on (user_id, ts): both dims are
    scaled to 16-bit grid cells, bit-interleaved into a Morton code,
    then range-repartitioned + sorted on the code.  Nearby Z values
    are nearby in BOTH dimensions, so every output file's parquet
    row-group min/max stats are tight on user_id AND ts at once —
    a 2-D box predicate skips most files on either dim (the Delta
    OPTIMIZE ZORDER layout, hand-rolled with repartitionByRange;
    tests/test_sources.py asserts the per-file stats tightness).

    The grid min/max scalars come from one tiny driver-side aggregate
    at BUILD time only (layout construction, amortized like the
    bucketed tables above — query-time reads never touch the driver).
    """
    tag = _sf_tag(sf_dir)
    key = f"_layout_events_zorder_{tag}"
    if not hasattr(spark, key):
        # events.ts is int64 NANOSECONDS by repo contract
        # (sources/catalog.py normalize_events_ts); scale to seconds
        # BEFORE multiplying by the grid so (span_s · 65535) stays far
        # inside int64 — (span_ns · 65535) would overflow for any
        # range longer than ~52 hours.
        ev = load(spark, sf_dir, "events")
        lo_u, hi_u, lo_t, hi_t = ev.agg(
            F.min("user_id"),
            F.max("user_id"),
            F.min(F.col("ts") / F.lit(1_000_000_000)).cast("bigint"),
            F.max(F.col("ts") / F.lit(1_000_000_000)).cast("bigint"),
        ).first()
        span_u = max(int(hi_u) - int(lo_u), 1)
        span_t = max(int(hi_t) - int(lo_t), 1)
        grid = (1 << _Z_BITS) - 1
        ux = f"CAST((user_id - {int(lo_u)}) * {grid} / {span_u} AS BIGINT)"
        ty = (
            f"CAST((CAST(ts / 1000000000 AS BIGINT) - {int(lo_t)})"
            f" * {grid} / {span_t} AS BIGINT)"
        )
        path = scratch_dir(f"events_zorder_{tag}_")
        (
            ev.withColumn("zval", F.expr(_interleave_sql(ux, ty)))
            .repartitionByRange(16, "zval")
            .sortWithinPartitions("zval")
            .drop("zval")
            .write.mode("overwrite")
            .parquet(path)
        )
        setattr(spark, key, path)
    return spark.read.parquet(getattr(spark, key))


@register(
    "zorder_layout_scan",
    survey="P5,S15 (Z-order multi-dimensional clustering scale path)",
    oracle="""
SELECT event_type,
       count(*) AS n_events,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
FROM events
WHERE user_id BETWEEN 3 AND 60
  AND ts >= TIMESTAMP '2024-01-08' AND ts < TIMESTAMP '2024-01-15'
GROUP BY event_type
""",
)
def zorder_layout_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D box query on the Z-ordered events layout: a user-range ×
    time-range predicate over data clustered on the Morton code of
    both columns.  Single-column sorting makes one dim skippable and
    the other useless; Z-order makes BOTH selective — at 100 TB the
    scan reads the few files whose (user, time) rectangles intersect
    the box instead of every file in the time range.  Results are
    layout-invariant (oracle runs on the unclustered original); both
    predicates are pinned as PushedFilters in tests/test_plans.py.

    Reference analog: Snowflake micro-partition pruning on clustered
    tables (implicit in app/db/schema.sql DDL); Spark needs the
    layout spelled out."""
    from ..sources.catalog import ns

    ev = _zorder_events(spark, sf_dir)
    return (
        ev.filter(
            (F.col("user_id") >= 3)
            & (F.col("user_id") <= 60)
            & (F.col("ts") >= F.lit(ns("2024-01-08")))
            & (F.col("ts") < F.lit(ns("2024-01-15")))
        )
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.round(F.col("value") * 100).cast("bigint"))
            .cast("bigint")
            .alias("value_cents"),
        )
    )


@register(
    "dynamic_partition_pruned_join",
    survey="J1,P5 (dynamic partition pruning scale path)",
    bench=True,
    oracle=f"""
WITH month_dim(ship_month, quarter) AS (VALUES {_MONTH_DIM_VALUES})
SELECT d.quarter,
       count(*) AS n_items,
       {_REV_ORACLE} AS revenue
FROM lineitem l
JOIN month_dim d ON strftime(l.l_shipdate, '%Y-%m') = d.ship_month
WHERE d.quarter = '1997Q1'
GROUP BY d.quarter
""",
)
def dynamic_partition_pruned_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic partition pruning: the month-partitioned fact joins a
    broadcast calendar dim filtered on an attribute (quarter).  The
    months surviving the dim filter are only known at runtime, so
    Catalyst plants a `dynamicpruningexpression` subquery in the fact
    scan's PartitionFilters — the fact reads 3 of 24 month directories
    without any static month predicate in the query (plan-pinned).
    At 100 TB this is how every fact ⋈ filtered-dim query avoids the
    full scan."""
    li = _month_partitioned_lineitem(spark, sf_dir)
    dim = spark.createDataFrame(_MONTH_DIM, "ship_month string, quarter string")
    return (
        li.join(F.broadcast(dim), "ship_month")
        .filter(F.col("quarter") == "1997Q1")
        .groupBy("quarter")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            _rev_exact().alias("revenue"),
        )
    )


# --- per-file Bloom index (Delta-style file skipping for point keys) -------

_BLOOM_BITS = 1024  # 16 × 64-bit words per file
_BLOOM_WORDS = _BLOOM_BITS // 64
_BLOOM_K = 4
_LOOKUP_EVENT_ID = 4242


def _bloom_positions(col: F.Column) -> list[F.Column]:
    """k bit positions for a key: xxhash64(key, seed j) mod m.
    pmod (not %) — xxhash64 is signed."""
    return [
        F.pmod(F.xxhash64(col, F.lit(j)), F.lit(_BLOOM_BITS))
        for j in range(_BLOOM_K)
    ]


def _file_bloom_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build (once) a per-FILE Bloom index over event_id for the
    Z-ordered events layout: one row per data file, 16 bit_or-folded
    64-bit words.  This is the Delta/Iceberg secondary-stats pattern:
    the index is file-grain (thousands of rows for a 100 TB table —
    itself a small table), built in one distributed aggregate over
    `input_file_name()`, and consulted BEFORE any data IO."""
    tag = _sf_tag(sf_dir)
    key = f"_layout_events_bloomidx_{tag}"
    if not hasattr(spark, key):
        from functools import reduce

        ev = spark.read.parquet(getattr(spark, f"_layout_events_zorder_{tag}"))
        pos = _bloom_positions(F.col("event_id"))

        def row_word(w: int) -> F.Column:
            # this row's bits for word w: bitwise-OR of 1<<(p&63) over
            # the positions landing in word w.  MUST be |, not + — two
            # seeds can hash a key to the SAME bit, and addition would
            # carry into a different bit, making the later membership
            # probe a false NEGATIVE (wrong results, not just extra IO).
            contribs = [
                F.when(
                    p.bitwiseAND(F.lit(~63)) == F.lit(w * 64),
                    F.call_function(
                        "shiftleft",
                        F.lit(1).cast("long"),
                        p.bitwiseAND(F.lit(63)).cast("int"),
                    ),
                ).otherwise(F.lit(0).cast("long"))
                for p in pos
            ]
            return reduce(lambda a, b: a.bitwiseOR(b), contribs)

        words = [
            F.bit_or(row_word(w)).alias(f"w{w}") for w in range(_BLOOM_WORDS)
        ]
        idx = (
            ev.select(F.input_file_name().alias("file"), "event_id")
            .groupBy("file")
            .agg(*words)
        )
        setattr(spark, key, idx.collect())
    return getattr(spark, key)


@register(
    "file_bloom_index_lookup",
    survey="S15,P3 (extension: per-file Bloom index point lookup)",
    oracle=f"""
SELECT event_id, user_id, event_type,
       CAST(round(value * 100) AS BIGINT) AS value_cents
FROM events
WHERE event_id = {_LOOKUP_EVENT_ID}
""",
)
def file_bloom_index_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point lookup through a per-file Bloom index: event_id is NOT a
    sort/cluster key of the Z-ordered layout, so min/max stats cannot
    skip files for it — the Bloom index can.  The lookup hashes the
    probe key (k=4, m=1024 bits), selects the files whose Bloom words
    contain all k bits (a file-grain index scan — the index is tiny,
    one row per file, so consulting it driver-side is the same move
    every lakehouse makes), and reads ONLY those files.

    tests/test_sources.py pins the skipping: the probe must select a
    strict subset of files, and the final answer is oracle-checked
    against the unindexed table — Bloom false positives cost extra
    reads, never wrong results (the residual equality filter runs on
    whatever is read).

    At 100 TB: the index build is one map-side-combined aggregate
    keyed on input_file_name(); the index table (≈1 row per file)
    lives next to the data; a point lookup touches k·files/m bits of
    index + the 1-2 true files.  Reference analog: content_hash
    existence probe (signal_store.py:21-28) — the pattern that makes
    dedup-before-insert cheap."""
    import pyspark.sql.functions as _F

    _zorder_events(spark, sf_dir)  # ensure layout exists
    index_rows = _file_bloom_index(spark, sf_dir)

    # hash the probe key exactly as the index build did (driver-side
    # arithmetic mirror of xxhash64 is NOT attempted — we reuse Spark
    # for the 1-row hash so the two sides can never drift)
    probe = (
        spark.range(1)
        .select(*[
            p.alias(f"p{j}")
            for j, p in enumerate(_bloom_positions(F.lit(_LOOKUP_EVENT_ID).cast("long")))
        ])
        .first()
    )
    positions = [probe[f"p{j}"] for j in range(_BLOOM_K)]

    def contains(row) -> bool:
        for p in positions:
            word = row[f"w{p // 64}"]
            if not (word >> (p % 64)) & 1:
                return False
        return True

    paths = [r["file"] for r in index_rows if contains(r)]
    ev_schema = load(spark, sf_dir, "events").schema
    out_cols = [
        "event_id",
        "user_id",
        "event_type",
        _F.round(F.col("value") * 100).cast("bigint").alias("value_cents"),
    ]
    if not paths:  # key provably absent: no data IO at all
        return (
            spark.createDataFrame([], ev_schema)
            .select(*out_cols)
        )
    return (
        spark.read.parquet(*paths)
        .filter(F.col("event_id") == _LOOKUP_EVENT_ID)
        .select(*out_cols)
    )
