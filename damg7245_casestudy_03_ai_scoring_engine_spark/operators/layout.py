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
