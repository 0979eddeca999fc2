"""Skew & co-location machinery (SURVEY.md §4 / 100 TB posture).

Two mechanisms a 1000-executor deployment leans on, implemented as
reusable operators with correctness oracles:

- **Salted aggregation**: two-phase groupBy for skewed keys — phase 1
  aggregates on (key, salt) spreading one hot key over N reducers,
  phase 2 merges the partials.  Result-identical to the direct
  groupBy (the oracle proves it); wall-clock-identical on uniform
  data; linearly better on a hot key.  AQE's skew-join handling
  covers *joins*; aggregation skew still needs salting.

- **Bucketed co-located join**: both sides written bucketed by the
  join key → the sort-merge join runs with ZERO exchange (verified
  structurally in tests/test_plans.py::test_bucketed_join_no_shuffle).
  This is the mechanism that amortizes the shuffle of a repeatedly-
  joined 100 TB fact table into its write.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.catalog import load
from .registry import register

_SALTS = 16


def salted_sum(
    df: DataFrame, key: str, value_cols: list[str], n_salts: int = _SALTS
) -> DataFrame:
    """Two-phase skew-proof aggregation: count + per-column sums.

    Phase 1 groups on (key, salt) — the hot key's rows land on
    `n_salts` different reducers; phase 2 merges the ≤ n_salts
    partial rows per key.  The salt is derived from stable row
    content (not rand()) so reruns are deterministic."""
    salt = (F.xxhash64(*[F.col(c) for c in df.columns]) % n_salts).alias("_salt")
    phase1 = (
        df.select(key, salt, *value_cols)
        .groupBy(key, "_salt")
        .agg(
            F.count(F.lit(1)).alias("_n"),
            *[F.sum(c).alias(f"_s_{c}") for c in value_cols],
        )
    )
    return phase1.groupBy(key).agg(
        F.sum("_n").alias("n"),
        *[F.round(F.sum(f"_s_{c}"), 4).alias(f"sum_{c}") for c in value_cols],
    )


@register(
    "salted_skew_agg",
    survey="§4 skew handling (A1 under a hot key)",
    oracle="""
SELECT l_returnflag AS key,
       count(*) AS n,
       round(sum(l_quantity), 4) AS sum_l_quantity,
       round(sum(l_extendedprice), 4) AS sum_l_extendedprice
FROM lineitem
GROUP BY 1
""",
)
def salted_skew_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted two-phase aggregation over l_returnflag — a 3-value key
    (the skew situation: at 100 TB each value is a monster partition
    for a direct groupBy).  The oracle is the plain GROUP BY: salting
    must be invisible in the result.

    Reference: SURVEY.md §4 skew posture (no reference analog - pure scale machinery).
    """
    li = load(spark, sf_dir, "lineitem")
    return salted_sum(
        li, "l_returnflag", ["l_quantity", "l_extendedprice"]
    ).withColumnRenamed("l_returnflag", "key")


def write_bucketed(
    df: DataFrame, table: str, bucket_col: str, n_buckets: int = 8
) -> None:
    """Persist a table bucketed+sorted by its join key — subsequent
    equi-joins between tables bucketed the same way plan with no
    Exchange (the shuffle was paid once, at write time)."""
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    # a crashed previous run can leave the managed location behind
    import shutil
    from urllib.parse import urlparse

    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")).path
    shutil.rmtree(f"{wh}/{table}", ignore_errors=True)
    (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, bucket_col)
        .sortBy(bucket_col)
        .format("parquet")
        .saveAsTable(table)
    )


def bucketed_join_demo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders ⋈ lineitem with both sides bucketed by the order key —
    used by tests to assert the exchange-free plan.  (Not a registry
    query: saveAsTable writes warehouse state, which the driver's
    read-only correctness gate shouldn't do.)"""
    write_bucketed(
        load(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice"),
        "bkt_orders",
        "o_orderkey",
    )
    write_bucketed(
        load(spark, sf_dir, "lineitem").select("l_orderkey", "l_extendedprice"),
        "bkt_lineitem",
        "l_orderkey",
    )
    o = spark.table("bkt_orders")
    li = spark.table("bkt_lineitem")
    # merge hint: at test scale orders fits the broadcast threshold,
    # which would bypass the bucketed path being demonstrated; at
    # 100 TB neither side broadcasts and SMJ is what Catalyst picks.
    return o.hint("merge").join(li, o.o_orderkey == li.l_orderkey).groupBy(
        "o_orderkey"
    ).agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.round(F.sum("l_extendedprice"), 2).alias("revenue"),
    )


def partition_pruned_scan_demo(
    spark: SparkSession, sf_dir: str, base_dir: str
) -> DataFrame:
    """Write events hive-partitioned by event_date, then read back one
    day — the scan must touch ONLY that day's directory (partition
    pruning: the 100 TB mechanism that turns the reference's
    DATEADD windows, P5, into IO proportional to the window, not the
    table).  Used by tests to assert PartitionFilters + file count.
    (Not a registry query: writes outside the read-only gate.)"""
    ev = load(spark, sf_dir, "events").withColumn(
        "event_date",
        F.date_format(F.timestamp_micros(F.expr("ts div 1000")), "yyyy-MM-dd"),
    )
    path = f"{base_dir}/events_by_date"
    ev.write.mode("overwrite").partitionBy("event_date").parquet(path)
    back = spark.read.parquet(path).filter(F.col("event_date") == "2024-01-05")
    return back.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))


@register(
    "salted_skew_join",
    survey="§4 skew handling (J1 under a hot key)",
    oracle="""
SELECT n.n_name AS nation,
       count(*) AS n_customers,
       round(sum(c.c_acctbal), 4) AS sum_acctbal
FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY n.n_name
""",
)
def salted_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted SHUFFLE join: the big side gets a deterministic salt
    (pmod of a row hash — never `%`, whose negative results would
    miss the replicated range), the 25-row dim side is exploded once
    per salt, and the join keys become (nationkey, _salt) — one hot
    nation now lands on 16 reducers instead of one.

    This is the fallback for when the dim is too big to broadcast and
    AQE's skew splitting can't help (e.g. a subsequent stateful op
    needs the co-partitioning).  The merge hint forces the shuffle
    path under test so the mechanism is actually exercised; the
    oracle is the plain join — salting must be invisible.

    Reference: SURVEY.md §4 skew posture (no reference analog - pure scale machinery).
    """
    c = load(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_acctbal"
    )
    cust = c.withColumn("_salt", F.pmod(F.xxhash64("c_custkey"), F.lit(_SALTS)))
    nat = (
        load(spark, sf_dir, "nation")
        .select("n_nationkey", "n_name")
        .withColumn("_salt", F.explode(F.sequence(F.lit(0), F.lit(_SALTS - 1))))
    )
    j = cust.hint("merge").join(
        nat,
        (F.col("c_nationkey") == F.col("n_nationkey"))
        & (cust["_salt"] == nat["_salt"]),
    )
    return j.groupBy(F.col("n_name").alias("nation")).agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.round(F.sum("c_acctbal"), 4).alias("sum_acctbal"),
    )


def compact_small_files_demo(
    spark: SparkSession, sf_dir: str, base_dir: str, small: int = 32, target: int = 4
) -> tuple[int, int]:
    """Small-file compaction: rewrite a fragmented table into
    `target` right-sized files with a shuffle-free `coalesce` —
    the maintenance job that keeps scan task counts sane after
    streaming appends (thousands of tiny files = thousands of tasks
    + NameNode/listing pressure at 100 TB).  Returns (files_before,
    files_after); row equality is asserted by the test."""
    import glob

    frag_dir = f"{base_dir}/events_fragmented"
    compact_dir = f"{base_dir}/events_compacted"
    ev = load(spark, sf_dir, "events")
    ev.repartition(small).write.mode("overwrite").parquet(frag_dir)
    frag = spark.read.parquet(frag_dir)
    frag.coalesce(target).write.mode("overwrite").parquet(compact_dir)

    def n_files(d: str) -> int:
        return len(glob.glob(f"{d}/part-*.parquet"))

    return n_files(frag_dir), n_files(compact_dir)
