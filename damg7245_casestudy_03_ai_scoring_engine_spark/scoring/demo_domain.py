"""Deterministic mapping of the driver's TPC-H-ish test tables onto
the scoring domain model, so the full Org-AI-R pipeline can run (and
be oracle-checked) on `/root/testdata/sf*`.

Mapping (pure column math — every derivation is reproducible in ANSI
SQL so the DuckDB oracle can replay it):
- customer  → companies  (c_custkey=company_id, mktsegment→sector,
  position_factor = clamp(c_acctbal/10000, −1, 1))
- orders ⋈ lineitem → dimension evidence rows: dimension =
  DIMENSIONS[l_linenumber % 7], score = (l_partkey·7+l_suppkey) % 101,
  confidence = (l_orderkey % 10)/10
- lineitem supplier exposure → the HHI "job function" analog
  (supplier concentration per customer).

At 100 TB the same shapes hold: the fact scan is partitioned by the
natural keys, dims broadcast, and every aggregate is partial-agg
friendly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.core import clamp
from ..sources.catalog import load
from .config import DEFAULT_DIM_WEIGHTS, DIMENSIONS, dimension_case

SEGMENT_SECTOR: dict[str, str] = {
    "AUTOMOBILE": "Industrials",
    "BUILDING": "Financial",
    "FURNITURE": "Consumer",
    "HOUSEHOLD": "Services",
    "MACHINERY": "Healthcare",
}


def _sector_expr(seg_col):
    expr = F.when(seg_col == "AUTOMOBILE", F.lit("Industrials"))
    for seg, sec in list(SEGMENT_SECTOR.items())[1:]:
        expr = expr.when(seg_col == seg, F.lit(sec))
    return expr.otherwise(F.lit("Services"))


def _dimension_expr(linenumber_col):
    m = linenumber_col % 7
    expr = F.when(m == 0, F.lit(DIMENSIONS[0]))
    for i in range(1, 7):
        expr = expr.when(m == i, F.lit(DIMENSIONS[i]))
    return expr.otherwise(F.lit(DIMENSIONS[0]))


def companies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """company_id, sector, position_factor."""
    c = load(spark, sf_dir, "customer")
    return c.select(
        F.col("c_custkey").alias("company_id"),
        _sector_expr(F.col("c_mktsegment")).alias("sector"),
        clamp(F.col("c_acctbal") / 10000.0, -1.0, 1.0).alias("position_factor"),
    )


def evidence_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw per-lineitem evidence: company_id, dimension, score_raw,
    conf_raw, supp_key."""
    li = load(spark, sf_dir, "lineitem", fan_out=True).select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber"
    )
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(
            F.col("o_custkey").alias("company_id"),
            _dimension_expr(F.col("l_linenumber")).alias("dimension"),
            ((F.col("l_partkey") * 7 + F.col("l_suppkey")) % 101)
            .cast("double")
            .alias("score_raw"),
            ((F.col("l_orderkey") % 10).cast("double") / 10.0).alias("conf_raw"),
            F.col("l_suppkey").alias("supp_key"),
        )
    )


def dimension_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """company_id, dimension, score, weight, confidence, evidence_count
    — the shape of the reference's dimension_scores table
    (schema.sql:51-63)."""
    return dimension_scores_from(evidence_rows(spark, sf_dir))


def dimension_scores_from(ev: DataFrame) -> DataFrame:
    """Aggregate an (already materialized) evidence frame — lets a
    caller with several evidence consumers share one scan/join."""
    return ev.groupBy("company_id", "dimension").agg(
        F.avg("score_raw").alias("score"),
        F.lit(None).cast("double").alias("weight"),  # default per-dim weight applies
        F.avg("conf_raw").alias("confidence"),
        F.count(F.lit(1)).alias("evidence_count"),
    )


def dimension_scores_with_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    ds = dimension_scores(spark, sf_dir)
    return ds.withColumn(
        "weight", dimension_case(F.col("dimension"), DEFAULT_DIM_WEIGHTS)
    )
