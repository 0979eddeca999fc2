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


def _sector_sql(seg_name: str) -> str:
    """SQL twin of `_sector_expr` — same CASE ladder, one parse."""
    arms = " ".join(
        f"WHEN {seg_name} = '{seg}' THEN '{sec}'"
        for seg, sec in SEGMENT_SECTOR.items()
    )
    return f"CASE {arms} ELSE 'Services' END"


def _dimension_expr(linenumber_col):
    m = linenumber_col % 7
    expr = F.when(m == 0, F.lit(DIMENSIONS[0]))
    for i in range(1, 7):
        expr = expr.when(m == i, F.lit(DIMENSIONS[i]))
    return expr.otherwise(F.lit(DIMENSIONS[0]))


def _dimension_sql(linenumber_name: str) -> str:
    """SQL twin of `_dimension_expr` — same CASE ladder (the `% 7`
    subtree repeats per arm exactly as the Column version repeats the
    shared `m` expression), one parse."""
    arms = " ".join(
        f"WHEN {linenumber_name} % 7 = {i} THEN '{DIMENSIONS[i]}'"
        for i in range(7)
    )
    return f"CASE {arms} ELSE '{DIMENSIONS[0]}' END"


def companies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """company_id, sector, position_factor."""
    # selectExpr single parse (r13, guide §5/§7.3): identical columns
    # and arithmetic as the former Column-chain build.
    c = load(spark, sf_dir, "customer")
    return c.selectExpr(
        "c_custkey AS company_id",
        f"{_sector_sql('c_mktsegment')} AS sector",
        "least(greatest(c_acctbal / 10000.0D, -1.0D), 1.0D) AS position_factor",
    )


def evidence_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw per-lineitem evidence: company_id, dimension, score_raw,
    conf_raw, supp_key."""
    li = load(spark, sf_dir, "lineitem", fan_out=True).select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber"
    )
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    return li.join(o, li.l_orderkey == o.o_orderkey).selectExpr(
        "o_custkey AS company_id",
        f"{_dimension_sql('l_linenumber')} AS dimension",
        "CAST((l_partkey * 7 + l_suppkey) % 101 AS DOUBLE) AS score_raw",
        "CAST(l_orderkey % 10 AS DOUBLE) / 10.0D AS conf_raw",
        "l_suppkey AS supp_key",
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
