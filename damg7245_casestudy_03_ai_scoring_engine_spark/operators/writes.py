"""Write-side operators: MERGE upsert and append-dedup (SURVEY.md
§2.1 S16–S19).

The reference upserts via Snowflake `MERGE ... ON natural keys WHEN
MATCHED UPDATE WHEN NOT MATCHED INSERT` (dimension_pipeline.py:38-74,
run_scoring_engine.py:191-258).  Without a transactional table format
in this environment, MERGE is expressed as pure DataFrame algebra —
`target ANTI JOIN source ON keys  UNION ALL  source` — which is also
exactly the shuffle shape Delta executes underneath; on a Delta
deployment these functions swap for `DeltaTable.merge` with no caller
changes.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.catalog import load
from .registry import register


def merge_upsert(target: DataFrame, source: DataFrame, keys: Sequence[str]) -> DataFrame:
    """MERGE semantics: source wins on key match, unmatched target
    rows survive, unmatched source rows insert.  One shuffle on the
    key columns (the anti join); at scale both sides should be
    partitioned/bucketed by the keys so the join co-locates."""
    kept = target.join(source.select(*keys).distinct(), list(keys), "left_anti")
    return kept.unionByName(source)


def append_dedup(target: DataFrame, incoming: DataFrame, hash_col: str) -> DataFrame:
    """S18: insert-if-absent by content hash — the reference's
    existence probe (signal_store.py:21-28) as a left-anti join.
    Returns only the rows that should be appended."""
    return incoming.join(target.select(hash_col).distinct(), [hash_col], "left_anti")


@register(
    "merge_upsert_balances",
    survey="S17,S18,U1,J9",
    oracle="""
WITH source AS (
    SELECT c_custkey, c_mktsegment AS segment,
           round(c_acctbal + 100.0, 2) AS acctbal, 'updated' AS row_origin
    FROM customer WHERE c_mktsegment = 'BUILDING'
    UNION ALL
    SELECT c_custkey + 1000000, 'NEWSEG', 42.0, 'inserted'
    FROM customer WHERE c_custkey % 100 = 0
),
target AS (
    SELECT c_custkey, c_mktsegment AS segment,
           round(c_acctbal, 2) AS acctbal, 'existing' AS row_origin
    FROM customer
),
merged AS (
    SELECT t.* FROM target t
    ANTI JOIN source s ON t.c_custkey = s.c_custkey
    UNION ALL
    SELECT * FROM source
)
SELECT row_origin, count(*) AS n, round(sum(acctbal), 2) AS total_bal
FROM merged
GROUP BY row_origin
""",
)
def merge_upsert_balances(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S17 MERGE upsert: an update batch (BUILDING customers, +100
    balance) plus an insert batch (new synthetic keys) merged into the
    customer snapshot; rollup by row origin proves matched rows were
    replaced, unmatched kept, new rows inserted."""
    c = load(spark, sf_dir, "customer")
    target = c.select(
        "c_custkey",
        F.col("c_mktsegment").alias("segment"),
        F.round("c_acctbal", 2).alias("acctbal"),
        F.lit("existing").alias("row_origin"),
    )
    updates = c.filter(F.col("c_mktsegment") == "BUILDING").select(
        "c_custkey",
        F.col("c_mktsegment").alias("segment"),
        F.round(F.col("c_acctbal") + 100.0, 2).alias("acctbal"),
        F.lit("updated").alias("row_origin"),
    )
    inserts = c.filter(F.col("c_custkey") % 100 == 0).select(
        (F.col("c_custkey") + 1000000).alias("c_custkey"),
        F.lit("NEWSEG").alias("segment"),
        F.lit(42.0).alias("acctbal"),
        F.lit("inserted").alias("row_origin"),
    )
    merged = merge_upsert(target, updates.unionByName(inserts), ["c_custkey"])
    return merged.groupBy("row_origin").agg(
        F.count(F.lit(1)).alias("n"), F.round(F.sum("acctbal"), 2).alias("total_bal")
    )


@register(
    "append_dedup_signals",
    survey="S16,S18,S19,F5",
    oracle="""
WITH existing AS (
    SELECT md5(text) AS content_hash FROM documents WHERE doc_id < 250
),
incoming AS (
    SELECT doc_id, md5(text) AS content_hash FROM documents
)
SELECT count(*) AS n_new,
       count(DISTINCT content_hash) AS n_new_hashes
FROM (
    SELECT i.* FROM incoming i
    ANTI JOIN existing e ON i.content_hash = e.content_hash
)
""",
)
def append_dedup_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S18 insert-if-absent: re-ingesting the full corpus against a
    half-loaded table appends only unseen content hashes."""
    d = load(spark, sf_dir, "documents")
    existing = d.filter(F.col("doc_id") < 250).select(F.md5("text").alias("content_hash"))
    incoming = d.select("doc_id", F.md5("text").alias("content_hash"))
    new = append_dedup(existing, incoming, "content_hash")
    return new.agg(
        F.count(F.lit(1)).alias("n_new"),
        F.countDistinct("content_hash").alias("n_new_hashes"),
    )
