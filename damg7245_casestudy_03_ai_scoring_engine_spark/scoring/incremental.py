"""Incremental flagship scoring — the streaming twin of
`score_portfolio`.

The batch flagship aggregates ALL evidence per run.  This module
maintains the two MERGEABLE partial tables those aggregates decompose
into, so a micro-batch of new evidence updates the portfolio scores
without rescanning history:

- dim partials:  (company_id, dimension) → (sum_score, sum_conf, n)
  — dimension score = sum_score/n, confidence = sum_conf/n.
- supplier counts: (company_id, supp_key) → n — the HHI input.

Every downstream stage (VR, CV penalty, HHI penalty, HR, synergy,
composite) is a pure function of those aggregates, so serving reads
derive the EXACT batch result from the gold partials — proven in
tests/test_incremental_scoring.py against `score_portfolio` on the
same data.

This is the §7 risk-register answer to the reference's score-time
side effects (run_scoring_engine.py:689-750): ingestion merges
partials; scoring is a read-only view over them.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .demo_domain import companies
from .pipeline import assemble_composite
from .talent import hhi_from_counts
from .vr import vr_scores

DIM_PARTIALS = "dim_partials"
SUPP_COUNTS = "supp_counts"


def evidence_partials(ev: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Decompose an evidence frame into the two mergeable partials."""
    dims = ev.groupBy("company_id", "dimension").agg(
        F.sum("score_raw").alias("sum_score"),
        F.sum("conf_raw").alias("sum_conf"),
        F.count(F.lit(1)).alias("n"),
    )
    supp = ev.groupBy("company_id", "supp_key").agg(F.count(F.lit(1)).alias("n"))
    return dims, supp


_BATCH_MARKER = "_last_batch_id"


def _last_applied(path: str) -> int:
    marker = os.path.join(path, _BATCH_MARKER)
    if os.path.isfile(marker):
        with open(marker) as fh:
            return int(fh.read().strip())
    return -1


def merge_partials(gold_dir: str):
    """foreachBatch body: merge one micro-batch's evidence partials
    into the gold partial tables (same union+groupBy+atomic-swap
    pattern as the incremental window rollup; MERGE on Delta).

    Idempotent under replay: Structured Streaming re-runs the last
    uncommitted batch after a crash, so each table carries the max
    applied batch id INSIDE the swapped directory (`_last_batch_id`,
    underscore-prefixed ⇒ invisible to parquet readers).  The marker
    is written into the temp dir BEFORE the atomic `os.replace`, so
    data and marker commit together — there is no window where the
    merge landed but the marker didn't.  A replayed batch id ≤ the
    marker is skipped per table (the two tables can diverge by one
    batch after a mid-upsert crash; the replay then tops up only the
    table that missed it)."""

    def upsert(ev_batch: DataFrame, batch_id: int) -> None:
        spark = ev_batch.sparkSession
        dims, supp = evidence_partials(ev_batch)
        for name, part, keys, sums in (
            (DIM_PARTIALS, dims, ["company_id", "dimension"], ["sum_score", "sum_conf", "n"]),
            (SUPP_COUNTS, supp, ["company_id", "supp_key"], ["n"]),
        ):
            path = f"{gold_dir}/{name}"
            if os.path.isdir(path):
                if batch_id <= _last_applied(path):
                    continue  # replayed batch already merged here
                merged = (
                    spark.read.parquet(path)
                    .unionByName(part)
                    .groupBy(*keys)
                    .agg(*[F.sum(c).alias(c) for c in sums])
                )
            else:
                merged = part
            tmp = f"{path}._tmp_{batch_id}"
            merged.write.mode("overwrite").parquet(tmp)
            with open(os.path.join(tmp, _BATCH_MARKER), "w") as fh:
                fh.write(str(batch_id))
            if os.path.isdir(path):
                shutil.rmtree(path)
            os.replace(tmp, path)

    return upsert


def score_from_partials(
    spark: SparkSession, sf_dir: str, gold_dir: str
) -> DataFrame:
    """Serving view: the full Org-AI-R composite derived from the gold
    partial tables — identical math to `score_portfolio`, zero
    history rescans."""
    dims = spark.read.parquet(f"{gold_dir}/{DIM_PARTIALS}")
    supp = spark.read.parquet(f"{gold_dir}/{SUPP_COUNTS}")
    ds = dims.select(
        "company_id",
        "dimension",
        (F.col("sum_score") / F.col("n")).alias("score"),
        F.lit(None).cast("double").alias("weight"),
        (F.col("sum_conf") / F.col("n")).alias("confidence"),
        F.col("n").alias("evidence_count"),
    )
    vr = vr_scores(ds)
    supplier_hhi = hhi_from_counts(supp, key="company_id", count_col="n")
    comp = companies(spark, sf_dir)
    return assemble_composite(vr, supplier_hhi, comp)


# Only the columns the evidence derivation reads: declaring unused
# columns (the timestamp ones especially) couples the stream to the
# fixture's exact parquet dtypes — the failure class that broke the
# events table in round 2.  A parquet file stream reads a SUBSET
# schema fine; extra file columns are simply never decoded.
LINEITEM_SCHEMA = "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int"


def stream_evidence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Evidence rows as a STREAM: lineitem arrives as files
    (readStream), orders is the static side of a stream-static join —
    the same derivation as demo_domain.evidence_rows, incremental."""
    from .demo_domain import _dimension_expr

    li = (
        spark.readStream.schema(LINEITEM_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .option("pathGlobFilter", "lineitem*.parquet")
        .parquet(sf_dir)
        .select("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber")
    )
    from ..sources.catalog import load

    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    return li.join(o, li.l_orderkey == o.o_orderkey).select(
        F.col("o_custkey").alias("company_id"),
        _dimension_expr(F.col("l_linenumber")).alias("dimension"),
        ((F.col("l_partkey") * 7 + F.col("l_suppkey")) % 101)
        .cast("double")
        .alias("score_raw"),
        ((F.col("l_orderkey") % 10).cast("double") / 10.0).alias("conf_raw"),
        F.col("l_suppkey").alias("supp_key"),
    )


def run_incremental_scoring(
    spark: SparkSession, sf_dir: str, gold_dir: str, checkpoint: str
) -> None:
    """One availableNow pass: stream the evidence source and merge
    partials into the gold tables; call `score_from_partials` to
    serve.  Exactly-once across restarts comes from the checkpointed
    batch ids — a replayed batch is never re-merged."""
    q = (
        stream_evidence(spark, sf_dir)
        .writeStream.foreachBatch(merge_partials(gold_dir))
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
