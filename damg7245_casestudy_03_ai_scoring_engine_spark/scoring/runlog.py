"""Run orchestration + audit trail (SURVEY.md §3 steps 2/9/10).

The reference wraps every scoring run in a `scoring_runs` row, writes
per-stage `scoring_audit_log` entries with input/output JSON, and
persists a nested `dimension_breakdown_json` per company (reference
scripts/run_scoring_engine.py:133-154, 168-188, 468-530).

Spark shape: the run row and audit entries are small DataFrames
appended per stage (S16 append-only sink); the breakdown is assembled
columnar — collect_list of per-dimension structs per company,
serialized to a canonical JSON string.  Determinism rules from
SURVEY §7: run ids are content hashes, not uuid4; a single run
timestamp is stamped by the caller, never per-row wall clock.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def run_id_for(tickers: list[str], model_version: str, run_ts: str) -> str:
    """Deterministic run id — sha256 of the natural key (reference
    uses uuid4, run_scoring_engine.py:122,133; hash-derived ids make
    reruns reproducible, SURVEY §7)."""
    import hashlib

    key = f"{model_version}|{run_ts}|{','.join(sorted(tickers))}"
    return hashlib.sha256(key.encode()).hexdigest()[:32]


def scoring_run_row(
    spark: SparkSession,
    run_id: str,
    tickers: list[str],
    model_version: str,
    run_ts: str,
    status: str = "running",
) -> DataFrame:
    """The `scoring_runs` row (schema.sql:162-170 shape)."""
    return spark.createDataFrame(
        [
            (
                run_id,
                run_ts,
                ",".join(sorted(tickers)),
                model_version,
                status,
            )
        ],
        "run_id string, run_timestamp string, companies_scored string, "
        "model_version string, status string",
    )


def audit_entries(
    stage_output: DataFrame, run_id: str, step_name: str, key_col: str = "company_id"
) -> DataFrame:
    """Per-stage audit rows: (run_id, step_name, company_id,
    output_json) — the columnar form of the reference's per-step
    audit inserts (run_scoring_engine.py:302-323 etc.).  output_json
    is `to_json(struct(*))` of the stage's row, so the audit carries
    the full stage output without a fixed schema."""
    payload = F.to_json(F.struct(*[F.col(c) for c in stage_output.columns]))
    return stage_output.select(
        F.lit(run_id).alias("scoring_run_id"),
        F.lit(step_name).alias("step_name"),
        F.col(key_col).alias("company_id"),
        payload.alias("output_json"),
    )


def append_audit(entries: DataFrame, path: str) -> None:
    """S16 append-only sink for the audit table."""
    entries.write.mode("append").parquet(path)


def dimension_breakdown(ds: DataFrame) -> DataFrame:
    """Per company: canonical JSON array of per-dimension entries —
    the `dimension_breakdown_json` shape (run_scoring_engine.py:
    468-530).  Assembled with explicit string concat (not to_json) so
    the byte output is engine-agnostic and oracle-checkable: entries
    sorted by dimension, scores rounded to 2dp.

    Input: company_id, dimension, score, confidence, evidence_count.
    """
    entry = F.concat(
        F.lit('{"dimension":"'),
        F.col("dimension"),
        F.lit('","score":'),
        F.round(F.col("score"), 2).cast("string"),
        F.lit(',"confidence":'),
        F.round(F.col("confidence"), 2).cast("string"),
        F.lit(',"evidence_count":'),
        F.col("evidence_count").cast("string"),
        F.lit("}"),
    )
    per_dim = ds.select("company_id", F.col("dimension"), entry.alias("entry"))
    return (
        per_dim.groupBy("company_id")
        .agg(F.array_sort(F.collect_list(F.struct("dimension", "entry"))).alias("es"))
        .select(
            "company_id",
            F.concat(
                F.lit("["),
                F.concat_ws(",", F.transform("es", lambda e: e["entry"])),
                F.lit("]"),
            ).alias("dimension_breakdown_json"),
        )
    )


def score_portfolio_with_audit(
    spark: SparkSession,
    sf_dir: str,
    audit_path: str,
    model_version: str = "v1.0-spark",
    run_ts: str = "1970-01-01T00:00:00Z",
) -> tuple[str, DataFrame]:
    """Full run: scoring_runs row + per-stage audit appends + final
    scores with breakdown JSON.  Returns (run_id, scores_df); the
    audit table lands at `audit_path`."""
    from .demo_domain import dimension_scores
    from .pipeline import score_portfolio

    run_id = run_id_for(["PORTFOLIO"], model_version, run_ts)
    run_row = scoring_run_row(
        spark, run_id, ["PORTFOLIO"], model_version, run_ts
    )
    run_row.write.mode("append").parquet(f"{audit_path}/scoring_runs")

    ds = dimension_scores(spark, sf_dir)
    append_audit(
        audit_entries(ds, run_id, "dimension_scoring"), f"{audit_path}/audit_log"
    )

    scores = score_portfolio(spark, sf_dir)
    append_audit(
        audit_entries(scores, run_id, "final_write"), f"{audit_path}/audit_log"
    )

    breakdown = dimension_breakdown(
        ds.select("company_id", "dimension", "score", "confidence", "evidence_count")
    )
    final = scores.join(breakdown, "company_id", "left").withColumn(
        "scoring_run_id", F.lit(run_id)
    )
    return run_id, final
