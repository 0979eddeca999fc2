"""The flagship scoring DAG — per-company Org-AI-R composite from raw
evidence in a single DataFrame plan (reference pipeline
scripts/run_scoring_engine.py:286-554, steps traced in SURVEY.md §3.1).

Where the reference loops companies serially and round-trips Snowflake
per step, this is one declarative plan: Catalyst fuses the stages,
reuses the company_id partitioning across VR/HHI/composite, and
broadcasts every config table.  Scoring 10 companies or 10 million is
the same code.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.cache import tracked_persist
from ..functions.core import clamp, round_stable
from .composite import composite_score, with_score_band
from .config import DEFAULT_HR_BASE, SECTOR_HR_BASE
from .demo_domain import companies, dimension_scores_from, evidence_rows
from .hr import hr_score
from .synergy import formula_synergy
from .talent import hhi, hhi_penalty_factor
from .vr import vr_scores


def _hr_base_expr(sector_col):
    it = iter(SECTOR_HR_BASE.items())
    s0, v0 = next(it)
    expr = F.when(sector_col == s0, F.lit(v0))
    for s, v in it:
        expr = expr.when(sector_col == s, F.lit(v))
    return expr.otherwise(F.lit(DEFAULT_HR_BASE))


def score_portfolio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full pipeline: evidence → dimension scores → VR (+CV penalty,
    HHI penalty) → HR → formula synergy → composite + band.

    Returns one row per company:
      company_id, sector, vr_score, hr_score, synergy_score,
      composite_score, score_band, hhi, hhi_factor, n_items
    (floats rounded 4dp; hhi 6dp).
    """
    comp = companies(spark, sf_dir)
    # One evidence join feeds BOTH the dimension-score aggregate and
    # the supplier HHI — persist it instead of re-running the
    # lineitem⋈orders join per consumer (at scale: the silver
    # evidence table written once per run).  Persist it PARTITIONED BY
    # company_id: hash(company_id) satisfies the clustered distribution
    # of every downstream grain — groupBy(company_id, dimension),
    # groupBy(company_id, supp_key), the HHI share window, and the
    # company_id groupBys/joins above them — so the whole post-evidence
    # DAG runs shuffle-free (one exchange here replaces four after the
    # persist; plan-pinned in tests/test_plans.py).
    ev = tracked_persist(
        evidence_rows(spark, sf_dir).repartition("company_id"),
        "org_air_flagship.evidence",
    )
    ds = dimension_scores_from(ev)

    vr = vr_scores(ds)  # company_id, vr_raw, cv, cv_penalty, vr_score(=raw·pen)

    supplier_hhi = hhi(
        ev.select("company_id", "supp_key"),
        key="company_id",
        category="supp_key",
    )
    return assemble_composite(vr, supplier_hhi, comp)


def assemble_composite(
    vr: DataFrame, supplier_hhi: DataFrame, comp: DataFrame
) -> DataFrame:
    """Post-VR assembly shared by the batch flagship and the
    incremental (partials-fed) path: HHI penalty → HR → synergy →
    composite + band.  Inputs: vr_scores output, hhi output
    (company_id, hhi, n_items), companies (company_id, sector,
    position_factor)."""
    # withColumns batches (r13, guide §5 driver / §7.3 planning):
    # every classic-API DataFrame op eagerly re-analyzes its whole
    # subtree JVM-side, so a 7-op withColumn chain over the scoring
    # DAG paid 7 analyzer walks; grouping the independent columns into
    # dependency levels keeps the same named columns and arithmetic
    # with 3 walks.  Joins unchanged (inner, company_id) — comp's
    # columns don't collide with the vr⋈hhi set.
    scored = (
        vr.join(supplier_hhi, "company_id")
        .join(comp, "company_id")
        .withColumns(
            {
                "hhi_factor": hhi_penalty_factor("hhi", "n_items"),
                "hr_base": _hr_base_expr(F.col("sector")),
            }
        )
        .withColumns(
            {
                "vr_final": clamp(
                    F.col("vr_score") * F.col("hhi_factor"), 0.0, 100.0
                ),
                "hr_final": hr_score("hr_base", "position_factor"),
            }
        )
        .withColumn("syn_final", formula_synergy("vr_final", "hr_final"))
        .withColumn(
            "composite_score",
            round_stable(composite_score("vr_final", "hr_final", "syn_final"), 4),
        )
    )
    out = with_score_band(scored).select(
        "company_id",
        "sector",
        round_stable("vr_final", 4).alias("vr_score"),
        round_stable("hr_final", 4).alias("hr_score"),
        round_stable("syn_final", 4).alias("synergy_score"),
        "composite_score",
        "score_band",
        round_stable("hhi", 6).alias("hhi"),
        F.col("hhi_factor"),
        F.col("n_items"),
    )
    return out
