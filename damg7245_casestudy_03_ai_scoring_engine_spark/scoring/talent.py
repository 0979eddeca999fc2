"""Talent concentration / HHI penalty stack.

Reference semantics:
- HHI (app/scoring_engine/talent_penalty.py:126-140): counts by job
  function → shares → Σ share².
- HHI penalty tiering (talent_penalty.py:143-188): with n ≥
  min_sample_size (15): factor 0.85 if HHI ≥ 0.70, 0.95 if ≥ 0.40,
  else 1.0; below min sample → 1.0.
- Talent concentration TC (app/scoring/talent_concentration.py:18-45):
  0.4·leadership_ratio + 0.3·min(1, 1/(√n+0.1)) + 0.2·max(0,
  1−|skills|/15) + 0.1·individual_factor, clamped [0,1].
- Talent risk adjustment (talent_concentration.py:93-100):
  1 − 0.15·max(0, TC−0.25), clamped [0,1].

All pure column math; HHI uses a window share so the whole stack is
two shuffles (group count + company rollup) regardless of row count.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.core import clamp
from .config import TALENT_PENALTY_CONFIG


def hhi(items: DataFrame, key: str = "company_id", category: str = "job_function") -> DataFrame:
    """Per-key Herfindahl index over category shares.

    Returns: <key>, hhi double, n_items long.
    """
    counts = items.groupBy(key, category).agg(F.count(F.lit(1)).alias("cnt"))
    # share via one selectExpr parse (r13, guide §5/§7.3) — the same
    # window the Column chain built.  The interpolated identifier is
    # backtick-quoted (the asof.py discipline) so a non-identifier
    # column name (spaces, reserved words) that Window.partitionBy(key)
    # accepted cannot misparse (r13 advisor note).
    return (
        counts.selectExpr(
            "*",
            "CAST(cnt AS DOUBLE) / sum(cnt) OVER "
            f"(PARTITION BY `{key}`) AS share",
        )
        .groupBy(key)
        .agg(
            F.expr("sum(pow(share, 2))").alias("hhi"),
            F.expr("sum(cnt)").alias("n_items"),
        )
    )


def hhi_from_counts(
    counts: DataFrame, key: str = "company_id", count_col: str = "cnt"
) -> DataFrame:
    """HHI from PRE-AGGREGATED (key, category) counts — the mergeable
    form the incremental pipeline maintains (category identity is
    already folded into the count rows).  Same output contract as
    `hhi`: <key>, hhi double, n_items long."""
    w = Window.partitionBy(key)
    share = F.col(count_col).cast("double") / F.sum(count_col).over(w)
    return (
        counts.withColumn("share", share)
        .groupBy(key)
        .agg(
            F.sum(F.pow("share", 2)).alias("hhi"),
            F.sum(count_col).cast("long").alias("n_items"),
        )
    )


def hhi_penalty_factor(
    hhi_col: Column | str, n_col: Column | str, cfg: dict | None = None
) -> Column:
    cfg = cfg or TALENT_PENALTY_CONFIG
    if isinstance(hhi_col, str) and isinstance(n_col, str):
        # single-parse twin of the when-ladder below (r13, guide §5)
        from ..functions.core import flit

        return F.expr(
            f"CASE WHEN {n_col} < {cfg['min_sample_size']} THEN 1.0D "
            f"WHEN {hhi_col} >= {flit(cfg['hhi_threshold_severe'])} "
            f"THEN {flit(cfg['penalty_factor_severe'])} "
            f"WHEN {hhi_col} >= {flit(cfg['hhi_threshold_mild'])} "
            f"THEN {flit(cfg['penalty_factor_mild'])} "
            "ELSE 1.0D END"
        )
    h = F.col(hhi_col) if isinstance(hhi_col, str) else hhi_col
    n = F.col(n_col) if isinstance(n_col, str) else n_col
    return (
        F.when(n < cfg["min_sample_size"], F.lit(1.0))
        .when(h >= cfg["hhi_threshold_severe"], F.lit(cfg["penalty_factor_severe"]))
        .when(h >= cfg["hhi_threshold_mild"], F.lit(cfg["penalty_factor_mild"]))
        .otherwise(F.lit(1.0))
    )


def talent_concentration(
    leadership_ratio: Column,
    n_postings: Column,
    n_skills: Column,
    individual_factor: Column | float = 0.0,
) -> Column:
    """TC formula (app/scoring/talent_concentration.py:18-45)."""
    ind = (
        F.lit(float(individual_factor))
        if isinstance(individual_factor, (int, float))
        else individual_factor
    )
    team = F.least(F.lit(1.0), F.lit(1.0) / (F.sqrt(n_postings.cast("double")) + 0.1))
    skills = F.greatest(F.lit(0.0), F.lit(1.0) - n_skills.cast("double") / 15.0)
    return clamp(0.4 * leadership_ratio + 0.3 * team + 0.2 * skills + 0.1 * ind, 0.0, 1.0)


def talent_risk_adjustment(tc: Column | str) -> Column:
    """1 − 0.15·max(0, TC−0.25) clamped [0,1]
    (talent_concentration.py:93-100)."""
    t = F.col(tc) if isinstance(tc, str) else tc
    return clamp(F.lit(1.0) - 0.15 * F.greatest(F.lit(0.0), t - 0.25), 0.0, 1.0)
