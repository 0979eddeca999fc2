"""VR model — the confidence-floored weighted mean over dimension
scores (reference app/scoring_engine/vr_model.py:50-96) plus the CV
penalty (scripts/run_scoring_engine.py:37-44,328-329).

The reference computes this per company in a Python loop; here it is
one `groupBy('company_id')` aggregation — scoring N companies is the
same job as scoring one, and the aggregate is partial-aggregatable
(map-side combine) so it scales to any number of evidence rows.

Input schema (dimension_scores):
    company_id, dimension, score double [0,100],
    weight double [0,1] (nullable -> default per-dim weight),
    confidence double [0,1] (nullable -> 0)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.core import clamp, conf_floor
from .config import CONFIDENCE_FLOOR, DEFAULT_DIM_WEIGHTS
from .config import dimension_case


def vr_scores(dimension_scores: DataFrame, *, with_cv_penalty: bool = True) -> DataFrame:
    """Per-company VR: Σ(score·w·conf_eff)/Σ(w·conf_eff), conf_eff =
    max(conf, 0.20), clamped [0,100]; optional CV penalty
    clamp(1−0.25·cv, 0, 1) where cv = stddev_pop/|mean| of the raw
    dimension scores.

    Returns: company_id, vr_raw, cv, cv_penalty, vr_score.
    """
    ds = dimension_scores.select(
        "company_id",
        "dimension",
        F.coalesce(F.col("score"), F.lit(0.0)).alias("score"),
        F.coalesce(
            F.col("weight"), dimension_case(F.col("dimension"), DEFAULT_DIM_WEIGHTS)
        ).alias("w"),
        conf_floor("confidence", CONFIDENCE_FLOOR).alias("conf_eff"),
    )
    den = F.sum(F.col("w") * F.col("conf_eff"))
    num = F.sum(F.col("score") * F.col("w") * F.col("conf_eff"))
    cv = F.when(
        F.abs(F.avg("score")) > 0, F.stddev_pop("score") / F.abs(F.avg("score"))
    ).otherwise(F.lit(0.0))
    agg = ds.groupBy("company_id").agg(
        clamp(F.when(den != 0, num / den).otherwise(F.lit(0.0)), 0.0, 100.0).alias("vr_raw"),
        cv.alias("cv"),
    )
    if not with_cv_penalty:
        return agg.withColumn("vr_score", F.col("vr_raw"))
    pen = clamp(F.lit(1.0) - 0.25 * F.col("cv"), 0.0, 1.0)
    return agg.withColumn("cv_penalty", pen).withColumn(
        "vr_score", clamp(F.col("vr_raw") * F.col("cv_penalty"), 0.0, 100.0)
    )
