"""MLlib twins vs closed-form implementations: the two statistical
paths must agree (M13 loadings up to solver sign, M14 OLS to 6dp)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from damg7245_casestudy_03_ai_scoring_engine_spark.operators import REGISTRY
from damg7245_casestudy_03_ai_scoring_engine_spark.scoring import config as C
from damg7245_casestudy_03_ai_scoring_engine_spark.scoring.demo_domain import dimension_scores

from conftest import SF_SMOKE


def test_mllib_pca_matches_power_iteration(spark):
    import numpy as np

    mllib = {
        r.dimension: r.loading
        for r in REGISTRY["mllib_pca_loadings"].fn(spark, SF_SMOKE).collect()
    }
    assert set(mllib) == set(C.DIMENSIONS)
    assert math.isclose(sum(mllib.values()), 1.0, abs_tol=1e-5)

    # independent ground truth: numpy eigendecomposition of the sample
    # correlation matrix over the SAME complete-case pivot
    ds = dimension_scores(spark, SF_SMOKE).select("company_id", "dimension", "score")
    pivoted = (
        ds.groupBy("company_id")
        .pivot("dimension", list(C.DIMENSIONS))
        .agg(F.max("score"))
        .dropna()
    )
    X = np.array([[row[d] for d in C.DIMENSIONS] for row in pivoted.collect()])
    corr = np.corrcoef(X, rowvar=False)
    w, v = np.linalg.eigh(corr)
    top = np.abs(v[:, np.argmax(w)])
    want = top / top.sum()
    for d, expect in zip(C.DIMENSIONS, want):
        assert math.isclose(mllib[d], float(expect), abs_tol=1e-3), (d, mllib[d], expect)


def test_mllib_ols_matches_closed_form(spark):
    row = REGISTRY["mllib_ols_fit"].fn(spark, SF_SMOKE).collect()[0]
    ds = dimension_scores(spark, SF_SMOKE)
    pc = ds.groupBy("company_id").agg(
        F.avg("score").alias("x"),
        (F.avg("score") * 0.9 + F.avg("confidence") * 10.0).alias("y"),
    )
    s = pc.agg(
        F.avg("x").alias("mx"), F.avg("y").alias("my"),
        F.covar_pop("x", "y").alias("sxy"), F.var_pop("x").alias("sxx"),
    ).collect()[0]
    slope = s.sxy / s.sxx
    intercept = s.my - slope * s.mx
    assert math.isclose(row.slope, slope, rel_tol=1e-5)
    assert math.isclose(row.intercept, intercept, rel_tol=1e-5)
    assert 0.0 <= row.r2 <= 1.0


def test_grouped_map_ols_matches_closed_form(spark):
    """The applyInPandas many-models fit must agree with the exact
    integer-sum closed form to 5dp per group."""
    from conftest import SF_SMOKE
    from damg7245_casestudy_03_ai_scoring_engine_spark.operators import REGISTRY

    closed = {
        r.grp: (r.n, round(r.slope, 5), round(r.intercept, 5))
        for r in REGISTRY["grouped_ols"].fn(spark, SF_SMOKE).collect()
    }
    pandas_fit = {
        r.grp: (r.n, round(r.slope, 5), round(r.intercept, 5))
        for r in REGISTRY["grouped_ols_pandas"].fn(spark, SF_SMOKE).collect()
    }
    assert closed == pandas_fit
