"""MLlib twins for the statistical core (SURVEY.md §2.9 M13/M14).

The registry's closed-form implementations (sem_queries.py) are the
oracle-checked production path; these MLlib pipelines are the
library-backed equivalents the north star calls for ("MLlib pipeline
+ Spark SQL") — VectorAssembler → StandardScaler → PCA for the
one-factor loadings, and LinearRegression for the OLS stage.  pytest
(tests/test_mllib_parity.py) proves the two paths agree (loadings up
to sign, OLS coefficients to 6dp), so either can serve at scale.

Both queries are rows-only in the driver gate: eigen-decompositions
and iterative solvers are not expressible in portable SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..scoring import config as C
from ..scoring.demo_domain import dimension_scores
from .registry import register


def _pivoted_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    # complete-case: companies missing a dimension are excluded from
    # the factor fit (VectorAssembler cannot carry nulls, and imputing
    # zeros would bend the factor toward missingness patterns)
    ds = dimension_scores(spark, sf_dir).select("company_id", "dimension", "score")
    return (
        ds.groupBy("company_id")
        .pivot("dimension", list(C.DIMENSIONS))
        .agg(F.max("score"))
        .dropna()
    )


@register(
    "mllib_pca_loadings",
    survey="M13 (MLlib pipeline twin)",
    # rows-only: eigenvector extraction is not portable SQL
)
def mllib_pca_loadings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M13 via the MLlib pipeline: VectorAssembler → StandardScaler
    (mean/unit-variance, matching the closed form's z-scores) →
    PCA(k=1); |loadings| normalized to Σ=1 (reference
    sem_confidence.py:35-65).  Output: one row per dimension with its
    loading — sign-canonicalized (Σ raw loading ≥ 0) so reruns and
    eigen-solver sign flips don't change the result."""
    from pyspark.ml.feature import PCA, StandardScaler, VectorAssembler

    dims = list(C.DIMENSIONS)
    pivoted = _pivoted_scores(spark, sf_dir)
    vec = VectorAssembler(inputCols=dims, outputCol="raw").transform(pivoted)
    scaled = (
        StandardScaler(inputCol="raw", outputCol="z", withMean=True, withStd=True)
        .fit(vec)
        .transform(vec)
    )
    model = PCA(k=1, inputCol="z", outputCol="eta").fit(scaled)
    pc = [model.pc[i, 0] for i in range(len(dims))]
    if sum(pc) < 0:  # canonical sign
        pc = [-x for x in pc]
    total = sum(abs(x) for x in pc) or 1.0
    loadings = [abs(x) / total for x in pc]
    return spark.createDataFrame(
        [(d, round(float(l), 6)) for d, l in zip(dims, loadings)],
        "dimension string, loading double",
    )


@register(
    "mllib_ols_fit",
    survey="M14 (MLlib LinearRegression twin)",
    # rows-only: iterative/normal-equation solver, not portable SQL
)
def mllib_ols_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M14 via pyspark.ml.regression.LinearRegression (normal
    solver, no regularization): composite ~ mean dimension score per
    company — the library twin of the closed-form slope/intercept
    aggregates (reference sem_confidence.py:68-182).  Output: one row
    with slope, intercept, r2."""
    from pyspark.ml.feature import VectorAssembler
    from pyspark.ml.regression import LinearRegression

    ds = dimension_scores(spark, sf_dir)
    per_company = ds.groupBy("company_id").agg(
        F.avg("score").alias("x"),
        (F.avg("score") * 0.9 + F.avg("confidence") * 10.0).alias("y"),
    )
    vec = VectorAssembler(inputCols=["x"], outputCol="features").transform(per_company)
    lr = LinearRegression(
        featuresCol="features", labelCol="y", regParam=0.0, solver="normal"
    ).fit(vec)
    return vec.sparkSession.createDataFrame(
        [
            (
                round(float(lr.coefficients[0]), 6),
                round(float(lr.intercept), 6),
                round(float(lr.summary.r2), 6),
            )
        ],
        "slope double, intercept double, r2 double",
    )
