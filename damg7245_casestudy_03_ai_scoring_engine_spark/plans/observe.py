"""Pipeline observability via the Observation API (the audit-trail
analog of the reference's per-stage audit_log appends,
scripts/run_scoring_engine.py:168-188, without a second job).

`df.observe(...)` attaches aggregate metrics that are computed AS THE
QUERY RUNS — zero extra scans, exactly-once per action — and read
back on the driver after the action completes.  At 100 TB this is how
every pipeline stage reports row counts / null rates / value bounds
to the run log for free, instead of re-aggregating the stage output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def with_quality_observation(
    df: DataFrame, value_col: str, name: str = "quality"
) -> tuple[DataFrame, Observation]:
    """Attach the standard stage-quality metrics to a frame: row
    count, nulls in `value_col`, and its min/max.  Returns the
    observed frame plus the Observation handle; read `obs.get` after
    the first action on the returned frame."""
    obs = Observation(name)
    observed = df.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col(value_col).isNull().cast("long")).alias("n_nulls"),
        F.min(value_col).alias("min_v"),
        F.max(value_col).alias("max_v"),
    )
    return observed, obs
