"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Everything is backed by the operator registry in
``damg7245_casestudy_03_ai_scoring_engine_spark.operators`` — one entry per
implemented operator from SURVEY.md §2 plus the LLM-data-pipeline
extensions (dedup / similarity / text analysis / multimodal).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from damg7245_casestudy_03_ai_scoring_engine_spark.operators import REGISTRY  # noqa: E402

_SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the full Org-AI-R
    scoring pipeline (evidence → dimension scores → VR/CV/HHI → HR →
    synergy → composite + band) as one DataFrame DAG."""
    return REGISTRY["org_air_flagship"].fn(spark, _SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.fn for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalent for each query (omitted for
    non-SQL-expressible ops → driver records a rows-only check)."""
    return {name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle}
