"""Physical-plan inspection helpers — the feedback loop for the scale
requirements: is the filter pushed to the scan, is the dim join a
broadcast, is the projection pruned?  Used by tests to pin plan
properties, not just results (SURVEY.md §4)."""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode
    )


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in explain_str(df)


def pushed_filters(df: DataFrame) -> list[str]:
    """PushedFilters lists from every parquet scan in the plan."""
    s = explain_str(df)
    return re.findall(r"PushedFilters: \[([^\]]*)\]", s)


def scan_columns(df: DataFrame) -> list[str]:
    """ReadSchema strings from every scan — check column pruning."""
    s = explain_str(df)
    return re.findall(r"ReadSchema: ([^\n]*)", s)
