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


def live_parquet_scan_count(df: DataFrame) -> int:
    """Parquet scans in the LIVE physical plan — the walk stops at
    InMemoryTableScan, so a persisted subtree's own scans (shown by
    explain inside the cached relation, but never re-executed) don't
    count.  This is the pin for 'this plan reads persisted metadata,
    not the corpus': explain-string greps can't distinguish a live
    scan from one frozen inside an InMemoryRelation."""
    plan = df._jdf.queryExecution().executedPlan()

    def walk(node) -> int:
        name = node.nodeName()
        if name == "AdaptiveSparkPlan":
            return walk(node.initialPlan())  # root AND nested AQE wrappers
        if "InMemoryTableScan" in name:
            return 0
        n = 1 if name.startswith("Scan parquet") else 0
        # innerChildren carries subquery plans (Subquery/ScalarSubquery
        # bodies) — a corpus scan moved into a subquery still executes,
        # so the honesty pins must see it (r11 self-review fix)
        ic = node.innerChildren()
        n += sum(walk(ic.apply(i)) for i in range(ic.size()))
        ch = node.children()
        return n + sum(walk(ch.apply(i)) for i in range(ch.size()))

    return walk(plan)
