#!/usr/bin/env python
"""Regenerate REGISTRY.md from the operator registry."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from damg7245_casestudy_03_ai_scoring_engine_spark.operators import REGISTRY  # noqa: E402

# Cumulative-driver-audit classifications: queries whose historical
# CORRECTNESS_r{N}.json rows can't read green in a naive sweep, with
# the reason — so an auditor never mistakes them for failures.
AUDIT_NOTES = {
    "approx_distinct": (
        "rows-only BY NATURE (HLL estimate has no deterministic SQL twin); "
        "its r1 driver row is a `no_oracle` rows-only check and can never "
        "carry a value-hash — pytest pins the estimate against exact "
        "distinct within HLL error bounds"
    ),
    "pandas_api_bridge": (
        "driver-run in r2 BEFORE its DuckDB oracle landed (that r2 row is a "
        "historical `no_oracle` check); windowed again in r8 with its full "
        "oracle — the CORRECTNESS_r08.json row supersedes the r2 artifact"
    ),
}

lines = [
    "# Query Registry Index",
    "",
    "Auto-generated from `damg7245_casestudy_03_ai_scoring_engine_spark/operators` "
    "(regenerate: `python tools/gen_registry_md.py`).",
    f"\n{len(REGISTRY)} queries; 'oracle' = DuckDB twin checked by the driver gate, "
    "'rows-only' = non-SQL-expressible (iterative / sketch / UDTF / MLlib), "
    "cross-checked in pytest instead.",
    "",
    "Cumulative-driver-audit notes (why a naive sweep over all "
    "`CORRECTNESS_r*.json` shows these as never hash-green):",
    *[f"- `{k}`: {v}" for k, v in sorted(AUDIT_NOTES.items())],
    "",
    "| Query | Check | SURVEY §2 / role | Summary |",
    "|---|---|---|---|",
]
for name in sorted(REGISTRY):
    s = REGISTRY[name]
    doc = (s.fn.__doc__ or "").strip().split("\n")[0].strip()
    check = "oracle" if s.oracle else "rows-only"
    survey = (s.survey or "").replace("|", "/")
    lines.append(f"| `{name}` | {check} | {survey} | {doc} |")

lines += [
    "",
    "Lakehouse-maintenance surface (beyond the query registry): "
    "`append_file_bloom_index` (incremental secondary-index append, pinned "
    "== full rebuild, loud width-mismatch guard) and `bloom_rebuild_decision` "
    "(median-fill saturation trigger proposing a re-sized generation) in "
    "operators/layout.py, exercised by tests/test_sources.py; the registered "
    "`compaction_plan_bins` covers the OPTIMIZE-planning half.",
]

out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "REGISTRY.md")
with open(out, "w") as f:
    f.write("\n".join(lines) + "\n")
print(f"wrote {len(REGISTRY)} entries to {out}")
