#!/usr/bin/env python
"""Regenerate REGISTRY.md from the operator registry."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from damg7245_casestudy_03_ai_scoring_engine_spark.operators import REGISTRY  # noqa: E402

lines = [
    "# Query Registry Index",
    "",
    "Auto-generated from `damg7245_casestudy_03_ai_scoring_engine_spark/operators` "
    "(regenerate: `python tools/gen_registry_md.py`).",
    f"\n{len(REGISTRY)} queries; 'oracle' = DuckDB twin checked by the driver gate, "
    "'rows-only' = non-SQL-expressible (iterative / sketch / UDTF / MLlib), "
    "cross-checked in pytest instead.",
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

out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "REGISTRY.md")
with open(out, "w") as f:
    f.write("\n".join(lines) + "\n")
print(f"wrote {len(REGISTRY)} entries to {out}")
