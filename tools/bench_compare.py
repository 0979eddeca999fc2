"""Round-over-round bench ledger.

Reads every BENCH_r*.json the driver has recorded (plus, optionally, a
local bench JSON via --local), and emits one markdown table per query:
latest time, ratio vs the previous round, ratio vs round 1, and whether
the query's PLANS.md pin row changed since the previous round (pulled
from git at the commit that introduced each BENCH file).  This replaces
the by-hand ambient-noise-vs-regression argument the round verdicts kept
re-deriving: a >1.2x delta with an UNCHANGED plan pin is ambient/contention
until profiled standalone; a delta with a CHANGED pin is a real plan shift.

Usage:
    python tools/bench_compare.py [--local my_bench.json] [--write BENCH_COMPARE.md]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_round(path: str) -> dict[str, float]:
    with open(path) as f:
        d = json.load(f)
    parsed = d.get("parsed") or d
    return dict(parsed.get("queries") or {})


def _plan_rows_at(commit: str | None) -> dict[str, str]:
    """PLANS.md pin rows (query -> full row text) at a commit (None = worktree)."""
    try:
        if commit is None:
            with open(os.path.join(REPO, "PLANS.md")) as f:
                text = f.read()
        else:
            text = subprocess.run(
                ["git", "show", f"{commit}:PLANS.md"],
                cwd=REPO, capture_output=True, text=True, check=True,
            ).stdout
    except (OSError, subprocess.CalledProcessError):
        return {}
    rows: dict[str, str] = {}
    for line in text.splitlines():
        m = re.match(r"\| `([a-z0-9_]+)` \|(.*)", line)
        if m:
            cells = [c.strip() for c in m.group(2).strip().strip("|").split("|")]
            # Drop the codegen-span cell (3rd column) from the pin
            # comparison: it counts JIT spans, not plan structure, and
            # its r6 methodology fix (AQE-final plans — it read 0 for
            # every query before) would otherwise mark every row
            # CHANGED across that boundary.
            if len(cells) >= 5:
                cells = cells[:2] + cells[3:]
            rows[m.group(1)] = " | ".join(cells)
    return rows


def _bench_commit(path: str) -> str | None:
    """Commit that introduced (last touched) this BENCH file."""
    out = subprocess.run(
        ["git", "log", "-1", "--format=%H", "--", os.path.basename(path)],
        cwd=REPO, capture_output=True, text=True,
    ).stdout.strip()
    return out or None


def _fmt_ratio(cur: float | None, prev: float | None) -> str:
    if cur is None or prev is None or prev == 0:
        return "—"
    r = cur / prev
    flag = " ⚠" if r > 1.2 else ""
    return f"{r:.2f}x{flag}"


def build_table(local_json: str | None = None) -> str:
    paths = sorted(glob.glob(os.path.join(REPO, "BENCH_r*.json")))
    if not paths:
        return "No BENCH_r*.json files found.\n"
    rounds = {
        int(re.search(r"BENCH_r(\d+)", p).group(1)): p for p in paths
    }
    nums = sorted(rounds)
    data = {n: _load_round(rounds[n]) for n in nums}
    plans = {n: _plan_rows_at(_bench_commit(rounds[n])) for n in nums}

    latest, label = nums[-1], f"r{nums[-1]}"
    if local_json:
        data["local"] = _load_round(local_json)
        plans["local"] = _plan_rows_at(None)  # worktree PLANS.md
        nums = [*nums, "local"]
        latest, label = "local", f"local (vs r{nums[-2]})"
    prev = nums[-2] if len(nums) > 1 else None
    first = nums[0]

    queries = sorted(set().union(*(data[n] for n in nums)))
    lines = [
        f"# Bench ledger — {label}",
        "",
        "Ratios >1.2x are flagged ⚠; 'plan' compares this query's PLANS.md pin",
        "row between the two rounds' commits (same → delta is ambient-suspect,",
        "profile standalone per BASELINE.md contention rules before acting).",
        "",
        f"| Query | {label} s | vs r{prev} | vs r{first} | plan vs r{prev} |",
        "|---|---|---|---|---|",
    ]
    for q in queries:
        cur = data[latest].get(q)
        pv = data[prev].get(q) if prev is not None else None
        fv = data[first].get(q)
        if plans.get(latest, {}).get(q) is None or plans.get(prev, {}).get(q) is None:
            pin = "—"
        elif plans[latest][q] == plans[prev][q]:
            pin = "same"
        else:
            pin = "CHANGED"
        cur_s = f"{cur:.3f}" if cur is not None else "—"
        lines.append(
            f"| `{q}` | {cur_s} | {_fmt_ratio(cur, pv)} | {_fmt_ratio(cur, fv)} | {pin} |"
        )

    def total(n):
        return sum(data[n].values())

    lines += [
        "",
        "Shared-query totals (only queries present in both rounds):",
        "",
        "| Rounds | this | that | ratio |",
        "|---|---|---|---|",
    ]
    for other in ([prev] if prev is not None else []) + ([first] if first != prev else []):
        shared = set(data[latest]) & set(data[other])
        a = sum(data[latest][q] for q in shared)
        b = sum(data[other][q] for q in shared)
        lines.append(
            f"| {label} vs r{other} ({len(shared)} shared) | {a:.2f} s | {b:.2f} s | {a / b:.2f}x |"
        )
    lines.append("")
    return "\n".join(lines)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--local", help="local bench JSON (bench.py output line or driver shape)")
    ap.add_argument("--write", help="also write the table to this file")
    args = ap.parse_args()
    table = build_table(args.local)
    sys.stdout.write(table)
    if args.write:
        with open(args.write, "w") as f:
            f.write(table)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
