"""Window-freshness audit — mechanizes the r9 hand rule "queries
touched by this round's code changes are re-windowed so their driver
greens post-date the change".

Maps the round's git-touched operator code → changed top-level defs
(functions AND module-level constants, so an edited oracle string
implicates its query) → registry queries whose static reference
closure contains any changed def → asserts every implicated
oracle-backed query sits inside the driver's 50-query sample (the
first 50 entries of ``__spark_entry__.queries()``).

Usage:
    python tools/window_freshness.py            # base = last round-boundary commit
    python tools/window_freshness.py --base REF # explicit diff base

Exit 0: every implicated oracle-backed query is windowed.
Exit 1: some are missing — add them to ``_PRIORITY`` (or consciously
defer with a comment; the tool's output is meant to be generated THEN
curated, not blindly obeyed).

The closure is static and intra-package: a global name→def map across
all ``operators/*.py`` modules (names are effectively unique — the
map reports collisions), walked transitively from each registered
query's function.  Helper edits (e.g. ``_ivf_cells``) therefore
implicate every query that reaches them, which is exactly the
freshness rule's intent.
"""

from __future__ import annotations

import argparse
import ast
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "damg7245_casestudy_03_ai_scoring_engine_spark"
WINDOW = 50  # the driver samples the first 50 queries() entries

sys.path.insert(0, REPO)


def _git(*args: str) -> str:
    return subprocess.run(
        ["git", *args], cwd=REPO, capture_output=True, text=True, check=False
    ).stdout


def default_base() -> str:
    """Most recent driver round-boundary commit ("round N: ...")."""
    for line in _git("log", "--format=%H %s").splitlines():
        h, _, subject = line.partition(" ")
        if re.match(r"round \d+:", subject):
            return h
    return "HEAD"


def changed_lines(base: str) -> dict[str, set[int]]:
    """file (repo-relative) -> changed line numbers (new side), for
    committed-since-base AND working-tree changes under the package."""
    out: dict[str, set[int]] = {}
    diff = _git("diff", "-U0", base, "--", f"{PKG}/")
    cur: str | None = None
    for line in diff.splitlines():
        if line.startswith("+++ "):
            # a deleted file's new side is '+++ /dev/null' — clear cur
            # so its hunk lines are never attributed to the previous
            # file (advisor r10); hunks are skipped while cur is None
            cur = line[6:] if line.startswith("+++ b/") else None
            if cur is not None:
                out.setdefault(cur, set())
        elif line.startswith("@@") and cur:
            m = re.search(r"\+(\d+)(?:,(\d+))?", line)
            if m:
                start = int(m.group(1))
                n = int(m.group(2)) if m.group(2) is not None else 1
                # a pure deletion (n == 0) still marks its anchor line
                out[cur].update(range(start, start + max(n, 1)))
    return {f: ls for f, ls in out.items() if f.endswith(".py")}


def module_defs(path: str) -> dict[str, tuple[int, int, set[str]]]:
    """Top-level def/assign name -> (lineno, end_lineno, referenced
    names).  Decorator arguments are inside the FunctionDef node, so a
    query whose register(..., oracle=_SOME_SQL) argument changes is
    implicated through the constant's own def."""
    with open(path, encoding="utf-8") as fh:
        tree = ast.parse(fh.read())
    defs: dict[str, tuple[int, int, set[str]]] = {}
    for node in tree.body:
        names: list[str] = []
        start = node.lineno
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
            names = [node.name]
            # decorator lines precede node.lineno — a decorator-only
            # edit (register flags, oracle=...) must still implicate
            if node.decorator_list:
                start = min(d.lineno for d in node.decorator_list)
        elif isinstance(node, ast.Assign):
            names = [t.id for t in node.targets if isinstance(t, ast.Name)]
        elif isinstance(node, ast.AnnAssign) and isinstance(node.target, ast.Name):
            names = [node.target.id]
        if not names:
            continue
        refs = {n.id for n in ast.walk(node) if isinstance(n, ast.Name)}
        for name in names:
            defs[name] = (start, node.end_lineno or node.lineno, refs - {name})
    return defs


def last_green_rounds() -> dict[str, int]:
    """query -> latest round with a green driver row (rows_match, no
    err, hash_match true-or-absent), from CORRECTNESS_r*.json.  The
    staleness ledger behind --rotation."""
    import glob
    import json

    last: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        m = re.search(r"r(\d+)", os.path.basename(path))
        if not m:
            continue
        rnd = int(m.group(1))
        with open(path, encoding="utf-8") as fh:
            data = json.load(fh)
        for q, v in data.items():
            if (
                isinstance(v, dict)
                and v.get("rows_match")
                and v.get("err") is None
                and v.get("hash_match") in (True, None)
            ):
                last[q] = max(last.get(q, 0), rnd)
    return last


def print_rotation(window: list[str]) -> None:
    """The mechanized staleness rotation (r10 verdict #3): every
    oracle-backed registry query sorted by last driver-green round,
    oldest first — fill non-implicated window slots from the top of
    this list so the driver-freshness tail drains instead of being
    hand-curated."""
    from damg7245_casestudy_03_ai_scoring_engine_spark.operators import REGISTRY

    last = last_green_rounds()
    rows = sorted(
        ((last.get(q, 0), q) for q, spec in REGISTRY.items() if spec.oracle),
        key=lambda t: (t[0], t[1]),
    )
    in_window = set(window)
    print("rotation candidates (oracle-backed, oldest driver green first):")
    for rnd, q in rows:
        tag = "IN-WINDOW" if q in in_window else ""
        print(f"  r{rnd:<2d} {q:45s} {tag}")
    # Self-advancing staleness horizon (r12; was a hardcoded <=r4):
    # the tail is everything last driver-green more than 7 rounds
    # before the newest CORRECTNESS file — r11's ledger yields <=r4,
    # r12's will yield <=r5, so the drained-to-zero target walks
    # forward one round per round instead of trivially staying 0.
    horizon = max((rnd for rnd, _ in rows), default=0) - 7
    tail = [q for rnd, q in rows if rnd <= horizon]
    covered = sum(1 for q in tail if q in in_window)
    print(
        f"\n<=r{horizon} tail: {len(tail)} queries; {covered} windowed this "
        f"round -> projected tail after this window: {len(tail) - covered}"
    )


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", default=None, help="diff base (default: last round commit)")
    ap.add_argument(
        "--rotation",
        action="store_true",
        help="also print the staleness-sorted rotation ledger",
    )
    args = ap.parse_args()
    base = args.base or default_base()
    print(f"base: {base[:12]} ({_git('log', '-1', '--format=%s', base).strip()})")

    ops_dir = os.path.join(REPO, PKG, "operators")
    all_defs: dict[str, dict[str, tuple[int, int, set[str]]]] = {}
    global_map: dict[str, tuple[str, str]] = {}  # name -> (module file, name)
    for fn in sorted(os.listdir(ops_dir)):
        if not fn.endswith(".py"):
            continue
        rel = f"{PKG}/operators/{fn}"
        defs = module_defs(os.path.join(ops_dir, fn))
        all_defs[rel] = defs
        for name in defs:
            if name in global_map and global_map[name][0] != rel:
                print(f"  note: name collision {name!r} "
                      f"({global_map[name][0]} vs {rel}) — both implicated")
            global_map.setdefault(name, (rel, name))

    touched = changed_lines(base)
    changed_defs: set[tuple[str, str]] = set()
    for rel, lines in touched.items():
        for name, (lo, hi, _refs) in all_defs.get(rel, {}).items():
            if any(lo <= ln <= hi for ln in lines):
                changed_defs.add((rel, name))
    if not changed_defs:
        print("no operator defs touched since base — window freshness holds trivially")
        if args.rotation:
            import __spark_entry__ as entry

            print_rotation(list(entry.queries())[:WINDOW])
        return 0
    print(f"changed defs ({len(changed_defs)}):")
    for rel, name in sorted(changed_defs):
        print(f"  {rel}:{name}")

    from damg7245_casestudy_03_ai_scoring_engine_spark.operators import REGISTRY

    def closure(rel: str, fn_name: str) -> set[tuple[str, str]]:
        seen: set[tuple[str, str]] = set()
        stack = [(rel, fn_name)]
        while stack:
            cur = stack.pop()
            if cur in seen:
                continue
            seen.add(cur)
            crel, cname = cur
            spec = all_defs.get(crel, {}).get(cname)
            if spec is None:
                continue
            for ref in spec[2]:
                # same-module first, then the global map
                if ref in all_defs.get(crel, {}):
                    stack.append((crel, ref))
                elif ref in global_map:
                    stack.append(global_map[ref])
        return seen

    implicated: list[str] = []
    for qname, spec in REGISTRY.items():
        frel = os.path.relpath(spec.fn.__code__.co_filename, REPO)
        if closure(frel, spec.fn.__name__) & changed_defs:
            implicated.append(qname)

    import __spark_entry__ as entry

    window = list(entry.queries())[:WINDOW]
    missing = [
        n for n in sorted(implicated)
        if REGISTRY[n].oracle and n not in window
    ]
    print(f"implicated registry queries ({len(implicated)}):")
    for n in sorted(implicated):
        tag = ("rows-only" if not REGISTRY[n].oracle
               else "IN-WINDOW" if n in window else "MISSING")
        print(f"  {tag:10s} {n}")
    if args.rotation:
        print_rotation(window)
    if missing:
        print(f"\nFAIL: {len(missing)} implicated oracle-backed queries are "
              f"outside the 50-query driver window: {missing}")
        return 1
    print("\nOK: every implicated oracle-backed query is in the driver window")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
