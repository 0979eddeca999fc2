"""Ad-hoc EXACT (bit-level float) Spark↔DuckDB parity check for one or
more registry queries at an arbitrary sf dir and shuffle-partition
count — reproduces the driver's value-hash gate locally.

Usage: python tools/exact_parity.py [--sf DIR] [--parts N] q1 [q2 ...]
       python tools/exact_parity.py --window   # driver's 50-query window
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def canon(rows, cols):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])

    def norm(v):
        import decimal

        if isinstance(v, decimal.Decimal):
            return float(v)
        if isinstance(v, float):
            return v  # EXACT — no rounding; that's the point
        return v

    out = [tuple(norm(r[i]) for i in idx) for r in rows]
    return sorted(out, key=lambda t: tuple((v is None, repr(v)) for v in t))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--parts", type=int, default=32)
    ap.add_argument("--window", action="store_true")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    from damg7245_casestudy_03_ai_scoring_engine_spark.operators import REGISTRY
    from damg7245_casestudy_03_ai_scoring_engine_spark.session import get_spark

    names = list(args.names)
    if args.window:
        import __spark_entry__ as entry

        names = [n for n in list(entry.queries())[:50] if REGISTRY[n].oracle]

    import duckdb

    spark = get_spark("exact-parity", cpus=32, shuffle_partitions=args.parts)
    con = duckdb.connect()
    for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
        p = os.path.join(args.sf, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    bad = 0
    for name in names:
        spec = REGISTRY[name]
        sdf = spec.fn(spark, args.sf)
        srows = [tuple(r) for r in sdf.collect()]
        scols = [c.lower() for c in sdf.columns]
        res = con.execute(spec.oracle)
        drows = res.fetchall()
        dcols = [d[0].lower() for d in res.description]
        status = []
        if sorted(scols) != sorted(dcols):
            status.append(f"SCHEMA {scols} vs {dcols}")
        if len(srows) != len(drows):
            status.append(f"ROWS {len(srows)} vs {len(drows)}")
        if not status:
            cs, cd = canon(srows, scols), canon(drows, dcols)
            if cs != cd:
                ndiff = sum(1 for a, b in zip(cs, cd) if a != b)
                status.append(f"VALUES ({ndiff}/{len(cs)} rows differ)")
                for a, b in zip(cs, cd):
                    if a != b:
                        print(f"    spark={a}\n    duck ={b}")
                        break
        if status:
            bad += 1
            print(f"FAIL {name}: {'; '.join(status)}")
        else:
            print(f"ok   {name} ({len(srows)} rows)")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
