#!/usr/bin/env python
"""Time a subset of registry queries with bench.py's exact methodology
(warm-up run, then 2 interleaved passes x median-of-3, min of medians,
release_all between queries, noop sink).  Usage:

    python tools/qtime.py [--sf DIR] [--cpus N] name [name ...]

Prints one `name seconds` line per query plus a total.  This is the
optimization round's per-change measurement loop; the official number
stays `python bench.py`.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from damg7245_casestudy_03_ai_scoring_engine_spark.functions.cache import release_all  # noqa: E402
from damg7245_casestudy_03_ai_scoring_engine_spark.operators import REGISTRY  # noqa: E402
from damg7245_casestudy_03_ai_scoring_engine_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    spark = get_spark(
        "qtime", cpus=args.cpus, shuffle_partitions=min(32, args.cpus)
    )
    spark.sparkContext.setLogLevel("ERROR")
    specs = [(n, REGISTRY[n]) for n in args.names]

    for name, spec in specs:
        spark.sparkContext.setJobDescription(f"warmup:{name}")
        spec.fn(spark, args.sf).write.format("noop").mode("overwrite").save()
        release_all()

    passes: list[dict[str, float]] = []
    for p in range(2):
        medians: dict[str, float] = {}
        for name, spec in specs:
            runs = []
            for r in range(args.reps):
                spark.sparkContext.setJobDescription(f"{name}:p{p}r{r}")
                t0 = time.perf_counter()
                spec.fn(spark, args.sf).write.format("noop").mode(
                    "overwrite"
                ).save()
                runs.append(time.perf_counter() - t0)
            medians[name] = sorted(runs)[len(runs) // 2]
            release_all()
        passes.append(medians)

    total = 0.0
    for name, _ in specs:
        v = min(ps[name] for ps in passes)
        total += v
        print(f"{name} {v:.3f}")
    print(f"TOTAL {total:.3f}")
    spark.stop()


if __name__ == "__main__":
    main()
