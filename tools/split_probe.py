#!/usr/bin/env python
"""Split a query's wall into DataFrame CONSTRUCTION (driver/py4j/analyzer
time building the plan) vs EXECUTION (noop-sink materialization), warm
(after one untimed full run so session memos/persists are settled).
Usage: python tools/split_probe.py [--sf DIR] [--reps N] name [name ...]
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
    ns = ap.parse_args()
    names = ns.names

    spark = get_spark("split-probe", cpus=ns.cpus, shuffle_partitions=min(32, ns.cpus))
    spark.sparkContext.setLogLevel("ERROR")

    for name in names:
        spec = REGISTRY[name]
        spark.sparkContext.setJobDescription(f"warm:{name}")
        spec.fn(spark, ns.sf).write.format("noop").mode("overwrite").save()
        builds, execs = [], []
        for r in range(ns.reps):
            spark.sparkContext.setJobDescription(f"probe:{name}:r{r}")
            t0 = time.perf_counter()
            df = spec.fn(spark, ns.sf)
            t1 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            builds.append(t1 - t0)
            execs.append(t2 - t1)
        bm = sorted(builds)[len(builds) // 2]
        em = sorted(execs)[len(execs) // 2]
        print(f"{name:40s} build {bm:6.3f}  exec {em:6.3f}  (runs: "
              + " ".join(f"{b:.2f}/{e:.2f}" for b, e in zip(builds, execs)) + ")")
        release_all()
    spark.stop()


if __name__ == "__main__":
    main()
