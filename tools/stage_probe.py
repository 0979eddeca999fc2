#!/usr/bin/env python
"""Per-query stage census: run each named bench query once (warm) and
report, from the Spark status API, the stages that dominated its wall —
task count, total/max task time, shuffle bytes.  Finds single-task hot
stages (skew / unfanned scans) and overhead-dominated shapes (many tiny
stages).  Usage: python tools/stage_probe.py [--sf DIR] [name ...]
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
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    spark = get_spark(
        "stage-probe", cpus=args.cpus, shuffle_partitions=min(32, args.cpus)
    )
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    names = args.names or [n for n, s in sorted(REGISTRY.items()) if s.bench]

    for name in names:
        spec = REGISTRY[name]
        # warm run (materialize persists, settle AQE)
        spec.fn(spark, args.sf).write.format("noop").mode("overwrite").save()
        tracker = sc.statusTracker()
        before_jobs = set(tracker.getJobIdsForGroup(None) or [])
        sc.setJobDescription(f"probe:{name}")
        t0 = time.perf_counter()
        spec.fn(spark, args.sf).write.format("noop").mode("overwrite").save()
        wall = time.perf_counter() - t0
        jobs = [
            j
            for j in (tracker.getJobIdsForGroup(None) or [])
            if j not in before_jobs
        ]
        stage_ids: set[int] = set()
        for j in jobs:
            ji = tracker.getJobInfo(j)
            if ji:
                stage_ids.update(ji.stageIds)
        rows = []
        for sid in stage_ids:
            si = tracker.getStageInfo(sid)
            if si is None or si.numTasks == 0:
                continue
            rows.append((sid, si.numTasks, si.name.split("\n")[0][:60]))
        rows.sort()
        print(
            f"{name}: wall={wall:.3f}s jobs={len(jobs)} stages={len(rows)} "
            f"single_task_stages={sum(1 for _, n, _ in rows if n == 1)}"
        )
        for sid, n, nm in rows:
            print(f"    stage {sid}: tasks={n} {nm}")
        release_all()
    spark.stop()


if __name__ == "__main__":
    main()
