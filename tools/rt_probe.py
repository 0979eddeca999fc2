#!/usr/bin/env python
"""Count py4j round trips during a query's DataFrame CONSTRUCTION
(warm: one untimed full run first so session memos/persists settle) —
the deterministic driver-cost metric (r13 method).  Usage:

    python tools/rt_probe.py [--sf DIR] name [name ...]
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
    ap.add_argument("names", nargs="+")
    ns = ap.parse_args()

    spark = get_spark("rt-probe", cpus=ns.cpus, shuffle_partitions=min(32, ns.cpus))
    spark.sparkContext.setLogLevel("ERROR")

    from py4j.java_gateway import GatewayClient

    orig = GatewayClient.send_command
    counter = {"n": 0}

    def counting(self, *a, **k):
        counter["n"] += 1
        return orig(self, *a, **k)

    for name in ns.names:
        spec = REGISTRY[name]
        spec.fn(spark, ns.sf).write.format("noop").mode("overwrite").save()  # warm
        GatewayClient.send_command = counting
        counter["n"] = 0
        t0 = time.perf_counter()
        spec.fn(spark, ns.sf)
        dt = time.perf_counter() - t0
        GatewayClient.send_command = orig
        print(f"{name:40s} build {dt:6.3f}s  py4j_rts {counter['n']}")
        release_all()
    spark.stop()


if __name__ == "__main__":
    main()
