#!/usr/bin/env python
"""Scale-up probe: measure headline queries at sf1 (10× sf0.1) and
report wall-clock ratios + physical-plan strategy drift → SCALE.md.

The correctness gate runs at sf0.01 and the bench at sf0.1; this tool
answers the next question the 100 TB posture demands: *when the data
grows 10× on the same 32 cores, does each plan degrade linearly
(ratio ≈ 10× ideal for CPU-bound work, less when the sf0.1 run was
under-parallelized), and does Catalyst keep the same join strategy?*
A query whose ratio blows past ~15× (superlinear) or that silently
flips a broadcast into a cartesian is a scale bug the sf0.1 bench
cannot see.

sf1 is derived from sf0.1 by replicating every fact table 10× with
disjoint key spaces (referential integrity preserved: lineitem→orders,
orders→customer, lineitem→part/supplier all offset by the same
replica stride) and writing multi-file parquet (32 files/table) so
scans split the way production tables do.  region/nation stay fixed,
like TPC-H.  Document text gets a per-replica suffix token, so the
corpus is 10 near-duplicate families per original doc — a *worst-case*
stress for the dedup/LSH queries (bigger bands, denser buckets), not
a best case.

Usage:
  python tools/scale_probe.py --build          # generate .scale/sf1 (once)
  python tools/scale_probe.py                  # probe + rewrite SCALE.md
  python tools/scale_probe.py --queries q1 q2  # probe a subset
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF01 = "/root/testdata/sf0.1"
SF1 = os.path.join(REPO, ".scale", "sf1")
REPLICAS = 10
# Key strides larger than any sf0.1 key so replica key spaces are
# provably disjoint (max orderkey at sf0.1 is 600k).
STRIDE = 10_000_000

# Probe set: every family with a distinct scale risk.  The documented
# O(n²) brute-force baselines are excluded on purpose — their blocked
# twins (ivf/lsh/prefix) are the scale path and ARE probed.
DEFAULT_QUERIES = [
    "org_air_flagship",          # shuffle-heaviest headline DAG
    "regional_revenue_q5",       # classic multi-join agg
    "fact_join_agg",             # fact⋈fact join
    "asof_join_events",          # as-of merge
    "rolling_active_users",      # window over event time
    "capped_running_balance",    # running fold
    "user_sessionization",       # session windows
    "topk_per_group",            # per-group top-k
    "column_profile",            # full-width profiling
    "dedup_minhash_lsh",         # banded LSH join
    "dedup_containment_prefix",  # prefix inverted index
    "cross_doc_dup_spans",       # span-hash agg
    "decontaminate_ngram_overlap",
    "tfidf_top_terms",
    "heavy_hitter_tokens",       # sketch-then-verify
    "text_quality_scores",
    "ann_ivf_topk",              # cell-blocked ANN
    "lsh_cosine_pairs",          # hyperplane LSH
    "dynamic_partition_pruned_join",
    "bucketed_colocated_join",
]

JOIN_OPS = (
    "BroadcastHashJoin",
    "SortMergeJoin",
    "ShuffledHashJoin",
    "BroadcastNestedLoopJoin",
    "CartesianProduct",
)


def build_sf1(spark) -> None:
    """Derive .scale/sf1 from sf0.1 (10 disjoint-key replicas)."""
    from pyspark.sql import functions as F

    os.makedirs(SF1, exist_ok=True)
    rep = F.explode(F.sequence(F.lit(0), F.lit(REPLICAS - 1))).alias("rep")

    def write(df, name, parts=32):
        (df.repartition(parts)
           .write.mode("overwrite")
           .parquet(os.path.join(SF1, name + ".parquet")))
        print(f"  built {name}: {df.count()} rows", flush=True)

    def rd(name):
        return spark.read.parquet(f"{SF01}/{name}.parquet")

    def off(col):
        return (F.col(col) + F.col("rep").cast("long") * STRIDE).alias(col)

    # Fixed dimensions: copy verbatim (TPC-H keeps region/nation flat).
    for name in ("region", "nation"):
        write(rd(name), name, parts=1)

    c = rd("customer").select("*", rep)
    write(c.select(off("c_custkey"), *[x for x in c.columns if x not in ("c_custkey", "rep")]), "customer")
    s = rd("supplier").select("*", rep)
    write(s.select(off("s_suppkey"), *[x for x in s.columns if x not in ("s_suppkey", "rep")]), "supplier")
    p = rd("part").select("*", rep)
    write(p.select(off("p_partkey"), *[x for x in p.columns if x not in ("p_partkey", "rep")]), "part")

    o = rd("orders").select("*", rep)
    write(
        o.select(
            off("o_orderkey"), off("o_custkey"),
            *[x for x in o.columns if x not in ("o_orderkey", "o_custkey", "rep")],
        ),
        "orders",
    )
    li = rd("lineitem").select("*", rep)
    write(
        li.select(
            off("l_orderkey"), off("l_partkey"), off("l_suppkey"),
            *[x for x in li.columns if x not in ("l_orderkey", "l_partkey", "l_suppkey", "rep")],
        ),
        "lineitem",
    )

    ev = rd("events").select("*", rep)
    write(
        ev.select(
            off("event_id"), off("user_id"),
            *[x for x in ev.columns if x not in ("event_id", "user_id", "rep")],
        ),
        "events",
    )

    # Documents: disjoint doc_ids; text gets a replica suffix token so
    # each original doc becomes a 10-member near-duplicate family.
    d = rd("documents").select("*", rep)
    suffix = F.concat(F.lit(" replicatoken"), F.col("rep").cast("string"))
    write(
        d.select(
            off("doc_id"),
            F.concat(F.col("text"), suffix).alias("text"),
            "lang",
            "source",
            (F.col("n_chars") + F.length(suffix)).alias("n_chars"),
        ),
        "documents",
    )

    # Embeddings: disjoint vec_ids; vectors perturbed by a tiny
    # deterministic per-replica delta so ANN candidates aren't exact
    # ties (labels keep the same cluster structure, 10× denser).
    e = rd("embeddings").select("*", rep)
    write(
        e.select(
            off("vec_id"),
            F.transform(
                "embedding",
                lambda x, i: x + (F.col("rep").cast("float") * 1e-4) * ((i % 7).cast("float") - 3.0),
            ).alias("embedding"),
            "label",
        ),
        "embeddings",
    )


def join_mix(df) -> str:
    s = df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
    found = {j: s.count(f" {j}") + s.count(f"({j}") for j in JOIN_OPS}
    found = {j: n for j, n in found.items() if n}
    return ",".join(f"{j.replace('Join', '')}×{n}" for j, n in found.items()) or "—"


def probe(spark, names, per_query_timeout=600):
    from damg7245_casestudy_03_ai_scoring_engine_spark.functions.cache import release_all
    from damg7245_casestudy_03_ai_scoring_engine_spark.operators import REGISTRY

    rows = []
    for name in names:
        spec = REGISTRY[name]
        rec = {"query": name}
        for tag, sf_dir in (("sf0.1", SF01), ("sf1", SF1)):
            try:
                df = spec.fn(spark, sf_dir)
                t0 = time.monotonic()
                df.write.format("noop").mode("overwrite").save()
                warm = time.monotonic() - t0
                # one warm rep (cached silvers materialized) — the
                # steady state the bench reports
                df2 = spec.fn(spark, sf_dir)
                t0 = time.monotonic()
                df2.write.format("noop").mode("overwrite").save()
                rec[tag] = round(min(warm, time.monotonic() - t0), 3)
                rec[tag + "_joins"] = join_mix(df2)
            except Exception as exc:  # noqa: BLE001
                rec[tag] = None
                rec[tag + "_err"] = str(exc)[:120]
            finally:
                release_all()
        if rec.get("sf0.1") and rec.get("sf1"):
            rec["ratio"] = round(rec["sf1"] / rec["sf0.1"], 1)
        rows.append(rec)
        print(f"  {name}: sf0.1={rec.get('sf0.1')}s sf1={rec.get('sf1')}s "
              f"ratio={rec.get('ratio')}", flush=True)
    return rows


def write_md(rows) -> None:
    out = [
        "# SCALE.md — 10× scale-up probe (sf0.1 → sf1, same 32 cores)",
        "",
        "Generated by `python tools/scale_probe.py`.  sf1 = 10 disjoint-key",
        "replicas of every sf0.1 fact table (6M lineitem / 1M events / 50k",
        "near-duplicate documents / 20k embeddings), multi-file parquet so",
        "scans split.  Wall times are the best of two warm runs (cached",
        "silver steady state, matching bench.py semantics).  On fixed",
        "cores, ideal data-linear scaling is ratio ≈ 10×; below 10× means",
        "the sf0.1 run under-used the machine (fixed overheads, short",
        "stages); materially above ~15× flags superlinear work or a plan",
        "flip — those get a note.  Join-strategy drift between columns is",
        "expected where a 10×-bigger build side crosses the broadcast",
        "threshold (BroadcastHashJoin → SortMergeJoin is the *correct*",
        "adaptive response, not a regression).",
        "",
        "| Query | sf0.1 (s) | sf1 (s) | ratio | joins @sf0.1 | joins @sf1 |",
        "|---|---|---|---|---|---|",
    ]
    for r in rows:
        out.append(
            f"| `{r['query']}` | {r.get('sf0.1', '—')} | {r.get('sf1', '—')} "
            f"| {r.get('ratio', '—')}× | {r.get('sf0.1_joins', '—')} "
            f"| {r.get('sf1_joins', '—')} |"
        )
    errs = [(r["query"], k, v) for r in rows for k, v in r.items() if k.endswith("_err")]
    if errs:
        out += ["", "## Errors", ""]
        out += [f"- `{q}` at {k[:-4]}: {v}" for q, k, v in errs]
    out.append("")
    with open(os.path.join(REPO, "SCALE.md"), "w") as fh:
        fh.write("\n".join(out))
    print(f"wrote SCALE.md ({len(rows)} queries)", flush=True)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--build", action="store_true", help="(re)generate .scale/sf1")
    ap.add_argument("--queries", nargs="*", default=None)
    args = ap.parse_args()

    from damg7245_casestudy_03_ai_scoring_engine_spark.session import get_spark

    spark = get_spark("scale-probe", cpus=32, shuffle_partitions=64)
    spark.sparkContext.setLogLevel("ERROR")

    if args.build or not os.path.isdir(SF1):
        print("building sf1 ...", flush=True)
        build_sf1(spark)
        if args.build and args.queries is None:
            return 0

    names = args.queries or DEFAULT_QUERIES
    rows = probe(spark, names)
    write_md(rows)
    print(json.dumps({"probe": rows}, default=str))
    return 0


if __name__ == "__main__":
    sys.exit(main())
