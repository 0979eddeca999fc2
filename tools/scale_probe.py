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
SF1I = os.path.join(REPO, ".scale", "sf1i")
SF10 = os.path.join(REPO, ".scale", "sf10")
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
    "cusum_drift_alarms",        # Lindley closed-form control chart
    "topk_per_group",            # per-group top-k
    "column_profile",            # full-width profiling
    "dedup_minhash_lsh",         # banded LSH join
    "dedup_containment_prefix",  # prefix inverted index
    "cross_doc_dup_spans",       # span-hash agg
    "dedup_span_removal",        # span removal + per-doc text rebuild
    "decontaminate_ngram_overlap",
    "tfidf_top_terms",
    "heavy_hitter_tokens",       # sketch-then-verify
    "text_quality_scores",
    "dsir_importance_weights",     # hashed-ngram broadcast scoring
    "quality_filter_logistic_gd",  # fixed-epoch distributed GD
    "curation_decision_gate",    # composes 4 registered signals — one
                                 # row proves composition ≤ Σ(components)
    "heaps_vocab_growth",        # vocab-curve log-log OLS
    "zipf_rank_slope",           # rank-frequency log-log OLS
    "temperature_mixing_weights",  # source-grain n^alpha rebalancing
    "incremental_lsh_probe",     # delta-vs-corpus band probe
    "embedding_drift_by_label",  # exact-moment centroid drift
    "label_propagation_communities",  # per-round join+argmax, fixed rounds
    "ann_ivf_topk",              # cell-blocked ANN
    "lsh_cosine_pairs",          # hyperplane LSH (exhaustive listing)
    "lsh_pairs_topk",            # k-bounded LSH shortlist (bench headliner)
    # r8/r9 index-quality loop: eval + maintenance over the IVF index.
    # ivf_probe_cost_profile claims "pure metadata" scale shape
    # (similarity.py) — the probe row is what proves it.
    "retrieval_eval_rank_metrics",
    "ivf_cell_balance_stats",
    "hard_negative_mining_cells",
    "ivf_probe_cost_profile",
    "ivf_refile_oversized",
    # r9 curation additions: quality-aware near-dup survivorship and
    # the duplication-profile report (both ride dedup_clusters'
    # iterative resolution — sf1's replica corpus is their worst case)
    "near_dup_keep_best",
    "dup_cluster_size_histogram",
    "source_overlap_matrix",     # exact-vs-sketch source duplication audit
    # r10 additions, probed the round they land (policy since r9):
    # the sketch-only overlap twin (its wall must stay FLAT where the
    # exact twin's grows — that flatness IS the registered claim), the
    # survivorship consumer, and incremental IVF filing
    "source_overlap_sketch",
    "near_dup_corpus_rebuild",
    "ivf_file_delta",
    "ivf_codebook_drift_stats",
    # r11 additions, probed the round they land: the retrain action
    # (drift flag consumed — flagged-scope refit + refile) and the
    # post-dedup mixing composition (rebuild verdict → n^0.7 weights)
    "ivf_codebook_retrain",
    "post_dedup_mixing_weights",
    "bpe_encode_corpus",
    "ivf_append_refile",
    # r12 additions, probed the round they land: the composed IVF+PQ
    # index (probe-restricted ADC over session-persisted codes) and
    # the per-cycle maintenance decision (O(cells) metadata compose —
    # the probe row proves the compose adds nothing corpus-sized)
    "ann_ivfpq_adc_topk",
    "ivf_maintenance_decision",
    "ivf_maintenance_execute",
    "dynamic_partition_pruned_join",
    "bucketed_colocated_join",
    # iterative / stateful families — scale behavior least predictable
    # from the plan alone (per-round joins, localCheckpoint cadence)
    "pagerank_top_nodes",
    "dedup_clusters",
    "kmeans_lloyd_deterministic",
    "max_concurrent_sessions",
    "peak_event_rate_per_user",
    "item_cooccurrence_topk",
]

# Pre-verify candidate-set counters, recorded per probe axis for the
# sketch-then-verify dedup families.  A superlinear WALL with linear
# CANDIDATES is a join-strategy/plan problem; superlinear CANDIDATES is
# a blocking-scheme problem — a wall-ratio table cannot tell them
# apart, and they need opposite fixes (r7's `dedup_containment_prefix`
# sf1i 18.9× was the former: candidates grew exactly 10× while AQE's
# static estimate of the candidate subtree flipped the verify join's
# broadcast orientation; staging the candidate list fixed it).
def _containment_cand(spark, sf_dir):
    from damg7245_casestudy_03_ai_scoring_engine_spark.operators.dedup import (
        containment_prefix_candidate_count,
    )

    return containment_prefix_candidate_count(spark, sf_dir)


CANDIDATE_COUNTERS = {
    "dedup_containment_prefix": _containment_cand,
}

JOIN_OPS = (
    "BroadcastHashJoin",
    "SortMergeJoin",
    "ShuffledHashJoin",
    "BroadcastNestedLoopJoin",
    "CartesianProduct",
)


def _replicate(
    spark, out_dir: str, replicas: int, parts: int = 32,
    tagged_docs: bool = False,
) -> None:
    """Derive a scaled twin of sf0.1: `replicas` disjoint-key copies
    of every fact table (referential integrity preserved via the key
    stride), region/nation fixed, multi-file parquet so scans split.
    Factored out of build_sf1 so the second-decade sf10 (= 100×) twin
    reuses the identical derivation.

    tagged_docs=True writes the RATE-PRESERVING document corpus
    (every token tagged with its replica id, the sf1i scheme) instead
    of near-duplicate families.  sf10 uses it: at 100 replicas the
    near-dup corpus makes any jaccard-pair stage Θ(replicas²·families)
    ≈ 25M array-pair rows — an OUTPUT-volume worst case that OOMs an
    8 g driver and measures nothing about iteration structure (the
    sf1-vs-sf1i pair already covers the output-volume axis at 10×).
    The iterative tier's sf10 question is round-count invariance, and
    the constant-duplication-rate corpus is the honest input for it."""
    from pyspark.sql import functions as F

    os.makedirs(out_dir, exist_ok=True)
    rep = F.explode(F.sequence(F.lit(0), F.lit(replicas - 1))).alias("rep")

    def write(df, name, parts=parts):
        (df.repartition(parts)
           .write.mode("overwrite")
           .parquet(os.path.join(out_dir, name + ".parquet")))
        print(f"  built {os.path.basename(out_dir)}/{name}: {df.count()} rows", flush=True)

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

    d = rd("documents").select("*", rep)
    if tagged_docs:
        # rate-preserving corpus: every token tagged with its replica
        # id, so cross-replica similarity breaks and the duplication
        # RATE matches sf0.1 (the sf1i scheme)
        rtag = F.concat(F.lit("r"), F.col("rep").cast("string"))
        ttext = F.array_join(
            F.transform(F.split(F.col("text"), " "), lambda w: F.concat(rtag, w)),
            " ",
        )
        write(
            d.select(
                off("doc_id"),
                ttext.alias("text"),
                "lang",
                "source",
                F.length(ttext).cast(d.schema["n_chars"].dataType).alias("n_chars"),
            ),
            "documents",
        )
    else:
        # near-duplicate families: disjoint doc_ids; text gets a
        # replica suffix token so each original doc becomes a
        # `replicas`-member near-duplicate family (dedup worst case).
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


def build_sf1(spark) -> None:
    """Derive .scale/sf1 (10×) plus its sf1i rate-preserving twin."""
    from pyspark.sql import functions as F

    _replicate(spark, SF1, REPLICAS)

    rep = F.explode(F.sequence(F.lit(0), F.lit(REPLICAS - 1))).alias("rep")

    def rd(name):
        return spark.read.parquet(f"{SF01}/{name}.parquet")

    def off(col):
        return (F.col(col) + F.col("rep").cast("long") * STRIDE).alias(col)

    d = rd("documents").select("*", rep)
    e = rd("embeddings").select("*", rep)

    # ---- sf1i: duplication-RATE-preserving variant -------------------
    # sf1's near-duplicate families are the worst case for dedup/LSH —
    # the TRUE pair set itself grows ~replicas² per family, so wall
    # clock growing superlinearly there is output volume, not plan
    # decay.  sf1i breaks cross-replica similarity (every token gets a
    # replica tag; embeddings are dimension-rotated per replica), so
    # duplication RATE matches sf0.1 and the honest plan-scaling ratio
    # is measurable.  Fact tables are shared via symlinks.
    os.makedirs(SF1I, exist_ok=True)
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events"):
        dst = os.path.join(SF1I, t + ".parquet")
        if not os.path.exists(dst):
            os.symlink(os.path.join(SF1, t + ".parquet"), dst)

    def write_i(df, name, parts=32):
        (df.repartition(parts)
           .write.mode("overwrite")
           .parquet(os.path.join(SF1I, name + ".parquet")))
        print(f"  built sf1i/{name}: {df.count()} rows", flush=True)

    tag = F.concat(F.lit("r"), F.col("rep").cast("string"))
    tagged_text = F.array_join(
        F.transform(F.split(F.col("text"), " "), lambda w: F.concat(tag, w)), " "
    )
    write_i(
        d.select(
            off("doc_id"),
            tagged_text.alias("text"),
            "lang",
            "source",
            F.length(tagged_text).cast(d.schema["n_chars"].dataType).alias("n_chars"),
        ),
        "documents",
    )
    # Deterministic per-(replica, dim) sign flips: norm-preserving,
    # keeps every WITHIN-replica cosine exactly (so each replica
    # contributes the original pair structure → ~10× linear output),
    # and drives CROSS-replica cosines to ~0 (a ± pattern dot).  A
    # dimension rotation is NOT enough — these embeddings carry
    # cluster structure that survives permutation, which re-inflated
    # the pair set ~100× in the first sf1i build.
    write_i(
        e.select(
            off("vec_id"),
            F.expr(
                "transform(sequence(0, size(embedding) - 1),"
                " i -> embedding[i] * IF(pmod(xxhash64(rep, i), 2) = 0,"
                " CAST(1.0 AS FLOAT), CAST(-1.0 AS FLOAT)))"
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


# Queries over documents/embeddings, where sf1's near-dup families
# inflate the TRUE result set ~replicas² — these also get probed at
# sf1i (duplication rate held constant) for the honest plan ratio.
CORPUS_QUERIES = {
    "dedup_minhash_lsh",
    "dedup_containment_prefix",
    "cross_doc_dup_spans",
    "decontaminate_ngram_overlap",
    "tfidf_top_terms",
    "heavy_hitter_tokens",
    "text_quality_scores",
    "dsir_importance_weights",     # hashed-ngram broadcast scoring
    "quality_filter_logistic_gd",  # fixed-epoch distributed GD
    "curation_decision_gate",
    "incremental_lsh_probe",     # delta-vs-corpus band probe
    "ann_ivf_topk",
    "lsh_cosine_pairs",
    "lsh_pairs_topk",
    # embeddings-family index-quality loop: probe the decorrelated
    # axis too — recall/cost behavior on sf1i is the honest shape
    "retrieval_eval_rank_metrics",
    "ivf_cell_balance_stats",
    "hard_negative_mining_cells",
    "ivf_probe_cost_profile",
    "ivf_refile_oversized",
    "near_dup_keep_best",
    "dup_cluster_size_histogram",
    "source_overlap_matrix",
    "source_overlap_sketch",
    "near_dup_corpus_rebuild",
    "ivf_file_delta",
    "ivf_codebook_drift_stats",
    "ivf_codebook_retrain",
    "post_dedup_mixing_weights",
    "bpe_encode_corpus",
    "ivf_append_refile",
    "ann_ivfpq_adc_topk",
    "ivf_maintenance_decision",
    "ivf_maintenance_execute",
}

# Corpus queries that ALSO get the second decade (sf10 = 100× data,
# rate-preserving near-dup docs): the sketch-then-verify families whose
# r8 fix (staged candidate silver → AQE plans the verify join from true
# stats) must hold when candidates grow another 10× — a plan that
# silently flips back to the bad broadcast orientation at 100× would be
# invisible to the sf1i point alone.
CORPUS_SF10_QUERIES = [
    "dedup_containment_prefix",
    "lsh_pairs_topk",
    # r10: the sketch-only overlap twin's claim is FLATNESS (one
    # linear pass, corpus never crosses a shuffle) — the second
    # decade is where that claim either holds or dies
    "source_overlap_sketch",
    # r11: the retrain action is iterative-adjacent (a Lloyd update +
    # refile) — the job-count row is its round-structure signal at the
    # second decade
    "ivf_codebook_retrain",
    # r11: BPE encode is 20 FIXED fold rounds over the distinct-word
    # table; sf10's replica-tagged corpus grows the vocabulary ~100×,
    # so the second decade asks exactly the round-invariance question
    "bpe_encode_corpus",
]

# Iterative tier for the second-decade (sf10 = 100×) probe: families
# whose 100 TB claim is "per-round work grows with data but round
# count does not" — exactly what another decade stresses.
ITERATIVE_QUERIES = [
    "pagerank_top_nodes",
    "dedup_clusters",
    "kmeans_lloyd_deterministic",
    "bfs_hop_distance",
    "cheapest_path_bellman_ford",
    "item_cooccurrence_topk",
    "label_propagation_communities",
]


def probe(spark, names, points=None, with_jobs=False):
    from damg7245_casestudy_03_ai_scoring_engine_spark.functions.cache import release_all
    from damg7245_casestudy_03_ai_scoring_engine_spark.operators import REGISTRY

    sc = spark.sparkContext
    rows = []
    for name in names:
        spec = REGISTRY[name]
        rec = {"query": name}
        if points is None:
            qpoints = [("sf0.1", SF01), ("sf1", SF1)]
            if name in CORPUS_QUERIES and os.path.isdir(SF1I):
                qpoints.append(("sf1i", SF1I))
        else:
            qpoints = list(points)
        for tag, sf_dir in qpoints:
            try:
                # one UNTIMED warm-up first: materializes cached
                # silvers and JIT state so neither timed rep carries
                # the cold setup cost (the steady state bench.py
                # reports)
                spec.fn(spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                df = spec.fn(spark, sf_dir)
                t0 = time.monotonic()
                rec[tag + "_rows"] = df.count()
                rep1 = time.monotonic() - t0
                group = f"probe|{name}|{tag}"
                if with_jobs:
                    # steady-state Spark JOB count: iterative operators
                    # run their convergence loop during DataFrame
                    # construction, so grouping the whole rep captures
                    # one job per round (+ the final action's jobs) —
                    # the round-count-invariance signal the plan can't
                    # show
                    sc.setJobGroup(group, name)
                df2 = spec.fn(spark, sf_dir)
                t0 = time.monotonic()
                df2.write.format("noop").mode("overwrite").save()
                rec[tag] = round(min(rep1, time.monotonic() - t0), 3)
                if with_jobs:
                    rec[tag + "_jobs"] = len(
                        sc.statusTracker().getJobIdsForGroup(group)
                    )
                    sc.setJobGroup("probe|idle", "idle")
                rec[tag + "_joins"] = join_mix(df2)
                if name in CANDIDATE_COUNTERS:
                    rec[tag + "_cand"] = CANDIDATE_COUNTERS[name](spark, sf_dir)
            except Exception as exc:  # noqa: BLE001
                rec[tag] = None
                rec[tag + "_err"] = str(exc)[:120]
            finally:
                release_all()
        for big in ("sf1", "sf1i", "sf10"):
            if rec.get("sf0.1") and rec.get(big):
                rec[f"ratio_{big}"] = round(rec[big] / rec["sf0.1"], 1)
        rows.append(rec)
        parts = [f"  {name}:"]
        for tag, _ in qpoints:
            parts.append(
                f"{tag}={rec.get(tag)}s (x{rec.get('ratio_' + tag, '—')}, "
                f"rows {rec.get(tag + '_rows')}"
                + (f", jobs {rec.get(tag + '_jobs')}" if with_jobs else "")
                + ")"
            )
        print(" ".join(parts), flush=True)
    return rows


_ANN_RECALL_QUERIES = (
    "ann_ivf_topk",
    "ann_ivf_multiprobe",
    "ann_pq_adc_topk",
    "ann_ivfpq_adc_topk",
)
_ANN_RECALL_FLOOR = 0.6


def ann_recall(spark):
    """Recall@k of every approximate ANN query vs the brute-force
    truth at sf1 AND sf1i (20k vectors each — big enough for a real
    recall signal, cheap enough to brute-force).  Wall-ratio tables
    can't see a coarse quantizer silently decaying: a probe that
    reads FEWER cells gets FASTER as recall collapses.  Both axes
    matter: sf1 truth is replica-concentrated (a query's top-5 are
    its own near-identical replicas — flattering, but exactly what
    exposed r7's label-filing bug), while sf1i's decorrelated
    embeddings give a diverse truth set — the honest recall.  Floor
    pinned at _ANN_RECALL_FLOOR on every axis; the probe exits
    nonzero below it."""
    from damg7245_casestudy_03_ai_scoring_engine_spark.functions.cache import release_all
    from damg7245_casestudy_03_ai_scoring_engine_spark.operators import REGISTRY

    out = []
    axes = [("sf1", SF1)]
    if os.path.isdir(SF1I):
        axes.append(("sf1i", SF1I))
    for axis, sf_dir in axes:
        truth: dict[int, set[int]] = {}
        for r in REGISTRY["ann_topk_bruteforce"].fn(spark, sf_dir).collect():
            truth.setdefault(r["query_id"], set()).add(r["cand_id"])
        release_all()
        for name in _ANN_RECALL_QUERIES:
            got: dict[int, set[int]] = {}
            for r in REGISTRY[name].fn(spark, sf_dir).collect():
                got.setdefault(r["query_id"], set()).add(r["cand_id"])
            release_all()
            per_q = [
                len(t & got.get(q, set())) / len(t) for q, t in truth.items()
            ]
            rec = round(sum(per_q) / len(per_q), 3)
            out.append(
                {
                    "query": name,
                    "axis": axis,
                    "recall": rec,
                    "worst_query": round(min(per_q), 3),
                    "floor_ok": rec >= _ANN_RECALL_FLOOR,
                }
            )
            print(
                f"  recall@k {axis} {name}: mean={rec} worst={min(per_q):.3f}",
                flush=True,
            )
    return out


def derived_findings(rows) -> list[str]:
    """Auto-derived summary computed from THIS run's measurements —
    regenerating the probe regenerates these lines, so they can never
    contradict the table (the narrative below is a dated manual
    annotation and says so)."""
    ratios = sorted(
        ((r["query"], r["ratio_sf1"]) for r in rows if r.get("ratio_sf1")),
        key=lambda t: t[1],
    )
    flat = [f"`{q}` {x}×" for q, x in ratios if x <= 2.0]
    linear = [f"`{q}` {x}×" for q, x in ratios if 2.0 < x <= 12.0]
    hot = [f"`{q}` {x}×" for q, x in ratios if x > 12.0]
    drift = [
        f"`{r['query']}` {r['sf0.1_joins']} → {r['sf1_joins']}"
        for r in rows
        if r.get("sf0.1_joins")
        and r.get("sf1_joins")
        and r["sf0.1_joins"] != r["sf1_joins"]
    ]
    out = ["## Measured summary (auto-derived from this run)", ""]
    if flat:
        out.append(f"- ≤2× at 10× data (structure-dominated): {', '.join(flat)}.")
    if linear:
        out.append(f"- 2–12× (at/under data-linear): {', '.join(linear)}.")
    if hot:
        out.append(
            f"- >12× (check the rows column — output-bound vs plan decay): "
            f"{', '.join(hot)}."
        )
    out.append(
        f"- Join-strategy drift sf0.1→sf1: "
        f"{'; '.join(drift) if drift else 'none'}."
    )
    return out


FINDINGS = """
## Findings (manual annotation — r12 probe, 2026-08-16)

- **The composed IVF+PQ index holds both scale axes at its measured
  operating point.**  `ann_ivfpq_adc_topk` (PQ codes scanned per IVF
  cell, ADC restricted to the margin-adaptive probe set, exact re-rank
  of the shortlist) reads **2.08 s sf0.1 → 0.8×/0.8× at 10× data on
  both axes** (the codebook and codes are session-persisted ingest
  artifacts, so a query pays probe + code-scan only), and recall@5
  clears the 0.6 floor on BOTH axes: **sf1 1.0, sf1i 0.68** vs the
  probe rule's own 0.78 exact-search ceiling.  The operating point is
  MEASURED, not guessed: M=4/K=8/shortlist-min-50 read 0.50 at
  fixture (the ADC cut ate 0.18 of the 0.68 probe ceiling);
  M=8/K=16/div=100 fixed fixture but read 0.56 on the decorrelated
  axis — coarse codes can't rank a ~10k-candidate probe pool into a
  200-row shortlist there; M=8/K=32/div=50 (the flat twin's
  resolution and budget) clears everything.  The flat-PQ twin
  (`ann_pq_adc_topk`) scans the whole corpus' codes; the composed
  index's scan is the probe profile's fraction — pinned cell-exact to
  `ivf_probe_cost_profile.candidates_scanned` in
  tests/test_similarity_paths.py.
- **The maintenance DECISION adds nothing corpus-sized — and now has
  an EXECUTOR.**  `ivf_maintenance_decision` (retrain / refile / wait
  per cell, composed by calling drift + delta + balance) reads
  **1.54 s sf0.1 → 0.8×/0.9× at 10×** — the compose is O(cells) joins
  over the session-shared post-append frames its signals already
  persist, so its wall is the signals' wall, not a new scan.
  `ivf_maintenance_execute` (late r12) runs the cycle the decision
  ordered: retrain cells delegate to `ivf_codebook_retrain`'s audit,
  refile cells run the FAISS split with the decision's set as the
  admission (the shared `_refile_oversized_impl` / `_ivf_refile_body_
  sql`, now parameterized — both pre-existing consumers byte-identical),
  wait cells pass through; conservation + branch-set laws pinned.
  Measured: **2.77 s sf0.1 → 1.1×/1.2× at 10× on both axes** at
  identical join pins — one cycle costs the sum of its flagged-scope
  components, independent of the standing corpus.
- **Streamed drift == batch drift, cell-exact.**  The streamed gold
  now accumulates per-(cell, dim) MOMENT SUMS (`merge_cell_moments`),
  and the read-side `streamed_drift_stats` merges them with the
  persisted standing-moments artifact — the drain law
  (tests/test_streaming.py) pins 3-micro-batch == one-shot
  `ivf_codebook_drift_stats` on counts, 6dp cosine, and flag, so the
  retrain trigger works off continuously-ingested state without
  rescanning the standing corpus or the replayed stream.
- **BPE packing conserves the encoded corpus bit-exactly.**
  `sequence_packing_bpe` joins each doc's word multiset to the SHARED
  `_bpe_encoded_vocab` frame and reuses the whitespace packer's
  per-shard cumsum; Σ per-shard total_tokens == `bpe_encode_corpus.
  n_bpe_tokens` per source is pinned bit-exact — the packed epoch and
  the mixing budget now speak the same learned-token unit end to end.
- **The composed-oracle AS MATERIALIZED audit paid ~3×, to the
  recursion floor.**  Every multiply-referenced CTE in the near-dup
  composition chain (`dup_cluster_size_histogram`'s cluster
  resolution, `near_dup_corpus_rebuild`'s j,
  `post_dedup_mixing_weights`' src/q) now carries AS MATERIALIZED —
  r11 measured ~35 min DuckDB-side at sf0.1 for the mixing oracle
  (inline re-expansion evaluated the recursive subtree once per
  reference); measured after the audit: **572 / 655 / 651 s** for the
  three compositions, i.e. every query now pays exactly ONE
  WITH RECURSIVE resolution (~9.5 min at sf0.1 — the inherent floor
  no CTE hint can cut) plus ~1 min of composition.  Documented waiver
  for the two ~11-min rows in tools/exact_parity.py's SF notes.

## Findings (manual annotation — r11 probe, 2026-08-16)

- **The retrain action costs flagged-scope work, measured.**
  `ivf_codebook_retrain` (the drift flag's consumer — refit + refile
  restricted to flagged cells) reads **1.44 s sf0.1 → 0.9×/0.9× at
  10× data on both axes** (10-row stats grain), and the second decade
  reads **0.70 → 0.95 s = 1.3× for 100× data** (jobs 18→37 — the
  sf10 corpus drifts more cells into flag range, visible as extra
  broadcast attaches, while the wall stays flat) — the refit is free
  (the drift pass already computed the means), the refile is
  flagged-members × flagged-cells broadcast arithmetic, and nothing
  rescans the unflagged corpus (live-plan pin: ≤1 parquet scan,
  tests/test_plans.py).  Recall re-pinned unchanged after the whole
  r11 IVF rework: sf1 1.0/1.0/1.0, sf1i 0.78/0.82/0.80, 0.6 floor
  green on both axes.
- **The append path is now metadata-grain IN THE PLAN.**  r11 made
  `_ivf_standing_filing` a session-persisted frame (the inverted
  file's membership metadata — the `incremental_lsh_probe` persisted-
  SILVER precedent): `ivf_file_delta` and `ivf_codebook_drift_stats`
  no longer refile the standing corpus per run; their registered
  plans live-scan parquet exactly once (the batch) / at most once
  (the member-mean pass).  Values oracle-identical; both now bench
  headliners — and cheaper for it: `ivf_file_delta` 1.0 → 0.48 s
  sf0.1 (1.4×/1.5× at 10×), `ivf_codebook_drift_stats` 1.94 → 0.61 s
  (1.1×/1.1×), with `ivf_refile_oversized` reading 1.0 s in the same
  session (the re-persist fix keeps the session codebook warm across
  consumers — the r10 advisor wrinkle).
- **The retrain policy is derived from a measured curve — and it is
  TWO-threshold** (the drift-sweep table below,
  `tools/drift_threshold_sweep.py`): mode MIGRATION is absorbed by
  argmax-consistent filing (blending the append batch toward an
  existing centroid moves NOTHING — drift stays 0.91-0.94, recall
  flat: the sweep's first finding); a NOVEL mode's harmful band is
  drift 0.62-0.74, where retraining a half-formed mode trades recall
  away (sf1: 0.98→0.74); below ~0.55 retraining pays (scan
  0.54→0.27, probes 5.0→2.0 at recall 1.0) — but ONLY admit-wide:
  refitting just the sub-0.55 subset collapses recall 1.0→0.62 (the
  refit centroid suppresses the probe escalation that was covering
  the other stale cell — caught by the r11 self-review's re-measure).
  Production policy: TRIGGER at min drift < 0.55, ADMIT the full
  registered 0.85 flag set; pinned two-sided in
  tests/test_similarity_paths.py.  Registered tau stays 0.85
  (fixture band — both flag branches run at every test SF).
- **The post-dedup mixing composition inherits the rebuild's cost
  and nothing more.**  `post_dedup_mixing_weights` (the n^0.7 rule
  over kept tokens) reads **1.16 s sf0.1 → 1.7× at sf1 / 1.1× at
  sf1i** — a sources-grain distinct + scalar math on top of the
  `near_dup_corpus_rebuild` subtree it consumes (the sf1 ratio IS the
  rebuild's replica-axis cost, inherited, not added); its cross-query
  law (kept_tokens == the rebuild's source_kept_tokens, bit-exact)
  held on every axis.
- **BPE encoding is vocabulary-grain, measured.**  `bpe_encode_corpus`
  (late r11 — the learned merge table's consumer: the training fold
  replayed per distinct word, per-source compression stats) reads
  **1.02 s sf0.1 → 1.3× at sf1 / 1.6× at sf1i** for 10× docs — the
  sf1i axis is its worst case by construction (replica-tagged tokens
  grow the VOCABULARY 10×, and vocab size is the encode's true cost
  driver), yet both ratios stay far under data-linear because the
  rule rounds are narrow maps over the distinct-word table, not the
  corpus.  Second decade: **1.08 → 1.95 s = 1.8× for 100× data with
  jobs 94 → 94 — exact round-count invariance** (20 training rounds +
  20 encode folds; per-round work grows with the vocab, round count
  does not — the iterative tier's claim, measured on the tokenizer).
- **The append→rebalance edge executes end-to-end and stays
  flagged-scope.**  `ivf_append_refile` (late r11 — the append's
  oversized_after accounting consumed by the refile action, shared
  verbatim with `ivf_refile_oversized` over the post-append
  frozen-quantizer filing) reads **2.28 s sf0.1 → 0.9×/0.8× at 10×
  data on both axes** — sub-linear like every maintenance action,
  because the split arithmetic touches only admitted cells' members
  and the standing filing is the persisted r11 metadata.

## Findings (manual annotation — r10 probe, 2026-08-16)

- **The sketch-only overlap twin is measurably FLAT where the exact
  twin grows.**  `source_overlap_sketch` reads 0.9×/0.9× at 10× data
  on both axes (BroadcastHash×2 — just the sources×64 signature
  self-join) while `source_overlap_matrix`'s exact shingle
  intersection reads 4.3× on the replica axis.  That flatness is the
  registered 100 TB claim: after one linear scan, corpus size never
  crosses a shuffle boundary — and it holds at the SECOND decade:
  the sf10 row reads 0.94 s → 0.97 s (**1.0× for 100× data, jobs
  4→4**), the flattest curve in the sf10 table.  The estimate column
  is bit-identical between the twins (pinned in
  tests/test_cross_query_invariants.py), so dropping the exact join
  costs nothing the error columns didn't already price.
- **The survivorship consumer inherits no blowup.**
  `near_dup_corpus_rebuild` (kept-corpus rebuild + per-source token
  totals) reads 1.4×/1.2× for 10× docs with output exactly 10× on
  both axes — one doc_id join and a sources-grain broadcast on top of
  the `near_dup_keep_best` subtree; its cross-query law (kept rows ==
  Σ n_clusters) held on every axis.
- **Incremental IVF filing is structure-dominated like the rest of
  the index-maintenance family.**  `ivf_file_delta` reads 1.6×/1.3×
  at 10× (10-row stats grain, plan pinned BroadcastHash×4+SortMerge×2
  on every axis).  In-plan both sides ride the frozen standing-corpus
  quantizer (the `incremental_lsh_probe` precedent: the standing
  filing stands in for the persisted inverted file); the batch-only
  arithmetic is the delta × nlist scoring, and the incremental ==
  full-rebuild-restricted-to-delta law is pinned in
  tests/test_similarity_paths.py.
- **The refile action now measures what its docstring always
  claimed.**  r10 made two changes to `ivf_refile_oversized`: the
  own-cell cosine is scored for FLAGGED-cell members only against
  exactly their parent centroid (pre-r10 it rescored the whole corpus
  against the full quantizer and filtered to label==cell), and the
  flagged members' exploded dims are persisted once (`mem_flat`) and
  read by all three downstream stages instead of three corpus scans.
  The coarse quantizer itself became a persisted session codebook
  (`_ivf_quantizer`), shared by every IVF filing/probe/maintenance
  consumer.  Measured standalone fresh-JVM: 3.28/4.55/5.06 s (r9) →
  **2.08/1.84/1.86 s — 0.9×/0.9× at 10× data on both axes**, warm
  steady state 2.6 s with jobs 33→19 and executor run time
  69.5→23.7 s; `ann_ivf_topk` also drops to 1.4×/1.6× (was
  1.8×/2.0×) from the shared codebook.  Values are oracle-identical
  (full IVF family re-driven green under the hostile-session
  mirror).  The table rows for this trio were re-probed standalone
  after the merged 3-query probe JVM showed the documented ambient
  inflation (refile read 7.5 s there vs 1.8–2.9 s across three
  separate fresh JVMs).
- **The retrain signal completes the frozen-quantizer loop.**
  `ivf_codebook_drift_stats` (late r10) measures, per cell, the
  cosine between the frozen codebook centroid and the CURRENT mean
  of the cell's post-append members, with a deterministic retrain
  flag (6dp cosine < 0.85 — inside the measured 0.81–0.91 fixture
  band so both branches are exercised at every SF).  Probes flat:
  1.94/2.10/1.97 s = 1.1×/1.0× at 10× on both axes — the filing is
  ONE persisted pass (the first cut recomputed it per consumer and
  read 4.15 s at sf0.1; the tagged-union persist halved it), current
  centroids are a map-side (cell, dim) mean, the codebook join is a
  broadcast.  Laws pin conservation, flag arithmetic, and exact
  (cell, n_added) agreement with `ivf_file_delta`.

## Findings (manual annotation — r9 probe, 2026-08-16)

These paragraphs were written against the r9 measurement and are NOT
regenerated with the table; after re-running the probe, check them
against the auto-derived summary above and re-date any edit.

- **The log-n band-sizing rule is no longer prose — and the sf10 probe
  measures what it buys.**  `lsh_pairs_topk` derives its SRP band
  width from the corpus count at plan build (r = max(8, min(16,
  ceil(log2 n) − 8)), bands fixed at 4; the DuckDB oracle re-derives
  the identical r from count(*)).  Fixture SFs and sf1 (n ≤ 20k) stay
  on the oracle-stable 8-bit floor; sf10's 200k vectors derive r = 10,
  and the second-decade wall drops **157.3 s → 55.3 s (113.7× → 83.7×
  for 100× data, jobs 8→8, output still saturated at n·k = 1M rows
  exactly)** vs the r8 fixed-band probe — the expected effect of
  holding expected bucket size ~constant instead of letting it grow
  ∝ n.  This closes r8's one flagged design gap with a measurement.
- **The r8 similarity quartet + the r9 rebalance action all probe
  ≤2× at 10× data on BOTH axes** — structure-dominated, as designed:
  `retrieval_eval_rank_metrics` 1.7×/2.0× (the eval panel is fixed-
  size; cost tracks the index scan it grades), `ivf_cell_balance_stats`
  1.4×/1.3× and `ivf_probe_cost_profile` 1.7×/1.9× (per-cell /
  per-query METADATA grain — the "pure metadata" claim in
  similarity.py, now measured), `hard_negative_mining_cells`
  1.8×/2.0×, `ivf_refile_oversized` 1.4×/1.5× (refiling touches only
  flagged cells' members).  Recall re-measured unchanged: sf1
  1.0/1.0/1.0, sf1i 0.78/0.82/0.80, 0.6 floor green on both axes.
- **The r9 curation pair rides `dedup_clusters` without inheriting a
  blowup.**  `near_dup_keep_best` (quality-aware survivorship) reads
  4.7× at sf1 and 9.1× at sf1i for 10× docs — at/under data-linear
  with output exactly 10× on both axes — and
  `dup_cluster_size_histogram` 2.3×/2.5× (cluster-count grain).  The
  sf1 axis is their worst case (replica corpus → dense cluster graph)
  and the label-prop rounds stay diameter-bounded.
- **`dedup_containment_prefix`'s staged candidate plan holds through
  the second decade**: sf10 7.5 s at 100× data and exactly 100×
  output (66.8× wall on fixed cores, jobs 4→6), with candidates
  growing linearly per axis (150,626 → 13.45M on sf1's replica axis —
  the 89× collision blowup is the replica corpus's true pair set —
  and → 1.51M, exactly 10×, on the rate-preserving sf1i axis).
  Candidate counters keep plan problems and blocking problems
  distinguishable at a glance.
- **No plan decays at 10×.**  The only strategy drift remains AQE
  correctly demoting over-threshold broadcasts to SortMerge (minhash,
  cross-doc spans, flagship's two biggest dims); partition pruning
  keeps `dynamic_partition_pruned_join` flat (1.0×).
  `lsh_cosine_pairs` stays ~39× — inherent (its qualifying pair set
  grows ~106×; wall tracks OUTPUT), retained as the oracle anchor for
  the k-bounded `lsh_pairs_topk` headliner.
- **Second decade (sf10 = 100×): round counts are invariant.**
  Steady-state Spark job counts barely move while data grows 100× —
  pagerank 50→56, dedup-clusters 105→119, k-means 44→44, BFS 27→35,
  Bellman-Ford 17→24, label-prop 33→35, item-cooccurrence 9→9 — the
  measured form of every iterative docstring's claim: per-round work
  grows with data, round count does not.
- **Probe-session ambient is real and handled by the r8 discipline.**
  This session's long-lived probe JVM showed rows/joins/candidate-
  invariant wall swings up to ~3× against the committed table in BOTH
  directions (e.g. `item_cooccurrence_topk` 41.6 → 3.4 s,
  `lsh_pairs_topk` sf1 4.1 → 12.0 s with identical 100k-row output,
  BroadcastHash×12 plan, and candidate counts); rows whose wall moved
  >1.5× at unchanged plan were re-probed standalone in a fresh JVM
  and the merged table carries the standalone numbers (same
  re-measurement rule as BASELINE.md's bench contention protocol).
- sf1i's embedding decorrelation uses per-(replica, dim) sign flips;
  with 64 coordinate-concentrated dims a heavy cross-replica cosine
  tail survives — that is precisely why sf1i truth sets are diverse
  (true neighbors at cosine 0.40-0.66 against a dense random tail)
  and why they are the honest recall axis.
"""


def _render_sf10(sf10_rows) -> list[str]:
    out = [
        "",
        "## Second decade at sf10 (100× data, same 32 cores)",
        "",
        "Stress for the iterative families whose 100 TB claim is",
        "*per-round work grows with data but round count does not*: wall",
        "plus the steady-state Spark JOB count (one job per convergence",
        "round + the final action's jobs — the round-count-invariance",
        "signal a plan string can't show).  jobs@sf0.1 ≈ jobs@sf10 means",
        "the loop converged in the same number of rounds at 100× data;",
        "wall ratios below ~100× mean the per-round work still hasn't",
        "saturated the machine.  The last rows are the sketch-then-verify",
        "corpus pair (r8): their staged candidate plans must hold when",
        "candidates grow another decade — a silent flip back to the bad",
        "broadcast orientation would be invisible to the sf1i point alone.",
        "",
        "| Query | sf0.1 (s) | sf10 (s) | ratio | jobs sf0.1 | jobs sf10 | rows sf0.1→sf10 | cand sf0.1→sf10 |",
        "|---|---|---|---|---|---|---|---|",
    ]
    for r in sf10_rows:
        # the second-decade candidate datapoint is the whole reason the
        # corpus pair probes at sf10 — render it whenever recorded
        cand = (
            f"{r.get('sf0.1_cand', '—')}→{r.get('sf10_cand', '—')}"
            if any(k.endswith("_cand") for k in r)
            else "—"
        )
        out.append(
            f"| `{r['query']}` | {r.get('sf0.1', '—')} | {r.get('sf10', '—')} "
            f"| {r.get('ratio_sf10', '—')}× | {r.get('sf0.1_jobs', '—')} "
            f"| {r.get('sf10_jobs', '—')} "
            f"| {r.get('sf0.1_rows', '—')}→{r.get('sf10_rows', '—')} | {cand} |"
        )
    return out


def _render_recall(recall_rows) -> list[str]:
    out = [
        "",
        "## ANN recall@k at sf1 and sf1i (vs brute force, 20k vectors each)",
        "",
        "Mean recall@k (k = 5, the registered TOP_K) over the query set",
        "against `ann_topk_bruteforce` ground truth; floor pinned at",
        f"{_ANN_RECALL_FLOOR} on BOTH axes (the probe exits",
        "nonzero below it).  Wall-ratio tables cannot see a coarse",
        "quantizer decaying — a probe that reads fewer cells gets FASTER",
        "as recall collapses — so recall is measured, not argued.  sf1",
        "truth is replica-concentrated (flattering but bug-revealing);",
        "sf1i truth is decorrelated — the honest axis.",
        "",
        "| Query | axis | mean recall | worst query | ≥ floor |",
        "|---|---|---|---|---|",
    ]
    for r in recall_rows:
        out.append(
            f"| `{r['query']}` | {r.get('axis', 'sf1')} | {r['recall']} "
            f"| {r['worst_query']} "
            f"| {'✓' if r['floor_ok'] else '✗ BELOW FLOOR'} |"
        )
    return out


def _render_frontier(frontier_rows) -> list[str]:
    from damg7245_casestudy_03_ai_scoring_engine_spark.operators.similarity import (
        _IVF_CAP,
        _IVF_DELTA,
    )

    out = [
        "",
        "## Recall/cost frontier for the margin-adaptive IVF probe",
        "",
        "Sweep of the probe rule's knobs (margin delta × probe cap, min",
        "probes 1 — the `ann_ivf_topk` rule) on both scaled axes, from",
        "`tools/frontier_sweep.py` (numpy replica of the engine",
        "arithmetic — 6dp cosines, label-asc filing, id-asc rank ties —",
        "pinned against the engine at fixture scale in",
        "tests/test_similarity_paths.py).  Recall without cost rewards",
        "probe-everything; cost without recall rewards silent quantizer",
        "decay — the operating point must be pinned on BOTH sides.",
        "",
        f"Chosen operating point: **delta={_IVF_DELTA}, cap={_IVF_CAP}**",
        "(marked ◀).  Two-sided pin: engine recall floor via this",
        f"probe's --recall phase ({_ANN_RECALL_FLOOR} on both axes)",
        "plus the sf1i replica pins (recall@5 ≥ 0.75, scan fraction",
        "≤ 0.66 = chosen ×1.5) in tests/test_similarity_paths.py —",
        "neither side can drift silently.",
        "",
        "| axis | delta | cap | recall@5 | worst query | scan fraction | avg probes |  |",
        "|---|---|---|---|---|---|---|---|",
    ]
    for r in frontier_rows:
        chosen = (
            "◀" if (r["delta"] == _IVF_DELTA and r["cap"] == _IVF_CAP) else ""
        )
        out.append(
            f"| {r['axis']} | {r['delta']} | {r['cap']} | {r['recall_at_5']} "
            f"| {r['worst_query']} | {r['scan_fraction']} "
            f"| {r['avg_probes']} | {chosen} |"
        )
    return out


def _render_drift(drift_rows) -> list[str]:
    from damg7245_casestudy_03_ai_scoring_engine_spark.operators.similarity import (
        _IVF_DRIFT_TAU,
        _IVF_DRIFT_TRIGGER_SCALED,
    )

    out = [
        "",
        "## Staleness → recall/cost curve for the retrain threshold",
        "",
        "From `tools/drift_threshold_sweep.py` (numpy replica of the",
        "engine arithmetic): the deterministic 10% append batch is",
        "blended toward a NOVEL mode (lam = blend weight); per point,",
        "the drift SIGNAL (min/mean per-cell cosine vs the frozen",
        "codebook), and recall@5 / corpus scan fraction / probe count",
        "of the margin-adaptive probe for new-mode queries, frozen vs",
        "after `ivf_codebook_retrain`'s exact semantics.",
        "",
        "Findings: (1) blending toward an EXISTING centroid measures",
        "nothing — argmax-consistent filing absorbs mode MIGRATION by",
        "construction (drift stays 0.91-0.94, recall flat); only a",
        "mode the codebook cannot express creates staleness.  (2) The",
        "harmful band is drift ~0.62-0.74: retraining a HALF-FORMED",
        "mode trades recall away (sf1 lam=0.6: 0.98→0.74 — the refit",
        "centroid makes new-mode queries under-probe while true",
        "neighbors still sit in unflagged cells).  (3) Below ~0.55 the",
        "mode is fully formed and retrain is a pure win: 2-3× less",
        "scan at equal-or-better recall.",
        "",
        f"Operating points: registered/fixture tau = {_IVF_DRIFT_TAU}",
        "(inside the fixture's natural 0.81-0.91 band so both flag",
        "branches run at every test SF — the fixture cannot express",
        "the novel-mode curve).  The measured PRODUCTION policy is",
        f"two-threshold: TRIGGER when min drift < **{_IVF_DRIFT_TRIGGER_SCALED}**,",
        f"then ADMIT every cell under the registered {_IVF_DRIFT_TAU} flag",
        "(trigger-low, admit-wide).  Admit-wide is load-bearing:",
        "admitting only the sub-trigger subset at sf1 lam=0.8",
        "collapses recall 1.0→0.62 (the confident refit centroid",
        "suppresses the probe escalation compensating for the other",
        "stale cell), while the wide admission measures a pure win at",
        "every triggered point.  Pinned two-sided in",
        "tests/test_similarity_paths.py: untriggered points hold the",
        "frozen recall floor (including the harmful 0.62-0.74",
        "half-formed band — the trigger deliberately does NOT fire",
        "there); triggered points must show retrain paying (recall",
        "within 0.02, scan ≤ 0.75× frozen).  The table below is the",
        "ALWAYS-ACT single-threshold sweep — the policy that",
        "demonstrates the harmful band by retraining into it.",
        "",
        "| axis | lam | drift min | drift mean | flagged | recall frozen→retrained | scan frozen→retrained | probes frozen→retrained |",
        "|---|---|---|---|---|---|---|---|",
    ]
    for r in drift_rows:
        out.append(
            f"| {r['axis']} | {r['lam']} | {r['drift_min']} "
            f"| {r['drift_mean']} | {r['n_flagged']} "
            f"| {r['recall_frozen']}→{r['recall_retrained']} "
            f"| {r['scan_frozen']}→{r['scan_retrained']} "
            f"| {r['probes_frozen']}→{r['probes_retrained']} |"
        )
    return out


def write_md(rows, sf10_rows=None, recall_rows=None) -> None:
    out = [
        "# SCALE.md — 10× scale-up probe (sf0.1 → sf1, same 32 cores)",
        "",
        "Generated by `python tools/scale_probe.py`.  sf1 = 10 disjoint-key",
        "replicas of every sf0.1 fact table (6M lineitem / 1M events / 50k",
        "near-duplicate documents / 20k embeddings), multi-file parquet so",
        "scans split.  Wall times are the best of two timed runs after",
        "one untimed warm-up (cached-silver steady state, matching",
        "bench.py semantics).  On fixed",
        "cores, ideal data-linear scaling is ratio ≈ 10×; below 10× means",
        "the sf0.1 run under-used the machine (fixed overheads, short",
        "stages); materially above ~15× flags superlinear work or a plan",
        "flip — those get a note.  Join-strategy drift between columns is",
        "expected where a 10×-bigger build side crosses the broadcast",
        "threshold (BroadcastHashJoin → SortMergeJoin is the *correct*",
        "adaptive response, not a regression).",
        "",
        "Corpus queries (documents/embeddings) carry a second scaled point,",
        "**sf1i**: sf1's replica families are NEAR-DUPLICATES of each other",
        "(worst case for dedup/LSH — the true pair set itself grows",
        "~replicas² per family, visible in the rows column), while sf1i",
        "breaks cross-replica similarity so the duplication RATE matches",
        "sf0.1.  A dedup query is output-bound, not plan-bound, when its",
        "sf1 wall ratio tracks its sf1 ROW ratio while its sf1i ratio",
        "stays near-linear.",
        "",
        "| Query | sf0.1 (s) | sf1 (s) | ratio | sf1i (s) | ratio | rows sf0.1→sf1→sf1i | joins @sf0.1 | joins @sf1 |",
        "|---|---|---|---|---|---|---|---|---|",
    ]
    for r in rows:
        rows_str = f"{r.get('sf0.1_rows', '—')}→{r.get('sf1_rows', '—')}"
        if "sf1i_rows" in r:
            rows_str += f"→{r['sf1i_rows']}"
        out.append(
            f"| `{r['query']}` | {r.get('sf0.1', '—')} | {r.get('sf1', '—')} "
            f"| {r.get('ratio_sf1', '—')}× | {r.get('sf1i', '—')} "
            f"| {r.get('ratio_sf1i', '—')}× | {rows_str} "
            f"| {r.get('sf0.1_joins', '—')} | {r.get('sf1_joins', '—')} |"
        )
    cand_rows = [r for r in rows if any(k.endswith("_cand") for k in r)]
    if cand_rows:
        out += [
            "",
            "## Candidate-pair counters (pre-verify, per axis)",
            "",
            "The sketch-then-verify dedup families count their candidate",
            "set BEFORE the verify join on every axis: wall growth with",
            "linear candidates = plan/join-strategy issue; superlinear",
            "candidates = blocking-scheme issue.  Same-fix ambiguity a",
            "wall-ratio table cannot resolve.",
            "",
        ]
        # render cand/rows columns dynamically from the axes actually
        # measured (sf10 runs record sf10_cand too — a fixed column
        # list silently dropped the second-decade datapoint)
        tags = [
            t
            for t in ("sf0.1", "sf1", "sf1i", "sf10")
            if any(t + "_cand" in r for r in cand_rows)
        ]
        out.append(
            "| Query | "
            + " | ".join(f"cand {t}" for t in tags)
            + " | verify-rows "
            + "→".join(tags)
            + " |"
        )
        out.append("|---|" + "---|" * (len(tags) + 1))
        for r in cand_rows:
            cands = " | ".join(str(r.get(t + "_cand", "—")) for t in tags)
            vrows = "→".join(str(r.get(t + "_rows", "—")) for t in tags)
            out.append(f"| `{r['query']}` | {cands} | {vrows} |")
    errs = [(r["query"], k, v) for r in rows for k, v in r.items() if k.endswith("_err")]
    if errs:
        out += ["", "## Errors", ""]
        out += [f"- `{q}` at {k[:-4]}: {v}" for q, k, v in errs]
    # sf10/recall sections survive partial re-runs: results are cached
    # under .scale/ (saved phase-by-phase in main()) and re-rendered
    # when the current invocation didn't measure them, so regenerating
    # the main table never silently drops the other sections.
    if sf10_rows is None:
        sf10_rows = _cache_load("sf10_results")
    if recall_rows is None:
        recall_rows = _cache_load("recall_results")
    if sf10_rows:
        out += _render_sf10(sf10_rows)
    if recall_rows:
        out += _render_recall(recall_rows)
    frontier_rows = _cache_load("frontier_results")
    if frontier_rows:
        out += _render_frontier(frontier_rows)
    drift_rows = _cache_load("drift_results")
    if drift_rows:
        out += _render_drift(drift_rows)
    out += ["", *derived_findings(rows), "", FINDINGS.strip(), ""]
    with open(os.path.join(REPO, "SCALE.md"), "w") as fh:
        fh.write("\n".join(out))
    print(f"wrote SCALE.md ({len(rows)} queries)", flush=True)


def _cache_path(key: str) -> str:
    return os.path.join(REPO, ".scale", key + ".json")


def _cache_save(key: str, data) -> None:
    os.makedirs(os.path.join(REPO, ".scale"), exist_ok=True)
    with open(_cache_path(key), "w") as fh:
        json.dump(data, fh)


def _cache_load(key: str):
    if os.path.exists(_cache_path(key)):
        with open(_cache_path(key)) as fh:
            return json.load(fh)
    return None


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--build", action="store_true", help="(re)generate .scale/sf1")
    ap.add_argument("--queries", nargs="*", default=None)
    ap.add_argument(
        "--sf10",
        action="store_true",
        help="also probe the iterative tier at sf10 (100×) with job counts",
    )
    ap.add_argument(
        "--recall",
        action="store_true",
        help="also measure ANN recall@k vs brute force at sf1",
    )
    args = ap.parse_args()

    # The probe runs text/graph workloads at up to 100× sf0.1 in ONE
    # local JVM — the default 8 g driver heap OOMs there (learned the
    # hard way on the first sf10 run); the box has 128 GiB.
    os.environ.setdefault("SPARK_DRIVER_MEM", "64g")

    from damg7245_casestudy_03_ai_scoring_engine_spark.session import get_spark

    spark = get_spark("scale-probe", cpus=32, shuffle_partitions=64)
    spark.sparkContext.setLogLevel("ERROR")

    if args.build or not os.path.isdir(SF1) or not os.path.isdir(SF1I):
        print("building sf1 ...", flush=True)
        build_sf1(spark)
    if args.sf10 and not os.path.isdir(SF10):
        print("building sf10 (100 replicas, rate-preserving docs) ...", flush=True)
        _replicate(spark, SF10, 100, parts=64, tagged_docs=True)
    if args.build and args.queries is None and not (args.sf10 or args.recall):
        return 0

    names = args.queries or DEFAULT_QUERIES
    rows = probe(spark, names)
    # merge into the cached main table (by query name) so subset
    # re-runs refresh rows instead of clobbering the whole table, and
    # save BEFORE the later phases so a crash there loses nothing
    merged = {r["query"]: r for r in (_cache_load("main_results") or [])}
    merged.update({r["query"]: r for r in rows})
    order = [q for q in DEFAULT_QUERIES if q in merged]
    order += [q for q in merged if q not in set(order)]
    rows = [merged[q] for q in order]
    _cache_save("main_results", rows)

    sf10_rows = None
    if args.sf10:
        print("probing iterative tier at sf10 ...", flush=True)
        sf10_rows = probe(
            spark,
            ITERATIVE_QUERIES + CORPUS_SF10_QUERIES,
            points=[("sf0.1", SF01), ("sf10", SF10)],
            with_jobs=True,
        )
        _cache_save("sf10_results", sf10_rows)
    recall_rows = None
    if args.recall:
        print("measuring ANN recall at sf1 ...", flush=True)
        recall_rows = ann_recall(spark)
        _cache_save("recall_results", recall_rows)
    write_md(rows, sf10_rows, recall_rows)
    print(json.dumps(
        {"probe": rows, "sf10": sf10_rows, "recall": recall_rows}, default=str
    ))
    return 1 if recall_rows and not all(r["floor_ok"] for r in recall_rows) else 0


if __name__ == "__main__":
    sys.exit(main())
