"""Registry-WIDE physical-plan lint — the structural backstop behind
test_plans.py's per-query pins.

Three scale smells are swept across every registered query's plan at
sf0.001:

1. CartesianProduct: never allowed.  (Broadcast scalar attaches plan
   as BroadcastNestedLoopJoin, so a CartesianProduct can only mean a
   non-broadcast cross join — quadratic shuffle at scale.)
2. BroadcastNestedLoopJoin: allowed ONLY on the pinned allowlist —
   1-row/scalar-frame attaches (corpus totals, thresholds, boundary
   frames) and the documented O(n²) oracle baselines whose blocked
   scale twins are separately registered.  A new query acquiring a
   BNLJ must be added here deliberately, with the justification that
   its build side is O(1)-ish rows.
3. Unpartitioned ranking windows (row_number/rank over a
   partition-less spec): allowed ONLY on the allowlist — frames that
   are provably tiny at any corpus size (per-duration survival grain,
   top-k boards, O(#days) carries, quantile boundary frames) plus the
   one documented anti-pattern twin (`pagination`, whose keyset
   sibling is the scale path).

The lists are exact pins, not lower bounds: a query LEAVING a list is
also a (good) signal — shrink the pin.
"""

from __future__ import annotations

import pytest

from damg7245_casestudy_03_ai_scoring_engine_spark.operators import REGISTRY
from damg7245_casestudy_03_ai_scoring_engine_spark.plans.inspect import explain_str

from conftest import SF_SMOKE

BNLJ_OK = {
    # documented O(n²) oracle baselines (blocked twins registered)
    "ann_topk_bruteforce",
    # inherits ann_topk_bruteforce's truth subtree: exact top-k ground
    # truth over the FIXED 10-query eval panel (10-row broadcast build
    # side — one linear corpus scan per eval, not O(n²))
    "retrieval_eval_rank_metrics",
    # 1-row broadcast corpus-total attach (scan_fraction denominator)
    "ivf_probe_cost_profile",
    # source-pair matrix: broadcast inequality join of the ~20-row
    # per-source size table with itself (s(s-1)/2 pairs by design —
    # source count, never corpus size, bounds the build side)
    "source_overlap_matrix",
    "dedup_containment",
    "dedup_simhash",
    "embedding_near_dup",
    "semantic_doc_retrieval",
    "rag_context_assembly",
    # tiny-build-side scalar/boundary attaches (corpus totals, split
    # thresholds, codebooks, priors, query sets — O(1)..O(k) rows)
    "ann_pq_adc_topk",
    "binaryfile_artifact_scan",
    "bm25_retrieval",
    "cuped_adjusted_lift",
    "curation_decision_gate",
    "data_quality_expectations",
    "domain_token_budget",
    "dsir_importance_weights",
    "drift_chi2_value_buckets",
    "eb_shrunk_return_rates",
    "embedding_drift_by_label",
    "fulfillment_lag_quantiles",
    "hr_position_stack",
    "hybrid_retrieval_rrf",
    "item_cooccurrence_topk",
    "kaplan_meier_churn",
    "kmeans_lloyd_deterministic",
    "ks_two_sample_drift",
    "markov_removal_attribution",
    "mixture_resample",
    "negative_sample_pairs",
    "popularity_recsys_eval",
    "quantile_profile",
    "rfm_segmentation",
    "sem_bootstrap_ci",
    "spatial_nn_expanding_ring",
    "target_encoding_smoothed",
    "temperature_mixing_weights",
    # r13: ivf_refile_oversized / ivf_append_refile dropped off this
    # list — the (total, ncells) admission attach is now a window over
    # the O(cells) sizes frame, no crossJoin-broadcast (guide §2.4)
    # r13: n_tot now rides as a 1-row broadcast agg over the ≤9-row
    # obs frame (was an eager second full scan of orders)
    "benford_digit_audit",
    # r13: the constant hyperplane-weight table rides as a 1-row
    # broadcast frame (array<array<bigint>>) instead of an in-plan
    # literal forest — same 1-row-attach class as the scalar attaches
    # above; the join side is always exactly one row
    "lsh_cosine_pairs",
    "lsh_pairs_topk",
    # r13: corpus token total as a 1-row broadcast agg over the unigram
    # counts (was an eager second tokenize+explode pass)
    "bigram_collocations",
    # same 1-row decimal-normalizer attach as its raw twin above,
    # over the kept corpus (r11)
    "post_dedup_mixing_weights",
    "tfidf_top_terms",
    "trending_users_decayed",
    "unigram_ll_quality",
    "value_tier_rangejoin",
    "watermark_drop_audit",
}

UNPARTITIONED_RANK_OK = {
    # bounded frames: per-duration survival grains, top-k boards,
    # decile/threshold grids, O(#iterations·#nodes-retained) ranks
    "abc_classification",
    "auc_value_score",
    "bigram_collocations",
    "bm25_retrieval",
    # metadata-grain cumulative packing: one row per partition/file
    # (~10^6 rows even for a million-file table) — bounded tiny by
    # construction, like the sweep-line day-carry
    "compaction_plan_bins",
    "curation_decision_gate",
    "dhondt_apportionment",
    "heavy_hitter_tokens",
    "hierarchical_budget_allocation",
    "hybrid_retrieval_rrf",
    "kaplan_meier_churn",
    "kaplan_meier_conversion",
    "logrank_conversion_test",
    "max_concurrent_sessions",
    "mom_revenue_growth",
    "neyman_stratified_sample",
    "pagerank_top_nodes",
    "popularity_recsys_eval",
    # r13 sweep-line rewrite: the global cumsum runs over the per-DAY
    # delta frame (O(observed days) rows after the groupBy — the day
    # axis, never events), the same bounded-tiny class as
    # compaction_plan_bins above
    "rolling_active_users",
    "pr_curve_thresholds",
    "qini_curve_buckets",
    "sem_bootstrap_ci",
    "supplier_return_wilson",
    "trending_users_decayed",
    "unigram_ll_quality",
    # the documented O3 anti-pattern twin; pagination_keyset is the
    # registered scale path
    "pagination",
}


@pytest.fixture(scope="module")
def all_plans(spark):
    plans = {}
    for name, spec in sorted(REGISTRY.items()):
        plans[name] = explain_str(spec.fn(spark, SF_SMOKE))
    return plans


def test_no_cartesian_product_anywhere(all_plans):
    bad = [n for n, s in all_plans.items() if "CartesianProduct" in s]
    assert not bad, f"CartesianProduct in: {bad}"


def test_bnlj_only_on_allowlist(all_plans):
    have = {n for n, s in all_plans.items() if "BroadcastNestedLoopJoin" in s}
    new = have - BNLJ_OK
    gone = BNLJ_OK - have
    assert not new, (
        f"new BroadcastNestedLoopJoin in {sorted(new)} — broadcast-scalar "
        f"attach or O(n²) baseline?  Add to BNLJ_OK with a justification."
    )
    assert not gone, f"BNLJ_OK entries no longer needed (shrink the pin): {sorted(gone)}"


def _window_spec_args(s: str):
    """Top-level argument lists of every windowspecdefinition in a
    plan string, paren-BALANCED: order expressions may themselves
    contain parens (`cast(x as int) ASC`), which a `[^)]*` regex
    truncates at — silently un-flagging an unpartitioned window."""
    token = "windowspecdefinition("
    i = s.find(token)
    while i != -1:
        j = i + len(token)
        depth, args, cur = 1, [], []
        while j < len(s) and depth:
            c = s[j]
            if c == "(":
                depth += 1
                cur.append(c)
            elif c == ")":
                depth -= 1
                if depth:
                    cur.append(c)
            elif c == "," and depth == 1:
                args.append("".join(cur).strip())
                cur = []
            else:
                cur.append(c)
            j += 1
        args.append("".join(cur).strip())
        yield args
        i = s.find(token, j)


def _has_unpartitioned_rank(s: str) -> bool:
    # partition keys precede order expressions in the spec, so a spec
    # whose FIRST top-level argument is an order expression (has an
    # ASC/DESC direction) has no partitioning at all
    for args in _window_spec_args(s):
        first = args[0] if args else ""
        if " ASC" in first or " DESC" in first:
            return True
    return False


def test_unpartitioned_rank_windows_only_on_allowlist(all_plans):
    have = {n for n, s in all_plans.items() if _has_unpartitioned_rank(s)}
    new = have - UNPARTITIONED_RANK_OK
    gone = UNPARTITIONED_RANK_OK - have
    assert not new, (
        f"new UNPARTITIONED ranking window in {sorted(new)} — the whole "
        f"input funnels through one task; partition it (or allowlist a "
        f"provably tiny frame)."
    )
    assert not gone, f"allowlist entries no longer needed: {sorted(gone)}"
