"""The numpy-vectorized ANN path must return the same top-k as the
JVM zip_with/aggregate brute force (scores to 5dp — the two sum the
dot product in different orders)."""

from __future__ import annotations

from damg7245_casestudy_03_ai_scoring_engine_spark.operators import REGISTRY

from conftest import SF_SMOKE


def test_vectorized_ann_matches_jvm_bruteforce(spark):
    jvm = {
        (r.query_id, r.cand_id): (r.rk, round(r.cosine, 5))
        for r in REGISTRY["ann_topk_bruteforce"].fn(spark, SF_SMOKE).collect()
    }
    vec = {
        (r.query_id, r.cand_id): (r.rk, round(r.cosine, 5))
        for r in REGISTRY["ann_topk_vectorized"].fn(spark, SF_SMOKE).collect()
    }
    assert jvm == vec
