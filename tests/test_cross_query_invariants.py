"""Conservation laws BETWEEN registry queries: independent operators
over the same data must agree on the totals they share.  These
catch a class of bug single-query oracles can't — a filter silently
dropping rows in one query while its sibling keeps them."""

from __future__ import annotations

from pyspark.sql import functions as F

from damg7245_casestudy_03_ai_scoring_engine_spark.operators import REGISTRY
from damg7245_casestudy_03_ai_scoring_engine_spark.sources.catalog import load

from conftest import SF_SMOKE


def test_sliding_windows_count_each_event_four_times(spark):
    """1h/15min sliding windows: every event lands in exactly 4
    windows (data starts long after epoch, so no boundary loss)."""
    n_events = load(spark, SF_SMOKE, "events").count()
    sliding_total = (
        REGISTRY["sliding_window_counts"]
        .fn(spark, SF_SMOKE)
        .agg(F.sum("n_events"))
        .collect()[0][0]
    )
    assert sliding_total == 4 * n_events


def test_tumbling_windows_conserve_events(spark):
    n_events = load(spark, SF_SMOKE, "events").count()
    total = (
        REGISTRY["stream_window_counts"]
        .fn(spark, SF_SMOKE)
        .agg(F.sum("n_events"))
        .collect()[0][0]
    )
    assert total == n_events


def test_histogram_and_split_conserve_documents(spark):
    n_docs = load(spark, SF_SMOKE, "documents").count()
    hist_total = (
        REGISTRY["corpus_length_histogram"]
        .fn(spark, SF_SMOKE)
        .agg(F.sum("n_docs"))
        .collect()[0][0]
    )
    split_total = (
        REGISTRY["train_test_split"]
        .fn(spark, SF_SMOKE)
        .agg(F.sum("n_docs"))
        .collect()[0][0]
    )
    assert hist_total == n_docs == split_total


def test_cohort_week_zero_defines_cohort_size(spark):
    rows = REGISTRY["cohort_retention"].fn(spark, SF_SMOKE).collect()
    by_cohort: dict = {}
    for r in rows:
        by_cohort.setdefault(r.cohort_week, {})[r.week_offset] = r
    for week, offsets in by_cohort.items():
        assert 0 in offsets, week
        week0 = offsets[0]
        assert week0.n_active == week0.cohort_size
        for r in offsets.values():
            assert r.n_active <= r.cohort_size


def test_funnel_stages_are_monotone(spark):
    (row,) = REGISTRY["session_conversion_funnel"].fn(spark, SF_SMOKE).collect()
    assert row.n_sessions >= row.n_viewed >= row.n_clicked >= row.n_converted >= 0


def test_sessionization_conserves_events(spark):
    n_events = load(spark, SF_SMOKE, "events").count()
    total = (
        REGISTRY["user_sessionization"]
        .fn(spark, SF_SMOKE)
        .agg(F.sum("n_events"))
        .collect()[0][0]
    )
    assert total == n_events


def test_revenue_shares_sum_to_one(spark):
    total = (
        REGISTRY["revenue_share_report"]
        .fn(spark, SF_SMOKE)
        .agg(F.sum("share"))
        .collect()[0][0]
    )
    assert abs(total - 1.0) < 1e-4


def test_scd2_versions_cover_every_customer_exactly_once_per_date(spark):
    """The as-of snapshot must hold exactly one version per customer —
    intervals partition time."""
    n_customers = load(spark, SF_SMOKE, "customer").count()
    snap_total = (
        REGISTRY["scd2_snapshot_asof"]
        .fn(spark, SF_SMOKE)
        .agg(F.sum("n_rows"))
        .collect()[0][0]
    )
    assert snap_total == n_customers


def test_ngram_novelty_attribution_semantics(spark, tmp_path):
    """Hand-computed novelty on a 3-doc corpus: a verbatim repeat of an
    earlier doc scores 0, a half-overlapping doc scores 0.5, and the
    corpus-wide sum of n_novel equals the number of distinct grams
    (every gram is introduced exactly once)."""
    rows = [
        (1, "en", "a b c d", 7),   # grams {a b c, b c d} — both novel
        (2, "en", "a b c d", 7),   # verbatim repeat        — novelty 0
        (3, "en", "b c d e", 7),   # {b c d (old), c d e}   — novelty 0.5
    ]
    spark.createDataFrame(
        rows, "doc_id bigint, lang string, text string, n_chars int"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = {
        r.doc_id: r
        for r in REGISTRY["ngram_novelty_scores"].fn(spark, str(tmp_path)).collect()
    }
    assert (out[1].n_grams, out[1].n_novel, out[1].novelty_frac) == (2, 2, 1.0)
    assert (out[2].n_grams, out[2].n_novel, out[2].novelty_frac) == (2, 0, 0.0)
    assert (out[3].n_grams, out[3].n_novel, out[3].novelty_frac) == (2, 1, 0.5)
    assert sum(r.n_novel for r in out.values()) == 3  # distinct grams overall
