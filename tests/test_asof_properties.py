"""Property-based cross-checks for the scale operators: the as-of
join against pandas.merge_asof (an independent, battle-tested
implementation of the same semantics), and the salted aggregation
against the direct groupBy.
"""

from __future__ import annotations

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from damg7245_casestudy_03_ai_scoring_engine_spark.operators.asof import asof_join
from damg7245_casestudy_03_ai_scoring_engine_spark.operators.skew import salted_sum

_keys = st.integers(min_value=0, max_value=3)
_times = st.integers(min_value=0, max_value=50)


@settings(max_examples=12, deadline=None)
@given(
    left=st.lists(st.tuples(_keys, _times), min_size=1, max_size=25),
    right=st.lists(st.tuples(_keys, _times), min_size=1, max_size=25),
)
def test_asof_join_matches_pandas_merge_asof(spark, left, right):
    # dedupe right per (key, time) — the operator's documented contract
    right = sorted({(k, t) for k, t in right})
    left = sorted(left)

    ldf = spark.createDataFrame(
        [(i, k, t) for i, (k, t) in enumerate(left)], "lid long, k long, lt long"
    )
    rdf = spark.createDataFrame(
        [(k, t, k * 1000 + t) for k, t in right], "k long, rt long, payload long"
    )
    got = {
        (r.lid): (r.matched_rt, r.payload)
        for r in asof_join(ldf, rdf, on=["k"], left_time="lt", right_time="rt").collect()
    }

    lp = pd.DataFrame([(i, k, t) for i, (k, t) in enumerate(left)],
                      columns=["lid", "k", "lt"]).sort_values("lt", kind="stable")
    rp = pd.DataFrame(right, columns=["k", "rt"])
    rp["payload"] = rp.k * 1000 + rp.rt
    rp = rp.sort_values("rt", kind="stable")
    m = pd.merge_asof(
        lp, rp, left_on="lt", right_on="rt", by="k", direction="backward"
    )
    want = {
        int(row.lid): (int(row.rt), int(row.payload))
        for row in m.itertuples()
        if not pd.isna(row.rt)
    }
    assert got == want


@settings(max_examples=12, deadline=None)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2),
            st.floats(min_value=-100, max_value=100, allow_nan=False, width=32),
        ),
        min_size=1,
        max_size=40,
    )
)
def test_salted_sum_equals_plain_groupby(spark, rows):
    df = spark.createDataFrame(rows, "k int, v double")
    got = {
        r.k: (r.n, r.sum_v)
        for r in salted_sum(df, "k", ["v"], n_salts=4)
        .withColumnRenamed("sum_v", "sum_v")
        .collect()
    }
    want = {
        r.k: (r.n, r.sum_v)
        for r in df.groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("v"), 4).alias("sum_v"))
        .collect()
    }
    assert got == want


def test_asof_tolerance_is_filtered_subset_of_backward(spark):
    from conftest import SF_SMOKE
    from damg7245_casestudy_03_ai_scoring_engine_spark.operators import REGISTRY

    back = {
        r.click_id: r.matched_err_t_ns
        for r in REGISTRY["asof_join_events"].fn(spark, SF_SMOKE).collect()
    }
    tol = {
        r.click_id: (r.click_t_ns, r.matched_err_t_ns)
        for r in REGISTRY["asof_join_tolerance"].fn(spark, SF_SMOKE).collect()
    }
    hour_ns = 3_600 * 1_000_000_000
    for click_id, (ct, mt) in tol.items():
        assert back[click_id] == mt  # same match as unbounded backward
        assert 0 <= ct - mt <= hour_ns  # within tolerance


def test_asof_forward_matches_are_at_or_after(spark):
    from conftest import SF_SMOKE
    from damg7245_casestudy_03_ai_scoring_engine_spark.operators import REGISTRY

    rows = REGISTRY["asof_join_forward"].fn(spark, SF_SMOKE).collect()
    assert rows
    assert all(r.matched_err_t_ns >= r.click_t_ns for r in rows)


@settings(max_examples=12, deadline=None)
@given(
    left=st.lists(st.tuples(_keys, _times), min_size=1, max_size=20),
    right=st.lists(st.tuples(_keys, _times), min_size=1, max_size=20),
    direction=st.sampled_from(["backward", "forward"]),
    tol=st.sampled_from([None, 5, 20]),
)
def test_asof_variants_match_pandas(spark, left, right, direction, tol):
    """Forward direction and tolerance must agree with pandas
    merge_asof — the independent reference implementation — across
    random key/time sets."""
    right = sorted({(k, t) for k, t in right})
    left = sorted(left)

    ldf = spark.createDataFrame(
        [(i, k, t) for i, (k, t) in enumerate(left)], "lid long, k long, lt long"
    )
    rdf = spark.createDataFrame(
        [(k, t, k * 1000 + t) for k, t in right], "k long, rt long, payload long"
    )
    got = {
        r.lid: (r.matched_rt, r.payload)
        for r in asof_join(
            ldf, rdf, on=["k"], left_time="lt", right_time="rt",
            direction=direction, tolerance=tol,
        ).collect()
    }

    lp = pd.DataFrame(
        [(i, k, t) for i, (k, t) in enumerate(left)], columns=["lid", "k", "lt"]
    ).sort_values("lt", kind="stable")
    rp = pd.DataFrame(right, columns=["k", "rt"])
    rp["payload"] = rp.k * 1000 + rp.rt
    rp = rp.sort_values("rt", kind="stable")
    m = pd.merge_asof(
        lp, rp, left_on="lt", right_on="rt", by="k",
        direction=direction, tolerance=tol,
    )
    want = {
        int(row.lid): (int(row.rt), int(row.payload))
        for row in m.itertuples()
        if not pd.isna(row.rt)
    }
    assert got == want
