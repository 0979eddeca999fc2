"""PageRank pinned against a numpy power iteration on the same
adjacency — the independent implementation of the same fixpoint."""

from __future__ import annotations

import numpy as np

from damg7245_casestudy_03_ai_scoring_engine_spark.operators.graph import (
    _DAMPING,
    _ITERATIONS,
    pagerank,
    transaction_edges,
)

from conftest import SF_SMOKE


def test_pagerank_matches_numpy_power_iteration(spark):
    edges = transaction_edges(spark, SF_SMOKE)
    pairs = [(r.src, r.dst) for r in edges.collect()]
    nodes = sorted({x for e in pairs for x in e})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    deg = np.zeros(n)
    for s, _ in pairs:
        deg[idx[s]] += 1
    r = np.full(n, 1.0 / n)
    base = (1.0 - _DAMPING) / n
    for _ in range(_ITERATIONS):
        nxt = np.full(n, base)
        contrib = r / deg
        for s, d in pairs:
            nxt[idx[d]] += _DAMPING * contrib[idx[s]]
        r = nxt
    want = {node: r[idx[node]] for node in nodes}

    got = {row.node: row.rank for row in pagerank(edges).collect()}
    assert set(got) == set(want)
    for node, rv in want.items():
        assert abs(got[node] - rv) < 1e-9, (node, got[node], rv)


def test_pagerank_mass_conserved(spark):
    got = pagerank(transaction_edges(spark, SF_SMOKE))
    total = sum(r.rank for r in got.collect())
    assert abs(total - 1.0) < 1e-6
