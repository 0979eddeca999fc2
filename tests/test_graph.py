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


def test_label_propagation_matches_python_replay(spark):
    """LPA communities must match an exact Python replay of the same
    4-round synchronous majority-vote iteration, and community sizes
    must partition the node set."""
    from collections import Counter, defaultdict

    from damg7245_casestudy_03_ai_scoring_engine_spark.operators import REGISTRY
    from damg7245_casestudy_03_ai_scoring_engine_spark.operators.graph import (
        _LPA_ITERS,
    )

    edges = transaction_edges(spark, SF_SMOKE)
    pairs = [(r.src, r.dst) for r in edges.collect()]
    nbrs = defaultdict(list)
    for s, d in pairs:
        nbrs[d].append(s)  # labels flow src -> dst
    nodes = sorted({s for s, _ in pairs})
    lab = {v: v for v in nodes}
    for _ in range(_LPA_ITERS):
        nxt = {}
        for v in nodes:
            c = Counter(lab[u] for u in nbrs[v])
            best = max(c.items(), key=lambda kv: (kv[1], -kv[0]))
            nxt[v] = best[0]
        lab = nxt
    want = Counter(lab.values())

    rows = REGISTRY["label_propagation_communities"].fn(spark, SF_SMOKE).collect()
    got = {r.community: r.n_nodes for r in rows}
    assert got == dict(want)
    assert sum(got.values()) == len(nodes)
    for r in rows:
        assert lab[r.min_node] == r.community
