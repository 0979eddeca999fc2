#!/usr/bin/env python
"""Staleness → recall curve for the IVF retrain threshold.

`ivf_codebook_drift_stats` flags a cell for retrain when the cosine
between its FROZEN centroid and its current post-append member mean
falls below tau (= 0.85, chosen inside the fixture's measured
0.81-0.91 band so both flag branches run at every test SF — a test
-design choice, not a measured operating point).  This sweep derives
the threshold from a MEASURED curve instead (the r9 frontier-sweep
discipline applied to the retrain knob): inject controlled staleness
into the arriving batch, and for each staleness level record

  - the SIGNAL: per-cell drift cosine under the frozen codebook
    (min / mean — the exact 6dp arithmetic the registered signal
    computes), and
  - the HARM + the CURE: recall@5 of the margin-adaptive probe
    (engine operating point delta=0.2 cap=5) against the post-append
    corpus, probing (a) the FROZEN codebook/filing — what an index
    that never retrains delivers — and (b) the POST-RETRAIN index
    produced by `ivf_codebook_retrain`'s exact semantics (flagged
    centroids refit to current member means, flagged members refiled
    among retrained centroids only).

Staleness injection: the deterministic 10% delta batch (the
registered salted-md5 split) is blended toward a NOVEL MODE — a fixed
deterministic direction that is no existing centroid's,
x' = (1-lam)·x + lam·(mean_norm·d) — the "new data distribution the
codebook has never seen" case.  lam=0 reproduces the registered
fixture state bit-for-bit.  (A first sweep blended toward an EXISTING
centroid instead and measured NOTHING: drift stayed 0.91-0.94 and
recall flat at every lam on both axes, because argmax-consistent
filing simply migrates shifted vectors into the cell they now belong
to — IVF add() absorbs mode MIGRATION by construction; only a mode
the codebook cannot express creates staleness.  That null result is
itself the first finding.)

The query panel is drawn from the DELTA batch (shifted queries):
production staleness harms the users querying for the new mode, not
the standing corpus.  The harm axis is BOTH recall and probe COST
(scan fraction / probe count): a stale codebook gives new-mode
queries flat quantizer margins, escalating the margin-adaptive probe
to its cap, while the retrained codebook matches the mode confidently.

This is a NUMPY replica of the engine arithmetic (6dp cosines,
label-asc argmax ties — the tools/frontier_sweep.py precedent: a
Spark sweep costs minutes per point, numpy milliseconds, and
tests/test_similarity_paths.py pins the replica against the engine at
fixture scale).  Results cache to .scale/drift_results.json and
render into SCALE.md via tools/scale_probe.py.
"""

from __future__ import annotations

import hashlib
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from frontier_sweep import REPO, cell_scores, load_table  # noqa: E402

from damg7245_casestudy_03_ai_scoring_engine_spark.operators.similarity import (  # noqa: E402
    _IVF_CAP as PROBE_CAP,
    _IVF_DELTA as PROBE_DELTA,
    _IVF_DELTA_SEED as _DELTA_SEED,
    _IVF_DRIFT_TAU as TAU,
)

N_QUERIES = 10
TOP_K = 5
LAMBDAS = (0.0, 0.2, 0.4, 0.6, 0.8)
# TAU above (imported — the REGISTERED threshold) is the sweep table's
# default retrain policy: it is the policy that DEMONSTRATES the
# harmful band (it retrains half-formed modes).  The production pin
# (tests/test_similarity_paths.py) re-runs sweep_axis at
# _IVF_DRIFT_TAU_SCALED to certify the production policy itself.


def delta_mask(vec_id: np.ndarray) -> np.ndarray:
    """The registered salted-md5 10% split, bit-exact."""
    return np.array(
        [
            int(hashlib.md5((str(int(v)) + _DELTA_SEED).encode()).hexdigest()[:8], 16)
            % 100
            >= 90
            for v in vec_id
        ]
    )


def file_by(emb: np.ndarray, cents: np.ndarray, cells: np.ndarray) -> np.ndarray:
    """argmax-cosine filing (6dp, cell-asc ties) — `_ivf_cells`'
    arithmetic; `cells` maps centroid row -> cell id (sorted asc, so
    np.argmax's first-max rule is the asc tie-break)."""
    return cells[np.argmax(cell_scores(emb, cents), axis=1)]


def probe_stats(
    emb: np.ndarray,
    vec_id: np.ndarray,
    qidx: np.ndarray,
    cents: np.ndarray,
    cells: np.ndarray,
    filed: np.ndarray,
    truth: dict[int, set],
) -> tuple[float, float, float]:
    """(recall@5, scan fraction, avg probes) of the margin-adaptive
    probe (delta=0.2 cap=5) for the query panel, against `truth`."""
    vn = np.sqrt((emb * emb).sum(axis=1))
    members = {c: np.where(filed == c)[0] for c in cells}
    scores = cell_scores(emb[qidx], cents)
    recalls, fracs, probes = [], [], []
    for row, qi in enumerate(qidx):
        s = scores[row]
        rank = np.lexsort((cells, -s))
        best = s.max()
        probe = [
            cells[j]
            for pos, j in enumerate(rank)
            if pos < 1 or (pos < PROBE_CAP and s[j] >= best - PROBE_DELTA)
        ]
        cand = np.concatenate([members[c] for c in probe if len(members[c])])
        cand = cand[vec_id[cand] != vec_id[qi]]
        with np.errstate(divide="ignore", invalid="ignore"):
            cos = np.where(
                (vn[qi] > 0) & (vn[cand] > 0),
                emb[cand] @ emb[qi] / (vn[cand] * vn[qi]),
                0.0,
            )
        cos = np.round(cos, 6)
        order = np.lexsort((vec_id[cand], -cos))[:TOP_K]
        got = set(vec_id[cand[order]].tolist())
        t = truth[int(vec_id[qi])]
        recalls.append(len(got & t) / len(t))
        fracs.append(sum(len(members[c]) for c in probe) / len(vec_id))
        probes.append(len(probe))
    return (
        float(np.mean(recalls)),
        float(np.mean(fracs)),
        float(np.mean(probes)),
    )


def sweep_axis(
    sf_dir: str, axis: str, tau: float = TAU, trigger: float | None = None
) -> list[dict]:
    """One axis of the staleness sweep.  `tau` is the ADMISSION
    threshold (which cells get refit once a retrain runs — the
    registered drift flag); `trigger` (optional) gates WHETHER the
    retrain runs at all: act only when min per-cell drift < trigger.
    trigger=None is the always-act single-threshold policy the table
    renders (it demonstrates the harmful half-formed-mode band by
    retraining into it); the production pin runs (tau=registered
    0.85, trigger=scaled 0.55) — measured here: admitting a strict
    SUBSET of drifted cells (e.g. tau=0.55 alone at sf1 lam=0.8)
    collapses recall 1.0→0.62, because the confident refit centroid
    suppresses the probe escalation that was compensating for the
    remaining stale cells; trigger-low + admit-wide retrains the
    whole drifted family or nothing, and wins at every point."""
    vec_id, label, emb0 = load_table(sf_dir)
    is_delta = delta_mask(vec_id)
    standing = ~is_delta
    labels = np.unique(label)
    # FROZEN quantizer: per-label means over STANDING vectors only —
    # _ivf_frozen_quantizer's arithmetic
    frozen = np.stack([emb0[standing & (label == c)].mean(axis=0) for c in labels])
    lbl_pos = {int(c): i for i, c in enumerate(labels)}

    # the novel mode: a fixed deterministic direction (seeded — this
    # is an offline tool, the determinism requirement is replayability
    # across runs), scaled to the corpus' mean norm
    rng = np.random.default_rng(7)
    d = rng.standard_normal(emb0.shape[1])
    d = d / np.linalg.norm(d) * float(np.sqrt((emb0 * emb0).sum(axis=1)).mean())

    # the query panel: the 10 lowest-id DELTA vectors — the users
    # querying FOR the new mode (standing queries never see it)
    didx = np.where(is_delta)[0]
    qidx = didx[np.argsort(vec_id[didx])][:N_QUERIES]

    rows = []
    for lam in LAMBDAS:
        emb = emb0.copy()
        emb[is_delta] = (1.0 - lam) * emb0[is_delta] + lam * d

        filed = file_by(emb, frozen, labels)  # post-append frozen filing
        # the SIGNAL: per-cell drift cosine (current member mean vs
        # frozen centroid), 6dp — ivf_codebook_drift_stats' arithmetic
        drift = {}
        for i, c in enumerate(labels):
            m = emb[filed == c]
            if not len(m):
                drift[int(c)] = 0.0
                continue
            mu = m.mean(axis=0)
            nm, nc = np.linalg.norm(mu), np.linalg.norm(frozen[i])
            drift[int(c)] = round(
                float(mu @ frozen[i] / (nm * nc)) if nm > 0 and nc > 0 else 0.0, 6
            )
        flagged = [c for c, d in drift.items() if d < tau]
        if trigger is not None and min(drift.values()) >= trigger:
            flagged = []  # trigger not met — no retrain this cycle

        # brute-force truth over the POST-APPEND corpus, for the
        # shifted query panel
        vn = np.sqrt((emb * emb).sum(axis=1))
        truth = {}
        for qi in qidx:
            with np.errstate(divide="ignore", invalid="ignore"):
                cos = np.where(
                    (vn[qi] > 0) & (vn > 0), emb @ emb[qi] / (vn * vn[qi]), 0.0
                )
            cos = np.round(cos, 6)
            cos[qi] = -np.inf
            order = np.lexsort((vec_id, -cos))[:TOP_K]
            truth[int(vec_id[qi])] = set(vec_id[order].tolist())

        rf, ff, pf = probe_stats(emb, vec_id, qidx, frozen, labels, filed, truth)

        # the CURE: ivf_codebook_retrain's exact semantics
        retrained = frozen.copy()
        filed_r = filed.copy()
        if flagged:
            for c in flagged:
                retrained[lbl_pos[c]] = emb[filed == c].mean(axis=0)
            fset = np.isin(filed, flagged)
            fc = np.array(sorted(flagged))
            sub = retrained[[lbl_pos[c] for c in fc]]
            filed_r[fset] = fc[np.argmax(cell_scores(emb[fset], sub), axis=1)]
        rr, fr, pr = probe_stats(
            emb, vec_id, qidx, retrained, labels, filed_r, truth
        )

        rows.append(
            {
                "axis": axis,
                "lam": lam,
                "drift_min": round(min(drift.values()), 3),
                "drift_mean": round(float(np.mean(list(drift.values()))), 3),
                "n_flagged": len(flagged),
                "recall_frozen": round(rf, 3),
                "recall_retrained": round(rr, 3),
                "scan_frozen": round(ff, 4),
                "scan_retrained": round(fr, 4),
                "probes_frozen": round(pf, 2),
                "probes_retrained": round(pr, 2),
            }
        )
        r = rows[-1]
        print(
            f"  {axis} lam={lam}: drift min/mean={r['drift_min']}/"
            f"{r['drift_mean']} flagged={r['n_flagged']} "
            f"recall {r['recall_frozen']}->{r['recall_retrained']} "
            f"scan {r['scan_frozen']}->{r['scan_retrained']} "
            f"probes {r['probes_frozen']}->{r['probes_retrained']}",
            flush=True,
        )
    return rows


def main() -> int:
    axes = []
    for axis in ("sf1", "sf1i"):
        sf_dir = os.path.join(REPO, ".scale", axis)
        if os.path.isdir(sf_dir):
            axes.append((axis, sf_dir))
    if not axes:
        print("no .scale corpora — run tools/scale_probe.py --build first")
        return 1
    rows = []
    for axis, sf_dir in axes:
        print(f"sweeping {axis} ({sf_dir}) ...", flush=True)
        rows += sweep_axis(sf_dir, axis)
    with open(os.path.join(REPO, ".scale", "drift_results.json"), "w") as fh:
        json.dump(rows, fh, indent=1)
    print("cached to .scale/drift_results.json — regenerate SCALE.md "
          "with tools/scale_probe.py to render")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
