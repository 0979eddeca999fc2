#!/usr/bin/env python
"""Recall/cost frontier for the margin-adaptive IVF probe.

Sweeps the probe rule's two knobs — margin delta and probe cap — on
the DECORRELATED sf1i axis (the honest recall axis; see
memory: ann-recall-engineering) and on sf1, recording recall@5 vs
mean corpus scan fraction for each (delta, cap).  The engine's
operating point (_IVF_DELTA, _IVF_CAP in operators/similarity.py) is
then pinned TWO-SIDED: a recall floor (so quantizer decay can't hide
behind wall-clock — the r7 failure mode) AND a scan-fraction ceiling
(so a future "fix" can't buy recall by silently probing everything —
the opposite failure mode).  Results cache to
.scale/frontier_results.json and render into SCALE.md via
tools/scale_probe.py's cached-section mechanism.

This is a NUMPY replica of the engine arithmetic, not a Spark run:
the sweep is 18 (axis, delta, cap) evaluations and each Spark
iteration costs minutes while numpy costs milliseconds — but it must
replicate the engine's exact rounding and tie-breaks (6dp cosines,
label-asc argmax, cand-id-asc rank ties) or the frontier describes a
different index.  tools/scale_probe.py --recall measures the REAL
engine at the chosen point; test_similarity_paths.py pins the numpy
replica against the engine at fixture scale.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

N_QUERIES = 10
TOP_K = 5
DELTAS = (0.1, 0.2, 0.3)
CAPS = (3, 5, 8)


def load_table(sf_dir: str):
    import glob

    import pyarrow.parquet as pq

    path = os.path.join(sf_dir, "embeddings.parquet")
    files = (
        [path]
        if os.path.isfile(path)
        else sorted(glob.glob(os.path.join(path, "*.parquet")))
    )
    import pyarrow as pa

    tbl = pa.concat_tables([pq.read_table(f) for f in files])
    vec_id = tbl.column("vec_id").to_numpy()
    label = tbl.column("label").to_numpy()
    emb = np.array(tbl.column("embedding").to_pylist(), dtype=np.float64)
    order = np.argsort(vec_id)
    return vec_id[order], label[order], emb[order]


def cell_scores(emb: np.ndarray, cents: np.ndarray) -> np.ndarray:
    """6dp-rounded cosine of every vector against every centroid —
    the quantizer arithmetic both filing and probing share."""
    vn = np.sqrt((emb * emb).sum(axis=1))
    cn = np.sqrt((cents * cents).sum(axis=1))
    dots = emb @ cents.T
    with np.errstate(divide="ignore", invalid="ignore"):
        cos = np.where(
            (vn[:, None] > 0) & (cn[None, :] > 0),
            dots / (vn[:, None] * cn[None, :]),
            0.0,
        )
    return np.round(cos, 6)


def sweep_axis(sf_dir: str, axis: str) -> list[dict]:
    vec_id, label, emb = load_table(sf_dir)
    n = len(vec_id)
    labels = np.unique(label)
    cents = np.stack([emb[label == c].mean(axis=0) for c in labels])

    scores = cell_scores(emb, cents)  # (n, ncells)
    # filing: argmax cosine, label-asc tie-break (np.argmax takes the
    # first max — labels are sorted ascending, so ties break correctly)
    filed = labels[np.argmax(scores, axis=1)]
    cell_sizes = {c: int((filed == c).sum()) for c in labels}
    members = {c: np.where(filed == c)[0] for c in labels}

    # brute-force truth for the fixed query panel: 6dp cosine desc,
    # cand-id asc (lexsort mirrors the engine's row_number ordering)
    qidx = np.where(vec_id < N_QUERIES)[0]
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

    rows = []
    for delta in DELTAS:
        for cap in CAPS:
            recalls, fracs, probes = [], [], []
            for qi in qidx:
                s = scores[qi]
                rank = np.lexsort((labels, -s))  # cosine desc, label asc
                best = s.max()
                probe = [
                    labels[j]
                    for pos, j in enumerate(rank)
                    if pos < 1 or (pos < cap and s[j] >= best - delta)
                ]
                cand = np.concatenate([members[c] for c in probe])
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
                fracs.append(sum(cell_sizes[c] for c in probe) / n)
                probes.append(len(probe))
            rows.append(
                {
                    "axis": axis,
                    "delta": delta,
                    "cap": cap,
                    "recall_at_5": round(float(np.mean(recalls)), 3),
                    "worst_query": round(float(np.min(recalls)), 3),
                    "scan_fraction": round(float(np.mean(fracs)), 4),
                    "avg_probes": round(float(np.mean(probes)), 2),
                }
            )
            print(
                f"  {axis} delta={delta} cap={cap}: recall@5="
                f"{rows[-1]['recall_at_5']} scan={rows[-1]['scan_fraction']}"
                f" probes={rows[-1]['avg_probes']}",
                flush=True,
            )
    return rows


def main() -> int:
    axes = []
    for axis, sf_dir in (
        ("sf1", os.path.join(REPO, ".scale", "sf1")),
        ("sf1i", os.path.join(REPO, ".scale", "sf1i")),
    ):
        if os.path.isdir(sf_dir) or os.path.isfile(
            os.path.join(sf_dir, "embeddings.parquet")
        ):
            axes.append((axis, sf_dir))
    if not axes:
        print("no .scale corpora — run tools/scale_probe.py --build first")
        return 1
    rows = []
    for axis, sf_dir in axes:
        print(f"sweeping {axis} ({sf_dir}) ...", flush=True)
        rows += sweep_axis(sf_dir, axis)
    os.makedirs(os.path.join(REPO, ".scale"), exist_ok=True)
    with open(os.path.join(REPO, ".scale", "frontier_results.json"), "w") as fh:
        json.dump(rows, fh, indent=1)
    print("cached to .scale/frontier_results.json — regenerate SCALE.md "
          "with tools/scale_probe.py to render")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
