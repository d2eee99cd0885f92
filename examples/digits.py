#!/usr/bin/env python
"""REAL-data pipeline run: scikit-learn's bundled handwritten digits.

The container has no network egress, so the reference's MNIST/Higgs
files cannot be fetched — but sklearn ships the classic UCI
handwritten-digits set (1797 x 64, 10 classes, REAL pen strokes) in
its wheel.  This driver runs the full pipeline (kNN graph -> dmap init
-> CE optimize) on it and reports:

  * neighborhood conservation, honest + compat radii
    (the reference's own metric, embedder.rs:620);
  * embedded-space kNN label accuracy (leave-one-out, k=10) vs the
    same classifier in the RAW space — an external, label-based check
    that neighborhood structure survived the embedding;
  * Levina-Bickel intrinsic dimension (reference records 18.5 +- 7.2
    on full MNIST, README.md:102; the 8x8 digits are coarser).

No reference row exists for this dataset (annembed never ran it), so
the numbers are recorded as the repo's own real-data regression row
(PERF.md round 4) rather than a cross-tool comparison.

Runs in seconds on CPU: python examples/digits.py --json
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def knn_label_accuracy(coords: np.ndarray, labels: np.ndarray,
                       k: int = 10) -> float:
    """Leave-one-out k-NN majority-vote accuracy in ``coords`` space."""
    from annembed_tpu.knn.brute import knn_graph_brute
    idx, _ = knn_graph_brute(coords.astype(np.float32), k)
    idx = np.asarray(idx)
    votes = labels[idx]                      # (n, k) neighbour labels
    n_classes = int(labels.max()) + 1
    counts = np.zeros((len(labels), n_classes), np.int32)
    for j in range(votes.shape[1]):
        np.add.at(counts, (np.arange(len(labels)), votes[:, j]), 1)
    return float((counts.argmax(axis=1) == labels).mean())


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dim", type=int, default=2)
    ap.add_argument("--nbng", type=int, default=10)
    ap.add_argument("--batch", type=int, default=30)
    ap.add_argument("--json", action="store_true")
    ap.add_argument("--out", default=None, help="CSV output path")
    args = ap.parse_args()

    from sklearn.datasets import load_digits
    ds = load_digits()
    x = ds.data.astype(np.float32)          # (1797, 64), real data
    labels = ds.target.astype(np.int64)

    import annembed_tpu as at
    from annembed_tpu.graph.kgraph import KGraph
    from annembed_tpu.estimators.dimension import intrinsic_dim_levina_bickel

    t0 = time.perf_counter()
    y, info = at.embed(x, outfile=args.out, dim=args.dim,
                       batch=args.batch, nbng=args.nbng,
                       with_quality=True, quality_nbng=10,
                       quality_radius_compat=25, return_graph=True)
    wall = time.perf_counter() - t0
    g: KGraph = info["kgraph"]
    q = info["quality"]

    dim_mean, dim_std = intrinsic_dim_levina_bickel(g)
    acc_embedded = knn_label_accuracy(y, labels)
    acc_raw = knn_label_accuracy(x, labels)

    row = {
        "dataset": "sklearn_digits_real", "n": int(x.shape[0]),
        "d": int(x.shape[1]), "dim": args.dim,
        "wall_s": round(wall, 2),
        "no_match": int(q["nb_without_match"]),
        "mean_matched": round(q["mean_nb_matched"], 3),
        "median_ratio": round(q["median_ratio"], 3),
        "intrinsic_dim": round(float(dim_mean), 2),
        "intrinsic_dim_std": round(float(dim_std), 2),
        "knn10_acc_embedded": round(acc_embedded, 4),
        "knn10_acc_raw": round(acc_raw, 4),
    }
    if "compat_nb_without_match" in q:
        row.update({
            "compat_no_match": int(q["compat_nb_without_match"]),
            "compat_mean_matched": round(q["compat_mean_nb_matched"], 3),
            "compat_median_ratio": round(q["compat_median_ratio"], 3),
        })
    if args.json:
        print(json.dumps(row))
    else:
        for k, v in row.items():
            print(f"{k:24s} {v}")


if __name__ == "__main__":
    main()
