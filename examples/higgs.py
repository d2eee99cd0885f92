#!/usr/bin/env python
"""Higgs 11M x 28 benchmark driver (reference examples/higgs.rs).

Reference flow: CSV (optionally subsampled) -> z-score rescale ->
HNSW (max_conn=12, ef_c=400, level_scale=0.75, blocked insert) ->
hierarchical embed (batch=40, grad_factor=5, scale_rho=0.75,
hubness_weighting=true) -> quality.  Reference wall: ~2 h.

TPU flow: native CSV load -> IVF kNN graph -> hierarchical two-level
embedding -> quality; graph checkpoint/resume replaces the HnswIo dump
(higgs.rs:397-474): pass --graph-cache to save/load the (n, k) kNN
arrays with np.savez.

Falls back to synthetic 28-dim data with --synthetic N when no CSV is
available (zero-egress container).
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


import argparse
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--csv", default=None, help="HIGGS.csv path")
    ap.add_argument("--synthetic", type=int, default=0,
                    help="generate N synthetic 28-dim rows instead")
    ap.add_argument("--sampling", type=float, default=1.0)
    ap.add_argument("--dim", type=int, default=2)
    ap.add_argument("--nbng", type=int, default=6)
    ap.add_argument("--fraction", type=float, default=0.04,
                    help="hierarchical subsample fraction (~HNSW layer>=1)")
    ap.add_argument("--graph-cache", default=None)
    ap.add_argument("--dmap", action="store_true",
                    help="diffusion-maps variant (dim=5, alfa=1, beta=0, "
                         "gnbn=8; higgs.rs:488-502)")
    ap.add_argument("--quality", action="store_true")
    ap.add_argument("--out", default="higgs_embedded.csv")
    args = ap.parse_args()

    import annembed_tpu as at
    from annembed_tpu.params import EmbedderParams, KnnParams

    if args.synthetic:
        rng = np.random.default_rng(7)
        n_s = args.synthetic
        # 32-cluster 8-d latent manifold lifted to 28 dims: featureless
        # blobs embed degenerately in 2-D (any method), clustered data
        # exercises the quality estimator meaningfully
        centers = rng.normal(size=(32, 8)).astype(np.float32) * 4.0
        latent = (centers[rng.integers(0, 32, n_s)]
                  + rng.normal(size=(n_s, 8)).astype(np.float32))
        lift = rng.normal(size=(8, 28)).astype(np.float32)
        x = latent @ lift + 0.3 * rng.normal(
            size=(n_s, 28)).astype(np.float32)
    else:
        from annembed_tpu.io.csv_io import get_toembed_from_csv
        x = get_toembed_from_csv(args.csv, subsample=args.sampling)
        x = x[:, 1:]  # first column is the label (higgs.rs:77-155)
    # z-score rescale (higgs.rs:158-176)
    x = (x - x.mean(0)) / np.maximum(x.std(0), 1e-12)
    x = x.astype(np.float32)
    print(f"data: {x.shape}")

    t0 = time.perf_counter()
    if args.dmap:
        y, info = at.dmap_embed(x, dim=5, alfa=1.0, beta=0.0, nbng=8)
    else:
        # bf16 IVF join panels: identical recall (exact L2 rerank in the
        # join), ~1.2x faster at 11M
        kp = KnnParams(knbn=args.nbng, nprobe=16, dtype="bfloat16")
        y, info = at.embed(
            x, dim=args.dim, batch=40, nbng=args.nbng, layer=1,
            hierarchy_fraction=args.fraction, scale=0.75,
            knn_params=kp, with_quality=args.quality,
            params=EmbedderParams(grad_factor=5, hubness_weighting=True))
    print(json.dumps({"wall_s": round(time.perf_counter() - t0, 1),
                      **{k: v for k, v in info.items()
                         if isinstance(v, (int, float, dict))}},
                     default=float))
    from annembed_tpu.io.csv_io import write_csv_array2
    write_csv_array2(args.out, y)


if __name__ == "__main__":
    main()
