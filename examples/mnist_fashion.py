#!/usr/bin/env python
"""MNIST-fashion benchmark driver (reference examples/mnist_fashion.rs):
knbn=12, nb_grad_batch=25, quality at nbng=50; the reference's recorded
quality numbers to compare against are in BASELINE.md (no-match 20260,
conserved 5.07/6, median ratio 0.746 at dim 2)."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


import argparse
import json
import time

from mnist_digits import load_data, check_expectations

#: the reference's recorded fashion quality rows (src/embedder.rs:588-615,
#: BASELINE.md): nbng=50, dim -> (no-match, conserved of 6, median ratio)
REFERENCE_QUALITY = {
    2: {"nb_without_match": 20260.0, "mean_nb_matched": 5.07,
        "median_ratio": 0.746},
    15: {"nb_without_match": 9124.0, "mean_nb_matched": 5.59,
         "median_ratio": 0.436},
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data-dir", default=None)
    ap.add_argument("--dim", type=int, default=2)
    ap.add_argument("--out", default="mnist_fashion_embedded.csv")
    ap.add_argument("--expect", action="store_true",
                    help="diff the produced quality quantiles against the "
                         "reference's recorded rows (real IDX data only)")
    args = ap.parse_args()

    import annembed_tpu as at

    (x, labels), is_real = load_data(args.data_dir)
    t0 = time.perf_counter()
    # reference params: knbn=12, batch=25 (examples/mnist_fashion.rs:92-124)
    y, info = at.embed(x, dim=args.dim, nbng=12, batch=25,
                       with_quality=True, return_graph=True)
    g = info.pop("kgraph", None)
    print(json.dumps({"wall_s": round(time.perf_counter() - t0, 2),
                      "quality": info["quality"]}, default=float))
    from annembed_tpu.io.csv_io import write_csv_labeled_array2
    write_csv_labeled_array2(args.out, labels, y)
    if args.expect:
        if not is_real:
            print("--expect needs the real fashion-MNIST IDX files "
                  "(synthetic fallback active)", file=sys.stderr)
            sys.exit(2)
        expected = REFERENCE_QUALITY.get(args.dim)
        if expected is None:
            print(f"no reference row recorded for dim={args.dim} "
                  f"(have {sorted(REFERENCE_QUALITY)})", file=sys.stderr)
            sys.exit(2)
        # the reference's radius is an HNSW-ADJACENCY max edge whose
        # neighbourhood "roughly corresponds to 2-3x max_nb_connection"
        # (embedder.rs:556-560) — NOT the exact nbng-NN radius this
        # pipeline reports in info["quality"] (BASELINE.md caveat).
        # Compare its rows against an explicitly-labeled emulation:
        # radius from the 2.5*nbng-th exact neighbour.
        from annembed_tpu.estimators.quality import quality_estimate
        q_adj = quality_estimate(g, y, nbng=50, radius_k=125)
        print("adjacency-equivalent radius (radius_k=2.5*nbng) "
              "emulation of the reference's HNSW-adjacency metric:",
              file=sys.stderr)
        failures = check_expectations(q_adj.as_dict(), expected)
        sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
