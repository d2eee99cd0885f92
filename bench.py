#!/usr/bin/env python
"""End-to-end benchmark: MNIST-shaped embedding pipeline on one TPU chip.

Reproduces the reference's headline workload shape
(examples/mnist_digits.rs: 70k x 784 -> 2D, knbn=6, nb_grad_batch=30;
reference wall time 11 s on a 24-core i9, BASELINE.md) on deterministic
synthetic data with the same compute shape (no dataset download is
possible in this environment; the arithmetic is identical).

Pipeline timed: exact kNN graph (70k x 70k MXU panels + top-k) ->
diffusion-maps initialization (randomized SVD) -> probability-edge
calibration -> 30 batches of CE negative-sampling SGD.

Prints ONE JSON line:
  {"metric": "mnist70k_e2e_wall_s", "value": <s>, "unit": "s",
   "vs_baseline": <11.0 / s>}
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

# persistent compilation cache: steady-state timing should not pay the
# (remote) compile cost again across driver rounds
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_bench_cache")

N = 70_000
D = 784
KNBN = 6
DIM = 2
NB_GRAD_BATCH = 30
BASELINE_WALL_S = 11.0  # reference README.md:92 (i9 24c/32t)


def synthetic_mnist(n=N, d=D, seed=42) -> np.ndarray:
    """Deterministic 10-cluster manifold lifted to 784 dims, scaled like
    MNIST pixel data (so kernel scales are in a realistic regime)."""
    rng = np.random.default_rng(seed)
    latent_dim = 20
    centers = rng.normal(size=(10, latent_dim)) * 6.0
    labels = rng.integers(0, 10, n)
    z = centers[labels] + rng.normal(size=(n, latent_dim))
    lift = rng.normal(size=(latent_dim, d)) / np.sqrt(latent_dim)
    x = z @ lift + 0.05 * rng.normal(size=(n, d))
    x = (x - x.min()) / (x.max() - x.min()) * 255.0
    return x.astype(np.float32)


def run_once(x, verbose=True):
    import jax.numpy as jnp
    from annembed_tpu.knn.brute import knn_graph_brute
    from annembed_tpu.graph.kgraph import KGraph
    from annembed_tpu.graph.proba import to_proba_edges
    from annembed_tpu.optim.dense import run_dense_optimization
    from annembed_tpu.optim.embedder import set_data_box
    from annembed_tpu.spectral.diffmaps import DiffusionMaps
    from annembed_tpu.params import EmbedderParams, DiffusionParams

    t = {}
    t0 = time.perf_counter()
    # bf16 panels + exact f32 rerank: indices identical to the f32
    # panel (verified 70k), ~1.4x faster on the MXU
    idx, dist = knn_graph_brute(x, KNBN, block_rows=2048,
                                dtype="bfloat16")
    idx.block_until_ready()
    t["knn"] = time.perf_counter() - t0
    g = KGraph(indices=idx, dists=dist)

    t0 = time.perf_counter()
    dm = DiffusionMaps(params=DiffusionParams(
        asked_dim=DIM, alfa=0.5, beta=-0.1, t=5.0, gnbn=12))
    init = dm.embed_from_kgraph(g)
    init = set_data_box(init, 10.0)
    init.block_until_ready()
    t["dmap_init"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    npar = to_proba_edges(g)
    npar.probas.block_until_ready()
    t["proba"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    params = EmbedderParams(asked_dim=DIM, nb_grad_batch=NB_GRAD_BATCH)
    y, info = run_dense_optimization(init, g, npar, params,
                                     n_sub=params.n_sub)
    y.block_until_ready()
    # materialize one element INSIDE the timed window: on the axon
    # tunnel block_until_ready alone does not guarantee execution has
    # happened for repeat dispatches — a tiny host readback does
    _ = np.asarray(y.reshape(-1)[:1])
    t["optimize"] = time.perf_counter() - t0
    t["total"] = sum(t.values())
    if verbose:
        print(f"phases: {t} opt_info: {info}", file=sys.stderr)
    return y, t


def main():
    x_np = synthetic_mnist()
    import jax
    import jax.numpy as jnp
    x = jnp.asarray(x_np)
    print(f"devices: {jax.devices()}", file=sys.stderr)

    # HONEST-TIMING PROTOCOL for the axon tunnel: until a process has
    # performed one device->host readback, block_until_ready does not
    # actually wait for repeat executions (measured: a "0.03 s" run
    # whose results then took minutes to materialize).  Pay the one-time
    # channel setup up front so the timed run below measures real
    # execution.
    t0 = time.perf_counter()
    _ = float(jnp.ones(()))
    print(f"sync-mode entry: {time.perf_counter() - t0:.1f}s",
          file=sys.stderr)

    # run 1: compile + execute; run 2: steady-state timing
    _, t1 = run_once(x)
    y, t2 = run_once(x)
    wall = t2["total"]

    # sanity: embedding finite and clusters separated
    assert np.isfinite(np.asarray(y)).all()

    # quality/recall regression fields (not timed):
    #  * recall@KNBN of the graph build vs exact on a subsample
    #  * neighborhood conservation at nbng=50 (the reference's own
    #    metric, embedder.rs:620; round-1 operating point was
    #    no_match 18178 / matched 2.61 / ratio 1.52 — regressions
    #    in BENCH_r*.json are now visible to the driver)
    from annembed_tpu.graph.kgraph import KGraph
    from annembed_tpu.knn.brute import knn_graph_brute, knn_search_brute
    from annembed_tpu.knn.api import recall_at_k
    from annembed_tpu.estimators.quality import quality_estimate
    idx, dist = knn_graph_brute(x, KNBN, block_rows=2048)
    sub = np.linspace(0, N - 1, 2000).astype(np.int32)
    ei, _ = knn_search_brute(x[sub], x, k=KNBN + 1)
    # drop the self column of the search result
    not_self = np.asarray(ei) != sub[:, None]
    exact = np.stack([row[m][:KNBN] for row, m in
                      zip(np.asarray(ei), not_self)])
    recall = recall_at_k(np.asarray(idx)[sub], exact)
    q = quality_estimate(KGraph(indices=idx, dists=dist), y, nbng=50)

    print(json.dumps({
        "metric": "mnist70k_e2e_wall_s",
        "value": round(wall, 3),
        "unit": "s",
        "vs_baseline": round(BASELINE_WALL_S / wall, 2),
        "recall": round(recall, 4),
        "no_match": int(q.nb_without_match),
        "mean_matched": round(q.mean_nb_matched, 3),
        "median_ratio": round(q.median_ratio, 3),
    }))


if __name__ == "__main__":
    main()
