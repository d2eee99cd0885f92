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

Output protocol (driver-budget hardened after round 2's rc=124):
  * line 1 (ASAP): headline JSON
      {"metric": "mnist70k_e2e_wall_s", "value": <s>, "unit": "s",
       "vs_baseline": <11.0 / s>}
  * line 2 (only if budget remains): the same fields PLUS the
    recall / neighborhood-conservation regression fields.
  * a watchdog thread prints the best measurement available and exits
    cleanly if the deadline (ANNEMBED_BENCH_DEADLINE_S, default 540 s)
    is reached first — the round-2 driver run died with NO parseable
    output because the first device->host readback on the axon tunnel
    hung for minutes before any measurement existed.
"""

from __future__ import annotations

import json
import os
import sys
import threading
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
DEADLINE_S = float(os.environ.get("ANNEMBED_BENCH_DEADLINE_S", "540"))

T_START = time.monotonic()
_STATE: dict = {"headline_printed": False, "wall": None, "cold_wall": None,
                "done": False}
_LOCK = threading.Lock()


def _note(msg: str) -> None:
    print(f"[{time.monotonic() - T_START:7.1f}s] {msg}", file=sys.stderr,
          flush=True)


def _headline(wall: float, extra: dict | None = None) -> str:
    rec = {
        "metric": "mnist70k_e2e_wall_s",
        "value": round(wall, 3),
        "unit": "s",
        "vs_baseline": round(BASELINE_WALL_S / wall, 2) if wall > 0 else 0.0,
    }
    if extra:
        rec.update(extra)
    return json.dumps(rec)


def _print_headline_once(wall: float, extra: dict | None = None) -> None:
    with _LOCK:
        if _STATE["headline_printed"]:
            return
        _STATE["headline_printed"] = True
    print(_headline(wall, extra), flush=True)


def _watchdog() -> None:
    while True:
        left = DEADLINE_S - (time.monotonic() - T_START)
        if _STATE["done"]:
            return
        if left <= 0:
            break
        time.sleep(min(left, 2.0))
    if _STATE["done"]:
        return
    _note("WATCHDOG: deadline reached, emitting best available result")
    wall = _STATE["wall"] or _STATE["cold_wall"]
    if wall is not None:
        # honest but possibly cold (compile-inclusive) measurement
        _print_headline_once(wall, {"cold_only": _STATE["wall"] is None})
    else:
        # nothing measured at all (e.g. the channel-setup readback hung):
        # emit a sentinel so the driver at least parses a record
        _print_headline_once(-1.0, {"error": "deadline before first "
                                             "measurement"})
    os._exit(0)


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


def run_once(x, sync_element=False):
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
    if sync_element:
        # materialize one element INSIDE the timed window: on the axon
        # tunnel block_until_ready alone does not guarantee execution
        # has happened for repeat dispatches — a tiny host readback does
        _ = np.asarray(y.reshape(-1)[:1])
    t["optimize"] = time.perf_counter() - t0
    t["total"] = sum(t.values())
    _note(f"phases: {t} opt_info: {info}")
    return y, g, t


def main():
    threading.Thread(target=_watchdog, daemon=True).start()
    _note(f"deadline {DEADLINE_S:.0f}s; generating data")
    x_np = synthetic_mnist()
    import jax
    import jax.numpy as jnp
    x = jnp.asarray(x_np)
    _note(f"devices: {jax.devices()}")

    # HONEST-TIMING PROTOCOL for the axon tunnel: until a process has
    # performed one device->host readback, block_until_ready does not
    # actually wait for repeat executions (measured round 2: a "0.03 s"
    # run whose results then took minutes to materialize).  The first
    # readback itself can take MINUTES of channel setup (it is what the
    # round-2 driver bench died inside, before any measurement), so it
    # is folded into the untimed cold pass below: the cold pass's final
    # element readback both forces its execution and enters sync mode,
    # and the steady-state pass after it is honestly timed.
    _, _, t1 = run_once(x, sync_element=True)
    _STATE["cold_wall"] = t1["total"]
    _note(f"cold pass done ({t1['total']:.1f}s incl. compile + channel "
          "setup); steady-state pass")

    # steady state: everything compiled, process in sync mode
    y, g, t2 = run_once(x, sync_element=True)
    wall = t2["total"]
    _STATE["wall"] = wall

    # sanity before printing: embedding finite
    assert np.isfinite(np.asarray(y)).all()
    _print_headline_once(wall)

    # quality/recall regression fields (not timed), budget permitting:
    #  * recall@KNBN of the (bf16-panel) graph build vs exact on a
    #    subsample
    #  * neighborhood conservation at nbng=50 (the reference's own
    #    metric, embedder.rs:620; round-2 operating point was
    #    no_match 14071 / matched 2.68 / ratio 1.40)
    left = DEADLINE_S - (time.monotonic() - T_START)
    if left < 60:
        _note(f"skipping quality section ({left:.0f}s left)")
        _STATE["done"] = True
        return
    _note("quality section")
    from annembed_tpu.knn.brute import knn_search_brute
    from annembed_tpu.knn.api import recall_at_k
    from annembed_tpu.estimators.quality import quality_estimate
    sub = np.linspace(0, N - 1, 2000).astype(np.int32)
    ei, _ = knn_search_brute(x[sub], x, k=KNBN + 1)
    # drop the self column of the search result
    not_self = np.asarray(ei) != sub[:, None]
    exact = np.stack([row[m][:KNBN] for row, m in
                      zip(np.asarray(ei), not_self)])
    recall = recall_at_k(np.asarray(g.indices)[sub], exact)
    q = quality_estimate(g, y, nbng=50)
    print(_headline(wall, {
        "recall": round(recall, 4),
        "no_match": int(q.nb_without_match),
        "mean_matched": round(q.mean_nb_matched, 3),
        "median_ratio": round(q.median_ratio, 3),
    }), flush=True)
    _STATE["done"] = True


if __name__ == "__main__":
    main()
