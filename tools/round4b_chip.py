"""Round-4b bench-point levers, one chip, ONE process (channel
amortized).  Sections (one JSON line each):

  1. steady-state phase split of the exact bench pipeline with the
     current code (post shift-membership rejection) — re-anchors the
     1.219 s round-4 record.
  2. knn block_rows A/B (2048 vs 4096 vs 8192): the 0.155 s knn phase
     is ~25% MFU; larger query blocks mean fewer top-k invocations and
     better MXU occupancy.
  3. dmap-init svd_n_iter A/B (5 vs 3 vs 2): wall only — the QUALITY
     neutrality is established by the CPU A/B (tools/ab_dmap_iters.py,
     PERF.md); this measures what the cheaper init buys.

Usage: python tools/round4b_chip.py
"""
from __future__ import annotations

import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_bench_cache")

HARD_DEADLINE_S = float(os.environ.get("ANNEMBED_R4B_DEADLINE_S", "2400"))
T0 = time.monotonic()


def note(msg):
    print(f"[{time.monotonic() - T0:7.1f}s] {msg}", file=sys.stderr,
          flush=True)


def emit(row):
    print(json.dumps(row), flush=True)


def watchdog():
    while True:
        left = HARD_DEADLINE_S - (time.monotonic() - T0)
        if left <= 0:
            note("WATCHDOG: hard deadline — exiting 0")
            os._exit(0)
        time.sleep(min(left, 5.0))


threading.Thread(target=watchdog, daemon=True).start()

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

note(f"devices {jax.devices()}")

from bench import synthetic_mnist, KNBN, DIM, NB_GRAD_BATCH  # noqa: E402
from annembed_tpu.knn.brute import knn_graph_brute  # noqa: E402
from annembed_tpu.graph.kgraph import KGraph  # noqa: E402
from annembed_tpu.graph.proba import to_proba_edges  # noqa: E402
from annembed_tpu.optim.dense import run_dense_optimization  # noqa: E402
from annembed_tpu.optim.embedder import set_data_box  # noqa: E402
from annembed_tpu.spectral.diffmaps import DiffusionMaps  # noqa: E402
from annembed_tpu.params import EmbedderParams, DiffusionParams  # noqa: E402

x = jnp.asarray(synthetic_mnist()).astype(jnp.float32)
t0 = time.monotonic()
_ = float(jnp.ones(()))
note(f"channel ready in {time.monotonic() - t0:.1f}s")


def run_pipeline(block_rows=2048, svd_n_iter=5):
    t = {}
    t0 = time.perf_counter()
    idx, dist = knn_graph_brute(x, KNBN, block_rows=block_rows,
                                dtype="bfloat16", topk_recall=0.99)
    idx.block_until_ready()
    t["knn"] = time.perf_counter() - t0
    g = KGraph(indices=idx, dists=dist)
    t0 = time.perf_counter()
    dm = DiffusionMaps(params=DiffusionParams(
        asked_dim=DIM, alfa=0.5, beta=-0.1, t=5.0, gnbn=12,
        svd_n_iter=svd_n_iter))
    init = set_data_box(dm.embed_from_kgraph(g), 10.0)
    init.block_until_ready()
    t["dmap_init"] = time.perf_counter() - t0
    t0 = time.perf_counter()
    npar = to_proba_edges(g)
    npar.probas.block_until_ready()
    t["proba"] = time.perf_counter() - t0
    t0 = time.perf_counter()
    params = EmbedderParams(asked_dim=DIM, nb_grad_batch=NB_GRAD_BATCH,
                            n_sub_schedule=((15, 15), (10, 30), (5, 60)))
    y, _ = run_dense_optimization(init, g, npar, params, n_sub=15)
    y.block_until_ready()
    _ = np.asarray(y.reshape(-1)[:1])
    t["optimize"] = time.perf_counter() - t0
    t["total"] = sum(t.values())
    return {k: round(v, 3) for k, v in t.items()}


# warm pass absorbs compiles + the once-per-process first-exec penalty
note("warm pass (compiles)")
_ = run_pipeline()
note("warm pass 2 (penalty absorb)")
_ = run_pipeline()

# 1. steady state, 2 reps
for rep in range(2):
    t = run_pipeline()
    emit({"bench": "bench_point_steady", "rep": rep, **t})

# 2. knn block_rows A/B (steady: the program for each size compiles on
#    its first rep, so time the second)
for br in (4096, 8192):
    for rep in range(2):
        t0 = time.perf_counter()
        idx, dist = knn_graph_brute(x, KNBN, block_rows=br,
                                    dtype="bfloat16", topk_recall=0.99)
        idx.block_until_ready()
        w = time.perf_counter() - t0
    emit({"bench": "knn_block_rows", "block_rows": br,
          "wall_s": round(w, 3)})

# 3. dmap svd_n_iter wall A/B (first rep compiles, second is steady)
idx, dist = knn_graph_brute(x, KNBN, block_rows=2048, dtype="bfloat16",
                            topk_recall=0.99)
g = KGraph(indices=idx, dists=dist)
for it in (5, 3, 2):
    for rep in range(2):
        t0 = time.perf_counter()
        dm = DiffusionMaps(params=DiffusionParams(
            asked_dim=DIM, alfa=0.5, beta=-0.1, t=5.0, gnbn=12,
            svd_n_iter=it))
        init = set_data_box(dm.embed_from_kgraph(g), 10.0)
        init.block_until_ready()
        _ = np.asarray(init.reshape(-1)[:1])
        w = time.perf_counter() - t0
    emit({"bench": "dmap_svd_n_iter", "n_iter": it, "wall_s": round(w, 3)})

# 4. parallel-kicks optimize wall A/B (same graph + init; quality
#    neutrality is the CPU A/B's job — tools/ab_parallel_kicks.py)
npar = to_proba_edges(g)
dm = DiffusionMaps(params=DiffusionParams(
    asked_dim=DIM, alfa=0.5, beta=-0.1, t=5.0, gnbn=12))
init = set_data_box(dm.embed_from_kgraph(g), 10.0)
init.block_until_ready()
for par in (False, True):
    params = EmbedderParams(asked_dim=DIM, nb_grad_batch=NB_GRAD_BATCH,
                            n_sub_schedule=((15, 15), (10, 30), (5, 60)),
                            dense_parallel_kicks=par)
    for rep in range(2):
        t0 = time.perf_counter()
        y, _ = run_dense_optimization(init, g, npar, params, n_sub=15)
        y.block_until_ready()
        _ = np.asarray(y.reshape(-1)[:1])
        w = time.perf_counter() - t0
    emit({"bench": "optimize_parallel_kicks", "parallel": bool(par),
          "wall_s": round(w, 3)})

note("done")
os._exit(0)
