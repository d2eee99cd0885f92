"""Round-4 on-chip measurement session (one process, channel
amortized).  Three VERDICT-r3 items at the bench operating point:

  A. dim-15 row (item 10): the full pipeline at asked_dim=15 with the
     honest + compat quality rows (reference embedder.rs:606-615 runs
     fashion at dim 15: no-match drops ~2.2x vs dim 2, median ratio
     0.436).
  B. sampling-optimizer A/B (item 9): optim/ce.py (the
     reference-exact per-sample dynamics) vs optim/dense.py on the
     SAME graph + init, honest estimator both — pins the README claim
     with a chip-recorded number.
  C. dense_neighbor_exclusion off (round-4 sweep lever): wall +
     quality, to accept/kill skipping the (n_neg, k, n) membership
     compare.

Each section emits one JSON line.  Usage: python tools/round4_onchip.py
"""
import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_bench_cache")

import numpy as np

T0 = time.monotonic()
HARD_DEADLINE_S = float(os.environ.get("ANNEMBED_R4_DEADLINE_S", "3000"))


def _watchdog():
    while True:
        left = HARD_DEADLINE_S - (time.monotonic() - T0)
        if left <= 0:
            print("WATCHDOG: hard deadline — exiting 0", file=sys.stderr,
                  flush=True)
            os._exit(0)
        time.sleep(min(left, 5.0))


threading.Thread(target=_watchdog, daemon=True).start()


def note(m):
    print(f"[{time.monotonic()-T0:7.1f}s] {m}", flush=True)


def emit(row):
    print("JSON " + json.dumps(row), flush=True)


import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

note(f"devices {jax.devices()}")

from bench import synthetic_mnist, KNBN, NB_GRAD_BATCH  # noqa: E402
from annembed_tpu.knn.brute import knn_graph_brute  # noqa: E402
from annembed_tpu.graph.kgraph import KGraph  # noqa: E402
from annembed_tpu.graph.proba import to_proba_edges  # noqa: E402
from annembed_tpu.optim.dense import run_dense_optimization  # noqa: E402
from annembed_tpu.optim.embedder import set_data_box  # noqa: E402
from annembed_tpu.spectral.diffmaps import DiffusionMaps  # noqa: E402
from annembed_tpu.params import EmbedderParams, DiffusionParams  # noqa: E402
from annembed_tpu.estimators.quality import quality_estimate  # noqa: E402

x = jnp.asarray(synthetic_mnist()).astype(jnp.float32)
# sync mode first: all timings below must be honest
t0 = time.monotonic()
_ = float(jnp.ones(()))
note(f"channel ready in {time.monotonic()-t0:.1f}s")

idx, dist = knn_graph_brute(x, KNBN, block_rows=2048, dtype="bfloat16",
                            topk_recall=0.99)
idx.block_until_ready()
g = KGraph(indices=idx, dists=dist)
npar = to_proba_edges(g)
note("bench graph + proba ready")


def q_fields(q, prefix=""):
    out = {prefix + "no_match": int(q.nb_without_match),
           prefix + "mean_matched": round(q.mean_nb_matched, 3),
           prefix + "median_ratio": round(q.median_ratio, 3)}
    if q.compat is not None:
        out.update({
            prefix + "compat_no_match": int(q.compat["nb_without_match"]),
            prefix + "compat_mean_matched":
                round(q.compat["mean_nb_matched"], 3),
            prefix + "compat_median_ratio":
                round(q.compat["median_ratio"], 3)})
    return out


# ---- A. dim-15 row ------------------------------------------------------
DIM15 = 15
dm15 = DiffusionMaps(params=DiffusionParams(asked_dim=DIM15, alfa=0.5,
                                            beta=-0.1, t=5.0, gnbn=12))
t0 = time.perf_counter()
init15 = set_data_box(dm15.embed_from_kgraph(g), 10.0)
init15.block_until_ready()
t_init15 = time.perf_counter() - t0
p15 = EmbedderParams(asked_dim=DIM15, nb_grad_batch=NB_GRAD_BATCH,
                     n_sub_schedule=((15, 15), (10, 30), (5, 60)))
t0 = time.perf_counter()
y15, info15 = run_dense_optimization(init15, g, npar, p15, n_sub=15)
y15.block_until_ready()
t_opt15 = time.perf_counter() - t0
note(f"dim-15 pipeline: init {t_init15:.2f}s optimize {t_opt15:.2f}s")
q15 = quality_estimate(g, y15, nbng=50, radius_k_compat=125)
emit({"bench": "dim15_row", "n": 70000, "dim": DIM15,
      "init_s": round(t_init15, 2), "optimize_s": round(t_opt15, 2),
      **q_fields(q15)})

# ---- shared d=2 init for B and C ---------------------------------------
dm2 = DiffusionMaps(params=DiffusionParams(asked_dim=2, alfa=0.5,
                                           beta=-0.1, t=5.0, gnbn=12))
init2 = set_data_box(dm2.embed_from_kgraph(g), 10.0)
init2.block_until_ready()
note("d=2 init ready")

# ---- B. sampling (reference-dynamics) vs dense optimizer ---------------
from annembed_tpu.optim.ce import (build_edge_set,  # noqa: E402
                                   run_entropy_optimization)

p2 = EmbedderParams(asked_dim=2, nb_grad_batch=NB_GRAD_BATCH,
                    n_sub_schedule=((15, 15), (10, 30), (5, 60)))
t0 = time.perf_counter()
y_dense, _ = run_dense_optimization(init2, g, npar, p2, n_sub=15)
y_dense.block_until_ready()
t_dense = time.perf_counter() - t0
q_dense = quality_estimate(g, y_dense, nbng=50, radius_k_compat=125)
emit({"bench": "optimizer_ab", "variant": "dense",
      "optimize_s": round(t_dense, 2), **q_fields(q_dense)})

es = build_edge_set(g, npar)
p_samp = EmbedderParams(asked_dim=2, nb_grad_batch=NB_GRAD_BATCH)
t0 = time.perf_counter()
y_samp, info_s = run_entropy_optimization(init2, es, p_samp)
y_samp.block_until_ready()
t_samp = time.perf_counter() - t0
note(f"sampling optimizer: {t_samp:.1f}s")
q_samp = quality_estimate(g, y_samp, nbng=50, radius_k_compat=125)
emit({"bench": "optimizer_ab", "variant": "sampling_reference_dynamics",
      "optimize_s": round(t_samp, 2), **q_fields(q_samp)})

# ---- C. neighbour-exclusion lever --------------------------------------
p_nx = EmbedderParams(asked_dim=2, nb_grad_batch=NB_GRAD_BATCH,
                      n_sub_schedule=((15, 15), (10, 30), (5, 60)),
                      dense_neighbor_exclusion=False)
# compile pass then timed pass (distinct program from B's)
y_nx, _ = run_dense_optimization(init2, g, npar, p_nx, n_sub=15)
y_nx.block_until_ready()
t0 = time.perf_counter()
y_nx, _ = run_dense_optimization(init2, g, npar, p_nx, n_sub=15)
y_nx.block_until_ready()
t_nx = time.perf_counter() - t0
# steady-state control for the default path (B's dense run above paid
# its compiles in the d=2 program cache already? dense d=2 was compiled
# in B; time it again for a steady-state comparison)
t0 = time.perf_counter()
y_ctrl, _ = run_dense_optimization(init2, g, npar, p2, n_sub=15)
y_ctrl.block_until_ready()
t_ctrl = time.perf_counter() - t0
q_nx = quality_estimate(g, y_nx, nbng=50, radius_k_compat=125)
emit({"bench": "neighbor_exclusion_ab", "off_steady_s": round(t_nx, 2),
      "on_steady_s": round(t_ctrl, 2),
      "speedup": round(t_ctrl / max(t_nx, 1e-9), 3), **q_fields(q_nx)})
note("done")
