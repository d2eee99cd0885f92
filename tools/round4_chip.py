#!/usr/bin/env python
"""Round-4 bench-point quality rows, one chip, ONE process.

Amortizes the ~3 min axon channel setup across three rows the VERDICT
asked for (items 9 and 10), all on the SAME 70k kNN graph so the
comparisons are controlled:

  1. dense optimizer, dim 2  — re-anchor of the bench row
     (BENCH_r04 honest/compat conservation), same c2f schedule.
  2. sampling optimizer (optim/ce.py, the reference-exact per-sample
     dynamics, embedder.rs:1167-1302), dim 2, reference defaults
     (30 batches, nbsample 10) — the on-chip reference-dynamics A/B.
  3. dense optimizer, dim 15 — the reference's dim-15 quality row
     shape (embedder.rs:606-615: fashion dim 15 -> no-match 9124,
     conserved 5.59, median ratio 0.436).

Each row prints one JSON line; any section failure still lets later
sections run, and a hard-deadline watchdog exits 0 with whatever is
printed (same protocol rationale as bench.py).
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HARD_DEADLINE_S = float(os.environ.get("ANNEMBED_R4_DEADLINE_S", "3000"))
T0 = time.monotonic()


def note(msg: str) -> None:
    print(f"[{time.monotonic() - T0:7.1f}s] {msg}", file=sys.stderr,
          flush=True)


def emit(row: dict) -> None:
    print(json.dumps(row), flush=True)


def watchdog() -> None:
    while True:
        left = HARD_DEADLINE_S - (time.monotonic() - T0)
        if left <= 0:
            note("WATCHDOG: hard deadline — exiting 0")
            os._exit(0)
        time.sleep(min(left, 5.0))


def quality_row(tag: str, g, y, t_opt: float, info: dict) -> None:
    from annembed_tpu.estimators.quality import quality_estimate
    if not np.isfinite(np.asarray(y)).all():
        emit({"row": tag, "error": "non-finite embedding"})
        return
    t0 = time.perf_counter()
    q = quality_estimate(g, y, nbng=50, radius_k_compat=125)
    row = {
        "row": tag,
        "optimize_s": round(t_opt, 3),
        "quality_s": round(time.perf_counter() - t0, 1),
        "no_match": int(q.nb_without_match),
        "mean_matched": round(q.mean_nb_matched, 3),
        "median_ratio": round(q.median_ratio, 3),
        "sweeps": info.get("sweeps"),
        "optimizer": info.get("optimizer", "dense"),
    }
    if q.compat is not None:
        row.update({
            "compat_no_match": int(q.compat["nb_without_match"]),
            "compat_mean_matched": round(q.compat["mean_nb_matched"], 3),
            "compat_median_ratio": round(q.compat["median_ratio"], 3),
        })
    emit(row)


def main() -> None:
    threading.Thread(target=watchdog, daemon=True).start()
    import jax
    import jax.numpy as jnp
    note(f"devices: {jax.devices()}")
    # channel first: every wall below is then honest sync-mode
    t0 = time.monotonic()
    _ = float(jnp.ones(()))
    note(f"channel ready after {time.monotonic() - t0:.1f}s")

    from bench import synthetic_mnist, KNBN, NB_GRAD_BATCH
    from annembed_tpu.knn.brute import knn_graph_brute
    from annembed_tpu.graph.kgraph import KGraph
    from annembed_tpu.graph.proba import to_proba_edges
    from annembed_tpu.optim.dense import run_dense_optimization
    from annembed_tpu.optim.embedder import set_data_box
    from annembed_tpu.spectral.diffmaps import DiffusionMaps
    from annembed_tpu.params import EmbedderParams, DiffusionParams

    x = jnp.asarray(synthetic_mnist()).astype(jnp.float32)
    t0 = time.perf_counter()
    idx, dist = knn_graph_brute(x, KNBN, block_rows=2048,
                                dtype="bfloat16", topk_recall=0.99)
    idx.block_until_ready()
    note(f"knn {time.perf_counter() - t0:.1f}s")
    g = KGraph(indices=idx, dists=dist)
    npar = to_proba_edges(g)
    npar.probas.block_until_ready()

    def dmap_init(dim: int):
        dm = DiffusionMaps(params=DiffusionParams(
            asked_dim=dim, alfa=0.5, beta=-0.1, t=5.0, gnbn=12))
        init = set_data_box(dm.embed_from_kgraph(g), 10.0)
        init.block_until_ready()
        return init

    init2 = dmap_init(2)

    # --- row 1: dense, dim 2 (bench anchor) -------------------------
    try:
        p = EmbedderParams(asked_dim=2, nb_grad_batch=NB_GRAD_BATCH,
                           n_sub_schedule=((15, 15), (10, 30), (5, 60)))
        t0 = time.perf_counter()
        y, info = run_dense_optimization(init2, g, npar, p, n_sub=15)
        y.block_until_ready()
        quality_row("dense_d2", g, y, time.perf_counter() - t0, info)
    except Exception as exc:  # noqa: BLE001 - keep later rows alive
        note(f"dense_d2 failed: {exc!r}")
        emit({"row": "dense_d2", "error": repr(exc)[:200]})

    # --- row 2: sampling optimizer (reference-exact dynamics), dim 2 -
    try:
        from annembed_tpu.optim.ce import (build_edge_set,
                                           run_entropy_optimization)
        p = EmbedderParams(asked_dim=2, nb_grad_batch=NB_GRAD_BATCH,
                           optimizer="sampling")
        es = build_edge_set(g, npar)
        t0 = time.perf_counter()
        ys, sinfo = run_entropy_optimization(init2, es, p)
        ys.block_until_ready()
        sinfo.setdefault("optimizer", "sampling")
        quality_row("sampling_d2", g, ys, time.perf_counter() - t0, sinfo)
    except Exception as exc:  # noqa: BLE001
        note(f"sampling_d2 failed: {exc!r}")
        emit({"row": "sampling_d2", "error": repr(exc)[:200]})

    # --- row 3: dense, dim 15 ----------------------------------------
    try:
        init15 = dmap_init(15)
        p = EmbedderParams(asked_dim=15, nb_grad_batch=NB_GRAD_BATCH,
                           n_sub_schedule=((15, 15), (10, 30), (5, 60)))
        t0 = time.perf_counter()
        y15, info15 = run_dense_optimization(init15, g, npar, p, n_sub=15)
        y15.block_until_ready()
        quality_row("dense_d15", g, y15, time.perf_counter() - t0, info15)
    except Exception as exc:  # noqa: BLE001
        note(f"dense_d15 failed: {exc!r}")
        emit({"row": "dense_d15", "error": repr(exc)[:200]})

    note("all rows done")
    sys.stdout.flush()
    sys.stderr.flush()
    os._exit(0)


if __name__ == "__main__":
    main()
