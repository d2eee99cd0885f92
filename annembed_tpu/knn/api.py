"""kNN graph construction front-end: brute force vs IVF dispatch.

Top-level replacement for reference ``get_kgraph`` (bin/embed.rs:450):
data -> HNSW -> KGraph becomes data -> (brute | IVF) -> KGraph.
"""

from __future__ import annotations

import logging

import jax.numpy as jnp

from ..graph.kgraph import KGraph
from ..params import KnnParams
from .brute import knn_graph_brute

logger = logging.getLogger(__name__)


def build_kgraph(x, knbn: int, distance: str = "DistL2",
                 params: KnnParams | None = None) -> KGraph:
    """Build the k-NN graph of ``x`` with the strategy fitting its size."""
    if params is None:
        params = KnnParams(knbn=knbn, distance=distance)
    n = x.shape[0]
    if n <= params.brute_force_limit:
        idx, dist = knn_graph_brute(x, knbn, distance=distance,
                                    block_rows=params.block_rows,
                                    dtype=params.dtype)
    else:
        from .ivf import knn_graph_ivf
        idx, dist = knn_graph_ivf(x, knbn, distance=distance,
                                  nlist=params.nlist, nprobe=params.nprobe,
                                  dtype=params.dtype)
        if params.refine_rounds > 0:
            from .nndescent import nndescent_refine
            idx, dist = nndescent_refine(x, idx, dist,
                                         n_rounds=params.refine_rounds,
                                         distance=distance)
    return KGraph(indices=idx, dists=dist)


def recall_at_k(approx_idx, exact_idx) -> float:
    """Mean fraction of true k-NN recovered (the north-star metric
    'kNN-graph recall@10 vs HNSW', BASELINE.json)."""
    approx = jnp.asarray(approx_idx)
    exact = jnp.asarray(exact_idx)
    match = (approx[:, :, None] == exact[:, None, :]).any(-1)
    return float(match.mean())
