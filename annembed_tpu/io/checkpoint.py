"""Checkpoint / resume of the expensive pipeline phase.

The reference only checkpoints its HNSW index (HnswIo dump/reload,
examples/higgs.rs:397-474) to skip the 45-minute ANN build.  The
TPU-native equivalent persists the (n, k) kNN graph arrays (and
optionally the embedding) with np.savez — the graph is the only
expensive artifact.
"""

from __future__ import annotations

import logging
import os
from typing import Optional

import numpy as np
import jax.numpy as jnp

from ..graph.kgraph import KGraph

logger = logging.getLogger(__name__)


def save_kgraph(path: str | os.PathLike, g: KGraph,
                extra: Optional[dict] = None) -> None:
    data = {"indices": np.asarray(g.indices), "dists": np.asarray(g.dists)}
    if extra:
        data.update({k: np.asarray(v) for k, v in extra.items()})
    np.savez_compressed(os.fspath(path), **data)
    logger.info("kgraph checkpoint written to %s", path)


def load_kgraph(path: str | os.PathLike) -> KGraph:
    with np.load(os.fspath(path)) as z:
        return KGraph(indices=jnp.asarray(z["indices"]),
                      dists=jnp.asarray(z["dists"]))


def save_projection(path: str | os.PathLike, proj) -> None:
    """Persist a KGraphProjection (small graph + large graph + top-1
    projection) — the hierarchical analogue of the HnswIo dump: at 11M
    the graph build + projection is the dominant phase."""
    np.savez_compressed(
        os.fspath(path),
        small_indices=np.asarray(proj.small_graph.indices),
        small_dists=np.asarray(proj.small_graph.dists),
        large_indices=np.asarray(proj.large_graph.indices),
        large_dists=np.asarray(proj.large_graph.dists),
        sample_ids=np.asarray(proj.sample_ids),
        proj_small_idx=np.asarray(proj.proj_small_idx),
        proj_dist=np.asarray(proj.proj_dist))
    logger.info("projection checkpoint written to %s", path)


def load_projection(path: str | os.PathLike):
    from ..knn.hierarchy import KGraphProjection
    with np.load(os.fspath(path)) as z:
        return KGraphProjection(
            small_graph=KGraph(indices=jnp.asarray(z["small_indices"]),
                               dists=jnp.asarray(z["small_dists"])),
            large_graph=KGraph(indices=jnp.asarray(z["large_indices"]),
                               dists=jnp.asarray(z["large_dists"])),
            sample_ids=jnp.asarray(z["sample_ids"]),
            proj_small_idx=jnp.asarray(z["proj_small_idx"]),
            proj_dist=jnp.asarray(z["proj_dist"]))


def save_embedding(path: str | os.PathLike, y) -> None:
    np.savez_compressed(os.fspath(path), embedding=np.asarray(y))


def load_embedding(path: str | os.PathLike) -> np.ndarray:
    with np.load(os.fspath(path)) as z:
        return z["embedding"]
