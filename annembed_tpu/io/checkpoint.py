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


def save_embedding(path: str | os.PathLike, y) -> None:
    np.savez_compressed(os.fspath(path), embedding=np.asarray(y))


def load_embedding(path: str | os.PathLike) -> np.ndarray:
    with np.load(os.fspath(path)) as z:
        return z["embedding"]
