"""Mini-batch-free Lloyd k-means on the MXU, used as the IVF coarse
quantizer (the TPU-native replacement for HNSW's layer hierarchy as a
search-pruning device; see SURVEY.md §7).

Assignment = one distance panel + argmin; update = segment mean.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .distances import l2_panel, corpus_sqnorm


@functools.partial(jax.jit, static_argnames=("block_rows",))
def assign_to_centroids(x, centroids, block_rows: int = 4096):
    """Nearest-centroid id for every row of x: (n,) int32."""
    n, d = x.shape
    c_sq = corpus_sqnorm(centroids)
    n_blocks = -(-n // block_rows)
    pad = n_blocks * block_rows - n
    xb = jnp.pad(x, ((0, pad), (0, 0))).reshape(n_blocks, block_rows, d)

    def one(q):
        dist = l2_panel(q, centroids, c_sq)
        return jnp.argmin(dist, axis=1).astype(jnp.int32)

    cells = jax.lax.map(one, xb).reshape(-1)[:n]
    return cells


@functools.partial(jax.jit, static_argnames=("n_clusters", "n_iter",
                                             "block_rows"))
def kmeans_fit(x, n_clusters: int, n_iter: int = 10, seed: int = 0,
               block_rows: int = 4096):
    """Lloyd iterations from a random-point init.  Empty clusters keep
    their previous centroid.  Returns (centroids, cells)."""
    n, d = x.shape
    key = jax.random.PRNGKey(seed)
    init_ids = jax.random.choice(key, n, (n_clusters,), replace=False)
    centroids = x[init_ids].astype(jnp.float32)

    def body(_, centroids):
        cells = assign_to_centroids(x, centroids, block_rows)
        sums = jnp.zeros((n_clusters, d), jnp.float32).at[cells].add(
            x.astype(jnp.float32))
        counts = jnp.zeros((n_clusters,), jnp.float32).at[cells].add(1.0)
        new = sums / jnp.maximum(counts, 1.0)[:, None]
        return jnp.where(counts[:, None] > 0, new, centroids)

    centroids = jax.lax.fori_loop(0, n_iter, body, centroids)
    cells = assign_to_centroids(x, centroids, block_rows)
    return centroids, cells
