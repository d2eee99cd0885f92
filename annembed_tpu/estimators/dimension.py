"""Intrinsic dimension estimators.

  * Levina-Bickel MLE (reference src/tools/dimension.rs:13-69,
    kgraph.rs:224 ``estimate_intrinsic_dim``): per-node estimate
    averaged over k in [k_first, k_last], then sampled over nodes.
  * Facco 2NN (kgraph.rs:267 ``estimate_intrinsic_dim_2nn``): fit of
    -ln(1 - F(mu)) = d ln(mu) on the ratio mu = r2/r1.

Both become whole-array reductions (no reservoir sampling needed — the
data fits on device; a subsample option is kept for API parity).
"""

from __future__ import annotations

import functools
import logging
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..graph.kgraph import KGraph

logger = logging.getLogger(__name__)


@functools.partial(jax.jit, static_argnames=("k_first", "k_last"))
def _levina_bickel_per_node(dists: jnp.ndarray, k_first: int, k_last: int):
    """Per-node averaged Levina-Bickel density estimate.

    d_hat(k) = (k - 1) / sum_{j=1..k-1} ln(d_k / d_j); invalid
    (non-positive) aux sums are skipped exactly like the reference
    (dimension.rs:44-61).  dists rows are ascending; indices here are
    0-based so the reference's edges[j], j in 1..k maps to dists[:, j-1].
    """
    n, kmax = dists.shape
    logd = jnp.log(jnp.maximum(dists, 1e-30))

    ests = []
    valids = []
    for k in range(k_first, k_last + 1):
        # reference k is 1-based over edges: aux = sum_{j=1..k-1}
        # ln(d_k/d_j) with d_* = edges[*].weight = dists[:, *-1]
        aux = (k - 1) * logd[:, k - 1] - jnp.sum(logd[:, :k - 1], axis=1)
        valid = aux > 0.0
        est = jnp.where(valid, (k - 1.0) / jnp.maximum(aux, 1e-30), 0.0)
        ests.append(est)
        valids.append(valid)
    est_sum = jnp.stack(ests).sum(0)
    nb_pos = jnp.stack(valids).sum(0).astype(jnp.float32)
    node_ok = nb_pos > 0
    node_dim = jnp.where(node_ok, est_sum / jnp.maximum(nb_pos, 1.0),
                         jnp.nan)
    return node_dim, node_ok


def intrinsic_dim_levina_bickel(g: KGraph,
                                sampling_size: Optional[int] = None,
                                seed: int = 0) -> Tuple[float, float]:
    """Mean and std of the per-node MLE dimension.

    k range mirrors dimension.rs:17-29: [8, 19] when >= 20 neighbours,
    else [2, k-1].
    """
    n, k = g.dists.shape
    if k >= 20:
        k_first, k_last = 8, 19
    elif k >= 3:
        # k == 3 gives the single-k range [2, 2], still computable
        k_first, k_last = 2, k - 1
    else:
        raise ValueError("not enough neighbours for dimension estimation")
    node_dim, node_ok = _levina_bickel_per_node(g.dists, k_first, k_last)
    if sampling_size is not None and sampling_size < n:
        key = jax.random.PRNGKey(seed)
        sel = jax.random.choice(key, n, (sampling_size,), replace=False)
        node_dim, node_ok = node_dim[sel], node_ok[sel]
    w = node_ok.astype(jnp.float32)
    cnt = jnp.maximum(w.sum(), 1.0)
    vals = jnp.where(node_ok, node_dim, 0.0)
    mean = vals.sum() / cnt
    var = jnp.where(node_ok, jnp.square(node_dim - mean), 0.0).sum() / cnt
    return float(mean), float(jnp.sqrt(var))


def intrinsic_dim_2nn(g: KGraph, sampling_size: Optional[int] = None,
                      seed: int = 4664397) -> float:
    """Facco two-NN estimator (kgraph.rs:267-326).

    mu = r2/r1 for nodes with r1 > 0; with the empirical CDF F over the
    sorted mu, fit d = sum(-ln mu * ln(1 - F)) / sum((ln mu)^2).
    """
    r1 = g.dists[:, 0]
    r2 = g.dists[:, 1]
    valid = r1 > 0.0
    mu = jnp.where(valid, r2 / jnp.maximum(r1, 1e-30), jnp.nan)
    mu = mu[jnp.isfinite(mu)]
    if sampling_size is not None and sampling_size < mu.shape[0]:
        key = jax.random.PRNGKey(seed)
        mu = jax.random.choice(key, mu, (sampling_size,), replace=False)
    m = mu.shape[0]
    order = jnp.argsort(mu)
    ranks = jnp.zeros((m,), jnp.float32).at[order].set(
        jnp.arange(m, dtype=jnp.float32))
    cumul = ranks / m                      # F(mu_i), in [0, 1)
    ln_mu = jnp.log(jnp.maximum(mu, 1e-30))
    num = jnp.sum(-ln_mu * jnp.log(jnp.maximum(1.0 - cumul, 1e-12)))
    den = jnp.sum(jnp.square(ln_mu))
    return float(num / jnp.maximum(den, 1e-30))
