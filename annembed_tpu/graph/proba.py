"""Distance -> probability edge calibration for the CE optimizer.

Vectorized rebuild of the reference's ``to_proba_edges`` /
``get_scale_from_proba_normalisation`` (src/tools/kdumap.rs:26-235):

For node x with sorted neighbour distances d_1 <= ... <= d_k:
  * rho_x   = d_1 (distance to first neighbour)
  * scale_x = scale_rho * mean(rho over {x} u neighbours(x))
  * p_i     = exp(-((d_i - d_1)_+ / scale_x)^beta), floored at PROBA_MIN,
              then row-normalized to 1.
  * all-equal fallback (kdumap.rs:224-230): if no neighbour is strictly
    further than the first (incl. all-zero distances, seen on Higgs),
    use the uniform distribution 1/k.

The rayon par-iter over nodes (kdumap.rs:57-60) becomes pure (n, k)
array ops; the CKMS quantile telemetry becomes exact jnp.quantile.
"""

from __future__ import annotations

import dataclasses
import functools
import logging
from typing import Dict

import jax
import jax.numpy as jnp

from ..params import PROBA_MIN
from .kgraph import KGraph

logger = logging.getLogger(__name__)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class NodeParams:
    """Per-node local scale + probability out-edges.

    Reference ``NodeParam(s)`` (src/tools/nodeparam.rs:72,111), in dense
    (n, k) layout; the neighbour identities live in the companion
    ``KGraph.indices``.
    """

    scale: jnp.ndarray   # (n,)  local scale used in calibration
    probas: jnp.ndarray  # (n, k) row-normalized edge probabilities

    @property
    def nb_nodes(self) -> int:
        return self.probas.shape[0]

    @property
    def max_nbng(self) -> int:
        return self.probas.shape[1]

    def perplexity(self) -> jnp.ndarray:
        """exp(Shannon entropy) per node — the Hill number of the edge
        distribution (reference nodeparam.rs:88-91)."""
        p = self.probas
        h = -jnp.sum(jnp.where(p > 0, p * jnp.log(jnp.maximum(p, 1e-30)), 0.0),
                     axis=-1)
        return jnp.exp(h)


@functools.partial(jax.jit, static_argnames=())
def _to_proba_edges_impl(indices, dists, scale_rho, beta):
    n, k = dists.shape
    rho = dists[:, 0]                           # (n,) dist to 1st neighbour
    rho_nbrs = rho[indices]                     # (n, k)
    mean_rho = (jnp.sum(rho_nbrs, axis=1) + rho) / (k + 1.0)
    # guard against the IVF no-candidate sentinel (knn/ivf.py::
    # _fixup_underfilled pins fully-broken rows at dist 1e30): one such
    # row must not blow up the mean-rho calibration of every node that
    # lists it — recompute the mean without sentinel contributions for
    # exactly the affected rows (a where keeps clean rows bit-identical
    # to the unguarded expression).  A node that is itself a sentinel
    # keeps rho (uniform probas for that one row only, harmless).
    ok = rho < 1e29                             # (n,) bool
    ok_nbrs = ok[indices]                       # (n, k) bool
    affected = ~(jnp.all(ok_nbrs, axis=1) & ok)
    okf = ok.astype(jnp.float32)
    oknf = ok_nbrs.astype(jnp.float32)
    num = jnp.sum(rho_nbrs * oknf, axis=1) + rho * okf
    den = jnp.sum(oknf, axis=1) + okf
    mean_guard = jnp.where(den > 0.0, num / jnp.maximum(den, 1.0), rho)
    mean_rho = jnp.where(affected, mean_guard, mean_rho)
    scale = scale_rho * mean_rho                # (n,)

    first = dists[:, :1]                        # (n, 1)
    shifted = jnp.maximum(dists - first, 0.0)
    safe_scale = jnp.maximum(scale, 1e-30)[:, None]
    w = jnp.exp(-jnp.power(shifted / safe_scale, beta))
    w = jnp.maximum(w, PROBA_MIN)

    # all-equal fallback: last positive distance <= first distance
    # (sorted rows => equivalent to max distance <= first distance)
    all_equal = dists[:, -1] <= dists[:, 0]
    w = jnp.where(all_equal[:, None], 1.0 / k, w)
    w = w / jnp.sum(w, axis=1, keepdims=True)
    return scale, w


def to_proba_edges(g: KGraph, scale_rho: float = 1.0,
                   beta: float = 1.0) -> NodeParams:
    """Build the perplexity-calibrated probability graph.

    Matches reference kdumap.rs:26 (caller embedder.rs:351).  The
    reference asserts proba_range >= PROBA_MIN (kdumap.rs:209-213); with
    the PROBA_MIN floor applied before normalization the invariant holds
    by construction here.
    """
    scale, w = _to_proba_edges_impl(g.indices, g.dists,
                                    jnp.float32(scale_rho),
                                    jnp.float32(beta))
    return NodeParams(scale=scale, probas=w)


def proba_telemetry(np_: NodeParams) -> Dict[str, float]:
    """Quantile telemetry the reference logs via CKMS sketches
    (kdumap.rs:88-113): scales, edge weights, perplexities."""
    qs = jnp.array([0.05, 0.5, 0.95, 0.99])
    out: Dict[str, float] = {}
    for name, v in (("scale", np_.scale),
                    ("weight", np_.probas.reshape(-1)),
                    ("perplexity", np_.perplexity())):
        for q, val in zip(qs.tolist(), jnp.quantile(v, qs).tolist()):
            out[f"{name}_q{q:g}"] = float(val)
    return out
