"""Neighborhood-stability quality estimator.

Rebuilds ``get_quality_estimate_from_edge_length``
(reference src/embedder.rs:620-753):

  1. For every original edge (i, j), compute ||y_i - y_j|| in the
     embedded space (``get_transformed_kgraph``, embedder.rs:478).
  2. Build the kNN graph of the embedded points (second ANN build,
     embedder.rs:527-554 — here another MXU brute/IVF pass) and take
     each node's nbng-th neighbour distance as its embedded radius.
  3. Count, per node, how many original neighbours fall inside that
     radius (match counts), and the ratio distribution
     edge_length / radius (CKMS quantiles -> exact jnp.quantile).
"""

from __future__ import annotations

import dataclasses
import logging
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..graph.kgraph import KGraph
from ..knn.api import build_kgraph
from ..params import KnnParams

logger = logging.getLogger(__name__)

_QS = (0.05, 0.25, 0.5, 0.75, 0.85, 0.95)


@dataclasses.dataclass
class QualityEstimate:
    nb_nodes: int
    nbng_used: int          # neighbourhood size of the original graph
    nbng_target: int        # neighbourhood size in embedded space
    nb_without_match: int
    mean_nb_matched: float  # mean conserved neighbours when >=1 match
    median_ratio: float
    mean_ratio: float
    radii_quantiles: Dict[str, float]
    ratio_quantiles: Dict[str, float]
    #: per-node mean ratio (dumped to continuity_ratio.csv by the CLI)
    ratio_by_node: jnp.ndarray
    #: per-node min embedded edge length (first_dist.csv)
    first_dist: jnp.ndarray

    def summary(self) -> Dict[str, float]:
        out = {
            "nb_without_match": float(self.nb_without_match),
            "mean_nb_matched": self.mean_nb_matched,
            "median_ratio": self.median_ratio,
            "mean_ratio": self.mean_ratio,
        }
        out.update({f"radius_{k}": v for k, v in self.radii_quantiles.items()})
        out.update({f"ratio_{k}": v for k, v in self.ratio_quantiles.items()})
        return out


@jax.jit
def _edge_lengths_embedded(y, indices):
    """(n, k) embedded L2 lengths of the original graph edges."""
    yi = y[:, None, :]          # (n, 1, d)
    yj = y[indices]             # (n, k, d)
    return jnp.sqrt(jnp.maximum(
        jnp.sum(jnp.square(yi - yj), axis=-1), 0.0))


def quality_estimate(g: KGraph, y, nbng: int = 50,
                     knn_params: KnnParams | None = None) -> QualityEstimate:
    """Compute the neighborhood-conservation summary.

    Note the reference's transformed edge lengths take a running
    minimum over the (unsorted-by-embedded-distance) neighbour list
    (embedder.rs:504-509) — an idiosyncrasy that only affects its
    per-edge list, not the match counts (which we reproduce from the
    raw lengths).
    """
    y = jnp.asarray(y, jnp.float32)
    n, k = g.indices.shape

    lengths = _edge_lengths_embedded(y, g.indices)          # (n, k)

    # embedded-space kNN graph: radius = nbng-th neighbour distance.
    # NN-descent refinement is skipped here: at nbng ~ 50 its candidate
    # set is (2*nbng)^2 per node (prohibitive at millions of points),
    # and the radius estimate only shifts marginally with IVF-level
    # recall.
    if knn_params is None:
        knn_params = KnnParams(knbn=nbng, refine_rounds=0)
    emb_graph = build_kgraph(y, nbng, distance="DistL2", params=knn_params)
    radius = emb_graph.dists[:, -1]                         # (n,)

    safe_r = jnp.maximum(radius, 1e-30)[:, None]
    matched = lengths <= radius[:, None]                    # (n, k)
    nodes_matched = matched.sum(axis=1)                     # (n,)

    ratios = lengths / safe_r                               # (n, k)
    ratio_flat = ratios.reshape(-1)
    qs = jnp.array(_QS)

    # ONE batched device->host readback of every scalar at the end
    # (each individual readback costs a round trip on remote-dispatch
    # runtimes, and the FIRST one in a process is extremely expensive —
    # so never interleave conversions with device work)
    scalars = jnp.concatenate([
        jnp.stack([(nodes_matched == 0).sum().astype(jnp.float32),
                   nodes_matched.sum().astype(jnp.float32),
                   ratio_flat.mean()]),
        jnp.quantile(ratio_flat, qs),
        jnp.quantile(radius, qs),
    ])
    ratio_by_node = ratios.mean(axis=1)
    first_dist = lengths.min(axis=1)
    vals = np.asarray(scalars)

    nb_without = int(vals[0])
    nb_with = max(n - nb_without, 1)
    mean_matched = float(vals[1] / nb_with)
    nq = len(_QS)
    ratio_q = {f"q{q:g}": float(v) for q, v in zip(_QS, vals[3:3 + nq])}
    radii_q = {f"q{q:g}": float(v) for q, v in
               zip(_QS, vals[3 + nq:3 + 2 * nq])}

    est = QualityEstimate(
        nb_nodes=n, nbng_used=k, nbng_target=nbng,
        nb_without_match=nb_without, mean_nb_matched=mean_matched,
        median_ratio=ratio_q["q0.5"],
        mean_ratio=float(vals[2]),
        radii_quantiles=radii_q, ratio_quantiles=ratio_q,
        ratio_by_node=ratio_by_node,
        first_dist=first_dist)
    logger.info(
        "quality: nb_without_match=%d mean_matched=%.3f median_ratio=%.3e "
        "mean_ratio=%.3e", nb_without, mean_matched, est.median_ratio,
        est.mean_ratio)
    return est
