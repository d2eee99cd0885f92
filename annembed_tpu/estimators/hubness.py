"""Hubness (k-occurrence) statistics.

Rebuilds reference src/fromhnsw/hubness.rs: the AtomicU32 in-degree
counters (:46-62) become one scatter-add; the hdrhistogram quantiles
(:111-156) become exact device-side quantiles; the standardized third
moment (:86) is a direct reduction.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Tuple

import jax.numpy as jnp
import numpy as np

from ..graph.kgraph import KGraph, in_degree_counts


@dataclasses.dataclass
class Hubness:
    counts: jnp.ndarray  # (n,) in-degree of each node

    @staticmethod
    def new(g: KGraph) -> "Hubness":
        return Hubness(counts=in_degree_counts(g))

    def get_counts(self) -> jnp.ndarray:
        return self.counts

    def get_standard3m(self) -> float:
        """Standardized third moment (skewness) of the k-occurrence
        distribution — Radovanovic's hubness score (hubness.rs:86)."""
        c = self.counts.astype(jnp.float32)
        mu = c.mean()
        sigma = jnp.maximum(c.std(), 1e-30)
        return float(jnp.mean(((c - mu) / sigma) ** 3))

    def get_hubness_histogram(self, nb_bins: int = 50) -> Dict[str, float]:
        """Quantiles of the in-degree distribution (hubness.rs:111-156).
        All scalars ride ONE device->host transfer (the repo-wide
        single-readback pattern, cf. estimators/quality.py)."""
        c = self.counts.astype(jnp.float32)
        q_list = (0.1, 0.25, 0.5, 0.75, 0.9, 0.99, 0.999)
        qs = jnp.array(q_list)
        packed = jnp.concatenate([jnp.quantile(c, qs),
                                  c.mean()[None], c.max()[None]]).tolist()
        out = {f"q{q:g}": v for q, v in zip(q_list, packed[:-2])}
        out["mean"] = packed[-2]
        out["max"] = packed[-1]
        del nb_bins
        return out

    def get_largest_hubs(self, nb_hubs: int = 10) -> Tuple[np.ndarray,
                                                           np.ndarray]:
        """ids and counts of the nb_hubs most-pointed-to nodes
        (hubness.rs:160)."""
        c = np.asarray(self.counts)
        ids = np.argsort(-c)[:nb_hubs]
        return ids, c[ids]
