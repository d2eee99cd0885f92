"""Carre du Champ operator (local diffusion geometry).

Rebuilds reference src/cdcop.rs: the covariance of the diffusion
transition kernel at a point — the best local normal approximation of
the data (Bamberger & Jones 2025, Coifman-Lafon 2006).

Construction (cdcop.rs:149-185): a DiffusionMaps kernel with the
variable-bandwidth preset but alfa = 0, beta = 0; at a point i, the
random-walk transition row P_i. is recovered from the symmetric kernel
by P_ij = K_ij * sqrt(D_j) / sqrt(D_i) (graphlaplace.rs:204 — note the
reference's dense branch applies sqrt of that ratio and its CSR branch
indexes data()[j] instead of the nonzero position; we implement the
intended math, under which rows sum to 1, which the reference itself
asserts in get_kernel_row_csvec).

cdc matrix at i (cdcop.rs:189-237):
    mean = sum_j P_ij x_j
    C    = sum_j P_ij (x_j - mean)(x_j - mean)^T / (2 rho_i^2)
with rho_i the normalized local scale.
"""

from __future__ import annotations

import dataclasses
import logging
from typing import Callable, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ..graph.kgraph import KGraph
from ..graph.laplacian import GraphLaplacian
from ..params import DiffusionParams
from ..spectral.diffmaps import DiffusionMaps

logger = logging.getLogger(__name__)


@dataclasses.dataclass
class CdcMat:
    """Symmetric covariance matrix + spectrum (cdcop.rs:38-100)."""

    mat: jnp.ndarray  # (d, d)

    def get_trace(self) -> float:
        return float(jnp.trace(self.mat))

    def get_spectrum(self, epsil: float = 0.02) -> jnp.ndarray:
        """Eigenvalues, descending; values below epsil * lambda_0 are
        dropped (the EPSIL-mode SVD of cdcop.rs:70-100)."""
        s = jnp.linalg.eigvalsh(self.mat)[::-1]
        s = jnp.maximum(s, 0.0)
        keep = s > epsil * s[0]
        return s[np.asarray(keep)]


def psd_dist_upper_bound(a: CdcMat, b: CdcMat) -> float:
    """Upper bound of the Bures-Wasserstein distance
    d^2 <= tr A + tr B - 2 sqrt(tr(A B))  (cdcop.rs:377-399)."""
    tra = jnp.trace(a.mat)
    trb = jnp.trace(b.mat)
    trab = jnp.sum(a.mat * b.mat.T)
    d2 = tra + trb - 2.0 * jnp.sqrt(jnp.maximum(trab, 0.0))
    return float(jnp.sqrt(jnp.maximum(d2, 0.0)))


class CarreDuChamp:
    """CdC operator over a dataset (cdcop.rs:123-185)."""

    def __init__(self, data, kgraph: Optional[KGraph] = None,
                 knbn: int = 12):
        self.data = jnp.asarray(data, jnp.float32)
        dparams = DiffusionParams.with_variable_bandwidth()
        dparams.set_alfa(0.0)
        dparams.set_beta(0.0)
        self.params = dparams
        if kgraph is None:
            from ..knn.api import build_kgraph
            kgraph = build_kgraph(self.data, knbn)
        self.kgraph = kgraph
        dm = DiffusionMaps(params=dparams)
        self.glaplacian: GraphLaplacian = dm.laplacian_from_kgraph(kgraph)

    @property
    def dim(self) -> int:
        return self.data.shape[1]

    # -- kernel rows ---------------------------------------------------
    def kernel_rows(self, points: jnp.ndarray) -> jnp.ndarray:
        """Random-walk transition rows P_i. for a batch of point ranks;
        dense (Q, n), rows sum to ~1."""
        lap = self.glaplacian
        points = jnp.asarray(points, jnp.int32)
        mask = lap.rows[None, :] == points[:, None]        # (Q, nnz)
        # P_ij = K_ij * normalizer_j / normalizer_i
        p = lap.vals[None, :] * lap.normalizer[lap.cols][None, :] \
            / jnp.maximum(lap.normalizer[points][:, None], 1e-30)
        p = jnp.where(mask, p, 0.0)
        out = jnp.zeros((points.shape[0], lap.n), jnp.float32)
        q_idx = jnp.repeat(jnp.arange(points.shape[0]), lap.cols.shape[0]
                           ).reshape(points.shape[0], -1)
        out = out.at[q_idx, jnp.broadcast_to(lap.cols, mask.shape)].add(p)
        return out

    # -- cdc matrix ----------------------------------------------------
    def get_cdc_at_point(self, point_rank: int) -> Tuple[jnp.ndarray, CdcMat]:
        """(mean, CdcMat) at one point (cdcop.rs:189-237)."""
        means, covs = self.get_cdc_batch(jnp.array([point_rank]))
        return means[0], CdcMat(mat=covs[0])

    def get_cdc_batch(self, points) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Vectorized CdC for a batch of point ranks:
        returns (means (Q, d), covs (Q, d, d))."""
        points = jnp.asarray(points, jnp.int32)
        p = self.kernel_rows(points)                       # (Q, n)
        x = self.data                                      # (n, d)
        mean = p @ x                                       # (Q, d)
        centered = x[None, :, :] - mean[:, None, :]        # (Q, n, d)
        cov = jnp.einsum("qn,qni,qnj->qij", p, centered, centered)
        scales = self.glaplacian.normed_scales
        if scales is None:
            s = jnp.ones((points.shape[0],), jnp.float32)
        else:
            s = scales[points]
        cov = cov / (2.0 * jnp.square(s))[:, None, None]
        return mean, cov

    # -- CdC of function pairs ------------------------------------------
    def apply_fvec(self, point_rank: int, f: Callable, g: Callable):
        """Gamma(f, g) at a point for vector-valued f, g: the kernel-row
        weighted cross-covariance of f and g, normalized like
        get_cdc_at_point (cdcop.rs:243-301: CdC applied to function
        images instead of raw coordinates)."""
        p = self.kernel_rows(jnp.array([point_rank]))[0]    # (n,)
        fx = jnp.stack([jnp.asarray(f(np.asarray(row)), jnp.float32)
                        for row in np.asarray(self.data)])
        gx = jnp.stack([jnp.asarray(g(np.asarray(row)), jnp.float32)
                        for row in np.asarray(self.data)])
        f_mean = p @ fx
        g_mean = p @ gx
        cross = jnp.einsum("n,ni,nj->ij", p, fx - f_mean, gx - g_mean)
        scales = self.glaplacian.normed_scales
        s = 1.0 if scales is None else float(scales[point_rank])
        return cross / (2.0 * s * s)

    def apply_f1d(self, point_rank: int, f: Callable, g: Callable) -> float:
        """Scalar-function variant (cdcop.rs:303)."""
        out = self.apply_fvec(point_rank,
                              lambda v: np.atleast_1d(f(v)),
                              lambda v: np.atleast_1d(g(v)))
        return float(out[0, 0])
