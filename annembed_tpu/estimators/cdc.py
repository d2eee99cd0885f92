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
        # Row-sorted COO copy + per-row offsets: a point's kernel row is
        # then a contiguous window of at most max_row entries — an O(Q *
        # max_degree) gather, replacing the O(Q * nnz) comparison mask
        # that made CdC unusable at large n (the reference walks CSR
        # rows the same way, graphlaplace.rs:204).
        lap = self.glaplacian
        rows_np = np.asarray(lap.rows)
        order = np.argsort(rows_np, kind="stable")
        self._cols_s = jnp.asarray(np.asarray(lap.cols)[order])
        self._vals_s = jnp.asarray(np.asarray(lap.vals)[order])
        counts = np.bincount(rows_np, minlength=lap.n)
        self._row_start = jnp.asarray(
            np.concatenate([[0], np.cumsum(counts)[:-1]]).astype(np.int32))
        self._row_count = jnp.asarray(counts.astype(np.int32))
        self._max_row = int(counts.max())

    @property
    def dim(self) -> int:
        return self.data.shape[1]

    # -- kernel rows ---------------------------------------------------
    def _kernel_entries(self, points: jnp.ndarray):
        """Sparse kernel rows: (probas (Q, L), cols (Q, L)) with
        L = max row length; padded entries have proba 0."""
        lap = self.glaplacian
        points = jnp.asarray(points, jnp.int32)
        total = self._cols_s.shape[0]
        offs = jnp.arange(self._max_row, dtype=jnp.int32)[None, :]
        pos = jnp.minimum(self._row_start[points][:, None] + offs,
                          total - 1)                       # (Q, L)
        valid = offs < self._row_count[points][:, None]
        cols = jnp.where(valid, self._cols_s[pos], 0)
        vals = jnp.where(valid, self._vals_s[pos], 0.0)
        # P_ij = K_ij * normalizer_j / normalizer_i
        p = vals * lap.normalizer[cols] \
            / jnp.maximum(lap.normalizer[points][:, None], 1e-30)
        return p, cols

    def kernel_rows(self, points: jnp.ndarray) -> jnp.ndarray:
        """Random-walk transition rows P_i. for a batch of point ranks;
        dense (Q, n), rows sum to ~1."""
        points = jnp.asarray(points, jnp.int32)
        p, cols = self._kernel_entries(points)
        q_idx = jnp.broadcast_to(
            jnp.arange(points.shape[0], dtype=jnp.int32)[:, None],
            cols.shape)
        out = jnp.zeros((points.shape[0], self.glaplacian.n), jnp.float32)
        return out.at[q_idx, cols].add(p)

    # -- cdc matrix ----------------------------------------------------
    def get_cdc_at_point(self, point_rank: int) -> Tuple[jnp.ndarray, CdcMat]:
        """(mean, CdcMat) at one point (cdcop.rs:189-237)."""
        means, covs = self.get_cdc_batch(jnp.array([point_rank]))
        return means[0], CdcMat(mat=covs[0])

    def get_cdc_batch(self, points) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Vectorized CdC for a batch of point ranks:
        returns (means (Q, d), covs (Q, d, d)).

        Works from the sparse kernel entries — only each point's own
        neighbourhood coordinates are gathered (Q, L, d), never a dense
        (Q, n) row, so the batch is usable at multi-million n."""
        points = jnp.asarray(points, jnp.int32)
        p, cols = self._kernel_entries(points)             # (Q, L)
        xg = self.data[cols]                               # (Q, L, d)
        mean = jnp.einsum("ql,qld->qd", p, xg)             # (Q, d)
        centered = xg - mean[:, None, :]                   # (Q, L, d)
        cov = jnp.einsum("ql,qli,qlj->qij", p, centered, centered)
        scales = self.glaplacian.normed_scales
        if scales is None:
            s = jnp.ones((points.shape[0],), jnp.float32)
        else:
            s = scales[points]
        cov = cov / (2.0 * jnp.square(s))[:, None, None]
        return mean, cov

    def psd_dist_pairs(self, points_a, points_b) -> jnp.ndarray:
        """Batched Bures-Wasserstein upper bound between the CdC
        operators at points_a[i] and points_b[i] (cdcop.rs:377-399),
        computed directly from the sparse kernel entries — the (d, d)
        covariances are never materialized, so this works at d = 784
        and thousands of pairs:
            tr A    = sum_l p_l ||c_l||^2 / (2 s_a^2)
            tr(AB)  = p^T (G o G) q / (4 s_a^2 s_b^2),  G = C_a C_b^T
        """
        pa = jnp.asarray(points_a, jnp.int32)
        pb = jnp.asarray(points_b, jnp.int32)
        w_a, cols_a = self._kernel_entries(pa)             # (m, L)
        w_b, cols_b = self._kernel_entries(pb)
        xa = self.data[cols_a]                             # (m, L, d)
        xb = self.data[cols_b]
        mean_a = jnp.einsum("ml,mld->md", w_a, xa)
        mean_b = jnp.einsum("ml,mld->md", w_b, xb)
        ca = xa - mean_a[:, None, :]
        cb = xb - mean_b[:, None, :]
        scales = self.glaplacian.normed_scales
        if scales is None:
            sa = sb = jnp.ones((pa.shape[0],), jnp.float32)
        else:
            sa, sb = scales[pa], scales[pb]
        tra = jnp.einsum("ml,ml->m", w_a, jnp.sum(ca * ca, -1)) \
            / (2.0 * jnp.square(sa))
        trb = jnp.einsum("ml,ml->m", w_b, jnp.sum(cb * cb, -1)) \
            / (2.0 * jnp.square(sb))
        g = jnp.einsum("mld,med->mle", ca, cb)             # (m, L, L)
        trab = jnp.einsum("ml,mle,me->m", w_a, g * g, w_b) \
            / (4.0 * jnp.square(sa) * jnp.square(sb))
        d2 = tra + trb - 2.0 * jnp.sqrt(jnp.maximum(trab, 0.0))
        return jnp.sqrt(jnp.maximum(d2, 0.0))

    # -- CdC of function pairs ------------------------------------------
    def apply_fvec(self, point_rank: int, f: Callable, g: Callable):
        """Gamma(f, g) at a point for vector-valued f, g: the kernel-row
        weighted cross-covariance of f and g, normalized like
        get_cdc_at_point (cdcop.rs:243-301: CdC applied to function
        images instead of raw coordinates)."""
        # evaluate f/g ONLY on the point's kernel-row neighbourhood
        # (<= _max_row members; padded entries carry weight 0, so their
        # images cancel) — a dense n-point sweep made this minutes per
        # query at large n for a row with a few dozen nonzeros
        p, cols = self._kernel_entries(jnp.array([point_rank]))
        p = p[0]                                            # (L,)
        nbrs = np.asarray(self.data[cols[0]])               # (L, d)
        fx = jnp.stack([jnp.asarray(f(row), jnp.float32) for row in nbrs])
        gx = jnp.stack([jnp.asarray(g(row), jnp.float32) for row in nbrs])
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
