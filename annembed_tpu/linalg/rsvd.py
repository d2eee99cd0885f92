"""Randomized truncated SVD (Halko-Tropp) for dense and k-sparse operators.

Rebuilds reference src/tools/svdapprox.rs (1669 LoC of LAPACK-backed
range finding) as compiled JAX:

  * fixed-rank subspace (QR) iteration  (svdapprox.rs:285 algo 4.4)
  * epsilon-adaptive rank selection      (svdapprox.rs:444 algo 4.2) —
    implemented as an over-sampled fixed-rank pass followed by a
    residual-based truncation (the per-vector Gram-Schmidt loop of the
    reference is inherently sequential and hostile to XLA).
  * ``direct_svd``: B = Q^T A, small dense SVD of B, U = Q Ub
    (svdapprox.rs:721-782; the LAPACK ``svddc`` boundary becomes
    ``jnp.linalg.svd`` on the (l, n) projection).

Operators are abstracted as a matmul closure ``matmat(X: (n, r)) -> (m, r)``
so the same code serves dense matrices and the COO graph Laplacians
(SpMM = scatter-add, replacing the reference's sprs CSR products,
svdapprox.rs:366,390).
"""

from __future__ import annotations

import functools
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp


class SvdResult(NamedTuple):
    """Mirrors the reference ``SvdResult`` (svdapprox.rs): left singular
    vectors U (m, r), singular values s (r,), right vectors Vt (r, n)."""
    u: jnp.ndarray
    s: jnp.ndarray
    vt: jnp.ndarray


def _qr_q(y: jnp.ndarray) -> jnp.ndarray:
    # Double QR ("twice is enough"): the TPU backend's float32 QR can
    # lose ~1e-3 orthogonality on near-rank-deficient panels, which
    # pollutes the projected spectrum; a second pass restores it.  The
    # panels are (n, ~rank) so the extra QR is negligible next to the
    # SpMM.
    q, _ = jnp.linalg.qr(y)
    q, _ = jnp.linalg.qr(q)
    return q


def subspace_range(matmat: Callable, rmatmat: Callable, n_cols: int,
                   rank: int, n_iter: int, key: jax.Array,
                   dtype=jnp.float32) -> jnp.ndarray:
    """Randomized range finder with QR-stabilized power iteration.

    Reference subspace_iteration_full/csr (svdapprox.rs:285,343):
    Y = A Omega; repeat (Q <- qr(Y); Y <- A (A^T Q)).  Returns Q (m, rank).
    """
    omega = jax.random.normal(key, (n_cols, rank), dtype)
    y = matmat(omega)
    q = _qr_q(y)

    def body(_, q):
        z = rmatmat(q)
        qz = _qr_q(z)
        y = matmat(qz)
        return _qr_q(y)

    return jax.lax.fori_loop(0, n_iter, body, q)


def randomized_svd_op(matmat: Callable, rmatmat: Callable,
                      shape: tuple[int, int], rank: int,
                      n_iter: int = 5, n_oversample: int = 10,
                      key: Optional[jax.Array] = None,
                      epsil: Optional[float] = None) -> SvdResult:
    """Truncated SVD of a linear operator given by matmat closures.

    ``rank`` singular triplets are returned (after an oversampled range
    pass).  If ``epsil`` is given, triplets with s_i <= epsil * s_0 are
    additionally zeroed/truncated — the compiled stand-in for the
    reference's adaptive RangePrecision mode (svdapprox.rs:155,444).
    """
    m, n = shape
    if key is None:
        key = jax.random.PRNGKey(4664397)  # reference seed svdapprox.rs:70
    l = min(rank + n_oversample, min(m, n))
    q = subspace_range(matmat, rmatmat, n, l, n_iter, key)  # (m, l)
    b = rmatmat(q).T  # (l, n)  == Q^T A
    ub, s, vt = jnp.linalg.svd(b, full_matrices=False)
    u = q @ ub
    r = min(rank, l)
    u, s, vt = u[:, :r], s[:r], vt[:r]
    if epsil is not None:
        keep = s > epsil * s[0]
        s = jnp.where(keep, s, 0.0)
    return SvdResult(u=u, s=s, vt=vt)


def randomized_svd_dense(a: jnp.ndarray, rank: int, n_iter: int = 5,
                         n_oversample: int = 10,
                         key: Optional[jax.Array] = None,
                         epsil: Optional[float] = None) -> SvdResult:
    """Randomized SVD of a dense matrix (MatMode::FULL path)."""
    a = jnp.asarray(a, jnp.float32)
    matmat = lambda x: a @ x
    rmatmat = lambda x: a.T @ x
    return randomized_svd_op(matmat, rmatmat, a.shape, rank, n_iter,
                             n_oversample, key, epsil)


def full_svd_dense(a: jnp.ndarray) -> SvdResult:
    """Exact SVD (reference svd_f32 -> LAPACK gesdd, graphlaplace.rs:296)."""
    u, s, vt = jnp.linalg.svd(jnp.asarray(a, jnp.float32),
                              full_matrices=False)
    return SvdResult(u=u, s=s, vt=vt)


# ---------------------------------------------------------------------------
# COO sparse operator (the k-sparse graph Laplacian)
# ---------------------------------------------------------------------------

def coo_matmat(rows: jnp.ndarray, cols: jnp.ndarray, vals: jnp.ndarray,
               n_rows: int):
    """Return matmat closure computing A @ X for COO A of shape
    (n_rows, *): one gather + scatter-add, replacing sprs
    ``csr_mulacc_dense_rowmaj`` (svdapprox.rs:366)."""

    def matmat(x: jnp.ndarray) -> jnp.ndarray:
        contrib = vals[:, None] * x[cols]              # (nnz, r)
        return jnp.zeros((n_rows, x.shape[1]), x.dtype).at[rows].add(contrib)

    return matmat


@functools.partial(jax.jit, static_argnames=("n", "rank", "n_iter",
                                              "n_oversample"))
def randomized_svd_coo(rows, cols, vals, key, n: int, rank: int,
                       n_iter: int = 5, n_oversample: int = 10) -> SvdResult:
    """Fully-jitted randomized SVD of a symmetric COO operator — one
    XLA program for the whole range iteration + projection (keeps
    dispatch/compile count low on remote-compile backends)."""
    mm = coo_matmat(rows, cols, vals, n)
    return randomized_svd_op(mm, mm, (n, n), rank, n_iter=n_iter,
                             n_oversample=n_oversample, key=key)


def estimate_first_singular_value(matmat: Callable, rmatmat: Callable,
                                  n_cols: int, n_iter: int = 20,
                                  key: Optional[jax.Array] = None) -> jnp.ndarray:
    """Power iteration estimator of sigma_1 (svdapprox.rs:844)."""
    if key is None:
        key = jax.random.PRNGKey(0)
    v = jax.random.normal(key, (n_cols, 1), jnp.float32)
    v = v / jnp.linalg.norm(v)

    def body(_, v):
        w = rmatmat(matmat(v))
        return w / jnp.maximum(jnp.linalg.norm(w), 1e-30)

    v = jax.lax.fori_loop(0, n_iter, body, v)
    return jnp.linalg.norm(matmat(v))
