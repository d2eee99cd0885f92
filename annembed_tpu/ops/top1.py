"""Pallas TPU kernel: fused L2 distance + running top-1.

Used by the hierarchical projection (every point -> nearest sampled
point, knn/hierarchy.py; reference kgproj.rs:195-237): a (nq, m) panel
never hits HBM — corpus tiles stream through VMEM while a running
(block, 1) min/argmin lives in scratch across the corpus grid
dimension.  For the Higgs-scale projection (11M x 440k) this saves
~2 GB of HBM panel traffic per query block.

Grid: (query blocks, corpus tiles), corpus innermost so the scratch
accumulator carries across tiles of one query block.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _top1_kernel(q_ref, qsq_ref, c_ref, csq_ref, out_d_ref, out_i_ref,
                 best_d, best_i, *, tile_m: int):
    j = pl.program_id(1)
    nj = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        best_d[:] = jnp.full_like(best_d, jnp.inf)
        best_i[:] = jnp.zeros_like(best_i)

    q = q_ref[:]                       # (bq, d)
    c = c_ref[:]                       # (tile_m, d)
    cross = jnp.dot(q, c.T, preferred_element_type=jnp.float32)
    d2 = qsq_ref[:] + csq_ref[:].reshape(1, -1) - 2.0 * cross  # (bq, tm)
    tile_min = jnp.min(d2, axis=1, keepdims=True)              # (bq, 1)
    tile_arg = jnp.argmin(d2, axis=1).reshape(-1, 1) + j * tile_m
    upd = tile_min < best_d[:]
    best_i[:] = jnp.where(upd, tile_arg.astype(jnp.int32), best_i[:])
    best_d[:] = jnp.where(upd, tile_min, best_d[:])

    @pl.when(j == nj - 1)
    def _():
        out_d_ref[:] = jnp.sqrt(jnp.maximum(best_d[:], 0.0))
        out_i_ref[:] = best_i[:]


def top1_l2(queries, corpus, block_q: int = 512, tile_m: int = 2048,
            interpret: bool = False, slab_q: int = 2_000_000):
    """Nearest corpus row for each query: (idx (nq,) int32, dist (nq,)).

    Queries are processed in slabs of at most ``slab_q`` rows: one
    pallas grid over all 11M Higgs queries is ~4.6M grid steps, which
    crashed the Mosaic compile; per-slab grids stay well inside what
    compiles (and the slab boundary also serializes device work)."""
    queries = jnp.asarray(queries, jnp.float32)
    nq = queries.shape[0]
    if nq <= slab_q:
        return _top1_l2_impl(queries, corpus, block_q=block_q,
                             tile_m=tile_m, interpret=interpret)
    idx_parts, dist_parts = [], []
    for s0 in range(0, nq, slab_q):
        s1 = min(s0 + slab_q, nq)
        pad = slab_q - (s1 - s0)
        qs = jnp.pad(queries[s0:s1], ((0, pad), (0, 0)))
        si, sd = _top1_l2_impl(qs, corpus, block_q=block_q,
                               tile_m=tile_m, interpret=interpret)
        sd.block_until_ready()
        idx_parts.append(si[:s1 - s0])
        dist_parts.append(sd[:s1 - s0])
    return jnp.concatenate(idx_parts), jnp.concatenate(dist_parts)


@functools.partial(jax.jit, static_argnames=("block_q", "tile_m",
                                             "interpret"))
def _top1_l2_impl(queries, corpus, block_q: int = 512, tile_m: int = 2048,
                  interpret: bool = False):
    """One-slab pallas dispatch; padded corpus rows are masked by +inf
    via their squared-norm entries."""
    queries = jnp.asarray(queries, jnp.float32)
    corpus = jnp.asarray(corpus, jnp.float32)
    nq, d = queries.shape
    m = corpus.shape[0]

    nbq = -(-nq // block_q)
    nbm = -(-m // tile_m)
    qp = jnp.pad(queries, ((0, nbq * block_q - nq), (0, 0)))
    cp = jnp.pad(corpus, ((0, nbm * tile_m - m), (0, 0)))
    qsq = jnp.sum(jnp.square(qp), axis=1, keepdims=True)       # (nq', 1)
    csq = jnp.sum(jnp.square(cp), axis=1)
    # mask padded corpus rows out of the argmin
    csq = jnp.where(jnp.arange(nbm * tile_m) < m, csq, jnp.inf)
    csq = csq.reshape(-1, 1)                                    # (m', 1)

    grid = (nbq, nbm)
    out_d, out_i = pl.pallas_call(
        functools.partial(_top1_kernel, tile_m=tile_m),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_q, d), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_q, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_m, d), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_m, 1), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((block_q, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_q, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nbq * block_q, 1), jnp.float32),
            jax.ShapeDtypeStruct((nbq * block_q, 1), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.int32),
        ],
        interpret=interpret,
    )(qp, qsq, cp, csq)
    return out_i[:nq, 0], out_d[:nq, 0]
