"""NN-descent refinement of an approximate kNN graph.

The reference relies on HNSW's navigability for recall; our IVF local
join can miss neighbours that fall outside the probed cells.
NN-descent (Dong et al. 2011) repairs this: neighbours-of-neighbours
are excellent candidates.  TPU shape: one round gathers, for every
node, the two-hop candidates of its *symmetrized* neighbourhood
(forward union a fixed-width reverse table), computes exact distances
in row panels (gather + VPU reduce), and merges with the current
top-k.  Everything is static-shaped; work is dispatched in bounded row
slabs to respect the device-program time limit.
"""

from __future__ import annotations

import functools
import logging

import jax
import jax.numpy as jnp

logger = logging.getLogger(__name__)


def _reverse_table(indices: jnp.ndarray, capacity: int) -> jnp.ndarray:
    """(n, capacity) table of reverse neighbours (who points at me),
    padded with n; overflow beyond capacity is dropped (the reference's
    HNSW keeps bounded in-degree too)."""
    n, k = indices.shape
    flat_dst = indices.reshape(-1)
    flat_src = jnp.repeat(jnp.arange(n, dtype=jnp.int32), k)
    # slot per destination: running count of arrivals (via sort by dst)
    order = jnp.argsort(flat_dst)
    dst_sorted = flat_dst[order]
    src_sorted = flat_src[order]
    # position within group = index - first index of the group
    first_idx = jnp.searchsorted(dst_sorted, jnp.arange(n), side="left")
    pos = jnp.arange(n * k) - first_idx[dst_sorted]
    keep = pos < capacity
    table = jnp.full((n + 1, capacity), n, dtype=jnp.int32)
    table = table.at[jnp.where(keep, dst_sorted, n),
                     jnp.where(keep, pos, 0)].set(
        jnp.where(keep, src_sorted, n))
    return table[:n]


@functools.partial(jax.jit, static_argnames=("rev_capacity",))
def _union_pp_impl(indices, rev_capacity: int):
    """Padded symmetrized neighbourhood table (n+1, k+rc) in one XLA
    program (bounded temporary memory)."""
    n = indices.shape[0]
    rev = _reverse_table(indices, rev_capacity)
    return jnp.pad(jnp.concatenate([indices, rev], axis=1),
                   ((0, 1), (0, 0)), constant_values=n)


@functools.partial(jax.jit, static_argnames=("k", "block_rows",
                                             "rev_capacity", "distance"))
def _nndescent_round(x_pad, indices, dists, k: int, block_rows: int,
                     rev_capacity: int, distance: str = "DistL2"):
    from .distances import get_pair_fn
    pair_fn = get_pair_fn(distance)
    n = indices.shape[0]
    d = x_pad.shape[1]
    rev = _reverse_table(indices, rev_capacity)            # (n, rc)

    n_blocks = -(-n // block_rows)
    pad_rows = n_blocks * block_rows - n
    idx_p = jnp.pad(indices, ((0, pad_rows), (0, 0)), constant_values=n)
    dist_p = jnp.pad(dists, ((0, pad_rows), (0, 0)))
    rid_p = jnp.arange(n_blocks * block_rows, dtype=jnp.int32)

    # general neighbourhood B(i) = forward ∪ reverse (Dong et al.: the
    # local join must run over the symmetrized lists, otherwise
    # information propagates only one directed hop per round)
    union = jnp.concatenate([indices, rev], axis=1)          # (n, k+rc)
    union_pp = jnp.pad(union, ((0, 1), (0, 0)), constant_values=n)
    union_p = jnp.pad(union, ((0, pad_rows), (0, 0)), constant_values=n)

    def one(args):
        cur_idx, cur_dist, uni, rid = args  # (b,k),(b,k),(b,k+rc),(b,)
        # candidates: B(B(i))
        cand = union_pp[uni].reshape(uni.shape[0], -1)  # (b, (k+rc)^2)
        q = x_pad[rid].astype(jnp.float32)                        # (b, d)
        xc = x_pad[cand].astype(jnp.float32)                      # (b, C, d)
        cd = pair_fn(q[:, None, :], xc)
        invalid = (cand >= n) | (cand == rid[:, None])
        # exclude already-known neighbours (avoid duplicates in merge)
        known = (cand[:, :, None] == cur_idx[:, None, :]).any(-1)
        cd = jnp.where(invalid | known, jnp.inf, cd)
        all_d = jnp.concatenate([cur_dist, cd], axis=1)
        all_i = jnp.concatenate([cur_idx, cand], axis=1)
        neg_d, pos = jax.lax.top_k(-all_d, k)
        new_i = jnp.take_along_axis(all_i, pos, axis=1)
        return new_i.astype(jnp.int32), -neg_d

    ni, nd = jax.lax.map(one, (
        idx_p.reshape(n_blocks, block_rows, -1),
        dist_p.reshape(n_blocks, block_rows, -1),
        union_p.reshape(n_blocks, block_rows, -1),
        rid_p.reshape(n_blocks, block_rows)))
    ni = ni.reshape(-1, k)[:n]
    nd = nd.reshape(-1, k)[:n]
    return ni, jnp.maximum(nd, 0.0)


#: rows processed per device program: the axon runtime kills programs
#: that execute continuously for many minutes; a slab bounds each jit
#: call to seconds (candidate joins cost ~0.1-0.3 ms per row at k~8,
#: more at large k)
_ROWS_PER_PROGRAM = 200_000


@functools.partial(jax.jit, static_argnames=("k", "block_rows",
                                             "distance"))
def _nndescent_slab(x_pad, union_pp, idx_slab, dist_slab, uni_slab,
                    rid_slab, k: int, block_rows: int,
                    distance: str = "DistL2"):
    from .distances import get_pair_fn
    pair_fn = get_pair_fn(distance)
    """One bounded slab of the local join (rows of one chunk).

    ``x_pad`` may be bfloat16 (candidate SCORING precision only — the
    caller exact-reranks the final lists in f32); distances are
    accumulated in f32 either way."""
    n = x_pad.shape[0] - 1
    rows = idx_slab.shape[0]
    n_blocks = -(-rows // block_rows)
    pad_rows = n_blocks * block_rows - rows
    idx_p = jnp.pad(idx_slab, ((0, pad_rows), (0, 0)), constant_values=n)
    dist_p = jnp.pad(dist_slab, ((0, pad_rows), (0, 0)))
    uni_p = jnp.pad(uni_slab, ((0, pad_rows), (0, 0)), constant_values=n)
    rid_p = jnp.pad(rid_slab, (0, pad_rows), constant_values=n)

    def one(args):
        cur_idx, cur_dist, uni, rid = args
        cand = union_pp[uni].reshape(uni.shape[0], -1)
        q = x_pad[rid].astype(jnp.float32)
        xc = x_pad[cand].astype(jnp.float32)
        cd = pair_fn(q[:, None, :], xc)
        invalid = (cand >= n) | (cand == rid[:, None])
        known = (cand[:, :, None] == cur_idx[:, None, :]).any(-1)
        cd = jnp.where(invalid | known, jnp.inf, cd)
        all_d = jnp.concatenate([cur_dist, cd], axis=1)
        all_i = jnp.concatenate([cur_idx, cand], axis=1)
        neg_d, pos = jax.lax.top_k(-all_d, k)
        new_i = jnp.take_along_axis(all_i, pos, axis=1)
        return new_i.astype(jnp.int32), -neg_d

    ni, nd = jax.lax.map(one, (
        idx_p.reshape(n_blocks, block_rows, -1),
        dist_p.reshape(n_blocks, block_rows, -1),
        uni_p.reshape(n_blocks, block_rows, -1),
        rid_p.reshape(n_blocks, block_rows)))
    return (ni.reshape(-1, k)[:rows],
            jnp.maximum(nd.reshape(-1, k)[:rows], 0.0))


@functools.partial(jax.jit, static_argnames=("distance",))
def _exact_rerank_slab(x, idx_slab, rid_slab, distance: str = "DistL2"):
    """Recompute distances of (rows, k) neighbour lists exactly in f32
    and restore ascending order."""
    from .distances import get_pair_fn
    pair_fn = get_pair_fn(distance)
    q = x[rid_slab]                       # (rows, d)
    xc = x[idx_slab]                      # (rows, k, d)
    d = pair_fn(q[:, None, :], xc)
    order = jnp.argsort(d, axis=1)
    return (jnp.take_along_axis(idx_slab, order, axis=1),
            jnp.maximum(jnp.take_along_axis(d, order, axis=1), 0.0))


def nndescent_refine(x, indices, dists, n_rounds: int = 2,
                     block_rows: int = 512, rev_capacity: int = 0,
                     distance: str = "DistL2", dtype: str = "float32"):
    """Refine (indices, dists) in place over n_rounds, in any of the
    five reference metrics (candidate scoring uses the metric's own
    pair form).  Work is dispatched in bounded row slabs
    (device-program time limit).

    ``dtype="bfloat16"`` scores candidates from a bf16 copy of x
    (halves the dominant (b, C, d) gather bytes) and exact-reranks the
    final lists in f32, so returned distances stay f32-exact."""
    x = jnp.asarray(x, jnp.float32)
    n, d = x.shape
    k = indices.shape[1]
    if rev_capacity <= 0:
        rev_capacity = k
    score_bf16 = dtype == "bfloat16"
    x_score = x.astype(jnp.bfloat16) if score_bf16 else x
    x_pad = jnp.concatenate(
        [x_score, jnp.zeros((1, d), x_score.dtype)], axis=0)
    # scale the slab down for large candidate sets (cost ~ (k+rc)^2)
    slab = max(block_rows,
               _ROWS_PER_PROGRAM * 196 // max((k + rev_capacity) ** 2, 196))
    slab -= slab % block_rows or 0
    ids = jnp.arange(n, dtype=jnp.int32)
    if n <= slab:
        for _ in range(n_rounds):
            indices, dists = _nndescent_round(x_pad, indices, dists, k,
                                              block_rows, rev_capacity,
                                              distance)
        if score_bf16:
            indices, dists = _exact_rerank_slab(x, indices, ids, distance)
        return indices, dists
    for _ in range(n_rounds):
        # one padded union only (rows [:n] are the union itself) and
        # per-slab in-place updates of preallocated outputs: at 11M the
        # union copy + concat-accumulated slab outputs were ~2 GB of
        # avoidable peak HBM.  The union build is ONE jitted program:
        # run eagerly, _reverse_table's ~8 op-sized temporaries
        # (argsort/gather chains over n*k = 132M elements) all stay
        # live at once and OOM at 11M
        union_pp = _union_pp_impl(indices, rev_capacity)
        out_i = jnp.zeros((n, k), jnp.int32)
        out_d = jnp.zeros((n, k), jnp.float32)
        for s0 in range(0, n, slab):
            s1 = min(s0 + slab, n)
            sl_pad = slab - (s1 - s0)
            ni, nd = _nndescent_slab(
                x_pad, union_pp,
                jnp.pad(indices[s0:s1], ((0, sl_pad), (0, 0)),
                        constant_values=n),
                jnp.pad(dists[s0:s1], ((0, sl_pad), (0, 0))),
                jnp.pad(union_pp[s0:s1], ((0, sl_pad), (0, 0)),
                        constant_values=n),
                jnp.pad(ids[s0:s1], (0, sl_pad), constant_values=n),
                k, block_rows, distance)
            out_i = jax.lax.dynamic_update_slice(out_i, ni[:s1 - s0],
                                                 (s0, 0))
            out_d = jax.lax.dynamic_update_slice(out_d, nd[:s1 - s0],
                                                 (s0, 0))
            # serialize slabs (bounds in-flight join workspaces; see
            # knn/ivf.py)
            out_d.block_until_ready()
        indices, dists = out_i, out_d
    if score_bf16:
        # small slabs: (rows, k, d) gather programs beyond a few hundred
        # million elements crash the TPU compile helper
        rr_slab = 250_000
        for s0 in range(0, n, rr_slab):
            s1 = min(s0 + rr_slab, n)
            ri, rd = _exact_rerank_slab(x, indices[s0:s1], ids[s0:s1],
                                        distance)
            indices = jax.lax.dynamic_update_slice(indices, ri, (s0, 0))
            dists = jax.lax.dynamic_update_slice(dists, rd, (s0, 0))
            dists.block_until_ready()
    return indices, dists
