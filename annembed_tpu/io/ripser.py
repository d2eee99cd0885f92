"""TDA export for Ripserer.jl.

Rebuilds reference src/fromhnsw/toripserer.rs + kgraph.rs:354:
  * ``extract_neighbourhood``: the knbn nearest points around a query
    center, dumped as a lower-triangular distance matrix (diag
    included, zeros) in a one-field BSON document {"limat": [f64...]}
    readable by the Julia companion (toripserer.rs:45-116).
  * ``to_ripser_sparse_dist`` (kgraph.rs:354): the symmetrized kNN
    graph as "i j dist" text triplets.

BSON is written with a minimal self-contained encoder (document of one
array-of-doubles field) — no external bson package required.
"""

from __future__ import annotations

import struct
from typing import Sequence

import numpy as np

from ..graph.kgraph import KGraph
from ..knn.brute import knn_search_brute


def _bson_f64_array(name: str, values: Sequence[float]) -> bytes:
    """BSON array element: type 0x04, keys are decimal index strings,
    items are doubles (type 0x01).  Built as a list join — the naive
    ``bytes +=`` accumulation is O(n^2) and takes hours at the ~2M
    values a knbn=2000 neighbourhood produces."""
    parts = []
    for i, v in enumerate(values):
        parts.append(b"\x01" + str(i).encode() + b"\x00"
                     + struct.pack("<d", float(v)))
    items = b"".join(parts)
    arr_doc = struct.pack("<i", len(items) + 5) + items + b"\x00"
    return b"\x04" + name.encode() + b"\x00" + arr_doc


def write_bson_limat(path: str, values: Sequence[float]) -> None:
    """Document {"limat": [...f64]} (toripserer.rs:106-113)."""
    body = _bson_f64_array("limat", values)
    doc = struct.pack("<i", len(body) + 5) + body + b"\x00"
    with open(path, "wb") as f:
        f.write(doc)


def read_bson_limat(path: str) -> np.ndarray:
    """Inverse of write_bson_limat (for tests / reuse)."""
    raw = open(path, "rb").read()
    (doc_len,) = struct.unpack_from("<i", raw, 0)
    assert doc_len == len(raw)
    assert raw[4] == 0x04
    name_end = raw.index(b"\x00", 5)
    assert raw[5:name_end] == b"limat"
    pos = name_end + 1
    (arr_len,) = struct.unpack_from("<i", raw, pos)
    end = pos + arr_len - 1
    pos += 4
    out = []
    while pos < end:
        assert raw[pos] == 0x01
        pos = raw.index(b"\x00", pos + 1) + 1
        (v,) = struct.unpack_from("<d", raw, pos)
        out.append(v)
        pos += 8
    return np.array(out)


def extract_neighbourhood(x, center, knbn: int, outbson: str,
                          distance: str = "DistL2") -> int:
    """Lower-triangular distance matrix of the knbn points nearest to
    ``center`` -> BSON (toripserer.rs:45).  Returns number of points."""
    import jax.numpy as jnp
    from ..knn.distances import get_panel_fn

    x = np.asarray(x, np.float32)
    center = np.asarray(center, np.float32).reshape(1, -1)
    idx, _ = knn_search_brute(center, x, k=min(knbn, x.shape[0]),
                              distance=distance)
    pts = x[np.asarray(idx[0])]
    nb = pts.shape[0]
    # pairwise distances of the neighbourhood in the CHOSEN metric
    # (toripserer.rs:59-69 uses hnsw.get_distance().eval); the panel
    # form also avoids the (nb, nb, d) broadcast — 12.5 GB at
    # knbn=2000, d=784
    pj = jnp.asarray(pts)
    d = np.asarray(get_panel_fn(distance)(pj, pj))
    tri = []
    for i in range(nb):
        tri.extend(d[i, :i].tolist())
        tri.append(0.0)
    write_bson_limat(outbson, tri)
    return nb


def extract_projection_to_ripserer(x, knbn: int, fname: str,
                                   sample_fraction: float = 0.05,
                                   distance: str = "DistL2",
                                   seed: int = 0) -> dict:
    """Persistence input from the coarse (projected) graph
    (toripserer.rs:131 + kgproj.rs:413 ``dump_sparse_mat_for_ripser``):
    builds the two-level projection, dumps the small graph as sparse
    "i j dist" triplets, returns the projection distance quantiles (the
    reference logs these as a projection-quality measure)."""
    from ..knn.hierarchy import build_projection
    proj = build_projection(x, knbn, sample_fraction=sample_fraction,
                            distance=distance, seed=seed)
    to_ripser_sparse_dist(proj.small_graph, fname)
    return proj.projection_distance_quantiles()


def to_ripser_sparse_dist(g: KGraph, path: str) -> None:
    """Symmetrized text triplets "i j dist" (kgraph.rs:354-369).

    Both directions of every edge are written unconditionally — mutual
    neighbours therefore appear twice per direction, exactly like the
    reference dump (kgraph.rs:361-364); Ripserer tolerates the
    duplicates.  Rows are emitted via one vectorized savetxt instead of
    a 2nk-iteration Python loop."""
    idx = np.asarray(g.indices)
    dist = np.asarray(g.dists)
    n, k = idx.shape
    ii = np.repeat(np.arange(n, dtype=np.int64), k)
    jj = idx.reshape(-1).astype(np.int64)
    dd = dist.reshape(-1).astype(np.float64)
    rows = np.empty((2 * n * k, 3), np.float64)
    rows[0::2] = np.stack([ii, jj, dd], axis=1)   # i j d
    rows[1::2] = np.stack([jj, ii, dd], axis=1)   # j i d (reference order)
    with open(path, "w") as f:
        np.savetxt(f, rows, fmt="%d %d %.5E")
