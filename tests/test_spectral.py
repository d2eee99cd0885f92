"""Laplacian + diffusion-maps tests.

Checks the normalization invariants the reference asserts at runtime
(diffmaps.rs:488-499 row-sum check, :1176 decreasing spectrum) and that
the spectral embedding separates well-separated clusters.
"""

import numpy as np
import jax.numpy as jnp

from annembed_tpu.knn.brute import knn_graph_brute
from annembed_tpu.graph.kgraph import KGraph
from annembed_tpu.graph.proba import to_proba_edges
from annembed_tpu.graph.laplacian import laplacian_from_probas
from annembed_tpu.spectral.diffmaps import DiffusionMaps, get_dmap_embedding
from annembed_tpu.params import DiffusionParams


def blobs(rng, n_per=100, centers=((0,) * 8, (12,) * 8, (-12, 12) * 4)):
    xs, labels = [], []
    for i, c in enumerate(centers):
        xs.append(rng.normal(size=(n_per, len(c))) + np.array(c))
        labels.append(np.full(n_per, i))
    return (np.concatenate(xs).astype(np.float32),
            np.concatenate(labels))


def make_graph(x, k=10):
    idx, dist = knn_graph_brute(x, k=k)
    return KGraph(indices=idx, dists=dist)


def test_legacy_laplacian_symmetric_and_normalized(rng):
    x, _ = blobs(rng, n_per=60)
    g = make_graph(x)
    npar = to_proba_edges(g)
    lap = laplacian_from_probas(g, npar.probas)
    dense = np.asarray(lap.to_dense())
    np.testing.assert_allclose(dense, dense.T, atol=1e-6)
    # largest eigenvalue of D^-1/2 G D^-1/2 is 1 with eigvec D^1/2
    s = np.linalg.svd(dense, compute_uv=False)
    assert abs(s[0] - 1.0) < 1e-3


def test_dmap_laplacian_row_normalization(rng):
    """The reference checks sum_j K_ij * sqrt(D_j) / sqrt(D_i) == 1
    (diffmaps.rs:488-499)."""
    x, _ = blobs(rng, n_per=50)
    g = make_graph(x)
    dm = DiffusionMaps(params=DiffusionParams(asked_dim=2, alfa=0.5,
                                              beta=-0.1, t=5.0))
    lap = dm.laplacian_from_kgraph(g)
    dense = np.asarray(lap.to_dense())
    np.testing.assert_allclose(dense, dense.T, atol=1e-6)
    w = np.asarray(lap.normalizer)
    check = (dense * w[None, :]).sum(axis=1) / w
    np.testing.assert_allclose(check, 1.0, atol=1e-3)


def test_dmap_spectrum_decreasing_and_top_eigenvalue(rng):
    x, _ = blobs(rng, n_per=50)
    g = make_graph(x)
    dm = DiffusionMaps(params=DiffusionParams.with_fixed_bandwidth())
    lap = dm.laplacian_from_kgraph(g)
    res = lap.do_svd(10)
    s = np.asarray(res.s)
    assert (np.diff(s) <= 1e-5).all(), "svd spectrum not decreasing"
    assert abs(s[0] - 1.0) < 1e-3


def test_dmap_embedding_separates_blobs(rng):
    x, labels = blobs(rng, n_per=80)
    g = make_graph(x)
    dm = DiffusionMaps(params=DiffusionParams(asked_dim=2, alfa=0.5,
                                              beta=-0.1, t=5.0, gnbn=10))
    coords = np.asarray(dm.embed_from_kgraph(g))
    assert coords.shape == (240, 2)
    assert np.isfinite(coords).all()
    assert (np.abs(coords) <= 10.0 + 1e-5).all()  # clip at 10, diffmaps.rs:1225
    # each point should sit nearest to its own cluster centroid
    # (disconnected blobs -> component-indicator eigenvectors)
    mus = np.stack([coords[labels == i].mean(0) for i in range(3)])
    d_to_mus = np.linalg.norm(coords[:, None, :] - mus[None], axis=-1)
    acc = (d_to_mus.argmin(1) == labels).mean()
    assert acc > 0.95, f"cluster accuracy {acc}"


def test_dmap_beta_zero_fixed_bandwidth(rng):
    x, _ = blobs(rng, n_per=50)
    g = make_graph(x)
    dm = DiffusionMaps(params=DiffusionParams.with_fixed_bandwidth())
    coords = np.asarray(dm.embed_from_kgraph(g))
    assert np.isfinite(coords).all()
    assert dm.q_density is None  # no density pass when beta == 0


def test_dmap_auto_time(rng):
    x, _ = blobs(rng, n_per=40)
    g = make_graph(x)
    p = DiffusionParams(asked_dim=3, alfa=0.5, beta=-0.1, t=None)
    dm = DiffusionMaps(params=p)
    coords = np.asarray(dm.embed_from_kgraph(g))
    assert coords.shape == (120, 3)
    assert np.isfinite(coords).all()


def test_legacy_dmap_embedding(rng):
    x, _ = blobs(rng, n_per=50)
    g = make_graph(x)
    npar = to_proba_edges(g)
    coords = np.asarray(get_dmap_embedding(g, npar.probas, asked_dim=2))
    assert coords.shape == (150, 2)
    assert np.isfinite(coords).all()
