"""Probability-graph calibration and symmetrization tests.

Verifies the to_proba_edges math against a direct per-node oracle of
reference kdumap.rs:132-235, the all-equal fallback, and the COO
symmetrization against dense 0.5*(A+A^T) / max(A, A^T).
"""

import numpy as np
import jax.numpy as jnp

from annembed_tpu.knn.brute import knn_graph_brute
from annembed_tpu.graph.kgraph import KGraph, symmetric_coo, coo_to_dense, \
    in_degree_counts, kgraph_stats
from annembed_tpu.graph.proba import to_proba_edges, proba_telemetry
from annembed_tpu.params import PROBA_MIN


def make_graph(rng, n=200, d=12, k=6):
    x = rng.normal(size=(n, d)).astype(np.float32)
    idx, dist = knn_graph_brute(x, k=k)
    return KGraph(indices=idx, dists=dist)


def oracle_node(dists, rho_all, indices, i, scale_rho, beta, k):
    """Direct transcription of the reference per-node scale math."""
    rho_x = dists[i, 0]
    rho_ys = [rho_all[j] for j in indices[i]] + [rho_x]
    mean_rho = np.mean(rho_ys)
    scale = scale_rho * mean_rho
    first = dists[i, 0]
    if dists[i, -1] <= first:
        return scale, np.full(k, 1.0 / k)
    w = np.exp(-np.power(np.maximum(dists[i] - first, 0) / scale, beta))
    w = np.maximum(w, PROBA_MIN)
    return scale, w / w.sum()


def test_proba_edges_match_oracle(rng):
    g = make_graph(rng)
    npar = to_proba_edges(g, scale_rho=1.0, beta=1.0)
    dists = np.asarray(g.dists)
    indices = np.asarray(g.indices)
    rho_all = dists[:, 0]
    k = dists.shape[1]
    for i in [0, 7, 100, 199]:
        scale, w = oracle_node(dists, rho_all, indices, i, 1.0, 1.0, k)
        np.testing.assert_allclose(float(npar.scale[i]), scale, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(npar.probas[i]), w, rtol=1e-5)


def test_proba_rows_normalized(rng):
    g = make_graph(rng, n=300, k=10)
    npar = to_proba_edges(g, scale_rho=0.5, beta=2.0)
    s = np.asarray(npar.probas.sum(axis=1))
    np.testing.assert_allclose(s, 1.0, rtol=1e-5)
    assert (np.asarray(npar.probas) > 0).all()


def test_proba_all_equal_fallback():
    # node whose neighbours are all at the same distance -> uniform row
    idx = jnp.array([[1, 2, 3], [0, 2, 3], [0, 1, 3], [0, 1, 2]], jnp.int32)
    dists = jnp.full((4, 3), 2.0, jnp.float32)
    npar = to_proba_edges(KGraph(indices=idx, dists=dists))
    np.testing.assert_allclose(np.asarray(npar.probas), 1.0 / 3.0, rtol=1e-6)
    # all-zero distances (Higgs degenerate case) too
    npar0 = to_proba_edges(KGraph(indices=idx,
                                  dists=jnp.zeros((4, 3), jnp.float32)))
    np.testing.assert_allclose(np.asarray(npar0.probas), 1.0 / 3.0, rtol=1e-6)
    assert np.isfinite(np.asarray(npar0.scale)).all()


def test_perplexity_of_uniform_row():
    idx = jnp.array([[1, 2, 3, 4]], jnp.int32)
    dists = jnp.ones((1, 4), jnp.float32)
    npar = to_proba_edges(KGraph(indices=idx, dists=dists))
    np.testing.assert_allclose(float(npar.perplexity()[0]), 4.0, rtol=1e-5)


def test_symmetric_coo_mean_matches_dense(rng):
    g = make_graph(rng, n=60, k=5)
    npar = to_proba_edges(g)
    n = g.nb_nodes
    dense = np.zeros((n, n), np.float32)
    probas = np.asarray(npar.probas)
    indices = np.asarray(g.indices)
    for i in range(n):
        dense[i, indices[i]] = probas[i]
    expected = 0.5 * (dense + dense.T)
    rows, cols, vals = symmetric_coo(g, weights=npar.probas, mode="mean")
    got = np.asarray(coo_to_dense(rows, cols, vals, n))
    np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-7)


def test_symmetric_coo_max_matches_dense(rng):
    g = make_graph(rng, n=60, k=5)
    npar = to_proba_edges(g)
    n = g.nb_nodes
    dense = np.zeros((n, n), np.float32)
    probas = np.asarray(npar.probas)
    indices = np.asarray(g.indices)
    for i in range(n):
        dense[i, indices[i]] = probas[i]
    expected = np.maximum(dense, dense.T)
    rows, cols, vals = symmetric_coo(g, weights=npar.probas, mode="max")
    got = np.asarray(coo_to_dense(rows, cols, vals, n))
    np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-7)


def test_symmetric_coo_self_edges(rng):
    g = make_graph(rng, n=30, k=4)
    rows, cols, vals = symmetric_coo(g, mode="max", include_self=True,
                                     self_weight=1.0)
    dense = np.asarray(coo_to_dense(rows, cols, vals, 30))
    np.testing.assert_allclose(np.diagonal(dense), 1.0)


def test_stats_and_indegree(rng):
    g = make_graph(rng, n=100, k=5)
    counts = np.asarray(in_degree_counts(g))
    assert counts.sum() == 100 * 5
    stats = kgraph_stats(g)
    assert stats["nb_nodes"] == 100
    assert stats["min_radius_q0.5"] > 0
    tele = proba_telemetry(to_proba_edges(g))
    assert tele["perplexity_q0.5"] > 1.0


def test_proba_edges_beta_half(rng):
    """beta=0.5 path (reference allows 0.5 or 1, embedparams.rs:47)."""
    g = make_graph(rng, n=150, k=6)
    npar = to_proba_edges(g, scale_rho=1.0, beta=0.5)
    s = np.asarray(npar.probas.sum(axis=1))
    np.testing.assert_allclose(s, 1.0, rtol=1e-5)
    # steeper beta flattens less: perplexity differs from beta=1
    p1 = to_proba_edges(g, scale_rho=1.0, beta=1.0)
    assert not np.allclose(np.asarray(npar.probas), np.asarray(p1.probas))


def test_proba_edges_sentinel_rho_isolated(rng):
    """A fully-broken IVF fallback row (dist pinned at 1e30 by
    knn/ivf.py::_fixup_underfilled) must not contaminate the mean-rho
    calibration of nodes that list it as a neighbour."""
    g = make_graph(rng, n=120, k=6)
    idx = np.asarray(g.indices).copy()
    dst = np.asarray(g.dists).copy()
    # break node 7: no valid candidates -> sentinel distances
    dst[7, :] = 1e30
    # make sure several nodes list 7 as a neighbour
    victims = [3, 11, 42]
    for v in victims:
        idx[v, 2] = 7
    broken = KGraph(indices=jnp.asarray(idx), dists=jnp.asarray(dst))
    npar = to_proba_edges(broken, scale_rho=1.0, beta=1.0)
    clean = to_proba_edges(g, scale_rho=1.0, beta=1.0)
    scale_b = np.asarray(npar.scale)
    scale_c = np.asarray(clean.scale)
    for v in victims:
        # scale stays finite and in the same ballpark as the clean graph
        assert scale_b[v] < 1e3, scale_b[v]
        assert 0.2 < scale_b[v] / scale_c[v] < 5.0
    # probas still normalized everywhere
    np.testing.assert_allclose(np.asarray(npar.probas.sum(axis=1)), 1.0,
                               rtol=1e-5)
    # the broken row itself degrades to uniform (scale blows up only there)
    np.testing.assert_allclose(np.asarray(npar.probas[7]), 1.0 / 6, rtol=1e-4)
