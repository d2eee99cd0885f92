"""Estimator tests: intrinsic dimension on data of known dimension
(the reference's statistical-plausibility strategy, kgraph.rs:771-830),
hubness moments, quality-estimate invariants.
"""

import numpy as np

from annembed_tpu.knn.brute import knn_graph_brute
from annembed_tpu.graph.kgraph import KGraph
from annembed_tpu.estimators.dimension import (intrinsic_dim_levina_bickel,
                                               intrinsic_dim_2nn)
from annembed_tpu.estimators.hubness import Hubness
from annembed_tpu.estimators.quality import quality_estimate


def graph_of(x, k=25):
    idx, dist = knn_graph_brute(np.asarray(x, np.float32), k=k)
    return KGraph(indices=idx, dists=dist)


def test_levina_bickel_on_known_dim(rng):
    # uniform cube in dimension 5 embedded in R^20 by a random rotation
    d_true = 5
    z = rng.random(size=(4000, d_true)).astype(np.float32)
    q, _ = np.linalg.qr(rng.normal(size=(20, 20)))
    x = z @ q[:d_true].astype(np.float32)
    g = graph_of(x, k=25)
    mean, sigma = intrinsic_dim_levina_bickel(g)
    assert abs(mean - d_true) < 1.5, (mean, sigma)


def test_2nn_on_known_dim(rng):
    d_true = 4
    z = rng.random(size=(6000, d_true)).astype(np.float32)
    g = graph_of(z, k=5)
    d_est = intrinsic_dim_2nn(g)
    assert abs(d_est - d_true) < 1.0, d_est


def test_dimension_increases_with_true_dim(rng):
    est = []
    for d_true in (2, 8):
        z = rng.random(size=(3000, d_true)).astype(np.float32)
        g = graph_of(z, k=25)
        est.append(intrinsic_dim_levina_bickel(g)[0])
    assert est[0] < est[1]


def test_hubness_counts_and_skew(rng):
    x = rng.normal(size=(500, 6)).astype(np.float32)
    g = graph_of(x, k=8)
    h = Hubness.new(g)
    counts = np.asarray(h.get_counts())
    assert counts.sum() == 500 * 8
    hist = h.get_hubness_histogram()
    assert hist["mean"] == 8.0
    ids, top = h.get_largest_hubs(5)
    assert (top >= counts.mean()).all()
    assert np.isfinite(h.get_standard3m())


def test_quality_identity_embedding(rng):
    """Embedding = original coords: every neighbourhood must match."""
    x = rng.normal(size=(400, 7)).astype(np.float32)
    g = graph_of(x, k=6)
    q = quality_estimate(g, x, nbng=10)
    assert q.nb_without_match == 0
    assert q.mean_nb_matched == 6.0
    assert q.median_ratio <= 1.0


def test_quality_random_embedding_is_worse(rng):
    x = rng.normal(size=(400, 7)).astype(np.float32)
    g = graph_of(x, k=6)
    y_good = x[:, :2]  # projection keeps some structure
    y_bad = rng.normal(size=(400, 2)).astype(np.float32)
    q_good = quality_estimate(g, y_good, nbng=10)
    q_bad = quality_estimate(g, y_bad, nbng=10)
    assert q_good.mean_nb_matched > q_bad.mean_nb_matched
    assert q_good.median_ratio < q_bad.median_ratio


def test_cdc_batch_matches_dense_rows(rng):
    """get_cdc_batch (sparse windowed gather) must equal the dense
    kernel-row computation p @ x exactly on a small fixture."""
    import jax.numpy as jnp
    from annembed_tpu.estimators.cdc import CarreDuChamp
    x = rng.normal(size=(300, 5)).astype(np.float32)
    cdc = CarreDuChamp(x, knbn=8)
    pts = jnp.array([0, 17, 123, 299])
    mean_b, cov_b = cdc.get_cdc_batch(pts)
    p = cdc.kernel_rows(pts)                    # dense (Q, n)
    np.testing.assert_allclose(np.asarray(p.sum(1)), 1.0, atol=1e-4)
    mean_d = p @ jnp.asarray(x)
    centered = jnp.asarray(x)[None] - mean_d[:, None, :]
    cov_d = jnp.einsum("qn,qni,qnj->qij", p, centered, centered)
    s = cdc.glaplacian.normed_scales
    sq = np.ones(4, np.float32) if s is None else np.asarray(s)[np.asarray(pts)]
    cov_d = np.asarray(cov_d) / (2.0 * sq ** 2)[:, None, None]
    np.testing.assert_allclose(np.asarray(mean_b), np.asarray(mean_d),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(cov_b), cov_d,
                               rtol=1e-3, atol=1e-5)
