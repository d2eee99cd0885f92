"""Estimator tests: intrinsic dimension on data of known dimension
(the reference's statistical-plausibility strategy, kgraph.rs:771-830),
hubness moments, quality-estimate invariants.
"""

import jax.numpy as jnp
import numpy as np
import pytest

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


def test_quality_exact_semantics_fixture():
    """Pin the metric's exact semantics on a hand-computed fixture
    (reference src/embedder.rs:620-753 match counting + ratio).

    5 embedded points; original-graph neighbour lists chosen so that
    nodes 0-2 conserve both edges, node 3 conserves one (its edge to
    node 1 IS its embedded 2-NN radius: <= matches), and node 4
    conserves none (both edge lengths exceed its radius 140.014).
    """
    y = np.array([[0.0, 0.0], [1.0, 0.0], [0.0, 2.0],
                  [10.0, 10.0], [100.0, 100.0]], np.float32)
    indices = np.array([[1, 2], [0, 2], [0, 1], [0, 1], [0, 1]], np.int32)
    # dists in the ORIGINAL space are irrelevant to the metric
    g = KGraph(indices=jnp.asarray(indices),
               dists=jnp.ones_like(jnp.asarray(y[:, :2])))
    q = quality_estimate(g, y, nbng=2)
    # embedded 2-NN radii: [2, sqrt5, sqrt5, d(3,1)=13.4536, 140.0143]
    # matched counts: [2, 2, 2, 1, 0]
    assert q.nb_without_match == 1
    assert q.mean_nb_matched == pytest.approx(7.0 / 4.0)
    # 10 edge ratios, middle two are both 1.0 (edges that hit their
    # radius exactly)
    assert q.median_ratio == pytest.approx(1.0, abs=1e-6)
    assert q.mean_ratio == pytest.approx(0.890781, abs=1e-4)
    assert q.frac_without_match == pytest.approx(0.2)
    # radius q0.95 (linear interpolation over the exact 2-NN radii
    # [2, sqrt5, sqrt5, 13.4536, 140.0143] at position 3.8)
    assert q.radii_quantiles["q0.95"] == pytest.approx(114.702, rel=1e-3)


def test_quality_sample_fraction_full_sample_matches():
    """sample_fraction that rounds to m = n must reproduce the full
    estimator exactly (exact-search radii == graph radii)."""
    y = np.array([[0.0, 0.0], [1.0, 0.0], [0.0, 2.0],
                  [10.0, 10.0], [100.0, 100.0]], np.float32)
    indices = np.array([[1, 2], [0, 2], [0, 1], [0, 1], [0, 1]], np.int32)
    g = KGraph(indices=jnp.asarray(indices),
               dists=jnp.ones_like(jnp.asarray(y[:, :2])))
    q_full = quality_estimate(g, y, nbng=2)
    q_samp = quality_estimate(g, y, nbng=2, sample_fraction=0.9999)
    assert q_samp.nb_sampled == 5
    assert q_samp.nb_without_match == q_full.nb_without_match
    assert q_samp.mean_nb_matched == pytest.approx(q_full.mean_nb_matched)
    assert q_samp.median_ratio == pytest.approx(q_full.median_ratio,
                                                abs=1e-6)


def test_quality_sample_fraction_subsample(rng):
    """A genuine subsample stays statistically close to the full run."""
    x = rng.normal(size=(600, 5)).astype(np.float32)
    g = graph_of(x, k=6)
    y = x[:, :2]
    q_full = quality_estimate(g, y, nbng=10)
    q_sub = quality_estimate(g, y, nbng=10, sample_fraction=0.5, seed=3)
    assert q_sub.nb_sampled == 300
    assert q_sub.sample_ids is not None and len(q_sub.sample_ids) == 300
    assert abs(q_sub.mean_nb_matched - q_full.mean_nb_matched) < 1.0
    assert abs(q_sub.frac_without_match - q_full.frac_without_match) < 0.15


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


def test_quality_ignores_inherited_bf16_dtype(rng):
    """quality_estimate must force float32 panels for the embedded
    rebuild even when the caller's ORIGINAL-space KnnParams carry
    dtype='bfloat16' (at d=2 the L2 cancellation under bf16 corrupts
    candidate selection and inflates the radius ~4x — PERF.md 'quality
    radius was precision-inflated')."""
    from annembed_tpu.estimators.quality import quality_estimate
    from annembed_tpu.knn.brute import knn_graph_brute
    from annembed_tpu.graph.kgraph import KGraph
    from annembed_tpu.params import KnnParams
    x = rng.normal(size=(500, 6)).astype(np.float32)
    idx, dist = knn_graph_brute(x, k=5)
    g = KGraph(indices=idx, dists=dist)
    y = rng.normal(size=(500, 2)).astype(np.float32)
    q_f32 = quality_estimate(g, y, nbng=20,
                             knn_params=KnnParams(dtype="float32"))
    q_bf = quality_estimate(g, y, nbng=20,
                            knn_params=KnnParams(dtype="bfloat16"))
    assert q_f32.nb_without_match == q_bf.nb_without_match
    assert q_f32.mean_nb_matched == q_bf.mean_nb_matched
    assert q_f32.median_ratio == q_bf.median_ratio


def test_quality_radius_k_compat_mode(rng):
    """radius_k (the adjacency-equivalent radius emulation) must
    default to nbng exactly and monotonically rescue no-match nodes as
    it grows (a larger exact-NN radius can only add matches)."""
    from annembed_tpu.estimators.quality import quality_estimate
    from annembed_tpu.knn.brute import knn_graph_brute
    from annembed_tpu.graph.kgraph import KGraph
    x = rng.normal(size=(400, 6)).astype(np.float32)
    idx, dist = knn_graph_brute(x, k=5)
    g = KGraph(indices=idx, dists=dist)
    y = rng.normal(size=(400, 2)).astype(np.float32)
    q_def = quality_estimate(g, y, nbng=10)
    q_same = quality_estimate(g, y, nbng=10, radius_k=10)
    assert q_def.nb_without_match == q_same.nb_without_match
    assert q_def.median_ratio == q_same.median_ratio
    q_adj = quality_estimate(g, y, nbng=10, radius_k=25)
    assert q_adj.nb_without_match <= q_def.nb_without_match
    assert q_adj.mean_nb_matched >= q_def.mean_nb_matched
    # sampled path honors radius_k too
    q_s = quality_estimate(g, y, nbng=10, radius_k=25,
                           sample_fraction=0.5, seed=3)
    assert 0 <= q_s.nb_without_match <= 400
