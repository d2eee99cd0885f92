"""CE optimizer tests: gradient math against a per-sample oracle,
cross-entropy decrease on real structure, end-to-end smoke (the
reference's mini_embed_full, embedder.rs:1435-1467), hierarchical path.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from annembed_tpu.knn.brute import knn_graph_brute
from annembed_tpu.graph.kgraph import KGraph
from annembed_tpu.graph.proba import to_proba_edges
from annembed_tpu.optim.ce import (build_edge_set, ce_value,
                                   minibatch_update,
                                   embedded_scales_from_initial,
                                   run_entropy_optimization)
from annembed_tpu.optim.embedder import Embedder, set_data_box
from annembed_tpu.params import EmbedderParams, PROBA_MIN


def blobs(rng, n_per=100, d=10, n_c=3, sep=10.0):
    centers = rng.normal(size=(n_c, d)) * sep
    x = np.concatenate([centers[i] + rng.normal(size=(n_per, d))
                        for i in range(n_c)])
    labels = np.repeat(np.arange(n_c), n_per)
    return x.astype(np.float32), labels


def make_setup(rng, n_per=100, k=8):
    x, labels = blobs(rng, n_per=n_per)
    idx, dist = knn_graph_brute(x, k=k)
    g = KGraph(indices=idx, dists=dist)
    npar = to_proba_edges(g)
    es = build_edge_set(g, npar)
    return x, labels, g, npar, es


def test_embedded_scales_formula():
    scale = jnp.array([1.0, 2.0, 100.0, 0.001])
    emb = np.asarray(embedded_scales_from_initial(scale))
    mean = float(scale.mean())
    expected = 0.2 * np.clip(np.asarray(scale) / mean, 0.25, 4.0)
    np.testing.assert_allclose(emb, expected, rtol=1e-6)


def test_ce_value_against_oracle(rng):
    _, _, g, npar, es = make_setup(rng, n_per=30, k=5)
    n = g.nb_nodes
    y = rng.normal(size=(n, 2)).astype(np.float32)
    got = float(ce_value(jnp.asarray(y), es, b=1.0))
    # per-edge oracle
    probas = np.asarray(npar.probas)
    scales = np.asarray(es.embedded_scale)
    indices = np.asarray(g.indices)
    total = 0.0
    for i in range(n):
        for jj in range(5):
            j = indices[i, jj]
            w = probas[i, jj]
            d2 = ((y[i] - y[j]) ** 2).sum() / scales[i] ** 2
            we = min(1.0 / (1.0 + d2), 1 - 1e-7)
            total += -w * np.log(we) - (1 - w) * np.log(1 - we)
    np.testing.assert_allclose(got, total, rtol=1e-4)


def test_minibatch_update_moves_points(rng):
    _, _, g, npar, es = make_setup(rng, n_per=50, k=5)
    n = g.nb_nodes
    y0 = jnp.asarray(rng.normal(size=(n, 2)).astype(np.float32))
    y1 = minibatch_update(y0, jax.random.PRNGKey(0), es,
                          jnp.float32(1.0), 1.0, 256)
    assert np.isfinite(np.asarray(y1)).all()
    assert float(jnp.abs(y1 - y0).max()) > 0.0


def test_optimization_decreases_ce(rng):
    # start from a wide box (the reference init is a size-10 box,
    # embedder.rs:345): CE decreases as neighbours are pulled together
    _, _, g, npar, es = make_setup(rng, n_per=100, k=8)
    n = g.nb_nodes
    y0 = jnp.asarray(rng.uniform(-5, 5, size=(n, 2)).astype(np.float32))
    params = EmbedderParams(nb_grad_batch=10, nb_sampling_by_edge=10,
                            batch_size=2048, grad_step=2.0)
    y, info = run_entropy_optimization(y0, es, params)
    assert np.isfinite(np.asarray(y)).all()
    assert info["final_ce"] < info["initial_ce"], info


def test_one_step_embed_separates_blobs(rng):
    x, labels, g, *_ = make_setup(rng, n_per=120, k=8)
    emb = Embedder.new(g, EmbedderParams(nb_grad_batch=15, batch_size=4096))
    y = np.asarray(emb.embed())
    assert y.shape == (360, 2)
    assert np.isfinite(y).all()
    mus = np.stack([y[labels == i].mean(0) for i in range(3)])
    d_to = np.linalg.norm(y[:, None] - mus[None], axis=-1)
    acc = (d_to.argmin(1) == labels).mean()
    assert acc > 0.9, f"cluster accuracy {acc}"


def test_mini_embed_full_smoke(rng):
    # reference mini_embed_full: 500 random points dim 20, asserts Ok
    x = rng.normal(size=(500, 20)).astype(np.float32)
    idx, dist = knn_graph_brute(x, k=10)
    g = KGraph(indices=idx, dists=dist)
    emb = Embedder.new(g, EmbedderParams(nb_grad_batch=5, batch_size=2048))
    y = np.asarray(emb.embed())
    assert y.shape == (500, 2)
    assert np.isfinite(y).all()
    assert emb.info["final_ce"] < emb.info["initial_ce"]


def test_random_init_path(rng):
    x, labels, g, *_ = make_setup(rng, n_per=60, k=6)
    p = EmbedderParams(dmap_init=False, nb_grad_batch=5, batch_size=1024)
    y = np.asarray(Embedder.new(g, p).embed())
    assert np.isfinite(y).all()


def test_hubness_weighted_negatives(rng):
    x, labels, g, *_ = make_setup(rng, n_per=60, k=6)
    p = EmbedderParams(hubness_weighting=True, nb_grad_batch=5,
                       batch_size=1024)
    y = np.asarray(Embedder.new(g, p).embed())
    assert np.isfinite(y).all()


def test_set_data_box():
    data = jnp.asarray(np.array([[5.0, 1.0], [7.0, -3.0], [9.0, 2.0]],
                                np.float32))
    out = np.asarray(set_data_box(data, 10.0))
    assert abs(np.abs(out).max() - 5.0) < 1e-5
    np.testing.assert_allclose(out.mean(0), 0.0, atol=2e-5)


@pytest.mark.slow
def test_h_embed(rng):
    from annembed_tpu.knn.hierarchy import build_projection
    x, labels = blobs(rng, n_per=150, d=8)
    proj = build_projection(x, knbn=8, sample_fraction=0.2)
    assert proj.nb_small >= 0.15 * len(x)
    # sampled points project to themselves
    pd = np.asarray(proj.proj_dist)
    sids = np.asarray(proj.sample_ids)
    assert (pd[sids] == 0).all()
    emb = Embedder.from_hkgraph(proj, EmbedderParams(
        nb_grad_batch=5, grad_factor=2, batch_size=1024))
    y = np.asarray(emb.embed())
    assert y.shape == (len(x), 2)
    assert np.isfinite(y).all()
    mus = np.stack([y[labels == i].mean(0) for i in range(3)])
    d_to = np.linalg.norm(y[:, None] - mus[None], axis=-1)
    acc = (d_to.argmin(1) == labels).mean()
    assert acc > 0.85, f"cluster accuracy {acc}"


def test_optimize_segmenting_matches_single_scan(rng, monkeypatch):
    """Splitting the scan into bounded segments must not change the
    result (same keys, same schedule; padding steps are gamma=0)."""
    from annembed_tpu.optim import ce as C
    _, _, g, npar, es = make_setup(rng, n_per=40, k=5)
    y0 = jnp.asarray(rng.uniform(-3, 3, (120, 2)).astype(np.float32))
    key = jax.random.PRNGKey(3)
    y_full = C.optimize(y0, es, key, 1.0, 1.0, batch_size=256,
                        steps_per_batch=7, nb_grad_batch=4)
    monkeypatch.setattr(C, "MAX_STEPS_PER_PROGRAM", 5)
    y_seg = C.optimize(y0, es, key, 1.0, 1.0, batch_size=256,
                       steps_per_batch=7, nb_grad_batch=4)
    # same total update magnitude and finiteness; keys are split
    # identically so results should agree exactly
    np.testing.assert_allclose(np.asarray(y_seg), np.asarray(y_full),
                               atol=1e-5)
