"""Bound the hubness-weighted negative-sampling approximation.

The reference draws negatives from a hubness-weighted alias table
(embedder.rs:810-837).  The dense optimizer instead samples UNIFORM
pool negatives and multiplies each kick by the mean-normalized,
[0.25, 4]-clamped hubness weight of the negative
(optim/dense.py::prepare_dense_inputs) — same expected update when no
clamp binds, and a ~25x cheaper sweep (PERF.md).  VERDICT r2 asked for
a test that bounds the difference on a hub-heavy fixture: these tests
pin (1) exact expectation equality when weights are within the clamp
range, and (2) a bounded, direction-preserving deviation under extreme
(pathological) hub skew.
"""

import numpy as np
import jax.numpy as jnp

from annembed_tpu.graph.kgraph import KGraph
from annembed_tpu.optim.embedder import hubness_sampling_weights
from annembed_tpu.optim.ce import _common_coeff


def _expected_repulsion_field(y, indices, weights, gamma=1.0, b=1.0):
    """Exact per-node EXPECTED repulsion displacement when negatives are
    drawn with probability proportional to ``weights`` (the reference's
    weighted-draw semantics), using the production kick formula
    (optim/dense.py::_repulsion_kick_T: coeff capped at 2, pole floored
    at 1/16, self/neighbour rejection).  n is small, so the (n, n)
    pairwise form is exact — no sampling noise."""
    n, d = y.shape
    d2 = ((y[:, None, :] - y[None, :, :]) ** 2).sum(-1)      # (n, n)
    scale = np.ones((n, 1), np.float32)
    coeff = np.asarray(_common_coeff(jnp.asarray(d2), jnp.asarray(scale),
                                     b))
    rep = 1.0 / np.maximum(d2 ** 2, 1.0 / 16.0)
    c = np.minimum(gamma * coeff * rep, 2.0)                 # (n, n)
    reject = np.eye(n, dtype=bool)
    rows = np.arange(n)[:, None]
    reject[rows, indices] = True
    c = np.where(reject | (d2 <= 0.0), 0.0, c)
    p = weights / weights.sum()                              # draw proba
    # E[kick_i] = sum_j p_j * (y_i - y_j) * c_ij
    return ((y[:, None, :] - y[None, :, :])
            * (c * p[None, :])[:, :, None]).sum(axis=1)


def _clamped_importance(weights):
    """The dense optimizer's importance weights: mean-1 normalization +
    [0.25, 4] clamp (optim/dense.py::prepare_dense_inputs), divided by
    n so the uniform-draw expectation is comparable to a weighted
    draw:  E_unif[w*kick] = (1/n) sum_j clamp(w_j/mean) kick_j."""
    nw = weights / np.maximum(weights.mean(), 1e-30)
    return np.clip(nw, 0.25, 4.0) / len(weights)


def _hub_graph(rng, n, k, hub_frac=0.0, n_hubs=3):
    """kNN-shaped index table; ``hub_frac`` of all slots are redirected
    to ``n_hubs`` mega-hub nodes (in-degree ~ hub_frac*n*k/n_hubs)."""
    idx = rng.integers(0, n, size=(n, k)).astype(np.int32)
    # no self edges
    idx = np.where(idx == np.arange(n)[:, None], (idx + 1) % n, idx)
    if hub_frac > 0.0:
        m = rng.random(size=(n, k)) < hub_frac
        idx = np.where(m, rng.integers(0, n_hubs, size=(n, k)), idx)
    dist = np.sort(rng.random(size=(n, k)).astype(np.float32), axis=1)
    return KGraph(indices=jnp.asarray(idx), dists=jnp.asarray(dist))


def test_importance_weights_equal_weighted_draws_when_unclamped(rng):
    """With realistic in-degree skew (all weights inside [0.25, 4] of
    the mean) the clamped-importance expectation is EXACTLY the
    weighted-draw expectation."""
    n, k = 1200, 6
    g = _hub_graph(rng, n, k, hub_frac=0.0)
    # skewed but clamp-free weight profile (a random graph's raw
    # in-degree tail dips below 0.25x mean, which is what the clamp is
    # for — the identity under test is about the unclamped regime)
    w = rng.uniform(1.0, 3.0, size=n)
    nw = w / w.mean()
    assert nw.min() >= 0.25 and nw.max() <= 4.0, "fixture must not clamp"
    y = rng.normal(size=(n, 2)).astype(np.float32)
    idx = np.asarray(g.indices)
    e_ref = _expected_repulsion_field(y, idx, w)
    # uniform draws x importance weight: E = sum_j q_j kick_j with
    # q = clamp(w/mean)/n == w/sum(w) when unclamped
    q = _clamped_importance(w)
    e_ours = _expected_repulsion_field(y, idx, q * len(q))
    np.testing.assert_allclose(e_ours, e_ref, rtol=1e-5, atol=1e-8)


def test_clamp_deviation_bounded_on_extreme_hubs(rng):
    """Pathological skew: 3 mega-hubs absorb ~35% of all edges
    (in-degree ~ 1400x the mean — far beyond any measured dataset;
    MNIST's largest hub is ~20x, PERF.md).  The clamp then deliberately
    caps the hubs' repulsion mass at 4x mean; the test pins that the
    expected-field deviation stays bounded and direction-preserving."""
    n, k = 1500, 6
    g = _hub_graph(rng, n, k, hub_frac=0.35, n_hubs=3)
    w = np.asarray(hubness_sampling_weights(g), np.float64)
    nw = w / w.mean()
    assert nw.max() > 50.0, "fixture must be extremely hub-skewed"
    y = rng.normal(size=(n, 2)).astype(np.float32)
    idx = np.asarray(g.indices)
    e_ref = _expected_repulsion_field(y, idx, w)
    q = _clamped_importance(w)
    e_ours = _expected_repulsion_field(y, idx, q * len(q))

    # (1) the global expected-field deviation is bounded by the clamped
    # probability mass: |sum p_j - clamp_j| of the draw distribution
    # (measured 0.47 at clipped mass 0.35 on this fixture)
    clipped_mass = np.abs(w / w.sum() - q).sum()
    num = np.linalg.norm(e_ours - e_ref)
    den = np.linalg.norm(e_ref)
    assert num / den <= 2.0 * clipped_mass + 0.05, (
        f"deviation {num / den:.3f} vs clamped mass {clipped_mass:.3f}")
    # (2) kicks keep their direction where the field is non-negligible
    # (near-zero fields — hub pull balancing the bulk — can rotate, so
    # the direction check is magnitude-weighted / conditioned)
    mag = np.linalg.norm(e_ref, axis=1)
    cos = ((e_ours * e_ref).sum(1)
           / np.maximum(np.linalg.norm(e_ours, axis=1) * mag, 1e-18))
    assert (cos * mag).sum() / mag.sum() > 0.85
    # no outright direction flips among the significant fields
    sel = mag >= np.median(mag)
    assert (cos[sel] < 0.0).mean() < 0.02


def test_clamp_deviation_small_at_realistic_hub_skew(rng):
    """At a measured-dataset-like skew (largest hub ~20x the mean
    in-degree — MNIST territory) the clamp binds on a tiny probability
    mass: the expected repulsion field deviates by well under 15% and
    its direction is preserved almost everywhere."""
    n, k = 1500, 6
    g = _hub_graph(rng, n, k, hub_frac=0.067, n_hubs=5)
    w = np.asarray(hubness_sampling_weights(g), np.float64)
    assert 10.0 < (w / w.mean()).max() < 50.0
    y = rng.normal(size=(n, 2)).astype(np.float32)
    idx = np.asarray(g.indices)
    e_ref = _expected_repulsion_field(y, idx, w)
    q = _clamped_importance(w)
    e_ours = _expected_repulsion_field(y, idx, q * len(q))
    rel = np.linalg.norm(e_ours - e_ref) / np.linalg.norm(e_ref)
    assert rel < 0.15, f"relative deviation {rel:.3f}"
    mag = np.linalg.norm(e_ref, axis=1)
    cos = ((e_ours * e_ref).sum(1)
           / np.maximum(np.linalg.norm(e_ours, axis=1) * mag, 1e-18))
    assert (cos * mag).sum() / mag.sum() > 0.99


def test_prepare_dense_inputs_builds_the_clamped_weights(rng):
    """The production prologue must produce exactly
    clamp(w/mean, 0.25, 4) in relabeled order — pins the semantics the
    two tests above analyze to the code that ships."""
    from annembed_tpu.optim.dense import prepare_dense_inputs
    from annembed_tpu.graph.proba import NodeParams
    from annembed_tpu.params import EmbedderParams
    n, k = 800, 6
    g = _hub_graph(rng, n, k, hub_frac=0.3, n_hubs=2)
    w = np.asarray(hubness_sampling_weights(g), np.float64)
    probas = np.full((n, k), 1.0 / k, np.float32)
    scale = np.full((n,), 0.3, np.float32)
    npar = NodeParams(probas=jnp.asarray(probas), scale=jnp.asarray(scale))
    y0 = rng.normal(size=(n, 2)).astype(np.float32)
    out = prepare_dense_inputs(y0, g, npar, EmbedderParams(), n_sub=60,
                               n_groups=2, neg_weights=w)
    neg_weight, inv = np.asarray(out[7]), np.asarray(out[10])
    expect = np.clip(w / w.mean(), 0.25, 4.0)
    np.testing.assert_allclose(neg_weight[inv], expect, rtol=1e-6)
