"""Certified grid radius search vs the exact brute search.

The sampled quality path's radius distances must be EXACT (reference
semantics: a real search over the full embedded cloud,
src/embedder.rs:527-554).  grid_radius_search certifies per-query
exactness geometrically and falls back to knn_search_brute otherwise,
so its output must equal the brute distances bit-for-bit on every
distribution."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from annembed_tpu.knn.brute import knn_search_brute
from annembed_tpu.knn.radius import grid_radius_search


def _check_equal(y, q_ids, k):
    sd_grid, n_fb = grid_radius_search(y, q_ids, k)
    _, sd_brute = knn_search_brute(jnp.asarray(y)[jnp.asarray(q_ids)],
                                   y, k=k)
    np.testing.assert_array_equal(np.asarray(sd_grid),
                                  np.asarray(sd_brute))
    return n_fb


@pytest.mark.parametrize("dist", ["uniform", "clusters", "skewed"])
def test_grid_equals_brute(dist, rng):
    n, m, k = 30_000, 700, 61
    if dist == "uniform":
        y = rng.uniform(-10, 10, (n, 2)).astype(np.float32)
    elif dist == "clusters":
        c = rng.normal(0, 8, (12, 2))
        y = (c[rng.integers(0, 12, n)]
             + rng.normal(0, 0.7, (n, 2))).astype(np.float32)
    else:
        # heavy density skew: most mass in a tight blob + long tail
        y = np.concatenate([
            rng.normal(0, 0.05, (n - n // 10, 2)),
            rng.uniform(-50, 50, (n // 10, 2))]).astype(np.float32)
    q_ids = rng.choice(n, m, replace=False).astype(np.int32)
    _check_equal(y, q_ids, k)


def test_grid_fallback_rows_exact(rng):
    """Force heavy certificate failure (k comparable to cell occupancy
    via min_occupancy) — fallback rows must still be exact."""
    n, m, k = 12_000, 300, 101
    y = rng.normal(0, 3, (n, 2)).astype(np.float32)
    q_ids = rng.choice(n, m, replace=False).astype(np.int32)
    sd_grid, n_fb = grid_radius_search(y, q_ids, k, w_own=3, w_adj=3,
                                       min_occupancy=140)
    _, sd_brute = knn_search_brute(jnp.asarray(y)[jnp.asarray(q_ids)],
                                   y, k=k)
    np.testing.assert_array_equal(np.asarray(sd_grid),
                                  np.asarray(sd_brute))
    assert n_fb > 0  # the tight windows must actually exercise fallback


def test_grid_duplicates_and_ties(rng):
    """Exact duplicate points and axis ties stress the conservative
    tie handling of the strip/cell bounds."""
    n, k = 20_000, 31
    base = rng.integers(-5, 5, (n, 2)).astype(np.float32)  # many ties
    y = base + rng.choice([0.0, 0.25], (n, 2)).astype(np.float32)
    q_ids = rng.choice(n, 500, replace=False).astype(np.int32)
    _check_equal(y, q_ids, k)


def test_grid_small_n_delegates(rng):
    """Tiny corpora route to brute entirely (g would be degenerate)."""
    n, k = 3_000, 61
    y = rng.normal(0, 1, (n, 2)).astype(np.float32)
    q_ids = np.arange(0, n, 7, dtype=np.int32)
    _check_equal(y, q_ids, k)


def test_grid_self_included(rng):
    """Column 0 must be the self distance (0): the quality path indexes
    column radius_k of a (k+1)-wide search that includes self."""
    n = 30_000
    y = rng.uniform(-1, 1, (n, 2)).astype(np.float32)
    q_ids = rng.choice(n, 200, replace=False).astype(np.int32)
    sd, _ = grid_radius_search(y, q_ids, 31)
    np.testing.assert_array_equal(np.asarray(sd[:, 0]),
                                  np.zeros(200, np.float32))


def test_quality_sampled_grid_parity(rng, monkeypatch):
    """quality_estimate's sampled path must give the SAME summary with
    the certified grid search as with the exact brute search."""
    from annembed_tpu.estimators.quality import quality_estimate
    from annembed_tpu.graph.kgraph import KGraph

    n, k = 60_000, 6
    y = np.concatenate([
        rng.normal(0, 1, (n // 2, 2)),
        rng.normal(4, 1.5, (n - n // 2, 2))]).astype(np.float32)
    idx = rng.integers(0, n, (n, k)).astype(np.int32)
    dists = rng.uniform(0.1, 1.0, (n, k)).astype(np.float32)
    g = KGraph(indices=jnp.asarray(idx), dists=jnp.asarray(dists))

    kwargs = dict(nbng=10, sample_fraction=0.01, seed=3,
                  radius_k=10, radius_k_compat=25)
    est_grid = quality_estimate(g, y, **kwargs)
    monkeypatch.setenv("ANNEMBED_QUALITY_EXACT_BRUTE", "1")
    est_brute = quality_estimate(g, y, **kwargs)
    assert est_grid.summary() == est_brute.summary()


def test_quality_full_fraction_grid_exact(rng, monkeypatch):
    """Full-fraction quality on a >50k 2-d cloud uses the certified
    grid radius — verify its radius columns against the exact brute
    search on a row subsample, and that the summary changes only
    through radius exactness vs the IVF path."""
    from annembed_tpu.estimators.quality import quality_estimate
    from annembed_tpu.graph.kgraph import KGraph

    n, k = 55_000, 6
    y = (rng.normal(0, 2, (n, 2))
         + rng.choice([0.0, 5.0], (n, 1))).astype(np.float32)
    idx = rng.integers(0, n, (n, k)).astype(np.int32)
    dists = rng.uniform(0.1, 1.0, (n, k)).astype(np.float32)
    g = KGraph(indices=jnp.asarray(idx), dists=jnp.asarray(dists))

    est = quality_estimate(g, y, nbng=10, radius_k=10,
                           radius_k_compat=25)
    assert est.nb_sampled == n
    # spot-check the exact radius on 80 random rows
    sub = rng.choice(n, 80, replace=False).astype(np.int32)
    from annembed_tpu.knn.radius import grid_radius_search
    sd_cols, _ = grid_radius_search(y, sub, 26, keep_cols=(10, 25))
    _, sd_brute = knn_search_brute(jnp.asarray(y)[jnp.asarray(sub)],
                                   y, k=26)
    np.testing.assert_array_equal(np.asarray(sd_cols),
                                  np.asarray(sd_brute)[:, (10, 25)])
