"""Entropy tools for discrete probability distributions.

Rebuilds reference src/tools/entropy.rs: Renyi/Shannon entropy (:99)
and relative Renyi entropy (:151) of discrete probabilities.
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-30


def _normalize(p):
    p = jnp.asarray(p, jnp.float32)
    s = jnp.sum(p)
    return p / jnp.maximum(s, _EPS)


def shannon_entropy(p) -> jnp.ndarray:
    """H(p) = -sum p ln p (entropy.rs DiscreteProba::entropy order 1)."""
    p = _normalize(p)
    return -jnp.sum(jnp.where(p > 0, p * jnp.log(jnp.maximum(p, _EPS)), 0.0))


def renyi_entropy(p, order: float) -> jnp.ndarray:
    """Renyi entropy of the given order; order 1 falls back to Shannon
    (entropy.rs:99)."""
    if order <= 0:
        raise ValueError("order must be > 0")
    if abs(order - 1.0) < 1e-9:
        return shannon_entropy(p)
    p = _normalize(p)
    s = jnp.sum(jnp.power(jnp.maximum(p, _EPS), order) * (p > 0))
    return jnp.log(jnp.maximum(s, _EPS)) / (1.0 - order)


def relative_renyi_entropy(p, q, order: float) -> jnp.ndarray:
    """Renyi divergence D_a(p || q) (entropy.rs:151); order 1 is the
    Kullback-Leibler divergence."""
    p = _normalize(p)
    q = _normalize(q)
    if abs(order - 1.0) < 1e-9:
        return jnp.sum(jnp.where(
            p > 0, p * jnp.log(jnp.maximum(p, _EPS)
                               / jnp.maximum(q, _EPS)), 0.0))
    s = jnp.sum(jnp.where(
        p > 0,
        jnp.power(jnp.maximum(p, _EPS), order)
        * jnp.power(jnp.maximum(q, _EPS), 1.0 - order), 0.0))
    return jnp.log(jnp.maximum(s, _EPS)) / (order - 1.0)


def perplexity(p) -> jnp.ndarray:
    """Hill number exp(H) (nodeparam.rs:88-91)."""
    return jnp.exp(shannon_entropy(p))
