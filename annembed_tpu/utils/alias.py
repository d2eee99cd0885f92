"""Walker/Vose alias tables for O(1) weighted sampling.

Replaces the reference's ``WeightedAliasIndex`` (embedder.rs:987 for
positive edges, :919 for hubness-weighted negatives).  Construction is
O(n) and runs in the native library (annembed_build_alias) when
available, with a numpy fallback; sampling on device is two gathers +
a compare (vs ~log2(E) dependent gathers for inverse-CDF search).
"""

from __future__ import annotations

import ctypes
import logging
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp

logger = logging.getLogger(__name__)


def _numpy_alias(weights: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    n = len(weights)
    total = float(weights.sum())
    if not np.isfinite(total) or total <= 0.0 or (weights < 0).any():
        raise ValueError(
            f"alias table needs finite non-negative weights with a "
            f"positive sum (sum={total})")
    scaled = weights.astype(np.float64) * (n / total)
    prob = np.ones(n, np.float32)
    alias = np.arange(n, dtype=np.int32)
    # vectorized partition; the pairing loop itself is inherently
    # sequential (Vose) — production edge counts go through the native
    # builder, this fallback is for modest n / missing .so
    small = list(np.nonzero(scaled < 1.0)[0])
    large = list(np.nonzero(scaled >= 1.0)[0])
    if n > 2_000_000 and small and large:
        logger.warning(
            "numpy alias fallback at n=%d is a Python-loop build "
            "(minutes+); build native/libannembed_native.so for the "
            "O(n) native path", n)
    while small and large:
        s = small.pop()
        l = large.pop()
        prob[s] = scaled[s]
        alias[s] = l
        scaled[l] += scaled[s] - 1.0
        (small if scaled[l] < 1.0 else large).append(l)
    return prob, alias


def build_alias_table(weights) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(prob (n,) f32, alias (n,) i32) device arrays."""
    w = np.asarray(weights, np.float32)
    n = len(w)
    from ..io.csv_io import _load_native
    lib = _load_native()
    if lib is not None and hasattr(lib, "annembed_build_alias"):
        lib.annembed_build_alias.restype = ctypes.c_int32
        lib.annembed_build_alias.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int32)]
        w_c = np.ascontiguousarray(w)
        prob = np.empty(n, np.float32)
        alias = np.empty(n, np.int32)
        rc = lib.annembed_build_alias(
            w_c.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n,
            prob.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            alias.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
        if rc == 0:
            return jnp.asarray(prob), jnp.asarray(alias)
        if rc == -3:
            # degenerate weights (zero/NaN sum): the numpy path would
            # silently build a uniform table — fail loudly instead
            raise ValueError("alias table: weight sum is zero or NaN")
        logger.warning("native alias build failed rc=%d; numpy fallback", rc)
    prob, alias = _numpy_alias(w)
    return jnp.asarray(prob), jnp.asarray(alias)


def alias_sample(key: jax.Array, prob: jnp.ndarray, alias: jnp.ndarray,
                 shape) -> jnp.ndarray:
    """Draw indices ~ weights in O(1) per draw."""
    n = prob.shape[0]
    k1, k2 = jax.random.split(key)
    idx = jax.random.randint(k1, shape, 0, n, dtype=jnp.int32)
    u = jax.random.uniform(k2, shape)
    return jnp.where(u < prob[idx], idx, alias[idx])
