"""Pallas kernel tests (interpret mode on CPU; compiled on TPU)."""

import numpy as np
import jax.numpy as jnp

from annembed_tpu.ops.top1 import top1_l2


def test_top1_matches_oracle(rng):
    q = rng.normal(size=(300, 16)).astype(np.float32)
    c = rng.normal(size=(500, 16)).astype(np.float32)
    idx, dist = top1_l2(q, c, block_q=128, tile_m=256, interpret=True)
    d2 = ((q[:, None, :] - c[None, :, :]) ** 2).sum(-1)
    ref_idx = d2.argmin(1)
    np.testing.assert_array_equal(np.asarray(idx), ref_idx)
    np.testing.assert_allclose(np.asarray(dist),
                               np.sqrt(d2[np.arange(300), ref_idx]),
                               rtol=1e-3, atol=1e-4)


def test_top1_padded_shapes(rng):
    # nq and m not multiples of the blocks; padded corpus must not win
    q = rng.normal(size=(77, 5)).astype(np.float32)
    c = rng.normal(size=(131, 5)).astype(np.float32) + 10.0
    idx, dist = top1_l2(q, c, block_q=32, tile_m=64, interpret=True)
    d2 = ((q[:, None, :] - c[None, :, :]) ** 2).sum(-1)
    np.testing.assert_array_equal(np.asarray(idx), d2.argmin(1))
    assert (np.asarray(idx) < 131).all()
