"""Fused Pallas top-k kernel vs the XLA reference (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from medtok_tpu.ops import vq
from medtok_tpu.ops.vq_pallas import fused_topk_l2


@pytest.mark.parametrize("B,N,D", [(8, 300, 64), (32, 2048, 64), (17, 2100, 64)])
def test_fused_topk_matches_reference(B, N, D):
    rng = np.random.default_rng(0)
    z = jnp.asarray(rng.normal(size=(B, D)).astype(np.float32))
    e = jnp.asarray(rng.normal(size=(N, D)).astype(np.float32))
    d = vq.squared_distance(z, e)
    ref_vals, ref_idx = vq.topk_smallest(d, 5)
    vals, idx = fused_topk_l2(z, e, k=5, tile_b=8, tile_n=256, interpret=True)
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(ref_idx))
    np.testing.assert_allclose(np.asarray(vals), np.asarray(ref_vals),
                               rtol=1e-5, atol=1e-5)


def test_fused_topk_tie_break():
    # duplicated codewords produce exact distance ties -> lowest index first
    rng = np.random.default_rng(1)
    base = rng.normal(size=(64, 16)).astype(np.float32)
    e = jnp.asarray(np.concatenate([base, base], axis=0))  # every row twice
    z = jnp.asarray(rng.normal(size=(4, 16)).astype(np.float32))
    d = vq.squared_distance(z, e)
    ref_vals, ref_idx = vq.topk_smallest(d, 5)
    vals, idx = fused_topk_l2(z, e, k=5, tile_b=8, tile_n=64, interpret=True)
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(ref_idx))
