"""Stochastic depth (drop-path), per-sample residual-branch dropout.

Reference surface: MedTok/utils/drop_path.py:4-33 (a torch DropPath module,
an unused vestige in the reference — kept for inventory parity). TPU-native
design: a pure function with an explicit PRNG key (JAX convention, no module
`training` flag mutation) plus a thin flax module that draws from the
standard 'dropout' RNG stream. The bernoulli mask has shape (B, 1, ..., 1)
so the whole residual branch of a sample is dropped atomically, and the
1/keep_prob rescale preserves the branch's expected value.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


def drop_path(
    rng: jax.Array,
    x: jax.Array,
    drop_prob: float,
    *,
    deterministic: bool = False,
    scale_by_keep: bool = True,
) -> jax.Array:
    """Zero the whole residual branch of each sample with prob `drop_prob`.

    Matches drop_path.py:4-21: mask shape (x.shape[0], 1, ..., 1), optional
    division by keep_prob. `deterministic=True` (eval) is the identity.
    """
    if drop_prob == 0.0 or deterministic:
        return x
    if not 0.0 <= drop_prob < 1.0:
        raise ValueError(f"drop_prob must be in [0, 1), got {drop_prob}")
    keep_prob = 1.0 - drop_prob
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    mask = jax.random.bernoulli(rng, keep_prob, shape).astype(x.dtype)
    if scale_by_keep:
        mask = mask / jnp.asarray(keep_prob, x.dtype)
    return x * mask


class DropPath(nn.Module):
    """Module form (drop_path.py:24-33); draws from the 'dropout' RNG stream
    like every other stochastic layer in this package."""

    drop_prob: float = 0.0
    scale_by_keep: bool = True

    @nn.compact
    def __call__(self, x: jax.Array, *, deterministic: bool = True) -> jax.Array:
        if self.drop_prob == 0.0 or deterministic:
            return x
        return drop_path(
            self.make_rng("dropout"),
            x,
            self.drop_prob,
            scale_by_keep=self.scale_by_keep,
        )
