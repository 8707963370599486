"""Exhaustive bf16 accuracy of the fast gelu (ops/gelu.py).

bf16 has only 65536 values, so "accurate at bf16 resolution" is a finite,
fully checkable claim: for EVERY finite bf16 input, compare against
float64 truth rounded to nearest bf16.  The thresholds mirror the measured
accuracy of XLA's own bf16 erfc lowering on TPU (716 wrong-bf16 values,
half-ulp max abs err — see ops/gelu.py docstring): the fit must stay in
that same class on every backend these tests run on.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import ml_dtypes
import numpy as np
import pytest


def _truth_bf16():
    u = np.arange(65536, dtype=np.uint16)
    x = u.view(ml_dtypes.bfloat16).astype(np.float64)
    finite = np.isfinite(x)
    try:
        from scipy import special

        erf = special.erf
    except ImportError:  # pragma: no cover
        erf = np.vectorize(math.erf)
    t = 0.5 * x * (1.0 + erf(x / math.sqrt(2)))
    t_bf = t.astype(np.float32).astype(ml_dtypes.bfloat16)
    return u, x, finite, t, t_bf


def test_gelu_bf16_exhaustive_accuracy():
    # derive every region mask from the kernel's own cutoffs so a cutoff
    # tweak can never desynchronize the test window from the select
    from medtok_tpu.ops.gelu import _X_HI, _X_LO, gelu_bf16

    u, x64, finite, t64, t_bf = _truth_bf16()
    xall = jnp.asarray(u).view(jnp.bfloat16)
    got = np.asarray(jax.jit(gelu_bf16)(xall))

    gv = got.astype(np.float64)
    tv = t_bf.astype(np.float64)
    mism = (gv != tv) & finite
    # same class as XLA's bf16 erfc (716 wrong values on TPU): small slack
    # for backend-dependent fp32 fma contraction in the polynomial.
    assert int(mism.sum()) <= 1100, int(mism.sum())

    # absolute error vs float64 truth bounded by ~half a bf16 ulp at the
    # largest active magnitude (XLA's own erfc measures 0.0078 here)
    aerr = np.where(finite, np.abs(gv - t64), 0.0)
    assert float(aerr.max()) <= 0.010, float(aerr.max())

    # upper saturation is EXACT rounding: x IS round-to-nearest-bf16 of
    # gelu(x) for every finite bf16 above the cutoff
    hi = finite & (x64 > np.float32(_X_HI))
    np.testing.assert_array_equal(gv[hi], x64[hi])
    # lower saturation is a POLICY flush-to-zero (truth is nonzero for 13
    # bf16 inputs in [-8.3125, _X_LO), but <= 3e-14 — see ops/gelu.py)
    lo = finite & (x64 < np.float32(_X_LO))
    assert np.all(gv[lo] == 0.0)

    # every mismatch in the fit window is a SINGLE-ulp flip (big ulp
    # distances only occur below the x < _X_LO cutoff, where truth is
    # <= 3e-14 — thirteen orders below bf16 visibility next to any O(1)
    # activation — and the op returns exactly 0; between -7.8 and -8.3
    # the Horner tail is fma-contraction-sensitive, so single-ulp there
    # held on TPU but not on CPU, hence the cutoff placement)
    def okey(b):
        m = (b & 0x7FFF).astype(np.int64)
        return np.where((b >> 15) & 1 == 1, -m, m)

    du = np.abs(okey(got.view(np.uint16).astype(np.int64))
                - okey(t_bf.view(np.uint16).astype(np.int64)))
    # (subnormal inputs/outputs are excluded: the TPU flushes them to zero
    # in EVERY gelu variant including the production erfc — gelu(x)~x/2
    # there, so both truth and output are < 1.2e-38)
    window = finite & (x64 >= np.float32(_X_LO)) & (np.abs(t64) >= 1.2e-38)
    assert int(du[window].max()) <= 1, int(du[window].max())
    assert float(np.abs(t64[lo]).max()) < 1e-13


def test_bert_gelu_fp32_is_exact_erfc():
    """The fp32 dispatch is byte-identical to jax.nn.gelu(exact) — parity
    oracles and converter tests see no change."""
    from medtok_tpu.ops.gelu import bert_gelu

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(4096) * 3.0, jnp.float32)
    a = jax.jit(bert_gelu)(x)
    b = jax.jit(lambda v: jax.nn.gelu(v, approximate=False))(x)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_bert_forward_bf16_close_to_fp32_with_fast_gelu():
    """End-to-end: the bf16 BERT forward with the poly gelu stays within
    ordinary bf16 noise of the fp32 forward (same weights)."""
    from medtok_tpu.config import TextEncoderConfig
    from medtok_tpu.models.bert import BertEncoder

    cfg = TextEncoderConfig(
        vocab_size=128, hidden_size=64, num_layers=2, num_heads=4,
        intermediate_size=128, max_position_embeddings=64,
    )
    rng = np.random.default_rng(1)
    ids = jnp.asarray(rng.integers(1, 128, (4, 16)), jnp.int32)
    mask = jnp.ones((4, 16), jnp.int32)

    m32 = BertEncoder(cfg, dtype=jnp.float32)
    params = m32.init(jax.random.PRNGKey(0), ids, mask)
    out32 = m32.apply(params, ids, mask)
    m16 = BertEncoder(cfg, dtype=jnp.bfloat16)
    out16 = m16.apply(params, ids, mask)
    err = float(jnp.max(jnp.abs(out32 - out16.astype(jnp.float32))))
    assert err < 0.15, err  # bf16 accumulation noise scale for 2 layers
