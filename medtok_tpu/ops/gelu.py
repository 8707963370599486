"""Fast exact-class gelu for the bf16 BERT forward.

The reference's text encoder is HF bert-base, whose activation is EXACT
(erf-based) gelu (reference: tokenizer.py:75 loads bert-base-uncased;
HF BertConfig hidden_act="gelu").  On TPU, XLA lowers ``lax.erfc`` to a
high-degree branchy rational: measured 21.6 ms for the 12 FFN activations
of the packed export forward ([32768, 3072] bf16), ~30% of the whole
12-layer encoder — while the hardware-accelerated ``tanh`` lowering costs
5.2 ms for the same traffic.

``gelu_bf16`` replaces erfc with a tanh-composed minimax fit, valid AT
BF16 RESOLUTION (the dtype of the packed production forward):

    gelu(x) = 0.5 * x * (1 + tanh(p(x))),   p = degree-11 minimax fit of
    atanh(2*Phi(x) - 1) over x in [-8.6, 2.8], weighted by the local
    sensitivity (1 - tanh) so the negative tail (where 1+tanh ~ 2*exp(2p)
    must track erfc's exp decay in RELATIVE terms) is fit tightest.

Outside the window the function saturates in bf16 and two selects take
over, with DIFFERENT guarantees:

- upper, x > 2.765625: returns x, which IS the round-to-nearest bf16 of
  gelu(x) for every such input (exhaustive check over all finite bf16) —
  exact in the rounding sense;
- lower, x < -7.76: returns a POLICY ZERO. Round-to-nearest bf16 truth is
  still nonzero for the 13 bf16 values in [-8.3125, -7.76) (truth up to
  2.8e-14), so this select is an intentional flush-to-zero of
  sub-visibility magnitudes, not exact rounding. |gelu(x)| <= 3e-14 there
  — thirteen orders below any O(1) activation, invisible through the bf16
  FFN matmul that consumes it. The cutoff sits at -7.76 rather than the
  representability edge (~-8.3) because between -7.8 and -8.3 the
  degree-11 Horner evaluation is fma-contraction-sensitive (terms of
  O(30) cancel to O(20)): the tail's last few bf16 outputs differ by
  dozens of ulps between backends, while every magnitude >= 4e-14 stays
  single-ulp on all of them.

Accuracy, measured exhaustively over all 65536 bf16 inputs against
float64 truth rounded-to-nearest-bf16 (scripts/profile_bert_ab.py probe,
TPU v5e, 2026-08-19):

    variant               wrong-bf16   >1ulp   max abs err     ms/12 layers
    XLA erfc (production) 716          593     0.0078 (=res.)  21.6
    this fit              878          687     0.0089          9.4
    tanh approximate=True 977          757     0.0082          5.2

i.e. the fit sits in the SAME half-ulp accuracy class as XLA's own bf16
erfc lowering (whose >1-ulp cases are subnormal-flush artifacts shared by
every variant), 2.3x faster.  The fp32 path keeps ``nn.gelu(exact)``
untouched — every torch-parity oracle runs fp32 and is byte-identical to
before.  Exhaustive-accuracy regression: tests/test_gelu.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# Horner coefficients (lowest first) of the degree-11 fit of
# atanh(2*Phi(x)-1) over [-8.6, 2.8]; see module docstring.
_P_COEF = (
    -0.0002957637269433988,
    0.7984603321101655,
    0.0020689632319751267,
    0.03641572140447887,
    -0.0015558347387300137,
    -0.000591322353090317,
    0.00020868589366660118,
    7.070647809280037e-05,
    6.631853369528119e-06,
    -2.213750333938961e-08,
    -3.7270747091005305e-08,
    -1.600752329195683e-09,
)

# bf16 saturation thresholds: gelu(x) rounds to x above (exhaustive over
# all finite bf16); below, |truth| <= 3e-14 and the op returns 0 (see
# module docstring for why the cutoff is -7.76, not the representability
# edge at ~-8.3).
_X_HI = 2.77
_X_LO = -7.76


def gelu_bf16(x: jax.Array) -> jax.Array:
    """Exact-class gelu at bf16 resolution via a tanh-composed minimax fit.

    Input of any float dtype; the polynomial+tanh run in fp32 and the
    result is cast back.  Only intended (and only dispatched by callers)
    for bf16 activations — use ``nn.gelu(x, approximate=False)`` for fp32.

    The x < _X_LO select flushes the BACKWARD pass to zero there too (the
    ``where`` zeroes the cotangent): true gelu'(x) is O(1e-13) below the
    cutoff, negligible at bf16 resolution but an additional behavioral
    difference from the erfc path beyond the forward value.
    """
    xf = x.astype(jnp.float32)
    q = jnp.float32(_P_COEF[-1])
    for c in _P_COEF[-2::-1]:
        q = q * xf + jnp.float32(c)
    # 0.5*(1 + tanh(q)) == sigmoid(2q) exactly; the sigmoid form keeps full
    # RELATIVE accuracy down the negative tail (fp32 `1 + tanh(q)` cancels
    # to 0 once q < -8.5, i.e. x < ~-4, where truth is ~1e-5 — still a
    # bf16-visible magnitude at that point).
    y = xf * jax.nn.sigmoid(2.0 * q)
    y = jnp.where(xf > np.float32(_X_HI), xf, y)
    y = jnp.where(xf < np.float32(_X_LO), jnp.float32(0.0), y)
    return y.astype(x.dtype)


def bert_gelu(x: jax.Array) -> jax.Array:
    """Dispatch: poly-tanh fit for bf16 activations, exact erfc otherwise.

    The bf16 fit is in the same half-ulp accuracy class as XLA's bf16
    erfc (see module docstring) at 2.3x the speed; fp32 (parity oracles,
    converters) keeps the canonical exact lowering.
    """
    if x.dtype == jnp.bfloat16:
        return gelu_bf16(x)
    return jax.nn.gelu(x, approximate=False)
