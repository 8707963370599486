"""A/B the in-situ overhead of the packed BERT layer stack (R=256, P=128).

profile_bert showed: GEMMs at roofline (27.7 ms), flash kernel 10.8 ms,
embed 4 ms — but full_flash = 69.3 ms, so ~27 ms is LN/gelu/residual/
relayout glue. This probe builds a realistic 12-layer stack with toggles
and times each variant chained-amortized to attribute that glue:

  base        full layer: QKV+O+FFN GEMMs, kernel attn, residuals, LN, gelu(erf)
  gelu_tanh   gelu approximate=True
  gelu_none   identity in place of gelu
  ln_none     LayerNorms removed
  ln_fp32     LN computed in fp32 (cast up/down) -- is production doing this?
  no_relayout kernel fed/returned in [R,NH,P,Dh] without per-layer transpose
              (transpose hoisted outside: only valid timing-wise)

Usage: python scripts/profile_bert_ab.py
"""
from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    import os
    os.makedirs("/tmp/jax_cache", exist_ok=True)
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    import jax.numpy as jnp
    import flax.linen as nn

    from medtok_tpu.ops.flash_attention import packed_segment_attention

    R, P, H, I, NH, NL = 256, 128, 768, 3072, 12, 12
    Dh = H // NH
    rng = np.random.default_rng(0)

    x0 = jnp.asarray(rng.standard_normal((R, P, H)) * 0.02, jnp.bfloat16)
    seg = jnp.asarray(
        (np.arange(P)[None, :] // 16 + 1).repeat(R, 0), jnp.int32)
    Wqkv = jnp.asarray(rng.standard_normal((NL, H, 3 * H)) * 0.02, jnp.bfloat16)
    Wo = jnp.asarray(rng.standard_normal((NL, H, H)) * 0.02, jnp.bfloat16)
    W1 = jnp.asarray(rng.standard_normal((NL, H, I)) * 0.02, jnp.bfloat16)
    W2 = jnp.asarray(rng.standard_normal((NL, I, H)) * 0.02, jnp.bfloat16)

    def ln(x, mode):
        if mode == "none":
            return x
        if mode == "fp32":
            xf = x.astype(jnp.float32)
            m = xf.mean(-1, keepdims=True)
            v = ((xf - m) ** 2).mean(-1, keepdims=True)
            return ((xf - m) * jax.lax.rsqrt(v + 1e-12)).astype(x.dtype)
        m = x.mean(-1, keepdims=True)
        v = ((x - m) ** 2).mean(-1, keepdims=True)
        return (x - m) * jax.lax.rsqrt(v + 1e-12)

    def make_stack(gelu_mode="erf", ln_mode="bf16", relayout=True):
        def stack(carry, x, seg):
            if not relayout:
                xh = x.reshape(R, P, NH, Dh).transpose(0, 2, 1, 3)
            for li in range(NL):
                if relayout:
                    qkv = x @ Wqkv[li]
                    q = qkv[..., :H].reshape(R, P, NH, Dh).transpose(0, 2, 1, 3)
                    k = qkv[..., H:2*H].reshape(R, P, NH, Dh).transpose(0, 2, 1, 3)
                    v = qkv[..., 2*H:].reshape(R, P, NH, Dh).transpose(0, 2, 1, 3)
                    a = packed_segment_attention(q, k, v, seg)
                    a = a.transpose(0, 2, 1, 3).reshape(R, P, H)
                    x = ln(x + a @ Wo[li], ln_mode)
                else:
                    # attention entirely in head layout; GEMMs via einsum on
                    # the head-layout tensor (contraction over (h,d))
                    qkv = jnp.einsum("rhpd,hdo->rpo", xh, Wqkv[li].reshape(NH, Dh, 3 * H))
                    q = qkv[..., :H].reshape(R, P, NH, Dh).transpose(0, 2, 1, 3)
                    k = qkv[..., H:2*H].reshape(R, P, NH, Dh).transpose(0, 2, 1, 3)
                    v = qkv[..., 2*H:].reshape(R, P, NH, Dh).transpose(0, 2, 1, 3)
                    a = packed_segment_attention(q, k, v, seg)
                    x = None
                    xh = a  # placeholder; this variant is timing-only
                    continue
                h = x @ W1[li]
                if gelu_mode == "erf":
                    h = nn.gelu(h, approximate=False)
                elif gelu_mode == "tanh":
                    h = nn.gelu(h, approximate=True)
                x = ln(x + h @ W2[li], ln_mode)
            out = x if relayout else xh
            return carry + jnp.sum(out).astype(jnp.float32)
        return jax.jit(stack)

    def chain(fn, *xs, name="", reps=8, trials=4):
        c = jnp.zeros((), jnp.float32)
        c = fn(c, *xs)
        float(c)
        best = 1e9
        for _ in range(trials):
            c = jnp.zeros((), jnp.float32)
            t0 = time.perf_counter()
            for _ in range(reps):
                c = fn(c, *xs)
            float(c)
            best = min(best, (time.perf_counter() - t0) / reps)
        print(f"leg: {name} {best*1e3:.2f} ms", file=sys.stderr, flush=True)
        return round(best * 1e3, 2)

    out = {
        "base_erf_bf16ln": chain(make_stack(), x0, seg, name="base"),
        "gelu_tanh": chain(make_stack(gelu_mode="tanh"), x0, seg, name="tanh"),
        "gelu_none": chain(make_stack(gelu_mode="none"), x0, seg, name="gelu_none"),
        "ln_none": chain(make_stack(ln_mode="none"), x0, seg, name="ln_none"),
        "ln_fp32": chain(make_stack(ln_mode="fp32"), x0, seg, name="ln_fp32"),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
