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
                elif gelu_mode == "fit":
                    from medtok_tpu.ops.gelu import gelu_bf16
                    h = gelu_bf16(h)
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

    # ---- finer attribution legs (r5): where do the non-GEMM ms hide? ----
    def make_bare(attn="kernel"):
        """No LN, no gelu: GEMMs + residuals, attention selectable:
        'kernel' = transposes + packed flash; 'none' = take the q slice of
        the QKV output as the attention result (GEMM-only ceiling);
        'one_t' = single [R,P,3,NH,Dh]->[3,R,NH,P,Dh] transpose of the
        fused QKV instead of three separate ones."""
        def stack(carry, x, seg):
            for li in range(NL):
                qkv = x @ Wqkv[li]
                if attn == "none":
                    a = qkv[..., :H]
                elif attn == "one_t":
                    q3 = qkv.reshape(R, P, 3, NH, Dh).transpose(2, 0, 3, 1, 4)
                    a = packed_segment_attention(q3[0], q3[1], q3[2], seg)
                    a = a.transpose(0, 2, 1, 3).reshape(R, P, H)
                else:
                    q = qkv[..., :H].reshape(R, P, NH, Dh).transpose(0, 2, 1, 3)
                    k = qkv[..., H:2*H].reshape(R, P, NH, Dh).transpose(0, 2, 1, 3)
                    v = qkv[..., 2*H:].reshape(R, P, NH, Dh).transpose(0, 2, 1, 3)
                    a = packed_segment_attention(q, k, v, seg)
                    a = a.transpose(0, 2, 1, 3).reshape(R, P, H)
                x = x + a @ Wo[li]
                x = x + (x @ W1[li]) @ W2[li]
            return carry + jnp.sum(x).astype(jnp.float32)
        return jax.jit(stack)

    def make_einsum(split_qkv=True):
        """No LN/gelu; q/k/v produced DIRECTLY in head layout via einsum
        (weights pre-reshaped [H, NH, Dh]) and the output projection
        contracted straight from head layout — XLA folds the relayout into
        the GEMMs instead of materializing 4 transposes per layer."""
        Wq = Wqkv[:, :, :H].reshape(NL, H, NH, Dh)
        Wk = Wqkv[:, :, H:2*H].reshape(NL, H, NH, Dh)
        Wv = Wqkv[:, :, 2*H:].reshape(NL, H, NH, Dh)
        W3 = Wqkv.reshape(NL, H, 3, NH, Dh)
        Wor = Wo.reshape(NL, NH, Dh, H)

        def stack(carry, x, seg):
            for li in range(NL):
                if split_qkv:
                    q = jnp.einsum("rpe,end->rnpd", x, Wq[li])
                    k = jnp.einsum("rpe,end->rnpd", x, Wk[li])
                    v = jnp.einsum("rpe,end->rnpd", x, Wv[li])
                else:
                    qkv = jnp.einsum("rpe,ecnd->crnpd", x, W3[li])
                    q, k, v = qkv[0], qkv[1], qkv[2]
                a = packed_segment_attention(q, k, v, seg)
                x = x + jnp.einsum("rnpd,nde->rpe", a, Wor[li])
                x = x + (x @ W1[li]) @ W2[li]
            return carry + jnp.sum(x).astype(jnp.float32)
        return jax.jit(stack)

    out = {
        "bare_einsum_split": chain(make_einsum(True), x0, seg,
                                   name="einsum_split"),
        "bare_einsum_fused": chain(make_einsum(False), x0, seg,
                                   name="einsum_fused"),
        "base_erf_bf16ln": chain(make_stack(), x0, seg, name="base"),
        "gelu_tanh": chain(make_stack(gelu_mode="tanh"), x0, seg, name="tanh"),
        "gelu_fit": chain(make_stack(gelu_mode="fit"), x0, seg, name="fit"),
        "gelu_none": chain(make_stack(gelu_mode="none"), x0, seg, name="gelu_none"),
        "ln_none": chain(make_stack(ln_mode="none"), x0, seg, name="ln_none"),
        "ln_fp32": chain(make_stack(ln_mode="fp32"), x0, seg, name="ln_fp32"),
        "bare_kernel_attn": chain(make_bare("kernel"), x0, seg, name="bare"),
        "bare_one_transpose": chain(make_bare("one_t"), x0, seg, name="one_t"),
        "bare_no_attn": chain(make_bare("none"), x0, seg, name="no_attn"),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
