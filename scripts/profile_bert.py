"""Decompose the packed BERT forward at the export shape (R=256, P=128).

probe_export_mfu: bert_only 64 ms of the 87 ms dominant step, 0.45 MFU
(roofline ~29 ms). This probe splits one forward into components so the
optimization goes at the measured share, not a guess:

  full          encode_text_packed (12 layers, block-diag pairwise mask)
  embed_ln      embedding lookups + LN
  qkvo_ffn      the 6 GEMMs per layer alone (no attention core, no LN)
  attn_core     einsum(QK)->mask->softmax->einsum(AV) alone, 12x
  ln_gelu       the two LayerNorms + exact gelu alone, 12x
  attn_bf16     attn core with bf16 logits+softmax (A/B: fp32 is production)

All chained-amortized (reps async dispatches, one scalar fetch).

Usage: python scripts/profile_bert.py [--rows 256] [--len 128]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=256)
    ap.add_argument("--len", type=int, default=128)
    ap.add_argument("--reps", type=int, default=8)
    ap.add_argument("--trials", type=int, default=4)
    args = ap.parse_args()

    import os

    os.makedirs("/tmp/jax_cache", exist_ok=True)
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    import jax.numpy as jnp

    from medtok_tpu.config import ModelConfig
    from medtok_tpu.models.tokenizer_model import MultimodalTokenizer

    if jax.default_backend() != "tpu":
        print("WARNING: not on TPU — absolute numbers meaningless",
              file=sys.stderr)

    R, P = args.rows, args.len
    cfg = ModelConfig()
    tc = cfg.text
    H, I, NH = tc.hidden_size, tc.intermediate_size, tc.num_heads
    Dh = H // NH
    model = MultimodalTokenizer(cfg)
    rng = np.random.default_rng(7)

    ids = jnp.asarray(rng.integers(1, 20000, (R, P)), jnp.int32)
    seg = jnp.asarray(
        np.repeat(np.arange(1, 9)[None, :], P // 8, axis=1).reshape(1, P)
        * np.ones((R, 1), np.int32), jnp.int32)
    pm = (seg[:, :, None] == seg[:, None, :]) & (seg[:, :, None] > 0)
    pos = jnp.asarray(np.tile(np.arange(P) % 16, (R, 1)), jnp.int32)

    from medtok_tpu.data.synthetic import random_code_batch
    batch = jax.tree.map(jnp.asarray, random_code_batch(
        rng, batch=8, text_len=16, max_nodes=16, max_edges_per_graph=32,
        text_vocab=tc.vocab_size, num_kg_nodes=cfg.graph.num_nodes,
    ))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch, train=False,
    )
    params = variables["params"]

    def chain(fn, *a, name=""):
        print(f"leg: {name}", file=sys.stderr, flush=True)
        float(fn(jnp.zeros(()), *a))
        best = []
        for t in range(args.trials):
            carry = jnp.zeros(())
            t0 = time.perf_counter()
            for _ in range(args.reps):
                carry = fn(carry, *a)
            float(carry)
            if t:
                best.append((time.perf_counter() - t0) / args.reps)
        return round(1e3 * min(best), 2)

    @jax.jit
    def full(carry, params, ids, pm, pos):
        flat = model.apply(
            {"params": params}, ids, pm, pos,
            method=MultimodalTokenizer.encode_text_packed,
        )
        return carry + jnp.sum(flat).astype(jnp.float32)

    @jax.jit
    def full_flash(carry, params, ids, seg, pos):
        flat = model.apply(
            {"params": params}, ids, seg, pos,
            method=MultimodalTokenizer.encode_text_packed,
        )
        return carry + jnp.sum(flat).astype(jnp.float32)

    # synthetic per-layer weights in bf16 (the production compute dtype)
    def w(*shape):
        return jnp.asarray(rng.standard_normal(shape) * 0.02, jnp.bfloat16)

    NL = tc.num_layers
    Wqkv = w(NL, H, 3 * H)
    Wo = w(NL, H, H)
    W1 = w(NL, H, I)
    W2 = w(NL, I, H)
    x0 = jnp.asarray(rng.standard_normal((R, P, H)), jnp.bfloat16)

    @jax.jit
    def qkvo_ffn(carry, x, Wqkv, Wo, W1, W2):
        def layer(x, ws):
            wqkv, wo, w1, w2 = ws
            qkv = x @ wqkv
            q = qkv[..., :H]
            x = q @ wo
            h = x @ w1
            x = h @ w2
            return x, ()
        x, _ = jax.lax.scan(layer, x, (Wqkv, Wo, W1, W2))
        return carry + jnp.sum(x).astype(jnp.float32)

    def attn_once(x, pm, acc_dtype):
        q = x.reshape(R, P, NH, Dh).transpose(0, 2, 1, 3)
        k = q
        v = q
        logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                            preferred_element_type=acc_dtype) / np.sqrt(Dh)
        logits = jnp.where(pm[:, None, :, :], logits, -1e9)
        attn = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        return out.transpose(0, 2, 1, 3).reshape(R, P, H)

    @jax.jit
    def attn_core(carry, x, pm):
        for _ in range(NL):
            x = x + 0.001 * attn_once(x, pm, jnp.float32)
        return carry + jnp.sum(x).astype(jnp.float32)

    @jax.jit
    def attn_bf16(carry, x, pm):
        for _ in range(NL):
            x = x + 0.001 * attn_once(x, pm, jnp.bfloat16)
        return carry + jnp.sum(x).astype(jnp.float32)

    @jax.jit
    def ln_gelu(carry, x, W1):
        import flax.linen as nn
        for i in range(NL):
            m = x.mean(-1, keepdims=True)
            v = ((x - m) ** 2).mean(-1, keepdims=True)
            x = (x - m) * jax.lax.rsqrt(v + 1e-12)
            h = nn.gelu((x @ W1[0]).astype(jnp.bfloat16), approximate=False)
            x = x + 0.0 * h[..., :1]
            m2 = x.mean(-1, keepdims=True)
            x = (x - m2)
        return carry + jnp.sum(x).astype(jnp.float32)

    qh = jnp.asarray(rng.standard_normal((R, NH, P, Dh)) * 0.3, jnp.bfloat16)
    seg1 = seg

    @jax.jit
    def kernel_only(carry, qh, seg1):
        from medtok_tpu.ops.flash_attention import packed_segment_attention
        x = qh
        for _ in range(NL):
            x = packed_segment_attention(x, x, x, seg1)
        return carry + jnp.sum(x).astype(jnp.float32)

    qn = jnp.asarray(rng.standard_normal((R, P, NH, Dh)) * 0.3, jnp.bfloat16)

    @jax.jit
    def kernel_nt_only(carry, qn, seg1):
        from medtok_tpu.ops.flash_attention import packed_segment_attention_nt
        x = qn
        for _ in range(NL):
            x = packed_segment_attention_nt(x, x, x, seg1)
        return carry + jnp.sum(x).astype(jnp.float32)

    @jax.jit
    def dense_core_only(carry, qh, pm):
        x = qh
        for _ in range(NL):
            logits = jnp.einsum("bhqd,bhkd->bhqk", x, x,
                                preferred_element_type=jnp.float32) / np.sqrt(Dh)
            logits = jnp.where(pm[:, None, :, :], logits, -1e9)
            attn = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
            x = jnp.einsum("bhqk,bhkd->bhqd", attn, x)
        return carry + jnp.sum(x).astype(jnp.float32)

    @jax.jit
    def embed_ln(carry, params, ids, pos):
        p = params["text_model"]
        x = (p["word_embeddings"]["embedding"][ids]
             + p["position_embeddings"]["embedding"][pos]).astype(jnp.bfloat16)
        return carry + jnp.sum(x).astype(jnp.float32)

    out = {
        "shape": f"R={R} P={P} bf16",
        "full_ms": chain(full, params, ids, pm, pos, name="full"),
        "full_flash_ms": chain(full_flash, params, ids, seg, pos,
                               name="full_flash"),
        "embed_ln_ms": chain(embed_ln, params, ids, pos, name="embed"),
        "qkvo_ffn_ms": chain(qkvo_ffn, x0, Wqkv, Wo, W1, W2, name="gemms"),
        "attn_core_fp32_ms": chain(attn_core, x0, pm, name="attn_fp32"),
        "attn_core_bf16_ms": chain(attn_bf16, x0, pm, name="attn_bf16"),
        "ln_gelu_ms": chain(ln_gelu, x0, W1, name="ln_gelu"),
        "kernel_only_ms": chain(kernel_only, qh, seg1, name="kernel_only"),
        "kernel_nt_only_ms": chain(kernel_nt_only, qn, seg1,
                                   name="kernel_nt_only"),
        "dense_core_only_ms": chain(dense_core_only, qh, pm,
                                    name="dense_core_only"),
    }
    gemm_flops = R * P * tc.num_layers * (8 * H * H + 4 * H * I)
    out["gemm_roofline_ms"] = round(1e3 * gemm_flops / 197e12, 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
