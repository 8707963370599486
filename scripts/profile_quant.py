"""Decompose the quantizer tail at the DOMINANT export shape.

probe_export_mfu measured the dominant fused step as BERT 64 ms + quant tail
25 ms, with the tail at quant_mfu 0.006 — nearly FLOP-free device time. This
probe splits the tail into its parts so optimization goes at the biggest
share:

  gather_project   per_code = flat_hidden[gather_idx]; text_mapped(per_code)
  cross_attn       bidirectional 2-layer cross attention (shared path)
  sweep_shared     2x soft_topk_quantize against the full [21000, 64] book
  sweep_specific   2x soft_topk_quantize against a 7000-row region
  gcn_light        GraphEncoder at the Ln=16 bucket (scatter path)
  full             tokenize_from_hidden end-to-end

All chained-amortized (R dispatches, one fetch). ``--lmax`` controls the
per-code text length the tail sees (the fused step currently hardcodes 64;
the dominant bucket's texts are <= 16 tokens).

Usage: python scripts/profile_quant.py [--c 4096] [--lmax 64]
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
    ap.add_argument("--c", type=int, default=4096)
    ap.add_argument("--lmax", type=int, default=64)
    ap.add_argument("--nodes", type=int, default=16)
    ap.add_argument("--edges", type=int, default=32)
    ap.add_argument("--reps", type=int, default=8)
    ap.add_argument("--trials", type=int, default=4)
    args = ap.parse_args()

    import os

    os.makedirs("/tmp/jax_cache", exist_ok=True)
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    import jax.numpy as jnp

    from medtok_tpu.config import ModelConfig
    from medtok_tpu.data.synthetic import random_code_batch
    from medtok_tpu.models.tokenizer_model import MultimodalTokenizer
    from medtok_tpu.ops import vq as vq_ops

    if jax.default_backend() != "tpu":
        print("WARNING: not on TPU — absolute numbers meaningless",
              file=sys.stderr)

    C, LMAX, Ln, Epg = args.c, args.lmax, args.nodes, args.edges
    cfg = ModelConfig()
    model = MultimodalTokenizer(cfg)
    rng = np.random.default_rng(11)
    batch = jax.tree.map(jnp.asarray, random_code_batch(
        rng, batch=C, text_len=16, max_nodes=Ln, max_edges_per_graph=Epg,
        text_vocab=cfg.text.vocab_size, num_kg_nodes=cfg.graph.num_nodes,
    ))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch, train=False,
    )
    params, usage = variables["params"], variables.get("usage", {})

    R, P = 256, 128
    D = cfg.graph.out_channels
    flat = jnp.asarray(
        rng.standard_normal((R * P, cfg.text.hidden_size)), jnp.bfloat16)
    gi = jnp.asarray(rng.integers(0, R * P, (C, LMAX)), jnp.int32)
    tm = jnp.zeros((C, LMAX), bool).at[:, :16].set(True)

    def chain(fn, *a, name=""):
        print(f"leg: {name or fn.__name__}", file=sys.stderr, flush=True)
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
    def full(carry, params, usage, flat, gi, tm, b):
        out = model.apply(
            {"params": params, "usage": usage}, flat, gi, tm, b,
            method=MultimodalTokenizer.tokenize_from_hidden,
        )
        return (carry + jnp.sum(out.embedding)
                + jnp.sum(out.tokens).astype(jnp.float32)
                + jnp.sum(out.weights))

    @jax.jit
    def gather_project(carry, params, flat, gi):
        per_code = flat[gi]
        tf = model.apply(
            {"params": params},
            method=lambda m: m.text_mapped(per_code),
        )
        return carry + jnp.sum(tf).astype(jnp.float32)

    tf_d = jnp.asarray(rng.standard_normal((C, LMAX, D)), jnp.float32)
    gf_d = jnp.asarray(rng.standard_normal((C, Ln, D)), jnp.float32)
    nm_d = jnp.ones((C, Ln), bool)

    @jax.jit
    def cross(carry, params, usage, tf, gf, tm, nm):
        # quantizer.setup declares the usage-FIFO variable, so the
        # collection must be present even though cross_attn never reads it
        t_attn, g_attn = model.apply(
            {"params": params, "usage": usage},
            method=lambda m: m.quantize.cross_attn(
                tf, gf, v1_mask=tm, v2_mask=nm, deterministic=True),
        )
        return carry + jnp.sum(t_attn) + jnp.sum(g_attn)

    z_d = jnp.asarray(rng.standard_normal((C, D)), jnp.float32)

    @jax.jit
    def sweep_shared(carry, params, z):
        book = params["quantize"]["codebook"]
        q = vq_ops.soft_topk_quantize(
            z, book, k=cfg.quantizer.top_k,
            beta=cfg.quantizer.commit_loss_beta,
            l2_norm=cfg.quantizer.l2_norm, train=False,
            backend=cfg.quantizer.topk_backend,
        )
        return (carry + jnp.sum(q.z_q)
                + jnp.sum(q.indices).astype(jnp.float32))

    @jax.jit
    def sweep_specific(carry, params, z):
        book = vq_ops.region_slice(params["quantize"]["codebook"], "text")
        q = vq_ops.soft_topk_quantize(
            z, book, k=cfg.quantizer.top_k,
            beta=cfg.quantizer.commit_loss_beta,
            l2_norm=cfg.quantizer.l2_norm, train=False,
            backend=cfg.quantizer.topk_backend,
        )
        return (carry + jnp.sum(q.z_q)
                + jnp.sum(q.indices).astype(jnp.float32))

    @jax.jit
    def gcn_light(carry, params, b):
        h = model.apply(
            {"params": {"graph_encoder": params["graph_encoder"]}},
            b.node_ids, b.edge_src, b.edge_dst, b.edge_weight,
            method=lambda m, *a: m.graph_encoder(*a),
        )[-1]
        return carry + jnp.sum(h).astype(jnp.float32)

    out = {
        "shape": f"C={C} lmax={LMAX} Ln={Ln} Epg={Epg}",
        "full_ms": chain(full, params, usage, flat, gi, tm, batch),
        "gather_project_ms": chain(gather_project, params, flat, gi),
        "cross_attn_ms": chain(cross, params, usage, tf_d, gf_d, tm, nm_d),
        "sweep_shared_1x_ms": chain(sweep_shared, params, z_d),
        "sweep_specific_1x_ms": chain(sweep_specific, params, z_d),
        "gcn_light_ms": chain(gcn_light, params, batch),
    }
    out["sweeps_4x_ms"] = round(
        2 * out["sweep_shared_1x_ms"] + 2 * out["sweep_specific_1x_ms"], 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
