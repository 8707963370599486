"""Device-only vs end-to-end export-step MFU probe (VERDICT r3 weak #1).

The export headline's mfu_export divides model FLOPs by WALL time — which on
this box includes the python transfer proxy's h2d path and per-dispatch RPC
overhead. This probe separates the components at the dominant sweep shape
(node bucket 16, C=4096 codes, R=256 packed BERT rows):

- ``device_ms``: N fused steps chain-dispatched with ALL inputs pre-staged
  on device, one fetch — pure device compute.
- ``e2e_ms``: the same steps but re-shipping the host arrays each time —
  adds the h2d/dispatch path the sweep actually pays.
- ``device_mfu`` / ``e2e_mfu``: bench.py's FLOP model over each.

The fused step replicates bench.py::run_packed_sweep's fused_step (packed
BERT via on-device derived metadata + quantizer tail + checksum).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

os.environ.setdefault("MEDTOK_BENCH_CODES", "20000")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--rows", type=int, default=256)
    ap.add_argument("--codes", type=int, default=4096)
    ap.add_argument("--trials", type=int, default=4)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import bench
    from medtok_tpu.config import ModelConfig
    from medtok_tpu.data.compact import derive_packed_meta, unpack_compact
    from medtok_tpu.models.tokenizer_model import MultimodalTokenizer

    R, P, LMAX, C = args.rows, 128, 64, args.codes
    dataset = bench.setup_dataset("/tmp/medtok_probe")
    cfg = ModelConfig()
    model = MultimodalTokenizer(cfg)

    rng = np.random.default_rng(1)
    from medtok_tpu.data.synthetic import random_code_batch

    dummy = jax.tree.map(jnp.asarray, random_code_batch(
        rng, batch=8, text_len=16, max_nodes=16, max_edges_per_graph=32,
        text_vocab=cfg.text.vocab_size, num_kg_nodes=cfg.graph.num_nodes,
    ))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        dummy, train=False,
    )
    params, usage = variables["params"], variables.get("usage", {})

    @jax.jit
    def fused_step(carry, params, usage, ids, meta, cb):
        # bench.py::run_packed_sweep fused_step, replicated 1:1
        R, P = ids.shape
        flat_base, tlens = meta[0], meta[1]
        seg, pos, _, _ = derive_packed_meta(
            flat_base, tlens, num_rows=R, row_len=P, lmax=1
        )
        flat = model.apply(
            {"params": params}, ids.astype(jnp.int32), seg, pos,
            method=MultimodalTokenizer.encode_text_packed,
        )
        _, _, gidx, tmask = derive_packed_meta(
            flat_base, tlens, num_rows=1, row_len=1, lmax=LMAX
        )
        out = model.apply(
            {"params": params, "usage": usage}, flat, gidx, tmask,
            unpack_compact(cb),
            method=MultimodalTokenizer.tokenize_from_hidden,
        )
        return (
            carry
            + jnp.sum(out.embedding)
            + jnp.sum(out.tokens).astype(jnp.float32)
            + jnp.sum(out.weights)
        )

    dataset.warm_cache(tokenize=False)
    idxs = list(range(min(C, len(dataset))))
    idxs = (idxs * (C // len(idxs) + 1))[:C]
    forced = (dataset.cfg.text_buckets[0], dataset.cfg.node_buckets[0],
              dataset.cfg.edge_buckets[0])

    TDT = np.int16 if cfg.text.vocab_size < 32768 else np.int32
    ids_np = rng.integers(1, 100, (R, P)).astype(TDT)
    meta_np = np.stack([
        np.minimum(np.arange(C, dtype=np.int32) * 16, R * P - 16),
        np.full(C, 8, np.int32),
    ])

    def host_batch():
        b, fence = dataset.make_batch_compact(
            idxs, aug_seed=None, force_shapes=forced, want_text=False)
        return b, fence

    # staged-on-device inputs
    b0, f0 = host_batch()
    ids_d = jnp.asarray(ids_np)
    meta_d = jnp.asarray(meta_np)
    cb_d = jax.tree.map(
        lambda x: jnp.asarray(x) if x is not None else None, b0,
        is_leaf=lambda x: x is None)

    carry = fused_step(jnp.zeros(()), params, usage, ids_d, meta_d, cb_d)
    f0.set_fence(carry)
    float(carry)  # compile + warm

    out = {"shape": f"R={R} P={P} C={C} nb={forced[1]} epg={forced[2]}"}
    N = args.steps
    dev, e2e = [], []
    for trial in range(args.trials):
        # device-only: chained dispatches, staged inputs
        carry = jnp.zeros(())
        t0 = time.perf_counter()
        for _ in range(N):
            carry = fused_step(carry, params, usage, ids_d, meta_d, cb_d)
        float(carry)
        if trial:
            dev.append((time.perf_counter() - t0) / N)

        # end-to-end: host pack + h2d ship each step
        carry = jnp.zeros(())
        t0 = time.perf_counter()
        for _ in range(N):
            b, fence = host_batch()
            carry = fused_step(carry, params, usage,
                               jnp.asarray(ids_np), jnp.asarray(meta_np), b)
            fence.set_fence(carry)
        float(carry)
        if trial:
            e2e.append((time.perf_counter() - t0) / N)

    # ---- component split: BERT-only vs quantizer-tail-only (both chained,
    # staged inputs) — quantifies the dominant step's internal budget so
    # optimization goes at the bigger share, not a guess ----
    @jax.jit
    def bert_step(carry, params, ids, meta):
        R, P = ids.shape
        flat_base, tlens = meta[0], meta[1]
        seg, pos, _, _ = derive_packed_meta(
            flat_base, tlens, num_rows=R, row_len=P, lmax=1
        )
        flat = model.apply(
            {"params": params}, ids.astype(jnp.int32), seg, pos,
            method=MultimodalTokenizer.encode_text_packed,
        )
        return carry + jnp.sum(flat)

    flat_d = jnp.asarray(
        rng.standard_normal((R * P, cfg.text.hidden_size)), jnp.float32)

    @jax.jit
    def quant_step(carry, params, usage, flat, meta, cb):
        flat_base, tlens = meta[0], meta[1]
        _, _, gidx, tmask = derive_packed_meta(
            flat_base, tlens, num_rows=1, row_len=1, lmax=LMAX
        )
        out = model.apply(
            {"params": params, "usage": usage}, flat, gidx, tmask,
            unpack_compact(cb),
            method=MultimodalTokenizer.tokenize_from_hidden,
        )
        return (carry + jnp.sum(out.embedding)
                + jnp.sum(out.tokens).astype(jnp.float32)
                + jnp.sum(out.weights))

    def chain(fn, *a):
        float(fn(jnp.zeros(()), *a))
        best = []
        for trial in range(args.trials):
            carry = jnp.zeros(())
            t0 = time.perf_counter()
            for _ in range(N):
                carry = fn(carry, *a)
            float(carry)
            if trial:
                best.append((time.perf_counter() - t0) / N)
        return 1e3 * min(best)

    bert_ms = chain(bert_step, params, ids_d, meta_d)
    quant_ms = chain(quant_step, params, usage, flat_d, meta_d, cb_d)

    device_ms = 1e3 * min(dev)
    e2e_ms = 1e3 * min(e2e)
    flops = (R * P * bench._bert_flops_per_token(P)
             + C * bench._vq_flops_per_code())
    out.update({
        "device_ms": round(device_ms, 2),
        "e2e_ms": round(e2e_ms, 2),
        "pipeline_overhead_ms": round(e2e_ms - device_ms, 2),
        "device_mfu": round(flops / (device_ms / 1e3) / bench.V5E_BF16_PEAK, 3),
        "e2e_mfu": round(flops / (e2e_ms / 1e3) / bench.V5E_BF16_PEAK, 3),
        "codes_per_sec_device_only": round(C / (device_ms / 1e3), 1),
        "bert_only_ms": round(bert_ms, 2),
        "quant_only_ms": round(quant_ms, 2),
        "bert_mfu": round(
            R * P * bench._bert_flops_per_token(P)
            / (bert_ms / 1e3) / bench.V5E_BF16_PEAK, 3),
        "quant_mfu": round(
            C * bench._vq_flops_per_code()
            / (quant_ms / 1e3) / bench.V5E_BF16_PEAK, 3),
    })
    print(json.dumps(out))


if __name__ == "__main__":
    main()
