"""Per-component timing of the heavy-tail quantizer step on the real chip.

The 600K heavy-tail bench spends most of its device time in the tail node
buckets (Ln=128/512; PERF.md round-3 table: 0.18 / 1.37 ms per code vs 0.026
at Ln=16). This script decomposes one tail step into its parts so tail
optimization is measurement-driven instead of guesswork:

  full        tokenize_from_hidden (text_mapped + GCN + pool + quantizer)
  gcn         GraphEncoder forward alone (dense-adjacency path at Ln>=64)
  adj         gcn_norm_adj alone (the scalar-scatter adjacency build)
  topk        one [C, 21000] fp32 distance+top-k sweep (the shared path
              runs 2 of these + 2 region sweeps per step)
  make_batch  host-side C++ subgraph pack at the tail shape (overlap budget)

Usage: python scripts/profile_tail.py [--c 512] [--nodes 512] [--edges 8192]
Prints one JSON object. Needs the real TPU (falls back to CPU timings with a
warning — only relative numbers are meaningful there).
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def bench_fn(fn, *args, trials: int = 4, reps: int = 8) -> float:
    """Amortized min-of-(trials-1) wall ms; trial 0 discarded (compile +
    pool transients).

    Timing MUST amortize on this box: ``reps`` async dispatches, then ONE
    scalar fetch — a per-call float() costs 20-60 ms of axon-tunnel fetch
    latency and inflated every r03 sub-100 ms number (bench.py kernel_ab
    note). The queue keeps the device serialized, and the final fetch
    fences all prior dispatches."""
    float(fn(*args))
    times = []
    for t in range(trials):
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args)
        float(out)
        if t:
            times.append((time.perf_counter() - t0) / reps)
    return 1e3 * min(times)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--c", type=int, default=512, help="codes per step")
    ap.add_argument("--nodes", type=int, default=512)
    ap.add_argument("--edges", type=int, default=8192)
    ap.add_argument("--text-len", type=int, default=16)
    args = ap.parse_args()

    import os

    os.makedirs("/tmp/jax_cache", exist_ok=True)
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    import jax.numpy as jnp

    from medtok_tpu.config import ModelConfig
    from medtok_tpu.data.synthetic import random_code_batch
    from medtok_tpu.models.layers import gcn_norm_adj
    from medtok_tpu.models.tokenizer_model import MultimodalTokenizer
    from medtok_tpu.ops.vq import squared_distance, topk_smallest

    if jax.default_backend() != "tpu":
        print("WARNING: not on TPU — absolute numbers meaningless",
              file=sys.stderr)

    C, Ln, Epg, Lt = args.c, args.nodes, args.edges, args.text_len
    cfg = ModelConfig()
    model = MultimodalTokenizer(cfg)
    rng = np.random.default_rng(11)
    batch = jax.tree.map(jnp.asarray, random_code_batch(
        rng, batch=C, text_len=Lt, max_nodes=Ln, max_edges_per_graph=Epg,
        text_vocab=cfg.text.vocab_size, num_kg_nodes=cfg.graph.num_nodes,
    ))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch, train=False,
    )
    params, usage = variables["params"], variables.get("usage", {})

    # packed-hidden inputs mirroring bench.run_packed_sweep's quant_step
    LMAX = 64
    flat = jnp.asarray(
        rng.standard_normal((64 * 128, cfg.text.hidden_size)), jnp.float32
    )
    gi = jnp.asarray(rng.integers(0, 64 * 128, (C, LMAX)), jnp.int32)
    tm = jnp.zeros((C, LMAX), bool).at[:, :Lt].set(True)

    @jax.jit
    def full(params, usage, flat, gi, tm, b):
        out = model.apply(
            {"params": params, "usage": usage}, flat, gi, tm, b,
            method=MultimodalTokenizer.tokenize_from_hidden,
        )
        return (jnp.sum(out.embedding) + jnp.sum(out.tokens)
                + jnp.sum(out.weights))

    @jax.jit
    def gcn(params, b):
        return jnp.sum(model.apply(
            {"params": {"graph_encoder": params["graph_encoder"]}},
            b.node_ids, b.edge_src, b.edge_dst, b.edge_weight,
            method=lambda m, *a: m.graph_encoder(*a),
        )[-1])

    @jax.jit
    def adj(b):
        return jnp.sum(
            gcn_norm_adj(b.edge_src, b.edge_dst, b.edge_weight, C, Ln)
        )

    z = jnp.asarray(rng.standard_normal((C, 64)), jnp.float32)
    e = jnp.asarray(rng.standard_normal((21000, 64)), jnp.float32)

    @jax.jit
    def topk(z, e):
        v, i = topk_smallest(squared_distance(z, e), 5)
        return jnp.sum(v) + jnp.sum(i).astype(jnp.float32)

    out = {
        "shape": f"C={C} Ln={Ln} Epg={Epg} Lt={Lt}",
        "full_ms": round(bench_fn(full, params, usage, flat, gi, tm, batch), 2),
        "gcn_ms": round(bench_fn(gcn, params, batch), 2),
        "adj_ms": round(bench_fn(adj, batch), 2),
        "topk_ms": round(bench_fn(topk, z, e), 2),
    }
    out["ms_per_code"] = round(out["full_ms"] / C, 4)

    # host-side pack cost at this shape (the overlap budget)
    from medtok_tpu.config import DataConfig
    from medtok_tpu.data.dataset import MedCodeDataset
    from medtok_tpu.data.synthetic import (
        MEDICAL_WORDS,
        SYLLABLES,
        synthetic_kg,
        synthetic_vocab_frame,
    )
    from medtok_tpu.data.text import WordPieceTokenizer, make_test_vocab

    df = synthetic_vocab_frame(
        rng, num_codes=16 * C, num_kg_nodes=130_000, heavy_tail=True
    )
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        pq = f"{td}/codes.parquet"
        df.to_parquet(pq)
        kg = synthetic_kg(rng, num_nodes=130_000, num_edges=4_000_000,
                          local_frac=0.7, local_window=64)
        vocab = make_test_vocab(MEDICAL_WORDS + SYLLABLES)
        for s in SYLLABLES:
            if "##" + s not in vocab:
                vocab["##" + s] = len(vocab)
        vpath = f"{td}/vocab.txt"
        with open(vpath, "w") as f:
            for t in vocab:
                f.write(t + "\n")
        dcfg = DataConfig(
            text_buckets=(16,), node_buckets=(16, 128, 512),
            edge_buckets=(32, 1024, 8192), max_text_length=16,
        )
        ds = MedCodeDataset(
            kg, pq, WordPieceTokenizer.from_vocab_file(vpath), cfg=dcfg
        )
        ds.warm_cache(tokenize=False)
        sizes = np.fromiter(
            (len(ds.node_list(i)) for i in range(len(df))), np.int64, len(df)
        )
        tail = np.where(sizes > 128)[0][:C]
        idxs = list(np.concatenate([tail, np.repeat(tail[-1:], C - len(tail))]))
        ds.tokenize_rows(idxs)
        t0 = time.perf_counter()
        for _ in range(3):
            ds.make_batch(idxs, aug_seed=None,
                          force_shapes=(16, Ln, Epg))
        out["make_batch_host_ms"] = round(
            1e3 * (time.perf_counter() - t0) / 3, 1
        )

    print(json.dumps(out))


if __name__ == "__main__":
    main()
