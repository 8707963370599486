"""North-star benchmark: full-vocabulary tokenize+embed throughput.

Target (BASELINE.json): tokenize+embed the full ~600K-code vocabulary in
<60 s on a TPU v5e-8 == 10,000 codes/s across 8 chips == 1,250 codes/s per
chip. This bench runs on however many chips are visible (typically ONE here)
and reports measured codes/sec; ``vs_baseline`` is normalized per chip:
value / (1250 * n_chips). (No absolute reference-GPU throughput exists —
the reference repo publishes none, BASELINE.md.)

Method: flagship model (frozen BERT-base text encoder, GCN graph encoder,
21000x64 soft top-k VQ codebook), randomly initialized; synthetic batches in
realistic bucket shapes (text 64 — typical code descriptions are short, vs
the reference's always-512 padding; 32-node / 64-edge subgraphs); the eval
path of inference.py:105-115. Each step reduces its outputs to a scalar
checksum chained across steps, so timing cannot be faked by async dispatch
(device->host transfers on this tunnel are lazy). Prints ONE JSON line.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

BATCH = 512
TEXT_LEN = 64
MAX_NODES = 32
MAX_EDGES = 64
WARMUP_STEPS = 3
MEASURE_STEPS = 40
TARGET_CODES_PER_SEC_PER_CHIP = 10_000.0 / 8  # 600K/60s on v5e-8


def main() -> None:
    os.makedirs("/tmp/jax_cache", exist_ok=True)
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    import jax.numpy as jnp

    from medtok_tpu.config import ModelConfig
    from medtok_tpu.data.synthetic import random_code_batch
    from medtok_tpu.models.tokenizer_model import MultimodalTokenizer

    cfg = ModelConfig()
    model = MultimodalTokenizer(cfg)
    rng = np.random.default_rng(0)

    batches = [
        jax.tree.map(
            jnp.asarray,
            random_code_batch(
                rng, batch=BATCH, text_len=TEXT_LEN, max_nodes=MAX_NODES,
                max_edges_per_graph=MAX_EDGES, text_vocab=cfg.text.vocab_size,
                num_kg_nodes=cfg.graph.num_nodes,
            ),
        )
        for _ in range(4)
    ]

    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batches[0], train=False,
    )
    params, usage = variables["params"], variables.get("usage", {})

    @jax.jit
    def eval_step(carry, params, usage, batch):
        out = model.apply({"params": params, "usage": usage}, batch, train=False)
        return (
            carry
            + jnp.sum(out.embedding)
            + jnp.sum(out.tokens).astype(jnp.float32)
        )

    carry = jnp.zeros((), jnp.float32)
    for i in range(WARMUP_STEPS):
        carry = eval_step(carry, params, usage, batches[i % len(batches)])
    float(carry)  # force

    carry = jnp.zeros((), jnp.float32)
    t0 = time.perf_counter()
    for i in range(MEASURE_STEPS):
        carry = eval_step(carry, params, usage, batches[i % len(batches)])
    checksum = float(carry)  # blocks until every chained step finished
    dt = time.perf_counter() - t0
    assert np.isfinite(checksum)

    n_chips = jax.device_count()
    codes_per_sec = MEASURE_STEPS * BATCH / dt
    print(json.dumps({
        "metric": "codes_per_sec_vocab_embed",
        "value": round(codes_per_sec, 1),
        "unit": "codes/s",
        "vs_baseline": round(
            codes_per_sec / (TARGET_CODES_PER_SEC_PER_CHIP * n_chips), 3
        ),
    }))


if __name__ == "__main__":
    main()
