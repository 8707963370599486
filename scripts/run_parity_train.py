"""TRAINING-DYNAMICS parity vs the composed torch reference.

The eval-forward parity sweep (run_parity_e2e.py) proves token/embedding
parity; this harness proves the *training* side — the full assembled
objective of /root/reference/train_MedTok.py:215-238 (codebook VQ+commit
across three quantization paths with STE, shared InfoNCE−β·align, specific
InfoNCE+λ·orth) has the same value AND the same backward pass:

1. step-0 gradient check: identical converted weights + identical batch on
   both sides; compare per-parameter-group gradients of the total loss
   (torch autograd vs jax.grad through the real trainer loss_fn);
2. N-step trajectory: run N Adam steps (lr 1e-4, betas (0.9, 0.95), global
   grad-norm clip 1.0 — train_MedTok.py:106,242-244) with identical batches
   on both sides; overlay the loss trajectories and compare the drifted
   parameters at the end.

Dropout is disabled on both sides (the only stochasticity in the reference
step besides data order), so every quantity is deterministic.

Usage:
  python scripts/run_parity_train.py --steps 50 --batch 64

Results merge into docs/PARITY_REPORT.json under "train_dynamics".
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import torch  # noqa: E402

from medtok_tpu.config import (  # noqa: E402
    GraphEncoderConfig, MedTokConfig, ModelConfig, QuantizerConfig,
    TextEncoderConfig, TrainConfig,
)
from medtok_tpu.data.synthetic import random_code_batch  # noqa: E402
from medtok_tpu.models.tokenizer_model import MultimodalTokenizer  # noqa: E402
from medtok_tpu.models.torch_oracle import (  # noqa: E402
    assemble_torch_losses,
    build_composed_train_oracle,
    code_batch_to_torch_train,
    convert_composed_grads,
    convert_composed_oracle,
)
from medtok_tpu.parallel.mesh import make_mesh  # noqa: E402
from medtok_tpu.train.trainer import (  # noqa: E402
    _loss_fn,
    create_train_state,
    make_optimizer,
    make_train_step,
)

TINY_BERT = TextEncoderConfig(
    vocab_size=30522, hidden_size=128, num_layers=4, num_heads=4,
    intermediate_size=512, max_position_embeddings=64,
    hidden_dropout=0.0, attention_dropout=0.0,
)


def harness_config(
    *, codebook_size: int = 21000, num_kg_nodes: int = 20000,
    bert: TextEncoderConfig = TINY_BERT,
) -> MedTokConfig:
    """fp32, dropout-free config at the real codebook size; a reduced node
    table keeps the torch side's dense embedding-grad work CI-sized."""
    return MedTokConfig(
        model=ModelConfig(
            text=bert,
            graph=GraphEncoderConfig(num_nodes=num_kg_nodes),
            quantizer=QuantizerConfig(
                codebook_size=codebook_size, cross_attn_dropout=0.0,
            ),
            compute_dtype="float32",
        ),
        train=TrainConfig(mesh_dp=1, mesh_tp=1, ema=False),
    )


def group_of(path: tuple) -> str:
    """Top-two-level param-group label for reporting, e.g. 'quantize/codebook'."""
    keys = [getattr(p, "key", str(p)) for p in path]
    return "/".join(keys[:2])


def compare_trees(t_tree, f_tree) -> dict:
    """Per-group max abs err and relative L2 error between two pytrees."""
    groups: dict[str, dict] = {}
    t_leaves = jax.tree_util.tree_flatten_with_path(t_tree)[0]
    f_leaves = jax.tree_util.tree_flatten_with_path(f_tree)[0]
    assert len(t_leaves) == len(f_leaves)
    for (path, tv), (fpath, fv) in zip(t_leaves, f_leaves):
        assert jax.tree_util.keystr(path) == jax.tree_util.keystr(fpath)
        g = group_of(path)
        tv = np.asarray(tv, np.float64)
        fv = np.asarray(fv, np.float64)
        d = groups.setdefault(g, {"max_abs_err": 0.0, "num": 0.0, "den": 0.0})
        d["max_abs_err"] = max(d["max_abs_err"], float(np.abs(tv - fv).max()))
        d["num"] += float(((tv - fv) ** 2).sum())
        d["den"] += float((tv ** 2).sum())
    return {
        g: {
            "max_abs_err": d["max_abs_err"],
            "rel_l2_err": (d["num"] ** 0.5) / max(d["den"] ** 0.5, 1e-30),
        }
        for g, d in groups.items()
    }


def run(*, steps: int, batch: int, seed: int = 0, codebook_size: int = 21000,
        num_kg_nodes: int = 20000, text_len: int = 32, max_nodes: int = 16,
        max_edges: int = 32, bert: TextEncoderConfig = TINY_BERT) -> dict:
    cfg = harness_config(
        codebook_size=codebook_size, num_kg_nodes=num_kg_nodes, bert=bert
    )
    oracle = build_composed_train_oracle(cfg.model, seed=seed)
    params = convert_composed_oracle(oracle, cfg.model)
    model = MultimodalTokenizer(cfg.model)
    mesh = make_mesh(1, 1, devices=jax.devices()[:1])

    rng = np.random.default_rng(seed)
    mk_batch = lambda: random_code_batch(
        rng, batch=batch, text_len=text_len, max_nodes=max_nodes,
        max_edges_per_graph=max_edges, text_vocab=cfg.model.text.vocab_size,
        num_kg_nodes=num_kg_nodes,
    )
    batches = [mk_batch() for _ in range(steps + 1)]

    # ---- flax state with the converted weights ----
    b0 = jax.tree.map(jnp.asarray, batches[0])
    state = create_train_state(cfg, model, b0, seed=seed)
    tx = make_optimizer(cfg)
    params = jax.tree.map(jnp.asarray, params)
    state = state.replace(params=params, opt_state=tx.init(params))

    report: dict = {
        "oracle": (
            "composed torch TRAIN pipeline: frozen HF BertModel + pure-torch "
            "GCNConv x2 (real + aug edges) + reference VectorQuantizer(train) "
            "+ imported reference loss.py assembly (train_MedTok.py:215-238)"
        ),
        "bert_shape": dataclasses.asdict(cfg.model.text),
        "codebook_size": codebook_size,
        "batch": batch,
        "steps": steps,
    }

    # ---- (a) step-0 loss + gradient parity ----
    t0 = time.perf_counter()
    t_in = code_batch_to_torch_train(batches[0])
    oracle.zero_grad()
    t_out = oracle(*t_in)
    t_loss, t_metrics = assemble_torch_losses(
        t_out, shared_loss_beta=cfg.train.shared_loss_beta,
        specific_loss_lamb=cfg.train.specific_loss_lamb,
    )
    t_loss.backward()
    t_grads = convert_composed_grads(oracle, cfg.model, params)

    dropout_rng = jax.random.PRNGKey(0)  # dropout-free config: inert
    grad_fn = jax.value_and_grad(_loss_fn, has_aux=True)
    (f_loss, (f_metrics, _)), f_grads = grad_fn(
        state.params, state.usage, model, b0, dropout_rng, cfg
    )

    text_grad_norm = float(
        sum(float(np.abs(np.asarray(g)).max())
            for g in jax.tree.leaves(f_grads["text_model"]))
    )
    report["step0"] = {
        "torch_loss": float(t_loss.detach()),
        "flax_loss": float(f_loss),
        "loss_abs_err": abs(float(t_loss.detach()) - float(f_loss)),
        "metric_abs_err": {
            k: abs(float(t_metrics[k].detach()) - float(f_metrics[k]))
            for k in t_metrics
        },
        "grad_err_by_group": compare_trees(t_grads, f_grads),
        "flax_frozen_bert_grad_max": text_grad_norm,
    }

    # ---- (b) N-step Adam trajectory ----
    trainable = [p for p in oracle.parameters() if p.requires_grad]
    opt = torch.optim.Adam(
        trainable, lr=cfg.train.lr,
        betas=(cfg.train.beta1, cfg.train.beta2), eps=1e-8,
    )
    step_fn = make_train_step(cfg, model, mesh, donate=False)

    t_losses, f_losses = [], []
    for i in range(steps):
        bi = batches[i]
        opt.zero_grad()
        out = oracle(*code_batch_to_torch_train(bi))
        loss, _ = assemble_torch_losses(
            out, shared_loss_beta=cfg.train.shared_loss_beta,
            specific_loss_lamb=cfg.train.specific_loss_lamb,
        )
        loss.backward()
        torch.nn.utils.clip_grad_norm_(trainable, cfg.train.max_grad_norm)
        opt.step()
        t_losses.append(float(loss.detach()))

        state, metrics = step_fn(state, jax.tree.map(jnp.asarray, bi))
        f_losses.append(float(metrics["loss"]))
        if (i + 1) % 10 == 0:
            print(f"  step {i+1}/{steps}: torch {t_losses[-1]:.6f} "
                  f"flax {f_losses[-1]:.6f}", flush=True)

    deltas = [abs(a - b) for a, b in zip(t_losses, f_losses)]
    rels = [d / max(abs(a), 1e-12) for d, a in zip(deltas, t_losses)]
    end_params = convert_composed_oracle(oracle, cfg.model)
    report["trajectory"] = {
        "torch_loss_first_last": [t_losses[0], t_losses[-1]],
        "flax_loss_first_last": [f_losses[0], f_losses[-1]],
        "loss_max_abs_delta": max(deltas),
        "loss_max_rel_delta": max(rels),
        "loss_final_abs_delta": deltas[-1],
        "descended": t_losses[-1] < t_losses[0] and f_losses[-1] < f_losses[0],
        "param_drift_err_by_group": compare_trees(
            jax.tree.map(jnp.asarray, end_params), state.params
        ),
        "torch_losses_every10": t_losses[::10],
        "flax_losses_every10": f_losses[::10],
    }
    report["wall_s"] = round(time.perf_counter() - t0, 1)
    return report


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--codebook", type=int, default=21000)
    ap.add_argument("--kg-nodes", type=int, default=20000)
    ap.add_argument("--out", default="docs/PARITY_REPORT.json")
    args = ap.parse_args()

    torch.set_num_threads(1)
    report = run(
        steps=args.steps, batch=args.batch, codebook_size=args.codebook,
        num_kg_nodes=args.kg_nodes,
    )
    out = Path(args.out)
    merged = json.loads(out.read_text()) if out.exists() else {}
    merged["train_dynamics"] = report
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(merged, indent=2) + "\n")
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
