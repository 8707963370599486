"""LoRA finetuning of the soft-prompted LLM on MedTok QA datasets.

Equivalent of MedTok_fintune_llama3.py:43-262: LoRA (r=16, alpha=32,
q_proj/v_proj) + the soft-prompt projector are the ONLY trainable params;
the base LLM is frozen — the step differentiates w.r.t. the trainable
subtree alone (partition_params), so no grad/optimizer buffers exist for
the base. Data: JSON rows {"input": [q, a], "medical_codes": [...]} packed
by qa.prompting.
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax

from medtok_tpu.qa.llama import LlamaConfig, LlamaModel
from medtok_tpu.qa.softprompt import MedTokSoftPrompt


@dataclasses.dataclass
class QAFinetuneConfig:
    lora_rank: int = 16
    lora_alpha: float = 32.0
    lora_targets: tuple[str, ...] = ("q_proj", "v_proj")
    cutoff_len: int = 256
    total_len: int = 512
    lr: float = 3e-4
    batch_size: int = 16
    epochs: int = 1
    seed: int = 0
    # mesh: dp shards the batch, tp shards the frozen LLM Megatron-style
    # (qa.sharding; 8B bf16 does not fit one v5e chip). 1x1 = single device.
    mesh_dp: int = 1
    mesh_tp: int = 1


class QAFinetuner:
    def __init__(
        self,
        llm_cfg: LlamaConfig,
        embeddings: np.ndarray,
        cfg: QAFinetuneConfig = QAFinetuneConfig(),
        *,
        devices=None,
    ):
        """``devices``: optional explicit device list for the (dp, tp) mesh —
        e.g. an abstract TPU topology's devices for AOT memory analysis
        (scripts/qa_8b_memory_tpu.py) — defaults to jax.devices()."""
        self.cfg = cfg
        self.llm_cfg = dataclasses.replace(
            llm_cfg, lora_rank=cfg.lora_rank, lora_alpha=cfg.lora_alpha,
            lora_targets=cfg.lora_targets,
        )
        self.mesh = None
        if cfg.mesh_dp * cfg.mesh_tp > 1:
            from medtok_tpu.parallel.mesh import make_mesh
            from medtok_tpu.qa.sharding import check_divisibility

            check_divisibility(self.llm_cfg, cfg.mesh_tp)
            self.mesh = make_mesh(dp=cfg.mesh_dp, tp=cfg.mesh_tp,
                                  devices=devices)
        # mesh passed into the model: enables Megatron TP activation
        # constraints inside the layers (head-sharded attention buffers)
        self.model = LlamaModel(self.llm_cfg, mesh=self.mesh)
        self.soft_prompt = MedTokSoftPrompt(
            embeddings=embeddings, hidden_size=self.llm_cfg.hidden_size,
            cutoff_len=cfg.cutoff_len,
        )
        # the optimizer sees ONLY the trainable subtree (LoRA + projector):
        # the step differentiates w.r.t. that subtree alone, so no gradient
        # or adam-moment buffers ever materialize for the frozen 8B base —
        # at 8B that is the difference between ~2 GB/chip and ~6 GB/chip of
        # extra state on a 16 GB v5e (MedTok_fintune_llama3.py:241-246's
        # LoRA-only state_dict, taken to its memory conclusion)
        self.tx = optax.adamw(cfg.lr)
        # donate the trainable params + opt state (updated in place); the
        # frozen base flows through unchanged and is never copied
        self._step = jax.jit(self._step_impl, donate_argnums=(0, 2))

    # trainability mask: LoRA + projector only (MedTok_fintune_llama3.py:241-246)
    @staticmethod
    def trainable_mask(params) -> dict:
        def mark(path, _):
            keys = [getattr(p, "key", str(p)) for p in path]
            return any(k in ("lora_a", "lora_b", "projector") for k in keys)

        return jax.tree_util.tree_map_with_path(mark, params)

    def init_params(self, llm_params, rng=None):
        """Combine converted/initialized LLM params with fresh soft-prompt +
        LoRA params. llm_params may lack lora_a/lora_b (converter output) —
        missing leaves are initialized."""
        rng = jax.random.PRNGKey(self.cfg.seed) if rng is None else rng
        B, L = 1, self.cfg.cutoff_len + 8
        dummy_ids = jnp.zeros((B, L), jnp.int32)
        dummy_mask = jnp.ones((B, L), jnp.int32)
        init_llm = self.model.init({"params": rng}, dummy_ids[:, : 8])["params"]
        merged = _merge_params(init_llm, llm_params)
        sp = self.soft_prompt.init(
            {"params": jax.random.fold_in(rng, 1)},
            dummy_ids, dummy_mask, None,
            lambda ids: jnp.zeros(
                ids.shape + (self.llm_cfg.hidden_size,), jnp.float32
            ),
            self.cfg.total_len,
        )["params"]
        params = {"llm": merged, "soft_prompt": sp}
        if self.mesh is not None:
            from medtok_tpu.qa.sharding import shard_qa_params

            params = shard_qa_params(params, self.mesh)
        return params

    def shard_batch(self, batch: dict) -> dict:
        """Batch axis over dp, replicated over tp."""
        if self.mesh is None:
            return batch
        from jax.sharding import NamedSharding, PartitionSpec as P

        from medtok_tpu.parallel.mesh import DP_AXIS

        sh = NamedSharding(self.mesh, P(DP_AXIS))
        return {k: jax.device_put(np.asarray(v), sh) for k, v in batch.items()}

    def loss_fn(self, params, batch, train=True):
        llm_p, sp_p = params["llm"], params["soft_prompt"]

        def embed_fn(ids):
            return self.model.apply({"params": llm_p}, ids, method=LlamaModel.embed)

        packed = self.soft_prompt.apply(
            {"params": sp_p},
            jnp.asarray(batch["input_ids"]),
            jnp.asarray(batch["attention_mask"]),
            jnp.asarray(batch["labels"]),
            embed_fn,
            self.cfg.total_len,
        )
        hidden, _ = self.model.apply(
            {"params": llm_p},
            inputs_embeds=packed.inputs_embeds,
            attention_mask=packed.attention_mask,
            return_hidden=True,
        )
        # Causal LM shift: predict token t+1 from position t — but only over
        # the LABEL WINDOW. The soft-prompt packer right-aligns rows, so all
        # non -100 labels live at positions >= cutoff_len; at 8B the
        # full-sequence [B, L, 128256] logits would be the largest buffer in
        # the whole train step (fwd + cotangent), for positions that are all
        # masked out.
        cl = self.cfg.cutoff_len
        hidden = hidden[:, cl - 1:-1]
        labels = packed.labels[:, cl:]
        logits = self.model.apply(
            {"params": llm_p}, hidden, method=LlamaModel.apply_lm_head
        )
        if self.mesh is not None:
            # keep the vocab axis TP-sharded through the loss: the logsumexp
            # and label gather reduce shard-wise with a psum instead of
            # all-gathering [B, W, V] logits onto every chip
            from jax.sharding import NamedSharding, PartitionSpec as P

            from medtok_tpu.parallel.mesh import TP_AXIS

            logits = jax.lax.with_sharding_constraint(
                logits,
                NamedSharding(self.mesh, P(P.UNCONSTRAINED, None, TP_AXIS)),
            )
        logits = logits.astype(jnp.float32)
        valid = labels != -100
        safe = jnp.where(valid, labels, 0)
        ll = optax.softmax_cross_entropy_with_integer_labels(logits, safe)
        return jnp.sum(ll * valid) / jnp.maximum(jnp.sum(valid), 1)

    def _step_impl(self, train_p, frozen_p, opt_state, batch):
        """Differentiates w.r.t. the trainable subtree ONLY: XLA never builds
        the [H, H]/[H, I] gradient matmuls or buffers for the frozen base."""
        loss, grads = jax.value_and_grad(
            lambda tp: self.loss_fn(combine_params(tp, frozen_p), batch)
        )(train_p)
        updates, opt_state = self.tx.update(grads, opt_state, train_p)
        train_p = optax.apply_updates(train_p, updates)
        return train_p, opt_state, loss

    def split_params(self, params):
        """(trainable, frozen) complementary trees with None holes."""
        return partition_params(params, self.trainable_mask(params))

    def fit(
        self, params, rows: list[dict],
        *, log_fn: Callable[[int, float], None] | None = None,
    ):
        cfg = self.cfg
        train_p, frozen_p = self.split_params(params)
        opt_state = self.tx.init(train_p)
        rng = np.random.default_rng(cfg.seed)
        step = 0
        for _ in range(cfg.epochs):
            order = rng.permutation(len(rows))
            for start in range(0, len(rows) - cfg.batch_size + 1, cfg.batch_size):
                batch = _collate_rows(
                    [rows[i] for i in order[start:start + cfg.batch_size]],
                    cutoff_len=cfg.cutoff_len,
                )
                train_p, opt_state, loss = self._step(
                    train_p, frozen_p, opt_state, self.shard_batch(batch)
                )
                step += 1
                if log_fn:
                    log_fn(step, float(loss))
        return combine_params(train_p, frozen_p)


def partition_params(params, mask):
    """Split a param tree into complementary (trainable, frozen) trees; the
    missing positions hold None (an empty pytree node, so optax/grad skip
    them)."""
    train = jax.tree.map(lambda p, m: p if m else None, params, mask)
    frozen = jax.tree.map(lambda p, m: None if m else p, params, mask)
    return train, frozen


def combine_params(train, frozen):
    """Inverse of partition_params."""
    return jax.tree.map(
        lambda t, f: t if f is None else f, train, frozen,
        is_leaf=lambda x: x is None,
    )


def _collate_rows(rows: list[dict], *, cutoff_len: int) -> dict:
    """Pad packed rows to a common length (text part right-padded; labels
    -100-padded)."""
    tmax = max(len(r["input_ids"]) - cutoff_len for r in rows)
    B = len(rows)
    input_ids = np.zeros((B, cutoff_len + tmax), np.int32)
    attn = np.zeros((B, cutoff_len + tmax), np.int32)
    labels = np.full((B, tmax), -100, np.int32)
    for i, r in enumerate(rows):
        n = len(r["input_ids"]) - cutoff_len
        input_ids[i, :cutoff_len] = r["input_ids"][:cutoff_len]
        input_ids[i, cutoff_len:cutoff_len + n] = r["input_ids"][cutoff_len:]
        attn[i, :cutoff_len] = r["attention_mask"][:cutoff_len]
        attn[i, cutoff_len:cutoff_len + n] = r["attention_mask"][cutoff_len:]
        labels[i, :len(r["labels"])] = r["labels"]
    return {"input_ids": input_ids, "attention_mask": attn, "labels": labels}


def _merge_params(init_tree, loaded_tree):
    """Overlay loaded params onto an initialized tree (missing leaves keep
    their fresh init — e.g. LoRA adapters over a converted base)."""
    if loaded_tree is None:
        return init_tree
    if isinstance(init_tree, dict):
        out = {}
        for k, v in init_tree.items():
            out[k] = _merge_params(v, loaded_tree.get(k) if isinstance(loaded_tree, dict) else None)
        return out
    return loaded_tree if loaded_tree is not None else init_tree
