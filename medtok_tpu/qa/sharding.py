"""Mesh sharding for the QA LLM — Llama-3.1-8B does not fit one v5e chip.

The reference sidesteps this with HF ``device_map="auto"`` naive layer
placement + torchrun DDP (MedTok_fintune_llama3.py:76-80, 200-206). The
TPU-native design is Megatron-style tensor parallelism expressed as sharding
ANNOTATIONS on the param pytree over a (dp, tp) ``jax.sharding.Mesh`` —
XLA's SPMD partitioner then inserts the all-gathers/reduce-scatters over ICI
(the scaling-book recipe: pick a mesh, annotate, let XLA place collectives).

Layout (column-parallel in, row-parallel out per transformer block):
- q/k/v projections: output dim over tp (head-sharded attention)
- o_proj: input dim over tp (row-parallel, psum at block output)
- MLP gate/up: output (intermediate) dim over tp; down: input dim over tp
- embed_tokens / lm_head: vocab dim over tp
- norms, LoRA A, soft-prompt projector: replicated (tiny)
- LoRA B: output dim over tp, matching its base projection
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from medtok_tpu.parallel.mesh import TP_AXIS


def llama_param_spec(path: tuple) -> P:
    """PartitionSpec for one param leaf, keyed on its tree path."""
    keys = [getattr(p, "key", str(p)) for p in path]

    def has(*names):
        return any(k in keys for k in names)

    if has("embedding"):          # embed_tokens [V, H]
        return P(TP_AXIS, None)
    if has("lm_head"):            # kernel [H, V]
        return P(None, TP_AXIS)
    if has("lora_a"):             # [in, r] — tiny, replicate
        return P()
    if has("q_proj", "k_proj", "v_proj"):
        # base kernel [H, out] or lora_b [r, out]: shard the head/out dim
        return P(None, TP_AXIS)
    if has("o_proj"):
        if has("lora_b"):         # [r, H] — r is tiny, replicate
            return P()
        return P(TP_AXIS, None)   # base kernel [H, H]: row-parallel input
    if has("gate_proj", "up_proj"):
        return P(None, TP_AXIS)   # [H, I]
    if has("down_proj"):
        return P(TP_AXIS, None)   # [I, H]
    return P()                    # norms, biases, projector, misc


def shard_qa_params(params, mesh: Mesh):
    """device_put the {'llm': ..., 'soft_prompt': ...} tree with TP layouts
    (soft-prompt side fully replicated — it is a single small projector)."""

    def place(path, x):
        spec = llama_param_spec(path) if path and getattr(
            path[0], "key", None
        ) == "llm" else P()
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, params)


def check_divisibility(cfg, tp: int) -> None:
    dh = cfg.hidden_size // cfg.num_heads
    assert (cfg.num_kv_heads * dh) % tp == 0, (
        f"kv width {cfg.num_kv_heads * dh} not divisible by tp={tp}"
    )
    assert cfg.intermediate_size % tp == 0
    assert cfg.vocab_size % tp == 0
