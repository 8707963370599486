"""ZeRO-equivalent sharding configuration for TPU meshes.

Reference surface: MedTok/utils/deepspeed.py:1-87 `create_deepspeed_config`
— a DeepSpeed JSON generator (Adam params, fp16 loss-scaling / bf16, ZeRO
stage 0-3 with hand-tuned comm bucket sizes). It is dead code in the
reference (never imported by any entry point), rebuilt here for inventory
parity as the TPU-native analogue.

TPU-native design: DeepSpeed's ZeRO stages are, on a TPU mesh, nothing but
sharding annotations over the data axis — XLA's SPMD partitioner then inserts
the reduce_scatter / all_gather collectives that DeepSpeed's buckets
hand-schedule over NCCL, and sizes them itself (no bucket knobs needed):

  stage 0  replicated params + opt state; grads psum'd        (plain DDP)
  stage 1  optimizer STATE sharded over dp                    (ZeRO-1)
  stage 2  stage 1; XLA lowers the grad reduction feeding the
           sharded update to reduce_scatter automatically      (ZeRO-2)
  stage 3  PARAMS sharded over dp too; all_gather on use       (ZeRO-3/FSDP)

`create_zero_config` keeps the reference's config-dict shape (optimizer /
precision / gradient_clipping / zero_optimization keys) so driver code can be
written against either; `zero_plan` turns a stage + mesh + pytrees into
NamedSharding pytrees ready for `jax.jit(in_shardings=...)` or
`jax.device_put`. fp16 loss-scale knobs (deepspeed.py:20-27) are inapplicable
— TPU mixed precision is bf16, which needs no loss scaling.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from medtok_tpu.parallel.mesh import DP_AXIS


def create_zero_config(
    *,
    global_batch_size: int,
    gradient_accumulation_steps: int = 1,
    lr: float = 1e-4,
    weight_decay: float = 0.0,
    beta1: float = 0.9,
    beta2: float = 0.999,
    mixed_precision: str = "bf16",
    clip_grad: float | None = None,
    zero_stage: int = 0,
) -> dict:
    """Config-dict generator mirroring create_deepspeed_config
    (deepspeed.py:1-87), with the ZeRO block expressed as sharding intent
    instead of NCCL bucket sizes."""
    if zero_stage not in (0, 1, 2, 3):
        raise ValueError(f"zero_stage must be 0..3, got {zero_stage}")
    if mixed_precision not in ("bf16", "fp32", "none"):
        # fp16 (deepspeed.py:20-27) intentionally unsupported: bf16 covers
        # the TPU MXU and needs no dynamic loss scaling.
        raise ValueError(
            f"mixed_precision must be bf16/fp32/none on TPU, got "
            f"{mixed_precision!r} (fp16 loss-scaling is a GPU artifact)"
        )
    cfg = {
        "train_batch_size": global_batch_size,
        "gradient_accumulation_steps": gradient_accumulation_steps,
        "optimizer": {
            "type": "Adam",
            "adam_w_mode": weight_decay > 0,
            "params": {
                "lr": lr,
                "weight_decay": weight_decay,
                "bias_correction": True,
                "betas": [beta1, beta2],
            },
        },
        "bf16": {"enabled": mixed_precision == "bf16"},
        "zero_optimization": {
            "stage": zero_stage,
            "shard_optimizer_state": zero_stage >= 1,
            "reduce_scatter_gradients": zero_stage >= 2,
            "shard_parameters": zero_stage >= 3,
        },
    }
    if clip_grad is not None:
        cfg["gradient_clipping"] = clip_grad
    return cfg


def dp_shard_spec(shape: tuple, n_shards: int) -> P:
    """PartitionSpec sharding the LARGEST axis divisible by n_shards over dp;
    replicated if no axis divides (small biases/scalars — their all-gather
    would cost more than their storage, same reasoning as DeepSpeed's
    stage3_param_persistence_threshold, deepspeed.py:78)."""
    if not shape:
        return P()
    divisible = [d for d in range(len(shape)) if shape[d] % n_shards == 0]
    if not divisible:
        return P()
    axis = max(divisible, key=lambda d: shape[d])
    spec = [None] * len(shape)
    spec[axis] = DP_AXIS
    return P(*spec)


def _shard_tree(tree: Any, mesh: Mesh, n: int) -> Any:
    def one(x):
        shape = tuple(np.shape(x))
        return NamedSharding(mesh, dp_shard_spec(shape, n))

    return jax.tree.map(one, tree)


def _replicate_tree(tree: Any, mesh: Mesh) -> Any:
    return jax.tree.map(lambda _: NamedSharding(mesh, P()), tree)


def zero_plan(
    stage: int, mesh: Mesh, params: Any, opt_state: Any = None
) -> dict:
    """Sharding pytrees for a ZeRO stage over the mesh's dp axis.

    Returns {'params': ..., 'opt_state': ...} NamedSharding pytrees (opt_state
    omitted when not given). Feed to jax.device_put / jit in_shardings; XLA
    emits the stage's collectives (reduce_scatter for sharded updates,
    all_gather for stage-3 parameter use) over ICI.
    """
    if stage not in (0, 1, 2, 3):
        raise ValueError(f"zero stage must be 0..3, got {stage}")
    n = mesh.shape[DP_AXIS]
    plan = {
        "params": (
            _shard_tree(params, mesh, n)
            if stage >= 3
            else _replicate_tree(params, mesh)
        )
    }
    if opt_state is not None:
        plan["opt_state"] = (
            _shard_tree(opt_state, mesh, n)
            if stage >= 1
            else _replicate_tree(opt_state, mesh)
        )
    return plan


def apply_zero(stage: int, mesh: Mesh, params: Any, opt_state: Any = None):
    """device_put params (and opt_state) per zero_plan; returns the same
    structure(s) as global sharded jax.Arrays."""
    plan = zero_plan(stage, mesh, params, opt_state)
    params = jax.tree.map(jax.device_put, params, plan["params"])
    if opt_state is None:
        return params
    opt_state = jax.tree.map(jax.device_put, opt_state, plan["opt_state"])
    return params, opt_state
