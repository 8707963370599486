"""Data-parallel training over a jax.sharding.Mesh.

Replaces the reference's DDP loop (train_MedTok.py:32-341): one jitted
shard_map step over the 'dp' mesh axis — per-device local losses (in-batch
InfoNCE negatives stay device-local, exactly matching DDP semantics where each
rank computes its own loss and gradients are all-reduce-averaged), grads
psum-averaged over ICI, optax Adam + global-norm clipping, optional parameter
EMA (utils/ema.py:4-22), codebook-usage FIFO threaded as explicit state.
"""

from __future__ import annotations


import time
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct
from flax.core import FrozenDict
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from medtok_tpu.config import MedTokConfig
from medtok_tpu.data.types import CodeBatch
from medtok_tpu.models.tokenizer_model import MultimodalTokenizer
from medtok_tpu.parallel.mesh import DP_AXIS, make_mesh
from medtok_tpu.train.losses import assemble_losses


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    opt_state: Any
    usage: Any                      # {'codebook_used': int32[buffer]}
    ema_params: Any = None          # optional EMA of params
    rng: jax.Array = None


def _trainable_mask(params) -> Any:
    """True for trainable leaves; the frozen text encoder (tokenizer.py:80-81)
    is excluded — no Adam state (~880 MB for BERT-base) and no gradient
    traffic for 110M parameters whose grads are identically zero."""
    return {
        k: jax.tree.map(lambda _: k != "text_model", v)
        for k, v in params.items()
    }


def make_optimizer(cfg: MedTokConfig) -> optax.GradientTransformation:
    """Adam(lr, b1, b2) with global-norm clipping (train_MedTok.py:106,
    242-244), masked to the trainable (non-frozen-BERT) subtree."""
    t = cfg.train
    txs = []
    if t.max_grad_norm and t.max_grad_norm > 0:
        txs.append(optax.clip_by_global_norm(t.max_grad_norm))
    txs.append(optax.adam(t.lr, b1=t.beta1, b2=t.beta2))
    # NOTE: optax.masked changes the opt_state pytree layout — checkpoints
    # written by the pre-mask optimizer (commit c92e6fd and earlier) cannot be
    # restored across that boundary.
    return optax.masked(optax.chain(*txs), _trainable_mask)


def create_train_state(
    cfg: MedTokConfig, model: MultimodalTokenizer, example_batch: CodeBatch,
    seed: int | None = None,
) -> TrainState:
    seed = cfg.train.global_seed if seed is None else seed
    rng = jax.random.PRNGKey(seed)
    p_rng, d_rng, state_rng = jax.random.split(rng, 3)
    variables = model.init(
        {"params": p_rng, "dropout": d_rng}, example_batch, train=True
    )
    params = variables["params"]
    usage = variables.get("usage", FrozenDict({}))
    tx = make_optimizer(cfg)
    # EMA starts as a COPY of params (update_ema(decay=0), train_MedTok.py:179)
    # — distinct buffers, or donation would see the same buffer twice.
    ema_params = jax.tree.map(jnp.copy, params) if cfg.train.ema else None
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=tx.init(params),
        usage=usage,
        ema_params=ema_params,
        rng=state_rng,
    )


def _loss_fn(params, usage, model, batch, dropout_rng, cfg: MedTokConfig,
             packed=None):
    out, mutated = model.apply(
        {"params": params, "usage": usage},
        batch, train=True, packed=packed,
        rngs={"dropout": dropout_rng},
        mutable=["usage"],
    )
    breakdown = assemble_losses(
        out,
        shared_loss_beta=cfg.train.shared_loss_beta,
        specific_loss_lamb=cfg.train.specific_loss_lamb,
        entropy_loss_ratio=cfg.model.quantizer.entropy_loss_ratio,
    )
    return breakdown.total, (breakdown.metrics, mutated.get("usage", usage))


def kmeans_init_codebook(
    model: MultimodalTokenizer, state: TrainState, batches, rng=None
) -> TrainState:
    """Cosine-kmeans codebook initialization from the first batch(es)'
    shared-path features (QuantizerConfig.use_kmeans / the reference's
    --kmeans flag; its soft-VQ path constructs an EmbeddingEMA codebook but
    never runs the init — this is the completed TPU-native version)."""
    import numpy as np

    from medtok_tpu.ops.ema import kmeans

    rng = jax.random.PRNGKey(0) if rng is None else rng
    feats = []
    enc = jax.jit(lambda p, u, b: model.apply(
        {"params": p, "usage": u}, b, method=MultimodalTokenizer.encode_shared
    ))
    for b in batches:
        zt, zg = enc(state.params, state.usage, b)
        feats += [np.asarray(zt), np.asarray(zg)]
    data = jnp.asarray(np.concatenate(feats, axis=0))
    if "ema_codebook" in state.usage.get("quantize", {}):
        # completed --kmeans mode: the codebook is EMA state in the usage
        # collection (models/quantizer.py setup), not a gradient param
        usage_q = dict(state.usage["quantize"])
        n_e = usage_q["ema_codebook"].shape[0]
        means, bins = kmeans(rng, data, n_e, num_iters=10,
                             use_cosine_sim=True)
        usage_q["ema_codebook"] = means.astype(
            usage_q["ema_codebook"].dtype)
        usage_q["ema_cluster"] = bins.astype(usage_q["ema_cluster"].dtype)
        usage = dict(state.usage)
        usage["quantize"] = usage_q
        return state.replace(usage=usage)
    n_e = state.params["quantize"]["codebook"].shape[0]
    means, _ = kmeans(rng, data, n_e, num_iters=10, use_cosine_sim=True)
    params = dict(state.params)
    params["quantize"] = dict(params["quantize"])
    params["quantize"]["codebook"] = means.astype(
        state.params["quantize"]["codebook"].dtype
    )
    return state.replace(params=params)


def make_train_step(
    cfg: MedTokConfig, model: MultimodalTokenizer, mesh: Mesh,
    *, donate: bool = True, packed: bool = False,
) -> Callable[[TrainState, CodeBatch], tuple[TrainState, dict]]:
    """Build the jitted DP train step.

    Inside shard_map each device sees its local batch shard; gradients are
    psum-averaged over 'dp' (the XLA/ICI equivalent of DDP's NCCL gradient
    all-reduce, SURVEY.md section 2.6) and the optimizer update runs
    replicated — bitwise identical across devices.

    ``packed``: the step takes a third PackedTextBatch argument and the
    frozen text encoder runs over shared packed rows (each device's rows
    and gather indices are shard-local, TrainConfig.packed_text).
    """
    tx = make_optimizer(cfg)
    multi_device = mesh.size > 1

    def step_fn(state: TrainState, batch: CodeBatch, packed_b=None):
        rng = jax.random.fold_in(state.rng, state.step)
        # per-device decorrelated dropout, like per-rank seeds (train_MedTok.py:43)
        rng = jax.random.fold_in(
            rng, jax.lax.axis_index(DP_AXIS) if multi_device else 0
        )

        grad_fn = jax.value_and_grad(_loss_fn, has_aux=True)
        (loss, (metrics, usage)), grads = grad_fn(
            state.params, state.usage, model, batch, rng, cfg, packed_b
        )
        if multi_device:
            # frozen-BERT grads are identically zero — skip their pmean
            # (440 MB of pointless ICI traffic per step for BERT-base)
            grads = {
                k: v if k == "text_model" else jax.lax.pmean(v, DP_AXIS)
                for k, v in grads.items()
            }
            metrics = jax.lax.pmean(metrics, DP_AXIS)

        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)

        ema_params = state.ema_params
        if ema_params is not None:
            d = cfg.train.ema_decay
            ema_params = jax.tree.map(
                lambda e, p: e * d + p.astype(e.dtype) * (1.0 - d),
                ema_params, params,
            )
        new_state = state.replace(
            step=state.step + 1,
            params=params,
            opt_state=opt_state,
            usage=usage,
            ema_params=ema_params,
        )
        return new_state, metrics

    donate_args = (0,) if donate else ()
    if not multi_device:
        # Single-device mesh: plain jit — no collectives to emit, one fewer
        # transform in the stack. (Measured equal to the shard_map path in
        # steady state, ~53ms/step at B=256 on v5e; early runs that looked
        # slower were shared-pool transients.) The model must have
        # dp_axis=None since there is no mesh axis to gather over.
        assert model.dp_axis is None and model.tp_axis is None, (
            "single-device train step requires dp_axis=tp_axis=None"
        )
        if not packed:
            return jax.jit(
                lambda state, batch: step_fn(state, batch),
                donate_argnums=donate_args,
            )
        return jax.jit(step_fn, donate_argnums=donate_args)

    replicated = P()
    batch_spec = CodeBatch(*([P(DP_AXIS)] * len(CodeBatch._fields)))
    in_specs = [replicated, batch_spec]
    if packed:
        from medtok_tpu.data.types import PackedTextBatch

        in_specs.append(
            PackedTextBatch(*([P(DP_AXIS)] * len(PackedTextBatch._fields)))
        )

    sharded = shard_map(
        step_fn if packed else (lambda state, batch: step_fn(state, batch)),
        mesh=mesh,
        in_specs=tuple(in_specs),
        out_specs=(replicated, replicated),
        check_vma=False,
    )
    return jax.jit(sharded, donate_argnums=donate_args)


class Trainer:
    """Host-side loop: step dispatch, metric logging, checkpoint rotation.

    Mirrors the contract of train_MedTok.py's main(): config frozen to
    args.json next to checkpoints, ckpt every `ckpt_every` steps with
    `max_checkpoints` rotation, steps/sec + 20-scalar metrics each
    `log_every` (train_MedTok.py:57, 255-293, 300-333).
    """

    def __init__(
        self,
        cfg: MedTokConfig,
        model: MultimodalTokenizer | None = None,
        mesh: Mesh | None = None,
        workdir: str | None = None,
        log_fn: Callable[[int, dict], None] | None = None,
    ):
        self.cfg = cfg
        if jax.process_count() > 1:
            # gloo/ICI context init on a tiny program BEFORE the train step's
            # big compile — rank compile skew otherwise exceeds the backend's
            # first-collective connect window (see mesh.warmup_collectives)
            from medtok_tpu.parallel.mesh import warmup_collectives

            warmup_collectives()
        self.mesh = mesh if mesh is not None else make_mesh(cfg.train.mesh_dp, cfg.train.mesh_tp)
        tp = self.mesh.shape.get("tp", 1)
        if model is None:
            from medtok_tpu.parallel.mesh import TP_AXIS

            multi = self.mesh.size > 1
            model = MultimodalTokenizer(
                cfg.model,
                dp_axis=DP_AXIS if multi else None,
                tp_axis=TP_AXIS if tp > 1 else None,
            )
        self.model = model
        self.workdir = workdir
        self.log_fn = log_fn
        self.step_fn = make_train_step(
            cfg, self.model, self.mesh, packed=cfg.train.packed_text
        )
        self._ckpt = None
        if workdir is not None:
            from medtok_tpu.utils.checkpoint import CheckpointManager

            self._ckpt = CheckpointManager(
                workdir, max_to_keep=cfg.train.max_checkpoints, config=cfg
            )

    def init_state(self, example_batch: CodeBatch) -> TrainState:
        state = create_train_state(self.cfg, self.model, example_batch)
        if self._ckpt is not None and self._ckpt.latest_step() is not None:
            state = self._ckpt.restore(state)
        return state

    def fit(self, state: TrainState, batches, *, max_steps: int | None = None):
        """Run over an iterable of host CodeBatches; returns final state.

        Batches are HOST-LOCAL: on a multi-host pod each process feeds its
        rank shard of the global batch (epoch_batches(process_index=...)) and
        shard_host_local_batch assembles the global dp-sharded array — the
        DistributedSampler + DDP contract (train_MedTok.py:115-121). On a
        single host this degenerates to shard_batch."""
        from medtok_tpu.parallel.mesh import shard_host_local_batch

        t = self.cfg.train
        pack_rows = t.packed_rows_per_shard
        dp = self.mesh.shape.get(DP_AXIS, 1)
        nproc = jax.process_count()
        if t.packed_text and dp % nproc != 0:
            raise ValueError(
                f"packed_text needs dp ({dp}) divisible by process count "
                f"({nproc}): each process packs its own contiguous dp shards"
            )
        local_dp = dp // nproc  # dp shards this process's local batch covers
        log_t0 = time.time()
        log_steps = 0
        running = 0.0
        for batch in batches:
            step = int(state.step)
            if max_steps is not None and step >= max_steps:
                break
            packed_b = None
            if t.packed_text:
                from medtok_tpu.data.packing import pack_code_batch

                # each process packs its LOCAL batch into its own contiguous
                # local_dp shard blocks — the multi-host generalisation of
                # per-shard packing (the rank-shard contract of
                # train_MedTok.py:115-131's DistributedSampler)
                ids = np.asarray(batch.input_ids)
                am = np.asarray(batch.attention_mask)
                if pack_rows == 0:   # auto budget, fixed after first batch
                    est = max(
                        2,
                        int(np.ceil(
                            1.3 * am.sum() / local_dp / t.packed_row_len
                        )),
                    )
                    if nproc > 1:
                        # all ranks must agree on the static row budget
                        from jax.experimental import multihost_utils

                        est = int(multihost_utils.process_allgather(
                            np.asarray([est], np.int64)
                        ).max())
                    pack_rows = est
                try:
                    packed_np = pack_code_batch(
                        ids, am, shards=local_dp, rows_per_shard=pack_rows,
                        row_len=t.packed_row_len,
                    )
                except ValueError as e:
                    if "rows" in str(e):  # row-budget overflow is fixable
                        raise ValueError(
                            f"{e} — raise TrainConfig.packed_rows_per_shard "
                            f"(current {pack_rows})"
                        ) from e
                    raise  # e.g. batch not divisible by shards: not a budget issue
                packed_b = shard_host_local_batch(
                    self.mesh, jax.tree.map(np.asarray, packed_np)
                )
            batch = shard_host_local_batch(self.mesh, batch)
            state, metrics = (
                self.step_fn(state, batch, packed_b)
                if t.packed_text else self.step_fn(state, batch)
            )
            log_steps += 1
            if (step + 1) % t.log_every == 0:
                metrics = jax.device_get(metrics)
                dt = time.time() - log_t0
                metrics["steps_per_sec"] = log_steps / max(dt, 1e-9)
                if self.log_fn is not None:
                    self.log_fn(step + 1, metrics)
                log_t0, log_steps = time.time(), 0
            if self._ckpt is not None and (step + 1) % t.ckpt_every == 0:
                self._ckpt.save(state)
        return state
