"""Fused flash attention (Pallas TPU) for the EHR patient encoder.

The reference EHR transformer attends over 2003-token sequences
(/root/reference/MedTok_EHR_Tutorial/EHRModel_token.py:236-237 with
max_medical_code=2000 + [CLS, gender, ethnicity]); materializing the
[B, H, L, L] score tensor costs ~16 GB fp32 at the reference batch size 256
— more than a v5e chip's HBM. This kernel computes softmax(QK^T)V with the
online-softmax recurrence in VMEM tiles: no L^2 tensor ever touches HBM, so
memory is O(B*H*L*Dh) and the matmuls stay on the MXU.

Semantics match ops in models/layers.py::MultiheadAttention:
- key padding mask (True = attendable), fp32 score accumulation,
- attention-probability dropout (torch nn.MultiheadAttention applies dropout
  AFTER softmax): the denominator uses undropped probabilities, dropped
  entries are zeroed and survivors scaled by 1/(1-rate) — distributionally
  identical to `dropout(softmax(s)) @ v`, with a counter-based xorshift hash
  so the same (seed, element) pair always draws the same mask on every
  platform (CPU interpret mode included; pltpu.prng_* has no CPU lowering).

Rows whose keys are ALL masked return zeros (the dense path returns a
uniform average over NEG_INF logits; such rows never occur in the EHR model
— slots 0..2 are always valid — and are discarded downstream elsewhere).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128          # f32 scratch lane width
_MASKED = -1e30       # finite -inf stand-in (inf-inf NaNs in the recurrence)


def _uniform_hash(seed, bh, row0, col0, bq, bk):
    """[bq, bk] uint32 counter-based hash (splitmix/xorshift rounds) of the
    GLOBAL (batch*head, query, key) coordinates — dropout masks are
    deterministic in (seed, element), independent of tiling."""
    rows = row0.astype(jnp.uint32) + jax.lax.broadcasted_iota(
        jnp.uint32, (bq, bk), 0
    )
    cols = col0.astype(jnp.uint32) + jax.lax.broadcasted_iota(
        jnp.uint32, (bq, bk), 1
    )
    x = rows * jnp.uint32(2654435761)
    x = x ^ (cols * jnp.uint32(0x85EB_CA6B))
    x = x ^ (seed.astype(jnp.uint32) + bh.astype(jnp.uint32) * jnp.uint32(0x9E37_79B9))
    for shift, mult in ((16, 0x7FEB_352D), (15, 0x846C_A68B)):
        x = x ^ (x >> jnp.uint32(shift))
        x = x * jnp.uint32(mult)
    return x ^ (x >> jnp.uint32(16))


def _flash_kernel(
    seed_ref, q_ref, k_ref, v_ref, mask_ref, o_ref, lse_ref,
    m_scratch, l_scratch, acc_scratch,
    *, sm_scale: float, dropout_rate: float, block_q: int, block_k: int,
    precision,
):
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _():
        m_scratch[:] = jnp.full_like(m_scratch, _MASKED)
        l_scratch[:] = jnp.zeros_like(l_scratch)
        acc_scratch[:] = jnp.zeros_like(acc_scratch)

    q = q_ref[0]                     # [bq, Dh]
    k = k_ref[0]                     # [bk, Dh]
    v = v_ref[0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        precision=precision
    ) * sm_scale                     # [bq, bk]
    valid = mask_ref[0] != 0         # [1, bk] -> broadcasts
    s = jnp.where(valid, s, _MASKED)

    m_prev = m_scratch[:]            # [bq, LANES], all lanes equal
    l_prev = l_scratch[:]
    m_cur = jnp.max(s, axis=-1, keepdims=True)          # [bq, 1]
    m_next = jnp.maximum(m_prev, m_cur)                 # [bq, LANES]
    alpha = jnp.exp(m_prev - m_next)
    p = jnp.where(valid, jnp.exp(s - m_next[:, :1]), 0.0)   # [bq, bk]
    l_cur = jnp.sum(p, axis=-1, keepdims=True)
    l_scratch[:] = l_prev * alpha + l_cur
    m_scratch[:] = m_next

    if dropout_rate > 0.0:
        # post-softmax prob dropout: numerator only — see module docstring
        bits = _uniform_hash(
            seed_ref[0], pl.program_id(0),
            pl.program_id(1) * block_q, ki * block_k, block_q, block_k,
        )
        keep = bits >= jnp.uint32(int(dropout_rate * 4294967296.0))
        p_num = jnp.where(keep, p / (1.0 - dropout_rate), 0.0)
    else:
        p_num = p
    acc_scratch[:] = acc_scratch[:] * alpha[:, :1] + jax.lax.dot_general(
        p_num.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=precision,
    )

    @pl.when(ki == pl.num_programs(2) - 1)
    def _():
        l = l_scratch[:, :1]
        safe_l = jnp.where(l == 0.0, 1.0, l)
        o_ref[0] = (acc_scratch[:] / safe_l).astype(o_ref.dtype)
        # log-sum-exp residual for the backward pass (all-masked rows get a
        # finite sentinel; their probabilities are re-masked in bwd anyway)
        lse_ref[0] = m_scratch[:, :1] + jnp.log(safe_l)


# ---------------------------------------------------------------------------
# Backward kernels.
#
# With the denominator-undropped dropout scheme, the classic flash backward
# identities survive unchanged (derivation): with a_ij = softmax row,
# ã_ij = keep_ij * a_ij / (1-r) and t_ij = keep_ij/(1-r) * (dO_i·V_j):
#   D_i      = dO_i · O_i = Σ_j a_ij t_ij          (same trick as no-dropout)
#   ds_ij    = a_ij (t_ij − D_i)
#   dV_j     = Σ_i ã_ij dO_i,   dQ_i = scale Σ_j ds_ij K_j,
#   dK_j     = scale Σ_i ds_ij Q_i
# a_ij is regenerated from the saved lse_i = m_i + log l_i, and keep_ij from
# the SAME counter hash as the forward — nothing L^2 is ever stored.
# ---------------------------------------------------------------------------


def _prob_and_t(q, k, v, do, valid, lse, d_term, *, sm_scale, dropout_rate,
                seed, bh, row0, col0, bq, bk, precision):
    """Shared bwd tile math: (a = p/l [bq,bk], ds [bq,bk], ã [bq,bk])."""
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        precision=precision
    ) * sm_scale
    a = jnp.where(valid, jnp.exp(s - lse), 0.0)          # [bq, bk]
    t = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        precision=precision,
    )                                                     # dO·V^T [bq, bk]
    if dropout_rate > 0.0:
        bits = _uniform_hash(seed, bh, row0, col0, bq, bk)
        keep = (bits >= jnp.uint32(int(dropout_rate * 4294967296.0))).astype(
            jnp.float32
        ) / (1.0 - dropout_rate)
        t = t * keep
        a_drop = a * keep
    else:
        a_drop = a
    ds = a * (t - d_term)
    return ds, a_drop


def _flash_bwd_dq_kernel(
    seed_ref, q_ref, k_ref, v_ref, mask_ref, lse_ref, dd_ref, do_ref,
    dq_ref, dq_acc,
    *, sm_scale: float, dropout_rate: float, block_q: int, block_k: int,
    precision,
):
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _():
        dq_acc[:] = jnp.zeros_like(dq_acc)

    ds, _ = _prob_and_t(
        q_ref[0], k_ref[0], v_ref[0], do_ref[0], mask_ref[0] != 0,
        lse_ref[0], dd_ref[0],
        sm_scale=sm_scale, dropout_rate=dropout_rate,
        seed=seed_ref[0], bh=pl.program_id(0),
        row0=pl.program_id(1) * block_q, col0=ki * block_k,
        bq=block_q, bk=block_k, precision=precision,
    )
    dq_acc[:] += sm_scale * jax.lax.dot_general(
        ds.astype(k_ref.dtype), k_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=precision,
    )

    @pl.when(ki == pl.num_programs(2) - 1)
    def _():
        dq_ref[0] = dq_acc[:].astype(dq_ref.dtype)


def _flash_bwd_dkv_kernel(
    seed_ref, q_ref, k_ref, v_ref, mask_ref, lse_ref, dd_ref, do_ref,
    dk_ref, dv_ref, dk_acc, dv_acc,
    *, sm_scale: float, dropout_rate: float, block_q: int, block_k: int,
    precision,
):
    qi = pl.program_id(2)

    @pl.when(qi == 0)
    def _():
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)

    q, do = q_ref[0], do_ref[0]
    ds, a_drop = _prob_and_t(
        q, k_ref[0], v_ref[0], do, mask_ref[0] != 0,
        lse_ref[0], dd_ref[0],
        sm_scale=sm_scale, dropout_rate=dropout_rate,
        seed=seed_ref[0], bh=pl.program_id(0),
        row0=qi * block_q, col0=pl.program_id(1) * block_k,
        bq=block_q, bk=block_k, precision=precision,
    )
    # transpose contractions: contract over the q rows of the tile
    dv_acc[:] += jax.lax.dot_general(
        a_drop.astype(do.dtype), do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=precision,
    )
    dk_acc[:] += sm_scale * jax.lax.dot_general(
        ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=precision,
    )

    @pl.when(qi == pl.num_programs(2) - 1)
    def _():
        dk_ref[0] = dk_acc[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[:].astype(dv_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9, 10))
def _flash_core(qf, kf, vf, maskf, seed_arr, H, sm_scale, dropout_rate,
                blocks, interpret, precision):
    out, _ = _flash_core_fwd(
        qf, kf, vf, maskf, seed_arr, H, sm_scale, dropout_rate, blocks,
        interpret, precision,
    )
    return out


def _flash_core_fwd(qf, kf, vf, maskf, seed_arr, H, sm_scale, dropout_rate,
                    blocks, interpret, precision):
    block_q, block_k = blocks
    BH, Lqp, Dh = qf.shape
    Lkp = kf.shape[1]
    grid = (BH, Lqp // block_q, Lkp // block_k)
    kernel = functools.partial(
        _flash_kernel, sm_scale=sm_scale, dropout_rate=dropout_rate,
        block_q=block_q, block_k=block_k, precision=precision,
    )
    out, lse = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, block_q, Dh), lambda b, qi, ki, *_: (b, qi, 0)),
                pl.BlockSpec((1, block_k, Dh), lambda b, qi, ki, *_: (b, ki, 0)),
                pl.BlockSpec((1, block_k, Dh), lambda b, qi, ki, *_: (b, ki, 0)),
                # per-BATCH key mask, shared across the H heads of a row
                # ([B, 1, Lk]: TPU block rules need the sublane dim to be a
                # multiple of 8 or the full array dim — 1 qualifies as full)
                pl.BlockSpec((1, 1, block_k),
                             lambda b, qi, ki, *_: (b // H, 0, ki)),
            ],
            out_specs=(
                pl.BlockSpec((1, block_q, Dh), lambda b, qi, ki, *_: (b, qi, 0)),
                pl.BlockSpec((1, block_q, 1), lambda b, qi, ki, *_: (b, qi, 0)),
            ),
            scratch_shapes=[
                pltpu.VMEM((block_q, _LANES), jnp.float32),   # running max
                pltpu.VMEM((block_q, _LANES), jnp.float32),   # running denom
                pltpu.VMEM((block_q, Dh), jnp.float32),       # output accum
            ],
        ),
        out_shape=(
            jax.ShapeDtypeStruct((BH, Lqp, Dh), qf.dtype),
            jax.ShapeDtypeStruct((BH, Lqp, 1), jnp.float32),
        ),
        interpret=interpret,
    )(seed_arr, qf, kf, vf, maskf)
    # Residuals are saved TRANSPOSED, [BH, Dh, Lp]: with small head dims the
    # native [BH, Lp, Dh] layout pads the 128-lane tile 8x (Dh=16) — at the
    # EHR shape (B=256, 4 layers) that is the difference between ~1 GB and
    # ~8 GB of saved activations. The bwd pass transposes back per use.
    return out, (
        qf.swapaxes(1, 2), kf.swapaxes(1, 2), vf.swapaxes(1, 2),
        maskf, seed_arr, lse, out.swapaxes(1, 2),
    )


def _flash_core_bwd(H, sm_scale, dropout_rate, blocks, interpret, precision,
                    res, g):
    qfT, kfT, vfT, maskf, seed_arr, lse, outT = res
    qf, kf, vf, out = (
        qfT.swapaxes(1, 2), kfT.swapaxes(1, 2), vfT.swapaxes(1, 2),
        outT.swapaxes(1, 2),
    )
    block_q, block_k = blocks
    BH, Lqp, Dh = qf.shape
    Lkp = kf.shape[1]
    g = g.astype(qf.dtype)
    # D_i = dO_i . O_i  (valid with dropout too — see derivation above)
    dd = jnp.sum(g.astype(jnp.float32) * out.astype(jnp.float32), axis=-1,
                 keepdims=True)

    q_spec = pl.BlockSpec((1, block_q, Dh), lambda b, qi, ki, *_: (b, qi, 0))
    r_spec = pl.BlockSpec((1, block_q, 1), lambda b, qi, ki, *_: (b, qi, 0))
    k_spec = pl.BlockSpec((1, block_k, Dh), lambda b, qi, ki, *_: (b, ki, 0))
    m_spec = pl.BlockSpec((1, 1, block_k),
                          lambda b, qi, ki, *_: (b // H, 0, ki))

    dq = pl.pallas_call(
        functools.partial(
            _flash_bwd_dq_kernel, sm_scale=sm_scale,
            dropout_rate=dropout_rate, block_q=block_q, block_k=block_k,
            precision=precision,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(BH, Lqp // block_q, Lkp // block_k),
            in_specs=[q_spec, k_spec, k_spec, m_spec, r_spec, r_spec, q_spec],
            out_specs=q_spec,
            scratch_shapes=[pltpu.VMEM((block_q, Dh), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((BH, Lqp, Dh), qf.dtype),
        interpret=interpret,
    )(seed_arr, qf, kf, vf, maskf, lse, dd, g)

    # dkv grid: (BH, k-blocks, q-blocks) — q is the reduction axis
    q_spec2 = pl.BlockSpec((1, block_q, Dh), lambda b, ki, qi, *_: (b, qi, 0))
    r_spec2 = pl.BlockSpec((1, block_q, 1), lambda b, ki, qi, *_: (b, qi, 0))
    k_spec2 = pl.BlockSpec((1, block_k, Dh), lambda b, ki, qi, *_: (b, ki, 0))
    m_spec2 = pl.BlockSpec((1, 1, block_k),
                           lambda b, ki, qi, *_: (b // H, 0, ki))
    dk, dv = pl.pallas_call(
        functools.partial(
            _flash_bwd_dkv_kernel, sm_scale=sm_scale,
            dropout_rate=dropout_rate, block_q=block_q, block_k=block_k,
            precision=precision,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(BH, Lkp // block_k, Lqp // block_q),
            in_specs=[q_spec2, k_spec2, k_spec2, m_spec2, r_spec2, r_spec2,
                      q_spec2],
            out_specs=(k_spec2, k_spec2),
            scratch_shapes=[
                pltpu.VMEM((block_k, Dh), jnp.float32),
                pltpu.VMEM((block_k, Dh), jnp.float32),
            ],
        ),
        out_shape=(
            jax.ShapeDtypeStruct((BH, Lkp, Dh), kf.dtype),
            jax.ShapeDtypeStruct((BH, Lkp, Dh), vf.dtype),
        ),
        interpret=interpret,
    )(seed_arr, qf, kf, vf, maskf, lse, dd, g)

    zero_mask = np.zeros(maskf.shape, jax.dtypes.float0)
    zero_seed = np.zeros(seed_arr.shape, jax.dtypes.float0)
    return dq, dk, dv, zero_mask, zero_seed


_flash_core.defvjp(_flash_core_fwd, _flash_core_bwd)


def dense_attention_bytes(
    batch: int, heads: int, q_len: int, kv_len: int,
    *, training: bool = False, resident_layers: int = 1,
) -> float:
    """Peak HBM the dense-attention path needs for its L^2 score tensors.

    Dense attention materializes fp32 logits and then the softmax
    probabilities for every [B, H, Lq, Lk] block. Under reverse-mode AD the
    probabilities are additionally saved as residuals — per layer — until
    the backward pass consumes them, so a ``resident_layers``-deep encoder
    keeps ``resident_layers`` score tensors alive at the bwd peak on top of
    the two (logits + probs) of the layer currently being differentiated.
    Inference peaks at logits+probs of a single layer (XLA frees the logits
    buffer once the probs fuse, but budgeting 2 copies is the safe bound
    the measurements were taken under).
    """
    per_layer = 4.0 * batch * heads * q_len * kv_len   # fp32 scores
    if training:
        return per_layer * (2.0 + max(resident_layers - 1, 0))
    return per_layer * 2.0


def choose_flash(
    batch: int, heads: int, q_len: int, kv_len: int,
    *, training: bool = False, resident_layers: int = 1,
    budget_bytes: float | None = None, backend: str | None = None,
) -> bool:
    """Measured-crossover dispatch between dense and flash attention.

    Where the dense [B, H, L, L] score tensor FITS in HBM, dense is the
    faster path on this hardware: flash_speedup 0.89 at 32x4x2048x16 in
    BENCH_r04 (0.96 in r3) — the Pallas kernel's tiling overhead never pays
    for itself when XLA can stream the whole score tensor. Flash is
    load-bearing purely on MEMORY grounds: at the reference EHR shape
    (B=256, H=4, L=2003, 4 layers under grad) dense needs ~16 GB of fp32
    scores per layer and cannot run at all. So the rule is a memory
    crossover, not a speed model: use flash iff the dense path's score
    residency exceeds the budget.

    ``budget_bytes`` defaults to 40% of the device's HBM (the other 60%
    covers params/optimizer/non-attention activations at the shapes this
    framework runs; v5e: 16 GiB total -> ~6.4 GiB score budget). Pass an
    explicit budget for other occupancy profiles.

    On non-TPU backends the answer is always False: the Pallas kernel runs
    in interpret mode there (orders of magnitude slower), and host memory
    dwarfs any score tensor these models produce.
    """
    if backend is None:
        backend = jax.default_backend()
    if backend != "tpu":
        return False
    if budget_bytes is None:
        budget_bytes = 0.4 * _device_hbm_bytes()
    need = dense_attention_bytes(
        batch, heads, q_len, kv_len,
        training=training, resident_layers=resident_layers,
    )
    return need > budget_bytes


def _device_hbm_bytes() -> float:
    """Per-device HBM capacity; memory_stats when the backend exposes it,
    else the v5e figure (16 GiB)."""
    try:
        stats = jax.devices()[0].memory_stats() or {}
        limit = stats.get("bytes_limit")
        if limit:
            return float(limit)
    except Exception:
        pass
    return 16.0 * 2**30


def flash_attention(
    q: jax.Array,                    # [B, H, Lq, Dh]
    k: jax.Array,                    # [B, H, Lk, Dh]
    v: jax.Array,                    # [B, H, Lk, Dh]
    key_mask: jax.Array | None = None,   # [B, Lk] bool/int, True = valid
    *,
    sm_scale: float | None = None,
    dropout_rate: float = 0.0,
    dropout_seed: int | jax.Array = 0,
    block_q: int = 256,
    block_k: int = 512,
    interpret: bool = False,
    precision: str = "highest",
) -> jax.Array:
    """softmax(q k^T / sqrt(Dh)) v without materializing the L^2 scores.

    Differentiable (custom VJP with tiled dq/dkv kernels); the dropout mask
    regenerates from the counter hash in backward, so nothing quadratic is
    ever saved.

    ``precision``: 'highest' = bf16x3 exact-fp32 matmuls (torch-parity
    surfaces); 'default' = single-pass bf16 MXU — measured 1.58x faster at
    the EHR shape (B=256, Dh=16) with ~8e-3 abs output error, the right
    trade for the dropout-bearing training path."""
    B, H, Lq, Dh = q.shape
    Lk = k.shape[2]
    if sm_scale is None:
        sm_scale = 1.0 / float(np.sqrt(Dh))
    block_q = min(block_q, max(Lq, 8))
    block_k = min(block_k, max(Lk, 8))
    if not interpret:
        # Mosaic block rules: sublane multiple of 8, lane multiple of 128
        block_q = -(-block_q // 8) * 8
        block_k = -(-block_k // 128) * 128

    pq = (-Lq) % block_q
    pk = (-Lk) % block_k
    if key_mask is None:
        key_mask = jnp.ones((B, Lk), jnp.int32)
    key_mask = key_mask.astype(jnp.int32)
    if pq or pk:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, pq), (0, 0)))
        k = jnp.pad(k, ((0, 0), (0, 0), (0, pk), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, pk), (0, 0)))
        key_mask = jnp.pad(key_mask, ((0, 0), (0, pk)))
    Lqp, Lkp = Lq + pq, Lk + pk

    qf = q.reshape(B * H, Lqp, Dh)
    kf = k.reshape(B * H, Lkp, Dh)
    vf = v.reshape(B * H, Lkp, Dh)
    key_mask = key_mask[:, None, :]          # [B, 1, Lkp]
    seed_arr = jnp.reshape(jnp.asarray(dropout_seed, jnp.int32), (1,))
    prec = (jax.lax.Precision.HIGHEST if precision == "highest"
            else jax.lax.Precision.DEFAULT)
    out = _flash_core(
        qf, kf, vf, key_mask, seed_arr, H, float(sm_scale),
        float(dropout_rate), (block_q, block_k), interpret, prec,
    )
    return out.reshape(B, H, Lqp, Dh)[:, :, :Lq, :]


def _flash_seg_kernel(
    q_ref, k_ref, v_ref, sq_ref, sk_ref, o_ref,
    m_scratch, l_scratch, acc_scratch,
    *, sm_scale: float, precision,
):
    """Forward-only flash tile with a SEGMENT-pair mask: query i attends key
    j iff seg_i == seg_j and seg_i > 0 (block-diagonal packed-sequence
    attention). seg == 0 marks padding; all-masked query rows output 0.

    One grid cell handles ALL H heads of a batch row ([H, bq, Dh] blocks,
    batched dot_generals): a per-(b, h) grid at the packed-BERT shape
    (R=256, H=12, P=128) is 3072 cells of tiny [128, 64] work where
    per-cell overhead dominates — measured SLOWER than dense (33 vs 22 ms
    per 12-layer stack); head-blocked it drops to ~6 ms."""
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _():
        m_scratch[...] = jnp.full_like(m_scratch, _MASKED)
        l_scratch[...] = jnp.zeros_like(l_scratch)
        acc_scratch[...] = jnp.zeros_like(acc_scratch)

    q = q_ref[...]                   # [H, bq, Dh]
    k = k_ref[...]                   # [H, bk, Dh]
    v = v_ref[...]
    s = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32, precision=precision,
    ) * sm_scale                     # [H, bq, bk]
    sq = sq_ref[0]                   # [bq, 1] int32 (shared by the heads)
    sk = sk_ref[0]                   # [1, bk]
    valid = ((sq == sk) & (sq > 0))[None]   # [1, bq, bk]
    s = jnp.where(valid, s, _MASKED)

    m_prev = m_scratch[...]          # [H, bq, LANES]
    l_prev = l_scratch[...]
    m_cur = jnp.max(s, axis=-1, keepdims=True)
    m_next = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp(m_prev - m_next)
    p = jnp.where(valid, jnp.exp(s - m_next[:, :, :1]), 0.0)
    l_scratch[...] = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
    m_scratch[...] = m_next
    acc_scratch[...] = acc_scratch[...] * alpha[:, :, :1] + jax.lax.dot_general(
        p.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32, precision=precision,
    )

    @pl.when(ki == pl.num_programs(2) - 1)
    def _():
        l = l_scratch[:, :, :1]
        safe_l = jnp.where(l == 0.0, 1.0, l)
        o_ref[...] = (acc_scratch[...] / safe_l).astype(o_ref.dtype)


def _flash_seg_kernel_nt(
    q_ref, k_ref, v_ref, sq_ref, sk_ref, o_ref,
    m_scratch, l_scratch, acc_scratch,
    *, sm_scale: float, precision,
):
    """_flash_seg_kernel with [bq, H, Dh] blocks (the [B, L, H, Dh] array
    layout that q/k/v projections produce with a FREE reshape): the
    head-major relayout happens in VMEM via swapaxes instead of as three
    100 MB HBM transposes per layer outside the kernel."""
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _():
        m_scratch[...] = jnp.full_like(m_scratch, _MASKED)
        l_scratch[...] = jnp.zeros_like(l_scratch)
        acc_scratch[...] = jnp.zeros_like(acc_scratch)

    q = jnp.swapaxes(q_ref[0], 0, 1)   # [H, bq, Dh]
    k = jnp.swapaxes(k_ref[0], 0, 1)   # [H, bk, Dh]
    v = jnp.swapaxes(v_ref[0], 0, 1)
    s = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32, precision=precision,
    ) * sm_scale                     # [H, bq, bk]
    sq = sq_ref[0]                   # [bq, 1]
    sk = sk_ref[0]                   # [1, bk]
    valid = ((sq == sk) & (sq > 0))[None]
    s = jnp.where(valid, s, _MASKED)

    m_prev = m_scratch[...]
    l_prev = l_scratch[...]
    m_cur = jnp.max(s, axis=-1, keepdims=True)
    m_next = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp(m_prev - m_next)
    p = jnp.where(valid, jnp.exp(s - m_next[:, :, :1]), 0.0)
    l_scratch[...] = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
    m_scratch[...] = m_next
    acc_scratch[...] = acc_scratch[...] * alpha[:, :, :1] + jax.lax.dot_general(
        p.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32, precision=precision,
    )

    @pl.when(ki == pl.num_programs(2) - 1)
    def _():
        l = l_scratch[:, :, :1]
        safe_l = jnp.where(l == 0.0, 1.0, l)
        o_ref[0] = jnp.swapaxes(
            (acc_scratch[...] / safe_l), 0, 1
        ).astype(o_ref.dtype)        # [bq, H, Dh]


def packed_segment_attention_nt(
    q: jax.Array,                    # [B, L, H, Dh]
    k: jax.Array,                    # [B, L, H, Dh]
    v: jax.Array,                    # [B, L, H, Dh]
    seg_ids: jax.Array,              # [B, L] int32, 0 = padding
    *,
    sm_scale: float | None = None,
    block_q: int = 128,
    block_k: int = 128,
    interpret: bool = False,
    precision: str = "default",
) -> jax.Array:
    """packed_segment_attention for q/k/v in the PROJECTION layout
    [B, L, H, Dh] (a free reshape of the [B, L, H*Dh] Dense output):
    no [B, H, L, Dh] HBM transposes on either side — the head-major
    relayout happens per-tile in VMEM. Forward-only (inputs are
    stop-gradient'ed, see packed_segment_attention).

    MEASURED-REJECTED at the packed-BERT shape (R=256, H=12, P=128,
    scripts/profile_bert.py): 31.8 ms per 12-layer stack vs 10.7 ms for the
    head-major kernel — the per-tile ``swapaxes(0, 1)`` of a [128, 12, 64]
    block is a Mosaic sublane relayout that costs ~3x more than the four
    [B, L, H, Dh] <-> [B, H, L, Dh] HBM transposes it was built to avoid
    (those are bandwidth-bound, ~0.25 ms/layer total). Kept as the measured
    A/B record; production uses packed_segment_attention."""
    q = jax.lax.stop_gradient(q)
    k = jax.lax.stop_gradient(k)
    v = jax.lax.stop_gradient(v)
    B, L, H, Dh = q.shape
    if sm_scale is None:
        sm_scale = 1.0 / float(np.sqrt(Dh))
    block_q = min(block_q, max(L, 8))
    block_k = min(block_k, max(L, 8))
    if not interpret:
        block_q = -(-block_q // 8) * 8
        block_k = -(-block_k // 128) * 128
    pq = (-L) % block_q
    pk = (-L) % block_k
    seg = seg_ids.astype(jnp.int32)
    if pq or pk:
        q = jnp.pad(q, ((0, 0), (0, pq), (0, 0), (0, 0)))
        k = jnp.pad(k, ((0, 0), (0, pk), (0, 0), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, pk), (0, 0), (0, 0)))
    seg_col = jnp.pad(seg, ((0, 0), (0, pq)))[:, :, None]   # [B, Lq, 1]
    seg_row = jnp.pad(seg, ((0, 0), (0, pk)))[:, None, :]   # [B, 1, Lk]
    Lq, Lk = L + pq, L + pk
    prec = (jax.lax.Precision.HIGHEST if precision == "highest"
            else jax.lax.Precision.DEFAULT)
    out = pl.pallas_call(
        functools.partial(_flash_seg_kernel_nt, sm_scale=float(sm_scale),
                          precision=prec),
        grid=(B, Lq // block_q, Lk // block_k),
        in_specs=[
            # 4D blocks: the BLOCK's last two dims (H, Dh) equal the full
            # array dims, which satisfies Mosaic's sublane/lane rules; a
            # (1, bq, H, Dh) block is one contiguous HBM range
            pl.BlockSpec((1, block_q, H, Dh), lambda b, qi, ki: (b, qi, 0, 0)),
            pl.BlockSpec((1, block_k, H, Dh), lambda b, qi, ki: (b, ki, 0, 0)),
            pl.BlockSpec((1, block_k, H, Dh), lambda b, qi, ki: (b, ki, 0, 0)),
            pl.BlockSpec((1, block_q, 1), lambda b, qi, ki: (b, qi, 0)),
            pl.BlockSpec((1, 1, block_k), lambda b, qi, ki: (b, 0, ki)),
        ],
        out_specs=pl.BlockSpec((1, block_q, H, Dh),
                               lambda b, qi, ki: (b, qi, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((H, block_q, _LANES), jnp.float32),
            pltpu.VMEM((H, block_q, _LANES), jnp.float32),
            pltpu.VMEM((H, block_q, Dh), jnp.float32),
        ],
        out_shape=jax.ShapeDtypeStruct((B, Lq, H, Dh), q.dtype),
        interpret=interpret,
    )(q, k, v, seg_col, seg_row)
    return out[:, :L]


def packed_segment_attention(
    q: jax.Array,                    # [B, H, L, Dh]
    k: jax.Array,                    # [B, H, L, Dh]
    v: jax.Array,                    # [B, H, L, Dh]
    seg_ids: jax.Array,              # [B, L] int32, 0 = padding
    *,
    sm_scale: float | None = None,
    block_q: int = 128,
    block_k: int = 128,
    interpret: bool = False,
    precision: str = "default",
) -> jax.Array:
    """Block-diagonal (sequence-packed) attention without materializing the
    [B, H, L, L] score tensor: softmax is masked to same-segment pairs
    inside the VMEM tile. FORWARD-ONLY: all inputs are stop-gradient'ed at
    entry, so differentiating an enclosing function yields ZERO for
    everything upstream of this op (rather than tracing a JVP through
    pallas_call, which jax cannot). The one consumer is the frozen text
    encoder, whose output sits under stop_gradient anyway — the trainer
    differentiates the full param tree with frozen-subtree masking, and
    without the entry stop_gradient that linearization would crash.

    At the packed-BERT export shape (R=256, P=128) the whole key range is
    one tile, so the online-softmax recurrence runs a single iteration —
    numerically this IS a plain fp32 max-subtracted softmax; the only
    difference from the dense XLA path is that the 200 MB/layer fp32 logits
    never round-trip HBM (measured 20.6 -> 10.7 ms per 12-layer attention
    stack on pre-transposed inputs; full encoder 73.6 -> 69.2 ms, the
    delta narrows because XLA fuses the head transposes into the dense
    path's einsums but must materialize them around a pallas_call —
    scripts/profile_bert.py)."""
    q = jax.lax.stop_gradient(q)
    k = jax.lax.stop_gradient(k)
    v = jax.lax.stop_gradient(v)
    B, H, L, Dh = q.shape
    if sm_scale is None:
        sm_scale = 1.0 / float(np.sqrt(Dh))
    block_q = min(block_q, max(L, 8))
    block_k = min(block_k, max(L, 8))
    if not interpret:
        block_q = -(-block_q // 8) * 8
        block_k = -(-block_k // 128) * 128
    pq = (-L) % block_q
    pk = (-L) % block_k
    seg = seg_ids.astype(jnp.int32)
    qp, kp, vp = q, k, v
    if pq or pk:
        # pad queries/keys with seg 0 (masked); padded query rows output 0
        qp = jnp.pad(q, ((0, 0), (0, 0), (0, pq), (0, 0)))
        kp = jnp.pad(k, ((0, 0), (0, 0), (0, pk), (0, 0)))
        vp = jnp.pad(v, ((0, 0), (0, 0), (0, pk), (0, 0)))
    seg_col = jnp.pad(seg, ((0, 0), (0, pq)))[:, :, None]   # [B, Lq, 1]
    seg_row = jnp.pad(seg, ((0, 0), (0, pk)))[:, None, :]   # [B, 1, Lk]
    Lq, Lk = L + pq, L + pk
    qf = qp.reshape(B * H, Lq, Dh)
    kf = kp.reshape(B * H, Lk, Dh)
    vf = vp.reshape(B * H, Lk, Dh)
    prec = (jax.lax.Precision.HIGHEST if precision == "highest"
            else jax.lax.Precision.DEFAULT)
    out = pl.pallas_call(
        functools.partial(_flash_seg_kernel, sm_scale=float(sm_scale),
                          precision=prec),
        # one grid cell per (batch row, q block, k block): the H-head block
        # (leading dim; not sublane/lane-constrained) batches the matmuls
        grid=(B, Lq // block_q, Lk // block_k),
        in_specs=[
            pl.BlockSpec((H, block_q, Dh), lambda b, qi, ki: (b, qi, 0)),
            pl.BlockSpec((H, block_k, Dh), lambda b, qi, ki: (b, ki, 0)),
            pl.BlockSpec((H, block_k, Dh), lambda b, qi, ki: (b, ki, 0)),
            # segment ids ship per BATCH row (shared by the H heads); the
            # lane-dim-1 / sublane-dim-1 blocks satisfy Mosaic's "full array
            # dim" rule the same way the lse out-spec above does
            pl.BlockSpec((1, block_q, 1), lambda b, qi, ki: (b, qi, 0)),
            pl.BlockSpec((1, 1, block_k), lambda b, qi, ki: (b, 0, ki)),
        ],
        out_specs=pl.BlockSpec((H, block_q, Dh), lambda b, qi, ki: (b, qi, 0)),
        scratch_shapes=[
            pltpu.VMEM((H, block_q, _LANES), jnp.float32),
            pltpu.VMEM((H, block_q, _LANES), jnp.float32),
            pltpu.VMEM((H, block_q, Dh), jnp.float32),
        ],
        out_shape=jax.ShapeDtypeStruct((B * H, Lq, Dh), q.dtype),
        interpret=interpret,
    )(qf, kf, vf, seg_col, seg_row)
    return out.reshape(B, H, Lq, Dh)[:, :, :L, :]


def reference_attention(q, k, v, key_mask=None, *, sm_scale=None,
                        precision="highest"):
    """Dense O(L^2) reference (the models/layers.py math) for testing.
    precision="highest" matches the kernel's bf16x3 exact-f32 matmuls
    (single-pass default differs by ~1e-3 on the MXU)."""
    Dh = q.shape[-1]
    if sm_scale is None:
        sm_scale = 1.0 / float(np.sqrt(Dh))
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                   preferred_element_type=jnp.float32,
                   precision=precision) * sm_scale
    if key_mask is not None:
        s = jnp.where(key_mask[:, None, None, :].astype(bool), s, _MASKED)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p.astype(v.dtype), v,
                      precision=precision)
