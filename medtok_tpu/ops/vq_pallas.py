"""Fused Pallas TPU kernel: codebook distances + running top-k.

The north-star custom kernel (SURVEY.md section 2.9): for z [B, D] against a
codebook [N, D], computes squared-L2 distances tile-by-tile on the MXU with
fp32 accumulation and maintains a running top-k (smallest) per row in VMEM —
the full [B, N] distance matrix never touches HBM. XLA's unfused path
materializes it twice (matmul out + top_k in): ~2 * B*N*4 bytes of HBM
traffic that this kernel eliminates.

Tie-breaking matches torch.topk(largest=False): lowest index first. Running
candidates are kept in columns [0, k) ahead of each distance tile, and tiles
are scanned in ascending index order, so position-order argmin == global
lowest-index argmin.

Used by ops.vq.soft_topk_quantize when enabled; validated against the pure
JAX/XLA reference in tests (interpret mode on CPU, compiled on TPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INF = float("inf")


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _topk_kernel(z_ref, zsq_ref, e_ref, esq_ref, vals_ref, idx_ref, *, k: int,
                 n_valid: int, tile_n: int):
    """Grid: (B_tiles, N_tiles). One B-tile row block; N scanned serially via
    the second grid dim (arbitrary-order safe: merge is associative given the
    running buffer is carried in the output refs)."""
    j = pl.program_id(1)

    # initialize running top-k on the first N tile
    @pl.when(j == 0)
    def _():
        vals_ref[:] = jnp.full_like(vals_ref, _INF)
        idx_ref[:] = jnp.zeros_like(idx_ref)

    z = z_ref[:]                      # [TB, D] fp32
    e = e_ref[:]                      # [TN, D] fp32
    d = (
        zsq_ref[:]                    # [TB, 1]
        + esq_ref[:]                  # [1, TN]
        - 2.0 * jax.lax.dot_general(
            z, e, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    )                                  # [TB, TN]

    base = j * tile_n
    col_ids = base + jax.lax.broadcasted_iota(jnp.int32, d.shape, 1)
    d = jnp.where(col_ids < n_valid, d, _INF)  # mask codebook padding

    # Two-stage top-k keeps the VPU-heavy scans on the lane-ALIGNED tile
    # width: (1) tile-local top-k over [TB, TN], (2) a tiny [TB, 2k]-wide
    # merge with the running list. Within each scan, ties resolve to the
    # lowest column position; running entries (globally lower indices) are
    # placed before the tile's, so position order == global index order.
    tile_v, tile_i = _scan_topk(d, None, k, id_base=base)

    cand_v = jnp.concatenate([vals_ref[:], tile_v], axis=1)   # [TB, 2k]
    cand_i = jnp.concatenate([idx_ref[:], tile_i], axis=1)
    new_v, new_i = _scan_topk(cand_v, cand_i, k)
    vals_ref[:] = new_v
    idx_ref[:] = new_i


def _scan_topk(values, ids, k, *, id_base=None):
    """k smallest per row by k min+mask passes; first-position tie-break.
    Static-unrolled (Mosaic has no scatter; outputs built with where/iota).

    ``id_base`` (tile scan): ids are known to be base + column position, so
    the selected index is base + first — skipping the full-width masked-sum
    select, the most expensive op of each pass on the [TB, TN] tile."""
    tb = values.shape[0]
    pos = jax.lax.broadcasted_iota(jnp.int32, values.shape, 1)
    out_col = jax.lax.broadcasted_iota(jnp.int32, (tb, k), 1)
    out_v = jnp.zeros((tb, k), jnp.float32)
    out_i = jnp.zeros((tb, k), jnp.int32)
    for s in range(k):
        m = jnp.min(values, axis=1, keepdims=True)              # [TB, 1]
        first = jnp.min(
            jnp.where(values == m, pos, jnp.int32(2**30)), axis=1, keepdims=True
        )
        if id_base is not None:
            sel_idx = id_base + first
        else:
            sel_idx = jnp.sum(
                jnp.where(pos == first, ids, 0), axis=1, keepdims=True
            )
        out_v = jnp.where(out_col == s, m, out_v)
        out_i = jnp.where(out_col == s, sel_idx, out_i)
        values = jnp.where(pos == first, _INF, values)
    return out_v, out_i


@functools.partial(jax.jit, static_argnames=("k", "tile_b", "tile_n", "interpret"))
def fused_topk_l2(
    z: jax.Array,
    codebook: jax.Array,
    *,
    k: int = 5,
    tile_b: int = 256,
    tile_n: int = 2048,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """(values [B, k], indices [B, k]) of the k smallest squared-L2 distances
    from each z row to the codebook rows. fp32 math regardless of input dtype.
    """
    B, D = z.shape
    N = codebook.shape[0]
    z = z.astype(jnp.float32)
    e = codebook.astype(jnp.float32)

    Bp = _round_up(B, min(tile_b, _round_up(B, 8)))
    tile_b = min(tile_b, Bp)
    Np = _round_up(N, tile_n)
    if Bp != B:
        z = jnp.pad(z, ((0, Bp - B), (0, 0)))
    if Np != N:
        e = jnp.pad(e, ((0, Np - N), (0, 0)))

    zsq = jnp.sum(z * z, axis=1, keepdims=True)       # [Bp, 1]
    esq = jnp.sum(e * e, axis=1).reshape(1, Np)       # [1, Np]

    grid = (Bp // tile_b, Np // tile_n)
    kernel = functools.partial(
        _topk_kernel, k=k, n_valid=N, tile_n=tile_n
    )
    vals, idx = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_b, D), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_b, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, D), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_n), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile_b, k), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_b, k), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Bp, k), jnp.float32),
            jax.ShapeDtypeStruct((Bp, k), jnp.int32),
        ],
        interpret=interpret,
    )(z, zsq, e, esq)
    return vals[:B], idx[:B]
