"""Device-side expansion of CompactCodeBatch -> CodeBatch.

The compact layout (data/types.py, data/native.py::pack_batch_compact) ships
one int32 per edge — (src << 16) | dst, front-packed per graph — plus a
per-graph edge count, instead of three full int32/f32 edge arrays. This
module rebuilds the classic CodeBatch *inside jit*: the shifts, mask
compares, and casts fuse into the downstream GCN/adjacency consumers, so the
expansion costs no extra HBM round-trips.

Run under jit (jax arrays in -> jax arrays out); also works eagerly with
numpy inputs for tests.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from medtok_tpu.data.types import CodeBatch, CompactCodeBatch

__all__ = ["unpack_compact", "derive_packed_meta"]


def derive_packed_meta(flat_base, tlens, *, num_rows: int, row_len: int,
                       lmax: int):
    """Rebuild the packed-text auxiliary arrays on device from the two
    per-code vectors shipped by pack_texts_meta (data/packing.py).

    flat_base [C] int32 — code c's first slot in the flattened [R*P] rows
    (non-decreasing: codes pack sequentially; batch-padding codes repeat the
    last real entry). tlens [C] int32 — code token counts.

    Returns (seg_ids [R, P], pos_ids [R, P], gather_idx [C, lmax],
    text_mask [C, lmax]) bit-identical to pack_texts' host-built arrays up
    to segment RELABELING for duplicated padding codes: positions of a
    segment shared by duplicates all map to the same (last) duplicate id, so
    the pairwise equality mask the encoder consumes — (seg_i == seg_j) &
    (seg > 0) — is unchanged (tested).
    """
    f = jnp.arange(num_rows * row_len, dtype=jnp.int32)
    c = jnp.searchsorted(flat_base, f, side="right").astype(jnp.int32) - 1
    c = jnp.clip(c, 0, flat_base.shape[0] - 1)
    base = flat_base[c]
    valid = (f >= base) & (f < base + tlens[c])
    seg = jnp.where(valid, c + 1, 0).reshape(num_rows, row_len)
    pos = jnp.where(valid, f - base, 0).reshape(num_rows, row_len)
    offs = jnp.arange(lmax, dtype=jnp.int32)
    tm = offs[None, :] < tlens[:, None]
    gi = jnp.where(tm, flat_base[:, None] + offs[None, :], 0)
    return (seg.astype(jnp.int32), pos.astype(jnp.int32),
            gi.astype(jnp.int32), tm)


def _expand(edge_packed, ne, batch: int, outdeg=None):
    epg = edge_packed.shape[0] // batch
    if outdeg is not None:
        # STREAM encoding (big node buckets): edge_packed is a uint16 dst
        # stream, edges grouped by source node; src rebuilds from the
        # per-node out-degrees — src_e = #{j : cum[j] <= e} with
        # cum = inclusive cumsum(outdeg), i.e. searchsorted(cum, e, "right").
        # Computed as a broadcast compare + reduce over Ln: XLA fuses the
        # virtual [B, chunk, Ln] int compare into the reduction (same shape
        # as one adjacency one-hot pass). A vmapped jnp.searchsorted is
        # exact too but lowers to log2(Ln) rounds of dynamic gathers that
        # serialize on TPU: 432 ms vs 4.7 ms at B=512 Ln=512 epg=8192
        # (scripts/bench_stream_decode.py, real chip).
        dst = jnp.asarray(edge_packed).astype(jnp.int32)
        od = jnp.asarray(outdeg).astype(jnp.int32)      # [B, Ln]
        cum = jnp.cumsum(od, axis=1)                    # inclusive
        e_iota = jnp.arange(epg, dtype=jnp.int32)
        ln = od.shape[1]
        # bound the fused virtual tensor to ~16M elements per chunk
        chunk = max(min(epg, (1 << 24) // max(ln, 1)), 1)
        while epg % chunk:
            chunk -= 1
        parts = []
        for c0 in range(0, epg, chunk):
            e = e_iota[c0:c0 + chunk]
            parts.append(jnp.sum(
                cum[:, None, :] <= e[None, :, None], axis=-1, dtype=jnp.int32
            ))
        src = jnp.concatenate(parts, axis=1) if len(parts) > 1 else parts[0]
        # padding slots (e >= ne) fall past the last cumsum step — zero
        # them to match the classic packed layout exactly
        src = jnp.where(e_iota[None, :] < ne[:, None], src, 0)
        src = jnp.minimum(src, od.shape[1] - 1).reshape(-1)
        dst = dst.reshape(-1)
    else:
        # int32 edges carry (src << 16) | dst (ln <= 32768 keeps the sign
        # bit clear, so the arithmetic >> equals a logical shift); uint16
        # edges carry (src << 8) | dst for ln <= 256 buckets
        if edge_packed.dtype == jnp.uint16:
            e = edge_packed.astype(jnp.int32)
            src, dst = e >> 8, e & 0xFF
        else:
            src = (edge_packed >> 16).astype(jnp.int32)
            dst = (edge_packed & 0xFFFF).astype(jnp.int32)
    slot = jnp.arange(epg, dtype=jnp.int32)
    valid = slot[None, :] < ne[:, None]          # [B, epg]; edges front-packed
    weight = valid.reshape(-1).astype(jnp.float32)
    return src, dst, weight


def unpack_compact(cb: CompactCodeBatch) -> CodeBatch:
    """Rebuild the classic CodeBatch. Aug fields of None (eval/export) alias
    the main edge arrays, mirroring the classic aliased-aug eval batch."""
    B = cb.node_ids.shape[0]
    src, dst, w = _expand(jnp.asarray(cb.edge_packed), jnp.asarray(cb.ne), B,
                          outdeg=cb.outdeg)
    if cb.edge_packed_aug is None:
        src_a, dst_a, w_a = src, dst, w
    else:
        src_a, dst_a, w_a = _expand(
            jnp.asarray(cb.edge_packed_aug), jnp.asarray(cb.ne_aug), B,
            outdeg=cb.outdeg_aug,
        )
    return CodeBatch(
        input_ids=cb.input_ids,
        attention_mask=cb.attention_mask,
        node_ids=cb.node_ids,
        node_mask=(jnp.arange(cb.node_ids.shape[1], dtype=jnp.int32)[None, :]
                   < jnp.asarray(cb.nn)[:, None]),
        edge_src=src, edge_dst=dst, edge_weight=w,
        edge_src_aug=src_a, edge_dst_aug=dst_a, edge_weight_aug=w_a,
        code_indices=cb.code_indices,
    )
