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

import jax.numpy as jnp

from medtok_tpu.data.types import CodeBatch, CompactCodeBatch

__all__ = ["unpack_compact"]


def _expand(edge_packed, ne, batch: int):
    epg = edge_packed.shape[0] // batch
    # ln <= 32768 (enforced at pack time) keeps the sign bit clear, so the
    # arithmetic >> equals a logical shift
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
    src, dst, w = _expand(jnp.asarray(cb.edge_packed), jnp.asarray(cb.ne), B)
    if cb.edge_packed_aug is None:
        src_a, dst_a, w_a = src, dst, w
    else:
        src_a, dst_a, w_a = _expand(
            jnp.asarray(cb.edge_packed_aug), jnp.asarray(cb.ne_aug), B
        )
    return CodeBatch(
        input_ids=cb.input_ids,
        attention_mask=cb.attention_mask,
        node_ids=cb.node_ids,
        node_mask=jnp.asarray(cb.node_mask).astype(bool),
        edge_src=src, edge_dst=dst, edge_weight=w,
        edge_src_aug=src_a, edge_dst_aug=dst_a, edge_weight_aug=w_a,
        code_indices=cb.code_indices,
    )
