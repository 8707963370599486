"""Static-shape device batch structures.

The reference batches ragged per-code subgraphs with PyG ``Batch``
(dataset_creator.py:302-304) — dynamic node/edge counts per batch. On TPU
everything is padded to bucketed static shapes so XLA compiles once per
bucket; masks carry validity.
"""

from __future__ import annotations

from typing import NamedTuple

import jax


class CodeBatch(NamedTuple):
    """One batch of medical codes for the tokenizer (train or eval).

    Shapes: B = batch, Lt = text bucket, Ln = nodes-per-graph bucket,
    E = edge bucket (flat across the batch).

    Edge arrays are chunked per graph: graph i's edges occupy slots
    [i*Epg, (i+1)*Epg) where Epg = E // B, and hold WITHIN-GRAPH local node
    indices in [0, Ln). The model derives flat indices from the (static)
    slot position — this keeps edge values shard-local under dp sharding of
    the batch axis.
    """

    input_ids: jax.Array        # [B, Lt] int32 WordPiece ids, padded
    attention_mask: jax.Array   # [B, Lt] int32/bool, 1 = real token
    node_ids: jax.Array         # [B, Ln] int32 global PrimeKG node indices
    node_mask: jax.Array        # [B, Ln] bool, True = real node
    edge_src: jax.Array         # [E] int32 within-graph node indices
    edge_dst: jax.Array         # [E] int32
    edge_weight: jax.Array      # [E] f32, 1.0 real / 0.0 padded
    edge_src_aug: jax.Array     # [E] int32, edge-dropout-augmented copy
    edge_dst_aug: jax.Array     # [E]
    edge_weight_aug: jax.Array  # [E]
    code_indices: jax.Array     # [B] int32 row index into the code vocab


class CompactCodeBatch(NamedTuple):
    """Transfer-optimized CodeBatch: one int32 per edge ((src << 16) | dst,
    front-packed per graph) and per-graph edge counts instead of the three
    int32/f32 edge arrays — 3x fewer host->device bytes, which is what the
    heavy-tail export step is bound by (the device work is ~30 ms while the
    classic batch ships ~100 MB). ``unpack_compact`` (data/compact.py)
    rebuilds the classic CodeBatch on device; XLA fuses the shifts/compares
    into the consumers. Aug fields are None on the eval/export path (the
    reference's eval forward never reads the augmented graph,
    tokenizer.py:227-247), so no aug bytes cross the PCIe/ICI link at all.
    """

    input_ids: jax.Array         # [B, Lt] int32
    attention_mask: jax.Array    # [B, Lt] int32
    node_ids: jax.Array          # [B, Ln] int32
    nn: jax.Array                # [B] int32 real-node count (nodes are
    #                              front-packed; mask rebuilt on device as
    #                              iota < nn — ships B ints, not B*Ln bytes)
    edge_packed: jax.Array       # [E] int32 (src << 16) | dst, uint16
    #                              (src << 8) | dst for ln <= 256, or the
    #                              uint16 dst-only STREAM when outdeg is set
    ne: jax.Array                # [B] int32 real-edge count per graph
    edge_packed_aug: jax.Array | None   # [E] or None (eval)
    ne_aug: jax.Array | None            # [B] int32 or None (eval)
    code_indices: jax.Array      # [B] int32
    outdeg: jax.Array | None = None      # [B, Ln] uint16 per-node emitted
    #                              out-degree; edges grouped by src, so src
    #                              rebuilds on device as
    #                              searchsorted(cumsum(outdeg), e) — the src
    #                              column never crosses the link (2 B/edge)
    outdeg_aug: jax.Array | None = None  # [B, Ln] uint16 or None


class PackedTextBatch(NamedTuple):
    """Sequence-packed companion to a CodeBatch's text fields
    (data/packing.py): the B descriptions share [R, P] encoder rows. Under
    dp sharding the rows are packed PER SHARD (each device's gather indices
    are local to its own row block)."""

    input_ids: jax.Array   # [R, P] int32
    seg_ids: jax.Array     # [R, P] int32 (0 = empty slot)
    pos_ids: jax.Array     # [R, P] int32 within-segment positions
    gather_idx: jax.Array  # [B, Lmax] int32 flat indices, shard-local
    text_mask: jax.Array   # [B, Lmax] bool


class TokenizedCodes(NamedTuple):
    """Eval output per code (reference: tokenizer.py:240-247)."""

    embedding: jax.Array  # [B, 256] cat(spec_text, spec_graph, shared_text, shared_graph)
    tokens: jax.Array     # [B, 4, k] rows: text, graph, shared_text, shared_graph
    weights: jax.Array    # [B, 4, k]
