"""Patient-embedding memory bank + contrastive loss (EHR model machinery).

Mirrors /root/reference/MedTok_EHR_Tutorial/EHRModel_token.py:
- ``compute_contrastive_loss`` (:295-331): InfoNCE over cosine similarities
  with in-batch negatives (eye-masked), optional positive-view negatives,
  and detached memory-bank negatives PREPENDED to the negative set; the
  positive sits at logit column 0.
- ``update_memory_bank`` (:437-449): all_gather new embeddings across data-
  parallel ranks, l2-normalize, FIFO-append, cap at ``memory_bank_size``.

(The reference's update call is commented out at :403 — the machinery ships
unused; it is provided here as a first-class, tested component.)

TPU-native state model: the torch version grows a tensor dynamically; under
jit every shape is static, so the bank is a fixed [size, D] ring buffer +
a monotone write count (same pattern as the codebook usage FIFO), and the
cross-rank gather is ``jax.lax.all_gather`` over the 'dp' mesh axis inside
``shard_map`` (≙ torch.distributed.all_gather, :440-441).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class MemoryBankState(NamedTuple):
    buffer: jax.Array   # [size, D] l2-normalized rows (stale slots = junk)
    count: jax.Array    # scalar int32, total rows ever written


def init_memory_bank(size: int, dim: int, dtype=jnp.float32) -> MemoryBankState:
    return MemoryBankState(
        buffer=jnp.zeros((size, dim), dtype),
        count=jnp.zeros((), jnp.int32),
    )


def _l2norm(x, eps=1e-12):
    return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), eps)


def update_memory_bank(
    state: MemoryBankState, new_embeddings: jax.Array,
    *, axis_name: str | None = None,
) -> MemoryBankState:
    """FIFO-append (gathered-over-dp, normalized) rows; ring-buffer write.

    Equivalent to EHRModel_token.py:437-449: after the cap, the bank holds
    the most recent ``size`` rows in insertion order (ring position
    ``count % size`` is the oldest).
    """
    if axis_name is not None:
        # [world * B, D] in rank order (torch.distributed.all_gather cat)
        new_embeddings = jax.lax.all_gather(
            new_embeddings, axis_name, axis=0, tiled=True
        )
    new = _l2norm(jax.lax.stop_gradient(new_embeddings.astype(state.buffer.dtype)))
    size = state.buffer.shape[0]
    n = new.shape[0]
    if n > size:  # only the last `size` rows survive the cap (:448-449)
        new = new[n - size:]
        n = size
    slots = jnp.mod(state.count + jnp.arange(n, dtype=jnp.int32), size)
    buffer = state.buffer.at[slots].set(new)
    return MemoryBankState(buffer=buffer, count=state.count + n)


def bank_valid_mask(state: MemoryBankState) -> jax.Array:
    """[size] bool — which slots hold real (ever-written) rows."""
    size = state.buffer.shape[0]
    return jnp.arange(size) < jnp.minimum(state.count, size)


def contrastive_loss(
    anchor: jax.Array,                       # [B, D]
    pos: jax.Array | None = None,            # [B, D] positive views
    bank: MemoryBankState | None = None,
    *,
    temperature: float = 0.1,
) -> jax.Array:
    """InfoNCE with the reference's exact logit layout
    (EHRModel_token.py:295-331): column 0 = positive cosine sim; negatives =
    [memory-bank | within-anchor (eye-masked) | with-pos (eye-masked)]."""
    a = _l2norm(anchor)
    B = a.shape[0]
    if pos is not None:
        p = _l2norm(pos)
        pos_sim = jnp.sum(a * p, axis=-1) / temperature
    else:
        pos_sim = jnp.sum(a * a, axis=-1) / temperature

    # [mask].view(B, -1): drop the diagonal, keep row-major order
    within = _drop_diagonal((a @ a.T) / temperature)
    negs = [within]
    if pos is not None:
        negs.append(_drop_diagonal((a @ p.T) / temperature))
    if bank is not None:
        mem = (a @ jax.lax.stop_gradient(bank.buffer).T) / temperature
        # stale slots must not act as negatives: mask to -inf (the torch
        # version's bank holds only real rows; ours is a fixed ring)
        mem = jnp.where(bank_valid_mask(bank)[None, :], mem, -jnp.inf)
        negs.insert(0, mem)                   # memory negatives go FIRST
    logits = jnp.concatenate([pos_sim[:, None]] + negs, axis=-1)
    # labels = 0 (the positive column); plain log-softmax CE
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.mean(logp[:, 0])


def _drop_diagonal(x: jax.Array) -> jax.Array:
    """[B, B] -> [B, B-1], removing the diagonal, row-major order
    (the torch boolean-mask .view(B, -1) semantics)."""
    B = x.shape[0]
    cols = jnp.arange(B)[None, :].repeat(B, 0)
    keep = cols != jnp.arange(B)[:, None]
    # static gather: for row i, columns [0..B-1] minus i in order
    idx = jnp.argsort(~keep, axis=-1, stable=True)[:, : B - 1]
    return jnp.take_along_axis(x, idx, axis=-1)
