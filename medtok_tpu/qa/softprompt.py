"""MedTok soft-prompt injection for the QA LLM.

Equivalent of Review (/root/reference/MedTok_QA_Tutorial/review.py:31-88),
vectorized: each row's first ``cutoff_len`` slots hold MedTok vocab ids
(padded with attention 0); their embeddings_all rows are gathered,
L2-normalized, MEAN-POOLED to one vector, projected to the LLM hidden size,
and concatenated before the text token embeddings; everything is re-packed
right-aligned into a [B, total_len] window with rebuilt attention mask and
-100-padded labels (review.py:47-74).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from medtok_tpu.ops.vq import l2_normalize


class SoftPromptBatch(NamedTuple):
    inputs_embeds: jax.Array    # [B, total_len, H]
    attention_mask: jax.Array   # [B, total_len]
    labels: jax.Array           # [B, total_len] (-100 = ignored)


class MedTokSoftPrompt(nn.Module):
    """projector: 256 -> llm hidden (review.py:24). ``embeddings`` is the
    frozen exported table [vocab(+miss rows), 256]."""

    embeddings: np.ndarray
    hidden_size: int
    cutoff_len: int = 256

    @nn.compact
    def __call__(
        self,
        input_ids: jax.Array,       # [B, cutoff_len + Lt]
        attention_mask: jax.Array,  # [B, cutoff_len + Lt]
        labels: jax.Array | None,   # [B, Lt] or None
        embed_fn,                   # token ids -> embeddings (llm embed table)
        total_len: int = 512,
        pad_embed: jax.Array | None = None,  # [H] filler (review.py:48)
    ) -> SoftPromptBatch:
        cl = self.cutoff_len
        B = input_ids.shape[0]
        table = jnp.asarray(self.embeddings, jnp.float32)

        med_ids = input_ids[:, :cl]
        med_mask = attention_mask[:, :cl].astype(jnp.float32)
        med = table[jnp.clip(med_ids, 0, table.shape[0] - 1)]
        med = l2_normalize(med)
        denom = jnp.maximum(jnp.sum(med_mask, axis=1, keepdims=True), 1.0)
        pooled = jnp.sum(med * med_mask[..., None], axis=1) / denom  # [B, 256]
        prefix = nn.Dense(self.hidden_size, name="projector")(pooled)[:, None, :]

        text_ids = input_ids[:, cl:]
        text_mask = attention_mask[:, cl:]
        text_embeds = embed_fn(text_ids)
        # match the LLM embedding dtype: a fp32 prefix would promote every
        # transformer activation to fp32 downstream (and force fp32 upcasts
        # of the bf16 base kernels) — measured 2x the whole 8B step footprint
        prefix = prefix.astype(text_embeds.dtype)
        Lt = text_ids.shape[1]
        H = self.hidden_size

        if pad_embed is None:
            pad_embed = jnp.zeros((H,), text_embeds.dtype)
        out_embeds = jnp.broadcast_to(
            pad_embed[None, None, :], (B, total_len, H)
        ).astype(text_embeds.dtype)
        out_mask = jnp.zeros((B, total_len), jnp.int32)
        out_labels = jnp.full((B, total_len), -100, jnp.int32)

        # right-align [prefix ‖ valid text] per row (review.py:71-74).
        # valid text tokens count n_i varies; build via gather with computed
        # source positions: target column t maps to source text position
        # t - (total_len - n_i - 1) for t >= start, prefix at t == start - 1.
        n = jnp.sum(text_mask, axis=1)  # valid text tokens per row
        # assume left-padding of the text (HF padding_side='left' at
        # inference; for training the reference tokenizes unpadded rows) —
        # normalize by compacting valid tokens to the RIGHT first.
        order = jnp.argsort(text_mask, axis=1, stable=True)  # zeros first
        text_ids_r = jnp.take_along_axis(text_ids, order, axis=1)
        text_embeds_r = jnp.take_along_axis(text_embeds, order[..., None], axis=1)
        labels_r = (
            jnp.take_along_axis(labels, order, axis=1) if labels is not None else None
        )

        tcol = jnp.arange(total_len)[None, :]
        src = tcol - (total_len - Lt)  # map target col -> right-aligned text col
        text_valid_at = src >= (Lt - n)[:, None]
        src_c = jnp.clip(src, 0, Lt - 1)
        emb_from_text = jnp.take_along_axis(
            text_embeds_r, src_c[..., None], axis=1
        )
        prefix_col = total_len - n - 1  # position of the pooled prefix
        is_prefix = tcol == prefix_col[:, None]
        out_embeds = jnp.where(
            text_valid_at[..., None], emb_from_text, out_embeds
        )
        out_embeds = jnp.where(is_prefix[..., None], prefix, out_embeds)
        out_mask = (text_valid_at | is_prefix).astype(jnp.int32)
        if labels_r is not None:
            lab_from_text = jnp.take_along_axis(labels_r, src_c, axis=1)
            out_labels = jnp.where(text_valid_at, lab_from_text, out_labels)
        return SoftPromptBatch(out_embeds, out_mask, out_labels)
