"""Frozen BERT text encoder in flax.

The reference uses HF ``bert-base-uncased`` with requires_grad=False
(/root/reference/MedTok/tokenizer.py:75-81) and consumes
``last_hidden_state`` (tokenizer.py:221). This is a from-scratch flax
implementation of the BERT encoder (post-LayerNorm architecture) plus a
converter from a HuggingFace PyTorch state_dict for weight parity.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from medtok_tpu.config import TextEncoderConfig
from medtok_tpu.ops.gelu import bert_gelu


class BertSelfAttention(nn.Module):
    cfg: TextEncoderConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mask, *, deterministic=True, segments=None):
        """mask: [B, L] key mask, or [B, L, L] pairwise mask (sequence
        packing: block-diagonal over the packed segments).

        segments: optional [B, L] int32 packed-segment ids (0 = padding).
        When given with cfg.packed_flash and deterministic, attention runs
        through the fused block-diagonal Pallas kernel instead of the dense
        masked softmax (same masking semantics for every consumed position;
        all-padding query rows return 0 where dense returns a uniform
        average — such rows are never gathered downstream)."""
        c = self.cfg
        H = c.num_heads
        Dh = c.hidden_size // H
        q = nn.Dense(c.hidden_size, dtype=self.dtype, name="query")(x)
        k = nn.Dense(c.hidden_size, dtype=self.dtype, name="key")(x)
        v = nn.Dense(c.hidden_size, dtype=self.dtype, name="value")(x)
        B, L, _ = x.shape
        q = q.reshape(B, L, H, Dh).transpose(0, 2, 1, 3)
        k = k.reshape(B, L, H, Dh).transpose(0, 2, 1, 3)
        v = v.reshape(B, L, H, Dh).transpose(0, 2, 1, 3)
        if segments is not None and c.packed_flash and deterministic:
            from medtok_tpu.ops.flash_attention import packed_segment_attention

            out = packed_segment_attention(
                q, k, v, segments, sm_scale=1.0 / float(np.sqrt(Dh)),
                interpret=jax.default_backend() != "tpu",
            )
            return out.transpose(0, 2, 1, 3).reshape(B, L, c.hidden_size)
        if segments is not None:
            mask = (segments[:, :, None] == segments[:, None, :]) & (
                segments[:, :, None] > 0
            )
        logits = jnp.einsum(
            "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
        ) / np.sqrt(Dh)
        pair = mask[:, None, :, :] if mask.ndim == 3 else mask[:, None, None, :]
        logits = jnp.where(pair, logits, -1e9)
        attn = jax.nn.softmax(logits, axis=-1).astype(self.dtype)
        if not deterministic:
            attn = nn.Dropout(c.attention_dropout)(attn, deterministic=False)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        return out.transpose(0, 2, 1, 3).reshape(B, L, c.hidden_size)


class BertLayer(nn.Module):
    cfg: TextEncoderConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mask, *, deterministic=True, segments=None):
        c = self.cfg
        attn = BertSelfAttention(c, self.dtype, name="attention")(
            x, mask, deterministic=deterministic, segments=segments
        )
        attn = nn.Dense(c.hidden_size, dtype=self.dtype, name="attention_output")(attn)
        if not deterministic:
            attn = nn.Dropout(c.hidden_dropout)(attn, deterministic=False)
        x = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=self.dtype, name="attention_ln")(
            x + attn
        )
        h = nn.Dense(c.intermediate_size, dtype=self.dtype, name="intermediate")(x)
        # HF BERT uses exact gelu; the bf16 path takes the half-ulp-class
        # tanh-poly fit (ops/gelu.py: 21.6 -> 9.4 ms per packed forward),
        # fp32 keeps the canonical erfc so torch oracles are unchanged.
        h = bert_gelu(h)
        h = nn.Dense(c.hidden_size, dtype=self.dtype, name="output")(h)
        if not deterministic:
            h = nn.Dropout(c.hidden_dropout)(h, deterministic=False)
        return nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=self.dtype, name="output_ln")(
            x + h
        )


class BertEncoder(nn.Module):
    """Returns last_hidden_state [B, L, hidden]."""

    cfg: TextEncoderConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, input_ids, attention_mask, *, position_ids=None,
                 deterministic=True, segments=None):
        """attention_mask: [B, L], or [B, L, L] pairwise (sequence packing).
        position_ids: [B, L] — packed rows pass within-segment offsets so
        each segment sees the same absolute positions as unpacked.
        segments: optional [B, L] packed-segment ids (0 = padding) enabling
        the fused block-diagonal attention path; attention_mask may then be
        None (each layer derives masking from the segments)."""
        c = self.cfg
        mask = (attention_mask.astype(bool)
                if attention_mask is not None else None)
        L = input_ids.shape[1]
        word = nn.Embed(c.vocab_size, c.hidden_size, dtype=self.dtype,
                        name="word_embeddings")(input_ids)
        pos_ids = jnp.arange(L)[None, :] if position_ids is None else position_ids
        pos = nn.Embed(c.max_position_embeddings, c.hidden_size, dtype=self.dtype,
                       name="position_embeddings")(pos_ids)
        tok_type = nn.Embed(c.type_vocab_size, c.hidden_size, dtype=self.dtype,
                            name="token_type_embeddings")(jnp.zeros_like(input_ids))
        x = word + pos + tok_type
        x = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=self.dtype,
                         name="embeddings_ln")(x)
        if not deterministic:
            x = nn.Dropout(c.hidden_dropout)(x, deterministic=False)
        for i in range(c.num_layers):
            x = BertLayer(c, self.dtype, name=f"layer_{i}")(
                x, mask, deterministic=deterministic, segments=segments
            )
        return x


# ---------------------------------------------------------------------------
# HF PyTorch state_dict -> flax params conversion
# ---------------------------------------------------------------------------

def convert_hf_bert(state_dict: dict[str, Any], cfg: TextEncoderConfig) -> dict:
    """Convert a HuggingFace ``BertModel`` PyTorch state_dict (tensors or
    numpy arrays) into this module's param tree. Dense kernels are transposed
    (torch stores [out, in]; flax [in, out])."""

    def arr(key):
        v = state_dict[key]
        v = v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)
        return jnp.asarray(v, jnp.float32)

    def dense(prefix):
        return {"kernel": arr(f"{prefix}.weight").T, "bias": arr(f"{prefix}.bias")}

    def ln(prefix):
        return {"scale": arr(f"{prefix}.weight"), "bias": arr(f"{prefix}.bias")}

    p: dict[str, Any] = {
        "word_embeddings": {"embedding": arr("embeddings.word_embeddings.weight")},
        "position_embeddings": {"embedding": arr("embeddings.position_embeddings.weight")},
        "token_type_embeddings": {"embedding": arr("embeddings.token_type_embeddings.weight")},
        "embeddings_ln": ln("embeddings.LayerNorm"),
    }
    for i in range(cfg.num_layers):
        hf = f"encoder.layer.{i}"
        p[f"layer_{i}"] = {
            "attention": {
                "query": dense(f"{hf}.attention.self.query"),
                "key": dense(f"{hf}.attention.self.key"),
                "value": dense(f"{hf}.attention.self.value"),
            },
            "attention_output": dense(f"{hf}.attention.output.dense"),
            "attention_ln": ln(f"{hf}.attention.output.LayerNorm"),
            "intermediate": dense(f"{hf}.intermediate.dense"),
            "output": dense(f"{hf}.output.dense"),
            "output_ln": ln(f"{hf}.output.LayerNorm"),
        }
    return p
