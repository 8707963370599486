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


class _DenseHeads(nn.Module):
    """nn.Dense-compatible projection emitted DIRECTLY in head layout.

    Param tree ({kernel [E, H*Dh], bias [H*Dh]}, lecun_normal/zeros init) is
    byte-identical to ``nn.Dense(H*Dh)``, so converters and checkpoints are
    unchanged — but the forward contracts via einsum into [B, NH, L, Dh],
    letting XLA fold the head relayout into the GEMM. Measured on the packed
    [256, 128] export forward: the 4 materialized transposes per layer cost
    ~24 ms of the 62 ms no-gelu stack; the einsum layout runs it at 46 ms
    (scripts/profile_bert_ab.py, bare_kernel_attn vs bare_einsum_split)."""

    features: int
    num_heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):  # [B, L, E] -> [B, NH, L, Dh]
        E = x.shape[-1]
        Dh = self.features // self.num_heads
        kernel = self.param("kernel", nn.linear.default_kernel_init,
                            (E, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros_init(),
                          (self.features,), jnp.float32)
        k = kernel.astype(self.dtype).reshape(E, self.num_heads, Dh)
        out = jnp.einsum("ble,end->bnld", x.astype(self.dtype), k)
        return out + bias.astype(self.dtype).reshape(
            1, self.num_heads, 1, Dh)


class _DenseFromHeads(nn.Module):
    """nn.Dense-compatible output projection consumed DIRECTLY from head
    layout: [B, NH, L, Dh] -> [B, L, E], contraction over (head, Dh) — the
    transpose+reshape+matmul fused into one einsum (see _DenseHeads)."""

    features: int
    num_heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, a):  # [B, NH, L, Dh] -> [B, L, features]
        Dh = a.shape[-1]
        E = self.num_heads * Dh
        kernel = self.param("kernel", nn.linear.default_kernel_init,
                            (E, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros_init(),
                          (self.features,), jnp.float32)
        k = kernel.astype(self.dtype).reshape(self.num_heads, Dh,
                                              self.features)
        return jnp.einsum("bnld,nde->ble", a, k) + bias.astype(self.dtype)


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
        average — such rows are never gathered downstream).

        Returns HEAD layout [B, NH, L, Dh]; the caller's output projection
        (_DenseFromHeads) contracts straight from it."""
        c = self.cfg
        H = c.num_heads
        Dh = c.hidden_size // H
        q = _DenseHeads(c.hidden_size, H, self.dtype, name="query")(x)
        k = _DenseHeads(c.hidden_size, H, self.dtype, name="key")(x)
        v = _DenseHeads(c.hidden_size, H, self.dtype, name="value")(x)
        B, L, _ = x.shape
        if segments is not None and c.packed_flash and deterministic:
            from medtok_tpu.ops.flash_attention import packed_segment_attention

            return packed_segment_attention(
                q, k, v, segments, sm_scale=1.0 / float(np.sqrt(Dh)),
                interpret=jax.default_backend() != "tpu",
            )
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
        return jnp.einsum("bhqk,bhkd->bhqd", attn, v)


class BertLayer(nn.Module):
    cfg: TextEncoderConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mask, *, deterministic=True, segments=None):
        c = self.cfg
        attn = BertSelfAttention(c, self.dtype, name="attention")(
            x, mask, deterministic=deterministic, segments=segments
        )
        attn = _DenseFromHeads(
            c.hidden_size, c.num_heads, self.dtype, name="attention_output",
        )(attn)
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
