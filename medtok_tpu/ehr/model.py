"""EHR outcome model in flax.

Equivalent of EHRModel (/root/reference/MedTok_EHR_Tutorial/EHRModel_token.py:81-247):
frozen MedTok embedding table + learned miss row, projector 256 -> input_dim,
sinusoidal positional encoding + year-embedding + day/hour sin-cos time
features gathered per code by visit id, [CLS, gender, ethnicity] prepended,
N torch-semantics TransformerEncoderLayers (post-LayerNorm, ReLU FFN) with
key-padding mask, CLS -> fc -> classify.
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from medtok_tpu.ehr.dataset import EHRBatch


class PositionalEncoding(nn.Module):
    """pe[pos] sinusoid + year embedding + day/hour sin-cos
    (EHRModel_token.py:36-78)."""

    d_model: int
    dropout: float = 0.2
    max_len: int = 2001
    max_year: int = 1000

    def setup(self):
        position = np.arange(self.max_len)[:, None]
        div = np.exp(np.arange(0, self.d_model, 2) * (-math.log(10000.0) / self.d_model))
        pe = np.zeros((self.max_len, self.d_model), np.float32)
        pe[:, 0::2] = np.sin(position * div)
        pe[:, 1::2] = np.cos(position * div)
        self.pe = jnp.asarray(pe)
        self.year_emb = nn.Embed(self.max_year, self.d_model - 4, name="year_emb")
        self.drop = nn.Dropout(self.dropout)

    def _time_embedding(self, t):
        year, day, hour = t[..., 0], t[..., 1], t[..., 2]
        two_pi = 2 * math.pi
        day_sin = jnp.sin(two_pi * day / 365)[..., None]
        day_cos = jnp.cos(two_pi * day / 365)[..., None]
        hour_sin = jnp.sin(two_pi * hour / 24)[..., None]
        hour_cos = jnp.cos(two_pi * hour / 24)[..., None]
        return jnp.concatenate(
            [self.year_emb(year), day_sin, day_cos, hour_sin, hour_cos], axis=-1
        )

    def __call__(self, x, time_within, time_between, *, deterministic=True):
        x = x + self.pe[: x.shape[1]][None] \
            + self._time_embedding(time_within) \
            + self._time_embedding(time_between)
        if not deterministic:
            x = self.drop(x, deterministic=False)
        return x


class TransformerEncoderLayer(nn.Module):
    """torch.nn.TransformerEncoderLayer parity (post-norm, ReLU)."""

    d_model: int
    nhead: int
    dim_feedforward: int
    dropout: float = 0.5
    use_flash: bool = False
    flash_precision: str = "highest"

    @nn.compact
    def __call__(self, x, pad_mask, *, deterministic=True):
        from medtok_tpu.models.layers import MultiheadAttention

        valid = ~pad_mask  # key mask: True = attendable
        attn = MultiheadAttention(self.d_model, self.nhead, self.dropout,
                                  use_flash=self.use_flash,
                                  flash_precision=self.flash_precision,
                                  name="self_attn")(
            x, x, x, valid, deterministic=deterministic
        )
        if not deterministic:
            attn = nn.Dropout(self.dropout)(attn, deterministic=False)
        x = nn.LayerNorm(epsilon=1e-5, name="norm1")(x + attn)
        h = nn.Dense(self.dim_feedforward, name="linear1")(x)
        h = nn.relu(h)
        if not deterministic:
            h = nn.Dropout(self.dropout)(h, deterministic=False)
        h = nn.Dense(self.d_model, name="linear2")(h)
        if not deterministic:
            h = nn.Dropout(self.dropout)(h, deterministic=False)
        return nn.LayerNorm(epsilon=1e-5, name="norm2")(x + h)


class EHRModel(nn.Module):
    """num_class logits from an EHRBatch. ``embedding_table`` is the frozen
    MedTok export [vocab, 256] (EHRModel_token.py:128-141)."""

    embedding_table: Any         # np/jnp [vocab, 256], frozen
    num_class: int
    input_dim: int = 64          # MedTok_EHR.py defaults (:79-81)
    output_dim: int = 64
    num_heads: int = 4
    hidden_dim: int = 256
    num_layers: int = 4
    dropout: float = 0.5
    max_year: int = 1000
    use_flash: bool = False      # Pallas flash attention in the encoder
    flash_precision: str = "highest"
    pe_dropout: float = 0.2      # PositionalEncoding dropout
                                 # (hardcoded 0.2 in EHRModel_token.py:217)

    def setup(self):
        emb_dim = self.embedding_table.shape[1]
        self.miss_emb = self.param(
            "miss_emb", nn.initializers.normal(1.0), (1, emb_dim)
        )
        self.cls_emb = self.param(
            "cls_emb", nn.initializers.normal(1.0), (1, self.output_dim)
        )
        self.gender_emb = nn.Embed(5, self.input_dim, name="gender_emb")
        self.ethnicity_emb = nn.Embed(100, self.input_dim, name="ethnicity_emb")
        self.projector = nn.Dense(self.input_dim, name="projector")
        self.position_encoder = PositionalEncoding(
            d_model=self.output_dim, dropout=self.pe_dropout,
            max_year=self.max_year, name="position_encoder",
        )
        self.layers = [
            TransformerEncoderLayer(
                self.input_dim, self.num_heads, self.hidden_dim, self.dropout,
                use_flash=self.use_flash,
                flash_precision=self.flash_precision, name=f"layer_{i}",
            )
            for i in range(self.num_layers)
        ]
        self.fc = nn.Dense(self.output_dim, name="fc")
        self.classify = nn.Dense(self.num_class, name="classify")

    def patient_encoder(self, batch: EHRBatch, *, deterministic=True):
        table = jnp.concatenate(
            [jnp.asarray(self.embedding_table, jnp.float32), self.miss_emb], axis=0
        )
        src = table[batch.codes]                     # [B, C, 256]
        src = self.projector(src)                    # [B, C, input_dim]

        # per-code time features gathered by visit id (EHRModel_token.py:219-220)
        tw = jnp.take_along_axis(
            batch.time_within, batch.visit_ids[..., None].astype(jnp.int32), axis=1
        )
        tb = jnp.take_along_axis(
            batch.time_between, batch.visit_ids[..., None].astype(jnp.int32), axis=1
        )
        src = self.position_encoder(src, tw, tb, deterministic=deterministic)

        B = src.shape[0]
        cls = jnp.broadcast_to(self.cls_emb[None], (B, 1, self.output_dim))
        gender = self.gender_emb(batch.gender)[:, None, :]
        eth = self.ethnicity_emb(batch.ethnicity)[:, None, :]
        x = jnp.concatenate([cls, gender, eth, src], axis=1)  # [B, C+3, D]
        pad = jnp.concatenate(
            [jnp.zeros((B, 3), bool), batch.pad_mask.astype(bool)], axis=1
        )
        for layer in self.layers:
            x = layer(x, pad, deterministic=deterministic)
        return self.fc(x[:, 0, :])  # CLS

    def __call__(self, batch: EHRBatch, *, train: bool = False):
        emb = self.patient_encoder(batch, deterministic=not train)
        return emb, self.classify(emb)
