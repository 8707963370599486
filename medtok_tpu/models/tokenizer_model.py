"""MultimodalTokenizer — the flagship model.

Reference: /root/reference/MedTok/tokenizer.py:66-277. Orchestration:
  frozen BERT -> CLS -> text_mapped(768 -> graph_out)        (:118, 221)
  GraphEncoder -> last hidden -> global_mean_pool            (:215-216)
  h = cat(text_cls, graph_pool) [B, 128]                     (:165)
  SoftVQQuantizer(h, text tokens, graph nodes, masks, h_aug) (:199)
Train returns the quantizer's loss dict; eval returns
(embedding [B,256], tokens [B,4,k], weights [B,4,k]) with the exact concat
order of tokenizer.py:240-247.

TPU-first deviations (documented):
- The frozen BERT runs deterministically by default; the reference runs it in
  train mode under no_grad, so its "text augmentation" is dropout noise
  (tokenizer.py:148-152, 211-212). Set text_dropout_in_train=True in
  ModelConfig for that behavior (costs a second BERT forward).
- The dead VAR residual-quantization branch (tokenizer.py:169-197, gated off
  by enable_var=False at :132) is not reproduced.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from medtok_tpu.config import ModelConfig
from medtok_tpu.data.types import CodeBatch, TokenizedCodes
from medtok_tpu.models.bert import BertEncoder
from medtok_tpu.models.graph_encoder import GraphEncoder
from medtok_tpu.models.layers import global_mean_pool
from medtok_tpu.models.quantizer import SoftVQQuantizer


class MultimodalTokenizer(nn.Module):
    cfg: ModelConfig
    dp_axis: str | None = None  # set when the step runs inside shard_map
    tp_axis: str | None = None  # codebook-sweep tensor parallelism

    def setup(self):
        c = self.cfg
        dtype = jnp.dtype(c.compute_dtype)
        self.text_model = BertEncoder(c.text, dtype=dtype, name="text_model")
        self.graph_encoder = GraphEncoder(c.graph, dtype=dtype, name="graph_encoder")
        # 768 -> graph_out_channels (tokenizer.py:118; applied at :221)
        self.text_mapped = nn.Dense(c.graph.out_channels, dtype=dtype, name="text_mapped")
        self.quantize = SoftVQQuantizer(
            c.quantizer, split=c.split, dp_axis=self.dp_axis,
            tp_axis=self.tp_axis, name="quantize",
        )

    def _encode_text(self, input_ids, attention_mask, *, dropout: bool):
        out = self.text_model(
            input_ids, attention_mask, deterministic=not dropout
        )
        # frozen encoder (tokenizer.py:80-81): block gradients
        return jax.lax.stop_gradient(out)

    def _encode(self, batch: CodeBatch, *, train: bool, packed=None):
        c = self.cfg
        if packed is not None:
            # sequence-packed text path (data/packing.py): the frozen BERT
            # runs once over shared [R, P] rows; per-code hidden states
            # gather back out. Requires the deterministic text encoder (the
            # default) — dropout noise would leak across packed segments.
            assert not (train and c.text_dropout_in_train), (
                "packed text encoding requires text_dropout_in_train=False"
            )
            flat = self.encode_text_packed(
                packed.input_ids, packed.seg_ids, packed.pos_ids
            )
            text_hidden = flat[packed.gather_idx]          # [B, Lmax, 768]
        else:
            text_hidden = self._encode_text(
                batch.input_ids, batch.attention_mask,
                dropout=train and c.text_dropout_in_train,
            )  # [B, Lt, 768]
        text_features = self.text_mapped(text_hidden)  # [B, Lt, D]

        graph_node_features = self.graph_encoder(
            batch.node_ids, batch.edge_src, batch.edge_dst, batch.edge_weight
        )[-1]  # [B, Ln, D]
        graph_features = global_mean_pool(graph_node_features, batch.node_mask)

        text_cls = text_features[:, 0, :]
        h = jnp.concatenate([text_cls, graph_features], axis=-1)  # [B, 2D]
        return text_features, graph_node_features, h

    def __call__(self, batch: CodeBatch, *, train: bool = True, packed=None):
        """``packed``: optional PackedTextBatch — the text encoder then runs
        over shared packed rows (TrainConfig.packed_text; ~3x fewer BERT
        tokens than bucket-padding a shuffled batch)."""
        c = self.cfg
        text_features, graph_node_features, h = self._encode(
            batch, train=train, packed=packed
        )
        text_mask = (
            packed.text_mask.astype(bool) if packed is not None
            else batch.attention_mask.astype(bool)
        )

        if train:
            # augmented view: edge-dropped graph (+ optional BERT dropout noise)
            if c.text_dropout_in_train:
                text_hidden_aug = self._encode_text(
                    batch.input_ids, batch.attention_mask, dropout=True
                )
                text_cls_aug = self.text_mapped(text_hidden_aug)[:, 0, :]
            else:
                text_cls_aug = h[:, : c.split[0]]
            graph_node_aug = self.graph_encoder(
                batch.node_ids, batch.edge_src_aug, batch.edge_dst_aug,
                batch.edge_weight_aug,
            )[-1]
            graph_features_aug = global_mean_pool(graph_node_aug, batch.node_mask)
            h_aug = jnp.concatenate([text_cls_aug, graph_features_aug], axis=-1)
        else:
            h_aug = None

        result = self.quantize(
            h, text_features, graph_node_features, text_mask, batch.node_mask,
            z_aug=h_aug, train=train,
        )
        if train:
            return result
        return self._eval_outputs(result)

    @staticmethod
    def _eval_outputs(result: dict[str, Any]) -> TokenizedCodes:
        """Assemble the export artifact (tokenizer.py:235-247)."""
        tokens = jnp.stack(
            [
                result["text_tokens"],
                result["graph_tokens"],
                result["shared_text_tokens"],
                result["shared_graph_tokens"],
            ],
            axis=1,
        )  # [B, 4, k]
        weights = jnp.stack(
            [
                result["text_tokens_weights"],
                result["graph_tokens_weights"],
                result["shared_text_tokens_weights"],
                result["shared_graph_tokens_weights"],
            ],
            axis=1,
        )
        embedding = jnp.concatenate(
            [
                result["specific_embedding_text"],
                result["specific_embedding_graph"],
                result["shared_text_embedding"],
                result["shared_graph_embedding"],
            ],
            axis=-1,
        ).astype(jnp.float32)
        return TokenizedCodes(embedding, tokens, weights)

    def encode_text_packed(self, packed_ids, mask_or_segments, pos_ids):
        """Frozen BERT over PACKED rows (data/packing.py): [R, P] ids with a
        block-diagonal mask + within-segment positions -> flat [R*P, 768]
        hidden states. One static shape serves the whole export sweep.

        mask_or_segments: [R, P, P] bool pairwise mask (dense attention), or
        [R, P] int32 segment ids (0 = padding) — the segment form routes
        through the fused block-diagonal Pallas attention when
        cfg.text.packed_flash is set (same masking semantics)."""
        if mask_or_segments.ndim == 2:
            kw = {"attention_mask": None,
                  "segments": mask_or_segments.astype(jnp.int32)}
        else:
            kw = {"attention_mask": mask_or_segments, "segments": None}
        text_hidden = jax.lax.stop_gradient(
            self.text_model(
                packed_ids, position_ids=pos_ids, deterministic=True, **kw,
            )
        )                                              # [R, P, 768]
        return text_hidden.reshape(-1, text_hidden.shape[-1])

    def tokenize_from_hidden(
        self,
        flat_hidden,       # [R*P, 768] from encode_text_packed
        gather_idx,        # [B, Lmax] int32 flat indices into R*P
        text_mask,         # [B, Lmax] bool
        batch: CodeBatch,  # graph arrays (text fields unused)
    ) -> TokenizedCodes:
        """Quantizer eval tail on gathered per-code hidden states."""
        per_code = flat_hidden[gather_idx]             # [B, Lmax, 768]
        text_features = self.text_mapped(per_code)     # [B, Lmax, D]

        graph_node_features = self.graph_encoder(
            batch.node_ids, batch.edge_src, batch.edge_dst, batch.edge_weight
        )[-1]
        graph_features = global_mean_pool(graph_node_features, batch.node_mask)
        text_cls = text_features[:, 0, :]              # offset 0 = [CLS]
        h = jnp.concatenate([text_cls, graph_features], axis=-1)

        result = self.quantize(
            h, text_features, graph_node_features,
            text_mask.astype(bool), batch.node_mask,
            z_aug=None, train=False,
        )
        return self._eval_outputs(result)

    def tokenize_packed(
        self,
        packed_ids,        # [R, P] int32
        pairwise_mask,     # [R, P, P] bool block-diagonal
        pos_ids,           # [R, P] int32 within-segment positions
        gather_idx,        # [B, Lmax] int32 flat indices into R*P
        text_mask,         # [B, Lmax] bool
        batch: CodeBatch,  # graph arrays (text fields unused)
    ) -> TokenizedCodes:
        """Eval tokenization with a PACKED text encoder: descriptions share
        128-token BERT rows under a block-diagonal mask, then hidden states
        gather back into the per-code layout for the quantizer. Numerically
        identical to tokenize() — each segment sees exactly its own tokens
        at positions 0..len-1."""
        flat = self.encode_text_packed(packed_ids, pairwise_mask, pos_ids)
        return self.tokenize_from_hidden(flat, gather_idx, text_mask, batch)

    def encode_shared(self, batch: CodeBatch):
        """Pooled normalized shared-path features for kmeans codebook init."""
        text_features, graph_node_features, _ = self._encode(batch, train=False)
        return self.quantize.shared_pooled(
            text_features, graph_node_features,
            batch.attention_mask.astype(bool), batch.node_mask,
        )

    def tokenize(self, batch: CodeBatch) -> TokenizedCodes:
        """No-grad eval tokenization (tokenizer.py:249-277, with the eval
        outputs of forward — the reference's tokenize() drops tokens/weights
        and has a missing .last_hidden_state bug at :262; fixed here)."""
        return self(batch, train=False)
