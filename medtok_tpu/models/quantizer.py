"""SoftVQQuantizer — the quantization core as a flax module.

Reference: VectorQuantizer in
/root/reference/MedTok/vector_quantization_soft_one_new.py:90-271.

Three quantization paths per sample share ONE codebook [n_e, e_dim]:
  1. shared: bidirectional cross-attention between per-sample text tokens and
     graph nodes, CLS / masked-mean pooling, soft top-k against the FULL
     codebook (:127-185);
  2. text-specific: proj_text(z_text) against rows [0, n_e//3) (:187-217);
  3. graph-specific: proj_graph(z_graph) against rows [n_e - n_e//3, n_e).

Unlike the reference (which serializes the batch in a Python loop at
:133-145), the cross-attention here is one masked batched computation.

This module also *returns* the token indices/weights for all four paths —
the reference's eval branch (tokenizer.py:235-238) expects those keys but its
quantizer never produced them (latent upstream bug, consciously fixed here).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from medtok_tpu.config import QuantizerConfig
from medtok_tpu.models.layers import CrossAttention, global_mean_pool
from medtok_tpu.ops import vq as vq_ops


class SoftVQQuantizer(nn.Module):
    cfg: QuantizerConfig
    split: tuple[int, int] = (64, 64)
    # Data-parallel axis name when running inside shard_map: used indices are
    # all-gathered across the axis before the FIFO update, so the replicated
    # usage buffer sees the GLOBAL batch. (The reference instead relies on
    # DDP's rank-0 buffer broadcast — per-rank telemetry; this is the
    # mesh-native, more accurate equivalent of norm_ema-style stat reduction.)
    dp_axis: str | None = None
    # Tensor-parallel axis: the O(B*N*D) codebook distance sweep is sharded
    # row-wise over this axis (ops.vq.distance_topk_tp) — the scale axis for
    # large codebooks. None = single-device sweep.
    tp_axis: str | None = None

    def setup(self):
        c = self.cfg
        if c.use_kmeans:
            # EMA codebook (completed --kmeans mode, see QuantizerConfig):
            # non-gradient storage in the 'usage' collection so the train
            # step's existing mutable threading, checkpointing, and resume
            # carry it bitwise with zero extra plumbing. The init value is
            # a placeholder — train.trainer.kmeans_init_codebook overwrites
            # it from the first batches' shared-path features.
            self.ema_codebook = self.variable(
                "usage", "ema_codebook",
                lambda: vq_ops.l2_normalize(jax.random.normal(
                    jax.random.PRNGKey(0),
                    (c.codebook_size, c.codebook_embed_dim), jnp.float32,
                )),
            )
            self.ema_cluster = self.variable(
                "usage", "ema_cluster",
                lambda: jnp.zeros((c.codebook_size,), jnp.float32),
            )
            if c.codebook_revival:
                # EMA of per-code assignment probability (CVectorQuantiser
                # embed_prob, norm_ema_quantizer.py:377-379). Zero init =
                # every code is revival-eligible on the first batch — the
                # same data-driven re-init the reference's init=False
                # default produces.
                self.ema_embed_prob = self.variable(
                    "usage", "ema_embed_prob",
                    lambda: jnp.zeros((c.codebook_size,), jnp.float32),
                )
        else:
            # torch nn.Embedding init is N(0, 1) (vq...py:115)
            self.codebook = self.param(
                "codebook", nn.initializers.normal(stddev=1.0),
                (c.codebook_size, c.codebook_embed_dim), jnp.float32,
            )
        self.cross_attn = CrossAttention(
            embed_dim=c.codebook_embed_dim,
            num_heads=c.num_heads,
            dropout=c.cross_attn_dropout,
            layers=c.cross_attn_layers,
            name="cross_attn",
        )
        self.proj_text = nn.Dense(c.codebook_embed_dim, name="proj_text")
        self.proj_graph = nn.Dense(c.codebook_embed_dim, name="proj_graph")
        if c.show_usage:
            self.codebook_used = self.variable(
                "usage", "codebook_used",
                lambda: jnp.zeros((c.usage_buffer_size,), jnp.int32),
            )
            self.usage_counts = self.variable(
                "usage", "usage_counts",
                lambda: vq_ops.usage_counts_init(
                    c.codebook_size, c.usage_buffer_size
                ),
            )

    def _tp_axis(self) -> str | None:
        # init traces outside shard_map where mesh axes are unbound
        return None if self.is_initializing() else self.tp_axis

    def _cb(self) -> jax.Array:
        """The codebook tensor: a gradient param normally, the EMA variable
        in the completed --kmeans mode."""
        return (self.ema_codebook.value if self.cfg.use_kmeans
                else self.codebook)

    def _ema_codebook_update(self, flat_n, top1) -> None:
        """Norm-EMA codebook write from the shared path's top-1 assignments
        (norm_ema_quantizer.py:166-218 semantics: per-shard one-hot stats,
        psum over dp BEFORE the normalized EMA write — ops/ema.py). flat_n:
        [M, D] l2-normalized features; top1: [M] full-codebook indices."""
        from medtok_tpu.ops.ema import ema_update, norm_ema_update

        c = self.cfg
        # EMA statistics are non-gradient state (the reference updates its
        # buffers in-place outside autograd). Without this stop_gradient the
        # SPECIFIC paths — which read the just-updated codebook later in the
        # same forward — would differentiate the update back into the shared
        # features, and the zero-bin where() masks NaN cotangents into them.
        flat_n = jax.lax.stop_gradient(flat_n)
        w = self.ema_codebook.value
        one_hot = jax.nn.one_hot(top1, c.codebook_size, dtype=jnp.float32)
        bins = jnp.sum(one_hot, axis=0)
        embed_sum = flat_n.T @ one_hot  # [D, C]
        if self.dp_axis is not None:
            bins = jax.lax.psum(bins, self.dp_axis)
            embed_sum = jax.lax.psum(embed_sum, self.dp_axis)
        zero = bins == 0
        bins_c = jnp.where(zero, 1.0, bins)
        embed_normalized = vq_ops.l2_normalize((embed_sum / bins_c[None, :]).T)
        embed_normalized = jnp.where(zero[:, None], w, embed_normalized)
        new_w = norm_ema_update(w, embed_normalized, c.codebook_ema_decay)
        self.ema_cluster.value = ema_update(
            self.ema_cluster.value, bins, c.codebook_ema_decay
        )
        if c.codebook_revival:
            # Dead-code revival (CVectorQuantiser 'closest' anchor,
            # norm_ema_quantizer.py:381-396): codes whose EMA assignment
            # probability has decayed get rewritten toward the feature with
            # the highest affinity. Deviations from the reference, on
            # purpose: (a) avg_probs comes from the psum'd bins, and the
            # anchor pool is the all-gathered global batch, so dp-sharded
            # and single-device runs stay bitwise identical (the reference's
            # per-rank embed_prob/anchor silently diverges under DDP until
            # the next rank-0 buffer broadcast); (b) the revived row is
            # re-normalized — this codebook keeps an l2-unit invariant the
            # reference's CVQ class doesn't have.
            total = jnp.maximum(jnp.sum(bins), 1.0)
            avg_probs = bins / total
            new_prob = ema_update(
                self.ema_embed_prob.value, avg_probs, c.codebook_ema_decay
            )
            self.ema_embed_prob.value = new_prob
            feats = flat_n
            if self.dp_axis is not None:
                feats = jax.lax.all_gather(feats, self.dp_axis, tiled=True)
            aff = feats @ new_w.T                       # [M, C], D small
            anchor = feats[jnp.argmax(aff, axis=0)]     # [C, D]
            revive = jnp.exp(
                -(new_prob * c.codebook_size * 10.0)
                / (1.0 - c.codebook_ema_decay) - 1e-3
            )[:, None]                                   # (ref :395)
            new_w = vq_ops.l2_normalize(
                new_w * (1.0 - revive) + anchor * revive
            )
        self.ema_codebook.value = new_w

    # -- usage FIFO (vq...py:219-236); mutable only when 'usage' collection is.
    def _track_usage(self, indices: jax.Array) -> jax.Array:
        c = self.cfg
        if not c.show_usage:
            return jnp.asarray(0.0, jnp.float32)
        if self.dp_axis is not None and not self.is_initializing():
            indices = jax.lax.all_gather(indices, self.dp_axis, tiled=True)
        buf, counts, usage = vq_ops.usage_update(
            self.codebook_used.value, self.usage_counts.value, indices,
            c.codebook_size,
        )
        if not self.is_initializing() and self.is_mutable_collection("usage"):
            self.codebook_used.value = buf
            self.usage_counts.value = counts
        return usage

    def get_shared_info(
        self, z_text, z_graph, text_mask, node_mask, *, train: bool
    ):
        """Shared-path quantization (vq...py:127-185).

        z_text: [B, Lt, D] mapped text token features; z_graph: [B, Ln, D]
        graph node features; masks True=valid. Returns
        (z_q_cat, loss_tuple, usage, tokens_dict).
        """
        c = self.cfg
        t_attn, g_attn = self.cross_attn(
            z_text, z_graph, v1_mask=text_mask, v2_mask=node_mask,
            deterministic=not train,
        )
        z_flat_text = t_attn[:, 0, :]  # [CLS] (vq...py:139)
        z_flat_graph = global_mean_pool(g_attn, node_mask)  # (vq...py:140)

        tp = self._tp_axis()
        q_text = vq_ops.soft_topk_quantize(
            z_flat_text, self._cb(), k=c.top_k, beta=c.commit_loss_beta,
            l2_norm=c.l2_norm, train=train, tp_axis=tp,
            backend=c.topk_backend,
        )
        q_graph = vq_ops.soft_topk_quantize(
            z_flat_graph, self._cb(), k=c.top_k, beta=c.commit_loss_beta,
            l2_norm=c.l2_norm, train=train, tp_axis=tp,
            backend=c.topk_backend,
        )
        usage = self._track_usage(
            jnp.concatenate([q_text.indices, q_graph.indices], axis=-1)
        )
        z_text_n = vq_ops.l2_normalize(z_flat_text.astype(jnp.float32))
        z_graph_n = vq_ops.l2_normalize(z_flat_graph.astype(jnp.float32))
        # (use_kmeans EMA update happens in __call__, fed by ALL THREE
        # quantization sites — shared alone starves the specific regions:
        # measured on-chip, usage collapsed 0.156 -> 0.028 in 100 steps)

        # optional entropy regularizer input: full-codebook affinity (-d),
        # materialized only when the ratio is non-zero (train_MedTok.py:373
        # defaults it to 0.0 and the reference never wires it; this is the
        # completed path for entropy_loss_ratio > 0)
        affinity = None
        if train and c.entropy_loss_ratio > 0:
            e_n = vq_ops.l2_normalize(self._cb().astype(jnp.float32))
            affinity = -jnp.concatenate(
                [
                    vq_ops.squared_distance(z_text_n, e_n),
                    vq_ops.squared_distance(z_graph_n, e_n),
                ],
                axis=0,
            )
        loss_tuple = (
            q_text.vq_loss + q_graph.vq_loss,
            q_text.commit_loss + q_graph.commit_loss,
            z_text_n, z_graph_n, q_text.z_q, q_graph.z_q,
        )
        tokens = {
            "shared_text_tokens": q_text.indices,
            "shared_text_tokens_weights": q_text.weights,
            "shared_graph_tokens": q_graph.indices,
            "shared_graph_tokens_weights": q_graph.weights,
        }
        if affinity is not None:
            tokens["shared_affinity"] = affinity
        z_q_cat = jnp.concatenate([q_text.z_q, q_graph.z_q], axis=-1)
        return z_q_cat, loss_tuple, usage, tokens

    def shared_pooled(self, z_text, z_graph, text_mask, node_mask):
        """Normalized pooled shared-path features (no quantization) — the
        data the kmeans codebook init clusters (the reference's kmeans=True
        flag constructs an EmbeddingEMA codebook but never invokes its
        init on this path; see train.trainer.kmeans_init_codebook)."""
        t_attn, g_attn = self.cross_attn(
            z_text, z_graph, v1_mask=text_mask, v2_mask=node_mask,
            deterministic=True,
        )
        z_t = vq_ops.l2_normalize(t_attn[:, 0, :].astype(jnp.float32))
        z_g = vq_ops.l2_normalize(
            global_mean_pool(g_attn, node_mask).astype(jnp.float32)
        )
        return z_t, z_g

    def specific_embedding(self, z, types: str, *, train: bool, track: bool = True):
        """Modality-specific quantization against a codebook region
        (vq...py:187-217). Returned indices are region-local, matching the
        reference's indexing of the sliced codebook."""
        c = self.cfg
        proj = self.proj_text if types == "text" else self.proj_graph
        z_p = proj(z)
        if self._tp_axis() is not None:
            n = c.codebook_size
            third = n // 3
            bounds = (0, third) if types == "text" else (n - third, n)
            q = vq_ops.soft_topk_quantize(
                z_p, self._cb(), k=c.top_k, beta=c.commit_loss_beta,
                l2_norm=c.l2_norm, train=train, tp_axis=self._tp_axis(),
                region=bounds, backend=c.topk_backend,
            )
        else:
            region = vq_ops.region_slice(self._cb(), types)
            q = vq_ops.soft_topk_quantize(
                z_p, region, k=c.top_k, beta=c.commit_loss_beta,
                l2_norm=c.l2_norm, train=train, backend=c.topk_backend,
            )
        usage = self._track_usage(q.indices) if track else jnp.asarray(0.0)
        z_p_n = vq_ops.l2_normalize(z_p.astype(jnp.float32))
        return q.z_q, (q.vq_loss, q.commit_loss, z_p_n, q.z_q), usage, q.indices, q.weights

    def __call__(
        self,
        z: jax.Array,             # [B, split0+split1] = cat(text_cls, graph_pool)
        text_features: jax.Array,  # [B, Lt, D] mapped text token features
        graph_node_features: jax.Array,  # [B, Ln, D]
        text_mask: jax.Array,      # [B, Lt] bool
        node_mask: jax.Array,      # [B, Ln] bool
        z_aug: jax.Array | None = None,
        *,
        train: bool = True,
    ) -> dict[str, Any]:
        s0, s1 = self.split
        shared_emb, shared_loss, shared_usage, shared_tokens = self.get_shared_info(
            text_features, graph_node_features, text_mask, node_mask, train=train
        )
        shared_text_embedding = shared_emb[:, :s0]
        shared_graph_embedding = shared_emb[:, s0:]
        z_text_embedding = z[:, :s0]
        z_graph_embedding = z[:, s0:]

        spec_text, text_loss, text_usage, text_idx, text_w = self.specific_embedding(
            z_text_embedding, "text", train=train
        )
        spec_graph, graph_loss, graph_usage, graph_idx, graph_w = self.specific_embedding(
            z_graph_embedding, "graph", train=train
        )

        if z_aug is not None:
            # the reference also FIFO-tracks the aug paths (vq...py:249-250)
            spec_text_aug, _, _, _, _ = self.specific_embedding(
                z_aug[:, :s0], "text", train=train
            )
            spec_graph_aug, _, _, _, _ = self.specific_embedding(
                z_aug[:, s0:], "graph", train=train
            )
        else:
            spec_text_aug = None
            spec_graph_aug = None

        c = self.cfg
        if (c.use_kmeans and train and not self.is_initializing()
                and self.is_mutable_collection("usage")):
            # Norm-EMA codebook write from ALL THREE quantization sites'
            # top-1 assignments: shared (full codebook, pooled cross-attn
            # features) + both specific paths (their region-local indices
            # shifted to global rows). Feeding only the shared path starves
            # the specific regions of EMA signal and the codebook collapses
            # (measured on-chip: usage 0.156 -> 0.028 within 100 steps).
            # Aug paths are excluded — their perturbed assignments would
            # double-count the same samples.
            g_off = c.codebook_size - c.codebook_size // 3
            feats = jnp.concatenate([
                shared_loss[2], shared_loss[3],     # z_text_n, z_graph_n
                text_loss[2], graph_loss[2],        # specific z_p_n
            ], axis=0)
            top1 = jnp.concatenate([
                shared_tokens["shared_text_tokens"][:, 0],
                shared_tokens["shared_graph_tokens"][:, 0],
                text_idx[:, 0],
                graph_idx[:, 0] + g_off,
            ], axis=0)
            self._ema_codebook_update(feats, top1)

        return {
            "graph_feature": z_graph_embedding,
            "text_feature": z_text_embedding,
            "shared_text_embedding": shared_text_embedding,
            "shared_graph_embedding": shared_graph_embedding,
            "shared_embed_loss": shared_loss,
            "shared_codebook_usage": shared_usage,
            "specific_embedding_text": spec_text,
            "text_specific_loss": text_loss,
            "text_specific_usage": text_usage,
            "specific_embedding_graph": spec_graph,
            "graph_specific_loss": graph_loss,
            "graph_specific_usage": graph_usage,
            "specific_embedding_text_aug": spec_text_aug,
            "specific_embedding_graph_aug": spec_graph_aug,
            # token ids/weights for the eval export path (tokenizer.py:235-244)
            "text_tokens": text_idx,
            "text_tokens_weights": text_w,
            "graph_tokens": graph_idx,
            "graph_tokens_weights": graph_w,
            **shared_tokens,
        }
