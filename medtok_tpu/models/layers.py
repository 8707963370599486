"""Shared flax layers: torch-parity multi-head attention, cross-attention
stack, and GCN/GAT message passing over padded batched subgraphs.

Reference semantics being reproduced:
- CrossAttentionLayer / CrossAttention:
  /root/reference/MedTok/vector_quantization_soft_one_new.py:17-88
  (attn -> residual add -> LayerNorm; NO feed-forward; both directions share
  the same layer stack; keys/values stay the *original* other-modality tensor
  across layers).
- GCNConv: torch_geometric GCNConv defaults (add_self_loops=True, symmetric
  normalization, bias) as used by GraphEncoder
  (/root/reference/MedTok/tokenizer.py:13-45).

The reference loops over samples with variable-length text/graphs
(vector_quantization_soft_one_new.py:133-145). Here attention is a single
masked batched computation — numerically equivalent because padded keys are
masked to -inf before the softmax and padded queries are discarded downstream.
"""

from __future__ import annotations



import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

NEG_INF = -1e9


class MultiheadAttention(nn.Module):
    """torch.nn.MultiheadAttention-compatible MHA (batch-first here).

    q: [B, Lq, E], k/v: [B, Lk, E], key_mask: [B, Lk] bool (True = valid).

    ``use_flash``: route softmax(QK^T)V through the fused Pallas flash
    kernel (ops/flash_attention.py) — O(L) memory instead of the [B,H,L,L]
    score tensor; dropout on attention probabilities is applied inside the
    kernel (counter-hash mask, same semantics as the dense path in
    distribution, not bitwise: flax Dropout draws differ from the kernel's
    hash draws). ``"auto"`` picks the kernel by the measured HBM crossover
    (ops/flash_attention.py::choose_flash): dense wins wherever its score
    tensor fits (flash_speedup 0.89 at fitting shapes, BENCH_r04), so flash
    engages only where dense cannot run. True/False remain hard overrides.
    """

    embed_dim: int
    num_heads: int
    dropout: float = 0.0
    use_flash: bool | str = False
    # 'highest' = bf16x3 exact-fp32 matmuls (parity surfaces); 'default' =
    # single-pass bf16 MXU, 1.58x faster at the EHR shape (~8e-3 abs)
    flash_precision: str = "highest"

    @nn.compact
    def __call__(self, q, k, v, key_mask=None, *, deterministic: bool = True):
        E, H = self.embed_dim, self.num_heads
        Dh = E // H
        assert E % H == 0

        def dense(name):
            return nn.Dense(E, name=name, dtype=q.dtype)

        qp = dense("q_proj")(q)
        kp = dense("k_proj")(k)
        vp = dense("v_proj")(v)

        B, Lq, _ = qp.shape
        Lk = kp.shape[1]
        qh = qp.reshape(B, Lq, H, Dh).transpose(0, 2, 1, 3)
        kh = kp.reshape(B, Lk, H, Dh).transpose(0, 2, 1, 3)
        vh = vp.reshape(B, Lk, H, Dh).transpose(0, 2, 1, 3)

        use_flash = self.use_flash
        if use_flash == "auto":
            from medtok_tpu.ops.flash_attention import choose_flash

            # shapes are static under trace; deterministic=False means the
            # caller is training (AD residency counts — conservatively one
            # resident layer at this altitude, callers with deep encoders
            # should dispatch at the model level with resident_layers)
            use_flash = choose_flash(
                B, H, Lq, Lk, training=not deterministic,
            )
        if use_flash:
            from medtok_tpu.ops.flash_attention import flash_attention

            rate = self.dropout if not deterministic else 0.0
            if rate > 0.0:
                seed = jax.random.randint(
                    self.make_rng("dropout"), (), 0, np.iinfo(np.int32).max
                )
            else:
                seed = 0
            io_dtype = qh.dtype
            if self.flash_precision == "default" and io_dtype == jnp.float32:
                # bf16 q/k/v IO: at small Dh the [B, H, L, Dh] tensors pad
                # 8x in HBM (Dh=16 vs the 128-lane tile) and the custom-VJP
                # residuals of 4 encoder layers OOM a 16 GB chip in fp32
                # at the reference EHR batch 256; bf16 halves that, and
                # 'default' precision is bf16-grade arithmetic anyway
                qh, kh, vh = (t.astype(jnp.bfloat16) for t in (qh, kh, vh))
            out = flash_attention(
                qh, kh, vh, key_mask,
                dropout_rate=rate, dropout_seed=seed,
                interpret=jax.default_backend() != "tpu",
                precision=self.flash_precision,
            ).astype(io_dtype)
        else:
            logits = jnp.einsum(
                "bhqd,bhkd->bhqk", qh, kh, preferred_element_type=jnp.float32
            ) / jnp.sqrt(jnp.asarray(Dh, jnp.float32))
            if key_mask is not None:
                logits = jnp.where(key_mask[:, None, None, :], logits, NEG_INF)
            attn = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
            if self.dropout > 0.0 and not deterministic:
                attn = nn.Dropout(self.dropout)(attn, deterministic=False)
            out = jnp.einsum("bhqk,bhkd->bhqd", attn, vh)
        out = out.transpose(0, 2, 1, 3).reshape(B, Lq, E)
        return nn.Dense(E, name="out_proj", dtype=q.dtype)(out)


class CrossAttentionLayer(nn.Module):
    """attn -> dropout -> residual add -> LayerNorm (vq...py:32-51)."""

    embed_dim: int
    num_heads: int
    dropout: float = 0.1

    @nn.compact
    def __call__(self, query, key, value, key_mask=None, *, deterministic=True):
        attn_out = MultiheadAttention(
            self.embed_dim, self.num_heads, self.dropout, name="multihead_attn"
        )(query, key, value, key_mask, deterministic=deterministic)
        if self.dropout > 0.0 and not deterministic:
            attn_out = nn.Dropout(self.dropout)(attn_out, deterministic=False)
        return nn.LayerNorm(epsilon=1e-5, dtype=query.dtype, name="layer_norm")(
            query + attn_out
        )


class CrossAttention(nn.Module):
    """Bidirectional cross-attention with a SHARED layer stack (vq...py:53-88).

    vector1 attends to (fixed) vector2 through all layers, then vector2
    attends to (fixed) vector1 through the *same* layers.
    """

    embed_dim: int
    num_heads: int
    dropout: float = 0.1
    layers: int = 2

    @nn.compact
    def __call__(self, v1, v2, v1_mask=None, v2_mask=None, *, deterministic=True):
        stack = [
            CrossAttentionLayer(
                self.embed_dim, self.num_heads, self.dropout, name=f"layer_{i}"
            )
            for i in range(self.layers)
        ]
        v1_ = v1
        for layer in stack:
            v1_ = layer(v1_, v2, v2, v2_mask, deterministic=deterministic)
        v2_ = v2
        for layer in stack:
            v2_ = layer(v2_, v1, v1, v1_mask, deterministic=deterministic)
        return v1_, v2_


# ---------------------------------------------------------------------------
# Graph convolutions over flat padded batched subgraphs
# ---------------------------------------------------------------------------

def gcn_propagate(
    x: jax.Array,
    edge_src: jax.Array,
    edge_dst: jax.Array,
    edge_weight: jax.Array,
) -> jax.Array:
    """Symmetric-normalized sum aggregation with implicit self-loops.

    x: [N, D] transformed node features (x @ W), edges flat-indexed into N.
    Padded edges carry weight 0 and point at slot 0 — they contribute nothing
    to either degrees or messages. Every node slot gets a weight-1 self-loop
    (PyG GCNConv add_self_loops=True).
    """
    n = x.shape[0]
    w = edge_weight.astype(jnp.float32)
    deg = jnp.ones((n,), jnp.float32).at[edge_dst].add(w)  # ones = self-loops
    dinv = jax.lax.rsqrt(deg)
    coef = (dinv[edge_src] * dinv[edge_dst] * w)[:, None].astype(x.dtype)
    out = (dinv * dinv)[:, None].astype(x.dtype) * x  # self-loop messages
    out = out.at[edge_dst].add(coef * x[edge_src])
    return out


def gcn_norm_adj(
    edge_src: jax.Array,     # [E] within-graph local node indices
    edge_dst: jax.Array,     # [E]
    edge_weight: jax.Array,  # [E]
    batch: int,
    num_nodes: int,
    dtype=jnp.float32,
) -> jax.Array:
    """Dense normalized adjacency [B, Ln, Ln]: A[b, i, j] = coefficient of
    node j's message into node i (symmetric normalization + self-loops —
    exactly gcn_propagate's math, materialized once per GraphEncoder call).

    For large node buckets the edge-list scatter path is the bottleneck
    (measured 1.74 ms/code at Ln=512 vs 0.031 at Ln=16): scatter-adds of
    D-wide feature rows serialize on TPU — and so does a scalar-coefficient
    scatter (181 ms of a 194 ms Ln=512 tail step, scripts/profile_tail.py).

    Scatter-free build: the symmetric-normalized coefficient
    ``dinv[dst]*dinv[src]*w`` is RANK-ONE over the edge's endpoints, so

        A = dinv ⊗ dinv ⊙ Count + diag(dinv²),
        Count[b, i, j] = Σ_e w_e·1[dst_e=i]·1[src_e=j],
        deg = 1 + Count.sum(src axis)

    and Count is a batched one-hot matmul: 0/1 one-hots are EXACT in bf16
    and accumulation runs in fp32 on the MXU, so for the pipeline's binary
    edge weights (C++ packer writes 1.0 valid / 0.0 padding) the result is
    fp32-exact — no scatter anywhere. Chunked over the edge axis to bound
    the materialized one-hots. Non-binary weights round to bf16 in the
    masked one-hot (nothing in this framework produces them).
    """
    E = edge_src.shape[0]
    assert E % batch == 0, "edge array must be per-graph chunked"
    epg = E // batch
    src = edge_src.reshape(batch, epg)
    dst = edge_dst.reshape(batch, epg)
    w = edge_weight.reshape(batch, epg)
    iota = jnp.arange(num_nodes, dtype=edge_src.dtype)

    # chunk so each materialized one-hot stays under ~1 GiB of bf16 (fewer
    # chunks = fewer fp32 accumulator round-trips, the dominant traffic)
    cap = (1 << 30) // max(batch * num_nodes * 2, 1)
    chunk = max(min(epg, cap), 1)
    while epg % chunk:
        chunk -= 1

    count = jnp.zeros((batch, num_nodes, num_nodes), jnp.float32)
    for c0 in range(0, epg, chunk):
        s_oh = (src[:, c0:c0 + chunk, None] == iota).astype(jnp.bfloat16)
        d_oh = (dst[:, c0:c0 + chunk, None] == iota).astype(jnp.bfloat16)
        d_oh = d_oh * w[:, c0:c0 + chunk, None].astype(jnp.bfloat16)
        count = count + jnp.einsum(
            "bei,bej->bij", d_oh, s_oh, preferred_element_type=jnp.float32
        )
    deg = 1.0 + count.sum(axis=2)
    dinv = jax.lax.rsqrt(deg)
    adj = dinv[:, :, None] * dinv[:, None, :] * count
    # self-loops: elementwise eye mask (a diagonal scatter would serialize)
    eye = (iota[:, None] == iota[None, :]).astype(jnp.float32)
    adj = adj + eye[None] * (dinv * dinv)[:, :, None]
    return adj.astype(dtype)


class GCNConv(nn.Module):
    """torch_geometric.nn.GCNConv parity: out = propagate(x @ W) + b.

    ``adj`` (optional [B, Ln, Ln] from gcn_norm_adj, with x viewable as
    [B, Ln, D]) switches aggregation to a batched MXU matmul — numerically
    the same sum with matmul reduction order instead of scatter order."""

    out_channels: int

    @nn.compact
    def __call__(self, x, edge_src, edge_dst, edge_weight, adj=None):
        xw = nn.Dense(self.out_channels, use_bias=False, dtype=x.dtype, name="lin")(x)
        if adj is not None:
            B, Ln, _ = adj.shape
            out = jnp.einsum(
                "bij,bjd->bid", adj.astype(x.dtype),
                xw.reshape(B, Ln, self.out_channels),
            ).reshape(B * Ln, self.out_channels)
        else:
            out = gcn_propagate(xw, edge_src, edge_dst, edge_weight)
        bias = self.param("bias", nn.initializers.zeros, (self.out_channels,))
        return out + bias.astype(x.dtype)


class GATConv(nn.Module):
    """torch_geometric.nn.GATConv semantics (used when graph_model_name='GAT';
    note the reference's GAT path is actually broken by a DGL import shadow at
    tokenizer.py:3 — this is the working PyG-semantics version).

    Single edge-type additive attention with per-head leaky-relu scores and
    segment-softmax over incoming edges (self-loops added).
    """

    out_channels: int
    num_heads: int = 4
    concat_heads: bool = True
    negative_slope: float = 0.2

    @nn.compact
    def __call__(self, x, edge_src, edge_dst, edge_weight):
        n = x.shape[0]
        H, C = self.num_heads, self.out_channels
        xw = nn.Dense(H * C, use_bias=False, dtype=x.dtype, name="lin")(x)
        xw = xw.reshape(n, H, C)
        a_src = self.param("att_src", nn.initializers.glorot_uniform(), (H, C))
        a_dst = self.param("att_dst", nn.initializers.glorot_uniform(), (H, C))
        alpha_src = jnp.einsum("nhc,hc->nh", xw, a_src.astype(x.dtype))
        alpha_dst = jnp.einsum("nhc,hc->nh", xw, a_dst.astype(x.dtype))

        # self-loops: append one (i, i) edge per node with weight 1
        loop = jnp.arange(n, dtype=edge_src.dtype)
        src = jnp.concatenate([edge_src, loop])
        dst = jnp.concatenate([edge_dst, loop])
        w = jnp.concatenate([edge_weight.astype(jnp.float32), jnp.ones((n,), jnp.float32)])

        e = jax.nn.leaky_relu(
            alpha_src[src] + alpha_dst[dst], self.negative_slope
        ).astype(jnp.float32)
        e = jnp.where(w[:, None] > 0, e, NEG_INF)
        # segment softmax over incoming edges of each dst node
        e_max = jnp.full((n, H), NEG_INF, jnp.float32).at[dst].max(e)
        e_exp = jnp.exp(e - e_max[dst]) * w[:, None]
        denom = jnp.zeros((n, H), jnp.float32).at[dst].add(e_exp)
        alpha = (e_exp / jnp.maximum(denom[dst], 1e-16)).astype(x.dtype)

        out = jnp.zeros((n, H, C), x.dtype).at[dst].add(alpha[..., None] * xw[src])
        if self.concat_heads:
            out = out.reshape(n, H * C)
        else:
            out = out.mean(axis=1)
        bias_dim = H * C if self.concat_heads else C
        bias = self.param("bias", nn.initializers.zeros, (bias_dim,))
        return out + bias.astype(x.dtype)


def global_mean_pool(x: jax.Array, mask: jax.Array) -> jax.Array:
    """Masked mean over the node axis: x [B, N, D], mask [B, N] -> [B, D].

    Equals torch_geometric global_mean_pool on the batched ragged graphs
    (tokenizer.py:216) since padded slots are excluded.
    """
    m = mask.astype(x.dtype)
    s = jnp.sum(x * m[..., None], axis=1)
    cnt = jnp.maximum(jnp.sum(m, axis=1, keepdims=True), 1.0)
    return s / cnt
