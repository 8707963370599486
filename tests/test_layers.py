"""Layer parity tests: flax MHA vs torch.nn.MultiheadAttention, GCNConv vs
hand-computed PyG semantics, masked batched cross-attention vs per-sample
computation (the reference's Python loop, vq...py:133-145)."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from medtok_tpu.models.layers import (
    CrossAttention,
    GCNConv,
    MultiheadAttention,
    gcn_propagate,
    global_mean_pool,
)

E, H = 16, 4


def make_torch_mha(seed=0):
    torch.manual_seed(seed)
    mha = torch.nn.MultiheadAttention(E, H, dropout=0.0)
    mha.eval()
    return mha


def torch_mha_params(mha):
    """Map torch packed in_proj weights to our q/k/v/out Dense params."""
    w = mha.in_proj_weight.detach().numpy()
    b = mha.in_proj_bias.detach().numpy()
    wq, wk, wv = w[:E], w[E:2*E], w[2*E:]
    bq, bk, bv = b[:E], b[E:2*E], b[2*E:]
    return {
        "q_proj": {"kernel": jnp.asarray(wq.T), "bias": jnp.asarray(bq)},
        "k_proj": {"kernel": jnp.asarray(wk.T), "bias": jnp.asarray(bk)},
        "v_proj": {"kernel": jnp.asarray(wv.T), "bias": jnp.asarray(bv)},
        "out_proj": {
            "kernel": jnp.asarray(mha.out_proj.weight.detach().numpy().T),
            "bias": jnp.asarray(mha.out_proj.bias.detach().numpy()),
        },
    }


def test_mha_matches_torch():
    rng = np.random.default_rng(0)
    Lq, Lk = 7, 11
    q = rng.normal(size=(Lq, E)).astype(np.float32)
    k = rng.normal(size=(Lk, E)).astype(np.float32)
    mha = make_torch_mha()
    with torch.no_grad():
        ref, _ = mha(torch.tensor(q), torch.tensor(k), torch.tensor(k))
    mod = MultiheadAttention(E, H, 0.0)
    out = mod.apply(
        {"params": torch_mha_params(mha)},
        jnp.asarray(q)[None], jnp.asarray(k)[None], jnp.asarray(k)[None],
    )
    np.testing.assert_allclose(np.asarray(out[0]), ref.numpy(), rtol=2e-4, atol=2e-5)


def test_masked_batched_equals_per_sample():
    """Padded+masked batched attention == slicing to true lengths — the
    numerical-equivalence requirement for vectorizing the reference's loop."""
    rng = np.random.default_rng(1)
    B, Lq, Lk = 3, 6, 9
    lens = [4, 9, 1]
    q = rng.normal(size=(B, Lq, E)).astype(np.float32)
    k = rng.normal(size=(B, Lk, E)).astype(np.float32)
    key_mask = np.zeros((B, Lk), bool)
    for i, L in enumerate(lens):
        key_mask[i, :L] = True

    mod = MultiheadAttention(E, H, 0.0)
    params = mod.init(jax.random.PRNGKey(0), jnp.asarray(q), jnp.asarray(k), jnp.asarray(k))
    batched = mod.apply(params, jnp.asarray(q), jnp.asarray(k), jnp.asarray(k),
                        jnp.asarray(key_mask))
    for i, L in enumerate(lens):
        single = mod.apply(
            params, jnp.asarray(q[i:i+1]), jnp.asarray(k[i:i+1, :L]),
            jnp.asarray(k[i:i+1, :L]),
        )
        np.testing.assert_allclose(
            np.asarray(batched[i]), np.asarray(single[0]), rtol=1e-4, atol=1e-5
        )


def test_cross_attention_shared_stack_and_fixed_kv():
    """CrossAttention must (a) share layers between directions and (b) keep
    keys/values fixed to the ORIGINAL other tensor (vq...py:78-88)."""
    rng = np.random.default_rng(2)
    v1 = jnp.asarray(rng.normal(size=(1, 5, E)).astype(np.float32))
    v2 = jnp.asarray(rng.normal(size=(1, 7, E)).astype(np.float32))
    mod = CrossAttention(E, H, dropout=0.0, layers=2)
    params = mod.init(jax.random.PRNGKey(0), v1, v2)
    o1, o2 = mod.apply(params, v1, v2)
    # manual: run the shared stack by hand
    from medtok_tpu.models.layers import CrossAttentionLayer
    layer0 = CrossAttentionLayer(E, H, 0.0)
    layer1 = CrossAttentionLayer(E, H, 0.0)
    p = params["params"]
    p0, p1 = {"params": p["layer_0"]}, {"params": p["layer_1"]}
    x = layer0.apply(p0, v1, v2, v2)
    x = layer1.apply(p1, x, v2, v2)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(x), rtol=1e-5, atol=1e-6)
    y = layer0.apply(p0, v2, v1, v1)
    y = layer1.apply(p1, y, v1, v1)
    np.testing.assert_allclose(np.asarray(o2), np.asarray(y), rtol=1e-5, atol=1e-6)


def numpy_gcn(x, edges, W, b):
    """PyG GCNConv golden in numpy: add self-loops, symmetric norm, sum-agg."""
    n = x.shape[0]
    xw = x @ W
    deg = np.ones(n)
    for s, d in edges:
        deg[d] += 1.0
    dinv = 1.0 / np.sqrt(deg)
    out = (dinv * dinv)[:, None] * xw
    for s, d in edges:
        out[d] += dinv[s] * dinv[d] * xw[s]
    return out + b


def test_gcn_propagate_matches_numpy_golden():
    rng = np.random.default_rng(3)
    n, din, dout = 6, 4, 3
    x = rng.normal(size=(n, din)).astype(np.float32)
    edges = [(0, 1), (1, 0), (2, 3), (3, 2), (4, 1), (1, 4), (5, 5)]
    W = rng.normal(size=(din, dout)).astype(np.float32)
    b = rng.normal(size=(dout,)).astype(np.float32)

    src = jnp.asarray([e[0] for e in edges] + [0, 0], jnp.int32)  # 2 padded
    dst = jnp.asarray([e[1] for e in edges] + [0, 0], jnp.int32)
    w = jnp.asarray([1.0] * len(edges) + [0.0, 0.0], jnp.float32)

    mod = GCNConv(dout)
    params = {"params": {"lin": {"kernel": jnp.asarray(W)}, "bias": jnp.asarray(b)}}
    out = mod.apply(params, jnp.asarray(x), src, dst, w)
    ref = numpy_gcn(x, edges, W, b)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-5)


def test_padded_edges_do_not_leak():
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(size=(4, 3)).astype(np.float32))
    src = jnp.asarray([1, 0], jnp.int32)
    dst = jnp.asarray([0, 0], jnp.int32)
    base = gcn_propagate(x, src[:1], dst[:1], jnp.asarray([1.0]))
    padded = gcn_propagate(x, src, dst, jnp.asarray([1.0, 0.0]))
    np.testing.assert_allclose(np.asarray(base), np.asarray(padded), rtol=1e-6)


def test_global_mean_pool_masked():
    x = jnp.asarray(np.arange(2 * 3 * 2, dtype=np.float32).reshape(2, 3, 2))
    mask = jnp.asarray([[True, True, False], [True, False, False]])
    out = global_mean_pool(x, mask)
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray((x[0, 0] + x[0, 1]) / 2))
    np.testing.assert_allclose(np.asarray(out[1]), np.asarray(x[1, 0]))


def test_gat_conv_properties():
    """GATConv: shapes, head concat, self-loop inclusion, padded-edge
    isolation (the reference's GAT path is broken by an import shadow at
    tokenizer.py:3; this is the working PyG-semantics version)."""
    from medtok_tpu.models.layers import GATConv

    rng = np.random.default_rng(0)
    n, din, dout, H = 5, 4, 3, 2
    x = jnp.asarray(rng.normal(size=(n, din)).astype(np.float32))
    src = jnp.asarray([0, 1, 2, 0, 0], jnp.int32)   # last 2 padded
    dst = jnp.asarray([1, 0, 3, 0, 0], jnp.int32)
    w = jnp.asarray([1.0, 1.0, 1.0, 0.0, 0.0])
    mod = GATConv(dout, num_heads=H, concat_heads=True)
    params = mod.init(jax.random.PRNGKey(0), x, src, dst, w)
    out = mod.apply(params, x, src, dst, w)
    assert out.shape == (n, H * dout)
    # node 4 has ONLY its self-loop: output must equal its own projection
    p = params["params"]
    xw = (np.asarray(x) @ np.asarray(p["lin"]["kernel"])).reshape(n, H, dout)
    expected4 = xw[4].reshape(-1) + np.asarray(p["bias"])
    np.testing.assert_allclose(np.asarray(out[4]), expected4, rtol=1e-5)
    # padded edges must not change results
    out2 = mod.apply(params, x, src[:3], dst[:3], w[:3])
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2), rtol=1e-5)


def test_gat_graph_encoder_forward():
    from medtok_tpu.config import GraphEncoderConfig
    from medtok_tpu.models.graph_encoder import GraphEncoder

    cfg = GraphEncoderConfig(model_name="GAT", num_nodes=100, in_channels=8,
                             hidden_channels=6, out_channels=4, gat_num_heads=2)
    enc = GraphEncoder(cfg)
    node_ids = jnp.asarray(np.arange(12).reshape(2, 6), jnp.int32)
    src = jnp.asarray([0, 1, 0, 0], jnp.int32)
    dst = jnp.asarray([1, 2, 0, 0], jnp.int32)
    w = jnp.asarray([1.0, 1.0, 0.0, 0.0])
    params = enc.init(jax.random.PRNGKey(0), node_ids, src, dst, w)
    hidden = enc.apply(params, node_ids, src, dst, w)
    assert hidden[-1].shape == (2, 6, 4)  # heads=1 on the output layer
    assert np.isfinite(np.asarray(hidden[-1])).all()


def test_gcn_dense_adjacency_matches_edge_path():
    """gcn_norm_adj + matmul aggregation == edge-list scatter aggregation
    (the large-node-bucket fast path, models/graph_encoder.py); same math,
    matmul reduction order."""
    from medtok_tpu.models.layers import GCNConv, gcn_norm_adj

    rng = np.random.default_rng(3)
    B, Ln, E, D = 3, 8, 12, 5
    x = jnp.asarray(rng.standard_normal((B * Ln, D)), jnp.float32)
    src_l = rng.integers(0, Ln, B * E).astype(np.int32)
    dst_l = rng.integers(0, Ln, B * E).astype(np.int32)
    w = (rng.random(B * E) > 0.3).astype(np.float32)
    g = np.arange(B * E) // E
    src_f = jnp.asarray(src_l + g * Ln)
    dst_f = jnp.asarray(dst_l + g * Ln)

    m = GCNConv(4)
    params = m.init(jax.random.PRNGKey(0), x, src_f, dst_f, jnp.asarray(w))
    ref = m.apply(params, x, src_f, dst_f, jnp.asarray(w))
    adj = gcn_norm_adj(jnp.asarray(src_l), jnp.asarray(dst_l),
                       jnp.asarray(w), B, Ln)
    got = m.apply(params, x, src_f, dst_f, jnp.asarray(w), adj=adj)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
