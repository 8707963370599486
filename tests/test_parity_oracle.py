"""Reference-oracle parity gate (the round-1 VERDICT's top item).

Runs the installed PyTorch reference ``VectorQuantizer``
(/root/reference/MedTok/vector_quantization_soft_one_new.py:90-271) as a live
oracle: identical weights are converted into :class:`SoftVQQuantizer`
(including the torch ``nn.MultiheadAttention`` packed in_proj -> flax q/k/v
split) and the two are run on the same random batches. Asserted:

- EXACT token-ID equality for all four paths (shared-text, shared-graph,
  text-specific, graph-specific), eval and train;
- assignment weights, embeddings, and usage telemetry close;
- train-path vq/commit losses close;
- the masked *batched* cross-attention equals the reference's per-sample
  Python loop (vector_quantization_soft_one_new.py:133-145).

The torch indices are captured by patching ``torch.topk`` with a recorder, so
the compared IDs are the ones the reference actually selected (its forward
never returns them — a latent upstream bug the rebuild fixes).
"""

from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from medtok_tpu.config import QuantizerConfig
from medtok_tpu.export.parity import compare_exports
from medtok_tpu.models.quantizer import SoftVQQuantizer
from medtok_tpu.models.torch_oracle import (
    convert_torch_mha,
    convert_torch_quantizer,
    load_reference_vq_module,
    reference_available,
)

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference tree not present"
)

N_E, E_DIM, K = 2100, 64, 5
B, LT, LN = 8, 12, 10


class TopkRecorder:
    """Context manager capturing every torch.topk call (values, indices)."""

    def __init__(self):
        self.calls: list[tuple[np.ndarray, np.ndarray]] = []
        self._orig = None

    def __enter__(self):
        self._orig = torch.topk

        def wrapped(*args, **kwargs):
            out = self._orig(*args, **kwargs)
            self.calls.append(
                (out.values.detach().numpy().copy(),
                 out.indices.detach().numpy().copy())
            )
            return out

        torch.topk = wrapped
        return self

    def __exit__(self, *exc):
        torch.topk = self._orig


def make_oracle(seed: int = 0, dropout_zero: bool = False):
    mod = load_reference_vq_module()
    torch.manual_seed(seed)
    vq = mod.VectorQuantizer(
        n_e=N_E, e_dim=E_DIM, beta=0.25, entropy_loss_ratio=0.0,
        l2_norm=True, show_usage=True, split=[64, 64], kmeans=False,
        num_head=4, k=K,
    )
    if dropout_zero:
        for m in vq.modules():
            if isinstance(m, torch.nn.Dropout):
                m.p = 0.0
            if isinstance(m, torch.nn.MultiheadAttention):
                m.dropout = 0.0
    return mod, vq


def make_flax(vq, dropout: float):
    cfg = QuantizerConfig(
        codebook_size=N_E, codebook_embed_dim=E_DIM, top_k=K,
        cross_attn_dropout=dropout, usage_buffer_size=300000,
    )
    model = SoftVQQuantizer(cfg)
    params = convert_torch_quantizer(vq.state_dict())
    return model, params


def random_batch(seed: int = 1):
    rng = np.random.default_rng(seed)
    text_len = rng.integers(2, LT + 1, size=B)
    node_cnt = rng.integers(1, LN + 1, size=B)
    text = rng.standard_normal((B, LT, E_DIM)).astype(np.float32)
    graph = rng.standard_normal((B, LN, E_DIM)).astype(np.float32)
    text_mask = (np.arange(LT)[None, :] < text_len[:, None])
    node_mask = (np.arange(LN)[None, :] < node_cnt[:, None])
    graph[~node_mask] = 0.0
    z = rng.standard_normal((B, 128)).astype(np.float32)
    z_aug = rng.standard_normal((B, 128)).astype(np.float32)
    return text, graph, text_mask, node_mask, z, z_aug, text_len, node_cnt


def torch_forward(vq, batch, *, train: bool):
    text, graph, text_mask, node_mask, z, z_aug, text_len, node_cnt = batch
    # reference consumes flat graph nodes + a PyG-style batch vector
    flat_nodes = np.concatenate([graph[i, : node_cnt[i]] for i in range(B)])
    batch_vec = np.concatenate(
        [np.full(node_cnt[i], i, np.int64) for i in range(B)]
    )
    vq.train(train)
    with TopkRecorder() as rec, torch.no_grad():
        out = vq(
            torch.from_numpy(z),
            torch.from_numpy(text),
            torch.from_numpy(flat_nodes),
            torch.from_numpy(text_mask.astype(np.int64)),
            torch.from_numpy(batch_vec),
            torch.from_numpy(z_aug),
        )
    # call order inside forward: shared-text, shared-graph, spec-text,
    # spec-graph, aug-text, aug-graph
    assert len(rec.calls) == 6
    names = ["shared_text", "shared_graph", "text", "graph",
             "aug_text", "aug_graph"]
    toks = {n: c for n, c in zip(names, rec.calls)}
    return out, toks


def flax_forward(model, params, batch, *, train: bool):
    text, graph, text_mask, node_mask, z, z_aug, *_ = batch
    out, mut = model.apply(
        {"params": params},
        jnp.asarray(z), jnp.asarray(text), jnp.asarray(graph),
        jnp.asarray(text_mask), jnp.asarray(node_mask), jnp.asarray(z_aug),
        train=train, mutable=["usage"],
    )
    return jax.tree.map(np.asarray, out), mut


@pytest.mark.parametrize("train", [False, True])
def test_quantizer_token_id_parity_vs_torch_reference(train):
    _, vq = make_oracle(seed=0, dropout_zero=True)
    model, params = make_flax(vq, dropout=0.0)
    batch = random_batch(seed=1)

    t_out, t_toks = torch_forward(vq, batch, train=train)
    f_out, _ = flax_forward(model, params, batch, train=train)

    # --- exact token-ID equality, all four live paths + both aug paths ---
    pairs = [
        ("shared_text", "shared_text_tokens", "shared_text_tokens_weights"),
        ("shared_graph", "shared_graph_tokens", "shared_graph_tokens_weights"),
        ("text", "text_tokens", "text_tokens_weights"),
        ("graph", "graph_tokens", "graph_tokens_weights"),
    ]
    for tname, fkey, wkey in pairs:
        t_vals, t_idx = t_toks[tname]
        np.testing.assert_array_equal(
            f_out[fkey], t_idx, err_msg=f"token IDs diverge on path {tname}"
        )
        t_w = torch.softmax(-torch.from_numpy(t_vals), dim=1).numpy()
        np.testing.assert_allclose(
            f_out[wkey], t_w, rtol=1e-4, atol=1e-5,
            err_msg=f"assignment weights diverge on path {tname}",
        )

    # --- embeddings (the eval-export surface, tokenizer.py:240-247) ---
    for key in (
        "shared_text_embedding", "shared_graph_embedding",
        "specific_embedding_text", "specific_embedding_graph",
        "specific_embedding_text_aug", "specific_embedding_graph_aug",
    ):
        np.testing.assert_allclose(
            f_out[key], t_out[key].detach().numpy(), rtol=1e-4, atol=3e-5,
            err_msg=f"embedding diverges: {key}",
        )

    # --- usage telemetry (FIFO fraction, vq...py:219-236) ---
    for key in ("shared_codebook_usage", "text_specific_usage",
                "graph_specific_usage"):
        np.testing.assert_allclose(
            np.asarray(f_out[key]), float(t_out[key]), rtol=0, atol=1e-6,
            err_msg=f"usage diverges: {key}",
        )

    # --- losses (train path only; eval forces zeros both sides) ---
    for key in ("shared_embed_loss", "text_specific_loss",
                "graph_specific_loss"):
        t_vq, t_commit = float(t_out[key][0]), float(t_out[key][1])
        f_vq, f_commit = float(f_out[key][0]), float(f_out[key][1])
        if train:
            np.testing.assert_allclose(f_vq, t_vq, rtol=1e-4, atol=1e-6)
            np.testing.assert_allclose(f_commit, t_commit, rtol=1e-4, atol=1e-6)
        else:
            assert f_vq == 0.0 and f_commit == 0.0
            assert t_vq == 0.0 and t_commit == 0.0


def test_parity_report_artifact(tmp_path):
    """Feed export/parity.py a real oracle-vs-rebuild comparison: build
    tokens_all/weights_all in the [N, 4, k] export layout from both sides
    over several batches and require a zero-mismatch report."""
    _, vq = make_oracle(seed=3, dropout_zero=True)
    model, params = make_flax(vq, dropout=0.0)
    vq.eval()

    t_rows, f_rows, t_wrows, f_wrows = [], [], [], []
    for seed in range(4):
        batch = random_batch(seed=100 + seed)
        t_out, t_toks = torch_forward(vq, batch, train=False)
        f_out, _ = flax_forward(model, params, batch, train=False)
        # export row order (tokenizer.py:240-247 / export.parity.PATHS):
        # text_specific, graph_specific, shared_text, shared_graph
        order = ["text", "graph", "shared_text", "shared_graph"]
        t_rows.append(np.stack([t_toks[n][1] for n in order], axis=1))
        t_wrows.append(np.stack(
            [torch.softmax(-torch.from_numpy(t_toks[n][0]), dim=1).numpy()
             for n in order], axis=1))
        fkeys = ["text_tokens", "graph_tokens",
                 "shared_text_tokens", "shared_graph_tokens"]
        wkeys = [k + "_weights" for k in fkeys]
        f_rows.append(np.stack([f_out[k] for k in fkeys], axis=1))
        f_wrows.append(np.stack([f_out[k] for k in wkeys], axis=1))

    a, b = tmp_path / "ref", tmp_path / "rebuild"
    a.mkdir(), b.mkdir()
    np.save(a / "tokens_all.npy", np.concatenate(t_rows).astype(np.int32))
    np.save(b / "tokens_all.npy", np.concatenate(f_rows).astype(np.int32))
    np.save(a / "weights_all.npy", np.concatenate(t_wrows))
    np.save(b / "weights_all.npy", np.concatenate(f_wrows))

    report = compare_exports(a, b)
    assert report["token_exact_match"], report
    for path_stats in report["token_id_parity"].values():
        assert path_stats["mismatched_codes"] == 0, report


def test_torch_mha_converter_matches_reference_module():
    """Focused check of the packed in_proj split: flax MultiheadAttention vs
    torch nn.MultiheadAttention on the reference's unbatched (L, E) call
    convention (vector_quantization_soft_one_new.py:46)."""
    from medtok_tpu.models.layers import MultiheadAttention

    torch.manual_seed(7)
    E, H = 64, 4
    mha = torch.nn.MultiheadAttention(E, H, dropout=0.0)
    mha.eval()
    rng = np.random.default_rng(7)
    q = rng.standard_normal((5, E)).astype(np.float32)
    kv = rng.standard_normal((9, E)).astype(np.float32)
    with torch.no_grad():
        t_out, _ = mha(torch.from_numpy(q), torch.from_numpy(kv),
                       torch.from_numpy(kv))

    params = convert_torch_mha(
        {f"attn.{k}": v for k, v in mha.state_dict().items()}, "attn"
    )
    model = MultiheadAttention(E, H, 0.0)
    f_out = model.apply(
        {"params": params},
        jnp.asarray(q)[None], jnp.asarray(kv)[None], jnp.asarray(kv)[None],
        None,
    )
    np.testing.assert_allclose(
        np.asarray(f_out[0]), t_out.numpy(), rtol=1e-5, atol=1e-6
    )


def test_torch_transformer_encoder_layer_parity():
    """EHR encoder building block vs the live torch oracle:
    torch.nn.TransformerEncoderLayer (post-norm, ReLU, batch_first — the
    reference stacks these at EHRModel_token.py:236-237) == our
    ehr.model.TransformerEncoderLayer with converted weights, including the
    key-padding mask, on both the dense and the Pallas flash path."""
    from medtok_tpu.ehr.model import TransformerEncoderLayer
    from medtok_tpu.models.torch_oracle import convert_torch_encoder_layer

    torch.manual_seed(3)
    E, H, FF = 32, 4, 64
    t_layer = torch.nn.TransformerEncoderLayer(
        E, H, dim_feedforward=FF, dropout=0.3, batch_first=True
    )
    t_layer.eval()
    rng = np.random.default_rng(3)
    x = rng.standard_normal((2, 11, E)).astype(np.float32)
    pad = rng.random((2, 11)) > 0.7      # True = padding
    pad[:, 0] = False
    with torch.no_grad():
        t_out = t_layer(
            torch.from_numpy(x),
            src_key_padding_mask=torch.from_numpy(pad),
        ).numpy()

    params = convert_torch_encoder_layer(t_layer.state_dict())
    for use_flash in (False, True):
        f_layer = TransformerEncoderLayer(E, H, FF, dropout=0.3,
                                          use_flash=use_flash)
        f_out = f_layer.apply(
            {"params": params}, jnp.asarray(x), jnp.asarray(pad),
            deterministic=True,
        )
        # torch writes NaN rows for fully-padded queries... none here; all
        # real rows must match (padded-key columns are masked identically)
        np.testing.assert_allclose(
            np.asarray(f_out), t_out, rtol=2e-5, atol=2e-5,
            err_msg=f"use_flash={use_flash}",
        )


def test_cross_attention_batched_equals_per_sample_loop():
    """The rebuild's masked batched CrossAttention vs the reference's
    variable-length per-sample loop, through the reference module itself."""
    mod, vq = make_oracle(seed=11, dropout_zero=True)
    model, params = make_flax(vq, dropout=0.0)
    batch = random_batch(seed=42)
    text, graph, text_mask, node_mask, z, _, text_len, node_cnt = batch

    vq.eval()
    # reference loop (vq...py:133-145), using its own cross_attn weights
    t_cls, t_gmean = [], []
    with torch.no_grad():
        for i in range(B):
            zt = torch.from_numpy(text[i, : text_len[i]])
            zg = torch.from_numpy(graph[i, : node_cnt[i]])
            a_t, a_g = vq.cross_attn(zt, zg)
            t_cls.append(a_t[0].numpy())
            t_gmean.append(a_g.mean(dim=0).numpy())

    (f_t, f_g), _ = model.apply(
        {"params": params},
        jnp.asarray(text), jnp.asarray(graph),
        jnp.asarray(text_mask), jnp.asarray(node_mask),
        method=SoftVQQuantizer.shared_pooled, mutable=["usage"],
    )
    # shared_pooled returns l2-normalized pooled features; normalize torch side
    t_cls = np.stack(t_cls)
    t_gmean = np.stack(t_gmean)
    t_cls /= np.maximum(np.linalg.norm(t_cls, axis=-1, keepdims=True), 1e-12)
    t_gmean /= np.maximum(
        np.linalg.norm(t_gmean, axis=-1, keepdims=True), 1e-12
    )
    np.testing.assert_allclose(np.asarray(f_t), t_cls, rtol=1e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(f_g), t_gmean, rtol=1e-4, atol=2e-5)
