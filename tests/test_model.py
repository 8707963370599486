"""End-to-end model tests: init, train forward (loss dict), eval forward
(embedding/tokens/weights shapes and region containment — SURVEY.md 4b)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from medtok_tpu.config import (
    GraphEncoderConfig,
    ModelConfig,
    QuantizerConfig,
    TextEncoderConfig,
)
from medtok_tpu.data.synthetic import random_code_batch
from medtok_tpu.models.tokenizer_model import MultimodalTokenizer


def tiny_config(**quant_kw):
    return ModelConfig(
        text=TextEncoderConfig(
            vocab_size=1000, hidden_size=32, num_layers=2, num_heads=4,
            intermediate_size=64, max_position_embeddings=64,
        ),
        graph=GraphEncoderConfig(num_nodes=500, in_channels=16,
                                 hidden_channels=32, out_channels=16),
        quantizer=QuantizerConfig(
            codebook_size=90, codebook_embed_dim=16, usage_buffer_size=4096,
            **quant_kw,
        ),
        max_text_length=16,
        compute_dtype="float32",
    )


@pytest.fixture(scope="module")
def model_and_batch():
    cfg = tiny_config()
    model = MultimodalTokenizer(cfg)
    rng = np.random.default_rng(0)
    batch = random_code_batch(
        rng, batch=4, text_len=16, max_nodes=8, max_edges_per_graph=12,
        text_vocab=1000, num_kg_nodes=500,
    )
    batch = jax.tree.map(jnp.asarray, batch)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch, train=True,
    )
    return cfg, model, batch, variables


def test_train_forward_loss_dict(model_and_batch):
    cfg, model, batch, variables = model_and_batch
    out, mutated = model.apply(
        variables, batch, train=True,
        rngs={"dropout": jax.random.PRNGKey(2)}, mutable=["usage"],
    )
    # the full key surface train_MedTok.py:215-238 consumes
    for key in [
        "shared_embed_loss", "text_specific_loss", "graph_specific_loss",
        "shared_text_embedding", "shared_graph_embedding",
        "text_feature", "graph_feature",
        "specific_embedding_text", "specific_embedding_graph",
        "specific_embedding_text_aug", "specific_embedding_graph_aug",
        "shared_codebook_usage", "text_specific_usage", "graph_specific_usage",
    ]:
        assert key in out, key
    vq_l, commit_l = out["shared_embed_loss"][0], out["shared_embed_loss"][1]
    assert np.isfinite(float(vq_l)) and np.isfinite(float(commit_l))
    assert out["specific_embedding_text_aug"] is not None
    assert 0.0 < float(out["shared_codebook_usage"]) <= 1.0
    assert "usage" in mutated


def test_eval_outputs_shapes_and_regions(model_and_batch):
    cfg, model, batch, variables = model_and_batch
    emb, tokens, weights = model.apply(variables, batch, train=False)
    B = batch.input_ids.shape[0]
    k = cfg.quantizer.top_k
    D = cfg.quantizer.codebook_embed_dim
    assert emb.shape == (B, 4 * D)
    assert tokens.shape == (B, 4, k)
    assert weights.shape == (B, 4, k)
    n = cfg.quantizer.codebook_size
    region = n // 3
    toks = np.asarray(tokens)
    # row 0: text-specific (region-local < n//3); row 1: graph-specific;
    # rows 2-3: shared over the full codebook (tokenizer.py:240-243)
    assert toks[:, 0].max() < region
    assert toks[:, 1].max() < region
    assert toks[:, 2:].max() < n
    w = np.asarray(weights)
    np.testing.assert_allclose(w.sum(-1), np.ones((B, 4)), rtol=1e-5)
    assert np.all(w >= 0)


def test_eval_deterministic(model_and_batch):
    cfg, model, batch, variables = model_and_batch
    out1 = model.apply(variables, batch, train=False)
    out2 = model.apply(variables, batch, train=False)
    np.testing.assert_array_equal(np.asarray(out1.tokens), np.asarray(out2.tokens))
    np.testing.assert_allclose(
        np.asarray(out1.embedding), np.asarray(out2.embedding), rtol=0, atol=0
    )


def test_tokens_invariant_to_batch_order(model_and_batch):
    """Property test (SURVEY.md 4b): token IDs don't depend on batch order."""
    cfg, model, batch, variables = model_and_batch
    out = model.apply(variables, batch, train=False)
    perm = np.asarray([2, 0, 3, 1])
    permuted = jax.tree.map(
        lambda x: x[perm] if x.ndim >= 1 and x.shape[0] == 4 else x, batch
    )
    # edge arrays are flat [B*Epg] per-graph chunks of local indices:
    # permuting graphs == permuting the chunks
    B = batch.node_ids.shape[0]
    Epg = batch.edge_src.shape[0] // B

    def permute_chunks(e):
        return jnp.asarray(np.asarray(e).reshape(B, Epg)[perm].reshape(-1))

    permuted = permuted._replace(
        edge_src=permute_chunks(batch.edge_src),
        edge_dst=permute_chunks(batch.edge_dst),
        edge_weight=permute_chunks(batch.edge_weight),
        edge_src_aug=permute_chunks(batch.edge_src_aug),
        edge_dst_aug=permute_chunks(batch.edge_dst_aug),
        edge_weight_aug=permute_chunks(batch.edge_weight_aug),
    )
    out_p = model.apply(variables, permuted, train=False)
    np.testing.assert_array_equal(
        np.asarray(out_p.tokens), np.asarray(out.tokens)[perm]
    )


def test_text_dropout_in_train_augmentation():
    """text_dropout_in_train=True restores the reference's dropout-as-
    augmentation (tokenizer.py:148-152, 211-212): the aug view differs and
    training still descends-compatibly (finite losses)."""
    import dataclasses

    cfg = dataclasses.replace(tiny_config(), text_dropout_in_train=True)
    model = MultimodalTokenizer(cfg)
    rng = np.random.default_rng(3)
    batch = jax.tree.map(jnp.asarray, random_code_batch(
        rng, batch=4, text_len=16, max_nodes=8, max_edges_per_graph=8,
        text_vocab=1000, num_kg_nodes=500,
    ))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch, train=True,
    )
    out, _ = model.apply(
        variables, batch, train=True,
        rngs={"dropout": jax.random.PRNGKey(5)}, mutable=["usage"],
    )
    spec = np.asarray(out["specific_embedding_text"])
    spec_aug = np.asarray(out["specific_embedding_text_aug"])
    assert not np.allclose(spec, spec_aug)  # dropout noise differentiates views
    assert np.isfinite(float(out["shared_embed_loss"][0]))
