"""Composed end-to-end torch-oracle parity: the full eval pipeline
(HF BertModel -> text_mapped, node table -> GCN -> pool, reference
VectorQuantizer) vs the flax MultimodalTokenizer with converted weights.

Covers the stage *interfaces* (mask conventions, CLS offset, pooling order,
concat order) that the per-stage unit parity tests cannot see. The
production-scale sweep is scripts/run_parity_e2e.py (>=50K codes into
docs/PARITY_REPORT.json); this is the same harness at mini shape.
Parity surface: /root/reference/MedTok/tokenizer.py:202-247,
inference.py:105-138.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from medtok_tpu.config import ModelConfig, TextEncoderConfig
from medtok_tpu.data.synthetic import random_code_batch
from medtok_tpu.models.tokenizer_model import MultimodalTokenizer
from medtok_tpu.models.torch_oracle import reference_available

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")
pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference tree not present"
)

MINI_BERT = TextEncoderConfig(
    vocab_size=200, hidden_size=32, num_layers=2, num_heads=2,
    intermediate_size=64, max_position_embeddings=32,
)


@pytest.fixture(scope="module")
def oracle_and_model():
    from medtok_tpu.models.torch_oracle import (
        build_composed_oracle,
        convert_composed_oracle,
    )

    cfg = ModelConfig(text=MINI_BERT, compute_dtype="float32")
    oracle = build_composed_oracle(cfg, seed=0)
    params = convert_composed_oracle(oracle, cfg)
    model = MultimodalTokenizer(cfg)
    return cfg, oracle, params, model


def test_composed_e2e_token_and_embedding_parity(oracle_and_model):
    from medtok_tpu.models.torch_oracle import code_batch_to_torch

    cfg, oracle, params, model = oracle_and_model
    rng = np.random.default_rng(7)
    import jax

    @jax.jit
    def flax_step(b):
        out, _ = model.apply(
            {"params": params}, b, train=False, mutable=["usage"]
        )
        return out

    for _ in range(3):
        cb = random_code_batch(
            rng, batch=16, text_len=24, max_nodes=8, max_edges_per_graph=16,
            text_vocab=cfg.text.vocab_size,
        )
        t_emb, t_tok, t_w = oracle(*code_batch_to_torch(cb))
        f_out = flax_step(jax.tree.map(jnp.asarray, cb))

        np.testing.assert_array_equal(
            t_tok.numpy(), np.asarray(f_out.tokens),
            err_msg="composed e2e token IDs diverge",
        )
        np.testing.assert_allclose(
            t_emb.numpy(), np.asarray(f_out.embedding), atol=1e-5,
            err_msg="composed e2e embeddings diverge",
        )
        np.testing.assert_allclose(
            t_w.numpy(), np.asarray(f_out.weights), atol=1e-5,
            err_msg="composed e2e assignment weights diverge",
        )


def test_torch_gcn_conv_matches_flax_gcn(oracle_and_model):
    """The vendored pure-torch GCNConv (PyG formula) == models.layers.GCNConv
    on a ragged batched graph — the graph-side footing of the e2e oracle."""
    from medtok_tpu.models.torch_oracle import make_torch_gcn_conv

    conv = make_torch_gcn_conv(8, 4)
    rng = np.random.default_rng(0)
    n = 10
    x = rng.standard_normal((n, 8)).astype(np.float32)
    src = rng.integers(0, n, size=20)
    dst = rng.integers(0, n, size=20)

    with torch.no_grad():
        ref = conv(
            torch.from_numpy(x),
            torch.from_numpy(np.stack([src, dst]).astype(np.int64)),
        ).numpy()

    from medtok_tpu.models.layers import GCNConv

    m = GCNConv(4)
    params = {
        "lin": {"kernel": jnp.asarray(conv.lin.weight.detach().numpy().T)},
        "bias": jnp.asarray(conv.bias.detach().numpy()),
    }
    got = np.asarray(m.apply(
        {"params": params}, jnp.asarray(x),
        jnp.asarray(src, jnp.int32), jnp.asarray(dst, jnp.int32),
        jnp.ones((20,), jnp.float32),
    ))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)
