"""HF PyTorch -> flax weight-converter tests: build a tiny torch module with
HF's exact parameter naming, convert, and compare forward outputs."""

import numpy as np
import pytest
import torch
import torch.nn as nn

import jax
import jax.numpy as jnp

from medtok_tpu.config import TextEncoderConfig
from medtok_tpu.models.bert import BertEncoder, convert_hf_bert


def tiny_bert_cfg():
    return TextEncoderConfig(
        vocab_size=100, hidden_size=16, num_layers=2, num_heads=2,
        intermediate_size=32, max_position_embeddings=32,
    )


def make_hf_style_bert_state(cfg, seed=0):
    """A state_dict with HF BertModel key names and shapes."""
    g = torch.Generator().manual_seed(seed)
    sd = {}

    def w(*shape):
        return torch.randn(*shape, generator=g) * 0.05

    H, I = cfg.hidden_size, cfg.intermediate_size
    sd["embeddings.word_embeddings.weight"] = w(cfg.vocab_size, H)
    sd["embeddings.position_embeddings.weight"] = w(cfg.max_position_embeddings, H)
    sd["embeddings.token_type_embeddings.weight"] = w(cfg.type_vocab_size, H)
    sd["embeddings.LayerNorm.weight"] = torch.ones(H) + 0.01 * w(H)
    sd["embeddings.LayerNorm.bias"] = 0.01 * w(H)
    for i in range(cfg.num_layers):
        p = f"encoder.layer.{i}"
        for name, shape in [
            (f"{p}.attention.self.query", (H, H)),
            (f"{p}.attention.self.key", (H, H)),
            (f"{p}.attention.self.value", (H, H)),
            (f"{p}.attention.output.dense", (H, H)),
            (f"{p}.intermediate.dense", (I, H)),
            (f"{p}.output.dense", (H, I)),
        ]:
            sd[f"{name}.weight"] = w(*shape)
            sd[f"{name}.bias"] = 0.01 * w(shape[0])
        for ln in (f"{p}.attention.output.LayerNorm", f"{p}.output.LayerNorm"):
            sd[f"{ln}.weight"] = torch.ones(H) + 0.01 * w(H)
            sd[f"{ln}.bias"] = 0.01 * w(H)
    return sd


def torch_bert_forward(sd, cfg, ids, mask):
    """Minimal HF-BERT-semantics forward in torch (post-LN, exact gelu)."""
    H = cfg.hidden_size
    nH = cfg.num_heads
    Dh = H // nH
    x = (
        sd["embeddings.word_embeddings.weight"][ids]
        + sd["embeddings.position_embeddings.weight"][: ids.shape[1]][None]
        + sd["embeddings.token_type_embeddings.weight"][0][None, None]
    )
    x = torch.nn.functional.layer_norm(
        x, (H,), sd["embeddings.LayerNorm.weight"], sd["embeddings.LayerNorm.bias"],
        eps=cfg.layer_norm_eps,
    )
    att_mask = (1.0 - mask[:, None, None, :].float()) * -1e9
    for i in range(cfg.num_layers):
        p = f"encoder.layer.{i}"

        def lin(name, v):
            return v @ sd[f"{name}.weight"].t() + sd[f"{name}.bias"]

        B, L, _ = x.shape
        q = lin(f"{p}.attention.self.query", x).view(B, L, nH, Dh).transpose(1, 2)
        k = lin(f"{p}.attention.self.key", x).view(B, L, nH, Dh).transpose(1, 2)
        v = lin(f"{p}.attention.self.value", x).view(B, L, nH, Dh).transpose(1, 2)
        logits = q @ k.transpose(-1, -2) / np.sqrt(Dh) + att_mask
        a = torch.softmax(logits, dim=-1)
        ctx = (a @ v).transpose(1, 2).reshape(B, L, H)
        attn_out = lin(f"{p}.attention.output.dense", ctx)
        x = torch.nn.functional.layer_norm(
            x + attn_out, (H,),
            sd[f"{p}.attention.output.LayerNorm.weight"],
            sd[f"{p}.attention.output.LayerNorm.bias"], eps=cfg.layer_norm_eps,
        )
        h = torch.nn.functional.gelu(lin(f"{p}.intermediate.dense", x))
        h = lin(f"{p}.output.dense", h)
        x = torch.nn.functional.layer_norm(
            x + h, (H,),
            sd[f"{p}.output.LayerNorm.weight"], sd[f"{p}.output.LayerNorm.bias"],
            eps=cfg.layer_norm_eps,
        )
    return x


def test_bert_converter_matches_torch_forward():
    cfg = tiny_bert_cfg()
    sd = make_hf_style_bert_state(cfg)
    params = convert_hf_bert(sd, cfg)

    rng = np.random.default_rng(0)
    ids = rng.integers(1, cfg.vocab_size, size=(2, 9))
    mask = np.ones((2, 9), np.int32)
    mask[1, 6:] = 0

    with torch.no_grad():
        ref = torch_bert_forward(sd, cfg, torch.tensor(ids), torch.tensor(mask))

    model = BertEncoder(cfg)
    out = model.apply({"params": params}, jnp.asarray(ids), jnp.asarray(mask))
    # compare only valid positions (masked positions differ by design: HF adds
    # -1e9 additive mask; we use where -> same softmax result on valid keys)
    got = np.asarray(out)
    refn = ref.numpy()
    np.testing.assert_allclose(got[0], refn[0], rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(got[1, :6], refn[1, :6], rtol=2e-4, atol=2e-5)


def test_llama_converter_structure():
    import dataclasses

    from medtok_tpu.qa.llama import TINY_LLAMA, LlamaModel, convert_hf_llama

    cfg = dataclasses.replace(TINY_LLAMA, lora_rank=2)
    H, I, V = cfg.hidden_size, cfg.intermediate_size, cfg.vocab_size
    KV = cfg.num_kv_heads * (H // cfg.num_heads)
    g = torch.Generator().manual_seed(0)

    def w(*s):
        return torch.randn(*s, generator=g) * 0.05

    sd = {
        "model.embed_tokens.weight": w(V, H),
        "model.norm.weight": torch.ones(H),
        "lm_head.weight": w(V, H),
    }
    for i in range(cfg.num_layers):
        p = f"model.layers.{i}"
        sd[f"{p}.input_layernorm.weight"] = torch.ones(H)
        sd[f"{p}.post_attention_layernorm.weight"] = torch.ones(H)
        sd[f"{p}.self_attn.q_proj.weight"] = w(H, H)
        sd[f"{p}.self_attn.k_proj.weight"] = w(KV, H)
        sd[f"{p}.self_attn.v_proj.weight"] = w(KV, H)
        sd[f"{p}.self_attn.o_proj.weight"] = w(H, H)
        sd[f"{p}.mlp.gate_proj.weight"] = w(I, H)
        sd[f"{p}.mlp.up_proj.weight"] = w(I, H)
        sd[f"{p}.mlp.down_proj.weight"] = w(H, I)

    converted = convert_hf_llama(sd, cfg)
    # merge over an init tree (adds fresh LoRA) and run a forward
    from medtok_tpu.qa.finetune import _merge_params

    model = LlamaModel(cfg)
    ids = jnp.zeros((1, 4), jnp.int32)
    init = model.init({"params": jax.random.PRNGKey(0)}, ids)["params"]
    merged = _merge_params(init, converted)
    logits, _ = model.apply({"params": merged}, ids)
    assert logits.shape == (1, 4, V)
    assert np.isfinite(np.asarray(logits)).all()
    # base weights came from the state dict
    np.testing.assert_allclose(
        np.asarray(merged["layers_0"]["self_attn"]["q_proj"]["base"]["kernel"]),
        sd["model.layers.0.self_attn.q_proj.weight"].numpy().T,
    )


# ---------------------------------------------------------------------------
# Installed-HF oracles (round-1 VERDICT weak #7): the torch side is the real
# transformers implementation with random weights, not a hand-rolled forward —
# this catches shared misreadings of HF semantics (position offsets, rotary
# convention, GQA repeat order, mask handling).
# ---------------------------------------------------------------------------

def test_bert_converter_matches_installed_hf_bert():
    transformers = pytest.importorskip("transformers")

    cfg = tiny_bert_cfg()
    hf_cfg = transformers.BertConfig(
        vocab_size=cfg.vocab_size, hidden_size=cfg.hidden_size,
        num_hidden_layers=cfg.num_layers, num_attention_heads=cfg.num_heads,
        intermediate_size=cfg.intermediate_size,
        max_position_embeddings=cfg.max_position_embeddings,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        hidden_act="gelu",
    )
    torch.manual_seed(0)
    hf = transformers.BertModel(hf_cfg)
    hf.eval()

    params = convert_hf_bert(hf.state_dict(), cfg)
    rng = np.random.default_rng(1)
    ids = rng.integers(1, cfg.vocab_size, size=(3, 11))
    mask = np.ones((3, 11), np.int64)
    mask[1, 7:] = 0
    mask[2, 4:] = 0

    with torch.no_grad():
        ref = hf(
            input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask)
        ).last_hidden_state.numpy()

    model = BertEncoder(cfg)
    got = np.asarray(
        model.apply({"params": params}, jnp.asarray(ids), jnp.asarray(mask))
    )
    for b, valid in enumerate((11, 7, 4)):
        np.testing.assert_allclose(
            got[b, :valid], ref[b, :valid], rtol=2e-4, atol=2e-5,
            err_msg=f"row {b} diverges from transformers.BertModel",
        )


def test_llama_converter_matches_installed_hf_llama():
    transformers = pytest.importorskip("transformers")
    import dataclasses

    from medtok_tpu.qa.llama import LlamaConfig, LlamaModel, convert_hf_llama

    cfg = LlamaConfig(
        vocab_size=128, hidden_size=32, intermediate_size=64, num_layers=2,
        num_heads=4, num_kv_heads=2, max_position_embeddings=64,
        rope_theta=10000.0, lora_rank=0,
    )
    hf_cfg = transformers.LlamaConfig(
        vocab_size=cfg.vocab_size, hidden_size=cfg.hidden_size,
        intermediate_size=cfg.intermediate_size,
        num_hidden_layers=cfg.num_layers,
        num_attention_heads=cfg.num_heads,
        num_key_value_heads=cfg.num_kv_heads,
        max_position_embeddings=cfg.max_position_embeddings,
        rms_norm_eps=cfg.rms_norm_eps, rope_theta=cfg.rope_theta,
        tie_word_embeddings=False, attention_bias=False, mlp_bias=False,
        attention_dropout=0.0,
    )
    torch.manual_seed(0)
    hf = transformers.LlamaForCausalLM(hf_cfg)
    hf.eval()

    params = convert_hf_llama(hf.state_dict(), cfg)
    model = LlamaModel(cfg)

    rng = np.random.default_rng(2)
    B, L, PAD = 2, 10, 3
    ids = rng.integers(1, cfg.vocab_size, size=(B, L))
    # row 1 LEFT-padded (the QA prompting convention, review.py:64-74)
    mask = np.ones((B, L), np.int64)
    mask[1, :PAD] = 0
    ids[1, :PAD] = 0
    positions = np.zeros((B, L), np.int64)
    positions[0] = np.arange(L)
    positions[1, PAD:] = np.arange(L - PAD)

    with torch.no_grad():
        ref = hf(
            input_ids=torch.tensor(ids),
            attention_mask=torch.tensor(mask),
            position_ids=torch.tensor(positions),
        ).logits.numpy()

    got, _ = model.apply(
        {"params": params}, jnp.asarray(ids),
        attention_mask=jnp.asarray(mask), positions=jnp.asarray(positions),
    )
    got = np.asarray(got)
    np.testing.assert_allclose(got[0], ref[0], rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(
        got[1, PAD:], ref[1, PAD:], rtol=2e-4, atol=2e-4,
        err_msg="left-padded row diverges (GQA/rotary/mask handling)",
    )
