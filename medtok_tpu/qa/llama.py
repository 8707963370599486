"""Flax Llama-family causal LM with LoRA — the QA finetuning backbone.

The reference finetunes HF Llama-3.1-8B-Instruct with PEFT LoRA (r=16,
alpha=32 on q_proj/v_proj; MedTok_fintune_llama3.py:58-63, 156-163). This is
a from-scratch flax implementation (RMSNorm, rotary embeddings, GQA,
SwiGLU) with:
- a config-driven size (tests run a tiny config; LLAMA31_8B matches the 8B),
- built-in optional LoRA on attention projections (rank/alpha/targets),
- a HF PyTorch state_dict converter for weight parity,
- greedy/top-p sampling `generate` with KV cache.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from medtok_tpu.parallel.mesh import DP_AXIS, TP_AXIS


@dataclasses.dataclass(frozen=True)
class LlamaConfig:
    vocab_size: int = 128256
    hidden_size: int = 4096
    intermediate_size: int = 14336
    num_layers: int = 32
    num_heads: int = 32
    num_kv_heads: int = 8
    max_position_embeddings: int = 8192
    rms_norm_eps: float = 1e-5
    rope_theta: float = 500000.0
    tie_word_embeddings: bool = False
    # LoRA (0 = disabled)
    lora_rank: int = 0
    lora_alpha: float = 32.0
    lora_targets: tuple[str, ...] = ("q_proj", "v_proj")
    # gradient rematerialization per layer: at 8B (B=16, L=512, 32 layers)
    # saved fwd activations are the difference between fitting a v5e-8 and
    # OOM (MedTok_fintune_llama3.py:82-87 trains at exactly that shape)
    remat: bool = False


LLAMA31_8B = LlamaConfig()
TINY_LLAMA = LlamaConfig(
    vocab_size=512, hidden_size=64, intermediate_size=128, num_layers=2,
    num_heads=4, num_kv_heads=2, max_position_embeddings=256,
)


class LoraDense(nn.Module):
    """W x + (alpha/r) * B A x. Base kernel named like nn.Dense for converter
    compatibility; LoRA params live under 'lora_a'/'lora_b'."""

    features: int
    rank: int = 0
    alpha: float = 32.0
    use_bias: bool = False

    @nn.compact
    def __call__(self, x):
        y = nn.Dense(self.features, use_bias=self.use_bias, name="base")(x)
        if self.rank > 0:
            a = self.param(
                "lora_a", nn.initializers.normal(0.02), (x.shape[-1], self.rank)
            )
            b = self.param("lora_b", nn.initializers.zeros, (self.rank, self.features))
            y = y + (self.alpha / self.rank) * ((x @ a.astype(x.dtype)) @ b.astype(x.dtype))
        return y


def rms_norm(x, weight, eps):
    var = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=-1, keepdims=True)
    return (x.astype(jnp.float32) * jax.lax.rsqrt(var + eps)).astype(x.dtype) * weight


def rope(q, k, positions, theta, head_dim):
    """Rotary embeddings (HF Llama convention: rotate_half)."""
    inv_freq = 1.0 / (theta ** (np.arange(0, head_dim, 2) / head_dim))
    freqs = positions[..., None].astype(jnp.float32) * inv_freq[None, :]  # [B,L,hd/2]
    cos = jnp.cos(freqs)[:, :, None, :]
    sin = jnp.sin(freqs)[:, :, None, :]
    cos = jnp.concatenate([cos, cos], axis=-1)
    sin = jnp.concatenate([sin, sin], axis=-1)

    def rot(x):
        x1, x2 = jnp.split(x, 2, axis=-1)
        return jnp.concatenate([-x2, x1], axis=-1)

    q2 = q * cos.astype(q.dtype) + rot(q) * sin.astype(q.dtype)
    k2 = k * cos.astype(k.dtype) + rot(k) * sin.astype(k.dtype)
    return q2, k2


class LlamaAttention(nn.Module):
    cfg: LlamaConfig
    dtype: Any = jnp.float32
    mesh: Any = None   # jax.sharding.Mesh for TP activation constraints

    def _shard(self, x, *spec):
        """Megatron-style activation annotation (heads over 'tp'): keeps
        SPMD propagation from losing the head sharding through the GQA
        repeat (which would replicate the [B, H, L, L] attention buffers on
        every chip). The batch dim stays UNCONSTRAINED — it inherits
        whatever dp sharding the inputs carry, and init-time dummy batches
        need no divisibility."""
        if self.mesh is None or TP_AXIS not in self.mesh.shape:
            return x
        # a named dim must divide by its mesh axis; small-config meshes can
        # have tp > num_kv_heads (the KERNEL column sharding then splits
        # within a head — valid for params, not for a head-axis constraint)
        for dim, axis in enumerate(spec):
            if isinstance(axis, str) and x.shape[dim] % self.mesh.shape[axis]:
                return x
        from jax.sharding import NamedSharding, PartitionSpec as P

        spec = tuple(
            P.UNCONSTRAINED if a == DP_AXIS else a for a in spec
        )
        return jax.lax.with_sharding_constraint(
            x, NamedSharding(self.mesh, P(*spec))
        )

    @nn.compact
    def __call__(self, x, positions, mask, cache=None):
        c = self.cfg
        H, KV = c.num_heads, c.num_kv_heads
        Dh = c.hidden_size // H

        def proj(name, out):
            rank = c.lora_rank if name in c.lora_targets else 0
            return LoraDense(out, rank=rank, alpha=c.lora_alpha, name=name)

        B, L, _ = x.shape
        q = proj("q_proj", H * Dh)(x).reshape(B, L, H, Dh)
        k = proj("k_proj", KV * Dh)(x).reshape(B, L, KV, Dh)
        v = proj("v_proj", KV * Dh)(x).reshape(B, L, KV, Dh)
        q = self._shard(q, DP_AXIS, None, TP_AXIS, None)
        k = self._shard(k, DP_AXIS, None, TP_AXIS, None)
        v = self._shard(v, DP_AXIS, None, TP_AXIS, None)
        q, k = rope(q, k, positions, c.rope_theta, Dh)

        if cache is not None:
            ck, cv, cache_pos = cache
            k = jax.lax.dynamic_update_slice(ck, k, (0, cache_pos, 0, 0))
            v = jax.lax.dynamic_update_slice(cv, v, (0, cache_pos, 0, 0))
            new_cache = (k, v)
        else:
            new_cache = None

        # GQA: repeat kv heads
        rep = H // KV
        k = self._shard(jnp.repeat(k, rep, axis=2), DP_AXIS, None, TP_AXIS, None)
        v = self._shard(jnp.repeat(v, rep, axis=2), DP_AXIS, None, TP_AXIS, None)

        logits = jnp.einsum(
            "blhd,bmhd->bhlm", q, k, preferred_element_type=jnp.float32
        ) / np.sqrt(Dh)
        logits = self._shard(logits, DP_AXIS, TP_AXIS, None, None)
        logits = jnp.where(mask, logits, -1e9)
        attn = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
        out = jnp.einsum("bhlm,bmhd->blhd", attn, v).reshape(B, L, H * Dh)
        out = self._shard(out, DP_AXIS, None, TP_AXIS)
        return LoraDense(c.hidden_size, rank=c.lora_rank if "o_proj" in c.lora_targets else 0,
                         alpha=c.lora_alpha, name="o_proj")(out), new_cache


class LlamaMLP(nn.Module):
    cfg: LlamaConfig
    mesh: Any = None

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        gate = nn.Dense(c.intermediate_size, use_bias=False, name="gate_proj")(x)
        up = nn.Dense(c.intermediate_size, use_bias=False, name="up_proj")(x)
        h = nn.silu(gate) * up
        if (self.mesh is not None and TP_AXIS in self.mesh.shape
                and h.shape[-1] % self.mesh.shape[TP_AXIS] == 0):
            from jax.sharding import NamedSharding, PartitionSpec as P

            h = jax.lax.with_sharding_constraint(
                h, NamedSharding(
                    self.mesh, P(P.UNCONSTRAINED, None, TP_AXIS)
                )
            )
        return nn.Dense(c.hidden_size, use_bias=False, name="down_proj")(h)


class LlamaLayer(nn.Module):
    cfg: LlamaConfig
    mesh: Any = None

    @nn.compact
    def __call__(self, x, positions, mask, cache=None):
        c = self.cfg
        w1 = self.param("input_layernorm", nn.initializers.ones, (c.hidden_size,))
        h, new_cache = LlamaAttention(c, mesh=self.mesh, name="self_attn")(
            rms_norm(x, w1, c.rms_norm_eps), positions, mask, cache
        )
        x = x + h
        w2 = self.param("post_attention_layernorm", nn.initializers.ones,
                        (c.hidden_size,))
        x = x + LlamaMLP(c, mesh=self.mesh, name="mlp")(
            rms_norm(x, w2, c.rms_norm_eps)
        )
        return x, new_cache


class LlamaModel(nn.Module):
    """Causal LM. __call__ accepts input_ids OR inputs_embeds (the soft-prompt
    path injects embeddings directly, review.py:77-88). ``mesh`` (optional)
    enables Megatron-style TP activation-sharding constraints inside the
    layers — params are sharded by qa.sharding; these keep the ACTIVATIONS
    head-sharded too."""

    cfg: LlamaConfig
    mesh: Any = None

    def setup(self):
        c = self.cfg
        self.embed_tokens = nn.Embed(c.vocab_size, c.hidden_size, name="embed_tokens")
        layer_cls = nn.remat(LlamaLayer) if c.remat else LlamaLayer
        self.layers_list = [
            layer_cls(c, mesh=self.mesh, name=f"layers_{i}")
            for i in range(c.num_layers)
        ]
        self.final_norm = self.param("norm", nn.initializers.ones, (c.hidden_size,))
        if not c.tie_word_embeddings:
            self.lm_head = nn.Dense(c.vocab_size, use_bias=False, name="lm_head")

    def embed(self, input_ids):
        return self.embed_tokens(input_ids)

    def apply_lm_head(self, x):
        """Vocab projection on an arbitrary [..., H] tensor. The finetune
        loss calls this on the label WINDOW only — at 8B the full-sequence
        [B, L, 128256] logits (and their cotangents) are the single largest
        train-step buffer, and half the positions are prompt slots whose
        labels are -100."""
        if self.cfg.tie_word_embeddings:
            return x @ self.embed_tokens.embedding.T
        return self.lm_head(x)

    def __call__(
        self,
        input_ids=None,
        attention_mask=None,
        inputs_embeds=None,
        positions=None,
        caches=None,
        cache_pos=None,
        return_hidden=False,
    ):
        c = self.cfg
        x = inputs_embeds if inputs_embeds is not None else self.embed_tokens(input_ids)
        B, L, _ = x.shape
        if positions is None:
            positions = jnp.broadcast_to(jnp.arange(L)[None], (B, L))
        if attention_mask is None:
            attention_mask = jnp.ones((B, L), jnp.int32)

        if caches is None:
            causal = jnp.tril(jnp.ones((L, L), bool))
            mask = causal[None, None] & attention_mask[:, None, None, :].astype(bool)
            layer_caches = [None] * c.num_layers
        else:
            # cache slots are sequence slots: query slot = cache_pos + offset;
            # causal over SLOT index (rope positions differ under left-padding)
            T = caches[0][0].shape[1]
            key_slot = jnp.arange(T)[None, None, None, :]
            query_slot = (cache_pos + jnp.arange(L))[None, None, :, None]
            mask = key_slot <= query_slot
            mask = mask & attention_mask[:, None, None, :].astype(bool)
            layer_caches = [(k, v, cache_pos) for (k, v) in caches]

        new_caches = []
        for layer, cache in zip(self.layers_list, layer_caches):
            x, nc = layer(x, positions, mask, cache)
            new_caches.append(nc)
        x = rms_norm(x, self.final_norm, c.rms_norm_eps)
        if return_hidden:
            # final hidden states, no vocab projection (the finetune loss
            # applies apply_lm_head on the label window only)
            return x, (new_caches if caches is not None else None)
        logits = self.apply_lm_head(x)
        return logits, (new_caches if caches is not None else None)


# ---------------------------------------------------------------------------
# HF PyTorch state_dict -> flax params
# ---------------------------------------------------------------------------

def convert_hf_llama(state_dict: dict, cfg: LlamaConfig, *, dtype=None) -> dict:
    """``dtype=jnp.bfloat16`` loads the base weights in bf16 — the 8B
    production layout (16 GB of params; fp32 would not fit a v5e-8 at all)."""
    def arr(key):
        v = state_dict[key]
        v = v.detach().cpu().float().numpy() if hasattr(v, "detach") else np.asarray(v)
        out = jnp.asarray(v)
        return out.astype(dtype) if dtype is not None else out

    def lin(prefix, lora=False):
        k = {"kernel": arr(f"{prefix}.weight").T}
        return {"base": k} if lora else k

    p: dict = {
        "embed_tokens": {"embedding": arr("model.embed_tokens.weight")},
        "norm": arr("model.norm.weight"),
    }
    if not cfg.tie_word_embeddings:
        p["lm_head"] = {"kernel": arr("lm_head.weight").T}
    for i in range(cfg.num_layers):
        hf = f"model.layers.{i}"
        p[f"layers_{i}"] = {
            "input_layernorm": arr(f"{hf}.input_layernorm.weight"),
            "post_attention_layernorm": arr(f"{hf}.post_attention_layernorm.weight"),
            # LlamaAttention uses LoraDense for ALL projections (rank 0 when
            # untargeted), so the base kernel always lives under "base"
            "self_attn": {
                "q_proj": lin(f"{hf}.self_attn.q_proj", lora=True),
                "k_proj": lin(f"{hf}.self_attn.k_proj", lora=True),
                "v_proj": lin(f"{hf}.self_attn.v_proj", lora=True),
                "o_proj": lin(f"{hf}.self_attn.o_proj", lora=True),
            },
            "mlp": {
                "gate_proj": lin(f"{hf}.mlp.gate_proj"),
                "up_proj": lin(f"{hf}.mlp.up_proj"),
                "down_proj": lin(f"{hf}.mlp.down_proj"),
            },
        }
    return p


# ---------------------------------------------------------------------------
# Generation (greedy / temperature+top-p; MedTok_QA_inference.py:121-162)
# ---------------------------------------------------------------------------

# Keyed on (model, sampler); bounded LRU so model sweeps don't leak compiled
# executables (each entry pins jitted prefill/step/scan closures).
_DECODE_FN_CACHE: dict = {}
_DECODE_FN_CACHE_MAX = 8


def _make_decode_fns(model: LlamaModel, temperature: float, top_p: float,
                     eos_token_id: int | None):
    """jit-compiled prefill + decode step for ``generate``. Compiled ONCE per
    (model, sampler, batch-shape) and cached — the autoregressive loop then
    re-dispatches the same executable instead of retracing per token (the
    TPU-native answer to the reference's eager per-step generation,
    MedTok_QA_inference.py:121-162)."""
    key = (model, float(temperature), float(top_p), eos_token_id)
    if key in _DECODE_FN_CACHE:
        return _DECODE_FN_CACHE[key]
    while len(_DECODE_FN_CACHE) >= _DECODE_FN_CACHE_MAX:
        _DECODE_FN_CACHE.pop(next(iter(_DECODE_FN_CACHE)))

    def sample(last, rng):
        if temperature > 0:
            probs = jax.nn.softmax(last / temperature, axis=-1)
            # top-p nucleus filter
            sorted_idx = jnp.argsort(-probs, axis=-1)
            sorted_p = jnp.take_along_axis(probs, sorted_idx, axis=-1)
            cum = jnp.cumsum(sorted_p, axis=-1)
            keep = cum - sorted_p < top_p
            filt = jnp.where(keep, sorted_p, 0.0)
            filt = filt / jnp.sum(filt, axis=-1, keepdims=True)
            choice = jax.random.categorical(rng, jnp.log(filt + 1e-12), axis=-1)
            return jnp.take_along_axis(sorted_idx, choice[:, None], axis=-1)[:, 0]
        return jnp.argmax(last, axis=-1)

    @jax.jit
    def prefill(params, inputs_embeds, full_mask, positions, caches):
        logits, caches = model.apply(
            {"params": params},
            inputs_embeds=inputs_embeds,
            attention_mask=full_mask,
            positions=positions,
            caches=caches,
            cache_pos=0,
        )
        return logits[:, -1, :], caches

    def step(params, carry):
        """One decode step: sample from the previous logits, open the mask
        slot, run the cached forward at that slot."""
        caches, full_mask, cur_pos, last, rng, finished, slot = carry
        rng, sub = jax.random.split(rng)
        tok = sample(last, sub)
        if eos_token_id is not None:
            tok = jnp.where(finished, eos_token_id, tok)
            finished = finished | (tok == eos_token_id)
        cur_pos = cur_pos + 1
        full_mask = jax.lax.dynamic_update_slice(
            full_mask,
            jnp.ones((full_mask.shape[0], 1), full_mask.dtype),
            (0, slot),
        )
        emb = model.apply({"params": params}, tok[:, None], method=LlamaModel.embed)
        logits, caches = model.apply(
            {"params": params},
            inputs_embeds=emb,
            attention_mask=full_mask,
            positions=cur_pos[:, None],
            caches=caches,
            cache_pos=slot,
        )
        carry = (caches, full_mask, cur_pos, logits[:, -1, :], rng,
                 finished, slot + 1)
        return carry, tok

    step_jit = jax.jit(step)

    @functools.partial(jax.jit, static_argnums=(2,))
    def scan_decode(params, carry, n_steps):
        """The fused path: the whole continuation in ONE dispatch. With an
        eos token this is a while_loop that stops as soon as every row
        finished (MCQ answers are ~3 tokens; running all 64 steps would be
        ~20x wasted decode); without one, a plain scan."""
        if eos_token_id is None:
            carry, toks = jax.lax.scan(
                lambda c, _: step(params, c), carry, None, length=n_steps
            )
            return jnp.swapaxes(toks, 0, 1)  # [steps, B] -> [B, steps]

        B = carry[3].shape[0]
        out0 = jnp.full((B, n_steps), eos_token_id, jnp.int32)

        def cond(state):
            i, _, c = state
            finished = c[5]
            return (i < n_steps) & ~jnp.all(finished)

        def body(state):
            i, out, c = state
            c, tok = step(params, c)
            return i + 1, jax.lax.dynamic_update_slice(
                out, tok[:, None].astype(jnp.int32), (0, i)
            ), c

        _, out, _ = jax.lax.while_loop(cond, body, (jnp.int32(0), out0, carry))
        return out

    fns = (prefill, step_jit, scan_decode)
    _DECODE_FN_CACHE[key] = fns
    return fns


def generate(
    model: LlamaModel,
    params,
    inputs_embeds: jax.Array,     # [B, L, H] (soft-prompt prefill)
    attention_mask: jax.Array,    # [B, L]
    *,
    max_new_tokens: int = 64,
    temperature: float = 0.4,
    top_p: float = 0.9,
    eos_token_id: int | None = None,
    rng: jax.Array | None = None,
    on_token=None,
) -> np.ndarray:
    """Sampled continuation ids [B, max_new_tokens]. ``on_token(tok)`` is
    called per decoded step with the batch's first-row token (streaming;
    see qa.callbacks).

    Without ``on_token`` the full continuation runs as a single compiled
    ``lax.scan`` dispatch; with it, a per-step compiled executable streams
    tokens (and stops early once every row hit ``eos_token_id``)."""
    B, L, H = inputs_embeds.shape
    total = L + max_new_tokens
    cfg = model.cfg
    Dh = cfg.hidden_size // cfg.num_heads

    caches = [
        (
            jnp.zeros((B, total, cfg.num_kv_heads, Dh), inputs_embeds.dtype),
            jnp.zeros((B, total, cfg.num_kv_heads, Dh), inputs_embeds.dtype),
        )
        for _ in range(cfg.num_layers)
    ]
    full_mask = jnp.concatenate(
        [attention_mask, jnp.zeros((B, max_new_tokens), attention_mask.dtype)], axis=1
    )
    positions = jnp.cumsum(attention_mask, axis=1) - 1  # left-padded friendly
    positions = jnp.maximum(positions, 0)
    if rng is None:
        rng = jax.random.PRNGKey(0)

    prefill, step_jit, scan_decode = _make_decode_fns(
        model, temperature, top_p, eos_token_id
    )
    last, caches = prefill(params, inputs_embeds, full_mask, positions, caches)
    carry = (
        caches, full_mask, positions[:, -1], last, rng,
        jnp.zeros((B,), bool), jnp.asarray(L, jnp.int32),
    )

    if on_token is None:
        return np.asarray(scan_decode(params, carry, max_new_tokens))

    out = []
    for _ in range(max_new_tokens):
        carry, tok = step_jit(params, carry)
        out.append(tok)
        on_token(int(tok[0]))
        finished = carry[5]
        if eos_token_id is not None and bool(jnp.all(finished)):
            break
    return np.stack([np.asarray(t) for t in out], axis=1)
