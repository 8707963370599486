"""Composed pure-torch QA oracle (decode + finetune-dynamics parity).

The tokenizer side already has a composed torch oracle
(models/torch_oracle.py) and EHR has one (ehr/torch_oracle.py); this module
is the QA analog: a torch twin of the soft-prompted Llama stack built from
the REFERENCE formulas so the flax path can be compared end to end —

- soft-prompt injection: review.py:47-74 / MedTok_QA_inference.py:131-146
  (L2-normalize + mean-pool the MedTok rows, project 256->H, right-align
  [prefix || text embeds] into a fixed window, labels at the text slots);
- generation: MedTok_QA_inference.py:152-162 via HF ``generate`` on
  ``inputs_embeds`` (greedy here — sampling RNGs are not comparable across
  frameworks, so token-level parity is only defined for argmax decoding);
- LoRA finetuning: MedTok_fintune_llama3.py:43-87 (r/alpha on q_proj/v_proj,
  projector + LoRA the only trainables, AdamW, shift-CE with -100 masking
  as computed inside HF's ``LlamaForCausalLM.forward(labels=...)``).

Used by scripts/run_qa_oracle.py and tests/test_qa_oracle.py only — torch
never appears on the production path.

Differences from the reference, intentional and load-bearing:
- review.py embeds ALL text slots (training rows are tokenized unpadded,
  MedTok_fintune_llama3.py:118-136); our collate right-pads the text part
  with attention 0, so the twin injects only the VALID text tokens — for
  unpadded rows the two are identical.
- the window filler embedding is zeros (the flax packer's default) rather
  than the eos-token embedding (review.py:48): filled positions carry
  attention 0 and are never attended, so the value is unobservable.
"""

from __future__ import annotations

import numpy as np

try:  # torch is an oracle-only dependency
    import torch
    import torch.nn as nn
    import torch.nn.functional as F
except ImportError:  # pragma: no cover
    torch = None


def build_tiny_hf_llama(cfg, seed: int = 0):
    """An installed-``transformers`` LlamaForCausalLM shaped like our
    LlamaConfig ``cfg`` (eager attention, fp32) — the frozen base of the
    twin. Mirrors tests/test_converters.py:216-237."""
    import transformers

    hf_cfg = transformers.LlamaConfig(
        vocab_size=cfg.vocab_size, hidden_size=cfg.hidden_size,
        intermediate_size=cfg.intermediate_size,
        num_hidden_layers=cfg.num_layers,
        num_attention_heads=cfg.num_heads,
        num_key_value_heads=cfg.num_kv_heads,
        max_position_embeddings=cfg.max_position_embeddings,
        rms_norm_eps=cfg.rms_norm_eps, rope_theta=cfg.rope_theta,
        tie_word_embeddings=False, attention_bias=False, mlp_bias=False,
        attention_dropout=0.0, attn_implementation="eager",
    )
    torch.manual_seed(seed)
    hf = transformers.LlamaForCausalLM(hf_cfg)
    hf.eval()
    return hf


class TorchLoraLinear(nn.Module):
    """W x + (alpha/r) * B A x — the PEFT LoRA formula
    (MedTok_fintune_llama3.py:43-49), matching LoraDense (qa/llama.py:56-74).
    ``base`` stays frozen; only lora_a/lora_b train."""

    def __init__(self, base: nn.Linear, rank: int, alpha: float):
        super().__init__()
        self.base = base
        for p in self.base.parameters():
            p.requires_grad_(False)
        self.rank, self.scale = rank, alpha / rank
        self.lora_a = nn.Linear(base.in_features, rank, bias=False)
        self.lora_b = nn.Linear(rank, base.out_features, bias=False)
        nn.init.normal_(self.lora_a.weight, std=0.02)
        nn.init.zeros_(self.lora_b.weight)

    def forward(self, x):
        return self.base(x) + self.scale * self.lora_b(self.lora_a(x))


def add_lora(hf_model, rank: int, alpha: float,
             targets: tuple[str, ...] = ("q_proj", "v_proj")):
    """Wrap attention projections with TorchLoraLinear in-place and freeze
    everything else (projector excluded — it lives on the twin)."""
    for p in hf_model.parameters():
        p.requires_grad_(False)
    for layer in hf_model.model.layers:
        attn = layer.self_attn
        for name in targets:
            setattr(attn, name,
                    TorchLoraLinear(getattr(attn, name), rank, alpha))
    return hf_model


class TorchSoftPromptLlama(nn.Module):
    """The Review twin (review.py:9-88): frozen MedTok table + trainable
    256->H projector feeding a (possibly LoRA-wrapped) HF Llama."""

    def __init__(self, hf_model, embeddings: np.ndarray, total_len: int = 512,
                 cutoff_len: int = 256):
        super().__init__()
        self.llm = hf_model
        self.table = torch.tensor(np.asarray(embeddings, np.float32))
        self.total_len, self.cutoff_len = total_len, cutoff_len
        hidden = hf_model.config.hidden_size
        self.projector = nn.Linear(embeddings.shape[-1], hidden)

    def inject(self, input_ids, attention_mask, labels=None):
        """review.py:47-74 — returns (inputs_embeds [B,T,H], mask [B,T],
        labels [B,T] or None). Rows are [cutoff_len med slots || text]."""
        ids = torch.as_tensor(np.asarray(input_ids), dtype=torch.long)
        mask = torch.as_tensor(np.asarray(attention_mask), dtype=torch.long)
        B = ids.shape[0]
        cl, T = self.cutoff_len, self.total_len
        H = self.llm.config.hidden_size
        embed_tokens = self.llm.get_input_embeddings()

        out_embeds = torch.zeros((B, T, H))
        out_mask = torch.zeros((B, T), dtype=torch.long)
        out_labels = (torch.full((B, T), -100, dtype=torch.long)
                      if labels is not None else None)
        lab = (torch.as_tensor(np.asarray(labels), dtype=torch.long)
               if labels is not None else None)
        for i in range(B):
            med = ids[i, :cl][mask[i, :cl] == 1]
            med_emb = F.normalize(self.table[med], p=2, dim=-1)
            prefix = self.projector(med_emb.mean(dim=0, keepdim=True))
            tvalid = mask[i, cl:] == 1
            text = ids[i, cl:][tvalid]
            q_emb = embed_tokens(text)
            row = torch.cat([prefix, q_emb], dim=0)
            out_embeds[i, -row.shape[0]:] = row
            out_mask[i, -row.shape[0]:] = 1
            if out_labels is not None:
                # collate right-pads text: the n valid tokens are text cols
                # 0..n-1, so their labels are lab[i, :n]
                n = int(tvalid.sum())
                out_labels[i, -n:] = lab[i, :n]
        return out_embeds, out_mask, out_labels

    def loss(self, batch: dict) -> torch.Tensor:
        """The reference training objective: HF shift-CE, mean over non
        -100 labels (review.py:77-88 passes labels straight to the LLM)."""
        embeds, mask, labels = self.inject(
            batch["input_ids"], batch["attention_mask"], batch["labels"]
        )
        out = self.llm(inputs_embeds=embeds, attention_mask=mask,
                       labels=labels)
        return out.loss

    @torch.no_grad()
    def greedy_decode(self, input_ids, attention_mask, max_new_tokens: int,
                      eos_token_id: int | None = None) -> np.ndarray:
        """MedTok_QA_inference.py:152-162 with do_sample=False. Returns the
        generated ids only ([B, <=max_new_tokens]) — HF's contract when
        prompting with inputs_embeds."""
        embeds, mask, _ = self.inject(input_ids, attention_mask)
        out = self.llm.generate(
            inputs_embeds=embeds, attention_mask=mask,
            max_new_tokens=max_new_tokens, do_sample=False,
            eos_token_id=eos_token_id, pad_token_id=0,
        )
        return out.numpy()

    @torch.no_grad()
    def next_token_logits(self, input_ids, attention_mask) -> np.ndarray:
        """Logits of the first generated position ([B, V]) — the decode
        leg's numeric (pre-argmax) parity surface. Positions are mask-aware
        (cumsum-1), matching what HF ``generate`` itself computes for
        left-padded prompts — the bare forward would default to arange and
        rotate valid tokens to the wrong angles."""
        embeds, mask, _ = self.inject(input_ids, attention_mask)
        positions = (mask.cumsum(-1) - 1).clamp(min=0)
        out = self.llm(inputs_embeds=embeds, attention_mask=mask,
                       position_ids=positions)
        return out.logits[:, -1, :].numpy()


# ---------------------------------------------------------------------------
# flax -> torch trainable-parameter transplant (identical init both sides)
# ---------------------------------------------------------------------------

def load_trainables_from_flax(twin: TorchSoftPromptLlama, params: dict,
                              targets: tuple[str, ...] = ("q_proj", "v_proj")):
    """Copy the flax trainable subtree (soft-prompt projector + per-layer
    LoRA a/b) into the torch twin so both sides start from the SAME init.
    flax Dense kernels are [in, out]; torch Linear weights are [out, in]."""
    proj = params["soft_prompt"]["projector"]
    twin.projector.weight.data = torch.tensor(
        np.asarray(proj["kernel"]).T.copy())
    twin.projector.bias.data = torch.tensor(np.asarray(proj["bias"]).copy())
    llm_p = params["llm"]
    for li, layer in enumerate(twin.llm.model.layers):
        flax_layer = llm_p[f"layers_{li}"]["self_attn"]
        for name in targets:
            mod = getattr(layer.self_attn, name)
            a = np.asarray(flax_layer[name]["lora_a"])
            b = np.asarray(flax_layer[name]["lora_b"])
            mod.lora_a.weight.data = torch.tensor(a.T.copy())
            mod.lora_b.weight.data = torch.tensor(b.T.copy())
    return twin


def trainable_parameters(twin: TorchSoftPromptLlama):
    """(name, param) pairs of the torch twin's trainables — projector +
    LoRA, the MedTok_fintune_llama3.py:241-246 state_dict contract."""
    return [(n, p) for n, p in twin.named_parameters() if p.requires_grad]


def torch_grads_as_flax_tree(twin: TorchSoftPromptLlama,
                             targets=("q_proj", "v_proj")) -> dict:
    """Arrange the twin's .grad tensors in the flax trainable-subtree layout
    (transposed back to [in, out]) for leaf-by-leaf comparison."""
    out = {"soft_prompt": {"projector": {
        "kernel": twin.projector.weight.grad.numpy().T.copy(),
        "bias": twin.projector.bias.grad.numpy().copy(),
    }}, "llm": {}}
    for li, layer in enumerate(twin.llm.model.layers):
        lt = {}
        for name in targets:
            mod = getattr(layer.self_attn, name)
            lt[name] = {
                "lora_a": mod.lora_a.weight.grad.numpy().T.copy(),
                "lora_b": mod.lora_b.weight.grad.numpy().T.copy(),
            }
        out["llm"][f"layers_{li}"] = {"self_attn": lt}
    return out
