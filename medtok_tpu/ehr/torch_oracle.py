"""Composed pure-torch EHRModel oracle for forward + quality parity.

The reference EHR downstream model
(/root/reference/MedTok_EHR_Tutorial/EHRModel_token.py:36-247) is a
Lightning module entangled with dgl/pytorch_geometric imports, so it cannot
be imported here. Its computation, however, is plain torch: sinusoidal
positional encoding + year-embedding + day/hour sin-cos time features
(:36-78), frozen MedTok table + learned miss row (:128-141), projector
256->input_dim, [CLS, gender, ethnicity] prepend, a stack of stock
``torch.nn.TransformerEncoderLayer`` (:95-104 — the actual torch module, so
this side of the oracle is bit-identical to what the reference runs), CLS ->
fc -> classify (:215-247). This module composes exactly that, plus the
torch->flax weight conversion so both sides run identical parameters.

Loss/optimizer facts for the quality harness: BCE-with-logits on one-hot
labels (CE for lenofstay), Adam lr + cosine annealing T_max=10 eta_min=1e-3
(:392-394, :554-565).

torch-optional: importing this module does not import torch.
"""

from __future__ import annotations

import math

import numpy as np

from medtok_tpu.models.torch_oracle import (
    _linear,
    _np,
    convert_torch_encoder_layer,
)


def build_torch_ehr_model(
    embedding_table: np.ndarray,
    *,
    num_class: int,
    input_dim: int = 64,
    output_dim: int = 64,
    num_heads: int = 4,
    hidden_dim: int = 256,
    num_layers: int = 4,
    dropout: float = 0.5,
    pe_dropout: float = 0.2,
    max_len: int = 2001,
    max_year: int = 1000,
    seed: int = 0,
):
    """Pure-torch EHRModel with the reference's exact forward semantics."""
    import torch
    import torch.nn as nn

    torch.manual_seed(seed)

    class TorchPositionalEncoding(nn.Module):
        """EHRModel_token.py:36-78."""

        def __init__(self):
            super().__init__()
            self.dropout = nn.Dropout(p=pe_dropout)
            self.year_emb = nn.Embedding(max_year, output_dim - 4)
            position = torch.arange(max_len).unsqueeze(1)
            div_term = torch.exp(
                torch.arange(0, output_dim, 2)
                * (-math.log(10000.0) / output_dim)
            )
            pe = torch.zeros(max_len, 1, output_dim)
            pe[:, 0, 0::2] = torch.sin(position * div_term)
            pe[:, 0, 1::2] = torch.cos(position * div_term)
            self.register_buffer("pe", pe)

        def get_time_embedding(self, t):
            year, day, hour = t[:, :, 0], t[:, :, 1], t[:, :, 2]
            two_pi = 2 * math.pi
            day_sin = torch.sin(two_pi * day / 365).unsqueeze(-1)
            day_cos = torch.cos(two_pi * day / 365).unsqueeze(-1)
            hour_sin = torch.sin(two_pi * hour / 24).unsqueeze(-1)
            hour_cos = torch.cos(two_pi * hour / 24).unsqueeze(-1)
            return torch.cat(
                [self.year_emb(year), day_sin, day_cos, hour_sin, hour_cos],
                dim=-1,
            )

        def forward(self, x, time_within, time_between):
            x = (x + self.pe[: x.size(1)].squeeze(1)
                 + self.get_time_embedding(time_within)
                 + self.get_time_embedding(time_between))
            return self.dropout(x)

    class TorchEHRModel(nn.Module):
        """EHRModel_token.py:81-247 (patientEncoder + heads)."""

        def __init__(self):
            super().__init__()
            self.register_buffer(
                "emb", torch.from_numpy(
                    np.asarray(embedding_table, np.float32))
            )
            emb_dim = embedding_table.shape[1]
            self.cls_emb = nn.Parameter(torch.randn(1, output_dim))
            self.miss_emb = nn.Parameter(torch.randn(1, emb_dim))
            self.gender_emb = nn.Embedding(5, input_dim)
            self.ethnicity_emb = nn.Embedding(100, input_dim)
            self.projector = nn.Linear(emb_dim, input_dim)
            self.position_encoder = TorchPositionalEncoding()
            self.model = nn.ModuleList([
                nn.TransformerEncoderLayer(
                    d_model=input_dim, nhead=num_heads,
                    dim_feedforward=hidden_dim, dropout=dropout,
                )
                for _ in range(num_layers)
            ])
            self.fc = nn.Linear(output_dim, output_dim)
            self.classify = nn.Linear(output_dim, num_class)

        def patient_encoder(self, codes, visit_ids, pad_mask, gender,
                            ethnicity, time_within, time_between):
            table = torch.cat([self.emb, self.miss_emb], dim=0)
            src = table[codes]                       # [B, C, 256]
            src = self.projector(src)                # [B, C, input_dim]
            tw = time_within.gather(
                1, visit_ids.long().unsqueeze(-1).expand(
                    -1, -1, time_within.size(-1)))
            tb = time_between.gather(
                1, visit_ids.long().unsqueeze(-1).expand(
                    -1, -1, time_between.size(-1)))
            src = self.position_encoder(src, tw, tb)

            B = src.size(0)
            cls = self.cls_emb.repeat(B, 1).unsqueeze(1)
            g = self.gender_emb(gender.long()).unsqueeze(1)
            e = self.ethnicity_emb(ethnicity.long()).unsqueeze(1)
            x = torch.cat([cls, g, e, src], dim=1)   # [B, C+3, D]
            mask = torch.cat(
                [torch.zeros(B, 3).bool(), pad_mask.bool()], dim=-1)
            x = x.transpose(0, 1)                    # torch default seq-first
            for layer in self.model:
                x = layer(x, src_key_padding_mask=mask)
            return self.fc(x[0])                     # CLS row

        def forward(self, batch):
            import torch as _t

            def t(a, dtype=_t.float32):
                return _t.from_numpy(np.asarray(a)).to(dtype)

            emb = self.patient_encoder(
                t(batch.codes, _t.long), t(batch.visit_ids, _t.long),
                t(batch.pad_mask, _t.bool), t(batch.gender, _t.long),
                t(batch.ethnicity, _t.long),
                t(batch.time_within, _t.long),
                t(batch.time_between, _t.long),
            )
            return emb, self.classify(emb)

    return TorchEHRModel()


def convert_torch_ehr_model(model) -> dict:
    """torch EHRModel state_dict -> flax ehr.model.EHRModel param pytree."""
    sd = model.state_dict()
    params = {
        "cls_emb": _np(sd["cls_emb"]).copy(),
        "miss_emb": _np(sd["miss_emb"]).copy(),
        "gender_emb": {"embedding": _np(sd["gender_emb.weight"]).copy()},
        "ethnicity_emb": {
            "embedding": _np(sd["ethnicity_emb.weight"]).copy()},
        "projector": _linear(sd, "projector"),
        "position_encoder": {
            "year_emb": {
                "embedding": _np(
                    sd["position_encoder.year_emb.weight"]).copy()},
        },
        "fc": _linear(sd, "fc"),
        "classify": _linear(sd, "classify"),
    }
    n_layers = len(model.model)
    for i in range(n_layers):
        params[f"layer_{i}"] = convert_torch_encoder_layer(sd, f"model.{i}")
    return params


def torch_train_epochs(
    model,
    batches,
    *,
    task: str,
    lr: float,
    epochs: int,
    steps_per_epoch: int,
    seed: int = 0,
) -> None:
    """Reference-formula torch training loop: Adam + cosine(T_max=10,
    eta_min=1e-3), BCE-with-logits (CE for lenofstay) on one-hot labels
    (EHRModel_token.py:392-394, 554-565). ``batches`` yields EHRBatch."""
    import torch
    import torch.nn.functional as F

    torch.manual_seed(seed)
    opt = torch.optim.Adam(model.parameters(), lr=lr, weight_decay=0.0)
    sched = torch.optim.lr_scheduler.CosineAnnealingLR(
        opt, T_max=10, eta_min=1e-3)
    model.train()
    it = iter(batches)
    for _ in range(epochs):
        for _ in range(steps_per_epoch):
            b = next(it)
            _, logits = model(b)
            y = torch.from_numpy(np.asarray(b.label_onehot, np.float32))
            if task == "lenofstay":
                loss = F.cross_entropy(logits, y)
            else:
                loss = F.binary_cross_entropy_with_logits(logits, y)
            opt.zero_grad()
            loss.backward()
            opt.step()
        sched.step()
    model.eval()


def torch_eval_probs(model, batches, task: str) -> np.ndarray:
    import torch
    import torch.nn.functional as F

    model.eval()
    outs = []
    with torch.no_grad():
        for b in batches:
            _, logits = model(b)
            if task in ("lenofstay", "readmission", "mortality"):
                p = F.softmax(logits, dim=-1)
            else:
                p = torch.sigmoid(logits)
            outs.append(p.numpy())
    return np.concatenate(outs, axis=0)
