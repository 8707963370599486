"""Load the PyTorch reference quantizer as a live parity oracle.

The north-star parity claim is "exact token IDs vs the PyTorch reference"
(BASELINE.json). torch + einops are installed in this environment, so the
reference ``VectorQuantizer`` / ``CrossAttention``
(/root/reference/MedTok/vector_quantization_soft_one_new.py:17-271) can be
imported directly and run side-by-side with :class:`SoftVQQuantizer` after a
weight conversion. This module provides:

- :func:`load_reference_vq_module` — imports the reference file without
  executing the package ``__init__`` (which needs dgl, absent here);
- :func:`convert_torch_mha` — splits torch ``nn.MultiheadAttention``'s packed
  ``in_proj_weight``/``in_proj_bias`` into flax q/k/v/out Dense params;
- :func:`convert_torch_quantizer` — full reference-VQ state_dict -> the
  SoftVQQuantizer param pytree.

Everything here is torch-optional: importing this module does not import
torch; the reference tree is only touched read-only.
"""

from __future__ import annotations

import importlib.util
import sys
import types
from pathlib import Path

import numpy as np

REFERENCE_ROOT = Path("/root/reference")
_VQ_FILE = "MedTok/vector_quantization_soft_one_new.py"


def reference_available(root: Path | str = REFERENCE_ROOT) -> bool:
    return (Path(root) / _VQ_FILE).exists()


def load_reference_vq_module(root: Path | str = REFERENCE_ROOT):
    """Import the reference quantizer module by file path.

    ``MedTok/__init__.py`` imports dgl (not installed), so a stub package
    entry with only ``__path__`` is registered first; the submodule import
    ``from MedTok.norm_ema_quantizer import ...`` then resolves through the
    package path without running the ``__init__`` body.
    """
    root = Path(root)
    name = "MedTok.vector_quantization_soft_one_new"
    if name in sys.modules:
        return sys.modules[name]
    if "MedTok" not in sys.modules:
        pkg = types.ModuleType("MedTok")
        pkg.__path__ = [str(root / "MedTok")]
        sys.modules["MedTok"] = pkg
    spec = importlib.util.spec_from_file_location(name, root / _VQ_FILE)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def _np(t) -> np.ndarray:
    return t.detach().cpu().numpy().astype(np.float32)


def convert_torch_mha(sd: dict, prefix: str) -> dict:
    """torch ``nn.MultiheadAttention`` params -> flax MultiheadAttention.

    torch packs q/k/v input projections row-wise into
    ``in_proj_weight [3E, E]`` / ``in_proj_bias [3E]``; flax Dense kernels are
    the transpose of torch Linear weights.
    """
    w = _np(sd[f"{prefix}.in_proj_weight"])
    b = _np(sd[f"{prefix}.in_proj_bias"])
    e = w.shape[1]
    assert w.shape[0] == 3 * e, f"packed in_proj must be [3E, E], got {w.shape}"
    out = {}
    for i, name in enumerate(("q_proj", "k_proj", "v_proj")):
        out[name] = {
            "kernel": w[i * e:(i + 1) * e].T.copy(),
            "bias": b[i * e:(i + 1) * e].copy(),
        }
    out["out_proj"] = {
        "kernel": _np(sd[f"{prefix}.out_proj.weight"]).T.copy(),
        "bias": _np(sd[f"{prefix}.out_proj.bias"]).copy(),
    }
    return out


def _linear(sd: dict, prefix: str) -> dict:
    return {
        "kernel": _np(sd[f"{prefix}.weight"]).T.copy(),
        "bias": _np(sd[f"{prefix}.bias"]).copy(),
    }


def convert_torch_encoder_layer(sd: dict, prefix: str = "") -> dict:
    """torch ``nn.TransformerEncoderLayer`` (post-norm, ReLU — the EHR
    encoder's building block, EHRModel_token.py:236) -> our
    ehr.model.TransformerEncoderLayer params."""
    p = prefix + "." if prefix else ""

    def norm(name):
        return {
            "scale": _np(sd[f"{p}{name}.weight"]).copy(),
            "bias": _np(sd[f"{p}{name}.bias"]).copy(),
        }

    return {
        "self_attn": convert_torch_mha(sd, f"{p}self_attn"),
        "norm1": norm("norm1"),
        "norm2": norm("norm2"),
        "linear1": _linear(sd, f"{p}linear1"),
        "linear2": _linear(sd, f"{p}linear2"),
    }


def make_torch_gcn_conv(in_channels: int, out_channels: int):
    """Pure-torch GCNConv with torch_geometric.nn.GCNConv's default formula
    (add_self_loops=True, symmetric normalization, bias; the layer used by the
    reference GraphEncoder, /root/reference/MedTok/tokenizer.py:19-23).

    torch_geometric is not installed here; the formula is ~15 lines of plain
    torch: out = D^-1/2 (A + I) D^-1/2 (X W) + b with degrees computed on the
    destination index over the self-loop-augmented edge set.
    """
    import torch
    import torch.nn as nn

    class TorchGCNConv(nn.Module):
        def __init__(self):
            super().__init__()
            self.lin = nn.Linear(in_channels, out_channels, bias=False)
            self.bias = nn.Parameter(torch.zeros(out_channels))

        def forward(self, x, edge_index):
            n = x.shape[0]
            loop = torch.arange(n, dtype=edge_index.dtype)
            src = torch.cat([edge_index[0], loop])
            dst = torch.cat([edge_index[1], loop])
            deg = torch.zeros(n).index_add_(0, dst, torch.ones(dst.shape[0]))
            dinv = deg.pow(-0.5)
            dinv[torch.isinf(dinv)] = 0.0
            coef = (dinv[src] * dinv[dst]).unsqueeze(-1)
            xw = self.lin(x)
            out = torch.zeros(n, xw.shape[1]).index_add_(0, dst, coef * xw[src])
            return out + self.bias

    return TorchGCNConv()


def build_composed_oracle(cfg, *, seed: int = 0, root: Path | str = REFERENCE_ROOT):
    """The COMPOSED torch reference eval pipeline as one module.

    Wires the full parity surface of tokenizer.py:202-247 / inference.py:105-138:
    installed HF ``transformers.BertModel`` (random-init at ``cfg.text``'s
    shape) -> text_mapped Linear; node-embedding table -> GCNConv -> ReLU ->
    GCNConv -> global_mean_pool; h = cat(text CLS, graph pool); the imported
    reference ``VectorQuantizer``. ``cfg`` is a ModelConfig; returns a torch
    module whose ``forward`` runs the eval branch and returns
    (embedding [B,256], tokens [B,4,k], weights [B,4,k]) — token indices are
    captured via a torch.topk hook since the reference quantizer does not
    return them (latent upstream bug, tokenizer.py:235-238).
    """
    import torch
    import torch.nn as nn
    import transformers

    mod = load_reference_vq_module(root)
    t, g, q = cfg.text, cfg.graph, cfg.quantizer
    torch.manual_seed(seed)

    class ComposedOracle(nn.Module):
        def __init__(self):
            super().__init__()
            self.text_model = transformers.BertModel(transformers.BertConfig(
                vocab_size=t.vocab_size, hidden_size=t.hidden_size,
                num_hidden_layers=t.num_layers, num_attention_heads=t.num_heads,
                intermediate_size=t.intermediate_size,
                max_position_embeddings=t.max_position_embeddings,
                hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
                hidden_act="gelu",
            ))
            # GraphEncoder (tokenizer.py:13-45): emb table + GCN-ReLU-GCN
            self.emb = nn.Embedding(g.num_nodes, g.in_channels)
            self.conv1 = make_torch_gcn_conv(g.in_channels, g.hidden_channels)
            self.conv2 = make_torch_gcn_conv(g.hidden_channels, g.out_channels)
            self.text_mapped = nn.Linear(t.hidden_size, g.out_channels)
            self.quantize = mod.VectorQuantizer(
                n_e=q.codebook_size, e_dim=q.codebook_embed_dim,
                beta=q.commit_loss_beta, entropy_loss_ratio=q.entropy_loss_ratio,
                l2_norm=q.l2_norm, show_usage=q.show_usage,
                split=[q.codebook_embed_dim, q.codebook_embed_dim],
                kmeans=False, num_head=q.num_heads, k=q.top_k,
            )

        @torch.no_grad()
        def forward(self, input_ids, attention_mask, flat_nodes, edge_index,
                    batch_vec):
            """Eval forward (tokenizer.py:202-247, training=False branch).
            flat_nodes: [sum_n] global node ids; edge_index: [2, E] flat
            indices; batch_vec: [sum_n] graph id per node."""
            B = input_ids.shape[0]
            text = self.text_model(
                input_ids=input_ids, attention_mask=attention_mask
            ).last_hidden_state                                 # (:211, 144-152)
            x = self.emb(flat_nodes)
            h1 = torch.relu(self.conv1(x, edge_index))
            node_feats = self.conv2(h1, edge_index)             # (:34-45, last)
            # global_mean_pool over the batch vector (:216)
            pool = torch.zeros(B, node_feats.shape[1]).index_add_(
                0, batch_vec, node_feats
            )
            cnt = torch.zeros(B).index_add_(
                0, batch_vec, torch.ones(batch_vec.shape[0])
            ).clamp(min=1.0).unsqueeze(-1)
            graph_features = pool / cnt
            text_features = self.text_mapped(text)              # (:221)
            h = torch.cat((text_features[:, 0, :], graph_features), dim=-1)

            calls = []
            orig_topk = torch.topk

            def rec_topk(*a, **k):
                out = orig_topk(*a, **k)
                # (indices, values, full distance rows) — the distances feed
                # mismatch triage (boundary-gap analysis) in the parity sweep
                calls.append(
                    (out.indices.clone(), out.values.clone(),
                     a[0].detach().clone())
                )
                return out

            torch.topk = rec_topk
            try:
                r = self.quantize(
                    h, text_features, node_feats, attention_mask, batch_vec,
                    None,
                )
            finally:
                torch.topk = orig_topk
            # topk call order inside VectorQuantizer.forward: shared_text,
            # shared_graph (get_shared_info :157-160), then text-specific,
            # graph-specific (specific_embedding :207-208)
            (st_i, st_v, st_d), (sg_i, sg_v, sg_d), (tx_i, tx_v, tx_d), \
                (gr_i, gr_v, gr_d) = calls
            # stashed in eval-path order [text, graph, shared_text,
            # shared_graph] for the sweep's mismatch triage
            self.last_distances = (tx_d, gr_d, st_d, sg_d)
            sm = lambda v: torch.softmax(-v, dim=1)
            # eval concat order: tokenizer.py:240-247
            tokens = torch.stack([tx_i, gr_i, st_i, sg_i], dim=1)
            weights = torch.stack(
                [sm(tx_v), sm(gr_v), sm(st_v), sm(sg_v)], dim=1
            )
            embedding = torch.cat(
                (r["specific_embedding_text"], r["specific_embedding_graph"],
                 r["shared_text_embedding"], r["shared_graph_embedding"]),
                dim=-1,
            )
            return embedding, tokens, weights

    oracle = ComposedOracle()
    oracle.eval()
    return oracle


def convert_composed_oracle(oracle, cfg) -> dict:
    """Composed-oracle torch weights -> the COMPLETE flax MultimodalTokenizer
    param tree (models/tokenizer_model.py): text_model / graph_encoder /
    text_mapped / quantize."""
    from medtok_tpu.models.bert import convert_hf_bert

    bert_sd = oracle.text_model.state_dict()
    sd = oracle.state_dict()
    return {
        "text_model": convert_hf_bert(bert_sd, cfg.text),
        "graph_encoder": {
            "emb": {"embedding": _np(sd["emb.weight"])},
            "conv1": {
                "lin": {"kernel": _np(sd["conv1.lin.weight"]).T.copy()},
                "bias": _np(sd["conv1.bias"]),
            },
            "conv2": {
                "lin": {"kernel": _np(sd["conv2.lin.weight"]).T.copy()},
                "bias": _np(sd["conv2.bias"]),
            },
        },
        "text_mapped": _linear(sd, "text_mapped"),
        "quantize": convert_torch_quantizer(
            {k[len("quantize."):]: v for k, v in sd.items()
             if k.startswith("quantize.")}
        ),
    }


def code_batch_to_torch(batch):
    """CodeBatch (padded dense layout, data/types.py) -> the reference's flat
    PyG-Batch-style tensors (dataset_creator.py:302-304): flat global node
    ids, [2, E] flat edge_index over real edges only, and the batch vector."""
    import torch

    ids = np.asarray(batch.node_ids)
    mask = np.asarray(batch.node_mask)
    B, Ln = ids.shape
    counts = mask.sum(axis=1).astype(np.int64)
    offsets = np.concatenate([[0], np.cumsum(counts)[:-1]])
    flat_nodes = ids[mask].astype(np.int64)
    batch_vec = np.repeat(np.arange(B, dtype=np.int64), counts)

    src = np.asarray(batch.edge_src)
    dst = np.asarray(batch.edge_dst)
    w = np.asarray(batch.edge_weight)
    E = src.shape[0]
    assert E % B == 0
    graph_of_edge = np.arange(E) // (E // B)
    real = w > 0
    flat_src = src[real] + offsets[graph_of_edge[real]]
    flat_dst = dst[real] + offsets[graph_of_edge[real]]
    edge_index = np.stack([flat_src, flat_dst]).astype(np.int64)
    return (
        torch.from_numpy(np.asarray(batch.input_ids, np.int64)),
        torch.from_numpy(np.asarray(batch.attention_mask, np.int64)),
        torch.from_numpy(flat_nodes),
        torch.from_numpy(edge_index),
        torch.from_numpy(batch_vec),
    )


_LOSS_FILE = "MedTok/loss.py"


def load_reference_loss_module(root: Path | str = REFERENCE_ROOT):
    """Import the reference loss suite (/root/reference/MedTok/loss.py) by
    file path — shared_loss / specific_loss / info_nce_loss are the torch
    golden implementations the train-dynamics harness assembles against
    (train_MedTok.py:215-238)."""
    root = Path(root)
    name = "MedTok.loss"
    if name in sys.modules:
        return sys.modules[name]
    if "MedTok" not in sys.modules:
        pkg = types.ModuleType("MedTok")
        pkg.__path__ = [str(root / "MedTok")]
        sys.modules["MedTok"] = pkg
    spec = importlib.util.spec_from_file_location(name, root / _LOSS_FILE)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def zero_dropout(module) -> None:
    """Zero every dropout in a torch module tree (nn.Dropout.p and
    nn.MultiheadAttention.dropout). The reference cross-attention carries
    dropout=0.1 (vector_quantization_soft_one_new.py:105) which is ACTIVE in
    train mode; the dynamics harness compares deterministic objectives, so
    both sides run dropout-free."""
    import torch.nn as nn

    for m in module.modules():
        if isinstance(m, nn.Dropout):
            m.p = 0.0
        if isinstance(m, nn.MultiheadAttention):
            m.dropout = 0.0


def build_composed_train_oracle(
    cfg, *, seed: int = 0, root: Path | str = REFERENCE_ROOT
):
    """The COMPOSED torch reference TRAIN pipeline as one trainable module.

    Same component wiring as :func:`build_composed_oracle` but on the
    training forward (tokenizer.py:202-226, training=True): frozen BERT under
    ``no_grad`` (tokenizer.py:148-152), GCN run twice — real and edge-dropped
    aug graph (:215-218), h / h_aug assembled in ``quant`` (:162-166), and the
    imported reference ``VectorQuantizer`` in train mode returning the full
    loss dict (vector_quantization_soft_one_new.py:238-271). All dropout is
    zeroed (see :func:`zero_dropout`); with BERT dropout off the reference's
    "text aug" (a second identical BERT call, :211-212) equals the first
    call, matching the flax default ``text_dropout_in_train=False``.

    ``forward`` returns the quantized-result dict; assemble the objective
    with :func:`assemble_torch_losses`.
    """
    import torch
    import torch.nn as nn
    import transformers

    mod = load_reference_vq_module(root)
    t, g, q = cfg.text, cfg.graph, cfg.quantizer
    torch.manual_seed(seed)

    class ComposedTrainOracle(nn.Module):
        def __init__(self):
            super().__init__()
            self.text_model = transformers.BertModel(transformers.BertConfig(
                vocab_size=t.vocab_size, hidden_size=t.hidden_size,
                num_hidden_layers=t.num_layers, num_attention_heads=t.num_heads,
                intermediate_size=t.intermediate_size,
                max_position_embeddings=t.max_position_embeddings,
                hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
                hidden_act="gelu",
            ))
            for p in self.text_model.parameters():   # frozen (tokenizer.py:80-81)
                p.requires_grad_(False)
            self.emb = nn.Embedding(g.num_nodes, g.in_channels)
            self.conv1 = make_torch_gcn_conv(g.in_channels, g.hidden_channels)
            self.conv2 = make_torch_gcn_conv(g.hidden_channels, g.out_channels)
            self.text_mapped = nn.Linear(t.hidden_size, g.out_channels)
            self.quantize = mod.VectorQuantizer(
                n_e=q.codebook_size, e_dim=q.codebook_embed_dim,
                beta=q.commit_loss_beta, entropy_loss_ratio=q.entropy_loss_ratio,
                l2_norm=q.l2_norm, show_usage=q.show_usage,
                split=[q.codebook_embed_dim, q.codebook_embed_dim],
                kmeans=False, num_head=q.num_heads, k=q.top_k,
            )
            zero_dropout(self)
            # The reference registers the usage FIFO as
            # nn.Parameter(requires_grad=True) inside register_buffer
            # (vector_quantization_soft_one_new.py:118); its in-place FIFO
            # shift then errors under grad mode on current torch. Restore
            # intended buffer semantics (non-grad telemetry state).
            if hasattr(self.quantize, "codebook_used"):
                self.quantize.codebook_used.requires_grad_(False)

        def _gcn(self, x, edge_index):
            import torch as _t

            h1 = _t.relu(self.conv1(x, edge_index))
            return self.conv2(h1, edge_index)

        def forward(self, input_ids, attention_mask, flat_nodes, edge_index,
                    batch_vec, edge_index_aug):
            import torch as _t

            B = input_ids.shape[0]
            with _t.no_grad():                       # tokenize_text (:148-152)
                text = self.text_model(
                    input_ids=input_ids, attention_mask=attention_mask
                ).last_hidden_state
            x = self.emb(flat_nodes)
            node_feats = self._gcn(x, edge_index)            # (:215-216)
            node_feats_aug = self._gcn(x, edge_index_aug)    # (:217-218)

            def pool(nf):                                    # global_mean_pool
                p = _t.zeros(B, nf.shape[1]).index_add_(0, batch_vec, nf)
                cnt = _t.zeros(B).index_add_(
                    0, batch_vec, _t.ones(batch_vec.shape[0])
                ).clamp(min=1.0).unsqueeze(-1)
                return p / cnt

            graph_features = pool(node_feats)
            graph_features_aug = pool(node_feats_aug)
            text_features = self.text_mapped(text)           # (:221-222)
            # quant assembly (tokenizer.py:160-166, dropout-free: aug text
            # CLS == text CLS)
            cls = text_features[:, 0, :]
            h = _t.cat((cls, graph_features), dim=-1)
            h_aug = _t.cat((cls, graph_features_aug), dim=-1)
            return self.quantize(
                h, text_features, node_feats, attention_mask, batch_vec, h_aug
            )

    oracle = ComposedTrainOracle()
    oracle.train()
    return oracle


def assemble_torch_losses(
    qr: dict, *, shared_loss_beta: float = 0.1, specific_loss_lamb: float = 0.1,
    root: Path | str = REFERENCE_ROOT,
):
    """The exact torch training objective of train_MedTok.py:215-238, built
    from the IMPORTED reference loss functions (loss.py:86-110). Returns
    (total, metrics-dict) mirroring train.losses.assemble_losses."""
    loss_mod = load_reference_loss_module(root)
    codebook_loss = (
        qr["shared_embed_loss"][0] + qr["shared_embed_loss"][1]
        + qr["text_specific_loss"][0] + qr["text_specific_loss"][1]
        + qr["graph_specific_loss"][0] + qr["graph_specific_loss"][1]
    )
    s11, s12, s21, s22 = loss_mod.shared_loss(
        qr["shared_text_embedding"], qr["shared_graph_embedding"],
        qr["text_feature"], qr["graph_feature"],
    )
    shared_all = (s11 - shared_loss_beta * s12) + (s21 - shared_loss_beta * s22)
    p11, p12, p21, p22 = loss_mod.specific_loss(
        z1=qr["specific_embedding_text"],
        z1_aug=qr["specific_embedding_text_aug"],
        z2=qr["specific_embedding_graph"],
        z2_aug=qr["specific_embedding_graph_aug"],
        z1_c=qr["shared_text_embedding"],
        z2_c=qr["shared_graph_embedding"],
    )
    specific_all = (p11 + specific_loss_lamb * p12) + (p21 + specific_loss_lamb * p22)
    total = codebook_loss + shared_all + specific_all
    return total, {
        "loss": total, "vq_loss": codebook_loss,
        "loss_common_all": shared_all, "loss_specific_all": specific_all,
        "loss_common_11": s11, "loss_common_12": s12,
        "loss_common_21": s21, "loss_common_22": s22,
        "loss_specific_11": p11, "loss_specific_12": p12,
        "loss_specific_21": p21, "loss_specific_22": p22,
    }


def convert_composed_grads(oracle, cfg, flax_params) -> dict:
    """Torch parameter GRADIENTS -> a pytree shaped exactly like the flax
    param tree, for side-by-side comparison with ``jax.grad``.

    Every weight conversion in this module is linear (transpose / row-split /
    copy), so cotangents convert by the identical transformation. The frozen
    BERT has no torch grads (requires_grad=False) and identically-zero flax
    grads (stop_gradient at tokenizer_model.py:59); its subtree is emitted as
    zeros of ``flax_params['text_model']``."""
    import torch

    gsd = {}
    for k, p in oracle.named_parameters():
        gsd[k] = torch.zeros_like(p) if p.grad is None else p.grad
    return {
        "text_model": _zeros_like_tree(flax_params["text_model"]),
        "graph_encoder": {
            "emb": {"embedding": _np(gsd["emb.weight"])},
            "conv1": {
                "lin": {"kernel": _np(gsd["conv1.lin.weight"]).T.copy()},
                "bias": _np(gsd["conv1.bias"]),
            },
            "conv2": {
                "lin": {"kernel": _np(gsd["conv2.lin.weight"]).T.copy()},
                "bias": _np(gsd["conv2.bias"]),
            },
        },
        "text_mapped": {
            "kernel": _np(gsd["text_mapped.weight"]).T.copy(),
            "bias": _np(gsd["text_mapped.bias"]).copy(),
        },
        "quantize": convert_torch_quantizer(
            {k[len("quantize."):]: v for k, v in gsd.items()
             if k.startswith("quantize.")}
        ),
    }


def _zeros_like_tree(tree):
    import jax

    return jax.tree.map(lambda x: np.zeros_like(np.asarray(x)), tree)


def code_batch_to_torch_train(batch):
    """CodeBatch -> the train-forward tensor tuple: the eval tuple of
    :func:`code_batch_to_torch` plus the edge-dropout-augmented flat
    edge_index (dataset_creator.py:155-170; consumed at tokenizer.py:217)."""
    import torch

    ids, am, flat_nodes, edge_index, batch_vec = code_batch_to_torch(batch)
    mask = np.asarray(batch.node_mask)
    counts = mask.sum(axis=1).astype(np.int64)
    offsets = np.concatenate([[0], np.cumsum(counts)[:-1]])
    src = np.asarray(batch.edge_src_aug)
    dst = np.asarray(batch.edge_dst_aug)
    w = np.asarray(batch.edge_weight_aug)
    B = mask.shape[0]
    E = src.shape[0]
    graph_of_edge = np.arange(E) // (E // B)
    real = w > 0
    edge_index_aug = np.stack([
        src[real] + offsets[graph_of_edge[real]],
        dst[real] + offsets[graph_of_edge[real]],
    ]).astype(np.int64)
    return ids, am, flat_nodes, edge_index, batch_vec, \
        torch.from_numpy(edge_index_aug)


def convert_torch_quantizer(sd: dict, *, num_layers: int = 2) -> dict:
    """Reference ``VectorQuantizer.state_dict()`` -> SoftVQQuantizer params.

    Layout mirrors vector_quantization_soft_one_new.py:90-118: one codebook
    ``nn.Embedding(n_e, e_dim)``, a 2-layer shared bidirectional
    CrossAttention stack, and proj_text/proj_graph Linears.
    """
    cross = {}
    for i in range(num_layers):
        tp = f"cross_attn.model.{i}"
        cross[f"layer_{i}"] = {
            "multihead_attn": convert_torch_mha(sd, f"{tp}.multihead_attn"),
            "layer_norm": {
                "scale": _np(sd[f"{tp}.layer_norm.weight"]).copy(),
                "bias": _np(sd[f"{tp}.layer_norm.bias"]).copy(),
            },
        }
    return {
        "codebook": _np(sd["codebook.weight"]).copy(),
        "cross_attn": cross,
        "proj_text": _linear(sd, "proj_text"),
        "proj_graph": _linear(sd, "proj_graph"),
    }
