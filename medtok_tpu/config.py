"""Frozen dataclass configs for the MedTok-TPU framework.

Mirrors the reference's config surface (train_MedTok.py:345-400 argparse defaults)
and keeps its config-freezing contract: training dumps the resolved config as
``args.json`` next to checkpoints, and inference/export reconstructs the exact
model from it (reference: train_MedTok.py:57, inference.py:30-37).
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any


@dataclass(frozen=True)
class TextEncoderConfig:
    """BERT-base-uncased shape (reference: tokenizer.py:75, frozen at 80-81)."""

    vocab_size: int = 30522
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    layer_norm_eps: float = 1e-12
    hidden_dropout: float = 0.1
    attention_dropout: float = 0.1
    pad_token_id: int = 0
    # Fused block-diagonal attention (ops/flash_attention.py::
    # packed_segment_attention) on the sequence-packed path when the caller
    # provides segment ids. Avoids the [R, H, P, P] fp32 logits HBM
    # round-trip; with P=128 = one key tile the online softmax runs a
    # single iteration, so the math is a plain fp32 max-subtracted softmax
    # (measured vs the dense XLA path in tests/test_packing.py).
    packed_flash: bool = True


@dataclass(frozen=True)
class GraphEncoderConfig:
    """GCN encoder over PrimeKG subgraphs (reference: tokenizer.py:13-45,84).

    ``num_nodes`` is the PrimeKG node-table size (hardcoded 130000 at
    tokenizer.py:84). in/hidden/out default to train_MedTok.py:363-365.
    """

    model_name: str = "GCN"  # "GCN" | "GAT"
    num_nodes: int = 130000
    in_channels: int = 64
    hidden_channels: int = 128
    out_channels: int = 64
    gat_num_heads: int = 4


@dataclass(frozen=True)
class QuantizerConfig:
    """Soft top-k VQ (reference: vector_quantization_soft_one_new.py:90-118;
    defaults from train_MedTok.py:367-376)."""

    codebook_size: int = 21000
    codebook_embed_dim: int = 64
    commit_loss_beta: float = 0.25
    entropy_loss_ratio: float = 0.0
    l2_norm: bool = True
    show_usage: bool = True
    top_k: int = 5
    num_heads: int = 4  # cross-attention heads (vq...py:105)
    cross_attn_layers: int = 2
    cross_attn_dropout: float = 0.1
    usage_buffer_size: int = 300000  # FIFO slots (vq...py:118)
    # --kmeans mode (train_MedTok.py:89-92): the reference constructs an
    # EmbeddingEMA codebook but never initializes or updates it
    # (vector_quantization_soft_one_new.py:109-111 — the codebook would
    # simply never train). Here the mode is COMPLETED: the codebook becomes
    # non-gradient EMA state (kmeans-initialized via
    # train.trainer.kmeans_init_codebook, norm-EMA-updated from the shared
    # path's top-1 assignments each train step, psum'd over dp).
    use_kmeans: bool = False
    codebook_ema_decay: float = 0.99  # norm_ema_quantizer.py:166 default
    # Dead-code revival for the EMA codebook (CVectorQuantiser anchor
    # mechanics, norm_ema_quantizer.py:374-397): codewords whose EMA
    # assignment probability decays toward zero are rewritten toward the
    # batch feature with the highest affinity ('closest' anchor). Measured
    # necessary at scale: without it the norm-EMA codebook's unassigned
    # rows stay frozen forever and on-chip usage collapses to ~2-3%
    # (docs/TRAIN_SUSTAINED_KMEANS.json baseline).
    codebook_revival: bool = False
    # distance+top-k sweep backend: 'auto' (pallas on TPU when the shape pays
    # off, see ops/vq._use_pallas), 'xla', or 'pallas'
    topk_backend: str = "auto"


@dataclass(frozen=True)
class ModelConfig:
    """MultimodalTokenizer assembly (reference: tokenizer.py:66-133)."""

    text: TextEncoderConfig = field(default_factory=TextEncoderConfig)
    graph: GraphEncoderConfig = field(default_factory=GraphEncoderConfig)
    quantizer: QuantizerConfig = field(default_factory=QuantizerConfig)
    max_text_length: int = 512  # train_MedTok.py:113
    # Reference runs the frozen BERT in train mode under no_grad, so dropout is
    # active during training (tokenizer.py:148-152). Off by default here —
    # deterministic frozen features; parity at eval is unaffected.
    text_dropout_in_train: bool = False
    # Compute dtype for the encoders (VQ distances are always fp32).
    compute_dtype: str = "bfloat16"

    @property
    def split(self) -> tuple[int, int]:
        """[text_dim, graph_dim] split of h (tokenizer.py:126)."""
        d = self.quantizer.codebook_embed_dim
        return (d, d)

    @property
    def embedding_dim(self) -> int:
        """Exported per-code embedding: 4 concatenated 64-d parts = 256."""
        return 4 * self.quantizer.codebook_embed_dim


@dataclass(frozen=True)
class DataConfig:
    """Static-shape bucketing for ragged per-code subgraphs.

    The reference pads text to max_length=512 always and batches ragged
    subgraphs via PyG Batch (dataset_creator.py:302-304). On TPU we bucket to
    a few static (max_nodes, max_edges, text_len) shapes so XLA compiles once
    per bucket.
    """

    kg_path: str = "Dataset/primeKG/"
    med_codes_pkg_map_path: str = "Dataset/medicalCode/all_codes_mappings.parquet"
    text_vocab_path: str = ""  # WordPiece vocab.txt (bert-base-uncased)
    max_text_length: int = 512
    text_buckets: tuple[int, ...] = (64, 128, 256, 512)
    node_buckets: tuple[int, ...] = (32, 128, 512)
    edge_buckets: tuple[int, ...] = (64, 512, 4096)
    edge_dropout_p: float = 0.1  # dataset_creator.py:155-170


@dataclass(frozen=True)
class TrainConfig:
    """Training hyperparameters (train_MedTok.py:345-400)."""

    epochs: int = 50
    lr: float = 1e-4
    beta1: float = 0.9
    beta2: float = 0.95
    weight_decay: float = 5e-2  # parsed by reference but Adam ignores it; kept
    max_grad_norm: float = 1.0
    global_batch_size: int = 1024
    global_seed: int = 0
    log_every: int = 1
    ckpt_every: int = 500
    max_checkpoints: int = 2
    mixed_precision: str = "bf16"  # 'none' | 'bf16' (fp16 scaler unneeded on TPU)
    shared_loss_beta: float = 0.1
    specific_loss_lamb: float = 0.1
    ema: bool = False
    ema_decay: float = 0.9999
    results_dir: str = "results"
    # Device mesh: data-parallel x model-parallel (codebook-row sharding).
    mesh_dp: int = -1  # -1 = all devices on dp
    mesh_tp: int = 1
    # Sequence-packed text encoding for the train step (data/packing.py):
    # shuffled batches pad to the longest bucket, so the frozen BERT wastes
    # ~3x tokens; packing shares fixed rows instead. Requires
    # text_dropout_in_train=False (the default).
    packed_text: bool = False
    packed_row_len: int = 128
    packed_rows_per_shard: int = 0   # 0 = auto from the first batch (+30%)


@dataclass(frozen=True)
class MedTokConfig:
    model: ModelConfig = field(default_factory=ModelConfig)
    data: DataConfig = field(default_factory=DataConfig)
    train: TrainConfig = field(default_factory=TrainConfig)

    # ---- args.json freezing contract ----
    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2)

    def save(self, path: str | Path) -> None:
        Path(path).write_text(self.to_json())

    @classmethod
    def from_dict(cls, d: dict[str, Any]) -> "MedTokConfig":
        def build(tp, val):
            if dataclasses.is_dataclass(tp) and isinstance(val, dict):
                fields = {f.name: f for f in dataclasses.fields(tp)}
                kwargs = {}
                for k, v in val.items():
                    if k not in fields:
                        continue
                    ft = fields[k].type
                    # resolve string annotations to the actual classes we know
                    resolved = _TYPE_REGISTRY.get(ft if isinstance(ft, str) else getattr(ft, "__name__", ""), None)
                    if resolved is not None and isinstance(v, dict):
                        kwargs[k] = build(resolved, v)
                    elif isinstance(v, list):
                        kwargs[k] = tuple(v)
                    else:
                        kwargs[k] = v
                return tp(**kwargs)
            return val

        return build(cls, d)

    @classmethod
    def load(cls, path: str | Path) -> "MedTokConfig":
        return cls.from_dict(json.loads(Path(path).read_text()))


_TYPE_REGISTRY = {
    "ModelConfig": ModelConfig,
    "DataConfig": DataConfig,
    "TrainConfig": TrainConfig,
    "TextEncoderConfig": TextEncoderConfig,
    "GraphEncoderConfig": GraphEncoderConfig,
    "QuantizerConfig": QuantizerConfig,
}
