"""Full-vocabulary embedding export — the north-star benchmark path.

Reference: inference.py:24-141 — eval-forward every code, save
embeddings_all.npy [N, 256], tokens_all.npy [N, 4, k], weights_all.npy
[N, 4, k]. The reference's ordering bug (sorting every batch by the LAST
batch's indices, inference.py:119-121) is fixed by writing each batch's rows
directly at its code indices.

TPU design: one jitted eval step per bucket shape; batch axis sharded over
the 'dp' mesh axis (the 600K-code vocabulary sweep is the real scale axis of
this workload, SURVEY.md section 5.7); device->host copy overlapped by
dispatching batch i+1 before collecting batch i.
"""

from __future__ import annotations

from pathlib import Path


import jax
import numpy as np

from medtok_tpu.data.dataset import MedCodeDataset
from medtok_tpu.data.types import CodeBatch, TokenizedCodes
from medtok_tpu.models.tokenizer_model import MultimodalTokenizer
from medtok_tpu.parallel.mesh import batch_sharding, replicated


def make_eval_step(model: MultimodalTokenizer, params, usage, mesh=None):
    """Jitted eval forward: CodeBatch -> TokenizedCodes."""

    def eval_step(batch: CodeBatch) -> TokenizedCodes:
        return model.apply({"params": params, "usage": usage}, batch, train=False)

    if mesh is None:
        return jax.jit(eval_step)
    bspec = jax.tree.map(lambda _: batch_sharding(mesh), CodeBatch(*CodeBatch._fields))
    return jax.jit(
        eval_step,
        in_shardings=(bspec,),
        out_shardings=replicated(mesh),
    )


def export_all(
    model: MultimodalTokenizer,
    params,
    usage,
    dataset: MedCodeDataset,
    *,
    batch_size: int = 1024,
    mesh=None,
    out_dir: str | Path | None = None,
    prefetch: int = 2,
) -> dict[str, np.ndarray]:
    """Sweep the whole vocab; returns (and optionally saves) the artifacts."""
    n = len(dataset)
    cfg_k = model.cfg.quantizer.top_k
    emb_dim = model.cfg.embedding_dim
    embeddings = np.zeros((n, emb_dim), np.float32)
    tokens = np.zeros((n, 4, cfg_k), np.int32)
    weights = np.zeros((n, 4, cfg_k), np.float32)

    step = make_eval_step(model, params, usage, mesh)

    inflight: list[tuple[np.ndarray, TokenizedCodes]] = []

    def drain(item):
        idxs, out = item
        embeddings[idxs] = np.asarray(out.embedding)[: len(idxs)]
        tokens[idxs] = np.asarray(out.tokens)[: len(idxs)]
        weights[idxs] = np.asarray(out.weights)[: len(idxs)]

    for start in range(0, n, batch_size):
        idxs = np.arange(start, min(start + batch_size, n))
        # pad the tail batch to full size with repeats (static shapes)
        ids = idxs.tolist() + [int(idxs[-1])] * (batch_size - len(idxs))
        batch = dataset.make_batch(ids, aug_seed=None)
        out = step(batch)  # async dispatch
        inflight.append((idxs, out))
        if len(inflight) > prefetch:
            drain(inflight.pop(0))
    while inflight:
        drain(inflight.pop(0))

    arrays = {
        "embeddings_all": embeddings,
        "tokens_all": tokens,
        "weights_all": weights,
    }
    if out_dir is not None:
        out_dir = Path(out_dir)
        out_dir.mkdir(parents=True, exist_ok=True)
        for name, arr in arrays.items():
            np.save(out_dir / f"{name}.npy", arr)
    return arrays
