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
    packed: bool = False,
) -> dict[str, np.ndarray]:
    """Sweep the whole vocab; returns (and optionally saves) the artifacts.

    ``packed=True`` routes the text encoder through sequence packing
    (data/packing.py): ~20% faster end-to-end at 600K scale, token-identical
    outputs (tested)."""
    if packed:
        return _export_all_packed(
            model, params, usage, dataset, mesh=mesh, out_dir=out_dir,
            prefetch=prefetch,
        )
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


def _export_all_packed(
    model: MultimodalTokenizer,
    params,
    usage,
    dataset: MedCodeDataset,
    *,
    mesh=None,
    out_dir: str | Path | None = None,
    prefetch: int = 2,
    row_len: int | None = None,
    num_rows: int | None = None,
) -> dict[str, np.ndarray]:
    """Sequence-packed sweep: length-sorted descriptions share fixed
    [num_rows, row_len] BERT rows (one compiled text-encoder shape,
    block-diagonal masks, zero intra-row padding); the quantizer tail runs
    at bucketed code counts. Output rows land at their code indices, so
    artifacts are identical to the unpacked sweep."""
    import jax.numpy as jnp

    from medtok_tpu.data.compact import derive_packed_meta, unpack_compact
    from medtok_tpu.data.packing import take_group
    from medtok_tpu.parallel.mesh import batch_sharding, replicated

    n = len(dataset)
    cfg_k = model.cfg.quantizer.top_k
    emb_dim = model.cfg.embedding_dim
    lmax = max(dataset.cfg.text_buckets)
    if row_len is None:
        row_len = max(128, lmax)     # a row must hold the longest text
    if num_rows is None:
        num_rows = max(32768 // row_len, 8)   # ~32K tokens per device step
    if lmax > row_len:
        raise ValueError(f"text bucket {lmax} exceeds pack row_len {row_len}")
    embeddings = np.zeros((n, emb_dim), np.float32)
    tokens = np.zeros((n, 4, cfg_k), np.int32)
    weights = np.zeros((n, 4, cfg_k), np.float32)

    c_buckets = [c for c in (64, 128, 256, 512, 1024, 2048, 4096) if c <= 4 * n]
    if not c_buckets or c_buckets[-1] < min(n, 4096):
        # fallback bucket for tiny vocabs must stay divisible by the mesh
        # size or the dp-sharded quant_step can't lay out its inputs
        q = mesh.size if mesh is not None else 8
        c_buckets.append(min(-(-max(n, 8) // q) * q, 4096))

    def c_bucket(m):
        for c in c_buckets:
            if m <= c:
                return c
        return c_buckets[-1]

    cmax = c_buckets[-1]
    tdt = jnp.int16 if model.cfg.text.vocab_size < 32768 else jnp.int32

    def bert_fn(ids, flat_base, tlens):
        # seg/pos (and the pairwise same-code mask) derived ON DEVICE from
        # the two per-code vectors — the host ships int16 token rows + ~16 KB
        # of metadata instead of ~0.4 MB/step of index arrays
        R2, P2 = ids.shape
        seg, pos, _, _ = derive_packed_meta(
            flat_base, tlens, num_rows=R2, row_len=P2, lmax=1
        )
        return model.apply(
            {"params": params}, ids.astype(jnp.int32), seg, pos,
            method=MultimodalTokenizer.encode_text_packed,
        )

    def quant_fn(flat, flat_base, tlens, cb):
        # compact batch (pooled buffers, 3x fewer h2d bytes) expands on
        # device; XLA fuses the shifts/masks into the GCN consumers
        _, _, gidx, tmask = derive_packed_meta(
            flat_base, tlens, num_rows=1, row_len=1, lmax=lmax
        )
        return model.apply(
            {"params": params, "usage": usage}, flat, gidx, tmask,
            unpack_compact(cb),
            method=MultimodalTokenizer.tokenize_from_hidden,
        )

    if mesh is None:
        bert_step = jax.jit(bert_fn)
        quant_step = jax.jit(quant_fn)
    else:
        bs = batch_sharding(mesh)
        rep = replicated(mesh)
        bert_step = jax.jit(bert_fn, in_shardings=(bs, bs, bs),
                            out_shardings=rep)

        def quant_jit_for(example_cb):
            bspec = jax.tree.map(lambda _: bs, example_cb)
            return jax.jit(
                quant_fn, in_shardings=(rep, bs, bs, bspec),
                out_shardings=rep,
            )

        # in_shardings must mirror the batch pytree, and make_batch_compact's
        # tree STRUCTURE varies with the node bucket (outdeg is None below the
        # stream threshold, an array at/above it) — so the jitted step is
        # keyed by treedef, not built once from the first batch.
        quant_steps: dict = {}
        quant_step = None

    dataset.warm_cache(tokenize=True)
    lens = dataset.text_lengths(0, n)
    order = np.argsort(lens, kind="stable")

    inflight: list[tuple[np.ndarray, TokenizedCodes]] = []

    def drain(item):
        idxs, out = item
        embeddings[idxs] = np.asarray(out.embedding)[: len(idxs)]
        tokens[idxs] = np.asarray(out.tokens)[: len(idxs)]
        weights[idxs] = np.asarray(out.weights)[: len(idxs)]

    i = 0
    while i < n:
        j = take_group(lens, order, i, row_len=row_len, num_rows=num_rows,
                       max_codes=c_buckets[-1])
        group = order[i:j]
        i = j
        C = c_bucket(len(group))
        pad = np.repeat(group[-1:], C - len(group))
        idxs = np.concatenate([group, pad])
        # store-direct pack: rows gathered straight from the text-store
        # arena, no per-code python arrays (data/packing.py::pack_store_meta)
        ids_np, base_np, lens_np = dataset.pack_text_rows(
            group, row_len=row_len, num_rows=num_rows,
        )
        base_c = np.concatenate(
            [base_np, np.repeat(base_np[-1:], C - len(group))])
        lens_c = np.concatenate(
            [lens_np, np.repeat(lens_np[-1:], C - len(group))])
        base_m = np.concatenate(
            [base_np, np.repeat(base_np[-1:], cmax - len(group))])
        lens_m = np.concatenate(
            [lens_np, np.repeat(lens_np[-1:], cmax - len(group))])
        batch, fence = dataset.make_batch_compact(
            [int(x) for x in idxs], aug_seed=None, want_text=False
        )
        if mesh is not None:
            tdef = jax.tree.structure(batch)
            quant_step = quant_steps.get(tdef)
            if quant_step is None:
                quant_step = quant_steps[tdef] = quant_jit_for(batch)
        flat = bert_step(jnp.asarray(ids_np.astype(np.dtype(tdt))),
                         jnp.asarray(base_m), jnp.asarray(lens_m))
        out = quant_step(flat, jnp.asarray(base_c), jnp.asarray(lens_c),
                         batch)
        # fence on the step output: on this platform h2d copies complete
        # behind already-queued compute, so an input-transfer fence waits
        # LONGER than the output fence (measured 39.7 -> 66.7 s on the
        # bench sweep when switched to device_put input fences)
        fence.set_fence(out.embedding)
        inflight.append((group, out))
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
