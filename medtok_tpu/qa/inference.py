"""QA evaluation: soft-prompted generation + answer accuracy.

Equivalent of MedTok_QA_inference.py:19-218: appends ``num_miss_rows``
random frozen rows to the embedding table (:94-96), rebuilds the prefix
injection, generates with max_new_tokens=64 / temperature=0.4 / top_p=0.9
(:121-162), parses the answer letter and reports accuracy (:175-218).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from medtok_tpu.qa.finetune import QAFinetuner, _collate_rows
from medtok_tpu.qa.llama import LlamaModel, generate
from medtok_tpu.qa.prompting import accuracy, parse_answer


def extend_with_miss_rows(
    embeddings: np.ndarray, num_miss_rows: int = 100, seed: int = 0
) -> np.ndarray:
    """Frozen random rows for null/sentinel ids (MedTok_QA_inference.py:94-96)."""
    rng = np.random.default_rng(seed)
    miss = rng.normal(size=(num_miss_rows, embeddings.shape[-1])).astype(
        embeddings.dtype
    )
    return np.concatenate([embeddings, miss], axis=0)


def evaluate_qa(
    finetuner: QAFinetuner,
    params,
    rows: list[dict],
    labels: list[str],
    decode_fn: Callable[[np.ndarray], str],
    *,
    max_new_tokens: int = 64,
    temperature: float = 0.4,
    top_p: float = 0.9,
    eos_token_id: int | None = None,
    batch_size: int = 8,
    seed: int = 0,
) -> tuple[float, list[str]]:
    """rows: packed examples (prompt only — no answer tokens). Returns
    (accuracy, predictions)."""
    model: LlamaModel = finetuner.model
    sp = finetuner.soft_prompt
    llm_p, sp_p = params["llm"], params["soft_prompt"]
    cl = finetuner.cfg.cutoff_len

    def embed_fn(ids):
        return model.apply({"params": llm_p}, ids, method=LlamaModel.embed)

    preds: list[str] = []
    rng = jax.random.PRNGKey(seed)
    for start in range(0, len(rows), batch_size):
        chunk = rows[start:start + batch_size]
        batch = _collate_rows(chunk, cutoff_len=cl)
        packed = sp.apply(
            {"params": sp_p},
            jnp.asarray(batch["input_ids"]),
            jnp.asarray(batch["attention_mask"]),
            None,
            embed_fn,
            finetuner.cfg.total_len,
        )
        rng, sub = jax.random.split(rng)
        out_ids = generate(
            model, llm_p, packed.inputs_embeds, packed.attention_mask,
            max_new_tokens=max_new_tokens, temperature=temperature,
            top_p=top_p, eos_token_id=eos_token_id, rng=sub,
        )
        for i in range(len(chunk)):
            text = decode_fn(out_ids[i])
            preds.append(parse_answer(text, labels[start + i]))
    return accuracy(preds, labels[: len(preds)]), preds
