"""Medical-QA CLI — MedTok_fintune_llama3.py / MedTok_QA_inference.py
equivalents.

    python -m medtok_tpu.cli.qa finetune --data Dataset/MedicalQA/medmcqa_dataset.json \
        --embedding-path results/<exp>/embeddings_all.npy \
        --llama-checkpoint <hf-torch-state-dict.pt> --tokenizer <vocab-dir>
    python -m medtok_tpu.cli.qa eval --data Dataset/MedicalQA/Afrimedqa_dataset.json ...

Dataset JSON rows: {"input": [question, answer], "medical_codes": [...]}.
The LLM checkpoint is converted from a HF PyTorch state_dict
(qa.llama.convert_hf_llama); with --tiny a random tiny model runs the full
pipeline (smoke/offline mode).
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("mode", choices=["finetune", "eval"])
    p.add_argument("--data", type=str, required=True)
    p.add_argument("--embedding-path", type=str, required=True)
    p.add_argument("--llama-checkpoint", type=str, default=None)
    p.add_argument("--tokenizer-json", type=str, default=None,
                   help="HF tokenizer.json (Llama byte-level BPE); loaded by "
                        "the first-party qa.tokenizer.BPETokenizer — required "
                        "for real (non --tiny) runs")
    p.add_argument("--adapter-path", type=str, default="llama_lora_finetune")
    p.add_argument("--tiny", action="store_true",
                   help="random tiny LLM (offline smoke mode)")
    p.add_argument("--mesh-dp", type=int, default=1,
                   help="data-parallel axis for the finetune step")
    p.add_argument("--mesh-tp", type=int, default=1,
                   help="tensor-parallel axis sharding the frozen LLM "
                        "(8B bf16 does not fit one v5e chip)")
    p.add_argument("--lora-r", type=int, default=16)
    p.add_argument("--lora-alpha", type=float, default=32)
    p.add_argument("--cutoff-len", type=int, default=256)
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--epochs", type=int, default=1)
    p.add_argument("--lr", type=float, default=3e-4)
    p.add_argument("--num-miss-rows", type=int, default=100)
    p.add_argument("--max-new-tokens", type=int, default=64)
    p.add_argument("--temperature", type=float, default=0.4)
    p.add_argument("--top-p", type=float, default=0.9)
    return p


def _simple_tokenize(text: str, vocab_size: int) -> list[int]:
    """Hash-based fallback tokenizer for --tiny mode (no real LLM vocab)."""
    return [hash(w) % (vocab_size - 10) + 10 for w in text.split()][:200]


def main(argv=None) -> None:
    from medtok_tpu.utils.platform import apply_platform_env

    apply_platform_env()
    args = build_parser().parse_args(argv)

    import jax

    from medtok_tpu.qa.finetune import QAFinetuneConfig, QAFinetuner
    from medtok_tpu.qa.inference import evaluate_qa, extend_with_miss_rows
    from medtok_tpu.qa.llama import LLAMA31_8B, TINY_LLAMA, convert_hf_llama
    from medtok_tpu.qa.prompting import build_prompt, pack_example
    from medtok_tpu.utils.logging import create_logger

    logger = create_logger(None)
    rows_json = json.loads(Path(args.data).read_text())
    embeddings = extend_with_miss_rows(
        np.load(args.embedding_path), num_miss_rows=args.num_miss_rows
    )

    llm_cfg = TINY_LLAMA if args.tiny else LLAMA31_8B
    total_len = args.cutoff_len + (64 if args.tiny else 256)
    cfg = QAFinetuneConfig(
        lora_rank=args.lora_r, lora_alpha=args.lora_alpha,
        cutoff_len=args.cutoff_len, total_len=total_len,
        lr=args.lr, batch_size=args.batch_size, epochs=args.epochs,
        mesh_dp=args.mesh_dp, mesh_tp=args.mesh_tp,
    )
    ft = QAFinetuner(llm_cfg, embeddings, cfg)

    llm_params = None
    if args.llama_checkpoint:
        import torch

        logger.info(f"Converting LLM weights from {args.llama_checkpoint}")
        sd = torch.load(args.llama_checkpoint, map_location="cpu")
        llm_params = convert_hf_llama(sd, ft.llm_cfg)
    params = ft.init_params(llm_params)

    # the real tokenizer + Llama-3 chat template; the hash stub stays only
    # for --tiny runs without a tokenizer file (random vocab anyway)
    tokenizer = None
    if args.tokenizer_json:
        from medtok_tpu.qa.tokenizer import BPETokenizer

        tokenizer = BPETokenizer.from_file(args.tokenizer_json)
        chat_template = tokenizer.chat_template_fn
        eos_id = tokenizer.eos_token_id
        encode = tokenizer.encode
        decode = lambda ids: tokenizer.decode(ids, skip_special_tokens=True)
    elif args.tiny:
        chat_template, eos_id = None, None
        encode = lambda text: _simple_tokenize(text, llm_cfg.vocab_size)
        decode = lambda ids: " ".join(str(i) for i in ids)
    else:
        raise SystemExit(
            "--tokenizer-json is required for non --tiny runs "
            "(the 128K-token Llama vocab cannot be faked)"
        )

    packed, labels = [], []
    for r in rows_json:
        q, a = r["input"][0], r["input"][1]
        prompt = build_prompt(q, chat_template=chat_template)
        if args.mode == "finetune" and chat_template is not None:
            prompt += f"\n{a}"  # MedTok_fintune_llama3.py:128-131
            prompt_ids, answer_ids = encode(prompt), []
        else:
            prompt_ids = encode(prompt)
            answer_ids = encode(str(a)) if args.mode == "finetune" else []
        packed.append(pack_example(
            prompt_ids, answer_ids, r["medical_codes"],
            cutoff_len=args.cutoff_len, eos_token_id=eos_id,
        ))
        labels.append(str(a))

    if args.mode == "finetune":
        logger.info(f"Finetuning on {len(packed)} examples")
        params = ft.fit(
            params, packed,
            log_fn=lambda s, l: logger.info(f"step {s}: loss {l:.4f}"),
        )
        out = Path(args.adapter_path)
        out.mkdir(parents=True, exist_ok=True)
        np.save(out / "projector.npy",
                np.asarray(jax.device_get(
                    params["soft_prompt"]["projector"]["kernel"])))
        import pickle

        with open(out / "lora_params.pkl", "wb") as f:
            pickle.dump(jax.device_get(params), f)
        logger.info(f"Saved adapter to {out}")
    else:
        acc, preds = evaluate_qa(
            ft, params, packed, labels,
            decode_fn=decode,
            max_new_tokens=args.max_new_tokens,
            temperature=args.temperature, top_p=args.top_p,
            batch_size=args.batch_size,
        )
        logger.info(f"Accuracy: {acc}")


if __name__ == "__main__":
    main()
