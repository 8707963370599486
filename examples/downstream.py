"""Downstream quickstart: MedTok embeddings -> EHR outcomes + medical QA.

Runs the two consumer pipelines end-to-end on synthetic fixtures (no
downloads, CPU-friendly), mirroring the reference tutorials
(MedTok_EHR_Tutorial/MedTok_EHR.py, MedTok_QA_Tutorial/MedTok_fintune_llama3.py):

    JAX_PLATFORMS=cpu python examples/downstream.py

Real data: run `python -m medtok_tpu.cli.export` first, then point
`--embedding-path` of cli.ehr / cli.qa at the exported embeddings_all.npy.
"""

import os
import sys
import tempfile
from pathlib import Path

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))  # repo root

import numpy as np

from medtok_tpu.utils.platform import apply_platform_env

apply_platform_env()


def run_ehr(work: Path, rng: np.random.Generator) -> None:
    from medtok_tpu.data.synthetic import synthetic_code_vocab
    from medtok_tpu.ehr.parsers import MIMIC3Dataset
    from medtok_tpu.ehr.synthetic import synthetic_mimic3
    from medtok_tpu.ehr.tasks import CodeMapper, PatientEHRTasks, build_labels
    from medtok_tpu.ehr.train import (
        EHRTrainConfig,
        EHRTrainer,
        prepare_task_features,
        sample_weights,
        stratified_split,
    )

    print("== EHR: synthetic MIMIC-III readmission ==")
    synthetic_code_vocab(work / "codes.parquet", rng, num_codes=60, num_nodes=300)
    mapper = CodeMapper(work / "codes.parquet")
    synthetic_mimic3(work / "MIMIC_III",
                     [str(c) for c in mapper.df["med_code"]],
                     num_patients=100, seed=2)
    db = MIMIC3Dataset(work / "MIMIC_III")
    tasks = PatientEHRTasks(db.patients, mapper, dataset="MIMIC_III")
    data = [s for s in tasks.build("readmission") if s and s[0]["label"] is not None]
    labels, nc = build_labels(data, "readmission")
    feats, fz = prepare_task_features(
        data, labels, nc, "readmission", vocab_size=len(mapper),
        max_visits=5, max_medical_code=32,
    )
    tr, va, te = stratified_split(labels, "readmission")
    w = sample_weights(labels, "readmission")

    # stand-in for the exported embeddings_all.npy
    table = rng.standard_normal((len(mapper), 256)).astype(np.float32)
    trainer = EHRTrainer(
        EHRTrainConfig(task="readmission", batch_size=8, epochs=3,
                       num_layers=1, hidden_dim=32, num_heads=2,
                       input_dim=16, output_dim=16, max_visits=5,
                       max_medical_code=32),
        table, nc,
    )
    val = [fz.collate([feats[i] for i in va])]
    params, best = trainer.fit(
        [feats[i] for i in tr], w[tr], val, fz,
        log_fn=lambda e, m: print(f"  epoch {e}: loss {m['loss']:.3f} "
                                  f"val {m['val']}"),
    )
    test = trainer.evaluate(params, [fz.collate([feats[i] for i in te])])
    print(f"  test: {test}")


def run_qa(work: Path, rng: np.random.Generator) -> None:
    from medtok_tpu.qa.finetune import QAFinetuneConfig, QAFinetuner
    from medtok_tpu.qa.inference import evaluate_qa, extend_with_miss_rows
    from medtok_tpu.qa.llama import TINY_LLAMA
    from medtok_tpu.qa.prompting import build_prompt, pack_example

    print("== QA: tiny Llama + LoRA soft-prompt finetune ==")
    emb = extend_with_miss_rows(
        rng.standard_normal((60, 256)).astype(np.float32), num_miss_rows=10
    )
    ft = QAFinetuner(
        TINY_LLAMA, emb,
        QAFinetuneConfig(lora_rank=2, cutoff_len=8, total_len=40,
                         batch_size=4, epochs=1),
    )
    params = ft.init_params(None)

    def encode(text):  # hash stub — real runs load a Llama tokenizer.json
        return [hash(w) % 500 + 10 for w in text.split()][:24]

    rows, labels = [], []
    for i in range(8):
        q, a = f"question about code {i}?", "A"
        rows.append(pack_example(encode(build_prompt(q)), encode(a),
                                 [i % 60], cutoff_len=8))
        labels.append(a)
    params = ft.fit(params, rows,
                    log_fn=lambda s, l: print(f"  step {s}: loss {l:.3f}"))
    acc, preds = evaluate_qa(
        ft, params, rows, labels,
        decode_fn=lambda ids: " ".join(str(i) for i in ids),
        max_new_tokens=2, batch_size=4,
    )
    print(f"  eval ran on {len(preds)} questions (accuracy vs letter "
          f"labels: {acc:.2f} — random weights)")


def main() -> None:
    work = Path(tempfile.mkdtemp(prefix="medtok_downstream_"))
    rng = np.random.default_rng(0)
    run_ehr(work, rng)
    run_qa(work, rng)
    print(f"artifacts in {work}")


if __name__ == "__main__":
    main()
