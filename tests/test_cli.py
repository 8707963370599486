"""End-to-end CLI smoke tests: train 2 steps -> export -> EHR run -> QA tiny
finetune+eval, all on synthetic fixtures, exercising the args.json contract."""

import json
import subprocess
import sys

import numpy as np
import pytest


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    d = tmp_path_factory.mktemp("cli")
    rng = np.random.default_rng(0)
    from medtok_tpu.data.synthetic import synthetic_code_vocab, synthetic_kg_csv
    from medtok_tpu.data.text import make_test_vocab

    (d / "primeKG").mkdir()
    synthetic_kg_csv(str(d / "primeKG" / "kg.csv"), rng, num_nodes=300,
                     num_edges=2000)
    synthetic_code_vocab(str(d / "codes.parquet"), rng, num_codes=40,
                         num_nodes=300)
    vocab = make_test_vocab(
        ["diabetes", "mellitus", "acute", "chronic", "infection", "fracture",
         "hypertension", "renal", "cardiac", "therapy", "syndrome", "disorder"]
    )
    with open(d / "vocab.txt", "w") as f:
        for w in sorted(vocab, key=vocab.get):
            f.write(w + "\n")
    return d


def _run(mod, *args):
    # MEDTOK_COMPILE_CACHE: persistent XLA cache shared by every CLI
    # subprocess (and across suite runs on the same box) — the CLIs compile
    # identical tiny programs, and cold compiles dominated this file's wall
    # time (2400 s worst case on a contended single-core box)
    return subprocess.run(
        [sys.executable, "-m", mod, *args],
        capture_output=True, text=True, timeout=2400,
        env={**__import__("os").environ, "JAX_PLATFORMS": "cpu",
             "MEDTOK_COMPILE_CACHE": "/tmp/medtok_xla_cache"},
    )


def test_train_then_export_cli(workspace):
    d = workspace
    r = _run(
        "medtok_tpu.cli.train",
        "--kg-path", str(d / "primeKG"),
        "--med-codes-pkg-map-path", str(d / "codes.parquet"),
        "--text-vocab", str(d / "vocab.txt"),
        "--results-dir", str(d / "results"),
        "--global-batch-size", "8",
        "--codebook-size", "90",
        "--codebook-embed-dim", "16",
        "--graph-in-channels", "8", "--graph-hidden-channels", "16",
        "--text-layers", "2", "--text-hidden", "32", "--text-heads", "4",
        "--text-intermediate", "64", "--text-vocab-size", "200",
        "--kg-num-nodes", "300",
        "--graph-out-channels", "16",
        "--epochs", "1", "--max-steps", "2", "--ckpt-every", "2",
        "--mesh-dp", "1", "--mixed-precision", "none",
    )
    assert r.returncode == 0, r.stderr[-3000:]
    exps = list((d / "results").iterdir())
    assert len(exps) == 1
    workdir = exps[0]
    assert (workdir / "args.json").exists()
    assert (workdir / "metrics.jsonl").exists()
    ckpts = list((workdir / "checkpoints").iterdir())
    assert ckpts, "no checkpoint written"

    # the train CLI builds a BERT-base text encoder by default — too slow to
    # export on 1 CPU core; patch args.json to the tiny text config used in
    # training? The CLI used defaults for text. Export with batch 8.
    r2 = _run(
        "medtok_tpu.cli.export",
        "--workdir", str(workdir),
        "--batch-size", "8",
        "--mesh-dp", "1",
    )
    assert r2.returncode == 0, r2.stderr[-3000:]
    emb = np.load(workdir / "embeddings_all.npy")
    toks = np.load(workdir / "tokens_all.npy")
    assert emb.shape == (40, 64)  # 4 * codebook_embed_dim(16)
    assert toks.shape == (40, 4, 5)
    # vocab-order export: every row written (no all-zero rows since l2-normed
    # codewords are mixed in)
    assert np.abs(emb).sum(axis=1).min() > 0


def test_ehr_cli(workspace, tmp_path):
    d = workspace
    from medtok_tpu.ehr.synthetic import synthetic_mimic3
    from medtok_tpu.ehr.tasks import CodeMapper

    mapper = CodeMapper(d / "codes.parquet")
    codes = [str(c) for c in mapper.df["med_code"]]
    root = tmp_path / "ehr"
    synthetic_mimic3(root / "MIMIC_III", codes, num_patients=40, seed=1)
    emb = np.random.default_rng(2).normal(size=(len(mapper), 256))
    np.save(tmp_path / "emb.npy", emb.astype(np.float32))

    common = [
        "--dataset", "MIMIC_III", "--task", "readmission",
        "--ehr-root", str(root),
        "--med-codes", str(d / "codes.parquet"),
        "--embedding-path", str(tmp_path / "emb.npy"),
        "--batch-size", "8", "--epochs", "2",
        "--hidden-dim", "32", "--num-layers", "1", "--num-heads", "2",
        "--input-dim", "16", "--output-dim", "16",
        "--max-visits", "5", "--max-medical-code", "50",
        "--mesh-dp", "1",
    ]
    r = _run(
        "medtok_tpu.cli.ehr", *common,
        "--save-result-path", str(tmp_path / "res"),
    )
    assert r.returncode == 0, r.stderr[-3000:]
    tm = json.loads((tmp_path / "res" / "test_metrics.json").read_text())
    assert {"auc", "aupr", "f1"} <= set(tm["test"])
    assert (tmp_path / "res" / "best_model").exists()
    assert (tmp_path / "res" / "metrics.jsonl").exists()

    # tiny hyperparameter sweep through the same driver (hyper_search_,
    # MedTok_EHR.py:246-271)
    r2 = _run(
        "medtok_tpu.cli.ehr", *common,
        "--save-result-path", str(tmp_path / "res_grid"),
        "--hyper-search", "--search-grid", '{"dropout": [0.1, 0.5]}',
    )
    assert r2.returncode == 0, r2.stderr[-3000:]
    hs = json.loads((tmp_path / "res_grid" / "hyper_search.json").read_text())
    assert len(hs["results"]) == 2
    assert hs["results"][0]["best_val"]["aupr"] >= hs["results"][1]["best_val"]["aupr"]


def test_qa_cli_real_tokenizer(workspace, tmp_path):
    """cli.qa through the REAL BPE tokenizer + Llama-3 chat template
    (--tokenizer-json), tiny random LLM: finetune then eval produce an
    adapter and an accuracy line through the full decode path."""
    tokenizers = pytest.importorskip("tokenizers")
    from tokenizers import Tokenizer, decoders, models, pre_tokenizers, trainers

    tok = Tokenizer(models.BPE())
    tok.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False)
    tok.decoder = decoders.ByteLevel()
    trainer = trainers.BpeTrainer(
        vocab_size=500,  # < TINY_LLAMA.vocab_size=512 so ids stay in range
        special_tokens=["<|begin_of_text|>", "<|end_of_text|>",
                        "<|start_header_id|>", "<|end_header_id|>",
                        "<|eot_id|>"],
        initial_alphabet=pre_tokenizers.ByteLevel.alphabet(),
    )
    corpus = ["medical question about diabetes", "Answer: A", "Answer: B",
              "acute renal failure", "insulin or metformin therapy"]
    tok.train_from_iterator(corpus * 4, trainer)
    tok.save(str(tmp_path / "tokenizer.json"))

    emb = np.random.default_rng(1).normal(size=(40, 256)).astype(np.float32)
    np.save(tmp_path / "emb.npy", emb)
    rows = [
        {"input": [f"question {i}?", "A"], "medical_codes": [i % 40]}
        for i in range(8)
    ]
    (tmp_path / "qa.json").write_text(json.dumps(rows))
    common = [
        "--data", str(tmp_path / "qa.json"),
        "--embedding-path", str(tmp_path / "emb.npy"),
        "--tiny", "--tokenizer-json", str(tmp_path / "tokenizer.json"),
        "--cutoff-len", "8", "--batch-size", "4", "--lora-r", "2",
    ]
    r = _run("medtok_tpu.cli.qa", "finetune", *common,
             "--adapter-path", str(tmp_path / "adapter"))
    assert r.returncode == 0, r.stderr[-3000:]
    assert (tmp_path / "adapter" / "lora_params.pkl").exists()

    r2 = _run("medtok_tpu.cli.qa", "eval", *common, "--max-new-tokens", "2")
    assert r2.returncode == 0, r2.stderr[-3000:]
    assert "Accuracy:" in r2.stdout + r2.stderr


def test_qa_cli_tiny(workspace, tmp_path):
    d = workspace
    emb = np.random.default_rng(1).normal(size=(40, 256)).astype(np.float32)
    np.save(tmp_path / "emb.npy", emb)
    rows = [
        {"input": [f"question {i}?", "A"], "medical_codes": [i % 40]}
        for i in range(8)
    ]
    (tmp_path / "qa.json").write_text(json.dumps(rows))
    r = _run(
        "medtok_tpu.cli.qa", "finetune",
        "--data", str(tmp_path / "qa.json"),
        "--embedding-path", str(tmp_path / "emb.npy"),
        "--tiny", "--cutoff-len", "8", "--batch-size", "4", "--lora-r", "2",
        "--adapter-path", str(tmp_path / "adapter"),
    )
    assert r.returncode == 0, r.stderr[-3000:]
    assert (tmp_path / "adapter" / "lora_params.pkl").exists()

    r2 = _run(
        "medtok_tpu.cli.qa", "eval",
        "--data", str(tmp_path / "qa.json"),
        "--embedding-path", str(tmp_path / "emb.npy"),
        "--tiny", "--cutoff-len", "8", "--batch-size", "4", "--lora-r", "2",
        "--max-new-tokens", "2",
    )
    assert r2.returncode == 0, r2.stderr[-3000:]
    assert "Accuracy:" in r2.stdout + r2.stderr
