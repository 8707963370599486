"""End-to-end quickstart on synthetic data (no downloads, CPU-friendly).

Builds a reference-schema vocabulary + PrimeKG, trains the tokenizer a few
steps, exports embeddings/tokens, and exercises both API surfaces:

    JAX_PLATFORMS=cpu python examples/quickstart.py

(Real data: point --kg-path / --med-codes-pkg-map-path of the CLIs at
PrimeKG's kg.csv and all_codes_mappings.parquet, and pass a real
bert-base-uncased vocab.txt + checkpoint.)
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


def main() -> None:
    import jax

    from medtok_tpu.api import MedTok, PretrainedMedTok
    from medtok_tpu.config import (
        DataConfig,
        GraphEncoderConfig,
        MedTokConfig,
        ModelConfig,
        QuantizerConfig,
        TextEncoderConfig,
        TrainConfig,
    )
    from medtok_tpu.data.dataset import MedCodeDataset, epoch_batches
    from medtok_tpu.data.synthetic import synthetic_code_vocab, synthetic_kg_csv
    from medtok_tpu.data.text import WordPieceTokenizer, make_test_vocab
    from medtok_tpu.export.export import export_all
    from medtok_tpu.train.trainer import Trainer

    work = Path(tempfile.mkdtemp(prefix="medtok_quickstart_"))
    rng = np.random.default_rng(0)
    (work / "primeKG").mkdir()
    synthetic_kg_csv(work / "primeKG" / "kg.csv", rng, num_nodes=300, num_edges=2000)
    synthetic_code_vocab(work / "codes.parquet", rng, num_codes=40, num_nodes=300)
    tokenizer = WordPieceTokenizer(make_test_vocab(
        ["diabetes", "mellitus", "acute", "chronic", "infection", "fracture",
         "hypertension", "renal", "cardiac", "therapy", "syndrome", "disorder"]
    ))

    cfg = MedTokConfig(
        model=ModelConfig(
            text=TextEncoderConfig(vocab_size=200, hidden_size=32, num_layers=2,
                                   num_heads=4, intermediate_size=64),
            graph=GraphEncoderConfig(num_nodes=300, in_channels=8,
                                     hidden_channels=16, out_channels=16),
            quantizer=QuantizerConfig(codebook_size=90, codebook_embed_dim=16,
                                      usage_buffer_size=4096),
            compute_dtype="float32",
        ),
        data=DataConfig(kg_path=str(work / "primeKG"),
                        med_codes_pkg_map_path=str(work / "codes.parquet")),
        train=TrainConfig(global_batch_size=8, mesh_dp=1, ckpt_every=5),
    )
    dataset = MedCodeDataset(cfg.data.kg_path, cfg.data.med_codes_pkg_map_path,
                             tokenizer, cfg=cfg.data)

    print(f"== training 5 steps on {len(dataset)} synthetic codes ==")
    trainer = Trainer(cfg, workdir=str(work / "exp"),
                      log_fn=lambda s, m: print(f"  step {s}: loss {m['loss']:.3f}"))
    state = trainer.init_state(next(iter(epoch_batches(dataset, batch_size=8))))
    state = trainer.fit(state, epoch_batches(dataset, batch_size=8), max_steps=5)

    print("== exporting embeddings/tokens ==")
    arrays = export_all(trainer.model, state.params, state.usage, dataset,
                        batch_size=8, out_dir=work / "exp")
    print(f"  embeddings_all {arrays['embeddings_all'].shape}, "
          f"tokens_all {arrays['tokens_all'].shape}")

    code = dataset.code_at(3)
    print(f"== live API on {code!r} ==")
    api = MedTok(cfg, state.params, state.usage, dataset)
    print(f"  tokens:\n{api.tokenize(code)}")
    print(f"  embedding[:6]: {api.embed(code)[:6]}")

    print("== artifact-only API (published-embeddings path) ==")
    pre = PretrainedMedTok(work / "exp", work / "codes.parquet")
    assert np.allclose(pre.embed(code), api.embed(code), atol=2e-3)
    print(f"  PretrainedMedTok.embed == MedTok.embed for {code!r}: OK")
    print(f"artifacts in {work}")


if __name__ == "__main__":
    main()
