"""Public per-code API: tokenize / encode / embed.

Parity surface with the reference README (README.md:47-54):

    tok = MedTok(config, params, dataset)          # or MedTok.from_checkpoint
    tokens = tok.tokenize("E11.9")   # [4, k] token ids
    ids    = tok.encode("E11.9")     # flat [4*k] ids
    embed  = tok.embed("E11.9")      # [256] embedding
"""

from __future__ import annotations

from pathlib import Path

import jax
import numpy as np

from medtok_tpu.config import MedTokConfig
from medtok_tpu.data.dataset import MedCodeDataset, collate
from medtok_tpu.data.types import TokenizedCodes
from medtok_tpu.models.tokenizer_model import MultimodalTokenizer


class MedTok:
    def __init__(self, cfg: MedTokConfig, params, usage, dataset: MedCodeDataset):
        self.cfg = cfg
        self.model = MultimodalTokenizer(cfg.model)
        self.params = params
        self.usage = usage
        self.dataset = dataset
        self._step = jax.jit(
            lambda batch: self.model.apply(
                {"params": params, "usage": usage}, batch, train=False
            )
        )

    @classmethod
    def from_checkpoint(cls, workdir: str | Path, dataset: MedCodeDataset) -> "MedTok":
        """Rebuild the exact trained model from a training workdir
        (args.json + latest checkpoint; inference.py:30-66 contract)."""
        from medtok_tpu.train.trainer import create_train_state
        from medtok_tpu.utils.checkpoint import CheckpointManager

        cfg = CheckpointManager.load_config(workdir)
        model = MultimodalTokenizer(cfg.model)
        sample = collate([dataset[0]], dataset.cfg, pad_id=dataset.tokenizer.pad_id)
        state = create_train_state(cfg, model, jax.tree.map(jax.numpy.asarray, sample))
        mgr = CheckpointManager(workdir, max_to_keep=cfg.train.max_checkpoints)
        state = mgr.restore(state)
        return cls(cfg, state.params, state.usage, dataset)

    def _run(self, med_code: str) -> TokenizedCodes:
        idx = self.dataset.lookup(med_code)
        batch = collate(
            [self.dataset[idx]], self.dataset.cfg,
            pad_id=self.dataset.tokenizer.pad_id,
        )
        return self._step(batch)

    def tokenize(self, med_code: str) -> np.ndarray:
        """[4, k] discrete token ids (rows: text, graph, shared-text,
        shared-graph; specific rows are region-local ids)."""
        return np.asarray(self._run(med_code).tokens[0])

    def encode(self, med_code: str) -> np.ndarray:
        """Flat [4*k] token id sequence."""
        return self.tokenize(med_code).reshape(-1)

    def embed(self, med_code: str) -> np.ndarray:
        """[256] quantized embedding (cat of the 4 paths, tokenizer.py:246)."""
        return np.asarray(self._run(med_code).embedding[0])

    def tokenize_batch(self, med_codes: list[str]) -> TokenizedCodes:
        """Batched variant: (embeddings [N,256], tokens [N,4,k], weights)."""
        idxs = [self.dataset.lookup(c) for c in med_codes]
        batch = self.dataset.make_batch(idxs)
        out = self._step(batch)
        return TokenizedCodes(
            np.asarray(out.embedding), np.asarray(out.tokens),
            np.asarray(out.weights),
        )


class PretrainedMedTok:
    """Artifact-only API: serve tokenize/encode/embed from the exported
    .npy files — no model weights or KG needed. This is how most reference
    users consume MedTok (README.md:56: download embeddings, drop into
    'MedTok/embedding.npy'); the code->row mapping comes from the same
    all_codes_mappings.parquet vocabulary.
    """

    def __init__(
        self,
        export_dir: str | Path,
        med_codes_pkg_map_path: str | Path,
    ):
        export_dir = Path(export_dir)
        self.embeddings = np.load(export_dir / "embeddings_all.npy")
        tok_path = export_dir / "tokens_all.npy"
        self.tokens = np.load(tok_path) if tok_path.exists() else None
        w_path = export_dir / "weights_all.npy"
        self.weights = np.load(w_path) if w_path.exists() else None

        import pandas as pd

        df = pd.read_parquet(med_codes_pkg_map_path, columns=["med_code"])
        self._index: dict[str, int] = {}
        for i, c in enumerate(df["med_code"].astype(str)):
            self._index.setdefault(c, i)

    def lookup(self, med_code: str) -> int:
        if med_code not in self._index:
            raise KeyError(f"unknown medical code {med_code!r}")
        return self._index[med_code]

    def embed(self, med_code: str) -> np.ndarray:
        return self.embeddings[self.lookup(med_code)]

    def tokenize(self, med_code: str) -> np.ndarray:
        assert self.tokens is not None, "tokens_all.npy not exported"
        return self.tokens[self.lookup(med_code)]

    def encode(self, med_code: str) -> np.ndarray:
        return self.tokenize(med_code).reshape(-1)
