"""Checkpoint save/restore with rotation and the args.json freezing contract.

Reference semantics (train_MedTok.py:57, 300-333; inference.py:30-37):
- config dumped once as ``args.json`` next to the checkpoints
- a checkpoint every ``ckpt_every`` steps, rotated to ``max_checkpoints``
- restore brings back model params, optimizer state, EMA, and step.

Implemented on orbax PyTreeCheckpointer — step-granular resumable state
{params, opt_state, usage FIFO, ema, step} (SURVEY.md section 5.4).
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any

import jax
import orbax.checkpoint as ocp
from jax.numpy import asarray as jnp_asarray


class CheckpointManager:
    def __init__(
        self, workdir: str | Path, *, max_to_keep: int = 2, config=None,
        mirror_dir: str | Path | None = None,
    ):
        """``mirror_dir``: secondary location every checkpoint is copied to,
        un-rotated — the reference's cloud-path copy (train_MedTok.py:330-332,
        where local checkpoints rotate but the cloud copy keeps all)."""
        self.workdir = Path(workdir)
        self.ckpt_dir = self.workdir / "checkpoints"
        self.ckpt_dir.mkdir(parents=True, exist_ok=True)
        self.mirror_dir = Path(mirror_dir) if mirror_dir is not None else None
        if self.mirror_dir is not None:
            self.mirror_dir.mkdir(parents=True, exist_ok=True)
        self._ckpt = ocp.PyTreeCheckpointer()
        if config is not None and jax.process_index() == 0:
            cfg_path = self.workdir / "args.json"
            if not cfg_path.exists():
                cfg_path.write_text(config.to_json())
        self.max_to_keep = max_to_keep

    def _step_dirs(self) -> list[Path]:
        return sorted(
            (p for p in self.ckpt_dir.iterdir() if p.is_dir() and p.name.isdigit()),
            key=lambda p: int(p.name),
        )

    def latest_step(self) -> int | None:
        dirs = self._step_dirs()
        return int(dirs[-1].name) if dirs else None

    def save(self, state: Any) -> Path:
        step = int(jax.device_get(state.step))
        path = self.ckpt_dir / f"{step:07d}"
        host_state = jax.device_get(state)
        # ALL processes must call orbax save — it writes from the primary host
        # and synchronizes the others internally (rank-gating the call would
        # deadlock rank 0 in orbax's barrier); the reference's rank-0-only
        # torch.save + dist.barrier (train_MedTok.py:300-333) maps onto this
        self._ckpt.save(path.absolute(), host_state, force=True)
        if self.mirror_dir is not None:
            self._ckpt.save(
                (self.mirror_dir / f"{step:07d}").absolute(), host_state,
                force=True,
            )
        # rotate the LOCAL copies only (train_MedTok.py:320-328), from rank 0
        if jax.process_index() == 0:
            dirs = self._step_dirs()
            while len(dirs) > self.max_to_keep:
                oldest = dirs.pop(0)
                import shutil

                shutil.rmtree(oldest)
        return path

    def restore(self, target: Any, step: int | None = None) -> Any:
        step = self.latest_step() if step is None else step
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {self.ckpt_dir}")
        path = self.ckpt_dir / f"{step:07d}"
        restored = self._ckpt.restore(
            path.absolute(), item=jax.device_get(target)
        )
        # orbax yields host numpy arrays; hand back jax arrays so downstream
        # in-place .at[] updates (e.g. the usage counts) work
        import numpy as np

        return jax.tree.map(
            lambda x: jnp_asarray(x) if isinstance(x, np.ndarray) else x,
            restored,
        )

    @staticmethod
    def load_config(workdir: str | Path):
        """Rebuild the exact training config (inference.py:30-37 contract)."""
        from medtok_tpu.config import MedTokConfig

        return MedTokConfig.from_dict(
            json.loads((Path(workdir) / "args.json").read_text())
        )
