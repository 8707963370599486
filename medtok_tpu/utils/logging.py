"""Logging + metrics observability.

Equivalents of utils/logger.py (rank-0 file+stream logger,
/root/reference/MedTok/utils/logger.py:4-19) and the wandb metric stream
(train_MedTok.py:268-293): a process-0 logger and a MetricsLogger that
always writes JSONL (greppable, offline-safe) and mirrors to wandb when the
package + an API key are available.
"""

from __future__ import annotations

import json
import logging
import time
from pathlib import Path
from typing import Any


def create_logger(logging_dir: str | Path | None, *, process_index: int = 0) -> logging.Logger:
    """Rank-0 gets file+stream handlers; other ranks a NullHandler."""
    logger = logging.getLogger("medtok_tpu")
    logger.handlers.clear()
    logger.propagate = False  # avoid duplicate lines via the root logger
    if process_index == 0:
        logger.setLevel(logging.INFO)
        fmt = logging.Formatter("[%(asctime)s] %(message)s", "%Y-%m-%d %H:%M:%S")
        sh = logging.StreamHandler()
        sh.setFormatter(fmt)
        logger.addHandler(sh)
        if logging_dir is not None:
            Path(logging_dir).mkdir(parents=True, exist_ok=True)
            fh = logging.FileHandler(Path(logging_dir) / "log.txt")
            fh.setFormatter(fmt)
            logger.addHandler(fh)
    else:
        logger.addHandler(logging.NullHandler())
    return logger


class MetricsLogger:
    """Append-only JSONL metrics + optional wandb mirror."""

    def __init__(
        self,
        workdir: str | Path | None,
        *,
        use_wandb: bool = False,
        wandb_project: str = "MultimodalTokenizer",
        run_name: str | None = None,
        config: Any = None,
    ):
        self._fh = None
        if workdir is not None:
            Path(workdir).mkdir(parents=True, exist_ok=True)
            self._fh = open(Path(workdir) / "metrics.jsonl", "a")
        self._wandb = None
        if use_wandb:
            try:
                import wandb

                self._wandb = wandb
                wandb.init(project=wandb_project, name=run_name,
                           config=config if config is None else json.loads(
                               config.to_json() if hasattr(config, "to_json")
                               else json.dumps(config)))
            except Exception:
                self._wandb = None

    def log(self, step: int, metrics: dict[str, Any]) -> None:
        clean = {
            k: (float(v) if hasattr(v, "item") or isinstance(v, (int, float)) else v)
            for k, v in metrics.items()
        }
        if self._fh is not None:
            self._fh.write(json.dumps({"step": step, "ts": time.time(), **clean}) + "\n")
            self._fh.flush()
        if self._wandb is not None:
            self._wandb.log(clean, step=step)

    def close(self) -> None:
        if self._fh is not None:
            self._fh.close()
        if self._wandb is not None:
            self._wandb.finish()
