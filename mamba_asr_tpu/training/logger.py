"""Training loggers: append-rows file logger + optional wandb hook.

Reference: speechbrain.utils.train_logger.FileTrainLogger writing epoch
rows to train_log.txt (/root/reference/hparams/CTC/conmamba_large.yaml:
341-342, stats assembled at /root/reference/train_CTC.py:620-652) and the
optional WandBLogger swap-in (/root/reference/train_CTC.py:1130-1131).
"""

from __future__ import annotations

import json
import os
import sys
import time
from typing import Optional


class FileTrainLogger:
    def __init__(self, save_file: str, also_stdout: bool = True):
        self.save_file = save_file
        self.also_stdout = also_stdout
        os.makedirs(os.path.dirname(save_file) or ".", exist_ok=True)

    def log_stats(
        self,
        stats_meta: dict,
        train_stats: Optional[dict] = None,
        valid_stats: Optional[dict] = None,
        test_stats: Optional[dict] = None,
    ) -> None:
        parts = [f"{k}: {self._fmt(v)}" for k, v in stats_meta.items()]
        for prefix, stats in (
            ("train", train_stats), ("valid", valid_stats), ("test", test_stats)
        ):
            if stats:
                parts += [f"{prefix} {k}: {self._fmt(v)}" for k, v in stats.items()]
        line = ", ".join(parts)
        with open(self.save_file, "a", encoding="utf-8") as f:
            f.write(line + "\n")
        if self.also_stdout:
            print(line, flush=True)

    @staticmethod
    def _fmt(v) -> str:
        if isinstance(v, float):
            return f"{v:.4g}" if abs(v) < 1e4 else f"{v:.4e}"
        return str(v)


class JsonlLogger:
    """Machine-readable per-step metrics (jsonl)."""

    def __init__(self, save_file: str):
        self.save_file = save_file
        os.makedirs(os.path.dirname(save_file) or ".", exist_ok=True)

    def log(self, **kv) -> None:
        kv.setdefault("ts", time.time())
        with open(self.save_file, "a", encoding="utf-8") as f:
            f.write(json.dumps(kv) + "\n")


class WandbLogger:
    """Thin wandb hook; degrades to a no-op when wandb is unavailable."""

    def __init__(self, **init_kwargs):
        try:
            import wandb

            self._run = wandb.init(**init_kwargs)
            self._wandb = wandb
        except Exception:
            self._run = None
            self._wandb = None
            print("wandb unavailable; WandbLogger is a no-op", file=sys.stderr)

    def log_stats(self, stats_meta, train_stats=None, valid_stats=None,
                  test_stats=None) -> None:
        if self._run is None:
            return
        payload = dict(stats_meta)
        for prefix, stats in (
            ("train", train_stats), ("valid", valid_stats), ("test", test_stats)
        ):
            if stats:
                payload.update({f"{prefix}/{k}": v for k, v in stats.items()})
        self._wandb.log(payload)
