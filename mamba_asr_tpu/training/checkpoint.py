"""Checkpointing with top-k-by-metric retention and parameter averaging.

Reference: speechbrain.utils.checkpoints.Checkpointer —
- recoverables: model params, scheduler step, normalizer stats, epoch
  (/root/reference/hparams/CTC/conmamba_large.yaml:330-339);
- `save_and_keep_only` keeps the 10 best by min-WER (CTC,
  /root/reference/train_CTC.py:653-657) or max-ACC (S2S, train_S2S.py:
  799-803);
- before evaluation, the k best checkpoints are element-wise *averaged*
  and loaded (/root/reference/train_CTC.py:479-489).

Storage: one directory per checkpoint holding a flax-serialized msgpack
of the full train-state pytree + a metadata json. Synchronous, process-0
only (callers guard with parallel.is_main_process()).
"""

from __future__ import annotations

import json
import os
import shutil
import time
from typing import Any, Callable, List, Optional, Tuple

import jax
import numpy as np
from flax import serialization

_META = "meta.json"
_STATE = "state.msgpack"


class CheckpointManager:
    def __init__(self, directory: str, keep: int = 10):
        self.directory = directory
        self.keep = keep
        os.makedirs(directory, exist_ok=True)

    # -- listing -----------------------------------------------------------

    def _entries(self, include_averaged: bool = False) -> List[dict]:
        """Training checkpoints, oldest-name-first. Averaged checkpoints
        (metrics={'averaged': True}, written after evaluation — the
        reference protects these with an ACC=1.1 metadata hack,
        /root/reference/train_S2S.py:814-821) are excluded by default so
        they never participate in pruning, best-k selection, averaging,
        or auto-resume."""
        out = []
        for name in sorted(os.listdir(self.directory)):
            meta_path = os.path.join(self.directory, name, _META)
            if os.path.isfile(meta_path):
                with open(meta_path, encoding="utf-8") as f:
                    meta = json.load(f)
                meta["name"] = name
                if not include_averaged and meta.get("metrics", {}).get(
                    "averaged"
                ):
                    continue
                out.append(meta)
        return out

    # -- save / restore ------------------------------------------------------

    def save(
        self,
        state: Any,
        metrics: Optional[dict] = None,
        min_keys: tuple = (),
        max_keys: tuple = (),
        name: Optional[str] = None,
    ) -> str:
        """Save and prune to the `keep` best (by the first min/max key,
        falling back to recency)."""
        name = name or f"ckpt_{time.strftime('%Y%m%d_%H%M%S')}_{len(self._entries()):04d}"
        path = os.path.join(self.directory, name)
        os.makedirs(path, exist_ok=True)
        with open(os.path.join(path, _STATE), "wb") as f:
            f.write(serialization.to_bytes(jax.device_get(state)))
        meta = {
            "metrics": metrics or {},
            "time": time.time(),
            "min_keys": list(min_keys),
            "max_keys": list(max_keys),
        }
        with open(os.path.join(path, _META), "w", encoding="utf-8") as f:
            json.dump(meta, f)
        self._prune(min_keys, max_keys)
        return path

    def _score(self, entry: dict, min_keys, max_keys) -> float:
        for k in min_keys:
            if k in entry["metrics"]:
                return -float(entry["metrics"][k])
        for k in max_keys:
            if k in entry["metrics"]:
                return float(entry["metrics"][k])
        return entry.get("time", 0.0)

    def _prune(self, min_keys, max_keys) -> None:
        entries = self._entries()
        if len(entries) <= self.keep:
            return
        entries.sort(key=lambda e: self._score(e, min_keys, max_keys),
                     reverse=True)
        for e in entries[self.keep:]:
            shutil.rmtree(os.path.join(self.directory, e["name"]),
                          ignore_errors=True)

    def restore(self, target: Any, name: Optional[str] = None) -> Any:
        """Restore the named (or most recent) checkpoint into `target`'s
        pytree structure."""
        entries = self._entries()
        if not entries:
            return None
        if name is None:
            name = max(entries, key=lambda e: e.get("time", 0))["name"]
        with open(os.path.join(self.directory, name, _STATE), "rb") as f:
            return serialization.from_bytes(target, f.read())

    def best(self, min_key: Optional[str] = None, max_key: Optional[str] = None
             ) -> Optional[str]:
        entries = self._entries()
        if not entries:
            return None
        key = (lambda e: -e["metrics"].get(min_key, np.inf)) if min_key else (
            lambda e: e["metrics"].get(max_key, -np.inf)
        )
        return max(entries, key=key)["name"]

    def restore_raw(self, name: Optional[str] = None) -> Optional[dict]:
        """Structure-free restore (nested dicts via msgpack) — lets
        inference load params/normalizer without reconstructing the
        optimizer state (whose structure depends on training config)."""
        entries = self._entries()
        if not entries:
            return None
        if name is None:
            name = max(entries, key=lambda e: e.get("time", 0))["name"]
        with open(os.path.join(self.directory, name, _STATE), "rb") as f:
            return serialization.msgpack_restore(f.read())

    def restore_averaged_raw(
        self,
        k: Optional[int] = None,
        min_key: Optional[str] = None,
        max_key: Optional[str] = None,
        subtree: str = "params",
    ) -> Optional[Tuple[dict, dict]]:
        """(averaged `subtree`, full raw state of the best checkpoint)."""
        entries = self._entries()
        if not entries:
            return None
        if min_key:
            entries.sort(key=lambda e: e["metrics"].get(min_key, np.inf))
        elif max_key:
            entries.sort(key=lambda e: -e["metrics"].get(max_key, -np.inf))
        else:
            entries.sort(key=lambda e: -e.get("time", 0))
        chosen = entries[: (k or self.keep)]
        raws = [self.restore_raw(e["name"]) for e in chosen]
        avg = jax.tree_util.tree_map(
            lambda *xs: np.mean(np.stack([np.asarray(x) for x in xs]), axis=0)
            if np.issubdtype(np.asarray(xs[0]).dtype, np.inexact)
            else xs[0],
            *[r[subtree] for r in raws],
        )
        return avg, raws[0]

    # -- averaging -----------------------------------------------------------

    def restore_averaged(
        self,
        target: Any,
        k: Optional[int] = None,
        min_key: Optional[str] = None,
        max_key: Optional[str] = None,
        select: Callable[[Any], Any] = lambda s: s,
    ) -> Any:
        """Element-wise average of the k best checkpoints' `select(state)`
        subtree (the reference averages model params only,
        train_CTC.py:479-489). Returns the full state of the best
        checkpoint with the averaged subtree substituted by the caller."""
        entries = self._entries()
        if not entries:
            return None
        if min_key:
            entries.sort(key=lambda e: e["metrics"].get(min_key, np.inf))
        elif max_key:
            entries.sort(key=lambda e: -e["metrics"].get(max_key, -np.inf))
        else:
            entries.sort(key=lambda e: -e.get("time", 0))
        chosen = entries[: (k or self.keep)]
        states = [self.restore(target, e["name"]) for e in chosen]
        avg = jax.tree_util.tree_map(
            lambda *xs: np.mean(np.stack([np.asarray(x) for x in xs]), axis=0)
            if np.issubdtype(np.asarray(xs[0]).dtype, np.inexact)
            else xs[0],
            *[select(s) for s in states],
        )
        return states[0], avg
