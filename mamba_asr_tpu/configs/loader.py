"""Experiment config: dataclass tree + safe-YAML loader + CLI overrides.

The three roles of the reference's HyperPyYAML configs (SURVEY.md §5.6)
are preserved — model hyperparameters, object wiring, CLI overrides —
without arbitrary-code-execution YAML:

- model hyperparameters -> nested dataclasses (ASRConfig etc.),
- wiring -> code (ASRModel.setup, Trainer),
- CLI overrides -> `--section.key value` dotted paths, type-coerced from
  the dataclass field (the reference's `--key value` overrides,
  /root/reference/train_CTC.py:1056-1058).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Any, Dict, Optional, Sequence, Tuple, get_args, get_origin

import yaml

from mamba_asr_tpu.models.asr import ASRConfig
from mamba_asr_tpu.models.mamba import MambaConfig
from mamba_asr_tpu.training.trainer import (
    FrontendConfig,
    SpecAugmentConfig,
    TrainConfig,
)


@dataclasses.dataclass(frozen=True)
class DataConfig:
    data_folder: str = ""
    output_folder: str = "results"
    train_splits: Tuple[str, ...] = ("train-clean-100",)
    dev_splits: Tuple[str, ...] = ("dev-clean",)
    test_splits: Tuple[str, ...] = ("test-clean", "test-other")
    train_csv: str = "train.csv"
    skip_prep: bool = False
    tokenizer_type: str = "char"  # char | bpe | unigram
    vocab_size: int = 31
    sample_rate: int = 16000
    num_buckets: int = 8
    max_batch_seconds: float = 850.0
    max_batch_ex: int = 128
    valid_max_batch_seconds: float = 100.0
    speed_perturb: bool = True
    sorting: str = "random"
    # Host input pipeline: decode/perturb thread-pool width and prefetch
    # depth (reference: torch DataLoader num_workers,
    # /root/reference/train_CTC.py:930-937).
    num_workers: int = 0  # 0 = auto (one thread per host CPU)
    prefetch_batches: int = 4
    # Optional grapheme lexicon CSV from the train vocabulary
    # (librispeech_prepare.py:268-457 capability).
    create_lexicon: bool = False


@dataclasses.dataclass(frozen=True)
class DecodeConfig:
    # CTC beam search (hparams/CTC/conmamba_large.yaml:168-172, 232-237).
    valid_greedy: bool = True
    test_beam_size: int = 100
    blank_index: int = 0
    beam_prune_logp: float = -12.0
    token_prune_min_logp: float = -1.2
    # S2S joint search (hparams/S2S/conmamba_large.yaml:239-245).
    valid_search_interval: int = 10
    valid_beam_size: int = 10
    s2s_test_beam_size: int = 66
    ctc_weight_decode: float = 0.4
    ctc_candidates: int = 96  # partial CTC scoring (0 = full vocab)
    lm_weight: float = 0.6
    temperature: float = 1.15
    temperature_lm: float = 1.15
    using_eos_threshold: bool = False
    length_normalization: bool = True
    max_decode_ratio: float = 1.0
    min_decode_ratio: float = 0.0
    # Optional pretrained LM (train_lm.py output msgpack) fused at test
    # decode — the reference's Pretrainer-download equivalent
    # (train_S2S.py:1235-1236), loaded from disk instead of HF.
    lm_path: str = ""
    # LM compute/KV-cache dtype at decode: bf16 halves the per-step HBM
    # traffic of the (N, S_max, H, dh) buffers (the beam-step bottleneck
    # at beam 66); logits/log-softmax stay fp32.
    lm_dtype: str = "bfloat16"
    lm_d_model: int = 768
    lm_nhead: int = 12
    lm_layers: int = 12
    lm_d_ffn: int = 3072


@dataclasses.dataclass(frozen=True)
class ParallelConfig:
    """Mesh layout: data axis = n_devices / tensor_parallel.

    tensor_parallel > 1 shards large kernels (and their optimizer-state
    mirrors) over the "model" mesh axis via
    parallel.mesh.infer_param_shardings; GSPMD inserts the collectives.
    The reference has no equivalent (DDP only, SURVEY.md §2.3)."""

    tensor_parallel: int = 1
    # Leaves smaller than this stay replicated (sharding tiny kernels
    # costs more in collectives than it saves in memory/compute).
    min_shard_elements: int = 16384
    # Shard the encoder's time axis over a "seq" mesh axis (long-audio
    # scaling): the train step runs the ConMamba stack inside shard_map
    # with the SSM recurrence chained across shards
    # (parallel/sequence.py). ConMamba encoders only.
    sequence_parallel: int = 1
    # Shard the (scanned) encoder layer stack over a "pipe" mesh axis
    # and run the GPipe microbatch schedule (parallel/pipeline.py).
    # Requires model.scan_layers=true; ConMamba encoders only.
    pipeline_stages: int = 1
    # Microbatches per pipeline round; the per-data-shard batch must be
    # divisible by this. Bubble fraction = (S-1)/(M+S-1).
    pipeline_microbatches: int = 4


@dataclasses.dataclass(frozen=True)
class ExperimentConfig:
    name: str = "experiment"
    seed: int = 3407
    model: ASRConfig = ASRConfig()
    frontend: FrontendConfig = FrontendConfig()
    train: TrainConfig = TrainConfig()
    specaug: SpecAugmentConfig = SpecAugmentConfig()
    data: DataConfig = DataConfig()
    decode: DecodeConfig = DecodeConfig()
    parallel: ParallelConfig = ParallelConfig()

    @property
    def output_folder(self) -> str:
        return os.path.join(self.data.output_folder, self.name, str(self.seed))


_NESTED = {
    "model": ASRConfig,
    "frontend": FrontendConfig,
    "train": TrainConfig,
    "specaug": SpecAugmentConfig,
    "data": DataConfig,
    "decode": DecodeConfig,
    "mamba": MambaConfig,
    "parallel": ParallelConfig,
}


def _coerce(field_type, value):
    origin = get_origin(field_type)
    if origin in (tuple, Tuple):
        args = get_args(field_type)
        elem = args[0] if args else str
        return tuple(_coerce(elem, v) for v in value)
    if field_type is float and value is not None:
        return float(value)
    if field_type is int and value is not None and not isinstance(value, bool):
        return int(value)
    if field_type is bool and isinstance(value, str):
        return value.lower() in ("1", "true", "yes")
    if field_type is Optional[int] and value is not None:
        return int(value)
    return value


def _build(cls, d: Dict[str, Any]):
    import typing

    field_names = {f.name for f in dataclasses.fields(cls)}
    hints = typing.get_type_hints(cls)
    kwargs = {}
    for k, v in d.items():
        if k not in field_names:
            raise KeyError(f"unknown config key '{k}' for {cls.__name__}")
        if k in _NESTED and isinstance(v, dict):
            kwargs[k] = _build(_NESTED[k], v)
        else:
            kwargs[k] = _coerce(hints[k], v)
    return cls(**kwargs)


def load_config(path: str, overrides: Optional[Dict[str, Any]] = None
                ) -> ExperimentConfig:
    with open(path, encoding="utf-8") as f:
        raw = yaml.safe_load(f) or {}
    if overrides:
        for dotted, value in overrides.items():
            node = raw
            parts = dotted.split(".")
            for p in parts[:-1]:
                node = node.setdefault(p, {})
            node[parts[-1]] = value
    return _build(ExperimentConfig, raw)


def parse_overrides(argv: Sequence[str]) -> Dict[str, Any]:
    """`--a.b value` pairs -> {"a.b": parsed_value} (yaml-parsed scalars)."""
    out: Dict[str, Any] = {}
    i = 0
    args = list(argv)
    while i < len(args):
        a = args[i]
        if not a.startswith("--"):
            raise ValueError(f"expected --key, got {a}")
        key = a[2:]
        if "=" in key:
            key, val = key.split("=", 1)
            i += 1
        else:
            if i + 1 >= len(args):
                raise ValueError(f"missing value for --{key}")
            val = args[i + 1]
            i += 2
        out[key] = yaml.safe_load(val)
    return out
