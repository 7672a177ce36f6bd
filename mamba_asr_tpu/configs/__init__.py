"""Declarative experiment configs (plain-YAML + dataclasses).

Replaces HyperPyYAML (SURVEY.md §5.6): the reference's YAML is a DI
container with arbitrary code execution (`!new:`, `!apply:`); here YAML
holds only data, the object graph is assembled in code, and CLI overrides
use dotted paths (`--train.lr 0.001`).
"""

from mamba_asr_tpu.configs.loader import (
    DataConfig,
    DecodeConfig,
    ExperimentConfig,
    load_config,
    parse_overrides,
)

__all__ = [
    "DataConfig",
    "DecodeConfig",
    "ExperimentConfig",
    "load_config",
    "parse_overrides",
]
