"""Model-family registry: maps HF ``model_type`` → implementation.

The reference supports only Qwen3 (src/models/qwen3.rs); the registry makes
adding families (Qwen2, Llama, ...) a single registration.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Dict


@dataclass(frozen=True)
class ModelFamily:
    name: str
    config_from_hf: Callable  # dict -> model config
    init_params: Callable  # (config, rng, dtype) -> params pytree
    forward: Callable  # (config, params, kc, vc, tokens, meta, ...) -> (logits, kc, vc)
    load_weights: Callable  # (config, model_dir, dtype) -> params pytree


_REGISTRY: Dict[str, ModelFamily] = {}


def register_model_family(model_type: str, family: ModelFamily) -> None:
    _REGISTRY[model_type] = family


def get_model_family(model_type: str) -> ModelFamily:
    # Import for registration side effect.
    import nanovllm_tpu.models.qwen3  # noqa: F401

    if model_type not in _REGISTRY:
        raise ValueError(
            f"unsupported model_type {model_type!r}; supported: {sorted(_REGISTRY)}"
        )
    return _REGISTRY[model_type]
