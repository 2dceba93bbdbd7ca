"""Model families. Each model is a pure function over a params pytree; the
registry maps HF `model_type` strings to (config-parser, init, forward)."""

from nanovllm_tpu.models.registry import get_model_family, register_model_family

__all__ = ["get_model_family", "register_model_family"]
