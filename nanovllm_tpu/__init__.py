"""nanovllm_tpu — a TPU-native quantized LLM serving engine.

A from-scratch JAX/XLA/Pallas framework with the capabilities of
``ssvgopal/nano-vllm-rs`` (see SURVEY.md): continuous batching with a
prefill-first scheduler, a paged KV cache with hash-chained prefix caching and
preemption, jit-compiled fixed-shape prefill/decode steps (the TPU analogue of
CUDA-graph decode), Pallas kernels for the hot attention paths, weight-only
quantization, and tensor parallelism over a `jax.sharding.Mesh`.

Public API mirrors the reference crate root re-exports
(reference: src/lib.rs:91-112).
"""

from nanovllm_tpu.config import Config
from nanovllm_tpu.engine.sampling_params import SamplingParams
from nanovllm_tpu.engine.sequence import Sequence, SequenceOutput, SequenceStatus
from nanovllm_tpu.engine.block_manager import BlockManager
from nanovllm_tpu.engine.scheduler import Scheduler

__version__ = "0.1.0"

__all__ = [
    "Config",
    "SamplingParams",
    "Sequence",
    "SequenceOutput",
    "SequenceStatus",
    "BlockManager",
    "Scheduler",
    "LLMEngine",
    "create_engine",
    "create_engine_with_config",
]


def __getattr__(name):
    # LLMEngine pulls in jax/model code; keep the control-plane import light.
    if name in ("LLMEngine", "create_engine", "create_engine_with_config"):
        from nanovllm_tpu.engine import llm_engine

        return getattr(llm_engine, name)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
