"""Engine configuration.

Capability parity with the reference `Config`
(reference: src/config.rs:16-185): the same knobs, validation rules, JSON
load/save, and `with_*` builders — plus TPU-specific additions (mesh shape,
quantization, KV-cache dtype, shape-bucketing controls) that have no reference
counterpart.

TPU-first deviations from the reference:
- `kvcache_block_size` defaults to 64 and must be a multiple of 16 (the bf16
  sublane tile), not a multiple of 256 (reference: src/config.rs:93 — a
  candle/CUDA constraint). Smaller blocks give finer-grained prefix caching
  and map onto Pallas paged-attention tiles.
- `device` is "tpu"/"cpu" (jax platforms) instead of "cuda"/"cpu"/"metal".
- `enforce_eager` disables the bucketed-jit decode path analogue of CUDA
  graphs (reference: src/engine/model_runner.rs:99).
"""

from __future__ import annotations

import dataclasses
import json
import os
from dataclasses import dataclass, field
from typing import Optional


_VALID_DEVICES = ("tpu", "cpu", "gpu")
_VALID_DTYPES = ("bfloat16", "float32", "float16")
_VALID_QUANT = (None, "int8", "int4")
_VALID_KV_DTYPES = ("auto", "bfloat16", "float32", "int8", "fp8")


@dataclass
class Config:
    """Top-level engine configuration (reference: src/config.rs:16-52)."""

    model_path: str = ""
    max_num_batched_tokens: int = 32768
    max_num_seqs: int = 512
    max_model_len: int = 4096
    # Fraction of device HBM the KV cache may use when `num_kvcache_blocks`
    # is not set explicitly (reference: gpu_memory_utilization, config.rs:31).
    memory_utilization: float = 0.9
    tensor_parallel_size: int = 1
    data_parallel_size: int = 1
    enforce_eager: bool = False
    eos_token_id: Optional[int] = None
    kvcache_block_size: int = 64
    num_kvcache_blocks: Optional[int] = None
    device: str = "tpu"
    dtype: str = "bfloat16"

    # --- TPU-native extensions (no reference counterpart) ---
    # Weight-only quantization applied at load time.
    quantization: Optional[str] = None
    # Per-group scale granularity along the contraction dim. None = auto:
    # int8 per-out-channel (-1); int4 G=64 for models under 2560 hidden and
    # G=32 at 2560+ (the 4B+ class) — the measured granularities that meet
    # the ΔNLL<0.01 nats/token north-star bar with asymmetric quantization
    # at each scale (README "Quantization accuracy";
    # model_runner._resolve_quant_group_size).
    quantization_group_size: Optional[int] = None
    # "sym" | "asym" | None ("auto"): int4 defaults to asymmetric
    # (zero-point) quantization — symmetric int4 measures |ΔNLL| 0.092
    # nats/token, 9x over the bar; asymmetric G=64 measures 0.003. int8 is
    # always symmetric (its error is ~10x under every gate).
    quantization_mode: Optional[str] = None
    # KV-cache storage dtype; "auto" follows `dtype`.
    kv_cache_dtype: str = "auto"
    # Use Pallas kernels for attention when available (falls back to the
    # pure-jnp reference ops on CPU or when False).
    use_pallas: bool = True
    # Decode-window commit mode: stage the window's KV rows and span-commit
    # once per layer per window instead of per-substep row RMWs. "auto"
    # (measured on v5e, batch-32 decode): ON for quantized KV caches
    # (10.0k vs 7.7k tok/s — the per-substep quantized kernels dequantize
    # whole blocks) and OFF for bf16 caches (9.5k vs 6.4k the other way —
    # bf16 staging traffic outweighs the commit savings). True/False force.
    window_commit: object = "auto"
    # Chunked prefill: a prompt whose un-prefilled remainder exceeds the
    # step's token budget is processed in block-aligned chunks across
    # steps instead of one oversized dispatch — per-step work stays
    # bounded by max_num_batched_tokens (bounded decode stalls, bounded
    # jit bucket sizes). Outputs are identical either way.
    enable_chunked_prefill: bool = True
    # Sliding-window rolling-buffer KV eviction: for models with local
    # attention (Mistral/Qwen2 sliding_window), free KV blocks that fall
    # entirely below every future query's attention window — per-sequence
    # KV stays bounded at ~window size regardless of generation length.
    # Purely a memory optimization (those keys are masked anyway).
    sliding_window_kv_eviction: bool = True
    # Shared-prefix (cascade) decode attention: when scheduled sequences
    # share a committed block-table prefix (prefix-cache hits — e.g. a
    # common system prompt), attend the shared span ONCE for the whole
    # group with their queries batched into a single M = members*G dot per
    # block, instead of per-sequence M=G dots — the measured decode wall
    # is exactly that per-sequence MXU weight-load rate
    # (docs/performance.md). "auto" enables it in window-commit mode when
    # the saved per-seq block visits exceed a launch-overhead threshold;
    # True/False force. Purely an execution strategy: outputs are
    # identical (tests/test_shared_prefix.py).
    shared_prefix_attention: object = "auto"
    # N-gram (prompt-lookup) speculative decoding: each decode iteration
    # proposes `speculative_num_tokens` continuation tokens by matching the
    # sequence's trailing `speculative_ngram_n`-gram against its own earlier
    # context ON DEVICE, then verifies all of them in one multi-query
    # forward pass (the same chunk-attends-paged-history shape as chunked
    # prefill). At small batches decode is weight-bandwidth-bound, so
    # verifying k+1 query tokens costs the same HBM traffic as 1 — every
    # accepted proposal is a (near-)free extra token. Greedy acceptance is
    # exact under matching attention numerics: outputs are token-for-token
    # identical to non-speculative greedy decode (tests/test_spec_decode.py).
    # On TPU the verify forward runs the flash varlen PREFILL kernel while
    # plain decode runs the flash DECODE kernel; both are flash attention
    # over the same paged blocks, but a near-exactly-tied argmax could in
    # principle resolve differently across the two — the emitted stream is
    # always a valid greedy continuation of the verify forward's own
    # logits. 0 disables. Engages only
    # for all-greedy batches of <= speculative_max_batch sequences with no
    # logprobs/penalties/logit-bias, on full-attention models, single
    # mesh-less chips; other batches take the normal decode window.
    # No reference counterpart (beyond parity).
    speculative_num_tokens: int = 0
    speculative_ngram_n: int = 3
    # Above this many running sequences speculation is skipped: large-batch
    # decode is attention/compute-bound, so rejected proposals stop being
    # free (the win is the batch-1..8 latency regime).
    speculative_max_batch: int = 8
    # With quantization on, also quantize the embedding/lm_head to INT8
    # per-vocab-row (the head stays 8-bit even under int4 layer weights).
    # At decode batch sizes the logits matmul is the single largest HBM
    # read of the step; set False to keep the head at full precision.
    quantize_lm_head: bool = True
    # Run the Pallas kernels in interpret mode on non-TPU backends instead
    # of falling back to the jnp oracle — exercises the real kernel +
    # shard_map code paths on CPU (multichip dryrun, kernel tests).
    pallas_interpret: bool = False
    # Shape buckets for the jitted decode step (batch sizes). The analogue of
    # the reference's per-batch-size CUDA graph cache
    # (reference: src/engine/model_runner.rs:46-63).
    decode_batch_buckets: tuple = (8, 16, 32, 64, 128, 256, 512)
    # Shape buckets for the jitted prefill step (flat token counts).
    prefill_token_buckets: tuple = (256, 512, 1024, 2048, 4096, 8192, 16384, 32768)
    enable_prefix_caching: bool = True
    # Decode iterations per device dispatch: sampled tokens feed the next
    # substep on device (lax.scan), so the host syncs once per window instead
    # of once per token. 1 = reference-style single-step decode.
    decode_window: int = 16
    # Async pipelined scheduling: dispatch batch N+1 before fetching batch
    # N's tokens (the next batch's input tokens are gathered from the
    # previous dispatch's on-device output). Hides the host<->device round
    # trip behind device compute. False = reference-style synchronous steps.
    async_scheduling: bool = True
    # Max dispatches in flight before the oldest is fetched. Depth 2 lets
    # the device->host token copy of window N land while window N+1 is
    # still computing (the copy RTT can exceed one window's compute).
    pipeline_depth: int = 2
    # Paged-KV block manager implementation: "auto" = native C++
    # (cpp/block_manager.cc via ctypes) when buildable, else pure Python;
    # "native" / "python" force one.
    block_manager_backend: str = "auto"
    # Penalty/seed token-history ring size cap. None (default) sizes the
    # ring from the live context so repetition/frequency/presence penalties
    # are EXACT at any length — at the cost of a [batch, next_pow2(context)]
    # host build + transfer per decode window (e.g. ~40 MB/window at 32k
    # context x 256 seqs). Setting a cap bounds that cost; penalties then
    # consider only the most recent N tokens (an explicit, validated
    # approximation — never a silent one).
    penalty_history_window: Optional[int] = None
    # Multi-host serving (replicated-deterministic control plane,
    # docs/multihost.md): when jax.process_count() > 1, new requests are
    # broadcast from the rank-0 frontend at deterministic sync points — when
    # the engine is idle, and otherwise every `multihost_sync_interval`
    # steps (so requests can join mid-flight with bounded latency while
    # steady-state decode pays no per-step DCN barrier).
    multihost_sync_interval: int = 8

    def __post_init__(self):
        if isinstance(self.decode_batch_buckets, list):
            self.decode_batch_buckets = tuple(self.decode_batch_buckets)
        if isinstance(self.prefill_token_buckets, list):
            self.prefill_token_buckets = tuple(self.prefill_token_buckets)

    # ------------------------------------------------------------------
    # Validation (reference: src/config.rs:83-119)
    # ------------------------------------------------------------------
    def validate(self) -> None:
        if not self.model_path:
            raise ValueError("model_path must be set")
        if not os.path.isdir(self.model_path):
            raise ValueError(f"model_path does not exist or is not a directory: {self.model_path}")
        if self.kvcache_block_size <= 0 or self.kvcache_block_size % 16 != 0:
            raise ValueError(
                f"kvcache_block_size must be a positive multiple of 16, got {self.kvcache_block_size}"
            )
        if not (1 <= self.tensor_parallel_size <= 256):
            raise ValueError(
                f"tensor_parallel_size must be in 1..=256, got {self.tensor_parallel_size}"
            )
        if self.data_parallel_size < 1:
            raise ValueError(f"data_parallel_size must be >= 1, got {self.data_parallel_size}")
        if not (0.0 < self.memory_utilization <= 1.0):
            raise ValueError(
                f"memory_utilization must be in (0, 1], got {self.memory_utilization}"
            )
        if self.device not in _VALID_DEVICES:
            raise ValueError(f"device must be one of {_VALID_DEVICES}, got {self.device!r}")
        if self.dtype not in _VALID_DTYPES:
            raise ValueError(f"dtype must be one of {_VALID_DTYPES}, got {self.dtype!r}")
        if self.quantization not in _VALID_QUANT:
            raise ValueError(f"quantization must be one of {_VALID_QUANT}, got {self.quantization!r}")
        if self.quantization_mode not in (None, "auto", "sym", "asym", "asym_mse"):
            raise ValueError(
                "quantization_mode must be one of "
                "None/'auto'/'sym'/'asym'/'asym_mse', "
                f"got {self.quantization_mode!r}"
            )
        if self.quantization_mode in ("asym", "asym_mse") and self.quantization != "int4":
            raise ValueError(
                f"quantization_mode={self.quantization_mode!r} requires quantization='int4'"
            )
        if self.quantization_group_size is not None and (
            self.quantization_group_size == 0 or self.quantization_group_size < -1
        ):
            raise ValueError(
                "quantization_group_size must be a positive group size or -1 "
                f"(per-channel), got {self.quantization_group_size}"
            )
        if self.kv_cache_dtype not in _VALID_KV_DTYPES:
            raise ValueError(
                f"kv_cache_dtype must be one of {_VALID_KV_DTYPES}, got {self.kv_cache_dtype!r}"
            )
        if self.max_num_seqs <= 0:
            raise ValueError("max_num_seqs must be positive")
        if self.max_model_len <= 0:
            raise ValueError("max_model_len must be positive")
        if self.max_num_batched_tokens < self.kvcache_block_size:
            raise ValueError("max_num_batched_tokens must be >= kvcache_block_size")
        if self.num_kvcache_blocks is not None and self.num_kvcache_blocks <= 0:
            raise ValueError("num_kvcache_blocks must be positive when set")
        if self.decode_window < 1:
            raise ValueError(f"decode_window must be >= 1, got {self.decode_window}")
        if self.pipeline_depth < 1:
            raise ValueError(f"pipeline_depth must be >= 1, got {self.pipeline_depth}")
        if self.speculative_num_tokens < 0:
            raise ValueError(
                "speculative_num_tokens must be >= 0, "
                f"got {self.speculative_num_tokens}"
            )
        if self.speculative_num_tokens and not (
            1 <= self.speculative_ngram_n <= 32
        ):
            # Upper bound keeps NI = TBUF - n + 1 positive in ngram_propose
            # for every token-buffer size (TBUF floors at 64): a huge n
            # would otherwise surface as a cryptic trace-time slice error.
            raise ValueError(
                "speculative_ngram_n must be in [1, 32], "
                f"got {self.speculative_ngram_n}"
            )
        if self.speculative_num_tokens and self.speculative_max_batch < 1:
            raise ValueError(
                f"speculative_max_batch must be >= 1, got {self.speculative_max_batch}"
            )
        if self.penalty_history_window is not None and self.penalty_history_window < 16:
            raise ValueError(
                "penalty_history_window must be >= 16 (or None for exact), "
                f"got {self.penalty_history_window}"
            )
        if self.shared_prefix_attention not in ("auto", True, False):
            raise ValueError(
                "shared_prefix_attention must be 'auto', True, or False, "
                f"got {self.shared_prefix_attention!r}"
            )
        if self.window_commit not in ("auto", True, False):
            raise ValueError(
                f"window_commit must be 'auto', True, or False, got {self.window_commit!r}"
            )
        if self.multihost_sync_interval < 1:
            raise ValueError(
                f"multihost_sync_interval must be >= 1, got {self.multihost_sync_interval}"
            )
        if self.block_manager_backend not in ("auto", "native", "python"):
            raise ValueError(
                "block_manager_backend must be auto/native/python, "
                f"got {self.block_manager_backend!r}"
            )

    # ------------------------------------------------------------------
    # JSON load/save (reference: src/config.rs:122-144)
    # ------------------------------------------------------------------
    def save(self, path: str) -> None:
        with open(path, "w") as f:
            json.dump(dataclasses.asdict(self), f, indent=2)

    @classmethod
    def load(cls, path: str) -> "Config":
        with open(path) as f:
            data = json.load(f)
        known = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in data.items() if k in known})

    # ------------------------------------------------------------------
    # Builder-style `with_*` methods (reference: src/config.rs:147-185 and
    # the README-advertised extras, README.md:198)
    # ------------------------------------------------------------------
    def _with(self, **kw) -> "Config":
        return dataclasses.replace(self, **kw)

    def with_model_path(self, p: str) -> "Config":
        return self._with(model_path=p)

    def with_max_num_batched_tokens(self, n: int) -> "Config":
        return self._with(max_num_batched_tokens=n)

    def with_max_num_seqs(self, n: int) -> "Config":
        return self._with(max_num_seqs=n)

    def with_max_model_len(self, n: int) -> "Config":
        return self._with(max_model_len=n)

    def with_memory_utilization(self, f: float) -> "Config":
        return self._with(memory_utilization=f)

    def with_tensor_parallel_size(self, n: int) -> "Config":
        return self._with(tensor_parallel_size=n)

    def with_enforce_eager(self, b: bool = True) -> "Config":
        return self._with(enforce_eager=b)

    def with_kvcache_block_size(self, n: int) -> "Config":
        return self._with(kvcache_block_size=n)

    def with_num_kvcache_blocks(self, n: int) -> "Config":
        return self._with(num_kvcache_blocks=n)

    def with_device(self, d: str) -> "Config":
        return self._with(device=d)

    def with_dtype(self, d: str) -> "Config":
        return self._with(dtype=d)

    def with_quantization(self, q: Optional[str]) -> "Config":
        return self._with(quantization=q)

    def with_kv_cache_dtype(self, d: str) -> "Config":
        return self._with(kv_cache_dtype=d)

    def with_enable_prefix_caching(self, b: bool = True) -> "Config":
        return self._with(enable_prefix_caching=b)
