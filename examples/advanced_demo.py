"""Advanced usage: builder API, prefix caching, streaming, continuous
batching, health/stats monitoring, quantization.

Mirrors the reference's examples/advanced_demo.rs scenarios — with the
capabilities implemented for real (the reference's advanced demo targets an
API that partially doesn't exist; SURVEY §2.14.7).
"""

import asyncio
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nanovllm_tpu import Config, SamplingParams
from nanovllm_tpu.engine.llm_engine import LLMEngineBuilder

MODEL_DIR = sys.argv[1] if len(sys.argv) > 1 else os.environ.get("NANOVLLM_MODEL", ".")


def build_engine():
    return (
        LLMEngineBuilder()
        .model_path(MODEL_DIR)
        .max_num_seqs(64)
        .max_model_len(4096)
        .dtype("bfloat16")
        .kvcache_block_size(64)
        # .quantization("int8")   # weight-only INT8: halves HBM weight traffic
        .build()
    )


def demo_prefix_caching(engine) -> None:
    """A shared system prompt is computed once; later requests hit the
    prefix cache and skip its prefill."""
    system = "You are a helpful assistant. Answer concisely. " * 8
    params = SamplingParams(temperature=0.0, max_tokens=32)
    engine.generate([system + "What is JAX?"], params)
    before = engine.get_stats().memory.cache_efficiency
    engine.generate([system + "What is a TPU?"], params)
    after = engine.get_stats().memory.cache_efficiency
    print(f"prefix cache efficiency: {before:.2f} -> {after:.2f}")


async def demo_streaming(engine) -> None:
    params = SamplingParams(temperature=0.8, top_k=50, max_tokens=48)
    print("streaming: ", end="", flush=True)
    async for out in engine.generate_stream("Once upon a time", params):
        print(out.text, end="", flush=True)
    print()


def demo_continuous_batching(engine) -> None:
    """Requests with different lengths share batches; short ones finish and
    free their KV blocks while long ones keep decoding."""
    params_short = SamplingParams(temperature=0.0, max_tokens=8)
    params_long = SamplingParams(temperature=0.0, max_tokens=96)
    seqs = [
        engine.add_request("short request", params_short),
        engine.add_request("long request " * 20, params_long),
        engine.add_request("another short one", params_short),
    ]
    while not engine.is_finished():
        engine.step()
        health = engine.health_check()
        assert health.healthy, health.reason
    print("continuous batching:", [s.num_completion_tokens for s in seqs], "tokens")


def main() -> None:
    engine = build_engine()
    demo_prefix_caching(engine)
    asyncio.run(demo_streaming(engine))
    demo_continuous_batching(engine)
    stats = engine.get_stats()
    print(
        f"preemptions={stats.scheduler.num_preemptions} "
        f"prefill_batches={stats.scheduler.num_prefill_batches} "
        f"decode_batches={stats.scheduler.num_decode_batches} "
        f"compilations={stats.num_compilations}"
    )
    engine.shutdown()


if __name__ == "__main__":
    main()
