"""Basic usage: build an engine, generate a batch, print stats.

Mirrors the reference's examples/basic_demo.rs workload. Point MODEL_DIR at
any HF-format Qwen3 checkpoint (config.json + *.safetensors + tokenizer);
with no safetensors present the engine runs random-init weights, which is
enough to see the serving machinery work.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nanovllm_tpu import Config, SamplingParams, create_engine_with_config

MODEL_DIR = sys.argv[1] if len(sys.argv) > 1 else os.environ.get("NANOVLLM_MODEL", ".")


def main() -> None:
    config = (
        Config(model_path=MODEL_DIR)
        .with_max_num_seqs(16)
        .with_max_model_len(2048)
        .with_dtype("bfloat16")
    )
    engine = create_engine_with_config(config)

    prompts = [
        "The capital of France is",
        "In a shocking turn of events,",
        "def fibonacci(n):",
    ]
    params = SamplingParams(temperature=0.7, top_p=0.9, max_tokens=64)

    outputs = engine.generate(prompts, params)
    for prompt, out in zip(prompts, outputs):
        print(f"--- {prompt!r}")
        print(out.text)
        print(f"    [{out.num_completion_tokens} tokens, {out.finish_reason}]")

    stats = engine.get_stats()
    print(
        f"\nsteps={stats.perf.num_steps} "
        f"avg_step={stats.perf.avg_step_time_s * 1e3:.1f}ms "
        f"tok/s={stats.perf.tokens_per_second:.0f} "
        f"kv_util={stats.memory.utilization:.2f}"
    )


if __name__ == "__main__":
    main()
