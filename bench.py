"""Benchmark: Qwen3-0.6B-shaped bf16 engine, batch-32 greedy decode.

Matches the reference's headline "batch-32 decode" figure (~15,000 tok/s
claimed, /root/reference/README.md:400 — no benchmark code exists there;
BASELINE.md config 2). Weights are random-initialized at the real Qwen3-0.6B
architecture; throughput is architecture-bound, not weight-bound.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASELINE_BATCH32_DECODE = 15000.0

QWEN3_0_6B = dict(
    model_type="qwen3",
    vocab_size=151936,
    hidden_size=1024,
    intermediate_size=3072,
    num_hidden_layers=28,
    num_attention_heads=16,
    num_key_value_heads=8,
    head_dim=128,
    max_position_embeddings=40960,
    rms_norm_eps=1e-6,
    rope_theta=1000000.0,
    tie_word_embeddings=True,
)

NUM_SEQS = 32
PROMPT_LEN = 128
DECODE_TOKENS = 128
BLOCK_SIZE = 256


def make_model_dir() -> str:
    d = "/tmp/nanovllm_bench_qwen3_0p6b"
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, "config.json"), "w") as f:
        json.dump(QWEN3_0_6B, f)
    return d


def make_prompts():
    import random

    rng = random.Random(0)
    # Distinct prompts (no prefix sharing), each EXACTLY PROMPT_LEN tokens
    # under the byte-level fallback tokenizer (1 ASCII char = 1 token).
    alphabet = "abcdefghijklmnopqrstuvwxyz "
    return [
        "".join(rng.choice(alphabet) for _ in range(PROMPT_LEN))
        for _ in range(NUM_SEQS)
    ]


def run_once(engine, prompts, params):
    """Returns (total_new_tokens, prefill_done_ts, end_ts, start_ts)."""
    from nanovllm_tpu.engine.sequence import SequenceStatus

    seqs = [engine.add_request(p, params) for p in prompts]
    start = time.perf_counter()
    prefill_done = None
    while not engine.is_finished():
        engine.step()
        if prefill_done is None and all(s.num_completion_tokens >= 1 for s in seqs):
            prefill_done = time.perf_counter()
    end = time.perf_counter()
    total_new = sum(s.num_completion_tokens for s in seqs)
    assert all(s.status == SequenceStatus.FINISHED for s in seqs)
    return total_new, prefill_done or end, end, start


def main():
    from nanovllm_tpu import Config, SamplingParams
    from nanovllm_tpu.engine.llm_engine import LLMEngine

    model_dir = make_model_dir()
    cfg = Config(
        model_path=model_dir,
        dtype="bfloat16",
        kvcache_block_size=BLOCK_SIZE,
        num_kvcache_blocks=NUM_SEQS * ((PROMPT_LEN + DECODE_TOKENS) // BLOCK_SIZE + 2) + 8,
        max_num_seqs=NUM_SEQS,
        max_num_batched_tokens=8192,
        max_model_len=PROMPT_LEN * 2 + DECODE_TOKENS + BLOCK_SIZE,
        # One device dispatch per 32 decode tokens: the host<->device round
        # trip (~28 ms on a tunneled attachment) amortizes over a window
        # that outlasts it, and the async pipeline overlaps the rest.
        decode_window=32,
    )
    engine = LLMEngine(cfg)
    prompts = make_prompts()
    params = SamplingParams(temperature=0.0, max_tokens=DECODE_TOKENS, ignore_eos=True)

    # Warmup pass: trigger every shape-bucket compile (prefill bucket, decode
    # buckets across MAXBLK growth).
    run_once(engine, prompts, params)

    # Timed pass: all shapes already compiled.
    total_new, prefill_done, end, start = run_once(engine, prompts, params)
    decode_tokens = total_new - NUM_SEQS  # first token of each seq ∈ prefill
    decode_time = end - prefill_done
    tok_s = decode_tokens / decode_time

    print(
        json.dumps(
            {
                "metric": "decode_tok_s_qwen3_0.6b_bf16_batch32",
                "value": round(tok_s, 1),
                "unit": "tok/s",
                "vs_baseline": round(tok_s / BASELINE_BATCH32_DECODE, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
