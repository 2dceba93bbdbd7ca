"""On-chip (real TPU) smoke: sliding-window, gemma2, and quantized-KV
kernel paths vs the jnp oracle on the same device — catches Mosaic
lowering/alignment issues interpret mode cannot see (this script found the
f32 fused-lm-head composition crash and the <128-lane scale-plane DMA
limit, docs/performance.md). Run manually on TPU; not part of the CPU
suite."""

import json, os, sys
sys.path.insert(0, "/root/repo")
import nanovllm_tpu as nv
from nanovllm_tpu.engine.llm_engine import LLMEngine

CASES = {
  "mistral_sw": dict(model_type="mistral", vocab_size=2048, hidden_size=512,
                     intermediate_size=1024, num_hidden_layers=2,
                     num_attention_heads=8, num_key_value_heads=4,
                     head_dim=128, tie_word_embeddings=True,
                     sliding_window=48),
  "gemma2": dict(model_type="gemma2", vocab_size=2048, hidden_size=512,
                 intermediate_size=1024, num_hidden_layers=2,
                 num_attention_heads=8, num_key_value_heads=4, head_dim=128,
                 sliding_window=48, query_pre_attn_scalar=128,
                 attn_logit_softcapping=50.0, final_logit_softcapping=30.0),
  "gemma3": dict(model_type="gemma3_text", vocab_size=2048, hidden_size=512,
                 intermediate_size=1024, num_hidden_layers=6,
                 num_attention_heads=8, num_key_value_heads=4, head_dim=128,
                 sliding_window=48, rope_theta=1e6, rope_local_base_freq=1e4,
                 query_pre_attn_scalar=128),
}
params = nv.SamplingParams(temperature=0.0, max_tokens=24, ignore_eos=True)
prompt = ["on chip smoke prompt well past the window " * 4]  # ~170 tokens

for name, cfg in CASES.items():
    d = f"/tmp/smoke_{name}"
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, "config.json"), "w") as f:
        json.dump(cfg, f)
    outs = {}
    for kvd in ("auto", "int8"):
        for pallas in (False, True):
            eng = LLMEngine(nv.Config(model_path=d, dtype="float32",
                                      kvcache_block_size=128,
                                      num_kvcache_blocks=64,
                                      max_model_len=512, decode_window=4,
                                      kv_cache_dtype=kvd,
                                      use_pallas=pallas), rng_seed=0)
            outs[(kvd, pallas)] = eng.generate(prompt, params)[0].completion_token_ids
        a, b = outs[(kvd, False)], outs[(kvd, True)]
        prefix = 0
        for x, y in zip(a, b):
            if x != y:
                break
            prefix += 1
        tag = "EXACT" if a == b else f"prefix {prefix}/{len(a)}"
        print(f"{name} kv={kvd}: pallas vs oracle {tag}", flush=True)
        # bf16 KV ("auto" here is f32): exact. Quantized KV: the window
        # kernels attend in-window rows at full precision BY DESIGN and
        # TPU f32 dots decompose through bf16 passes, so a chaotic greedy
        # chain on random weights forks after a few tokens — require a
        # solid matching prefix, not positional equality.
        assert (a == b) if kvd == "auto" else prefix >= 4, (name, kvd, a, b)
print("TPU SMOKE OK", flush=True)
