"""Quantization accuracy gate at the 4B geometry, north-star units
(BASELINE.md:28, VERDICT r3 #8) — run on the TPU chip (16 GB HBM fits
bf16 4B + logits; the CPU-tier test covers a 2048-hidden geometry).

Prints the per-bit-width ΔNLL (nats/token) table for README. Random-init
weights at the real Qwen3-4B architecture: absolute Δppl is meaningless
at random-init's near-vocab-size ppl, ΔNLL/token is scale-invariant
(north star Δppl<0.1 at a trained model's ppl~10 == ΔNLL < 0.01 nats).
"""

import json
import sys

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from nanovllm_tpu.models.qwen3 import Qwen3Config, init_params
from nanovllm_tpu.utils.perplexity import quantization_dnll_report

QWEN3_4B = dict(
    model_type="qwen3", vocab_size=151936, hidden_size=2560,
    intermediate_size=9728, num_hidden_layers=36,
    num_attention_heads=32, num_key_value_heads=8, head_dim=128,
    max_position_embeddings=40960, rms_norm_eps=1e-6,
    rope_theta=1000000.0, tie_word_embeddings=True,
)


def main():
    print("devices:", jax.devices(), flush=True)
    cfg = Qwen3Config.from_hf(QWEN3_4B)
    params = init_params(cfg, jax.random.PRNGKey(0), jnp.bfloat16)
    rng = np.random.RandomState(0)
    # 4x256 tokens: the first cut (2x96) put the paired-ΔNLL noise floor
    # near ±0.006 nats (int8-W measured a spurious -0.006 "improvement"),
    # too coarse against a 0.01-nat bar.
    texts = [rng.randint(0, 151936, size=256).tolist() for _ in range(4)]
    rep = quantization_dnll_report(
        cfg, params, texts, block_size=128,
        weight_methods=(
            "int8",
            "int4",  # production default
            {"label": "int4-asym-g64", "method": "int4",
             "group_size": 64, "mode": "asym"},
            {"label": "int4-asym-mse-g64", "method": "int4",
             "group_size": 64, "mode": "asym_mse"},
            {"label": "int4-asym-g32", "method": "int4",
             "group_size": 32, "mode": "asym"},
        ),
    )
    for k, v in rep.items():
        print(f"{k:18s} ppl={v['ppl']:12.1f} dnll={v.get('dnll', 0.0):+.5f} "
              f"dppl@ppl10={v.get('dppl_at_ppl10', 0.0):+.4f}", flush=True)
    out = {k: {kk: float(vv) for kk, vv in v.items()} for k, v in rep.items()}
    # Recorded IN the repo (VERDICT r4: the round-3 run's numbers lived
    # only in a commit message) — README's accuracy table cites this file.
    import os
    os.makedirs("/root/repo/experiments/results", exist_ok=True)
    with open("/root/repo/experiments/results/dnll_4b.json", "w") as f:
        json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
