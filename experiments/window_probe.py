"""TPU timing of the window-commit decode step at the bench shape:
bf16 vs int8 weights vs int8 weights + int8 KV (the config-3 headline)."""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from nanovllm_tpu.engine.step_fn import build_decode_window
from nanovllm_tpu.models.qwen3 import Qwen3Config, create_kv_caches, forward, init_params
from nanovllm_tpu.ops.quant import quantize_params
from nanovllm_tpu.ops import sampling as so

cfg = Qwen3Config(
    vocab_size=151936, hidden_size=1024, intermediate_size=3072,
    num_hidden_layers=28, num_attention_heads=16, num_key_value_heads=8,
    head_dim=128, max_position_embeddings=40960, rope_theta=1e6,
    tie_word_embeddings=True,
)
S, K, BS, NB = 32, 32, 256, 70


def main():
    print("devices:", jax.devices(), flush=True)
    params = init_params(cfg, jax.random.PRNGKey(0), jnp.bfloat16)
    q8 = quantize_params(dict(params), "int8")
    flags = {"use_random": False}
    bt = np.zeros((S, 2), np.int32)
    bt[:, 0] = np.arange(S) + 1
    bt[:, 1] = np.arange(S) + S + 1
    cl = np.full((S,), 200, np.int32)
    state = so.SamplingState(
        temps=np.zeros((S,), np.float32), top_k=np.zeros((S,), np.int32),
        top_p=np.ones((S,), np.float32), rep_pen=np.ones((S,), np.float32),
        freq_pen=np.zeros((S,), np.float32), pres_pen=np.zeros((S,), np.float32),
        buf=np.full((S, 1), -1, np.int32), gen_mask=np.zeros((S, 1), bool),
        cursor=np.zeros((S,), np.int32), seeds=np.zeros((S,), np.uint32),
        has_seed=np.zeros((S,), bool), gen_counts=np.zeros((S,), np.int32),
    )
    toks0 = np.full((S,), 17, np.int32)

    configs = [
        ("bf16 w, bf16 kv", params, jnp.bfloat16),
        ("int8 w, bf16 kv", q8, jnp.bfloat16),
        ("int8 w, int8 kv", q8, jnp.int8),
        ("int8 w, fp8 kv ", q8, jnp.float8_e4m3fn),
    ]
    for name, p, kvd in configs:
        kc, vc = create_kv_caches(cfg, NB, BS, kvd)
        step = build_decode_window(cfg, forward, BS, K, flags,
                                   attn_impl="pallas_decode")
        key = jax.random.PRNGKey(0)

        def run(toks, kc, vc):
            out, _lp, kc, vc = step(p, kc, vc, toks, jnp.asarray(bt),
                               jnp.asarray(cl), state, key)
            return out[-1], kc, vc

        t0 = time.perf_counter()
        t, kc, vc = run(jnp.asarray(toks0), kc, vc)
        np.asarray(t)
        print(f"{name}: compiled+first in {time.perf_counter()-t0:.1f}s", flush=True)
        t0 = time.perf_counter()
        iters = 10
        for _ in range(iters):
            t, kc, vc = run(t, kc, vc)
        np.asarray(t)
        dt = (time.perf_counter() - t0) / iters / K
        print(f"decode substep [{name}]  {dt*1e6:9.1f} us  -> {S/dt:,.0f} tok/s",
              flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
