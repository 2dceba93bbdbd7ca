"""Fused lm_head+argmax kernel vs the unfused logits->argmax path at the
bench's decode shapes (engine_probe256.py measured the unfused path at
1.56 ms of a ~19 ms batch-256 substep).

Cost model (Qwen3-0.6B, S=256, V=151936, D=1024, int8 head):
- weight read 155.6 MB int8 ~= 0.19 ms at ~810 GB/s
- MXU: 2*S*V*D = 79.6 GFLOP bf16 ~= 0.40 ms -> compute-bound at S=256
- unfused extra: [S, V] f32 logits write + argmax read = 2x155.6 MB
  (~0.39 ms) plus the argmax VPU scan.
Fused target ~= 0.5-0.6 ms; anything past ~1.6x the MXU floor means the
per-tile (val, idx) bookkeeping is leaking into the critical path.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from nanovllm_tpu.ops.pallas.lm_head import fused_greedy_head
from nanovllm_tpu.ops.quant import QuantizedEmbedding


def timeit(fn, x0, iters=30, warmup=3):
    x = x0
    for _ in range(warmup):
        x = fn(x)
    np.asarray(jnp.ravel(x)[:8])
    t0 = time.perf_counter()
    for _ in range(iters):
        x = fn(x)  # chain: defeats the relay's dispatch dedup
    np.asarray(jnp.ravel(x)[:8])
    return (time.perf_counter() - t0) / iters


def run(S, D, V, tag):
    rng = np.random.default_rng(0)
    w8 = jnp.asarray(rng.integers(-127, 128, (V, D)), jnp.int8)
    sc = jnp.asarray(rng.uniform(0.5, 2.0, (V,)), jnp.float32)
    emb = QuantizedEmbedding(data=w8, scale=sc)
    x0 = jnp.asarray(rng.standard_normal((S, D)) * 0.3, jnp.bfloat16)

    def chain(step):
        # Feed the argmax back into x so consecutive dispatches differ.
        def f(x):
            tok = step(x)
            return x + (tok[:, None] % 7).astype(x.dtype) * 1e-3
        return jax.jit(f)

    unfused = chain(lambda x: jnp.argmax(emb.logits(x), axis=-1).astype(jnp.int32))
    t = timeit(unfused, x0)
    print(f"{tag} unfused logits+argmax: {t*1e3:7.3f} ms", flush=True)

    for tv in (4096, 8192, 16384):
        fused = chain(lambda x, tv=tv: fused_greedy_head(x, w8, sc, tile_v=tv))
        try:
            t = timeit(fused, x0)
            print(f"{tag} fused tile_v={tv:5d}:    {t*1e3:7.3f} ms", flush=True)
        except Exception as e:
            print(f"{tag} fused tile_v={tv}: FAILED {type(e).__name__}: "
                  f"{str(e)[:160]}", flush=True)

    # Correctness on-chip at full shape.
    ref = np.asarray(jnp.argmax(emb.logits(x0), axis=-1))
    got = np.asarray(fused_greedy_head(x0, w8, sc))
    print(f"{tag} on-chip match: {bool((ref == got).all())} "
          f"(mismatches {(ref != got).sum()})", flush=True)


def main():
    print("devices:", jax.devices(), flush=True)
    run(256, 1024, 151936, "0.6B b256")
    run(32, 1024, 151936, "0.6B b32 ")
    run(256, 2560, 151936, "4B   b256")
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
