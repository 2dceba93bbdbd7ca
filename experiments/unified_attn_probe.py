"""Standalone timing of paged_attention_window + kv_window_commit at the
bench shape, bf16 vs int8 caches, plus ablations."""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from nanovllm_tpu.ops.pallas.paged_attention import (
    kv_window_commit, paged_attention_window,
)

rng = np.random.default_rng(0)
L, NB, Hkv, BS, Dh, Hq, S, K = 28, 70, 8, 256, 128, 16, 32, 32


def mkbf(shape, dtype=jnp.bfloat16):
    return jnp.asarray(rng.standard_normal(shape, np.float32) * 0.5, dtype)


def _barrier(x):
    # Fetch a TINY slice — fetching a whole leaf would transfer the 1.5 GB
    # cache through the tunnel and dominate the measurement.
    leaf = jax.tree.leaves(x)[0]
    np.asarray(jnp.ravel(leaf)[:8])


def timeit(fn, x0, *args, iters=50, warmup=3):
    x = x0
    for _ in range(warmup):
        x = fn(x, *args)
    _barrier(x)
    t0 = time.perf_counter()
    for _ in range(iters):
        x = fn(x, *args)
    _barrier(x)
    return (time.perf_counter() - t0) / iters


def main():
    print("devices:", jax.devices(), flush=True)
    q0 = mkbf((S, Hq, Dh))
    kn = mkbf((S, Hkv, Dh))
    vn = mkbf((S, Hkv, Dh))
    kst = mkbf((L, S, Hkv, K, Dh))
    vst = mkbf((L, S, Hkv, K, Dh))
    bt = jnp.asarray(np.stack([np.arange(S) + 1, np.arange(S) + S + 1], 1).astype(np.int32))
    start = jnp.full((S,), 250, jnp.int32)
    valid = jnp.ones((S,), jnp.int32)

    for name, quant in (("bf16", False), ("int8", True)):
        if quant:
            kc = (jnp.asarray(rng.integers(-127, 127, (L, NB, Hkv, BS, Dh)), jnp.int8),
                  jnp.asarray(rng.random((L, NB, Hkv, BS), np.float32) * 0.01))
            vc = (jnp.asarray(rng.integers(-127, 127, (L, NB, Hkv, BS, Dh)), jnp.int8),
                  jnp.asarray(rng.random((L, NB, Hkv, BS), np.float32) * 0.01))
            nbytes = S * Hkv * BS * (Dh + 4) * 2
        else:
            kc = mkbf((L, NB, Hkv, BS, Dh))
            vc = mkbf((L, NB, Hkv, BS, Dh))
            nbytes = S * Hkv * BS * Dh * 2 * 2
        nbytes += S * Hkv * K * Dh * 2 * 2  # staged reads

        def attn_chain(q, kc, vc):
            def body(l, q):
                o = paged_attention_window(q, kn, vn, kst, vst, kc, vc,
                                           l % L, bt, start, jnp.int32(17),
                                           scale=0.088)
                return q * 0.999 + o * 1e-3
            return jax.lax.fori_loop(0, L, body, q)

        t = timeit(jax.jit(attn_chain), q0, kc, vc)
        print(f"unified attn {name}: {t/L*1e6:8.1f} us/layer "
              f"{nbytes/(t/L)/1e9:6.1f} GB/s", flush=True)

        def commit_chain(carry):
            def body(l, caches):
                return kv_window_commit(kst[0], vst[0], caches[0], caches[1],
                                        l % L, bt, start, valid)
            return jax.lax.fori_loop(0, L, body, carry)

        t = timeit(jax.jit(commit_chain, donate_argnums=(0,)), (kc, vc))
        print(f"window commit {name}: {t/L*1e6:8.1f} us/layer "
              f"(amortized {t/L/K*1e6:.2f} us/substep/layer)", flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
