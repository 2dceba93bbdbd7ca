"""Batch-256 substep budget (the headline config): where do the ~15 ms go?

Components measured at S=256, int8 weights + int8 KV, ctx 250, window 32,
Qwen3-0.6B shapes: unified window attention (SPS 4 vs 8), the 4-matmul
chain, int8 lm_head (+argmax; f32 vs bf16 logits), window span commit."""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from nanovllm_tpu.ops.quant import QuantizedEmbedding, quantize, quantize_embedding

rng = np.random.default_rng(0)
S, L = 256, 28
Hkv, BS, Dh, Hq, K = 8, 256, 128, 16, 32
NB = S * 2 + 2
V, D = 151936, 1024


def mkbf(shape):
    return jnp.asarray(rng.standard_normal(shape, np.float32) * 0.02, jnp.bfloat16)


def _barrier(x):
    np.asarray(jnp.ravel(jax.tree.leaves(x)[0])[:8])


def timeit(fn, x0, *args, iters=20, warmup=3):
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

    # --- attention (unified window kernel, shipping path) ---
    from nanovllm_tpu.ops.pallas.paged_attention import (
        kv_window_commit, paged_attention_window,
    )

    q0 = mkbf((S, Hq, Dh))
    kn = mkbf((S, Hkv, Dh))
    vn = mkbf((S, Hkv, Dh))
    kst = mkbf((L, S, Hkv, K, Dh))
    vst = mkbf((L, S, Hkv, K, Dh))
    # Generate the multi-GB caches ON DEVICE (an int64 numpy draw of this
    # size costs ~30 GB host RAM and minutes through the tunnel).
    kk = jax.random.split(jax.random.PRNGKey(7), 4)
    mk_data = jax.jit(lambda k: jax.random.randint(
        k, (L, NB, Hkv, BS, Dh), -127, 128, jnp.int8))
    mk_scale = jax.jit(lambda k: jax.random.uniform(
        k, (L, NB, Hkv, BS), jnp.float32) * 0.01)
    kc = (mk_data(kk[0]), mk_scale(kk[1]))
    vc = (mk_data(kk[2]), mk_scale(kk[3]))
    bt = jnp.asarray(
        np.stack([np.arange(S) + 1, np.arange(S) + S + 1], 1).astype(np.int32))
    start = jnp.full((S,), 250, jnp.int32)
    valid = jnp.ones((S,), jnp.int32)

    # Big operands MUST be jit arguments: closure capture bakes them into
    # the compile payload (remote-compile HTTP 413 past ~100s of MB).
    def attn_chain(q, kc, vc, kn, vn, kst, vst):
        def body(l, qq):
            o = paged_attention_window(qq, kn, vn, kst, vst, kc, vc,
                                       l % L, bt, start, jnp.int32(17),
                                       scale=0.088)
            return (qq.astype(jnp.float32) * 0.999
                    + o.astype(jnp.float32) * 1e-3).astype(qq.dtype)
        return jax.lax.fori_loop(0, L, body, q)

    t = timeit(jax.jit(attn_chain), q0, kc, vc, kn, vn, kst, vst)
    print(f"attention x28L  : {t*1e3:7.3f} ms  ({t/L*1e6:6.1f} us/layer)", flush=True)

    def commit_chain(carry, kw, vw):
        def body(l, caches):
            return kv_window_commit(kw, vw, caches[0], caches[1],
                                    l % L, bt, start, valid)
        return jax.lax.fori_loop(0, L, body, carry)

    t = timeit(jax.jit(commit_chain, donate_argnums=(0,)), (kc, vc),
               kst[0], vst[0], iters=5)
    print(f"window commit   : {t*1e3:7.3f} ms/window ({t/K*1e3:6.3f} ms/substep)",
          flush=True)

    # --- matmul chain (int8 XLA dequant-dot, shipping int8 path) ---
    shapes = [(1024, 4096), (2048, 1024), (1024, 6144), (3072, 1024)]
    qts = [quantize(mkbf(s).astype(jnp.float32), 8, group_size=-1) for s in shapes]
    from nanovllm_tpu.ops.quant import quant_matmul

    h0 = mkbf((S, D))

    def mm_chain(h):
        def body(_, hh):
            y1 = quant_matmul(hh, qts[0])
            h2 = quant_matmul(y1[:, :2048], qts[1])
            y2 = quant_matmul(h2, qts[2])
            h3 = quant_matmul(y2[:, :3072], qts[3])
            return (hh.astype(jnp.float32) * 0.9
                    + h3.astype(jnp.float32) * 1e-3).astype(hh.dtype)
        return jax.lax.fori_loop(0, L, body, h)

    t = timeit(jax.jit(mm_chain), h0)
    print(f"matmuls x28L    : {t*1e3:7.3f} ms", flush=True)

    # --- lm_head + argmax ---
    emb = quantize_embedding(mkbf((V, D)).astype(jnp.float32))

    def head_argmax_f32(h):
        logits = emb.logits(h)                      # [S, V] f32
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)

    def head_argmax_bf16(h):
        acc = jax.lax.dot_general(
            h, emb.data.astype(h.dtype),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        logits = (acc * emb.scale[None, :]).astype(jnp.bfloat16)
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)

    for name, fn in (("f32 logits", head_argmax_f32),
                     ("bf16 logits", head_argmax_bf16)):
        def chain(h, fn=fn):
            def body(_, hh):
                tok = fn(hh)
                return hh + (tok[:, None] % 3).astype(hh.dtype) * 1e-6
            return jax.lax.fori_loop(0, 4, body, h)
        t = timeit(jax.jit(chain), h0, iters=10) / 4
        print(f"lm_head+argmax ({name}): {t*1e3:7.3f} ms", flush=True)

    print("DONE", flush=True)


if __name__ == "__main__":
    main()
