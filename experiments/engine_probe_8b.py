"""Config-4 (Qwen3-8B int4+int8KV, S=256) substep decomposition
(VERDICT r4 #7): every prior substep budget ran 0.6B shapes — this probe
times each decode-substep component AT THE 8B GEOMETRY so the published
row's missing roofline fraction is apportioned between attention, the
int4 matmul chain, the 151936-vocab lm_head, window commit, and
whatever's left (host/dispatch/phase-bleed).

Geometry (bench.py QWEN3_8B row): D=4096, I=12288, L=36, Hq=32, Hkv=8,
Dh=128, V=151936 untied, block_size=128, S=256, ctx~192, window 32.
Pass "4b" as argv[1] for the 4B geometry (D=2560, I=9728, L=36, Hq=32,
tied).

Run: python experiments/engine_probe_8b.py [8b|4b]   (needs the TPU chip)
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from nanovllm_tpu.ops.quant import quantize, quantize_embedding

GEOM = {
    "8b": dict(D=4096, I=12288, L=36, Hq=32, Hkv=8, Dh=128, V=151936),
    "4b": dict(D=2560, I=9728, L=36, Hq=32, Hkv=8, Dh=128, V=151936),
}

S = 256
BS = 128      # bench's 8B row block size
K = 32        # decode window
CTX = 192     # mean committed context of the bench row
HBM = 819e9

rng = np.random.default_rng(0)


def mkbf(shape):
    return jnp.asarray(rng.standard_normal(shape, np.float32) * 0.02,
                       jnp.bfloat16)


def _barrier(x):
    np.asarray(jnp.ravel(jax.tree.leaves(x)[0])[:8])


def timeit(fn, x0, *args, iters=10, warmup=3):
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
    g = GEOM[sys.argv[1] if len(sys.argv) > 1 else "8b"]
    D, I, L, Hq, Hkv, Dh, V = (g[k] for k in ("D", "I", "L", "Hq", "Hkv",
                                              "Dh", "V"))
    print(f"devices: {jax.devices()}  geometry: {g}", flush=True)
    budget = {}

    # --- attention (unified window kernel, shipping path, int8 KV) ---
    from nanovllm_tpu.ops.pallas.paged_attention import (
        kv_window_commit, paged_attention_window,
    )

    blocks_per_seq = -(-(CTX + K) // BS) + 1
    NB = S * blocks_per_seq + 2
    # Generate EVERYTHING on device: a 600 MB host array takes minutes
    # through the tunneled attachment (engine_probe256 learned this for
    # the caches; at 8B shapes the window state is just as big).
    mk_bf16 = jax.jit(lambda k, s: (jax.random.normal(k, s, jnp.float32)
                                    * 0.02).astype(jnp.bfloat16),
                      static_argnums=1)
    kq = jax.random.split(jax.random.PRNGKey(3), 5)
    q0 = mk_bf16(kq[0], (S, Hq, Dh))
    kn = mk_bf16(kq[1], (S, Hkv, Dh))
    vn = mk_bf16(kq[2], (S, Hkv, Dh))
    kst = mk_bf16(kq[3], (L, S, Hkv, K, Dh))
    vst = mk_bf16(kq[4], (L, S, Hkv, K, Dh))
    kk = jax.random.split(jax.random.PRNGKey(7), 4)
    mk_data = jax.jit(lambda k: jax.random.randint(
        k, (L, NB, Hkv, BS, Dh), -127, 128, jnp.int8))
    mk_scale = jax.jit(lambda k: jax.random.uniform(
        k, (L, NB, Hkv, BS), jnp.float32) * 0.01)
    kc = (mk_data(kk[0]), mk_scale(kk[1]))
    vc = (mk_data(kk[2]), mk_scale(kk[3]))
    bt = jnp.asarray(np.stack(
        [np.arange(S) * blocks_per_seq + j + 1
         for j in range(blocks_per_seq)], 1).astype(np.int32))
    start = jnp.full((S,), CTX, jnp.int32)
    valid = jnp.ones((S,), jnp.int32)

    def attn_chain(q, kc, vc, kn, vn, kst, vst):
        def body(l, qq):
            o = paged_attention_window(qq, kn, vn, kst, vst, kc, vc,
                                       l % L, bt, start, jnp.int32(17),
                                       scale=0.088)
            return (qq.astype(jnp.float32) * 0.999
                    + o.astype(jnp.float32) * 1e-3).astype(qq.dtype)
        return jax.lax.fori_loop(0, L, body, q)

    t = timeit(jax.jit(attn_chain), q0, kc, vc, kn, vn, kst, vst)
    budget["attention"] = t
    print(f"attention x{L}L : {t*1e3:7.3f} ms  "
          f"({t/L/S*1e6:6.2f} us/(seq*layer))", flush=True)

    def commit_chain(carry, kw, vw):
        def body(l, caches):
            return kv_window_commit(kw, vw, caches[0], caches[1],
                                    l % L, bt, start, valid)
        return jax.lax.fori_loop(0, L, body, carry)

    t = timeit(jax.jit(commit_chain, donate_argnums=(0,)), (kc, vc),
               kst[0], vst[0], iters=4)
    budget["commit"] = t / K
    print(f"window commit  : {t*1e3:7.3f} ms/window "
          f"({t/K*1e3:6.3f} ms/substep)", flush=True)
    del kc, vc, kst, vst, kn, vn

    # --- int4 matmul chain (fused Pallas kernel, shipping dispatch) ---
    from nanovllm_tpu.ops.quant import quant_matmul

    shapes = [(D, (Hq + 2 * Hkv) * Dh), (Hq * Dh, D), (D, 2 * I), (I, D)]
    mk_f32 = jax.jit(lambda k, s: jax.random.normal(k, s, jnp.float32) * 0.02,
                     static_argnums=1)
    qts = []
    for i, s in enumerate(shapes):
        qts.append(quantize(mk_f32(jax.random.PRNGKey(20 + i), s), 4,
                            group_size=128))
    int4_bytes = sum(a * b for a, b in shapes) * 0.5 * L
    h0 = mk_bf16(jax.random.PRNGKey(30), (S, D))

    def mm_chain(h, *qts):
        def body(_, hh):
            y1 = quant_matmul(hh, qts[0])
            h2 = quant_matmul(y1[:, :Hq * Dh], qts[1])
            y2 = quant_matmul(h2, qts[2])
            h3 = quant_matmul(y2[:, :I], qts[3])
            return (hh.astype(jnp.float32) * 0.9
                    + h3.astype(jnp.float32) * 1e-3).astype(hh.dtype)
        return jax.lax.fori_loop(0, L, body, h)

    t = timeit(jax.jit(mm_chain), h0, *qts)
    budget["matmuls"] = t
    print(f"int4 matmuls x{L}L: {t*1e3:7.3f} ms  "
          f"(byte floor {int4_bytes/HBM*1e3:6.3f} ms)", flush=True)
    del qts

    # --- lm_head (int8 per-row, V=151936) + argmax ---
    emb = quantize_embedding(mk_f32(jax.random.PRNGKey(31), (V, D)))
    from nanovllm_tpu.ops.quant import greedy_head

    def head_chain(h, data, scale):
        from nanovllm_tpu.ops.quant import QuantizedEmbedding
        e = QuantizedEmbedding(data=data, scale=scale)
        def body(_, hh):
            tok = greedy_head(hh, e)
            return hh + (tok[:, None] % 3).astype(hh.dtype) * 1e-6
        return jax.lax.fori_loop(0, 4, body, h)

    t = timeit(jax.jit(head_chain), h0, emb.data, emb.scale, iters=6) / 4
    budget["lm_head"] = t
    print(f"lm_head+argmax : {t*1e3:7.3f} ms  "
          f"(byte floor {V*D/HBM*1e3:6.3f} ms)", flush=True)

    # --- sum vs the published row ---
    total = sum(budget.values())
    print("\nsubstep budget (ms):", flush=True)
    for k, v in budget.items():
        print(f"  {k:10s} {v*1e3:8.3f}  ({v/total:5.1%})", flush=True)
    print(f"  SUM        {total*1e3:8.3f}  ->  {S/total:,.0f} tok/s "
          f"if nothing else cost anything", flush=True)
    print("\ncompare: published config4 row's decode_tok_s — the gap "
          "between S/SUM and the row is host/window mechanics + "
          "phase-bleed, not kernels.", flush=True)


if __name__ == "__main__":
    main()
