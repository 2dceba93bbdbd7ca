"""TPU validation + timing of the quantized-KV decode kernels at the bench
shape, vs the bf16 kernels."""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from nanovllm_tpu.ops.pallas.paged_attention import (
    kv_cache_commit, paged_attention_decode,
)

rng = np.random.default_rng(0)
L, NB, Hkv, BS, Dh, Hq, S = 28, 40, 8, 256, 128, 16, 32


def mkbf(shape):
    return jnp.asarray(rng.standard_normal(shape, np.float32) * 0.5, jnp.bfloat16)


RTT = None


def timeit(fn, x0, *args, iters=50, warmup=3):
    global RTT
    x = x0
    for _ in range(warmup):
        x = fn(x, *args)
    np.asarray(jax.tree.leaves(x)[0])
    if RTT is None:
        t = time.perf_counter()
        for _ in range(5):
            np.asarray(jax.tree.leaves(x)[0])
        RTT = (time.perf_counter() - t) / 5
    t0 = time.perf_counter()
    for _ in range(iters):
        x = fn(x, *args)
    np.asarray(jax.tree.leaves(x)[0])
    return (time.perf_counter() - t0 - RTT) / iters


def main():
    print("devices:", jax.devices(), flush=True)
    q0 = mkbf((S, Hq, Dh))
    k = mkbf((S, Hkv, Dh))
    v = mkbf((S, Hkv, Dh))
    bt = jnp.asarray(np.arange(S, dtype=np.int32).reshape(S, 1) + 1)
    cl = jnp.full((S,), 256, jnp.int32)

    for name, dt in (("bf16", jnp.bfloat16), ("int8", jnp.int8),
                     ("fp8", jnp.float8_e4m3fn)):
        if dt == jnp.bfloat16:
            kc = mkbf((L, NB, Hkv, BS, Dh))
            vc = mkbf((L, NB, Hkv, BS, Dh))
            nbytes = S * Hkv * BS * Dh * 2 * 2
        else:
            kc = (jnp.asarray(rng.integers(-127, 127, (L, NB, Hkv, BS, Dh)), dt)
                  if dt == jnp.int8 else
                  mkbf((L, NB, Hkv, BS, Dh)).astype(dt))
            ksc = jnp.asarray(rng.random((L, NB, Hkv, BS), np.float32) * 0.01 + 0.001)
            vc = (kc[0] if False else kc)  # placeholder, replaced below
            kc = (kc, ksc)
            vdata = (jnp.asarray(rng.integers(-127, 127, (L, NB, Hkv, BS, Dh)), dt)
                     if dt == jnp.int8 else mkbf((L, NB, Hkv, BS, Dh)).astype(dt))
            vc = (vdata, jnp.asarray(rng.random((L, NB, Hkv, BS), np.float32) * 0.01 + 0.001))
            nbytes = S * Hkv * BS * (Dh * 1 + 4) * 2

        def attn_chain(q, kc, vc):
            def body(l, q):
                o = paged_attention_decode(q, k, v, kc, vc, l % L, bt, cl, scale=0.088)
                return q * 0.999 + o * 1e-3
            return jax.lax.fori_loop(0, L, body, q)

        t = timeit(jax.jit(attn_chain), q0, kc, vc)
        per = t / L
        print(f"attn {name:5s} {per*1e6:8.1f} us/layer  {nbytes/per/1e9:6.1f} GB/s",
              flush=True)

        def commit_chain(carry):
            def body(l, carry):
                kk, kc, vc = carry
                kc2, vc2 = kv_cache_commit(kk, v, kc, vc, l % L, bt, cl)
                return (kk * 0.999, kc2, vc2)
            return jax.lax.fori_loop(0, L, body, carry)

        t = timeit(jax.jit(commit_chain, donate_argnums=(0,)), (k + 0, kc, vc))
        print(f"commit {name:5s} {t/L*1e6:8.1f} us/layer", flush=True)

    # Correctness on real hardware: kernel vs jnp oracle, int8.
    from nanovllm_tpu.ops.attention import kv_cache_write, paged_attention_ref
    from nanovllm_tpu.utils.metadata import AttentionMetadata

    kc = (jnp.zeros((2, 8, Hkv, BS, Dh), jnp.int8), jnp.zeros((2, 8, Hkv, BS), jnp.float32))
    vc = (jnp.zeros((2, 8, Hkv, BS, Dh), jnp.int8), jnp.zeros((2, 8, Hkv, BS), jnp.float32))
    Ss = 4
    qs = mkbf((Ss, Hq, Dh))
    ks = mkbf((Ss, Hkv, Dh))
    vs = mkbf((Ss, Hkv, Dh))
    bts = jnp.asarray(np.arange(Ss, dtype=np.int32).reshape(Ss, 1) + 1)
    cls_ = jnp.asarray([255, 256, 129, 1], np.int32)
    # Fill history via the jnp writer.
    hist_k = mkbf((Ss * BS, Hkv, Dh))
    hist_v = mkbf((Ss * BS, Hkv, Dh))
    slots = (jnp.repeat(bts[:, 0], BS) * BS + jnp.tile(jnp.arange(BS), Ss)).astype(jnp.int32)
    kc = kv_cache_write(kc, hist_k, slots, 1)
    vc = kv_cache_write(vc, hist_v, slots, 1)

    rows = jnp.arange(Ss, dtype=jnp.int32)
    pos = jnp.maximum(cls_ - 1, 0)
    blk = bts[:, 0]
    slots1 = blk * BS + pos % BS
    ref_kc = kv_cache_write(kc, ks, slots1, 1)
    ref_vc = kv_cache_write(vc, vs, slots1, 1)
    meta = AttentionMetadata(
        slot_mapping=slots1, positions=pos, token_seq=rows,
        token_qcol=jnp.zeros((Ss,), jnp.int32), block_tables=bts,
        context_lens=cls_, logits_idx=rows, q_gather=rows[:, None],
        q_positions=(cls_ - 1)[:, None],
    )
    ref = paged_attention_ref(qs, ref_kc, ref_vc, 1, meta, 0.088)
    got = paged_attention_decode(qs, ks, vs, kc, vc, 1, bts, cls_, scale=0.088)
    err = np.abs(np.asarray(got, np.float32) - np.asarray(ref, np.float32)).max()
    print("int8 attn kernel vs oracle max err:", err, flush=True)
    gkc, gvc = kv_cache_commit(ks, vs, kc, vc, 1, bts, cls_)
    de = np.abs(np.asarray(gkc[0], np.int32) - np.asarray(ref_kc[0], np.int32)).max()
    se = np.abs(np.asarray(gkc[1]) - np.asarray(ref_kc[1])).max()
    print("int8 commit data/scale max err:", de, se, flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
