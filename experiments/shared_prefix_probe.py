"""Shared-prefix (cascade) decode attention: on-chip cost of the shipping
split (shared_prefix_partial + paged_attention_window with skip/init) vs
the unshared window kernel, at serving shapes.

The measured decode wall is the per-(seq, layer) MXU weight-load rate at
M=G=2 (docs/performance.md): every KV block is streamed through the MXU
once PER SEQUENCE for 2 query rows. When sequences share a committed
block-table prefix (system prompt via prefix cache), the shared span can
instead be attended ONCE with all members' queries batched (M = S*G),
which divides both the weight loads and the KV DMA on that span by the
member count. This probe measures the end-to-end per-layer substep cost
of both strategies over a sweep of (batch, shared-span, tail) shapes.

Timing traps on the tunneled v5e (see attn3_probe.py): chain outputs into
inputs so the relay can't dedup dispatches; barrier on a tiny slice.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from nanovllm_tpu.ops.pallas.paged_attention import (
    paged_attention_window,
    shared_prefix_partial,
)

rng = np.random.default_rng(0)
L, Hkv, BS, Dh, Hq, K = 28, 8, 256, 128, 16, 32
G = Hq // Hkv
SCALE = 0.088


def _barrier(x):
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


def quant(x):
    s = jnp.max(jnp.abs(x), axis=-1, keepdims=True) / 127.0
    return (x / s).astype(jnp.int8), s[..., 0].astype(jnp.float32)


def run_case(S, shared_blocks, tail_blocks):
    """S seqs all sharing `shared_blocks`, each with `tail_blocks` own."""
    NB = shared_blocks + S * tail_blocks + 2
    nb = shared_blocks + tail_blocks
    ctx = nb * BS - BS // 2            # committed history (tail partial)
    MAXBLK = 1 << (nb + 1).bit_length()

    # Generate the caches ON DEVICE: host-side randoms would ship GBs
    # through the tunneled attachment (minutes per case).
    @jax.jit
    def mkdata(key):
        k1, k2, k3, k4 = jax.random.split(key, 4)
        kc = quant(jax.random.normal(k1, (L, NB, Hkv, BS, Dh), jnp.float32))
        vc = quant(jax.random.normal(k2, (L, NB, Hkv, BS, Dh), jnp.float32))
        q = jax.random.normal(k3, (S, Hq, Dh), jnp.bfloat16)
        k_new = jax.random.normal(k4, (S, Hkv, Dh), jnp.bfloat16)
        return kc, vc, q, k_new

    kc, vc, q, k_new = mkdata(jax.random.PRNGKey(0))
    v_new = k_new * 0.5
    k_st = jnp.zeros((L, S, Hkv, K, Dh), jnp.bfloat16)
    v_st = k_st
    bt = np.zeros((S, MAXBLK), np.int32)
    nxt = shared_blocks
    for i in range(S):
        bt[i, :shared_blocks] = range(shared_blocks)
        bt[i, shared_blocks:nb] = range(nxt, nxt + tail_blocks)
        nxt += tail_blocks
    bt = jnp.asarray(bt)
    start = jnp.full((S,), ctx, jnp.int32)
    sub = jnp.int32(K // 2)
    stab = jnp.arange(shared_blocks, dtype=jnp.int32)
    nsh = jnp.int32(shared_blocks)
    skip = jnp.full((S,), shared_blocks, jnp.int32)
    max_rem = 1 << (tail_blocks - 1).bit_length() if tail_blocks > 1 else 1

    lay = jnp.int32(0)

    # Caches must be ARGUMENTS of the jitted fns: closure capture would
    # bake the GB-scale cache into the compile payload (tunnel HTTP 413).
    def unshared(q_in, kc, vc):
        out = q_in
        for li in range(4):  # 4 layers per dispatch, chained (dedup-safe)
            out = paged_attention_window(
                out.astype(jnp.bfloat16), k_new, v_new, k_st, v_st, kc, vc,
                lay + li, bt, start, sub, scale=SCALE)
        return out

    def shared(q_in, kc, vc):
        out = q_in
        for li in range(4):
            init = shared_prefix_partial(
                out.astype(jnp.bfloat16), kc, vc, lay + li, stab, nsh,
                scale=SCALE)
            out = paged_attention_window(
                out.astype(jnp.bfloat16), k_new, v_new, k_st, v_st, kc, vc,
                lay + li, bt, start, sub, skip, init, scale=SCALE,
                max_rem=max_rem)
        return out

    # Numerics check first.
    a = np.asarray(unshared(q, kc, vc), np.float32)
    b = np.asarray(shared(q, kc, vc), np.float32)
    err = np.abs(a - b).max() / (np.abs(a).max() + 1e-9)
    ju, js = jax.jit(unshared), jax.jit(shared)
    t_u = timeit(lambda x: ju(x, kc, vc), q) / 4 * 1e6
    t_s = timeit(lambda x: js(x, kc, vc), q) / 4 * 1e6
    print(
        f"S={S:4d} shared={shared_blocks} tail={tail_blocks} ctx={ctx:5d} | "
        f"unshared {t_u:7.1f} us/layer  shared {t_s:7.1f} us/layer  "
        f"speedup {t_u / t_s:4.2f}x  relerr {err:.2e}",
        flush=True,
    )
    return t_u, t_s


def main():
    print("devices:", jax.devices(), flush=True)
    # (batch, shared span blocks, per-seq tail blocks)
    for case in [
        (32, 1, 1),    # short system prompt
        (32, 4, 1),    # 1k-token system prompt, short convo
        (32, 4, 2),
        (32, 8, 2),    # 2k system prompt
        (256, 1, 1),
        (256, 4, 1),
        (256, 4, 2),
    ]:
        run_case(*case)


if __name__ == "__main__":
    main()
