"""Decode-attention cost vs CONTEXT LENGTH for the shipping window kernel.

Round-5 motivation (VERDICT r4 weak #2/#3): bench.py's roofline charges a
FIXED 2.08 us/(seq*layer) attention floor measured at ctx~250 (1 committed
block). That floor is context-independent, so (a) the headline config
published roofline_frac 1.055 (> 1 — the real ctx was ~1 block but shorter
than 250 tokens of VALID rows changes nothing; the floor is simply
mis-shaped) and (b) the 8k long-context decode row sat at 0.177 of a
"roofline" that ignored its 32-block/seq KV walk entirely.

This probe measures the shipping `paged_attention_window` kernel
per-(seq, layer) across committed history sizes of 1..32 blocks (256-token
blocks -> ctx 250..8192) at batch 1 and 32, int8 KV, W=32 staged window,
and fits   t(seq, layer) = fixed + slope * blocks   — the two constants
bench.py's roofline now uses (ATTN_FIXED_S_PER_SEQ_LAYER /
ATTN_S_PER_SEQ_LAYER_BLOCK).

Timing is SLOPE-METHOD (t(iters_hi) - t(iters_lo)) / (hi - lo) so the
tunneled attachment's fixed dispatch cost cancels exactly
(docs/performance.md "Measurement traps").
"""

import functools
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from nanovllm_tpu.ops.pallas.paged_attention import paged_attention_window

rng = np.random.default_rng(0)
Hkv, BS, Dh, Hq, K = 8, 256, 128, 16, 32
SCALE = 0.088
L = 4  # layers per dispatch (chained); per-layer cost is L-independent


def make_inputs(S, blocks, NB):
    q = jnp.asarray(rng.standard_normal((S, Hq, Dh)) * 0.5, jnp.bfloat16)
    kn = jnp.asarray(rng.standard_normal((S, Hkv, Dh)) * 0.5, jnp.bfloat16)
    vn = jnp.asarray(rng.standard_normal((S, Hkv, Dh)) * 0.5, jnp.bfloat16)
    kst = jnp.asarray(
        rng.standard_normal((L, S, Hkv, K, Dh)) * 0.5, jnp.bfloat16)
    vst = jnp.asarray(
        rng.standard_normal((L, S, Hkv, K, Dh)) * 0.5, jnp.bfloat16)
    kc = jnp.asarray(rng.integers(-127, 127, (L, NB, Hkv, BS, Dh)), jnp.int8)
    ksc = jnp.asarray(rng.random((L, NB, Hkv, BS), np.float32) * 0.01 + 1e-3)
    vc = jnp.asarray(rng.integers(-127, 127, (L, NB, Hkv, BS, Dh)), jnp.int8)
    vsc = jnp.asarray(rng.random((L, NB, Hkv, BS), np.float32) * 0.01 + 1e-3)
    # Distinct blocks per (seq, position) cycling through the pool, so the
    # DMA stream is real (no block reuse within a seq's walk).
    tbl = (np.arange(S * blocks, dtype=np.int32).reshape(S, blocks) % NB)
    tables = jnp.asarray(tbl)
    start_lens = jnp.full((S,), blocks * BS - 6, jnp.int32)
    return q, kn, vn, kst, vst, kc, ksc, vc, vsc, tables, start_lens


def measure(S, blocks):
    # Pool sized to the walk but capped by HBM (L layers resident).
    NB = min(S * blocks, 512) + 1
    (q, kn, vn, kst, vst, kc, ksc, vc, vsc, tables,
     start_lens) = make_inputs(S, blocks, NB)
    substep = jnp.int32(17)

    def chain(iters):
        # Caches/staging are ARGUMENTS, not closure constants — closed-over
        # arrays bake into the program and blow the tunnel's remote-compile
        # payload limit (HTTP 413) at GB-scale pools.
        @jax.jit
        def fn(q, kn, vn, kst, vst, kc, ksc, vc, vsc):
            def body(i, qq):
                o = paged_attention_window(
                    qq, kn, vn, kst, vst, (kc, ksc), (vc, vsc),
                    i % L, tables, start_lens, substep, scale=SCALE)
                return (qq.astype(jnp.float32) * 0.999
                        + o.astype(jnp.float32) * 1e-3).astype(qq.dtype)
            return jax.lax.fori_loop(0, iters, body, q)
        return fn

    # Slope method with enough work per dispatch that the diff dwarfs
    # tunnel jitter: (hi-lo) kernel calls of S*(~1-30) us each.
    lo, hi = 32, 256
    args = (q, kn, vn, kst, vst, kc, ksc, vc, vsc)
    f_lo, f_hi = chain(lo), chain(hi)
    np.asarray(f_lo(*args)[0, 0, :4])  # compile + first-exec
    np.asarray(f_hi(*args)[0, 0, :4])
    reps = 5
    t_lo = t_hi = 1e30
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(f_lo(*args)[0, 0, :4])
        t_lo = min(t_lo, time.perf_counter() - t0)
        t0 = time.perf_counter()
        np.asarray(f_hi(*args)[0, 0, :4])
        t_hi = min(t_hi, time.perf_counter() - t0)
    per_layer = (t_hi - t_lo) / (hi - lo)  # one kernel call
    return per_layer / S  # per (seq, layer)


def main():
    print("devices:", jax.devices(), flush=True)
    results = {}
    points = []
    # ATTN_CTX_FAST=1: 3-point grid — tunnel remote-compiles dominate the
    # probe wall (~2 min/point), and 3 points already overdetermine the
    # 2-parameter linear fit; the full 6-point grid is for off-tunnel use.
    import os
    blocks_grid = ((1, 8, 32) if os.environ.get("ATTN_CTX_FAST")
                   else (1, 2, 4, 8, 16, 32))
    for S in (32, 1):
        for blocks in blocks_grid:
            t = measure(S, blocks)
            key = f"S{S}_blk{blocks}"
            results[key] = round(t * 1e6, 3)
            points.append((S, blocks, t))
            print(f"S={S:3d} blocks={blocks:3d} ctx~{blocks*BS-6:5d}: "
                  f"{t*1e6:8.2f} us/(seq*layer)", flush=True)
    # Least-squares fit per batch size: t = fixed + slope*blocks.
    for S in (32, 1):
        pts = [(b, t) for (s, b, t) in points if s == S]
        A = np.array([[1.0, b] for b, _ in pts])
        y = np.array([t for _, t in pts])
        (fixed, slope), *_ = np.linalg.lstsq(A, y, rcond=None)
        results[f"fit_S{S}"] = {
            "fixed_us": round(fixed * 1e6, 3),
            "slope_us_per_block": round(slope * 1e6, 3),
        }
        print(f"S={S}: t/(seq*layer) = {fixed*1e6:.2f} us "
              f"+ {slope*1e6:.2f} us/block", flush=True)
    import os
    os.makedirs("/root/repo/experiments/results", exist_ok=True)
    out = "/root/repo/experiments/results/attn_ctx_probe.json"
    with open(out, "w") as f:
        json.dump(results, f, indent=2)
    print(f"DONE -> {out}", flush=True)


if __name__ == "__main__":
    main()
